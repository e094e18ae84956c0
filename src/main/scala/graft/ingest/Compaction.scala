package graft.ingest

import org.apache.spark.sql.SparkSession

/** Small-file compaction — the table-maintenance pass every
  * long-running ingest needs: streaming sinks, partitioned writes and
  * incremental merges all accrete files far below the scan-efficient
  * size, and at 100 TB the resulting file-listing + footer-read +
  * task-per-file overhead dominates reads (NOTES: single-file inputs
  * have the OPPOSITE problem — the sweet spot is files ≈ one scan
  * split, `spark.sql.files.maxPartitionBytes`).
  *
  * The rewrite sizes itself from the ACTUAL input bytes:
  * `ceil(totalBytes / targetBytes)` output files via an explicit
  * round-robin repartition (content is unchanged — no keys, no sort —
  * so the rewrite is a pure shuffle-write bounded by the data once).
  * Callers that want data-skipping locality compact through
  * [[Layout.zOrderBy]]/bucketed writes instead; this pass is the
  * size-normalization primitive.
  */
object Compaction {

  /** Compact the parquet at `inDir` into `outDir` targeting
    * `targetBytes` per file. Returns (input file count, output file
    * count). */
  def compactTo(
      spark: SparkSession,
      inDir: String,
      outDir: String,
      targetBytes: Long = 128L * 1024 * 1024): (Int, Int) = {
    require(targetBytes > 0, s"targetBytes must be positive: $targetBytes")
    // overwrite-from-own-input fails mid-write (and a nested outDir
    // corrupts the next read's listing) — reject up front. The guard
    // normalizes through the Hadoop FS layer (the same abstraction the
    // read/write below uses), so scheme'd URIs (hdfs://, s3a://) and
    // default-FS-relative paths compare correctly — a java.nio lexical
    // compare would treat "s3a://b/t" and "/t" as disjoint even when
    // the default FS makes them the same directory.
    val hconf = spark.sparkContext.hadoopConfiguration
    def qualified(dir: String): org.apache.hadoop.fs.Path = {
      val p = new org.apache.hadoop.fs.Path(dir)
      val fs = p.getFileSystem(hconf)
      fs.makeQualified(p)
    }
    val inPath = qualified(inDir)
    val outPath = qualified(outDir)
    def contains(a: org.apache.hadoop.fs.Path, b: org.apache.hadoop.fs.Path): Boolean = {
      var cur: org.apache.hadoop.fs.Path = b
      while (cur != null && cur != a) cur = cur.getParent
      cur != null
    }
    require(!contains(inPath, outPath) && !contains(outPath, inPath),
      s"outDir must not overlap inDir: $inDir -> $outDir")
    val df = spark.read.parquet(inDir)
    val files = df.inputFiles
    // size probes fail LOUD: a transiently unreadable file silently
    // counted as 0 bytes would shrink the output-file target (and the
    // resulting files would overshoot targetBytes with no trace)
    val totalBytes = files.map { f =>
      val p = new org.apache.hadoop.fs.Path(f)
      p.getFileSystem(hconf).getFileStatus(p).getLen
    }.sum
    val nOut = math.max(1, math.ceil(totalBytes.toDouble / targetBytes).toInt)
    df.repartition(nOut).write.mode("overwrite").parquet(outDir)
    val outFiles = spark.read.parquet(outDir).inputFiles.length
    (files.length, outFiles)
  }
}
