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
    // corrupts the next read's listing) — reject up front
    val inPath = java.nio.file.Paths.get(inDir).toAbsolutePath.normalize
    val outPath = java.nio.file.Paths.get(outDir).toAbsolutePath.normalize
    require(!outPath.startsWith(inPath) && !inPath.startsWith(outPath),
      s"outDir must not overlap inDir: $inDir -> $outDir")
    val df = spark.read.parquet(inDir)
    val files = df.inputFiles
    val hconf = spark.sparkContext.hadoopConfiguration
    val totalBytes = files.map { f =>
      val p = new org.apache.hadoop.fs.Path(f)
      try p.getFileSystem(hconf).getFileStatus(p).getLen
      catch { case _: java.io.IOException => 0L }
    }.sum
    val nOut = math.max(1, math.ceil(totalBytes.toDouble / targetBytes).toInt)
    df.repartition(nOut).write.mode("overwrite").parquet(outDir)
    val outFiles = spark.read.parquet(outDir).inputFiles.length
    (files.length, outFiles)
  }
}
