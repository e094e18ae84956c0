package graft.ext

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Snapshot-isolated, versioned parquet tables via a manifest commit
  * log — the missing atomicity layer under plain-directory MERGE
  * (r9's standing hazard: [[Cdc.applyChangeSet]] + dynamic partition
  * overwrite REWRITES live directories, so a reader racing a merge
  * sees a half-written snapshot and two writers corrupt each other).
  *
  * Layout (the Delta/Iceberg commit-log shape, reduced to its core):
  * {{{
  *   table/
  *     data/v<N>-<token>/...          immutable data files, one dir per commit
  *     _graft_log/<N padded>.json     manifest: the COMPLETE live-file list of version N
  * }}}
  *
  * Invariants that buy the isolation:
  *   - data files are IMMUTABLE: a commit only ever writes into its
  *     own fresh `data/v<N>-<token>/` directory — no existing file is
  *     touched, so every already-published version stays byte-stable
  *     under any number of concurrent commits;
  *   - a version is BORN ATOMICALLY: the manifest is staged to a temp
  *     name and renamed into place — readers either see version N
  *     complete or not at all, never half a commit;
  *   - conflicts are DETECTED, not merged: a commit targets manifest
  *     `base+1`; if a competing writer published it first the rename
  *     refuses and the commit throws (first writer wins) — the loser's
  *     data files are orphans that [[vacuum]] reclaims, and the table
  *     is still exactly the winner's version. A crash BEFORE the
  *     rename likewise leaves only orphan data files: the table stays
  *     at N−1 by construction.
  *
  * Scale shape: the manifest is file-list-sized (MBs at 100 TB /
  * ~100 k files), and it REPLACES directory listing at read-planning
  * time — the object-store listing tax disappears, and manifest-level
  * partition pruning ([[readPruned]]) selects files before Spark ever
  * sees a path. [[mergeChangeSet]] rewrites only the files of touched
  * partitions (cost ∝ touched data, the q138 property) and carries
  * every untouched file entry forward by reference. A partition whose
  * rows are all deleted simply contributes NO files to the new
  * manifest — the stale-directory divergence dynamic overwrite had to
  * patch around (MergeStream r9) cannot exist here structurally.
  *
  * Not in scope (documented trade-offs, not oversights): rename
  * atomicity is the HDFS/local contract — S3-style object stores need
  * a put-if-absent coordination service exactly as Delta's LogStore
  * does; manifests are complete per version (no incremental log +
  * checkpoint compaction yet); schema is carried by the parquet files
  * themselves. Partition values are rendered as path strings — keys
  * should be integral/simple-string typed (the Spark partition-dir
  * value contract).
  */
object TxTable {

  /** One live data file: `path` relative to the table root; `bucket`
    * is the partition value rendered as Spark renders it into the
    * `col=value` directory name (None for unpartitioned commits);
    * `stats` is an optional per-file (column, min, max) triple for
    * LONG-valued skipping columns (rendered as decimal strings in the
    * manifest) — [[readRange]] prunes on it, conservatively keeping
    * any file without stats. */
  final case class FileEntry(
      path: String,
      bucket: Option[String],
      stats: Option[(String, Long, Long)] = None)

  final case class Manifest(version: Long, files: Seq[FileEntry])

  final class CommitConflictException(msg: String)
    extends java.util.ConcurrentModificationException(msg)

  /** Partition values ride in `col=value` directory names AND raw in
    * manifests/deletes: Spark ESCAPES non-literal characters when
    * writing the directory (space → %20, null → a sentinel dir), so a
    * raw-string match against an exotic value silently misses — fail
    * loud at the boundary instead. Shared with
    * [[graft.streaming.MergeStream]]'s emptied-partition delete. */
  private[graft] def requirePathSafe(values: Iterable[String], colName: String): Unit =
    values.find(v => v == "null" || !v.forall(c =>
      c.isLetterOrDigit || c == '-' || c == '_' || c == '.')).foreach { bad =>
      throw new IllegalArgumentException(
        s"partition column '$colName' value '$bad' is not path-literal " +
          "(letters/digits/-_./ only, non-null): Spark escapes such values in " +
          "directory names, so raw-string partition matching would silently " +
          "miss — use an integral or simple-string partition key")
    }

  private def fsOf(spark: SparkSession, dir: String): (FileSystem, Path) = {
    val p = new Path(dir)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    (fs, fs.makeQualified(p))
  }

  private def logDir(root: Path) = new Path(root, "_graft_log")
  private def manifestPath(root: Path, v: Long) =
    new Path(logDir(root), f"$v%020d.json")

  private val ManifestName = """(\d{20})\.json""".r

  /** Highest published version, if any — one log-dir listing. */
  def latestVersion(spark: SparkSession, dir: String): Option[Long] = {
    val (fs, root) = fsOf(spark, dir)
    val ld = logDir(root)
    if (!fs.exists(ld)) None
    else {
      val vs = fs.listStatus(ld).toSeq.map(_.getPath.getName).collect {
        case ManifestName(d) => d.toLong
      }
      if (vs.isEmpty) None else Some(vs.max)
    }
  }

  /** Parse the manifest of `version` (JSON-lines within `.json`: one
    * header object, then one object per live file — written by
    * [[commit]], so the shapes are closed). */
  def readManifest(spark: SparkSession, dir: String, version: Long): Manifest = {
    val (fs, root) = fsOf(spark, dir)
    val mp = manifestPath(root, version)
    require(fs.exists(mp), s"no manifest for version $version at $mp")
    val in = fs.open(mp)
    val text =
      try scala.io.Source.fromInputStream(in, "UTF-8").mkString
      finally in.close()
    val pathRe = """"path":"([^"]+)"""".r
    val bucketRe = """"bucket":"([^"]*)"""".r
    val statsRe = """"sc":"([^"]+)","lo":(-?\d+),"hi":(-?\d+)""".r
    val files = text.linesIterator.drop(1).filter(_.nonEmpty).map { line =>
      val p = pathRe.findFirstMatchIn(line).getOrElse(
        sys.error(s"malformed manifest line in $mp: $line")).group(1)
      FileEntry(p, bucketRe.findFirstMatchIn(line).map(_.group(1)),
        statsRe.findFirstMatchIn(line).map(m =>
          (m.group(1), m.group(2).toLong, m.group(3).toLong)))
    }.toSeq
    Manifest(version, files)
  }

  /** DESCRIBE HISTORY: one row per published version — (version, op,
    * base, n_files, n_added, n_carried), where added/carried compare
    * the file list against the PARENT manifest (a carried file is
    * referenced by both). Driver-built frame, bounded by #versions. */
  def history(spark: SparkSession, dir: String): DataFrame = {
    val (fs, root) = fsOf(spark, dir)
    val ld = logDir(root)
    val versions: Seq[Long] =
      if (!fs.exists(ld)) Seq.empty
      else fs.listStatus(ld).toSeq.map(_.getPath.getName).collect {
        case ManifestName(d) => d.toLong
      }.sorted
    val opRe = """"op":"([^"]+)"""".r
    val baseRe = """"base":(\d+)""".r
    // ONE read + parse per manifest: headers and path sets are cached
    // and parent lookups hit the maps — the naive per-row re-read is
    // O(V²) manifest opens, which on an object store is V² round
    // trips for a streaming table with thousands of commits.
    val headers = new scala.collection.mutable.HashMap[Long, String]
    val pathSets = new scala.collection.mutable.HashMap[Long, Set[String]]
    versions.foreach { v =>
      val mp = manifestPath(root, v)
      val in = fs.open(mp)
      val text =
        try scala.io.Source.fromInputStream(in, "UTF-8").mkString
        finally in.close()
      val lines = text.linesIterator.toSeq
      headers(v) = lines.headOption.getOrElse("")
      val pathRe = """"path":"([^"]+)"""".r
      pathSets(v) = lines.drop(1).flatMap(l =>
        pathRe.findFirstMatchIn(l).map(_.group(1))).toSet
    }
    val versionSet = versions.toSet
    val rows = versions.map { v =>
      val header = headers(v)
      val op = opRe.findFirstMatchIn(header).map(_.group(1)).getOrElse("unknown")
      val base = baseRe.findFirstMatchIn(header).map(_.group(1).toLong).getOrElse(v - 1)
      val files = pathSets(v)
      val parent: Set[String] =
        if (base >= 1 && versionSet.contains(base)) pathSets(base) else Set.empty
      (v, op, base, files.size.toLong,
        files.diff(parent).size.toLong, files.intersect(parent).size.toLong)
    }
    import spark.implicits._
    rows.toDF("version", "op", "base", "n_files", "n_added", "n_carried")
  }

  /** Stage-and-rename publication of version `base + 1`. Refuses (and
    * throws [[CommitConflictException]]) if that manifest already
    * exists — the competing writer won; this writer's data files are
    * orphans for [[vacuum]]. */
  private def commit(
      fs: FileSystem, root: Path, base: Long, files: Seq[FileEntry],
      op: String): Long = {
    val version = base + 1
    val dst = manifestPath(root, version)
    val tmp = new Path(logDir(root),
      s".tmp-${java.util.UUID.randomUUID().toString}.json")
    fs.mkdirs(logDir(root))
    val out = fs.create(tmp, false)
    try {
      val sb = new StringBuilder
      sb.append(s"""{"version":$version,"base":$base,"op":"$op","n_files":${files.size}}""")
        .append('\n')
      files.foreach { f =>
        sb.append(s"""{"path":"${f.path}"""")
        f.bucket.foreach(b => sb.append(s""","bucket":"$b""""))
        f.stats.foreach { case (c, lo, hi) =>
          sb.append(s""","sc":"$c","lo":$lo,"hi":$hi""")
        }
        sb.append("}\n")
      }
      out.write(sb.toString.getBytes("UTF-8"))
    } finally out.close()
    // Atomic no-overwrite publish. HDFS: rename refuses an existing
    // destination atomically. Local FS: POSIX rename REPLACES silently
    // and an exists-check leaves a race window — hard-link (link(2)
    // fails atomically if the destination exists) then drop the temp
    // name. Object stores need a put-if-absent service: see scaladoc.
    val published =
      if (fs.getScheme == "file") {
        try {
          java.nio.file.Files.createLink(
            java.nio.file.Paths.get(dst.toUri.getPath),
            java.nio.file.Paths.get(tmp.toUri.getPath))
          true
        } catch {
          case _: java.nio.file.FileAlreadyExistsException => false
        }
      } else !fs.exists(dst) && fs.rename(tmp, dst)
    if (!published) {
      fs.delete(tmp, false)
      throw new CommitConflictException(
        s"version $version already published at $dst — concurrent writer won; " +
          "re-read the table and retry the merge against the new base")
    }
    if (fs.getScheme == "file") fs.delete(tmp, false)
    version
  }

  /** List the parquet files a commit's write produced, as entries
    * relative to the table root, with partition values parsed from the
    * `col=value` directory names when `partitionCol` is set. */
  private def listCommitFiles(
      fs: FileSystem, root: Path, commitDir: Path,
      partitionCol: Option[String]): Seq[FileEntry] = {
    val it = fs.listFiles(commitDir, true)
    val out = scala.collection.mutable.ArrayBuffer.empty[FileEntry]
    val rootStr = root.toString + "/"
    while (it.hasNext) {
      val st = it.next()
      val p = st.getPath.toString
      if (st.isFile && p.endsWith(".parquet")) {
        val rel = p.stripPrefix(rootStr)
        val bucket = partitionCol.flatMap { c =>
          val re = (java.util.regex.Pattern.quote(c) + "=([^/]+)/").r
          re.findFirstMatchIn(rel + "/").map(_.group(1))
        }
        out += FileEntry(rel, bucket)
      }
    }
    out.toSeq
  }

  private def newCommitDir(root: Path, version: Long): Path =
    new Path(new Path(root, "data"),
      s"v$version-${java.util.UUID.randomUUID().toString.take(8)}")

  /** Per-file min/max of a LONG column for the files just written —
    * one bounded scan of the commit's own data (column-pruned to the
    * stats column), collected as #files rows. */
  private def gatherStats(
      spark: SparkSession, root: Path, entries: Seq[FileEntry],
      statsCol: String): Seq[FileEntry] = {
    val byFile = spark.read.parquet(
        entries.map(f => new Path(root, f.path).toString): _*)
      .groupBy(input_file_name().as("_f"))
      .agg(min(col(statsCol).cast("long")).as("_lo"),
        max(col(statsCol).cast("long")).as("_hi"))
      .collect()
      // a file whose statsCol is all-NULL has NULL min/max: record NO
      // stats for it (readRange's "no stats -> must read" conservative
      // path) instead of NPE-ing the whole commit
      .filterNot(r => r.isNullAt(1) || r.isNullAt(2))
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    entries.map { f =>
      val abs = new Path(root, f.path).toString
      // input_file_name renders a URI; match on suffix to be
      // scheme-normalization-proof
      byFile.collectFirst { case (k, v) if k.endsWith(f.path) || k == abs => v }
        .fold(f)(lohi => f.copy(stats = Some((statsCol, lohi._1, lohi._2))))
    }
  }

  /** Publish `df` as the COMPLETE next version (full replace; also the
    * init path for version 1). Partitioned layout when `partitionCol`
    * is set — required later for [[mergeChangeSet]]'s pruning.
    * `statsCol` records per-file min/max of a long column in the
    * manifest for [[readRange]] file skipping — pair it with a
    * range-clustered `df` (repartitionByRange + sortWithinPartitions)
    * so file ranges are disjoint and skipping actually bites. */
  def commitReplace(
      spark: SparkSession, dir: String, df: DataFrame,
      partitionCol: Option[String] = None,
      statsCol: Option[String] = None): Long = {
    val (fs, root) = fsOf(spark, dir)
    val base = latestVersion(spark, dir).getOrElse(0L)
    val commitDir = newCommitDir(root, base + 1)
    val writer = df.write.mode("errorifexists")
    partitionCol.fold(writer)(c => writer.partitionBy(c))
      .parquet(commitDir.toString)
    val listed = listCommitFiles(fs, root, commitDir, partitionCol)
    val entries = statsCol.fold(listed)(c => gatherStats(spark, root, listed, c))
    commit(fs, root, base, entries, "replace")
  }

  /** Manifest-stats file skipping: read only files whose recorded
    * [min, max] for `statsCol` OVERLAPS [lo, hi] — plus, conservatively,
    * every file without stats for that column — then apply the exact
    * row filter. At 100 TB this is the scan reducer for range
    * predicates on the clustering key: pruning happens on the
    * manifest, before any footer is opened. */
  def readRange(
      spark: SparkSession, dir: String, statsCol: String, lo: Long, hi: Long,
      versionAsOf: Option[Long] = None): DataFrame = {
    val (_, root) = fsOf(spark, dir)
    val v = versionAsOf.orElse(latestVersion(spark, dir)).getOrElse(
      sys.error(s"no committed version at $dir"))
    val m = readManifest(spark, dir, v)
    val hit = m.files.filter { f =>
      f.stats match {
        case Some((c, fLo, fHi)) if c == statsCol => fLo <= hi && fHi >= lo
        case _ => true // no stats for this column -> must read
      }
    }
    val base =
      if (hit.nonEmpty) readFiles(spark, root, hit)
      else readFiles(spark, root, m.files).limit(0)
    base.where(col(statsCol).cast("long").between(lo, hi))
  }

  /** Read entries as one DataFrame. Files are grouped by their commit
    * directory so each group reads with its own `basePath` (restoring
    * the partition column the `col=value` layout encodes); the union
    * is bounded by the number of commits still contributing files. */
  private def readFiles(
      spark: SparkSession, root: Path, files: Seq[FileEntry]): DataFrame = {
    require(files.nonEmpty,
      "cannot read an empty version (schema lives in the data files)")
    val byCommit = files.groupBy(f => f.path.split('/').take(2).mkString("/"))
    byCommit.toSeq.sortBy(_._1).map { case (commitRel, fs0) =>
      spark.read
        .option("basePath", new Path(root, commitRel).toString)
        .parquet(fs0.map(f => new Path(root, f.path).toString): _*)
    // allowMissingColumns: commits published under an EVOLVED schema
    // (mergeChangeSet evolveSchema=true) coexist with carried-forward
    // files of the old shape in the same version — older files read
    // NULL in the added columns, exactly the additive-evolution
    // contract. Identical-schema groups are unaffected.
    }.reduce(_.unionByName(_, allowMissingColumns = true))
  }

  /** Snapshot read: latest version, or `versionAsOf` (time travel). */
  def read(
      spark: SparkSession, dir: String,
      versionAsOf: Option[Long] = None): DataFrame = {
    val (_, root) = fsOf(spark, dir)
    val v = versionAsOf.orElse(latestVersion(spark, dir)).getOrElse(
      sys.error(s"no committed version at $dir"))
    readFiles(spark, root, readManifest(spark, dir, v).files)
  }

  /** Manifest-level partition pruning: read only the files whose
    * bucket is in `buckets` — no listing, no footer reads for pruned
    * files. Empty selection yields an empty frame shaped like the
    * full table (schema from one representative file). */
  def readPruned(
      spark: SparkSession, dir: String, buckets: Set[String],
      versionAsOf: Option[Long] = None): DataFrame = {
    val (_, root) = fsOf(spark, dir)
    val v = versionAsOf.orElse(latestVersion(spark, dir)).getOrElse(
      sys.error(s"no committed version at $dir"))
    val m = readManifest(spark, dir, v)
    val hit = m.files.filter(_.bucket.exists(buckets))
    if (hit.nonEmpty) readFiles(spark, root, hit)
    else readFiles(spark, root, m.files).limit(0)
  }

  /** MERGE a changeset (the [[Cdc.applyChangeSet]] contract: `keyCol`,
    * `opCol` ∈ insert/update/delete, full payload columns) into the
    * table as one atomic commit. Only the files of TOUCHED partitions
    * are read and rewritten; untouched entries carry forward by
    * reference. Readers at any published version are unaffected; a
    * concurrent commit on the same base makes this one throw
    * [[CommitConflictException]] with the table left at the winner's
    * version. Returns the new version.
    *
    * Partition-immutability contract (shared with
    * [[graft.streaming.MergeStream]]): `partitionCol` must be a pure
    * function of `keyCol` (every lane derives it as `key % N`), so an
    * update/delete row always lands in the partition its stored row
    * lives in. A changeset row carrying a DIFFERENT partition value
    * for an existing key would leave the old row alive in a
    * carried-forward file (the touched set comes from the changeset's
    * partition values) — that is a key-relocation, which in a
    * partition-pruned merge is modeled as delete-in-old + insert-in-new.
    * Partition values must also be path-literal (integral / simple
    * strings) — enforced below, because Spark ESCAPES exotic values in
    * directory names while the manifest carries them raw. */
  def mergeChangeSet(
      spark: SparkSession, dir: String, changes: DataFrame,
      keyCol: String, opCol: String, partitionCol: String,
      expectedBase: Option[Long] = None,
      evolveSchema: Boolean = false): Long = {
    val (fs, root) = fsOf(spark, dir)
    // expectedBase = optimistic concurrency from a version the caller
    // read earlier: if someone else committed since, the publication
    // of expectedBase+1 conflicts and this merge throws instead of
    // silently dropping the competing commit's changes
    val base = expectedBase.orElse(latestVersion(spark, dir)).getOrElse(
      sys.error(s"mergeChangeSet needs an initialized table at $dir"))
    val m = readManifest(spark, dir, base)
    // bounded driver collect: ≤ #partition values by definition
    val touched = changes.select(col(partitionCol)).distinct()
      .collect().map(r => String.valueOf(r.get(0))).toSet
    requirePathSafe(touched, partitionCol)
    val (touchedFiles, keep) = m.files.partition(_.bucket.exists(touched))
    val slice =
      if (touchedFiles.nonEmpty) readFiles(spark, root, touchedFiles)
      else readFiles(spark, root, m.files).limit(0)
    // no overwrite-from-own-input here, ever: the merge READS version
    // `base`'s files and WRITES a brand-new commit dir — the
    // localCheckpoint the dynamic-overwrite path needed is gone
    // schema evolution here touches only the REWRITTEN partitions'
    // files; carried-forward files keep the old shape and read NULL in
    // the new columns through readFiles' allowMissingColumns union
    val merged = Cdc.applyChangeSet(slice, changes, keyCol, opCol, evolveSchema)
    val commitDir = newCommitDir(root, base + 1)
    merged.write.mode("errorifexists")
      .partitionBy(partitionCol).parquet(commitDir.toString)
    val fresh = listCommitFiles(fs, root, commitDir, Some(partitionCol))
    commit(fs, root, base, keep ++ fresh, "merge")
  }

  /** [[mergeChangeSet]] under optimistic-concurrency RETRY: on a
    * [[CommitConflictException]] the merge re-reads the (new) latest
    * version and recomputes against it, up to `maxRetries` times —
    * the standard multi-writer loop. Sound because the merge's inputs
    * are re-derived from the fresh base every attempt (nothing of the
    * failed attempt is reused; its data files are vacuum-able
    * orphans). Writers whose changesets touch the same KEYS still
    * serialize correctly: last committed merge wins per key, exactly
    * as sequential application would. */
  def mergeChangeSetWithRetry(
      spark: SparkSession, dir: String, changes: DataFrame,
      keyCol: String, opCol: String, partitionCol: String,
      maxRetries: Int = 5, evolveSchema: Boolean = false): Long = {
    var attempt = 0
    while (true) {
      try return mergeChangeSet(spark, dir, changes, keyCol, opCol,
        partitionCol, evolveSchema = evolveSchema)
      catch {
        case e: CommitConflictException =>
          attempt += 1
          if (attempt > maxRetries) throw e
      }
    }
    -1L // unreachable
  }

  /** OPTIMIZE: rewrite every partition holding more than one file
    * into a single file per partition, published as a normal commit —
    * content-identical, atomic, conflict-detected, and every previous
    * version still time-travels (the old small files stay referenced
    * by the old manifests until [[vacuum]] retires them). Partitions
    * already at one file carry forward by reference. Returns the new
    * version, or the current one if nothing needed compaction.
    *
    * Scale shape: the `repartition(partitionCol)` puts each rewritten
    * partition in exactly one task → exactly one output file; cost ∝
    * the fragmented partitions' bytes, never the table. The
    * size-targeted variant for over-large partitions is
    * [[graft.ingest.Compaction]]'s byte math — here the streaming-
    * sink fragmentation case (many tiny files per partition) is the
    * one the commit log itself creates. */
  def compact(spark: SparkSession, dir: String, partitionCol: String): Long = {
    val (fs, root) = fsOf(spark, dir)
    val base = latestVersion(spark, dir).getOrElse(
      sys.error(s"compact needs an initialized table at $dir"))
    val m = readManifest(spark, dir, base)
    val byBucket = m.files.groupBy(_.bucket)
    val fragmented = byBucket.filter(_._2.size > 1).keys.toSet
    if (fragmented.isEmpty) return base
    val (doomed, keep) = m.files.partition(f => fragmented(f.bucket))
    val merged = readFiles(spark, root, doomed)
      .repartition(col(partitionCol))
    val commitDir = newCommitDir(root, base + 1)
    merged.write.mode("errorifexists")
      .partitionBy(partitionCol).parquet(commitDir.toString)
    val fresh = listCommitFiles(fs, root, commitDir, Some(partitionCol))
    commit(fs, root, base, keep ++ fresh, "compact")
  }

  /** CDC READ: the net changeset that turns version `vFrom` into
    * `vTo`, in [[Cdc.applyChangeSet]]'s own input shape (`keyCol`,
    * `op` ∈ insert/update/delete, full payload) — so
    * `applyChangeSet(read(vFrom), changesBetween(vFrom, vTo))` equals
    * `read(vTo)` (the round-trip [[TxTableSpec]] asserts). Downstream
    * incremental consumers subscribe to this instead of re-diffing
    * snapshots.
    *
    * Scale shape — the manifest IS the diff index: a partition whose
    * FILE LIST is identical in both manifests is byte-identical by
    * the immutability invariant, so only partitions whose file sets
    * differ are read on either side (cost ∝ changed data, not table
    * size; a compaction rewrite makes its partitions "changed" and
    * simply diffs to zero rows). One full-outer join on the key over
    * that slice. */
  def changesBetween(
      spark: SparkSession, dir: String, vFrom: Long, vTo: Long,
      keyCol: String): DataFrame = {
    val (diff, payload) = diffCore(spark, dir, vFrom, vTo, keyCol)
    diff
      .select(col("_k").as(keyCol),
        when(col("_before").isNull, "insert")
          .when(col("_after").isNull, "delete")
          .otherwise("update").as("op"),
        coalesce(col("_after"), col("_before")).as("_p"))
      .select(col(keyCol) +: col("op") +: payload.map(c => col(s"_p.$c")): _*)
  }

  /** [[changesBetween]] with BOTH row images: `(keyCol, op, before,
    * after)` where `before`/`after` are structs of the payload columns
    * (NULL struct for the absent side of an insert/delete). This is
    * the incremental-view-maintenance input shape: an aggregate
    * maintains itself by SUBTRACTING the before image and ADDING the
    * after image — the single-image feed cannot express the subtract
    * half of an update. */
  def changesBetweenImages(
      spark: SparkSession, dir: String, vFrom: Long, vTo: Long,
      keyCol: String): DataFrame = {
    val (diff, _) = diffCore(spark, dir, vFrom, vTo, keyCol)
    diff.select(col("_k").as(keyCol),
      when(col("_before").isNull, "insert")
        .when(col("_after").isNull, "delete")
        .otherwise("update").as("op"),
      col("_before").as("before"),
      col("_after").as("after"))
  }

  /** Shared manifest-pruned full-outer diff: returns the joined frame
    * with `_k`, `_before`, `_after` (rows differing between versions
    * only) plus the payload column list. */
  private def diffCore(
      spark: SparkSession, dir: String, vFrom: Long, vTo: Long,
      keyCol: String): (DataFrame, Seq[String]) = {
    val (_, root) = fsOf(spark, dir)
    val ma = readManifest(spark, dir, vFrom)
    val mb = readManifest(spark, dir, vTo)
    def byBucket(m: Manifest): Map[Option[String], Set[String]] =
      m.files.groupBy(_.bucket).map { case (b, fs0) => b -> fs0.map(_.path).toSet }
    val fa = byBucket(ma); val fb = byBucket(mb)
    val changed = (fa.keySet ++ fb.keySet)
      .filter(b => fa.getOrElse(b, Set.empty) != fb.getOrElse(b, Set.empty))
    def slice(m: Manifest): DataFrame = {
      val hit = m.files.filter(f => changed(f.bucket))
      if (hit.nonEmpty) readFiles(spark, root, hit)
      else readFiles(spark, root, (ma.files ++ mb.files).distinct).limit(0)
    }
    val a = slice(ma); val b = slice(mb)
    // payload = UNION of both versions' columns: vTo may carry columns
    // evolution added after vFrom (and vice versa under time travel) —
    // diffing on one side's columns alone would silently drop the
    // evolved column from the feed AND misclassify rows differing only
    // in it as unchanged. The side lacking a column contributes typed
    // NULLs, exactly what applyChangeSet(evolveSchema = true) replays.
    val payload = (a.columns ++ b.columns).distinct.filterNot(_ == keyCol).toSeq
    def widen(df: DataFrame, other: DataFrame): DataFrame =
      payload.foldLeft(df) { (d, c) =>
        if (d.columns.contains(c)) d
        else d.withColumn(c, lit(null).cast(other.schema(c).dataType))
      }
    val aw = widen(a, b); val bw = widen(b, a)
    val af = aw.select(col(keyCol).as("_k"),
      struct(payload.map(col): _*).as("_before"))
    val bf = bw.select(col(keyCol).as("_k"),
      struct(payload.map(col): _*).as("_after"))
    val diff = af.join(bf, Seq("_k"), "full_outer")
      .where(col("_before").isNull || col("_after").isNull ||
        !(col("_before") <=> col("_after")))
    (diff, payload)
  }

  /** Shared machinery for predicate DML ([[deleteWhere]] /
    * [[updateWhere]]): ONE pass over the current version finds the
    * files that actually CONTAIN matching rows (bounded collect —
    * ≤ #files); only those are rewritten through `transform`, every
    * other file entry carries forward by reference, and the result is
    * one atomic commit. `transform` must preserve non-matching rows
    * (the wrappers do). Returns the committed version — the current
    * one unchanged if nothing matched. */
  private def rewriteTouched(
      spark: SparkSession, dir: String, pred: org.apache.spark.sql.Column,
      partitionCol: Option[String], op: String)(
      transform: DataFrame => DataFrame): Long = {
    val (fs, root) = fsOf(spark, dir)
    val base = latestVersion(spark, dir).getOrElse(
      sys.error(s"DML needs an initialized table at $dir"))
    val m = readManifest(spark, dir, base)
    val touchedPaths = readFiles(spark, root, m.files)
      .where(pred)
      .select(input_file_name().as("_f")).distinct()
      .collect().map(_.getString(0)).toSet
    if (touchedPaths.isEmpty) return base
    def isTouched(f: FileEntry): Boolean = {
      val abs = new Path(root, f.path).toString
      touchedPaths.exists(p => p == abs || p.endsWith(f.path))
    }
    val (doomed, keep) = m.files.partition(isTouched)
    val rewritten = transform(readFiles(spark, root, doomed))
    val commitDir = newCommitDir(root, base + 1)
    val writer = rewritten.write.mode("errorifexists")
    partitionCol.fold(writer)(c => writer.partitionBy(c))
      .parquet(commitDir.toString)
    commit(fs, root, base,
      keep ++ listCommitFiles(fs, root, commitDir, partitionCol), op)
  }

  /** DELETE WHERE as an atomic commit: rows matching `pred` are
    * removed; only files CONTAINING matches are rewritten (file-level
    * pruning — at 100 TB a point delete rewrites a handful of files,
    * not the table), the rest carry by reference, and every previous
    * version still time-travels with the rows present. */
  def deleteWhere(
      spark: SparkSession, dir: String, pred: org.apache.spark.sql.Column,
      partitionCol: Option[String] = None): Long =
    // delete only rows where pred is definitively TRUE: a NULL
    // predicate must KEEP the row — `!pred` would drop NULL rows in
    // rewritten files while identical rows in untouched files survive
    // (file-placement-dependent results)
    rewriteTouched(spark, dir, pred, partitionCol, "delete")(
      _.where(!coalesce(pred, lit(false))))

  /** UPDATE ... SET assignments WHERE pred, same economics as
    * [[deleteWhere]]: non-matching rows in touched files are rewritten
    * verbatim; untouched files never move.
    *
    * SQL UPDATE semantics: the predicate AND every assignment's
    * right-hand side are evaluated against the OLD row — they are
    * staged into temp columns BEFORE any target column mutates, so a
    * later assignment never sees an earlier one's write (a naive
    * sequential `withColumn(c, when(pred, e))` fold would re-evaluate
    * `pred` and RHS against already-mutated columns). */
  def updateWhere(
      spark: SparkSession, dir: String, pred: org.apache.spark.sql.Column,
      assignments: Seq[(String, org.apache.spark.sql.Column)],
      partitionCol: Option[String] = None): Long =
    rewriteTouched(spark, dir, pred, partitionCol, "update") { df =>
      val staged = assignments.zipWithIndex.map { case ((c, e), i) =>
        (c, s"__graft_set_$i", e)
      }
      val withOldValues = staged.foldLeft(
        df.withColumn("__graft_pred", coalesce(pred, lit(false)))) {
        case (d, (_, tmp, e)) => d.withColumn(tmp, e)
      }
      val applied = staged.foldLeft(withOldValues) { case (d, (c, tmp, _)) =>
        d.withColumn(c, when(col("__graft_pred"), col(tmp)).otherwise(col(c)))
      }
      applied.drop("__graft_pred" +: staged.map(_._2): _*)
    }

  /** Reclaim files referenced by NO manifest and, when `keepVersions`
    * is set, drop manifests older than the newest `keepVersions` first
    * (time travel shrinks accordingly). Returns the number of data
    * files deleted.
    *
    * Retention guard: an IN-FLIGHT commit's data files are also
    * "referenced by no manifest" until its publish — deleting them
    * would corrupt the version it is about to publish. Files modified
    * within `retentionMs` of now are therefore spared (the Delta
    * VACUUM retention discipline; default 7 days). Pass 0 only when
    * no writer can be active (tests, decommission). Unreferenced
    * files OLDER than any plausible commit duration truly can never
    * become referenced — publication always targets freshly written
    * dirs. */
  def vacuum(
      spark: SparkSession, dir: String,
      keepVersions: Option[Int] = None,
      retentionMs: Long = 7L * 24 * 3600 * 1000): Int = {
    val (fs, root) = fsOf(spark, dir)
    val ld = logDir(root)
    if (!fs.exists(ld)) return 0
    val versions = fs.listStatus(ld).toSeq.map(_.getPath.getName).collect {
      case ManifestName(d) => d.toLong
    }.sorted
    val dropped = keepVersions match {
      case Some(k) if versions.size > k => versions.dropRight(k)
      case _ => Seq.empty
    }
    dropped.foreach(v => fs.delete(manifestPath(root, v), false))
    val live = (versions.diff(dropped)).flatMap(v =>
      readManifest(spark, dir, v).files.map(_.path)).toSet
    val dataDir = new Path(root, "data")
    if (!fs.exists(dataDir)) return 0
    val cutoff = System.currentTimeMillis() - retentionMs
    val it = fs.listFiles(dataDir, true)
    val rootStr = root.toString + "/"
    var n = 0
    val doomed = scala.collection.mutable.ArrayBuffer.empty[Path]
    while (it.hasNext) {
      val st = it.next()
      val rel = st.getPath.toString.stripPrefix(rootStr)
      if (st.isFile && rel.endsWith(".parquet") && !live(rel) &&
        st.getModificationTime <= cutoff) doomed += st.getPath
    }
    doomed.foreach { p => if (fs.delete(p, false)) n += 1 }
    n
  }
}
