package graft.ext

import org.apache.hadoop.fs.{FileSystem, Path}

/** Commit-log I/O seam for [[TxTable]] — the pluggability point an
  * object-store deployment swaps (S3-style stores have no atomic
  * rename, so `writeIfAbsent` there must ride a put-if-absent /
  * conditional-PUT coordination service, exactly as Delta's LogStore
  * does). Everything the table layer does to the log goes through
  * these four methods; DATA files stay on Spark's own parquet
  * reader/writer (immutable, so they need no atomicity protocol).
  *
  * Contract:
  *   - [[writeIfAbsent]] is the ONLY publish primitive and must be
  *     atomic all-or-nothing: concurrent callers on the same path see
  *     exactly one `true`; a reader never observes a partial file.
  *   - [[list]]/[[read]]/[[delete]] need only ordinary consistency
  *     (the log dir is small — one entry per version plus periodic
  *     checkpoints).
  */
trait LogStore {
  /** Names (not paths) of the direct children of `dir`; empty if the
    * directory does not exist. */
  def list(dir: Path): Seq[String]

  def read(path: Path): String

  /** Atomic put-if-absent publish: true iff THIS call created the
    * file. False means a competing writer won — the caller must treat
    * the version as taken. */
  def writeIfAbsent(path: Path, content: String): Boolean

  def delete(path: Path): Unit
}

/** The HDFS/local implementation. HDFS: `rename` refuses an existing
  * destination atomically. Local FS: POSIX rename REPLACES silently
  * and an exists-check leaves a race window — hard-link (link(2)
  * fails atomically if the destination exists) then drop the temp
  * name. */
final class HadoopLogStore(fs: FileSystem) extends LogStore {

  override def list(dir: Path): Seq[String] =
    if (!fs.exists(dir)) Seq.empty
    else fs.listStatus(dir).toSeq.map(_.getPath.getName)

  override def read(path: Path): String = {
    val in = fs.open(path)
    try scala.io.Source.fromInputStream(in, "UTF-8").mkString
    finally in.close()
  }

  override def writeIfAbsent(path: Path, content: String): Boolean = {
    val dir = path.getParent
    fs.mkdirs(dir)
    // staged dot-prefixed (hidden from Spark file sources — the change
    // feed streams this directory), then published without overwrite
    val tmp = new Path(dir, s".tmp-${java.util.UUID.randomUUID().toString}.json")
    val out = fs.create(tmp, false)
    try out.write(content.getBytes("UTF-8"))
    finally out.close()
    val published =
      if (fs.getScheme == "file") {
        try {
          java.nio.file.Files.createLink(
            java.nio.file.Paths.get(path.toUri.getPath),
            java.nio.file.Paths.get(tmp.toUri.getPath))
          true
        } catch {
          case _: java.nio.file.FileAlreadyExistsException => false
        }
      } else !fs.exists(path) && fs.rename(tmp, path)
    if (!published || fs.getScheme == "file") fs.delete(tmp, false)
    published
  }

  override def delete(path: Path): Unit = {
    fs.delete(path, false)
    ()
  }
}
