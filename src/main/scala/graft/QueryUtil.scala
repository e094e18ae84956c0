package graft

import org.apache.spark.sql.DataFrame

/** Shared helpers for the query batches (single implementation — the
  * per-batch privates delegate here). */
object QueryUtil {

  /** Collect a BOUNDED result and rebuild it as a local frame, so
    * round-trip temp dirs can be deleted instead of pinned under a
    * lazy plan (the EventsStream read-back contract). Callers must
    * know the frame is output-sized — this drives a driver collect. */
  def localized(df: DataFrame): DataFrame = {
    val rows = df.collect().toSeq
    val schema = df.schema
    import scala.jdk.CollectionConverters._
    df.sparkSession.createDataFrame(rows.asJava, schema)
  }

  /** Run `f` against a fresh temp directory, deleting the tree on ANY
    * exit path. */
  def inTempDir[T](prefix: String)(f: String => T): T = {
    val dir = java.nio.file.Files.createTempDirectory(prefix)
      .toFile.getAbsolutePath
    try f(dir)
    finally Fs.deleteTree(java.nio.file.Paths.get(dir))
  }
}
