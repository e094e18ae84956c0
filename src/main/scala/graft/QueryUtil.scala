package graft

import org.apache.spark.sql.DataFrame

/** Shared helpers for the query batches (single implementation — the
  * per-batch privates delegate here). */
object QueryUtil {

  /** Collect a BOUNDED result and rebuild it as a local frame, so
    * round-trip temp dirs can be deleted instead of pinned under a
    * lazy plan (the EventsStream read-back contract). Callers must
    * know the frame is output-sized — this drives a driver collect —
    * and the contract is ENFORCED: past `maxRows` the call fails loud
    * (via a `limit(maxRows + 1)` collect, so the driver never holds
    * more than maxRows + 1 rows) instead of becoming a silent
    * collect-the-corpus driver OOM at scale. The default (1 M rows) is
    * orders of magnitude above any report-shaped result and orders of
    * magnitude below anything a 100 TB corpus would fan out. */
  def localized(df: DataFrame, maxRows: Int = 1000000): DataFrame = {
    val rows = df.limit(maxRows + 1).collect().toSeq
    if (rows.length > maxRows) throw new IllegalStateException(
      s"QueryUtil.localized: result exceeds maxRows=$maxRows — " +
        "this helper is for output-sized frames only (see scaladoc); " +
        "raise maxRows explicitly if the bound is genuinely intended")
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
