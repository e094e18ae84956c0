package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One verifiable engine query: a Spark plan plus (when SQL-expressible)
  * its DuckDB oracle. Column names/aliases must match between the two —
  * the driver's compare sorts columns by name before hashing.
  *
  * Float discipline (so cross-engine hash comparison is stable):
  *   - per-row arithmetic: left exact (IEEE ops are order-free);
  *   - double aggregates (avg/var/t): rounded to 4 decimals;
  *   - double sums: accumulated as DECIMAL (exact, order-free) and cast
  *     back to double;
  *   - sort keys: never nullable (Spark sorts NULLS FIRST, DuckDB
  *     NULLS LAST).
  */
final case class Q(
    name: String,
    run: (SparkSession, String) => DataFrame,
    oracle: Option[String])

object Q {
  def apply(name: String, oracle: String)(run: (SparkSession, String) => DataFrame): Q =
    Q(name, run, Some(oracle))
  def noOracle(name: String)(run: (SparkSession, String) => DataFrame): Q =
    Q(name, run, None)
}
