package graft.ext

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Greedy sequence packing: assign consecutive documents to fixed
  * token-budget training sequences.
  *
  * The operator every LLM data pipeline runs last: documents are
  * concatenated into `budget`-token sequences (a doc opens a new
  * sequence when it no longer fits; a doc longer than the budget
  * occupies a sequence of its own). Packing is inherently a stateful
  * left-to-right scan — a running token accumulator — so it is NOT a
  * window function (`floor(cumsum/budget)` is a different, split-doc
  * semantics). The Spark-native form is a per-group sorted iterator
  * fold: `groupByKey(shard).flatMapSortedGroups(orderBy doc_id)`.
  *
  * Scale contract (100 TB): packing is embarrassingly parallel across
  * SHARDS, and strictly sequential within one. Shard count = desired
  * parallelism (a deterministic function of the doc id, so results are
  * reproducible across cluster sizes and reruns). Each task streams
  * its shard's iterator — O(1) state (accumulator + counter), no
  * materialized group, no OOM risk on a big shard. The determinism
  * mirror is a DuckDB recursive CTE over the same (shard, doc order).
  */
object Packing {

  final case class PackedDoc(doc_id: Long, shard: Long, seq: Long, n_tokens: Int)

  /** Pack `docs` into `budget`-token sequences within `numShards`
    * deterministic shards (shard = doc_id % numShards, scan order =
    * doc_id ascending). Returns (doc_id, shard, seq, n_tokens) where
    * `seq` numbers sequences within the shard from 0. */
  def packSequences(
      spark: SparkSession,
      docs: DataFrame,
      idCol: String = "doc_id",
      textCol: String = "text",
      budget: Int = 512,
      numShards: Int = 8): Dataset[PackedDoc] = {
    import spark.implicits._
    val sized = docs.select(
        col(idCol).cast("long").as("doc_id"),
        (col(idCol).cast("long") % numShards).as("shard"),
        TextAnalysis.tokenCount(col(textCol)).cast("int").as("n_tokens"))
      .as[(Long, Long, Int)]
    sized
      .groupByKey(_._2)
      .flatMapSortedGroups($"doc_id") { (shard: Long, it: Iterator[(Long, Long, Int)]) =>
        // O(1)-state greedy fold over the shard's sorted doc stream
        var acc = 0L
        var seq = -1L
        it.map { case (id, _, n) =>
          if (seq < 0 || acc + n > budget) { seq += 1; acc = n.toLong }
          else acc += n
          PackedDoc(id, shard, seq, n)
        }
      }
  }
}
