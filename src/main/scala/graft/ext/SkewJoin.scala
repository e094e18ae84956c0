package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Salted equi-join for skewed keys.
  *
  * First line of defense is AQE's runtime skew-join splitting
  * (`spark.sql.adaptive.skewJoin.enabled`, on by default) — prefer it.
  * Pre-salting is for the cases AQE cannot fix: a skewed key whose
  * matching build-side rows must co-locate anyway (AQE splits only
  * sort-merge partitions, not the hash buckets of an already-built
  * map), or a deliberate layout where downstream stages reuse the
  * salted partitioning.
  *
  * Mechanics: the probe (large, skewed) side gets a deterministic salt
  * in [0, S) derived from hashing its non-key columns; the build side
  * is replicated S times with every salt value. The join key becomes
  * (key, salt) so one hot key spreads over S partitions. Build-side
  * cost: ×S rows — keep S modest and the build side small.
  */
object SkewJoin {

  /** Inner/left equi-join of `probe` (skewed) with `build` (small) on
    * `key`, spreading each probe key over `salts` partitions. */
  def saltedJoin(
      probe: DataFrame,
      build: DataFrame,
      key: String,
      salts: Int,
      joinType: String = "inner"): DataFrame = {
    require(salts > 0, "salts must be positive")
    // Per-ROW salt, not a payload hash: a hot key whose rows share the
    // same payload (duplicates, low-cardinality columns) would hash to
    // ONE salt and stay in one partition — paying the build-side ×S
    // replication for zero spreading. rand(seed) is evaluated per row
    // and is deterministic per (partition, row-offset), so retries
    // re-derive the same salt; any salt assignment joins correctly
    // because the build side is replicated to every salt.
    val salted = probe.withColumn("_salt", (rand(42) * salts).cast("int"))
    val replicated = build
      .withColumn("_salt", explode(sequence(lit(0), lit(salts - 1))))
    salted.join(replicated, salted("_salt") === replicated("_salt") &&
        salted(key) === replicated(key), joinType)
      .drop(salted("_salt")).drop(replicated("_salt")).drop(replicated(key))
  }
}
