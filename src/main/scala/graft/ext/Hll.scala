package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** HyperLogLog distinct-count sketch (Flajolet et al. 2007) built from
  * plain Catalyst aggregates — no UDAF, no custom state.
  *
  * Shape: hash each id to 60 bits, split into an 8-bit register index
  * and a 52-bit suffix; a register's value is the max over the group of
  * `rho(suffix)` (position of the leftmost 1-bit, i.e. leading zeros
  * + 1). The register frame is a `groupBy(keys, register).agg(max)` —
  * max is its own combiner, so at 100 TB every partition reduces to at
  * most `#keys x 256` rows map-side before the one tiny shuffle; the
  * raw ids never shuffle. Register frames with the same key split are
  * elementwise-max mergeable (union then re-max), which is how
  * snapshots/partitions compose incrementally.
  *
  * Estimate determinism: instead of `sum(2^-M[j])` in floating point
  * (order-dependent once the terms span >53 bits), the registers are
  * folded as the EXACT integer `S = sum(2^(53-M[j])) + V*2^53` (each
  * term a long, total < 2^62), and the estimate is one double division
  * `alpha*m^2*2^53 / S` — bitwise reproducible on any engine, which is
  * what lets the DuckDB oracle mirror the estimate exactly
  * ([[graft.ScaleOpsQueries]] q105). Registers empty in the group (V of
  * them) contribute 2^53 each (M=0). The small-range branch is standard
  * linear counting `m*ln(m/V)`; `ln` is the one transcendental, so
  * query lanes round the final estimate (the q65 bridge).
  *
  * Two hash lanes, same discipline as [[CountMin]]/[[Dedup]]:
  * `mirrorable = true` uses the md5 60-bit hex prefix (SQL-expressible
  * bit for bit), the production default is `xxhash64` (codegen'd, one
  * pass, no digest allocation). Standard error ~ 1.04/sqrt(256) = 6.5%
  * either way; [[graft.ext.HllSpec]] checks both lanes against exact
  * counts.
  */
object Hll {

  /** Register count m = 2^8; fixed so the affine estimate constant can
    * be a compile-time literal shared with the SQL mirror. */
  final val M = 256
  final val SuffixBits = 52

  /** alpha_m for m = 256 (Flajolet's bias correction). */
  final val Alpha: Double = 0.7213 / (1.0 + 1.079 / M)

  /** The whole numerator `alpha * m^2 * 2^53` folded to one double so
    * both engines parse the identical literal instead of re-deriving
    * it through their own constant folding. */
  final val Numerator: Double = Alpha * M * M * 9007199254740992.0

  /** Linear-counting cutover: raw estimate <= 2.5 * m. */
  final val SmallRange: Double = 2.5 * M

  private val SuffixMask = (1L << SuffixBits) - 1

  /** 60-bit mirrorable hash: first 15 hex chars of md5 (the repo-wide
    * oracle-lane recipe, cf. [[Dedup]] / [[CountMin.md5Base]]). */
  private def md5Hash60(id: Column): Column =
    conv(substring(md5(id.cast("string")), 1, 15), 16, 10).cast("long")

  /** 60-bit production hash: low 60 bits of xxhash64 (sign-free).
    * NULL-SAFE BY HAND: Spark's `xxhash64(NULL)` is the SEED (42),
    * not NULL — unguarded, a NULL id would count as one phantom
    * distinct value in this lane while the md5 lane (whose chain is
    * null-propagating) ignores it. DISTINCT-count semantics ignore
    * NULLs (`count(DISTINCT col)` does), so both lanes must too —
    * found by the r15 edge sweep, regression-locked in HllSpec. */
  private def xx60(id: Column): Column = {
    val s = id.cast("string")
    when(s.isNull, lit(null).cast("long"))
      .otherwise(xxhash64(s).bitwiseAND(lit((1L << 60) - 1)))
  }

  /** The 60-bit hash lane as a public column — the input contract of
    * [[HllRegs]] (the byte-array register aggregate [[graft.ext
    * .TxTable]] records per file for manifest NDV). Same two lanes as
    * [[registers]]: md5 prefix when `mirrorable`, xxhash64 otherwise. */
  def hash60(id: Column, mirrorable: Boolean = false): Column =
    if (mirrorable) md5Hash60(id) else xx60(id)

  /** Element-wise max — the HLL composition law on the byte-array
    * register face ([[HllRegs]] output). EXACT: registers are maxima
    * over rows, so merging per-file sketches of disjoint row sets
    * yields byte-identical state to sketching the union directly. */
  def mergeRegisters(a: Array[Byte], b: Array[Byte]): Array[Byte] = {
    require(a.length == M && b.length == M,
      s"register arrays must be $M bytes: ${a.length}, ${b.length}")
    val out = new Array[Byte](M)
    var i = 0
    while (i < M) { out(i) = if (a(i) >= b(i)) a(i) else b(i); i += 1 }
    out
  }

  /** [[estimate]]'s math on one byte-array register sketch (driver
    * side, for manifest-only NDV answers): identical integer fold —
    * `S = sum(2^(53-M[j]))` with empty registers contributing 2^53 —
    * then the one double division, plus the linear-counting branch. */
  def estimateFromRegisters(regs: Array[Byte]): Double = {
    require(regs.length == M, s"register array must be $M bytes: ${regs.length}")
    var s = 0L
    var v = 0
    var j = 0
    while (j < M) {
      val m = regs(j)
      if (m == 0) { v += 1; s += 1L << (SuffixBits + 1) }
      else s += 1L << (SuffixBits + 1 - m)
      j += 1
    }
    val raw = Numerator / s.toDouble
    if (v > 0 && raw <= SmallRange) M.toDouble * math.log(M.toDouble / v)
    else raw
  }

  /** Per-key register frame: `keys..., reg (0..255), m (1..53)`.
    * This is the mergeable sketch state — persist it, union it with a
    * later snapshot's registers and re-`max`, or feed it straight to
    * [[estimate]]. */
  def registers(df: DataFrame, keys: Seq[String], id: Column,
      mirrorable: Boolean = false): DataFrame = {
    val h = if (mirrorable) md5Hash60(id) else xx60(id)
    val withBits = df
      .withColumn("_h60", h)
      // NULL ids hash to NULL (both lanes) and must not form a
      // phantom NULL-register group — that would inflate n_regs and
      // corrupt v_empty/s_total in estimate() (r15 edge sweep)
      .filter(col("_h60").isNotNull)
      .withColumn("_reg", shiftright(col("_h60"), SuffixBits))
      .withColumn("_suf", col("_h60").bitwiseAND(lit(SuffixMask)))
      // rho = leading zeros in the 52-bit suffix + 1; bin() prints no
      // leading zeros, so rho = 53 - len(bin); all-zero suffix -> 53.
      .withColumn("_rho",
        when(col("_suf") === 0, lit(SuffixBits + 1))
          .otherwise(lit(SuffixBits + 1) - length(bin(col("_suf")))))
    withBits
      .groupBy((keys.map(col) :+ col("_reg").as("reg")): _*)
      .agg(max(col("_rho")).cast("int").as("m"))
  }

  /** Fold a register frame to one row per key:
    * `n_regs, v_empty, s_total (exact long), est_distinct (double,
    * UNROUNDED — query lanes round it)`. */
  def estimate(regs: DataFrame, keys: Seq[String]): DataFrame = {
    val folded = regs
      .groupBy(keys.map(col): _*)
      .agg(
        count(lit(1)).as("n_regs"),
        sum(expr(s"shiftleft(CAST(1 AS BIGINT), ${SuffixBits + 1} - m)")).as("_s_present"))
      .withColumn("v_empty", lit(M.toLong) - col("n_regs"))
      .withColumn("s_total",
        col("_s_present") + col("v_empty") * lit(1L << (SuffixBits + 1)))
      .drop("_s_present")
    val raw = lit(Numerator) / col("s_total").cast("double")
    folded.withColumn("est_distinct",
      when(col("v_empty") > 0 && raw <= lit(SmallRange),
        lit(M.toDouble) * log(lit(M.toDouble) / col("v_empty")))
        .otherwise(raw))
  }

  /** One-shot convenience: sketch + estimate per key group. */
  def distinctEstimate(df: DataFrame, keys: Seq[String], id: Column,
      mirrorable: Boolean = false): DataFrame =
    estimate(registers(df, keys, id, mirrorable), keys)
}
