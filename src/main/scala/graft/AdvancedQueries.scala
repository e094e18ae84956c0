package graft

import org.apache.spark.sql.functions._
import graft.analysis.EventsFact
import graft.ext.{AsOfJoin, Sessionize, Similarity}

/** Advanced relational/temporal operators beyond the reference's
  * surface (SURVEY §7.2 M4/M5 breadth): as-of join, sessionization,
  * range (band) join, embedding near-dup. Oracles mirror the Spark
  * shape op-for-op; timestamps compare as epoch micros (both engines
  * floor-truncate the parquet nanos).
  */
object AdvancedQueries {

  val all: Seq[Q] = Seq(

    // As-of join: each purchase attached to the user's most recent
    // signup at-or-before it (inclusive), NULL when none precedes.
    // DuckDB's native ASOF JOIN is the oracle for our union+window plan.
    Q("q40_asof_join",
      """WITH p AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'),
        |s AS (SELECT DISTINCT user_id, ts AS sts, epoch_us(ts) AS signup_us
        |      FROM events WHERE event_type = 'signup')
        |SELECT p.event_id, p.user_id,
        |  epoch_us(p.ts) AS purchase_us,
        |  s.signup_us,
        |  epoch_us(p.ts) - s.signup_us AS gap_us
        |FROM p ASOF LEFT JOIN s ON p.user_id = s.user_id AND p.ts >= s.sts
        |ORDER BY event_id""".stripMargin) { (s, dir) =>
      val ev = EventsFact.events(s, dir)
      val purchases = ev.filter(col("event_type") === "purchase")
        .select("user_id", "event_id", "ts")
      val signups = ev.filter(col("event_type") === "signup")
        .select(col("user_id"), col("ts").as("sts"), unix_micros(col("ts")).as("signup_us"))
        .distinct()
      AsOfJoin.asOf(purchases, signups, Seq("user_id"), "ts", "sts", Seq("signup_us"))
        .select(
          col("event_id"), col("user_id"),
          unix_micros(col("ts")).as("purchase_us"),
          col("asof_signup_us").as("signup_us"),
          (unix_micros(col("ts")) - col("asof_signup_us")).as("gap_us"))
        .orderBy("event_id")
    },

    // As-of join with a max-staleness tolerance (feature-store
    // variant): a signup older than 7 days no longer qualifies — the
    // match is NULLed, not re-matched. Oracle: DuckDB ASOF + gap
    // filter (the match itself is unchanged; only its visibility is).
    Q("q56_asof_tolerance",
      """WITH p AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'),
        |s AS (SELECT DISTINCT user_id, ts AS sts, epoch_us(ts) AS signup_us
        |      FROM events WHERE event_type = 'signup')
        |SELECT p.event_id, p.user_id,
        |  epoch_us(p.ts) AS purchase_us,
        |  CASE WHEN epoch_us(p.ts) - s.signup_us <= 604800000000
        |       THEN s.signup_us END AS signup_us
        |FROM p ASOF LEFT JOIN s ON p.user_id = s.user_id AND p.ts >= s.sts
        |ORDER BY event_id""".stripMargin) { (s, dir) =>
      val ev = EventsFact.events(s, dir)
      val purchases = ev.filter(col("event_type") === "purchase")
        .select("user_id", "event_id", "ts")
      val signups = ev.filter(col("event_type") === "signup")
        .select(col("user_id"), col("ts").as("sts"), unix_micros(col("ts")).as("signup_us"))
        .distinct()
      AsOfJoin.asOf(purchases, signups, Seq("user_id"), "ts", "sts", Seq("signup_us"),
          tolerance = Some(expr("INTERVAL 7 DAYS")))
        .select(
          col("event_id"), col("user_id"),
          unix_micros(col("ts")).as("purchase_us"),
          col("asof_signup_us").as("signup_us"))
        .orderBy("event_id")
    },

    // Gap sessionization (1-day gap): per-user ordered window boundary
    // flags + running sum, then one grouped agg per session.
    Q("q41_sessionization",
      """WITH e AS (
        |  SELECT user_id, ts, epoch_us(ts) // 1000000 AS sec FROM events),
        |m AS (
        |  SELECT user_id, ts, sec,
        |    CASE WHEN sec - lag(sec) OVER (PARTITION BY user_id ORDER BY ts) > 86400
        |      THEN 1 ELSE 0 END AS boundary
        |  FROM e),
        |x AS (
        |  SELECT user_id, ts, sec,
        |    CAST(sum(boundary) OVER (PARTITION BY user_id ORDER BY ts
        |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_idx
        |  FROM m)
        |SELECT user_id, session_idx, count(*) AS n_events,
        |  min(epoch_us(ts)) AS start_us, max(epoch_us(ts)) AS end_us,
        |  max(sec) - min(sec) AS duration_s
        |FROM x GROUP BY user_id, session_idx
        |ORDER BY user_id, session_idx""".stripMargin) { (s, dir) =>
      Sessionize.sessions(EventsFact.events(s, dir), "user_id", "ts", gapSeconds = 86400)
        .select(
          col("user_id"), col("session_idx"), col("n_events"),
          unix_micros(col("session_start")).as("start_us"),
          unix_micros(col("session_end")).as("end_us"),
          col("duration_s"))
        .orderBy("user_id", "session_idx")
    },

    // Range (band) join: fact column joined into a bounded interval dim
    // — broadcast the dim, inequality predicate, aggregate per band.
    Q("q42_range_join",
      """WITH bands(band, lo, hi) AS (VALUES
        |  ('low', 1, 10), ('mid', 11, 30), ('high', 31, 50))
        |SELECT band, count(*) AS n_items,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty
        |FROM lineitem JOIN bands ON l_quantity BETWEEN lo AND hi
        |GROUP BY band ORDER BY band""".stripMargin) { (s, dir) =>
      import s.implicits._
      val bands = broadcast(Seq(("low", 1, 10), ("mid", 11, 30), ("high", 31, 50))
        .toDF("band", "lo", "hi"))
      s.read.parquet(s"$dir/lineitem.parquet")
        .join(bands, col("l_quantity").between(col("lo"), col("hi")))
        .groupBy("band")
        .agg(count(lit(1)).as("n_items"),
          sum(col("l_quantity").cast("decimal(18,4)")).cast("double").as("sum_qty"))
        .orderBy("band")
    },

    // Embedding-cosine near-dup triage: the closest pair within every
    // label block (exact blocked pairwise cosine; synthetic data has no
    // pairs above a real dup threshold — the thresholded operator is
    // Similarity.nearDupPairs, property-tested in SimilaritySpec).
    Q("q43_embedding_neardup", AdvancedOracles.embeddingNearDup) { (s, dir) =>
      Similarity.closestPairPerBlock(s.read.parquet(s"$dir/embeddings.parquet"), "label")
        .orderBy("block")
    },

    // SimHash banded near-dup pairs (pigeonhole Hamming search),
    // oracle-exact IN THE SCALE-SAFE CONFIGURATION: md5-SimHash
    // fingerprints (cross-engine long arithmetic) through the REAL
    // banded machinery with a bounded bucket cap and the salted
    // sub-bucket degraded mode — the guard that keeps one degenerate
    // band (boilerplate/empty docs sharing a fingerprint prefix) from
    // going quadratic in a single join at scale. The SQL mirror
    // reproduces the capped star + md5-salted sub-bucket split exactly
    // (Dedup.saltOf is md5-based precisely so it is SQL-expressible;
    // same recipe as q81), and sf0.01's band buckets reach ~54 members,
    // so the degraded lanes run FOR REAL under the oracle. The murmur3
    // SimHash64 production path keeps its banded==brute-force DedupSpec
    // property.
    Q("q44_simhash_neardup",
      graft.ExtensionOracles.md5SimHashPairsSql(48, maxHamming = 3, maxBucket = 16)) { (s, dir) =>
      graft.ext.Dedup.simhashNearDupPairsFromSignatures(
          graft.ext.Dedup.md5SignaturesFor(s, dir),
          sigBits = 48, maxHamming = 3, maxBucket = 16, saltOversized = true)
        .orderBy("a_id", "b_id")
    },

    // IVF ANN with the exactness bound: probe the 3 nearest
    // spherical-k-means cells, widen only to cells whose
    // triangle-inequality bound (1 − max(0, ‖q−c‖ − r)²/2) could still
    // beat the provisional k-th sim, exact cosine over the probed set.
    // Training/cells/radii have no SQL twin, but the bound makes the
    // returned rows PROVABLY the exact top-k — so the oracle is plain
    // brute-force cosine SQL (the re-rank lane). IvfSpec keeps the
    // narrow-probe recall lane on Ivf.topK and asserts the bound
    // actually prunes cells on clustered data.
    Q("q45_ann_ivf", ExtensionOracles.cosineTopKSql(7L, 20)) { (s, dir) =>
      val emb = s.read.parquet(s"$dir/embeddings.parquet")
      val centroids = graft.ext.Ivf.centroidsFor(emb, dir, k = 8, iters = 3)
      val radii = graft.ext.Ivf.radiiFor(emb, dir, centroids)
      // the persisted cell-assignment memo: probe jobs read the cached
      // (id, label, unit, cell) frame instead of re-deriving it per pass
      graft.ext.Ivf.topKExactCached(emb, dir, 7L, 20, centroids, radii, nProbe0 = 3)
    },

    // IVF index as a VERSIONED ASSET (the vocab-freeze pattern, q184,
    // applied to the ANN index): centroids train once, freeze as a
    // TxTable version, and the query loads them AS OF that version —
    // so search behavior is reproducible across corpus recomputes and
    // retrains instead of depending on whatever the session last
    // trained. Radii re-measure against the live corpus (the exactness
    // bound needs them current — Ivf.freeze scaladoc); the bound makes
    // the rows PROVABLY the exact top-k, so the oracle stays plain
    // brute-force cosine SQL. IvfSpec pins byte-identical reload and
    // old-version stability across a corpus append.
    Q("q188_ann_frozen_index", ExtensionOracles.cosineTopKSql(11L, 20)) { (s, dir) =>
      val emb = s.read.parquet(s"$dir/embeddings.parquet")
      QueryUtil.inTempDir("graft_ivf_asset") { tmp =>
        val asset = s"$tmp/ivf"
        val v = graft.ext.Ivf.freeze(s, emb, k = 8, iters = 3, asset)
        val centroids = graft.ext.Ivf.loadAsOf(s, asset, Some(v))
        val radii = graft.ext.Ivf.radiiFor(emb, dir, centroids)
        graft.ext.Ivf.topKExactCached(emb, dir, 11L, 20, centroids, radii,
          nProbe0 = 3)
      }
    },

    // Grouped top-k via the custom LogicalPlan/Strategy/SparkPlan
    // operator (bounded per-key heaps — no per-group sort). Same
    // semantics as q19's window formulation, same DuckDB oracle shape:
    // the physical plan differs, the rows must not.
    Q("q46_topk_custom_plan",
      EventsFact.withFactCte(
        """SELECT country, antigen, year, coverage_pct FROM (
          |  SELECT *, row_number() OVER
          |    (PARTITION BY country, antigen ORDER BY coverage_pct DESC, year) AS rn
          |  FROM fact)
          |WHERE rn <= 3 ORDER BY country, antigen, coverage_pct DESC, year""".stripMargin)) { (s, dir) =>
      import org.apache.spark.sql.Column
      graft.plans.TopKPerKey.topKPerKey(
          EventsFact.fact(s, dir), Seq("country", "antigen"),
          "coverage_pct", descending = true, k = 3, tiebreakCols = Seq("year"))
        .select("country", "antigen", "year", "coverage_pct")
        .orderBy(col("country"), col("antigen"), col("coverage_pct").desc, col("year"))
    },

    // Exact interpolated percentiles per group, via the DISTRIBUTED
    // rank election (graft.stats.ExactPercentiles — same linear
    // interpolation as Spark `percentile` and DuckDB `quantile_cont`,
    // bitwise; rounded at 4dp — inputs are 2dp prices). The built-in
    // `percentile` buffers every (value, count) of a group in the agg
    // buffer — a hot group at scale is an OOM; the rank election's
    // window spills.
    Q("q48_percentiles",
      """SELECT l_returnflag,
        |  round(quantile_cont(l_extendedprice, 0.5), 4) AS p50,
        |  round(quantile_cont(l_extendedprice, 0.9), 4) AS p90,
        |  round(quantile_cont(l_extendedprice, 0.99), 4) AS p99
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin) { (s, dir) =>
      graft.stats.ExactPercentiles.percentiles(
          s.read.parquet(s"$dir/lineitem.parquet"),
          "l_returnflag", "l_extendedprice",
          Seq("p50" -> 0.5, "p90" -> 0.9, "p99" -> 0.99))
        .select(col("l_returnflag"),
          round(col("p50"), 4).as("p50"),
          round(col("p90"), 4).as("p90"),
          round(col("p99"), 4).as("p99"))
        .orderBy("l_returnflag")
    },

    // Bivariate stats per group: corr/covariance between price and
    // discount. Exact decimal-accumulated co-moments (ExactMoments):
    // both inputs are 2-decimal-quantized money/ratio columns, so the
    // quantized moments ARE the true moments, order-independent and
    // bitwise-mirrored — no rounding bridge.
    Q("q54_corr_covar",
      s"""SELECT l_returnflag,
         |  ${graft.stats.ExactMoments.exactCorrSql("l_extendedprice", "l_discount")} AS price_disc_corr,
         |  ${graft.stats.ExactMoments.exactCovarSql("l_extendedprice", "l_discount")} AS price_disc_covar,
         |  ${graft.stats.ExactMoments.exactStddevSql("l_extendedprice")} AS price_sd
         |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin) { (s, dir) =>
      import graft.stats.ExactMoments
      s.read.parquet(s"$dir/lineitem.parquet")
        .groupBy("l_returnflag")
        .agg(
          ExactMoments.exactCorr(col("l_extendedprice"), col("l_discount")).as("price_disc_corr"),
          ExactMoments.exactCovar(col("l_extendedprice"), col("l_discount")).as("price_disc_covar"),
          ExactMoments.exactStddev(col("l_extendedprice")).as("price_sd"))
        .orderBy("l_returnflag")
    },

    // Ordered string aggregation (deterministic: sort the collected
    // set, then join — engine-portable without relying on either
    // engine's listagg ordering rules).
    Q("q55_string_agg",
      """SELECT n_regionkey AS regionkey,
        |  array_to_string(list_sort(list(DISTINCT n_name)), ',') AS nations
        |FROM nation GROUP BY 1 ORDER BY 1""".stripMargin) { (s, dir) =>
      s.read.parquet(s"$dir/nation.parquet")
        .groupBy(col("n_regionkey").as("regionkey"))
        .agg(array_join(array_sort(collect_set(col("n_name"))), ",").as("nations"))
        .orderBy("regionkey")
    },

    // Edit-distance similarity on a bounded pair slice: levenshtein is
    // native (codegen'd) in Spark and identically defined in DuckDB.
    // O(len^2) per pair — strictly a verification/short-string kernel;
    // the scale paths are the hash-based families (q30/q44).
    Q("q53_edit_distance",
      """SELECT a.doc_id AS a_id, b.doc_id AS b_id,
        |  levenshtein(substring(a.text, 1, 80), substring(b.text, 1, 80)) AS dist
        |FROM documents a JOIN documents b ON a.doc_id < b.doc_id
        |WHERE a.doc_id < 10 AND b.doc_id < 10
        |ORDER BY a_id, b_id""".stripMargin) { (s, dir) =>
      val docs = s.read.parquet(s"$dir/documents.parquet").filter(col("doc_id") < 10)
      val a = docs.select(col("doc_id").as("a_id"), substring(col("text"), 1, 80).as("a_t"))
      val b = docs.select(col("doc_id").as("b_id"), substring(col("text"), 1, 80).as("b_t"))
      a.crossJoin(b).filter(col("a_id") < col("b_id"))
        .select(col("a_id"), col("b_id"), levenshtein(col("a_t"), col("b_t")).as("dist"))
        .orderBy("a_id", "b_id")
    },

    // CUBE: all 2^n grouping combinations in one Expand+aggregate pass
    // (completes §2.5's multidimensional set next to q20's ROLLUP).
    Q("q52_cube",
      """SELECT coalesce(l_returnflag, 'ALL') AS returnflag,
        |       coalesce(l_linestatus, 'ALL') AS linestatus,
        |       count(*) AS n_rows,
        |       CAST(sum(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty
        |FROM lineitem
        |GROUP BY CUBE (l_returnflag, l_linestatus)
        |ORDER BY returnflag, linestatus""".stripMargin) { (s, dir) =>
      s.read.parquet(s"$dir/lineitem.parquet")
        .cube("l_returnflag", "l_linestatus")
        .agg(count(lit(1)).as("n_rows"),
          sum(col("l_quantity").cast("decimal(18,4)")).cast("double").as("sum_qty"))
        .select(
          coalesce(col("l_returnflag"), lit("ALL")).as("returnflag"),
          coalesce(col("l_linestatus"), lit("ALL")).as("linestatus"),
          col("n_rows"), col("sum_qty"))
        .orderBy("returnflag", "linestatus")
    },

    // Histogram: fixed-width bins via floor division (width_bucket has
    // no DuckDB twin; the arithmetic form is engine-portable and stays
    // in codegen). One partial-aggregated shuffle for any bin count.
    Q("q49_histogram",
      """SELECT CAST(floor(l_quantity / 10.0) AS INTEGER) AS bin,
        |  count(*) AS n,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty
        |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin) { (s, dir) =>
      s.read.parquet(s"$dir/lineitem.parquet")
        .groupBy(floor(col("l_quantity") / 10.0).cast("int").as("bin"))
        .agg(count(lit(1)).as("n"),
          sum(col("l_quantity").cast("decimal(18,4)")).cast("double").as("sum_qty"))
        .orderBy("bin")
    },
  )
}

object AdvancedOracles {

  /** DuckDB dot-product mirror (list_sum folds sequentially, matching
    * the DotProduct expression's accumulation order); shared with
    * CorpusOpsQueries' q94. */
  def dotSql(a: String, b: String): String =
    s"""list_sum(list_transform(generate_series(1, len($a)),
       |  i -> CAST(($a)[i] AS DOUBLE) * CAST(($b)[i] AS DOUBLE)))""".stripMargin

  val embeddingNearDup: String =
    s"""WITH e AS (SELECT vec_id, label, embedding FROM embeddings),
       |p AS (
       |  SELECT a.label AS block, a.vec_id AS a_id, b.vec_id AS b_id,
       |    ${dotSql("a.embedding", "b.embedding")} /
       |      (sqrt(${dotSql("a.embedding", "a.embedding")}) *
       |       sqrt(${dotSql("b.embedding", "b.embedding")})) AS sim
       |  FROM e a JOIN e b ON a.label = b.label AND a.vec_id < b.vec_id),
       |r AS (
       |  -- rank on the ROUNDED sim, mirroring the engine: duplicate
       |  -- vectors tie at 1.0 after rounding and the tie breaks by id,
       |  -- instead of hanging the winner on last-ulp float-sum noise
       |  SELECT block, a_id, b_id, round(sim, 6) AS sim,
       |    row_number() OVER (PARTITION BY block
       |      ORDER BY round(sim, 6) DESC, a_id, b_id) AS rn,
       |    count(*) OVER (PARTITION BY block) AS n_pairs
       |  FROM p)
       |SELECT block, a_id, b_id, sim, n_pairs
       |FROM r WHERE rn = 1 ORDER BY block""".stripMargin
}
