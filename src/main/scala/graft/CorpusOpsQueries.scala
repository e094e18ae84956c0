package graft

import org.apache.spark.sql.functions._
import graft.ext.{Curation, Dedup, Layout}

/** Round-6 corpus-operations tranche: weighted sampling, domain quota
  * balancing, cross-doc novelty, incremental (cross-snapshot) dedup,
  * and Z-order layout — the remaining ops a production training-data
  * pipeline runs between "corpus cleaned" and "corpus shipped".
  */
object CorpusOpsQueries {

  /** DuckDB mirror of the cross-side incremental-dedup lanes — same
    * split, digests, minhash lanes, bands, and verify kernel as
    * [[graft.ext.Dedup.incrementalDuplicates]] (the q30 oracle's
    * machinery, re-pointed at an existing/incoming split). */
  private def incrementalSql(minJaccard: Double): String = {
    val P = Dedup.MinhashP
    val lanes = Dedup.affineParams(16).zipWithIndex.map { case ((a, b), i) =>
      s"min(($a * base + $b) % $P) AS h$i"
    }.mkString(", ")
    val bandDefs = (0 until 4).map { b =>
      val parts = (0 until 4).map(r => s"h${b * 4 + r}::VARCHAR").mkString(" || '|' || ")
      s"md5($parts) AS band$b"
    }.mkString(", ")
    s"""WITH base AS (
       |  SELECT doc_id, text, FALSE AS inc FROM documents WHERE doc_id % 4 <> 3
       |  UNION ALL
       |  SELECT doc_id, text, TRUE FROM documents WHERE doc_id % 4 = 3
       |  UNION ALL
       |  SELECT doc_id + 100000, text, TRUE FROM documents WHERE doc_id % 16 = 0),
       |ex AS (
       |  SELECT i.doc_id, 'exact' AS kind, e.match_id
       |  FROM (SELECT doc_id, md5(text) AS h FROM base WHERE inc) i
       |  JOIN (SELECT md5(text) AS h, min(doc_id) AS match_id
       |        FROM base WHERE NOT inc GROUP BY 1) e USING (h)),
       |t AS (SELECT doc_id, inc, regexp_split_to_array(trim(text), '\\s+') AS rawtoks
       |      FROM base),
       |s AS (SELECT doc_id, inc, ${ExtensionOracles.shinglesOfPublic("rawtoks")} AS sh FROM t),
       |exg AS (SELECT doc_id, inc, unnest(sh) AS shingle FROM s),
       |bs AS (SELECT doc_id, inc,
       |         CAST(('0x' || substring(md5(shingle), 1, 15)) AS BIGINT) % $P AS base
       |       FROM exg),
       |sig AS (SELECT doc_id, inc, $lanes FROM bs GROUP BY doc_id, inc),
       |wb AS (SELECT doc_id, inc, $bandDefs FROM sig),
       |banded AS (SELECT doc_id, inc, unnest([band0, band1, band2, band3]) AS band
       |           FROM wb),
       |cand AS (
       |  SELECT DISTINCT i.doc_id AS i_id, e.doc_id AS e_id
       |  FROM banded i JOIN banded e ON i.band = e.band AND i.inc AND NOT e.inc),
       |tok AS (SELECT doc_id, list_distinct(regexp_split_to_array(trim(text), '\\s+')) AS toks
       |        FROM base),
       |near AS (
       |  SELECT i_id AS doc_id, 'near' AS kind, min(e_id) AS match_id
       |  FROM cand
       |  JOIN tok ti ON ti.doc_id = i_id
       |  JOIN tok te ON te.doc_id = e_id
       |  WHERE CAST(len(list_intersect(ti.toks, te.toks)) AS DOUBLE) /
       |        CAST(len(list_distinct(ti.toks || te.toks)) AS DOUBLE) >= $minJaccard
       |  GROUP BY i_id)
       |SELECT doc_id, kind, match_id FROM ex
       |UNION ALL
       |SELECT n.doc_id, n.kind, n.match_id FROM near n
       |WHERE NOT EXISTS (SELECT 1 FROM ex WHERE ex.doc_id = n.doc_id)
       |ORDER BY doc_id""".stripMargin
  }

  val all: Seq[Q] = Seq(

    // Sequential Poisson sample (Ohlsson): 40 docs, probability ~
    // proportional to n_chars. ξ = (md5-bucket/1e6)/w uses only
    // correctly-rounded IEEE divisions, so the oracle hash-matches the
    // UNROUNDED priorities, and the top-k runs as TakeOrderedAndProject
    // (per-partition k-heaps; no global sort).
    Q("q82_weighted_sample",
      s"""SELECT doc_id, n_chars,
         |  ${Curation.weightedSampleXiSql("doc_id", "n_chars")} AS xi
         |FROM documents
         |WHERE n_chars IS NOT NULL AND n_chars > 0
         |ORDER BY xi, doc_id LIMIT 40""".stripMargin) { (s, dir) =>
      Curation.weightedSample(
          s.read.parquet(s"$dir/documents.parquet"), "n_chars", k = 40)
        .select("doc_id", "n_chars", "xi")
        .orderBy("xi", "doc_id")
    },

    // Domain balancing: a 120-doc budget apportioned across sources by
    // largest remainder, each source filled with its quota of
    // smallest-md5 docs through the TopKPerKey plan (k = max quota
    // rows per key per partition cross the exchange; the corpus is
    // never globally sorted). Oracle checks the EXACT selected set.
    Q("q83_domain_quota",
      """WITH c AS (SELECT source, count(*) AS n FROM documents GROUP BY source),
        |tot AS (SELECT sum(n) AS total FROM c),
        |a AS (SELECT source, n,
        |        (120.0 * CAST(n AS DOUBLE)) / CAST(total AS DOUBLE) AS ideal
        |      FROM c CROSS JOIN tot),
        |b AS (SELECT source, CAST(floor(ideal) AS BIGINT) AS base,
        |        ideal - floor(ideal) AS rem FROM a),
        |l AS (SELECT 120 - sum(base) AS leftover FROM b),
        |r AS (SELECT source, base,
        |        row_number() OVER (ORDER BY rem DESC, source) AS rk FROM b),
        |q AS (SELECT source,
        |        base + CASE WHEN rk <= (SELECT leftover FROM l) THEN 1 ELSE 0 END
        |          AS quota
        |      FROM r),
        |h AS (SELECT doc_id, source, md5(CAST(doc_id AS VARCHAR)) AS hsh FROM documents),
        |rn AS (SELECT doc_id, source,
        |         row_number() OVER (PARTITION BY source ORDER BY hsh, doc_id) AS rn
        |       FROM h)
        |SELECT doc_id, source FROM rn JOIN q USING (source)
        |WHERE rn <= quota ORDER BY doc_id""".stripMargin) { (s, dir) =>
      Curation.quotaSample(
          s.read.parquet(s"$dir/documents.parquet"), "source", budget = 120)
        .select("doc_id", "source")
        .orderBy("doc_id")
    },

    // Cross-document novelty: share of each doc's distinct 8-grams
    // that exist nowhere else — catches pastiche documents assembled
    // from many sources, which whole-doc minhash misses. One gram
    // shuffle (window count) + one doc aggregate.
    Q("q84_novelty_score",
      s"""WITH t AS (
         |  SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS toks FROM documents),
         |g AS (SELECT doc_id,
         |        unnest(list_distinct(${ExtensionOracles.gramsSql("toks", 8)})) AS gram
         |      FROM t),
         |w AS (SELECT doc_id, count(*) OVER (PARTITION BY gram) AS gd FROM g)
         |SELECT doc_id, count(*) AS n_grams,
         |  CAST(sum(CASE WHEN gd = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_novel,
         |  CAST(CAST(sum(CASE WHEN gd = 1 THEN 1 ELSE 0 END) AS BIGINT) AS DOUBLE) /
         |    CAST(count(*) AS DOUBLE) AS novelty
         |FROM w GROUP BY doc_id ORDER BY doc_id""".stripMargin) { (s, dir) =>
      Dedup.crossDocNovelty(s.read.parquet(s"$dir/documents.parquet"), k = 8)
        .orderBy("doc_id")
    },

    // Incremental dedup: a derived "re-crawl" batch (fresh docs with
    // their own ids, plus byte-identical copies of existing docs under
    // new ids) deduplicated AGAINST the existing corpus — digest join
    // for exact, cross-side band join + Jaccard verify for near;
    // existing×existing is never paired.
    Q("q85_incremental_dedup", incrementalSql(minJaccard = 0.5)) { (s, dir) =>
      val docs = s.read.parquet(s"$dir/documents.parquet")
        .select("doc_id", "text")
      val existing = docs.filter(col("doc_id") % 4 =!= 3)
      val incoming = docs.filter(col("doc_id") % 4 === 3)
        .unionByName(docs.filter(col("doc_id") % 16 === 0)
          .select((col("doc_id") + 100000).as("doc_id"), col("text")))
      // the production mode the operator advertises: the existing
      // corpus's signatures come from the persisted serving cache
      // (per-doc signatures are independent, so the subset filter is
      // exact) — only the incoming batch is hashed fresh
      Dedup.incrementalDuplicates(existing, incoming, minJaccard = 0.5,
          existingSignatures =
            Some(Dedup.signaturesFor(s, dir).filter(col("id") % 4 =!= 3)))
        .orderBy("doc_id")
    },

    // Sub-document dedup (RefinedWeb/FineWeb-style): corpus-wide keep
    // only the FIRST occurrence of every distinct 3-token chunk, then
    // rebuild each doc from its surviving chunks — repeated
    // boilerplate paragraphs vanish even when no two docs are
    // whole-doc similar. One segment-window shuffle + one doc rebuild.
    Q("q87_segment_dedup",
      """WITH t AS (
        |  SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS toks FROM documents),
        |c AS (SELECT doc_id,
        |        list_transform(generate_series(0, CAST(ceil(len(toks)/3.0) AS BIGINT) - 1),
        |          i -> array_to_string(toks[i*3+1 : i*3+3], ' ')) AS chunks
        |      FROM t),
        |g AS (SELECT doc_id,
        |        unnest(generate_series(1, len(chunks))) - 1 AS pos,
        |        unnest(chunks) AS seg
        |      FROM c),
        |w AS (SELECT doc_id, pos, seg,
        |        row_number() OVER (PARTITION BY seg ORDER BY doc_id, pos) = 1 AS first
        |      FROM g)
        |SELECT doc_id,
        |  CAST(count(*) FILTER (first) AS BIGINT) AS n_kept,
        |  CAST(count(*) FILTER (NOT first) AS BIGINT) AS n_dropped,
        |  coalesce(array_to_string(list(seg ORDER BY pos) FILTER (first), ' '), '')
        |    AS cleaned
        |FROM w GROUP BY doc_id ORDER BY doc_id""".stripMargin) { (s, dir) =>
      import graft.ext.TextAnalysis
      val toks = TextAnalysis.tokens(col("text"))
      val nChunks = floor((size(toks) + lit(2)).cast("double") / lit(3.0)).cast("long")
      val chunks = when(size(toks) > 0,
        transform(sequence(lit(0L), nChunks - 1),
          i => concat_ws(" ", slice(toks, (i * 3 + 1).cast("int"), lit(3)))))
        .otherwise(array().cast("array<string>"))
      Dedup.dedupSegments(
          s.read.parquet(s"$dir/documents.parquet")
            .select(col("doc_id"), chunks.as("segments")),
          sep = " ")
        .orderBy("doc_id")
    },

    // Time-series densification (gap-fill): hourly event counts per
    // type, with every missing hour inside each type's [min, max] span
    // materialized as an explicit zero row — the resample step feeding
    // window/trend analyses that assume contiguous time. The dense
    // frame is #keys x span rows (proportional to the OUTPUT, not the
    // input); counts attach by left join, absent hours coalesce to 0.
    Q("q88_gap_fill",
      """WITH d AS (
        |  SELECT event_type, epoch_us(ts) // 3600000000 AS hour FROM events),
        |c AS (SELECT event_type, hour, count(*) AS n FROM d GROUP BY 1, 2),
        |s AS (SELECT event_type, min(hour) AS lo, max(hour) AS hi FROM c GROUP BY 1),
        |dense AS (SELECT event_type, unnest(generate_series(lo, hi)) AS hour FROM s)
        |SELECT dense.event_type, dense.hour, COALESCE(c.n, 0) AS n
        |FROM dense LEFT JOIN c USING (event_type, hour)
        |ORDER BY event_type, hour""".stripMargin) { (s, dir) =>
      val counts = graft.analysis.EventsFact.events(s, dir)
        .select(col("event_type"),
          expr("unix_micros(ts) div 3600000000").as("hour"))
        .groupBy("event_type", "hour")
        .agg(count(lit(1)).as("n"))
      val dense = counts
        .groupBy("event_type")
        .agg(min("hour").as("lo"), max("hour").as("hi"))
        .select(col("event_type"), explode(sequence(col("lo"), col("hi"))).as("hour"))
      dense
        .join(counts, Seq("event_type", "hour"), "left")
        .withColumn("n", coalesce(col("n"), lit(0L)))
        .orderBy("event_type", "hour")
    },

    // Z-order (Morton) curve index over (user bucket, value bucket) —
    // the layout key that makes ONE sort order prune on BOTH
    // dimensions via parquet min/max stats. Pure shift/mask integer
    // math inside whole-stage codegen; the oracle computes the
    // identical interleave.
    Q("q86_zorder_key", {
      val x = "((user_id % 1024) + 1024) % 1024"
      val y = "CAST(floor(\"value\") AS BIGINT) % 1024"
      s"""SELECT event_id, $x AS x, $y AS y,
         |  ${Layout.zValueSql(x, y)} AS z
         |FROM events ORDER BY event_id""".stripMargin
    }) { (s, dir) =>
      val x = pmod(col("user_id"), lit(1024L))
      val y = floor(col("value")) % lit(1024L)
      graft.analysis.EventsFact.events(s, dir)
        .select(col("event_id"), x.as("x"), y.as("y"),
          Layout.zValue(x, y).as("z"))
        .orderBy("event_id")
    },
  )
}
