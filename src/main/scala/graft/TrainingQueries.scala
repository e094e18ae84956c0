package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.ext.{Boilerplate, Curation, Packing, Similarity}

/** Round-3 training-pipeline breadth: corpus boilerplate scrubbing,
  * sequence packing, deterministic splits/interleave, sign-bucket
  * embedding dedup — plus engine breadth the earlier batches lacked
  * (GROUPING SETS, RANGE-frame windows, ntile/percent_rank/cume_dist,
  * higher-order array functions vs DuckDB's list_* lanes).
  */
object TrainingQueries {

  /** DuckDB mirror of q78's count–min estimate with the md5-affine
    * lane family: one md5-prefix base per token (mod P), per-depth
    * affine buckets `((a_d·base + b_d) % P) % width`, the full counter
    * matrix as a (d, bucket) GROUP BY, and the estimate as the
    * min-over-lanes of each candidate's counters — the same long
    * arithmetic CountMin.md5Lane / estimateMd5 evaluate. */
  private def cmsHeavyHittersSql(depth: Int, width: Int): String = {
    val P = graft.ext.Dedup.MinhashP
    val laneRows = (0 until depth).map { d =>
      val (a, b) = graft.ext.CountMin.laneParams(d)
      s"($d, $a, $b)"
    }.mkString(", ")
    s"""WITH t AS (
       |  SELECT regexp_split_to_array(trim(text), '\\s+') AS toks FROM documents),
       |e AS (SELECT unnest(toks) AS token FROM t),
       |lanes (d, la, lb) AS (SELECT * FROM (VALUES $laneRows)),
       |b AS (SELECT token,
       |        CAST(('0x' || substring(md5(token), 1, 15)) AS BIGINT) % $P AS base
       |      FROM e),
       |hashed AS (
       |  SELECT token, d, ((la * base + lb) % $P) % $width AS bucket
       |  FROM b, lanes),
       |counters AS (SELECT d, bucket, count(*) AS cnt FROM hashed GROUP BY d, bucket),
       |top AS (
       |  SELECT token, count(*) AS exact_cnt FROM e GROUP BY token
       |  ORDER BY exact_cnt DESC, token LIMIT 10),
       |topl AS (
       |  SELECT t.token, t.exact_cnt, l.d,
       |    ((l.la * (CAST(('0x' || substring(md5(t.token), 1, 15)) AS BIGINT) % $P) + l.lb)
       |      % $P) % $width AS bucket
       |  FROM top t, lanes l)
       |SELECT tl.token, tl.exact_cnt, min(c.cnt) AS cms_est
       |FROM topl tl JOIN counters c ON c.d = tl.d AND c.bucket = tl.bucket
       |GROUP BY tl.token, tl.exact_cnt
       |ORDER BY tl.exact_cnt DESC, tl.token""".stripMargin
  }

  /** DuckDB mirror of q81's full salted-degraded-mode pipeline over the
    * degenerate corpus: md5-affine minhash signatures and band keys
    * (the q30 mirror machinery), per-band bucket sizing with
    * maxBucket = 16, star edges (bucket-min to every member), md5-salted
    * sub-bucket exhaustive pairs (Dedup.saltOf's exact md5-prefix %
    * nSub split), distinct candidates, token-Jaccard >= 0.9 verify,
    * per-doc partner counts. Mirrorable END TO END because both the
    * lane hashes and the salt are md5-based. */
  private def saltedNearDupPartnersSql(maxBucket: Int): String = {
    val P = graft.ext.Dedup.MinhashP
    val lanes = graft.ext.Dedup.affineParams(16).zipWithIndex.map { case ((a, b), i) =>
      s"min(($a * base + $b) % $P) AS h$i"
    }.mkString(", ")
    val bandDefs = (0 until 4).map { b =>
      val parts = (0 until 4).map(r => s"h${b * 4 + r}::VARCHAR").mkString(" || '|' || ")
      s"md5($parts) AS band$b"
    }.mkString(", ")
    val grams = ExtensionOracles.gramsSql("rawtoks", 3)
    s"""WITH t AS (
       |  SELECT doc_id, lang || ' ' || lang || ' ' || lang AS text FROM documents),
       |tokens AS (SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS rawtoks FROM t),
       |s AS (SELECT doc_id, $grams AS sh FROM tokens),
       |ex AS (SELECT doc_id, unnest(sh) AS shingle FROM s),
       |bs AS (SELECT doc_id,
       |         CAST(('0x' || substring(md5(shingle), 1, 15)) AS BIGINT) % $P AS base
       |       FROM ex),
       |sig AS (SELECT doc_id, $lanes FROM bs GROUP BY doc_id),
       |withbands AS (SELECT doc_id, $bandDefs FROM sig),
       |banded AS (
       |  SELECT doc_id, unnest([band0, band1, band2, band3]) AS band FROM withbands),
       |stats AS (
       |  SELECT doc_id, band,
       |    count(*) OVER (PARTITION BY band) AS bucket_n,
       |    min(doc_id) OVER (PARTITION BY band) AS bucket_min
       |  FROM banded),
       |smallb AS (SELECT * FROM stats WHERE bucket_n BETWEEN 2 AND $maxBucket),
       |small AS (
       |  SELECT a.doc_id AS a_id, b.doc_id AS b_id
       |  FROM smallb a JOIN smallb b ON a.band = b.band AND a.doc_id < b.doc_id),
       |star AS (
       |  SELECT bucket_min AS a_id, doc_id AS b_id
       |  FROM stats WHERE bucket_n > $maxBucket AND doc_id <> bucket_min),
       |saltassign AS (
       |  SELECT doc_id, band,
       |    CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT)
       |      % ((bucket_n + ${maxBucket - 1}) // $maxBucket) AS salt
       |  FROM stats WHERE bucket_n > $maxBucket),
       |salted AS (
       |  SELECT a.doc_id AS a_id, b.doc_id AS b_id
       |  FROM saltassign a JOIN saltassign b
       |    ON a.band = b.band AND a.salt = b.salt AND a.doc_id < b.doc_id),
       |cand AS (
       |  SELECT DISTINCT a_id, b_id FROM (
       |    SELECT * FROM small UNION ALL SELECT * FROM star
       |    UNION ALL SELECT * FROM salted)),
       |dtok AS (
       |  SELECT doc_id, list_distinct(regexp_split_to_array(trim(text), '\\s+')) AS toks
       |  FROM t),
       |ver AS (
       |  SELECT a_id, b_id FROM cand
       |  JOIN dtok ta ON ta.doc_id = a_id
       |  JOIN dtok tb ON tb.doc_id = b_id
       |  WHERE CAST(len(list_intersect(ta.toks, tb.toks)) AS DOUBLE) /
       |        CAST(len(list_distinct(ta.toks || tb.toks)) AS DOUBLE) >= 0.9)
       |SELECT a_id, count(*) AS n_partners FROM ver GROUP BY a_id ORDER BY a_id""".stripMargin
  }

  val all: Seq[Q] = Seq(

    // C4-style boilerplate removal at token-span granularity: any word
    // 5-gram appearing in ≥2 docs is boilerplate; covered tokens are
    // removed and the doc reassembled. The oracle rebuilds the exact
    // cleaned STRING, so reassembly order is verified, not just counts.
    Q("q69_boilerplate_scrub",
      """WITH t AS (SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS toks FROM documents),
        |pos AS (SELECT doc_id, unnest(range(1, len(toks)+1)) AS pos, toks FROM t),
        |tok AS (SELECT doc_id, pos, toks[pos] AS token FROM pos),
        |grams AS (SELECT doc_id, pos AS start, array_to_string(toks[pos:pos+4], ' ') AS gram
        |          FROM pos WHERE pos + 4 <= len(toks)),
        |bp AS (SELECT gram FROM grams GROUP BY gram HAVING count(DISTINCT doc_id) >= 2),
        |hits AS (SELECT DISTINCT g.doc_id, g.start FROM grams g JOIN bp USING (gram)),
        |removed AS (SELECT DISTINCT k.doc_id, k.pos FROM tok k
        |            JOIN hits h ON k.doc_id = h.doc_id AND k.pos BETWEEN h.start AND h.start + 4),
        |kept AS (SELECT k.doc_id, k.pos, k.token FROM tok k
        |         WHERE NOT EXISTS (SELECT 1 FROM removed r
        |                           WHERE r.doc_id = k.doc_id AND r.pos = k.pos))
        |SELECT t.doc_id,
        |  CAST(len(t.toks) AS BIGINT) AS n_tokens,
        |  COALESCE(cnt.n_kept, 0) AS n_kept,
        |  COALESCE(cnt.cleaned, '') AS cleaned
        |FROM t LEFT JOIN (
        |  SELECT doc_id, count(*) AS n_kept, string_agg(token, ' ' ORDER BY pos) AS cleaned
        |  FROM kept GROUP BY doc_id) cnt USING (doc_id)
        |ORDER BY t.doc_id""".stripMargin) { (s, dir) =>
      Boilerplate.removeBoilerplateSpans(
          s.read.parquet(s"$dir/documents.parquet"), k = 5, minDocs = 2)
        .orderBy("doc_id")
    },

    // Greedy sequence packing: consecutive docs per deterministic shard
    // packed into 512-token sequences — a stateful per-shard scan
    // (flatMapSortedGroups), NOT a window cumsum (greedy resets the
    // accumulator). Oracle = recursive CTE replaying the same fold.
    Q("q70_sequence_packing",
      """WITH RECURSIVE t AS (
        |  SELECT doc_id, doc_id % 8 AS shard,
        |         len(regexp_split_to_array(trim(text), '\s+')) AS n
        |  FROM documents),
        |o AS (SELECT *, row_number() OVER (PARTITION BY shard ORDER BY doc_id) AS rn FROM t),
        |rec AS (
        |  SELECT shard, rn, doc_id, n, n AS acc, 0 AS seq FROM o WHERE rn = 1
        |  UNION ALL
        |  SELECT o.shard, o.rn, o.doc_id, o.n,
        |    CASE WHEN rec.acc + o.n > 512 THEN o.n ELSE rec.acc + o.n END,
        |    CASE WHEN rec.acc + o.n > 512 THEN rec.seq + 1 ELSE rec.seq END
        |  FROM rec JOIN o ON o.shard = rec.shard AND o.rn = rec.rn + 1)
        |SELECT doc_id, CAST(shard AS BIGINT) AS shard, CAST(seq AS BIGINT) AS seq,
        |  CAST(n AS INTEGER) AS n_tokens
        |FROM rec ORDER BY doc_id""".stripMargin) { (s, dir) =>
      Packing.packSequences(s, s.read.parquet(s"$dir/documents.parquet"),
          budget = 512, numShards = 8)
        .toDF()
        .select("doc_id", "shard", "seq", "n_tokens")
        .orderBy("doc_id")
    },

    // Deterministic corpus shuffle + source interleave: per-source
    // hash-rank, then round-robin across sources. Reproducible across
    // engines/cluster sizes (hash order, no RNG). The global position
    // here is a single-partition window — fine for a bounded head; at
    // 100 TB assign positions per-partition (zipWithIndex-style offset
    // sums), which preserves the same (rn, source) total order.
    Q("q71_interleave_shuffle",
      """WITH r AS (
        |  SELECT doc_id, source,
        |    row_number() OVER (PARTITION BY source
        |                       ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rn
        |  FROM documents)
        |SELECT row_number() OVER (ORDER BY rn, source, doc_id) AS position, doc_id, source
        |FROM r ORDER BY position""".stripMargin) { (s, dir) =>
      val perSource = Window.partitionBy("source")
        .orderBy(graft.ext.Curation.md5Hex(col("doc_id")), col("doc_id"))
      val global = Window.orderBy("rn", "source", "doc_id")
      s.read.parquet(s"$dir/documents.parquet")
        .select(col("doc_id"), col("source"))
        .withColumn("rn", row_number().over(perSource))
        .withColumn("position", row_number().over(global).cast("long"))
        .select("position", "doc_id", "source")
        .orderBy("position")
    },

    // Higher-order array functions over embeddings vs DuckDB's list_*
    // lane: filter/transform/aggregate stay codegen'd and exact
    // (integer-quantized sum; float comparisons on identical values).
    Q("q72_array_functions",
      """SELECT vec_id,
        |  CAST(len(embedding) AS INTEGER) AS dim,
        |  CAST(len(list_filter(embedding, x -> x > 0)) AS INTEGER) AS n_pos,
        |  CAST(list_sum(list_transform(embedding,
        |    x -> CAST(floor(abs(CAST(x AS DOUBLE)) * 1000000.0) AS BIGINT))) AS BIGINT) AS l1_q,
        |  CAST(list_position(embedding, list_max(embedding)) AS INTEGER) AS amax_idx
        |FROM embeddings ORDER BY vec_id""".stripMargin) { (s, dir) =>
      s.read.parquet(s"$dir/embeddings.parquet")
        .select(col("vec_id"),
          size(col("embedding")).as("dim"),
          size(filter(col("embedding"), x => x > 0)).as("n_pos"),
          aggregate(col("embedding"), lit(0L),
            (acc, x) => acc + floor(abs(x.cast("double")) * 1000000.0).cast("long"))
            .as("l1_q"),
          array_position(col("embedding"), array_max(col("embedding")))
            .cast("int").as("amax_idx"))
        .orderBy("vec_id")
    },

    // GROUPING SETS (beyond q20's ROLLUP / q52's CUBE): explicit set
    // list with grouping() disambiguation — SQL surface via spark.sql.
    Q("q73_grouping_sets",
      """SELECT
        |  COALESCE(o_orderstatus, '<all>') AS status,
        |  COALESCE(o_orderpriority, '<all>') AS priority,
        |  CAST(GROUPING(o_orderstatus) * 2 + GROUPING(o_orderpriority) AS INTEGER) AS gid,
        |  count(*) AS n,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
        |FROM orders
        |GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority), (o_orderstatus), ())
        |ORDER BY gid, status, priority""".stripMargin) { (s, dir) =>
      s.read.parquet(s"$dir/orders.parquet").createOrReplaceTempView("orders_q73")
      s.sql(
        """SELECT
          |  COALESCE(o_orderstatus, '<all>') AS status,
          |  COALESCE(o_orderpriority, '<all>') AS priority,
          |  CAST(grouping(o_orderstatus) * 2 + grouping(o_orderpriority) AS INT) AS gid,
          |  count(*) AS n,
          |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
          |FROM orders_q73
          |GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority), (o_orderstatus), ())
          |ORDER BY gid, status, priority""".stripMargin)
    },

    // RANGE-frame window: per-customer trailing-30-day order count and
    // revenue — a range frame over an integer day key (event-time
    // rolling aggregates without a self-join). Decimal sum ⇒ exact.
    Q("q74_rolling_window",
      """WITH o AS (SELECT o_orderkey, o_custkey, CAST(o_orderdate AS DATE) AS d,
        |                  CAST(o_totalprice AS DECIMAL(18,2)) AS price FROM orders),
        |k AS (SELECT *, date_diff('day', DATE '1992-01-01', d) AS dk FROM o)
        |SELECT o_orderkey, o_custkey,
        |  count(*) OVER w AS n_30d,
        |  CAST(sum(price) OVER w AS DOUBLE) AS sum_30d
        |FROM k
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY dk
        |             RANGE BETWEEN 30 PRECEDING AND CURRENT ROW)
        |ORDER BY o_orderkey""".stripMargin) { (s, dir) =>
      val w = Window.partitionBy("o_custkey").orderBy("dk").rangeBetween(-30, 0)
      s.read.parquet(s"$dir/orders.parquet")
        .select(col("o_orderkey"), col("o_custkey"),
          datediff(to_date(col("o_orderdate")), lit("1992-01-01").cast("date")).as("dk"),
          col("o_totalprice").cast("decimal(18,2)").as("price"))
        .select(col("o_orderkey"), col("o_custkey"),
          count(lit(1)).over(w).as("n_30d"),
          sum(col("price")).over(w).cast("double").as("sum_30d"))
        .orderBy("o_orderkey")
    },

    // Distribution ranking functions: ntile / percent_rank / cume_dist
    // per nation over a total (tie-broken) order — both engines compute
    // the same integer-ratio doubles.
    Q("q75_rank_distributions",
      """SELECT s_suppkey, s_nationkey,
        |  CAST(ntile(4) OVER w AS INTEGER) AS quartile,
        |  percent_rank() OVER w AS pr,
        |  cume_dist() OVER w AS cd
        |FROM supplier
        |WINDOW w AS (PARTITION BY s_nationkey ORDER BY s_acctbal, s_suppkey)
        |ORDER BY s_suppkey""".stripMargin) { (s, dir) =>
      val w = Window.partitionBy("s_nationkey").orderBy("s_acctbal", "s_suppkey")
      s.read.parquet(s"$dir/supplier.parquet")
        .select(col("s_suppkey"), col("s_nationkey"),
          ntile(4).over(w).as("quartile"),
          percent_rank().over(w).as("pr"),
          cume_dist().over(w).as("cd"))
        .orderBy("s_suppkey")
    },

    // Coarse embedding dedup by natural-basis sign signature (the
    // exactly-mirrorable lane of embedding bucketing — no pseudo-random
    // planes to replicate).
    Q("q76_sign_bucket_dedup",
      """WITH s AS (
        |  SELECT vec_id,
        |    CAST(list_sum(list_transform(range(1, 9),
        |      i -> CASE WHEN embedding[i] > 0 THEN 1 << (i - 1) ELSE 0 END)) AS BIGINT) AS sig
        |  FROM embeddings)
        |SELECT sig, count(*) AS n_vecs, min(vec_id) AS canonical
        |FROM s GROUP BY sig ORDER BY sig""".stripMargin) { (s, dir) =>
      Similarity.signBucketDedup(
          s.read.parquet(s"$dir/embeddings.parquet"), bits = 8)
        .orderBy("sig")
    },

    // Count–min heavy hitters: sketch pass (constant memory, no token
    // shuffle) + exact verification of the candidates. Oracle-exact:
    // the md5-affine lane family (CountMin.md5Lane) makes every
    // counter — and therefore every estimate — reproducible in SQL;
    // the mirror rebuilds the full depth×width counter matrix and
    // takes the same min-over-lanes. The murmur3 default stays the
    // production path, bounds proven in CountMinSpec.
    Q("q78_heavy_hitters", cmsHeavyHittersSql(
        graft.ext.CountMin.DefaultDepth, graft.ext.CountMin.DefaultWidth)) { (s, dir) =>
      import s.implicits._
      import graft.ext.{CountMin, TextAnalysis}
      val toks = s.read.parquet(s"$dir/documents.parquet")
        .select(explode(TextAnalysis.tokens(col("text"))).as("token"))
      val cms = toks.as[String].select(CountMin.sketch(md5Lanes = true)).head().counters
      // exact top-10 (bounded collect — the L3 head contract)
      val top = toks.groupBy("token").agg(count(lit(1)).as("exact_cnt"))
        .orderBy(col("exact_cnt").desc, col("token")).limit(10).collect()
      top.map { r =>
        val t = r.getString(0)
        (t, r.getLong(1),
          CountMin.estimateMd5(cms, t, CountMin.DefaultDepth, CountMin.DefaultWidth))
      }.toSeq.toDF("token", "exact_cnt", "cms_est")
        .orderBy(col("exact_cnt").desc, col("token"))
    },

    // Bloom-accelerated decontamination: identical RESULT to q57 (the
    // sketch only prunes; survivors verify exactly), so the exact SQL
    // oracle carries over — sketch-then-verify with zero correctness
    // cost, which is the point.
    Q("q79_bloom_decontamination",
      s"""WITH t AS (
         |  SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS toks FROM documents),
         |g AS (SELECT doc_id, unnest(${ExtensionOracles.gramsSql("toks", 8)}) AS gram FROM t),
         |eg AS (SELECT DISTINCT gram FROM g WHERE doc_id % 7 = 0),
         |tg AS (SELECT doc_id, gram FROM g WHERE doc_id % 7 <> 0)
         |SELECT doc_id, count(DISTINCT gram) AS n_hits
         |FROM tg JOIN eg USING (gram)
         |GROUP BY doc_id ORDER BY doc_id""".stripMargin) { (s, dir) =>
      val docs = s.read.parquet(s"$dir/documents.parquet")
      Curation.contaminatedBloom(
          train = docs.filter(col("doc_id") % 7 =!= 0),
          eval = docs.filter(col("doc_id") % 7 === 0),
          k = 8)
        .orderBy("doc_id")
    },

    // Deterministic train/val/test split (80/10/10): contiguous bands
    // of the md5-mod-1e6 key — the oracle checks the EXACT assignment.
    Q("q77_split_assignment",
      """SELECT doc_id, lang,
        |  CASE WHEN h < 800000 THEN 'train' WHEN h < 900000 THEN 'val' ELSE 'test' END AS split
        |FROM (SELECT doc_id, lang,
        |        ('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT % 1000000 AS h
        |      FROM documents)
        |ORDER BY doc_id""".stripMargin) { (s, dir) =>
      Curation.assignSplits(s.read.parquet(s"$dir/documents.parquet"))
        .select("doc_id", "lang", "split")
        .orderBy("doc_id")
    },

    // The exact half of the heavy-hitter pass as its own hard oracle
    // row: global token top-10 through TakeOrderedAndProject (only 10
    // rows ever leave the final agg). q78 oracles the sketch estimates;
    // this pins the exact lane alone to DuckDB.
    Q("q80_heavy_hitters_exact",
      """WITH t AS (
        |  SELECT regexp_split_to_array(trim(text), '\s+') AS toks FROM documents),
        |e AS (SELECT unnest(toks) AS token FROM t)
        |SELECT token, count(*) AS exact_cnt FROM e GROUP BY token
        |ORDER BY exact_cnt DESC, token LIMIT 10""".stripMargin) { (s, dir) =>
      import graft.ext.TextAnalysis
      s.read.parquet(s"$dir/documents.parquet")
        .select(explode(TextAnalysis.tokens(col("text"))).as("token"))
        .groupBy("token").agg(count(lit(1)).as("exact_cnt"))
        .orderBy(col("exact_cnt").desc, col("token"))
        .limit(10)
    },

    // Salted sub-bucket pairing end-to-end: collapse every doc's text
    // to its language token (a degenerate corpus DERIVED from the real
    // table — all docs of a language share one minhash signature, so
    // each band bucket holds the whole language, far over maxBucket).
    // With `saltOversized = true` the oversized buckets emit exhaustive
    // pairs within each deterministic sub-bucket plus the star edges —
    // so (unlike star-only mode) most docs appear as a_id with several
    // partners. Oracle-exact end to end: the lane hashes AND the
    // sub-bucket salt are md5-based (Dedup.saltOf), so the SQL mirror
    // reproduces the exact salted split, star edges, Jaccard verify
    // and partner counts; DedupSpec additionally proves salted ⊇ star.
    Q("q81_salted_neardup", saltedNearDupPartnersSql(maxBucket = 16)) { (s, dir) =>
      import graft.ext.Dedup
      val degenerate = s.read.parquet(s"$dir/documents.parquet")
        .select(col("doc_id"),
          concat_ws(" ", col("lang"), col("lang"), col("lang")).as("text"))
      Dedup.nearDuplicatePairs(degenerate, "doc_id", "text",
          k = 3, numHashes = 16, bands = 4, minJaccard = 0.9,
          maxBucket = 16, saltOversized = true)
        .groupBy("a_id").agg(count(lit(1)).as("n_partners"))
        .orderBy("a_id")
    },
  )
}
