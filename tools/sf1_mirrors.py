#!/usr/bin/env python3
"""sf1-class oracle mirrors (driver-side tooling only) — r17, closing
the sf1 sweep's three ORACLE_TIMEOUT skips (SF1SWEEP.md).

The registry oracles for these lanes were written to mirror the
engine's plans row-for-row at sf0.01, not to be efficient; at sf1 the
DuckDB replays blow up for reasons that are PLAN pathologies, not data
size (the q124 graph at sf1 holds 38.5k edges and 690 wedges — the
staged computation takes under a second):

- q124_triangles: with the CTEs inlined, DuckDB re-plans the 6M-row
  lineitem self-join per reference and loses the u-equality hash join
  under the tuple compare — the 79 GB spill of SF1SWEEP.md. The mirror
  is the SAME degree-oriented wedge join with `AS MATERIALIZED` CTE
  hints (each stage computed once) and the tuple compare expanded to
  scalar comparisons. 0.9 s at sf1.

- q70_sequence_packing / q96_packing_offsets: the row-by-row recursive
  CTE (one JOIN per ROW of the shard, depth 6250 at sf1) becomes a
  window-free prefix-sum formulation — greedy packing boundaries are
  jumps on the per-shard running token sum (next boundary = greatest
  prefix ≤ current prefix + budget, one ASOF join for ALL starts), so
  the recursion walks SEQUENCES (~170 per shard), not rows, and row
  assignment is a second ASOF join. Offsets fall out of the prefix
  sums: offset(i) = S(i-1) - S(start-1). ~1.5 s at sf1.

Equivalence to the registry oracles is verified at sf0.01 AND sf0.1
(bit-identical frames — see SF1SWEEP.md); the registry itself is
untouched, so the driver's own gate keeps the row-for-row replays.

Used by sf1_check.py: mirrors override oracle_sql.json entries when
present.
"""

MIRRORS = {
    "q124_triangles": """WITH e AS MATERIALIZED (
  SELECT a.l_partkey AS p1, b.l_partkey AS p2
  FROM lineitem a JOIN lineitem b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
  GROUP BY 1, 2 HAVING count(*) >= 2),
deg AS MATERIALIZED (SELECT node, count(*) AS d FROM (
    SELECT p1 AS node FROM e UNION ALL SELECT p2 FROM e) GROUP BY 1),
o AS MATERIALIZED (SELECT
    CASE WHEN (d1.d, e.p1) < (d2.d, e.p2) THEN e.p1 ELSE e.p2 END AS u,
    CASE WHEN (d1.d, e.p1) < (d2.d, e.p2) THEN e.p2 ELSE e.p1 END AS v,
    CASE WHEN (d1.d, e.p1) < (d2.d, e.p2) THEN d2.d ELSE d1.d END AS dv
  FROM e JOIN deg d1 ON e.p1 = d1.node JOIN deg d2 ON e.p2 = d2.node),
tri AS (SELECT x.u AS a, x.v AS b, y.v AS c
  FROM o x JOIN o y ON x.u = y.u AND (x.dv < y.dv OR (x.dv = y.dv AND x.v < y.v))
  JOIN o z ON z.u = x.v AND z.v = y.v),
n AS (SELECT node, count(*) AS n_triangles FROM (
    SELECT a AS node FROM tri
    UNION ALL SELECT b FROM tri
    UNION ALL SELECT c FROM tri) GROUP BY 1)
SELECT node AS part_key, CAST(n_triangles AS BIGINT) AS n_triangles
FROM n ORDER BY n_triangles DESC, part_key LIMIT 20""",
}

_PACKING = r"""WITH RECURSIVE t AS MATERIALIZED (
  SELECT doc_id, doc_id % 8 AS shard,
         len(regexp_split_to_array(trim(text), '\s+')) AS n
  FROM documents),
o AS MATERIALIZED (
  SELECT *, row_number() OVER (PARTITION BY shard ORDER BY doc_id) AS rn,
         sum(n) OVER (PARTITION BY shard ORDER BY doc_id
                      ROWS UNBOUNDED PRECEDING) AS s
  FROM t),
-- jump table: were a sequence to START at row a, it would end at the
-- greatest rn whose running sum fits start-prefix + budget (ASOF =
-- one log-time probe per start). LEFT + greatest() covers the
-- oversized-singleton case (an element > budget packs alone).
j AS MATERIALIZED (
  SELECT a.shard, a.rn AS start_rn, a.s - a.n AS start_acc0,
         greatest(a.rn, coalesce(b.rn, a.rn)) AS end_rn
  FROM o a ASOF LEFT JOIN o b
    ON b.shard = a.shard AND b.s <= a.s - a.n + 512),
-- boundary walk: recursion over SEQUENCES (one row per shard per
-- level), never over rows
walk AS (
  SELECT shard, 0 AS seq, start_rn, start_acc0, end_rn FROM j WHERE start_rn = 1
  UNION ALL
  SELECT j.shard, walk.seq + 1, j.start_rn, j.start_acc0, j.end_rn
  FROM walk JOIN j ON j.shard = walk.shard AND j.start_rn = walk.end_rn + 1),
-- row assignment: the sequence whose start is the greatest ≤ rn
r AS (
  SELECT o.doc_id, o.shard, o.n, o.s, w.seq, w.start_acc0
  FROM o ASOF JOIN walk w ON w.shard = o.shard AND w.start_rn <= o.rn)
SELECT doc_id, CAST(shard AS BIGINT) AS shard, CAST(seq AS BIGINT) AS seq,
  {cols}
FROM r ORDER BY doc_id"""

MIRRORS["q96_packing_offsets"] = _PACKING.format(
    cols='CAST(s - n - start_acc0 AS INTEGER) AS "offset", '
         'CAST(n AS INTEGER) AS n_tokens')
MIRRORS["q70_sequence_packing"] = _PACKING.format(
    cols='CAST(n AS INTEGER) AS n_tokens')
