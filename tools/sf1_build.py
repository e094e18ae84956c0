#!/usr/bin/env python3
"""Build a deterministic sf1-scale dataset for the numerical-boundary
sweep (driver-side tooling only; not part of the engine).

NOTES.md records that FP-boundary defects were invisible at sf0.01 and
first bit at sf0.1 — this derives a 10x-larger input so the same class
of defect (summation order, percentile interpolation boundaries, t/df
denominators near n=1) gets one shot at surfacing before 100 TB does it
in production. No sf1 dir is driver-provided, so this REPLICATES the
driver's sf0.1 tables 10x with key columns remapped per replica
(+k * 10^12, consistent across every FK edge so joins stay exact).
Value/timestamp columns are copied verbatim. Both Spark and the DuckDB
oracle read the SAME derived files, so the compare is engine-vs-engine
on identical input — the derived data never feeds the driver's own
correctness gate.

Usage: python3 tools/sf1_build.py /root/testdata/sf0.1 /tmp/graft_sf1
"""
import os, sys
import duckdb

REPLICAS = 10
OFF = 10**12  # far above every key in sf0.1, far below int64 max

# key columns remapped per replica; every other column rides verbatim.
KEYS = {
    "region": [],
    "nation": [],
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}

def main(src, dst):
    os.makedirs(dst, exist_ok=True)
    con = duckdb.connect()
    for t, keys in KEYS.items():
        sp = f"{src}/{t}.parquet"
        dp = f"{dst}/{t}.parquet"
        if not os.path.exists(sp):
            print(f"skip {t}: no source"); continue
        cols = [r[0] for r in con.execute(
            f"DESCRIBE SELECT * FROM '{sp}'").fetchall()]
        if not keys:  # fixed dims (region/nation) don't scale in TPC-H either
            con.execute(f"COPY (SELECT * FROM '{sp}') TO '{dp}' (FORMAT PARQUET)")
        else:
            sel = ", ".join(
                f"{c} + k * {OFF} AS {c}" if c in keys else c for c in cols)
            con.execute(f"""
                COPY (SELECT {sel}
                      FROM '{sp}', (SELECT unnest(range({REPLICAS})) AS k)
                      ORDER BY k) TO '{dp}' (FORMAT PARQUET)""")
        n = con.execute(f"SELECT count(*) FROM '{dp}'").fetchone()[0]
        print(f"{t}: {n} rows -> {dp}")

if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
