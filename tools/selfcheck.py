#!/usr/bin/env python3
"""Local mimic of the driver's correctness gate (driver-side tooling only;
not part of the engine). Reads the parquet results Verify wrote, runs each
oracle SQL in DuckDB against the same sf dir, and diffs.

Usage: python3 tools/selfcheck.py /root/testdata/sf0.01 /tmp/verify_out
"""
import json, sys, glob, os
import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # normalize dtypes a bit: decimals -> float, categorials -> str
    for c in df.columns:
        if df[c].dtype == object:
            try:
                df[c] = pd.to_numeric(df[c])
            except (ValueError, TypeError):
                df[c] = df[c].astype(str)
        if pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype("int64")  # width is hash-neutral; int-vs-float is not
    df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    return df

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    results = {}
    dirs = {n for n in os.listdir(out_dir) if os.path.isdir(os.path.join(out_dir, n))}
    for name in oracle:
        if name not in dirs:
            results[name] = "MISSING_RESULT (query failed in Verify?)"
    for name in sorted(os.listdir(out_dir)):
        d = os.path.join(out_dir, name)
        if not os.path.isdir(d):
            continue
        files = glob.glob(f"{d}/*.parquet")
        got = pd.concat([pd.read_parquet(f) for f in files]) if files else pd.DataFrame()
        if name not in oracle:
            results[name] = f"ROWS_ONLY rows={len(got)}"
            continue
        try:
            want = con.execute(oracle[name]).fetchdf()
        except Exception as e:
            results[name] = f"ORACLE_SQL_ERROR {e}"
            continue
        g, w = norm(got.copy()), norm(want.copy())
        if list(g.columns) != list(w.columns):
            results[name] = f"SCHEMA_MISMATCH spark={list(g.columns)} duck={list(w.columns)}"
            continue
        if len(g) != len(w):
            results[name] = f"ROWCOUNT_MISMATCH spark={len(g)} duck={len(w)}"
            continue
        # the driver hashes raw value bytes, so a dtype divergence
        # (e.g. DuckDB widening sum(INT) to HUGEINT -> object/float)
        # fails there even when values agree — catch it here too
        dt = [(c, str(g[c].dtype), str(w[c].dtype)) for c in g.columns
              if str(g[c].dtype) != str(w[c].dtype)]
        if dt:
            results[name] = f"DTYPE_MISMATCH {dt}"
            continue
        try:
            pd.testing.assert_frame_equal(g, w, check_dtype=False, check_exact=False, rtol=0, atol=1e-9)
            results[name] = f"OK rows={len(g)}"
        except AssertionError as e:
            results[name] = "VALUE_MISMATCH " + str(e).split("\n")[0]
            # show first diff
            for c in g.columns:
                try:
                    neq = ~((g[c] == w[c]) | (g[c].isna() & w[c].isna()))
                except Exception:
                    neq = g[c].astype(str) != w[c].astype(str)
                if neq.any():
                    i = neq.idxmax()
                    results[name] += f" | col={c} row={i} spark={g[c][i]!r} duck={w[c][i]!r}"
                    break
    ok = sum(1 for v in results.values() if v.startswith(("OK", "ROWS_ONLY")))
    for k, v in sorted(results.items()):
        print(f"{'PASS' if v.startswith(('OK','ROWS_ONLY')) else 'FAIL':4} {k}: {v}")
    print(f"== {ok}/{len(results)} pass")
    return 0 if ok == len(results) else 1

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
