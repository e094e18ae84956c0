#!/usr/bin/env python3
"""Full-surface variant of selfcheck.py for the sf1 sweep (driver-side
tooling only): same compare, plus a PER-ORACLE wall timeout and
incremental progress output. At sf1 a handful of relational oracle
REPLAYS are quadratic-ish for DuckDB (they exist to mirror the engine's
banded/blocked plans row-for-row at sf0.01, not to be efficient);
a timeout records ORACLE_TIMEOUT for those instead of stalling the
sweep — that is a cost statement about the replay SQL, not about the
engine result, which Verify already produced.

Usage: python3 tools/sf1_check.py <sf_dir> <verify_out> [timeout_sec]
"""
import json, sys, glob, os, threading, time
import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if df[c].dtype == object:
            try:
                df[c] = pd.to_numeric(df[c])
            except (ValueError, TypeError):
                df[c] = df[c].astype(str)
        if pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype("int64")
    df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    return df

def main(sf_dir, out_dir, timeout_sec):
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    # sf1-class mirrors override the row-for-row registry replays that
    # are plan-pathological in DuckDB at sf1 (sf1_mirrors.py documents
    # each; equivalence to the registry oracle is verified at
    # sf0.01 + sf0.1). The registry / driver gate is untouched.
    try:
        sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
        from sf1_mirrors import MIRRORS
        oracle.update({k: v for k, v in MIRRORS.items() if k in oracle})
    except ImportError:
        pass
    results = {}
    dirs = sorted(n for n in os.listdir(out_dir)
                  if os.path.isdir(os.path.join(out_dir, n)))
    for name in oracle:
        if name not in dirs:
            results[name] = "MISSING_RESULT"
    for name in dirs:
        t0 = time.time()
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        got = pd.concat([pd.read_parquet(f) for f in files]) if files else pd.DataFrame()
        if name not in oracle:
            results[name] = f"ROWS_ONLY rows={len(got)}"
            print(f"PASS {name}: {results[name]}", flush=True)
            continue
        # Per-query CURSOR + fired-flag (r16 ADVICE): interrupting the
        # shared connection raced the query finishing — a timer that
        # lost the cancel race could land its interrupt on the NEXT
        # oracle's execute, mislabeling a healthy query. The cursor is
        # discarded after each query, so a late interrupt dies with it;
        # the flag (not the message) decides whether THIS query timed
        # out.
        cur = con.cursor()
        fired = threading.Event()
        def kill(c=cur, f=fired):
            f.set()
            c.interrupt()
        timer = threading.Timer(timeout_sec, kill)
        timer.start()
        try:
            want = cur.execute(oracle[name]).fetchdf()
        except Exception as e:
            msg = str(e)
            results[name] = ("ORACLE_TIMEOUT"
                             if fired.is_set() or "INTERRUPT" in msg.upper()
                             else f"ORACLE_SQL_ERROR {msg}")
            print(f"{'SKIP' if results[name] == 'ORACLE_TIMEOUT' else 'FAIL'} "
                  f"{name}: {results[name]} ({time.time() - t0:.0f}s)", flush=True)
            continue
        finally:
            timer.cancel()
            cur.close()
        g, w = norm(got.copy()), norm(want.copy())
        if list(g.columns) != list(w.columns):
            results[name] = f"SCHEMA_MISMATCH spark={list(g.columns)} duck={list(w.columns)}"
        elif len(g) != len(w):
            results[name] = f"ROWCOUNT_MISMATCH spark={len(g)} duck={len(w)}"
        else:
            dt = [(c, str(g[c].dtype), str(w[c].dtype)) for c in g.columns
                  if str(g[c].dtype) != str(w[c].dtype)]
            if dt:
                results[name] = f"DTYPE_MISMATCH {dt}"
            else:
                try:
                    pd.testing.assert_frame_equal(
                        g, w, check_dtype=False, check_exact=False, rtol=0, atol=1e-9)
                    results[name] = f"OK rows={len(g)}"
                except AssertionError as e:
                    results[name] = "VALUE_MISMATCH " + str(e).split("\n")[0]
                    for c in g.columns:
                        try:
                            neq = ~((g[c] == w[c]) | (g[c].isna() & w[c].isna()))
                        except Exception:
                            neq = g[c].astype(str) != w[c].astype(str)
                        if neq.any():
                            i = neq.idxmax()
                            results[name] += f" | col={c} row={i} spark={g[c][i]!r} duck={w[c][i]!r}"
                            break
        ok = results[name].startswith(("OK", "ROWS_ONLY"))
        print(f"{'PASS' if ok else 'FAIL':4} {name}: {results[name]} "
              f"({time.time() - t0:.0f}s)", flush=True)
    ok = sum(1 for v in results.values() if v.startswith(("OK", "ROWS_ONLY")))
    to = sum(1 for v in results.values() if v == "ORACLE_TIMEOUT")
    print(f"== {ok}/{len(results)} pass, {to} oracle-timeout", flush=True)
    return 0 if ok + to == len(results) else 1

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2],
                  int(sys.argv[3]) if len(sys.argv) > 3 else 300))
