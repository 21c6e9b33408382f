#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: run after
`sbt "runMain graft.Verify <sfDir> <outDir>"`, this reads each query's
parquet output plus oracle_sql.json, executes the oracle SQL in DuckDB
against the same testdata parquet tables, sorts columns by name and rows
by value, and compares. Dev tool only — not part of the Spark library.
"""
import json, sys, glob, os, time
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def canon(df):
    df = df[sorted(df.columns)]
    df = df.sort_values(by=list(df.columns)).reset_index(drop=True)
    return df

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    results = {}
    for name in sorted(oracle):
        sql = oracle[name]
        t0 = time.time()
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark output"); n_fail += 1
            results[name] = {"pass": False, "why": "no spark output"}; continue
        try:
            mine = con.sql(f"SELECT * FROM '{out_dir}/{name}/*.parquet'").df()
            ref = con.sql(sql).df()
        except Exception as e:
            print(f"FAIL {name}: {e}"); n_fail += 1
            results[name] = {"pass": False, "why": str(e)[:200]}; continue
        mine, ref = canon(mine), canon(ref)
        if list(mine.columns) != list(ref.columns):
            print(f"FAIL {name}: columns {list(mine.columns)} vs {list(ref.columns)}")
            n_fail += 1
            results[name] = {"pass": False, "why": "column mismatch"}; continue
        if len(mine) != len(ref):
            print(f"FAIL {name}: rows {len(mine)} vs {len(ref)}"); n_fail += 1
            results[name] = {"pass": False, "why": f"rows {len(mine)} vs {len(ref)}"}; continue
        if not mine.equals(ref):
            neq = (mine != ref) & ~(mine.isna() & ref.isna())
            bad_cols = [c for c in mine.columns if neq[c].any()]
            print(f"FAIL {name}: value mismatch in {bad_cols}")
            for c in bad_cols[:3]:
                idx = neq[c].idxmax()
                print(f"  {c}[{idx}]: mine={mine[c][idx]!r} ref={ref[c][idx]!r}")
            n_fail += 1
            results[name] = {"pass": False, "why": f"value mismatch in {bad_cols}"}; continue
        # dtype check (schema-level compare the driver may also do)
        dt_mine = [str(d) for d in mine.dtypes]
        dt_ref = [str(d) for d in ref.dtypes]
        note = "" if dt_mine == dt_ref else f"  [dtype diff: {list(zip(mine.columns, dt_mine, dt_ref))}]"
        print(f"PASS {name} ({len(mine)} rows, {time.time()-t0:.1f}s){note}")
        n_pass += 1
        results[name] = {"pass": True, "rows": len(mine),
                         "secs": round(time.time() - t0, 1)}
    print(f"== {n_pass} pass / {n_fail} fail ==")
    # machine-readable record next to the dumps — a committed copy
    # (CORRECTNESS_SELF_r{N}.json) survives an empty driver artifact
    with open(f"{out_dir}/check_results.json", "w") as f:
        json.dump({"n_pass": n_pass, "n_fail": n_fail, "results": results}, f, indent=1)
    return 1 if n_fail else 0

if __name__ == "__main__":
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/graft_verify"
    sys.exit(main(sf, out))
