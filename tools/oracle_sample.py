#!/usr/bin/env python3
"""Build ORACLE_sf10_sample.json: replay the DuckDB oracles of a
hand-picked query sample against a graft.Verify dump at a scale-up SF
and record per-oracle seconds + the hash-compare verdict.

Usage: python3 tools/oracle_sample.py <sfDir> <verifyOutDir> [out] [note]
(the Verify dump must already exist: sbt 'runMain graft.Verify <sfDir>
<verifyOutDir> <comma-joined query list>')
"""
import glob, json, sys, time
import pandas as pd

sys.path.insert(0, "tools")
from verify_local import TABLES, compare  # noqa: E402
import duckdb  # noqa: E402


def main(sf_dir, out_dir, out="ORACLE_sf10_sample.json", note=""):
    import os
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.isdir(p):
            p = f"{p}/*.parquet"
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    passed, failed = {}, []
    for name, sql in sorted(oracle.items()):
        files = sorted(glob.glob(f"{out_dir}/{name}/*.parquet"))
        if not files:
            failed.append((name, "no spark parquet written"))
            continue
        spark_df = pd.concat([pd.read_parquet(f) for f in files],
                             ignore_index=True)
        t0 = time.time()
        try:
            duck_df = con.execute(sql).fetchdf()
        except Exception as e:
            failed.append((name, f"ORACLE-SQL-ERROR {e}"))
            continue
        dt = round(time.time() - t0, 1)
        err = compare(name, spark_df, duck_df)
        if err:
            failed.append((name, err))
        else:
            passed[name] = dt
        print(f"{'PASS' if not err else 'FAIL'} {name} ({dt}s)"
              + (f": {err}" if err else ""), flush=True)
    doc = {
        "metric": "sf10_oracle_sample",
        "note": note,
        "pass": passed,
        "fail": failed,
        "n_pass": len(passed),
    }
    with open(out, "w") as f:
        json.dump(doc, f, indent=1)
    print(f"{len(passed)} pass, {len(failed)} fail -> {out}")
    return 1 if failed else 0


if __name__ == "__main__":
    sys.exit(main(*sys.argv[1:]))
