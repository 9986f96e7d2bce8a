#!/usr/bin/env python3
"""Record the DuckDB single-node baseline (dev tooling only — not part of
the shipped library): run each oracle SQL from a Verify dump's
oracle_sql.json in DuckDB against the sf parquet tables, time it, and
write per-query wall seconds to BASELINE_local.json. graft.Bench reads
that file and prints per-query spark/duckdb ratios so "within 2x of the
local baseline" is mechanically checkable.

Usage: python3 scripts/baseline.py <sfDir> <verifyOutDir> [outJson]
"""
import json
import sys
import time

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    out_json = sys.argv[3] if len(sys.argv) > 3 else "BASELINE_local.json"
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    times = {}
    for name, sql in sorted(oracle.items()):
        # warm once (page cache, catalog), then time the better of 2 runs
        try:
            con.sql(sql).fetchall()
            best = None
            for _ in range(2):
                t0 = time.perf_counter()
                con.sql(sql).fetchall()
                dt = time.perf_counter() - t0
                best = dt if best is None else min(best, dt)
            times[name] = round(best, 4)
            print(f"{name}: {times[name]} s")
        except Exception as e:
            print(f"{name}: SKIP ({e})", file=sys.stderr)
    payload = {"sf_dir": sf_dir, "engine": "duckdb",
               "engine_version": duckdb.__version__,
               "note": "per-query wall seconds, best of 2 after warmup, "
                       "single-threaded-engine defaults",
               "queries": times}
    with open(out_json, "w") as f:
        json.dump(payload, f, indent=1, sort_keys=True)
    print(f"wrote {out_json} ({len(times)} queries)")


if __name__ == "__main__":
    main()
