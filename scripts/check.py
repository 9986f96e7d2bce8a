#!/usr/bin/env python3
"""Local replica of the driver's t2 correctness gate (dev tooling only —
not part of the shipped library). Runs each oracle SQL from
oracle_sql.json in DuckDB against the sf parquet tables and compares with
the Spark result parquet written by graft.Verify.

Usage: python3 scripts/check.py <sfDir> <verifyOutDir> [query ...]

Env: SPARK_GRAFT_SKIP_ORACLES — comma-separated query names to skip
(reported as SKIP, not counted as fail). Used at huge scale points where
an O(n^2) single-node oracle (em1/em2) would take hours in DuckDB while
the Spark side stays sub-second; correctness for those is pinned at the
smaller scale points instead.

Memory: at mult>=100 scale points single results reach 30-50M rows. One
long-lived connection plus whole-frame astype(str) compares exhausted
128 GB at sf10 (every query after the high-water mark failed with malloc
errors), so each query now gets a fresh connection (drops DuckDB's
buffer pool), the value compare runs column-at-a-time, and frames are
freed eagerly.
"""
import gc
import json
import os
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def table_src(sf_dir, t):
    """FROM target: single parquet file, or a directory of part files
    (datagen writes split tables as directories for parallel scans)."""
    p = f"{sf_dir}/{t}.parquet"
    return f"'{p}/*.parquet'" if os.path.isdir(p) else f"'{p}'"


def canon(con, rel):
    """DataFrame with columns sorted by name and rows in a canonical
    total order (ORDER BY every column, name-sorted). Each query's own
    ORDER BY is already total, but the Spark dump may be written as
    multiple part files at natural parallelism (SPARK_GRAFT_DUMP_COALESCE=0
    at scale points) and a parallel glob read does not preserve global
    order — so both sides are re-sorted the same way, keeping the compare
    an exact schema + row-multiset equality either way."""
    cols = ", ".join(f'"{c}"' for c in sorted(rel.columns))
    return rel.project(cols).order(cols).fetchdf()


def compare(name, want, got):
    """Exact value compare (mirrors the driver's hash of values), one
    column at a time so peak memory is two string arrays of a single
    column, not two stringified copies of the whole frame."""
    import numpy as np
    for c in want.columns:
        aw = want[c].astype(str).values
        ag = got[c].astype(str).values
        neq = aw != ag
        if neq.any():
            r = int(np.argwhere(neq)[0][0])
            print(f"FAIL {name}: first diff col {c} row {r}: "
                  f"want={want.iloc[r][c]!r} got={got.iloc[r][c]!r} "
                  f"({int(neq.sum())} cells differ in this column)")
            return False
        del aw, ag, neq
    return True


def run_one(sf_dir, out_dir, name, sql):
    """One query under a fresh connection; returns 'pass'/'fail'."""
    con = duckdb.connect()
    try:
        # leave headroom for the python-side frames, and give DuckDB a
        # spill path (in-memory connections otherwise can't offload)
        con.execute("SET memory_limit='70GB'")
        con.execute("SET temp_directory='scratch/duck_tmp'")
        for t in TABLES:
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM {table_src(sf_dir, t)}")
        try:
            want = canon(con, con.sql(sql))
        except Exception as e:
            print(f"FAIL {name}: oracle error: {e}")
            return "fail"
        try:
            got = canon(con, con.sql(
                f"SELECT * FROM '{out_dir}/{name}/*.parquet'"))
        except Exception as e:
            print(f"FAIL {name}: spark result missing: {e}")
            return "fail"
        if list(want.columns) != list(got.columns):
            print(f"FAIL {name}: schema want={list(want.columns)} "
                  f"got={list(got.columns)}")
            return "fail"
        if len(want) != len(got):
            print(f"FAIL {name}: rows want={len(want)} got={len(got)}")
            return "fail"
        if not compare(name, want, got):
            return "fail"
        print(f"PASS {name} ({len(want)} rows)")
        return "pass"
    finally:
        con.close()
        gc.collect()


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    skip = {s for s in os.environ.get(
        "SPARK_GRAFT_SKIP_ORACLES", "").split(",") if s}
    n_pass = n_fail = n_skip = 0
    for name, sql in sorted(oracle.items()):
        if only and name not in only:
            continue
        if name in skip:
            print(f"SKIP {name} (SPARK_GRAFT_SKIP_ORACLES)")
            n_skip += 1
            continue
        sys.stdout.flush()
        try:
            r = run_one(sf_dir, out_dir, name, sql)
        except (duckdb.Error, OSError, MemoryError) as e:
            # a dying oracle (e.g. DuckDB OOM at a huge scale point) must
            # not kill the whole sweep: the allocator can still be
            # releasing the previous connection's memory when the next
            # connection's SET/CREATE VIEW runs, which raises OUTSIDE
            # run_one's inner try blocks. Count it, breathe, continue.
            # Deliberately NARROW (duckdb/IO/memory only): a programming
            # error in this harness must raise, not masquerade as a wall
            # of query FAILs with a 10 s sleep each.
            print(f"FAIL {name}: harness error: {e}")
            r = "fail"
            gc.collect()
            import time
            time.sleep(10)
        if r == "pass":
            n_pass += 1
        else:
            n_fail += 1
    print(f"== {n_pass} pass, {n_fail} fail, {n_skip} skip ==")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
