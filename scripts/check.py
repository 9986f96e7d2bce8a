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

Memory/speed: at mult>=100 scale points single results reach 30-180M
rows. The original compare (ORDER BY every column on both sides, fetch
into pandas, per-column astype(str) equality) cost two O(n log n) sorts
plus ~an hour of python string conversion per 180M-row query, and one
long-lived connection exhausted 128 GB at sf10. Now each query gets a
fresh connection (drops DuckDB's buffer pool) and the value compare runs
ENTIRELY inside DuckDB as a typed row-multiset equality — EXCEPT ALL in
both directions over name-sorted projections — so no sort, no pandas
frame, and no stringify ever touches the big results. Equality is
DuckDB's DISTINCT-style (NULL==NULL, NaN==NaN), the same row-multiset
the old string compare checked; the driver's own sf0.01 gate remains the
string-hash authority for formatting-level drift.
"""
import gc
import json
import os
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

# above this row count the value compare switches from raw-row EXCEPT to
# 64-bit row-hash multisets (see run_one); overridable for testing
HASH_ROWS = int(os.environ.get("SPARK_GRAFT_HASH_ROWS", "50000000"))


def table_src(sf_dir, t):
    """FROM target: single parquet file, or a directory of part files
    (datagen writes split tables as directories for parallel scans)."""
    p = f"{sf_dir}/{t}.parquet"
    return f"'{p}/*.parquet'" if os.path.isdir(p) else f"'{p}'"


def run_one(sf_dir, out_dir, name, sql):
    """One query under a fresh connection; returns 'pass'/'fail'."""
    con = duckdb.connect()
    try:
        # give DuckDB a spill path (in-memory connections otherwise
        # can't offload) and leave headroom for the OS page cache.
        # SPARK_GRAFT_DUCK_MEM: raise when the box is otherwise idle —
        # a 180M-row EXCEPT that fits in RAM never touches the (much
        # smaller) free disk.
        mem = os.environ.get("SPARK_GRAFT_DUCK_MEM", "70GB")
        con.execute(f"SET memory_limit='{mem}'")
        # spill path + HARD spill cap: sf100's sim3 oracle filled the
        # whole disk through DuckDB temp storage and ENOSPC'd mid-sweep;
        # with the cap the one oracle fails soft (caught below as a
        # per-query FAIL) and the sweep's disk budget holds.
        duck_tmp = os.environ.get("SPARK_GRAFT_DUCK_TMP", "scratch/duck_tmp")
        os.makedirs(duck_tmp, exist_ok=True)
        con.execute(f"SET temp_directory='{duck_tmp}'")
        con.execute(f"SET max_temp_directory_size='"
                    f"{os.environ.get('SPARK_GRAFT_DUCK_TMP_CAP', '40GB')}'")
        for t in TABLES:
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM {table_src(sf_dir, t)}")
        try:
            wcols = list(con.sql(sql).columns)
        except Exception as e:
            print(f"FAIL {name}: oracle error: {e}")
            return "fail"
        try:
            gcols = list(con.sql(
                f"SELECT * FROM '{out_dir}/{name}/*.parquet'").columns)
        except Exception as e:
            print(f"FAIL {name}: spark result missing: {e}")
            return "fail"
        if sorted(wcols) != sorted(gcols):
            print(f"FAIL {name}: schema want={sorted(wcols)} "
                  f"got={sorted(gcols)}")
            return "fail"
        proj = ", ".join(f'"{c}"' for c in sorted(wcols))
        # the Spark side stays a VIEW: it is already materialized as
        # parquet on disk, so compare branches just re-scan it — a
        # temp-table copy doubled spill volume and filled the disk on
        # 180M-row results
        con.execute(f"CREATE VIEW g_ AS SELECT {proj} "
                    f"FROM '{out_dir}/{name}/*.parquet'")
        ng = con.execute("SELECT count(*) FROM g_").fetchone()[0]
        # Spark dumps may be multi-part at natural parallelism
        # (SPARK_GRAFT_DUMP_COALESCE=0) so row ORDER is not compared —
        # multiset equality is the contract, same as before.
        if ng <= HASH_ROWS:
            # exact typed compare with sample-row diagnostics; the oracle
            # is materialized ONCE (the EXCEPTs would otherwise
            # re-execute it per branch) and spills via temp_directory
            con.execute(
                f"CREATE TEMP TABLE w_ AS SELECT {proj} FROM ({sql})")
            nw = con.execute("SELECT count(*) FROM w_").fetchone()[0]
            if nw != ng:
                print(f"FAIL {name}: rows want={nw} got={ng}")
                return "fail"
            sample = con.execute(
                "SELECT * FROM ("
                " (SELECT 'oracle-only' AS side_, * FROM"
                "   (SELECT * FROM w_ EXCEPT ALL SELECT * FROM g_))"
                " UNION ALL"
                " (SELECT 'spark-only' AS side_, * FROM"
                "   (SELECT * FROM g_ EXCEPT ALL SELECT * FROM w_))"
                ") LIMIT 3").fetchall()
            if sample:
                print(f"FAIL {name}: multiset diff, sample rows: {sample}")
                return "fail"
        else:
            # beyond HASH_ROWS a raw-row EXCEPT outgrows RAM + free disk
            # (a 180M-row two-directional EXCEPT over wide/string rows
            # peaked past 100 GB mem + 50 GB spill): compare the multiset
            # of 64-bit row hashes instead — same counts + multiset
            # contract at ~8 bytes/row, collision odds ~n^2/2^65.
            # The oracle runs ONCE into the hash temp table.
            # DuckDB's hash() is width-uniform for integers but NOT
            # across FLOAT/DECIMAL/DOUBLE, so approx/decimal columns are
            # cast to DOUBLE per side (the typed EXCEPT coerced these
            # implicitly) — integer-vs-double stays a legit mismatch.
            def hproj(rel_sql):
                types = [str(t) for t in con.sql(rel_sql).types]
                cols = []
                for c, t in zip(sorted(wcols), types):
                    if t in ("FLOAT", "REAL") or t.startswith("DECIMAL"):
                        cols.append(f'CAST("{c}" AS DOUBLE)')
                    else:
                        cols.append(f'"{c}"')
                return ", ".join(cols)
            con.execute(
                f"CREATE TEMP TABLE wh AS SELECT hash(ROW("
                f"{hproj(f'SELECT {proj} FROM ({sql}) LIMIT 0')})) AS h "
                f"FROM ({sql})")
            nw = con.execute("SELECT count(*) FROM wh").fetchone()[0]
            if nw != ng:
                print(f"FAIL {name}: rows want={nw} got={ng}")
                return "fail"
            gh = (f"SELECT hash(ROW({hproj('SELECT * FROM g_ LIMIT 0')}))"
                  f" AS h FROM g_")
            sample = con.execute(
                "SELECT * FROM ("
                " (SELECT 'oracle-only' AS side_, h FROM"
                f"   (SELECT h FROM wh EXCEPT ALL {gh}))"
                " UNION ALL"
                " (SELECT 'spark-only' AS side_, h FROM"
                f"   ({gh} EXCEPT ALL SELECT h FROM wh))"
                ") LIMIT 3").fetchall()
            if sample:
                print(f"FAIL {name}: row-hash multiset diff "
                      f"(hash-mode, >{HASH_ROWS} rows): {sample}")
                return "fail"
        print(f"PASS {name} ({ng} rows)")
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
