#!/bin/bash
# Round-20: sf100 medians-of-3 for the DECLARED bucketed family
# (a2_bucketed / j2_bucketed) with same-day DuckDB denominators and
# same-day plain twins (a2_two_level_agg / j2_semi_join) — the judge's
# round-19 ask #1: ship the measured layout fix on the declared surface
# and record it at the flagship point.
#
# Phases:
#  1. cold run (reps=1): pays the one-off bucketed INGEST — recorded as
#     its own number, the cost a production ingest pays once;
#  2. plan capture: EXPLAIN at sf100 must show no keyed exchange;
#  3. warm medians (reps=3, fresh JVM — re-registers the on-disk layout
#     via DDL, no rewrite): the steady-state query cost;
#  4. same-day DuckDB medians-of-3 for the SHARED oracle SQL (the oracle
#     is layout-blind, so one denominator serves both twins);
#  5. merge into BENCH_sf100_medians.json (round-20 entries marked).
set -uo pipefail
cd /root/repo
mkdir -p scratch

Q_BKT="a2_bucketed j2_bucketed"
Q_ALL="a2_bucketed j2_bucketed a2_two_level_agg j2_semi_join"

echo "== [bucketed r20 $(date +%T)] phase 1: cold (ingest) =="
env SPARK_GRAFT_SF_DIR=scratch/sf100 \
    SPARK_GRAFT_CPUS=32 SPARK_DRIVER_MEM=48g \
    SPARK_GRAFT_REPS=1 \
    JAVA_TOOL_OPTIONS=-Dspark.cleaner.periodicGC.interval=60s \
    sbt -batch "runMain graft.BenchOne $Q_BKT" \
    > scratch/bucketed_sf100_cold.log 2>&1
rc=$?
echo "== phase 1 exit $rc =="
grep "bench-one" scratch/bucketed_sf100_cold.log || true
[ $rc -eq 0 ] || exit 1

echo "== [bucketed r20 $(date +%T)] phase 2: plan capture =="
env SPARK_GRAFT_SF_DIR=scratch/sf100 \
    SPARK_GRAFT_CPUS=32 SPARK_DRIVER_MEM=48g \
    SPARK_GRAFT_REPS=1 SPARK_GRAFT_EXPLAIN=1 \
    sbt -batch "runMain graft.BenchOne $Q_BKT" \
    > scratch/bucketed_sf100_plan.log 2>&1
if grep -q "Exchange hashpartitioning" scratch/bucketed_sf100_plan.log; then
  echo "FAIL: keyed exchange present in sf100 plan" >&2; exit 1
fi
echo "plan check OK: no keyed exchange at sf100"

echo "== [bucketed r20 $(date +%T)] phase 3: warm medians =="
env SPARK_GRAFT_SF_DIR=scratch/sf100 \
    SPARK_GRAFT_CPUS=32 SPARK_DRIVER_MEM=48g \
    SPARK_GRAFT_REPS=3 \
    JAVA_TOOL_OPTIONS=-Dspark.cleaner.periodicGC.interval=60s \
    sbt -batch "runMain graft.BenchOne $Q_ALL" \
    > scratch/bucketed_sf100_medians.log 2>&1
rc=$?
echo "== phase 3 exit $rc =="
grep "median" scratch/bucketed_sf100_medians.log || true
[ $rc -eq 0 ] || exit 1

echo "== [bucketed r20 $(date +%T)] phase 4+5: duckdb same-day + merge =="
python3 - <<'EOF'
import json, re, time, os
import duckdb

SF = "scratch/sf100"
ORACLES = json.load(open("/tmp/v20/oracle_sql.json"))

def duck_median(sql, reps=3):
    walls = []
    for _ in range(reps):
        con = duckdb.connect()  # fresh connection per rep (drops buffers)
        con.execute("SET memory_limit='70GB'")
        os.makedirs("scratch/duck_tmp", exist_ok=True)
        con.execute("SET temp_directory='scratch/duck_tmp'")
        con.execute("SET max_temp_directory_size='40GB'")
        for t in ["customer", "orders", "lineitem"]:
            p = f"{SF}/{t}.parquet"
            pat = f"{p}/*.parquet" if os.path.isdir(p) else p
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{pat}'")
        t0 = time.time()
        con.execute(f"CREATE TEMP TABLE r AS {sql}")
        walls.append(round(time.time() - t0, 2))
        con.close()
    s = sorted(walls)
    return (s[len(s)//2] if len(s) % 2 else
            (s[len(s)//2-1]+s[len(s)//2])/2), walls

pat = re.compile(r"\[bench-one\] (\S+)\s+median\s+([0-9.]+) s of \[([0-9. ]+)\]")
spark = {}
for line in open("scratch/bucketed_sf100_medians.log"):
    m = pat.search(line)
    if m:
        spark[m.group(1)] = (float(m.group(2)),
                             [float(x) for x in m.group(3).split()])

# reps=1 cold log prints the same median-line format; that single rep
# includes the one-off ingest
cold = {}
for line in open("scratch/bucketed_sf100_cold.log"):
    m = pat.search(line)
    if m:
        cold[m.group(1)] = float(m.group(2))

doc = json.load(open("BENCH_sf100_medians.json"))
qs = doc["queries"]
for name, oracle_key in [("a2_bucketed", "a2_bucketed"),
                         ("j2_bucketed", "j2_bucketed"),
                         ("a2_two_level_agg", "a2_two_level_agg"),
                         ("j2_semi_join", "j2_semi_join")]:
    if name not in spark:
        print(f"MISSING spark median for {name}"); continue
    med, reps = spark[name]
    dmed, dreps = duck_median(ORACLES[oracle_key])
    entry = {"median_sec": med, "reps_sec": reps,
             "duckdb_median_sec": dmed, "duckdb_reps_sec": dreps,
             "ratio_same_day": round(med / dmed, 2), "round": 20}
    if name in cold:
        entry["cold_first_run_incl_ingest_sec"] = cold[name]
    if name in qs and "duckdb_committed_baseline_sec" in qs[name]:
        entry["duckdb_committed_baseline_sec"] = \
            qs[name]["duckdb_committed_baseline_sec"]
    qs[name] = entry
    print(name, json.dumps(entry))
doc["note_r20"] = ("a2_bucketed/j2_bucketed are the declared bucketed-"
                   "layout twins (A2_SF100.md §6 productized); their "
                   "medians exclude the one-off ingest, recorded in "
                   "cold_first_run_incl_ingest_sec. a2/j2 plain entries "
                   "refreshed same-day for comparable denominators.")
with open("BENCH_sf100_medians.json", "w") as f:
    json.dump(doc, f, indent=1)
print("BENCH_sf100_medians.json updated")
EOF
echo "== [bucketed r20 $(date +%T)] done =="
