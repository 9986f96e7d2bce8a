#!/bin/bash
# Round-20 (late): sf100 medians for j1_bucketed vs plain j1 with a
# same-day DuckDB denominator — same methodology as
# scripts/bucketed_sf100_r20.sh, one query family.
set -uo pipefail
cd /root/repo
mkdir -p scratch

echo "== [j1bucket r20 $(date +%T)] cold (pays orders_wide ingest) =="
env SPARK_GRAFT_SF_DIR=scratch/sf100 \
    SPARK_GRAFT_CPUS=32 SPARK_DRIVER_MEM=48g \
    SPARK_GRAFT_REPS=1 \
    JAVA_TOOL_OPTIONS=-Dspark.cleaner.periodicGC.interval=60s \
    sbt -batch "runMain graft.BenchOne j1_bucketed" \
    > scratch/j1bucket_sf100_cold.log 2>&1 || { echo cold failed >&2; exit 1; }
grep "bench-one" scratch/j1bucket_sf100_cold.log

echo "== [j1bucket r20 $(date +%T)] plan capture =="
env SPARK_GRAFT_SF_DIR=scratch/sf100 \
    SPARK_GRAFT_CPUS=32 SPARK_DRIVER_MEM=48g \
    SPARK_GRAFT_REPS=1 SPARK_GRAFT_EXPLAIN=1 \
    sbt -batch "runMain graft.BenchOne j1_bucketed" \
    > scratch/j1bucket_sf100_plan.log 2>&1
if grep -q "Exchange hashpartitioning" scratch/j1bucket_sf100_plan.log; then
  echo "FAIL: keyed exchange present in sf100 j1_bucketed plan" >&2; exit 1
fi
echo "plan check OK: no keyed exchange at sf100"

echo "== [j1bucket r20 $(date +%T)] warm medians =="
env SPARK_GRAFT_SF_DIR=scratch/sf100 \
    SPARK_GRAFT_CPUS=32 SPARK_DRIVER_MEM=48g \
    SPARK_GRAFT_REPS=3 \
    JAVA_TOOL_OPTIONS=-Dspark.cleaner.periodicGC.interval=60s \
    sbt -batch "runMain graft.BenchOne j1_bucketed j1_equi_join_broadcast" \
    > scratch/j1bucket_sf100_medians.log 2>&1 || { echo medians failed >&2; exit 1; }
grep "bench-one" scratch/j1bucket_sf100_medians.log

python3 - <<'EOF'
import json, re, time, os
import duckdb

SF = "scratch/sf100"
ORACLES = json.load(open("/tmp/v20/oracle_sql.json"))

def duck_median(sql, reps=3):
    walls = []
    for _ in range(reps):
        con = duckdb.connect()
        con.execute("SET memory_limit='70GB'")
        os.makedirs("scratch/duck_tmp", exist_ok=True)
        con.execute("SET temp_directory='scratch/duck_tmp'")
        con.execute("SET max_temp_directory_size='40GB'")
        for t in ["customer", "orders"]:
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
for line in open("scratch/j1bucket_sf100_medians.log"):
    m = pat.search(line)
    if m:
        spark[m.group(1)] = (float(m.group(2)),
                             [float(x) for x in m.group(3).split()])
cold = {}
for line in open("scratch/j1bucket_sf100_cold.log"):
    m = pat.search(line)
    if m:
        cold[m.group(1)] = float(m.group(2))

doc = json.load(open("BENCH_sf100_medians.json"))
qs = doc["queries"]
dmed, dreps = duck_median(ORACLES["j1_bucketed"])
for name in ("j1_bucketed", "j1_equi_join_broadcast"):
    med, reps = spark[name]
    entry = {"median_sec": med, "reps_sec": reps,
             "duckdb_median_sec": dmed, "duckdb_reps_sec": dreps,
             "ratio_same_day": round(med / dmed, 2), "round": 20}
    if name in cold:
        entry["cold_first_run_incl_ingest_sec"] = cold[name]
    qs[name] = entry
    print(name, json.dumps(entry))
with open("BENCH_sf100_medians.json", "w") as f:
    json.dump(doc, f, indent=1)
print("BENCH_sf100_medians.json updated")
EOF
echo "== [j1bucket r20 $(date +%T)] done =="
