#!/bin/bash
# Round-20: extend the constant-dup-rate alpha proof to t10/t11
# (verdict r19 next-round #2) — the only two alpha>1.3 sf100 lines whose
# attribution was still indirect (t10: reps=1 outlier; t11:
# output-quadratic by construction, unmeasured). Same corpus and
# methodology as scripts/constdup_r19.sh (mult 100/300, medians of 3);
# MERGES the new entries into CONSTDUP_ALPHA.json alongside the r19
# t6/t8/em3 entries.
set -uo pipefail
cd /root/repo
mkdir -p scratch

QUERIES="t10_winnow_fp t11_simhash_near_dup"

for m in 100 300; do
  if [ ! -s "scratch/constdup$m/documents.parquet" ] \
      && [ ! -d "scratch/constdup$m/documents.parquet" ]; then
    echo "== [constdup r20 $(date +%T)] datagen mult=$m =="
    python3 scripts/datagen_constdup.py /root/testdata/sf0.1 \
      "scratch/constdup$m" "$m" || exit 1
  fi
  echo "== [constdup r20 $(date +%T)] bench mult=$m =="
  env SPARK_GRAFT_SF_DIR="scratch/constdup$m" \
      SPARK_GRAFT_CPUS=32 SPARK_DRIVER_MEM=48g \
      SPARK_GRAFT_REPS=3 \
      JAVA_TOOL_OPTIONS=-Dspark.cleaner.periodicGC.interval=60s \
      sbt -batch "runMain graft.BenchOne $QUERIES" \
      > "scratch/constdup_r20_bench_$m.log" 2>&1 || {
        echo "BenchOne failed at mult=$m" >&2; exit 1; }
done

python3 - <<'EOF'
import json, math, re
pat = re.compile(
    r"\[bench-one\] (\S+)\s+median\s+([0-9.]+) s of \[([0-9. ]+)\]")
pts = {}
for m in (100, 300):
    for line in open(f"scratch/constdup_r20_bench_{m}.log"):
        g = pat.search(line)
        if g:
            pts.setdefault(g.group(1), {})[m] = {
                "median_sec": float(g.group(2)),
                "reps_sec": [float(x) for x in g.group(3).split()]}
out = json.load(open("CONSTDUP_ALPHA.json"))
for q, d in pts.items():
    a = math.log(d[300]["median_sec"] / d[100]["median_sec"]) / math.log(3)
    out["queries"][q] = {"alpha": round(a, 2),
                         "t100_sec": d[100]["median_sec"],
                         "t300_sec": d[300]["median_sec"],
                         "reps_100": d[100]["reps_sec"],
                         "reps_300": d[300]["reps_sec"],
                         "round": 20}
with open("CONSTDUP_ALPHA.json", "w") as f:
    json.dump(out, f, indent=1)
print(json.dumps(out, indent=1))
EOF
echo "== [constdup r20] CONSTDUP_ALPHA.json updated =="
