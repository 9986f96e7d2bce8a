#!/bin/bash
# Round-19: direct alpha proof on a constant-dup-rate corpus
# (verdict #5). TREND.md attributes t6/t8/em3's alpha 1.5-2.0 flags to
# datagen.py's replica quadratic (true dup pairs grow ~N^2 by
# construction); this measures the same operators at two sizes of a
# corpus whose dup structure is constant per row
# (scripts/datagen_constdup.py) — expect alpha ~<= 1.2.
#
# Two points, 3x apart (mult 100 / 300), medians of 3 per line.
# Output: CONSTDUP_ALPHA.json.
set -uo pipefail
cd /root/repo
mkdir -p scratch

QUERIES="t6_near_dup_candidates t8_jaccard_verify em3_ivf_closest_pair"

for m in 100 300; do
  if [ ! -s "scratch/constdup$m/embeddings.parquet" ]; then
    echo "== [constdup r19 $(date +%T)] datagen mult=$m =="
    python3 scripts/datagen_constdup.py /root/testdata/sf0.1 \
      "scratch/constdup$m" "$m" || exit 1
  fi
  echo "== [constdup r19 $(date +%T)] bench mult=$m =="
  env SPARK_GRAFT_SF_DIR="scratch/constdup$m" \
      SPARK_GRAFT_CPUS=32 SPARK_DRIVER_MEM=48g \
      SPARK_GRAFT_REPS=3 \
      JAVA_TOOL_OPTIONS=-Dspark.cleaner.periodicGC.interval=60s \
      sbt -batch "runMain graft.BenchOne $QUERIES" \
      > "scratch/constdup_bench_$m.log" 2>&1 || {
        echo "BenchOne failed at mult=$m" >&2; exit 1; }
done

python3 - <<'EOF'
import json, math, re
pat = re.compile(
    r"\[bench-one\] (\S+)\s+median\s+([0-9.]+) s of \[([0-9. ]+)\]")
pts = {}
for m in (100, 300):
    for line in open(f"scratch/constdup_bench_{m}.log"):
        g = pat.search(line)
        if g:
            pts.setdefault(g.group(1), {})[m] = {
                "median_sec": float(g.group(2)),
                "reps_sec": [float(x) for x in g.group(3).split()]}
out = {"metric": "constdup_alpha", "corpus": "scripts/datagen_constdup.py",
       "points": {"100": "scratch/constdup100", "300": "scratch/constdup300"},
       "queries": {}}
for q, d in pts.items():
    a = math.log(d[300]["median_sec"] / d[100]["median_sec"]) / math.log(3)
    out["queries"][q] = {"alpha": round(a, 2),
                         "t100_sec": d[100]["median_sec"],
                         "t300_sec": d[300]["median_sec"],
                         "reps_100": d[100]["reps_sec"],
                         "reps_300": d[300]["reps_sec"]}
with open("CONSTDUP_ALPHA.json", "w") as f:
    json.dump(out, f, indent=1)
print(json.dumps(out, indent=1))
EOF
echo "== [constdup r19] CONSTDUP_ALPHA.json written =="
