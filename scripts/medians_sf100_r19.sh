#!/bin/bash
# Round-19: medians-of-3 for the TREND-flagged sf100 lines (verdict #3).
# a2's own two r18 sweeps differed 2.8x (31.8 vs 87.6 s) — reps=1
# variance at this point is larger than most effects being judged, so
# the flagged >=10 s lines get a committed per-line medians file the
# next trend fit can prefer over the sweep's single shots.
#
# One warm JVM (BenchOne) for all lines; the per-rep cache release in
# BenchOne keeps reps honest. Output: BENCH_sf100_medians.json.
set -uo pipefail
cd /root/repo
mkdir -p scratch

QUERIES="a2_two_level_agg w1_sort_mtime t10_winnow_fp t11_simhash_near_dup t6_near_dup_candidates t8_jaccard_verify em3_ivf_closest_pair x5_norm_residual x6_rigid_transform w2_gap_sessions"

echo "== [medians r19 $(date +%T)] start =="
env SPARK_GRAFT_SF_DIR=scratch/sf100 \
    SPARK_GRAFT_CPUS=32 SPARK_DRIVER_MEM=48g \
    SPARK_GRAFT_REPS=3 \
    JAVA_TOOL_OPTIONS=-Dspark.cleaner.periodicGC.interval=60s \
    sbt -batch "runMain graft.BenchOne $QUERIES" \
    > scratch/medians_sf100_r19.log 2>&1
rc=$?
echo "== [medians r19 $(date +%T)] exit $rc =="
[ $rc -eq 0 ] || { echo "BenchOne failed" >&2; exit 1; }

python3 - <<'EOF'
import json, re
rows = {}
pat = re.compile(
    r"\[bench-one\] (\S+)\s+median\s+([0-9.]+) s of \[([0-9. ]+)\]")
for line in open("scratch/medians_sf100_r19.log"):
    m = pat.search(line)
    if m:
        rows[m.group(1)] = {
            "median_sec": float(m.group(2)),
            "reps_sec": [float(x) for x in m.group(3).split()]}
out = {"metric": "sf100_flagged_medians", "sf": "scratch/sf100",
       "reps": 3, "queries": rows}
with open("BENCH_sf100_medians.json", "w") as f:
    json.dump(out, f, indent=1)
print(json.dumps(out, indent=1))
EOF
echo "== [medians r19] BENCH_sf100_medians.json written =="
