#!/bin/bash
# Round-18: land the HONEST sf100 bench record (the one scale point
# still on the discredited count()-pruned timing — see VERDICT r17 #1).
#
# Skip set (documented in rebench_r17.sh's header and the README):
#  - w10: standing single-window fidelity-twin skip (w2 is the route).
#  - em1/em2: honest exact pair compute ~0.93 us/pair core time
#    => ~1.6 h/rep at sf100's 2e11 pairs; em3 is the declared scale
#    route and runs here. em1/em2 stay fully measured at sf30.
#  - x7/x8/x14: their oracle-layout global ORDER BY tails are a
#    ~50-78 GB range exchange + equal sort spill at 600M x 13-16 cols;
#    x14 ENOSPC'd the box twice in round 17. The slice twins (12M
#    rows, same pipeline incl. the sort) run and hash-match at sf100.
#
# JAVA_TOOL_OPTIONS: the 30-min default ContextCleaner periodic-GC
# interval lets dereferenced shuffle files accumulate ~56 GB over an
# hour-long run and ENOSPC late queries; 60 s keeps the working set
# bounded (measured in round 17 runs b/c).
set -uo pipefail
cd /root/repo
mkdir -p scratch

echo "== [sf100 r18 $(date +%T)] start =="
rm -f scratch/bench_sf100_r18.json
env SPARK_GRAFT_SF_DIR=scratch/sf100 \
    SPARK_GRAFT_BASELINE=BASELINE_sf100.json \
    SPARK_GRAFT_CPUS=32 SPARK_DRIVER_MEM=48g \
    SPARK_GRAFT_BENCH_OUT=scratch/bench_sf100_r18.json \
    SPARK_GRAFT_REPS=1 \
    SPARK_GRAFT_SKIP_QUERIES=w10_gap_sessions_faithful,em1_blocked_closest_pair,em2_cosine_near_dup,x7_euler_rotation,x8_rodrigues,x14_se3_inverse \
    JAVA_TOOL_OPTIONS=-Dspark.cleaner.periodicGC.interval=60s \
    sbt -batch "runMain graft.Bench" > scratch/bench_sf100_r18.log 2>&1
rc=$?
echo "== [sf100 r18 $(date +%T)] exit $rc =="
# A full-disk run can leave a 0-byte BENCH_OUT — never copy that over
# the committed record.
if [ $rc -eq 0 ] && [ -s scratch/bench_sf100_r18.json ]; then
  cp scratch/bench_sf100_r18.json BENCH_sf100.json
  echo "== [sf100 r18] BENCH_sf100.json updated =="
else
  echo "== [sf100 r18] FAILED or empty output — committed record untouched ==" >&2
  exit 1
fi
