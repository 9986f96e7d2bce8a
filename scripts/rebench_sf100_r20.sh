#!/bin/bash
# Round-20: re-record the sf100 flagship sweep on the FINAL binary so
# the committed flagship record includes the declared bucketed family
# (a2/j1/j2_bucketed + the bucketed_ingest line). Same invocation,
# disk barrier, and skip set as round 19's re-record.
#
# Skip set unchanged from rebench_sf100_r18.sh (rationale in its header
# and the README): w10 single-window fidelity twin; em1/em2 exact pair
# witnesses (~1.6 h/rep at 2e11 pairs — em3 is the declared scale route
# and runs here); x7/x8/x14 oracle-layout global-sort tails (50-78 GB
# range-exchange spills; their slice twins run and hash-match at sf100).
#
# JAVA_TOOL_OPTIONS: 60 s ContextCleaner periodic GC — the 30-min
# default accumulates ~56 GB of dead shuffle files over an hour-long
# run (measured round 17).
set -uo pipefail
cd /root/repo
mkdir -p scratch

echo "== [sf100 r20 $(date +%T)] start =="
rm -f scratch/bench_sf100_r20.json
env SPARK_GRAFT_SF_DIR=scratch/sf100 \
    SPARK_GRAFT_BASELINE=BASELINE_sf100.json \
    SPARK_GRAFT_CPUS=32 SPARK_DRIVER_MEM=48g \
    SPARK_GRAFT_BENCH_OUT=scratch/bench_sf100_r20.json \
    SPARK_GRAFT_REPS=1 \
    SPARK_GRAFT_MIN_FREE_GB=24 \
    SPARK_GRAFT_SKIP_QUERIES=w10_gap_sessions_faithful,em1_blocked_closest_pair,em2_cosine_near_dup,x7_euler_rotation,x8_rodrigues,x14_se3_inverse \
    JAVA_TOOL_OPTIONS=-Dspark.cleaner.periodicGC.interval=60s \
    sbt -batch "runMain graft.Bench" > scratch/bench_sf100_r20.log 2>&1
rc=$?
echo "== [sf100 r20 $(date +%T)] exit $rc =="
# A full-disk run can leave a 0-byte BENCH_OUT — never copy that over
# the committed record.
if [ $rc -eq 0 ] && [ -s scratch/bench_sf100_r20.json ]; then
  cp scratch/bench_sf100_r20.json BENCH_sf100.json
  echo "== [sf100 r20] BENCH_sf100.json updated =="
else
  echo "== [sf100 r20] FAILED or empty output — committed record untouched ==" >&2
  exit 1
fi
