#!/bin/bash
# Round-20: em3-vs-em1 agreement at scale (verdict r19 next-round #5).
# The committed agreement numbers (0.90 no-replica, 1.00 sf10) predate
# the sf100 flagship; this runs `Em3Sweep agree 3` (the declared em3
# config: nProbe=3, hot-cell cap per the query body) at the given scale
# point. Usage: scripts/em3agree_r20.sh scratch/sf30 [out-tag]
set -uo pipefail
cd /root/repo
SF="${1:-scratch/sf30}"
TAG="${2:-$(basename "$SF")}"
mkdir -p scratch
echo "== [em3-agree r20 $(date +%T)] $SF =="
env SPARK_GRAFT_SF_DIR="$SF" \
    SPARK_GRAFT_CPUS=32 SPARK_DRIVER_MEM=48g \
    JAVA_TOOL_OPTIONS=-Dspark.cleaner.periodicGC.interval=60s \
    sbt -batch "runMain graft.Em3Sweep agree 3:1024" \
    > "scratch/em3agree_r20_$TAG.log" 2>&1
rc=$?
grep "em3-sweep" "scratch/em3agree_r20_$TAG.log" || true
echo "== [em3-agree r20 $(date +%T)] exit $rc =="
exit $rc
