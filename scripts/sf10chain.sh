#!/bin/bash
# Round-16 sf10 refresh chain (dev tooling): regenerate the 100x corpus,
# sweep the full 92-query surface, re-record baseline + bench. The prior
# sf10 record (r13 era) covered 64 queries; this brings the middle scale
# point onto the current surface (em3, slice twins, px family, w10).
set -uo pipefail
cd /root/repo

# Oracle-side skips (single-node oracle scale limits, each covered by a
# slice twin at this scale + full rows at sf1): the em family's oracles
# are quadratic-within-label (em3's is the same shape /6), t7/t11's
# exhaust DuckDB memory (observed OOM at 1.5M docs on the lowdup point;
# 500k dup-heavy docs here carry the same full-form risk and the same
# skip precedent as the r13 sf10 record).
SKIP_O="em1_blocked_closest_pair,em2_cosine_near_dup,em3_ivf_closest_pair,t7_simhash,t11_simhash_near_dup"

# datagen into a temp dir + atomic mv: a chain killed mid-generation
# must not leave a partial scratch/sf10 that a resume would mistake for
# a complete corpus (the -d guard below is only safe with this rename)
if [ ! -d scratch/sf10 ]; then
  echo "== [chain $(date +%T)] datagen =="
  rm -rf scratch/sf10.tmp
  python3 scripts/datagen.py /root/testdata/sf0.1 scratch/sf10.tmp 100 \
    > scratch/datagen_sf10_r16.log 2>&1
  rc=$?
  echo "== [chain $(date +%T)] datagen exit $rc =="
  [ "$rc" = "0" ] && mv scratch/sf10.tmp scratch/sf10 || exit 1
fi

for i in 1 2; do
  echo "== [chain $(date +%T)] scalepass pass $i =="
  SPARK_GRAFT_SKIP_ORACLES="$SKIP_O" \
  SPARK_GRAFT_DUCK_TMP_CAP=30GB SPARK_DRIVER_MEM=32g \
    bash scripts/scalepass.sh scratch/sf10 scratch/verify_sf10_r16 4 \
    >> scratch/scalepass_sf10_r16.log 2>&1
  rc=$?
  echo "== [chain $(date +%T)] scalepass pass $i exit $rc =="
  [ "$rc" = "0" ] && break
done
# hard stop when every scalepass attempt failed: perf records must never
# be refreshed for a corpus whose correctness sweep never passed (the
# script runs without -e, so the loop alone cannot abort the chain)
if [ "$rc" != "0" ]; then
  echo "== [chain $(date +%T)] SCALEPASS FAILED after retries — aborting before baseline/bench =="
  exit 1
fi

echo "== [chain $(date +%T)] baseline =="
SPARK_GRAFT_SKIP_ORACLES="$SKIP_O" SPARK_GRAFT_SINGLE_RUN_SEC=60 \
SPARK_GRAFT_DUCK_TMP_CAP=30GB \
  python3 scripts/baseline.py scratch/sf10 scratch/verify_sf10_r16 \
  BASELINE_sf10.json >> scratch/baseline_sf10_r16.log 2>&1
echo "== [chain $(date +%T)] baseline exit $? =="

echo "== [chain $(date +%T)] bench on HEAD =="
# a crashed rerun must not silently record a PREVIOUS run's out file
rm -f scratch/bench_sf10_head.json
SPARK_GRAFT_SF_DIR=scratch/sf10 SPARK_GRAFT_BASELINE=BASELINE_sf10.json \
SPARK_GRAFT_CPUS=32 SPARK_DRIVER_MEM=32g \
SPARK_GRAFT_BENCH_OUT=scratch/bench_sf10_head.json \
  sbt -batch "runMain graft.Bench" > scratch/bench_sf10_r16.log 2>&1
# bench JSON from the file Bench writes, never a truncating log grep
test -s scratch/bench_sf10_head.json \
  && cp scratch/bench_sf10_head.json BENCH_sf10.json \
  && echo "== [chain $(date +%T)] bench recorded ==" \
  || echo "== [chain $(date +%T)] BENCH EMPTY =="
echo "== [chain $(date +%T)] done =="
