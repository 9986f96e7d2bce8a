#!/bin/bash
# Round-17 sf30 refresh chain (dev tooling): bring the 300x point onto
# the current 92-query surface (em3, adaptive dedup, the r17 floor-form
# x7/x8/x14 oracles) so the sf1->sf10->sf30->sf100 trend is same-surface.
# The r15-era sf30 record predates all of those.
#
# DELIBERATE oracle skips (the "~2 h full oracles" the r16 verdict said
# to skip; every one is covered by a hash-matched slice twin at this
# scale plus full rows at <= sf10):
#  - em1/em2/em3: quadratic-within-label DuckDB oracles (hours at 300x)
#  - t6 (193 s at sf10, superlinear), t8 (~800 s at sf10), t10 (142 s at
#    sf10; its sf30 output is ~150M rows)
#  - t7/t11: full-form oracles OOM DuckDB at >= 1.5M docs (measured on
#    the lowdup30 corpus at a 90 GB limit)
#  - s3: read_blob oracle file-count limit (r15 sf30 precedent)
#  - sim3: Lloyd-unrolled oracle (ENOSPC'd DuckDB temp at sf100; same
#    shape here, slice twin carries)
# Spark-side skips: none — every declared query runs at 300x.
set -uo pipefail
cd /root/repo

SKIP_O="em1_blocked_closest_pair,em2_cosine_near_dup,em3_ivf_closest_pair,t6_near_dup_candidates,t7_simhash,t8_jaccard_verify,t10_winnow_fp,t11_simhash_near_dup,s3_binary_meta,sim3_ivf_topk"

if [ ! -d scratch/sf30 ]; then
  echo "== [chain $(date +%T)] scratch/sf30 missing — run datagen first =="
  exit 1
fi

for i in 1 2; do
  echo "== [chain $(date +%T)] scalepass pass $i =="
  SPARK_GRAFT_SKIP_ORACLES="$SKIP_O" \
  SPARK_GRAFT_DUCK_TMP_CAP=30GB SPARK_DRIVER_MEM=32g \
    bash scripts/scalepass.sh scratch/sf30 scratch/verify_sf30_r17 4 \
    >> scratch/scalepass_sf30_r17.log 2>&1
  rc=$?
  echo "== [chain $(date +%T)] scalepass pass $i exit $rc =="
  [ "$rc" = "0" ] && break
done
# hard stop when every scalepass attempt failed (same guard as
# sf10chain.sh): never refresh perf records for an unverified corpus
if [ "$rc" != "0" ]; then
  echo "== [chain $(date +%T)] SCALEPASS FAILED after retries — aborting before baseline/bench =="
  exit 1
fi

echo "== [chain $(date +%T)] baseline (fresh — surface + floor-form SQL changed) =="
rm -f BASELINE_sf30.json
SPARK_GRAFT_SKIP_ORACLES="$SKIP_O" SPARK_GRAFT_SINGLE_RUN_SEC=60 \
SPARK_GRAFT_DUCK_TMP_CAP=30GB \
  python3 scripts/baseline.py scratch/sf30 scratch/verify_sf30_r17 \
  BASELINE_sf30.json >> scratch/baseline_sf30_r17.log 2>&1
echo "== [chain $(date +%T)] baseline exit $? =="

echo "== [chain $(date +%T)] bench on HEAD =="
# REPS=1 (documented, same rationale as rebench_r17.sh's sf100 step):
# under honest full materialization one em1 rep is ~9 min and em2 ~5 min
# at this point's 1.8e10 within-label pairs — median-of-3 would triple
# numbers whose run-to-run variance the records already bound at
# ±15-20%. Every other query's single-rep noise is well inside that.
rm -f scratch/bench_sf30_head.json
SPARK_GRAFT_SF_DIR=scratch/sf30 SPARK_GRAFT_BASELINE=BASELINE_sf30.json \
SPARK_GRAFT_CPUS=32 SPARK_DRIVER_MEM=32g SPARK_GRAFT_REPS=1 \
SPARK_GRAFT_BENCH_OUT=scratch/bench_sf30_head.json \
  sbt -batch "runMain graft.Bench" > scratch/bench_sf30_r17.log 2>&1
test -s scratch/bench_sf30_head.json \
  && cp scratch/bench_sf30_head.json BENCH_sf30.json \
  && echo "== [chain $(date +%T)] bench recorded ==" \
  || echo "== [chain $(date +%T)] BENCH EMPTY =="
echo "== [chain $(date +%T)] done =="
