#!/bin/bash
# Round-15 sf100 evidence chain (dev tooling): finish the oracle sweep,
# record the DuckDB baseline, re-record the Spark bench on HEAD.
# Each stage is independently resumable; the chain just sequences them.
set -uo pipefail
cd /root/repo

# Oracle-side skips (documented single-node oracle scale limits, each
# covered by a slice twin at this scale + full rows at sf1/sf3):
# the 8 from sf30's list + sim3 (ENOSPC'd DuckDB temp disk at sf100 —
# covered by the new sim3_slice_ivf_topk) + em3 (same Lloyd-unrolled
# oracle shape as sim3; covered by em3_slice_ivf_closest_pair).
SKIP_O="em1_blocked_closest_pair,em2_cosine_near_dup,em3_ivf_closest_pair,s3_binary_meta,t6_near_dup_candidates,t7_simhash,t8_jaccard_verify,t10_winnow_fp,t11_simhash_near_dup,sim3_ivf_topk,w10_gap_sessions_faithful,x17_hdr_merge,x7_euler_rotation,x8_rodrigues,x14_se3_inverse"
# Spark-side skip: w10 is the deliberately-faithful single-window form
# (one task sorts the whole events table); w2 is its scale stand-in.
SKIP_Q="w10_gap_sessions_faithful,x17_hdr_merge,x7_euler_rotation,x8_rodrigues,x14_se3_inverse"

# refresh the oracle map: the persisted one predates the 5 new queries
rm -f scratch/verify_sf100/oracle_sql.json

# two passes: a transient failure (e.g. an ENOSPC while disk was tight)
# leaves its queries unPASSed; the second pass retries exactly those.
for i in 1 2; do
  echo "== [chain $(date +%T)] scalepass pass $i =="
  SPARK_GRAFT_SKIP_ORACLES="$SKIP_O" SPARK_GRAFT_SKIP_QUERIES="$SKIP_Q" \
  SPARK_GRAFT_DUCK_TMP_CAP=25GB SPARK_DRIVER_MEM=32g \
    bash scripts/scalepass.sh scratch/sf100 scratch/verify_sf100 1 \
    >> scratch/scalepass_sf100.log 2>&1
  rc=$?
  echo "== [chain $(date +%T)] scalepass pass $i exit $rc =="
  [ "$rc" = "0" ] && break
done

echo "== [chain $(date +%T)] baseline =="
BSKIP="em1_blocked_closest_pair,em2_cosine_near_dup,em3_ivf_closest_pair,s3_binary_meta,t6_near_dup_candidates,t7_simhash,t8_jaccard_verify,t10_winnow_fp,t11_simhash_near_dup,sim3_ivf_topk,x17_hdr_merge,x7_euler_rotation,x8_rodrigues,x14_se3_inverse"
SPARK_GRAFT_SKIP_ORACLES="$BSKIP" SPARK_GRAFT_SINGLE_RUN_SEC=60 \
SPARK_GRAFT_DUCK_TMP_CAP=30GB \
  python3 scripts/baseline.py scratch/sf100 scratch/verify_sf100 \
  BASELINE_sf100.json >> scratch/baseline_sf100.log 2>&1
echo "== [chain $(date +%T)] baseline exit $? =="

echo "== [chain $(date +%T)] bench on HEAD =="
# a crashed rerun must not silently record a PREVIOUS run's out file
rm -f scratch/bench_sf100_head.json
SPARK_GRAFT_SF_DIR=scratch/sf100 SPARK_GRAFT_BASELINE=BASELINE_sf100.json \
SPARK_GRAFT_CPUS=32 SPARK_DRIVER_MEM=48g SPARK_GRAFT_SKIP_QUERIES="w10_gap_sessions_faithful" \
SPARK_GRAFT_BENCH_OUT=scratch/bench_sf100_head.json \
  sbt -batch "runMain graft.Bench" > scratch/bench_sf100_r15.log 2>&1
# take the bench JSON from the SPARK_GRAFT_BENCH_OUT file Bench itself
# writes, NOT a grep of the sbt log tail — the log tail truncates long
# per-query maps (the exact BENCH_r13/r14 "parsed: null" failure the
# file write was added to fix)
test -s scratch/bench_sf100_head.json \
  && cp scratch/bench_sf100_head.json BENCH_sf100.json \
  && echo "== [chain $(date +%T)] bench recorded ==" \
  || echo "== [chain $(date +%T)] BENCH EMPTY =="
echo "== [chain $(date +%T)] done =="
