#!/bin/bash
# Round-17 re-bench of the committed scale points under the HONEST
# measurement (Bench.runFull — full materialization; see Bench.scala):
# every record from rounds <= 16 timed df.count(), which let Catalyst
# delete pure projections and em2's whole join pipeline, so the
# committed sf1/sf10/sf100 numbers under-measure. Baselines are NOT
# re-recorded (the DuckDB side always materialized fully).
#
# sf100 runs at SPARK_GRAFT_REPS=1 (documented), and SKIPS em1/em2:
# their now-honest pair compute is ~0.93 us/pair of core time (measured
# 58.3 s / 33.3 s at sf10's 2e9 within-label pairs), and sf100's 2e11
# pairs put one em1 rep at ~1.6 h — the exact witness is deliberately
# not a 1000x operator (em3, its declared scale route, runs and is
# recorded there). em1/em2 stay fully measured at sf30 on BOTH the
# uniform and the skewed (zipf30) corpora. w10 keeps its standing
# single-window skip. sf1/sf10 keep the standard median-of-3 with the
# full surface, em1/em2 included.
#
# sf100 also SKIPS x7/x8/x14 (found by honest run 1/2 of this script):
# each ends in the global ORDER BY the oracle hash-compare needs for
# deterministic row order, and at 600M rows x 13-16 columns that tail
# is a ~50-78 GB range exchange + an equal sort spill — x14 ENOSPC'd
# the box twice (x7/x8 squeaked through on compression margin). The
# sort is an oracle-LAYOUT artifact, not operator semantics: the
# geometry itself is a linear projection, the slice twins (12M rows,
# same pipeline incl. the sort) run and hash-match at sf100, and the
# full forms are green through sf30 (82/82). On a multi-node cluster
# the same sort is a routine exchange; on this box it is 2x free disk.
set -uo pipefail
cd /root/repo

run_point () { # sfdir baseline out log extra_env...
  local sfdir="$1" baseline="$2" out="$3" log="$4"; shift 4
  echo "== [rebench $(date +%T)] $sfdir =="
  rm -f "$out"
  env SPARK_GRAFT_SF_DIR="$sfdir" SPARK_GRAFT_BASELINE="$baseline" \
      SPARK_GRAFT_CPUS=32 SPARK_DRIVER_MEM=48g \
      SPARK_GRAFT_BENCH_OUT="$out" "$@" \
      sbt -batch "runMain graft.Bench" > "$log" 2>&1
  echo "== [rebench $(date +%T)] $sfdir exit $? =="
}

run_point scratch/sf1   BASELINE_sf1.json   scratch/bench_sf1_r17.json   scratch/bench_sf1_r17.log
test -s scratch/bench_sf1_r17.json && cp scratch/bench_sf1_r17.json BENCH_sf1.json

run_point scratch/sf10  BASELINE_sf10.json  scratch/bench_sf10_r17.json  scratch/bench_sf10_r17.log
test -s scratch/bench_sf10_r17.json && cp scratch/bench_sf10_r17.json BENCH_sf10.json

run_point scratch/sf100 BASELINE_sf100.json scratch/bench_sf100_r17.json scratch/bench_sf100_r17.log \
  SPARK_GRAFT_REPS=1 \
  SPARK_GRAFT_SKIP_QUERIES=w10_gap_sessions_faithful,em1_blocked_closest_pair,em2_cosine_near_dup,x7_euler_rotation,x8_rodrigues,x14_se3_inverse \
  JAVA_TOOL_OPTIONS=-Dspark.cleaner.periodicGC.interval=60s
test -s scratch/bench_sf100_r17.json && cp scratch/bench_sf100_r17.json BENCH_sf100.json

echo "== [rebench $(date +%T)] done =="
