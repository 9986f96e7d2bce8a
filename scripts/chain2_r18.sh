#!/bin/bash
# Round-18 second pass: re-record the points whose worst line (t9) was
# fixed after the first chain — sf100 (flagship), sf3 and sf10 (cheap).
# sf30's record keeps its stale t9 line (25 min re-run did not fit the
# round) — documented in the README. Same guards as chain_r18.sh.
set -uo pipefail
cd /root/repo

commit_rec () {
  local msg="${@: -1}"; local n=$(($# - 1)); local files=("${@:1:$n}")
  git add -f "${files[@]}" && git commit -q -m "$msg" -- "${files[@]}" \
    && echo "== [chain2] committed: $msg ==" || true
}
bench_point () {
  local sfdir="$1" baseline="$2" out="$3" log="$4" reps="$5"; shift 5
  echo "== [chain2 $(date +%T)] bench $sfdir (reps=$reps) =="
  rm -f "$out"
  env SPARK_GRAFT_SF_DIR="$sfdir" SPARK_GRAFT_BASELINE="$baseline" \
      SPARK_GRAFT_CPUS=32 SPARK_DRIVER_MEM=48g SPARK_GRAFT_REPS="$reps" \
      SPARK_GRAFT_BENCH_OUT="$out" "$@" \
      sbt -batch "runMain graft.Bench" > "$log" 2>&1
  local rc=$?
  echo "== [chain2 $(date +%T)] bench $sfdir exit $rc =="
  [ $rc -eq 0 ] && [ -s "$out" ]
}

if bash scripts/rebench_sf100_r18.sh; then
  commit_rec BENCH_sf100.json \
    "Re-record honest sf100 after the t9 bpe_stats fix"
fi
if bench_point scratch/sf3 BASELINE_sf3.json scratch/bench_sf3_r18b.json \
    scratch/bench_sf3_r18b.log 3; then
  cp scratch/bench_sf3_r18b.json BENCH_sf3.json
  commit_rec BENCH_sf3.json "Re-record honest sf3 after the t9 bpe_stats fix"
fi
if bench_point scratch/sf10 BASELINE_sf10.json scratch/bench_sf10_r18b.json \
    scratch/bench_sf10_r18b.log 3; then
  cp scratch/bench_sf10_r18b.json BENCH_sf10.json
  commit_rec BENCH_sf10.json "Re-record honest sf10 after the t9 bpe_stats fix"
fi
echo "== [chain2 $(date +%T)] ALL DONE =="
