#!/bin/bash
# Round-18 third pass: sf1 + sf30 on the post-t9-fix binary, so every
# committed scale record in the trend chain measures ONE binary.
set -uo pipefail
cd /root/repo
commit_rec () {
  local msg="${@: -1}"; local n=$(($# - 1)); local files=("${@:1:$n}")
  git add -f "${files[@]}" && git commit -q -m "$msg" -- "${files[@]}" || true
}
bench_point () {
  local sfdir="$1" baseline="$2" out="$3" log="$4" reps="$5"; shift 5
  echo "== [chain3 $(date +%T)] bench $sfdir (reps=$reps) =="
  rm -f "$out"
  env SPARK_GRAFT_SF_DIR="$sfdir" SPARK_GRAFT_BASELINE="$baseline" \
      SPARK_GRAFT_CPUS=32 SPARK_DRIVER_MEM=48g SPARK_GRAFT_REPS="$reps" \
      SPARK_GRAFT_BENCH_OUT="$out" "$@" \
      sbt -batch "runMain graft.Bench" > "$log" 2>&1
  local rc=$?
  echo "== [chain3 $(date +%T)] bench $sfdir exit $rc =="
  [ $rc -eq 0 ] && [ -s "$out" ]
}
if bench_point scratch/sf1 BASELINE_sf1.json scratch/bench_sf1_r18b.json \
    scratch/bench_sf1_r18b.log 3; then
  cp scratch/bench_sf1_r18b.json BENCH_sf1.json
  commit_rec BENCH_sf1.json "Re-record honest sf1 after the t9 bpe_stats fix"
fi
if bench_point scratch/sf30 BASELINE_sf30.json scratch/bench_sf30_r18b.json \
    scratch/bench_sf30_r18b.log 1 \
    JAVA_TOOL_OPTIONS=-Dspark.cleaner.periodicGC.interval=60s; then
  cp scratch/bench_sf30_r18b.json BENCH_sf30.json
  commit_rec BENCH_sf30.json "Re-record honest sf30 after the t9 bpe_stats fix"
fi
echo "== [chain3 $(date +%T)] ALL DONE =="
