#!/bin/bash
# Round-18 measurement chain: re-record every committed scale point on
# the HEAD binary (em3 probe-3 + hot-cell split, t2 predicate fix) under
# honest full-materialization, landing the sf100 honest record (VERDICT
# r17 #1) and the sf3 refresh (#3). Serial — each point wants the box to
# itself. Each record is committed the moment it exists (scratch does
# not survive between sessions).
#
# Order: sf1 (quick smoke of the honest pipeline) -> sf100 (the
# highest-leverage record; fails earliest if disk misbehaves) -> sf10 ->
# sf30 -> sf3 (fresh full baseline on the 92-query oracle surface, then
# the bench) -> em3-slice oracle checks at sf30/sf100.
set -uo pipefail
cd /root/repo

commit_rec () { # files... msg
  local msg="${@: -1}"
  local n=$(($# - 1))
  local files=("${@:1:$n}")
  git add -f "${files[@]}" && git commit -q -m "$msg" -- "${files[@]}" \
    && echo "== [chain] committed: $msg ==" || echo "== [chain] nothing to commit for: $msg =="
}

bench_point () { # sfdir baseline out log reps extra...
  local sfdir="$1" baseline="$2" out="$3" log="$4" reps="$5"; shift 5
  echo "== [chain $(date +%T)] bench $sfdir (reps=$reps) =="
  rm -f "$out"
  env SPARK_GRAFT_SF_DIR="$sfdir" SPARK_GRAFT_BASELINE="$baseline" \
      SPARK_GRAFT_CPUS=32 SPARK_DRIVER_MEM=48g SPARK_GRAFT_REPS="$reps" \
      SPARK_GRAFT_BENCH_OUT="$out" "$@" \
      sbt -batch "runMain graft.Bench" > "$log" 2>&1
  local rc=$?
  echo "== [chain $(date +%T)] bench $sfdir exit $rc =="
  [ $rc -eq 0 ] && [ -s "$out" ]
}

# ---- sf1 (median of 3) ----
if bench_point scratch/sf1 BASELINE_sf1.json scratch/bench_sf1_r18.json \
    scratch/bench_sf1_r18.log 3; then
  cp scratch/bench_sf1_r18.json BENCH_sf1.json
  commit_rec BENCH_sf1.json "Re-record honest sf1 bench on the round-18 binary"
else
  echo "== [chain] sf1 FAILED — aborting chain ==" >&2; exit 1
fi

# ---- sf100 (reps=1, documented skip set, 60s cleaner GC) ----
if bash scripts/rebench_sf100_r18.sh; then
  commit_rec BENCH_sf100.json \
    "Land the honest sf100 bench record (Bench.runFull, documented skips)"
else
  echo "== [chain] sf100 FAILED — continuing with the other points ==" >&2
fi

# ---- sf10 (median of 3) ----
if bench_point scratch/sf10 BASELINE_sf10.json scratch/bench_sf10_r18.json \
    scratch/bench_sf10_r18.log 3; then
  cp scratch/bench_sf10_r18.json BENCH_sf10.json
  commit_rec BENCH_sf10.json "Re-record honest sf10 bench on the round-18 binary"
fi

# ---- sf30 (reps=1, documented) ----
if bench_point scratch/sf30 BASELINE_sf30.json scratch/bench_sf30_r18.json \
    scratch/bench_sf30_r18.log 1 \
    JAVA_TOOL_OPTIONS=-Dspark.cleaner.periodicGC.interval=60s; then
  cp scratch/bench_sf30_r18.json BENCH_sf30.json
  commit_rec BENCH_sf30.json "Re-record honest sf30 bench on the round-18 binary"
fi

# ---- sf3: fresh oracle dump + FULL baseline re-record, then bench ----
# The committed BASELINE_sf3 was r13-era (76-query surface); this round
# regenerated the corpus (scripts/datagen.py mult=30) and re-records the
# whole 92-query baseline on the current oracle SQL. SINGLE_RUN_SEC=60:
# a query whose warmup run exceeds 60 s records that run (sf30chain's
# documented rule — variance on minute-long scans is small).
echo "== [chain $(date +%T)] sf3 oracle dump + baseline =="
if [ ! -s scratch/basel_sf3_r18/oracle_sql.json ]; then
  rm -rf scratch/basel_sf3_r18
  sbt -batch "runMain graft.Verify scratch/sf3 scratch/basel_sf3_r18 w6_first_int_key" \
    > scratch/basel_sf3_r18.log 2>&1 \
    && rm -rf scratch/basel_sf3_r18/w6_first_int_key
fi
if [ -s scratch/basel_sf3_r18/oracle_sql.json ]; then
  SPARK_GRAFT_SINGLE_RUN_SEC=60 SPARK_GRAFT_DUCK_TMP_CAP=30GB \
    python3 scripts/baseline.py scratch/sf3 scratch/basel_sf3_r18 \
    scratch/BASELINE_sf3_r18.json >> scratch/basel_sf3_r18.log 2>&1
  if [ -s scratch/BASELINE_sf3_r18.json ]; then
    python3 - <<'EOF'
import json
d = json.load(open('scratch/BASELINE_sf3_r18.json'))
d['note'] = (d.get('note', '') +
             ' [full 92-query re-record, round 18; corpus scripts/datagen.py mult=30]')
json.dump(d, open('BASELINE_sf3.json', 'w'), indent=1, sort_keys=True)
EOF
    commit_rec BASELINE_sf3.json \
      "Re-record the sf3 DuckDB baseline on the full 92-query surface"
  fi
fi
if bench_point scratch/sf3 BASELINE_sf3.json scratch/bench_sf3_r18.json \
    scratch/bench_sf3_r18.log 3; then
  cp scratch/bench_sf3_r18.json BENCH_sf3.json
  commit_rec BENCH_sf3.json \
    "Re-record sf3 honestly (Bench.runFull) on the 92-query surface"
fi

# ---- em3 slice oracle checks at the big points (changed query) ----
for P in sf30 sf100; do
  echo "== [chain $(date +%T)] em3 slice oracle check at $P =="
  rm -rf "scratch/verify_em3slice_${P}_r18"
  sbt -batch "runMain graft.Verify scratch/$P scratch/verify_em3slice_${P}_r18 em3_slice_ivf_closest_pair" \
    > "scratch/verify_em3slice_${P}_r18.log" 2>&1 \
  && SPARK_GRAFT_DUCK_TMP_CAP=30GB python3 scripts/check.py "scratch/$P" \
    "scratch/verify_em3slice_${P}_r18" em3_slice_ivf_closest_pair \
    > "scratch/check_em3slice_${P}_r18.log" 2>&1
  tail -2 "scratch/check_em3slice_${P}_r18.log"
done

echo "== [chain $(date +%T)] ALL DONE =="
