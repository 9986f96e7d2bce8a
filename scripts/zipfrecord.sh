#!/bin/bash
# Round-17 skewed-label (Zipf) worst-case record for the em-family
# (dev tooling): the committed invocation behind README's "Worst-case
# corpus (skewed-label)" section, the same adversarial-corpus move that
# forced round 16's adaptive dedup router.
#
# Corpus: scripts/datagen_zipf.py — embeddings replicated 300x like
# datagen.py but labels REASSIGNED Zipf(s=1) over 10 labels, so label 0
# owns ~34% of 600k vectors (~3.4x hotter than the uniform corpus'
# largest block). Other tables symlink the sf0.1 source; only the
# em/sim queries read embeddings, so only they are exercised here.
#
# Evidence produced:
#  1. BenchOne em1/em2/em3 + slice twins at SPARK_GRAFT_TASK_STATS=1,
#     reps=1 (em1's honest exact-witness cost is ~0.9 us/pair of core
#     time — minutes per rep at 2.6e10 pairs; variance bounds are
#     carried by the uniform-sf30 record) — per-stage max/median task
#     ratios prove the blockedPairs grain bound holds under skew
#     (judged bar: no heavy-stage straggler >2x the stage median).
#  2. scalepass over the em slice-twin oracles on the SAME corpus —
#     hash-matched rows prove the skewed path is not just fast but
#     right. (Full em oracles are the documented quadratic DuckDB
#     limit at 300x, as on every >= sf30 point.)
set -uo pipefail
cd /root/repo

if [ ! -d scratch/zipf30 ]; then
  echo "== [zipf $(date +%T)] scratch/zipf30 missing — run datagen_zipf.py first =="
  exit 1
fi

echo "== [zipf $(date +%T)] BenchOne em family + task stats =="
SPARK_GRAFT_SF_DIR=scratch/zipf30 SPARK_GRAFT_REPS=1 \
SPARK_GRAFT_TASK_STATS=1 SPARK_GRAFT_CPUS=32 SPARK_DRIVER_MEM=32g \
  sbt -batch "runMain graft.BenchOne em1_blocked_closest_pair em2_cosine_near_dup em3_ivf_closest_pair em1_slice_closest_pair em2_slice_cosine_near_dup em3_slice_ivf_closest_pair" \
  > scratch/benchone_zipf30.log 2>&1
echo "== [zipf $(date +%T)] benchone exit $? =="
grep -E "\[bench-one\]|WORST" scratch/benchone_zipf30.log || true

# oracle check: every slice twin that reads embeddings (em family);
# skip everything else — the non-embedding tables are sf0.1 symlinks,
# already fully oracled at their own scale point. The skip list is
# derived from the oracle map, produced the same way scalepass does.
mkdir -p scratch/verify_zipf30_r17
if [ ! -s scratch/verify_zipf30_r17/oracle_sql.json ]; then
  sbt -batch "runMain graft.Verify scratch/zipf30 scratch/verify_zipf30_r17 w6_first_int_key" \
    > scratch/verify_zipf30_oracle.log 2>&1
  rc=$?
  rm -rf scratch/verify_zipf30_r17/w6_first_int_key
  # A failed Verify leaves oracle_sql.json missing/empty; under set -u
  # that would make SKIP empty and the scalepass below would run the
  # FULL quadratic em oracles on the 300x corpus. Bail out instead.
  if [ $rc -ne 0 ] || [ ! -s scratch/verify_zipf30_r17/oracle_sql.json ]; then
    echo "== [zipf] Verify failed (exit $rc) or oracle_sql.json empty — aborting before scalepass ==" >&2
    exit 1
  fi
fi
SKIP=$(python3 - <<'EOF'
import json
q = sorted(json.load(open('scratch/verify_zipf30_r17/oracle_sql.json')))
keep = {'em1_slice_closest_pair', 'em2_slice_cosine_near_dup',
        'em3_slice_ivf_closest_pair'}
print(','.join(x for x in q if x not in keep))
EOF
)
echo "== [zipf $(date +%T)] slice-twin oracle sweep =="
SPARK_GRAFT_SKIP_ORACLES="$SKIP" \
SPARK_GRAFT_DUCK_TMP_CAP=30GB SPARK_DRIVER_MEM=32g \
  bash scripts/scalepass.sh scratch/zipf30 scratch/verify_zipf30_r17 4 \
  >> scratch/scalepass_zipf30.log 2>&1
rc=$?
echo "== [zipf $(date +%T)] oracle sweep exit $rc =="
grep -E "^(PASS|FAIL)" scratch/verify_zipf30_r17/scalepass_results.txt || true
exit $rc
