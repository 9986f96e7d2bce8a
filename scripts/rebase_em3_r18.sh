#!/bin/bash
# Round-18: re-record the DuckDB baseline lines whose oracle SQL changed
# this round (em3 full + slice moved to probe-3 + hot-cell split), and
# ADD the em3 slice line at the points where it was never recorded
# (sf30/sf100 predate em3's slice twin in their baseline files). Every
# other line's SQL is unchanged and its committed timing stays.
#
# Per point: dump a fresh oracle_sql.json (Verify with one cheap query),
# run baseline.py with everything else skip-listed into a temp file,
# then merge ONLY the target queries into the committed BASELINE_*.json.
set -euo pipefail
cd /root/repo

refresh () { # sfDir baselineJson targets...
  local sfdir="$1" base="$2"; shift 2
  local tag; tag=$(basename "$base" .json)
  local dump="scratch/basel_${tag}_r18"
  echo "== [rebase $(date +%T)] $sfdir -> $base ($*) =="
  if [ ! -s "$dump/oracle_sql.json" ]; then
    rm -rf "$dump"
    sbt -batch "runMain graft.Verify $sfdir $dump w6_first_int_key" \
      > "scratch/basel_${tag}_r18.log" 2>&1
    test -s "$dump/oracle_sql.json" || {
      echo "oracle_sql.json dump failed for $sfdir" >&2; exit 1; }
    rm -rf "$dump/w6_first_int_key"
  fi
  SKIP=$(python3 - "$dump" "$@" <<'EOF'
import json, sys
d, targets = sys.argv[1], set(sys.argv[2:])
q = sorted(json.load(open(f"{d}/oracle_sql.json")))
print(','.join(x for x in q if x not in targets))
EOF
)
  SPARK_GRAFT_SKIP_ORACLES="$SKIP" SPARK_GRAFT_DUCK_TMP_CAP=30GB \
    python3 scripts/baseline.py "$sfdir" "$dump" "scratch/basel_${tag}_r18.json"
  python3 - "$base" "scratch/basel_${tag}_r18.json" "$@" <<'EOF'
import json, sys
base_path, new_path, targets = sys.argv[1], sys.argv[2], sys.argv[3:]
base = json.load(open(base_path))
new = json.load(open(new_path))
for t in targets:
    v = new["queries"].get(t)
    assert v is not None and v > 0, f"{t} missing from re-record"
    old = base["queries"].get(t)
    base["queries"][t] = v
    print(f"  {t}: {old} -> {v}")
base["note"] = base.get("note", "") + \
    " [em3 lines re-recorded r18: probe-3 + hot-cell split oracle]"
json.dump(base, open(base_path, "w"), indent=1, sort_keys=True)
EOF
}

refresh /root/testdata/sf0.1 BASELINE_local.json \
  em3_ivf_closest_pair em3_slice_ivf_closest_pair
refresh scratch/sf1 BASELINE_sf1.json \
  em3_ivf_closest_pair em3_slice_ivf_closest_pair
refresh scratch/sf10 BASELINE_sf10.json em3_slice_ivf_closest_pair
refresh scratch/sf30 BASELINE_sf30.json em3_slice_ivf_closest_pair
refresh scratch/sf100 BASELINE_sf100.json em3_slice_ivf_closest_pair
echo "== [rebase $(date +%T)] done =="
