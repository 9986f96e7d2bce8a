#!/bin/bash
# Round-20: measure the manifest side-channel source (verdict r19
# next-round #6) — the file-source record is listing-bound (2,054
# files/s at 50k triggers vs the 11.6k rows/s MemoryStream operator
# ceiling); this feeds the SAME stateful pipeline from a file-of-paths
# stream (corpus listed ONCE, the object-store notification/inventory
# ingest shape) at both trigger sizes and records whether the bound
# moves. Output: manifest_source entries merged into STREAM_BATCH.json.
set -uo pipefail
cd /root/repo
mkdir -p scratch

for b in 50000 5000; do
  echo "== [stream-manifest r20 $(date +%T)] manifest @$b =="
  env SPARK_GRAFT_STREAM_SOURCE=manifest \
      SPARK_GRAFT_STREAM_FILES=100000 SPARK_GRAFT_STREAM_BATCH=$b \
      SPARK_GRAFT_CPUS=32 SPARK_DRIVER_MEM=16g \
      sbt -batch "runMain graft.StreamBench" \
      > "scratch/streammanifest_$b.log" 2>&1 || {
        echo "manifest run @$b failed" >&2; exit 1; }
  cp scratch/streambench_manifest.json "scratch/streambench_manifest_$b.json"
done

python3 - <<'EOF'
import json
out = json.load(open("STREAM_BATCH.json"))
out["manifest_source"] = json.load(
    open("scratch/streambench_manifest_50000.json"))
out["manifest_source_small_trigger"] = json.load(
    open("scratch/streambench_manifest_5000.json"))
out["note_r20"] = (
    "manifest_source streams a file-of-paths built from ONE directory "
    "listing (the object-store notification/inventory ingest shape) "
    "through the identical dedup+group pipeline; manifest_build_sec is "
    "the one-off side-channel cost a notification feed pays "
    "incrementally. Compare files_per_sec with file_source (per-trigger "
    "re-listing) and rows_per_sec of memory_source (operator ceiling).")
with open("STREAM_BATCH.json", "w") as f:
    json.dump(out, f, indent=1)
print(json.dumps(out, indent=1))
EOF
echo "== [stream-manifest r20] STREAM_BATCH.json updated =="
