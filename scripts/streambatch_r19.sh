#!/bin/bash
# Round-19: put a number on the trigger-amortization claim (verdict #4).
# README asserts "the same pipeline at 50k-row triggers amortizes the
# ~2.7 s/batch state-store cost proportionally" — this measures the
# MemoryStream twin AND the file source at SPARK_GRAFT_STREAM_BATCH=50000
# (same 100k rows, 2 chunks instead of 20) and records the third
# throughput line. Output: STREAM_BATCH.json.
set -uo pipefail
cd /root/repo
mkdir -p scratch

echo "== [streambatch r19 $(date +%T)] memory @50k =="
env SPARK_GRAFT_STREAM_SOURCE=memory \
    SPARK_GRAFT_STREAM_FILES=100000 SPARK_GRAFT_STREAM_BATCH=50000 \
    SPARK_GRAFT_CPUS=32 SPARK_DRIVER_MEM=16g \
    sbt -batch "runMain graft.StreamBench" \
    > scratch/streambatch_mem50k.log 2>&1 || { echo mem-run failed >&2; exit 1; }
cp scratch/streambench_mem.json scratch/streambench_mem50k.json

echo "== [streambatch r19 $(date +%T)] files @50k =="
env SPARK_GRAFT_STREAM_FILES=100000 SPARK_GRAFT_STREAM_BATCH=50000 \
    SPARK_GRAFT_CPUS=32 SPARK_DRIVER_MEM=16g \
    sbt -batch "runMain graft.StreamBench" \
    > scratch/streambatch_file50k.log 2>&1 || { echo file-run failed >&2; exit 1; }
cp scratch/streambench.json scratch/streambench_file50k.json

python3 - <<'EOF'
import json
mem = json.load(open("scratch/streambench_mem50k.json"))
fil = json.load(open("scratch/streambench_file50k.json"))
out = {"metric": "stream_batch_sweep", "batch_rows": 50000,
       "memory_source": mem, "file_source": fil}
with open("STREAM_BATCH.json", "w") as f:
    json.dump(out, f, indent=1)
print(json.dumps(out, indent=1))
EOF
echo "== [streambatch r19] STREAM_BATCH.json written =="
