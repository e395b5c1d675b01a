#!/bin/bash
# Round-4 chip runner, stage 2: waits for the stage-1 runner (capstone +
# multi-ACCDOA study) to finish, then runs the longer-sample serve
# latency study and a final bench confirmation. One chip — strictly
# sequential; never timeout-kill a TPU-attached process.
# Usage: nohup bash benchmarks/run_r4_chip2.sh <stage1_pid> > /tmp/r4_chip2.log 2>&1 &
set -u
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site

STAGE1_PID="${1:?stage-1 runner pid required}"
while kill -0 "$STAGE1_PID" 2>/dev/null; do sleep 30; done
echo "=== [$(date +%T)] stage-1 runner done; starting stage 2 ==="

echo "=== [$(date +%T)] serve latency @120s clips (24+ fragments/stream) ==="
SERVE_LAT_SECONDS=120 python benchmarks/serve_latency.py
echo "=== [$(date +%T)] serve_latency rc=$? ==="

echo "=== [$(date +%T)] bench confirmation ==="
python bench.py
echo "=== [$(date +%T)] bench rc=$? ==="

echo "=== [$(date +%T)] stage-2 done ==="
