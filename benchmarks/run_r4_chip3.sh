#!/bin/bash
# Round-4 final-session chip runner: the two evidence jobs still
# pending from the stage-1/2 runners that never executed (session
# handoff cleared the queued processes). Strictly sequential — one
# chip; never timeout-kill a TPU-attached process.
# Usage: nohup bash benchmarks/run_r4_chip3.sh > /tmp/r4_chip3.log 2>&1 &
set -u
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site

echo "=== [$(date +%T)] multi-ACCDOA distillation + threshold-calibration study ==="
python benchmarks/multi_accdoa_distill.py
echo "=== [$(date +%T)] multi_accdoa_distill rc=$? ==="

echo "=== [$(date +%T)] serve latency @120s clips (24+ fragments/stream) ==="
SERVE_LAT_SECONDS=120 python benchmarks/serve_latency.py
echo "=== [$(date +%T)] serve_latency rc=$? ==="

echo "=== [$(date +%T)] all chip jobs done ==="
