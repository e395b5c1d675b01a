#!/bin/bash
# Round-4 chip evidence runner: sequential TPU jobs (one chip — never
# run two chip jobs at once; never timeout-kill a TPU-attached process).
# Usage: nohup bash benchmarks/run_r4_chip.sh > /tmp/r4_chip.log 2>&1 &
set -u
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site

echo "=== [$(date +%T)] flagship capstone (30 epochs, full decode stages incl. median) ==="
python benchmarks/flagship_synth_accuracy.py
echo "=== [$(date +%T)] flagship capstone rc=$? ==="

echo "=== [$(date +%T)] multi-ACCDOA distillation study ==="
python benchmarks/multi_accdoa_distill.py
echo "=== [$(date +%T)] multi_accdoa_distill rc=$? ==="

echo "=== [$(date +%T)] all chip jobs done ==="
