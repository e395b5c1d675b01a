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

# The PID alone is not a safe gate: a stale/typo'd PID would start
# stage 2 while a stage-1 python still holds the chip (duplicate-run
# contention), and a recycled PID would wait forever. Gate on the PID
# OR any live process still running a stage-1 script (read-only /proc
# scan — never pattern-KILL on a shared host).
stage1_active() {
  kill -0 "$STAGE1_PID" 2>/dev/null && return 0
  local p
  for p in /proc/[0-9]*/cmdline; do
    if tr '\0' ' ' <"$p" 2>/dev/null \
        | grep -qE 'flagship_synth_accuracy\.py|multi_accdoa_distill\.py|run_r4_chip\.sh'; then
      return 0
    fi
  done
  return 1
}

while stage1_active; do sleep 30; done
echo "=== [$(date +%T)] stage-1 runner done; starting stage 2 ==="

echo "=== [$(date +%T)] serve latency @120s clips (24+ fragments/stream) ==="
SERVE_LAT_SECONDS=120 python benchmarks/serve_latency.py
echo "=== [$(date +%T)] serve_latency rc=$? ==="

echo "=== [$(date +%T)] bench confirmation ==="
python bench.py
echo "=== [$(date +%T)] bench rc=$? ==="

echo "=== [$(date +%T)] stage-2 done ==="
