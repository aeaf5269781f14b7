#!/bin/bash
# Sequential perf-probe sweep on the real TPU chip with tunnel-flap retries.
# Usage: bash tools_dev/probe_sweep.sh "remat=dots_no_logits attn=xla batch=1" "remat=1 attn=xla batch=2" ...
# One TPU process at a time; each config gets up to $ATTEMPTS tries with a
# hard timeout (the tunnel can wedge silently — kill and retry).
set -u
ATTEMPTS=${ATTEMPTS:-4}
TIMEOUT=${TIMEOUT:-2700}
LOG=${LOG:-/tmp/probe_sweep.log}
cd /root/repo
for cfg in "$@"; do
  ok=0
  for i in $(seq 1 "$ATTEMPTS"); do
    echo "=== probe [$cfg] attempt $i/$ATTEMPTS $(date +%H:%M:%S) ===" | tee -a "$LOG"
    # shellcheck disable=SC2086
    timeout -k 30 "$TIMEOUT" python tools_dev/perf_probe.py $cfg >> "$LOG" 2>&1
    rc=$?
    if [ $rc -eq 0 ]; then ok=1; break; fi
    # HBM OOMs are deterministic — retrying only burns chip time
    if tail -c 4000 "$LOG" | grep -q "Ran out of memory"; then
      echo "=== probe [$cfg] OOM (deterministic) — not retrying ===" | tee -a "$LOG"
      break
    fi
    echo "=== probe [$cfg] attempt $i failed rc=$rc; sleeping 90s ===" | tee -a "$LOG"
    sleep 90
  done
  if [ $ok -eq 0 ]; then echo "=== probe [$cfg] GAVE UP ===" | tee -a "$LOG"; fi
done
echo "=== sweep done $(date +%H:%M:%S) ===" | tee -a "$LOG"
