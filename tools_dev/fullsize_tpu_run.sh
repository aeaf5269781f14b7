#!/bin/bash
# Drive the REAL full-size SDXL trainer on the TPU chip (VERDICT r2 #1):
# the actual CLI — caching pass, prefetcher, reporter, low-memory plan
# (bf16 master + fused GA + int8 moments), checkpoint save — at full-UNet
# 1024px v-pred, with optimizer state resident.
#
#   bash tools_dev/fullsize_tpu_run.sh [env-root]
#
# Generates the env on first use (tools_dev/make_fullsize_env_sdxl.py).
# Logs to <env-root>/run.log; prints the trainer-level timing summary.
set -euo pipefail
ROOT=${1:-/root/fullsize_env}
REPO="$(cd "$(dirname "$0")/.." && pwd)"
# APPEND to PYTHONPATH — overwriting it clobbers the container's
# sitecustomize dir (/root/.axon_site) and the TPU plugin never registers
# ("Backend 'axon' is not in the list of known backends")
export PYTHONPATH="$REPO${PYTHONPATH:+:$PYTHONPATH}"
export JAX_COMPILATION_CACHE_DIR=/tmp/jax_cache

[ -f "$ROOT/preset.json" ] || python "$REPO/tools_dev/make_fullsize_env_sdxl.py" "$ROOT"

cd "$ROOT"
# The axon tunnel flaps (CLAUDE.md): "Backend 'axon' is not in the list of
# known backends" recovers on its own — retry like bench.py does.  NOTE: a
# separate preflight probe is a trap: the probe process's own session
# teardown can make the immediately-following trainer attempt see the chip
# as busy, so the trainer itself is the probe.
STALL_SECS=${STALL_SECS:-1500}
for attempt in $(seq 1 40); do
  echo "=== full-size TPU training run (attempt $attempt, $(date)) ==="
  set +e
  python -m aozora_sdxl_training_tpu.cli.train_sdxl --config preset.json \
      > run.log 2>&1 &
  PY=$!
  # Stall watchdog: the tunnel can WEDGE (process sleeps forever on a
  # device op, CLAUDE.md) — if run.log stops advancing for STALL_SECS,
  # kill this attempt and let the loop retry. Progress lines flow every
  # step once training starts; compiles print nothing for up to ~10 min,
  # hence the generous default (25 min).
  while kill -0 $PY 2>/dev/null; do
    sleep 30
    age=$(( $(date +%s) - $(stat -c %Y run.log) ))
    if [ "$age" -gt "$STALL_SECS" ]; then
      echo "watchdog: run.log silent for ${age}s — killing wedged attempt"
      kill $PY 2>/dev/null; sleep 10; kill -9 $PY 2>/dev/null
      echo "WATCHDOG_STALL" >> run.log
      break
    fi
  done
  wait $PY
  code=$?
  set -e
  grep -E "Memory plan|master|moments|attention|accum|Min 8|Encoding|Cached|Optimizer Step: (1|2|50|60) |checkpoint|complete|WARNING|Error" run.log | head -40 || true
  if [ $code -eq 0 ]; then break; fi
  # Retry both failure modes of the flaky tunnel: backend never registers
  # (init-time) and transport drops mid-run (UNAVAILABLE / Broken pipe on
  # remote_compile or execute). The caching pass is incremental, so each
  # retry resumes where the last attempt died.
  if grep -qE "Ran out of memory|Exceeded hbm capacity|RESOURCE_EXHAUSTED" run.log; then
    # a compile OOM is deterministic — retrying forever just spins
    # (the HTTP-500 wrapper contains "remote_compile", which would
    # otherwise match the tunnel-flap pattern below)
    echo "HBM OOM (deterministic) — aborting, not a tunnel flap"
    grep -m1 -E "Ran out of memory|Exceeded hbm capacity" run.log
    exit 42
  fi
  if grep -qE "not in the list of known backends|UNAVAILABLE:|Broken pipe|Network Error|Connection reset|remote_compile|WATCHDOG_STALL" run.log; then
    echo "tunnel flap (init or mid-run transport); retrying in 60s"
    sleep 60
    continue
  fi
  echo "trainer failed with a non-backend error (exit $code); aborting"
  tail -40 run.log
  exit $code
done
