#!/bin/bash
# Drive the REAL full-size Anima trainer on the TPU chip: the actual CLI —
# two-phase caching pass (Qwen3 text encode + Wan VAE encode), prefetcher,
# reporter, memory plan, streaming checkpoint save — with the production
# 2.09B DiT at 1024px flow matching, optimizer state resident.
#
#   bash tools_dev/fullsize_anima_run.sh [env-root]
#
# Generates the env on first use (tools_dev/make_fullsize_env_anima.py).
# Logs to <env-root>/run.log; parse with tools_dev/parse_trainrun.py.
set -euo pipefail
ROOT=${1:-/root/fullsize_anima}
REPO="$(cd "$(dirname "$0")/.." && pwd)"
# APPEND to PYTHONPATH — overwriting it clobbers the container's
# sitecustomize dir (/root/.axon_site) and the TPU plugin never registers
export PYTHONPATH="$REPO${PYTHONPATH:+:$PYTHONPATH}"
export JAX_COMPILATION_CACHE_DIR=/tmp/jax_cache

[ -f "$ROOT/preset.json" ] || python "$REPO/tools_dev/make_fullsize_env_anima.py" "$ROOT"

cd "$ROOT"
# Tunnel-flap retry loop + stall watchdog — see fullsize_tpu_run.sh for the
# rationale (the trainer itself is the preflight probe).
STALL_SECS=${STALL_SECS:-1500}
for attempt in $(seq 1 40); do
  echo "=== full-size Anima TPU training run (attempt $attempt, $(date)) ==="
  set +e
  python -m aozora_sdxl_training_tpu.cli.train_anima --config preset.json \
      > run.log 2>&1 &
  PY=$!
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
  grep -E "Memory plan|master|moments|attention|accum|Encoding|Cached|cache|Optimizer Step: (1|2|50|60) |checkpoint|complete|WARNING|Error" run.log | head -40 || true
  if [ $code -eq 0 ]; then break; fi
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
