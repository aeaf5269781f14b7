#!/bin/bash
# Resume phase of the full-size real-chip run (VERDICT r2 #1: the multi-GB
# checkpoint must be saved AND re-loaded): point the trainer at the step-50
# artifacts from fullsize_tpu_run.sh and run the remaining steps.
#
#   bash tools_dev/fullsize_resume_run.sh [env-root] [resume-step]
#
# Logs to <env-root>/resume.log. Same retry/watchdog scheme as the main
# driver (the axon tunnel flaps and can wedge).
set -euo pipefail
ROOT=${1:-/root/fullsize_env}
STEP=${2:-50}
REPO="$(cd "$(dirname "$0")/.." && pwd)"
export PYTHONPATH="$REPO${PYTHONPATH:+:$PYTHONPATH}"
export JAX_COMPILATION_CACHE_DIR=/tmp/jax_cache

cd "$ROOT"
MODEL="$ROOT/out/fullsize_run_step_${STEP}.safetensors"
STATE="$ROOT/out/fullsize_run_training_state_step_${STEP}.safetensors"
[ -f "$MODEL" ] || { echo "missing $MODEL"; exit 2; }
[ -f "$STATE" ] || { echo "missing $STATE"; exit 2; }

python - "$ROOT" "$MODEL" "$STATE" <<'EOF'
import json, sys
root, model, state = sys.argv[1:4]
cfg = json.load(open(f"{root}/preset.json"))
s = cfg["sdxl"]
s["sdxl_resume_training"] = True
s["sdxl_resume_model_path"] = model
s["sdxl_resume_state_path"] = state
json.dump(cfg, open(f"{root}/preset_resume.json", "w"), indent=1)
print("wrote preset_resume.json")
EOF

STALL_SECS=${STALL_SECS:-1500}
for attempt in $(seq 1 20); do
  echo "=== full-size resume run (attempt $attempt, $(date)) ==="
  set +e
  python -m aozora_sdxl_training_tpu.cli.train_sdxl --config preset_resume.json \
      > resume.log 2>&1 &
  PY=$!
  while kill -0 $PY 2>/dev/null; do
    sleep 30
    age=$(( $(date +%s) - $(stat -c %Y resume.log) ))
    if [ "$age" -gt "$STALL_SECS" ]; then
      echo "watchdog: resume.log silent for ${age}s — killing wedged attempt"
      kill $PY 2>/dev/null; sleep 10; kill -9 $PY 2>/dev/null
      echo "WATCHDOG_STALL" >> resume.log
      break
    fi
  done
  wait $PY
  code=$?
  set -e
  grep -E "Restored|resume|Optimizer Step: (5[1-9]|60) |checkpoint|complete|Error" resume.log | head -30 || true
  if [ $code -eq 0 ]; then break; fi
  if grep -qE "Ran out of memory|Exceeded hbm capacity|RESOURCE_EXHAUSTED" resume.log; then
    # a compile OOM is deterministic — retrying forever just spins
    # (the HTTP-500 wrapper contains "remote_compile", which would
    # otherwise match the tunnel-flap pattern below)
    echo "HBM OOM (deterministic) — aborting, not a tunnel flap"
    grep -m1 -E "Ran out of memory|Exceeded hbm capacity" resume.log
    exit 42
  fi
  if grep -qE "not in the list of known backends|UNAVAILABLE:|Broken pipe|Network Error|Connection reset|remote_compile|WATCHDOG_STALL" resume.log; then
    echo "tunnel flap; retrying in 60s"
    sleep 60
    continue
  fi
  echo "resume failed with a non-tunnel error (exit $code); aborting"
  tail -40 resume.log
  exit $code
done
