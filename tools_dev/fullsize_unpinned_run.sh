#!/bin/bash
# VERDICT r4 weak #5 + #8: ONE full-size SDXL artifact with NO AOZORA_*
# knob pins — the memory planner must auto-gate the fast-backward rewrites
# (_gate_fast_backward -> legacy conv backward / unfused QKV / flash@2048
# on the single-chip two-pass rung), the compile must fit the chip, and
# the run must train, SAVE mid-run, and RESUME from that save under the
# same planner-chosen defaults.
#
#   bash tools_dev/fullsize_unpinned_run.sh [env-root]
#
# Phase 1: 20 optimizer steps, streaming save at step 15.
# Phase 2: resume from the step-15 pair, steps 16-20, final save.
# Summarize with parse_trainrun.py -> TRAINRUN_r05.json.
set -euo pipefail
ROOT=${1:-/root/fullsize_env}
REPO="$(cd "$(dirname "$0")/.." && pwd)"
# APPEND to PYTHONPATH — overwriting clobbers the axon sitecustomize
export PYTHONPATH="$REPO${PYTHONPATH:+:$PYTHONPATH}"
export JAX_COMPILATION_CACHE_DIR=/tmp/jax_cache

for K in AOZORA_CONV_BWD AOZORA_FUSED_QKV AOZORA_FLASH_MIN_KV \
         AOZORA_LOWMEM_RUNG AOZORA_SDXL_REMAT AOZORA_NORM_IMPL; do
  if [ -n "${!K:-}" ]; then
    echo "REFUSING: $K=${!K} is pinned — this driver proves the UNPINNED path"
    exit 3
  fi
done

[ -f "$ROOT/preset.json" ] || python "$REPO/tools_dev/make_fullsize_env_sdxl.py" "$ROOT" 4

python - "$ROOT" <<'EOF'
import json, sys
root = sys.argv[1]
p = json.load(open(f"{root}/preset.json"))
s = p["sdxl"]
s["sdxl_max_train_steps"] = 20
s["sdxl_save_every_n_steps"] = 15
s["sdxl_lr_custom_curve"] = [[0.0, 1.0e-4], [1.0, 1.0e-4]]
s["sdxl_output_name"] = "unpinned_run"
json.dump(p, open(f"{root}/preset_unpinned.json", "w"), indent=1)
print("wrote preset_unpinned.json (20 steps, save@15, planner-gated knobs)")
EOF

cd "$ROOT"
STALL_SECS=${STALL_SECS:-1500}

run_phase() {  # run_phase <preset> <log>
  local preset="$1" log="$2"
  for attempt in $(seq 1 40); do
    echo "=== unpinned phase $log (attempt $attempt, $(date)) ==="
    set +e
    python -m aozora_sdxl_training_tpu.cli.train_sdxl --config "$preset" \
        > "$log" 2>&1 &
    local PY=$!
    while kill -0 $PY 2>/dev/null; do
      sleep 30
      local age=$(( $(date +%s) - $(stat -c %Y "$log") ))
      if [ "$age" -gt "$STALL_SECS" ]; then
        echo "watchdog: $log silent for ${age}s — killing wedged attempt"
        kill $PY 2>/dev/null; sleep 10; kill -9 $PY 2>/dev/null
        echo "WATCHDOG_STALL" >> "$log"
        break
      fi
    done
    wait $PY
    local code=$?
    set -e
    if [ $code -eq 0 ]; then return 0; fi
    if grep -qE "Ran out of memory|Exceeded hbm capacity|RESOURCE_EXHAUSTED" "$log"; then
      # an unpinned compile OOM means the planner gate FAILED — that is
      # the finding, not a flake
      echo "HBM OOM under planner-gated defaults — gate failure, aborting"
      grep -m1 -E "Ran out of memory|Exceeded hbm capacity" "$log"
      exit 42
    fi
    if grep -qE "not in the list of known backends|UNAVAILABLE:|Broken pipe|Network Error|Connection reset|remote_compile|WATCHDOG_STALL" "$log"; then
      echo "tunnel flap; retrying in 60s"; sleep 60; continue
    fi
    echo "phase $log failed (exit $code)"; tail -40 "$log"; return $code
  done
  return 1
}

run_phase preset_unpinned.json unpinned.log
grep -E "backward: legacy|Memory plan|two-pass" unpinned.log | head -8 || true
MODEL="$ROOT/out/unpinned_run_step_15.safetensors"
STATE="$ROOT/out/unpinned_run_training_state_step_15.safetensors"
ls -la "$MODEL" "$STATE"

python - "$ROOT" "$MODEL" "$STATE" <<'EOF'
import json, sys
root, model, state = sys.argv[1:4]
cfg = json.load(open(f"{root}/preset_unpinned.json"))
s = cfg["sdxl"]
s["sdxl_resume_training"] = True
s["sdxl_resume_model_path"] = model
s["sdxl_resume_state_path"] = state
s["sdxl_save_every_n_steps"] = 0
s["sdxl_output_name"] = "unpinned_resumed"
json.dump(cfg, open(f"{root}/preset_unpinned_resume.json", "w"), indent=1)
print("wrote preset_unpinned_resume.json")
EOF
run_phase preset_unpinned_resume.json unpinned_resume.log
grep -E "Restored optimizer state|Optimizer Step: (1[6-9]|20)" unpinned_resume.log | head -8
echo "=== unpinned full-size run complete (train+save+resume, zero knob pins) ==="
