#!/bin/bash
# VERDICT r3 #2: the full-size Anima production proof, all three phases on
# the real chip through the REAL cli.train_anima:
#   1. train: 2.09B DiT, 1024px flow matching, 60 optimizer steps, streaming
#      save at step 50 (two-phase caching pass runs first: Qwen3 text encode
#      + Wan causal-VAE latent encode at full shapes),
#   2. resume: reload the step-50 model+state pair, steps 51-60, final save,
#   3. video-mode: anima_video_frames=5 -> cache rebuilds as clips (T'=2
#      latent frames, 8192-token self-attention), 4 full-scale video steps.
# Logs: <root>/run.log, resume.log, video.log.  Summarize with
#   python tools_dev/parse_trainrun.py ... -o TRAINRUN_ANIMA_r04.json
#
#   bash tools_dev/fullsize_anima_full.sh [env-root]
set -euo pipefail
ROOT=${1:-/root/fullsize_anima}
REPO="$(cd "$(dirname "$0")/.." && pwd)"
export PYTHONPATH="$REPO${PYTHONPATH:+:$PYTHONPATH}"
export JAX_COMPILATION_CACHE_DIR=/tmp/jax_cache

[ -f "$ROOT/preset.json" ] || python "$REPO/tools_dev/make_fullsize_env_anima.py" "$ROOT"
cd "$ROOT"
STALL_SECS=${STALL_SECS:-1800}

run_phase() {  # run_phase <preset> <log>
  local preset="$1" log="$2"
  for attempt in $(seq 1 40); do
    echo "=== anima phase $log (attempt $attempt, $(date)) ==="
    set +e
    python -m aozora_sdxl_training_tpu.cli.train_anima --config "$preset" \
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
      # a compile OOM is deterministic — retrying forever just spins
      # (the HTTP-500 wrapper contains "remote_compile", which would
      # otherwise match the tunnel-flap pattern below)
      echo "HBM OOM (deterministic) — aborting, not a tunnel flap"
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

# ---- phase 1: train 60 steps, save at 50 ----
if [ ! -f "$ROOT/out/fullsize_anima_step_50.safetensors" ]; then
  run_phase preset.json run.log
fi
MODEL="$ROOT/out/fullsize_anima_step_50.safetensors"
STATE="$ROOT/out/fullsize_anima_training_state_step_50.safetensors"
ls -la "$MODEL" "$STATE"

# ---- phase 2: resume 51-60 from the step-50 pair ----
python - "$ROOT" "$MODEL" "$STATE" <<'EOF'
import json, sys
root, model, state = sys.argv[1:4]
cfg = json.load(open(f"{root}/preset.json"))
a = cfg["anima"]
a["anima_resume_training"] = True
a["anima_resume_model_path"] = model
a["anima_resume_state_path"] = state
a["anima_output_name"] = "fullsize_anima_resumed"
a["anima_save_every_n_steps"] = 0
json.dump(cfg, open(f"{root}/preset_resume.json", "w"), indent=1)
print("wrote preset_resume.json")
EOF
run_phase preset_resume.json resume.log
grep -E "Restored optimizer state|Optimizer Step: (5[1-9]|60)" resume.log | head -12

# ---- phase 3: video mode at full scale (cache rebuilds as clips) ----
python - "$ROOT" <<'EOF'
import json, sys
root = sys.argv[1] if len(sys.argv) > 1 else "."
cfg = json.load(open(f"{root}/preset.json"))
a = cfg["anima"]
a["anima_video_frames"] = 5
a["anima_max_train_steps"] = 4
a["anima_save_every_n_steps"] = 0
a["anima_output_name"] = "fullsize_anima_video"
json.dump(cfg, open(f"{root}/preset_video.json", "w"), indent=1)
print("wrote preset_video.json (T=5 frames -> T'=2 latent, 4 steps)")
EOF
run_phase preset_video.json video.log
grep -E "s/step|Optimizer Step" video.log | tail -6
echo "=== all anima phases complete ==="
