#!/bin/bash
# VERDICT r3 #3: prove the PRODUCTION full-size on-chip path *optimizes*,
# not just runs.  Full 2.57B SDXL checkpoint, 4-image overfit dataset,
# constant LR 1e-4, 150 optimizer steps on whatever rung the memory
# planner picks (two-pass on v5e-1) — require the loss to descend >=2x
# (first-10 avg vs last-10 avg of the optimizer-block losses).
#
#   bash tools_dev/fullsize_descent_run.sh [env-root]
set -euo pipefail
ROOT=${1:-/root/fullsize_env}
REPO="$(cd "$(dirname "$0")/.." && pwd)"
# APPEND to PYTHONPATH — overwriting clobbers the axon sitecustomize
export PYTHONPATH="$REPO${PYTHONPATH:+:$PYTHONPATH}"
export JAX_COMPILATION_CACHE_DIR=/tmp/jax_cache

[ -f "$ROOT/preset.json" ] || python "$REPO/tools_dev/make_fullsize_env_sdxl.py" "$ROOT" 4

python - "$ROOT" <<'EOF'
import json, sys
root = sys.argv[1]
p = json.load(open(f"{root}/preset.json"))
s = p["sdxl"]
s["sdxl_max_train_steps"] = 150
s["sdxl_save_every_n_steps"] = 0      # descent probe: no mid-run saves
s["sdxl_lr_custom_curve"] = [[0.0, 1.0e-4], [1.0, 1.0e-4]]
s["sdxl_output_name"] = "descent_run"
json.dump(p, open(f"{root}/preset_descent.json", "w"), indent=1)
print("wrote preset_descent.json (150 steps @ LR 1e-4)")
EOF

cd "$ROOT"
STALL_SECS=${STALL_SECS:-1500}
for attempt in $(seq 1 40); do
  echo "=== full-size SDXL descent run (attempt $attempt, $(date)) ==="
  set +e
  python -m aozora_sdxl_training_tpu.cli.train_sdxl --config preset_descent.json \
      > descent.log 2>&1 &
  PY=$!
  while kill -0 $PY 2>/dev/null; do
    sleep 30
    age=$(( $(date +%s) - $(stat -c %Y descent.log) ))
    if [ "$age" -gt "$STALL_SECS" ]; then
      echo "watchdog: descent.log silent for ${age}s — killing wedged attempt"
      kill $PY 2>/dev/null; sleep 10; kill -9 $PY 2>/dev/null
      echo "WATCHDOG_STALL" >> descent.log
      break
    fi
  done
  wait $PY
  code=$?
  set -e
  if [ $code -eq 0 ]; then break; fi
  if grep -qE "Ran out of memory|Exceeded hbm capacity|RESOURCE_EXHAUSTED" descent.log; then
    # a compile OOM is deterministic — retrying forever just spins
    # (the HTTP-500 wrapper contains "remote_compile", which would
    # otherwise match the tunnel-flap pattern below)
    echo "HBM OOM (deterministic) — aborting, not a tunnel flap"
    grep -m1 -E "Ran out of memory|Exceeded hbm capacity" descent.log
    exit 42
  fi
  if grep -qE "not in the list of known backends|UNAVAILABLE:|Broken pipe|Network Error|Connection reset|remote_compile|WATCHDOG_STALL" descent.log; then
    echo "tunnel flap; retrying in 60s"; sleep 60; continue
  fi
  echo "trainer failed with a non-backend error (exit $code)"; tail -40 descent.log
  exit $code
done

python - "$ROOT" <<'EOF'
import re, sys
root = sys.argv[1]
losses = [float(m.group(1)) for m in re.finditer(
    r"--- Optimizer Step:\s*\d+\s*\|\s*Loss:\s*([\d.e+-]+)", open(f"{root}/descent.log").read())]
first, last = losses[:10], losses[-10:]
a, b = sum(first)/len(first), sum(last)/len(last)
print(f"descent: {len(losses)} optimizer steps, first-10 avg {a:.4f} -> last-10 avg {b:.4f} ({a/max(b,1e-9):.2f}x)")
assert b < a / 2, "loss did not descend >=2x"
print("DESCENT OK")
EOF
