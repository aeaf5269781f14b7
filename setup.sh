#!/bin/bash
# Environment setup for Aozora-TPU (the reference's setup.bat equivalent,
# /root/reference/setup.bat — venv + CUDA wheels there; JAX/TPU wheels here).
#
# On a Cloud TPU VM the stack is: jax[tpu], flax-free (this framework is
# functional JAX), plus the host-side deps. Skips anything already present.
set -euo pipefail

PYTHON=${PYTHON:-python3}
VENV=${VENV:-.venv}

if [ ! -d "$VENV" ]; then
  "$PYTHON" -m venv "$VENV"
fi
# shellcheck disable=SC1091
source "$VENV/bin/activate"

python - <<'EOF' && exit 0 || true
import importlib, sys
needed = ["jax", "numpy", "PIL", "safetensors"]
missing = [m for m in needed if importlib.util.find_spec(m) is None]
sys.exit(1 if missing else 0)
EOF

pip install --upgrade pip
# TPU runtime (on GPU/CPU boxes replace with: pip install jax)
pip install 'jax[tpu]' -f https://storage.googleapis.com/jax-releases/libtpu_releases.html
pip install numpy pillow safetensors opencv-python-headless pytest

echo "Setup complete. Train with:"
echo "  python -m aozora_sdxl_training_tpu.cli.train_sdxl --config configs/default_config.json"
