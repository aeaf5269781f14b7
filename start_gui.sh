#!/bin/bash
# Launch the training GUI (the reference's start_gui.bat equivalent).
# Uses the venv from setup.sh when present; falls back to the system python.
set -euo pipefail
cd "$(dirname "$0")"
if [ -f .venv/bin/activate ]; then
  # shellcheck disable=SC1091
  source .venv/bin/activate
fi
exec python -m aozora_sdxl_training_tpu.gui "$@"
