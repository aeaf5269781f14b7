#!/bin/bash
# One-command CPU reproduction of the full verify circuit (~20-30 min on a
# single core): tiny envs for both model families, then cache -> train ->
# save -> resume -> incremental-cache -> preview -> video -> QAT repair ->
# post-training tools. Every step fails loudly (set -e).
#
#   bash tools_dev/smoke_all.sh [scratch-root]
#
# See .claude/skills/verify/SKILL.md for what each probe asserts.
set -euo pipefail
ROOT=${1:-/tmp/aozora_smoke}
# Guard the rm -rf below: the scratch root must live under /tmp and contain
# "smoke" in its basename (a mistyped "~" or project path must never be wiped).
case "$(basename "$ROOT")" in
  *smoke*) ;;
  *) echo "refusing scratch root '$ROOT': basename must contain 'smoke'"; exit 2 ;;
esac
case "$ROOT" in
  /tmp/*) ;;
  *) echo "refusing scratch root '$ROOT': must be under /tmp"; exit 2 ;;
esac
REPO="$(cd "$(dirname "$0")/.." && pwd)"
export PYTHONPATH="$REPO" AOZORA_PLATFORM=cpu
PY=(python)
step() { echo; echo "=== $* ==="; }

rm -rf "$ROOT"; mkdir -p "$ROOT"

step "generate tiny SDXL env"
"${PY[@]}" "$REPO/tools_dev/make_verify_env_sdxl.py" "$ROOT/sdxl" | tail -1
step "generate tiny Anima env"
"${PY[@]}" "$REPO/tools_dev/make_verify_env_anima.py" "$ROOT/anima" | tail -1

step "SDXL: cache -> train -> save (with preview sampling)"
python - "$ROOT" <<'EOF'
import json, sys
root = sys.argv[1]
p = json.load(open(f"{root}/sdxl/preset.json"))
p["sdxl"]["sdxl_preview_every_n_steps"] = 2
p["sdxl"]["sdxl_preview_sample_steps"] = 2
json.dump(p, open(f"{root}/sdxl/preset.json", "w"), indent=1)
EOF
(cd "$ROOT/sdxl" && "${PY[@]}" -m aozora_sdxl_training_tpu.cli.train_sdxl \
    --config preset.json | grep -E "Optimizer Step|preview|complete")
test -f "$ROOT/sdxl/out/previews/step_2.png"

step "SDXL: resume continues the optimizer counter"
python - "$ROOT" <<'EOF'
import json, sys
root = sys.argv[1]
p = json.load(open(f"{root}/sdxl/preset.json"))
s = p["sdxl"]
s["sdxl_resume_training"] = True
s["sdxl_resume_model_path"] = f"{root}/sdxl/out/verify_run_step_2.safetensors"
s["sdxl_resume_state_path"] = (
    f"{root}/sdxl/out/verify_run_training_state_step_2.safetensors")
s["sdxl_max_train_steps"] = 4
json.dump(p, open(f"{root}/sdxl/preset_resume.json", "w"), indent=1)
EOF
(cd "$ROOT/sdxl" && "${PY[@]}" -m aozora_sdxl_training_tpu.cli.train_sdxl \
    --config preset_resume.json | grep -E "RESUMING|Restored|Optimizer Step: [34]")

step "SDXL: two-pass low-memory rung (single-chip full-model path)"
python - "$ROOT" <<'EOF'
import json, sys
root = sys.argv[1]
p = json.load(open(f"{root}/sdxl/preset.json"))
s = p["sdxl"]
s["sdxl_resume_training"] = False
s["sdxl_output_name"] = "verify_two_pass"
s["sdxl_max_train_steps"] = 2
s["sdxl_gradient_accumulation_steps"] = 1
s["sdxl_preview_every_n_steps"] = 0
json.dump(p, open(f"{root}/sdxl/preset_two_pass.json", "w"), indent=1)
EOF
(cd "$ROOT/sdxl" && AOZORA_LOWMEM_RUNG=two_pass AOZORA_DEVICES=1 \
    "${PY[@]}" -m aozora_sdxl_training_tpu.cli.train_sdxl \
    --config preset_two_pass.json \
    | grep -E "two-pass step|Optimizer Step: 2|complete")
test -f "$ROOT/sdxl/out/verify_two_pass.safetensors"

step "SDXL: incremental cache (1 caption re-encoded)"
sed -i 's/.*/an edited caption/' "$(ls "$ROOT"/sdxl/data/*.txt | head -1)"
(cd "$ROOT/sdxl" && "${PY[@]}" -m aozora_sdxl_training_tpu.cli.cache_datasets \
    --config preset.json | grep -E "Encoding 1 caption")

step "Anima: cache -> train (decoded-pixel previews)"
python - "$ROOT" <<'EOF'
import json, sys
root = sys.argv[1]
p = json.load(open(f"{root}/anima/preset.json"))
p["anima"]["anima_preview_every_n_steps"] = 2
p["anima"]["anima_preview_sample_steps"] = 2
json.dump(p, open(f"{root}/anima/preset.json", "w"), indent=1)
EOF
(cd "$ROOT/anima" && "${PY[@]}" -m aozora_sdxl_training_tpu.cli.train_anima \
    --config preset.json | grep -E "phase|decoded pixels|Optimizer Step|complete")
test -f "$ROOT/anima/out/previews/step_2.png"

step "Anima: T=5 video clips (cache rebuild + 5-D flow matching)"
python - "$ROOT" <<'EOF'
import json, sys
root = sys.argv[1]
p = json.load(open(f"{root}/anima/preset.json"))
p["anima"]["anima_video_frames"] = 5
p["anima"]["anima_output_name"] = "vid_run"
json.dump(p, open(f"{root}/anima/preset_vid.json", "w"), indent=1)
EOF
(cd "$ROOT/anima" && "${PY[@]}" -m aozora_sdxl_training_tpu.cli.train_anima \
    --config preset_vid.json | grep -E "phase 2|Optimizer Step: 1|complete")

step "QAT repair: quantize -> repair-train -> packed save"
(cd "$ROOT/anima" && "${PY[@]}" -m aozora_sdxl_training_tpu.tools.convert_quants \
    tiny_dit.safetensors "$ROOT/anima/dit_q8.safetensors" \
    --format int8 --preset target --min-elements 256 | tail -1)
python - "$ROOT" <<'EOF'
import json, sys
root = sys.argv[1]
p = json.load(open(f"{root}/anima/preset.json"))
p["anima"]["anima_dit_model_path"] = f"{root}/anima/dit_q8.safetensors"
p["anima"]["anima_output_name"] = "repair_run"
p["anima"]["anima_preview_every_n_steps"] = 0
json.dump(p, open(f"{root}/anima/preset_repair.json", "w"), indent=1)
EOF
(cd "$ROOT/anima" && "${PY[@]}" -m aozora_sdxl_training_tpu.cli.train_anima_repair \
    --config preset_repair.json | grep -E "in-jit QAT|packed quantized")

step "post-training tools (quantize / gguf / diff / repair / hash)"
cd "$ROOT/anima"
"${PY[@]}" -m aozora_sdxl_training_tpu.tools.convert_quants \
    out/anima_verify.safetensors /dev/null --format int8 --preset all \
    --min-elements 16 2>/dev/null | grep -E "int8" >/dev/null && echo "quantize OK"
"${PY[@]}" -m aozora_sdxl_training_tpu.tools.gguf_export \
    out/anima_verify.safetensors "$ROOT/anima/m.gguf" | grep quantized
"${PY[@]}" -m aozora_sdxl_training_tpu.tools.diff_checker \
    tiny_dit.safetensors out/anima_verify.safetensors > "$ROOT/diff.json"
head -3 "$ROOT/diff.json"
"${PY[@]}" -m aozora_sdxl_training_tpu.tools.key_repair \
    "$ROOT/anima/dit_q8.safetensors" "$ROOT/anima/dit_stripped.safetensors" | tail -1
"${PY[@]}" -m aozora_sdxl_training_tpu.tools.hash_checker \
    out/anima_verify.safetensors | grep -E "legacy_model_hash"

step "dynamic quant profiles calibrated on the trainer's own cache"
"${PY[@]}" -m aozora_sdxl_training_tpu.tools.profile_quants \
    out/anima_verify.safetensors "$ROOT/anima/dit_dyn_calib.safetensors" \
    --mode dynamic --format ternary --preset target --max-layers 2 \
    --promote-threshold 0.2 \
    --cache-dir "$ROOT/anima/data/.precomputed_anima_dit_cache" \
    | grep -E "calibration batch from cache|assignment_counts" \
    || { echo "profile_quants cache calibration FAILED"; exit 1; }
"${PY[@]}" -m aozora_sdxl_training_tpu.tools.profile_quants \
    out/anima_verify.safetensors "$ROOT/anima/dit_cf_calib.safetensors" \
    --mode compression_first --preset target --error-budget 0.5 \
    --cache-dir "$ROOT/anima/data/.precomputed_anima_dit_cache" \
    | grep -E "quantized" \
    || { echo "compression_first cache calibration FAILED"; exit 1; }

echo
echo "=== smoke_all: ALL PROBES GREEN ==="
