"""Build a tiny Anima DiT verify environment: DiT + Qwen3 + Wan VAE
checkpoints (torch layouts), a 4-image dataset, and a nested preset JSON —
then the real CLI drives cache -> train -> save end-to-end on CPU."""

import json
import sys
from dataclasses import replace
from pathlib import Path

import numpy as np

sys.path.insert(0, "/root/repo")

from PIL import Image

from aozora_sdxl_training_tpu.ckpt.safetensors_io import write_streaming
from aozora_sdxl_training_tpu.config import schema
from aozora_sdxl_training_tpu.models.anima import dit as dit_mod
from aozora_sdxl_training_tpu.models.anima import qwen3, wan_vae

import jax

# tiny-model init never needs the chip; forcing CPU also keeps the
# generator alive through axon tunnel flaps
jax.config.update("jax_platforms", "cpu")

ROOT = Path(sys.argv[1] if len(sys.argv) > 1 else "/tmp/verify_anima")
ROOT.mkdir(parents=True, exist_ok=True)
rng = np.random.default_rng(7)

# --- tiny DiT (z=4 to match TINY_WAN_VAE, qwen hidden 64) ---
dit_cfg = replace(dit_mod.TINY_ANIMA, in_channels=4, out_channels=4,
                  adapter_source_dim=64, adapter_vocab=49408)
params = dit_mod.init_params(dit_cfg, jax.random.PRNGKey(11))
torch_state = {f"pipe.dit.{k}": np.asarray(v)
               for k, v in dit_mod.params_to_torch_state(params).items()}
dit_path = ROOT / "tiny_dit.safetensors"
write_streaming(dit_path, torch_state)
print(f"dit: {dit_path} ({len(torch_state)} tensors, "
      f"{sum(int(np.asarray(v).size) for v in torch_state.values()):,} params)")

# --- tiny Qwen3 text encoder (HF torch layout: 2-D weights transposed) ---
q_cfg = replace(qwen3.TINY_QWEN3, vocab_size=49408, rope_theta=1e6)
q_params = qwen3.init_params(q_cfg, jax.random.PRNGKey(12))
q_state = {}
for name, arr in q_params.items():
    a = np.asarray(arr)
    if a.ndim == 2 and name != "model.embed_tokens.weight":
        a = a.T
    q_state[name] = a
q_path = ROOT / "tiny_qwen3.safetensors"
write_streaming(q_path, q_state)
det = qwen3.detect_config(q_state)
assert (det.hidden_size, det.num_layers, det.vocab_size) == (q_cfg.hidden_size, q_cfg.num_layers, q_cfg.vocab_size), det
print(f"qwen3: {q_path} ({len(q_state)} tensors)")

# --- tiny Wan VAE encoder (torch OIHW conv layout) ---
v_cfg = wan_vae.TINY_WAN_VAE
# video=True adds the causal temporal time_conv kernels so the same tiny
# checkpoint also drives the ANIMA_VIDEO_FRAMES>1 (T>1 clip) verify path
v_params = wan_vae.init_params(v_cfg, jax.random.PRNGKey(13), video=True)
v_state = {}
for name, arr in v_params.items():
    a = np.asarray(arr)
    if a.ndim == 5:                       # (kt,kh,kw,I,O) -> (O,I,kt,kh,kw)
        a = np.transpose(a, (4, 3, 0, 1, 2))
    elif a.ndim == 4:                     # HWIO -> OIHW
        a = np.transpose(a, (3, 2, 0, 1))
    v_state[name] = a
# decoder half (full-Wan-checkpoint shape) so pixel previews run e2e
d_params = wan_vae.init_decoder_params(v_cfg, jax.random.PRNGKey(14))
for name, arr in d_params.items():
    a = np.asarray(arr)
    if a.ndim == 4:
        a = np.transpose(a, (3, 2, 0, 1))
    v_state[name] = a
v_path = ROOT / "tiny_wan_vae.safetensors"
write_streaming(v_path, v_state)
print(f"vae: {v_path} ({len(v_state)} tensors incl. decoder)")

# --- dataset: 4 images with caption sidecars ---
data = ROOT / "data"
data.mkdir(exist_ok=True)
for i in range(4):
    arr = rng.integers(0, 255, size=(128, 128, 3)).astype(np.uint8)
    Image.fromarray(arr).save(data / f"anim_{i}.png")
    (data / f"anim_{i}.txt").write_text(f"an animation frame number {i}")
print(f"dataset: {data} (4 images)")

# --- preset JSON (nested GUI schema) ---
flat = {
    "TRAINING_MODE": "Anima DiT",
    "DIT_PATH": str(dit_path),
    "TEXT_ENCODER_PATH": str(q_path),
    "DIT_VAE_PATH": str(v_path),
    "OUTPUT_DIR": str(ROOT / "out"),
    "OUTPUT_NAME": "anima_verify",
    "INSTANCE_DATASETS": [{"path": str(data), "repeats": 1}],
    "MAX_TRAIN_STEPS": 3,
    "BATCH_SIZE": 1,
    "GRADIENT_ACCUMULATION_STEPS": 1,
    "SAVE_EVERY_N_STEPS": 0,
    "SEED": 321,
    "MAX_BUCKET_RESOLUTION": 128,
    "VAE_CACHING_TILED": False,
    "CACHING_BATCH_SIZE": 2,
    "MIXED_PRECISION": "bfloat16",
    "ANIMA_DIT_SAVE_PREFIX": "auto",
}
preset = schema.nest_flat_config(flat, "anima")
with open(ROOT / "preset.json", "w") as f:
    json.dump(preset, f, indent=1)
print(f"preset: {ROOT/'preset.json'}")
