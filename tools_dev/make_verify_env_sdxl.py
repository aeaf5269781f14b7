"""Build a tiny-but-complete SDXL single-file checkpoint + dataset for
driving the real training CLI end-to-end on CPU."""

import json
import sys
from pathlib import Path

sys.path.insert(0, "/root/repo")
import os
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=1"
import jax
jax.config.update("jax_platforms", "cpu")

import numpy as np
from PIL import Image

import jax.numpy as jnp
from aozora_sdxl_training_tpu.ckpt.safetensors_io import write_streaming
from aozora_sdxl_training_tpu.models.sdxl import arch, clip as clip_mod
from aozora_sdxl_training_tpu.models.sdxl.conversion import sd_state_from_params
from aozora_sdxl_training_tpu.models.sdxl.unet import init_params

ROOT = Path(sys.argv[1] if len(sys.argv) > 1 else "/tmp/verify_drive")
ROOT.mkdir(parents=True, exist_ok=True)
rng = np.random.default_rng(0)

# --- tiny UNet (TINY arch, 4-ch latents, cross dim 48, pooled 40) ---
unet_params = init_params(arch.TINY, jax.random.PRNGKey(7))
tensors = {k: np.asarray(v) for k, v in
           sd_state_from_params(unet_params, arch.TINY, dtype=jnp.float32).items()}

# --- tiny CLIP-L in HF layout (width 16, 2 layers) -> hidden 16 ---
# cross dim = width_l + width_g must equal TINY.cross_attention_dim=48
W_L, W_G, LAYERS = 16, 32, 2
POOLED = arch.TINY.pooled_projection_dim  # 40
pl_ = clip_mod.CLIP_L_PREFIX
tensors[f"{pl_}embeddings.token_embedding.weight"] = rng.normal(size=(64, W_L)).astype(np.float32) * 0.02
tensors[f"{pl_}embeddings.position_embedding.weight"] = rng.normal(size=(77, W_L)).astype(np.float32) * 0.02
tensors[f"{pl_}final_layer_norm.weight"] = np.ones(W_L, np.float32)
tensors[f"{pl_}final_layer_norm.bias"] = np.zeros(W_L, np.float32)
for i in range(LAYERS):
    src = f"{pl_}encoder.layers.{i}."
    for ln in ("layer_norm1", "layer_norm2"):
        tensors[f"{src}{ln}.weight"] = np.ones(W_L, np.float32)
        tensors[f"{src}{ln}.bias"] = np.zeros(W_L, np.float32)
    for proj in ("self_attn.q_proj", "self_attn.k_proj", "self_attn.v_proj",
                 "self_attn.out_proj"):
        tensors[f"{src}{proj}.weight"] = rng.normal(size=(W_L, W_L)).astype(np.float32) * 0.05
        tensors[f"{src}{proj}.bias"] = np.zeros(W_L, np.float32)
    tensors[f"{src}mlp.fc1.weight"] = rng.normal(size=(4 * W_L, W_L)).astype(np.float32) * 0.05
    tensors[f"{src}mlp.fc1.bias"] = np.zeros(4 * W_L, np.float32)
    tensors[f"{src}mlp.fc2.weight"] = rng.normal(size=(W_L, 4 * W_L)).astype(np.float32) * 0.05
    tensors[f"{src}mlp.fc2.bias"] = np.zeros(W_L, np.float32)

# --- tiny bigG in OpenCLIP layout (width 32) with projection to POOLED ---
pg = clip_mod.CLIP_BIGG_PREFIX
tensors[f"{pg}token_embedding.weight"] = rng.normal(size=(64, W_G)).astype(np.float32) * 0.02
tensors[f"{pg}positional_embedding"] = rng.normal(size=(77, W_G)).astype(np.float32) * 0.02
tensors[f"{pg}ln_final.weight"] = np.ones(W_G, np.float32)
tensors[f"{pg}ln_final.bias"] = np.zeros(W_G, np.float32)
tensors[f"{pg}text_projection"] = rng.normal(size=(W_G, POOLED)).astype(np.float32) * 0.05
for i in range(LAYERS):
    src = f"{pg}transformer.resblocks.{i}."
    for ln in ("ln_1", "ln_2"):
        tensors[f"{src}{ln}.weight"] = np.ones(W_G, np.float32)
        tensors[f"{src}{ln}.bias"] = np.zeros(W_G, np.float32)
    tensors[f"{src}attn.in_proj_weight"] = rng.normal(size=(3 * W_G, W_G)).astype(np.float32) * 0.05
    tensors[f"{src}attn.in_proj_bias"] = np.zeros(3 * W_G, np.float32)
    tensors[f"{src}attn.out_proj.weight"] = rng.normal(size=(W_G, W_G)).astype(np.float32) * 0.05
    tensors[f"{src}attn.out_proj.bias"] = np.zeros(W_G, np.float32)
    tensors[f"{src}mlp.c_fc.weight"] = rng.normal(size=(4 * W_G, W_G)).astype(np.float32) * 0.05
    tensors[f"{src}mlp.c_fc.bias"] = np.zeros(4 * W_G, np.float32)
    tensors[f"{src}mlp.c_proj.weight"] = rng.normal(size=(W_G, 4 * W_G)).astype(np.float32) * 0.05
    tensors[f"{src}mlp.c_proj.bias"] = np.zeros(W_G, np.float32)

# --- tiny VAE encoder (SD layout, 4-ch latents) ---
def conv(name, cin, cout, k):
    tensors[f"first_stage_model.{name}.weight"] = rng.normal(size=(cout, cin, k, k)).astype(np.float32) * 0.05
    tensors[f"first_stage_model.{name}.bias"] = np.zeros(cout, np.float32)

def norm(name, c):
    tensors[f"first_stage_model.{name}.weight"] = np.ones(c, np.float32)
    tensors[f"first_stage_model.{name}.bias"] = np.zeros(c, np.float32)

ch = (8, 8, 16, 16)
conv("encoder.conv_in", 3, ch[0], 3)
cin = ch[0]
for i, cout in enumerate(ch):
    for j in range(2):
        rin = cin if j == 0 else cout
        norm(f"encoder.down.{i}.block.{j}.norm1", rin)
        conv(f"encoder.down.{i}.block.{j}.conv1", rin, cout, 3)
        norm(f"encoder.down.{i}.block.{j}.norm2", cout)
        conv(f"encoder.down.{i}.block.{j}.conv2", cout, cout, 3)
        if rin != cout:
            conv(f"encoder.down.{i}.block.{j}.nin_shortcut", rin, cout, 1)
    if i < len(ch) - 1:
        conv(f"encoder.down.{i}.downsample.conv", cout, cout, 3)
    cin = cout
c = ch[-1]
for blk in ("block_1", "block_2"):
    norm(f"encoder.mid.{blk}.norm1", c)
    conv(f"encoder.mid.{blk}.conv1", c, c, 3)
    norm(f"encoder.mid.{blk}.norm2", c)
    conv(f"encoder.mid.{blk}.conv2", c, c, 3)
norm("encoder.mid.attn_1.norm", c)
for proj in ("q", "k", "v", "proj_out"):
    conv(f"encoder.mid.attn_1.{proj}", c, c, 1)
norm("encoder.norm_out", c)
conv("encoder.conv_out", c, 8, 3)
conv("quant_conv", 8, 8, 1)

# --- tiny VAE decoder (preview-sampling path) ---
conv("post_quant_conv", 4, 4, 1)
conv("decoder.conv_in", 4, ch[-1], 3)
for blk in ("block_1", "block_2"):
    norm(f"decoder.mid.{blk}.norm1", ch[-1])
    conv(f"decoder.mid.{blk}.conv1", ch[-1], ch[-1], 3)
    norm(f"decoder.mid.{blk}.norm2", ch[-1])
    conv(f"decoder.mid.{blk}.conv2", ch[-1], ch[-1], 3)
norm("decoder.mid.attn_1.norm", ch[-1])
for proj in ("q", "k", "v", "proj_out"):
    conv(f"decoder.mid.attn_1.{proj}", ch[-1], ch[-1], 1)
cin = ch[-1]
for i in reversed(range(len(ch))):
    cout = ch[i]
    for j in range(3):
        rin = cin if j == 0 else cout
        norm(f"decoder.up.{i}.block.{j}.norm1", rin)
        conv(f"decoder.up.{i}.block.{j}.conv1", rin, cout, 3)
        norm(f"decoder.up.{i}.block.{j}.norm2", cout)
        conv(f"decoder.up.{i}.block.{j}.conv2", cout, cout, 3)
        if rin != cout:
            conv(f"decoder.up.{i}.block.{j}.nin_shortcut", rin, cout, 1)
    if i != 0:
        conv(f"decoder.up.{i}.upsample.conv", cout, cout, 3)
    cin = cout
norm("decoder.norm_out", cin)
conv("decoder.conv_out", cin, 3, 3)

ckpt = ROOT / "tiny_sdxl.safetensors"
write_streaming(ckpt, tensors)
from dataclasses import asdict
arch_overrides = asdict(arch.TINY)
with open(str(ckpt) + ".arch.json", "w") as f:
    json.dump(arch_overrides, f)
print(f"checkpoint: {ckpt} ({ckpt.stat().st_size/1e6:.1f} MB, "
      f"{len(tensors)} tensors)")

# --- dataset: 4 images with caption sidecars ---
data = ROOT / "data"
data.mkdir(exist_ok=True)
for i in range(4):
    arr = rng.integers(0, 255, size=(200, 160, 3)).astype(np.uint8)
    Image.fromarray(arr).save(data / f"photo_{i}.png")
    (data / f"photo_{i}.txt").write_text(f"a test photo number {i}, colorful noise")
print(f"dataset: {data} (4 images)")

# --- preset JSON (nested GUI schema) ---
sys.path.insert(0, "/root/repo")
from aozora_sdxl_training_tpu.config import schema

flat = {
    "SINGLE_FILE_CHECKPOINT_PATH": str(ckpt),
    "OUTPUT_DIR": str(ROOT / "out"),
    "OUTPUT_NAME": "verify_run",
    "INSTANCE_DATASETS": [{"path": str(data), "repeats": 1}],
    "MAX_TRAIN_STEPS": 2,
    "BATCH_SIZE": 1,
    "GRADIENT_ACCUMULATION_STEPS": 1,
    "SAVE_EVERY_N_STEPS": 2,
    "PREDICTION_TYPE": "v_prediction",
    "SEED": 123,
    "CACHING_BATCH_SIZE": 2,
    "MIXED_PRECISION": "bfloat16",
}
preset = schema.nest_flat_config(flat, "sdxl")
with open(ROOT / "preset.json", "w") as f:
    json.dump(preset, f, indent=1)
print(f"preset: {ROOT/'preset.json'}")
