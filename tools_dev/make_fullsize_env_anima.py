"""Build a FULL-SIZE random-init Anima environment for driving the real
Anima training CLI on the actual TPU chip.

Mirrors tools_dev/make_fullsize_env_sdxl.py for the second model family:
a production-shape 2.09B Anima DiT (28 x 2048, patch 2x2x1, torch key
layout under ``pipe.dit.``), a full Qwen3-0.6B text-encoder checkpoint
(HF layout) and a full Wan causal-3D VAE (encoder + decoder, torch OIHW),
all bf16 random-init, plus a 1024px dataset and a nested preset JSON — so
`cli.train_anima` runs its caching pass, trainer, streaming save and
resume at production shapes end-to-end (the point is the memory/
performance circuit, not sample quality; reference counterpart:
train_anima.py:1724 run_anima_dit_training).

    python tools_dev/make_fullsize_env_anima.py /tmp/fullsize_anima [n_images]
"""

import json
import sys
from pathlib import Path

sys.path.insert(0, "/root/repo")

import ml_dtypes
import numpy as np
from PIL import Image

import jax

# random-init never needs the chip; forcing CPU also keeps the build alive
# through axon tunnel flaps
jax.config.update("jax_platforms", "cpu")

ROOT = Path(sys.argv[1] if len(sys.argv) > 1 else "/tmp/fullsize_anima")
N_IMAGES = int(sys.argv[2]) if len(sys.argv) > 2 else 8
ROOT.mkdir(parents=True, exist_ok=True)
rng = np.random.default_rng(0)
BF16 = np.dtype(ml_dtypes.bfloat16)


def lazy_normal(shape, std):
    shape = tuple(int(s) for s in shape)

    def produce(shape=shape, std=std):
        return (rng.standard_normal(shape, dtype=np.float32) * std
                ).astype(BF16)

    return (shape, BF16, produce)


def lazy_fill(shape, value):
    shape = tuple(int(s) for s in shape)
    return (shape, BF16, lambda: np.full(shape, value, BF16))


def dit_tensors():
    """Full ANIMA_BASE DiT in the torch checkpoint layout the loader's
    prefix autodetect expects (models/anima/dit.py params_to_torch_state:
    2-D non-embed weights transposed to (out, in))."""
    from aozora_sdxl_training_tpu.models.anima import dit as dit_mod

    shapes = dit_mod.param_shapes(dit_mod.ANIMA_BASE)
    for name, shape in sorted(shapes.items()):
        key = f"pipe.dit.{name}"
        if name.endswith(".bias"):
            yield key, lazy_fill(shape, 0.0)
        elif len(shape) == 1:
            yield key, lazy_fill(shape, 1.0)
        else:
            # init std follows dit.init_params: 1/sqrt(jax fan-in dim)
            std = (1.0 / max(shape[0], 1)) ** 0.5
            tshape = shape
            if len(shape) == 2 and not name.endswith("embed.weight"):
                tshape = (shape[1], shape[0])
            yield key, lazy_normal(tshape, std)


def qwen3_tensors():
    from aozora_sdxl_training_tpu.models.anima import qwen3

    shapes = qwen3.param_shapes(qwen3.QWEN3_0_6B)
    for name, shape in sorted(shapes.items()):
        if len(shape) == 1:
            yield name, lazy_fill(shape, 1.0)
        else:
            std = (1.0 / max(shape[0], 1)) ** 0.5
            tshape = shape
            if name != "model.embed_tokens.weight":
                tshape = (shape[1], shape[0])
            yield name, lazy_normal(tshape, std)


def wan_vae_tensors():
    """Full Wan VAE (encoder, temporal kernels, decoder) via the real
    initializer, converted to the torch conv layouts loader expects."""
    from aozora_sdxl_training_tpu.models.anima import wan_vae

    cfg = wan_vae.WAN_VAE
    for half_key, params in (
            ("enc", wan_vae.init_params(cfg, jax.random.PRNGKey(13),
                                        video=True)),
            ("dec", wan_vae.init_decoder_params(cfg, jax.random.PRNGKey(14)))):
        for name, arr in params.items():
            a = np.asarray(arr)
            if a.ndim == 5:                   # (kt,kh,kw,I,O) -> (O,I,kt,kh,kw)
                a = np.transpose(a, (4, 3, 0, 1, 2))
            elif a.ndim == 4:                 # HWIO -> OIHW
                a = np.transpose(a, (3, 2, 0, 1))
            yield name, np.ascontiguousarray(a.astype(BF16))


def main():
    from aozora_sdxl_training_tpu.ckpt.safetensors_io import write_streaming
    from aozora_sdxl_training_tpu.config import schema

    dit_path = ROOT / "fullsize_dit.safetensors"
    if not dit_path.exists():
        tensors = dict(dit_tensors())
        print(f"writing DiT: {len(tensors)} tensors (streaming, bf16)...",
              flush=True)
        write_streaming(dit_path, tensors)
    print(f"dit: {dit_path} ({dit_path.stat().st_size / 1e9:.2f} GB)")

    q_path = ROOT / "fullsize_qwen3.safetensors"
    if not q_path.exists():
        tensors = dict(qwen3_tensors())
        print(f"writing Qwen3: {len(tensors)} tensors...", flush=True)
        write_streaming(q_path, tensors)
    print(f"qwen3: {q_path} ({q_path.stat().st_size / 1e9:.2f} GB)")

    v_path = ROOT / "fullsize_wan_vae.safetensors"
    if not v_path.exists():
        tensors = dict(wan_vae_tensors())
        print(f"writing Wan VAE: {len(tensors)} tensors...", flush=True)
        write_streaming(v_path, tensors)
    print(f"vae: {v_path} ({v_path.stat().st_size / 1e9:.2f} GB)")

    data = ROOT / "data"
    data.mkdir(exist_ok=True)
    for i in range(N_IMAGES):
        path = data / f"img_{i}.png"
        if path.exists():
            continue
        small = rng.integers(0, 255, size=(64, 64, 3)).astype(np.uint8)
        img = Image.fromarray(small).resize((1024, 1024), Image.BICUBIC)
        img.save(path)
        (data / f"img_{i}.txt").write_text(
            f"synthetic color field number {i}, smooth gradients")
    print(f"dataset: {data} ({N_IMAGES} images @1024px)")

    flat = {
        "TRAINING_MODE": "Anima DiT",
        "DIT_PATH": str(dit_path),
        "TEXT_ENCODER_PATH": str(q_path),
        "DIT_VAE_PATH": str(v_path),
        "OUTPUT_DIR": str(ROOT / "out"),
        "OUTPUT_NAME": "fullsize_anima",
        "INSTANCE_DATASETS": [{"path": str(data), "repeats": 1}],
        "MAX_TRAIN_STEPS": 60,
        "BATCH_SIZE": 1,
        "GRADIENT_ACCUMULATION_STEPS": 1,
        "SAVE_EVERY_N_STEPS": 50,
        "SEED": 123,
        "CACHING_BATCH_SIZE": 1,
        "MIXED_PRECISION": "bfloat16",
        "LR_CUSTOM_CURVE": [[0.0, 4.0e-7], [1.0, 4.0e-7]],
        "MAX_BUCKET_RESOLUTION": 1024,
        "VAE_CACHING_TILED": False,
        "ANIMA_DIT_SAVE_PREFIX": "auto",
    }
    preset = schema.nest_flat_config(flat, "anima")
    with open(ROOT / "preset.json", "w") as f:
        json.dump(preset, f, indent=1)
    print(f"preset: {ROOT / 'preset.json'}")


if __name__ == "__main__":
    main()
