"""Build a FULL-SIZE random-init SDXL single-file checkpoint + 1024px
dataset for driving the real training CLI on the actual TPU chip.

The checkpoint is architecturally identical to a stock SDXL single-file
checkpoint (full 2.57B UNet in SD key layout + 12-layer CLIP-L + 32-layer
OpenCLIP bigG + SD VAE encoder), stored in bf16 (~6.5 GB), so the CLI's
caching pass, trainer, merge-back save, and resume all run at production
shapes end-to-end.  Weights are random-init — the point is the memory/
performance circuit (VERDICT r2 #1), not sample quality.

    python tools_dev/make_fullsize_env_sdxl.py /tmp/fullsize_env [n_images]
"""

import json
import sys
from pathlib import Path

sys.path.insert(0, "/root/repo")

import ml_dtypes
import numpy as np
from PIL import Image

ROOT = Path(sys.argv[1] if len(sys.argv) > 1 else "/tmp/fullsize_env")
N_IMAGES = int(sys.argv[2]) if len(sys.argv) > 2 else 8
ROOT.mkdir(parents=True, exist_ok=True)
rng = np.random.default_rng(0)
BF16 = np.dtype(ml_dtypes.bfloat16)


def make_tensors():
    """Yield (name, lazy-tuple) pairs; arrays are produced one at a time so
    the writer streams at ~one-tensor residency."""
    from aozora_sdxl_training_tpu.ckpt.sd_keys import unet_key_mapping
    from aozora_sdxl_training_tpu.models.sdxl import arch, clip as clip_mod

    def t(shape, std=None):
        shape = tuple(int(s) for s in shape)
        if std is None:
            fan_in = int(np.prod(shape[1:])) if len(shape) > 1 else shape[0]
            std = (1.0 / max(fan_in, 1)) ** 0.5
        def produce(std=std, shape=shape):
            return (rng.standard_normal(shape, dtype=np.float32) * std
                    ).astype(BF16)
        return (shape, BF16, produce)

    def zeros(shape):
        shape = tuple(int(s) for s in shape)
        return (shape, BF16, lambda: np.zeros(shape, BF16))

    def ones(shape):
        shape = tuple(int(s) for s in shape)
        return (shape, BF16, lambda: np.ones(shape, BF16))

    # ---- UNet: enumerate TPU-layout shapes, emit SD keys in torch layout
    cfg = arch.SDXL_BASE
    shapes = arch.param_shapes(cfg)
    mapping = unet_key_mapping(list(shapes.keys()))  # hf -> sd key
    for hf_key, (shape, kind) in shapes.items():
        sd_key = mapping[hf_key]
        if hf_key.endswith(".bias"):
            yield sd_key, zeros(shape)
        elif kind == "norm":
            yield sd_key, ones(shape)
        else:
            # torch layout: invert the TPU layout transform on the SHAPE
            if kind == "conv":
                tshape = (shape[3], shape[2], shape[0], shape[1])
            elif kind == "linear":
                tshape = (shape[1], shape[0])
            else:
                tshape = shape
            yield sd_key, t(tshape)

    # ---- CLIP-L (HF layout, 12 layers, width 768)
    W, L, V = 768, 12, 49408
    p = clip_mod.CLIP_L_PREFIX
    yield f"{p}embeddings.token_embedding.weight", t((V, W), 0.02)
    yield f"{p}embeddings.position_embedding.weight", t((77, W), 0.02)
    yield f"{p}final_layer_norm.weight", ones((W,))
    yield f"{p}final_layer_norm.bias", zeros((W,))
    for i in range(L):
        src = f"{p}encoder.layers.{i}."
        for ln in ("layer_norm1", "layer_norm2"):
            yield f"{src}{ln}.weight", ones((W,))
            yield f"{src}{ln}.bias", zeros((W,))
        for proj in ("self_attn.q_proj", "self_attn.k_proj",
                     "self_attn.v_proj", "self_attn.out_proj"):
            yield f"{src}{proj}.weight", t((W, W), 0.02)
            yield f"{src}{proj}.bias", zeros((W,))
        yield f"{src}mlp.fc1.weight", t((4 * W, W), 0.02)
        yield f"{src}mlp.fc1.bias", zeros((4 * W,))
        yield f"{src}mlp.fc2.weight", t((W, 4 * W), 0.02)
        yield f"{src}mlp.fc2.bias", zeros((W,))

    # ---- bigG (OpenCLIP layout, 32 layers, width 1280)
    W, L = 1280, 32
    g = clip_mod.CLIP_BIGG_PREFIX
    yield f"{g}token_embedding.weight", t((V, W), 0.02)
    yield f"{g}positional_embedding", t((77, W), 0.02)
    yield f"{g}ln_final.weight", ones((W,))
    yield f"{g}ln_final.bias", zeros((W,))
    yield f"{g}text_projection", t((W, W), 0.02)
    for i in range(L):
        src = f"{g}transformer.resblocks.{i}."
        for ln in ("ln_1", "ln_2"):
            yield f"{src}{ln}.weight", ones((W,))
            yield f"{src}{ln}.bias", zeros((W,))
        yield f"{src}attn.in_proj_weight", t((3 * W, W), 0.02)
        yield f"{src}attn.in_proj_bias", zeros((3 * W,))
        yield f"{src}attn.out_proj.weight", t((W, W), 0.02)
        yield f"{src}attn.out_proj.bias", zeros((W,))
        yield f"{src}mlp.c_fc.weight", t((4 * W, W), 0.02)
        yield f"{src}mlp.c_fc.bias", zeros((4 * W,))
        yield f"{src}mlp.c_proj.weight", t((W, 4 * W), 0.02)
        yield f"{src}mlp.c_proj.bias", zeros((W,))

    # ---- SD VAE encoder (full size: ch 128/256/512/512, z=4)
    def conv(name, cin, cout, k):
        yield f"first_stage_model.{name}.weight", t((cout, cin, k, k), 0.02)
        yield f"first_stage_model.{name}.bias", zeros((cout,))

    def norm(name, c):
        yield f"first_stage_model.{name}.weight", ones((c,))
        yield f"first_stage_model.{name}.bias", zeros((c,))

    ch = (128, 256, 512, 512)
    yield from conv("encoder.conv_in", 3, ch[0], 3)
    cin = ch[0]
    for i, cout in enumerate(ch):
        for j in range(2):
            rin = cin if j == 0 else cout
            yield from norm(f"encoder.down.{i}.block.{j}.norm1", rin)
            yield from conv(f"encoder.down.{i}.block.{j}.conv1", rin, cout, 3)
            yield from norm(f"encoder.down.{i}.block.{j}.norm2", cout)
            yield from conv(f"encoder.down.{i}.block.{j}.conv2", cout, cout, 3)
            if rin != cout:
                yield from conv(f"encoder.down.{i}.block.{j}.nin_shortcut",
                                rin, cout, 1)
        if i < len(ch) - 1:
            yield from conv(f"encoder.down.{i}.downsample.conv", cout, cout, 3)
        cin = cout
    c = ch[-1]
    for blk in ("block_1", "block_2"):
        yield from norm(f"encoder.mid.{blk}.norm1", c)
        yield from conv(f"encoder.mid.{blk}.conv1", c, c, 3)
        yield from norm(f"encoder.mid.{blk}.norm2", c)
        yield from conv(f"encoder.mid.{blk}.conv2", c, c, 3)
    yield from norm("encoder.mid.attn_1.norm", c)
    for proj in ("q", "k", "v", "proj_out"):
        yield from conv(f"encoder.mid.attn_1.{proj}", c, c, 1)
    yield from norm("encoder.norm_out", c)
    yield from conv("encoder.conv_out", c, 8, 3)
    yield from conv("quant_conv", 8, 8, 1)


def main():
    from aozora_sdxl_training_tpu.ckpt.safetensors_io import write_streaming
    from aozora_sdxl_training_tpu.config import schema

    ckpt = ROOT / "fullsize_sdxl.safetensors"
    if not ckpt.exists():
        tensors = dict(make_tensors())
        print(f"writing {len(tensors)} tensors (streaming, bf16)...")
        write_streaming(ckpt, tensors)
    print(f"checkpoint: {ckpt} ({ckpt.stat().st_size / 1e9:.2f} GB)")

    data = ROOT / "data"
    data.mkdir(exist_ok=True)
    for i in range(N_IMAGES):
        path = data / f"img_{i}.png"
        if path.exists():
            continue
        # smooth random fields (fast to encode, compresses reasonably)
        small = rng.integers(0, 255, size=(64, 64, 3)).astype(np.uint8)
        img = Image.fromarray(small).resize((1024, 1024), Image.BICUBIC)
        img.save(path)
        (data / f"img_{i}.txt").write_text(
            f"synthetic color field number {i}, smooth gradients")
    print(f"dataset: {data} ({N_IMAGES} images @1024px)")

    flat = {
        "SINGLE_FILE_CHECKPOINT_PATH": str(ckpt),
        "OUTPUT_DIR": str(ROOT / "out"),
        "OUTPUT_NAME": "fullsize_run",
        "INSTANCE_DATASETS": [{"path": str(data), "repeats": 1}],
        "MAX_TRAIN_STEPS": 60,
        "BATCH_SIZE": 1,
        "GRADIENT_ACCUMULATION_STEPS": 1,
        "SAVE_EVERY_N_STEPS": 50,
        "PREDICTION_TYPE": "v_prediction",
        "SEED": 123,
        "CACHING_BATCH_SIZE": 2,
        "MIXED_PRECISION": "bfloat16",
        # the reference's low-memory optimizer (bnb paged 8-bit AdamW)
        "OPTIMIZER_TYPE": "paged_adamw_8bit",
        "LR_CUSTOM_CURVE": [[0.0, 4.0e-7], [1.0, 4.0e-7]],
        "MAX_BUCKET_RESOLUTION": 1024,
    }
    preset = schema.nest_flat_config(flat, "sdxl")
    with open(ROOT / "preset.json", "w") as f:
        json.dump(preset, f, indent=1)
    print(f"preset: {ROOT / 'preset.json'}")


if __name__ == "__main__":
    main()
