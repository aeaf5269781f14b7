"""Caching-pass throughput probe: SDXL VAE encoder images/s on the chip.

The reference's caching phase runs diffusers AutoencoderKL.encode on GPU
batches (train.py:1852-1921); this measures our jitted NHWC encoder at
full SD-VAE size (ch 128/256/512/512) on real hardware.

Usage: python tools_dev/cache_probe.py [batch=8] [px=1024] [iters=5]
"""

import sys; sys.path.insert(0, "/root/repo")
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

args = dict(a.split("=") for a in sys.argv[1:])
batch = int(args.get("batch", 8))
px = int(args.get("px", 1024))
iters = int(args.get("iters", 5))
attn = args.get("attn", "flash")

from aozora_sdxl_training_tpu.models.sdxl import vae as vae_mod

rng = np.random.default_rng(0)
ch = (128, 256, 512, 512)
z = 4
sd = {}


def conv(name, cin, cout, k):
    sd[f"first_stage_model.{name}.weight"] = (
        rng.normal(size=(cout, cin, k, k)).astype(np.float32) * 0.02)
    sd[f"first_stage_model.{name}.bias"] = np.zeros(cout, np.float32)


def norm(name, c):
    sd[f"first_stage_model.{name}.weight"] = np.ones(c, np.float32)
    sd[f"first_stage_model.{name}.bias"] = np.zeros(c, np.float32)


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
conv("encoder.conv_out", c, 2 * z, 3)
conv("quant_conv", 2 * z, 2 * z, 1)

params = vae_mod.params_from_sd_state(sd, dtype=jnp.bfloat16)
n_par = sum(int(p.size) for p in params.values())
print(f"encoder params: {n_par/1e6:.1f}M", flush=True)

enc = jax.jit(lambda px_: vae_mod.encoder_forward(
    params, px_, compute_dtype=jnp.bfloat16, attn_impl=attn))
pixels = jax.random.normal(jax.random.PRNGKey(0), (batch, px, px, 3),
                           jnp.float32)

t0 = time.perf_counter()
lat = enc(pixels)
jax.block_until_ready(lat)
print(f"compile {time.perf_counter()-t0:.1f}s out={lat.shape}", flush=True)

t0 = time.perf_counter()
for _ in range(iters):
    lat = enc(pixels)
jax.block_until_ready(lat)
dt = (time.perf_counter() - t0) / iters
print(f"[vae-encode] batch={batch} {px}px attn={attn}: "
      f"{dt*1e3:.1f} ms/batch = {batch/dt:.1f} images/s/chip", flush=True)
