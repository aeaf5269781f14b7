"""Perf probe: time SDXL UNet micro-step variants on the real chip.

Usage: python tools_dev/perf_probe.py remat=0 batch=1 attn=flash latent=128
"""

import sys; sys.path.insert(0, "/root/repo")
import sys
import time

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

args = dict(a.split("=") for a in sys.argv[1:])
remat_raw = str(args.get("remat", "1"))
remat = {"0": False, "1": True}.get(remat_raw, remat_raw)
batch = int(args.get("batch", 1))
attn = args.get("attn", "flash")
latent = int(args.get("latent", 128))
fused_gn = bool(int(args.get("fused_gn", 0)))
import os
if "hires" in args:
    os.environ["AOZORA_REMAT_HIRES_TOKENS"] = str(int(args["hires"]))
if "full_tokens" in args:  # 3-tier remat: FULL remat at/above this count
    os.environ["AOZORA_REMAT_FULL_TOKENS"] = str(int(args["full_tokens"]))
if "min_kv" in args:
    os.environ["AOZORA_FLASH_MIN_KV"] = str(int(args["min_kv"]))

from aozora_sdxl_training_tpu.models.sdxl.arch import SDXL_BASE
from aozora_sdxl_training_tpu.models.sdxl.unet import init_params, unet_forward
from aozora_sdxl_training_tpu.train import objectives

cfg = SDXL_BASE
params = init_params(cfg, jax.random.PRNGKey(0), dtype=jnp.bfloat16)


def loss_fn(params, latents, noise, tickets, embeds, pooled, time_ids):
    noisy, target, t_cond, _ = objectives.prepare_batch(
        "v_prediction", latents, noise, tickets)
    pred = unet_forward(params, noisy.astype(jnp.bfloat16), t_cond, embeds,
                        pooled, time_ids, cfg=cfg, attn_impl=attn,
                        compute_dtype=jnp.bfloat16, remat=remat,
                        fused_gn=fused_gn)
    return objectives.weighted_mse_loss(pred, target, tickets, None)


value_and_grad = jax.value_and_grad(loss_fn)

norm_impl = args.get("norm", "cast")


def _step(*a):
    loss, grads = value_and_grad(*a)
    if norm_impl == "acc32":
        # fp32-accumulator reduce over bf16 grads: no fp32 materialization
        # (trace showed the cast-then-square path costing ~54 ms/step)
        gsq = sum(jnp.sum(g * g, dtype=jnp.float32)
                  for g in jax.tree.leaves(grads))
    else:
        gsq = sum(jnp.sum(g.astype(jnp.float32) ** 2)
                  for g in jax.tree.leaves(grads))
    return loss, jnp.sqrt(gsq)

grad_fn = jax.jit(_step)
key = jax.random.PRNGKey(1)
inputs = (
    params,
    jax.random.normal(key, (batch, latent, latent, 4), jnp.float32),
    jax.random.normal(jax.random.fold_in(key, 1),
                      (batch, latent, latent, 4), jnp.float32),
    jnp.full((batch,), 500, jnp.int32),
    jax.random.normal(jax.random.fold_in(key, 2), (batch, 77, 2048), jnp.bfloat16),
    jax.random.normal(jax.random.fold_in(key, 3), (batch, 1280), jnp.bfloat16),
    jnp.tile(jnp.asarray([[1024, 1024, 0, 0, 1024, 1024]], jnp.float32),
             (batch, 1)),
)

t0 = time.perf_counter()
loss, gnorm = grad_fn(*inputs)
jax.block_until_ready(gnorm)
print(f"compile {time.perf_counter()-t0:.1f}s loss={float(loss):.4f}", flush=True)

iters = 10
t0 = time.perf_counter()
for _ in range(iters):
    loss, gnorm = grad_fn(*inputs)
jax.block_until_ready(gnorm)
dt = (time.perf_counter() - t0) / iters
try:
    cost = grad_fn.lower(*inputs).compile().cost_analysis()
    if isinstance(cost, list):
        cost = cost[0]
    flops = float(cost.get("flops", 0))
except Exception:
    flops = 0
mfu = flops / dt / 197e12 if flops else float("nan")
mem = jax.devices()[0].memory_stats() or {}
peak = mem.get("peak_bytes_in_use", 0) / 1e9
hires_lbl = args.get("hires", "-")
minkv_lbl = args.get("min_kv", "-")
print(f"remat={remat} batch={batch} attn={attn} latent={latent} fused_gn={fused_gn} hires={hires_lbl} min_kv={minkv_lbl}: "
      f"{dt*1e3:.1f}ms/step {dt/batch:.4f}s/img MFU~{mfu:.1%} "
      f"peakHBM={peak:.1f}GB", flush=True)
