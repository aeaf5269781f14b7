"""Perf probe: full-size Anima DiT flow-matching micro-step on the real chip.

2B-param DiT (28 x 2048, head_dim 128) at image mode 1024px: 128x128x16
latents -> patchify 2x2 -> 4096 tokens, 512-token adapter context.

Usage: python tools_dev/anima_perf_probe.py remat=1 attn=flash batch=1 \
           [latent=128] [min_kv=2048] [ctx=512]
remat: 0=off, 1=full, conservative=save-mlp_down policy
"""

import sys; sys.path.insert(0, "/root/repo")
import os
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
ctx_tokens = int(args.get("ctx", 512))
frames = int(args.get("frames", 0))  # latent frames T' (0 = image mode)
if "min_kv" in args:
    os.environ["AOZORA_FLASH_MIN_KV"] = str(int(args["min_kv"]))

from aozora_sdxl_training_tpu.models.anima import dit as dit_mod
from aozora_sdxl_training_tpu.train.anima_trainer import make_anima_micro_step

cfg = dit_mod.ANIMA_BASE
params = dit_mod.init_params(cfg, jax.random.PRNGKey(0), dtype=jnp.bfloat16)
n_params = sum(int(p.size) for p in params.values())
print(f"DiT params: {n_params/1e9:.2f}B", flush=True)

micro = make_anima_micro_step(cfg, grad_accum_steps=1,
                              compute_dtype=jnp.bfloat16, attn_impl=attn,
                              remat=remat)


def step(trainable, latents, prompt_emb, t5_ids, tickets, sample_mask,
         loss_weights, seed, micro_step_i, zero):
    # reduce the grad pytree to a norm in-jit (see bench.py: never return
    # multi-GB grads from a step on the 16 GB chip)
    ga = jax.tree.map(lambda p: jnp.zeros(p.shape, jnp.float32), trainable)
    loss, sigma0, accum = micro(trainable, {}, ga, latents, prompt_emb,
                                t5_ids, tickets, sample_mask, None,
                                loss_weights, seed, micro_step_i, zero)
    gsq = sum(jnp.sum(g.astype(jnp.float32) ** 2)
              for g in jax.tree.leaves(accum))
    return loss, jnp.sqrt(gsq)


grad_fn = jax.jit(step)
key = jax.random.PRNGKey(1)
lat_shape = ((batch, frames, latent, latent, cfg.in_channels) if frames
             else (batch, latent, latent, cfg.in_channels))
inputs = (
    params,
    jax.random.normal(key, lat_shape, jnp.float32),
    jax.random.normal(jax.random.fold_in(key, 1),
                      (batch, ctx_tokens, cfg.adapter_source_dim),
                      jnp.bfloat16),
    jax.random.randint(jax.random.fold_in(key, 2), (batch, ctx_tokens), 1,
                       cfg.adapter_vocab, jnp.int32),
    jnp.full((batch,), 500, jnp.int32),
    jnp.ones((batch,), jnp.float32),
    jnp.ones((1000,), jnp.float32),
    jnp.asarray(7, jnp.int32),
    jnp.asarray(1, jnp.int32),
    jnp.asarray(0.0, jnp.float32),
)

t0 = time.perf_counter()
loss, gnorm = grad_fn(*inputs)
jax.block_until_ready(gnorm)
print(f"compile {time.perf_counter()-t0:.1f}s loss={float(loss):.4f}",
      flush=True)

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
print(f"[anima] remat={remat} batch={batch} attn={attn} latent={latent} "
      f"frames={frames or 1} ctx={ctx_tokens} "
      f"min_kv={args.get('min_kv', '-')}: "
      f"{dt*1e3:.1f}ms/step {dt/batch:.4f}s/clip MFU~{mfu:.1%}", flush=True)
