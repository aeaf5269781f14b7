"""Capture a jax.profiler trace of a training micro-step and print the
top HLO ops by self-time.

Usage:
  python tools_dev/trace_probe.py [model=sdxl|anima] [attn=flash]
      [remat=...] [batch=1] [latent=128] [top=35]

model=sdxl  — full-UNet v-pred micro-step (bench configuration)
model=anima — 2.09B DiT flow-matching micro-step (conservative ckpt)
"""

import sys; sys.path.insert(0, "/root/repo")
import glob
import os
import time

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

args = dict(a.split("=") for a in sys.argv[1:])
model = args.get("model", "sdxl")
attn = args.get("attn", "flash")
remat = args.get("remat", "0" if model == "sdxl" else "conservative")
remat = {"0": False, "1": True}.get(remat, remat)
batch = int(args.get("batch", 1))
latent = int(args.get("latent", 128))
top_n = int(args.get("top", 35))
trace_dir = args.get("dir", "/tmp/aozora_trace")


def build_sdxl_step():
    from aozora_sdxl_training_tpu.models.sdxl.arch import SDXL_BASE
    from aozora_sdxl_training_tpu.models.sdxl.unet import (init_params,
                                                           unet_forward)
    from aozora_sdxl_training_tpu.train import objectives

    cfg = SDXL_BASE
    params = init_params(cfg, jax.random.PRNGKey(0), dtype=jnp.bfloat16)

    def loss_fn(params, latents, noise, tickets, embeds, pooled, time_ids):
        noisy, target, t_cond, _ = objectives.prepare_batch(
            "v_prediction", latents, noise, tickets)
        pred = unet_forward(params, noisy.astype(jnp.bfloat16), t_cond,
                            embeds, pooled, time_ids, cfg=cfg,
                            attn_impl=attn, compute_dtype=jnp.bfloat16,
                            remat=remat)
        return objectives.weighted_mse_loss(pred, target, tickets, None)

    def step(*a):
        loss, grads = jax.value_and_grad(loss_fn)(*a)
        gsq = sum(jnp.sum(g.astype(jnp.float32) ** 2)
                  for g in jax.tree.leaves(grads))
        return loss, jnp.sqrt(gsq)

    key = jax.random.PRNGKey(1)
    inputs = (
        params,
        jax.random.normal(key, (batch, latent, latent, 4), jnp.float32),
        jax.random.normal(jax.random.fold_in(key, 1),
                          (batch, latent, latent, 4), jnp.float32),
        jnp.full((batch,), 500, jnp.int32),
        jax.random.normal(jax.random.fold_in(key, 2), (batch, 77, 2048),
                          jnp.bfloat16),
        jax.random.normal(jax.random.fold_in(key, 3), (batch, 1280),
                          jnp.bfloat16),
        jnp.tile(jnp.asarray([[1024, 1024, 0, 0, 1024, 1024]], jnp.float32),
                 (batch, 1)),
    )
    return jax.jit(step), inputs


def build_anima_step():
    from aozora_sdxl_training_tpu.models.anima import dit as dit_mod
    from aozora_sdxl_training_tpu.train.anima_trainer import (
        make_anima_micro_step)

    cfg = dit_mod.ANIMA_BASE
    params = dit_mod.init_params(cfg, jax.random.PRNGKey(0),
                                 dtype=jnp.bfloat16)
    micro = make_anima_micro_step(cfg, grad_accum_steps=1,
                                  compute_dtype=jnp.bfloat16,
                                  attn_impl=attn, remat=remat)

    def step(p, lat, pe, t5, tk):
        ga = jax.tree.map(lambda x: jnp.zeros(x.shape, jnp.float32), p)
        loss, _, acc = micro(p, {}, ga, lat, pe, t5, tk,
                             jnp.ones((batch,), jnp.float32), None,
                             jnp.ones((1000,), jnp.float32),
                             jnp.asarray(7, jnp.int32),
                             jnp.asarray(1, jnp.int32),
                             jnp.asarray(0.0, jnp.float32))
        gsq = sum(jnp.sum(g.astype(jnp.float32) ** 2)
                  for g in jax.tree.leaves(acc))
        return loss, jnp.sqrt(gsq)

    key = jax.random.PRNGKey(1)
    inputs = (
        params,
        jax.random.normal(key, (batch, latent, latent, cfg.in_channels),
                          jnp.float32),
        jax.random.normal(jax.random.fold_in(key, 1),
                          (batch, 512, cfg.adapter_source_dim), jnp.bfloat16),
        jax.random.randint(jax.random.fold_in(key, 2), (batch, 512), 1,
                           cfg.adapter_vocab, jnp.int32),
        jnp.full((batch,), 500, jnp.int32),
    )
    return jax.jit(step), inputs


step_fn, inputs = (build_anima_step() if model == "anima"
                   else build_sdxl_step())

t0 = time.perf_counter()
loss, gnorm = step_fn(*inputs)
jax.block_until_ready(gnorm)
print(f"compile {time.perf_counter()-t0:.1f}s loss={float(loss):.4f}",
      flush=True)

os.makedirs(trace_dir, exist_ok=True)
with jax.profiler.trace(trace_dir):
    for _ in range(4):
        loss, gnorm = step_fn(*inputs)
    jax.block_until_ready(gnorm)
print("trace captured", flush=True)

xplanes = sorted(glob.glob(f"{trace_dir}/**/*.xplane.pb", recursive=True),
                 key=os.path.getmtime)
if not xplanes:
    raise SystemExit(f"no xplane.pb under {trace_dir}")
xplane = xplanes[-1]
print(f"parsing {xplane}", flush=True)

# tensorboard_plugin_profile 2.13's convert module is import-broken against
# this box's protobuf/TF; TF 2.21's pywrap plugin parses xspace directly.
from tensorflow.python.profiler.internal import _pywrap_profiler_plugin as pp

data, ok = pp.xspace_to_tools_data([xplane], "hlo_stats", {})
if isinstance(data, bytes):
    data = data.decode("utf-8", "replace")
import collections
import json as _json

d = _json.loads(data)
rows = [[c.get("v") for c in r["c"]] for r in d["rows"]]
cat_time = collections.Counter()
op_time = collections.Counter()
total = 0.0
for r in rows:
    self_us = float(r[9] or 0)
    cat_time[r[2]] += self_us
    op_time[(r[2], str(r[3])[:60])] += self_us
    total += self_us
n_steps = 4
print(f"total self time: {total/1e3:.1f} ms ({total/n_steps/1e3:.1f} ms/step"
      f" over {n_steps} steps)")
print("\n-- by HLO category --")
for kcat, v in cat_time.most_common(15):
    print(f"{v/n_steps/1e3:8.2f} ms/step  {100*v/total:5.1f}%  {kcat}")
print(f"\n-- top {top_n} ops by self time --")
for (kcat, name), v in op_time.most_common(top_n):
    print(f"{v/n_steps/1e3:8.2f} ms/step  {kcat:26s} {name}")
