"""Unit probe: time ONE remated SDXL transformer2d unit (projections +
self/cross attention + GEGLU) fwd+bwd on the real chip, xla vs flash.

The e2e sweep showed flash losing at the 64x64 level while the isolated
attention microbench says it should win — this probe reproduces the
*in-context* conditions (remat policy, layout transposes, surrounding
matmuls) at single-unit scale so the discrepancy can be localized.

Usage: python tools_dev/unit_probe.py [tokens=4096] [dim=640] [heads=10]
       [depth=2] [remat=dots_no_logits] [iters=10]
"""

import sys; sys.path.insert(0, "/root/repo")
import time

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

args = dict(a.split("=") for a in sys.argv[1:])
tokens = int(args.get("tokens", 4096))
dim = int(args.get("dim", 640))
heads = int(args.get("heads", 10))
depth = int(args.get("depth", 2))
remat_mode = args.get("remat", "dots_no_logits")
iters = int(args.get("iters", 10))

from aozora_sdxl_training_tpu.models.sdxl.arch import SDXL_BASE
from aozora_sdxl_training_tpu.models.sdxl import unet as unet_mod

hw = int(tokens ** 0.5)
assert hw * hw == tokens

key = jax.random.PRNGKey(0)


def make_params(prefix):
    """transformer2d params at SDXL shapes (norm+proj_in/out + blocks)."""
    p = {}
    d = dim
    init = jax.nn.initializers.normal(0.02)
    state = {"key": key}

    def add(name, shape, bias_shape=None):
        state["key"] = jax.random.fold_in(state["key"],
                                          hash(name) % (1 << 30))
        p[f"{prefix}.{name}.weight"] = init(state["key"], shape, jnp.bfloat16)
        if bias_shape is not None:
            p[f"{prefix}.{name}.bias"] = jnp.zeros(bias_shape, jnp.bfloat16)

    p[f"{prefix}.norm.weight"] = jnp.ones((d,), jnp.bfloat16)
    p[f"{prefix}.norm.bias"] = jnp.zeros((d,), jnp.bfloat16)
    add("proj_in", (d, d), (d,))
    for i in range(depth):
        b = f"transformer_blocks.{i}"
        for ln in ("norm1", "norm2", "norm3"):
            p[f"{prefix}.{b}.{ln}.weight"] = jnp.ones((d,), jnp.bfloat16)
            p[f"{prefix}.{b}.{ln}.bias"] = jnp.zeros((d,), jnp.bfloat16)
        add(f"{b}.attn1.to_q", (d, d))
        add(f"{b}.attn1.to_k", (d, d))
        add(f"{b}.attn1.to_v", (d, d))
        add(f"{b}.attn1.to_out.0", (d, d), (d,))
        add(f"{b}.attn2.to_q", (d, d))
        add(f"{b}.attn2.to_k", (2048, d))
        add(f"{b}.attn2.to_v", (2048, d))
        add(f"{b}.attn2.to_out.0", (d, d), (d,))
        add(f"{b}.ff.net.0.proj", (d, 8 * d), (8 * d,))
        add(f"{b}.ff.net.2", (4 * d, d), (d,))
    add("proj_out", (d, d), (d,))
    return p


params = make_params("unit")
x = jax.random.normal(jax.random.fold_in(key, 1), (1, hw, hw, dim), jnp.bfloat16)
ctx = jax.random.normal(jax.random.fold_in(key, 2), (1, 77, 2048), jnp.bfloat16)

for attn_impl in ("xla", "flash"):
    def unit(p, x, ctx, impl=attn_impl):
        fn = unet_mod._maybe_remat(
            lambda p_, pref, h, c: unet_mod.transformer2d(
                p_, pref, h, c, depth=depth, num_heads=heads, groups=32,
                attn_impl=impl),
            remat_mode)
        return fn(p, "unit", x, ctx)

    def loss(p, x, ctx):
        return jnp.sum(unit(p, x, ctx).astype(jnp.float32) ** 2) * 1e-6

    gfn = jax.value_and_grad(loss)

    def chained(p, x, ctx):
        def body(carry, _):
            l, g = gfn(p, carry, ctx)
            gx = jax.tree.leaves(g)[0]
            return carry * 1.0 + 1e-12 * jnp.mean(
                gx.astype(jnp.float32)).astype(carry.dtype), l
        x2, losses = jax.lax.scan(body, x, None, length=iters)
        return losses

    run = jax.jit(chained)
    t0 = time.perf_counter()
    losses = run(params, x, ctx)
    float(losses[-1])
    compile_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    losses = run(params, x, ctx)
    float(losses[-1])
    dt = (time.perf_counter() - t0) / iters
    print(f"unit tokens={tokens} dim={dim} heads={heads} depth={depth} "
          f"remat={remat_mode} attn={attn_impl}: {dt*1e3:.2f} ms/iter "
          f"(compile {compile_s:.0f}s)", flush=True)
