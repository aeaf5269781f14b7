"""Attention microbench: Pallas flash kernel vs XLA einsum attention,
fwd+bwd, at the shapes SDXL/Anima actually run.

Usage: python tools_dev/attn_probe.py [impl=both] [bq=256] [bk=512]
"""

import sys; sys.path.insert(0, "/root/repo")
import functools
import time

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

args = dict(a.split("=") for a in sys.argv[1:])
impl_filter = args.get("impl", "both")
if "bq" in args or "bk" in args:
    from aozora_sdxl_training_tpu.ops import flash_attention as fa
    if "bq" in args:
        fa.DEFAULT_BLOCK_Q = int(args["bq"])
    if "bk" in args:
        fa.DEFAULT_BLOCK_K = int(args["bk"])

from aozora_sdxl_training_tpu.ops.attention import attention

# (label, B, H, Sq, Skv, D) — SDXL 1024px levels + cross attn + Anima DiT
SHAPES = [
    ("sdxl-self-L2", 1, 10, 4096, 4096, 64),
    ("sdxl-self-L3", 1, 20, 1024, 1024, 64),
    ("sdxl-cross-L2", 1, 10, 4096, 77, 64),
    ("sdxl-cross-L3", 1, 20, 1024, 77, 64),
    ("dit-self", 1, 16, 4096, 4096, 128),
    ("dit-cross", 1, 16, 4096, 512, 128),
]


def bench(fn, *xs, iters=20):
    # chain iterations with a data dependency so nothing can be elided or
    # overlapped: each step perturbs q with the previous step's grad
    def chained(q, k, v):
        def body(carry, _):
            l, gq = fn(carry, k, v)
            return carry + gq.astype(carry.dtype) * 1e-12, l
        q, losses = jax.lax.scan(body, q, None, length=iters)
        return q, losses

    run = jax.jit(chained)
    _, losses = run(*xs)
    float(losses[-1])  # host readback: the only reliable sync on this backend
    t0 = time.perf_counter()
    _, losses = run(*xs)
    float(losses[-1])
    return (time.perf_counter() - t0) / iters


for label, b, h, sq, skv, d in SHAPES:
    key = jax.random.PRNGKey(0)
    q = jax.random.normal(key, (b, sq, h, d), jnp.bfloat16)
    k = jax.random.normal(jax.random.fold_in(key, 1), (b, skv, h, d), jnp.bfloat16)
    v = jax.random.normal(jax.random.fold_in(key, 2), (b, skv, h, d), jnp.bfloat16)

    flops = 4.0 * b * h * sq * skv * d  # fwd QK^T + PV (MACs*2 each)
    flops_train = flops * 3.5           # fwd + bwd (2.5x fwd)

    for impl in ("xla", "flash"):
        if impl_filter != "both" and impl != impl_filter:
            continue

        def train_step(q, k, v, impl=impl):
            def loss(q, k, v):
                o = attention(q, k, v, impl=impl)
                return jnp.sum(o.astype(jnp.float32) ** 2)
            l, gq = jax.value_and_grad(loss)(q, k, v)
            return l, gq

        try:
            dt = bench(train_step, q, k, v)
            eff = flops_train / dt / 197e12
            print(f"{label:15s} {impl:6s} {dt*1e3:8.3f} ms  "
                  f"eff~{eff:.1%} of peak", flush=True)
        except Exception as e:
            print(f"{label:15s} {impl:6s} FAILED: {type(e).__name__}: {e}",
                  flush=True)
