"""Per-shape conv efficiency probe: fwd / dgrad / wgrad at the SDXL UNet's
hot conv shapes (v5e-1).

The r2 trace attributes 61% of the 248 ms step to conv/dot fusions at ~56%
MXU efficiency (tools_dev/trace_probe.py); this probe isolates WHERE the
efficiency goes — forward convs vs the two backward convs (dx "dgrad",
dW "wgrad") per (spatial, channels) level — to target the round-3 conv
work at the real offender rather than guessing.

Measurement rules from CLAUDE.md: chain iterations through lax.scan with a
data dependency and sync by reading a value back (isolated un-chained
dispatches through the axon tunnel report absurd numbers).

    python tools_dev/conv_probe.py [batch=1]
"""

from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

PEAK = 197e12  # v5e bf16

# (spatial, cin, cout): the SDXL resnet conv population at 1024px
SHAPES = [
    (128, 320, 320),
    (128, 640, 320),    # up-path concat convs
    (64, 640, 640),
    (64, 1280, 640),
    (32, 1280, 1280),
    (32, 2560, 1280),
]


def bench_fn(fn, args, iters=20):
    """Chained timing: scan the op with a data dependency, sync on result."""
    def chained(x, *rest):
        def body(carry, _):
            y = fn(carry, *rest)
            # fold output back into the carry's shape with a cheap reduce
            return carry + 0.0 * y.mean().astype(carry.dtype), ()
        out, _ = jax.lax.scan(body, x, None, length=iters)
        return out.mean()

    jfn = jax.jit(chained)
    r = jfn(*args)
    jax.block_until_ready(r)
    t0 = time.perf_counter()
    r = jfn(*args)
    float(r)
    return (time.perf_counter() - t0) / iters


def main():
    argv = dict(a.split("=") for a in sys.argv[1:] if "=" in a)
    b = int(argv.get("batch", 1))
    print(f"conv probe: backend={jax.default_backend()} batch={b}")
    key = jax.random.PRNGKey(0)

    for hw, cin, cout in SHAPES:
        x = jax.random.normal(key, (b, hw, hw, cin), jnp.bfloat16)
        w = jax.random.normal(key, (3, 3, cin, cout), jnp.bfloat16)
        dy = jax.random.normal(key, (b, hw, hw, cout), jnp.bfloat16)
        flops = 2 * b * hw * hw * 9 * cin * cout

        def fwd(x_, w_):
            return jax.lax.conv_general_dilated(
                x_, w_, (1, 1), ((1, 1), (1, 1)),
                dimension_numbers=("NHWC", "HWIO", "NHWC"))

        # conv is linear in each operand: linear_transpose gives the pure
        # backward ops (no forward contamination in the timing)
        def dgrad(dy_, w_):
            t = jax.linear_transpose(
                lambda xx: fwd(xx, w_),
                jax.ShapeDtypeStruct((b, hw, hw, cin), jnp.bfloat16))
            return t(dy_)[0]

        def wgrad(dy_, x_):
            t = jax.linear_transpose(
                lambda ww: fwd(x_, ww),
                jax.ShapeDtypeStruct((3, 3, cin, cout), jnp.bfloat16))
            return t(dy_)[0]

        t_f = bench_fn(fwd, (x, w))
        t_d = bench_fn(dgrad, (dy, w))
        t_w = bench_fn(wgrad, (dy, x))
        print(f"  {hw:4d}x{hw:<4d} {cin:4d}->{cout:4d}  "
              f"fwd {t_f * 1e3:6.3f}ms ({flops / t_f / PEAK:5.1%})  "
              f"dgrad {t_d * 1e3:6.3f}ms ({flops / t_d / PEAK:5.1%})  "
              f"wgrad {t_w * 1e3:6.3f}ms ({flops / t_w / PEAK:5.1%})")


if __name__ == "__main__":
    main()
