"""Debug harness for the bf16 FSDP weight-gather (VERDICT r4 weak #1).

Builds the same dp8 micro step as tests/test_sharding.py::
test_fsdp_weight_gather_moves_bf16_not_fp32 on the virtual CPU mesh and
prints every all-gather in the optimized HLO plus where the f32->bf16
converts sit relative to them, so the precast fix can be iterated without
rerunning the whole test file.

Run:  AOZORA_PLATFORM=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
      python tools_dev/debug_fsdp_gather.py
"""

import os
import re
import sys

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from aozora_sdxl_training_tpu.models.sdxl.arch import TINY
from aozora_sdxl_training_tpu.models.sdxl.unet import init_params
from aozora_sdxl_training_tpu.opt import adamw
from aozora_sdxl_training_tpu.parallel import sharding as shard
from aozora_sdxl_training_tpu.train.train_step import (
    TrainStepConfig, jit_train_functions, split_trainable, zero_grad_accum)


def main():
    cfg = TrainStepConfig(unet=TINY, prediction_type="v_prediction",
                          grad_accum_steps=1, clip_grad_norm=1.0,
                          attn_impl="xla", compute_dtype=jnp.bfloat16,
                          remat=False)
    opt_cfg = adamw.AdamWConfig(momentum_dtype=jnp.float32)
    params = init_params(TINY, jax.random.PRNGKey(0))
    trainable, frozen = split_trainable(params, ["conv1", "conv2"])
    mesh = shard.make_mesh(jax.devices())
    min_el = 1024
    shardings = {
        "trainable": shard.params_shardings(trainable, mesh,
                                            min_shard_elements=min_el),
        "frozen": shard.params_shardings(frozen, mesh,
                                         min_shard_elements=min_el),
        "grad_accum": shard.params_shardings(trainable, mesh,
                                             min_shard_elements=min_el),
        "opt_state": None,
        "batch": jax.sharding.NamedSharding(mesh, P("dp")),
        "replicated": shard.replicated(mesh),
    }
    micro8, _ = jit_train_functions(cfg, opt_cfg, shardings=shardings)

    b = 8
    args = (trainable, frozen, zero_grad_accum(trainable),
            jnp.zeros((b, 8, 8, 4)),
            jnp.zeros((b, 7, TINY.cross_attention_dim)),
            jnp.zeros((b, TINY.pooled_projection_dim)),
            jnp.ones((b, 6)), jnp.zeros((b,), jnp.int32),
            jnp.ones((b,), jnp.float32), jnp.ones(1000, jnp.float32),
            jnp.asarray(42, jnp.int32), jnp.asarray(1, jnp.int32),
            jnp.asarray(0.0, jnp.float32))
    import glob
    import shutil
    dump = "/tmp/fsdp_gather_dump"
    shutil.rmtree(dump, ignore_errors=True)
    micro8.lower(*args).compile(compiler_options={
        "xla_dump_to": dump,
        "xla_dump_hlo_pass_re": "spmd-partitioning"})
    files = [f for f in glob.glob(dump + "/*after_spmd-partitioning*.txt")
             if "micro_step" in f]
    hlo = open(files[-1]).read()

    pat = re.compile(
        r"=\s*(\w+)\[([\d,]*)\][^=]*\b"
        r"(all-gather|all-reduce|reduce-scatter|all-to-all|"
        r"collective-permute)(?:-start)?\(")
    meta = re.compile(r'op_name="([^"]*)"')
    stats: dict = {}
    for line in hlo.splitlines():
        m = pat.search(line)
        if not m:
            continue
        dt, dims, kind = m.group(1), m.group(2), m.group(3)
        n = 1
        for d in dims.split(","):
            if d:
                n *= int(d)
        size = n * {"bf16": 2, "f16": 2, "f32": 4, "s32": 4, "u32": 4,
                    "pred": 1, "s8": 1, "u8": 1}.get(dt, 4)
        om = meta.search(line)
        op = om.group(1) if om else "?"
        # collapse to a coarse source label
        src = op.split("/")[-1]
        key = (kind, dt, src)
        c, b = stats.get(key, (0, 0))
        stats[key] = (c + 1, b + size)
    print(f"{'kind':<20} {'dtype':<6} {'count':>5} {'MB':>10}  source")
    for (kind, dt, src), (c, b) in sorted(stats.items(),
                                          key=lambda kv: -kv[1][1]):
        print(f"{kind:<20} {dt:<6} {c:>5} {b / 2**20:>10.2f}  {src}")
    print(f"post-SPMD dump: {files[-1]}")


if __name__ == "__main__":
    main()
