"""AOT-compile the FULL-SIZE fused SDXL train step on the real chip.

Compile-only (abstract avals — no buffers are materialized), so a
memory-infeasible configuration surfaces as a compiler OOM in ~minutes
without burning a trainer run.  Used to validate the pinned-host moment
rung (r3): the all-on-device fused step measured 16.88 GB vs the chip's
15.75 GB; parking the int8 moment trees in host memory must bring HLO
residency under budget.

    python tools_dev/aot_fused_tpu_probe.py [host=1] [latent=128] [batch=1]
    python tools_dev/aot_fused_tpu_probe.py mode=two_pass [latent=128]
    python tools_dev/aot_fused_tpu_probe.py model=anima mode=two_pass
"""

import sys; sys.path.insert(0, "/root/repo")
import sys

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

args = dict(a.split("=") for a in sys.argv[1:] if "=" in a)
host = bool(int(args.get("host", 1)))
latent = int(args.get("latent", 128))
batch = int(args.get("batch", 1))
mode = args.get("mode", "host")  # host | two_pass
model = args.get("model", "sdxl")  # sdxl | anima

from aozora_sdxl_training_tpu.models.sdxl.arch import SDXL_BASE
from aozora_sdxl_training_tpu.models.sdxl.unet import init_params
from aozora_sdxl_training_tpu.opt import adamw
from aozora_sdxl_training_tpu.train.train_step import (
    TrainStepConfig, jit_fused_function, split_trainable)

cfg = SDXL_BASE
step_cfg = TrainStepConfig(unet=cfg, prediction_type="v_prediction",
                           grad_accum_steps=1, clip_grad_norm=1.0,
                           attn_impl="flash", compute_dtype=jnp.bfloat16,
                           remat=True)
opt_cfg = adamw.AdamWConfig(debias_strength=1.0,
                            momentum_dtype="int8_blockwise")

# abstract param/optimizer trees (no memory is allocated)
from aozora_sdxl_training_tpu.models.sdxl.arch import param_shapes
shapes = {name: jax.ShapeDtypeStruct(tuple(shape), jnp.bfloat16)
          for name, (shape, kind) in param_shapes(cfg).items()}
trainable, frozen = split_trainable(shapes, ["conv1", "conv2"])
opt_state = jax.eval_shape(lambda t: adamw.init_state(t, opt_cfg), trainable)
n_t = sum(int(jnp.prod(jnp.array(v.shape))) for v in trainable.values())
print(f"trainable {n_t/1e9:.3f}B  latent {latent}x{latent}  batch {batch}  "
      f"moments_host={host}")

sds = jax.ShapeDtypeStruct
b = batch
batch_args = (
    sds((b, latent, latent, cfg.in_channels), jnp.float32),   # latents
    sds((b, 77, cfg.cross_attention_dim), jnp.float32),       # embeds
    sds((b, cfg.pooled_projection_dim), jnp.float32),         # pooled
    sds((b, 6), jnp.float32),                                 # time_ids
    sds((b,), jnp.int32),                                     # timesteps
    sds((b,), jnp.float32),                                   # sample_mask
)
scalars = (sds((1000,), jnp.float32),                         # loss_weights
           sds((), jnp.int32), sds((), jnp.int32),            # seed, idx
           sds((), jnp.float32))                              # lr

GB = 1024 ** 3


def report(compiled, label):
    m = compiled.memory_analysis()
    print(f"COMPILE OK [{label}]")
    print(f"  temp   {m.temp_size_in_bytes / GB:.2f} GB")
    print(f"  args   {m.argument_size_in_bytes / GB:.2f} GB")
    print(f"  output {m.output_size_in_bytes / GB:.2f} GB")
    print(f"  alias  {m.alias_size_in_bytes / GB:.2f} GB")
    total = (m.temp_size_in_bytes + m.argument_size_in_bytes
             + m.output_size_in_bytes - m.alias_size_in_bytes)
    print(f"  total  {total / GB:.2f} GB (HBM view; host-resident args are "
          "not charged by the TPU allocator)")


if model == "anima" and mode == "two_pass":
    # full-size Anima DiT (2.09B, 1024px image mode -> 4096 tokens,
    # 512-token adapter context), everything trainable, full remat —
    # the single-chip configuration the planner maps to the two-pass rung
    from aozora_sdxl_training_tpu.models.anima import dit as dit_mod
    from aozora_sdxl_training_tpu.train.anima_trainer import (
        _make_anima_loss_fn)
    from aozora_sdxl_training_tpu.train.train_step import jit_two_pass_fused

    acfg = dit_mod.ANIMA_BASE
    a_shapes = {name: jax.ShapeDtypeStruct(tuple(shape), jnp.bfloat16)
                for name, shape in dit_mod.param_shapes(acfg).items()}
    a_state = jax.eval_shape(lambda t: adamw.init_state(t, opt_cfg), a_shapes)
    n_a = sum(int(jnp.prod(jnp.array(v.shape))) for v in a_shapes.values())
    print(f"anima trainable {n_a/1e9:.3f}B  latent {latent}x{latent}")
    ctx = 512
    a_batch = (
        sds((b, latent, latent, acfg.in_channels), jnp.float32),  # latents
        sds((b, ctx, acfg.adapter_source_dim), jnp.bfloat16),     # prompt_emb
        sds((b, ctx), jnp.int32),                                 # t5_ids
        sds((b,), jnp.int32),                                     # tickets
        sds((b,), jnp.float32),                                   # sample_mask
        None,                                                     # spatial_mask
        sds((1000,), jnp.float32),                                # loss_weights
        sds((), jnp.int32), sds((), jnp.int32),                   # seed, micro
    )
    loss_fn = _make_anima_loss_fn(acfg, compute_dtype=jnp.bfloat16,
                                  attn_impl="flash", remat=True,
                                  spatial_strength=0.0)
    two_pass = jit_two_pass_fused(loss_fn, opt_cfg, 1.0)
    print("lowering norm pass ...")
    lo = two_pass.norm_jit.lower(a_shapes, {}, *a_batch)
    print("compiling norm pass (remote, minutes) ...")
    report(lo.compile(), "anima norm pass")
    print("lowering update pass ...")
    raw = jax.ShapeDtypeStruct((), jnp.float32)
    lr = jax.ShapeDtypeStruct((), jnp.float32)
    lo = two_pass.update_jit.lower(raw, lr, a_shapes, {}, a_state, *a_batch)
    print("compiling update pass (remote, minutes) ...")
    report(lo.compile(), "anima update pass")
elif mode == "one_pass":
    # clip disabled: the rung collapses to ONE program (train_step.py)
    from aozora_sdxl_training_tpu.train.train_step import (
        jit_two_pass_fused, make_loss_fn)
    import dataclasses
    cfg0 = dataclasses.replace(step_cfg, clip_grad_norm=0.0)
    one = jit_two_pass_fused(make_loss_fn(cfg0), opt_cfg, 0.0)
    *batch9, lr = (*batch_args, *scalars)
    print("lowering one-pass step ...")
    lo = one.update_jit.lower(lr, trainable, frozen, opt_state, *batch9)
    print("compiling one-pass step (remote, minutes) ...")
    report(lo.compile(), "one-pass step (clip disabled)")
elif mode == "two_pass":
    from aozora_sdxl_training_tpu.train.train_step import (
        jit_two_pass_fused, make_loss_fn)
    two_pass = jit_two_pass_fused(make_loss_fn(step_cfg), opt_cfg,
                                  step_cfg.clip_grad_norm)
    *batch9, lr = (*batch_args, *scalars)
    print("lowering norm pass ...")
    lo = two_pass.norm_jit.lower(trainable, frozen, *batch9)
    print("compiling norm pass (remote, minutes) ...")
    report(lo.compile(), "norm pass")
    print("lowering update pass ...")
    raw = jax.ShapeDtypeStruct((), jnp.float32)
    lo = two_pass.update_jit.lower(raw, lr, trainable, frozen, opt_state,
                                   *batch9)
    print("compiling update pass (remote, minutes) ...")
    report(lo.compile(), "update pass")
else:
    fused = jit_fused_function(step_cfg, opt_cfg, moments_host=host)
    print("lowering ...")
    lowered = fused.lower(trainable, frozen, opt_state, *batch_args, *scalars)
    print("compiling (remote, minutes) ...")
    report(lowered.compile(), f"fused host={host}")
