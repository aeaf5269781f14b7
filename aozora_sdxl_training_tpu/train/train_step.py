"""Jitted SDXL train step factory: micro-step + optimizer step.

Mirrors the reference's hot loop (/root/reference/train.py:2708-2828) as two
compiled functions instead of an eager autograd loop:

* ``micro_step`` — fwd + bwd of one micro-batch, accumulating ``grads / GA``
  into a persistent device buffer (the analogue of ``(loss/GA).backward()``,
  train.py:2765).  Noise and RF jitter are derived *inside* jit from
  (seed, micro_step) fold-in chains, so the step is a pure function of its
  inputs and bit-reproducible on resume.  One executable per bucket shape.
* ``apply_step`` — global-norm clip + Raven-semantics AdamW on the
  accumulated grads (train.py:2771-2785), donated buffers, LR as a traced
  scalar so the visual LR curve never recompiles.

Parameters are split into trainable/frozen dicts (keyword freeze,
train.py:2664-2667); gradients exist only for the trainable subset.
"""

from __future__ import annotations

import fnmatch
import functools
from dataclasses import dataclass
from typing import Any

import jax
import jax.numpy as jnp

from ..models.sdxl.arch import UNetConfig
from ..models.sdxl.unet import unet_forward
from ..opt import adamw
from . import objectives

Params = dict[str, jax.Array]


def split_trainable(params: Params, exclude_keywords: list[str]):
    """Split the flat param dict by the reference's fnmatch freeze rule:
    a param is FROZEN iff any keyword matches (kw if it has a '*' else *kw*).
    """
    trainable, frozen = {}, {}
    for name, p in params.items():
        excluded = any(
            fnmatch.fnmatch(name, kw if "*" in kw else f"*{kw}*")
            for kw in exclude_keywords)
        (frozen if excluded else trainable)[name] = p
    return trainable, frozen


@dataclass(frozen=True)
class TrainStepConfig:
    unet: UNetConfig
    prediction_type: str = "v_prediction"  # epsilon | v_prediction | rectified_flow
    grad_accum_steps: int = 1
    clip_grad_norm: float = 1.0
    attn_impl: str = "xla"
    compute_dtype: Any = jnp.bfloat16
    remat: bool = True
    # (hires_tokens, full_tokens) 3-tier remat thresholds for "*_hires"
    # modes, chosen by the memory planner; None keeps the env defaults
    remat_thresholds: Any = None
    # grad-accum tree storage (memory_policy may pick bf16 in low-memory
    # single-chip mode; the per-micro-step contribution is still computed
    # in the gradient dtype and divided by GA before the cast)
    accum_dtype: Any = jnp.float32
    # multi-chip weight layout during compute (memory_policy): True pins
    # bf16 compute copies dp-gathered (one all-gather per weight per step);
    # False keeps them dp-sharded to free HBM for a faster remat rung
    gather_once: bool = True


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2))
def _fwd_sharding_constraint(x, storage_sharding, compute_sharding):
    """Two sharding constraints applied to the FORWARD value only.

    The bf16 cast of a master weight is pinned FIRST to its storage
    (FSDP-sharded) layout — so the f32->bf16 convert runs shard-local and
    GSPMD cannot hoist the dp all-gather above it onto the fp32 master
    (it does exactly that if only the gathered layout is annotated:
    measured 30 MB of f32 all-gather on convert_element_type in the TINY
    dp8 post-SPMD dump) — and THEN to its compute layout (storage spec
    minus the dp axis), which makes the sharded->gathered resharding an
    explicit bf16 all-gather, once per weight per micro-step.

    A plain with_sharding_constraint would also constrain the cotangent's
    placement; this custom VJP passes the cotangent through untouched,
    leaving GSPMD free to place the weight-grad reduction optimally
    (reduce-scatter into the FSDP layout of the master's gradient).
    """
    x = jax.lax.with_sharding_constraint(x, storage_sharding)
    return jax.lax.with_sharding_constraint(x, compute_sharding)


def _fsc_fwd(x, storage_sharding, compute_sharding):
    x = jax.lax.with_sharding_constraint(x, storage_sharding)
    return jax.lax.with_sharding_constraint(x, compute_sharding), None


def _fsc_bwd(_storage, _compute, _res, g):
    return (g,)


_fwd_sharding_constraint.defvjp(_fsc_fwd, _fsc_bwd)


def _compute_sharding(storage_sharding):
    """The layout a weight should have DURING compute: its storage spec
    with the ``dp`` (FSDP) axis removed — i.e. gathered once per step over
    dp, still sharded over tp/pp where the storage says so.

    Leaving the bf16 copy pinned to the *storage* (dp-sharded) layout let
    GSPMD make per-consumer resharding choices that the r4 TINY-dp8
    post-SPMD dump shows to be pathological: every weight all-gathered
    TWICE (fwd + bwd transpose), forward dots partitioned along the
    contracting dim (146 bf16 all-reduces on activations), and the
    fused-QKV GEMM output left feature-sharded (286 collective-permutes +
    an all-to-all swarm around the q/k/v split).  Pinning the compute copy
    to the dp-gathered layout makes every consumer local: ONE bf16
    all-gather per weight per micro-step, zero activation resharding, and
    the gather's transpose is exactly the reduce-scatter of the weight
    grad into its FSDP shard (ZeRO-2-style compute replicas; the fp32
    master, moments, and accum stay dp-sharded).
    """
    spec = storage_sharding.spec
    new = tuple(None if ax == "dp"
                else (tuple(a for a in ax if a != "dp") or None
                      if isinstance(ax, tuple) else ax)
                for ax in spec)
    if all(ax is None for ax in new):
        new = ()
    from jax.sharding import NamedSharding, PartitionSpec
    return NamedSharding(storage_sharding.mesh, PartitionSpec(*new))


def precast_params(tree: Params, shardings, compute_dtype,
                   gather_once: bool = True) -> Params:
    """Cast matmul/conv weights (ndim >= 2) to the compute dtype and pin
    them to their COMPUTE layout (``gather_once``: storage spec minus the
    dp axis), so the dp all-gather moves bf16 and happens once per weight
    per step.  ``gather_once=False`` keeps the compute copy pinned to the
    storage layout instead — per-consumer gathers (~2x weight traffic)
    but no resident bf16 weight tree, which the memory planner trades at
    big buckets (memory_policy.MemoryPlan.gather_once).

    1-D params (norm scales, biases) keep the master dtype — GroupNorm/
    RMSNorm consume them in fp32 (models/sdxl/unet.py:111) and their
    gather traffic is negligible.  The model's own per-use ``astype``
    makes the ndim>=2 cast a no-op numerically (XLA CSEs the converts),
    so single-chip results are bit-identical.
    """
    if shardings is None:
        return tree
    return {k: (_fwd_sharding_constraint(v.astype(compute_dtype),
                                         shardings[k],
                                         _compute_sharding(shardings[k])
                                         if gather_once else shardings[k])
                if v.ndim >= 2 else v)
            for k, v in tree.items()}


def make_loss_fn(cfg: TrainStepConfig, param_shardings=None):
    t_sh, f_sh = param_shardings if param_shardings else (None, None)

    def loss_fn(trainable: Params, frozen: Params, latents, embeds, pooled,
                time_ids, timesteps, sample_mask, loss_weights, seed,
                micro_step):
        params = {**precast_params(frozen, f_sh, cfg.compute_dtype,
                                   cfg.gather_once),
                  **precast_params(trainable, t_sh, cfg.compute_dtype,
                                   cfg.gather_once)}
        noise = objectives.noise_for_step(seed, micro_step, latents.shape)
        rf_jitter = (objectives.rf_jitter_for_step(seed, micro_step,
                                                   latents.shape[0])
                     if cfg.prediction_type == "rectified_flow" else None)
        noisy, target, t_cond, sigma = objectives.prepare_batch(
            cfg.prediction_type, latents, noise, timesteps, rf_jitter)
        pred = unet_forward(
            params, noisy.astype(cfg.compute_dtype), t_cond, embeds, pooled,
            time_ids, cfg=cfg.unet, attn_impl=cfg.attn_impl,
            compute_dtype=cfg.compute_dtype, remat=cfg.remat,
            remat_thresholds=cfg.remat_thresholds)
        loss = objectives.weighted_mse_loss(pred, target, timesteps,
                                            loss_weights, sample_mask)
        return loss, sigma

    return loss_fn


def make_micro_step(cfg: TrainStepConfig, param_shardings=None):
    """micro_step(trainable, frozen, grad_accum, batch..., keep) ->
    (loss, sigma0, new_grad_accum).

    ``keep`` is 1.0 mid-accumulation-window and 0.0 on the first micro-step
    of a window (replaces ``zero_grad`` with a fused multiply-add).
    """
    loss_fn = make_loss_fn(cfg, param_shardings)
    inv_ga = 1.0 / float(cfg.grad_accum_steps)

    def micro_step(trainable, frozen, grad_accum, latents, embeds, pooled,
                   time_ids, timesteps, sample_mask, loss_weights, seed,
                   micro_step_idx, keep):
        (loss, sigma), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            trainable, frozen, latents, embeds, pooled, time_ids, timesteps,
            sample_mask, loss_weights, seed, micro_step_idx)
        accum_dtype = jnp.dtype(cfg.accum_dtype)
        new_accum = jax.tree.map(
            lambda a, g: (a.astype(jnp.float32) * keep
                          + g.astype(jnp.float32) * inv_ga
                          ).astype(accum_dtype),
            grad_accum, grads)
        return loss, sigma[0], new_accum

    return micro_step


def make_fused_step(cfg: TrainStepConfig, opt_cfg: adamw.AdamWConfig,
                    param_shardings=None):
    """GA=1 low-memory path: fwd + bwd + clip + optimizer update in ONE
    compiled program with donated parameter/state buffers.

    Eliminates the grad-accum tree entirely (~4.4 GB fp32 for the full
    UNet) and lets XLA free each gradient right after its parameter's
    update — the piece that makes full-UNet single-chip training fit in
    16 GB next to bf16 master weights and int8 moments (VERDICT r2 #1).

    fused(trainable, frozen, opt_state, batch..., lr) ->
        (loss, sigma0, new_trainable, new_opt_state, raw_norm, update_norm)
    """
    loss_fn = make_loss_fn(cfg, param_shardings)

    def fused_step(trainable, frozen, opt_state, latents, embeds, pooled,
                   time_ids, timesteps, sample_mask, loss_weights, seed,
                   micro_step_idx, lr):
        (loss, sigma), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            trainable, frozen, latents, embeds, pooled, time_ids, timesteps,
            sample_mask, loss_weights, seed, micro_step_idx)
        clipped, raw_norm = adamw.clip_by_global_norm(
            grads, cfg.clip_grad_norm)
        new_params, new_state, update_sq = adamw.apply_updates(
            trainable, clipped, opt_state, opt_cfg, lr=lr,
            return_update_sq=True)
        return (loss, sigma[0], new_params, new_state, raw_norm,
                jnp.sqrt(update_sq))

    return fused_step


def jit_two_pass_fused(loss_fn, opt_cfg: adamw.AdamWConfig,
                       clip_grad_norm: float):
    """GA=1 rung between the fused step and host-moment offload: two
    compiled programs in which the gradient tree never materializes.

    The fused step needs every gradient alive until the global clip norm
    is known — a ~2x-trainable-bytes HLO temp that (plus fragmentation)
    pushes full-SDXL to 16.9 GB on a 15.75 GB chip (r3 measured).  The
    pinned-host moment rung fits but streams ~9 GB of optimizer state
    over the PCIe/tunnel path every step (~10 s/step measured — the same
    order as the reference's Raven/Titan CPU-offload optimizer,
    /root/reference/training_utils/optimizers/raven.py:122-147).  This
    rung instead splits the step so each gradient dies at its only
    consumer and all state stays in HBM:

    * pass 1 (``norm_step``): fwd+bwd where each grad's lifetime ends at
      its square-sum reduction; XLA frees it mid-backward.  Returns the
      loss and the global grad norm.
    * pass 2 (``update_step``): recomputes fwd+bwd, scales each grad by
      pass 1's clip factor, and folds it into that parameter's donated
      AdamW update.  Again one consumer per grad.

    Cost: ~2x the backward compute (vs ~40x for streamed moments); peak
    HBM is master+frozen+moments+activations only.  Pass 2's grads are a
    fresh recompute of the same pure function on the same inputs — the
    two compilations may differ in fusion order by ~1 ulp, perturbing
    the clip *scale* (not the grad direction) immeasurably; the
    reference's clip-then-Adam semantics (train.py:2771-2785) are
    preserved.

    ``loss_fn(trainable, frozen, *batch) -> (loss, aux)`` is either
    trainer family's loss; the returned wrapper keeps the fused-step
    contract ``(trainable, frozen, opt_state, *batch, lr) -> (loss,
    aux0, new_params, new_state, raw_norm, update_norm)`` so it drops
    into the trainer's ``fused_fn`` slot unchanged.

    Degenerate case: with clipping disabled (``clip_grad_norm <= 0``)
    there is no cross-tensor dependency at all, so the step collapses to
    ONE program at the update pass's memory shape — full-model
    single-chip training at half the two-pass compute.
    """

    def norm_step(trainable, frozen, *batch):
        (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            trainable, frozen, *batch)
        normsq = sum(adamw.leaf_square_sum(g)
                     for g in jax.tree.leaves(grads))
        return loss, jnp.reshape(aux, (-1,))[0], jnp.sqrt(normsq)

    def _tie_state_to_grads(trainable, opt_state, grads):
        """Make each tensor's update inputs depend on its own gradient.

        Without this the int8-moment decodes and fp32 master upcasts
        depend only on program *arguments* — they are schedulable at t=0,
        and XLA's latency-hiding scheduler hoists all ~800 of them ahead
        of the backward: 2x trainable fp32 of decoded moments alive at
        once (measured 19.54 GB HLO temp on full SDXL, r3 AOT probe).
        An optimization_barrier per tensor ties (p, m, v) to that
        tensor's grad, so a decode only becomes ready when the backward
        produces its grad and the whole per-tensor update chain can
        retire (and free) mid-backward.
        """
        flat_p, treedef = jax.tree.flatten(trainable)
        flat_g = treedef.flatten_up_to(grads)
        flat_m = treedef.flatten_up_to(opt_state.exp_avg)
        flat_v = treedef.flatten_up_to(opt_state.exp_avg_sq)
        new_p, new_m, new_v = [], [], []
        for p, g, m, v in zip(flat_p, flat_g, flat_m, flat_v):
            p, m, v, _ = jax.lax.optimization_barrier((p, m, v, g))
            new_p.append(p)
            new_m.append(m)
            new_v.append(v)
        return (jax.tree.unflatten(treedef, new_p),
                adamw.AdamWState(
                    step=opt_state.step,
                    exp_avg=jax.tree.unflatten(treedef, new_m),
                    exp_avg_sq=jax.tree.unflatten(treedef, new_v)))

    def update_step(raw_norm, lr, trainable, frozen, opt_state, *batch):
        _, grads = jax.value_and_grad(loss_fn, has_aux=True)(
            trainable, frozen, *batch)
        clipped, _ = adamw.clip_by_global_norm(
            grads, clip_grad_norm, precomputed_norm=raw_norm)
        tied_params, tied_state = _tie_state_to_grads(
            trainable, opt_state, clipped)
        new_params, new_state, update_sq = adamw.apply_updates(
            tied_params, clipped, tied_state, opt_cfg, lr=lr,
            return_update_sq=True)
        return new_params, new_state, jnp.sqrt(update_sq)

    def one_pass_step(lr, trainable, frozen, opt_state, *batch):
        # clip disabled: no cross-tensor norm dependency, so the whole
        # step is ONE program — each grad still dies into its own update
        # (+ its square-sum, a scalar) thanks to the barrier ties.  Same
        # memory shape as the update pass, half the two-pass compute.
        (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            trainable, frozen, *batch)
        normsq = sum(adamw.leaf_square_sum(g)
                     for g in jax.tree.leaves(grads))
        tied_params, tied_state = _tie_state_to_grads(
            trainable, opt_state, grads)
        new_params, new_state, update_sq = adamw.apply_updates(
            tied_params, grads, tied_state, opt_cfg, lr=lr,
            return_update_sq=True)
        return (loss, jnp.reshape(aux, (-1,))[0], new_params, new_state,
                jnp.sqrt(normsq), jnp.sqrt(update_sq))

    if clip_grad_norm is None or float(clip_grad_norm) <= 0:
        one_jit = jax.jit(one_pass_step, donate_argnums=(1, 3))

        def one_pass(trainable, frozen, opt_state, *rest):
            *batch, lr = rest
            return one_jit(lr, trainable, frozen, opt_state, *batch)

        one_pass.norm_jit = None
        one_pass.update_jit = one_jit
        return one_pass

    norm_jit = jax.jit(norm_step)
    update_jit = jax.jit(update_step, donate_argnums=(2, 4))

    def two_pass(trainable, frozen, opt_state, *rest):
        *batch, lr = rest
        loss, aux0, raw_norm = norm_jit(trainable, frozen, *batch)
        new_params, new_state, update_norm = update_jit(
            raw_norm, lr, trainable, frozen, opt_state, *batch)
        return loss, aux0, new_params, new_state, raw_norm, update_norm

    # exposed for AOT memory probing (tools_dev/aot_fused_tpu_probe.py)
    two_pass.norm_jit = norm_jit
    two_pass.update_jit = update_jit
    return two_pass


def make_apply_step(cfg: TrainStepConfig, opt_cfg: adamw.AdamWConfig):
    """apply_step(trainable, grad_accum, opt_state, lr) ->
    (new_trainable, new_opt_state, raw_grad_norm, update_norm).

    ``update_norm`` is the global L2 norm of the actual parameter delta —
    the real "Update Magnitude" for the optimizer diagnostic block (the
    reference prints a placeholder 1.0/0.0 there, train.py:2797; computing
    the true delta is a free fused reduction inside this jit)."""

    def apply_step(trainable, grad_accum, opt_state, lr):
        clipped, raw_norm = adamw.clip_by_global_norm(
            grad_accum, cfg.clip_grad_norm)
        new_params, new_state = adamw.apply_updates(
            trainable, clipped, opt_state, opt_cfg, lr=lr)
        delta_sq = sum(
            jnp.sum((np_.astype(jnp.float32) - p.astype(jnp.float32)) ** 2)
            for np_, p in zip(jax.tree.leaves(new_params),
                              jax.tree.leaves(trainable)))
        return new_params, new_state, raw_norm, jnp.sqrt(delta_sq)

    return apply_step


def zero_grad_accum(trainable: Params, dtype=jnp.float32) -> Params:
    return jax.tree.map(lambda p: jnp.zeros(p.shape, dtype), trainable)


def jit_train_functions(cfg: TrainStepConfig, opt_cfg: adamw.AdamWConfig,
                        *, shardings: dict | None = None):
    """Compile micro_step and apply_step with donated buffers.

    ``shardings`` (optional) carries NamedShardings for {trainable, frozen,
    grad_accum, opt_state, batch leaves} when running over a mesh; None means
    single-device defaults.
    """
    micro = make_micro_step(cfg, param_shardings=(
        (shardings["trainable"], shardings["frozen"]) if shardings else None))
    apply_ = make_apply_step(cfg, opt_cfg)

    micro_kw: dict = dict(donate_argnums=(2,))
    apply_kw: dict = dict(donate_argnums=(0, 1, 2))
    if shardings:
        sh_t = shardings["trainable"]
        sh_f = shardings["frozen"]
        sh_g = shardings["grad_accum"]
        sh_o = shardings["opt_state"]
        sh_b = shardings["batch"]      # sharding for (B, ...) leaves
        sh_r = shardings["replicated"]
        micro_kw["in_shardings"] = (
            sh_t, sh_f, sh_g, sh_b, sh_b, sh_b, sh_b, sh_b, sh_b, sh_r, sh_r,
            sh_r, sh_r)
        micro_kw["out_shardings"] = (sh_r, sh_r, sh_g)
        apply_kw["in_shardings"] = (sh_t, sh_g, sh_o, sh_r)
        apply_kw["out_shardings"] = (sh_t, sh_o, sh_r, sh_r)

    return (jax.jit(micro, **micro_kw), jax.jit(apply_, **apply_kw))


def jit_moments_host(fused, device):
    """Jit a fused step whose optimizer state lives in pinned HOST memory.

    Any fused step with the (trainable, frozen, opt_state, *rest) ->
    (loss, sigma0, new_params, new_state, ...) contract works (SDXL's
    ``make_fused_step`` and the Anima twin).  The state enters/leaves in
    pinned_host; explicit in-program ``jax.device_put`` transfers bring
    each moment tensor to HBM around its parameter's update and stream
    the new value back, so the ~2x-trainable-size moment trees never
    hold HBM residency (jax 0.9 memory-space typing requires the
    transfers to be explicit — boundary annotations alone fail with
    "memory_space of all inputs ... must be the same").
    """
    s_dev = jax.sharding.SingleDeviceSharding(device)
    s_host = jax.sharding.SingleDeviceSharding(device,
                                               memory_kind="pinned_host")

    def wrapped(trainable, frozen, opt_state, *rest):
        opt_dev = jax.device_put(opt_state, s_dev)
        out = fused(trainable, frozen, opt_dev, *rest)
        loss, sigma0, new_params, new_state = out[:4]
        new_state = jax.device_put(new_state, s_host)
        return (loss, sigma0, new_params, new_state) + tuple(out[4:])

    # 13 args: trainable, frozen, opt_state, 6 batch leaves, seed,
    # micro_step_idx, lr.  opt_state is NOT donated (host buffers).
    return jax.jit(
        wrapped, donate_argnums=(0,),
        in_shardings=(None, None, s_host) + (None,) * 10,
        out_shardings=(None, None, None, s_host, None, None))


def jit_fused_function(cfg: TrainStepConfig, opt_cfg: adamw.AdamWConfig,
                       *, shardings: dict | None = None,
                       moments_host: bool = False, device=None):
    """Compile the fused GA=1 step with donated params + optimizer state.

    ``moments_host=True`` (single-device low-memory rung): the optimizer
    state enters and leaves the program in pinned HOST memory — XLA
    streams each moment tensor over PCIe around its parameter's update,
    so the ~2x-trainable-size moment trees never occupy HBM (the
    TPU-native form of the reference's Raven/Titan CPU offload,
    raven.py:122-147, with the update math still a fused device kernel).
    """
    psh = ((shardings["trainable"], shardings["frozen"])
           if shardings else None)
    fused = make_fused_step(cfg, opt_cfg, param_shardings=psh)
    if moments_host:
        dev = device or jax.devices()[0]
        return jit_moments_host(fused, dev)
    kw: dict = dict(donate_argnums=(0, 2))
    if shardings:
        sh_t = shardings["trainable"]
        sh_f = shardings["frozen"]
        sh_o = shardings["opt_state"]
        sh_b = shardings["batch"]
        sh_r = shardings["replicated"]
        kw["in_shardings"] = (sh_t, sh_f, sh_o, sh_b, sh_b, sh_b, sh_b, sh_b,
                              sh_b, sh_r, sh_r, sh_r, sh_r)
        kw["out_shardings"] = (sh_r, sh_r, sh_t, sh_o, sh_r, sh_r)
    return jax.jit(fused, **kw)
