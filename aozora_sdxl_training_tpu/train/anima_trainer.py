"""Anima DiT training loop (flow matching) — TPU re-architecture of
/root/reference/train_anima.py:1724-1975.

Same host structure as the SDXL trainer: two jitted programs (micro-step /
optimizer-step) over the shared scheduling machinery, with:

* ticket -> (sigma, timestep) linear schedule, DiT conditioned on t/1000
  (train_anima.py:1689-1711);
* loss weights indexed by *ticket* (ascending coordinate, :1881);
* the LLM adapter training inside the DiT forward (t5 ids flow through the
  batch);
* DiT-only checkpoints with auto-detected key prefix + streaming save
  (:1461-1686), resume state with sampler indices.

Gradient checkpointing: "Full" remats every block; "Conservative" matches
the reference's selective policy (save the wide->narrow MLP down-proj GEMMs,
:521-593) via jax.checkpoint policy save-dot-with-no-batch-dims heuristics.
"""

from __future__ import annotations

import fnmatch
import time
from collections import deque
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from ..ckpt.anima_checkpoint import (load_dit_state, resolve_save_prefix,
                                     save_dit_model)
from ..ckpt.train_state import (check_resume_global_batch, load_train_state,
                                output_model_stem, save_train_state)
from ..data.anima_cache import (AnimaLatentDataset, check_if_anima_caching_needed,
                                precompute_and_cache_anima)
from ..data.dataset import (BatchPrefetcher, pack_sample_schedule,
                            pad_batch_arrays)
from ..data.schedule import TimestepTicketSampler, build_image_batch_schedule
from ..models.anima import dit as dit_mod
from ..opt import adamw
from . import anima_objectives, curves
from .reporter import MetricsReporter, optimizer_block
from .trainer import (consume_force_save_flag, force_save_flag_path,
                      make_optimizer_config, print_optimizer_summary)


def split_trainable_dit(params, exclude_keywords):
    trainable, frozen = {}, {}
    for name, p in params.items():
        excluded = any(
            fnmatch.fnmatch(name, kw if "*" in kw else f"*{kw}*")
            for kw in exclude_keywords)
        (frozen if excluded else trainable)[name] = p
    return trainable, frozen


def _make_anima_loss_fn(cfg: dit_mod.AnimaDiTConfig, *, compute_dtype,
                        attn_impl, remat, spatial_strength: float,
                        pp_cfg=None, param_shardings=None,
                        gather_once: bool = True):
    t_sh, f_sh = ((None, None) if param_shardings is None or pp_cfg
                  is not None else param_shardings)

    def loss_fn(trainable, frozen, latents, prompt_emb, t5_ids, tickets,
                sample_mask, spatial_mask, loss_weights, seed, micro_step):
        from . import objectives as sdxl_obj
        from .train_step import precast_params
        params = {**precast_params(frozen, f_sh, compute_dtype,
                                   gather_once),
                  **precast_params(trainable, t_sh, compute_dtype,
                                   gather_once)}
        sigmas, timesteps = anima_objectives.ticket_to_sigma_timestep(tickets)
        noise = sdxl_obj.noise_for_step(seed, micro_step, latents.shape)
        noisy, target = anima_objectives.flowmatch_noise_and_target(
            latents, noise, sigmas)
        # image mode: (B, H, W, C) -> (B, T=1, H, W, C); video mode feeds
        # (B, T, H, W, C) straight through.  DiT conditioned on t/1000.
        video = noisy.ndim == 5
        x_in = noisy if video else noisy[:, None]
        if pp_cfg is not None:
            # pipeline parallelism: params carry stacked __stack__.* block
            # leaves (parallel/pipeline.py); the block stack streams
            # GPipe-style over the mesh's pp axis
            from ..parallel import pipeline as pl_mod
            stacked, rest = pl_mod.split_stacked(params)
            pred = pl_mod.pp_dit_forward(
                stacked, rest, x_in.astype(compute_dtype),
                timesteps / 1000.0, prompt_emb.astype(compute_dtype),
                cfg=cfg, mesh=pp_cfg.mesh,
                microbatches=pp_cfg.microbatches, t5_ids=t5_ids,
                attn_impl=attn_impl, compute_dtype=compute_dtype,
                remat=remat)
        else:
            pred = dit_mod.dit_forward(
                params, x_in.astype(compute_dtype), timesteps / 1000.0,
                prompt_emb.astype(compute_dtype), cfg=cfg, t5_ids=t5_ids,
                attn_impl=attn_impl, compute_dtype=compute_dtype,
                remat=remat)
        pred = pred if video else pred[:, 0]
        weights = loss_weights[jnp.clip(tickets, 0, loss_weights.shape[0] - 1)]
        loss = anima_objectives.weighted_flowmatch_mse(
            pred, target, weights, sample_mask=sample_mask,
            spatial_mask=spatial_mask, spatial_strength=spatial_strength)
        return loss, sigmas[0]

    return loss_fn


def make_anima_micro_step(cfg: dit_mod.AnimaDiTConfig, *, grad_accum_steps,
                          compute_dtype, attn_impl, remat,
                          spatial_strength: float = 0.0,
                          accum_dtype=jnp.float32, pp_cfg=None,
                          param_shardings=None, gather_once: bool = True):
    """``spatial_strength`` > 0 enables the line-art-masked loss: the
    ``spatial_mask`` micro-step input then boosts per-pixel error by
    ``1 + mask * strength`` (repair trainer, reference
    train_anima_repair.py:2213-2217).  Pass spatial_mask=None when off."""
    inv_ga = 1.0 / float(grad_accum_steps)
    loss_fn = _make_anima_loss_fn(cfg, compute_dtype=compute_dtype,
                                  attn_impl=attn_impl, remat=remat,
                                  spatial_strength=spatial_strength,
                                  pp_cfg=pp_cfg,
                                  param_shardings=param_shardings,
                                  gather_once=gather_once)
    acc_dt = jnp.dtype(accum_dtype)

    def micro_step(trainable, frozen, grad_accum, latents, prompt_emb, t5_ids,
                   tickets, sample_mask, spatial_mask, loss_weights, seed,
                   micro_step_idx, keep):
        (loss, sigma0), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            trainable, frozen, latents, prompt_emb, t5_ids, tickets,
            sample_mask, spatial_mask, loss_weights, seed, micro_step_idx)
        new_accum = jax.tree.map(
            lambda a, g: (a.astype(jnp.float32) * keep
                          + g.astype(jnp.float32) * inv_ga).astype(acc_dt),
            grad_accum, grads)
        return loss, sigma0, new_accum

    return micro_step


def make_anima_fused_step(cfg: dit_mod.AnimaDiTConfig, opt_cfg, *,
                          clip_grad_norm, compute_dtype, attn_impl, remat,
                          spatial_strength: float = 0.0,
                          param_shardings=None, gather_once: bool = True):
    """GA=1 low-memory path (mirror of train_step.make_fused_step): fwd +
    bwd + clip + update in one donated-buffer program — no accum tree, so
    full-model 2.09B single-chip training fits next to bf16 master weights
    and int8 moments."""
    loss_fn = _make_anima_loss_fn(cfg, compute_dtype=compute_dtype,
                                  attn_impl=attn_impl, remat=remat,
                                  spatial_strength=spatial_strength,
                                  param_shardings=param_shardings,
                                  gather_once=gather_once)

    def fused_step(trainable, frozen, opt_state, latents, prompt_emb, t5_ids,
                   tickets, sample_mask, spatial_mask, loss_weights, seed,
                   micro_step_idx, lr):
        (loss, sigma0), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            trainable, frozen, latents, prompt_emb, t5_ids, tickets,
            sample_mask, spatial_mask, loss_weights, seed, micro_step_idx)
        clipped, raw_norm = adamw.clip_by_global_norm(grads, clip_grad_norm)
        new_params, new_state, update_sq = adamw.apply_updates(
            trainable, clipped, opt_state, opt_cfg, lr=lr,
            return_update_sq=True)
        return (loss, sigma0, new_params, new_state, raw_norm,
                jnp.sqrt(update_sq))

    return fused_step


def run_anima_training(config, *, post_step_hook=None,
                       device_projector=None) -> dict:
    """Returns {"trainable": ..., "qat_residuals": ...} (device arrays).

    ``device_projector`` — an ``(init_residuals, project)`` pair from
    :func:`qat_project_jax.make_device_projector`: the projection runs as a
    jitted program on device after every optimizer step (error-feedback
    residuals stay in HBM; zero host traffic).  This is the QAT repair path.

    ``post_step_hook(trainable_numpy_dict) -> updated_numpy_dict`` — legacy
    host-side hook at optimizer-step cadence (full D2H/H2D round trip each
    step; kept for tooling that needs host access mid-run)."""
    output_dir = Path(config.OUTPUT_DIR)
    output_dir.mkdir(parents=True, exist_ok=True)
    flag_path = force_save_flag_path()
    print("\n" + "=" * 50 + "\n--- STARTING ANIMA DIT TRAINING (flow matching) ---\n"
          + "=" * 50 + "\n")
    print(f"INFO: Set random seed to {config.SEED}")

    # ---- resume ----
    global_step = micro_step = optimizer_step = 0
    resume_meta, resume_opt_state = None, None
    model_to_load = Path(config.DIT_PATH)
    initial_sampler_seed = config.SEED
    initial_ts_state = None
    if config.RESUME_TRAINING:
        print("--- RESUMING TRAINING SESSION ---")
        resume_meta, resume_opt_state = load_train_state(
            config.ANIMA_RESUME_STATE_PATH)
        global_step = int(resume_meta.get("global_step", 0))
        micro_step = int(resume_meta.get(
            "micro_step", global_step * config.GRADIENT_ACCUMULATION_STEPS))
        optimizer_step = micro_step // config.GRADIENT_ACCUMULATION_STEPS
        initial_sampler_seed = int(resume_meta.get("sampler_seed", config.SEED))
        initial_ts_state = resume_meta.get("timestep_sampler_state")
        model_to_load = Path(config.ANIMA_RESUME_MODEL_PATH)

    # ---- caching ----
    if check_if_anima_caching_needed(config):
        precompute_and_cache_anima(config)

    # ---- model (weights convert to device AFTER the memory plan) ----
    print("\n--- Loading Anima DiT ---")
    state, detected_prefix = load_dit_state(model_to_load)
    dit_cfg = _dit_config_for_state(state)
    save_prefix = resolve_save_prefix(config, detected_prefix)
    print(f"INFO: DiT key prefix: detected='{detected_prefix}' save='{save_prefix}'")

    from ..config.runtime import parse_exclude_targets
    exclude = parse_exclude_targets(getattr(config, "DIT_EXCLUDE_TARGETS", ""))

    # ---- mesh layout (decides the global batch the schedules use) ----
    from ..parallel import sharding as shard
    layout = shard.resolve_mesh_layout(config)
    global_batch = layout.global_batch
    if resume_meta is not None:
        check_resume_global_batch(resume_meta, global_batch)

    # ---- schedules ----
    dataset = AnimaLatentDataset(config)
    ts_sampler = TimestepTicketSampler(config, batch_size=global_batch)
    if initial_ts_state is not None:
        ts_sampler.load_state_dict(initial_ts_state)
    elif config.RESUME_TRAINING and micro_step > 0:
        ts_sampler.set_current_step(micro_step)
    loss_weights = jnp.asarray(
        curves.timestep_loss_curve_from_config(config, 1000))
    schedule = build_image_batch_schedule(
        dataset.bucket_keys, config.MAX_TRAIN_STEPS, global_batch,
        initial_sampler_seed, ts_sampler.ticket_pool, ts_sampler.bin_ranges,
        bool(getattr(config, "TIMESTEP_FORCE_IMAGE_BIN_SPREAD", False)))
    packed = pack_sample_schedule(schedule, global_batch)
    print(f"INFO: Precomputed batch schedule for {len(packed):,} step(s).")

    # ---- optimizer / memory plan / jit ----
    opt_cfg = make_optimizer_config(config)
    lr_curve = curves.LRCurve(config.LR_CUSTOM_CURVE, config.MAX_TRAIN_STEPS,
                              fallback_lr=getattr(config, 'LEARNING_RATE', None))
    ckpt_mode = str(getattr(config, "ANIMA_GRADIENT_CHECKPOINTING_MODE",
                            "Full")).title()
    remat = (False if ckpt_mode == "Off"
             else "conservative" if ckpt_mode == "Conservative" else True)
    # Same hybrid mapping as the SDXL trainer: flash kernel at long-KV
    # self-attention, XLA below FLASH_MIN_KV (the 512-token adapter context
    # stays on XLA's fused path).  The DiT's head_dim 128 fills the MXU
    # contraction lanes — flash's strongest shape (attn_probe: 5.4 ms vs
    # 13.9 xla fwd+bwd at 4096x128).
    attn_impl = ("xla" if str(getattr(
        config, "MEMORY_EFFICIENT_ATTENTION", "sdpa")).lower()
        in ("xla", "einsum") or jax.default_backend() != "tpu" else "flash")

    # state-dtype plan (low-memory single-chip mode): sized from the host
    # state dict BEFORE any device conversion
    from dataclasses import replace as _dc_replace

    from . import memory_policy
    sizes = {k: int(np.prod(np.shape(v))) for k, v in state.items()}
    t_sizes, f_sizes = split_trainable_dit(sizes, exclude)
    ps = max(int(dit_cfg.patch_spatial), 1)
    max_tokens = max(
        ((w // 8 // ps) * (h // 8 // ps) for (w, h) in dataset.bucket_keys),
        default=64 * 64)
    clip_frames = int(getattr(config, "ANIMA_VIDEO_FRAMES", 0) or 0)
    if clip_frames > 1:
        max_tokens *= 1 + max(clip_frames - 1, 0) // 4
    plan = memory_policy.plan_anima_training(
        trainable_elems=sum(t_sizes.values()),
        frozen_elems=sum(f_sizes.values()),
        batch_per_device=int(config.BATCH_SIZE), tokens=int(max_tokens),
        ga_steps=int(config.GRADIENT_ACCUMULATION_STEPS), remat=remat,
        dp_shard=(layout.dp if layout.use_mesh else 1),
        requested_moment_dtype=opt_cfg.momentum_dtype,
        budget_bytes=memory_policy.device_budget_bytes(layout.devices[0]),
        master_override=str(getattr(config, "MASTER_DTYPE", "auto")))
    print(memory_policy.describe_plan(plan))
    # Mirror the SDXL trainer: the DiT reads AOZORA_FUSED_QKV (and the
    # attention dispatch AOZORA_FLASH_MIN_KV) at trace time; the plan's
    # fast-backward gate models the fused-QKV cotangent workspace that the
    # 2.09B single-chip rungs cannot afford (ADVICE r4 #1).
    memory_policy.apply_fast_backward_knobs(plan)
    if plan.moment_dtype != opt_cfg.momentum_dtype:
        print("WARNING: moment storage downgraded to int8_blockwise to fit "
              "the HBM budget (update math is unchanged — fp32 scratch).")
        opt_cfg = _dc_replace(opt_cfg, momentum_dtype=plan.moment_dtype)

    params = dit_mod.params_from_torch_state(state, dit_cfg,
                                             dtype=plan.master_dtype)
    del state
    trainable, frozen = split_trainable_dit(params, exclude)
    n_t = sum(int(p.size) for p in trainable.values())
    n_f = sum(int(p.size) for p in frozen.values())
    print(f"INFO: DiT Parameters: total={n_t + n_f:,} trainable={n_t:,} "
          f"frozen={n_f:,}")

    lineart_enabled = bool(getattr(config,
                                   "ANIMA_REPAIR_LINEART_LOSS_ENABLED", False))
    lineart_strength = max(0.0, float(getattr(
        config, "ANIMA_REPAIR_LINEART_LOSS_STRENGTH", 0.5)))
    if lineart_enabled:
        print(f"INFO: Cached line-art loss: enabled=True, "
              f"max_weight={1.0 + lineart_strength:g}x")
    clip = float(config.CLIP_GRAD_NORM)
    # sequence parallelism (SEQUENCE_PARALLEL_SIZE > 1): DiT self-attention
    # tokens shard over the mesh's sp axis via ring flash attention; the
    # training-step attn_impl becomes an SPRingConfig (dit.py dispatches on
    # it), while single-chip paths and the preview sampler keep the string.
    base_attn_impl = attn_impl
    sp_mesh = None
    if layout.use_mesh and layout.sp > 1:
        from ..ops.ring_attention import SPRingConfig
        sp_mesh = shard.make_mesh(layout.devices, dp=layout.dp,
                                  tp=layout.tp, sp=layout.sp)
        attn_impl = SPRingConfig(mesh=sp_mesh, axis_name="sp",
                                 axis_size=layout.sp,
                                 base_impl=base_attn_impl)
        print(f"INFO: Sequence parallelism: DiT self-attention tokens shard "
              f"over sp={layout.sp} (ring flash attention, KV over ICI).")
    # pipeline parallelism (PIPELINE_PARALLEL_SIZE > 1): block params
    # stage-stack into __stack__ leaves sharded over the pp mesh axis;
    # microbatches stream GPipe-style (parallel/pipeline.py)
    pp_cfg_obj = None
    pp_mesh = None
    if layout.use_mesh and layout.pp > 1:
        from ..parallel import pipeline as pl_mod
        if dit_cfg.num_blocks % layout.pp:
            raise SystemExit(
                f"PIPELINE_PARALLEL_SIZE={layout.pp} does not divide "
                f"num_blocks={dit_cfg.num_blocks}")
        pp_mesh = shard.make_mesh(layout.devices, dp=layout.dp,
                                  pp=layout.pp)
        micro_m = int(getattr(config, "ANIMA_PIPELINE_MICROBATCHES", 0)
                      or 0) or int(config.BATCH_SIZE)
        if int(config.BATCH_SIZE) % micro_m:
            raise SystemExit(
                f"ANIMA_PIPELINE_MICROBATCHES={micro_m} does not divide "
                f"BATCH_SIZE={config.BATCH_SIZE}")
        pp_cfg_obj = pl_mod.PPConfig(pp_mesh, micro_m)
        trainable = pl_mod.stackify_params(trainable, dit_cfg.num_blocks)
        frozen = pl_mod.stackify_params(frozen, dit_cfg.num_blocks)
        print(f"INFO: Pipeline parallelism: {dit_cfg.num_blocks} DiT blocks "
              f"in {layout.pp} GPipe stages x {micro_m} microbatch(es) "
              f"per dp shard (dp={layout.dp}).")
    def _build_steps(param_shardings=None):
        micro = make_anima_micro_step(
            dit_cfg, grad_accum_steps=config.GRADIENT_ACCUMULATION_STEPS,
            compute_dtype=config.compute_dtype, attn_impl=attn_impl,
            remat=remat,
            spatial_strength=(lineart_strength if lineart_enabled else 0.0),
            accum_dtype=(plan.accum_dtype or jnp.float32), pp_cfg=pp_cfg_obj,
            param_shardings=param_shardings, gather_once=plan.gather_once)
        fused = (make_anima_fused_step(
            dit_cfg, opt_cfg, clip_grad_norm=clip,
            compute_dtype=config.compute_dtype, attn_impl=attn_impl,
            remat=remat,
            spatial_strength=(lineart_strength if lineart_enabled else 0.0),
            param_shardings=param_shardings, gather_once=plan.gather_once)
            if plan.fused_apply and pp_cfg_obj is None else None)
        return micro, fused

    micro, fused = _build_steps()

    def _flat_view():
        """Checkpoint/preview view: stacked block leaves back to the
        reference's flat names (no-op without pipeline parallelism)."""
        merged = {**frozen, **trainable}
        if pp_cfg_obj is None:
            return merged
        from ..parallel import pipeline as pl_mod
        return pl_mod.unstackify_params(merged, dit_cfg.num_blocks)

    def apply_(trainable, grad_accum, opt_state, lr):
        clipped, raw_norm = adamw.clip_by_global_norm(grad_accum, clip)
        new_params, new_state = adamw.apply_updates(
            trainable, clipped, opt_state, opt_cfg, lr=lr)
        # real "Update Magnitude" for the diagnostic block: global L2 norm
        # of the parameter delta, a free fused reduction in-jit
        delta_sq = sum(
            jnp.sum((n.astype(jnp.float32) - p.astype(jnp.float32)) ** 2)
            for n, p in zip(jax.tree.leaves(new_params),
                            jax.tree.leaves(trainable)))
        return new_params, new_state, raw_norm, jnp.sqrt(delta_sq)

    if resume_opt_state is not None and pp_cfg_obj is not None \
            and set(resume_opt_state.exp_avg) != set(trainable):
        # resume state saved by a non-pipeline run: restack the moment
        # dicts into the __stack__ namespace (plain-array moments only;
        # int8 (codes, scales) tuples cannot be jnp.stack'ed)
        from ..parallel import pipeline as pl_mod
        try:
            resume_opt_state = type(resume_opt_state)(*(
                pl_mod.stackify_params(f, dit_cfg.num_blocks)
                if isinstance(f, dict) else f
                for f in resume_opt_state))
            print("INFO: Restacked resumed optimizer state for pipeline "
                  "parallelism.")
        except Exception as e:  # noqa: BLE001 — fall through to fresh state
            print(f"WARNING: could not restack resumed optimizer state for "
                  f"pipeline parallelism ({e}); starting with fresh moments.")
    if resume_opt_state is not None and set(resume_opt_state.exp_avg) == set(trainable):
        # restored leaves are HOST numpy (ckpt.train_state): they reach
        # the device once, below, with the run's sharding — the zero
        # state is never allocated, so moments are resident exactly once
        # (the r4 full-size resume OOMed on the double residency)
        opt_state = resume_opt_state
        print("INFO: Restored optimizer state from resume checkpoint.")
    else:
        if resume_opt_state is not None:
            print("WARNING: resumed optimizer state keys do not match the "
                  "trainable set; starting with fresh moments.")
        opt_state = adamw.init_state(trainable, opt_cfg)
    del resume_opt_state

    # mesh: dp batch sharding + FSDP/ZeRO params and optimizer state
    use_mesh = layout.use_mesh
    mesh_shardings = None
    if use_mesh:
        mesh = (sp_mesh if sp_mesh is not None else
                pp_mesh if pp_mesh is not None else
                shard.make_mesh(layout.devices, dp=layout.dp, tp=layout.tp))
        mesh_shardings = {
            "trainable": shard.params_shardings(trainable, mesh),
            "frozen": shard.params_shardings(frozen, mesh),
            "grad_accum": shard.params_shardings(trainable, mesh),
            "opt_state": shard.opt_state_shardings(opt_state, mesh),
            "batch": jax.sharding.NamedSharding(
                mesh, jax.sharding.PartitionSpec("dp")),
            "replicated": shard.replicated(mesh),
        }
        trainable = shard.put_tree(trainable, mesh_shardings["trainable"])
        frozen = shard.put_tree(frozen, mesh_shardings["frozen"])
        opt_state = shard.put_tree(opt_state, mesh_shardings["opt_state"])
        if pp_cfg_obj is None:
            # rebuild the steps with the param shardings so the weight
            # precast (train_step.precast_params) pins bf16 copies to the
            # FSDP layout — the per-step weight all-gather then moves bf16,
            # not the fp32 master (skipped under pipeline parallelism:
            # stacked __stack__ leaves stream stage-local inside shard_map)
            micro, fused = _build_steps((mesh_shardings["trainable"],
                                         mesh_shardings["frozen"]))
        sh_b = mesh_shardings["batch"]
        sh_r = mesh_shardings["replicated"]
        micro_fn = jax.jit(
            micro, donate_argnums=(2,),
            in_shardings=(mesh_shardings["trainable"], mesh_shardings["frozen"],
                          mesh_shardings["grad_accum"], sh_b, sh_b, sh_b,
                          sh_b, sh_b, sh_b, sh_r, sh_r, sh_r, sh_r),
            out_shardings=(sh_r, sh_r, mesh_shardings["grad_accum"]))
        apply_fn = jax.jit(
            apply_, donate_argnums=(0, 1, 2),
            in_shardings=(mesh_shardings["trainable"],
                          mesh_shardings["grad_accum"],
                          mesh_shardings["opt_state"], sh_r),
            out_shardings=(mesh_shardings["trainable"],
                           mesh_shardings["opt_state"], sh_r, sh_r))
        fused_fn = (jax.jit(
            fused, donate_argnums=(0, 2),
            in_shardings=(mesh_shardings["trainable"],
                          mesh_shardings["frozen"],
                          mesh_shardings["opt_state"], sh_b, sh_b, sh_b,
                          sh_b, sh_b, sh_b, sh_r, sh_r, sh_r, sh_r),
            out_shardings=(sh_r, sh_r, mesh_shardings["trainable"],
                           mesh_shardings["opt_state"], sh_r, sh_r))
            if fused is not None else None)
    else:
        micro_fn = jax.jit(micro, donate_argnums=(2,))
        apply_fn = jax.jit(apply_, donate_argnums=(0, 1, 2))
        if fused is not None and plan.two_pass:
            # two-pass low-memory rung: the gradient tree never
            # materializes; all optimizer state stays in HBM
            from .train_step import jit_two_pass_fused
            fused_fn = jit_two_pass_fused(
                _make_anima_loss_fn(
                    dit_cfg, compute_dtype=config.compute_dtype,
                    attn_impl=attn_impl, remat=remat,
                    spatial_strength=(lineart_strength if lineart_enabled
                                      else 0.0)),
                opt_cfg, clip)
        elif fused is not None and plan.moments_host:
            # lowest-memory rung: moment trees live in pinned host memory
            # and stream through the fused update
            from .train_step import jit_moments_host
            s_host = jax.sharding.SingleDeviceSharding(
                layout.devices[0], memory_kind="pinned_host")
            opt_state = jax.device_put(opt_state, s_host)
            fused_fn = jit_moments_host(fused, layout.devices[0])
        else:
            fused_fn = (jax.jit(fused, donate_argnums=(0, 2))
                        if fused is not None else None)

    grad_accum = None
    if fused_fn is None:
        grad_accum = jax.tree.map(
            lambda p: jnp.zeros(p.shape, plan.accum_dtype or jnp.float32),
            trainable)
        if mesh_shardings is not None:
            grad_accum = shard.put_tree(grad_accum,
                                        mesh_shardings["grad_accum"])
    seed_arr = jnp.asarray(int(config.SEED or 42), jnp.int32)

    qat_residuals = None
    project_fn = None
    if device_projector is not None:
        if pp_cfg_obj is not None:
            # the projector's format map is keyed by flat tensor names;
            # with stacked __stack__ leaves it would silently no-op
            raise SystemExit("PIPELINE_PARALLEL_SIZE is not supported by "
                             "the QAT repair trainer (flat-name projector)")
        init_residuals, project = device_projector
        qat_residuals = init_residuals(trainable)
        project_fn = jax.jit(project, donate_argnums=(0, 1))
        print(f"INFO: in-jit QAT projection active on "
              f"{len(qat_residuals)} tensor(s) (device residuals, "
              "no host round-trip)")
    print_optimizer_summary(config, opt_cfg, trainable, lr_curve.initial_lr,
                            len(layout.devices) if use_mesh else 1)

    from .anima_sampler import AnimaPreviewRenderer, load_decoder_for_preview
    preview_decoder = None
    if int(getattr(config, "ANIMA_PREVIEW_EVERY_N_STEPS", 0) or 0) > 0:
        preview_decoder = load_decoder_for_preview(config)
    preview = AnimaPreviewRenderer(config, dit_cfg, attn_impl=base_attn_impl,
                                   compute_dtype=config.compute_dtype,
                                   decoder=preview_decoder)
    if preview.enabled:
        kind = "decoded pixels" if preview_decoder else "latent-RGB"
        print(f"INFO: preview sampling ({kind}) every {preview.every} "
              f"optimizer step(s)")

    # ---- loop ----
    reporter = MetricsReporter(total_steps=config.MAX_TRAIN_STEPS)
    prefetcher = BatchPrefetcher(
        dataset, packed, start_step=micro_step if config.RESUME_TRAINING else 0)
    diag_losses: deque = deque(maxlen=config.GRADIENT_ACCUMULATION_STEPS)
    step_times: deque = deque(maxlen=50)
    optim_times: deque = deque(maxlen=20)
    start = time.time()
    last_step = time.time()
    last_optim = time.time()
    ga = config.GRADIENT_ACCUMULATION_STEPS

    # SURVEY 5.1 parity with the SDXL trainer: AOZORA_PROFILE_DIR=/path
    # captures micro-steps 3..8 as a jax.profiler trace
    import os as _os
    profile_dir = _os.environ.get("AOZORA_PROFILE_DIR")
    profile_window = (3, 8)

    def save_checkpoint(step):
        stem = output_model_stem(config, config.DIT_PATH)
        torch_state = dit_mod.params_to_torch_state(_flat_view())
        torch_state = {k: np.asarray(v) for k, v in torch_state.items()}
        save_dit_model(output_dir / f"{stem}_step_{step}.safetensors",
                       torch_state, prefix=save_prefix,
                       dtype=config.compute_dtype)
        save_train_state(
            output_dir / f"{stem}_training_state_step_{step}.safetensors",
            global_step=step, micro_step=micro_step,
            opt_state=jax.tree.map(np.asarray, opt_state),
            sampler_seed=initial_sampler_seed, sampler_epoch=0,
            timestep_sampler_state=ts_sampler.state_dict(),
            extra={"schedule_global_batch": global_batch})

    for batch in prefetcher:
        if micro_step >= config.MAX_TRAIN_STEPS:
            break
        if not batch:
            continue
        micro_step += 1
        if profile_dir and micro_step == profile_window[0]:
            jax.profiler.start_trace(profile_dir)
        batch = pad_batch_arrays(batch, global_batch if use_mesh else 0)
        real_n = int(batch["real_n"])
        tickets = ts_sampler.sample(real_n)
        dev_b = batch["latents"].shape[0]
        if dev_b > real_n:
            tickets = tickets[np.arange(dev_b) % real_n]
        keep = 0.0 if (micro_step - 1) % ga == 0 else 1.0
        latents = batch["latents"]
        if latents.ndim == 4 and latents.shape[1] == dit_cfg.in_channels \
                and latents.shape[1] < latents.shape[-1]:
            latents = np.transpose(latents, (0, 2, 3, 1))  # NCHW cache -> NHWC
        spatial = batch.get("lineart_mask")
        spatial = (jnp.asarray(spatial, jnp.float32)
                   if lineart_enabled and spatial is not None else None)
        preview.capture_conditioning(latents, batch["prompt_emb"],
                                     batch["t5xxl_ids"])
        if fused_fn is not None:
            # low-memory GA=1 path: fwd+bwd+clip+update in one program
            lr = lr_curve.lr_at(micro_step)
            (loss_dev, sigma_dev, trainable, opt_state, raw_norm,
             update_norm) = fused_fn(
                trainable, frozen, opt_state, jnp.asarray(latents),
                jnp.asarray(batch["prompt_emb"]),
                jnp.asarray(batch["t5xxl_ids"]),
                jnp.asarray(tickets), jnp.asarray(batch["sample_mask"]),
                spatial, loss_weights, seed_arr,
                jnp.asarray(micro_step, jnp.int32),
                jnp.asarray(lr, jnp.float32))
        else:
            loss_dev, sigma_dev, grad_accum = micro_fn(
                trainable, frozen, grad_accum, jnp.asarray(latents),
                jnp.asarray(batch["prompt_emb"]), jnp.asarray(batch["t5xxl_ids"]),
                jnp.asarray(tickets), jnp.asarray(batch["sample_mask"]), spatial,
                loss_weights, seed_arr,
                jnp.asarray(micro_step, jnp.int32), jnp.asarray(keep, jnp.float32))

        loss_val = float(loss_dev)
        if profile_dir and micro_step == profile_window[1]:
            jax.profiler.stop_trace()
            reporter.log_message(
                f"INFO: profiler trace written to {profile_dir}")
        diag_losses.append(loss_val)
        block = None
        if micro_step % ga == 0:
            if fused_fn is None:
                lr = lr_curve.lr_at(micro_step)
                trainable, opt_state, raw_norm, update_norm = apply_fn(
                    trainable, grad_accum, opt_state,
                    jnp.asarray(lr, jnp.float32))
                grad_accum = jax.tree.map(
                    lambda p: jnp.zeros(p.shape,
                                        plan.accum_dtype or jnp.float32),
                    trainable)
                if mesh_shardings is not None:
                    grad_accum = shard.put_tree(grad_accum,
                                                mesh_shardings["grad_accum"])
            optimizer_step += 1
            if project_fn is not None:
                trainable, qat_residuals = project_fn(trainable, qat_residuals)
            if post_step_hook is not None:
                host = {k: np.asarray(v) for k, v in trainable.items()}
                projected = post_step_hook(host)
                trainable = {k: jnp.asarray(projected.get(k, v))
                             for k, v in host.items()}
            dt = time.time() - last_optim
            optim_times.append(dt)
            last_optim = time.time()
            rn = float(raw_norm)
            block = optimizer_block(
                optimizer_step, sum(diag_losses) / max(len(diag_losses), 1),
                lr, dt, sum(optim_times) / len(optim_times), rn,
                min(rn, clip) if clip > 0 else rn, float(update_norm))
            diag_losses.clear()
            scheduled = (config.SAVE_EVERY_N_STEPS > 0
                         and optimizer_step % config.SAVE_EVERY_N_STEPS == 0)
            forced = consume_force_save_flag(flag_path)
            if scheduled or forced:
                reason = ("Emergency checkpoint requested"
                          if forced and not scheduled else "Saving checkpoint")
                reporter.log_message(
                    f"\n--- {reason} at optimizer step {optimizer_step} ---")
                save_checkpoint(optimizer_step)
            preview.maybe_render(optimizer_step, _flat_view(),
                                 output_dir)

        now = time.time()
        step_times.append(now - last_step)
        last_step = now
        eta = ((config.MAX_TRAIN_STEPS - micro_step)
               * (sum(step_times) / len(step_times)))
        reporter.log_step(micro_step - 1, loss=loss_val,
                          timestep=int(tickets[0]), sigma=float(sigma_dev),
                          s_per_step=step_times[-1], eta=eta,
                          elapsed=now - start, optim_block=block)

    reporter.log_message("\nTraining complete.")
    reporter.shutdown()
    stem = output_model_stem(config, config.DIT_PATH)
    torch_state = {k: np.asarray(v) for k, v in
                   dit_mod.params_to_torch_state(_flat_view()).items()}
    save_dit_model(output_dir / f"{stem}.safetensors", torch_state,
                   prefix=save_prefix, dtype=config.compute_dtype)
    print("All tasks complete. Final model saved.")
    return {"trainable": trainable, "qat_residuals": qat_residuals}


def _dit_config_for_state(state: dict) -> dit_mod.AnimaDiTConfig:
    """Detect the DiT size from checkpoint shapes (supports tiny test models)."""
    from dataclasses import replace
    d = int(state["x_embedder.proj.1.weight"].shape[0])
    n = 0
    while f"blocks.{n}.self_attn.q_proj.weight" in state:
        n += 1
    hd = int(state["blocks.0.self_attn.q_norm.weight"].shape[0])
    ctx = int(state["blocks.0.cross_attn.k_proj.weight"].shape[1])
    lora = int(state["blocks.0.adaln_modulation_self_attn.1.weight"].shape[0])
    adapter_src = int(state["llm_adapter.blocks.0.cross_attn.k_proj.weight"].shape[1])
    adapter_tgt = int(state["llm_adapter.embed.weight"].shape[1])
    vocab = int(state["llm_adapter.embed.weight"].shape[0])
    an = 0
    while f"llm_adapter.blocks.{an}.cross_attn.q_proj.weight" in state:
        an += 1
    # latent channels from the patchify/unpatchify projections: torch
    # x_embedder.proj.1.weight is (d, (in+mask)*pt*ps^2) and
    # final_layer.linear.weight is (ps^2*pt*out, d).  Lets DiTs trained
    # against non-16-channel VAEs (and tiny test models) load without a
    # sidecar.
    base = dit_mod.ANIMA_BASE
    patch_elems = base.patch_temporal * base.patch_spatial ** 2
    in_ch = (int(state["x_embedder.proj.1.weight"].shape[1]) // patch_elems
             - (1 if base.concat_padding_mask else 0))
    out_ch = int(state["final_layer.linear.weight"].shape[0]) // patch_elems
    return replace(
        base, model_channels=d, num_blocks=n,
        num_heads=d // hd, adaln_lora_dim=lora, crossattn_emb_channels=ctx,
        in_channels=in_ch, out_channels=out_ch,
        adapter_source_dim=adapter_src, adapter_target_dim=adapter_tgt,
        adapter_layers=an, adapter_vocab=vocab,
        adapter_heads=adapter_tgt // int(
            state["llm_adapter.blocks.0.self_attn.q_norm.weight"].shape[0]),
        context_tokens=512 if d >= 1024 else 16)
