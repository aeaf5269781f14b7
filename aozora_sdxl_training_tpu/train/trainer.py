"""SDXL training loop: host orchestration around the jitted step functions.

The TPU re-architecture of the reference's ``main()``
(/root/reference/train.py:2545-2836): same phases — cache → load → schedule →
train → save — but the hot path is two compiled XLA programs (micro-step and
optimizer-step) fed by a background batch prefetcher, with one executable per
bucket shape.  Differences by design:

* optimizer state lives in HBM (sharded over the mesh when multi-device)
  instead of CPU offload — the 15 s optimizer step becomes microseconds;
* all RNG is stateless (seed, step) fold-ins, so resume needs only counters;
* loss readback lags one step so device dispatch never stalls on the host.

GUI compatibility is preserved: same stdout grammar (reporter), same
``force_save.flag`` emergency-checkpoint handshake (train.py:2534-2541), same
JSON config schema, same output filenames.
"""

from __future__ import annotations

import time
from collections import deque
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from ..ckpt.sd_checkpoint import (detect_unet_io_channels, load_sd_tensors,
                                  save_merged_checkpoint)
from ..ckpt.train_state import (check_resume_global_batch, load_train_state,
                                output_model_stem, save_train_state)
from ..data.cache_builder import check_if_caching_needed, precompute_and_cache
from ..data.dataset import (BatchPrefetcher, CachedLatentDataset,
                            pack_sample_schedule, pad_batch_arrays)
from ..data.schedule import TimestepTicketSampler, build_image_batch_schedule
from ..models.sdxl.arch import SDXL_BASE, UNetConfig
from ..models.sdxl.conversion import params_from_sd_state
from ..opt import adamw
from ..parallel import sharding as shard
from . import curves
from .reporter import MetricsReporter
from .train_step import (TrainStepConfig, jit_train_functions, split_trainable,
                         zero_grad_accum)


def force_save_flag_path() -> Path:
    """``force_save.flag`` in the working directory — the GUI drops the flag
    next to the trainer script it launched, which is the process CWD here."""
    return Path.cwd() / "force_save.flag"


def consume_force_save_flag(flag_path: Path) -> bool:
    if not flag_path.exists():
        return False
    try:
        flag_path.unlink()
        return True
    except OSError as e:
        print(f"WARNING: Emergency checkpoint flag found but could not be "
              f"deleted: {e}")
        return False


def unet_config_for_checkpoint(path, sidecar_fallback=None) -> UNetConfig:
    """UNetConfig for a single-file checkpoint.

    A ``<checkpoint>.arch.json`` sidecar overrides any field of the base
    config (non-stock SDXL-family UNets); resume checkpoints fall back to the
    *base* model's sidecar (``sidecar_fallback``), since a mid-training save
    has the same architecture as the model it trains.  Otherwise only the
    in/out channel counts are peeked from conv shapes (parity:
    train.py:1437-1455).
    """
    import json
    from dataclasses import fields, replace
    sidecar = Path(str(path) + ".arch.json")
    if not sidecar.exists() and sidecar_fallback is not None:
        sidecar = Path(str(sidecar_fallback) + ".arch.json")
    overrides = {}
    if sidecar.exists():
        with open(sidecar, "r", encoding="utf-8") as f:
            raw = json.load(f)
        valid = {fld.name for fld in fields(UNetConfig)}
        overrides = {k: (tuple(v) if isinstance(v, list) else v)
                     for k, v in raw.items() if k in valid}
        print(f"INFO: UNet architecture overrides from {sidecar.name}: "
              f"{sorted(overrides)}")
    in_ch, out_ch = detect_unet_io_channels(path)
    overrides.setdefault("in_channels", in_ch)
    overrides.setdefault("out_channels", out_ch)
    return replace(SDXL_BASE, **overrides)


def make_optimizer_config(config) -> adamw.AdamWConfig:
    opt_type = str(config.OPTIMIZER_TYPE).lower()
    raw = {}
    if opt_type == "titan":
        raw = dict(getattr(config, "TITAN_PARAMS", {}) or {})
    elif opt_type == "raven":
        raw = dict(getattr(config, "RAVEN_PARAMS", {}) or {})
    elif opt_type == "paged_adamw_8bit":
        raw = dict(getattr(config, "PAGED_ADAMW_8BIT_PARAMS", {}) or {})
        raw.setdefault("debias_strength", 1.0)  # standard AdamW bias correction
        # bnb's paged blockwise-8-bit state -> int8 moments with per-block
        # scales in HBM (no paging needed on TPU)
        raw.setdefault("momentum_dtype", "int8_blockwise")
    else:
        raise ValueError(f"Unsupported optimizer type: '{config.OPTIMIZER_TYPE}'")
    return adamw.AdamWConfig.from_params_dict(raw)


def print_optimizer_summary(config, opt_cfg: adamw.AdamWConfig, trainable,
                            initial_lr: float, n_devices: int) -> None:
    names = {"raven": "RavenAdamW", "titan": "TitanAdamW",
             "paged_adamw_8bit": "PagedAdamW8bit"}
    key = str(config.OPTIMIZER_TYPE).lower()
    n_tensors = len(trainable)
    n_elements = sum(int(p.size) for p in trainable.values())
    print("\n" + "=" * 58)
    print("INFO: Optimizer Configuration")
    print(f"  - Optimizer:           {names.get(key, key)} (TPU sharded-state AdamW)")
    print(f"  - Config key:          {key}")
    print(f"  - Trainable tensors:   {n_tensors:,}")
    print(f"  - Trainable elements:  {n_elements:,}")
    print(f"  - Initial LR:          {initial_lr:.8g}")
    print(f"  - Betas:               {tuple(opt_cfg.betas)}")
    print(f"  - Epsilon:             {opt_cfg.eps:.8g}")
    print(f"  - Weight decay:        {opt_cfg.weight_decay:.8g}")
    print(f"  - Debias strength:     {opt_cfg.debias_strength:.8g}")
    dtype_name = (opt_cfg.momentum_dtype if isinstance(opt_cfg.momentum_dtype, str)
                  else jnp.dtype(opt_cfg.momentum_dtype).name)
    print(f"  - Momentum state:      HBM {dtype_name}, "
          f"sharded over {n_devices} device(s) (ZeRO)")
    if opt_cfg.int8_state:
        n_exempt = sum(1 for p in trainable.values()
                       if int(p.size) < opt_cfg.min_8bit_size)
        print(f"  - Min 8-bit size:      {opt_cfg.min_8bit_size} "
              f"({n_exempt} small tensor(s) keep fp32 state)")
    print("  - Update math:         fused FP32 XLA kernel (no host offload)")
    print("=" * 58 + "\n")
    # The reference GUI strips this prefix and forwards the payload to its
    # paramInfoSignal (/root/reference/gui/gui.py:2727-2728); keep the
    # channel alive so that readout works when the PyQt GUI drives us.
    print(f"GUI_PARAM_INFO::Trainable: {n_elements:,} elements in "
          f"{n_tensors:,} tensors | Optimizer: {names.get(key, key)} | "
          f"LR: {initial_lr:.8g}", flush=True)


def print_dataset_resolution_sample(dataset, sample_count: int = 5) -> None:
    """Log the first cached items' bucket geometry (train.py:2224-2242)."""
    sample_count = min(sample_count, len(dataset.items))
    if sample_count <= 0:
        return
    plural = "s" if sample_count != 1 else ""
    print(f"INFO: Dataset resolution sample ({sample_count} cached item{plural}):")
    for item in dataset.items[:sample_count]:
        ow, oh = item["original_size"]
        tw, th = item["target_size"]
        orig_ar = ow / oh if oh else 1.0
        targ_ar = tw / th if th else 1.0
        ar_err = (abs(orig_ar - targ_ar) / orig_ar * 100) if orig_ar else 0.0
        stem = Path(item.get("relative_path", item["lat_path"])).stem
        variant = item.get("bucket_variant_index", 0)
        label = f", variant {variant}" if variant else ""
        print(f"INFO:   {stem}: original {ow}x{oh} (AR {orig_ar:.4f}) -> "
              f"target {tw}x{th} (AR {targ_ar:.4f}){label}, "
              f"AR diff {ar_err:.2f}%, cropped not stretched")


def print_param_stats(trainable: dict, frozen: dict) -> None:
    t = sum(int(p.size) for p in trainable.values())
    f = sum(int(p.size) for p in frozen.values())
    total = t + f
    print(f"\n{'=' * 50}\nINFO: UNet Parameter Statistics:")
    print(f"  - Total Parameters:     {total:,}")
    print(f"  - Frozen Parameters:    {f:,}")
    print(f"  - Trainable Parameters: {t:,}")
    print(f"  - Percentage Frozen:    {(f / max(total, 1)) * 100:.2f}%")
    print("=" * 50 + "\n")


def _sdxl_remat_mode():
    """Explicit rematerialization override for the SDXL UNet, or None when
    unset — in which case train.memory_policy picks the fastest measured
    mode that fits the device HBM budget.
    AOZORA_SDXL_REMAT={full,dots,dots_no_logits,dots_no_logits_hires,off}
    pins the mode (models/sdxl/unet._maybe_remat)."""
    import os
    mode = os.environ.get("AOZORA_SDXL_REMAT", "").strip().lower()
    if not mode or mode == "auto":
        return None
    if mode in ("off", "none", "0", "false"):
        return False
    if mode in ("dots", "dots_no_batch", "dots_no_logits",
                "dots_no_logits_hires", "full_hires"):
        return mode
    return True


def run_sdxl_training(config, *, unet_cfg: UNetConfig | None = None) -> None:
    """``unet_cfg`` overrides checkpoint-shape detection (tiny test models)."""
    output_dir = Path(config.OUTPUT_DIR)
    output_dir.mkdir(parents=True, exist_ok=True)
    flag_path = force_save_flag_path()

    mode_str = ("RECTIFIED FLOW" if config.is_rectified_flow
                else f"STANDARD SDXL ({config.PREDICTION_TYPE})")

    # ---- resume ----
    global_step = micro_step = optimizer_step = 0
    resume_meta, resume_opt_state = None, None
    model_to_load = Path(config.SINGLE_FILE_CHECKPOINT_PATH)
    initial_sampler_seed = config.SEED
    initial_ts_state = None
    if config.RESUME_TRAINING:
        print("\n" + "=" * 50 + "\n--- RESUMING TRAINING SESSION ---\n")
        resume_meta, resume_opt_state = load_train_state(config.RESUME_STATE_PATH)
        global_step = int(resume_meta.get("global_step", 0))
        micro_step = int(resume_meta.get(
            "micro_step", global_step * config.GRADIENT_ACCUMULATION_STEPS))
        optimizer_step = micro_step // config.GRADIENT_ACCUMULATION_STEPS
        initial_sampler_seed = int(resume_meta.get("sampler_seed", config.SEED))
        initial_ts_state = resume_meta.get("timestep_sampler_state")
        model_to_load = Path(config.RESUME_MODEL_PATH)
    else:
        print("\n" + "=" * 50 + f"\n--- STARTING {mode_str} TRAINING ---\n" + "=" * 50 + "\n")
    print(f"INFO: Noise type: {getattr(config, 'NOISE_MODE', 'normal')}")
    print(f"INFO: Set random seed to {config.SEED}")

    # ---- caching ----
    if check_if_caching_needed(config):
        precompute_and_cache(config)

    # ---- model config (weights load AFTER the memory plan) ----
    print("\n--- Loading Model ---")
    if unet_cfg is None:
        unet_cfg = unet_config_for_checkpoint(
            model_to_load, sidecar_fallback=config.SINGLE_FILE_CHECKPOINT_PATH)
    print(f"INFO: Detected UNet configuration - in_channels: "
          f"{unet_cfg.in_channels}, out_channels: {unet_cfg.out_channels}")

    # ---- mesh layout (decides the global batch the schedules use) ----
    layout = shard.resolve_mesh_layout(config)
    global_batch = layout.global_batch
    if resume_meta is not None:
        check_resume_global_batch(resume_meta, global_batch)

    # ---- schedules ----
    print("\n--- Initializing Dataset ---")
    dataset = CachedLatentDataset(config)
    print_dataset_resolution_sample(dataset)
    ts_sampler = TimestepTicketSampler(config, batch_size=global_batch)
    if initial_ts_state is not None:
        ts_sampler.load_state_dict(initial_ts_state)
    elif config.RESUME_TRAINING and micro_step > 0:
        ts_sampler.set_current_step(micro_step)
    loss_weights_np = curves.timestep_loss_curve_from_config(config, 1000)

    image_schedule = build_image_batch_schedule(
        dataset.bucket_keys, config.MAX_TRAIN_STEPS, global_batch,
        initial_sampler_seed, ts_sampler.ticket_pool, ts_sampler.bin_ranges,
        bool(getattr(config, "TIMESTEP_FORCE_IMAGE_BIN_SPREAD", False)))
    packed_schedule = pack_sample_schedule(image_schedule, global_batch)
    print(f"INFO: Precomputed image batch schedule for {len(packed_schedule):,} step(s).")

    # ---- memory plan (master/accum/moment dtypes, attn, remat) ----
    from dataclasses import replace as _dc_replace

    from ..models.sdxl.arch import param_shapes
    from . import memory_policy

    opt_cfg = make_optimizer_config(config)
    shapes = param_shapes(unet_cfg)
    sizes = {n: int(np.prod(s)) for n, (s, _) in shapes.items()}
    t_names, _ = split_trainable(sizes, config.UNET_EXCLUDE_TARGETS)
    trainable_elems = sum(t_names.values())
    frozen_elems = sum(sizes.values()) - trainable_elems
    max_latpix = max(
        ((w // 8) * (h // 8) for (w, h) in dataset.bucket_keys),
        default=128 * 128)
    # Attention backend switch (the reference's sdpa/cudnn/xformers knob,
    # train.py:197-229): on TPU every CUDA-backend option maps to the
    # hybrid path — Pallas flash kernel at long-KV self-attention
    # (>= ops/attention.FLASH_MIN_KV tokens), XLA's fused attention
    # below — the r2-measured e2e optimum.  "xla"/"einsum" opt out.
    attn_pref = ("xla" if str(getattr(
        config, "MEMORY_EFFICIENT_ATTENTION", "sdpa")).lower()
        in ("xla", "einsum") or jax.default_backend() != "tpu"
        else "flash")
    plan = memory_policy.plan_sdxl_training(
        trainable_elems=trainable_elems, frozen_elems=frozen_elems,
        batch_per_device=int(config.BATCH_SIZE),
        max_latent_pixels=int(max_latpix),
        ga_steps=int(config.GRADIENT_ACCUMULATION_STEPS),
        dp_shard=(layout.dp if layout.use_mesh else 1),
        attn_pref=attn_pref,
        requested_moment_dtype=opt_cfg.momentum_dtype,
        budget_bytes=memory_policy.device_budget_bytes(layout.devices[0]),
        remat_override=_sdxl_remat_mode(),
        master_override=str(getattr(config, "MASTER_DTYPE", "auto")))
    print(memory_policy.describe_plan(plan))
    # The r4 fast-backward rewrites (GEMM conv backward, fused QKV,
    # flash@1024) are trace-time env knobs; the plan decides whether their
    # workspace fits (an explicit user AOZORA_* pin always wins).
    memory_policy.apply_fast_backward_knobs(plan)
    if plan.moment_dtype != opt_cfg.momentum_dtype:
        print("WARNING: moment storage downgraded to int8_blockwise to fit "
              "the HBM budget (update math is unchanged — fp32 scratch).")
        opt_cfg = _dc_replace(opt_cfg, momentum_dtype=plan.moment_dtype)

    # ---- model weights ----
    sd_tensors = load_sd_tensors(model_to_load)
    params = params_from_sd_state(sd_tensors, unet_cfg,
                                  dtype=plan.master_dtype)
    # preview sampling (TPU extension): keep the VAE decoder half around
    # when PREVIEW_EVERY_N_STEPS > 0 (train/sampler.py)
    vae_decoder_params = None
    if int(getattr(config, "PREVIEW_EVERY_N_STEPS", 0) or 0) > 0:
        from ..models.sdxl import vae as vae_mod
        try:
            vae_decoder_params = vae_mod.params_from_sd_state(
                sd_tensors, dtype=jnp.float32, include_decoder=True)
        except ValueError as e:
            print(f"WARNING: preview sampling disabled: {e}")
    del sd_tensors

    trainable, frozen = split_trainable(params, config.UNET_EXCLUDE_TARGETS)
    print_param_stats(trainable, frozen)

    # ---- optimizer / jit ----
    lr_curve = curves.LRCurve(config.LR_CUSTOM_CURVE, config.MAX_TRAIN_STEPS,
                              fallback_lr=getattr(config, 'LEARNING_RATE', None))
    step_cfg = TrainStepConfig(
        unet=unet_cfg,
        prediction_type=config.PREDICTION_TYPE,
        grad_accum_steps=config.GRADIENT_ACCUMULATION_STEPS,
        clip_grad_norm=float(config.CLIP_GRAD_NORM),
        attn_impl=plan.attn_impl,
        compute_dtype=config.compute_dtype,
        remat=plan.remat,
        remat_thresholds=plan.remat_thresholds,
        accum_dtype=(plan.accum_dtype or jnp.float32),
        gather_once=plan.gather_once)

    from .sampler import PreviewRenderer
    preview = PreviewRenderer(config, unet_cfg,
                              attn_impl=step_cfg.attn_impl,
                              compute_dtype=step_cfg.compute_dtype,
                              decoder_params=vae_decoder_params)
    if preview.enabled:
        print(f"INFO: preview sampling every {preview.every} optimizer "
              f"step(s) ({getattr(config, 'PREVIEW_SAMPLE_STEPS', 20)} "
              f"DDIM/Euler steps)")

    use_mesh = layout.use_mesh
    shardings = None
    if use_mesh:
        mesh = shard.make_mesh(layout.devices, dp=layout.dp, tp=layout.tp)
        shardings = {
            "trainable": shard.params_shardings(trainable, mesh),
            "frozen": shard.params_shardings(frozen, mesh),
            "grad_accum": shard.params_shardings(trainable, mesh),
            "opt_state": None,  # filled below
            "batch": jax.sharding.NamedSharding(
                mesh, jax.sharding.PartitionSpec("dp")),
            "replicated": shard.replicated(mesh),
        }

    # Decide restore-vs-fresh BEFORE allocating anything on device: the
    # restored leaves are host numpy (ckpt.train_state), and initializing
    # a zero moment tree first would put ~2x trainable bytes of dead
    # zeros next to the restored tree — the double residency that OOMed
    # the r4 full-size Anima resume on v5e-1.
    opt_state = None
    if resume_opt_state is not None:
        loaded_m = {k: v for k, v in resume_opt_state.exp_avg.items() if k in trainable}
        loaded_v = {k: v for k, v in resume_opt_state.exp_avg_sq.items() if k in trainable}
        if set(loaded_m) == set(trainable):
            opt_state = adamw.AdamWState(step=resume_opt_state.step,
                                         exp_avg=loaded_m, exp_avg_sq=loaded_v)
            print("INFO: Restored optimizer state from resume checkpoint.")
        else:
            print("WARNING: Resume optimizer state does not match trainable set; "
                  "starting moments fresh.")
    if opt_state is None:
        opt_state = adamw.init_state(trainable, opt_cfg)
    del resume_opt_state
    if shardings is not None:
        shardings["opt_state"] = shard.opt_state_shardings(opt_state, mesh)
        trainable = shard.put_tree(trainable, shardings["trainable"])
        frozen = shard.put_tree(frozen, shardings["frozen"])
        opt_state = shard.put_tree(opt_state, shardings["opt_state"])

    fused_fn = micro_fn = apply_fn = grad_accum = None
    if plan.fused_apply:
        from .train_step import jit_fused_function
        if plan.two_pass and not use_mesh:
            # two-pass low-memory rung: the gradient tree never
            # materializes; all optimizer state stays in HBM
            from .train_step import jit_two_pass_fused, make_loss_fn
            fused_fn = jit_two_pass_fused(make_loss_fn(step_cfg), opt_cfg,
                                          step_cfg.clip_grad_norm)
        elif plan.moments_host and not use_mesh:
            # lowest-memory rung: park the moment trees in pinned host
            # memory; the fused step streams them through the update
            dev = layout.devices[0]
            s_host = jax.sharding.SingleDeviceSharding(
                dev, memory_kind="pinned_host")
            opt_state = jax.device_put(opt_state, s_host)
            fused_fn = jit_fused_function(step_cfg, opt_cfg,
                                          moments_host=True, device=dev)
        else:
            fused_fn = jit_fused_function(step_cfg, opt_cfg,
                                          shardings=shardings)
    else:
        micro_fn, apply_fn = jit_train_functions(step_cfg, opt_cfg,
                                                 shardings=shardings)
        grad_accum = zero_grad_accum(trainable, step_cfg.accum_dtype)
    loss_weights = jnp.asarray(loss_weights_np)
    seed_arr = jnp.asarray(int(config.SEED or 42), jnp.int32)

    print_optimizer_summary(config, opt_cfg, trainable, lr_curve.initial_lr,
                            len(layout.devices) if use_mesh else 1)

    # ---- loop ----
    reporter = MetricsReporter(total_steps=config.MAX_TRAIN_STEPS)

    def upload(batch):
        # H2D copies happen in the prefetch thread, overlapping device compute
        # pad ragged batches up to the global batch (dp-divisible, one
        # compiled shape); sample_mask zeroes the padding out of the loss
        out = pad_batch_arrays(batch, global_batch if use_mesh else 0)
        for key in ("latents", "embeds", "pooled", "time_ids", "sample_mask"):
            arr = jnp.asarray(out[key])
            if use_mesh:
                arr = jax.device_put(arr, shardings["batch"])
            out[key] = arr
        return out

    prefetcher = BatchPrefetcher(dataset, packed_schedule,
                                 start_step=micro_step if config.RESUME_TRAINING else 0,
                                 transform=upload)
    diag_losses: deque = deque(maxlen=config.GRADIENT_ACCUMULATION_STEPS)
    step_times: deque = deque(maxlen=50)
    optim_times: deque = deque(maxlen=20)
    start_time = time.time()
    last_step_time = time.time()
    last_optim_time = time.time()
    ga = config.GRADIENT_ACCUMULATION_STEPS

    pending = None  # (micro_step, loss_dev, sigma_dev, ticket, optim_diag)

    # SURVEY §5.1: profiler trace behind a flag — AOZORA_PROFILE_DIR=/path
    # captures steps 3..8 as a jax.profiler trace (view with tensorboard/xprof)
    import os as _os
    profile_dir = _os.environ.get("AOZORA_PROFILE_DIR")
    profile_window = (3, 8)

    def emit(pending_entry, s_per_step):
        ms, loss_dev, sigma_dev, ticket, diag = pending_entry
        loss_val = float(loss_dev)
        diag_losses.append(loss_val)
        block = None
        if diag is not None:
            from .reporter import optimizer_block
            raw_norm = float(diag["raw_norm"])
            clipped = (min(raw_norm, step_cfg.clip_grad_norm)
                       if step_cfg.clip_grad_norm > 0 else raw_norm)
            block = optimizer_block(
                diag["optim_step"],
                sum(diag_losses) / max(len(diag_losses), 1),
                diag["lr"], diag["optim_step_time"],
                sum(optim_times) / max(len(optim_times), 1),
                raw_norm, clipped, float(diag["update_norm"]))
            diag_losses.clear()
        eta = ((config.MAX_TRAIN_STEPS - ms)
               * (sum(step_times) / max(len(step_times), 1))
               if step_times else 0)
        reporter.log_step(
            ms - 1, loss=loss_val, timestep=ticket,
            sigma=(float(sigma_dev) if config.is_rectified_flow else None),
            s_per_step=s_per_step, eta=eta,
            elapsed=time.time() - start_time, optim_block=block)

    def save_checkpoint(step):
        stem = output_model_stem(config, config.SINGLE_FILE_CHECKPOINT_PATH)
        model_file = output_dir / f"{stem}_step_{step}.safetensors"
        state_file = output_dir / f"{stem}_training_state_step_{step}.safetensors"
        full = {**frozen, **trainable}
        save_merged_checkpoint(model_file, full, unet_cfg,
                               config.SINGLE_FILE_CHECKPOINT_PATH,
                               config.compute_dtype)
        save_train_state(
            state_file, global_step=step, micro_step=micro_step,
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
        # tickets are consumed for REAL samples only, then padded to the
        # device batch — pool consumption is identical across mesh shapes
        real_n = int(batch.get("real_n", batch["latents"].shape[0]))
        preview.capture_conditioning(batch["latents"], batch["embeds"],
                                     batch["pooled"], batch["time_ids"])
        tickets = ts_sampler.sample(real_n)
        ticket0 = int(tickets[0])
        dev_b = batch["latents"].shape[0]
        if dev_b > real_n:
            tickets = tickets[np.arange(dev_b) % real_n]
        keep = 0.0 if (micro_step - 1) % ga == 0 else 1.0

        diag = None
        if fused_fn is not None:
            # low-memory GA=1 path: fwd+bwd+clip+update in one program,
            # parameter/state buffers donated — no grad-accum tree exists
            lr = lr_curve.lr_at(micro_step)
            (loss_dev, sigma_dev, trainable, opt_state, raw_norm,
             update_norm) = fused_fn(
                trainable, frozen, opt_state,
                jnp.asarray(batch["latents"]), jnp.asarray(batch["embeds"]),
                jnp.asarray(batch["pooled"]), jnp.asarray(batch["time_ids"]),
                jnp.asarray(tickets), jnp.asarray(batch["sample_mask"]),
                loss_weights, seed_arr,
                jnp.asarray(micro_step, jnp.int32),
                jnp.asarray(lr, jnp.float32))
        else:
            loss_dev, sigma_dev, grad_accum = micro_fn(
                trainable, frozen, grad_accum,
                jnp.asarray(batch["latents"]), jnp.asarray(batch["embeds"]),
                jnp.asarray(batch["pooled"]), jnp.asarray(batch["time_ids"]),
                jnp.asarray(tickets), jnp.asarray(batch["sample_mask"]),
                loss_weights, seed_arr,
                jnp.asarray(micro_step, jnp.int32), jnp.asarray(keep, jnp.float32))

        if micro_step % ga == 0:
            if fused_fn is None:
                lr = lr_curve.lr_at(micro_step)
                trainable, opt_state, raw_norm, update_norm = apply_fn(
                    trainable, grad_accum, opt_state,
                    jnp.asarray(lr, jnp.float32))
                grad_accum = zero_grad_accum(trainable, step_cfg.accum_dtype)
                if shardings is not None:
                    grad_accum = shard.put_tree(grad_accum,
                                                shardings["grad_accum"])
            optimizer_step += 1
            global_step = optimizer_step
            optim_dt = time.time() - last_optim_time
            optim_times.append(optim_dt)
            last_optim_time = time.time()
            diag = {"optim_step": optimizer_step, "lr": lr,
                    "raw_norm": raw_norm, "update_norm": update_norm,
                    "optim_step_time": optim_dt}

            scheduled = (config.SAVE_EVERY_N_STEPS > 0
                         and optimizer_step % config.SAVE_EVERY_N_STEPS == 0)
            forced = consume_force_save_flag(flag_path)
            if scheduled or forced:
                reason = ("Emergency checkpoint requested"
                          if forced and not scheduled else "Saving checkpoint")
                reporter.log_message(
                    f"\n--- {reason} at optimizer step {optimizer_step} ---")
                save_checkpoint(optimizer_step)
            preview.maybe_render(optimizer_step, trainable, frozen, output_dir)

        if profile_dir and micro_step == profile_window[1]:
            jax.block_until_ready(loss_dev)
            jax.profiler.stop_trace()
            reporter.log_message(f"INFO: profiler trace written to {profile_dir}")

        # report the *previous* step so we never block on the in-flight one
        now = time.time()
        step_times.append(now - last_step_time)
        last_step_time = now
        if pending is not None:
            emit(pending, step_times[-1])
        pending = (micro_step, loss_dev, sigma_dev, ticket0, diag)

    if pending is not None:
        emit(pending, step_times[-1] if step_times else 0.0)
    reporter.log_message("\nTraining complete.")
    reporter.shutdown()

    stem = output_model_stem(config, config.SINGLE_FILE_CHECKPOINT_PATH)
    save_merged_checkpoint(
        output_dir / f"{stem}.safetensors", {**frozen, **trainable}, unet_cfg,
        config.SINGLE_FILE_CHECKPOINT_PATH, config.compute_dtype)
    print("All tasks complete. Final model saved.")
