"""Memory-aware policy selection (train/memory_policy.py).

Pins the selection table for the configurations that matter (VERDICT r2
items #1/#4): full-SDXL single chip must drop to the low-memory mode
(bf16 master + fused GA + int8 moments + full remat), a v5e-8 FSDP run
keeps fp32 master and gets the fast no-remat flash config, and explicit
overrides always win.  Also checks fused-step == micro+apply numerics.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from aozora_sdxl_training_tpu.train import memory_policy as mp

GB = mp.GB

# full SDXL with the shipped default excludes (conv1, conv2):
# 2.271B trainable / 0.297B frozen (models/sdxl/arch.py)
SDXL_T = 2_271_000_000
SDXL_F = 297_000_000
LATPIX_1024 = 128 * 128
LATPIX_1536 = 192 * 192
V5E = int(15.5 * GB)


def plan(**kw):
    args = dict(trainable_elems=SDXL_T, frozen_elems=SDXL_F,
                batch_per_device=1, max_latent_pixels=LATPIX_1024,
                ga_steps=1, dp_shard=1, attn_pref="flash",
                requested_moment_dtype=jnp.bfloat16, budget_bytes=V5E)
    args.update(kw)
    return mp.plan_sdxl_training(**args)


def test_single_chip_full_sdxl_selects_two_pass():
    # r3 measured truth: the all-on-device fused step compiles to
    # 16.88 GB at 1024px b1 (args 9.09 + temps 7.54 incl 1.23 frag) and
    # OOMs the 15.75 GB chip; the pinned-host moment rung fits but
    # streams ~9 GB of state per step (~10 s/step measured on the real
    # chip).  The planner must land on the two-pass rung: gradient tree
    # never materializes, optimizer state stays in HBM.
    p = plan()
    assert p.master_dtype == jnp.bfloat16
    assert p.fused_apply and p.accum_dtype is None
    assert p.moment_dtype == "int8_blockwise"
    assert p.two_pass
    assert not p.moments_host                  # state stays in HBM
    assert p.remat is True                     # only full remat fits
    assert p.est_bytes <= V5E


def test_single_chip_int8_requested_stays_int8():
    p = plan(requested_moment_dtype="int8_blockwise")
    assert p.moment_dtype == "int8_blockwise"
    assert p.master_dtype == jnp.bfloat16
    assert p.two_pass and not p.moments_host


def test_lowmem_rungs_never_offered_under_fsdp():
    p = plan(dp_shard=8, ga_steps=4)
    assert not p.moments_host and not p.two_pass


def test_v5e8_fsdp_keeps_fp32_master_and_fast_remat():
    p = plan(dp_shard=8, ga_steps=4)
    assert p.master_dtype == jnp.float32
    assert p.accum_dtype == jnp.float32 and not p.fused_apply
    assert p.moment_dtype == jnp.bfloat16      # no downgrade needed
    # r5: gather-once compute replicas (train_step._compute_sharding)
    # keep the full 5.1 GB bf16 weight tree resident during the step —
    # no-remat activations (9.0 GB) no longer fit next to it, so the
    # planner drops one rung to hires remat (+3 ms compute, r2 table) in
    # exchange for ~half the per-step ICI weight traffic and zero
    # activation resharding.  One rung is within the gather-once
    # preference window, so the plan keeps gather-once.
    assert (p.attn_impl, p.remat) == ("flash", "dots_no_logits_hires")
    assert p.gather_once


def test_unconstrained_budget_picks_fastest():
    p = plan(budget_bytes=None, ga_steps=4)
    assert p.master_dtype == jnp.float32
    assert (p.attn_impl, p.remat) == ("flash", False)


def test_1536px_single_chip_full_remat():
    p = plan(max_latent_pixels=LATPIX_1536)
    # CLAUDE.md r2: 1536px b1 OOMs under every dots policy single-chip;
    # full remat + flash is the only fit — no env knob needed now
    assert p.remat is True and p.attn_impl == "flash"


def test_1536px_dp8_selects_fulltop_tier():
    # r4 (VERDICT r3 #5): with FSDP freeing the state, the 3-tier policy
    # (top level FULL remat, mid dots_no_logits, small resident) fits at
    # 1536px where plain hires misses by ~132 MB — the planner must pick
    # it over falling all the way to full remat.  r5: the 5.1 GB of
    # gather-once compute replicas would force full remat (2 rungs
    # slower) at this bucket, so the planner trades gather-once away and
    # keeps the faster fulltop rung on dp-sharded compute weights.
    p = plan(dp_shard=8, ga_steps=4, max_latent_pixels=LATPIX_1536)
    assert p.remat == "dots_no_logits_hires"
    # full_tokens = latpix//4: full-remat the top TWO stride levels — the
    # r5 on-chip measurement (top-only OOMs by 35 MB; //4 runs 870.5 ms
    # vs 1016.3 full-remat at 1536px b1)
    assert p.remat_thresholds == (4160, LATPIX_1536 // 4)
    assert not p.gather_once


def test_fulltop_tier_never_offered_at_1024px():
    # the <=1024px ladder is r2/r3-measured ground truth; the estimated
    # fulltop entry must not perturb those selections (it estimated within
    # 0.01 GB of the budget for full-SDXL two-pass — too tight to trust)
    for kwargs in ({}, {"dp_shard": 8, "ga_steps": 4},
                   {"trainable_elems": 120_000_000,
                    "frozen_elems": 2_447_000_000}):
        p = plan(**kwargs)
        assert p.remat_thresholds is None, kwargs


def test_fast_backward_gated_on_single_chip_two_pass():
    # r4 measured truth (TRAINRUN_r04): the full-size two-pass update pass
    # compiles to 17.77 GB with gemm2+fusedqkv vs 12.88 GB without — the
    # rewrites' workspace does not fit next to the low-memory rung.  The
    # rung selection itself must be unchanged.
    p = plan()
    assert p.two_pass and p.remat is True      # selection untouched
    assert not p.fast_backward
    assert "fast-backward rewrites gated" in p.reason


def test_fast_backward_kept_under_fsdp():
    # multi-chip FSDP shards the state; the fast backward (the r4 bench
    # default, 0.241 s/img) stays on
    p = plan(dp_shard=8, ga_steps=4)
    assert p.fast_backward


def test_fast_backward_kept_for_small_models():
    # fp32-master rungs (not low-memory) never gate
    p = plan(trainable_elems=120_000_000, frozen_elems=2_447_000_000)
    assert not p.low_memory and p.fast_backward


def test_remat_override_wins():
    p = plan(remat_override="dots_no_logits_hires", dp_shard=8, ga_steps=4)
    assert p.remat == "dots_no_logits_hires"


def test_master_override_wins():
    p = plan(master_override="bfloat16", dp_shard=8, ga_steps=4)
    assert p.master_dtype == jnp.bfloat16


def test_xla_pref_never_selects_flash():
    p = plan(attn_pref="xla", dp_shard=8, ga_steps=4)
    assert p.attn_impl == "xla"


def test_nothing_fits_falls_back_with_warning(capsys):
    p = plan(budget_bytes=int(6 * GB))
    assert p is not None  # smallest-footprint candidate, not an exception
    assert "WARNING" in capsys.readouterr().out


def test_ga_gt1_low_memory_uses_bf16_accum():
    p = plan(ga_steps=4)
    assert p.master_dtype == jnp.bfloat16
    assert p.accum_dtype == jnp.bfloat16 and not p.fused_apply


def test_fused_step_matches_micro_plus_apply():
    """GA=1 fused program == micro_step + apply_step numerics."""
    from aozora_sdxl_training_tpu.models.sdxl.arch import TINY
    from aozora_sdxl_training_tpu.models.sdxl.unet import init_params
    from aozora_sdxl_training_tpu.opt import adamw
    from aozora_sdxl_training_tpu.train.train_step import (
        TrainStepConfig, make_fused_step, make_micro_step, make_apply_step,
        split_trainable, zero_grad_accum)

    cfg = TrainStepConfig(unet=TINY, prediction_type="v_prediction",
                          grad_accum_steps=1, clip_grad_norm=1.0,
                          attn_impl="xla", compute_dtype=jnp.float32,
                          remat=False)
    opt_cfg = adamw.AdamWConfig(debias_strength=1.0)
    params = init_params(TINY, jax.random.PRNGKey(0))
    trainable, frozen = split_trainable(params, ["conv1"])
    b, hw, seq = 2, 16, 7
    key = jax.random.PRNGKey(1)
    latents = jax.random.normal(key, (b, hw, hw, 4))
    embeds = jax.random.normal(jax.random.fold_in(key, 1),
                               (b, seq, TINY.cross_attention_dim))
    pooled = jax.random.normal(jax.random.fold_in(key, 2),
                               (b, TINY.pooled_projection_dim))
    time_ids = jnp.ones((b, 6), jnp.float32)
    tickets = jnp.asarray([100, 700], jnp.int32)
    mask = jnp.ones((b,), jnp.float32)
    weights = jnp.ones((1000,), jnp.float32)
    seed = jnp.asarray(42, jnp.int32)
    ms = jnp.asarray(1, jnp.int32)
    lr = jnp.asarray(1e-3, jnp.float32)

    batch_args = (latents, embeds, pooled, time_ids, tickets, mask, weights,
                  seed, ms)

    state0 = adamw.init_state(trainable, opt_cfg)
    # path A: micro + apply
    micro = make_micro_step(cfg)
    apply_ = make_apply_step(cfg, opt_cfg)
    accum = zero_grad_accum(trainable)
    loss_a, sigma_a, accum = micro(trainable, frozen, accum, *batch_args,
                                   jnp.asarray(0.0))
    params_a, state_a, raw_a, _ = apply_(trainable, accum, state0, lr)
    # path B: fused
    fused = make_fused_step(cfg, opt_cfg)
    loss_b, sigma_b, params_b, state_b, raw_b, upd_b = fused(
        trainable, frozen, state0, *batch_args, lr)

    assert float(loss_a) == pytest.approx(float(loss_b), rel=1e-6)
    assert float(raw_a) == pytest.approx(float(raw_b), rel=1e-5)
    assert float(upd_b) > 0
    for k in params_a:
        np.testing.assert_allclose(np.asarray(params_a[k]),
                                   np.asarray(params_b[k]),
                                   rtol=1e-5, atol=1e-6, err_msg=k)
    np.testing.assert_allclose(np.asarray(state_a.exp_avg["conv_in.weight"]),
                               np.asarray(state_b.exp_avg["conv_in.weight"]),
                               rtol=1e-5, atol=1e-7)


def test_two_pass_matches_fused_step():
    """The two-pass wrapper (norm pass + recompute-update pass) must be
    numerically identical to the single fused program — same inputs, same
    pure function, clip scale from the precomputed norm."""
    from aozora_sdxl_training_tpu.models.sdxl.arch import TINY
    from aozora_sdxl_training_tpu.models.sdxl.unet import init_params
    from aozora_sdxl_training_tpu.opt import adamw
    from aozora_sdxl_training_tpu.train.train_step import (
        TrainStepConfig, make_fused_step, make_loss_fn, jit_two_pass_fused,
        split_trainable)

    cfg = TrainStepConfig(unet=TINY, prediction_type="v_prediction",
                          grad_accum_steps=1, clip_grad_norm=1.0,
                          attn_impl="xla", compute_dtype=jnp.float32,
                          remat=False)
    opt_cfg = adamw.AdamWConfig(debias_strength=1.0)
    params = init_params(TINY, jax.random.PRNGKey(0))
    trainable, frozen = split_trainable(params, ["conv1"])
    b, hw, seq = 2, 16, 7
    key = jax.random.PRNGKey(1)
    batch_args = (
        jax.random.normal(key, (b, hw, hw, 4)),
        jax.random.normal(jax.random.fold_in(key, 1),
                          (b, seq, TINY.cross_attention_dim)),
        jax.random.normal(jax.random.fold_in(key, 2),
                          (b, TINY.pooled_projection_dim)),
        jnp.ones((b, 6), jnp.float32),
        jnp.asarray([100, 700], jnp.int32),
        jnp.ones((b,), jnp.float32),
        jnp.ones((1000,), jnp.float32),
        jnp.asarray(42, jnp.int32),
        jnp.asarray(1, jnp.int32))
    lr = jnp.asarray(1e-3, jnp.float32)

    state0 = adamw.init_state(trainable, opt_cfg)
    fused = make_fused_step(cfg, opt_cfg)
    loss_a, sigma_a, params_a, state_a, raw_a, upd_a = fused(
        trainable, frozen, state0, *batch_args, lr)

    state0 = adamw.init_state(trainable, opt_cfg)
    two_pass = jit_two_pass_fused(make_loss_fn(cfg), opt_cfg,
                                  cfg.clip_grad_norm)
    loss_b, sigma_b, params_b, state_b, raw_b, upd_b = two_pass(
        trainable, frozen, state0, *batch_args, lr)

    assert float(loss_a) == pytest.approx(float(loss_b), rel=1e-6)
    assert float(sigma_a) == pytest.approx(float(sigma_b), rel=1e-6)
    assert float(raw_a) == pytest.approx(float(raw_b), rel=1e-5)
    assert float(upd_a) == pytest.approx(float(upd_b), rel=1e-4)
    # the two paths are different compilations of the same pure function;
    # fusion-order ulps in the recomputed grads matter because Adam's
    # first step is sign-like (m/sqrt(v) = g/|g| at step 1): a near-zero
    # grad element whose recompute shifts slightly moves its update by
    # O(lr * d|g|/|g|).  Tolerate isolated small-absolute outliers well
    # below the lr=1e-3 update scale (measured: 1 elem/16384 at abs
    # 8.7e-5).
    for k in params_a:
        np.testing.assert_allclose(np.asarray(params_a[k]),
                                   np.asarray(params_b[k]),
                                   rtol=2e-2, atol=2.5e-4, err_msg=k)
    # same recompute-ulp story for the moments: m = 0.1*g_clipped, and a
    # single grad element can shift ~1e-2 relative between the two
    # compilations when its backward chain nearly cancels (measured:
    # 1 elem/16384 at abs 8.7e-5)
    np.testing.assert_allclose(np.asarray(state_a.exp_avg["conv_in.weight"]),
                               np.asarray(state_b.exp_avg["conv_in.weight"]),
                               rtol=2e-2, atol=2e-4)


def test_anima_plan_single_chip_low_memory():
    """2.09B DiT, full model trainable, one 16 GB chip: bf16 master +
    int8 moments on the TWO-PASS rung under Full checkpointing.

    r4 measured truth: the plain fused+int8 step (no per-tensor barrier
    ties) compiled to 23.32 GB on v5e-1 (est was 14.00) — XLA hoists the
    un-barriered int8-moment decodes ahead of the backward.  Only the
    barriered two-pass rung is safe at this scale; there the grad tree is
    gone, so the REQUESTED bf16 moments fit without the int8 downgrade."""
    p = mp.plan_anima_training(
        trainable_elems=2_090_000_000, frozen_elems=0, batch_per_device=1,
        tokens=4096, ga_steps=1, remat=True, dp_shard=1,
        requested_moment_dtype=jnp.bfloat16, budget_bytes=V5E)
    assert p.master_dtype == jnp.bfloat16
    assert p.fused_apply and p.moment_dtype == jnp.bfloat16
    assert p.two_pass and not p.moments_host
    assert p.est_bytes <= V5E


def test_anima_fast_backward_gated_on_single_chip():
    """ADVICE r4 #1: the anima planner must model the fused-QKV backward
    workspace on the 2.09B single-chip low-memory rungs — the same class
    of compile-OOM the SDXL gate prevents (r4: 23.32 GB anima compile vs
    14.00 est)."""
    p = mp.plan_anima_training(
        trainable_elems=2_090_000_000, frozen_elems=0, batch_per_device=1,
        tokens=4096, ga_steps=1, remat="conservative", dp_shard=1,
        requested_moment_dtype=jnp.bfloat16, budget_bytes=V5E)
    assert p.low_memory
    ws = mp._ANIMA_FAST_BWD_BYTES_PER_TOKEN * 4096
    # the gate's arithmetic, not a re-derivation: gated iff est + ws > budget
    assert p.fast_backward == (p.est_bytes + ws <= V5E)


def test_apply_fast_backward_knobs(monkeypatch):
    """The plan's fast-backward decision must land in the trace-time env
    knobs: gated -> the FULL legacy trio incl. flash@2048 (flash@1024
    alone is a measured regression, ADVICE r4 #2); a later plan must
    overwrite a value a previous plan set (no stale setdefault), while an
    explicit user pin wins."""
    from dataclasses import replace

    for k in ("AOZORA_CONV_BWD", "AOZORA_FUSED_QKV", "AOZORA_FLASH_MIN_KV"):
        monkeypatch.delenv(k, raising=False)
    monkeypatch.setattr(mp, "_APPLIED_KNOBS", {})

    gated = replace(plan(), fast_backward=False)
    mp.apply_fast_backward_knobs(gated)
    import os
    assert os.environ["AOZORA_CONV_BWD"] == "xla"
    assert os.environ["AOZORA_FUSED_QKV"] == "0"
    assert os.environ["AOZORA_FLASH_MIN_KV"] == "2048"

    # a second run in the same process with fast_backward=True must win
    # over what WE set before (GUI multi-run processes)
    mp.apply_fast_backward_knobs(replace(gated, fast_backward=True))
    assert os.environ["AOZORA_CONV_BWD"] == "gemm2"
    assert os.environ["AOZORA_FUSED_QKV"] == "1"
    assert os.environ["AOZORA_FLASH_MIN_KV"] == "1024"

    # an explicit user pin (value we did not set) survives both decisions
    monkeypatch.setenv("AOZORA_CONV_BWD", "gemm")
    mp.apply_fast_backward_knobs(gated)
    assert os.environ["AOZORA_CONV_BWD"] == "gemm"
    assert os.environ["AOZORA_FUSED_QKV"] == "0"


def test_anima_plan_fsdp_keeps_fp32():
    p = mp.plan_anima_training(
        trainable_elems=2_090_000_000, frozen_elems=0, batch_per_device=1,
        tokens=4096, ga_steps=4, remat="conservative", dp_shard=8,
        requested_moment_dtype=jnp.bfloat16, budget_bytes=V5E)
    assert p.master_dtype == jnp.float32
    assert p.accum_dtype == jnp.float32 and p.moment_dtype == jnp.bfloat16


def test_two_pass_clip_disabled_collapses_to_one_program():
    """With clip_grad_norm <= 0 the rung is a single program (no norm
    pass) and must match the fused step exactly — same compilation count
    caveats don't apply since both are one program over the same math."""
    from aozora_sdxl_training_tpu.models.sdxl.arch import TINY
    from aozora_sdxl_training_tpu.models.sdxl.unet import init_params
    from aozora_sdxl_training_tpu.opt import adamw
    from aozora_sdxl_training_tpu.train.train_step import (
        TrainStepConfig, make_fused_step, make_loss_fn, jit_two_pass_fused,
        split_trainable)

    cfg = TrainStepConfig(unet=TINY, prediction_type="v_prediction",
                          grad_accum_steps=1, clip_grad_norm=0.0,
                          attn_impl="xla", compute_dtype=jnp.float32,
                          remat=False)
    opt_cfg = adamw.AdamWConfig(debias_strength=1.0)
    params = init_params(TINY, jax.random.PRNGKey(0))
    trainable, frozen = split_trainable(params, ["conv1"])
    b, hw, seq = 2, 16, 7
    key = jax.random.PRNGKey(1)
    batch_args = (
        jax.random.normal(key, (b, hw, hw, 4)),
        jax.random.normal(jax.random.fold_in(key, 1),
                          (b, seq, TINY.cross_attention_dim)),
        jax.random.normal(jax.random.fold_in(key, 2),
                          (b, TINY.pooled_projection_dim)),
        jnp.ones((b, 6), jnp.float32),
        jnp.asarray([100, 700], jnp.int32),
        jnp.ones((b,), jnp.float32),
        jnp.ones((1000,), jnp.float32),
        jnp.asarray(42, jnp.int32),
        jnp.asarray(1, jnp.int32))
    lr = jnp.asarray(1e-3, jnp.float32)

    state0 = adamw.init_state(trainable, opt_cfg)
    fused = make_fused_step(cfg, opt_cfg)
    loss_a, _, params_a, state_a, raw_a, upd_a = fused(
        trainable, frozen, state0, *batch_args, lr)

    state0 = adamw.init_state(trainable, opt_cfg)
    one_pass = jit_two_pass_fused(make_loss_fn(cfg), opt_cfg, 0.0)
    assert one_pass.norm_jit is None          # single-program mode
    loss_b, _, params_b, state_b, raw_b, upd_b = one_pass(
        trainable, frozen, state0, *batch_args, lr)

    assert float(loss_a) == pytest.approx(float(loss_b), rel=1e-6)
    assert float(raw_a) == pytest.approx(float(raw_b), rel=1e-5)
    assert float(upd_a) == pytest.approx(float(upd_b), rel=1e-4)
    # different compilation (barrier ties change fusion): Adam's first
    # step is sign-like, so a near-zero grad element whose recompute
    # shifts moves its update by O(lr) — same tolerance story as
    # test_two_pass_matches_fused_step above
    for k in params_a:
        np.testing.assert_allclose(np.asarray(params_a[k]),
                                   np.asarray(params_b[k]),
                                   rtol=2e-2, atol=2.5e-4, err_msg=k)
