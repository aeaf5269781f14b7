"""Benchmark: full SDXL UNet train micro-step (fwd+bwd) at 1024px on TPU.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Baseline: the reference's published 1.55 s/iteration micro-step at ~1024px,
batch 1, on a 12 GB consumer GPU (/root/reference/readme.md:14, BASELINE.md).
``vs_baseline`` is the speedup factor (baseline_s_per_image / ours).

Also reports (to stderr) the XLA-estimated model FLOPs utilisation so MFU
regressions are visible between rounds.
"""

from __future__ import annotations

import json
import os
import sys
import time

import jax
import jax.numpy as jnp

# First compile of the full UNet through the remote-TPU tunnel is slow;
# cache compiled executables across bench runs.
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

REFERENCE_S_PER_IMAGE = 1.55
# per-chip peak bf16 TFLOP/s (v5e ~197, v4 ~275, v5p ~459); used for MFU only
PEAK_FLOPS = {"v5 lite": 197e12, "v5e": 197e12, "v4": 275e12, "v5p": 459e12,
              "v6 lite": 918e12, "v6e": 918e12}


def peak_flops_for(device) -> float:
    kind = getattr(device, "device_kind", "").lower()
    for name, val in PEAK_FLOPS.items():
        if name in kind:
            return val
    return 197e12


def main_anima() -> None:
    """Optional secondary benchmark (``python bench.py --anima``): the
    2.09B Anima DiT flow-matching micro-step at 4096 tokens, Conservative
    checkpointing + flash hybrid (the r2-measured best: 498 ms on v5e-1,
    54% MFU; XLA attention is 1.9x slower).  The reference publishes no
    Anima numbers; this tracks regressions between rounds."""
    import subprocess
    res = subprocess.run(
        [sys.executable, "tools_dev/anima_perf_probe.py",
         "remat=conservative", "attn=flash", "batch=1"],
        capture_output=True, text=True, timeout=2400)
    line = [l for l in res.stdout.splitlines() if l.startswith("[anima]")]
    print(res.stdout, file=sys.stderr)
    if not line:
        raise SystemExit(f"anima bench failed: {res.stderr[-500:]}")
    ms = float(line[-1].split(": ")[1].split("ms")[0])
    print(json.dumps({
        "metric": "anima_dit_2b_flowmatch_microstep_s_per_clip",
        "value": round(ms / 1e3, 5), "unit": "s/clip"}))


def main() -> None:
    from aozora_sdxl_training_tpu.models.sdxl.arch import SDXL_BASE
    from aozora_sdxl_training_tpu.models.sdxl.unet import init_params, unet_forward
    from aozora_sdxl_training_tpu.train import objectives

    cfg = SDXL_BASE
    batch = int(os.environ.get("AOZORA_BENCH_BATCH", "1"))
    latent_hw = 128  # 1024px
    seq = 77
    # r4 defaults (v5e-1, 1024px b1), best measured config — ~0.2412
    # s/img (leave-one-out-attributed combo, bench_ab_sweep):
    # * attention: Pallas flash kernel (block_q=512, block_k=1024,
    #   dimension_semantics hints) at KV >= 1024 — both the 4096-token
    #   64x64 level AND the 1024-token 32x32 level — XLA's fused path
    #   below (ops/attention.FLASH_MIN_KV); flash at S=1024 only wins
    #   combined with the gemm2 conv backward + fused QKV (r4 LOO sweep);
    # * conv backward: GEMM-decomposed dW + dx (ops/conv.py, default
    #   gemm2) — the dgrad convs ran at 16% of peak as XLA transposed
    #   convs;
    # * fused q/k/v projections (ops/fused_proj.py, default on);
    # * remat: NONE.  The flash kernel saves only O(S) (out, lse)
    #   residuals instead of O(S^2) probs, which is what makes the full
    #   no-recompute backward fit in 16 GB at this shape (with XLA
    #   attention everywhere remat=False OOMs).
    # Measured ladder: full remat 353.5 > dots_no_logits 318.9 >
    # xla+hires 304.9 > flash+hires(4160) 266.5 > same with tuned kernel
    # blocks 250.8 > no-remat 248.3.  batch=2 worse per-image throughout.
    attn_impl = "flash"
    remat = False

    print(f"bench: backend={jax.default_backend()} batch={batch} "
          f"latent={latent_hw} attn={attn_impl}", file=sys.stderr)

    params = init_params(cfg, jax.random.PRNGKey(0), dtype=jnp.bfloat16)

    def loss_fn(params, latents, noise, tickets, embeds, pooled, time_ids):
        noisy, target, t_cond, _ = objectives.prepare_batch(
            "v_prediction", latents, noise, tickets)
        pred = unet_forward(params, noisy.astype(jnp.bfloat16), t_cond, embeds,
                            pooled, time_ids, cfg=cfg, attn_impl=attn_impl,
                            compute_dtype=jnp.bfloat16, remat=remat)
        return objectives.weighted_mse_loss(pred, target, tickets, None)

    value_and_grad = jax.value_and_grad(loss_fn)

    # A/B knob for the in-jit grad-norm reduction (r3): "dot" computes
    # each leaf's square-sum as a flat bf16 self-inner-product
    # (MXU-accumulated in fp32, no fp32 upcast traffic) instead of the
    # elementwise astype+square+reduce fusion.
    norm_impl = os.environ.get("AOZORA_NORM_IMPL", "sumsq")

    def _leaf_sq(g):
        if norm_impl == "dot":
            flat = g.reshape(-1)
            return jax.lax.dot_general(
                flat, flat, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
        return jnp.sum(g.astype(jnp.float32) ** 2)

    def _step(*a):
        # reduce grads to a norm inside jit: the real trainer feeds grads
        # into donated accumulators, so no 5 GB gradient pytree should ever
        # round-trip out of the step
        loss, grads = value_and_grad(*a)
        gsq = sum(_leaf_sq(g) for g in jax.tree.leaves(grads))
        return loss, jnp.sqrt(gsq)

    grad_fn = jax.jit(_step)

    key = jax.random.PRNGKey(1)
    latents = jax.random.normal(key, (batch, latent_hw, latent_hw, 4), jnp.float32)
    noise = jax.random.normal(jax.random.fold_in(key, 1), latents.shape, jnp.float32)
    tickets = jnp.full((batch,), 500, jnp.int32)
    embeds = jax.random.normal(jax.random.fold_in(key, 2),
                               (batch, seq, cfg.cross_attention_dim), jnp.bfloat16)
    pooled = jax.random.normal(jax.random.fold_in(key, 3),
                               (batch, cfg.pooled_projection_dim), jnp.bfloat16)
    time_ids = jnp.tile(jnp.asarray([[1024, 1024, 0, 0, 1024, 1024]],
                                    jnp.float32), (batch, 1))
    args = (params, latents, noise, tickets, embeds, pooled, time_ids)

    # compile + warmup
    t0 = time.perf_counter()
    loss, gnorm = grad_fn(*args)
    jax.block_until_ready(gnorm)
    compile_s = time.perf_counter() - t0
    print(f"bench: compile+first-step {compile_s:.1f}s loss={float(loss):.4f}",
          file=sys.stderr)

    iters = 10
    t0 = time.perf_counter()
    for _ in range(iters):
        loss, gnorm = grad_fn(*args)
    jax.block_until_ready(gnorm)
    dt = (time.perf_counter() - t0) / iters
    s_per_image = dt / batch

    # Two MFU accountings (both honest about Pallas custom calls, whose
    # flops XLA's cost_analysis() does NOT count — VERDICT r4 weak #3:
    # the r4 headline MFU silently shrank when FLASH_MIN_KV moved the
    # S=1024 attention levels into uncounted kernels):
    # * model: 3 x the XLA-ATTENTION forward's flops (from the lowered
    #   HLO, no compile) / time — a denominator invariant to the flash
    #   dispatch threshold, remat policy, and backward rewrites;
    # * executed: the compiled program's counted flops + the flash
    #   kernels' analytic flops (fwd 4*B*Sq*Skv*H*D per dispatch; our
    #   backward runs 5 same-shape matmuls vs the forward's 2, and the
    #   forward kernel does NOT re-run under the bench's remat=False or
    #   the dots policies — r2-verified — so fwd+bwd = 3.5x).
    mfu = model_mfu = None
    peak = peak_flops_for(jax.devices()[0])
    from aozora_sdxl_training_tpu.ops import attention as attn_mod
    flash_fwd_flops = 0.0
    try:
        attn_mod.ATTN_RECORD = rec = []
        jax.eval_shape(loss_fn, *args)
        attn_mod.ATTN_RECORD = None
        flash_fwd_flops = sum(4.0 * b * sq * skv * h * d
                              for (b, sq, skv, h, d, impl_) in rec
                              if impl_ == "flash")
    except Exception as e:
        attn_mod.ATTN_RECORD = None
        print(f"bench: attention dispatch recording failed: {e}",
              file=sys.stderr)
    try:
        cost = grad_fn.lower(*args).compile().cost_analysis()
        if isinstance(cost, list):
            cost = cost[0]
        flops = float(cost.get("flops", 0.0))
        if flops > 0:
            mfu = (flops + 3.5 * flash_fwd_flops) / dt / peak
    except Exception as e:
        print(f"bench: cost analysis unavailable: {e}", file=sys.stderr)
    # Analytic model-forward flops, pinned: SDXL_BASE fwd at latent
    # 128x128 b1, seq 77, XLA attention, from the lowered HLO's cost
    # analysis on CPU (reproduce: jit(unet_forward).lower(...)
    # .cost_analysis() with attn_impl="xla", remat=False).  Linear in
    # batch; falls back to recomputing if the bench shape ever changes.
    MODEL_FWD_FLOPS_B1 = 6.779495251968e12
    fwd_flops = MODEL_FWD_FLOPS_B1 * batch if latent_hw == 128 else 0.0
    if not fwd_flops:
        try:
            fwd = jax.jit(lambda p, l, t, e, pl_, ti: unet_forward(
                p, l, t, e, pl_, ti, cfg=cfg, attn_impl="xla",
                compute_dtype=jnp.bfloat16, remat=False))
            fcost = fwd.lower(params, latents.astype(jnp.bfloat16),
                              jnp.full((batch,), 500.0, jnp.float32), embeds,
                              pooled, time_ids).cost_analysis()
            if isinstance(fcost, list):
                fcost = fcost[0]
            fwd_flops = float((fcost or {}).get("flops", 0.0))
        except Exception as e:
            print(f"bench: fwd cost analysis unavailable: {e}",
                  file=sys.stderr)
    if fwd_flops > 0:
        model_mfu = 3.0 * fwd_flops / dt / peak
    print(f"bench: step={dt*1e3:.1f}ms  s/img={s_per_image:.4f}  "
          f"img/s/chip={1.0 / s_per_image:.2f}  "
          f"MFU(executed)~{(mfu or 0):.1%}  MFU(model)~{(model_mfu or 0):.1%}",
          file=sys.stderr)

    # secondary metric: fused optimizer-step time on an attention-only
    # trainable subset (reference: ~15 s CPU-offloaded, readme.md:14)
    try:
        del grad_fn, args, latents, noise, embeds, pooled
        jax.clear_caches()  # release the micro-step executable's buffers
        from aozora_sdxl_training_tpu.opt import adamw
        # self-attention queries only (~100M): the fp32 optimizer working
        # set is ~6 copies of the subset, and the 5 GB bf16 param dict is
        # freed below so the whole section fits beside nothing
        trainable = {k: jnp.asarray(v, jnp.float32) for k, v in params.items()
                     if ".attn1.to_q." in k}
        del params
        opt_cfg = adamw.AdamWConfig()
        state = adamw.init_state(trainable, opt_cfg)

        @jax.jit
        def opt_step(p, g, s):
            return adamw.apply_updates(p, g, s, opt_cfg, lr=1e-6)

        fake_grads = jax.tree.map(
            lambda x: jnp.ones(x.shape, jnp.float32) * 1e-4, trainable)
        p2, s2 = opt_step(trainable, fake_grads, state)
        jax.block_until_ready(p2)
        t0 = time.perf_counter()
        for _ in range(5):
            p2, s2 = opt_step(p2, fake_grads, s2)
        jax.block_until_ready(p2)
        opt_dt = (time.perf_counter() - t0) / 5
        n_el = sum(int(x.size) for x in trainable.values())
        print(f"bench: optimizer step ({n_el/1e6:.0f}M params) "
              f"{opt_dt*1e3:.1f}ms (reference: ~15000ms CPU-offloaded)",
              file=sys.stderr)
    except Exception as e:
        print(f"bench: optimizer-step timing skipped: {e}", file=sys.stderr)

    out = {
        "metric": "sdxl_1024px_vpred_full_unet_microstep_s_per_image",
        "value": round(s_per_image, 5),
        "unit": "s/image",
        "vs_baseline": round(REFERENCE_S_PER_IMAGE / s_per_image, 3),
    }
    if mfu is not None:
        out["mfu_executed_flops"] = round(mfu, 4)
    if model_mfu is not None:
        out["mfu_model_flops"] = round(model_mfu, 4)
    print(json.dumps(out))


class _Watchdog:
    """SIGALRM guard: the tunnel has two failure modes — fast backend-init
    errors and silent mid-run wedges (process sleeps indefinitely). Both are
    turned into a clean re-exec retry."""

    def __init__(self, seconds: int, what: str):
        self.seconds, self.what = seconds, what

    def __enter__(self):
        import signal

        def _fire(signum, frame):
            raise TimeoutError(f"{self.what} stalled > {self.seconds}s")

        signal.signal(signal.SIGALRM, _fire)
        signal.alarm(self.seconds)
        return self

    def __exit__(self, *exc):
        import signal
        signal.alarm(0)
        return False


def _retry_reexec(reason: str):
    import os
    attempt = int(os.environ.get("AOZORA_BENCH_ATTEMPT", "0"))
    if attempt >= 45:
        raise SystemExit(f"bench: giving up after 45 retries ({reason})")
    print(f"bench: {reason}; retrying in 60s (attempt {attempt + 1}/45)",
          file=sys.stderr)
    time.sleep(60)
    os.environ["AOZORA_BENCH_ATTEMPT"] = str(attempt + 1)
    os.execv(sys.executable, [sys.executable] + sys.argv)


if __name__ == "__main__":
    # The remote-TPU tunnel occasionally drops for minutes (fast init error)
    # or wedges silently (first device op never returns); backend-init
    # failure is cached per-process, so re-exec to retry cleanly either way.
    try:
        with _Watchdog(180, "backend init"):
            jax.devices()
    except (RuntimeError, TimeoutError) as e:
        _retry_reexec(f"backend not ready: {e}")
    try:
        with _Watchdog(2400, "bench run"):  # > worst observed legit compile
            main_anima() if "--anima" in sys.argv else main()
    except TimeoutError as e:
        _retry_reexec(str(e))
