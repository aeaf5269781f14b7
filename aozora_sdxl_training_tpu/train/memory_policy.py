"""Memory-aware training-policy selection (remat / attention / state dtypes).

The reference "just works" at any resolution on a 12 GB GPU because Raven/
Titan park optimizer state in CPU RAM and gradient-checkpointing is always
on (/root/reference/training_utils/optimizers/raven.py:122-147,
train.py:2660) — paying a ~15 s optimizer step and heavy recompute for the
fit.  The TPU rebuild instead *plans*: given the model size, the trainable
split, the largest bucket shape, and the device HBM budget, pick the fastest
measured (attention, remat) configuration and the cheapest state layout that
still fits — no env knobs required.

Two stacked ladders:

* **state ladder** (quality first): fp32 master weights + fp32 grad-accum
  tree (the multi-chip/ small-model default, identical to round-2 behavior)
  → fp32 master + fused GA=1 step (no accum tree) → bf16 master (the
  reference's own training precision — raven.py updates through an fp32
  scratch exactly like opt/adamw.apply_updates) with a bf16 accum tree or
  the fused step → additionally int8-blockwise moments when the requested
  moment dtype cannot fit (printed loudly; the update math is unchanged,
  storage only).
* **speed ladder** (per attention impl, fastest first): the r2-measured
  e2e table from CLAUDE.md — flash+no-remat 248 ms < flash+hires 251 <
  xla+hires 305 < xla+dots_no_logits 319 < full remat 353 (1024px b1
  v5e-1).  Activation footprints are estimated per mode from the same
  measurements' fit/OOM boundaries (conservative, linear in
  batch x latent-pixels) and refined against the real compiler by
  ``tools_dev/aot_memory_probe.py``.

``plan_sdxl_training`` returns a :class:`MemoryPlan`; the trainer applies
it wholesale.  Explicit knobs still win: ``AOZORA_SDXL_REMAT`` pins the
remat mode, ``MASTER_DTYPE`` (config) pins the master precision.
"""

from __future__ import annotations

import os
from dataclasses import dataclass
from typing import Any

import jax
import jax.numpy as jnp

MB = 1024 * 1024
GB = 1024 * MB

# Estimated activation+workspace bytes per (batch x latent-pixel), bf16
# compute, full SDXL-width UNet.  Calibrated from the r2 fit/OOM evidence
# (see module docstring); deliberately conservative (high).
_ACT_BYTES_PER_LATPIX = {
    ("flash", False): 0.55 * MB,
    ("xla", False): 0.85 * MB,
    ("flash", "dots_no_logits_hires"): 0.30 * MB,
    ("xla", "dots_no_logits_hires"): 0.33 * MB,
    ("flash", "dots_no_logits"): 0.34 * MB,
    ("xla", "dots_no_logits"): 0.34 * MB,
    ("flash", "dots"): 0.66 * MB,
    ("xla", "dots"): 0.70 * MB,
    ("flash", True): 0.05 * MB,
    ("xla", True): 0.05 * MB,
    # 3-tier (r4): biggest levels FULL remat, mid levels dots_no_logits,
    # small levels resident.  The 1536px evidence (r5, measured on v5e-1
    # micro-step): plain hires ~0.293 MB/latpix OOMs by 132 MB;
    # full-remat of the top level ONLY still OOMs by 35 MB; full-remat of
    # the top TWO stride levels (full_tokens = latpix//4) FITS and runs
    # 870.5 ms/step vs 1016.3 full-remat — the threshold the planner
    # emits below.
    ("flash", "dots_no_logits_hires", "fulltop"): 0.27 * MB,
    ("xla", "dots_no_logits_hires", "fulltop"): 0.30 * MB,
}

# Speed ladders: fastest-first (attn, remat[, tier]) entries, from the
# r2-measured e2e table.  The flash kernel only wins where its level is
# NOT remated, so flash is never paired with plain dots policies.  The
# "fulltop" tier sits between plain hires and dots_no_logits: same policy
# with the top (no-attention) level fully rematerialized — chosen at big
# buckets where plain hires misses the budget by a few hundred MB.
_LADDER_FLASH = [
    ("flash", False, None),
    ("flash", "dots_no_logits_hires", None),
    ("flash", "dots_no_logits_hires", "fulltop"),
    ("xla", "dots_no_logits", None),
    ("flash", True, None),
]
_LADDER_XLA = [
    ("xla", False, None),
    ("xla", "dots_no_logits_hires", None),
    ("xla", "dots_no_logits_hires", "fulltop"),
    ("xla", "dots_no_logits", None),
    ("xla", True, None),
]

# Backward-workspace cost of the r4 fast-backward rewrites (GEMM-decomposed
# conv backward + fused QKV).  Measured at full-size 1024px b1 on the
# two-pass update pass: 17.77 GB with the rewrites vs 12.88 GB without
# (+4.89 GB at 16384 latent pixels -> ~0.30 MB/latpix; the 9-tap dgrad
# dot_generals and fused-weight cotangent concats materialize temps the
# window-dilated XLA backward never does).  The planner keeps its pinned
# rung selection and only gates the rewrites: when the selected rung is a
# single-chip low-memory one and est + this workspace exceeds the budget,
# the plan pins the legacy backward (AOZORA_CONV_BWD=xla, AOZORA_FUSED_QKV
# =0) — this is exactly the configuration that OOMed the full-size descent
# run's compile until the knobs were hand-pinned (TRAINRUN_r04).
_FAST_BWD_BYTES_PER_LATPIX = 0.31 * MB

# Reserved headroom: XLA workspace, batch buffers (double-buffered
# prefetch), preview/save transients, fragmentation slack.
_RESERVE_BYTES = int(0.4 * GB)
# multiplicative slack on the state accounting (replicated small tensors
# under FSDP, allocator rounding)
_STATE_SLACK = 1.02


@dataclass(frozen=True)
class MemoryPlan:
    master_dtype: Any          # trainable master-weight dtype
    frozen_dtype: Any          # frozen-parameter storage dtype
    accum_dtype: Any | None    # grad-accum tree dtype; None = fused step
    fused_apply: bool          # GA folded into the micro step (GA == 1)
    moment_dtype: Any          # resolved moment storage (may downgrade)
    attn_impl: str
    remat: Any                 # False | True | mode string
    est_bytes: int             # peak estimate at the chosen config
    budget_bytes: int
    reason: str                # human-readable selection trace
    moments_host: bool = False  # optimizer moments parked in pinned_host
    two_pass: bool = False      # norm pass + recompute-update pass (GA=1)
    # (hires_tokens, full_tokens) for "*_hires" remat modes; None keeps the
    # model's env-tunable defaults (no full-remat tier)
    remat_thresholds: tuple | None = None
    # r4 default backward rewrites (GEMM conv backward + fused QKV) allowed?
    # False when their measured workspace doesn't fit next to a single-chip
    # low-memory state rung; the trainer then pins the legacy knobs.
    fast_backward: bool = True
    # r5 multi-chip weight layout: True pins each bf16 compute weight
    # dp-gathered for the whole micro-step (one all-gather per weight per
    # step, fully local consumers — see train_step._compute_sharding) at
    # the cost of the full bf16 weight tree resident; False keeps the
    # compute copies dp-sharded (per-consumer gathers, ~2x weight ICI
    # traffic + GSPMD activation resharding) to free that HBM at big
    # buckets.  Irrelevant single-chip.
    gather_once: bool = True

    @property
    def low_memory(self) -> bool:
        return self.master_dtype == jnp.bfloat16


def dtype_bytes(dtype) -> float:
    if dtype == "int8_blockwise":
        return 1.0 + 4.0 / 256.0          # int8 codes + fp32 block scales
    return jnp.dtype(dtype).itemsize


def device_budget_bytes(device=None) -> int | None:
    """Per-device HBM budget, or None when the backend doesn't report one
    (CPU/virtual meshes: treat as unconstrained)."""
    dev = device or jax.devices()[0]
    if dev.platform != "tpu":
        return None
    try:
        stats = dev.memory_stats()
        limit = int(stats.get("bytes_limit", 0))
        return limit or None
    except Exception:  # noqa: BLE001 — backends without memory_stats
        return int(15.5 * GB)             # v5e default assumption


def state_bytes(trainable_elems: int, frozen_elems: int, *,
                master_dtype, frozen_dtype, accum_dtype, moment_dtype,
                dp_shard: int = 1, moments_host: bool = False,
                fused: bool = False, two_pass: bool = False,
                gather_once: bool = True) -> dict[str, int]:
    """Per-device resident + transient state accounting.

    Under FSDP the master/moment/accum trees shard over ``dp_shard``
    (small replicated tensors make this slightly optimistic; the 5%
    slack term compensates).  ``moments_host=True`` parks the moment
    trees in pinned host memory (they cost a streaming buffer, not HBM
    residency).  ``fused=True`` adds the measured fused-step overhead:
    the full-size compile shows ~16% HLO-temp fragmentation plus update
    transients that the plain sum misses (r3 OOM report: est 14.77 GB
    vs 16.88 GB actual at 1024px b1 full-SDXL).
    """
    shard = max(int(dp_shard), 1)
    t, f = int(trainable_elems), int(frozen_elems)
    master = t * dtype_bytes(master_dtype) / shard
    frozen = f * dtype_bytes(frozen_dtype) / shard
    moments = 2 * t * dtype_bytes(moment_dtype) / shard
    accum = t * dtype_bytes(accum_dtype) / shard if accum_dtype else 0
    if two_pass:
        # each gradient dies at its only consumer (square-sum reduction
        # in pass 1, its parameter's update in pass 2) — only per-tensor
        # scratch is ever alive, never the tree.  This requires the
        # per-tensor optimization_barrier tie in jit_two_pass_fused:
        # without it XLA hoists every moment decode to t=0 (19.54 GB HLO
        # temp, OOM); with it the full-SDXL AOT compile measures norm
        # pass 7.41 GB / update pass 12.88 GB total (temps 3.79) on the
        # 15.75 GB chip — the 1.5 GB combined allowance here is calibrated
        # against that measurement.
        grads = int(0.5 * GB)
    else:
        # backward produces a full gradient tree in the master dtype; with
        # grad clipping every leaf is alive until the global norm is known
        grads = t * dtype_bytes(master_dtype) / shard
    if moments_host:
        # moments stream through a bounded staging window, not residency
        hbm_moments = int(0.5 * GB) if moments else 0
    else:
        hbm_moments = moments
    # gather-once compute replicas (train_step._compute_sharding): under
    # FSDP every >=2-D weight's bf16 compute copy is pinned dp-gathered for
    # the whole micro-step — one all-gather per weight per step and fully
    # local consumers, at the cost of the full bf16 weight tree resident
    # next to the activations (conservative: ignores tp sharding of the
    # compute copy).
    compute_replicas = 2 * (t + f) if (shard > 1 and gather_once) else 0
    resident = master + frozen + hbm_moments + accum + compute_replicas
    peak = (resident + grads) * _STATE_SLACK
    if two_pass:
        # fp32 update scratch (m/v/p per tensor) in pass 2 + scheduling
        # slack (same conservative stance as above)
        peak += int(1.0 * GB)
    elif fused:
        # fragmentation among ~800 odd-sized grad buffers interleaved
        # with activation temps + fp32 update scratch, calibrated on the
        # measured full-size compile (see docstring)
        peak += 0.16 * grads + int(0.6 * GB)
        if moment_dtype == "int8_blockwise" and not moments_host:
            # The plain fused step has NO per-tensor barrier ties (only
            # jit_two_pass_fused does): every int8-moment decode depends
            # only on program arguments, so XLA's latency-hiding scheduler
            # hoists them ahead of the backward — up to 2x trainable of
            # fp32 decode scratch alive at once.  Measured: 19.54 GB HLO
            # temp on full SDXL (r3 AOT probe, barrierless program) and a
            # 23.32 GB compile (est 14.00) that OOMed the full-size Anima
            # fused+int8 step on v5e-1 (r4).  Assume full hoisting.
            peak += 2 * t * 4 / shard
    return {"master": int(master), "frozen": int(frozen),
            "moments": int(moments), "accum": int(accum),
            "grads_transient": int(grads),
            "resident": int(resident),
            "peak_state": int(peak)}


def _gate_fast_backward(plan: MemoryPlan, batch: int,
                        latent_pixels: int,
                        ws_bytes_per_unit: float | None = None
                        ) -> MemoryPlan:
    """Disable the r4 fast-backward rewrites on a selected plan when their
    measured workspace does not fit next to a single-chip low-memory state
    rung (see ``_FAST_BWD_BYTES_PER_LATPIX``).  Rung selection itself is
    untouched — the r2/r3-measured ladder stays ground truth."""
    if not (plan.low_memory and plan.fused_apply and plan.budget_bytes):
        return plan
    coeff = (ws_bytes_per_unit if ws_bytes_per_unit is not None
             else _FAST_BWD_BYTES_PER_LATPIX)
    ws = int(coeff * batch * latent_pixels)
    if plan.est_bytes + ws <= plan.budget_bytes:
        return plan
    from dataclasses import replace
    note = (f"fast-backward rewrites gated: est {plan.est_bytes / GB:.2f} "
            f"+ workspace {ws / GB:.2f} GB > budget "
            f"{plan.budget_bytes / GB:.2f} GB -> legacy conv backward / "
            "unfused QKV")
    return replace(plan, fast_backward=False,
                   reason=plan.reason + "\n" + note)


# Which of the trace-time backward knobs the USER had pinned when the
# planner last applied a plan — tracked by value so a knob this module set
# on a previous run (GUI-driven multi-run processes, the pytest suite)
# never masquerades as a user pin (ADVICE r4: plumbing the plan through
# os.environ.setdefault let stale values win over the current plan).
_APPLIED_KNOBS: dict[str, str] = {}


def apply_fast_backward_knobs(plan: MemoryPlan) -> None:
    """Materialize the plan's fast-backward decision into the trace-time
    env knobs read by ops/conv.py, ops/fused_proj.py and ops/attention.py.

    * ``fast_backward=True``: the r4 LOO-attributed default combo
      (gemm2 conv backward + fused QKV + flash@1024) — the three rewrites
      only win TOGETHER (AB_SWEEP_r04: each alone regresses).
    * gated: the full legacy combo including ``AOZORA_FLASH_MIN_KV=2048``
      — flash@1024 without gemm2+fusedqkv is a measured regression
      (0.25144 vs 0.24837 s/img) and the legacy trio is exactly the
      compile-validated TRAINRUN_r04 full-size configuration.

    An explicit user pin (a value we did not set ourselves) always wins.
    """
    desired = {
        "AOZORA_CONV_BWD": "gemm2" if plan.fast_backward else "xla",
        "AOZORA_FUSED_QKV": "1" if plan.fast_backward else "0",
        "AOZORA_FLASH_MIN_KV": "1024" if plan.fast_backward else "2048",
    }
    for key, val in desired.items():
        current = os.environ.get(key)
        user_pinned = (current is not None
                       and current != _APPLIED_KNOBS.get(key))
        if not user_pinned:
            os.environ[key] = val
            _APPLIED_KNOBS[key] = val


# Fused-QKV backward workspace for the Anima DiT (bytes per batch x token).
# No convs in the DiT, so only the wide-GEMM cotangent concat applies:
# each block's backward materializes a [B, T, 3*2048] bf16 qkv-cotangent
# (12 KB/token) and the latency-hiding scheduler keeps ~20 block backwards
# in flight at full size (r4 OOM dump evidence for the attention temps) ->
# ~0.25 MB/token, conservative.  Calibrate against a full-size AOT compile
# when the gate first fires on-chip.
_ANIMA_FAST_BWD_BYTES_PER_TOKEN = 0.25 * MB


def activation_bytes(attn_impl: str, remat, batch: int,
                     latent_pixels: int, tier: str | None = None) -> int:
    key = (attn_impl, remat, tier) if tier else (attn_impl, remat)
    coeff = _ACT_BYTES_PER_LATPIX.get(key)
    if coeff is None:  # unknown combo: assume the worst measured
        coeff = 0.9 * MB
    return int(coeff * batch * latent_pixels)


def _ladder_for(attn_pref: str):
    return _LADDER_FLASH if attn_pref == "flash" else _LADDER_XLA


def _state_candidates(ga_steps: int, master_override,
                      requested_moment_dtype, *,
                      allow_moments_host: bool = False):
    """Quality-first (master, accum, fused, moment, host, two_pass)
    layouts.

    The single-chip GA=1 rungs after the plain fused candidates
    (``allow_moments_host`` gates both):

    * **two-pass** — norm pass + recompute-update pass; the gradient
      tree never materializes, all state stays in HBM.  ~2x backward
      compute (train_step.jit_two_pass_fused).
    * **pinned-host moments** — the TPU-native equivalent of the
      reference's Raven/Titan optimizer-state CPU offload
      (/root/reference/training_utils/optimizers/raven.py:122-147); the
      update still runs fused on-device but the moment trees stream
      over PCIe every step (r3 measured ~10 s/step for full SDXL —
      last resort).  int8 moments go first there: once you're
      streaming, transfer bytes are the step-time tax.
    """
    out = []
    if master_override and str(master_override) != "auto":
        masters = [jnp.bfloat16 if "bfloat16" in str(master_override)
                   else jnp.float32]
    else:
        masters = [jnp.float32, jnp.bfloat16]
    # Dev/test knob: pin a specific low-memory rung so the CPU e2e drives
    # (verify circuit) can exercise paths the unconstrained-budget planner
    # would never pick on a dev box.
    forced = os.environ.get("AOZORA_LOWMEM_RUNG", "")
    if forced and allow_moments_host and ga_steps == 1:
        if forced == "two_pass":
            return [(jnp.bfloat16, None, True, "int8_blockwise", False, True)]
        if forced == "moments_host":
            return [(jnp.bfloat16, None, True, "int8_blockwise", True, False)]
    for master in masters:
        accum_opts: list[tuple[Any, bool]] = []
        if master == jnp.float32:
            accum_opts.append((jnp.float32, False))
            if ga_steps == 1:
                accum_opts.append((None, True))
        else:
            if ga_steps == 1:
                accum_opts.append((None, True))
            accum_opts.append((jnp.bfloat16, False))
        moment_opts = [requested_moment_dtype]
        if (master == jnp.bfloat16
                and requested_moment_dtype != "int8_blockwise"):
            moment_opts.append("int8_blockwise")
        for accum_dtype, fused in accum_opts:
            for moment in moment_opts:
                out.append((master, accum_dtype, fused, moment, False, False))
    if allow_moments_host and ga_steps == 1 and jnp.bfloat16 in masters:
        if requested_moment_dtype != "int8_blockwise":
            out.append((jnp.bfloat16, None, True, requested_moment_dtype,
                        False, True))
        out.append((jnp.bfloat16, None, True, "int8_blockwise", False, True))
        out.append((jnp.bfloat16, None, True, "int8_blockwise", True, False))
        if requested_moment_dtype != "int8_blockwise":
            out.append((jnp.bfloat16, None, True, jnp.bfloat16, True, False))
    return out


# Anima DiT activation footprints (bytes per batch x token, 2048-wide
# 28-block model, bf16 compute) keyed by the trainer's checkpointing mode
# knob — crude but conservative bounds from the r2 probe evidence
# (conservative+flash runs 4096 tokens b1 comfortably on v5e-1).
_ANIMA_ACT_BYTES_PER_TOKEN = {
    # Full checkpointing: the r4 full-size OOM dump shows the backward
    # keeps >=20 x 64 MB attention dot_general fusion temps alive at 4096
    # tokens (latency-hiding scheduler overlapping block backwards), so
    # 0.10 MB/token was optimistic; 0.25 covers the measured temp set.
    True: 0.25 * MB,
    "conservative": 0.60 * MB,  # saves mlp_down + flash (out,lse)
    False: 2.0 * MB,            # no recompute
}


def plan_anima_training(*, trainable_elems: int, frozen_elems: int,
                        batch_per_device: int, tokens: int, ga_steps: int,
                        remat, dp_shard: int = 1,
                        requested_moment_dtype: Any = jnp.bfloat16,
                        budget_bytes: int | None = None,
                        master_override: str | None = None) -> MemoryPlan:
    """State-dtype plan for the Anima DiT trainer.

    Unlike the SDXL planner this does NOT choose remat/attention — the
    checkpointing mode is a user-facing reference-parity knob
    (ANIMA_GRADIENT_CHECKPOINTING_MODE); only the master/accum/moment
    layout is selected so full-model 2.09B single-chip training fits.
    """
    act = int(_ANIMA_ACT_BYTES_PER_TOKEN.get(remat, 2.0 * MB)
              * batch_per_device * tokens)
    trace: list[str] = []
    best_fallback = None
    gather_modes = [True, False] if dp_shard > 1 else [True]
    for master, accum_dtype, fused, moment, host, two_pass in _state_candidates(
            ga_steps, master_override, requested_moment_dtype,
            allow_moments_host=(dp_shard == 1)):
        frozen_dtype = jnp.bfloat16 if master == jnp.bfloat16 else jnp.float32
        for g in gather_modes:
            st = state_bytes(trainable_elems, frozen_elems,
                             master_dtype=master, frozen_dtype=frozen_dtype,
                             accum_dtype=accum_dtype, moment_dtype=moment,
                             dp_shard=dp_shard, moments_host=host,
                             fused=fused, two_pass=two_pass, gather_once=g)
            est = st["peak_state"] + act + _RESERVE_BYTES
            fits = budget_bytes is None or est <= budget_bytes
            trace.append(
                f"{jnp.dtype(master).name}-master/"
                f"{'fused' if fused else jnp.dtype(accum_dtype).name + '-accum'}/"
                f"{moment if isinstance(moment, str) else jnp.dtype(moment).name}"
                f"-moments{'@host' if host else ''}"
                f"{'/two-pass' if two_pass else ''}"
                f"{'/gather-once' if g and dp_shard > 1 else ''}: "
                f"{est / GB:.2f} GB "
                f"{'<=' if fits else '>'} {(budget_bytes or 0) / GB:.2f} -> "
                f"{'SELECTED' if fits else 'skip'}")
            plan = MemoryPlan(master_dtype=master, frozen_dtype=frozen_dtype,
                              accum_dtype=accum_dtype, fused_apply=fused,
                              moment_dtype=moment, attn_impl="flash",
                              remat=remat, est_bytes=int(est),
                              budget_bytes=int(budget_bytes or 0),
                              reason="\n".join(trace), moments_host=host,
                              two_pass=two_pass, gather_once=g)
            if fits:
                return _gate_fast_backward(
                    plan, batch_per_device, tokens,
                    ws_bytes_per_unit=_ANIMA_FAST_BWD_BYTES_PER_TOKEN)
            if best_fallback is None or est < best_fallback.est_bytes:
                best_fallback = plan
    print("WARNING: no Anima state layout fits the estimated HBM budget; "
          "attempting the smallest candidate.\n" + "\n".join(trace))
    return _gate_fast_backward(
        best_fallback, batch_per_device, tokens,
        ws_bytes_per_unit=_ANIMA_FAST_BWD_BYTES_PER_TOKEN)


def plan_sdxl_training(*, trainable_elems: int, frozen_elems: int,
                       batch_per_device: int, max_latent_pixels: int,
                       ga_steps: int, dp_shard: int = 1,
                       attn_pref: str = "flash",
                       requested_moment_dtype: Any = jnp.bfloat16,
                       budget_bytes: int | None = None,
                       remat_override=None,
                       master_override: str | None = None) -> MemoryPlan:
    """Pick (master/accum/moment dtypes, fused-GA, attn, remat) for SDXL.

    ``remat_override``/``master_override`` pin those axes when the user set
    the AOZORA_SDXL_REMAT env var or the MASTER_DTYPE config key.
    """
    trace: list[str] = []
    state_candidates = _state_candidates(ga_steps, master_override,
                                         requested_moment_dtype,
                                         allow_moments_host=(dp_shard == 1))
    ladder = _ladder_for(attn_pref)
    # The "fulltop" tier exists for buckets beyond 1024px (where plain
    # hires misses the budget by a few hundred MB).  At <=1024px the
    # r2/r3-measured ladder is ground truth — keep those selections
    # byte-identical rather than trusting a borderline estimate.
    if max_latent_pixels <= 128 * 128:
        ladder = [e for e in ladder if e[2] != "fulltop"]
    if remat_override is not None:
        ladder = [(attn_pref, remat_override, None)]

    best_fallback = None  # smallest-estimate candidate, if nothing fits
    gather_modes = [True, False] if dp_shard > 1 else [True]
    for master, accum_dtype, fused, moment, host, two_pass in state_candidates:
        frozen_dtype = jnp.bfloat16 if master == jnp.bfloat16 else jnp.float32
        st_by_mode = {
            g: state_bytes(trainable_elems, frozen_elems,
                           master_dtype=master, frozen_dtype=frozen_dtype,
                           accum_dtype=accum_dtype, moment_dtype=moment,
                           dp_shard=dp_shard, moments_host=host, fused=fused,
                           two_pass=two_pass, gather_once=g)
            for g in gather_modes}
        # first-fitting ladder rung per gather mode.  gather-once (one
        # bf16 all-gather per weight per step, no activation resharding)
        # costs the full bf16 weight tree resident; sharded compute frees
        # that HBM for a faster remat rung.  The r2 ladder's adjacent
        # rungs differ by only ~1-3 ms while the ICI saving is ~50-100 ms
        # per step, so gather-once wins unless dropping it enables a rung
        # >= 2 positions faster (e.g. 1536px dp8: fulltop vs full remat).
        fit_by_mode: dict[bool, tuple] = {}
        for g in gather_modes:
            st = st_by_mode[g]
            for idx, (attn_impl, remat, tier) in enumerate(ladder):
                act = activation_bytes(attn_impl, remat, batch_per_device,
                                       max_latent_pixels, tier)
                est = st["peak_state"] + act + _RESERVE_BYTES
                fits = budget_bytes is None or est <= budget_bytes
                trace.append(
                    f"{jnp.dtype(master).name}-master/"
                    f"{'fused' if fused else jnp.dtype(accum_dtype).name + '-accum'}/"
                    f"{moment if isinstance(moment, str) else jnp.dtype(moment).name}-moments"
                    f"{'@host' if host else ''}"
                    f"{'/two-pass' if two_pass else ''}"
                    f"{'/gather-once' if g and dp_shard > 1 else ''}"
                    f" + {attn_impl}/remat={remat}{f'[{tier}]' if tier else ''}: "
                    f"state {st['peak_state'] / GB:.2f} + act {act / GB:.2f} "
                    f"+ reserve {_RESERVE_BYTES / GB:.2f} = {est / GB:.2f} GB "
                    f"{'<= ' if fits else '> '}"
                    f"{(budget_bytes or 0) / GB:.2f} -> "
                    f"{'fits' if fits else 'skip'}")
                if fits:
                    fit_by_mode[g] = (idx, attn_impl, remat, tier, int(est))
                    break
                plan = MemoryPlan(
                    master_dtype=master, frozen_dtype=frozen_dtype,
                    accum_dtype=accum_dtype, fused_apply=fused,
                    moment_dtype=moment, attn_impl=attn_impl, remat=remat,
                    est_bytes=int(est), budget_bytes=int(budget_bytes or 0),
                    reason="\n".join(trace), moments_host=host,
                    two_pass=two_pass,
                    remat_thresholds=((4160, int(max_latent_pixels) // 4)
                                      if tier == "fulltop" else None),
                    gather_once=g)
                if best_fallback is None or est < best_fallback.est_bytes:
                    best_fallback = plan
        if fit_by_mode:
            g = (True in fit_by_mode
                 and (False not in fit_by_mode
                      or fit_by_mode[True][0] <= fit_by_mode[False][0] + 1))
            idx, attn_impl, remat, tier, est = fit_by_mode[g]
            # "fulltop": full-remat exactly the top (largest-token) level;
            # a unit is top-level iff its token count equals the bucket's
            # latent-pixel count
            thresholds = ((4160, int(max_latent_pixels) // 4)
                          if tier == "fulltop" else None)
            trace.append(
                f"-> SELECTED {attn_impl}/remat={remat}"
                f"{f'[{tier}]' if tier else ''} with "
                f"{'gather-once' if g else 'dp-sharded'} compute weights"
                if dp_shard > 1 else
                f"-> SELECTED {attn_impl}/remat={remat}"
                f"{f'[{tier}]' if tier else ''}")
            plan = MemoryPlan(
                master_dtype=master, frozen_dtype=frozen_dtype,
                accum_dtype=accum_dtype, fused_apply=fused,
                moment_dtype=moment, attn_impl=attn_impl, remat=remat,
                est_bytes=int(est), budget_bytes=int(budget_bytes or 0),
                reason="\n".join(trace), moments_host=host,
                two_pass=two_pass, remat_thresholds=thresholds,
                gather_once=g)
            return _gate_fast_backward(plan, batch_per_device,
                                       max_latent_pixels)

    # Nothing fits the estimate.  The estimator is deliberately
    # conservative, so attempt the smallest-footprint configuration with a
    # loud warning instead of refusing — a genuine overflow will surface
    # as a clear XLA OOM with this trace right above it.
    print("WARNING: no training configuration fits the estimated per-device "
          f"HBM budget of {(budget_bytes or 0) / GB:.2f} GB; proceeding "
          "with the smallest-footprint candidate "
          f"({best_fallback.est_bytes / GB:.2f} GB estimated). If this "
          "OOMs: reduce BATCH_SIZE / bucket resolution, freeze more of "
          "the model (UNET_EXCLUDE_TARGETS), or run on more chips (FSDP "
          "shards master weights and moments across the dp axis).\n"
          + "\n".join(trace))
    return _gate_fast_backward(best_fallback, batch_per_device,
                               max_latent_pixels)


def describe_plan(plan: MemoryPlan, *, verbose: bool = False) -> str:
    budget = (f"{plan.budget_bytes / GB:.2f} GB" if plan.budget_bytes
              else "unbounded")
    lines = [
        "INFO: Memory plan "
        f"(budget {budget}, "
        f"est peak {plan.est_bytes / GB:.2f} GB):",
        f"INFO:   master weights: {jnp.dtype(plan.master_dtype).name}"
        + ("  [LOW-MEMORY MODE: bf16 master via fp32 update scratch — "
           "the reference's own training precision]" if plan.low_memory
           else ""),
        f"INFO:   grad accumulation: "
        + ("two-pass step (GA=1: norm pass + recompute-update pass — "
           "the gradient tree never materializes)" if plan.two_pass
           else "fused into the train step (GA=1, no accum tree)"
           if plan.fused_apply
           else f"{jnp.dtype(plan.accum_dtype).name} accum tree"),
        f"INFO:   moments: "
        + (plan.moment_dtype if isinstance(plan.moment_dtype, str)
           else jnp.dtype(plan.moment_dtype).name)
        + ("  [OFFLOADED to pinned host memory — streamed through the "
           "update like the reference's Raven/Titan CPU offload, but the "
           "math stays a fused on-device XLA kernel]"
           if plan.moments_host else ""),
        f"INFO:   attention: {plan.attn_impl}, remat: {plan.remat}"
        + (f" (resident < {plan.remat_thresholds[0]} tokens, FULL remat >= "
           f"{plan.remat_thresholds[1]} tokens)"
           if plan.remat_thresholds else ""),
    ]
    if not plan.gather_once:
        lines.append(
            "INFO:   multi-chip weights: dp-sharded compute (per-consumer "
            "gathers — HBM freed for a faster remat rung; gather-once "
            "replicas did not fit)")
    if not plan.fast_backward:
        lines.append(
            "INFO:   backward: legacy (GEMM conv backward + fused QKV "
            "gated — their ~0.30 MB/latent-pixel workspace does not fit "
            "next to this low-memory state rung)")
    if verbose:
        lines.append(plan.reason)
    return "\n".join(lines)
