"""v5e-8 performance projection artifact (VERDICT r3 #7).

The dryrun proves the multi-chip shardings compile + execute; this tool
quantifies what they would DO on real v5e-8 hardware, within this
environment's limits (one real chip, 8 virtual CPU devices):

for each production mesh configuration it AOT-compiles the REAL sharded
train step at FULL model size (compile-only, abstract avals — runs on the
virtual CPU mesh), then reports

* per-chip memory from the compiler's buffer assignment,
* per-step collective traffic mined from the POST-SPMD-PARTITIONER dump
  (r5: the final CPU HLO legalizes every bf16 collective to f32 because
  the CPU backend has no native bf16 ops — the r4 artifact's 23.4 GB of
  "f32 all-gather" was that artifact, not what a TPU moves) — every
  all-reduce / all-gather / reduce-scatter / collective-permute /
  all-to-all op with its payload bytes and group size; an all-reduce
  whose only consumer is a partition-offset dynamic-slice is counted as
  the reduce-scatter the TPU pipeline rewrites it into,
* ICI time bounds under a stated bandwidth model (below),
* projected step time = measured single-chip compute step (BENCH_r04)
  combined with the ICI time as [overlapped, serial] bounds.

ICI model (stated assumptions, checkable):
  v5e ICI ~45 GB/s per link per direction; an 8-chip slice is a 2x4 torus
  with bidirectional rings, so a ring collective can use ~2 x 45 = 90 GB/s
  of injection bandwidth per chip (ICI_BW_BYTES).  Ring costs per chip:
  all-reduce 2(N-1)/N x bytes, all-gather / reduce-scatter (N-1)/N x
  full-buffer bytes, permute = bytes.  DCN is never involved (single
  slice).  These match the public scaling-book recipe; swap the constant
  to re-derive for other slices.

Usage:  python tools_dev/multichip_estimates.py [out=MULTICHIP_ESTIMATES_r04.json]
"""

import sys; sys.path.insert(0, "/root/repo")
import json
import os
import re
import sys

N_DEV = 8
os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + f" --xla_force_host_platform_device_count={N_DEV}"
                           ).strip()

import jax
import jax.numpy as jnp

jax.config.update("jax_platforms", "cpu")
# NO persistent compilation cache: the post-SPMD dump this tool mines is
# only written when XLA actually runs its passes — a disk-cache hit would
# silently fall back to the final CPU HLO, whose bf16 collectives are
# legalized to f32 (the r4 artifact's bug).

ICI_BW_BYTES = 2 * 45e9        # per-chip ring bandwidth (2 links x 45 GB/s)
DTYPE_BYTES = {"f64": 8, "s64": 8, "u64": 8, "f32": 4, "s32": 4, "u32": 4,
               "bf16": 2, "f16": 2, "s16": 2, "u16": 2,
               "s8": 1, "u8": 1, "pred": 1,
               "f8e4m3fn": 1, "f8e5m2": 1, "f8e4m3": 1}

_SHAPE_RE = re.compile(r"(\w+)\[([\d,]*)\]")
_COLLECTIVE_RE = re.compile(
    r"=\s*(\([^)]*\)|\w+\[[\d,]*\](?:\{[^}]*\})?)\s+"
    r"(all-reduce|all-gather|reduce-scatter|collective-permute|all-to-all)"
    r"(?:-start)?\(")
_GROUPS_BRACED_RE = re.compile(r"replica_groups=\{\{([\d,]+)\}")
_GROUPS_IOTA_RE = re.compile(r"replica_groups=\[(\d+),(\d+)\]")


def _shape_bytes(text: str) -> int:
    total = 0
    for dtype, dims in _SHAPE_RE.findall(text):
        if dtype not in DTYPE_BYTES:
            continue
        n = 1
        for d in dims.split(","):
            if d:
                n *= int(d)
        total += n * DTYPE_BYTES[dtype]
    return total


def _group_size(line: str) -> int:
    m = _GROUPS_BRACED_RE.search(line)
    if m:
        return len(m.group(1).split(","))
    m = _GROUPS_IOTA_RE.search(line)
    if m:  # [num_groups, group_size]
        return int(m.group(2))
    return N_DEV


def _reduce_scatter_rewrites(hlo_text: str) -> set[str]:
    """Names of all-reduce ops whose only consumer is a dynamic-slice —
    the pattern GSPMD emits for a sharded-sum output, which the TPU
    pipeline's ReduceScatterCreator rewrites into a reduce-scatter (cost
    (N-1)/N x full buffer instead of 2(N-1)/N)."""
    ar_names = set()
    for m in re.finditer(r"%((?:all-reduce)[.\w]*)\s*=", hlo_text):
        ar_names.add(m.group(1))
    # count consumers per all-reduce
    uses: dict[str, list[str]] = {n: [] for n in ar_names}
    for line in hlo_text.splitlines():
        lm = re.match(r"\s*(?:ROOT\s+)?%([-.\w]+)\s*=\s*\S+\s+([-\w]+)\(",
                      line)
        if not lm:
            continue
        op = lm.group(2)
        for n in re.findall(r"%([-.\w]+)", line.split("=", 1)[1]):
            if n in uses and n != lm.group(1):
                uses[n].append(op)
    return {n for n, ops in uses.items()
            if ops and all(o == "dynamic-slice" for o in ops)}


def mine_collectives(hlo_text: str) -> dict:
    """Per-op-kind payload bytes + modelled per-chip ICI ring cost."""
    by_kind: dict[str, dict] = {}
    ici_bytes = 0.0
    rs_rewrites = _reduce_scatter_rewrites(hlo_text)
    for line in hlo_text.splitlines():
        m = _COLLECTIVE_RE.search(line)
        if not m:
            continue
        result_shapes, kind = m.group(1), m.group(2)
        nm = re.match(r"\s*(?:ROOT\s+)?%([-.\w]+)\s*=", line)
        if (kind == "all-reduce" and nm
                and nm.group(1) in rs_rewrites):
            kind = "reduce-scatter(from-all-reduce)"
        size = _shape_bytes(result_shapes)
        n = _group_size(line)
        if n <= 1 or size == 0:
            continue
        # ring cost in bytes crossing each chip's ICI links
        if kind == "all-reduce":
            cost = 2.0 * (n - 1) / n * size
        elif kind in ("all-gather", "all-to-all",
                      "reduce-scatter(from-all-reduce)"):
            cost = (n - 1) / n * size            # result is the full buffer
        elif kind == "reduce-scatter":
            cost = (n - 1) * size                # result is the shard
        else:  # collective-permute
            cost = float(size)
        d = by_kind.setdefault(kind, {"count": 0, "payload_bytes": 0,
                                      "ici_cost_bytes": 0.0, "by_dtype": {}})
        d["count"] += 1
        d["payload_bytes"] += size
        d["ici_cost_bytes"] += cost
        for dt, dims in _SHAPE_RE.findall(m.group(1)):
            if dt in DTYPE_BYTES:
                n = 1
                for x in dims.split(","):
                    if x:
                        n *= int(x)
                d["by_dtype"][dt] = d["by_dtype"].get(dt, 0) + n * DTYPE_BYTES[dt]
        ici_bytes += cost
    return {"by_kind": by_kind, "ici_cost_bytes_per_chip": int(ici_bytes),
            "ici_time_ms": round(ici_bytes / ICI_BW_BYTES * 1e3, 3)}


def mem_analysis(compiled) -> dict | None:
    try:
        m = compiled.memory_analysis()
        if m is None:
            return None
        total = (m.argument_size_in_bytes + m.output_size_in_bytes
                 + m.temp_size_in_bytes)
        return {"argument_gb": round(m.argument_size_in_bytes / 2**30, 3),
                "output_gb": round(m.output_size_in_bytes / 2**30, 3),
                "temp_gb": round(m.temp_size_in_bytes / 2**30, 3),
                "total_gb": round(total / 2**30, 3),
                "per_chip_gb": round(total / 2**30 / N_DEV, 3)}
    except Exception as e:  # noqa: BLE001
        return {"error": str(e)}


def compile_with_spmd_dump(lowered, tag: str):
    """Compile with an xla_dump of the post-SPMD-partitioner module and
    return (compiled, post_spmd_hlo_text) — the backend-independent truth
    of the collectives (the final CPU HLO legalizes bf16 away)."""
    import glob
    import shutil
    dump = f"/tmp/mce_dump_{tag}"
    shutil.rmtree(dump, ignore_errors=True)
    compiled = lowered.compile(compiler_options={
        "xla_dump_to": dump,
        "xla_dump_hlo_pass_re": "spmd-partitioning"})
    files = sorted(glob.glob(dump + "/*after_spmd-partitioning*.txt"),
                   key=os.path.getsize)
    if not files:
        return compiled, compiled.as_text()
    return compiled, open(files[-1]).read()


def analyze(name: str, compiled, compute_ms: float | None,
            imgs_per_step: int, report: dict, hlo_text: str | None = None) -> None:
    coll = mine_collectives(hlo_text if hlo_text is not None
                            else compiled.as_text())
    entry = {"memory": mem_analysis(compiled), "collectives": coll}
    if compute_ms is not None:
        ici_ms = coll["ici_time_ms"]
        overlapped = max(compute_ms, ici_ms)
        serial = compute_ms + ici_ms
        entry["projection"] = {
            "single_chip_compute_ms": compute_ms,
            "ici_time_ms": ici_ms,
            "step_ms_bounds": [round(overlapped, 1), round(serial, 1)],
            "imgs_per_s_bounds": [
                round(imgs_per_step / (serial / 1e3), 2),
                round(imgs_per_step / (overlapped / 1e3), 2)],
            "scaling_efficiency_bounds": [
                round(compute_ms / serial, 3),
                round(compute_ms / overlapped, 3)],
        }
    report["configs"][name] = entry
    print(f"[{name}] {json.dumps(entry)[:400]}", flush=True)


def sds(shape, dtype):
    return jax.ShapeDtypeStruct(tuple(int(s) for s in shape), dtype)


def main() -> None:
    args = dict(a.split("=") for a in sys.argv[1:] if "=" in a)
    out_path = args.get("out", "MULTICHIP_ESTIMATES_r05.json")

    from aozora_sdxl_training_tpu.models.anima import dit as dit_mod
    from aozora_sdxl_training_tpu.models.sdxl.arch import SDXL_BASE, param_shapes
    from aozora_sdxl_training_tpu.opt import adamw
    from aozora_sdxl_training_tpu.parallel import sharding as shard
    from aozora_sdxl_training_tpu.train.anima_trainer import make_anima_micro_step
    from aozora_sdxl_training_tpu.train.train_step import (
        TrainStepConfig, make_apply_step, make_micro_step, split_trainable)

    devices = jax.devices()[:N_DEV]
    # Measured single-chip compute anchors (v5e-1, this round's bench):
    # SDXL 1024px b1 micro-step; Anima 4096-token conservative+flash.
    SDXL_MS = float(args.get("sdxl_ms", 242.0))
    ANIMA_MS = float(args.get("anima_ms", 500.0))

    report: dict = {
        "n_devices": N_DEV,
        "ici_model": {"bw_bytes_per_chip": ICI_BW_BYTES,
                      "note": "2 links x 45 GB/s ring bandwidth per v5e "
                              "chip (2x4 torus); ring all-reduce "
                              "2(N-1)/N, gather/scatter (N-1)/N"},
        "compute_anchors_ms": {"sdxl_1024_b1": SDXL_MS,
                               "anima_4096_b1": ANIMA_MS},
        "knob_env": {k: os.environ[k] for k in
                     ("AOZORA_FUSED_QKV", "AOZORA_CONV_BWD",
                      "AOZORA_FLASH_MIN_KV") if k in os.environ},
        "knob_note": "r5: steps are built WITH param_shardings, so the "
                     "bf16 weight precast + gather-once compute layout "
                     "(train_step.precast_params) is in the mined "
                     "programs, and collectives are mined from the "
                     "post-SPMD dump (backend-independent dtypes). The "
                     "trace-rewrite knobs alter op counts marginally but "
                     "not the weight/grad collective volumes.",
        "configs": {},
    }

    latent_hw = 128

    def sdxl_steps(dp: int, tp: int, tag: str):
        mesh = shard.make_mesh(devices, dp=dp, tp=tp)
        cfg = SDXL_BASE
        shapes = param_shapes(cfg)
        t_shapes, f_shapes = split_trainable(
            {n: s for n, (s, _) in shapes.items()}, ["conv1", "conv2"])
        trainable = {n: sds(s, jnp.float32) for n, s in t_shapes.items()}
        frozen = {n: sds(s, jnp.float32) for n, s in f_shapes.items()}
        accum = {n: sds(s, jnp.float32) for n, s in t_shapes.items()}
        sh_t = shard.params_shardings(trainable, mesh)
        sh_f = shard.params_shardings(frozen, mesh)
        sh_a = shard.params_shardings(accum, mesh)
        sh_b = jax.sharding.NamedSharding(mesh, jax.sharding.PartitionSpec("dp"))
        sh_r = shard.replicated(mesh)
        step_cfg = TrainStepConfig(unet=cfg, prediction_type="v_prediction",
                                   grad_accum_steps=1, clip_grad_norm=1.0,
                                   attn_impl="xla",
                                   compute_dtype=jnp.bfloat16, remat=True)
        b = dp
        batch_args = (sds((b, latent_hw, latent_hw, 4), jnp.float32),
                      sds((b, 77, cfg.cross_attention_dim), jnp.bfloat16),
                      sds((b, cfg.pooled_projection_dim), jnp.bfloat16),
                      sds((b, 6), jnp.float32),
                      sds((b,), jnp.int32), sds((b,), jnp.float32))
        scalars = (sds((1000,), jnp.float32), sds((), jnp.int32),
                   sds((), jnp.int32), sds((), jnp.float32))
        micro = jax.jit(make_micro_step(step_cfg,
                                        param_shardings=(sh_t, sh_f)),
                        donate_argnums=(2,),
                        in_shardings=(sh_t, sh_f, sh_a, *([sh_b] * 6),
                                      *([sh_r] * 4)),
                        out_shardings=(sh_r, sh_r, sh_a))
        compiled, spmd = compile_with_spmd_dump(
            micro.lower(trainable, frozen, accum, *batch_args, *scalars),
            f"sdxl_{tag}_micro")
        analyze(f"sdxl_{tag}_micro", compiled, SDXL_MS, dp, report,
                hlo_text=spmd)

        opt_cfg = adamw.AdamWConfig()
        opt_state = adamw.AdamWState(
            step=sds((), jnp.int32),
            exp_avg={n: sds(s, jnp.bfloat16) for n, s in t_shapes.items()},
            exp_avg_sq={n: sds(s, jnp.bfloat16) for n, s in t_shapes.items()})
        sh_o = shard.opt_state_shardings(opt_state, mesh)
        apply_ = jax.jit(make_apply_step(step_cfg, opt_cfg),
                         donate_argnums=(0, 1, 2),
                         in_shardings=(sh_t, sh_a, sh_o, sh_r),
                         out_shardings=(sh_t, sh_o, sh_r, sh_r))
        compiled, spmd = compile_with_spmd_dump(
            apply_.lower(trainable, accum, opt_state, sds((), jnp.float32)),
            f"sdxl_{tag}_apply")
        analyze(f"sdxl_{tag}_apply", compiled, None, dp, report,
                hlo_text=spmd)

    def anima_micro(dp: int, tp: int, sp: int, tag: str,
                    attn_impl="xla") -> None:
        mesh = shard.make_mesh(devices, dp=dp, tp=tp, sp=sp)
        cfg = dit_mod.ANIMA_BASE
        abstract = jax.eval_shape(
            lambda k: dit_mod.init_params(cfg, k), jax.random.PRNGKey(0))
        train = {n: sds(v.shape, jnp.float32) for n, v in abstract.items()}
        accum = dict(train)
        sh_p = shard.params_shardings(train, mesh)
        sh_b = jax.sharding.NamedSharding(mesh, jax.sharding.PartitionSpec("dp"))
        sh_r = shard.replicated(mesh)
        if sp > 1:
            from aozora_sdxl_training_tpu.ops.ring_attention import SPRingConfig
            attn_impl = SPRingConfig(mesh=mesh, axis_name="sp", axis_size=sp,
                                     base_impl="xla")
        micro = make_anima_micro_step(cfg, grad_accum_steps=1,
                                      compute_dtype=jnp.bfloat16,
                                      attn_impl=attn_impl, remat=True,
                                      param_shardings=(sh_p, {}))
        micro = jax.jit(micro, donate_argnums=(2,),
                        in_shardings=(sh_p, {}, sh_p, *([sh_b] * 5), None,
                                      *([sh_r] * 4)),
                        out_shardings=(sh_r, sh_r, sh_p))
        b = dp
        batch = (sds((b, latent_hw, latent_hw, cfg.in_channels), jnp.float32),
                 sds((b, 512, cfg.adapter_source_dim), jnp.bfloat16),
                 sds((b, 512), jnp.int32),
                 sds((b,), jnp.int32), sds((b,), jnp.float32), None)
        compiled, spmd = compile_with_spmd_dump(
            micro.lower(train, {}, accum, *batch,
                        sds((1000,), jnp.float32), sds((), jnp.int32),
                        sds((), jnp.int32), sds((), jnp.float32)),
            f"anima_{tag}_micro")
        analyze(f"anima_{tag}_micro", compiled, ANIMA_MS, dp, report,
                hlo_text=spmd)

    def anima_pp(dp: int, pp: int, tag: str) -> None:
        import numpy as np
        from aozora_sdxl_training_tpu.parallel import pipeline as pl
        mesh = jax.sharding.Mesh(
            np.asarray(devices[: dp * pp]).reshape(dp, pp), ("dp", "pp"))
        cfg = dit_mod.ANIMA_BASE
        abstract = jax.eval_shape(
            lambda k: dit_mod.init_params(cfg, k), jax.random.PRNGKey(0))
        shapes = {n: sds(v.shape, jnp.float32) for n, v in abstract.items()}
        # split_block_params stacks per-block leaves (jnp.stack) — run it
        # under eval_shape so abstract avals trace instead of TypeError-ing
        stacked, rest = jax.eval_shape(
            lambda p: pl.split_block_params(p, cfg.num_blocks), shapes)
        P = jax.sharding.PartitionSpec
        sh_pp = jax.sharding.NamedSharding(mesh, P("pp"))
        sh_b = jax.sharding.NamedSharding(mesh, P("dp"))
        sh_r = shard.replicated(mesh)
        # stacked leaves gain a leading (num_blocks,) axis from split_block_params
        b = 2 * dp
        lat = sds((b, 1, latent_hw, latent_hw, cfg.in_channels), jnp.float32)
        ctx = sds((b, 512, cfg.adapter_source_dim), jnp.float32)
        t5 = sds((b, 512), jnp.int32)
        ts = sds((b,), jnp.float32)
        tgt = sds((b, 1, latent_hw, latent_hw, cfg.out_channels), jnp.float32)

        def loss_fn(s, r, lat, ts, ctx, t5, tgt):
            out = pl.pp_dit_forward(s, r, lat, ts, ctx, cfg=cfg, mesh=mesh,
                                    microbatches=2, t5_ids=t5,
                                    compute_dtype=jnp.bfloat16, remat=True)
            return jnp.mean((out - tgt) ** 2)

        step = jax.jit(jax.value_and_grad(loss_fn, argnums=(0, 1)),
                       in_shardings=({k: sh_pp for k in stacked},
                                     {k: sh_r for k in rest},
                                     sh_b, sh_b, sh_b, sh_b, sh_b))
        compiled, spmd = compile_with_spmd_dump(
            step.lower(stacked, rest, lat, ts, ctx, t5, tgt),
            f"anima_{tag}_grad")
        analyze(f"anima_{tag}_grad", compiled, ANIMA_MS, dp, report,
                hlo_text=spmd)

    todo = args.get("configs", "sdxl_dp8,sdxl_dp4tp2,anima_dp8,anima_dp2sp4,"
                               "anima_dp2pp4").split(",")
    jobs = [("sdxl_dp8", lambda: sdxl_steps(8, 1, "dp8")),
            ("sdxl_dp4tp2", lambda: sdxl_steps(4, 2, "dp4tp2")),
            ("anima_dp8", lambda: anima_micro(8, 1, 1, "dp8")),
            ("anima_dp2sp4", lambda: anima_micro(2, 1, 4, "dp2sp4")),
            ("anima_dp2pp4", lambda: anima_pp(2, 4, "dp2pp4"))]
    errors = {}
    for name, job in jobs:
        if name not in todo:
            continue
        try:
            job()
        except Exception as e:  # record + continue: partial artifact > none
            import traceback
            traceback.print_exc()
            errors[name] = f"{type(e).__name__}: {e}"
        # checkpoint the report after every config — compiles are minutes
        with open(out_path, "w") as f:
            json.dump({**report, "ok": False, "errors": errors}, f, indent=1)

    report["errors"] = errors
    report["ok"] = not errors
    with open(out_path, "w") as f:
        json.dump(report, f, indent=1)
    print(f"wrote {out_path}")


if __name__ == "__main__":
    main()
