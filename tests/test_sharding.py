"""Mesh sharding rules + multi-device vs single-device equivalence."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P

from aozora_sdxl_training_tpu.models.sdxl.arch import TINY
from aozora_sdxl_training_tpu.models.sdxl.unet import init_params
from aozora_sdxl_training_tpu.opt import adamw
from aozora_sdxl_training_tpu.parallel import sharding as shard
from aozora_sdxl_training_tpu.train.train_step import (
    TrainStepConfig,
    jit_train_functions,
    split_trainable,
    zero_grad_accum,
)

requires_8 = pytest.mark.skipif(len(jax.devices()) < 8,
                                reason="needs 8 virtual devices")


def test_param_partition_spec_rules():
    assert shard.param_partition_spec((64,), 8) == P()            # tiny
    # largest divisible axis is sharded
    assert shard.param_partition_spec((4096, 1024), 8) == P("dp", None)
    assert shard.param_partition_spec((1027, 33), 8, min_shard_elements=1) == P()
    # conv kernel: out-features axis preferred (last, largest divisible)
    assert shard.param_partition_spec((3, 3, 320, 320), 8,
                                      min_shard_elements=1) == P(None, None, None, "dp")
    assert shard.param_partition_spec((100, 100), 1) == P()        # 1 device


@requires_8
def test_make_mesh():
    mesh = shard.make_mesh(jax.devices())
    assert mesh.axis_names == ("dp",)
    assert mesh.devices.size == 8
    with pytest.raises(ValueError):
        shard.make_mesh(jax.devices()[:6], dp=4)


@requires_8
def test_sharded_training_matches_single_device():
    """One full micro+optimizer step on an 8-device dp mesh must produce the
    same loss and parameters as the single-device run."""
    cfg = TrainStepConfig(unet=TINY, prediction_type="v_prediction",
                          grad_accum_steps=1, clip_grad_norm=1.0,
                          attn_impl="xla", compute_dtype=jnp.float32,
                          remat=False)
    opt_cfg = adamw.AdamWConfig(momentum_dtype=jnp.float32)
    params = init_params(TINY, jax.random.PRNGKey(0))
    trainable, frozen = split_trainable(params, ["conv1", "conv2"])

    b = 8
    rng = np.random.default_rng(0)
    batch = dict(
        latents=rng.normal(size=(b, 8, 8, 4)).astype(np.float32),
        embeds=rng.normal(size=(b, 7, TINY.cross_attention_dim)).astype(np.float32),
        pooled=rng.normal(size=(b, TINY.pooled_projection_dim)).astype(np.float32),
        time_ids=np.ones((b, 6), np.float32),
        tickets=rng.integers(0, 1000, b).astype(np.int64),
    )
    loss_weights = jnp.ones(1000, jnp.float32)
    common = (jnp.asarray(batch["latents"]), jnp.asarray(batch["embeds"]),
              jnp.asarray(batch["pooled"]), jnp.asarray(batch["time_ids"]),
              jnp.asarray(batch["tickets"]), jnp.ones((b,), jnp.float32),
              loss_weights,
              jnp.asarray(42, jnp.int32), jnp.asarray(1, jnp.int32),
              jnp.asarray(0.0, jnp.float32))

    def fresh_copy(tree):
        # donation-safe: each run gets its own device buffers
        return jax.tree.map(lambda x: jnp.array(x, copy=True), tree)

    # single device
    micro1, apply1 = jit_train_functions(cfg, opt_cfg)
    g1 = zero_grad_accum(trainable)
    t1 = fresh_copy(trainable)
    loss1, _, g1 = micro1(t1, frozen, g1, *common)
    p1, s1, n1, _ = apply1(t1, g1, adamw.init_state(fresh_copy(trainable), opt_cfg),
                        jnp.asarray(1e-4, jnp.float32))

    # 8-device mesh, fsdp-ish shardings
    mesh = shard.make_mesh(jax.devices())
    min_el = 1024
    opt_state = adamw.init_state(trainable, opt_cfg)
    shardings = {
        "trainable": shard.params_shardings(trainable, mesh, min_shard_elements=min_el),
        "frozen": shard.params_shardings(frozen, mesh, min_shard_elements=min_el),
        "grad_accum": shard.params_shardings(trainable, mesh, min_shard_elements=min_el),
        "opt_state": adamw.AdamWState(
            step=shard.replicated(mesh),
            exp_avg=shard.params_shardings(opt_state.exp_avg, mesh, min_shard_elements=min_el),
            exp_avg_sq=shard.params_shardings(opt_state.exp_avg_sq, mesh, min_shard_elements=min_el)),
        "batch": jax.sharding.NamedSharding(mesh, P("dp")),
        "replicated": shard.replicated(mesh),
    }
    micro8, apply8 = jit_train_functions(cfg, opt_cfg, shardings=shardings)
    t8 = shard.put_tree(fresh_copy(trainable), shardings["trainable"])
    f8 = shard.put_tree(frozen, shardings["frozen"])
    o8 = shard.put_tree(opt_state, shardings["opt_state"])
    g8 = shard.put_tree(zero_grad_accum(trainable), shardings["grad_accum"])
    loss8, _, g8 = micro8(t8, f8, g8, *common)
    p8, s8, n8, _u8 = apply8(t8, g8, o8, jnp.asarray(1e-4, jnp.float32))

    assert float(loss1) == pytest.approx(float(loss8), rel=1e-5)
    assert float(n1) == pytest.approx(float(n8), rel=1e-4)
    for key in ("conv_in.weight", "mid_block.attentions.0.proj_in.weight"):
        # reduction order differs across the dp mesh; allow float noise
        np.testing.assert_allclose(np.asarray(p1[key]), np.asarray(p8[key]),
                                   rtol=1e-4, atol=1e-5, err_msg=key)
    # sharded moments really are distributed
    big_key = max(trainable, key=lambda k: trainable[k].size)
    sh = s8.exp_avg[big_key].sharding
    assert sh.spec != P()


@requires_8
def test_fsdp_weight_gather_moves_bf16_not_fp32(tmp_path):
    """The weight precast (train_step.precast_params) must make the FSDP
    forward all-gather move the bf16 cast of each >=2-D weight, not the
    fp32 master: MULTICHIP_ESTIMATES_r04 measured 23.4 GB of f32
    all-gather per full-size dp8 micro-step before the fix — exactly 2x
    the necessary ICI traffic.

    Measured on the post-SPMD-partitioner dump, NOT the final HLO: the
    CPU backend has no native bf16 collectives/convs, so its float
    normalization legalizes every bf16 all-gather to f32 (verified on a
    minimal explicit bf16 resharding — the final CPU HLO shows
    f32->bf16->f32 fused *before* an f32 gather).  The partitioner dump
    is the backend-independent truth of what a TPU moves over ICI."""
    import glob
    import re

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
            jnp.ones((b, 6)), jnp.zeros((b,), jnp.int64),
            jnp.ones((b,), jnp.float32), jnp.ones(1000, jnp.float32),
            jnp.asarray(42, jnp.int32), jnp.asarray(1, jnp.int32),
            jnp.asarray(0.0, jnp.float32))
    # The dump is only written when XLA actually runs its passes: a
    # persistent-compilation-cache hit (CLI-driving tests earlier in the
    # suite call enable_compilation_cache(), which sticks for the rest of
    # the process) loads a serialized AOT result and yields zero dump
    # files.  Setting the dir to None is NOT enough: jax memoizes the
    # cache-used decision in compilation_cache._cache_checked/_cache_used
    # globals, so reset_cache() must clear them for the disable to take.
    from jax._src import compilation_cache as _cc
    cache_dir = jax.config.jax_compilation_cache_dir
    jax.config.update("jax_compilation_cache_dir", None)
    _cc.reset_cache()
    try:
        micro8.lower(*args).compile(compiler_options={
            "xla_dump_to": str(tmp_path),
            "xla_dump_hlo_pass_re": "spmd-partitioning"})
    finally:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        _cc.reset_cache()
    dumps = [f for f in
             glob.glob(str(tmp_path / "*after_spmd-partitioning*.txt"))
             if "micro_step" in f]
    assert dumps, "no post-SPMD dump produced"
    hlo = open(dumps[-1]).read()

    gather_bytes = {"bf16": 0, "f32": 0}
    pat = re.compile(r"=\s*(\w+)\[([\d,]*)\][^=]*\ball?-gather(?:-start)?\(")
    for line in hlo.splitlines():
        m = pat.search(line)
        if not m or m.group(1) not in gather_bytes:
            continue
        n = 1
        for d in m.group(2).split(","):
            if d:
                n *= int(d)
        gather_bytes[m.group(1)] += n * (2 if m.group(1) == "bf16" else 4)
    assert gather_bytes["bf16"] > 0, "no bf16 weight all-gathers found"
    # only 1-D (norm/bias) params may still gather f32 — a sliver next to
    # the >=2-D weights
    assert gather_bytes["f32"] <= 0.05 * gather_bytes["bf16"], gather_bytes


@requires_8
def test_gather_modes_lower():
    """Both planner gather modes (gather-once compute replicas vs
    dp-sharded compute weights, memory_policy.MemoryPlan.gather_once)
    must trace+lower over the mesh; and the compute-layout helper strips
    exactly the dp axis."""
    from aozora_sdxl_training_tpu.train.train_step import _compute_sharding

    mesh = shard.make_mesh(jax.devices())
    ns = jax.sharding.NamedSharding
    assert _compute_sharding(ns(mesh, P("dp", None))).spec == P()
    assert _compute_sharding(ns(mesh, P(None, "dp"))).spec == P()
    mesh2 = shard.make_mesh(jax.devices(), dp=4, tp=2)
    assert _compute_sharding(ns(mesh2, P("dp", "tp"))).spec == P(None, "tp")
    assert _compute_sharding(ns(mesh2, P(("dp", "tp"), None))).spec \
        == P(("tp",), None)

    opt_cfg = adamw.AdamWConfig(momentum_dtype=jnp.float32)
    params = init_params(TINY, jax.random.PRNGKey(0))
    trainable, frozen = split_trainable(params, ["conv1", "conv2"])
    shardings = {
        "trainable": shard.params_shardings(trainable, mesh,
                                            min_shard_elements=1024),
        "frozen": shard.params_shardings(frozen, mesh,
                                         min_shard_elements=1024),
        "grad_accum": shard.params_shardings(trainable, mesh,
                                             min_shard_elements=1024),
        "opt_state": None,
        "batch": jax.sharding.NamedSharding(mesh, P("dp")),
        "replicated": shard.replicated(mesh),
    }
    b = 8
    args = (trainable, frozen, zero_grad_accum(trainable),
            jnp.zeros((b, 8, 8, 4)),
            jnp.zeros((b, 7, TINY.cross_attention_dim)),
            jnp.zeros((b, TINY.pooled_projection_dim)),
            jnp.ones((b, 6)), jnp.zeros((b,), jnp.int32),
            jnp.ones((b,), jnp.float32), jnp.ones(1000, jnp.float32),
            jnp.asarray(42, jnp.int32), jnp.asarray(1, jnp.int32),
            jnp.asarray(0.0, jnp.float32))
    for gather_once in (True, False):
        cfg = TrainStepConfig(unet=TINY, prediction_type="v_prediction",
                              grad_accum_steps=1, clip_grad_norm=1.0,
                              attn_impl="xla", compute_dtype=jnp.bfloat16,
                              remat=False, gather_once=gather_once)
        micro8, _ = jit_train_functions(cfg, opt_cfg, shardings=shardings)
        micro8.lower(*args)  # trace + lower only; compile is minutes


def test_tp_param_spec_rules():
    assert shard.tp_param_spec("a.attn1.to_q.weight", (64, 64), 4) == P(None, "tp")
    assert shard.tp_param_spec("a.attn1.to_out.0.weight", (64, 64), 4) == P("tp", None)
    assert shard.tp_param_spec("a.ff.net.0.proj.weight", (64, 512), 4) == P(None, "tp")
    assert shard.tp_param_spec("a.ff.net.0.proj.bias", (512,), 4) == P("tp")
    assert shard.tp_param_spec("a.ff.net.2.weight", (256, 64), 4) == P("tp", None)
    assert shard.tp_param_spec("a.ff.net.2.bias", (64,), 4) is None
    assert shard.tp_param_spec("conv_in.weight", (3, 3, 4, 32), 4) is None
    assert shard.tp_param_spec("a.to_q.weight", (64, 64), 1) is None
    # non-divisible head dim falls back
    assert shard.tp_param_spec("a.to_q.weight", (63, 63), 4) is None


@requires_8
def test_dp_tp_mesh_training_matches_single_device():
    """dp=2 x tp=4 Megatron-sharded attention/GEGLU must match the
    single-device step bit-for-bit at fp32 tolerance."""
    cfg = TrainStepConfig(unet=TINY, prediction_type="v_prediction",
                          grad_accum_steps=1, clip_grad_norm=1.0,
                          attn_impl="xla", compute_dtype=jnp.float32,
                          remat=False)
    opt_cfg = adamw.AdamWConfig(momentum_dtype=jnp.float32)
    params = init_params(TINY, jax.random.PRNGKey(0))
    trainable, frozen = split_trainable(params, ["conv1", "conv2"])

    b = 2
    rng = np.random.default_rng(1)
    loss_weights = jnp.ones(1000, jnp.float32)
    common = (jnp.asarray(rng.normal(size=(b, 8, 8, 4)).astype(np.float32)),
              jnp.asarray(rng.normal(
                  size=(b, 7, TINY.cross_attention_dim)).astype(np.float32)),
              jnp.asarray(rng.normal(
                  size=(b, TINY.pooled_projection_dim)).astype(np.float32)),
              jnp.ones((b, 6), jnp.float32),
              jnp.asarray(rng.integers(0, 1000, b), jnp.int32),
              jnp.ones((b,), jnp.float32),
              loss_weights,
              jnp.asarray(42, jnp.int32), jnp.asarray(1, jnp.int32),
              jnp.asarray(0.0, jnp.float32))

    def fresh_copy(tree):
        return jax.tree.map(lambda x: jnp.array(x, copy=True), tree)

    micro1, apply1 = jit_train_functions(cfg, opt_cfg)
    g1 = zero_grad_accum(trainable)
    t1 = fresh_copy(trainable)
    loss1, _, g1 = micro1(t1, frozen, g1, *common)
    p1, s1, n1, _ = apply1(t1, g1, adamw.init_state(fresh_copy(trainable), opt_cfg),
                        jnp.asarray(1e-4, jnp.float32))

    mesh = shard.make_mesh(jax.devices(), dp=2, tp=4)
    assert mesh.axis_names == ("dp", "tp")
    min_el = 1024
    opt_state = adamw.init_state(trainable, opt_cfg)
    shardings = {
        "trainable": shard.params_shardings(trainable, mesh, min_shard_elements=min_el),
        "frozen": shard.params_shardings(frozen, mesh, min_shard_elements=min_el),
        "grad_accum": shard.params_shardings(trainable, mesh, min_shard_elements=min_el),
        "opt_state": shard.opt_state_shardings(opt_state, mesh),
        "batch": jax.sharding.NamedSharding(mesh, P("dp")),
        "replicated": shard.replicated(mesh),
    }
    # the TP rules actually hit attention weights
    tp_specs = [s.spec for k, s in shardings["trainable"].items()
                if ".to_q.weight" in k]
    assert tp_specs and all(spec == P(None, "tp") for spec in tp_specs)

    micro8, apply8 = jit_train_functions(cfg, opt_cfg, shardings=shardings)
    t8 = shard.put_tree(fresh_copy(trainable), shardings["trainable"])
    f8 = shard.put_tree(frozen, shardings["frozen"])
    o8 = shard.put_tree(opt_state, shardings["opt_state"])
    g8 = shard.put_tree(zero_grad_accum(trainable), shardings["grad_accum"])
    loss8, _, g8 = micro8(t8, f8, g8, *common)
    p8, s8, n8, _u8 = apply8(t8, g8, o8, jnp.asarray(1e-4, jnp.float32))

    assert float(loss1) == pytest.approx(float(loss8), rel=1e-5)
    assert float(n1) == pytest.approx(float(n8), rel=1e-4)
    for key in ("mid_block.attentions.0.proj_in.weight",
                "mid_block.attentions.0.transformer_blocks.0.attn1.to_q.weight"):
        # reduction order differs across the 2x4 mesh; allow float noise
        np.testing.assert_allclose(np.asarray(p1[key]), np.asarray(p8[key]),
                                   rtol=1e-4, atol=1e-5, err_msg=key)
    # moments of TP'd weights follow the TP spec
    qkey = next(k for k in trainable if k.endswith("attn1.to_q.weight"))
    assert s8.exp_avg[qkey].sharding.spec == P(None, "tp")


@requires_8
def test_int8_opt_state_shardings_tuple_leaves():
    """int8-quantized moments are (codes, scales) tuples; their shardings
    must mirror the tuple structure and put_tree must place them."""
    params = init_params(TINY, jax.random.PRNGKey(2))
    trainable, _ = split_trainable(params, ["conv1", "conv2"])
    opt_cfg = adamw.AdamWConfig(momentum_dtype="int8_blockwise",
                               min_8bit_size=0)
    state = adamw.init_state(trainable, opt_cfg)
    mesh = shard.make_mesh(jax.devices(), dp=2, tp=4)
    sh = shard.opt_state_shardings(state, mesh)
    qkey = next(k for k in trainable if k.endswith("attn1.to_q.weight"))
    assert isinstance(sh.exp_avg[qkey], tuple) and len(sh.exp_avg[qkey]) == 2
    placed = shard.put_tree(state, sh)
    leaf = placed.exp_avg[qkey]
    assert isinstance(leaf, tuple)
    assert leaf[0].dtype == jnp.int8
    np.testing.assert_array_equal(np.asarray(leaf[0]),
                                  np.asarray(state.exp_avg[qkey][0]))


@requires_8
def test_train_state_roundtrip_across_mesh_shapes(tmp_path):
    """SURVEY §4: checkpoint save/restore across mesh shapes. State saved
    from a dp=8 mesh must reload bit-identically onto a dp=2 x tp=4 mesh
    (and onto the host)."""
    from aozora_sdxl_training_tpu.ckpt.train_state import (
        load_train_state,
        save_train_state,
    )

    params = init_params(TINY, jax.random.PRNGKey(3))
    trainable, _ = split_trainable(params, ["conv1", "conv2"])
    opt_cfg = adamw.AdamWConfig(momentum_dtype=jnp.float32)
    state = adamw.init_state(trainable, opt_cfg)
    # give the moments non-trivial values
    state = adamw.AdamWState(
        step=jnp.asarray(7, jnp.int32),
        exp_avg=jax.tree.map(lambda x: x + 0.25, trainable),
        exp_avg_sq=jax.tree.map(lambda x: x * x, trainable))

    mesh8 = shard.make_mesh(jax.devices(), dp=8)
    sharded = shard.put_tree(state, shard.opt_state_shardings(state, mesh8))
    path = tmp_path / "state.safetensors"
    save_train_state(path, global_step=3, micro_step=12, opt_state=sharded,
                     sampler_seed=42, sampler_epoch=1,
                     timestep_sampler_state={"current_step": 12})

    meta, loaded = load_train_state(path)
    assert meta["global_step"] == 3 and meta["micro_step"] == 12
    mesh24 = shard.make_mesh(jax.devices(), dp=2, tp=4)
    replaced = shard.put_tree(loaded, shard.opt_state_shardings(loaded, mesh24))
    for k in trainable:
        np.testing.assert_array_equal(
            np.asarray(replaced.exp_avg[k]), np.asarray(state.exp_avg[k]),
            err_msg=k)
        np.testing.assert_array_equal(
            np.asarray(replaced.exp_avg_sq[k]), np.asarray(state.exp_avg_sq[k]),
            err_msg=k)
    assert int(replaced.step) == 7
