"""Pipeline parallelism (parallel/pipeline.py): GPipe over a pp mesh axis.

Numerics are pinned against the sequential dit_forward on the virtual
8-device CPU mesh: forward equality, gradient equality through the
scan+ppermute schedule, and the stack/merge round-trip.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from aozora_sdxl_training_tpu.models.anima import dit
from aozora_sdxl_training_tpu.parallel import pipeline as pl

requires_8 = pytest.mark.skipif(len(jax.devices()) < 8,
                                reason="needs 8 virtual devices")

CFG4 = dataclasses.replace(dit.TINY_ANIMA, num_blocks=4)


def _inputs(cfg, b=4, key=0):
    k = jax.random.PRNGKey(key)
    lat = jax.random.normal(k, (b, 1, 6, 6, cfg.in_channels), jnp.float32)
    ctx = jax.random.normal(jax.random.fold_in(k, 1),
                            (b, 8, cfg.adapter_source_dim), jnp.float32)
    t5 = jnp.tile(jnp.arange(1, 9, dtype=jnp.int32)[None], (b, 1))
    ts = jnp.linspace(100.0, 900.0, b)
    return lat, ts, ctx, t5


def test_split_merge_roundtrip():
    params = dit.init_params(CFG4, jax.random.PRNGKey(0))
    stacked, rest = pl.split_block_params(params, CFG4.num_blocks)
    assert all(leaf.shape[0] == CFG4.num_blocks for leaf in stacked.values())
    merged = pl.merge_block_params(stacked, rest, CFG4.num_blocks)
    assert set(merged) == set(params)
    for k in params:
        np.testing.assert_array_equal(np.asarray(merged[k]),
                                      np.asarray(params[k]))


def _put(mesh, stacked, rest, args):
    stacked_s = {k: jax.device_put(v, NamedSharding(mesh, P("pp")))
                 for k, v in stacked.items()}
    rest_s = {k: jax.device_put(v, NamedSharding(mesh, P()))
              for k, v in rest.items()}
    args_s = [jax.device_put(a, NamedSharding(mesh, P("dp")))
              for a in args]
    return stacked_s, rest_s, args_s


@requires_8
@pytest.mark.parametrize("pp,dp,micro", [(4, 2, 2), (2, 2, 1)])
def test_pp_forward_matches_sequential(pp, dp, micro):
    cfg = CFG4
    params = dit.init_params(cfg, jax.random.PRNGKey(0))
    lat, ts, ctx, t5 = _inputs(cfg, b=4)
    seq = dit.dit_forward(params, lat, ts, ctx, cfg=cfg, t5_ids=t5,
                          compute_dtype=jnp.float32, remat=False)

    mesh = Mesh(np.asarray(jax.devices()[: dp * pp]).reshape(dp, pp),
                ("dp", "pp"))
    stacked, rest = pl.split_block_params(params, cfg.num_blocks)
    stacked_s, rest_s, (lat_s, ts_s, ctx_s, t5_s) = _put(
        mesh, stacked, rest, [lat, ts, ctx, t5])

    out = jax.jit(lambda s, r, a, b_, c, d: pl.pp_dit_forward(
        s, r, a, b_, c, cfg=cfg, mesh=mesh, microbatches=micro,
        t5_ids=d, compute_dtype=jnp.float32, remat=False))(
            stacked_s, rest_s, lat_s, ts_s, ctx_s, t5_s)
    np.testing.assert_allclose(np.asarray(out), np.asarray(seq),
                               rtol=1e-4, atol=1e-4)


@requires_8
def test_pp_grads_match_sequential():
    cfg = CFG4
    params = dit.init_params(cfg, jax.random.PRNGKey(0))
    lat, ts, ctx, t5 = _inputs(cfg, b=4, key=7)

    def seq_loss(p):
        out = dit.dit_forward(p, lat, ts, ctx, cfg=cfg, t5_ids=t5,
                              compute_dtype=jnp.float32, remat=False)
        return jnp.mean(out ** 2)

    g_seq = jax.grad(seq_loss)(params)
    g_seq_stacked, g_seq_rest = pl.split_block_params(g_seq, cfg.num_blocks)

    mesh = Mesh(np.asarray(jax.devices()).reshape(2, 4), ("dp", "pp"))
    stacked, rest = pl.split_block_params(params, cfg.num_blocks)
    stacked_s, rest_s, args_s = _put(mesh, stacked, rest, [lat, ts, ctx, t5])

    def pp_loss2(s, r):
        out = pl.pp_dit_forward(s, r, args_s[0], args_s[1], args_s[2],
                                cfg=cfg, mesh=mesh, microbatches=2,
                                t5_ids=args_s[3],
                                compute_dtype=jnp.float32, remat=False)
        return jnp.mean(out ** 2)

    g_stacked, g_rest = jax.jit(jax.grad(pp_loss2, argnums=(0, 1)))(
        stacked_s, rest_s)
    for k in g_seq_stacked:
        np.testing.assert_allclose(np.asarray(g_stacked[k]),
                                   np.asarray(g_seq_stacked[k]),
                                   rtol=5e-4, atol=1e-5, err_msg=k)
    for k in g_seq_rest:
        np.testing.assert_allclose(np.asarray(g_rest[k]),
                                   np.asarray(g_seq_rest[k]),
                                   rtol=5e-4, atol=1e-5, err_msg=k)


class _Cfg:
    BATCH_SIZE = 2

    def __init__(self, **kw):
        for k, v in kw.items():
            setattr(self, k, v)


@requires_8
def test_resolve_mesh_layout_pp(monkeypatch):
    from aozora_sdxl_training_tpu.parallel import sharding as shard
    monkeypatch.delenv("AOZORA_DEVICES", raising=False)
    lay = shard.resolve_mesh_layout(_Cfg(PIPELINE_PARALLEL_SIZE=4))
    assert (lay.dp, lay.pp, lay.tp, lay.sp) == (2, 4, 1, 1)
    assert lay.global_batch == 2 * 2  # BATCH_SIZE x dp
    # pp is exclusive with tp/sp: both fall back
    lay = shard.resolve_mesh_layout(_Cfg(PIPELINE_PARALLEL_SIZE=2,
                                         TENSOR_PARALLEL_SIZE=2))
    assert (lay.tp, lay.pp) == (1, 2)
    # non-divisible pp falls back to 1
    lay = shard.resolve_mesh_layout(_Cfg(PIPELINE_PARALLEL_SIZE=3))
    assert lay.pp == 1
    mesh = shard.make_mesh(jax.devices(), dp=2, pp=4)
    assert mesh.axis_names == ("dp", "pp")


def test_stackify_refuses_non_uniform_blocks():
    from aozora_sdxl_training_tpu.parallel import pipeline as pl2
    params = {"blocks.0.w": jnp.ones((2, 2)), "blocks.1.w": jnp.ones((2, 2)),
              "blocks.0.only_here": jnp.ones((2,)), "other": jnp.ones((3,))}
    with pytest.raises(ValueError, match="block-uniform"):
        pl2.stackify_params(params, 2)
    del params["blocks.0.only_here"]
    out = pl2.stackify_params(params, 2)
    assert set(out) == {"__stack__.w", "other"}
    back = pl2.unstackify_params(out, 2)
    assert set(back) == set(params)


@requires_8
def test_pp_forward_video_mode():
    """T=2 latent frames through the pipeline (5-D activations hop the
    stage ring unchanged)."""
    cfg = CFG4
    params = dit.init_params(cfg, jax.random.PRNGKey(1))
    k = jax.random.PRNGKey(9)
    b = 4
    lat = jax.random.normal(k, (b, 2, 6, 6, cfg.in_channels), jnp.float32)
    ctx = jax.random.normal(jax.random.fold_in(k, 1),
                            (b, 8, cfg.adapter_source_dim), jnp.float32)
    t5 = jnp.tile(jnp.arange(1, 9, dtype=jnp.int32)[None], (b, 1))
    ts = jnp.linspace(100.0, 900.0, b)
    seq = dit.dit_forward(params, lat, ts, ctx, cfg=cfg, t5_ids=t5,
                          compute_dtype=jnp.float32, remat=False)
    mesh = Mesh(np.asarray(jax.devices()).reshape(2, 4), ("dp", "pp"))
    stacked, rest = pl.split_block_params(params, cfg.num_blocks)
    stacked_s, rest_s, (lat_s, ts_s, ctx_s, t5_s) = _put(
        mesh, stacked, rest, [lat, ts, ctx, t5])
    out = jax.jit(lambda s, r, a, b_, c, d: pl.pp_dit_forward(
        s, r, a, b_, c, cfg=cfg, mesh=mesh, microbatches=2,
        t5_ids=d, compute_dtype=jnp.float32, remat=False))(
            stacked_s, rest_s, lat_s, ts_s, ctx_s, t5_s)
    np.testing.assert_allclose(np.asarray(out), np.asarray(seq),
                               rtol=1e-4, atol=1e-4)
