"""Fused q/k/v projection (ops/fused_proj.py): numerics parity.

The fused path is a trace-time rewrite (one wide GEMM over concatenated
weights instead of three narrow ones); both model forwards must match the
unfused path to float32 tolerance with AOZORA_FUSED_QKV=1.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from aozora_sdxl_training_tpu.models.anima import dit
from aozora_sdxl_training_tpu.models.sdxl import arch
from aozora_sdxl_training_tpu.models.sdxl.unet import init_params, unet_forward
from aozora_sdxl_training_tpu.ops.fused_proj import fused_linear


def test_fused_linear_matches_separate():
    key = jax.random.PRNGKey(0)
    params = {
        "a.weight": jax.random.normal(key, (16, 24)),
        "b.weight": jax.random.normal(jax.random.fold_in(key, 1), (16, 8)),
    }
    x = jax.random.normal(jax.random.fold_in(key, 2), (4, 16))
    ya, yb = fused_linear(params, ["a", "b"], x)
    np.testing.assert_allclose(np.asarray(ya), np.asarray(x @ params["a.weight"]),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(yb), np.asarray(x @ params["b.weight"]),
                               rtol=1e-5, atol=1e-5)


def test_fused_linear_refuses_bias():
    params = {"a.weight": jnp.ones((4, 4)), "a.bias": jnp.ones((4,))}
    with pytest.raises(AssertionError):
        fused_linear(params, ["a"], jnp.ones((2, 4)))


def test_unet_forward_fused_qkv_parity(monkeypatch):
    cfg = arch.TINY
    params = init_params(cfg, jax.random.PRNGKey(0))
    args = (
        jax.random.normal(jax.random.PRNGKey(1), (1, 8, 8, 4)),
        jnp.array([100.0]),
        jax.random.normal(jax.random.PRNGKey(2), (1, 7, cfg.cross_attention_dim)),
        jax.random.normal(jax.random.PRNGKey(3), (1, cfg.pooled_projection_dim)),
        jnp.ones((1, 6)),
    )
    monkeypatch.setenv("AOZORA_FUSED_QKV", "0")  # default on since r4
    base = unet_forward(params, *args, cfg=cfg, compute_dtype=jnp.float32)
    monkeypatch.setenv("AOZORA_FUSED_QKV", "1")
    fused = unet_forward(params, *args, cfg=cfg, compute_dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(base), np.asarray(fused),
                               rtol=1e-5, atol=1e-5)


def test_unet_grads_fused_qkv_parity(monkeypatch):
    """The weight cotangents must land on the separate to_q/to_k/to_v
    tensors identically (AD slices the fused cotangent)."""
    cfg = arch.TINY
    params = init_params(cfg, jax.random.PRNGKey(0))
    args = (
        jax.random.normal(jax.random.PRNGKey(1), (1, 8, 8, 4)),
        jnp.array([100.0]),
        jax.random.normal(jax.random.PRNGKey(2), (1, 7, cfg.cross_attention_dim)),
        jax.random.normal(jax.random.PRNGKey(3), (1, cfg.pooled_projection_dim)),
        jnp.ones((1, 6)),
    )

    def loss(p):
        return jnp.mean(
            unet_forward(p, *args, cfg=cfg, compute_dtype=jnp.float32) ** 2)

    monkeypatch.setenv("AOZORA_FUSED_QKV", "0")  # default on since r4
    g_base = jax.grad(loss)(params)
    monkeypatch.setenv("AOZORA_FUSED_QKV", "1")
    g_fused = jax.grad(loss)(params)
    qkv_names = [n for n in params if ".to_q." in n or ".to_k." in n
                 or ".to_v." in n]
    assert qkv_names
    for n in qkv_names:
        np.testing.assert_allclose(np.asarray(g_base[n]),
                                   np.asarray(g_fused[n]),
                                   rtol=1e-4, atol=1e-5, err_msg=n)


def test_dit_forward_fused_qkv_parity(monkeypatch):
    cfg = dit.TINY_ANIMA
    params = dit.init_params(cfg, jax.random.PRNGKey(0))
    lat = jax.random.normal(jax.random.PRNGKey(3), (1, 1, 6, 6, cfg.in_channels))
    ctx = jax.random.normal(jax.random.PRNGKey(4), (1, 8, cfg.adapter_source_dim))
    t5 = jnp.ones((1, 8), jnp.int32)
    monkeypatch.setenv("AOZORA_FUSED_QKV", "0")  # default on since r4
    base = dit.dit_forward(params, lat, jnp.array([500.0]), ctx, cfg=cfg,
                           t5_ids=t5, compute_dtype=jnp.float32, remat=False)
    monkeypatch.setenv("AOZORA_FUSED_QKV", "1")
    fused = dit.dit_forward(params, lat, jnp.array([500.0]), ctx, cfg=cfg,
                            t5_ids=t5, compute_dtype=jnp.float32, remat=False)
    np.testing.assert_allclose(np.asarray(base), np.asarray(fused),
                               rtol=1e-5, atol=1e-5)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_fused_qkv_under_tp_mesh_parity(monkeypatch):
    """Fused QKV concatenates along the tp-sharded output axis; GSPMD must
    still produce the unfused single-device numerics (the concat may cost
    a reshard — correctness here, perf decided by e2e timing)."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from aozora_sdxl_training_tpu.parallel import sharding as shard

    cfg = arch.TINY
    params = init_params(cfg, jax.random.PRNGKey(0))
    args = (
        jax.random.normal(jax.random.PRNGKey(1), (2, 8, 8, 4)),
        jnp.array([100.0, 10.0]),
        jax.random.normal(jax.random.PRNGKey(2), (2, 7, cfg.cross_attention_dim)),
        jax.random.normal(jax.random.PRNGKey(3), (2, cfg.pooled_projection_dim)),
        jnp.ones((2, 6)),
    )
    monkeypatch.setenv("AOZORA_FUSED_QKV", "0")  # default on since r4
    base = unet_forward(params, *args, cfg=cfg, compute_dtype=jnp.float32)

    monkeypatch.setenv("AOZORA_FUSED_QKV", "1")
    mesh = shard.make_mesh(jax.devices(), dp=2, tp=4)
    p_shard = shard.params_shardings(params, mesh, min_shard_elements=1024)
    params_s = shard.put_tree(params, p_shard)
    args_s = [jax.device_put(a, NamedSharding(mesh, P("dp")))
              for a in args]
    fused = jax.jit(lambda p, *a: unet_forward(
        p, *a, cfg=cfg, compute_dtype=jnp.float32))(params_s, *args_s)
    np.testing.assert_allclose(np.asarray(base), np.asarray(fused),
                               rtol=1e-4, atol=1e-4)


def test_bf16probs_attention_parity(monkeypatch):
    """AOZORA_XLA_ATTN=bf16probs: fwd matches default XLA attention; grads
    match to bf16-probs tolerance."""
    from aozora_sdxl_training_tpu.ops import attention as attn_mod
    key = jax.random.PRNGKey(0)
    q = jax.random.normal(key, (1, 64, 4, 16), jnp.float32)
    k = jax.random.normal(jax.random.fold_in(key, 1), (1, 48, 4, 16), jnp.float32)
    v = jax.random.normal(jax.random.fold_in(key, 2), (1, 48, 4, 16), jnp.float32)

    def loss(q_, k_, v_):
        return jnp.sum(attn_mod.dot_product_attention_xla(q_, k_, v_) ** 2)

    monkeypatch.delenv("AOZORA_XLA_ATTN", raising=False)
    out0 = attn_mod.dot_product_attention_xla(q, k, v)
    g0 = jax.grad(loss, argnums=(0, 1, 2))(q, k, v)
    monkeypatch.setenv("AOZORA_XLA_ATTN", "bf16probs")
    out1 = attn_mod.dot_product_attention_xla(q, k, v)
    g1 = jax.grad(loss, argnums=(0, 1, 2))(q, k, v)
    np.testing.assert_allclose(np.asarray(out0), np.asarray(out1),
                               rtol=1e-5, atol=1e-5)
    for a, b in zip(g0, g1):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-2, atol=2e-2)
