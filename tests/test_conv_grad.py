"""GEMM-decomposed conv backward (ops/conv.py) vs jax.grad of plain conv."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from aozora_sdxl_training_tpu.ops.conv import conv3x3_gemm_bwd, _conv_nhwc


@pytest.mark.parametrize("shape", [(1, 8, 8, 12, 16), (2, 5, 7, 8, 8)])
def test_grads_match_xla_conv(shape):
    b, h, w, cin, cout = shape
    kx, kw_, kdy = jax.random.split(jax.random.PRNGKey(0), 3)
    x = jax.random.normal(kx, (b, h, w, cin), jnp.float32)
    wgt = jax.random.normal(kw_, (3, 3, cin, cout), jnp.float32) * 0.1
    dy = jax.random.normal(kdy, (b, h, w, cout), jnp.float32)

    def loss_ref(x_, w_):
        return jnp.sum(_conv_nhwc(x_, w_) * dy)

    def loss_gemm(x_, w_):
        return jnp.sum(conv3x3_gemm_bwd(x_, w_) * dy)

    np.testing.assert_allclose(loss_gemm(x, wgt), loss_ref(x, wgt), rtol=1e-5)
    gx_r, gw_r = jax.grad(loss_ref, argnums=(0, 1))(x, wgt)
    gx_g, gw_g = jax.grad(loss_gemm, argnums=(0, 1))(x, wgt)
    np.testing.assert_allclose(np.asarray(gx_g), np.asarray(gx_r),
                               rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(gw_g), np.asarray(gw_r),
                               rtol=2e-4, atol=2e-4)


def test_bf16_dtypes_preserved():
    x = jnp.ones((1, 4, 4, 8), jnp.bfloat16)
    wgt = jnp.ones((3, 3, 8, 8), jnp.bfloat16)

    def loss(x_, w_):
        return jnp.sum(conv3x3_gemm_bwd(x_, w_).astype(jnp.float32))

    gx, gw = jax.grad(loss, argnums=(0, 1))(x, wgt)
    assert gx.dtype == jnp.bfloat16 and gx.shape == x.shape
    assert gw.dtype == jnp.bfloat16 and gw.shape == wgt.shape


def test_unet_env_knob_routes(monkeypatch):
    from aozora_sdxl_training_tpu.models.sdxl import unet as unet_mod
    params = {"c.weight": jnp.ones((3, 3, 4, 4), jnp.float32) * 0.1,
              "c.bias": jnp.zeros((4,), jnp.float32)}
    x = jnp.ones((1, 4, 4, 4), jnp.float32)
    base = unet_mod.conv2d(params, "c", x)
    monkeypatch.setenv("AOZORA_CONV_BWD", "gemm")
    routed = unet_mod.conv2d(params, "c", x)
    np.testing.assert_allclose(np.asarray(routed), np.asarray(base),
                               rtol=1e-6)


@pytest.mark.parametrize("shape", [(1, 8, 8, 12, 16), (2, 5, 7, 8, 8)])
def test_gemm2_dgrad_matches_xla_conv(shape, monkeypatch):
    """AOZORA_CONV_BWD=gemm2 also GEMM-decomposes dx (9-tap dot_general)."""
    monkeypatch.setenv("AOZORA_CONV_BWD", "gemm2")
    b, h, w, cin, cout = shape
    kx, kw_, kdy = jax.random.split(jax.random.PRNGKey(1), 3)
    x = jax.random.normal(kx, (b, h, w, cin), jnp.float32)
    wgt = jax.random.normal(kw_, (3, 3, cin, cout), jnp.float32) * 0.1
    dy = jax.random.normal(kdy, (b, h, w, cout), jnp.float32)

    def loss_ref(x_, w_):
        return jnp.sum(_conv_nhwc(x_, w_) * dy)

    def loss_gemm(x_, w_):
        return jnp.sum(conv3x3_gemm_bwd(x_, w_) * dy)

    gx_r, gw_r = jax.grad(loss_ref, argnums=(0, 1))(x, wgt)
    gx_g, gw_g = jax.grad(loss_gemm, argnums=(0, 1))(x, wgt)
    np.testing.assert_allclose(np.asarray(gx_g), np.asarray(gx_r),
                               rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(gw_g), np.asarray(gw_r),
                               rtol=2e-4, atol=2e-4)


@pytest.mark.parametrize("shape", [(1, 8, 8, 12, 16), (2, 6, 10, 8, 8)])
def test_s2_gemm_grads_match_xla_conv(shape):
    """Stride-2 phase-decomposed GEMM backward vs jax.grad of plain conv."""
    from aozora_sdxl_training_tpu.ops.conv import conv3x3_s2_gemm_bwd
    b, h, w, cin, cout = shape
    kx, kw_, kdy = jax.random.split(jax.random.PRNGKey(2), 3)
    x = jax.random.normal(kx, (b, h, w, cin), jnp.float32)
    wgt = jax.random.normal(kw_, (3, 3, cin, cout), jnp.float32) * 0.1
    dy = jax.random.normal(kdy, (b, h // 2, w // 2, cout), jnp.float32)

    def loss_ref(x_, w_):
        return jnp.sum(_conv_nhwc(x_, w_, stride=2) * dy)

    def loss_gemm(x_, w_):
        return jnp.sum(conv3x3_s2_gemm_bwd(x_, w_) * dy)

    np.testing.assert_allclose(loss_gemm(x, wgt), loss_ref(x, wgt), rtol=1e-5)
    gx_r, gw_r = jax.grad(loss_ref, argnums=(0, 1))(x, wgt)
    gx_g, gw_g = jax.grad(loss_gemm, argnums=(0, 1))(x, wgt)
    np.testing.assert_allclose(np.asarray(gx_g), np.asarray(gx_r),
                               rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(gw_g), np.asarray(gw_r),
                               rtol=2e-4, atol=2e-4)


def test_unet_grads_gemm2_parity(monkeypatch):
    """Whole-UNet grads with AOZORA_CONV_BWD=gemm2 (stride-1 + stride-2
    routing) match the XLA-backward default."""
    from aozora_sdxl_training_tpu.models.sdxl import arch
    from aozora_sdxl_training_tpu.models.sdxl.unet import init_params, unet_forward
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

    monkeypatch.setenv("AOZORA_CONV_BWD", "xla")  # default is gemm2 since r4
    g_base = jax.grad(loss)(params)
    monkeypatch.setenv("AOZORA_CONV_BWD", "gemm2")
    g_gemm = jax.grad(loss)(params)
    for n in g_base:
        np.testing.assert_allclose(np.asarray(g_base[n]),
                                   np.asarray(g_gemm[n]),
                                   rtol=5e-4, atol=1e-5, err_msg=n)
