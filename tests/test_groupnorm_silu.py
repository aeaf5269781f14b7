"""Fused GroupNorm+SiLU kernel vs the XLA composition."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from aozora_sdxl_training_tpu.ops.groupnorm_silu import (
    group_norm_silu,
    group_norm_silu_pallas,
)


def _reference(x, scale, bias, groups, eps=1e-5):
    b, h, w, c = x.shape
    xf = np.asarray(x, np.float32).reshape(b, h * w, groups, c // groups)
    mean = xf.mean(axis=(1, 3), keepdims=True)
    var = xf.var(axis=(1, 3), keepdims=True)
    xf = ((xf - mean) / np.sqrt(var + eps)).reshape(b, h, w, c)
    y = xf * np.asarray(scale) + np.asarray(bias)
    return y / (1 + np.exp(-y)) * 1  # silu


@pytest.mark.parametrize("shape,groups,tile", [
    ((2, 8, 8, 32), 8, 16),     # multi-tile
    ((1, 4, 4, 16), 4, 512),    # single tile (hw < tile)
])
def test_pallas_matches_reference(shape, groups, tile):
    rng = np.random.default_rng(0)
    x = rng.normal(size=shape).astype(np.float32)
    c = shape[-1]
    scale = rng.normal(size=(c,)).astype(np.float32)
    bias = rng.normal(size=(c,)).astype(np.float32)
    out = group_norm_silu_pallas(jnp.asarray(x), jnp.asarray(scale),
                                 jnp.asarray(bias), groups=groups,
                                 tile_hw=tile, interpret=True)
    ref = _reference(x, scale, bias, groups)
    np.testing.assert_allclose(np.asarray(out), ref, rtol=2e-4, atol=2e-4)


def test_dispatcher_fallback_matches():
    rng = np.random.default_rng(1)
    x = rng.normal(size=(1, 6, 6, 24)).astype(np.float32)
    scale = np.ones(24, np.float32)
    bias = np.zeros(24, np.float32)
    out = group_norm_silu(jnp.asarray(x), jnp.asarray(scale),
                          jnp.asarray(bias), groups=6, use_pallas=False)
    ref = _reference(x, scale, bias, 6)
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-4, atol=1e-5)


def test_fused_gradients_match_reference():
    from aozora_sdxl_training_tpu.ops.groupnorm_silu import (_xla_reference,
                                                             group_norm_silu)
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.normal(size=(1, 4, 4, 16)).astype(np.float32))
    scale = jnp.asarray(rng.normal(size=(16,)).astype(np.float32))
    bias = jnp.asarray(rng.normal(size=(16,)).astype(np.float32))

    def loss_fused(x, s, b):
        return jnp.sum(group_norm_silu(x, s, b, groups=4, use_pallas=True) ** 2)

    def loss_ref(x, s, b):
        return jnp.sum(_xla_reference(x, s, b, 4, 1e-5) ** 2)

    gf = jax.grad(loss_fused, argnums=(0, 1, 2))(x, scale, bias)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(x, scale, bias)
    for a, b_, name in zip(gf, gr, ("dx", "dscale", "dbias")):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   rtol=5e-4, atol=5e-4, err_msg=name)
