"""Raven-semantics AdamW: math parity with the reference optimizer."""

import jax.numpy as jnp
import numpy as np
import pytest

from aozora_sdxl_training_tpu.opt import adamw


def _reference_step(p, g, m, v, step, lr, beta1, beta2, eps, wd, debias):
    """Plain-numpy transcription of the Raven update contract
    (/root/reference/training_utils/optimizers/raven.py:105-147)."""
    m = m * beta1 + g * (1 - beta1)
    v = v * beta2 + g * g * (1 - beta2)
    bc1 = 1 - beta1 ** step
    bc2 = 1 - beta2 ** step
    if debias < 1.0:
        bc1 = 1 - (1 - bc1) * debias
        bc2 = 1 - (1 - bc2) * debias
    if wd != 0:
        p = p * (1 - lr * wd)
    denom = np.sqrt(v) / np.sqrt(bc2) + eps
    p = p - (lr / bc1) * m / denom
    return p, m, v


@pytest.mark.parametrize("debias", [1.0, 0.3])
def test_adamw_matches_reference_math(debias):
    rng = np.random.default_rng(0)
    p0 = rng.normal(size=(8, 16)).astype(np.float32)
    cfg = adamw.AdamWConfig(betas=(0.9, 0.999), eps=1e-8, weight_decay=0.01,
                            debias_strength=debias,
                            momentum_dtype=jnp.float32)
    params = {"w": jnp.asarray(p0)}
    state = adamw.init_state(params, cfg)

    p_ref, m_ref, v_ref = p0.copy(), np.zeros_like(p0), np.zeros_like(p0)
    lr = 1e-3
    for step in range(1, 4):
        g = rng.normal(size=p0.shape).astype(np.float32)
        params, state = adamw.apply_updates(
            params, {"w": jnp.asarray(g)}, state, cfg, lr=lr)
        p_ref, m_ref, v_ref = _reference_step(
            p_ref, g, m_ref, v_ref, step, lr, 0.9, 0.999, 1e-8, 0.01, debias)

    # numpy reference promotes through float64; allow fp32 rounding slack
    np.testing.assert_allclose(np.asarray(params["w"]), p_ref, rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(np.asarray(state.exp_avg["w"]), m_ref,
                               rtol=1e-4, atol=1e-6)
    assert int(state.step) == 3


def test_momentum_dtype_storage():
    cfg = adamw.AdamWConfig(momentum_dtype=jnp.bfloat16)
    params = {"w": jnp.ones((4, 4))}
    state = adamw.init_state(params, cfg)
    assert state.exp_avg["w"].dtype == jnp.bfloat16
    params, state = adamw.apply_updates(
        params, {"w": jnp.ones((4, 4)) * 0.1}, state, cfg, lr=1e-3)
    assert state.exp_avg["w"].dtype == jnp.bfloat16
    assert params["w"].dtype == jnp.float32


def test_config_from_params_dict():
    cfg = adamw.AdamWConfig.from_params_dict({
        "betas": [0.9, 0.98], "eps": 1e-6, "weight_decay": 0.05,
        "debias_strength": 0.3, "momentum_dtype": "float32"})
    assert cfg.betas == (0.9, 0.98)
    assert cfg.momentum_dtype == jnp.float32


def test_clip_by_global_norm():
    grads = {"a": jnp.full((3,), 4.0), "b": jnp.full((4,), 3.0)}
    # norm = sqrt(3*16 + 4*9) = sqrt(84)
    clipped, norm = adamw.clip_by_global_norm(grads, 1.0)
    assert float(norm) == pytest.approx(np.sqrt(84), rel=1e-5)
    cn = adamw.global_grad_norm(clipped)
    assert float(cn) == pytest.approx(1.0, rel=1e-5)
    # disabled clipping
    same, norm2 = adamw.clip_by_global_norm(grads, 0.0)
    np.testing.assert_array_equal(np.asarray(same["a"]), np.asarray(grads["a"]))
