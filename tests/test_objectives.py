"""DDPM schedule, objective targets, noise determinism, loss weighting."""

import jax.numpy as jnp
import numpy as np
import pytest

from aozora_sdxl_training_tpu.train import objectives as obj


def test_ddpm_schedule_endpoints():
    acp = obj.ddpm_alphas_cumprod()
    assert acp.shape == (1000,)
    # alphas_cumprod[0] = 1 - beta_0 = 1 - 0.00085
    assert acp[0] == pytest.approx(1.0 - 0.00085, rel=1e-9)
    assert 0.0 < acp[-1] < 0.01  # heavily noised at t=999
    assert np.all(np.diff(acp) < 0)  # strictly decreasing


def test_sigma_table_monotone():
    sig = obj.noise_sigma_table()
    assert sig.shape == (1000,)
    assert np.all(np.diff(sig) > 0)
    assert sig[0] == pytest.approx(np.sqrt(0.00085), rel=1e-5)


def test_noise_determinism():
    n1 = obj.noise_for_step(42, jnp.asarray(7), (2, 4, 4, 4))
    n2 = obj.noise_for_step(42, jnp.asarray(7), (2, 4, 4, 4))
    n3 = obj.noise_for_step(42, jnp.asarray(8), (2, 4, 4, 4))
    np.testing.assert_array_equal(np.asarray(n1), np.asarray(n2))
    assert not np.array_equal(np.asarray(n1), np.asarray(n3))
    assert n1.dtype == jnp.float32


def test_rf_jitter_determinism_and_range():
    j1 = obj.rf_jitter_for_step(42, jnp.asarray(3), 8)
    j2 = obj.rf_jitter_for_step(42, jnp.asarray(3), 8)
    np.testing.assert_array_equal(np.asarray(j1), np.asarray(j2))
    assert np.all((np.asarray(j1) >= 0) & (np.asarray(j1) < 1))


def test_eps_objective_target_is_noise():
    lat = jnp.ones((1, 2, 2, 4)) * 0.5
    noise = jnp.ones((1, 2, 2, 4))
    ts = jnp.array([100])
    noisy, target, t_cond, sigma = obj.prepare_batch("epsilon", lat, noise, ts)
    np.testing.assert_array_equal(np.asarray(target), np.asarray(noise))
    acp = obj.ddpm_alphas_cumprod()[100]
    expect = np.sqrt(acp) * 0.5 + np.sqrt(1 - acp) * 1.0
    np.testing.assert_allclose(np.asarray(noisy)[0, 0, 0, 0], expect, rtol=1e-5)
    assert float(t_cond[0]) == 100.0
    assert float(sigma[0]) == pytest.approx(np.sqrt(1 - acp), rel=1e-5)


def test_v_objective_target():
    lat = jnp.full((1, 2, 2, 4), 0.5)
    noise = jnp.full((1, 2, 2, 4), 1.0)
    ts = jnp.array([500])
    _, target, _, _ = obj.prepare_batch("v_prediction", lat, noise, ts)
    acp = obj.ddpm_alphas_cumprod()[500]
    expect = np.sqrt(acp) * 1.0 - np.sqrt(1 - acp) * 0.5
    np.testing.assert_allclose(np.asarray(target)[0, 0, 0, 0], expect, rtol=1e-5)


def test_rf_objective():
    lat = jnp.full((2, 2, 2, 4), 0.25)
    noise = jnp.full((2, 2, 2, 4), 1.0)
    ts = jnp.array([250, 750])
    jitter = jnp.array([0.5, 0.5])
    noisy, target, t_cond, sigma = obj.prepare_batch(
        "rectified_flow", lat, noise, ts, jitter)
    t0 = (250 + 0.5) / 1000.0
    np.testing.assert_allclose(np.asarray(noisy)[0, 0, 0, 0],
                               (1 - t0) * 0.25 + t0 * 1.0, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(target), 0.75, rtol=1e-6)
    assert float(t_cond[0]) == pytest.approx(t0 * 1000.0)
    assert float(sigma[1]) == pytest.approx((750 + 0.5) / 1000.0)


def test_weighted_mse_loss():
    pred = jnp.zeros((2, 2, 2, 1))
    target = jnp.ones((2, 2, 2, 1))
    ts = jnp.array([0, 999])
    weights = jnp.concatenate([jnp.full(500, 2.0), jnp.full(500, 0.5)])
    loss = obj.weighted_mse_loss(pred, target, ts, weights)
    # per-sample mse = 1.0; weights 2.0 and 0.5 -> mean 1.25
    assert float(loss) == pytest.approx(1.25)
    loss_unweighted = obj.weighted_mse_loss(pred, target, ts, None)
    assert float(loss_unweighted) == pytest.approx(1.0)


def test_noise_is_batch_size_invariant():
    """Per-slot keying: padding a batch must not change real samples' noise
    (dp-mesh padded batches == unpadded batches numerically)."""
    n2 = obj.noise_for_step(42, jnp.asarray(7), (2, 4, 4, 4))
    n8 = obj.noise_for_step(42, jnp.asarray(7), (8, 4, 4, 4))
    np.testing.assert_array_equal(np.asarray(n8[:2]), np.asarray(n2))
    j2 = obj.rf_jitter_for_step(42, jnp.asarray(3), 2)
    j8 = obj.rf_jitter_for_step(42, jnp.asarray(3), 8)
    np.testing.assert_array_equal(np.asarray(j8[:2]), np.asarray(j2))


def test_masked_mse_matches_unpadded_mean():
    rng = np.random.default_rng(0)
    pred = jnp.asarray(rng.normal(size=(2, 4, 4, 4)).astype(np.float32))
    target = jnp.asarray(rng.normal(size=(2, 4, 4, 4)).astype(np.float32))
    ts = jnp.asarray([100, 900], jnp.int32)
    weights = jnp.asarray(np.linspace(0.5, 1.5, 1000), jnp.float32)
    plain = obj.weighted_mse_loss(pred, target, ts, weights)
    # pad to 8 by repeating samples; mask the padding out
    idx = jnp.asarray(np.arange(8) % 2)
    mask = jnp.asarray((np.arange(8) < 2).astype(np.float32))
    padded = obj.weighted_mse_loss(pred[idx], target[idx], ts[idx], weights,
                                   sample_mask=mask)
    assert float(plain) == pytest.approx(float(padded), rel=1e-6)
