"""Timestep distribution authoring math (GUI-parity, headless)."""

import math

import numpy as np
import pytest

from aozora_sdxl_training_tpu.data.schedule import build_timestep_ticket_pool
from aozora_sdxl_training_tpu.train import timestep_presets as tp


def test_wave_uniform_is_flat():
    w = tp.wave_weights(100, wave_amp=0.0)
    assert len(w) == 10
    assert all(x == 1.0 for x in w)


def test_wave_peak_middle():
    w = tp.wave_weights(100, wave_freq=1.0, wave_phase=3.14, wave_amp=0.6)
    assert w[5] > w[0]
    assert w[5] > w[-1]


def test_logit_normal_sums_to_one():
    w = tp.logit_normal_weights(50, ln_mu=0.0, ln_sigma=1.0)
    assert len(w) == 20
    assert sum(w) == pytest.approx(1.0, abs=1e-3)
    # symmetric around the middle for mu=0
    assert w[9] == pytest.approx(w[10], rel=0.05)
    # negative mu shifts mass to low timesteps
    w_lo = tp.logit_normal_weights(50, ln_mu=-1.0, ln_sigma=0.8)
    assert sum(w_lo[:10]) > sum(w_lo[10:])


def test_beta_shapes():
    sym = tp.beta_weights(100, beta_alpha=3.0, beta_beta=3.0)
    assert sym[4] == pytest.approx(sym[5], rel=0.05)
    u = tp.beta_weights(100, beta_alpha=0.5, beta_beta=0.5)
    assert u[0] > u[5] and u[-1] > u[5]
    right = tp.beta_weights(100, beta_alpha=2.0, beta_beta=5.0)
    assert np.argmax(right) < 5


def test_odds_scaled_direction():
    up = tp.odds_scaled_weights(100, 3.0)
    assert sum(up) == pytest.approx(1.0, abs=1e-6)
    down = tp.odds_scaled_weights(100, -3.0)
    # positive scale concentrates mass at HIGH bins; negative mirrors it
    assert up[-1] > up[0]
    assert down[0] > down[-1]
    np.testing.assert_allclose(up, down[::-1], rtol=1e-6)


def test_allocation_from_preset_feeds_ticket_pool():
    alloc = tp.allocation_from_preset("Logit-Normal (RF/SD3 Recommended)",
                                      bin_size=100)
    assert alloc["bin_size"] == 100
    assert len(alloc["counts"]) == 10
    pool, ranges = build_timestep_ticket_pool(alloc, 2000, seed=1)
    assert len(pool) == 2000
    # mass should lean low (mu=-0.5)
    low = sum(1 for t in pool if t < 500)
    assert low > 1100


def test_unknown_preset_raises():
    with pytest.raises(ValueError, match="Unknown preset"):
        tp.allocation_from_preset("nope")
    with pytest.raises(ValueError, match="Unknown timestep mode"):
        tp.distribution_weights("bogus", 100)


def test_training_calculations():
    opt, per_epoch, epochs = tp.training_calculations(1000, 4, 2, 100)
    assert opt == 250
    assert per_epoch == 50
    assert epochs == 20.0
    assert tp.training_calculations(10, 0, 1, 0)[0] == 0
    assert math.isinf(tp.training_calculations(10, 1, 1, 0)[2])


def test_epoch_marker_interval():
    per_epoch, markers = tp.epoch_marker_interval(1000, 2, 100)
    assert per_epoch == 50
    assert markers == (1000 - 1) // 50


def test_repeated_image_count():
    assert tp.repeated_image_count(
        [{"image_count": 10, "repeats": 3}, {"image_count": 5, "repeats": 1}]
    ) == 35
