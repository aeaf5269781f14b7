"""LR curve and timestep loss-weight curve golden tests."""

import numpy as np
import pytest

from aozora_sdxl_training_tpu.train.curves import (
    LRCurve,
    bell_timestep_loss_curve,
    timestep_loss_curve_from_config,
)


def test_lr_curve_interpolation():
    curve = LRCurve([[0.0, 0.0], [0.5, 1e-6], [1.0, 0.0]], total_micro_steps=101)
    assert curve.lr_at(0) == 0.0
    assert curve.lr_at(50) == pytest.approx(1e-6)
    assert curve.lr_at(25) == pytest.approx(0.5e-6)
    assert curve.lr_at(100) == pytest.approx(0.0, abs=1e-12)


def test_lr_curve_endpoint_padding():
    curve = LRCurve([[0.2, 2e-6], [0.8, 4e-6]], total_micro_steps=11)
    assert curve.lr_at(0) == pytest.approx(2e-6)   # padded flat before 0.2
    assert curve.lr_at(10) == pytest.approx(4e-6)  # padded flat after 0.8


def test_lr_curve_initial_lr_is_max_point():
    curve = LRCurve([[0.0, 0.0], [0.05, 8e-7], [0.85, 8e-7], [1.0, 1e-7]], 1000)
    assert curve.initial_lr == pytest.approx(8e-7)


def test_lr_curve_normalization_uses_step_fraction():
    # position = micro_step / (total - 1)
    curve = LRCurve([[0.0, 0.0], [1.0, 1.0]], total_micro_steps=5)
    assert curve.lr_at(2) == pytest.approx(0.5)
    assert curve.lr_at(4) == pytest.approx(1.0)


def test_lr_curve_empty_raises():
    with pytest.raises(ValueError):
        LRCurve([], 10)


def test_bell_curve_properties():
    y = bell_timestep_loss_curve(1000)
    assert y.shape == (1000,)
    assert y.mean() == pytest.approx(1.0, rel=1e-5)
    assert y.argmax() in (499, 500)
    assert y.min() == pytest.approx(0.0, abs=1e-7)


class _Cfg:
    def __init__(self, curve):
        self.TIMESTEP_LOSS_WEIGHT_CURVE = curve


def test_loss_curve_flat_default():
    y = timestep_loss_curve_from_config(_Cfg([[0.0, 1.0], [1.0, 1.0]]), 1000)
    np.testing.assert_allclose(y, np.ones(1000), rtol=1e-6)


def test_loss_curve_bell_preset():
    y = timestep_loss_curve_from_config(_Cfg({"preset": "bell"}), 1000)
    np.testing.assert_allclose(y, bell_timestep_loss_curve(1000))


def test_loss_curve_piecewise():
    y = timestep_loss_curve_from_config(_Cfg([[0.0, 0.0], [1.0, 2.0]]), 1000)
    assert y[0] == pytest.approx(0.0)
    assert y[-1] == pytest.approx(2.0)
    assert y[499] == pytest.approx(2.0 * 499 / 999, rel=1e-4)


def test_loss_curve_rejects_bad_points():
    y = timestep_loss_curve_from_config(_Cfg([["x", 1.0], [0.5]]), 100)
    np.testing.assert_allclose(y, np.ones(100))
    y2 = timestep_loss_curve_from_config(_Cfg(None), 100)
    np.testing.assert_allclose(y2, np.ones(100))


def test_empty_lr_curve_falls_back_to_constant_learning_rate():
    """Reference parity: with an empty LR_CUSTOM_CURVE the optimizer runs
    at the constant LEARNING_RATE (train.py:2259 fallback)."""
    from aozora_sdxl_training_tpu.train import curves
    c = curves.LRCurve([], 100, fallback_lr=3e-5)
    assert c.initial_lr == pytest.approx(3e-5)
    assert c.lr_at(0) == pytest.approx(3e-5)
    assert c.lr_at(99) == pytest.approx(3e-5)
    with pytest.raises(ValueError):
        curves.LRCurve([], 100)  # no fallback -> still a loud error
