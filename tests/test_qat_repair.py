"""Projected quantization controller: dequant/project/error-feedback/save."""

import numpy as np
import pytest

from aozora_sdxl_training_tpu.ckpt.safetensors_io import load_all, write_streaming
from aozora_sdxl_training_tpu.tools import quantize as q
from aozora_sdxl_training_tpu.train.qat_repair import (
    ProjectedQuantController,
    load_quantized_checkpoint,
)


@pytest.fixture()
def quantized_state():
    rng = np.random.default_rng(0)
    w = rng.normal(size=(32, 32)).astype(np.float32)
    state = dict(q.quant_records_for_weight(
        "blocks.0.mlp.layer1.weight", w, "int8_tensorwise"))
    state.update(q.quant_records_for_weight(
        "blocks.0.attn.q_proj.weight",
        rng.normal(size=(32, 32)).astype(np.float32), "nvfp4"))
    state["norm.weight"] = np.ones(32, np.float32)
    return state, w


def test_controller_identifies_quantized_keys(quantized_state):
    state, _ = quantized_state
    ctl = ProjectedQuantController(state)
    assert ctl.controlled_keys == ["blocks.0.attn.q_proj.weight",
                                   "blocks.0.mlp.layer1.weight"]
    params = ctl.dequantized_params()
    assert params["blocks.0.mlp.layer1.weight"].shape == (32, 32)
    assert "norm.weight" in params
    assert "blocks.0.mlp.layer1.comfy_quant" not in params


def test_projection_is_idempotent_without_updates(quantized_state):
    state, _ = quantized_state
    ctl = ProjectedQuantController(state)
    params = ctl.dequantized_params()
    projected = ctl.project(params)
    # projecting the dequantized values reproduces them (codes unchanged)
    np.testing.assert_allclose(projected["blocks.0.mlp.layer1.weight"],
                               params["blocks.0.mlp.layer1.weight"],
                               rtol=1e-5, atol=1e-6)


def test_error_feedback_accumulates_small_updates(quantized_state):
    """Updates below one quant step must eventually land via residuals."""
    state, _ = quantized_state
    ctl = ProjectedQuantController(state)
    params = ctl.dequantized_params()
    key = "blocks.0.mlp.layer1.weight"
    start = params[key].copy()
    scale = np.abs(start).max() / 127.0
    tiny = scale * 0.3  # well below one int8 step
    current = dict(params)
    for _ in range(8):
        current[key] = current[key] + tiny
        current = ctl.project(current)
    moved = (current[key] - start).mean()
    assert moved > scale  # accumulated ~2.4 steps despite sub-step updates


def test_save_and_reload_roundtrip(quantized_state, tmp_path):
    state, _ = quantized_state
    ctl = ProjectedQuantController(state)
    params = ctl.dequantized_params()
    params["blocks.0.mlp.layer1.weight"] = (
        params["blocks.0.mlp.layer1.weight"] + 0.1)
    ctl.project(params)
    out = tmp_path / "repaired.safetensors"
    ctl.save_quantized(out, extra_state={"norm.weight": np.ones(32, np.float32)})
    reloaded = load_quantized_checkpoint(out)
    assert reloaded.controlled_keys == ctl.controlled_keys
    p2 = reloaded.dequantized_params()
    np.testing.assert_allclose(
        p2["blocks.0.mlp.layer1.weight"],
        ctl.project(ctl.dequantized_params())["blocks.0.mlp.layer1.weight"],
        rtol=1e-5)
    # stored weight stays packed int8
    raw = load_all(out)
    assert raw["blocks.0.mlp.layer1.weight"].dtype == np.int8


# --------------------------------------------------------------------------
# In-jit projection (qat_project_jax) vs the host numpy quantizers
# --------------------------------------------------------------------------

def _host_roundtrip(key, w, fmt, mult=1.0):
    state = dict(q.quant_records_for_weight(key, w, fmt, mult))
    return np.asarray(q.dequantize_records(key, state,
                                           out_shape=tuple(w.shape)),
                      np.float32)


@pytest.mark.parametrize("fmt", ["int8_tensorwise", "float8_e4m3fn",
                                 "float8_e5m2", "nvfp4", "ternary_1_58"])
def test_jnp_projection_matches_host_quantizer(fmt):
    from aozora_sdxl_training_tpu.train.qat_project_jax import project_weight

    rng = np.random.default_rng(7)
    w = (rng.normal(size=(48, 64)) * rng.uniform(0.01, 2.0)).astype(np.float32)
    key = "blocks.0.mlp.layer1.weight"
    expected = _host_roundtrip(key, w, fmt)
    got = np.asarray(project_weight(fmt, w), np.float32)
    np.testing.assert_allclose(got, expected, rtol=1e-6, atol=1e-7,
                               err_msg=fmt)


def test_e2m1_rounding_matches_bitwise_rne():
    """The jnp grid rounding must reproduce f32_to_e2m1_codes' RNE ties."""
    from aozora_sdxl_training_tpu.train.qat_project_jax import (
        _round_e2m1_magnitude)

    xs = np.concatenate([
        np.asarray([0.0, 0.25, 0.75, 1.25, 1.75, 2.5, 3.5, 5.0, 6.0],
                   np.float32),  # exact midpoints + endpoints
        np.linspace(0, 6, 977, dtype=np.float32),
        np.random.default_rng(3).uniform(0, 6, 500).astype(np.float32),
    ])
    expected = q.e2m1_to_f32(q.f32_to_e2m1_codes(xs))
    got = np.asarray(_round_e2m1_magnitude(xs))
    np.testing.assert_array_equal(got, expected)


def test_device_projector_error_feedback():
    """Device-side error feedback accumulates sub-step updates like the
    host controller, with fp16 residuals (reference parity:
    train_anima_repair.py FP16 CPU residuals)."""
    import jax.numpy as jnp
    from aozora_sdxl_training_tpu.train.qat_project_jax import (
        make_device_projector)

    rng = np.random.default_rng(0)
    w_torch = rng.normal(size=(32, 32)).astype(np.float32)
    key = "blocks.0.mlp.layer1.weight"
    formats = {key: "int8_tensorwise"}
    init_res, project = make_device_projector(formats)

    # trainable carries the JAX (in, out) layout
    trainable = {key: jnp.asarray(w_torch.T),
                 "norm.weight": jnp.ones(32, jnp.float32)}
    residuals = init_res(trainable)
    assert set(residuals) == {key}
    assert residuals[key].shape == w_torch.shape  # torch layout

    trainable, residuals = project(trainable, residuals)
    start = np.asarray(trainable[key]).copy()
    scale = np.abs(w_torch).max() / 127.0
    tiny = scale * 0.3
    for _ in range(8):
        trainable = {**trainable, key: trainable[key] + tiny}
        trainable, residuals = project(trainable, residuals)
    moved = (np.asarray(trainable[key]) - start).mean()
    assert moved > scale
    # untouched params pass through
    np.testing.assert_array_equal(np.asarray(trainable["norm.weight"]),
                                  np.ones(32, np.float32))
