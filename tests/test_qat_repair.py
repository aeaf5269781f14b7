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
