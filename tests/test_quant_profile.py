"""Dynamic mixed-precision profiling strategies."""

import numpy as np

from aozora_sdxl_training_tpu.tools import quant_profile as qp
from aozora_sdxl_training_tpu.tools import quantize as q


def _toy_state(rng):
    # the "sensitive" layer has a huge outlier, so absmax scaling wrecks it
    sensitive = rng.normal(size=(64, 64)).astype(np.float32)
    sensitive[0, 0] = 500.0
    robust = rng.normal(size=(64, 64)).astype(np.float32)
    return {
        "blocks.0.mlp.layer1.weight": sensitive,
        "blocks.1.mlp.layer1.weight": robust,
        "norm.weight": np.ones(64, np.float32),
    }


def test_simulated_quant_and_local_error():
    rng = np.random.default_rng(0)
    w = rng.normal(size=(32, 32)).astype(np.float32)
    wq = qp.simulated_quant_weight(w, "int8_tensorwise")
    assert wq.shape == w.shape
    err8 = qp.layer_local_error(w, "int8_tensorwise")
    err4 = qp.layer_local_error(w, "nvfp4")
    errt = qp.layer_local_error(w, "ternary_1_58")
    assert err8 < err4 < errt  # more bits, less error
    assert qp.layer_local_error(w, "keep") == 0.0


def test_fast_dynamic_promotes_outlier_layer():
    rng = np.random.default_rng(1)
    state = _toy_state(rng)
    profile = qp.fast_dynamic_profile(state, format_name="int8_tensorwise",
                                      promote_threshold=0.02,
                                      promote_format="float8_e4m3fn")
    # the outlier layer has high int8 (per-row absmax) error only on one row;
    # compare relative errors directly to assert ordering
    e_sens = qp.layer_local_error(state["blocks.0.mlp.layer1.weight"],
                                  "int8_tensorwise")
    e_rob = qp.layer_local_error(state["blocks.1.mlp.layer1.weight"],
                                 "int8_tensorwise")
    assert e_sens > e_rob
    assert set(profile) == {"blocks.0.mlp.layer1.weight",
                            "blocks.1.mlp.layer1.weight"}
    assert "norm.weight" not in profile


def test_global_dynamic_profile_uses_forward():
    rng = np.random.default_rng(2)
    state = _toy_state(rng)
    x = rng.normal(size=(8, 64)).astype(np.float32)

    def forward(s):
        h = x @ s["blocks.0.mlp.layer1.weight"].T
        return h @ s["blocks.1.mlp.layer1.weight"].T

    profile = qp.global_dynamic_profile(
        state, forward, format_name="ternary_1_58", promote_threshold=0.5,
        promote_format="float8_e4m3fn")
    # ternary is brutal: both layers exceed a 50% end-to-end budget -> promoted
    assert set(profile.values()) <= {"ternary_1_58", "float8_e4m3fn"}
    assert len(profile) == 2


def test_compression_first_meets_budget():
    rng = np.random.default_rng(3)
    state = _toy_state(rng)
    x = rng.normal(size=(4, 64)).astype(np.float32)

    def forward(s):
        return (x @ s["blocks.0.mlp.layer1.weight"].T
                @ s["blocks.1.mlp.layer1.weight"])

    profile = qp.compression_first_profile(state, forward, error_budget=0.10,
                                           max_rounds=12)
    # promotions happened beyond the most-compressed start
    assert any(fmt != "ternary_1_58" for fmt in profile.values())

    tensors, report = qp.apply_profile(state, profile)
    assert report["quantized"] == 2
    assert report["kept"] == 1  # norm.weight passthrough


def test_apply_profile_records():
    rng = np.random.default_rng(4)
    state = {"a.weight": rng.normal(size=(32, 32)).astype(np.float32)}
    tensors, report = qp.apply_profile(state, {"a.weight": "int8_tensorwise"})
    assert tensors["a.weight"].dtype == np.int8
    back = q.dequantize_records("a.weight", tensors, out_shape=(32, 32))
    corr = np.corrcoef(back.reshape(-1), state["a.weight"].reshape(-1))[0, 1]
    assert corr > 0.99
