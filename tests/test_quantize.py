"""Quantized-export formats: round-trip accuracy + layout/packing checks."""

import json

import numpy as np
import pytest

from aozora_sdxl_training_tpu.tools import quantize as q


def test_e2m1_codes_roundtrip_exact_values():
    # every representable e2m1 value must round-trip exactly
    vals = q.E2M1_VALUES.copy()
    codes = q.f32_to_e2m1_codes(vals)
    back = q.e2m1_to_f32(codes)
    np.testing.assert_array_equal(back, vals)


def test_e2m1_rounding_nearest():
    x = np.array([0.2, 0.3, 0.8, 1.2, 2.4, 2.6, 5.0, 7.0, -0.7, -3.4],
                 np.float32)
    got = q.e2m1_to_f32(q.f32_to_e2m1_codes(x))
    # nearest representable (saturating at +-6)
    expect = np.array([0.0, 0.5, 1.0, 1.0, 2.0, 3.0, 4.0, 6.0, -0.5, -3.0],
                      np.float32)
    # 1.2 -> nearest of {1.0, 1.5} = 1.0; 2.4 -> {2,3} = 2; 5.0 tie {4,6}->4 (even)
    np.testing.assert_array_equal(got, expect)


def test_pack_unpack_uint4():
    nib = np.array([[1, 2, 3, 4], [15, 0, 7, 8]], np.uint8)
    packed = q.pack_uint4(nib)
    assert packed.shape == (2, 2)
    np.testing.assert_array_equal(q.unpack_uint4(packed), nib)


def test_to_from_blocked_roundtrip():
    m = np.arange(130 * 6, dtype=np.float32).reshape(130, 6)
    blocked = q.to_blocked(m)
    back = q.from_blocked(blocked, 130, 6)
    np.testing.assert_array_equal(back, m)


def test_scaled_fp8_roundtrip():
    rng = np.random.default_rng(0)
    w = rng.normal(size=(64, 64)).astype(np.float32)
    codes, scale = q.quantize_scaled_fp8(w)
    back = q.dequantize_scaled_fp8(codes, scale)
    rel = np.abs(back - w) / (np.abs(w) + 1e-3)
    assert np.median(rel) < 0.08  # e4m3 ~2-3 significant bits


def test_int8_rowwise_roundtrip():
    rng = np.random.default_rng(1)
    w = rng.normal(size=(32, 128)).astype(np.float32) * np.linspace(
        0.1, 10, 32)[:, None].astype(np.float32)
    codes, scale = q.quantize_int8_tensorwise(w)
    assert scale.shape == (32, 1)
    back = q.dequantize_int8_tensorwise(codes, scale)
    # int8 per-row: <1% relative error on well-scaled rows
    rel = np.abs(back - w).max() / np.abs(w).max()
    assert rel < 0.01


def test_nvfp4_roundtrip():
    rng = np.random.default_rng(2)
    w = rng.normal(size=(64, 64)).astype(np.float32)
    codes, block_scale, per_tensor = q.quantize_nvfp4(w)
    assert codes.shape == (64, 32)
    assert codes.dtype == np.uint8
    back = q.dequantize_nvfp4(codes, block_scale, per_tensor, 64, 64)
    corr = np.corrcoef(back.reshape(-1), w.reshape(-1))[0, 1]
    assert corr > 0.97  # 4-bit with block scales tracks closely


def test_nvfp4_requires_block_multiple():
    with pytest.raises(ValueError, match="multiple"):
        q.quantize_nvfp4(np.ones((8, 10), np.float32))


def test_ternary_roundtrip():
    rng = np.random.default_rng(3)
    w = rng.normal(size=(16, 33)).astype(np.float32)  # odd in_features -> pad
    packed, scale = q.quantize_ternary(w)
    assert packed.shape == (16, 9)
    back = q.dequantize_ternary(packed, scale, 16, 33)
    # signs should agree where |w| is large
    big = np.abs(w) > np.abs(w).mean(axis=1, keepdims=True)
    assert (np.sign(back[big]) == np.sign(w[big])).mean() > 0.95


def test_quant_records_and_dequant():
    rng = np.random.default_rng(4)
    w = rng.normal(size=(32, 32)).astype(np.float32)
    key = "blocks.0.mlp.layer1.weight"
    for fmt in ("float8_e4m3fn", "int8_tensorwise", "nvfp4", "ternary_1_58"):
        records = dict(q.quant_records_for_weight(key, w, fmt))
        assert "blocks.0.mlp.layer1.comfy_quant" in records
        info = json.loads(bytes(records["blocks.0.mlp.layer1.comfy_quant"]))
        assert info["format"] == fmt
        back = q.dequantize_records(key, records, out_shape=w.shape)
        assert back.shape == w.shape
        corr = np.corrcoef(back.reshape(-1), w.reshape(-1))[0, 1]
        assert corr > 0.85, fmt


def test_should_quantize_policy():
    big = np.ones((64, 128), np.float32)
    assert q.should_quantize("blocks.0.self_attn.q_proj.weight", big, "target")
    assert not q.should_quantize("t_embedding_norm.weight",
                                 np.ones(64, np.float32), "target")
    assert not q.should_quantize("blocks.0.adaln_modulation_mlp.1.weight",
                                 big, "target")  # protected (adaln)
    assert q.should_quantize("blocks.0.adaln_modulation_mlp.1.weight",
                             big, "all")  # "all" ignores protection hints
    assert not q.should_quantize("x.weight", np.ones((4, 4), np.float32),
                                 "broad")  # too small


def test_convert_state_dict():
    rng = np.random.default_rng(5)
    state = {
        "blocks.0.self_attn.q_proj.weight": rng.normal(size=(64, 128)).astype(np.float32),
        "t_embedding_norm.weight": np.ones(64, np.float32),
        "blocks.0.self_attn.q_proj.bias": np.zeros(64, np.float32),
    }
    out, report = q.convert_state_dict(state, "int8", preset="target")
    assert report["quantized"] == 1
    assert out["blocks.0.self_attn.q_proj.weight"].dtype == np.int8
    assert "blocks.0.self_attn.q_proj.weight_scale" in out
    assert out["t_embedding_norm.weight"].dtype == np.float32
    # exclude pattern wins
    out2, rep2 = q.convert_state_dict(state, "int8", preset="target",
                                      exclude_patterns=[r"q_proj"])
    assert rep2["quantized"] == 0


def test_bf16_checkpoints_are_quantizable():
    """The trainers save all-BF16 models; numpy reports ml_dtypes.bfloat16
    as kind 'V', which used to make every selection predicate reject the
    tensor — a silent no-op quantization of the standard output format."""
    import ml_dtypes

    from aozora_sdxl_training_tpu.ckpt.safetensors_io import is_float_dtype
    from aozora_sdxl_training_tpu.tools import quantize as q

    assert is_float_dtype(ml_dtypes.bfloat16)
    assert is_float_dtype(np.float16) and not is_float_dtype(np.int8)
    w = np.random.default_rng(0).normal(size=(64, 64))
    w16 = w.astype(ml_dtypes.bfloat16)
    assert q.should_quantize("blocks.0.mlp.layer1.weight", w16, "all", 16)
    assert q.format_compatible("int8_tensorwise", "blocks.0.mlp.layer1.weight", w16)
    state = {"blocks.0.mlp.layer1.weight": w16}
    out, report = q.convert_state_dict(state, "int8", preset="all",
                                       min_elements=16)
    assert report["quantized"] == 1, report
