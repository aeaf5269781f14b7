"""GGUF block quantization + container round-trips."""

import numpy as np
import pytest

from aozora_sdxl_training_tpu.ckpt.safetensors_io import write_streaming
from aozora_sdxl_training_tpu.tools import gguf_export as g


def _x(n=256, seed=0):
    return np.random.default_rng(seed).normal(size=n).astype(np.float32)


def test_q8_0_roundtrip():
    x = _x()
    back = g.dequantize_q8_0(g.quantize_q8_0(x), x.size)
    # <1% worst-case error relative to per-block absmax
    blocks = x.reshape(-1, 32)
    err = np.abs(back.reshape(-1, 32) - blocks).max(axis=1)
    assert np.all(err <= np.abs(blocks).max(axis=1) / 127.0 * 1.01)


def test_q4_0_roundtrip():
    x = _x()
    back = g.dequantize_q4_0(g.quantize_q4_0(x), x.size)
    corr = np.corrcoef(back, x)[0, 1]
    assert corr > 0.95


def test_q5_0_roundtrip():
    x = _x()
    back = g.dequantize_q5_0(g.quantize_q5_0(x), x.size)
    corr = np.corrcoef(back, x)[0, 1]
    assert corr > 0.985
    # q5 strictly better than q4
    back4 = g.dequantize_q4_0(g.quantize_q4_0(x), x.size)
    assert np.abs(back - x).mean() < np.abs(back4 - x).mean()


def test_block_size_validation():
    with pytest.raises(ValueError, match="divisible"):
        g.quantize_q8_0(np.ones(33, np.float32))


def test_gguf_container_roundtrip(tmp_path):
    rng = np.random.default_rng(1)
    path = tmp_path / "model.gguf"
    w1 = rng.normal(size=(8, 64)).astype(np.float32)
    w2 = rng.normal(size=(4, 32)).astype(np.float32)
    g.write_gguf(path, {
        "blk.0.attn.weight": (w1, "q8_0"),
        "blk.0.norm.weight": (w2, "f32"),
        "blk.1.ffn.weight": (w1, "q4_0"),
    }, metadata={"general.name": "test", "aozora.steps": 5})
    tensors, meta = g.read_gguf(path)
    assert meta["general.name"] == "test"
    assert meta["aozora.steps"] == 5
    assert meta["general.architecture"] == "aozora"
    np.testing.assert_array_equal(tensors["blk.0.norm.weight"], w2)
    assert tensors["blk.0.attn.weight"].shape == (8, 64)
    corr = np.corrcoef(tensors["blk.0.attn.weight"].reshape(-1),
                       w1.reshape(-1))[0, 1]
    assert corr > 0.999


def test_export_checkpoint(tmp_path, capsys):
    rng = np.random.default_rng(2)
    src = tmp_path / "model.safetensors"
    write_streaming(src, {
        "blocks.0.w.weight": rng.normal(size=(16, 64)).astype(np.float32),
        "norm.weight": np.ones(33, np.float32),  # not /32 -> kept f16
    })
    out = tmp_path / "model.gguf"
    report = g.export_checkpoint(src, out, quant="q5_0")
    assert report["quantized"] == 1
    tensors, meta = g.read_gguf(out)
    assert meta["aozora.quant"] == "q5_0"
    assert tensors["blocks.0.w.weight"].shape == (16, 64)
    assert tensors["norm.weight"].shape == (33,)
