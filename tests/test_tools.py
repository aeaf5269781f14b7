"""Post-training tools: diff checker, key repair, hashing, semantic maps,
quant convert CLI."""

import json

import numpy as np
import pytest
from PIL import Image

from aozora_sdxl_training_tpu.ckpt.safetensors_io import (
    load_all,
    read_header,
    write_streaming,
)
from aozora_sdxl_training_tpu.tools import (
    convert_quants,
    diff_checker,
    hash_checker,
    key_repair,
    semantic_maps,
)


@pytest.fixture()
def base_and_tuned(tmp_path):
    rng = np.random.default_rng(0)
    base = {
        "blocks.0.attn.weight": rng.normal(size=(96, 96)).astype(np.float32),
        "blocks.1.attn.weight": rng.normal(size=(96, 96)).astype(np.float32),
        "norm.weight": np.ones(96, np.float32),
    }
    # full fine-tune delta: dense noise; lora-merge delta: rank-2 update
    dense = {k: (v + rng.normal(size=v.shape).astype(np.float32) * 0.05
                 if v.ndim == 2 else v)
             for k, v in base.items()}
    u = rng.normal(size=(96, 2)).astype(np.float32)
    vt = rng.normal(size=(2, 96)).astype(np.float32)
    lora = {k: (v + (u @ vt) * 0.05 if v.ndim == 2 else v)
            for k, v in base.items()}
    paths = {}
    for name, tensors in (("base", base), ("dense", dense), ("lora", lora)):
        p = tmp_path / f"{name}.safetensors"
        write_streaming(p, tensors)
        paths[name] = p
    return paths


def test_diff_checker_dense_vs_lora(base_and_tuned):
    dense_report = diff_checker.diff_checkpoints(
        base_and_tuned["base"], base_and_tuned["dense"], svd_min_dim=32)
    lora_report = diff_checker.diff_checkpoints(
        base_and_tuned["base"], base_and_tuned["lora"], svd_min_dim=32)
    assert len(dense_report.tensors) == 3
    dense_verdict = dense_report.merge_artifact_verdict()
    lora_verdict = lora_report.merge_artifact_verdict()
    assert not dense_verdict["is_lora_merge"]
    assert lora_verdict["is_lora_merge"]
    # rank ratios actually separate
    lr = [t.rank_ratio for t in lora_report.tensors if t.rank_ratio]
    dr = [t.rank_ratio for t in dense_report.tensors if t.rank_ratio]
    assert max(lr) < min(dr)


def test_diff_checker_identical_and_csv(base_and_tuned, tmp_path):
    report = diff_checker.diff_checkpoints(base_and_tuned["base"],
                                           base_and_tuned["base"])
    assert report.identical_ratio == 1.0
    csv_path = tmp_path / "diff.csv"
    diff_checker.export_csv(report, csv_path)
    assert csv_path.read_text().count("\n") == 4  # header + 3 rows


def test_key_repair_roundtrip(tmp_path):
    state = {f"pipe.dit.blocks.{i}.w": np.ones((4,), np.float32)
             for i in range(5)}
    src = tmp_path / "in.safetensors"
    write_streaming(src, state)
    assert key_repair.detect_prefix(src) == "pipe.dit."
    out = tmp_path / "out.safetensors"
    info = key_repair.repair_keys(src, out, target_prefix="model.diffusion_model")
    assert info["detected_prefix"] == "pipe.dit."
    keys = list(read_header(out))
    assert all(k.startswith("model.diffusion_model.blocks.") for k in keys)


def test_hashes(tmp_path):
    p = tmp_path / "model.bin"
    p.write_bytes(b"\x01" * 0x120000)
    sha = hash_checker.sha256_file(p)
    assert len(sha) == 64 and sha == sha.upper()
    assert hash_checker.autov2(sha) == sha[:10]
    legacy = hash_checker.model_hash_legacy(p)
    assert len(legacy) == 8
    # legacy hash only covers 0x100000..0x110000
    import hashlib
    expect = hashlib.sha256(b"\x01" * 0x10000).hexdigest()[:8].upper()
    assert legacy == expect


def test_semantic_detail_map():
    # line art on the left half vs flat right half
    img = np.full((64, 64, 3), 255, np.uint8)
    img[::4, :32] = 0   # horizontal lines
    img[:, :32:4] = 0   # vertical lines
    detail = semantic_maps.generate_illustration_detail_map(
        Image.fromarray(img))
    assert detail.shape == (64, 64)
    assert detail[:, :30].mean() > detail[:, 40:].mean()
    mask = semantic_maps.generate_lineart_loss_map(Image.fromarray(img), 8, 8)
    assert mask.shape == (1, 32, 32)
    weights = semantic_maps.loss_weight_mask_for_latents(
        Image.fromarray(img), 8, 8)
    assert weights.shape == (8, 8)
    assert weights.min() >= 1.0


def test_convert_quants_cli(tmp_path, capsys):
    rng = np.random.default_rng(1)
    state = {
        "blocks.0.mlp.layer1.weight": rng.normal(size=(64, 64)).astype(np.float32),
        "t_embedding_norm.weight": np.ones(64, np.float32),
    }
    src = tmp_path / "model.safetensors"
    write_streaming(src, state)
    out = tmp_path / "model_int8.safetensors"
    convert_quants.main([str(src), str(out), "--format", "int8",
                         "--preset", "target", "--min-elements", "16"])
    result = load_all(out)
    assert result["blocks.0.mlp.layer1.weight"].dtype == np.int8
    assert "blocks.0.mlp.layer1.weight_scale" in result
    assert "blocks.0.mlp.layer1.comfy_quant" in result
    report = json.loads(capsys.readouterr().out)
    assert report["quantized"] == 1
