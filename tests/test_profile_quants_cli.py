"""profile_quants CLI: real DiT forwards drive the dynamic profile."""

import json

import jax
import numpy as np
import pytest

from aozora_sdxl_training_tpu.ckpt.safetensors_io import load_all, write_streaming
from aozora_sdxl_training_tpu.models.anima import dit as dit_mod
from aozora_sdxl_training_tpu.tools import profile_quants


@pytest.fixture(scope="module")
def tiny_dit_checkpoint(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("profq")
    params = dit_mod.init_params(dit_mod.TINY_ANIMA, jax.random.PRNGKey(0))
    torch_state = {f"dit.{k}": np.asarray(v) for k, v in
                   dit_mod.params_to_torch_state(params).items()}
    path = tmp / "dit.safetensors"
    write_streaming(path, torch_state)
    return tmp, path


def test_fast_dynamic_cli(tiny_dit_checkpoint, capsys):
    tmp, ckpt = tiny_dit_checkpoint
    out = tmp / "dit_mixed.safetensors"
    profile_quants.main([str(ckpt), str(out), "--mode", "fast_dynamic",
                         "--format", "int8", "--preset", "broad"])
    report = json.loads(capsys.readouterr().out)
    assert report["quantized"] > 0
    tensors = load_all(out)
    # prefix preserved and comfy_quant records present
    assert any(k.startswith("dit.") and k.endswith(".comfy_quant")
               for k in tensors)


def test_dynamic_mode_runs_real_forwards(tiny_dit_checkpoint, capsys):
    tmp, ckpt = tiny_dit_checkpoint
    out = tmp / "dit_dyn.safetensors"
    profile_quants.main([str(ckpt), str(out), "--mode", "dynamic",
                         "--format", "ternary", "--preset", "target",
                         "--max-layers", "3", "--latent-hw", "8",
                         "--promote-threshold", "0.2"])
    report = json.loads(capsys.readouterr().out)
    assert sum(report["assignment_counts"].values()) == 3
    assert out.exists()


def test_cache_dir_calibration(tiny_dit_checkpoint, tmp_path, capsys):
    """--cache-dir loads real cached latent/text payloads as the
    comparator batch (reference convert_anima_to_quants.py:1073-1110)."""
    from aozora_sdxl_training_tpu.data import cache_store as cs

    tmp_ckpt_dir, ckpt = tiny_dit_checkpoint
    cfg = dit_mod.TINY_ANIMA
    cache = tmp_path / ".cache"
    cache.mkdir()
    rng = np.random.default_rng(0)
    files = []
    for i in range(3):
        stem = f"img_{i}"
        lat_path = cs.lat_path_for(cache, stem)
        te_path = cs.te_path_for(cache, stem)
        cs.save_payload(lat_path, {
            "latents": rng.normal(size=(8, 8, cfg.in_channels)
                                  ).astype(np.float32)}, {"cache_options": {}})
        cs.save_payload(te_path, {
            "prompt_emb": rng.normal(size=(16, cfg.adapter_source_dim)
                                     ).astype(np.float32),
            "t5xxl_ids": rng.integers(1, 100, 7).astype(np.int32),
        }, {"cache_options": {}, "caption": f"test {i}"})
        files.append({"lat_path": str(lat_path), "te_path": str(te_path),
                      "target_size": [64, 64], "original_size": [64, 64],
                      "relative_path": f"{stem}.png"})
    cs.save_index(cache, {"files": files})

    batch = profile_quants.load_calibration_batch(cache, max_samples=2)
    assert batch is not None
    assert batch["latents"].shape == (2, 8, 8, cfg.in_channels)
    assert batch["prompt_emb"].shape == (2, 16, cfg.adapter_source_dim)
    assert batch["t5xxl_ids"].shape == (2, 512)

    out = tmp_path / "dyn_calib.safetensors"
    profile_quants.main([str(ckpt), str(out), "--mode", "dynamic",
                         "--format", "ternary", "--preset", "target",
                         "--max-layers", "2", "--promote-threshold", "0.2",
                         "--cache-dir", str(cache), "--calib-samples", "2"])
    printed = capsys.readouterr().out
    assert "calibration batch from cache" in printed
    assert out.exists()

    # missing cache dir falls back to synthetic with a warning, not a crash
    assert profile_quants.load_calibration_batch(tmp_path / "nope") is None
