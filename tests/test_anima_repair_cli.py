"""End-to-end QAT repair: quantize a tiny DiT, repair-train it, reload packed."""

import json

import jax
import numpy as np
import pytest

from aozora_sdxl_training_tpu.ckpt.safetensors_io import load_all, write_streaming
from aozora_sdxl_training_tpu.data import cache_store as cs
from aozora_sdxl_training_tpu.models.anima import dit as dit_mod
from aozora_sdxl_training_tpu.tools import quantize as q
from aozora_sdxl_training_tpu.train.qat_repair import ProjectedQuantController


def test_repair_cli_end_to_end(tmp_path, monkeypatch):
    import jax.numpy as jnp
    from unittest import mock
    cfg = dit_mod.TINY_ANIMA

    # quantized tiny DiT checkpoint (int8 on the mlp weights)
    params = dit_mod.init_params(cfg, jax.random.PRNGKey(0))
    torch_state = {k: np.asarray(v) for k, v in
                   dit_mod.params_to_torch_state(params).items()}
    tensors = {}
    n_quant = 0
    for key, arr in torch_state.items():
        if key.endswith("mlp.layer1.weight"):
            for name, rec in q.quant_records_for_weight(key, arr,
                                                        "int8_tensorwise"):
                tensors[name] = rec
            n_quant += 1
        else:
            tensors[key] = arr
    ckpt = tmp_path / "dit_quant.safetensors"
    write_streaming(ckpt, {f"dit.{k}": v for k, v in tensors.items()})

    # synthetic cache
    data = tmp_path / "data"
    cache_dir = data / ".precomputed_anima_dit_cache"
    cache_dir.mkdir(parents=True)
    rng = np.random.default_rng(1)
    files = []
    for i in range(2):
        te = cs.te_path_for(cache_dir, f"i{i}")
        lat = cs.lat_path_for(cache_dir, f"i{i}")
        cs.save_payload(te, {
            "prompt_emb": jnp.asarray(rng.normal(size=(8, cfg.adapter_source_dim)),
                                      jnp.float32),
            "t5xxl_ids": jnp.asarray(rng.integers(1, cfg.adapter_vocab, 8),
                                     jnp.int32)}, {})
        cs.save_payload(lat, {
            "latents": jnp.asarray(rng.normal(size=(6, 6, cfg.in_channels)) * 0.3,
                                   jnp.float32)}, {})
        files.append({"te_path": str(te), "lat_path": str(lat),
                      "relative_path": f"i{i}.png", "original_size": [48, 48],
                      "scaled_size": [48, 48], "target_size": [48, 48],
                      "crop_coords": [0, 0], "bucket_variant_index": 0})
    cs.save_index(cache_dir, {"version": 6, "cache_options": {}, "files": files})

    preset = {
        "active_mode": "anima",
        "anima": {
            "anima_dit_model_path": str(ckpt),
            "anima_output_dir": str(tmp_path / "out"),
            "anima_output_name": "repair",
            "anima_instance_datasets": [{"path": str(data), "repeats": 1}],
            "anima_max_train_steps": 2,
            "anima_batch_size": 1,
            "anima_gradient_accumulation_steps": 1,
            "anima_save_every_n_steps": 0,
            "anima_seed": 3,
        },
    }
    preset_path = tmp_path / "preset.json"
    preset_path.write_text(json.dumps(preset))

    from aozora_sdxl_training_tpu.cli import train_anima_repair
    with mock.patch(
            "aozora_sdxl_training_tpu.train.anima_trainer."
            "check_if_anima_caching_needed", return_value=False):
        train_anima_repair.main(["--config", str(preset_path)])

    out = tmp_path / "out" / "repaired_quantized.safetensors"
    assert out.exists()
    packed = load_all(out)
    # still packed int8 with comfy_quant records, under the original prefix
    quant_keys = [k for k in packed if k.endswith(".comfy_quant")]
    assert len(quant_keys) == n_quant
    assert all(k.startswith("dit.") for k in quant_keys)
    wkey = quant_keys[0][: -len(".comfy_quant")] + ".weight"
    assert packed[wkey].dtype == np.int8
    # reload roundtrip through the controller
    from aozora_sdxl_training_tpu.ckpt.anima_checkpoint import strip_prefix, DIT_PREFIXES
    stripped, prefix = strip_prefix(packed, DIT_PREFIXES)
    assert prefix == "dit."
    ctl = ProjectedQuantController(stripped)
    assert len(ctl.controlled_keys) == n_quant
    ctl.dequantized_params()  # expands without error


def test_repair_bf16_control_arm(tmp_path, capsys):
    """repair_target_format=bf16: identical objective, no projection —
    the reference's full-precision control (train_anima_repair.py:1647)."""
    import jax.numpy as jnp
    from unittest import mock
    cfg = dit_mod.TINY_ANIMA

    params = dit_mod.init_params(cfg, jax.random.PRNGKey(1))
    torch_state = {k: np.asarray(v) for k, v in
                   dit_mod.params_to_torch_state(params).items()}
    ckpt = tmp_path / "dit_base.safetensors"
    write_streaming(ckpt, {f"dit.{k}": v for k, v in torch_state.items()})

    data = tmp_path / "data"
    cache_dir = data / ".precomputed_anima_dit_cache"
    cache_dir.mkdir(parents=True)
    rng = np.random.default_rng(2)
    files = []
    for i in range(2):
        te = cs.te_path_for(cache_dir, f"i{i}")
        lat = cs.lat_path_for(cache_dir, f"i{i}")
        cs.save_payload(te, {
            "prompt_emb": jnp.asarray(rng.normal(size=(8, cfg.adapter_source_dim)),
                                      jnp.float32),
            "t5xxl_ids": jnp.asarray(rng.integers(1, cfg.adapter_vocab, 8),
                                     jnp.int32)}, {})
        cs.save_payload(lat, {
            "latents": jnp.asarray(rng.normal(size=(6, 6, cfg.in_channels)) * 0.3,
                                   jnp.float32)}, {})
        files.append({"te_path": str(te), "lat_path": str(lat),
                      "relative_path": f"i{i}.png", "original_size": [48, 48],
                      "scaled_size": [48, 48], "target_size": [48, 48],
                      "crop_coords": [0, 0], "bucket_variant_index": 0})
    cs.save_index(cache_dir, {"version": 6, "cache_options": {}, "files": files})

    preset = {
        "active_mode": "anima",
        "anima": {
            "anima_dit_model_path": str(ckpt),
            "anima_output_dir": str(tmp_path / "out"),
            "anima_output_name": "control",
            "anima_instance_datasets": [{"path": str(data), "repeats": 1}],
            "anima_max_train_steps": 2,
            "anima_batch_size": 1,
            "anima_gradient_accumulation_steps": 1,
            "anima_save_every_n_steps": 0,
            "anima_seed": 5,
            "anima_repair_target_format": "bf16",
        },
    }
    preset_path = tmp_path / "preset.json"
    preset_path.write_text(json.dumps(preset))

    from aozora_sdxl_training_tpu.cli import train_anima_repair
    with mock.patch(
            "aozora_sdxl_training_tpu.train.anima_trainer."
            "check_if_anima_caching_needed", return_value=False):
        train_anima_repair.main(["--config", str(preset_path)])
    captured = capsys.readouterr().out
    assert "BF16 repair-control training enabled" in captured

    out = tmp_path / "out" / "control.safetensors"
    assert out.exists()
    saved = load_all(out)
    assert not any(k.endswith(".comfy_quant") for k in saved)  # not packed
    assert (tmp_path / "out" / "repaired_quantized.safetensors").exists() is False
