"""End-to-end slice: cache -> train -> checkpoint -> resume on a tiny model.

Mirrors BASELINE config #2 (smallest demonstrable product) at toy scale:
a synthetic SD-format checkpoint + pre-built latent/text cache, 4 micro-steps
with grad accumulation 2, scheduled checkpoint save, then a resume run.
"""

import json
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from aozora_sdxl_training_tpu.ckpt.safetensors_io import (
    load_all,
    read_header,
    write_streaming,
)
from aozora_sdxl_training_tpu.config.runtime import RuntimeConfig
from aozora_sdxl_training_tpu.data import cache_store as cs
from aozora_sdxl_training_tpu.models.sdxl import arch
from aozora_sdxl_training_tpu.models.sdxl.conversion import sd_state_from_params
from aozora_sdxl_training_tpu.models.sdxl.unet import init_params
from aozora_sdxl_training_tpu.train.trainer import run_sdxl_training

TINY = arch.TINY
LAT = 8          # latent H=W
SEQ = 10         # text sequence length


def _build_checkpoint(path: Path):
    params = init_params(TINY, jax.random.PRNGKey(7))
    sd_state = sd_state_from_params(params, TINY, dtype=jnp.float32)
    tensors = {k: np.asarray(v) for k, v in sd_state.items()}
    # a non-UNet passthrough tensor (e.g. VAE-ish) to exercise merge-back
    tensors["first_stage_model.dummy"] = np.ones((3,), np.float32)
    write_streaming(path, tensors)
    return params


def _build_cache(root: Path, cache_dir_name: str, n_items: int = 4):
    rng = np.random.default_rng(0)
    cache_dir = root / cache_dir_name
    cache_dir.mkdir(parents=True)
    files = []
    options = {"cache_schema_version": 1}
    for i in range(n_items):
        stem = f"img{i}"
        te_path = cs.te_path_for(cache_dir, stem)
        lat_path = cs.lat_path_for(cache_dir, stem)
        cs.save_payload(te_path, {
            "embeds": jnp.asarray(rng.normal(size=(SEQ, TINY.cross_attention_dim)),
                                  jnp.float32),
            "pooled": jnp.asarray(rng.normal(size=(TINY.pooled_projection_dim,)),
                                  jnp.float32),
        }, {"cache_options": options})
        cs.save_payload(lat_path, {
            "latents": jnp.asarray(rng.normal(size=(LAT, LAT, 4)) * 0.2,
                                   jnp.float32),
        }, {"cache_options": options})
        files.append({
            "te_path": str(te_path),
            "lat_path": str(lat_path),
            "relative_path": f"img{i}.png",
            "original_size": [640, 640],
            "scaled_size": [640, 640],
            "target_size": [LAT * 8, LAT * 8],
            "crop_coords": [0, 0],
            "bucket_variant_index": 0,
        })
    cs.save_index(cache_dir, {"version": 13, "cache_options": options,
                              "files": files})


def _make_config(tmp_path: Path, **overrides):
    base = {
        "SINGLE_FILE_CHECKPOINT_PATH": str(tmp_path / "base.safetensors"),
        "OUTPUT_DIR": str(tmp_path / "out"),
        "OUTPUT_NAME": "e2e_run",
        "INSTANCE_DATASETS": [{"path": str(tmp_path / "data"), "repeats": 1}],
        "MAX_TRAIN_STEPS": 4,
        "BATCH_SIZE": 1,
        "GRADIENT_ACCUMULATION_STEPS": 2,
        "SAVE_EVERY_N_STEPS": 1,
        "PREDICTION_TYPE": "v_prediction",
        "SEED": 11,
        "UNET_EXCLUDE_TARGETS": "conv1, conv2",
        "MIXED_PRECISION": "bfloat16",
        "CLIP_GRAD_NORM": 1.0,
        "OPTIMIZER_TYPE": "raven",
    }
    base.update(overrides)
    return RuntimeConfig(base, validate_resume_paths=False)


@pytest.fixture(scope="module")
def e2e_run(tmp_path_factory):
    from unittest import mock
    tmp_path = tmp_path_factory.mktemp("e2e")
    ckpt = tmp_path / "base.safetensors"
    base_params = _build_checkpoint(ckpt)
    data_root = tmp_path / "data"
    data_root.mkdir()
    config = _make_config(tmp_path)
    _build_cache(data_root, cs.sdxl_cache_dir_name(False))
    # cache is synthetic (no source images) — skip the rebuild check
    with mock.patch(
            "aozora_sdxl_training_tpu.train.trainer.check_if_caching_needed",
            return_value=False):
        run_sdxl_training(config, unet_cfg=TINY)
    return tmp_path, config, base_params


def test_training_produces_outputs(e2e_run):
    tmp_path, config, _ = e2e_run
    out = tmp_path / "out"
    assert (out / "e2e_run.safetensors").exists()
    assert (out / "e2e_run_step_2.safetensors").exists()
    assert (out / "e2e_run_training_state_step_2.safetensors").exists()


def test_merged_checkpoint_format(e2e_run):
    tmp_path, config, base_params = e2e_run
    final = tmp_path / "out" / "e2e_run.safetensors"
    header = read_header(final)
    # passthrough tensor survives, cast to bf16 (it's float)
    assert "first_stage_model.dummy" in header
    assert header["first_stage_model.dummy"]["dtype"] == "BF16"
    # all UNet keys present in SD naming
    unet_keys = [k for k in header if k.startswith("model.diffusion_model.")]
    assert len(unet_keys) == len(arch.hf_param_names(TINY))
    tensors = load_all(final)
    # frozen conv1/conv2 weights unchanged (mod bf16 cast); trainable changed
    sd_base = sd_state_from_params(base_params, TINY, dtype=jnp.bfloat16)
    changed = unchanged = 0
    for hf_key in arch.hf_param_names(TINY):
        from aozora_sdxl_training_tpu.ckpt.sd_keys import hf_to_sd_name
        sd_key = hf_to_sd_name(hf_key)
        a = np.asarray(tensors[sd_key], dtype=np.float32)
        b = np.asarray(sd_base[sd_key], dtype=np.float32)
        frozen = ("conv1" in hf_key) or ("conv2" in hf_key)
        if frozen:
            np.testing.assert_array_equal(a, b, err_msg=hf_key)
            unchanged += 1
        else:
            if not np.array_equal(a, b):
                changed += 1
    assert unchanged > 0
    assert changed > len(arch.hf_param_names(TINY)) * 0.5


def test_resume_continues(e2e_run, capsys):
    tmp_path, config, _ = e2e_run
    out = tmp_path / "out"
    resume_config = _make_config(
        tmp_path,
        OUTPUT_NAME="e2e_resume",
        RESUME_TRAINING=True,
        RESUME_MODEL_PATH=str(out / "e2e_run_step_2.safetensors"),
        RESUME_STATE_PATH=str(out / "e2e_run_training_state_step_2.safetensors"),
        MAX_TRAIN_STEPS=6,
    )
    from unittest import mock
    with mock.patch(
            "aozora_sdxl_training_tpu.train.trainer.check_if_caching_needed",
            return_value=False):
        run_sdxl_training(resume_config, unet_cfg=TINY)
    captured = capsys.readouterr().out
    assert "RESUMING TRAINING SESSION" in captured
    assert "Restored optimizer state" in captured
    assert (out / "e2e_resume.safetensors").exists()


def test_two_pass_rung_trains_e2e(tmp_path, monkeypatch, capsys):
    """The two-pass low-memory rung (norm pass + recompute-update pass,
    selected on the real chip for full-SDXL single-chip training) drives
    the actual trainer loop: same CLI surface, GA=1, checkpoint saved."""
    from unittest import mock
    monkeypatch.setenv("AOZORA_LOWMEM_RUNG", "two_pass")
    # the rung is single-chip-only: pin to one device or the planner sees
    # the 8-device test mesh (dp=8) and correctly refuses the rung
    monkeypatch.setenv("AOZORA_DEVICES", "1")
    ckpt = tmp_path / "base.safetensors"
    _build_checkpoint(ckpt)
    data_root = tmp_path / "data"
    data_root.mkdir()
    _build_cache(data_root, cs.sdxl_cache_dir_name(False))
    config = _make_config(tmp_path, OUTPUT_NAME="e2e_two_pass",
                          GRADIENT_ACCUMULATION_STEPS=1, MAX_TRAIN_STEPS=2,
                          SAVE_EVERY_N_STEPS=2)
    with mock.patch(
            "aozora_sdxl_training_tpu.train.trainer.check_if_caching_needed",
            return_value=False):
        run_sdxl_training(config, unet_cfg=TINY)
    out = capsys.readouterr().out
    assert "two-pass step" in out           # the plan actually chose it
    assert "Optimizer Step: 2" in out
    assert (tmp_path / "out" / "e2e_two_pass.safetensors").exists()


def test_dp8_batchsize1_matches_single_device_numerics(tmp_path, monkeypatch):
    """VERDICT r1 #3: per-chip batch semantics — BATCH_SIZE=1 on a dp=8 mesh
    (global batch 8, ragged batches padded + loss-masked) must produce the
    same trained weights as a single-device run at BATCH_SIZE=8."""
    from unittest import mock

    def run(subdir, batch_size, devices_env):
        root = tmp_path / subdir
        root.mkdir()
        ckpt = root / "base.safetensors"
        _build_checkpoint(ckpt)
        data_root = root / "data"
        data_root.mkdir()
        _build_cache(data_root, cs.sdxl_cache_dir_name(False))
        config = _make_config(root, BATCH_SIZE=batch_size,
                              MAX_TRAIN_STEPS=3,
                              GRADIENT_ACCUMULATION_STEPS=1,
                              SAVE_EVERY_N_STEPS=0,
                              MIXED_PRECISION="bfloat16")
        if devices_env:
            monkeypatch.setenv("AOZORA_DEVICES", devices_env)
        else:
            monkeypatch.delenv("AOZORA_DEVICES", raising=False)
        with mock.patch(
                "aozora_sdxl_training_tpu.train.trainer.check_if_caching_needed",
                return_value=False):
            run_sdxl_training(config, unet_cfg=TINY)
        return load_all(root / "out" / "e2e_run.safetensors")

    dp8 = run("dp8", batch_size=1, devices_env=None)     # 8 virtual devices
    single = run("one", batch_size=8, devices_env="1")   # same global batch
    assert dp8.keys() == single.keys()
    diffs = []
    for key, a in dp8.items():
        b = single[key]
        a32 = np.asarray(a, dtype=np.float32)
        b32 = np.asarray(b, dtype=np.float32)
        scale = np.maximum(np.abs(b32), 1e-3)
        diffs.append(float((np.abs(a32 - b32) / scale).max()))
    # bf16 compute + cross-mesh reduction order: small float noise only;
    # a batching/padding/noise-keying bug would diverge by O(1)
    assert max(diffs) < 0.05, f"max rel diff {max(diffs):.4f}"
