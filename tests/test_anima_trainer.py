"""Anima objectives + end-to-end tiny Anima training run."""

from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from aozora_sdxl_training_tpu.ckpt.anima_checkpoint import (
    load_dit_state,
    save_dit_model,
    strip_prefix,
)
from aozora_sdxl_training_tpu.ckpt.safetensors_io import read_header, write_streaming
from aozora_sdxl_training_tpu.config.runtime import RuntimeConfig
from aozora_sdxl_training_tpu.data import cache_store as cs
from aozora_sdxl_training_tpu.models.anima import dit as dit_mod
from aozora_sdxl_training_tpu.train import anima_objectives as obj
from aozora_sdxl_training_tpu.train.anima_trainer import run_anima_training


def test_sigma_table_matches_reference_mapping():
    table = obj.anima_sigma_table()
    # sigmas = linspace(1, 0, 1001)[:-1]; sigma(ticket) = sigmas[999 - ticket]
    ref = np.linspace(1.0, 0.0, 1001, dtype=np.float32)[:-1]
    np.testing.assert_allclose(table[0], ref[999])
    np.testing.assert_allclose(table[999], ref[0])
    assert np.all(np.diff(table) > 0)  # tickets ascend with sigma
    sig, ts = obj.ticket_to_sigma_timestep(jnp.asarray([0, 500, 999]))
    np.testing.assert_allclose(np.asarray(ts), np.asarray(sig) * 1000.0, rtol=1e-6)


def test_flowmatch_noise_and_target():
    lat = jnp.full((2, 2, 2, 4), 0.5)
    noise = jnp.full((2, 2, 2, 4), 1.0)
    sig = jnp.asarray([0.25, 0.75])
    noisy, target = obj.flowmatch_noise_and_target(lat, noise, sig)
    np.testing.assert_allclose(np.asarray(noisy)[0, 0, 0, 0],
                               0.75 * 0.5 + 0.25 * 1.0, rtol=1e-6)
    np.testing.assert_allclose(np.asarray(target), 0.5, rtol=1e-6)


def test_t5_token_dropout_deterministic():
    class Cfg:
        T5_TOKEN_DROPOUT_ENABLED = True
        T5_TOKEN_DROPOUT_CHANCE = 1.0
        T5_TOKEN_DROPOUT_MIN = 0.5
        T5_TOKEN_DROPOUT_MAX = 0.5
        SEED = 7

    ids = np.arange(1, 21, dtype=np.int32)
    out1 = obj.apply_t5_token_dropout(ids, "caption", Cfg())
    out2 = obj.apply_t5_token_dropout(ids, "caption", Cfg())
    np.testing.assert_array_equal(out1, out2)
    assert (out1 == 0).sum() == 10  # 50% of 20 non-pad tokens dropped
    out3 = obj.apply_t5_token_dropout(ids, "other caption", Cfg())
    assert not np.array_equal(out1, out3)
    # disabled -> unchanged
    Cfg.T5_TOKEN_DROPOUT_ENABLED = False
    np.testing.assert_array_equal(obj.apply_t5_token_dropout(ids, "x", Cfg()), ids)


def test_strip_prefix_80_percent_rule():
    state = {f"pipe.dit.layer{i}": i for i in range(9)}
    state["other_key"] = 99
    stripped, prefix = strip_prefix(state, ("pipe.dit.",))
    assert prefix == "pipe.dit."
    assert "layer0" in stripped
    # below 80% -> untouched
    state2 = {f"pipe.dit.a{i}": i for i in range(3)}
    state2.update({f"x{i}": i for i in range(3)})
    same, prefix2 = strip_prefix(state2, ("pipe.dit.",))
    assert prefix2 == "" and "pipe.dit.a0" in same


def _build_anima_env(tmp, **config_overrides):
    """Tiny DiT checkpoint + synthetic cache + RuntimeConfig under ``tmp``."""
    cfg = dit_mod.TINY_ANIMA
    params = dit_mod.init_params(cfg, jax.random.PRNGKey(3))
    torch_state = {f"pipe.dit.{k}": np.asarray(v) for k, v in
                   dit_mod.params_to_torch_state(params).items()}
    ckpt = tmp / "tiny_dit.safetensors"
    write_streaming(ckpt, torch_state)

    # synthetic cache
    data = tmp / "data"
    cache_dir = data / ".precomputed_anima_dit_cache"
    cache_dir.mkdir(parents=True)
    rng = np.random.default_rng(0)
    files = []
    for i in range(3):
        te_path = cs.te_path_for(cache_dir, f"img{i}")
        lat_path = cs.lat_path_for(cache_dir, f"img{i}")
        cs.save_payload(te_path, {
            "prompt_emb": jnp.asarray(
                rng.normal(size=(12, cfg.adapter_source_dim)), jnp.float32),
            "t5xxl_ids": jnp.asarray(rng.integers(1, cfg.adapter_vocab, 12),
                                     jnp.int32),
        }, {"caption": f"cap {i}"})
        cs.save_payload(lat_path, {
            "latents": jnp.asarray(rng.normal(size=(8, 8, cfg.in_channels)) * 0.3,
                                   jnp.float32)}, {})
        files.append({"te_path": str(te_path), "lat_path": str(lat_path),
                      "relative_path": f"img{i}.png",
                      "original_size": [64, 64], "scaled_size": [64, 64],
                      "target_size": [64, 64], "crop_coords": [0, 0],
                      "bucket_variant_index": 0})
    cs.save_index(cache_dir, {"version": 6, "cache_options": {}, "files": files})

    raw = {
        "TRAINING_MODE": "Anima DiT",
        "DIT_PATH": str(ckpt),
        "OUTPUT_DIR": str(tmp / "out"),
        "OUTPUT_NAME": "anima_run",
        "INSTANCE_DATASETS": [{"path": str(data), "repeats": 1}],
        "MAX_TRAIN_STEPS": 2,
        "BATCH_SIZE": 1,
        "GRADIENT_ACCUMULATION_STEPS": 1,
        "SAVE_EVERY_N_STEPS": 0,
        "SEED": 5,
        "ANIMA_DIT_SAVE_PREFIX": "auto",
    }
    raw.update(config_overrides)
    return RuntimeConfig(raw, validate_resume_paths=False), params


@pytest.fixture(scope="module")
def anima_e2e(tmp_path_factory):
    from unittest import mock
    tmp = tmp_path_factory.mktemp("anima_e2e")
    config, params = _build_anima_env(tmp)
    with mock.patch(
            "aozora_sdxl_training_tpu.train.anima_trainer."
            "check_if_anima_caching_needed", return_value=False):
        run_anima_training(config)
    return tmp, config, params


def test_anima_two_pass_rung_trains_e2e(tmp_path, monkeypatch, capsys):
    """The two-pass low-memory rung drives the Anima trainer loop end to
    end (mirror of the SDXL test in test_end_to_end.py): the planner must
    pick it under AOZORA_LOWMEM_RUNG=two_pass and training must complete
    and save through the same CLI surface."""
    from unittest import mock
    monkeypatch.setenv("AOZORA_LOWMEM_RUNG", "two_pass")
    # the rung is single-chip-only: pin to one device or the planner sees
    # the 8-device test mesh (dp=8) and correctly refuses the rung
    monkeypatch.setenv("AOZORA_DEVICES", "1")
    config, _ = _build_anima_env(tmp_path)
    with mock.patch(
            "aozora_sdxl_training_tpu.train.anima_trainer."
            "check_if_anima_caching_needed", return_value=False):
        run_anima_training(config)
    out = capsys.readouterr().out
    assert "two-pass step" in out          # the plan actually chose it
    assert "Optimizer Step: 2" in out
    assert (tmp_path / "out" / "anima_run.safetensors").exists()


def test_anima_training_produces_model(anima_e2e):
    tmp, config, params = anima_e2e
    out = tmp / "out" / "anima_run.safetensors"
    assert out.exists()
    header = read_header(out)
    # auto prefix preserved from the source checkpoint
    assert all(k.startswith("pipe.dit.") for k in header)
    assert len(header) == len(params)


def test_anima_saved_model_reloads(anima_e2e):
    tmp, config, params = anima_e2e
    state, prefix = load_dit_state(tmp / "out" / "anima_run.safetensors")
    assert prefix == "pipe.dit."
    cfg = dit_mod.TINY_ANIMA
    reloaded = dit_mod.params_from_torch_state(state, cfg)
    assert set(reloaded) == set(params)
    # training changed the weights
    changed = sum(
        0 if np.allclose(np.asarray(reloaded[k], np.float32),
                         np.asarray(params[k], np.float32)) else 1
        for k in params)
    assert changed > len(params) * 0.5


def test_dit_config_detects_latent_channels():
    """Regression: in/out channels must come from the patchify/unpatchify
    shapes, not ANIMA_BASE — a DiT trained against a non-16-z VAE failed to
    load (caught by the Anima CLI verify drive)."""
    from dataclasses import replace

    from aozora_sdxl_training_tpu.train.anima_trainer import _dit_config_for_state

    cfg = replace(dit_mod.TINY_ANIMA, in_channels=4, out_channels=4,
                  adapter_source_dim=64)
    params = dit_mod.init_params(cfg, jax.random.PRNGKey(7))
    state = {k: np.asarray(v) for k, v in
             dit_mod.params_to_torch_state(params).items()}
    det = _dit_config_for_state(state)
    assert det.in_channels == 4
    assert det.out_channels == 4
    assert det.adapter_source_dim == 64
    # and the detected config round-trips the checkpoint
    reloaded = dit_mod.params_from_torch_state(state, det)
    assert set(reloaded) == set(params)


def test_anima_sp8_matches_single_device_numerics(tmp_path, monkeypatch,
                                                  capsys):
    """SEQUENCE_PARALLEL_SIZE=8 (tokens sharded over the sp mesh axis,
    ring flash attention) must reproduce the single-device run: same
    losses, same saved weights.  Exactness is the ring's contract — the
    merge through lse statistics is algebraically the full softmax."""
    from unittest import mock

    def run(subdir, devices_env, sp):
        root = tmp_path / subdir
        root.mkdir()
        if devices_env:
            monkeypatch.setenv("AOZORA_DEVICES", devices_env)
        else:
            monkeypatch.delenv("AOZORA_DEVICES", raising=False)
        config, _ = _build_anima_env(
            root, SEQUENCE_PARALLEL_SIZE=sp, MAX_TRAIN_STEPS=2,
            SAVE_EVERY_N_STEPS=0)
        with mock.patch(
                "aozora_sdxl_training_tpu.train.anima_trainer."
                "check_if_anima_caching_needed", return_value=False):
            run_anima_training(config)
        out = capsys.readouterr().out
        losses = [float(m) for m in
                  __import__("re").findall(r"Loss: ([\d.]+)", out)]
        state, _ = load_dit_state(root / "out" / "anima_run.safetensors")
        return losses, state

    losses_sp, state_sp = run("sp8", devices_env=None, sp=8)
    losses_1, state_1 = run("one", devices_env="1", sp=1)
    assert losses_sp and len(losses_sp) == len(losses_1)
    np.testing.assert_allclose(losses_sp, losses_1, rtol=2e-3)
    for k in state_1:
        np.testing.assert_allclose(
            np.asarray(state_sp[k], np.float32),
            np.asarray(state_1[k], np.float32),
            rtol=2e-2, atol=2e-3, err_msg=k)


def test_anima_pp2_matches_single_device_numerics(tmp_path, monkeypatch,
                                                  capsys):
    """PIPELINE_PARALLEL_SIZE=2 (blocks stage-stacked over the pp mesh
    axis, GPipe microbatch schedule) must reproduce the single-device
    run: same losses, same saved weights — and the saved checkpoint must
    carry the reference's flat block names (stacking is run-internal)."""
    from unittest import mock

    def run(subdir, devices_env, pp):
        root = tmp_path / subdir
        root.mkdir()
        if devices_env:
            monkeypatch.setenv("AOZORA_DEVICES", devices_env)
        else:
            monkeypatch.delenv("AOZORA_DEVICES", raising=False)
        config, _ = _build_anima_env(
            root, PIPELINE_PARALLEL_SIZE=pp, MAX_TRAIN_STEPS=2,
            SAVE_EVERY_N_STEPS=0)
        with mock.patch(
                "aozora_sdxl_training_tpu.train.anima_trainer."
                "check_if_anima_caching_needed", return_value=False):
            run_anima_training(config)
        out = capsys.readouterr().out
        losses = [float(m) for m in
                  __import__("re").findall(r"Loss: ([\d.]+)", out)]
        state, _ = load_dit_state(root / "out" / "anima_run.safetensors")
        return losses, state, out

    # 2 devices -> dp=1 x pp=2, so the global batch (= BATCH_SIZE x dp)
    # matches the single-device run exactly
    losses_pp, state_pp, out_pp = run("pp2", devices_env="2", pp=2)
    assert "Pipeline parallelism: 2 DiT blocks in 2 GPipe stages" in out_pp
    losses_1, state_1, _ = run("one", devices_env="1", pp=1)
    assert losses_pp and len(losses_pp) == len(losses_1)
    np.testing.assert_allclose(losses_pp, losses_1, rtol=2e-3)
    assert not any(k.startswith("__stack__") for k in state_pp)
    for k in state_1:
        np.testing.assert_allclose(
            np.asarray(state_pp[k], np.float32),
            np.asarray(state_1[k], np.float32),
            rtol=2e-2, atol=2e-3, err_msg=k)


def test_pp_resume_restacks_optimizer_state(tmp_path, monkeypatch, capsys):
    """Resuming a NON-pipeline run under PIPELINE_PARALLEL_SIZE>1 must
    restack the flat-named moment dicts into the __stack__ namespace and
    restore them (not silently start fresh)."""
    from unittest import mock

    root = tmp_path / "base"
    root.mkdir()
    monkeypatch.setenv("AOZORA_DEVICES", "1")
    config, _ = _build_anima_env(root, MAX_TRAIN_STEPS=2,
                                 SAVE_EVERY_N_STEPS=2)
    with mock.patch(
            "aozora_sdxl_training_tpu.train.anima_trainer."
            "check_if_anima_caching_needed", return_value=False):
        run_anima_training(config)
    capsys.readouterr()
    out = root / "out"
    model = out / "anima_run_step_2.safetensors"
    state = out / "anima_run_training_state_step_2.safetensors"
    assert model.exists() and state.exists()

    monkeypatch.setenv("AOZORA_DEVICES", "2")
    root2 = tmp_path / "resume"
    root2.mkdir()
    config2, _ = _build_anima_env(
        root2, MAX_TRAIN_STEPS=4, SAVE_EVERY_N_STEPS=0,
        PIPELINE_PARALLEL_SIZE=2, RESUME_TRAINING=True,
        ANIMA_RESUME_MODEL_PATH=str(model),
        ANIMA_RESUME_STATE_PATH=str(state),
        OUTPUT_NAME="anima_resume")
    with mock.patch(
            "aozora_sdxl_training_tpu.train.anima_trainer."
            "check_if_anima_caching_needed", return_value=False):
        run_anima_training(config2)
    outtxt = capsys.readouterr().out
    assert "Restacked resumed optimizer state" in outtxt
    assert "Restored optimizer state" in outtxt
    assert (root2 / "out" / "anima_resume.safetensors").exists()
