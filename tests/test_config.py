"""Config schema contract tests (JSON preset compatibility with the GUI)."""

import json

import pytest

from aozora_sdxl_training_tpu.config import schema
from aozora_sdxl_training_tpu.config.runtime import RuntimeConfig, parse_exclude_targets


def test_flat_defaults_complete():
    flat = schema.flat_defaults()
    # Spot-check the keys the reference GUI reads/writes.
    assert flat["SINGLE_FILE_CHECKPOINT_PATH"] == "./model.safetensors"
    assert flat["PREDICTION_TYPE"] == "v_prediction"
    assert flat["UNET_EXCLUDE_TARGETS"] == "conv1, conv2"
    assert flat["RAVEN_PARAMS"]["debias_strength"] == 0.3
    assert flat["TIMESTEP_ALLOCATION"] == {"bin_size": 100, "counts": []}
    assert flat["MAX_BUCKET_RESOLUTION"] == 1024
    # 79 reference keys + TPU extensions: TENSOR_PARALLEL_SIZE,
    # SEQUENCE_PARALLEL_SIZE, PIPELINE_PARALLEL_SIZE + its microbatch
    # count, ANIMA_VIDEO_FRAMES, and the three repair
    # keys (module constants in the reference,
    # train_anima_repair.py:97-98, 1474-1484)
    assert len(schema.FLAT_KEYS) == 92


def test_defaults_are_deep_copied():
    a, b = schema.flat_defaults(), schema.flat_defaults()
    a["INSTANCE_DATASETS"][0]["path"] = "mutated"
    assert b["INSTANCE_DATASETS"][0]["path"] == "./data"


def test_nested_key_overrides():
    assert schema.nested_key_for("sdxl", "SINGLE_FILE_CHECKPOINT_PATH") == "sdxl_base_model_path"
    assert schema.nested_key_for("anima", "DIT_PATH") == "anima_dit_model_path"
    assert schema.nested_key_for("anima", "ANIMA_RESUME_MODEL_PATH") == "anima_resume_model_path"
    assert schema.nested_key_for("sdxl", "SEED") == "sdxl_seed"
    assert schema.nested_key_for("anima", "TOKENIZER_T5XXL_PATH") == "anima_t5xxl_tokenizer"


def test_mode_key_from_label():
    assert schema.mode_key_from_label("Anima DiT") == "anima"
    assert schema.mode_key_from_label("anima") == "anima"
    assert schema.mode_key_from_label("SDXL") == "sdxl"
    assert schema.mode_key_from_label(None) == "sdxl"


def test_roundtrip_flatten_nest():
    flat = schema.flat_defaults()
    flat["SEED"] = 1234
    flat["SINGLE_FILE_CHECKPOINT_PATH"] = "/x/model.safetensors"
    preset = schema.nest_flat_config(flat, "sdxl")
    assert preset["sdxl"]["sdxl_seed"] == 1234
    assert preset["sdxl"]["sdxl_base_model_path"] == "/x/model.safetensors"
    back = schema.flatten_preset(preset)
    assert back["SEED"] == 1234
    assert back["SINGLE_FILE_CHECKPOINT_PATH"] == "/x/model.safetensors"
    assert back["TRAINING_MODE"] == "SDXL"


def test_flatten_reference_preset_files():
    """The reference's shipped presets must flatten cleanly."""
    for name in ("default_config.json", "Hysocs_Personal_Config.json"):
        with open(f"/root/reference/configs/{name}", encoding="utf-8") as f:
            preset = json.load(f)
        flat = schema.flatten_preset(preset)
        assert flat["TRAINING_MODE"] in ("SDXL", "Anima DiT")
        assert isinstance(flat["LR_CUSTOM_CURVE"], list)
        # presets may store numerics as strings; RuntimeConfig coerces them
        cfg = RuntimeConfig(flat, validate_resume_paths=False)
        assert isinstance(cfg.MAX_TRAIN_STEPS, int)
        assert isinstance(cfg.CLIP_GRAD_NORM, float)


def test_legacy_migrations():
    preset = {
        "active_mode": "sdxl",
        "sdxl": {
            "sdxl_use_timestep_loss_weight": True,
            "sdxl_timestep_mode": "Shift",
            "sdxl_sigma_shift": 2.5,
        },
    }
    flat = schema.flatten_preset(preset)
    assert flat["TIMESTEP_LOSS_WEIGHT_CURVE"] == {"preset": "bell"}
    assert flat["TIMESTEP_MODE"] == "Odds-Scaled (Z-Image)"
    assert flat["TIMESTEP_ODDS_SCALE"] == 2.5


def test_anima_checkpoint_mode_title_cased():
    preset = {"active_mode": "anima",
              "anima": {"anima_gradient_checkpointing_mode": "conservative"}}
    flat = schema.flatten_preset(preset)
    assert flat["ANIMA_GRADIENT_CHECKPOINTING_MODE"] == "Conservative"
    preset["anima"]["anima_gradient_checkpointing_mode"] = "bogus"
    assert schema.flatten_preset(preset)["ANIMA_GRADIENT_CHECKPOINTING_MODE"] == "Full"


def test_anima_mode_clears_sdxl_resume_paths():
    preset = {"active_mode": "anima", "anima": {"anima_vae_path": "/v.safetensors"}}
    flat = schema.flatten_preset(preset)
    assert flat["VAE_PATH"] == "/v.safetensors"
    assert flat["RESUME_MODEL_PATH"] == ""
    assert flat["RESUME_STATE_PATH"] == ""


def test_runtime_config_type_coercion():
    cfg = RuntimeConfig({"MAX_TRAIN_STEPS": "250.0", "CLIP_GRAD_NORM": "2",
                         "SHOULD_UPSCALE": "yes", "SEED": "bogus"})
    assert cfg.MAX_TRAIN_STEPS == 250
    assert cfg.CLIP_GRAD_NORM == 2.0
    assert cfg.SHOULD_UPSCALE is True
    assert cfg.SEED == 42  # falls back to default on unparseable


def test_runtime_config_exclude_targets_parsing():
    cfg = RuntimeConfig({"UNET_EXCLUDE_TARGETS": "conv1, conv2 , , attn*"})
    assert cfg.UNET_EXCLUDE_TARGETS == ["conv1", "conv2", "attn*"]
    assert parse_exclude_targets(["a", "", "b"]) == ["a", "b"]


def test_runtime_config_derived_fields():
    cfg = RuntimeConfig({"PREDICTION_TYPE": "rectified_flow"})
    assert cfg.is_rectified_flow
    assert cfg.NOISE_MODE == "normal"


def test_resume_validation_raises():
    with pytest.raises(FileNotFoundError):
        RuntimeConfig({"RESUME_TRAINING": True, "RESUME_MODEL_PATH": "/nope",
                       "RESUME_STATE_PATH": "/nope"})


def test_shipped_preset_assets_load():
    """configs/*.json (the reference ships default + example presets;
    /root/reference/configs/) must round-trip through the runtime config."""
    from pathlib import Path

    from aozora_sdxl_training_tpu.config.runtime import RuntimeConfig

    configs = sorted(Path(__file__).resolve().parents[1].glob("configs/*.json"))
    assert len(configs) >= 2, "expected shipped preset files in configs/"
    for path in configs:
        cfg = RuntimeConfig.from_preset_file(path,
                                             validate_resume_paths=False)
        assert cfg.BATCH_SIZE >= 1
        assert cfg.PREDICTION_TYPE in ("epsilon", "v_prediction",
                                       "rectified_flow")
