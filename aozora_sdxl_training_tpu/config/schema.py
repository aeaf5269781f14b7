"""Config schema: the JSON preset contract shared with the reference GUI.

The reference (Aozora trainer) stores presets as nested JSON blocks keyed by
training mode (``sdxl`` / ``anima``) and consumes them through a flat
UPPER_SNAKE namespace (see /root/reference/training_utils/config/config.py).
This module reproduces that *data contract* — identical key names, defaults,
nesting rules and legacy migrations — so existing preset files and the PyQt
GUI keep working against the TPU rebuild unchanged.

The implementation is table-driven: one ``Field`` row per key instead of
module-level globals, which gives us a single source of truth for defaults,
flat->nested naming and per-mode visibility.
"""

from __future__ import annotations

import copy
from dataclasses import dataclass
from typing import Any

CONFIG_VERSION = 5

MODE_SDXL = "sdxl"
MODE_ANIMA = "anima"
TRAINING_MODE_SDXL = "SDXL"
TRAINING_MODE_ANIMA = "Anima DiT"
MODE_LABELS = {MODE_SDXL: TRAINING_MODE_SDXL, MODE_ANIMA: TRAINING_MODE_ANIMA}

MAX_BUCKET_RESOLUTION_CHOICES = (896, 1024, 1152, 1536)

# Scope flags ---------------------------------------------------------------
GLOBAL = "global"          # flat-only key, never nested per mode
SHARED = "shared"          # nested under both sdxl_* and anima_*
SDXL_ONLY = "sdxl"         # nested under sdxl_* only
ANIMA_ONLY = "anima"       # nested under anima_* only


@dataclass(frozen=True)
class Field:
    name: str
    default: Any
    scope: str = SHARED
    nested_name: str | None = None  # override for the nested suffix

    def default_copy(self) -> Any:
        return copy.deepcopy(self.default)


def _fields() -> list[Field]:
    return [
        # --- Paths ---
        Field("SINGLE_FILE_CHECKPOINT_PATH", "./model.safetensors", SDXL_ONLY,
              nested_name="base_model_path"),
        Field("VAE_PATH", "", SDXL_ONLY),
        Field("OUTPUT_DIR", "./output", SHARED),
        Field("OUTPUT_NAME", "auto", SHARED),
        # --- Architecture ---
        Field("TRAINING_MODE", "SDXL", GLOBAL),
        Field("DIT_PATH", "", ANIMA_ONLY, nested_name="dit_model_path"),
        Field("DIT_VAE_PATH", "", ANIMA_ONLY, nested_name="vae_path"),
        Field("ANIMA_DIT_SAVE_PREFIX", "auto", ANIMA_ONLY, nested_name="dit_save_prefix"),
        Field("TEXT_ENCODER_PATH", "", ANIMA_ONLY),
        Field("TOKENIZER_PATH", "", ANIMA_ONLY, nested_name="qwen_tokenizer"),
        Field("TOKENIZER_T5XXL_PATH", "", ANIMA_ONLY, nested_name="t5xxl_tokenizer"),
        # --- Resume ---
        Field("RESUME_TRAINING", False, SHARED, nested_name="resume_training"),
        Field("RESUME_MODEL_PATH", "", SDXL_ONLY, nested_name="resume_model_path"),
        Field("RESUME_STATE_PATH", "", SDXL_ONLY, nested_name="resume_state_path"),
        Field("ANIMA_RESUME_MODEL_PATH", "", ANIMA_ONLY, nested_name="resume_model_path"),
        Field("ANIMA_RESUME_STATE_PATH", "", ANIMA_ONLY, nested_name="resume_state_path"),
        # --- Datasets ---
        Field("INSTANCE_DATASETS", [{"path": "./data", "repeats": 1}], SHARED),
        # --- Caching & loaders ---
        Field("CACHING_BATCH_SIZE", 2, SHARED),
        Field("TEXT_CACHE_PRECISION", "bfloat16", SHARED),
        Field("VAE_CACHE_PRECISION", "bfloat16", SHARED),
        # accepted for preset compatibility; the TPU pipeline uses a
        # prefetch thread, not DataLoader workers (train.py:2658)
        Field("NUM_WORKERS", 0, SHARED),
        Field("UNCONDITIONAL_DROPOUT", False, SHARED),
        Field("UNCONDITIONAL_DROPOUT_CHANCE", 0.0, SHARED),
        Field("QWEN_NULL_DROPOUT_CHANCE", 0.0, SHARED),
        Field("T5_NULL_DROPOUT_CHANCE", 0.0, SHARED),
        Field("TEXT_CONDITIONING_SCALE_ENABLED", False, SHARED),
        Field("TEXT_CONDITIONING_SCALE_MIN", 1.0, SHARED),
        Field("TEXT_CONDITIONING_SCALE_MAX", 1.0, SHARED),
        Field("T5_TOKEN_DROPOUT_ENABLED", False, SHARED),
        Field("T5_TOKEN_DROPOUT_CHANCE", 0.0, SHARED),
        Field("T5_TOKEN_DROPOUT_MIN", 0.0, SHARED),
        Field("T5_TOKEN_DROPOUT_MAX", 0.0, SHARED),
        Field("CAPTION_CHUNKING_ENABLED", False, SHARED),
        Field("CAPTION_SOURCE_TYPE", "txt", SHARED),
        Field("CAPTION_TAGS_PERCENT", 40, SHARED),
        Field("CAPTION_NL_PERCENT", 10, SHARED),
        Field("CAPTION_TAGS_NL_PERCENT", 25, SHARED),
        Field("CAPTION_NL_TAGS_PERCENT", 25, SHARED),
        # --- Bucketing ---
        Field("SHOULD_UPSCALE", False, SHARED),
        Field("MAX_BUCKET_RESOLUTION", 1024, SHARED),
        Field("MULTI_BUCKET_ENABLED", False, SHARED),
        Field("MULTI_BUCKET_EXTRA_BUCKETS", 0, SHARED),
        # --- Core training ---
        Field("PREDICTION_TYPE", "v_prediction", SHARED),
        Field("MAX_TRAIN_STEPS", 10000, SHARED),
        Field("BATCH_SIZE", 1, SHARED),
        Field("GRADIENT_ACCUMULATION_STEPS", 4, SHARED),
        Field("MIXED_PRECISION", "bfloat16", SHARED),
        Field("CLIP_GRAD_NORM", 1.0, SHARED),
        Field("SEED", 42, SHARED),
        # TPU extension (no reference equivalent): Megatron-style tensor
        # parallelism over the mesh's tp axis; 1 = dp/FSDP only.
        Field("TENSOR_PARALLEL_SIZE", 1, SHARED),
        # TPU extension: sequence/context parallelism for the DiT — tokens
        # shard over an sp mesh axis and self-attention runs the ring
        # flash kernel (ops/ring_attention.py). Requires tp=1; the 12k+-
        # token video clips are the target workload.
        Field("SEQUENCE_PARALLEL_SIZE", 1, ANIMA_ONLY),
        # TPU extension: GPipe pipeline parallelism for the DiT — blocks
        # stage-stack over a pp mesh axis, microbatches stream through the
        # stage ring (parallel/pipeline.py). Requires tp=1, sp=1;
        # BATCH_SIZE (per dp shard) must be divisible by the microbatch
        # count (0 = one microbatch per sample).
        Field("PIPELINE_PARALLEL_SIZE", 1, ANIMA_ONLY),
        Field("ANIMA_PIPELINE_MICROBATCHES", 0, ANIMA_ONLY),
        # TPU extension: master-weight precision. "auto" lets
        # train.memory_policy pick fp32 when it fits the HBM budget and
        # fall back to bf16 master + fp32 update scratch (the reference's
        # own training precision, raven.py) on a memory-tight single chip.
        Field("MASTER_DTYPE", "auto", SHARED, nested_name="master_dtype"),
        Field("ANIMA_GRADIENT_CHECKPOINTING_MODE", "Full", ANIMA_ONLY),
        # --- Saving ---
        Field("SAVE_EVERY_N_STEPS", 1000, SHARED),
        # TPU extension: in-training preview sampling (DDIM/Euler + VAE
        # decoder; train/sampler.py). 0 = off (reference has no sampler).
        Field("PREVIEW_EVERY_N_STEPS", 0, SDXL_ONLY,
              nested_name="preview_every_n_steps"),
        Field("PREVIEW_SAMPLE_STEPS", 20, SDXL_ONLY,
              nested_name="preview_sample_steps"),
        # accepted for compatibility; saves always stream here (the
        # non-streaming writer has no advantage on this runtime)
        Field("ANIMA_STREAMING_SAVE", True, ANIMA_ONLY),
        # --- Layer exclusion ---
        Field("UNET_EXCLUDE_TARGETS", "conv1, conv2", SDXL_ONLY),
        Field("DIT_EXCLUDE_TARGETS", "", ANIMA_ONLY),
        # --- LR schedule ---
        Field("LR_CUSTOM_CURVE",
              [[0.0, 0.0], [0.05, 8.0e-7], [0.85, 8.0e-7], [1.0, 1.0e-7]], SHARED),
        Field("LEARNING_RATE", 8.0e-7, SHARED),
        Field("LR_GRAPH_MIN", 0.0, SHARED),
        Field("LR_GRAPH_MAX", 1.0e-6, SHARED),
        # --- Timestep tickets ---
        Field("TIMESTEP_ALLOCATION", {"bin_size": 100, "counts": []}, SHARED),
        Field("TIMESTEP_STRATIFIED_SAMPLING", False, SHARED),
        Field("TIMESTEP_FORCE_IMAGE_BIN_SPREAD", False, SHARED),
        Field("TIMESTEP_LOSS_WEIGHT_CURVE", [[0.0, 1.0], [1.0, 1.0]], SHARED),
        # --- Optimizer ---
        Field("OPTIMIZER_TYPE", "raven", SHARED),
        Field("RAVEN_PARAMS", {
            "betas": [0.9, 0.999], "eps": 1e-8, "weight_decay": 0.01,
            "debias_strength": 0.3, "momentum_dtype": "bfloat16"}, SHARED),
        Field("PAGED_ADAMW_8BIT_PARAMS", {
            "betas": [0.9, 0.999], "eps": 1e-8, "weight_decay": 0.01}, SHARED),
        Field("TITAN_PARAMS", {
            "betas": [0.9, 0.999], "eps": 1e-8, "weight_decay": 0.01,
            "debias_strength": 0.3, "momentum_dtype": "bfloat16"}, SHARED),
        # --- Loss ---
        # MSE is the only loss in the reference too (the key is
        # decorative there; kept for preset compatibility)
        Field("LOSS_TYPE", "MSE", SHARED),
        # --- Advanced ---
        Field("MEMORY_EFFICIENT_ATTENTION", "sdpa", SHARED),
        Field("TIMESTEP_MODE", "Wave", SHARED),
        Field("TIMESTEP_ODDS_SCALE", 3.0, SHARED),
        # --- Anima cache ---
        Field("ANIMA_CACHE_FOLDER_NAME", ".precomputed_anima_dit_cache", ANIMA_ONLY),
        Field("VAE_CACHING_TILED", True, ANIMA_ONLY),
        Field("VAE_CACHING_TILE_SIZE", [96, 96], ANIMA_ONLY),
        Field("VAE_CACHING_TILE_STRIDE", [72, 72], ANIMA_ONLY),
        # TPU extension: frames per training clip (1 = the reference's
        # image-mode training; >1 enables video flow-matching — animated
        # GIF/WEBP sources are decoded to 1+4k frames for the causal VAE)
        Field("ANIMA_VIDEO_FRAMES", 1, ANIMA_ONLY, nested_name="video_frames"),
        # TPU extension: DiT preview sampling (Euler flow integration +
        # latent-RGB render; train/anima_sampler.py). 0 = off.
        Field("ANIMA_PREVIEW_EVERY_N_STEPS", 0, ANIMA_ONLY,
              nested_name="preview_every_n_steps"),
        Field("ANIMA_PREVIEW_SAMPLE_STEPS", 16, ANIMA_ONLY,
              nested_name="preview_sample_steps"),
        # QAT repair extras (module constants in the reference,
        # train_anima_repair.py:97-98; preset-controllable here)
        Field("ANIMA_REPAIR_LINEART_LOSS_ENABLED", False, ANIMA_ONLY,
              nested_name="repair_lineart_loss_enabled"),
        Field("ANIMA_REPAIR_LINEART_LOSS_STRENGTH", 0.5, ANIMA_ONLY,
              nested_name="repair_lineart_loss_strength"),
        # "auto" = projected-quant when comfy_quant records exist;
        # "bfloat16" = the full-precision control arm (identical losses, no
        # projection — reference train_anima_repair.py:1647-1676)
        Field("ANIMA_REPAIR_TARGET_FORMAT", "auto", ANIMA_ONLY,
              nested_name="repair_target_format"),
        Field("REBUILD_CACHE", False, SHARED),
        # --- VAE ---
        Field("VAE_NORMALIZATION_MODE", "scalar", SHARED),
        Field("VAE_SHIFT_FACTOR", None, SHARED),
        Field("VAE_SCALING_FACTOR", None, SHARED),
        Field("VAE_LATENT_CHANNELS", None, SHARED),
    ]


FIELDS: tuple[Field, ...] = tuple(_fields())
FIELD_BY_NAME: dict[str, Field] = {f.name: f for f in FIELDS}
FLAT_KEYS: list[str] = [f.name for f in FIELDS]


def mode_key_from_label(value: Any) -> str:
    text = str(value or "").strip().lower()
    if text in {MODE_ANIMA, TRAINING_MODE_ANIMA.lower()} or text.startswith("anima"):
        return MODE_ANIMA
    return MODE_SDXL


def nested_key_for(mode_key: str, flat_key: str) -> str:
    f = FIELD_BY_NAME.get(flat_key)
    suffix = (f.nested_name if f and f.nested_name else flat_key.lower())
    if suffix.startswith(f"{mode_key}_"):
        return suffix
    return f"{mode_key}_{suffix}"


def flat_defaults() -> dict[str, Any]:
    return {f.name: f.default_copy() for f in FIELDS}


def default_value(flat_key: str) -> Any:
    f = FIELD_BY_NAME.get(flat_key)
    return f.default_copy() if f else None


def mode_flat_keys(mode_key: str) -> list[str]:
    scopes = {SHARED, SDXL_ONLY if mode_key == MODE_SDXL else ANIMA_ONLY}
    return [f.name for f in FIELDS if f.scope in scopes]


def default_mode_config(mode_key: str) -> dict[str, Any]:
    return {
        nested_key_for(mode_key, k): default_value(k)
        for k in mode_flat_keys(mode_key)
    }


def default_preset() -> dict[str, Any]:
    return {
        "config_version": CONFIG_VERSION,
        "active_mode": MODE_SDXL,
        MODE_SDXL: default_mode_config(MODE_SDXL),
        MODE_ANIMA: default_mode_config(MODE_ANIMA),
    }


def nest_flat_config(flat_config: dict, mode_key: str | None = None,
                     base_preset: dict | None = None) -> dict:
    """Inverse of :func:`flatten_preset` for one mode block (GUI save path)."""
    flat_config = copy.deepcopy(flat_config)
    mode_key = mode_key_from_label(mode_key or flat_config.get("TRAINING_MODE"))
    preset = copy.deepcopy(base_preset) if base_preset else default_preset()
    preset["config_version"] = CONFIG_VERSION
    preset["active_mode"] = mode_key
    preset.setdefault(mode_key, default_mode_config(mode_key))
    for flat_key in mode_flat_keys(mode_key):
        if flat_key in flat_config:
            preset[mode_key][nested_key_for(mode_key, flat_key)] = copy.deepcopy(
                flat_config[flat_key])
    return preset


def _migrate_mode_block(mode_key: str, src: dict, dst: dict) -> None:
    """Apply legacy-key migrations for one mode block (config.py:294-337 parity)."""
    odds_scale_key = nested_key_for(mode_key, "TIMESTEP_ODDS_SCALE")
    if odds_scale_key not in src:
        for legacy in (f"{mode_key}_timestep_ticket_shift",
                       f"{mode_key}_ticket_shift",
                       f"{mode_key}_sigma_shift"):
            if legacy in src:
                dst[odds_scale_key] = copy.deepcopy(src[legacy])
                break
    curve_key = nested_key_for(mode_key, "TIMESTEP_LOSS_WEIGHT_CURVE")
    if src.get(f"{mode_key}_use_timestep_loss_weight") and curve_key not in src:
        dst[curve_key] = {"preset": "bell"}


def normalize_preset(config_data: Any) -> dict:
    """Upgrade any preset dict (legacy or current) to the current schema."""
    if not isinstance(config_data, dict):
        return default_preset()
    preset = default_preset()
    preset["active_mode"] = mode_key_from_label(config_data.get("active_mode"))
    for mode_key in (MODE_SDXL, MODE_ANIMA):
        block = config_data.get(mode_key)
        if not isinstance(block, dict):
            continue
        valid = {nested_key_for(mode_key, k) for k in mode_flat_keys(mode_key)}
        _migrate_mode_block(mode_key, block, preset[mode_key])
        preset[mode_key].update({
            k: copy.deepcopy(v) for k, v in block.items() if k in valid
        })
        if mode_key == MODE_ANIMA:
            ckpt_key = nested_key_for(mode_key, "ANIMA_GRADIENT_CHECKPOINTING_MODE")
            mode = str(preset[mode_key].get(ckpt_key, "Full")).strip().title()
            preset[mode_key][ckpt_key] = mode if mode in {"Full", "Conservative"} else "Full"
        ts_mode_key = nested_key_for(mode_key, "TIMESTEP_MODE")
        if preset[mode_key].get(ts_mode_key) == "Shift":
            preset[mode_key][ts_mode_key] = "Odds-Scaled (Z-Image)"
    return preset


def flatten_preset(config_data: Any, mode_key: str | None = None) -> dict:
    """Nested preset JSON -> flat UPPER_SNAKE dict for the active mode."""
    preset = normalize_preset(config_data)
    mode_key = mode_key_from_label(mode_key or preset.get("active_mode"))
    flat = flat_defaults()
    flat["TRAINING_MODE"] = MODE_LABELS[mode_key]
    block = preset.get(mode_key, {})
    for flat_key in mode_flat_keys(mode_key):
        nested_key = nested_key_for(mode_key, flat_key)
        if nested_key in block:
            flat[flat_key] = copy.deepcopy(block[nested_key])
    if mode_key == MODE_ANIMA:
        flat["VAE_PATH"] = flat.get("DIT_VAE_PATH", "")
        flat["RESUME_MODEL_PATH"] = ""
        flat["RESUME_STATE_PATH"] = ""
    return flat
