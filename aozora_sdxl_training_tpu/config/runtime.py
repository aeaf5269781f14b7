"""Runtime configuration: flat namespace consumed by the trainers.

Mirrors the behavioral contract of the reference's ``TrainingConfig``
(/root/reference/train.py:266-322): flat defaults overlaid with a ``--config``
preset JSON, type coercion against the default's type, resume-path validation,
and derived fields (``compute_dtype``, ``is_rectified_flow``).

The TPU rebuild keeps the config host-side and immutable after construction;
everything the jitted train step needs is extracted into static hashable
dataclasses elsewhere.
"""

from __future__ import annotations

import argparse
import json
from pathlib import Path
from typing import Any

import jax.numpy as jnp

from . import schema


def _coerce(value: Any, default: Any) -> Any:
    """Coerce ``value`` to the type of ``default``; fall back to ``default``."""
    if default is None or isinstance(value, type(default)):
        return value
    expected = type(default)
    if expected is bool and isinstance(value, str):
        return value.lower() in ("true", "1", "t", "y", "yes")
    try:
        if expected is int:
            return int(float(value))
        return expected(value)
    except (ValueError, TypeError):
        return default


def parse_exclude_targets(value: Any) -> list[str]:
    if isinstance(value, str):
        return [item.strip() for item in value.split(",") if item.strip()]
    if isinstance(value, list):
        return [item for item in value if item]
    return []


class RuntimeConfig:
    """Flat attribute namespace with reference-identical coercion rules."""

    def __init__(self, flat: dict[str, Any] | None = None, *,
                 validate_resume_paths: bool = True):
        for key, value in schema.flat_defaults().items():
            setattr(self, key, value)
        if flat:
            for key, value in flat.items():
                setattr(self, key, value)
        self._type_check_and_correct(validate_resume_paths)
        self.NOISE_MODE = "normal"
        self.compute_dtype = (
            jnp.bfloat16 if self.MIXED_PRECISION == "bfloat16" else jnp.float16
        )
        self.is_rectified_flow = (
            getattr(self, "PREDICTION_TYPE", "epsilon") == "rectified_flow"
        )

    # -- construction -------------------------------------------------------
    @classmethod
    def from_preset_file(cls, path: str | Path, **kw) -> "RuntimeConfig":
        path = Path(path)
        with open(path, "r", encoding="utf-8") as f:
            flat = schema.flatten_preset(json.load(f))
        return cls(flat, **kw)

    @classmethod
    def from_argv(cls, argv: list[str] | None = None, **kw) -> "RuntimeConfig":
        parser = argparse.ArgumentParser(description="Load a training configuration.")
        parser.add_argument("--config", type=str,
                            help="Path to the preset JSON file.")
        args, _ = parser.parse_known_args(argv)
        if args.config:
            path = Path(args.config)
            if path.exists():
                print(f"INFO: Loading configuration from {path}")
                try:
                    return cls.from_preset_file(path, **kw)
                except (json.JSONDecodeError, TypeError) as e:
                    print(f"ERROR: Could not parse {path}: {e}. Using defaults.")
            else:
                print(f"WARNING: Config {path} not found. Using defaults.")
        return cls(**kw)

    # -- validation ---------------------------------------------------------
    def _type_check_and_correct(self, validate_resume_paths: bool) -> None:
        if validate_resume_paths and getattr(self, "RESUME_TRAINING", False):
            is_anima = str(getattr(self, "TRAINING_MODE", "")).lower().startswith("anima")
            keys = (["ANIMA_RESUME_MODEL_PATH", "ANIMA_RESUME_STATE_PATH"]
                    if is_anima else ["RESUME_MODEL_PATH", "RESUME_STATE_PATH"])
            for key in keys:
                value = getattr(self, key, "")
                if not value or not Path(value).exists():
                    raise FileNotFoundError(
                        f"RESUME_TRAINING is enabled, but {key}='{value}' is not a "
                        f"valid file path.")

        for key, value in list(self.__dict__.items()):
            if key == "UNET_EXCLUDE_TARGETS":
                setattr(self, key, parse_exclude_targets(value))
                continue
            default = schema.default_value(key)
            if default is None:
                continue
            setattr(self, key, _coerce(value, default))
