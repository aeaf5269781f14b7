"""Anima component bundle: one-call loading of DiT + text encoder + VAE.

API-parity facade for the reference's ``AnimaTrainingComponents.from_pretrained``
(/root/reference/training_utils/anima/pipeline.py:17-64): loads the three
model components from local checkpoint files (with the loader's prefix
rules), resolves both tokenizers, and provides ``preprocess_image``
([-1, 1] channel-last float conversion).
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np


@dataclass
class AnimaTrainingComponents:
    dit_params: dict
    dit_config: object
    dit_prefix: str
    text_encoder_params: dict
    text_encoder_config: object
    vae_params: dict
    tokenizer: object
    tokenizer_t5xxl: object

    @classmethod
    def from_pretrained(cls, *, dit_path, text_encoder_path, vae_path,
                        tokenizer_path=None, tokenizer_t5xxl_path=None,
                        dtype=None) -> "AnimaTrainingComponents":
        import jax.numpy as jnp
        from ...ckpt.anima_checkpoint import (load_dit_state,
                                              load_text_encoder_state,
                                              load_vae_state)
        from ...data.anima_cache import _load_hf_tokenizer
        from ...train.anima_trainer import _dit_config_for_state
        from . import qwen3, wan_vae
        from . import dit as dit_mod

        dtype = dtype or jnp.float32
        dit_state, prefix = load_dit_state(dit_path)
        dit_cfg = _dit_config_for_state(dit_state)
        dit_params = dit_mod.params_from_torch_state(dit_state, dit_cfg, dtype)
        del dit_state

        te_state = load_text_encoder_state(text_encoder_path)
        te_cfg = qwen3.detect_config(te_state)
        te_params = qwen3.params_from_torch_state(te_state, te_cfg, dtype)
        del te_state

        vae_params = wan_vae.params_from_torch_state(
            load_vae_state(vae_path), dtype=dtype)

        return cls(
            dit_params=dit_params, dit_config=dit_cfg, dit_prefix=prefix,
            text_encoder_params=te_params, text_encoder_config=te_cfg,
            vae_params=vae_params,
            tokenizer=_load_hf_tokenizer(tokenizer_path),
            tokenizer_t5xxl=_load_hf_tokenizer(tokenizer_t5xxl_path),
        )

    @staticmethod
    def preprocess_image(image) -> np.ndarray:
        """PIL image -> (H, W, 3) float32 in [-1, 1] (pipeline.py:57-64)."""
        arr = np.asarray(image.convert("RGB"), np.float32)
        return arr / 127.5 - 1.0
