"""Anima flow-matching objective + T5 token dropout.

Parity targets in /root/reference/train_anima.py:
* ticket -> (sigma, timestep): ``sigmas = linspace(1, 0, 1001)[:-1]``,
  indexed at ``999 - ticket`` so tickets ascend as sigma ascends; the DiT is
  conditioned on ``timestep / 1000`` (:1689-1711);
* ``flowmatch_noise_and_target``: x_t = (1-s) x0 + s n, target n - x0 (:1714);
* ``weighted_flowmatch_mse``: per-sample fp32 MSE x per-sample weight, where
  weights index the loss curve by *ticket* (ascending coordinate, :1881);
* deterministic per-caption T5 token dropout keyed by sha256(seed:t5:caption)
  (:672-705).
"""

from __future__ import annotations

import hashlib
from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np


@lru_cache(maxsize=None)
def anima_sigma_table() -> np.ndarray:
    """sigma per ticket (ascending): sigmas[999 - ticket] of linspace(1,0,1001)[:-1]."""
    sigmas = np.linspace(1.0, 0.0, 1001, dtype=np.float32)[:-1]
    return sigmas[::-1].copy()  # index by ticket directly


def ticket_to_sigma_timestep(tickets: jax.Array):
    """tickets int in [0, 1000) -> (sigma, timestep=sigma*1000), fp32."""
    table = jnp.asarray(anima_sigma_table())
    sigma = table[jnp.clip(tickets.astype(jnp.int32), 0, 999)]
    return sigma, sigma * 1000.0


def flowmatch_noise_and_target(latents: jax.Array, noise: jax.Array,
                               sigmas: jax.Array):
    s = sigmas.reshape((sigmas.shape[0],) + (1,) * (latents.ndim - 1))
    latents = latents.astype(jnp.float32)
    noise = noise.astype(jnp.float32)
    return (1.0 - s) * latents + s * noise, noise - latents


def weighted_flowmatch_mse(pred: jax.Array, target: jax.Array,
                           weights: jax.Array,
                           sample_mask: jax.Array | None = None,
                           spatial_mask: jax.Array | None = None,
                           spatial_strength: float = 0.5) -> jax.Array:
    """Flow-matching MSE x per-sample ticket weight, then mean.

    ``spatial_mask`` (B, H, W) in [0, 1] boosts per-pixel loss by
    ``1 + mask * strength`` — the repair trainer's cached line-art detail
    map (parity: /root/reference/scripts/experimental/
    train_anima_repair.py:2026-2036).  ``sample_mask`` (B,) zeroes padded
    samples on dp meshes; the mean divides by the real count.
    """
    diff = pred.astype(jnp.float32) - target.astype(jnp.float32)
    sq = diff ** 2
    if spatial_mask is not None and spatial_strength > 0.0:
        m = jnp.clip(spatial_mask.astype(jnp.float32), 0.0, 1.0)
        hw = sq.shape[-3:-1]  # NHWC or NTHWC error map
        if m.shape[-2:] != hw:
            m = jax.image.resize(m, m.shape[:-2] + hw, "linear")
        if sq.ndim == 5:  # video: one mask per clip, broadcast over T
            m = m[:, None]
        sq = sq * (1.0 + m[..., None] * spatial_strength)
    per_sample = jnp.mean(sq.reshape(sq.shape[0], -1), axis=1)
    weighted = per_sample * weights.astype(jnp.float32)
    if sample_mask is None:
        return jnp.mean(weighted)
    sm = sample_mask.astype(jnp.float32)
    return jnp.sum(weighted * sm) / jnp.maximum(jnp.sum(sm), 1.0)


def apply_t5_token_dropout(t5_ids: np.ndarray, captions, config,
                           pad_id: int = 0) -> np.ndarray:
    """Deterministic per-caption masking of non-pad T5 ids.

    Seed = sha256(f"{seed}:t5:{caption}"); a single chance roll gates the
    caption, then a uniform rate in [min, max] picks how many candidate
    tokens to replace with pad.
    """
    if config is None or not getattr(config, "T5_TOKEN_DROPOUT_ENABLED", False):
        return t5_ids
    chance = min(max(float(getattr(config, "T5_TOKEN_DROPOUT_CHANCE", 0.0) or 0.0), 0.0), 1.0)
    min_rate = min(max(float(getattr(config, "T5_TOKEN_DROPOUT_MIN", 0.0) or 0.0), 0.0), 1.0)
    max_rate = min(max(float(getattr(config, "T5_TOKEN_DROPOUT_MAX", 0.0) or 0.0), 0.0), 1.0)
    if max_rate < min_rate:
        min_rate, max_rate = max_rate, min_rate
    if chance <= 0.0 or max_rate <= 0.0:
        return t5_ids

    out = np.array(t5_ids, copy=True)
    if out.ndim == 1:
        out = out[None]
        squeeze = True
    else:
        squeeze = False
    if isinstance(captions, str):
        captions = [captions]
    seed_base = int(getattr(config, "SEED", 42) or 42)
    for i, caption in enumerate(captions):
        ids = out[i]
        candidates = np.flatnonzero(ids != pad_id)
        if candidates.size == 0:
            continue
        digest = hashlib.sha256(
            f"{seed_base}:t5:{caption}".encode("utf-8", errors="ignore")).digest()
        rng = np.random.Generator(np.random.PCG64(
            int.from_bytes(digest[:8], "little") % (2 ** 63)))
        if rng.random() >= chance:
            continue
        rate = min_rate + (max_rate - min_rate) * rng.random()
        drop_count = int(round(candidates.size * rate))
        if drop_count <= 0:
            continue
        perm = rng.permutation(candidates.size)
        ids[candidates[perm[:drop_count]]] = pad_id
    return out[0] if squeeze else out
