"""Training objectives: epsilon / v-prediction / rectified flow.

The DDPM schedule is the stock SDXL one (scaled-linear betas 0.00085..0.012,
1000 steps) — the reference downloads it from the hub
(/root/reference/train.py:2613); we compute it in closed form, which is the
only piece of network state the reference needed.

Determinism contract: the reference reseeds its noise generator with
``seed + step`` every micro-step (train.py:248-254) and derives the rectified
-flow jitter from an LCG mix of (seed, step) (train.py:257-263, 2744-2746).
The TPU version re-specifies both as ``jax.random.fold_in`` chains, giving
the same property — noise is a pure function of (seed, micro_step), so resume
reproduces the run bit-for-bit.
"""

from __future__ import annotations

from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np

NUM_TRAIN_TIMESTEPS = 1000
BETA_START = 0.00085
BETA_END = 0.012

# Domain-separation tags for fold_in chains.
_NOISE_TAG = 0x4E4F4953   # "NOIS"
_JITTER_TAG = 0x5D1       # matches the reference's jitter stream id


@lru_cache(maxsize=None)
def ddpm_alphas_cumprod() -> np.ndarray:
    """fp64 cumulative alpha products for the scaled-linear SDXL schedule."""
    betas = np.linspace(BETA_START ** 0.5, BETA_END ** 0.5,
                        NUM_TRAIN_TIMESTEPS, dtype=np.float64) ** 2
    return np.cumprod(1.0 - betas)


@lru_cache(maxsize=None)
def _sqrt_acp_tables() -> tuple[np.ndarray, np.ndarray]:
    acp = ddpm_alphas_cumprod()
    return (np.sqrt(acp).astype(np.float32),
            np.sqrt(1.0 - acp).astype(np.float32))


def noise_sigma_table() -> np.ndarray:
    """Per-timestep sqrt(1 - alphas_cumprod): the GUI's reported sigma
    (train.py:2625-2628)."""
    return _sqrt_acp_tables()[1]


def noise_for_step(seed: int | jax.Array, micro_step: jax.Array,
                   shape: tuple[int, ...]) -> jax.Array:
    """Step-keyed fp32 Gaussian noise; pure function of (seed, step, slot).

    Keys are folded per batch *slot*, so sample i's noise is independent of
    the batch size — a dp-padded batch and the unpadded batch give every
    real sample bit-identical noise (mesh-shape-invariant numerics)."""
    base = jax.random.fold_in(
        jax.random.fold_in(jax.random.PRNGKey(seed), _NOISE_TAG), micro_step)
    keys = jax.vmap(lambda i: jax.random.fold_in(base, i))(
        jnp.arange(shape[0]))
    return jax.vmap(
        lambda k: jax.random.normal(k, shape[1:], jnp.float32))(keys)


def rf_jitter_for_step(seed: int | jax.Array, micro_step: jax.Array,
                       batch: int) -> jax.Array:
    """Uniform [0,1) per-sample jitter for rectified-flow timesteps.
    Per-slot keys: batch-size invariant like :func:`noise_for_step`."""
    base = jax.random.fold_in(
        jax.random.fold_in(jax.random.PRNGKey(seed), _JITTER_TAG), micro_step)
    keys = jax.vmap(lambda i: jax.random.fold_in(base, i))(jnp.arange(batch))
    return jax.vmap(
        lambda k: jax.random.uniform(k, (), jnp.float32))(keys)


def ddpm_add_noise(latents: jax.Array, noise: jax.Array,
                   timesteps: jax.Array) -> jax.Array:
    """x_t = sqrt(acp_t) x0 + sqrt(1-acp_t) n  (fp32)."""
    s_acp, s_1macp = (jnp.asarray(t) for t in _sqrt_acp_tables())
    a = s_acp[timesteps][:, None, None, None]
    b = s_1macp[timesteps][:, None, None, None]
    return a * latents.astype(jnp.float32) + b * noise


def ddpm_velocity(latents: jax.Array, noise: jax.Array,
                  timesteps: jax.Array) -> jax.Array:
    """v = sqrt(acp_t) n - sqrt(1-acp_t) x0."""
    s_acp, s_1macp = (jnp.asarray(t) for t in _sqrt_acp_tables())
    a = s_acp[timesteps][:, None, None, None]
    b = s_1macp[timesteps][:, None, None, None]
    return a * noise - b * latents.astype(jnp.float32)


def prepare_batch(prediction_type: str, latents: jax.Array, noise: jax.Array,
                  timesteps: jax.Array, rf_jitter: jax.Array | None = None):
    """Build (noisy_latents, target, conditioning_timesteps, reported_sigma).

    prediction_type: "epsilon" | "v_prediction" | "rectified_flow".
    latents NHWC fp32; timesteps int32 tickets in [0, 1000).
    """
    latents = latents.astype(jnp.float32)
    if prediction_type == "rectified_flow":
        jitter = rf_jitter if rf_jitter is not None else jnp.zeros(
            timesteps.shape, jnp.float32)
        t = jnp.clip((timesteps.astype(jnp.float32) + jitter) / 1000.0, 0.0, 1.0)
        t_exp = t[:, None, None, None]
        noisy = (1.0 - t_exp) * latents + t_exp * noise
        target = noise - latents
        return noisy, target, t * 1000.0, t
    sigma = jnp.asarray(noise_sigma_table())[timesteps]
    noisy = ddpm_add_noise(latents, noise, timesteps)
    if prediction_type == "v_prediction":
        target = ddpm_velocity(latents, noise, timesteps)
    else:
        target = noise
    return noisy, target, timesteps.astype(jnp.float32), sigma


def weighted_mse_loss(pred: jax.Array, target: jax.Array,
                      timesteps: jax.Array,
                      timestep_loss_weights: jax.Array | None = None,
                      sample_mask: jax.Array | None = None) -> jax.Array:
    """Per-sample fp32 MSE x timestep-curve weight, then mean
    (parity: /root/reference/train.py:2408-2416).

    ``sample_mask`` (B,) zeroes padding samples (dp meshes pad ragged
    bucket-boundary batches up to the global batch); the mean divides by
    the *real* sample count so padded and unpadded batches are numerically
    identical."""
    diff = pred.astype(jnp.float32) - target.astype(jnp.float32)
    per_sample = jnp.mean(diff.reshape(diff.shape[0], -1) ** 2, axis=1)
    if timestep_loss_weights is None:
        weights = jnp.ones_like(per_sample)
    else:
        idx = jnp.clip(timesteps.astype(jnp.int32), 0,
                       timestep_loss_weights.shape[0] - 1)
        weights = timestep_loss_weights[idx]
    if sample_mask is None:
        return jnp.mean(per_sample * weights)
    m = sample_mask.astype(jnp.float32)
    return jnp.sum(per_sample * weights * m) / jnp.maximum(jnp.sum(m), 1.0)
