"""In-training preview sampling (TPU extension — the reference never
samples; its training loop has no inference/decode path at all).

A deterministic DDIM sampler for the eps / v-prediction objectives and a
Euler integrator for rectified flow, jitted once (``lax.scan`` over the
step schedule) and reused for every preview.  Combined with the VAE
decoder (models/sdxl/vae.decoder_forward) this renders periodic preview
PNGs from the training conditioning so drift/divergence is visible
mid-run.

Timestep schedule: ``steps`` evenly spaced DDPM timesteps from 999 down
to 0 (trailing spacing).  DDIM eta=0 (deterministic):

    x0_hat  = (x_t - s_t * eps) / a_t            (eps objective)
    x0_hat  = a_t * x_t - s_t * v                (v objective)
    eps_hat = a_t * v + s_t * x_t                (v objective)
    x_prev  = a_prev * x0_hat + s_prev * eps_hat

with a_t = sqrt(alphas_cumprod[t]), s_t = sqrt(1 - alphas_cumprod[t]).
Rectified flow integrates dx/dt = v_pred from t=1 to 0 in equal steps
(the model predicts ``noise - x0``; conditioning is t*1000, matching
train-time, objectives.prepare_batch / reference train.py:2743-2752).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..models.sdxl.arch import UNetConfig
from ..models.sdxl.unet import unet_forward
from . import objectives


def ddim_schedule(steps: int) -> np.ndarray:
    """``steps`` timesteps from 999 to 0 inclusive (int32)."""
    return np.linspace(999.0, 0.0, max(int(steps), 2)).round().astype(np.int32)


def make_preview_sampler(cfg: UNetConfig, prediction_type: str, steps: int,
                         *, attn_impl: str = "xla",
                         compute_dtype=jnp.bfloat16):
    """Returns jittable ``sample(params, noise, embeds, pooled, time_ids)
    -> x0 latents`` (same normalization space the UNet was trained in)."""
    is_rf = prediction_type == "rectified_flow"

    if is_rf:
        n = max(int(steps), 1)
        ts = np.linspace(1.0, 0.0, n + 1).astype(np.float32)

        def sample(params, noise, embeds, pooled, time_ids):
            def body(x, i):
                t = jnp.asarray(ts)[i]
                dt = jnp.asarray(ts)[i] - jnp.asarray(ts)[i + 1]
                pred = unet_forward(
                    params, x.astype(compute_dtype),
                    jnp.full((x.shape[0],), t * 1000.0, jnp.float32),
                    embeds, pooled, time_ids, cfg=cfg, attn_impl=attn_impl,
                    compute_dtype=compute_dtype)
                return x - dt * pred.astype(jnp.float32), ()

            x, _ = jax.lax.scan(body, noise.astype(jnp.float32),
                                jnp.arange(n))
            return x

        return sample

    acp = objectives.ddpm_alphas_cumprod()
    a_tab = np.sqrt(acp).astype(np.float32)
    s_tab = np.sqrt(1.0 - acp).astype(np.float32)
    tsched = ddim_schedule(steps)
    # a/s at the *previous* (next-to-integrate) timestep; final step -> x0
    a_prev = np.concatenate([a_tab[tsched[1:]], [1.0]]).astype(np.float32)
    s_prev = np.concatenate([s_tab[tsched[1:]], [0.0]]).astype(np.float32)

    def sample(params, noise, embeds, pooled, time_ids):
        def body(x, sched):
            t, a_t, s_t, a_p, s_p = sched
            pred = unet_forward(
                params, x.astype(compute_dtype),
                jnp.full((x.shape[0],), t, jnp.float32),
                embeds, pooled, time_ids, cfg=cfg, attn_impl=attn_impl,
                compute_dtype=compute_dtype).astype(jnp.float32)
            if prediction_type == "v_prediction":
                x0 = a_t * x - s_t * pred
                eps = a_t * pred + s_t * x
            else:  # epsilon
                eps = pred
                x0 = (x - s_t * eps) / jnp.maximum(a_t, 1e-4)
            return a_p * x0 + s_p * eps, ()

        sched = (jnp.asarray(tsched, jnp.float32), jnp.asarray(a_tab[tsched]),
                 jnp.asarray(s_tab[tsched]), jnp.asarray(a_prev),
                 jnp.asarray(s_prev))
        x, _ = jax.lax.scan(body, noise.astype(jnp.float32), sched)
        return x

    return sample


def latents_to_pixels(decoder_params, latents, *, shift: float, scale: float,
                      compute_dtype=jnp.float32,
                      attn_impl: str = "xla") -> jax.Array:
    """Normalized-latent space -> uint8-ready pixels in [0, 1]."""
    from ..data.latent_norm import denormalize_scalar
    from ..models.sdxl import vae as vae_mod
    raw = denormalize_scalar(latents.astype(jnp.float32), shift, scale)
    px = vae_mod.decoder_forward(decoder_params, raw,
                                 compute_dtype=compute_dtype,
                                 attn_impl=attn_impl)
    return jnp.clip(px * 0.5 + 0.5, 0.0, 1.0)


def save_preview_png(path, pixels01) -> None:
    from PIL import Image
    arr = np.asarray(pixels01)
    if arr.ndim == 4:
        arr = arr[0]
    Image.fromarray((arr * 255.0 + 0.5).astype(np.uint8)).save(path)


class PreviewRenderer:
    """Owns the jitted sampler+decoder and the (fixed) conditioning taken
    from the first training batch, so successive previews show the same
    subject as training progresses."""

    def __init__(self, config, unet_cfg: UNetConfig, *, attn_impl: str,
                 compute_dtype, decoder_params):
        self.every = int(getattr(config, "PREVIEW_EVERY_N_STEPS", 0) or 0)
        steps = int(getattr(config, "PREVIEW_SAMPLE_STEPS", 20) or 20)
        norm_mode = str(getattr(config, "VAE_NORMALIZATION_MODE",
                                "scalar")).lower()
        if self.every > 0 and norm_mode != "scalar":
            # flux_bn32 latents are 32-channel (Flux-family VAE) — the SD
            # decoder cannot render them; fail loud rather than decode noise
            print(f"WARNING: preview sampling disabled: latent normalization "
                  f"mode '{norm_mode}' has no matching decoder path")
            decoder_params = None
        self.enabled = self.every > 0 and decoder_params is not None
        if not self.enabled:
            return
        self.shift = float(getattr(config, "VAE_SHIFT_FACTOR", None) or 0.0)
        self.scale = float(getattr(config, "VAE_SCALING_FACTOR", None)
                           or 0.13025)
        self.seed = int(config.SEED)
        self._decoder = decoder_params
        sampler = make_preview_sampler(
            unet_cfg, config.PREDICTION_TYPE, steps, attn_impl=attn_impl,
            compute_dtype=compute_dtype)

        def run(trainable, frozen, dec, noise, embeds, pooled, time_ids):
            params = {**frozen, **trainable}
            lat = sampler(params, noise, embeds, pooled, time_ids)
            return latents_to_pixels(dec, lat, shift=self.shift,
                                     scale=self.scale, attn_impl=attn_impl)

        self._run = jax.jit(run)
        self._cond = None

    def capture_conditioning(self, latents, embeds, pooled, time_ids) -> None:
        """Remember the first sample's conditioning + latent shape."""
        if not self.enabled or self._cond is not None:
            return
        self._cond = (tuple(latents.shape[1:]),
                      jnp.asarray(embeds[:1]), jnp.asarray(pooled[:1]),
                      jnp.asarray(time_ids[:1]))

    def maybe_render(self, optimizer_step: int, trainable, frozen,
                     output_dir) -> None:
        if (not self.enabled or self._cond is None
                or optimizer_step % self.every != 0):
            return
        from pathlib import Path
        try:
            shape, embeds, pooled, time_ids = self._cond
            noise = jax.random.normal(
                jax.random.fold_in(jax.random.PRNGKey(self.seed),
                                   1_000_000 + optimizer_step),
                (1,) + shape, jnp.float32)
            px = self._run(trainable, frozen, self._decoder, noise, embeds,
                           pooled, time_ids)
            out = Path(output_dir) / "previews"
            out.mkdir(parents=True, exist_ok=True)
            path = out / f"step_{optimizer_step}.png"
            save_preview_png(path, px)
            print(f"INFO: preview image saved -> {path}")
        except Exception as e:  # noqa: BLE001 — diagnostics must never
            # kill the training run (e.g. preview executable OOM on-chip)
            self.enabled = False
            print(f"WARNING: preview sampling disabled after failure: "
                  f"{type(e).__name__}: {e}")
