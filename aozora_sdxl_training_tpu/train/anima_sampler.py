"""Anima DiT in-training preview sampling (TPU extension).

Euler integration of the flow-matching ODE over the DiT: the model
predicts ``noise - x0`` at state ``x_t = (1-t) x0 + t noise`` with
conditioning ``t`` (the trainer feeds sigma in [0, 1], see
anima_objectives.ticket_to_sigma_timestep / anima_trainer loss_fn), so

    x_{t-dt} = x_t - dt * pred.

No VAE decoder exists for the Wan stack (the reference ships an
encode-only VAE, /root/reference/training_utils/anima/vae_encoder.py),
so previews are rendered as a latent-RGB visualization: first three
latent channels, per-channel min/max normalized, nearest-upscaled 8x.
That is enough to watch structure emerge / collapse mid-run.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..models.anima import dit as dit_mod


def make_anima_preview_sampler(cfg: dit_mod.AnimaDiTConfig, steps: int, *,
                               attn_impl: str = "xla",
                               compute_dtype=jnp.bfloat16):
    """Jittable ``sample(params, noise, prompt_emb, t5_ids) -> x0``.

    ``noise``: (B, T, H, W, C) — the training latent space."""
    n = max(int(steps), 1)
    ts = np.linspace(1.0, 0.0, n + 1).astype(np.float32)

    def sample(params, noise, prompt_emb, t5_ids):
        def body(x, i):
            t = jnp.asarray(ts)[i]
            dt = jnp.asarray(ts)[i] - jnp.asarray(ts)[i + 1]
            pred = dit_mod.dit_forward(
                params, x.astype(compute_dtype),
                jnp.full((x.shape[0],), t, jnp.float32),
                prompt_emb.astype(compute_dtype), cfg=cfg, t5_ids=t5_ids,
                attn_impl=attn_impl, compute_dtype=compute_dtype,
                remat=False)
            return x - dt * pred.astype(jnp.float32), ()

        x, _ = jax.lax.scan(body, noise.astype(jnp.float32), jnp.arange(n))
        return x

    return sample


def latents_to_rgb(latents, upscale: int = 8) -> np.ndarray:
    """(B, T, H, W, C) latents -> (H*u, W*u, 3) float in [0, 1] for the
    first batch item / first frame (per-channel min-max normalized)."""
    lat = np.asarray(latents, np.float32)
    frame = lat[0, 0] if lat.ndim == 5 else lat[0]
    rgb = frame[..., :3]
    if rgb.shape[-1] < 3:
        rgb = np.repeat(frame[..., :1], 3, axis=-1)
    lo = rgb.min(axis=(0, 1), keepdims=True)
    hi = rgb.max(axis=(0, 1), keepdims=True)
    rgb = (rgb - lo) / np.maximum(hi - lo, 1e-6)
    return np.repeat(np.repeat(rgb, upscale, axis=0), upscale, axis=1)


def load_decoder_for_preview(config):
    """(decoder_params, WanVaeConfig) from the configured VAE file, or None.

    Full Wan checkpoints carry the decoder half; the reference's stripped
    encode-only files do not — previews then fall back to latent-RGB."""
    from ..models.anima import wan_vae
    path = str(getattr(config, "DIT_VAE_PATH", "") or "")
    if not path:
        return None
    try:
        from ..ckpt.safetensors_io import load_all
        state = {k: np.asarray(v) for k, v in load_all(path).items()}
        dec = wan_vae.params_from_torch_state(state, include_decoder=True)
        if not any(k.startswith("decoder.") for k in dec):
            print("INFO: VAE file has no decoder tensors; previews render "
                  "latent-RGB")
            return None
        cfg = wan_vae.detect_config(dec)
        dec = {k: v for k, v in dec.items()
               if k.startswith(("decoder.", "conv2."))}
        return dec, cfg
    except Exception as e:  # noqa: BLE001 — preview is a diagnostic
        print(f"INFO: preview decoder unavailable ({type(e).__name__}: {e}); "
              "rendering latent-RGB")
        return None


class AnimaPreviewRenderer:
    """Mirrors train/sampler.PreviewRenderer for the DiT trainer.

    With decoder weights (full Wan VAE file) previews are real pixels;
    otherwise a latent-RGB visualization."""

    def __init__(self, config, dit_cfg, *, attn_impl: str, compute_dtype,
                 decoder=None):
        self.every = int(getattr(config, "ANIMA_PREVIEW_EVERY_N_STEPS", 0)
                         or 0)
        steps = int(getattr(config, "ANIMA_PREVIEW_SAMPLE_STEPS", 16) or 16)
        self.enabled = self.every > 0
        if not self.enabled:
            return
        self.seed = int(config.SEED)
        sampler = make_anima_preview_sampler(
            dit_cfg, steps, attn_impl=attn_impl, compute_dtype=compute_dtype)
        self._run = jax.jit(sampler)
        self._decode = None
        self._decode_video = None
        if decoder is not None:
            from ..models.anima import wan_vae
            dec_params, vae_cfg = decoder
            # decoder params as jit arguments (device_put once), not
            # closures — closed-over weights inline as HLO constants and
            # bloat the remote-compiled program
            dec_params = jax.device_put(dec_params)

            def decode(p, lat_bhwc):
                px = wan_vae.decode_image(p, lat_bhwc, cfg=vae_cfg)
                return jnp.clip(px * 0.5 + 0.5, 0.0, 1.0)

            _decode = jax.jit(decode)
            self._decode = lambda lat: _decode(dec_params, lat)
            # video-mode decode when the checkpoint carries the temporal
            # upsample kernels: preview the whole clip as a filmstrip
            if any(".time_conv." in k for k in dec_params):
                def decode_clip(p, lat_bthwc):
                    px = wan_vae.decode_video(p, lat_bthwc, cfg=vae_cfg)
                    return jnp.clip(px * 0.5 + 0.5, 0.0, 1.0)

                _decode_video = jax.jit(decode_clip)
                self._decode_video = lambda lat: _decode_video(dec_params, lat)
        self._cond = None

    def capture_conditioning(self, latents, prompt_emb, t5_ids) -> None:
        if not self.enabled or self._cond is not None:
            return
        shape = tuple(latents.shape[1:])
        if len(shape) == 3:  # image mode (H, W, C) -> (T=1, H, W, C)
            shape = (1,) + shape
        self._cond = (shape, jnp.asarray(prompt_emb[:1]),
                      jnp.asarray(t5_ids[:1]))

    def maybe_render(self, optimizer_step: int, params, output_dir) -> None:
        if (not self.enabled or self._cond is None
                or optimizer_step % self.every != 0):
            return
        from pathlib import Path

        from .sampler import save_preview_png
        try:
            shape, prompt_emb, t5_ids = self._cond
            noise = jax.random.normal(
                jax.random.fold_in(jax.random.PRNGKey(self.seed),
                                   2_000_000 + optimizer_step),
                (1,) + shape, jnp.float32)
            lat = self._run(params, noise, prompt_emb, t5_ids)
            out = Path(output_dir) / "previews"
            out.mkdir(parents=True, exist_ok=True)
            if self._decode_video is not None and lat.shape[1] > 1:
                px = np.asarray(self._decode_video(lat))  # (B, T, H, W, 3)
                # filmstrip: up to 5 evenly-spaced frames side by side
                t = px.shape[1]
                picks = sorted({0, t // 4, t // 2, 3 * t // 4, t - 1})
                strip = np.concatenate([px[0, i] for i in picks], axis=1)
                path = out / f"step_{optimizer_step}.png"
                save_preview_png(path, strip[None])
            elif self._decode is not None:
                px = self._decode(lat[:, 0])   # (B, T', H, W, C) first frame
                path = out / f"step_{optimizer_step}.png"
                save_preview_png(path, np.asarray(px))
            else:
                path = out / f"step_{optimizer_step}_latent.png"
                save_preview_png(path, latents_to_rgb(lat)[None])
            print(f"INFO: preview image saved -> {path}")
        except Exception as e:  # noqa: BLE001 — diagnostics must never
            # kill the training run
            self.enabled = False
            print(f"WARNING: preview sampling disabled after failure: "
                  f"{type(e).__name__}: {e}")
