"""Preview sampler (train/sampler.py): schedules, shapes, determinism."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from aozora_sdxl_training_tpu.models.sdxl.arch import TINY
from aozora_sdxl_training_tpu.models.sdxl.unet import init_params
from aozora_sdxl_training_tpu.train import sampler as sampler_mod


def test_ddim_schedule_endpoints():
    s = sampler_mod.ddim_schedule(20)
    assert s[0] == 999 and s[-1] == 0 and len(s) == 20
    assert (np.diff(s) < 0).all()


@pytest.fixture(scope="module")
def tiny_unet():
    return init_params(TINY, jax.random.PRNGKey(0))


@pytest.mark.parametrize("objective", ["epsilon", "v_prediction",
                                       "rectified_flow"])
def test_sampler_shapes_and_determinism(tiny_unet, objective):
    fn = sampler_mod.make_preview_sampler(TINY, objective, 4,
                                          compute_dtype=jnp.float32)
    b = 1
    noise = jax.random.normal(jax.random.PRNGKey(1), (b, 8, 8, 4))
    embeds = jnp.zeros((b, 7, TINY.cross_attention_dim))
    pooled = jnp.zeros((b, TINY.pooled_projection_dim))
    time_ids = jnp.ones((b, 6))
    x1 = fn(tiny_unet, noise, embeds, pooled, time_ids)
    x2 = fn(tiny_unet, noise, embeds, pooled, time_ids)
    assert x1.shape == noise.shape
    assert bool(jnp.isfinite(x1).all())
    np.testing.assert_array_equal(np.asarray(x1), np.asarray(x2))
    # the sampler must actually move the state
    assert not np.allclose(np.asarray(x1), np.asarray(noise))


def test_latents_to_pixels_range(tiny_unet):
    # decoder on a tiny synthesized VAE: output in [0, 1]
    from tests.test_clip_vae import _tiny_vae_sd_tensors
    from aozora_sdxl_training_tpu.models.sdxl import vae as vae_mod

    params = vae_mod.params_from_sd_state(_tiny_vae_sd_tensors(decoder=True),
                                          include_decoder=True)
    lat = jax.random.normal(jax.random.PRNGKey(2), (1, 8, 8, 4))
    px = sampler_mod.latents_to_pixels(params, lat, shift=0.0, scale=0.13025)
    assert px.shape == (1, 64, 64, 3)
    assert float(px.min()) >= 0.0 and float(px.max()) <= 1.0


def test_save_preview_png(tmp_path):
    img = np.random.default_rng(0).uniform(size=(1, 16, 16, 3))
    path = tmp_path / "p.png"
    sampler_mod.save_preview_png(path, img)
    from PIL import Image
    assert Image.open(path).size == (16, 16)


def test_anima_preview_sampler_and_latent_rgb():
    from aozora_sdxl_training_tpu.models.anima import dit as dit_mod
    from aozora_sdxl_training_tpu.train import anima_sampler as asamp

    cfg = dit_mod.TINY_ANIMA
    params = dit_mod.init_params(cfg, jax.random.PRNGKey(0))
    fn = asamp.make_anima_preview_sampler(cfg, 3, compute_dtype=jnp.float32)
    noise = jax.random.normal(jax.random.PRNGKey(1),
                              (1, 1, 8, 8, cfg.in_channels))
    prompt = jnp.zeros((1, 7, cfg.adapter_source_dim))
    t5 = jnp.ones((1, 7), jnp.int32)
    x = fn(params, noise, prompt, t5)
    assert x.shape == noise.shape
    assert bool(jnp.isfinite(x).all())
    assert not np.allclose(np.asarray(x), np.asarray(noise))

    rgb = asamp.latents_to_rgb(x, upscale=4)
    assert rgb.shape == (32, 32, 3)
    assert rgb.min() >= 0.0 and rgb.max() <= 1.0


def test_preview_renderer_cadence_and_self_disable(tmp_path, tiny_unet):
    from types import SimpleNamespace

    from tests.test_clip_vae import _tiny_vae_sd_tensors
    from aozora_sdxl_training_tpu.models.sdxl import vae as vae_mod
    from aozora_sdxl_training_tpu.train.sampler import PreviewRenderer

    dec = vae_mod.params_from_sd_state(_tiny_vae_sd_tensors(decoder=True),
                                       include_decoder=True)
    config = SimpleNamespace(PREVIEW_EVERY_N_STEPS=2, PREVIEW_SAMPLE_STEPS=2,
                             VAE_NORMALIZATION_MODE="scalar",
                             VAE_SHIFT_FACTOR=0.0, VAE_SCALING_FACTOR=0.13025,
                             SEED=3, PREDICTION_TYPE="v_prediction")
    r = PreviewRenderer(config, TINY, attn_impl="xla",
                        compute_dtype=jnp.float32, decoder_params=dec)
    assert r.enabled
    latents = jnp.zeros((2, 8, 8, 4))
    embeds = jnp.zeros((2, 7, TINY.cross_attention_dim))
    pooled = jnp.zeros((2, TINY.pooled_projection_dim))
    time_ids = jnp.ones((2, 6))
    r.capture_conditioning(latents, embeds, pooled, time_ids)

    trainable = tiny_unet
    r.maybe_render(1, trainable, {}, tmp_path)       # off-cadence: no file
    assert not (tmp_path / "previews").exists()
    r.maybe_render(2, trainable, {}, tmp_path)       # on-cadence: renders
    assert (tmp_path / "previews" / "step_2.png").exists()

    # a failing run disables previews instead of raising
    r._run = lambda *a, **k: (_ for _ in ()).throw(RuntimeError("boom"))
    r.maybe_render(4, trainable, {}, tmp_path)
    assert not r.enabled
    assert not (tmp_path / "previews" / "step_4.png").exists()

    # flux_bn32 normalization: loud disable at construction
    config2 = SimpleNamespace(**vars(config),)
    config2.VAE_NORMALIZATION_MODE = "flux_bn32"
    r2 = PreviewRenderer(config2, TINY, attn_impl="xla",
                         compute_dtype=jnp.float32, decoder_params=dec)
    assert not r2.enabled
