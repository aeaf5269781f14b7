"""T>1 Anima video training path (TPU extension beyond the reference's
image-mode trainer): clip decoding, causal-VAE frame contract, cache
invalidation, and the 5-D flow-matching micro step."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from PIL import Image

from aozora_sdxl_training_tpu.data.image_prep import (
    clip_frame_count,
    load_clip_for_bucket,
)
from aozora_sdxl_training_tpu.models.anima import dit as dit_mod


def test_clip_frame_count_rounds_to_causal_contract():
    assert [clip_frame_count(n) for n in (1, 2, 4, 5, 8, 9, 16, 17)] == \
        [1, 1, 1, 5, 5, 9, 13, 17]


def test_load_clip_decodes_animated_gif_with_cyclic_fill(tmp_path):
    frames = []
    rng = np.random.default_rng(0)
    for _ in range(3):  # 3 frames < requested 5 -> cyclic fill
        frames.append(Image.fromarray(
            rng.integers(0, 255, (20, 24, 3), dtype=np.uint8)))
    gif = tmp_path / "clip.gif"
    frames[0].save(gif, save_all=True, append_images=frames[1:], loop=0)

    meta = {"ip": gif, "target_resolution": (16, 16)}
    clip = load_clip_for_bucket(meta, 5)
    assert clip.shape == (5, 16, 16, 3)
    assert clip.dtype == np.float32
    assert clip.min() >= -1.0 and clip.max() <= 1.0
    # frames loop: 3, 4 repeat 0, 1
    np.testing.assert_array_equal(clip[3], clip[0])
    np.testing.assert_array_equal(clip[4], clip[1])
    # a still image yields a constant clip
    png = tmp_path / "still.png"
    frames[0].save(png)
    still = load_clip_for_bucket({"ip": png, "target_resolution": (16, 16)}, 5)
    np.testing.assert_array_equal(still[0], still[4])


def test_video_frames_invalidate_latent_cache():
    from types import SimpleNamespace

    from aozora_sdxl_training_tpu.data import anima_cache as ac

    base = SimpleNamespace(
        CAPTION_SOURCE_TYPE="txt", CAPTION_CHUNKING_ENABLED=False,
        MAX_BUCKET_RESOLUTION=1024, SHOULD_UPSCALE=False,
        MULTI_BUCKET_ENABLED=False, MULTI_BUCKET_EXTRA_BUCKETS=0,
        TEXT_CACHE_PRECISION="bfloat16", VAE_CACHE_PRECISION="bfloat16",
        VAE_NORMALIZATION_MODE="scalar", VAE_SHIFT_FACTOR=None,
        VAE_SCALING_FACTOR=None, VAE_LATENT_CHANNELS=None,
        PREDICTION_TYPE="v_prediction")
    img_opts = ac.anima_cache_options(base)
    vid = SimpleNamespace(**vars(base), ANIMA_VIDEO_FRAMES=9)
    vid_opts = ac.anima_cache_options(vid)
    assert vid_opts["video_frames"] == 9
    assert "video_frames" not in img_opts
    assert ac._latent_match(img_opts, img_opts)
    assert not ac._latent_match(img_opts, vid_opts)
    assert ac._latent_match(vid_opts, dict(vid_opts))


def test_video_micro_step_trains_5d_latents():
    from aozora_sdxl_training_tpu.train.anima_trainer import (
        make_anima_micro_step)

    cfg = dit_mod.TINY_ANIMA
    params = dit_mod.init_params(cfg, jax.random.PRNGKey(0))
    micro = make_anima_micro_step(cfg, grad_accum_steps=1,
                                  compute_dtype=jnp.float32,
                                  attn_impl="xla", remat=False)
    rng = np.random.default_rng(0)
    b, t = 2, 2  # latent T' = 2 (from a 5-frame clip)
    latents = jnp.asarray(
        rng.normal(size=(b, t, 8, 8, cfg.in_channels)).astype(np.float32))
    prompt = jnp.asarray(
        rng.normal(size=(b, 12, cfg.adapter_source_dim)).astype(np.float32))
    t5 = jnp.asarray(rng.integers(1, cfg.adapter_vocab, (b, 12)), jnp.int32)
    grad_accum = jax.tree.map(lambda p: jnp.zeros(p.shape, jnp.float32),
                              params)
    loss, sigma0, accum = jax.jit(micro)(
        params, {}, grad_accum, latents, prompt, t5,
        jnp.asarray([100, 800], jnp.int32), jnp.ones((b,), jnp.float32),
        None, jnp.ones(1000, jnp.float32), jnp.asarray(7, jnp.int32),
        jnp.asarray(1, jnp.int32), jnp.asarray(0.0, jnp.float32))
    assert np.isfinite(float(loss))
    gsum = sum(float(jnp.sum(jnp.abs(g))) for g in jax.tree.leaves(accum))
    assert gsum > 0


def test_encode_video_then_video_loss_shapes():
    """Wan VAE video encode feeds the DiT video path end-to-end (shape
    contract: T=1+4k frames -> T'=1+k latents)."""
    from aozora_sdxl_training_tpu.models.anima import wan_vae

    cfg = wan_vae.TINY_WAN_VAE
    params = wan_vae.init_params(cfg, jax.random.PRNGKey(1), video=True)
    video = jnp.asarray(np.random.default_rng(2).uniform(
        -1, 1, (1, 5, 32, 32, 3)).astype(np.float32))
    lat = wan_vae.encode_video(params, video, cfg=cfg)
    assert lat.shape == (1, 2, 4, 4, cfg.z_dim)
    # image-mode init stays video-free (loader parity: a checkpoint without
    # time_conv weights must fail loudly in video mode, tested above)
    img_params = wan_vae.init_params(cfg, jax.random.PRNGKey(1))
    assert not any("time_conv" in k for k in img_params)
