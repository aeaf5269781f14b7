"""Qwen3 text encoder and Wan VAE encoder tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from aozora_sdxl_training_tpu.models.anima import qwen3, wan_vae


# ---------------- Qwen3 ----------------

@pytest.fixture(scope="module")
def tiny_qwen():
    cfg = qwen3.TINY_QWEN3
    return cfg, qwen3.init_params(cfg, jax.random.PRNGKey(0))


def test_qwen3_forward_shape(tiny_qwen):
    cfg, params = tiny_qwen
    tokens = jnp.ones((2, 10), jnp.int32)
    out = qwen3.qwen3_forward(params, tokens, None, cfg)
    assert out.shape == (2, 10, cfg.hidden_size)
    assert bool(jnp.isfinite(out).all())


def test_qwen3_causality(tiny_qwen):
    cfg, params = tiny_qwen
    t1 = jnp.zeros((1, 8), jnp.int32)
    t2 = t1.at[0, 7].set(5)
    h1 = qwen3.qwen3_forward(params, t1, None, cfg)
    h2 = qwen3.qwen3_forward(params, t2, None, cfg)
    np.testing.assert_allclose(np.asarray(h1[0, :7]), np.asarray(h2[0, :7]),
                               rtol=1e-5, atol=1e-6)
    assert not np.allclose(np.asarray(h1[0, 7]), np.asarray(h2[0, 7]))


def test_qwen3_padding_mask(tiny_qwen):
    cfg, params = tiny_qwen
    tokens = jnp.asarray([[3, 4, 5, 0, 0, 0]], jnp.int32)
    mask = jnp.asarray([[1, 1, 1, 0, 0, 0]], jnp.int32)
    h_masked = qwen3.qwen3_forward(params, tokens, mask, cfg)
    # padded-out keys must not affect valid query positions
    tokens2 = jnp.asarray([[3, 4, 5, 9, 9, 9]], jnp.int32)
    h_masked2 = qwen3.qwen3_forward(params, tokens2, mask, cfg)
    np.testing.assert_allclose(np.asarray(h_masked[0, :3]),
                               np.asarray(h_masked2[0, :3]),
                               rtol=1e-5, atol=1e-6)


def test_qwen3_gqa_repeat(tiny_qwen):
    cfg, _ = tiny_qwen
    assert cfg.num_heads % cfg.num_kv_heads == 0
    shapes = qwen3.param_shapes(cfg)
    assert shapes["model.layers.0.self_attn.q_proj.weight"] == (
        cfg.hidden_size, cfg.num_heads * cfg.head_dim)
    assert shapes["model.layers.0.self_attn.k_proj.weight"] == (
        cfg.hidden_size, cfg.num_kv_heads * cfg.head_dim)


def test_qwen3_detect_config_and_load(tiny_qwen):
    cfg, params = tiny_qwen
    # build a torch-layout state (transposed 2D weights)
    state = {}
    for name, arr in params.items():
        a = np.asarray(arr)
        if a.ndim == 2 and name != "model.embed_tokens.weight":
            a = a.T
        state[name] = a
    detected = qwen3.detect_config(state)
    assert detected.hidden_size == cfg.hidden_size
    assert detected.num_layers == cfg.num_layers
    assert detected.num_kv_heads == cfg.num_kv_heads
    back = qwen3.params_from_torch_state(state, cfg)
    for k in params:
        np.testing.assert_array_equal(np.asarray(back[k]), np.asarray(params[k]))


def test_qwen3_base_config_is_0_6b():
    shapes = qwen3.param_shapes(qwen3.QWEN3_0_6B)
    total = sum(int(np.prod(s)) for s in shapes.values())
    # Qwen3-0.6B ~0.6e9 params (0.44B non-embedding + 155M embed)
    assert 5.5e8 < total < 7.5e8


# ---------------- Wan VAE ----------------

@pytest.fixture(scope="module")
def tiny_vae():
    cfg = wan_vae.TINY_WAN_VAE
    return cfg, wan_vae.init_params(cfg, jax.random.PRNGKey(1))


def test_wan_vae_encode_shape(tiny_vae):
    cfg, params = tiny_vae
    px = jax.random.normal(jax.random.PRNGKey(2), (1, 64, 64, 3)) * 0.5
    lat = wan_vae.encode_image(params, px, cfg=cfg)
    assert lat.shape == (1, 8, 8, cfg.z_dim)
    assert bool(jnp.isfinite(lat).all())


def test_wan_vae_normalization_applied(tiny_vae):
    cfg, params = tiny_vae
    px = jnp.zeros((1, 32, 32, 3))
    raw = wan_vae.encode_image(params, px, cfg=cfg, normalize=False)
    normed = wan_vae.encode_image(params, px, cfg=cfg, normalize=True)
    mean = wan_vae.LATENT_MEAN[: cfg.z_dim]
    std = wan_vae.LATENT_STD[: cfg.z_dim]
    np.testing.assert_allclose(
        np.asarray(normed), (np.asarray(raw) - mean) / std, rtol=1e-4,
        atol=1e-5)


def test_wan_vae_torch_state_load(tiny_vae):
    cfg, params = tiny_vae
    # synthesize torch layout: conv HWIO -> (O,I,kt,kh,kw) with 3 temporal
    # slices; only the last slice should be used
    rng = np.random.default_rng(3)
    state = {}
    for name, arr in params.items():
        a = np.asarray(arr)
        if name.endswith(".gamma"):
            state[f"model.{name}"] = a.reshape(a.shape[0], 1, 1)
        elif a.ndim == 4:  # HWIO -> OIHW -> add temporal axis
            oihw = np.transpose(a, (3, 2, 0, 1))
            kt = 3 if a.shape[0] == 3 else 1
            t_slices = [rng.normal(size=oihw.shape).astype(np.float32)
                        for _ in range(kt - 1)] + [oihw]
            state[f"model.{name}"] = np.stack(t_slices, axis=2)
        else:
            state[f"model.{name}"] = a
    # 2D convs in Resample stay 4D in torch
    for key in list(state):
        if ".resample.1.weight" in key:
            state[key] = state[key][:, :, -1]
    loaded = wan_vae.params_from_torch_state(state, cfg)
    for k in params:
        got = np.asarray(loaded[k])
        if got.ndim == 5:
            got = got[-1]  # image path consumes the last temporal slice
        np.testing.assert_allclose(got, np.asarray(params[k]), rtol=1e-6,
                                   err_msg=k)
    # image encode runs identically through full-3D kernels
    px = jnp.asarray(np.random.default_rng(9).normal(size=(1, 32, 32, 3)),
                     jnp.float32)
    np.testing.assert_allclose(
        np.asarray(wan_vae.encode_image(loaded, px, cfg=cfg)),
        np.asarray(wan_vae.encode_image(params, px, cfg=cfg)),
        rtol=1e-4, atol=1e-5)


def _video_params(cfg, seed=7):
    """Full causal-3D params: random temporal kernels incl. time_conv."""
    rng = np.random.default_rng(seed)
    params = {}
    for name, arr in wan_vae.init_params(cfg, jax.random.PRNGKey(seed)).items():
        a = np.asarray(arr)
        if a.ndim == 4 and a.shape[0] == 3 and ".resample." not in name:
            kt = np.stack([rng.normal(size=a.shape).astype(np.float32) * 0.02,
                           rng.normal(size=a.shape).astype(np.float32) * 0.02,
                           a], axis=0)
            params[name] = jnp.asarray(kt)
        else:
            params[name] = arr
    # time_conv for the two temporal downsample stages (layout indices)
    for kind, lname, in_dim, out_dim in wan_vae.encoder_layout(cfg):
        if kind == "down":
            params[f"encoder.{lname}.time_conv.weight"] = jnp.asarray(
                rng.normal(size=(3, 1, 1, out_dim, out_dim)).astype(np.float32)
                * 0.05)
            params[f"encoder.{lname}.time_conv.bias"] = jnp.zeros(
                out_dim, jnp.float32)
    return params


def test_video_encode_shapes(tiny_vae):
    cfg, _ = tiny_vae
    params = _video_params(cfg)
    vid = jax.random.normal(jax.random.PRNGKey(3), (1, 5, 32, 32, 3)) * 0.3
    lat = wan_vae.encode_video(params, vid, cfg=cfg)
    assert lat.shape == (1, (5 + 3) // 4, 4, 4, cfg.z_dim)
    assert bool(jnp.isfinite(lat).all())


def test_video_single_frame_matches_image(tiny_vae):
    cfg, _ = tiny_vae
    params = _video_params(cfg)
    px = jax.random.normal(jax.random.PRNGKey(4), (1, 32, 32, 3)) * 0.3
    img_lat = wan_vae.encode_image(params, px, cfg=cfg)
    vid_lat = wan_vae.encode_video(params, px[:, None], cfg=cfg)
    np.testing.assert_allclose(np.asarray(vid_lat[:, 0]), np.asarray(img_lat),
                               rtol=1e-4, atol=1e-5)


def test_video_encode_causal(tiny_vae):
    """Changing trailing frames must not affect the first latent frame."""
    cfg, _ = tiny_vae
    params = _video_params(cfg)
    v1 = jax.random.normal(jax.random.PRNGKey(5), (1, 5, 32, 32, 3)) * 0.3
    v2 = v1.at[:, 3:].set(0.0)
    l1 = wan_vae.encode_video(params, v1, cfg=cfg)
    l2 = wan_vae.encode_video(params, v2, cfg=cfg)
    np.testing.assert_allclose(np.asarray(l1[:, 0]), np.asarray(l2[:, 0]),
                               rtol=1e-4, atol=1e-5)
    assert not np.allclose(np.asarray(l1[:, 1]), np.asarray(l2[:, 1]))


def test_tile_tasks_cover_plane():
    # image equals one tile -> single task
    assert len(wan_vae.tile_tasks(768, 768, 768, 768, 576, 576)) == 1
    # 1024px with 768 tiles / 576 stride -> 2x2 overlapping tiles
    tasks = wan_vae.tile_tasks(1024, 1024, 768, 768, 576, 576)
    assert len(tasks) == 4
    covered = np.zeros((1024, 1024), bool)
    for top, bottom, left, right in tasks:
        covered[top:min(bottom, 1024), left:min(right, 1024)] = True
    assert covered.all()


def test_tiled_encode_matches_single_when_one_tile(tiny_vae):
    cfg, params = tiny_vae
    px = np.asarray(jax.random.normal(jax.random.PRNGKey(4), (1, 64, 64, 3)))
    single = np.asarray(wan_vae.encode_image(params, jnp.asarray(px), cfg=cfg))
    tiled = wan_vae.encode_image_tiled(params, px, cfg=cfg,
                                       tile_size=(8, 8), tile_stride=(8, 8))
    np.testing.assert_allclose(tiled, single, rtol=1e-4, atol=1e-5)


def test_tiled_encode_blends_overlaps(tiny_vae):
    cfg, params = tiny_vae
    px = np.asarray(jax.random.normal(jax.random.PRNGKey(5), (1, 128, 128, 3))) * 0.3
    tiled = wan_vae.encode_image_tiled(params, px, cfg=cfg,
                                       tile_size=(12, 12), tile_stride=(8, 8))
    assert tiled.shape == (1, 16, 16, cfg.z_dim)
    assert np.isfinite(tiled).all()


def test_wan_vae_detect_config(tiny_vae):
    cfg, params = tiny_vae
    det = wan_vae.detect_config(params)
    assert det.dim == cfg.dim
    assert det.z_dim == cfg.z_dim
    # default-size params detect back to WAN_VAE
    base = wan_vae.WAN_VAE
    fake = {"encoder.conv1.bias": np.zeros(base.dims[0]),
            "conv1.bias": np.zeros(2 * base.z_dim)}
    det2 = wan_vae.detect_config(fake)
    assert (det2.dim, det2.z_dim) == (base.dim, base.z_dim)


def test_wan_vae_encode_uses_detected_z_dim(tiny_vae):
    """Regression: a non-16-z VAE must normalize with its own z slice
    (caught by the Anima CLI verify drive: encode with the default WAN_VAE
    cfg broadcast (.., 2z) against 16 stats and crashed)."""
    cfg, params = tiny_vae
    det = wan_vae.detect_config(params)
    px = jax.random.normal(jax.random.PRNGKey(9), (1, 32, 32, 3)) * 0.5
    lat = wan_vae.encode_image(params, px, cfg=det)
    assert lat.shape == (1, 4, 4, cfg.z_dim)
    assert bool(jnp.isfinite(lat).all())


def test_wan_decoder_image_roundtrip_shapes():
    """Wan decoder (TPU extension; the reference's VAE is encode-only):
    normalized latents -> pixels at 8x spatial, and encode(decode(z))
    keeps the latent shape."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from aozora_sdxl_training_tpu.models.anima import wan_vae

    cfg = wan_vae.TINY_WAN_VAE
    dec = wan_vae.init_decoder_params(cfg, jax.random.PRNGKey(5))
    z = jnp.asarray(np.random.default_rng(6).normal(size=(1, 4, 4, cfg.z_dim)),
                    jnp.float32)
    px = wan_vae.decode_image(dec, z, cfg=cfg)
    assert px.shape == (1, 32, 32, 3)
    assert bool(jnp.isfinite(px).all())

    enc = wan_vae.init_params(cfg, jax.random.PRNGKey(7))
    z2 = wan_vae.encode_image(enc, px, cfg=cfg)
    assert z2.shape == z.shape

    # loader round trip: torch layout (OIHW / gamma broadcast) -> params
    torch_state = {}
    for name, arr in dec.items():
        a = np.asarray(arr)
        if a.ndim == 4:
            a = np.transpose(a, (3, 2, 0, 1))
        torch_state[f"model.{name}"] = a
    # encode-only load must still work and exclude decoder tensors
    for name, arr in enc.items():
        a = np.asarray(arr)
        if a.ndim == 4:
            a = np.transpose(a, (3, 2, 0, 1))
        torch_state[f"model.{name}"] = a
    enc_only = wan_vae.params_from_torch_state(torch_state, cfg)
    assert not any(k.startswith(("decoder.", "conv2.")) for k in enc_only)
    both = wan_vae.params_from_torch_state(torch_state, cfg,
                                           include_decoder=True)
    px2 = wan_vae.decode_image(both, z, cfg=cfg)
    np.testing.assert_allclose(np.asarray(px2), np.asarray(px), rtol=1e-5,
                               atol=1e-5)


def test_wan_decoder_layout_channel_contract():
    """The Resample halving / stage-width bookkeeping must be consistent:
    every layer's in_dim equals the previous layer's out_dim."""
    from aozora_sdxl_training_tpu.models.anima import wan_vae

    for cfg in (wan_vae.TINY_WAN_VAE, wan_vae.WAN_VAE):
        layout = wan_vae.decoder_layout(cfg)
        mults = [cfg.dim_mult[-1]] + list(reversed(cfg.dim_mult))
        prev_out = cfg.dim * mults[0]
        for kind, name, in_dim, out_dim in layout:
            assert in_dim == prev_out, (name, in_dim, prev_out)
            prev_out = out_dim
        assert prev_out == cfg.dim  # head operates at base width


def test_wan_decoder_video_mode():
    """Video-mode decode (TPU extension): T'=1+k latent frames -> 1+4k
    pixel frames (two temporal-doubling stages with frame-0 bypass), and a
    single-frame clip decodes identically to the image path (the causal
    temporal pad leaves only the last kernel slice active at T=1)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from aozora_sdxl_training_tpu.models.anima import wan_vae

    cfg = wan_vae.TINY_WAN_VAE
    dec = wan_vae.init_decoder_params(cfg, jax.random.PRNGKey(5), video=True)
    rng = np.random.default_rng(6)

    # frame arithmetic: T'=3 -> 2*3-1=5 -> 2*5-1=9 = 1+4(3-1)
    z = jnp.asarray(rng.normal(size=(1, 3, 4, 4, cfg.z_dim)), jnp.float32)
    px = wan_vae.decode_video(dec, z, cfg=cfg)
    assert px.shape == (1, 9, 32, 32, 3)
    assert bool(jnp.isfinite(px).all())

    # T'=1 collapses to the image decoder exactly
    z1 = jnp.asarray(rng.normal(size=(1, 1, 4, 4, cfg.z_dim)), jnp.float32)
    vid = wan_vae.decode_video(dec, z1, cfg=cfg)
    img = wan_vae.decode_image(dec, z1[:, 0], cfg=cfg)
    assert vid.shape == (1, 1, 32, 32, 3)
    np.testing.assert_allclose(np.asarray(vid[:, 0]), np.asarray(img),
                               rtol=2e-4, atol=2e-4)

    # image-mode init (no time_conv) fails loudly on multi-frame decode
    dec_img = wan_vae.init_decoder_params(cfg, jax.random.PRNGKey(5))
    with np.testing.assert_raises(ValueError):
        wan_vae.decode_video(dec_img, z, cfg=cfg)

    # video round trip: decode -> encode keeps the latent clip shape
    enc = wan_vae.init_params(cfg, jax.random.PRNGKey(7), video=True)
    z2 = wan_vae.encode_video(enc, px, cfg=cfg)
    assert z2.shape == z.shape
