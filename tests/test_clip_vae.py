"""CLIP text towers and VAE encoder: shapes, causality, loader round-trips."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from aozora_sdxl_training_tpu.models.sdxl import clip as clip_mod
from aozora_sdxl_training_tpu.models.sdxl import vae as vae_mod


@pytest.fixture(scope="module")
def tiny_clip():
    cfg = clip_mod.TINY_CLIP
    params = clip_mod.init_clip_params(cfg, jax.random.PRNGKey(0))
    return cfg, params


def test_clip_forward_shapes(tiny_clip):
    cfg, params = tiny_clip
    tokens = jnp.ones((2, cfg.max_length), jnp.int32)
    hidden, pooled = clip_mod.clip_text_forward(params, tokens, cfg)
    assert hidden.shape == (2, cfg.max_length, cfg.width)
    assert pooled.shape == (2, cfg.projection_dim)


def test_clip_causality(tiny_clip):
    """Changing a later token must not affect earlier hidden states."""
    cfg, params = tiny_clip
    t1 = jnp.zeros((1, cfg.max_length), jnp.int32)
    t2 = t1.at[0, cfg.max_length - 1].set(5)
    h1, _ = clip_mod.clip_text_forward(params, t1, cfg)
    h2, _ = clip_mod.clip_text_forward(params, t2, cfg)
    np.testing.assert_allclose(np.asarray(h1[0, : cfg.max_length - 1]),
                               np.asarray(h2[0, : cfg.max_length - 1]),
                               rtol=1e-5, atol=1e-6)
    assert not np.allclose(np.asarray(h1[0, -1]), np.asarray(h2[0, -1]))


def test_clip_pooled_uses_eos_position(tiny_clip):
    cfg, params = tiny_clip
    base = jnp.full((1, cfg.max_length), 3, jnp.int32)
    t1 = base.at[0, 4].set(cfg.eos_token_id)
    t2 = base.at[0, 10].set(cfg.eos_token_id)
    _, p1 = clip_mod.clip_text_forward(params, t1, cfg)
    _, p2 = clip_mod.clip_text_forward(params, t2, cfg)
    assert not np.allclose(np.asarray(p1), np.asarray(p2))


def test_clip_penultimate_differs_from_last(tiny_clip):
    cfg, params = tiny_clip
    tokens = jnp.arange(cfg.max_length, dtype=jnp.int32)[None] % cfg.vocab_size
    hidden, _ = clip_mod.clip_text_forward(params, tokens, cfg)
    # run a deeper manual pass to get the final-layer output for comparison
    x = params["token_embedding"][tokens] + params["position_embedding"][None]
    for i in range(cfg.num_layers):
        x = clip_mod._encoder_layer(params, f"layers.{i}", x, cfg)
    assert not np.allclose(np.asarray(hidden), np.asarray(x))


def _openclip_like_sd_tensors(cfg):
    """Synthesize an OpenCLIP-format tensor dict for loader testing."""
    rng = np.random.default_rng(0)
    p = clip_mod.CLIP_BIGG_PREFIX
    t = {
        f"{p}token_embedding.weight": rng.normal(size=(cfg.vocab_size, cfg.width)).astype(np.float32),
        f"{p}positional_embedding": rng.normal(size=(cfg.max_length, cfg.width)).astype(np.float32),
        f"{p}ln_final.weight": np.ones(cfg.width, np.float32),
        f"{p}ln_final.bias": np.zeros(cfg.width, np.float32),
        f"{p}text_projection": rng.normal(size=(cfg.width, cfg.projection_dim)).astype(np.float32),
    }
    for i in range(cfg.num_layers):
        src = f"{p}transformer.resblocks.{i}."
        t[f"{src}ln_1.weight"] = np.ones(cfg.width, np.float32)
        t[f"{src}ln_1.bias"] = np.zeros(cfg.width, np.float32)
        t[f"{src}ln_2.weight"] = np.ones(cfg.width, np.float32)
        t[f"{src}ln_2.bias"] = np.zeros(cfg.width, np.float32)
        t[f"{src}attn.in_proj_weight"] = rng.normal(size=(3 * cfg.width, cfg.width)).astype(np.float32)
        t[f"{src}attn.in_proj_bias"] = rng.normal(size=(3 * cfg.width,)).astype(np.float32)
        t[f"{src}attn.out_proj.weight"] = rng.normal(size=(cfg.width, cfg.width)).astype(np.float32)
        t[f"{src}attn.out_proj.bias"] = np.zeros(cfg.width, np.float32)
        t[f"{src}mlp.c_fc.weight"] = rng.normal(size=(cfg.width * 4, cfg.width)).astype(np.float32)
        t[f"{src}mlp.c_fc.bias"] = np.zeros(cfg.width * 4, np.float32)
        t[f"{src}mlp.c_proj.weight"] = rng.normal(size=(cfg.width, cfg.width * 4)).astype(np.float32)
        t[f"{src}mlp.c_proj.bias"] = np.zeros(cfg.width, np.float32)
    return t


def test_bigg_loader_in_proj_split():
    cfg = clip_mod.TINY_CLIP
    sd = _openclip_like_sd_tensors(cfg)
    params = clip_mod.clip_bigg_params_from_sd(sd, num_layers=cfg.num_layers)
    p = clip_mod.CLIP_BIGG_PREFIX
    in_w = sd[f"{p}transformer.resblocks.0.attn.in_proj_weight"]
    d = cfg.width
    np.testing.assert_array_equal(np.asarray(params["layers.0.attn.q.weight"]),
                                  in_w[:d].T)
    np.testing.assert_array_equal(np.asarray(params["layers.0.attn.v.weight"]),
                                  in_w[2 * d:].T)
    # loaded params run
    tokens = jnp.ones((1, cfg.max_length), jnp.int32)
    hidden, pooled = clip_mod.clip_text_forward(params, tokens, cfg)
    assert hidden.shape == (1, cfg.max_length, cfg.width)
    assert pooled is not None


# ---------------- VAE ----------------

def _tiny_vae_sd_tensors(ch=(8, 8, 16, 16), z=4, decoder=False):
    """Synthesize a small SD-format VAE encoder tensor dict."""
    rng = np.random.default_rng(1)
    t = {}

    def conv(name, cin, cout, k):
        t[f"first_stage_model.{name}.weight"] = (
            rng.normal(size=(cout, cin, k, k)).astype(np.float32) * 0.05)
        t[f"first_stage_model.{name}.bias"] = np.zeros(cout, np.float32)

    def norm(name, c):
        t[f"first_stage_model.{name}.weight"] = np.ones(c, np.float32)
        t[f"first_stage_model.{name}.bias"] = np.zeros(c, np.float32)

    conv("encoder.conv_in", 3, ch[0], 3)
    cin = ch[0]
    for i, cout in enumerate(ch):
        for j in range(2):
            rin = cin if j == 0 else cout
            norm(f"encoder.down.{i}.block.{j}.norm1", rin)
            conv(f"encoder.down.{i}.block.{j}.conv1", rin, cout, 3)
            norm(f"encoder.down.{i}.block.{j}.norm2", cout)
            conv(f"encoder.down.{i}.block.{j}.conv2", cout, cout, 3)
            if rin != cout:
                conv(f"encoder.down.{i}.block.{j}.nin_shortcut", rin, cout, 1)
        if i < len(ch) - 1:
            conv(f"encoder.down.{i}.downsample.conv", cout, cout, 3)
        cin = cout
    c = ch[-1]
    for blk in ("block_1", "block_2"):
        norm(f"encoder.mid.{blk}.norm1", c)
        conv(f"encoder.mid.{blk}.conv1", c, c, 3)
        norm(f"encoder.mid.{blk}.norm2", c)
        conv(f"encoder.mid.{blk}.conv2", c, c, 3)
    norm("encoder.mid.attn_1.norm", c)
    for proj in ("q", "k", "v", "proj_out"):
        conv(f"encoder.mid.attn_1.{proj}", c, c, 1)
    norm("encoder.norm_out", c)
    conv("encoder.conv_out", c, 2 * z, 3)
    conv("quant_conv", 2 * z, 2 * z, 1)
    if not decoder:
        return t

    # CompVis decoder: conv_in z->ch[-1], mid, up stages indexed by level
    # (applied reversed), 3 resnets per stage, upsample on levels != 0
    conv("post_quant_conv", z, z, 1)
    conv("decoder.conv_in", z, ch[-1], 3)
    for blk in ("block_1", "block_2"):
        norm(f"decoder.mid.{blk}.norm1", ch[-1])
        conv(f"decoder.mid.{blk}.conv1", ch[-1], ch[-1], 3)
        norm(f"decoder.mid.{blk}.norm2", ch[-1])
        conv(f"decoder.mid.{blk}.conv2", ch[-1], ch[-1], 3)
    norm("decoder.mid.attn_1.norm", ch[-1])
    for proj in ("q", "k", "v", "proj_out"):
        conv(f"decoder.mid.attn_1.{proj}", ch[-1], ch[-1], 1)
    cin = ch[-1]
    for i in reversed(range(len(ch))):
        cout = ch[i]
        for j in range(3):
            rin = cin if j == 0 else cout
            norm(f"decoder.up.{i}.block.{j}.norm1", rin)
            conv(f"decoder.up.{i}.block.{j}.conv1", rin, cout, 3)
            norm(f"decoder.up.{i}.block.{j}.norm2", cout)
            conv(f"decoder.up.{i}.block.{j}.conv2", cout, cout, 3)
            if rin != cout:
                conv(f"decoder.up.{i}.block.{j}.nin_shortcut", rin, cout, 1)
        if i != 0:
            conv(f"decoder.up.{i}.upsample.conv", cout, cout, 3)
        cin = cout
    norm("decoder.norm_out", cin)
    conv("decoder.conv_out", cin, 3, 3)
    return t


def test_vae_encoder_shapes_and_downsampling():
    sd = _tiny_vae_sd_tensors()
    params = vae_mod.params_from_sd_state(sd)
    pixels = jnp.zeros((1, 64, 64, 3))
    lat = vae_mod.encoder_forward(params, pixels)
    assert lat.shape == (1, 8, 8, 4)  # /8 spatial, z=4 mean channels
    assert bool(jnp.isfinite(lat).all())


def test_vae_latent_channel_detection():
    sd = _tiny_vae_sd_tensors(z=4)
    assert vae_mod.detect_latent_channels(sd) == 4
    assert vae_mod.detect_latent_channels({}) is None


def test_vae_group_norm_uses_32_groups_on_small_channels():
    # channels must divide groups in real SDXL (128..512, all /32);
    # the tiny test config uses 8..16 channels so groups are clamped by c.
    sd = _tiny_vae_sd_tensors()
    params = vae_mod.params_from_sd_state(sd)
    assert "encoder.conv_in.weight" in params
    assert params["encoder.conv_in.weight"].shape == (3, 3, 3, 8)  # HWIO


def test_vae_decoder_roundtrip_shapes():
    """Decoder (TPU extension for preview sampling): raw latents ->
    pixels at 8x spatial, finite output, and encoder keys still load when
    the decoder rides along."""
    sd = _tiny_vae_sd_tensors(decoder=True)
    params = vae_mod.params_from_sd_state(sd, include_decoder=True)
    lat = jnp.asarray(np.random.default_rng(3).normal(size=(1, 8, 8, 4)),
                      jnp.float32)
    px = vae_mod.decoder_forward(params, lat)
    assert px.shape == (1, 64, 64, 3)
    assert bool(jnp.isfinite(px).all())
    # encode -> decode round trip runs end-to-end at matching shapes
    enc = vae_mod.encoder_forward(params, px)
    assert enc.shape == lat.shape
    # encoder-only load still refuses decoder-less checkpoints for preview
    sd_enc = _tiny_vae_sd_tensors()
    with pytest.raises(ValueError):
        vae_mod.params_from_sd_state(sd_enc, include_decoder=True)
