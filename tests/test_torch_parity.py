"""Primitive-level parity vs torch: the semantics checkpoint compat rests on.

The reference trains through torch ops; our JAX primitives must match them
numerically (padding placement, normalization axes, activation variants),
otherwise loaded checkpoints silently drift.  torch (CPU) is available in
the image, so these are direct A/B tests.
"""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from aozora_sdxl_training_tpu.models.sdxl import unet as unet_mod
from aozora_sdxl_training_tpu.models.sdxl import vae as vae_mod


def _np(x):
    return np.asarray(x, dtype=np.float32)


def test_conv2d_stride2_matches_torch():
    """Stride-2 3x3 conv with torch's symmetric padding — NOT XLA 'SAME'."""
    rng = np.random.default_rng(0)
    x = rng.normal(size=(1, 8, 8, 6)).astype(np.float32)
    w = rng.normal(size=(4, 6, 3, 3)).astype(np.float32)  # torch OIHW
    b = rng.normal(size=(4,)).astype(np.float32)
    params = {"c.weight": jnp.asarray(w.transpose(2, 3, 1, 0)),
              "c.bias": jnp.asarray(b)}
    ours = unet_mod.conv2d(params, "c", jnp.asarray(x), stride=2)
    ref = F.conv2d(torch.from_numpy(x.transpose(0, 3, 1, 2)),
                   torch.from_numpy(w), torch.from_numpy(b),
                   stride=2, padding=1)
    np.testing.assert_allclose(_np(ours), ref.numpy().transpose(0, 2, 3, 1),
                               rtol=1e-4, atol=1e-5)


def test_group_norm_matches_torch():
    rng = np.random.default_rng(1)
    x = rng.normal(size=(2, 4, 4, 8)).astype(np.float32)
    scale = rng.normal(size=(8,)).astype(np.float32)
    bias = rng.normal(size=(8,)).astype(np.float32)
    params = {"n.weight": jnp.asarray(scale), "n.bias": jnp.asarray(bias)}
    ours = unet_mod.group_norm(params, "n", jnp.asarray(x), groups=4)
    ref = F.group_norm(torch.from_numpy(x.transpose(0, 3, 1, 2)), 4,
                       torch.from_numpy(scale), torch.from_numpy(bias),
                       eps=1e-5)
    np.testing.assert_allclose(_np(ours), ref.numpy().transpose(0, 2, 3, 1),
                               rtol=1e-4, atol=1e-5)


def test_layer_norm_matches_torch():
    rng = np.random.default_rng(2)
    x = rng.normal(size=(2, 5, 16)).astype(np.float32)
    scale = rng.normal(size=(16,)).astype(np.float32)
    bias = rng.normal(size=(16,)).astype(np.float32)
    params = {"n.weight": jnp.asarray(scale), "n.bias": jnp.asarray(bias)}
    ours = unet_mod.layer_norm(params, "n", jnp.asarray(x))
    ref = F.layer_norm(torch.from_numpy(x), (16,), torch.from_numpy(scale),
                       torch.from_numpy(bias), eps=1e-5)
    np.testing.assert_allclose(_np(ours), ref.numpy(), rtol=1e-4, atol=1e-5)


def test_upsample_nearest_matches_torch():
    rng = np.random.default_rng(3)
    x = rng.normal(size=(1, 3, 5, 2)).astype(np.float32)
    ours = unet_mod.upsample_nearest_2x(jnp.asarray(x))
    ref = F.interpolate(torch.from_numpy(x.transpose(0, 3, 1, 2)),
                        scale_factor=2, mode="nearest")
    np.testing.assert_array_equal(_np(ours),
                                  ref.numpy().transpose(0, 2, 3, 1))


def test_timestep_embedding_matches_diffusers_formula():
    """flip_sin_to_cos=True, downscale_freq_shift=0 (diffusers convention)."""
    import math
    t = torch.tensor([0.0, 1.0, 500.0, 999.0])
    dim, half = 320, 160
    exponent = -math.log(10000) * torch.arange(half, dtype=torch.float32) / half
    emb = t[:, None] * torch.exp(exponent)[None]
    ref = torch.cat([torch.cos(emb), torch.sin(emb)], dim=-1)  # flipped
    ours = unet_mod.timestep_embedding(jnp.asarray(t.numpy()), dim)
    # fp32 trig at large angles (t=999 x freq) differs in the last ulps
    np.testing.assert_allclose(_np(ours), ref.numpy(), rtol=1e-4, atol=1e-4)


def test_gelu_exact_matches_torch():
    x = np.linspace(-4, 4, 101, dtype=np.float32)
    ours = jax.nn.gelu(jnp.asarray(x), approximate=False)
    ref = F.gelu(torch.from_numpy(x))  # torch default = exact erf
    np.testing.assert_allclose(_np(ours), ref.numpy(), rtol=1e-5, atol=1e-6)


def test_quick_gelu_matches_clip():
    from aozora_sdxl_training_tpu.models.sdxl.clip import _activation
    x = np.linspace(-4, 4, 101, dtype=np.float32)
    ours = _activation("quick_gelu", jnp.asarray(x))
    ref = torch.from_numpy(x) * torch.sigmoid(1.702 * torch.from_numpy(x))
    np.testing.assert_allclose(_np(ours), ref.numpy(), rtol=1e-5, atol=1e-6)


def test_vae_downsample_padding_matches_torch():
    """SD VAE downsample: asymmetric (0,1) pad then valid stride-2 conv."""
    rng = np.random.default_rng(4)
    x = rng.normal(size=(1, 8, 8, 4)).astype(np.float32)
    w = rng.normal(size=(4, 4, 3, 3)).astype(np.float32)
    b = np.zeros(4, np.float32)
    params = {"d.weight": jnp.asarray(w.transpose(2, 3, 1, 0)),
              "d.bias": jnp.asarray(b)}
    ours = vae_mod._conv(params, "d", jnp.asarray(x), stride=2,
                         pad=((0, 1), (0, 1)))
    xt = torch.from_numpy(x.transpose(0, 3, 1, 2))
    xt = F.pad(xt, (0, 1, 0, 1))
    ref = F.conv2d(xt, torch.from_numpy(w), torch.from_numpy(b), stride=2)
    np.testing.assert_allclose(_np(ours), ref.numpy().transpose(0, 2, 3, 1),
                               rtol=1e-4, atol=1e-5)


def test_rms_norm_matches_torch():
    from aozora_sdxl_training_tpu.models.anima.dit import _rms_norm
    rng = np.random.default_rng(5)
    x = rng.normal(size=(2, 7, 32)).astype(np.float32)
    w = rng.normal(size=(32,)).astype(np.float32)
    params = {"n.weight": jnp.asarray(w)}
    ours = _rms_norm(params, "n", jnp.asarray(x))
    ref = F.rms_norm(torch.from_numpy(x), (32,), torch.from_numpy(w), eps=1e-6)
    np.testing.assert_allclose(_np(ours), ref.numpy(), rtol=1e-4, atol=1e-5)


def test_wan_channel_rms_norm_matches_torch():
    from aozora_sdxl_training_tpu.models.anima.wan_vae import _channel_rms_norm
    rng = np.random.default_rng(6)
    x = rng.normal(size=(2, 4, 4, 8)).astype(np.float32)
    gamma = rng.normal(size=(8,)).astype(np.float32)
    params = {"n.gamma": jnp.asarray(gamma)}
    ours = _channel_rms_norm(params, "n", jnp.asarray(x))
    # reference: F.normalize(x, dim=1) * sqrt(C) * gamma (channel-first)
    xt = torch.from_numpy(x.transpose(0, 3, 1, 2))
    ref = F.normalize(xt, dim=1) * (8 ** 0.5) \
        * torch.from_numpy(gamma).view(1, 8, 1, 1)
    np.testing.assert_allclose(_np(ours), ref.numpy().transpose(0, 2, 3, 1),
                               rtol=1e-4, atol=1e-5)


def test_circular_pad_matches_torch():
    from aozora_sdxl_training_tpu.models.anima.dit import pad_to_patch_size
    rng = np.random.default_rng(7)
    x = rng.normal(size=(1, 1, 5, 7, 3)).astype(np.float32)
    ours = pad_to_patch_size(jnp.asarray(x), 1, 2)  # pads H 5->6, W 7->8
    xt = torch.from_numpy(x[:, 0].transpose(0, 3, 1, 2))  # NCHW
    ref = F.pad(xt, (0, 1, 0, 1), mode="circular")
    np.testing.assert_allclose(_np(ours[:, 0]),
                               ref.numpy().transpose(0, 2, 3, 1),
                               rtol=1e-6)
