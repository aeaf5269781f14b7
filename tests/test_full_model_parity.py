"""Full-forward numeric parity: JAX models vs independent torch twins.

SURVEY §4 "Model parity": primitive tests can't catch wiring bugs (skip
order, chunk order, norm epsilons), so these tests run the ENTIRE forward
of the TINY configs against hand-built torch twins (diffusers /
reference-architecture semantics, torch CPU) on identical weights and
assert logit closeness at fp32.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from aozora_sdxl_training_tpu.models.sdxl.arch import TINY
from aozora_sdxl_training_tpu.models.sdxl.unet import init_params, unet_forward

from tests.torch_twin_sdxl import TwinUNet, load_diffusers_state


def jax_params_to_diffusers_state(params: dict) -> dict:
    """Flat JAX param dict (conv HWIO, linear (in,out)) -> torch layouts."""
    out = {}
    for name, arr in params.items():
        a = np.asarray(arr, np.float32)
        if a.ndim == 4:         # conv HWIO -> OIHW
            a = a.transpose(3, 2, 0, 1)
        elif a.ndim == 2:       # linear (in, out) -> (out, in)
            a = a.T
        out[name] = np.ascontiguousarray(a)
    return out


def test_sdxl_unet_full_forward_matches_torch_twin():
    cfg = TINY
    params = init_params(cfg, jax.random.PRNGKey(0), dtype=jnp.float32)
    # break the zero-bias / unit-scale symmetry so mis-wired biases and norm
    # scales can't hide
    rng = np.random.default_rng(123)
    params = {
        k: (jnp.asarray(np.asarray(v)
                        + rng.normal(scale=0.05, size=v.shape)
                        .astype(np.float32)))
        for k, v in params.items()
    }

    twin = TwinUNet(cfg)
    load_diffusers_state(twin, jax_params_to_diffusers_state(params))
    twin.eval()

    b, hw = 2, 16
    latents = rng.normal(size=(b, hw, hw, cfg.in_channels)).astype(np.float32)
    timesteps = np.asarray([17.0, 900.0], np.float32)
    embeds = rng.normal(size=(b, 7, cfg.cross_attention_dim)).astype(np.float32)
    pooled = rng.normal(size=(b, cfg.pooled_projection_dim)).astype(np.float32)
    time_ids = np.asarray([[512, 512, 0, 0, 512, 512],
                           [768, 512, 32, 16, 704, 512]], np.float32)

    got = np.asarray(unet_forward(
        params, jnp.asarray(latents), jnp.asarray(timesteps),
        jnp.asarray(embeds), jnp.asarray(pooled), jnp.asarray(time_ids),
        cfg=cfg, attn_impl="xla", compute_dtype=jnp.float32, remat=False))

    with torch.no_grad():
        expected = twin(
            torch.from_numpy(latents).permute(0, 3, 1, 2),
            torch.from_numpy(timesteps),
            torch.from_numpy(embeds),
            torch.from_numpy(pooled),
            torch.from_numpy(time_ids),
        ).permute(0, 2, 3, 1).numpy()

    assert got.shape == expected.shape
    np.testing.assert_allclose(got, expected, rtol=2e-4, atol=2e-5)


def test_sdxl_unet_parity_holds_under_remat_and_bf16():
    """The remat'd bf16 path (the one training actually runs) must agree
    with the torch twin within bf16 tolerance."""
    cfg = TINY
    params = init_params(cfg, jax.random.PRNGKey(1), dtype=jnp.float32)
    rng = np.random.default_rng(7)
    params = {
        k: jnp.asarray(np.asarray(v)
                       + rng.normal(scale=0.05, size=v.shape)
                       .astype(np.float32))
        for k, v in params.items()
    }
    twin = TwinUNet(cfg)
    load_diffusers_state(twin, jax_params_to_diffusers_state(params))
    twin.eval()

    b, hw = 1, 16
    latents = rng.normal(size=(b, hw, hw, cfg.in_channels)).astype(np.float32)
    timesteps = np.asarray([500.0], np.float32)
    embeds = rng.normal(size=(b, 7, cfg.cross_attention_dim)).astype(np.float32)
    pooled = rng.normal(size=(b, cfg.pooled_projection_dim)).astype(np.float32)
    time_ids = np.asarray([[1024, 1024, 0, 0, 1024, 1024]], np.float32)

    got = np.asarray(unet_forward(
        params, jnp.asarray(latents), jnp.asarray(timesteps),
        jnp.asarray(embeds), jnp.asarray(pooled), jnp.asarray(time_ids),
        cfg=cfg, attn_impl="xla", compute_dtype=jnp.bfloat16,
        remat=True), np.float32)
    with torch.no_grad():
        expected = twin(
            torch.from_numpy(latents).permute(0, 3, 1, 2),
            torch.from_numpy(timesteps), torch.from_numpy(embeds),
            torch.from_numpy(pooled), torch.from_numpy(time_ids),
        ).permute(0, 2, 3, 1).numpy()
    # bf16 activations: ~3 decimal digits; wiring bugs blow far past this
    err = np.abs(got - expected)
    scale = np.maximum(np.abs(expected), 1.0)
    assert float((err / scale).max()) < 0.08
    assert float((err / scale).mean()) < 0.02


def test_anima_dit_full_forward_matches_torch_twin():
    """Full DiT forward (adapter + 3D RoPE + AdaLN-LoRA blocks + final
    layer) vs the independent torch twin, including the circular-pad path
    (odd spatial size) and T>1 temporal tokens."""
    from aozora_sdxl_training_tpu.models.anima import dit as dit_mod
    from tests.torch_twin_anima import TwinAnimaDiT, load_anima_state

    cfg = dit_mod.TINY_ANIMA
    params = dit_mod.init_params(cfg, jax.random.PRNGKey(3))
    rng = np.random.default_rng(11)
    params = {
        k: jnp.asarray(np.asarray(v)
                       + rng.normal(scale=0.03, size=v.shape)
                       .astype(np.float32))
        for k, v in params.items()
    }
    twin = TwinAnimaDiT(cfg)
    load_anima_state(twin, {k: np.ascontiguousarray(np.asarray(v))
                            for k, v in
                            dit_mod.params_to_torch_state(params).items()})
    twin.eval()

    b, t, h, w = 2, 2, 5, 6  # odd H exercises the circular pad
    latents = rng.normal(size=(b, t, h, w, cfg.in_channels)).astype(np.float32)
    timesteps = np.asarray([0.25, 0.9], np.float32)
    prompt = rng.normal(size=(b, 12, cfg.adapter_source_dim)).astype(np.float32)
    t5 = rng.integers(1, cfg.adapter_vocab, size=(b, 12)).astype(np.int32)

    got = np.asarray(dit_mod.dit_forward(
        params, jnp.asarray(latents), jnp.asarray(timesteps),
        jnp.asarray(prompt), cfg=cfg, t5_ids=jnp.asarray(t5),
        attn_impl="xla", compute_dtype=jnp.float32, remat=False))

    with torch.no_grad():
        expected = twin(
            torch.from_numpy(latents).permute(0, 4, 1, 2, 3),
            torch.from_numpy(timesteps),
            torch.from_numpy(prompt),
            torch.from_numpy(t5.astype(np.int64)),
        ).permute(0, 2, 3, 4, 1).numpy()

    assert got.shape == expected.shape
    np.testing.assert_allclose(got, expected, rtol=2e-4, atol=2e-5)
