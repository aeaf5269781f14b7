"""Flash-attention kernel vs XLA reference (forward + gradients).

Runs in Pallas interpreter mode on CPU (conftest forces JAX_PLATFORMS=cpu,
where pallas_call falls back to interpret semantics via force flag)."""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental.pallas import tpu as pltpu

from aozora_sdxl_training_tpu.ops.attention import dot_product_attention_xla
from aozora_sdxl_training_tpu.ops.flash_attention import flash_attention


def _rand(key, shape):
    return jax.random.normal(jax.random.PRNGKey(key), shape, jnp.float32)


@pytest.mark.parametrize("sq,skv", [
    (256, 256),    # self-attention, exact block fit
    (160, 160),    # self-attention with padding
    (256, 77),     # SDXL cross-attention (short KV)
])
def test_flash_matches_xla_forward(sq, skv):
    b, h, d = 1, 2, 64
    q = _rand(0, (b, sq, h, d))
    k = _rand(1, (b, skv, h, d))
    v = _rand(2, (b, skv, h, d))
    with pltpu.force_tpu_interpret_mode():
        out = flash_attention(q, k, v)
    ref = dot_product_attention_xla(q, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)


def test_flash_gradients_match_xla():
    b, sq, skv, h, d = 1, 256, 128, 2, 64
    q = _rand(3, (b, sq, h, d))
    k = _rand(4, (b, skv, h, d))
    v = _rand(5, (b, skv, h, d))
    tangent = _rand(6, (b, sq, h, d))

    def loss_flash(q, k, v):
        with pltpu.force_tpu_interpret_mode():
            return jnp.sum(flash_attention(q, k, v) * tangent)

    def loss_ref(q, k, v):
        return jnp.sum(dot_product_attention_xla(q, k, v) * tangent)

    g_flash = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for gf, gr, name in zip(g_flash, g_ref, "qkv"):
        np.testing.assert_allclose(np.asarray(gf), np.asarray(gr),
                                   rtol=5e-4, atol=5e-4, err_msg=name)


def test_flash_gradients_with_kv_padding():
    # KV length 77 forces mask handling in all three kernels
    b, sq, skv, h, d = 1, 128, 77, 1, 64
    q = _rand(7, (b, sq, h, d))
    k = _rand(8, (b, skv, h, d))
    v = _rand(9, (b, skv, h, d))

    def loss_flash(q, k, v):
        with pltpu.force_tpu_interpret_mode():
            return jnp.sum(flash_attention(q, k, v) ** 2)

    def loss_ref(q, k, v):
        return jnp.sum(dot_product_attention_xla(q, k, v) ** 2)

    g_flash = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for gf, gr, name in zip(g_flash, g_ref, "qkv"):
        np.testing.assert_allclose(np.asarray(gf), np.asarray(gr),
                                   rtol=5e-4, atol=5e-4, err_msg=name)


def test_flash_bf16_inputs():
    b, sq, skv, h, d = 1, 256, 256, 2, 64
    q = _rand(10, (b, sq, h, d)).astype(jnp.bfloat16)
    k = _rand(11, (b, skv, h, d)).astype(jnp.bfloat16)
    v = _rand(12, (b, skv, h, d)).astype(jnp.bfloat16)
    with pltpu.force_tpu_interpret_mode():
        out = flash_attention(q, k, v)
    assert out.dtype == jnp.bfloat16
    ref = dot_product_attention_xla(q, k, v)
    np.testing.assert_allclose(
        np.asarray(out, dtype=np.float32), np.asarray(ref, dtype=np.float32),
        rtol=2e-2, atol=2e-2)


def test_flash_head_dim_128_anima_shape():
    """Anima DiT uses head_dim 128 (full MXU lanes)."""
    b, sq, skv, h, d = 1, 256, 256, 2, 128
    q = _rand(20, (b, sq, h, d))
    k = _rand(21, (b, skv, h, d))
    v = _rand(22, (b, skv, h, d))
    out = flash_attention(q, k, v)
    ref = dot_product_attention_xla(q, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)


def test_flash_grads_under_remat_named_save_policy():
    """Under jax.checkpoint with the dots_no_logits policy (which saves the
    named flash_out/flash_lse kernel outputs), gradients must equal the
    un-checkpointed ones — the saved-residual fast path is numerics-neutral."""
    from aozora_sdxl_training_tpu.models.sdxl.unet import (
        dots_except_attention_logits)
    from aozora_sdxl_training_tpu.ops.flash_attention import flash_attention

    key = jax.random.PRNGKey(0)
    q = jax.random.normal(key, (1, 256, 2, 64), jnp.float32)
    k = jax.random.normal(jax.random.fold_in(key, 1), (1, 384, 2, 64),
                          jnp.float32)
    v = jax.random.normal(jax.random.fold_in(key, 2), (1, 384, 2, 64),
                          jnp.float32)

    def loss(q, k, v):
        return jnp.sum(flash_attention(q, k, v) ** 2)

    g_plain = jax.grad(loss, argnums=(0, 1, 2))(q, k, v)
    g_remat = jax.grad(
        jax.checkpoint(loss, policy=dots_except_attention_logits),
        argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g_plain, g_remat):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6)


def test_dispatch_threshold_routes_short_kv_to_xla(monkeypatch):
    """attention(impl="flash") only invokes the Pallas kernel at
    KV >= FLASH_MIN_KV (measured e2e optimum 2048 on v5e); below, XLA's
    fused path wins and must be used."""
    from aozora_sdxl_training_tpu.ops import attention as attn_mod

    calls = []

    def fake_flash(q, k, v, *, scale=None):
        calls.append(k.shape[1])
        return dot_product_attention_xla(q, k, v, scale=scale)

    import aozora_sdxl_training_tpu.ops.flash_attention as fa
    monkeypatch.setattr(fa, "flash_attention", fake_flash)
    monkeypatch.setenv("AOZORA_FLASH_MIN_KV", "2048")

    q = _rand(0, (1, 2048, 2, 64))
    for skv, expect_flash in ((77, False), (512, False), (2048, True)):
        kv = _rand(1, (1, skv, 2, 64))
        calls.clear()
        attn_mod.attention(q, kv, kv, impl="flash")
        assert (len(calls) == 1) == expect_flash, (skv, calls)
    # impl="xla" never dispatches the kernel
    calls.clear()
    attn_mod.attention(q, _rand(1, (1, 4096, 2, 64)),
                       _rand(2, (1, 4096, 2, 64)), impl="xla")
    assert not calls


def test_folded_layout_matches_legacy_forward_and_grads():
    """Lane-aligned head_dim (d=128) dispatches the folded no-transpose
    path; it must match the legacy (BH, S, D) path exactly."""
    from aozora_sdxl_training_tpu.ops import flash_attention as fa

    b, sq, skv, h, d = 1, 256, 160, 2, 128
    q = _rand(10, (b, sq, h, d))
    k = _rand(11, (b, skv, h, d))
    v = _rand(12, (b, skv, h, d))

    def legacy(q, k, v):
        block_q, block_k = fa._pick_blocks(sq, skv)
        sq_p, sk_p = fa._round_up(sq, block_q), fa._round_up(skv, block_k)

        def to3(x, s_pad):
            x = jnp.transpose(x, (0, 2, 1, 3)).reshape(b * h, x.shape[1], d)
            return jnp.pad(x, ((0, 0), (0, s_pad - x.shape[1]), (0, 0)))

        out, _ = fa._flash_core(to3(q, sq_p), to3(k, sk_p), to3(v, sk_p),
                                d ** -0.5, skv, (block_q, block_k))
        return jnp.transpose(out[:, :sq].reshape(b, h, sq, d), (0, 2, 1, 3))

    with pltpu.force_tpu_interpret_mode():
        out_folded = flash_attention(q, k, v)
        out_legacy = legacy(q, k, v)
        np.testing.assert_allclose(np.asarray(out_folded),
                                   np.asarray(out_legacy), rtol=1e-5,
                                   atol=1e-5)

        def loss_f(q, k, v):
            return jnp.sum(flash_attention(q, k, v).astype(jnp.float32) ** 2)

        def loss_l(q, k, v):
            return jnp.sum(legacy(q, k, v).astype(jnp.float32) ** 2)

        gf = jax.grad(loss_f, argnums=(0, 1, 2))(q, k, v)
        gl = jax.grad(loss_l, argnums=(0, 1, 2))(q, k, v)
        for a, bb in zip(gf, gl):
            np.testing.assert_allclose(np.asarray(a), np.asarray(bb),
                                       rtol=2e-4, atol=2e-4)
    # xla reference too
    ref = dot_product_attention_xla(q, k, v)
    np.testing.assert_allclose(np.asarray(out_folded), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)
