"""Anima DiT: shapes, patchify round-trip, RoPE tables, adapter, loaders."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from aozora_sdxl_training_tpu.models.anima import dit


CFG = dit.TINY_ANIMA


@pytest.fixture(scope="module")
def tiny():
    return CFG, dit.init_params(CFG, jax.random.PRNGKey(0))


def test_patchify_roundtrip():
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 2, 4, 6, 5))
    p = dit.patchify(x, 1, 2)
    assert p.shape == (2, 2, 2, 3, 5 * 4)
    # unpatchify uses a different feature ordering (p1 p2 t C vs c r m n),
    # so round-trip needs a permutation — just check shape inversion:
    u = dit.unpatchify(p, 1, 2, 20 // 4)
    assert u.shape == x.shape


def test_patchify_feature_order():
    """Feature index must be ((c*r + ri)*m + mi)*n + ni (reference layout)."""
    b, t, h, w, c = 1, 1, 2, 2, 3
    x = jnp.arange(b * t * h * w * c, dtype=jnp.float32).reshape(b, t, h, w, c)
    p = dit.patchify(x, 1, 2)  # -> (1, 1, 1, 1, 12)
    flat = np.asarray(p).reshape(-1)
    expect = []
    for ci in range(c):
        for mi in range(2):
            for ni in range(2):
                expect.append(float(x[0, 0, mi, ni, ci]))
    np.testing.assert_array_equal(flat, np.asarray(expect, np.float32))


def test_pad_to_patch_size_circular():
    x = jnp.arange(6, dtype=jnp.float32).reshape(1, 1, 2, 3, 1)
    padded = dit.pad_to_patch_size(x, 1, 2)
    assert padded.shape == (1, 1, 2, 4, 1)
    # wrap mode: new column equals column 0
    np.testing.assert_array_equal(np.asarray(padded[0, 0, :, 3, 0]),
                                  np.asarray(x[0, 0, :, 0, 0]))


def test_rope_tables_shapes_and_range():
    cos, sin = dit.rope_3d_tables(dit.ANIMA_BASE, 2, 4, 6)
    assert cos.shape == (2 * 4 * 6, dit.ANIMA_BASE.head_dim // 2)
    assert np.all(np.abs(np.asarray(cos)) <= 1.0)
    # position 0 has angle 0 everywhere
    np.testing.assert_allclose(np.asarray(cos[0]), 1.0, atol=1e-6)
    np.testing.assert_allclose(np.asarray(sin[0]), 0.0, atol=1e-6)


def test_rope_application_preserves_norm():
    cfg = CFG
    x = jax.random.normal(jax.random.PRNGKey(2), (1, 8, cfg.num_heads, cfg.head_dim))
    cos, sin = dit.rope_3d_tables(cfg, 1, 2, 4)
    y = dit.apply_rope_halfsplit(x, cos, sin)
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(x), axis=-1),
        np.linalg.norm(np.asarray(y), axis=-1), rtol=1e-4)


def test_dit_forward_shapes(tiny):
    cfg, params = tiny
    b, t, h, w = 1, 1, 6, 6  # odd-ish spatial (pads to 6x6 /2 = 3x3 grid)
    lat = jax.random.normal(jax.random.PRNGKey(3), (b, t, h, w, cfg.in_channels))
    ctx = jax.random.normal(jax.random.PRNGKey(4),
                            (b, 8, cfg.adapter_source_dim))
    t5 = jnp.ones((b, 8), jnp.int32)
    out = dit.dit_forward(params, lat, jnp.array([500.0]), ctx, cfg=cfg,
                          t5_ids=t5, compute_dtype=jnp.float32, remat=False)
    assert out.shape == (b, t, h, w, cfg.out_channels)
    assert bool(jnp.isfinite(out).all())


def test_dit_forward_odd_size_crops(tiny):
    cfg, params = tiny
    lat = jax.random.normal(jax.random.PRNGKey(5), (1, 1, 5, 7, cfg.in_channels))
    ctx = jnp.zeros((1, 4, cfg.crossattn_emb_channels))
    out = dit.dit_forward(params, lat, jnp.array([10.0]), ctx, cfg=cfg,
                          compute_dtype=jnp.float32, remat=False)
    assert out.shape == (1, 1, 5, 7, cfg.out_channels)


def test_adapter_pads_to_context_tokens(tiny):
    cfg, params = tiny
    src = jax.random.normal(jax.random.PRNGKey(6), (1, 5, cfg.adapter_source_dim))
    ids = jnp.ones((1, 6), jnp.int32)
    out = dit.preprocess_text_embeds(params, src, ids, cfg)
    assert out.shape == (1, cfg.context_tokens, cfg.adapter_target_dim)
    # rows beyond the adapter length are zero padding
    np.testing.assert_allclose(np.asarray(out[0, 6:]), 0.0, atol=1e-6)


def test_torch_state_roundtrip(tiny):
    cfg, params = tiny
    torch_state = dit.params_to_torch_state(params)
    back = dit.params_from_torch_state(torch_state, cfg)
    assert set(back) == set(params)
    for k in params:
        np.testing.assert_array_equal(np.asarray(back[k]), np.asarray(params[k]))


def test_torch_state_missing_raises(tiny):
    cfg, params = tiny
    torch_state = dit.params_to_torch_state(params)
    torch_state.pop("t_embedding_norm.weight")
    with pytest.raises(ValueError, match="missing"):
        dit.params_from_torch_state(torch_state, cfg)


def test_base_config_param_count():
    shapes = dit.param_shapes(dit.ANIMA_BASE)
    total = sum(int(np.prod(s)) for s in shapes.values())
    # ~2.0B-class DiT (28 blocks x 2048) + 6-layer adapter; sanity band
    assert 1.9e9 < total < 2.4e9
    # head_dim must split 2/6 rule cleanly for rope
    assert dit.ANIMA_BASE.head_dim == 128


def test_gradients_flow_through_adapter(tiny):
    cfg, params = tiny
    lat = jax.random.normal(jax.random.PRNGKey(7), (1, 1, 4, 4, cfg.in_channels))
    ctx = jax.random.normal(jax.random.PRNGKey(8), (1, 4, cfg.adapter_source_dim))
    ids = jnp.ones((1, 4), jnp.int32)

    def loss(p):
        out = dit.dit_forward(p, lat, jnp.array([100.0]), ctx, cfg=cfg,
                              t5_ids=ids, compute_dtype=jnp.float32,
                              remat=True)
        return jnp.mean(out ** 2)

    grads = jax.grad(loss)(params)
    adapter_grads = [v for k, v in grads.items() if k.startswith("llm_adapter.")
                     and float(jnp.abs(v).max()) > 0]
    assert len(adapter_grads) > 10  # the adapter trains inside the DiT fwd


def test_remat_modes_gradients_match(tiny):
    """Full / Conservative (save-mlp_down policy) / Off remat are pure
    memory tradeoffs — gradients must match."""
    cfg, params = tiny
    lat = jax.random.normal(jax.random.PRNGKey(9), (1, 1, 4, 4, cfg.in_channels))
    ctx = jax.random.normal(jax.random.PRNGKey(10), (1, 4, cfg.adapter_source_dim))
    ids = jnp.ones((1, 4), jnp.int32)

    def loss(p, mode):
        out = dit.dit_forward(p, lat, jnp.array([100.0]), ctx, cfg=cfg,
                              t5_ids=ids, compute_dtype=jnp.float32,
                              remat=mode)
        return jnp.mean(out ** 2)

    g_ref = jax.grad(lambda p: loss(p, False))(params)
    for mode in (True, "conservative"):
        g = jax.grad(lambda p, m=mode: loss(p, m))(params)
        for key in ("blocks.0.mlp.layer1.weight",
                    "llm_adapter.embed.weight"):
            np.testing.assert_allclose(np.asarray(g[key]), np.asarray(g_ref[key]),
                                       rtol=1e-4, atol=1e-6,
                                       err_msg=f"{mode}:{key}")
