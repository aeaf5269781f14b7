"""UNet structure, forward shape, and SD key-mapping tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from aozora_sdxl_training_tpu.ckpt.sd_keys import (
    hf_to_sd_name,
    sd_to_hf_mapping,
    unet_key_mapping,
)
from aozora_sdxl_training_tpu.models.sdxl import arch
from aozora_sdxl_training_tpu.models.sdxl.conversion import (
    params_from_sd_state,
    sd_state_from_params,
)
from aozora_sdxl_training_tpu.models.sdxl.unet import (
    count_params,
    init_params,
    unet_forward,
)


def test_sdxl_base_param_count():
    shapes = arch.param_shapes(arch.SDXL_BASE)
    total = sum(int(np.prod(s)) for s, _ in shapes.values())
    # diffusers SDXL UNet2DConditionModel: 2,567,463,684 parameters
    assert total == 2_567_463_684


def test_sdxl_key_count_matches_diffusers():
    # diffusers SDXL UNet state_dict has 1680 tensors
    assert len(arch.hf_param_names(arch.SDXL_BASE)) == 1680


KEY_GOLDEN = [
    # (hf, sd) pairs covering every structural rule, from the SD ecosystem's
    # well-known SDXL conversion tables.
    ("time_embedding.linear_1.weight", "model.diffusion_model.time_embed.0.weight"),
    ("time_embedding.linear_2.bias", "model.diffusion_model.time_embed.2.bias"),
    ("add_embedding.linear_1.weight", "model.diffusion_model.label_emb.0.0.weight"),
    ("add_embedding.linear_2.bias", "model.diffusion_model.label_emb.0.2.bias"),
    ("conv_in.weight", "model.diffusion_model.input_blocks.0.0.weight"),
    ("conv_norm_out.weight", "model.diffusion_model.out.0.weight"),
    ("conv_out.bias", "model.diffusion_model.out.2.bias"),
    ("down_blocks.0.resnets.0.norm1.weight",
     "model.diffusion_model.input_blocks.1.0.in_layers.0.weight"),
    ("down_blocks.0.resnets.1.conv2.weight",
     "model.diffusion_model.input_blocks.2.0.out_layers.3.weight"),
    ("down_blocks.1.resnets.0.conv_shortcut.weight",
     "model.diffusion_model.input_blocks.4.0.skip_connection.weight"),
    ("down_blocks.1.resnets.0.time_emb_proj.weight",
     "model.diffusion_model.input_blocks.4.0.emb_layers.1.weight"),
    ("down_blocks.1.attentions.0.transformer_blocks.0.attn1.to_q.weight",
     "model.diffusion_model.input_blocks.4.1.transformer_blocks.0.attn1.to_q.weight"),
    ("down_blocks.2.attentions.1.proj_out.weight",
     "model.diffusion_model.input_blocks.8.1.proj_out.weight"),
    ("down_blocks.0.downsamplers.0.conv.weight",
     "model.diffusion_model.input_blocks.3.0.op.weight"),
    ("down_blocks.1.downsamplers.0.conv.weight",
     "model.diffusion_model.input_blocks.6.0.op.weight"),
    ("mid_block.resnets.0.conv1.weight",
     "model.diffusion_model.middle_block.0.in_layers.2.weight"),
    ("mid_block.resnets.1.norm2.bias",
     "model.diffusion_model.middle_block.2.out_layers.0.bias"),
    ("mid_block.attentions.0.transformer_blocks.9.ff.net.2.weight",
     "model.diffusion_model.middle_block.1.transformer_blocks.9.ff.net.2.weight"),
    ("up_blocks.0.resnets.0.conv1.weight",
     "model.diffusion_model.output_blocks.0.0.in_layers.2.weight"),
    ("up_blocks.0.resnets.2.conv_shortcut.weight",
     "model.diffusion_model.output_blocks.2.0.skip_connection.weight"),
    ("up_blocks.0.attentions.1.norm.weight",
     "model.diffusion_model.output_blocks.1.1.norm.weight"),
    # SDXL quirk: up-block-0 upsampler at SD module index 2 (block has attns)
    ("up_blocks.0.upsamplers.0.conv.weight",
     "model.diffusion_model.output_blocks.2.2.conv.weight"),
    ("up_blocks.1.upsamplers.0.conv.weight",
     "model.diffusion_model.output_blocks.5.2.conv.weight"),
    ("up_blocks.2.resnets.2.norm1.weight",
     "model.diffusion_model.output_blocks.8.0.in_layers.0.weight"),
]


def test_hf_to_sd_golden_pairs():
    for hf, sd in KEY_GOLDEN:
        assert hf_to_sd_name(hf) == sd, hf


def test_mapping_is_bijective():
    names = arch.hf_param_names(arch.SDXL_BASE)
    fwd = unet_key_mapping(names)
    assert len(set(fwd.values())) == len(names)
    inv = sd_to_hf_mapping(names)
    assert all(inv[sd] == hf for hf, sd in fwd.items())


@pytest.fixture(scope="module")
def tiny_setup():
    cfg = arch.TINY
    params = init_params(cfg, jax.random.PRNGKey(0))
    return cfg, params


def test_tiny_forward_shapes(tiny_setup):
    cfg, params = tiny_setup
    b, h, w = 2, 8, 12
    out = unet_forward(
        params,
        jnp.zeros((b, h, w, 4)),
        jnp.array([10.0, 500.0]),
        jnp.zeros((b, 7, cfg.cross_attention_dim)),
        jnp.zeros((b, cfg.pooled_projection_dim)),
        jnp.zeros((b, 6)),
        cfg=cfg, compute_dtype=jnp.float32)
    assert out.shape == (b, h, w, 4)
    assert bool(jnp.isfinite(out).all())


def test_tiny_forward_remat_matches(tiny_setup):
    cfg, params = tiny_setup
    b, h, w = 1, 8, 8
    args = (
        jax.random.normal(jax.random.PRNGKey(1), (b, h, w, 4)),
        jnp.array([100.0]),
        jax.random.normal(jax.random.PRNGKey(2), (b, 7, cfg.cross_attention_dim)),
        jax.random.normal(jax.random.PRNGKey(3), (b, cfg.pooled_projection_dim)),
        jnp.ones((b, 6)),
    )
    out_a = unet_forward(params, *args, cfg=cfg, compute_dtype=jnp.float32,
                         remat=False)
    out_b = unet_forward(params, *args, cfg=cfg, compute_dtype=jnp.float32,
                         remat=True)
    np.testing.assert_allclose(np.asarray(out_a), np.asarray(out_b),
                               rtol=1e-5, atol=1e-5)


def test_tiny_gradients_flow(tiny_setup):
    cfg, params = tiny_setup
    b, h, w = 1, 8, 8
    x = jax.random.normal(jax.random.PRNGKey(4), (b, h, w, 4))

    def loss_fn(p):
        out = unet_forward(
            p, x, jnp.array([10.0]),
            jnp.ones((b, 7, cfg.cross_attention_dim)) * 0.1,
            jnp.ones((b, cfg.pooled_projection_dim)) * 0.1,
            jnp.ones((b, 6)),
            cfg=cfg, compute_dtype=jnp.float32, remat=True)
        return jnp.mean(out.astype(jnp.float32) ** 2)

    grads = jax.grad(loss_fn)(params)
    assert set(grads.keys()) == set(params.keys())
    nonzero = sum(1 for g in grads.values() if float(jnp.abs(g).max()) > 0)
    assert nonzero > len(grads) * 0.95


def test_conversion_roundtrip(tiny_setup):
    cfg, params = tiny_setup
    sd_state = sd_state_from_params(params, cfg, dtype=jnp.float32)
    assert all(k.startswith("model.diffusion_model.") for k in sd_state)
    back = params_from_sd_state(sd_state, cfg, dtype=jnp.float32)
    assert set(back.keys()) == set(params.keys())
    for name in params:
        np.testing.assert_array_equal(np.asarray(back[name]),
                                      np.asarray(params[name]))


def test_conversion_missing_key_raises(tiny_setup):
    cfg, params = tiny_setup
    sd_state = sd_state_from_params(params, cfg, dtype=jnp.float32)
    sd_state.pop("model.diffusion_model.input_blocks.0.0.weight")
    with pytest.raises(ValueError, match="missing"):
        params_from_sd_state(sd_state, cfg)


def test_remat_policy_gradients_match(tiny_setup):
    """All remat modes are pure memory/time tradeoffs — gradients must be
    identical. Also exercises the dots_no_logits square-dot refusal policy
    directly at real SDXL logit shapes."""
    from aozora_sdxl_training_tpu.models.sdxl.unet import (
        dots_except_attention_logits,
    )

    cfg, params = tiny_setup
    b, h, w = 1, 8, 8
    args = (
        jax.random.normal(jax.random.PRNGKey(4), (b, h, w, 4)),
        jnp.array([250.0]),
        jax.random.normal(jax.random.PRNGKey(5), (b, 7, cfg.cross_attention_dim)),
        jax.random.normal(jax.random.PRNGKey(6), (b, cfg.pooled_projection_dim)),
        jnp.ones((b, 6)),
    )

    def loss(params, mode):
        out = unet_forward(params, *args, cfg=cfg, compute_dtype=jnp.float32,
                           remat=mode)
        return jnp.sum(out ** 2)

    g_ref = jax.grad(lambda p: loss(p, False))(params)
    for mode in (True, "dots", "dots_no_logits"):
        g = jax.grad(lambda p: loss(p, mode))(params)
        for key in ("conv_in.weight",
                    "mid_block.attentions.0.transformer_blocks.0.attn1.to_q.weight"):
            np.testing.assert_allclose(np.asarray(g[key]), np.asarray(g_ref[key]),
                                       rtol=1e-4, atol=1e-5,
                                       err_msg=f"{mode}:{key}")

    # policy unit behavior: refuse big square dots, keep everything else
    class _Aval:
        def __init__(self, shape):
            self.shape = shape

    dn_attn = (((3,), (3,)), ((0, 1), (0, 1)))  # (B,H,S,D)x(B,H,S,D)->(B,H,S,S)
    big = dots_except_attention_logits(
        jax.lax.dot_general_p, _Aval((1, 10, 4096, 64)), _Aval((1, 10, 4096, 64)),
        dimension_numbers=dn_attn)
    assert big is False
    small = dots_except_attention_logits(
        jax.lax.dot_general_p, _Aval((1, 2, 64, 16)), _Aval((1, 2, 64, 16)),
        dimension_numbers=dn_attn)
    assert small is True
    cross = dots_except_attention_logits(
        jax.lax.dot_general_p, _Aval((1, 10, 4096, 64)), _Aval((1, 10, 77, 64)),
        dimension_numbers=dn_attn)
    assert cross is True
    conv = dots_except_attention_logits(jax.lax.conv_general_dilated_p)
    assert conv is True


def test_hires_mixed_remat_matches_plain_gradients():
    """'dots_no_logits_hires' (remat only the big high-res units) must be
    numerics-neutral vs no remat."""
    import jax
    import jax.numpy as jnp

    cfg = arch.TINY
    params = init_params(cfg, jax.random.PRNGKey(0))
    key = jax.random.PRNGKey(1)
    # 40x40 latents: top level (40x40=1600 tokens) remats, deeper levels
    # (20x20, 10x10) stay resident under the 33x33 threshold
    latents = jax.random.normal(key, (1, 40, 40, 4), jnp.float32)
    embeds = jax.random.normal(jax.random.fold_in(key, 1),
                               (1, 7, cfg.cross_attention_dim), jnp.float32)
    pooled = jax.random.normal(jax.random.fold_in(key, 2),
                               (1, cfg.pooled_projection_dim), jnp.float32)
    time_ids = jnp.ones((1, 6), jnp.float32)

    def loss(params, mode):
        out = unet_forward(params, latents, jnp.asarray([3.0]), embeds,
                           pooled, time_ids, cfg=cfg, attn_impl="xla",
                           compute_dtype=jnp.float32, remat=mode)
        return jnp.sum(out ** 2)

    g_plain = jax.grad(lambda p: loss(p, False))(params)
    g_mixed = jax.grad(lambda p: loss(p, "dots_no_logits_hires"))(params)
    for k in ("conv_in.weight", "mid_block.resnets.0.conv1.weight",
              "up_blocks.1.attentions.0.proj_out.weight"):
        # remat changes recompute/fusion order; fp32 noise through the
        # deep net reaches ~3e-3 relative — wiring bugs would be O(1) off
        np.testing.assert_allclose(np.asarray(g_plain[k]),
                                   np.asarray(g_mixed[k]),
                                   rtol=5e-3, atol=1e-4, err_msg=k)


def test_three_tier_remat_structure_and_gradients():
    """r4 3-tier policy: units >= full_tokens get FULL remat (policy None),
    units < hires_tokens stay resident, the middle keeps the dot policy —
    and the whole thing is numerics-neutral."""
    import jax
    import jax.numpy as jnp

    cfg = arch.TINY
    params = init_params(cfg, jax.random.PRNGKey(0))
    key = jax.random.PRNGKey(1)
    latents = jax.random.normal(key, (1, 40, 40, 4), jnp.float32)
    embeds = jax.random.normal(jax.random.fold_in(key, 1),
                               (1, 7, cfg.cross_attention_dim), jnp.float32)
    pooled = jax.random.normal(jax.random.fold_in(key, 2),
                               (1, cfg.pooled_projection_dim), jnp.float32)
    time_ids = jnp.ones((1, 6), jnp.float32)

    def fwd(thresholds):
        def f(p):
            return unet_forward(p, latents, jnp.asarray([3.0]), embeds,
                                pooled, time_ids, cfg=cfg, attn_impl="xla",
                                compute_dtype=jnp.float32,
                                remat="dots_no_logits_hires",
                                remat_thresholds=thresholds)
        return f

    def remat_policies(thresholds):
        jaxpr = jax.make_jaxpr(fwd(thresholds))(params)
        return [eqn.params.get("policy")
                for eqn in jaxpr.eqns if "remat" in eqn.primitive.name]

    # everything resident: no remat equations at all
    assert remat_policies((10**9, 10**9)) == []
    # everything under the dot policy: all policies non-None
    all_dots = remat_policies((1, 10**9))
    assert all_dots and all(p is not None for p in all_dots)
    # top level (40x40 = 1600 tokens) FULL remat, deeper levels dot policy
    mixed = remat_policies((1, 1600))
    assert len(mixed) == len(all_dots)
    n_full = sum(1 for p in mixed if p is None)
    assert 0 < n_full < len(mixed)

    # numerics-neutral vs no remat
    def loss(p, mode, thr=None):
        out = unet_forward(p, latents, jnp.asarray([3.0]), embeds,
                           pooled, time_ids, cfg=cfg, attn_impl="xla",
                           compute_dtype=jnp.float32, remat=mode,
                           remat_thresholds=thr)
        return jnp.sum(out ** 2)

    g_plain = jax.grad(lambda p: loss(p, False))(params)
    g_tiered = jax.grad(lambda p: loss(p, "dots_no_logits_hires",
                                       (4, 1600)))(params)
    for k in ("conv_in.weight", "mid_block.resnets.0.conv1.weight",
              "up_blocks.1.attentions.0.proj_out.weight"):
        np.testing.assert_allclose(np.asarray(g_plain[k]),
                                   np.asarray(g_tiered[k]),
                                   rtol=5e-3, atol=1e-4, err_msg=k)
