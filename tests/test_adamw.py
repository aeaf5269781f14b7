"""Raven-semantics AdamW: math parity with the reference optimizer."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from aozora_sdxl_training_tpu.opt import adamw


def _reference_step(p, g, m, v, step, lr, beta1, beta2, eps, wd, debias):
    """Plain-numpy transcription of the Raven update contract
    (/root/reference/training_utils/optimizers/raven.py:105-147)."""
    m = m * beta1 + g * (1 - beta1)
    v = v * beta2 + g * g * (1 - beta2)
    bc1 = 1 - beta1 ** step
    bc2 = 1 - beta2 ** step
    if debias < 1.0:
        bc1 = 1 - (1 - bc1) * debias
        bc2 = 1 - (1 - bc2) * debias
    if wd != 0:
        p = p * (1 - lr * wd)
    denom = np.sqrt(v) / np.sqrt(bc2) + eps
    p = p - (lr / bc1) * m / denom
    return p, m, v


@pytest.mark.parametrize("debias", [1.0, 0.3])
def test_adamw_matches_reference_math(debias):
    rng = np.random.default_rng(0)
    p0 = rng.normal(size=(8, 16)).astype(np.float32)
    cfg = adamw.AdamWConfig(betas=(0.9, 0.999), eps=1e-8, weight_decay=0.01,
                            debias_strength=debias,
                            momentum_dtype=jnp.float32)
    params = {"w": jnp.asarray(p0)}
    state = adamw.init_state(params, cfg)

    p_ref, m_ref, v_ref = p0.copy(), np.zeros_like(p0), np.zeros_like(p0)
    lr = 1e-3
    for step in range(1, 4):
        g = rng.normal(size=p0.shape).astype(np.float32)
        params, state = adamw.apply_updates(
            params, {"w": jnp.asarray(g)}, state, cfg, lr=lr)
        p_ref, m_ref, v_ref = _reference_step(
            p_ref, g, m_ref, v_ref, step, lr, 0.9, 0.999, 1e-8, 0.01, debias)

    # numpy reference promotes through float64; allow fp32 rounding slack
    np.testing.assert_allclose(np.asarray(params["w"]), p_ref, rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(np.asarray(state.exp_avg["w"]), m_ref,
                               rtol=1e-4, atol=1e-6)
    assert int(state.step) == 3


def test_momentum_dtype_storage():
    cfg = adamw.AdamWConfig(momentum_dtype=jnp.bfloat16)
    params = {"w": jnp.ones((4, 4))}
    state = adamw.init_state(params, cfg)
    assert state.exp_avg["w"].dtype == jnp.bfloat16
    params, state = adamw.apply_updates(
        params, {"w": jnp.ones((4, 4)) * 0.1}, state, cfg, lr=1e-3)
    assert state.exp_avg["w"].dtype == jnp.bfloat16
    assert params["w"].dtype == jnp.float32


def test_config_from_params_dict():
    cfg = adamw.AdamWConfig.from_params_dict({
        "betas": [0.9, 0.98], "eps": 1e-6, "weight_decay": 0.05,
        "debias_strength": 0.3, "momentum_dtype": "float32"})
    assert cfg.betas == (0.9, 0.98)
    assert cfg.momentum_dtype == jnp.float32


def test_clip_by_global_norm():
    grads = {"a": jnp.full((3,), 4.0), "b": jnp.full((4,), 3.0)}
    # norm = sqrt(3*16 + 4*9) = sqrt(84)
    clipped, norm = adamw.clip_by_global_norm(grads, 1.0)
    assert float(norm) == pytest.approx(np.sqrt(84), rel=1e-5)
    cn = adamw.global_grad_norm(clipped)
    assert float(cn) == pytest.approx(1.0, rel=1e-5)
    # disabled clipping
    same, norm2 = adamw.clip_by_global_norm(grads, 0.0)
    np.testing.assert_array_equal(np.asarray(same["a"]), np.asarray(grads["a"]))


def test_int8_blockwise_moment_roundtrip():
    rng = np.random.default_rng(7)
    m = jnp.asarray(rng.normal(size=(3, 300)).astype(np.float32) * 0.01)
    codes, scales = adamw.quantize_moment_int8(m)
    assert codes.dtype == jnp.int8 and codes.shape == m.shape
    assert scales.shape == (adamw._int8_blocks(900),)
    back = adamw.dequantize_moment_int8(codes, scales)
    # linear int8: error bounded by half a quant step per block
    err = np.abs(np.asarray(back) - np.asarray(m))
    bound = np.asarray(scales).max() * 0.51
    assert err.max() <= bound


def test_int8_blockwise_adamw_tracks_fp32():
    rng = np.random.default_rng(8)
    p0 = rng.normal(size=(16, 64)).astype(np.float32)
    params8 = {"w": jnp.asarray(p0)}
    params32 = {"w": jnp.asarray(p0)}
    cfg8 = adamw.AdamWConfig(momentum_dtype="int8_blockwise",
                             debias_strength=1.0, min_8bit_size=0)
    cfg32 = adamw.AdamWConfig(momentum_dtype=jnp.float32, debias_strength=1.0)
    s8 = adamw.init_state(params8, cfg8)
    s32 = adamw.init_state(params32, cfg32)
    assert isinstance(s8.exp_avg["w"], tuple)
    for step in range(5):
        g = {"w": jnp.asarray(rng.normal(size=p0.shape).astype(np.float32))}
        params8, s8 = adamw.apply_updates(params8, g, s8, cfg8, lr=1e-3)
        params32, s32 = adamw.apply_updates(params32, g, s32, cfg32, lr=1e-3)
    # 8-bit state tracks the fp32 trajectory closely at these scales
    drift = np.abs(np.asarray(params8["w"]) - np.asarray(params32["w"])).max()
    movement = np.abs(np.asarray(params32["w"]) - p0).max()
    assert drift < movement * 0.05  # sqrt-domain v keeps drift ~2%


def test_int8_state_save_load_roundtrip(tmp_path):
    from aozora_sdxl_training_tpu.ckpt.train_state import (load_train_state,
                                                           save_train_state)
    cfg = adamw.AdamWConfig(momentum_dtype="int8_blockwise",
                            min_8bit_size=0)
    params = {"w": jnp.ones((4, 300))}
    state = adamw.init_state(params, cfg)
    params, state = adamw.apply_updates(
        params, {"w": jnp.full((4, 300), 0.1)}, state, cfg, lr=1e-3)
    path = tmp_path / "state.safetensors"
    import jax
    save_train_state(path, global_step=1, micro_step=1,
                     opt_state=jax.tree.map(np.asarray, state),
                     sampler_seed=1, sampler_epoch=0,
                     timestep_sampler_state=None)
    meta, loaded = load_train_state(path)
    assert isinstance(loaded.exp_avg["w"], tuple)
    np.testing.assert_array_equal(np.asarray(loaded.exp_avg["w"][0]),
                                  np.asarray(state.exp_avg["w"][0]))
    np.testing.assert_allclose(np.asarray(loaded.exp_avg["w"][1]),
                               np.asarray(state.exp_avg["w"][1]))


def test_min_8bit_size_exemption():
    """bnb parity (/root/reference/train.py:2288,2318): tensors under
    min_8bit_size keep fp32 moments under int8_blockwise; larger ones
    quantize.  The mixed state updates correctly through apply_updates."""
    cfg = adamw.AdamWConfig(momentum_dtype="int8_blockwise")  # default 4096
    params = {"big": jnp.ones((64, 128)),   # 8192 -> int8
              "small": jnp.ones((32,))}     # 32   -> fp32 exempt
    state = adamw.init_state(params, cfg)
    assert isinstance(state.exp_avg["big"], tuple)
    assert not isinstance(state.exp_avg["small"], tuple)
    assert state.exp_avg["small"].dtype == jnp.float32
    g = {"big": jnp.full((64, 128), 0.1), "small": jnp.full((32,), 0.1)}
    params2, state2 = adamw.apply_updates(params, g, state, cfg, lr=1e-3)
    assert isinstance(state2.exp_avg["big"], tuple)
    assert state2.exp_avg["small"].dtype == jnp.float32
    # the exempt tensor's moment is exact (no quantization error)
    np.testing.assert_allclose(np.asarray(state2.exp_avg["small"]),
                               np.full((32,), 0.01), rtol=1e-6)
    assert float(jnp.abs(params2["small"] - params["small"]).max()) > 0


def test_resume_global_batch_guard():
    """Resume guard (bit-exact resume contract): a state saved at one
    schedule global batch refuses to resume on a mesh implying another;
    matching and legacy (pre-guard) states pass."""
    import pytest as _pytest
    from aozora_sdxl_training_tpu.ckpt.train_state import (
        check_resume_global_batch)
    check_resume_global_batch({"schedule_global_batch": 8}, 8)
    check_resume_global_batch({}, 8)  # legacy state: warn, don't raise
    with _pytest.raises(RuntimeError, match="global batch of 8"):
        check_resume_global_batch({"schedule_global_batch": 8}, 4)


def test_train_state_persists_schedule_global_batch(tmp_path):
    from aozora_sdxl_training_tpu.ckpt.train_state import (load_train_state,
                                                           save_train_state)
    cfg = adamw.AdamWConfig()
    params = {"w": jnp.ones((8,))}
    state = adamw.init_state(params, cfg)
    path = tmp_path / "s.safetensors"
    save_train_state(path, global_step=1, micro_step=2,
                     opt_state=jax.tree.map(np.asarray, state),
                     sampler_seed=1, sampler_epoch=0,
                     timestep_sampler_state=None,
                     extra={"schedule_global_batch": 8})
    meta, _ = load_train_state(path)
    assert meta["schedule_global_batch"] == 8


def test_leaf_square_sum_dot_impl_matches(monkeypatch):
    """AOZORA_NORM_IMPL=dot (flat self-inner-product, fp32 accumulation)
    must agree with the default elementwise fp32 reduction."""
    import numpy as np
    from aozora_sdxl_training_tpu.opt.adamw import leaf_square_sum
    g32 = jnp.asarray(np.random.default_rng(0).normal(size=(37, 53)),
                      jnp.float32)
    g16 = g32.astype(jnp.bfloat16)
    monkeypatch.delenv("AOZORA_NORM_IMPL", raising=False)
    base32 = float(leaf_square_sum(g32))
    base16 = float(leaf_square_sum(g16))
    monkeypatch.setenv("AOZORA_NORM_IMPL", "dot")
    assert float(leaf_square_sum(g32)) == pytest.approx(base32, rel=1e-6)
    # bf16 products round before accumulation: ~1e-2 relative worst case
    assert float(leaf_square_sum(g16)) == pytest.approx(base16, rel=2e-2)
