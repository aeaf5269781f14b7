"""Pallas TPU flash attention (forward + backward), UNet/DiT-shaped.

Blockwise exact attention with online softmax, written for the shapes this
framework actually runs (replacing the reference's flash-attn CUDA wheel,
/root/reference/setup.bat:25-28 and the sdpa/xformers switch at
train.py:197-229):

* SDXL self-attention:  Sq = Skv up to ~9216 tokens (1536px bucket), D=64;
* SDXL cross-attention: short KV (77 x caption chunks), long Q;
* Anima DiT:            (t h w) flattened video tokens, D=128.

Layout: inputs arrive (B, S, H, D), are transposed to (B*H, S, D), and each
(batch*head, q-block) program streams KV blocks through VMEM, keeping the
running max / sum / accumulator in fp32 scratch.  The backward pass is two
kernels (dQ with the KV loop innermost; dK/dV with the Q loop innermost)
that recompute probabilities from the saved row logsumexp — the standard
flash recomputation, so residual memory is O(S) not O(S^2).

TPU tiling note: per-row statistics (logsumexp, dO.O) are stored
lane-replicated at width 128 — Mosaic requires the last block dim to be a
multiple of 128 (or the full array dim), so a (block_q,) vector is carried
as (block_q, 128) with identical lanes.

Softmax statistics and all accumulation are fp32 regardless of input dtype;
matmuls run on the MXU via ``preferred_element_type=float32``.
"""

from __future__ import annotations

import functools

import jax
import jax.ad_checkpoint
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

def _interpret() -> bool:
    # CPU has no Mosaic backend; tests run the kernels interpreted.
    return jax.default_backend() == "cpu"


# r2 block sweep on v5e (tools_dev/attn_probe.py, fwd+bwd, with
# dimension_semantics hints): 512/1024 beats 256/512 at every long-KV
# shape — sdxl-self 4096x64: 3.03 vs 3.84 ms; dit-self 4096x128: 3.94 vs
# 5.58 ms (61.9% of peak); short-KV shapes are capped by _pick_blocks.
DEFAULT_BLOCK_Q = 512
DEFAULT_BLOCK_K = 1024
NEG_INF = -1e30
LANES = 128


def _cdiv(a: int, b: int) -> int:
    return -(-a // b)


def _round_up(a: int, b: int) -> int:
    return _cdiv(a, b) * b


# --------------------------------------------------------------------------
# Forward
# --------------------------------------------------------------------------

def _fwd_kernel(q_ref, k_ref, v_ref, o_ref, lse_ref,
                acc_ref, m_ref, l_ref, *, scale: float, kv_valid: int,
                block_k: int, num_k_blocks: int, kv_axis: int = 2):
    ik = pl.program_id(kv_axis)

    @pl.when(ik == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)
        m_ref[:] = jnp.full_like(m_ref, NEG_INF)
        l_ref[:] = jnp.zeros_like(l_ref)

    q = q_ref[0]                     # (BQ, D)
    k = k_ref[0]                     # (BK, D)
    v = v_ref[0]                     # (BK, D)

    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32) * scale   # (BQ, BK)

    # mask padded KV columns
    col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1) + ik * block_k
    s = jnp.where(col < kv_valid, s, NEG_INF)

    m_prev = m_ref[:, :1]                              # (BQ, 1)
    m_cur = jnp.max(s, axis=1, keepdims=True)
    m_new = jnp.maximum(m_prev, m_cur)
    alpha = jnp.exp(m_prev - m_new)
    p = jnp.exp(s - m_new)                             # (BQ, BK) fp32
    l_new = l_ref[:, :1] * alpha + jnp.sum(p, axis=1, keepdims=True)
    acc_ref[:] = acc_ref[:] * alpha + jax.lax.dot_general(
        p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    m_ref[:] = jnp.broadcast_to(m_new, m_ref.shape)
    l_ref[:] = jnp.broadcast_to(l_new, l_ref.shape)

    @pl.when(ik == num_k_blocks - 1)
    def _():
        l = l_ref[:, :1]
        safe_l = jnp.maximum(l, 1e-30)
        o_ref[0] = (acc_ref[:] / safe_l).astype(o_ref.dtype)
        lse = m_ref[:, :1] + jnp.log(safe_l)           # (BQ, 1)
        lse_ref[0] = jnp.broadcast_to(lse, lse_ref.shape[1:])


def _flash_forward(q3, k3, v3, *, scale: float, kv_valid: int,
                   block_q: int, block_k: int):
    """q3: (BH, Sq, D); k3, v3: (BH, Sk, D) — padded to block multiples."""
    bh, sq, d = q3.shape
    sk = k3.shape[1]
    nq, nk = sq // block_q, sk // block_k

    kernel = functools.partial(
        _fwd_kernel, scale=scale, kv_valid=kv_valid, block_k=block_k,
        num_k_blocks=nk)
    out, lse = pl.pallas_call(
        kernel,
        grid=(bh, nq, nk),
        in_specs=[
            pl.BlockSpec((1, block_q, d), lambda b, iq, ik: (b, iq, 0)),
            pl.BlockSpec((1, block_k, d), lambda b, iq, ik: (b, ik, 0)),
            pl.BlockSpec((1, block_k, d), lambda b, iq, ik: (b, ik, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, block_q, d), lambda b, iq, ik: (b, iq, 0)),
            pl.BlockSpec((1, block_q, LANES), lambda b, iq, ik: (b, iq, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((bh, sq, d), q3.dtype),
            jax.ShapeDtypeStruct((bh, sq, LANES), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((block_q, d), jnp.float32),
            pltpu.VMEM((block_q, LANES), jnp.float32),
            pltpu.VMEM((block_q, LANES), jnp.float32),
        ],
        # batch*head and q-block programs are independent; only the kv loop
        # carries state — lets Mosaic schedule/pipeline the outer dims freely
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")),
        interpret=_interpret(),
    )(q3, k3, v3)
    return out, lse


# --------------------------------------------------------------------------
# Backward
# --------------------------------------------------------------------------

def _bwd_dq_kernel(q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref, dq_ref,
                   dq_acc, *, scale: float, kv_valid: int, block_k: int,
                   num_k_blocks: int, kv_axis: int = 2):
    ik = pl.program_id(kv_axis)

    @pl.when(ik == 0)
    def _():
        dq_acc[:] = jnp.zeros_like(dq_acc)

    q = q_ref[0]
    k = k_ref[0]
    v = v_ref[0]
    do = do_ref[0]
    lse = lse_ref[0][:, :1]         # (BQ, 1)
    delta = delta_ref[0][:, :1]     # (BQ, 1)

    s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32) * scale
    col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1) + ik * block_k
    s = jnp.where(col < kv_valid, s, NEG_INF)
    p = jnp.exp(s - lse)                                       # (BQ, BK)
    dp = jax.lax.dot_general(do, v, (((1,), (1,)), ((), ())),
                             preferred_element_type=jnp.float32)
    ds = p * (dp - delta) * scale                               # (BQ, BK)
    dq_acc[:] += jax.lax.dot_general(ds.astype(k.dtype), k,
                                     (((1,), (0,)), ((), ())),
                                     preferred_element_type=jnp.float32)

    @pl.when(ik == num_k_blocks - 1)
    def _():
        dq_ref[0] = dq_acc[:].astype(dq_ref.dtype)


def _bwd_dkv_kernel(q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref,
                    dk_ref, dv_ref, dk_acc, dv_acc, *, scale: float,
                    kv_valid: int, block_k: int, num_q_blocks: int,
                    ik_axis: int = 1, iq_axis: int = 2):
    ik = pl.program_id(ik_axis)
    iq = pl.program_id(iq_axis)

    @pl.when(iq == 0)
    def _():
        dk_acc[:] = jnp.zeros_like(dk_acc)
        dv_acc[:] = jnp.zeros_like(dv_acc)

    q = q_ref[0]
    k = k_ref[0]
    v = v_ref[0]
    do = do_ref[0]
    lse = lse_ref[0][:, :1]
    delta = delta_ref[0][:, :1]

    s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32) * scale
    col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1) + ik * block_k
    s = jnp.where(col < kv_valid, s, NEG_INF)
    p = jnp.exp(s - lse)                                       # (BQ, BK)
    # dV += P^T dO
    dv_acc[:] += jax.lax.dot_general(p.astype(do.dtype), do,
                                     (((0,), (0,)), ((), ())),
                                     preferred_element_type=jnp.float32)
    dp = jax.lax.dot_general(do, v, (((1,), (1,)), ((), ())),
                             preferred_element_type=jnp.float32)
    ds = p * (dp - delta) * scale
    # dK += dS^T Q
    dk_acc[:] += jax.lax.dot_general(ds.astype(q.dtype), q,
                                     (((0,), (0,)), ((), ())),
                                     preferred_element_type=jnp.float32)

    @pl.when(iq == num_q_blocks - 1)
    def _():
        dk_ref[0] = dk_acc[:].astype(dk_ref.dtype)
        dv_ref[0] = dv_acc[:].astype(dv_ref.dtype)


def _flash_backward(q3, k3, v3, o3, lse, do3, *, scale: float, kv_valid: int,
                    block_q: int, block_k: int):
    bh, sq, d = q3.shape
    sk = k3.shape[1]
    nq, nk = sq // block_q, sk // block_k

    delta = jnp.sum(do3.astype(jnp.float32) * o3.astype(jnp.float32), axis=-1)
    delta = jnp.broadcast_to(delta[..., None], (bh, sq, LANES))

    row_spec = pl.BlockSpec((1, block_q, LANES), lambda b, iq, ik: (b, iq, 0))
    dq = pl.pallas_call(
        functools.partial(_bwd_dq_kernel, scale=scale, kv_valid=kv_valid,
                          block_k=block_k, num_k_blocks=nk),
        grid=(bh, nq, nk),
        in_specs=[
            pl.BlockSpec((1, block_q, d), lambda b, iq, ik: (b, iq, 0)),
            pl.BlockSpec((1, block_k, d), lambda b, iq, ik: (b, ik, 0)),
            pl.BlockSpec((1, block_k, d), lambda b, iq, ik: (b, ik, 0)),
            pl.BlockSpec((1, block_q, d), lambda b, iq, ik: (b, iq, 0)),
            row_spec,
            row_spec,
        ],
        out_specs=pl.BlockSpec((1, block_q, d), lambda b, iq, ik: (b, iq, 0)),
        out_shape=jax.ShapeDtypeStruct((bh, sq, d), q3.dtype),
        scratch_shapes=[pltpu.VMEM((block_q, d), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")),
        interpret=_interpret(),
    )(q3, k3, v3, do3, lse, delta)

    row_spec_kv = pl.BlockSpec((1, block_q, LANES), lambda b, ik, iq: (b, iq, 0))
    dk, dv = pl.pallas_call(
        functools.partial(_bwd_dkv_kernel, scale=scale, kv_valid=kv_valid,
                          block_k=block_k, num_q_blocks=nq),
        grid=(bh, nk, nq),
        in_specs=[
            pl.BlockSpec((1, block_q, d), lambda b, ik, iq: (b, iq, 0)),
            pl.BlockSpec((1, block_k, d), lambda b, ik, iq: (b, ik, 0)),
            pl.BlockSpec((1, block_k, d), lambda b, ik, iq: (b, ik, 0)),
            pl.BlockSpec((1, block_q, d), lambda b, ik, iq: (b, iq, 0)),
            row_spec_kv,
            row_spec_kv,
        ],
        out_specs=[
            pl.BlockSpec((1, block_k, d), lambda b, ik, iq: (b, ik, 0)),
            pl.BlockSpec((1, block_k, d), lambda b, ik, iq: (b, ik, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((bh, sk, d), k3.dtype),
            jax.ShapeDtypeStruct((bh, sk, d), v3.dtype),
        ],
        scratch_shapes=[
            pltpu.VMEM((block_k, d), jnp.float32),
            pltpu.VMEM((block_k, d), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")),
        interpret=_interpret(),
    )(q3, k3, v3, do3, lse, delta)

    return dq, dk, dv


# --------------------------------------------------------------------------
# Folded layout (lane-aligned head_dim): heads live in the LANE dimension
# --------------------------------------------------------------------------
#
# When head_dim is a multiple of 128 (Anima DiT d=128, VAE mid-attention
# d=512), each head's channel slice is lane-tile aligned inside the native
# (B, S, H*D) projection layout — so the kernels can index head h at lane
# offset h*D directly and the (B,S,H,D)->(B,H,S,D) physical transposes
# (plus their backward twins) disappear entirely.  Same kernel bodies; the
# grid gains a head axis and block index_maps pick the lane offset.

def _flash_forward_folded(qf, kf, vf, *, h: int, scale: float, kv_valid: int,
                          block_q: int, block_k: int):
    """qf: (B, Sq, H*D); kf, vf: (B, Sk, H*D) — S padded to block multiples."""
    b, sq, hd = qf.shape
    d = hd // h
    sk = kf.shape[1]
    nq, nk = sq // block_q, sk // block_k

    kernel = functools.partial(
        _fwd_kernel, scale=scale, kv_valid=kv_valid, block_k=block_k,
        num_k_blocks=nk, kv_axis=3)
    out, lse = pl.pallas_call(
        kernel,
        grid=(b, h, nq, nk),
        in_specs=[
            pl.BlockSpec((1, block_q, d), lambda b, h, iq, ik: (b, iq, h)),
            pl.BlockSpec((1, block_k, d), lambda b, h, iq, ik: (b, ik, h)),
            pl.BlockSpec((1, block_k, d), lambda b, h, iq, ik: (b, ik, h)),
        ],
        out_specs=[
            pl.BlockSpec((1, block_q, d), lambda b, h, iq, ik: (b, iq, h)),
            pl.BlockSpec((1, block_q, LANES), lambda b, h, iq, ik: (b, iq, h)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, sq, hd), qf.dtype),
            jax.ShapeDtypeStruct((b, sq, h * LANES), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((block_q, d), jnp.float32),
            pltpu.VMEM((block_q, LANES), jnp.float32),
            pltpu.VMEM((block_q, LANES), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel",
                                 "arbitrary")),
        interpret=_interpret(),
    )(qf, kf, vf)
    return out, lse


def _flash_backward_folded(qf, kf, vf, of, lse, dof, *, h: int, scale: float,
                           kv_valid: int, block_q: int, block_k: int):
    b, sq, hd = qf.shape
    d = hd // h
    sk = kf.shape[1]
    nq, nk = sq // block_q, sk // block_k

    # per-head dO.O row sums, lane-replicated at each head's LANES slot
    delta = jnp.sum(dof.astype(jnp.float32).reshape(b, sq, h, d)
                    * of.astype(jnp.float32).reshape(b, sq, h, d), axis=-1)
    delta = jnp.repeat(delta, LANES, axis=-1)          # (B, Sq, H*LANES)

    row_spec = pl.BlockSpec((1, block_q, LANES), lambda b, h, iq, ik: (b, iq, h))
    dq = pl.pallas_call(
        functools.partial(_bwd_dq_kernel, scale=scale, kv_valid=kv_valid,
                          block_k=block_k, num_k_blocks=nk, kv_axis=3),
        grid=(b, h, nq, nk),
        in_specs=[
            pl.BlockSpec((1, block_q, d), lambda b, h, iq, ik: (b, iq, h)),
            pl.BlockSpec((1, block_k, d), lambda b, h, iq, ik: (b, ik, h)),
            pl.BlockSpec((1, block_k, d), lambda b, h, iq, ik: (b, ik, h)),
            pl.BlockSpec((1, block_q, d), lambda b, h, iq, ik: (b, iq, h)),
            row_spec,
            row_spec,
        ],
        out_specs=pl.BlockSpec((1, block_q, d), lambda b, h, iq, ik: (b, iq, h)),
        out_shape=jax.ShapeDtypeStruct((b, sq, hd), qf.dtype),
        scratch_shapes=[pltpu.VMEM((block_q, d), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel",
                                 "arbitrary")),
        interpret=_interpret(),
    )(qf, kf, vf, dof, lse, delta)

    row_spec_kv = pl.BlockSpec((1, block_q, LANES),
                               lambda b, h, ik, iq: (b, iq, h))
    dk, dv = pl.pallas_call(
        functools.partial(_bwd_dkv_kernel, scale=scale, kv_valid=kv_valid,
                          block_k=block_k, num_q_blocks=nq, ik_axis=2,
                          iq_axis=3),
        grid=(b, h, nk, nq),
        in_specs=[
            pl.BlockSpec((1, block_q, d), lambda b, h, ik, iq: (b, iq, h)),
            pl.BlockSpec((1, block_k, d), lambda b, h, ik, iq: (b, ik, h)),
            pl.BlockSpec((1, block_k, d), lambda b, h, ik, iq: (b, ik, h)),
            pl.BlockSpec((1, block_q, d), lambda b, h, ik, iq: (b, iq, h)),
            row_spec_kv,
            row_spec_kv,
        ],
        out_specs=[
            pl.BlockSpec((1, block_k, d), lambda b, h, ik, iq: (b, ik, h)),
            pl.BlockSpec((1, block_k, d), lambda b, h, ik, iq: (b, ik, h)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, sk, hd), kf.dtype),
            jax.ShapeDtypeStruct((b, sk, hd), vf.dtype),
        ],
        scratch_shapes=[
            pltpu.VMEM((block_k, d), jnp.float32),
            pltpu.VMEM((block_k, d), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel",
                                 "arbitrary")),
        interpret=_interpret(),
    )(qf, kf, vf, dof, lse, delta)

    return dq, dk, dv


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6))
def _flash_core_folded(qf, kf, vf, h, scale, kv_valid, blocks):
    return _flash_forward_folded(qf, kf, vf, h=h, scale=scale,
                                 kv_valid=kv_valid, block_q=blocks[0],
                                 block_k=blocks[1])


def _flash_core_folded_fwd(qf, kf, vf, h, scale, kv_valid, blocks):
    out, lse = _flash_forward_folded(qf, kf, vf, h=h, scale=scale,
                                     kv_valid=kv_valid, block_q=blocks[0],
                                     block_k=blocks[1])
    out = jax.ad_checkpoint.checkpoint_name(out, "flash_out")
    lse = jax.ad_checkpoint.checkpoint_name(lse, "flash_lse")
    return (out, lse), (qf, kf, vf, out, lse)


def _flash_core_folded_bwd(h, scale, kv_valid, blocks, res, g):
    qf, kf, vf, out, lse = res
    g_out, _ = g
    return _flash_backward_folded(qf, kf, vf, out, lse, g_out, h=h,
                                  scale=scale, kv_valid=kv_valid,
                                  block_q=blocks[0], block_k=blocks[1])


_flash_core_folded.defvjp(_flash_core_folded_fwd, _flash_core_folded_bwd)


# --------------------------------------------------------------------------
# Public entry with custom VJP
# --------------------------------------------------------------------------

def _pick_blocks(sq: int, sk: int) -> tuple[int, int]:
    bq = min(DEFAULT_BLOCK_Q, _round_up(sq, 128))
    bk = min(DEFAULT_BLOCK_K, _round_up(sk, 128))
    return bq, bk


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def _flash_core(q3, k3, v3, scale, kv_valid, blocks):
    """Returns (out, lse).

    ``lse`` is exposed as a REAL output (not just a VJP residual) so that
    ``jax.checkpoint`` policies can save it by name: under remat, saving
    (out, lse) means the backward never has to re-run the forward kernel —
    it goes straight to the dq/dkv kernels.  The lse output carries no
    gradient (its cotangent is ignored); callers must not feed it into the
    loss."""
    return _flash_forward(q3, k3, v3, scale=scale, kv_valid=kv_valid,
                          block_q=blocks[0], block_k=blocks[1])


def _flash_core_fwd(q3, k3, v3, scale, kv_valid, blocks):
    out, lse = _flash_forward(q3, k3, v3, scale=scale, kv_valid=kv_valid,
                              block_q=blocks[0], block_k=blocks[1])
    # name the residuals where remat's partial-eval sees them: a policy that
    # saves these names lets the backward go straight to the dq/dkv kernels
    # instead of re-running the forward kernel
    out = jax.ad_checkpoint.checkpoint_name(out, "flash_out")
    lse = jax.ad_checkpoint.checkpoint_name(lse, "flash_lse")
    return (out, lse), (q3, k3, v3, out, lse)


def _flash_core_bwd(scale, kv_valid, blocks, res, g):
    q3, k3, v3, out, lse = res
    g_out, _ = g  # lse is a statistics output; no gradient flows through it
    dq, dk, dv = _flash_backward(q3, k3, v3, out, lse, g_out, scale=scale,
                                 kv_valid=kv_valid, block_q=blocks[0],
                                 block_k=blocks[1])
    return dq, dk, dv


_flash_core.defvjp(_flash_core_fwd, _flash_core_bwd)


def _stats_layout(q, k, v):
    """Shared pad/reshape for the stats-level entry points below."""
    b, sq, h, d = q.shape
    skv = k.shape[1]
    block_q, block_k = _pick_blocks(sq, skv)
    sq_pad = _round_up(sq, block_q)
    sk_pad = _round_up(skv, block_k)

    def to3(x, s_pad):
        x = jnp.transpose(x, (0, 2, 1, 3)).reshape(b * h, x.shape[1], d)
        if s_pad != x.shape[1]:
            x = jnp.pad(x, ((0, 0), (0, s_pad - x.shape[1]), (0, 0)))
        return x

    return (b, sq, h, d, skv, block_q, block_k, sq_pad, sk_pad, to3)


def flash_fwd_stats(q: jax.Array, k: jax.Array, v: jax.Array, *,
                    scale: float | None = None):
    """Forward kernel only: returns (out (B,Sq,H,D), lse (B,Sq,H) fp32).

    No custom VJP is attached — this is the building block for ring /
    context-parallel attention (ops/ring_attention.py) where the caller
    owns the backward and needs the *global* log-sum-exp to merge KV-shard
    partials exactly.
    """
    (b, sq, h, d, skv, block_q, block_k, sq_pad, sk_pad,
     to3) = _stats_layout(q, k, v)
    scale = (d ** -0.5) if scale is None else scale
    out, lse = _flash_forward(to3(q, sq_pad), to3(k, sk_pad), to3(v, sk_pad),
                              scale=scale, kv_valid=skv,
                              block_q=block_q, block_k=block_k)
    out = out[:, :sq].reshape(b, h, sq, d).transpose(0, 2, 1, 3)
    lse3 = lse[:, :sq, 0].reshape(b, h, sq).transpose(0, 2, 1)
    return out, lse3


def flash_bwd_stats(q: jax.Array, k: jax.Array, v: jax.Array,
                    out: jax.Array, lse3: jax.Array, do: jax.Array, *,
                    scale: float | None = None):
    """Backward kernels from precomputed global statistics.

    ``out``/``lse3`` are the GLOBAL attention output and log-sum-exp for
    these q rows (shapes (B,Sq,H,D) / (B,Sq,H) fp32); k/v may be a SHARD
    of the keys — the returned (dq, dk, dv) are then that shard's exact
    contributions, which is precisely the per-rotation step of the ring
    backward.  Padded q rows are harmless: q=0, do=0 rows produce zero
    dS regardless of the (zero-padded) lse.
    """
    (b, sq, h, d, skv, block_q, block_k, sq_pad, sk_pad,
     to3) = _stats_layout(q, k, v)
    scale = (d ** -0.5) if scale is None else scale
    lse_pad = jnp.transpose(lse3, (0, 2, 1)).reshape(b * h, sq)
    if sq_pad != sq:
        lse_pad = jnp.pad(lse_pad, ((0, 0), (0, sq_pad - sq)))
    lse_pad = jnp.broadcast_to(lse_pad[..., None],
                               (b * h, sq_pad, LANES)).astype(jnp.float32)
    dq, dk, dv = _flash_backward(
        to3(q, sq_pad), to3(k, sk_pad), to3(v, sk_pad), to3(out, sq_pad),
        lse_pad, to3(do, sq_pad), scale=scale, kv_valid=skv,
        block_q=block_q, block_k=block_k)

    def un3(x, s):
        return x[:, :s].reshape(b, h, s, d).transpose(0, 2, 1, 3)

    return un3(dq, sq), un3(dk, skv), un3(dv, skv)


def flash_attention(q: jax.Array, k: jax.Array, v: jax.Array, *,
                    scale: float | None = None) -> jax.Array:
    """Exact attention. q: (B, Sq, H, D); k, v: (B, Skv, H, D)."""
    b, sq, h, d = q.shape
    skv = k.shape[1]
    scale = (d ** -0.5) if scale is None else scale
    block_q, block_k = _pick_blocks(sq, skv)
    sq_pad = _round_up(sq, block_q)
    sk_pad = _round_up(skv, block_k)

    if d % LANES == 0:
        # lane-aligned head_dim: keep the native (B, S, H*D) layout — no
        # physical head transposes in or out (see the folded section above)
        def fold(x, s_pad):
            x = x.reshape(b, x.shape[1], h * d)
            if s_pad != x.shape[1]:
                x = jnp.pad(x, ((0, 0), (0, s_pad - x.shape[1]), (0, 0)))
            return x

        out, _ = _flash_core_folded(fold(q, sq_pad), fold(k, sk_pad),
                                    fold(v, sk_pad), h, scale, skv,
                                    (block_q, block_k))
        return out[:, :sq].reshape(b, sq, h, d)

    def to3(x, s_pad):
        x = jnp.transpose(x, (0, 2, 1, 3)).reshape(b * h, x.shape[1], d)
        if s_pad != x.shape[1]:
            x = jnp.pad(x, ((0, 0), (0, s_pad - x.shape[1]), (0, 0)))
        return x

    q3 = to3(q, sq_pad)
    k3 = to3(k, sk_pad)
    v3 = to3(v, sk_pad)

    out, _ = _flash_core(q3, k3, v3, scale, skv, (block_q, block_k))
    out = out[:, :sq].reshape(b, h, sq, d)
    return jnp.transpose(out, (0, 2, 1, 3))
