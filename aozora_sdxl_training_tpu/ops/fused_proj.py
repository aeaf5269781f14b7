"""Fused attention input projections (q/k/v as one GEMM).

The reference computes q, k, v with three separate ``nn.Linear`` calls
(diffusers attention; /root/reference/training_utils/anima/anima_dit.py:
289-412).  On the MXU three narrow dots over the same activation are
strictly worse than one wide dot: the input is streamed from HBM three
times, and narrow output widths pad up to the 128-lane tile (SDXL level-1
heads are 320 wide -> padded to 384, 17% wasted lanes; fused 960 -> 1024
is 6.7%).  Fusing is a pure trace-time rewrite — the parameter dict keeps
the reference's separate ``to_q/to_k/to_v`` tensors, so checkpoints,
freezing, QAT and sharding are unchanged; AD slices the fused weight
cotangent back onto the individual tensors.

Default ON since r4: the leave-one-out bench sweep attributed ~3.7 ms of
the combo win (0.2415 -> 0.2451 s/img when removed) to this rewrite.
``AOZORA_FUSED_QKV=0`` restores the three separate dots (read at trace
time; e2e timing decides the default, per the r2 measurement rule).
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp


def fused_qkv_enabled() -> bool:
    return os.environ.get("AOZORA_FUSED_QKV", "1") == "1"


def fused_linear(params, names, x: jax.Array) -> list[jax.Array]:
    """One dot over the concatenated weights of ``names``; returns the
    per-name output slices.

    All named projections must share the input dim and be bias-free (true
    for SDXL ``to_q/to_k/to_v`` and Anima ``q/k/v_proj``).
    """
    ws = [params[f"{n}.weight"].astype(x.dtype) for n in names]
    for n in names:  # the fused path silently dropping a bias would be a bug
        assert f"{n}.bias" not in params, f"{n} has a bias; cannot fuse"
    y = jnp.dot(x, jnp.concatenate(ws, axis=1))
    outs = []
    off = 0
    for w in ws:
        outs.append(jax.lax.slice_in_dim(y, off, off + w.shape[1], axis=-1))
        off += w.shape[1]
    return outs
