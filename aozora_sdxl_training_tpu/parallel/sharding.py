"""Device mesh + GSPMD sharding rules (the rebuild's distributed backend).

The reference is strictly single-GPU; its "communication layer" is PCIe
offload inside Raven/Titan (SURVEY.md §5.8).  The TPU rebuild replaces that
wholesale with a `jax.sharding.Mesh` and GSPMD:

* ``dp`` axis — data parallelism over the batch; gradients are combined by
  XLA-inserted all-reduces over ICI.
* parameters: either replicated or FSDP-style sharded on their largest
  axis over ``dp`` (ZeRO-3); optimizer moments always follow the same spec
  as their parameter (ZeRO-1+), eliminating the reference's CPU-offload
  machinery entirely.

All rules are expressed as PartitionSpecs per flat-dict leaf; pjit inserts
the collectives.
"""

from __future__ import annotations

from typing import Any

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(devices=None, *, dp: int | None = None) -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    dp = dp or len(devices)
    if len(devices) % dp:
        raise ValueError(f"{len(devices)} devices not divisible by dp={dp}")
    return Mesh(np.asarray(devices[:dp]).reshape(dp), ("dp",))


def param_partition_spec(shape: tuple[int, ...], mesh_size: int,
                         mode: str = "fsdp",
                         min_shard_elements: int = 2 ** 16) -> P:
    """Pick a PartitionSpec for one parameter tensor.

    ``fsdp`` shards the largest mesh-divisible axis over ``dp``; tiny tensors
    (norm scales, biases) stay replicated — sharding them costs more in
    collective latency than it saves in HBM.
    """
    if mode == "replicated" or mesh_size <= 1:
        return P()
    if int(np.prod(shape)) < min_shard_elements:
        return P()
    # largest divisible axis wins; ties -> later axis (output features,
    # which are contiguous lanes on TPU)
    best_axis, best_dim = None, 0
    for axis, dim in enumerate(shape):
        if dim % mesh_size == 0 and dim >= best_dim:
            best_axis, best_dim = axis, dim
    if best_axis is None:
        return P()
    spec: list[Any] = [None] * len(shape)
    spec[best_axis] = "dp"
    return P(*spec)


def params_shardings(params, mesh: Mesh, mode: str = "fsdp",
                     min_shard_elements: int = 2 ** 16):
    """Tree of NamedShardings matching the (flat-dict) param tree."""
    size = mesh.devices.size

    def one(p):
        return NamedSharding(mesh, param_partition_spec(
            tuple(p.shape), size, mode, min_shard_elements))

    return jax.tree.map(one, params)


def opt_state_shardings(opt_state, mesh: Mesh, mode: str = "fsdp"):
    """Moments follow their parameter's spec; the step counter is replicated."""
    size = mesh.devices.size

    def one(x):
        if getattr(x, "ndim", 0) == 0:
            return NamedSharding(mesh, P())
        return NamedSharding(mesh, param_partition_spec(tuple(x.shape), size, mode))

    return jax.tree.map(one, opt_state)


def batch_shardings(batch_tree, mesh: Mesh):
    """Shard every batch leaf on its leading (batch) axis over dp."""
    def one(x):
        if getattr(x, "ndim", 0) == 0:
            return NamedSharding(mesh, P())
        return NamedSharding(mesh, P("dp"))

    return jax.tree.map(one, batch_tree)


def replicated(mesh: Mesh):
    return NamedSharding(mesh, P())


def put_tree(tree, shardings):
    """Device-put a host tree onto the mesh with the given shardings."""
    return jax.tree.map(lambda x, s: jax.device_put(x, s), tree, shardings)
