"""Device mesh + GSPMD sharding rules (the rebuild's distributed backend).

The reference is strictly single-GPU; its "communication layer" is PCIe
offload inside Raven/Titan (SURVEY.md §5.8).  The TPU rebuild replaces that
wholesale with a `jax.sharding.Mesh` and GSPMD:

* ``dp`` axis — data parallelism over the batch; gradients are combined by
  XLA-inserted all-reduces over ICI.
* ``tp`` axis (optional, Megatron-style) — attention and GEGLU weights are
  head/column-sharded, their second projections row-sharded; GSPMD
  propagates the activation shardings and inserts the per-layer psums.
* parameters: either replicated or FSDP-style sharded on their largest
  axis over ``dp`` (ZeRO-3); optimizer moments always follow the same spec
  as their parameter (ZeRO-1+), eliminating the reference's CPU-offload
  machinery entirely.

All rules are expressed as PartitionSpecs per flat-dict leaf; pjit inserts
the collectives.
"""

from __future__ import annotations

import os
from typing import Any, NamedTuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


class MeshLayout(NamedTuple):
    """Resolved device layout + batch semantics for a training run."""

    devices: tuple
    dp: int
    tp: int
    global_batch: int
    use_mesh: bool
    sp: int = 1   # sequence-parallel degree (Anima DiT ring attention)
    pp: int = 1   # pipeline-parallel degree (Anima DiT GPipe stages)


def resolve_mesh_layout(config) -> MeshLayout:
    """Decide dp x tp and the *global* batch for this run.

    ``BATCH_SIZE`` in the config is **per-dp-shard** (the reference is
    single-GPU so its BATCH_SIZE trivially equals both readings;
    /root/reference/configs/default_config.json ships batch 1).  On a mesh
    the global batch becomes ``BATCH_SIZE * dp`` so the default config
    scales onto a v5e-8 instead of silently training on one chip.

    ``AOZORA_DEVICES=<n>`` caps the device count (tests / pinning).
    """
    devices = list(jax.devices())
    limit = int(os.environ.get("AOZORA_DEVICES", "0") or 0)
    if limit > 0:
        devices = devices[:limit]
    tp = max(1, int(getattr(config, "TENSOR_PARALLEL_SIZE", 1) or 1))
    sp = max(1, int(getattr(config, "SEQUENCE_PARALLEL_SIZE", 1) or 1))
    pp = max(1, int(getattr(config, "PIPELINE_PARALLEL_SIZE", 1) or 1))
    if sp > 1 and tp > 1:
        print("WARNING: SEQUENCE_PARALLEL_SIZE and TENSOR_PARALLEL_SIZE "
              "cannot combine (both shard attention); falling back to tp=1.")
        tp = 1
    if pp > 1 and (tp > 1 or sp > 1):
        print("WARNING: PIPELINE_PARALLEL_SIZE cannot combine with "
              "TENSOR/SEQUENCE_PARALLEL_SIZE; falling back to tp=1, sp=1.")
        tp = sp = 1
    if len(devices) % tp != 0:
        print(f"WARNING: TENSOR_PARALLEL_SIZE={tp} does not divide "
              f"{len(devices)} device(s); falling back to tp=1.")
        tp = 1
    if len(devices) % sp != 0:
        print(f"WARNING: SEQUENCE_PARALLEL_SIZE={sp} does not divide "
              f"{len(devices)} device(s); falling back to sp=1.")
        sp = 1
    if len(devices) % pp != 0:
        print(f"WARNING: PIPELINE_PARALLEL_SIZE={pp} does not divide "
              f"{len(devices)} device(s); falling back to pp=1.")
        pp = 1
    dp = max(1, len(devices) // (tp * sp * pp))
    per_shard = int(config.BATCH_SIZE)
    global_batch = per_shard * dp
    use_mesh = len(devices) > 1
    if dp > 1 or sp > 1 or pp > 1:
        print(f"INFO: BATCH_SIZE={per_shard} is per-dp-shard: global batch "
              f"= {per_shard} x dp{dp} = {global_batch} "
              f"(mesh dp={dp} x tp={tp} x sp={sp} x pp={pp} over "
              f"{dp * tp * sp * pp} device(s)).")
    return MeshLayout(tuple(devices[: dp * tp * sp * pp]), dp, tp,
                      global_batch, use_mesh, sp, pp)


def make_mesh(devices=None, *, dp: int | None = None, tp: int = 1,
              sp: int = 1, pp: int = 1) -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    tp = max(1, int(tp))
    sp = max(1, int(sp))
    pp = max(1, int(pp))
    dp = dp or len(devices) // (tp * sp * pp)
    if dp * tp * sp * pp > len(devices) or len(devices) % (dp * tp * sp * pp):
        raise ValueError(f"{len(devices)} devices not divisible by "
                         f"dp={dp} x tp={tp} x sp={sp} x pp={pp}")
    if pp > 1:
        # GPipe stage axis (parallel/pipeline.py); block params shard as
        # __stack__ leaves over pp, everything else replicates over it.
        # tp/sp never combine with pp (resolve_mesh_layout enforces).
        return Mesh(np.asarray(devices[: dp * pp]).reshape(dp, pp),
                    ("dp", "pp"))
    if sp > 1:
        # ring attention shards tokens over sp; params/batches replicate
        # over it (their specs never name "sp").  tp+sp never combine
        # (resolve_mesh_layout forces tp=1).
        return Mesh(np.asarray(devices[: dp * sp]).reshape(dp, sp),
                    ("dp", "sp"))
    if tp == 1:
        return Mesh(np.asarray(devices[:dp]).reshape(dp), ("dp",))
    return Mesh(np.asarray(devices[: dp * tp]).reshape(dp, tp), ("dp", "tp"))


# Megatron-style rules keyed on parameter-name suffixes: column-parallel
# layers shard output features (attention heads / GEGLU columns),
# row-parallel layers shard input features so GSPMD closes each pair with
# one psum on the layer output.
_TP_COLUMN_SUFFIXES = (
    # SDXL UNet transformer blocks
    ".to_q.weight", ".to_k.weight", ".to_v.weight", ".ff.net.0.proj.weight",
    # Anima DiT blocks + LLM adapter ((in, out) layout throughout)
    ".q_proj.weight", ".k_proj.weight", ".v_proj.weight",
    ".mlp.layer1.weight", ".mlp.0.weight",
)
_TP_COLUMN_BIAS_SUFFIXES = (".to_q.bias", ".to_k.bias", ".to_v.bias",
                            ".ff.net.0.proj.bias",
                            ".q_proj.bias", ".k_proj.bias", ".v_proj.bias",
                            ".mlp.0.bias")
_TP_ROW_SUFFIXES = (".to_out.0.weight", ".ff.net.2.weight",
                    ".output_proj.weight", ".o_proj.weight",
                    ".mlp.layer2.weight", ".mlp.2.weight")


def tp_param_spec(name: str, shape: tuple[int, ...], tp_size: int) -> P | None:
    """TP spec for one named parameter, or None if the TP rules don't apply."""
    if tp_size <= 1:
        return None
    if name.endswith(_TP_COLUMN_SUFFIXES) and len(shape) == 2 \
            and shape[1] % tp_size == 0:
        return P(None, "tp")
    if name.endswith(_TP_COLUMN_BIAS_SUFFIXES) and len(shape) == 1 \
            and shape[0] % tp_size == 0:
        return P("tp")
    if name.endswith(_TP_ROW_SUFFIXES) and len(shape) == 2 \
            and shape[0] % tp_size == 0:
        return P("tp", None)
    return None


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
    """Tree of NamedShardings matching the (flat-dict) param tree.

    With a ``tp`` axis in the mesh, attention/GEGLU weights follow the
    Megatron rules (name-keyed) and everything else falls back to the
    dp-axis FSDP rule.
    """
    dp_size = int(mesh.shape.get("dp", mesh.devices.size))
    tp_size = int(mesh.shape.get("tp", 1))

    pp_axis = "pp" in mesh.axis_names

    def one(name, p):
        if isinstance(p, tuple):  # int8 moment leaves: (codes, scales)
            return tuple(one(name, e) for e in p)
        if pp_axis and name.startswith("__stack__."):
            # stage-stacked block leaf: axis 0 is the pipeline stage axis
            return NamedSharding(mesh, P("pp"))
        spec = tp_param_spec(name, tuple(p.shape), tp_size)
        if spec is None:
            spec = param_partition_spec(tuple(p.shape), dp_size, mode,
                                        min_shard_elements)
        return NamedSharding(mesh, spec)

    if isinstance(params, dict):
        return {k: one(k, v) for k, v in params.items()}
    return jax.tree.map(lambda p: one("", p), params)


def opt_state_shardings(opt_state, mesh: Mesh, mode: str = "fsdp"):
    """Moments follow their parameter's spec; the step counter is replicated."""
    dp_size = int(mesh.shape.get("dp", mesh.devices.size))
    tp_size = int(mesh.shape.get("tp", 1))

    pp_axis = "pp" in mesh.axis_names

    def one_named(name, x):
        if getattr(x, "ndim", 0) == 0:
            return NamedSharding(mesh, P())
        if pp_axis and name.startswith("__stack__."):
            return NamedSharding(mesh, P("pp"))
        spec = tp_param_spec(name, tuple(x.shape), tp_size)
        if spec is None:
            spec = param_partition_spec(tuple(x.shape), dp_size, mode)
        return NamedSharding(mesh, spec)

    def map_container(cont):
        # moment containers are flat name->tensor dicts (tuple leaves for
        # int8-quantized moments: (codes, scales))
        if isinstance(cont, dict):
            return {k: (tuple(one_named(k, e) for e in v)
                        if isinstance(v, tuple) else one_named(k, v))
                    for k, v in cont.items()}
        return jax.tree.map(lambda x: one_named("", x), cont)

    if isinstance(opt_state, tuple) and hasattr(opt_state, "_fields"):
        return type(opt_state)(*(map_container(f) if isinstance(f, dict)
                                 else jax.tree.map(
                                     lambda x: one_named("", x), f)
                                 for f in opt_state))
    if isinstance(opt_state, dict):
        return map_container(opt_state)
    return jax.tree.map(lambda x: one_named("", x), opt_state)


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
