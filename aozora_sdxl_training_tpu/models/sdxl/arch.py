"""SDXL UNet architecture description + parameter-shape enumeration.

The UNet is implemented functionally (see ``unet.py``): parameters live in a
flat ``{dotted_name: array}`` dict using torch/diffusers naming
(``down_blocks.0.resnets.0.conv1.weight`` ...) but **TPU-native layouts**:
conv kernels are HWIO, linear kernels are (in, out).  Keeping the diffusers
names makes single-file SD checkpoint load/merge-back a pure key-mapping
problem (reference: /root/reference/train.py:2418-2465) and lets the
keyword-freeze semantics (``UNET_EXCLUDE_TARGETS`` fnmatch over names,
train.py:2664-2667) carry over unchanged.

This module is pure metadata: given an :class:`UNetConfig` it enumerates every
parameter name with its shape and layout, which drives init, loading,
freezing, and sharding rules.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Iterator


@dataclass(frozen=True)
class UNetConfig:
    in_channels: int = 4
    out_channels: int = 4
    block_out_channels: tuple[int, ...] = (320, 640, 1280)
    layers_per_block: int = 2
    # attention layers per down block; 0 = plain resnet block (DownBlock2D)
    transformer_layers: tuple[int, ...] = (0, 2, 10)
    num_heads: tuple[int, ...] = (5, 10, 20)
    mid_transformer_layers: int = 10
    cross_attention_dim: int = 2048
    norm_num_groups: int = 32
    addition_time_embed_dim: int = 256
    pooled_projection_dim: int = 1280
    num_time_ids: int = 6
    ff_mult: int = 4

    @property
    def time_embed_dim(self) -> int:
        return self.block_out_channels[0] * 4

    @property
    def addition_embed_input_dim(self) -> int:
        return self.pooled_projection_dim + self.num_time_ids * self.addition_time_embed_dim

    @property
    def num_blocks(self) -> int:
        return len(self.block_out_channels)

    def has_cross_attn(self, block_index: int) -> bool:
        return self.transformer_layers[block_index] > 0


SDXL_BASE = UNetConfig()

# A tiny config with identical topology for fast CPU tests.
TINY = UNetConfig(
    block_out_channels=(32, 64, 128),
    transformer_layers=(0, 1, 2),
    num_heads=(2, 4, 8),
    mid_transformer_layers=2,
    cross_attention_dim=48,
    norm_num_groups=8,
    addition_time_embed_dim=16,
    pooled_projection_dim=40,
)


# --------------------------------------------------------------------------
# Parameter enumeration
# --------------------------------------------------------------------------
# kinds: "conv"   -> weight HWIO, bias (O,)
#        "linear" -> weight (in, out), bias (out,)
#        "norm"   -> weight (C,), bias (C,)   (GroupNorm / LayerNorm)

@dataclass(frozen=True)
class ParamSpec:
    name: str          # dotted diffusers name WITHOUT .weight/.bias suffix
    kind: str          # conv | linear | norm
    shape: tuple[int, ...]  # weight shape in TPU layout
    has_bias: bool = True


def _conv(name, kh, kw, cin, cout) -> ParamSpec:
    return ParamSpec(name, "conv", (kh, kw, cin, cout))


def _linear(name, cin, cout, has_bias=True) -> ParamSpec:
    return ParamSpec(name, "linear", (cin, cout), has_bias)


def _norm(name, c) -> ParamSpec:
    return ParamSpec(name, "norm", (c,))


def _resnet_specs(prefix: str, cin: int, cout: int, temb: int) -> Iterator[ParamSpec]:
    yield _norm(f"{prefix}.norm1", cin)
    yield _conv(f"{prefix}.conv1", 3, 3, cin, cout)
    yield _linear(f"{prefix}.time_emb_proj", temb, cout)
    yield _norm(f"{prefix}.norm2", cout)
    yield _conv(f"{prefix}.conv2", 3, 3, cout, cout)
    if cin != cout:
        yield _conv(f"{prefix}.conv_shortcut", 1, 1, cin, cout)


def _attention_specs(prefix: str, dim: int, ctx_dim: int) -> Iterator[ParamSpec]:
    yield _linear(f"{prefix}.to_q", dim, dim, has_bias=False)
    yield _linear(f"{prefix}.to_k", ctx_dim, dim, has_bias=False)
    yield _linear(f"{prefix}.to_v", ctx_dim, dim, has_bias=False)
    yield _linear(f"{prefix}.to_out.0", dim, dim)


def _transformer_block_specs(prefix: str, dim: int, ctx_dim: int,
                             ff_mult: int) -> Iterator[ParamSpec]:
    yield _norm(f"{prefix}.norm1", dim)
    yield from _attention_specs(f"{prefix}.attn1", dim, dim)
    yield _norm(f"{prefix}.norm2", dim)
    yield from _attention_specs(f"{prefix}.attn2", dim, ctx_dim)
    yield _norm(f"{prefix}.norm3", dim)
    yield _linear(f"{prefix}.ff.net.0.proj", dim, dim * ff_mult * 2)  # GEGLU
    yield _linear(f"{prefix}.ff.net.2", dim * ff_mult, dim)


def _transformer2d_specs(prefix: str, dim: int, depth: int, ctx_dim: int,
                         ff_mult: int) -> Iterator[ParamSpec]:
    yield _norm(f"{prefix}.norm", dim)
    yield _linear(f"{prefix}.proj_in", dim, dim)  # use_linear_projection=True
    for k in range(depth):
        yield from _transformer_block_specs(
            f"{prefix}.transformer_blocks.{k}", dim, ctx_dim, ff_mult)
    yield _linear(f"{prefix}.proj_out", dim, dim)


def enumerate_param_specs(cfg: UNetConfig) -> list[ParamSpec]:
    specs: list[ParamSpec] = []
    temb = cfg.time_embed_dim
    ch = cfg.block_out_channels

    specs.append(_conv("conv_in", 3, 3, cfg.in_channels, ch[0]))
    specs.append(_linear("time_embedding.linear_1", ch[0], temb))
    specs.append(_linear("time_embedding.linear_2", temb, temb))
    specs.append(_linear("add_embedding.linear_1", cfg.addition_embed_input_dim, temb))
    specs.append(_linear("add_embedding.linear_2", temb, temb))

    # down path
    cout = ch[0]
    for i in range(cfg.num_blocks):
        cin = cout
        cout = ch[i]
        for j in range(cfg.layers_per_block):
            rin = cin if j == 0 else cout
            specs.extend(_resnet_specs(f"down_blocks.{i}.resnets.{j}", rin, cout, temb))
            if cfg.has_cross_attn(i):
                specs.extend(_transformer2d_specs(
                    f"down_blocks.{i}.attentions.{j}", cout,
                    cfg.transformer_layers[i], cfg.cross_attention_dim, cfg.ff_mult))
        if i < cfg.num_blocks - 1:
            specs.append(_conv(f"down_blocks.{i}.downsamplers.0.conv", 3, 3, cout, cout))

    # mid
    cmid = ch[-1]
    specs.extend(_resnet_specs("mid_block.resnets.0", cmid, cmid, temb))
    specs.extend(_transformer2d_specs(
        "mid_block.attentions.0", cmid, cfg.mid_transformer_layers,
        cfg.cross_attention_dim, cfg.ff_mult))
    specs.extend(_resnet_specs("mid_block.resnets.1", cmid, cmid, temb))

    # up path
    rev = list(reversed(ch))
    rev_layers = list(reversed(cfg.transformer_layers))
    prev_out = ch[-1]
    for i in range(cfg.num_blocks):
        cout = rev[i]
        cin = rev[min(i + 1, cfg.num_blocks - 1)]
        for j in range(cfg.layers_per_block + 1):
            skip_ch = cin if j == cfg.layers_per_block else cout
            res_in = prev_out if j == 0 else cout
            specs.extend(_resnet_specs(
                f"up_blocks.{i}.resnets.{j}", res_in + skip_ch, cout, temb))
            if rev_layers[i] > 0:
                specs.extend(_transformer2d_specs(
                    f"up_blocks.{i}.attentions.{j}", cout, rev_layers[i],
                    cfg.cross_attention_dim, cfg.ff_mult))
        prev_out = cout
        if i < cfg.num_blocks - 1:
            specs.append(_conv(f"up_blocks.{i}.upsamplers.0.conv", 3, 3, cout, cout))

    specs.append(_norm("conv_norm_out", ch[0]))
    specs.append(_conv("conv_out", 3, 3, ch[0], cfg.out_channels))
    return specs


def param_shapes(cfg: UNetConfig) -> dict[str, tuple[tuple[int, ...], str]]:
    """{tensor_name: (shape, kind)} including .weight/.bias leaves."""
    out: dict[str, tuple[tuple[int, ...], str]] = {}
    for spec in enumerate_param_specs(cfg):
        out[f"{spec.name}.weight"] = (spec.shape, spec.kind)
        if spec.has_bias:
            bias_dim = spec.shape[-1]
            out[f"{spec.name}.bias"] = ((bias_dim,), spec.kind)
    return out


def hf_param_names(cfg: UNetConfig) -> list[str]:
    """All torch-style tensor names (diffusers state_dict key set)."""
    return list(param_shapes(cfg).keys())
