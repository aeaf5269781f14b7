"""Independent torch twin of the SDXL UNet for full-forward parity tests.

Hand-built from diffusers' ``UNet2DConditionModel`` semantics (the model the
reference trains through, /root/reference/train.py:2760): standard torch
NCHW modules with diffusers' exact block structure, norm epsilons
(Transformer2DModel GroupNorm eps=1e-6, resnet/out GroupNorm eps=1e-5),
GEGLU feed-forward, linear proj_in/out (use_linear_projection=True) and the
text_time added-conditioning path.  diffusers itself is not installed in
this image; this twin IS the oracle, written against the published module
layout rather than as a port of the JAX code, so a wiring bug in either
implementation breaks the comparison.

Weights load from a diffusers-format state_dict (conv OIHW, linear
(out, in)) with the same dotted names as ``models/sdxl/arch.py``.
"""

from __future__ import annotations

import math

import torch
import torch.nn as nn
import torch.nn.functional as F


def sinusoidal_embedding(timesteps: torch.Tensor, dim: int) -> torch.Tensor:
    """diffusers Timesteps(flip_sin_to_cos=True, downscale_freq_shift=0)."""
    half = dim // 2
    exponent = -math.log(10000.0) * torch.arange(half, dtype=torch.float32)
    freqs = torch.exp(exponent / half)
    args = timesteps.float()[:, None] * freqs[None, :]
    return torch.cat([torch.cos(args), torch.sin(args)], dim=-1)


class ResnetBlock(nn.Module):
    def __init__(self, cin, cout, temb_dim, groups):
        super().__init__()
        self.norm1 = nn.GroupNorm(groups, cin, eps=1e-5)
        self.conv1 = nn.Conv2d(cin, cout, 3, padding=1)
        self.time_emb_proj = nn.Linear(temb_dim, cout)
        self.norm2 = nn.GroupNorm(groups, cout, eps=1e-5)
        self.conv2 = nn.Conv2d(cout, cout, 3, padding=1)
        self.conv_shortcut = (nn.Conv2d(cin, cout, 1) if cin != cout else None)

    def forward(self, x, temb):
        h = self.conv1(F.silu(self.norm1(x)))
        h = h + self.time_emb_proj(F.silu(temb))[:, :, None, None]
        h = self.conv2(F.silu(self.norm2(h)))
        if self.conv_shortcut is not None:
            x = self.conv_shortcut(x)
        return x + h


class Attention(nn.Module):
    def __init__(self, dim, ctx_dim, heads):
        super().__init__()
        self.heads = heads
        self.to_q = nn.Linear(dim, dim, bias=False)
        self.to_k = nn.Linear(ctx_dim, dim, bias=False)
        self.to_v = nn.Linear(ctx_dim, dim, bias=False)
        self.to_out = nn.ModuleList([nn.Linear(dim, dim)])

    def forward(self, x, ctx):
        b, s, c = x.shape
        d = c // self.heads
        q = self.to_q(x).view(b, s, self.heads, d).transpose(1, 2)
        k = self.to_k(ctx).view(b, ctx.shape[1], self.heads, d).transpose(1, 2)
        v = self.to_v(ctx).view(b, ctx.shape[1], self.heads, d).transpose(1, 2)
        o = F.scaled_dot_product_attention(q, k, v)
        o = o.transpose(1, 2).reshape(b, s, c)
        return self.to_out[0](o)


class GEGLUFeedForward(nn.Module):
    def __init__(self, dim, mult):
        super().__init__()
        self.net = nn.ModuleList([
            nn.Module(), nn.Identity(), nn.Linear(dim * mult, dim)])
        self.net[0].proj = nn.Linear(dim, dim * mult * 2)

    def forward(self, x):
        h = self.net[0].proj(x)
        h, gate = h.chunk(2, dim=-1)
        return self.net[2](h * F.gelu(gate))


class BasicTransformerBlock(nn.Module):
    def __init__(self, dim, ctx_dim, heads, ff_mult):
        super().__init__()
        self.norm1 = nn.LayerNorm(dim)
        self.attn1 = Attention(dim, dim, heads)
        self.norm2 = nn.LayerNorm(dim)
        self.attn2 = Attention(dim, ctx_dim, heads)
        self.norm3 = nn.LayerNorm(dim)
        self.ff = GEGLUFeedForward(dim, ff_mult)

    def forward(self, x, ctx):
        x = x + self.attn1(self.norm1(x), self.norm1(x))
        x = x + self.attn2(self.norm2(x), ctx)
        x = x + self.ff(self.norm3(x))
        return x


class Transformer2D(nn.Module):
    def __init__(self, dim, depth, ctx_dim, heads, groups, ff_mult):
        super().__init__()
        self.norm = nn.GroupNorm(groups, dim, eps=1e-6)
        self.proj_in = nn.Linear(dim, dim)
        self.transformer_blocks = nn.ModuleList(
            [BasicTransformerBlock(dim, ctx_dim, heads, ff_mult)
             for _ in range(depth)])
        self.proj_out = nn.Linear(dim, dim)

    def forward(self, x, ctx):
        b, c, h, w = x.shape
        residual = x
        hidden = self.norm(x)
        hidden = hidden.permute(0, 2, 3, 1).reshape(b, h * w, c)
        hidden = self.proj_in(hidden)
        for blk in self.transformer_blocks:
            hidden = blk(hidden, ctx)
        hidden = self.proj_out(hidden)
        hidden = hidden.reshape(b, h, w, c).permute(0, 3, 1, 2)
        return hidden + residual


class TwinUNet(nn.Module):
    """diffusers-shaped SDXL UNet (enough of UNet2DConditionModel for the
    training forward: no class embeds, no attention masks)."""

    def __init__(self, cfg):
        super().__init__()
        self.cfg = cfg
        ch = cfg.block_out_channels
        temb = cfg.time_embed_dim
        g = cfg.norm_num_groups

        self.conv_in = nn.Conv2d(cfg.in_channels, ch[0], 3, padding=1)
        self.time_embedding = nn.Module()
        self.time_embedding.linear_1 = nn.Linear(ch[0], temb)
        self.time_embedding.linear_2 = nn.Linear(temb, temb)
        self.add_embedding = nn.Module()
        self.add_embedding.linear_1 = nn.Linear(cfg.addition_embed_input_dim, temb)
        self.add_embedding.linear_2 = nn.Linear(temb, temb)

        def make_tf(dim, depth, heads):
            return Transformer2D(dim, depth, cfg.cross_attention_dim, heads,
                                 g, cfg.ff_mult)

        self.down_blocks = nn.ModuleList()
        cout = ch[0]
        for i in range(cfg.num_blocks):
            cin, cout = cout, ch[i]
            block = nn.Module()
            block.resnets = nn.ModuleList(
                [ResnetBlock(cin if j == 0 else cout, cout, temb, g)
                 for j in range(cfg.layers_per_block)])
            if cfg.transformer_layers[i] > 0:
                block.attentions = nn.ModuleList(
                    [make_tf(cout, cfg.transformer_layers[i], cfg.num_heads[i])
                     for _ in range(cfg.layers_per_block)])
            else:
                block.attentions = None
            if i < cfg.num_blocks - 1:
                ds = nn.Module()
                ds.conv = nn.Conv2d(cout, cout, 3, stride=2, padding=1)
                block.downsamplers = nn.ModuleList([ds])
            else:
                block.downsamplers = None
            self.down_blocks.append(block)

        cmid = ch[-1]
        self.mid_block = nn.Module()
        self.mid_block.resnets = nn.ModuleList(
            [ResnetBlock(cmid, cmid, temb, g), ResnetBlock(cmid, cmid, temb, g)])
        self.mid_block.attentions = nn.ModuleList(
            [make_tf(cmid, cfg.mid_transformer_layers, cfg.num_heads[-1])])

        self.up_blocks = nn.ModuleList()
        rev = list(reversed(ch))
        rev_layers = list(reversed(cfg.transformer_layers))
        rev_heads = list(reversed(cfg.num_heads))
        prev_out = ch[-1]
        for i in range(cfg.num_blocks):
            cout = rev[i]
            cin = rev[min(i + 1, cfg.num_blocks - 1)]
            block = nn.Module()
            resnets = []
            for j in range(cfg.layers_per_block + 1):
                skip_ch = cin if j == cfg.layers_per_block else cout
                res_in = prev_out if j == 0 else cout
                resnets.append(ResnetBlock(res_in + skip_ch, cout, temb, g))
            block.resnets = nn.ModuleList(resnets)
            if rev_layers[i] > 0:
                block.attentions = nn.ModuleList(
                    [make_tf(cout, rev_layers[i], rev_heads[i])
                     for _ in range(cfg.layers_per_block + 1)])
            else:
                block.attentions = None
            prev_out = cout
            if i < cfg.num_blocks - 1:
                us = nn.Module()
                us.conv = nn.Conv2d(cout, cout, 3, padding=1)
                block.upsamplers = nn.ModuleList([us])
            else:
                block.upsamplers = None
            self.up_blocks.append(block)

        self.conv_norm_out = nn.GroupNorm(g, ch[0], eps=1e-5)
        self.conv_out = nn.Conv2d(ch[0], cfg.out_channels, 3, padding=1)

    def forward(self, sample, timesteps, encoder_hidden_states, pooled, time_ids):
        cfg = self.cfg
        temb = sinusoidal_embedding(timesteps, cfg.block_out_channels[0])
        temb = self.time_embedding.linear_2(
            F.silu(self.time_embedding.linear_1(temb)))
        b = time_ids.shape[0]
        add_t = sinusoidal_embedding(time_ids.reshape(-1),
                                     cfg.addition_time_embed_dim)
        add_t = add_t.reshape(b, cfg.num_time_ids * cfg.addition_time_embed_dim)
        add_emb = torch.cat([pooled.float(), add_t], dim=-1)
        add_emb = self.add_embedding.linear_2(
            F.silu(self.add_embedding.linear_1(add_emb)))
        temb = temb + add_emb

        x = self.conv_in(sample)
        skips = [x]
        for block in self.down_blocks:
            for j, res in enumerate(block.resnets):
                x = res(x, temb)
                if block.attentions is not None:
                    x = block.attentions[j](x, encoder_hidden_states)
                skips.append(x)
            if block.downsamplers is not None:
                x = block.downsamplers[0].conv(x)
                skips.append(x)

        x = self.mid_block.resnets[0](x, temb)
        x = self.mid_block.attentions[0](x, encoder_hidden_states)
        x = self.mid_block.resnets[1](x, temb)

        for block in self.up_blocks:
            for j, res in enumerate(block.resnets):
                x = torch.cat([x, skips.pop()], dim=1)
                x = res(x, temb)
                if block.attentions is not None:
                    x = block.attentions[j](x, encoder_hidden_states)
            if block.upsamplers is not None:
                x = F.interpolate(x, scale_factor=2.0, mode="nearest")
                x = block.upsamplers[0].conv(x)

        x = F.silu(self.conv_norm_out(x))
        return self.conv_out(x)


def load_diffusers_state(model: TwinUNet, state: dict) -> None:
    """Load a diffusers-format state_dict (torch layouts, dotted names)."""
    tensors = {k: torch.as_tensor(v) for k, v in state.items()}
    missing, unexpected = model.load_state_dict(tensors, strict=True)
    assert not missing and not unexpected
