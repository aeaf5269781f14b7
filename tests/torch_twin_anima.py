"""Independent torch twin of the Anima DiT (+LLM adapter) for parity tests.

Hand-built from the reference architecture's published semantics
(/root/reference/training_utils/anima/models/anima_dit.py — MiniTrainDIT
with use_adaln_lora, QK-RMSNorm attention, 3D NTK RoPE, GPT2 feed-forward,
concat padding-mask channel, and the 6-layer LLM adapter): standard torch
modules in the reference's NCTHW convention, so a wiring divergence in the
JAX DiT (models/anima/dit.py) shows up as a numeric mismatch.

State-dict names match ``params_to_torch_state`` (which itself matches the
reference checkpoint naming).
"""

from __future__ import annotations

import math

import torch
import torch.nn as nn
import torch.nn.functional as F


class RMSNorm(nn.Module):
    def __init__(self, dim, eps=1e-6):
        super().__init__()
        self.eps = eps
        self.weight = nn.Parameter(torch.ones(dim))

    def forward(self, x):
        xf = x.float()
        out = xf * torch.rsqrt(xf.pow(2).mean(-1, keepdim=True) + self.eps)
        return (out * self.weight.float()).to(x.dtype)


def sinusoid_b_t(timesteps_bt: torch.Tensor, dim: int) -> torch.Tensor:
    flat = timesteps_bt.flatten().float()
    half = dim // 2
    exponent = torch.exp(-math.log(10000.0)
                         * torch.arange(half, dtype=torch.float32) / half)
    emb = flat[:, None] * exponent[None, :]
    emb = torch.cat([torch.cos(emb), torch.sin(emb)], dim=-1)
    return emb.view(*timesteps_bt.shape, dim)


def rope_3d(cfg, t, h, w):
    """(L, D/2, 2, 2) rotation matrices, [t | h | w] pair frequencies."""
    d = cfg.head_dim
    dim_h = d // 6 * 2
    dim_t = d - 2 * dim_h
    h_theta = 10000.0 * cfg.rope_h_extrapolation_ratio ** (dim_h / (dim_h - 2))
    w_theta = 10000.0 * cfg.rope_w_extrapolation_ratio ** (dim_h / (dim_h - 2))
    t_theta = 10000.0 * cfg.rope_t_extrapolation_ratio ** (dim_t / (dim_t - 2))
    sp = torch.arange(0, dim_h, 2)[: dim_h // 2].float() / dim_h
    tp = torch.arange(0, dim_t, 2)[: dim_t // 2].float() / dim_t
    hf = 1.0 / h_theta ** sp
    wf = 1.0 / w_theta ** sp
    tf = 1.0 / t_theta ** tp
    et = torch.outer(torch.arange(t).float(), tf)
    eh = torch.outer(torch.arange(h).float(), hf)
    ew = torch.outer(torch.arange(w).float(), wf)

    def rot(e):  # (n, p) -> (n, p, 2, 2)
        return torch.stack([torch.cos(e), -torch.sin(e),
                            torch.sin(e), torch.cos(e)], dim=-1).view(
            *e.shape, 2, 2)

    rt, rh, rw = rot(et), rot(eh), rot(ew)
    full = torch.cat([
        rt[:, None, None].expand(t, h, w, *rt.shape[1:]),
        rh[None, :, None].expand(t, h, w, *rh.shape[1:]),
        rw[None, None, :].expand(t, h, w, *rw.shape[1:]),
    ], dim=-3)
    return full.reshape(t * h * w, d // 2, 2, 2)


def apply_rope(x: torch.Tensor, freqs: torch.Tensor) -> torch.Tensor:
    """x: (B, L, H, D); freqs: (L, D/2, 2, 2) — reference half-split pairs."""
    b, l, h, d = x.shape
    x_ = x.reshape(b, l, h, 2, d // 2).movedim(-2, -1).unsqueeze(-2).float()
    f = freqs[None, :, None]  # (1, L, 1, D/2, 2, 2)
    out = f[..., 0] * x_[..., 0] + f[..., 1] * x_[..., 1]
    return out.movedim(-1, -2).reshape(b, l, h, d).to(x.dtype)


class DiTAttention(nn.Module):
    def __init__(self, dim, ctx_dim, heads, head_dim):
        super().__init__()
        inner = heads * head_dim
        self.heads, self.hd = heads, head_dim
        self.q_proj = nn.Linear(dim, inner, bias=False)
        self.k_proj = nn.Linear(ctx_dim or dim, inner, bias=False)
        self.v_proj = nn.Linear(ctx_dim or dim, inner, bias=False)
        self.q_norm = RMSNorm(head_dim)
        self.k_norm = RMSNorm(head_dim)
        self.output_proj = nn.Linear(inner, dim, bias=False)
        self.is_self = ctx_dim is None

    def forward(self, x, context=None, rope=None):
        ctx = x if context is None else context
        b, l, _ = x.shape
        q = self.q_norm(self.q_proj(x).view(b, l, self.heads, self.hd))
        k = self.k_norm(self.k_proj(ctx).view(b, ctx.shape[1], self.heads,
                                              self.hd))
        v = self.v_proj(ctx).view(b, ctx.shape[1], self.heads, self.hd)
        if self.is_self and rope is not None:
            q = apply_rope(q, rope)
            k = apply_rope(k, rope)
        o = F.scaled_dot_product_attention(
            q.transpose(1, 2), k.transpose(1, 2), v.transpose(1, 2))
        return self.output_proj(o.transpose(1, 2).reshape(b, l, -1))


def adaln(dim, lora, n):
    return nn.Sequential(nn.SiLU(), nn.Linear(dim, lora, bias=False),
                         nn.Linear(lora, n * dim, bias=False))


class TwinBlock(nn.Module):
    def __init__(self, cfg):
        super().__init__()
        d = cfg.model_channels
        self.self_attn = DiTAttention(d, None, cfg.num_heads, cfg.head_dim)
        self.cross_attn = DiTAttention(d, cfg.crossattn_emb_channels,
                                       cfg.num_heads, cfg.head_dim)
        ff = int(d * cfg.mlp_ratio)
        self.mlp = nn.Module()
        self.mlp.layer1 = nn.Linear(d, ff, bias=False)
        self.mlp.layer2 = nn.Linear(ff, d, bias=False)
        self.adaln_modulation_self_attn = adaln(d, cfg.adaln_lora_dim, 3)
        self.adaln_modulation_cross_attn = adaln(d, cfg.adaln_lora_dim, 3)
        self.adaln_modulation_mlp = adaln(d, cfg.adaln_lora_dim, 3)

    def forward(self, x, emb, context, rope, lora):
        b, t, h, w, d = x.shape

        def chunks(mod):
            s, sc, g = (mod(emb) + lora).chunk(3, dim=-1)
            e = lambda a: a[:, :, None, None, :]
            return e(s), e(sc), e(g)

        def norm_mod(xx, shift, scale):
            return F.layer_norm(xx.float(), (d,), eps=1e-6).to(xx.dtype) \
                * (1 + scale) + shift

        s, sc, g = chunks(self.adaln_modulation_self_attn)
        n = norm_mod(x, s, sc).reshape(b, t * h * w, d)
        x = x + g * self.self_attn(n, rope=rope).view(b, t, h, w, d)
        s, sc, g = chunks(self.adaln_modulation_cross_attn)
        n = norm_mod(x, s, sc).reshape(b, t * h * w, d)
        x = x + g * self.cross_attn(n, context).view(b, t, h, w, d)
        s, sc, g = chunks(self.adaln_modulation_mlp)
        n = norm_mod(x, s, sc)
        x = x + g * self.mlp.layer2(F.gelu(self.mlp.layer1(n)))
        return x


class AdapterAttention(nn.Module):
    def __init__(self, dim, ctx_dim, heads):
        super().__init__()
        self.heads = heads
        self.hd = dim // heads
        self.q_proj = nn.Linear(dim, dim, bias=False)
        self.k_proj = nn.Linear(ctx_dim, dim, bias=False)
        self.v_proj = nn.Linear(ctx_dim, dim, bias=False)
        self.o_proj = nn.Linear(dim, dim, bias=False)
        self.q_norm = RMSNorm(self.hd)
        self.k_norm = RMSNorm(self.hd)

    @staticmethod
    def _rope(seq, hd):
        inv = 1.0 / (10000.0 ** (torch.arange(0, hd, 2).float() / hd))
        ang = torch.outer(torch.arange(seq).float(), inv)
        emb = torch.cat([ang, ang], dim=-1)
        return emb.cos(), emb.sin()

    @staticmethod
    def _apply(x, cos, sin):
        # HF convention: x*cos + rotate_half(x)*sin, (B, H, L, D)
        d2 = x.shape[-1] // 2
        rot = torch.cat([-x[..., d2:], x[..., :d2]], dim=-1)
        return x * cos + rot * sin

    def forward(self, x, context):
        b, l, dq = x.shape
        q = self.q_norm(self.q_proj(x).view(b, l, self.heads, self.hd)
                        ).transpose(1, 2)
        k = self.k_norm(self.k_proj(context).view(b, context.shape[1],
                                                  self.heads, self.hd)
                        ).transpose(1, 2)
        v = self.v_proj(context).view(b, context.shape[1], self.heads,
                                      self.hd).transpose(1, 2)
        cq, sq = self._rope(l, self.hd)
        ck, sk = self._rope(context.shape[1], self.hd)
        q = self._apply(q, cq, sq)
        k = self._apply(k, ck, sk)
        o = F.scaled_dot_product_attention(q, k, v)
        return self.o_proj(o.transpose(1, 2).reshape(b, l, dq))


class AdapterBlock(nn.Module):
    def __init__(self, src, dim, heads):
        super().__init__()
        self.norm_self_attn = RMSNorm(dim)
        self.self_attn = AdapterAttention(dim, dim, heads)
        self.norm_cross_attn = RMSNorm(dim)
        self.cross_attn = AdapterAttention(dim, src, heads)
        self.norm_mlp = RMSNorm(dim)
        self.mlp = nn.Sequential(nn.Linear(dim, dim * 4), nn.GELU(),
                                 nn.Linear(dim * 4, dim))

    def forward(self, x, context):
        x = x + self.self_attn(self.norm_self_attn(x),
                               self.norm_self_attn(x))
        x = x + self.cross_attn(self.norm_cross_attn(x), context)
        return x + self.mlp(self.norm_mlp(x))


class TwinLLMAdapter(nn.Module):
    def __init__(self, cfg):
        super().__init__()
        td = cfg.adapter_target_dim
        self.embed = nn.Embedding(cfg.adapter_vocab, td)
        self.blocks = nn.ModuleList(
            [AdapterBlock(cfg.adapter_source_dim, td, cfg.adapter_heads)
             for _ in range(cfg.adapter_layers)])
        self.out_proj = nn.Linear(td, td)
        self.norm = RMSNorm(td)

    def forward(self, source_hidden, target_ids):
        x = self.embed(target_ids).to(source_hidden.dtype)
        for blk in self.blocks:
            x = blk(x, source_hidden)
        return self.norm(self.out_proj(x))


class TwinAnimaDiT(nn.Module):
    def __init__(self, cfg):
        super().__init__()
        self.cfg = cfg
        d = cfg.model_channels
        in_c = cfg.in_channels + (1 if cfg.concat_padding_mask else 0)
        pt, ps = cfg.patch_temporal, cfg.patch_spatial
        self.x_embedder = nn.Module()
        self.x_embedder.proj = nn.ModuleList(
            [nn.Identity(), nn.Linear(in_c * pt * ps * ps, d, bias=False)])
        self.t_embedder = nn.ModuleList([nn.Identity(), nn.Module()])
        self.t_embedder[1].linear_1 = nn.Linear(d, d, bias=False)
        self.t_embedder[1].linear_2 = nn.Linear(d, 3 * d, bias=False)
        self.t_embedding_norm = RMSNorm(d)
        self.blocks = nn.ModuleList([TwinBlock(cfg)
                                     for _ in range(cfg.num_blocks)])
        self.final_layer = nn.Module()
        self.final_layer.linear = nn.Linear(
            d, ps * ps * pt * cfg.out_channels, bias=False)
        self.final_layer.adaln_modulation = adaln(d, cfg.adaln_lora_dim, 2)
        self.llm_adapter = TwinLLMAdapter(cfg)

    def forward(self, latents_bcthw, timesteps, prompt_emb, t5_ids):
        cfg = self.cfg
        pt, ps = cfg.patch_temporal, cfg.patch_spatial
        x = latents_bcthw
        b, c, t, h, w = x.shape
        pads = ((pt - t % pt) % pt, (ps - h % ps) % ps, (ps - w % ps) % ps)
        if any(pads):
            x = F.pad(x, (0, pads[2], 0, pads[1], 0, pads[0]),
                      mode="circular")
        if cfg.concat_padding_mask:
            mask = torch.zeros(b, 1, x.shape[2], x.shape[3], x.shape[4])
            x = torch.cat([x, mask], dim=1)
        # patchify: b c (t r) (h m) (w n) -> b t h w (c r m n)
        c2, tt, hh, ww = x.shape[1], x.shape[2] // pt, x.shape[3] // ps, \
            x.shape[4] // ps
        x = x.view(b, c2, tt, pt, hh, ps, ww, ps)
        x = x.permute(0, 2, 4, 6, 1, 3, 5, 7).reshape(
            b, tt, hh, ww, c2 * pt * ps * ps)
        x = self.x_embedder.proj[1](x)

        rope = rope_3d(cfg, tt, hh, ww)

        if timesteps.ndim == 1:
            timesteps = timesteps[:, None]
        sin_emb = sinusoid_b_t(timesteps, cfg.model_channels)
        lora = self.t_embedder[1].linear_2(
            F.silu(self.t_embedder[1].linear_1(sin_emb)))
        emb = self.t_embedding_norm(sin_emb)

        context = self.llm_adapter(prompt_emb, t5_ids)
        if context.shape[1] < cfg.context_tokens:
            context = F.pad(context,
                            (0, 0, 0, cfg.context_tokens - context.shape[1]))

        for blk in self.blocks:
            x = blk(x, emb, context, rope, lora)

        d = cfg.model_channels
        fl = self.final_layer.adaln_modulation(emb) + lora[..., : 2 * d]
        shift, scale = fl.chunk(2, dim=-1)
        x = F.layer_norm(x.float(), (d,), eps=1e-6).to(x.dtype) \
            * (1 + scale[:, :, None, None, :]) + shift[:, :, None, None, :]
        x = self.final_layer.linear(x)
        # unpatchify: b t h w (p1 p2 tp c) -> b c (t tp) (h p1) (w p2)
        oc = cfg.out_channels
        x = x.view(b, tt, hh, ww, ps, ps, pt, oc)
        x = x.permute(0, 7, 1, 6, 2, 4, 3, 5).reshape(
            b, oc, tt * pt, hh * ps, ww * ps)
        return x[:, :, :t, :h, :w]


def load_anima_state(model: TwinAnimaDiT, state: dict) -> None:
    tensors = {k: torch.as_tensor(v) for k, v in state.items()}
    model.load_state_dict(tensors, strict=True)
