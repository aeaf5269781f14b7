"""CLIP text encoders (ViT-L/14 + OpenCLIP bigG) in JAX for SDXL caching.

The reference embeds captions with the two SDXL text encoders pulled from a
diffusers pipeline (/root/reference/train.py:1193-1225): penultimate hidden
states of both encoders concatenated (768 + 1280 = 2048) and the bigG
projected pooled output.  This module re-implements both towers functionally
so embeddings compute as one jitted batched pass on TPU, loading weights
straight from the SD single-file checkpoint:

* ``conditioner.embedders.0.transformer.text_model.*`` — CLIP-L, HF layout,
  quick-GELU MLP;
* ``conditioner.embedders.1.model.*`` — bigG, OpenCLIP layout (fused
  ``in_proj`` attention weights, exact GELU, ``text_projection``).

Both load into one canonical param schema so a single forward serves both.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp

Params = dict[str, jax.Array]

CLIP_L_PREFIX = "conditioner.embedders.0.transformer.text_model."
CLIP_BIGG_PREFIX = "conditioner.embedders.1.model."


@dataclass(frozen=True)
class ClipTextConfig:
    vocab_size: int = 49408
    width: int = 768
    num_layers: int = 12
    num_heads: int = 12
    max_length: int = 77
    activation: str = "quick_gelu"     # quick_gelu (CLIP-L) | gelu (bigG)
    projection_dim: int | None = None  # bigG: 1280
    eos_token_id: int = 49407

    @property
    def head_dim(self) -> int:
        return self.width // self.num_heads


CLIP_L = ClipTextConfig()
CLIP_BIGG = ClipTextConfig(width=1280, num_layers=32, num_heads=20,
                           activation="gelu", projection_dim=1280)

# Tiny topology-identical config for tests.
TINY_CLIP = ClipTextConfig(vocab_size=128, width=32, num_layers=2, num_heads=4,
                           max_length=16, projection_dim=24, eos_token_id=127)


def _layer_norm(params: Params, name: str, x: jax.Array,
                eps: float = 1e-5) -> jax.Array:
    xf = x.astype(jnp.float32)
    mean = xf.mean(-1, keepdims=True)
    var = xf.var(-1, keepdims=True)
    xf = (xf - mean) * jax.lax.rsqrt(var + eps)
    return (xf * params[f"{name}.weight"].astype(jnp.float32)
            + params[f"{name}.bias"].astype(jnp.float32)).astype(x.dtype)


def _linear(params: Params, name: str, x: jax.Array) -> jax.Array:
    y = jnp.dot(x, params[f"{name}.weight"].astype(x.dtype))
    bias = params.get(f"{name}.bias")
    return y if bias is None else y + bias.astype(y.dtype)


def _activation(name: str, x: jax.Array) -> jax.Array:
    if name == "quick_gelu":
        return x * jax.nn.sigmoid(1.702 * x)
    return jax.nn.gelu(x, approximate=False)


def _causal_self_attention(params: Params, prefix: str, x: jax.Array,
                           cfg: ClipTextConfig) -> jax.Array:
    b, s, c = x.shape
    h, d = cfg.num_heads, cfg.head_dim
    q = _linear(params, f"{prefix}.q", x).reshape(b, s, h, d)
    k = _linear(params, f"{prefix}.k", x).reshape(b, s, h, d)
    v = _linear(params, f"{prefix}.v", x).reshape(b, s, h, d)
    logits = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                        preferred_element_type=jnp.float32) * (d ** -0.5)
    causal = jnp.tril(jnp.ones((s, s), jnp.bool_))
    logits = jnp.where(causal[None, None], logits, -1e30)
    probs = jax.nn.softmax(logits.astype(jnp.float32), -1).astype(x.dtype)
    out = jnp.einsum("bhqk,bkhd->bqhd", probs, v).reshape(b, s, c)
    return _linear(params, f"{prefix}.out", out)


def _encoder_layer(params: Params, prefix: str, x: jax.Array,
                   cfg: ClipTextConfig) -> jax.Array:
    x = x + _causal_self_attention(params, f"{prefix}.attn",
                                   _layer_norm(params, f"{prefix}.ln1", x), cfg)
    h = _linear(params, f"{prefix}.fc1", _layer_norm(params, f"{prefix}.ln2", x))
    h = _linear(params, f"{prefix}.fc2", _activation(cfg.activation, h))
    return x + h


def clip_text_forward(params: Params, token_ids: jax.Array,
                      cfg: ClipTextConfig, *, compute_dtype=jnp.float32):
    """token_ids: (B, L) int32. Returns (penultimate_hidden, pooled_projected).

    ``penultimate_hidden`` is hidden_states[-2] (output of layer N-2 input to
    the final layer), matching the reference's embedding recipe.  ``pooled``
    is the projected EOS-position feature of the *final* layer norm output,
    or None when the tower has no projection (CLIP-L in SDXL).
    """
    b, s = token_ids.shape
    tok = params["token_embedding"][token_ids].astype(compute_dtype)
    pos = params["position_embedding"][:s].astype(compute_dtype)
    x = tok + pos[None]

    penultimate = None
    for i in range(cfg.num_layers):
        if i == cfg.num_layers - 1:
            penultimate = x
        x = _encoder_layer(params, f"layers.{i}", x, cfg)

    if "projection" not in params:
        return penultimate, None
    final = _layer_norm(params, "final_ln", x)
    # EOS position: first occurrence of the EOS id (argmax over == mask)
    eos_pos = jnp.argmax((token_ids == cfg.eos_token_id).astype(jnp.int32), axis=1)
    pooled = final[jnp.arange(b), eos_pos]
    pooled = jnp.dot(pooled, params["projection"].astype(pooled.dtype))
    return penultimate, pooled


def encode_dual_towers(params_l: Params, params_g: Params, tokens_l: jax.Array,
                       tokens_g: jax.Array, *, cfg_l: ClipTextConfig = CLIP_L,
                       cfg_g: ClipTextConfig = CLIP_BIGG,
                       compute_dtype=jnp.float32):
    """SDXL text conditioning: concat penultimate hiddens, bigG pooled.

    tokens_*: (B*chunks, 77). Returns (embeds (B*chunks, 77, 2048),
    pooled (B*chunks, 1280)); chunk reshaping happens in the cache pipeline.
    """
    hidden_l, _ = clip_text_forward(params_l, tokens_l, cfg_l,
                                    compute_dtype=compute_dtype)
    hidden_g, pooled = clip_text_forward(params_g, tokens_g, cfg_g,
                                         compute_dtype=compute_dtype)
    return jnp.concatenate([hidden_l, hidden_g], axis=-1), pooled


def detect_clip_l_config(sd_tensors: dict) -> ClipTextConfig:
    """Infer the CLIP-L tower's shape from checkpoint tensors."""
    p = CLIP_L_PREFIX
    tok = sd_tensors[f"{p}embeddings.token_embedding.weight"]
    pos = sd_tensors[f"{p}embeddings.position_embedding.weight"]
    n = 0
    while f"{p}encoder.layers.{n}.layer_norm1.weight" in sd_tensors:
        n += 1
    width = int(tok.shape[1])
    return ClipTextConfig(vocab_size=int(tok.shape[0]), width=width,
                          num_layers=n, num_heads=max(1, width // 64),
                          max_length=int(pos.shape[0]),
                          activation="quick_gelu", projection_dim=None,
                          eos_token_id=int(tok.shape[0]) - 1)


def detect_clip_bigg_config(sd_tensors: dict) -> ClipTextConfig:
    p = CLIP_BIGG_PREFIX
    tok = sd_tensors[f"{p}token_embedding.weight"]
    pos = sd_tensors[f"{p}positional_embedding"]
    proj = sd_tensors[f"{p}text_projection"]
    n = 0
    while f"{p}transformer.resblocks.{n}.ln_1.weight" in sd_tensors:
        n += 1
    width = int(tok.shape[1])
    return ClipTextConfig(vocab_size=int(tok.shape[0]), width=width,
                          num_layers=n, num_heads=max(1, width // 64),
                          max_length=int(pos.shape[0]), activation="gelu",
                          projection_dim=int(proj.shape[1]),
                          eos_token_id=int(tok.shape[0]) - 1)


# --------------------------------------------------------------------------
# Loaders from SD single-file checkpoints
# --------------------------------------------------------------------------

def _t(x):
    return jnp.transpose(jnp.asarray(x), (1, 0))


def clip_l_params_from_sd(sd_tensors: dict, dtype=jnp.float32,
                          num_layers: int | None = None) -> Params:
    """HF-transformers layout under conditioner.embedders.0 (CLIP-L)."""
    p = CLIP_L_PREFIX
    if num_layers is None:
        num_layers = detect_clip_l_config(sd_tensors).num_layers
    params: Params = {
        "token_embedding": jnp.asarray(
            sd_tensors[f"{p}embeddings.token_embedding.weight"]).astype(dtype),
        "position_embedding": jnp.asarray(
            sd_tensors[f"{p}embeddings.position_embedding.weight"]).astype(dtype),
        "final_ln.weight": jnp.asarray(sd_tensors[f"{p}final_layer_norm.weight"]).astype(dtype),
        "final_ln.bias": jnp.asarray(sd_tensors[f"{p}final_layer_norm.bias"]).astype(dtype),
    }
    for i in range(num_layers):
        src = f"{p}encoder.layers.{i}."
        dst = f"layers.{i}."
        for a, b in (("layer_norm1", "ln1"), ("layer_norm2", "ln2")):
            params[f"{dst}{b}.weight"] = jnp.asarray(sd_tensors[f"{src}{a}.weight"]).astype(dtype)
            params[f"{dst}{b}.bias"] = jnp.asarray(sd_tensors[f"{src}{a}.bias"]).astype(dtype)
        for a, b in (("self_attn.q_proj", "attn.q"), ("self_attn.k_proj", "attn.k"),
                     ("self_attn.v_proj", "attn.v"), ("self_attn.out_proj", "attn.out"),
                     ("mlp.fc1", "fc1"), ("mlp.fc2", "fc2")):
            params[f"{dst}{b}.weight"] = _t(sd_tensors[f"{src}{a}.weight"]).astype(dtype)
            params[f"{dst}{b}.bias"] = jnp.asarray(sd_tensors[f"{src}{a}.bias"]).astype(dtype)
    return params


def clip_bigg_params_from_sd(sd_tensors: dict, dtype=jnp.float32,
                             num_layers: int | None = None) -> Params:
    """OpenCLIP layout under conditioner.embedders.1 (bigG): fused in_proj."""
    p = CLIP_BIGG_PREFIX
    if num_layers is None:
        num_layers = detect_clip_bigg_config(sd_tensors).num_layers
    params: Params = {
        "token_embedding": jnp.asarray(sd_tensors[f"{p}token_embedding.weight"]).astype(dtype),
        "position_embedding": jnp.asarray(sd_tensors[f"{p}positional_embedding"]).astype(dtype),
        "final_ln.weight": jnp.asarray(sd_tensors[f"{p}ln_final.weight"]).astype(dtype),
        "final_ln.bias": jnp.asarray(sd_tensors[f"{p}ln_final.bias"]).astype(dtype),
        # OpenCLIP text_projection multiplies on the right already: (D, P)
        "projection": jnp.asarray(sd_tensors[f"{p}text_projection"]).astype(dtype),
    }
    for i in range(num_layers):
        src = f"{p}transformer.resblocks.{i}."
        dst = f"layers.{i}."
        for a, b in (("ln_1", "ln1"), ("ln_2", "ln2")):
            params[f"{dst}{b}.weight"] = jnp.asarray(sd_tensors[f"{src}{a}.weight"]).astype(dtype)
            params[f"{dst}{b}.bias"] = jnp.asarray(sd_tensors[f"{src}{a}.bias"]).astype(dtype)
        in_w = jnp.asarray(sd_tensors[f"{src}attn.in_proj_weight"])  # (3D, D)
        in_b = jnp.asarray(sd_tensors[f"{src}attn.in_proj_bias"])    # (3D,)
        d = in_w.shape[1]
        for j, name in enumerate(("q", "k", "v")):
            params[f"{dst}attn.{name}.weight"] = jnp.transpose(
                in_w[j * d:(j + 1) * d], (1, 0)).astype(dtype)
            params[f"{dst}attn.{name}.bias"] = in_b[j * d:(j + 1) * d].astype(dtype)
        params[f"{dst}attn.out.weight"] = _t(sd_tensors[f"{src}attn.out_proj.weight"]).astype(dtype)
        params[f"{dst}attn.out.bias"] = jnp.asarray(sd_tensors[f"{src}attn.out_proj.bias"]).astype(dtype)
        params[f"{dst}fc1.weight"] = _t(sd_tensors[f"{src}mlp.c_fc.weight"]).astype(dtype)
        params[f"{dst}fc1.bias"] = jnp.asarray(sd_tensors[f"{src}mlp.c_fc.bias"]).astype(dtype)
        params[f"{dst}fc2.weight"] = _t(sd_tensors[f"{src}mlp.c_proj.weight"]).astype(dtype)
        params[f"{dst}fc2.bias"] = jnp.asarray(sd_tensors[f"{src}mlp.c_proj.bias"]).astype(dtype)
    return params


def init_clip_params(cfg: ClipTextConfig, key: jax.Array,
                     dtype=jnp.float32) -> Params:
    """Random init matching the canonical schema (tests / from-scratch)."""
    params: Params = {}
    k_iter = iter(jax.random.split(key, 6 + cfg.num_layers * 8))

    def nrm(shape, scale=0.02):
        return (jax.random.normal(next(k_iter), shape, jnp.float32) * scale).astype(dtype)

    params["token_embedding"] = nrm((cfg.vocab_size, cfg.width))
    params["position_embedding"] = nrm((cfg.max_length, cfg.width))
    params["final_ln.weight"] = jnp.ones((cfg.width,), dtype)
    params["final_ln.bias"] = jnp.zeros((cfg.width,), dtype)
    if cfg.projection_dim:
        params["projection"] = nrm((cfg.width, cfg.projection_dim))
    for i in range(cfg.num_layers):
        d = f"layers.{i}."
        for ln in ("ln1", "ln2"):
            params[f"{d}{ln}.weight"] = jnp.ones((cfg.width,), dtype)
            params[f"{d}{ln}.bias"] = jnp.zeros((cfg.width,), dtype)
        for name, shape in (("attn.q", (cfg.width, cfg.width)),
                            ("attn.k", (cfg.width, cfg.width)),
                            ("attn.v", (cfg.width, cfg.width)),
                            ("attn.out", (cfg.width, cfg.width)),
                            ("fc1", (cfg.width, cfg.width * 4)),
                            ("fc2", (cfg.width * 4, cfg.width))):
            params[f"{d}{name}.weight"] = nrm(shape)
            params[f"{d}{name}.bias"] = jnp.zeros((shape[1],), dtype)
    return params
