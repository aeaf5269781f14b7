"""SDXL UNet key mapping: diffusers (HF) names <-> SD single-file names.

The reference saves trained UNets by merging HF-named tensors back into the
base ``model.diffusion_model.*`` checkpoint via a generated mapping
(/root/reference/train.py:2418-2465).  We need the mapping in both directions
— SD->HF to load a stock single-file checkpoint into our flat param dict, and
HF->SD to merge trained weights back into an SD-WebUI/ComfyUI-loadable file.

This implementation derives each key structurally (parse the HF name, emit
the SD name) instead of chained string replacement; the result set is golden-
tested against known pairs, including the SDXL quirks:

* up-block upsamplers sit at SD module index 2 when the up block has
  attentions (SDXL up blocks 0/1), index 1 otherwise;
* mid-block modules are a flat [res, attn, res] list (``middle_block.{0,1,2}``).
"""

from __future__ import annotations

SD_PREFIX = "model.diffusion_model."

_RESNET_PART_MAP = {
    "norm1": "in_layers.0",
    "conv1": "in_layers.2",
    "norm2": "out_layers.0",
    "conv2": "out_layers.3",
    "time_emb_proj": "emb_layers.1",
    "conv_shortcut": "skip_connection",
}

_STATIC_MAP = {
    "time_embedding.linear_1": "time_embed.0",
    "time_embedding.linear_2": "time_embed.2",
    "add_embedding.linear_1": "label_emb.0.0",
    "add_embedding.linear_2": "label_emb.0.2",
    "conv_in": "input_blocks.0.0",
    "conv_norm_out": "out.0",
    "conv_out": "out.2",
}

# SDXL: up blocks 0 and 1 carry attentions, so their upsampler is the third
# module (index 2) inside the SD output block; a plain up block's upsampler
# is the second (index 1).
_SDXL_UP_HAS_ATTN = (True, True, False)


def hf_to_sd_name(hf_name: str, *, up_has_attn=_SDXL_UP_HAS_ATTN) -> str:
    """Map one diffusers UNet tensor name to its SD single-file name."""
    name = hf_name
    suffix = ""
    for s in (".weight", ".bias"):
        if name.endswith(s):
            name, suffix = name[: -len(s)], s
            break

    def emit(base: str) -> str:
        return f"{SD_PREFIX}{base}{suffix}"

    if name in _STATIC_MAP:
        return emit(_STATIC_MAP[name])

    parts = name.split(".")
    if parts[0] == "down_blocks":
        i, kind, j = int(parts[1]), parts[2], int(parts[3])
        rest = ".".join(parts[4:])
        if kind == "resnets":
            return emit(f"input_blocks.{3 * i + j + 1}.0.{_RESNET_PART_MAP.get(rest, rest)}")
        if kind == "attentions":
            return emit(f"input_blocks.{3 * i + j + 1}.1.{rest}")
        if kind == "downsamplers":
            # parts: down_blocks.i.downsamplers.0.conv
            return emit(f"input_blocks.{3 * (i + 1)}.0.op")
    if parts[0] == "up_blocks":
        i, kind, j = int(parts[1]), parts[2], int(parts[3])
        rest = ".".join(parts[4:])
        if kind == "resnets":
            return emit(f"output_blocks.{3 * i + j}.0.{_RESNET_PART_MAP.get(rest, rest)}")
        if kind == "attentions":
            return emit(f"output_blocks.{3 * i + j}.1.{rest}")
        if kind == "upsamplers":
            slot = 2 if up_has_attn[i] else 1
            return emit(f"output_blocks.{3 * i + 2}.{slot}.{rest}")
    if parts[0] == "mid_block":
        kind, j = parts[1], int(parts[2])
        rest = ".".join(parts[3:])
        if kind == "resnets":
            return emit(f"middle_block.{2 * j}.{_RESNET_PART_MAP.get(rest, rest)}")
        if kind == "attentions":
            return emit(f"middle_block.1.{rest}")
    # Unknown key: pass through under the SD prefix (reference behavior for
    # already-prefixed keys).
    if hf_name.startswith(SD_PREFIX):
        return hf_name
    return f"{SD_PREFIX}{hf_name}"


def unet_key_mapping(hf_names: list[str]) -> dict[str, str]:
    """{hf_name: sd_name} for every tensor in the UNet state dict."""
    return {n: hf_to_sd_name(n) for n in hf_names}


def sd_to_hf_mapping(hf_names: list[str]) -> dict[str, str]:
    """{sd_name: hf_name}, inverted from the forward mapping."""
    fwd = unet_key_mapping(hf_names)
    inv = {}
    for hf, sd in fwd.items():
        if sd in inv:
            raise ValueError(f"SD key collision: {sd} <- {hf} and {inv[sd]}")
        inv[sd] = hf
    return inv
