"""Caption sidecars, JSON variants, signatures, and CLIP chunk packing.

Behavioral contract from the reference:
* ``.txt`` sidecar, falling back to the filename with underscores as spaces
  (/root/reference/train.py:1105-1131);
* ``.json`` sidecar with up to four variants (tags / nl / tags_nl / nl_tags)
  selected per-sample by configurable weights (train.py:86-96,
  cache.py:217-227);
* caption signature = sha256 of the sorted-JSON variant dict
  (train.py:1095-1098) used for cache invalidation;
* chunking: captions longer than one CLIP window are split into
  BOS + 75-token payload + EOS chunks, with the *global* max chunk count
  scanned over the dataset so every cached embedding has one fixed length
  (train.py:1134-1190).
"""

from __future__ import annotations

import hashlib
import json
import math
from pathlib import Path

CAPTION_JSON_TYPES = ("tags", "nl", "tags_nl", "nl_tags")
CAPTION_JSON_PRIMARY_TYPE = "tags_nl"


def caption_source_type(config_or_value=None) -> str:
    value = config_or_value
    if config_or_value is not None and not isinstance(config_or_value, str):
        value = getattr(config_or_value, "CAPTION_SOURCE_TYPE", "txt")
    return "json" if str(value or "txt").strip().lower() == "json" else "txt"


def json_caption_mode_enabled(config_or_value=None) -> bool:
    return caption_source_type(config_or_value) == "json"


def caption_weights_from_config(config) -> dict[str, int]:
    return {
        "tags": int(getattr(config, "CAPTION_TAGS_PERCENT", 0) or 0),
        "nl": int(getattr(config, "CAPTION_NL_PERCENT", 0) or 0),
        "tags_nl": int(getattr(config, "CAPTION_TAGS_NL_PERCENT", 0) or 0),
        "nl_tags": int(getattr(config, "CAPTION_NL_TAGS_PERCENT", 0) or 0),
    }


def read_caption_variants(image_path: Path, caption_mode="txt") -> dict[str, str]:
    image_path = Path(image_path)
    if caption_source_type(caption_mode) == "json":
        sidecar = image_path.with_suffix(".json")
        if not sidecar.exists():
            raise FileNotFoundError(f"JSON caption sidecar not found: {sidecar}")
        with open(sidecar, "r", encoding="utf-8") as f:
            data = json.load(f)
        if not isinstance(data, dict):
            raise ValueError(f"JSON caption must be an object: {sidecar}")
        variants = {
            key: data[key].strip()
            for key in CAPTION_JSON_TYPES
            if isinstance(data.get(key), str) and data[key].strip()
        }
        if not variants:
            raise ValueError(
                f"JSON caption {sidecar} must contain at least one non-empty "
                f"caption key: {', '.join(CAPTION_JSON_TYPES)}")
        return variants

    sidecar = image_path.with_suffix(".txt")
    caption = image_path.stem.replace("_", " ")
    if sidecar.exists():
        with open(sidecar, "r", encoding="utf-8", errors="ignore") as f:
            content = f.read().strip()
        if content:
            caption = content
    return {"txt": caption}


def primary_caption(variants: dict[str, str]) -> str:
    return (variants.get("txt") or variants.get(CAPTION_JSON_PRIMARY_TYPE)
            or next(iter(variants.values())))


def caption_signature(variants: dict[str, str]) -> str:
    payload = {k: variants[k] for k in sorted(variants)}
    raw = json.dumps(payload, ensure_ascii=False, sort_keys=True,
                     separators=(",", ":"))
    return hashlib.sha256(raw.encode("utf-8")).hexdigest()


def choose_caption_variant(rng, weights: dict[str, int]) -> str:
    """Weighted draw over the available JSON caption types (rng: random.Random
    or anything with .uniform)."""
    total = sum(max(0, int(weights.get(k, 0) or 0)) for k in CAPTION_JSON_TYPES)
    if total <= 0:
        return CAPTION_JSON_PRIMARY_TYPE
    roll = rng.uniform(0, total)
    upto = 0
    for key in CAPTION_JSON_TYPES:
        upto += max(0, int(weights.get(key, 0) or 0))
        if roll <= upto:
            return key
    return CAPTION_JSON_PRIMARY_TYPE


# --------------------------------------------------------------------------
# CLIP chunk packing
# --------------------------------------------------------------------------

def tokenizer_max_length(tokenizer) -> int:
    return int(getattr(tokenizer, "model_max_length", 77) or 77)


def caption_token_ids(tokenizer, caption: str) -> list[int]:
    tokenized = tokenizer(caption, add_special_tokens=False, truncation=False)
    ids = tokenized.input_ids if hasattr(tokenized, "input_ids") else tokenized["input_ids"]
    if ids and isinstance(ids[0], list):
        ids = ids[0]
    return list(ids)


def caption_chunk_count(tokenizer, caption: str) -> int:
    payload_len = max(1, tokenizer_max_length(tokenizer) - 2)
    return max(1, math.ceil(len(caption_token_ids(tokenizer, caption)) / payload_len))


def chunked_token_ids(tokenizer, caption: str, total_chunks: int) -> list[list[int]]:
    """Fixed-count BOS+payload+EOS+PAD windows; shape [total_chunks, max_len]."""
    max_len = tokenizer_max_length(tokenizer)
    payload_len = max(1, max_len - 2)
    bos = tokenizer.bos_token_id
    eos = tokenizer.eos_token_id
    pad = tokenizer.pad_token_id if tokenizer.pad_token_id is not None else eos
    ids = caption_token_ids(tokenizer, caption)
    chunks = []
    for i in range(max(1, int(total_chunks or 1))):
        payload = ids[i * payload_len:(i + 1) * payload_len]
        chunk = [bos] + payload + [eos]
        chunk += [pad] * (max_len - len(chunk))
        chunks.append(chunk[:max_len])
    return chunks


def padded_token_ids(tokenizer, caption: str) -> list[int]:
    """Single truncated max_length window (the non-chunked path)."""
    max_len = tokenizer_max_length(tokenizer)
    out = tokenizer(caption, padding="max_length", max_length=max_len,
                    truncation=True)
    ids = out.input_ids if hasattr(out, "input_ids") else out["input_ids"]
    if ids and isinstance(ids[0], list):
        ids = ids[0]
    return list(ids)
