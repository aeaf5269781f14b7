"""On-disk latent/text-embedding cache: keys, index, payload IO.

Same cache *semantics* as the reference's torch-pickle cache
(/root/reference/training_utils/caching/cache.py, train.py:1245-1435) — the
same option-key partitions drive incremental invalidation:

* image-layout options (bucket ladder, resolution, multi-bucket, caption
  source) — a mismatch invalidates the whole dataset index;
* text options (dtype, chunking, json types) — invalidate ``*_te`` payloads;
* latent options (dtype, normalization, VAE identity incl. file stat) —
  invalidate ``*_lat`` payloads.

The *storage* is TPU-native instead of torch pickle: tensors in safetensors
files (zero-copy mmap reads, bf16 support via the flax backend) with JSON
metadata, and a JSON ``dataset_index.json`` written atomically.  File naming
mirrors the reference (``{stem}[_mbN][_json_<type>]_te`` / ``{stem}_lat``,
cache dirs ``.precomputed_embeddings_cache_{standard_sdxl,rf}``) so the GUI's
per-folder cache tools keep working.
"""

from __future__ import annotations

import json
import os
import re
from pathlib import Path

import numpy as np

CACHE_SCHEMA_VERSION = 1
CACHE_OPTIONS_VERSION = 13
CACHE_INDEX_NAME = "dataset_index.json"
IMAGE_EXTENSIONS = (".jpg", ".jpeg", ".png", ".webp", ".bmp")
TE_SUFFIX = "_te.safetensors"
LAT_SUFFIX = "_lat.safetensors"

SDXL_CACHE_DIR_STANDARD = ".precomputed_embeddings_cache_standard_sdxl"
SDXL_CACHE_DIR_RF = ".precomputed_embeddings_cache_rf"

_JSON_VARIANT_RE = re.compile(r"_json_(tags|nl|tags_nl|nl_tags)$")
_MB_RE = re.compile(r"_mb\d+$")

CACHE_IMAGE_LAYOUT_OPTION_KEYS = (
    "cache_schema_version",
    "bucket_layout",
    "max_bucket_resolution",
    "should_upscale",
    "multi_bucket_enabled",
    "multi_bucket_extra_buckets",
    "caption_source_type",
)
CACHE_TEXT_OPTION_KEYS = (
    "cache_schema_version",
    "text_cache_float_dtype",
    "caption_source_type",
    "caption_json_types",
    "caption_chunking_enabled",
    "caption_embedding_layout",
)
CACHE_LATENT_OPTION_KEYS = (
    "cache_schema_version",
    "vae_cache_float_dtype",
    "vae_normalization_mode",
    "vae_shift_factor",
    "vae_scaling_factor",
    "vae_latent_channels",
    "vae_path",
    "vae_source_path",
    "vae_source_size",
    "vae_source_mtime_ns",
)


def sdxl_cache_dir_name(is_rectified_flow: bool) -> str:
    return SDXL_CACHE_DIR_RF if is_rectified_flow else SDXL_CACHE_DIR_STANDARD


# --------------------------------------------------------------------------
# Option matching
# --------------------------------------------------------------------------

def options_match(cached, expected, keys) -> bool:
    if not isinstance(cached, dict) or not isinstance(expected, dict):
        return False
    return all(cached.get(k) == expected.get(k) for k in keys)


def image_layout_options_match(cached, expected) -> bool:
    return options_match(cached, expected, CACHE_IMAGE_LAYOUT_OPTION_KEYS)


def text_options_match(cached, expected) -> bool:
    return options_match(cached, expected, CACHE_TEXT_OPTION_KEYS)


def latent_options_match(cached, expected) -> bool:
    return options_match(cached, expected, CACHE_LATENT_OPTION_KEYS)


def cache_options_for_config(config) -> dict:
    """The version-13 cache option schema (parity: train.py:1245-1283)."""
    from .captions import CAPTION_JSON_TYPES, caption_source_type
    from .buckets import BUCKET_LAYOUT_VERSION, max_bucket_resolution_for_config

    vae_source = vae_source_for_config(config)
    vae_source_path, vae_source_size, vae_source_mtime_ns = "", None, None
    if vae_source:
        try:
            resolved = Path(vae_source).resolve()
            vae_source_path = str(resolved)
            if resolved.exists():
                stat = resolved.stat()
                vae_source_size = stat.st_size
                vae_source_mtime_ns = stat.st_mtime_ns
        except OSError:
            vae_source_path = str(vae_source)

    multi_bucket = bool(getattr(config, "MULTI_BUCKET_ENABLED", False))
    return {
        "version": CACHE_OPTIONS_VERSION,
        "cache_schema_version": CACHE_SCHEMA_VERSION,
        "bucket_layout": BUCKET_LAYOUT_VERSION,
        "text_cache_float_dtype": str(getattr(config, "TEXT_CACHE_PRECISION", "bfloat16")),
        "vae_cache_float_dtype": str(getattr(config, "VAE_CACHE_PRECISION", "bfloat16")),
        "max_bucket_resolution": max_bucket_resolution_for_config(config),
        "should_upscale": bool(getattr(config, "SHOULD_UPSCALE", False)),
        "caption_embedding_layout": "fixed_total_chunks",
        "caption_source_type": caption_source_type(config),
        "caption_json_types": list(CAPTION_JSON_TYPES),
        "caption_chunking_enabled": bool(getattr(config, "CAPTION_CHUNKING_ENABLED", False)),
        "multi_bucket_enabled": multi_bucket,
        "multi_bucket_extra_buckets": (
            int(getattr(config, "MULTI_BUCKET_EXTRA_BUCKETS", 0) or 0)
            if multi_bucket else 0),
        "vae_normalization_mode": getattr(config, "VAE_NORMALIZATION_MODE", "scalar"),
        "vae_shift_factor": getattr(config, "VAE_SHIFT_FACTOR", None),
        "vae_scaling_factor": getattr(config, "VAE_SCALING_FACTOR", None),
        "vae_latent_channels": getattr(config, "VAE_LATENT_CHANNELS", None),
        "vae_path": str(getattr(config, "VAE_PATH", "") or ""),
        "vae_source_path": vae_source_path,
        "vae_source_size": vae_source_size,
        "vae_source_mtime_ns": vae_source_mtime_ns,
    }


def vae_source_for_config(config):
    vae_path = getattr(config, "VAE_PATH", None)
    if vae_path and Path(vae_path).exists():
        return vae_path
    return getattr(config, "SINGLE_FILE_CHECKPOINT_PATH", None)


# --------------------------------------------------------------------------
# Index
# --------------------------------------------------------------------------

def index_path(cache_dir) -> Path:
    return Path(cache_dir) / CACHE_INDEX_NAME


def index_exists(cache_dir) -> bool:
    return index_path(cache_dir).exists()


def load_index(cache_dir_or_path) -> dict:
    path = Path(cache_dir_or_path)
    if path.is_dir():
        path = index_path(path)
    with open(path, "r", encoding="utf-8") as f:
        return json.load(f)


def save_index(cache_dir, payload: dict) -> Path:
    cache_dir = Path(cache_dir)
    cache_dir.mkdir(parents=True, exist_ok=True)
    path = index_path(cache_dir)
    tmp = path.with_suffix(path.suffix + ".tmp")
    with open(tmp, "w", encoding="utf-8") as f:
        json.dump(payload, f, ensure_ascii=False)
    tmp.replace(path)
    return path


def stable_cache_item_key(item: dict):
    """Deterministic ordering of cached variants regardless of fs traversal
    (parity: cache.py:113-121)."""
    target_size = tuple(item.get("target_size", (0, 0)))
    return (
        str(item.get("relative_path", item.get("image_key", ""))).replace("\\", "/").casefold(),
        int(item.get("bucket_variant_index", 0) or 0),
        target_size,
        str(item.get("lat_path", item.get("te_path", ""))).replace("\\", "/").casefold(),
    )


# --------------------------------------------------------------------------
# Paths and stems
# --------------------------------------------------------------------------

def collect_image_paths(root) -> list[Path]:
    root = Path(root)
    return sorted(
        (p for ext in IMAGE_EXTENSIONS for p in root.rglob(f"*{ext}")),
        key=lambda p: p.relative_to(root).as_posix().casefold(),
    )


def cache_stem_for_image(root, image_path) -> str:
    return str(Path(image_path).relative_to(root).with_suffix("")).replace(os.sep, "_")


def strip_json_caption_suffix(stem: str) -> str:
    return _JSON_VARIANT_RE.sub("", str(stem))


def json_caption_cache_suffix(caption_type: str, enabled: bool = True) -> str:
    return f"_json_{caption_type}" if enabled else ""


def te_path_for(cache_dir, stem: str, caption_type: str = "txt",
                json_mode: bool = False) -> Path:
    return Path(cache_dir) / (
        f"{stem}{json_caption_cache_suffix(caption_type, json_mode)}{TE_SUFFIX}")


def lat_path_for(cache_dir, stem: str) -> Path:
    return Path(cache_dir) / f"{stem}{LAT_SUFFIX}"


def item_stem_from_te_path(path) -> str | None:
    name = Path(path).name
    if not name.endswith(TE_SUFFIX):
        return None
    return strip_json_caption_suffix(name[: -len(TE_SUFFIX)])


def base_stem_from_te_path(path) -> str | None:
    stem = item_stem_from_te_path(path)
    return None if stem is None else _MB_RE.sub("", stem)


def base_stem_from_cache_path(path) -> str | None:
    path = Path(path)
    if path.name.endswith(TE_SUFFIX):
        return base_stem_from_te_path(path)
    if path.name.endswith(LAT_SUFFIX):
        return _MB_RE.sub("", path.name[: -len(LAT_SUFFIX)])
    return None


def te_paths_for_index_item(item: dict) -> list[str]:
    variants = item.get("caption_variants")
    if isinstance(variants, dict):
        return [v["te_path"] for v in variants.values()
                if isinstance(v, dict) and v.get("te_path")]
    path = item.get("te_path")
    return [path] if path else []


def selected_te_path(item: dict, rng, weights: dict, enabled: bool = True):
    """Weighted caption-variant pick for one sample (cache.py:238-246)."""
    from .captions import CAPTION_JSON_PRIMARY_TYPE, choose_caption_variant
    variants = item.get("caption_variants")
    if enabled and isinstance(variants, dict):
        available = {k: weights.get(k, 0) for k in variants}
        chosen = choose_caption_variant(rng, available)
        variant = (variants.get(chosen) or variants.get(CAPTION_JSON_PRIMARY_TYPE)
                   or next(iter(variants.values())))
        if isinstance(variant, dict) and variant.get("te_path"):
            return variant["te_path"]
    return item.get("te_path")


def remove_cache_files_for_stem(cache_dir, base_stem: str) -> None:
    from .captions import CAPTION_JSON_TYPES
    name_re = re.compile(
        rf"^{re.escape(str(base_stem))}"
        rf"(?:_mb\d+)?"
        rf"(?:_json_(?:{'|'.join(CAPTION_JSON_TYPES)}))?"
        rf"_(?:te|lat)\.safetensors$")
    for path in Path(cache_dir).glob("*.safetensors"):
        if name_re.match(path.name):
            try:
                path.unlink()
            except OSError as e:
                print(f"WARNING: Could not remove stale cache file {path}: {e}")


# --------------------------------------------------------------------------
# File signatures
# --------------------------------------------------------------------------

def file_stat_signature(path) -> dict:
    path = Path(path)
    if not path.exists():
        return {"exists": False, "path": str(path)}
    stat = path.stat()
    return {"exists": True, "path": str(path), "size": stat.st_size,
            "mtime_ns": stat.st_mtime_ns}


def caption_file_signature(image_path, caption_mode="txt") -> dict:
    from .captions import caption_source_type
    mode = caption_source_type(caption_mode)
    sidecar = Path(image_path).with_suffix(".json" if mode == "json" else ".txt")
    sig = file_stat_signature(sidecar)
    sig["mode"] = mode
    return sig


def cached_file_signatures_match(item: dict, image_path, caption_mode):
    """True/False when signatures recorded; None when absent (caller falls
    back to content hashing) — parity: cache.py:153-161."""
    image_sig = item.get("image_file_signature")
    caption_sig = item.get("caption_file_signature")
    if not image_sig or not caption_sig:
        return None
    return (image_sig == file_stat_signature(image_path)
            and caption_sig == caption_file_signature(image_path, caption_mode))


# --------------------------------------------------------------------------
# Payload IO (safetensors + JSON metadata)
# --------------------------------------------------------------------------

def save_payload(path, tensors: dict, meta: dict) -> None:
    """Write arrays + JSON metadata atomically."""
    from safetensors.flax import save_file
    import jax.numpy as jnp
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    tmp = path.with_name(path.name + ".tmp")
    arrays = {k: jnp.asarray(v) for k, v in tensors.items()}
    save_file(arrays, str(tmp), metadata={"json": json.dumps(meta)})
    tmp.replace(path)


def load_payload(path) -> tuple[dict, dict]:
    """Returns (tensors as numpy/jnp arrays, metadata dict).

    Uses the native mmap reader (data/fast_io.py, csrc/) when built; falls
    back to the safetensors library otherwise.
    """
    from . import fast_io
    if fast_io.available():
        from ..ckpt.safetensors_io import numpy_dtype_for
        import struct as _struct
        with open(path, "rb") as f:
            (n,) = _struct.unpack("<Q", f.read(8))
            header = json.loads(f.read(n))
        meta = json.loads((header.pop("__metadata__", {}) or {}).get("json", "{}"))
        tensors = {}
        ok = True
        for key, spec in header.items():
            arr = fast_io.read_tensor(path, key,
                                      numpy_dtype_for(spec["dtype"]),
                                      spec["shape"])
            if arr is None:
                ok = False
                break
            tensors[key] = arr
        if ok:
            return tensors, meta

    from safetensors import safe_open
    tensors = {}
    with safe_open(str(path), framework="flax") as f:
        meta_raw = f.metadata() or {}
        for key in f.keys():
            tensors[key] = f.get_tensor(key)
    meta = json.loads(meta_raw.get("json", "{}"))
    return tensors, meta


def load_payload_meta(path) -> dict:
    from safetensors import safe_open
    with safe_open(str(path), framework="flax") as f:
        meta_raw = f.metadata() or {}
    return json.loads(meta_raw.get("json", "{}"))
