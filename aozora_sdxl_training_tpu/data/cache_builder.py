"""Offline preprocessing: VAE-latent + dual-CLIP text-embedding cache build.

The TPU re-design of the reference's caching pass
(/root/reference/train.py:1285-1989): host-side validation/resize in a
process pool feeding *jit-compiled batched* encoder passes —

* text: all caption windows tokenized host-side, stacked, and embedded by
  one jitted dual-tower CLIP forward per batch;
* latents: images grouped by bucket resolution so each VAE encode batch is a
  single static shape (one XLA executable per bucket), normalized (scalar or
  flux_bn32) and written as safetensors payloads.

Incremental semantics match the reference exactly: option-key partitions
(cache_store), per-payload reuse validation, stale/obsolete GC, rebuilt
``dataset_index`` (version 13), and the ``null_embeds`` payload when
unconditional dropout / conditioning-scale needs it.
"""

from __future__ import annotations

from collections import defaultdict
from pathlib import Path

import numpy as np

from . import cache_store as cs
from .buckets import (get_multi_bucket_resolutions, make_bucket_variant_metadata,
                      max_bucket_resolution_for_config)
from .captions import (caption_chunk_count, caption_source_type,
                       chunked_token_ids, padded_token_ids,
                       read_caption_variants)
from .image_prep import load_and_resize_for_bucket, validate_images_parallel
from .latent_norm import apply_flux_bn32, extract_flux_bn_stats, normalize_scalar


def caption_chunking_enabled(config) -> bool:
    return bool(getattr(config, "CAPTION_CHUNKING_ENABLED", False))


def null_conditioning_cache_needed(config) -> bool:
    if bool(getattr(config, "UNCONDITIONAL_DROPOUT", False)):
        return True
    if not bool(getattr(config, "TEXT_CONDITIONING_SCALE_ENABLED", False)):
        return False
    lo = float(getattr(config, "TEXT_CONDITIONING_SCALE_MIN", 1.0))
    hi = float(getattr(config, "TEXT_CONDITIONING_SCALE_MAX", 1.0))
    return min(lo, hi) < 1.0 or max(lo, hi) > 1.0


def _multi_bucket_extra(config) -> int:
    if not getattr(config, "MULTI_BUCKET_ENABLED", False):
        return 0
    return max(0, int(getattr(config, "MULTI_BUCKET_EXTRA_BUCKETS", 0) or 0))


def null_embeds_path(root, cache_dir_name) -> Path:
    return Path(root) / cache_dir_name / "null_embeds.safetensors"


# --------------------------------------------------------------------------
# Validation: does anything need (re)caching?
# --------------------------------------------------------------------------

def check_if_caching_needed(config, include_null_cache: bool = True) -> bool:
    """Parity with train.py:1285-1435, adapted to the safetensors store."""
    cache_dir_name = cs.sdxl_cache_dir_name(getattr(config, "is_rectified_flow", False))
    expected = cs.cache_options_for_config(config)
    caption_mode = caption_source_type(config)
    json_mode = caption_mode == "json"

    if bool(getattr(config, "REBUILD_CACHE", False)):
        return True

    if include_null_cache and null_conditioning_cache_needed(config):
        for ds in config.INSTANCE_DATASETS:
            if ds.get("path") and not null_embeds_path(
                    ds["path"], cache_dir_name).exists():
                return True

    for ds in config.INSTANCE_DATASETS:
        root = Path(ds["path"])
        if not root.exists():
            continue
        cache_dir = root / cache_dir_name
        image_paths = cs.collect_image_paths(root)
        if not image_paths:
            # stale cache for an emptied dataset must trigger a rebuild/GC
            if cache_dir.exists() and (
                    list(cache_dir.glob(f"*{cs.TE_SUFFIX}"))
                    or (cs.index_exists(cache_dir)
                        and cs.load_index(cache_dir).get("files"))):
                return True
            continue
        if not cache_dir.exists() or not cs.index_exists(cache_dir):
            return True
        try:
            index_data = cs.load_index(cache_dir)
        except Exception:
            return True
        if not cs.image_layout_options_match(index_data.get("cache_options"), expected):
            return True
        indexed = index_data.get("files", [])
        if any("scaled_size" not in item for item in indexed):
            return True
        if len(indexed) < len(image_paths):
            return True

        current_stems = {cs.cache_stem_for_image(root, p) for p in image_paths}
        indexed_stems = set()
        for item in indexed:
            for te_path in cs.te_paths_for_index_item(item):
                stem = cs.base_stem_from_te_path(te_path)
                if stem:
                    indexed_stems.add(stem)
        if current_stems != indexed_stems:
            return True

        for item in indexed:
            te_paths = cs.te_paths_for_index_item(item)
            lat_path = item.get("lat_path")
            if (not te_paths or not lat_path or not Path(lat_path).exists()
                    or any(not Path(p).exists() for p in te_paths)):
                return True
            try:
                for p in te_paths:
                    meta = cs.load_payload_meta(p)
                    if not cs.text_options_match(meta.get("cache_options"), expected):
                        return True
                lat_meta = cs.load_payload_meta(lat_path)
                if not cs.latent_options_match(lat_meta.get("cache_options"), expected):
                    return True
            except Exception:
                return True
            relative_path = item.get("relative_path")
            if relative_path:
                try:
                    image_path = root / relative_path
                    match = cs.cached_file_signatures_match(item, image_path,
                                                            caption_mode)
                    if match is False:
                        return True
                    if match is None:
                        from .captions import caption_signature
                        sig = caption_signature(
                            read_caption_variants(image_path, caption_mode))
                        if sig != item.get("caption_signature"):
                            return True
                except Exception:
                    return True

        # Orphan / count check over on-disk te files
        te_files = list(cache_dir.glob(f"*{cs.TE_SUFFIX}"))
        disk_stems = {s for s in (cs.base_stem_from_te_path(f) for f in te_files) if s}
        if disk_stems != current_stems:
            return True
        expected_te = 0
        try:
            max_res = max_bucket_resolution_for_config(config)
            extra = _multi_bucket_extra(config)
            from PIL import Image
            for image_path in image_paths:
                variant_count = (len(read_caption_variants(image_path, caption_mode))
                                 if json_mode else 1)
                with Image.open(image_path) as img:
                    buckets = get_multi_bucket_resolutions(
                        img.width, img.height, max_res * max_res,
                        getattr(config, "SHOULD_UPSCALE", False), extra)
                expected_te += variant_count * len(buckets)
        except Exception:
            return True
        if len(te_files) < expected_te:
            return True
    return False


# --------------------------------------------------------------------------
# Build
# --------------------------------------------------------------------------

class SdxlCacheEncoders:
    """Jitted encoder bundle used during cache building."""

    def __init__(self, *, encode_text, encode_latents, tokenizer_l, tokenizer_g,
                 latent_normalizer):
        self.encode_text = encode_text          # (tokens_l, tokens_g) -> (embeds, pooled)
        self.encode_latents = encode_latents    # (pixels NHWC) -> latents NHWC (raw)
        self.tokenizer_l = tokenizer_l
        self.tokenizer_g = tokenizer_g
        self.latent_normalizer = latent_normalizer  # np NHWC -> np NHWC

    @classmethod
    def from_checkpoint(cls, config):
        import jax
        import jax.numpy as jnp
        from ..ckpt.sd_checkpoint import load_sd_tensors
        from ..models.sdxl import clip as clip_mod
        from ..models.sdxl import vae as vae_mod
        from .tokenization import resolve_tokenizer

        ckpt_path = config.SINGLE_FILE_CHECKPOINT_PATH
        print(f"INFO: Loading cache encoders from {Path(ckpt_path).name}")
        sd = load_sd_tensors(ckpt_path)
        cfg_l = clip_mod.detect_clip_l_config(sd)
        cfg_g = clip_mod.detect_clip_bigg_config(sd)
        params_l = clip_mod.clip_l_params_from_sd(sd, num_layers=cfg_l.num_layers)
        params_g = clip_mod.clip_bigg_params_from_sd(sd, num_layers=cfg_g.num_layers)

        vae_source = cs.vae_source_for_config(config)
        vae_sd = sd if str(vae_source) == str(ckpt_path) else load_sd_tensors(vae_source)
        vae_params = vae_mod.params_from_sd_state(vae_sd)

        shift = getattr(config, "VAE_SHIFT_FACTOR", None)
        scale = getattr(config, "VAE_SCALING_FACTOR", None)
        if scale is None:
            scale = 0.13025  # stock SDXL VAE scaling factor
        mode = str(getattr(config, "VAE_NORMALIZATION_MODE", "scalar")).lower()
        if mode == "flux_bn32":
            mean128, var128 = extract_flux_bn_stats(vae_source)

            def normalize(lat_nhwc):
                lat = np.transpose(lat_nhwc, (0, 3, 1, 2))
                lat = apply_flux_bn32(lat, mean128, var128)
                return np.transpose(lat, (0, 2, 3, 1))
        else:
            def normalize(lat_nhwc):
                return np.asarray(normalize_scalar(lat_nhwc, shift, scale))

        # Pass params as jit ARGUMENTS (placed on device once), never close
        # over them: closed-over weights become inline HLO constants — a
        # 3.2 GB lowered program that must ship through the remote-compile
        # tunnel on every cold compile.
        params_l = jax.device_put(params_l)
        params_g = jax.device_put(params_g)
        vae_params = jax.device_put(vae_params)
        _encode_text = jax.jit(lambda pl, pg, tl, tg: clip_mod.encode_dual_towers(
            pl, pg, tl, tg, cfg_l=cfg_l, cfg_g=cfg_g))
        encode_text = lambda tl, tg: _encode_text(params_l, params_g, tl, tg)
        # VAE encode is conv-dominated: measured on v5e at 1024px, the
        # flash path for the 16384-token mid attention is throughput-
        # neutral (8.5 vs 8.6 img/s/chip) and the OOM point is set by the
        # full-res conv activations, not the logits — so XLA stays the
        # default (tools_dev/cache_probe.py has the attn= knob)
        _encode_latents = jax.jit(vae_mod.encoder_forward)
        encode_latents = lambda px: _encode_latents(vae_params, px)
        del sd
        tok_dir = Path(ckpt_path).parent / "tokenizer"
        tokenizer = resolve_tokenizer(tok_dir if tok_dir.exists() else None)
        from .tokenization import HashTokenizer
        if isinstance(tokenizer, HashTokenizer):
            print(f"WARNING: no CLIP tokenizer found at {tok_dir} — "
                  "captions will be encoded with a deterministic HASH "
                  "tokenizer (fine for tests/dry runs, WRONG for real "
                  "training). Place an HF-format CLIP tokenizer dir "
                  "(vocab.json + merges.txt) next to the checkpoint.")
        return cls(encode_text=encode_text, encode_latents=encode_latents,
                   tokenizer_l=tokenizer, tokenizer_g=tokenizer,
                   latent_normalizer=normalize)


def _global_max_chunks(config, metas, tokenizer_l, tokenizer_g) -> int:
    if not caption_chunking_enabled(config):
        return 1
    max_chunks = 1
    for meta in metas:
        for caption in meta["caption_variants"].values():
            max_chunks = max(max_chunks,
                             caption_chunk_count(tokenizer_l, caption),
                             caption_chunk_count(tokenizer_g, caption))
    return max_chunks


def _tokens_for_caption(tokenizer, caption: str, total_chunks: int,
                        chunking: bool) -> np.ndarray:
    if chunking:
        return np.asarray(chunked_token_ids(tokenizer, caption, total_chunks),
                          np.int32)
    return np.asarray([padded_token_ids(tokenizer, caption)], np.int32)


def encode_captions_batched(encoders: SdxlCacheEncoders, captions: list[str],
                            total_chunks: int, chunking: bool,
                            batch_size: int = 16):
    """Returns (embeds list [(chunks*77, 2048)], pooled list [(1280,)])."""
    import jax.numpy as jnp
    tl = [_tokens_for_caption(encoders.tokenizer_l, c, total_chunks, chunking)
          for c in captions]
    tg = [_tokens_for_caption(encoders.tokenizer_g, c, total_chunks, chunking)
          for c in captions]
    n_chunks = tl[0].shape[0]
    embeds_out, pooled_out = [], []
    for start in range(0, len(captions), batch_size):
        batch_l = np.concatenate(tl[start:start + batch_size], axis=0)
        batch_g = np.concatenate(tg[start:start + batch_size], axis=0)
        embeds, pooled = encoders.encode_text(jnp.asarray(batch_l),
                                              jnp.asarray(batch_g))
        embeds = np.asarray(embeds, np.float32)
        pooled = np.asarray(pooled, np.float32)
        for i in range(embeds.shape[0] // n_chunks):
            span = embeds[i * n_chunks:(i + 1) * n_chunks]
            embeds_out.append(span.reshape(-1, span.shape[-1]))
            # pooled comes from the first chunk (train.py:1200)
            pooled_out.append(pooled[i * n_chunks])
    return embeds_out, pooled_out


def _cache_dtype(name: str):
    import jax.numpy as jnp
    return {"bfloat16": jnp.bfloat16, "float16": jnp.float16,
            "float32": jnp.float32}.get(str(name), jnp.bfloat16)


def precompute_and_cache(config, encoders: SdxlCacheEncoders | None = None,
                         *, force: bool = False) -> None:
    """Build/refresh the cache for every dataset root (train.py:1597-1989)."""
    import jax.numpy as jnp

    if not force and not check_if_caching_needed(config):
        print("\n" + "=" * 60 + "\nINFO: Datasets already cached.\n" + "=" * 60 + "\n")
        return
    if encoders is None:
        encoders = SdxlCacheEncoders.from_checkpoint(config)

    cache_dir_name = cs.sdxl_cache_dir_name(getattr(config, "is_rectified_flow", False))
    options = cs.cache_options_for_config(config)
    caption_mode = caption_source_type(config)
    json_mode = caption_mode == "json"
    chunking = caption_chunking_enabled(config)
    max_res = max_bucket_resolution_for_config(config)
    extra_buckets = _multi_bucket_extra(config)
    text_dtype = _cache_dtype(getattr(config, "TEXT_CACHE_PRECISION", "bfloat16"))
    vae_dtype = _cache_dtype(getattr(config, "VAE_CACHE_PRECISION", "bfloat16"))
    caching_batch = max(1, int(getattr(config, "CACHING_BATCH_SIZE", 2)))

    for ds in config.INSTANCE_DATASETS:
        root = Path(ds["path"])
        if not root.exists():
            continue
        cache_dir = root / cache_dir_name
        cache_dir.mkdir(parents=True, exist_ok=True)
        image_paths = cs.collect_image_paths(root)

        # GC cache entries whose source image is gone
        current_stems = {cs.cache_stem_for_image(root, p) for p in image_paths}
        for f in cache_dir.glob("*.safetensors"):
            stem = cs.base_stem_from_cache_path(f)
            if stem is not None and stem not in current_stems:
                f.unlink(missing_ok=True)

        if not image_paths:
            cs.save_index(cache_dir, {"version": cs.CACHE_OPTIONS_VERSION,
                                      "cache_options": options, "files": []})
            continue

        print(f"INFO: Validating {len(image_paths)} images in {root} ...")
        metas = [m for m in validate_images_parallel(
            image_paths, max_res * max_res,
            getattr(config, "SHOULD_UPSCALE", False), caption_mode) if m]

        total_chunks = _global_max_chunks(config, metas, encoders.tokenizer_l,
                                          encoders.tokenizer_g)
        if chunking:
            print(f"INFO: Caption chunking on, global max chunks = {total_chunks}")

        # expand to bucket variants
        variant_metas = []
        for meta in metas:
            w, h = meta["original_size"]
            for vi, (bw, bh) in enumerate(get_multi_bucket_resolutions(
                    w, h, max_res * max_res,
                    getattr(config, "SHOULD_UPSCALE", False), extra_buckets)):
                variant_metas.append(make_bucket_variant_metadata(meta, bw, bh, vi))

        # ---- text embeddings ----
        caption_types = ("tags", "nl", "tags_nl", "nl_tags") if json_mode else ("txt",)
        jobs = []  # (meta, caption_type, caption, te_path)
        for meta in variant_metas:
            stem = cs.cache_stem_for_image(root, meta["ip"]) + meta["cache_suffix"]
            for ctype in caption_types:
                caption = meta["caption_variants"].get(ctype)
                if caption is None:
                    continue
                te_path = cs.te_path_for(cache_dir, stem, ctype, json_mode)
                if te_path.exists():
                    try:
                        pm = cs.load_payload_meta(te_path)
                        if (cs.text_options_match(pm.get("cache_options"), options)
                                and pm.get("caption_signature") == meta["caption_signature"]
                                and tuple(pm.get("target_size", ())) == tuple(meta["target_resolution"])):
                            continue  # reusable
                    except Exception:
                        pass
                jobs.append((meta, ctype, caption, te_path))

        if jobs:
            print(f"INFO: Encoding {len(jobs)} caption payloads ...")
            embeds_list, pooled_list = encode_captions_batched(
                encoders, [j[2] for j in jobs], total_chunks, chunking)
            for (meta, ctype, caption, te_path), embeds, pooled in zip(
                    jobs, embeds_list, pooled_list):
                cs.save_payload(te_path, {
                    "embeds": jnp.asarray(embeds).astype(text_dtype),
                    "pooled": jnp.asarray(pooled).astype(text_dtype),
                }, _payload_meta(root, meta, options, caption_mode,
                                 caption=caption))

        # ---- latents, batched by resolution ----
        by_resolution = defaultdict(list)
        for meta in variant_metas:
            stem = cs.cache_stem_for_image(root, meta["ip"]) + meta["cache_suffix"]
            lat_path = cs.lat_path_for(cache_dir, stem)
            if lat_path.exists():
                try:
                    pm = cs.load_payload_meta(lat_path)
                    if (cs.latent_options_match(pm.get("cache_options"), options)
                            and tuple(pm.get("target_size", ())) == tuple(meta["target_resolution"])):
                        continue
                except Exception:
                    pass
            by_resolution[meta["target_resolution"]].append((meta, lat_path))

        rng = np.random.default_rng(0)
        for resolution, entries in sorted(by_resolution.items()):
            rng.shuffle(entries)
            print(f"INFO: Encoding {len(entries)} latents at {resolution} ...")
            for start in range(0, len(entries), caching_batch):
                chunk = entries[start:start + caching_batch]
                pixels = np.stack([load_and_resize_for_bucket(m) for m, _ in chunk])
                latents = np.asarray(encoders.encode_latents(
                    jnp.asarray(pixels)), np.float32)
                latents = encoders.latent_normalizer(latents)
                for (meta, lat_path), lat in zip(chunk, latents):
                    cs.save_payload(lat_path, {
                        "latents": jnp.asarray(lat).astype(vae_dtype),
                    }, _payload_meta(root, meta, options, caption_mode))

        # ---- null conditioning ----
        if null_conditioning_cache_needed(config):
            np_path = null_embeds_path(root, cache_dir_name)
            if not np_path.exists():
                embeds_list, pooled_list = encode_captions_batched(
                    encoders, [""], total_chunks, chunking)
                cs.save_payload(np_path, {
                    "embeds": jnp.asarray(embeds_list[0]).astype(text_dtype),
                    "pooled": jnp.asarray(pooled_list[0]).astype(text_dtype),
                }, {"cache_options": options})

        # ---- index ----
        files = []
        for meta in variant_metas:
            stem = cs.cache_stem_for_image(root, meta["ip"]) + meta["cache_suffix"]
            lat_path = cs.lat_path_for(cache_dir, stem)
            item = {
                "te_path": str(cs.te_path_for(
                    cache_dir, stem,
                    "tags_nl" if json_mode else "txt", json_mode)),
                "lat_path": str(lat_path),
                "relative_path": str(meta["ip"].relative_to(root)),
                "original_size": list(meta["original_size"]),
                "scaled_size": list(meta["scaled_size"]),
                "target_size": list(meta["target_resolution"]),
                "crop_coords": list(meta["crop_coords"]),
                "bucket_variant_index": meta["bucket_variant_index"],
                "caption_signature": meta["caption_signature"],
                "image_file_signature": cs.file_stat_signature(meta["ip"]),
                "caption_file_signature": cs.caption_file_signature(
                    meta["ip"], caption_mode),
            }
            if json_mode:
                item["caption_variants"] = {
                    ctype: {"te_path": str(cs.te_path_for(cache_dir, stem, ctype, True))}
                    for ctype in caption_types
                    if ctype in meta["caption_variants"]
                }
            files.append(item)
        cs.save_index(cache_dir, {"version": cs.CACHE_OPTIONS_VERSION,
                                  "cache_options": options, "files": files})
        print(f"INFO: Cached {len(files)} items in {cache_dir}")


def _payload_meta(root, meta, options, caption_mode, caption=None) -> dict:
    out = {
        "cache_options": options,
        "relative_path": str(meta["ip"].relative_to(root)),
        "original_size": list(meta["original_size"]),
        "scaled_size": list(meta["scaled_size"]),
        "target_size": list(meta["target_resolution"]),
        "crop_coords": list(meta["crop_coords"]),
        "bucket_variant_index": meta["bucket_variant_index"],
        "caption_signature": meta["caption_signature"],
    }
    if caption is not None:
        out["caption"] = caption
    return out
