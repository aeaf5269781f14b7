"""Cached-latent dataset: host-side sample assembly for the train loop.

Equivalent of the reference's ``ImageTextLatentDataset``
(/root/reference/train.py:1992-2160) without torch: items come from the
dataset indexes (x repeats, stably sorted, seed-shuffled), and each sample id
packs ``(sample_index << 32) | dataset_index`` so per-sample conditioning is
keyed by the *absolute schedule position*, not the item — the property that
makes dropout/variant choices reproducible across resume.

Per-sample randomness derives from sha256(seed:sdxl-sample:sample:dataset),
matching the reference's construction (train.py:2060-2063).  Batches are
assembled into padded numpy arrays ready for device upload; a small
background prefetcher overlaps disk reads with TPU compute.
"""

from __future__ import annotations

import hashlib
import queue
import random
import threading
from pathlib import Path

import numpy as np

from . import cache_store as cs
from .captions import caption_weights_from_config

SAMPLE_INDEX_BITS = 32
SAMPLE_INDEX_MASK = (1 << SAMPLE_INDEX_BITS) - 1
CLIP_CHUNK_TOKEN_COUNT = 77


def pack_sample_index(dataset_index: int, sample_index: int) -> int:
    dataset_index = int(dataset_index)
    if dataset_index < 0 or dataset_index > SAMPLE_INDEX_MASK:
        raise ValueError(f"Dataset index too large to pack: {dataset_index}")
    return (int(sample_index) << SAMPLE_INDEX_BITS) | dataset_index


def unpack_sample_index(packed: int) -> tuple[int, int]:
    packed = int(packed)
    return packed & SAMPLE_INDEX_MASK, packed >> SAMPLE_INDEX_BITS


def pad_batch_arrays(batch: dict, target: int) -> dict:
    """Cyclically pad every batch-axis array up to ``target`` samples.

    dp meshes need the global batch divisible by dp, but the bucket batch
    schedule emits ragged boundary chunks (reference parity, train.py:
    461-537) and corrupt items are dropped at fetch.  Padding repeats real
    samples; ``sample_mask`` (1 real / 0 padded) zeroes them out of the
    loss, so numerics match the unpadded batch exactly.  Adds ``real_n``.
    """
    real_n = int(next(v.shape[0] for v in batch.values()
                      if isinstance(v, np.ndarray) and v.ndim >= 1))
    out = dict(batch)
    if target > real_n:
        idx = np.arange(target) % real_n
        for key, v in batch.items():
            if isinstance(v, np.ndarray) and v.ndim >= 1 \
                    and v.shape[0] == real_n:
                out[key] = v[idx]
    out["sample_mask"] = (np.arange(max(target, real_n)) < real_n
                          ).astype(np.float32)
    out["real_n"] = real_n
    return out


def pack_sample_schedule(image_schedule, batch_size: int):
    """[[dataset_idx,...], ...] -> [[packed,...], ...] (train.py:2245-2254)."""
    batch_size = max(1, int(batch_size or 1))
    return [
        [pack_sample_index(ds_idx, batch_index * batch_size + local)
         for local, ds_idx in enumerate(batch)]
        for batch_index, batch in enumerate(image_schedule)
    ]


class CachedLatentDataset:
    def __init__(self, config, *, cache_dir_name: str | None = None):
        self.seed = int(config.SEED if config.SEED else 42)
        self.json_caption_mode = cs.cache_options_for_config(config)[
            "caption_source_type"] == "json"
        self.caption_weights = caption_weights_from_config(config)
        cache_dir_name = cache_dir_name or cs.sdxl_cache_dir_name(
            getattr(config, "is_rectified_flow", False))

        self.items: list[dict] = []
        self.bucket_keys: list[tuple[int, int]] = []
        for ds in config.INSTANCE_DATASETS:
            root = Path(ds["path"])
            cache_dir = root / cache_dir_name
            if not cs.index_exists(cache_dir):
                print(f"WARNING: Index missing at {cache_dir}. Please re-run caching!")
                continue
            index_data = cs.load_index(cache_dir)
            repeats = int(ds.get("repeats", 1))
            stable = sorted(index_data["files"], key=cs.stable_cache_item_key)
            for _ in range(repeats):
                for item in stable:
                    self.items.append(item)
                    self.bucket_keys.append(tuple(item["target_size"]))
        if not self.items:
            raise ValueError("No cached files found.")

        order = np.random.Generator(np.random.PCG64(self.seed)).permutation(
            len(self.items))
        self.items = [self.items[i] for i in order]
        self.bucket_keys = [self.bucket_keys[i] for i in order]

        # null-conditioning support
        self.null_embeds = None
        self.null_pooled = None
        self.cond_scale_min = 1.0
        self.cond_scale_max = 1.0
        self.dropout_prob = 0.0
        if getattr(config, "TEXT_CONDITIONING_SCALE_ENABLED", False):
            lo = min(max(float(getattr(config, "TEXT_CONDITIONING_SCALE_MIN", 1.0)), 0.0), 1.0)
            hi = min(max(float(getattr(config, "TEXT_CONDITIONING_SCALE_MAX", 1.0)), 0.0), 2.0)
            self.cond_scale_min, self.cond_scale_max = min(lo, hi), max(lo, hi)
        if getattr(config, "UNCONDITIONAL_DROPOUT", False):
            self.dropout_prob = min(max(float(getattr(
                config, "UNCONDITIONAL_DROPOUT_CHANCE", 0.0)), 0.0), 1.0)
        self.cond_scale_enabled = (self.cond_scale_min < 1.0
                                   or self.cond_scale_max > 1.0)
        if self.dropout_prob > 0 or self.cond_scale_enabled:
            null_path = (Path(config.INSTANCE_DATASETS[0]["path"])
                         / cache_dir_name / "null_embeds.safetensors")
            try:
                tensors, _ = cs.load_payload(null_path)
                self.null_embeds = np.asarray(tensors["embeds"], np.float32)
                if self.null_embeds.ndim == 3:
                    self.null_embeds = self.null_embeds[0]
                self.null_pooled = np.asarray(tensors["pooled"], np.float32)
                if self.null_pooled.ndim == 2:
                    self.null_pooled = self.null_pooled[0]
            except Exception as e:  # noqa: BLE001
                print(f"WARNING: could not load null-conditioning cache "
                      f"({type(e).__name__}: {e}) — unconditional dropout "
                      "and conditioning-scale are DISABLED for this run; "
                      "delete the cache dir to rebuild it")
                self.dropout_prob = 0.0
                self.cond_scale_enabled = False

    def __len__(self) -> int:
        return len(self.items)

    # -- per-sample determinism --------------------------------------------
    def _rng_for_sample(self, dataset_index: int, sample_index: int) -> random.Random:
        payload = f"{self.seed}:sdxl-sample:{int(sample_index)}:{int(dataset_index)}"
        digest = hashlib.sha256(payload.encode("utf-8")).digest()
        return random.Random(int.from_bytes(digest[:8], "little"))

    # -- null-embedding alignment (chunk-aware; train.py:2075-2115) ---------
    def _resize_null_embeds(self, target_len: int) -> np.ndarray | None:
        null = self.null_embeds
        if null is None or null.shape[0] == target_len:
            return null
        if target_len < null.shape[0]:
            return null[:target_len]
        null_len = null.shape[0]
        chunk = CLIP_CHUNK_TOKEN_COUNT if null_len >= CLIP_CHUNK_TOKEN_COUNT else null_len
        if chunk <= 0 or null_len % chunk != 0:
            pad = np.broadcast_to(null[-1:], (target_len - null_len, null.shape[1]))
            return np.concatenate([null, pad], axis=0)
        null_chunk = null[-chunk:]
        missing = target_len - null_len
        full, part = divmod(missing, chunk)
        parts = [null]
        if full:
            parts.append(np.tile(null_chunk, (full, 1)))
        if part:
            parts.append(null_chunk[:part])
        return np.concatenate(parts, axis=0)

    def _align_null(self, embeds: np.ndarray):
        null = self.null_embeds
        if null is None or embeds.shape == null.shape:
            return embeds, null
        if embeds.ndim != 2 or null.ndim != 2 or embeds.shape[1] != null.shape[1]:
            return embeds, null
        e_len, n_len = embeds.shape[0], null.shape[0]
        if e_len < n_len:
            pad = self._resize_null_embeds(n_len)[e_len:n_len]
            embeds = np.concatenate([embeds, pad], axis=0)
        elif e_len > n_len:
            null = self._resize_null_embeds(e_len)
        return embeds, null

    # -- sample fetch -------------------------------------------------------
    def fetch(self, packed_index: int) -> dict | None:
        try:
            dataset_index, sample_index = unpack_sample_index(packed_index)
            rng = self._rng_for_sample(dataset_index, sample_index)
            item = self.items[dataset_index]
            te_path = cs.selected_te_path(item, rng, self.caption_weights,
                                          enabled=self.json_caption_mode)
            te_tensors, _ = cs.load_payload(te_path)
            lat_tensors, _ = cs.load_payload(item["lat_path"])
            latents = np.asarray(lat_tensors["latents"], np.float32)
            embeds = np.asarray(te_tensors["embeds"], np.float32)
            pooled = np.asarray(te_tensors["pooled"], np.float32)
            if embeds.ndim == 3:
                embeds = embeds[0]
            if pooled.ndim == 2:
                pooled = pooled[0]
            if not np.isfinite(latents).all():
                return None

            if self.dropout_prob > 0 and rng.random() < self.dropout_prob:
                _, null = self._align_null(embeds)
                embeds, pooled = null, self.null_pooled
            elif self.cond_scale_enabled:
                scale = rng.uniform(self.cond_scale_min, self.cond_scale_max)
                embeds, null = self._align_null(embeds)
                embeds = null + (embeds - null) * scale
                pooled = self.null_pooled + (pooled - self.null_pooled) * scale

            return {
                "latents": latents,
                "embeds": embeds,
                "pooled": pooled,
                "original_size": tuple(item["original_size"]),
                "scaled_size": tuple(item.get("scaled_size", item["original_size"])),
                "target_size": tuple(item["target_size"]),
                "crop_coords": tuple(item.get("crop_coords", (0, 0))),
                "image_key": item.get("relative_path", item["lat_path"]),
            }
        except Exception as e:  # noqa: BLE001 — bad items are dropped
            print(f"[DATASET] Failed to load item {packed_index}: {e}")
            return None

    def fetch_batch(self, packed_batch: list[int]) -> dict | None:
        """Assemble one micro-batch: stacked arrays + SDXL time_ids.

        time_ids per sample = [scaled_h, scaled_w, crop_top, crop_left,
        target_h, target_w] (the reference feeds scaled size, not original —
        train.py:2726-2731)."""
        samples = [s for s in (self.fetch(i) for i in packed_batch) if s]
        if not samples:
            return None
        latents = np.stack([s["latents"] for s in samples])
        if latents.ndim == 4 and latents.shape[1] < latents.shape[-1]:
            # cached NCHW -> NHWC for the TPU UNet
            latents = np.transpose(latents, (0, 2, 3, 1))
        time_ids = np.asarray([
            [s["scaled_size"][1], s["scaled_size"][0],
             s["crop_coords"][0], s["crop_coords"][1],
             s["target_size"][1], s["target_size"][0]]
            for s in samples], np.float32)
        return {
            "latents": latents,
            "embeds": np.stack([s["embeds"] for s in samples]),
            "pooled": np.stack([s["pooled"] for s in samples]),
            "time_ids": time_ids,
            "image_keys": [s["image_key"] for s in samples],
        }


class BatchPrefetcher:
    """Tiny background prefetcher: overlaps host cache reads (and optional
    device uploads via ``transform``) with device compute."""

    def __init__(self, dataset, packed_schedule, start_step: int = 0,
                 depth: int = 2, transform=None):
        self.dataset = dataset
        self.schedule = packed_schedule
        self.start = max(0, int(start_step))
        self.transform = transform
        self._queue: queue.Queue = queue.Queue(maxsize=max(1, depth))
        self._thread = threading.Thread(target=self._run, daemon=True)
        self._thread.start()

    def _run(self):
        for step in range(self.start, len(self.schedule)):
            batch = self.dataset.fetch_batch(self.schedule[step])
            if batch is not None and self.transform is not None:
                batch = self.transform(batch)
            self._queue.put(batch)
        self._queue.put(StopIteration)

    def __iter__(self):
        while True:
            item = self._queue.get()
            if item is StopIteration:
                return
            yield item
