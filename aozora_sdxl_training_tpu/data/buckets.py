"""Aspect-ratio bucketing: the ``preset_ladder_v3`` bucket layout.

Behavioral contract from the reference (/root/reference/train.py:885-1016):
a fixed ladder of SDXL buckets plus low-res aspect buckets, scaled to tiers
{896, 1024, 1152, 1536}; bucket choice minimizes
``ar_error * 10 + |log(area/target_area)|`` with a no-upscale fallback that
picks the largest fitting bucket. Multi-bucket mode adds the top-N scoring
extra buckets, each with its own ``_mbN`` cache suffix.

Pure host-side math (no framework deps) — the results key the latent cache,
so they must stay stable across versions (BUCKET_LAYOUT_VERSION).
"""

from __future__ import annotations

import math

STANDARD_SDXL_BUCKETS = [
    (1024, 1024),
    (1152, 896), (896, 1152),
    (1216, 832), (832, 1216),
    (1344, 768), (768, 1344),
    (1440, 720), (720, 1440),
    (1536, 640), (640, 1536),
    (1600, 512), (512, 1600),
    (896, 896), (768, 768),
]
LOW_RES_ASPECT_BUCKETS = [
    (1152, 512), (512, 1152),
    (1024, 576), (576, 1024),
    (960, 640), (640, 960),
    (896, 704), (704, 896),
    (768, 768),
]
MAX_BUCKET_RESOLUTION_CHOICES = (896, 1024, 1152, 1536)
BUCKET_LAYOUT_VERSION = "preset_ladder_v3"


def resolve_max_bucket_resolution(value=None) -> int:
    if value is None:
        return 1024
    try:
        numeric = int(float(value))
    except (TypeError, ValueError):
        return 1024
    # Legacy configs stored an *area*; fold it back to an edge length.
    if numeric > 4096:
        numeric = int(round(math.sqrt(max(1, numeric))))
    valid = [s for s in MAX_BUCKET_RESOLUTION_CHOICES if s <= numeric]
    return valid[-1] if valid else MAX_BUCKET_RESOLUTION_CHOICES[0]


def max_bucket_resolution_for_config(config) -> int:
    return resolve_max_bucket_resolution(getattr(config, "MAX_BUCKET_RESOLUTION", None))


def get_bucket_ladder(max_bucket_resolution=None) -> list[tuple[int, int]]:
    max_bucket_resolution = resolve_max_bucket_resolution(max_bucket_resolution)
    buckets: set[tuple[int, int]] = set()
    if max_bucket_resolution < 1024:
        tiers = [max_bucket_resolution]
    else:
        tiers = [1024, *[t for t in (1152, 1536) if t <= max_bucket_resolution]]

    for tier in tiers:
        if tier == 1024:
            buckets.update(STANDARD_SDXL_BUCKETS)
            buckets.update(LOW_RES_ASPECT_BUCKETS)
            continue
        scale = tier / 1024
        for w, h in STANDARD_SDXL_BUCKETS + LOW_RES_ASPECT_BUCKETS:
            sw = max(64, int(round((w * scale) / 64)) * 64)
            sh = max(64, int(round((h * scale) / 64)) * 64)
            buckets.add((sw, sh))
    return sorted(buckets, key=lambda b: (b[0] * b[1], b[0], b[1]))


def _bucket_score(bw: int, bh: int, orig_ar: float, target_area: int) -> float:
    bucket_ar = bw / max(bh, 1)
    area = bw * bh
    ar_error = abs(bucket_ar - orig_ar) / max(orig_ar, 0.01)
    area_error = abs(math.log(area / target_area)) if area > 0 else 100.0
    return ar_error * 10.0 + area_error


def get_optimal_bucket(orig_w, orig_h, target_area=None, stride=64,
                       should_upscale=False) -> tuple[int, int]:
    orig_ar = orig_w / max(orig_h, 1)
    max_res = resolve_max_bucket_resolution(target_area)
    ladder = get_bucket_ladder(max_res)
    target_area = max_res * max_res

    best = min(ladder, key=lambda b: _bucket_score(b[0], b[1], orig_ar, target_area))
    bw, bh = best
    if not should_upscale and (bw > orig_w or bh > orig_h):
        fitting = [(w, h) for w, h in ladder if w <= orig_w and h <= orig_h]
        if fitting:
            best = max(fitting, key=lambda b: b[0] * b[1])
        else:
            min_area = min(w * h for w, h in ladder)
            floor = [(w, h) for w, h in ladder if w * h <= min_area * 1.1]
            best = min(floor, key=lambda b: _bucket_score(b[0], b[1], orig_ar, target_area))
    return best


def get_multi_bucket_resolutions(orig_w, orig_h, target_area=None,
                                 should_upscale=False, max_extra=0) -> list[tuple[int, int]]:
    primary = get_optimal_bucket(orig_w, orig_h, target_area, 64, should_upscale)
    if max_extra <= 0:
        return [primary]

    orig_ar = orig_w / max(orig_h, 1)
    max_res = resolve_max_bucket_resolution(target_area)
    target_area = max_res * max_res

    candidates = []
    for bucket in get_bucket_ladder(max_res):
        if bucket == primary:
            continue
        bw, bh = bucket
        if not should_upscale and (bw > orig_w or bh > orig_h):
            continue
        candidates.append((_bucket_score(bw, bh, orig_ar, target_area), bucket))
    candidates.sort(key=lambda item: item[0])
    return [primary] + [bucket for _, bucket in candidates[:max_extra]]


def cover_resize_geometry(orig_w: int, orig_h: int, target_w: int, target_h: int):
    """Scaled size + center-crop offsets for a cover-resize to the bucket.

    Same math as the reference's metadata path (train.py:1058-1063): scale by
    the max axis ratio, round, center-crop.  Returns ((scaled_w, scaled_h),
    (crop_top, crop_left)).
    """
    scale = max(target_w / max(orig_w, 1), target_h / max(orig_h, 1))
    scaled_w = int(round(orig_w * scale))
    scaled_h = int(round(orig_h * scale))
    crop_left = max(0, (scaled_w - target_w) // 2)
    crop_top = max(0, (scaled_h - target_h) // 2)
    return (scaled_w, scaled_h), (crop_top, crop_left)


def make_bucket_variant_metadata(base_meta: dict, target_w: int, target_h: int,
                                 variant_index: int = 0) -> dict:
    orig_w, orig_h = base_meta["original_size"]
    scaled, crop = cover_resize_geometry(orig_w, orig_h, target_w, target_h)
    meta = dict(base_meta)
    meta.update({
        "target_resolution": (target_w, target_h),
        "scaled_size": scaled,
        "crop_coords": crop,
        "bucket_variant_index": variant_index,
        "cache_suffix": "" if variant_index == 0 else f"_mb{variant_index}",
    })
    return meta
