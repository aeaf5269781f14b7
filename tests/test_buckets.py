"""Bucket ladder and scoring golden tests (preset_ladder_v3 contract)."""

import math

from aozora_sdxl_training_tpu.data import buckets


def test_resolve_max_bucket_resolution():
    assert buckets.resolve_max_bucket_resolution(None) == 1024
    assert buckets.resolve_max_bucket_resolution(1024) == 1024
    assert buckets.resolve_max_bucket_resolution(1100) == 1024
    assert buckets.resolve_max_bucket_resolution(1152) == 1152
    assert buckets.resolve_max_bucket_resolution(2048) == 1536
    assert buckets.resolve_max_bucket_resolution(512) == 896  # floor choice
    # legacy area values collapse to sqrt
    assert buckets.resolve_max_bucket_resolution(1024 * 1024) == 1024
    assert buckets.resolve_max_bucket_resolution("bogus") == 1024


def test_ladder_1024_contains_both_sets():
    ladder = buckets.get_bucket_ladder(1024)
    assert (1024, 1024) in ladder
    assert (1152, 512) in ladder
    assert (1600, 512) in ladder
    # sorted by area then w, h
    areas = [w * h for w, h in ladder]
    assert areas == sorted(areas)


def test_ladder_896_is_scaled():
    ladder = buckets.get_bucket_ladder(896)
    scale = 896 / 1024
    expected = max(64, int(round((1024 * scale) / 64)) * 64)
    assert (expected, expected) in ladder
    assert (1024, 1024) not in ladder


def test_ladder_1536_includes_all_tiers():
    ladder = buckets.get_bucket_ladder(1536)
    assert (1024, 1024) in ladder     # tier 1024 kept
    assert (1536, 1536) in ladder     # scaled square at 1536


def test_optimal_bucket_square():
    assert buckets.get_optimal_bucket(2048, 2048, 1024, should_upscale=True) == (1024, 1024)


def test_optimal_bucket_landscape():
    w, h = buckets.get_optimal_bucket(1920, 1080, 1024, should_upscale=True)
    assert w > h
    ar = 1920 / 1080
    assert abs(w / h - ar) / ar < 0.25


def test_no_upscale_picks_largest_fitting():
    # 900x900 image with no upscale: bucket must fit inside the image.
    bw, bh = buckets.get_optimal_bucket(900, 900, 1024, should_upscale=False)
    assert bw <= 900 and bh <= 900
    ladder = buckets.get_bucket_ladder(1024)
    fitting = [(w, h) for w, h in ladder if w <= 900 and h <= 900]
    assert (bw, bh) == max(fitting, key=lambda b: b[0] * b[1])


def test_tiny_image_floor_bucket():
    bw, bh = buckets.get_optimal_bucket(100, 100, 1024, should_upscale=False)
    ladder = buckets.get_bucket_ladder(1024)
    min_area = min(w * h for w, h in ladder)
    assert bw * bh <= min_area * 1.1


def test_multi_bucket_variants():
    resolutions = buckets.get_multi_bucket_resolutions(
        2000, 2000, 1024, should_upscale=True, max_extra=2)
    assert len(resolutions) == 3
    assert resolutions[0] == (1024, 1024)
    assert len(set(resolutions)) == 3
    # extras are the next-best scoring buckets
    orig_ar = 1.0
    target_area = 1024 * 1024
    def score(b):
        ar_err = abs(b[0] / b[1] - orig_ar) / orig_ar
        return ar_err * 10.0 + abs(math.log(b[0] * b[1] / target_area))
    rest = [b for b in buckets.get_bucket_ladder(1024) if b != (1024, 1024)]
    rest.sort(key=score)
    assert set(resolutions[1:]) == set(rest[:2])


def test_variant_metadata_and_crop_geometry():
    meta = buckets.make_bucket_variant_metadata(
        {"original_size": (1920, 1080)}, 1344, 768, variant_index=1)
    assert meta["cache_suffix"] == "_mb1"
    sw, sh = meta["scaled_size"]
    ct, cl = meta["crop_coords"]
    assert sh == 768 and sw == round(1920 * (768 / 1080))
    assert ct == 0 and cl == (sw - 1344) // 2
    meta0 = buckets.make_bucket_variant_metadata(
        {"original_size": (1920, 1080)}, 1344, 768, variant_index=0)
    assert meta0["cache_suffix"] == ""
