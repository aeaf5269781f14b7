"""Caption sidecar reading, chunking, and cache-store key/index tests."""

import json
import random

import numpy as np
import pytest

from aozora_sdxl_training_tpu.data import cache_store as cs
from aozora_sdxl_training_tpu.data import captions as cap
from aozora_sdxl_training_tpu.data.tokenization import HashTokenizer


# ---------------- captions ----------------

def test_txt_caption_fallback_to_filename(tmp_path):
    img = tmp_path / "a_red_cat.png"
    img.write_bytes(b"x")
    variants = cap.read_caption_variants(img, "txt")
    assert variants == {"txt": "a red cat"}


def test_txt_caption_sidecar(tmp_path):
    img = tmp_path / "img.png"
    img.write_bytes(b"x")
    (tmp_path / "img.txt").write_text("hello world  \n")
    assert cap.read_caption_variants(img, "txt") == {"txt": "hello world"}


def test_json_caption_variants(tmp_path):
    img = tmp_path / "img.png"
    img.write_bytes(b"x")
    (tmp_path / "img.json").write_text(json.dumps(
        {"tags": "a, b", "nl": "a scene", "tags_nl": " both ", "extra": "ignored"}))
    variants = cap.read_caption_variants(img, "json")
    assert variants == {"tags": "a, b", "nl": "a scene", "tags_nl": "both"}
    with pytest.raises(FileNotFoundError):
        cap.read_caption_variants(tmp_path / "missing.png", "json")


def test_json_caption_requires_nonempty(tmp_path):
    img = tmp_path / "img.png"
    img.write_bytes(b"x")
    (tmp_path / "img.json").write_text(json.dumps({"tags": "  "}))
    with pytest.raises(ValueError):
        cap.read_caption_variants(img, "json")


def test_caption_signature_stable_and_order_independent():
    s1 = cap.caption_signature({"a": "x", "b": "y"})
    s2 = cap.caption_signature({"b": "y", "a": "x"})
    s3 = cap.caption_signature({"a": "x", "b": "z"})
    assert s1 == s2 != s3
    assert len(s1) == 64


def test_choose_caption_variant_weighted():
    rng = random.Random(0)
    weights = {"tags": 100, "nl": 0, "tags_nl": 0, "nl_tags": 0}
    picks = {cap.choose_caption_variant(rng, weights) for _ in range(20)}
    assert picks == {"tags"}
    assert cap.choose_caption_variant(rng, {}) == "tags_nl"


def test_chunk_count_and_packing():
    tok = HashTokenizer(model_max_length=77)
    short = "one two three"
    assert cap.caption_chunk_count(tok, short) == 1
    long = " ".join(f"w{i}" for i in range(100))  # 100 tokens > 75
    assert cap.caption_chunk_count(tok, long) == 2
    chunks = cap.chunked_token_ids(tok, long, 2)
    assert len(chunks) == 2 and all(len(c) == 77 for c in chunks)
    assert chunks[0][0] == tok.bos_token_id
    assert chunks[0][-1] == tok.eos_token_id
    # second chunk holds the remaining 25 tokens + bos/eos + padding
    assert chunks[1][0] == tok.bos_token_id
    assert chunks[1][26] == tok.eos_token_id
    assert all(t == tok.pad_token_id for t in chunks[1][27:])


def test_padded_token_ids():
    tok = HashTokenizer(model_max_length=77)
    ids = cap.padded_token_ids(tok, "a b c")
    assert len(ids) == 77
    assert ids[0] == tok.bos_token_id


# ---------------- cache store ----------------

def test_stem_parsing():
    assert cs.item_stem_from_te_path("x/a_te.safetensors") == "a"
    assert cs.item_stem_from_te_path("x/a_json_tags_te.safetensors") == "a"
    assert cs.base_stem_from_te_path("x/a_mb2_te.safetensors") == "a"
    assert cs.base_stem_from_te_path("x/a_mb2_json_nl_te.safetensors") == "a"
    assert cs.base_stem_from_cache_path("x/a_mb1_lat.safetensors") == "a"
    assert cs.item_stem_from_te_path("x/a_lat.safetensors") is None


def test_collect_image_paths_sorted(tmp_path):
    for name in ("B.png", "a.jpg", "sub/c.webp"):
        p = tmp_path / name
        p.parent.mkdir(exist_ok=True)
        p.write_bytes(b"x")
    paths = cs.collect_image_paths(tmp_path)
    rel = [p.relative_to(tmp_path).as_posix() for p in paths]
    assert rel == ["a.jpg", "B.png", "sub/c.webp"]  # casefolded ordering


def test_cache_stem_nested(tmp_path):
    img = tmp_path / "sub" / "dir" / "x.png"
    stem = cs.cache_stem_for_image(tmp_path, img)
    assert stem == "sub_dir_x"


def test_index_roundtrip_atomic(tmp_path):
    payload = {"version": 13, "cache_options": {"a": 1}, "files": [{"te_path": "x"}]}
    cs.save_index(tmp_path / "cache", payload)
    assert cs.index_exists(tmp_path / "cache")
    assert cs.load_index(tmp_path / "cache") == payload
    assert not list((tmp_path / "cache").glob("*.tmp"))


def test_option_matching_partitions():
    base = {k: 1 for k in cs.CACHE_IMAGE_LAYOUT_OPTION_KEYS
            + cs.CACHE_TEXT_OPTION_KEYS + cs.CACHE_LATENT_OPTION_KEYS}
    assert cs.image_layout_options_match(base, dict(base))
    changed = dict(base, vae_cache_float_dtype=2)
    # latent-only option change must not invalidate image layout or text
    assert cs.image_layout_options_match(changed, base)
    assert cs.text_options_match(changed, base)
    assert not cs.latent_options_match(changed, base)
    assert not cs.options_match(None, base, cs.CACHE_TEXT_OPTION_KEYS)


def test_cache_options_for_config():
    class Cfg:
        TEXT_CACHE_PRECISION = "bfloat16"
        VAE_CACHE_PRECISION = "float16"
        MAX_BUCKET_RESOLUTION = 1024
        SHOULD_UPSCALE = False
        CAPTION_SOURCE_TYPE = "txt"
        CAPTION_CHUNKING_ENABLED = True
        MULTI_BUCKET_ENABLED = False
        MULTI_BUCKET_EXTRA_BUCKETS = 5
        VAE_NORMALIZATION_MODE = "scalar"
        VAE_SHIFT_FACTOR = None
        VAE_SCALING_FACTOR = 0.13025
        VAE_LATENT_CHANNELS = None
        VAE_PATH = ""
        SINGLE_FILE_CHECKPOINT_PATH = "/nonexistent.safetensors"

    opts = cs.cache_options_for_config(Cfg())
    assert opts["version"] == 13
    assert opts["bucket_layout"] == "preset_ladder_v3"
    assert opts["multi_bucket_extra_buckets"] == 0  # zeroed when disabled
    assert opts["caption_chunking_enabled"] is True
    assert opts["vae_scaling_factor"] == 0.13025


def test_file_signatures(tmp_path):
    img = tmp_path / "i.png"
    img.write_bytes(b"abc")
    sig = cs.file_stat_signature(img)
    assert sig["exists"] and sig["size"] == 3
    missing = cs.file_stat_signature(tmp_path / "no.png")
    assert not missing["exists"]
    (tmp_path / "i.txt").write_text("cap")
    csig = cs.caption_file_signature(img, "txt")
    assert csig["mode"] == "txt" and csig["exists"]
    item = {"image_file_signature": sig, "caption_file_signature": csig}
    assert cs.cached_file_signatures_match(item, img, "txt") is True
    img.write_bytes(b"abcd")
    assert cs.cached_file_signatures_match(item, img, "txt") is False
    assert cs.cached_file_signatures_match({}, img, "txt") is None


def test_payload_roundtrip(tmp_path):
    import jax.numpy as jnp
    path = tmp_path / "item_te.safetensors"
    tensors = {"embeds": jnp.ones((3, 4), jnp.bfloat16),
               "pooled": jnp.zeros((5,), jnp.float32)}
    meta = {"cache_options": {"x": 1}, "original_size": [10, 20]}
    cs.save_payload(path, tensors, meta)
    loaded, got_meta = cs.load_payload(path)
    assert got_meta == meta
    assert loaded["embeds"].dtype == jnp.bfloat16
    np.testing.assert_array_equal(np.asarray(loaded["pooled"]), np.zeros(5))
    assert cs.load_payload_meta(path) == meta


def test_remove_cache_files_for_stem(tmp_path):
    d = tmp_path / "cache"
    d.mkdir()
    keep = d / "other_te.safetensors"
    for name in ("a_te.safetensors", "a_lat.safetensors",
                 "a_mb1_te.safetensors", "a_json_tags_te.safetensors"):
        (d / name).write_bytes(b"x")
    keep.write_bytes(b"x")
    cs.remove_cache_files_for_stem(d, "a")
    remaining = {p.name for p in d.glob("*.safetensors")}
    assert remaining == {"other_te.safetensors"}


def test_selected_te_path_weighted():
    item = {
        "te_path": "primary_te.safetensors",
        "caption_variants": {
            "tags": {"te_path": "tags_te.safetensors"},
            "nl": {"te_path": "nl_te.safetensors"},
        },
    }
    rng = random.Random(1)
    picked = cs.selected_te_path(item, rng, {"tags": 100, "nl": 0})
    assert picked == "tags_te.safetensors"
    assert cs.selected_te_path(item, rng, {}, enabled=False) == "primary_te.safetensors"
