"""Cache builder: full build + incremental invalidation on a tiny stack.

Bucket resolution is monkeypatched to 64px so the (real) VAE/CLIP encode
paths run at toy sizes on CPU.
"""

import json
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from PIL import Image

from aozora_sdxl_training_tpu.config.runtime import RuntimeConfig
from aozora_sdxl_training_tpu.data import cache_builder as cb
from aozora_sdxl_training_tpu.data import cache_store as cs
from aozora_sdxl_training_tpu.data.tokenization import HashTokenizer


class _FakeEncoders(cb.SdxlCacheEncoders):
    """Deterministic tiny encoders: avoids building real CLIP/VAE towers."""

    def __init__(self):
        tok = HashTokenizer(model_max_length=77)

        def encode_text(tl, tg):
            # embed = one-hot-ish hash of ids; shapes (B, 77, 8) and (B, 6)
            tl = jnp.asarray(tl)
            emb = jnp.stack([(tl % (i + 7)).astype(jnp.float32)
                             for i in range(8)], axis=-1)
            pooled = emb.mean(axis=1)[:, :6]
            return emb, pooled

        def encode_latents(px):
            px = jnp.asarray(px)
            # fake "VAE": average-pool /8, 4 channels
            b, h, w, _ = px.shape
            lat = px.reshape(b, h // 8, 8, w // 8, 8, 3).mean(axis=(2, 4))
            return jnp.concatenate([lat, lat[..., :1]], axis=-1)

        super().__init__(encode_text=encode_text, encode_latents=encode_latents,
                         tokenizer_l=tok, tokenizer_g=tok,
                         latent_normalizer=lambda x: x * 0.5)


@pytest.fixture()
def tiny_dataset(tmp_path, monkeypatch):
    root = tmp_path / "data"
    root.mkdir()
    rng = np.random.default_rng(0)
    for i in range(4):
        arr = (rng.uniform(0, 255, size=(80, 72, 3))).astype(np.uint8)
        Image.fromarray(arr).save(root / f"img{i}.png")
        (root / f"img{i}.txt").write_text(f"caption number {i}")
    # force a single tiny bucket so CPU encoding is instant
    monkeypatch.setattr(cb, "get_multi_bucket_resolutions",
                        lambda *a, **k: [(64, 64)])
    ckpt = tmp_path / "model.safetensors"
    ckpt.write_bytes(b"\x08\x00\x00\x00\x00\x00\x00\x00{       }")
    cfg = RuntimeConfig({
        "SINGLE_FILE_CHECKPOINT_PATH": str(ckpt),
        "INSTANCE_DATASETS": [{"path": str(root), "repeats": 1}],
        "CACHING_BATCH_SIZE": 2,
        "PREDICTION_TYPE": "v_prediction",
    }, validate_resume_paths=False)
    return root, cfg


def test_build_then_validate(tiny_dataset):
    root, cfg = tiny_dataset
    assert cb.check_if_caching_needed(cfg) is True
    cb.precompute_and_cache(cfg, _FakeEncoders(), force=True)
    cache_dir = root / cs.sdxl_cache_dir_name(False)
    assert cs.index_exists(cache_dir)
    index = cs.load_index(cache_dir)
    assert len(index["files"]) == 4
    # payloads exist and carry latents at /8 of the bucket
    tensors, meta = cs.load_payload(index["files"][0]["lat_path"])
    assert tuple(tensors["latents"].shape) == (8, 8, 4)
    assert meta["cache_options"]["bucket_layout"] == "preset_ladder_v3"
    # cache is now valid
    assert cb.check_if_caching_needed(cfg) is False


def test_caption_edit_invalidates(tiny_dataset):
    root, cfg = tiny_dataset
    cb.precompute_and_cache(cfg, _FakeEncoders(), force=True)
    assert cb.check_if_caching_needed(cfg) is False
    # editing a caption changes its stat signature -> needs caching
    (root / "img1.txt").write_text("a different caption entirely")
    assert cb.check_if_caching_needed(cfg) is True
    # incremental rebuild refreshes and settles
    cb.precompute_and_cache(cfg, _FakeEncoders(), force=True)
    assert cb.check_if_caching_needed(cfg) is False


def test_removed_image_gc(tiny_dataset):
    root, cfg = tiny_dataset
    cb.precompute_and_cache(cfg, _FakeEncoders(), force=True)
    (root / "img2.png").unlink()
    (root / "img2.txt").unlink()
    assert cb.check_if_caching_needed(cfg) is True
    cb.precompute_and_cache(cfg, _FakeEncoders(), force=True)
    cache_dir = root / cs.sdxl_cache_dir_name(False)
    index = cs.load_index(cache_dir)
    assert len(index["files"]) == 3
    assert not any("img2" in f.name for f in cache_dir.glob("*.safetensors"))


def test_null_cache_written_when_dropout(tiny_dataset):
    root, cfg = tiny_dataset
    cfg.UNCONDITIONAL_DROPOUT = True
    cfg.UNCONDITIONAL_DROPOUT_CHANCE = 0.1
    cb.precompute_and_cache(cfg, _FakeEncoders(), force=True)
    null_path = cb.null_embeds_path(root, cs.sdxl_cache_dir_name(False))
    assert null_path.exists()
    tensors, _ = cs.load_payload(null_path)
    assert "embeds" in tensors and "pooled" in tensors
