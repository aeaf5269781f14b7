"""Anima cache build + incremental validation on a tiny stack."""

import numpy as np
import pytest
from PIL import Image

import jax.numpy as jnp

from aozora_sdxl_training_tpu.config.runtime import RuntimeConfig
from aozora_sdxl_training_tpu.data import anima_cache as ac
from aozora_sdxl_training_tpu.data import cache_store as cs


class _FakeEncoders(ac.AnimaCacheEncoders):
    def __init__(self):
        def encode_prompt(captions):
            embs, t5s = [], []
            for c in captions:
                seed = abs(hash(c)) % 1000
                rng = np.random.default_rng(seed)
                embs.append(rng.normal(size=(16, 8)).astype(np.float32))
                t5s.append(rng.integers(1, 99, size=max(len(c.split()), 1))
                           .astype(np.int32))
            return embs, t5s

        def encode_image(px):
            h, w, _ = px.shape
            lat = px.reshape(h // 8, 8, w // 8, 8, 3).mean(axis=(1, 3))
            return np.concatenate([lat, lat[..., :1]], axis=-1)

        super().__init__(encode_prompt=encode_prompt, encode_image=encode_image)


@pytest.fixture()
def tiny(tmp_path, monkeypatch):
    root = tmp_path / "data"
    root.mkdir()
    rng = np.random.default_rng(0)
    for i in range(3):
        Image.fromarray(rng.integers(0, 255, (96, 80, 3)).astype(np.uint8)
                        ).save(root / f"v{i}.png")
        (root / f"v{i}.txt").write_text(f"anima caption {i}")
    monkeypatch.setattr(ac, "get_multi_bucket_resolutions",
                        lambda *a, **k: [(64, 64)])
    cfg = RuntimeConfig({
        "TRAINING_MODE": "Anima DiT",
        "DIT_PATH": str(tmp_path / "dit.safetensors"),
        "DIT_VAE_PATH": str(tmp_path / "vae.safetensors"),
        "TEXT_ENCODER_PATH": str(tmp_path / "te.safetensors"),
        "INSTANCE_DATASETS": [{"path": str(root), "repeats": 1}],
    }, validate_resume_paths=False)
    return root, cfg


def test_anima_cache_build_and_validate(tiny):
    root, cfg = tiny
    assert ac.check_if_anima_caching_needed(cfg) is True
    ac.precompute_and_cache_anima(cfg, _FakeEncoders(), force=True)
    cache_dir = root / ac.anima_cache_dir_name(cfg)
    index = cs.load_index(cache_dir)
    assert len(index["files"]) == 3
    assert index["cache_options"]["version"] == 6
    assert index["cache_options"]["caption_embedding_layout"] == "anima_qwen_t5_ids"
    te, meta = cs.load_payload(index["files"][0]["te_path"])
    assert "prompt_emb" in te and "t5xxl_ids" in te
    lat, _ = cs.load_payload(index["files"][0]["lat_path"])
    assert tuple(lat["latents"].shape) == (8, 8, 4)
    assert ac.check_if_anima_caching_needed(cfg) is False


def test_anima_caption_edit_invalidates(tiny):
    root, cfg = tiny
    ac.precompute_and_cache_anima(cfg, _FakeEncoders(), force=True)
    (root / "v1.txt").write_text("entirely new caption")
    assert ac.check_if_anima_caching_needed(cfg) is True
    ac.precompute_and_cache_anima(cfg, _FakeEncoders(), force=True)
    assert ac.check_if_anima_caching_needed(cfg) is False


def test_anima_tiling_param_change_invalidates(tiny):
    root, cfg = tiny
    ac.precompute_and_cache_anima(cfg, _FakeEncoders(), force=True)
    cfg.VAE_CACHING_TILE_SIZE = [48, 48]
    assert ac.check_if_anima_caching_needed(cfg) is True


def test_anima_null_cache_and_dataset(tiny):
    root, cfg = tiny
    cfg.QWEN_NULL_DROPOUT_CHANCE = 0.5
    ac.precompute_and_cache_anima(cfg, _FakeEncoders(), force=True)
    null_path = root / ac.anima_cache_dir_name(cfg) / "null_embeds.safetensors"
    assert null_path.exists()
    dataset = ac.AnimaLatentDataset(cfg)
    assert len(dataset) == 3
    batch = dataset.fetch_batch([ac.CONTEXT_TOKENS * 0 + 0, 1])
    assert batch["latents"].shape[0] == 2
    assert batch["t5xxl_ids"].shape == (2, ac.CONTEXT_TOKENS)
