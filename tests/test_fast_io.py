"""Native mmap safetensors reader vs the Python path."""

import numpy as np
import pytest

from aozora_sdxl_training_tpu.data import cache_store as cs
from aozora_sdxl_training_tpu.data import fast_io


@pytest.fixture(scope="module")
def built():
    if not fast_io.available():
        pytest.skip("native fast_safetensors library not available")
    return True


def test_native_read_matches_python(built, tmp_path):
    import jax.numpy as jnp
    rng = np.random.default_rng(0)
    path = tmp_path / "payload_te.safetensors"
    embeds = rng.normal(size=(77, 48)).astype(np.float32)
    cs.save_payload(path, {
        "embeds": jnp.asarray(embeds),
        "pooled": jnp.asarray(rng.normal(size=(40,)), jnp.bfloat16),
    }, {"cache_options": {"x": 1}, "caption": "hi"})

    # direct native read
    raw = fast_io.read_tensor(path, "embeds", np.float32, (77, 48))
    np.testing.assert_array_equal(raw, embeds)
    assert fast_io.read_tensor_bytes(path, "missing") is None

    # end-to-end through load_payload (uses native path when available)
    tensors, meta = cs.load_payload(path)
    np.testing.assert_array_equal(np.asarray(tensors["embeds"], np.float32),
                                  embeds)
    assert meta["caption"] == "hi"
    assert np.asarray(tensors["pooled"]).nbytes == 80  # bf16 preserved


def test_native_handles_bad_file(built, tmp_path):
    bad = tmp_path / "bad.safetensors"
    bad.write_bytes(b"\x00" * 4)
    assert fast_io.read_tensor_bytes(bad, "x") is None
