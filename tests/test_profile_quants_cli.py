"""profile_quants CLI: real DiT forwards drive the dynamic profile."""

import json

import jax
import numpy as np
import pytest

from aozora_sdxl_training_tpu.ckpt.safetensors_io import load_all, write_streaming
from aozora_sdxl_training_tpu.models.anima import dit as dit_mod
from aozora_sdxl_training_tpu.tools import profile_quants


@pytest.fixture(scope="module")
def tiny_dit_checkpoint(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("profq")
    params = dit_mod.init_params(dit_mod.TINY_ANIMA, jax.random.PRNGKey(0))
    torch_state = {f"dit.{k}": np.asarray(v) for k, v in
                   dit_mod.params_to_torch_state(params).items()}
    path = tmp / "dit.safetensors"
    write_streaming(path, torch_state)
    return tmp, path


def test_fast_dynamic_cli(tiny_dit_checkpoint, capsys):
    tmp, ckpt = tiny_dit_checkpoint
    out = tmp / "dit_mixed.safetensors"
    profile_quants.main([str(ckpt), str(out), "--mode", "fast_dynamic",
                         "--format", "int8", "--preset", "broad"])
    report = json.loads(capsys.readouterr().out)
    assert report["quantized"] > 0
    tensors = load_all(out)
    # prefix preserved and comfy_quant records present
    assert any(k.startswith("dit.") and k.endswith(".comfy_quant")
               for k in tensors)


def test_dynamic_mode_runs_real_forwards(tiny_dit_checkpoint, capsys):
    tmp, ckpt = tiny_dit_checkpoint
    out = tmp / "dit_dyn.safetensors"
    profile_quants.main([str(ckpt), str(out), "--mode", "dynamic",
                         "--format", "ternary", "--preset", "target",
                         "--max-layers", "3", "--latent-hw", "8",
                         "--promote-threshold", "0.2"])
    report = json.loads(capsys.readouterr().out)
    assert sum(report["assignment_counts"].values()) == 3
    assert out.exists()
