"""CLI: quantization-aware "repair" training of a quantized Anima DiT.

Drop-in for the reference's experimental repair trainer
(/root/reference/scripts/experimental/train_anima_repair.py): loads a
ComfyUI-quantized DiT (comfy_quant records), trains it through the normal
Anima flow-matching loop while projecting every optimizer step back into the
packed quantized representation with error-feedback residuals, and saves the
exact packed tensors (codes + scales) back out.

Usage: ``python -m aozora_sdxl_training_tpu.cli.train_anima_repair
--config preset.json`` where the preset's ``anima_dit_model_path`` points at
the *quantized* checkpoint.
"""

from __future__ import annotations

import tempfile
from pathlib import Path

import numpy as np


def _to_torch_layout(name: str, arr: np.ndarray) -> np.ndarray:
    if arr.ndim == 2 and not name.endswith("embed.weight"):
        return arr.T
    return arr


def _from_torch_layout(name: str, arr: np.ndarray) -> np.ndarray:
    return _to_torch_layout(name, arr)  # transpose is its own inverse


def main(argv=None) -> None:
    from ..core.platform import apply_platform_override, enable_compilation_cache

    apply_platform_override()
    enable_compilation_cache()

    from ..ckpt.anima_checkpoint import strip_prefix, DIT_PREFIXES
    from ..ckpt.safetensors_io import load_all, write_streaming
    from ..config.runtime import RuntimeConfig
    from ..train.anima_trainer import run_anima_training
    from ..train.qat_repair import ProjectedQuantController

    config = RuntimeConfig.from_argv(argv)

    quant_state = load_all(config.DIT_PATH)
    stripped, prefix = strip_prefix(quant_state, DIT_PREFIXES)
    controller = ProjectedQuantController(stripped)
    if not controller.controlled_keys:
        raise SystemExit(
            f"{config.DIT_PATH} carries no comfy_quant records — run the "
            "standard trainer instead.")
    print(f"INFO: QAT repair: {len(controller.controlled_keys)} quantized "
          f"tensors under prefix '{prefix}'")

    # materialize a dequantized checkpoint for the normal trainer to load
    dequant = controller.dequantized_params()
    tmp = Path(tempfile.mkdtemp(prefix="aozora_repair_")) / "dequant.safetensors"
    write_streaming(tmp, {f"{prefix}{k}": v for k, v in dequant.items()})
    config.DIT_PATH = str(tmp)

    def post_step_hook(trainable_host: dict) -> dict:
        torch_side = {k: _to_torch_layout(k, v)
                      for k, v in trainable_host.items()}
        projected = controller.project(torch_side)
        return {k: _from_torch_layout(k, v) for k, v in projected.items()}

    run_anima_training(config, post_step_hook=post_step_hook)

    out = Path(config.OUTPUT_DIR) / "repaired_quantized.safetensors"
    # save the exact packed representation under the original key prefix
    write_streaming(out, {f"{prefix}{k}": np.asarray(v)
                          for k, v in controller._state.items()},
                    metadata={"aozora_repair": "projected-quantized training"})
    print(f"INFO: packed quantized checkpoint saved -> {out}")


if __name__ == "__main__":
    main()
