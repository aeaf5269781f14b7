"""CLI entry point: ``python -m aozora_sdxl_training_tpu.cli.train_anima
--config preset.json`` — drop-in for the reference's ``python train_anima.py``.
"""

from __future__ import annotations


def main(argv=None) -> None:
    from ..core.platform import apply_platform_override, enable_compilation_cache

    apply_platform_override()
    enable_compilation_cache()

    from ..config.runtime import RuntimeConfig
    from ..train.anima_trainer import run_anima_training

    config = RuntimeConfig.from_argv(argv)
    run_anima_training(config)


if __name__ == "__main__":
    main()
