"""CLI entry point: ``python -m aozora_sdxl_training_tpu.cli.train_sdxl
--config preset.json`` — drop-in replacement for the reference's
``python train.py --config x.json`` (same JSON schema, same stdout grammar).
"""

from __future__ import annotations


def main(argv=None) -> None:
    from ..core.platform import apply_platform_override, enable_compilation_cache

    apply_platform_override()
    enable_compilation_cache()

    from ..config.runtime import RuntimeConfig
    from ..train.trainer import run_sdxl_training

    config = RuntimeConfig.from_argv(argv)
    run_sdxl_training(config)


if __name__ == "__main__":
    main()
