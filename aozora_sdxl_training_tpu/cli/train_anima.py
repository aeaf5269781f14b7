"""CLI entry point: ``python -m aozora_sdxl_training_tpu.cli.train_anima
--config preset.json`` — drop-in for the reference's ``python train_anima.py``.
"""

from __future__ import annotations


def main(argv=None) -> None:
    import os

    platform = os.environ.get("AOZORA_PLATFORM")
    if platform:
        import jax
        jax.config.update("jax_platforms", platform)

    from ..config.runtime import RuntimeConfig
    from ..train.anima_trainer import run_anima_training

    config = RuntimeConfig.from_argv(argv)
    run_anima_training(config)


if __name__ == "__main__":
    main()
