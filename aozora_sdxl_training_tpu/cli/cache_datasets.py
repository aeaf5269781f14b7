"""CLI: run the caching pass only (BASELINE config #1).

``python -m aozora_sdxl_training_tpu.cli.cache_datasets --config preset.json
[--rebuild]`` builds/refreshes the VAE-latent + text-embedding cache for the
active mode's datasets and exits — the standalone form of the caching phase
both trainers run implicitly.
"""

from __future__ import annotations


def main(argv=None) -> None:
    import argparse

    from ..core.platform import apply_platform_override, enable_compilation_cache

    apply_platform_override()
    enable_compilation_cache()

    parser = argparse.ArgumentParser(description="Build dataset caches.")
    parser.add_argument("--config", required=True)
    parser.add_argument("--rebuild", action="store_true",
                        help="force a full rebuild")
    parser.add_argument("--clear", action="store_true",
                        help="delete the active mode's cache dirs and exit "
                        "(the GUI dataset cards' cache-clear, CLI form)")
    args = parser.parse_args(argv)

    from ..config.runtime import RuntimeConfig

    config = RuntimeConfig.from_argv(["--config", args.config])
    if args.clear:
        import shutil
        from pathlib import Path

        from ..gui.datasets_model import cache_folder_names

        names = cache_folder_names({
            "TRAINING_MODE": config.TRAINING_MODE,
            "PREDICTION_TYPE": config.PREDICTION_TYPE,
            "ANIMA_CACHE_FOLDER_NAME": getattr(
                config, "ANIMA_CACHE_FOLDER_NAME", None),
        })
        removed = 0
        for entry in config.INSTANCE_DATASETS:
            root = Path(entry["path"] if isinstance(entry, dict) else entry)
            for name in names:
                cache_dir = root / name
                if cache_dir.is_dir():
                    shutil.rmtree(cache_dir)
                    print(f"INFO: removed {cache_dir}")
                    removed += 1
        print(f"INFO: cleared {removed} cache dir(s).")
        return
    if args.rebuild:
        config.REBUILD_CACHE = True

    if str(config.TRAINING_MODE).lower().startswith("anima"):
        from ..data.anima_cache import (check_if_anima_caching_needed,
                                        precompute_and_cache_anima)
        if args.rebuild or check_if_anima_caching_needed(config):
            precompute_and_cache_anima(config, force=args.rebuild)
        else:
            print("INFO: Anima datasets already cached.")
    else:
        from ..data.cache_builder import (check_if_caching_needed,
                                          precompute_and_cache)
        if args.rebuild or check_if_caching_needed(config):
            precompute_and_cache(config, force=args.rebuild)
        else:
            print("INFO: Datasets already cached.")


if __name__ == "__main__":
    main()
