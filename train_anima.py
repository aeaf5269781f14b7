#!/usr/bin/env python
"""GUI-compatible launcher: ``python train_anima.py --config x.json``
(see train.py)."""

from aozora_sdxl_training_tpu.cli.train_anima import main

if __name__ == "__main__":
    main()
