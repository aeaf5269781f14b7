#!/usr/bin/env python
"""GUI-compatible launcher: ``python train.py --config x.json``.

The reference PyQt GUI starts trainers as ``python -u train.py --config ...``
subprocesses (/root/reference/gui/gui.py:5936-5964).  This shim keeps that
command line working against the TPU framework — same JSON schema in, same
stdout grammar out, same ``force_save.flag`` handshake in the CWD.
"""

from aozora_sdxl_training_tpu.cli.train_sdxl import main

if __name__ == "__main__":
    main()
