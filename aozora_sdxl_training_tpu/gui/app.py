"""Minimal training GUI (tkinter): preset editing, launch, live metrics.

A lightweight shell over the same contracts the reference's PyQt GUI uses
(/root/reference/gui/gui.py): nested preset JSON in, trainer subprocess with
``--config``, stdout grammar parsed into live status, ``force_save.flag``
emergency checkpointing.  The full-featured reference GUI also works against
this framework unchanged (see train.py / train_anima.py shims); this app
covers headless-server-adjacent setups where only tkinter is available.

Run: ``python -m aozora_sdxl_training_tpu.gui [preset.json]``.
"""

from __future__ import annotations

import json
import sys
from pathlib import Path

from ..config import schema
from .log_buffer import CompressedLogBuffer
from .metrics import LiveMetrics
from .process_runner import ProcessRunner, launch_trainer, request_force_save

# keys exposed in the quick-edit form (the rest edit via JSON directly)
FORM_KEYS = [
    "SINGLE_FILE_CHECKPOINT_PATH", "DIT_PATH", "OUTPUT_DIR", "OUTPUT_NAME",
    "MAX_TRAIN_STEPS", "BATCH_SIZE", "GRADIENT_ACCUMULATION_STEPS",
    "PREDICTION_TYPE", "SEED", "SAVE_EVERY_N_STEPS", "UNET_EXCLUDE_TARGETS",
    "OPTIMIZER_TYPE", "MAX_BUCKET_RESOLUTION",
]


class TrainingApp:
    def __init__(self, root, preset_path: str | None = None):
        import tkinter as tk
        from tkinter import ttk

        self.root = root
        root.title("Aozora-TPU Trainer")
        self.preset_path = Path(preset_path) if preset_path else Path("preset.json")
        self.flat = schema.flat_defaults()
        if self.preset_path.exists():
            with open(self.preset_path, encoding="utf-8") as f:
                self.flat = schema.flatten_preset(json.load(f))
        self.metrics = LiveMetrics()
        self.log = CompressedLogBuffer()
        self.runner: ProcessRunner | None = None

        top = ttk.Frame(root, padding=6)
        top.pack(fill="both", expand=True)

        # mode + form
        self.mode_var = tk.StringVar(value=self.flat.get("TRAINING_MODE", "SDXL"))
        ttk.Label(top, text="Mode").grid(row=0, column=0, sticky="w")
        ttk.Combobox(top, textvariable=self.mode_var,
                     values=["SDXL", "Anima DiT"], width=12,
                     state="readonly").grid(row=0, column=1, sticky="w")
        self.entries = {}
        for i, key in enumerate(FORM_KEYS, start=1):
            ttk.Label(top, text=key).grid(row=i, column=0, sticky="w")
            var = tk.StringVar(value=str(self.flat.get(key, "")))
            ttk.Entry(top, textvariable=var, width=52).grid(
                row=i, column=1, sticky="we")
            self.entries[key] = var

        # buttons
        btns = ttk.Frame(top)
        btns.grid(row=len(FORM_KEYS) + 1, column=0, columnspan=2, pady=4)
        ttk.Button(btns, text="Save Preset", command=self.save_preset).pack(
            side="left", padx=2)
        self.start_btn = ttk.Button(btns, text="Train", command=self.start_training)
        self.start_btn.pack(side="left", padx=2)
        ttk.Button(btns, text="Stop", command=self.stop_training).pack(
            side="left", padx=2)
        ttk.Button(btns, text="Force Save",
                   command=self.force_save).pack(side="left", padx=2)

        self.status_var = tk.StringVar(value="idle")
        ttk.Label(top, textvariable=self.status_var).grid(
            row=len(FORM_KEYS) + 2, column=0, columnspan=2, sticky="w")

        self.console = tk.Text(top, height=18, width=90, state="disabled")
        self.console.grid(row=len(FORM_KEYS) + 3, column=0, columnspan=2,
                          sticky="nsew")
        root.after(200, self._refresh)

    # -- preset -------------------------------------------------------------
    def collect_flat(self) -> dict:
        flat = dict(self.flat)
        flat["TRAINING_MODE"] = self.mode_var.get()
        for key, var in self.entries.items():
            default = schema.default_value(key)
            value = var.get()
            if isinstance(default, bool):
                value = value.lower() in ("true", "1", "yes")
            elif isinstance(default, int):
                try:
                    value = int(float(value))
                except ValueError:
                    value = default
            elif isinstance(default, float):
                try:
                    value = float(value)
                except ValueError:
                    value = default
            flat[key] = value
        return flat

    def save_preset(self) -> Path:
        flat = self.collect_flat()
        preset = schema.nest_flat_config(flat)
        with open(self.preset_path, "w", encoding="utf-8") as f:
            json.dump(preset, f, indent=1)
        self._log_line(f"[gui] preset saved -> {self.preset_path}")
        return self.preset_path

    # -- training -----------------------------------------------------------
    def start_training(self):
        if self.runner and self.runner.is_running():
            return
        preset = self.save_preset()
        script = ("train_anima.py"
                  if self.mode_var.get().lower().startswith("anima")
                  else "train.py")
        script_path = Path(__file__).resolve().parents[2] / script
        self.metrics = LiveMetrics()
        self.runner = launch_trainer(
            script_path, preset, cwd=Path.cwd(),
            on_line=self._on_line, on_progress=self._on_progress,
            on_exit=lambda code: self._log_line(f"[gui] trainer exited ({code})"))
        self._log_line(f"[gui] launched {script} --config {preset}")

    def stop_training(self):
        if self.runner:
            self.runner.stop()
            self._log_line("[gui] stop requested")

    def force_save(self):
        flag = request_force_save(Path.cwd())
        self._log_line(f"[gui] emergency checkpoint requested ({flag})")

    # -- console ------------------------------------------------------------
    def _on_line(self, line: str):
        self.metrics.parse_line(line)
        self._log_line(line)

    def _on_progress(self, line: str):
        self.metrics.parse_line(line)

    def _log_line(self, line: str):
        self.log.append(line)

    def _refresh(self):
        status = self.metrics.status_line() or "idle"
        if self.metrics.failures:
            status += f"  [{len(self.metrics.failures)} failure flags]"
        self.status_var.set(status)
        self.console.configure(state="normal")
        self.console.delete("1.0", "end")
        self.console.insert("1.0", "\n".join(self.log.tail(200)))
        self.console.see("end")
        self.console.configure(state="disabled")
        self.root.after(300, self._refresh)


def main(argv=None) -> None:
    argv = sys.argv[1:] if argv is None else argv
    try:
        import tkinter as tk
    except Exception as e:  # noqa: BLE001
        raise SystemExit(f"tkinter unavailable: {e}")
    root = tk.Tk()
    TrainingApp(root, argv[0] if argv else None)
    root.mainloop()


if __name__ == "__main__":
    main()
