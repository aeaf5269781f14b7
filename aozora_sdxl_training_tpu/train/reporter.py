"""Stdout metrics protocol — the trainer<->GUI wire format.

The reference GUI regex-parses trainer stdout into live charts
(/root/reference/gui/gui.py:1853-1932).  This emitter produces the exact same
grammar so the PyQt GUI drives the TPU trainer unchanged:

* progress line:
  ``Training |####----| i/N[pp.pp%][Loss: x, Timestep: t][s/step, ETA, Elapsed]``
  (or ``Ticket: t, Sigma: s`` for rectified-flow / Anima runs);
* optimizer block: ``--- Optimizer Step: n | Loss: x | LR: y ---`` plus
  grad-norm / memory / update-magnitude lines.

"VRAM" becomes the TPU HBM numbers from ``device.memory_stats()`` but keeps
the same label text the GUI matches on.
"""

from __future__ import annotations

import math
import queue
import threading


def format_hms(seconds) -> str:
    if seconds is None or not math.isfinite(seconds):
        return "N/A"
    seconds = int(seconds)
    return f"{seconds // 3600:02}:{(seconds % 3600) // 60:02}:{seconds % 60:02}"


def device_memory_gb() -> tuple[float, float]:
    """(reserved_gb, allocated_gb) from the first accelerator, else zeros."""
    from ..core.platform import device_memory_gb as _impl
    return _impl()


def progress_line(micro_step: int, total_steps: int, loss: float,
                  timestep, sigma=None, s_per_step: float = 0.0,
                  eta=None, elapsed=None, bar_width: int = 30) -> str:
    pct = (micro_step + 1) / max(total_steps, 1)
    filled = int(bar_width * pct)
    bar = "#" * filled + "-" * (bar_width - filled)
    sampling = (f"Ticket: {timestep}, Sigma: {float(sigma):.6f}"
                if sigma is not None else f"Timestep: {timestep}")
    return (f"Training |{bar}| {micro_step + 1}/{total_steps}[{pct:.2%}]"
            f"[Loss: {loss:.4f}, {sampling}]"
            f"[{s_per_step:.2f}s/step, ETA: {format_hms(eta)}, "
            f"Elapsed: {format_hms(elapsed)}]")


def optimizer_block(optim_step: int, avg_loss: float, lr: float,
                    optim_step_time: float, avg_optim_step_time: float,
                    raw_grad_norm: float, clipped_grad_norm: float,
                    update_delta: float) -> str:
    status = "[OK]" if update_delta > 1e-12 else "[NO UPDATE!]"
    mem_reserved, mem_alloc = device_memory_gb()
    return (
        f"\n--- Optimizer Step: {optim_step:<5} | Loss: {avg_loss:<8.5f} | "
        f"LR: {lr:.2e} ---\n"
        f"  Time: {optim_step_time:.2f}s/step | Avg Speed: {avg_optim_step_time:.2f}s/step\n"
        f"  Grad Norm (Raw/Clipped): {raw_grad_norm:<8.4f} / {clipped_grad_norm:<8.4f}\n"
        f"  VRAM: Training={mem_reserved:.2f}GB | Model={mem_alloc:.2f}GB\n"
        f"  |- Update Magnitude : {update_delta:.4e} {status}\n")


class MetricsReporter:
    """Queue-drained stdout reporter (non-blocking from the step loop).

    The worker thread owns the terminal: progress lines overwrite in place
    via ``\\r``, messages and optimizer blocks clear the line first — the
    same terminal discipline the GUI's line-reader expects.
    """

    def __init__(self, total_steps: int):
        self.total_steps = total_steps
        self._queue: queue.Queue = queue.Queue()
        self._stop = threading.Event()
        self._last_line_len = 0
        self._worker = threading.Thread(target=self._run, daemon=True)
        self._worker.start()

    # -- producer API -------------------------------------------------------
    def log_step(self, micro_step: int, *, loss: float, timestep, sigma=None,
                 s_per_step: float = 0.0, eta=None, elapsed=None,
                 optim_block: str | None = None) -> None:
        self._queue.put(("step", (micro_step, loss, timestep, sigma,
                                  s_per_step, eta, elapsed, optim_block)))

    def log_message(self, text: str) -> None:
        self._queue.put(("message", text))

    def shutdown(self) -> None:
        self._queue.join()
        self._stop.set()
        self._worker.join(timeout=5)
        self._clear_line()

    # -- worker -------------------------------------------------------------
    def _clear_line(self) -> None:
        if self._last_line_len:
            print("\r" + " " * self._last_line_len + "\r", end="", flush=True)
            self._last_line_len = 0

    def _run(self) -> None:
        while not self._stop.is_set():
            try:
                kind, data = self._queue.get(timeout=0.05)
            except queue.Empty:
                continue
            try:
                if kind == "message":
                    self._clear_line()
                    print(data, flush=True)
                else:
                    (micro_step, loss, timestep, sigma, s_per_step, eta,
                     elapsed, optim_block) = data
                    if optim_block:
                        self._clear_line()
                        print(optim_block, flush=True)
                    line = progress_line(micro_step, self.total_steps, loss,
                                         timestep, sigma, s_per_step, eta,
                                         elapsed)
                    print("\r" + line, end="", flush=True)
                    self._last_line_len = len(line)
            finally:
                self._queue.task_done()
