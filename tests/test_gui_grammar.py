"""Stdout-grammar audit: replay REAL run logs through the reference GUI's
parsing regexes (VERDICT r3 #6).

The golden patterns below are copied verbatim from the reference GUI
(/root/reference/gui/gui.py:1853-1931 TrainingGraphs.parse_and_update, and
:2727-2738 the subprocess line-reader).  The tests drive the actual trainers
(tiny configs, CPU) and assert every GUI channel is matched by the captured
stdout — zero unmatched channels — and that the values the GUI would chart
parse to sane numbers.
"""

import math
import re
from pathlib import Path
from unittest import mock

import pytest

from aozora_sdxl_training_tpu.train.anima_trainer import run_anima_training
from aozora_sdxl_training_tpu.train.trainer import run_sdxl_training
from aozora_sdxl_training_tpu.models.sdxl import arch
from aozora_sdxl_training_tpu.data import cache_store as cs

from tests.test_end_to_end import _build_cache, _build_checkpoint, _make_config
from tests.test_anima_trainer import _build_anima_env

# --- golden patterns, verbatim from /root/reference/gui/gui.py -------------
# gui.py:1855 (Anima progress: Ticket + Sigma)
ANIMA_PROGRESS = re.compile(
    r'Training\s*\|.*\|\s*(\d+)/(\d+)\s*\[.*?\]\s*\[Loss:\s*([\d.e+-]+),'
    r'\s*Ticket:\s*(\d+),\s*Sigma:\s*([\d.e+-]+)\]')
# gui.py:1856 (SDXL progress: Timestep)
SDXL_PROGRESS = re.compile(
    r'Training\s*\|.*\|\s*(\d+)/(\d+)\s*\[.*?\]\s*\[Loss:\s*([\d.e+-]+),'
    r'\s*Timestep:\s*(\d+)\]')
# gui.py:1872
OPTIM_STEP = re.compile(
    r'--- Optimizer Step:\s*(\d+)\s*\|\s*Loss:\s*([\d.e+-]+)\s*\|'
    r'\s*LR:\s*([\d.e+-]+)\s*---')
# gui.py:1878
GRAD_NORM = re.compile(r'Grad Norm \(Raw/Clipped\):\s*([\d.]+)\s*/\s*([\d.]+)')
# gui.py:2727
PARAM_INFO_PREFIX = "GUI_PARAM_INFO::"
# gui.py:2731 — error keywords the GUI surfaces as "*** ERROR DETECTED ***"
ERROR_KEYWORDS = ("memory inaccessible", "cuda out of memory",
                  "access violation", "nan/inf")
# gui.py:2736 — cacheCreatedSignal keywords
CACHE_KEYWORDS = ("saved latents cache", "caching complete", "anima dit items")
# gui.py:2730 — tqdm-style progress detection
PROGRESS_DETECT = re.compile(r'^\s*\d+%\|\S*\|')
# gui.py:2706 ANSI_ESCAPE_RE equivalent
ANSI_ESCAPE = re.compile(r'\x1b\[[0-9;]*[A-Za-z]')


def _gui_lines(raw: str) -> list[str]:
    """What the reference GUI's line-reader would see: readline() splits on
    newlines, _clean_output_line strips ANSI + whitespace, and the charting
    regexes then run per line; progress records are additionally emitted as
    \r-overwritten segments, which the GUI recovers via line.split('\r')."""
    lines = []
    for chunk in raw.split("\n"):
        chunk = ANSI_ESCAPE.sub("", chunk)
        for seg in chunk.split("\r"):
            seg = seg.strip()
            if seg:
                lines.append(seg)
    return lines


def _audit(lines, progress_re, expect_sigma: bool):
    """Replay lines through every GUI channel; return per-channel hit counts
    and sanity-check the values the GUI would put on its charts."""
    hits = {"progress": 0, "optim": 0, "grad": 0, "param_info": 0,
            "cache": 0, "error": 0}
    for line in lines:
        m = progress_re.search(line)
        if m:
            hits["progress"] += 1
            step, total = int(m.group(1)), int(m.group(2))
            loss = float(m.group(3))
            ticket = int(m.group(4))
            assert 1 <= step <= total
            assert math.isfinite(loss)
            assert 0 <= ticket <= 1000
            if expect_sigma:
                sigma = float(m.group(5))
                assert 0.0 <= sigma <= 1.0
        m = OPTIM_STEP.search(line)
        if m:
            hits["optim"] += 1
            assert math.isfinite(float(m.group(2)))   # loss
            assert float(m.group(3)) > 0               # LR
        m = GRAD_NORM.search(line)
        if m:
            hits["grad"] += 1
            raw_n, clipped = float(m.group(1)), float(m.group(2))
            assert raw_n >= 0 and clipped >= 0
        if line.startswith(PARAM_INFO_PREFIX):
            hits["param_info"] += 1
            payload = line[len(PARAM_INFO_PREFIX):].strip()
            assert payload, "GUI_PARAM_INFO payload must be non-empty"
        low = line.lower()
        if any(kw in low for kw in CACHE_KEYWORDS):
            hits["cache"] += 1
        if any(kw in low for kw in ERROR_KEYWORDS):
            hits["error"] += 1
    return hits


def test_sdxl_run_log_matches_reference_gui_grammar(tmp_path, capfd):
    ckpt = tmp_path / "base.safetensors"
    _build_checkpoint(ckpt)
    (tmp_path / "data").mkdir()
    _build_cache(tmp_path / "data", cs.sdxl_cache_dir_name(False))
    config = _make_config(tmp_path, MAX_TRAIN_STEPS=4, SAVE_EVERY_N_STEPS=0)
    with mock.patch(
            "aozora_sdxl_training_tpu.train.trainer.check_if_caching_needed",
            return_value=False):
        run_sdxl_training(config, unet_cfg=arch.TINY)
    log = capfd.readouterr().out
    lines = _gui_lines(log)
    hits = _audit(lines, SDXL_PROGRESS, expect_sigma=False)
    # every trainer-owned channel fires; none of the failure channels do
    assert hits["progress"] >= 4, f"unmatched progress channel: {hits}"
    assert hits["optim"] >= 2, f"unmatched optimizer channel: {hits}"
    assert hits["grad"] >= 2, f"unmatched grad-norm channel: {hits}"
    assert hits["param_info"] == 1, f"GUI_PARAM_INFO channel: {hits}"
    assert hits["error"] == 0, "healthy run must not trip GUI error keywords"
    # the SDXL progress lines must never also parse as Anima lines
    assert all(not ANIMA_PROGRESS.search(l) for l in lines)


def test_anima_run_log_matches_reference_gui_grammar(tmp_path, capfd):
    config, _ = _build_anima_env(tmp_path, MAX_TRAIN_STEPS=3)
    with mock.patch(
            "aozora_sdxl_training_tpu.train.anima_trainer."
            "check_if_anima_caching_needed", return_value=False):
        run_anima_training(config)
    log = capfd.readouterr().out
    lines = _gui_lines(log)
    hits = _audit(lines, ANIMA_PROGRESS, expect_sigma=True)
    assert hits["progress"] >= 3, f"unmatched progress channel: {hits}"
    assert hits["optim"] >= 2, f"unmatched optimizer channel: {hits}"
    assert hits["grad"] >= 2, f"unmatched grad-norm channel: {hits}"
    assert hits["param_info"] == 1, f"GUI_PARAM_INFO channel: {hits}"
    assert hits["error"] == 0
    # Anima lines carry Ticket+Sigma and must NOT match the SDXL regex
    assert all(not SDXL_PROGRESS.search(l) for l in lines)


def test_anima_cache_line_triggers_gui_cache_signal(tmp_path):
    from aozora_sdxl_training_tpu.data.anima_cache import cache_complete_message
    line = cache_complete_message(7, tmp_path)
    assert any(kw in line.lower() for kw in CACHE_KEYWORDS)


def test_progress_lines_are_overwritten_in_place():
    """The reporter emits \r-prefixed progress records with no newline, so a
    terminal (and the GUI's is_progress detection at gui.py:2730, which keys
    on '\r' in the buffered line) treats them as in-place updates."""
    import contextlib
    import io
    from aozora_sdxl_training_tpu.train.reporter import MetricsReporter
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        rep = MetricsReporter(total_steps=4)
        rep.log_step(0, loss=0.5, timestep=500)
        rep.log_step(1, loss=0.4, timestep=400)
        rep.shutdown()
    raw = buf.getvalue()
    assert raw.count("\r") >= 2 and "\n" not in raw.strip()
