"""The stdout protocol must match the GUI's parsing regexes byte-for-byte."""

import re

from aozora_sdxl_training_tpu.train.reporter import (
    format_hms,
    optimizer_block,
    progress_line,
)

# The exact regexes the reference GUI uses (/root/reference/gui/gui.py:1856-1878)
GUI_TIMESTEP_RE = re.compile(
    r'Training\s*\|.*\|\s*(\d+)/(\d+)\s*\[.*?\]\s*\[Loss:\s*([\d.e+-]+),\s*Timestep:\s*(\d+)\]')
GUI_TICKET_RE = re.compile(
    r'Training\s*\|.*\|\s*(\d+)/(\d+)\s*\[.*?\]\s*\[Loss:\s*([\d.e+-]+),\s*Ticket:\s*(\d+),\s*Sigma:\s*([\d.e+-]+)\]')
GUI_OPTIM_RE = re.compile(
    r'--- Optimizer Step:\s*(\d+)\s*\|\s*Loss:\s*([\d.e+-]+)\s*\|\s*LR:\s*([\d.e+-]+)\s*---')
GUI_GRAD_RE = re.compile(r'Grad Norm \(Raw/Clipped\):\s*([\d.]+)\s*/\s*([\d.]+)')


def test_progress_line_timestep_mode():
    line = progress_line(41, 1000, 0.12345, 687, s_per_step=1.23,
                         eta=3600, elapsed=120)
    m = GUI_TIMESTEP_RE.search(line)
    assert m, line
    assert int(m.group(1)) == 42
    assert int(m.group(2)) == 1000
    assert float(m.group(3)) == 0.1234 or abs(float(m.group(3)) - 0.1235) < 1e-9
    assert int(m.group(4)) == 687


def test_progress_line_ticket_mode():
    line = progress_line(0, 10, 0.5, 123, sigma=0.123456)
    m = GUI_TICKET_RE.search(line)
    assert m, line
    assert int(m.group(4)) == 123
    assert float(m.group(5)) == 0.123456


def test_optimizer_block_grammar():
    block = optimizer_block(7, 0.08123, 8e-7, 2.5, 2.7, 1.5, 1.0, 1.0)
    m = GUI_OPTIM_RE.search(block)
    assert m, block
    assert int(m.group(1)) == 7
    assert float(m.group(3)) == 8e-7
    g = GUI_GRAD_RE.search(block)
    assert g, block
    assert float(g.group(1)) == 1.5
    assert float(g.group(2)) == 1.0
    assert "VRAM: Training=" in block
    assert "[OK]" in block
    assert "[NO UPDATE!]" in optimizer_block(7, 0.1, 1e-6, 1, 1, 0.0, 0.0, 0.0)


def test_format_hms():
    assert format_hms(3725) == "01:02:05"
    assert format_hms(None) == "N/A"
    assert format_hms(float("inf")) == "N/A"
