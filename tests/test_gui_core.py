"""GUI core (display-independent): metrics parsing, process runner, log buffer."""

import sys
import time
from pathlib import Path

import pytest

from aozora_sdxl_training_tpu.gui.log_buffer import CompressedLogBuffer
from aozora_sdxl_training_tpu.gui.metrics import LiveMetrics
from aozora_sdxl_training_tpu.gui.process_runner import (
    ProcessRunner,
    launch_trainer,
    request_force_save,
)
from aozora_sdxl_training_tpu.train.reporter import optimizer_block, progress_line


def test_live_metrics_parses_reporter_output():
    m = LiveMetrics()
    assert m.parse_line(progress_line(4, 100, 0.25, 512, s_per_step=1.0))
    assert m.parse_line(optimizer_block(2, 0.24, 8e-7, 1.0, 1.0, 1.5, 1.0, 1.0))
    assert m.step_loss.last() == (4, 0.25)
    assert m.total_steps == 100
    assert m.optim_loss.last() == (2, 0.24)
    assert m.lr.last()[1] == pytest.approx(8e-7)
    assert m.grad_raw.last() == (2, 1.5)
    assert m.grad_clipped.last() == (2, 1.0)
    status = m.status_line()
    assert "Loss: 0.2500" in status and "Timestep: 512" in status


def test_live_metrics_ticket_mode_and_ema():
    m = LiveMetrics(ema_beta=0.5)
    m.parse_line(progress_line(0, 10, 1.0, 100, sigma=0.1))
    m.parse_line(progress_line(1, 10, 0.0, 200, sigma=0.2))
    assert m.sigmas[-1] == pytest.approx(0.2)
    assert m.loss_ema.last()[1] == pytest.approx(0.5)
    assert "Sigma: 0.200000" in m.status_line()


def test_live_metrics_failure_flags():
    m = LiveMetrics()
    m.parse_line("RuntimeError: RESOURCE_EXHAUSTED: TPU backend error")
    assert len(m.failures) == 1
    m.parse_line("harmless info line")
    assert len(m.failures) == 1


def test_log_buffer_compression_and_random_access():
    buf = CompressedLogBuffer(block_lines=10)
    for i in range(95):
        buf.append(f"line {i:03d} " + "x" * 100)
    assert len(buf) == 95
    assert buf.compressed_bytes > 0
    assert buf.get_lines(5, 3) == [f"line {i:03d} " + "x" * 100 for i in (5, 6, 7)]
    # window across a block boundary and into the active block
    window = buf.get_lines(88, 5)
    assert window[0].startswith("line 088")
    assert window[-1].startswith("line 092")
    assert buf.tail(2)[-1].startswith("line 094")


def test_process_runner_round_trip(tmp_path):
    script = tmp_path / "fake_trainer.py"
    script.write_text(
        "import sys\n"
        "print('hello from trainer', flush=True)\n"
        "sys.stdout.write('progress 1\\r'); sys.stdout.flush()\n"
        "print('done', flush=True)\n")
    lines, progress, exits = [], [], []
    runner = ProcessRunner([sys.executable, "-u", str(script)],
                           on_line=lines.append, on_progress=progress.append,
                           on_exit=exits.append)
    runner.start()
    assert runner.wait(20) == 0
    time.sleep(0.3)
    assert "hello from trainer" in lines
    assert "done" in lines
    assert progress == ["progress 1"]
    assert exits == [0]


def test_process_runner_stop_kills_group(tmp_path):
    script = tmp_path / "spin.py"
    script.write_text("import time\nprint('up', flush=True)\n"
                      "time.sleep(600)\n")
    runner = ProcessRunner([sys.executable, "-u", str(script)])
    runner.start()
    time.sleep(0.5)
    assert runner.is_running()
    runner.stop(grace_seconds=2)
    assert not runner.is_running()


def test_launch_trainer_command_shape(tmp_path):
    cfg = tmp_path / "p.json"
    cfg.write_text("{}")
    script = tmp_path / "t.py"
    script.write_text("import sys; print(sys.argv[1:], flush=True)\n")
    lines = []
    runner = launch_trainer(script, cfg, on_line=lines.append)
    runner.wait(20)
    time.sleep(0.3)
    assert any("--config" in line for line in lines)


def test_request_force_save(tmp_path):
    flag = request_force_save(tmp_path)
    assert flag.name == "force_save.flag"
    assert flag.exists()


def test_metrics_parse_preview_announcement():
    from aozora_sdxl_training_tpu.gui.metrics import LiveMetrics

    m = LiveMetrics()
    assert m.latest_preview is None
    assert m.parse_line("INFO: preview image saved -> /out/previews/step_2.png")
    m.parse_line("INFO: preview image saved -> /out/previews/step_4.png")
    assert m.latest_preview == "/out/previews/step_4.png"
    assert m.preview_paths == ["/out/previews/step_2.png",
                               "/out/previews/step_4.png"]
    # a plain INFO line is not a preview and not a failure
    assert not m.parse_line("INFO: preview sampling every 2 optimizer step(s)")
