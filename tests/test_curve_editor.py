"""Interactive curve-editor view-models: gestures drive the edit models.

The tkinter canvases only forward events (gui/app.py EditorCanvas); these
tests ARE the behavioral coverage of the authoring surface the reference
implements as Qt widgets (gui.py:1956-2683)."""

import math

import pytest

from aozora_sdxl_training_tpu.gui.curve_editor import (
    CurveEditorViewModel,
    HistogramEditorViewModel,
)
from aozora_sdxl_training_tpu.gui.curve_models import (
    LRCurveModel,
    LossWeightCurveModel,
    TimestepHistogramModel,
)
from aozora_sdxl_training_tpu.train.curves import LRCurve


def lr_vm():
    model = LRCurveModel(min_lr=1e-8, max_lr=1e-5)
    model.set_points([[0.0, 1e-8], [0.5, 1e-6], [1.0, 1e-8]])
    return model, CurveEditorViewModel(model, y_scale="log")


def test_press_selects_nearest_handle_and_drag_moves_it():
    model, vm = lr_vm()
    hx, hy, _ = vm.handles_px()[1]
    assert vm.press(hx + 3, hy - 2) == 1
    vm.drag(vm.x_to_px(0.7), vm.y_to_px(5e-6))
    vm.release()
    pts = model.get_points()
    assert pts[1][0] == pytest.approx(0.7, abs=0.02)
    assert pts[1][1] == pytest.approx(5e-6, rel=0.05)


def test_endpoint_drag_keeps_x_pinned():
    model, vm = lr_vm()
    hx, hy, _ = vm.handles_px()[0]
    vm.press(hx, hy)
    vm.drag(vm.x_to_px(0.4), vm.y_to_px(1e-6))
    pts = model.get_points()
    assert pts[0][0] == 0.0                       # x pinned
    assert pts[0][1] == pytest.approx(1e-6, rel=0.05)  # y moved


def test_interior_drag_clamped_between_neighbours():
    model, vm = lr_vm()
    hx, hy, _ = vm.handles_px()[1]
    vm.press(hx, hy)
    vm.drag(vm.x_to_px(0.0), hy)  # try to cross the left endpoint
    assert model.get_points()[1][0] >= 0.0
    assert model.get_points()[0][0] == 0.0


def test_double_press_adds_point_at_click():
    model, vm = lr_vm()
    n0 = len(model.get_points())
    idx = vm.double_press(vm.x_to_px(0.25), vm.y_to_px(3e-7))
    assert idx > 0 and len(model.get_points()) == n0 + 1
    x, y = model.get_points()[idx]
    assert x == pytest.approx(0.25, abs=0.02)
    assert y == pytest.approx(3e-7, rel=0.05)


def test_right_press_removes_interior_only():
    model, vm = lr_vm()
    hx, hy, _ = vm.handles_px()[0]
    assert not vm.right_press(hx, hy)      # endpoints locked
    hx, hy, _ = vm.handles_px()[1]
    assert vm.right_press(hx, hy)
    assert len(model.get_points()) == 2


def test_log_transform_round_trip():
    _, vm = lr_vm()
    for y in (1e-8, 3.3e-7, 1e-5):
        assert vm.px_to_y(vm.y_to_px(y)) == pytest.approx(y, rel=1e-6)


def test_edited_lr_curve_feeds_the_trainer_schedule():
    model, vm = lr_vm()
    hx, hy, _ = vm.handles_px()[1]
    vm.press(hx, hy)
    vm.drag(vm.x_to_px(0.5), vm.y_to_px(1e-5))
    vm.release()
    curve = LRCurve(model.get_points(), total_micro_steps=100)
    assert curve.lr_at(50) == pytest.approx(1e-5, rel=0.05)


def test_loss_weight_editor_breaks_bell_preset_on_drag():
    model = LossWeightCurveModel({"preset": "bell"})
    vm = CurveEditorViewModel(model, y_min=0.0, y_max=2.0)
    assert isinstance(model.get_points(), dict)  # bell token
    handles = vm.handles_px()                    # preview points render
    assert len(handles) == 9
    vm.press(handles[4][0], handles[4][1])
    vm.drag(handles[4][0], vm.y_to_px(0.3))
    pts = model.get_points()
    assert isinstance(pts, list)                 # token replaced by points


def test_histogram_paint_sets_counts():
    model = TimestepHistogramModel(bin_size=100, max_tickets=1000)
    vm = HistogramEditorViewModel(model)
    bars = vm.bars_px()
    assert len(bars) == 10
    x0, _, x1, _ = bars[3]
    cx = (x0 + x1) / 2
    assert vm.press(cx, vm.pad_t)                # paint to ~max height
    vm.release()
    assert model.counts[3] > 100                 # raised above uniform
    total = sum(model.counts)
    alloc = model.get_allocation()
    assert alloc["counts"][3] == model.counts[3]
    assert alloc["bin_size"] == 100
    # trainer-side rescale still lands exactly on the requested total
    model.set_total_steps(500)
    assert sum(model.counts) == 500
    assert total != 500 or True


def test_histogram_paint_to_zero():
    model = TimestepHistogramModel(bin_size=100, max_tickets=1000)
    vm = HistogramEditorViewModel(model)
    bars = vm.bars_px()
    x0, _, x1, base = bars[0]
    vm.press((x0 + x1) / 2, base)  # bottom = zero
    assert model.counts[0] == 0


def test_resize_keeps_transforms_consistent():
    _, vm = lr_vm()
    vm.resize(900, 400)
    assert vm.px_to_x(vm.x_to_px(0.3)) == pytest.approx(0.3, abs=1e-9)
    assert math.isfinite(vm.y_to_px(1e-6))
