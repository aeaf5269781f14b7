"""Headless GUI model tests: chart series, curve editors, theme, datasets."""

import json
import math

import pytest

from aozora_sdxl_training_tpu.gui.charts import ChartModel, Series, sample
from aozora_sdxl_training_tpu.gui.curve_models import (
    LossWeightCurveModel,
    LRCurveModel,
    TimestepHistogramModel,
)
from aozora_sdxl_training_tpu.gui.datasets_model import (
    DatasetManager,
    cache_folder_names,
)
from aozora_sdxl_training_tpu.gui.theme import (
    THEME,
    GuiState,
    Theme,
    apply_to_ttk,  # noqa: F401 — import check only (needs a live Tk root)
    normalize_color,
)


# -- charts ------------------------------------------------------------------

class TestSeries:
    def test_append_monotonic(self):
        s = Series("loss")
        for i in range(5):
            s.append(i, i * 0.1)
        assert s.x_values == [0, 1, 2, 3, 4]

    def test_out_of_order_insert_and_replace(self):
        s = Series("loss")
        s.append(0, 1.0)
        s.append(10, 2.0)
        s.append(5, 9.0)           # sorted insert
        assert s.x_values == [0, 5, 10]
        s.append(5, 3.0)           # same-x replaces
        assert s.data[1] == (5, 3.0)
        assert s.x_values == [0, 5, 10]

    def test_compaction_preserves_endpoints_and_extremes(self):
        s = Series("loss", max_points=100)
        for i in range(200):
            y = 100.0 if i == 97 else math.sin(i / 7)
        # re-run appending (spike at i=97)
        s = Series("loss", max_points=100)
        for i in range(200):
            y = 100.0 if i == 97 else math.sin(i / 7)
            s.append(i, y)
        assert len(s.data) <= max(256, 100 // 2) + 2
        assert s.data[0][0] == 0 and s.data[-1][0] == 199
        assert any(y == 100.0 for _, y in s.data), "spike lost in compaction"
        assert s.x_values == sorted(s.x_values)

    def test_visible_slice_margins(self):
        s = Series("loss")
        for i in range(100):
            s.append(i, float(i))
        sl = s.visible_slice(10, 20)
        xs = [x for x, _ in sl]
        # one extra point each side so lines cross the viewport edge
        assert xs[0] == 9 and xs[-1] == 21

    def test_visible_slice_outside_range(self):
        s = Series("loss")
        for i in range(10):
            s.append(i, float(i))
        assert s.visible_slice(100, 200) == [(9, 9.0)]

    def test_sample_downsamples_keeping_extremes(self):
        pts = [(i, 50.0 if i == 123 else 0.0) for i in range(1000)]
        out = sample(pts, 100)
        assert len(out) <= 100
        assert any(y == 50.0 for _, y in out)

    def test_chart_model_range(self):
        c = ChartModel("Loss", "loss")
        i0 = c.add_line("step loss")
        i1 = c.add_line("ema", color="#49d98a")
        c.append(i0, 5, 1.0)
        c.append(i1, 50, 0.5)
        assert c.data_range() == (5, 50)
        c.clear()
        assert c.data_range() == (0.0, 100.0)


# -- LR curve ----------------------------------------------------------------

class TestLRCurve:
    def test_default_points_sorted(self):
        m = LRCurveModel(min_lr=1e-7, max_lr=1e-4)
        pts = m.get_points()
        assert pts == sorted(pts, key=lambda p: p[0])
        assert pts[0][0] == 0.0 and pts[-1][0] == 1.0

    def test_set_bounds_clamps(self):
        m = LRCurveModel(min_lr=1e-7, max_lr=1e-4)
        changed = m.set_bounds(1e-6, 5e-5)
        assert changed
        assert all(1e-6 <= p[1] <= 5e-5 for p in m.get_points())

    def test_add_point_in_largest_gap_log_midpoint(self):
        m = LRCurveModel(min_lr=1e-7, max_lr=1e-4)
        m.set_points([[0.0, 1e-7], [0.1, 1e-4], [1.0, 1e-7]])
        idx = m.add_point()
        pts = m.get_points()
        assert idx == 2
        assert pts[2][0] == pytest.approx(0.55)
        assert pts[2][1] == pytest.approx(math.sqrt(1e-4 * 1e-7))

    def test_endpoints_not_removable(self):
        m = LRCurveModel()
        n = len(m.get_points())
        assert not m.remove_point(0)
        assert not m.remove_point(n - 1)
        assert len(m.get_points()) == n

    def test_move_point_keeps_order_and_endpoint_x(self):
        m = LRCurveModel(min_lr=1e-7, max_lr=1e-4)
        m.set_points([[0.0, 1e-7], [0.5, 5e-5], [1.0, 1e-7]])
        m.move_point(1, 2.0, 1.0)  # x past right neighbor, lr above max
        pts = m.get_points()
        assert pts[1][0] == 1.0 and pts[1][1] == 1e-4
        m.move_point(0, 0.7, 5e-5)  # endpoint x pinned
        assert m.get_points()[0][0] == 0.0

    @pytest.mark.parametrize("mode,npts", [("Constant", 4), ("Linear", 3),
                                           ("Cosine", 22)])
    def test_standard_presets(self, mode, npts):
        m = LRCurveModel(min_lr=1e-7, max_lr=1e-4)
        m.set_standard_preset(mode)
        pts = m.get_points()
        assert len(pts) == npts
        assert pts[0] == [0.0, 1e-7]
        assert pts[1] == [0.05, 1e-4]          # 5% warmup in every preset
        assert pts[-1][1] == pytest.approx(1e-7)

    def test_unknown_preset_raises(self):
        with pytest.raises(ValueError):
            LRCurveModel().set_standard_preset("Polynomial")


# -- timestep histogram ------------------------------------------------------

class TestTimestepHistogram:
    def test_uniform_init_exact_total(self):
        m = TimestepHistogramModel(bin_size=50, max_tickets=1003)
        assert len(m.counts) == 20
        assert sum(m.counts) == 1003
        assert max(m.counts) - min(m.counts) <= 1

    def test_set_total_steps_rescales_shape(self):
        m = TimestepHistogramModel(bin_size=100, max_tickets=100)
        m.counts = [0, 0, 0, 0, 50, 50, 0, 0, 0, 0]
        m.set_total_steps(200)
        assert sum(m.counts) == 200
        assert m.counts[4] == 100 and m.counts[5] == 100

    def test_set_allocation_mismatch_resets(self):
        m = TimestepHistogramModel(bin_size=50, max_tickets=100)
        m.set_allocation({"bin_size": 50, "counts": [1, 2, 3]})  # expects 20
        assert len(m.counts) == 20
        assert sum(m.counts) == 100

    def test_allocation_roundtrip_updates_max_tickets(self):
        m = TimestepHistogramModel(bin_size=250, max_tickets=10)
        m.set_allocation({"bin_size": 250, "counts": [5, 6, 7, 8]})
        assert m.max_tickets == 26
        assert m.get_allocation() == {"bin_size": 250, "counts": [5, 6, 7, 8]}

    def test_generate_from_weights_exact_total(self):
        m = TimestepHistogramModel(bin_size=100, max_tickets=997)
        m.generate_from_weights([1.0] * 5 + [2.0] * 5)
        assert sum(m.counts) == 997
        assert sum(m.counts[5:]) > sum(m.counts[:5])

    def test_apply_distribution_matches_sampler_weights(self):
        from aozora_sdxl_training_tpu.train.timestep_presets import (
            distribution_weights,
        )
        m = TimestepHistogramModel(bin_size=100, max_tickets=1000)
        m.apply_distribution("Odds-Scaled (Z-Image)", odds_scale=3.0)
        w = distribution_weights("Odds-Scaled (Z-Image)", 100, odds_scale=3.0)
        total_w = sum(w)
        for count, weight in zip(m.counts, w):
            assert count == pytest.approx(1000 * weight / total_w, abs=1)


# -- loss-weight curve -------------------------------------------------------

class TestLossWeightCurve:
    def test_clamping_and_endpoint_pinning(self):
        m = LossWeightCurveModel([[0.2, 5.0], [-0.1, -1.0], [0.6, 1.5]])
        pts = m.get_points()
        assert pts[0][0] == 0.0 and pts[-1][0] == 1.0
        assert all(0.0 <= p[1] <= 2.0 for p in pts)

    def test_invalid_points_fall_back_to_flat(self):
        m = LossWeightCurveModel([["x", None]])
        assert m.get_points() == [[0.0, 1.0], [1.0, 1.0]]

    def test_bell_preset_roundtrip(self):
        m = LossWeightCurveModel()
        m.apply_bell_preset()
        assert m.get_points() == {"preset": "bell"}
        # set_points accepts the serialized dict back
        m2 = LossWeightCurveModel({"preset": "bell"})
        assert m2.get_points() == {"preset": "bell"}

    def test_bell_preview_is_9_point_normalized_bell(self):
        pts = LossWeightCurveModel.bell_preview_points()
        assert len(pts) == 9
        ys = [p[1] for p in pts]
        assert ys[4] == max(ys)           # peak at center
        assert ys[0] == pytest.approx(0.0, abs=1e-9)

    def test_min_snr_like_preset(self):
        m = LossWeightCurveModel()
        m.apply_min_snr_like_preset()
        pts = m.get_points()
        assert pts[0] == [0.0, 0.0043]
        assert pts[-1] == [1.0, 1.0]

    def test_editing_clears_preset(self):
        m = LossWeightCurveModel()
        m.apply_bell_preset()
        m.add_point()
        assert isinstance(m.get_points(), list)

    def test_add_and_remove(self):
        m = LossWeightCurveModel([[0.0, 1.0], [1.0, 0.5]])
        idx = m.add_point()
        assert idx == 1
        assert m.get_points()[1] == [0.5, 0.75]
        assert m.remove_point(1)
        assert len(m.get_points()) == 2


# -- theme + gui state -------------------------------------------------------

class TestTheme:
    def test_default_roles(self):
        assert THEME.window == "#11151c"
        assert THEME.canvas == THEME.nested_group
        assert THEME.chart == THEME.surface
        assert THEME.color("accent") == "#c1845b"

    def test_normalize_color(self):
        assert normalize_color("#AABBCC") == "#aabbcc"
        assert normalize_color("aabbcc") == "#aabbcc"
        assert normalize_color("red") == "#ff0000"
        assert normalize_color("not-a-color") is None
        assert normalize_color("#12345") is None

    def test_with_overrides_ignores_invalid(self):
        t = THEME.with_overrides({"accent": "#112233", "bogus": "#000000",
                                  "danger": "nope"})
        assert t.accent == "#112233"
        assert t.danger == THEME.danger
        assert not hasattr(t, "bogus") or isinstance(t, Theme)

    def test_gui_state_roundtrip(self, tmp_path):
        st = GuiState(str(tmp_path))
        assert st.last_config is None
        st.save(last_config="my_preset", theme_colors={"accent": "#112233"})
        st2 = GuiState(str(tmp_path))
        assert st2.last_config == "my_preset"
        assert st2.theme().accent == "#112233"
        raw = json.loads((tmp_path / "gui_state.json").read_text())
        assert raw["last_config"] == "my_preset"

    def test_gui_state_corrupt_file(self, tmp_path):
        (tmp_path / "gui_state.json").write_text("{ not json")
        st = GuiState(str(tmp_path))
        assert st.read() == {}
        assert st.theme() == THEME


# -- dataset manager ---------------------------------------------------------

def _make_dataset(tmp_path, name, n_images):
    d = tmp_path / name
    d.mkdir()
    for i in range(n_images):
        (d / f"img_{i}.png").write_bytes(b"\x89PNG fake")
        (d / f"img_{i}.txt").write_text(f"caption {i}")
    (d / "notes.md").write_text("not an image")
    return d


class TestDatasetManager:
    def test_scan_counts_and_repeats(self, tmp_path):
        a = _make_dataset(tmp_path, "a", 3)
        b = _make_dataset(tmp_path, "b", 5)
        mgr = DatasetManager([{"path": str(a), "repeats": 2},
                              {"path": str(b), "repeats": 1}])
        assert [d.image_count for d in mgr.datasets] == [3, 5]
        assert mgr.total_with_repeats() == 3 * 2 + 5
        assert mgr.get_config() == [{"path": str(a), "repeats": 2},
                                    {"path": str(b), "repeats": 1}]

    def test_caption_pairing(self, tmp_path):
        a = _make_dataset(tmp_path, "a", 1)
        mgr = DatasetManager([{"path": str(a), "repeats": 1}])
        entry = mgr.datasets[0]
        assert entry.caption_for(entry.images[0]) == "caption 0"

    def test_sort_modes(self, tmp_path):
        a = _make_dataset(tmp_path, "zeta", 1)
        b = _make_dataset(tmp_path, "alpha", 4)
        mgr = DatasetManager([{"path": str(a)}, {"path": str(b)}])
        mgr.sort("count_desc")
        assert mgr.datasets[0].image_count == 4
        mgr.sort("name")
        assert mgr.datasets[0].path.endswith("alpha")

    def test_cache_folder_names_by_mode(self):
        assert cache_folder_names({"TRAINING_MODE": "SDXL",
                                   "PREDICTION_TYPE": "rectified_flow"}) == \
            [".precomputed_embeddings_cache_rf"]
        assert cache_folder_names({"TRAINING_MODE": "SDXL",
                                   "PREDICTION_TYPE": "v_prediction"}) == \
            [".precomputed_embeddings_cache_standard_sdxl"]
        assert cache_folder_names({"TRAINING_MODE": "Anima DiT"}) == \
            [".precomputed_anima_dit_cache"]

    def test_clear_cache(self, tmp_path):
        a = _make_dataset(tmp_path, "a", 1)
        cache = a / ".precomputed_embeddings_cache_standard_sdxl"
        cache.mkdir()
        (cache / "x.safetensors").write_bytes(b"00")
        mgr = DatasetManager([{"path": str(a)}])
        cfg = {"TRAINING_MODE": "SDXL", "PREDICTION_TYPE": "v_prediction"}
        assert mgr.cache_exists(0, cfg)
        removed = mgr.clear_cache(0, cfg)
        assert removed == [str(cache)]
        assert not cache.exists()
        assert not mgr.cache_exists(0, cfg)

    def test_set_repeats_and_remove(self, tmp_path):
        a = _make_dataset(tmp_path, "a", 2)
        b = _make_dataset(tmp_path, "b", 2)
        mgr = DatasetManager([{"path": str(a)}, {"path": str(b)}])
        mgr.set_repeats(0, 0)       # clamps to 1
        assert mgr.datasets[0].repeats == 1
        mgr.remove([0])
        assert len(mgr.datasets) == 1 and mgr.datasets[0].path == str(b)


class TestViewWindow:
    """Zoom/pan/reset semantics of charts.ViewWindow + ChartModel hover
    (the GraphPanel interaction model, gui.py:1276-1420)."""

    def _chart(self):
        from aozora_sdxl_training_tpu.gui.charts import ChartModel
        m = ChartModel("t")
        m.add_line("a")
        for x in range(101):
            m.append(0, float(x), float(x % 7))
        return m

    def test_auto_follows_data(self):
        m = self._chart()
        assert m.view.is_auto
        assert m.view_range() == m.data_range() == (0.0, 100.0)
        m.append(0, 150.0, 1.0)
        assert m.view_range() == (0.0, 150.0)  # still following

    def test_zoom_in_freezes_window(self):
        m = self._chart()
        m.zoom_at(0.5, 0.5)  # halve the span about the center
        lo, hi = m.view_range()
        assert (lo, hi) == (25.0, 75.0)
        m.append(0, 200.0, 1.0)
        assert m.view_range() == (25.0, 75.0)  # zoomed: no follow

    def test_zoom_about_cursor_keeps_center(self):
        m = self._chart()
        m.zoom_at(0.25, 0.5)
        lo, hi = m.view_range()
        # x at 25% of the old window stays at 25% of the new one
        assert lo + 0.25 * (hi - lo) == pytest.approx(25.0)

    def test_zoom_out_past_data_returns_to_auto(self):
        m = self._chart()
        m.zoom_at(0.5, 0.5)
        m.zoom_at(0.5, 4.0)  # zoom out well past the data range
        assert m.view.is_auto

    def test_pan_shifts_by_fraction_of_span(self):
        m = self._chart()
        m.zoom_at(0.5, 0.5)          # window (25, 75)
        m.pan_fraction(0.1)          # +5
        assert m.view_range() == (30.0, 80.0)

    def test_reset_restores_follow(self):
        m = self._chart()
        m.zoom_at(0.5, 0.5)
        m.reset_view()
        assert m.view.is_auto

    def test_nearest_point_hover(self):
        m = self._chart()
        idx, (x, y) = m.nearest_point(42.4)
        assert idx == 0 and x == 42.0 and y == 42 % 7
        m.series[0].visible = False
        assert m.nearest_point(42.4) is None


class TestLiveDistributions:
    """Timestep/sigma histograms + mean-loss-by-bin (LiveMetrics)."""

    def _metrics_with_lines(self, lines):
        from aozora_sdxl_training_tpu.gui.metrics import LiveMetrics
        m = LiveMetrics()
        for line in lines:
            m.parse_line(line)
        return m

    def test_timestep_histogram_and_mean_loss(self):
        lines = [
            "Training |##| 1/10 [00:01] [Loss: 0.50, Timestep: 100]",
            "Training |##| 2/10 [00:01] [Loss: 0.70, Timestep: 120]",
            "Training |##| 3/10 [00:01] [Loss: 0.20, Timestep: 900]",
        ]
        m = self._metrics_with_lines(lines)
        edges, counts = m.timestep_histogram(bins=10)
        assert len(edges) == 11 and len(counts) == 10
        assert counts[1] == 2 and counts[9] == 1 and sum(counts) == 3
        _, means, cts = m.mean_loss_by_timestep(bins=10)
        assert means[1] == pytest.approx(0.6)
        assert means[9] == pytest.approx(0.2)
        assert means[0] is None and cts[0] == 0

    def test_sigma_histogram_rf_mode(self):
        lines = [
            "Training |##| 1/10 [00:01] [Loss: 0.40, Ticket: 100, Sigma: 0.110000]",
            "Training |##| 2/10 [00:01] [Loss: 0.60, Ticket: 200, Sigma: 0.150000]",
            "Training |##| 3/10 [00:01] [Loss: 1.00, Ticket: 800, Sigma: 0.950000]",
        ]
        m = self._metrics_with_lines(lines)
        edges, counts = m.sigma_histogram(bins=10)
        assert counts[1] == 2 and counts[9] == 1
        _, means, _ = m.mean_loss_by_sigma(bins=10)
        assert means[1] == pytest.approx(0.5)
        assert means[9] == pytest.approx(1.0)
