"""Visual LR curve and timestep loss-weight curve as pure host functions.

Parity targets:
* LR curve — piecewise-linear interpolation over the micro-step fraction with
  endpoint padding (/root/reference/train.py:325-359); initial optimizer LR is
  the curve's max point (train.py:2259).
* Loss-weight curve — piecewise-linear over [0, 1] sampled at every integer
  timestep, plus the "bell" preset ``exp(-2((t-T/2)/T)^2)`` min-subtracted and
  normalized to mean 1 (train.py:2351-2405).

Both produce plain numpy; the train step consumes the loss-weight table as a
device constant and the per-step LR as a scalar input, so LR changes never
trigger recompilation.
"""

from __future__ import annotations

import numpy as np


def normalize_curve_points(points) -> list[tuple[float, float]]:
    """Sort and pad curve points so they span x in [0, 1]."""
    pts = sorted([(float(p[0]), float(p[1])) for p in points], key=lambda p: p[0])
    if not pts:
        raise ValueError("LR_CUSTOM_CURVE cannot be empty")
    if pts[0][0] != 0.0:
        pts.insert(0, (0.0, pts[0][1]))
    if pts[-1][0] != 1.0:
        pts.append((1.0, pts[-1][1]))
    return pts


def interpolate_curve(points, x: float) -> float:
    """Linear interpolation on normalized, padded points."""
    x = max(0.0, min(1.0, float(x)))
    for (x1, y1), (x2, y2) in zip(points, points[1:]):
        if x1 <= x <= x2:
            if x2 - x1 == 0:
                return y1
            t = (x - x1) / (x2 - x1)
            return y1 + t * (y2 - y1)
    return points[-1][1]


class LRCurve:
    """Micro-step-indexed LR from the GUI's visual curve.

    Empty-curve handling is an intentional divergence: the reference's
    CustomCurveLRScheduler raises ValueError on an empty curve
    (train.py:331) even though create_optimizer's initial LR falls back to
    LEARNING_RATE (train.py:2259).  Here ``fallback_lr`` materializes as a
    flat two-point curve so training proceeds at the constant LR instead
    of crashing at scheduler construction."""

    def __init__(self, curve_points, total_micro_steps: int,
                 fallback_lr: float | None = None):
        if not curve_points and fallback_lr is not None:
            curve_points = [(0.0, float(fallback_lr)),
                            (1.0, float(fallback_lr))]
        self.points = normalize_curve_points(curve_points)
        self.total_micro_steps = max(int(total_micro_steps), 1)

    @property
    def initial_lr(self) -> float:
        """Reference quirk: the optimizer is constructed at the curve max."""
        return max(y for _, y in self.points)

    def lr_at(self, micro_step: int) -> float:
        frac = micro_step / max(self.total_micro_steps - 1, 1)
        return interpolate_curve(self.points, frac)


def bell_timestep_loss_curve(total_timestep_count: int) -> np.ndarray:
    steps = int(total_timestep_count)
    grid = np.arange(steps, dtype=np.float32)
    y = np.exp(-2.0 * ((grid - steps / 2) / steps) ** 2)
    y0 = y - y.min()
    scale = steps / max(float(y0.sum()), 1e-12)
    return np.clip(y0, 0.0, None) * scale


def timestep_loss_curve_from_config(config, total_timestep_count: int) -> np.ndarray:
    """Per-timestep loss weight table, shape [total_timestep_count], fp32."""
    steps = int(total_timestep_count)
    if steps <= 0:
        return np.ones(1, dtype=np.float32)

    points = getattr(config, "TIMESTEP_LOSS_WEIGHT_CURVE", None)
    if not points:
        return np.ones(steps, dtype=np.float32)
    if isinstance(points, dict):
        if str(points.get("preset", "")).lower() == "bell":
            return bell_timestep_loss_curve(steps)
        return np.ones(steps, dtype=np.float32)

    cleaned = []
    for point in points:
        try:
            x = max(0.0, min(1.0, float(point[0])))
            y = max(0.0, float(point[1]))
            cleaned.append((x, y))
        except (TypeError, ValueError, IndexError):
            continue
    if len(cleaned) < 2:
        return np.ones(steps, dtype=np.float32)

    cleaned.sort(key=lambda p: p[0])
    if cleaned[0][0] > 0.0:
        cleaned.insert(0, (0.0, cleaned[0][1]))
    else:
        cleaned[0] = (0.0, cleaned[0][1])
    if cleaned[-1][0] < 1.0:
        cleaned.append((1.0, cleaned[-1][1]))
    else:
        cleaned[-1] = (1.0, cleaned[-1][1])

    xp = np.array([p[0] for p in cleaned], dtype=np.float32)
    yp = np.array([p[1] for p in cleaned], dtype=np.float32)
    grid = np.linspace(0.0, 1.0, steps, dtype=np.float32)
    idx = np.clip(np.searchsorted(xp, grid, side="right"), 1, len(cleaned) - 1)
    x0, x1 = xp[idx - 1], xp[idx]
    y0, y1 = yp[idx - 1], yp[idx]
    blend = np.clip((grid - x0) / np.maximum(x1 - x0, 1e-12), 0.0, 1.0)
    return (y0 + (y1 - y0) * blend).astype(np.float32)
