"""Illustration line-art detail maps -> per-latent loss-weight masks.

Re-implementation of /root/reference/scripts/semantic.py:10-52: a single
Laplacian high-frequency response with coherence boosting and a robust
percentile scaling produces an [H, W] map in [0, 1] of lines and fine
texture; resized to the latent grid it weights the flow-matching loss toward
detailed regions (used by the QAT repair trainer,
train_anima_repair.py:2213-2217).  Numpy/cv2 only — feeds device arrays.
"""

from __future__ import annotations

import numpy as np


def generate_illustration_detail_map(pil_image, sensitivity: float = 0.55) -> np.ndarray:
    """[H, W] float32 map in [0, 1] of line/texture density."""
    import cv2
    rgb = np.asarray(pil_image.convert("RGB"), dtype=np.uint8)
    gray = cv2.cvtColor(rgb, cv2.COLOR_RGB2GRAY).astype(np.float32) / 255.0
    gray = cv2.GaussianBlur(gray, (3, 3), 0.55)
    detail = np.abs(cv2.Laplacian(gray, cv2.CV_32F, ksize=3))

    # clustered detail is boosted over isolated pixel noise
    coherence = cv2.blur(detail, (5, 5))
    coherence /= max(float(np.percentile(coherence, 99.0)), 1.0e-6)
    detail *= 0.65 + 0.35 * np.clip(coherence, 0.0, 1.0)

    sensitivity = float(np.clip(sensitivity, 0.0, 1.0))
    floor = float(np.percentile(detail, 88.0 - sensitivity * 48.0))
    ceiling = float(np.percentile(detail, 99.5))
    detail = np.clip((detail - floor) / max(ceiling - floor, 1.0e-6), 0.0, 1.0)
    return detail.astype(np.float32)


def generate_lineart_loss_map(pil_image, latent_h: int, latent_w: int,
                              oversample: int = 4) -> np.ndarray:
    """Per-latent loss-weight mask, shape (1, latent_h*o, latent_w*o) fp32."""
    import cv2
    detail = generate_illustration_detail_map(pil_image, sensitivity=0.55)
    oversample = max(1, int(oversample))
    resized = cv2.resize(
        detail, (int(latent_w) * oversample, int(latent_h) * oversample),
        interpolation=cv2.INTER_AREA)
    return resized[None].astype(np.float32)


def loss_weight_mask_for_latents(pil_image, latent_h: int, latent_w: int,
                                 base_weight: float = 1.0,
                                 detail_weight: float = 1.0) -> np.ndarray:
    """(latent_h, latent_w) mask = base + detail * detail_map (mean ~normed)."""
    import cv2
    detail = generate_illustration_detail_map(pil_image)
    resized = cv2.resize(detail, (int(latent_w), int(latent_h)),
                         interpolation=cv2.INTER_AREA)
    return (base_weight + detail_weight * resized).astype(np.float32)
