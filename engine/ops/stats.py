"""Per-image pixel statistics (SURVEY.md §2.3 M4).

Recasts the reference's per-fragment physicochemical descriptors
(SURVEY.md §1.2 concept map) as decoded-pixel descriptors: width/height/
aspect, per-channel mean/std, and luma-histogram entropy.

Definitions (frozen; the NumPy oracle in engine/oracle.py re-implements
them independently of the batch path):
  aspect   = w / h
  mean_c   = mean of channel c over all pixels (float64)
  std_c    = population std (ddof=0) of channel c
  entropy  = Shannon entropy (base 2) of the 256-bin histogram of the
             rounded BT.601 luma, p>0 terms only
"""

from __future__ import annotations

import numpy as np


def image_stats(pixels: np.ndarray) -> dict:
    f = pixels.astype(np.float64)
    h, w = pixels.shape[:2]
    mean = f.mean(axis=(0, 1))
    std = f.std(axis=(0, 1))
    luma = np.clip(np.round(0.299 * f[..., 0] + 0.587 * f[..., 1] + 0.114 * f[..., 2]), 0, 255).astype(np.uint8)
    counts = np.bincount(luma.reshape(-1), minlength=256)
    p = counts[counts > 0] / luma.size
    entropy = float(-(p * np.log2(p)).sum())
    return {
        "w": w,
        "h": h,
        "aspect": w / h,
        "mean_r": mean[0],
        "mean_g": mean[1],
        "mean_b": mean[2],
        "std_r": std[0],
        "std_g": std[1],
        "std_b": std[2],
        "entropy": entropy,
    }
