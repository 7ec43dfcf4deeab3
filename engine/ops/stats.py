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

import math

import numpy as np

_V = np.arange(256, dtype=np.int64)
_V2 = _V * _V


def image_stats(pixels: np.ndarray, gray: np.ndarray | None = None) -> dict:
    """Per-image descriptor dict (w/h/aspect, RGB means+stds, entropy).

    CONSUMED-ARGUMENT CONTRACT: when ``gray`` is passed (the float64
    BT.601 plane the caller already computed for the phash resize), it is
    MUTATED IN PLACE (rint+clip, out=gray) to avoid two more full-image
    float temps. Callers must pass a plane they are done with — e.g.
    FeaturizeActor calls ``area_resize_32(gray)`` BEFORE this function —
    or pass ``gray.copy()``. Pass gray=None to derive the plane here.
    """
    # Channel moments from 256-bin histograms: one O(n) bincount per
    # channel replaces the float64 full-image mean+std passes (2.5x
    # featurize-stage speedup measured at the 'large' bench profile).
    # Exactness: sum and sum-of-squares are exact int64 (<= 255^2 * n);
    # the variance (n*Q - S^2) / n^2 is computed in arbitrary-precision
    # Python ints, so mean is bit-identical to np.mean (integer-valued
    # float64 partial sums stay exact below 2^53) and std is the
    # correctly-rounded population std (ddof=0) — within 1 ulp of the
    # two-pass NumPy oracle (engine/oracle.py).
    h, w = pixels.shape[:2]
    n = h * w
    flat = pixels.reshape(-1, 3)
    mean = [0.0, 0.0, 0.0]
    std = [0.0, 0.0, 0.0]
    for c in range(3):
        hist = np.bincount(flat[:, c], minlength=256)
        s = int(np.dot(hist, _V))
        q = int(np.dot(hist, _V2))
        mean[c] = s / n
        std[c] = math.sqrt((n * q - s * s) / (n * n))
    if gray is None:
        gray = 0.299 * flat[:, 0] + 0.587 * flat[:, 1] + 0.114 * flat[:, 2]
    else:
        # caller hands over the float64 BT.601 plane it already computed
        # for the phash resize — IDENTICAL bits to the expression above
        # (same weights, same add order, same float64 promotion), so the
        # entropy is unchanged; gray is CONSUMED (rounded in place) to
        # avoid two more full-image float temps
        gray = gray.reshape(-1)
    np.rint(gray, out=gray)
    np.clip(gray, 0, 255, out=gray)
    luma = gray.astype(np.uint8)
    counts = np.bincount(luma, minlength=256)
    p = counts[counts > 0] / n
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
