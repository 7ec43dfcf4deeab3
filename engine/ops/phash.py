"""Perceptual hash (SURVEY.md §2.3 M2/M3) — the frozen algorithm spec.

Spec (FIXTURES.md A1, owned by this repo since the reference tree is
empty, SURVEY.md §0): grayscale (BT.601 luma) -> 32x32 area-mean resize
(integer box bins) -> orthonormal DCT-II via a precomputed 32x32 basis
matrix (scipy absent in sandbox) -> top-left 8x8 block -> threshold every
coefficient against the median of the 63 non-DC coefficients -> 64 bits,
MSB = coefficient (0,0), row-major -> int64 (two's complement).

Both the fixture generator and the engine's featurize stage call these
functions, so `decode(bytes) -> phash` must reproduce the stored `phash`
column exactly (exactness oracle, SURVEY.md §5.2).
"""

from __future__ import annotations

import numpy as np

PREFIX_BITS_DEFAULT = 16

# Plain-dict memo, NOT functools.lru_cache: lru_cache wrappers carry a
# __reduce__ that pickles by qualified name, which defeats the
# pickle-by-value registration __ray_entry__ relies on so the driver can
# run this engine from any cwd (workers would raise ModuleNotFoundError).
_DCT_CACHE: dict[int, np.ndarray] = {}


def dct_matrix(n: int = 32) -> np.ndarray:
    """Orthonormal DCT-II basis: D[k,m] = c(k) cos(pi (2m+1) k / 2n)."""
    d = _DCT_CACHE.get(n)
    if d is None:
        k = np.arange(n)[:, None].astype(np.float64)
        m = np.arange(n)[None, :].astype(np.float64)
        d = np.cos(np.pi * (2 * m + 1) * k / (2 * n))
        d[0] *= np.sqrt(1.0 / n)
        d[1:] *= np.sqrt(2.0 / n)
        _DCT_CACHE[n] = d
    return d


def _box_edges(size: int, n: int = 32) -> tuple[np.ndarray, np.ndarray]:
    starts = (np.arange(n) * size) // n
    ends = (np.arange(1, n + 1) * size) // n
    return starts, np.maximum(ends, starts + 1)


def area_resize_32(gray: np.ndarray, n: int = 32) -> np.ndarray:
    """Deterministic integer box-mean resize to n x n (up or down)."""
    h, w = gray.shape
    rs, re = _box_edges(h, n)
    cs, ce = _box_edges(w, n)
    # reduceat over [starts] sums [s_i, s_{i+1}); with this edge formula
    # e_i == s_{i+1} when downsampling, and repeated starts (upsampling)
    # yield the single row a[s_i] per numpy reduceat semantics.
    rows = np.add.reduceat(gray, rs, axis=0) / (re - rs)[:, None]
    out = np.add.reduceat(rows, cs, axis=1) / (ce - cs)[None, :]
    return out


def gray_bt601(rgb: np.ndarray) -> np.ndarray:
    # elementwise uint8 -> float64 promotion: same bits as the old
    # rgb.astype(float64) path but WITHOUT materializing a 3-channel
    # float64 copy of the image first (the featurize stage is memory-
    # bandwidth-bound in situ: 32 workers share one bus)
    return 0.299 * rgb[..., 0] + 0.587 * rgb[..., 1] + 0.114 * rgb[..., 2]


def phash_pixels(rgb: np.ndarray) -> int:
    """Single-image phash -> python int in int64 two's-complement range."""
    return int(phash_batch([rgb])[0])


def resize_gray_32(rgb: np.ndarray) -> np.ndarray:
    return area_resize_32(gray_bt601(rgb))


def phash_batch(images: list) -> np.ndarray:
    """Batched phash: per-image resize (sizes vary), then one batched DCT
    (einsum over the stacked 32x32 planes) — keeps the hot loop in BLAS."""
    if not images:
        return np.empty(0, dtype=np.int64)
    g = np.stack([resize_gray_32(img) for img in images])  # (B,32,32)
    d = dct_matrix(32)
    f = np.einsum("ij,bjk,lk->bil", d, g, d, optimize=True)  # D @ G @ D.T
    block = f[:, :8, :8].reshape(len(images), 64)
    med = np.median(block[:, 1:], axis=1)
    bits = block > med[:, None]  # (B,64) bool, MSB-first row-major
    packed = np.packbits(bits, axis=1)  # big-endian bit order per byte
    u = packed.copy().view(">u8").reshape(-1).astype(np.uint64)
    return u.view(np.int64) if u.dtype == np.uint64 else u.astype(np.int64)


def phash_bucket(phash: np.ndarray, prefix_bits: int = PREFIX_BITS_DEFAULT) -> np.ndarray:
    """Hamming-prefix cluster key: top `prefix_bits` of the hash as int32
    (SURVEY.md §2.3 M3 / §2.6 C1 — the density-bucket analog of the
    reference's DBSCAN eps-ball)."""
    u = np.asarray(phash, dtype=np.int64).view(np.uint64)
    return (u >> np.uint64(64 - prefix_bits)).astype(np.int32)


def hamming(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Pairwise Hamming distance matrix between two int64 phash arrays."""
    x = np.asarray(a, np.int64).view(np.uint64)[:, None] ^ np.asarray(b, np.int64).view(np.uint64)[None, :]
    # vectorized popcount via byte-view + lookup table
    lut = np.array([bin(i).count("1") for i in range(256)], dtype=np.uint8)
    return lut[x.view(np.uint8).reshape(*x.shape, 8)].sum(axis=-1).astype(np.int32)
