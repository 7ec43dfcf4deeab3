"""Sequential NumPy/pandas oracle (SURVEY.md §5.2.1).

With `/root/reference/` empty (SURVEY.md §0), this module is the
executable embodiment of "the reference's feature vectors": a
straight-line, single-process re-implementation of the featurize +
window semantics that the Ray pipelines are compared against with
np.allclose / exact equality. It deliberately avoids the engine's
batched code paths (no einsum batching, no Arrow kernels) so a bug in
the vectorized path cannot cancel itself out in the comparison.
"""

from __future__ import annotations

import zlib

import numpy as np
import pandas as pd
import pyarrow as pa

from engine.fixtures import codecs
from engine.ops.phash import area_resize_32, dct_matrix, gray_bt601, phash_bucket


def oracle_phash(pixels: np.ndarray) -> int:
    g = area_resize_32(gray_bt601(pixels))
    d = dct_matrix(32)
    f = d @ g @ d.T
    block = f[:8, :8].reshape(64)
    med = np.median(block[1:])
    bits = block > med
    v = 0
    for b in bits:
        v = (v << 1) | int(b)
    return v - (1 << 64) if v >= (1 << 63) else v


def oracle_caption(caption: str, dim: int = 64):
    toks = caption.split()
    vec = np.zeros(dim, dtype=np.float64)
    for t in toks:
        vec[zlib.crc32(t.encode("utf-8")) % dim] += 1.0
    nrm = np.linalg.norm(vec)
    if nrm > 0:
        vec /= nrm
    return len(toks), len(caption), vec.astype(np.float32)


def oracle_stats(pixels: np.ndarray) -> dict:
    f = pixels.astype(np.float64)
    h, w = pixels.shape[:2]
    out = {"w": w, "h": h, "aspect": w / h}
    for i, c in enumerate("rgb"):
        out[f"mean_{c}"] = float(f[..., i].mean())
        out[f"std_{c}"] = float(f[..., i].std())
    luma = np.clip(np.round(0.299 * f[..., 0] + 0.587 * f[..., 1] + 0.114 * f[..., 2]), 0, 255).astype(int)
    counts = np.bincount(luma.reshape(-1), minlength=256)
    p = counts[counts > 0] / luma.size
    out["entropy"] = float(-(p * np.log2(p)).sum())
    return out


def oracle_featurize(images: pa.Table, prefix_bits: int = 16, dim: int = 64) -> pd.DataFrame:
    rows = []
    for r in images.to_pylist():
        px = codecs.decode(r["bytes"], r["fmt"], r["w"], r["h"])
        ph = oracle_phash(px)
        rec = {"image_id": r["image_id"], "phash": ph,
               "phash_bucket": int(phash_bucket(np.array([ph]), prefix_bits)[0])}
        rec.update(oracle_stats(px))
        n_tok, n_ch, vec = oracle_caption(r["caption"], dim)
        rec.update({"n_tokens": n_tok, "n_chars": n_ch, "tok_hash": vec, "caption": r["caption"]})
        rows.append(rec)
    return pd.DataFrame(rows)


def oracle_feature_vec(feat: pd.DataFrame) -> np.ndarray:
    from engine.ops import schema as S

    mats = []
    for _, r in feat.iterrows():
        scal = [float(r[name]) for name in S.FV_SCALARS]
        mats.append(np.array(scal + list(np.asarray(r["tok_hash"], dtype=np.float64))))
    return np.stack(mats) if mats else np.empty((0, 76))


# ------------------------------------------------------------- windows --

def oracle_asof(left: pd.DataFrame, right: pd.DataFrame, on: str, ts: str = "ts",
                strict: bool = False, tolerance=None, value_cols=None) -> pd.DataFrame:
    """Row-at-a-time as-of join: for each left row, the right row for the
    same entity with the greatest ts <= (or < if strict) left ts, within
    tolerance. O(n*m) scan — oracle only."""
    value_cols = value_cols or [c for c in right.columns if c not in (on, ts)]
    out = left.copy().reset_index(drop=True)
    for c in value_cols:
        out[c + "_r"] = None
    out[ts + "_r"] = pd.NaT
    rg = {k: g.sort_values(ts, kind="stable") for k, g in right.groupby(on)}
    for i, lrow in out.iterrows():
        g = rg.get(lrow[on])
        if g is None:
            continue
        mask = (g[ts] < lrow[ts]) if strict else (g[ts] <= lrow[ts])
        if tolerance is not None:
            mask &= (lrow[ts] - g[ts]) <= tolerance
        cand = g[mask]
        if len(cand):
            best = cand.iloc[-1]
            for c in value_cols:
                out.at[i, c + "_r"] = best[c]
            out.at[i, ts + "_r"] = best[ts]
    return out
