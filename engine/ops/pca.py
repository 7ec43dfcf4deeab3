"""Distributed PCA over an embedding column.

ONE streaming pass computes per-block moment partials — n, sum(x),
sum(x xT) as a single flattened row per block — which the driver
combines in O(blocks x d^2) (the engine/ops/normalize.py A3 block-
partial shape; d^2 = 4096 doubles per block at d=64) and
eigendecomposes the d x d covariance once. Nothing row-count-sized
reaches the driver, and unlike iterative solvers the whole fit is a
single read-through. Transform is one broadcast map pass.

Eigenvector sign is fixed deterministically (largest-|entry| coordinate
made positive) so results are reproducible across runs/partitionings;
parity vs a sequential NumPy PCA is pytest-checked
(tests/test_pca.py)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from engine.ops.neardup import _emb_matrix


def _fix_signs(components: np.ndarray) -> np.ndarray:
    flip = np.sign(components[np.arange(len(components)),
                              np.abs(components).argmax(axis=1)])
    flip[flip == 0] = 1.0
    return components * flip[:, None]


def pca_fit(ds, k: int = 8, emb_col: str = "embedding"):
    """-> (components (k, d) row-major, mean (d,), explained_var (k,)).
    Exact covariance PCA (ddof=1), top-k by eigenvalue."""

    def partial(t: pa.Table) -> pa.Table:
        m = _emb_matrix(t, emb_col).astype(np.float64)
        sxx = m.T @ m
        return pa.table({
            "n": pa.array([m.shape[0]], type=pa.int64()),
            "sx": pa.array([m.sum(axis=0)], type=pa.list_(pa.float64())),
            "sxx": pa.array([sxx.reshape(-1)], type=pa.list_(pa.float64())),
        })

    parts = ds.select_columns([emb_col]).map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True).take_all()
    n = sum(p["n"] for p in parts)
    if n < 2:
        raise ValueError(f"pca_fit needs >= 2 rows, got {n}")
    sx = np.sum([np.asarray(p["sx"]) for p in parts], axis=0)
    d = sx.size
    sxx = np.sum([np.asarray(p["sxx"]).reshape(d, d) for p in parts], axis=0)
    mean = sx / n
    cov = (sxx - n * np.outer(mean, mean)) / (n - 1)
    evals, evecs = np.linalg.eigh(cov)  # ascending
    order = np.argsort(evals)[::-1][:k]
    comps = _fix_signs(evecs[:, order].T)
    return comps, mean, np.maximum(evals[order], 0.0)


def pca_transform(ds, components: np.ndarray, mean: np.ndarray,
                  emb_col: str = "embedding", out_col: str = "pca",
                  round_digits: int | None = 6):
    """Project every row onto the fitted components — one broadcast map
    pass appending a list<double> column of length k."""
    import ray

    ref = ray.put((np.asarray(components, dtype=np.float64),
                   np.asarray(mean, dtype=np.float64)))

    def tx(t: pa.Table) -> pa.Table:
        c, mu = ray.get(ref)
        m = _emb_matrix(t, emb_col).astype(np.float64)
        proj = (m - mu) @ c.T
        if round_digits is not None:
            proj = np.round(proj, round_digits)
        lists = pa.FixedSizeListArray.from_arrays(
            pa.array(proj.reshape(-1)), proj.shape[1])
        return t.append_column(out_col, lists)

    return ds.map_batches(tx, batch_format="pyarrow", zero_copy_batch=True)
