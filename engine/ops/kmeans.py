"""Distributed k-means (Lloyd) over an embedding column.

Each Lloyd iteration is ONE streaming map_batches pass: every batch
assigns its vectors to the broadcast centroids (numpy matmul) and emits
a single PARTIAL row — the k x d per-cluster vector sums (flattened)
plus per-cluster counts and the batch SSE. The driver combines the
O(blocks x k x d) partials (the same documented driver shape as
engine/ops/normalize.py A3 block partials) and recomputes centroids;
nothing row-count-sized ever reaches the driver. Init is k-means++ over
a content-deterministic capped sample (splitmix64(id) draw —
plan-independent; absolute row cap like engine/ops/ann.py build_ivf).

Scale notes (100 TB): per-iteration cost is one pass over the
materialized (emb) projection — materialized ONCE up front so the 8
iterations do not re-run the upstream read/decode plan 8 times; the
object store spills it. Partials are blocks x (k*d + k + 1) float64 —
block-count-proportional, not row-count-proportional. If k*d is large,
raise the target block size (fewer partials) before reaching for a
tree reduce.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from engine.ops.neardup import _emb_matrix


def _kmeans_pp_init(m: np.ndarray, k: int, seed: int) -> np.ndarray:
    """k-means++ seeding (Arthur & Vassilvitskii 2007) on the driver-side
    sample — deterministic under `seed`."""
    rng = np.random.default_rng(seed)
    n = len(m)
    k = min(k, n)
    first = int(rng.integers(n))
    cents = [m[first]]
    d2 = ((m - m[first]) ** 2).sum(axis=1)
    for _ in range(1, k):
        total = d2.sum()
        if total <= 0:  # all remaining points coincide with a centroid
            cents.append(m[int(rng.integers(n))])
            continue
        idx = int(rng.choice(n, p=d2 / total))
        cents.append(m[idx])
        d2 = np.minimum(d2, ((m - m[idx]) ** 2).sum(axis=1))
    return np.stack(cents)


def _unit(m: np.ndarray) -> np.ndarray:
    return m / np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-12)


def _assign(m: np.ndarray, cents: np.ndarray) -> np.ndarray:
    """argmin_c ||x - c||^2 = argmin_c (c.c - 2 x.c) — one matmul, no
    n x k distance materialization beyond the score matrix itself."""
    scores = m @ cents.T
    cc = (cents * cents).sum(axis=1)
    return np.argmin(cc[None, :] - 2.0 * scores, axis=1)


def kmeans_fit(ds, k: int = 16, emb_col: str = "embedding", id_col: str = "vec_id",
               iters: int = 8, tol: float = 1e-6, seed: int = 42,
               sample_frac: float = 0.2, max_sample_rows: int = 65_536,
               spherical: bool = False) -> np.ndarray:
    """Fit k centroids with distributed Lloyd iterations -> (k, d) ndarray.
    Deterministic for a given (data, k, iters, seed) regardless of
    partitioning up to float-combine order (partials are combined in
    block order; parity vs sequential NumPy is pytest-checked on
    separated data). ``spherical=True`` runs spherical k-means (unit
    vectors, cosine assignment — on unit vectors argmax cosine ==
    argmin Euclidean so the same kernel applies; centroids re-normalized
    each round) — the standard IVF trainer."""
    import ray

    from engine.ops.agg import deterministic_sample

    cols = ds.select_columns([id_col, emb_col])
    n_rows = cols.count()
    frac = min(sample_frac, max_sample_rows / max(1, n_rows))
    samp = deterministic_sample(cols, id_col, frac, hash_fn="splitmix64") \
        .to_pandas().sort_values(id_col)
    if len(samp) < max(k, 2):
        samp = cols.limit(max_sample_rows).to_pandas().sort_values(id_col)
    sm = np.stack(samp[emb_col].to_numpy()).astype(np.float64)
    if spherical:
        sm = _unit(sm)
    cents = _kmeans_pp_init(sm, k, seed)
    k = len(cents)  # may clamp to sample size
    d = cents.shape[1]

    emb_only = ds.select_columns([emb_col]).materialize()

    for _ in range(iters):
        ref = ray.put(cents)

        def partial(t: pa.Table) -> pa.Table:
            c = ray.get(ref)
            m = _emb_matrix(t, emb_col).astype(np.float64)
            if spherical:
                m = _unit(m)
            a = _assign(m, c)
            sums = np.zeros((k, d))
            np.add.at(sums, a, m)
            counts = np.bincount(a, minlength=k).astype(np.int64)
            return pa.table({
                "sums": pa.array([sums.reshape(-1)], type=pa.list_(pa.float64())),
                "counts": pa.array([counts], type=pa.list_(pa.int64())),
            })

        parts = emb_only.map_batches(partial, batch_format="pyarrow",
                                     zero_copy_batch=True).take_all()
        sums = np.zeros((k, d))
        counts = np.zeros(k, dtype=np.int64)
        for p in parts:
            sums += np.asarray(p["sums"]).reshape(k, d)
            counts += np.asarray(p["counts"])
        nonempty = counts > 0
        new = cents.copy()  # empty clusters keep their previous centroid
        new[nonempty] = sums[nonempty] / counts[nonempty, None]
        if spherical:
            new[nonempty] = _unit(new[nonempty])
        shift = float(np.abs(new - cents).max())
        cents = new
        if shift < tol:
            break
    return cents


def kmeans_assign(ds, centroids: np.ndarray, emb_col: str = "embedding",
                  out_col: str = "cluster", dist_col: str | None = None,
                  spherical: bool = False):
    """Append the nearest-centroid id (and optionally the squared
    Euclidean distance) to every row — one broadcast map pass."""
    import ray

    ref = ray.put(np.asarray(centroids, dtype=np.float64))

    def tag(t: pa.Table) -> pa.Table:
        c = ray.get(ref)
        m = _emb_matrix(t, emb_col).astype(np.float64)
        if spherical:
            m = _unit(m)
        a = _assign(m, c)
        t = t.append_column(out_col, pa.array(a.astype(np.int32)))
        if dist_col:
            dd = ((m - c[a]) ** 2).sum(axis=1)
            t = t.append_column(dist_col, pa.array(np.round(dd, 6)))
        return t

    return ds.map_batches(tag, batch_format="pyarrow", zero_copy_batch=True)
