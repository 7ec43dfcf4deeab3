"""Global feature normalization + degenerate-feature pruning
(SURVEY.md §2.5 A3/A4; reference R4/R5 semantics recast).

Per-dimension mean/std over the full feature_vec dataset, computed as
PARTIAL sums per batch (one tiny row per block: count + sum[dim] +
sumsq[dim]) combined on the driver — the dataset streams through once and
only O(blocks x dim) floats ever reach the driver. The resulting stats
are broadcast into a z-scoring map stage; dimensions with
std <= eps are DEGENERATE (near-constant, reference R5) and dropped from
the normalized vector.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from engine.config import DEFAULT


def fv_moments(ds, col: str = "fv") -> tuple[np.ndarray, np.ndarray, int]:
    """-> (mean[dim], std[dim], count). One streaming pass, no shuffle."""

    def partial(t: pa.Table) -> pa.Table:
        arr = t[col]
        if isinstance(arr, pa.ChunkedArray):
            arr = arr.combine_chunks()
        dim = arr.type.list_size
        mat = arr.flatten().to_numpy(zero_copy_only=False).reshape(-1, dim)
        return pa.table({
            "n": pa.array([len(mat)], type=pa.int64()),
            "s": pa.array([mat.sum(axis=0)], type=pa.list_(pa.float64(), dim)),
            "ss": pa.array([(mat * mat).sum(axis=0)], type=pa.list_(pa.float64(), dim)),
        })

    parts = ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True).take_all()
    n = sum(p["n"] for p in parts)
    s = np.sum([np.asarray(p["s"]) for p in parts], axis=0)
    ss = np.sum([np.asarray(p["ss"]) for p in parts], axis=0)
    mean = s / n
    var = np.maximum(ss / n - mean**2, 0.0)
    return mean, np.sqrt(var), int(n)


def normalize_fv(ds, col: str = "fv", eps: float | None = None, stats=None):
    """-> (Dataset with z-scored fv (degenerate dims dropped), kept_idx).

    Degenerate dims (std <= eps) are pruned; the kept-index list is the
    contract for downstream consumers (SURVEY A4)."""
    eps = eps if eps is not None else DEFAULT.degenerate_std_eps
    mean, std, _ = stats if stats is not None else fv_moments(ds, col)
    kept = np.flatnonzero(std > eps)
    import ray

    ref = ray.put((mean[kept], std[kept], kept))

    def zmap(t: pa.Table) -> pa.Table:
        m, sd, k = ray.get(ref)
        arr = t[col]
        if isinstance(arr, pa.ChunkedArray):
            arr = arr.combine_chunks()
        dim = arr.type.list_size
        mat = arr.flatten().to_numpy(zero_copy_only=False).reshape(-1, dim)[:, k]
        z = (mat - m) / sd
        out = t.drop([col])
        return out.append_column(
            col, pa.FixedSizeListArray.from_arrays(pa.array(z.reshape(-1), type=pa.float64()), len(k))
        )

    return ds.map_batches(zmap, batch_format="pyarrow", zero_copy_batch=True), kept


def impute_mean(ds, cols: list[str], round_digits: int | None = None):
    """Missing-value imputation: fill NULLs in `cols` with each column's
    GLOBAL mean of the non-null values (reference R3 semantics — the
    column-mean imputation path — recast Ray-Data-first).

    Shape: one tree aggregate (Mean per column, no shuffle — nulls are
    ignored by Ray's Mean exactly as by SQL AVG) -> scalars broadcast in
    the map closure -> one `pc.fill_null` kernel per column per batch.
    The data streams through once; nothing row-scaled reaches the
    driver. `round_digits` rounds the FILLED values only (DuckDB ROUND
    half-away semantics) so a distributed mean compares value-exactly
    against a SQL AVG twin."""
    import pyarrow.compute as pc
    from ray.data.aggregate import Mean

    stats = ds.aggregate(*[Mean(c, alias_name=f"m_{c}") for c in cols])
    fills = {c: float(stats[f"m_{c}"]) for c in cols}
    if round_digits is not None:
        m = 10.0 ** round_digits
        fills = {c: np.trunc(abs(v) * m + 0.5) / m * (1 if v >= 0 else -1)
                 for c, v in fills.items()}

    def fill(t: pa.Table) -> pa.Table:
        for c, v in fills.items():
            col = t[c]
            t = t.set_column(t.schema.get_field_index(c), c,
                             pc.fill_null(col, pa.scalar(v, col.type)))
        return t

    return ds.map_batches(fill, batch_format="pyarrow", zero_copy_batch=True)
