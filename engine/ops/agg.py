"""Quantiles, deterministic sampling, and entity-set operations
(SURVEY.md §2.5 A6 / O3 / E2).

Quantiles: Ray's built-in ``ray.data.aggregate.Quantile`` accumulates
every value into a Python list on one reducer — O(group size) driver-side
memory, unusable for 100 TB groups. ``grouped_quantiles`` instead ships
each group once through ``groupby().map_groups`` and computes all
requested quantiles in one vectorized ``np.quantile`` call (linear
interpolation == DuckDB ``quantile_cont``, verified bit-exact). For
groups too large to hold (>~1e8 rows) the scale path is
``grouped_quantiles(..., sample_frac=f)`` which pre-thins each group with
the same deterministic hash sampler used by ``deterministic_sample`` —
error is O(1/sqrt(f·n)) and the thinning happens inside map_batches
BEFORE the shuffle, so the exchange also shrinks by f.

Sampling: ``random_sample`` is seed-dependent per execution plan, which
makes resumable / re-run pipelines non-reproducible. The engine's
canonical sampler is content-deterministic instead: keep a row iff the
first 32 bits of ``md5(str(key))`` fall below ``frac * 2^32``. Same rows
on every run, every partitioning, every cluster size — and expressible
in ANSI SQL for the oracle.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc


def _md5_u32(values) -> np.ndarray:
    """First 32 bits of md5(str(v)) per value, as uint64 (md5 is C per call)."""
    out = np.empty(len(values), dtype=np.uint64)
    for i, v in enumerate(values):
        s = v if isinstance(v, str) else str(v)
        out[i] = int(hashlib.md5(s.encode("utf-8")).hexdigest()[:8], 16)
    return out


def deterministic_sample(ds, key: str, frac: float):
    """Content-deterministic row sample: md5(str(key))[:32 bits] < frac·2³².

    SQL oracle: ``WHERE CAST(('0x' || substr(md5(CAST(key AS VARCHAR)),1,8))
    AS UBIGINT) < CAST(frac * 4294967296 AS UBIGINT)``.
    """
    threshold = np.uint64(int(frac * 4294967296))

    def flt(t: pa.Table) -> pa.Table:
        mask = _md5_u32(t[key].to_pylist()) < threshold
        return t.filter(pa.array(mask))

    return ds.map_batches(flt, batch_format="pyarrow", zero_copy_batch=True)


def stratified_sample(ds, group: str, key: str, fracs: dict, default_frac: float = 0.0):
    """Per-group deterministic sampling (class rebalancing for training
    sets): keep a row iff md5(str(key)) < frac(group value)·2³². Same
    reproducibility properties as deterministic_sample; groups absent
    from ``fracs`` keep ``default_frac`` of their rows."""
    thresholds = {g: np.uint64(int(f * 4294967296)) for g, f in fracs.items()}
    default_t = np.uint64(int(default_frac * 4294967296))

    def flt(t: pa.Table) -> pa.Table:
        h = _md5_u32(t[key].to_pylist())
        gv = t[group].to_pylist()
        cut = np.array([thresholds.get(g, default_t) for g in gv], dtype=np.uint64)
        return t.filter(pa.array(h < cut))

    return ds.map_batches(flt, batch_format="pyarrow", zero_copy_batch=True)


def grouped_quantiles(ds, key, col: str, qs: tuple[float, ...] = (0.5,),
                      sample_frac: float | None = None, round_digits: int | None = None):
    """Exact per-group quantiles (linear interpolation, == quantile_cont).

    One shuffle (the groupby); each group computed in a single vectorized
    np.quantile call. ``sample_frac`` switches to the deterministic-sample
    approximation for groups that cannot be materialized whole.
    """
    keys = [key] if isinstance(key, str) else list(key)
    if sample_frac is not None:
        ds = deterministic_sample(ds, col, sample_frac)

    def grp(df: pd.DataFrame) -> pd.DataFrame:
        v = df[col].to_numpy(dtype=np.float64)
        v = v[~np.isnan(v)]
        row = {k: [df[k].iloc[0]] for k in keys}
        for q in qs:
            val = float(np.quantile(v, q)) if len(v) else np.nan
            if round_digits is not None:
                m = 10.0 ** round_digits
                val = np.trunc(abs(val) * m + 0.5) / m * (1 if val >= 0 else -1)
            row[f"p{int(q * 100):02d}_{col}"] = [val]
        return pd.DataFrame(row)

    return ds.groupby(keys).map_groups(grp, batch_format="pandas")


def grouped_topk(ds, key, order_col: str, k: int, descending: bool = True,
                 tie_break: str | None = None):
    """Top-k rows per group by ``order_col`` (SQL ROW_NUMBER() <= k).

    Two-level: each batch keeps its local per-group top-k inside
    map_batches (shrinks the exchange to <= k rows per group per block),
    then one groupby finishes the selection — the grouped analog of
    sort().limit()."""
    keys = [key] if isinstance(key, str) else list(key)
    sort_cols = [order_col] + ([tie_break] if tie_break else [])
    asc = [not descending] + ([True] if tie_break else [])

    def local(df: pd.DataFrame) -> pd.DataFrame:
        return (df.sort_values(sort_cols, ascending=asc, kind="stable")
                .groupby(keys, sort=False).head(k))

    pre = ds.map_batches(local, batch_format="pandas")

    def final(df: pd.DataFrame) -> pd.DataFrame:
        return (df.sort_values(sort_cols, ascending=asc, kind="stable").head(k))

    return pre.groupby(keys).map_groups(final, batch_format="pandas")


def pivot(ds, index: str, column: str, value: str, categories: list,
          agg: str = "sum", prefix: str | None = None):
    """Wide conditional aggregate: one row per ``index`` value, one output
    column per category of ``column`` holding agg(value) over matching
    rows. Categories must be supplied (bounded, known set — at scale an
    unbounded pivot is a schema explosion, so the engine refuses to infer
    them). Per-batch partial pivot shrinks the exchange to
    O(|index| x |categories|) before one small groupby-sum; "mean" is
    computed as sum/count after the final combine (exact)."""
    from ray.data.aggregate import Sum

    if agg not in ("sum", "count", "mean"):
        raise ValueError(f"unsupported pivot agg: {agg}")
    pre = prefix if prefix is not None else f"{agg}_{value}_"
    cats = list(categories)

    def partial(t: pa.Table) -> pa.Table:
        idx = t[index].to_numpy(zero_copy_only=False)
        cat = np.asarray(t[column].to_pylist())
        v = t[value].to_numpy(zero_copy_only=False).astype(np.float64)
        uniq, inv = np.unique(idx, return_inverse=True)
        cols = {index: pa.array(uniq)}
        for c in cats:
            m = cat == c
            s = np.zeros(len(uniq))
            n = np.zeros(len(uniq))
            np.add.at(s, inv[m], v[m])
            np.add.at(n, inv[m], 1.0)
            cols[f"__s_{c}"] = pa.array(s)
            cols[f"__n_{c}"] = pa.array(n)
        return pa.table(cols)

    aggs = []
    for c in cats:
        aggs.append(Sum(f"__s_{c}", alias_name=f"__s_{c}"))
        aggs.append(Sum(f"__n_{c}", alias_name=f"__n_{c}"))
    combined = (
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(index)
        .aggregate(*aggs)
        .to_pandas()
    )
    out = pd.DataFrame({index: combined[index]})
    for c in cats:
        s, n = combined[f"__s_{c}"], combined[f"__n_{c}"]
        if agg == "sum":
            out[f"{pre}{c}"] = s
        elif agg == "count":
            out[f"{pre}{c}"] = n.astype("int64")
        else:
            out[f"{pre}{c}"] = s / n.where(n > 0)
    return out


def distinct_keys(ds, on: str):
    """DISTINCT on one column: per-batch local dedup (shrinks the
    exchange), then groupby-aggregate (whose reduce emits schema-stable
    blocks — unlike sort+map_groups, which can pass through schema-less
    empty blocks that break downstream joins)."""
    from ray.data.aggregate import Count

    def local(t: pa.Table) -> pa.Table:
        return pa.table({on: pc.unique(t[on].combine_chunks())})

    pre = ds.select_columns([on]).map_batches(local, batch_format="pyarrow",
                                              zero_copy_batch=True)
    return pre.groupby(on).aggregate(Count(alias_name="__n")).drop_columns(["__n"])


def collect_list(ds, key, col: str, order_by: str | None = None, out: str | None = None):
    """Inverse of engine.ops.explode: per group, gather ``col`` into one
    list (ordered by ``order_by`` when given). One groupby shuffle; the
    per-group gather is a vectorized argsort + single ListArray build."""
    keys = [key] if isinstance(key, str) else list(key)
    out = out or f"{col}_list"

    def grp(t: pa.Table) -> pa.Table:
        import numpy as np

        if t.num_rows == 0:
            return t
        v = t[col]
        if order_by is not None:
            order = np.argsort(t[order_by].to_numpy(zero_copy_only=False), kind="stable")
            t = t.take(pa.array(order))
            v = t[col]
        row = {k: [t[k][0].as_py()] for k in keys}
        vals = v.combine_chunks() if isinstance(v, pa.ChunkedArray) else v
        row[out] = pa.ListArray.from_arrays(pa.array([0, len(vals)], type=pa.int32()), vals)
        cols = {k: pa.array(row[k]) for k in keys}
        cols[out] = row[out]
        return pa.table(cols)

    return ds.groupby(keys).map_groups(grp, batch_format="pyarrow")


def intersect_keys(left, right, on: str, right_on: str | None = None,
                   num_partitions: int | None = None):
    """Distinct keys present on BOTH sides (SQL INTERSECT on one column)."""
    from engine.ops.join import semi_join

    r = right.select_columns([right_on or on])
    return semi_join(distinct_keys(left, on), r, on=on, right_on=right_on,
                     num_partitions=num_partitions)


def except_keys(left, right, on: str, right_on: str | None = None,
                num_partitions: int | None = None):
    """Distinct left keys absent from right (SQL EXCEPT on one column)."""
    from engine.ops.join import anti_join

    r = right.select_columns([right_on or on])
    return anti_join(distinct_keys(left, on), r, on=on, right_on=right_on,
                     num_partitions=num_partitions)
