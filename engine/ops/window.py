"""Partition-local window operators: lag/lead + rolling aggregates
(SURVEY.md §2.4 W1/W2; the reimagining of reference R3's
missing-descriptor imputation as timeline operations).

Pattern shared by every window op: hash-partition by entity
(__pkey = stable_hash(entity) % P, ONE shuffle), then a single
partition-local pass that sorts by (entity, ts, tie-break) and computes
all requested windows vectorized (pandas/numpy in C). Entities are never
split across partitions, so results are partition-count invariant
(property-tested vs P=1 in tests/test_partition_invariance.py).

Rolling time windows use cumsum + np.searchsorted with peers-inclusive
bounds [t - window, t] — exactly SQL's
`RANGE BETWEEN <w> PRECEDING AND CURRENT ROW` (all rows sharing the
current timestamp are in the window, regardless of sort position).
`lead` is future-looking and therefore flagged: leakage-safe pipelines
must not feed lead_* columns into as-of outputs (SURVEY.md §2.4 W1).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from engine.ops.keys import partition_ids

_PKEY = "__pkey"


def _partitioned(ds, entity: str, num_partitions: int | None):
    from engine.ops.partitioning import shuffle_partitions

    P = num_partitions or shuffle_partitions(ds)

    def add_pkey(t: pa.Table) -> pa.Table:
        return t.append_column(_PKEY, pa.array(partition_ids(t[entity], P), type=pa.int32()))

    return ds.map_batches(add_pkey, batch_format="pyarrow", zero_copy_batch=True).groupby(_PKEY)


def _sorted_group(df: pd.DataFrame, entity: str, ts: str, tie: str | None) -> pd.DataFrame:
    keys = [entity, ts] + ([tie] if tie else [])
    return df.sort_values(keys, kind="stable").drop(columns=[_PKEY])


def with_lag_lead(
    ds,
    entity: str,
    ts: str = "ts",
    cols: list[str] = ("value",),
    lags: list[int] = (1,),
    leads: list[int] = (),
    tie_break: str | None = None,
    num_partitions: int | None = None,
):
    """Adds lag{k}_{col} / lead{k}_{col} columns per entity ordered by
    (ts, tie_break). lead columns are FUTURE-LOOKING."""
    cols = list(cols)

    def fn(df: pd.DataFrame) -> pd.DataFrame:
        df = _sorted_group(df, entity, ts, tie_break)
        g = df.groupby(entity, sort=False)
        for c in cols:
            for k in lags:
                df[f"lag{k}_{c}"] = g[c].shift(k)
            for k in leads:
                df[f"lead{k}_{c}"] = g[c].shift(-k)
        return df

    return _partitioned(ds, entity, num_partitions).map_groups(fn, batch_format="pandas")


def rolling(
    ds,
    entity: str,
    ts: str = "ts",
    cols: list[str] = ("value",),
    window_us: int = 24 * 3600 * 1_000_000,
    aggs: list[str] = ("count", "sum", "mean"),
    tie_break: str | None = None,
    num_partitions: int | None = None,
):
    """Trailing time-window aggregates per entity: window = [t - w, t],
    peers-inclusive (SQL RANGE semantics). count/sum/mean are exact via
    cumsum+searchsorted; min/max use pandas' sliding window over the
    same bounds."""
    cols = list(cols)

    def fn(df: pd.DataFrame) -> pd.DataFrame:
        df = _sorted_group(df, entity, ts, tie_break)
        tsv = df[ts].to_numpy().astype("datetime64[us]").astype(np.int64)
        ent = df[entity].to_numpy()
        # entity block boundaries in the sorted frame
        change = np.empty(len(df), dtype=bool)
        if len(df):
            change[0] = True
            change[1:] = ent[1:] != ent[:-1]
        starts = np.flatnonzero(change)
        ends = np.append(starts[1:], len(df))
        out = {}
        for c in cols:
            v = df[c].to_numpy(dtype=np.float64)
            needs_minmax = any(a in ("min", "max") for a in aggs)
            cnt = np.empty(len(df)); sm = np.empty(len(df))
            mn = np.empty(len(df)); mx = np.empty(len(df))
            for s, e in zip(starts, ends):
                t = tsv[s:e]
                lo = np.searchsorted(t, t - window_us, side="left")
                hi = np.searchsorted(t, t, side="right")  # peers-inclusive
                cs = np.concatenate([[0.0], np.cumsum(v[s:e])])
                cnt[s:e] = hi - lo
                sm[s:e] = cs[hi] - cs[lo]
                if needs_minmax:
                    ser = pd.Series(v[s:e])
                    mn[s:e] = [ser.iloc[l:h].min() for l, h in zip(lo, hi)]
                    mx[s:e] = [ser.iloc[l:h].max() for l, h in zip(lo, hi)]
            if "count" in aggs:
                out[f"roll_count_{c}"] = cnt
            if "sum" in aggs:
                out[f"roll_sum_{c}"] = sm
            if "mean" in aggs:
                out[f"roll_mean_{c}"] = sm / np.where(cnt == 0, 1, cnt)
            if "min" in aggs:
                out[f"roll_min_{c}"] = mn
            if "max" in aggs:
                out[f"roll_max_{c}"] = mx
        for k, arr in out.items():
            df[k] = arr
        return df

    return _partitioned(ds, entity, num_partitions).map_groups(fn, batch_format="pandas")


def expanding(
    ds,
    entity: str,
    ts: str = "ts",
    cols: list[str] = ("value",),
    aggs: list[str] = ("count", "sum", "mean"),
    tie_break: str | None = None,
    num_partitions: int | None = None,
):
    """Cumulative (expanding) aggregates per entity ordered by
    (ts, tie_break) — SQL `ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT
    ROW`. Same one-shuffle partition-local pattern as rolling()."""
    cols = list(cols)

    def fn(df: pd.DataFrame) -> pd.DataFrame:
        df = _sorted_group(df, entity, ts, tie_break)
        g = df.groupby(entity, sort=False)
        for c in cols:
            if "count" in aggs:
                df[f"cum_count_{c}"] = g[c].cumcount() + 1
            if "sum" in aggs:
                df[f"cum_sum_{c}"] = g[c].cumsum()
            if "mean" in aggs:
                df[f"cum_mean_{c}"] = g[c].cumsum() / (g[c].cumcount() + 1)
            if "min" in aggs:
                df[f"cum_min_{c}"] = g[c].cummin()
            if "max" in aggs:
                df[f"cum_max_{c}"] = g[c].cummax()
        return df

    return _partitioned(ds, entity, num_partitions).map_groups(fn, batch_format="pandas")


def tumbling(
    ds,
    entity: str,
    ts: str = "ts",
    width_us: int = 24 * 3600 * 1_000_000,
    value: str = "value",
    num_partitions: int | None = None,
):
    """Fixed-width (tumbling) window aggregate per entity: rows bucketed
    by floor(ts / width), one output row per (entity, window_start) with
    count/sum/min/max — the batch analog of a streaming tumbling window.
    ONE shuffle on (entity); the bucket key is computed in the same
    partition-local pass (no second exchange on the bucket)."""

    def fn(df: pd.DataFrame) -> pd.DataFrame:
        tsv = df[ts].to_numpy().astype("datetime64[us]").astype(np.int64)
        win = (tsv // width_us) * width_us
        df = df.assign(window_start=win.astype("datetime64[us]"))
        out = (
            df.groupby([entity, "window_start"], sort=False)[value]
            .agg(n_events="count", sum_value="sum", min_value="min", max_value="max")
            .reset_index()
        )
        return out.drop(columns=[_PKEY], errors="ignore")

    return _partitioned(ds, entity, num_partitions).map_groups(fn, batch_format="pandas")
