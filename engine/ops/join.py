"""Equi / semi / anti / broadcast joins (SURVEY.md §2.4 J3–J5).

Large x large -> `Dataset.join` (Ray 2.49 hash-partitioned shuffle join).
Large x small -> broadcast: the small side is materialized ONCE into the
object store (`ray.put`) and every map task reads it zero-copy — no
shuffle, no per-batch reshipping (SURVEY.md guidance: broadcast small
sides instead of shuffle joins).
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa

from engine.config import DEFAULT


def _join_partitions(left, right) -> int:
    """Aggregator-actor-constrained partition count; see
    engine/ops/partitioning.py for the sizing rationale (and why
    ds.size_bytes() must NOT be used here — it executes the plan)."""
    from engine.ops.partitioning import join_partitions

    return min(join_partitions(left, right), DEFAULT.num_partitions)


def equi_join(left, right, on, join_type: str = "inner", num_partitions: int | None = None,
              right_on=None, left_suffix: str = "", right_suffix: str = "_r"):
    on = (on,) if isinstance(on, str) else tuple(on)
    right_on = (right_on,) if isinstance(right_on, str) else (tuple(right_on) if right_on else None)
    return left.join(
        right,
        join_type=join_type,
        num_partitions=num_partitions or _join_partitions(left, right),
        on=on,
        right_on=right_on,
        left_suffix=left_suffix or None,
        right_suffix=right_suffix,
    )


def semi_join(left, right, on, right_on=None, num_partitions: int | None = None):
    return equi_join(left, right, on, join_type="left_semi", right_on=right_on,
                     num_partitions=num_partitions)


def anti_join(left, right, on, right_on=None, num_partitions: int | None = None):
    return equi_join(left, right, on, join_type="left_anti", right_on=right_on,
                     num_partitions=num_partitions)


def broadcast_lookup(ds, small, on: str, cols: list[str] | None = None, how: str = "left",
                     right_on: str | None = None):
    """Attach columns from a SMALL table to every row of `ds` without a
    shuffle. `small`: pandas.DataFrame | pyarrow.Table | Dataset (will be
    fully materialized — caller asserts it is small, e.g. a dimension
    table). `ray.put` once; tasks read the shared copy zero-copy."""
    import ray

    if hasattr(small, "to_pandas") and not isinstance(small, (pd.DataFrame, pa.Table)):
        small = small.to_pandas()  # Dataset -> DataFrame (small side only)
    if isinstance(small, pa.Table):
        small = small.to_pandas()
    right_on = right_on or on
    if cols:
        small = small[[right_on] + [c for c in cols if c != right_on]]
    ref = ray.put(small)

    def lookup(df: pd.DataFrame) -> pd.DataFrame:
        sm = ray.get(ref)
        return df.merge(sm, how=how, left_on=on, right_on=right_on)

    return ds.map_batches(lookup, batch_format="pandas")


def broadcast_semi_filter(ds, keys, on: str, negate: bool = False):
    """Semi/anti filtering against a broadcast key set (SURVEY.md J5
    small-side path): keys may be a set/list/ndarray/Dataset of one col."""
    import numpy as np
    import ray

    if hasattr(keys, "to_pandas"):
        keys = keys.to_pandas().iloc[:, 0].to_numpy()
    keyset = set(np.asarray(list(keys)).tolist())
    ref = ray.put(keyset)

    def flt(df: pd.DataFrame) -> pd.DataFrame:
        ks = ray.get(ref)
        mask = df[on].isin(ks)
        return df[~mask] if negate else df[mask]

    return ds.map_batches(flt, batch_format="pandas")
