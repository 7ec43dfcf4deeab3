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
import pyarrow.compute as pc

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
    table). The small side is key-sorted ONCE driver-side and `ray.put`;
    each batch then only binary-searches it — Arrow in/out (no pandas
    round-trip for wide payload columns), one-to-many keys expand via
    repeat arithmetic. how: "left" (unmatched rows keep nulls) | "inner".
    """
    import numpy as np
    import ray

    if hasattr(small, "to_pandas") and not isinstance(small, (pd.DataFrame, pa.Table)):
        small = pa.Table.from_pandas(small.to_pandas(), preserve_index=False)
    elif isinstance(small, pd.DataFrame):
        small = pa.Table.from_pandas(small, preserve_index=False)
    if how not in ("left", "inner"):
        raise ValueError(f"broadcast_lookup supports left/inner, got {how}")
    right_on = right_on or on
    if cols:
        small = small.select([right_on] + [c for c in cols if c != right_on])
    small = small.combine_chunks()
    skeys = small[right_on].to_numpy(zero_copy_only=False)
    order = np.argsort(skeys, kind="stable")
    ref = ray.put((skeys[order], small.take(pa.array(order))))
    # exclude the SMALL side's key (right_on) — a payload column that merely
    # shares the LEFT key's name must survive (ADVICE r2); collisions with
    # existing left columns get a "_r" suffix below.
    pay_names = [n for n in small.schema.names if n != right_on]

    def lookup(t: pa.Table) -> pa.Table:
        skeys_s, payload = ray.get(ref)
        n = t.num_rows
        lk = t[on].to_numpy(zero_copy_only=False)
        lo = np.searchsorted(skeys_s, lk, side="left")
        hi = np.searchsorted(skeys_s, lk, side="right")
        counts = hi - lo
        out_counts = np.maximum(counts, 1) if how == "left" else counts
        total = int(out_counts.sum())
        reps = np.repeat(np.arange(n), out_counts)
        run_starts = np.concatenate([[0], np.cumsum(out_counts)[:-1]])
        offs = np.arange(total) - np.repeat(run_starts, out_counts)
        matched = counts[reps] > 0
        midx = np.where(matched, lo[reps] + offs, 0)
        out = t.take(pa.array(reps)) if total != n or (counts != 1).any() else t
        take_idx = pa.array(midx.astype(np.int64), mask=~matched)
        left_cols = set(t.schema.names)
        for name in pay_names:
            out_name = name if name not in left_cols else name + "_r"
            out = out.append_column(out_name, payload[name].take(take_idx))
        return out

    return ds.map_batches(lookup, batch_format="pyarrow", zero_copy_batch=True)


def broadcast_semi_filter(ds, keys, on: str, negate: bool = False):
    """Semi/anti filtering against a broadcast key set (SURVEY.md J5
    small-side path): keys may be a set/list/ndarray/Dataset of one col."""
    import numpy as np
    import ray

    if hasattr(keys, "to_pandas"):
        keys = keys.to_pandas().iloc[:, 0].to_numpy()
    value_set = pa.array(np.unique(np.asarray(list(keys))))
    ref = ray.put(value_set)

    def flt(t: pa.Table) -> pa.Table:
        vs = ray.get(ref)
        col = t[on]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        mask = pc.fill_null(pc.is_in(col, value_set=vs.cast(col.type)), False)
        return t.filter(pc.invert(mask) if negate else mask)

    return ds.map_batches(flt, batch_format="pyarrow", zero_copy_batch=True)


def skew_join(left, right, on: str, right_on: str | None = None,
              join_type: str = "inner", phi: float = 0.01,
              num_partitions: int | None = None, right_suffix: str = "_r"):
    """Skew-aware hybrid equi join — the J2 "salt hot keys" strategy in
    join form. Hot keys (left-side count > phi*|left|, found EXACTLY by
    the Misra-Gries candidate sketch + recount pass, engine/ops/freq.py
    — no key shuffle) never enter the hash exchange: their left rows
    join against the BROADCAST hot slice of the right side
    (broadcast_lookup); the cold remainder goes through the ordinary
    hash-partitioned join, whose per-partition row counts are now
    bounded by phi*|left|. The two results union. Value semantics are
    identical to equi_join / SQL JOIN — only the physical plan differs
    (column order is normalized to name-sorted so both paths union).

    Partitioning assumption (documented per SURVEY §2.6 custom-operator
    rule): the hot slice of the RIGHT side must be broadcast-small —
    hot keys are few by definition (< 1/phi of them), so this holds
    unless the right side is itself skewed on the same keys, in which
    case the join OUTPUT is quadratic and no physical strategy helps.

    join_type: "inner" | "left". With no heavy hitters (uniform keys)
    this degrades to exactly equi_join plus one cheap sketch pass.
    """
    import numpy as np

    from engine.ops.freq import heavy_hitters

    if join_type not in ("inner", "left"):
        raise ValueError(f"skew_join supports inner/left, got {join_type}")
    ray_join_type = "left_outer" if join_type == "left" else "inner"
    right_on = right_on or on

    def _name_sorted(t: pa.Table) -> pa.Table:
        drop = [right_on] if right_on != on and right_on in t.schema.names else []
        t = t.drop_columns(drop) if drop else t
        return t.select(sorted(t.schema.names))

    hot_ds, n_left = heavy_hitters(left, on, phi=phi, return_total=True)
    hot_tbl = hot_ds.to_pandas()  # < 1/phi rows
    if len(hot_tbl) == 0:
        return equi_join(left, right, on, join_type=ray_join_type, right_on=right_on,
                         num_partitions=num_partitions, right_suffix=right_suffix
                         ).map_batches(_name_sorted, batch_format="pyarrow",
                                       zero_copy_batch=True)

    hot_keys = hot_tbl["key"].to_numpy()
    if int(hot_tbl["cnt"].sum()) == n_left:
        # every left row is hot (tiny key universe): the cold side is
        # empty and Ray's hash join chokes on an all-empty-block input —
        # run the broadcast path alone
        hot_right = broadcast_semi_filter(right, hot_keys, right_on)
        return broadcast_lookup(left, hot_right, on,
                                how="left" if join_type == "left" else "inner",
                                right_on=right_on
                                ).map_batches(_name_sorted, batch_format="pyarrow",
                                              zero_copy_batch=True)
    hot_left = broadcast_semi_filter(left, hot_keys, on)
    cold_left = broadcast_semi_filter(left, hot_keys, on, negate=True)
    hot_right = broadcast_semi_filter(right, hot_keys, right_on)
    cold_right = broadcast_semi_filter(right, hot_keys, right_on, negate=True)

    cold = equi_join(cold_left, cold_right, on, join_type=ray_join_type,
                     right_on=right_on, num_partitions=num_partitions,
                     right_suffix=right_suffix)
    hot = broadcast_lookup(hot_left, hot_right, on,
                           how="left" if join_type == "left" else "inner",
                           right_on=right_on)
    cold = cold.map_batches(_name_sorted, batch_format="pyarrow", zero_copy_batch=True)
    hot = hot.map_batches(_name_sorted, batch_format="pyarrow", zero_copy_batch=True)
    return cold.union(hot)
