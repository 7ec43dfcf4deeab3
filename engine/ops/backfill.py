"""Backfill / as-of forward-fill onto timeline grids + the time-sliced
as-of variant with watermark boundaries (SURVEY.md §2.4 W4/W5).

`backfill` materializes features at grid timestamps by as-of joining the
grid against the feature history — the reimagining of the reference's
missing-value imputation (R3): a grid point's features are forward-filled
from the last known observation, never from the future (zero temporal
leakage, property-tested).

`make_grid` builds the per-entity grid distributedly (one groupby for the
per-entity [min_ts, max_ts] span, then a vectorized expand inside
map_batches — no driver-side loop over entities).

`asof_time_sliced` is the W5 demonstration path: both sides partitioned
by TIME RANGE (not entity hash), which is the natural layout for
log-structured inputs. A time cut may split an entity's history, so each
slice k receives carry-in rows: for every entity, the last right row from
any earlier slice. Carry-in is derived from the small
last-per-(entity, slice) aggregate — NOT the full right side — then
forward-propagated across slice boundaries. Exactness vs the entity-hash
path is asserted in tests/test_partition_invariance.py.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from engine.ops.asof import asof_join


def make_grid(ds, entity: str, ts: str = "ts", step_us: int = 3_600_000_000,
              pad_us: int = 86_400_000_000, cap: int = 64):
    """-> Dataset(entity, ts) with per-entity points [min_ts, max_ts+pad]
    every step_us, capped at `cap` points per entity."""
    from ray.data.aggregate import Max, Min

    spans = ds.groupby(entity).aggregate(Min(ts, alias_name="__lo"), Max(ts, alias_name="__hi"))

    def expand(t: pa.Table) -> pa.Table:
        lo = t["__lo"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        hi = t["__hi"].cast(pa.int64()).to_numpy(zero_copy_only=False) + pad_us
        counts = np.minimum((hi - lo) // step_us + 1, cap).astype(np.int64)
        ent = t[entity].to_numpy(zero_copy_only=False)
        reps = np.repeat(np.arange(len(ent)), counts)
        # offset within each entity's run: arange minus run start
        run_starts = np.concatenate([[0], np.cumsum(counts)[:-1]])
        offs = np.arange(counts.sum()) - np.repeat(run_starts, counts)
        tss = lo[reps] + offs * step_us
        return pa.table({
            entity: pa.array(ent[reps]),
            ts: pa.array(tss.astype("datetime64[us]"), type=pa.timestamp("us")),
        })

    return spans.map_batches(expand, batch_format="pyarrow", zero_copy_batch=True)


def backfill(grid, features, on: str, ts: str = "ts", feature_cols=None,
             tolerance_us: int | None = None, num_partitions: int | None = None):
    """Grid rows get the last-known feature values (forward fill): a plain
    as-of join, suffix '' on a disjoint column set."""
    return asof_join(grid, features, on=on, left_ts=ts, right_ts=ts,
                     right_cols=feature_cols, tolerance_us=tolerance_us,
                     num_partitions=num_partitions)


# ------------------------------------------------------ time-sliced W5 --

def asof_time_sliced(left, right, on: str, boundaries_us: list[int],
                     ts: str = "ts", right_cols=None, suffix: str = "_r"):
    """As-of join with TIME-RANGE partitioning + carry-in rows (W5).

    boundaries_us: sorted interior cut points; slice k = [b[k-1], b[k]).
    Each slice's merge sees (a) right rows inside the slice and (b) one
    carry-in row per entity = the latest right row before the slice start,
    so no slice ever needs rows from a neighbour at merge time.
    """
    from engine.ops.util import arrow_schema, norm_ts

    bounds = np.asarray(boundaries_us, dtype=np.int64)
    rraw = arrow_schema(right)
    rschema = pa.schema([pa.field(n, norm_ts(rraw.field(n).type)) for n in rraw.names])
    if right_cols is None:
        right_cols = [n for n in rschema.names if n not in (on, ts)]

    def slice_of(ts_i64: np.ndarray) -> np.ndarray:
        return np.searchsorted(bounds, ts_i64, side="right").astype(np.int32)

    def tag(t: pa.Table) -> pa.Table:
        s = slice_of(t[ts].cast(pa.int64()).to_numpy(zero_copy_only=False))
        return t.append_column("__slice", pa.array(s, type=pa.int32()))

    # carry-in: last right row per (entity, slice), forward-propagated.
    # Derived from the small per-(entity, slice) reduction, not the full
    # right side — and propagated DISTRIBUTEDLY: one entity-hash shuffle
    # over that small table, then a vectorized replicate-forward pass per
    # partition (no driver loop over entities x slices; at production
    # scale this table is maintained incrementally per time partition).
    rt = right.map_batches(tag, batch_format="pyarrow", zero_copy_batch=True)
    keep = [on, ts] + list(right_cols) + ["__slice"]
    n_slices = len(bounds) + 1

    def last_row(t: pa.Table) -> pa.Table:
        # pyarrow in/out so empty sort partitions keep their schema
        if t.num_rows == 0:
            return t
        tsv = t[ts].cast(pa.int64()).to_numpy(zero_copy_only=False)
        i = int(np.flatnonzero(tsv == tsv.max())[-1])  # stable-tail tie rule
        return t.take(pa.array([i]))

    last_per = (rt.select_columns(keep)
                .groupby([on, "__slice"])
                .map_groups(last_row, batch_format="pyarrow"))

    def propagate(t: pa.Table) -> pa.Table:
        """Each last-per-(entity, slice=s) row becomes the carry-in for
        every later slice up to the entity's next observed slice: replicate
        it into slices s+1..next(s) (last observation runs to the final
        slice). Pure take/repeat arithmetic — one pass, all entities."""
        t = t.drop_columns(["__pkey"])
        if t.num_rows == 0:
            return t
        ent = t[on].to_numpy(zero_copy_only=False)
        _, codes = np.unique(ent, return_inverse=True)
        s = t["__slice"].to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.lexsort((s, codes))
        t = t.take(pa.array(order))
        codes, s = codes[order], s[order]
        n = len(s)
        nxt = np.empty(n, dtype=np.int64)
        nxt[:-1] = s[1:]
        nxt[-1] = n_slices - 1
        last_of_entity = np.empty(n, dtype=bool)
        last_of_entity[:-1] = codes[1:] != codes[:-1]
        last_of_entity[-1] = True
        nxt[last_of_entity] = n_slices - 1
        counts = np.maximum(nxt - s, 0)
        total = int(counts.sum())
        if total == 0:
            return t.slice(0, 0)
        reps = np.repeat(np.arange(n), counts)
        run_starts = np.concatenate([[0], np.cumsum(counts)[:-1]])
        offs = np.arange(total) - np.repeat(run_starts, counts)
        out = t.take(pa.array(reps))
        return out.set_column(out.schema.get_field_index("__slice"), "__slice",
                              pa.array((s[reps] + 1 + offs).astype(np.int32), type=pa.int32()))

    from engine.ops.window import _partitioned

    carries = _partitioned(last_per, on, num_partitions=16).map_groups(
        propagate, batch_format="pyarrow")

    lt = left.map_batches(tag, batch_format="pyarrow", zero_copy_batch=True)
    right_aug = rt.select_columns(keep).union(carries.select_columns(keep))

    # merge per slice, reusing the entity-hash as-of merge with P=1 inside
    # each slice group: tag slice as the partition key.
    from engine.ops import asof as _a

    lraw = arrow_schema(lt)
    lsch = pa.schema([pa.field(n, norm_ts(lraw.field(n).type)) for n in lraw.names])
    left_names = [n for n in lsch.names if n != "__slice"]
    out_fields = [pa.field(ts + suffix, rschema.field(ts).type)] + [
        pa.field(c + suffix, rschema.field(c).type) for c in right_cols
    ]
    unified = pa.schema(
        [pa.field(n, lsch.field(n).type) for n in left_names]
        + out_fields
        + [pa.field("__rts", rschema.field(ts).type), pa.field("__side", pa.int8()), pa.field("__slice", pa.int32())]
    )

    def tag_l(t: pa.Table) -> pa.Table:
        n = t.num_rows
        cols = {name: t[name] for name in left_names}
        for f in out_fields:
            cols[f.name] = pa.nulls(n, f.type)
        cols["__rts"] = pa.nulls(n, rschema.field(ts).type)
        cols["__side"] = pa.array(np.zeros(n, np.int8))
        cols["__slice"] = t["__slice"]
        return pa.table(cols).cast(unified)

    def tag_r(t: pa.Table) -> pa.Table:
        n = t.num_rows
        cols = {}
        for name in left_names:
            cols[name] = t[on] if name == on else pa.nulls(n, lsch.field(name).type)
        cols[ts + suffix] = t[ts]
        for c in right_cols:
            cols[c + suffix] = t[c]
        cols["__rts"] = t[ts]
        cols["__side"] = pa.array(np.ones(n, np.int8))
        cols["__slice"] = t["__slice"]
        return pa.table(cols).cast(unified)

    tagged = lt.map_batches(tag_l, batch_format="pyarrow").union(
        right_aug.map_batches(tag_r, batch_format="pyarrow")
    )
    out_schema = pa.schema([pa.field(n, lsch.field(n).type) for n in left_names] + out_fields)
    merge = _a._make_merge(left_names, out_fields, out_schema, on, ts, lsch, strict=False, tolerance_us=None)
    return tagged.groupby("__slice").map_groups(merge, batch_format="pyarrow")
