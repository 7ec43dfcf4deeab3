"""Range (interval) join — SURVEY.md §2.4 family: for each left row
(entity e, ts t), emit one output row per right row of the same entity
with right.ts in [t - lo_us, t + hi_us]. Inner semantics (left rows with
no match produce nothing).

Physical plan mirrors engine/ops/asof.py: both sides tagged with
__pkey = hash(entity) % P, ONE union + sort exchange, then a fully
vectorized partition-local pass: banded composite keys (entity code x
window-padded normalized timestamp) make a single pair of np.searchsorted
calls yield every left row's right-match range at once; np.repeat +
cumsum-offset arithmetic expands the ranges into flat take indices with
no Python loop.

Leakage note: hi_us > 0 reads FUTURE right rows — leakage-safe feature
pipelines must use hi_us=0 (then the window is exactly the trailing
interval [t - lo_us, t]).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from engine.ops.keys import partition_ids

_SIDE = "__side"
_PKEY = "__pkey"


def range_join(
    left,
    right,
    on: str,
    lo_us: int,
    hi_us: int = 0,
    left_ts: str = "ts",
    right_ts: str = "ts",
    right_cols: list | None = None,
    suffix: str = "_r",
    num_partitions: int | None = None,
):
    from engine.ops.partitioning import shuffle_partitions
    from engine.ops.util import arrow_schema, norm_ts

    P = num_partitions or shuffle_partitions(left, right)
    lraw, rraw = arrow_schema(left), arrow_schema(right)
    lschema = pa.schema([pa.field(n, norm_ts(lraw.field(n).type)) for n in lraw.names])
    rschema = pa.schema([pa.field(n, norm_ts(rraw.field(n).type)) for n in rraw.names])
    if right_cols is None:
        right_cols = [n for n in rschema.names if n not in (on, right_ts)]
    left_names = list(lschema.names)
    out_right_fields = [pa.field(right_ts + suffix, rschema.field(right_ts).type)] + [
        pa.field(c + suffix, rschema.field(c).type) for c in right_cols
    ]
    unified = pa.schema(
        [pa.field(n, lschema.field(n).type) for n in left_names]
        + out_right_fields
        + [pa.field(_SIDE, pa.int8()), pa.field(_PKEY, pa.int32())]
    )
    out_schema = pa.schema([pa.field(n, lschema.field(n).type) for n in left_names] + out_right_fields)

    def tag_left(t: pa.Table) -> pa.Table:
        n = t.num_rows
        cols = {name: t[name] for name in left_names}
        for f in out_right_fields:
            cols[f.name] = pa.nulls(n, type=f.type)
        cols[_SIDE] = pa.array(np.zeros(n, np.int8))
        cols[_PKEY] = pa.array(partition_ids(t[on], P), type=pa.int32())
        return pa.table(cols).cast(unified)

    def tag_right(t: pa.Table) -> pa.Table:
        n = t.num_rows
        cols = {}
        for name in left_names:
            cols[name] = t[on] if name == on else pa.nulls(n, lschema.field(name).type)
        cols[right_ts + suffix] = t[right_ts]
        for c in right_cols:
            cols[c + suffix] = t[c]
        cols[_SIDE] = pa.array(np.ones(n, np.int8))
        cols[_PKEY] = pa.array(partition_ids(t[on], P), type=pa.int32())
        return pa.table(cols).cast(unified)

    tagged = left.map_batches(tag_left, batch_format="pyarrow", zero_copy_batch=True).union(
        right.map_batches(tag_right, batch_format="pyarrow", zero_copy_batch=True)
    )
    rts_out = right_ts + suffix
    lo64, hi64 = np.int64(lo_us), np.int64(hi_us)

    def merge(group: pa.Table) -> pa.Table:
        def empty():
            return pa.table({f.name: pa.chunked_array([], type=f.type) for f in out_schema},
                            schema=out_schema)

        if group.num_rows == 0:
            return empty()
        side = group[_SIDE].to_numpy(zero_copy_only=False)
        lt = group.filter(pa.array(side == 0)).select(left_names)
        rt = group.filter(pa.array(side == 1)).select([on, rts_out] + [c + suffix for c in right_cols])
        nl, nr = lt.num_rows, rt.num_rows
        if nl == 0 or nr == 0:
            return empty()

        def ts_of(tbl, col, schema_field):
            c = tbl[col]
            return (c.cast(pa.int64()).to_numpy(zero_copy_only=False)
                    if pa.types.is_timestamp(schema_field.type)
                    else c.to_numpy(zero_copy_only=False))

        lts = ts_of(lt, left_ts, lschema.field(left_ts))
        rts = ts_of(rt, rts_out, rschema.field(right_ts))
        lkeys = lt[on].to_numpy(zero_copy_only=False)
        rkeys = rt[on].to_numpy(zero_copy_only=False)
        uni, inv = np.unique(np.concatenate([lkeys, rkeys]), return_inverse=True)
        lcode, rcode = inv[:nl].astype(np.int64), inv[nl:].astype(np.int64)

        # Dense timestamp ranks (query boundaries included in the rank
        # table) bound the composite-key factor by ROW COUNT: the raw
        # value-space key rcode * (span + lo + hi + 2) + offset silently
        # wraps int64 once entities-per-partition x time-span grows (e.g.
        # ~50k entities over a 10-year microsecond span). Ranks preserve
        # <=, so searchsorted over ranked keys matches value-space search.
        qlo, qhi = lts - lo64, lts + hi64
        uts, inv = np.unique(np.concatenate([rts, qlo, qhi]), return_inverse=True)
        base = np.int64(uts.size + 1)
        if rcode.size and np.int64(max(lcode.max(), rcode.max())) > (np.iinfo(np.int64).max - base) // base:
            raise OverflowError("range_join partition too large for composite keys")
        rkey = rcode * base + inv[:nr]
        order = np.argsort(rkey, kind="stable")
        rkey_s = rkey[order]
        lo_q = lcode * base + inv[nr : nr + nl]
        hi_q = lcode * base + inv[nr + nl :]
        lo_idx = np.searchsorted(rkey_s, lo_q, side="left")
        hi_idx = np.searchsorted(rkey_s, hi_q, side="right")
        counts = hi_idx - lo_idx
        total = int(counts.sum())
        if total == 0:
            return empty()
        lidx = np.repeat(np.arange(nl), counts)
        starts = np.repeat(lo_idx, counts)
        csum = np.concatenate([[0], np.cumsum(counts)[:-1]])
        offs = np.arange(total) - np.repeat(csum, counts)
        ridx = order[starts + offs]

        la, ra = pa.array(lidx), pa.array(ridx)
        cols = {name: lt[name].take(la) for name in left_names}
        for f in out_right_fields:
            cols[f.name] = rt[f.name].take(ra)
        return pa.table(cols, schema=out_schema)

    return tagged.groupby(_PKEY).map_groups(merge, batch_format="pyarrow")
