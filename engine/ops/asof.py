"""Point-in-time (as-of) join — SURVEY.md §2.4 J1, the heart of the engine.

Semantics: for each left row (entity e, timestamp t), attach the right row
for the same entity with the greatest right.ts <= t (strict: < t), subject
to an optional tolerance t - right.ts <= tolerance_us. Ties on right.ts
resolve to the LAST right row in input order (matches DuckDB ASOF JOIN's
"most recent" with a stable sort). Unmatched left rows keep nulls
(left-join semantics). Zero temporal leakage: no right row with ts > t
(>= t when strict) can ever influence the output — property-tested in
tests/test_leakage.py.

Physical plan (Ray-Data-first, SURVEY.md §3 E2):
  1. both sides get __pkey = stable_hash(entity) % P  (same P, same hash
     -> co-partitioned; ONE all-to-all exchange total);
  2. schemas are aligned (right value columns suffixed, missing columns
     null) and the sides unioned with a __side tag;
  3. groupby(__pkey).map_groups runs a fully vectorized sort +
     binary-search merge per partition: entity codes x dense timestamp
     ranks form a composite int64 key, np.searchsorted finds the as-of
     match for every left row at once.

Entities are never split across partitions, so partition boundaries can't
leak history (the W5 watermark-boundary concern arises only in the
time-sliced variant, engine/ops/backfill.py::asof_time_sliced).

At 10^12-row scale the inputs to this operator are fixed-width descriptor
rows (pixels never enter the shuffle, SURVEY.md §4.1); P defaults to a
data-size-derived count (engine/ops/partitioning.py).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from engine.ops.keys import partition_ids

_SIDE = "__side"
_PKEY = "__pkey"


def _null_array(n: int, typ: pa.DataType) -> pa.Array:
    return pa.nulls(n, type=typ)


def _exch_type(typ: pa.DataType) -> pa.DataType:
    """Exchange-wire type for a column: fixed_size_list -> variable list.

    A fixed_size_list<f64,k> has NO offsets buffer, so a NULL slot still
    occupies k*8 bytes in the child values buffer — `pa.nulls(n, fsl)` on
    the tag side of the as-of exchange ships n*k*8 bytes of padding
    through the shuffle (measured: 3.6 GB of the flagship sink's 5.0 GB
    exchange volume was null fv padding on left rows). A variable list
    stores a null slot as one repeated offset (4 bytes). The merge casts
    back to the declared output type (list->fsl cast validates sizes of
    non-null slots only)."""
    if pa.types.is_fixed_size_list(typ):
        return pa.list_(typ.value_type)
    return typ


def asof_join(
    left,
    right,
    on: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    right_cols: list | None = None,
    strict: bool = False,
    tolerance_us: int | None = None,
    suffix: str = "_r",
    num_partitions: int | None = None,
    include_right_ts: bool = True,
    post=None,
    exchange: str = "sort",
    direction: str = "backward",
):
    """left, right: ray.data.Dataset -> Dataset with left columns +
    suffixed right value columns (+ matched right ts).

    ``post``: optional pa.Table -> pa.Table applied to each merged
    partition INSIDE the same map_groups call — downstream partition-local
    work (e.g. windowed features over the same entity key) fuses into this
    operator's single shuffle instead of paying a second exchange
    (SURVEY.md §4.2: shuffle count is the cost model).

    ``exchange``: physical plan for the entity exchange.
    - "sort" (default): groupby(__pkey).map_groups, Ray's sort-based
      exchange. Measured fastest on this cluster (~8s for 600k rows /
      416MB at 32 CPUs) and needs no aggregator actors.
    - "repartition": hash-partition blocks by __pkey via
      Dataset.repartition(P, keys=...) then merge whole blocks (the merge
      derives entity codes itself, so it only needs entity-completeness
      per block, which hash partitioning guarantees). Requires
      DataContext.shuffle_strategy = HASH_SHUFFLE; measured 2-3x SLOWER
      here because each execution spawns P aggregator actors — worth
      revisiting on a real multi-node cluster where the hash exchange
      avoids the sort's reduce-side merge (~60 CPU·s on this input) and
      actors amortize over far more data.
    """
    from engine.ops.partitioning import shuffle_partitions
    from engine.ops.util import arrow_schema, norm_ts

    P = num_partitions or shuffle_partitions(left, right)
    lraw, rraw = arrow_schema(left), arrow_schema(right)
    lschema = pa.schema([pa.field(n, norm_ts(lraw.field(n).type)) for n in lraw.names])
    rschema = pa.schema([pa.field(n, norm_ts(rraw.field(n).type)) for n in rraw.names])
    if right_cols is None:
        right_cols = [n for n in rschema.names if n not in (on, right_ts)]

    # attached right columns are nullable by left-join semantics, and a
    # NULLABLE fixed_size_list does not survive a parquet round-trip
    # (pyarrow cannot reconstruct FSL from a null slot's 0 child values)
    # — so fsl right columns come back as variable lists (_exch_type);
    # left columns keep their declared types.
    out_right_fields = []
    if include_right_ts:
        out_right_fields.append(pa.field(right_ts + suffix, rschema.field(right_ts).type))
    for c in right_cols:
        out_right_fields.append(pa.field(c + suffix, _exch_type(rschema.field(c).type)))

    unified = pa.schema(
        [pa.field(n, _exch_type(lschema.field(n).type)) for n in lschema.names]
        + [pa.field(f.name, _exch_type(f.type)) for f in out_right_fields]
        + [pa.field("__rts", rschema.field(right_ts).type), pa.field(_SIDE, pa.int8()), pa.field(_PKEY, pa.int32())]
    )
    left_names = list(lschema.names)
    rval_names = [f.name for f in out_right_fields]

    def tag_left(t: pa.Table) -> pa.Table:
        n = t.num_rows
        cols = {name: t[name] for name in left_names}
        for f in out_right_fields:
            cols[f.name] = _null_array(n, _exch_type(f.type))
        cols["__rts"] = _null_array(n, rschema.field(right_ts).type)
        cols[_SIDE] = pa.array(np.zeros(n, np.int8))
        cols[_PKEY] = pa.array(partition_ids(t[on], P), type=pa.int32())
        return pa.table(cols).cast(unified)

    def tag_right(t: pa.Table) -> pa.Table:
        n = t.num_rows
        cols = {}
        for name in left_names:
            cols[name] = t[on] if name == on else _null_array(n, _exch_type(lschema.field(name).type))
        if include_right_ts:
            cols[right_ts + suffix] = t[right_ts]
        for c in right_cols:
            cols[c + suffix] = t[c]
        cols["__rts"] = t[right_ts]
        cols[_SIDE] = pa.array(np.ones(n, np.int8))
        cols[_PKEY] = pa.array(partition_ids(t[on], P), type=pa.int32())
        return pa.table(cols).cast(unified)

    tagged = left.map_batches(tag_left, batch_format="pyarrow", zero_copy_batch=True).union(
        right.map_batches(tag_right, batch_format="pyarrow", zero_copy_batch=True)
    )

    out_schema = pa.schema([pa.field(n, lschema.field(n).type) for n in left_names] + out_right_fields)
    merge = _make_merge(left_names, out_right_fields, out_schema, on, left_ts, lschema,
                        strict=strict, tolerance_us=tolerance_us, direction=direction)
    fn = merge if post is None else (lambda g: post(merge(g)))
    if exchange == "repartition":
        return tagged.repartition(P, keys=[_PKEY]).map_batches(
            fn, batch_format="pyarrow", batch_size=None, zero_copy_batch=True
        )
    return tagged.groupby(_PKEY).map_groups(fn, batch_format="pyarrow")



def asof_join_broadcast(
    left,
    right,
    on: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    right_cols: list | None = None,
    strict: bool = False,
    tolerance_us: int | None = None,
    suffix: str = "_r",
    include_right_ts: bool = True,
):
    """Zero-shuffle as-of join for a SMALL right side (dimension-table
    case): the right table is SORTED AND INDEXED ONCE driver-side —
    (entity-code x dense-timestamp-rank) composite keys, the same keying
    as the shuffle merge — put in the object store once (ray.put), and
    every left batch only BINARY-SEARCHES against it (three searchsorted
    calls per batch, no concat of the right side, no per-batch re-sort).
    No exchange at all, so the left side streams at full read speed.
    Identical semantics (and SQL oracle) to asof_join; use when the right
    side fits comfortably in a worker heap (features/dim tables up to
    ~100s of MB).

    right: ray.data.Dataset (materialized driver-side), pandas.DataFrame
    or pyarrow.Table.
    """
    import pandas as pd
    import ray

    from engine.ops.util import arrow_schema, norm_ts

    if hasattr(right, "to_pandas") and not isinstance(right, (pd.DataFrame, pa.Table)):
        right = pa.Table.from_pandas(right.to_pandas(), preserve_index=False)
    elif isinstance(right, pd.DataFrame):
        right = pa.Table.from_pandas(right, preserve_index=False)
    rschema = pa.schema([pa.field(n, norm_ts(right.schema.field(n).type))
                         for n in right.schema.names])
    right = right.cast(rschema).combine_chunks()

    lraw = arrow_schema(left)
    lschema = pa.schema([pa.field(n, norm_ts(lraw.field(n).type)) for n in lraw.names])
    if right_cols is None:
        right_cols = [n for n in rschema.names if n not in (on, right_ts)]
    left_names = list(lschema.names)
    out_right_fields = []
    if include_right_ts:
        out_right_fields.append(pa.field(right_ts + suffix, rschema.field(right_ts).type))
    for c in right_cols:
        # variable list for attached fsl columns, same rationale as asof_join
        out_right_fields.append(pa.field(c + suffix, _exch_type(rschema.field(c).type)))
    out_schema = pa.schema([pa.field(n, lschema.field(n).type) for n in left_names]
                           + out_right_fields)

    # ---- one-time driver-side index build ----
    nr = right.num_rows
    rkeys = right[on].to_numpy(zero_copy_only=False)
    rts = (right[right_ts].cast(pa.int64()).to_numpy(zero_copy_only=False)
           if pa.types.is_timestamp(rschema.field(right_ts).type)
           else right[right_ts].to_numpy(zero_copy_only=False))
    order = np.lexsort((np.arange(nr), rts, rkeys))  # stable (key, ts, input order)
    rkeys_s, rts_s = rkeys[order], rts[order]
    ukeys = np.unique(rkeys_s)
    codes_s = np.searchsorted(ukeys, rkeys_s).astype(np.int64)
    uts = np.unique(rts_s)
    factor = np.int64(uts.size + 1)
    composite = codes_s * factor + np.searchsorted(uts, rts_s).astype(np.int64)
    # sorted right payload: output fields + __rts, in sorted order
    pcols = {}
    take = pa.array(order)
    if include_right_ts:
        pcols[right_ts + suffix] = right[right_ts].take(take)
    for c in right_cols:
        col = right[c].take(take)
        exch = _exch_type(col.type)
        pcols[c + suffix] = col.cast(exch) if exch != col.type else col
    payload = pa.table(pcols) if pcols else None
    ref = ray.put((ukeys, uts, composite, codes_s, rts_s, payload))

    ts_is_time = pa.types.is_timestamp(lschema.field(left_ts).type)
    side_kw = "left" if strict else "right"

    def fn(batch: pa.Table) -> pa.Table:
        nb = batch.num_rows
        if batch.schema != lschema:  # e.g. ns-grained pandas-origin timestamps
            batch = batch.select(left_names).cast(lschema)
        ukeys_, uts_, composite_, codes_s_, rts_s_, payload_ = ray.get(ref)
        cols = {name: batch[name] for name in left_names}
        if nb == 0 or composite_.size == 0:
            for f in out_right_fields:
                cols[f.name] = _null_array(nb, f.type)
            return pa.table(cols, schema=out_schema)
        lkeys = batch[on].to_numpy(zero_copy_only=False)
        lts = (batch[left_ts].cast(pa.int64()).to_numpy(zero_copy_only=False)
               if ts_is_time else batch[left_ts].to_numpy(zero_copy_only=False))
        code = np.searchsorted(ukeys_, lkeys)
        safe_code = np.minimum(code, ukeys_.size - 1)
        has_key = ukeys_[safe_code] == lkeys
        # last right rank <= lts (strict: < lts) via the global rank table
        r = np.searchsorted(uts_, lts, side=side_kw) - 1
        idx = np.searchsorted(composite_, safe_code.astype(np.int64) * np.int64(uts_.size + 1)
                              + np.maximum(r, 0), side="right") - 1
        valid = has_key & (r >= 0) & (idx >= 0)
        safe = np.where(valid, idx, 0)
        valid &= codes_s_[safe] == safe_code
        if tolerance_us is not None:
            valid &= (lts - rts_s_[safe]) <= tolerance_us
        take_idx = pa.array(np.where(valid, safe, 0).astype(np.int64), mask=~valid)
        for f in out_right_fields:
            cols[f.name] = payload_[f.name].take(take_idx)
        return pa.table(cols, schema=out_schema)

    return left.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)

def _make_merge(left_names, out_right_fields, out_schema, on, left_ts, lschema,
                strict: bool, tolerance_us: int | None,
                direction: str = "backward"):
    """Vectorized per-partition sort+binary-search as-of merge, shared by
    the entity-hash path (asof_join) and the time-sliced W5 path
    (engine/ops/backfill.py::asof_time_sliced).

    direction: "backward" (greatest right.ts <= t — the default and the
    leakage-safe one), "forward" (smallest right.ts >= t; strict: > t;
    ties resolve to the FIRST right row in input order), or "nearest"
    (the closer of the two; exact tie -> backward). forward/nearest look
    into the future by construction — like lead_*, they must not feed
    leakage-audited training outputs. tolerance_us bounds |t - right.ts|
    per direction before nearest picks."""
    rval_names = [f.name for f in out_right_fields]
    if direction not in ("backward", "forward", "nearest"):
        raise ValueError(f"direction must be backward|forward|nearest, got {direction!r}")

    def finish(cols) -> pa.Table:
        # exchange-wire types (fixed_size_list shipped as variable list,
        # see _exch_type) are cast back to the declared output schema;
        # no-op when nothing was widened
        tbl = pa.table(cols)
        return tbl if tbl.schema == out_schema else tbl.cast(out_schema)

    def merge(group: pa.Table) -> pa.Table:
        if group.num_rows == 0:  # empty exchange partition (may be schema-less)
            return pa.table({f.name: pa.chunked_array([], type=f.type) for f in out_schema},
                            schema=out_schema)
        side = group[_SIDE].to_numpy(zero_copy_only=False)
        lt = group.filter(pa.array(side == 0)).select(left_names)
        rt = group.filter(pa.array(side == 1)).select([on, "__rts"] + rval_names)
        nl, nr = lt.num_rows, rt.num_rows
        if nl == 0:
            return pa.table({f.name: pa.chunked_array([], type=f.type) for f in out_schema}, schema=out_schema)

        lts = lt[left_ts].cast(pa.int64()).to_numpy(zero_copy_only=False) if pa.types.is_timestamp(
            lschema.field(left_ts).type
        ) else lt[left_ts].to_numpy(zero_copy_only=False)
        if nr == 0:
            cols = {name: lt[name] for name in left_names}
            for f in out_right_fields:
                cols[f.name] = _null_array(nl, f.type)
            return finish(cols)

        rts = rt["__rts"].cast(pa.int64()).to_numpy(zero_copy_only=False)

        # entity codes consistent across both sides: one C hash-table
        # dictionary_encode over both key columns (codes are appearance-
        # order, which is fine — rkey is argsorted explicitly below);
        # ~20x faster than np.unique's Python-string compares per group
        both = pa.chunked_array([lt[on].combine_chunks(), rt[on].combine_chunks()])
        inv = both.combine_chunks().dictionary_encode().indices.to_numpy(
            zero_copy_only=False).astype(np.int64)
        lcode, rcode = inv[:nl], inv[nl:]
        # dense timestamp ranks -> composite key fits int64
        uts, tinv = np.unique(np.concatenate([lts, rts]), return_inverse=True)
        lrank, rrank = tinv[:nl].astype(np.int64), tinv[nl:].astype(np.int64)
        factor = np.int64(len(uts) + 1)
        rkey = rcode * factor + rrank
        order = np.argsort(rkey, kind="stable")  # stable: ties keep input order
        rkey_s = rkey[order]
        lkey = lcode * factor + lrank

        if direction in ("backward", "nearest"):
            idx = np.searchsorted(rkey_s, lkey, side=("left" if strict else "right")) - 1
            bvalid = idx >= 0
            bsafe = np.where(bvalid, idx, 0)
            bvalid &= rcode[order[bsafe]] == lcode
            if tolerance_us is not None:
                bvalid &= (lts - rts[order[bsafe]]) <= tolerance_us
        if direction in ("forward", "nearest"):
            fidx = np.searchsorted(rkey_s, lkey, side=("right" if strict else "left"))
            fvalid = fidx < rkey_s.size
            fsafe = np.where(fvalid, fidx, 0)
            fvalid &= rcode[order[fsafe]] == lcode
            if tolerance_us is not None:
                fvalid &= (rts[order[fsafe]] - lts) <= tolerance_us
        if direction == "backward":
            valid, safe = bvalid, bsafe
        elif direction == "forward":
            valid, safe = fvalid, fsafe
        else:
            big = np.iinfo(np.int64).max
            bd = np.where(bvalid, lts - rts[order[bsafe]], big)
            fd = np.where(fvalid, rts[order[fsafe]] - lts, big)
            use_b = bvalid & (~fvalid | (bd <= fd))
            valid = bvalid | fvalid
            safe = np.where(use_b, bsafe, fsafe)
        take_pos = np.where(valid, order[safe], -1)
        take_idx = pa.array(
            np.where(valid, take_pos, 0).astype(np.int64), mask=~valid
        )

        cols = {name: lt[name] for name in left_names}
        for f in out_right_fields:
            cols[f.name] = rt[f.name].take(take_idx)
        return finish(cols)

    return merge


def asof_multi_horizon(
    left,
    right,
    on: str,
    id_col: str,
    horizons: dict[str, int],
    left_ts: str = "ts",
    right_ts: str = "ts",
    right_cols: list | None = None,
    strict: bool = False,
    tolerance_us: int | None = None,
    num_partitions: int | None = None,
):
    """Multi-horizon point-in-time attach — the feature-store fetch
    "value as-of t, as-of t-1h, as-of t-24h, ..." — in ONE entity
    exchange instead of one asof_join per horizon.

    ``horizons``: {name: offset_us}; for each left row and each horizon
    the greatest right row with right_ts <= left_ts - offset (backward /
    leakage-safe semantics; ``strict``/``tolerance_us`` as in asof_join)
    is attached as ``<col>_<name>``. ``id_col`` must uniquely identify
    left rows (it is how the k probe rows pivot back to one output row).

    Physical plan: a map-only explode emits k probe rows per left row
    (probe ts = left_ts - offset, horizon ordinal tagged), then the
    ordinary asof_join runs ONCE with the pivot fused into its
    map_groups via ``post`` — all k probes of a row share its entity
    key, so they land in the same partition and the pivot is a
    partition-local sort + strided take. Exchange volume is k x left
    (the same rows k separate joins would move) but the fixed exchange
    cost is paid once.
    """
    import pyarrow.compute as pc

    from engine.ops.util import arrow_schema, norm_ts

    names = list(horizons)
    k = len(names)
    if k == 0:
        raise ValueError("asof_multi_horizon: need at least one horizon")
    offsets = [int(horizons[n]) for n in names]

    lraw = arrow_schema(left)
    ts_type = norm_ts(lraw.field(left_ts).type)
    is_ts = pa.types.is_timestamp(ts_type)
    rraw = arrow_schema(right)
    if right_cols is None:
        right_cols = [n for n in rraw.names if n not in (on, right_ts)]
    left_out = list(lraw.names)

    def explode(t: pa.Table) -> pa.Table:
        n = t.num_rows
        us = t[left_ts]
        if isinstance(us, pa.ChunkedArray):
            us = us.combine_chunks()
        us = us.cast(pa.int64()) if is_ts else us.cast(pa.int64())
        parts = []
        for i, off in enumerate(offsets):
            probe = pc.subtract(us, pa.scalar(off, pa.int64()))
            cols = {name: t[name] for name in left_out}
            cols["__probe"] = probe.cast(ts_type) if is_ts else probe
            cols["__hz"] = pa.array(np.full(n, i, np.int8))
            parts.append(pa.table(cols))
        return pa.concat_tables(parts)

    exploded = left.map_batches(explode, batch_format="pyarrow", zero_copy_batch=True)
    if hasattr(left, "_graft_input_files"):
        exploded._graft_input_files = left._graft_input_files

    attached = [f"{c}_r" for c in right_cols]

    def pivot(t: pa.Table) -> pa.Table:
        out_names = ([n for n in left_out]
                     + [f"{c}_{nm}" for nm in names for c in right_cols])
        if t.num_rows == 0:
            base = {n: t[n] for n in left_out} if set(left_out) <= set(t.schema.names) else {}
            if not base:
                return t
            for nm in names:
                for c, a in zip(right_cols, attached):
                    base[f"{c}_{nm}"] = t[a]
            return pa.table({n: base[n] for n in out_names})
        idx = pc.sort_indices(t, sort_keys=[(id_col, "ascending"), ("__hz", "ascending")])
        t = t.take(idx)
        n = t.num_rows // k
        base_idx = pa.array(np.arange(n, dtype=np.int64) * k)
        cols = {name: t[name].take(base_idx) for name in left_out}
        for j, nm in enumerate(names):
            sel = pa.array(np.arange(n, dtype=np.int64) * k + j)
            for c, a in zip(right_cols, attached):
                cols[f"{c}_{nm}"] = t[a].take(sel)
        return pa.table(cols)

    out = asof_join(
        exploded,
        right,
        on=on,
        left_ts="__probe",
        right_ts=right_ts,
        right_cols=right_cols,
        strict=strict,
        tolerance_us=tolerance_us,
        num_partitions=num_partitions,
        include_right_ts=False,
        post=pivot,
    )
    return out
