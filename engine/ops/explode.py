"""Explode / unnest: one output row per element of a list column
(SURVEY.md §2.3 family; the op behind per-token / per-frame / per-element
training-data layouts — Ray Data has no native unnest).

Pure per-batch Arrow transform: the list column's flattened values array
is taken zero-copy, scalar companion columns are expanded with a
`take(np.repeat(...))`, and a 1-based `pos` ordinal is built from the
list offsets. No shuffle, streams at read speed. Null list entries
produce no rows (matches SQL UNNEST).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def explode_batch(t: pa.Table, col: str, keep: list[str] | None = None,
                  value_name: str = "e", pos_name: str = "pos") -> pa.Table:
    keep = keep if keep is not None else [c for c in t.column_names if c != col]
    arr = t[col]
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    if isinstance(arr, pa.FixedSizeListArray):
        n = arr.type.list_size
        lengths = np.where(arr.is_valid().to_numpy(zero_copy_only=False), n, 0)
        values = arr.values
        if arr.null_count:
            mask = np.repeat(arr.is_valid().to_numpy(zero_copy_only=False), n)
            values = values.filter(pa.array(mask))
    else:
        arr = arr.cast(pa.list_(arr.type.value_type))
        offsets = arr.offsets.to_numpy(zero_copy_only=False)
        lengths = (offsets[1:] - offsets[:-1]).copy()
        lengths[~arr.is_valid().to_numpy(zero_copy_only=False)] = 0
        values = arr.flatten()  # flatten() skips null entries' slots
    idx = pa.array(np.repeat(np.arange(t.num_rows), lengths))
    total = int(lengths.sum())
    csum = np.concatenate([[0], np.cumsum(lengths)[:-1]])
    pos = np.arange(total) - np.repeat(csum, lengths) + 1  # 1-based, SQL parity
    cols = {c: t[c].take(idx) for c in keep}
    cols[pos_name] = pa.array(pos.astype(np.int64))
    cols[value_name] = values
    return pa.table(cols)


def explode(ds, col: str, keep: list[str] | None = None,
            value_name: str = "e", pos_name: str = "pos"):
    return ds.map_batches(
        lambda t: explode_batch(t, col, keep, value_name, pos_name),
        batch_format="pyarrow", zero_copy_batch=True,
    )


def melt(ds, id_cols: list[str], value_cols: list[str],
         var_name: str = "variable", value_name: str = "value"):
    """UNPIVOT / melt — wide columns to (variable, value) rows, the
    inverse of agg.pivot. Map-only (no shuffle, streams at read speed):
    each batch emits len(value_cols) stacked slices built from ONE
    concat of Arrow takes; values are cast to a common float64 (SQL
    UNPIVOT requires a shared value type too). Value-exact DuckDB
    oracle via UNION ALL of per-column SELECTs."""
    import pyarrow as pa
    import pyarrow.compute as pc

    def fn(t: pa.Table) -> pa.Table:
        n = t.num_rows
        parts = []
        for c in value_cols:
            cols = {k: t[k] for k in id_cols}
            cols[var_name] = pa.array([c] * n, pa.string())
            cols[value_name] = pc.cast(t[c], pa.float64())
            parts.append(pa.table(cols))
        return pa.concat_tables(parts)

    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)
