"""Exact deduplication (SURVEY.md §2.5 D1) + content-hash dedup.

exact_dedup: hash-partition on the key columns (ONE shuffle), then keep
the first row per key in `order_by` order inside each partition —
equivalent to SQL ROW_NUMBER() OVER (PARTITION BY keys ORDER BY ...) = 1.

content_dedup: adds a vectorized content hash (md5 of a column) in
map_batches first, then exact_dedup on the hash — the pattern for
"same bytes" dedup at scale where the raw column is too wide to shuffle.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

from engine.ops.keys import stable_hash

_PKEY = "__pkey"


def exact_dedup(ds, keys, order_by=None, keep: str = "first", num_partitions: int | None = None):
    keys = [keys] if isinstance(keys, str) else list(keys)
    order_by = [order_by] if isinstance(order_by, str) else (list(order_by) if order_by else [])
    from engine.ops.partitioning import shuffle_partitions

    P = num_partitions or shuffle_partitions(ds)

    def add_pkey(t: pa.Table) -> pa.Table:
        h = np.zeros(t.num_rows, dtype=np.uint64)
        for k in keys:  # combine per-column stable hashes
            h = h * np.uint64(1000003) + stable_hash(t[k])
        return t.append_column(_PKEY, pa.array((h % np.uint64(P)).astype(np.int32)))

    def dd(t: pa.Table) -> pa.Table:
        # pyarrow in/out so EMPTY sort partitions keep their schema —
        # a pandas fn returns a column-less frame for them, and the
        # schema-less blocks break downstream joins/unions.
        t = t.drop_columns([_PKEY])
        if t.num_rows == 0:
            return t
        df = t.to_pandas()
        if order_by:
            df = df.sort_values(order_by, kind="stable")
        df = df.drop_duplicates(subset=keys, keep=keep)
        return pa.Table.from_pandas(df, schema=t.schema, preserve_index=False)

    return (
        ds.map_batches(add_pkey, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(_PKEY)
        .map_groups(dd, batch_format="pyarrow")
    )


def md5_column(ds, col: str, out: str = "content_md5"):
    """Vectorized-ish content hash (md5 is C per call); SQL oracle: md5(col)."""

    def add(t: pa.Table) -> pa.Table:
        vals = t[col].to_pylist()
        hs = [hashlib.md5(v.encode("utf-8") if isinstance(v, str) else v).hexdigest() for v in vals]
        return t.append_column(out, pa.array(hs, type=pa.string()))

    return ds.map_batches(add, batch_format="pyarrow", zero_copy_batch=True)


def content_dedup(ds, col: str, order_by=None, num_partitions: int | None = None):
    return exact_dedup(md5_column(ds, col), keys=["content_md5"], order_by=order_by,
                       num_partitions=num_partitions)
