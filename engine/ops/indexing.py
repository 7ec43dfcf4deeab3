"""Deterministic global row index (SURVEY.md §2.5 O1 extension — the
distributed zipWithIndex / ROW_NUMBER-over-everything layout op a
sharding or packing pipeline needs).

Semantics: sort by `by` (with optional tie-break columns; the composite
must be a total order for the index to be reproducible), then append
`idx` = 0-based global position. Equals SQL
``ROW_NUMBER() OVER (ORDER BY by...) - 1``.

Scale shape: ONE range-partitioned sort (the same exchange as any global
sort) and then a METADATA-ONLY prefix sum — per-block row counts come
from the materialized sort's block metadata, so the driver holds one
integer per block (no payload fetch, no second shuffle). The per-block
offsets can't be expressed inside `map_batches` (a batch doesn't know
which block it is), so the index-append runs as one raw Ray task per
block over the sorted block refs — the documented last-resort tier of
the SURVEY §2.6 custom-operator rule; each task is a single zero-copy
`append_column`.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def with_row_index(ds, by, idx_name: str = "idx"):
    """-> Dataset sorted by `by` with an appended int64 0-based global
    index column. `by`: str | list[str] (must be a total order)."""
    import ray
    import ray.data as rd

    keys = [by] if isinstance(by, str) else list(by)
    m = ds.sort(keys).materialize()

    pairs = [(ref, meta.num_rows or 0)
             for b in m.iter_internal_ref_bundles() for ref, meta in b.blocks]
    offsets = np.concatenate([[0], np.cumsum([n for _, n in pairs])[:-1]]).astype(np.int64)

    @ray.remote
    def add_idx(block, off: int) -> pa.Table:
        if not isinstance(block, pa.Table):  # pandas-block dataset
            block = pa.Table.from_pandas(block, preserve_index=False)
        return block.append_column(
            idx_name, pa.array(off + np.arange(block.num_rows, dtype=np.int64)))

    out_refs = [add_idx.remote(ref, int(off))
                for (ref, n), off in zip(pairs, offsets) if n > 0]
    if not out_refs:
        return m
    return rd.from_arrow_refs(out_refs)
