"""CSV / JSONL sources (SURVEY.md §2.2 S3 family; reference R1 was CSV
ingest of descriptor tables).

Thin, scale-honest wrappers over ray.data.read_csv / read_json:
- optional explicit pyarrow schema, enforced by a cast inside
  map_batches right after the read (reads stay streaming; a bad file
  fails the task, not the driver);
- `columns` pruning applied at read time where the reader supports it.
"""

from __future__ import annotations

import pyarrow as pa


def read_csv(paths, schema: pa.Schema | None = None, columns: list[str] | None = None,
             **kwargs):
    import ray.data as rd
    from pyarrow import csv as pacsv

    opts = {}
    if columns:
        opts["convert_options"] = pacsv.ConvertOptions(include_columns=columns)
    ds = rd.read_csv(paths, **opts, **kwargs)
    if schema is not None:
        want = pa.schema([schema.field(c) for c in (columns or schema.names)])

        def cast(t: pa.Table) -> pa.Table:
            return t.select(want.names).cast(want)

        ds = ds.map_batches(cast, batch_format="pyarrow", zero_copy_batch=True)
    return ds


def read_jsonl(paths, schema: pa.Schema | None = None, columns: list[str] | None = None,
               **kwargs):
    import ray.data as rd

    ds = rd.read_json(paths, **kwargs)
    if columns:
        ds = ds.select_columns(columns)
    if schema is not None:
        want = pa.schema([schema.field(c) for c in (columns or schema.names)])

        def cast(t: pa.Table) -> pa.Table:
            return t.select(want.names).cast(want)

        ds = ds.map_batches(cast, batch_format="pyarrow", zero_copy_batch=True)
    return ds
