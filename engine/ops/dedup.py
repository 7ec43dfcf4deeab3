"""Exact deduplication (SURVEY.md §2.5 D1) + content-hash dedup
+ C4-style corpus-level line dedup.

exact_dedup: hash-partition on the key columns (ONE shuffle), then keep
the first row per key in `order_by` order inside each partition —
equivalent to SQL ROW_NUMBER() OVER (PARTITION BY keys ORDER BY ...) = 1.

content_dedup: adds a vectorized content hash (md5 of a column) in
map_batches first, then exact_dedup on the hash — the pattern for
"same bytes" dedup at scale where the raw column is too wide to shuffle.

line_dedup: the C4 curation rule (Raffel et al. 2020 §2.2: discard all
but one occurrence of any line repeated across the corpus), expressed as
explode -> exact_dedup -> reassemble. Two exchanges total: one
hash-partition by LINE (the dedup) and one by DOC (the reassembly); both
per-partition kernels are vectorized (split_pattern explode, run-boundary
ListArray + pc.binary_join — no per-doc Python string joins).
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
        # pyarrow in/out so EMPTY sort partitions keep their schema (a
        # pandas fn returns a column-less frame for them, and the
        # schema-less blocks break downstream joins/unions) — and
        # Arrow-NATIVE throughout: the round-3 pandas round-trip boxed
        # every string key into Python objects per partition, which is
        # the hot path when line_dedup feeds the corpus-sized exploded
        # line table through here. String keys are dictionary-encoded
        # (C hash table) so the run-boundary compare is int-vs-int.
        t = t.drop_columns([_PKEY])
        n = t.num_rows
        if n == 0:
            return t

        def col_codes(name):
            col = t[name]
            if isinstance(col, pa.ChunkedArray):
                col = col.combine_chunks()
            typ = col.type
            if pa.types.is_string(typ) or pa.types.is_large_string(typ) \
                    or pa.types.is_binary(typ):
                import pyarrow.compute as pc

                # nulls -> one shared code (-1): pandas drop_duplicates
                # treated NaN keys as equal, keep that
                idx = pc.fill_null(col.dictionary_encode().indices, -1)
                return idx.to_numpy(zero_copy_only=False).astype(np.int64)
            return col.to_numpy(zero_copy_only=False)

        kc = [col_codes(c) for c in keys]
        oc = [col_codes(c) for c in order_by]
        # lexsort is stable, and np.arange final key pins input order on
        # full (keys+order_by) ties — same winner as the pandas stable
        # sort + drop_duplicates this replaces
        order = np.lexsort(tuple([np.arange(n)] + oc[::-1] + kc[::-1]))
        first = np.zeros(n, dtype=bool)
        first[0] = True
        for k in kc:
            ks = k[order]
            first[1:] |= ks[1:] != ks[:-1]
        if keep == "last":
            winner = order[np.append(np.flatnonzero(first)[1:], n) - 1]
        else:
            winner = order[first]
        return t.take(pa.array(np.sort(winner)))

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


def split_lines(ds, id_col: str = "doc_id", text_col: str = "text", sep: str = "\n",
                pos_col: str = "line_no", line_col: str = "line"):
    """Explode text into one row per line: (id, line_no, line). Map-only
    and fully vectorized (one pc.split_pattern per batch + repeat
    arithmetic — no per-doc Python split)."""
    import pyarrow.compute as pc

    def f(t: pa.Table) -> pa.Table:
        lists = pc.split_pattern(t[text_col], pattern=sep)
        if isinstance(lists, pa.ChunkedArray):
            lists = lists.combine_chunks()
        counts = pc.list_value_length(lists).to_numpy(zero_copy_only=False).astype(np.int64)
        total = int(counts.sum())
        reps = np.repeat(np.arange(t.num_rows), counts)
        starts = np.concatenate([[0], np.cumsum(counts)[:-1]])
        pos = np.arange(total) - np.repeat(starts, counts)
        return pa.table({
            id_col: t[id_col].take(pa.array(reps)),
            pos_col: pa.array(pos),
            line_col: lists.flatten(),
        })

    return ds.map_batches(f, batch_format="pyarrow", zero_copy_batch=True)


def reassemble_lines(lines, id_col: str = "doc_id", pos_col: str = "line_no",
                     line_col: str = "line", sep: str = "\n", out_col: str = "text",
                     n_col: str = "n_lines", num_partitions: int | None = None):
    """(id, pos, line) rows -> one (id, text, n_lines) row per doc with
    the surviving lines joined by `sep` in position order. One
    hash-partition-by-doc exchange; inside each partition the join is a
    run-boundary LargeListArray + pc.binary_join over the sorted rows —
    vectorized per PARTITION, not per doc. Docs whose every line was
    dropped upstream do not appear (no rows -> no group)."""
    import pyarrow.compute as pc

    from engine.ops.partitioning import shuffle_partitions

    P = num_partitions or shuffle_partitions(lines)

    def add_pkey(t: pa.Table) -> pa.Table:
        h = stable_hash(t[id_col])
        return t.append_column(_PKEY, pa.array((h % np.uint64(P)).astype(np.int32)))

    def join_docs(t: pa.Table) -> pa.Table:
        id_type = t.schema.field(id_col).type
        t = t.drop_columns([_PKEY])
        if t.num_rows == 0:
            return pa.table({id_col: pa.array([], id_type),
                             out_col: pa.array([], pa.string()),
                             n_col: pa.array([], pa.int64())})
        t = t.sort_by([(id_col, "ascending"), (pos_col, "ascending")])
        ids = t[id_col].combine_chunks()
        idn = ids.to_numpy(zero_copy_only=False)
        new = np.empty(len(idn), dtype=bool)
        new[0] = True
        np.not_equal(idn[1:], idn[:-1], out=new[1:])
        starts = np.flatnonzero(new)
        offsets = np.concatenate([starts, [len(idn)]]).astype(np.int64)
        vals = t[line_col].combine_chunks()
        lists = pa.LargeListArray.from_arrays(pa.array(offsets), vals)
        return pa.table({
            id_col: ids.take(pa.array(starts)),
            out_col: pc.binary_join(lists, sep).cast(pa.string()),
            n_col: pa.array(np.diff(offsets)),
        })

    return (lines.map_batches(add_pkey, batch_format="pyarrow", zero_copy_batch=True)
            .groupby(_PKEY).map_groups(join_docs, batch_format="pyarrow"))


def line_dedup(ds, id_col: str = "doc_id", text_col: str = "text", sep: str = "\n",
               keep: str = "first", num_partitions: int | None = None):
    """C4-style line dedup: keep ONE occurrence of every distinct line
    across the whole corpus (the (id, pos)-lexicographically first) and
    rebuild each doc from its surviving lines. -> Dataset(id, text,
    n_lines). SQL twin: ROW_NUMBER() OVER (PARTITION BY line ORDER BY
    id, pos) = 1, then string_agg(line, sep ORDER BY pos) GROUP BY id."""
    lines = split_lines(ds, id_col=id_col, text_col=text_col, sep=sep)
    kept = exact_dedup(lines, keys=["line"], order_by=[id_col, "line_no"], keep=keep,
                       num_partitions=num_partitions)
    return reassemble_lines(kept, id_col=id_col, sep=sep, out_col=text_col,
                            num_partitions=num_partitions)
