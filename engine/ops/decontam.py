"""Benchmark decontamination (GPT-3 appendix-C style): drop or flag
training documents that share a word n-gram with a benchmark/eval set.

Ray-Data-first shape: the benchmark side is SMALL by definition (eval
sets are thousands of docs, the training corpus is billions), so its
distinct-gram set is collected once, sorted, `ray.put` once, and every
filter task reads it zero-copy from the object store — no shuffle
touches the 100-TB side.  The training side is one `map_batches` pass:
gram construction is fully vectorized (one RE2 split per batch, window
joins via `pc.binary_join_element_wise`, per-doc dedup via one lexsort
of 64-bit gram hashes), membership is one `pc.is_in` per batch against
the broadcast value set.  Gram STRINGS (not hashes) are compared, so
the result is value-exact against the DuckDB oracle — hashes are used
only for per-doc distinctness.

Gram definition (shared with the `ngram_jaccard_near_dup` oracle):
tokens = non-empty segments of a `\\s+` split; docs with >= k tokens
emit every k-token window joined by a single space; shorter docs emit
their whole token sequence joined by a single space (possibly '').
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc


def _kept_tokens(col: pa.Array):
    """(flat tokens StringArray, offs int64[n+1], doc_of int64[F]) of the
    non-empty whitespace tokens of a string column — one RE2 split, one
    length mask, no per-row Python."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    if pa.types.is_large_string(col.type):
        col = col.cast(pa.string())  # keep 32-bit offsets end to end
    n = len(col)
    words = pc.split_pattern_regex(col, r"\s+")
    if isinstance(words, pa.ChunkedArray):
        words = words.combine_chunks()
    woffs = words.offsets.to_numpy().astype(np.int64)
    flat = words.values.slice(woffs[0], woffs[-1] - woffs[0])
    woffs = woffs - woffs[0]
    nonempty = pc.greater(pc.utf8_length(flat), 0)
    ne = nonempty.to_numpy(zero_copy_only=False).astype(np.int64)
    cum = np.zeros(len(flat) + 1, np.int64)
    np.cumsum(ne, out=cum[1:])
    offs = cum[woffs]
    kept = flat.filter(nonempty)
    doc_of = np.repeat(np.arange(n, dtype=np.int64), np.diff(offs))
    return kept, offs, doc_of


def gram_strings_batch(col, k: int = 3):
    """All word-k-gram STRINGS of a string column, vectorized:
    (grams StringArray[G], gram_doc int64[G]).  Non-distinct — one gram
    per window position; short docs contribute one whole-sequence gram
    (matching DuckDB ``array_to_string(w, ' ')``, '' for empty docs)."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    n = len(col)
    if n == 0:
        return pa.array([], type=pa.string()), np.empty(0, np.int64)
    kept, offs, doc_of = _kept_tokens(col)
    ntok = np.diff(offs)
    F = len(kept)
    parts, docs = [], []
    win = F - k + 1
    if win > 0:
        valid = doc_of[:win] == doc_of[k - 1:]
        if valid.any():
            shifted = [kept.slice(j, win).filter(pa.array(valid)) for j in range(k)]
            parts.append(pc.binary_join_element_wise(*shifted, " "))
            docs.append(doc_of[:win][valid])
    short = np.nonzero(ntok < k)[0]
    if short.size:
        # whole-token-sequence gram for short docs via one list join
        sel_offs = np.concatenate([[0], np.cumsum(ntok[short])])
        idx = np.repeat(offs[short], ntok[short]) + (
            np.arange(int(ntok[short].sum())) - np.repeat(sel_offs[:-1], ntok[short]))
        sub = kept.take(pa.array(idx)) if idx.size else kept.slice(0, 0)
        lst = pa.ListArray.from_arrays(pa.array(sel_offs, type=pa.int32()), sub)
        parts.append(pc.binary_join(lst, " "))
        docs.append(short)
    if not parts:
        return pa.array([], type=pa.string()), np.empty(0, np.int64)
    grams = pa.concat_arrays([p.combine_chunks() if isinstance(p, pa.ChunkedArray) else p
                              for p in parts])
    return grams, np.concatenate(docs)


def _distinct_doc_grams(col, k: int):
    """(grams, gram_doc) deduplicated per document (distinct semantics).
    Dedup key is a 64-bit SipHash of the gram — strings themselves are
    never sorted; collision within one doc is the only failure mode."""
    grams, gdoc = gram_strings_batch(col, k)
    if len(grams) == 0:
        return grams, gdoc
    gh = pd.util.hash_array(np.asarray(grams))
    order = np.lexsort((gh, gdoc))
    d, h = gdoc[order], gh[order]
    keep = np.empty(d.size, bool)
    keep[0] = True
    keep[1:] = (d[1:] != d[:-1]) | (h[1:] != h[:-1])
    sel = order[keep]
    return grams.take(pa.array(sel)), gdoc[sel]


def benchmark_gram_set(bench_ds, text_col: str = "text", k: int = 3) -> pa.Array:
    """Distinct grams of the (small) benchmark set as one sorted Arrow
    string array, ready for `ray.put`.  Streams batches through the
    vectorized gram builder; only the DISTINCT gram set ever lands on
    the driver (eval sets are tiny next to the training corpus)."""
    seen: set[str] = set()
    for b in bench_ds.iter_batches(batch_format="pyarrow", batch_size=4096):
        grams, _ = gram_strings_batch(b[text_col], k)
        seen.update(grams.to_pylist())
    return pa.array(sorted(seen), type=pa.string())


def ngram_contamination(ds, bench_grams, id_col: str = "doc_id",
                        text_col: str = "text", k: int = 3):
    """Per-doc contamination stats against a broadcast benchmark gram
    set -> Dataset(id_col, n_hits, contaminated).  `n_hits` counts the
    DISTINCT grams of the doc found in the benchmark set (matching the
    SQL `COUNT(*)` over a distinct-gram semi-join).  One map_batches
    pass; membership test is a single `pc.is_in` per batch."""
    import ray

    ref = bench_grams if isinstance(bench_grams, ray.ObjectRef) else ray.put(bench_grams)

    def fn(t: pa.Table) -> pa.Table:
        bg = ray.get(ref)
        grams, gdoc = _distinct_doc_grams(t[text_col], k)
        n = len(t)
        if len(grams):
            hit = pc.is_in(grams, value_set=bg).to_numpy(zero_copy_only=False)
            hits = np.bincount(gdoc[hit], minlength=n).astype(np.int64)
        else:
            hits = np.zeros(n, np.int64)
        return pa.table({
            id_col: t[id_col],
            "n_hits": pa.array(hits),
            "contaminated": pa.array(hits > 0),
        })

    return ds.map_batches(fn, batch_format="pyarrow")


def decontaminate(ds, bench_ds, id_col: str = "doc_id", text_col: str = "text",
                  k: int = 3):
    """Remove training docs sharing any word-k-gram with `bench_ds`
    (GPT-3-style eval decontamination) -> filtered Dataset with the
    input schema.  The benchmark side is reduced to its distinct-gram
    set and broadcast once; the training side streams."""
    import ray

    ref = ray.put(benchmark_gram_set(bench_ds, text_col, k))

    def flt(t: pa.Table) -> pa.Table:
        bg = ray.get(ref)
        grams, gdoc = gram_strings_batch(t[text_col], k)
        clean = np.ones(len(t), bool)
        if len(grams):
            hit = pc.is_in(grams, value_set=bg).to_numpy(zero_copy_only=False)
            clean[np.unique(gdoc[hit])] = False
        return t.filter(pa.array(clean))

    return ds.map_batches(flt, batch_format="pyarrow")
