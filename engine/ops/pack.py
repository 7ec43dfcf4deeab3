"""Sequence packing for LLM training-data assembly: pack documents into
fixed token-budget sequences (each output sequence's total token count
<= max_tokens; docs longer than the budget get a sequence of their own,
flagged truncated).

Ray-Data-first shape: packing is PARTITION-LOCAL — docs are
hash-partitioned by id (one shuffle whose key can be shared with the
dedup/groupby stages), each partition packs its own docs in sorted-id
order, and sequence ids are made globally unique by offsetting with the
partition key.  Global bin packing is deliberately NOT attempted: at
10^12 docs an optimal packing saves a few percent of padding but costs
an all-to-all coordination step; partition-local greedy is the standard
scale answer and its fill ratio converges fast with partition size.

Greedy sequential packing is inherently a recursion (the next boundary
depends on the previous one), but the loop here is per OUTPUT SEQUENCE,
not per doc: boundary i+1 = searchsorted(cumsum, cumsum[b_i] + budget),
so a group of D docs costs O(S log D) with S = number of sequences
(S << D when docs are much shorter than the budget).  No per-row
Python.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

_PKEY = "__pack_part"


def greedy_boundaries(tokens: np.ndarray, budget: int) -> np.ndarray:
    """Start indices of each greedy sequence over docs taken in order.
    Oversize docs (> budget) always isolate: the jump past them lands
    exactly one past their index."""
    cum = np.concatenate([[0], np.cumsum(tokens, dtype=np.int64)])
    starts = []
    b = 0
    n = tokens.size
    while b < n:
        starts.append(b)
        nxt = int(np.searchsorted(cum, cum[b] + budget, side="right")) - 1
        b = nxt if nxt > b else b + 1
    return np.asarray(starts, dtype=np.int64)


def pack_sequences(ds, max_tokens: int, id_col: str = "doc_id",
                   tok_col: str = "n_tokens", num_partitions: int = 64):
    """-> Dataset(id_col, seq_id, seq_pos, n_tokens, truncated): every
    input doc assigned to exactly one sequence.  seq_id is globally
    unique (partition_key * 2^40 + local index); seq_pos is the doc's
    0-based slot within its sequence.  Deterministic for a given
    (input, num_partitions): partition by SipHash(id) % P, pack in
    sorted-id order within the partition."""
    def key(t: pa.Table) -> pa.Table:
        ids = t[id_col]
        h = pd.util.hash_array(np.asarray(ids)) % np.uint64(num_partitions)
        return t.append_column(_PKEY, pa.array(h.astype(np.int64)))

    def pack_group(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:  # empty exchange partition (sort-based groupby)
            return pa.table({
                id_col: t[id_col] if id_col in t.schema.names
                else pa.chunked_array([], type=pa.int64()),
                "seq_id": pa.chunked_array([], type=pa.int64()),
                "seq_pos": pa.chunked_array([], type=pa.int64()),
                "n_tokens": pa.chunked_array([], type=pa.int64()),
                "truncated": pa.chunked_array([], type=pa.bool_()),
            })
        idx = pa.compute.sort_indices(t, sort_keys=[(id_col, "ascending")])
        t = t.take(idx)
        toks = np.clip(t[tok_col].to_numpy(zero_copy_only=False).astype(np.int64), 0, None)
        pkey = int(t[_PKEY][0].as_py())
        starts = greedy_boundaries(toks, max_tokens)
        n = toks.size
        sizes = np.diff(np.append(starts, n))
        seq_local = np.repeat(np.arange(starts.size, dtype=np.int64), sizes)
        seq_pos = np.arange(n, dtype=np.int64) - np.repeat(starts, sizes)
        return pa.table({
            id_col: t[id_col],
            "seq_id": pa.array(pkey * (1 << 40) + seq_local),
            "seq_pos": pa.array(seq_pos),
            "n_tokens": pa.array(toks),
            "truncated": pa.array(toks > max_tokens),
        })

    keyed = ds.map_batches(key, batch_format="pyarrow")
    return keyed.groupby(_PKEY).map_groups(pack_group, batch_format="pyarrow")


def sequence_stats(packed, max_tokens: int):
    """Per-sequence roll-up -> Dataset(seq_id, n_docs, total_tokens,
    fill_ratio).  One small groupby over the packed assignment."""
    from ray.data.aggregate import Count, Sum

    agg = packed.groupby("seq_id").aggregate(
        Count(alias_name="n_docs"), Sum("n_tokens", alias_name="total_tokens"))

    def fr(t: pa.Table) -> pa.Table:
        tot = t["total_tokens"].to_numpy(zero_copy_only=False).astype(np.float64)
        return t.append_column(
            "fill_ratio", pa.array(np.round(np.minimum(tot / max_tokens, 1.0), 6)))

    return agg.map_batches(fr, batch_format="pyarrow")
