"""Oracles for the round-3 curation ops: sequence packing invariants,
decontamination parity vs a brute-force set intersection, and
RepetitionStats parity vs a per-doc Counter reference."""

from __future__ import annotations

import re
from collections import Counter

import numpy as np
import pyarrow as pa
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from engine.ops.decontam import gram_strings_batch
from engine.ops.pack import greedy_boundaries
from engine.ops.textstats import RepetitionStats

WORDS = ["the", "cat", "sat", "on", "mat", "dog", "ran", "fast", "\n", "  "]


def _greedy_ref(tokens, budget):
    """Per-doc reference: start a new sequence when the doc won't fit."""
    starts, acc = [], None
    for i, tk in enumerate(tokens):
        if acc is None or acc + tk > budget:
            starts.append(i)
            acc = tk
        else:
            acc += tk
    return starts


@given(st.lists(st.integers(min_value=0, max_value=40), max_size=60),
       st.integers(min_value=1, max_value=64))
@settings(max_examples=200, deadline=None)
def test_greedy_boundaries_matches_reference(tokens, budget):
    got = greedy_boundaries(np.asarray(tokens, dtype=np.int64), budget)
    assert got.tolist() == _greedy_ref(tokens, budget)


def test_pack_sequences_invariants(ray_session):
    import ray.data as rd

    from engine.ops.pack import pack_sequences, sequence_stats

    rng = np.random.default_rng(7)
    n, budget = 2000, 128
    toks = rng.integers(1, 200, size=n)  # some docs exceed the budget
    ds = rd.from_arrow(pa.table({"doc_id": np.arange(n), "n_tokens": toks}))
    packed = pack_sequences(ds, max_tokens=budget, num_partitions=8).to_pandas()

    # every doc exactly once, token counts preserved
    assert sorted(packed["doc_id"]) == list(range(n))
    merged = packed.set_index("doc_id").sort_index()
    assert (merged["n_tokens"].to_numpy() == toks).all()
    # no sequence over budget unless it is a single oversize doc
    by_seq = packed.groupby("seq_id")
    tot = by_seq["n_tokens"].sum()
    ndocs = by_seq["doc_id"].count()
    over = tot[tot > budget]
    assert (ndocs[over.index] == 1).all()
    assert packed.loc[packed["truncated"], "n_tokens"].gt(budget).all()
    # seq_pos is a contiguous 0-based run within each sequence
    for _sid, grp in packed.groupby("seq_id"):
        assert sorted(grp["seq_pos"]) == list(range(len(grp)))
    # deterministic across runs
    again = pack_sequences(ds, max_tokens=budget, num_partitions=8).to_pandas()
    pd_sorted = lambda d: d.sort_values(["doc_id"]).reset_index(drop=True)  # noqa: E731
    assert pd_sorted(again).equals(pd_sorted(packed))
    # stats roll-up agrees with the assignment
    stats = sequence_stats(
        rd.from_arrow(pa.Table.from_pandas(packed, preserve_index=False)),
        max_tokens=budget).to_pandas().set_index("seq_id").sort_index()
    assert (stats["total_tokens"].sort_index() == tot.sort_index()).all()
    assert (stats["fill_ratio"] <= 1.0).all()


def test_decontaminate_drops_exactly_contaminated_docs(ray_session):
    import ray.data as rd

    from engine.ops.decontam import decontaminate, ngram_contamination, benchmark_gram_set

    bench_texts = ["alpha beta gamma delta", "solo"]
    train_texts = [
        "zero overlap here at all",          # clean
        "prefix alpha beta gamma suffix",    # shares 3-gram "alpha beta gamma"
        "beta gamma nope",                   # only a 2-gram overlap -> clean
        "solo",                              # short-doc whole-sequence gram
        "xx solo yy",                        # 'solo' only as part of 3-grams -> clean
    ]
    bench = rd.from_arrow(pa.table({"doc_id": [100, 101], "text": bench_texts}))
    train = rd.from_arrow(pa.table({"doc_id": list(range(5)), "text": train_texts}))

    kept = decontaminate(train, bench).to_pandas()
    assert sorted(kept["doc_id"]) == [0, 2, 4]

    stats = ngram_contamination(
        train, benchmark_gram_set(bench)).to_pandas().set_index("doc_id")
    assert stats.loc[1, "n_hits"] == 1 and bool(stats.loc[1, "contaminated"])
    assert stats.loc[3, "n_hits"] == 1
    assert stats.loc[0, "n_hits"] == 0 and not bool(stats.loc[0, "contaminated"])


@given(st.lists(st.lists(st.sampled_from(WORDS), max_size=30).map(" ".join), max_size=12))
@settings(max_examples=100, deadline=None)
def test_repetition_stats_parity(texts):
    t = pa.table({"doc_id": pa.array(range(len(texts)), type=pa.int64()),
                  "text": pa.array(texts, type=pa.string())})
    out = RepetitionStats()(t).to_pandas()
    for i, text in enumerate(texts):
        lines = [l for l in text.split("\n") if len(l) > 0]
        lc = Counter(lines)
        w = [x for x in re.split(r"\s+", text) if x]
        grams = Counter(" ".join(w[j:j + 2]) for j in range(len(w) - 1))
        exp = (
            len(lines),
            sum(len(l) for l in lines),
            sum(c for c in lc.values() if c >= 2),
            sum(c * len(l) for l, c in lc.items() if c >= 2),
            max((c * len(g) for g, c in grams.items()), default=0),
        )
        got = tuple(int(out.iloc[i][c]) for c in
                    ["n_lines", "n_line_chars", "n_dup_lines",
                     "dup_line_chars", "top2gram_chars"])
        assert got == exp, (i, repr(text))


@given(st.lists(st.text(alphabet=" ab\nc\t", max_size=25), max_size=8),
       st.integers(min_value=1, max_value=4))
@settings(max_examples=100, deadline=None)
def test_gram_strings_parity(texts, k):
    col = pa.array(texts, type=pa.string())
    g, d = gram_strings_batch(col, k)
    got = {}
    for gr, dd in zip(g.to_pylist(), d):
        got.setdefault(int(dd), []).append(gr)
    for i, text in enumerate(texts):
        w = [x for x in re.split(r"\s+", text) if x]
        if len(w) >= k:
            exp = [" ".join(w[j:j + k]) for j in range(len(w) - k + 1)]
        else:
            exp = [" ".join(w)]
        assert sorted(got.get(i, [])) == sorted(exp), (i, repr(text))
