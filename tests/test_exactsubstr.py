"""Exact-substring dedup oracles: engine output must equal a brute-force
all-pairs all-diagonals reference for matches >= the winnowing guarantee
length; degenerate fingerprint buckets must stay bounded."""

import numpy as np
import pandas as pd
import pytest

from engine.ops.exactsubstr import (_anchor_arrays, _utf8_views,
                                    exact_substring_dup, winnow_anchors)


def _brute_maximal(a: str, b: str, min_len: int) -> set:
    """All maximal common substrings >= min_len between two docs:
    vectorized equality scan per alignment diagonal."""
    la = np.frombuffer(a.encode(), np.uint8)
    lb = np.frombuffer(b.encode(), np.uint8)
    out = set()
    for diag in range(-(lb.size - 1), la.size):
        i0 = max(0, diag)
        j0 = i0 - diag
        m = min(la.size - i0, lb.size - j0)
        if m < min_len:
            continue
        eq = (la[i0 : i0 + m] == lb[j0 : j0 + m]).astype(np.int8)
        idx = np.flatnonzero(np.diff(np.concatenate([[0], eq, [0]])))
        for s, e in zip(idx[::2], idx[1::2]):
            if e - s >= min_len:
                out.add((int(i0 + s), int(j0 + s), int(e - s)))
    return out


def _rand_text(rng, n: int) -> str:
    return "".join(chr(c) for c in rng.integers(97, 123, n))


@pytest.fixture(scope="module")
def planted_docs():
    rng = np.random.default_rng(42)
    docs = [_rand_text(rng, 400) for _ in range(8)]
    shared80 = _rand_text(rng, 80)
    docs[0] = docs[0][:100] + shared80 + docs[0][100:]
    docs[5] = docs[5][:250] + shared80 + docs[5][250:]
    shared20 = _rand_text(rng, 20)
    docs[1] = docs[1][:50] + shared20 + docs[1][50:]
    docs[2] = docs[2][:300] + shared20 + docs[2][300:]
    # a three-way shared block
    shared40 = _rand_text(rng, 40)
    for d in (3, 4, 6):
        docs[d] = docs[d][:10 * d] + shared40 + docs[d][10 * d:]
    return pd.DataFrame({"doc_id": np.arange(8, dtype=np.int64), "text": docs})


def test_exact_substring_matches_bruteforce(ray_session, planted_docs):
    import ray.data as rd

    k, w, min_len = 8, 9, 16  # guarantee k+w-1 = 16 = min_len -> exact
    got = exact_substring_dup(rd.from_pandas(planted_docs).repartition(3),
                              k=k, w=w, min_len=min_len).to_pandas()
    found = {(int(r["a"]), int(r["b"]), int(r["pos_a"]), int(r["pos_b"]), int(r["length"]))
             for _, r in got.iterrows()}
    exp = set()
    docs = planted_docs["text"].tolist()
    for i in range(len(docs)):
        for j in range(i + 1, len(docs)):
            for pa0, pb0, ln in _brute_maximal(docs[i], docs[j], min_len):
                exp.add((i, j, pa0, pb0, ln))
    assert found == exp
    # the planted blocks are all present
    lengths = sorted(got["length"].tolist(), reverse=True)
    assert lengths[0] >= 80 and 40 in lengths and 20 in lengths


def test_anchor_batch_matches_per_doc(planted_docs):
    import pyarrow as pa

    texts = planted_docs["text"].tolist() + ["", "ab", "x" * 7, "y" * 8]
    col = pa.array(texts, pa.string())
    offs, data = _utf8_views(col)
    docs, pos, fp = _anchor_arrays(data, offs, 8, 9)
    got = {}
    for d, p, f in zip(docs, pos, fp):
        got.setdefault(int(d), []).append((int(p), int(f)))
    for i, tx in enumerate(texts):
        exp = winnow_anchors(tx, 8, 9)
        assert got.get(i, []) == exp, f"doc {i}"


def test_exact_substring_degenerate_bucket(ray_session):
    """3000 docs sharing one 64-byte boilerplate block: star-capped
    candidate emission must keep this bounded (no O(n^2) pair list)."""
    import ray.data as rd

    rng = np.random.default_rng(7)
    boiler = _rand_text(rng, 64)
    docs = [_rand_text(rng, 40) + boiler + _rand_text(rng, 40) for _ in range(3000)]
    df = pd.DataFrame({"doc_id": np.arange(3000, dtype=np.int64), "text": docs})
    out = exact_substring_dup(rd.from_pandas(df).repartition(4),
                              k=8, w=9, min_len=16, max_bucket=64).to_pandas()
    # star semantics: every doc is connected to the min doc of its bucket
    assert len(out) >= 2999
    assert (out["length"] >= 64).sum() >= 2999
    touched = set(out["a"]) | set(out["b"])
    assert len(touched) == 3000


def test_min_len_below_guarantee_rejected():
    import ray.data as rd  # noqa: F401

    with pytest.raises(ValueError, match="guarantee"):
        exact_substring_dup(None, k=16, w=17, min_len=20)
