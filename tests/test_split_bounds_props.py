"""Pure-kernel property tests (no Ray): split_assign bound arithmetic and
the tf-idf tokenization kernel vs a sequential Python reference."""

import numpy as np
import pyarrow as pa
from hypothesis import given, settings
from hypothesis import strategies as st

from engine.ops.agg import _hash_modulus, _hash_u64, _split_bounds
from engine.ops.textstats import _doc_term_codes

MOD64 = 18446744073709551616


@given(st.lists(st.floats(0.01, 1.0), min_size=1, max_size=6))
@settings(max_examples=200, deadline=None)
def test_split_bounds_monotone_and_covering(weights):
    total = sum(weights)
    fractions = {f"s{i}": w / total for i, w in enumerate(weights)}
    bounds = _split_bounds(fractions, MOD64)
    assert len(bounds) == len(fractions) - 1
    assert all(0 <= b < MOD64 for b in bounds)
    assert bounds == sorted(bounds)
    # every hash lands in exactly one bucket: searchsorted over the
    # interior bounds always yields a valid label index
    h = np.array([0, MOD64 - 1, MOD64 // 2], dtype=np.uint64)
    idx = np.searchsorted(np.array(bounds, dtype=np.uint64), h, side="right")
    assert (idx < len(fractions)).all()


@given(st.lists(st.integers(-2**62, 2**62), min_size=1, max_size=50))
@settings(max_examples=100, deadline=None)
def test_split_assignment_respects_bound_order(keys):
    fractions = {"train": 0.6, "val": 0.3, "test": 0.1}
    bounds = np.array(_split_bounds(fractions, _hash_modulus("splitmix64")),
                      dtype=np.uint64)
    h = _hash_u64(pa.array(keys, type=pa.int64()), "splitmix64")
    idx = np.searchsorted(bounds, h, side="right")
    labels = np.array(list(fractions))[idx]
    # sequential reference: first bound exceeding the hash wins
    for k, hv, lab in zip(keys, h, labels):
        want = "test"
        for name, b in zip(["train", "val"], bounds):
            if hv < b:
                want = name
                break
        assert lab == want, (k, hv)


@given(st.lists(st.text(alphabet="abc XY1.", min_size=0, max_size=40),
                min_size=1, max_size=12))
@settings(max_examples=150, deadline=None)
def test_doc_term_codes_matches_python_reference(texts):
    import re

    t = pa.table({"doc_id": pa.array(range(len(texts)), type=pa.int64()),
                  "text": pa.array(texts, type=pa.string())})
    got = _doc_term_codes(t, "doc_id", "text")
    want = {}
    for i, s in enumerate(texts):
        for w in re.split("[^a-z]+", s.lower()):
            if w:
                want[(i, w)] = want.get((i, w), 0) + 1
    if got is None:
        assert not want
        return
    u_doc, u_code, tf, dictionary = got
    terms = dictionary.to_pylist()
    have = {(int(d), terms[int(c)]): int(n) for d, c, n in zip(u_doc, u_code, tf)}
    assert have == want
