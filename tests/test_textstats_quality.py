"""Parity oracle for the vectorized QualityScorer stopword ratio.

The round-2 QualityScorer computed the stopword ratio with a per-doc
Python loop (`[A-Za-z]+` findall, lowercase, membership count).  The
round-3 rewrite vectorizes it via split_pattern_regex + segment sums.
This test keeps the old loop as the bit-exact oracle.
"""

import re

import numpy as np
import pyarrow as pa

from engine.ops.textstats import STOPWORDS, QualityScorer

_WORD = re.compile(r"[A-Za-z]+")


def _loop_quality(texts):
    """Round-2 per-doc reference implementation (full component set)."""
    rows = []
    for x in texts:
        n_chars = len(x)
        n_space = len(re.findall(r"\s", x))
        n_nonspace = n_chars - n_space
        n_digits = len(re.findall(r"[0-9]", x))
        n_punct = len(re.findall(r"[^\sA-Za-z0-9]", x))
        words = [w.lower() for w in _WORD.findall(x)]
        stop_ratio = (sum(w in STOPWORDS for w in words) / len(words)) if words else 0.0
        nz = max(n_nonspace, 1)
        score = (
            0.25 * min(n_chars / 500.0, 1.0)
            + 0.25 * (1.0 - n_digits / nz)
            + 0.25 * (1.0 - n_punct / nz)
            + 0.25 * min(stop_ratio * 2.0, 1.0)
        )
        rows.append((n_chars, n_nonspace, n_digits, n_punct, round(score, 6)))
    return rows


TEXTS = [
    "The quick brown fox jumps over the lazy dog.",
    "",
    "   ",
    "!!! ??? ... ---",
    "the the the and and of",
    "12345 67890",
    "a",
    "word",
    "Mixed CASE With The And OF stopwords in IT",
    "tab\tseparated\nnewline  double  space",
    "punct,punct;punct:mixed-with-words the end",
    "x" * 600 + " the of and",  # len_norm saturation
    "numbers 123 mixed 456 with 789 words the",
]


def test_quality_scorer_matches_loop_reference():
    t = pa.table({"doc_id": list(range(len(TEXTS))), "text": TEXTS})
    out = QualityScorer()(t)
    ref = _loop_quality(TEXTS)
    got = list(zip(
        out["n_chars"].to_pylist(),
        out["n_nonspace"].to_pylist(),
        out["n_digits"].to_pylist(),
        out["n_punct"].to_pylist(),
        out["quality_score"].to_pylist(),
    ))
    for i, (g, r) in enumerate(zip(got, ref)):
        assert g[:4] == r[:4], f"doc {i}: components {g[:4]} != {r[:4]}"
        assert np.isclose(g[4], r[4], atol=1e-9), f"doc {i}: score {g[4]} != {r[4]}"


def test_quality_scorer_sliced_and_chunked_input():
    # .values + raw offsets must survive sliced / chunked ChunkedArrays
    big = pa.table({"doc_id": list(range(len(TEXTS))), "text": TEXTS})
    sliced = big.slice(3, 6)
    out = QualityScorer()(sliced)
    ref = _loop_quality(TEXTS[3:9])
    assert out["n_punct"].to_pylist() == [r[3] for r in ref]
    assert np.allclose(out["quality_score"].to_pylist(), [r[4] for r in ref], atol=1e-9)

    chunked = pa.table({
        "doc_id": pa.chunked_array([list(range(5)), list(range(5, len(TEXTS)))]),
        "text": pa.chunked_array([TEXTS[:5], TEXTS[5:]]),
    })
    out2 = QualityScorer()(chunked)
    ref2 = _loop_quality(TEXTS)
    assert np.allclose(out2["quality_score"].to_pylist(), [r[4] for r in ref2], atol=1e-9)
