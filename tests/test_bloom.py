"""Oracles for engine/ops/bloom.py: no false negatives (Bloom property),
empirical FPR bound, and exactness of the bloom-prefiltered anti/semi
joins vs a pandas set-membership oracle."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest


@pytest.fixture(scope="module")
def overlap_data(ray_session):
    import ray.data as rd

    rng = np.random.default_rng(17)
    left_keys = np.array([f"u{i}" for i in rng.integers(0, 30_000, 20_000)], object)
    # right covers ~half the left key space
    right_keys = np.array([f"u{i}" for i in rng.integers(0, 15_000, 25_000)], object)
    left = rd.from_arrow(pa.table({
        "key": pa.array(list(left_keys), pa.string()),
        "val": np.arange(len(left_keys), dtype=np.int64),
    })).repartition(8).materialize()
    right = rd.from_arrow(pa.table({
        "rkey": pa.array(list(right_keys), pa.string()),
    })).repartition(8).materialize()
    return left, right, left_keys, right_keys


def test_no_false_negatives(overlap_data):
    """Every key that was inserted MUST test positive."""
    from engine.ops.bloom import _bit_positions, _test_bits, bloom_build

    _, right, _, right_keys = overlap_data
    bitmap = bloom_build(right, "rkey")
    m = len(bitmap) * 8
    uniq = np.unique(right_keys)
    assert _test_bits(bitmap, _bit_positions(uniq, m, 7)).all()


def test_fpr_bound(overlap_data):
    """Keys NEVER inserted should test positive at <= ~2x the theoretical
    FPR for 10 bits/key, k=7 (~0.8%)."""
    from engine.ops.bloom import _bit_positions, _test_bits, bloom_build

    _, right, _, right_keys = overlap_data
    bitmap = bloom_build(right, "rkey")
    m = len(bitmap) * 8
    absent = np.array([f"absent{i}" for i in range(50_000)], object)
    fpr = _test_bits(bitmap, _bit_positions(absent, m, 7)).mean()
    assert fpr < 0.02, fpr


def test_bloom_anti_join_exact(overlap_data):
    from engine.ops.bloom import bloom_anti_join

    left, right, left_keys, right_keys = overlap_data
    out = bloom_anti_join(left, right, on="key", right_on="rkey").to_pandas()
    rset = set(right_keys)
    expect = pd.DataFrame({"key": left_keys, "val": np.arange(len(left_keys))})
    expect = expect[~expect["key"].isin(rset)]
    got = out.sort_values("val").reset_index(drop=True)
    want = expect.sort_values("val").reset_index(drop=True)
    pd.testing.assert_frame_equal(got[["key", "val"]], want[["key", "val"]],
                                  check_dtype=False)


def test_bloom_semi_join_exact(overlap_data):
    from engine.ops.bloom import bloom_semi_join

    left, right, left_keys, right_keys = overlap_data
    out = bloom_semi_join(left, right, on="key", right_on="rkey").to_pandas()
    rset = set(right_keys)
    expect = pd.DataFrame({"key": left_keys, "val": np.arange(len(left_keys))})
    expect = expect[expect["key"].isin(rset)]
    assert sorted(out["val"]) == sorted(expect["val"])


def test_bloom_prefilter_shrinks_exchange(overlap_data):
    """The scale rationale: the candidate sliver entering the exact
    exchange must be ~|true matches| + fpr*|probe|, far below |probe|."""
    import ray

    from engine.ops.bloom import _bloom_split, bloom_build

    left, right, left_keys, right_keys = overlap_data
    bitmap = bloom_build(right, "rkey")
    tagged = _bloom_split(left, "key", ray.put(bitmap), len(bitmap) * 8, 7)
    hits = tagged.to_pandas()["__bloom_hit"]
    true_matches = pd.Series(left_keys).isin(set(right_keys)).sum()
    assert hits.sum() <= true_matches + 0.02 * len(left_keys)


def test_empty_right(ray_session):
    import ray.data as rd

    from engine.ops.bloom import bloom_anti_join

    left = rd.from_arrow(pa.table({"key": ["a", "b"], "val": [1, 2]}))
    right = rd.from_arrow(pa.table({"rkey": pa.array([], pa.string())}))
    out = bloom_anti_join(left, right, on="key", right_on="rkey").to_pandas()
    assert sorted(out["key"]) == ["a", "b"]
