"""skew_join: hybrid hot-broadcast / cold-shuffle equi join parity
(planted Zipf skew — one key owns ~40% of the left side)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest


@pytest.fixture(scope="module")
def skewed(ray_session):
    import ray.data as rd

    rng = np.random.default_rng(31)
    n = 30_000
    # key 0 takes ~40% of rows; a few warm keys; long uniform tail
    u = rng.random(n)
    key = np.where(u < 0.4, 0, np.where(u < 0.55, rng.integers(1, 4, n),
                                        rng.integers(4, 2_000, n)))
    left = pd.DataFrame({"k": key.astype(np.int64), "lv": rng.normal(size=n)})
    right = pd.DataFrame({"rk": np.arange(1_500, dtype=np.int64),
                          "rv": rng.normal(size=1_500),
                          "lv": rng.normal(size=1_500)})  # name collision
    return (rd.from_pandas(left).repartition(8),
            rd.from_pandas(right).repartition(4), left, right)


def _expected(left, right, how):
    out = left.merge(right, left_on="k", right_on="rk", how=how,
                     suffixes=("", "_r")).drop(columns=["rk"])
    return out.sort_values(["k", "lv", "rv"], na_position="first").reset_index(drop=True)


@pytest.mark.parametrize("how", ["inner", "left"])
def test_skew_join_matches_pandas(skewed, how):
    from engine.ops.join import skew_join

    dl, dr, left, right = skewed
    got = (skew_join(dl, dr, on="k", right_on="rk", join_type=how, phi=0.05)
           .to_pandas()
           .sort_values(["k", "lv", "rv"], na_position="first").reset_index(drop=True))
    want = _expected(left, right, how)
    assert sorted(got.columns) == sorted(want.columns)
    got = got[sorted(got.columns)]
    want = want[sorted(want.columns)]
    assert len(got) == len(want)
    for c in got.columns:
        np.testing.assert_allclose(
            got[c].to_numpy(dtype=np.float64), want[c].to_numpy(dtype=np.float64),
            rtol=0, atol=0, err_msg=c)


def test_skew_join_uniform_falls_back(ray_session):
    """No heavy hitters -> pure cold path, still exact."""
    import ray.data as rd

    from engine.ops.join import skew_join

    rng = np.random.default_rng(5)
    left = pd.DataFrame({"k": rng.integers(0, 5_000, 10_000).astype(np.int64),
                         "lv": rng.normal(size=10_000)})
    right = pd.DataFrame({"k": np.arange(5_000, dtype=np.int64),
                          "rv": rng.normal(size=5_000)})
    got = (skew_join(rd.from_pandas(left), rd.from_pandas(right), on="k", phi=0.01)
           .to_pandas().sort_values(["k", "lv"]).reset_index(drop=True))
    want = (left.merge(right, on="k", how="inner")
            .sort_values(["k", "lv"]).reset_index(drop=True))
    assert len(got) == len(want)
    np.testing.assert_allclose(got["rv"].to_numpy(), want["rv"].to_numpy())


def test_skew_join_routes_hot_keys_outside_exchange(skewed):
    """The cold (shuffled) side must not contain the planted hot key."""
    from engine.ops.freq import heavy_hitters

    dl, _dr, left, _right = skewed
    hot = heavy_hitters(dl, "k", phi=0.05).to_pandas()
    assert 0 in set(hot["key"])  # the 40% key is found
    assert (hot["cnt"] > 0.05 * len(left)).all()


def test_skew_join_all_keys_hot(ray_session):
    """Tiny key universe (every key > phi share): the cold side is empty
    — the broadcast-only path must fire and stay exact (regression for
    the sf0.001 all-hot Acero crash)."""
    import ray.data as rd

    from engine.ops.join import skew_join

    rng = np.random.default_rng(2)
    left = pd.DataFrame({"k": rng.integers(0, 10, 2_000).astype(np.int64),
                         "lv": rng.normal(size=2_000)})
    right = pd.DataFrame({"k": np.arange(8, dtype=np.int64),
                          "rv": rng.normal(size=8)})
    got = (skew_join(rd.from_pandas(left).repartition(4), rd.from_pandas(right),
                     on="k", phi=0.01, join_type="left")
           .to_pandas().sort_values(["k", "lv"]).reset_index(drop=True))
    want = (left.merge(right, on="k", how="left")
            .sort_values(["k", "lv"]).reset_index(drop=True))
    assert len(got) == len(want)
    np.testing.assert_allclose(got["rv"].to_numpy(), want["rv"].to_numpy())


def test_join_empty_first_block_high_partitions(ray_session):
    """Regression for CORRECTNESS_r04 skew_join_events @ num_cpus=32.

    Ray 2.49's hash-shuffle broadcasts schemas via the FIRST block of
    each input; if that block is empty the broadcast is silently dropped
    and partitions that receive no data build 0-column tables — Acero
    then dies with ArrowInvalid 'No match ... FieldRef.Name(k)'. The
    engine installs engine/ray_patches.py at import; this test pins the
    exact failing regime: empty blocks FIRST, num_partitions >> non-empty
    blocks, so most aggregator partitions see only the schema broadcast.
    """
    import pyarrow as pa
    import ray
    import ray.data as rd

    from engine.ops.join import equi_join

    empty_l = pa.table({"k": pa.array([], pa.int64()), "v": pa.array([], pa.float64())})
    full_l = pa.table({"k": pa.array([1, 2, 3], pa.int64()), "v": pa.array([1.0, 2.0, 3.0])})
    empty_r = pa.table({"k": pa.array([], pa.int64()), "w": pa.array([], pa.float64())})
    full_r = pa.table({"k": pa.array([2, 3, 4], pa.int64()), "w": pa.array([4.0, 5.0, 6.0])})
    left = rd.from_arrow_refs([ray.put(empty_l)] * 6 + [ray.put(full_l)])
    right = rd.from_arrow_refs([ray.put(empty_r)] * 6 + [ray.put(full_r)])
    out = equi_join(left, right, "k", num_partitions=16).to_pandas()
    assert sorted(out["k"].tolist()) == [2, 3]


def test_skew_join_high_block_count_parity(skewed):
    """skew_join with block count >> CPU count (the 32-cpu driver regime
    scaled to the 4-cpu test session): the cold filters emit many empty
    blocks and the cold join runs at high num_partitions — must still be
    value-exact (ADVICE r4: the old parity tests only ran at
    repartition(8)/(4) and never hit the empty-block regime).

    num_partitions is 16, not 32: Ray 2.49's aggregator pool sizes actor
    CPU shares from the CLUSTER config, and 32 aggregators deadlock on
    the 4-CPU test session (verified: pure Dataset.join with
    num_partitions=32 hangs at 4 CPUs before any engine code runs);
    64 mostly-empty input blocks into 16 partitions still exercises
    partitions whose only input is the schema broadcast."""
    from engine.ops.join import skew_join

    dl, dr, left, right = skewed
    got = (skew_join(dl.repartition(64), dr.repartition(32), on="k",
                     right_on="rk", phi=0.05, num_partitions=16)
           .to_pandas()
           .sort_values(["k", "lv", "rv"], na_position="first").reset_index(drop=True))
    want = _expected(left, right, "inner")
    assert len(got) == len(want)
    got = got[sorted(got.columns)]
    want = want[sorted(want.columns)]
    for c in got.columns:
        np.testing.assert_allclose(
            got[c].to_numpy(dtype=np.float64), want[c].to_numpy(dtype=np.float64),
            rtol=0, atol=0, err_msg=c)
