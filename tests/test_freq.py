"""Oracles for engine/ops/freq.py: Misra-Gries heavy hitters (exact vs
pandas value_counts on Zipf data) and t-digest quantiles (rank-error
bound vs the true empirical CDF)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest


def _zipf_keys(n=60_000, nkeys=5_000, a=1.3, seed=7):
    rng = np.random.default_rng(seed)
    z = rng.zipf(a, size=n)
    return np.array([f"k{min(int(v), nkeys)}" for v in z], dtype=object)


@pytest.fixture(scope="module")
def zipf_ds(ray_session):
    import ray.data as rd

    keys = _zipf_keys()
    t = pa.table({"key": pa.array(list(keys), pa.string())})
    # many small blocks so the MG combine tree actually merges summaries
    return rd.from_arrow(t).repartition(16).materialize(), keys


def test_heavy_hitters_exact_vs_value_counts(zipf_ds):
    from engine.ops.freq import heavy_hitters

    ds, keys = zipf_ds
    phi = 0.01
    out = heavy_hitters(ds, "key", phi=phi).to_pandas()
    vc = pd.Series(keys).value_counts()
    expect = vc[vc > phi * len(keys)]
    got = out.set_index("key")["cnt"].sort_index()
    assert sorted(got.index) == sorted(expect.index)
    # counts are EXACT (second pass), not sketch estimates
    for k in expect.index:
        assert got[k] == expect[k]


def test_heavy_hitters_no_false_negatives_small_k(zipf_ds):
    """Even with the minimum counter budget the MG guarantee holds:
    every key with freq > n/(k+1) must survive the candidate stage."""
    from engine.ops.freq import heavy_hitters

    ds, keys = zipf_ds
    phi = 0.05
    out = heavy_hitters(ds, "key", phi=phi, k=int(np.ceil(1 / phi))).to_pandas()
    vc = pd.Series(keys).value_counts()
    expect = set(vc[vc > phi * len(keys)].index)
    assert expect <= set(out["key"])


def test_heavy_hitters_empty(ray_session):
    import ray.data as rd

    from engine.ops.freq import heavy_hitters

    ds = rd.from_arrow(pa.table({"key": pa.array([], pa.string())}))
    assert heavy_hitters(ds, "key", phi=0.1).count() == 0


def test_mg_trim_guarantee():
    """Unit: after trimming to k counters, any key whose true count
    exceeds the subtracted mass is retained with a positive counter."""
    from engine.ops.freq import _mg_trim

    keys = np.array([f"k{i}" for i in range(100)], dtype=object)
    counts = np.arange(1, 101, dtype=np.int64)
    tk, tc = _mg_trim(keys, counts, 10)
    assert len(tk) <= 10
    # counts[i] = i+1, so the 10 counts above the subtracted 90-mass are
    # 91..100 at indices 90..99
    assert set(tk) == {f"k{i}" for i in range(90, 100)}
    assert (tc > 0).all()


def test_tdigest_rank_error(ray_session):
    import ray.data as rd

    from engine.ops.freq import approx_quantiles

    rng = np.random.default_rng(11)
    vals = rng.lognormal(0.0, 1.0, size=50_000)
    ds = rd.from_arrow(pa.table({"v": vals})).repartition(12).materialize()
    qs = np.array([0.01, 0.1, 0.25, 0.5, 0.75, 0.9, 0.99])
    est = approx_quantiles(ds, "v", qs, delta=200.0)
    svals = np.sort(vals)
    # rank error: where does the estimate land in the true CDF?
    ranks = np.searchsorted(svals, est) / len(svals)
    assert np.all(np.abs(ranks - qs) < 0.01), (ranks, qs)


def test_tdigest_exact_on_tiny(ray_session):
    """Digest of a tiny dataset holds every point as its own centroid:
    median of 1..5 is exact."""
    import ray.data as rd

    from engine.ops.freq import approx_quantiles

    ds = rd.from_arrow(pa.table({"v": [1.0, 2.0, 3.0, 4.0, 5.0]}))
    est = approx_quantiles(ds, "v", [0.5])
    assert abs(est[0] - 3.0) < 1e-9


def test_tdigest_merge_invariance(ray_session):
    """Partition count must not change the estimate beyond the error
    bound (the combine path is exercised at P=16 vs P=2)."""
    import ray.data as rd

    from engine.ops.freq import approx_quantiles

    rng = np.random.default_rng(3)
    vals = rng.normal(size=20_000)
    qs = [0.1, 0.5, 0.9]
    t = pa.table({"v": vals})
    e2 = approx_quantiles(rd.from_arrow(t).repartition(2).materialize(), "v", qs)
    e16 = approx_quantiles(rd.from_arrow(t).repartition(16).materialize(), "v", qs)
    svals = np.sort(vals)
    r2 = np.searchsorted(svals, e2) / len(svals)
    r16 = np.searchsorted(svals, e16) / len(svals)
    assert np.all(np.abs(r2 - qs) < 0.01)
    assert np.all(np.abs(r16 - qs) < 0.01)


def test_grouped_approx_quantiles_rank_error(ray_session):
    import duckdb
    import ray.data as rd

    from engine.ops.freq import grouped_approx_quantiles

    sf = "/root/testdata/sf0.001"
    got = (grouped_approx_quantiles(
        rd.read_parquet(f"{sf}/events.parquet", columns=["event_type", "value"]),
        "event_type", "value", qs=[0.1, 0.5, 0.99])
        .to_pandas().sort_values("event_type").reset_index(drop=True))
    con = duckdb.connect()
    df = con.execute(f"""
        SELECT event_type, list_sort(list(value)) AS vals
        FROM read_parquet('{sf}/events.parquet') GROUP BY event_type
        ORDER BY event_type""").df()
    assert got["event_type"].tolist() == df["event_type"].tolist()
    for (_, row), (_, ex) in zip(got.iterrows(), df.iterrows()):
        vals = np.asarray(ex["vals"])
        for q, col in [(0.1, "q100"), (0.5, "q500"), (0.99, "q990")]:
            est = row[col]
            rank = np.searchsorted(vals, est) / len(vals)
            assert abs(rank - q) < 0.02, (row["event_type"], q, rank)


def test_grouped_approx_quantiles_partition_invariance(ray_session):
    import ray.data as rd

    from engine.ops.freq import grouped_approx_quantiles

    rng = np.random.default_rng(3)
    df = pd.DataFrame({"g": [f"g{i}" for i in rng.integers(0, 3, 9000)],
                       "v": rng.normal(size=9000)})
    a = (grouped_approx_quantiles(rd.from_pandas(df).repartition(1), "g", "v", [0.5])
         .to_pandas().sort_values("g").reset_index(drop=True))
    b = (grouped_approx_quantiles(rd.from_pandas(df).repartition(9), "g", "v", [0.5])
         .to_pandas().sort_values("g").reset_index(drop=True))
    # different block splits -> different merge order; estimates agree to
    # digest resolution, not bit-exactly
    np.testing.assert_allclose(a["q500"], b["q500"], atol=0.05)
