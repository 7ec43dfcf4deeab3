"""Oracles for engine/ops/rollup.py: ROLLUP vs a pandas grouping-sets
oracle; histogram vs numpy; partition invariance for both."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest


@pytest.fixture(scope="module")
def sales(ray_session):
    import ray.data as rd

    rng = np.random.default_rng(5)
    n = 5_000
    t = pa.table({
        "region": pa.array([f"r{i}" for i in rng.integers(0, 4, n)], pa.string()),
        "product": pa.array([f"p{i}" for i in rng.integers(0, 7, n)], pa.string()),
        "amount": rng.normal(100.0, 10.0, n),
    })
    return rd.from_arrow(t).repartition(6).materialize(), t.to_pandas()


def _pandas_rollup(df):
    fine = df.groupby(["region", "product"], as_index=False).agg(
        sum_value=("amount", "sum"), n=("amount", "size"))
    mid = df.groupby(["region"], as_index=False).agg(
        sum_value=("amount", "sum"), n=("amount", "size"))
    mid["product"] = None
    total = pd.DataFrame({"region": [None], "product": [None],
                          "sum_value": [df["amount"].sum()], "n": [len(df)]})
    return pd.concat([fine, mid, total], ignore_index=True)


def test_rollup_vs_pandas(sales):
    from engine.ops.rollup import rollup

    ds, df = sales
    got = rollup(ds, ["region", "product"], "amount").to_pandas()
    want = _pandas_rollup(df)
    key = ["region", "product"]
    got = got.sort_values(key, na_position="first").reset_index(drop=True)
    want = want.sort_values(key, na_position="first").reset_index(drop=True)
    assert len(got) == len(want)
    assert got[key].fillna("~").equals(want[key].fillna("~"))
    assert np.allclose(got["sum_value"], want["sum_value"])
    assert (got["n"].to_numpy() == want["n"].to_numpy()).all()


def test_rollup_partition_invariance(sales):
    from engine.ops.rollup import rollup

    ds, df = sales
    import ray.data as rd

    ds1 = rd.from_arrow(pa.Table.from_pandas(df, preserve_index=False))
    a = rollup(ds, ["region", "product"], "amount").to_pandas()
    b = rollup(ds1, ["region", "product"], "amount").to_pandas()
    key = ["region", "product"]
    a = a.sort_values(key, na_position="first").reset_index(drop=True)
    b = b.sort_values(key, na_position="first").reset_index(drop=True)
    assert np.allclose(a["sum_value"], b["sum_value"])
    assert (a["n"].to_numpy() == b["n"].to_numpy()).all()


def test_histogram_vs_numpy(sales):
    from engine.ops.rollup import histogram

    ds, df = sales
    got = histogram(ds, "amount", lo=60.0, hi=140.0, nbins=16).to_pandas()
    v = df["amount"].to_numpy()
    bins = np.clip(np.floor((v - 60.0) / 5.0), 0, 15).astype(np.int64)
    want = pd.Series(bins).value_counts().sort_index()
    got = got.set_index("bin")["cnt"].sort_index()
    assert (got.to_numpy() == want.to_numpy()).all()
    assert got.sum() == len(v)  # clamp semantics: every row lands in a bin


def test_histogram_nulls_skipped(ray_session):
    import ray.data as rd

    from engine.ops.rollup import histogram

    t = pa.table({"v": pa.array([1.0, None, 3.0, None, 9.5], pa.float64())})
    got = histogram(rd.from_arrow(t), "v", lo=0.0, hi=10.0, nbins=10).to_pandas()
    assert got["cnt"].sum() == 3
    assert set(got["bin"]) == {1, 3, 9}


def _pandas_cube(df):
    fine = df.groupby(["region", "product"], as_index=False).agg(
        sum_value=("amount", "sum"), n=("amount", "size"))
    by_r = df.groupby(["region"], as_index=False).agg(
        sum_value=("amount", "sum"), n=("amount", "size"))
    by_r["product"] = None
    by_p = df.groupby(["product"], as_index=False).agg(
        sum_value=("amount", "sum"), n=("amount", "size"))
    by_p["region"] = None
    total = pd.DataFrame({"region": [None], "product": [None],
                          "sum_value": [df["amount"].sum()], "n": [len(df)]})
    return pd.concat([fine, by_r, by_p, total], ignore_index=True)


def test_cube_vs_pandas(sales):
    from engine.ops.rollup import cube

    ds, df = sales
    got = cube(ds, ["region", "product"], "amount").to_pandas()
    want = _pandas_cube(df)
    key = ["region", "product"]
    got = got.sort_values(key, na_position="first").reset_index(drop=True)
    want = want.sort_values(key, na_position="first").reset_index(drop=True)
    assert len(got) == len(want)
    assert got[key].fillna("~").equals(want[key].fillna("~"))
    assert np.allclose(got["sum_value"], want["sum_value"])
    assert (got["n"].to_numpy() == want["n"].to_numpy()).all()


def test_cube_rejects_too_many_keys(sales):
    from engine.ops.rollup import cube

    ds, _df = sales
    with pytest.raises(ValueError, match="grouping sets"):
        cube(ds, ["a", "b", "c", "d", "e"], "amount")
