"""with_row_index: deterministic global index (pandas oracle +
partition invariance) and impute_mean null filling."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest


@pytest.mark.parametrize("nparts", [1, 4, 16])
def test_row_index_matches_argsort(ray_session, nparts):
    import ray.data as rd

    from engine.ops.indexing import with_row_index

    rng = np.random.default_rng(7)
    df = pd.DataFrame({"k": rng.permutation(5_000).astype(np.int64),
                       "v": rng.normal(size=5_000)})
    out = (with_row_index(rd.from_pandas(df).repartition(nparts), by="k")
           .to_pandas().sort_values("k").reset_index(drop=True))
    assert out["idx"].tolist() == list(range(5_000))
    np.testing.assert_allclose(
        out["v"].to_numpy(), df.sort_values("k")["v"].to_numpy())


def test_row_index_tie_break_composite(ray_session):
    import ray.data as rd

    from engine.ops.indexing import with_row_index

    df = pd.DataFrame({"k": [1, 1, 0, 0], "t": [2, 1, 2, 1]})
    out = (with_row_index(rd.from_pandas(df), by=["k", "t"])
           .to_pandas().sort_values("idx").reset_index(drop=True))
    assert list(zip(out["k"], out["t"])) == [(0, 1), (0, 2), (1, 1), (1, 2)]


def test_impute_mean_fills_with_global_mean(ray_session):
    import ray.data as rd

    from engine.ops.normalize import impute_mean

    df = pd.DataFrame({"id": np.arange(6, dtype=np.int64),
                       "x": [1.0, np.nan, 3.0, np.nan, 5.0, 7.0]})
    out = (impute_mean(rd.from_pandas(df).repartition(3), ["x"])
           .to_pandas().sort_values("id").reset_index(drop=True))
    want_mean = np.nanmean(df["x"].to_numpy())
    np.testing.assert_allclose(
        out["x"].to_numpy(), [1.0, want_mean, 3.0, want_mean, 5.0, 7.0])


def test_union_by_name_pads_typed_nulls(ray_session):
    import ray.data as rd

    from engine.ops.agg import union_by_name

    a = rd.from_pandas(pd.DataFrame({"id": np.array([1, 2], np.int64),
                                     "x": [1.5, 2.5]}))
    b = rd.from_pandas(pd.DataFrame({"id": np.array([3], np.int64),
                                     "y": ["s"]}))
    out = union_by_name(a, b).to_pandas().sort_values("id").reset_index(drop=True)
    assert sorted(out.columns) == ["id", "x", "y"]
    assert out["id"].tolist() == [1, 2, 3]
    assert out["x"].isna().tolist() == [False, False, True]
    assert out["y"].isna().tolist() == [True, True, False]


@pytest.mark.parametrize("nparts", [1, 8])
def test_grouped_string_agg_ordered(ray_session, nparts):
    import ray.data as rd

    from engine.ops.agg import grouped_string_agg

    rng = np.random.default_rng(3)
    n = 3_000
    df = pd.DataFrame({
        "k": rng.integers(0, 40, n).astype(np.int64),
        "ts": rng.permutation(n).astype(np.int64),
        "ev": rng.choice(list("abcd"), n),
    })
    got = (grouped_string_agg(rd.from_pandas(df).repartition(nparts),
                              "k", "ev", sep=">", order_by="ts")
           .to_pandas().sort_values("k").reset_index(drop=True))
    want = (df.sort_values(["k", "ts"])
            .groupby("k")["ev"].agg(lambda s: ">".join(s)).reset_index())
    assert got["k"].tolist() == want["k"].tolist()
    assert got["path" if "path" in got.columns else "agg"].tolist() == want["ev"].tolist()
