"""HyperLogLog approx-distinct sketch: error bound vs exact, merge law."""

import numpy as np
import pytest

from engine.ops.sketch import ApproxDistinct, _estimate, _registers_for, approx_distinct

SF = "/root/testdata/sf0.001"


def test_hll_error_bound_local():
    rng = np.random.default_rng(0)
    for n in (100, 5_000, 200_000):
        vals = rng.integers(0, 1 << 62, n)
        uniq = len(np.unique(vals))
        est = _estimate(_registers_for(vals, 12))
        assert abs(est - uniq) / uniq < 0.05, (n, uniq, est)


def test_hll_merge_is_union():
    rng = np.random.default_rng(1)
    a = rng.integers(0, 1 << 62, 10_000)
    b = rng.integers(0, 1 << 62, 10_000)
    ra, rb = _registers_for(a, 12), _registers_for(b, 12)
    merged = np.maximum(ra, rb)
    whole = _registers_for(np.concatenate([a, b]), 12)
    assert (merged == whole).all()


def test_approx_distinct_dataset(ray_session):
    import ray.data as rd

    ev = rd.read_parquet(f"{SF}/events.parquet", columns=["user_id", "event_type"])
    exact = len(ev.unique("user_id"))
    est = approx_distinct(ev, "user_id")
    assert abs(est - exact) / exact < 0.1, (exact, est)

    per_type = (
        ev.groupby("event_type")
        .aggregate(ApproxDistinct(on="user_id", alias_name="nd"))
        .to_pandas()
        .set_index("event_type")["nd"]
    )
    exact_per = (
        ev.to_pandas().groupby("event_type")["user_id"].nunique()
    )
    for et, e in exact_per.items():
        assert abs(per_type[et] - e) / e < 0.15, (et, e, per_type[et])


def test_grouped_hll_error_bound_and_partition_invariance(ray_session):
    import duckdb
    import ray.data as rd

    from engine.ops.sketch import ApproxDistinct

    sf = "/root/testdata/sf0.001"
    exact = duckdb.sql(
        f"SELECT event_type, COUNT(DISTINCT user_id) AS nd FROM "
        f"read_parquet('{sf}/events.parquet') GROUP BY event_type").df()
    ev = rd.read_parquet(f"{sf}/events.parquet", columns=["event_type", "user_id"])
    got = (ev.groupby("event_type")
             .aggregate(ApproxDistinct(on="user_id", alias_name="nd_users"))
             .to_pandas().sort_values("event_type").reset_index(drop=True))
    exact = exact.sort_values("event_type").reset_index(drop=True)
    assert got["event_type"].tolist() == exact["event_type"].tolist()
    for g, e in zip(got["nd_users"], exact["nd"]):
        assert abs(g - e) <= max(0.05 * e, 2), (g, e)

    again = (ev.repartition(13).groupby("event_type")
               .aggregate(ApproxDistinct(on="user_id", alias_name="nd_users"))
               .to_pandas().sort_values("event_type").reset_index(drop=True))
    assert got["nd_users"].tolist() == again["nd_users"].tolist()
