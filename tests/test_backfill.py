"""Backfill grid + forward-fill + time-sliced W5 variant (SURVEY §2.4 W4/W5)."""

import duckdb
import numpy as np
import pandas as pd
import pytest

from engine.ops.backfill import asof_time_sliced, backfill, make_grid

SF = "/root/testdata/sf0.001"


def test_make_grid_spans(ray_session):
    import ray.data as rd

    ev = rd.read_parquet(f"{SF}/events.parquet")
    grid = make_grid(ev, entity="user_id", step_us=6 * 3600_000_000, cap=16).to_pandas()
    spans = (
        rd.read_parquet(f"{SF}/events.parquet")
        .to_pandas()
        .groupby("user_id")["ts"]
        .agg(["min", "max"])
    )
    for uid, g in grid.groupby("user_id"):
        assert g["ts"].min() == spans.loc[uid, "min"]
        assert len(g) <= 16
        assert g["ts"].is_monotonic_increasing or len(g) == 1


def test_backfill_forward_fills(ray_session):
    import ray.data as rd

    ev = rd.read_parquet(f"{SF}/events.parquet")
    grid = make_grid(ev, entity="user_id", step_us=6 * 3600_000_000, cap=16)
    got = (
        backfill(grid, ev, on="user_id", feature_cols=["value"], num_partitions=5)
        .to_pandas()
        .sort_values(["user_id", "ts"])
        .reset_index(drop=True)
    )
    # every grid point at/after the entity's first event has a fill
    first = ev.to_pandas().groupby("user_id")["ts"].min()
    has_hist = got["ts"] >= got["user_id"].map(first)
    assert got.loc[has_hist, "value_r"].notna().all()
    # oracle: duckdb asof join of materialized grid
    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM read_parquet('{SF}/events.parquet')")
    con.register("grid", grid.to_pandas())
    exp = con.execute("""
        SELECT g.user_id, g.ts, r.ts AS ts_r, r.value AS value_r
        FROM grid g ASOF LEFT JOIN events r
          ON g.user_id = r.user_id AND g.ts >= r.ts
        ORDER BY g.user_id, g.ts""").fetchdf()
    np.testing.assert_allclose(got["value_r"].to_numpy(), exp["value_r"].to_numpy(), rtol=1e-12)
    assert (got["ts_r"].to_numpy() == exp["ts_r"].to_numpy()).all() or (
        got["ts_r"].isna() == exp["ts_r"].isna()
    ).all()


def test_time_sliced_equals_entity_hash(ray_session):
    """W5: time-range partitioning with carry-in == entity-hash path."""
    import ray.data as rd
    import pyarrow.compute as pc

    from engine.ops.asof import asof_join

    ev = rd.read_parquet(f"{SF}/events.parquet")
    left = ev.map_batches(lambda t: t.filter(pc.equal(t["event_type"], "view")), batch_format="pyarrow")
    right = ev.map_batches(lambda t: t.filter(pc.equal(t["event_type"], "purchase")), batch_format="pyarrow")
    # interior cut points across the data's ts range
    tsmin, tsmax = ev.to_pandas()["ts"].agg(["min", "max"])
    cuts = pd.date_range(tsmin, tsmax, periods=6)[1:-1]
    bounds = [int(t.value // 1000) for t in cuts]
    got = (
        asof_time_sliced(left, right, on="user_id", boundaries_us=bounds, right_cols=["value"])
        .to_pandas()
        .sort_values("event_id")
        .reset_index(drop=True)
    )
    exp = (
        asof_join(left, right, on="user_id", right_cols=["value"], num_partitions=4)
        .to_pandas()
        .sort_values("event_id")
        .reset_index(drop=True)
    )
    assert (got["ts_r"].isna() == exp["ts_r"].isna()).all()
    m = got["ts_r"].notna()
    assert (got.loc[m, "ts_r"].to_numpy() == exp.loc[m, "ts_r"].to_numpy()).all()
    np.testing.assert_allclose(got.loc[m, "value_r"].to_numpy(), exp.loc[m, "value_r"].to_numpy())
