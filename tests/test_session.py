"""Gap sessionization vs DuckDB gap-cumsum SQL (SURVEY §2.4 W3)."""

import duckdb
import pandas as pd
import pytest

from engine.ops.session import label_sessions, sessionize

SF = "/root/testdata/sf0.001"
GAP_US = 4 * 3600 * 1_000_000  # 4h


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    c.execute(f"CREATE VIEW events AS SELECT * FROM read_parquet('{SF}/events.parquet')")
    return c


def test_labels_match_duckdb(ray_session, con):
    import ray.data as rd

    ev = rd.read_parquet(f"{SF}/events.parquet")
    got = (
        label_sessions(ev, entity="user_id", gap_us=GAP_US, tie_break="event_id", num_partitions=6)
        .to_pandas()
        .sort_values("event_id")
        .reset_index(drop=True)
    )
    exp = con.execute("""
        WITH d AS (
          SELECT event_id, user_id, ts,
                 CASE WHEN ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                           > INTERVAL 4 HOURS THEN 1 ELSE 0 END AS brk
          FROM events)
        SELECT event_id,
               SUM(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
                              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_idx
        FROM d ORDER BY event_id""").fetchdf()
    assert (got["session_idx"].to_numpy() == exp["session_idx"].to_numpy()).all()


def test_session_aggregates_match_duckdb(ray_session, con):
    import ray.data as rd

    ev = rd.read_parquet(f"{SF}/events.parquet")
    got = (
        sessionize(ev, entity="user_id", gap_us=GAP_US, value_col="value",
                   tie_break="event_id", num_partitions=6)
        .to_pandas()
        .sort_values(["user_id", "session_idx"])
        .reset_index(drop=True)
    )
    exp = con.execute("""
        WITH d AS (
          SELECT event_id, user_id, ts, value,
                 CASE WHEN ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                           > INTERVAL 4 HOURS THEN 1 ELSE 0 END AS brk
          FROM events),
        lab AS (
          SELECT user_id, ts, value,
                 SUM(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_idx
          FROM d)
        SELECT user_id, session_idx, MIN(ts) AS start_ts, MAX(ts) AS end_ts,
               COUNT(*) AS n_events, SUM(value) AS sum_value
        FROM lab GROUP BY user_id, session_idx
        ORDER BY user_id, session_idx""").fetchdf()
    assert len(got) == len(exp)
    for c in ["user_id", "session_idx", "n_events"]:
        assert (got[c].to_numpy() == exp[c].to_numpy()).all(), c
    assert (got["start_ts"].to_numpy() == exp["start_ts"].to_numpy()).all()
    assert (got["end_ts"].to_numpy() == exp["end_ts"].to_numpy()).all()
    import numpy as np

    np.testing.assert_allclose(got["sum_value"].to_numpy(), exp["sum_value"].to_numpy(), rtol=1e-9)
