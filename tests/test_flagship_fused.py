"""Fused as-of + windowed features (one shuffle) vs DuckDB, and
partition invariance of the fused path."""

import duckdb
import numpy as np
import pandas as pd
import pytest
import pyarrow.compute as pc

SF = "/root/testdata/sf0.001"

ORACLE = """
WITH j AS (
  SELECT l.event_id, l.user_id, l.ts, l.value,
         r.ts AS ts_last_purchase, r.value AS value_last_purchase
  FROM events l
  ASOF LEFT JOIN (SELECT user_id, ts, value FROM events
                  WHERE event_type = 'purchase') r
    ON l.user_id = r.user_id AND l.ts >= r.ts),
w AS (
  SELECT *,
         LAG(value, 1) OVER win AS lag1_value,
         LAG(value, 2) OVER win AS lag2_value,
         COUNT(value) OVER rng AS roll_count_value,
         SUM(value) OVER rng AS roll_sum_value,
         AVG(value) OVER rng AS roll_mean_value,
         CASE WHEN ts - LAG(ts) OVER win > INTERVAL 4 HOURS
              THEN 1 ELSE 0 END AS brk
  FROM j
  WINDOW win AS (PARTITION BY user_id ORDER BY ts, event_id),
         rng AS (PARTITION BY user_id ORDER BY ts
                 RANGE BETWEEN INTERVAL 24 HOURS PRECEDING AND CURRENT ROW))
SELECT event_id, ts_last_purchase, value_last_purchase,
       lag1_value, lag2_value, roll_count_value, roll_sum_value,
       roll_mean_value,
       CAST(SUM(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
                           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
            AS BIGINT) AS session_idx
FROM w ORDER BY event_id
"""


@pytest.fixture(scope="module")
def oracle():
    c = duckdb.connect()
    c.execute(f"CREATE VIEW events AS SELECT * FROM read_parquet('{SF}/events.parquet')")
    return c.execute(ORACLE).fetchdf()


def _run_fused(num_partitions):
    import ray.data as rd

    from engine.pipelines.flagship import asof_windowed

    ev = rd.read_parquet(f"{SF}/events.parquet")
    purchases = ev.map_batches(
        lambda t: t.filter(pc.equal(t["event_type"], "purchase")), batch_format="pyarrow"
    ).select_columns(["user_id", "ts", "value"])
    out = asof_windowed(ev, purchases, on="user_id", right_cols=["value"],
                        suffix="_last_purchase", tie_break="event_id",
                        num_partitions=num_partitions)
    return out.to_pandas().sort_values("event_id").reset_index(drop=True)


def test_fused_matches_duckdb(ray_session, oracle):
    got = _run_fused(8)
    assert len(got) == len(oracle)
    pd.testing.assert_series_equal(got["ts_last_purchase"], oracle["ts_last_purchase"],
                                   check_names=False)
    for c in ["value_last_purchase", "lag1_value", "lag2_value",
              "roll_sum_value", "roll_mean_value"]:
        np.testing.assert_allclose(got[c].to_numpy(dtype=float),
                                   oracle[c].to_numpy(dtype=float),
                                   rtol=0, atol=1e-9, err_msg=c)
    np.testing.assert_array_equal(got["roll_count_value"].to_numpy(),
                                  oracle["roll_count_value"].to_numpy())
    np.testing.assert_array_equal(got["session_idx"].to_numpy(),
                                  oracle["session_idx"].to_numpy())


def test_fused_partition_invariant(ray_session):
    a = _run_fused(1)
    b = _run_fused(16)
    pd.testing.assert_frame_equal(a, b)
