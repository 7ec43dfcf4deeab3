"""Range (interval) join vs DuckDB non-equi join + partition invariance."""

import duckdb
import pandas as pd
import pytest
import pyarrow.compute as pc

SF = "/root/testdata/sf0.001"
DAY_US = 24 * 3600 * 1_000_000


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    c.execute(f"CREATE VIEW events AS SELECT * FROM read_parquet('{SF}/events.parquet')")
    return c


def _run(num_partitions, lo_us=DAY_US, hi_us=0):
    import ray.data as rd

    from engine.ops.rangejoin import range_join

    ev = rd.read_parquet(f"{SF}/events.parquet")

    def ft(et):
        return ev.map_batches(lambda t, e=et: t.filter(pc.equal(t["event_type"], e)),
                              batch_format="pyarrow")

    out = range_join(ft("view"), ft("purchase"), on="user_id", lo_us=lo_us, hi_us=hi_us,
                     right_cols=["value"], num_partitions=num_partitions)
    return (out.select_columns(["event_id", "ts_r", "value_r"]).to_pandas()
            .sort_values(["event_id", "ts_r"]).reset_index(drop=True))


def test_range_join_matches_duckdb(ray_session, con):
    got = _run(6)
    exp = con.execute("""
        SELECT l.event_id, r.ts AS ts_r, r.value AS value_r
        FROM (SELECT * FROM events WHERE event_type='view') l
        JOIN (SELECT * FROM events WHERE event_type='purchase') r
          ON l.user_id = r.user_id
         AND r.ts BETWEEN l.ts - INTERVAL 24 HOURS AND l.ts
        ORDER BY l.event_id, r.ts""").fetchdf()
    assert len(got) == len(exp)
    pd.testing.assert_frame_equal(got, exp.reset_index(drop=True), check_dtype=False)


def test_range_join_future_window(ray_session, con):
    got = _run(4, lo_us=0, hi_us=DAY_US)
    exp = con.execute("""
        SELECT l.event_id, r.ts AS ts_r, r.value AS value_r
        FROM (SELECT * FROM events WHERE event_type='view') l
        JOIN (SELECT * FROM events WHERE event_type='purchase') r
          ON l.user_id = r.user_id
         AND r.ts BETWEEN l.ts AND l.ts + INTERVAL 24 HOURS
        ORDER BY l.event_id, r.ts""").fetchdf()
    assert len(got) == len(exp)
    pd.testing.assert_frame_equal(got, exp.reset_index(drop=True), check_dtype=False)


def test_range_join_partition_invariant(ray_session):
    pd.testing.assert_frame_equal(_run(1), _run(16))
