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


def test_range_join_wide_span_many_entities_no_overflow(ray_session):
    """Regression: value-space composite keys (entity_code * (span+lo+hi+2))
    overflow int64 for wide microsecond spans x many entities; dense ranks
    must keep results exact. 3k entities x a ~50-year span would wrap the
    old keying (3e3 * 1.6e15 * pad) only at much larger scale, so instead
    check exactness vs a brute-force pandas join on a crafted small case
    with a span near int64/codes."""
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from engine.ops.rangejoin import range_join

    rng = np.random.default_rng(3)
    n_ent, per = 400, 6
    # huge span: timestamps up to ~2**52 us, so code * span overflows int64
    # under the old scheme once codes * (span) > 2**63 (400 * 2**52 ≈ 2**60.6
    # -- push further with larger ts)
    ts = rng.integers(0, 2**55, size=n_ent * per)
    ent = np.repeat(np.arange(n_ent), per)
    left = pd.DataFrame({"e": ent, "ts": ts, "lv": np.arange(n_ent * per)})
    rts = rng.integers(0, 2**55, size=n_ent * per)
    right = pd.DataFrame({"e": ent, "ts": rts, "rv": np.arange(n_ent * per)})
    lo = int(2**54)  # wide window => old base pad also huge
    out = range_join(rd.from_pandas(left), rd.from_pandas(right), on="e",
                     lo_us=lo, hi_us=0, left_ts="ts", right_ts="ts",
                     right_cols=["rv"], num_partitions=4).to_pandas()
    m = left.merge(right, on="e", suffixes=("", "_r"))
    m = m[(m.ts_r >= m.ts - lo) & (m.ts_r <= m.ts)]
    exp = m[["lv", "rv"]]
    got = out[["lv", "rv_r"]].rename(columns={"rv_r": "rv"})
    assert len(got) == len(exp)
    a = got.sort_values(["lv", "rv"]).reset_index(drop=True)
    b = exp.sort_values(["lv", "rv"]).reset_index(drop=True).astype(a.dtypes.to_dict())
    pd.testing.assert_frame_equal(a, b)
