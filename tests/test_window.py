"""Lag/lead + rolling window vs DuckDB window functions (SURVEY §2.4 W1/W2)."""

import duckdb
import numpy as np
import pandas as pd
import pytest

from engine.ops.window import rolling, with_lag_lead

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    c.execute(f"CREATE VIEW events AS SELECT * FROM read_parquet('{SF}/events.parquet')")
    return c


def test_lag_lead_matches_duckdb(ray_session, con):
    import ray.data as rd

    ev = rd.read_parquet(f"{SF}/events.parquet")
    got = (
        with_lag_lead(ev, entity="user_id", cols=["value"], lags=[1, 2], leads=[1],
                      tie_break="event_id", num_partitions=6)
        .to_pandas()
        .sort_values("event_id")
        .reset_index(drop=True)
    )
    exp = con.execute("""
        SELECT event_id,
               LAG(value, 1) OVER w AS lag1_value,
               LAG(value, 2) OVER w AS lag2_value,
               LEAD(value, 1) OVER w AS lead1_value
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        ORDER BY event_id""").fetchdf()
    for c in ["lag1_value", "lag2_value", "lead1_value"]:
        np.testing.assert_allclose(got[c].to_numpy(), exp[c].to_numpy(), rtol=1e-12, err_msg=c)


def test_rolling_matches_duckdb(ray_session, con):
    import ray.data as rd

    ev = rd.read_parquet(f"{SF}/events.parquet")
    got = (
        rolling(ev, entity="user_id", cols=["value"], window_us=24 * 3600 * 1_000_000,
                aggs=["count", "sum", "mean", "min", "max"], num_partitions=6)
        .to_pandas()
        .sort_values("event_id")
        .reset_index(drop=True)
    )
    exp = con.execute("""
        SELECT event_id,
               COUNT(value) OVER w AS roll_count_value,
               SUM(value)   OVER w AS roll_sum_value,
               AVG(value)   OVER w AS roll_mean_value,
               MIN(value)   OVER w AS roll_min_value,
               MAX(value)   OVER w AS roll_max_value
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts
                     RANGE BETWEEN INTERVAL 24 HOURS PRECEDING AND CURRENT ROW)
        ORDER BY event_id""").fetchdf()
    for c in ["roll_count_value", "roll_sum_value", "roll_mean_value", "roll_min_value", "roll_max_value"]:
        np.testing.assert_allclose(got[c].to_numpy(), exp[c].to_numpy(), rtol=1e-9, err_msg=c)


def test_rolling_peers_inclusive(ray_session):
    """Rows sharing a timestamp see each other (SQL RANGE semantics)."""
    import ray.data as rd

    df = pd.DataFrame({
        "e": ["a"] * 3,
        "ts": pd.to_datetime(["2024-01-01 00:00:00"] * 2 + ["2024-01-01 00:00:01"]),
        "v": [1.0, 2.0, 4.0],
        "id": [0, 1, 2],
    })
    got = (
        rolling(rd.from_pandas(df), entity="e", cols=["v"], window_us=10_000_000,
                aggs=["sum"], tie_break="id", num_partitions=2)
        .to_pandas()
        .sort_values("id")
    )
    assert list(got["roll_sum_v"]) == [3.0, 3.0, 7.0]


def test_windowed_minmax_kernel_edges():
    """RMQ sparse-table kernel: singleton windows, full-array windows,
    empty windows (hi == lo), and non-power-of-two sizes."""
    from engine.ops.wkernel import windowed_minmax

    v = np.array([5.0, 1.0, 4.0, 2.0, 8.0, 3.0, 7.0])
    n = len(v)
    # full prefix windows [0, i+1)
    lo = np.zeros(n, dtype=np.int64)
    hi = np.arange(1, n + 1)
    mn, mx = windowed_minmax(v, lo, hi)
    np.testing.assert_array_equal(mn, np.minimum.accumulate(v))
    np.testing.assert_array_equal(mx, np.maximum.accumulate(v))
    # singleton windows
    mn, mx = windowed_minmax(v, np.arange(n), np.arange(1, n + 1))
    np.testing.assert_array_equal(mn, v)
    np.testing.assert_array_equal(mx, v)
    # empty windows -> nan
    mn, mx = windowed_minmax(v, np.arange(n), np.arange(n))
    assert np.isnan(mn).all() and np.isnan(mx).all()
    # random windows vs brute force
    rng = np.random.default_rng(9)
    vals = rng.standard_normal(257)
    lo = rng.integers(0, 250, 400)
    width = rng.integers(1, 257 - 250 + 250, 400)
    hi = np.minimum(lo + rng.integers(1, 200, 400), 257)
    mn, mx = windowed_minmax(vals, lo, hi)
    for i in range(400):
        assert mn[i] == vals[lo[i]:hi[i]].min()
        assert mx[i] == vals[lo[i]:hi[i]].max()


def test_rolling_single_row_entities(ray_session):
    import ray.data as rd

    df = pd.DataFrame({
        "e": [f"u{i}" for i in range(20)],
        "ts": pd.to_datetime(["2024-01-01"] * 20),
        "v": np.arange(20, dtype=np.float64),
        "id": range(20),
    })
    got = (rolling(rd.from_pandas(df), entity="e", cols=["v"],
                   aggs=["count", "sum", "min", "max"], tie_break="id",
                   num_partitions=4)
           .to_pandas().sort_values("id").reset_index(drop=True))
    assert (got["roll_count_v"] == 1).all()
    np.testing.assert_array_equal(got["roll_min_v"], got["v"])
    np.testing.assert_array_equal(got["roll_max_v"], got["v"])


def test_hopping_matches_duckdb(ray_session, con):
    import ray.data as rd

    from engine.ops.window import hopping

    W, H = 86_400_000_000, 21_600_000_000
    ev = rd.read_parquet(f"{SF}/events.parquet")
    got = (hopping(ev, entity="user_id", width_us=W, hop_us=H, num_partitions=5)
           .to_pandas().sort_values(["user_id", "window_start"]).reset_index(drop=True))
    exp = con.execute(f"""
        SELECT user_id,
               make_timestamp((epoch_us(ts)//{H} - r.range)*{H}) AS window_start,
               COUNT(*) AS n_events, SUM(value) AS sum_value
        FROM events CROSS JOIN range(4) r
        GROUP BY 1, 2 ORDER BY user_id, window_start""").fetchdf()
    assert len(got) == len(exp)
    assert (got["user_id"].to_numpy() == exp["user_id"].to_numpy()).all()
    assert (got["window_start"].to_numpy() == exp["window_start"].to_numpy()).all()
    assert (got["n_events"].to_numpy() == exp["n_events"].to_numpy()).all()
    np.testing.assert_allclose(got["sum_value"], exp["sum_value"], rtol=1e-9)
    # each event lands in exactly k=4 windows
    assert got["n_events"].sum() == 4 * con.execute("SELECT COUNT(*) FROM events").fetchone()[0]


def test_hopping_rejects_bad_hop(ray_session):
    import ray.data as rd

    from engine.ops.window import hopping

    ev = rd.read_parquet(f"{SF}/events.parquet")
    with pytest.raises(ValueError):
        hopping(ev, entity="user_id", width_us=100, hop_us=33)


def test_first_last_matches_duckdb(ray_session, con):
    import ray.data as rd

    from engine.ops.window import with_first_last

    ev = rd.read_parquet(f"{SF}/events.parquet")
    got = (
        with_first_last(ev, entity="user_id", cols=["value"], nth=[2, 3],
                        tie_break="event_id", num_partitions=6)
        .to_pandas()
        .sort_values("event_id")
        .reset_index(drop=True)
    )
    exp = con.execute("""
        SELECT event_id,
               FIRST_VALUE(value) OVER w AS first_value,
               LAST_VALUE(value) OVER w AS last_value,
               NTH_VALUE(value, 2) OVER w AS nth2_value,
               NTH_VALUE(value, 3) OVER w AS nth3_value
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
        ORDER BY event_id""").fetchdf()
    for c in ["first_value", "last_value", "nth2_value", "nth3_value"]:
        np.testing.assert_array_equal(got[c].to_numpy(), exp[c].to_numpy(), err_msg=c)


def test_first_last_planted_edges(ray_session):
    """Single-event entity: first == last == value, nth2 is null; string
    payload column picked type-generically."""
    import ray.data as rd

    df = pd.DataFrame({
        "e": ["a", "a", "a", "b"],
        "ts": pd.to_datetime([1, 2, 3, 5], unit="s"),
        "v": [10.0, 20.0, 30.0, 7.0],
        "s": ["x", "y", "z", "solo"],
    })
    from engine.ops.window import with_first_last

    got = (with_first_last(rd.from_pandas(df), entity="e", ts="ts",
                           cols=["v", "s"], nth=[2], num_partitions=3)
           .to_pandas().sort_values(["e", "ts"]).reset_index(drop=True))
    assert got["first_v"].tolist() == [10.0, 10.0, 10.0, 7.0]
    assert got["last_v"].tolist() == [30.0, 30.0, 30.0, 7.0]
    assert got["first_s"].tolist() == ["x", "x", "x", "solo"]
    assert got["last_s"].tolist() == ["z", "z", "z", "solo"]
    assert got["nth2_v"].tolist()[:3] == [20.0, 20.0, 20.0]
    assert pd.isna(got["nth2_v"].iloc[3])
    assert got["nth2_s"].tolist()[:3] == ["y", "y", "y"]
    assert got["nth2_s"].iloc[3] is None or pd.isna(got["nth2_s"].iloc[3])


def _ewma_sequential(ts_us, v, hl_us):
    """Per-row recurrence oracle: s = s*decay + v_i, w = w*decay + 1."""
    out = np.empty(len(v))
    s = w = 0.0
    prev = None
    for i, (t, x) in enumerate(zip(ts_us, v)):
        dec = 2.0 ** (-(t - prev) / hl_us) if prev is not None else 0.0
        s = s * dec + x
        w = w * dec + 1.0
        out[i] = s / w
        prev = t
    return out


def test_ewma_matches_sequential_recurrence(ray_session):
    import ray.data as rd

    from engine.ops.window import ewma

    rng = np.random.default_rng(11)
    n = 4_000
    df = pd.DataFrame({
        "e": [f"u{i}" for i in rng.integers(0, 37, n)],
        "ts": pd.to_datetime(np.sort(rng.integers(0, 10**9, n)), unit="us"),
        "v": rng.normal(50.0, 20.0, n),
        "k": np.arange(n),
    })
    hl = 3_600_000_000.0  # 1h
    got = (ewma(rd.from_pandas(df).repartition(5), entity="e", ts="ts", cols=["v"],
                halflife_us=hl, tie_break="k", num_partitions=6)
           .to_pandas().sort_values("k").reset_index(drop=True))
    want = np.empty(n)
    sdf = df.sort_values(["e", "ts", "k"])
    for _, g in sdf.groupby("e"):
        want[g["k"].to_numpy()] = _ewma_sequential(
            g["ts"].astype("int64").to_numpy() // 1000, g["v"].to_numpy(), hl)
    np.testing.assert_allclose(got["ewma_v"].to_numpy(), want, rtol=1e-9)


def test_ewma_partition_invariance_and_long_span(ray_session):
    """A single entity spanning ~40,000 halflives (many renormalization
    blocks, carries underflowing to 0) still matches the sequential
    recurrence, and P=1 == P=8 bit-exactly."""
    import ray.data as rd

    from engine.ops.window import ewma

    rng = np.random.default_rng(7)
    n = 3_000
    ts_us = np.cumsum(rng.integers(1, 100_000_000, n))  # gaps up to ~28 hl
    df = pd.DataFrame({
        "e": "solo",
        "ts": pd.to_datetime(ts_us, unit="us"),
        "v": rng.normal(0.0, 5.0, n),
        "k": np.arange(n),
    })
    hl = 3_600_000_000.0
    a = (ewma(rd.from_pandas(df), entity="e", ts="ts", cols=["v"], halflife_us=hl,
              tie_break="k", num_partitions=1)
         .to_pandas().sort_values("k")["ewma_v"].to_numpy())
    b = (ewma(rd.from_pandas(df).repartition(8), entity="e", ts="ts", cols=["v"],
              halflife_us=hl, tie_break="k", num_partitions=8)
         .to_pandas().sort_values("k")["ewma_v"].to_numpy())
    np.testing.assert_array_equal(a, b)
    want = _ewma_sequential(ts_us, df["v"].to_numpy(), hl)
    np.testing.assert_allclose(a, want, rtol=1e-8)
    assert np.isfinite(a).all()
