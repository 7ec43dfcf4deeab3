"""As-of join vs DuckDB ASOF JOIN + the sequential oracle (SURVEY §2.4 J1)."""

import duckdb
import numpy as np
import pandas as pd
import pytest
import pyarrow as pa

from engine.ops.asof import asof_join

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    c.execute(f"CREATE VIEW events AS SELECT * FROM read_parquet('{SF}/events.parquet')")
    return c


def _sides(ray_session):
    import ray.data as rd
    import pyarrow.compute as pc

    ev = rd.read_parquet(f"{SF}/events.parquet")
    left = ev.map_batches(lambda t: t.filter(pc.equal(t["event_type"], "view")), batch_format="pyarrow")
    right = ev.map_batches(lambda t: t.filter(pc.equal(t["event_type"], "purchase")), batch_format="pyarrow")
    return left, right


def _duck(con, op: str) -> pd.DataFrame:
    return con.execute(f"""
        SELECT l.event_id, r.ts AS ts_r, r.value AS value_r
        FROM (SELECT * FROM events WHERE event_type='view') l
        ASOF LEFT JOIN (SELECT * FROM events WHERE event_type='purchase') r
          ON l.user_id = r.user_id AND l.ts {op} r.ts
        ORDER BY l.event_id""").fetchdf()


@pytest.mark.parametrize("strict,op", [(False, ">="), (True, ">")])
def test_asof_matches_duckdb(ray_session, con, strict, op):
    left, right = _sides(ray_session)
    got = (
        asof_join(left, right, on="user_id", right_cols=["value"], strict=strict, num_partitions=7)
        .to_pandas()
        .sort_values("event_id")
        .reset_index(drop=True)
    )
    exp = _duck(con, op)
    pd.testing.assert_frame_equal(
        got[["event_id", "ts_r", "value_r"]], exp[["event_id", "ts_r", "value_r"]], check_dtype=False
    )


def test_asof_tolerance(ray_session, con):
    left, right = _sides(ray_session)
    got = (
        asof_join(left, right, on="user_id", right_cols=["value"], tolerance_us=3_600_000_000,
                  num_partitions=5)
        .to_pandas()
        .sort_values("event_id")
        .reset_index(drop=True)
    )
    exp = _duck(con, ">=")
    lts = con.execute("SELECT event_id, ts FROM events WHERE event_type='view' ORDER BY event_id").fetchdf()
    exp = exp.merge(lts, on="event_id")
    stale = (exp["ts"] - exp["ts_r"]) > pd.Timedelta(hours=1)
    exp.loc[stale, "ts_r"] = pd.NaT
    exp.loc[stale, "value_r"] = np.nan
    pd.testing.assert_frame_equal(
        got[["event_id", "ts_r", "value_r"]], exp[["event_id", "ts_r", "value_r"]], check_dtype=False
    )


def test_asof_no_right_rows_for_entity(ray_session):
    """Entities absent from the right side keep nulls (left-join semantics)."""
    import ray.data as rd

    left = rd.from_pandas(pd.DataFrame({"e": ["a", "b"], "ts": pd.to_datetime(["2024-01-02", "2024-01-02"])}))
    right = rd.from_pandas(
        pd.DataFrame({"e": ["a"], "ts": pd.to_datetime(["2024-01-01"]), "v": [1.5]})
    )
    got = asof_join(left, right, on="e", right_cols=["v"], num_partitions=3).to_pandas().sort_values("e")
    assert got.loc[got["e"] == "a", "v_r"].iloc[0] == 1.5
    assert pd.isna(got.loc[got["e"] == "b", "v_r"].iloc[0])


def test_asof_tie_picks_last_right_row(ray_session):
    """Duplicate right ts for one entity -> last row in input order wins."""
    import ray.data as rd

    left = rd.from_pandas(pd.DataFrame({"e": ["a"], "ts": pd.to_datetime(["2024-01-02"])}))
    right = rd.from_pandas(
        pd.DataFrame({"e": ["a", "a"], "ts": pd.to_datetime(["2024-01-01", "2024-01-01"]), "v": [1.0, 2.0]})
    )
    got = asof_join(left, right, on="e", right_cols=["v"], num_partitions=2).to_pandas()
    assert got["v_r"].iloc[0] == 2.0


def test_asof_broadcast_matches_shuffle_path(ray_session):
    import pyarrow.compute as pc
    import ray.data as rd

    from engine.ops.asof import asof_join, asof_join_broadcast

    ev = rd.read_parquet("/root/testdata/sf0.001/events.parquet")

    def ft(et):
        return ev.map_batches(lambda t, e=et: t.filter(pc.equal(t["event_type"], e)),
                              batch_format="pyarrow")

    cols = ["event_id", "ts_r", "value_r"]
    a = (asof_join(ft("view"), ft("purchase"), on="user_id", right_cols=["value"])
         .select_columns(cols).to_pandas().sort_values("event_id").reset_index(drop=True))
    b = (asof_join_broadcast(ft("view"),
                             ft("purchase").select_columns(["user_id", "ts", "value"]),
                             on="user_id", right_cols=["value"])
         .select_columns(cols).to_pandas().sort_values("event_id").reset_index(drop=True))
    import pandas as pd

    pd.testing.assert_frame_equal(a, b)


def test_asof_broadcast_ns_timestamps(ray_session):
    """ADVICE r2 high: pandas-origin (timestamp[ns]) left batches must be
    unit-normalized before the binary search — otherwise every left row
    matches the entity's LAST right row, including future ones."""
    import pandas as pd
    import ray.data as rd

    from engine.ops.asof import asof_join, asof_join_broadcast

    left = pd.DataFrame({
        "user_id": [1, 1, 2],
        "ts": pd.to_datetime(["2024-01-02 12:00", "2024-01-03 12:00", "2024-01-02 00:00"]),
        "event_id": [10, 11, 12],
    })
    right = pd.DataFrame({
        "user_id": [1, 1, 2],
        "ts": pd.to_datetime(["2024-01-02 00:00", "2024-01-03 00:00", "2024-01-05 00:00"]),
        "value": [1.0, 2.0, 9.0],
    })
    lds, rds = rd.from_pandas(left), rd.from_pandas(right)  # ns-grained
    cols = ["event_id", "value_r"]
    a = (asof_join(lds, rds, on="user_id", right_cols=["value"], num_partitions=2)
         .select_columns(cols).to_pandas().sort_values("event_id").reset_index(drop=True))
    b = (asof_join_broadcast(lds, rds, on="user_id", right_cols=["value"])
         .select_columns(cols).to_pandas().sort_values("event_id").reset_index(drop=True))
    pd.testing.assert_frame_equal(a, b)
    assert a["value_r"].tolist() == [1.0, 2.0] + [None] or a["value_r"].fillna(-1).tolist() == [1.0, 2.0, -1.0]


def test_asof_directions_planted(ray_session):
    """forward picks the smallest right ts >= t (strict: > t); nearest
    picks the closer side with exact ties resolving backward; tolerance
    bounds the gap per direction."""
    import ray.data as rd

    from engine.ops.asof import asof_join

    left = pd.DataFrame({"e": [1, 1, 1, 2], "ts": [10, 25, 100, 5], "lid": [0, 1, 2, 3]})
    right = pd.DataFrame({"e": [1, 1, 1], "ts": [20, 30, 40], "v": [200., 300., 400.]})

    def run(**kw):
        out = asof_join(rd.from_pandas(left), rd.from_pandas(right), on="e",
                        right_cols=["v"], **kw).to_pandas().sort_values("lid")
        return list(out["v_r"].fillna(-1))

    assert run(direction="forward") == [200., 300., -1, -1]
    # strict forward at a boundary: left ts=20 would skip the equal row
    lb = pd.DataFrame({"e": [1], "ts": [20], "lid": [0]})
    outs = asof_join(rd.from_pandas(lb), rd.from_pandas(right), on="e",
                     right_cols=["v"], direction="forward", strict=True).to_pandas()
    assert list(outs["v_r"]) == [300.]
    # nearest: ts=25 is equidistant to 20 and 30 -> backward wins (200)
    assert run(direction="nearest") == [200., 200., 400., -1]
    # forward tolerance: gap must be <= 6
    assert run(direction="forward", tolerance_us=6) == [-1., 300., -1., -1.]
    # nearest with tolerance: ts=100 is 60 past 40 -> no match
    assert run(direction="nearest", tolerance_us=10) == [200., 200., -1., -1.]


def test_asof_multi_horizon_matches_chained(ray_session):
    """asof_multi_horizon == k independent backward as-of joins on
    shifted probe timestamps (pandas merge_asof oracle), including the
    no-match-null edge and high-partition-count invariance."""
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from engine.ops.asof import asof_multi_horizon

    rng = np.random.default_rng(11)
    n_l, n_r = 4_000, 3_000
    left = pd.DataFrame({
        "id": np.arange(n_l, dtype=np.int64),
        "k": rng.integers(0, 50, n_l).astype(np.int64),
        "ts": rng.integers(0, 10**9, n_l).astype("datetime64[us]"),
    })
    right = pd.DataFrame({
        "k": rng.integers(0, 50, n_r).astype(np.int64),
        "ts": rng.integers(0, 10**9, n_r).astype("datetime64[us]"),
        "v": rng.normal(size=n_r),
    })
    horizons = {"h0": 0, "h1": 3600 * 1_000_000}
    got = (asof_multi_horizon(rd.from_pandas(left).repartition(8),
                              rd.from_pandas(right).repartition(4),
                              on="k", id_col="id", horizons=horizons)
           .to_pandas().sort_values("id").reset_index(drop=True))
    rs = right.sort_values("ts")
    for nm, off in horizons.items():
        probe = left.assign(
            ts=(left["ts"] - pd.Timedelta(microseconds=off)).astype("datetime64[us]")
        ).sort_values("ts")
        want = pd.merge_asof(probe, rs, on="ts", by="k", direction="backward")
        want = want.sort_values("id").reset_index(drop=True)
        g = got[f"v_{nm}"].to_numpy()
        w = want["v"].to_numpy()
        assert np.isnan(g).tolist() == np.isnan(w).tolist(), nm
        np.testing.assert_allclose(g[~np.isnan(g)], w[~np.isnan(w)], err_msg=nm)
