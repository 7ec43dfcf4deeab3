"""Partition invariance (SURVEY §5.2.3): results identical for P in
{1, 3, 16} for every partitioned operator."""

import numpy as np
import pandas as pd
import pytest

from engine.ops.asof import asof_join
from engine.ops.session import label_sessions
from engine.ops.window import rolling, with_lag_lead

SF = "/root/testdata/sf0.001"


def _ev(ray_session):
    import ray.data as rd

    return rd.read_parquet(f"{SF}/events.parquet")


@pytest.mark.parametrize("P", [1, 3, 16])
def test_asof_partition_invariant(ray_session, P):
    import pyarrow.compute as pc

    ev = _ev(ray_session)
    left = ev.map_batches(lambda t: t.filter(pc.equal(t["event_type"], "view")), batch_format="pyarrow")
    right = ev.map_batches(lambda t: t.filter(pc.equal(t["event_type"], "click")), batch_format="pyarrow")
    got = (
        asof_join(left, right, on="user_id", right_cols=["value"], num_partitions=P)
        .to_pandas()
        .sort_values("event_id")
        .reset_index(drop=True)
    )
    if not hasattr(test_asof_partition_invariant, "_baseline"):
        test_asof_partition_invariant._baseline = got
    else:
        pd.testing.assert_frame_equal(got, test_asof_partition_invariant._baseline)


@pytest.mark.parametrize("P", [1, 3, 16])
def test_windows_partition_invariant(ray_session, P):
    ev = _ev(ray_session)
    got = (
        with_lag_lead(ev, entity="user_id", cols=["value"], lags=[1], leads=[1],
                      tie_break="event_id", num_partitions=P)
        .to_pandas()
        .sort_values("event_id")
        .reset_index(drop=True)[["event_id", "lag1_value", "lead1_value"]]
    )
    key = "_baseline"
    store = test_windows_partition_invariant.__dict__
    if key not in store:
        store[key] = got
    else:
        pd.testing.assert_frame_equal(got, store[key])


@pytest.mark.parametrize("P", [1, 3, 16])
def test_sessions_and_rolling_partition_invariant(ray_session, P):
    ev = _ev(ray_session)
    lab = (
        label_sessions(ev, entity="user_id", gap_us=4 * 3600_000_000, tie_break="event_id",
                       num_partitions=P)
        .to_pandas()
        .sort_values("event_id")["session_idx"]
        .to_numpy()
    )
    rol = (
        rolling(ev, entity="user_id", cols=["value"], aggs=["sum"], num_partitions=P)
        .to_pandas()
        .sort_values("event_id")["roll_sum_value"]
        .to_numpy()
    )
    store = test_sessions_and_rolling_partition_invariant.__dict__
    if "_b" not in store:
        store["_b"] = (lab, rol)
    else:
        np.testing.assert_array_equal(lab, store["_b"][0])
        np.testing.assert_allclose(rol, store["_b"][1], rtol=1e-12)


@pytest.mark.parametrize("P", [1, 3, 16])
def test_ranks_partition_invariant(ray_session, P):
    """with_ranks (RANK/DENSE_RANK/NTILE) must be partition-count
    invariant, including a duckdb cross-check at P=1."""
    import duckdb
    import pyarrow as pa
    import pyarrow.compute as pc

    from engine.ops.window import with_ranks

    ev = _ev(ray_session).map_batches(
        lambda t: t.append_column("coarse", pc.cast(pc.floor(t["value"]), pa.int64())),
        batch_format="pyarrow")
    got = (with_ranks(ev, entity="user_id", order_col="coarse",
                      tie_break="event_id", ntile=3, num_partitions=P)
           .to_pandas()[["event_id", "rnk", "drnk", "nt"]]
           .sort_values("event_id").reset_index(drop=True))
    if not hasattr(test_ranks_partition_invariant, "_baseline"):
        ref = duckdb.sql(f"""
            SELECT event_id,
                   RANK() OVER (PARTITION BY user_id ORDER BY CAST(floor(value) AS BIGINT)) AS rnk,
                   DENSE_RANK() OVER (PARTITION BY user_id ORDER BY CAST(floor(value) AS BIGINT)) AS drnk,
                   NTILE(3) OVER (PARTITION BY user_id ORDER BY CAST(floor(value) AS BIGINT), event_id) AS nt
            FROM read_parquet('{SF}/events.parquet') ORDER BY event_id""").df()
        pd.testing.assert_frame_equal(got, ref)
        test_ranks_partition_invariant._baseline = got
    else:
        pd.testing.assert_frame_equal(got, test_ranks_partition_invariant._baseline)
