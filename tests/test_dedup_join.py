"""Exact dedup (D1) + join wrappers (J3–J5) vs DuckDB."""

import duckdb
import numpy as np
import pandas as pd
import pytest

from engine.ops.dedup import content_dedup, exact_dedup
from engine.ops.join import anti_join, broadcast_lookup, equi_join, semi_join

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in ["events", "orders", "customer", "nation", "documents"]:
        c.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')")
    return c


def test_exact_dedup_matches_row_number(ray_session, con):
    import ray.data as rd

    ev = rd.read_parquet(f"{SF}/events.parquet")
    got = (
        exact_dedup(ev, keys=["user_id", "event_type"], order_by=["ts", "event_id"], num_partitions=6)
        .to_pandas()
        .sort_values("event_id")
        .reset_index(drop=True)
    )
    exp = con.execute("""
        SELECT * FROM (
          SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id, event_type
                                       ORDER BY ts, event_id) AS rn
          FROM events) WHERE rn = 1 ORDER BY event_id""").fetchdf().drop(columns=["rn"])
    assert (got["event_id"].to_numpy() == exp["event_id"].to_numpy()).all()


def test_content_dedup(ray_session, con):
    import ray.data as rd

    docs = rd.read_parquet(f"{SF}/documents.parquet")
    got = content_dedup(docs, "text", order_by="doc_id", num_partitions=4).to_pandas()
    exp = con.execute("""
        SELECT * FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY md5(text) ORDER BY doc_id) rn
                       FROM documents) WHERE rn=1""").fetchdf()
    assert sorted(got["doc_id"]) == sorted(exp["doc_id"])


def test_equi_join_matches_duckdb(ray_session, con):
    import ray.data as rd

    orders = rd.read_parquet(f"{SF}/orders.parquet")
    cust = rd.read_parquet(f"{SF}/customer.parquet")
    got = (
        equi_join(orders, cust, on="o_custkey", right_on="c_custkey", num_partitions=4)
        .to_pandas()
        .sort_values("o_orderkey")
        .reset_index(drop=True)
    )
    exp = con.execute("""
        SELECT o.*, c.* FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
        ORDER BY o_orderkey""").fetchdf()
    assert len(got) == len(exp)
    assert (got["o_orderkey"].to_numpy() == exp["o_orderkey"].to_numpy()).all()
    np.testing.assert_allclose(got["c_acctbal"].to_numpy(), exp["c_acctbal"].to_numpy())


def test_semi_anti_join(ray_session, con):
    import ray.data as rd

    cust = rd.read_parquet(f"{SF}/customer.parquet")
    orders = rd.read_parquet(f"{SF}/orders.parquet")
    got_semi = sorted(
        semi_join(cust, orders, on="c_custkey", right_on="o_custkey", num_partitions=4)
        .to_pandas()["c_custkey"]
    )
    anti_df = anti_join(cust, orders, on="c_custkey", right_on="o_custkey", num_partitions=4).to_pandas()
    got_anti = sorted(anti_df["c_custkey"]) if "c_custkey" in anti_df.columns else []
    # Ray's semi/anti join key name: left key col kept
    exp_semi = sorted(con.execute(
        "SELECT c_custkey FROM customer WHERE c_custkey IN (SELECT o_custkey FROM orders)").fetchdf()["c_custkey"])
    exp_anti = sorted(con.execute(
        "SELECT c_custkey FROM customer WHERE c_custkey NOT IN (SELECT o_custkey FROM orders)").fetchdf()["c_custkey"])
    assert got_semi == exp_semi
    assert got_anti == exp_anti


def test_broadcast_lookup(ray_session, con):
    import ray.data as rd

    cust = rd.read_parquet(f"{SF}/customer.parquet")
    nation = pd.read_parquet(f"{SF}/nation.parquet")
    got = (
        broadcast_lookup(cust, nation, on="c_nationkey", right_on="n_nationkey", cols=["n_name"])
        .to_pandas()
        .sort_values("c_custkey")
        .reset_index(drop=True)
    )
    exp = con.execute("""
        SELECT c.c_custkey, n.n_name FROM customer c
        LEFT JOIN nation n ON c.c_nationkey = n.n_nationkey ORDER BY c_custkey""").fetchdf()
    assert (got["n_name"].to_numpy() == exp["n_name"].to_numpy()).all()


def test_broadcast_lookup_right_on_keeps_left_name_collision(ray_session):
    """ADVICE r2: with right_on != on, a small-side payload column that
    happens to share the LEFT key's name must survive (suffixed when it
    collides with an existing left column)."""
    import ray.data as rd

    left = pd.DataFrame({"c_nationkey": [0, 1, 2], "c_custkey": [100, 101, 102]})
    small = pd.DataFrame({
        "n_nationkey": [0, 1, 2],
        "c_nationkey": [90, 91, 92],   # shares the LEFT key's name
        "n_name": ["A", "B", "C"],
    })
    got = (broadcast_lookup(rd.from_pandas(left), small, on="c_nationkey", right_on="n_nationkey")
           .to_pandas().sort_values("c_custkey").reset_index(drop=True))
    assert "c_nationkey_r" in got.columns
    assert got["c_nationkey_r"].tolist() == [90, 91, 92]
    assert got["n_name"].tolist() == ["A", "B", "C"]
    assert got["c_nationkey"].tolist() == [0, 1, 2]


def test_partition_sizing_sees_through_read_cache(ray_session):
    """Round-4 regression: the metadata-strip map_batches appended by
    engine.queries._read made ds.input_files() return [], zeroing
    input_disk_bytes — join_partitions then fell back to 2x cluster CPUs
    (a 64-aggregator-actor storm on a 3MB join). The _graft_input_files
    tag must keep the sizing data-aware."""
    from engine.ops.partitioning import input_disk_bytes, join_partitions
    from engine.queries import _read

    orders = _read(SF, "orders", columns=["o_orderkey", "o_custkey"])
    cust = _read(SF, "customer", columns=["c_custkey"])
    assert input_disk_bytes(orders, cust) > 0
    # kilobyte-scale inputs must resolve to the 2-partition floor, never
    # the unknown-size 2x-CPU fallback
    assert join_partitions(orders, cust) == 2


def test_line_dedup_planted_and_partition_invariant(ray_session):
    """C4 line dedup: a line shared across docs survives only in its
    (doc_id, pos)-first home; docs losing every line drop out; the result
    is invariant to the shuffle partition count."""
    import ray.data as rd

    from engine.ops.dedup import line_dedup

    docs = pd.DataFrame({
        "doc_id": [1, 2, 3, 4, 5],
        "text": ["keep one\nshared boiler\nuniq a",
                 "shared boiler\nuniq b",
                 "uniq c\nshared boiler",
                 "shared boiler",          # loses its only line -> drops out
                 "uniq d\nuniq d"],        # intra-doc repeat: keeps first only
    })

    def run(P):
        out = line_dedup(rd.from_pandas(docs), num_partitions=P).to_pandas()
        return out.sort_values("doc_id").reset_index(drop=True)

    out = run(None)
    got = dict(zip(out["doc_id"], out["text"]))
    assert got == {1: "keep one\nshared boiler\nuniq a",
                   2: "uniq b", 3: "uniq c", 5: "uniq d"}
    assert dict(zip(out["doc_id"], out["n_lines"])) == {1: 3, 2: 1, 3: 1, 5: 1}
    for P in (1, 3, 16):
        pd.testing.assert_frame_equal(run(P), out)
