"""Quantiles (A6), deterministic sampling (O3), set ops (E2) vs DuckDB."""

import duckdb
import numpy as np
import pandas as pd
import pytest

from engine.ops.agg import (
    deterministic_sample,
    except_keys,
    grouped_quantiles,
    intersect_keys,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    c.execute(f"CREATE VIEW events AS SELECT * FROM read_parquet('{SF}/events.parquet')")
    c.execute(f"CREATE VIEW orders AS SELECT * FROM read_parquet('{SF}/orders.parquet')")
    return c


def test_grouped_quantiles_match_quantile_cont(ray_session, con):
    import ray.data as rd

    ev = rd.read_parquet(f"{SF}/events.parquet", columns=["event_type", "value"])
    got = (
        grouped_quantiles(ev, "event_type", "value", qs=(0.25, 0.5, 0.9))
        .to_pandas()
        .sort_values("event_type")
        .reset_index(drop=True)
    )
    exp = con.execute("""
        SELECT event_type,
               quantile_cont(value, 0.25) AS p25_value,
               quantile_cont(value, 0.50) AS p50_value,
               quantile_cont(value, 0.90) AS p90_value
        FROM events GROUP BY event_type ORDER BY event_type""").fetchdf()
    assert list(got["event_type"]) == list(exp["event_type"])
    for c in ["p25_value", "p50_value", "p90_value"]:
        np.testing.assert_allclose(got[c].to_numpy(), exp[c].to_numpy(), rtol=0, atol=1e-12)


def test_deterministic_sample_matches_sql_and_is_stable(ray_session, con):
    import ray.data as rd

    ev = rd.read_parquet(f"{SF}/events.parquet", columns=["event_id"])
    got = set(deterministic_sample(ev, "event_id", 0.2).to_pandas()["event_id"])
    exp = set(con.execute("""
        SELECT event_id FROM events
        WHERE CAST(('0x' || substr(md5(CAST(event_id AS VARCHAR)), 1, 8)) AS UBIGINT)
              < CAST(0.2 * 4294967296 AS UBIGINT)""").fetchdf()["event_id"])
    assert got == exp
    # stable across re-execution / partitioning
    got2 = set(deterministic_sample(ev.repartition(7), "event_id", 0.2).to_pandas()["event_id"])
    assert got2 == got


def test_intersect_except_keys(ray_session, con):
    import pyarrow.compute as pc
    import ray.data as rd

    ev = rd.read_parquet(f"{SF}/events.parquet")

    def ft(et):
        return ev.map_batches(lambda t, e=et: t.filter(pc.equal(t["event_type"], e)),
                              batch_format="pyarrow")

    got_i = set(intersect_keys(ft("view"), ft("purchase"), on="user_id").to_pandas()["user_id"])
    exp_i = set(con.execute("""
        SELECT user_id FROM events WHERE event_type='view'
        INTERSECT SELECT user_id FROM events WHERE event_type='purchase'""").fetchdf()["user_id"])
    assert got_i == exp_i

    got_e = except_keys(ft("view"), ft("purchase"), on="user_id").to_pandas()
    exp_e = con.execute("""
        SELECT user_id FROM events WHERE event_type='view'
        EXCEPT SELECT user_id FROM events WHERE event_type='purchase'""").fetchdf()
    got_vals = set(got_e["user_id"]) if "user_id" in got_e.columns else set()
    assert got_vals == set(exp_e["user_id"])


def test_stratified_sample_fracs_and_stability(ray_session):
    import numpy as np
    import ray.data as rd

    from engine.ops.agg import stratified_sample

    ev = rd.read_parquet(f"{SF}/events.parquet", columns=["event_id", "event_type"])
    out = stratified_sample(ev, "event_type", "event_id",
                            fracs={"view": 0.5, "purchase": 1.0}, default_frac=0.0)
    df = out.to_pandas()
    full = ev.to_pandas()
    n_purch = (full["event_type"] == "purchase").sum()
    assert (df["event_type"] == "purchase").sum() == n_purch  # frac=1 keeps all
    assert set(df["event_type"]) <= {"view", "purchase"}      # default 0 drops rest
    n_view, n_view_full = (df["event_type"] == "view").sum(), (full["event_type"] == "view").sum()
    assert abs(n_view / n_view_full - 0.5) < 0.15
    # deterministic across re-execution
    df2 = stratified_sample(ev.repartition(5), "event_type", "event_id",
                            fracs={"view": 0.5, "purchase": 1.0}).to_pandas()
    assert set(df2["event_id"]) == set(df["event_id"])


def test_pivot_count_and_mean(ray_session, con):
    import ray.data as rd

    from engine.ops.agg import pivot

    ev = rd.read_parquet(f"{SF}/events.parquet", columns=["user_id", "event_type", "value"])
    cats = ["view", "purchase"]
    got = (pivot(ev, "user_id", "event_type", "value", cats, agg="mean")
           .to_pandas().sort_values("user_id").reset_index(drop=True))
    exp = con.execute("""
        SELECT user_id,
               AVG(CASE WHEN event_type='view' THEN value END) AS m_view,
               AVG(CASE WHEN event_type='purchase' THEN value END) AS m_purchase
        FROM events GROUP BY user_id ORDER BY user_id""").fetchdf()
    np.testing.assert_allclose(got["mean_value_view"].to_numpy(),
                               exp["m_view"].to_numpy(), rtol=0, atol=1e-9)
    np.testing.assert_allclose(got["mean_value_purchase"].to_numpy(),
                               exp["m_purchase"].to_numpy(), rtol=0, atol=1e-9)


def test_splitmix64_matches_duckdb_twin():
    import duckdb
    import numpy as np

    from engine.ops.agg import splitmix64, splitmix64_sql

    rng = np.random.default_rng(11)
    x = np.concatenate([
        np.array([0, 1, 2**31, 2**63 - 1, 2**64 - 1], dtype=np.uint64),
        rng.integers(0, 2**64, 200, dtype=np.uint64),
    ])
    con = duckdb.connect()
    rows = con.execute(
        f"SELECT {splitmix64_sql('x')} FROM (SELECT UNNEST(CAST(? AS UBIGINT[])) AS x)",
        [[int(v) for v in x]],
    ).fetchall()
    assert np.array_equal(splitmix64(x), np.array([r[0] for r in rows], dtype=np.uint64))


def test_grouped_quantiles_sample_key_required():
    import pytest as _pytest

    from engine.ops.agg import grouped_quantiles

    with _pytest.raises(ValueError, match="sample_key"):
        grouped_quantiles(None, "k", "v", sample_frac=0.5)


def test_grouped_mode_vs_pandas(ray_session):
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    from engine.ops.agg import grouped_mode

    rng = np.random.default_rng(23)
    g = rng.integers(0, 40, 6000)
    v = rng.integers(0, 6, 6000)
    t = pa.table({"g": g.astype(np.int64),
                  "v": pa.array([f"t{x}" for x in v], pa.string())})
    out = grouped_mode(rd.from_arrow(t).repartition(9), "g", "v").to_pandas()
    df = t.to_pandas()
    # oracle: max count, ties -> smallest value
    want = (df.groupby(["g", "v"]).size().reset_index(name="c")
            .sort_values(["g", "c", "v"], ascending=[True, False, True])
            .groupby("g").head(1).set_index("g")["v"].sort_index())
    got = out.set_index("g")["mode_v"].sort_index()
    assert got.equals(want)


def test_grouped_sample_k_partition_invariant(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from engine.ops.agg import grouped_sample_k

    rng = np.random.default_rng(31)
    t = pa.table({"g": rng.integers(0, 10, 3000).astype(np.int64),
                  "id": np.arange(3000, dtype=np.int64)})
    a = grouped_sample_k(rd.from_arrow(t), "g", key="id", k=5).to_pandas()
    b = grouped_sample_k(rd.from_arrow(t).repartition(13), "g", key="id", k=5).to_pandas()
    ka = sorted(map(tuple, a[["g", "id"]].to_numpy()))
    kb = sorted(map(tuple, b[["g", "id"]].to_numpy()))
    assert ka == kb
    assert a.groupby("g").size().eq(5).all()


def test_grouped_corr_vs_numpy_and_partition_invariance(ray_session):
    import ray.data as rd

    from engine.ops.agg import grouped_corr

    rng = np.random.default_rng(23)
    n = 20_000
    g = rng.integers(0, 5, n)
    x = rng.normal(10.0, 3.0, n)
    y = 2.5 * x + rng.normal(0.0, 4.0, n)  # known positive correlation
    df = pd.DataFrame({"g": [f"g{i}" for i in g], "x": x, "y": y})

    got = (grouped_corr(rd.from_pandas(df).repartition(7), "g", "x", "y")
           .to_pandas().sort_values("g").reset_index(drop=True))
    for _, row in got.iterrows():
        m = df["g"] == row["g"]
        want_corr = np.corrcoef(df.loc[m, "x"], df.loc[m, "y"])[0, 1]
        want_cov = np.cov(df.loc[m, "x"], df.loc[m, "y"], bias=True)[0, 1]
        assert row["n"] == int(m.sum())
        assert abs(row["corr"] - round(want_corr, 6)) <= 1e-6
        assert abs(row["covar_pop"] - round(want_cov, 6)) <= 1e-6

    again = (grouped_corr(rd.from_pandas(df).repartition(1), "g", "x", "y")
             .to_pandas().sort_values("g").reset_index(drop=True))
    assert (got["corr"].to_numpy() == again["corr"].to_numpy()).all()
    assert (got["covar_pop"].to_numpy() == again["covar_pop"].to_numpy()).all()
