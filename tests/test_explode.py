"""Explode/unnest: SQL parity, null handling, fixed-size lists."""

import numpy as np
import pandas as pd
import pyarrow as pa

from engine.ops.explode import explode_batch


def test_explode_variable_lists_with_nulls():
    t = pa.table({
        "id": pa.array([1, 2, 3, 4]),
        "v": pa.array([[10, 20], None, [], [30]], type=pa.list_(pa.int64())),
    })
    out = explode_batch(t, "v")
    assert out["id"].to_pylist() == [1, 1, 4]
    assert out["pos"].to_pylist() == [1, 2, 1]
    assert out["e"].to_pylist() == [10, 20, 30]


def test_explode_fixed_size_list():
    vals = pa.array(np.arange(6, dtype=np.float32))
    t = pa.table({
        "id": pa.array(["a", "b"]),
        "v": pa.FixedSizeListArray.from_arrays(vals, 3),
    })
    out = explode_batch(t, "v")
    assert out["id"].to_pylist() == ["a", "a", "a", "b", "b", "b"]
    assert out["pos"].to_pylist() == [1, 2, 3, 1, 2, 3]
    assert out["e"].to_pylist() == [0.0, 1.0, 2.0, 3.0, 4.0, 5.0]


def test_explode_dataset_matches_duckdb(ray_session):
    import duckdb
    import ray.data as rd

    from engine.ops.explode import explode

    sf = "/root/testdata/sf0.001"
    emb = rd.read_parquet(f"{sf}/embeddings.parquet", columns=["vec_id", "embedding"])
    got = (explode(emb, "embedding").to_pandas()
           .sort_values(["vec_id", "pos"]).reset_index(drop=True))
    con = duckdb.connect()
    con.execute(f"CREATE VIEW embeddings AS SELECT * FROM read_parquet('{sf}/embeddings.parquet')")
    exp = con.execute("""
        SELECT vec_id, generate_subscripts(embedding, 1) AS pos, unnest(embedding) AS e
        FROM embeddings ORDER BY vec_id, pos""").fetchdf()
    assert len(got) == len(exp)
    np.testing.assert_array_equal(got["vec_id"].to_numpy(), exp["vec_id"].to_numpy())
    np.testing.assert_array_equal(got["pos"].to_numpy(), exp["pos"].to_numpy())
    np.testing.assert_allclose(got["e"].to_numpy(dtype=np.float64),
                               exp["e"].to_numpy(dtype=np.float64), rtol=0, atol=0)


def test_explode_collect_roundtrip(ray_session):
    import ray.data as rd

    from engine.ops.agg import collect_list
    from engine.ops.explode import explode

    sf = "/root/testdata/sf0.001"
    emb = rd.read_parquet(f"{sf}/embeddings.parquet", columns=["vec_id", "embedding"])
    back = collect_list(explode(emb, "embedding"), "vec_id", "e", order_by="pos",
                        out="embedding")
    got = back.to_pandas().sort_values("vec_id").reset_index(drop=True)
    orig = emb.to_pandas().sort_values("vec_id").reset_index(drop=True)
    assert list(got["vec_id"]) == list(orig["vec_id"])
    for g, o in zip(got["embedding"], orig["embedding"]):
        np.testing.assert_array_equal(np.asarray(g, dtype=np.float32),
                                      np.asarray(o, dtype=np.float32))


def test_melt_roundtrip_with_pivot(ray_session):
    """pivot(melt(wide)) recovers the wide table (mean of a single value
    per cell = the value itself)."""
    import ray.data as rd

    from engine.ops.agg import pivot
    from engine.ops.explode import melt

    rng = np.random.default_rng(9)
    df = pd.DataFrame({"k": np.arange(500, dtype=np.int64),
                       "a": rng.normal(size=500), "b": rng.normal(size=500)})
    long = melt(rd.from_pandas(df).repartition(4), ["k"], ["a", "b"])
    assert long.count() == 1000
    back = (pivot(long, index="k", column="variable", value="value",
                  categories=["a", "b"], agg="mean")
            .to_pandas().sort_values("k").reset_index(drop=True))
    np.testing.assert_allclose(back["mean_value_a"], df["a"], rtol=1e-12)
    np.testing.assert_allclose(back["mean_value_b"], df["b"], rtol=1e-12)
