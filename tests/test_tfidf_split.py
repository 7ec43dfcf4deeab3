"""split_assign (deterministic train/val/test) and tfidf_top_terms vs
their DuckDB oracles, value-exact at sf0.001."""

import duckdb
import pandas as pd
import pytest

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    c.execute(f"CREATE VIEW documents AS SELECT * FROM read_parquet('{SF}/documents.parquet')")
    return c


def test_split_assign_matches_sql(ray_session, con):
    from engine.queries_ml import ORACLE_SQL_ML, q_split_assign

    got = (q_split_assign(SF).to_pandas()
           .sort_values("doc_id").reset_index(drop=True))
    exp = (con.execute(ORACLE_SQL_ML["split_assign"]).fetchdf()
           .sort_values("doc_id").reset_index(drop=True))
    pd.testing.assert_frame_equal(got[["doc_id", "split"]], exp[["doc_id", "split"]])
    # fractions land near their targets
    frac = got["split"].value_counts(normalize=True)
    assert abs(frac["train"] - 0.8) < 0.05
    assert abs(frac["val"] - 0.1) < 0.03
    assert abs(frac["test"] - 0.1) < 0.03


def test_split_assign_partition_invariant(ray_session):
    import ray.data as rd

    from engine.ops.agg import split_assign

    fr = {"train": 0.8, "val": 0.1, "test": 0.1}
    outs = []
    for p in (1, 7):
        ds = rd.read_parquet(f"{SF}/documents.parquet", columns=["doc_id"]).repartition(p)
        outs.append(split_assign(ds, "doc_id", fr).to_pandas()
                    .sort_values("doc_id").reset_index(drop=True))
    pd.testing.assert_frame_equal(outs[0], outs[1])


def test_split_assign_rejects_bad_fractions():
    from engine.ops.agg import _split_bounds

    with pytest.raises(ValueError):
        _split_bounds({"a": 0.5, "b": 0.6}, 1 << 32)


def test_tfidf_matches_sql(ray_session, con):
    from engine.queries_ml import ORACLE_SQL_ML, q_tfidf_top_terms

    key = ["doc_id", "term"]
    got = (q_tfidf_top_terms(SF).to_pandas()
           .sort_values(key).reset_index(drop=True))
    exp = (con.execute(ORACLE_SQL_ML["tfidf_top_terms"]).fetchdf()
           .sort_values(key).reset_index(drop=True))
    assert len(got) == len(exp)
    pd.testing.assert_frame_equal(
        got[["doc_id", "term", "tf", "df", "score_q"]],
        exp[["doc_id", "term", "tf", "df", "score_q"]],
        check_dtype=False)


def test_tfidf_partition_invariant(ray_session):
    import ray.data as rd

    from engine.ops.textstats import tfidf_top_terms

    outs = []
    for p in (1, 7):
        ds = rd.read_parquet(f"{SF}/documents.parquet",
                             columns=["doc_id", "text"]).repartition(p)
        outs.append(tfidf_top_terms(ds, k=5).to_pandas()
                    .sort_values(["doc_id", "term"]).reset_index(drop=True))
    pd.testing.assert_frame_equal(outs[0], outs[1])


def test_tfidf_join_path_matches_broadcast(ray_session):
    import ray.data as rd

    from engine.ops.textstats import tfidf_top_terms, tfidf_top_terms_join

    ds = rd.read_parquet(f"{SF}/documents.parquet", columns=["doc_id", "text"])
    key = ["doc_id", "term"]
    a = (tfidf_top_terms(ds, k=5).to_pandas()
         .sort_values(key).reset_index(drop=True))
    b = (tfidf_top_terms_join(ds, k=5).to_pandas()
         .sort_values(key).reset_index(drop=True))
    pd.testing.assert_frame_equal(a, b, check_dtype=False)


def test_weighted_sample_matches_sql(ray_session, con):
    from engine.queries_ml import ORACLE_SQL_ML, q_weighted_sample

    got = (q_weighted_sample(SF).to_pandas()
           .sort_values("doc_id").reset_index(drop=True))
    exp = (con.execute(ORACLE_SQL_ML["weighted_sample"]).fetchdf()
           .sort_values("doc_id").reset_index(drop=True))
    pd.testing.assert_frame_equal(got[["doc_id", "n_chars"]],
                                  exp[["doc_id", "n_chars"]],
                                  check_dtype=False)


def test_weighted_sample_partition_invariant_and_biased(ray_session):
    import numpy as np
    import ray.data as rd

    from engine.ops.agg import weighted_sample

    outs = []
    for p in (1, 7):
        ds = rd.read_parquet(f"{SF}/documents.parquet",
                             columns=["doc_id", "n_chars"]).repartition(p)
        outs.append(weighted_sample(ds, k=50, key="doc_id", weight_col="n_chars")
                    .to_pandas().sort_values("doc_id").reset_index(drop=True))
    pd.testing.assert_frame_equal(outs[0], outs[1])
    # weighting bias: sampled docs skew longer than the corpus mean
    import pyarrow.parquet as pq

    corpus_mean = pq.read_table(f"{SF}/documents.parquet",
                                columns=["n_chars"])["n_chars"].to_numpy().mean()
    assert outs[0]["n_chars"].mean() > corpus_mean
