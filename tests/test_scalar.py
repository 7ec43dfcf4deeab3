"""Scalar function catalog vs DuckDB (SURVEY §2.6 F*)."""

import duckdb
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from engine.ops import scalar as F

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in ["events", "documents", "embeddings"]:
        c.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')")
    return c


@pytest.fixture(scope="module")
def docs():
    return pq.read_table(f"{SF}/documents.parquet")


@pytest.fixture(scope="module")
def events():
    return pq.read_table(f"{SF}/events.parquet")


def test_string_fns(con, docs):
    got_len = F.str_length(docs["text"]).to_pylist()
    exp = con.execute("SELECT length(text) FROM documents").fetchdf().iloc[:, 0].tolist()
    assert got_len == exp
    got_tok = F.str_token_count(docs["text"].combine_chunks()).to_pylist()
    exp_tok = con.execute(
        r"SELECT array_length(string_split_regex(trim(text), '\s+')) FROM documents"
    ).fetchdf().iloc[:, 0].tolist()
    assert got_tok == exp_tok


def test_date_fns(con, events):
    got = F.date_trunc_day(events["ts"]).to_pylist()
    exp = con.execute("SELECT date_trunc('day', ts) FROM events").fetchdf().iloc[:, 0].tolist()
    assert [g for g in got] == [e.to_pydatetime() for e in exp]
    width = 6 * 3600 * 1_000_000
    got_b = F.ts_bucket(events["ts"], width).to_pylist()
    exp_b = con.execute(f"SELECT CAST(floor(epoch_us(ts) / {width}) AS BIGINT) FROM events").fetchdf().iloc[:, 0].tolist()
    assert got_b == exp_b


def test_json_extract(con, events):
    got = F.json_get_int(events["props"].combine_chunks(), "k").to_pylist()
    exp = con.execute(r"SELECT CAST(regexp_extract(props, '\"k\"\s*:\s*(-?\d+)', 1) AS BIGINT) FROM events").fetchdf().iloc[:, 0].tolist()
    assert got == exp


def test_math_fns(events):
    v = events["value"].combine_chunks()
    arr = v.to_numpy()
    np.testing.assert_allclose(F.log1p(v).to_numpy(), np.log1p(arr), rtol=1e-12)
    np.testing.assert_allclose(F.clip(v, 0.0, 50.0).to_numpy(), np.clip(arr, 0, 50), rtol=1e-12)
    d = F.safe_div(v, pa.array(np.zeros(len(arr)))).to_pylist()
    assert all(x is None for x in d)


def test_array_fns(con):
    emb = pq.read_table(f"{SF}/embeddings.parquet")
    got = F.l2norm(emb["embedding"]).to_numpy()
    exp = con.execute("""
        SELECT sqrt(sum(e * e)) FROM (SELECT vec_id, unnest(embedding) AS e FROM embeddings)
        GROUP BY vec_id ORDER BY vec_id""").fetchdf().iloc[:, 0].to_numpy()
    # embeddings rows are already vec_id-ordered in the parquet
    np.testing.assert_allclose(got, exp, rtol=1e-5)
