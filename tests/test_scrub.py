"""PII scrub + document chunking + row_number + top_bigrams oracles.

Planted-input tests: the sf testdata contains no PII and little unicode,
so the contract check alone would pass vacuously — these fixtures plant
emails/phones/IPs, multibyte chars, empty docs, and exact-boundary
lengths, then compare against DuckDB running the SAME SQL as the
catalog oracle (engine/queries_ml.py / engine/queries.py)."""

from __future__ import annotations

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

PII_DOCS = pd.DataFrame({
    "doc_id": np.arange(8, dtype=np.int64),
    "text": [
        "contact me at alice.smith+spam@example.co.uk or bob@x.io!",
        "call +1 (415) 555-0199 today",
        "server at 10.0.0.1 and 192.168.255.254, not 1234.5.6.7",
        "email ip mix: a@b.com lives at 8.8.8.8 phone 020 7946 0958",
        "",
        "no pii here, just text with numbers 42 and 7",
        "edge: @not-an-email, 12-34 too short, 999.999.999.999 odd ip",
        "héllo wörld — ünïcode text with an émail: jürgen@münchen.de is NOT ascii",
    ],
})


def _duck(df: pd.DataFrame, sql: str) -> pd.DataFrame:
    con = duckdb.connect()
    con.register("documents", df)
    return con.execute(sql).df()


def test_pii_scrub_matches_duckdb_oracle(ray_session):
    import ray.data as rd

    from engine.ops.scrub import pii_scrub
    from engine.queries_ml import ORACLE_SQL_ML

    got = (pii_scrub(rd.from_pandas(PII_DOCS)).to_pandas()
           .sort_values("doc_id").reset_index(drop=True))
    exp = _duck(PII_DOCS, ORACLE_SQL_ML["pii_scrub"]).sort_values("doc_id").reset_index(drop=True)
    assert list(got["text"]) == list(exp["text"])
    for c in ("n_email", "n_phone", "n_ip"):
        assert list(got[c]) == list(exp[c]), c
    # sanity on the planted rows (belt and braces vs a double-wrong oracle)
    assert "<EMAIL>" in got["text"][0] and got["n_email"][0] == 2
    assert "<PHONE>" in got["text"][1] and got["n_phone"][1] == 1
    assert got["n_ip"][2] == 2 and "1234.5.6.7" not in got["text"][2].replace("<IP>", "")
    # the ASCII pattern intentionally skips non-ASCII addresses — engine
    # and oracle must agree on skipping them, not just on matches
    assert got["n_email"][7] == 0 and "jürgen@münchen.de" in got["text"][7]


CHUNK_DOCS = pd.DataFrame({
    "doc_id": np.arange(7, dtype=np.int64),
    "text": [
        "",                    # empty -> 1 empty chunk
        "x" * 511,             # just under size
        "y" * 512,             # exactly size -> 1 chunk
        "z" * 513,             # size+1 -> 2 chunks
        "a" * 448 + "b" * 448 + "c" * 10,  # multiple steps
        "é" * 600,             # multibyte: char (not byte) windows
        "w" * 2000,
    ],
})


def test_chunk_documents_matches_duckdb_oracle(ray_session):
    import ray.data as rd

    from engine.ops.scrub import chunk_documents
    from engine.queries_ml import ORACLE_SQL_ML

    got = (chunk_documents(rd.from_pandas(CHUNK_DOCS), size=512, overlap=64).to_pandas()
           .sort_values(["doc_id", "chunk_idx"]).reset_index(drop=True))
    exp = (_duck(CHUNK_DOCS, ORACLE_SQL_ML["chunk_documents"])
           .sort_values(["doc_id", "chunk_idx"]).reset_index(drop=True))
    assert len(got) == len(exp)
    assert list(got["chunk_text"]) == list(exp["chunk_text"])
    assert list(got["n_chunk_chars"]) == list(exp["n_chunk_chars"])
    # expected chunk counts per doc: 1 + ceil(max(0, len-512)/448)
    counts = got.groupby("doc_id").size()
    assert list(counts) == [1, 1, 1, 2, 2, 2, 1 + -(-(2000 - 512) // 448)]
    # overlap property: consecutive chunks share exactly 64 chars
    d6 = got[got.doc_id == 6].reset_index(drop=True)
    assert d6.chunk_text[0][-64:] == d6.chunk_text[1][:64]


def test_chunk_documents_rejects_bad_overlap(ray_session):
    import ray.data as rd

    from engine.ops.scrub import chunk_documents

    with pytest.raises(ValueError):
        chunk_documents(rd.from_pandas(CHUNK_DOCS), size=100, overlap=100)


BIGRAM_DOCS = pd.DataFrame({
    "doc_id": np.arange(5, dtype=np.int64),
    "text": [
        "the cat sat on the mat",
        "The cat SAT!! on... the mat",   # case/punct-insensitive
        "cat",                           # single token -> no bigram
        "",                              # empty
        "!leading the cat trailing!",    # boundary empties never pair
    ],
})


def test_top_bigrams_matches_duckdb_oracle(ray_session):
    import ray.data as rd

    from engine.ops.textstats import top_bigrams
    from engine.queries_ml import ORACLE_SQL_ML

    got = (top_bigrams(rd.from_pandas(BIGRAM_DOCS), k=50).to_pandas()
           .sort_values(["cnt", "bigram"], ascending=[False, True]).reset_index(drop=True))
    exp = _duck(BIGRAM_DOCS, ORACLE_SQL_ML["top_bigrams"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(got, exp.astype(got.dtypes.to_dict()))
    assert got.iloc[0]["bigram"] == "the cat" and got.iloc[0]["cnt"] == 3


def test_top_bigrams_never_pairs_across_documents(ray_session):
    import ray.data as rd

    docs = pd.DataFrame({"doc_id": [0, 1], "text": ["alpha beta", "gamma delta"]})
    from engine.ops.textstats import top_bigrams

    got = set(top_bigrams(rd.from_pandas(docs), k=10).to_pandas()["bigram"])
    assert got == {"alpha beta", "gamma delta"}  # no "beta gamma"


def test_row_number_matches_duckdb(ray_session):
    import ray.data as rd

    from engine.ops.window import with_row_number

    rng = np.random.default_rng(7)
    n = 4000
    ev = pd.DataFrame({
        "event_id": np.arange(n, dtype=np.int64),
        "user_id": rng.integers(0, 60, n),
        "ts": pd.to_datetime("2024-01-01") + pd.to_timedelta(rng.integers(0, 80, n), unit="h"),
    })
    got = (with_row_number(rd.from_pandas(ev), entity="user_id", ts="ts",
                           tie_break="event_id", num_partitions=3)
           .to_pandas().sort_values("event_id").reset_index(drop=True))
    con = duckdb.connect()
    con.register("events", ev)
    exp = con.execute(
        "SELECT event_id, ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn "
        "FROM events ORDER BY event_id").df()
    assert list(got["rn"]) == list(exp["rn"])


def test_stage_task_caches_per_config(ray_session):
    """stage_task (round 4): the per-worker instance cache must key on
    class + constructor kwargs — two stages with different configs in one
    pipeline may land on the same worker process and must not share an
    instance; the same config must reuse one."""
    import pyarrow as pa

    from engine.ops.util import _STAGE_STATE, stage_task

    built = []

    class Tagger:
        def __init__(self, tag="x"):
            self.tag = tag
            built.append(tag)

        def __call__(self, t: pa.Table) -> pa.Table:
            return t.append_column("tag", pa.array([self.tag] * t.num_rows))

    t = pa.table({"a": [1, 2]})
    # driver-side direct calls exercise the same cache the workers use
    out1 = stage_task(t, _stage_cls=Tagger, tag="p")
    out2 = stage_task(t, _stage_cls=Tagger, tag="q")
    out3 = stage_task(t, _stage_cls=Tagger, tag="p")  # cache hit
    assert out1["tag"][0].as_py() == "p" and out2["tag"][0].as_py() == "q"
    assert out3["tag"][0].as_py() == "p"
    assert built == ["p", "q"]  # one construction per distinct config
    keys = [k for k in _STAGE_STATE if k[1].endswith("Tagger")]
    assert len(keys) == 2


MESSY_DOCS = pd.DataFrame({
    "doc_id": np.arange(7, dtype=np.int64),
    "text": [
        "  leading and trailing   ",
        "tabs\tand\nnewlines\r\nand \x0b\x0cverticals",  # VT/FF are control-stripped, not spaces
        "MiXeD CaSe TEXT",
        "ctrl\x00chars\x07here\x1f\x7fgone",
        "",
        "   \t \n  ",  # whitespace-only -> empty
        "already clean single spaced",
    ],
})


def test_normalize_text_matches_duckdb_oracle(ray_session):
    import ray.data as rd

    from engine.ops.scrub import normalize_text
    from engine.queries_ml import ORACLE_SQL_ML

    got = (normalize_text(rd.from_pandas(MESSY_DOCS).repartition(3))
           .to_pandas().sort_values("doc_id").reset_index(drop=True))
    exp = _duck(MESSY_DOCS, ORACLE_SQL_ML["normalize_text"] + " ORDER BY doc_id")
    assert got["text"].tolist() == exp["text"].tolist()
    assert got["n_chars"].tolist() == exp["n_chars"].tolist()
    # planted semantics, independent of the oracle
    assert got["text"][0] == "leading and trailing"
    assert got["text"][1] == "tabs and newlines and verticals"
    assert got["text"][2] == "mixed case text"
    assert got["text"][3] == "ctrlchars" + "here" + "gone"
    assert got["text"][4] == "" and got["text"][5] == ""
    assert got["text"][6] == "already clean single spaced"
