"""Oracles for engine/ops/pq.py: codebook shapes, encode determinism
across partitionings, ADC+rerank recall vs brute force, and the
zero-copy fixed-size-binary code path."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest


def _emb(ray_session):
    import ray.data as rd

    return rd.read_parquet("/root/testdata/sf0.001/embeddings.parquet",
                           columns=["vec_id", "embedding"])


def test_pq_train_shapes(ray_session):
    from engine.ops.pq import pq_train

    books = pq_train(_emb(ray_session), m=8, n_codes=16)
    assert books.shape == (8, 16, 8)  # 64-dim / 8 subspaces
    assert np.isfinite(books).all()


def test_pq_encode_partition_invariant(ray_session):
    """Codes are a pure function of (vector, codebooks): identical
    across partition layouts."""
    from engine.ops.pq import pq_encode, pq_train

    ds = _emb(ray_session)
    books = pq_train(ds, m=8, n_codes=16)
    a = pq_encode(ds, books).to_pandas().sort_values("vec_id")
    b = pq_encode(ds.repartition(7), books).to_pandas().sort_values("vec_id")
    assert list(a["pq_code"]) == list(b["pq_code"])
    assert all(len(c) == 8 for c in a["pq_code"])


def test_pq_topk_recall_with_rerank(ray_session):
    """ADC top-rerank + exact re-rank should recover most of the exact
    top-k (rerank=64 on a 200-row corpus is generous by design — the
    property under test is the plumbing, not a tuned recall curve)."""
    import pyarrow.parquet as pq_

    from engine.ops.ann import topk_cosine
    from engine.ops.pq import pq_encode, pq_topk, pq_train

    t = pq_.read_table("/root/testdata/sf0.001/embeddings.parquet").to_pandas()
    m = np.stack(t["embedding"].to_numpy()).astype(np.float64)
    q = m[:5]
    ds = _emb(ray_session)
    exact = topk_cosine(ds, q, k=5).to_pandas()
    books = pq_train(ds, m=8, n_codes=32)
    enc = pq_encode(ds, books).materialize()
    approx = pq_topk(enc, books, q, k=5, rerank=64).to_pandas()
    recalls = []
    for qi in range(5):
        e = set(exact[exact["query_id"] == qi]["vec_id"])
        a = set(approx[approx["query_id"] == qi]["vec_id"])
        recalls.append(len(e & a) / len(e))
    assert np.mean(recalls) >= 0.8, recalls
    # re-ranked scores are EXACT cosines: wherever ids agree, scores agree
    merged = approx.merge(exact, on=["query_id", "vec_id"], suffixes=("_a", "_e"))
    np.testing.assert_allclose(merged["score_a"], merged["score_e"], atol=2e-5)


def test_pq_codes_survive_parquet_roundtrip(ray_session, tmp_path):
    """write_parquet downcasts fixed_size_binary to variable binary;
    the scan path must handle both."""
    from engine.ops.pq import pq_encode, pq_topk, pq_train

    ds = _emb(ray_session)
    books = pq_train(ds, m=8, n_codes=16)
    enc = pq_encode(ds, books)
    enc.write_parquet(str(tmp_path / "enc"))
    import ray.data as rd

    back = rd.read_parquet(str(tmp_path / "enc"))
    m = np.stack(ds.to_pandas()["embedding"].to_numpy()).astype(np.float64)
    out = pq_topk(back, books, m[:2], k=3, rerank=32).to_pandas()
    assert len(out) == 6
    assert out.groupby("query_id").size().tolist() == [3, 3]
