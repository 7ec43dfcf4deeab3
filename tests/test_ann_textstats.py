"""ANN (brute + IVF) and text-analysis oracles."""

import numpy as np
import pandas as pd
import pytest


def _emb(ray_session):
    import ray.data as rd

    return rd.read_parquet("/root/testdata/sf0.001/embeddings.parquet",
                           columns=["vec_id", "embedding"])


def test_topk_matches_numpy(ray_session):
    import pyarrow.parquet as pq

    from engine.ops.ann import topk_cosine

    t = pq.read_table("/root/testdata/sf0.001/embeddings.parquet").to_pandas()
    m = np.stack(t["embedding"].to_numpy()).astype(np.float64)
    ids = t["vec_id"].to_numpy()
    mn = m / np.linalg.norm(m, axis=1, keepdims=True)
    q = mn[:3]
    out = topk_cosine(_emb(ray_session), q, k=4, query_ids=np.array([0, 1, 2])).to_pandas()
    for qi in range(3):
        scores = mn @ q[qi]
        order = np.lexsort((ids, -scores))[:4]
        got = out[out["query_id"] == qi].sort_values(["score", "vec_id"], ascending=[False, True])
        assert list(got["vec_id"]) == list(ids[order])
        np.testing.assert_allclose(got["score"].to_numpy(), np.round(scores[order], 5), atol=2e-5)


def test_ivf_recall(ray_session):
    from engine.ops.ann import build_ivf, topk_cosine, topk_cosine_ivf

    import pyarrow.parquet as pq

    t = pq.read_table("/root/testdata/sf0.001/embeddings.parquet").to_pandas()
    m = np.stack(t["embedding"].to_numpy()).astype(np.float64)
    q = m[:5]
    exact = topk_cosine(_emb(ray_session), q, k=5).to_pandas()
    indexed, cents = build_ivf(_emb(ray_session), n_centroids=8)
    approx = topk_cosine_ivf(indexed, cents, q, k=5, nprobe=6).to_pandas()
    recalls = []
    for qi in range(5):
        e = set(exact[exact["query_id"] == qi]["vec_id"])
        a = set(approx[approx["query_id"] == qi]["vec_id"])
        recalls.append(len(e & a) / len(e))
    assert np.mean(recalls) >= 0.6, recalls  # nprobe=6/8 probes most of the space


def test_token_counter_oracle(ray_session):
    import ray.data as rd
    import re

    from engine.ops.textstats import BPE_PATTERN, TokenCounter

    docs = rd.read_parquet("/root/testdata/sf0.001/documents.parquet",
                           columns=["doc_id", "text"])
    out = docs.map_batches(TokenCounter, batch_format="pyarrow", concurrency=1).to_pandas().sort_values("doc_id")
    df = pd.read_parquet("/root/testdata/sf0.001/documents.parquet").sort_values("doc_id")
    pat = re.compile(BPE_PATTERN)
    assert (out["n_tokens_ws"].to_numpy() == df["text"].map(lambda x: len(x.split())).to_numpy()).all()
    assert (out["n_tokens_bpe"].to_numpy() == df["text"].map(lambda x: len(pat.findall(x))).to_numpy()).all()


def test_bpe_count_kernel_matches_findall_adversarial():
    """The lookahead-free RE2 count pattern must count exactly like the
    Python findall reference on boundary-heavy ASCII text (trailing
    runs, multi-space gaps, contractions, digit/punct runs)."""
    import re

    import pyarrow as pa
    import pyarrow.compute as pc

    from engine.ops.textstats import BPE_COUNT_FIXUP, BPE_COUNT_PATTERN, BPE_PATTERN

    pat = re.compile(BPE_PATTERN)
    rng = np.random.default_rng(7)
    pieces = ["word", "Don't", "it's", "we'll", "I've", "you're", "42",
              "3.14", "!!", "--", ",", " ", "  ", "   ", "\t", "\n", "\n\n",
              "a", "X", "...", "end "]
    cases = ["", " ", "   ", "a", "don't stop", "a  b", "tail   ", "\t\nmix  \n"]
    cases += ["".join(rng.choice(pieces, size=rng.integers(1, 40))) for _ in range(200)]
    arr = pa.array(cases)
    got = pc.add(pc.count_substring_regex(arr, BPE_COUNT_PATTERN),
                 pc.count_substring_regex(arr, BPE_COUNT_FIXUP)).to_pylist()
    want = [len(pat.findall(c)) for c in cases]
    assert got == want


def test_fingerprinter_batch_matches_per_doc(ray_session):
    """Batch winnowing (one pass over the Arrow buffer) must equal the
    per-document reference exactly, including docs shorter than k and
    docs with <= w k-grams."""
    import ray.data as rd

    from engine.ops.textstats import Fingerprinter, winnow_fingerprints

    texts = ["the quick brown fox jumps over the lazy dog " * 3,
             "", "a", "short", "exactly8", "exactly8!", "exactly8!!",
             "abcdefghijk", "repeat " * 50, "zebra quagga okapi " * 7]
    df = pd.DataFrame({"doc_id": range(len(texts)), "text": texts})
    out = (rd.from_pandas(df).map_batches(Fingerprinter, batch_format="pyarrow", concurrency=1)
           .to_pandas().sort_values("doc_id").reset_index(drop=True))
    for i, txt in enumerate(texts):
        ref = winnow_fingerprints(txt)
        assert out["n_fingerprints"][i] == len(ref), (i, txt)
        assert out["min_fingerprint"][i] == int(ref.min()), (i, txt)


def test_langid_deterministic_and_scored(ray_session):
    import ray.data as rd

    from engine.ops.textstats import LangId

    df = pd.DataFrame({
        "doc_id": [1, 2, 3],
        "text": ["the thing and the other thing for the win",
                 "der schule und die kirche ich bin schon",
                 "xxxx zzzz qqqq"],
    })
    out = rd.from_pandas(df).map_batches(LangId, batch_format="pyarrow", concurrency=1).to_pandas().sort_values("doc_id")
    assert out["pred_lang"].iloc[0] == "en"
    assert out["pred_lang"].iloc[1] == "de"
    assert out["pred_lang"].iloc[2] == "und"  # no profile evidence
    out2 = rd.from_pandas(df).map_batches(LangId, batch_format="pyarrow", concurrency=1).to_pandas().sort_values("doc_id")
    assert (out["pred_lang"] == out2["pred_lang"]).all()


def test_fingerprints_robust_to_local_edit():
    from engine.ops.textstats import winnow_fingerprints

    a = "the quick brown fox jumps over the lazy dog " * 5
    b = a.replace("lazy", "hazy", 1)
    fa, fb = winnow_fingerprints(a), winnow_fingerprints(b)
    overlap = len(np.intersect1d(fa, fb)) / len(np.union1d(fa, fb))
    assert overlap > 0.5  # local edit keeps most fingerprints
    c = "completely different content with no shared substrings at all zebra"
    fc = winnow_fingerprints(c)
    assert len(np.intersect1d(fa, fc)) / len(np.union1d(fa, fc)) < 0.1


def test_multimodal_stubs(ray_session):
    import ray.data as rd

    from engine.ops.multimodal import (AudioFeatureStage, VideoFrameSampleStage, decode_stage)

    rows = [{"id": f"x{i}", "bytes": bytes([i % 7] * 1000)} for i in range(20)]
    ds = rd.from_items(rows)
    # audio decode is now REAL (stdlib WAV): non-WAV payloads fail decode
    with pytest.raises(Exception):
        decode_stage(ds, AudioFeatureStage, id_col="id", fake=False).count()
    # video demux remains an honest stub: non-fake raises NotImplementedError
    with pytest.raises(Exception) as ei:
        decode_stage(ds, VideoFrameSampleStage, id_col="id", fake=False).count()
    assert "NotImplementedError" in str(ei.value) or isinstance(ei.value, NotImplementedError)
    audio = decode_stage(ds, AudioFeatureStage, id_col="id", fake=True).to_pandas()
    assert len(audio) == 20 and {"rms", "spectral_centroid"} <= set(audio.columns)
    # determinism of the fake
    audio2 = decode_stage(ds, AudioFeatureStage, id_col="id", fake=True).to_pandas()
    pd.testing.assert_frame_equal(audio.sort_values("id").reset_index(drop=True),
                                  audio2.sort_values("id").reset_index(drop=True))
    frames = decode_stage(ds, VideoFrameSampleStage, id_col="id", fake=True).to_pandas()
    assert (frames.groupby("id").size() == 1).all() or len(frames) >= 20
