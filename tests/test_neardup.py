"""Near-dup detection oracles: planted duplicates must be found; exact
verification must match brute-force NumPy."""

import numpy as np
import pandas as pd
import pytest


@pytest.fixture(scope="module")
def docs_with_dups():
    import pyarrow.parquet as pq

    t = pq.read_table("/root/testdata/sf0.001/documents.parquet").to_pandas()
    base = t.head(40)[["doc_id", "text"]].copy()
    dups = []
    for i, (_, r) in enumerate(base.head(10).iterrows()):
        words = r["text"].split()
        words[len(words) // 2] = "MUTATED"  # one-word edit -> high Jaccard
        dups.append({"doc_id": 10_000 + i, "text": " ".join(words)})
    return pd.concat([base, pd.DataFrame(dups)], ignore_index=True)


def test_minhash_finds_planted_dups(ray_session, docs_with_dups):
    import ray.data as rd

    from engine.ops.neardup import minhash_near_dup, shingle_hashes

    out = minhash_near_dup(rd.from_pandas(docs_with_dups), threshold=0.5).to_pandas()
    found = {(min(a, b), max(a, b)) for a, b in zip(out["a"], out["b"])}
    planted = {(i, 10_000 + k) for k, i in enumerate(docs_with_dups.head(10)["doc_id"])}
    recall = len(found & planted) / len(planted)
    assert recall >= 0.9, f"minhash recall {recall}"
    # verified jaccard must equal exact shingle jaccard
    sh = {r["doc_id"]: shingle_hashes(r["text"], 3) for _, r in docs_with_dups.iterrows()}
    for _, r in out.iterrows():
        exact = len(np.intersect1d(sh[r["a"]], sh[r["b"]])) / len(np.union1d(sh[r["a"]], sh[r["b"]]))
        assert abs(r["jaccard"] - exact) < 1e-5


def test_simhash_finds_planted_dups(ray_session, docs_with_dups):
    import ray.data as rd

    from engine.ops.neardup import SimHasher, simhash_near_dup
    from engine.ops.phash import hamming

    hs = np.array([SimHasher.simhash(x) for x in docs_with_dups["text"]], dtype=np.int64)
    ids = docs_with_dups["doc_id"].to_numpy()
    d = hamming(hs, hs)

    # pigeonhole guarantee: at max_hamming <= 3 with 4x16 bands, banding is
    # EXACT (any pair within 3 bits shares an untouched band)
    out3 = simhash_near_dup(rd.from_pandas(docs_with_dups), max_hamming=3).to_pandas()
    found3 = {(min(a, b), max(a, b)) for a, b in zip(out3["a"], out3["b"])}
    ii, jj = np.nonzero(np.triu(d <= 3, 1))
    exact3 = {(min(ids[i], ids[j]), max(ids[i], ids[j])) for i, j in zip(ii, jj)}
    assert found3 == exact3

    # beyond the guarantee (<=6): no false positives, decent recall on planted
    out6 = simhash_near_dup(rd.from_pandas(docs_with_dups), max_hamming=6).to_pandas()
    found6 = {(min(a, b), max(a, b)) for a, b in zip(out6["a"], out6["b"])}
    ii, jj = np.nonzero(np.triu(d <= 6, 1))
    exact6 = {(min(ids[i], ids[j]), max(ids[i], ids[j])) for i, j in zip(ii, jj)}
    assert found6 <= exact6
    planted_found = sum(1 for k, i in enumerate(docs_with_dups.head(10)["doc_id"])
                        if (i, 10_000 + k) in found6)
    assert planted_found >= 5


def test_embedding_lsh_recall_on_near_identical(ray_session):
    import ray.data as rd

    from engine.ops.neardup import embedding_near_dup_brute, embedding_near_dup_lsh

    rng = np.random.default_rng(0)
    base = rng.standard_normal((50, 32))
    near = base[:10] + rng.standard_normal((10, 32)) * 0.05  # cosine ~0.999
    m = np.vstack([base, near])
    df = pd.DataFrame({"vec_id": np.arange(60), "embedding": list(m.astype(np.float32))})
    ds = rd.from_pandas(df)
    brute = embedding_near_dup_brute(ds, threshold=0.95).to_pandas()
    lsh = embedding_near_dup_lsh(ds, threshold=0.95).to_pandas()
    bp = {(a, b) for a, b in zip(brute["a"], brute["b"])}
    lp = {(a, b) for a, b in zip(lsh["a"], lsh["b"])}
    planted = {(i, 50 + i) for i in range(10)}
    assert planted <= bp
    assert len(lp & planted) / len(planted) >= 0.9, "sign-LSH should recover near-identical pairs"
    assert lp <= bp  # no false pairs (both verify exactly)


def test_dup_groups_union_find():
    from engine.ops.neardup import dup_groups_from_pairs

    pairs = pd.DataFrame({"a": [1, 2, 5], "b": [2, 3, 6]})
    g = dup_groups_from_pairs(pairs).set_index("id")["group_id"]
    assert g[1] == g[2] == g[3]
    assert g[5] == g[6]
    assert g[1] != g[5]


def test_minhash_distributed_verify_matches_broadcast(ray_session, docs_with_dups):
    import ray.data as rd

    from engine.ops.neardup import minhash_near_dup

    a = minhash_near_dup(rd.from_pandas(docs_with_dups), threshold=0.5, verify="broadcast").to_pandas()
    b = minhash_near_dup(rd.from_pandas(docs_with_dups), threshold=0.5, verify="distributed").to_pandas()
    ka = sorted(zip(a["a"], a["b"], a["jaccard"]))
    kb = sorted(zip(b["a"], b["b"], b["jaccard"]))
    assert ka == kb


def test_dup_groups_distributed_matches_union_find(ray_session):
    """Min-label propagation (distributed connected components) must
    produce exactly the groups the driver-side union-find produces —
    including a chain (path graph) that needs several propagation
    rounds and a star component."""
    from engine.ops.neardup import dup_groups_distributed, dup_groups_from_pairs

    rng = np.random.default_rng(5)
    # chain 0-1-2-...-9, star 100-(101..110), random small blobs
    pairs = [(i, i + 1) for i in range(9)]
    pairs += [(100, 100 + i) for i in range(1, 11)]
    base = 200
    for _ in range(30):
        k = int(rng.integers(2, 5))
        ids = base + np.arange(k)
        pairs += [(int(ids[i]), int(ids[i + 1])) for i in range(k - 1)]
        base += k
    df = pd.DataFrame(pairs, columns=["a", "b"]).astype(np.int64)
    exp = dup_groups_from_pairs(df).sort_values("id").reset_index(drop=True)
    got = (dup_groups_distributed(df).to_pandas()
           .sort_values("id").reset_index(drop=True))
    pd.testing.assert_frame_equal(got.astype({"id": np.int64, "group_id": np.int64}),
                                  exp.astype({"id": np.int64, "group_id": np.int64}))


def test_dup_groups_distributed_string_ids(ray_session):
    from engine.ops.neardup import dup_groups_distributed, dup_groups_from_pairs

    df = pd.DataFrame({"a": ["d1", "d2", "d9"], "b": ["d2", "d3", "d8"]})
    exp = dup_groups_from_pairs(df).sort_values("id").reset_index(drop=True)
    got = (dup_groups_distributed(df).to_pandas()
           .sort_values("id").reset_index(drop=True))
    pd.testing.assert_frame_equal(got, exp)


def test_simhash_batch_matches_scalar():
    import pyarrow as pa

    from engine.ops.neardup import SimHasher

    texts = ["the quick brown fox", "", "one", "the quick brown fox jumps",
             "a b c d e f g", "zzz " * 50]
    t = pa.table({"doc_id": list(range(len(texts))), "text": texts})
    got = SimHasher()(t)["simhash"].to_pylist()
    exp = [np.int64(np.uint64(SimHasher.simhash(x))).item() for x in texts]
    # scalar simhash of "" iterates no tokens -> 0
    assert got == exp


def test_segmented_jaccard_matches_loop():
    """The one-lexsort batch kernel must be bit-identical to the per-pair
    searchsorted loop it replaced."""
    from engine.ops.neardup import segmented_jaccard

    rng = np.random.default_rng(7)
    xs, ys = [], []
    for _ in range(200):
        nx, ny = int(rng.integers(1, 60)), int(rng.integers(1, 60))
        pool = rng.integers(0, 80, size=nx + ny).astype(np.uint64)
        xs.append(np.unique(pool[:nx]))
        ys.append(np.unique(pool[nx:]))
    oa = np.concatenate([[0], np.cumsum([x.size for x in xs])]).astype(np.int64)
    ob = np.concatenate([[0], np.cumsum([y.size for y in ys])]).astype(np.int64)
    got = segmented_jaccard(oa, np.concatenate(xs), ob, np.concatenate(ys))
    for i, (x, y) in enumerate(zip(xs, ys)):
        pos = np.searchsorted(x, y)
        valid = pos < x.size
        inter = int(np.count_nonzero(x[pos[valid]] == y[valid]))
        exact = inter / (x.size + y.size - inter)
        assert got[i] == exact


def test_minhash_degenerate_bucket_bounded(ray_session):
    """A planted degenerate bucket (2k identical docs — web boilerplate)
    must complete with a BOUNDED pair count (star, not O(B^2)) while
    keeping the component connected (the property dedup-grouping needs)."""
    import ray.data as rd

    from engine.ops.neardup import dup_groups_distributed, minhash_near_dup

    n = 2000
    df = pd.DataFrame({"doc_id": np.arange(n),
                       "text": ["exactly the same boilerplate text repeated again and again"] * n})
    pairs = minhash_near_dup(rd.from_pandas(df), threshold=0.5, max_bucket=200)
    pdf = pairs.to_pandas()
    assert len(pdf) == n - 1, f"star should emit n-1 pairs, got {len(pdf)}"
    assert (pdf["jaccard"] == 1.0).all()
    groups = dup_groups_distributed(pairs).to_pandas()
    assert groups["group_id"].nunique() == 1
    assert len(groups) == n


def test_simhash_and_emb_lsh_degenerate_bucket_bounded(ray_session):
    import ray.data as rd

    from engine.ops.neardup import embedding_near_dup_lsh, simhash_near_dup

    n = 1500
    df = pd.DataFrame({"doc_id": np.arange(n), "text": ["same words each time"] * n})
    out = simhash_near_dup(rd.from_pandas(df), max_hamming=3, max_bucket=100).to_pandas()
    assert len(out) == n - 1
    assert (out["hamming"] == 0).all()

    vec = np.ones(16, dtype=np.float32)
    dfe = pd.DataFrame({"vec_id": np.arange(n), "embedding": [vec] * n})
    out = embedding_near_dup_lsh(rd.from_pandas(dfe), threshold=0.9, max_bucket=100).to_pandas()
    assert len(out) == n - 1
    assert np.allclose(out["cosine"], 1.0)


def _ref_shingles(text: str, k: int = 3) -> np.ndarray:
    """Per-doc reference loop for the batch kernel: same token hash
    (pandas SipHash) and rolling FNV polynomial, written row-at-a-time."""
    import re

    FNV_OFFSET, FNV_PRIME = np.uint64(14695981039346656037), np.uint64(1099511628211)
    toks = [t for t in re.split(r"\s+", text) if t]
    th = (pd.util.hash_array(np.array(toks, dtype=object)).astype(np.uint64)
          if toks else np.empty(0, np.uint64))
    out = []
    if len(toks) >= k:
        for i in range(len(toks) - k + 1):
            h = FNV_OFFSET
            for j in range(k):
                h = h * FNV_PRIME + th[i + j]
            out.append(h)
    else:
        h = FNV_OFFSET
        for j in range(len(toks)):
            h = h * FNV_PRIME + th[j]
        out.append(h)
    return np.unique(np.array(out, dtype=np.uint64))


def test_shingle_batch_matches_per_doc_loop(docs_with_dups):
    import pyarrow as pa

    from engine.ops.neardup import shingle_hashes_batch

    texts = list(docs_with_dups["text"]) + ["", "one", "two words", "a  b\t c\nd", "  "]
    offs, flat = shingle_hashes_batch(pa.array(texts, pa.string()), 3)
    assert offs.size == len(texts) + 1 and offs[-1] == flat.size
    for i, txt in enumerate(texts):
        got = flat[offs[i]:offs[i + 1]]
        ref = _ref_shingles(txt, 3)
        np.testing.assert_array_equal(got, ref, err_msg=f"doc {i!r}")
        assert got.size >= 1  # even empty docs emit the FNV basis


def test_minhash_batch_matches_per_doc(docs_with_dups):
    import pyarrow as pa

    from engine.ops.neardup import MinHasher, shingle_hashes

    mh = MinHasher(num_perm=32)
    texts = list(docs_with_dups["text"].head(20)) + ["", "tiny doc"]
    sigs = mh.signatures_batch(pa.array(texts, pa.string()))
    M = np.uint64((1 << 61) - 1)
    for i, txt in enumerate(texts):
        sh = shingle_hashes(txt, 3)
        ref = ((sh[:, None] * mh.a[None, :] + mh.b[None, :]) % M).min(axis=0)
        np.testing.assert_array_equal(sigs[i], ref)


def test_ngram_jaccard_finds_planted_dups_exactly(ray_session, docs_with_dups):
    """The inverted-index path must find EVERY planted pair (recall is
    exact below the df cap, unlike minhash banding) with the exact
    per-pair Jaccard from the per-doc reference sets."""
    import ray.data as rd

    from engine.ops.neardup import ngram_jaccard_near_dup, shingle_hashes

    out = ngram_jaccard_near_dup(rd.from_pandas(docs_with_dups), threshold=0.5).to_pandas()
    found = {(min(a, b), max(a, b)) for a, b in zip(out["a"], out["b"])}
    planted = {(i, 10_000 + k) for k, i in enumerate(docs_with_dups.head(10)["doc_id"])}
    assert planted <= found, planted - found
    sh = {r.doc_id: shingle_hashes(r.text) for r in docs_with_dups.itertuples()}
    for r in out.itertuples():
        inter = np.intersect1d(sh[r.a], sh[r.b], assume_unique=True).size
        union = np.union1d(sh[r.a], sh[r.b]).size
        assert r.jaccard == round(inter / union, 6), (r.a, r.b)
        assert r.jaccard >= 0.5


def test_ngram_jaccard_df_cap_drops_stop_shingles(ray_session):
    """Docs that ONLY share shingles above the df cap must produce no
    pairs (stop-shingle blocking), while docs sharing a rare shingle
    still pair."""
    import ray.data as rd

    boiler = "common header line repeated everywhere in this corpus"
    docs = [{"doc_id": i, "text": f"{boiler} unique{i} filler{i} tail{i}"} for i in range(8)]
    docs += [{"doc_id": 100, "text": f"{boiler} rare shared suffix alpha"},
             {"doc_id": 101, "text": f"{boiler} rare shared suffix alpha"}]
    ds = rd.from_pandas(pd.DataFrame(docs))
    from engine.ops.neardup import ngram_jaccard_near_dup

    out = ngram_jaccard_near_dup(ds, threshold=0.3, df_cap=5).to_pandas()
    pairs = {(min(a, b), max(a, b)) for a, b in zip(out["a"], out["b"])}
    # the boilerplate 3-grams have df=10 > 5, so the first 8 docs (whose
    # only common shingles are boilerplate) never become candidates
    assert all(p == (100, 101) for p in pairs), pairs
    assert (100, 101) in pairs


def test_ngram_jaccard_join_path_matches_broadcast(ray_session, docs_with_dups):
    """size_broadcast_threshold=0 forces the per-doc size table through
    the distributed equi-join path; results must be identical to the
    default broadcast path (same pairs, same jaccard values)."""
    import ray.data as rd

    from engine.ops.neardup import ngram_jaccard_near_dup

    ds = rd.from_pandas(docs_with_dups)
    key = lambda df: df.assign(a=df[["a", "b"]].min(axis=1), b=df[["a", "b"]].max(axis=1)) \
        .sort_values(["a", "b"]).reset_index(drop=True)
    bc = key(ngram_jaccard_near_dup(ds, threshold=0.5).to_pandas())
    jn = key(ngram_jaccard_near_dup(ds, threshold=0.5,
                                    size_broadcast_threshold=0).to_pandas())
    pd.testing.assert_frame_equal(bc[["a", "b", "jaccard"]], jn[["a", "b", "jaccard"]])


def test_dup_groups_auto_dispatch_matches_distributed(ray_session):
    import ray.data as rd

    from engine.ops.neardup import dup_groups, dup_groups_distributed

    pairs = pd.DataFrame({"a": [1, 2, 5, 9, 9], "b": [2, 3, 6, 10, 11]})
    auto = dup_groups(rd.from_pandas(pairs)).to_pandas().sort_values("id").reset_index(drop=True)
    dist = (dup_groups_distributed(rd.from_pandas(pairs)).to_pandas()
            .sort_values("id").reset_index(drop=True))
    pd.testing.assert_frame_equal(auto, dist)
    # forcing the distributed path through the dispatcher (threshold 0)
    forced = (dup_groups(rd.from_pandas(pairs), small_threshold=0).to_pandas()
              .sort_values("id").reset_index(drop=True))
    pd.testing.assert_frame_equal(forced, dist)


def test_dedup_keep_best_invariants(ray_session):
    """Every dup group contributes exactly one survivor (its max-n_chars,
    min-doc_id member); unpaired docs all survive; no doc appears twice."""
    from engine.queries_ml import q_dedup_keep_best, q_dup_groups, _read

    sf = "/root/testdata/sf0.001"
    kept = q_dedup_keep_best(sf)
    groups = q_dup_groups(sf)
    docs = _read(sf, "documents", columns=["doc_id", "n_chars"]).to_pandas()

    assert kept["doc_id"].is_unique
    paired = set(groups["id"])
    solo = set(docs["doc_id"]) - paired
    assert solo <= set(kept["doc_id"])  # every unpaired doc survives
    assert len(kept) == len(solo) + groups["group_id"].nunique()
    gmap = dict(zip(groups["id"], groups["group_id"]))
    meta = docs.set_index("doc_id")["n_chars"]
    kept_paired = [d for d in kept["doc_id"] if d in paired]
    for d in kept_paired:
        members = [i for i, g in gmap.items() if g == gmap[d]]
        best = sorted(members, key=lambda i: (-meta[i], i))[0]
        assert d == best
