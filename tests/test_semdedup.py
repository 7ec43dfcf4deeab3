"""SemDeDup parity: the distributed cluster+greedy-prune pipeline must
match a sequential NumPy twin exactly (same centroids, same id order),
and planted near-identical vectors must be pruned."""

import numpy as np
import pandas as pd
import pytest


@pytest.fixture(scope="module")
def emb_with_dups():
    import pyarrow.parquet as pq

    t = pq.read_table("/root/testdata/sf0.001/embeddings.parquet").to_pandas()
    base = t.head(120)[["vec_id", "embedding"]].copy()
    dups = []
    for i, (_, r) in enumerate(base.head(15).iterrows()):
        v = np.asarray(r["embedding"], dtype=np.float32).copy()
        v[0] += 1e-4  # near-identical -> cosine ~1
        dups.append({"vec_id": 50_000 + i, "embedding": v.tolist()})
    return pd.concat([base, pd.DataFrame(dups)], ignore_index=True)


def _sequential_semdedup(df, cents, threshold):
    """Sequential twin of the engine's cluster+greedy-prune semantics."""
    m = np.stack(df["embedding"].to_numpy()).astype(np.float64)
    m /= np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-12)
    cid = np.argmax(m @ cents.T, axis=1)
    ids = df["vec_id"].to_numpy()
    kept = {}
    out = {}
    for c in np.unique(cid):
        rows = np.flatnonzero(cid == c)
        rows = rows[np.argsort(ids[rows], kind="stable")]
        kept_rows = []
        for r in rows:
            s = float(np.max(m[kept_rows] @ m[r])) if kept_rows else 0.0
            keep = not kept_rows or s < threshold
            if keep:
                kept_rows.append(r)
            out[ids[r]] = (int(c), keep, s)
    return out


def test_semdedup_matches_sequential_twin(ray_session, emb_with_dups):
    import ray.data as rd

    from engine.ops.neardup import _sem_centroids, semdedup

    ds = rd.from_pandas(emb_with_dups)
    cents = _sem_centroids(ds, 4, "vec_id", "embedding", 0.5, 42)
    got = semdedup(ds, threshold=0.7, n_clusters=4, sample_frac=0.5).to_pandas()

    want = _sequential_semdedup(emb_with_dups, cents, 0.7)
    assert len(got) == len(emb_with_dups)
    for _, r in got.iterrows():
        c, keep, s = want[r["vec_id"]]
        assert r["centroid_id"] == c
        assert bool(r["kept"]) == keep, r["vec_id"]
        assert abs(r["nn_sim"] - s) < 1e-9


def test_semdedup_prunes_planted_near_identicals(ray_session, emb_with_dups):
    import ray.data as rd

    from engine.ops.neardup import semdedup

    out = semdedup(rd.from_pandas(emb_with_dups), threshold=0.95,
                   n_clusters=4, sample_frac=0.5).to_pandas()
    planted = out[out["vec_id"] >= 50_000]
    # each planted twin sits in the same cluster as its original and has
    # LOWER id-order priority -> must be dropped (cosine ~ 1 >= 0.95)
    assert (~planted["kept"]).mean() >= 0.9
    # originals all survive relative to their twins: at least the 120
    # base rows minus genuine near-dups remain kept
    assert out["kept"].sum() >= 100


def test_semdedup_partition_invariance(ray_session, emb_with_dups):
    import ray.data as rd

    from engine.ops.neardup import semdedup

    outs = []
    for p in (1, 5):
        ds = rd.from_pandas(emb_with_dups).repartition(p)
        o = semdedup(ds, threshold=0.7, n_clusters=4, sample_frac=0.5).to_pandas()
        outs.append(o.sort_values("vec_id").reset_index(drop=True)[
            ["vec_id", "centroid_id", "kept"]])
    pd.testing.assert_frame_equal(outs[0], outs[1])
