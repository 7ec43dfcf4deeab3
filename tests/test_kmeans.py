"""Distributed Lloyd k-means: blob recovery, partition invariance,
empty-cluster handling."""

import numpy as np
import pandas as pd

from engine.ops.kmeans import _assign, _kmeans_pp_init, kmeans_assign, kmeans_fit

D = 8


def _blobs(n_per=120, seed=7):
    rng = np.random.default_rng(seed)
    centers = np.array([[5.0] * D, [-5.0] * D, [5.0] * (D // 2) + [-5.0] * (D // 2)])
    pts = np.concatenate([c + rng.normal(0, 0.3, size=(n_per, D)) for c in centers])
    df = pd.DataFrame({"vec_id": np.arange(len(pts)),
                       "embedding": [row.astype(np.float32) for row in pts]})
    return df, centers


def test_kmeans_recovers_blobs_and_is_partition_invariant(ray_session):
    import ray.data as rd

    df, true_centers = _blobs()
    cents1 = kmeans_fit(rd.from_pandas(df).repartition(1), k=3, iters=8, seed=3)
    cents7 = kmeans_fit(rd.from_pandas(df).repartition(7), k=3, iters=8, seed=3)
    # same data, same init -> same fixpoint; partials only change float
    # combine order
    np.testing.assert_allclose(np.sort(cents1, axis=0), np.sort(cents7, axis=0),
                               rtol=0, atol=1e-9)
    # each true center matched by exactly one fitted centroid within noise
    d2 = ((cents1[:, None, :] - true_centers[None, :, :]) ** 2).sum(-1)
    match = d2.min(axis=1)
    assert (match < 0.05).all(), d2
    assert sorted(d2.argmin(axis=1)) == [0, 1, 2]

    out = kmeans_assign(rd.from_pandas(df).repartition(4), cents1,
                        dist_col="d2").to_pandas().sort_values("vec_id")
    labels = out["cluster"].to_numpy()
    # every blob is one pure cluster
    for b in range(3):
        blob = labels[b * 120:(b + 1) * 120]
        assert (blob == blob[0]).all()
    assert len(set(labels)) == 3
    assert (out["d2"].to_numpy() >= 0).all()


def test_kmeans_empty_clusters_keep_centroid(ray_session):
    """k larger than the number of distinct point locations: surplus
    centroids must stay finite (keep their previous position)."""
    import ray.data as rd

    pts = np.array([[0.0] * D] * 50 + [[9.0] * D] * 50)
    df = pd.DataFrame({"vec_id": np.arange(100), "embedding": list(pts)})
    cents = kmeans_fit(rd.from_pandas(df), k=5, iters=4, seed=0)
    assert np.isfinite(cents).all()
    # the two occupied locations are recovered exactly
    got = {tuple(np.round(c, 6)) for c in cents}
    assert tuple([0.0] * D) in got and tuple([9.0] * D) in got


def test_kmeans_pp_init_deterministic():
    m = np.random.default_rng(0).normal(size=(200, D))
    a = _kmeans_pp_init(m, 4, seed=11)
    b = _kmeans_pp_init(m, 4, seed=11)
    np.testing.assert_array_equal(a, b)
    # assignment kernel agrees with brute-force distances
    lab = _assign(m, a)
    brute = np.argmin(((m[:, None, :] - a[None, :, :]) ** 2).sum(-1), axis=1)
    np.testing.assert_array_equal(lab, brute)


def test_ivf_lloyd_iters_recall_at_least_single_step(ray_session):
    """build_ivf(lloyd_iters>1) trains with distributed spherical k-means;
    recall vs brute force must be at least the single-step trainer's."""
    import ray.data as rd

    from engine.ops.ann import build_ivf, topk_cosine, topk_cosine_ivf

    rng = np.random.default_rng(5)
    pts = rng.normal(size=(400, D)).astype(np.float32)
    df = pd.DataFrame({"vec_id": np.arange(400), "embedding": list(pts)})
    q = pts[:8].astype(np.float64)

    brute = topk_cosine(rd.from_pandas(df), q, k=5).to_pandas()
    truth = {(r.query_id, r.vec_id) for r in brute.itertuples()}

    def recall(iters):
        idx, cents = build_ivf(rd.from_pandas(df), n_centroids=8, lloyd_iters=iters)
        got = topk_cosine_ivf(idx, cents, q, k=5, nprobe=3).to_pandas()
        hits = {(r.query_id, r.vec_id) for r in got.itertuples()}
        return len(hits & truth) / len(truth)

    r1, r5 = recall(1), recall(5)
    assert r5 >= r1 - 0.05, (r1, r5)
    assert r5 >= 0.5
