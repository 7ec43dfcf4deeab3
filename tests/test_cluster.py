"""Bucket clustering C1–C3 + salt planning (SURVEY §2.6, §2.4 J2)."""

import numpy as np
import pandas as pd
import pytest

from engine.ops.cluster import CENTROID_DIMS, bucket_stats, refine_clusters, with_cluster_features
from engine.ops.decode import FeaturizeActor
from engine.ops.salt import apply_salt, plan_salts


@pytest.fixture(scope="module")
def feats(images_1k):
    return FeaturizeActor()(images_1k)


def test_bucket_stats_match_pandas(ray_session, feats):
    import ray.data as rd

    got = bucket_stats(rd.from_arrow(feats).repartition(5)).sort_values("phash_bucket").reset_index(drop=True)
    df = feats.to_pandas()
    exp = df.groupby("phash_bucket").agg(
        bucket_size=("phash_bucket", "size"),
        **{f"centroid_{d}": (d, "mean") for d in CENTROID_DIMS},
    ).reset_index().sort_values("phash_bucket").reset_index(drop=True)
    assert (got["phash_bucket"].to_numpy() == exp["phash_bucket"].to_numpy()).all()
    assert (got["bucket_size"].to_numpy() == exp["bucket_size"].to_numpy()).all()
    for d in CENTROID_DIMS:
        np.testing.assert_allclose(got[f"centroid_{d}"], exp[f"centroid_{d}"], rtol=1e-9)


def test_salted_partials_same_result(ray_session, feats):
    """Two-level (salted) aggregation == unsalted aggregation."""
    import ray.data as rd

    ds = rd.from_arrow(feats).repartition(4)
    smap = plan_salts(ds, "phash_bucket", sample_frac=1.0, threshold=1.5, max_salt=8)
    assert smap, "hot-bucket fixture should trigger the salt planner"
    salted = apply_salt(ds, "phash_bucket", smap, tie_col="image_id")
    got = bucket_stats(salted, salt_col="__salt").sort_values("phash_bucket").reset_index(drop=True)
    exp = bucket_stats(ds).sort_values("phash_bucket").reset_index(drop=True)
    assert (got["bucket_size"].to_numpy() == exp["bucket_size"].to_numpy()).all()
    for d in CENTROID_DIMS:
        np.testing.assert_allclose(got[f"centroid_{d}"], exp[f"centroid_{d}"], rtol=1e-9)


def test_cluster_features_broadcast(ray_session, feats):
    import ray.data as rd

    out = with_cluster_features(rd.from_arrow(feats).repartition(3)).to_pandas()
    df = feats.to_pandas()
    sizes = df.groupby("phash_bucket")["phash_bucket"].transform("size")
    merged = out.sort_values("image_id").reset_index(drop=True)
    dfs = df.sort_values("image_id").reset_index(drop=True)
    assert (merged["bucket_size"].to_numpy() == sizes[dfs.index].to_numpy()).all()
    # distance: rows in singleton buckets are AT the centroid
    singles = merged[merged["bucket_size"] == 1]
    np.testing.assert_allclose(singles["centroid_dist"].to_numpy(), 0.0, atol=1e-9)


def test_refine_groups_near_duplicates(ray_session, feats):
    """The fixture's near-duplicate hot images must land in shared refined
    clusters (same base image +-1 jitter -> tiny Hamming distance)."""
    import ray.data as rd

    out = refine_clusters(rd.from_arrow(feats).repartition(3), radius=6).to_pandas()
    assert len(out) == feats.num_rows
    sizes = out.groupby("cluster_id").size()
    assert sizes.max() >= 5  # hot-base duplicates collapse
    # determinism
    out2 = refine_clusters(rd.from_arrow(feats), radius=6).to_pandas()
    m = out.sort_values("image_id").reset_index(drop=True)
    m2 = out2.sort_values("image_id").reset_index(drop=True)
    assert (m["cluster_id"].to_numpy() == m2["cluster_id"].to_numpy()).all()


def test_refine_degenerate_bucket_bounded(ray_session):
    """A planted hot bucket (5k identical phashes) must refine with
    star-capped pair emission — bounded memory, one component — and
    members beyond the cap still join the anchor's component."""
    import pyarrow as pa
    import ray.data as rd

    n = 5000
    t = pa.table({
        "image_id": pa.array(np.arange(n, dtype=np.int64)),
        "phash": pa.array(np.full(n, 1234567, dtype=np.int64)),
        "phash_bucket": pa.array(np.full(n, 7, dtype=np.int32)),
    })
    out = refine_clusters(rd.from_arrow(t).repartition(4), radius=3,
                          max_bucket=100).to_pandas()
    assert len(out) == n
    assert out["cluster_id"].nunique() == 1  # all identical -> one component
    assert (out["cluster_id"] == 7 * (1 << 32)).all()


def test_refine_matches_bruteforce_smallbuckets(ray_session):
    """Below the cap, components must equal brute-force single-linkage
    over the full Hamming matrix."""
    import pyarrow as pa
    import ray.data as rd

    from engine.ops.phash import hamming

    rng = np.random.default_rng(7)
    n = 300
    ph = rng.integers(-2**62, 2**62, n, dtype=np.int64)
    # plant near-identical pairs (flip 1-2 low bits)
    ph[50:100] = ph[0:50] ^ rng.integers(1, 4, 50)
    bucket = rng.integers(0, 5, n).astype(np.int32)
    bucket[50:100] = bucket[0:50]
    ids = np.arange(n, dtype=np.int64)
    t = pa.table({"image_id": ids, "phash": ph, "phash_bucket": bucket})
    out = (refine_clusters(rd.from_arrow(t).repartition(3), radius=3)
           .to_pandas().sort_values("image_id").reset_index(drop=True))

    # brute force per bucket
    exp = np.empty(n, dtype=np.int64)
    for bk in np.unique(bucket):
        rows = np.flatnonzero(bucket == bk)
        rows = rows[np.argsort(ids[rows])]
        d = hamming(ph[rows], ph[rows])
        adj = d <= 3
        m = len(rows)
        lab = np.arange(m)
        for _ in range(m):
            new = lab.copy()
            for i in range(m):
                new[i] = min(lab[adj[i]].min(), new[i])
            if (new == lab).all():
                break
            lab = new
        # rank components by min id (= min row since ids sorted)
        _, inv = np.unique(lab, return_inverse=True)
        exp[rows] = np.int64(bk) * (1 << 32) + inv
    assert (out["cluster_id"].to_numpy() == exp).all()
