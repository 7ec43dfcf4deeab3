"""Phash-bucket clustering (SURVEY.md §2.6 C1–C3; reference R6 DBSCAN
recast as Hamming-prefix density buckets).

C1 bucket stats run as PARTIAL-then-FINAL aggregation: each map_batches
task pre-reduces its batch to one row per bucket (sum/count of the
descriptor dims), so the groupby shuffle moves O(buckets) rows, not
O(images) — the combiner pattern SURVEY §4.1 demands at 10^12 scale.
The final per-bucket table (<= 2^prefix_bits rows) is broadcast back
(ray.put) to attach bucket_size / centroid_dist to every image (C3) with
NO second shuffle.

C2 refines within a bucket: exact single-linkage over Hamming(phash) <= r
via union-find on the popcount matrix — buckets are bounded (hot ones are
salted upstream), so the quadratic step stays local and small.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from engine.ops.phash import hamming

CENTROID_DIMS = ["mean_r", "mean_g", "mean_b", "std_r", "std_g", "std_b", "entropy"]


def bucket_partials(t: pa.Table, salt_col: str | None = None) -> pa.Table:
    """Per-batch partial: one row per (bucket[, salt]) with count + sums."""
    b = t["phash_bucket"].to_numpy(zero_copy_only=False)
    group = b.astype(np.int64)
    if salt_col is not None and salt_col in t.column_names:
        group = group * 64 + t[salt_col].to_numpy(zero_copy_only=False)
    uniq, inv = np.unique(group, return_inverse=True)
    buckets = (uniq // 64).astype(np.int32) if salt_col else uniq.astype(np.int32)
    cols = {"phash_bucket": buckets, "n": np.bincount(inv).astype(np.int64)}
    for d in CENTROID_DIMS:
        v = t[d].to_numpy(zero_copy_only=False).astype(np.float64)
        sums = np.zeros(len(uniq))
        np.add.at(sums, inv, v)
        cols[f"sum_{d}"] = sums
    return pa.table(cols)


def bucket_stats(features, salt_col: str | None = None, mode: str = "driver") -> pd.DataFrame:
    """-> small driver-side DataFrame: phash_bucket, bucket_size, centroid dims.

    The result is ALWAYS small (bucket space is bounded by 2^prefix_bits =
    65536 rows), so the final combine is a small-side aggregate:

    - "driver" (default): stream the per-block partials (<= 65536 rows per
      block, ~40B/row) to the driver and np.add.at-combine into one array.
      Ingest is O(blocks x distinct-buckets-per-block) — fine up to ~10k
      blocks (a few GB at the theoretical bound, ~MBs in practice).
    - "distributed": coalesce partials then groupby-aggregate; use for
      jobs with very many blocks (100 TB: ~1M blocks) where driver ingest
      of partials would itself be big. Measured 4.6s vs driver ~2s on 256
      blocks at 32 CPUs — the distributed path's cost is Ray aggregate
      machinery, not data.
    """
    partials = features.map_batches(
        lambda t: bucket_partials(t, salt_col), batch_format="pyarrow", zero_copy_batch=True
    )
    if mode == "distributed":
        from ray.data.aggregate import Sum

        aggs = [Sum("n", alias_name="bucket_size")] + [
            Sum(f"sum_{d}", alias_name=f"sum_{d}") for d in CENTROID_DIMS
        ]
        final = partials.repartition(8).groupby("phash_bucket").aggregate(*aggs).to_pandas()
    else:
        bs, ns, ss = [], [], []
        for t in partials.iter_batches(batch_format="pyarrow"):
            bs.append(t["phash_bucket"].to_numpy(zero_copy_only=False))
            ns.append(t["n"].to_numpy(zero_copy_only=False))
            ss.append(np.stack([t[f"sum_{d}"].to_numpy(zero_copy_only=False)
                                for d in CENTROID_DIMS], axis=0))
        b = np.concatenate(bs)
        uniq, inv = np.unique(b, return_inverse=True)
        counts = np.zeros(len(uniq), dtype=np.int64)
        np.add.at(counts, inv, np.concatenate(ns))
        sums = np.zeros((len(CENTROID_DIMS), len(uniq)))
        allsums = np.concatenate(ss, axis=1)
        for j in range(len(CENTROID_DIMS)):
            np.add.at(sums[j], inv, allsums[j])
        final = pd.DataFrame({"phash_bucket": uniq.astype(np.int32), "bucket_size": counts})
        for j, d in enumerate(CENTROID_DIMS):
            final[f"sum_{d}"] = sums[j]
    for d in CENTROID_DIMS:
        final[f"centroid_{d}"] = final[f"sum_{d}"] / final["bucket_size"]
    return final[["phash_bucket", "bucket_size"] + [f"centroid_{d}" for d in CENTROID_DIMS]]


def with_cluster_features(features, stats_df: pd.DataFrame | None = None):
    """C3: attach bucket_size + centroid_dist via broadcast (no shuffle)."""
    import ray

    if stats_df is None:
        stats_df = bucket_stats(features)
    lookup = stats_df.set_index("phash_bucket")
    ref = ray.put(lookup)

    def add(t: pa.Table) -> pa.Table:
        lk = ray.get(ref)
        b = t["phash_bucket"].to_numpy(zero_copy_only=False)
        sub = lk.reindex(b)
        size = sub["bucket_size"].to_numpy()
        cent = sub[[f"centroid_{d}" for d in CENTROID_DIMS]].to_numpy()
        own = np.stack([t[d].to_numpy(zero_copy_only=False).astype(np.float64) for d in CENTROID_DIMS], axis=1)
        dist = np.sqrt(((own - cent) ** 2).sum(axis=1))
        return t.append_column("bucket_size", pa.array(size, type=pa.int64())).append_column(
            "centroid_dist", pa.array(dist, type=pa.float64())
        )

    return features.map_batches(add, batch_format="pyarrow", zero_copy_batch=True)


def refine_clusters(features, radius: int = 3, num_partitions: int | None = None):
    """C2: within each phash bucket, single-linkage components over
    Hamming(phash) <= radius. -> (image_id, phash_bucket, cluster_id).
    cluster_id = bucket * 2^32 + component index (ordered by min image_id
    for determinism)."""

    def refine(df: pd.DataFrame) -> pd.DataFrame:
        ph = df["phash"].to_numpy()
        n = len(df)
        parent = np.arange(n)

        def find(x):
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        d = hamming(ph, ph)
        ii, jj = np.nonzero(d <= radius)
        for a, b in zip(ii, jj):
            if a < b:
                ra, rb = find(a), find(b)
                if ra != rb:
                    parent[rb] = ra
        roots = np.array([find(i) for i in range(n)])
        # deterministic component ids: order components by min image_id
        ids = df["image_id"].to_numpy()
        comp_min = {}
        for i, r in enumerate(roots):
            if r not in comp_min or ids[i] < comp_min[r]:
                comp_min[r] = ids[i]
        ordered = {r: k for k, r in enumerate(sorted(comp_min, key=lambda r: comp_min[r]))}
        bucket = int(df["phash_bucket"].iloc[0])
        return pd.DataFrame({
            "image_id": ids,
            "phash_bucket": df["phash_bucket"].to_numpy(),
            "cluster_id": np.int64(bucket) * (1 << 32) + np.array([ordered[r] for r in roots], dtype=np.int64),
        })

    return (
        features.select_columns(["image_id", "phash", "phash_bucket"])
        .groupby("phash_bucket")
        .map_groups(refine, batch_format="pandas")
    )
