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


def refine_clusters(features, radius: int = 3, num_partitions: int | None = None,
                    max_bucket: int = 1024):
    """C2: within each phash bucket, single-linkage components over
    Hamming(phash) <= radius. -> (image_id, phash_bucket, cluster_id).
    cluster_id = bucket * 2^32 + component index (ordered by min image_id
    for determinism).

    Scale shape (round-4 rewrite): ONE hash-partition exchange co-locates
    complete buckets (~CPU-count groups, not one map_groups UDF call per
    bucket); each partition processes ALL its bucket runs in one
    vectorized pass — global pair indices, per-pair XOR popcount (the
    metric is computed on the PAIR LIST, never a (B,B) Hamming matrix),
    and min-label propagation with pointer jumping instead of a per-pair
    Python union-find loop. Buckets above ``max_bucket`` members emit a
    STAR on the min-id member (same degenerate-bucket guard as the
    near-dup family: a 10^5-member hot bucket costs 10^5 pairs, not
    10^10 matrix cells); members within ``radius`` of the anchor still
    join its component — recall of anchor-distant sub-clusters inside
    oversized buckets is traded away, tested with a planted bucket."""
    from engine.ops.neardup import _run_pair_indices
    from engine.ops.partitioning import _cpus

    P = num_partitions or _cpus()

    def add_pkey(t: pa.Table) -> pa.Table:
        b = t["phash_bucket"].to_numpy(zero_copy_only=False).astype(np.int64).view(np.uint64)
        pk = ((b * np.uint64(0x9E3779B97F4A7C15)) >> np.uint64(33)) % np.uint64(P)
        return t.append_column("__bpart", pa.array(pk.astype(np.int32)))

    def refine(t: pa.Table) -> pa.Table:
        t = t.drop_columns(["__bpart"])
        n = t.num_rows
        if n == 0:
            return t.select(["image_id", "phash_bucket"]).append_column(
                "cluster_id", pa.array([], type=pa.int64()))
        b = t["phash_bucket"].to_numpy(zero_copy_only=False).astype(np.int64)
        ids = t["image_id"].to_numpy(zero_copy_only=False)
        ph = t["phash"].to_numpy(zero_copy_only=False).view(np.uint64)
        order = np.lexsort((ids, b))
        b, ph = b[order], ph[order]
        starts = np.nonzero(np.concatenate([[True], b[1:] != b[:-1]]))[0]
        sizes = np.diff(np.append(starts, n)).astype(np.int64)
        ii, jj = _run_pair_indices(starts, sizes, max_bucket)
        if ii.size:
            x = ph[ii] ^ ph[jj]
            ham = np.unpackbits(x.view(np.uint8)).reshape(-1, 64).sum(axis=1)
            ok = ham <= radius
            ii, jj = ii[ok], jj[ok]
        # connected components: min-label propagation + pointer jumping
        # (labels start as the global row index; runs are disjoint so no
        # cross-bucket merging is possible). Converges in O(log diameter)
        # numpy passes — no per-pair Python.
        labels = np.arange(n, dtype=np.int64)
        while ii.size:
            l2 = labels.copy()
            np.minimum.at(l2, jj, labels[ii])
            np.minimum.at(l2, ii, labels[jj])
            while True:
                nxt = l2[l2]
                if np.array_equal(nxt, l2):
                    break
                l2 = nxt
            if np.array_equal(l2, labels):
                break
            labels = l2
        # deterministic component index per bucket: ids ascend within each
        # run, so a component's root (min row index) carries its min id —
        # ranking roots ascending ranks components by min image_id
        run_of = np.repeat(np.arange(starts.size, dtype=np.int64), sizes)
        comp = run_of * np.int64(n) + labels
        uniq, inv = np.unique(comp, return_inverse=True)
        run_of_uniq = uniq // n
        first = np.searchsorted(run_of_uniq, np.arange(starts.size))
        rank = np.arange(uniq.size, dtype=np.int64) - first[run_of_uniq]
        cluster = b * np.int64(1 << 32) + rank[inv]
        sorted_t = t.select(["image_id", "phash_bucket"]).take(pa.array(order))
        return sorted_t.append_column("cluster_id", pa.array(cluster))

    return (
        features.select_columns(["image_id", "phash", "phash_bucket"])
        .map_batches(add_pkey, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("__bpart")
        .map_groups(refine, batch_format="pyarrow")
    )
