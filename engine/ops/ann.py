"""Approximate-nearest-neighbor search over an embedding column.

Brute-force top-k is the exact baseline: the (small) query matrix is
broadcast once (ray.put); every batch computes a numpy matmul against it
and emits ONLY its local top-k candidates per query (k rows per query per
batch, not the full score matrix), which a single tiny
groupby(query_id) top-k finalizes. Wall-clock is one streaming pass.

IVF is the scale path: sampled centroids (broadcast), one pass assigns
each vector to its nearest centroid (the index build); a query probes the
nprobe nearest centroids and brute-forces only those partitions. Recall
is tested against brute force.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from engine.ops.neardup import _emb_matrix


def _normalize(m: np.ndarray) -> np.ndarray:
    return m / np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-12)


def topk_cosine(ds, queries: np.ndarray, k: int = 5, id_col: str = "vec_id",
                emb_col: str = "embedding", query_ids: np.ndarray | None = None):
    """-> Dataset(query_id, vec_id(id_col), score) with k rows per query.
    Exact brute force, ties broken by id ascending."""
    import ray

    q = _normalize(np.asarray(queries, dtype=np.float64))
    qids = np.asarray(query_ids) if query_ids is not None else np.arange(len(q))
    ref = ray.put((q, qids))

    def local_topk(t: pa.Table) -> pa.Table:
        qm, qi = ray.get(ref)
        m = _normalize(_emb_matrix(t, emb_col))
        ids = t[id_col].to_numpy(zero_copy_only=False)
        scores = qm @ m.T  # (Q, n)
        kk = min(k, scores.shape[1])
        # per query: top-k by (-score, id)
        order = np.lexsort((np.broadcast_to(ids, scores.shape), -scores), axis=1)[:, :kk]
        rows_q = np.repeat(qi, kk)
        take = order.reshape(-1)
        return pa.table({
            "query_id": pa.array(rows_q.astype(np.int64)),
            id_col: pa.array(ids[take]),
            "score": pa.array(np.round(np.take_along_axis(scores, order, axis=1).reshape(-1), 5)),
        })

    return (
        ds.map_batches(local_topk, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("query_id")
        .map_groups(lambda t: _final_topk(t, id_col, k), batch_format="pyarrow")
    )


def _final_topk(t: pa.Table, id_col: str, k: int) -> pa.Table:
    """Per-query finish: (-score, id) top-k, Arrow-native (no pandas
    round-trip per group)."""
    if t.num_rows == 0:
        return t
    sc = t["score"].to_numpy(zero_copy_only=False)
    ids = t[id_col].to_numpy(zero_copy_only=False)
    order = np.lexsort((ids, -sc))[:k]
    return t.take(pa.array(order))


# ------------------------------------------------------------------ IVF --

def build_ivf(ds, n_centroids: int = 16, id_col: str = "vec_id", emb_col: str = "embedding",
              sample_frac: float = 0.2, seed: int = 42,
              max_sample_rows: int = 131_072, lloyd_iters: int = 1):
    """-> (indexed Dataset with centroid_id column, centroids ndarray).
    Default (lloyd_iters=1): centroids = k-means with one Lloyd step over
    a sample (content-deterministic splitmix64(id) draw — identical
    across partitionings and cluster sizes, unlike ``random_sample``
    whose draw depends on the physical plan; driver pull absolutely
    capped at ``max_sample_rows``). lloyd_iters > 1: distributed
    spherical k-means over the FULL dataset (engine/ops/kmeans.py —
    streaming partial-sum rounds, k-means++ init on the same capped
    deterministic sample), the standard IVF trainer when index quality
    matters more than build passes. Assignment = one broadcast map pass."""
    import ray

    from engine.ops.agg import deterministic_sample

    if lloyd_iters > 1:
        from engine.ops.kmeans import kmeans_fit

        cents = kmeans_fit(ds, k=n_centroids, emb_col=emb_col, id_col=id_col,
                           iters=lloyd_iters, seed=seed, sample_frac=sample_frac,
                           max_sample_rows=max_sample_rows, spherical=True)
    else:
        cols = ds.select_columns([id_col, emb_col])
        n_rows = cols.count()
        frac = min(sample_frac, max_sample_rows / max(1, n_rows))
        samp = deterministic_sample(cols, id_col, frac, hash_fn="splitmix64").to_pandas()
        if len(samp) < max(n_centroids, 1):
            samp = cols.limit(max_sample_rows).to_pandas()
        m = _normalize(np.stack(samp.sort_values(id_col)[emb_col].to_numpy()).astype(np.float64))
        rng = np.random.default_rng(seed)
        init = m[rng.choice(len(m), size=min(n_centroids, len(m)), replace=False)]
        # one Lloyd refinement
        assign = np.argmax(m @ init.T, axis=1)
        cents = np.stack([
            _normalize(m[assign == c].mean(axis=0, keepdims=True))[0] if (assign == c).any() else init[c]
            for c in range(len(init))
        ])
    ref = ray.put(cents)

    def tag(t: pa.Table) -> pa.Table:
        cm = ray.get(ref)
        mm = _normalize(_emb_matrix(t, emb_col))
        cid = np.argmax(mm @ cm.T, axis=1).astype(np.int32)
        return t.append_column("centroid_id", pa.array(cid))

    return ds.map_batches(tag, batch_format="pyarrow", zero_copy_batch=True), cents


def ann_join(left, right, k: int = 1, nprobe: int = 2, n_centroids: int = 16,
             left_id: str = "vec_id", right_id: str = "vec_id",
             emb_col: str = "embedding", exclude_self: bool = False,
             lloyd_iters: int = 1):
    """Distributed similarity join: for every LEFT vector, its top-k
    cosine neighbors among the RIGHT vectors. Neither side is broadcast
    or materialized — the shape that works when BOTH sides are huge
    (cross-corpus near-dup, retrieval-augmentation joins):

    1. coarse centroids trained on the right side (capped deterministic
       sample; spherical k-means when lloyd_iters > 1);
    2. right rows tagged with their 1 nearest cell, left rows REPLICATED
       to their nprobe nearest cells (the only data amplification,
       nprobe x left — not |right|);
    3. both sides co-partitioned by ONE groupby(cell) whose map_groups
       brute-forces left-vs-right inside each cell (per-cell matmul);
    4. a final small groupby(left id) merges the per-cell top-k across
       probes.

    Degenerate-cell note: a cell holds ~|right|/n_centroids rows; size
    n_centroids ∝ corpus (as semdedup does) so per-group matmuls stay
    bounded. Missing neighbors (all probed cells empty) simply emit no
    row for that left id — same contract as topk_cosine_ivf."""
    import ray

    from engine.ops.agg import deterministic_sample  # noqa: F401 (doc pointer)

    _indexed_right, cents = build_ivf(right, n_centroids=n_centroids,
                                      id_col=right_id, emb_col=emb_col,
                                      lloyd_iters=lloyd_iters)
    ref = ray.put(cents)

    def tag_right(t: pa.Table) -> pa.Table:
        cm = ray.get(ref)
        mm = _normalize(_emb_matrix(t, emb_col))
        cell = np.argmax(mm @ cm.T, axis=1).astype(np.int32)
        return pa.table({"cell": pa.array(cell),
                         "side": pa.array(np.ones(len(cell), np.int8)),
                         "rid": t[right_id],
                         "emb": t[emb_col]})

    def tag_left(t: pa.Table) -> pa.Table:
        cm = ray.get(ref)
        mm = _normalize(_emb_matrix(t, emb_col))
        npb = min(nprobe, len(cm))
        cells = np.argsort(-(mm @ cm.T), axis=1)[:, :npb]  # (n, nprobe)
        n = len(mm)
        idx = np.repeat(np.arange(n), npb)
        return pa.table({"cell": pa.array(cells.reshape(-1).astype(np.int32)),
                         "side": pa.array(np.zeros(n * npb, np.int8)),
                         "rid": t[left_id].take(pa.array(idx)),
                         "emb": t[emb_col].combine_chunks().take(pa.array(idx))
                         if isinstance(t[emb_col], pa.ChunkedArray)
                         else t[emb_col].take(pa.array(idx))})

    r_tagged = right.map_batches(tag_right, batch_format="pyarrow", zero_copy_batch=True)
    l_tagged = left.map_batches(tag_left, batch_format="pyarrow", zero_copy_batch=True)
    both = l_tagged.union(r_tagged)

    def cell_join(t: pa.Table) -> pa.Table:
        side = t["side"].to_numpy(zero_copy_only=False)
        ids = t["rid"].to_numpy(zero_copy_only=False)
        empty = pa.table({"query_id": pa.array([], t.schema.field("rid").type),
                          "neighbor_id": pa.array([], t.schema.field("rid").type),
                          "score": pa.array([], pa.float64())})
        lmask, rmask = side == 0, side == 1
        if not lmask.any() or not rmask.any():
            return empty
        m = _normalize(_emb_matrix(t, "emb"))
        lm, rm = m[lmask], m[rmask]
        lids, rids = ids[lmask], ids[rmask]
        sc = lm @ rm.T  # (L, R) within ONE bounded cell
        if exclude_self:
            sc[lids[:, None] == rids[None, :]] = -np.inf
        kk = min(k, sc.shape[1])
        order = np.lexsort((np.broadcast_to(rids, sc.shape), -sc), axis=1)[:, :kk]
        take = order.reshape(-1)
        out_s = np.take_along_axis(sc, order, axis=1).reshape(-1)
        keep = np.isfinite(out_s)
        return pa.table({
            "query_id": pa.array(np.repeat(lids, kk)[keep]),
            "neighbor_id": pa.array(rids[take][keep]),
            "score": pa.array(np.round(out_s[keep], 5)),
        })

    pairs = both.groupby("cell").map_groups(cell_join, batch_format="pyarrow")
    return (pairs.groupby("query_id")
            .map_groups(lambda t: _final_topk(t, "neighbor_id", k),
                        batch_format="pyarrow"))


def topk_cosine_ivf(indexed_ds, centroids: np.ndarray, queries: np.ndarray, k: int = 5,
                    nprobe: int = 4, id_col: str = "vec_id", emb_col: str = "embedding",
                    query_ids: np.ndarray | None = None):
    """Probe the nprobe nearest centroids per query; brute-force only
    vectors assigned there. Single filtered pass + tiny final top-k."""
    import pyarrow.compute as pc

    q = _normalize(np.asarray(queries, dtype=np.float64))
    qids = np.asarray(query_ids) if query_ids is not None else np.arange(len(q))
    probes = np.argsort(-(q @ centroids.T), axis=1)[:, :nprobe]  # (Q, nprobe)
    wanted = np.unique(probes.reshape(-1))
    filtered = indexed_ds.map_batches(
        lambda t: t.filter(pc.is_in(t["centroid_id"], value_set=pa.array(wanted.astype(np.int32)))),
        batch_format="pyarrow",
    )
    # per-query probe mask applied in the local top-k
    import ray

    ref = ray.put((q, qids, probes))

    def local_topk(t: pa.Table) -> pa.Table:
        qm, qi, pr = ray.get(ref)
        m = _normalize(_emb_matrix(t, emb_col))
        ids = t[id_col].to_numpy(zero_copy_only=False)
        cids = t["centroid_id"].to_numpy(zero_copy_only=False)
        out_q, out_i, out_s = [], [], []
        for row in range(len(qm)):
            mask = np.isin(cids, pr[row])
            if not mask.any():
                continue
            sc = qm[row] @ m[mask].T
            sub_ids = ids[mask]
            kk = min(k, len(sc))
            order = np.lexsort((sub_ids, -sc))[:kk]
            out_q.append(np.full(kk, qi[row], dtype=np.int64))
            out_i.append(sub_ids[order])
            out_s.append(np.round(sc[order], 5))
        if not out_q:
            return pa.table({"query_id": pa.array([], type=pa.int64()),
                             id_col: pa.array([], type=pa.int64()),
                             "score": pa.array([], type=pa.float64())})
        return pa.table({
            "query_id": pa.array(np.concatenate(out_q)),
            id_col: pa.array(np.concatenate(out_i)),
            "score": pa.array(np.concatenate(out_s)),
        })

    return (
        filtered.map_batches(local_topk, batch_format="pyarrow")
        .groupby("query_id")
        .map_groups(lambda t: _final_topk(t, id_col, k), batch_format="pyarrow")
    )
