"""Frequency sketches: Misra-Gries heavy hitters and a merging t-digest
(SURVEY.md §2.5 A7 extension — constant-size mergeable summaries).

Both are classic public algorithms (Misra & Gries 1982; Agarwal et al.
2012 for MG mergeability; Dunning & Ertl 2019 for the merging t-digest).
Like the HLL sketch (engine/ops/sketch.py), the win at scale is shape:
exact heavy hitters / quantiles need a full all-to-all shuffle of the
key column; these need one map pass plus a tree combine of ~KB-sized
accumulators — no shuffle at any corpus size.

Heavy hitters are made EXACT by a second broadcast pass: Misra-Gries
with k counters is guaranteed to retain every key with frequency
> n/(k+1) (no false negatives), so with k >= 1/phi the candidate set is
a superset of the true phi-heavy hitters; a second map pass counts ONLY
the <=k candidates exactly (tiny groupby), and the final filter
cnt > phi*n is then value-exact — DuckDB `HAVING` oracle-checkable.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ray.data.aggregate import AggregateFnV2


def _mg_trim(keys: np.ndarray, counts: np.ndarray, k: int):
    """Keep at most k counters, MG-style: subtract the (k+1)-th largest
    count from all and drop non-positive. This is the mergeable-summaries
    decrement (Agarwal et al. 2012 §3.1) — error adds across merges but
    stays <= n/(k+1) total, preserving the no-false-negative guarantee."""
    if len(keys) <= k:
        return keys, counts
    # (k+1)-th largest via argpartition; vectorized decrement
    kth = np.partition(counts, len(counts) - (k + 1))[len(counts) - (k + 1)]
    keep = counts > kth
    return keys[keep], counts[keep] - kth


def _mg_pack(keys, counts, n) -> bytes:
    """Accumulators travel through Ray Data blocks, whose columns must be
    Arrow-convertible — a (object-array, int64-array, int) tuple is not
    (it triggers a per-block ArrowConversionError + pandas fallback).
    Pickle the tiny (<=k entries) summary into one binary scalar instead."""
    import pickle

    return pickle.dumps((list(keys), np.asarray(counts, np.int64), int(n)),
                        protocol=pickle.HIGHEST_PROTOCOL)


def _mg_unpack(blob: bytes):
    import pickle

    keys, counts, n = pickle.loads(bytes(blob))
    return np.asarray(keys, object), np.asarray(counts, np.int64), int(n)


class MisraGries(AggregateFnV2):
    """ds.aggregate(MisraGries(on=col, k=K)) -> {"keys": ndarray,
    "counts": ndarray, "n": int} candidate summary.

    Accumulator = pickled (keys, int64 counts, total n) blob (Arrow
    binary-friendly); block aggregation is one np.unique (C-speed) + one
    MG trim; combine is a dict-free concatenate + segment-sum + trim.
    Guarantee: every key with true frequency > n/(k+1) appears in the
    final candidate set."""

    def __init__(self, on: str, k: int = 64, alias_name: str | None = None):
        self._k = int(k)
        super().__init__(alias_name or f"mg({on})",
                         zero_factory=lambda: _mg_pack([], [], 0),
                         on=on, ignore_nulls=True)

    def aggregate_block(self, block):
        col = block[self._target_col_name]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        if not isinstance(col, pa.Array):  # pandas block (from_pandas datasets)
            col = pa.Array.from_pandas(col)
        col = col.drop_null()
        if len(col) == 0:
            return _mg_pack([], [], 0)
        vals = col.to_numpy(zero_copy_only=False)
        keys, counts = np.unique(vals, return_counts=True)
        keys, counts = _mg_trim(keys.astype(object), counts.astype(np.int64), self._k)
        return _mg_pack(keys, counts, len(vals))

    def combine(self, current, new):
        ck, cc, cn = _mg_unpack(current)
        nk, nc, nn = _mg_unpack(new)
        if len(ck) == 0:
            return _mg_pack(nk, nc, cn + nn)
        if len(nk) == 0:
            return _mg_pack(ck, cc, cn + nn)
        allk = np.concatenate([ck, nk])
        allc = np.concatenate([cc, nc])
        # segment-sum duplicate keys (a key can appear in both summaries)
        uk, inv = np.unique(allk, return_inverse=True)
        summed = np.bincount(inv, weights=allc).astype(np.int64)
        uk, summed = _mg_trim(uk.astype(object), summed, self._k)
        return _mg_pack(uk, summed, cn + nn)

    def finalize(self, accumulator):
        keys, counts, n = _mg_unpack(accumulator)
        return {"keys": keys, "counts": counts, "n": n}


def heavy_hitters(ds, col: str, phi: float = 0.05, k: int | None = None,
                  return_total: bool = False):
    """EXACT phi-heavy hitters (keys with count > phi*n) with no key
    shuffle: MG candidate sketch (tree aggregate) -> broadcast the <=k
    candidates -> one map pass of exact per-batch candidate counts (a
    batches x k table) -> tiny groupby-sum -> threshold filter.

    Returns a Dataset with columns (key, cnt), cnt exact (or a
    (Dataset, total_rows) pair with ``return_total`` — the total falls
    out of the sketch pass for free and lets callers like skew_join
    detect all-hot inputs without a count() of their own). Value-exact
    vs `GROUP BY ... HAVING count(*) > phi * total`."""
    import ray.data as rd

    if k is None:
        k = max(16, 2 * int(np.ceil(1.0 / phi)))
    agg = ds.aggregate(MisraGries(on=col, k=k, alias_name="mg"))
    summ = (agg or {}).get("mg")  # ds.aggregate -> None on an empty dataset
    cand, n = (summ["keys"], summ["n"]) if summ else (np.empty(0, object), 0)
    if len(cand) == 0 or n == 0:
        empty = rd.from_arrow(pa.table({"key": pa.array([], pa.string()),
                                        "cnt": pa.array([], pa.int64())}))
        return (empty, int(n)) if return_total else empty
    cand_arr = pa.array(list(cand))
    cand_idx = {v: i for i, v in enumerate(cand)}  # small; ships by value

    def count_cands(t: pa.Table) -> pa.Table:
        c = t[col].combine_chunks() if isinstance(t[col], pa.ChunkedArray) else t[col]
        mask = pc.is_in(c, value_set=cand_arr)
        hit = c.filter(mask).to_numpy(zero_copy_only=False)
        if len(hit) == 0:
            return pa.table({"key": pa.array([], cand_arr.type),
                             "cnt": pa.array([], pa.int64())})
        idx = np.fromiter((cand_idx[v] for v in hit), np.int64, len(hit))
        bc = np.bincount(idx, minlength=len(cand))
        nz = np.nonzero(bc)[0]
        return pa.table({"key": cand_arr.take(pa.array(nz)),
                         "cnt": pa.array(bc[nz], pa.int64())})

    counted = ds.map_batches(count_cands, batch_format="pyarrow",
                             zero_copy_batch=True)
    from ray.data.aggregate import Sum

    exact = counted.groupby("key").aggregate(Sum("cnt", alias_name="cnt"))
    thresh = float(phi) * float(n)

    def flt(t: pa.Table) -> pa.Table:
        return t.filter(pc.greater(pc.cast(t["cnt"], pa.float64()), thresh))

    out = exact.map_batches(flt, batch_format="pyarrow", zero_copy_batch=True)
    return (out, int(n)) if return_total else out


# ------------------------------------------------------------ t-digest --

def _k1(q: np.ndarray, delta: float) -> np.ndarray:
    """Dunning's k1 scale function: concentrates resolution at the tails."""
    return delta / (2 * np.pi) * np.arcsin(2 * np.clip(q, 0.0, 1.0) - 1)


def _digest_from_sorted(vals: np.ndarray, wts: np.ndarray, delta: float):
    """Build a t-digest from weight-sorted data in one vectorized pass:
    cluster boundary wherever floor(k1(q_left)) advances; segment sums
    via reduceat — no per-value Python loop."""
    w = wts.astype(np.float64)
    total = w.sum()
    qleft = (np.cumsum(w) - w) / total
    kidx = np.floor(_k1(qleft, delta) + 1e-9)
    # new cluster where the k-index changes vs previous element
    starts = np.flatnonzero(np.r_[True, kidx[1:] != kidx[:-1]])
    cw = np.add.reduceat(w, starts)
    cm = np.add.reduceat(vals * w, starts) / cw
    return cm, cw


def _td_pack(means: np.ndarray, wts: np.ndarray) -> bytes:
    """One flat float64 buffer [means | weights] — Arrow binary-friendly
    (see _mg_pack's rationale)."""
    return np.concatenate([np.asarray(means, np.float64),
                           np.asarray(wts, np.float64)]).tobytes()


def _td_unpack(blob) -> tuple:
    flat = np.frombuffer(bytes(blob), np.float64)
    m = len(flat) // 2
    return flat[:m], flat[m:]


class TDigest(AggregateFnV2):
    """ds.aggregate(TDigest(on=col, delta=200)) -> (means, weights)
    centroid arrays (~delta entries). Combine = merge-sort centroids +
    re-cluster — the merging t-digest of Dunning & Ertl 2019."""

    def __init__(self, on: str, delta: float = 200.0,
                 alias_name: str | None = None):
        self._delta = float(delta)
        super().__init__(alias_name or f"tdigest({on})",
                         zero_factory=lambda: _td_pack(np.empty(0, np.float64),
                                                      np.empty(0, np.float64)),
                         on=on, ignore_nulls=True)

    def aggregate_block(self, block):
        col = block[self._target_col_name]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        if not isinstance(col, pa.Array):  # pandas block (from_pandas datasets)
            col = pa.Array.from_pandas(col)
        col = col.drop_null()
        if len(col) == 0:
            return _td_pack(np.empty(0, np.float64), np.empty(0, np.float64))
        v = np.sort(col.to_numpy(zero_copy_only=False).astype(np.float64))
        return _td_pack(*_digest_from_sorted(v, np.ones(len(v)), self._delta))

    def combine(self, current, new):
        cm, cw = _td_unpack(current)
        nm, nw = _td_unpack(new)
        if len(cm) == 0:
            return _td_pack(nm, nw)
        if len(nm) == 0:
            return _td_pack(cm, cw)
        m = np.concatenate([cm, nm])
        w = np.concatenate([cw, nw])
        order = np.argsort(m, kind="stable")
        return _td_pack(*_digest_from_sorted(m[order], w[order], self._delta))

    def finalize(self, accumulator):
        return _td_unpack(accumulator)


def tdigest_quantiles(digest, qs) -> np.ndarray:
    """Estimate quantiles from a (means, weights) digest: piecewise-linear
    interpolation on centroid midpoint ranks (standard t-digest query)."""
    means, wts = (np.asarray(digest[0], np.float64),
                  np.asarray(digest[1], np.float64))
    if len(means) == 0:
        return np.full(len(qs), np.nan)
    total = wts.sum()
    # midpoint cumulative rank of each centroid
    mid = (np.cumsum(wts) - wts / 2.0) / total
    return np.interp(np.asarray(qs, np.float64), mid, means,
                     left=means[0], right=means[-1])


def approx_quantiles(ds, col: str, qs, delta: float = 200.0) -> np.ndarray:
    """Global approximate quantiles: ONE tree aggregate (no shuffle, no
    sort). Rank error empirically <~0.5% at delta=200 (tests/test_freq.py)."""
    d = ds.aggregate(TDigest(on=col, delta=delta, alias_name="td"))["td"]
    return tdigest_quantiles(d, qs)


class TDigestPacked(TDigest):
    """TDigest whose finalized value stays a packed binary blob — the
    form a grouped aggregate needs (per-group digests must live in an
    Arrow column; (means, weights) ndarray tuples cannot)."""

    def finalize(self, accumulator):
        return bytes(accumulator)


def grouped_approx_quantiles(ds, key, col: str, qs, delta: float = 200.0,
                             prefix: str = "q"):
    """Per-group approximate quantiles: groupby of ~KB t-digest
    accumulators (ONE exchange of sketches, the value column itself
    never shuffles), then a vectorized-per-group interpolation finish.
    The scale complement of agg.grouped_quantiles (exact, which must
    materialize each group) — use this when single groups exceed a
    worker's heap. Column names: {prefix}{q*1000:g} (q500 = median)."""
    qs = list(qs)

    agg = ds.groupby(key).aggregate(TDigestPacked(on=col, delta=delta, alias_name="td"))
    keys = [key] if isinstance(key, str) else list(key)

    def finish(t: pa.Table) -> pa.Table:
        out = {k: t[k] for k in keys}
        blobs = t["td"].to_pylist()  # one per group — post-reduction, tiny
        est = (np.stack([tdigest_quantiles(_td_unpack(b), qs) for b in blobs])
               if blobs else np.empty((0, len(qs))))
        for i, q in enumerate(qs):
            out[f"{prefix}{q * 1000:g}"] = pa.array(est[:, i], pa.float64())
        return pa.table(out)

    return agg.map_batches(finish, batch_format="pyarrow", zero_copy_batch=True)
