"""Product-quantization ANN (Jégou et al. 2011, public algorithm):
compress each d-dim embedding into m uint8 codes (one per subspace) and
search by asymmetric distance computation (ADC) — per query, a tiny
(m x n_codes) lookup table of partial dot products, so scoring a vector
is m table lookups instead of a d-dim dot product.

Why this is THE scale path for 10^12 vectors: a 64-dim float32
embedding is 256 B; its PQ code is m=8 B — a 32x memory cut, so the
scan stage streams codes (not embeddings) through the object store and
the per-batch score is one np.take + reduce over uint8 columns. Exact
re-ranking of the top ADC candidates (which DOES read the original
embedding column, but only for ~rerank rows per query) restores
near-exact top-k — the FAISS IndexPQ + refine configuration.

Training is a capped deterministic sample + per-subspace Lloyd k-means
on the driver (standard practice: codebooks are tiny, m*256*dsub
floats, and training data need not exceed ~100k rows at any corpus
size). Compose with engine/ops/ann.py build_ivf for IVF-PQ-style
coarse filtering; this module keeps the flat-scan variant."""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from engine.ops.neardup import _emb_matrix


def _normalize(m: np.ndarray) -> np.ndarray:
    return m / np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-12)


def pq_train(ds, m: int = 8, n_codes: int = 256, id_col: str = "vec_id",
             emb_col: str = "embedding", sample_frac: float = 0.5,
             max_sample_rows: int = 131_072, seed: int = 42,
             iters: int = 8) -> np.ndarray:
    """-> codebooks (m, n_codes, d//m) float64, trained on a
    content-deterministic capped sample (same splitmix64 draw as the IVF
    trainer — invariant to partitioning). Vectors are L2-normalized
    before splitting so ADC scores approximate cosine."""
    from engine.ops.agg import deterministic_sample

    cols = ds.select_columns([id_col, emb_col])
    n_rows = cols.count()
    frac = min(sample_frac, max_sample_rows / max(1, n_rows))
    samp = deterministic_sample(cols, id_col, frac, hash_fn="splitmix64").to_pandas()
    if len(samp) < 4 * m:
        samp = cols.limit(max_sample_rows).to_pandas()
    x = _normalize(np.stack(samp.sort_values(id_col)[emb_col].to_numpy()).astype(np.float64))
    d = x.shape[1]
    if d % m:
        raise ValueError(f"pq_train: dim {d} not divisible by m={m}")
    dsub = d // m
    n_codes = min(n_codes, max(2, len(x) // 4))  # >=4 training rows/code
    rng = np.random.default_rng(seed)
    books = np.empty((m, n_codes, dsub))
    for j in range(m):
        sub = x[:, j * dsub:(j + 1) * dsub]
        cents = sub[rng.choice(len(sub), size=n_codes, replace=False)]
        for _ in range(iters):
            # Lloyd step on the sample: ||s-c||^2 argmin via the matmul
            # expansion (s.s is constant per row, drop it)
            d2 = (cents * cents).sum(1)[None, :] - 2.0 * (sub @ cents.T)
            assign = np.argmin(d2, axis=1)
            sums = np.zeros_like(cents)
            np.add.at(sums, assign, sub)
            cnt = np.bincount(assign, minlength=n_codes).astype(np.float64)
            nonempty = cnt > 0
            cents[nonempty] = sums[nonempty] / cnt[nonempty, None]
        books[j] = cents
    return books


def pq_encode(ds, codebooks: np.ndarray, emb_col: str = "embedding",
              code_col: str = "pq_code"):
    """One map pass: append an m-byte binary code per row. Keeps the
    original embedding column (needed only by the re-rank stage; drop it
    upstream for a code-only index)."""
    import ray

    ref = ray.put(codebooks)
    m, n_codes, dsub = codebooks.shape

    def enc(t: pa.Table) -> pa.Table:
        books = ray.get(ref)
        x = _normalize(_emb_matrix(t, emb_col))
        codes = np.empty((len(x), m), np.uint8)
        for j in range(m):
            sub = x[:, j * dsub:(j + 1) * dsub]
            cents = books[j]
            d2 = (cents * cents).sum(1)[None, :] - 2.0 * (sub @ cents.T)
            codes[:, j] = np.argmin(d2, axis=1).astype(np.uint8)
        # fixed_size_binary(m): the whole code matrix ships as ONE flat
        # buffer (zero-copy both directions — no per-row bytes objects)
        arr = pa.Array.from_buffers(pa.binary(m), len(x),
                                    [None, pa.py_buffer(codes.tobytes())])
        return t.append_column(code_col, arr)

    return ds.map_batches(enc, batch_format="pyarrow", zero_copy_batch=True)


def pq_topk(encoded, codebooks: np.ndarray, queries: np.ndarray, k: int = 5,
            rerank: int = 32, id_col: str = "vec_id",
            emb_col: str = "embedding", code_col: str = "pq_code",
            query_ids: np.ndarray | None = None):
    """ADC scan + exact re-rank -> Dataset(query_id, vec_id, score).

    Per batch: scores[q, row] = sum_j LUT[q, j, codes[row, j]] — one
    np.take per subspace over uint8 codes (no d-dim math on the scan
    path). Each batch emits its local top-`rerank` candidates per query
    WITH exact cosine computed on just those rows; the final per-query
    group keeps exact-score top-k. Ties break by id ascending, matching
    topk_cosine (the brute-force baseline and pytest oracle)."""
    import ray

    q = _normalize(np.asarray(queries, dtype=np.float64))
    qids = np.asarray(query_ids) if query_ids is not None else np.arange(len(q))
    m, n_codes, dsub = codebooks.shape
    # LUT[q, j, c] = q_sub(j) . codebook[j, c]
    lut = np.einsum("qjd,jcd->qjc", q.reshape(len(q), m, dsub), codebooks)
    ref = ray.put((q, qids, lut))

    def local(t: pa.Table) -> pa.Table:
        qm, qi, L = ray.get(ref)
        codes_bin = t[code_col].combine_chunks() if isinstance(t[code_col], pa.ChunkedArray) else t[code_col]
        if pa.types.is_fixed_size_binary(codes_bin.type):
            # zero-copy: the fixed-size-binary data buffer IS the code matrix
            buf = codes_bin.buffers()[1]
            off = codes_bin.offset * m
            codes = np.frombuffer(buf, np.uint8,
                                  count=len(codes_bin) * m, offset=off).reshape(-1, m)
        else:  # variable binary (e.g. after a parquet round-trip)
            codes = np.frombuffer(b"".join(codes_bin.to_pylist()), np.uint8).reshape(-1, m)
        ids = t[id_col].to_numpy(zero_copy_only=False)
        # ADC: (Q, n) approximate scores
        approx = np.zeros((len(qm), len(codes)))
        for j in range(m):
            approx += L[:, j, :][:, codes[:, j]]
        rr = min(rerank, approx.shape[1])
        cand = np.argpartition(-approx, rr - 1, axis=1)[:, :rr]  # (Q, rr)
        # exact cosine only on the candidate rows
        x = _normalize(_emb_matrix(t, emb_col))
        out_q, out_i, out_s = [], [], []
        for row in range(len(qm)):
            c = cand[row]
            sc = x[c] @ qm[row]
            kk = min(k, len(c))
            order = np.lexsort((ids[c], -sc))[:kk]
            out_q.append(np.full(kk, qi[row], np.int64))
            out_i.append(ids[c][order])
            out_s.append(np.round(sc[order], 5))
        return pa.table({"query_id": pa.array(np.concatenate(out_q)),
                         id_col: pa.array(np.concatenate(out_i)),
                         "score": pa.array(np.concatenate(out_s))})

    from engine.ops.ann import _final_topk

    return (encoded.map_batches(local, batch_format="pyarrow")
            .groupby("query_id")
            .map_groups(lambda t: _final_topk(t, id_col, k), batch_format="pyarrow"))
