"""Near-duplicate detection: MinHash+LSH, SimHash, n-gram Jaccard,
embedding-cosine — the dedup toolbox a training-data pipeline needs.

Scale shape (the part that matters at 10^12 docs):
  signatures  : stateful actor pool (hash params built once per worker)
  banding     : map_batches explode -> (bucket, doc_id) rows
  candidates  : ONE groupby(bucket) shuffle; each bucket
                emits its pairs locally (buckets are tiny by construction)
  verification: exact Jaccard / Hamming / cosine on candidate pairs only
  grouping    : min-label propagation over pairs (bounded rounds), or
                driver-side union-find when the pair set is provably small
                (this sandbox) — documented per call site.

Verification here broadcasts the needed per-doc artifacts (shingle sets /
signatures) via ray.put for the sandbox scale; the 100 TB path would
re-join artifacts onto the pair list by doc_id instead (same operators).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

_MERSENNE = (1 << 61) - 1
_FNV_OFFSET = np.uint64(14695981039346656037)
_FNV_PRIME = np.uint64(1099511628211)


def _hash_params(num_perm: int, seed: int = 42):
    rng = np.random.default_rng(seed)
    a = rng.integers(1, _MERSENNE, num_perm, dtype=np.int64)
    b = rng.integers(0, _MERSENNE, num_perm, dtype=np.int64)
    return a.astype(np.uint64), b.astype(np.uint64)


def _token_hashes(col: pa.Array):
    """Whitespace tokens of a string column -> (ntok int64[n], flat token
    hashes uint64[F]) with zero Python-level per-token work: one RE2 split,
    one boolean mask for the empty boundary segments, one pandas
    ``hash_array`` C pass (SipHash, fixed key — process-stable) over the
    flat token array."""
    n = len(col)
    words = pc.split_pattern_regex(col, r"\s+")
    if isinstance(words, pa.ChunkedArray):
        words = words.combine_chunks()
    woffs = words.offsets.to_numpy().astype(np.int64)
    flat = words.values.slice(woffs[0], woffs[-1] - woffs[0])
    woffs = woffs - woffs[0]
    nonempty = pc.greater(pc.utf8_length(flat), 0)
    ne = nonempty.to_numpy(zero_copy_only=False).astype(np.int64)
    cum = np.zeros(len(flat) + 1, np.int64)
    np.cumsum(ne, out=cum[1:])
    ntok = cum[woffs[1:]] - cum[woffs[:-1]]
    toks = flat.filter(nonempty)
    th = (pd.util.hash_array(toks.to_numpy(zero_copy_only=False))
          if len(toks) else np.empty(0, np.uint64))
    return ntok, th.astype(np.uint64, copy=False)


def shingle_hashes_batch(col, k: int = 3):
    """Word k-gram shingle hashes for a whole string column in one
    vectorized pass -> (offs int64[n+1], flat uint64) where
    ``flat[offs[i]:offs[i+1]]`` is doc i's SORTED UNIQUE shingle set
    (always >= 1 element: docs with < k tokens emit one hash of their full
    token sequence, so empty docs hash to the FNV offset basis).

    Shingle hash = rolling FNV-style polynomial over the k token hashes —
    replaces the round-2 per-shingle crc32 generator (64-bit, fewer
    collisions, no per-row Python). Parity with a per-doc reference loop
    is pytest-checked (tests/test_neardup.py)."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    n = len(col)
    if n == 0:
        return np.zeros(1, np.int64), np.empty(0, np.uint64)
    ntok, th = _token_hashes(col)
    tok_offs = np.zeros(n + 1, np.int64)
    np.cumsum(ntok, out=tok_offs[1:])
    doc_of = np.repeat(np.arange(n, dtype=np.int64), ntok)
    F = th.size
    win = F - k + 1
    if win > 0:
        h = np.full(win, _FNV_OFFSET, np.uint64)
        for j in range(k):
            h = h * _FNV_PRIME + th[j : j + win]
        valid = doc_of[:win] == doc_of[k - 1 :]
        sh_doc, sh_h = doc_of[:win][valid], h[valid]
    else:
        sh_doc, sh_h = np.empty(0, np.int64), np.empty(0, np.uint64)
    short = np.nonzero(ntok < k)[0]
    if short.size:
        hs = np.full(short.size, _FNV_OFFSET, np.uint64)
        if F > 0:
            for j in range(k - 1):
                sel = ntok[short] > j
                idx = np.where(sel, tok_offs[short] + j, 0)
                hs = np.where(sel, hs * _FNV_PRIME + th[idx], hs)
        sh_doc = np.concatenate([sh_doc, short])
        sh_h = np.concatenate([sh_h, hs])
    order = np.lexsort((sh_h, sh_doc))
    d, v = sh_doc[order], sh_h[order]
    keep = np.empty(d.size, bool)
    keep[0] = True
    keep[1:] = (d[1:] != d[:-1]) | (v[1:] != v[:-1])
    d, v = d[keep], v[keep]
    offs = np.zeros(n + 1, np.int64)
    np.cumsum(np.bincount(d, minlength=n), out=offs[1:])
    return offs, v


def shingle_hashes(text: str, k: int = 3) -> np.ndarray:
    """Word k-gram shingles of ONE doc -> sorted unique uint64 hashes
    (thin wrapper over the batch kernel so the two can never drift)."""
    offs, flat = shingle_hashes_batch(pa.array([text], pa.string()), k)
    return flat


class MinHasher:
    """Stateful: permutation params once per worker. Emits one signature
    row per doc: (id, sig list<uint64 as int64>[num_perm])."""

    def __init__(self, id_col: str = "doc_id", text_col: str = "text",
                 num_perm: int = 64, k_shingle: int = 3, seed: int = 42):
        self.a, self.b = _hash_params(num_perm, seed)
        self.num_perm, self.k = num_perm, k_shingle
        self.id_col, self.text_col = id_col, text_col

    def signature(self, text: str) -> np.ndarray:
        """One doc (reference path; the batch path in signatures_batch is
        pytest-checked to match it exactly)."""
        return self.signatures_batch(pa.array([text], pa.string()))[0]

    def signatures_batch(self, col) -> np.ndarray:
        """Whole string column -> (n, num_perm) uint64 signatures with no
        per-doc Python: one batch shingle pass, then per-permutation
        (a*x+b) mod p over the FLAT shingle array and a segment-min
        reduceat at the doc offsets. Permutations are chunked so the
        (chunk, F) temp stays ~tens of MB regardless of batch size."""
        offs, flat = shingle_hashes_batch(col, self.k)
        n = offs.size - 1
        sigs = np.empty((n, self.num_perm), np.uint64)
        if n == 0:
            return sigs
        starts = offs[:-1]
        chunk = max(1, min(self.num_perm, (1 << 23) // max(1, flat.size)))
        for p0 in range(0, self.num_perm, chunk):
            a = self.a[p0 : p0 + chunk]
            b = self.b[p0 : p0 + chunk]
            v = (flat[:, None] * a[None, :] + b[None, :]) % np.uint64(_MERSENNE)
            sigs[:, p0 : p0 + chunk] = np.minimum.reduceat(v, starts, axis=0)
        return sigs

    def __call__(self, t: pa.Table) -> pa.Table:
        sigs = self.signatures_batch(t[self.text_col])
        return pa.table({
            self.id_col: t[self.id_col],
            "sig": pa.FixedSizeListArray.from_arrays(
                pa.array(sigs.reshape(-1).view(np.int64)), self.num_perm
            ),
        })


def band_rows(sig_table: pa.Table, id_col: str, bands: int, rows: int) -> pa.Table:
    """Explode signatures into (bucket, id) rows for the LSH bucket
    groupby. ``bucket`` is ONE int64 — the band index is mixed into the
    FNV seed so different bands can never collide into the same bucket
    key, and the downstream groupby sorts a single int column instead of
    a (int32, int64) composite."""
    sig = sig_table["sig"]
    if isinstance(sig, pa.ChunkedArray):
        sig = sig.combine_chunks()
    num_perm = sig.type.list_size
    assert bands * rows == num_perm
    m = sig.flatten().to_numpy(zero_copy_only=False).reshape(-1, num_perm).view(np.uint64)
    n = len(m)
    ids = sig_table[id_col].to_numpy(zero_copy_only=False)
    bh = np.empty((n, bands), dtype=np.uint64)
    for bidx in range(bands):
        seg = m[:, bidx * rows : (bidx + 1) * rows]
        # FNV-1a over (band index, band rows)
        h = np.full(n, (1469598103934665603 ^ bidx) * 1099511628211 & 0xFFFFFFFFFFFFFFFF,
                    dtype=np.uint64)
        for r in range(rows):
            h = (h ^ seg[:, r]) * np.uint64(1099511628211)
        bh[:, bidx] = h
    return pa.table({
        "bucket": pa.array(bh.T.reshape(-1).view(np.int64)),
        id_col: pa.array(np.tile(ids, bands)),
    })


DEFAULT_MAX_BUCKET = 1024


def _bucket_pair_indices(n: int, max_bucket: int):
    """Pair (i, j) indices for one LSH bucket of n members, i < j.

    Degenerate-bucket guard (the 100-TB scale killer: one boilerplate
    bucket of 10^5 docs would emit 5x10^9 pairs): above ``max_bucket``
    members, emit a STAR on the min member (n-1 pairs) instead of all
    pairs. Connectivity — the property dup-grouping consumes — is
    preserved whenever the star edges verify (exactly the degenerate
    near-identical case); recall of non-anchor pairs inside oversized
    buckets is traded away, documented here and tested with a planted
    degenerate bucket."""
    if n <= max_bucket:
        return np.triu_indices(n, 1)
    ii = np.zeros(n - 1, dtype=np.int64)
    jj = np.arange(1, n, dtype=np.int64)
    return ii, jj


def _run_pair_indices(starts: np.ndarray, sizes: np.ndarray, max_bucket: int,
                      overflow: str = "star"):
    """GLOBAL pair indices for MANY sorted bucket runs at once (the
    vectorized heart of candidate generation). For each run r of size m_r
    starting at starts[r]: all triu pairs when m_r <= max_bucket, else a
    star on the run's first (= min-id) member — same semantics as
    _bucket_pair_indices, but batched by DISTINCT SIZE so the work is one
    broadcast per size class instead of one Python call per bucket
    (map_groups per bucket was 800k UDF calls at sf0.1 — the dominant
    cost of the whole minhash pipeline).

    overflow="drop" skips oversized runs entirely instead of emitting a
    star — the inverted-index/df-cap semantics (stop-shingle removal),
    where an oracle must be able to state the rule in SQL."""
    multi = sizes >= 2
    starts, sizes = starts[multi], sizes[multi]
    out_i, out_j = [], []
    normal = sizes <= max_bucket
    ns, nm = starts[normal], sizes[normal]
    for s in np.unique(nm):
        st = ns[nm == s]                      # (G,) starts of size-s runs
        li, lj = np.triu_indices(int(s), 1)   # (p,) local pairs
        out_i.append((st[:, None] + li[None, :]).ravel())
        out_j.append((st[:, None] + lj[None, :]).ravel())
    if overflow == "star":
        for st, m in zip(starts[~normal], sizes[~normal]):  # rare by definition
            out_i.append(np.full(m - 1, st, dtype=np.int64))
            out_j.append(np.arange(st + 1, st + m, dtype=np.int64))
    if not out_i:
        z = np.empty(0, np.int64)
        return z, z
    return np.concatenate(out_i), np.concatenate(out_j)


_PKEY = "__bpart"


def _bucketed_pairs(banded, emit_pairs, num_partitions: int | None = None):
    """Hash-partition (bucket, ...) rows into ~CPU groups and run ONE
    vectorized emit per partition. ``emit_pairs(t)`` receives a pyarrow
    table holding complete buckets (all rows of a bucket co-located) and
    must return a schema-stable pairs table even when empty."""
    from engine.ops.partitioning import _cpus

    P = num_partitions or _cpus()

    def add_pkey(t: pa.Table) -> pa.Table:
        b = t["bucket"].to_numpy(zero_copy_only=False).view(np.uint64)
        pk = ((b * np.uint64(0x9E3779B97F4A7C15)) >> np.uint64(33)) % np.uint64(P)
        return t.append_column(_PKEY, pa.array(pk.astype(np.int32)))

    def emit(t: pa.Table) -> pa.Table:
        return emit_pairs(t.drop_columns([_PKEY]))

    return (banded.map_batches(add_pkey, batch_format="pyarrow", zero_copy_batch=True)
            .groupby(_PKEY).map_groups(emit, batch_format="pyarrow"))


def _sorted_runs(t: pa.Table, id_col: str):
    """Sort a partition by (bucket, id) and return (bucket, ids, starts,
    sizes) where starts/sizes delimit the bucket runs."""
    b = t["bucket"].to_numpy(zero_copy_only=False)
    ids = t[id_col].to_numpy(zero_copy_only=False)
    order = np.lexsort((ids, b))
    b, ids = b[order], ids[order]
    starts = np.nonzero(np.concatenate([[True], b[1:] != b[:-1]]))[0] if b.size else np.empty(0, np.int64)
    sizes = np.diff(np.append(starts, b.size)).astype(np.int64)
    return order, b, ids, starts, sizes


def candidate_pairs(banded, id_col: str, max_bucket: int = DEFAULT_MAX_BUCKET):
    """LSH buckets -> local pairs, -> Dataset(a, b) with a < b.
    Oversized buckets emit star pairs (see _bucket_pair_indices)."""
    from engine.ops.dedup import exact_dedup

    def emit(t: pa.Table) -> pa.Table:
        idtype = t.schema.field(id_col).type
        _, _, ids, starts, sizes = _sorted_runs(t, id_col)
        ii, jj = _run_pair_indices(starts, sizes, max_bucket)
        if ii.size:  # duplicate input ids must not become self-pairs
            keep = ids[ii] != ids[jj]
            ii, jj = ii[keep], jj[keep]
        return pa.table({"a": pa.array(ids[ii], type=idtype),
                         "b": pa.array(ids[jj], type=idtype)})

    return exact_dedup(_bucketed_pairs(banded, emit), keys=["a", "b"])


def shingle_sets(ds, id_col: str = "doc_id", text_col: str = "text", k: int = 3):
    """-> Dataset(id, shingles: binary) — sorted unique shingle hashes as
    packed uint64 bytes (binary, not list<int64>: Acero hash joins reject
    list-typed payload columns)."""

    def f(t: pa.Table) -> pa.Table:
        offs, flat = shingle_hashes_batch(t[text_col], k)
        # build the large_binary column straight from the kernel output:
        # byte offsets = 8 * element offsets, data = the flat uint64 buffer
        arr = pa.LargeBinaryArray.from_buffers(
            pa.large_binary(), offs.size - 1,
            [None, pa.py_buffer((offs * 8).tobytes()), pa.py_buffer(flat.tobytes())],
        )
        return pa.table({id_col: t[id_col], "shingles": arr.cast(pa.binary())})

    return ds.map_batches(f, batch_format="pyarrow", zero_copy_batch=True)


def _binary_views(col):
    """Binary column -> (element offsets, one uint64 view of the whole
    data buffer): zero-copy slicing instead of as_py + frombuffer object
    churn per row."""
    arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    arr = arr.cast(pa.large_binary())
    offs = np.frombuffer(arr.buffers()[1], dtype=np.int64, count=len(arr) + 1,
                         offset=8 * arr.offset)
    data = np.frombuffer(arr.buffers()[2], dtype=np.uint8, count=int(offs[-1]))
    return offs // 8, data.view(np.uint64)


def segmented_jaccard(oa: np.ndarray, da: np.ndarray, ob: np.ndarray, db: np.ndarray) -> np.ndarray:
    """Jaccard of n segment pairs in ONE vectorized pass (no per-pair
    Python loop): da/db are concatenations of sorted-unique uint64 sets,
    oa/ob their element offsets (len n+1). union_i = number of distinct
    values in the merged pair — counted by one lexsort over (pair_id,
    value) and a run-boundary reduceat; inter_i by inclusion-exclusion.
    Bit-identical to the per-pair searchsorted loop (tested)."""
    nx, ny = np.diff(oa), np.diff(ob)
    n = nx.size
    if n == 0:
        return np.empty(0)
    pid = np.concatenate([np.repeat(np.arange(n), nx), np.repeat(np.arange(n), ny)])
    val = np.concatenate([da, db])
    order = np.lexsort((val, pid))
    pid_s, val_s = pid[order], val[order]
    new_run = np.empty(val_s.size, dtype=bool)
    new_run[0] = True
    np.not_equal(val_s[1:], val_s[:-1], out=new_run[1:])
    new_run[1:] |= pid_s[1:] != pid_s[:-1]
    starts = np.searchsorted(pid_s, np.arange(n))
    union = np.add.reduceat(new_run, starts).astype(np.int64)
    inter = nx + ny - union
    return inter / union


def _verify_jaccard_distributed(ds, cands, id_col: str, text_col: str,
                                k_shingle: int):
    """Scale path: re-join shingle sets onto the pair list by doc id (two
    equi-joins) instead of broadcasting a doc->shingles map; cands is a
    Dataset(a, b) and the verified pairs STAY a Dataset end-to-end (no
    driver-side pair-list materialization). Exact same Jaccard values as
    the broadcast path (tested)."""
    from engine.ops.join import equi_join
    from engine.ops.partitioning import _cpus, input_disk_bytes

    sh = shingle_sets(ds, id_col, text_col, k_shingle)
    # Chained joins each spawn one aggregator ACTOR per partition and the
    # first join's actors stay alive while the second streams from it —
    # two joins at the 2xCPU fallback is 4xCPU actors and DEADLOCKS the
    # cluster (observed at sf0.1). Cap each at half the CPU budget and
    # materialize between them so the first join's actors release first.
    # The join INPUTS are materialized too: a hash join's aggregator +
    # map-worker actors can otherwise claim every CPU while the lazy
    # upstream pipeline (read -> minhash -> band -> bucket groupby) still
    # needs CPUs to produce the join's input — observed as a hard
    # deadlock at num_cpus=4 (2 aggregators + 2 map workers, all idle).
    # Joins consume their whole input before emitting anyway, so this
    # costs object-store residency (spillable), not wall time.
    # Partition count scales with the CORPUS size, not the CPU count:
    # shingle sets + pair lists are text-sized, and each aggregator actor
    # costs ~0.3s startup per join — 16 of them on a 50MB input is pure
    # overhead (measured: the two verify joins dominated the sf0.1 bench).
    by_bytes = max(2, input_disk_bytes(ds) // (32 << 20) + 1)
    P = max(2, min(_cpus() // 2, 16, by_bytes))
    from engine.ops.util import drop_empty_blocks

    cands = drop_empty_blocks(cands.materialize())
    sh = drop_empty_blocks(sh.materialize())
    # rename between joins: Ray only suffixes COLLIDING columns.
    # drop_empty_blocks between the joins is LOAD-BEARING, not cosmetic:
    # rename_columns BYPASSES empty blocks (ray 2.49 skips map UDFs on
    # 0-row blocks), so an empty join-output partition would carry a
    # stale un-renamed `shingles` column into the second join, collide
    # with the right side's payload and null the renamed column
    # (regression: degenerate-bucket test, round 5).
    j = equi_join(cands, sh, on="a", right_on=id_col,
                  num_partitions=P).rename_columns(
        {"shingles": "shingles_a"}).materialize()
    j = equi_join(drop_empty_blocks(j), sh, on="b", right_on=id_col,
                  num_partitions=P).rename_columns(
        {"shingles": "shingles_b"})

    def jac(t: pa.Table) -> pa.Table:
        oa, da = _binary_views(t["shingles_a"])
        ob, db = _binary_views(t["shingles_b"])
        out = segmented_jaccard(oa, da, ob, db)
        return pa.table({"a": t["a"], "b": t["b"], "jaccard": pa.array(np.round(out, 6))})

    return j.map_batches(jac, batch_format="pyarrow")


def minhash_near_dup(ds, id_col: str = "doc_id", text_col: str = "text",
                     num_perm: int = 64, bands: int = 16, k_shingle: int = 3,
                     threshold: float = 0.7, seed: int = 42, verify: str = "distributed",
                     max_bucket: int = DEFAULT_MAX_BUCKET):
    """End-to-end MinHash-LSH near-dup: -> Dataset(a, b, jaccard) of
    verified pairs (exact n-gram-shingle Jaccard >= threshold). The pair
    list stays a Dataset end-to-end — nothing corpus- or pair-sized ever
    lands on the driver heap; callers `.to_pandas()` at the edge when the
    result is known small.

    verify="distributed" (default): shingle sets are re-joined onto the
    pair list by doc id (two hash joins) — the 100 TB path.
    verify="broadcast": the doc->shingles map is built driver-side and
    broadcast via ray.put — only for corpora whose shingle sets fit one
    heap (kept as the test oracle for the distributed path)."""
    import pyarrow.compute as pc

    from engine.ops.partitioning import _cpus

    rows = num_perm // bands
    # stateless signature task with the MinHasher cached per worker process
    # (engine/ops/util.py stage_task): scales to every task slot on the
    # cluster, fuses with the read, and skips per-query actor-pool startup
    from engine.ops.util import stage_task

    sigs = ds.map_batches(
        stage_task, fn_kwargs={"_stage_cls": MinHasher, "id_col": id_col, "text_col": text_col,
                               "num_perm": num_perm, "k_shingle": k_shingle, "seed": seed},
        batch_format="pyarrow",
    )
    banded = sigs.map_batches(lambda t: band_rows(t, id_col, bands, rows), batch_format="pyarrow")
    cands = candidate_pairs(banded, id_col, max_bucket=max_bucket)
    if verify == "distributed":
        verified = _verify_jaccard_distributed(ds, cands, id_col, text_col, k_shingle)
    else:
        import ray

        docs = ds.select_columns([id_col, text_col]).to_pandas()
        sh_ref = ray.put({i: shingle_hashes(x, k_shingle)
                          for i, x in zip(docs[id_col], docs[text_col])})

        def jac(t: pa.Table) -> pa.Table:
            sh = ray.get(sh_ref)
            a_ids, b_ids = t["a"].to_pylist(), t["b"].to_pylist()
            out = np.array([
                len(np.intersect1d(sh[a], sh[b], assume_unique=True))
                / len(np.union1d(sh[a], sh[b]))
                for a, b in zip(a_ids, b_ids)
            ]) if a_ids else np.empty(0)
            return pa.table({"a": t["a"], "b": t["b"], "jaccard": pa.array(np.round(out, 6))})

        verified = cands.map_batches(jac, batch_format="pyarrow")
    return verified.map_batches(
        lambda t: t.filter(pc.greater_equal(t["jaccard"], threshold)),
        batch_format="pyarrow", zero_copy_batch=True)


def ngram_jaccard_near_dup(ds, id_col: str = "doc_id", text_col: str = "text",
                           k: int = 3, threshold: float = 0.5, df_cap: int = 256,
                           size_broadcast_threshold: int = 2_000_000):
    """Exact word-k-gram Jaccard near-dup (no sketch) over SUB-CAP
    shingles: shingles with document frequency > df_cap are stop
    shingles — removed from the similarity measure entirely (stopword
    semantics), which both bounds every inverted-index bucket at df_cap
    rows AND lets the intersection be counted instead of re-derived.

    ONE hash-partitioned pass over the exploded (shingle, doc) rows
    emits BOTH outputs the measure needs — the partitioning co-locates
    every bucket (= one distinct shingle value) whole, so a bucket's run
    length IS its global document frequency:

      pair rows   : one (a, b) row per SHARED sub-cap shingle, emitted
                    from df-bounded runs (never quadratic); runs longer
                    than df_cap are stop shingles and emit no pairs
      stop rows   : per-doc counts of rows sitting in STOP (capped) runs
                    — rare by definition (the boilerplate mass), so the
                    materialized side-output is pairs + stop-mass sized,
                    NOT corpus sized. Per-doc sub-cap sizes = total
                    distinct shingles (free from the set offsets, one
                    map-only pass) minus these stop hits. No stop-list
                    derivation, no corpus-scale table ever leaves the
                    Dataset (the round-3 form pulled the full
                    distinct-shingle DF table to the driver, ~10^11 rows
                    at 100 TB)
      intersection: groupby(a, b).count() — no shingle-set re-join, no
                    per-pair set materialization (the first cut joined
                    full shingle sets onto every candidate and lexsorted
                    ~3x10^8 values at sf0.1: 141 s; this form is one
                    count shuffle of the pair rows)
      jaccard     : c / (n_a + n_b - c), filter >= threshold

    On any corpus where no shingle exceeds df_cap (both test scales:
    max df 25) this equals full-set Jaccard exactly. Every rule is
    SQL-expressible, so the DuckDB oracle matches value-exactly.
    -> Dataset(a, b, jaccard).

    The per-doc size table is SIZE-DISPATCHED like dup_groups: at or
    below ``size_broadcast_threshold`` docs (2M rows ~= 32 MB) it is
    broadcast (ray.put once, binary-searched per batch — no shuffle);
    above it the two lookups become hash equi-joins onto the pair list,
    so nothing doc-count-sized ever reaches the driver heap. The two
    paths are parity-tested identical (tests/test_neardup.py)."""
    from ray.data.aggregate import Count, Sum

    from engine.ops.join import broadcast_lookup

    sh = shingle_sets(ds, id_col, text_col, k)

    def explode(t: pa.Table) -> pa.Table:
        offs, data = _binary_views(t["shingles"])
        ids = t[id_col].to_numpy(zero_copy_only=False)
        return pa.table({
            "bucket": pa.array(data.view(np.int64)),
            id_col: pa.array(np.repeat(ids, np.diff(offs))),
        })

    banded = sh.map_batches(explode, batch_format="pyarrow")

    def emit(t: pa.Table) -> pa.Table:
        """Pair rows (a, b, n=null) + per-doc STOP-hit partials (a=doc,
        b=null, n=count of this doc's shingles in capped runs) from one
        sorted pass over complete buckets."""
        idtype = t.schema.field(id_col).type
        _, _, ids, starts, sizes = _sorted_runs(t, id_col)
        ii, jj = _run_pair_indices(starts, sizes, df_cap, overflow="drop")
        if ii.size:
            keep = ids[ii] != ids[jj]
            ii, jj = ii[keep], jj[keep]
        stop = np.repeat(sizes > df_cap, sizes)
        if stop.any():
            ud, cnt = np.unique(ids[stop], return_counts=True)
        else:
            ud, cnt = ids[:0], np.empty(0, np.int64)
        return pa.table({
            "a": pa.concat_arrays([pa.array(ids[ii], type=idtype),
                                   pa.array(ud, type=idtype)]),
            "b": pa.concat_arrays([pa.array(ids[jj], type=idtype),
                                   pa.nulls(len(ud), idtype)]),
            "n": pa.concat_arrays([pa.nulls(ii.size, pa.int64()),
                                   pa.array(cnt.astype(np.int64))]),
        })

    # one row per shared sub-cap shingle (b valid) + stop-hit partials
    # (b null); materialized once so the two consumers below don't re-run
    # the explode + bucket exchange — pairs + stop-mass sized, << corpus
    combined = _bucketed_pairs(banded, emit).materialize()
    pair_rows = combined.map_batches(
        lambda t: t.filter(pc.is_valid(t["b"])).select(["a", "b"]),
        batch_format="pyarrow", zero_copy_batch=True)
    common = pair_rows.groupby(["a", "b"]).aggregate(Count(alias_name="c"))
    # stop-hit sums are SMALL by construction (only docs containing
    # boilerplate shingles appear) — materialize driver-side for the
    # broadcast. An empty aggregate comes back schema-less, so guard.
    stop_pdf = (combined.map_batches(
        lambda t: t.filter(pc.is_null(t["b"])).select(["a", "n"]),
        batch_format="pyarrow", zero_copy_batch=True)
        .groupby("a").aggregate(Sum("n", alias_name="__stop"))
        .to_pandas())

    def totals(t: pa.Table) -> pa.Table:
        offs, _ = _binary_views(t["shingles"])
        return pa.table({id_col: t[id_col], "n": pa.array(np.diff(offs))})

    size_ds = sh.map_batches(totals, batch_format="pyarrow")
    if len(stop_pdf):
        # per-doc sub-cap size = total distinct shingles - stop hits
        # (docs with no stop shingles miss the lookup -> null -> 0)
        stop_pdf = stop_pdf.rename(columns={"a": id_col})
        size_ds = broadcast_lookup(size_ds, stop_pdf, on=id_col)

        def subtract(t: pa.Table) -> pa.Table:
            n = t["n"].to_numpy(zero_copy_only=False)
            s = t["__stop"].to_numpy(zero_copy_only=False).astype(np.float64)
            s = np.where(np.isnan(s), 0, s).astype(np.int64)
            return pa.table({id_col: t[id_col], "n": pa.array(n - s)})

        size_ds = size_ds.map_batches(subtract, batch_format="pyarrow")
    # ONE execution of the size pipeline: size_ds derives from the lazy
    # shingling plan, and both consumers below fully materialize or join
    # against it — passing the lazy Dataset twice re-ran shingle_sets +
    # totals twice (shingling executed 3x per query overall).
    size_ds = size_ds.materialize()
    if size_ds.count() <= size_broadcast_threshold:
        size_pdf = size_ds.to_pandas()
        j = broadcast_lookup(common, size_pdf, on="a", right_on=id_col)
        j = j.rename_columns({"n": "na"})
        j = broadcast_lookup(j, size_pdf, on="b", right_on=id_col).rename_columns({"n": "nb"})
    else:
        from engine.ops.join import equi_join

        # chained hash joins: materialize between them so the first
        # join's aggregator actors release their CPUs before the second
        # spins up (same deadlock rationale as _verify_jaccard_distributed)
        j = equi_join(common.materialize(), size_ds, on="a", right_on=id_col)
        j = j.rename_columns({"n": "na"}).materialize()
        j = equi_join(j, size_ds, on="b", right_on=id_col).rename_columns({"n": "nb"})

    def jac(t: pa.Table) -> pa.Table:
        c = t["c"].to_numpy(zero_copy_only=False).astype(np.float64)
        na = t["na"].to_numpy(zero_copy_only=False).astype(np.float64)
        nb = t["nb"].to_numpy(zero_copy_only=False).astype(np.float64)
        jv = np.round(c / (na + nb - c), 6)
        keep = jv >= threshold
        return pa.table({"a": t["a"].filter(pa.array(keep)),
                         "b": t["b"].filter(pa.array(keep)),
                         "jaccard": pa.array(jv[keep])})

    return j.map_batches(jac, batch_format="pyarrow")


# --------------------------------------------------------------- simhash --

class SimHasher:
    """64-bit SimHash over whitespace tokens: count-weighted sign sums of
    per-token 64-bit hashes (the same SipHash kernel every other signature
    op uses — the round-3 crc32 pair was the one per-token Python loop
    left in the family)."""

    def __init__(self, id_col: str = "doc_id", text_col: str = "text"):
        self.id_col, self.text_col = id_col, text_col

    @staticmethod
    def simhash(text: str) -> int:
        """One doc (reference path; delegates to the batch kernel so the
        two can never drift — parity is still pytest-checked)."""
        out = SimHasher._batch(pa.array([text], pa.string()))
        return int(out.view(np.int64)[0])

    @staticmethod
    def _batch(col) -> np.ndarray:
        """String column -> uint64 simhashes, fully vectorized: ONE RE2
        split + ONE SipHash pass (_token_hashes), then numpy bit-spread /
        reduceat sign sums. The (tokens, 64) int32 contribution matrix is
        processed in doc-aligned chunks so the temp stays ~tens of MB
        regardless of batch size."""
        ntok, h = _token_hashes(col)
        n = ntok.size
        out = np.zeros(n, dtype=np.uint64)
        if h.size == 0:
            return out
        tok_offs = np.zeros(n + 1, np.int64)
        np.cumsum(ntok, out=tok_offs[1:])
        shifts = np.arange(64, dtype=np.uint64)[None, :]
        powers = np.uint64(1) << np.arange(64, dtype=np.uint64)
        chunk_toks = 1 << 19  # 512k tokens x 64 x int32 = 128 MB ceiling
        d0 = 0
        while d0 < n:
            d1 = int(np.searchsorted(tok_offs, tok_offs[d0] + chunk_toks, side="left"))
            d1 = min(max(d1, d0 + 1), n)
            seg = h[tok_offs[d0]:tok_offs[d1]]
            lens = ntok[d0:d1]
            nz = lens > 0
            if seg.size:
                contrib = (((seg[:, None] >> shifts) & np.uint64(1)).astype(np.int32) * 2 - 1)
                starts = (tok_offs[d0:d1] - tok_offs[d0])[nz]
                # reduceat sums run [starts[i], starts[i+1]): consecutive
                # nonempty-doc starts delimit exactly each doc's tokens
                acc = np.add.reduceat(contrib, starts, axis=0)
                out[d0:d1][nz] = ((acc > 0).astype(np.uint64) * powers[None, :]).sum(
                    axis=1, dtype=np.uint64)
            d0 = d1
        return out

    def __call__(self, t: pa.Table) -> pa.Table:
        out = self._batch(t[self.text_col])
        return pa.table({self.id_col: t[self.id_col],
                         "simhash": pa.array(out.view(np.int64))})


def simhash_near_dup(ds, id_col: str = "doc_id", text_col: str = "text", max_hamming: int = 3,
                     max_bucket: int = DEFAULT_MAX_BUCKET):
    """SimHash near-dup: 4 x 16-bit band buckets (pigeonhole: any pair
    with Hamming <= 3 shares at least one exact band) -> verify Hamming.
    Buckets above ``max_bucket`` verify a STAR on the min member instead
    of the full O(B^2) Hamming matrix (see _bucket_pair_indices)."""
    from engine.ops.dedup import exact_dedup
    from engine.ops.util import stage_task

    # stateless task + per-worker cache: see minhash_near_dup's rationale
    sigs = ds.map_batches(stage_task,
                          fn_kwargs={"_stage_cls": SimHasher, "id_col": id_col, "text_col": text_col},
                          batch_format="pyarrow")

    def explode(t: pa.Table) -> pa.Table:
        h = t["simhash"].to_numpy(zero_copy_only=False).view(np.uint64)
        ids = t[id_col].to_numpy(zero_copy_only=False)
        n = len(h)
        # one int64 bucket key: band index in the high bits, the band's
        # 16-bit slice in the low bits (single-column groupby downstream)
        bucket = np.concatenate([
            (((h >> np.uint64(16 * b)) & np.uint64(0xFFFF)) | np.uint64(b << 16)).astype(np.int64)
            for b in range(4)
        ])
        return pa.table({
            "bucket": pa.array(bucket),
            id_col: pa.array(np.tile(ids, 4)),
            "simhash": pa.array(np.tile(h.view(np.int64), 4)),
        })

    banded = sigs.map_batches(explode, batch_format="pyarrow")

    def emit(t: pa.Table) -> pa.Table:
        """All buckets of a partition in one pass: sorted runs -> global
        pair indices -> per-pair XOR popcount (no per-bucket UDF calls,
        no (B,B) Hamming matrices — the metric is computed on the PAIR
        LIST). Degenerate buckets contribute star pairs only."""
        idtype = t.schema.field(id_col).type
        order, _, ids, starts, sizes = _sorted_runs(t, id_col)
        hs = t["simhash"].to_numpy(zero_copy_only=False)[order].view(np.uint64)
        ii, jj = _run_pair_indices(starts, sizes, max_bucket)
        if ii.size:
            keep = ids[ii] != ids[jj]
            ii, jj = ii[keep], jj[keep]
        x = hs[ii] ^ hs[jj]
        ham = (np.unpackbits(x.view(np.uint8)).reshape(-1, 64).sum(axis=1)
               if x.size else np.empty(0, np.int64))
        ok = ham <= max_hamming
        return pa.table({"a": pa.array(ids[ii][ok], type=idtype),
                         "b": pa.array(ids[jj][ok], type=idtype),
                         "hamming": pa.array(ham[ok].astype(np.int32))})

    return exact_dedup(_bucketed_pairs(banded, emit), keys=["a", "b"])


def hash64_near_dup(ds, id_col: str, hash_col: str, max_hamming: int = 3,
                    max_bucket: int = DEFAULT_MAX_BUCKET):
    """Generic banded near-dup over ANY 64-bit hash column (the simhash
    pipeline with the signature stage factored out): 4 x 16-bit band
    buckets (pigeonhole-complete for Hamming <= 3) -> vectorized pair
    XOR-popcount verify -> (a, b, hamming) pair Dataset. Used for
    perceptual-hash image near-dup (hash_col='phash') and reusable for
    any precomputed fingerprint."""
    from engine.ops.dedup import exact_dedup

    def explode(t: pa.Table) -> pa.Table:
        h = t[hash_col].to_numpy(zero_copy_only=False).view(np.uint64)
        ids = t[id_col].to_numpy(zero_copy_only=False)
        bucket = np.concatenate([
            (((h >> np.uint64(16 * b)) & np.uint64(0xFFFF)) | np.uint64(b << 16)).astype(np.int64)
            for b in range(4)
        ])
        return pa.table({
            "bucket": pa.array(bucket),
            id_col: pa.array(np.tile(ids, 4)),
            hash_col: pa.array(np.tile(h.view(np.int64), 4)),
        })

    banded = ds.select_columns([id_col, hash_col]).map_batches(
        explode, batch_format="pyarrow", zero_copy_batch=True)

    def emit(t: pa.Table) -> pa.Table:
        idtype = t.schema.field(id_col).type
        order, _, ids, starts, sizes = _sorted_runs(t, id_col)
        hs = t[hash_col].to_numpy(zero_copy_only=False)[order].view(np.uint64)
        ii, jj = _run_pair_indices(starts, sizes, max_bucket)
        if ii.size:
            keep = ids[ii] != ids[jj]
            ii, jj = ii[keep], jj[keep]
        x = hs[ii] ^ hs[jj]
        ham = (np.unpackbits(x.view(np.uint8)).reshape(-1, 64).sum(axis=1)
               if x.size else np.empty(0, np.int64))
        ok = ham <= max_hamming
        return pa.table({"a": pa.array(ids[ii][ok], type=idtype),
                         "b": pa.array(ids[jj][ok], type=idtype),
                         "hamming": pa.array(ham[ok].astype(np.int32))})

    return exact_dedup(_bucketed_pairs(banded, emit), keys=["a", "b"])


# ----------------------------------------------------- embedding cosine --

def _emb_matrix(t: pa.Table, col: str) -> np.ndarray:
    arr = t[col]
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    if pa.types.is_fixed_size_list(arr.type):
        dim = arr.type.list_size
        return arr.flatten().to_numpy(zero_copy_only=False).astype(np.float64).reshape(-1, dim)
    if pa.types.is_list(arr.type) or pa.types.is_large_list(arr.type):
        off = arr.offsets.to_numpy(zero_copy_only=False)
        dim = int(np.diff(off)[0])
        return arr.flatten().to_numpy(zero_copy_only=False).astype(np.float64).reshape(-1, dim)
    # Ray tensor extension array (from_pandas with ndarray cells)
    m = np.asarray(arr.to_numpy(zero_copy_only=False).tolist() if arr.to_numpy(zero_copy_only=False).dtype == object else arr.to_numpy(zero_copy_only=False), dtype=np.float64)
    return m.reshape(len(t[col]), -1)


def embedding_near_dup_brute(ds, id_col: str = "vec_id", emb_col: str = "embedding",
                             threshold: float = 0.4, max_rows: int = 2_000_000):
    """Baseline O(n x N) path: normalized embeddings broadcast once; each
    batch computes cosine vs ALL rows (numpy matmul) and emits its pairs
    (a < b). Exact — kept as the SQL-checkable oracle and for small
    corpora; ``max_rows`` guards the driver-side materialization this
    inherently requires (the LSH-bucketed variant below is the scale path
    and never materializes the corpus)."""
    import ray

    full = ds.select_columns([id_col, emb_col]).to_pandas()
    if len(full) > max_rows:
        raise ValueError(
            f"embedding_near_dup_brute materializes the corpus driver-side "
            f"({len(full)} rows > max_rows={max_rows}); use embedding_near_dup_lsh "
            f"at this scale or raise max_rows explicitly")
    ids_all = full[id_col].to_numpy()
    m = np.stack(full[emb_col].to_numpy()).astype(np.float64)
    m /= np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-12)
    ref = ray.put((ids_all, m))

    def pairs(t: pa.Table) -> pa.Table:
        ids_a, mat = ray.get(ref)
        own = _emb_matrix(t, emb_col)
        own = own / np.maximum(np.linalg.norm(own, axis=1, keepdims=True), 1e-12)
        own_ids = t[id_col].to_numpy(zero_copy_only=False)
        cos = own @ mat.T
        ii, jj = np.nonzero(cos >= threshold)
        keep = own_ids[ii] < ids_a[jj]
        return pa.table({
            "a": pa.array(own_ids[ii][keep]),
            "b": pa.array(ids_a[jj][keep]),
            "cosine": pa.array(np.round(cos[ii, jj][keep], 5)),
        })

    return ds.map_batches(pairs, batch_format="pyarrow")


def embedding_near_dup_lsh(ds, id_col: str = "vec_id", emb_col: str = "embedding",
                           threshold: float = 0.4, n_planes: int = 12, n_tables: int = 6,
                           seed: int = 42, max_bucket: int = DEFAULT_MAX_BUCKET):
    """Scale path: sign-LSH (random hyperplanes). Each of n_tables hash
    tables buckets vectors by the sign pattern of n_planes projections;
    near-identical vectors collide in >=1 table w.h.p. ONE groupby per
    table-union; exact cosine verify within buckets. Approximate: recall
    < 1 for moderate thresholds (tested vs brute on planted duplicates)."""
    import ray

    from engine.ops.dedup import exact_dedup

    def make_planes(dim):
        rng = np.random.default_rng(seed)
        return rng.standard_normal((n_tables, n_planes, dim))

    first = ds.limit(1).to_pandas()
    dim = len(first[emb_col].iloc[0])
    planes_ref = ray.put(make_planes(dim))

    def bucketize(t: pa.Table) -> pa.Table:
        planes = ray.get(planes_ref)
        m = _emb_matrix(t, emb_col)
        mn = m / np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-12)
        ids = t[id_col].to_numpy(zero_copy_only=False)
        n = len(ids)
        hashes, out_ids, vecs = [], [], []
        for ti in range(n_tables):
            proj = mn @ planes[ti].T  # (n, planes)
            bits = (proj > 0).astype(np.uint64)
            h = np.zeros(n, dtype=np.uint64)
            for p in range(n_planes):
                h = (h << np.uint64(1)) | bits[:, p]
            # one int64 bucket key: table index above the sign-bit field
            hashes.append((h | np.uint64(ti << n_planes)).view(np.int64))
            out_ids.append(ids)
            vecs.append(mn)
        allv = np.concatenate(vecs, axis=0)
        return pa.table({
            "bucket": pa.array(np.concatenate(hashes)),
            id_col: pa.array(np.concatenate(out_ids)),
            "nvec": pa.FixedSizeListArray.from_arrays(pa.array(allv.reshape(-1)), dim),
        })

    banded = ds.map_batches(bucketize, batch_format="pyarrow")

    def emit(t: pa.Table) -> pa.Table:
        """All buckets of a partition in one pass: sorted runs -> global
        pair indices -> per-pair dot products of the (already normalized)
        vectors (no per-bucket UDF calls, no (B,B) cosine matrices).
        Degenerate buckets contribute star pairs only."""
        idtype = t.schema.field(id_col).type
        order, _, ids, starts, sizes = _sorted_runs(t, id_col)
        m = _emb_matrix(t, "nvec")[order]
        ii, jj = _run_pair_indices(starts, sizes, max_bucket)
        if ii.size:
            keep = ids[ii] != ids[jj]
            ii, jj = ii[keep], jj[keep]
        cos = np.einsum("ij,ij->i", m[ii], m[jj]) if ii.size else np.empty(0)
        ok = cos >= threshold
        return pa.table({"a": pa.array(ids[ii][ok], type=idtype),
                         "b": pa.array(ids[jj][ok], type=idtype),
                         "cosine": pa.array(np.round(cos[ok], 5))})

    return exact_dedup(_bucketed_pairs(banded, emit), keys=["a", "b"])


def dup_groups_from_pairs(pairs_df: pd.DataFrame) -> pd.DataFrame:
    """Union-find over a SMALL verified pair list -> (id, group_id) with
    group_id = min member id (native ordering). Driver-side fast path;
    ``dup_groups_distributed`` below is the at-scale equivalent (tested
    identical)."""
    parent: dict = {}

    def find(x):
        while parent.get(x, x) != x:
            parent[x] = parent.get(parent[x], parent[x])
            x = parent[x]
        return x

    for a, b in zip(pairs_df["a"], pairs_df["b"]):
        parent.setdefault(a, a)
        parent.setdefault(b, b)
        ra, rb = find(a), find(b)
        if ra != rb:
            ra, rb = (ra, rb) if ra <= rb else (rb, ra)
            parent[rb] = ra
    rows = [(x, find(x)) for x in parent]
    return pd.DataFrame(rows, columns=["id", "group_id"])


def dup_groups(pairs, small_threshold: int = 200_000, max_rounds: int = 25):
    """Size-dispatched connected components over a verified near-dup pair
    list -> Dataset(id, group_id).

    Verified pair lists are orders of magnitude smaller than the corpus
    (dup rate x fanout, ~0.1-1% of rows even on messy web data), so below
    ``small_threshold`` pairs (200k pairs ~= 3 MB) the component collapse
    runs driver-side with union-find — milliseconds instead of the ~1.3s
    PER ROUND that each distributed propagation round costs in exchange
    setup (measured, 8 CPUs). Above the threshold — a 100 TB corpus with
    billions of pairs — it dispatches to ``dup_groups_distributed``; the
    two are property-tested identical (tests/test_neardup.py)."""
    import ray.data as rd

    if isinstance(pairs, pd.DataFrame):
        if len(pairs) <= small_threshold:
            return rd.from_pandas(dup_groups_from_pairs(pairs))
        return dup_groups_distributed(rd.from_pandas(pairs[["a", "b"]]), max_rounds)
    pairs = pairs.select_columns(["a", "b"]).materialize()
    if pairs.count() <= small_threshold:
        return rd.from_pandas(dup_groups_from_pairs(pairs.to_pandas()))
    return dup_groups_distributed(pairs, max_rounds)


def dup_groups_distributed(pairs, max_rounds: int = 25):
    """Distributed connected components over a verified near-dup pair
    list: iterated MIN-LABEL PROPAGATION. Every node starts labeled with
    its own id; each round every node takes the min of its own label and
    its neighbors' labels (one equi-join to ship labels onto edges + one
    groupby-min to combine) until a fixpoint — converges in O(component
    diameter) rounds, and dup components are shallow (diameter ~ 2-4).
    Nothing is ever materialized per-component on the driver; the per-round
    labels table is one row per node that appears in a pair.

    pairs: Dataset or DataFrame with columns a, b. -> Dataset(id, group_id)
    (same groups as dup_groups_from_pairs, property-tested)."""
    import ray.data as rd
    from ray.data.aggregate import Min

    from engine.ops.join import equi_join

    if isinstance(pairs, pd.DataFrame):
        pairs = rd.from_pandas(pairs[["a", "b"]])

    def undirected(t: pa.Table) -> pa.Table:
        a = t["a"].combine_chunks() if isinstance(t["a"], pa.ChunkedArray) else t["a"]
        b = t["b"].combine_chunks() if isinstance(t["b"], pa.ChunkedArray) else t["b"]
        return pa.table({"src": pa.concat_arrays([a, b]), "dst": pa.concat_arrays([b, a])})

    edges = pairs.select_columns(["a", "b"]).map_batches(
        undirected, batch_format="pyarrow", zero_copy_batch=True).materialize()

    from engine.ops.agg import distinct_keys

    labels = distinct_keys(edges, "src").rename_columns({"src": "id"}).map_batches(
        lambda t: pa.table({"id": t["id"], "label": t["id"]}),
        batch_format="pyarrow").materialize()

    from engine.ops.partitioning import _cpus
    from engine.ops.util import drop_empty_blocks

    # each propagation round runs a join; the 2xCPU aggregator-actor
    # default costs ~0.3s startup per actor PER ROUND — cap it, and cap
    # harder when the edge list is provably small (it is materialized, so
    # count() is free metadata)
    n_edges = edges.count()
    jp = 2 if n_edges < 100_000 else max(2, min(_cpus() // 2, 16))

    def label_checksum(t: pa.Table) -> pa.Table:
        """Order-insensitive fingerprint of a labels block: wrap-sum of a
        SipHash of each (id, label) row, masked to 48 bits so the final
        cross-block int64 sum cannot overflow (blocks << 2^15). Used for
        fixpoint detection WITHOUT the old per-round compare join: labels
        changed iff the checksum changed (collision odds ~ rounds/2^48)."""
        hi = pd.util.hash_array(t["id"].to_numpy(zero_copy_only=False))
        hl = pd.util.hash_array(t["label"].to_numpy(zero_copy_only=False))
        h = hi * np.uint64(0x9E3779B97F4A7C15) + hl
        s = int(np.sum(h, dtype=np.uint64) & np.uint64((1 << 48) - 1))
        return pa.table({"ck": pa.array([s], type=pa.int64())})

    prev_ck = labels.map_batches(label_checksum, batch_format="pyarrow").sum("ck")
    for _round in range(max_rounds):
        # neighbor labels: ship each node's current label across its edges
        msg = (equi_join(edges, labels, on="src", right_on="id", num_partitions=jp)
               .select_columns(["dst", "label"])
               .rename_columns({"dst": "id"}))
        labels = drop_empty_blocks(
            labels.union(msg)
            .groupby("id")
            .aggregate(Min("label", alias_name="label"))
            .materialize())
        ck = labels.map_batches(label_checksum, batch_format="pyarrow").sum("ck")
        if ck == prev_ck:
            break
        prev_ck = ck
    return labels.rename_columns({"label": "group_id"})


# --------------------------------------------------------------- semdedup --

def _sem_centroids(ds, n_clusters: int, id_col: str, emb_col: str,
                   sample_frac: float, seed: int, n_rows: int | None = None,
                   max_sample_rows: int = 131_072) -> np.ndarray:
    """Deterministic k-means centroids: sample rows by splitmix64(id) <
    frac·2^64 (content-addressed — identical across partitionings and
    cluster sizes, unlike ``Dataset.random_sample`` whose draw depends
    on the physical plan), then seeded init + one Lloyd step.

    The driver-side pull is ABSOLUTELY capped: the effective fraction is
    min(sample_frac, max_sample_rows / n) so a 10^12-row corpus pulls
    ~max_sample_rows rows, not frac·corpus (the round-3 form was
    fraction-proportional). If the hash draw lands fewer rows than
    n_clusters (tiny corpus x small frac), fall back to the full corpus
    capped at max_sample_rows; zero rows is a clear error."""
    from engine.ops.agg import deterministic_sample

    cols = ds.select_columns([id_col, emb_col])
    if n_rows is None:
        n_rows = cols.count()
    frac = min(sample_frac, max_sample_rows / max(1, n_rows))
    samp = (deterministic_sample(cols, id_col, frac, hash_fn="splitmix64")
            .to_pandas().sort_values(id_col))
    if len(samp) < max(n_clusters, 1):
        samp = cols.limit(max_sample_rows).to_pandas().sort_values(id_col)
    if len(samp) == 0:
        raise ValueError(
            f"_sem_centroids: empty corpus — no rows to derive centroids from "
            f"(sample_frac={sample_frac}, n_rows={n_rows})")
    m = np.stack(samp[emb_col].to_numpy()).astype(np.float64)
    m /= np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-12)
    rng = np.random.default_rng(seed)
    init = m[rng.choice(len(m), size=min(n_clusters, len(m)), replace=False)]
    assign = np.argmax(m @ init.T, axis=1)
    cents = np.stack([
        m[assign == c].mean(axis=0) if (assign == c).any() else init[c]
        for c in range(len(init))])
    return cents / np.maximum(np.linalg.norm(cents, axis=1, keepdims=True), 1e-12)


def semdedup_prune(group: pa.Table, threshold: float, id_col: str,
                   emb_col: str, block: int = 1024) -> pa.Table:
    """Greedy within-cluster pruning (the SemDeDup inner loop): walk the
    cluster in id order; keep a vector iff its max cosine against every
    ALREADY-KEPT vector is < threshold.

    BLOCKED evaluation (identical greedy semantics to the sequential
    twin, pytest-oracled): each block of ``block`` rows computes ONE
    BLAS matmul against the whole kept prefix (the dominant cost,
    O(c·kept·d) but matrix-matrix instead of per-row gemv), then the
    residual within-block dependency — rows kept earlier in the SAME
    block — is resolved with gemvs against at most ``block`` vectors
    (cache-hot). Per-row Python work is O(1) bookkeeping."""
    ids = group[id_col].to_numpy(zero_copy_only=False)
    order = np.argsort(ids, kind="stable")
    m = _emb_matrix(group, emb_col)[order]
    m = m / np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-12)
    n = len(ids)
    kept_buf = np.empty_like(m)  # kept vectors packed contiguously: the
    nn_sim = np.zeros(n, dtype=np.float64)  # inner gemvs run on VIEWS,
    keep = np.zeros(n, dtype=bool)          # no fancy-index copy per row
    nk = 0
    for b0 in range(0, n, block):
        b1 = min(n, b0 + block)
        base = (np.max(m[b0:b1] @ kept_buf[:nk].T, axis=1) if nk
                else np.full(b1 - b0, -np.inf))
        bk0 = nk
        for i in range(b0, b1):
            s = base[i - b0]
            if nk > bk0:
                s = max(s, float(np.max(kept_buf[bk0:nk] @ m[i])))
            if nk:  # at least one kept vector precedes row i
                nn_sim[i] = s
                if s >= threshold:
                    continue
            keep[i] = True
            kept_buf[nk] = m[i]
            nk += 1
    out = group.take(pa.array(order))
    return (out.append_column("kept", pa.array(keep))
               .append_column("nn_sim", pa.array(nn_sim)))


def semdedup(ds, threshold: float = 0.85, n_clusters: int = 16,
             id_col: str = "vec_id", emb_col: str = "embedding",
             sample_frac: float = 0.2, seed: int = 42,
             target_cluster_rows: int = 65_536):
    """SemDeDup (Abbas et al. 2023, arXiv:2303.09540): cluster normalized
    embeddings with deterministic k-means, then greedily drop members
    whose cosine similarity to an earlier-kept member of the SAME
    cluster exceeds ``threshold``.  Shape: one broadcast centroid-assign
    map pass + ONE cluster-keyed groupby().map_groups — the only
    exchange.  Returns every row tagged (centroid_id, kept, nn_sim);
    filter kept to materialize the survivors.  Pytest oracle: a
    sequential NumPy twin in tests/test_semdedup.py.

    ``n_clusters`` is a FLOOR: the effective count is
    max(n_clusters, ceil(n / target_cluster_rows)) so no cluster
    approaches corpus size on a big corpus (each cluster is pruned
    inside ONE map_groups task — its size bounds that task's memory and
    the blocked-matmul prune's quadratic term)."""
    import ray

    n_rows = ds.count()
    n_clusters = max(n_clusters, -(-n_rows // target_cluster_rows))
    cents = _sem_centroids(ds, n_clusters, id_col, emb_col, sample_frac, seed,
                           n_rows=n_rows)
    ref = ray.put(cents)

    def tag(t: pa.Table) -> pa.Table:
        cm = ray.get(ref)
        mm = _emb_matrix(t, emb_col)
        mm = mm / np.maximum(np.linalg.norm(mm, axis=1, keepdims=True), 1e-12)
        cid = np.argmax(mm @ cm.T, axis=1).astype(np.int32)
        return t.append_column("centroid_id", pa.array(cid))

    tagged = ds.map_batches(tag, batch_format="pyarrow", zero_copy_batch=True)
    return tagged.groupby("centroid_id").map_groups(
        lambda g: semdedup_prune(g, threshold, id_col, emb_col),
        batch_format="pyarrow")
