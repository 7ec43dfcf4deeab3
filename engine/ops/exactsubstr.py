"""Exact-substring dedup (ExactSubstr family — Lee et al. 2021,
"Deduplicating Training Data Makes Language Models Better",
arXiv:2107.06499): find maximal byte-exact substrings of length >=
``min_len`` shared ACROSS documents, with the positions and lengths of
every duplicated extent.

The reference implementation builds one corpus-wide suffix array — a
global sort of every suffix, unusable as a streaming Ray shape. This
engine uses winnowing anchors (Schleimer et al. 2003, same kernel family
as engine/ops/textstats.Fingerprinter) instead:

  anchors   : ONE rolling-hash + windowed min/argmin pass per batch over
              the concatenated utf-8 buffer -> (fingerprint, doc, byte
              pos) rows, density ~2/(w+1) per byte (raise ``w`` to thin
              the exchange at scale)
  candidates: ONE hash-partitioned groupby co-locates each fingerprint;
              pairs emitted per sorted run (star-capped above
              ``max_bucket`` members — boilerplate shared by 10^5 docs
              emits anchors-to-min-doc edges, not O(B^2) pairs)
  diagonal  : groupby (a, b, pos_a - pos_b) min(pos_a) — every anchor on
              one alignment diagonal extends to the SAME maximal match,
              so one survivor per diagonal is verified
  verify    : re-join doc texts onto the candidate list by id (two hash
              joins, the minhash-verify pattern) and extend each anchor
              left/right to the maximal byte-equal extent; hash
              collisions die here (mismatched grams extend to < min_len)

WINNOWING GUARANTEE: every maximal cross-doc match of length >=
k + w - 1 bytes contains at least one full window whose min-value k-gram
is selected at the same relative offset in both documents (value ties
broken leftmost, identically on both sides), so with min_len >= k + w - 1
recall is EXACT — pytest-oracled against a brute-force
all-pairs-all-diagonals reference. Matches shorter than k + w - 1 are
best-effort.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from engine.ops.textstats import _poly_kgram_hashes


def _utf8_views(col) -> tuple[np.ndarray, np.ndarray]:
    """String column -> (byte offsets int64[n+1], one uint8 view of the
    whole data buffer): zero-copy byte access, no per-row as_py."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    if pa.types.is_large_string(col.type):
        col = col.cast(pa.string())
    n = len(col)
    offs = np.frombuffer(col.buffers()[1], dtype=np.int32)[
        col.offset : col.offset + n + 1].astype(np.int64)
    data = np.frombuffer(col.buffers()[2], dtype=np.uint8)
    return offs, data


def _window_min_argmin(hs: np.ndarray, w: int) -> tuple[np.ndarray, np.ndarray]:
    """(values, GLOBAL argmin positions) of each sliding window of w
    hashes — w-1 vector passes, leftmost occurrence on ties (the tie rule
    both sides of a shared substring apply identically)."""
    L = hs.size - w + 1
    m = hs[:L].copy()
    am = np.zeros(L, dtype=np.int64)
    for j in range(1, w):
        cand = hs[j : j + L]
        upd = cand < m
        m[upd] = cand[upd]
        am[upd] = j
    return m, am + np.arange(L, dtype=np.int64)


def _anchor_arrays(data: np.ndarray, offs: np.ndarray, k: int, w: int):
    """Batched winnowing WITH positions: -> (doc_idx, doc-relative byte
    pos, fingerprint) of the distinct selected anchors of every doc.
    Same doc-carving as textstats.Fingerprinter: windows never cross a
    document boundary because each doc's valid window range is sliced
    out of the global arrays. Docs shorter than k bytes emit nothing
    (they cannot contain a match of length >= min_len >= k)."""
    lens = np.diff(offs)
    n_docs = lens.size
    docs_parts, pos_parts, fp_parts = [], [], []
    if data.size >= k:
        hs = _poly_kgram_hashes(data, k)
        # docs with more than w k-grams: winnowed window min/argmin
        big = np.nonzero(lens - k + 1 > w)[0]
        if big.size:
            mins, arg = _window_min_argmin(hs, w)
            cnt = lens[big] - k - w + 2  # windows per doc
            tot = int(cnt.sum())
            idx = np.repeat(offs[big], cnt) + (
                np.arange(tot) - np.repeat(np.cumsum(cnt) - cnt, cnt))
            docs_parts.append(np.repeat(big, cnt))
            pos_parts.append(arg[idx])
            fp_parts.append(mins[idx])
        # docs with 1..w k-grams: single min (+leftmost argmin)
        small = np.nonzero((lens >= k) & (lens - k + 1 <= w))[0]
        for d in small:  # rare short docs; numpy argmin inside
            seg = hs[offs[d] : offs[d] + lens[d] - k + 1]
            a = int(np.argmin(seg))
            docs_parts.append(np.array([d], dtype=np.int64))
            pos_parts.append(np.array([offs[d] + a], dtype=np.int64))
            fp_parts.append(np.array([seg[a]], dtype=np.uint64))
    if not docs_parts:
        z = np.empty(0, np.int64)
        return z, z, z
    docs = np.concatenate(docs_parts)
    pos = np.concatenate(pos_parts)
    fp = np.concatenate(fp_parts).astype(np.uint64)
    # distinct (doc, pos): adjacent windows often select the same k-gram
    order = np.lexsort((pos, docs))
    docs, pos, fp = docs[order], pos[order], fp[order]
    keep = np.concatenate([[True], (docs[1:] != docs[:-1]) | (pos[1:] != pos[:-1])])
    docs, pos, fp = docs[keep], pos[keep], fp[keep]
    return docs, pos - offs[docs], fp.view(np.int64)


def winnow_anchors(text: str, k: int = 16, w: int = 17) -> list[tuple[int, int]]:
    """Reference per-doc form: [(byte_pos, fingerprint)] — thin wrapper
    over the batch kernel so the two can never drift (parity-tested)."""
    col = pa.array([text], pa.string())
    offs, data = _utf8_views(col)
    _, pos, fp = _anchor_arrays(data, offs, k, w)
    return list(zip(pos.tolist(), fp.tolist()))


def _extend_pairs(oa: np.ndarray, da: np.ndarray, pa0: np.ndarray,
                  ob: np.ndarray, db: np.ndarray, pb0: np.ndarray):
    """Extend each anchor pair left/right to the maximal byte-equal
    extent. da/db are concatenated utf-8 buffers, oa/ob the per-row doc
    byte offsets (len n+1 segments), pa0/pb0 the doc-relative anchor
    positions. Per-pair numpy slice compares (candidate lists are
    pair-bounded, not corpus-bounded). -> (start_a, start_b, length)."""
    n = pa0.size
    sa = np.empty(n, dtype=np.int64)
    sb = np.empty(n, dtype=np.int64)
    ln = np.empty(n, dtype=np.int64)
    for i in range(n):
        a0, a1 = oa[i], oa[i + 1]
        b0, b1 = ob[i], ob[i + 1]
        p, q = a0 + pa0[i], b0 + pb0[i]
        # right: first mismatch at/after the anchor
        m = min(a1 - p, b1 - q)
        diff = np.nonzero(da[p : p + m] != db[q : q + m])[0]
        right = int(diff[0]) if diff.size else int(m)
        # left: first mismatch walking backwards from the anchor
        m2 = min(p - a0, q - b0)
        diff2 = np.nonzero(da[p - m2 : p][::-1] != db[q - m2 : q][::-1])[0]
        left = int(diff2[0]) if diff2.size else int(m2)
        sa[i] = p - left - a0
        sb[i] = q - left - b0
        ln[i] = left + right
    return sa, sb, ln


def exact_substring_dup(ds, id_col: str = "doc_id", text_col: str = "text",
                        k: int = 16, w: int = 17, min_len: int = 32,
                        max_bucket: int = 1024):
    """-> Dataset(a, b, pos_a, pos_b, length): maximal cross-document
    byte-exact duplicate extents of length >= min_len (a < b; positions
    are utf-8 BYTE offsets). Exact for min_len >= k + w - 1 (winnowing
    guarantee above); ``max_bucket`` star-caps boilerplate fingerprints
    shared by very many docs (connectivity to the min doc preserved,
    full pair recall inside oversized buckets traded away)."""
    from engine.ops.neardup import (_bucketed_pairs, _run_pair_indices,
                                    _sorted_runs)

    if min_len < k + w - 1:
        raise ValueError(
            f"min_len={min_len} below the winnowing guarantee k+w-1={k + w - 1}: "
            f"recall would be silently partial — lower k/w instead")

    def anchors(t: pa.Table) -> pa.Table:
        offs, data = _utf8_views(t[text_col])
        docs, pos, fp = _anchor_arrays(data, offs, k, w)
        ids = t[id_col].to_numpy(zero_copy_only=False)
        return pa.table({"bucket": pa.array(fp),
                         id_col: pa.array(ids[docs]),
                         "pos": pa.array(pos)})

    banded = ds.map_batches(anchors, batch_format="pyarrow", zero_copy_batch=True)

    def emit(t: pa.Table) -> pa.Table:
        """Pairs per fingerprint run, locally deduped to one survivor per
        (a, b, alignment diagonal): anchors on the same diagonal all
        extend to the SAME maximal extent, so only one need be verified.
        The dedup is partition-LOCAL (the same diagonal reachable via a
        fingerprint in another partition re-verifies there — extra work,
        not extra results: the final exact_dedup collapses identical
        extents), which keeps the pipeline at one pair exchange."""
        idtype = t.schema.field(id_col).type
        order, _, ids, starts, sizes = _sorted_runs(t, id_col)
        pos = t["pos"].to_numpy(zero_copy_only=False)[order]
        ii, jj = _run_pair_indices(starts, sizes, max_bucket)
        if ii.size:
            keep = ids[ii] != ids[jj]  # cross-doc only
            ii, jj = ii[keep], jj[keep]
        ida, idb, pa_, pb_ = ids[ii], ids[jj], pos[ii], pos[jj]
        if ii.size:
            diag = pa_ - pb_
            o2 = np.lexsort((pa_, diag, idb, ida))
            ida, idb, pa_, pb_, diag = (ida[o2], idb[o2], pa_[o2], pb_[o2], diag[o2])
            first = np.concatenate([[True], (ida[1:] != ida[:-1])
                                    | (idb[1:] != idb[:-1])
                                    | (diag[1:] != diag[:-1])])
            ida, idb, pa_, pb_ = ida[first], idb[first], pa_[first], pb_[first]
        return pa.table({"a": pa.array(ida, type=idtype),
                         "b": pa.array(idb, type=idtype),
                         "pos_a": pa.array(pa_),
                         "pos_b": pa.array(pb_)})

    survivors = _bucketed_pairs(banded, emit)

    # verify + extend: re-join texts by doc id (minhash-verify pattern —
    # capped partitions, materialized join inputs so chained-join actor
    # pools can never deadlock the cluster)
    from engine.ops.join import equi_join
    from engine.ops.partitioning import _cpus, input_disk_bytes

    texts = ds.select_columns([id_col, text_col])
    by_bytes = max(2, input_disk_bytes(ds) // (32 << 20) + 1)
    P = max(2, min(_cpus() // 2, 16, by_bytes))
    survivors = survivors.materialize()
    texts = texts.materialize()
    j = equi_join(survivors, texts, on="a", right_on=id_col,
                  num_partitions=P).rename_columns(
        {text_col: "__text_a"}).materialize()
    j = equi_join(j, texts, on="b", right_on=id_col,
                  num_partitions=P).rename_columns({text_col: "__text_b"})

    def extend(t: pa.Table) -> pa.Table:
        oa, da = _utf8_views(t["__text_a"])
        ob, db = _utf8_views(t["__text_b"])
        sa, sb, ln = _extend_pairs(
            oa, da, t["pos_a"].to_numpy(zero_copy_only=False),
            ob, db, t["pos_b"].to_numpy(zero_copy_only=False))
        ok = ln >= min_len
        return pa.table({
            "a": t["a"].filter(pa.array(ok)),
            "b": t["b"].filter(pa.array(ok)),
            "pos_a": pa.array(sa[ok]),
            "pos_b": pa.array(sb[ok]),
            "length": pa.array(ln[ok]),
        })

    extended = j.map_batches(extend, batch_format="pyarrow")
    # distinct extents: different anchors on different diagonals can
    # extend into the SAME maximal span only if (a,b,pos_a,pos_b) differ,
    # but adjacent diagonals of a repetitive region can converge — dedup
    from engine.ops.dedup import exact_dedup

    return exact_dedup(extended, keys=["a", "b", "pos_a", "pos_b", "length"])
