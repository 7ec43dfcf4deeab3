"""Arrow-native partition-local window kernel (SURVEY.md §2.4 W1–W3).

Shared by engine.ops.window, engine.ops.session and
engine.pipelines.flagship.window_pass: every operator that hash-shuffles
by entity and then computes windows inside one entity-complete pa.Table
builds on these primitives, so wide payload columns (list<float> feature
vectors, binary image bytes) ride along ZERO-COPY through the single
sort `take` — no pandas round-trip, no per-entity Python loop.

Primitives:
  entity_sort      (entity, ts, tie)-sort + entity codes/boundaries
  segments         block starts/ends/ids/in-block positions
  lag_lead_arrays  arbitrary lag/lead shifts with block masking
  rolling_bounds   RANGE [t-w, t] peers-inclusive bounds via ONE banded
                   searchsorted over dense timestamp ranks (rank tables
                   keep the composite key bounded by row count — raw
                   microsecond keys wrap int64 at scale)
  windowed_minmax  min/max over arbitrary [lo, hi) row ranges via an RMQ
                   sparse table: O(n log n) build (the only loop is over
                   log n LEVELS), O(1) per query, fully vectorized —
                   replaces the old O(rows x window) per-row pandas loop
  session_labels   gap-break cumsum session ids
  run_reduce       contiguous-run aggregation (sessionize / tumbling)
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def ts_int64(t: pa.Table, ts: str) -> np.ndarray:
    """Timestamp column -> int64 MICROSECONDS (every window/gap parameter
    in the engine is in us; pandas-origin tables arrive as timestamp[ns])."""
    col = t[ts]
    typ = t.schema.field(ts).type
    if pa.types.is_timestamp(typ):
        if typ.unit != "us":
            col = col.cast(pa.timestamp("us", tz=typ.tz))
        return col.cast(pa.int64()).to_numpy(zero_copy_only=False)
    return col.to_numpy(zero_copy_only=False)


def entity_sort(t: pa.Table, entity: str, ts: str, tie_break: str | None = None):
    """Sort by (entity, ts, tie_break) -> (t_sorted, codes, tsv, change)."""
    n = t.num_rows
    ecol = t[entity]
    if isinstance(ecol, pa.ChunkedArray):
        ecol = ecol.combine_chunks()
    if pa.types.is_string(ecol.type) or pa.types.is_large_string(ecol.type) \
            or pa.types.is_binary(ecol.type):
        # C hash-table coding: ~20x faster than np.unique's O(n log n)
        # Python-string comparisons on 150k-row groups. Codes are
        # first-appearance order, not alphabetical — irrelevant here,
        # they only group rows (the lexsort below makes them contiguous).
        codes = ecol.dictionary_encode().indices.to_numpy(
            zero_copy_only=False).astype(np.int64)
    else:
        ent = ecol.to_numpy(zero_copy_only=False)
        _, codes = np.unique(ent, return_inverse=True)
        codes = codes.astype(np.int64)
    tsv = ts_int64(t, ts)
    tie = t[tie_break].to_numpy(zero_copy_only=False) if tie_break else np.arange(n)
    order = np.lexsort((tie, tsv, codes))
    t = t.take(pa.array(order))
    codes, tsv = codes[order], tsv[order]
    change = np.empty(n, dtype=bool)
    if n:
        change[0] = True
        change[1:] = codes[1:] != codes[:-1]
    return t, codes, tsv, change


def segments(change: np.ndarray):
    """-> (starts, ends, seg_id, pos): entity-block boundaries, the block
    id per row, and each row's 0-based position within its block."""
    n = change.size
    starts = np.flatnonzero(change)
    ends = np.append(starts[1:], n)
    seg_id = np.cumsum(change) - 1
    pos = np.arange(n) - (starts[seg_id] if n else np.zeros(0, np.int64))
    return starts, ends, seg_id, pos


def lag_lead_arrays(v: np.ndarray, change: np.ndarray,
                    lags=(), leads=()) -> dict[tuple[str, int], np.ndarray]:
    """lag/lead shifts of v (float64) masked at entity boundaries."""
    n = v.size
    _starts, ends, seg_id, pos = segments(change)
    out: dict[tuple[str, int], np.ndarray] = {}
    for k in lags:
        a = np.full(n, np.nan)
        if n > k:
            a[k:] = v[: n - k]
        a[pos < k] = np.nan
        out[("lag", k)] = a
    if leads:
        rem = (ends[seg_id] - 1) - np.arange(n) if n else np.zeros(0, np.int64)
        for k in leads:
            a = np.full(n, np.nan)
            if n > k:
                a[: n - k] = v[k:]
            a[rem < k] = np.nan
            out[("lead", k)] = a
    return out


def window_sums(v: np.ndarray, lo: np.ndarray, hi: np.ndarray) -> np.ndarray:
    """Sum of v over [lo, hi) per row via one prefix sum. The running
    total is accumulated in EXTENDED precision (longdouble): with a plain
    float64 cumsum the rounding of cs[hi]-cs[lo] depends on how much data
    precedes the window in the partition, so results would differ across
    partition counts (partition invariance is a stated engine property,
    SURVEY §5.2.3)."""
    cs = np.concatenate([np.zeros(1, np.longdouble), np.cumsum(v, dtype=np.longdouble)])
    return (cs[hi] - cs[lo]).astype(np.float64)


def rolling_bounds(codes: np.ndarray, tsv: np.ndarray, window_us: int):
    """SQL `RANGE BETWEEN w PRECEDING AND CURRENT ROW` (peers-inclusive
    [t-w, t]) -> per-row global bounds (lo, hi) with hi exclusive.
    Requires rows sorted by (codes, tsv)."""
    n = codes.size
    qlo_ts = tsv - window_us
    uts, inv = np.unique(np.concatenate([tsv, qlo_ts]), return_inverse=True)
    base = np.int64(uts.size + 1)
    ck = codes * base + inv[:n]
    lo = np.searchsorted(ck, codes * base + inv[n:], side="left")
    hi = np.searchsorted(ck, ck, side="right")
    return lo, hi


def windowed_minmax(v: np.ndarray, lo: np.ndarray, hi: np.ndarray):
    """(min, max) of v over [lo, hi) per QUERY; empty windows -> nan.
    lo/hi may be any length (not necessarily len(v))."""
    n, nq = v.size, lo.size
    mn = np.full(nq, np.nan)
    mx = np.full(nq, np.nan)
    if n == 0 or nq == 0:
        return mn, mx
    w = hi - lo
    wmax = int(w.max()) if w.size else 0
    base_lv = v.astype(np.float64)
    stmin, stmax = [base_lv], [base_lv]
    while (1 << len(stmin)) <= wmax:
        k = len(stmin)
        half = 1 << (k - 1)
        m = n - (1 << k) + 1
        if m <= 0:
            break
        stmin.append(np.minimum(stmin[-1][:m], stmin[-1][half : half + m]))
        stmax.append(np.maximum(stmax[-1][:m], stmax[-1][half : half + m]))
    nz = w > 0
    lev = np.zeros(nq, dtype=np.int64)
    lev[nz] = np.floor(np.log2(w[nz])).astype(np.int64)
    lev = np.minimum(lev, len(stmin) - 1)
    for level in range(len(stmin)):
        sel = nz & (lev == level)
        if not sel.any():
            continue
        left = lo[sel]
        right = hi[sel] - (1 << level)
        mn[sel] = np.minimum(stmin[level][left], stmin[level][right])
        mx[sel] = np.maximum(stmax[level][left], stmax[level][right])
    return mn, mx


def session_labels(change: np.ndarray, tsv: np.ndarray, gap_us: int) -> np.ndarray:
    """0-based session index per row: a new session starts when the
    in-entity gap exceeds gap_us. Requires (entity, ts)-sorted input."""
    n = change.size
    brk = np.zeros(n, dtype=np.int64)
    if n:
        brk[1:] = (~change[1:]) & ((tsv[1:] - tsv[:-1]) > gap_us)
    cum = np.cumsum(brk)
    starts = np.flatnonzero(change)
    seg_id = np.cumsum(change) - 1
    return cum - cum[starts][seg_id] if n else cum


def run_starts(*keys: np.ndarray) -> np.ndarray:
    """Boolean mask marking the first row of each contiguous run of equal
    key tuples (keys must be 'sorted' so groups are contiguous)."""
    n = keys[0].size
    first = np.zeros(n, dtype=bool)
    if n:
        first[0] = True
        for k in keys:
            first[1:] |= k[1:] != k[:-1]
    return first


def run_reduce(first: np.ndarray, v: np.ndarray | None = None):
    """Aggregate contiguous runs: -> (starts, ends, counts, sums) where
    sums is None when v is None. reduceat-free: one cumsum per stat."""
    starts = np.flatnonzero(first)
    ends = np.append(starts[1:], first.size)
    counts = ends - starts
    sums = None
    if v is not None:
        sums = window_sums(v.astype(np.float64), starts, ends)
    return starts, ends, counts, sums


def ewma_arrays(v: np.ndarray, tsv: np.ndarray, change: np.ndarray,
                halflife_us: float, block_halflives: float = 512.0) -> np.ndarray:
    """Time-decayed exponentially weighted moving average per entity:
    ewma_i = sum_{j<=i} v_j 2^-((t_i-t_j)/hl) / sum_{j<=i} 2^-((t_i-t_j)/hl)
    over (entity, ts)-sorted rows (``change`` marks entity starts).

    Vectorized via per-run renormalized prefix sums: within a run
    (entity segment split wherever the halflife-scaled time offset
    crosses a ``block_halflives`` boundary, so every exponent stays in
    [0, 512) — far from float64 overflow at 2^1024), both numerator and
    weight are ONE cumsum of v_j*2^e_j; history older than the run
    arrives as a scalar carry decayed once per run boundary (it
    underflows to exactly 0 past ~1074 halflives — where its true
    contribution is below any representable difference). The Python
    loop is per RUN (~one per entity plus one per 512 halflives of
    span), never per row. Equals the sequential per-row recurrence to
    float64 rounding (tests/test_window.py parity)."""
    n = v.size
    out = np.empty(n, dtype=np.float64)
    if n == 0:
        return out
    d = tsv.astype(np.float64) / float(halflife_us)
    starts_seg, _ends, seg_id, _pos = segments(change)
    d_rel = d - d[starts_seg[seg_id]]
    blk = np.floor(d_rel / block_halflives)
    rchange = change.copy()
    rchange[1:] |= blk[1:] != blk[:-1]
    rstarts = np.flatnonzero(rchange)
    rends = np.append(rstarts[1:], n)
    cv = cw = prev_base = 0.0
    for lo, hi in zip(rstarts, rends):
        e = d_rel[lo:hi] - d_rel[lo]
        w = np.exp2(e)
        pv = np.cumsum(v[lo:hi] * w)
        pw = np.cumsum(w)
        if change[lo]:
            cv = cw = 0.0
        else:
            scale = np.exp2(prev_base - d_rel[lo])
            cv *= scale
            cw *= scale
        # the 2^-e_i decay cancels between numerator and weight
        out[lo:hi] = (pv + cv) / (pw + cw)
        cv += pv[-1]
        cw += pw[-1]
        prev_base = d_rel[lo]
    return out
