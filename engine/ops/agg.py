"""Quantiles, deterministic sampling, and entity-set operations
(SURVEY.md §2.5 A6 / O3 / E2).

Quantiles: Ray's built-in ``ray.data.aggregate.Quantile`` accumulates
every value into a Python list on one reducer — O(group size) driver-side
memory, unusable for 100 TB groups. ``grouped_quantiles`` instead ships
each group once through ``groupby().map_groups`` and computes all
requested quantiles in one vectorized ``np.quantile`` call (linear
interpolation == DuckDB ``quantile_cont``, verified bit-exact). For
groups too large to hold (>~1e8 rows) the scale path is
``grouped_quantiles(..., sample_frac=f)`` which pre-thins each group with
the same deterministic hash sampler used by ``deterministic_sample`` —
error is O(1/sqrt(f·n)) and the thinning happens inside map_batches
BEFORE the shuffle, so the exchange also shrinks by f.

Sampling: ``random_sample`` is seed-dependent per execution plan, which
makes resumable / re-run pipelines non-reproducible. The engine's
canonical sampler is content-deterministic instead: keep a row iff the
first 32 bits of ``md5(str(key))`` fall below ``frac * 2^32``. Same rows
on every run, every partitioning, every cluster size — and expressible
in ANSI SQL for the oracle.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc


def _md5_u32(col) -> np.ndarray:
    """First 32 bits of md5(str(v)) per value, as uint64.

    Accepts a pyarrow Array/ChunkedArray (or any sequence). The per-value
    Python-object churn (str() + encode + hexdigest + int(,16)) is replaced
    by ONE vectorized arrow cast to a contiguous utf-8 buffer, then md5 C
    calls over memoryview slices — md5 itself is inherently per-value, but
    nothing else is. For a fully vectorized sampler use splitmix64 below.
    """
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    if isinstance(col, pa.Array):
        s = pc.cast(col, pa.large_string()) if not pa.types.is_large_string(col.type) else col
        n = len(s)
        offs = np.frombuffer(s.buffers()[1], dtype=np.int64, count=n + 1, offset=8 * s.offset)
        mv = memoryview(s.buffers()[2])
        md5 = hashlib.md5
        fb = int.from_bytes
        out = np.fromiter(
            (fb(md5(mv[offs[i] : offs[i + 1]]).digest()[:4], "big") for i in range(n)),
            dtype=np.uint64, count=n,
        )
        return out
    out = np.empty(len(col), dtype=np.uint64)
    for i, v in enumerate(col):
        s = v if isinstance(v, str) else str(v)
        out[i] = int(hashlib.md5(s.encode("utf-8")).hexdigest()[:8], 16)
    return out


def splitmix64(x: np.ndarray) -> np.ndarray:
    """Vectorized splitmix64 finalizer over uint64 (wraparound multiply).

    DuckDB twin (HUGEINT emulates the mod-2^64 multiply)::

        CAST((CAST(x # (x >> 30) AS HUGEINT) * 13787848793156543929)
             % 18446744073709551616 AS UBIGINT)   -- stage 1, etc.
    """
    with np.errstate(over="ignore"):
        x = x.astype(np.uint64, copy=True)
        x ^= x >> np.uint64(30)
        x *= np.uint64(0xBF58476D1CE4E5B9)
        x ^= x >> np.uint64(27)
        x *= np.uint64(0x94D049BB133111EB)
        x ^= x >> np.uint64(31)
    return x


def _mulmod64_sql(x: str, c: int) -> str:
    """(x * c) mod 2^64 in DuckDB. HUGEINT is SIGNED 128-bit, so a full
    64x64 product overflows; split the constant: x*c = x*cl + (x*ch mod
    2^32)*2^32 (mod 2^64), every intermediate < 2^97."""
    ch, cl = c >> 32, c & 0xFFFFFFFF
    return (f"CAST((CAST({x} AS HUGEINT) * {cl} + "
            f"((CAST({x} AS HUGEINT) * {ch}) % 4294967296) * 4294967296) "
            f"% 18446744073709551616 AS UBIGINT)")


def splitmix64_sql(expr: str) -> str:
    """The DuckDB expression computing splitmix64(expr) as UBIGINT."""
    x0 = f"CAST({expr} AS UBIGINT)"
    x1 = _mulmod64_sql(f"xor({x0}, {x0} >> 30)", 0xBF58476D1CE4E5B9)
    x2 = _mulmod64_sql(f"xor({x1}, {x1} >> 27)", 0x94D049BB133111EB)
    return f"xor({x2}, {x2} >> 31)"


def _hash_u64(col, hash_fn: str) -> np.ndarray:
    if hash_fn == "md5":
        return _md5_u32(col)
    if hash_fn == "splitmix64":
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        v = col.to_numpy(zero_copy_only=False)
        return splitmix64(v.astype(np.int64).view(np.uint64))
    raise ValueError(f"unknown hash_fn: {hash_fn}")


def _hash_modulus(hash_fn: str) -> int:
    return 4294967296 if hash_fn == "md5" else 18446744073709551616


def deterministic_sample(ds, key: str, frac: float, hash_fn: str = "md5"):
    """Content-deterministic row sample: hash(key) < frac·modulus.

    hash_fn="md5" (default): md5(str(key))[:32 bits]; SQL oracle
    ``WHERE CAST(('0x' || substr(md5(CAST(key AS VARCHAR)),1,8))
    AS UBIGINT) < CAST(frac * 4294967296 AS UBIGINT)``. Portable to any
    SQL engine but md5 is per-value C calls.

    hash_fn="splitmix64": fully vectorized numpy path for integer keys —
    the 100-TB full-scan choice; SQL oracle via ``splitmix64_sql``.
    """
    threshold = np.uint64(int(frac * _hash_modulus(hash_fn)))

    def flt(t: pa.Table) -> pa.Table:
        mask = _hash_u64(t[key], hash_fn) < threshold
        return t.filter(pa.array(mask))

    return ds.map_batches(flt, batch_format="pyarrow", zero_copy_batch=True)


def stratified_sample(ds, group: str, key: str, fracs: dict, default_frac: float = 0.0,
                      hash_fn: str = "md5"):
    """Per-group deterministic sampling (class rebalancing for training
    sets): keep a row iff hash(key) < frac(group value)·modulus. Same
    reproducibility properties as deterministic_sample; groups absent
    from ``fracs`` keep ``default_frac`` of their rows."""
    mod = _hash_modulus(hash_fn)
    thresholds = {g: np.uint64(int(f * mod)) for g, f in fracs.items()}
    default_t = np.uint64(int(default_frac * mod))

    def flt(t: pa.Table) -> pa.Table:
        h = _hash_u64(t[key], hash_fn)
        # dictionary-encode so the python dict lookup runs once per UNIQUE
        # group value, not once per row
        enc = t[group].combine_chunks().dictionary_encode()
        cuts = np.array([thresholds.get(g, default_t) for g in enc.dictionary.to_pylist()],
                        dtype=np.uint64)
        cut = cuts[enc.indices.to_numpy(zero_copy_only=False)] if len(cuts) else np.array([], dtype=np.uint64)
        return t.filter(pa.array(h < cut))

    return ds.map_batches(flt, batch_format="pyarrow", zero_copy_batch=True)


def grouped_quantiles(ds, key, col: str, qs: tuple[float, ...] = (0.5,),
                      sample_frac: float | None = None, round_digits: int | None = None,
                      sample_key: str | None = None, hash_fn: str = "md5"):
    """Exact per-group quantiles (linear interpolation, == quantile_cont).

    One shuffle (the groupby); each group computed in a single vectorized
    np.quantile call. ``sample_frac`` switches to the deterministic-sample
    approximation for groups that cannot be materialized whole.
    ``sample_key`` names a row-IDENTITY column to hash for that thinning —
    required with sample_frac: hashing the value column itself would keep
    or drop every row sharing a value together, which biases the estimate
    arbitrarily for discrete/rounded/zero-inflated distributions (a heavily
    repeated median can vanish from the sample entirely).
    """
    keys = [key] if isinstance(key, str) else list(key)
    if sample_frac is not None:
        if sample_key is None:
            raise ValueError(
                "grouped_quantiles(sample_frac=...) needs sample_key= (a row-identity "
                "column); sampling on the value column biases repeated values")
        ds = deterministic_sample(ds, sample_key, sample_frac, hash_fn=hash_fn)

    def grp(t: pa.Table) -> pa.Table:
        v = t[col].to_numpy(zero_copy_only=False).astype(np.float64)
        v = v[~np.isnan(v)]
        cols = {kk: t[kk].slice(0, 1) for kk in keys}
        for q in qs:
            val = float(np.quantile(v, q)) if len(v) else np.nan
            if round_digits is not None:
                m = 10.0 ** round_digits
                val = np.trunc(abs(val) * m + 0.5) / m * (1 if val >= 0 else -1)
            cols[f"p{int(q * 100):02d}_{col}"] = pa.array([val], type=pa.float64())
        return pa.table(cols)

    return ds.groupby(keys).map_groups(grp, batch_format="pyarrow")


def _order_key(t: pa.Table, col: str, descending: bool) -> np.ndarray:
    """Order-preserving lexsort key for one column: ``~x`` for descending
    ints (exact, no overflow at int64 min), ``-x`` for descending floats."""
    v = t[col].to_numpy(zero_copy_only=False)
    if not descending:
        return v
    if np.issubdtype(v.dtype, np.integer):
        return ~v
    return -v.astype(np.float64, copy=False)


def _group_codes(t: pa.Table, keys: list[str]) -> np.ndarray:
    """Composite int64 group identity via Arrow dictionary_encode (one C
    pass per key column — no Python-object hashing, any key dtype)."""
    codes = None
    for kcol in keys:
        arr = t[kcol]
        if isinstance(arr, pa.ChunkedArray):
            arr = arr.combine_chunks()
        enc = arr.dictionary_encode()
        idx = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        card = np.int64(len(enc.dictionary))
        codes = idx if codes is None else codes * card + idx
    return codes


def grouped_topk(ds, key, order_col: str, k: int, descending: bool = True,
                 tie_break: str | None = None):
    """Top-k rows per group by ``order_col`` (SQL ROW_NUMBER() <= k).

    Two-level: each batch keeps its local per-group top-k inside
    map_batches (shrinks the exchange to <= k rows per group per block),
    then one groupby finishes the selection — the grouped analog of
    sort().limit(). Both levels are Arrow-native (dictionary-encoded
    group codes + one lexsort + run ranks — no pandas round-trip)."""
    keys = [key] if isinstance(key, str) else list(key)

    def local(t: pa.Table) -> pa.Table:
        n = t.num_rows
        if n == 0:
            return t
        sort_keys = [t[tie_break].to_numpy(zero_copy_only=False)] if tie_break else []
        sort_keys.append(_order_key(t, order_col, descending))
        g = _group_codes(t, keys)
        order = np.lexsort((*sort_keys, g))
        gs = g[order]
        run_start = np.zeros(n, dtype=np.int64)
        new = np.nonzero(np.concatenate([[True], gs[1:] != gs[:-1]]))[0]
        run_start[new] = new
        np.maximum.accumulate(run_start, out=run_start)
        rank = np.arange(n, dtype=np.int64) - run_start
        return t.take(pa.array(order[rank < k]))

    pre = ds.map_batches(local, batch_format="pyarrow", zero_copy_batch=True)

    def final(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return t
        sort_keys = [t[tie_break].to_numpy(zero_copy_only=False)] if tie_break else []
        sort_keys.append(_order_key(t, order_col, descending))
        order = np.lexsort(tuple(sort_keys))[:k]
        return t.take(pa.array(order))

    return pre.groupby(keys).map_groups(final, batch_format="pyarrow")


def grouped_mode(ds, key, col: str, out: str | None = None):
    """Most frequent ``col`` value per group (deterministic: ties break
    by value ascending — DuckDB's own mode() is first-seen and unstable,
    so the SQL oracle must use the ROW_NUMBER form).

    Shape: groupby(key, col).count() — one exchange of pre-combined
    partials over the (group, value) pairs, NOT the raw rows — then the
    per-group argmax is a grouped top-1 over that already-small table."""
    from ray.data.aggregate import Count

    keys = [key] if isinstance(key, str) else list(key)
    out = out or f"mode_{col}"
    counted = ds.groupby(keys + [col]).aggregate(Count(alias_name="__cnt"))
    top = grouped_topk(counted, keys, "__cnt", k=1, descending=True, tie_break=col)

    def rename(t: pa.Table) -> pa.Table:
        t = t.drop_columns(["__cnt"])
        i = t.schema.get_field_index(col)
        return t.set_column(i, out, t.column(i))

    return top.map_batches(rename, batch_format="pyarrow", zero_copy_batch=True)


def grouped_sample_k(ds, group, key: str, k: int):
    """Deterministic uniform k-sample per group: keep the k rows with the
    smallest splitmix64(key) — content-addressed like deterministic_sample
    (invariant to partitioning; exact SQL twin via splitmix64_sql), and
    the selection is the two-level grouped top-k, so only <= k rows per
    group per block enter the exchange."""
    def tag(t: pa.Table) -> pa.Table:
        h = _hash_u64(t[key], "splitmix64")
        # int64 view keeps Arrow happy; flipping the sign bit preserves
        # the uint64 ordering the SQL twin sorts by
        return t.append_column("__sk", pa.array((h ^ np.uint64(1 << 63)).view(np.int64)))

    tagged = ds.map_batches(tag, batch_format="pyarrow", zero_copy_batch=True)
    picked = grouped_topk(tagged, group, "__sk", k=k, descending=False, tie_break=key)
    return picked.map_batches(lambda t: t.drop_columns(["__sk"]),
                              batch_format="pyarrow", zero_copy_batch=True)


def pivot(ds, index: str, column: str, value: str, categories: list,
          agg: str = "sum", prefix: str | None = None):
    """Wide conditional aggregate: one row per ``index`` value, one output
    column per category of ``column`` holding agg(value) over matching
    rows. Categories must be supplied (bounded, known set — at scale an
    unbounded pivot is a schema explosion, so the engine refuses to infer
    them). Per-batch partial pivot shrinks the exchange to
    O(|index| x |categories|) before one small groupby-sum; "mean" is
    computed as sum/count in a map stage after the combine (exact).

    Returns a DATASET (one row per index value): |index| is unbounded
    (a user-keyed pivot at 10^9 users), so nothing lands on the driver
    heap — callers ``to_pandas()`` at the edge when the result is known
    small."""
    from ray.data.aggregate import Sum

    if agg not in ("sum", "count", "mean"):
        raise ValueError(f"unsupported pivot agg: {agg}")
    pre = prefix if prefix is not None else f"{agg}_{value}_"
    cats = list(categories)

    def partial(t: pa.Table) -> pa.Table:
        idx = t[index].to_numpy(zero_copy_only=False)
        cat = np.asarray(t[column].to_pylist())
        v = t[value].to_numpy(zero_copy_only=False).astype(np.float64)
        uniq, inv = np.unique(idx, return_inverse=True)
        cols = {index: pa.array(uniq)}
        for c in cats:
            m = cat == c
            s = np.zeros(len(uniq))
            n = np.zeros(len(uniq))
            np.add.at(s, inv[m], v[m])
            np.add.at(n, inv[m], 1.0)
            cols[f"__s_{c}"] = pa.array(s)
            cols[f"__n_{c}"] = pa.array(n)
        return pa.table(cols)

    aggs = []
    for c in cats:
        aggs.append(Sum(f"__s_{c}", alias_name=f"__s_{c}"))
        aggs.append(Sum(f"__n_{c}", alias_name=f"__n_{c}"))
    combined = (
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(index)
        .aggregate(*aggs)
    )

    def finish(t: pa.Table) -> pa.Table:
        cols = {index: t[index]}
        for c in cats:
            s = t[f"__s_{c}"].to_numpy(zero_copy_only=False)
            n = t[f"__n_{c}"].to_numpy(zero_copy_only=False)
            if agg == "sum":
                cols[f"{pre}{c}"] = pa.array(s)
            elif agg == "count":
                cols[f"{pre}{c}"] = pa.array(n.astype(np.int64))
            else:
                cols[f"{pre}{c}"] = pa.array(
                    np.where(n > 0, s / np.where(n > 0, n, 1.0), np.nan))
        return pa.table(cols)

    return combined.map_batches(finish, batch_format="pyarrow", zero_copy_batch=True)


def distinct_keys(ds, on: str):
    """DISTINCT on one column: per-batch local dedup (shrinks the
    exchange), then groupby-aggregate (whose reduce emits schema-stable
    blocks — unlike sort+map_groups, which can pass through schema-less
    empty blocks that break downstream joins)."""
    from ray.data.aggregate import Count

    def local(t: pa.Table) -> pa.Table:
        return pa.table({on: pc.unique(t[on].combine_chunks())})

    pre = ds.select_columns([on]).map_batches(local, batch_format="pyarrow",
                                              zero_copy_batch=True)
    return pre.groupby(on).aggregate(Count(alias_name="__n")).drop_columns(["__n"])


def collect_list(ds, key, col: str, order_by: str | None = None, out: str | None = None):
    """Inverse of engine.ops.explode: per group, gather ``col`` into one
    list (ordered by ``order_by`` when given). One groupby shuffle; the
    per-group gather is a vectorized argsort + single ListArray build."""
    keys = [key] if isinstance(key, str) else list(key)
    out = out or f"{col}_list"

    def grp(t: pa.Table) -> pa.Table:
        import numpy as np

        if t.num_rows == 0:
            return t
        v = t[col]
        if order_by is not None:
            order = np.argsort(t[order_by].to_numpy(zero_copy_only=False), kind="stable")
            t = t.take(pa.array(order))
            v = t[col]
        row = {k: [t[k][0].as_py()] for k in keys}
        vals = v.combine_chunks() if isinstance(v, pa.ChunkedArray) else v
        row[out] = pa.ListArray.from_arrays(pa.array([0, len(vals)], type=pa.int32()), vals)
        cols = {k: pa.array(row[k]) for k in keys}
        cols[out] = row[out]
        return pa.table(cols)

    return ds.groupby(keys).map_groups(grp, batch_format="pyarrow")


def intersect_keys(left, right, on: str, right_on: str | None = None,
                   num_partitions: int | None = None):
    """Distinct keys present on BOTH sides (SQL INTERSECT on one column)."""
    from engine.ops.join import semi_join

    r = right.select_columns([right_on or on])
    return semi_join(distinct_keys(left, on), r, on=on, right_on=right_on,
                     num_partitions=num_partitions)


def except_keys(left, right, on: str, right_on: str | None = None,
                num_partitions: int | None = None):
    """Distinct left keys absent from right (SQL EXCEPT on one column)."""
    from engine.ops.join import anti_join

    r = right.select_columns([right_on or on])
    return anti_join(distinct_keys(left, on), r, on=on, right_on=right_on,
                     num_partitions=num_partitions)


def split_assign(ds, key: str, fractions: dict[str, float], hash_fn: str = "splitmix64",
                 out_col: str = "split"):
    """Deterministic train/val/test assignment: each row gets the first
    label whose cumulative fraction bound exceeds hash(key)/modulus.

    Content-addressed (same key -> same split across runs, machines and
    partition counts — the property a 100-TB training corpus needs so a
    re-run or a late-arriving shard can never leak val rows into train).
    Purely map-side: no shuffle, no state. Fractions must sum to 1.
    SQL twin: CASE WHEN splitmix64(key) < t1 THEN ... (splitmix64_sql).
    """
    labels = list(fractions)
    bounds = np.array(_split_bounds(fractions, _hash_modulus(hash_fn)), dtype=np.uint64)
    dictionary = pa.array(labels, type=pa.string())

    def tag(t: pa.Table) -> pa.Table:
        h = _hash_u64(t[key], hash_fn)
        idx = np.searchsorted(bounds, h, side="right").astype(np.int32)
        lab = pa.DictionaryArray.from_arrays(pa.array(idx), dictionary).cast(pa.string())
        return t.append_column(out_col, lab)

    return ds.map_batches(tag, batch_format="pyarrow", zero_copy_batch=True)


def _split_bounds(fractions: dict[str, float], mod: int) -> list[int]:
    """Interior cumulative bounds (len = n_labels - 1) as exact Python
    ints; hash < bounds[i] -> labels[i], else the last label. The final
    bound (= modulus) is implicit so nothing ever overflows uint64."""
    if abs(sum(fractions.values()) - 1.0) > 1e-9:
        raise ValueError(f"fractions must sum to 1, got {fractions}")
    cum, out = 0.0, []
    for f in list(fractions.values())[:-1]:
        cum += f
        out.append(min(int(cum * mod), mod - 1))
    return out


def split_assign_sql(key_expr: str, fractions: dict[str, float]) -> str:
    """DuckDB CASE expression mirroring split_assign(hash_fn='splitmix64')."""
    labels = list(fractions)
    bounds = _split_bounds(fractions, 18446744073709551616)
    h = splitmix64_sql(key_expr)
    clauses = " ".join(
        f"WHEN {h} < CAST('{b}' AS UBIGINT) THEN '{labels[i]}'"
        for i, b in enumerate(bounds))
    return f"CASE {clauses} ELSE '{labels[-1]}' END"


def weighted_sample(ds, k: int, key: str, weight_col: str,
                    hash_fn: str = "splitmix64"):
    """Deterministic weighted sample WITHOUT replacement (Efraimidis &
    Spirakis A-Res, log-key form; cf. "Streaming Weighted Sampling over
    Join Queries", EDBT 2023): rank key = ln(u)/w with u derived from
    hash(key) — content-addressed, so the same k rows win on every run,
    partitioning and cluster size.  Fully streaming: each batch keeps
    its local top-k (O(batch) argpartition), the global finish sorts
    <= k rows per block.  Rows with weight <= 0 are excluded (their
    inclusion probability is 0).  Output is the winning rows' exact
    columns (no float key), so the DuckDB twin (weighted_sample_sql) is
    value-exact; the float ranking only decides SELECTION, where a
    last-ulp libm difference would need two keys within ~1e-16 of each
    other at the k boundary to flip."""
    mod = float(_hash_modulus(hash_fn))

    def local(t: pa.Table) -> pa.Table:
        w = t[weight_col].to_numpy(zero_copy_only=False).astype(np.float64)
        h = _hash_u64(t[key], hash_fn).astype(np.float64)
        with np.errstate(divide="ignore", invalid="ignore"):
            wk = np.log((h + 0.5) / mod) / w
        wk = np.where(w > 0, wk, -np.inf)
        keep = np.flatnonzero(wk > -np.inf)
        if keep.size > k:
            # keep every row whose key TIES the k-th value (uint64->float64
            # hash conversion can collapse keys): the global (wk DESC, key
            # ASC) sort+limit breaks the tie deterministically — an
            # argpartition cut alone could keep the wrong tied row
            kth = np.partition(wk[keep], keep.size - k)[keep.size - k]
            keep = keep[wk[keep] >= kth]
        out = t.take(pa.array(keep))
        return out.append_column("__wkey", pa.array(wk[keep]))

    pre = ds.map_batches(local, batch_format="pyarrow", zero_copy_batch=True)
    top = pre.sort(["__wkey", key], descending=[True, False]).limit(k)
    return top.drop_columns(["__wkey"])


def weighted_sample_sql(table: str, k: int, key: str, weight_col: str,
                        cols: str = "*") -> str:
    """DuckDB twin of weighted_sample(hash_fn='splitmix64')."""
    h = splitmix64_sql(key)
    return (
        f"SELECT {cols} FROM ("
        f"SELECT *, ln((CAST({h} AS DOUBLE) + 0.5) / 18446744073709551616.0)"
        f" / {weight_col} AS wk FROM {table} WHERE {weight_col} > 0 "
        f"ORDER BY wk DESC, {key} LIMIT {k})")


def grouped_corr(ds, key, x: str, y: str, round_digits: int = 6):
    """Per-group Pearson correlation + population covariance (SQL
    CORR / COVAR_POP / the two variances).

    Shape: per-batch moment partials (n, Σx, Σy, Σx², Σy², Σxy — ONE
    Arrow group_by per batch, at most |groups| rows each) -> one tiny
    groupby-sum exchange -> vectorized finish. The input columns never
    shuffle. Partial sums accumulate in longdouble inside each batch.
    The raw-moment form loses ~2 digits to cancellation when
    |mean| >> stddev, so both columns are pre-centered by a GLOBAL
    shift estimated from the first ~8k rows (one bounded driver-side
    peek; corr and covariance are exactly shift-invariant, so any
    shift — even a poor estimate — only helps conditioning; ADVICE
    r4). Wide-magnitude columns like epoch-microsecond timestamps are
    therefore safe without caller-side centering."""
    import math

    from ray.data.aggregate import Sum

    keys = [key] if isinstance(key, str) else list(key)

    peek = ds.limit(8192).select_columns([x, y]).to_pandas()
    shift_x = float(peek[x].mean()) if len(peek) else 0.0
    shift_y = float(peek[y].mean()) if len(peek) else 0.0
    if not math.isfinite(shift_x):
        shift_x = 0.0
    if not math.isfinite(shift_y):
        shift_y = 0.0

    def partial(t: pa.Table) -> pa.Table:
        xv = t[x].to_numpy(zero_copy_only=False).astype(np.longdouble) - shift_x
        yv = t[y].to_numpy(zero_copy_only=False).astype(np.longdouble) - shift_y
        g = pa.table({
            **{k: t[k] for k in keys},
            "_n": pa.array(np.ones(len(xv), np.int64)),
            "_sx": pa.array(xv.astype(np.float64)),
            "_sy": pa.array(yv.astype(np.float64)),
            "_sxx": pa.array((xv * xv).astype(np.float64)),
            "_syy": pa.array((yv * yv).astype(np.float64)),
            "_sxy": pa.array((xv * yv).astype(np.float64)),
        })
        return g.group_by(keys).aggregate(
            [("_n", "sum"), ("_sx", "sum"), ("_sy", "sum"), ("_sxx", "sum"),
             ("_syy", "sum"), ("_sxy", "sum")])

    pre = ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
    agg = pre.groupby(keys).aggregate(
        Sum("_n_sum", alias_name="n"), Sum("_sx_sum", alias_name="sx"),
        Sum("_sy_sum", alias_name="sy"), Sum("_sxx_sum", alias_name="sxx"),
        Sum("_syy_sum", alias_name="syy"), Sum("_sxy_sum", alias_name="sxy"))

    def finish(t: pa.Table) -> pa.Table:
        n = t["n"].to_numpy(zero_copy_only=False).astype(np.float64)
        sx = t["sx"].to_numpy(zero_copy_only=False)
        sy = t["sy"].to_numpy(zero_copy_only=False)
        cov = t["sxy"].to_numpy(zero_copy_only=False) / n - (sx / n) * (sy / n)
        vx = t["sxx"].to_numpy(zero_copy_only=False) / n - (sx / n) ** 2
        vy = t["syy"].to_numpy(zero_copy_only=False) / n - (sy / n) ** 2
        denom = np.sqrt(np.maximum(vx, 0.0) * np.maximum(vy, 0.0))
        with np.errstate(invalid="ignore", divide="ignore"):
            corr = np.where(denom > 0, cov / denom, np.nan)
        from engine.queries import sql_round

        out = {k: t[k] for k in keys}
        out["n"] = pa.array(t["n"].to_numpy(zero_copy_only=False))
        out["covar_pop"] = pa.array(sql_round(cov, round_digits))
        out["corr"] = pa.array(sql_round(corr, round_digits))
        return pa.table(out)

    return agg.map_batches(finish, batch_format="pyarrow", zero_copy_batch=True)


def union_by_name(*datasets):
    """Schema-evolving UNION ALL BY NAME: rows of every input, columns
    matched by NAME; columns absent from an input come back as typed
    nulls (the lakehouse append path where newer shards gained columns).

    The unified Arrow schema (pa.unify_schemas with type promotion) is
    computed once driver-side from the inputs' schemas — metadata only;
    each input then gets ONE map stage that pads missing columns with
    nulls, casts, and aligns column order, so the union itself is the
    ordinary zero-movement Ray union of schema-identical streams."""
    from engine.ops.util import arrow_schema

    schemas = [arrow_schema(ds) for ds in datasets]
    unified = pa.unify_schemas(schemas, promote_options="permissive")
    names = unified.names

    def aligner(have: frozenset):
        def align(t: pa.Table) -> pa.Table:
            cols = []
            for n in names:
                f = unified.field(n)
                if n in have:
                    c = t[n]
                    cols.append(c.cast(f.type) if c.type != f.type else c)
                else:
                    cols.append(pa.nulls(t.num_rows, f.type))
            return pa.Table.from_arrays(
                [c.combine_chunks() if isinstance(c, pa.ChunkedArray) else c
                 for c in cols], names=names)
        return align

    aligned = [
        ds.map_batches(aligner(frozenset(s.names)), batch_format="pyarrow",
                       zero_copy_batch=True)
        for ds, s in zip(datasets, schemas)
    ]
    out = aligned[0]
    for ds in aligned[1:]:
        out = out.union(ds)
    return out


def grouped_string_agg(ds, key: str, col: str, sep: str = ",",
                       order_by: str = "ts", tie_break: str | None = None,
                       out_name: str = "agg", num_partitions: int | None = None):
    """SQL ``string_agg(col, sep ORDER BY order_by, tie_break)`` per key
    — the user-journey / event-path feature (one ordered string per
    entity).

    One entity-hash exchange (the shared window-partition machinery);
    within each partition the whole thing is vectorized: one
    (key, order_by, tie) sort, entity boundaries from the sorted codes,
    then ONE ``pc.binary_join_element_wise``-free list build +
    ``pc.binary_join`` kernel call over a ListArray sliced at the
    boundaries — no per-group Python join, no per-group task."""
    import pyarrow.compute as pc

    from engine.ops.window import _partitioned, _strip
    from engine.ops.wkernel import entity_sort, segments

    def fn(t: pa.Table) -> pa.Table:
        t = _strip(t)
        if t.num_rows == 0:
            ktype = t.schema.field(key).type if key in t.schema.names else pa.int64()
            return pa.table({key: pa.chunked_array([], type=ktype),
                             out_name: pa.chunked_array([], type=pa.string())})
        t, _codes, _tsv, change = entity_sort(t, key, order_by, tie_break)
        starts, ends, _seg_id, _pos = segments(change)
        vals = t[col]
        if isinstance(vals, pa.ChunkedArray):
            vals = vals.combine_chunks()
        offs = np.concatenate([starts, [t.num_rows]]).astype(np.int32)
        lst = pa.ListArray.from_arrays(pa.array(offs, pa.int32()), vals)
        joined = pc.binary_join(lst, sep)
        return pa.table({key: t[key].take(pa.array(starts)),
                         out_name: joined.cast(pa.string())})

    return _partitioned(ds, key, num_partitions).map_groups(fn, batch_format="pyarrow")
