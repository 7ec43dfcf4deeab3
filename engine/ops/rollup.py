"""ROLLUP / grouping-sets aggregation and fixed-width histograms
(SURVEY.md §2.5 A1 extension — the OLAP subtotal algebra).

Scale shape: only the FINEST level aggregates the input (one exchange of
pre-combined partials — Ray's groupby does partial+final internally).
Every coarser level re-aggregates the PREVIOUS level's result, which is
|distinct key combos| rows, not |input| rows — the standard rollup
optimization (no re-scan per level). The grand-total level is a tree
aggregate with no shuffle at all.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def rollup(ds, keys: list[str], value: str,
           sum_name: str = "sum_value", cnt_name: str = "n"):
    """GROUP BY ROLLUP(keys...) with SUM(value) and COUNT(*).

    Emits one row per grouping set: (k1..kn), (k1..kn-1, NULL), ...,
    (NULL..NULL) — rolled-up key columns are real Arrow nulls, matching
    SQL ROLLUP output. Sums are raw float64 (caller rounds for oracle
    comparison); counts are int64."""
    from ray.data.aggregate import Count, Sum

    from engine.ops.util import arrow_schema

    sch = arrow_schema(ds)
    ktypes = {k: sch.field(k).type for k in keys}

    level = ds.groupby(keys).aggregate(Sum(value, alias_name=sum_name),
                                       Count(alias_name=cnt_name))
    subsets = [keys[:i] for i in range(len(keys) - 1, 0, -1)]
    small = _levels_driver_side(level, subsets, ktypes, keys, sum_name, cnt_name,
                                chained=True)
    if small is not None:
        return small
    parts = [level]
    for i in range(len(keys) - 1, 0, -1):
        # re-aggregate the previous (already tiny) level, not the input
        level = level.groupby(keys[:i]).aggregate(
            Sum(sum_name, alias_name=sum_name), Sum(cnt_name, alias_name=cnt_name))
        parts.append(_null_pad(level, ktypes, keys[i:]))
    total = level.aggregate(Sum(sum_name, alias_name=sum_name),
                            Sum(cnt_name, alias_name=cnt_name))
    parts.append(_total_row(total, ktypes, keys, sum_name, cnt_name))
    res = parts[0]
    for part in parts[1:]:
        res = res.union(part)
    return res


# Below this many finest-level rows the subtotal levels are computed on
# the DRIVER from one materialized Arrow table instead of 2^n / n tiny
# Ray groupbys: each tiny exchange costs fixed aggregator-pool setup
# (~0.5-1 s wall at 32 CPUs) that dwarfs the microseconds of actual
# aggregation (VERDICT r4: cube_daily_type 6.9 s was ALL fixed overhead).
# At 100 TB only the finest exchange scales with data; a finest level
# wider than this threshold keeps the fully distributed chain.
SMALL_LEVEL_ROWS = 200_000


def _levels_driver_side(finest, subsets, ktypes, keys, sum_name, cnt_name,
                        chained: bool):
    """If the materialized finest level is small, build every subtotal
    level + grand total with pandas on the driver and return ONE
    Dataset; else return None (caller runs the distributed chain).
    `chained`: rollup semantics derive each level from the previous —
    numerically identical here since sums re-aggregate either way."""
    import pandas as pd
    import ray.data as rd

    finest = finest.materialize()
    if finest.count() > SMALL_LEVEL_ROWS:
        return None
    base = finest.to_pandas()
    val_cols = [sum_name, cnt_name]
    out = [base[keys + val_cols]]
    for subset in subsets:
        g = (base.groupby(list(subset), dropna=False, as_index=False)[val_cols]
             .sum())
        for k in keys:
            if k not in subset:
                g[k] = None
        out.append(g[keys + val_cols])
    total = pd.DataFrame({sum_name: [float(base[sum_name].sum())],
                          cnt_name: [int(base[cnt_name].sum())]})
    for k in keys:
        total[k] = None
    out.append(total[keys + val_cols])
    fields = [pa.field(k, ktypes[k]) for k in keys]
    fields += [pa.field(sum_name, pa.float64()), pa.field(cnt_name, pa.int64())]
    schema = pa.schema(fields)
    # per-part Arrow conversion (not one pandas concat): the explicit
    # schema makes None-keyed subtotal parts typed nulls directly
    tbl = pa.concat_tables(
        pa.Table.from_pandas(part, schema=schema, preserve_index=False)
        for part in out)
    return rd.from_arrow(tbl)


def _null_pad(level, ktypes: dict, absent: list[str]):
    """Append typed null columns for rolled-up keys so every level unions
    into one schema."""
    absent_types = [(name, ktypes[name]) for name in absent]

    def pad(t: pa.Table) -> pa.Table:
        for name, typ in absent_types:
            t = t.append_column(name, pa.nulls(len(t), typ))
        return t

    return level.map_batches(pad, batch_format="pyarrow", zero_copy_batch=True)


def _total_row(total: dict | None, ktypes: dict, keys: list[str],
               sum_name: str, cnt_name: str):
    import ray.data as rd

    total = total or {sum_name: 0.0, cnt_name: 0}
    cols = {k: pa.nulls(1, ktypes[k]) for k in keys}
    cols[sum_name] = pa.array([float(total[sum_name])], pa.float64())
    cols[cnt_name] = pa.array([int(total[cnt_name])], pa.int64())
    return rd.from_arrow(pa.table(cols))


def cube(ds, keys: list[str], value: str,
         sum_name: str = "sum_value", cnt_name: str = "n"):
    """GROUP BY CUBE(keys...) with SUM(value) and COUNT(*).

    One row per grouping set over EVERY subset of keys (2^n sets).
    Scale shape mirrors rollup(): only the finest level touches the
    input (one partial+final exchange); every other subset re-aggregates
    the finest level's result — |distinct key combos| rows, not |input|
    rows. Unlike rollup the subsets don't chain (e.g. (b) is not
    derivable from (a)), so each re-groups the finest level directly;
    with n <= 4 keys that is <= 15 aggregations over a tiny table."""
    from itertools import combinations

    from ray.data.aggregate import Count, Sum

    from engine.ops.util import arrow_schema

    if len(keys) > 4:
        raise ValueError("cube: > 4 keys means 2^n grouping sets — pick fewer")
    sch = arrow_schema(ds)
    ktypes = {k: sch.field(k).type for k in keys}

    finest = ds.groupby(keys).aggregate(Sum(value, alias_name=sum_name),
                                        Count(alias_name=cnt_name))
    subsets = [list(s) for r in range(len(keys) - 1, 0, -1)
               for s in combinations(keys, r)]
    small = _levels_driver_side(finest, subsets, ktypes, keys, sum_name, cnt_name,
                                chained=False)
    if small is not None:
        return small
    parts = [finest]
    for r in range(len(keys) - 1, 0, -1):
        for subset in combinations(keys, r):
            lv = finest.groupby(list(subset)).aggregate(
                Sum(sum_name, alias_name=sum_name), Sum(cnt_name, alias_name=cnt_name))
            parts.append(_null_pad(lv, ktypes, [k for k in keys if k not in subset]))
    total = finest.aggregate(Sum(sum_name, alias_name=sum_name),
                             Sum(cnt_name, alias_name=cnt_name))
    parts.append(_total_row(total, ktypes, keys, sum_name, cnt_name))
    res = parts[0]
    for part in parts[1:]:
        res = res.union(part)
    return res


# ------------------------------------------------------------ histogram --

def histogram(ds, col: str, lo: float, hi: float, nbins: int,
              bin_name: str = "bin", cnt_name: str = "cnt"):
    """Fixed-width histogram: bin = clamp(floor((v - lo)/w), 0, nbins-1).

    One map pass emits per-batch (bin, partial count) rows — at most
    nbins per batch — then a tiny groupby-sum combines them. The input
    column never shuffles. Value-exact vs the same FLOOR/LEAST/GREATEST
    arithmetic in SQL (identical float64 division both sides)."""
    from ray.data.aggregate import Sum

    w = (float(hi) - float(lo)) / nbins

    def local(t: pa.Table) -> pa.Table:
        c = t[col].combine_chunks() if isinstance(t[col], pa.ChunkedArray) else t[col]
        v = c.drop_null().to_numpy(zero_copy_only=False).astype(np.float64)
        if len(v) == 0:
            return pa.table({bin_name: pa.array([], pa.int64()),
                             cnt_name: pa.array([], pa.int64())})
        b = np.clip(np.floor((v - lo) / w), 0, nbins - 1).astype(np.int64)
        bc = np.bincount(b, minlength=nbins)
        nz = np.nonzero(bc)[0]
        return pa.table({bin_name: pa.array(nz, pa.int64()),
                         cnt_name: pa.array(bc[nz], pa.int64())})

    pre = ds.map_batches(local, batch_format="pyarrow", zero_copy_batch=True)
    return pre.groupby(bin_name).aggregate(Sum(cnt_name, alias_name=cnt_name))


def histogram_sql(table: str, col: str, lo: float, hi: float, nbins: int,
                  bin_name: str = "bin", cnt_name: str = "cnt") -> str:
    """DuckDB twin of histogram() — identical float64 bin arithmetic."""
    w = (float(hi) - float(lo)) / nbins
    return f"""
        SELECT LEAST(GREATEST(CAST(FLOOR(({col} - {lo!r}) / {w!r}) AS BIGINT), 0),
                     {nbins - 1}) AS {bin_name},
               COUNT(*) AS {cnt_name}
        FROM {table} WHERE {col} IS NOT NULL GROUP BY 1"""
