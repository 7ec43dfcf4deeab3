"""Driver-contract query catalog (SURVEY.md §5.3).

One entry per implemented operator family: QUERIES maps name -> callable
(sf_dir) -> Dataset / DataFrame / Table; ORACLE_SQL maps the same name to
the equivalent DuckDB SQL over the pre-registered testdata views. Names
of computed columns MATCH between both sides (driver hashes values after
sorting columns by name).

Float discipline: any aggregate produced by a nondeterministic-order
distributed sum is rounded on BOTH sides (sql_round mirrors DuckDB's
half-away-from-zero double rounding) so the driver's exact value-hash
comparison is stable. Pass-through values (as-of matches, lag/lead) are
bit-exact and not rounded.

Entries with no ORACLE_SQL (minhash/simhash/ann/langid/image flagship)
are checked rows-only by the driver and by in-repo pytest oracles.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc


def sql_round(x, d: int):
    """DuckDB-compatible ROUND(double, d): half away from zero."""
    m = 10.0 ** d
    arr = np.asarray(x, dtype=np.float64)
    return np.where(np.isnan(arr), arr, np.trunc(np.abs(arr) * m + 0.5) / m * np.where(arr < 0, -1.0, 1.0))


_READ_CACHE: dict = {}


def _read(sf_dir: str, name: str, columns=None):
    """Per-process cache of the LAZY read plan keyed by (dir, table,
    columns): Datasets are immutable logical plans, so reuse across
    queries is safe and skips the repeated parquet-metadata fetch the
    70-query driver contract otherwise pays per query."""
    import ray.data as rd

    key = (sf_dir, name, tuple(columns) if columns else None)
    ds = _READ_CACHE.get(key)
    if ds is None:
        import os

        # Small files get a size-derived block count instead of Ray's
        # 2xCPU default split: at 32 CPUs a 200 KB table becomes a
        # 64-task read whose scheduling costs ~0.4 s PER QUERY (measured:
        # trivial filter 0.48 s default vs 0.06 s at 1 block — x101
        # contract queries is most of the driver's wall budget). Large
        # inputs keep Ray's own sizing (~128 MB target blocks), which is
        # the correct 100 TB behavior — this override only ever REDUCES
        # task count for inputs that fit a few blocks anyway.
        path = f"{sf_dir}/{name}.parquet"
        nbytes = os.path.getsize(path)
        kw = {}
        if nbytes < (64 << 20):
            blocks = max(1, nbytes // (4 << 20))
            if name == "documents":
                # text analytics are compute-heavy PER ROW (shingle
                # explode, signatures, regex passes) while the file is
                # byte-small — a 1-block read serializes the whole fused
                # read->explode stage (measured: ngram_jaccard at sf0.1
                # 10.9 s -> 142 s). Floor the block count at ~64 rows
                # per block from the parquet footer (one cheap metadata
                # read; plan is cached per session).
                import pyarrow.parquet as pq

                rows = pq.ParquetFile(path).metadata.num_rows
                blocks = max(blocks, rows // 64)
            kw["override_num_blocks"] = blocks
        ds = rd.read_parquet(path, columns=columns, **kw).map_batches(
            lambda t: t.replace_schema_metadata(None),
            batch_format="pyarrow", zero_copy_batch=True)
        # the appended map_batches makes ds.input_files() return [] (Ray
        # only resolves it on read ops), which silently zeroed the
        # data-size-aware partition sizing (join_partitions fell back to
        # 2x CPUs -> a 64-aggregator-actor storm on a 3MB join; measured
        # join_orders_customer 3.1s -> 13-16s at 32 CPUs). Tag the source
        # explicitly; engine.ops.partitioning reads the tag first.
        ds._graft_input_files = [f"{sf_dir}/{name}.parquet"]
        _READ_CACHE[key] = ds
    return ds


def _keep_tag(out, *parents):
    """Propagate the `_graft_input_files` sizing tag across a transform:
    transforms return new Dataset objects, so a filtered/mapped read loses
    the tag (and ds.input_files() is [] past any map op) — a join on the
    result would then fall back to the unknown-size 2x-CPU partition
    count. Source bytes over-estimate a filtered child, which errs toward
    a few more partitions — harmless next to the fallback storm."""
    files = [f for p in parents for f in getattr(p, "_graft_input_files", [])]
    if files:
        out._graft_input_files = files
    return out


def _filter_type(ds, et: str):
    return _keep_tag(
        ds.map_batches(lambda t: t.filter(pc.equal(t["event_type"], et)), batch_format="pyarrow"), ds)


# ------------------------------------------------------- as-of / windows --

def q_asof_join(sf_dir):
    from engine.ops.asof import asof_join

    ev = _read(sf_dir, "events", columns=["event_id", "ts", "user_id", "event_type", "value"])
    out = asof_join(_filter_type(ev, "view"), _filter_type(ev, "purchase"),
                    on="user_id", right_cols=["value"])
    return out.select_columns(["event_id", "user_id", "ts", "ts_r", "value_r"])


def q_asof_strict(sf_dir):
    from engine.ops.asof import asof_join

    ev = _read(sf_dir, "events", columns=["event_id", "ts", "user_id", "event_type", "value"])
    out = asof_join(_filter_type(ev, "view"), _filter_type(ev, "purchase"),
                    on="user_id", right_cols=["value"], strict=True)
    return out.select_columns(["event_id", "ts_r", "value_r"])


def q_asof_tolerance(sf_dir):
    from engine.ops.asof import asof_join

    ev = _read(sf_dir, "events", columns=["event_id", "ts", "user_id", "event_type", "value"])
    out = asof_join(_filter_type(ev, "view"), _filter_type(ev, "purchase"),
                    on="user_id", right_cols=["value"], tolerance_us=3_600_000_000)
    return out.select_columns(["event_id", "ts_r", "value_r"])


def q_asof_forward(sf_dir):
    """Forward as-of: smallest purchase ts >= view ts per user (the
    next-event join). Value-exact vs DuckDB ASOF with l.ts <= r.ts."""
    from engine.ops.asof import asof_join

    ev = _read(sf_dir, "events", columns=["event_id", "ts", "user_id", "event_type", "value"])
    out = asof_join(_filter_type(ev, "view"), _filter_type(ev, "purchase"),
                    on="user_id", right_cols=["value"], direction="forward")
    return out.select_columns(["event_id", "ts_r", "value_r"])


def q_asof_nearest(sf_dir):
    """Nearest as-of: the closer of the backward/forward purchase per
    view (tie -> backward). Composed in SQL from two ASOF joins."""
    from engine.ops.asof import asof_join

    ev = _read(sf_dir, "events", columns=["event_id", "ts", "user_id", "event_type", "value"])
    out = asof_join(_filter_type(ev, "view"), _filter_type(ev, "purchase"),
                    on="user_id", right_cols=["value"], direction="nearest")
    return out.select_columns(["event_id", "ts_r", "value_r"])


def q_asof_broadcast(sf_dir):
    """Zero-shuffle as-of: small right side broadcast via ray.put, same
    semantics (and oracle) as asof_join."""
    from engine.ops.asof import asof_join_broadcast

    ev = _read(sf_dir, "events", columns=["event_id", "ts", "user_id", "event_type", "value"])
    purchases = _filter_type(ev, "purchase").select_columns(["user_id", "ts", "value"])
    out = asof_join_broadcast(_filter_type(ev, "view"), purchases,
                              on="user_id", right_cols=["value"])
    return out.select_columns(["event_id", "user_id", "ts", "ts_r", "value_r"])


def q_range_join(sf_dir):
    """All purchases within the 24h BEFORE each view (inner interval join)."""
    from engine.ops.rangejoin import range_join

    ev = _read(sf_dir, "events", columns=["event_id", "ts", "user_id", "event_type", "value"])
    out = range_join(_filter_type(ev, "view"), _filter_type(ev, "purchase"),
                     on="user_id", lo_us=24 * 3600 * 1_000_000, hi_us=0,
                     right_cols=["value"])
    return out.select_columns(["event_id", "ts_r", "value_r"])


def q_lag_lead(sf_dir):
    from engine.ops.window import with_lag_lead

    ev = _read(sf_dir, "events", columns=["event_id", "ts", "user_id", "value"])
    out = with_lag_lead(ev, entity="user_id", cols=["value"], lags=[1, 2], leads=[1],
                        tie_break="event_id")
    return out.select_columns(["event_id", "lag1_value", "lag2_value", "lead1_value"])


def q_ewma(sf_dir):
    """Time-decayed EWMA of value per user (6h half-life). Value-exact
    vs the closed-form SQL twin sum(v*2^dh)/sum(2^dh) over the entity
    prefix with dh = (ts - min(ts) per entity)/halflife (the engine's
    renormalized prefix-sum kernel equals it to float64 rounding —
    round(4) on both sides — measured max |engine-SQL| 5e-10, no
    value within 4x of a 1e-4 rounding boundary; sequential-recurrence parity in
    tests/test_window.py)."""
    from engine.ops.window import ewma

    ev = _read(sf_dir, "events", columns=["event_id", "ts", "user_id", "value"])
    out = ewma(ev, entity="user_id", cols=["value"],
               halflife_us=6 * 3600 * 1_000_000, tie_break="event_id")
    out = out.select_columns(["event_id", "ewma_value"]).to_pandas()
    out["ewma_value"] = sql_round(out["ewma_value"], 4)
    return out


def q_first_last(sf_dir):
    """FIRST/LAST/NTH_VALUE(value, 2) per user over the full entity
    timeline (unbounded frame). Values are picked, not computed, so the
    oracle comparison is bit-exact — no rounding."""
    from engine.ops.window import with_first_last

    ev = _read(sf_dir, "events", columns=["event_id", "ts", "user_id", "value"])
    out = with_first_last(ev, entity="user_id", cols=["value"], nth=[2],
                          tie_break="event_id")
    return out.select_columns(["event_id", "first_value", "last_value", "nth2_value"])


def q_event_ranks(sf_dir):
    from engine.ops.window import with_row_number

    ev = _read(sf_dir, "events", columns=["event_id", "user_id", "ts"])
    out = with_row_number(ev, entity="user_id", ts="ts", tie_break="event_id")
    return out.select_columns(["event_id", "rn"])


def q_event_rank_stats(sf_dir):
    """RANK / DENSE_RANK / NTILE(4) per user over a coarsened value
    (floor(value) — real ties, so the three functions genuinely differ).
    Value-exact vs the DuckDB window functions."""
    import pyarrow.compute as pc

    from engine.ops.window import with_ranks

    ev = _read(sf_dir, "events", columns=["event_id", "user_id", "value"])
    ev = ev.map_batches(
        lambda t: t.append_column("coarse", pc.cast(pc.floor(t["value"]), pa.int64())),
        batch_format="pyarrow", zero_copy_batch=True)
    out = with_ranks(ev, entity="user_id", order_col="coarse",
                     tie_break="event_id", ntile=4, ntile_col="nt4", pct_cols=True)
    return out.select_columns(["event_id", "user_id", "coarse", "rnk", "drnk", "nt4",
                               "pct_rank", "cume_dist"])


def q_rolling_24h(sf_dir):
    from engine.ops.window import rolling

    ev = _read(sf_dir, "events", columns=["event_id", "ts", "user_id", "value"])
    out = rolling(ev, entity="user_id", cols=["value"], window_us=24 * 3600 * 1_000_000,
                  aggs=["count", "sum", "mean", "min", "max"]).to_pandas()
    return pd.DataFrame({
        "event_id": out["event_id"],
        "roll_count_value": out["roll_count_value"].astype("int64"),
        "roll_sum_value": sql_round(out["roll_sum_value"], 6),
        "roll_mean_value": sql_round(out["roll_mean_value"], 6),
        "roll_min_value": out["roll_min_value"],
        "roll_max_value": out["roll_max_value"],
    })


def q_expanding(sf_dir):
    from engine.ops.window import expanding

    ev = _read(sf_dir, "events", columns=["event_id", "ts", "user_id", "value"])
    out = expanding(ev, entity="user_id", cols=["value"], aggs=["count", "sum", "min", "max"],
                    tie_break="event_id").to_pandas()
    return pd.DataFrame({
        "event_id": out["event_id"],
        "cum_count_value": out["cum_count_value"].astype("int64"),
        "cum_sum_value": sql_round(out["cum_sum_value"], 6),
        "cum_min_value": out["cum_min_value"],
        "cum_max_value": out["cum_max_value"],
    })


def q_hopping_6h(sf_dir):
    """24h windows hopping every 6h per user (each event in 4 windows) —
    same single entity exchange as tumbling: the k overlapping window
    families run as k disjoint offset-tumbling run-reductions per sorted
    partition, so rows are never replicated through the shuffle.
    Value-exact vs the DuckDB cross-join-range twin."""
    from engine.ops.window import hopping

    ev = _read(sf_dir, "events", columns=["ts", "user_id", "value"])
    out = hopping(ev, entity="user_id", width_us=86_400_000_000,
                  hop_us=21_600_000_000).to_pandas()
    out["sum_value"] = sql_round(out["sum_value"], 6)
    return out[["user_id", "window_start", "n_events", "sum_value"]]


def q_tumbling_daily(sf_dir):
    from engine.ops.window import tumbling

    ev = _read(sf_dir, "events", columns=["ts", "user_id", "value"])
    out = tumbling(ev, entity="user_id", width_us=86_400_000_000).to_pandas()
    out["sum_value"] = sql_round(out["sum_value"], 6)
    return out[["user_id", "window_start", "n_events", "sum_value", "min_value", "max_value"]]


def q_tumbling_median(sf_dir):
    """Per-(user, day) exact median + p90 — the windowed-quantile
    composition: a map-only tumbling window key feeds the grouped exact
    quantile op (one shuffle, vectorized np.quantile per group ==
    quantile_cont). Value-exact."""
    from engine.ops.agg import grouped_quantiles

    ev = _read(sf_dir, "events", columns=["ts", "user_id", "value"])

    def keyed(t: pa.Table) -> pa.Table:
        us = pc.cast(t["ts"], pa.int64())
        start = pc.multiply(pc.divide(us, 86_400_000_000), 86_400_000_000)
        return pa.table({
            "user_id": t["user_id"],
            "window_start": pc.cast(start, pa.timestamp("us")),
            "value": t["value"],
        })

    win = _keep_tag(ev.map_batches(keyed, batch_format="pyarrow",
                                   zero_copy_batch=True), ev)
    return grouped_quantiles(win, ["user_id", "window_start"], "value",
                             qs=(0.5, 0.9), round_digits=6)


def q_sessionize(sf_dir):
    from engine.ops.session import sessionize

    ev = _read(sf_dir, "events", columns=["event_id", "ts", "user_id", "value"])
    out = sessionize(ev, entity="user_id", gap_us=4 * 3600 * 1_000_000, value_col="value",
                     tie_break="event_id").to_pandas()
    out["sum_value"] = sql_round(out["sum_value"], 6)
    return out[["user_id", "session_idx", "start_ts", "end_ts", "n_events", "sum_value"]]


def q_backfill_daily(sf_dir):
    from engine.ops.backfill import backfill
    from engine.ops.dedup import exact_dedup

    ev = _read(sf_dir, "events", columns=["ts", "user_id", "value"])

    def day_grid(t: pa.Table) -> pa.Table:
        return pa.table({
            "user_id": t["user_id"],
            "ts": pc.floor_temporal(t["ts"], unit="day"),
        })

    grid = exact_dedup(ev.map_batches(day_grid, batch_format="pyarrow"), keys=["user_id", "ts"])
    out = backfill(grid, ev.select_columns(["user_id", "ts", "value"]), on="user_id",
                   feature_cols=["value"])
    return out.select_columns(["user_id", "ts", "ts_r", "value_r"])


# ------------------------------------------------------------- tpch-ish --

def q1_pricing_summary(sf_dir):
    from ray.data.aggregate import Count, Mean, Sum

    li = _read(sf_dir, "lineitem",
               columns=["l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice",
                        "l_discount", "l_shipdate"])

    def prep(t: pa.Table) -> pa.Table:
        t = t.filter(pc.less_equal(t["l_shipdate"], pa.scalar(pd.Timestamp("1998-09-02"))))
        disc = pc.multiply(t["l_extendedprice"], pc.subtract(pa.scalar(1.0), t["l_discount"]))
        return pa.table({
            "l_returnflag": t["l_returnflag"],
            "l_linestatus": t["l_linestatus"],
            "l_quantity": t["l_quantity"],
            "l_extendedprice": t["l_extendedprice"],
            "disc_price": disc,
        })

    out = (
        li.map_batches(prep, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(["l_returnflag", "l_linestatus"])
        .aggregate(
            Sum("l_quantity", alias_name="sum_qty"),
            Sum("l_extendedprice", alias_name="sum_base_price"),
            Sum("disc_price", alias_name="sum_disc_price"),
            Mean("l_quantity", alias_name="avg_qty"),
            Count(alias_name="count_order"),
        )
        .to_pandas()
    )
    for c, d in [("sum_qty", 2), ("sum_base_price", 2), ("sum_disc_price", 4), ("avg_qty", 4)]:
        out[c] = sql_round(out[c], d)
    return out


def q_topk_orders(sf_dir):
    return (
        _read(sf_dir, "orders", columns=["o_orderkey", "o_totalprice"])
        .sort(["o_totalprice", "o_orderkey"], descending=[True, False])
        .limit(10)
    )


def q_user_event_paths(sf_dir):
    """Per-user ordered event-type path string (string_agg ORDER BY —
    the classic user-journey feature). One entity-hash exchange;
    partition-local everything-vectorized: one sort, boundary segments,
    ONE pc.binary_join kernel over a boundary-sliced ListArray (no
    per-group Python join). Value-exact."""
    from engine.ops.agg import grouped_string_agg

    ev = _read(sf_dir, "events", columns=["event_id", "ts", "user_id", "event_type"])
    return grouped_string_agg(ev, "user_id", "event_type", sep=">",
                              order_by="ts", tie_break="event_id",
                              out_name="path")


def q_asof_multi_horizon(sf_dir):
    """Feature-store multi-lag fetch: for each view event, the latest
    purchase value as-of t AND as-of t-24h, in ONE entity exchange
    (engine/ops/asof.py asof_multi_horizon: map-only probe explode ->
    single asof_join with the pivot fused into its map_groups).
    Value-exact vs two chained DuckDB ASOF joins."""
    from engine.ops.asof import asof_multi_horizon

    ev = _read(sf_dir, "events", columns=["event_id", "ts", "user_id", "event_type", "value"])
    views = _filter_type(ev, "view").select_columns(["event_id", "ts", "user_id"])
    purch = _filter_type(ev, "purchase").select_columns(["ts", "user_id", "value"])
    out = asof_multi_horizon(views, purch, on="user_id", id_col="event_id",
                             horizons={"h0": 0, "h24": 24 * 3600 * 1_000_000})
    return out.select_columns(["event_id", "value_h0", "value_h24"])


def q_union_by_name(sf_dir):
    """Schema-evolving UNION ALL BY NAME: two shards with different
    column sets union into the unified schema, absent columns as typed
    nulls (engine/ops/agg.py union_by_name — one driver-side schema
    unification, one null-pad map per input, zero-movement union)."""
    from engine.ops.agg import union_by_name

    ev = _read(sf_dir, "events", columns=["event_id", "user_id", "event_type", "value"])
    views = _filter_type(ev, "view").select_columns(["event_id", "user_id"])
    buys = _filter_type(ev, "purchase").select_columns(["event_id", "value"])
    return union_by_name(views, buys)


def q_row_index_events(sf_dir):
    """Deterministic global row index (distributed zipWithIndex): sort by
    event_id, append 0-based position. One range-partitioned sort + a
    metadata-only prefix sum (engine/ops/indexing.py). Value-exact vs
    ROW_NUMBER() OVER (ORDER BY event_id) - 1."""
    from engine.ops.indexing import with_row_index

    ev = _read(sf_dir, "events", columns=["event_id", "user_id"])
    out = with_row_index(ev, by="event_id")
    return out.select_columns(["event_id", "idx"])


def q_impute_value(sf_dir):
    """Column-mean missing-value imputation (reference R3 semantics): a
    deterministic null mask (click rows) is filled with the global mean
    of the surviving values — one tree aggregate, one fill_null map,
    nothing row-scaled on the driver (engine/ops/normalize.py). The fill
    value is rounded(6) on both sides so the distributed mean compares
    value-exactly vs the SQL AVG twin."""
    from engine.ops.normalize import impute_mean

    ev = _read(sf_dir, "events", columns=["event_id", "event_type", "value"])

    def mask(t: pa.Table) -> pa.Table:
        keep = pc.not_equal(t["event_type"], "click")
        masked = pc.if_else(keep, t["value"], pa.scalar(None, pa.float64()))
        return pa.table({"event_id": t["event_id"], "value_n": masked})

    masked = _keep_tag(ev.map_batches(mask, batch_format="pyarrow",
                                      zero_copy_batch=True), ev)
    return impute_mean(masked, ["value_n"], round_digits=6)


def q_topk_per_user(sf_dir):
    """Top-2 highest-value events per user (grouped top-k)."""
    from engine.ops.agg import grouped_topk

    ev = _read(sf_dir, "events", columns=["event_id", "user_id", "value"])
    out = grouped_topk(ev, "user_id", "value", k=2, descending=True, tie_break="event_id")
    return out.select_columns(["event_id"])


def q_filter_scan(sf_dir):
    li = _read(sf_dir, "lineitem", columns=["l_orderkey", "l_linenumber", "l_quantity", "l_shipdate"])

    def flt(t: pa.Table) -> pa.Table:
        m = pc.and_(pc.greater(t["l_quantity"], pa.scalar(45.0)),
                    pc.less(t["l_shipdate"], pa.scalar(pd.Timestamp("1998-01-01"))))
        t = t.filter(m)
        return pa.table({"l_orderkey": t["l_orderkey"], "l_linenumber": t["l_linenumber"]})

    return li.map_batches(flt, batch_format="pyarrow", zero_copy_batch=True)


def q_join_orders_customer(sf_dir):
    from ray.data.aggregate import Count, Sum

    from engine.ops.join import equi_join

    orders = _read(sf_dir, "orders", columns=["o_orderkey", "o_custkey", "o_totalprice"])
    cust = _read(sf_dir, "customer", columns=["c_custkey", "c_mktsegment"])
    out = (
        equi_join(orders, cust, on="o_custkey", right_on="c_custkey")
        .groupby("c_mktsegment")
        .aggregate(Count(alias_name="n_orders"), Sum("o_totalprice", alias_name="sum_price"))
        .to_pandas()
    )
    out["sum_price"] = sql_round(out["sum_price"], 2)
    return out


def q_broadcast_nation(sf_dir):
    from ray.data.aggregate import Count, Sum

    from engine.ops.join import broadcast_lookup

    cust = _read(sf_dir, "customer", columns=["c_custkey", "c_nationkey", "c_acctbal"])
    nation = pd.read_parquet(f"{sf_dir}/nation.parquet")
    out = (
        broadcast_lookup(cust, nation, on="c_nationkey", right_on="n_nationkey", cols=["n_name"])
        .groupby("n_name")
        .aggregate(Count(alias_name="n_customers"), Sum("c_acctbal", alias_name="sum_acctbal"))
        .to_pandas()
    )
    out["sum_acctbal"] = sql_round(out["sum_acctbal"], 2)
    return out


def q_semi_customers(sf_dir):
    from engine.ops.join import semi_join

    cust = _read(sf_dir, "customer", columns=["c_custkey", "c_acctbal"])
    orders = _read(sf_dir, "orders", columns=["o_custkey"])
    return semi_join(cust, orders, on="c_custkey", right_on="o_custkey").select_columns(["c_custkey"])


def q_anti_low_value(sf_dir):
    """Customers with no order above 400k (anti join on a filtered right)."""
    from engine.ops.join import anti_join

    cust = _read(sf_dir, "customer", columns=["c_custkey"])
    orders = _read(sf_dir, "orders", columns=["o_custkey", "o_totalprice"])
    big = _keep_tag(orders.map_batches(
        lambda t: t.filter(pc.greater(t["o_totalprice"], pa.scalar(400_000.0))),
        batch_format="pyarrow",
    ), orders)
    out = anti_join(cust, big, on="c_custkey", right_on="o_custkey").to_pandas()
    if "c_custkey" not in out.columns:  # empty anti result loses schema
        out = pd.DataFrame({"c_custkey": pd.Series([], dtype="int64")})
    return out[["c_custkey"]]


def q_asof_windowed(sf_dir):
    """Flagship fused operator: as-of attach + lag/rolling/session in one
    shuffle (engine/pipelines/flagship.py::asof_windowed)."""
    from engine.pipelines.flagship import events_flagship

    out = events_flagship(sf_dir).to_pandas()
    res = pd.DataFrame({
        "event_id": out["event_id"],
        "ts_last_purchase": out["ts_last_purchase"],
        "value_last_purchase": out["value_last_purchase"],
        "lag1_value": out["lag1_value"],
        "roll_count_value": out["roll_count_value"].astype("int64"),
        "roll_sum_value": sql_round(out["roll_sum_value"], 6),
        "session_idx": out["session_idx"].astype("int64"),
    })
    return res


def q_pivot_user_by_type(sf_dir):
    """Wide pivot: per user, sum(value) per event_type column."""
    from engine.ops.agg import pivot

    ev = _read(sf_dir, "events", columns=["user_id", "event_type", "value"])
    out = pivot(ev, index="user_id", column="event_type", value="value",
                categories=["view", "purchase", "click"], agg="sum")

    def rnd(t: pa.Table) -> pa.Table:
        cols = {"user_id": t["user_id"]}
        for c in ["sum_value_view", "sum_value_purchase", "sum_value_click"]:
            cols[c] = pa.array(sql_round(t[c].to_numpy(zero_copy_only=False), 6))
        return pa.table(cols)

    return out.map_batches(rnd, batch_format="pyarrow", zero_copy_batch=True)


def q_quantiles_by_type(sf_dir):
    from engine.ops.agg import grouped_quantiles

    ev = _read(sf_dir, "events", columns=["event_type", "value"])
    return grouped_quantiles(ev, "event_type", "value", qs=(0.25, 0.5, 0.9), round_digits=6)


def q_sample_events(sf_dir):
    from engine.ops.agg import deterministic_sample

    ev = _read(sf_dir, "events", columns=["event_id"])
    return deterministic_sample(ev, "event_id", 0.1)


def q_sample_events_fast(sf_dir):
    """Vectorized splitmix64 sampler — the 100-TB full-scan path (the md5
    variant stays as the portable default; this one is pure numpy)."""
    from engine.ops.agg import deterministic_sample

    ev = _read(sf_dir, "events", columns=["event_id"])
    return deterministic_sample(ev, "event_id", 0.1, hash_fn="splitmix64")


def q_stratified_sample(sf_dir):
    """Per-event-type deterministic sampling (class rebalancing)."""
    from engine.ops.agg import stratified_sample

    ev = _read(sf_dir, "events", columns=["event_id", "event_type"])
    out = stratified_sample(ev, group="event_type", key="event_id",
                            fracs={"view": 0.5, "purchase": 1.0}, default_frac=0.1)
    return out.select_columns(["event_id"])


def q_intersect_buyers_viewers(sf_dir):
    from engine.ops.agg import intersect_keys

    ev = _read(sf_dir, "events", columns=["user_id", "event_type"])
    return intersect_keys(_filter_type(ev, "view"), _filter_type(ev, "purchase"), on="user_id")


def q_except_viewers_only(sf_dir):
    from engine.ops.agg import except_keys

    ev = _read(sf_dir, "events", columns=["user_id", "event_type"])
    out = except_keys(_filter_type(ev, "view"), _filter_type(ev, "purchase"),
                      on="user_id").to_pandas()
    if "user_id" not in out.columns:  # empty anti result loses schema (Ray join quirk)
        out = pd.DataFrame({"user_id": pd.Series([], dtype="int64")})
    return out[["user_id"]]


def q_approx_distinct_users(sf_dir):
    """HLL sketch (p=12, ~1.6% err) — no SQL oracle (approximate);
    pytest asserts the error bound vs exact."""
    from engine.ops.sketch import approx_distinct

    ev = _read(sf_dir, "events", columns=["user_id"])
    return pd.DataFrame({"n_users_approx": [approx_distinct(ev, "user_id")]})


def q_approx_quantiles_by_type(sf_dir):
    """Per-group t-digest quantiles (one exchange of ~KB sketches; the
    value column never shuffles) — the scale path beside the exact
    grouped_quantiles. Rows-only (approximate); pytest asserts <2% rank
    error per group and merge invariance (tests/test_freq.py)."""
    from engine.ops.freq import grouped_approx_quantiles

    ev = _read(sf_dir, "events", columns=["event_type", "value"])
    return grouped_approx_quantiles(ev, "event_type", "value", qs=[0.1, 0.5, 0.99])


def q_approx_distinct_by_type(sf_dir):
    """GROUPED HLL: ~distinct users per event_type in one
    groupby-of-sketches exchange (register arrays max-combine, so the
    estimate is partition-count invariant and deterministic). No SQL
    oracle (approximate); pytest asserts the per-group error bound."""
    from engine.ops.sketch import ApproxDistinct

    ev = _read(sf_dir, "events", columns=["event_type", "user_id"])
    return ev.groupby("event_type").aggregate(
        ApproxDistinct(on="user_id", alias_name="nd_users"))


def q_bloom_anti_join(sf_dir):
    """Customers with no orders via the bloom-prefiltered anti join
    (engine/ops/bloom.py): build-side bitmap tree-aggregate + one probe
    map pass; only the bloom-positive sliver enters the exact exchange.
    Result is EXACT (no false negatives) — value-exact vs NOT EXISTS."""
    from engine.ops.bloom import bloom_anti_join

    cust = _read(sf_dir, "customer", columns=["c_custkey"])
    orders = _read(sf_dir, "orders", columns=["o_custkey", "o_totalprice"])
    big = _keep_tag(orders.map_batches(
        lambda t: t.filter(pc.greater(t["o_totalprice"], pa.scalar(300_000.0))),
        batch_format="pyarrow",
    ), orders).select_columns(["o_custkey"])
    out = bloom_anti_join(cust, big, on="c_custkey", right_on="o_custkey").to_pandas()
    if "c_custkey" not in out.columns:  # empty anti result loses schema
        out = pd.DataFrame({"c_custkey": pd.Series([], dtype="int64")})
    return out[["c_custkey"]]


def q_heavy_hitters(sf_dir):
    """EXACT phi-heavy hitters with no key shuffle: Misra-Gries candidate
    sketch (tree aggregate, guaranteed superset for freq > n/(k+1)) +
    one broadcast exact-count pass + threshold filter. Value-exact vs
    GROUP BY ... HAVING."""
    from engine.ops.freq import heavy_hitters

    ev = _read(sf_dir, "events", columns=["user_id"])
    return heavy_hitters(ev, "user_id", phi=0.0075)


def q_approx_quantiles_value(sf_dir):
    """Merging t-digest (delta=200) over events.value — ONE tree
    aggregate, no sort/shuffle. Approximate (rank err < ~1%): no SQL
    oracle; rows-only driver check + error-bound pytest
    (tests/test_freq.py)."""
    from engine.ops.freq import approx_quantiles

    ev = _read(sf_dir, "events", columns=["value"])
    qs = [0.1, 0.5, 0.9, 0.99]
    est = approx_quantiles(ev, "value", qs)
    return pd.DataFrame({"q": qs, "value_approx": est})


def q_mode_by_user(sf_dir):
    """Most frequent event_type per user (deterministic ties: value
    ASC). Two exchanges but both tiny: groupby(user, type).count shuffles
    pre-combined pairs, then a grouped top-1 over that small table.
    Value-exact vs the ROW_NUMBER SQL form (DuckDB's own mode() breaks
    ties first-seen — unstable — so the oracle spells out the order)."""
    from engine.ops.agg import grouped_mode

    ev = _read(sf_dir, "events", columns=["user_id", "event_type"])
    return grouped_mode(ev, "user_id", "event_type", out="mode_event_type")


def q_grouped_sample_k(sf_dir):
    """Deterministic 3 rows per event_type: smallest splitmix64(event_id)
    per group (content-addressed — partition-invariant), selected by the
    two-level grouped top-k. Value-exact vs the splitmix64_sql twin."""
    from engine.ops.agg import grouped_sample_k

    ev = _read(sf_dir, "events", columns=["event_id", "event_type", "user_id"])
    out = grouped_sample_k(ev, "event_type", key="event_id", k=3)
    return out.select_columns(["event_type", "event_id", "user_id"])


def q_zorder_events(sf_dir):
    """Z-order layout clustering of events on (value, ts): min/max
    bounds tree-aggregate -> Morton key map -> range-partitioned sort.
    Keys are deterministic (content-derived bounds) but the operator is
    a layout transform — rows-only driver check; interleave/pruning
    oracles in tests/test_zorder.py."""
    from engine.ops.zorder import zorder_key

    ev = _read(sf_dir, "events", columns=["event_id", "ts", "value"])

    def to_us(t: pa.Table) -> pa.Table:
        return pa.table({"event_id": t["event_id"], "value": t["value"],
                         "ts_us": pc.cast(t["ts"], pa.int64())})

    tagged = _keep_tag(ev.map_batches(to_us, batch_format="pyarrow"), ev)
    out = zorder_key(tagged, ["value", "ts_us"]).sort("zkey")
    return out.select_columns(["event_id", "zkey"])


def q_distinct_event_types(sf_dir):
    vals = _read(sf_dir, "events", columns=["event_type"]).unique("event_type")
    return pd.DataFrame({"event_type": sorted(vals)})


def q_minmax_by_type(sf_dir):
    from ray.data.aggregate import Count, Max, Min

    return (
        _read(sf_dir, "events", columns=["event_type", "value"])
        .groupby("event_type")
        .aggregate(Count(alias_name="n"), Min("value", alias_name="min_value"),
                   Max("value", alias_name="max_value"))
    )


def q_union_counts(sf_dir):
    ev = _read(sf_dir, "events", columns=["event_type"])
    u = _filter_type(ev, "view").union(_filter_type(ev, "purchase"))
    return pd.DataFrame({"n": [u.count()]})


def q3_shipping_priority(sf_dir):
    """TPC-H Q3 shape: 3-way join, filter both sides, group, top-10."""
    from ray.data.aggregate import Sum

    from engine.ops.join import equi_join

    cust = _read(sf_dir, "customer", columns=["c_custkey", "c_mktsegment"])
    orders = _read(sf_dir, "orders", columns=["o_orderkey", "o_custkey", "o_orderdate"])
    li = _read(sf_dir, "lineitem", columns=["l_orderkey", "l_extendedprice", "l_discount", "l_shipdate"])
    cutoff = pd.Timestamp("1995-03-15")

    bld = _keep_tag(cust.map_batches(lambda t: t.filter(pc.equal(t["c_mktsegment"], "BUILDING")),
                                     batch_format="pyarrow"), cust)
    o = _keep_tag(orders.map_batches(lambda t: t.filter(pc.less(t["o_orderdate"], pa.scalar(cutoff))),
                                     batch_format="pyarrow"), orders)
    l = _keep_tag(li.map_batches(lambda t: t.filter(pc.greater(t["l_shipdate"], pa.scalar(cutoff))),
                                 batch_format="pyarrow"), li)

    def revenue(t: pa.Table) -> pa.Table:
        rev = pc.multiply(t["l_extendedprice"], pc.subtract(pa.scalar(1.0), t["l_discount"]))
        return pa.table({"l_orderkey": t["l_orderkey"], "rev": rev})

    j = _keep_tag(equi_join(o, bld, on="o_custkey", right_on="c_custkey", join_type="left_semi"),
                  o, bld)
    j = equi_join(_keep_tag(l.map_batches(revenue, batch_format="pyarrow"), l), j,
                  on="l_orderkey", right_on="o_orderkey")
    out = (
        j.groupby(["l_orderkey", "o_orderdate"])
        .aggregate(Sum("rev", alias_name="revenue"))
        .sort(["revenue", "l_orderkey"], descending=[True, False])
        .limit(10)
        .to_pandas()
    )
    out["revenue"] = sql_round(out["revenue"], 4)
    return out[["l_orderkey", "o_orderdate", "revenue"]]


def q6_forecast_revenue(sf_dir):
    """TPC-H Q6 shape: filter-scan + global aggregate (per-batch partial
    sums, one tiny final combine)."""
    lo, hi = pd.Timestamp("1996-01-01"), pd.Timestamp("1997-01-01")

    def partial(t: pa.Table) -> pa.Table:
        m = pc.and_(pc.and_(pc.greater_equal(t["l_shipdate"], pa.scalar(lo)),
                            pc.less(t["l_shipdate"], pa.scalar(hi))),
                    pc.and_(pc.and_(pc.greater_equal(t["l_discount"], pa.scalar(0.05)),
                                    pc.less_equal(t["l_discount"], pa.scalar(0.07))),
                            pc.less(t["l_quantity"], pa.scalar(24.0))))
        t = t.filter(m)
        rev = pc.sum(pc.multiply(t["l_extendedprice"], t["l_discount"])).as_py() or 0.0
        return pa.table({"rev": pa.array([rev], type=pa.float64())})

    from ray.data.aggregate import Sum

    total = _read(sf_dir, "lineitem",
                  columns=["l_shipdate", "l_discount", "l_quantity", "l_extendedprice"]) \
        .map_batches(partial, batch_format="pyarrow", zero_copy_batch=True) \
        .aggregate(Sum("rev", alias_name="revenue"))
    return pd.DataFrame({"revenue": sql_round([total["revenue"]], 4)})


# -------------------------------------------------------------- scalars --

def q_json_extract(sf_dir):
    from engine.ops.scalar import json_get_int

    ev = _read(sf_dir, "events", columns=["event_id", "props"])

    def f(t: pa.Table) -> pa.Table:
        return pa.table({"event_id": t["event_id"], "k": json_get_int(t["props"], "k")})

    return ev.map_batches(f, batch_format="pyarrow", zero_copy_batch=True)


def q_daily_counts(sf_dir):
    from ray.data.aggregate import Count

    from engine.ops.scalar import date_trunc_day

    ev = _read(sf_dir, "events", columns=["ts"])

    def f(t: pa.Table) -> pa.Table:
        return pa.table({"day": date_trunc_day(t["ts"])})

    return ev.map_batches(f, batch_format="pyarrow").groupby("day").aggregate(Count(alias_name="n"))


def q_corr_qty_price(sf_dir):
    """CORR / COVAR_POP of (l_quantity, l_extendedprice) per returnflag —
    per-batch moment partials, one tiny exchange, vectorized finish.
    Value-exact vs the DuckDB aggregates (both sides rounded to 6)."""
    from engine.ops.agg import grouped_corr

    li = _read(sf_dir, "lineitem",
               columns=["l_returnflag", "l_quantity", "l_extendedprice"])
    return grouped_corr(li, "l_returnflag", "l_quantity", "l_extendedprice")


def q_skew_join_events(sf_dir):
    """Skew-aware hybrid join: events (user_id is a skewed int key — the
    top users own percent-level shares) x customer on c_custkey. At
    phi=0.005 the hot users route through the broadcast path while the
    tail shuffles — both physical paths run; semantics are the plain
    SQL JOIN. Value-exact."""
    from ray.data.aggregate import Count, Sum

    from engine.ops.join import skew_join

    ev = _read(sf_dir, "events", columns=["user_id", "event_type", "value"])
    cust = _read(sf_dir, "customer", columns=["c_custkey", "c_mktsegment"])
    out = (
        skew_join(ev, cust, on="user_id", right_on="c_custkey", phi=0.005)
        .groupby(["event_type", "c_mktsegment"])
        .aggregate(Count(alias_name="n"), Sum("value", alias_name="sum_value"))
        .to_pandas()
    )
    out["sum_value"] = sql_round(out["sum_value"], 6)
    return out


def q_rollup_daily_type(sf_dir):
    """GROUP BY ROLLUP(day, event_type): finest level aggregates the
    input once; each subtotal level re-aggregates the previous (tiny)
    level — no per-level input re-scan. Value-exact vs DuckDB ROLLUP
    (rolled-up keys are real NULLs on both sides)."""
    from engine.ops.rollup import rollup
    from engine.ops.scalar import date_trunc_day

    ev = _read(sf_dir, "events", columns=["ts", "event_type", "value"])

    def f(t: pa.Table) -> pa.Table:
        return pa.table({"day": date_trunc_day(t["ts"]),
                         "event_type": t["event_type"], "value": t["value"]})

    tagged = _keep_tag(ev.map_batches(f, batch_format="pyarrow"), ev)
    out = rollup(tagged, ["day", "event_type"], "value")

    def rnd(t: pa.Table) -> pa.Table:
        return t.set_column(t.schema.get_field_index("sum_value"), "sum_value",
                            pa.array(sql_round(t["sum_value"].to_numpy(zero_copy_only=False), 6)))

    return out.map_batches(rnd, batch_format="pyarrow")


def q_cube_daily_type(sf_dir):
    """GROUP BY CUBE(day, event_type) — adds the (event_type)-only
    grouping set rollup can't express. Finest level aggregates the input
    once; the three coarser sets re-aggregate that tiny result.
    Value-exact vs DuckDB CUBE."""
    from engine.ops.rollup import cube
    from engine.ops.scalar import date_trunc_day

    ev = _read(sf_dir, "events", columns=["ts", "event_type", "value"])

    def f(t: pa.Table) -> pa.Table:
        return pa.table({"day": date_trunc_day(t["ts"]),
                         "event_type": t["event_type"], "value": t["value"]})

    tagged = _keep_tag(ev.map_batches(f, batch_format="pyarrow"), ev)
    out = cube(tagged, ["day", "event_type"], "value")

    def rnd(t: pa.Table) -> pa.Table:
        return t.set_column(t.schema.get_field_index("sum_value"), "sum_value",
                            pa.array(sql_round(t["sum_value"].to_numpy(zero_copy_only=False), 6)))

    return out.map_batches(rnd, batch_format="pyarrow")


def q_value_histogram(sf_dir):
    """Fixed-width 20-bin histogram of events.value — per-batch bincount
    partials + one tiny groupby-sum; the value column never shuffles.
    Value-exact vs identical FLOOR bin arithmetic in SQL."""
    from engine.ops.rollup import histogram

    ev = _read(sf_dir, "events", columns=["value"])
    return histogram(ev, "value", lo=0.0, hi=200.0, nbins=20)


def q_doc_tokens(sf_dir):
    from engine.ops.scalar import str_token_count

    docs = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def f(t: pa.Table) -> pa.Table:
        return pa.table({"doc_id": t["doc_id"], "n_tokens": str_token_count(t["text"])})

    return docs.map_batches(f, batch_format="pyarrow", zero_copy_batch=True)


# ---------------------------------------------------------------- dedup --

def q_dedup_events(sf_dir):
    from engine.ops.dedup import exact_dedup

    ev = _read(sf_dir, "events", columns=["event_id", "user_id", "event_type", "ts"])
    out = exact_dedup(ev, keys=["user_id", "event_type"], order_by=["ts", "event_id"])
    return out.select_columns(["event_id"])


def q_dedup_text_md5(sf_dir):
    from engine.ops.dedup import content_dedup

    docs = _read(sf_dir, "documents", columns=["doc_id", "text"])
    return content_dedup(docs, "text", order_by="doc_id").select_columns(["doc_id"])


def q_melt_lineitem(sf_dir):
    """UNPIVOT three lineitem measures into (variable, value) rows —
    map-only inverse of pivot. Value-exact vs UNION ALL."""
    from engine.ops.explode import melt

    li = _read(sf_dir, "lineitem",
               columns=["l_orderkey", "l_linenumber", "l_quantity",
                        "l_extendedprice", "l_discount"])
    return melt(li, ["l_orderkey", "l_linenumber"],
                ["l_quantity", "l_extendedprice", "l_discount"])


def q_unnest_embeddings(sf_dir):
    from engine.ops.explode import explode

    emb = _read(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    out = explode(emb, "embedding")

    def rnd(t: pa.Table) -> pa.Table:
        return pa.table({"vec_id": t["vec_id"], "pos": t["pos"],
                         "e": pa.array(sql_round(t["e"].to_numpy(zero_copy_only=False), 6))})

    return out.map_batches(rnd, batch_format="pyarrow", zero_copy_batch=True)


# ----------------------------------------------------------- embeddings --

def q_embedding_l2(sf_dir):
    from engine.ops.scalar import l2norm

    emb = _read(sf_dir, "embeddings", columns=["vec_id", "embedding"])

    def f(t: pa.Table) -> pa.Table:
        return pa.table({"vec_id": t["vec_id"],
                         "l2": pa.array(sql_round(l2norm(t["embedding"]).to_numpy(), 5))})

    return emb.map_batches(f, batch_format="pyarrow", zero_copy_batch=True)


def q_embedding_label_stats(sf_dir):
    from ray.data.aggregate import Count, Sum

    from engine.ops.scalar import l2norm

    emb = _read(sf_dir, "embeddings", columns=["vec_id", "embedding", "label"])

    def f(t: pa.Table) -> pa.Table:
        return pa.table({"label": t["label"], "l2": l2norm(t["embedding"])})

    out = (
        emb.map_batches(f, batch_format="pyarrow")
        .groupby("label")
        .aggregate(Count(alias_name="n"), Sum("l2", alias_name="sum_l2"))
        .to_pandas()
    )
    out["sum_l2"] = sql_round(out["sum_l2"], 4)
    return out


# ----------------------------------------------- SQL oracle definitions --

SESSION_SQL = """
WITH d AS (
  SELECT event_id, user_id, ts, value,
         CASE WHEN ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                   > INTERVAL 4 HOURS THEN 1 ELSE 0 END AS brk
  FROM events),
lab AS (
  SELECT user_id, ts, value,
         CAST(SUM(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
                             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
             AS session_idx
  FROM d)
SELECT user_id, session_idx, MIN(ts) AS start_ts, MAX(ts) AS end_ts,
       COUNT(*) AS n_events, ROUND(SUM(value), 6) AS sum_value
FROM lab GROUP BY user_id, session_idx
"""

ORACLE_SQL = {
    "asof_join": """
        SELECT l.event_id, l.user_id, l.ts, r.ts AS ts_r, r.value AS value_r
        FROM (SELECT * FROM events WHERE event_type='view') l
        ASOF LEFT JOIN (SELECT * FROM events WHERE event_type='purchase') r
          ON l.user_id = r.user_id AND l.ts >= r.ts""",
    "asof_strict": """
        SELECT l.event_id, r.ts AS ts_r, r.value AS value_r
        FROM (SELECT * FROM events WHERE event_type='view') l
        ASOF LEFT JOIN (SELECT * FROM events WHERE event_type='purchase') r
          ON l.user_id = r.user_id AND l.ts > r.ts""",
    "asof_forward": """
        SELECT l.event_id, r.ts AS ts_r, r.value AS value_r
        FROM (SELECT * FROM events WHERE event_type='view') l
        ASOF LEFT JOIN (SELECT * FROM events WHERE event_type='purchase') r
          ON l.user_id = r.user_id AND l.ts <= r.ts""",
    "asof_nearest": """
        WITH l AS (SELECT * FROM events WHERE event_type='view'),
             r AS (SELECT * FROM events WHERE event_type='purchase'),
             b AS (SELECT l.event_id, l.ts AS lts, r.ts AS bts, r.value AS bval
                   FROM l ASOF LEFT JOIN r
                     ON l.user_id = r.user_id AND l.ts >= r.ts),
             f AS (SELECT l.event_id, r.ts AS fts, r.value AS fval
                   FROM l ASOF LEFT JOIN r
                     ON l.user_id = r.user_id AND l.ts <= r.ts)
        SELECT b.event_id,
               CASE WHEN bts IS NOT NULL AND (fts IS NULL OR (lts - bts) <= (fts - lts))
                    THEN bts ELSE fts END AS ts_r,
               CASE WHEN bts IS NOT NULL AND (fts IS NULL OR (lts - bts) <= (fts - lts))
                    THEN bval ELSE fval END AS value_r
        FROM b JOIN f USING (event_id)""",
    "asof_tolerance": """
        WITH j AS (
          SELECT l.event_id, l.ts AS lts, r.ts AS ts_r, r.value AS value_r
          FROM (SELECT * FROM events WHERE event_type='view') l
          ASOF LEFT JOIN (SELECT * FROM events WHERE event_type='purchase') r
            ON l.user_id = r.user_id AND l.ts >= r.ts)
        SELECT event_id,
               CASE WHEN lts - ts_r <= INTERVAL 1 HOUR THEN ts_r END AS ts_r,
               CASE WHEN lts - ts_r <= INTERVAL 1 HOUR THEN value_r END AS value_r
        FROM j""",
    "range_join": """
        SELECT l.event_id, r.ts AS ts_r, r.value AS value_r
        FROM (SELECT * FROM events WHERE event_type='view') l
        JOIN (SELECT * FROM events WHERE event_type='purchase') r
          ON l.user_id = r.user_id
         AND r.ts BETWEEN l.ts - INTERVAL 24 HOURS AND l.ts""",
    "event_ranks": """
        SELECT event_id,
               ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
        FROM events""",
    "ewma_value": """
        WITH e AS (
          SELECT event_id, user_id, value, epoch_us(ts) AS tsu,
                 (CAST(epoch_us(ts) AS DOUBLE)
                  - CAST(min(epoch_us(ts)) OVER (PARTITION BY user_id) AS DOUBLE))
                 / (6.0 * 3600.0 * 1000000.0) AS dh
          FROM events)
        SELECT event_id,
               ROUND(sum(value * pow(2.0, dh)) OVER w
                     / sum(pow(2.0, dh)) OVER w, 4) AS ewma_value
        FROM e
        WINDOW w AS (PARTITION BY user_id ORDER BY tsu, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)""",
    "zorder_events": """
        WITH b AS (
          SELECT CAST(min(value) AS DOUBLE) AS lo_v, CAST(max(value) AS DOUBLE) AS hi_v,
                 CAST(min(epoch_us(ts)) AS DOUBLE) AS lo_t,
                 CAST(max(epoch_us(ts)) AS DOUBLE) AS hi_t
          FROM events),
        q AS (
          SELECT event_id,
                 CAST(least(greatest(floor(((value - lo_v)
                        / greatest(hi_v - lo_v, 1e-300)) * 65535.0), 0), 65535)
                      AS BIGINT) AS qv,
                 CAST(least(greatest(floor(((CAST(epoch_us(ts) AS DOUBLE) - lo_t)
                        / greatest(hi_t - lo_t, 1e-300)) * 65535.0), 0), 65535)
                      AS BIGINT) AS qt
          FROM events, b),
        s1 AS (SELECT event_id, (qv | (qv << 8)) & 16711935 AS v,
                                (qt | (qt << 8)) & 16711935 AS t FROM q),
        s2 AS (SELECT event_id, (v | (v << 4)) & 252645135 AS v,
                                (t | (t << 4)) & 252645135 AS t FROM s1),
        s3 AS (SELECT event_id, (v | (v << 2)) & 858993459 AS v,
                                (t | (t << 2)) & 858993459 AS t FROM s2),
        s4 AS (SELECT event_id, (v | (v << 1)) & 1431655765 AS v,
                                (t | (t << 1)) & 1431655765 AS t FROM s3)
        SELECT event_id, v | (t << 1) AS zkey FROM s4""",
    "event_rank_stats": """
        SELECT event_id, user_id,
               CAST(floor(value) AS BIGINT) AS coarse,
               RANK() OVER (PARTITION BY user_id
                            ORDER BY CAST(floor(value) AS BIGINT)) AS rnk,
               DENSE_RANK() OVER (PARTITION BY user_id
                                  ORDER BY CAST(floor(value) AS BIGINT)) AS drnk,
               NTILE(4) OVER (PARTITION BY user_id
                              ORDER BY CAST(floor(value) AS BIGINT), event_id) AS nt4,
               ROUND(PERCENT_RANK() OVER (PARTITION BY user_id
                              ORDER BY CAST(floor(value) AS BIGINT)), 6) AS pct_rank,
               ROUND(CUME_DIST() OVER (PARTITION BY user_id
                              ORDER BY CAST(floor(value) AS BIGINT)), 6) AS cume_dist
        FROM events""",
    "first_last": """
        SELECT event_id,
               FIRST_VALUE(value) OVER w AS first_value,
               LAST_VALUE(value) OVER w AS last_value,
               NTH_VALUE(value, 2) OVER w AS nth2_value
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)""",
    "lag_lead": """
        SELECT event_id,
               LAG(value, 1) OVER w AS lag1_value,
               LAG(value, 2) OVER w AS lag2_value,
               LEAD(value, 1) OVER w AS lead1_value
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)""",
    "rolling_24h": """
        SELECT event_id,
               COUNT(value) OVER w AS roll_count_value,
               ROUND(SUM(value) OVER w, 6) AS roll_sum_value,
               ROUND(AVG(value) OVER w, 6) AS roll_mean_value,
               MIN(value) OVER w AS roll_min_value,
               MAX(value) OVER w AS roll_max_value
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts
                     RANGE BETWEEN INTERVAL 24 HOURS PRECEDING AND CURRENT ROW)""",
    "expanding": """
        SELECT event_id,
               CAST(COUNT(value) OVER w AS BIGINT) AS cum_count_value,
               ROUND(SUM(value) OVER w, 6) AS cum_sum_value,
               MIN(value) OVER w AS cum_min_value,
               MAX(value) OVER w AS cum_max_value
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)""",
    "tumbling_daily": """
        SELECT user_id,
               make_timestamp((epoch_us(ts)//86400000000)*86400000000) AS window_start,
               COUNT(*) AS n_events, ROUND(SUM(value), 6) AS sum_value,
               MIN(value) AS min_value, MAX(value) AS max_value
        FROM events GROUP BY 1, 2""",
    "hopping_6h": """
        SELECT user_id,
               make_timestamp((epoch_us(ts)//21600000000 - r.range)*21600000000)
                   AS window_start,
               COUNT(*) AS n_events, ROUND(SUM(value), 6) AS sum_value
        FROM events CROSS JOIN range(4) r
        GROUP BY 1, 2""",
    "sessionize": SESSION_SQL,
    "backfill_daily": """
        WITH grid AS (SELECT DISTINCT user_id, date_trunc('day', ts) AS ts FROM events)
        SELECT g.user_id, g.ts, r.ts AS ts_r, r.value AS value_r
        FROM grid g
        ASOF LEFT JOIN (SELECT user_id, ts, value FROM events) r
          ON g.user_id = r.user_id AND g.ts >= r.ts""",
    "q1_pricing_summary": """
        SELECT l_returnflag, l_linestatus,
               ROUND(SUM(l_quantity), 2) AS sum_qty,
               ROUND(SUM(l_extendedprice), 2) AS sum_base_price,
               ROUND(SUM(l_extendedprice * (1 - l_discount)), 4) AS sum_disc_price,
               ROUND(AVG(l_quantity), 4) AS avg_qty,
               COUNT(*) AS count_order
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '1998-09-02'
        GROUP BY l_returnflag, l_linestatus""",
    "q3_shipping_priority": """
        SELECT l_orderkey, o_orderdate, ROUND(SUM(l_extendedprice * (1 - l_discount)), 4) AS revenue
        FROM customer JOIN orders ON c_custkey = o_custkey
                      JOIN lineitem ON l_orderkey = o_orderkey
        WHERE c_mktsegment = 'BUILDING'
          AND o_orderdate < DATE '1995-03-15'
          AND l_shipdate > DATE '1995-03-15'
        GROUP BY l_orderkey, o_orderdate
        ORDER BY revenue DESC, l_orderkey LIMIT 10""",
    "q6_forecast_revenue": """
        SELECT ROUND(SUM(l_extendedprice * l_discount), 4) AS revenue
        FROM lineitem
        WHERE l_shipdate >= DATE '1996-01-01' AND l_shipdate < DATE '1997-01-01'
          AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24""",
    "user_event_paths": """
        SELECT user_id,
               string_agg(event_type, '>' ORDER BY ts, event_id) AS path
        FROM events GROUP BY user_id""",
    "asof_multi_horizon": """
        WITH l AS (SELECT event_id, ts, user_id FROM events WHERE event_type='view'),
             r AS (SELECT ts, user_id, value FROM events WHERE event_type='purchase')
        SELECT l.event_id, r0.value AS value_h0, r1.value AS value_h24
        FROM l
        ASOF LEFT JOIN r r0
          ON l.user_id = r0.user_id AND l.ts >= r0.ts
        ASOF LEFT JOIN r r1
          ON l.user_id = r1.user_id AND l.ts - INTERVAL 24 HOURS >= r1.ts""",
    "union_by_name": """
        SELECT event_id, user_id FROM events WHERE event_type = 'view'
        UNION ALL BY NAME
        SELECT event_id, value FROM events WHERE event_type = 'purchase'""",
    "row_index_events": """
        SELECT event_id,
               ROW_NUMBER() OVER (ORDER BY event_id) - 1 AS idx
        FROM events""",
    "impute_value": """
        WITH m AS (
          SELECT event_id,
                 CASE WHEN event_type <> 'click' THEN value END AS value_n
          FROM events)
        SELECT event_id,
               COALESCE(value_n, (SELECT ROUND(AVG(value_n), 6) FROM m))
                 AS value_n
        FROM m""",
    "topk_orders": """
        SELECT o_orderkey, o_totalprice FROM orders
        ORDER BY o_totalprice DESC, o_orderkey LIMIT 10""",
    "topk_per_user": """
        SELECT event_id FROM (
          SELECT event_id, ROW_NUMBER() OVER (PARTITION BY user_id
                                              ORDER BY value DESC, event_id) AS rn
          FROM events) WHERE rn <= 2""",
    "filter_scan": """
        SELECT l_orderkey, l_linenumber FROM lineitem
        WHERE l_quantity > 45 AND l_shipdate < TIMESTAMP '1998-01-01'""",
    "join_orders_customer": """
        SELECT c_mktsegment, COUNT(*) AS n_orders,
               ROUND(SUM(o_totalprice), 2) AS sum_price
        FROM orders JOIN customer ON o_custkey = c_custkey
        GROUP BY c_mktsegment""",
    "skew_join_events": """
        SELECT event_type, c_mktsegment, COUNT(*) AS n,
               ROUND(SUM(value), 6) AS sum_value
        FROM events JOIN customer ON user_id = c_custkey
        GROUP BY event_type, c_mktsegment""",
    "broadcast_nation": """
        SELECT n_name, COUNT(*) AS n_customers, ROUND(SUM(c_acctbal), 2) AS sum_acctbal
        FROM customer LEFT JOIN nation ON c_nationkey = n_nationkey
        GROUP BY n_name""",
    "semi_customers": """
        SELECT c_custkey FROM customer
        WHERE c_custkey IN (SELECT o_custkey FROM orders)""",
    "anti_low_value": """
        SELECT c_custkey FROM customer
        WHERE c_custkey NOT IN (SELECT o_custkey FROM orders WHERE o_totalprice > 400000)""",
    "asof_windowed": """
        WITH j AS (
          SELECT l.event_id, l.user_id, l.ts, l.value,
                 r.ts AS ts_last_purchase, r.value AS value_last_purchase
          FROM events l
          ASOF LEFT JOIN (SELECT user_id, ts, value FROM events
                          WHERE event_type = 'purchase') r
            ON l.user_id = r.user_id AND l.ts >= r.ts),
        w AS (
          SELECT *,
                 LAG(value, 1) OVER win AS lag1_value,
                 COUNT(value) OVER rng AS roll_count_value,
                 SUM(value) OVER rng AS roll_sum_value,
                 CASE WHEN ts - LAG(ts) OVER win > INTERVAL 4 HOURS
                      THEN 1 ELSE 0 END AS brk
          FROM j
          WINDOW win AS (PARTITION BY user_id ORDER BY ts, event_id),
                 rng AS (PARTITION BY user_id ORDER BY ts
                         RANGE BETWEEN INTERVAL 24 HOURS PRECEDING AND CURRENT ROW))
        SELECT event_id, ts_last_purchase, value_last_purchase, lag1_value,
               roll_count_value, ROUND(roll_sum_value, 6) AS roll_sum_value,
               CAST(SUM(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                    AS BIGINT) AS session_idx
        FROM w""",
    "pivot_user_by_type": """
        SELECT user_id,
               ROUND(SUM(CASE WHEN event_type='view' THEN value ELSE 0 END), 6) AS sum_value_view,
               ROUND(SUM(CASE WHEN event_type='purchase' THEN value ELSE 0 END), 6) AS sum_value_purchase,
               ROUND(SUM(CASE WHEN event_type='click' THEN value ELSE 0 END), 6) AS sum_value_click
        FROM events GROUP BY user_id""",
    "tumbling_median": """
        SELECT user_id,
               make_timestamp((epoch_us(ts)//86400000000)*86400000000)
                   AS window_start,
               ROUND(quantile_cont(value, 0.50), 6) AS p50_value,
               ROUND(quantile_cont(value, 0.90), 6) AS p90_value
        FROM events GROUP BY 1, 2""",
    "quantiles_by_type": """
        SELECT event_type,
               ROUND(quantile_cont(value, 0.25), 6) AS p25_value,
               ROUND(quantile_cont(value, 0.50), 6) AS p50_value,
               ROUND(quantile_cont(value, 0.90), 6) AS p90_value
        FROM events GROUP BY event_type""",
    "sample_events": """
        SELECT event_id FROM events
        WHERE CAST(('0x' || substr(md5(CAST(event_id AS VARCHAR)), 1, 8)) AS UBIGINT)
              < CAST(0.1 * 4294967296 AS UBIGINT)""",
    # splitmix64 twin of engine.ops.agg.splitmix64 / splitmix64_sql, staged
    # through CTEs (the inlined expression explodes combinatorially).
    # 484763065/3210233709 and 321982955/2496678331 are the lo/hi 32-bit
    # halves of the two splitmix64 constants; threshold = int(0.1 * 2^64).
    "sample_events_fast": """
        WITH h1 AS (
          SELECT event_id, xor(CAST(event_id AS UBIGINT),
                               CAST(event_id AS UBIGINT) >> 30) AS y FROM events
        ), h2 AS (
          SELECT event_id, CAST((CAST(y AS HUGEINT) * 484763065 +
                ((CAST(y AS HUGEINT) * 3210233709) % 4294967296) * 4294967296)
                % 18446744073709551616 AS UBIGINT) AS x FROM h1
        ), h3 AS (
          SELECT event_id, xor(x, x >> 27) AS y FROM h2
        ), h4 AS (
          SELECT event_id, CAST((CAST(y AS HUGEINT) * 321982955 +
                ((CAST(y AS HUGEINT) * 2496678331) % 4294967296) * 4294967296)
                % 18446744073709551616 AS UBIGINT) AS x FROM h3
        )
        SELECT event_id FROM h4 WHERE xor(x, x >> 31) < 1844674407370955264""",
    "stratified_sample": """
        SELECT event_id FROM events
        WHERE CAST(('0x' || substr(md5(CAST(event_id AS VARCHAR)), 1, 8)) AS UBIGINT)
              < CAST((CASE event_type WHEN 'view' THEN 0.5
                      WHEN 'purchase' THEN 1.0 ELSE 0.1 END) * 4294967296 AS UBIGINT)""",
    "intersect_buyers_viewers": """
        SELECT user_id FROM events WHERE event_type = 'view'
        INTERSECT
        SELECT user_id FROM events WHERE event_type = 'purchase'""",
    "except_viewers_only": """
        SELECT user_id FROM events WHERE event_type = 'view'
        EXCEPT
        SELECT user_id FROM events WHERE event_type = 'purchase'""",
    "distinct_event_types": "SELECT DISTINCT event_type FROM events",
    "minmax_by_type": """
        SELECT event_type, COUNT(*) AS n, MIN(value) AS min_value, MAX(value) AS max_value
        FROM events GROUP BY event_type""",
    "union_counts": """
        SELECT COUNT(*) AS n FROM (
          SELECT * FROM events WHERE event_type='view'
          UNION ALL SELECT * FROM events WHERE event_type='purchase')""",
    "json_extract": r"""
        SELECT event_id, CAST(regexp_extract(props, '"k"\s*:\s*(-?\d+)', 1) AS BIGINT) AS k
        FROM events""",
    "daily_counts": """
        SELECT date_trunc('day', ts) AS day, COUNT(*) AS n FROM events GROUP BY 1""",
    "doc_tokens": r"""
        SELECT doc_id, array_length(string_split_regex(trim(text), '\s+')) AS n_tokens
        FROM documents""",
    "dedup_events": """
        SELECT event_id FROM (
          SELECT event_id, ROW_NUMBER() OVER (PARTITION BY user_id, event_type
                                              ORDER BY ts, event_id) AS rn
          FROM events) WHERE rn = 1""",
    "dedup_text_md5": """
        SELECT doc_id FROM (
          SELECT doc_id, ROW_NUMBER() OVER (PARTITION BY md5(text) ORDER BY doc_id) AS rn
          FROM documents) WHERE rn = 1""",
    "unnest_embeddings": """
        SELECT vec_id, generate_subscripts(embedding, 1) AS pos,
               ROUND(CAST(unnest(embedding) AS DOUBLE), 6) AS e
        FROM embeddings""",
    "embedding_l2": """
        SELECT vec_id, ROUND(sqrt(sum(e * e)), 5) AS l2
        FROM (SELECT vec_id, unnest(embedding) AS e FROM embeddings)
        GROUP BY vec_id""",
    "embedding_label_stats": """
        SELECT label, COUNT(*) AS n, ROUND(SUM(l2), 4) AS sum_l2
        FROM (SELECT label, sqrt(sum(e * e)) AS l2
              FROM (SELECT vec_id, label, unnest(embedding) AS e FROM embeddings)
              GROUP BY vec_id, label)
        GROUP BY label""",
}

ORACLE_SQL["asof_broadcast"] = ORACLE_SQL["asof_join"]

ORACLE_SQL["mode_by_user"] = """
    SELECT user_id, event_type AS mode_event_type FROM (
      SELECT user_id, event_type,
             ROW_NUMBER() OVER (PARTITION BY user_id
                                ORDER BY COUNT(*) DESC, event_type ASC) AS rn
      FROM events GROUP BY user_id, event_type)
    WHERE rn = 1"""

from engine.ops.agg import splitmix64_sql as _sm_sql

ORACLE_SQL["grouped_sample_k"] = f"""
    SELECT event_type, event_id, user_id FROM (
      SELECT event_type, event_id, user_id,
             ROW_NUMBER() OVER (PARTITION BY event_type
                                ORDER BY {_sm_sql('event_id')}, event_id) AS rn
      FROM events)
    WHERE rn <= 3"""

ORACLE_SQL["rollup_daily_type"] = """
    SELECT date_trunc('day', ts) AS day, event_type,
           ROUND(SUM(value), 6) AS sum_value, COUNT(*) AS n
    FROM events GROUP BY ROLLUP(day, event_type)"""

ORACLE_SQL["melt_lineitem"] = """
    SELECT l_orderkey, l_linenumber, 'l_quantity' AS variable,
           CAST(l_quantity AS DOUBLE) AS value FROM lineitem
    UNION ALL
    SELECT l_orderkey, l_linenumber, 'l_extendedprice',
           CAST(l_extendedprice AS DOUBLE) FROM lineitem
    UNION ALL
    SELECT l_orderkey, l_linenumber, 'l_discount',
           CAST(l_discount AS DOUBLE) FROM lineitem"""

ORACLE_SQL["corr_qty_price"] = """
    SELECT l_returnflag, COUNT(*) AS n,
           ROUND(COVAR_POP(l_quantity, l_extendedprice), 6) AS covar_pop,
           ROUND(CORR(l_quantity, l_extendedprice), 6) AS corr
    FROM lineitem GROUP BY l_returnflag"""

ORACLE_SQL["cube_daily_type"] = """
    SELECT date_trunc('day', ts) AS day, event_type,
           ROUND(SUM(value), 6) AS sum_value, COUNT(*) AS n
    FROM events GROUP BY CUBE(day, event_type)"""

from engine.ops.rollup import histogram_sql as _hist_sql

ORACLE_SQL["value_histogram"] = _hist_sql("events", "value", 0.0, 200.0, 20)

ORACLE_SQL["bloom_anti_join"] = """
    SELECT c_custkey FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey
                        AND o.o_totalprice > 300000.0)"""

ORACLE_SQL["heavy_hitters"] = """
    SELECT user_id AS key, COUNT(*) AS cnt FROM events GROUP BY user_id
    HAVING CAST(COUNT(*) AS DOUBLE) > 0.0075 * (SELECT COUNT(*) FROM events)"""

QUERIES = {
    "asof_join": q_asof_join,
    "asof_strict": q_asof_strict,
    "asof_tolerance": q_asof_tolerance,
    "asof_forward": q_asof_forward,
    "asof_nearest": q_asof_nearest,
    "asof_broadcast": q_asof_broadcast,
    "range_join": q_range_join,
    "event_ranks": q_event_ranks,
    "event_rank_stats": q_event_rank_stats,
    "first_last": q_first_last,
    "ewma_value": q_ewma,
    "lag_lead": q_lag_lead,
    "rolling_24h": q_rolling_24h,
    "expanding": q_expanding,
    "tumbling_daily": q_tumbling_daily,
    "tumbling_median": q_tumbling_median,
    "hopping_6h": q_hopping_6h,
    "sessionize": q_sessionize,
    "backfill_daily": q_backfill_daily,
    "q1_pricing_summary": q1_pricing_summary,
    "q3_shipping_priority": q3_shipping_priority,
    "q6_forecast_revenue": q6_forecast_revenue,
    "topk_orders": q_topk_orders,
    "user_event_paths": q_user_event_paths,
    "asof_multi_horizon": q_asof_multi_horizon,
    "union_by_name": q_union_by_name,
    "row_index_events": q_row_index_events,
    "impute_value": q_impute_value,
    "topk_per_user": q_topk_per_user,
    "filter_scan": q_filter_scan,
    "join_orders_customer": q_join_orders_customer,
    "skew_join_events": q_skew_join_events,
    "broadcast_nation": q_broadcast_nation,
    "semi_customers": q_semi_customers,
    "anti_low_value": q_anti_low_value,
    "asof_windowed": q_asof_windowed,
    "pivot_user_by_type": q_pivot_user_by_type,
    "quantiles_by_type": q_quantiles_by_type,
    "sample_events": q_sample_events,
    "sample_events_fast": q_sample_events_fast,
    "stratified_sample": q_stratified_sample,
    "intersect_buyers_viewers": q_intersect_buyers_viewers,
    "except_viewers_only": q_except_viewers_only,
    "approx_distinct_users": q_approx_distinct_users,
    "approx_distinct_by_type": q_approx_distinct_by_type,
    "approx_quantiles_by_type": q_approx_quantiles_by_type,
    "heavy_hitters": q_heavy_hitters,
    "bloom_anti_join": q_bloom_anti_join,
    "approx_quantiles_value": q_approx_quantiles_value,
    "zorder_events": q_zorder_events,
    "mode_by_user": q_mode_by_user,
    "grouped_sample_k": q_grouped_sample_k,
    "distinct_event_types": q_distinct_event_types,
    "minmax_by_type": q_minmax_by_type,
    "union_counts": q_union_counts,
    "json_extract": q_json_extract,
    "daily_counts": q_daily_counts,
    "rollup_daily_type": q_rollup_daily_type,
    "cube_daily_type": q_cube_daily_type,
    "corr_qty_price": q_corr_qty_price,
    "value_histogram": q_value_histogram,
    "doc_tokens": q_doc_tokens,
    "dedup_events": q_dedup_events,
    "dedup_text_md5": q_dedup_text_md5,
    "unnest_embeddings": q_unnest_embeddings,
    "melt_lineitem": q_melt_lineitem,
    "embedding_l2": q_embedding_l2,
    "embedding_label_stats": q_embedding_label_stats,
}
