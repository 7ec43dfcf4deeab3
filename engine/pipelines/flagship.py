"""Flagship pipelines (SURVEY.md §3 E1/E2).

image_flagship: the descriptor-extraction + clustering + normalization
side (reference R2–R7 recast): synthetic images -> fused featurize actor
pool -> bucket cluster features (broadcast) -> fixed-order feature vector
-> z-score normalize with degenerate-dim pruning.

windowed_features: ONE entity-hash shuffle, then a single partition-local
sorted pass computing lag/lead + rolling + session labels together —
chaining the standalone window ops would shuffle once per op; the fused
pass is the shape a 100 TB run needs (shuffle count is the cost model,
SURVEY.md §4.2).

events_flagship: as-of attach (one shuffle) + fused windows (one shuffle)
over the driver events table — the `entry()` smoke pipeline.
"""

from __future__ import annotations

import numpy as np
import pyarrow.compute as pc

from engine.ops.window import _partitioned
# NOTE: wkernel is imported at MODULE level, not inside window_pass:
# window_pass executes on workers via pickle-by-value, which preserves
# import statements — an in-function `from engine...` import would raise
# ModuleNotFoundError on workers whose sys.path lacks the repo root.
from engine.ops.wkernel import (entity_sort, lag_lead_arrays, rolling_bounds,
                                session_labels, window_sums)


def image_flagship(n_images: int = 1000, parallelism: int = -1, normalize: bool = True):
    from engine.fixtures.gen import images_dataset
    from engine.ops.assemble import assemble
    from engine.ops.cluster import with_cluster_features
    from engine.ops.decode import featurize
    from engine.ops.normalize import normalize_fv

    feats = featurize(images_dataset(n_images, parallelism=parallelism))
    cf = with_cluster_features(feats)
    fv = assemble(cf, extra_cols=("bucket_size", "centroid_dist"))
    if not normalize:
        return fv
    norm, kept = normalize_fv(fv)
    return norm


def window_pass(t, entity: str, ts: str = "ts", value: str = "value",
                gap_us: int = 4 * 3600 * 1_000_000,
                window_us: int = 24 * 3600 * 1_000_000,
                tie_break: str | None = None):
    """lag1/lag2 + rolling count/sum/mean + session_idx over ONE
    entity-complete pa.Table, fully vectorized — no per-entity Python
    loop, no pandas round-trip (wide list<float> feature columns ride
    along zero-copy through the sort `take`).

    Rolling windows use a banded composite key: per-entity code x
    window-padded normalized timestamp, so ONE global np.searchsorted
    answers every entity's `RANGE BETWEEN w PRECEDING AND CURRENT ROW`
    bounds at once (bands are wider than span+window, so a probe can
    never cross into a neighboring entity's band).
    """
    import pyarrow as pa

    n = t.num_rows
    if n == 0:
        out = t
        for name, typ in [(f"lag1_{value}", pa.float64()), (f"lag2_{value}", pa.float64()),
                          (f"roll_count_{value}", pa.int64()), (f"roll_sum_{value}", pa.float64()),
                          (f"roll_mean_{value}", pa.float64()), ("session_idx", pa.int64())]:
            out = out.append_column(name, pa.chunked_array([], type=typ))
        return out

    t, codes, tsv, change = entity_sort(t, entity, ts, tie_break)
    v = t[value].to_numpy(zero_copy_only=False).astype(np.float64)

    shifts = lag_lead_arrays(v, change, lags=(1, 2))
    lag1, lag2 = shifts[("lag", 1)], shifts[("lag", 2)]

    lo, hi = rolling_bounds(codes, tsv, window_us)
    cnt = (hi - lo).astype(np.int64)
    sm = window_sums(v, lo, hi)

    sess = session_labels(change, tsv, gap_us)

    for name, arr in [(f"lag1_{value}", lag1), (f"lag2_{value}", lag2),
                      (f"roll_count_{value}", cnt), (f"roll_sum_{value}", sm),
                      (f"roll_mean_{value}", sm / np.where(cnt == 0, 1, cnt)),
                      ("session_idx", sess)]:
        t = t.append_column(name, pa.array(arr))
    return t


def windowed_features(ds, entity: str, ts: str = "ts", value: str = "value",
                      gap_us: int = 4 * 3600 * 1_000_000,
                      window_us: int = 24 * 3600 * 1_000_000,
                      tie_break: str | None = None,
                      num_partitions: int | None = None):
    """lag1/lag2 + rolling count/sum/mean + session_idx in ONE pass
    (one entity-hash shuffle, then window_pass per partition)."""

    def fn(t):
        return window_pass(t.drop_columns(["__pkey"]), entity, ts, value,
                           gap_us, window_us, tie_break)

    return _partitioned(ds, entity, num_partitions).map_groups(fn, batch_format="pyarrow")


def asof_windowed(left, right, on: str, right_cols=None, value: str = "value",
                  gap_us: int = 4 * 3600 * 1_000_000,
                  window_us: int = 24 * 3600 * 1_000_000,
                  tie_break: str | None = None, suffix: str = "_r",
                  num_partitions: int | None = None, exchange: str = "sort"):
    """As-of join + windowed features in ONE shuffle: the window pass runs
    inside the as-of merge's map_groups call (both keyed on hash(entity)),
    so the timeline never pays a second exchange. ``exchange`` selects the
    physical exchange (see engine.ops.asof.asof_join)."""
    from engine.ops.asof import asof_join

    def post(merged):
        return window_pass(merged, on, "ts", value, gap_us, window_us, tie_break)

    return asof_join(left, right, on=on, right_cols=right_cols, suffix=suffix,
                     num_partitions=num_partitions, post=post, exchange=exchange)


def events_flagship(sf_dir: str, num_partitions: int | None = None):
    """entry() pipeline: as-of attach last purchase value to every event,
    then fused windowed features per user."""
    import ray.data as rd

    # prune at the read: the props JSON column would otherwise ride the
    # as-of exchange for nothing (it is never touched downstream). The
    # metadata strip keeps pa.Schema hashable (Ray's schema-dedup fast path).
    ev = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["event_id", "ts", "user_id", "event_type", "value"]
                         ).map_batches(lambda t: t.replace_schema_metadata(None),
                                       batch_format="pyarrow", zero_copy_batch=True)
    purchases = ev.map_batches(
        lambda t: t.filter(pc.equal(t["event_type"], "purchase")), batch_format="pyarrow"
    ).select_columns(["user_id", "ts", "value"])
    return asof_windowed(ev, purchases, on="user_id", right_cols=["value"],
                         suffix="_last_purchase", tie_break="event_id",
                         num_partitions=num_partitions)
