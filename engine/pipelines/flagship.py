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
import pandas as pd
import pyarrow.compute as pc

from engine.ops.window import _partitioned, _sorted_group


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


def windowed_features(ds, entity: str, ts: str = "ts", value: str = "value",
                      gap_us: int = 4 * 3600 * 1_000_000,
                      window_us: int = 24 * 3600 * 1_000_000,
                      tie_break: str | None = None,
                      num_partitions: int | None = None):
    """lag1/lag2 + rolling count/sum/mean + session_idx in ONE pass."""

    def fn(df: pd.DataFrame) -> pd.DataFrame:
        df = _sorted_group(df, entity, ts, tie_break)
        g = df.groupby(entity, sort=False)
        df[f"lag1_{value}"] = g[value].shift(1)
        df[f"lag2_{value}"] = g[value].shift(2)
        tsv = df[ts].to_numpy().astype("datetime64[us]").astype(np.int64)
        ent = df[entity].to_numpy()
        n = len(df)
        change = np.empty(n, dtype=bool)
        if n:
            change[0] = True
            change[1:] = ent[1:] != ent[:-1]
        starts = np.flatnonzero(change)
        ends = np.append(starts[1:], n)
        v = df[value].to_numpy(dtype=np.float64)
        cnt = np.empty(n)
        sm = np.empty(n)
        sess = np.empty(n, dtype=np.int64)
        for s, e in zip(starts, ends):
            t = tsv[s:e]
            lo = np.searchsorted(t, t - window_us, side="left")
            hi = np.searchsorted(t, t, side="right")
            cs = np.concatenate([[0.0], np.cumsum(v[s:e])])
            cnt[s:e] = hi - lo
            sm[s:e] = cs[hi] - cs[lo]
            brk = np.empty(e - s, dtype=np.int64)
            brk[0] = 0
            brk[1:] = (t[1:] - t[:-1]) > gap_us
            sess[s:e] = np.cumsum(brk)
        df[f"roll_count_{value}"] = cnt.astype(np.int64)
        df[f"roll_sum_{value}"] = sm
        df[f"roll_mean_{value}"] = sm / np.where(cnt == 0, 1, cnt)
        df["session_idx"] = sess
        return df

    return _partitioned(ds, entity, num_partitions).map_groups(fn, batch_format="pandas")


def events_flagship(sf_dir: str, num_partitions: int | None = None):
    """entry() pipeline: as-of attach last purchase value to every event,
    then fused windowed features per user."""
    import ray.data as rd

    from engine.ops.asof import asof_join

    ev = rd.read_parquet(f"{sf_dir}/events.parquet")
    purchases = ev.map_batches(
        lambda t: t.filter(pc.equal(t["event_type"], "purchase")), batch_format="pyarrow"
    ).select_columns(["user_id", "ts", "value"])
    joined = asof_join(ev, purchases, on="user_id", right_cols=["value"], suffix="_last_purchase",
                       num_partitions=num_partitions)
    return windowed_features(joined, entity="user_id", tie_break="event_id",
                             num_partitions=num_partitions)
