"""Skew handling: salt planning + salted two-level aggregation
(SURVEY.md §2.4 J2, §4.2 — "explicit salting for skewed phash clusters").

plan_salts samples the dataset (A7: sampled histogram, no sketch
dependency offline), finds keys whose estimated row count exceeds
`threshold x mean`, and assigns each a fan-out S (power of two, capped).
apply_salt adds __salt = stable_hash(tie_col) % S_key so one hot key
spreads over S partitions; unsalted keys get __salt = 0. Aggregations
then run per (key, salt) first (partial) and re-combine per key (final)
— see engine/ops/cluster.py for the two-level pattern in use.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from engine.config import DEFAULT
from engine.ops.keys import stable_hash


def plan_salts(ds, key: str, sample_frac: float = 0.05, threshold: float | None = None,
               max_salt: int | None = None, seed: int = 42) -> dict:
    """-> {key_value: fanout S} for hot keys only (driver-side small dict).

    The sampled histogram stays DISTRIBUTED end-to-end: per-key counts
    are a Dataset groupby over the sample, the count mean is two scalar
    aggregates, and only keys ABOVE the hot threshold are pulled to the
    driver — small by definition (a key is hot precisely because few keys
    can be). The round-3 form pulled the whole sample (fraction of the
    corpus, ~5x10^9 keys at 10^11 rows) onto the driver heap."""
    import pyarrow.compute as pc
    from ray.data.aggregate import Count

    threshold = threshold or DEFAULT.salt_threshold
    max_salt = max_salt or DEFAULT.max_salt
    grouped = (ds.select_columns([key]).random_sample(sample_frac, seed=seed)
               .groupby(key).aggregate(Count(alias_name="__cnt")).materialize())
    nkeys = grouped.count()
    if nkeys == 0:
        return {}
    total = grouped.sum("__cnt")
    mean = total / nkeys
    hot = grouped.map_batches(
        lambda t: t.filter(pc.greater(t["__cnt"], threshold * mean)),
        batch_format="pyarrow", zero_copy_batch=True).to_pandas()
    out = {}
    for k, c in zip(hot[key], hot["__cnt"]):
        s = int(min(max_salt, 2 ** int(np.ceil(np.log2(max(2.0, c / mean))))))
        out[k] = s
    return out


def apply_salt(ds, key: str, salt_map: dict, tie_col: str):
    """Adds __salt int32. tie_col: any roughly-unique column used to spread
    a hot key's rows deterministically across its S sub-buckets."""
    import ray

    ref = ray.put(salt_map)

    def add(t: pa.Table) -> pa.Table:
        sm = ray.get(ref)
        n = t.num_rows
        salts = np.zeros(n, dtype=np.int32)
        if sm:
            keys = t[key].to_numpy(zero_copy_only=False)
            fan = np.array([sm.get(k, 1) for k in keys], dtype=np.uint64)
            hot = fan > 1
            if hot.any():
                h = stable_hash(t[tie_col])
                salts[hot] = (h[hot] % fan[hot]).astype(np.int32)
        return t.append_column("__salt", pa.array(salts, type=pa.int32()))

    return ds.map_batches(add, batch_format="pyarrow", zero_copy_batch=True)
