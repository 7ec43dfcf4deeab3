"""Unit tests for engine/ray_patches.py — the Ray 2.49 empty-block
schema fixes. The join-level regressions live in tests/test_skew_join.py;
these pin the two other layers directly."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest


def test_sort_keeps_schema_on_empty_ranges(ray_session):
    """A sort whose reducer count exceeds the distinct-key count used to
    emit 0-column empty blocks for the empty ranges (vanilla
    merge_sorted_blocks drops schema-full empties then fabricates a
    column-less table). With the patch every output block carries the
    real schema."""
    import ray
    import ray.data as rd

    t = pa.table({"k": pa.array([1, 1, 2, 2] * 5, pa.int64()),
                  "v": pa.array(range(20), pa.int64())})
    m = rd.from_arrow_refs([ray.put(t)] * 2).sort("k").materialize()
    shapes = [(meta.num_rows, len(ray.get(ref).schema.names))
              for b in m.iter_internal_ref_bundles() for ref, meta in b.blocks]
    assert all(ncols == 2 for _rows, ncols in shapes), shapes
    assert sum(rows for rows, _ in shapes) == 40


def test_map_groups_output_has_no_stale_schema(ray_session):
    """groupby().map_groups over more partitions than groups: the empty
    partitions' outputs must not poison the result (count and values
    stay exact)."""
    import ray
    import ray.data as rd

    t = pa.table({"k": pa.array([1, 2] * 10, pa.int64()),
                  "v": pa.array(np.arange(20, dtype=np.int64))})

    def agg(g: pa.Table) -> pa.Table:
        return pa.table({"k": g["k"][:1],
                         "s": pa.array([pa.compute.sum(g["v"]).as_py()], pa.int64())})

    out = (rd.from_arrow_refs([ray.put(t)] * 2)
           .groupby("k").map_groups(agg, batch_format="pyarrow")
           .to_pandas().sort_values("k").reset_index(drop=True))
    assert out["k"].tolist() == [1, 2]
    # two identical input blocks: per-key sums double
    assert out["s"].tolist() == [2 * int(np.arange(0, 20, 2).sum()),
                                 2 * int(np.arange(1, 20, 2).sum())]


def test_join_after_rename_with_empty_partitions(ray_session):
    """The round-5 minhash regression class, minimally: join -> rename ->
    join again, where the first join has empty partitions. Ray skips map
    UDFs on empty blocks, so without normalization the un-renamed column
    survives on the empty partition and collides in the second join
    (the renamed payload comes back all-null)."""
    import ray.data as rd

    from engine.ops.join import equi_join
    from engine.ops.util import drop_empty_blocks

    left = rd.from_pandas(pd.DataFrame({
        "a": np.array([0, 0, 0], dtype=np.int64),
        "b": np.array([1, 2, 3], dtype=np.int64)}))
    payload = rd.from_pandas(pd.DataFrame({
        "id": np.arange(4, dtype=np.int64),
        "payload": ["p0", "p1", "p2", "p3"]}))
    j1 = (equi_join(left, payload, on="a", right_on="id", num_partitions=4)
          .rename_columns({"payload": "payload_a"}).materialize())
    j2 = (equi_join(drop_empty_blocks(j1), payload, on="b", right_on="id",
                    num_partitions=4)
          .rename_columns({"payload": "payload_b"}))
    out = j2.to_pandas().sort_values("b").reset_index(drop=True)
    assert out["payload_a"].tolist() == ["p0", "p0", "p0"]
    assert out["payload_b"].tolist() == ["p1", "p2", "p3"]
    assert not out["payload_b"].isna().any()


def test_patches_idempotent():
    """apply_* may run any number of times (engine import, worker import,
    explicit calls) without stacking wrappers."""
    from ray.data._internal.execution.operators import hash_shuffle as hs
    from ray.data._internal.planner.exchange.sort_task_spec import SortTaskSpec

    from engine import ray_patches as rp

    before = (hs._shuffle_block, SortTaskSpec.reduce)
    rp.apply_hash_shuffle_schema_patch()
    rp.apply_sort_schema_patch()
    rp.apply_empty_bundle_normalize_patch()
    assert hs._shuffle_block is before[0]
    assert SortTaskSpec.reduce is before[1]
