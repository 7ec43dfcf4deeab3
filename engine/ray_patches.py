"""Surgical runtime patches for Ray Data 2.49 bugs the engine hits.

hash-shuffle schema-broadcast bug (Ray 2.49.2,
ray/data/_internal/execution/operators/hash_shuffle.py::_shuffle_block):
the FIRST block of each input sequence is submitted with
``send_empty_blocks=True`` so every aggregator learns the schema even if
its partition ends up empty — but the function early-returns when that
first block has 0 rows, while the operator has already flipped
``_has_schemas_broadcasted``. Result: partitions that never receive a
non-empty shard build 0-column tables, and ``Dataset.join`` dies inside
``HashShuffleAggregator.finalize`` with ArrowInvalid "No match or
multiple matches for key field reference FieldRef.Name(...)". This is
deterministic at high parallelism (many read/filter output blocks are
empty, so the first-arriving block often is) — CORRECTNESS_r04's
``skew_join_events`` failure at num_cpus=32.

The patch wraps ``_shuffle_block`` so the empty+broadcast case fans a
schema-full empty shard to EVERY aggregator (exactly what the original
does for partitions missing from a non-empty first block) before
returning; all other cases delegate to the original function unchanged.
It is idempotent, driver-side only (the module global is re-read at each
``.options(...).remote(...)`` call site), and also silences the
executor's "new schema: ." warnings on pipelines with empty filter
outputs (VERDICT r4 §What's-wrong #6).
"""

from __future__ import annotations

_APPLIED = False


def apply_hash_shuffle_schema_patch() -> None:
    """Idempotently install the empty-first-block schema-broadcast fix."""
    global _APPLIED
    if _APPLIED:
        return
    import ray
    from ray.data._internal.execution.operators import hash_shuffle as hs

    if getattr(hs, "_graft_empty_schema_patched", False):  # other import path
        _APPLIED = True
        return

    orig_remote_fn = hs._shuffle_block
    orig_fn = orig_remote_fn._function  # undecorated implementation

    def _shuffle_block_schema_safe(
        block,
        input_index,
        key_columns,
        pool,
        block_transformer=None,
        send_empty_blocks=False,
        override_partition_id=None,
    ):
        from ray.data._internal.arrow_ops.transform_pyarrow import _create_empty_table
        from ray.data._internal.table_block import TableBlockAccessor
        from ray.data.block import BlockAccessor, BlockExecStats, BlockType

        stats = BlockExecStats.builder()
        blk = block
        # blocks may arrive as pandas (from_pandas datasets) — the original
        # converts AFTER its empty-check too, so count via the accessor
        n_rows = BlockAccessor.for_block(blk).num_rows()
        if n_rows == 0 and send_empty_blocks and key_columns:
            # The case the original skips: first block is empty, but the
            # aggregators still need the schema. Mirror the original's
            # transform order, then broadcast schema-full empty shards.
            if block_transformer is not None:
                try:
                    blk = block_transformer(blk)
                except Exception:
                    blk = block  # transformer choked on 0 rows; raw schema
            blk = TableBlockAccessor.try_convert_block_type(
                blk, block_type=BlockType.ARROW
            )
            if blk.schema is not None and len(blk.schema.names) > 0:
                empty_shard = _create_empty_table(blk.schema)
                shard_ref = ray.put(empty_shard)
                pending = [
                    pool.get_aggregator_for_partition(pid).submit.remote(
                        input_index, pid, shard_ref
                    )
                    for pid in range(pool.num_partitions)
                ]
                while pending:
                    _, pending = ray.wait(
                        pending, num_returns=len(pending), timeout=1
                    )
            meta = BlockAccessor.for_block(block).get_metadata(
                exec_stats=stats.build()
            )
            return (meta, {})
        return orig_fn(
            block,
            input_index,
            key_columns,
            pool,
            block_transformer=block_transformer,
            send_empty_blocks=send_empty_blocks,
            override_partition_id=override_partition_id,
        )

    hs._shuffle_block = ray.remote(_shuffle_block_schema_safe)

    # Operator-level companion (runs in the DRIVER, where the streaming
    # executor lives): the operator arms the schema broadcast exactly once
    # per input sequence, on the first submitted block. If that block is a
    # schema-LESS empty (e.g. produced upstream by a sort exchange with an
    # empty range), the patched _shuffle_block above has no schema to
    # broadcast and the one-shot opportunity is wasted. Re-arm the flag
    # whenever the broadcast-carrying block was empty — redundant
    # broadcasts just add one empty shard per aggregator (harmless).
    _orig_add_inner = hs.HashShufflingOperatorBase._do_add_input_inner

    def _do_add_input_schema_rearm(self, input_bundle, input_index):
        first_broadcast = not self._has_schemas_broadcasted[input_index]
        _orig_add_inner(self, input_bundle, input_index)
        metas = input_bundle.metadata
        if first_broadcast and metas and (metas[0].num_rows or 0) == 0:
            self._has_schemas_broadcasted[input_index] = False

    hs.HashShufflingOperatorBase._do_add_input_inner = _do_add_input_schema_rearm
    hs._graft_empty_schema_patched = True
    _APPLIED = True


# --------------------------------------------------------- sort exchange --

# Captured at module-import time (before apply_* runs, both in the driver
# and in any worker that imports this module): the ORIGINAL functions the
# wrappers delegate to.
from ray.data._internal.arrow_block import ArrowBlockAccessor as _ABA  # noqa: E402
from ray.data._internal.planner.exchange.sort_task_spec import (  # noqa: E402
    SortTaskSpec as _SortTaskSpec,
)

_ORIG_MERGE_SORTED = _ABA.merge_sorted_blocks
_ORIG_SORT_REDUCE = _SortTaskSpec.reduce
_MERGE_PATCHED = False


def _apply_merge_patch() -> None:
    """Per-process: make all-empty merge_sorted_blocks keep the schema.

    Ray 2.49's ArrowBlockAccessor.merge_sorted_blocks filters out empty
    blocks FIRST and, when nothing remains, fabricates a 0-column table —
    even though the mapper's range slices carried the schema. Those
    0-column blocks are the source of the executor's "new schema: ."
    warnings and, if they reach a Dataset.join, of the ArrowInvalid
    crash class fixed above. Return schema.empty_table() instead."""
    global _MERGE_PATCHED
    if _MERGE_PATCHED:
        return

    def merge_sorted_blocks_schema_safe(blocks, sort_key):
        import pyarrow as _pa
        from ray.data.block import BlockExecStats
        from ray.data.block import BlockMetadataWithSchema

        if all(getattr(b, "num_rows", 0) == 0 for b in blocks):
            for b in blocks:
                sch = getattr(b, "schema", None)
                if isinstance(sch, _pa.Schema) and len(sch.names) > 0:
                    stats = BlockExecStats.builder()
                    ret = sch.empty_table()
                    return ret, BlockMetadataWithSchema.from_block(
                        ret, stats=stats.build()
                    )
        return _ORIG_MERGE_SORTED(blocks, sort_key)

    _ABA.merge_sorted_blocks = staticmethod(merge_sorted_blocks_schema_safe)
    _MERGE_PATCHED = True


def sort_reduce_schema_safe(*args, **kwargs):
    """Replacement for SortTaskSpec.reduce — runs INSIDE reduce workers
    (shipped there because the driver-side class attribute is swapped to
    this importable/by-value function before ray.data caches the remote
    fn), so it can install the per-process merge patch where the merge
    actually executes, then delegate."""
    _apply_merge_patch()
    return _ORIG_SORT_REDUCE(*args, **kwargs)


def apply_sort_schema_patch() -> None:
    """Driver-side: route every sort-exchange reduce through the
    schema-safe wrapper (idempotent)."""
    if _SortTaskSpec.reduce is sort_reduce_schema_safe:
        return
    _SortTaskSpec.reduce = staticmethod(sort_reduce_schema_safe)
    # the driver process itself also finalizes merges in some paths
    _apply_merge_patch()


def apply_empty_bundle_normalize_patch() -> None:
    """Driver-side (executor): re-schema EMPTY bundles to the operator's
    established schema at every operator boundary.

    Two Ray 2.49 behaviors combine into a correctness trap: (a) map
    stages fabricate 0-column blocks for all-empty-input tasks
    (map_transformer.py `builder().build()` with nothing added), and (b)
    empty blocks BYPASS map UDFs entirely (plan_udf_map_op.py "directly
    output them without calling the UDF") — so an empty block's schema
    goes stale the moment a rename/projection happens around it. A stale
    `shingles` column surviving a rename this way made a later join
    suffix its REAL payload column to `shingles_r` and null the renamed
    one (minhash degenerate-bucket regression, round 5). The worker-side
    classes are reconstructed from ray's modules inside workers and are
    out of monkeypatch reach; but EVERY output bundle passes through
    `dedupe_schemas_with_validation` in the driver, so normalize here:
    a 0-row bundle whose schema diverges from the operator's established
    Arrow schema is replaced by one empty block OF that schema. This
    runs at every hop, so bypassed empties are re-normalized right after
    each schema-changing stage; it also silences the vacuous
    "new schema: ." warnings. Non-empty divergence is untouched."""
    import ray
    from ray.data._internal.execution import streaming_executor_state as ses
    from ray.data.block import BlockAccessor, _is_empty_schema

    if getattr(ses, "_graft_empty_bundle_patched", False):
        return
    orig = ses.dedupe_schemas_with_validation

    def dedupe_schemas_normalize_empty(old_schema, bundle, warn=True,
                                       enforce_schemas=False):
        import pyarrow as pa

        if (isinstance(old_schema, pa.Schema) and not _is_empty_schema(old_schema)
                and bundle.num_rows() == 0
                and not (isinstance(bundle.schema, pa.Schema)
                         and bundle.schema.equals(old_schema))):
            from ray.data._internal.execution.interfaces import RefBundle

            empty = old_schema.empty_table()
            meta = BlockAccessor.for_block(empty).get_metadata()
            return (
                RefBundle(
                    ((ray.put(empty), meta),),
                    schema=old_schema,
                    owns_blocks=True,
                    output_split_idx=bundle.output_split_idx,
                ),
                False,
            )
        return orig(old_schema, bundle, warn=warn, enforce_schemas=enforce_schemas)

    ses.dedupe_schemas_with_validation = dedupe_schemas_normalize_empty
    ses._graft_empty_bundle_patched = True
