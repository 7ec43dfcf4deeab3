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
    hs._graft_empty_schema_patched = True
    _APPLIED = True
