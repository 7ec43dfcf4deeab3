"""Process-stable hashing for partition keys (SURVEY.md §4.2).

Python's builtin hash() is salted per process — never use it for
partitioning. pandas' hash_array (SipHash with a fixed key) is
deterministic across processes/nodes and vectorized in C for both
numeric and object (string) arrays.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa


def stable_hash(values) -> np.ndarray:
    """-> uint64 stable hash per element."""
    if isinstance(values, pa.ChunkedArray):
        values = values.combine_chunks()
    if isinstance(values, pa.Array):
        values = values.to_numpy(zero_copy_only=False)
    arr = np.asarray(values)
    return pd.util.hash_array(arr, categorize=False)


def partition_ids(values, num_partitions: int) -> np.ndarray:
    """-> int32 partition id = stable_hash(value) % P."""
    return (stable_hash(values) % np.uint64(num_partitions)).astype(np.int32)


def add_partition_column(table: pa.Table, on: str, num_partitions: int, col: str = "__pkey") -> pa.Table:
    return table.append_column(col, pa.array(partition_ids(table[on], num_partitions), type=pa.int32()))
