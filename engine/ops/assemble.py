"""Feature-vector assembly (SURVEY.md §2.3 M8; reference R7 recast).

Flattens the FEATURES columns into a fixed-order `fv: list<float64>[76]`
per row. The order is FROZEN in engine/ops/schema.py (FV_SCALARS +
tok_hash dims) — this is the np.allclose surface for the correctness gate
(BASELINE.json north_rule). Stateless, fully vectorized map_batches.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from engine.ops import schema as S


def assemble_batch(batch: pa.Table, extra_cols: tuple = ()) -> pa.Table:
    n = batch.num_rows
    dim = S.FV_DIM + len(extra_cols)
    fv = np.empty((n, dim), dtype=np.float64)
    for j, name in enumerate(S.FV_SCALARS):
        fv[:, j] = batch[name].to_numpy(zero_copy_only=False).astype(np.float64)
    th = batch["tok_hash"]
    if isinstance(th, pa.ChunkedArray):
        th = th.combine_chunks()
    fv[:, len(S.FV_SCALARS) : S.FV_DIM] = (
        th.flatten().to_numpy(zero_copy_only=False).reshape(n, S.TOK_HASH_DIM).astype(np.float64)
    )
    for j, name in enumerate(extra_cols):
        fv[:, S.FV_DIM + j] = batch[name].to_numpy(zero_copy_only=False).astype(np.float64)
    out = {
        "image_id": batch["image_id"],
        "fv": pa.FixedSizeListArray.from_arrays(pa.array(fv.reshape(-1), type=pa.float64()), dim),
    }
    if "ts" in batch.column_names:
        out = {"image_id": batch["image_id"], "ts": batch["ts"], "fv": out["fv"]}
    return pa.table(out)


def assemble(ds, extra_cols: tuple = ()):
    return ds.map_batches(
        lambda t: assemble_batch(t, extra_cols), batch_format="pyarrow", zero_copy_batch=True
    )
