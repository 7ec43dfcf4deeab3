"""Fused featurize stage: decode + phash + pixel stats + caption features
(SURVEY.md §2.3 M1–M5, §4.3 actor-pool plan).

This is the engine's descriptor-extraction stage — the reimagining of the
reference's per-fragment descriptor generator (SURVEY.md §2.1 R2). It runs
as ONE `map_batches` actor-pool stage: per-actor state (format dispatch
table, 32x32 DCT basis, token-hash config) is built once in `__init__`;
`__call__` handles a zero-copy Arrow batch.

Usage:
    ds.map_batches(FeaturizeActor, batch_format="pyarrow",
                   zero_copy_batch=True, batch_size=cfg.featurize_batch_size,
                   concurrency=cfg.featurize_concurrency,
                   num_cpus=cfg.featurize_num_cpus)

Scale notes (100 TB): the decoded pixels NEVER leave this stage — only
fixed-width descriptors flow downstream, so the as-of/window shuffles move
~300 bytes/row instead of megapixel payloads (SURVEY.md §4.1 memory row).
The per-image decode loop is unavoidable (variable image sizes); the DCT
is batched into one einsum across the whole Arrow batch.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from engine.fixtures import codecs
from engine.ops import schema as S
from engine.ops.caption import caption_features
from engine.ops.phash import area_resize_32, dct_matrix, gray_bt601, phash_bucket
from engine.ops.stats import image_stats


class FeaturizeActor:
    def __init__(self, prefix_bits: int = 16, tok_hash_dim: int = 64):
        self.decoders = dict(codecs.DECODERS)  # fmt -> fn (dispatch built once)
        self.dct = dct_matrix(32)              # phash DCT basis (per-worker state)
        self.prefix_bits = prefix_bits
        self.tok_hash_dim = tok_hash_dim

    def __call__(self, batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        fmts = batch["fmt"].to_pylist()
        ws = batch["w"].to_numpy()
        hs = batch["h"].to_numpy()
        raw = batch["bytes"]

        g32 = np.empty((n, 32, 32), dtype=np.float64)
        stat_rows = []
        buf = raw.combine_chunks() if isinstance(raw, pa.ChunkedArray) else raw
        for i in range(n):
            # zero-copy: a memoryview over the arrow buffer slice instead
            # of materializing a Python bytes copy of every payload
            data = memoryview(buf[i].as_buffer())
            px = self.decoders[fmts[i]](data, int(ws[i]), int(hs[i]))
            gray = gray_bt601(px)  # ONE BT.601 plane shared by phash
            g32[i] = area_resize_32(gray)  # resize and the entropy stat
            stat_rows.append(image_stats(px, gray=gray))

        # batched 2-D DCT: D @ G @ D.T for the whole batch in one einsum
        f = np.einsum("ij,bjk,lk->bil", self.dct, g32, self.dct, optimize=True)
        block = f[:, :8, :8].reshape(n, 64)
        med = np.median(block[:, 1:], axis=1)
        packed = np.packbits(block > med[:, None], axis=1)
        ph = packed.copy().view(">u8").reshape(-1).astype(np.uint64).view(np.int64)

        n_tokens, n_chars, tok_hash = caption_features(batch["caption"], self.tok_hash_dim)

        cols: dict = {"image_id": batch["image_id"]}
        cols["phash"] = pa.array(ph, type=pa.int64())
        cols["phash_bucket"] = pa.array(phash_bucket(ph, self.prefix_bits), type=pa.int32())
        for name in ["w", "h", "aspect", "mean_r", "mean_g", "mean_b", "std_r", "std_g", "std_b", "entropy"]:
            vals = np.array([r[name] for r in stat_rows])
            typ = pa.int32() if name in ("w", "h") else pa.float64()
            cols[name] = pa.array(vals.astype(np.int32) if name in ("w", "h") else vals, type=typ)
        cols["n_tokens"] = pa.array(n_tokens, type=pa.int32())
        cols["n_chars"] = pa.array(n_chars, type=pa.int32())
        cols["tok_hash"] = pa.FixedSizeListArray.from_arrays(
            pa.array(tok_hash.reshape(-1), type=pa.float32()), self.tok_hash_dim
        )
        cols["caption"] = batch["caption"]  # byte-equal passthrough
        return pa.table(cols, schema=S.FEATURES)


_TASK_STATE: dict = {}


def _featurize_task(batch: pa.Table, prefix_bits: int, tok_hash_dim: int) -> pa.Table:
    """Stateless-task variant: state lives in a module-level cache keyed by
    config. Ray Data reuses worker processes across tasks, so the cache
    amortizes exactly like actor __init__ state — without paying actor-pool
    startup (~0.2s x pool size before the first batch moves) or the pool's
    scheduling rigidity. Use the actor path only for state that must NOT be
    shared process-wide or is expensive enough to need pool-size control
    (e.g. a real model hogging RAM)."""
    key = (prefix_bits, tok_hash_dim)
    actor = _TASK_STATE.get(key)
    if actor is None:
        actor = _TASK_STATE[key] = FeaturizeActor(prefix_bits, tok_hash_dim)
    return actor(batch)


def featurize(ds, cfg=None):
    """images Dataset -> features Dataset (schema engine.ops.schema.FEATURES)."""
    from engine.config import DEFAULT

    cfg = cfg or DEFAULT
    if getattr(cfg, "featurize_stateless", True):
        # batch_size intentionally UNSET: any explicit batch_size breaks
        # ReadParquet->MapBatches operator fusion, forcing the full decoded
        # input through the object store between the two operators
        # (measured: 8.6GB roundtrip, 21.4s fused vs 25-38s unfused at 32
        # CPUs). Whole-block batches are bounded by the input fragment
        # size, which TableIO.write keeps at ~32MB.
        return ds.map_batches(
            _featurize_task,
            fn_kwargs={"prefix_bits": cfg.phash_prefix_bits, "tok_hash_dim": cfg.tok_hash_dim},
            batch_format="pyarrow",
            zero_copy_batch=True,
            num_cpus=cfg.featurize_num_cpus,
        )
    return ds.map_batches(
        FeaturizeActor,
        fn_constructor_kwargs={"prefix_bits": cfg.phash_prefix_bits, "tok_hash_dim": cfg.tok_hash_dim},
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=cfg.featurize_batch_size,
        concurrency=cfg.featurize_concurrency,
        num_cpus=cfg.featurize_num_cpus,
    )
