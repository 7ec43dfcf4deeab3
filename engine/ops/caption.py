"""Caption tokenizer + hashing-trick features (SURVEY.md §2.3 M5).

Tokenization spec (frozen): split on runs of whitespace, drop empties.
  n_tokens  = token count (int32)
  n_chars   = len(caption) in unicode code points (int32)
  tok_hash  = 64-bucket hashing-trick count vector, bucket =
              crc32(utf8(token)) % 64, L2-normalized (zero vector stays
              zero), float32

crc32 (zlib) is process-stable — Python's built-in hash() is randomized
per process and must never be used for partitioning or features.

Vectorization: the split runs in Arrow C
(pyarrow.compute.utf8_split_whitespace); only the per-token crc32 is a
Python loop, over the flattened token values of the whole batch (zlib
crc32 is C per call). Captions themselves pass through byte-equal
(input_hint invariant).
"""

from __future__ import annotations

import zlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

TOK_HASH_DIM = 64


def token_bucket(token: str, dim: int = TOK_HASH_DIM) -> int:
    return zlib.crc32(token.encode("utf-8")) % dim


def caption_features(captions: pa.Array | pa.ChunkedArray, dim: int = TOK_HASH_DIM):
    """-> (n_tokens int32, n_chars int32, tok_hash float32 (B, dim))."""
    if isinstance(captions, pa.ChunkedArray):
        captions = captions.combine_chunks()
    n = len(captions)
    n_chars = pc.utf8_length(captions).to_numpy(zero_copy_only=False).astype(np.int32)
    toks = pc.utf8_split_whitespace(captions)
    # drop empty tokens produced by leading/trailing/double whitespace
    flat = toks.flatten()
    keep = pc.greater(pc.utf8_length(flat), 0)
    offsets = toks.offsets.to_numpy(zero_copy_only=False)
    row_of_tok = np.repeat(np.arange(n), np.diff(offsets))
    keep_np = keep.to_numpy(zero_copy_only=False)
    row_of_tok = row_of_tok[keep_np]
    kept = flat.filter(keep)
    buckets = np.fromiter(
        (zlib.crc32(t.encode("utf-8")) % dim for t in kept.to_pylist()),
        dtype=np.int64,
        count=len(kept),
    ) if len(kept) else np.empty(0, np.int64)
    n_tokens = np.bincount(row_of_tok, minlength=n).astype(np.int32)
    mat = np.zeros((n, dim), dtype=np.float64)
    np.add.at(mat, (row_of_tok, buckets), 1.0)
    norm = np.linalg.norm(mat, axis=1)
    norm[norm == 0] = 1.0
    mat = (mat / norm[:, None]).astype(np.float32)
    return n_tokens, n_chars, mat


def _crc32_str(t: str, dim: int) -> int:
    return zlib.crc32(t.encode("utf-8")) % dim
