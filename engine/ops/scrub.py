"""PII scrubbing and document chunking for training-data curation.

Both are embarrassingly-parallel `map_batches` transforms over the
documents table — no shuffle, so they stream at read speed at 100 TB.

PII scrub: redact emails, phone numbers and IPv4 addresses with fixed
placeholder tokens, plus per-doc redaction counts. Every pattern is RE2
syntax and every replacement is RE2 GlobalReplace, which is EXACTLY what
DuckDB's regexp_replace(..., 'g') runs — so the op carries a value-exact
SQL oracle (engine/queries_ml.py "pii_scrub"). Patterns compile once per
worker (callable class = actor-pool rule); the kernels are vectorized
Arrow compute calls, no per-document loop.

Chunking: split each document into fixed-size character windows with
overlap (the standard pre-tokenization chunker for embedding / training
pipelines). Chunk i of a doc covers characters [i*(size-overlap),
i*(size-overlap)+size); the last chunk may be short; every doc emits at
least one chunk (empty docs emit one empty chunk). Characters — not
bytes — so the DuckDB oracle is plain substr() arithmetic and the op is
value-exact under SQL. The per-batch kernel is vectorized by CHUNK RANK,
not by row: all rows' k-th chunks are sliced in one utf8_slice_codeunits
call, so the loop count is max_chunks_in_batch (tens), not num_rows.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

# RE2-compatible; DuckDB regexp_replace/regexp_extract_all use RE2 too,
# so engine and oracle share the exact match semantics (leftmost,
# non-overlapping, GlobalReplace scan-forward).
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PHONE_RE = r"\+?[0-9][0-9()\-. ]{6,}[0-9]"
IPV4_RE = r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b"

# applied IN ORDER; counting happens on the text as it stands when the
# pattern runs — emails first, then IPs, then phones (the phone pattern
# accepts digit/dot runs, so IPs must be redacted before it sees them).
# The SQL oracle nests in the identical order.
SCRUB_STEPS = (
    ("email", EMAIL_RE, "<EMAIL>"),
    ("ip", IPV4_RE, "<IP>"),
    ("phone", PHONE_RE, "<PHONE>"),
)


class PiiScrubber:
    """doc_id + text -> doc_id, scrubbed text, n_email/n_phone/n_ip."""

    def __init__(self, id_col: str = "doc_id", text_col: str = "text"):
        self.id_col, self.text_col = id_col, text_col

    def __call__(self, t: pa.Table) -> pa.Table:
        text = t[self.text_col]
        counts = {}
        for name, pat, repl in SCRUB_STEPS:
            counts[f"n_{name}"] = pc.cast(pc.count_substring_regex(text, pat), pa.int64())
            text = pc.replace_substring_regex(text, pat, repl)
        return pa.table({self.id_col: t[self.id_col], "text": text, **counts})


def pii_scrub(ds, id_col: str = "doc_id", text_col: str = "text"):
    from engine.ops.util import stage_task

    # stateless task + per-worker cache (engine/ops/util.py stage_task):
    # fuses with the read and skips per-query actor-pool startup
    return ds.map_batches(
        stage_task,
        fn_kwargs={"_stage_cls": PiiScrubber, "id_col": id_col, "text_col": text_col},
        batch_format="pyarrow",
        zero_copy_batch=True,
    )


def _chunk_batch(t: pa.Table, id_col: str, text_col: str,
                 size: int, step: int) -> pa.Table:
    text = t[text_col]
    if isinstance(text, pa.ChunkedArray):
        text = text.combine_chunks()
    lens = pc.utf8_length(text).to_numpy(zero_copy_only=False).astype(np.int64)
    # chunks start at 0, step, 2*step, ...; stop at the first chunk whose
    # window reaches the end of the doc:
    #   n_chunks = 1 + ceil(max(0, len - size) / step)
    n_chunks = 1 + (np.maximum(lens - size, 0) + step - 1) // step

    ids = t[id_col]
    if isinstance(ids, pa.ChunkedArray):
        ids = ids.combine_chunks()
    row_idx = np.repeat(np.arange(t.num_rows, dtype=np.int64), n_chunks)
    out_pos = np.cumsum(n_chunks) - n_chunks  # first output slot per row
    chunk_idx = np.arange(row_idx.size, dtype=np.int64) - np.repeat(out_pos, n_chunks)

    # vectorize by chunk rank: one utf8_slice_codeunits per rank k over
    # all docs that HAVE a k-th chunk
    out_text = np.empty(row_idx.size, dtype=object)
    max_k = int(n_chunks.max()) if t.num_rows else 0
    for k in range(max_k):
        rows = np.flatnonzero(n_chunks > k)
        sl = pc.utf8_slice_codeunits(text.take(pa.array(rows)),
                                     start=k * step, stop=k * step + size)
        out_text[out_pos[rows] + k] = sl.to_numpy(zero_copy_only=False)
    chunk_text = pa.array(out_text, type=pa.string())
    return pa.table({
        id_col: ids.take(pa.array(row_idx)),
        "chunk_idx": pa.array(chunk_idx),
        "chunk_text": chunk_text,
        "n_chunk_chars": pc.cast(pc.utf8_length(chunk_text), pa.int64()),
    })


def chunk_documents(ds, id_col: str = "doc_id", text_col: str = "text",
                    size: int = 512, overlap: int = 64):
    """One row per (doc, chunk): fixed-size char windows with overlap."""
    if not 0 <= overlap < size:
        raise ValueError(f"need 0 <= overlap < size, got {overlap=} {size=}")
    step = size - overlap
    return ds.map_batches(
        lambda t: _chunk_batch(t, id_col, text_col, size, step),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )


# ------------------------------------------------------- normalize_text --

# RE2 syntax throughout (pyarrow's replace_substring_regex and DuckDB's
# regexp_replace both run RE2): control chars out, whitespace runs to one
# space, then the at-most-one leading/trailing space off. \s in RE2 is
# ASCII [\t\n\f\r ] on both sides.
CONTROL_RE = r"[\x00-\x08\x0B\x0C\x0E-\x1F\x7F]"
WS_RUN_RE = r"\s+"
EDGE_SPACE_RE = r"^ | $"


class TextNormalizer:
    """doc_id + text -> doc_id, normalized text, n_chars.

    Strip control characters, collapse whitespace runs to single spaces,
    trim, optional lowercase — the standard cleanup pass before dedup /
    tokenization (whitespace variants otherwise defeat exact and n-gram
    dedup). Pure vectorized Arrow RE2 kernels, map-only (streams at read
    speed); value-exact DuckDB oracle via the identical nested
    regexp_replace chain."""

    def __init__(self, id_col: str = "doc_id", text_col: str = "text",
                 lowercase: bool = True):
        self.id_col, self.text_col, self.lowercase = id_col, text_col, lowercase

    def __call__(self, t: pa.Table) -> pa.Table:
        text = t[self.text_col]
        text = pc.replace_substring_regex(text, CONTROL_RE, "")
        text = pc.replace_substring_regex(text, WS_RUN_RE, " ")
        text = pc.replace_substring_regex(text, EDGE_SPACE_RE, "")
        if self.lowercase:
            text = pc.utf8_lower(text)
        return pa.table({self.id_col: t[self.id_col], "text": text,
                         "n_chars": pc.cast(pc.utf8_length(text), pa.int64())})


def normalize_text(ds, id_col: str = "doc_id", text_col: str = "text",
                   lowercase: bool = True):
    from engine.ops.util import stage_task

    return ds.map_batches(
        stage_task,
        fn_kwargs={"_stage_cls": TextNormalizer, "id_col": id_col,
                   "text_col": text_col, "lowercase": lowercase},
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
