"""Scalar function catalog (SURVEY.md §2.6 F*): string / date / math /
array / json kernels, all vectorized (pyarrow.compute or NumPy) for use
inside map_batches. Each has a direct SQL equivalent noted for the
DuckDB oracle harness.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

# ----------------------------------------------------------- strings ----

def str_lower(arr):          # SQL: lower(x)
    return pc.utf8_lower(arr)


def str_length(arr):         # SQL: length(x)
    return pc.utf8_length(arr)


def str_token_count(arr):    # SQL: array_length(string_split_regex(trim(x), '\s+'))
    toks = pc.utf8_split_whitespace(arr)
    flat_nonempty = pc.greater(pc.utf8_length(toks.combine_chunks().flatten() if isinstance(toks, pa.ChunkedArray) else toks.flatten()), 0)
    t = toks.combine_chunks() if isinstance(toks, pa.ChunkedArray) else toks
    offsets = t.offsets.to_numpy(zero_copy_only=False)
    row = np.repeat(np.arange(len(t)), np.diff(offsets))
    keep = flat_nonempty.to_numpy(zero_copy_only=False)
    return pa.array(np.bincount(row[keep], minlength=len(t)).astype(np.int64))


def str_contains(arr, pat):  # SQL: x LIKE '%pat%' (literal)
    return pc.match_substring(arr, pat)


# ------------------------------------------------------------- dates ----

def date_trunc_day(arr):     # SQL: date_trunc('day', ts)
    return pc.floor_temporal(arr, unit="day")


def date_trunc_hour(arr):    # SQL: date_trunc('hour', ts)
    return pc.floor_temporal(arr, unit="hour")


def ts_diff_seconds(a, b):   # SQL: date_diff('second', b, a)
    return pc.divide(pc.cast(pc.subtract(a, b), pa.int64()), 1_000_000)


def ts_bucket(arr, width_us: int):
    """Epoch-bucket index. SQL: CAST(floor(epoch_us(ts) / width) AS BIGINT)."""
    us = pc.cast(arr, pa.int64())
    return pc.cast(pc.floor(pc.divide(us, float(width_us))), pa.int64())


# -------------------------------------------------------------- math ----

def safe_div(a, b):          # SQL: CASE WHEN b = 0 THEN NULL ELSE a / b END
    bz = pc.if_else(pc.equal(b, 0), pa.nulls(len(b), type=pa.float64()), pc.cast(b, pa.float64()))
    return pc.divide(pc.cast(a, pa.float64()), bz)


def log1p(arr):              # SQL: ln(1 + x)
    return pc.ln(pc.add(pc.cast(arr, pa.float64()), 1.0))


def clip(arr, lo, hi):       # SQL: least(greatest(x, lo), hi)
    return pc.min_element_wise(pc.max_element_wise(pc.cast(arr, pa.float64()), lo), hi)


# ------------------------------------------------------------- array ----

def _mat(arr):
    a = arr.combine_chunks() if isinstance(arr, pa.ChunkedArray) else arr
    if pa.types.is_fixed_size_list(a.type):
        dim = a.type.list_size
        return a.flatten().to_numpy(zero_copy_only=False).astype(np.float64).reshape(-1, dim)
    off = a.offsets.to_numpy(zero_copy_only=False)
    widths = np.unique(np.diff(off))
    if len(widths) != 1:
        raise ValueError("ragged list column; expected fixed-width vectors")
    return a.flatten().to_numpy(zero_copy_only=False).astype(np.float64).reshape(-1, int(widths[0]))


def l2norm(arr):             # SQL: sqrt(sum of squares over unnest)
    return pa.array(np.linalg.norm(_mat(arr), axis=1))


def vec_dot(arr, q: np.ndarray):
    return pa.array(_mat(arr) @ np.asarray(q, dtype=np.float64))


def vec_mean(arr):           # SQL: list avg
    return pa.array(_mat(arr).mean(axis=1))


def histogram_counts(arr, edges: np.ndarray):
    m = _mat(arr)
    out = np.stack([np.histogram(row, bins=edges)[0] for row in m])
    return pa.FixedSizeListArray.from_arrays(pa.array(out.reshape(-1), type=pa.int64()), out.shape[1])


# -------------------------------------------------------------- json ----

_JSON_INT = r'"%s"\s*:\s*(?P<v>-?\d+)'


def json_get_int(arr, key: str):
    """Extract an int field from a flat JSON string column — vectorized
    via Arrow's extract_regex (covers the common {"k": 1} telemetry
    shape; full JSON goes through stdlib json in a map stage).
    SQL: CAST(json_extract(x, '$.key') AS BIGINT)."""
    ex = pc.extract_regex(arr, _JSON_INT % key)
    return pc.cast(pc.struct_field(ex, ["v"]), pa.int64())
