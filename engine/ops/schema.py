"""Frozen schemas + feature-vector column order (SURVEY.md §1.2, §2.3 M8/M9).

The reference had implicit CSV schemas; here every stage's input/output
schema is explicit, and the feature-vector flattening order is FROZEN —
it is the np.allclose comparison surface demanded by BASELINE.json
north_rule ("matching the reference's feature vectors ... at each
entity×timestamp").
"""

from __future__ import annotations

import pyarrow as pa

TOK_HASH_DIM = 64

IMAGES = pa.schema(
    [
        ("image_id", pa.string()),
        ("bytes", pa.binary()),
        ("w", pa.int32()),
        ("h", pa.int32()),
        ("fmt", pa.string()),
        ("caption", pa.string()),
        ("phash", pa.int64()),
    ]
)

# flat columns (nested structs stay Arrow-friendly but flat columns make
# the DuckDB/NumPy oracle compare trivial)
FEATURES = pa.schema(
    [
        ("image_id", pa.string()),
        ("phash", pa.int64()),
        ("phash_bucket", pa.int32()),
        ("w", pa.int32()),
        ("h", pa.int32()),
        ("aspect", pa.float64()),
        ("mean_r", pa.float64()),
        ("mean_g", pa.float64()),
        ("mean_b", pa.float64()),
        ("std_r", pa.float64()),
        ("std_g", pa.float64()),
        ("std_b", pa.float64()),
        ("entropy", pa.float64()),
        ("n_tokens", pa.int32()),
        ("n_chars", pa.int32()),
        ("tok_hash", pa.list_(pa.float32(), TOK_HASH_DIM)),
        ("caption", pa.string()),  # byte-equal passthrough (input_hint)
    ]
)

# FROZEN flattening order for feature_vec.fv (M8). Scalars first, then the
# 64 token-hash dims. Cluster features (bucket_size, centroid_dist) are
# appended by C3 when requested.
FV_SCALARS = [
    "w",
    "h",
    "aspect",
    "mean_r",
    "mean_g",
    "mean_b",
    "std_r",
    "std_g",
    "std_b",
    "entropy",
    "n_tokens",
    "n_chars",
]
FV_DIM = len(FV_SCALARS) + TOK_HASH_DIM  # 76

FEATURE_VEC = pa.schema(
    [
        ("image_id", pa.string()),
        ("fv", pa.list_(pa.float64(), FV_DIM)),
    ]
)


def validate(ds_schema: pa.Schema, expected: pa.Schema, where: str = "") -> None:
    """Plan-time schema guard (M9): expected must be a subset by (name, type)."""
    for f in expected:
        idx = ds_schema.get_field_index(f.name)
        if idx < 0:
            raise ValueError(f"{where}: missing column {f.name!r}; have {ds_schema.names}")
        got = ds_schema.field(idx).type
        if got != f.type:
            raise ValueError(f"{where}: column {f.name!r} is {got}, expected {f.type}")
