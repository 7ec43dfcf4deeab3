"""Ray-Data-native as-of join + windowed feature-engineering engine.

A from-scratch reimagining of the reference repo
aakashrav/MolecularFeatureEngineering's per-entity descriptor-extraction +
clustering pipeline (SURVEY.md §1.2 concept map) as a point-in-time / as-of
join + windowed feature system over tables of image+caption pairs, built
Ray-Data-first: every stage is a `ray.data.Dataset` transform
(`map_batches` over zero-copy Arrow batches, actor pools for stateful
stages, explicit hash/salt partitioning for the wide steps).

NOTE ON CITATIONS: `/root/reference/` was empty at survey time
(SURVEY.md §0), so reference parity is discharged against the in-repo
sequential oracle (`engine/oracle.py`) and DuckDB SQL, per SURVEY.md §5.2.

This package never calls ``ray.init()`` — the driver / bench / tests own
the Ray session (driver contract, ``__ray_entry__.py``).
"""

__version__ = "0.1.0"

# Install the Ray 2.49 empty-block schema fixes: (1) hash-shuffle schema
# broadcast survives an empty first block (else 0-column partitions →
# ArrowInvalid in Dataset.join at high parallelism); (2) sort-exchange
# reduces keep the mapper schema for all-empty ranges (else 0-column
# blocks → executor "new schema: ." warnings and join crashes further
# downstream). Driver-side + per-reduce-worker, idempotent, no
# ray.init(). See engine/ray_patches.py for the full mechanism.
from engine.ray_patches import apply_empty_bundle_normalize_patch as _apply_warn_patch
from engine.ray_patches import apply_hash_shuffle_schema_patch as _apply_hs_patch
from engine.ray_patches import apply_sort_schema_patch as _apply_sort_patch

_apply_hs_patch()
_apply_sort_patch()
_apply_warn_patch()
