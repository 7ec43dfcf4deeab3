"""PipelineConfig — engine-wide tunables (SURVEY.md §2.1 R9 recast).

The reference kept its constants (paths, DBSCAN eps/min_pts, variance
threshold) as module globals; here they are one explicit dataclass that
every pipeline entry point threads through, so a 100 TB run can be retuned
without code edits.
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field


def _default_parallelism() -> int:
    """Partition count for hash shuffles: >=4x cores so work-stealing
    evens out stragglers (SURVEY.md §4.1/§4.2)."""
    return max(4 * (os.cpu_count() or 8), 32)


@dataclass
class PipelineConfig:
    # --- featurize stage (SURVEY.md §4.3) ---
    featurize_batch_size: int = 256          # actor path only; stateless path uses whole blocks (fusion)
    featurize_stateless: bool = True         # module-cached state in tasks (no actor-pool startup)
    featurize_concurrency: tuple = (2, 8)    # actor-pool autoscale bounds (featurize_stateless=False)
    featurize_num_cpus: float = 1.0

    # --- shuffle / partitioning (SURVEY.md §4.2) ---
    num_partitions: int = field(default_factory=_default_parallelism)
    salt_threshold: float = 2.0              # bucket > threshold x mean rows -> salted
    max_salt: int = 16

    # --- clustering (reference R6 recast, SURVEY.md §2.6) ---
    phash_prefix_bits: int = 16              # bucket = top-16 bits of phash
    hamming_radius: int = 3                  # per-bucket refine radius (C2)

    # --- normalization / degenerate features (reference R4/R5) ---
    degenerate_std_eps: float = 1e-12

    # --- windows ---
    session_gap_us: int = 24 * 3600 * 1_000_000   # 24h gap => new session
    rolling_window_us: int = 24 * 3600 * 1_000_000

    # --- caption features ---
    tok_hash_dim: int = 64

    # --- io ---
    target_rows_per_fragment: int = 250_000


DEFAULT = PipelineConfig()
