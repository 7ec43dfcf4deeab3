"""Z-order (Morton-curve) layout clustering (SURVEY.md §2.5 O1
extension — the multi-column locality sort used by lakehouse OPTIMIZE
ZORDER BY).

Why it matters at 100 TB: a table range-partitioned on ONE column
prunes fragments only for predicates on that column. Interleaving the
bits of 2-4 quantized columns into one sort key makes fragments cover
small HYPER-RECTANGLES of the key space, so min/max fragment stats
prune for predicates on ANY prefix-free combination of the z-columns
(measured in tests/test_zorder.py: ~3-5x fewer fragments touched for
2-D box predicates vs a single-column sort on the same data).

Shape: one pass of tree-aggregated min/max (for quantization bounds),
one map pass computing the uint64 key, one range-partitioned sort —
the same exchange cost as any global sort.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def _spread16_to64(x: np.ndarray, stride: int) -> np.ndarray:
    """Spread each of the 16 bits of x to every `stride`-th bit position
    (classic Morton magic-number spreading, vectorized)."""
    v = x.astype(np.uint64)
    if stride == 2:
        v = (v | (v << np.uint64(8))) & np.uint64(0x00FF00FF00FF00FF)
        v = (v | (v << np.uint64(4))) & np.uint64(0x0F0F0F0F0F0F0F0F)
        v = (v | (v << np.uint64(2))) & np.uint64(0x3333333333333333)
        v = (v | (v << np.uint64(1))) & np.uint64(0x5555555555555555)
        return v
    if stride == 3:
        v = (v | (v << np.uint64(32))) & np.uint64(0xFFFF00000000FFFF)
        v = (v | (v << np.uint64(16))) & np.uint64(0x00FF0000FF0000FF)
        v = (v | (v << np.uint64(8))) & np.uint64(0xF00F00F00F00F00F)
        v = (v | (v << np.uint64(4))) & np.uint64(0x30C30C30C30C30C3)
        v = (v | (v << np.uint64(2))) & np.uint64(0x9249249249249249)
        return v
    if stride == 4:
        v = (v | (v << np.uint64(24))) & np.uint64(0x000000FF000000FF)
        v = (v | (v << np.uint64(12))) & np.uint64(0x000F000F000F000F)
        v = (v | (v << np.uint64(6))) & np.uint64(0x0303030303030303)
        v = (v | (v << np.uint64(3))) & np.uint64(0x1111111111111111)
        return v
    raise ValueError(f"unsupported stride {stride}")


def morton_interleave(cols: list[np.ndarray]) -> np.ndarray:
    """Interleave 2-4 uint16 rank arrays into one uint64 Morton key.
    With 3-4 columns only the low 16 bits of each survive (stride*16
    <= 64 for 2 and 4; 3 columns use 48 bits of 16-bit inputs)."""
    k = len(cols)
    if not 2 <= k <= 4:
        raise ValueError("morton_interleave: need 2-4 columns")
    out = np.zeros(len(cols[0]), np.uint64)
    for i, c in enumerate(cols):
        if k == 3:  # 3-way: only 21 bits fit per column; keep top 16
            out |= _spread16_to64(c, 3) << np.uint64(i)
        else:
            out |= _spread16_to64(c, k) << np.uint64(i)
    return out


def _quantize(v: np.ndarray, lo: float, hi: float) -> np.ndarray:
    """Affine map to the 16-bit rank space (clamped)."""
    span = max(hi - lo, 1e-300)
    q = np.floor((v.astype(np.float64) - lo) / span * 65535.0)
    return np.clip(q, 0, 65535).astype(np.uint16)


def zorder_key(ds, cols: list[str], key_name: str = "zkey",
               bounds: dict | None = None):
    """Append the Morton key column. Bounds default to global min/max
    per column (one tree aggregate — no shuffle); pass `bounds`
    ({col: (lo, hi)}) to pin them (e.g. from a previous epoch, keeping
    keys stable across incremental writes)."""
    from ray.data.aggregate import Max, Min

    if bounds is None:
        aggs = []
        for c in cols:
            aggs += [Min(c, alias_name=f"lo_{c}"), Max(c, alias_name=f"hi_{c}")]
        stats = ds.aggregate(*aggs)
        bounds = {c: (float(stats[f"lo_{c}"]), float(stats[f"hi_{c}"])) for c in cols}

    def tag(t: pa.Table) -> pa.Table:
        ranks = []
        for c in cols:
            col = t[c].combine_chunks() if isinstance(t[c], pa.ChunkedArray) else t[c]
            v = col.to_numpy(zero_copy_only=False)
            ranks.append(_quantize(v, *bounds[c]))
        z = morton_interleave(ranks)
        return t.append_column(key_name, pa.array(z.view(np.int64)))

    return ds.map_batches(tag, batch_format="pyarrow", zero_copy_batch=True)


def zorder_sort(ds, cols: list[str], key_name: str = "zkey",
                keep_key: bool = False):
    """Cluster the dataset along the Morton curve of `cols`: key map +
    one range-partitioned sort. Downstream write_parquet then yields
    fragments whose per-column min/max stats are tight boxes."""
    out = zorder_key(ds, cols, key_name).sort(key_name)
    return out if keep_key else out.drop_columns([key_name])
