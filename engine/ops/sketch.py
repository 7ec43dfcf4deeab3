"""Cardinality sketch: HyperLogLog as a custom Ray AggregateFnV2
(SURVEY.md §2.5 A7 / §2.6 X1 extension surface).

Classic HLL (Flajolet et al. 2007, public algorithm): hash each value to
64 bits, use the low ``p`` bits as the register index and the position of
the first set bit of the remaining 64-p bits as the register candidate;
registers combine with elementwise max, so the accumulator is a fixed
2^p-byte array — constant-size per block and per combine, which is what
makes this shippable through Ray's partial/final aggregation tree at any
scale (exact distinct needs a full shuffle; this needs ~KBs).

Standard error ≈ 1.04 / sqrt(2^p): p=12 -> ~1.6%.
"""

from __future__ import annotations

import numpy as np

from ray.data.aggregate import AggregateFnV2

from engine.ops.keys import stable_hash

_ALPHA = {16: 0.673, 32: 0.697, 64: 0.709}


def _alpha(m: int) -> float:
    return _ALPHA.get(m, 0.7213 / (1 + 1.079 / m))


def _registers_for(values, p: int) -> np.ndarray:
    h = stable_hash(values)  # uint64, same hash everywhere in the engine
    idx = (h & np.uint64((1 << p) - 1)).astype(np.int64)
    rest = ((h >> np.uint64(p)) | np.uint64(1 << (64 - p))).astype(np.uint64)  # sentinel caps rho
    # rho = 1-based position of the lowest set bit (geometric with P(k)=2^-k
    # on a uniform hash, same distribution HLL needs); isolate it with
    # v & -v, exact log2 since it's a power of two
    low = (rest & (~rest + np.uint64(1))).astype(np.float64)
    rho = (np.log2(low) + 1).astype(np.uint8)
    regs = np.zeros(1 << p, dtype=np.uint8)
    np.maximum.at(regs, idx, rho)
    return regs


def _estimate(regs: np.ndarray) -> float:
    m = len(regs)
    est = _alpha(m) * m * m / np.sum(np.exp2(-regs.astype(np.float64)))
    if est <= 2.5 * m:  # small-range correction
        zeros = int(np.count_nonzero(regs == 0))
        if zeros:
            est = m * np.log(m / zeros)
    return float(est)


class ApproxDistinct(AggregateFnV2):
    """groupby(...).aggregate(ApproxDistinct(on="col")) -> ~distinct count.

    Accumulator = 2^p uint8 registers; combine = elementwise max."""

    def __init__(self, on: str | None = None, p: int = 12,
                 alias_name: str | None = None, ignore_nulls: bool = True):
        self._p = p
        super().__init__(alias_name or f"approx_distinct({on})",
                         zero_factory=lambda: np.zeros(1 << p, dtype=np.uint8),
                         on=on, ignore_nulls=ignore_nulls)

    def aggregate_block(self, block):
        import pandas as pd
        import pyarrow as pa

        col = block[self._target_col_name]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        if self._ignore_nulls:
            col = col.drop_null() if isinstance(col, pa.Array) else pd.Series(col).dropna()
        if len(col) == 0:
            return np.zeros(1 << self._p, dtype=np.uint8)
        return _registers_for(col, self._p)

    def combine(self, current, new):
        return np.maximum(np.asarray(current, dtype=np.uint8),
                          np.asarray(new, dtype=np.uint8))

    def finalize(self, accumulator):
        return int(round(_estimate(np.asarray(accumulator, dtype=np.uint8))))


def approx_distinct(ds, col: str, p: int = 12) -> int:
    """Global approximate distinct count (one tree aggregate, no shuffle)."""
    return ds.aggregate(ApproxDistinct(on=col, p=p, alias_name="nd"))["nd"]
