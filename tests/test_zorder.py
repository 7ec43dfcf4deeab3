"""Oracles for engine/ops/zorder.py: Morton interleave vs a slow
bit-loop reference, key partition-invariance, and the actual pruning
claim — z-ordered fragments touch far fewer fragments for 2-D box
predicates than a single-column sort of the same data."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest


def _slow_morton(cols):
    k = len(cols)
    n = len(cols[0])
    out = np.zeros(n, np.uint64)
    for row in range(n):
        acc = 0
        for bit in range(16):
            for i, c in enumerate(cols):
                acc |= ((int(c[row]) >> bit) & 1) << (bit * k + i)
        out[row] = acc
    return out


@pytest.mark.parametrize("k", [2, 3, 4])
def test_interleave_matches_bit_loop(k):
    from engine.ops.zorder import morton_interleave

    rng = np.random.default_rng(k)
    cols = [rng.integers(0, 65536, 200).astype(np.uint16) for _ in range(k)]
    got = morton_interleave(cols)
    want = _slow_morton(cols)
    if k == 3:  # 3-way spreads 16 bits across 48 positions, same layout
        np.testing.assert_array_equal(got, want)
    else:
        np.testing.assert_array_equal(got, want)


def test_zorder_key_partition_invariant(ray_session):
    import ray.data as rd

    from engine.ops.zorder import zorder_key

    rng = np.random.default_rng(9)
    t = pa.table({"id": np.arange(4000, dtype=np.int64),
                  "x": rng.uniform(0, 100, 4000),
                  "y": rng.uniform(-50, 50, 4000)})
    a = zorder_key(rd.from_arrow(t), ["x", "y"]).to_pandas().sort_values("id")
    b = zorder_key(rd.from_arrow(t).repartition(11), ["x", "y"]).to_pandas().sort_values("id")
    assert (a["zkey"].to_numpy() == b["zkey"].to_numpy()).all()


def test_zorder_prunes_nonsort_column(ray_session):
    """The actual claim behind ZORDER BY: fragment min/max stats prune
    on EVERY z-column, not just the first. Split the sorted table into
    64 equal fragments; for narrow slabs on y (the column a linear
    x-sort cannot prune at all — every fragment spans all of y), the
    z-order layout must touch at most half the fragments the x-sort
    touches. Sanity side-check: on x-slabs the linear sort stays better
    (it is optimal for its own column), but z-order still prunes."""
    import ray.data as rd

    from engine.ops.zorder import zorder_sort

    rng = np.random.default_rng(42)
    n = 40_000
    t = pa.table({"x": rng.uniform(0, 1, n), "y": rng.uniform(0, 1, n)})

    def frags_touched(df, boxes, nfrag=64):
        m = len(df) // nfrag
        touched = []
        for (x0, x1, y0, y1) in boxes:
            cnt = 0
            for f in range(nfrag):
                part = df.iloc[f * m:(f + 1) * m]
                if (part["x"].min() <= x1 and part["x"].max() >= x0
                        and part["y"].min() <= y1 and part["y"].max() >= y0):
                    cnt += 1
            touched.append(cnt)
        return np.mean(touched)

    y_slabs = [(0.0, 1.0, y, y + 0.05) for y in rng.uniform(0, 0.95, 10)]
    x_slabs = [(x, x + 0.05, 0.0, 1.0) for x in rng.uniform(0, 0.95, 10)]
    z = zorder_sort(rd.from_arrow(t), ["x", "y"]).to_pandas()
    lin = t.to_pandas().sort_values("x").reset_index(drop=True)
    tz_y, tl_y = frags_touched(z, y_slabs), frags_touched(lin, y_slabs)
    assert tl_y == 64  # linear layout cannot prune on y at all
    assert tz_y * 2 <= tl_y, (tz_y, tl_y)
    tz_x = frags_touched(z, x_slabs)
    assert tz_x < 64  # z-order still prunes on x too


def test_zorder_sort_is_permutation(ray_session):
    import ray.data as rd

    from engine.ops.zorder import zorder_sort

    rng = np.random.default_rng(1)
    t = pa.table({"x": rng.uniform(0, 1, 1000), "y": rng.uniform(0, 1, 1000)})
    out = zorder_sort(rd.from_arrow(t), ["x", "y"]).to_pandas()
    assert len(out) == 1000
    assert np.allclose(np.sort(out["x"]), np.sort(t["x"].to_numpy()))
    assert set(out.columns) == {"x", "y"}  # key dropped by default
