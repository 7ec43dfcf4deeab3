"""Zero-temporal-leakage property (BASELINE.json north_rule): perturbing
any right-side row with ts > t must leave the (entity, t) output
bit-identical; perturbing a row with ts <= t must be able to change it."""

import numpy as np
import pandas as pd

from engine.ops.asof import asof_join


def _run(ray_session, right_df, strict=False):
    import ray.data as rd

    left = rd.from_pandas(
        pd.DataFrame({
            "e": ["a", "a", "b"],
            "ts": pd.to_datetime(["2024-01-05", "2024-01-10", "2024-01-05"]),
        })
    )
    out = (
        asof_join(left, rd.from_pandas(right_df), on="e", right_cols=["v"], strict=strict,
                  num_partitions=3)
        .to_pandas()
        .sort_values(["e", "ts"])
        .reset_index(drop=True)
    )
    return out


def _right(vals):
    return pd.DataFrame({
        "e": ["a", "a", "a", "b"],
        "ts": pd.to_datetime(["2024-01-01", "2024-01-07", "2024-01-20", "2024-01-04"]),
        "v": vals,
    })


def test_future_rows_never_leak(ray_session):
    base = _run(ray_session, _right([1.0, 2.0, 3.0, 4.0]))
    # perturb ONLY the future row (2024-01-20 > every left ts)
    pert = _run(ray_session, _right([1.0, 2.0, 999.0, 4.0]))
    pd.testing.assert_frame_equal(base, pert)
    # sanity: left(a, 01-05) saw the 01-01 row, left(a, 01-10) saw 01-07
    assert list(base["v_r"]) == [1.0, 2.0, 4.0]


def test_past_rows_do_influence(ray_session):
    base = _run(ray_session, _right([1.0, 2.0, 3.0, 4.0]))
    pert = _run(ray_session, _right([7.0, 2.0, 3.0, 4.0]))
    assert pert["v_r"].iloc[0] == 7.0 and base["v_r"].iloc[0] == 1.0


def test_strict_excludes_same_instant(ray_session):
    """strict=True: a right row AT the left timestamp must not leak."""
    right = pd.DataFrame({
        "e": ["a", "a"],
        "ts": pd.to_datetime(["2024-01-01", "2024-01-05"]),
        "v": [1.0, 5.0],
    })
    out = _run(ray_session, right, strict=True)
    # left (a, 01-05): strict -> must see 01-01 row, not the 01-05 row
    assert out["v_r"].iloc[0] == 1.0
    out2 = _run(ray_session, right, strict=False)
    assert out2["v_r"].iloc[0] == 5.0


def test_backfill_grid_zero_leakage(ray_session):
    """Forward-fill at grid points: future observation edits don't change
    past grid values."""
    import ray.data as rd

    from engine.ops.backfill import backfill

    def run(v_future):
        feats = rd.from_pandas(pd.DataFrame({
            "e": ["x", "x"],
            "ts": pd.to_datetime(["2024-01-01", "2024-03-01"]),
            "f": [10.0, v_future],
        }))
        grid = rd.from_pandas(pd.DataFrame({
            "e": ["x"] * 3,
            "ts": pd.to_datetime(["2024-01-02", "2024-01-15", "2024-02-01"]),
        }))
        return backfill(grid, feats, on="e", feature_cols=["f"], num_partitions=2).to_pandas().sort_values("ts")

    a, b = run(20.0), run(-999.0)
    np.testing.assert_array_equal(a["f_r"].to_numpy(), b["f_r"].to_numpy())
    assert (a["f_r"] == 10.0).all()
