"""Global normalize + degenerate-feature pruning (A3/A4, reference R4/R5)."""

import numpy as np
import pytest

from engine.ops.assemble import assemble
from engine.ops.decode import FeaturizeActor
from engine.ops.normalize import fv_moments, normalize_fv


def test_moments_match_numpy(ray_session, images_1k):
    import ray.data as rd

    feats = FeaturizeActor()(images_1k)
    fv_ds = assemble(rd.from_arrow(feats).repartition(5))
    mean, std, n = fv_moments(fv_ds)
    from engine import oracle

    exp = oracle.oracle_feature_vec(oracle.oracle_featurize(images_1k))
    assert n == len(exp)
    np.testing.assert_allclose(mean, exp.mean(axis=0), rtol=1e-9)
    np.testing.assert_allclose(std, exp.std(axis=0), rtol=1e-7, atol=1e-12)


def test_normalize_drops_degenerate_and_zscores(ray_session, images_1k):
    import ray.data as rd

    feats = FeaturizeActor()(images_1k)
    fv_ds = assemble(rd.from_arrow(feats).repartition(3))
    out_ds, kept = normalize_fv(fv_ds)
    got = out_ds.to_pandas().sort_values("image_id")
    mat = np.stack(got["fv"].to_numpy())
    from engine import oracle

    exp_full = oracle.oracle_feature_vec(
        oracle.oracle_featurize(images_1k)
    )
    order = np.argsort(
        oracle.oracle_featurize(images_1k)["image_id"].to_numpy()
    )
    exp_full = exp_full[order]
    std = exp_full.std(axis=0)
    exp_kept = np.flatnonzero(std > 1e-12)
    np.testing.assert_array_equal(kept, exp_kept)
    z = (exp_full[:, exp_kept] - exp_full[:, exp_kept].mean(axis=0)) / exp_full[:, exp_kept].std(axis=0)
    np.testing.assert_allclose(mat, z, rtol=1e-6, atol=1e-9)
    # z-scored: per-dim mean ~ 0, std ~ 1
    np.testing.assert_allclose(mat.mean(axis=0), 0.0, atol=1e-9)
    np.testing.assert_allclose(mat.std(axis=0), 1.0, rtol=1e-9)
