"""Distributed one-pass PCA: NumPy parity, partition invariance,
variance recovery."""

import numpy as np
import pandas as pd

from engine.ops.pca import _fix_signs, pca_fit, pca_transform

D = 16


def _data(n=400, seed=3):
    rng = np.random.default_rng(seed)
    # anisotropic gaussian: two dominant directions
    scales = np.array([10.0, 5.0] + [0.5] * (D - 2))
    basis = np.linalg.qr(rng.normal(size=(D, D)))[0]
    pts = rng.normal(size=(n, D)) * scales @ basis.T + rng.normal(size=D)
    return pd.DataFrame({"vec_id": np.arange(n),
                         "embedding": [r.astype(np.float32) for r in pts]})


def _numpy_pca(m, k):
    mu = m.mean(axis=0)
    cov = np.cov(m - mu, rowvar=False, ddof=1)
    evals, evecs = np.linalg.eigh(cov)
    order = np.argsort(evals)[::-1][:k]
    return _fix_signs(evecs[:, order].T), mu, evals[order]


def test_pca_matches_numpy_and_partition_invariant(ray_session):
    import ray.data as rd

    df = _data()
    m = np.stack(df["embedding"].to_numpy()).astype(np.float64)
    ref_c, ref_mu, ref_ev = _numpy_pca(m, 3)

    for P in (1, 7):
        comps, mu, ev = pca_fit(rd.from_pandas(df).repartition(P), k=3)
        np.testing.assert_allclose(mu, ref_mu, atol=1e-9)
        np.testing.assert_allclose(ev, ref_ev, rtol=1e-9)
        np.testing.assert_allclose(comps, ref_c, atol=1e-8)

    # the two planted dominant directions carry nearly all variance
    assert ev[0] > ev[1] > ev[2]
    assert (ev[0] + ev[1]) / np.trace(np.cov(m, rowvar=False)) > 0.95

    out = pca_transform(rd.from_pandas(df).repartition(4), comps, mu) \
        .to_pandas().sort_values("vec_id")
    proj = np.stack(out["pca"].to_numpy())
    ref_proj = np.round((m - ref_mu) @ ref_c.T, 6)
    np.testing.assert_allclose(proj, ref_proj, atol=1e-6)
    # projections are centered and decorrelated
    assert np.abs(proj.mean(axis=0)).max() < 1e-3
    cc = np.corrcoef(proj, rowvar=False)
    assert np.abs(cc - np.eye(3)).max() < 0.05


def test_pca_rejects_tiny_input(ray_session):
    import pytest
    import ray.data as rd

    df = _data(n=1)
    with pytest.raises(ValueError, match=">= 2 rows"):
        pca_fit(rd.from_pandas(df), k=2)
