"""Featurize stage vs fixture ground truth + sequential oracle (SURVEY §5.2.1)."""

import numpy as np
import pandas as pd
import pyarrow as pa

from engine import oracle
from engine.ops import schema as S
from engine.ops.assemble import assemble_batch
from engine.ops.decode import FeaturizeActor


def _featurized(images_1k) -> pa.Table:
    return FeaturizeActor()(images_1k)


def test_phash_matches_fixture_column(images_1k):
    """decode(bytes) -> phash must reproduce the generator's stored phash
    exactly (exactness oracle; exercises decoder + resize + DCT)."""
    out = _featurized(images_1k)
    assert out["phash"].to_pylist() == images_1k["phash"].to_pylist()


def test_caption_byte_equal_passthrough(images_1k):
    out = _featurized(images_1k)
    assert out["caption"].to_pylist() == images_1k["caption"].to_pylist()


def test_features_match_sequential_oracle(images_1k):
    out = _featurized(images_1k).to_pandas()
    exp = oracle.oracle_featurize(images_1k)
    assert list(out["image_id"]) == list(exp["image_id"])
    assert list(out["phash"]) == list(exp["phash"])
    assert list(out["phash_bucket"]) == list(exp["phash_bucket"])
    for col in ["w", "h", "n_tokens", "n_chars"]:
        assert (out[col].to_numpy() == exp[col].to_numpy()).all(), col
    for col in ["aspect", "mean_r", "mean_g", "mean_b", "std_r", "std_g", "std_b", "entropy"]:
        np.testing.assert_allclose(out[col].to_numpy(), exp[col].to_numpy(), rtol=1e-12, err_msg=col)
    got_th = np.stack(out["tok_hash"].to_numpy())
    exp_th = np.stack(exp["tok_hash"].to_numpy())
    np.testing.assert_allclose(got_th, exp_th, rtol=1e-6)


def test_feature_vec_assembly(images_1k):
    feats = _featurized(images_1k)
    fv_tab = assemble_batch(feats)
    assert fv_tab.schema.field("fv").type == pa.list_(pa.float64(), S.FV_DIM)
    got = np.stack(fv_tab["fv"].to_numpy(zero_copy_only=False))
    exp = oracle.oracle_feature_vec(oracle.oracle_featurize(images_1k))
    np.testing.assert_allclose(got, exp, rtol=1e-6, atol=1e-9)


def test_featurize_distributed_matches_local(ray_session, images_1k):
    """Ray actor-pool path == single-process path, any partitioning."""
    import ray.data as rd

    from engine.ops.decode import featurize

    ds = rd.from_arrow(images_1k).repartition(7)
    out = featurize(ds).to_pandas().sort_values("image_id").reset_index(drop=True)
    exp = _featurized(images_1k).to_pandas().sort_values("image_id").reset_index(drop=True)
    assert (out["phash"] == exp["phash"]).all()
    np.testing.assert_allclose(
        np.stack(out["tok_hash"].to_numpy()), np.stack(exp["tok_hash"].to_numpy()), rtol=1e-6
    )
    np.testing.assert_allclose(out["entropy"].to_numpy(), exp["entropy"].to_numpy(), rtol=1e-12)
