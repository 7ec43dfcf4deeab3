"""E2E golden run (SURVEY.md §5.2.5): the image flagship on the seed-42
fixture must keep producing the committed feature vectors. Catches any
semantic drift in decode/phash/stats/caption/cluster/normalize/assemble
across refactors."""

from pathlib import Path

import numpy as np
import pandas as pd

GOLDEN = Path(__file__).parent / "golden" / "flagship_fv_1k.parquet"


def test_flagship_matches_golden(ray_session):
    from engine.pipelines.flagship import image_flagship

    out = (image_flagship(1000, parallelism=8).to_pandas()
           .sort_values("image_id").reset_index(drop=True))
    got = np.stack(out["fv"].to_numpy())

    gold = pd.read_parquet(GOLDEN)
    assert list(out["image_id"]) == list(gold["image_id"])
    exp = np.stack(gold["fv"].apply(np.asarray).to_numpy())
    assert got.shape == exp.shape
    np.testing.assert_allclose(got, exp, rtol=0, atol=1e-8)
