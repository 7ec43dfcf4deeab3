"""Oracles for engine/ops/transform.py: box-mean resize vs a block-mean
NumPy oracle, crop/flip round-trips through the lossless codecs,
caption/byte passthrough, and planted-pair image near-dup."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest


def test_area_resize_exact_block_mean():
    from engine.ops.transform import area_resize

    rng = np.random.default_rng(0)
    img = rng.integers(0, 256, (64, 48, 3)).astype(np.uint8)
    out = area_resize(img, 32, 24)
    # 2x2 block mean, exactly
    want = img.astype(np.float64).reshape(32, 2, 24, 2, 3).mean(axis=(1, 3))
    np.testing.assert_allclose(out, want)


def test_center_crop_and_flip():
    from engine.ops.transform import center_crop, hflip

    img = np.arange(6 * 8 * 3, dtype=np.uint8).reshape(6, 8, 3)
    c = center_crop(img, 4, 4)
    assert c.shape == (4, 4, 3)
    np.testing.assert_array_equal(c, img[1:5, 2:6])
    np.testing.assert_array_equal(hflip(img), img[:, ::-1])
    with pytest.raises(ValueError):
        center_crop(img, 10, 2)


def test_transform_stage_roundtrip(ray_session, images_1k):
    """Pipeline output re-decodes to exactly the NumPy-applied transform
    (ppm is lossless), captions/ids pass through byte-equal."""
    import ray.data as rd

    from engine.fixtures import codecs
    from engine.ops.transform import area_resize, to_uint8, transform_images

    src = rd.from_arrow(images_1k).limit(40)
    out = transform_images(src, resize=(32, 32), flip=True,
                           out_fmt="ppm").to_pandas().set_index("image_id")
    inp = images_1k.to_pandas().set_index("image_id").loc[out.index]
    for iid, row in out.iterrows():
        orig = codecs.decode(inp.loc[iid, "bytes"], inp.loc[iid, "fmt"],
                             int(inp.loc[iid, "w"]), int(inp.loc[iid, "h"]))
        want = to_uint8(area_resize(orig, 32, 32))[:, ::-1]
        got = codecs.decode(row["bytes"], row["fmt"], int(row["w"]), int(row["h"]))
        np.testing.assert_array_equal(got, want)
        assert row["caption"] == inp.loc[iid, "caption"]  # byte-equal passthrough
        assert (row["w"], row["h"], row["fmt"]) == (32, 32, "ppm")


def test_transform_crop_after_resize(ray_session, images_1k):
    import ray.data as rd

    from engine.ops.transform import transform_images

    src = rd.from_arrow(images_1k).limit(10)
    out = transform_images(src, resize=(48, 48), crop=(32, 24)).to_pandas()
    assert (out["h"] == 32).all() and (out["w"] == 24).all()
    assert all(len(b) > 0 for b in out["bytes"])


def test_image_near_dup_planted(ray_session):
    """Pairs within Hamming<=3 of planted phashes are found; a pair at
    Hamming 4 spread 1-bit-per-band has no shared band and is (per LSH
    semantics) not a candidate; a 5-bit same-band pair is a candidate
    but must be rejected by the exact verify."""
    import ray.data as rd

    from engine.ops.transform import image_near_dup

    # four well-separated base hashes (pairwise Hamming far above 3 in
    # every band) so only the planted within-group structure matters
    ba = np.int64(0x1234_5678_9ABC_DEF0)
    bb = np.int64(-0x5ED2_43A1_0F5C_A311)
    bc = np.int64(0x0F0F_1357_ACE2_4680)
    bd = np.int64(0x7E1D_B00C_55AA_33CC)
    rows = {
        "image_id": ["a", "a2", "b", "b2", "c", "c2", "d", "d2"],
        "phash": np.array([
            ba, ba,                                  # exact dup (ham 0)
            bb ^ 0b111, bb,                          # ham 3 -> found
            bc ^ np.int64(0x0001_0001_0001_0001), bc,  # 1 bit/band, ham 4 -> no shared band
            bd ^ np.int64(0x1F), bd,                 # ham 5 in one band -> candidate, verify rejects
        ], dtype=np.int64),
    }
    ds = rd.from_arrow(pa.table(rows))
    pairs = image_near_dup(ds, max_hamming=3).to_pandas()
    got = {tuple(sorted(p)) for p in zip(pairs["a"], pairs["b"])}
    assert ("a", "a2") in got
    assert ("b", "b2") in got
    assert ("c", "c2") not in got
    assert ("d", "d2") not in got
    assert pairs[pairs["a"].isin(["a", "a2"])]["hamming"].iloc[0] == 0
