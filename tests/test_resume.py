"""Kill/resume + lineage + TableIO round-trip (SURVEY §5.2.4, north_rule)."""

import json
from pathlib import Path

import numpy as np
import pandas as pd
import pytest

from engine.io.table_io import TableIO
from engine.lineage import Lineage
from engine.pipelines.run import plan_partitions, read_output, run_resumable


@pytest.fixture()
def images_table_uri(ray_session, images_1k, tmp_path):
    import ray.data as rd

    uri = str(tmp_path / "images")
    TableIO.write(rd.from_arrow(images_1k).repartition(8), uri)
    return uri


def _transform(ds):
    from engine.ops.decode import FeaturizeActor

    return ds.map_batches(FeaturizeActor, batch_format="pyarrow", concurrency=1, batch_size=128)


def test_tableio_roundtrip(ray_session, images_1k, tmp_path):
    import ray.data as rd

    uri = str(tmp_path / "t")
    man = TableIO.write(rd.from_arrow(images_1k).repartition(4), uri)
    assert man["rows"] == images_1k.num_rows
    assert len(man["fragments"]) >= 2
    back = TableIO.read(uri).to_pandas().sort_values("image_id").reset_index(drop=True)
    orig = images_1k.to_pandas().sort_values("image_id").reset_index(drop=True)
    assert (back["image_id"] == orig["image_id"]).all()
    assert (back["phash"] == orig["phash"]).all()
    # fragment-pruned read
    one = TableIO.read(uri, fragments=[man["fragments"][0]["id"]])
    assert one.count() == man["fragments"][0]["rows"]
    # append -> new version with more fragments
    man2 = TableIO.write(rd.from_arrow(images_1k.slice(0, 50)), uri, mode="append")
    assert man2["rows"] == images_1k.num_rows + 50
    assert TableIO.read(uri, version=man["version"]).count() == images_1k.num_rows


def test_kill_and_resume_identical(ray_session, images_table_uri, tmp_path):
    out_killed = str(tmp_path / "out_killed")
    out_clean = str(tmp_path / "out_clean")

    # clean one-shot run
    run_resumable(images_table_uri, out_clean, _transform, num_parts=4)
    clean = read_output(out_clean).to_pandas().sort_values("image_id").reset_index(drop=True)

    # killed at partition 2, then resumed
    with pytest.raises(RuntimeError, match="injected failure"):
        run_resumable(images_table_uri, out_killed, _transform, num_parts=4, fail_on_part=2)
    done_after_kill = set(Lineage(out_killed).committed())
    assert done_after_kill == {0, 1}, "parts before the failure committed"
    metrics = run_resumable(images_table_uri, out_killed, _transform, num_parts=4)
    resumed = read_output(out_killed).to_pandas().sort_values("image_id").reset_index(drop=True)

    pd.testing.assert_frame_equal(
        resumed.drop(columns=["tok_hash"]), clean.drop(columns=["tok_hash"])
    )
    np.testing.assert_allclose(np.stack(resumed["tok_hash"]), np.stack(clean["tok_hash"]))
    assert metrics["n_parts"] == 4 and metrics["rows_out"] == clean.shape[0]

    # resumed parts carry the NEW epoch; pre-kill parts keep epoch 0
    recs = Lineage(out_killed).committed()
    assert recs[0]["epoch"] == 0 and recs[2]["epoch"] == 1
    # lineage carries input fragment ids + row ranges
    assert recs[2]["input_fragments"] and recs[2]["row_end"] > recs[2]["row_start"]


def test_rerun_skips_everything(ray_session, images_table_uri, tmp_path):
    out = str(tmp_path / "out")
    run_resumable(images_table_uri, out, _transform, num_parts=3)
    before = {p: json.loads((Path(out) / "_lineage" / f"part-{p}.json").read_text())["committed_at"]
              for p in range(3)}
    run_resumable(images_table_uri, out, _transform, num_parts=3)  # no-op
    after = {p: json.loads((Path(out) / "_lineage" / f"part-{p}.json").read_text())["committed_at"]
             for p in range(3)}
    assert before == after, "committed partitions must not be recomputed"


def test_plan_partitions_balanced():
    frags = [{"id": i, "rows": 100} for i in range(10)]
    parts = plan_partitions(frags, 4)
    assert sum(len(p) for p in parts) == 10
    sizes = [sum(f["rows"] for f in p) for p in parts]
    assert max(sizes) <= 400 and min(sizes) >= 100


def test_time_travel_overwrite_preserves_old_fragments(ray_session, tmp_path):
    """Overwrite must NOT clobber fragments older manifest versions still
    reference (fragment names are version-qualified)."""
    import ray.data as rd

    uri = str(tmp_path / "tt")
    TableIO.write(rd.range(100), uri)                       # version 0
    TableIO.write(rd.range(7), uri, mode="overwrite")       # version 1
    assert TableIO.versions(uri) == [0, 1]
    assert TableIO.read(uri, version=0).count() == 100
    assert TableIO.read(uri, version=1).count() == 7
    v0 = sorted(TableIO.read(uri, version=0).to_pandas()["id"])
    assert v0 == list(range(100))


def test_compact_merges_small_fragments_and_preserves_time_travel(ray_session, tmp_path):
    import ray.data as rd

    from engine.io.table_io import TableIO

    uri = str(tmp_path / "tbl")
    # 6 small fragments of 100 rows each
    for i in range(6):
        ds = rd.range(100).map_batches(
            lambda t, off=i * 100: t.assign(id=t["id"] + off), batch_format="pandas")
        TableIO.write(ds.repartition(1), uri, mode="append" if i else "overwrite")
    before = TableIO.manifest(uri)
    assert len(before["fragments"]) == 6

    after = TableIO.compact(uri, target_rows=250)
    assert after["rows"] == 600
    assert len(after["fragments"]) < 6
    assert after["compaction_of"] == before["version"]
    # big-enough fragments carried verbatim vs merged groups recorded
    assert any("compacted_from" in f for f in after["fragments"])

    # latest read sees identical data
    got = sorted(TableIO.read(uri).to_pandas()["id"].tolist())
    assert got == list(range(600))
    # time travel to the pre-compaction version still works (old files intact)
    old = sorted(TableIO.read(uri, version=before["version"]).to_pandas()["id"].tolist())
    assert old == list(range(600))

    # fragments at/above target are never rewritten
    man3 = TableIO.compact(uri, target_rows=250)
    assert man3["version"] == after["version"]  # idempotent: nothing left to merge


def test_upsert_merge_by_key(ray_session, tmp_path):
    """Copy-on-write MERGE: matched keys replaced, new keys appended,
    untouched fragments carried verbatim (no rewrite), time travel
    preserved."""
    import numpy as np
    import pandas as pd
    import ray.data as rd

    uri = str(tmp_path / "tbl")
    base = pd.DataFrame({"k": np.arange(100, dtype=np.int64),
                         "v": np.zeros(100)})
    man0 = TableIO.write(rd.from_pandas(base).repartition(4), uri)
    # upsert touches keys 0..9 (one fragment's range) and adds 200..204
    up = pd.DataFrame({"k": np.r_[np.arange(10), np.arange(200, 205)].astype(np.int64),
                       "v": np.ones(15)})
    man1 = TableIO.upsert(rd.from_pandas(up), uri, key="k")

    got = TableIO.read(uri).to_pandas().sort_values("k").reset_index(drop=True)
    assert len(got) == 105
    np.testing.assert_allclose(got.loc[got["k"] < 10, "v"], 1.0)   # replaced
    np.testing.assert_allclose(got.loc[(got["k"] >= 10) & (got["k"] < 100), "v"], 0.0)
    np.testing.assert_allclose(got.loc[got["k"] >= 200, "v"], 1.0)  # appended

    # time travel: the pre-upsert version still reads the original rows
    old = TableIO.read(uri, version=man0["version"]).to_pandas()
    assert len(old) == 100 and (old["v"] == 0.0).all()

    # untouched fragments carried verbatim (same file paths as v0)
    v0_paths = {f["path"] for f in man0["fragments"]}
    carried = [f for f in man1["fragments"] if f["path"] in v0_paths]
    assert carried, "expected at least one untouched fragment to carry over"
    rewritten = [f for f in man1["fragments"] if f.get("rewritten_from")]
    assert rewritten, "expected the touched fragment(s) to be rewritten"


def test_upsert_all_new_keys_appends(ray_session, tmp_path):
    import numpy as np
    import pandas as pd
    import ray.data as rd

    uri = str(tmp_path / "tbl2")
    TableIO.write(rd.from_pandas(pd.DataFrame(
        {"k": np.arange(5, dtype=np.int64), "v": np.zeros(5)})), uri)
    man = TableIO.upsert(rd.from_pandas(pd.DataFrame(
        {"k": np.arange(10, 13, dtype=np.int64), "v": np.ones(3)})), uri, key="k")
    assert man["rows"] == 8
    assert not [f for f in man["fragments"] if f.get("rewritten_from")]
