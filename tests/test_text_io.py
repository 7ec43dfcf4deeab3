"""CSV/JSONL source roundtrips vs the parquet truth."""

import json

import pandas as pd
import pyarrow as pa
import pytest

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def events_df():
    return pd.read_parquet(f"{SF}/events.parquet").head(500)


def test_read_csv_schema_cast(ray_session, tmp_path_factory, events_df):
    from engine.io.text import read_csv

    d = tmp_path_factory.mktemp("csv")
    df = events_df[["event_id", "user_id", "value"]]
    df.to_csv(d / "a.csv", index=False)
    schema = pa.schema([("event_id", pa.int64()), ("user_id", pa.int64()),
                        ("value", pa.float64())])
    got = (read_csv([str(d / "a.csv")], schema=schema).to_pandas()
           .sort_values("event_id").reset_index(drop=True))
    exp = df.sort_values("event_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(got, exp)


def test_read_csv_column_pruning(ray_session, tmp_path_factory, events_df):
    from engine.io.text import read_csv

    d = tmp_path_factory.mktemp("csv2")
    events_df[["event_id", "user_id", "value"]].to_csv(d / "a.csv", index=False)
    got = read_csv([str(d / "a.csv")], columns=["event_id"]).to_pandas()
    assert list(got.columns) == ["event_id"]
    assert len(got) == len(events_df)


def test_read_jsonl(ray_session, tmp_path_factory, events_df):
    from engine.io.text import read_jsonl

    d = tmp_path_factory.mktemp("jsonl")
    recs = events_df[["event_id", "event_type", "value"]].to_dict("records")
    with open(d / "a.jsonl", "w") as f:
        for r in recs:
            f.write(json.dumps(r) + "\n")
    schema = pa.schema([("event_id", pa.int64()), ("event_type", pa.string()),
                        ("value", pa.float64())])
    got = (read_jsonl([str(d / "a.jsonl")], schema=schema).to_pandas()
           .sort_values("event_id").reset_index(drop=True))
    exp = (events_df[["event_id", "event_type", "value"]]
           .sort_values("event_id").reset_index(drop=True))
    pd.testing.assert_frame_equal(got, exp)
