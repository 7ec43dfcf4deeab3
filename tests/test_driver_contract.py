"""Run every SQL-checked queries() entry vs its oracle_sql() at sf0.001 —
the in-repo mirror of the driver's correctness gate."""

import sys
from pathlib import Path

import duckdb
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1] / "tools"))
from check_contract import TABLES, compare, to_df  # noqa: E402

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TABLES:
        c.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')")
    return c


def _entries():
    import __ray_entry__ as e

    qs, sqls = e.queries(), e.oracle_sql()
    return [(name, fn, sqls.get(name)) for name, fn in qs.items()]


@pytest.mark.parametrize("name,fn,sql", _entries(), ids=[n for n, _, _ in _entries()])
def test_query_matches_oracle(ray_session, con, name, fn, sql):
    got = to_df(fn(SF))
    if sql is None:
        assert len(got) >= 0  # rows-only entry; covered by dedicated tests
        return
    exp = con.execute(sql).fetchdf()
    problems = compare(name, got, exp)
    assert not problems, f"{name}: {problems}"


def test_entry_smoke(ray_session):
    import __ray_entry__ as e

    ds = e.entry()
    n = ds.count()
    assert n > 0
    cols = set(ds.schema().names)
    assert {"event_id", "session_idx", "roll_mean_value", "value_last_purchase"} <= cols
