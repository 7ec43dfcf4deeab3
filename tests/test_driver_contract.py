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


def test_runs_from_foreign_cwd():
    """Round-1 regression: the driver may import __ray_entry__ (by file
    path) from ANY cwd; Ray workers then cannot `import engine` unless the
    entry module registered every engine module for pickle-by-value. Run a
    worker-executing query in a subprocess whose cwd is NOT the repo."""
    import subprocess

    code = (
        "import ray, importlib.util\n"
        "ray.init(address='local', num_cpus=2, include_dashboard=False)\n"
        "spec = importlib.util.spec_from_file_location('__ray_entry__', "
        "'/root/repo/__ray_entry__.py')\n"
        "m = importlib.util.module_from_spec(spec)\n"
        "spec.loader.exec_module(m)\n"
        "q = m.queries()\n"
        "def n(r):\n"
        "    import pandas as pd\n"
        "    return len(r) if isinstance(r, pd.DataFrame) else r.count()\n"
        "assert n(q['images_featurize']('/root/testdata/sf0.001')) == 400\n"
        "assert n(q['asof_windowed']('/root/testdata/sf0.001')) > 0\n"
        "assert n(q['multimodal_audio']('/root/testdata/sf0.001')) == 200\n"
        "print('FOREIGN_CWD_OK')\n"
    )
    env = {k: v for k, v in __import__('os').environ.items() if k != 'PYTHONPATH'}
    env.pop('RAY_ADDRESS', None)
    out = subprocess.run([sys.executable, '-c', code], cwd='/tmp', env=env,
                         capture_output=True, text=True, timeout=300)
    assert 'FOREIGN_CWD_OK' in out.stdout, out.stderr[-2000:]
