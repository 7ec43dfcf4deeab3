"""Mini-driver: run every queries() entry against its oracle_sql() via
DuckDB, mimicking the driver's row-count + schema + order-insensitive
value-hash comparison. Usage:

    python tools/check_contract.py [sf_dir] [name ...]

Owns its own Ray session (the real driver owns Ray when calling
__ray_entry__; here we are the driver)."""

from __future__ import annotations

import hashlib
import sys
import time
from pathlib import Path

import duckdb
import numpy as np
import pandas as pd

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

TABLES = ["region", "nation", "customer", "supplier", "part", "orders", "lineitem",
          "events", "documents", "embeddings"]


def to_df(res) -> pd.DataFrame:
    if isinstance(res, pd.DataFrame):
        return res.reset_index(drop=True)
    if hasattr(res, "to_pandas"):
        return res.to_pandas().reset_index(drop=True)
    raise TypeError(type(res))


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        s = df[c]
        if pd.api.types.is_datetime64_any_dtype(s):
            df[c] = s.astype("datetime64[us]")
        elif pd.api.types.is_float_dtype(s):
            df[c] = s.astype("float64")
        elif pd.api.types.is_integer_dtype(s):
            df[c] = s.astype("int64")
        elif pd.api.types.is_bool_dtype(s):
            df[c] = s.astype("int64")
        elif s.dtype == object and s.notna().any():
            import decimal

            v0 = s.dropna().iloc[0]
            if isinstance(v0, pd.Timestamp):
                df[c] = pd.to_datetime(s).astype("datetime64[us]")
            elif isinstance(v0, decimal.Decimal):
                df[c] = s.astype("float64")
            elif isinstance(v0, (int, np.integer)):
                df[c] = s.astype("int64")
    return df.sort_values(list(df.columns), kind="stable").reset_index(drop=True)


def value_hash(df: pd.DataFrame) -> str:
    h = hashlib.sha256()
    for c in df.columns:
        s = df[c]
        if pd.api.types.is_float_dtype(s):
            arr = s.to_numpy()
            arr = np.where(np.isnan(arr), 0.12345, arr)
            h.update(np.ascontiguousarray(arr).tobytes())
        else:
            h.update("\x1f".join("" if pd.isna(v) else str(v) for v in s).encode())
    return h.hexdigest()


def compare(name: str, got: pd.DataFrame, exp: pd.DataFrame) -> list[str]:
    problems = []
    if set(got.columns) != set(exp.columns):
        problems.append(f"columns differ: ray={sorted(got.columns)} sql={sorted(exp.columns)}")
        return problems
    if len(got) != len(exp):
        problems.append(f"row count: ray={len(got)} sql={len(exp)}")
        return problems
    g, e = canon(got), canon(exp)
    for c in g.columns:
        gs, es = g[c], e[c]
        if gs.dtype != es.dtype:
            problems.append(f"col {c!r} dtype differs: ray={gs.dtype} sql={es.dtype}")
            continue
        if pd.api.types.is_float_dtype(gs):
            same = np.array_equal(gs.to_numpy(), es.to_numpy(), equal_nan=True)
        else:
            same = gs.equals(es)
        if not same:
            bad = "?"
            gv = ev = None
            for i in range(len(gs)):
                gv, ev = gs.iloc[i], es.iloc[i]
                if (pd.isna(gv) != pd.isna(ev)) or (not pd.isna(gv) and not pd.isna(ev) and gv != ev):
                    bad = i
                    break
            problems.append(f"col {c!r} differs (first at row {bad}: ray={gv!r} sql={ev!r})")
    return problems


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = set(sys.argv[2:])
    import ray

    ray.init(address="local", num_cpus=8, include_dashboard=False,
             ignore_reinit_error=True, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    import __ray_entry__ as entrymod

    qs, sqls = entrymod.queries(), entrymod.oracle_sql()
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")

    failures = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            got = to_df(fn(sf_dir))
        except Exception as exc:  # noqa: BLE001
            print(f"FAIL  {name}: ray error {type(exc).__name__}: {exc}")
            failures += 1
            continue
        if name not in sqls:
            print(f"ok*   {name}: rows-only ({len(got)} rows, {time.time()-t0:.1f}s)")
            continue
        exp = con.execute(sqls[name]).fetchdf()
        probs = compare(name, got, exp)
        if probs:
            failures += 1
            print(f"FAIL  {name}: " + "; ".join(probs))
        else:
            print(f"ok    {name}: {len(got)} rows match ({time.time()-t0:.1f}s)")
    ray.shutdown()
    print(f"\n{failures} failures")
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
