"""Gap-based sessionization (SURVEY.md §2.4 W3).

A new session starts when ts - prev_ts > gap within an entity. Vectorized
as diff + cumsum of gap-breaks over the (entity, ts)-sorted partition —
exactly the SQL
  SUM(CASE WHEN ts - LAG(ts) OVER w > <gap> THEN 1 ELSE 0 END) OVER w
cumsum formulation, so DuckDB is a direct oracle.

Two outputs:
  - label(ds): per-event `session_idx` (0-based per entity)
  - sessionize(ds): per-session rows (entity, session_idx, start_ts,
    end_ts, n_events, + optional value aggregates)
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from engine.ops.window import _partitioned, _sorted_group


def _label_frame(df: pd.DataFrame, entity: str, ts: str, gap_us: int, tie: str | None) -> pd.DataFrame:
    df = _sorted_group(df, entity, ts, tie)
    tsv = df[ts].to_numpy().astype("datetime64[us]").astype(np.int64)
    ent = df[entity].to_numpy()
    n = len(df)
    if n == 0:
        df["session_idx"] = np.array([], dtype=np.int64)
        return df
    new_entity = np.empty(n, dtype=bool)
    new_entity[0] = True
    new_entity[1:] = ent[1:] != ent[:-1]
    gap_break = np.empty(n, dtype=bool)
    gap_break[0] = False
    gap_break[1:] = (tsv[1:] - tsv[:-1]) > gap_us
    breaks = (gap_break & ~new_entity).astype(np.int64)
    cum = np.cumsum(breaks)
    # session_idx = cumulative breaks since entity start
    entity_start_cum = np.maximum.accumulate(np.where(new_entity, cum, -1))
    df["session_idx"] = cum - entity_start_cum
    return df


def label_sessions(ds, entity: str, ts: str = "ts", gap_us: int = 24 * 3600 * 1_000_000,
                   tie_break: str | None = None, num_partitions: int | None = None):
    return _partitioned(ds, entity, num_partitions).map_groups(
        lambda df: _label_frame(df, entity, ts, gap_us, tie_break), batch_format="pandas"
    )


def sessionize(ds, entity: str, ts: str = "ts", gap_us: int = 24 * 3600 * 1_000_000,
               value_col: str | None = None, tie_break: str | None = None,
               num_partitions: int | None = None):
    def fn(df: pd.DataFrame) -> pd.DataFrame:
        df = _label_frame(df, entity, ts, gap_us, tie_break)
        aggs = {"start_ts": (ts, "min"), "end_ts": (ts, "max"), "n_events": (ts, "size")}
        if value_col:
            aggs["sum_value"] = (value_col, "sum")
        out = df.groupby([entity, "session_idx"], sort=False).agg(**aggs).reset_index()
        return out

    return _partitioned(ds, entity, num_partitions).map_groups(fn, batch_format="pandas")
