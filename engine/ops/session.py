"""Gap-based sessionization (SURVEY.md §2.4 W3).

A new session starts when ts - prev_ts > gap within an entity. Vectorized
as diff + cumsum of gap-breaks over the (entity, ts)-sorted partition —
exactly the SQL
  SUM(CASE WHEN ts - LAG(ts) OVER w > <gap> THEN 1 ELSE 0 END) OVER w
cumsum formulation, so DuckDB is a direct oracle. Arrow-native via
engine.ops.wkernel (no pandas round-trip; sessions are CONTIGUOUS runs
of the sorted partition, so sessionize aggregates by run-reduction, not
a hash groupby).

Two outputs:
  - label_sessions(ds): per-event `session_idx` (0-based per entity)
  - sessionize(ds): per-session rows (entity, session_idx, start_ts,
    end_ts, n_events, + optional value aggregates)
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from engine.ops.window import _partitioned, _strip
from engine.ops.wkernel import entity_sort, run_reduce, run_starts, session_labels


def label_sessions(ds, entity: str, ts: str = "ts", gap_us: int = 24 * 3600 * 1_000_000,
                   tie_break: str | None = None, num_partitions: int | None = None):
    def fn(t: pa.Table) -> pa.Table:
        t = _strip(t)
        if t.num_rows == 0:
            return t.append_column("session_idx", pa.chunked_array([], type=pa.int64()))
        t, _codes, tsv, change = entity_sort(t, entity, ts, tie_break)
        return t.append_column("session_idx", pa.array(session_labels(change, tsv, gap_us)))

    return _partitioned(ds, entity, num_partitions).map_groups(fn, batch_format="pyarrow")


def sessionize(ds, entity: str, ts: str = "ts", gap_us: int = 24 * 3600 * 1_000_000,
               value_col: str | None = None, tie_break: str | None = None,
               num_partitions: int | None = None):
    def fn(t: pa.Table) -> pa.Table:
        t = _strip(t)
        if t.num_rows == 0:
            cols = {
                entity: pa.chunked_array([], type=t.schema.field(entity).type),
                "session_idx": pa.chunked_array([], type=pa.int64()),
                "start_ts": pa.chunked_array([], type=t.schema.field(ts).type),
                "end_ts": pa.chunked_array([], type=t.schema.field(ts).type),
                "n_events": pa.chunked_array([], type=pa.int64()),
            }
            if value_col:
                cols["sum_value"] = pa.chunked_array([], type=pa.float64())
            return pa.table(cols)
        t, codes, tsv, change = entity_sort(t, entity, ts, tie_break)
        sess = session_labels(change, tsv, gap_us)
        first = run_starts(codes, sess)
        v = t[value_col].to_numpy(zero_copy_only=False).astype(np.float64) if value_col else None
        starts, ends, counts, sums = run_reduce(first, v)
        # sorted by ts within each session, so start/end are the run edges
        cols = {
            entity: t[entity].take(pa.array(starts)),
            "session_idx": pa.array(sess[starts]),
            "start_ts": t[ts].take(pa.array(starts)),
            "end_ts": t[ts].take(pa.array(ends - 1)),
            "n_events": pa.array(counts.astype(np.int64)),
        }
        if value_col:
            cols["sum_value"] = pa.array(sums)
        return pa.table(cols)

    return _partitioned(ds, entity, num_partitions).map_groups(fn, batch_format="pyarrow")
