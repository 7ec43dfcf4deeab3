"""Driver contract for the graft builder (Ray Data target).

The driver calls ``ray.init`` itself, then ``entry()`` as a smoke check,
then runs each ``queries()[name](sf_dir)`` at sf=0.01 against
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash). Neither this module nor the engine package ever calls
``ray.init``/``ray.shutdown``.

Catalog lives in engine/queries.py (SQL-checked operators) and
engine/queries_ml.py (dedup/similarity/text/multimodal ops; rows-only
where SQL cannot express them).
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any


def entry() -> Any:
    """Flagship: as-of attach + fused windowed features over sf0.001
    events (engine/pipelines/flagship.py); returns a ray.data.Dataset."""
    from engine.pipelines.flagship import events_flagship

    return events_flagship("/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[str], Any]]:
    from engine.queries import QUERIES

    out = dict(QUERIES)
    try:
        from engine.queries_ml import QUERIES_ML

        out.update(QUERIES_ML)
    except ImportError:
        pass
    return out


def oracle_sql() -> dict[str, str]:
    from engine.queries import ORACLE_SQL

    out = dict(ORACLE_SQL)
    try:
        from engine.queries_ml import ORACLE_SQL_ML

        out.update(ORACLE_SQL_ML)
    except ImportError:
        pass
    return out
