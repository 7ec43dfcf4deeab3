"""Session-scoped Ray fixture — ONE ray.init per pytest session."""

from __future__ import annotations

import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


@pytest.fixture(scope="session")
def ray_session():
    import ray
    from ray.data import DataContext

    ray.init(
        address="local",
        num_cpus=4,
        include_dashboard=False,
        ignore_reinit_error=True,
        logging_level="ERROR",
    )
    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False
    ctx.execution_options.verbose_progress = False
    yield
    ray.shutdown()


@pytest.fixture(scope="session")
def images_1k():
    from engine.fixtures.gen import images_table

    return images_table(0, 300)  # 300 rows keeps the unit suite fast; golden run uses 1k


@pytest.fixture(scope="session")
def obs_small():
    from engine.fixtures.gen import observations_table

    return observations_table(80)
