"""Step protocol + plan-time schema validation (X1/M9)."""

import pyarrow as pa
import pytest

from engine.plan import FnStep, Pipeline
from engine.ops import schema as S


def test_plan_validates_chain():
    s1 = FnStep("a", lambda ds: ds, output_schema=pa.schema([("x", pa.int64())]))
    s2 = FnStep("b", lambda ds: ds, input_schema=pa.schema([("x", pa.int64())]))
    Pipeline([s1, s2]).validate_plan()  # ok

    bad = FnStep("c", lambda ds: ds, input_schema=pa.schema([("y", pa.string())]))
    with pytest.raises(ValueError, match="missing column 'y'"):
        Pipeline([s1, bad]).validate_plan()

    wrong_type = FnStep("d", lambda ds: ds, input_schema=pa.schema([("x", pa.string())]))
    with pytest.raises(ValueError, match="expected string"):
        Pipeline([s1, wrong_type]).validate_plan()


def test_pipeline_runs_steps(ray_session, images_1k):
    import ray.data as rd

    from engine.ops.assemble import assemble
    from engine.ops.decode import featurize

    pipe = Pipeline([
        FnStep("featurize", featurize, input_schema=S.IMAGES, output_schema=S.FEATURES),
        FnStep("assemble", assemble, input_schema=S.FEATURES),
    ])
    out = pipe.run(rd.from_arrow(images_1k), check_runtime_schemas=True)
    assert out.count() == images_1k.num_rows
