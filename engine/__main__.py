"""CLI entry points (SURVEY.md §3): run pipelines standalone or via
`ray job submit -- python -m engine <cmd> ...`.

Owns the Ray session (guarded init — the only places allowed to init are
CLIs, bench.py, and the test fixture)."""

from __future__ import annotations

import argparse
import json


def _ray():
    import ray

    if not ray.is_initialized():
        ray.init(address="local", include_dashboard=False, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    return ray


def cmd_featurize(args):
    """images table -> features table (resumable, lineage-committed)."""
    _ray()
    from engine.ops.decode import FeaturizeActor
    from engine.pipelines.run import run_resumable

    def transform(ds):
        return ds.map_batches(FeaturizeActor, batch_format="pyarrow", zero_copy_batch=True,
                              batch_size=args.batch_size, concurrency=(1, args.concurrency))

    metrics = run_resumable(args.input, args.output, transform, num_parts=args.num_parts)
    print(json.dumps(metrics))


def cmd_gen(args):
    """Generate the synthetic images fixture table (TableIO layout)."""
    _ray()
    from engine.fixtures.gen import images_dataset
    from engine.io.table_io import TableIO

    ds = images_dataset(args.n, parallelism=args.fragments)
    man = TableIO.write(ds, args.output)
    print(json.dumps({"rows": man["rows"], "fragments": len(man["fragments"])}))


def cmd_asof(args):
    """events parquet -> as-of + fused windowed features -> parquet.
    Input: the sf dir containing events.parquet, or the file itself."""
    import os

    _ray()
    from engine.pipelines.flagship import events_flagship

    sf_dir = os.path.dirname(args.input) if args.input.endswith(".parquet") else args.input
    out = events_flagship(sf_dir)
    out.write_parquet(args.output)
    print(json.dumps({"written": args.output}))


def cmd_flagship(args):
    """image flagship end-to-end on synthetic data."""
    _ray()
    from engine.pipelines.flagship import image_flagship

    ds = image_flagship(args.n, parallelism=args.fragments)
    ds.write_parquet(args.output)
    print(json.dumps({"written": args.output}))


def main(argv=None):
    p = argparse.ArgumentParser(prog="engine")
    sub = p.add_subparsers(dest="cmd", required=True)

    g = sub.add_parser("gen", help="generate synthetic images table")
    g.add_argument("output")
    g.add_argument("--n", type=int, default=10_000)
    g.add_argument("--fragments", type=int, default=32)
    g.set_defaults(fn=cmd_gen)

    f = sub.add_parser("featurize", help="images table -> features (resumable)")
    f.add_argument("input")
    f.add_argument("output")
    f.add_argument("--num-parts", type=int, default=8)
    f.add_argument("--batch-size", type=int, default=256)
    f.add_argument("--concurrency", type=int, default=8)
    f.set_defaults(fn=cmd_featurize)

    a = sub.add_parser("asof", help="events dir -> windowed features parquet")
    a.add_argument("input")
    a.add_argument("output")
    a.set_defaults(fn=cmd_asof)

    fl = sub.add_parser("flagship", help="synthetic image flagship -> parquet")
    fl.add_argument("output")
    fl.add_argument("--n", type=int, default=5000)
    fl.add_argument("--fragments", type=int, default=32)
    fl.set_defaults(fn=cmd_flagship)

    args = p.parse_args(argv)
    args.fn(args)
    import ray

    ray.shutdown()


if __name__ == "__main__":
    main()
