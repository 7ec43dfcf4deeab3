"""Resumable partitioned runner (SURVEY.md §3 E3; north_rule resume gate).

A job = (input table, transform, output table). The input's fragment list
is chunked into partitions; each partition runs as its own (internally
parallel) Dataset job and commits atomically:

    write temp dir -> rename to data/part-<k>-epoch-<e>/ -> lineage JSON

A killed run leaves no committed record for the in-flight partition;
rerunning skips every committed part_id and recomputes the rest under a
new epoch (stale temp dirs are ignored and cleaned). Outputs are
one directory of parquet files per partition — the "resumable output"
layout (one dir per input shard, never one giant file).
"""

from __future__ import annotations

import json
import os
import shutil
import time
from pathlib import Path

from engine.io.table_io import TableIO
from engine.lineage import Lineage


def plan_partitions(fragments: list[dict], num_parts: int) -> list[list[dict]]:
    """Chunk the manifest's fragment list into ~equal-row partitions,
    preserving fragment order (row ranges stay contiguous)."""
    total = sum(f["rows"] for f in fragments)
    target = max(1, total // max(1, num_parts))
    parts, cur, acc = [], [], 0
    for f in fragments:
        cur.append(f)
        acc += f["rows"]
        if acc >= target and len(parts) < num_parts - 1:
            parts.append(cur)
            cur, acc = [], 0
    if cur:
        parts.append(cur)
    return parts


def current_epoch(out_uri: str) -> int:
    root = Path(out_uri)
    marker = root / "_epoch"
    e = int(marker.read_text()) + 1 if marker.exists() else 0
    root.mkdir(parents=True, exist_ok=True)
    marker.write_text(str(e))
    return e


def run_resumable(in_uri: str, out_uri: str, transform, num_parts: int = 8,
                  read_columns: list[str] | None = None, fail_on_part: int | None = None) -> dict:
    """transform: Dataset -> Dataset. Returns the run's metrics summary.
    fail_on_part: test hook — raise before committing that partition."""
    import ray.data as rd

    man = TableIO.manifest(in_uri)
    parts = plan_partitions(man["fragments"], num_parts)
    root = Path(out_uri)
    data = root / "data"
    data.mkdir(parents=True, exist_ok=True)
    lineage = Lineage(out_uri)
    done = lineage.committed()
    epoch = current_epoch(out_uri)

    # stale temps from crashed epochs are ignorable garbage — clean them
    for stale in data.glob(".tmp-*"):
        shutil.rmtree(stale, ignore_errors=True)

    row_cursor = 0
    for part_id, frags in enumerate(parts):
        rows_in = sum(f["rows"] for f in frags)
        row_start, row_end = row_cursor, row_cursor + rows_in
        row_cursor = row_end
        if part_id in done:
            continue
        if fail_on_part is not None and part_id == fail_on_part:
            raise RuntimeError(f"injected failure before partition {part_id}")
        t0 = time.time()
        paths = [str(Path(in_uri) / f["path"]) for f in frags]
        ds = transform(rd.read_parquet(paths, columns=read_columns))
        tmp = data / f".tmp-part-{part_id}-epoch-{epoch}"
        out_dir = data / f"part-{part_id}-epoch-{epoch}"
        ds.write_parquet(str(tmp))
        os.rename(tmp, out_dir)
        rows_out = sum(
            __import__("pyarrow.parquet", fromlist=["read_metadata"]).read_metadata(p).num_rows
            for p in out_dir.glob("*.parquet")
        )
        bytes_out = sum(p.stat().st_size for p in out_dir.glob("*.parquet"))
        lineage.commit(
            part_id, input_fragments=[f["id"] for f in frags], row_start=row_start,
            row_end=row_end, epoch=epoch, rows_out=rows_out, bytes_out=bytes_out,
            wall_s=time.time() - t0, data_file=str(out_dir.relative_to(root)),
        )

    done = lineage.committed()
    man_out = {
        "version": len(TableIO.versions(out_uri)),
        "created_at": time.time(),
        "fragments": [
            {"id": pid, "path": rec["data_file"], "rows": rec["rows_out"]}
            for pid, rec in sorted(done.items())
        ],
        "rows": sum(r["rows_out"] for r in done.values()),
    }
    vdir = root / "_versions"
    vdir.mkdir(exist_ok=True)
    tmp = vdir / f".tmp-{man_out['version']}.manifest.json"
    tmp.write_text(json.dumps(man_out, indent=1))
    os.rename(tmp, vdir / f"{man_out['version']}.manifest.json")
    return lineage.metrics()


def read_output(out_uri: str, columns=None):
    """Read a run's committed output (directories of parquet per part)."""
    import ray.data as rd

    done = Lineage(out_uri).committed()
    paths = []
    for _, rec in sorted(done.items()):
        d = Path(out_uri) / rec["data_file"]
        paths.extend(sorted(str(p) for p in d.glob("*.parquet")) if d.is_dir() else [str(d)])
    return rd.read_parquet(paths, columns=columns)
