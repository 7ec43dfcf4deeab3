"""Per-partition lineage sidecar + atomic commit protocol
(SURVEY.md §4.4; BASELINE.json north_rule: "per-partition lineage +
metrics", resume from last committed partition).

Layout under an output table uri:
    data/part-<k>-epoch-<e>.parquet      committed data files
    _lineage/part-<k>.json               commit record (atomic rename)
    _versions/<v>.manifest.json          table version = committed parts

A partition commit = write data file -> write lineage JSON to a temp path
-> os.rename (atomic on one filesystem). A retry of a crashed partition
writes a NEW epoch; stale temp files are ignored, so retries can't
double-write. Records carry input fragment ids, row ranges, rows/bytes
out, wall seconds — the metrics sink (SURVEY.md S5/S6).
"""

from __future__ import annotations

import json
import os
import time
from pathlib import Path


class Lineage:
    def __init__(self, uri: str):
        self.root = Path(uri)
        self.ldir = self.root / "_lineage"
        self.ldir.mkdir(parents=True, exist_ok=True)

    def committed(self) -> dict[int, dict]:
        out = {}
        for p in sorted(self.ldir.glob("part-*.json")):
            try:
                rec = json.loads(p.read_text())
            except json.JSONDecodeError:
                continue  # torn write of a non-renamed temp never lands here
            if rec.get("status") == "committed":
                out[rec["part_id"]] = rec
        return out

    def commit(self, part_id: int, *, input_fragments: list, row_start: int, row_end: int,
               epoch: int, rows_out: int, bytes_out: int, wall_s: float, data_file: str) -> dict:
        rec = {
            "part_id": part_id,
            "input_fragments": input_fragments,
            "row_start": row_start,
            "row_end": row_end,
            "epoch": epoch,
            "rows_out": rows_out,
            "bytes_out": bytes_out,
            "wall_s": round(wall_s, 4),
            "data_file": data_file,
            "status": "committed",
            "committed_at": time.time(),
        }
        tmp = self.ldir / f".tmp-part-{part_id}-epoch-{epoch}.json"
        tmp.write_text(json.dumps(rec, indent=1))
        os.rename(tmp, self.ldir / f"part-{part_id}.json")
        return rec

    def metrics(self) -> dict:
        recs = self.committed().values()
        return {
            "n_parts": len(recs),
            "rows_out": sum(r["rows_out"] for r in recs),
            "bytes_out": sum(r["bytes_out"] for r in recs),
            "wall_s_total": round(sum(r["wall_s"] for r in recs), 3),
        }
