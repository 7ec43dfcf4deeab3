"""Lance-like fragmented table adapter (SURVEY.md §1.2 / §2.2 S1–S2).

pylance is not installable in this sandbox, so we implement the same
STRUCTURE — a directory of parquet fragments + versioned JSON manifests +
the lineage sidecar — behind a thin adapter; `ray.data.read_lance` /
`write_lance` (present in Ray 2.49) can be swapped in when the package
exists (same fragment/version concepts).

    <uri>/data/frag-<k>-v<version>-epoch-<e>.parquet
    <uri>/_versions/<v>.manifest.json   {version, fragments:[{id,path,rows}], schema}
    <uri>/_lineage/part-<k>.json        engine/lineage.py records

read(uri, version=...)   -> Dataset over exactly that version's fragments
read(fragments=[ids])    -> fragment-pruned read (the resume currency)
write(ds, uri)           -> fragments + lineage + new manifest version
"""

from __future__ import annotations

import json
import os
import time
from pathlib import Path


class TableIO:
    @staticmethod
    def versions(uri: str) -> list[int]:
        vdir = Path(uri) / "_versions"
        if not vdir.exists():
            return []
        return sorted(int(p.stem.split(".")[0]) for p in vdir.glob("*.manifest.json"))

    @staticmethod
    def manifest(uri: str, version: int | None = None) -> dict:
        vs = TableIO.versions(uri)
        if not vs:
            raise FileNotFoundError(f"no manifest versions under {uri}")
        v = version if version is not None else vs[-1]
        return json.loads((Path(uri) / "_versions" / f"{v}.manifest.json").read_text())

    @staticmethod
    def read(uri: str, version: int | None = None, fragments: list[int] | None = None,
             columns: list[str] | None = None, override_num_blocks: int | None = None):
        import ray.data as rd

        man = TableIO.manifest(uri, version)
        frags = man["fragments"]
        if fragments is not None:
            want = set(fragments)
            frags = [f for f in frags if f["id"] in want]
        paths = [str(Path(uri) / f["path"]) for f in frags]
        return rd.read_parquet(paths, columns=columns, override_num_blocks=override_num_blocks)

    @staticmethod
    def write(ds, uri: str, mode: str = "overwrite", epoch: int = 0) -> dict:
        """Stream the dataset to parquet fragments, then commit a manifest
        version listing them. mode='append' adds fragments to the previous
        version's list."""
        from engine.lineage import Lineage

        root = Path(uri)
        data = root / "data"
        data.mkdir(parents=True, exist_ok=True)
        staging = root / f".staging-epoch-{epoch}"
        staging.mkdir(parents=True, exist_ok=True)
        t0 = time.time()
        ds.write_parquet(str(staging))

        prev = []
        next_version = 0
        vs = TableIO.versions(uri)
        if vs:
            next_version = vs[-1] + 1
            if mode == "append":
                prev = TableIO.manifest(uri, vs[-1])["fragments"]
        start_id = (max((f["id"] for f in prev), default=-1)) + 1

        import pyarrow.parquet as pq

        lineage = Lineage(uri)
        new_frags = []
        row_cursor = 0
        for i, p in enumerate(sorted(staging.glob("*.parquet"))):
            fid = start_id + i
            # Version-qualified names: an overwrite restarts fragment ids
            # at 0, so a bare frag-<id>-epoch-<e> name would clobber files
            # that EARLIER manifest versions still reference and silently
            # break time travel (read(uri, version=<old>)).
            name = f"frag-{fid}-v{next_version}-epoch-{epoch}.parquet"
            if (data / name).exists():
                raise FileExistsError(f"fragment {name} already exists under {data}")
            os.rename(p, data / name)
            rows = pq.read_metadata(data / name).num_rows
            new_frags.append({"id": fid, "path": f"data/{name}", "rows": rows})
            lineage.commit(
                fid, input_fragments=[], row_start=row_cursor, row_end=row_cursor + rows,
                epoch=epoch, rows_out=rows, bytes_out=(data / name).stat().st_size,
                wall_s=(time.time() - t0) / max(1, len(new_frags)), data_file=f"data/{name}",
            )
            row_cursor += rows
        staging.rmdir()

        man = {
            "version": next_version,
            "created_at": time.time(),
            "fragments": prev + new_frags,
            "rows": sum(f["rows"] for f in prev + new_frags),
        }
        vdir = root / "_versions"
        vdir.mkdir(parents=True, exist_ok=True)
        tmp = vdir / f".tmp-{next_version}.manifest.json"
        tmp.write_text(json.dumps(man, indent=1))
        os.rename(tmp, vdir / f"{next_version}.manifest.json")
        return man

    @staticmethod
    def compact(uri: str, target_rows: int = 1_000_000) -> dict:
        """Small-fragment compaction (the Lance/Iceberg maintenance op):
        rewrite runs of fragments smaller than ``target_rows`` into
        fewer, bigger ones and commit the result as a NEW manifest
        version. Fragments already >= target_rows are carried over
        verbatim — their files are never rewritten or moved, so the
        rewrite cost is proportional to the SMALL-file volume only.
        Older versions still reference the original small fragments
        (version-qualified names are never clobbered), so time travel
        survives compaction; a failed compaction leaves the previous
        manifest as latest (the commit is the same atomic rename).

        Streams each rewrite group through Ray (read_parquet ->
        write_parquet), never materializing a group on the driver."""
        import ray.data as rd

        root = Path(uri)
        man = TableIO.manifest(uri)
        keep, group, groups = [], [], []
        grows = 0
        for f in man["fragments"]:
            if f["rows"] >= target_rows:
                keep.append(f)
                continue
            group.append(f)
            grows += f["rows"]
            if grows >= target_rows:
                groups.append(group)
                group, grows = [], 0
        if group:
            groups.append(group)
        if sum(len(g) for g in groups) <= len(groups):
            return man  # nothing to merge (every group is a single fragment)

        next_version = TableIO.versions(uri)[-1] + 1
        data = root / "data"
        new_frags = []
        fid = max((f["id"] for f in man["fragments"]), default=-1) + 1
        import pyarrow.parquet as pq

        for g in groups:
            if len(g) == 1:
                keep.append(g[0])
                continue
            paths = [str(root / f["path"]) for f in g]
            name = f"frag-{fid}-v{next_version}-epoch-0.parquet"
            staging = root / f".staging-compact-{next_version}-{fid}"
            staging.mkdir(parents=True, exist_ok=True)
            # one output file per group: the group was sized to target_rows
            rd.read_parquet(paths, override_num_blocks=1).write_parquet(str(staging))
            parts = sorted(staging.glob("*.parquet"))
            if len(parts) == 1:
                os.rename(parts[0], data / name)
                rows = pq.read_metadata(data / name).num_rows
                new_frags.append({"id": fid, "path": f"data/{name}", "rows": rows,
                                  "compacted_from": [f["id"] for f in g]})
                fid += 1
            else:  # defensive: writer split the block anyway — keep each part
                for p in parts:
                    nm = f"frag-{fid}-v{next_version}-epoch-0.parquet"
                    os.rename(p, data / nm)
                    rows = pq.read_metadata(data / nm).num_rows
                    new_frags.append({"id": fid, "path": f"data/{nm}", "rows": rows,
                                      "compacted_from": [f["id"] for f in g]})
                    fid += 1
            staging.rmdir()

        frags = sorted(keep, key=lambda f: f["id"]) + new_frags
        out = {"version": next_version, "created_at": time.time(),
               "fragments": frags, "rows": sum(f["rows"] for f in frags),
               "compaction_of": man["version"]}
        vdir = root / "_versions"
        tmp = vdir / f".tmp-{next_version}.manifest.json"
        tmp.write_text(json.dumps(out, indent=1))
        os.rename(tmp, vdir / f"{next_version}.manifest.json")
        return out

    @staticmethod
    def upsert(ds, uri: str, key: str, epoch: int = 0) -> dict:
        """Copy-on-write merge-by-key (the Delta/Iceberg MERGE write
        mode a feature store needs): rows of ``ds`` REPLACE existing
        rows sharing their ``key``; unmatched keys append.

        Scale shape: the upsert batch is small relative to the table
        (the incremental-write pattern) — its key set broadcasts via
        ``ray.put``. ONE distributed pruned probe pass (key column +
        ``include_paths``) finds the fragments that contain any matched
        key; ONLY those fragments are rewritten (anti-filtered through
        Ray, streamed — never driver-materialized); untouched fragments
        carry into the new manifest verbatim, so write cost is
        proportional to affected-fragment volume, not table volume.
        Older manifest versions keep referencing the original files —
        time travel shows the pre-upsert table. Commit is the same
        atomic manifest rename as write()/compact()."""
        import numpy as np
        import pyarrow as pa
        import pyarrow.compute as pc
        import pyarrow.parquet as pq
        import ray
        import ray.data as rd

        from engine.lineage import Lineage

        man = TableIO.manifest(uri)
        root = Path(uri)
        data = root / "data"
        next_version = man["version"] + 1
        t0 = time.time()

        ds = ds.materialize()  # consumed twice: key probe + fragment write
        keys = ds.select_columns([key]).to_pandas()[key].to_numpy()
        kref = ray.put(pa.array(np.unique(keys)))

        frag_by_path = {f["path"]: f for f in man["fragments"]}
        paths = [str(root / p) for p in frag_by_path]

        def hits(t: pa.Table) -> pa.Table:
            vs = ray.get(kref)
            m = pc.fill_null(pc.is_in(t[key], value_set=vs.cast(t[key].type)), False)
            return t.filter(m).select(["path"])

        probe = rd.read_parquet(paths, columns=[key], include_paths=True)
        # unique() returns None on an all-filtered (no-hit) dataset
        hit_paths = set(probe.map_batches(hits, batch_format="pyarrow",
                                          zero_copy_batch=True).unique("path") or [])
        affected = [p for p in paths if p in hit_paths]
        rel = {str(root / p): p for p in frag_by_path}
        keep = [frag_by_path[rel[p]] for p in paths if p not in hit_paths]

        lineage = Lineage(uri)
        fid = max((f["id"] for f in man["fragments"]), default=-1) + 1
        new_frags = []

        def _land(staging: Path, input_fragments: list[int], tag: str):
            nonlocal fid
            for p in sorted(staging.glob("*.parquet")):
                name = f"frag-{fid}-v{next_version}-epoch-{epoch}.parquet"
                os.rename(p, data / name)
                rows = pq.read_metadata(data / name).num_rows
                new_frags.append({"id": fid, "path": f"data/{name}", "rows": rows,
                                  **({tag: input_fragments} if input_fragments else {})})
                lineage.commit(
                    fid, input_fragments=input_fragments, row_start=0, row_end=rows,
                    epoch=epoch, rows_out=rows,
                    bytes_out=(data / name).stat().st_size,
                    wall_s=time.time() - t0, data_file=f"data/{name}")
                fid += 1
            staging.rmdir()

        if affected:
            def drop_hits(t: pa.Table) -> pa.Table:
                vs = ray.get(kref)
                m = pc.fill_null(pc.is_in(t[key], value_set=vs.cast(t[key].type)), False)
                return t.filter(pc.invert(m))

            staging = root / f".staging-upsert-old-{next_version}"
            staging.mkdir(parents=True, exist_ok=True)
            (rd.read_parquet(affected)
             .map_batches(drop_hits, batch_format="pyarrow", zero_copy_batch=True)
             .write_parquet(str(staging)))
            _land(staging, [frag_by_path[rel[p]]["id"] for p in affected],
                  "rewritten_from")

        staging = root / f".staging-upsert-new-{next_version}"
        staging.mkdir(parents=True, exist_ok=True)
        ds.write_parquet(str(staging))
        _land(staging, [], "")

        frags = sorted(keep, key=lambda f: f["id"]) + new_frags
        out = {"version": next_version, "created_at": time.time(),
               "fragments": frags, "rows": sum(f["rows"] for f in frags),
               "upsert_of": man["version"], "upsert_key": key}
        vdir = root / "_versions"
        tmp = vdir / f".tmp-{next_version}.manifest.json"
        tmp.write_text(json.dumps(out, indent=1))
        os.rename(tmp, vdir / f"{next_version}.manifest.json")
        return out
