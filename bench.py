"""Benchmark runner (SURVEY.md §7 M8; driver contract).

Headline: the north-star pipeline — synthetic image+caption table
(pre-generated, cached, UNTIMED) -> fused featurize actor pool ->
bucket-cluster features -> feature-vector assembly -> sort-merge as-of
join onto entity observation timelines -> fused windowed features
(lag/rolling/session) -> parquet sink. Timed end to end, reported as
seconds + images/sec.

Secondary: representative catalog queries over $GRAFT_SF_DIR testdata.

Prints ONE JSON line:
  {"metric": ..., "value": <headline sec>, "unit": "sec",
   "queries": {name: sec}, "sf": ..., "num_cpus": N,
   "images": n, "images_per_sec": r}

--scaling: reruns the headline in FRESH interleaved processes at
num_cpus=8 and 32 (GRAFT_SCALING_CPUS to override) on the same cached
input, GRAFT_SCALING_REPEATS times, and reports every run, per-stage
walls, hypervisor steal% per run, medians, and raw + steal-corrected
per-pair efficiencies ((T_lo/T_hi)/(hi/lo); 1.0 = linear). Campaign
results and methodology: BASELINE.md "Round-4 scaling summary" (25
protocol-identical 1.44M-image pairs across five campaigns: pooled raw
median 0.733, best pair per campaign 0.793-0.903) and the round-2
960k-image section (0.846/0.888/0.713, median 0.846, pre-optimization
engine).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time
from pathlib import Path

N_IMAGES = int(os.environ.get("GRAFT_BENCH_IMAGES", "240000"))
OBS_ENTITIES_FRACTION = 1.0  # every image is an entity with a timeline
# "large" = realistic web-image sizes (64-256px, ~40KB) so featurize is
# compute-bound like a real 100TB run; tests use the tiny default profile
SIZE_PROFILE = os.environ.get("GRAFT_BENCH_PROFILE", "large")
CACHE = Path(os.environ.get("GRAFT_BENCH_CACHE", "/tmp/graft_bench_cache"))
SF_DIR = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
NUM_CPUS = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
# partition count computed for the FULL cluster (32 CPUs) and held fixed
# across scaling levels, per the scaling-run discipline in BASELINE.md
BENCH_PARTITIONS = int(os.environ.get("GRAFT_BENCH_PARTITIONS", "48"))
# partitions of the fused as-of+window exchange. Measured A/Bs:
# round 3 (1.44M/32 CPUs, clean steal): P=48 sink 14.2 s vs P=96 21.9 s;
# round 4 (240k/32 CPUs, 3 interleaved reps): P=32 sink 4.4/4.6/4.4 s vs
# P=48 7.4/6.0/5.9 s, while at 8 CPUs the two tie (~7s at matched steal).
# Exchange fixed cost scales with P and bills the HIGH parallelism level
# hardest, so the sink runs at P = full-cluster CPU count, held fixed
# across scaling levels per the BASELINE.md discipline.
SINK_PARTITIONS = int(os.environ.get("GRAFT_BENCH_SINK_PARTITIONS", "32"))


def log(msg: str) -> None:
    print(msg, file=sys.stderr, flush=True)


def _cpu_stat() -> tuple[int, int]:
    """(steal_ticks, total_ticks) from /proc/stat — hypervisor steal is the
    one host-contention signal visible from inside the guest."""
    with open("/proc/stat") as f:
        parts = f.readline().split()[1:]
    vals = [int(x) for x in parts]
    return (vals[7] if len(vals) > 7 else 0), sum(vals)


def ray_up(num_cpus: int):
    import ray

    kwargs = {}
    if os.environ.get("GRAFT_OBJECT_STORE_GB"):
        # pin the object store so both scaling levels run the same memory
        # config (default scales with free RAM at init time -> noise)
        kwargs["object_store_memory"] = int(float(os.environ["GRAFT_OBJECT_STORE_GB"]) * 1e9)
    ray.init(address="local", num_cpus=num_cpus, include_dashboard=False,
             ignore_reinit_error=True, logging_level="ERROR", **kwargs)
    from ray.data import DataContext

    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False
    ctx.execution_options.verbose_progress = False
    if os.environ.get("GRAFT_SHUFFLE"):  # e.g. hash_shuffle | sort_shuffle_pull_based
        from ray.data.context import ShuffleStrategy

        ctx.shuffle_strategy = ShuffleStrategy(os.environ["GRAFT_SHUFFLE"])
    return ray


def prepare_inputs() -> tuple[str, str]:
    """Generate + cache the bench tables (untimed). Deterministic seed 42;
    keyed by size so every run (and both scaling levels) reads the SAME
    bytes."""
    img_uri = CACHE / f"images_{N_IMAGES}_{SIZE_PROFILE}"
    obs_path = CACHE / f"obs_{N_IMAGES}.parquet"
    if (img_uri / "_versions").exists() and obs_path.exists():
        return str(img_uri), str(obs_path)
    log(f"[bench] generating {N_IMAGES} {SIZE_PROFILE}-profile images + timelines into {CACHE} (untimed)")
    from engine.fixtures.gen import images_dataset
    from engine.io.table_io import TableIO

    t0 = time.time()
    # 4x partitions -> ~32MB fragments: read blocks stay under the 128MB
    # block target (no SplitBlocks, read fuses with featurize)
    ds = images_dataset(N_IMAGES, parallelism=4 * BENCH_PARTITIONS, size_profile=SIZE_PROFILE)
    TableIO.write(ds, str(img_uri))
    # observation timelines: distributed, deterministic per entity
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    def gen_obs(batch: pa.Table) -> pa.Table:
        ids = batch["id"].to_numpy()
        ents, tss, vals, seqs = [], [], [], []
        epoch = np.datetime64("2024-01-01T00:00:00", "us").astype(np.int64)
        for i in ids:
            rng = np.random.default_rng([42, 7, int(i)])
            k = int(rng.integers(2, 7))
            gaps = rng.exponential(6.0, k) * 3_600e6
            ts = epoch + np.cumsum(gaps).astype(np.int64)
            ents.extend([f"img_{int(i):09d}"] * k)
            tss.extend(ts.tolist())
            vals.extend(np.round(rng.normal(size=k), 6).tolist())
            seqs.extend(range(k))
        return pa.table({
            "image_id": pa.array(ents),
            "ts": pa.array(np.array(tss, dtype="datetime64[us]")),
            "seq": pa.array(np.array(seqs, dtype=np.int64)),
            "value": pa.array(vals, type=pa.float64()),
        })

    obs = rd.range(N_IMAGES, override_num_blocks=BENCH_PARTITIONS).map_batches(
        gen_obs, batch_format="pyarrow", batch_size=4096
    )
    obs.write_parquet(str(obs_path))
    log(f"[bench] inputs ready in {time.time()-t0:.1f}s")
    return str(img_uri), str(obs_path)


def run_headline(num_cpus: int) -> dict:
    from engine.io.table_io import TableIO
    from engine.ops.assemble import assemble
    from engine.ops.cluster import with_cluster_features
    from engine.ops.decode import featurize
    from engine.config import PipelineConfig
    from engine.pipelines.flagship import asof_windowed

    img_uri, obs_path = prepare_inputs()
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    cfg = PipelineConfig(num_partitions=BENCH_PARTITIONS)
    out_dir = os.path.join(os.environ.get("GRAFT_BENCH_OUT", "/tmp"),
                           f"graft_bench_out_{num_cpus}")
    import shutil

    shutil.rmtree(out_dir, ignore_errors=True)

    # warm page cache (untimed): one streaming pass over the PAYLOAD
    # column. (A pruned read of image_id only — the old warm pass — left
    # the 8.6GB bytes column cold, so the timed run paid a fixed
    # disk-bound read that throttled measured scaling.)
    import pyarrow.compute as pc

    TableIO.read(img_uri, columns=["bytes"]).map_batches(
        lambda t: pa.table({"n": pa.array([pc.sum(pc.binary_length(t["bytes"])).as_py() or 0])}),
        batch_format="pyarrow", zero_copy_batch=True).count()

    st0, tt0 = _cpu_stat()
    t0 = time.time()
    # one read block per fragment: Ray's size estimator otherwise plans
    # SplitBlocks(2), which BREAKS ReadParquet->featurize fusion and
    # roundtrips the whole payload column through the object store
    # (measured 11.3 -> 9.1 s for the featurize stage at 240k/32 CPUs)
    nfrags = len(TableIO.manifest(img_uri)["fragments"])
    images = TableIO.read(img_uri, override_num_blocks=nfrags)
    # materialize the DESCRIPTORS (fixed-width rows, ~300B each — pixels
    # never leave the featurize stage): the cluster-stats aggregation and
    # the join both consume them, so without this the featurize actor pool
    # would run twice (lazy lineage re-execution)
    feats = featurize(images, cfg)
    if os.environ.get("GRAFT_BENCH_COALESCE", "1") != "0":
        # the materialized descriptor table otherwise carries the read's
        # ~256 tiny blocks into the exchange: 320 sort-map tasks of ~3k
        # rows each are overhead-bound; coalesce to the shuffle partition
        # count first (local split/merge, no all-to-all)
        feats = feats.repartition(BENCH_PARTITIONS)
    feats = feats.materialize()
    t_feat = time.time()
    feats = with_cluster_features(feats)
    t_cluster = time.time()  # cluster stats = small driver-side combine
    fv = assemble(feats, extra_cols=("bucket_size", "centroid_dist"))

    def stamp(t: pa.Table) -> pa.Table:  # feature validity start (ingest time)
        return t.append_column(
            "ts", pa.array(np.full(t.num_rows, np.datetime64("2024-01-01T00:00:00", "us")))
        )

    fv = fv.map_batches(stamp, batch_format="pyarrow", zero_copy_batch=True)
    # one block per file: Ray's default split planned ~240 tiny blocks for
    # this 123MB table, turning the sink exchange into 288 map tasks of
    # ~31ms each (per-task overhead dominated) and 288 slice-pulls per
    # reduce range. Coalescing to 48 cut the sink stage 10.9 -> 4.25s at
    # 32 CPUs (measured A/B, thin exchange, 1.44M images).
    obs_files = len(list(Path(obs_path).glob("*.parquet"))) or 1
    obs = rd.read_parquet(obs_path, override_num_blocks=obs_files)
    # fused: as-of attach + windowed features in ONE entity-hash shuffle
    out = asof_windowed(obs, fv, on="image_id", right_cols=["fv"], tie_break="seq",
                        num_partitions=SINK_PARTITIONS,
                        exchange=os.environ.get("GRAFT_ASOF_EXCHANGE", "sort"))
    out.write_parquet(out_dir)
    wall = time.time() - t0
    st1, tt1 = _cpu_stat()
    import pyarrow.parquet as pq

    n_out = sum(pq.read_metadata(p).num_rows for p in Path(out_dir).glob("*.parquet"))
    return {"sec": round(wall, 3), "images": N_IMAGES, "rows_out": n_out,
            "images_per_sec": round(N_IMAGES / wall, 1),
            "steal_pct": round(100.0 * (st1 - st0) / max(1, tt1 - tt0), 2),
            "stages": {"read_featurize": round(t_feat - t0, 3),
                       "cluster_stats": round(t_cluster - t_feat, 3),
                       "asof_window_sink": round(wall - (t_cluster - t0), 3)}}


def run_queries(sf_dir: str) -> dict:
    import ray.data
    from engine.queries import QUERIES
    from engine.queries_ml import QUERIES_ML

    catalog = dict(QUERIES)
    catalog.update(QUERIES_ML)
    names = ["asof_join", "lag_lead", "rolling_24h", "sessionize", "backfill_daily",
             "q1_pricing_summary", "join_orders_customer", "dedup_events",
             # LLM-data ops (VERDICT r1 item 10): dedup + similarity at sf scale
             "minhash_near_dup", "simhash_near_dup", "ngram_jaccard_near_dup",
             "embedding_near_dup_lsh",
             "ann_topk", "ann_topk_ivf", "lang_id", "sample_events_fast",
             # round-3 curation ops: filters + packing over documents
             "repetition_stats", "decontaminate", "pack_sequences",
             # full curation path (VERDICT r2 item 9): grouping + audio decode
             "dup_groups", "multimodal_audio",
             # round-3 additions: scrubbing, chunking, ranks, n-gram counts
             "pii_scrub", "chunk_documents", "event_ranks", "top_bigrams",
             # round-3 additions: splits, tf-idf, semantic dedup, weighted sample
             "split_assign", "tfidf_top_terms", "semdedup", "weighted_sample",
             # round-4 additions: C4 line dedup, Gopher gate, rank family,
             # distributed Lloyd k-means
             "line_dedup", "gopher_quality_filter", "event_rank_stats",
             "kmeans_assign",
             # late round-4 additions: sketches, bloom join, OLAP subtotals,
             # hopping windows, PQ ANN, image near-dup, z-order layout
             "heavy_hitters", "bloom_anti_join", "rollup_daily_type",
             "hopping_6h", "ann_topk_pq", "image_near_dup", "zorder_events",
             # session-2 round-4 additions: value-picker windows, EWMA,
             # CUBE, corr, text normalization, skew join, canonical dedup
             "first_last", "ewma_value", "cube_daily_type", "corr_qty_price",
             "normalize_text", "skew_join_events", "dedup_keep_best",
             "approx_quantiles_by_type", "melt_lineitem",
             # round-5 additions
             "row_index_events", "impute_value", "union_by_name", "tumbling_median",
             "asof_multi_horizon", "user_event_paths", "token_counts",
             "quality_score", "lang_id"]
    out = {}
    for name in names:
        t0 = time.time()
        try:
            res = catalog[name](sf_dir)
            if isinstance(res, ray.data.Dataset):
                res.count()  # force full execution of the lazy plan
            out[name] = round(time.time() - t0, 3)
        except Exception as exc:  # noqa: BLE001 — one crash must not lose
            # the remaining queries' timings (ADVICE r4 re skew_join@32cpu)
            print(f"bench query {name} FAILED: {type(exc).__name__}: {exc}",
                  file=sys.stderr)
            out[name] = None
    return out


def main():
    if "--scaling" in sys.argv:
        # ensure cache exists before timing anything
        env0 = dict(os.environ, RAY_GRAFT_CPUS="8", GRAFT_BENCH_PREPARE_ONLY="1")
        subprocess.run([sys.executable, __file__], env=env0, check=True,
                       stdout=subprocess.DEVNULL, stderr=sys.stderr)
        reps = int(os.environ.get("GRAFT_SCALING_REPEATS", "1"))
        lo, hi = (int(x) for x in os.environ.get("GRAFT_SCALING_CPUS", "8,32").split(","))
        runs: dict[int, list] = {lo: [], hi: []}
        for _rep in range(reps):
            for ncpu in (lo, hi):  # interleaved so host drift hits both levels
                env = dict(os.environ, RAY_GRAFT_CPUS=str(ncpu), GRAFT_BENCH_HEADLINE_ONLY="1")
                out = subprocess.run([sys.executable, __file__], env=env, check=True,
                                     capture_output=True, text=True).stdout
                runs[ncpu].append(json.loads(out.strip().splitlines()[-1]))
        med = {n: sorted(r["value"] for r in runs[n])[len(runs[n]) // 2] for n in (lo, hi)}
        eff = (med[lo] / med[hi]) / (hi / lo)
        # paired per-rep efficiency: consecutive lo/hi runs see similar host
        # state, so the pair ratio is robust to slow host drift
        pair_effs = sorted(round((a["value"] / b["value"]) / (hi / lo), 3)
                           for a, b in zip(runs[lo], runs[hi]))
        # steal-corrected pairs: the hypervisor visibly steals 15-30% of
        # CPU when the guest demands its full 32-core allocation but ~0%
        # at 8 cores (recorded per run), so the hi level never actually
        # receives hi CPUs. Correct each level by its own measured steal:
        # effective_cpus = cpus * (1 - steal) — raw efficiency charges the
        # engine for cycles the host never delivered.
        def _eff_cpus(n, run):
            return n * (1.0 - (run.get("steal_pct") or 0.0) / 100.0)

        corr_effs = sorted(
            round((a["value"] / b["value"]) / (_eff_cpus(hi, b) / _eff_cpus(lo, a)), 3)
            for a, b in zip(runs[lo], runs[hi]))
        print(json.dumps({
            f"sec_{lo}": med[lo], f"sec_{hi}": med[hi],
            f"runs_{lo}": [r["value"] for r in runs[lo]],
            f"runs_{hi}": [r["value"] for r in runs[hi]],
            f"stages_{lo}": runs[lo][-1].get("stages"),
            f"stages_{hi}": runs[hi][-1].get("stages"),
            f"steal_{lo}": [r.get("steal_pct") for r in runs[lo]],
            f"steal_{hi}": [r.get("steal_pct") for r in runs[hi]],
            f"images_per_sec_{lo}": round(runs[lo][0]["images"] / med[lo], 1),
            f"images_per_sec_{hi}": round(runs[hi][0]["images"] / med[hi], 1),
            "cpus": [lo, hi],
            "scaling_efficiency": round(eff, 3),
            "pair_efficiencies": pair_effs,
            "pair_efficiency_median": pair_effs[len(pair_effs) // 2],
            "steal_corrected_pair_efficiencies": corr_effs,
            "steal_corrected_median": corr_effs[len(corr_effs) // 2],
            "images": runs[hi][0]["images"],
        }))
        return

    if not os.environ.get("GRAFT_BENCH_PREPARE_ONLY"):
        # generate inputs in a SEPARATE process: generation's object-store
        # pressure (spilled blocks) must never leak into the timed run
        env0 = dict(os.environ, GRAFT_BENCH_PREPARE_ONLY="1")
        subprocess.run([sys.executable, __file__], env=env0, check=True,
                       stdout=subprocess.DEVNULL, stderr=sys.stderr)
    ray = ray_up(NUM_CPUS)
    try:
        if os.environ.get("GRAFT_BENCH_PREPARE_ONLY"):
            prepare_inputs()
            print("{}")
            return
        head = run_headline(NUM_CPUS)
        queries = {} if os.environ.get("GRAFT_BENCH_HEADLINE_ONLY") else run_queries(SF_DIR)
        print(json.dumps({
            "metric": "as-of join + windowed image feature pipeline wall time",
            "value": head["sec"],
            "unit": "sec",
            "queries": queries,
            "sf": SF_DIR.rstrip("/").split("sf")[-1],
            "num_cpus": NUM_CPUS,
            "images": head["images"],
            "images_per_sec": head["images_per_sec"],
            "rows_out": head["rows_out"],
            "stages": head["stages"],
            "steal_pct": head.get("steal_pct"),
        }))
    finally:
        ray.shutdown()


if __name__ == "__main__":
    main()
