"""Deterministic synthetic fixtures (FIXTURES.md A1–A3, seed 42).

Generates the canonical `images` input table (BASELINE.json input_hint
shape: image_id, bytes, w, h, fmt, caption, phash), the `observations`
entity-timeline table, and the `query_grid` backfill grid — with NO
external data. Every row is derived from a per-row rng substream
(`default_rng([seed, stream, i])`) so generation is order- and
partition-independent: a Ray pipeline generating rows [a, b) produces
byte-identical rows to a local single-process run.

Scale note (100 TB thinking): `images_dataset(n)` builds the table as
`ray.data.range(n) -> map_batches(gen)` so generation itself is
embarrassingly parallel and never materializes on the driver.
"""

from __future__ import annotations

import numpy as np

from engine.ops.multimodal import wav_encode
import pyarrow as pa

from engine.fixtures import codecs
from engine.ops.phash import phash_pixels

SIZES = np.array([8, 16, 24, 32, 48, 64])
# "large" profile: realistic web-image sizes for benchmarking — decode +
# DCT cost ~3ms/image so the featurize stage is compute-bound like a real
# 100 TB run (tiny default sizes make scheduling overhead dominate and
# scaling measurements meaningless). Tests/golden stay on the default.
SIZES_LARGE = np.array([64, 96, 128, 192, 256])
SIZE_PROFILES = {"default": SIZES, "large": SIZES_LARGE}


def _size_p(sizes: np.ndarray) -> np.ndarray:
    return (1.0 / sizes) / (1.0 / sizes).sum()


_SIZE_P = _size_p(SIZES)
FORMATS = ["raw", "ppm", "png"]
VOCAB = [f"{c}{i:02d}" for c in ("tok", "img", "cap", "word") for i in range(64)]
assert len(VOCAB) == 256
HOT_FRACTION = 0.10  # near-duplicate rows -> hot phash buckets (skew knob)
N_HOT_BASES = 4
EPOCH_2024_US = np.datetime64("2024-01-01T00:00:00", "us").astype(np.int64)


def _rng(seed: int, stream: int, i: int) -> np.random.Generator:
    return np.random.default_rng([seed, stream, i])


def _base_pixels(rng: np.random.Generator, w: int, h: int) -> np.ndarray:
    g1 = rng.uniform(0.0, 1.0, h)
    g2 = rng.uniform(0.0, 1.0, w)
    base = np.outer(g1, g2)
    img = np.empty((h, w, 3), dtype=np.uint8)
    for c, scale in enumerate((1.0, 0.8, 0.6)):
        noise = rng.uniform(-0.05, 0.05, (h, w))
        img[..., c] = np.clip((base * scale + noise) * 255.0, 0, 255).astype(np.uint8)
    return img


def gen_image_row(i: int, seed: int = 42, size_profile: str = "default") -> dict:
    sizes = SIZE_PROFILES[size_profile]
    rng = _rng(seed, 0, i)
    hot = rng.uniform() < HOT_FRACTION
    if hot:
        # shared base image + tiny noise -> phash collapses into hot buckets
        k = int(rng.integers(0, N_HOT_BASES))
        w = h = int(sizes[sizes >= 32][0]) if (sizes >= 32).any() else int(sizes[-1])
        base = _base_pixels(_rng(seed, 100, k), w, h).astype(np.int16)
        jitter = rng.integers(-1, 2, base.shape, dtype=np.int16)
        pixels = np.clip(base + jitter, 0, 255).astype(np.uint8)
    else:
        p = _size_p(sizes)
        w = int(rng.choice(sizes, p=p))
        h = int(rng.choice(sizes, p=p))
        pixels = _base_pixels(rng, w, h)
    fmt = FORMATS[int(rng.integers(0, len(FORMATS)))]
    n_words = int(rng.integers(3, 13))
    caption = " ".join(VOCAB[j] for j in rng.integers(0, 256, n_words))
    return {
        "image_id": "img_%09d" % i,
        "bytes": codecs.ENCODERS[fmt](pixels),
        "w": w,
        "h": h,
        "fmt": fmt,
        "caption": caption,
        "phash": phash_pixels(pixels),
    }


IMAGES_SCHEMA = pa.schema(
    [
        ("image_id", pa.string()),
        ("bytes", pa.binary()),
        ("w", pa.int32()),
        ("h", pa.int32()),
        ("fmt", pa.string()),
        ("caption", pa.string()),
        ("phash", pa.int64()),
    ]
)


def images_table(lo: int, hi: int, seed: int = 42, size_profile: str = "default") -> pa.Table:
    rows = [gen_image_row(i, seed, size_profile) for i in range(lo, hi)]
    cols = {name: [r[name] for r in rows] for name in IMAGES_SCHEMA.names}
    return pa.Table.from_pydict(cols, schema=IMAGES_SCHEMA)


def images_dataset(n: int, seed: int = 42, parallelism: int = -1,
                   size_profile: str = "default"):
    """Distributed generation: range(n) -> map_batches(gen). Lazy."""
    import ray.data as rd

    def gen(batch: pa.Table) -> pa.Table:
        ids = batch["id"].to_numpy()
        return (images_table(0, 0, seed, size_profile) if len(ids) == 0
                else _images_for(ids, seed, size_profile))

    return rd.range(n, override_num_blocks=parallelism if parallelism > 0 else None).map_batches(
        gen, batch_format="pyarrow", batch_size=512
    )


def _images_for(ids: np.ndarray, seed: int, size_profile: str = "default") -> pa.Table:
    rows = [gen_image_row(int(i), seed, size_profile) for i in ids]
    cols = {name: [r[name] for r in rows] for name in IMAGES_SCHEMA.names}
    return pa.Table.from_pydict(cols, schema=IMAGES_SCHEMA)


# ------------------------------------------------------------ timelines --

OBS_SCHEMA = pa.schema(
    [
        ("image_id", pa.string()),
        ("ts", pa.timestamp("us")),
        ("seq", pa.int64()),
        ("event_type", pa.string()),
        ("value", pa.float64()),
    ]
)
EVENT_TYPES = ["ingest", "recaption", "view"]


def observations_table(n_entities: int, seed: int = 42) -> pa.Table:
    """FIXTURES.md A2: 1–20 events per entity (geometric p=.15, capped),
    exp(1h) arrivals with 20% exp(72h) gaps; 1% of entities get one
    duplicated (image_id, ts) row (dedup tests D1). `seq` is assigned by
    global ts order (monotone tie-breaker)."""
    ids, tss, types, vals = [], [], [], []
    for e in range(n_entities):
        rng = _rng(seed, 1, e)
        k = min(20, int(rng.geometric(0.15)))
        gaps_h = np.where(rng.uniform(size=k) < 0.2, rng.exponential(72.0, k), rng.exponential(1.0, k))
        ts = EPOCH_2024_US + np.cumsum((gaps_h * 3600e6)).astype(np.int64)
        if rng.uniform() < 0.01 and k >= 1:
            ts = np.append(ts, ts[int(rng.integers(0, k))])  # exact duplicate ts
        for t in ts:
            ids.append("img_%09d" % e)
            tss.append(int(t))
            types.append(EVENT_TYPES[int(rng.integers(0, 3))])
            vals.append(float(np.round(rng.normal(), 6)))
    order = np.lexsort((np.arange(len(tss)), np.asarray(tss)))
    arr = lambda x, dt=None: np.asarray(x)[order]
    return pa.Table.from_pydict(
        {
            "image_id": arr(ids),
            "ts": arr(tss).astype("datetime64[us]"),
            "seq": np.arange(len(order), dtype=np.int64),
            "event_type": arr(types),
            "value": arr(vals),
        },
        schema=OBS_SCHEMA,
    )


def query_grid_table(obs: pa.Table, step_us: int = 3_600_000_000, cap: int = 64) -> pa.Table:
    """FIXTURES.md A3: per entity an hourly grid over [min_ts, max_ts+24h],
    capped at `cap` points."""
    import pandas as pd

    df = obs.select(["image_id", "ts"]).to_pandas()
    g = df.groupby("image_id")["ts"].agg(["min", "max"]).reset_index()
    ids, tss = [], []
    day_us = 86_400_000_000
    for _, row in g.iterrows():
        lo = row["min"].value // 1000  # ns -> us
        hi = row["max"].value // 1000 + day_us
        pts = np.arange(lo, hi + 1, step_us)[:cap]
        ids.extend([row["image_id"]] * len(pts))
        tss.append(pts)
    ts = np.concatenate(tss) if tss else np.empty(0, np.int64)
    return pa.Table.from_pydict(
        {"image_id": ids, "ts": ts.astype("datetime64[us]")},
        schema=pa.schema([("image_id", pa.string()), ("ts", pa.timestamp("us"))]),
    )


AUDIO_SCHEMA = pa.schema([
    ("audio_id", pa.string()),
    ("bytes", pa.binary()),
    ("sr", pa.int32()),
    ("n_samples", pa.int64()),
])


def gen_audio_row(i: int, seed: int = 42, sr: int = 16000) -> dict:
    """Deterministic mono PCM16 WAV clip: two sine partials + noise, with
    per-row frequency/duration — real WAV bytes the stdlib decoder in
    engine/ops/multimodal.py (wav_decode) round-trips exactly. wav_encode
    is imported at module level: this function runs on workers via
    pickle-by-value, where in-function engine imports fail."""
    rng = _rng(seed, 11, i)
    n = int(rng.integers(sr // 8, sr // 3))            # 0.125–0.33 s
    f0 = float(rng.uniform(100, 3000))
    f1 = float(rng.uniform(100, 3000))
    t = np.arange(n) / sr
    sig = (0.5 * np.sin(2 * np.pi * f0 * t)
           + 0.25 * np.sin(2 * np.pi * f1 * t)
           + 0.05 * rng.standard_normal(n))
    return {"audio_id": f"aud_{i:08d}", "bytes": wav_encode(sig, sr),
            "sr": sr, "n_samples": n}


def audio_table(lo: int, hi: int, seed: int = 42, sr: int = 16000) -> pa.Table:
    rows = [gen_audio_row(i, seed, sr) for i in range(lo, hi)]
    cols = {name: [r[name] for r in rows] for name in AUDIO_SCHEMA.names}
    return pa.table(cols, schema=AUDIO_SCHEMA)


def audio_dataset(n: int, seed: int = 42, parallelism: int = -1, sr: int = 16000):
    """Distributed audio-clip generation: range(n) -> map_batches. Lazy."""
    import ray.data as rd

    def gen(batch: pa.Table) -> pa.Table:
        ids = batch["id"].to_numpy()
        if len(ids) == 0:
            return audio_table(0, 0, seed, sr)
        rows = [gen_audio_row(int(i), seed, sr) for i in ids]
        cols = {name: [r[name] for r in rows] for name in AUDIO_SCHEMA.names}
        return pa.table(cols, schema=AUDIO_SCHEMA)

    return rd.range(n, override_num_blocks=parallelism if parallelism > 0 else None).map_batches(
        gen, batch_format="pyarrow", batch_size=256
    )
