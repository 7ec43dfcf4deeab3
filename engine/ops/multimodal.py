"""Multimodal column plumbing: opaque binary payloads + typed metadata,
decoded / feature-extracted by actor-pool map_batches stages.

Image decode is REAL (engine/fixtures/codecs.py pure-NumPy raw/ppm/png).
Audio and video decoders are STUBS (no codec libraries in this
container): each raises NotImplementedError unless constructed with
`fake=True`, in which case a clearly-marked deterministic fake derives
fixed-width features from the payload bytes — the Ray-side plumbing
(schema, batch size, actor signature, output layout) is real and tested;
only the codec math is faked.

Batch-size guidance: binary payload stages should run with SMALL
batch_size (payload bytes x batch_size x concurrency must fit worker
heap) — callers pass cfg.featurize_batch_size-style values.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

from engine.fixtures import codecs

IMAGE_FEATURES_SCHEMA = pa.schema([
    ("id", pa.string()),
    ("w", pa.int32()),
    ("h", pa.int32()),
    ("mean_luma", pa.float64()),
])

AUDIO_FEATURES_SCHEMA = pa.schema([
    ("id", pa.string()),
    ("n_samples", pa.int64()),
    ("rms", pa.float64()),
    ("spectral_centroid", pa.float64()),
])

VIDEO_FRAME_SCHEMA = pa.schema([
    ("id", pa.string()),
    ("frame_idx", pa.int32()),
    ("frame_bytes", pa.binary()),
])


def _fake_floats(payload: bytes, n: int, salt: str) -> np.ndarray:
    """DETERMINISTIC FAKE: digest-seeded pseudo-signal standing in for a
    real decoder. Marked fake; do not interpret numerically."""
    h = hashlib.sha256(salt.encode() + payload).digest()
    rng = np.random.default_rng(np.frombuffer(h[:8], dtype=np.uint64)[0])
    return rng.standard_normal(n)


class ImageFeatureStage:
    """Real decode (raw/ppm/png) -> minimal feature row."""

    def __init__(self, id_col: str = "image_id"):
        self.decoders = dict(codecs.DECODERS)
        self.id_col = id_col

    def __call__(self, t: pa.Table) -> pa.Table:
        fmts = t["fmt"].to_pylist()
        ws, hs = t["w"].to_numpy(), t["h"].to_numpy()
        payload = t["bytes"]
        if isinstance(payload, pa.ChunkedArray):
            payload = payload.combine_chunks()
        rows = {"id": [], "w": [], "h": [], "mean_luma": []}
        for i in range(t.num_rows):
            px = self.decoders[fmts[i]](payload[i].as_py(), int(ws[i]), int(hs[i]))
            f = px.astype(np.float64)
            rows["id"].append(t[self.id_col][i].as_py())
            rows["w"].append(int(ws[i]))
            rows["h"].append(int(hs[i]))
            rows["mean_luma"].append(float((0.299 * f[..., 0] + 0.587 * f[..., 1] + 0.114 * f[..., 2]).mean()))
        return pa.table(rows, schema=IMAGE_FEATURES_SCHEMA)


class AudioFeatureStage:
    """STUB decoder: no audio codec libs in this container."""

    def __init__(self, id_col: str = "id", fake: bool = False, sample_rate: int = 16000):
        self.id_col, self.fake, self.sr = id_col, fake, sample_rate

    def __call__(self, t: pa.Table) -> pa.Table:
        if not self.fake:
            raise NotImplementedError(
                "audio decode requires a codec library not present in this "
                "container; construct AudioFeatureStage(fake=True) for the "
                "deterministic-fake plumbing path"
            )
        payload = t["bytes"]
        if isinstance(payload, pa.ChunkedArray):
            payload = payload.combine_chunks()
        rows = {"id": [], "n_samples": [], "rms": [], "spectral_centroid": []}
        for i in range(t.num_rows):
            raw = payload[i].as_py()
            sig = _fake_floats(raw, 1024, "audio")
            spec = np.abs(np.fft.rfft(sig))
            freqs = np.fft.rfftfreq(len(sig), 1 / self.sr)
            rows["id"].append(t[self.id_col][i].as_py())
            rows["n_samples"].append(len(raw))
            rows["rms"].append(float(np.sqrt((sig**2).mean())))
            rows["spectral_centroid"].append(float((spec * freqs).sum() / max(spec.sum(), 1e-12)))
        return pa.table(rows, schema=AUDIO_FEATURES_SCHEMA)


class VideoFrameSampleStage:
    """STUB frame sampler: emits every k-th 'frame' as a byte slice.
    Real implementation needs a container demuxer; the fake treats the
    payload as fixed-size concatenated frames (deterministic)."""

    def __init__(self, id_col: str = "id", fake: bool = False, frame_bytes: int = 256, every: int = 4):
        self.id_col, self.fake, self.frame_bytes, self.every = id_col, fake, frame_bytes, every

    def __call__(self, t: pa.Table) -> pa.Table:
        if not self.fake:
            raise NotImplementedError(
                "video demux requires a codec library not present in this "
                "container; construct VideoFrameSampleStage(fake=True)"
            )
        payload = t["bytes"]
        if isinstance(payload, pa.ChunkedArray):
            payload = payload.combine_chunks()
        ids, idxs, frames = [], [], []
        for i in range(t.num_rows):
            raw = payload[i].as_py()
            n_frames = max(1, len(raw) // self.frame_bytes)
            for fi in range(0, n_frames, self.every):
                ids.append(t[self.id_col][i].as_py())
                idxs.append(fi)
                frames.append(raw[fi * self.frame_bytes : (fi + 1) * self.frame_bytes])
        return pa.table({"id": ids, "frame_idx": pa.array(idxs, type=pa.int32()),
                         "frame_bytes": pa.array(frames, type=pa.binary())},
                        schema=VIDEO_FRAME_SCHEMA)


def decode_stage(ds, stage_cls, batch_size: int = 64, concurrency=(1, 4), **kwargs):
    """Attach a multimodal decode/feature stage as an actor pool with the
    small-batch sizing binary payloads need."""
    return ds.map_batches(stage_cls, fn_constructor_kwargs=kwargs, batch_format="pyarrow",
                          zero_copy_batch=True, batch_size=batch_size, concurrency=concurrency)
