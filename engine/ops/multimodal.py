"""Multimodal column plumbing: opaque binary payloads + typed metadata,
decoded / feature-extracted by actor-pool map_batches stages.

Image decode is REAL (engine/fixtures/codecs.py pure-NumPy raw/ppm/png).
Audio decode is REAL for WAV/PCM (stdlib `wave` — 8/16/32-bit int PCM,
mono or multichannel): RMS + spectral centroid on the actual samples.
The video demuxer remains a STUB (container demuxing needs codec
libraries absent here): it raises NotImplementedError unless constructed
with `fake=True`, in which case a clearly-marked deterministic fake
stands in — the Ray-side plumbing (schema, batch size, actor signature,
output layout) is real and tested; only the codec math is faked. The
audio stage retains the same fake mode for payloads that are not WAV.

Batch-size guidance: binary payload stages should run with SMALL
batch_size (payload bytes x batch_size x concurrency must fit worker
heap) — callers pass cfg.featurize_batch_size-style values.
"""

from __future__ import annotations

import hashlib
import io
import struct
import wave

import numpy as np
import pyarrow as pa

from engine.fixtures import codecs


def wav_encode(samples: np.ndarray, sample_rate: int = 16000) -> bytes:
    """Minimal mono 16-bit PCM WAV encoder (stdlib struct only)."""
    pcm = np.round(np.clip(samples, -1.0, 1.0) * 32767.0).astype("<i2").tobytes()
    return (b"RIFF" + struct.pack("<I", 36 + len(pcm)) + b"WAVE"
            + b"fmt " + struct.pack("<IHHIIHH", 16, 1, 1, sample_rate,
                                    sample_rate * 2, 2, 16)
            + b"data" + struct.pack("<I", len(pcm)) + pcm)


def wav_decode(payload: bytes) -> tuple[np.ndarray, int]:
    """WAV bytes -> (float64 mono samples in [-1, 1], sample_rate).
    Handles 8/16/32-bit integer PCM; multichannel is averaged to mono."""
    with wave.open(io.BytesIO(payload)) as w:
        sr, ch, sw = w.getframerate(), w.getnchannels(), w.getsampwidth()
        raw = w.readframes(w.getnframes())
    if sw == 2:
        sig = np.frombuffer(raw, dtype="<i2").astype(np.float64) / 32768.0
    elif sw == 1:
        sig = (np.frombuffer(raw, dtype=np.uint8).astype(np.float64) - 128.0) / 128.0
    elif sw == 4:
        sig = np.frombuffer(raw, dtype="<i4").astype(np.float64) / 2147483648.0
    else:
        raise ValueError(f"unsupported PCM sample width: {sw}")
    if ch > 1:
        sig = sig.reshape(-1, ch).mean(axis=1)
    return sig, sr

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


def _fake_floats(payload, n: int, salt: str) -> np.ndarray:
    """DETERMINISTIC FAKE: digest-seeded pseudo-signal standing in for a
    real decoder. Marked fake; do not interpret numerically. Accepts any
    bytes-like (incl. zero-copy memoryview of an Arrow buffer)."""
    hh = hashlib.sha256(salt.encode())
    hh.update(payload)
    h = hh.digest()
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
            # zero-copy payload view straight off the Arrow buffer (the
            # as_py() path copies every image once per row)
            px = self.decoders[fmts[i]](memoryview(payload[i].as_buffer()),
                                        int(ws[i]), int(hs[i]))
            f = px.astype(np.float64)
            rows["id"].append(t[self.id_col][i].as_py())
            rows["w"].append(int(ws[i]))
            rows["h"].append(int(hs[i]))
            rows["mean_luma"].append(float((0.299 * f[..., 0] + 0.587 * f[..., 1] + 0.114 * f[..., 2]).mean()))
        return pa.table(rows, schema=IMAGE_FEATURES_SCHEMA)


class AudioFeatureStage:
    """REAL WAV/PCM decoder (stdlib `wave`): RMS + spectral centroid on
    the decoded samples. `fake=True` keeps the deterministic-fake
    plumbing path for non-WAV payloads (no other codec libs here)."""

    def __init__(self, id_col: str = "id", fake: bool = False, sample_rate: int = 16000):
        self.id_col, self.fake, self.sr = id_col, fake, sample_rate

    def _features(self, raw: bytes) -> tuple[int, float, float]:
        if self.fake:
            sig, sr, n = _fake_floats(raw, 1024, "audio"), self.sr, len(raw)
        else:
            sig, sr = wav_decode(raw)
            n = sig.size
        if sig.size == 0:  # valid zero-frame WAV: rfft would raise
            return n, 0.0, 0.0
        spec = np.abs(np.fft.rfft(sig))
        freqs = np.fft.rfftfreq(sig.size, 1.0 / sr)
        rms = float(np.sqrt((sig ** 2).mean())) if sig.size else 0.0
        cent = float((spec * freqs).sum() / max(spec.sum(), 1e-12))
        return n, rms, cent

    def __call__(self, t: pa.Table) -> pa.Table:
        payload = t["bytes"]
        if isinstance(payload, pa.ChunkedArray):
            payload = payload.combine_chunks()
        ids = t[self.id_col].to_pylist()
        rows = {"id": [], "n_samples": [], "rms": [], "spectral_centroid": []}
        for i in range(t.num_rows):
            n, rms, cent = self._features(memoryview(payload[i].as_buffer()))
            rows["id"].append(ids[i])
            rows["n_samples"].append(n)
            rows["rms"].append(rms)
            rows["spectral_centroid"].append(cent)
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
            raw = memoryview(payload[i].as_buffer())
            n_frames = max(1, len(raw) // self.frame_bytes)
            for fi in range(0, n_frames, self.every):
                ids.append(t[self.id_col][i].as_py())
                idxs.append(fi)
                # bytes() copies only the emitted frame slice (the output
                # column owns its bytes); the payload itself is never copied
                frames.append(bytes(raw[fi * self.frame_bytes : (fi + 1) * self.frame_bytes]))
        return pa.table({"id": ids, "frame_idx": pa.array(idxs, type=pa.int32()),
                         "frame_bytes": pa.array(frames, type=pa.binary())},
                        schema=VIDEO_FRAME_SCHEMA)


def decode_stage(ds, stage_cls, batch_size: int = 64, concurrency=None, **kwargs):
    """Attach a multimodal decode/feature stage with the small-batch sizing
    binary payloads need. Default: a STATELESS TASK with the stage instance
    cached per worker process (engine/ops/util.py stage_task — no per-query
    actor-pool startup, scales to every task slot). Pass `concurrency` to
    force an actor pool instead (state too heavy to replicate per worker)."""
    if concurrency is not None:
        return ds.map_batches(stage_cls, fn_constructor_kwargs=kwargs, batch_format="pyarrow",
                              zero_copy_batch=True, batch_size=batch_size, concurrency=concurrency)
    from engine.ops.util import stage_task

    return ds.map_batches(stage_task, fn_kwargs={"_stage_cls": stage_cls, **kwargs},
                          batch_format="pyarrow", zero_copy_batch=True, batch_size=batch_size)
