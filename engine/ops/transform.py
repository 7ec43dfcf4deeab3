"""Image transform stage: decode -> resize / center-crop / flip ->
re-encode, as one batch stage (SURVEY.md §2.3 M-family extension — the
augmentation/thumbnail path of an image-curation pipeline).

Runs exactly like the featurize stage: per-worker cached instance
(engine.ops.util.stage_task), zero-copy memoryview inputs, pure-NumPy
codecs (PIL is absent in this sandbox — same offline constraint as
engine/ops/decode.py). Per-image Python dispatch is inherent (payloads
are variable-size), but every pixel operation inside is a vectorized
NumPy kernel; re-encoded payloads are assembled into one Arrow binary
column per batch.

Resize is the deterministic integer box-mean of engine/ops/phash.py's
area_resize_32 generalized to arbitrary (h, w) targets — exact-mean
downscale, numpy-reduceat upscale, no float drift between runs.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from engine.fixtures import codecs
from engine.ops.phash import _box_edges


def area_resize(img: np.ndarray, th: int, tw: int) -> np.ndarray:
    """Deterministic box-mean resize of an (h, w) or (h, w, 3) image to
    (th, tw); returns float64 (caller quantizes)."""
    h, w = img.shape[:2]
    rs, re = _box_edges(h, th)
    cs, ce = _box_edges(w, tw)
    x = img.astype(np.float64)
    rows = np.add.reduceat(x, rs, axis=0) / (re - rs).reshape(-1, *([1] * (x.ndim - 1)))
    out = np.add.reduceat(rows, cs, axis=1) / (ce - cs).reshape(1, -1, *([1] * (x.ndim - 2)))
    return out


def to_uint8(img: np.ndarray) -> np.ndarray:
    return np.clip(np.rint(img), 0, 255).astype(np.uint8)


def center_crop(img: np.ndarray, ch: int, cw: int) -> np.ndarray:
    h, w = img.shape[:2]
    if ch > h or cw > w:
        raise ValueError(f"center_crop: crop ({ch},{cw}) larger than image ({h},{w})")
    top, left = (h - ch) // 2, (w - cw) // 2
    return img[top:top + ch, left:left + cw]


def hflip(img: np.ndarray) -> np.ndarray:
    return img[:, ::-1]


class ImageTransformStage:
    """map_batches stage: bytes+fmt+w+h -> transformed bytes+fmt+w+h.

    Config: resize=(th, tw) box-mean resize; crop=(ch, cw) center crop
    (applied after resize); flip=True horizontal mirror; out_fmt in
    {'raw','ppm','png'}. Columns other than (bytes, w, h, fmt) pass
    through untouched (captions stay byte-equal per the input_hint)."""

    def __init__(self, resize: tuple | None = None, crop: tuple | None = None,
                 flip: bool = False, out_fmt: str = "ppm",
                 bytes_col: str = "bytes"):
        if out_fmt not in codecs.ENCODERS:
            raise ValueError(f"unknown out_fmt {out_fmt!r}")
        self.decoders = dict(codecs.DECODERS)
        self.encoder = codecs.ENCODERS[out_fmt]
        self.resize = tuple(resize) if resize else None
        self.crop = tuple(crop) if crop else None
        self.flip = bool(flip)
        self.out_fmt = out_fmt
        self.bytes_col = bytes_col

    def _one(self, px: np.ndarray) -> np.ndarray:
        if self.resize:
            px = to_uint8(area_resize(px, *self.resize))
        if self.crop:
            px = center_crop(px, *self.crop)
        if self.flip:
            px = np.ascontiguousarray(hflip(px))
        return px

    def __call__(self, batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        fmts = batch["fmt"].to_pylist()
        ws = batch["w"].to_numpy()
        hs = batch["h"].to_numpy()
        raw = batch[self.bytes_col]
        buf = raw.combine_chunks() if isinstance(raw, pa.ChunkedArray) else raw
        payloads, out_w, out_h = [], np.empty(n, np.int32), np.empty(n, np.int32)
        for i in range(n):
            data = memoryview(buf[i].as_buffer())
            px = self.decoders[fmts[i]](data, int(ws[i]), int(hs[i]))
            px = self._one(px)
            out_h[i], out_w[i] = px.shape[:2]
            payloads.append(self.encoder(px))
        t = batch
        for name, arr in ((self.bytes_col, pa.array(payloads, pa.binary())),
                          ("w", pa.array(out_w)), ("h", pa.array(out_h)),
                          ("fmt", pa.array([self.out_fmt] * n, pa.string()))):
            t = t.set_column(t.schema.get_field_index(name), name, arr)
        return t


def transform_images(ds, resize: tuple | None = None, crop: tuple | None = None,
                     flip: bool = False, out_fmt: str = "ppm"):
    """Dataset entry point — stateless tasks with a per-worker cached
    stage instance (fuses with the upstream read)."""
    from engine.ops.util import stage_task

    return ds.map_batches(
        stage_task,
        fn_kwargs={"_stage_cls": ImageTransformStage, "resize": resize,
                   "crop": crop, "flip": flip, "out_fmt": out_fmt},
        batch_format="pyarrow", zero_copy_batch=True)


def image_near_dup(images_ds, max_hamming: int = 3, id_col: str = "image_id"):
    """Perceptual near-duplicate image pairs: banded 64-bit phash
    (pigeonhole-complete for Hamming <= max_hamming when <= 3) + exact
    XOR-popcount verify — the image twin of simhash_near_dup, sharing
    its star-capped degenerate-bucket machinery."""
    from engine.ops.neardup import hash64_near_dup

    return hash64_near_dup(images_ds, id_col=id_col, hash_col="phash",
                           max_hamming=max_hamming)
