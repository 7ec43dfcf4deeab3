import numpy as np
import pytest

from engine.fixtures import codecs


@pytest.mark.parametrize("fmt", ["raw", "ppm", "png"])
@pytest.mark.parametrize("wh", [(8, 8), (16, 48), (64, 24), (1, 1)])
def test_roundtrip(fmt, wh):
    w, h = wh
    rng = np.random.default_rng(7)
    px = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
    dec = codecs.decode(codecs.ENCODERS[fmt](px), fmt, w, h)
    assert dec.shape == (h, w, 3)
    assert (dec == px).all()
    assert codecs.psnr(dec, px) == float("inf")


def test_png_filters_decode():
    """Decoder must handle Sub/Up/Average/Paeth, not just the encoder's filter 0."""
    import struct
    import zlib

    rng = np.random.default_rng(3)
    w, h = 5, 6
    px = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)

    # re-encode with a mix of filter types, applying the real filter math
    stride = w * 3
    raw = px.reshape(h, stride).astype(np.int32)
    lines = []
    ftypes = [0, 1, 2, 3, 4, 1]
    for y in range(h):
        f = ftypes[y]
        cur = raw[y]
        prev = raw[y - 1] if y else np.zeros(stride, np.int32)
        enc = np.zeros(stride, np.int32)
        for x in range(stride):
            a = cur[x - 3] if x >= 3 else 0
            b = prev[x]
            c = prev[x - 3] if x >= 3 else 0
            if f == 0:
                pred = 0
            elif f == 1:
                pred = a
            elif f == 2:
                pred = b
            elif f == 3:
                pred = (a + b) >> 1
            else:
                p = a + b - c
                pa_, pb, pc_ = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa_ <= pb and pa_ <= pc_) else (b if pb <= pc_ else c)
            enc[x] = (cur[x] - pred) & 0xFF
        lines.append(bytes([f]) + enc.astype(np.uint8).tobytes())
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    data = (
        codecs._PNG_SIG
        + codecs._chunk(b"IHDR", ihdr)
        + codecs._chunk(b"IDAT", zlib.compress(b"".join(lines)))
        + codecs._chunk(b"IEND", b"")
    )
    assert (codecs.decode_png(data) == px).all()


def test_ppm_comment_header():
    px = np.zeros((2, 3, 3), dtype=np.uint8)
    data = b"P6\n# a comment\n3 2\n255\n" + px.tobytes()
    assert (codecs.decode_ppm(data) == px).all()
