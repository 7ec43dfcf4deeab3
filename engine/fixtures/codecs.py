"""Pure-NumPy/stdlib image codecs: raw, ppm (P6), png (zlib).

The sandbox has no PIL/imageio (SURVEY.md §6 env row), so the fixture
generator and the decode stage share these offline-decodable formats
(FIXTURES.md A1 `fmt` column). PNG here is real PNG (signature, IHDR,
IDAT, IEND, CRCs); the encoder always writes filter 0 but the decoder
implements all five filter types (None/Sub/Up/Average/Paeth) so it is a
genuine, spec-compliant 8-bit-RGB decoder, not a fixture-only hack.

All codecs are lossless, so the PSNR>=40dB gate for lossy formats
(BASELINE.json input_hint) is trivially met; tests assert exact equality.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

# ---------------------------------------------------------------- raw ----

def encode_raw(pixels: np.ndarray) -> bytes:
    """H x W x 3 uint8, row-major RGB."""
    return np.ascontiguousarray(pixels, dtype=np.uint8).tobytes()


def decode_raw(data: bytes, w: int, h: int) -> np.ndarray:
    return np.frombuffer(data, dtype=np.uint8).reshape(h, w, 3)


# ---------------------------------------------------------------- ppm ----

def encode_ppm(pixels: np.ndarray) -> bytes:
    h, w = pixels.shape[:2]
    return b"P6\n%d %d\n255\n" % (w, h) + encode_raw(pixels)


def decode_ppm(data, w: int | None = None, h: int | None = None) -> np.ndarray:
    # Parse the three header tokens (magic, dims, maxval); '#' comments allowed.
    # Accepts any bytes-like (featurize passes zero-copy memoryviews); the
    # byte-wise header scan needs bytes methods, so copy just the header —
    # growing the copied slice until all three fields parse, so a spec-valid
    # comment block longer than the initial slice cannot truncate the header.
    body = data
    head = 256
    while True:
        data = bytes(body[:head])
        if data[:2] != b"P6":
            raise ValueError("not a P6 ppm")
        try:
            pos, fields = 2, []
            while len(fields) < 3:
                while pos < len(data) and data[pos : pos + 1].isspace():
                    pos += 1
                if data[pos : pos + 1] == b"#":
                    while data[pos : pos + 1] not in (b"\n", b""):
                        pos += 1
                    continue
                start = pos
                while pos < len(data) and not data[pos : pos + 1].isspace():
                    pos += 1
                if start == pos:  # ran off the slice mid-header
                    raise ValueError("truncated header slice")
                fields.append(int(data[start:pos]))
            if pos >= len(data):  # maxval may itself be cut at the boundary
                raise ValueError("truncated header slice")
            break
        except ValueError:
            if head >= len(body):
                raise
            head *= 4
    pos += 1  # single whitespace after maxval
    pw, ph, maxval = fields
    if maxval != 255:
        raise ValueError("only 8-bit ppm supported")
    return decode_raw(body[pos : pos + pw * ph * 3], pw, ph)


# ---------------------------------------------------------------- png ----

_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def _chunk(tag: bytes, body: bytes) -> bytes:
    return (
        struct.pack(">I", len(body))
        + tag
        + body
        + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)
    )


def encode_png(pixels: np.ndarray, level: int = 6) -> bytes:
    """8-bit truecolor (color type 2), filter 0 on every scanline."""
    pixels = np.ascontiguousarray(pixels, dtype=np.uint8)
    h, w = pixels.shape[:2]
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    scan = np.zeros((h, 1 + w * 3), dtype=np.uint8)
    scan[:, 1:] = pixels.reshape(h, w * 3)
    idat = zlib.compress(scan.tobytes(), level)
    return _PNG_SIG + _chunk(b"IHDR", ihdr) + _chunk(b"IDAT", idat) + _chunk(b"IEND", b"")


def decode_png(data, w: int | None = None, h: int | None = None) -> np.ndarray:
    # Accepts any bytes-like (featurize passes zero-copy memoryviews).
    # Small header/tag reads go through bytes() — memoryview equality
    # with bytes is format-sensitive — while IDAT bodies stay views.
    if bytes(data[:8]) != _PNG_SIG:
        raise ValueError("bad png signature")
    pos, idat, ihdr = 8, [], None
    while pos < len(data):
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        tag = bytes(data[pos + 4 : pos + 8])
        body = data[pos + 8 : pos + 8 + length]
        pos += 12 + length
        if tag == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", bytes(body))
        elif tag == b"IDAT":
            idat.append(body)
        elif tag == b"IEND":
            break
    pw, ph, depth, ctype, comp, filt, interlace = ihdr
    if (depth, ctype, comp, filt, interlace) != (8, 2, 0, 0, 0):
        raise ValueError("only 8-bit truecolor non-interlaced png supported")
    raw = zlib.decompress(b"".join(idat))
    stride = pw * 3
    rows = np.frombuffer(raw, dtype=np.uint8).reshape(ph, 1 + stride)
    if not rows[:, 0].any():  # filter 0 on every scanline (what
        # encode_png writes): copy the whole plane in one slice, no
        # per-row loop in the featurize hot path
        return np.ascontiguousarray(rows[:, 1:]).reshape(ph, pw, 3)
    out = np.zeros((ph, stride), dtype=np.uint8)
    bpp = 3
    for y in range(ph):
        ftype = rows[y, 0]
        cur = rows[y, 1:].astype(np.int32)
        prev = out[y - 1].astype(np.int32) if y else np.zeros(stride, np.int32)
        if ftype == 0:
            line = cur
        elif ftype == 2:  # Up
            line = (cur + prev) & 0xFF
        elif ftype in (1, 3, 4):  # Sub / Average / Paeth need a left-scan
            line = np.zeros(stride, np.int32)
            for x in range(stride):
                a = line[x - bpp] if x >= bpp else 0
                b = prev[x]
                if ftype == 1:
                    pred = a
                elif ftype == 3:
                    pred = (a + b) >> 1
                else:
                    c = prev[x - bpp] if x >= bpp else 0
                    p = a + b - c
                    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                    pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                line[x] = (cur[x] + pred) & 0xFF
        else:
            raise ValueError(f"unknown png filter {ftype}")
        out[y] = line.astype(np.uint8)
    return out.reshape(ph, pw, 3)


DECODERS = {"raw": decode_raw, "ppm": decode_ppm, "png": decode_png}
ENCODERS = {"raw": encode_raw, "ppm": encode_ppm, "png": encode_png}


def decode(data: bytes, fmt: str, w: int, h: int) -> np.ndarray:
    return DECODERS[fmt](data, w, h)


def psnr(a: np.ndarray, b: np.ndarray) -> float:
    mse = np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2)
    if mse == 0:
        return float("inf")
    return 10.0 * np.log10(255.0**2 / mse)
