"""Pure-Python image codec + perceptual hashing + PSNR.

The corpus stores images as encoded bytes in a ``large_binary`` column
(BASELINE.json input_hint).  Pillow is not available in this sandbox, so we
ship a minimal, deterministic PNG codec built on zlib (RGB8 only — exactly
what the synthetic corpus generator emits).  JPEG is gated behind an
import-try of Pillow and otherwise falls back to PNG with fmt recorded
accordingly (FIXTURES.md §1).

The per-row invariant checked by tests (BASELINE.json:15): decode(bytes) must
be exactly the generator's pixel array for lossless formats, PSNR >= 40 dB
for lossy ones.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_PNG_SIG = b"\x89PNG\r\n\x1a\n"

try:  # pragma: no cover - not installed in this sandbox
    from PIL import Image  # noqa: F401

    HAVE_PIL = True
except ImportError:
    HAVE_PIL = False


def _chunk(tag: bytes, data: bytes) -> bytes:
    return (
        struct.pack(">I", len(data))
        + tag
        + data
        + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF)
    )


def png_encode(pixels: np.ndarray, level: int = 1) -> bytes:
    """Encode an (h, w, 3) uint8 array as an RGB8 PNG (filter type 0 rows)."""
    if pixels.ndim != 3 or pixels.shape[2] != 3 or pixels.dtype != np.uint8:
        raise ValueError(f"expected (h, w, 3) uint8, got {pixels.shape} {pixels.dtype}")
    h, w, _ = pixels.shape
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)  # 8-bit, color type 2 (RGB)
    # prepend the per-row filter byte (0 = None) without a Python row loop
    raw = np.empty((h, 1 + w * 3), dtype=np.uint8)
    raw[:, 0] = 0
    raw[:, 1:] = pixels.reshape(h, w * 3)
    idat = zlib.compress(raw.tobytes(), level)
    return _PNG_SIG + _chunk(b"IHDR", ihdr) + _chunk(b"IDAT", idat) + _chunk(b"IEND", b"")


def _unfilter(raw: np.ndarray, h: int, stride: int, bpp: int) -> np.ndarray:
    """Undo PNG row filters (types 0-4). Row-sequential by necessity."""
    rows = raw.reshape(h, 1 + stride)
    ftypes = rows[:, 0]
    data = rows[:, 1:].astype(np.int32)
    prev = np.zeros(stride, dtype=np.int32)
    out = np.empty((h, stride), dtype=np.uint8)
    for y in range(h):
        ft = ftypes[y]
        cur = data[y]
        if ft == 0:
            rec = cur
        elif ft == 1:  # Sub
            rec = cur.copy()
            for x in range(bpp, stride):
                rec[x] = (rec[x] + rec[x - bpp]) & 0xFF
        elif ft == 2:  # Up
            rec = (cur + prev) & 0xFF
        elif ft == 3:  # Average
            rec = cur.copy()
            for x in range(stride):
                left = rec[x - bpp] if x >= bpp else 0
                rec[x] = (rec[x] + ((left + prev[x]) >> 1)) & 0xFF
        elif ft == 4:  # Paeth
            rec = cur.copy()
            for x in range(stride):
                a = rec[x - bpp] if x >= bpp else 0
                b = prev[x]
                c = prev[x - bpp] if x >= bpp else 0
                p = a + b - c
                pa_, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa_ <= pb and pa_ <= pc) else (b if pb <= pc else c)
                rec[x] = (rec[x] + pred) & 0xFF
        else:
            raise ValueError(f"bad PNG filter type {ft}")
        out[y] = rec.astype(np.uint8)
        prev = rec
    return out


def png_decode(data: bytes) -> np.ndarray:
    """Decode an RGB8 PNG produced by :func:`png_encode` (or any RGB8,
    non-interlaced PNG) to an (h, w, 3) uint8 array."""
    if data[:8] != _PNG_SIG:
        raise ValueError("not a PNG")
    pos, w = 8, 0
    h = bitdepth = ctype = interlace = None
    idat = bytearray()
    ended = False
    while pos < len(data):
        (length,) = struct.unpack_from(">I", data, pos)
        tag = data[pos + 4 : pos + 8]
        body = data[pos + 8 : pos + 8 + length]
        if len(body) != length:
            # torn/truncated blob: slicing past the end silently yields a
            # short chunk body (r5 hunt finding)
            raise ValueError(
                f"truncated PNG chunk {tag!r}: declares {length} bytes, "
                f"{len(body)} present")
        pos += 12 + length
        if tag == b"IHDR":
            w, h, bitdepth, ctype, _, _, interlace = struct.unpack(">IIBBBBB", body)
        elif tag == b"IDAT":
            idat += body
        elif tag == b"IEND":
            ended = True
            break
    if not ended:
        # a stream cut between chunks parses "cleanly" without this check
        raise ValueError("truncated PNG: missing IEND chunk")
    if bitdepth != 8 or ctype != 2 or interlace != 0:
        raise ValueError(f"unsupported PNG (bitdepth={bitdepth} ctype={ctype})")
    try:
        raw = np.frombuffer(zlib.decompress(bytes(idat)), dtype=np.uint8)
    except zlib.error as e:
        # zlib.error is NOT a ValueError — it would escape the decode
        # stages' (ValueError, struct.error) fault barrier (r5 hunt)
        raise ValueError(f"corrupt PNG zlib stream: {e}") from e
    stride = w * 3
    if raw.size != h * (1 + stride):
        raise ValueError("corrupt PNG payload")
    rows = raw.reshape(h, 1 + stride)
    if not rows[:, 0].any():  # all filter-0 (our encoder's output): zero-loop path
        return rows[:, 1:].reshape(h, w, 3).copy()
    return _unfilter(raw, h, stride, 3).reshape(h, w, 3)


# quality for the built-in baseline JPEG encoder: 98 keeps PSNR >= 43 dB on
# the synthetic corpus (hard block edges + wraparound gradients are the
# adversarial case for DCT coding), comfortably above the >=40 dB bar of the
# per-row lossy invariant (BASELINE.json input_hint)
JPEG_QUALITY = 98


def encode_image(pixels: np.ndarray, fmt: str) -> tuple[bytes, str]:
    """Encode pixels in *fmt*; returns (bytes, actual_fmt).  JPEG is real in
    this sandbox: the pure-numpy baseline codec (functions/jpegcodec.py)
    encodes standard JFIF; Pillow is preferred when importable."""
    if fmt == "jpeg":
        if HAVE_PIL:  # pragma: no cover
            import io

            from PIL import Image

            buf = io.BytesIO()
            Image.fromarray(pixels).save(buf, format="JPEG", quality=JPEG_QUALITY)
            return buf.getvalue(), "jpeg"
        from .jpegcodec import jpeg_encode

        return jpeg_encode(pixels, quality=JPEG_QUALITY), "jpeg"
    return png_encode(pixels), "png"


def decode_image(data: bytes, fmt: str) -> np.ndarray:
    if fmt == "png":
        return png_decode(data)
    if fmt == "jpeg":
        if HAVE_PIL:  # pragma: no cover
            import io

            from PIL import Image

            return np.asarray(Image.open(io.BytesIO(data)).convert("RGB"))
        from .jpegcodec import jpeg_decode

        return jpeg_decode(data)
    raise ValueError(f"unknown fmt {fmt!r}")


def phash64(pixels: np.ndarray) -> int:
    """64-bit average-hash: block-mean downsample to 8x8 luma, threshold by
    the mean (stable, defined function — FIXTURES.md §1 'phash')."""
    luma = (
        0.299 * pixels[:, :, 0] + 0.587 * pixels[:, :, 1] + 0.114 * pixels[:, :, 2]
    )
    h, w = luma.shape
    # block-mean resize to 8x8 via index binning (handles non-multiples)
    yi = (np.arange(h) * 8 // h).astype(np.int64)
    xi = (np.arange(w) * 8 // w).astype(np.int64)
    sums = np.zeros((8, 8))
    counts = np.zeros((8, 8))
    np.add.at(sums, (yi[:, None], xi[None, :]), luma)
    np.add.at(counts, (yi[:, None], xi[None, :]), 1.0)
    grid = sums / counts
    bits = (grid > grid.mean()).flatten()
    v = 0
    for b in bits:
        v = (v << 1) | int(b)
    return v - (1 << 64) if v >= (1 << 63) else v  # as signed int64


def psnr(a: np.ndarray, b: np.ndarray) -> float:
    """Peak signal-to-noise ratio in dB (inf for identical images)."""
    mse = np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2)
    if mse == 0:
        return float("inf")
    return 10.0 * np.log10(255.0**2 / mse)


def hamming64(a: np.ndarray, b: np.ndarray | int) -> np.ndarray:
    """Vectorized hamming distance between int64 phash columns
    (broadcasts: a (N,1) vs b (1,Q) gives the (N, Q) distance matrix)."""
    x = np.bitwise_xor(a.astype(np.uint64), np.uint64(b) if np.isscalar(b) else b.astype(np.uint64))
    return np.bitwise_count(x).astype(np.int64) if hasattr(np, "bitwise_count") else _popcount64(x)


# 8-bit popcount LUT: 8 table lookups + a sum beat the 64-pass shift loop
# ~6x (numpy 1.26 has no bitwise_count ufunc)
_POP8 = np.array([bin(i).count("1") for i in range(256)], dtype=np.uint8)


def _popcount64(x: np.ndarray) -> np.ndarray:
    if x.dtype.itemsize != 8:  # the uint8 view below assumes 8-byte lanes
        x = x.astype(np.uint64)
    flat = np.ascontiguousarray(x).reshape(-1)
    return (_POP8[flat.view(np.uint8)].reshape(-1, 8).sum(1)
            .astype(np.int64).reshape(x.shape))
