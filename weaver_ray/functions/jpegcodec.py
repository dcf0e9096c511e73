"""Minimal baseline JPEG codec (pure numpy + Python bit I/O).

Implements the baseline sequential DCT process of ITU-T T.81 (public
standard): JFIF container, 8x8 FDCT/IDCT, quality-scaled Annex K
quantization tables, the Annex K "typical" Huffman tables, 4:4:4 chroma
(no subsampling — simplest and highest quality), 0xFF byte stuffing.

Purpose (BASELINE.json input_hint): the corpus's ``fmt == "jpeg"`` rows and
the PSNR>=40dB lossy branch of the per-row invariant must actually execute
in this sandbox, where Pillow is unavailable.  Output is standard baseline
JPEG — any conforming decoder reads it; the decoder here reads any baseline
4:4:4 (and single-component) stream with these marker segments.

Vectorization: DCT, quantization and zigzag run over ALL blocks of a
channel at once (one (n_blocks, 8, 8) einsum); only the entropy coding is
per-symbol Python, bounded by the number of nonzero coefficients.
"""

from __future__ import annotations

import struct

import numpy as np

# ---------------------------------------------------------------- constants

ZIGZAG = np.array([
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
], dtype=np.int64)
UNZIGZAG = np.argsort(ZIGZAG)

Q_LUMA = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
], dtype=np.float64)

Q_CHROMA = np.array([
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
], dtype=np.float64)

# Annex K "typical" Huffman tables: (BITS[1..16], HUFFVAL)
DC_LUMA_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
DC_LUMA_VALS = list(range(12))
DC_CHROMA_BITS = [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0]
DC_CHROMA_VALS = list(range(12))

AC_LUMA_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
AC_LUMA_VALS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41, 0x06,
    0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
    0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24, 0x33, 0x62, 0x72,
    0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44, 0x45,
    0x46, 0x47, 0x48, 0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75,
    0x76, 0x77, 0x78, 0x79, 0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
    0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
    0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
    0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
    0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2, 0xF3, 0xF4,
    0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
]
AC_CHROMA_BITS = [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77]
AC_CHROMA_VALS = [
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12, 0x41,
    0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
    0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15, 0x62, 0x72, 0xD1,
    0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
    0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44,
    0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
    0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74,
    0x75, 0x76, 0x77, 0x78, 0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
    0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A,
    0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
    0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
    0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2, 0xF3, 0xF4,
    0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
]

# orthonormal DCT-II basis: coefs = D @ block @ D.T (the T.81 FDCT up to the
# standard 1/4 scaling folded into orthonormality)
_k = np.arange(8, dtype=np.float64)
_D = np.cos((2 * _k[None, :] + 1) * _k[:, None] * np.pi / 16) * 0.5
_D[0, :] *= 1 / np.sqrt(2)


def _quality_scale(table: np.ndarray, quality: int) -> np.ndarray:
    """IJG quality scaling (public libjpeg convention)."""
    quality = min(100, max(1, quality))
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    q = np.floor((table * scale + 50) / 100)
    return np.clip(q, 1, 255)


def _build_code_table(bits: list[int], vals: list[int]) -> dict[int, tuple[int, int]]:
    """symbol -> (code, length), canonical order (T.81 Annex C)."""
    out: dict[int, tuple[int, int]] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return out


_DECODE_LUT_CACHE: dict[tuple, list[int]] = {}


def _build_decode_table(bits: list[int], vals: list[int]) -> list[int]:
    """16-bit-peek Huffman LUT: lut[next16bits] = (symbol << 8) | code_length.

    Every code of length L owns the 2^(16-L) table entries sharing its
    L-bit prefix, so decoding is ONE list index per symbol instead of a
    bit-by-bit tree walk (T.81 codes are <=16 bits).  Entries reachable by
    no code stay 0 (length 0 -> corrupt stream).  Cached by table content:
    our own streams always carry the four Annex-K tables, so per-image
    rebuild cost is a dict hit."""
    key = (tuple(bits), tuple(vals))
    cached = _DECODE_LUT_CACHE.get(key)
    if cached is not None:
        return cached
    lut = [0] * (1 << 16)
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            lo = code << (16 - length)
            n = 1 << (16 - length)
            lut[lo:lo + n] = [(vals[k] << 8) | length] * n
            code += 1
            k += 1
        code <<= 1
    if len(_DECODE_LUT_CACHE) > 64:  # bound worker-resident cache
        _DECODE_LUT_CACHE.clear()
    _DECODE_LUT_CACHE[key] = lut
    return lut


_ENC_DC = (_build_code_table(DC_LUMA_BITS, DC_LUMA_VALS),
           _build_code_table(DC_CHROMA_BITS, DC_CHROMA_VALS))
_ENC_AC = (_build_code_table(AC_LUMA_BITS, AC_LUMA_VALS),
           _build_code_table(AC_CHROMA_BITS, AC_CHROMA_VALS))


class _BitWriter:
    __slots__ = ("buf", "acc", "nbits")

    def __init__(self):
        self.buf = bytearray()
        self.acc = 0
        self.nbits = 0

    def put(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            self.nbits -= 8
            b = (self.acc >> self.nbits) & 0xFF
            self.buf.append(b)
            if b == 0xFF:
                self.buf.append(0x00)  # byte stuffing
            self.acc &= (1 << self.nbits) - 1

    def flush(self) -> bytes:
        if self.nbits:
            pad = 8 - self.nbits
            self.put((1 << pad) - 1, pad)  # pad with 1-bits
        return bytes(self.buf)


def _magnitude(v: int) -> tuple[int, int]:
    """JPEG magnitude coding: value -> (category size, extra bits)."""
    if v == 0:
        return 0, 0
    a = abs(v)
    size = a.bit_length()
    bits = v if v > 0 else v + (1 << size) - 1
    return size, bits


def _rgb_to_ycbcr(px: np.ndarray) -> np.ndarray:
    p = px.astype(np.float64)
    r, g, b = p[:, :, 0], p[:, :, 1], p[:, :, 2]
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
    cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
    return np.stack([y, cb, cr], axis=-1)


def _ycbcr_to_rgb(ycc: np.ndarray) -> np.ndarray:
    y, cb, cr = ycc[:, :, 0], ycc[:, :, 1] - 128.0, ycc[:, :, 2] - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    b = y + 1.772 * cb
    return np.clip(np.stack([r, g, b], axis=-1), 0, 255).astype(np.uint8)


def _channel_blocks(ch: np.ndarray) -> tuple[np.ndarray, int, int]:
    """Pad (edge-replicate) to multiples of 8, return (nby*nbx, 8, 8)."""
    h, w = ch.shape
    ph, pw = -h % 8, -w % 8
    if ph or pw:
        ch = np.pad(ch, ((0, ph), (0, pw)), mode="edge")
    hh, ww = ch.shape
    nby, nbx = hh // 8, ww // 8
    blocks = ch.reshape(nby, 8, nbx, 8).transpose(0, 2, 1, 3).reshape(-1, 8, 8)
    return blocks, nby, nbx


def jpeg_encode(pixels: np.ndarray, quality: int = 90) -> bytes:
    """Encode an (h, w, 3) uint8 RGB array as baseline JFIF (4:4:4)."""
    if pixels.ndim != 3 or pixels.shape[2] != 3 or pixels.dtype != np.uint8:
        raise ValueError(f"expected (h, w, 3) uint8, got {pixels.shape} {pixels.dtype}")
    h, w, _ = pixels.shape
    qy = _quality_scale(Q_LUMA, quality)
    qc = _quality_scale(Q_CHROMA, quality)
    ycc = _rgb_to_ycbcr(pixels)

    quantized = []  # per channel: (n_blocks, 64) int32 zigzagged
    nmcu = None
    for ci in range(3):
        blocks, nby, nbx = _channel_blocks(ycc[:, :, ci])
        nmcu = nby * nbx
        coefs = np.einsum("ij,njk,lk->nil", _D, blocks - 128.0, _D)
        qtab = (qy if ci == 0 else qc).reshape(8, 8)
        zz = np.round(coefs / qtab).astype(np.int32).reshape(-1, 64)[:, ZIGZAG]
        quantized.append(zz)

    # entropy coding: MCU-interleaved (Y, Cb, Cr per MCU), per-component DC
    # prediction; per-symbol Python bounded by nonzero coefficient count
    bw = _BitWriter()
    pred = [0, 0, 0]
    for m in range(nmcu):
        for ci in range(3):
            tsel = 0 if ci == 0 else 1
            dc_tab, ac_tab = _ENC_DC[tsel], _ENC_AC[tsel]
            zz = quantized[ci][m]
            diff = int(zz[0]) - pred[ci]
            pred[ci] = int(zz[0])
            size, extra = _magnitude(diff)
            code, length = dc_tab[size]
            bw.put(code, length)
            if size:
                bw.put(extra, size)
            nz = np.flatnonzero(zz[1:])  # positions 0..62 of AC coefficients
            last = -1
            for p in nz.tolist():
                run = p - last - 1
                last = p
                while run > 15:
                    code, length = ac_tab[0xF0]  # ZRL
                    bw.put(code, length)
                    run -= 16
                size, extra = _magnitude(int(zz[1 + p]))
                code, length = ac_tab[(run << 4) | size]
                bw.put(code, length)
                bw.put(extra, size)
            if last < 62:
                code, length = ac_tab[0x00]  # EOB
                bw.put(code, length)
    entropy = bw.flush()

    # --- marker segments ---------------------------------------------------
    def seg(marker: int, body: bytes) -> bytes:
        return struct.pack(">HH", marker, len(body) + 2) + body

    out = bytearray()
    out += b"\xff\xd8"  # SOI
    out += seg(0xFFE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    out += seg(0xFFDB, bytes([0]) + bytes(qy[ZIGZAG].astype(np.uint8)))
    out += seg(0xFFDB, bytes([1]) + bytes(qc[ZIGZAG].astype(np.uint8)))
    sof = struct.pack(">BHHB", 8, h, w, 3)
    for cid, tq in ((1, 0), (2, 1), (3, 1)):
        sof += bytes([cid, 0x11, tq])  # 1x1 sampling (4:4:4)
    out += seg(0xFFC0, sof)
    for cls, tid, bits, vals in (
        (0, 0, DC_LUMA_BITS, DC_LUMA_VALS), (0, 1, DC_CHROMA_BITS, DC_CHROMA_VALS),
        (1, 0, AC_LUMA_BITS, AC_LUMA_VALS), (1, 1, AC_CHROMA_BITS, AC_CHROMA_VALS),
    ):
        out += seg(0xFFC4, bytes([(cls << 4) | tid]) + bytes(bits) + bytes(vals))
    sos = bytes([3]) + b"".join(
        bytes([cid, (t << 4) | t]) for cid, t in ((1, 0), (2, 1), (3, 1))
    ) + bytes([0, 63, 0])
    out += seg(0xFFDA, sos)
    out += entropy
    out += b"\xff\xd9"  # EOI
    return bytes(out)


def jpeg_decode(data: bytes) -> np.ndarray:
    """Decode a baseline 4:4:4 (or grayscale) JFIF stream to (h, w, 3) uint8."""
    if data[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG")
    if not data.endswith(b"\xff\xd9"):
        # a torn/truncated stream must fail LOUDLY.  Without this check a
        # cut inside the entropy segment decoded SILENTLY (the bit reader
        # pads with zeros) and a cut inside the headers died with
        # IndexError-class noise (r5 hunt finding).  FF D9 cannot occur
        # inside the entropy data (FF bytes are stuffed as FF 00), so a
        # well-formed baseline stream always ends with its EOI marker.
        raise ValueError("truncated JPEG: missing EOI marker at end")
    pos = 2
    qtabs: dict[int, np.ndarray] = {}
    htabs: dict[tuple[int, int], dict] = {}
    h = w = None
    comps: list[tuple[int, int]] = []  # (component_id, quant_table_id)
    scan: list[tuple[int, int, int]] = []  # (comp_index, dc_tid, ac_tid)
    entropy_start = None
    while pos < len(data):
        if data[pos] != 0xFF:
            pos += 1
            continue
        # T.81 B.1.1.2: any number of 0xFF fill bytes may precede a marker —
        # skip them so a padded stream isn't read as marker=0xFF + garbage length
        while pos + 1 < len(data) and data[pos + 1] == 0xFF:
            pos += 1
        if pos + 1 >= len(data):
            break
        marker = data[pos + 1]
        if marker == 0x00:  # stuffed byte, not a marker (shouldn't appear
            pos += 2        # in the header segment area, but be safe)
            continue
        if marker == 0xD9:  # EOI
            break
        if marker in (0x01,) or 0xD0 <= marker <= 0xD7:  # standalone
            pos += 2
            continue
        (length,) = struct.unpack_from(">H", data, pos + 2)
        body = data[pos + 4: pos + 2 + length]
        if marker == 0xDB:  # DQT (possibly several tables per segment)
            bpos = 0
            while bpos < len(body):
                pq_, tq = body[bpos] >> 4, body[bpos] & 0xF
                n = 64 * (2 if pq_ else 1)
                # 16-bit table entries are big-endian per T.81 (">u2", not
                # the platform's native order)
                raw = np.frombuffer(body[bpos + 1: bpos + 1 + n],
                                    dtype=">u2" if pq_ else np.uint8)
                qtabs[tq] = raw.astype(np.float64)[UNZIGZAG]
                bpos += 1 + n
        elif marker == 0xC0:  # SOF0 baseline
            _, h, w, nc = struct.unpack_from(">BHHB", body, 0)
            for c in range(nc):
                cid, samp, tq = body[6 + 3 * c: 9 + 3 * c]
                if samp != 0x11:
                    raise NotImplementedError("only 4:4:4 / 1x1 sampling supported")
                comps.append((cid, tq))
        elif marker in (0xC1, 0xC2, 0xC3):
            raise NotImplementedError("only baseline sequential (SOF0) supported")
        elif marker == 0xDD:  # DRI: restart markers would need RSTn handling
            # in the entropy decoder (DC predictor resets + marker skipping);
            # fail loudly rather than silently decoding garbage
            if struct.unpack_from(">H", body, 0)[0] != 0:
                raise NotImplementedError(
                    "restart intervals (DRI/RSTn) not supported")
        elif marker == 0xC4:  # DHT (possibly several tables)
            bpos = 0
            while bpos < len(body):
                cls, tid = body[bpos] >> 4, body[bpos] & 0xF
                bits = list(body[bpos + 1: bpos + 17])
                nvals = sum(bits)
                vals = list(body[bpos + 17: bpos + 17 + nvals])
                htabs[(cls, tid)] = _build_decode_table(bits, vals)
                bpos += 17 + nvals
        elif marker == 0xDA:  # SOS
            ns = body[0]
            for c in range(ns):
                cid, tsel = body[1 + 2 * c], body[2 + 2 * c]
                ci = next(i for i, (id_, _) in enumerate(comps) if id_ == cid)
                scan.append((ci, tsel >> 4, tsel & 0xF))
            entropy_start = pos + 2 + length
            break
        pos += 2 + length
    if entropy_start is None or h is None:
        raise ValueError("truncated JPEG")

    # find EOI (last ff d9) to bound the entropy stream
    end = data.rfind(b"\xff\xd9")
    # unstuff once; pad 6 zero bytes so every 48-bit window read is in range
    buf = data[entropy_start: end if end > 0 else len(data)].replace(
        b"\xff\x00", b"\xff") + b"\x00" * 6

    nby, nbx = -(-h // 8), -(-w // 8)
    nmcu = nby * nbx
    nc = len(comps)
    coefs = [np.zeros((nmcu, 64), dtype=np.float64) for _ in range(nc)]
    pred = [0] * nc
    # hot loop: decode via 16-bit-peek LUTs.  A 48-bit big-endian window
    # starting at the cursor's byte holds the 16-bit peek AND the value
    # bits that follow (7 skew + 16 code + 16 value <= 48), so each
    # (symbol, value) pair costs one bytes-slice int conversion + one list
    # index — ~10x the bit-at-a-time tree walk this replaced.
    p = 0  # bit cursor into buf
    from_bytes = int.from_bytes
    for m in range(nmcu):
        for ci, dc_t, ac_t in scan:
            dct = htabs[(0, dc_t)]
            act = htabs[(1, ac_t)]
            zz = coefs[ci][m]
            i = p >> 3
            sh = p & 7
            w48 = from_bytes(buf[i:i + 6], "big")
            e = dct[(w48 >> (32 - sh)) & 0xFFFF]
            if not e:
                raise ValueError("bad Huffman stream")
            size = e >> 8
            p += e & 0xFF
            if size:
                v = (w48 >> (48 - sh - (e & 0xFF) - size)) & ((1 << size) - 1)
                p += size
                pred[ci] += v if v >= (1 << (size - 1)) else v - (1 << size) + 1
            zz[0] = pred[ci]
            k = 1
            while k < 64:
                i = p >> 3
                sh = p & 7
                w48 = from_bytes(buf[i:i + 6], "big")
                e = act[(w48 >> (32 - sh)) & 0xFFFF]
                if not e:
                    raise ValueError("bad Huffman stream")
                sym = e >> 8
                ln = e & 0xFF
                p += ln
                if sym == 0x00:  # EOB
                    break
                if sym == 0xF0:  # ZRL
                    k += 16
                    continue
                k += sym >> 4
                size = sym & 0xF
                if k > 63:
                    raise ValueError("AC index overflow")
                if size:
                    v = (w48 >> (48 - sh - ln - size)) & ((1 << size) - 1)
                    p += size
                    zz[k] = v if v >= (1 << (size - 1)) else v - (1 << size) + 1
                k += 1

    planes = []
    for ci, (cid, tq) in enumerate(comps):
        dq = coefs[ci][:, UNZIGZAG] * qtabs[tq][None, :]
        blocks = dq.reshape(-1, 8, 8)
        spatial = np.einsum("ji,njk,kl->nil", _D, blocks, _D) + 128.0
        plane = (
            spatial.reshape(nby, nbx, 8, 8).transpose(0, 2, 1, 3)
            .reshape(nby * 8, nbx * 8)[:h, :w]
        )
        planes.append(plane)
    if nc == 1:
        g = np.clip(planes[0], 0, 255).astype(np.uint8)
        return np.stack([g, g, g], axis=-1)
    return _ycbcr_to_rgb(np.stack(planes, axis=-1))
