"""Pure-python AVI (RIFF) muxer/demuxer for MJPEG video.

With the baseline JPEG codec (functions/jpegcodec.py) already real, video
only needs a container: AVI is RIFF (same chunk grammar as WAV — see
wavcodec.py) per the public MS RIFF/AVI spec — 'hdrl' (avih + one 'vids'
stream with an MJPG BITMAPINFOHEADER), 'movi' with one '00dc' chunk per
JPEG frame, and a standard 'idx1' index.  This makes the video rows REAL:
bytes any MJPEG-capable AVI reader plays.  Scope mirrors the JPEG codec's
stance — canonical single-stream MJPEG, which own-encoded streams always
are; exotic AVIs (multi-stream, ODML) are out of scope and rejected
loudly.

Reference analog: the reference stores fetched assets as opaque bytes
(src/storage/main.go:146-151); typed decode + frame sampling is the
training-data extension the task brief asks for (multimodal columns).
"""

from __future__ import annotations

import struct


def _chunk(cid: bytes, body: bytes) -> bytes:
    pad = b"\x00" if len(body) & 1 else b""  # RIFF word alignment
    return cid + struct.pack("<I", len(body)) + body + pad


def _list(ltype: bytes, body: bytes) -> bytes:
    return _chunk(b"LIST", ltype + body)


def encode_avi(frames: list[bytes], w: int, h: int, fps: int = 10) -> bytes:
    """Single-stream MJPEG AVI from per-frame JPEG bytes."""
    n = len(frames)
    max_bytes = max((len(f) for f in frames), default=0)
    avih = struct.pack(
        "<14I",
        1_000_000 // fps,   # dwMicroSecPerFrame
        max_bytes * fps,    # dwMaxBytesPerSec
        0,                  # dwPaddingGranularity
        0x10,               # dwFlags: AVIF_HASINDEX
        n, 0, 1,            # dwTotalFrames, dwInitialFrames, dwStreams
        max_bytes, w, h,    # dwSuggestedBufferSize, dwWidth, dwHeight
        0, 0, 0, 0,         # dwReserved
    )
    strh = (b"vids" + b"MJPG"
            + struct.pack("<IHHIIIIIIII", 0, 0, 0, 0,
                          1, fps,         # dwScale, dwRate -> fps
                          0, n,           # dwStart, dwLength
                          max_bytes, 0, 0)  # buf, quality(-1->0), sample
            + struct.pack("<4H", 0, 0, w, h))  # rcFrame
    strf = struct.pack("<IiiHH4sIiiII", 40, w, h, 1, 24, b"MJPG",
                       w * h * 3, 0, 0, 0, 0)
    hdrl = _list(b"hdrl", _chunk(b"avih", avih)
                 + _list(b"strl", _chunk(b"strh", strh) + _chunk(b"strf", strf)))
    movi_body = b"movi"
    idx = b""
    for f in frames:
        # idx1 offsets are relative to the start of 'movi' (the ltype word)
        idx += b"00dc" + struct.pack("<III", 0x10, len(movi_body), len(f))
        movi_body += _chunk(b"00dc", f)
    riff_body = b"AVI " + hdrl + _chunk(b"LIST", movi_body) + _chunk(b"idx1", idx)
    return b"RIFF" + struct.pack("<I", len(riff_body)) + riff_body


def decode_avi(blob: bytes) -> dict:
    """{'w', 'h', 'fps', 'n_frames', 'frames': [jpeg bytes, ...]} from a
    single-stream MJPEG AVI.  Walks RIFF chunks like the WAV decoder;
    nesting is handled by descending into the hdrl / movi LISTs."""
    if blob[:4] != b"RIFF" or blob[8:12] != b"AVI ":
        raise ValueError("not a RIFF/AVI stream")
    if 8 + struct.unpack("<I", blob[4:8])[0] > len(blob):
        # torn/truncated blob: the declared RIFF payload extends past the
        # end — fail loudly before the walk can slice short chunk bodies
        # (r5 hunt finding — a cut inside the last frame chunk previously
        # returned truncated JPEG bytes with no error)
        raise ValueError("truncated AVI: RIFF payload extends past end of blob")
    w = h = fps = n_frames = None
    frames: list[bytes] = []

    def walk(lo: int, hi: int) -> None:
        nonlocal w, h, fps, n_frames
        pos = lo
        while pos + 8 <= hi:
            cid = blob[pos:pos + 4]
            (size,) = struct.unpack("<I", blob[pos + 4:pos + 8])
            body_lo = pos + 8
            if body_lo + size > len(blob):
                raise ValueError(
                    f"truncated AVI chunk {cid!r}: declares {size} bytes "
                    f"past end of blob")
            if cid == b"LIST":
                ltype = blob[body_lo:body_lo + 4]
                if ltype in (b"hdrl", b"strl", b"movi"):
                    walk(body_lo + 4, body_lo + size)
            elif cid == b"avih":
                vals = struct.unpack("<14I", blob[body_lo:body_lo + 56])
                n_frames, w, h = vals[4], vals[8], vals[9]
            elif cid == b"strh":
                if blob[body_lo:body_lo + 4] != b"vids" or \
                        blob[body_lo + 4:body_lo + 8] != b"MJPG":
                    raise ValueError("only single-stream MJPG supported")
                scale, rate = struct.unpack("<II", blob[body_lo + 20:body_lo + 28])
                fps = rate // max(scale, 1)
            elif cid == b"00dc":
                frames.append(blob[body_lo:body_lo + size])
            pos = body_lo + size + (size & 1)

    walk(12, 12 + struct.unpack("<I", blob[4:8])[0] - 4)
    if w is None or fps is None:
        raise ValueError("missing avih/strh header")
    if n_frames != len(frames):
        raise ValueError(f"header declares {n_frames} frames, found {len(frames)}")
    return {"w": w, "h": h, "fps": fps, "n_frames": n_frames, "frames": frames}
