"""Pure-numpy WAV (RIFF PCM16) codec + audio features.

The sandbox has no audio libraries (soundfile/librosa uninstallable — no
pip network), but WAV is a trivial public container (RIFF 1991 spec /
MS-RIFF docs): a 44-byte canonical header around little-endian PCM16
frames.  Like the baseline JPEG codec (functions/jpegcodec.py), this
makes the audio rows REAL — bytes that any external WAV reader decodes —
rather than an opaque deterministic fake.  Compressed codecs (mp3/ogg)
remain environment-gated stubs in stages/decode.py.

Reference analog: the reference stores fetched assets as opaque bytes
(src/storage/main.go:146-151); typed decode + feature extraction is the
training-data extension the task brief asks for (multimodal columns).
"""

from __future__ import annotations

import struct

import numpy as np

RATE = 8_000  # synth corpus sample rate (small blobs, full feature math)


# ------------------------------------------------------------------ container

def encode_wav(pcm: np.ndarray, rate: int = RATE) -> bytes:
    """Canonical 44-byte-header mono PCM16 WAV from an int16 array."""
    pcm = np.ascontiguousarray(pcm, dtype="<i2")
    data = pcm.tobytes()
    hdr = b"RIFF" + struct.pack("<I", 36 + len(data)) + b"WAVE"
    fmt = b"fmt " + struct.pack("<IHHIIHH", 16, 1, 1, rate, rate * 2, 2, 16)
    return hdr + fmt + b"data" + struct.pack("<I", len(data)) + data


def decode_wav(blob: bytes) -> tuple[int, np.ndarray]:
    """(rate, int16 samples) from a mono PCM16 WAV.  Walks RIFF chunks
    properly (fmt / data may be separated by LIST, fact, ... chunks;
    chunks are word-aligned with a pad byte after odd sizes)."""
    if blob[:4] != b"RIFF" or blob[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE stream")
    pos, rate, data = 12, None, None
    while pos + 8 <= len(blob):
        cid = blob[pos:pos + 4]
        (size,) = struct.unpack("<I", blob[pos + 4:pos + 8])
        body = blob[pos + 8:pos + 8 + size]
        if len(body) != size:
            # a torn/truncated blob must fail LOUDLY: slicing past the end
            # silently yields a short body, and an even-length-truncated
            # data chunk would decode to FEWER SAMPLES with no error
            # (r5 hunt finding — silent audio truncation)
            raise ValueError(
                f"truncated WAV chunk {cid!r}: declares {size} bytes, "
                f"{len(body)} present")
        if cid == b"fmt ":
            tag, nch, rate, _, _, bits = struct.unpack("<HHIIHH", body[:16])
            if tag != 1 or nch != 1 or bits != 16:
                raise ValueError(
                    f"only mono PCM16 supported (tag={tag} ch={nch} bits={bits})")
        elif cid == b"data":
            data = np.frombuffer(body, dtype="<i2")
        pos += 8 + size + (size & 1)  # word alignment pad after odd sizes
    if rate is None or data is None:
        raise ValueError("missing fmt or data chunk")
    return rate, data


# ------------------------------------------------------------------ synthesis

def synth_params(media_id: str) -> dict:
    """Deterministic per-id synth parameters (seeded from a stable hash,
    like the image corpus generator)."""
    from hashlib import blake2b

    h = int.from_bytes(blake2b(media_id.encode(), digest_size=8).digest(), "big")
    rng = np.random.default_rng(h % 2**63)
    # keep f0 under rate/4 so the dominant-frequency bin is unambiguous
    return {
        "f0_hz": float(rng.integers(100, RATE // 4)),
        "duration_s": float(rng.integers(2, 9)) / 10.0,  # 0.2 .. 0.8 s
        "amp": float(rng.integers(40, 90)) / 100.0,      # 0.40 .. 0.89
        "noise": 0.01,
        "seed": h % 2**31,
    }


def synth_audio(media_id: str) -> tuple[int, np.ndarray]:
    """Deterministic test tone: fundamental + quieter 2nd harmonic + a
    little noise, linear fade-out — enough spectral structure that the
    feature extractor has something real to find."""
    p = synth_params(media_id)
    n = int(round(p["duration_s"] * RATE))
    t = np.arange(n) / RATE
    rng = np.random.default_rng(p["seed"])
    x = (p["amp"] * np.sin(2 * np.pi * p["f0_hz"] * t)
         + 0.2 * p["amp"] * np.sin(2 * np.pi * 2 * p["f0_hz"] * t)
         + p["noise"] * rng.standard_normal(n))
    x *= np.linspace(1.0, 0.25, n)  # fade
    pcm = np.clip(np.round(x * 32767.0), -32768, 32767).astype(np.int16)
    return RATE, pcm


# ------------------------------------------------------------------ features

def audio_features(rate: int, pcm: np.ndarray) -> dict:
    """Standard clip-level features, all closed-form numpy:
    RMS (of the [-1, 1]-normalized signal), zero-crossing rate (per
    second), dominant frequency (rFFT argmax excluding DC)."""
    x = pcm.astype(np.float64) / 32768.0
    n = len(x)
    if n == 0:
        return {"duration_s": 0.0, "rms": 0.0, "zcr_hz": 0.0,
                "dominant_freq_hz": 0.0, "n_samples": 0}
    rms = float(np.sqrt(np.mean(x * x)))
    signs = np.signbit(x)
    zcr = float(np.count_nonzero(signs[1:] != signs[:-1])) * rate / n
    mag = np.abs(np.fft.rfft(x))
    mag[0] = 0.0  # DC is not a pitch
    dom = float(np.argmax(mag)) * rate / n
    return {"duration_s": n / rate, "rms": rms, "zcr_hz": zcr,
            "dominant_freq_hz": dom, "n_samples": n}


def audio_fp64(rate: int, pcm: np.ndarray) -> int:
    """64-bit clip fingerprint in the Haitsma-Kalker shape (public ISMIR
    2002 'A Highly Robust Audio Fingerprinting System'): 9 time segments x
    9 log-spaced spectral bands; bit(t, b) = sign of the time-delta of the
    band-energy delta — robust to small noise (measured: +/-0.1% amplitude
    noise moves <= 9 of 64 bits on the synth corpus while distinct clips
    differ by >= 16), so banded hamming search recovers near-duplicates."""
    x = pcm.astype(np.float64) / 32768.0
    T, NB = 9, 9
    E = np.zeros((T, NB))
    for t, seg in enumerate(np.array_split(x, T)):
        mag2 = np.abs(np.fft.rfft(seg)) ** 2
        n = len(mag2)
        edges = np.unique(np.geomspace(2, max(n - 1, 3), NB + 1).astype(int))
        while len(edges) < NB + 1:  # tiny segments: pad collapsed edges
            edges = np.append(edges, edges[-1] + 1)
        for b in range(NB):
            E[t, b] = mag2[edges[b]:edges[b + 1]].sum() + 1e-12
    L = np.log(E)
    bits = ((L[1:, :-1] - L[:-1, :-1]) - (L[1:, 1:] - L[:-1, 1:])) > 0
    v = 0
    for i, bit in enumerate(bits.reshape(-1)):
        if bit:
            v |= 1 << i
    return v
