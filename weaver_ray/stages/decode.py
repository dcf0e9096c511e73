"""Multimodal stages: image decode / feature-extract / resize (REAL: PNG +
baseline JPEG codecs), audio WAV/PCM decode + features (REAL: pure-numpy
RIFF codec), plus stub plumbing for compressed audio / video (libraries
absent in this sandbox — task brief: stub the codec, make the Ray-side
plumbing real and tested).

All stages are actor-pool ``map_batches`` classes over ``pyarrow`` batches
with small batch sizes (binary payload rows are wide — SURVEY.md §7.4.4).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..functions.imaging import decode_image, phash64, png_encode

HAVE_AUDIO = False  # no soundfile/librosa (COMPRESSED codecs) in sandbox;
#                     WAV/PCM is REAL — see WavFeatureStage / wavcodec.py
HAVE_VIDEO = False  # no av/opencv in this sandbox


WAV_FEATURE_SCHEMA = pa.schema(
    [
        pa.field("media_id", pa.string()),
        pa.field("decode_ok", pa.bool_()),
        pa.field("duration_s", pa.float64()),
        pa.field("rms", pa.float64()),
        pa.field("zcr_hz", pa.float64()),
        pa.field("dominant_freq_hz", pa.float64()),
        pa.field("n_samples", pa.int64()),
    ]
)


class WavFeatureStage:
    """REAL audio decode + clip-level feature extraction for WAV/PCM16
    bytes (pure-numpy RIFF codec, functions/wavcodec.py — the audio
    analog of the baseline JPEG codec).  Per-clip container parse is
    inherent; the per-sample math (RMS / zero crossings / rFFT) is
    vectorized numpy.  Compressed codecs (mp3/ogg) remain environment-
    gated in AudioFeatureStage."""

    def __init__(self):
        import struct

        from ..functions.wavcodec import audio_features, decode_wav

        self._decode = decode_wav
        self._features = audio_features
        # malformed containers: bad magic/format (ValueError) or a
        # truncated header slice (struct.error)
        self._err = (ValueError, struct.error)

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column("media_id").to_pylist()
        blobs = batch.column("wav").to_pylist()  # one to_pylist per batch
        rows = {k: np.zeros(len(ids)) for k in
                ("duration_s", "rms", "zcr_hz", "dominant_freq_hz")}
        n_samples = np.zeros(len(ids), dtype=np.int64)
        ok = np.zeros(len(ids), dtype=bool)
        for i, blob in enumerate(blobs):
            if blob is None:
                continue
            try:
                f = self._features(*self._decode(blob))
            except self._err:
                continue
            for k in rows:
                rows[k][i] = f[k]
            n_samples[i] = f["n_samples"]
            ok[i] = True
        return pa.table(
            {
                "media_id": pa.array(ids, pa.string()),
                "decode_ok": pa.array(ok),
                **{k: pa.array(v) for k, v in rows.items()},
                "n_samples": pa.array(n_samples),
            },
            schema=WAV_FEATURE_SCHEMA,
        )


class DecodeImageStage:
    """bytes -> decoded-pixel features (mean channel values, recomputed
    phash).  Real for both PNG (pure-Python codec) and JPEG (pure-numpy
    baseline codec, functions/jpegcodec.py)."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        means = np.zeros((batch.num_rows, 3), dtype=np.float64)
        ok = np.zeros(batch.num_rows, dtype=bool)
        ph = np.zeros(batch.num_rows, dtype=np.int64)
        fmts = batch.column("fmt").to_pylist()
        # one to_pylist() per batch, not a per-row as_py(): per-row indexing
        # re-enters Arrow's chunked-array resolution for every blob
        blobs = batch.column("bytes").to_pylist()
        for i in range(batch.num_rows):
            blob = blobs[i]
            if blob is None or fmts[i] not in ("png", "jpeg"):
                continue
            px = decode_image(blob, fmts[i])
            means[i] = px.reshape(-1, 3).mean(axis=0)
            ph[i] = phash64(px)
            ok[i] = True
        return pa.table(
            {
                "image_id": batch.column("image_id"),
                "fmt": batch.column("fmt"),
                "w": batch.column("w"),
                "h": batch.column("h"),
                "decode_ok": pa.array(ok),
                "mean_r": pa.array(np.round(means[:, 0], 4)),
                "mean_g": pa.array(np.round(means[:, 1], 4)),
                "mean_b": pa.array(np.round(means[:, 2], 4)),
                "phash_decoded": pa.array(ph, pa.int64()),
                "phash_stored": batch.column("phash"),
            }
        )


class ResizeImageStage:
    """Decode -> block-mean resize to (out_w, out_h) -> re-encode PNG.
    Output keeps the corpus schema shape (image_id, bytes, w, h, fmt)."""

    def __init__(self, out_w: int = 16, out_h: int = 16):
        self.out_w, self.out_h = out_w, out_h

    def _resize(self, px: np.ndarray) -> np.ndarray:
        h, w, _ = px.shape
        yi = (np.arange(h) * self.out_h // h).astype(np.int64)
        xi = (np.arange(w) * self.out_w // w).astype(np.int64)
        sums = np.zeros((self.out_h, self.out_w, 3))
        counts = np.zeros((self.out_h, self.out_w, 1))
        np.add.at(sums, (yi[:, None], xi[None, :]), px)
        np.add.at(counts, (yi[:, None], xi[None, :]), 1.0)
        return (sums / counts).astype(np.uint8)

    def __call__(self, batch: pa.Table) -> pa.Table:
        blobs_out, ok = [], []
        blobs_in = batch.column("bytes").to_pylist()
        fmts = batch.column("fmt").to_pylist()
        for blob, fmt in zip(blobs_in, fmts):
            if blob is None or fmt not in ("png", "jpeg"):
                blobs_out.append(None)
                ok.append(False)
                continue
            blobs_out.append(png_encode(self._resize(decode_image(blob, fmt))))
            ok.append(True)
        return pa.table(
            {
                "image_id": batch.column("image_id"),
                "bytes": pa.array(blobs_out, pa.large_binary()),
                "w": pa.array(np.full(batch.num_rows, self.out_w, np.int32)),
                "h": pa.array(np.full(batch.num_rows, self.out_h, np.int32)),
                "fmt": pa.array(["png"] * batch.num_rows),
                "resize_ok": pa.array(ok),
            }
        )


AUDIO_FEATURE_SCHEMA = pa.schema(
    [
        pa.field("media_id", pa.string()),
        pa.field("duration_s", pa.float32()),
        pa.field("rms", pa.float32()),
        pa.field("n_samples", pa.int64()),
    ]
)


class AudioFeatureStage:
    """STUB (no audio codec in this sandbox): the actor signature, batch
    schema, and output layout are real; decode is gated.  With
    ``deterministic_fake=True`` it emits seeded fake features so the
    pipeline plumbing is testable end-to-end."""

    def __init__(self, deterministic_fake: bool = False):
        self.fake = deterministic_fake
        if not HAVE_AUDIO and not deterministic_fake:  # fail at pool build, not mid-crawl
            raise NotImplementedError(
                "audio decode requires soundfile/librosa (absent in sandbox); "
                "pass deterministic_fake=True to exercise the plumbing"
            )

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column("media_id").to_pylist()
        rng_vals = np.array(
            [abs(hash_stable(s)) % 10_000 for s in ids], dtype=np.float64
        )
        return pa.table(
            {
                "media_id": pa.array(ids, pa.string()),
                "duration_s": pa.array((rng_vals % 600 / 10).astype(np.float32)),
                "rms": pa.array((rng_vals % 97 / 97).astype(np.float32)),
                "n_samples": pa.array((rng_vals * 441).astype(np.int64)),
            },
            schema=AUDIO_FEATURE_SCHEMA,
        )


AVI_FRAME_FEATURE_SCHEMA = pa.schema(
    [
        pa.field("media_id", pa.string()),
        pa.field("frame_idx", pa.int32()),
        pa.field("decode_ok", pa.bool_()),
        pa.field("w", pa.int32()),
        pa.field("h", pa.int32()),
        pa.field("phash", pa.int64()),
        pa.field("mean_r", pa.float64()),
        pa.field("mean_g", pa.float64()),
        pa.field("mean_b", pa.float64()),
    ]
)


class AviFrameSampleStage:
    """REAL video frame sampling + per-frame features for MJPEG AVI bytes
    (pure-python RIFF demux, functions/avicodec.py; frames decoded with
    the baseline JPEG codec).  Samples ``n_frames`` evenly across each
    clip; per-frame pixel math is vectorized numpy.  Exotic containers
    (multi-stream, non-MJPG) raise in decode_avi and surface as
    decode_ok=False rows."""

    def __init__(self, n_frames: int = 3):
        import struct

        from ..functions.avicodec import decode_avi
        from ..functions.jpegcodec import jpeg_decode

        self.n_frames = n_frames
        self._demux = decode_avi
        self._decode = jpeg_decode
        # malformed containers: bad magic/stream type (ValueError) or a
        # truncated header slice (struct.error)
        self._err = (ValueError, struct.error)

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column("media_id").to_pylist()
        blobs = batch.column("avi").to_pylist()  # one to_pylist per batch
        out = {k: [] for k in ("media_id", "frame_idx", "decode_ok", "w", "h",
                               "phash", "mean_r", "mean_g", "mean_b")}

        def emit(mid, idx, ok, w=0, h=0, ph=0, means=(0.0, 0.0, 0.0)):
            out["media_id"].append(mid)
            out["frame_idx"].append(idx)
            out["decode_ok"].append(ok)
            out["w"].append(w)
            out["h"].append(h)
            out["phash"].append(ph)
            out["mean_r"].append(means[0])
            out["mean_g"].append(means[1])
            out["mean_b"].append(means[2])

        for mid, blob in zip(ids, blobs):
            if blob is None:
                emit(mid, -1, False)
                continue
            try:
                clip = self._demux(blob)
            except self._err:
                emit(mid, -1, False)
                continue
            n = clip["n_frames"]
            if n == 0:
                # a valid zero-frame container still gets its one row —
                # clips must never silently vanish from the output
                emit(mid, -1, True, clip["w"], clip["h"])
                continue
            k = min(self.n_frames, n)
            picks = np.unique(np.linspace(0, n - 1, k).round().astype(int))
            for idx in picks:
                px = self._decode(clip["frames"][idx])
                m = px.reshape(-1, 3).mean(axis=0)
                emit(mid, int(idx), True, px.shape[1], px.shape[0],
                     phash64(px), tuple(np.round(m, 4)))
        return pa.table(
            {
                "media_id": pa.array(out["media_id"], pa.string()),
                "frame_idx": pa.array(np.asarray(out["frame_idx"], np.int32)),
                "decode_ok": pa.array(out["decode_ok"]),
                "w": pa.array(np.asarray(out["w"], np.int32)),
                "h": pa.array(np.asarray(out["h"], np.int32)),
                "phash": pa.array(np.asarray(out["phash"], np.int64)),
                "mean_r": pa.array(np.asarray(out["mean_r"], np.float64)),
                "mean_g": pa.array(np.asarray(out["mean_g"], np.float64)),
                "mean_b": pa.array(np.asarray(out["mean_b"], np.float64)),
            },
            schema=AVI_FRAME_FEATURE_SCHEMA,
        )


VIDEO_FRAME_SCHEMA = pa.schema(
    [
        pa.field("media_id", pa.string()),
        pa.field("frame_idx", pa.int32()),
        pa.field("frame_png", pa.large_binary()),
    ]
)


class VideoFrameSampleStage:
    """STUB (no video codec): samples ``n_frames`` deterministic fake frames
    per row when deterministic_fake=True; raises otherwise."""

    def __init__(self, n_frames: int = 3, deterministic_fake: bool = False):
        self.n_frames = n_frames
        self.fake = deterministic_fake
        if not HAVE_VIDEO and not deterministic_fake:
            raise NotImplementedError(
                "video decode requires av/opencv (absent in sandbox); "
                "pass deterministic_fake=True to exercise the plumbing"
            )

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, frames, blobs = [], [], []
        for s in batch.column("media_id").to_pylist():
            for f in range(self.n_frames):
                rng = np.random.default_rng([abs(hash_stable(s)) % 2**31, f])
                px = rng.integers(0, 256, (8, 8, 3), dtype=np.uint8)
                ids.append(s)
                frames.append(f)
                blobs.append(png_encode(px))
        return pa.table(
            {
                "media_id": pa.array(ids, pa.string()),
                "frame_idx": pa.array(np.asarray(frames, np.int32)),
                "frame_png": pa.array(blobs, pa.large_binary()),
            },
            schema=VIDEO_FRAME_SCHEMA,
        )


def hash_stable(s: str) -> int:
    from hashlib import blake2b

    return int.from_bytes(blake2b(s.encode(), digest_size=8).digest(), "big", signed=False)
