"""Video-axis pipelines over a deterministic MJPEG-AVI corpus.

Clips are synthesized once to parquet as REAL AVI bytes (pure-python RIFF
muxer, functions/avicodec.py; frames encoded by the baseline JPEG codec) —
any MJPEG-capable player decodes them.  The parquet table also carries the
DECLARED clip metadata (n_frames, w, h, fps) as plain columns, which gives
``video_avi_stats`` a genuine SQL oracle: the engine re-derives the same
values by parsing the binary container, the oracle reads the declared
columns — equality proves the container encodes what was declared.
Per-frame pixel features (``video_frame_features``) are not
SQL-expressible; they are self-evidencing instead (every sampled frame
decodes, its dimensions match the container header, and the moving
pattern's mean brightness stays in the synth envelope).

Reference analog: the reference stores fetched assets as opaque bytes
(src/storage/main.go:146-151); typed decode + frame sampling is the
training-data extension the task brief asks for (multimodal columns).
"""

from __future__ import annotations

import os
from pathlib import Path

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import ray
import ray.data as rd

from .. import config
from .common import memoized_parquet_corpus
from ..functions.avicodec import decode_avi, encode_avi
from ..functions.jpegcodec import jpeg_encode

_VIDEO_VERSION = 1
FPS = 10
SIZE = 32  # frames are SIZE x SIZE


def video_dir(n_clips: int, seed: int = config.CORPUS_SEED,
              root: str = "/tmp/weaver_corpus") -> str:
    return os.path.join(root, f"seed{seed}_video{n_clips}_v{_VIDEO_VERSION}")


def media_id_of(i: int) -> str:
    return f"vid{i:06d}"


def synth_frames(media_id: str) -> list[np.ndarray]:
    """Deterministic clip: a seeded gradient background with a bright
    square moving one step per frame (so frames differ and per-frame
    features have structure).  4..9 frames per clip."""
    from hashlib import blake2b

    h = int.from_bytes(blake2b(media_id.encode(), digest_size=8).digest(), "big")
    rng = np.random.default_rng(h % 2**63)
    n = int(rng.integers(4, 10))
    base = np.zeros((SIZE, SIZE, 3), np.uint8)
    base[:, :, 0] = np.linspace(16, 240, SIZE, dtype=np.uint8)[None, :]
    base[:, :, 1] = np.linspace(240, 16, SIZE, dtype=np.uint8)[:, None]
    base[:, :, 2] = int(rng.integers(0, 256))
    x0, y0 = int(rng.integers(0, SIZE - 8)), int(rng.integers(0, SIZE - 8))
    out = []
    for k in range(n):
        px = base.copy()
        x = (x0 + 2 * k) % (SIZE - 8)
        y = (y0 + k) % (SIZE - 8)
        px[y:y + 8, x:x + 8] = 250
        out.append(px)
    return out


def generate_video_corpus(n_clips: int = 40, seed: int = config.CORPUS_SEED,
                          root: str = "/tmp/weaver_corpus") -> str:
    """Write (and cache) the AVI corpus (media_id, avi, declared metadata)
    via the shared scaffold (common.memoized_parquet_corpus)."""

    def make(lo: int, hi: int) -> pa.Table:
        ids, blobs, nfr = [], [], []
        for i in range(lo, hi):
            mid = media_id_of(i)
            frames_px = synth_frames(mid)
            frames = [jpeg_encode(px, quality=92) for px in frames_px]
            ids.append(mid)
            blobs.append(encode_avi(frames, SIZE, SIZE, FPS))
            nfr.append(len(frames))
        return pa.table({
            "media_id": pa.array(ids, pa.string()),
            "avi": pa.array(blobs, pa.large_binary()),
            "n_frames": pa.array(np.asarray(nfr, np.int32)),
            "w": pa.array(np.full(len(ids), SIZE, np.int32)),
            "h": pa.array(np.full(len(ids), SIZE, np.int32)),
            "fps": pa.array(np.full(len(ids), FPS, np.int32)),
        })

    chunk = 20
    spans = [(lo, min(lo + chunk, n_clips)) for lo in range(0, n_clips, chunk)]
    return memoized_parquet_corpus(
        video_dir(n_clips, seed, root), spans, make,
        f"n_clips={n_clips} seed={seed} fps={FPS} size={SIZE}\n")


def read_video(path: str, columns: list[str] | None = None) -> rd.Dataset:
    files = sorted(str(p) for p in Path(path).glob("part-*.parquet"))
    return rd.read_parquet(files, columns=columns)


def video_avi_stats(sf_dir: str, n_clips: int = 40) -> pd.DataFrame:
    """SQL-oracled container audit: the engine PARSES each AVI's binary
    headers (avih/strh + movi walk — decode_avi raises if the header
    count disagrees with the chunks found); the oracle reads the declared
    parquet columns.  Equality proves container == declaration."""

    def stats(t: pa.Table) -> pd.DataFrame:
        ids = t.column("media_id").to_pylist()
        blobs = t.column("avi").to_pylist()
        metas = [decode_avi(b) for b in blobs]
        return pd.DataFrame({
            "media_id": np.asarray(ids, object),
            "n_bytes": np.asarray([len(b) for b in blobs], np.int64),
            "n_frames": np.asarray([m["n_frames"] for m in metas], np.int32),
            "w": np.asarray([m["w"] for m in metas], np.int32),
            "h": np.asarray([m["h"] for m in metas], np.int32),
            "fps": np.asarray([m["fps"] for m in metas], np.int32),
        })

    ds = read_video(generate_video_corpus(n_clips)).map_batches(
        stats, batch_size=16, batch_format="pyarrow")
    return ds.to_pandas().sort_values("media_id").reset_index(drop=True)


def video_frame_features_ds(sf_dir: str, n_clips: int = 40,
                            n_frames: int = 3) -> rd.Dataset:
    """Frame sampling + per-frame features as an actor-pool map_batches
    (small batches — binary rows are wide, same shape as images)."""
    from ..stages.decode import AviFrameSampleStage

    return read_video(generate_video_corpus(n_clips),
                      ["media_id", "avi"]).map_batches(
        AviFrameSampleStage, fn_constructor_kwargs={"n_frames": n_frames},
        batch_size=8, concurrency=2, batch_format="pyarrow")


def video_frame_features(sf_dir: str, n_clips: int = 40,
                         n_frames: int = 3) -> pd.DataFrame:
    """Query shim + per-row self-evidence: ``decode_ok`` (every sampled
    frame decodes), ``shape_ok`` (decoded dims == container header), and
    ``bright_ok`` (the synth's 250-value square keeps the frame mean in
    a known envelope)."""
    df = video_frame_features_ds(sf_dir, n_clips, n_frames).to_pandas()
    df["shape_ok"] = (df["w"] == SIZE) & (df["h"] == SIZE)
    mean_all = (df["mean_r"] + df["mean_g"] + df["mean_b"]) / 3
    df["bright_ok"] = (mean_all > 32) & (mean_all < 224)
    return df.sort_values(["media_id", "frame_idx"]).reset_index(drop=True)
