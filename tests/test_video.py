"""AVI/MJPEG codec + video pipeline tests (the video analog of
test_audio): real RIFF muxing, header/chunk consistency enforcement,
actor-pool frame sampling."""

import struct

import numpy as np
import pytest


def _clip(mid="vid000003"):
    from weaver_ray.functions.avicodec import encode_avi
    from weaver_ray.functions.jpegcodec import jpeg_encode
    from weaver_ray.pipelines.video import FPS, SIZE, synth_frames

    frames_px = synth_frames(mid)
    frames = [jpeg_encode(px, quality=92) for px in frames_px]
    return frames_px, frames, encode_avi(frames, SIZE, SIZE, FPS)


def test_avi_round_trip_exact():
    from weaver_ray.functions.avicodec import decode_avi
    from weaver_ray.pipelines.video import FPS, SIZE

    frames_px, frames, blob = _clip()
    d = decode_avi(blob)
    assert (d["w"], d["h"], d["fps"], d["n_frames"]) == \
        (SIZE, SIZE, FPS, len(frames))
    assert d["frames"] == frames  # byte-exact demux


def test_avi_rejects_malformed():
    from weaver_ray.functions.avicodec import decode_avi

    _, frames, blob = _clip()
    with pytest.raises(ValueError):
        decode_avi(b"not an avi at all....")
    # non-MJPG stream type rejected loudly
    bad = blob.replace(b"vids" + b"MJPG", b"vids" + b"H264", 1)
    with pytest.raises(ValueError):
        decode_avi(bad)
    # header/chunk count mismatch rejected (drop the last frame chunk but
    # keep the header count)
    from weaver_ray.functions.avicodec import encode_avi
    from weaver_ray.pipelines.video import FPS, SIZE

    truncated = encode_avi(frames[:-1], SIZE, SIZE, FPS)
    lying = truncated.replace(
        struct.pack("<I", len(frames) - 1) + b"\x00\x00\x00\x00\x01\x00\x00\x00",
        struct.pack("<I", len(frames)) + b"\x00\x00\x00\x00\x01\x00\x00\x00", 1)
    with pytest.raises(ValueError):
        decode_avi(lying)


def test_avi_frames_decode_to_source():
    """Every demuxed frame JPEG-decodes back to its source pixels at the
    codec's lossy fidelity (PSNR >= 38 dB at q=92 on synthetic frames)."""
    from weaver_ray.functions.imaging import psnr
    from weaver_ray.functions.jpegcodec import jpeg_decode

    frames_px, _, blob = _clip("vid000011")
    from weaver_ray.functions.avicodec import decode_avi

    for px, f in zip(frames_px, decode_avi(blob)["frames"]):
        dec = jpeg_decode(f)
        assert dec.shape == px.shape
        assert psnr(px, dec) >= 38.0


def test_video_corpus_deterministic(ray_session):
    import shutil

    import pyarrow.parquet as pq

    from weaver_ray.pipelines.video import generate_video_corpus, video_dir

    d = generate_video_corpus(10)
    t1 = pq.read_table(d + "/part-00000.parquet")
    shutil.rmtree(video_dir(10))
    t2 = pq.read_table(generate_video_corpus(10) + "/part-00000.parquet")
    assert t1.equals(t2)


def test_avi_frame_stage_and_stats(ray_session):
    """End-to-end actor-pool sampling: per-frame verdicts hold, sampled
    indices span each clip (first and last frame always included), and
    the container-parse stats equal the declared metadata."""
    import pyarrow.parquet as pq

    from weaver_ray.pipelines.video import (
        generate_video_corpus,
        video_avi_stats,
        video_frame_features,
    )

    ft = video_frame_features("unused", n_clips=10)
    assert ft["decode_ok"].all() and ft["shape_ok"].all()
    st = video_avi_stats("unused", n_clips=10)
    declared = pq.read_table(
        generate_video_corpus(10) + "/part-00000.parquet",
        columns=["media_id", "n_frames"]).to_pandas()
    merged = st.merge(declared, on="media_id", suffixes=("_parsed", "_declared"))
    assert (merged["n_frames_parsed"] == merged["n_frames_declared"]).all()
    for mid, g in ft.groupby("media_id"):
        n = int(declared.loc[declared["media_id"] == mid, "n_frames"].iloc[0])
        assert g["frame_idx"].min() == 0
        assert g["frame_idx"].max() == n - 1


def test_avi_stage_surfaces_bad_blob(ray_session):
    """A malformed container becomes a decode_ok=False row, not a stage
    crash."""
    import pyarrow as pa

    from weaver_ray.stages.decode import AviFrameSampleStage

    stage = AviFrameSampleStage(n_frames=2)
    _, _, good = _clip("vid000001")
    out = stage(pa.table({
        "media_id": pa.array(["bad", "good"], pa.string()),
        "avi": pa.array([b"garbage", good], pa.large_binary()),
    }))
    df = out.to_pandas()
    assert not df.loc[df["media_id"] == "bad", "decode_ok"].any()
    assert df.loc[df["media_id"] == "good", "decode_ok"].all()


def test_avi_stage_zero_frame_clip_keeps_row():
    """A structurally valid zero-frame AVI must still produce one output
    row (frame_idx=-1, decode_ok=True) — clips never silently vanish
    (review finding)."""
    import pyarrow as pa

    from weaver_ray.functions.avicodec import encode_avi
    from weaver_ray.stages.decode import AviFrameSampleStage

    blob = encode_avi([], 32, 32, 10)
    out = AviFrameSampleStage(n_frames=2)(pa.table({
        "media_id": pa.array(["empty"], pa.string()),
        "avi": pa.array([blob], pa.large_binary()),
    })).to_pandas()
    assert len(out) == 1
    assert bool(out.loc[0, "decode_ok"]) and int(out.loc[0, "frame_idx"]) == -1
    assert int(out.loc[0, "w"]) == 32
