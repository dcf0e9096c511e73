"""WAV codec + audio pipeline tests (the audio analog of test_imaging).

The WAV path is REAL (pure-numpy RIFF/PCM16, functions/wavcodec.py):
round trips are bit-exact, the chunk walker survives extra RIFF chunks,
and the feature extractor matches closed-form values on a pure sine.
"""

import struct

import numpy as np
import pytest


def test_wav_round_trip_exact():
    from weaver_ray.functions.wavcodec import decode_wav, encode_wav, synth_audio

    rate, pcm = synth_audio("clip000042")
    r2, p2 = decode_wav(encode_wav(pcm, rate))
    assert r2 == rate
    assert np.array_equal(pcm, p2)


def test_wav_chunk_walk_and_rejects():
    from weaver_ray.functions.wavcodec import decode_wav, encode_wav, synth_audio

    rate, pcm = synth_audio("clip000007")
    blob = encode_wav(pcm, rate)
    # insert an odd-sized LIST chunk (word-aligned pad byte) between fmt
    # and data — a conforming reader must skip it
    fmt_end = 12 + 8 + 16
    extra = b"LIST" + struct.pack("<I", 5) + b"INFOx" + b"\x00"
    blob2 = blob[:fmt_end] + extra + blob[fmt_end:]
    blob2 = b"RIFF" + struct.pack("<I", len(blob2) - 8) + blob2[8:]
    r2, p2 = decode_wav(blob2)
    assert r2 == rate and np.array_equal(pcm, p2)
    with pytest.raises(ValueError):
        decode_wav(b"nonsense bytes")
    # stereo rejected loudly, not misdecoded
    bad = bytearray(blob)
    bad[22:24] = struct.pack("<H", 2)
    with pytest.raises(ValueError):
        decode_wav(bytes(bad))


def test_audio_features_closed_form():
    """Pure sine: RMS == A/sqrt(2), ZCR == 2*f0, dominant bin == f0."""
    from weaver_ray.functions.wavcodec import RATE, audio_features

    f0, amp = 440.0, 0.5
    t = np.arange(RATE) / RATE
    pcm = np.clip(np.round(amp * np.sin(2 * np.pi * f0 * t) * 32767),
                  -32768, 32767).astype(np.int16)
    f = audio_features(RATE, pcm)
    assert abs(f["rms"] - amp / np.sqrt(2)) < 0.01
    assert abs(f["zcr_hz"] - 2 * f0) < 10
    assert abs(f["dominant_freq_hz"] - f0) < 1.5
    assert f["n_samples"] == RATE and f["duration_s"] == 1.0


def test_audio_corpus_deterministic(ray_session):
    """Regeneration is byte-identical (the SQL oracle depends on it)."""
    import shutil

    import pyarrow.parquet as pq

    from weaver_ray.pipelines.audio import audio_dir, generate_audio_corpus

    d = generate_audio_corpus(50)
    t1 = pq.read_table(d + "/part-00000.parquet")
    shutil.rmtree(audio_dir(50))
    t2 = pq.read_table(generate_audio_corpus(50) + "/part-00000.parquet")
    assert t1.equals(t2)


def test_wav_feature_stage_and_query(ray_session):
    """End-to-end actor-pool decode: every clip decodes, per-row verdicts
    hold (dominant frequency within 2 bins of the declared f0, RMS inside
    the fade envelope), and the SQL-oracled stats view agrees with the
    container arithmetic."""
    from weaver_ray.pipelines.audio import audio_wav_features, audio_wav_stats

    ft = audio_wav_features("unused", n_clips=50)
    assert len(ft) == 50
    assert ft["decode_ok"].all()
    assert ft["freq_ok"].all()
    assert ft["rms_ok"].all()
    st = audio_wav_stats("unused", n_clips=50)
    assert (st["n_samples"] == (st["n_bytes"] - 44) // 2).all()
    assert (st["n_samples"].to_numpy()
            == ft.sort_values("media_id")["n_samples"].to_numpy()).all()


def test_wav_stage_surfaces_truncated_blob():
    """A truncated fmt chunk (struct.error, not ValueError) must become a
    decode_ok=False row, not a stage crash (review finding)."""
    import struct

    import numpy as np
    import pyarrow as pa

    from weaver_ray.functions.wavcodec import encode_wav, synth_audio
    from weaver_ray.stages.decode import WavFeatureStage

    _, pcm = synth_audio("clip000009")
    good = encode_wav(pcm)
    truncated = (b"RIFF" + struct.pack("<I", 14) + b"WAVE"
                 + b"fmt " + struct.pack("<I", 16) + b"\x01\x00")
    out = WavFeatureStage()(pa.table({
        "media_id": pa.array(["bad", "none", "good"], pa.string()),
        "wav": pa.array([truncated, None, good], pa.large_binary()),
    })).to_pandas()
    assert list(out["decode_ok"]) == [False, False, True]
    assert out.loc[2, "n_samples"] == len(pcm)


def test_audio_fp_pairs_banded_equals_bruteforce(ray_session):
    """The 16x4-bit banding is pigeonhole-lossless to hamming<=15, so at
    the ham<=9 threshold the banded engine must equal brute force exactly
    — and recover every planted noisy variant."""
    import numpy as np

    from weaver_ray.functions.imaging import hamming64
    from weaver_ray.pipelines import audio

    df = audio.audio_fp_pairs("unused", n_clips=100)
    # brute force over the same fingerprints
    import pyarrow.parquet as pq

    from weaver_ray.functions.wavcodec import audio_fp64, decode_wav

    ids, fps = [], []
    for path in (audio.generate_audio_corpus(100),
                 audio.generate_audio_variants(100)):
        t = pq.read_table(path + "/part-00000.parquet")
        for mid, blob in zip(t.column("media_id").to_pylist(),
                             t.column("wav").to_pylist()):
            ids.append(mid)
            fps.append(np.uint64(audio_fp64(*decode_wav(blob))))
    order = np.argsort(np.array(ids))
    ids = [ids[k] for k in order]
    fp = np.array(fps, dtype=np.uint64)[order].astype(np.int64)
    a, b = np.triu_indices(len(ids), k=1)
    ham = hamming64(fp[a], fp[b])
    keep = ham <= 9
    brute = {(ids[i], ids[j], int(h))
             for i, j, h in zip(a[keep], b[keep], ham[keep])}
    got = set(zip(df["clip_a"], df["clip_b"], df["hamming"]))
    assert got == brute
    assert df["is_planted_complete"].all()
    # every planted base<->variant pair is present
    for i in range(100):
        for j in range(audio._chosen_variants(i)):
            mid = audio.media_id_of(i)
            assert ((df["clip_a"] == mid) & (df["clip_b"] == f"{mid}v{j}")).any()


def test_audio_fp_clusters_match_union_find(ray_session):
    """Distributed components over the audio near-dup graph equal a
    sequential union-find over the same pairs, and every planted variant
    lands in its base's cluster."""
    from weaver_ray.pipelines import audio

    pairs = audio.audio_fp_pairs("unused", n_clips=100)
    out = audio.audio_fp_clusters("unused", n_clips=100)
    # sequential union-find ground truth
    parent: dict = {}

    def find(x):
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in zip(pairs["clip_a"], pairs["clip_b"]):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    labels = dict(zip(out["media_id"], out["cluster_id"]))
    # same partition: two ids share a cluster iff union-find agrees
    node = dict(zip(out["media_id"],
                    audio._node_ids(out["media_id"])))
    for a, b in zip(pairs["clip_a"], pairs["clip_b"]):
        assert labels[a] == labels[b]
    # planted variants co-clustered with their base
    for i in range(100):
        mid = audio.media_id_of(i)
        for j in range(audio._chosen_variants(i)):
            assert labels[f"{mid}v{j}"] == labels[mid]
    # cluster_id is the minimum member node id
    import collections

    members = collections.defaultdict(list)
    for m, c in labels.items():
        members[c].append(node[m])
    for c, ns in members.items():
        assert c == min(ns)
