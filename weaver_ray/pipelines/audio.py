"""Audio-axis pipelines over a deterministic WAV corpus.

The corpus is synthesized once to parquet (media_id, wav) with the REAL
pure-numpy RIFF/PCM16 encoder (functions/wavcodec.py) — any external WAV
reader decodes these bytes — and both the Ray engine and the DuckDB
oracle read the same files.  The canonical 44-byte header makes the
container itself SQL-auditable: n_samples == (octet_length(wav) - 44)/2,
which is what the ``audio_wav_stats`` oracle checks.  Spectral features
(RMS / zero-crossing rate / dominant frequency) are not SQL-expressible;
``audio_wav_features`` is self-evidencing instead — each row carries the
synth's declared f0 and a ``freq_ok`` verdict (rFFT argmax within 2 bins).

Reference analog: the reference stores fetched assets as opaque bytes
(src/storage/main.go:146-151); typed decode + feature extraction is the
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
from ..functions.wavcodec import RATE, encode_wav, synth_audio, synth_params

_AUDIO_VERSION = 1


def audio_dir(n_clips: int, seed: int = config.CORPUS_SEED,
              root: str = "/tmp/weaver_corpus") -> str:
    return os.path.join(root, f"seed{seed}_audio{n_clips}_v{_AUDIO_VERSION}")


def media_id_of(i: int) -> str:
    return f"clip{i:06d}"


def generate_audio_corpus(n_clips: int = 200, seed: int = config.CORPUS_SEED,
                          root: str = "/tmp/weaver_corpus") -> str:
    """Write (and cache) the WAV corpus (shared scaffold:
    common.memoized_parquet_corpus)."""

    def make(lo: int, hi: int) -> pa.Table:
        ids = [media_id_of(i) for i in range(lo, hi)]
        blobs = [encode_wav(synth_audio(m)[1]) for m in ids]
        return pa.table({"media_id": pa.array(ids, pa.string()),
                         "wav": pa.array(blobs, pa.large_binary())})

    chunk = 100
    spans = [(lo, min(lo + chunk, n_clips)) for lo in range(0, n_clips, chunk)]
    return memoized_parquet_corpus(
        audio_dir(n_clips, seed, root), spans, make,
        f"n_clips={n_clips} seed={seed} rate={RATE}\n")


def read_audio(path: str, columns: list[str] | None = None) -> rd.Dataset:
    files = sorted(str(p) for p in Path(path).glob("part-*.parquet"))
    return rd.read_parquet(files, columns=columns)


def audio_wav_features_ds(sf_dir: str, n_clips: int = 200) -> rd.Dataset:
    """Decode + feature-extract as an actor-pool map_batches over small
    batches (binary rows are wide — same shape as the image stages)."""
    from ..stages.decode import WavFeatureStage

    return read_audio(generate_audio_corpus(n_clips)).map_batches(
        WavFeatureStage, batch_size=32, concurrency=2,
        batch_format="pyarrow")


def audio_wav_features(sf_dir: str, n_clips: int = 200) -> pd.DataFrame:
    """Query shim + per-row self-evidence: joins each clip's extracted
    features with the synth's declared parameters (pure arithmetic from
    media_id — no second pipeline) and verdicts:

    - ``freq_ok``: rFFT dominant frequency within 2 bins of declared f0
    - ``rms_ok``: RMS within the fade envelope's analytic range
    """
    df = audio_wav_features_ds(sf_dir, n_clips).to_pandas()
    ps = [synth_params(m) for m in df["media_id"]]
    df["f0_declared_hz"] = [p["f0_hz"] for p in ps]
    bin_hz = RATE / df["n_samples"].to_numpy()
    df["freq_ok"] = (df["dominant_freq_hz"] - df["f0_declared_hz"]).abs() \
        <= 2 * bin_hz
    # amp * fade in [0.25, 1]: sine RMS = amp/sqrt(2) * fade-RMS; keep a
    # generous envelope (harmonic + noise add a little energy)
    amp = np.array([p["amp"] for p in ps])
    df["rms_ok"] = (df["rms"] > amp * 0.25 / np.sqrt(2)) & (df["rms"] < amp)
    return df.sort_values("media_id").reset_index(drop=True)


def audio_wav_stats(sf_dir: str, n_clips: int = 200) -> pd.DataFrame:
    """SQL-oracled container audit: per-clip byte/sample/duration stats
    derived by the engine from the DECODED stream, which the oracle
    reproduces from the container arithmetic alone
    (n_samples == (octet_length(wav) - 44) / 2 for the canonical header
    this corpus writes)."""
    from ..stages.decode import WavFeatureStage  # noqa: F401  (same read path)

    def stats(t: pa.Table) -> pd.DataFrame:
        from ..functions.wavcodec import decode_wav

        ids = t.column("media_id").to_pylist()
        blobs = t.column("wav").to_pylist()
        n_bytes = np.array([len(b) for b in blobs], dtype=np.int64)
        decoded = [decode_wav(b) for b in blobs]
        n_samples = np.array([len(p) for _, p in decoded], dtype=np.int64)
        rates = np.array([r for r, _ in decoded], dtype=np.int64)
        return pd.DataFrame({
            "media_id": np.asarray(ids, object),
            "n_bytes": n_bytes,
            "n_samples": n_samples,
            "duration_s": n_samples / rates,
        })

    ds = read_audio(generate_audio_corpus(n_clips)).map_batches(
        stats, batch_size=64, batch_format="pyarrow")
    out = ds.to_pandas().sort_values("media_id").reset_index(drop=True)
    out["n_bytes"] = out["n_bytes"].astype(np.int64)
    out["n_samples"] = out["n_samples"].astype(np.int64)
    return out


# ------------------------------------------------------------- fp near-dup

_VARIANTS_VERSION = 1
_NOISE_FRAC = 0.001  # planted-variant amplitude noise (fp moves <= 9 bits)
_MAX_VARIANTS = 7    # node-id scheme reserves 3 bits per base clip


def audio_variants_dir(n_clips: int, seed: int = config.CORPUS_SEED,
                       root: str = "/tmp/weaver_corpus") -> str:
    return os.path.join(
        root, f"seed{seed}_audio{n_clips}_variants_v{_VARIANTS_VERSION}")


def _chosen_variants(i: int) -> int:
    """Deterministic plant plan (mirrors images): every 4th clip gets 1
    or 2 noisy variants."""
    return (1 + (i // 4) % 2) if i % 4 == 0 else 0


def generate_audio_variants(n_clips: int = 200,
                            seed: int = config.CORPUS_SEED,
                            root: str = "/tmp/weaver_corpus") -> str:
    """Planted near-duplicates through the REAL codec: decode the stored
    WAV, add +/-0.1% amplitude noise, re-encode.  The fingerprint moves
    <= 9 of 64 bits (measured) while distinct clips differ by >= 16, so
    the banded search recovers every planted pair at max_hamming=9."""
    from ..functions.wavcodec import decode_wav

    base_path = generate_audio_corpus(n_clips, seed, root)

    def make(lo: int, hi: int) -> pa.Table:
        base = pq.read_table(base_path + "/part-00000.parquet")
        rows = {base.column("media_id")[k].as_py(): k
                for k in range(base.num_rows)}
        ids, blobs = [], []
        for i in range(lo, hi):
            nv = _chosen_variants(i)
            if not nv:
                continue
            mid = media_id_of(i)
            rate, pcm = decode_wav(base.column("wav")[rows[mid]].as_py())
            for j in range(nv):
                rng = np.random.default_rng([seed, 999, i, j])
                x = pcm.astype(np.float64) + rng.normal(
                    0.0, _NOISE_FRAC * 32768, len(pcm))
                pcm2 = np.clip(np.round(x), -32768, 32767).astype(np.int16)
                ids.append(f"{mid}v{j}")
                blobs.append(encode_wav(pcm2, rate))
        return pa.table({"media_id": pa.array(ids, pa.string()),
                         "wav": pa.array(blobs, pa.large_binary())})

    chunk = 100
    spans = [(lo, min(lo + chunk, n_clips)) for lo in range(0, n_clips, chunk)]
    return memoized_parquet_corpus(
        audio_variants_dir(n_clips, seed, root), spans, make,
        f"n_clips={n_clips} seed={seed} noise={_NOISE_FRAC}\n")


def _fp_universe(n_clips: int) -> rd.Dataset:
    """(media_id, fp) over base ∪ variants — fingerprints computed in the
    map stage (decode + FFT per clip, vectorized per sample)."""
    from ..functions.wavcodec import audio_fp64, decode_wav

    base = read_audio(generate_audio_corpus(n_clips))
    var = read_audio(generate_audio_variants(n_clips))

    def fp_batch(t: pa.Table) -> pd.DataFrame:
        ids = t.column("media_id").to_pylist()
        blobs = t.column("wav").to_pylist()
        fps = np.array([np.uint64(audio_fp64(*decode_wav(b))) for b in blobs],
                       dtype=np.uint64)
        return pd.DataFrame({"media_id": np.asarray(ids, object),
                             "fp": fps.astype(np.int64)})

    return base.union(var).map_batches(fp_batch, batch_size=64,
                                       batch_format="pyarrow")


def audio_fp_pairs_ds(sf_dir: str, max_hamming: int = 9,
                      n_clips: int = 200) -> rd.Dataset:
    """Audio near-dup pairs: 16x4-bit band blocking over the fingerprint
    (pigeonhole: hamming<=15 of 64 bits implies >=1 exact band — lossless
    at the ham<=9 threshold), reusing the same banded machinery as
    simhash and image phash (dedup.banded_hamming_pairs_ds).  Scale note:
    4-bit band values mean bucket sizes grow as N/16 per band value; at
    production scale the same math applies to a 256-bit fingerprint whose
    16-bit bands keep buckets selective for the same radius RATIO."""
    from .dedup import banded_hamming_pairs_ds

    def band_batch(df: pd.DataFrame) -> pd.DataFrame:
        fp = df["fp"].to_numpy().astype(np.uint64)
        n = len(fp)
        return pd.DataFrame({
            "media_id": np.tile(df["media_id"].to_numpy(), 16),
            "sig": np.tile(fp.astype(np.int64), 16),
            "band_id": np.repeat(np.arange(16, dtype=np.int32), n),
            "band_val": np.concatenate(
                [((fp >> np.uint64(4 * b)) & np.uint64(0xF)).astype(np.int64)
                 for b in range(16)]),
        })

    bands = _fp_universe(n_clips).map_batches(band_batch, batch_format="pandas")
    return banded_hamming_pairs_ds(bands, "media_id", "clip_a", "clip_b",
                                   max_hamming)


def audio_fp_pairs(sf_dir: str, max_hamming: int = 9,
                   n_clips: int = 200) -> pd.DataFrame:
    """Query shim + per-row self-evidence: ``planted`` marks pairs that
    share a base clip (the ground truth the noise plant created);
    ``is_planted_complete`` on every row records whether ALL planted
    pairs were recovered (banded search is lossless at this radius)."""
    from .dedup import _pairs_to_pandas

    df = _pairs_to_pandas(
        audio_fp_pairs_ds(sf_dir, max_hamming, n_clips),
        ["clip_a", "clip_b"],
        {"clip_a": object, "clip_b": object, "hamming": np.int64})
    base = df["clip_a"].str.slice(0, 10)
    df["planted"] = (df["clip_b"].str.slice(0, 10) == base) \
        & (df["clip_a"].str.len() != df["clip_b"].str.len()) \
        | ((df["clip_a"].str.len() > 10) & (df["clip_b"].str.len() > 10)
           & (df["clip_b"].str.slice(0, 10) == base))
    want = 0
    for i in range(n_clips):
        nv = _chosen_variants(i)
        want += nv * (nv + 1) // 2  # base<->variant + variant<->variant
    got = int(df["planted"].sum())
    df["is_planted_complete"] = got >= want
    return df


# node-id scheme (invertible, mirrors images): base clip%06d -> 8*i,
# variant clip%06dvJ -> 8*i + 1 + J  (J < _MAX_VARIANTS)
def _node_ids(media_ids: pd.Series) -> np.ndarray:
    i = media_ids.str.slice(4, 10).astype(np.int64)
    var = media_ids.str.len().gt(10)
    j = pd.Series(np.zeros(len(media_ids), dtype=np.int64),
                  index=media_ids.index)
    if var.any():
        j[var] = media_ids[var].str.slice(11).astype(np.int64) + 1
    return (i * 8 + j).to_numpy()


def _media_id_of_node(nodes: np.ndarray) -> np.ndarray:
    i, r = nodes // 8, nodes % 8
    return np.array(
        [f"clip{b:06d}" + ("" if rr == 0 else f"v{rr - 1}")
         for b, rr in zip(i, r)], dtype=object)


def audio_fp_clusters_ds(sf_dir: str, max_hamming: int = 9,
                         n_clips: int = 200) -> rd.Dataset:
    """Connected components over the audio near-dup graph — the same
    task-based distributed label propagation as text and image clustering
    (dedup.connected_components_ds), completing the modality symmetry."""
    from .dedup import connected_components_ds

    pairs = audio_fp_pairs_ds(sf_dir, max_hamming, n_clips)
    edges = pairs.map_batches(
        lambda df: pd.DataFrame({"src": _node_ids(df["clip_a"]),
                                 "dst": _node_ids(df["clip_b"])}),
        batch_format="pandas",
    )
    nodes = _fp_universe(n_clips).map_batches(
        lambda df: pd.DataFrame({"doc_id": _node_ids(df["media_id"])}),
        batch_format="pandas",
    )
    labels = connected_components_ds(nodes, edges)
    return labels.map_batches(
        lambda df: pd.DataFrame(
            {"media_id": _media_id_of_node(df["doc_id"].to_numpy(np.int64)),
             "cluster_id": df["cluster_id"].to_numpy(np.int64)}),
        batch_format="pandas",
    )


def audio_fp_clusters(sf_dir: str, max_hamming: int = 9,
                      n_clips: int = 200) -> pd.DataFrame:
    """Query shim + per-row self-evidence over the result set (the
    audio_fp_pairs pattern): ``planted_cohesion_ok`` records whether EVERY
    planted noisy variant landed in its base clip's cluster (the ground
    truth the noise plant created), and ``min_label_ok`` whether every
    cluster_id equals the minimum member node id (the connected-components
    label contract).  Both checks run over the already-collected result
    frame — O(result) driver work on a query-shim path."""
    from .dedup import _pairs_to_pandas

    df = _pairs_to_pandas(
        audio_fp_clusters_ds(sf_dir, max_hamming, n_clips),
        ["media_id"], {"media_id": object, "cluster_id": np.int64})
    # planted cohesion: base clip%06d and every clip%06dvJ share one label
    base_key = df["media_id"].str.slice(0, 10)
    cohesion = bool((df.groupby(base_key)["cluster_id"]
                     .nunique() == 1).all())
    # label contract: cluster_id is the min node id among its members
    mins = pd.Series(_node_ids(df["media_id"])).groupby(
        df["cluster_id"].to_numpy()).min()
    min_ok = bool((mins.index.to_numpy() == mins.to_numpy()).all())
    df["planted_cohesion_ok"] = cohesion
    df["min_label_ok"] = min_ok
    return df
