"""Image-axis pipelines over the image+caption corpus (the input table of
BASELINE.json's input_hint): perceptual-hash near-dup pairs + connected
components, and per-format corpus statistics.

Variant corpus (planted near-dups): for a deterministic subset of base
rows, DECODE the stored bytes with the real codec (PNG pure-Python /
JPEG pure-numpy), add small deterministic pixel noise, RE-ENCODE as PNG
and recompute the phash — written once to parquet and memoized.  +/-2
pixel noise moves the 64-bit phash by <=1 bit (measured; the DCT
low-frequency signs are stable under small perturbations), so every
base<->variant pair sits within hamming<=2 and is recoverable at the
ham<=3 threshold.  Both the Ray engine and the DuckDB oracle read the
SAME two parquet directories: the banded engine + distributed connected
components are hash-checked against a brute-force ``bit_count(xor(..))``
self-join + recursive transitive closure (__ray_entry__.py) — the same
banded==brute-force pigeonhole argument as simhash (4 bands x 16 bits
cover hamming<=3).

Reference analog: the reference parses each product page and stores the
record keyed by its URL (src/scrapper/neweggProductHandler.go:12-57,
insertProduct); near-dup detection over the stored image table is the
training-data extension the task brief asks for (SURVEY.md §2.7 phash
hook).
"""

from __future__ import annotations

import os
import re
from pathlib import Path

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import ray
import ray.data as rd

from .. import config
from ..functions.imaging import decode_image, encode_image, hamming64, phash64
from ..sources.corpus import (
    corpus_dir,
    generate_corpus,
    image_id_of,
    read_corpus,
)
from .common import partial_groupby, sql_round
from .dedup import _pairs_to_pandas, connected_components_ds

_VARIANTS_VERSION = 1
_NOISE = 2          # +/- pixel noise amplitude (phash moves <=1 bit)
_MAX_VARIANTS = 7   # node-id scheme reserves 3 bits per base image


def variants_dir(n_base: int, seed: int = config.CORPUS_SEED,
                 root: str = "/tmp/weaver_corpus") -> str:
    return os.path.join(
        root, f"seed{seed}_n{n_base}_variants_v{_VARIANTS_VERSION}")


def _chosen_variants(i: int) -> int:
    """Deterministic plant plan: every 4th base image gets 1 or 2 noisy
    variants (cluster sizes 2 and 3 both exercised)."""
    return (1 + (i // 4) % 2) if i % 4 == 0 else 0


def _make_variant_rows(base: pa.Table, indices: np.ndarray,
                       seed: int) -> pa.Table:
    ids, blobs, ws, hs, caps, phs, bases = [], [], [], [], [], [], []
    rows = {base.column("image_id")[k].as_py(): k for k in range(base.num_rows)}
    for i in indices:
        bid = image_id_of(int(i))
        k = rows[bid]
        px = decode_image(base.column("bytes")[k].as_py(),
                          base.column("fmt")[k].as_py())
        for j in range(_chosen_variants(int(i))):
            rng = np.random.default_rng([seed, 777, int(i), j])
            delta = rng.integers(-_NOISE, _NOISE + 1, size=px.shape,
                                 dtype=np.int16)
            px2 = np.clip(px.astype(np.int16) + delta, 0, 255).astype(np.uint8)
            blob, fmt2 = encode_image(px2, "png")  # lossless: stored == decoded
            ids.append(f"{bid}v{j}")
            blobs.append(blob)
            ws.append(px2.shape[1])
            hs.append(px2.shape[0])
            caps.append(base.column("caption")[k].as_py())
            phs.append(phash64(px2))
            bases.append(bid)
    return pa.table(
        {
            "image_id": pa.array(ids, pa.string()),
            "bytes": pa.array(blobs, pa.large_binary()),
            "w": pa.array(ws, pa.int32()),
            "h": pa.array(hs, pa.int32()),
            "fmt": pa.array(["png"] * len(ids), pa.string()),
            "caption": pa.array(caps, pa.string()),
            "phash": pa.array(phs, pa.int64()),
            "base_id": pa.array(bases, pa.string()),
        }
    )


def generate_variants(n_base: int = 1000, seed: int = config.CORPUS_SEED,
                      root: str = "/tmp/weaver_corpus") -> str:
    """Write (and cache) the noisy-variant table for the (seed, n_base)
    corpus.  Decode/noise/encode fans out as Ray tasks when a session
    exists (CPU-bound codec work), serial otherwise."""
    base_path = generate_corpus(n_base, seed, root)
    d = Path(variants_dir(n_base, seed, root))
    done = d / "_DONE"
    if done.exists():
        return str(d)
    d.mkdir(parents=True, exist_ok=True)
    for old in d.glob("*"):
        old.unlink()

    import pyarrow.feather as feather
    import ray as _ray

    chosen = np.array([i for i in range(n_base) if _chosen_variants(i)])
    chunk = 250
    starts = list(range(0, len(chosen), chunk))

    def make(idx: np.ndarray) -> pa.Table:
        base = feather.read_table(os.path.join(base_path, "corpus.feather"))
        return _make_variant_rows(base, idx, seed)

    if _ray.is_initialized() and len(starts) > 1:
        gen = _ray.remote(lambda s0: make(chosen[s0:s0 + chunk]))
        chunks = _ray.get([gen.remote(s0) for s0 in starts])
    else:
        chunks = [make(chosen[s0:s0 + chunk]) for s0 in starts]
    pq.write_table(pa.concat_tables(chunks), d / "part-00000.parquet")
    done.write_text(f"n_base={n_base} seed={seed} noise={_NOISE}\n")
    return str(d)


def read_variants(path: str, columns: list[str] | None = None) -> rd.Dataset:
    files = sorted(str(p) for p in Path(path).glob("part-*.parquet"))
    return rd.read_parquet(files, columns=columns)


# ------------------------------------------------------------------ exact-dup plant

_DUPS_VERSION = 1


def dups_dir(n_base: int, seed: int = config.CORPUS_SEED,
             root: str = "/tmp/weaver_corpus") -> str:
    return os.path.join(root, f"seed{seed}_n{n_base}_dups_v{_DUPS_VERSION}")


def _chosen_dup(i: int) -> bool:
    """Deterministic exact-dup plant plan: every 10th base image gets one
    byte-identical copy (a different crawl URL serving the same asset —
    the case exact dedup exists for)."""
    return i % 10 == 3


def generate_dups(n_base: int = 1000, seed: int = config.CORPUS_SEED,
                  root: str = "/tmp/weaver_corpus") -> str:
    """Write (and cache) the EXACT-duplicate table: byte-identical copies
    of the chosen base rows under image_id ``f"{bid}v6"`` — the last slot
    of the invertible node-id scheme (real noisy variants only ever use
    v0/v1, so v6 is reserved and both ``_node_ids`` and the SQL node
    expression handle the copies with no new machinery)."""
    base_path = generate_corpus(n_base, seed, root)
    d = Path(dups_dir(n_base, seed, root))
    done = d / "_DONE"
    if done.exists():
        return str(d)
    d.mkdir(parents=True, exist_ok=True)
    for old in d.glob("*"):
        old.unlink()

    import pyarrow.feather as feather

    base = feather.read_table(os.path.join(base_path, "corpus.feather"))
    keep = np.array([k for k in range(base.num_rows)
                     if _chosen_dup(int(base.column("image_id")[k].as_py()[3:]))],
                    dtype=np.int64)  # empty plan must stay an int index
    sub = base.take(keep)
    ids = pa.array([f"{i}v6" for i in sub.column("image_id").to_pylist()],
                   pa.string())
    cols = {name: sub.column(name) for name in sub.schema.names}
    cols["image_id"] = ids
    pq.write_table(pa.table(cols), d / "part-00000.parquet")
    done.write_text(f"n_base={n_base} seed={seed} plan=i%10==3\n")
    return str(d)


def read_dups(path: str, columns: list[str] | None = None) -> rd.Dataset:
    files = sorted(str(p) for p in Path(path).glob("part-*.parquet"))
    return rd.read_parquet(files, columns=columns)


def _full_universe(n_base: int, columns: list[str]) -> rd.Dataset:
    """base ∪ variants ∪ exact-dup copies, column-pruned at the read —
    the input table of the exact-dedup and curation operators."""
    return (read_corpus(generate_corpus(n_base), columns)
            .union(read_variants(generate_variants(n_base), columns))
            .union(read_dups(generate_dups(n_base), columns)))


# ------------------------------------------------------------------ phash near-dup

def _phash_universe(n_base: int) -> rd.Dataset:
    """(image_id, phash) over base corpus UNION variants — column-pruned
    scans of both parquet directories."""
    base = read_corpus(generate_corpus(n_base), ["image_id", "phash"])
    var = read_variants(generate_variants(n_base), ["image_id", "phash"])
    return base.union(var)


def _phash_band_pairs(universe: rd.Dataset, max_hamming: int) -> rd.Dataset:
    """Banded phash near-dup pairs over any (image_id, phash) Dataset:
    4x16-bit band blocking (pigeonhole: hamming<=3 of 64 bits implies >=1
    exact band match — banding is lossless vs brute force), hamming
    verified inside each band bucket, cross-band dedup distributed.
    Shares dedup.banded_hamming_pairs_ds with simhash; at 100 TB nothing
    here touches the driver."""
    from .dedup import banded_hamming_pairs_ds

    def band_batch(df: pd.DataFrame) -> pd.DataFrame:
        ph = df["phash"].to_numpy().astype(np.uint64)
        n = len(ph)
        return pd.DataFrame(
            {
                "image_id": np.tile(df["image_id"].to_numpy(), 4),
                "sig": np.tile(ph.astype(np.int64), 4),
                "band_id": np.repeat(np.arange(4, dtype=np.int32), n),
                "band_val": np.concatenate(
                    [((ph >> np.uint64(16 * b)) & np.uint64(0xFFFF)).astype(np.int64)
                     for b in range(4)]
                ),
            }
        )

    bands = universe.map_batches(band_batch, batch_format="pandas")
    return banded_hamming_pairs_ds(bands, "image_id", "image_a", "image_b",
                                   max_hamming)


def image_phash_pairs_ds(sf_dir: str, max_hamming: int = 3,
                         n_base: int = 1000) -> rd.Dataset:
    """Perceptual-hash near-dup pairs over base ∪ variants (see
    :func:`_phash_band_pairs` for the scale shape)."""
    return _phash_band_pairs(_phash_universe(n_base), max_hamming)


def image_phash_pairs(sf_dir: str, max_hamming: int = 3,
                      n_base: int = 1000) -> pd.DataFrame:
    """Query shim: sorted pandas view of :func:`image_phash_pairs_ds`."""
    return _pairs_to_pandas(
        image_phash_pairs_ds(sf_dir, max_hamming, n_base),
        ["image_a", "image_b"],
        {"image_a": object, "image_b": object, "hamming": np.int64})


_CAPTION_TOK = re.compile(r"[A-Za-z0-9_]+")


def multimodal_joint_pairs_ds(sf_dir: str, max_hamming: int = 3,
                              min_jaccard: float = 0.5,
                              n_base: int = 1000,
                              num_buckets: int = 16,
                              broadcast_threshold: int = 100_000) -> rd.Dataset:
    """CROSS-MODAL near-dup: pairs close in BOTH modalities — perceptual
    hash (image pixels) AND caption token-set Jaccard (text).  The cheap
    banded phash blocking generates candidates; the caption check runs only
    on those (output-bounded) — a phash collision between unrelated images
    is rejected by its caption, which is exactly why a multimodal corpus
    dedups on both signals.  The per-pair token-set work is bounded by the
    candidate count, never the corpus.

    Caption decoration is gated like minhash's verify side: while the
    CORPUS is small (< broadcast_threshold rows) the caption map broadcasts
    via ray.put and the whole verify is ONE map_batches over the pairs
    (zero shuffles — each bucketed join costs seconds of fixed sort/pool
    machinery, which dwarfs a 1k-image corpus); past the gate it becomes
    two bucketed hash joins keyed by each pair side, so captions stay
    distributed at 100 TB."""
    import ray

    from .common import _cached_get, hash_join

    pairs = image_phash_pairs_ds(sf_dir, max_hamming, n_base)

    def _jac_frame(image_a, image_b, hamming, ta, tb) -> pd.DataFrame:
        jac = np.array([(len(a & b) / len(a | b)) if (a or b) else 0.0
                        for a, b in zip(ta, tb)])
        out = pd.DataFrame({
            "image_a": image_a, "image_b": image_b,
            "hamming": np.asarray(hamming, np.int64),
            "caption_jaccard": sql_round(jac, 4)})
        return out[jac >= min_jaccard]

    def _toks(captions) -> list:
        return [set(_CAPTION_TOK.findall(c.lower())) for c in captions]

    n_corpus = _universe_row_count(n_base)  # parquet metadata, no executor
    if n_corpus < broadcast_threshold:
        cap_tbl = pa.concat_tables(ray.get(
            _phash_caption_universe(n_base).materialize().to_arrow_refs()))
        cap_map = dict(zip(cap_tbl["image_id"].to_pylist(),
                           _toks(cap_tbl["caption"].to_pylist())))
        ref = ray.put(cap_map)

        def verify(j: pd.DataFrame) -> pd.DataFrame:
            m = _cached_get(ref)
            return _jac_frame(j["image_a"], j["image_b"], j["hamming"],
                              [m[i] for i in j["image_a"]],
                              [m[i] for i in j["image_b"]])

        return pairs.map_batches(verify, batch_format="pandas")

    def jaccard(j: pd.DataFrame) -> pd.DataFrame:
        if j.empty:
            return pd.DataFrame({
                "image_a": pd.Series([], dtype=object),
                "image_b": pd.Series([], dtype=object),
                "hamming": pd.Series([], dtype=np.int64),
                "caption_jaccard": pd.Series([], dtype=np.float64)})
        return _jac_frame(j["image_a"], j["image_b"], j["hamming"],
                          _toks(j["cap_a"]), _toks(j["cap_b"]))

    caps = _phash_caption_universe(n_base)
    a_caps = caps.map_batches(
        lambda b: b.rename(columns={"image_id": "image_a", "caption": "cap_a"}),
        batch_format="pandas")
    b_caps = caps.map_batches(
        lambda b: b.rename(columns={"image_id": "image_b", "caption": "cap_b"}),
        batch_format="pandas")
    withe_a = hash_join(pairs, a_caps, on="image_a",
                        lcols=["image_a", "image_b", "hamming"],
                        rcols=["image_a", "cap_a"], num_buckets=num_buckets)
    return hash_join(withe_a, b_caps, on="image_b",
                     lcols=["image_a", "image_b", "hamming", "cap_a"],
                     rcols=["image_b", "cap_b"], num_buckets=num_buckets,
                     post=jaccard)


def _phash_caption_universe(n_base: int) -> rd.Dataset:
    base = read_corpus(generate_corpus(n_base), ["image_id", "caption"])
    var = read_variants(generate_variants(n_base), ["image_id", "caption"])
    return base.union(var)


def _universe_row_count(n_base: int) -> int:
    """Row count of base ∪ variants from parquet FILE METADATA — the
    broadcast-vs-join gate needs only a size, so don't pay a Ray
    streaming-executor launch (~1 s fixed on this sandbox) to count."""
    total = 0
    for root in (generate_corpus(n_base), generate_variants(n_base)):
        for p in Path(root).glob("part-*.parquet"):
            total += pq.ParquetFile(p).metadata.num_rows
    return total


def multimodal_joint_pairs(sf_dir: str, max_hamming: int = 3,
                           min_jaccard: float = 0.5,
                           n_base: int = 1000) -> pd.DataFrame:
    """Query shim: sorted pandas view of :func:`multimodal_joint_pairs_ds`."""
    return _pairs_to_pandas(
        multimodal_joint_pairs_ds(sf_dir, max_hamming, min_jaccard, n_base),
        ["image_a", "image_b"],
        {"image_a": object, "image_b": object, "hamming": np.int64,
         "caption_jaccard": np.float64})


# node-id scheme (invertible, SQL-reconstructable): base img%08d -> 8*i,
# variant img%08dvJ -> 8*i + 1 + J  (J < _MAX_VARIANTS)
def _node_ids(image_ids: pd.Series) -> np.ndarray:
    i = image_ids.str.slice(3, 11).astype(np.int64)
    var = image_ids.str.len().gt(11)
    j = pd.Series(np.zeros(len(image_ids), dtype=np.int64),
                  index=image_ids.index)
    if var.any():
        j[var] = image_ids[var].str.slice(12).astype(np.int64) + 1
    return (i * 8 + j).to_numpy()


def _image_id_of_node(nodes: np.ndarray) -> np.ndarray:
    i, r = nodes // 8, nodes % 8
    return np.array(
        [f"img{b:08d}" + ("" if rr == 0 else f"v{rr - 1}")
         for b, rr in zip(i, r)], dtype=object)


def image_phash_clusters_ds(sf_dir: str, max_hamming: int = 3,
                            n_base: int = 1000) -> rd.Dataset:
    """Connected components over the phash near-dup graph (pairs from
    :func:`image_phash_pairs_ds`, components via the shared distributed
    min-label propagation in dedup.connected_components_ds).  Output:
    (image_id, cluster_id) with cluster_id = smallest reachable node id —
    the canonical representative an image-dedup pass would keep."""
    pairs = image_phash_pairs_ds(sf_dir, max_hamming, n_base)
    edges = pairs.map_batches(
        lambda df: pd.DataFrame({"src": _node_ids(df["image_a"]),
                                 "dst": _node_ids(df["image_b"])}),
        batch_format="pandas",
    )
    nodes = _phash_universe(n_base).map_batches(
        lambda df: pd.DataFrame({"doc_id": _node_ids(df["image_id"])}),
        batch_format="pandas",
    )
    labels = connected_components_ds(nodes, edges)
    # node id -> image id is pure arithmetic (no join needed: the scheme
    # is invertible); keeps the result one narrow map away from the labels
    return labels.map_batches(
        lambda df: pd.DataFrame(
            {"image_id": _image_id_of_node(df["doc_id"].to_numpy(np.int64)),
             "cluster_id": df["cluster_id"].to_numpy(np.int64)}),
        batch_format="pandas",
    )


def image_phash_clusters(sf_dir: str, max_hamming: int = 3,
                         n_base: int = 1000) -> pd.DataFrame:
    """Query shim: sorted pandas view of :func:`image_phash_clusters_ds`."""
    return _pairs_to_pandas(
        image_phash_clusters_ds(sf_dir, max_hamming, n_base),
        ["image_id"], {"image_id": object, "cluster_id": np.int64})


# ------------------------------------------------------------------ phash top-k

def image_phash_topk(sf_dir: str, k: int = 5, n_queries: int = 20,
                     n_base: int = 1000) -> pd.DataFrame:
    """Similarity search on the image axis: exact top-k nearest images by
    phash hamming for a deterministic query subset (every
    ``n_base // n_queries``-th base image), over base ∪ variants.

    Same shape as similarity.ann_bruteforce_topk: the tiny query phash
    vector is broadcast once with ``ray.put``, each Arrow batch does one
    vectorized XOR+popcount against it plus a local top-k, and a
    query_id-keyed exchange folds the per-block candidates so only the
    k*n_queries result rows reach the driver (r4 verdict: the old
    driver merge held k*n_queries*n_blocks candidate rows).  Ties
    resolved (hamming asc, image_id asc) so ranks are deterministic and
    SQL-reproducible."""
    import pyarrow.dataset as pads

    step = max(1, n_base // n_queries)
    qids = [image_id_of(i) for i in range(0, n_base, step)]
    # prune at the read: only the query rows leave storage
    base_files = sorted(
        str(p) for p in Path(generate_corpus(n_base)).glob("part-*.parquet"))
    qt = pq.read_table(base_files, columns=["image_id", "phash"],
                       filters=pads.field("image_id").isin(qids))
    qmap = dict(zip(qt.column("image_id").to_pylist(),
                    qt.column("phash").to_pylist()))
    qph = np.array([qmap[q] for q in qids], np.int64).astype(np.uint64)
    ref = ray.put((np.array(qids, dtype=object), qph))

    def local_topk(df: pd.DataFrame) -> pd.DataFrame:
        from .common import _cached_get

        qids, qph = _cached_get(ref)
        ids = df["image_id"].to_numpy()
        ham = hamming64(df["phash"].to_numpy()[:, None], qph[None, :])
        out_q, out_i, out_h = [], [], []
        for qi, qid in enumerate(qids):
            idx = np.flatnonzero(ids != qid)  # exclude self
            order = idx[np.lexsort((ids[idx], ham[idx, qi]))][:k]
            out_q.extend([qid] * len(order))
            out_i.extend(ids[order])
            out_h.extend(ham[order, qi])
        return pd.DataFrame({"query_id": np.asarray(out_q, object),
                             "image_id": np.asarray(out_i, object),
                             "hamming": np.asarray(out_h, np.int64)})

    cand = (_phash_universe(n_base)
            .map_batches(local_topk, batch_format="pandas"))

    def topk_bucket(g: pd.DataFrame) -> pd.DataFrame:
        # complete query groups per bucket -> per-bucket head(k) IS the
        # global top-k for those queries
        g = g.reindex(columns=["query_id", "image_id", "hamming"])
        g = g.sort_values(["query_id", "hamming", "image_id"])
        return g.groupby("query_id", sort=False).head(k)

    from .common import keyed_map_groups

    out = (keyed_map_groups(cand, "query_id", topk_bucket)
           .to_pandas()
           .sort_values(["query_id", "hamming", "image_id"])
           .reset_index(drop=True))
    out["rank"] = out.groupby("query_id").cumcount().to_numpy(np.int64) + 1
    return out


# ------------------------------------------------------------------ corpus stats

def corpus_format_stats(sf_dir: str, n_base: int = 1000) -> pd.DataFrame:
    """Per-format stats over the image table (count / pixels / stored
    bytes / max dims) — partial aggregation; the shuffle moves one row per
    (fmt, batch).  byte sizes come from the binary column itself, so the
    scan must carry ``bytes`` (inherent to the metric, not a missing
    prune)."""
    ds = read_corpus(generate_corpus(n_base), ["fmt", "w", "h", "bytes"])

    def prep(df: pd.DataFrame) -> pd.DataFrame:
        return df.assign(n_pixels=(df["w"].astype(np.int64)
                                   * df["h"].astype(np.int64)),
                         n_bytes=df["bytes"].map(len).astype(np.int64))

    out = partial_groupby(
        ds, ["fmt"],
        {
            "n_images": ("fmt", "count"),
            "sum_pixels": ("n_pixels", "sum"),
            "sum_bytes": ("n_bytes", "sum"),
            "max_w": ("w", "max"),
            "max_h": ("h", "max"),
        },
        prep=prep,
    ).to_pandas()  # two groups: finish driver-side
    for c in ("n_images", "sum_pixels", "sum_bytes"):
        out[c] = out[c].astype(np.int64)
    out["max_w"] = out["max_w"].astype(np.int32)
    out["max_h"] = out["max_h"].astype(np.int32)
    out["avg_bytes"] = sql_round(out["sum_bytes"] / out["n_images"], 4)
    return out.sort_values("fmt").reset_index(drop=True)


def image_byte_entropy(sf_dir: str, n_base: int = 1000) -> rd.Dataset:
    """Per-image Shannon entropy (bits/byte) of the STORED byte
    distribution — the standard low-information / corrupt-payload triage
    gate for binary columns: a well-compressed payload sits near 8
    bits/byte while flat, truncated or zero-padded blobs score far
    lower, so thresholding this column is the cheap first filter before
    any decode.  Zero shuffles — one map_batches pass, per-image
    ``np.bincount`` over the raw buffer; H = log2(n) - sum(c*log2 c)/n
    so only integer byte counts enter the transcendental path (the
    doc_token_entropy precedent), rounded 4 dp half-away on both
    engines so FP summation order can't flip the value hash.  The SQL
    oracle pays a full hex-pair explode of every blob that the engine's
    bincount never materializes.  Empty blobs are excluded on both
    engines (entropy undefined)."""
    ds = read_corpus(generate_corpus(n_base), ["image_id", "fmt", "bytes"])

    def entropy(df: pd.DataFrame) -> pd.DataFrame:
        ids, fmts, ns, hs = [], [], [], []
        for iid, fmt, blob in zip(df["image_id"], df["fmt"], df["bytes"]):
            b = np.frombuffer(blob, dtype=np.uint8)
            if not len(b):
                continue
            c = np.bincount(b, minlength=256).astype(np.float64)
            c = c[c > 0.0]
            n = float(len(b))
            h = np.log2(n) - float((c * np.log2(c)).sum()) / n
            ids.append(iid)
            fmts.append(fmt)
            ns.append(len(b))
            hs.append(h)
        return pd.DataFrame({
            "image_id": pd.Series(ids, dtype="string"),
            "fmt": pd.Series(fmts, dtype="string"),
            "n_bytes": np.asarray(ns, np.int64),
            "byte_entropy": sql_round(np.asarray(hs, np.float64), 4)})

    return ds.map_batches(entropy, batch_format="pandas")


def caption_stats_by_fmt(sf_dir: str, n_base: int = 1000) -> pd.DataFrame:
    """Cross-modal stats: caption token/char counts grouped by image
    format (the image+caption table is multimodal by construction —
    this is the text-side profile of the image corpus).  Token counting
    mirrors textops (``str.count(r"\\w+")`` == DuckDB
    ``len(regexp_extract_all(...))``); partial aggregation, the shuffle
    moves one row per (fmt, batch)."""
    ds = read_corpus(generate_corpus(n_base), ["fmt", "caption"])

    def prep(df: pd.DataFrame) -> pd.DataFrame:
        return df.assign(
            n_tokens=df["caption"].str.count(r"\w+").astype(np.int64),
            n_chars=df["caption"].str.len().astype(np.int64))

    out = partial_groupby(
        ds, ["fmt"],
        {
            "n_images": ("fmt", "count"),
            "sum_tokens": ("n_tokens", "sum"),
            "sum_chars": ("n_chars", "sum"),
            "max_tokens": ("n_tokens", "max"),
        },
        prep=prep,
    ).to_pandas()  # two groups: finish driver-side
    for c in ("n_images", "sum_tokens", "sum_chars", "max_tokens"):
        out[c] = out[c].astype(np.int64)
    # UNrounded: sum/count of the same ints is the same IEEE double in any
    # engine, while round(x, 4) differs on half-way cases (banker's vs
    # half-away — 10.05625 rounds to .0562 in numpy, .0563 in DuckDB)
    out["avg_tokens"] = out["sum_tokens"] / out["n_images"]
    return out.sort_values("fmt").reset_index(drop=True)


def caption_pixels_corr(sf_dir: str, n_base: int = 1000) -> pd.DataFrame:
    """CROSS-MODAL correlation certificate: per-format Pearson r between
    caption token count and pixel area (w*h) — the cheap "does text
    length track image size?" diagnostic a multimodal curation pipeline
    uses to spot caption/image mismatch in a source.

    Integer-moment parity: ONE partial pass emits the six moments
    (n, sx, sy, sxx, syy, sxy) as exact int64 sums per (fmt, batch)
    (caption tokens ~1e1, area <= 1e6 — int64 holds the fixture sums
    with 5+ orders of headroom; a 10^10-row run promotes the DRIVER
    fold to Python bigints, the kmeans_label_ari precedent); r is the
    closed form (n*sxy - sx*sy) / sqrt((n*sxx - sx^2) * (n*syy - sy^2))
    with the two variance factors cast to float64 BEFORE their product
    (their int product can exceed int64), evaluated identically on both
    engines, rounded 6 dp.  Constant-column groups (zero variance) are
    excluded on both engines — r undefined."""
    ds = read_corpus(generate_corpus(n_base), ["fmt", "w", "h", "caption"])

    def prep(df: pd.DataFrame) -> pd.DataFrame:
        x = df["caption"].str.count(r"\w+").astype(np.int64)
        y = df["w"].astype(np.int64) * df["h"].astype(np.int64)
        return pd.DataFrame({"fmt": df["fmt"], "x": x, "y": y,
                             "xx": x * x, "yy": y * y, "xy": x * y})

    g = partial_groupby(
        ds, ["fmt"],
        {
            "n": ("x", "count"),
            "sx": ("x", "sum"),
            "sy": ("y", "sum"),
            "sxx": ("xx", "sum"),
            "syy": ("yy", "sum"),
            "sxy": ("xy", "sum"),
        },
        prep=prep,
    ).to_pandas()  # few groups (formats): finish driver-side
    for c in ("n", "sx", "sy", "sxx", "syy", "sxy"):
        g[c] = g[c].astype(np.int64)
    vx = g["n"] * g["sxx"] - g["sx"] * g["sx"]
    vy = g["n"] * g["syy"] - g["sy"] * g["sy"]
    keep = (vx > 0) & (vy > 0)
    g = g[keep].copy()
    num = (g["n"] * g["sxy"] - g["sx"] * g["sy"]).astype(np.float64)
    den = np.sqrt(vx[keep].astype(np.float64) * vy[keep].astype(np.float64))
    from .common import sql_round

    return pd.DataFrame({
        "fmt": g["fmt"].to_numpy(),
        "n_images": g["n"].to_numpy(np.int64),
        "corr_tokens_pixels": sql_round(num.to_numpy() / den.to_numpy(), 6),
    }).sort_values("fmt").reset_index(drop=True)


# SDXL/NovelAI-style aspect-ratio buckets (w_ratio, h_ratio) — training
# batches must share a shape, so every image is assigned to the nearest
# aspect bucket.  _AB_LCM = lcm of the bucket heights: comparing
# |w/h - wb/hb| across buckets multiplies each |w*hb - h*wb| / (h*hb) by
# the common positive factor h*_AB_LCM, giving PURE-INTEGER scores with
# the exact same argmin — no floats, so engine and oracle agree
# bit-for-bit (ties break to the smallest bucket index).
ASPECT_BUCKETS = ((1, 1), (4, 3), (3, 4), (16, 9), (9, 16), (3, 2), (2, 3))
_AB_LCM = int(np.lcm.reduce([h for _, h in ASPECT_BUCKETS]))


def aspect_bucket_assign(sf_dir: str, n_base: int = 1000) -> pd.DataFrame:
    """ASPECT-RATIO BUCKETING (the SDXL / NovelAI training-data layout
    step): assign every image to the fixed aspect bucket minimizing
    |w/h - wb/hb|, so a multimodal training loader can batch same-shape
    resizes.  One shuffle-free map_batches over (image_id, w, h) only
    (bytes never read — column pruning at the parquet scan); the n×B
    integer score matrix argmins vectorized per batch.  Exact-integer
    scoring (see ASPECT_BUCKETS) makes the assignment bit-reproducible
    and fully SQL-checkable."""
    ds = read_corpus(generate_corpus(n_base), ["image_id", "w", "h"])
    out = ds.map_batches(_aspect_assign, batch_format="pandas").to_pandas()
    return out.sort_values("image_id").reset_index(drop=True)


def _aspect_assign(df: pd.DataFrame) -> pd.DataFrame:
    """Vectorized exact-integer aspect-bucket argmin (one batch)."""
    wb = np.asarray([b[0] for b in ASPECT_BUCKETS], dtype=np.int64)
    hb = np.asarray([b[1] for b in ASPECT_BUCKETS], dtype=np.int64)
    mult = _AB_LCM // hb  # per-bucket integer scale factor
    w = df["w"].to_numpy(np.int64)[:, None]
    h = df["h"].to_numpy(np.int64)[:, None]
    score = np.abs(w * hb[None, :] - h * wb[None, :]) * mult[None, :]
    k = np.argmin(score, axis=1)  # first minimum = smallest index tie
    return pd.DataFrame({
        "image_id": df["image_id"].to_numpy(object),
        "bucket_idx": k.astype(np.int64),
        "bucket_w": wb[k],
        "bucket_h": hb[k]})


def _decode_dims_batch(batch: pa.Table) -> pa.Table:
    """bytes -> DECODED pixel dimensions only (no features) — the minimal
    per-row certificate that the real codecs (pure-Python PNG + pure-numpy
    baseline JPEG) recover each stored image's geometry.  STATELESS, so a
    plain task function (the codecs are module-level — amortized per
    worker process; an actor pool's spin-up would buy nothing here, the
    _token_features rationale)."""
    fmts = batch.column("fmt").to_pylist()
    blobs = batch.column("bytes").to_pylist()  # one to_pylist per batch
    w = np.zeros(batch.num_rows, dtype=np.int64)
    h = np.zeros(batch.num_rows, dtype=np.int64)
    for i, blob in enumerate(blobs):
        if blob is None or fmts[i] not in ("png", "jpeg"):
            w[i] = h[i] = -1
            continue
        px = decode_image(blob, fmts[i])
        h[i], w[i] = px.shape[0], px.shape[1]
    return pa.table({
        "image_id": batch.column("image_id"),
        "fmt": batch.column("fmt"),
        "dec_w": pa.array(w),
        "dec_h": pa.array(h),
    })


# ------------------------------------------------------------------ exact dedup + curation

def _content_hash(blobs: list) -> list[str]:
    """md5 over the UPPERCASE hex of the stored bytes — hex because
    DuckDB's md5() is VARCHAR-only (hex(BLOB) is its canonical
    SQL-reproducible byte spelling), so the oracle can recompute the
    exact same group key."""
    import hashlib

    return [hashlib.md5(b.hex().upper().encode()).hexdigest() for b in blobs]


def image_exact_dedup_ds(sf_dir: str, n_base: int = 1000,
                         num_buckets: int = 16) -> rd.Dataset:
    """EXACT image dedup over base ∪ variants ∪ planted byte-identical
    copies: content-hash each blob per batch (the bytes never shuffle —
    only 32-char hashes move), hash-partition by content hash, keeper =
    min image_id per group (first-wins, the reference's D2 rule on the
    image axis).  Output: (image_id, keeper_image_id), one row per image;
    planted copies resolve to their base row, noisy variants are
    singletons (near-dup's job, not exact dedup's)."""
    from .common import keyed_map_groups

    ds = _full_universe(n_base, ["image_id", "bytes"])

    def hash_batch(batch: pa.Table) -> pa.Table:
        return pa.table({
            "image_id": batch.column("image_id"),
            "content_hash": pa.array(
                _content_hash(batch.column("bytes").to_pylist()), pa.string()),
        })

    hashed = ds.map_batches(hash_batch, batch_format="pyarrow", batch_size=256)

    def keeper(bucket: pd.DataFrame) -> pd.DataFrame:
        if not len(bucket):
            return pd.DataFrame({
                "image_id": pd.Series([], dtype=object),
                "keeper_image_id": pd.Series([], dtype=object)})
        k = bucket.groupby("content_hash")["image_id"].transform("min")
        return pd.DataFrame({"image_id": bucket["image_id"].to_numpy(),
                             "keeper_image_id": k.to_numpy()})

    return keyed_map_groups(hashed, "content_hash", keeper, num_buckets)


def image_exact_dedup(sf_dir: str, n_base: int = 1000) -> pd.DataFrame:
    """Query shim: sorted pandas view of :func:`image_exact_dedup_ds`."""
    return _pairs_to_pandas(
        image_exact_dedup_ds(sf_dir, n_base), ["image_id"],
        {"image_id": object, "keeper_image_id": object})


def curated_image_pairs_ds(sf_dir: str, n_base: int = 1000,
                           min_dim: int = 48, min_cap_tokens: int = 6,
                           max_hamming: int = 3,
                           num_buckets: int = 16) -> rd.Dataset:
    """END-TO-END image+caption CURATION — the composed flagship of the
    image axis (the LAION/CLIP-style pair-filtering chain): an image
    survives iff it

    1. passes the SIZE gate: ``min(w, h) >= min_dim`` and aspect ratio
       ``max(w, h) <= 2 * min(w, h)`` (integer arithmetic — exactly
       SQL-reproducible, no float aspect),
    2. passes the CAPTION gate: ``>= min_cap_tokens`` word tokens,
    3. is its exact-duplicate group's KEEPER (byte-identical re-crawls
       collapse to one row — :func:`image_exact_dedup_ds`), and
    4. is its phash near-dup CLUSTER's canonical representative (smallest
       node id in its connected component — the noisy re-encodes collapse
       too).

    Composition shape = curated_docs on the image axis: each leg emits
    tiny (image_id, stage) flag rows, one hash shuffle keeps ids carrying
    all three flags (gates fuse into one scan stage).  The near-dup leg
    runs over the SAME extended universe (base ∪ variants ∪ exact copies)
    so byte-identical copies also collapse at hamming 0.  No leg
    materializes blobs on the driver; at 100 TB each leg is the
    already-scale-audited operator."""
    from .common import keyed_map_groups
    from .dedup import connected_components_ds

    # leg 1+2 (fused single scan): size + caption gates
    gated = _full_universe(n_base, ["image_id", "w", "h", "caption"])

    def gates(df: pd.DataFrame) -> pd.DataFrame:
        w = df["w"].to_numpy(np.int64)
        h = df["h"].to_numpy(np.int64)
        lo, hi = np.minimum(w, h), np.maximum(w, h)
        n_tok = df["caption"].str.count(r"[A-Za-z0-9_]+").to_numpy(np.int64)
        keep = (lo >= min_dim) & (hi <= 2 * lo) & (n_tok >= min_cap_tokens)
        return pd.DataFrame({"image_id": df["image_id"].to_numpy()[keep]})

    gate_ids = gated.map_batches(gates, batch_format="pandas")

    # leg 3: exact keeper
    exact = image_exact_dedup_ds(sf_dir, n_base, num_buckets)
    exact_ids = exact.map_batches(
        lambda df: pd.DataFrame(
            {"image_id": df["image_id"].to_numpy()[
                (df["image_id"] == df["keeper_image_id"]).to_numpy()]}),
        batch_format="pandas")

    # leg 4: phash-cluster canonical over the extended universe
    uni = _full_universe(n_base, ["image_id", "phash"])
    pairs = _phash_band_pairs(uni, max_hamming)
    edges = pairs.map_batches(
        lambda df: pd.DataFrame({"src": _node_ids(df["image_a"]),
                                 "dst": _node_ids(df["image_b"])}),
        batch_format="pandas")
    nodes = uni.map_batches(
        lambda df: pd.DataFrame({"doc_id": _node_ids(df["image_id"])}),
        batch_format="pandas")
    labels = connected_components_ds(nodes, edges)
    canon_ids = labels.map_batches(
        lambda df: pd.DataFrame({"image_id": _image_id_of_node(
            df["doc_id"].to_numpy(np.int64)[
                (df["doc_id"] == df["cluster_id"]).to_numpy()])}),
        batch_format="pandas")

    def flag(ds: rd.Dataset, tag: int) -> rd.Dataset:
        return ds.map_batches(
            lambda df, t=tag: pd.DataFrame(
                {"image_id": df["image_id"].to_numpy(),
                 "stage": np.full(len(df), t, np.int8)}),
            batch_format="pandas")

    flags = flag(gate_ids, 0).union(flag(exact_ids, 1)).union(flag(canon_ids, 2))

    def keep_all(bucket: pd.DataFrame) -> pd.DataFrame:
        if not len(bucket):
            return pd.DataFrame({"image_id": pd.Series([], dtype=object)})
        n = bucket.groupby("image_id", sort=False)["stage"].nunique()
        return pd.DataFrame({"image_id": n[n == 3].index.to_numpy()})

    return keyed_map_groups(flags, "image_id", keep_all, num_buckets)


def curated_image_pairs(sf_dir: str, n_base: int = 1000) -> pd.DataFrame:
    """Query shim: sorted pandas view of :func:`curated_image_pairs_ds`."""
    return _pairs_to_pandas(curated_image_pairs_ds(sf_dir, n_base),
                            ["image_id"], {"image_id": object})


def image_decoded_dims(sf_dir: str, n_base: int = 1000) -> rd.Dataset:
    """Per-image DECODED dimensions via the real codecs — the oracle reads
    the table's DECLARED (w, h) columns, so the value-hash equality
    certifies every single decode's geometry through SQL (the
    video_avi_stats pattern applied to the image axis: engine parses the
    binary payload, oracle trusts the metadata, agreement proves the
    payload encodes the declaration).  Task-pool stage, small batches
    (binary rows are wide); per-image codec work is inherent."""
    ds = read_corpus(generate_corpus(n_base), ["image_id", "bytes", "fmt"])
    return ds.map_batches(_decode_dims_batch, batch_format="pyarrow",
                          batch_size=64)


NEG_SHIFT = 7919  # fixed prime stride for derangement-style negatives


def contrastive_negative_pairs(sf_dir: str, n_base: int = 1000,
                               k: int = 2,
                               num_buckets: int = 16) -> rd.Dataset:
    """Deterministic CONTRASTIVE NEGATIVE sampling over the image+caption
    table — the training-pair construction step of a CLIP-style run:
    each image keeps its positive caption implicitly and gains ``k``
    negative captions drawn by a fixed modular stride over the
    md5(image_id)-ordered corpus (negative j of rank r = caption at rank
    (r + j*7919) mod n).  Hash-rank ordering decorrelates neighbors from
    crawl/id locality; the fixed stride makes the pairing reproducible
    under ANY partitioning or retry — no RNG state, the
    deterministic_shuffle/weighted_mix idiom applied to pair generation.

    Scale shape: one :func:`common.global_row_number` scan (metadata-only
    exchange) to rank the corpus, one bucketed hash join from each row's
    k target ranks back to the ranked rows — both sides distributed, no
    broadcast of the caption column.  The stride must be coprime-ish
    with n: any j*stride ≡ 0 (mod n) would pair an image with its own
    caption, so those j shift by one extra (documented, mirrored in the
    oracle)."""
    from .common import global_row_number, hash_join, md5_hex

    ds = read_corpus(generate_corpus(n_base), ["image_id", "caption"])

    def add_key(df: pd.DataFrame) -> pd.DataFrame:
        return df.assign(rk=pd.Series(md5_hex(df["image_id"]),
                                      dtype="string", index=df.index))

    ranked, n = global_row_number(ds.map_batches(add_key,
                                                 batch_format="pandas"),
                                  ["rk"], rank_col="rank")

    def targets(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            return pd.DataFrame({
                "image_id": pd.Series([], dtype="string"),
                "neg_rank": pd.Series([], dtype=np.int64),
                "tgt": pd.Series([], dtype=np.int64)})
        r = df["rank"].to_numpy(np.int64)
        outs = []
        for j in range(1, k + 1):
            shift = (j * NEG_SHIFT) % n
            if shift == 0:  # degenerate stride: never pair a row with itself
                shift = 1
            outs.append(pd.DataFrame({
                "image_id": df["image_id"].astype("string"),
                "neg_rank": np.full(len(df), j, dtype=np.int64),
                "tgt": (r + shift) % n}))
        return pd.concat(outs, ignore_index=True)

    left = ranked.map_batches(targets, batch_format="pandas")
    right = ranked.map_batches(
        lambda df: pd.DataFrame({
            "tgt": df["rank"].to_numpy(np.int64),
            "neg_image_id": df["image_id"].astype("string"),
            "neg_caption": df["caption"].astype("string")}),
        batch_format="pandas")

    def clean(j: pd.DataFrame) -> pd.DataFrame:
        return j[["image_id", "neg_rank", "neg_image_id", "neg_caption"]]

    return hash_join(left, right, on="tgt",
                     lcols=["tgt", "image_id", "neg_rank"],
                     rcols=["tgt", "neg_image_id", "neg_caption"],
                     num_buckets=num_buckets, post=clean)


def contrastive_negative_pairs_sql(n_base: int = 1000, k: int = 2) -> str:
    """Oracle: the identical md5-rank + modular-stride pairing as one
    window + self-join over the same corpus parquet."""
    from ..sources.corpus import generate_corpus as _gen

    glob = _gen(n_base) + "/part-*.parquet"
    return f"""
        WITH r AS (
            SELECT image_id, caption,
                   row_number() OVER (ORDER BY md5(image_id)) - 1 AS rank
            FROM read_parquet('{glob}')
        ),
        n AS (SELECT count(*)::BIGINT AS n FROM r),
        t AS (
            SELECT r.image_id, j.j AS neg_rank,
                   (r.rank + CASE WHEN (j.j * {NEG_SHIFT})
                                       % (SELECT n FROM n) = 0
                                  THEN 1
                                  ELSE (j.j * {NEG_SHIFT})
                                       % (SELECT n FROM n) END)
                       % (SELECT n FROM n) AS tgt
            FROM r CROSS JOIN (SELECT unnest(range(1, {k + 1})) AS j) j
        )
        SELECT t.image_id, t.neg_rank,
               r2.image_id AS neg_image_id, r2.caption AS neg_caption
        FROM t JOIN r r2 ON r2.rank = t.tgt
    """


# chunk-dedup contract shared by the engine and the SQL oracle: fixed
# chunk size in bytes (128 hex chars oracle-side)
CHUNK_BYTES = 64


def image_chunk_dedup(sf_dir: str, n_base: int = 1000,
                      num_buckets: int = 16) -> rd.Dataset:
    """CONTENT-STORE CHUNK DEDUP statistics over the stored blobs — the
    backup/blob-store dedup shape (fixed-size chunking, the CDC
    baseline) applied to the image column: every blob splits into
    ``CHUNK_BYTES`` chunks; per image, the count of DISTINCT chunks and
    how many of them appear in ANY other image, plus the dup fraction —
    :func:`textops.duplicated_span_docs`'s exact-substring signal on the
    binary axis.  Planted byte-identical copies score 1.0; unrelated
    images share only constant format headers (the realistic dedup
    floor a chunk store exploits).

    Input: base corpus ∪ planted byte-identical copies (noisy variants
    are the NEAR-dup family's input, not a chunk store's).  Scale
    shape: blobs chunk per batch — only 32-char chunk hashes ever
    shuffle (ONE chunk-keyed exchange where a chunk's image list is
    complete per bucket, so the shared flag is global), then one tiny
    image-keyed reduce.  The chunk hash is md5 of the HEX spelling so
    DuckDB's VARCHAR-only md5 reconstructs it verbatim; the oracle pays
    the 128-char substr explode the engine never materializes."""
    import hashlib

    from .common import keyed_map_groups, partial_groupby

    cols = ["image_id", "bytes"]
    ds = (read_corpus(generate_corpus(n_base), cols)
          .union(read_dups(generate_dups(n_base), cols)))

    hx_per_chunk = 2 * CHUNK_BYTES

    def chunk_rows(df: pd.DataFrame) -> pd.DataFrame:
        ids, chs = [], []
        for iid, blob in zip(df["image_id"], df["bytes"]):
            hx = bytes(blob).hex().upper()  # DuckDB hex() is uppercase
            if not hx:
                continue
            seen = {hashlib.md5(
                hx[p:p + hx_per_chunk].encode()).hexdigest()
                for p in range(0, len(hx), hx_per_chunk)}
            ids.extend([iid] * len(seen))
            chs.extend(sorted(seen))
        return pd.DataFrame({"image_id": pd.Series(ids, dtype="string"),
                             "ch": pd.Series(chs, dtype="string")})

    pairs = ds.map_batches(chunk_rows, batch_format="pandas",
                           batch_size=64)

    def flag_shared(bucket: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({"image_id": pd.Series([], dtype="string"),
                              "one": pd.Series([], dtype=np.int64),
                              "shared": pd.Series([], dtype=np.int64)})
        if not len(bucket):
            return empty
        nimg = bucket.groupby("ch", sort=False)["image_id"].transform("size")
        return pd.DataFrame({
            "image_id": bucket["image_id"].to_numpy(),
            "one": np.ones(len(bucket), np.int64),
            "shared": (nimg.to_numpy(np.int64) > 1).astype(np.int64)})

    flags = keyed_map_groups(pairs, "ch", flag_shared, num_buckets)
    per = partial_groupby(flags, ["image_id"],
                          {"n_chunks": ("one", "sum"),
                           "n_shared": ("shared", "sum")}, many_groups=True)

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        for c in ("n_chunks", "n_shared"):
            df[c] = df[c].astype(np.int64)
        df["dup_fraction"] = sql_round(
            df["n_shared"].to_numpy(np.float64)
            / df["n_chunks"].to_numpy(np.float64), 4)
        return df

    return per.map_batches(finish, batch_format="pandas")


def image_chunk_dedup_sql(base_glob: str, dup_glob: str) -> str:
    """The DuckDB oracle: hex substr explode into 128-char chunks, the
    identical md5-of-hex chunk ids, global image counts per chunk."""
    return f"""
        WITH u AS (
            SELECT image_id, bytes FROM read_parquet('{base_glob}')
            UNION ALL
            SELECT image_id, bytes FROM read_parquet('{dup_glob}')
        ),
        b AS (
            SELECT image_id, hex(bytes) AS hx, octet_length(bytes) AS n
            FROM u WHERE octet_length(bytes) > 0
        ),
        ch AS (
            SELECT DISTINCT image_id,
                   md5(substr(hx, {2 * CHUNK_BYTES} * (i - 1) + 1,
                              {2 * CHUNK_BYTES})) AS ch
            FROM b, UNNEST(range(1, (n + {CHUNK_BYTES - 1})
                                    // {CHUNK_BYTES} + 1)) r(i)
        ),
        gc AS (SELECT ch, count(*)::BIGINT AS nimg FROM ch GROUP BY ch)
        SELECT c.image_id, count(*)::BIGINT AS n_chunks,
               sum(CASE WHEN gc.nimg > 1 THEN 1 ELSE 0 END)::BIGINT
                   AS n_shared,
               round(sum(CASE WHEN gc.nimg > 1 THEN 1 ELSE 0 END)::DOUBLE
                     / count(*), 4) AS dup_fraction
        FROM ch c JOIN gc USING (ch)
        GROUP BY c.image_id
    """


# declared-format magic prefixes (the container signatures a validator
# checks before trusting a binary column's fmt metadata)
FMT_MAGICS = {"png": b"\x89PNG", "jpeg": b"\xff\xd8"}


def image_magic_check(sf_dir: str, n_base: int = 1000) -> pd.DataFrame:
    """SCHEMA-VS-PAYLOAD validation of the binary column: group images by
    (declared fmt, actual 4-byte magic prefix) and count how many blobs'
    leading bytes agree with their declared container format — the
    cheapest corruption / mislabeled-format triage a multimodal table
    gets, run BEFORE any decode is attempted (a mislabeled blob fails a
    decoder slowly; a magic check fails it in one memcmp).

    Engine shape: one map_batches pass slicing 4 bytes per blob (the rest
    of the payload is never touched), per-batch count partials, a
    handful-of-groups reduce."""
    ds = read_corpus(generate_corpus(n_base), ["fmt", "bytes"])

    def prep(df: pd.DataFrame) -> pd.DataFrame:
        magic = [bytes(b[:4]).hex().upper() for b in df["bytes"]]
        ok = [int(bytes(b[: len(FMT_MAGICS.get(f, b"\xff" * 5))])
                  == FMT_MAGICS.get(f, b"\xff" * 5))
              for f, b in zip(df["fmt"], df["bytes"])]
        return df.assign(magic_hex=pd.Series(magic, dtype=object,
                                             index=df.index),
                         ok=pd.Series(ok, dtype=np.int64, index=df.index))

    out = partial_groupby(
        ds, ["fmt", "magic_hex"],
        {"n_images": ("ok", "count"), "n_magic_ok": ("ok", "sum")},
        prep=prep).to_pandas()
    return (out.astype({"n_images": np.int64, "n_magic_ok": np.int64})
            .sort_values(["fmt", "magic_hex"]).reset_index(drop=True))


def phash_bit_balance(sf_dir: str, n_base: int = 1000) -> pd.DataFrame:
    """PER-BIT BALANCE AUDIT of the phash column: a usable perceptual
    hash has every bit near 50/50 across the corpus (a stuck bit wastes
    a 64th of the hamming signal and silently narrows every banding
    scheme built on it — the near-dup families here band on these
    bits).  One row per bit with the ones-count, fraction and a
    balance_ok flag (frac in [0.2, 0.8]); the chi-square distance to
    fair coins rides along.  All counts integer (bit shifts both
    engines).

    Scale shape: per-batch bit-count partials (64 ints per batch via
    one vectorized shift table), one 64-row reduce."""
    from .common import partial_groupby, sql_round

    ds = read_corpus(generate_corpus(n_base), ["phash"])

    def bits(df: pd.DataFrame) -> pd.DataFrame:
        h = df["phash"].to_numpy(np.int64)
        ones = [( (h >> b) & 1 ).sum() for b in range(64)]
        return pd.DataFrame({"bit": np.arange(64, dtype=np.int64),
                             "n_ones": np.asarray(ones, np.int64),
                             "n": np.int64(len(h))})

    g = partial_groupby(ds.map_batches(bits, batch_format="pandas"),
                        ["bit"], {"n_ones": ("n_ones", "sum"),
                                  "n": ("n", "sum")},
                        many_groups=True, num_buckets=4).to_pandas()
    g = g.sort_values("bit").reset_index(drop=True)
    n = g["n"].to_numpy(np.int64)
    ones = g["n_ones"].to_numpy(np.int64)
    frac = ones / n.astype(np.float64)
    # chi2 vs fair coin per bit summed: sum (ones - n/2)^2 / (n/4)
    chi2 = float(sql_round(
        (((ones - n / 2.0) ** 2) / (n / 4.0)).sum(), 4))
    return pd.DataFrame({
        "bit": g["bit"].to_numpy(np.int64),
        "n_ones": ones,
        "frac": sql_round(frac, 6),
        "balance_ok": ((frac >= 0.2) & (frac <= 0.8)),
        "chi2": np.full(64, chi2)})


def phash_bit_balance_sql(base_glob: str) -> str:
    return f"""
        WITH b AS (SELECT range AS bit FROM range(0, 64)),
        c AS (
            SELECT b.bit,
                   sum((phash >> b.bit) & 1)::BIGINT AS n_ones,
                   count(*)::BIGINT AS n
            FROM read_parquet('{base_glob}'), b
            GROUP BY b.bit
        ),
        x AS (
            SELECT round(sum((n_ones - n / 2.0) * (n_ones - n / 2.0)
                             / (n / 4.0)), 4) AS chi2
            FROM c
        )
        SELECT bit::BIGINT AS bit, n_ones,
               round(n_ones / n::DOUBLE, 6) AS frac,
               n_ones / n::DOUBLE >= 0.2
                   AND n_ones / n::DOUBLE <= 0.8 AS balance_ok,
               (SELECT chi2 FROM x) AS chi2
        FROM c
    """
