"""Near-duplicate detection: MinHash+LSH, SimHash, n-gram Jaccard,
embedding-cosine — the dedup family a large-scale training-data pipeline
needs (task brief; the reference only ever does exact first-wins dedup, D2).

Pipeline shapes (ray_guide 'Aggregation at scale'):
- MinHash-LSH: shingle -> 64 minhashes per doc (vectorized) -> explode to
  (band_id, band_hash, doc_id) rows -> groupby band bucket -> candidate
  pairs -> exact-Jaccard verify.
- SimHash: 64-bit signature -> 4x16-bit band blocking -> hamming verify.
- Embedding near-dup: banded self-join on vec_id windows (a range join —
  Ray Data lacks one; built from bucketing + ghost-row replication +
  per-bucket pairwise kernel; partitioning assumption documented inline).

Shingle/signature computation is per-batch vectorized numpy; candidate
verification broadcasts the (small) signature/shingle map via ray.put —
at 100 TB that broadcast becomes a second bucketed join on doc_id, same
topology, noted per function.
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data as rd

from ..functions.sketches import _splitmix64
from .common import load

_TOKEN_RE = re.compile(r"\w+")


# per-worker-process token-hash memo: corpora repeat tokens heavily, so the
# md5 cost collapses to one digest per DISTINCT token per process
_TOKEN_HASH_CACHE: dict[str, int] = {}
_TOKEN_HASH_CACHE_MAX = 1_000_000


def _stable_token_hashes(tokens: list[str]) -> np.ndarray:
    """Deterministic 64-bit token hashes: first 8 bytes of md5, big-endian —
    Python's builtin hash() is salted per process and would break
    cross-worker signatures.  md5 (not blake2b) so the DuckDB oracle can
    reproduce the hash exactly: ('0x' || substr(md5(tok),1,16))::UBIGINT."""
    from hashlib import md5

    cache = _TOKEN_HASH_CACHE
    out = np.empty(len(tokens), dtype=np.uint64)
    for i, t in enumerate(tokens):
        h = cache.get(t)
        if h is None:
            if len(cache) >= _TOKEN_HASH_CACHE_MAX:
                cache.clear()
            h = int.from_bytes(md5(t.encode()).digest()[:8], "big")
            cache[t] = h
        out[i] = h
    return out

NUM_HASHES = 64
NUM_BANDS = 16
ROWS_PER_BAND = NUM_HASHES // NUM_BANDS


def _shingle_hashes(text: str, n: int = 3) -> np.ndarray:
    """Word n-gram shingles -> uint64 hashes (vectorized mix over token
    hash triples)."""
    toks = _TOKEN_RE.findall(text.lower())
    if len(toks) < n:
        # pad token "~": never produced by \w+ (no collision with a real
        # token) and SQL-safe, so the DuckDB oracle can reproduce the pad
        # (a NUL pad char doesn't round-trip through VARCHAR literals)
        toks = toks + ["~"] * (n - len(toks))
    th = _stable_token_hashes(toks)
    # combine n consecutive token hashes
    acc = th[: len(th) - n + 1].copy()
    for j in range(1, n):
        acc = _splitmix64(acc ^ th[j : len(th) - n + 1 + j])
    return np.unique(acc)


_SEEDS = _splitmix64(np.arange(1, NUM_HASHES + 1, dtype=np.uint64))


def minhash_signature(shingles: np.ndarray) -> np.ndarray:
    """64 minhashes via one vectorized (shingles x seeds) mix."""
    if len(shingles) == 0:
        return np.full(NUM_HASHES, np.iinfo(np.uint64).max, dtype=np.uint64)
    m = _splitmix64(shingles[:, None] ^ _SEEDS[None, :])
    return m.min(axis=0)


def _band_rows(doc_ids: np.ndarray, sigs: np.ndarray) -> pa.Table:
    """Explode signatures to (band_id, band_hash, doc_id)."""
    n = len(doc_ids)
    bands = sigs.reshape(n, NUM_BANDS, ROWS_PER_BAND)
    bh = bands[:, :, 0].copy()
    for j in range(1, ROWS_PER_BAND):
        bh = _splitmix64(bh ^ bands[:, :, j])
    return pa.table(
        {
            "band_id": pa.array(np.repeat(np.arange(NUM_BANDS, dtype=np.int32), n)),
            "band_hash": pa.array(bh.T.reshape(-1).astype(np.int64)),
            "doc_id": pa.array(np.tile(doc_ids, NUM_BANDS)),
        }
    )


def _empty_pairs_ds(schema: dict) -> rd.Dataset:
    return rd.from_pandas(pd.DataFrame(
        {c: pd.Series([], dtype=t) for c, t in schema.items()}))


def _pairs_to_pandas(ds: rd.Dataset, sort_cols: list[str],
                     schema: dict) -> pd.DataFrame:
    """Query shim ONLY: collect a (bounded) pair/label result set to pandas
    for the queries()/oracle contract.  The pipelines themselves return
    Datasets — a 100-TB dedup pass calls ``.write_parquet()`` on the
    ``*_ds`` variant instead of collecting anything.

    ``schema`` (col -> numpy dtype) pins both the all-empty case (Ray's
    to_pandas drops the schema of an all-empty Dataset) and integer dtypes
    that a groupby/shuffle may have widened to object/float."""
    df = ds.to_pandas()
    if df.empty and list(df.columns) != list(schema):  # 0-column empty frame
        df = pd.DataFrame({c: pd.Series([], dtype=t) for c, t in schema.items()})
    for c, t in schema.items():
        df[c] = df[c].astype(t)
    return df[list(schema)].sort_values(sort_cols).reset_index(drop=True)


def minhash_lsh_pairs_ds(sf_dir: str, jaccard_threshold: float = 0.5,
                         broadcast_threshold: int = 100_000) -> rd.Dataset:
    """Candidate pairs from LSH banding, verified with exact shingle-set
    Jaccard — returned as a Dataset (doc_a, doc_b, jaccard); nothing is
    driver-materialized.  Verification broadcasts the shingle map (ray.put)
    while the CORPUS is small (< broadcast_threshold docs — the map's size
    scales with docs, not candidates); larger corpora use the bucketed join
    of pairs against shingles on doc_id."""
    ds = load(sf_dir, "documents", ["doc_id", "text"])

    def sig_batch(df: pd.DataFrame) -> pa.Table:
        ids = df["doc_id"].to_numpy()
        sigs = np.stack([minhash_signature(_shingle_hashes(t)) for t in df["text"]])
        return _band_rows(ids, sigs)

    bands = ds.map_batches(sig_batch, batch_format="pandas")

    def emit_pairs(g: pd.DataFrame) -> pd.DataFrame:
        ids = np.sort(g["doc_id"].to_numpy())
        if len(ids) < 2:
            return pd.DataFrame({"doc_a": pd.Series([], dtype=np.int64),
                                 "doc_b": pd.Series([], dtype=np.int64)})
        a, b = np.triu_indices(len(ids), k=1)
        return pd.DataFrame({"doc_a": ids[a].astype(np.int64), "doc_b": ids[b].astype(np.int64)})

    # candidate pairs stay a Dataset end to end: cross-band dedup is a
    # distributed groupby (one row per (doc_a, doc_b) group), materialized
    # to the OBJECT STORE (narrow int64 pairs), never to the driver
    cand = (
        bands.groupby(["band_id", "band_hash"])
        .map_groups(emit_pairs, batch_format="pandas")
        .groupby(["doc_a", "doc_b"])
        .map_groups(lambda g: g.head(1), batch_format="pandas")
        .materialize()
    )
    n_cand = cand.count()
    if n_cand == 0:
        return _empty_pairs_ds({"doc_a": np.int64, "doc_b": np.int64,
                                "jaccard": np.float64})

    def _jaccard_rows(df: pd.DataFrame) -> pd.DataFrame:
        jac = []
        for sa, sb in zip(df["sh_a"], df["sh_b"]):
            if isinstance(sa, bytes):  # bucketed path ships shingles as bytes
                sa = np.frombuffer(sa, dtype=np.uint64)
                sb = np.frombuffer(sb, dtype=np.uint64)
            inter = len(np.intersect1d(sa, sb, assume_unique=True))
            union = len(sa) + len(sb) - inter
            jac.append(inter / union if union else 0.0)
        out = df[["doc_a", "doc_b"]].astype(np.int64)
        out["jaccard"] = np.round(jac, 6)
        return out[out["jaccard"] >= jaccard_threshold]

    # materialize ONCE: the bucketed path fans this dataset into two join
    # sides — without materialization each side (and the broadcast path)
    # would re-run shingling, the dominant CPU cost, over the whole corpus
    shingles = load(sf_dir, "documents", ["doc_id", "text"]).map_batches(
        lambda df: pd.DataFrame(
            {"doc_id": df["doc_id"].to_numpy(),
             "sh": [_shingle_hashes(t) for t in df["text"]]}
        ),
        batch_format="pandas",
    ).materialize()
    # broadcast-vs-bucketed gate: what gets broadcast is the CORPUS shingle
    # map, so the switch must key on corpus size, not candidate count
    n_docs = shingles.count()
    if n_docs < broadcast_threshold:
        # small candidate set: broadcast the shingle map (zero shuffles)
        sm_parts = shingles.to_pandas()
        ref = ray.put(dict(zip(sm_parts["doc_id"].astype(int), sm_parts["sh"])))

        def verify(df: pd.DataFrame) -> pd.DataFrame:
            from .common import _cached_get

            sm = _cached_get(ref)
            df = df.assign(sh_a=[sm[int(a)] for a in df["doc_a"]],
                           sh_b=[sm[int(b)] for b in df["doc_b"]])
            return _jaccard_rows(df)

        return cand.map_batches(verify, batch_format="pandas")
    else:
        # scale path: two bucketed joins of candidates vs shingles — nothing
        # is driver-materialized except the final verified pairs.  Shingle
        # arrays travel as fixed-dtype bytes (object-ndarray columns don't
        # survive the sort-shuffle's pandas concat).
        from .common import hash_join

        pairs = cand

        def as_bytes(col_id: str, col_sh: str):
            def fn(df: pd.DataFrame) -> pd.DataFrame:
                return pd.DataFrame(
                    {col_id: df["doc_id"].to_numpy(),
                     col_sh: [s.tobytes() for s in df["sh"]]}
                )

            return fn

        sh_a = shingles.map_batches(as_bytes("doc_a", "sh_a"), batch_format="pandas")
        sh_b = shingles.map_batches(as_bytes("doc_b", "sh_b"), batch_format="pandas")
        j1 = hash_join(pairs, sh_a, on="doc_a",
                       lcols=["doc_a", "doc_b"], rcols=["doc_a", "sh_a"])
        j2 = hash_join(j1, sh_b, on="doc_b",
                       lcols=["doc_a", "doc_b", "sh_a"], rcols=["doc_b", "sh_b"],
                       post=_jaccard_rows)
        return j2


def minhash_lsh_pairs(sf_dir: str, jaccard_threshold: float = 0.5,
                      broadcast_threshold: int = 100_000) -> pd.DataFrame:
    """Query shim: sorted pandas view of :func:`minhash_lsh_pairs_ds`."""
    return _pairs_to_pandas(
        minhash_lsh_pairs_ds(sf_dir, jaccard_threshold, broadcast_threshold),
        ["doc_a", "doc_b"],
        {"doc_a": np.int64, "doc_b": np.int64, "jaccard": np.float64})


def ngram_jaccard_pairs_ds(sf_dir: str, band: int = 50, threshold: float = 0.2,
                           bucket: int = 200) -> rd.Dataset:
    """Token-set Jaccard over doc_id-banded candidate pairs (|a-b| <= band):
    the n-gram-Jaccard dedup operator with an exact DuckDB oracle
    (list_intersect over list_distinct(regexp_extract_all)).  Same
    bucket+ghost range-join topology as the embedding variant.  Returns a
    Dataset of (doc_a, doc_b, jaccard); the ghost scheme emits every
    qualifying pair in EXACTLY one bucket (anchor = non-ghost row; the
    partner is either native to the same bucket or ghost-replicated into
    it, never both), so no cross-bucket dedup pass is needed."""
    bucket = max(bucket, band)
    ds = load(sf_dir, "documents", ["doc_id", "text"])

    def tag(df: pd.DataFrame) -> pd.DataFrame:
        did = df["doc_id"].to_numpy()
        toks = [set(_TOKEN_RE.findall(t)) for t in df["text"]]
        main = pd.DataFrame({"doc_id": did, "toks": toks,
                             "bucket": did // bucket, "ghost": False})
        ghost_mask = ((did % bucket) < band) & (did // bucket > 0)
        ghosts = main[ghost_mask].copy()
        ghosts["bucket"] -= 1
        ghosts["ghost"] = True
        return pd.concat([main, ghosts], ignore_index=True)

    tagged = ds.map_batches(tag, batch_format="pandas")

    def pairs(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("doc_id")
        did = g["doc_id"].to_numpy()
        ghost = g["ghost"].to_numpy()
        toks = list(g["toks"])
        out_a, out_b, out_j = [], [], []
        for i in range(len(did)):
            if ghost[i]:
                continue
            for jx in range(i + 1, len(did)):
                d = did[jx] - did[i]
                if d > band:
                    break
                inter = len(toks[i] & toks[jx])
                union = len(toks[i] | toks[jx])
                jac = inter / union if union else 0.0
                if jac >= threshold:
                    out_a.append(did[i])
                    out_b.append(did[jx])
                    out_j.append(round(jac, 4))
        return pd.DataFrame({"doc_a": np.asarray(out_a, np.int64),
                             "doc_b": np.asarray(out_b, np.int64),
                             "jaccard": np.asarray(out_j, np.float64)})

    return tagged.groupby("bucket").map_groups(pairs, batch_format="pandas")


def ngram_jaccard_pairs(sf_dir: str, band: int = 50, threshold: float = 0.2,
                        bucket: int = 200) -> pd.DataFrame:
    """Query shim: sorted pandas view of :func:`ngram_jaccard_pairs_ds`."""
    return _pairs_to_pandas(
        ngram_jaccard_pairs_ds(sf_dir, band, threshold, bucket),
        ["doc_a", "doc_b"],
        {"doc_a": np.int64, "doc_b": np.int64, "jaccard": np.float64})


def connected_components_ds(nodes: rd.Dataset, edges_src_dst: rd.Dataset,
                            max_iters: int = 25) -> rd.Dataset:
    """Connected components over an undirected int64 graph:
    ``cluster_id`` = smallest node_id reachable — the canonical
    representative a dedup pass would keep.  ``nodes`` carries a
    ``doc_id`` column (one row per node); ``edges_src_dst`` carries
    directed ``src``/``dst`` int64 rows (pass each undirected edge once —
    both directions are added here).

    Distributed shape: min-label propagation WITH pointer jumping — labels
    live in a Dataset; each iteration (a) joins edge sources against
    current labels (bucketed hash join) and (b) shortcuts label -> label(label)
    (labels self-join), then unions proposals with the current labels and
    takes the per-doc min with a partial-aggregation groupby.  Pointer
    jumping makes convergence O(log diameter) instead of O(diameter) — a
    5000-doc chain converges in ~8 iterations, not ~100.  Convergence is
    detected by the (cheap) global label sum.

    Returns a Dataset of (doc_id, cluster_id) — one row per node, which
    at 100 TB is itself large, so the result NEVER touches the driver here;
    sink it with ``.write_parquet()`` or collect via the query shim."""
    labels = nodes.map_batches(
        lambda df: pd.DataFrame({"doc_id": df["doc_id"].to_numpy(np.int64),
                                 "label": df["doc_id"].to_numpy(np.int64)}),
        batch_format="pandas",
    ).materialize()

    def _as_clusters(ds: rd.Dataset) -> rd.Dataset:
        return ds.map_batches(
            lambda df: pd.DataFrame(
                {"doc_id": df["doc_id"].to_numpy(np.int64),
                 "cluster_id": df["label"].to_numpy(np.int64)}),
            batch_format="pandas",
        )

    # both directions (a proposal flows across each edge either way);
    # materialized ONCE to the object store — every propagation iteration
    # joins against it, and an unmaterialized edge set would re-run the
    # whole upstream pair pipeline per iteration
    edges = edges_src_dst.map_batches(
        lambda df: pd.DataFrame(
            {"src": np.concatenate([df["src"].to_numpy(np.int64),
                                    df["dst"].to_numpy(np.int64)]),
             "dst": np.concatenate([df["dst"].to_numpy(np.int64),
                                    df["src"].to_numpy(np.int64)])}),
        batch_format="pandas",
    ).materialize()
    if edges.count() == 0:
        return _as_clusters(labels)

    from .common import hash_join, partial_groupby

    prev_sum = None
    for _ in range(max_iters):
        lab_src = labels.map_batches(
            lambda df: pd.DataFrame({"src": df["doc_id"], "label": df["label"]}),
            batch_format="pandas",
        )
        prop = hash_join(
            edges, lab_src, on="src",
            lcols=["src", "dst"], rcols=["src", "label"],
            post=lambda df: pd.DataFrame({"doc_id": df["dst"].to_numpy(np.int64),
                                          "label": df["label"].to_numpy(np.int64)}),
        )
        # pointer jumping: doc -> label(label(doc))
        lab_key = labels.map_batches(
            lambda df: pd.DataFrame({"k": df["label"], "doc_id": df["doc_id"]}),
            batch_format="pandas",
        )
        lab_val = labels.map_batches(
            lambda df: pd.DataFrame({"k": df["doc_id"], "label": df["label"]}),
            batch_format="pandas",
        )
        jump = hash_join(
            lab_key, lab_val, on="k",
            lcols=["k", "doc_id"], rcols=["k", "label"],
            post=lambda df: pd.DataFrame({"doc_id": df["doc_id"].to_numpy(np.int64),
                                          "label": df["label"].to_numpy(np.int64)}),
        )
        labels = partial_groupby(prop.union(labels).union(jump), ["doc_id"],
                                 {"label": ("label", "min")}).materialize()
        s = labels.sum("label")
        if s == prev_sum:  # fixpoint: no label decreased anywhere
            break
        prev_sum = s

    return _as_clusters(labels)


def neardup_clusters_ds(sf_dir: str, band: int = 50, threshold: float = 0.2,
                        bucket: int = 200, max_iters: int = 25) -> rd.Dataset:
    """Connected components over the n-gram-Jaccard near-dup graph (see
    :func:`connected_components_ds` for the distributed shape).  Exact
    DuckDB oracle via a recursive transitive-closure CTE over the same
    pair predicate."""
    pairs_ds = ngram_jaccard_pairs_ds(sf_dir, band, threshold, bucket)
    edges = pairs_ds.map_batches(
        lambda df: pd.DataFrame({"src": df["doc_a"].to_numpy(np.int64),
                                 "dst": df["doc_b"].to_numpy(np.int64)}),
        batch_format="pandas",
    )
    docs = load(sf_dir, "documents", ["doc_id"])
    return connected_components_ds(docs, edges, max_iters)


def neardup_clusters(sf_dir: str, band: int = 50, threshold: float = 0.2,
                     bucket: int = 200, max_iters: int = 25) -> pd.DataFrame:
    """Query shim: sorted pandas view of :func:`neardup_clusters_ds`."""
    return _pairs_to_pandas(
        neardup_clusters_ds(sf_dir, band, threshold, bucket, max_iters),
        ["doc_id"], {"doc_id": np.int64, "cluster_id": np.int64})


# ------------------------------------------------------------------ simhash

def simhash64(text: str) -> int:
    toks = _TOKEN_RE.findall(text.lower())
    if not toks:
        return 0
    th = _stable_token_hashes(toks)
    bits = ((th[:, None] >> np.arange(64, dtype=np.uint64)[None, :]) & np.uint64(1)).astype(np.int64)
    v = (bits * 2 - 1).sum(axis=0)
    sig = np.uint64(0)
    for i in range(64):
        if v[i] > 0:
            sig |= np.uint64(1) << np.uint64(i)
    return int(sig)


def simhash_pairs_ds(sf_dir: str, max_hamming: int = 3) -> rd.Dataset:
    """SimHash near-dup: 4x16-bit band blocking (two signatures within
    hamming<=3 of 64 bits must agree exactly on >=1 of 4 bands — pigeonhole,
    so banding loses NOTHING and the output equals brute-force all-pairs),
    then hamming verify per candidate bucket.

    Scale shape: the hamming<=max_hamming filter runs INSIDE each band
    bucket (a true pair is re-found by every agreeing band, so per-band
    filtering is lossless), and the cross-band pair dedup is a distributed
    groupby — the driver only ever sees the final near-dup pairs.  Exact
    DuckDB oracle in __ray_entry__.py (md5-based token hashes, per-bit
    majority + per-bit hamming join)."""
    ds = load(sf_dir, "documents", ["doc_id", "text"])

    def sig_batch(df: pd.DataFrame) -> pd.DataFrame:
        sigs = np.array([simhash64(t) for t in df["text"]], dtype=np.uint64)
        n = len(sigs)
        out = {
            "doc_id": np.tile(df["doc_id"].to_numpy(), 4),
            "sig": np.tile(sigs.astype(np.int64), 4),
            "band_id": np.repeat(np.arange(4, dtype=np.int32), n),
        }
        band_vals = np.concatenate(
            [((sigs >> np.uint64(16 * b)) & np.uint64(0xFFFF)).astype(np.int64) for b in range(4)]
        )
        out["band_val"] = band_vals
        return pd.DataFrame(out)

    bands = ds.map_batches(sig_batch, batch_format="pandas")

    _EMPTY = {"doc_a": pd.Series([], dtype=np.int64),
              "doc_b": pd.Series([], dtype=np.int64),
              "hamming": pd.Series([], dtype=np.int64)}

    def emit(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop_duplicates("doc_id").sort_values("doc_id")
        if len(g) < 2:
            return pd.DataFrame(_EMPTY)
        ids = g["doc_id"].to_numpy()
        sigs = g["sig"].to_numpy().astype(np.uint64)
        a, b = np.triu_indices(len(ids), k=1)
        x = sigs[a] ^ sigs[b]
        ham = np.zeros(len(x), dtype=np.int64)
        for _ in range(64):
            ham += (x & np.uint64(1)).astype(np.int64)
            x >>= np.uint64(1)
        keep = ham <= max_hamming  # selectivity applied IN the bucket
        return pd.DataFrame(
            {"doc_a": ids[a][keep].astype(np.int64), "doc_b": ids[b][keep].astype(np.int64),
             "hamming": ham[keep]}
        )

    pairs = bands.groupby(["band_id", "band_val"]).map_groups(
        emit, batch_format="pandas")
    # cross-band dedup stays distributed: same (doc_a, doc_b) found by
    # several agreeing bands collapses to one row inside its group
    return pairs.groupby(["doc_a", "doc_b"]).map_groups(
        lambda g: g.head(1), batch_format="pandas")


def simhash_pairs(sf_dir: str, max_hamming: int = 3) -> pd.DataFrame:
    """Query shim: sorted pandas view of :func:`simhash_pairs_ds`."""
    return _pairs_to_pandas(
        simhash_pairs_ds(sf_dir, max_hamming), ["doc_a", "doc_b"],
        {"doc_a": np.int64, "doc_b": np.int64, "hamming": np.int64})


# ------------------------------------------------------------------ embedding banded near-dup

def embedding_near_dup_pairs_ds(sf_dir: str, band: int = 100, threshold: float = 0.25,
                                bucket: int = 400) -> rd.Dataset:
    """Range self-join: pairs with vec_id difference in [1, band] and cosine
    > threshold.  Partitioning assumption: rows bucket by vec_id // bucket
    with bucket >= band, so a qualifying pair spans at most adjacent
    buckets; rows within ``band`` of a bucket's start are replicated as
    ghost rows into the previous bucket, making every qualifying pair land
    in exactly one bucket (e1 = non-ghost, e2 = anything)."""
    bucket = max(bucket, band)  # adjacency invariant of the ghost scheme
    ds = load(sf_dir, "embeddings", ["vec_id", "embedding"])

    def tag(df: pd.DataFrame) -> pd.DataFrame:
        vid = df["vec_id"].to_numpy()
        main = pd.DataFrame({"vec_id": vid, "embedding": df["embedding"],
                             "bucket": vid // bucket, "ghost": False})
        ghost_mask = (vid % bucket) < band
        ghosts = main[ghost_mask & (vid // bucket > 0)].copy()
        ghosts["bucket"] = ghosts["bucket"] - 1
        ghosts["ghost"] = True
        return pd.concat([main, ghosts], ignore_index=True)

    tagged = ds.map_batches(tag, batch_format="pandas")

    def pairs_in_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("vec_id")
        vid = g["vec_id"].to_numpy()
        ghost = g["ghost"].to_numpy()
        E = np.stack(g["embedding"].to_numpy()).astype(np.float64)
        En = E / np.linalg.norm(E, axis=1, keepdims=True)
        cos = En @ En.T
        a, b = np.triu_indices(len(vid), k=1)
        delta = vid[b] - vid[a]
        keep = (delta >= 1) & (delta <= band) & (~ghost[a]) & (cos[a, b] > threshold)
        return pd.DataFrame(
            {"vec_a": vid[a][keep].astype(np.int64), "vec_b": vid[b][keep].astype(np.int64)}
        )

    # exactly-once by the ghost construction (docstring) — no dedup pass
    return tagged.groupby("bucket").map_groups(pairs_in_bucket,
                                               batch_format="pandas")


def embedding_near_dup_pairs(sf_dir: str, band: int = 100, threshold: float = 0.25,
                             bucket: int = 400) -> pd.DataFrame:
    """Query shim: sorted pandas view of :func:`embedding_near_dup_pairs_ds`."""
    return _pairs_to_pandas(
        embedding_near_dup_pairs_ds(sf_dir, band, threshold, bucket),
        ["vec_a", "vec_b"], {"vec_a": np.int64, "vec_b": np.int64})
