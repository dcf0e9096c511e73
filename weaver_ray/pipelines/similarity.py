"""Similarity search over the embedding column: brute-force cosine top-k
(baseline) and an IVF-bucketed approximate variant (scale path).

Both broadcast the query matrix once with ``ray.put`` and do one numpy
matmul per Arrow batch — never a per-row loop, never a shuffle of the
corpus side (task brief 'Similarity search').
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray
import ray.data as rd

from .common import load, sql_round


def _matrix(col) -> np.ndarray:
    return np.stack([np.asarray(v, dtype=np.float64) for v in col])


def ann_bruteforce_topk(sf_dir: str, n_queries: int = 5, k: int = 10) -> pd.DataFrame:
    """Exact top-k cosine neighbors for the first ``n_queries`` vec_ids.

    Per-batch: normalize batch rows, one matmul vs the broadcast query
    matrix, local top-k per query; a query_id-keyed exchange folds the
    per-batch candidates into the global top-k, so the driver sees only
    the k*n_queries result rows (r4 verdict: the old driver-side merge
    held k*n_queries*n_blocks candidate rows — O(n_blocks) driver state
    at scale).  Output is the (query_id, neighbor_id) set only — cosine
    values are implementation-precision-sensitive between engines, so
    ranks are resolved with a (cos desc, neighbor_id asc) tiebreak and
    the value itself is not part of the contract."""
    import pyarrow.dataset as pads
    import pyarrow.parquet as pq
    import os

    # prune at the read: only the query rows leave storage
    qt = pq.read_table(os.path.join(sf_dir, "embeddings.parquet"),
                       columns=["vec_id", "embedding"],
                       filters=pads.field("vec_id") < n_queries)
    qids = qt.column("vec_id").to_numpy()
    Q = _matrix(qt.column("embedding").to_pylist())
    Qn = Q / np.linalg.norm(Q, axis=1, keepdims=True)
    ref = ray.put((qids, Qn))

    ds = load(sf_dir, "embeddings", ["vec_id", "embedding"])

    def local_topk(df: pd.DataFrame) -> pd.DataFrame:
        from .common import _cached_get

        qids, Qn = _cached_get(ref)
        vid = df["vec_id"].to_numpy()
        E = _matrix(df["embedding"].to_numpy())
        En = E / np.linalg.norm(E, axis=1, keepdims=True)
        cos = Qn @ En.T  # (nq, batch)
        out_q, out_n, out_c = [], [], []
        for qi, qid in enumerate(qids):
            row = cos[qi]
            mask = vid != qid
            idx = np.flatnonzero(mask)
            if len(idx) == 0:
                continue
            order = idx[np.lexsort((vid[idx], -row[idx]))][: k]
            out_q.extend([qid] * len(order))
            out_n.extend(vid[order])
            out_c.extend(row[order])
        return pd.DataFrame(
            {"query_id": np.asarray(out_q, np.int64),
             "neighbor_id": np.asarray(out_n, np.int64),
             "cos": np.asarray(out_c, np.float64)}
        )

    cand = ds.map_batches(local_topk, batch_format="pandas")

    def topk_bucket(g: pd.DataFrame) -> pd.DataFrame:
        # complete query groups per bucket -> per-bucket head(k) IS the
        # global top-k for those queries; empty typed frames (hash
        # holes) pass through the vectorized path untouched
        g = g.reindex(columns=["query_id", "neighbor_id", "cos"])
        g = g.sort_values(["query_id", "cos", "neighbor_id"],
                          ascending=[True, False, True])
        return g.groupby("query_id", sort=False).head(k)

    from .common import keyed_map_groups

    return (keyed_map_groups(cand, "query_id", topk_bucket)
            .to_pandas()
            .sort_values(["query_id", "cos", "neighbor_id"],
                         ascending=[True, False, True])
            .drop(columns=["cos"])
            .reset_index(drop=True))


def hybrid_rrf_topk(sf_dir: str, k: int = 20, c: int = 60,
                    n_leg: int = 50) -> pd.DataFrame:
    """HYBRID RETRIEVAL via Reciprocal Rank Fusion (Cormack, Clarke &
    Buettcher 2009): fuse the lexical BM25 top-``n_leg`` (fixed term set,
    :func:`textops.bm25_topk`) with the dense cosine top-``n_leg``
    (query = vec 0's embedding; doc_id ≡ vec_id by table construction)
    as ``rrf = 1/(c + lex_rank) + 1/(c + dense_rank)``, absent-leg terms
    contributing 0 — the standard two-retriever fusion of a curation /
    RAG pipeline.

    Scale shape: each leg is an already-audited broadcast scan with
    per-block top-k partials; fusion itself touches <= 2*n_leg rows
    (output-bounded driver work).  FP parity: dense ranks order on the
    1e-9-quantized cosine grid (the kmeans precedent; the oracle casts
    the FLOAT list to DOUBLE so both engines rank the same quantity),
    and each RRF score is a TWO-term IEEE sum of identical doubles —
    commutative-exact, no rounding needed on the fused score."""
    import os

    import pyarrow.dataset as pads
    import pyarrow.parquet as pq

    from .common import sql_round
    from .textops import bm25_topk

    lex = bm25_topk(sf_dir, k=n_leg)[["doc_id", "rank"]].rename(
        columns={"rank": "lex_rank"})

    qt = pq.read_table(os.path.join(sf_dir, "embeddings.parquet"),
                       columns=["vec_id", "embedding"],
                       filters=pads.field("vec_id") == 0)
    q = _matrix(qt.column("embedding").to_pylist())[0]
    qn = q / np.linalg.norm(q)
    ref = ray.put(qn)

    ds = load(sf_dir, "embeddings", ["vec_id", "embedding"])

    def local_topk(df: pd.DataFrame) -> pd.DataFrame:
        from .common import _cached_get

        qn = _cached_get(ref)
        vid = df["vec_id"].to_numpy(np.int64)
        E = _matrix(df["embedding"].to_numpy())
        En = E / np.linalg.norm(E, axis=1, keepdims=True)
        cos = sql_round(En @ qn, 9)  # the 1e-9 ranking grid
        mask = vid != 0
        idx = np.flatnonzero(mask)
        order = idx[np.lexsort((vid[idx], -cos[idx]))][:n_leg]
        return pd.DataFrame({"vec_id": vid[order], "cos": cos[order]})

    cand = ds.map_batches(local_topk, batch_format="pandas").to_pandas()
    dense = (cand.sort_values(["cos", "vec_id"], ascending=[False, True])
             .head(n_leg).reset_index(drop=True))
    dense = pd.DataFrame({"doc_id": dense["vec_id"].to_numpy(np.int64),
                          "dense_rank": np.arange(1, len(dense) + 1,
                                                  dtype=np.int64)})

    fused = lex.merge(dense, on="doc_id", how="outer")
    lr = fused["lex_rank"].fillna(0).to_numpy(np.int64)
    dr = fused["dense_rank"].fillna(0).to_numpy(np.int64)
    score = (np.where(lr > 0, 1.0 / (c + lr), 0.0)
             + np.where(dr > 0, 1.0 / (c + dr), 0.0))
    out = pd.DataFrame({"doc_id": fused["doc_id"].to_numpy(np.int64),
                        "lex_rank": lr, "dense_rank": dr,
                        "rrf_score": score})
    out = (out.sort_values(["rrf_score", "doc_id"], ascending=[False, True])
           .head(k).reset_index(drop=True))
    out["fused_rank"] = np.arange(1, len(out) + 1, dtype=np.int64)
    return out


def ann_topk_per_label(sf_dir: str, n_queries: int = 5, k: int = 10) -> pd.DataFrame:
    """Metadata-FILTERED similarity search: exact top-k cosine neighbors
    restricted to corpus rows sharing the query's label — the production
    shape ('nearest neighbors within the same language / source / shard').
    Same broadcast-queries + per-batch-matmul scan as
    :func:`ann_bruteforce_topk`; the label predicate is one extra
    vectorized mask per query, applied to the batch's label column before
    local top-k selection.  At scale the label would also be the storage
    partition key, turning the mask into read-path pruning."""
    import os

    import pyarrow.dataset as pads
    import pyarrow.parquet as pq

    qt = pq.read_table(os.path.join(sf_dir, "embeddings.parquet"),
                       columns=["vec_id", "embedding", "label"],
                       filters=pads.field("vec_id") < n_queries)
    qids = qt.column("vec_id").to_numpy()
    qlabels = qt.column("label").to_numpy()
    Q = _matrix(qt.column("embedding").to_pylist())
    Qn = Q / np.linalg.norm(Q, axis=1, keepdims=True)
    ref = ray.put((qids, qlabels, Qn))

    ds = load(sf_dir, "embeddings", ["vec_id", "embedding", "label"])

    def local_topk(df: pd.DataFrame) -> pd.DataFrame:
        from .common import _cached_get

        qids, qlabels, Qn = _cached_get(ref)
        vid = df["vec_id"].to_numpy()
        lab = df["label"].to_numpy()
        E = _matrix(df["embedding"].to_numpy())
        En = E / np.linalg.norm(E, axis=1, keepdims=True)
        cos = Qn @ En.T
        out_q, out_n, out_c = [], [], []
        for qi, qid in enumerate(qids):
            row = cos[qi]
            idx = np.flatnonzero((vid != qid) & (lab == qlabels[qi]))
            if len(idx) == 0:
                continue
            order = idx[np.lexsort((vid[idx], -row[idx]))][: k]
            out_q.extend([qid] * len(order))
            out_n.extend(vid[order])
            out_c.extend(row[order])
        return pd.DataFrame(
            {"query_id": np.asarray(out_q, np.int64),
             "neighbor_id": np.asarray(out_n, np.int64),
             "cos": np.asarray(out_c, np.float64)})

    cand = ds.map_batches(local_topk, batch_format="pandas").to_pandas()
    return (
        cand.sort_values(["query_id", "cos", "neighbor_id"],
                         ascending=[True, False, True])
        .groupby("query_id", sort=True)
        .head(k)
        .drop(columns=["cos"])
        .reset_index(drop=True)
    )


def ann_ivf_topk(sf_dir: str, n_queries: int = 5, k: int = 10, n_cells: int = 8,
                 n_probe: int = 2, cell_iters: int = 3,
                 num_buckets: int = 16) -> pd.DataFrame:
    """IVF-FLAT approximate top-k (the FAISS ``IndexIVFFlat`` shape,
    inner-product ranking, ``by_residual=False``): the coarse quantizer is
    the SHARED :func:`kmeans_clusters` distributed Lloyd run — 4-dp-ROUNDED
    centroids, so both engines partition against bit-identical constants
    and this operator has a FULL DuckDB oracle (kmeans_sql nested, the
    ann_ivfpq_topk precedent minus the PQ half).

    Cell assignment uses the shared :func:`_nearest_centroid` 1e-9
    quantized-grid rule; each query probes its ``n_probe`` nearest cells
    (``row_number OVER (ORDER BY round(dist, 9), c) <= n_probe``), and
    ranking INSIDE the probed cells is exact cosine DESC with a
    neighbor_id tiebreak — the same raw-cos rank contract the green
    ann_bruteforce / ann_ivf_exhaustive oracles already rely on.

    Scale shape: training is the distributed Lloyd loop (driver state
    O(n_cells x dim), no sample ever materializes — strictly more
    de-drivered than sampled training); centroids + query info broadcast
    once via ``ray.put``; ONE map_batches pass assigns each batch row to
    its cell and scans only probe-masked rows — at scale the cell id is
    the storage partition key and the mask becomes read-path pruning of
    n_probe/n_cells of the data.  The corpus never reaches the driver."""
    import os

    import pyarrow.dataset as pads
    import pyarrow.parquet as pq

    from .common import _cached_get

    cent = kmeans_clusters(sf_dir, k=n_cells, n_iters=cell_iters,
                           num_buckets=num_buckets)
    CC = (cent.pivot(index="cluster", columns="dim", values="centroid")
          .to_numpy())                                       # n_cells x dim

    # --- query rows via filter-pushdown read (only n_queries rows scanned)
    qt = pq.read_table(os.path.join(sf_dir, "embeddings.parquet"),
                       columns=["vec_id", "embedding"],
                       filters=pads.field("vec_id") < n_queries)
    qids = qt.column("vec_id").to_numpy()
    Q = _matrix(qt.column("embedding").to_pylist())
    Qn = Q / np.linalg.norm(Q, axis=1, keepdims=True)
    # probe sets: the n_probe nearest cells on the 1e-9 grid, exact grid
    # ties to the LOWEST cell id (ORDER BY round(dist, 9), c)
    dq = ((Q[:, None, :] - CC[None, :, :]) ** 2).sum(axis=2)
    gq = np.floor(dq * 1e9 + 0.5)
    probe_mask = np.zeros((len(qids), CC.shape[0]), dtype=bool)
    for qi in range(len(qids)):
        cells = np.lexsort((np.arange(CC.shape[0]), gq[qi]))[:n_probe]
        probe_mask[qi, cells] = True
    ref = ray.put((qids, Qn, probe_mask, CC))

    ds = load(sf_dir, "embeddings", ["vec_id", "embedding"])

    def probe_topk(df: pd.DataFrame) -> pd.DataFrame:
        qids, Qn, probe_mask, CC = _cached_get(ref)
        vid = df["vec_id"].to_numpy()
        B = _matrix(df["embedding"].to_numpy())
        Bn = B / np.linalg.norm(B, axis=1, keepdims=True)
        cells = _nearest_centroid(B, CC)
        out_q, out_n, out_c = [], [], []
        for qi, qid in enumerate(qids):
            idx = np.flatnonzero(probe_mask[qi, cells] & (vid != qid))
            if len(idx) == 0:
                continue
            row = Bn[idx] @ Qn[qi]
            order = idx[np.lexsort((vid[idx], -row))][: k]
            out_q.extend([qid] * len(order))
            out_n.extend(vid[order])
            out_c.extend((Bn[order] @ Qn[qi]))
        return pd.DataFrame(
            {"query_id": np.asarray(out_q, np.int64),
             "neighbor_id": np.asarray(out_n, np.int64),
             "cos": np.asarray(out_c, np.float64)}
        )

    cand = ds.map_batches(probe_topk, batch_format="pandas").to_pandas()
    return (
        cand.sort_values(["query_id", "cos", "neighbor_id"], ascending=[True, False, True])
        .groupby("query_id", sort=True)
        .head(k)
        .drop(columns=["cos"])
        .reset_index(drop=True)
    )


def ann_ivf_exhaustive_topk(sf_dir: str, n_queries: int = 5, k: int = 10,
                            n_cells: int = 8) -> pd.DataFrame:
    """IVF with ``n_probe == n_cells``: every cell is probed, so the probe
    mask degenerates to ``vid != qid`` and the output MUST equal exact
    brute-force top-k.  This runs the full IVF machinery (distributed
    Lloyd training, broadcast centroids, per-batch cell assignment,
    probe-masked scan, candidate merge) through a path whose answer is
    SQL-checkable —
    the oracle is the same brute-force cosine top-k SQL as
    ann_bruteforce_topk, giving the approximate operator's plumbing a full
    value-hash correctness gate (the recall-vs-exact check in
    ann_ivf_recall then only has to vouch for the pruning, not the
    machinery)."""
    return ann_ivf_topk(sf_dir, n_queries=n_queries, k=k,
                        n_cells=n_cells, n_probe=n_cells)


def ann_ivf_sql(n_cells: int = 8, cell_iters: int = 3, n_probe: int = 2,
                n_queries: int = 5, k: int = 10, dim: int = 64) -> str:
    """The DuckDB oracle for :func:`ann_ivf_topk`: kmeans_sql's unrolled
    Lloyd chain supplies the coarse centroids, every vector cell-assigns
    on the round(dist, 9) grid with the lowest-cell tiebreak, each query
    probes its top-``n_probe`` cells, and the final ranking is exact
    cosine DESC with a neighbor_id tiebreak restricted to candidates in
    probed cells (the ann_ivfpq_sql skeleton with the PQ half replaced by
    the exact scan)."""
    return f"""
        WITH km AS ({kmeans_sql(k=n_cells, n_iters=cell_iters, dim=dim)}
        ),
        cc AS (SELECT cluster AS c, dim AS d, centroid AS v FROM km),
        ad AS (
            SELECT e.vec_id, cc.c,
                   sum((e.embedding[cc.d]::DOUBLE - cc.v)
                       * (e.embedding[cc.d]::DOUBLE - cc.v)) AS dist
            FROM embeddings e, cc
            GROUP BY e.vec_id, cc.c
        ),
        asg AS (
            SELECT vec_id, c AS cell FROM (
                SELECT vec_id, c, row_number() OVER (
                    PARTITION BY vec_id ORDER BY round(dist, 9), c) AS rn
                FROM ad) WHERE rn = 1
        ),
        probe AS (
            SELECT vec_id AS query_id, c AS cell FROM (
                SELECT vec_id, c, row_number() OVER (
                    PARTITION BY vec_id ORDER BY round(dist, 9), c) AS rn
                FROM ad WHERE vec_id < {n_queries}) WHERE rn <= {n_probe}
        )
        SELECT query_id, neighbor_id FROM (
            SELECT q.vec_id AS query_id, e.vec_id AS neighbor_id,
                   row_number() OVER (
                       PARTITION BY q.vec_id
                       ORDER BY list_cosine_similarity(
                           q.embedding, e.embedding) DESC, e.vec_id) AS rn
            FROM embeddings q
            JOIN probe p ON p.query_id = q.vec_id
            JOIN asg ON asg.cell = p.cell
            JOIN embeddings e ON e.vec_id = asg.vec_id
                             AND e.vec_id <> q.vec_id
            WHERE q.vec_id < {n_queries}
        ) WHERE rn <= {k}
        ORDER BY query_id, rn
    """


def ann_ivf_recall(sf_dir: str, n_queries: int = 5, k: int = 10) -> pd.DataFrame:
    """Self-evidencing check row for the approximate operator: recall@k of
    IVF (2/8 cells probed) against the exact brute-force top-k, computed by
    running BOTH pipelines.  The machinery is value-hash-checked by
    ann_ivf_topk's full DuckDB oracle; this row vouches for the PRUNING
    quality itself: recall_at_k is deterministic for a fixed sf_dir and
    must stay >= 0.4."""
    exact = ann_bruteforce_topk(sf_dir, n_queries=n_queries, k=k)
    approx = ann_ivf_topk(sf_dir, n_queries=n_queries, k=k)
    hits = 0
    for qid in exact["query_id"].unique():
        e = set(exact.loc[exact["query_id"] == qid, "neighbor_id"])
        a = set(approx.loc[approx["query_id"] == qid, "neighbor_id"])
        hits += len(e & a)
    nq = exact["query_id"].nunique()
    recall = hits / max(nq * k, 1)
    return pd.DataFrame(
        {"n_queries": [np.int64(nq)], "k": [np.int64(k)],
         "recall_at_k": [round(recall, 4)],
         "recall_floor_met": [bool(recall >= 0.4)]}
    )


def embedding_norm_stats(sf_dir: str) -> pd.DataFrame:
    """Per-label vector-norm stats (SQL-checkable via list lambdas)."""
    ds = load(sf_dir, "embeddings", ["vec_id", "embedding", "label"])

    def norms(df: pd.DataFrame) -> pd.DataFrame:
        E = _matrix(df["embedding"].to_numpy())
        return pd.DataFrame(
            {"label": df["label"].to_numpy(),
             "norm": np.sqrt((E * E).sum(axis=1))}
        )

    per_row = ds.map_batches(norms, batch_format="pandas")
    from .common import partial_groupby

    out = partial_groupby(
        per_row, ["label"],
        {"n_vecs": ("norm", "count"), "sum_norm": ("norm", "sum")},
    ).to_pandas()
    out["avg_norm"] = sql_round(out["sum_norm"] / out["n_vecs"], 4)
    out["n_vecs"] = out["n_vecs"].astype(np.int64)
    out = out.drop(columns=["sum_norm"]).sort_values("label").reset_index(drop=True)
    out["label"] = out["label"].astype(np.int32)
    return out


def label_centroids(sf_dir: str, num_buckets: int = 16) -> pd.DataFrame:
    """Per-label mean embedding (class centroids) — the seed computation
    for k-means/IVF training, per-class drift monitoring, and
    nearest-centroid classification over a labeled embedding corpus.

    Grouped VECTOR aggregation without exploding the list column
    row-wise: each batch stacks into a (rows x dim) float64 matrix and
    scatter-adds into one (labels_in_batch x dim) partial via
    ``np.add.at``, emitting long-form (label, dim, sum, n) partial rows
    — n_labels x dim rows per batch move through the reduce, never
    n_rows x dim.  The reduce is the bucketed many_groups path (label x
    dim keys).  The DuckDB oracle pays the full unnest-with-ordinality;
    output values are rounded with half-away semantics so both engines
    print the same 4 decimals."""
    import pyarrow as pa

    from .common import partial_groupby, sql_round

    ds = load(sf_dir, "embeddings", ["label", "embedding"])

    def prep(t: pa.Table) -> pd.DataFrame:
        if t.num_rows == 0:  # np.stack needs at least one array
            return pd.DataFrame({"label": pd.Series([], dtype=np.int64),
                                 "dim": pd.Series([], dtype=np.int64),
                                 "s": pd.Series([], dtype=np.float64),
                                 "n": pd.Series([], dtype=np.int64)})
        m = np.stack(t["embedding"].to_numpy(zero_copy_only=False)).astype(np.float64)
        lab = t["label"].to_numpy()
        uniq, inv = np.unique(lab, return_inverse=True)
        sums = np.zeros((len(uniq), m.shape[1]))
        np.add.at(sums, inv, m)
        cnt = np.bincount(inv, minlength=len(uniq))
        dim = m.shape[1]
        return pd.DataFrame({
            "label": np.repeat(uniq.astype(np.int64), dim),
            "dim": np.tile(np.arange(1, dim + 1, dtype=np.int64), len(uniq)),
            "s": sums.ravel(),
            "n": np.repeat(cnt.astype(np.int64), dim),
        })

    parts = ds.map_batches(prep, batch_format="pyarrow")
    g = partial_groupby(parts, ["label", "dim"],
                        {"s": ("s", "sum"), "n": ("n", "sum")},
                        many_groups=True, num_buckets=num_buckets).to_pandas()
    return pd.DataFrame({
        "label": g["label"].astype(np.int64),
        "dim": g["dim"].astype(np.int64),
        "centroid": sql_round(g["s"] / g["n"], 4),
        "n": g["n"].astype(np.int64),
    }).sort_values(["label", "dim"]).reset_index(drop=True)


def knn_graph(sf_dir: str, k: int = 5,
              max_broadcast_rows: int = 500_000) -> rd.Dataset:
    """Full kNN GRAPH over the embedding column: for EVERY vector, its
    exact top-k cosine neighbors — the building block of semantic dedup,
    graph-based clustering and coreset selection.

    Engine shape: the id-SORTED normalized corpus matrix is broadcast once
    (``ray.put``; N x 64 float64), then one matmul per streamed Arrow
    batch — each batch emits its rows' final neighbor lists, so the
    output is a Dataset with no shuffle and no driver materialization.
    Selection is one STABLE ``argsort(-cos)`` per batch (the broadcast
    side is pre-sorted by vec_id, so stability IS the (cos desc, vec_id
    asc) tiebreak — fully vectorized over the batch, no per-row Python
    ranking).  Self-matches are dropped from the top-(k+1) prefix, which
    is exact even when exact-duplicate vectors tie with the self match.

    Scale gate: the broadcast matrix is the whole corpus, so this exact
    baseline is gated at ``max_broadcast_rows`` (500k x 64 f64 = 256 MB —
    one object-store copy per node).  Past the gate the right composition
    is IVF: assign both sides to cells with ann_ivf's trained centroids
    and run this same batch-matmul within each probed cell (the
    bucket+ghost pattern of embedding_near_dup_pairs) — documented here,
    not silently degraded (the gate raises).

    Like ann_bruteforce_topk the contract is the (vec_id, neighbor_id)
    edge SET — cosine values and ranks are FP-precision-sensitive between
    engines, so they are resolved internally and not emitted."""
    import os

    import pyarrow.parquet as pq

    meta = pq.ParquetFile(os.path.join(sf_dir, "embeddings.parquet")).metadata
    if meta.num_rows > max_broadcast_rows:
        raise NotImplementedError(
            f"knn_graph exact baseline gated at {max_broadcast_rows} rows "
            f"(got {meta.num_rows}): compose with IVF cells past the gate")

    t = pq.read_table(os.path.join(sf_dir, "embeddings.parquet"),
                      columns=["vec_id", "embedding"])
    ids = t.column("vec_id").to_numpy()
    order = np.argsort(ids)
    ids = ids[order]
    G = _matrix(t.column("embedding").to_pylist())[order]
    nrm = np.linalg.norm(G, axis=1, keepdims=True)
    if (nrm == 0).any():
        # a zero vector has no cosine direction: NaN rows would silently
        # turn stable argsort into "first k ids" — reject loudly instead
        raise ValueError("knn_graph: zero-norm embedding(s) "
                         f"{ids[np.flatnonzero(nrm.ravel() == 0)][:5]}")
    Gn = G / nrm
    ref = ray.put((ids, Gn))

    ds = load(sf_dir, "embeddings", ["vec_id", "embedding"])

    def edges(df: pd.DataFrame) -> pd.DataFrame:
        from .common import _cached_get

        ids, Gn = _cached_get(ref)
        vid = df["vec_id"].to_numpy(np.int64)
        E = _matrix(df["embedding"].to_numpy())
        En = E / np.linalg.norm(E, axis=1, keepdims=True)
        cos = En @ Gn.T                      # (batch, N)
        # stable sort on -cos: equal cosines keep broadcast (= vec_id asc)
        # order, giving the deterministic (cos desc, id asc) rank
        top = np.argsort(-cos, axis=1, kind="stable")[:, : k + 1]
        nbr = ids[top]                       # (batch, k+1)
        keep = nbr != vid[:, None]           # drop the self match
        # rows where self was NOT in the prefix have k+1 non-self
        # candidates: keep only the first k per row
        extra = keep.cumsum(axis=1) > k
        keep &= ~extra
        src = np.repeat(vid, keep.sum(axis=1))
        return pd.DataFrame({"vec_id": src,
                             "neighbor_id": nbr[keep].astype(np.int64)})

    return ds.map_batches(edges, batch_format="pandas")


def _covariance_pass(sf_dir: str) -> tuple[np.ndarray, np.ndarray, int]:
    """ONE distributed pass for the d x d sample covariance of the
    embedding column: each batch emits its (sum-of-outer-products, sum,
    count) moment partials as tiny (dim_i, dim_j, val) rows — d^2 + d + 1
    floats per batch regardless of batch size — reduced by the bucketed
    partial groupby.  Returns (cov, mean, n).

    This is the small-d branch of distributed PCA: at d=64 the full
    second-moment matrix is 32 KB, so ONE pass + a driver-side 64x64
    eigensolve beats power iteration's T full scans.  For d where d^2
    won't fit a partial row set (d >~ 10^4), the same skeleton runs
    block power iteration / randomized SVD: the per-batch emit becomes
    E^T (E V) for a thin V, everything else is unchanged."""
    from .common import partial_groupby

    ds = load(sf_dir, "embeddings", ["embedding"])

    def partials(df: pd.DataFrame) -> pd.DataFrame:
        E = _matrix(df["embedding"].to_numpy())
        d = E.shape[1]
        M = E.T @ E                                   # (d, d)
        s = E.sum(axis=0)                             # (d,)
        ii = np.repeat(np.arange(1, d + 1), d)
        jj = np.tile(np.arange(1, d + 1), d)
        return pd.DataFrame({
            "dim_i": np.concatenate([ii, np.arange(1, d + 1), [-1]]).astype(np.int64),
            "dim_j": np.concatenate([jj, np.full(d, -1), [-1]]).astype(np.int64),
            "val": np.concatenate([M.ravel(), s, [float(len(E))]]),
        })

    parts = ds.map_batches(partials, batch_format="pandas")
    agg = partial_groupby(parts, ["dim_i", "dim_j"], {"val": ("val", "sum")},
                          many_groups=True).to_pandas()
    nrow = agg.loc[(agg["dim_i"] == -1) & (agg["dim_j"] == -1), "val"]
    n = int(nrow.iloc[0]) if len(nrow) else 0
    if n < 2:
        # covar_samp is undefined below 2 rows (DuckDB returns NULL);
        # reject loudly instead of emitting inf/NaN moments
        raise ValueError(f"sample covariance needs >= 2 vectors, got {n}")
    sums = (agg[(agg["dim_j"] == -1) & (agg["dim_i"] > 0)]
            .sort_values("dim_i")["val"].to_numpy())
    d = len(sums)
    mm = agg[(agg["dim_i"] > 0) & (agg["dim_j"] > 0)].sort_values(["dim_i", "dim_j"])
    M = mm["val"].to_numpy().reshape(d, d)
    mu = sums / n
    cov = (M - np.outer(sums, sums) / n) / (n - 1)
    return cov, mu, n


def embedding_covariance(sf_dir: str) -> pd.DataFrame:
    """Full d x d sample covariance of the embedding column from ONE
    distributed moment pass (the engine never explodes the list column;
    the DuckDB oracle pays the double unnest + d^2-pair covar_samp)."""
    from .common import sql_round

    cov, _, _ = _covariance_pass(sf_dir)
    d = cov.shape[0]
    return pd.DataFrame({
        "dim_i": np.repeat(np.arange(1, d + 1), d).astype(np.int64),
        "dim_j": np.tile(np.arange(1, d + 1), d).astype(np.int64),
        "cov": sql_round(pd.Series(cov.ravel()), 6),
    })


EIG_ITERS = 300  # fixed power-iteration count: the embedding spectrum's
                 # top gap is small (lambda2/lambda1 ~ 0.93), so linear
                 # convergence needs hundreds of steps to certify 1e-4


def embedding_top_eigvec(sf_dir: str, n_iters: int = EIG_ITERS) -> pd.DataFrame:
    """Top principal direction of the embedding distribution — the
    spectral summary behind PCA whitening, index seeding and drift
    monitoring.  Distributed part: the one-pass moment sweep of
    :func:`_covariance_pass`; the eigensolve is a FIXED-count POWER
    ITERATION from v0 = 1/sqrt(d) on the covariance QUANTIZED to the
    1e-6 grid — quantizing first makes both engines iterate the SAME
    matrix, so the whole algorithm is a DuckDB-unrollable CTE chain
    (previously this was a rows-only numpy eigh; the pytest still pins
    the result against eigh within tolerance).  Sign fixed by making
    the largest-|component| positive; every row carries the residual
    ``||C v - lambda v|| / lambda`` and ``residual_ok`` as the
    convergence certificate.  Known limitation (shared by BOTH engines,
    so parity holds): residual_ok certifies eigenpair-ness, not
    dominance — a start vector (near-)orthogonal to the top direction
    converges to a lower eigenpair; the eigh-pinned pytest is the
    dominance check for this corpus (host_spectral_bisection's ramp v0
    carries the same caveat)."""
    from .common import sql_round

    cov, _, n = _covariance_pass(sf_dir)
    d = cov.shape[0]
    C = np.asarray(sql_round(cov, 6))     # the shared iteration matrix
    v = np.full(d, 1.0 / np.sqrt(float(d)))
    for _ in range(n_iters):
        w = C @ v
        v = w / np.sqrt(float((w * w).sum()))
    lam = float(v @ (C @ v))
    if v[np.argmax(np.abs(v))] < 0:
        v = -v
    resid = float(np.linalg.norm(C @ v - lam * v)) / max(lam, 1e-30)
    return pd.DataFrame({
        "dim": np.arange(1, d + 1, dtype=np.int64),
        "component": sql_round(v, 6),
        "lambda1": np.full(d, float(sql_round(lam, 4))),
        "explained_var_ratio": np.full(
            d, float(sql_round(lam / float(np.trace(C)), 6))),
        "n_vecs": np.full(d, n, dtype=np.int64),
        "residual": np.full(d, float(sql_round(resid, 6))),
        "residual_ok": np.full(d, resid <= 1e-4),
    })


def embedding_top_eigvec_sql(n_iters: int = EIG_ITERS, dim: int = 64) -> str:
    """Oracle: the covariance CTE rounded to the shared 1e-6 grid, the
    power iteration unrolled one (matvec, normalize) pair per step, the
    identical sign rule and certificates."""
    parts = [f"""
        WITH u AS MATERIALIZED (
            SELECT vec_id, generate_subscripts(embedding, 1) AS d,
                   CAST(unnest(embedding) AS DOUBLE) AS e
            FROM embeddings
        ),
        cov AS MATERIALIZED (
            SELECT a.d AS i, b.d AS j, round(covar_samp(a.e, b.e), 6) AS c
            FROM u a JOIN u b USING (vec_id)
            GROUP BY a.d, b.d
        ),
        v0 AS MATERIALIZED (
            SELECT range + 1 AS d, 1.0 / sqrt({dim}.0) AS x
            FROM range(0, {dim})
        )"""]
    for t in range(1, n_iters + 1):
        parts.append(f""",
        w{t} AS MATERIALIZED (
            SELECT cov.i AS d, sum(cov.c * v.x) AS x
            FROM cov JOIN v{t - 1} v ON v.d = cov.j GROUP BY cov.i
        ),
        v{t} AS MATERIALIZED (
            SELECT d, x / (SELECT sqrt(sum(x * x)) FROM w{t}) AS x
            FROM w{t}
        )""")
    last = n_iters
    parts.append(f""",
        cv AS MATERIALIZED (
            SELECT cov.i AS d, sum(cov.c * v.x) AS x
            FROM cov JOIN v{last} v ON v.d = cov.j GROUP BY cov.i
        ),
        lam AS (SELECT sum(v.x * cv.x) AS l
                FROM v{last} v JOIN cv USING (d)),
        sgn AS (
            SELECT CASE WHEN (SELECT x FROM v{last}
                              ORDER BY abs(x) DESC, d LIMIT 1) < 0
                        THEN -1.0 ELSE 1.0 END AS s
        ),
        res AS (
            SELECT sqrt(sum((cv.x - (SELECT l FROM lam) * v.x)
                            * (cv.x - (SELECT l FROM lam) * v.x)))
                   / greatest((SELECT l FROM lam), 1e-30) AS r
            FROM v{last} v JOIN cv USING (d)
        )
        SELECT v.d::BIGINT AS dim,
               round(v.x * (SELECT s FROM sgn), 6) AS component,
               round((SELECT l FROM lam), 4) AS lambda1,
               round((SELECT l FROM lam)
                     / (SELECT sum(c) FROM cov WHERE i = j), 6)
                   AS explained_var_ratio,
               (SELECT count(DISTINCT vec_id) FROM u)::BIGINT AS n_vecs,
               round((SELECT r FROM res), 6) AS residual,
               (SELECT r FROM res) <= 1e-4 AS residual_ok
        FROM v{last} v""")
    return "".join(parts)


def _nearest_centroid(m: np.ndarray, C: np.ndarray) -> np.ndarray:
    """Nearest-centroid assignment over squared distances QUANTIZED to a
    1e-9 grid (half-away; distances are >= 0): numpy's in-order sum and
    DuckDB's unordered SUM differ by ulps, so both sides compare the same
    grid and near-ties break identically — ``np.argmin`` picks the FIRST
    (lowest c) minimum, matching the oracle's ORDER BY round(dist, 9), c.
    ONE definition shared by kmeans_clusters and semantic_dedup_keepers
    so the assignment rule cannot drift from the two oracles."""
    d2 = ((m[:, None, :] - C[None, :, :]) ** 2).sum(axis=2)
    return np.argmin(np.floor(d2 * 1e9 + 0.5), axis=1)


def kmeans_clusters(sf_dir: str, k: int = 8, n_iters: int = 3,
                    num_buckets: int = 16) -> pd.DataFrame:
    """Distributed LLOYD K-MEANS over the embedding column — the
    clustering step behind SemDeDup-style semantic dedup, IVF coarse
    quantizers and balanced training-mix bucketing; run for a FIXED
    ``n_iters`` so the DuckDB oracle can replay the identical fixed point
    as an unrolled CTE chain (the host_pagerank precedent applied to a
    vector-state iterative algorithm).

    Engine shape per iteration: the k x dim centroid matrix (a few KB) is
    broadcast with ``ray.put``; ONE map_batches pass over the distributed
    corpus assigns each batch row to its nearest centroid (one vectorized
    (rows, k, dim) squared-distance reduction + argmin over the distances
    QUANTIZED to a 1e-9 grid — FP summation-order noise between numpy and
    DuckDB can't flip a near-tie, and exact grid ties break to the LOWEST
    cluster id on both sides, matching ORDER BY round(dist, 9), c) and
    scatter-adds per-cluster partial sums via ``np.add.at`` — k x dim
    long-form partial rows per batch move through the many_groups reduce,
    never rows x dim (the label_centroids budget).  Driver state is
    O(k x dim); an empty cluster keeps its previous centroid on both
    engines (the oracle's coalesce).

    Init is the k lowest-vec_id vectors via a column-pruned id read +
    filtered row fetch — deterministic and SQL-reproducible; at corpus
    scale init switches to the seeded ``random_sample`` of ann_ivf (the
    id scan is the only driver-side O(n) step and it is int64-only).

    Output contract: (cluster, dim, centroid, n) long-form like
    label_centroids, centroid half-away-rounded to 4 dp; n is the member
    count of the FINAL assignment (the one that produced the returned
    centroids)."""
    import os

    import pyarrow.dataset as pads
    import pyarrow.parquet as pq

    from .common import _cached_get, partial_groupby, sql_round

    path = os.path.join(sf_dir, "embeddings.parquet")
    ids = pq.read_table(path, columns=["vec_id"]).column("vec_id").to_numpy()
    if len(ids) < k:
        raise ValueError(f"kmeans_clusters: need >= {k} vectors, got {len(ids)}")
    kth = np.partition(ids, k - 1)[k - 1]
    init = pq.read_table(path, columns=["vec_id", "embedding"],
                         filters=pads.field("vec_id") <= kth)
    order = np.argsort(init.column("vec_id").to_numpy())[:k]
    C = _matrix(init.column("embedding").to_pylist())[order]  # k x dim
    dim = C.shape[1]

    ds = load(sf_dir, "embeddings", ["vec_id", "embedding"])
    counts = np.zeros(k, dtype=np.int64)
    for _ in range(n_iters):
        ref = ray.put(C)

        def partials(df: pd.DataFrame) -> pd.DataFrame:
            C_ = _cached_get(ref)
            kk, dd = C_.shape
            if not len(df):
                return pd.DataFrame({"c": pd.Series([], dtype=np.int64),
                                     "dim": pd.Series([], dtype=np.int64),
                                     "s": pd.Series([], dtype=np.float64),
                                     "n": pd.Series([], dtype=np.int64)})
            m = _matrix(df["embedding"].to_numpy())
            a = _nearest_centroid(m, C_)
            sums = np.zeros((kk, dd))
            np.add.at(sums, a, m)
            cnt = np.bincount(a, minlength=kk).astype(np.int64)
            return pd.DataFrame({
                "c": np.repeat(np.arange(kk, dtype=np.int64), dd),
                "dim": np.tile(np.arange(1, dd + 1, dtype=np.int64), kk),
                "s": sums.ravel(),
                "n": np.repeat(cnt, dd),
            })

        g = partial_groupby(ds.map_batches(partials, batch_format="pandas"),
                            ["c", "dim"], {"s": ("s", "sum"), "n": ("n", "sum")},
                            many_groups=True, num_buckets=num_buckets
                            ).to_pandas()
        sums = np.zeros((k, dim))
        nvec = np.zeros(k, dtype=np.int64)
        ci = g["c"].to_numpy(np.int64)
        di = g["dim"].to_numpy(np.int64) - 1
        sums[ci, di] = g["s"].to_numpy(np.float64)
        nvec[ci[di == 0]] = g["n"].to_numpy(np.int64)[di == 0]
        nonempty = nvec > 0
        C = np.where(nonempty[:, None], sums / np.maximum(nvec, 1)[:, None], C)
        counts = nvec

    return pd.DataFrame({
        "cluster": np.repeat(np.arange(k, dtype=np.int64), dim),
        "dim": np.tile(np.arange(1, dim + 1, dtype=np.int64), k),
        "centroid": sql_round(pd.Series(C.ravel()), 4),
        "n": np.repeat(counts, dim),
    })


def kmeans_sql(k: int = 8, n_iters: int = 3, dim: int = 64) -> str:
    """The DuckDB oracle: Lloyd's fixed iteration count unrolled as one
    (assign, means, coalesce) CTE triple per step over the same parquet —
    centroids live as long-form (c, d, v) rows, assignment is a
    row_number-over-(dist, c) argmin, and an empty cluster coalesces to
    its previous centroid exactly like the engine."""
    parts = [f"""
        WITH dims AS (SELECT range AS d FROM range(1, {dim + 1})),
        init AS (
            SELECT embedding, row_number() OVER (ORDER BY vec_id) - 1 AS c
            FROM embeddings ORDER BY vec_id LIMIT {k}
        ),
        c0 AS (SELECT i.c, dims.d, i.embedding[dims.d]::DOUBLE AS v
               FROM init i, dims)"""]
    for t in range(n_iters):
        parts.append(f""",
        d{t} AS (
            SELECT e.vec_id, cc.c,
                   sum((e.embedding[cc.d]::DOUBLE - cc.v)
                       * (e.embedding[cc.d]::DOUBLE - cc.v)) AS dist
            FROM embeddings e, c{t} cc
            GROUP BY e.vec_id, cc.c
        ),
        a{t} AS (
            SELECT vec_id, c FROM (
                SELECT vec_id, c, row_number() OVER (
                    PARTITION BY vec_id ORDER BY round(dist, 9), c) AS rn
                FROM d{t}) WHERE rn = 1
        ),
        m{t} AS (
            SELECT a.c, dims.d, avg(e.embedding[dims.d]::DOUBLE) AS v
            FROM a{t} a JOIN embeddings e USING (vec_id), dims
            GROUP BY a.c, dims.d
        ),
        c{t + 1} AS (
            SELECT p.c, p.d, coalesce(m.v, p.v) AS v
            FROM c{t} p LEFT JOIN m{t} m ON m.c = p.c AND m.d = p.d
        )""")
    last = n_iters - 1
    parts.append(f"""
        SELECT p.c AS cluster, p.d AS dim, round(p.v, 4) AS centroid,
               CAST(coalesce(n.n, 0) AS BIGINT) AS n
        FROM c{n_iters} p
        LEFT JOIN (SELECT c, count(*) AS n FROM a{last} GROUP BY c) n
               ON n.c = p.c
        ORDER BY cluster, dim""")
    return "".join(parts)


def semantic_dedup_keepers(sf_dir: str, k: int = 8, n_iters: int = 3,
                           threshold: float = 0.3,
                           num_buckets: int = 16) -> rd.Dataset:
    """SemDeDup-shape SEMANTIC deduplication (the published
    cluster-then-prune method: k-means the embedding space, then drop
    near-duplicates WITHIN each cluster — public algorithm, Abbas et al.
    2023): a vector survives iff NO lower-vec_id vector in its cluster
    has cosine similarity >= ``threshold`` with it.

    Composition: the final centroids come from the SAME fixed-iteration
    Lloyd run as kmeans_clusters (4-dp ROUNDED, so both engines assign
    against identical constants); assignment reuses the shared
    :func:`_nearest_centroid` quantized-grid rule; pruning compares
    cosines on the same 1e-9 grid (``round(cos, 9) >= threshold`` on
    both sides).

    Scale shape: one map_batches assignment pass (centroids broadcast,
    k x dim floats), then ONE hash shuffle keyed by cluster
    (keyed_map_groups — complete clusters per bucket) with a vectorized
    within-cluster cosine matrix + lower-id mask per cluster.  The
    within-cluster all-pairs is SemDeDup's own design point: k is chosen
    so clusters fit a worker (at 10^8+ vectors k grows with the corpus
    and this stage's cost stays (n/k)^2 per cluster, embarrassingly
    parallel across clusters)."""
    from .common import keyed_map_groups

    cent = kmeans_clusters(sf_dir, k=k, n_iters=n_iters,
                           num_buckets=num_buckets)
    C = (cent.pivot(index="cluster", columns="dim", values="centroid")
         .to_numpy())
    ref = ray.put(C)

    ds = load(sf_dir, "embeddings", ["vec_id", "embedding"])

    def assign(df: pd.DataFrame) -> pd.DataFrame:
        from .common import _cached_get

        if not len(df):
            return pd.DataFrame({"vec_id": pd.Series([], dtype=np.int64),
                                 "cluster": pd.Series([], dtype=np.int64),
                                 "emb": pd.Series([], dtype=object)})
        m = _matrix(df["embedding"].to_numpy())
        # ship vectors as fixed-dtype BYTES through the exchange (tensor
        # extension arrays don't survive its plain Arrow round trip — the
        # shingles-as-bytes precedent of the minhash verify join)
        return pd.DataFrame({
            "vec_id": df["vec_id"].to_numpy(np.int64),
            "cluster": _nearest_centroid(m, _cached_get(ref)),
            "emb": [v.tobytes() for v in
                    np.ascontiguousarray(m, dtype=np.float64)],
        })

    assigned = ds.map_batches(assign, batch_format="pandas")

    def prune(bucket: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({"vec_id": pd.Series([], dtype=np.int64),
                              "cluster": pd.Series([], dtype=np.int64)})
        if not len(bucket):
            return empty
        outs = []
        for c, g in bucket.groupby("cluster", sort=False):
            g = g.sort_values("vec_id")
            X = np.frombuffer(b"".join(g["emb"]),
                              dtype=np.float64).reshape(len(g), -1)
            nrm = np.linalg.norm(X, axis=1)
            nrm[nrm == 0] = 1.0  # zero vectors: cos defined as 0 both sides
            cos = (X @ X.T) / np.outer(nrm, nrm)
            cos_q = np.floor(cos * 1e9 + 0.5) / 1e9
            dup = np.tril(cos_q >= threshold, k=-1).any(axis=1)
            keep = g[~dup]
            outs.append(pd.DataFrame({
                "vec_id": keep["vec_id"].to_numpy(np.int64),
                "cluster": np.full(len(keep), int(c), dtype=np.int64)}))
        return pd.concat(outs, ignore_index=True) if outs else empty

    return keyed_map_groups(assigned, "cluster", prune, num_buckets)


def kmeans_label_ari(sf_dir: str, k: int = 8, n_iters: int = 3,
                     num_buckets: int = 16) -> pd.DataFrame:
    """ADJUSTED RAND INDEX (Hubert & Arabie 1985) between the fixed-
    iteration Lloyd clustering and the embeddings' ``label`` column —
    the standard external cluster-quality certificate (chance-corrected
    pair agreement), closing the loop on the clustering family: not
    just "k-means ran" but "how well it recovers the known structure",
    as a checkable number.

    Pure-integer parity: from the k x #labels contingency table let
    S = sum_ij C(n_ij,2), A = sum_i C(a_i,2), B = sum_j C(b_j,2),
    P = C(n,2).  Multiplying the textbook form through by 2P:
        ARI = (2*P*S - 2*A*B) / (P*(A+B) - 2*A*B)
    — numerator and denominator are exact integers (Python bigints on
    the engine, HUGEINT in DuckDB; at 10^10 rows the engine's bigints
    keep working while SQL would need wider-than-HUGEINT arithmetic),
    so the single final division is the only FP step, rounded 6 dp.

    Scale shape: assignment reuses kmeans_clusters' 4-dp ROUNDED
    centroids (broadcast once; both engines partition against
    bit-identical constants, the ann_ivf precedent) fused with the
    label read in ONE map_batches pass emitting (cluster, label) count
    partials; the reduce output is k x #labels cells — metadata-sized
    driver state where the combinatorics fold exactly."""
    from .common import _cached_get, partial_groupby, sql_round

    cent = kmeans_clusters(sf_dir, k=k, n_iters=n_iters,
                           num_buckets=num_buckets)
    C = (cent.pivot(index="cluster", columns="dim", values="centroid")
         .to_numpy())
    ref = ray.put(C)

    ds = load(sf_dir, "embeddings", ["vec_id", "embedding", "label"])

    def cells(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            return pd.DataFrame({"cluster": pd.Series([], dtype=np.int64),
                                 "label": pd.Series([], dtype=np.int64),
                                 "n": pd.Series([], dtype=np.int64)})
        m = _matrix(df["embedding"].to_numpy())
        a = _nearest_centroid(m, _cached_get(ref))
        g = (pd.DataFrame({"cluster": a.astype(np.int64),
                           "label": df["label"].to_numpy(np.int64)})
             .groupby(["cluster", "label"], sort=False).size())
        out = g.reset_index()
        out.columns = ["cluster", "label", "n"]
        return out

    cont = partial_groupby(ds.map_batches(cells, batch_format="pandas"),
                           ["cluster", "label"], {"n": ("n", "sum")},
                           many_groups=True, num_buckets=num_buckets
                           ).to_pandas()
    n, n_clusters, n_labels, ari = _ari_from_contingency(cont)
    return pd.DataFrame({
        "n_vectors": np.asarray([n], np.int64),
        "n_clusters": np.asarray([n_clusters], np.int64),
        "n_labels": np.asarray([n_labels], np.int64),
        "ari": sql_round(np.asarray([ari], np.float64), 6)})


def _ari_from_contingency(cont: pd.DataFrame):
    """Exact-integer ARI fold over a (cluster, label, n) cell table:
    returns (n, n_clusters, n_labels, ari) with ari the single final
    float division of two Python bigints."""
    nij = [int(v) for v in cont["n"]]
    n = sum(nij)
    ai = cont.groupby("cluster")["n"].sum()
    bj = cont.groupby("label")["n"].sum()

    def comb2(x: int) -> int:
        return x * (x - 1) // 2

    S = sum(comb2(v) for v in nij)
    A = sum(comb2(int(v)) for v in ai)
    B = sum(comb2(int(v)) for v in bj)
    P = comb2(n)
    den = P * (A + B) - 2 * A * B
    if den == 0:
        raise ValueError("kmeans_label_ari: degenerate partitions "
                         "(ARI undefined)")  # fail loudly, not wrongly
    ari = (2 * P * S - 2 * A * B) / den
    return n, int(ai.gt(0).sum()), int(bj.gt(0).sum()), ari


def kmeans_label_ari_sql(k: int = 8, n_iters: int = 3,
                         dim: int = 64) -> str:
    """The DuckDB oracle: kmeans_sql's rounded centroids nested, the
    shared quantized-grid assignment (the semantic_dedup_sql CTEs), the
    contingency table by plain GROUP BY, and the identical
    integer-exact ARI form with HUGEINT products."""
    return f"""
        WITH km AS ({kmeans_sql(k, n_iters, dim)}),
        cent AS (SELECT cluster AS c, dim AS d, centroid AS v FROM km),
        dst AS (
            SELECT e.vec_id, cc.c,
                   sum((e.embedding[cc.d]::DOUBLE - cc.v)
                       * (e.embedding[cc.d]::DOUBLE - cc.v)) AS dist
            FROM embeddings e, cent cc
            GROUP BY e.vec_id, cc.c
        ),
        asg AS (
            SELECT vec_id, c AS cluster FROM (
                SELECT vec_id, c, row_number() OVER (
                    PARTITION BY vec_id ORDER BY round(dist, 9), c) AS rn
                FROM dst) WHERE rn = 1
        ),
        cont AS (
            SELECT a.cluster, e.label, count(*)::HUGEINT AS nij
            FROM asg a JOIN embeddings e USING (vec_id)
            GROUP BY a.cluster, e.label
        ),
        terms AS (
            SELECT sum(nij * (nij - 1) // 2) AS S,
                   sum(nij)::HUGEINT AS n,
                   count(DISTINCT cluster)::BIGINT AS n_clusters,
                   count(DISTINCT label)::BIGINT AS n_labels
            FROM cont
        ),
        arow AS (
            SELECT sum(ac * (ac - 1) // 2) AS A FROM (
                SELECT sum(nij)::HUGEINT AS ac FROM cont GROUP BY cluster)
        ),
        brow AS (
            SELECT sum(bc * (bc - 1) // 2) AS B FROM (
                SELECT sum(nij)::HUGEINT AS bc FROM cont GROUP BY label)
        )
        SELECT t.n::BIGINT AS n_vectors, t.n_clusters, t.n_labels,
               round((2 * (t.n * (t.n - 1) // 2) * t.S
                      - 2 * a.A * b.B)::DOUBLE
                     / ((t.n * (t.n - 1) // 2) * (a.A + b.B)
                        - 2 * a.A * b.B)::DOUBLE, 6) AS ari
        FROM terms t, arow a, brow b
    """


def semantic_dedup_sql(k: int = 8, n_iters: int = 3,
                       threshold: float = 0.3, dim: int = 64) -> str:
    """The DuckDB oracle: kmeans_sql's final (ROUNDED) centroids as a
    nested CTE, the same quantized-grid assignment, then a lower-id
    within-cluster anti-join on round(cos, 9) >= threshold.  Cosines use
    DOUBLE-cast list_inner_product so pair expansion stays one row per
    pair (never pairs x dims)."""
    return f"""
        WITH km AS ({kmeans_sql(k, n_iters, dim)}),
        cent AS (SELECT cluster AS c, dim AS d, centroid AS v FROM km),
        dst AS (
            SELECT e.vec_id, cc.c,
                   sum((e.embedding[cc.d]::DOUBLE - cc.v)
                       * (e.embedding[cc.d]::DOUBLE - cc.v)) AS dist
            FROM embeddings e, cent cc
            GROUP BY e.vec_id, cc.c
        ),
        asg AS (
            SELECT vec_id, c AS cluster FROM (
                SELECT vec_id, c, row_number() OVER (
                    PARTITION BY vec_id ORDER BY round(dist, 9), c) AS rn
                FROM dst) WHERE rn = 1
        ),
        vecs AS (
            SELECT a.vec_id, a.cluster,
                   list_transform(e.embedding, x -> CAST(x AS DOUBLE)) AS emb,
                   CASE WHEN sqrt(list_inner_product(
                            list_transform(e.embedding,
                                           x -> CAST(x AS DOUBLE)),
                            list_transform(e.embedding,
                                           x -> CAST(x AS DOUBLE)))) = 0
                        THEN 1.0
                        ELSE sqrt(list_inner_product(
                            list_transform(e.embedding,
                                           x -> CAST(x AS DOUBLE)),
                            list_transform(e.embedding,
                                           x -> CAST(x AS DOUBLE))))
                   END AS nrm
            FROM asg a JOIN embeddings e USING (vec_id)
        )
        SELECT a.vec_id, a.cluster
        FROM vecs a
        WHERE NOT EXISTS (
            SELECT 1 FROM vecs b
            WHERE b.cluster = a.cluster AND b.vec_id < a.vec_id
              AND round(list_inner_product(a.emb, b.emb)
                        / (a.nrm * b.nrm), 9) >= {threshold}
        )
    """


def pq_codebooks(sf_dir: str, m: int = 4, k: int = 16, n_iters: int = 2,
                 num_buckets: int = 16) -> pd.DataFrame:
    """PRODUCT-QUANTIZATION codebooks (the compression half of IVF-PQ
    similarity search, public method — Jegou et al. 2011): the embedding
    space splits into ``m`` contiguous subspaces and each subspace gets
    its own ``k``-centroid Lloyd codebook, so a vector compresses to m
    small codes (here 4 x 4 bits replaces 64 floats).

    Engine shape: ALL m sub-quantizers train in the SAME pass — one
    map_batches per iteration computes, per subspace, the quantized-grid
    nearest-centroid assignment (:func:`_nearest_centroid` on the dim
    slice) and scatter-adds per-code partial sums; m x k x (dim/m)
    long-form rows per batch ride the many_groups reduce, exactly the
    kmeans_clusters budget repeated m times.  Driver state is the m
    codebooks (m x k x dim/m floats).  Init = the k lowest-vec_id
    vectors' slices; empty codes coalesce to their previous centroid.

    Output contract: (subspace, code, dim, centroid, n) long-form with
    GLOBAL 1-based dim indices (so the oracle slices embedding[dim]
    directly); n is the final assignment's member count per code."""
    from .common import sql_round

    C, counts = _pq_train(sf_dir, m, k, n_iters, num_buckets)
    m, k, sub = C.shape
    return pd.DataFrame({
        "subspace": np.repeat(np.arange(m, dtype=np.int64), k * sub),
        "code": np.tile(np.repeat(np.arange(k, dtype=np.int64), sub), m),
        "dim": np.concatenate([np.tile(np.arange(s * sub + 1,
                                                 (s + 1) * sub + 1,
                                                 dtype=np.int64), k)
                               for s in range(m)]),
        "centroid": sql_round(pd.Series(C.reshape(-1)), 4),
        "n": np.repeat(counts.reshape(-1), sub),
    })


def _pq_train(sf_dir: str, m: int, k: int, n_iters: int,
              num_buckets: int) -> tuple[np.ndarray, np.ndarray]:
    """The distributed sub-space Lloyd loop behind :func:`pq_codebooks`
    and :func:`pq_adc_topk`: returns (codebooks m x k x dim/m unrounded,
    final member counts m x k).  ONE training implementation so the
    codebook the scan encodes against cannot drift from the one the
    codebook query publishes."""
    import os

    import pyarrow.dataset as pads
    import pyarrow.parquet as pq

    from .common import _cached_get, partial_groupby

    path = os.path.join(sf_dir, "embeddings.parquet")
    ids = pq.read_table(path, columns=["vec_id"]).column("vec_id").to_numpy()
    if len(ids) < k:
        raise ValueError(f"pq_codebooks: need >= {k} vectors, got {len(ids)}")
    kth = np.partition(ids, k - 1)[k - 1]
    init = pq.read_table(path, columns=["vec_id", "embedding"],
                         filters=pads.field("vec_id") <= kth)
    order = np.argsort(init.column("vec_id").to_numpy())[:k]
    full = _matrix(init.column("embedding").to_pylist())[order]  # k x dim
    dim = full.shape[1]
    if dim % m:
        raise ValueError(f"pq_codebooks: dim {dim} not divisible by m={m}")
    sub = dim // m
    C = np.stack([full[:, s * sub:(s + 1) * sub] for s in range(m)])  # m,k,sub

    ds = load(sf_dir, "embeddings", ["vec_id", "embedding"])
    counts = np.zeros((m, k), dtype=np.int64)
    for _ in range(n_iters):
        ref = ray.put(C)

        def partials(df: pd.DataFrame) -> pd.DataFrame:
            C_ = _cached_get(ref)
            mm, kk, ss = C_.shape
            if not len(df):
                return pd.DataFrame({"s_id": pd.Series([], dtype=np.int64),
                                     "c": pd.Series([], dtype=np.int64),
                                     "dim": pd.Series([], dtype=np.int64),
                                     "s": pd.Series([], dtype=np.float64),
                                     "n": pd.Series([], dtype=np.int64)})
            X = _matrix(df["embedding"].to_numpy())
            frames = []
            for si in range(mm):
                Xs = X[:, si * ss:(si + 1) * ss]
                a = _nearest_centroid(Xs, C_[si])
                sums = np.zeros((kk, ss))
                np.add.at(sums, a, Xs)
                cnt = np.bincount(a, minlength=kk).astype(np.int64)
                frames.append(pd.DataFrame({
                    "s_id": np.full(kk * ss, si, dtype=np.int64),
                    "c": np.repeat(np.arange(kk, dtype=np.int64), ss),
                    "dim": np.tile(np.arange(si * ss + 1, (si + 1) * ss + 1,
                                             dtype=np.int64), kk),
                    "s": sums.ravel(),
                    "n": np.repeat(cnt, ss),
                }))
            return pd.concat(frames, ignore_index=True)

        g = partial_groupby(ds.map_batches(partials, batch_format="pandas"),
                            ["s_id", "c", "dim"],
                            {"s": ("s", "sum"), "n": ("n", "sum")},
                            many_groups=True, num_buckets=num_buckets
                            ).to_pandas()
        si = g["s_id"].to_numpy(np.int64)
        ci = g["c"].to_numpy(np.int64)
        di = (g["dim"].to_numpy(np.int64) - 1) - si * sub
        sums = np.zeros((m, k, sub))
        sums[si, ci, di] = g["s"].to_numpy(np.float64)
        nvec = np.zeros((m, k), dtype=np.int64)
        first = di == 0
        nvec[si[first], ci[first]] = g["n"].to_numpy(np.int64)[first]
        nonempty = (nvec > 0)[:, :, None]
        C = np.where(nonempty, sums / np.maximum(nvec, 1)[:, :, None], C)
        counts = nvec

    return C, counts


def pq_sql(m: int = 4, k: int = 16, n_iters: int = 2, dim: int = 64) -> str:
    """The DuckDB oracle: m INDEPENDENT unrolled Lloyd chains (one per
    subspace, the kmeans_sql pattern on a dim slice), UNION ALL'd with
    their final member counts."""
    sub = dim // m
    parts = ["        WITH "]
    outs = []
    first = True
    for s in range(m):
        lo, hi = s * sub + 1, (s + 1) * sub
        pre = "" if first else ","
        first = False
        parts.append(f"""{pre}
        dims_{s} AS (SELECT range AS d FROM range({lo}, {hi + 1})),
        init_{s} AS (
            SELECT embedding, row_number() OVER (ORDER BY vec_id) - 1 AS c
            FROM embeddings ORDER BY vec_id LIMIT {k}
        ),
        c{s}_0 AS (SELECT i.c, dims_{s}.d, i.embedding[dims_{s}.d]::DOUBLE AS v
                   FROM init_{s} i, dims_{s})""")
        for t in range(n_iters):
            parts.append(f""",
        d{s}_{t} AS (
            SELECT e.vec_id, cc.c,
                   sum((e.embedding[cc.d]::DOUBLE - cc.v)
                       * (e.embedding[cc.d]::DOUBLE - cc.v)) AS dist
            FROM embeddings e, c{s}_{t} cc
            GROUP BY e.vec_id, cc.c
        ),
        a{s}_{t} AS (
            SELECT vec_id, c FROM (
                SELECT vec_id, c, row_number() OVER (
                    PARTITION BY vec_id ORDER BY round(dist, 9), c) AS rn
                FROM d{s}_{t}) WHERE rn = 1
        ),
        m{s}_{t} AS (
            SELECT a.c, dims_{s}.d, avg(e.embedding[dims_{s}.d]::DOUBLE) AS v
            FROM a{s}_{t} a JOIN embeddings e USING (vec_id), dims_{s}
            GROUP BY a.c, dims_{s}.d
        ),
        c{s}_{t + 1} AS (
            SELECT p.c, p.d, coalesce(mm.v, p.v) AS v
            FROM c{s}_{t} p LEFT JOIN m{s}_{t} mm
                 ON mm.c = p.c AND mm.d = p.d
        )""")
        outs.append(f"""
        SELECT {s} AS subspace, p.c AS code, p.d AS dim,
               round(p.v, 4) AS centroid,
               CAST(coalesce(n.n, 0) AS BIGINT) AS n
        FROM c{s}_{n_iters} p
        LEFT JOIN (SELECT c, count(*) AS n FROM a{s}_{n_iters - 1}
                   GROUP BY c) n ON n.c = p.c""")
    parts.append(" UNION ALL ".join(outs))
    parts.append("\n        ORDER BY subspace, code, dim")
    return "".join(parts)


def pq_adc_topk(sf_dir: str, m: int = 4, k: int = 16, n_iters: int = 2,
                n_queries: int = 5, topk: int = 10,
                num_buckets: int = 16) -> pd.DataFrame:
    """PQ ASYMMETRIC-DISTANCE top-k search (the scan half of IVF-PQ,
    Jegou et al. 2011): every corpus vector is compressed to m sub-space
    codes against the :func:`_pq_train` codebooks, and each query ranks
    neighbors by the ADC estimate — the sum over subspaces of the
    squared distance from the query's dim slice to the ASSIGNED centroid
    (the query side stays exact; only the corpus side is quantized).

    Parity contract: codebooks are ROUNDED to 4 dp before anything is
    encoded (both engines then hold bit-identical centroids — PQ
    codebooks are stored quantized in practice anyway), encoding uses
    the shared :func:`_nearest_centroid` 1e-9 quantized-grid rule per
    subspace, and the final ranking compares distances on the same grid
    with a neighbor_id tiebreak, so numpy-vs-DuckDB summation-order ulps
    cannot flip a rank.  Output is the (query_id, neighbor_id, adc_rank)
    set — the distance value itself is not part of the contract.

    Engine shape: the m x k x (dim/m) rounded codebooks and the
    n_queries x m x k ADC lookup tables broadcast once via ``ray.put``;
    per Arrow batch ONE vectorized pass encodes the batch (m small
    nearest-centroid argmins) and gathers per-query distances from the
    tables (pure fancy indexing + sum over subspaces — no per-row
    Python), keeping a local top-k per query; the driver merges the
    tiny per-batch candidate sets.  The corpus never shuffles."""
    import os

    import pyarrow.dataset as pads
    import pyarrow.parquet as pq

    from .common import _cached_get, sql_round

    C, _ = _pq_train(sf_dir, m, k, n_iters, num_buckets)
    Cq = sql_round(C.reshape(-1), 4).reshape(C.shape)
    mm, kk, sub = Cq.shape

    qt = pq.read_table(os.path.join(sf_dir, "embeddings.parquet"),
                       columns=["vec_id", "embedding"],
                       filters=pads.field("vec_id") < n_queries)
    qids = qt.column("vec_id").to_numpy()
    Q = _matrix(qt.column("embedding").to_pylist())  # nq x dim
    # ADC tables: T[q, s, c] = ||Q[q, slice_s] - Cq[s, c]||^2
    T = ((Q.reshape(len(qids), mm, 1, sub)
          - Cq[None, :, :, :]) ** 2).sum(axis=3)
    ref = ray.put((qids, T, Cq))

    ds = load(sf_dir, "embeddings", ["vec_id", "embedding"])

    def local_topk(df: pd.DataFrame) -> pd.DataFrame:
        qids, T, Cq = _cached_get(ref)
        mm, kk, ss = Cq.shape
        if not len(df):
            return pd.DataFrame({"query_id": pd.Series([], dtype=np.int64),
                                 "neighbor_id": pd.Series([], dtype=np.int64),
                                 "dist": pd.Series([], dtype=np.float64)})
        vid = df["vec_id"].to_numpy()
        X = _matrix(df["embedding"].to_numpy())
        codes = np.stack([_nearest_centroid(X[:, s * ss:(s + 1) * ss], Cq[s])
                          for s in range(mm)], axis=1)  # batch x m
        # dist[q, v] = sum_s T[q, s, codes[v, s]]
        dist = T[:, np.arange(mm)[None, :], codes].sum(axis=2)  # nq x batch
        out = []
        for qi, qid in enumerate(qids):
            row = np.floor(dist[qi] * 1e9 + 0.5)
            idx = np.flatnonzero(vid != qid)
            order = idx[np.lexsort((vid[idx], row[idx]))][: topk]
            out.append(pd.DataFrame({
                "query_id": np.full(len(order), qid, dtype=np.int64),
                "neighbor_id": vid[order].astype(np.int64),
                "dist": dist[qi][order]}))
        return pd.concat(out, ignore_index=True)

    cand = ds.map_batches(local_topk, batch_format="pandas").to_pandas()
    cand["grid"] = np.floor(cand["dist"].to_numpy() * 1e9 + 0.5)
    out = (cand.sort_values(["query_id", "grid", "neighbor_id"])
               .groupby("query_id", sort=True).head(topk))
    out["adc_rank"] = out.groupby("query_id").cumcount().astype(np.int64) + 1
    return out[["query_id", "neighbor_id", "adc_rank"]].reset_index(drop=True)


def pq_adc_sql(m: int = 4, k: int = 16, n_iters: int = 2,
               n_queries: int = 5, topk: int = 10, dim: int = 64) -> str:
    """The DuckDB oracle for :func:`pq_adc_topk`: the :func:`pq_sql`
    Lloyd chains produce the 4-dp-rounded codebooks, every corpus vector
    re-encodes against them (round(dist,9) grid, lowest-code tiebreak),
    and each query ranks sum-over-subspace ADC distances on the same
    grid with the neighbor_id tiebreak."""
    sub = dim // m
    parts = [f"""
        WITH cb AS ({pq_sql(m=m, k=k, n_iters=n_iters, dim=dim)}
        ),
        cbq AS (
            SELECT CAST(subspace AS BIGINT) AS s, code AS c, dim AS d,
                   centroid AS v
            FROM cb
        ),
        enc AS (
            SELECT vec_id, s, c FROM (
                SELECT e.vec_id, cq.s, cq.c,
                       row_number() OVER (
                           PARTITION BY e.vec_id, cq.s
                           ORDER BY round(sum(
                               (e.embedding[cq.d]::DOUBLE - cq.v)
                               * (e.embedding[cq.d]::DOUBLE - cq.v)), 9),
                               cq.c) AS rn
                FROM embeddings e, cbq cq
                GROUP BY e.vec_id, cq.s, cq.c
            ) WHERE rn = 1
        ),
        q AS (
            SELECT vec_id, embedding FROM embeddings
            WHERE vec_id < {n_queries}
        ),
        dist AS (
            SELECT q.vec_id AS query_id, en.vec_id AS neighbor_id,
                   sum((q.embedding[cq.d]::DOUBLE - cq.v)
                       * (q.embedding[cq.d]::DOUBLE - cq.v)) AS dist
            FROM q, enc en
            JOIN cbq cq ON cq.s = en.s AND cq.c = en.c
            WHERE en.vec_id <> q.vec_id
            GROUP BY q.vec_id, en.vec_id
        )
        SELECT query_id, neighbor_id, CAST(rn AS BIGINT) AS adc_rank
        FROM (
            SELECT query_id, neighbor_id,
                   row_number() OVER (
                       PARTITION BY query_id
                       ORDER BY round(dist, 9), neighbor_id) AS rn
            FROM dist
        ) WHERE rn <= {topk}
        ORDER BY query_id, adc_rank"""]
    return "".join(parts)


def ann_ivfpq_topk(sf_dir: str, n_cells: int = 8, cell_iters: int = 3,
                   m: int = 4, k: int = 16, pq_iters: int = 2,
                   n_probe: int = 2, n_queries: int = 5, topk: int = 10,
                   num_buckets: int = 16) -> pd.DataFrame:
    """IVF-PQ — the full published composition (Jegou et al. 2011 /
    FAISS ``IndexIVFPQ``): an IVF coarse quantizer restricts each query
    to its ``n_probe`` nearest cells, and PQ asymmetric distances rank
    the candidates inside them.  This variant encodes RAW vectors (the
    FAISS ``by_residual=False`` mode); the residual variant would need
    one codebook chain per cell in the SQL oracle — documented, not
    hidden.

    Parity contract (the pq_adc_topk + kmeans_clusters rules composed):
    the coarse centroids are kmeans_clusters' 4-dp-ROUNDED output and
    the PQ codebooks are rounded pre-encode, so both engines assign and
    encode against bit-identical constants; cell assignment, probe
    ranking (``row_number OVER (ORDER BY round(dist,9), c) <= n_probe``)
    and the final ADC ranking all compare on the 1e-9 grid with id
    tiebreaks.  Output: (query_id, neighbor_id, ivfpq_rank).

    Engine shape: coarse centroids, codebooks, per-query probe masks and
    ADC tables broadcast once; ONE map_batches pass over the corpus
    encodes the batch, assigns cells, masks each query to its probed
    cells and keeps a local top-k — zero shuffles, the corpus never
    reaches the driver (the candidate sets are topk rows per query per
    batch)."""
    import os

    import pyarrow.dataset as pads
    import pyarrow.parquet as pq

    from .common import _cached_get, sql_round

    cent = kmeans_clusters(sf_dir, k=n_cells, n_iters=cell_iters,
                           num_buckets=num_buckets)
    CC = (cent.pivot(index="cluster", columns="dim", values="centroid")
          .to_numpy())                                        # n_cells x dim
    C, _ = _pq_train(sf_dir, m, k, pq_iters, num_buckets)
    Cq = sql_round(C.reshape(-1), 4).reshape(C.shape)         # m x k x sub
    mm, kk, sub = Cq.shape

    qt = pq.read_table(os.path.join(sf_dir, "embeddings.parquet"),
                       columns=["vec_id", "embedding"],
                       filters=pads.field("vec_id") < n_queries)
    qids = qt.column("vec_id").to_numpy()
    Q = _matrix(qt.column("embedding").to_pylist())
    # probe sets: per query the n_probe nearest cells on the 1e-9 grid,
    # exact grid ties to the LOWEST cell id (ORDER BY round(dist,9), c)
    dq = ((Q[:, None, :] - CC[None, :, :]) ** 2).sum(axis=2)
    gq = np.floor(dq * 1e9 + 0.5)
    probe_mask = np.zeros((len(qids), CC.shape[0]), dtype=bool)
    for qi in range(len(qids)):
        cells = np.lexsort((np.arange(CC.shape[0]), gq[qi]))[:n_probe]
        probe_mask[qi, cells] = True
    T = ((Q.reshape(len(qids), mm, 1, sub) - Cq[None, :, :, :]) ** 2
         ).sum(axis=3)                                        # nq x m x k
    ref = ray.put((qids, T, Cq, CC, probe_mask))

    ds = load(sf_dir, "embeddings", ["vec_id", "embedding"])

    def local_topk(df: pd.DataFrame) -> pd.DataFrame:
        qids, T, Cq, CC, probe_mask = _cached_get(ref)
        mm, kk, ss = Cq.shape
        if not len(df):
            return pd.DataFrame({"query_id": pd.Series([], dtype=np.int64),
                                 "neighbor_id": pd.Series([], dtype=np.int64),
                                 "dist": pd.Series([], dtype=np.float64)})
        vid = df["vec_id"].to_numpy()
        X = _matrix(df["embedding"].to_numpy())
        cell = _nearest_centroid(X, CC)
        codes = np.stack([_nearest_centroid(X[:, s * ss:(s + 1) * ss], Cq[s])
                          for s in range(mm)], axis=1)
        dist = T[:, np.arange(mm)[None, :], codes].sum(axis=2)  # nq x batch
        out = []
        for qi, qid in enumerate(qids):
            idx = np.flatnonzero(probe_mask[qi, cell] & (vid != qid))
            if not len(idx):
                continue
            row = np.floor(dist[qi] * 1e9 + 0.5)
            order = idx[np.lexsort((vid[idx], row[idx]))][: topk]
            out.append(pd.DataFrame({
                "query_id": np.full(len(order), qid, dtype=np.int64),
                "neighbor_id": vid[order].astype(np.int64),
                "dist": dist[qi][order]}))
        if not out:
            return pd.DataFrame({"query_id": pd.Series([], dtype=np.int64),
                                 "neighbor_id": pd.Series([], dtype=np.int64),
                                 "dist": pd.Series([], dtype=np.float64)})
        return pd.concat(out, ignore_index=True)

    cand = ds.map_batches(local_topk, batch_format="pandas").to_pandas()
    if not len(cand):
        return pd.DataFrame({"query_id": pd.Series([], dtype=np.int64),
                             "neighbor_id": pd.Series([], dtype=np.int64),
                             "ivfpq_rank": pd.Series([], dtype=np.int64)})
    cand["grid"] = np.floor(cand["dist"].to_numpy() * 1e9 + 0.5)
    out = (cand.sort_values(["query_id", "grid", "neighbor_id"])
               .groupby("query_id", sort=True).head(topk))
    out["ivfpq_rank"] = out.groupby("query_id").cumcount().astype(np.int64) + 1
    return out[["query_id", "neighbor_id", "ivfpq_rank"]].reset_index(drop=True)


def ann_ivfpq_sql(n_cells: int = 8, cell_iters: int = 3, m: int = 4,
                  k: int = 16, pq_iters: int = 2, n_probe: int = 2,
                  n_queries: int = 5, topk: int = 10, dim: int = 64) -> str:
    """The DuckDB oracle for :func:`ann_ivfpq_topk`: kmeans_sql's unrolled
    Lloyd chain supplies the coarse centroids, pq_sql's chains the
    codebooks; every vector coarse-assigns and PQ-encodes in SQL, each
    query probes its top-``n_probe`` cells, and the ADC ranking is
    restricted to candidates whose assigned cell is probed."""
    return f"""
        WITH km AS ({kmeans_sql(k=n_cells, n_iters=cell_iters, dim=dim)}
        ),
        cc AS (SELECT cluster AS c, dim AS d, centroid AS v FROM km),
        ad AS (
            SELECT e.vec_id, cc.c,
                   sum((e.embedding[cc.d]::DOUBLE - cc.v)
                       * (e.embedding[cc.d]::DOUBLE - cc.v)) AS dist
            FROM embeddings e, cc
            GROUP BY e.vec_id, cc.c
        ),
        asg AS (
            SELECT vec_id, c AS cell FROM (
                SELECT vec_id, c, row_number() OVER (
                    PARTITION BY vec_id ORDER BY round(dist, 9), c) AS rn
                FROM ad) WHERE rn = 1
        ),
        probe AS (
            SELECT vec_id AS query_id, c AS cell FROM (
                SELECT vec_id, c, row_number() OVER (
                    PARTITION BY vec_id ORDER BY round(dist, 9), c) AS rn
                FROM ad WHERE vec_id < {n_queries}) WHERE rn <= {n_probe}
        ),
        cb AS ({pq_sql(m=m, k=k, n_iters=pq_iters, dim=dim)}
        ),
        cbq AS (
            SELECT CAST(subspace AS BIGINT) AS s, code AS c, dim AS d,
                   centroid AS v
            FROM cb
        ),
        enc AS (
            SELECT vec_id, s, c FROM (
                SELECT e.vec_id, cq.s, cq.c,
                       row_number() OVER (
                           PARTITION BY e.vec_id, cq.s
                           ORDER BY round(sum(
                               (e.embedding[cq.d]::DOUBLE - cq.v)
                               * (e.embedding[cq.d]::DOUBLE - cq.v)), 9),
                               cq.c) AS rn
                FROM embeddings e, cbq cq
                GROUP BY e.vec_id, cq.s, cq.c
            ) WHERE rn = 1
        ),
        q AS (
            SELECT vec_id, embedding FROM embeddings
            WHERE vec_id < {n_queries}
        ),
        dist AS (
            SELECT q.vec_id AS query_id, en.vec_id AS neighbor_id,
                   sum((q.embedding[cq.d]::DOUBLE - cq.v)
                       * (q.embedding[cq.d]::DOUBLE - cq.v)) AS dist
            FROM q, enc en
            JOIN cbq cq ON cq.s = en.s AND cq.c = en.c
            JOIN asg ON asg.vec_id = en.vec_id
            JOIN probe p ON p.query_id = q.vec_id AND p.cell = asg.cell
            WHERE en.vec_id <> q.vec_id
            GROUP BY q.vec_id, en.vec_id
        )
        SELECT query_id, neighbor_id, CAST(rn AS BIGINT) AS ivfpq_rank
        FROM (
            SELECT query_id, neighbor_id,
                   row_number() OVER (
                       PARTITION BY query_id
                       ORDER BY round(dist, 9), neighbor_id) AS rn
            FROM dist
        ) WHERE rn <= {topk}
        ORDER BY query_id, ivfpq_rank
    """


def embedding_sq8_stats(sf_dir: str, num_buckets: int = 16) -> pd.DataFrame:
    """SCALAR QUANTIZATION (SQ8) of the embedding column — the third
    standard ANN compression next to flat (ann_bruteforce) and PQ
    (pq_codebooks): each dimension maps linearly onto one uint8 code
    against its global [min, max] range (the FAISS ``ScalarQuantizer``
    QT_8bit shape), and the output certifies the codec per dimension:
    the trained range and the mean squared reconstruction error.

    Parity contract: codes are computed with the IDENTICAL FP expression
    on both engines — ``round((v - mn) / (mx - mn) * 255)`` half-away,
    clipped to [0, 255] — so the code of every (vector, dim) is
    bit-identical (single IEEE op sequence, no summation involved); only
    the MSE is a sum, rounded to 6 dp like embedding_covariance.

    Engine shape: pass 1 emits per-batch per-dim (min, max) partials
    (d rows per batch); the 64-row range table broadcasts via ``ray.put``;
    pass 2 quantizes each batch vectorized and emits per-dim squared-error
    partials.  Two metadata-sized reduces, zero driver materialization of
    vectors.  Pytest pins the mse <= step^2/4 bound the uniform quantizer
    guarantees."""
    from .common import _cached_get, partial_groupby, sql_round

    ds = load(sf_dir, "embeddings", ["embedding"])

    def range_partials(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            return pd.DataFrame({"dim": pd.Series([], dtype=np.int64),
                                 "mn": pd.Series([], dtype=np.float64),
                                 "mx": pd.Series([], dtype=np.float64)})
        E = _matrix(df["embedding"].to_numpy())
        d = E.shape[1]
        return pd.DataFrame({"dim": np.arange(1, d + 1, dtype=np.int64),
                             "mn": E.min(axis=0), "mx": E.max(axis=0)})

    rng = partial_groupby(
        ds.map_batches(range_partials, batch_format="pandas"), ["dim"],
        {"mn": ("mn", "min"), "mx": ("mx", "max")}, many_groups=True,
        num_buckets=num_buckets).to_pandas().sort_values("dim")
    mn = rng["mn"].to_numpy(np.float64)
    mx = rng["mx"].to_numpy(np.float64)
    ref = ray.put((mn, mx))

    def err_partials(df: pd.DataFrame) -> pd.DataFrame:
        mn, mx = _cached_get(ref)
        d = len(mn)
        if not len(df):
            return pd.DataFrame({"dim": pd.Series([], dtype=np.int64),
                                 "sse": pd.Series([], dtype=np.float64),
                                 "n": pd.Series([], dtype=np.int64)})
        E = _matrix(df["embedding"].to_numpy())
        denom = np.where(mx == mn, 1.0, mx - mn)
        code = sql_round(np.where(mx == mn, 0.0, (E - mn) / denom * 255), 0)
        code = np.clip(code, 0.0, 255.0)
        dq = mn + code * (mx - mn) / 255
        err = E - dq
        return pd.DataFrame({
            "dim": np.arange(1, d + 1, dtype=np.int64),
            "sse": (err * err).sum(axis=0),
            "n": np.full(d, len(E), dtype=np.int64)})

    agg = partial_groupby(
        ds.map_batches(err_partials, batch_format="pandas"), ["dim"],
        {"sse": ("sse", "sum"), "n": ("n", "sum")}, many_groups=True,
        num_buckets=num_buckets).to_pandas().sort_values("dim")
    return pd.DataFrame({
        "dim": agg["dim"].to_numpy(np.int64),
        "qmin": sql_round(pd.Series(mn), 6),
        "qmax": sql_round(pd.Series(mx), 6),
        "mse": sql_round(agg["sse"].to_numpy() / agg["n"].to_numpy(), 6),
        "n": agg["n"].to_numpy(np.int64),
    }).reset_index(drop=True)


def mutual_knn_pairs(sf_dir: str, k: int = 5,
                     num_buckets: int = 8) -> rd.Dataset:
    """MUTUAL k-NN pairs: (a, b) where each vector is in the OTHER's exact
    top-k cosine neighborhood — the reciprocal-neighbor criterion that
    semantic-dedup and coreset pipelines prefer over one-sided kNN edges
    (one-sided edges over-connect hubs; mutuality is the standard
    hubness filter).

    Engine shape: the knn_graph edge stream is folded to UNORDERED pair
    keys inside the same batch pass, then one bucketed count-reduce —
    a pair is mutual iff its unordered key appears exactly twice (each
    direction contributes one edge; neighbor lists cannot repeat an id).
    No driver materialization: the result stays a Dataset."""
    from .common import partial_groupby

    edges = knn_graph(sf_dir, k)

    def undirect(b: pd.DataFrame) -> pd.DataFrame:
        a = b["vec_id"].to_numpy(np.int64)
        c = b["neighbor_id"].to_numpy(np.int64)
        return pd.DataFrame({"id_lo": np.minimum(a, c),
                             "id_hi": np.maximum(a, c)})

    cnt = partial_groupby(
        edges, ["id_lo", "id_hi"], {"n_dir": ("id_lo", "count")},
        prep=undirect, many_groups=True, num_buckets=num_buckets)
    return cnt.map_batches(
        lambda df: df.loc[df["n_dir"] == 2, ["id_lo", "id_hi"]],
        batch_format="pandas")


def mutual_knn_pairs_sql(k: int = 5) -> str:
    """Oracle: the knn_graph all-pairs window CTE joined against its own
    reversed edges."""
    return f"""
        WITH knn AS (
            SELECT vec_id, neighbor_id FROM (
                SELECT q.vec_id, e.vec_id AS neighbor_id,
                       row_number() OVER (PARTITION BY q.vec_id
                           ORDER BY list_cosine_similarity(q.embedding,
                                                           e.embedding) DESC,
                                    e.vec_id) AS rn
                FROM embeddings q JOIN embeddings e
                     ON e.vec_id <> q.vec_id) t
            WHERE rn <= {k}
        )
        SELECT a.vec_id AS id_lo, a.neighbor_id AS id_hi
        FROM knn a JOIN knn b ON a.vec_id = b.neighbor_id
                             AND a.neighbor_id = b.vec_id
        WHERE a.vec_id < a.neighbor_id
    """


KC_K = 8   # coreset size (selection rounds); row k is the residual radius


def kcenter_coreset(sf_dir: str, k: int = KC_K) -> pd.DataFrame:
    """K-CENTER CORESET by farthest-first traversal (Gonzalez 1985) —
    the 2-approximation diversity sampler training-data curation uses to
    pick maximally-spread exemplars: seed with the smallest vec_id, then
    k-1 times add the vector FARTHEST (squared euclidean) from the
    chosen set; a final un-added round reports the residual coverage
    radius, so the output's radius column IS the coverage guarantee
    (non-increasing, and every point is within radius_sq[k] of some
    center).  Per-center distances round to the 1e-9 grid before the
    min/argmax (the kmeans_sql comparison idiom) so FP summation order
    can't flip a selection; ties break to the smaller vec_id.

    Scale shape: k+1 streamed passes, each one map_batches over the
    embeddings with the (<= k x 64) center matrix broadcast — per batch
    one vectorized distance block and ONE candidate row out; the driver
    folds #batches rows per round.  No shuffle anywhere."""
    import os

    import pyarrow.parquet as pq

    from .common import _cached_get, _require_rows, sql_round

    _require_rows(os.path.join(sf_dir, "embeddings.parquet"), "embeddings")
    pf = pq.ParquetFile(os.path.join(sf_dir, "embeddings.parquet"))
    seed_id = min(pf.metadata.row_group(i).column(0).statistics.min
                  for i in range(pf.metadata.num_row_groups))
    seed = pq.read_table(os.path.join(sf_dir, "embeddings.parquet"),
                         columns=["vec_id", "embedding"],
                         filters=[("vec_id", "==", seed_id)])
    centers = _matrix(seed.column("embedding").to_pylist()).astype(np.float64)
    rows = [(0, int(seed_id), 0.0)]

    ds = load(sf_dir, "embeddings", ["vec_id", "embedding"])
    for r in range(1, k + 1):
        ref = ray.put(centers)

        def far(df: pd.DataFrame) -> pd.DataFrame:
            C = _cached_get(ref)
            ids = df["vec_id"].to_numpy(np.int64)
            X = _matrix(df["embedding"].to_numpy()).astype(np.float64)
            D = ((X[:, None, :] - C[None, :, :]) ** 2).sum(axis=2)
            mind = sql_round(D, 9).min(axis=1)
            i = int(np.lexsort((ids, -mind))[0])
            return pd.DataFrame({"vec_id": [ids[i]], "mind": [mind[i]],
                                 "embedding": [X[i].tolist()]})

        w = (ds.map_batches(far, batch_format="pandas").to_pandas()
             .sort_values(["mind", "vec_id"], ascending=[False, True])
             .iloc[0])
        rows.append((r, int(w["vec_id"]), float(w["mind"])))
        if r < k:     # round k only measures the residual radius
            centers = np.vstack([centers,
                                 np.asarray(w["embedding"], np.float64)])

    out = pd.DataFrame(rows, columns=["sel_round", "vec_id", "radius_sq"])
    return pd.DataFrame({
        "sel_round": out["sel_round"].to_numpy(np.int64),
        "vec_id": out["vec_id"].to_numpy(np.int64),
        "radius_sq": sql_round(out["radius_sq"].to_numpy(), 6)})


def kcenter_coreset_sql(k: int = KC_K, dim: int = 64) -> str:
    """Oracle: the farthest-first loop unrolled — per round a long-form
    distance sum to every chosen center, the identical round-to-1e-9
    min, and an (mind desc, vec_id) LIMIT 1 argmax."""
    parts = [f"""
        WITH dims AS MATERIALIZED (SELECT range AS d FROM range(1, {dim + 1})),
        s0 AS MATERIALIZED (
            SELECT vec_id, embedding FROM embeddings
            ORDER BY vec_id LIMIT 1
        ),
        call0 AS MATERIALIZED (
            SELECT s0.vec_id, dims.d, s0.embedding[dims.d]::DOUBLE AS v
            FROM s0, dims
        )"""]
    for t in range(1, k + 1):
        parts.append(f""",
        dd{t} AS MATERIALIZED (
            SELECT e.vec_id, c.vec_id AS cid,
                   round(sum((e.embedding[c.d]::DOUBLE - c.v)
                             * (e.embedding[c.d]::DOUBLE - c.v)), 9)
                       AS dist
            FROM embeddings e, call{t - 1} c
            GROUP BY 1, 2
        ),
        w{t} AS MATERIALIZED (
            SELECT vec_id, min(dist) AS mind FROM dd{t}
            GROUP BY vec_id ORDER BY mind DESC, vec_id LIMIT 1
        )""")
        if t < k:
            parts.append(f""",
        call{t} AS MATERIALIZED (
            SELECT * FROM call{t - 1}
            UNION ALL
            SELECT e.vec_id, dims.d, e.embedding[dims.d]::DOUBLE AS v
            FROM w{t} JOIN embeddings e USING (vec_id), dims
        )""")
    sel = " UNION ALL ".join(
        [f"SELECT 0::BIGINT AS sel_round, (SELECT vec_id FROM s0) AS vec_id, "
         f"0.0 AS radius_sq"]
        + [f"SELECT {t}::BIGINT, (SELECT vec_id FROM w{t}), "
           f"round((SELECT mind FROM w{t}), 6)" for t in range(1, k + 1)])
    parts.append(f"""
        SELECT * FROM ({sel}) ORDER BY sel_round""")
    return "".join(parts)


SRP_BITS = 16      # signature width (two 8-bit bands)
SRP_SCALE = 10_000  # fixed-point grid: projections are EXACT integers


def srp_band_candidates(sf_dir: str, num_buckets: int = 8) -> rd.Dataset:
    """SIGN-RANDOM-PROJECTION LSH (Charikar 2002) over the embedding
    column — the cosine-similarity sketch that completes the LSH family
    here (minhash: sets, simhash: token streams, SRP: dense vectors).
    Each vector gets a 16-bit signature: bit b is the sign of
    sum_d sgn(b, d) * round(e_d * 10^4), with sgn(b, d) in {-1, +1}
    from an md5 parity bit.  The FIXED-POINT grid is the parity move:
    the projection is an exact int64 on both engines, so a sign can
    never flip on FP summation order (a raw-float dot product would
    make bucket membership FP-fragile).  Candidates are pairs agreeing
    on either 8-bit band (the banding trade: agreeing half the
    signature ~ cosine >= cos(pi/8) whp); each pair carries the full
    signature hamming distance as its similarity rank.

    Scale shape: signatures are one map_batches pass (16x64 integer
    matrix broadcast-free — sgn derives from md5 inside the task);
    candidate generation is a (band_id, band_value)-keyed exchange with
    within-bucket pair expansion; cross-band dedup is one bucketed
    min-reduce.  Nothing driver-side beyond the result set."""
    import hashlib

    from .common import keyed_map_groups, partial_groupby

    half = SRP_BITS // 2
    sgn = np.array([[1 if int(hashlib.md5(f"{b}|{d}".encode())
                              .hexdigest()[:13], 16) % 2 == 0 else -1
                     for d in range(64)] for b in range(SRP_BITS)],
                   dtype=np.int64)

    ds = load(sf_dir, "embeddings", ["vec_id", "embedding"])

    def signatures(df: pd.DataFrame) -> pd.DataFrame:
        from .common import sql_round

        X = _matrix(df["embedding"].to_numpy()).astype(np.float64)
        XI = (np.sign(X) * np.floor(np.abs(X) * SRP_SCALE + 0.5)
              ).astype(np.int64)                    # exact fixed-point
        P = XI @ sgn.T                               # (batch, bits) int64
        bits = (P > 0).astype(np.int64)
        weights = (1 << np.arange(SRP_BITS, dtype=np.int64))
        sig = bits @ weights
        return pd.DataFrame({
            "vec_id": df["vec_id"].to_numpy(np.int64),
            "sig": sig,
            "band0": sig & ((1 << half) - 1),
            "band1": sig >> half})

    sigs = ds.map_batches(signatures, batch_format="pandas")

    def explode_bands(b: pd.DataFrame) -> pd.DataFrame:
        return pd.concat([
            pd.DataFrame({"band_id": np.int64(0),
                          "band_val": b["band0"].to_numpy(np.int64),
                          "vec_id": b["vec_id"].to_numpy(np.int64),
                          "sig": b["sig"].to_numpy(np.int64)}),
            pd.DataFrame({"band_id": np.int64(1),
                          "band_val": b["band1"].to_numpy(np.int64),
                          "vec_id": b["vec_id"].to_numpy(np.int64),
                          "sig": b["sig"].to_numpy(np.int64)}),
        ], ignore_index=True).assign(
            key=lambda d: d["band_id"] * (1 << half) + d["band_val"])

    def bucket_pairs(g: pd.DataFrame) -> pd.DataFrame:
        outs = []
        for _k, grp in g.groupby("key", sort=False):
            if len(grp) < 2:
                continue
            from ..functions.imaging import _popcount64

            ids = np.sort(grp["vec_id"].to_numpy(np.int64))
            sig = grp.set_index("vec_id")["sig"]
            i, j = np.triu_indices(len(ids), k=1)
            ham = _popcount64(np.bitwise_xor(
                sig[ids[i]].to_numpy(np.int64),
                sig[ids[j]].to_numpy(np.int64)))
            outs.append(pd.DataFrame({"id_lo": ids[i], "id_hi": ids[j],
                                      "hamming": ham.astype(np.int64)}))
        if not outs:
            return pd.DataFrame({"id_lo": pd.Series([], dtype=np.int64),
                                 "id_hi": pd.Series([], dtype=np.int64),
                                 "hamming": pd.Series([], dtype=np.int64)})
        return pd.concat(outs, ignore_index=True)

    cand = keyed_map_groups(sigs.map_batches(explode_bands,
                                             batch_format="pandas"),
                            "key", bucket_pairs, num_buckets)
    # cross-band dedup: a pair agreeing on both bands appears twice
    return partial_groupby(cand, ["id_lo", "id_hi"],
                           {"hamming": ("hamming", "min")},
                           many_groups=True, num_buckets=num_buckets)


def srp_band_candidates_sql() -> str:
    """Oracle: identical md5-parity sign matrix, fixed-point projection
    sums (exact integers), band split, band-equality self-join, distinct
    pairs with the xor-popcount hamming."""
    half = SRP_BITS // 2
    return f"""
        WITH dims AS (SELECT range AS d FROM range(0, 64)),
        bits AS (SELECT range AS b FROM range(0, {SRP_BITS})),
        sg AS (
            SELECT b, d,
                   CASE WHEN CAST(concat('0x', substr(md5(
                            CAST(b AS VARCHAR) || '|' || CAST(d AS VARCHAR)),
                            1, 13)) AS BIGINT) % 2 = 0
                        THEN 1 ELSE -1 END AS s
            FROM bits, dims
        ),
        proj AS (
            SELECT e.vec_id, sg.b,
                   sum(round(e.embedding[sg.d + 1]::DOUBLE * {SRP_SCALE}, 0)
                       * sg.s)::BIGINT AS p
            FROM embeddings e, sg
            GROUP BY 1, 2
        ),
        sig AS (
            SELECT vec_id,
                   sum(CASE WHEN p > 0 THEN 1::BIGINT << b
                            ELSE 0 END)::BIGINT AS sig
            FROM proj GROUP BY vec_id
        ),
        banded AS (
            SELECT vec_id, sig, sig & {(1 << half) - 1} AS band0,
                   sig >> {half} AS band1
            FROM sig
        ),
        pairs AS (
            SELECT a.vec_id AS id_lo, b.vec_id AS id_hi,
                   bit_count(xor(a.sig, b.sig))::BIGINT AS hamming
            FROM banded a JOIN banded b
                 ON a.vec_id < b.vec_id AND a.band0 = b.band0
            UNION
            SELECT a.vec_id, b.vec_id, bit_count(xor(a.sig, b.sig))::BIGINT
            FROM banded a JOIN banded b
                 ON a.vec_id < b.vec_id AND a.band1 = b.band1
        )
        SELECT id_lo, id_hi, min(hamming)::BIGINT AS hamming
        FROM pairs GROUP BY 1, 2
    """


MRL_PREFIX = 16   # Matryoshka prefix dims
MRL_QUERIES = 20
MRL_K = 10


def matryoshka_recall(sf_dir: str, prefix: int = MRL_PREFIX,
                      n_queries: int = MRL_QUERIES,
                      k: int = MRL_K) -> pd.DataFrame:
    """MATRYOSHKA-PREFIX retrieval quality (Kusupati et al. 2022): how
    much of the exact full-dimension top-k survives when ranking by only
    the first ``prefix`` dims — the measurement behind the
    shortlist-with-a-prefix / rerank-with-full-dims serving pattern
    (prefix scan costs prefix/dim of the memory bandwidth).  Output is
    the per-query overlap + recall with the mean replicated — the
    go/no-go number for enabling prefix shortlisting on this corpus.

    Engine shape: ONE streamed pass computes both rankings (two matmuls
    per batch against the broadcast query matrix — full and prefix);
    per-batch candidates merge driver-side exactly like
    ann_bruteforce_topk.  Contract is the neighbor-id SETS (the
    established FP-rank convention), so recall is a ratio of integers."""
    import os

    import pyarrow.dataset as pads
    import pyarrow.parquet as pq

    from .common import _cached_get, sql_round

    qt = pq.read_table(os.path.join(sf_dir, "embeddings.parquet"),
                       columns=["vec_id", "embedding"],
                       filters=pads.field("vec_id") < n_queries)
    qids = qt.column("vec_id").to_numpy()
    Q = _matrix(qt.column("embedding").to_pylist())
    Qf = Q / np.linalg.norm(Q, axis=1, keepdims=True)
    Qp = Q[:, :prefix] / np.linalg.norm(Q[:, :prefix], axis=1,
                                        keepdims=True)
    ref = ray.put((qids, Qf, Qp))

    ds = load(sf_dir, "embeddings", ["vec_id", "embedding"])

    def local_topk(df: pd.DataFrame) -> pd.DataFrame:
        qids, Qf, Qp = _cached_get(ref)
        vid = df["vec_id"].to_numpy(np.int64)
        E = _matrix(df["embedding"].to_numpy())
        Ef = E / np.linalg.norm(E, axis=1, keepdims=True)
        Ep = E[:, :Qp.shape[1]] / np.linalg.norm(
            E[:, :Qp.shape[1]], axis=1, keepdims=True)
        rows = []
        for tag, cos in (("full", Qf @ Ef.T), ("pre", Qp @ Ep.T)):
            for qi, qid in enumerate(qids):
                m = np.flatnonzero(vid != qid)
                if not len(m):
                    continue
                order = m[np.lexsort((vid[m], -cos[qi][m]))][:k]
                rows.append(pd.DataFrame({
                    "tag": tag, "qid": np.int64(qid),
                    "nid": vid[order], "cos": cos[qi][order]}))
        return pd.concat(rows, ignore_index=True)

    cand = (ds.map_batches(local_topk, batch_format="pandas")
            .to_pandas())
    out = []
    for qid in sorted(set(int(q) for q in qids)):
        sets = {}
        for tag in ("full", "pre"):
            c = cand[(cand["tag"] == tag) & (cand["qid"] == qid)]
            c = c.sort_values(["cos", "nid"],
                              ascending=[False, True]).head(k)
            sets[tag] = set(c["nid"].astype(int))
        ov = len(sets["full"] & sets["pre"])
        out.append((qid, ov, float(sql_round(ov / k, 4))))
    res = pd.DataFrame(out, columns=["query_id", "n_overlap", "recall"])
    mean = float(sql_round(res["n_overlap"].sum()
                           / (k * len(res)), 4))
    return res.astype({"query_id": np.int64,
                       "n_overlap": np.int64}).assign(mean_recall=mean)


def matryoshka_recall_sql(prefix: int = MRL_PREFIX,
                          n_queries: int = MRL_QUERIES,
                          k: int = MRL_K) -> str:
    """Oracle: both rankings via list_cosine_similarity windows (full
    list vs the [1:prefix] slice), overlap join, integer recall."""
    return f"""
        WITH q AS (
            SELECT vec_id AS qid, embedding AS qe FROM embeddings
            WHERE vec_id < {n_queries}
        ),
        f AS (
            SELECT qid, nid FROM (
                SELECT q.qid, e.vec_id AS nid,
                       row_number() OVER (PARTITION BY q.qid
                           ORDER BY list_cosine_similarity(q.qe,
                                        e.embedding) DESC,
                                    e.vec_id) AS rn
                FROM q JOIN embeddings e ON e.vec_id <> q.qid) t
            WHERE rn <= {k}
        ),
        p AS (
            SELECT qid, nid FROM (
                SELECT q.qid, e.vec_id AS nid,
                       row_number() OVER (PARTITION BY q.qid
                           ORDER BY list_cosine_similarity(
                                        q.qe[1:{prefix}],
                                        e.embedding[1:{prefix}]) DESC,
                                    e.vec_id) AS rn
                FROM q JOIN embeddings e ON e.vec_id <> q.qid) t
            WHERE rn <= {k}
        ),
        ov AS (
            SELECT f.qid, count(*)::BIGINT AS n_overlap
            FROM f JOIN p ON p.qid = f.qid AND p.nid = f.nid
            GROUP BY f.qid
        )
        SELECT q.qid::BIGINT AS query_id,
               coalesce(ov.n_overlap, 0) AS n_overlap,
               round(coalesce(ov.n_overlap, 0) / {k}.0, 4) AS recall,
               round((SELECT sum(n_overlap) FROM ov)
                     / ({k}.0 * (SELECT count(*) FROM q)), 4)
                   AS mean_recall
        FROM q LEFT JOIN ov USING (qid)
    """


def knn_hubness(sf_dir: str, k: int = 5,
                num_buckets: int = 8) -> pd.DataFrame:
    """k-OCCURRENCE HUBNESS profile (Radovanovic et al. 2010): the
    in-degree distribution of the exact kNN graph — how often each
    vector appears in OTHERS' top-k lists.  High-dimensional spaces
    grow hubs (in-degree far above k) and anti-hubs (never retrieved);
    the skew is the standard diagnostic before trusting kNN-based
    dedup or retrieval.  Output: one row per in-degree with the vector
    count, plus max in-degree, anti-hub count and the integer-form Gini
    of the in-degree distribution (the crawl_skew_stats rank formula)
    replicated — all counts exact.

    Scale shape: knn_graph streams the edges; in-degrees are one
    neighbor-keyed count reduce; the profile folds on the in-degree
    histogram (bounded by max in-degree)."""
    from .common import partial_groupby, sql_round

    edges = knn_graph(sf_dir, k)
    ind = partial_groupby(edges, ["neighbor_id"],
                          {"ind": ("neighbor_id", "count")},
                          many_groups=True,
                          num_buckets=num_buckets).to_pandas()
    import os

    import pyarrow.parquet as pq

    n_vecs = pq.ParquetFile(os.path.join(
        sf_dir, "embeddings.parquet")).metadata.num_rows
    n_antihub = int(n_vecs - len(ind))
    degs = np.concatenate([ind["ind"].to_numpy(np.int64),
                           np.zeros(n_antihub, dtype=np.int64)])
    degs.sort()
    n = len(degs)
    t = int(degs.sum())
    num = 2 * sum(int(i + 1) * int(v) for i, v in enumerate(degs)) \
        - (n + 1) * t
    gini = float(sql_round(num / (n * t), 6)) if t else 0.0

    hist = (pd.Series(degs).value_counts().sort_index())
    return pd.DataFrame({
        "in_degree": hist.index.to_numpy(np.int64),
        "n_vectors": hist.to_numpy(np.int64),
        "max_in_degree": np.full(len(hist), np.int64(degs.max())),
        "n_antihubs": np.full(len(hist), np.int64(n_antihub)),
        "gini": np.full(len(hist), gini)})


def knn_hubness_sql(k: int = 5) -> str:
    """Oracle: the knn window CTE reduced to in-degrees (zeros filled
    from the full vector set), the identical integer-rank Gini."""
    return f"""
        WITH knn AS (
            SELECT vec_id, neighbor_id FROM (
                SELECT q.vec_id, e.vec_id AS neighbor_id,
                       row_number() OVER (PARTITION BY q.vec_id
                           ORDER BY list_cosine_similarity(q.embedding,
                                        e.embedding) DESC,
                                    e.vec_id) AS rn
                FROM embeddings q JOIN embeddings e
                     ON e.vec_id <> q.vec_id) t
            WHERE rn <= {k}
        ),
        ind AS (
            SELECT v.vec_id,
                   coalesce(c.n, 0)::BIGINT AS ind
            FROM embeddings v LEFT JOIN (
                SELECT neighbor_id, count(*)::BIGINT AS n FROM knn
                GROUP BY 1) c ON c.neighbor_id = v.vec_id
        ),
        rk AS (SELECT ind, row_number() OVER (ORDER BY ind, vec_id)
                          AS r FROM ind),
        g AS (
            SELECT CASE WHEN sum(ind) = 0 THEN 0.0
                        ELSE round((2 * sum(r * ind)
                                    - (count(*) + 1) * sum(ind))
                                   / (count(*)::DOUBLE * sum(ind)), 6)
                   END AS gini,
                   max(ind) AS mx,
                   sum(CASE WHEN ind = 0 THEN 1 ELSE 0 END) AS n_anti
            FROM rk
        )
        SELECT ind AS in_degree, count(*)::BIGINT AS n_vectors,
               (SELECT mx FROM g)::BIGINT AS max_in_degree,
               (SELECT n_anti FROM g)::BIGINT AS n_antihubs,
               (SELECT gini FROM g) AS gini
        FROM ind GROUP BY ind
    """


JL_K = 16        # projected dims
JL_PAIRS = 200   # audited pairs: (2i, 2i+1) for vec_id < 400


def jl_distortion_audit(sf_dir: str, k: int = JL_K,
                        n_pairs: int = JL_PAIRS,
                        num_buckets: int = 8) -> pd.DataFrame:
    """JOHNSON-LINDENSTRAUSS DISTORTION AUDIT: how well a +-1 random
    projection to ``k`` dims preserves pairwise squared distances —
    the measurement behind every "project then cluster/dedup cheaper"
    shortcut (the JL lemma promises (1 +- eps) whp; this prints the
    actual distortion distribution for THIS corpus and projection).
    The sign matrix derives from md5 parities and coordinates sit on
    the SRP fixed-point grid, so projected and full squared distances
    are EXACT integers and distortion = (d2_proj / k) / d2_full is one
    rounded division — parity has no FP surface.  Audited pairs are the
    fixed (2i, 2i+1) set; each row carries both distances, the
    distortion, and the replicated fraction of pairs inside 1 +- 0.5.

    Scale shape: a pushdown read of the audited rows, one pair-keyed
    exchange, vectorized integer math per pair."""
    import hashlib

    import pyarrow.dataset as pads
    import pyarrow.parquet as pq
    import os

    from .common import _require_rows, keyed_map_groups, sql_round

    _require_rows(os.path.join(sf_dir, "embeddings.parquet"), "embeddings")
    R = np.array([[1 if int(hashlib.md5(f"jl|{r}|{d}".encode())
                            .hexdigest()[:13], 16) % 2 == 0 else -1
                   for d in range(64)] for r in range(k)],
                 dtype=np.int64)

    t = pq.read_table(os.path.join(sf_dir, "embeddings.parquet"),
                      columns=["vec_id", "embedding"],
                      filters=pads.field("vec_id") < 2 * n_pairs)
    import ray.data as _rd

    ds = _rd.from_arrow(t)

    def rowcalc(df: pd.DataFrame) -> pd.DataFrame:
        X = _matrix(df["embedding"].to_numpy()).astype(np.float64)
        XI = (np.sign(X) * np.floor(np.abs(X) * SRP_SCALE + 0.5)
              ).astype(np.int64)
        Y = XI @ R.T
        return pd.DataFrame({
            "pair": df["vec_id"].to_numpy(np.int64) // 2,
            "side": df["vec_id"].to_numpy(np.int64) % 2,
            "xi": [r.tolist() for r in XI],
            "y": [r.tolist() for r in Y]})

    def per_pair(g: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for p, grp in g.groupby("pair", sort=False):
            if len(grp) != 2:
                continue
            grp = grp.sort_values("side")
            xa = np.asarray(grp["xi"].iloc[0], dtype=np.int64)
            xb = np.asarray(grp["xi"].iloc[1], dtype=np.int64)
            ya = np.asarray(grp["y"].iloc[0], dtype=np.int64)
            yb = np.asarray(grp["y"].iloc[1], dtype=np.int64)
            d2f = int(((xa - xb) ** 2).sum())
            d2p = int(((ya - yb) ** 2).sum())
            rows.append((int(p), d2f, d2p))
        return pd.DataFrame(rows, columns=["pair", "d2_full", "d2_proj"]
                            ).astype(np.int64)

    out = (keyed_map_groups(
        ds.map_batches(rowcalc, batch_format="pandas"), "pair",
        per_pair, num_buckets).to_pandas()
        .sort_values("pair").reset_index(drop=True))
    dist = (out["d2_proj"].to_numpy(np.float64) / k
            / out["d2_full"].to_numpy(np.float64))
    ok = ((dist >= 0.5) & (dist <= 1.5))
    return pd.DataFrame({
        "pair": out["pair"].to_numpy(np.int64),
        "d2_full": out["d2_full"].to_numpy(np.int64),
        "d2_proj": out["d2_proj"].to_numpy(np.int64),
        "distortion": sql_round(dist, 6),
        "frac_within_half": np.full(
            len(out), float(sql_round(ok.sum() / len(out), 4)))})


def jl_distortion_audit_sql(k: int = JL_K,
                            n_pairs: int = JL_PAIRS) -> str:
    """Oracle: identical md5-parity signs, fixed-point coordinates,
    integer distances, one rounded division."""
    return f"""
        WITH dims AS (SELECT range AS d FROM range(0, 64)),
        rows_ AS (SELECT range AS r FROM range(0, {k})),
        sg AS (
            SELECT r, d,
                   CASE WHEN CAST(concat('0x', substr(md5('jl|'
                            || CAST(r AS VARCHAR) || '|'
                            || CAST(d AS VARCHAR)), 1, 13)) AS BIGINT)
                            % 2 = 0
                        THEN 1 ELSE -1 END AS s
            FROM rows_, dims
        ),
        xi AS (
            SELECT vec_id, d.d,
                   CAST(round(embedding[d.d + 1]::DOUBLE
                              * {SRP_SCALE}, 0) AS BIGINT) AS x
            FROM embeddings, dims d WHERE vec_id < {2 * n_pairs}
        ),
        y AS (
            SELECT xi.vec_id, sg.r, sum(xi.x * sg.s)::BIGINT AS v
            FROM xi JOIN sg ON sg.d = xi.d
            GROUP BY 1, 2
        ),
        df AS (
            SELECT a.vec_id // 2 AS pair,
                   sum((a.x - b.x) * (a.x - b.x))::BIGINT AS d2_full
            FROM xi a JOIN xi b ON b.vec_id = a.vec_id + 1
                              AND b.d = a.d
            WHERE a.vec_id % 2 = 0 GROUP BY 1
        ),
        dp AS (
            SELECT a.vec_id // 2 AS pair,
                   sum((a.v - b.v) * (a.v - b.v))::BIGINT AS d2_proj
            FROM y a JOIN y b ON b.vec_id = a.vec_id + 1 AND b.r = a.r
            WHERE a.vec_id % 2 = 0 GROUP BY 1
        ),
        j AS (
            SELECT df.pair, df.d2_full, dp.d2_proj,
                   round(dp.d2_proj / {k}.0 / df.d2_full, 6)
                       AS distortion,
                   dp.d2_proj / {k}.0 / df.d2_full AS raw
            FROM df JOIN dp USING (pair)
        )
        SELECT pair::BIGINT AS pair, d2_full, d2_proj, distortion,
               round((SELECT sum(CASE WHEN raw >= 0.5 AND raw <= 1.5
                                      THEN 1 ELSE 0 END) FROM j)
                     / (SELECT count(*) FROM j)::DOUBLE, 4)
                   AS frac_within_half
        FROM j
    """


def embedding_isotropy(sf_dir: str) -> pd.DataFrame:
    """EMBEDDING ISOTROPY via the participation ratio — how evenly
    variance spreads across directions: PR = trace(C)^2 / (d * ||C||_F^2)
    is 1/d-to-1 normalized "effective dimensions / d", computable from
    the covariance ALONE (trace and Frobenius norm need no eigensolve,
    so the whole statistic is one moment pass + a 64x64 fold) —
    anisotropic (collapsed) embedding spaces break cosine retrieval and
    this is the standard first check.  Both engines fold the same
    1e-6-quantized covariance (the top-eigvec grid), so the two sums
    differ only in ulps under the 6 dp output grid."""
    from .common import sql_round

    cov, _, n = _covariance_pass(sf_dir)
    C = np.asarray(sql_round(cov, 6))
    d = C.shape[0]
    tr = float(np.trace(C))
    fro2 = float((C * C).sum())
    pr = tr * tr / (d * fro2)
    return pd.DataFrame({
        "n_vecs": [np.int64(n)], "dim": [np.int64(d)],
        "trace_cov": [float(sql_round(tr, 6))],
        "fro2_cov": [float(sql_round(fro2, 6))],
        "participation_ratio": [float(sql_round(pr, 6))],
        "effective_dims": [float(sql_round(pr * d, 4))]})


def embedding_isotropy_sql(dim: int = 64) -> str:
    return f"""
        WITH u AS (
            SELECT vec_id, generate_subscripts(embedding, 1) AS d,
                   CAST(unnest(embedding) AS DOUBLE) AS e
            FROM embeddings
        ),
        cov AS (
            SELECT a.d AS i, b.d AS j, round(covar_samp(a.e, b.e), 6) AS c
            FROM u a JOIN u b USING (vec_id)
            GROUP BY a.d, b.d
        ),
        s AS (
            SELECT (SELECT sum(c) FROM cov WHERE i = j) AS tr,
                   (SELECT sum(c * c) FROM cov) AS fro2
        )
        SELECT (SELECT count(DISTINCT vec_id) FROM u)::BIGINT AS n_vecs,
               {dim}::BIGINT AS dim,
               round(tr, 6) AS trace_cov,
               round(fro2, 6) AS fro2_cov,
               round(tr * tr / ({dim} * fro2), 6) AS participation_ratio,
               round(tr * tr / ({dim} * fro2) * {dim}, 4)
                   AS effective_dims
        FROM s
    """
