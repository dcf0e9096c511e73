"""Edge tests for the mixture / ordering / packing operators and the
global_prefix_sum scan primitive (the parametrized oracle battery in
test_queries_oracle covers their DuckDB value-hash conformance; these pin
the semantics that SQL equality alone can't distinguish)."""

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest
import ray.data as rd

SF = "/root/testdata/sf0.001"


def test_global_prefix_sum_exclusive_many_blocks(ray_session):
    """Exclusive semantics must hold across MANY small blocks (the offset
    exchange is the thing under test, not the per-block cumsum)."""
    from weaver_ray.pipelines.common import global_prefix_sum

    rng = np.random.default_rng(7)
    vals = rng.integers(0, 50, size=257).astype(np.int64)
    keys = rng.permutation(257).astype(np.int64)
    ds = rd.from_pandas(pd.DataFrame({"k": keys, "v": vals})).repartition(13)
    out = global_prefix_sum(ds, ["k"], "v").to_pandas().sort_values("k")
    order = np.argsort(keys)
    expect = np.concatenate(([0], np.cumsum(vals[order])[:-1]))
    np.testing.assert_array_equal(out["cum_before"].to_numpy(), expect)


def test_global_prefix_sum_single_row_and_empty_block(ray_session):
    from weaver_ray.pipelines.common import global_prefix_sum

    ds = rd.from_pandas(pd.DataFrame({"k": [1], "v": [42]})).repartition(4)
    out = global_prefix_sum(ds, ["k"], "v").to_pandas()
    assert out["cum_before"].tolist() == [0]


def test_global_prefix_scans_negative_values_randomized(ray_session):
    """Both scan monoids under NEGATIVE values across many blocks: the
    exclusive prefix max must start at int64-min (no prior row) and a
    block whose aggregate is negative must not be clamped toward zero
    by the cross-block offset fold; the sum monoid must fold negative
    block totals exactly.  Values span [-1000, 1000); keys are a
    permutation so the total order is unambiguous."""
    from weaver_ray.pipelines.common import (global_prefix_max,
                                             global_prefix_sum)

    rng = np.random.default_rng(11)
    for n, nparts in ((1, 1), (97, 11), (256, 3)):
        vals = rng.integers(-1000, 1000, size=n).astype(np.int64)
        keys = rng.permutation(n).astype(np.int64)
        ds = rd.from_pandas(pd.DataFrame({"k": keys, "v": vals})
                            ).repartition(nparts)
        order = np.argsort(keys)
        sv = vals[order]

        out = (global_prefix_sum(ds, ["k"], "v").to_pandas()
               .sort_values("k"))
        np.testing.assert_array_equal(
            out["cum_before"].to_numpy(),
            np.concatenate(([0], np.cumsum(sv)[:-1])))

        out = (global_prefix_max(ds, ["k"], "v").to_pandas()
               .sort_values("k"))
        lo = np.iinfo(np.int64).min
        expect = np.concatenate(([lo], np.maximum.accumulate(sv)[:-1]))
        np.testing.assert_array_equal(out["max_before"].to_numpy(), expect)


def test_token_budget_bins_monotone_and_budget_exact(ray_session):
    """Bin ids must be non-decreasing in doc order and equal the pandas
    recompute of cum_before // budget."""
    from weaver_ray.pipelines.textops import TOKEN_RE, token_budget_bins

    out = (token_budget_bins(SF, budget=512).to_pandas()
           .sort_values("doc_id").reset_index(drop=True))
    docs = pd.read_parquet(f"{SF}/documents.parquet",
                           columns=["doc_id", "text"]).sort_values("doc_id")
    n = docs["text"].str.count(TOKEN_RE).to_numpy(np.int64)
    cum = np.concatenate(([0], np.cumsum(n)[:-1]))
    np.testing.assert_array_equal(out["bin"].to_numpy(), cum // 512)
    assert (np.diff(out["bin"].to_numpy()) >= 0).all()
    assert out["bin"].nunique() > 1  # the budget actually splits the corpus


def test_deterministic_shuffle_is_permutation(ray_session):
    from weaver_ray.pipelines.textops import deterministic_shuffle_docs

    out = deterministic_shuffle_docs(SF).to_pandas()
    docs = pd.read_parquet(f"{SF}/documents.parquet", columns=["doc_id"])
    assert sorted(out["doc_id"]) == sorted(docs["doc_id"])
    assert sorted(out["shuffle_rank"]) == list(range(len(docs)))
    # rank order == md5 order (the declared contract)
    md5 = out["doc_id"].map(lambda d: hashlib.md5(str(d).encode()).hexdigest())
    assert (out.assign(__k=md5).sort_values("shuffle_rank")["__k"]
            .is_monotonic_increasing)


def test_weighted_source_mix_rates_and_determinism(ray_session):
    from weaver_ray.pipelines.textops import weighted_source_mix

    a = weighted_source_mix(SF).to_pandas().sort_values("doc_id")
    b = weighted_source_mix(SF).to_pandas().sort_values("doc_id")
    pd.testing.assert_frame_equal(a.reset_index(drop=True),
                                  b.reset_index(drop=True))
    docs = pd.read_parquet(f"{SF}/documents.parquet",
                           columns=["doc_id", "source"])
    # rate-1.0 sources (srcN with N % 10 == 9) are kept in full
    full = {s for s in docs["source"].unique() if int(s[3:]) % 10 == 9}
    kept = a.groupby("source").size()
    total = docs.groupby("source").size()
    for s in full:
        assert kept.get(s, 0) == total[s], s
    # low-rate sources are actually thinned (rate 0.1 keeps ~10%)
    low = {s for s in docs["source"].unique() if int(s[3:]) % 10 == 0}
    for s in low:
        assert kept.get(s, 0) < total[s] * 0.5, s


def test_knn_graph_excludes_self_under_exact_duplicates(ray_session, tmp_path):
    """Planted exact-duplicate vectors tie with the self match at cos=1.0;
    the top-(k+1) prefix logic must still emit exactly k non-self
    neighbors per vector, with the duplicate ranked first."""
    from weaver_ray.pipelines.similarity import knn_graph

    rng = np.random.default_rng(3)
    E = rng.normal(size=(40, 8))
    E[17] = E[3]          # exact duplicate pair
    E[25] = E[3]          # triple: two ids tie at cos == 1.0
    t = pa.table({
        "vec_id": pa.array(np.arange(40, dtype=np.int64)),
        "embedding": pa.array([list(map(float, r)) for r in E],
                              pa.list_(pa.float32())),
        "label": pa.array(np.zeros(40, dtype=np.int32)),
    })
    pq.write_table(t, tmp_path / "embeddings.parquet")
    out = knn_graph(str(tmp_path), k=5).to_pandas()
    assert (out["vec_id"] != out["neighbor_id"]).all()
    counts = out.groupby("vec_id").size()
    assert (counts == 5).all() and len(counts) == 40
    # the duplicates are each other's first neighbors (cos exactly 1.0)
    for a, bs in ((3, {17, 25}), (17, {3, 25}), (25, {3, 17})):
        nb = set(out[out["vec_id"] == a]["neighbor_id"].head(2))
        assert nb == bs, (a, nb)


def test_knn_graph_scale_gate_raises(ray_session, tmp_path):
    from weaver_ray.pipelines.similarity import knn_graph

    t = pa.table({
        "vec_id": pa.array(np.arange(10, dtype=np.int64)),
        "embedding": pa.array([[1.0, 0.0]] * 10, pa.list_(pa.float32())),
        "label": pa.array(np.zeros(10, dtype=np.int32)),
    })
    pq.write_table(t, tmp_path / "embeddings.parquet")
    with pytest.raises(NotImplementedError):
        knn_graph(str(tmp_path), k=3, max_broadcast_rows=5)


def test_embedding_top_eigvec_matches_numpy(ray_session):
    """The distributed one-pass moment sweep + 64x64 eigensolve must agree
    with numpy's eigh over the full in-memory table (golden cross-check;
    the query's own residual_ok column is the in-row verdict)."""
    from weaver_ray.pipelines.similarity import embedding_top_eigvec

    out = embedding_top_eigvec(SF)
    assert out["residual_ok"].all()
    E = np.stack(pd.read_parquet(f"{SF}/embeddings.parquet")["embedding"]
                 .map(np.asarray)).astype(np.float64)
    C = np.cov(E, rowvar=False, ddof=1)
    w, V = np.linalg.eigh(C)
    v_ref = V[:, -1]
    v = out.sort_values("dim")["component"].to_numpy()
    v = v / np.linalg.norm(v)     # components are 6-dp rounded
    # power iteration on the 1e-6-quantized covariance: alignment and
    # eigenvalue agree with eigh to the quantization/convergence budget
    assert abs(abs(v @ v_ref) - 1.0) < 1e-4
    assert abs(out["lambda1"].iloc[0] - w[-1]) < 1e-3 * max(1.0, w[-1])
    assert abs(out["explained_var_ratio"].iloc[0] - w[-1] / w.sum()) < 1e-3


def test_curated_packed_shards_is_packing_of_curated(ray_session):
    """The composition must equal: curated survivor set, doc_id order,
    exclusive prefix sum // budget (recomputed in pandas)."""
    from weaver_ray.pipelines.textops import (TOKEN_RE, curated_docs,
                                              curated_packed_shards)

    cur = set(curated_docs(SF).to_pandas()["doc_id"])
    out = (curated_packed_shards(SF, budget=512).to_pandas()
           .sort_values("doc_id").reset_index(drop=True))
    assert set(out["doc_id"]) == cur
    docs = pd.read_parquet(f"{SF}/documents.parquet",
                           columns=["doc_id", "text"])
    docs = docs[docs["doc_id"].isin(cur)].sort_values("doc_id")
    n = docs["text"].str.count(TOKEN_RE).to_numpy(np.int64)
    cum = np.concatenate(([0], np.cumsum(n)[:-1]))
    np.testing.assert_array_equal(out["n_tokens"].to_numpy(), n)
    np.testing.assert_array_equal(out["bin"].to_numpy(), cum // 512)
    assert out["bin"].nunique() > 1


def test_scan_primitives_keep_schema_on_empty_input(ray_session):
    """Fully-empty input (every post-sort block zero-row) must still emit
    the contract columns — downstream binify/select_columns depend on it."""
    from weaver_ray.pipelines.common import global_prefix_sum, global_row_number

    empty = rd.from_pandas(pd.DataFrame(
        {"k": pd.Series([], dtype=np.int64),
         "v": pd.Series([], dtype=np.int64)}))
    out = global_prefix_sum(empty, ["k"], "v")
    # NB: assert on the Dataset schema — Dataset.to_pandas() on an
    # all-empty result returns a 0-column frame (known Ray behavior)
    assert out.schema().names == ["k", "v", "cum_before"]
    assert out.count() == 0
    ranked, n = global_row_number(empty, ["k"], rank_col="r")
    assert ranked.schema().names == ["k", "v", "r"] and n == 0


def test_covariance_rejects_degenerate_n(ray_session, tmp_path):
    from weaver_ray.pipelines.similarity import embedding_covariance

    t = pa.table({
        "vec_id": pa.array([0], pa.int64()),
        "embedding": pa.array([[1.0, 2.0]], pa.list_(pa.float32())),
        "label": pa.array([0], pa.int32()),
    })
    pq.write_table(t, tmp_path / "embeddings.parquet")
    with pytest.raises(ValueError, match=">= 2 vectors"):
        embedding_covariance(str(tmp_path))


def test_knn_graph_rejects_zero_norm(ray_session, tmp_path):
    from weaver_ray.pipelines.similarity import knn_graph

    t = pa.table({
        "vec_id": pa.array([0, 1, 2], pa.int64()),
        "embedding": pa.array([[1.0, 0.0], [0.0, 0.0], [0.0, 1.0]],
                              pa.list_(pa.float32())),
        "label": pa.array([0, 0, 0], pa.int32()),
    })
    pq.write_table(t, tmp_path / "embeddings.parquet")
    with pytest.raises(ValueError, match="zero-norm"):
        knn_graph(str(tmp_path), k=1)


def test_ann_ivfpq_matches_independent_numpy(ray_session):
    """IVF-PQ vs a from-scratch numpy recompute: coarse-assign with the
    engine's ROUNDED centroids, restrict each query to its n_probe cells,
    rank by ADC over the ROUNDED codebooks — the composition must agree
    rank-for-rank (same 1e-9 grid + id tiebreaks)."""
    import pyarrow.parquet as pq

    from weaver_ray.pipelines.similarity import (_matrix, _pq_train,
                                                 ann_ivfpq_topk,
                                                 kmeans_clusters)
    from weaver_ray.pipelines.common import sql_round

    sf = "/root/testdata/sf0.001"
    eng = ann_ivfpq_topk(sf)

    cent = kmeans_clusters(sf)
    CC = (cent.pivot(index="cluster", columns="dim", values="centroid")
          .to_numpy())
    C, _ = _pq_train(sf, 4, 16, 2, 16)
    Cq = sql_round(C.reshape(-1), 4).reshape(C.shape)
    mm, kk, sub = Cq.shape

    t = pq.read_table(sf + "/embeddings.parquet",
                      columns=["vec_id", "embedding"])
    vid = t.column("vec_id").to_numpy()
    X = _matrix(t.column("embedding").to_pylist())

    def argmin_grid(D):  # round(dist,9) grid, lowest index tiebreak
        return np.argmin(np.floor(D * 1e9 + 0.5), axis=1)

    cell = argmin_grid(((X[:, None, :] - CC[None, :, :]) ** 2).sum(2))
    codes = np.stack(
        [argmin_grid(((X[:, None, s * sub:(s + 1) * sub]
                       - Cq[s][None, :, :]) ** 2).sum(2))
         for s in range(mm)], axis=1)
    rows = []
    for qid in range(5):
        qi = int(np.flatnonzero(vid == qid)[0])
        dq = np.floor(((X[qi][None, :] - CC) ** 2).sum(1) * 1e9 + 0.5)
        probed = np.lexsort((np.arange(len(CC)), dq))[:2]
        T = ((X[qi].reshape(mm, 1, sub) - Cq) ** 2).sum(2)  # m x k
        adc = T[np.arange(mm)[None, :], codes].sum(1)
        ok = np.isin(cell, probed) & (vid != qid)
        idx = np.flatnonzero(ok)
        order = idx[np.lexsort((vid[idx],
                                np.floor(adc[idx] * 1e9 + 0.5)))][:10]
        for r, j in enumerate(order, 1):
            rows.append((qid, int(vid[j]), r))
    ref = pd.DataFrame(rows, columns=["query_id", "neighbor_id",
                                      "ivfpq_rank"])
    pd.testing.assert_frame_equal(
        eng.sort_values(["query_id", "ivfpq_rank"]).reset_index(drop=True),
        ref.sort_values(["query_id", "ivfpq_rank"]).reset_index(drop=True),
        check_dtype=False)
    # the probe restriction must actually bite at n_probe=2 of 8 cells:
    # fewer candidates than exhaustive for at least one query is expected
    assert len(eng) > 0


def test_pps_sample_matches_sequential_replay(ray_session, tmp_path):
    """Systematic PPS vs an independent sequential replay (md5 order ->
    exclusive prefix -> midpoint points -> interval hits), including a
    heavy document whose weight spans multiple strides (n_hits > 1)."""
    from weaver_ray.pipelines.textops import pps_sample_docs

    texts = ["alpha beta", "x", "", "one two three four five six seven",
             " ".join(["tok"] * 40), "a b c"]  # doc 4 is the heavy one
    t = pa.table({
        "doc_id": pa.array(range(len(texts)), pa.int64()),
        "text": pa.array(texts),
    })
    pq.write_table(t, tmp_path / "documents.parquet")
    n = 8
    eng = (pps_sample_docs(str(tmp_path), n=n).to_pandas()
           .sort_values("doc_id").reset_index(drop=True))

    # independent replay
    w = {i: len(s.split()) for i, s in enumerate(texts)}
    order = sorted(w, key=lambda d: (hashlib.md5(str(d).encode()).hexdigest(), d))
    total = sum(w.values())
    pts = [((2 * j + 1) * total) // (2 * n) for j in range(n)]
    cb, rows = 0, []
    for d in order:
        hits = sum(1 for p in pts if cb <= p < cb + w[d])
        if hits:
            rows.append((d, w[d], hits))
        cb += w[d]
    ref = (pd.DataFrame(rows, columns=["doc_id", "n_tokens", "n_hits"])
           .sort_values("doc_id").reset_index(drop=True))
    pd.testing.assert_frame_equal(eng, ref, check_dtype=False)
    assert eng["n_hits"].sum() == n          # every point lands somewhere
    assert (eng["n_hits"] > 1).any()         # the heavy doc spans strides
    assert 2 not in set(eng["doc_id"])       # doc 2 (zero tokens) excluded


def test_pps_sample_point_budget_at_fixture_scale(ray_session):
    """At sf0.001: exactly n points distributed, every sampled doc has
    positive weight, inclusion leans toward heavier docs."""
    from weaver_ray.pipelines.textops import pps_sample_docs

    out = pps_sample_docs(SF, n=100).to_pandas()
    assert out["n_hits"].sum() == 100
    assert (out["n_tokens"] > 0).all()
    # PPS property: the mean token weight of sampled docs exceeds the
    # corpus mean (heavier docs are more likely to be hit)
    import re

    corpus = pq.read_table(f"{SF}/documents.parquet", columns=["text"])
    mean_all = np.mean([len(re.findall(r"\w+", s))
                        for s in corpus["text"].to_pylist()])
    assert out["n_tokens"].mean() > mean_all
