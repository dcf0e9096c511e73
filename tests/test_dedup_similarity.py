"""Dedup-family recall/precision on injected near-duplicates + similarity
search sanity (the testdata tables contain few near-dups, so these tests
build their own duplicate-rich corpora)."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from weaver_ray.pipelines.dedup import (
    _shingle_hashes,
    embedding_near_dup_pairs,
    minhash_lsh_pairs,
    minhash_signature,
    simhash64,
    simhash_pairs,
)


@pytest.fixture(scope="module")
def dup_dir(tmp_path_factory):
    """Tiny documents/embeddings tables with planted near-duplicates."""
    d = tmp_path_factory.mktemp("dupdata")
    rng = np.random.default_rng(7)
    words = [f"w{i}" for i in range(50)]
    texts, ids = [], []
    for i in range(40):
        base = " ".join(rng.choice(words, 30))
        texts.append(base)
        ids.append(2 * i)
        if i < 10:  # plant a near-dup: change one word
            toks = base.split()
            toks[5] = "CHANGED"
            texts.append(" ".join(toks))
            ids.append(2 * i + 1)
    pq.write_table(
        pa.table({"doc_id": pa.array(ids, pa.int64()), "text": pa.array(texts),
                  "lang": pa.array(["en"] * len(ids)),
                  "source": pa.array(["s"] * len(ids)),
                  "n_chars": pa.array([len(t) for t in texts], pa.int64())}),
        d / "documents.parquet",
    )
    base_vecs = rng.normal(size=(40, 16)).astype(np.float32)
    vecs, vids = [], []
    for i in range(40):
        vecs.append(base_vecs[i])
        vids.append(2 * i)
        if i < 10:  # planted near-identical vector
            vecs.append((base_vecs[i] + rng.normal(scale=0.01, size=16).astype(np.float32)))
            vids.append(2 * i + 1)
    pq.write_table(
        pa.table({"vec_id": pa.array(vids, pa.int64()),
                  "embedding": pa.array([v.tolist() for v in vecs],
                                        pa.list_(pa.float32())),
                  "label": pa.array([0] * len(vids), pa.int32())}),
        d / "embeddings.parquet",
    )
    return str(d)


def test_minhash_signature_properties():
    a = _shingle_hashes("the quick brown fox jumps over the lazy dog " * 3)
    sig = minhash_signature(a)
    assert sig.shape == (64,)
    assert (minhash_signature(a) == sig).all()  # deterministic
    # similar sets -> similar signatures
    b = _shingle_hashes("the quick brown fox jumps over the lazy cat " * 3)
    sim = (minhash_signature(b) == sig).mean()
    dis = (minhash_signature(_shingle_hashes("completely different words entirely")) == sig).mean()
    assert sim > dis


def test_minhash_lsh_finds_planted_dups(dup_dir):
    pairs = minhash_lsh_pairs(dup_dir, jaccard_threshold=0.5)
    found = set(zip(pairs["doc_a"], pairs["doc_b"]))
    planted = {(2 * i, 2 * i + 1) for i in range(10)}
    assert planted <= found                      # full recall on planted dups
    assert (pairs["jaccard"] >= 0.5).all()       # verification bound holds


def test_simhash_finds_planted_dups(dup_dir):
    # max_hamming=6 exceeds the 4x16-band pigeonhole guarantee (lossless
    # only for ham<=3), so recall is high but not total: with the md5 token
    # hashes, 7/10 planted pairs are ham<=6 AND share a band
    pairs = simhash_pairs(dup_dir, max_hamming=6)
    found = set(zip(pairs["doc_a"], pairs["doc_b"]))
    planted = {(2 * i, 2 * i + 1) for i in range(10)}
    assert len(planted & found) >= 7
    assert (pairs["hamming"] <= 6).all()


def test_simhash_default_equals_bruteforce(dup_dir):
    """At the default max_hamming=3 the 4x16 banding is pigeonhole-lossless:
    the banded output must equal O(n^2) brute force exactly (this is also
    what the DuckDB oracle checks at sf0.01)."""
    import pyarrow.parquet as pq_

    t = pq_.read_table(dup_dir + "/documents.parquet", columns=["doc_id", "text"])
    ids = t.column("doc_id").to_pylist()
    sigs = {i: simhash64(x) for i, x in zip(ids, t.column("text").to_pylist())}
    expect = set()
    for i in ids:
        for j in ids:
            if j > i and bin(sigs[i] ^ sigs[j]).count("1") <= 3:
                expect.add((i, j))
    pairs = simhash_pairs(dup_dir, max_hamming=3)
    got = set(zip(pairs["doc_a"], pairs["doc_b"]))
    assert got == expect


def test_simhash64_deterministic_and_locality():
    s1 = simhash64("alpha beta gamma delta epsilon zeta")
    assert s1 == simhash64("alpha beta gamma delta epsilon zeta")
    s2 = simhash64("alpha beta gamma delta epsilon eta")
    ham = bin(s1 ^ s2).count("1")
    s3 = simhash64("totally unrelated content here now")
    assert ham < bin(s1 ^ s3).count("1")


def test_embedding_near_dup_planted(dup_dir):
    pairs = embedding_near_dup_pairs(dup_dir, band=100, threshold=0.95, bucket=30)
    found = set(zip(pairs["vec_a"], pairs["vec_b"]))
    planted = {(2 * i, 2 * i + 1) for i in range(10)}
    assert planted <= found


def test_embedding_banded_join_matches_bruteforce(dup_dir):
    """The bucketed+ghost range join must equal the O(n^2) reference."""
    t = pq.read_table(dup_dir + "/embeddings.parquet")
    vid = t.column("vec_id").to_numpy()
    E = np.array(t.column("embedding").to_pylist(), dtype=np.float64)
    En = E / np.linalg.norm(E, axis=1, keepdims=True)
    cos = En @ En.T
    expect = set()
    for i in range(len(vid)):
        for j in range(len(vid)):
            d = vid[j] - vid[i]
            if 1 <= d <= 100 and cos[i, j] > 0.5:
                expect.add((int(vid[i]), int(vid[j])))
    pairs = embedding_near_dup_pairs(dup_dir, band=100, threshold=0.5, bucket=17)
    got = set(zip(pairs["vec_a"], pairs["vec_b"]))
    assert got == expect


def test_ann_bruteforce_topk_is_exact(dup_dir):
    from weaver_ray.pipelines.similarity import ann_bruteforce_topk

    out = ann_bruteforce_topk(dup_dir, n_queries=2, k=5)
    t = pq.read_table(dup_dir + "/embeddings.parquet")
    vid = t.column("vec_id").to_numpy()
    E = np.array(t.column("embedding").to_pylist(), dtype=np.float64)
    En = E / np.linalg.norm(E, axis=1, keepdims=True)
    for qid in (0, 1):
        qpos = np.flatnonzero(vid == qid)[0]
        cos = En @ En[qpos]
        mask = vid != qid
        idx = np.flatnonzero(mask)
        order = idx[np.lexsort((vid[idx], -cos[idx]))][:5]
        expect = list(vid[order])
        got = list(out[out["query_id"] == qid]["neighbor_id"])
        assert got == expect


def test_ann_ivf_recall(dup_dir):
    """IVF with full probing of few cells must keep decent recall vs exact."""
    from weaver_ray.pipelines.similarity import ann_bruteforce_topk, ann_ivf_topk

    exact = ann_bruteforce_topk(dup_dir, n_queries=2, k=5)
    approx = ann_ivf_topk(dup_dir, n_queries=2, k=5, n_cells=4, n_probe=2)
    for qid in (0, 1):
        e = set(exact[exact["query_id"] == qid]["neighbor_id"])
        a = set(approx[approx["query_id"] == qid]["neighbor_id"])
        assert len(e & a) >= 2  # recall@5 >= 0.4 with 2/4 cells probed


def test_ann_ivf_exhaustive_equals_bruteforce(dup_dir):
    """Probing every cell must reduce IVF to the exact answer — this is the
    invariant the ann_ivf_exhaustive_topk SQL oracle relies on."""
    from weaver_ray.pipelines.similarity import (ann_bruteforce_topk,
                                                 ann_ivf_exhaustive_topk)

    exact = ann_bruteforce_topk(dup_dir, n_queries=2, k=5)
    full = ann_ivf_exhaustive_topk(dup_dir, n_queries=2, k=5, n_cells=4)
    assert exact.values.tolist() == full.values.tolist()


def test_neardup_clusters_match_union_find(dup_dir):
    """Distributed label propagation must equal a sequential union-find
    over the same near-dup pairs (pointer jumping included)."""
    from weaver_ray.pipelines.dedup import neardup_clusters, ngram_jaccard_pairs

    pairs = ngram_jaccard_pairs(dup_dir, band=50, threshold=0.5, bucket=60)
    parent: dict = {}

    def find(x):
        while parent.get(x, x) != x:
            parent[x] = parent.get(parent[x], parent[x])
            x = parent[x]
        return x

    for a, b in zip(pairs["doc_a"], pairs["doc_b"]):
        ra, rb = find(int(a)), find(int(b))
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)

    out = neardup_clusters(dup_dir, band=50, threshold=0.5, bucket=60)
    got = dict(zip(out["doc_id"], out["cluster_id"]))
    expect = {d: find(d) for d in out["doc_id"]}
    assert got == expect
    # the 10 planted near-dup pairs must co-cluster
    for i in range(10):
        assert got[2 * i] == got[2 * i + 1]


def test_connected_components_ds_random_graphs(ray_session):
    """Randomized graphs against a sequential union-find: long path
    chains (the pointer-jumping stress — diameter ~ node count), random
    sparse edges, self-loops, isolated nodes, and a forced multi-part
    exchange (num_parts high vs the 64k slice floor exercises k==1;
    a tiny slice_rows isn't exposed, so k>1 is covered by the
    fixture-scale page_components tests — here the adversary is graph
    SHAPE)."""
    import ray.data as rd

    from weaver_ray.pipelines.common import to_table
    from weaver_ray.pipelines.dedup import connected_components_ds

    rng = np.random.default_rng(99)
    for trial in range(4):
        n = (2, 40, 150, 400)[trial]
        shape = ("pair", "chain", "sparse", "chain+sparse")[trial]
        ids = np.arange(n, dtype=np.int64) * 7 + 3  # non-contiguous ids
        edges = []
        if "chain" in shape:  # long paths: worst case for propagation
            if trial == 1:  # ONE unbroken n-node chain (diameter n-1)
                edges += [(ids[i], ids[i + 1]) for i in range(n - 1)]
            else:  # gaps split it into several mid-length chains
                edges += [(ids[i], ids[i + 1]) for i in range(n - 1)
                          if i % 37 != 36]
        if "sparse" in shape:
            m = n // 2
            a = rng.integers(0, n, m)
            b = rng.integers(0, n, m)
            edges += [(ids[x], ids[y]) for x, y in zip(a, b)]  # incl. loops
        if shape == "pair":
            edges = [(ids[0], ids[1])]
        nodes = rd.from_pandas(pd.DataFrame({"doc_id": ids}))
        eds = rd.from_pandas(pd.DataFrame(
            {"src": np.array([e[0] for e in edges], np.int64),
             "dst": np.array([e[1] for e in edges], np.int64)}))
        out = to_table(connected_components_ds(nodes, eds)).to_pandas()

        parent: dict = {}

        def find(x):
            while parent.get(x, x) != x:
                parent[x] = parent.get(parent[x], parent[x])
                x = parent[x]
            return x

        for a, b in edges:
            ra, rb = find(int(a)), find(int(b))
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)
        got = dict(zip(out["doc_id"].astype(int),
                       out["cluster_id"].astype(int)))
        assert len(got) == n, f"trial {trial}: node universe wrong"
        for d in ids:
            assert got[int(d)] == find(int(d)), \
                f"trial {trial} ({shape}): node {d}"


def test_minhash_bucketed_verify_matches_broadcast(dup_dir):
    """The scale-path verification (two bucketed joins) must equal the
    broadcast path exactly."""
    a = minhash_lsh_pairs(dup_dir, jaccard_threshold=0.5)
    b = minhash_lsh_pairs(dup_dir, jaccard_threshold=0.5, broadcast_threshold=0)
    pd.testing.assert_frame_equal(a, b)


def test_neardup_canonical_docs_picks_longest(dup_dir):
    """One representative per cluster: the longest doc, ties to smallest
    doc_id; sizes must agree with the cluster labels; singletons kept."""
    from weaver_ray.pipelines.dedup import (neardup_canonical_docs,
                                            neardup_clusters)
    import pyarrow.parquet as pq_

    labels = neardup_clusters(dup_dir, band=50, threshold=0.5, bucket=60)
    chars = pq_.read_table(f"{dup_dir}/documents.parquet",
                           columns=["doc_id", "n_chars"]).to_pandas()
    lab = labels.merge(chars, on="doc_id")
    out = neardup_canonical_docs(dup_dir, band=50, threshold=0.5, bucket=60)
    assert len(out) == labels["cluster_id"].nunique()  # one per cluster
    assert out["cluster_size"].sum() == len(labels)    # partition covers all
    for _, row in out.iterrows():
        g = lab[lab["cluster_id"] == row["cluster_id"]]
        best = g.sort_values(["n_chars", "doc_id"],
                             ascending=[False, True]).iloc[0]
        assert row["doc_id"] == best["doc_id"]
        assert row["n_chars"] == best["n_chars"]
        assert row["cluster_size"] == len(g)


def test_ann_topk_per_label_filters(dup_dir, tmp_path):
    """Filtered ANN: neighbors must share the query's label; equals a
    per-label numpy brute force with the (cos desc, id asc) tiebreak."""
    import pyarrow as pa
    import pyarrow.parquet as pq_

    from weaver_ray.pipelines.similarity import ann_topk_per_label

    rng = np.random.default_rng(11)
    n, d = 60, 8
    vecs = rng.normal(size=(n, d)).astype(np.float32)
    labels = (np.arange(n) % 3).astype(np.int32)
    pq_.write_table(pa.table({
        "vec_id": pa.array(np.arange(n), pa.int64()),
        "embedding": pa.array([v.tolist() for v in vecs], pa.list_(pa.float32())),
        "label": pa.array(labels, pa.int32()),
    }), tmp_path / "embeddings.parquet")
    out = ann_topk_per_label(str(tmp_path), n_queries=3, k=5)
    V = vecs.astype(np.float64)
    Vn = V / np.linalg.norm(V, axis=1, keepdims=True)
    for qid in range(3):
        got = out.loc[out["query_id"] == qid, "neighbor_id"].to_numpy()
        cand = np.flatnonzero((labels == labels[qid]) & (np.arange(n) != qid))
        cos = Vn[cand] @ Vn[qid]
        want = cand[np.lexsort((cand, -cos))][:5]
        assert list(got) == list(want)
        assert (labels[got] == labels[qid]).all()


def test_label_centroids_matches_numpy(tmp_path):
    """Grouped vector mean == numpy per-label mean (4-dp, half-away)."""
    import pyarrow as pa
    import pyarrow.parquet as pq_

    from weaver_ray.pipelines.common import sql_round
    from weaver_ray.pipelines.similarity import label_centroids

    rng = np.random.default_rng(7)
    n, d = 120, 6
    vecs = rng.normal(size=(n, d)).astype(np.float32)
    labels = (np.arange(n) % 4).astype(np.int32)
    pq_.write_table(pa.table({
        "vec_id": pa.array(np.arange(n), pa.int64()),
        "embedding": pa.array([v.tolist() for v in vecs], pa.list_(pa.float32())),
        "label": pa.array(labels, pa.int32()),
    }), tmp_path / "embeddings.parquet")
    out = label_centroids(str(tmp_path))
    assert list(out.columns) == ["label", "dim", "centroid", "n"]
    assert len(out) == 4 * d
    V = vecs.astype(np.float64)
    for lab in range(4):
        want = sql_round(V[labels == lab].mean(axis=0), 4)
        got = out.loc[out["label"] == lab].sort_values("dim")["centroid"].to_numpy()
        np.testing.assert_allclose(got, want, atol=1e-9)
        assert (out.loc[out["label"] == lab, "n"] == (labels == lab).sum()).all()


def test_embedding_sq8_error_bound(ray_session):
    """A uniform scalar quantizer's per-value error is at most half a step
    ((mx-mn)/255/2), so per-dim MSE must sit under step^2/4; and the codec
    must be lossless on a constant dimension (mx == mn -> mse 0)."""
    from weaver_ray.pipelines.similarity import embedding_sq8_stats

    out = embedding_sq8_stats("/root/testdata/sf0.001")
    assert len(out) == 64
    step = (out["qmax"] - out["qmin"]) / 255.0
    assert (out["mse"] <= step * step / 4.0 + 1e-9).all()
    assert (out["mse"] >= 0).all()
    # ranges are genuine (synthetic embeddings are not constant)
    assert (out["qmax"] > out["qmin"]).all()


def test_consensus_dup_pairs_is_set_intersection(ray_session):
    """Consensus pairs == exact set intersection of the two signal
    pipelines' outputs on the standard fixture, and both legs genuinely
    gate (consensus is strictly smaller than each leg)."""
    from weaver_ray.pipelines.dedup import (consensus_dup_pairs,
                                            embedding_near_dup_pairs,
                                            ngram_jaccard_pairs)

    sf = "/root/testdata/sf0.001"
    lex = ngram_jaccard_pairs(sf)
    sem = embedding_near_dup_pairs(sf)
    lex_set = set(zip(lex["doc_a"], lex["doc_b"]))
    sem_set = set(zip(sem["vec_a"], sem["vec_b"]))
    out = consensus_dup_pairs(sf)
    got = set(zip(out["doc_a"], out["doc_b"]))
    assert got == (lex_set & sem_set)
    assert 0 < len(got) < min(len(lex_set), len(sem_set))


def test_hybrid_rrf_fuses_both_legs(ray_session):
    """RRF scores must equal an independent recompute from the two legs
    run standalone, and the fusion must genuinely combine evidence:
    docs present in both legs exist and outrank same-single-leg peers."""
    import numpy as np

    from weaver_ray.pipelines.similarity import hybrid_rrf_topk
    from weaver_ray.pipelines.textops import bm25_topk

    sf = "/root/testdata/sf0.001"
    out = hybrid_rrf_topk(sf)
    lex = bm25_topk(sf, k=50).set_index("doc_id")["rank"]
    for r in out.itertuples(index=False):
        expect = 0.0
        if r.lex_rank > 0:
            assert lex.get(r.doc_id) == r.lex_rank  # leg parity
            expect += 1.0 / (60 + r.lex_rank)
        if r.dense_rank > 0:
            expect += 1.0 / (60 + r.dense_rank)
        assert r.rrf_score == expect  # two-term IEEE sum, exact
    assert (out["fused_rank"].to_numpy() ==
            np.arange(1, len(out) + 1)).all()
    # the fusion must draw on BOTH retrievers: the fused top-k cannot be
    # a copy of either single leg's top-k
    assert (out["lex_rank"] > 0).any() and (out["dense_rank"] > 0).any()
    # scores non-increasing along the fused ranking
    s = out["rrf_score"].to_numpy()
    assert (np.diff(s) <= 0).all()


def test_prefix_jaccard_equals_brute_force(dup_dir):
    """Losslessness end-to-end: the prefix-filtered engine must return
    EXACTLY the brute-force all-pairs shingle-Jaccard >= 1/2 set (the
    prefix-filter lemma plus the length filter prune candidates only) —
    including the 10 planted one-word-changed near-dup pairs.  Also pins
    the pure-integer accept test and the <w-token doc exclusion."""
    import re

    from weaver_ray.pipelines.common import sql_round
    from weaver_ray.pipelines.dedup import PJ_W, prefix_jaccard_pairs

    tok_re = re.compile(r"\w+")
    docs = pq.read_table(dup_dir + "/documents.parquet").to_pydict()
    sets = {}
    for did, text in zip(docs["doc_id"], docs["text"]):
        toks = tok_re.findall(text)
        if len(toks) < PJ_W:
            continue
        sets[did] = {" ".join(toks[i:i + PJ_W])
                     for i in range(len(toks) - PJ_W + 1)}
    expect = []
    ids = sorted(sets)
    for i, a in enumerate(ids):
        for b in ids[i + 1:]:
            inter = len(sets[a] & sets[b])
            union = len(sets[a]) + len(sets[b]) - inter
            if 2 * inter >= union:  # J >= 1/2, exact integers
                expect.append((a, b, float(sql_round(inter / union, 4))))
    out = prefix_jaccard_pairs(dup_dir)
    got = list(zip(out["doc_a"], out["doc_b"], out["jaccard"]))
    assert sorted(got) == sorted(expect)
    # the 10 planted near-dup pairs (2i, 2i+1) must all be recovered
    planted = {(2 * i, 2 * i + 1) for i in range(10)}
    assert planted <= {(a, b) for a, b, _ in got}
    # and the join is non-trivially selective: far fewer pairs than n^2/2
    assert len(got) < len(ids) * (len(ids) - 1) // 4


def test_ari_contingency_matches_pair_classification():
    """The integer-exact ARI fold must agree with the algebraically
    independent PAIR-CLASSIFICATION route (count pairs together in
    both / one / neither partition, then the 2(ad-bc) Steinley form),
    and be exactly 1.0 for identical partitions, ~0 for independent
    ones, and invariant to cluster relabeling."""
    import itertools

    from weaver_ray.pipelines.similarity import _ari_from_contingency

    def ari_pairs(clusters, labels):
        n11 = n10 = n01 = n00 = 0
        for (c1, l1), (c2, l2) in itertools.combinations(
                zip(clusters, labels), 2):
            sc, sl = c1 == c2, l1 == l2
            if sc and sl:
                n11 += 1
            elif sc:
                n10 += 1
            elif sl:
                n01 += 1
            else:
                n00 += 1
        return (2.0 * (n11 * n00 - n10 * n01)
                / ((n11 + n10) * (n10 + n00) + (n11 + n01) * (n01 + n00)))

    rng = np.random.default_rng(11)
    clusters = rng.integers(0, 4, size=200)
    labels = (clusters + (rng.random(200) < 0.3)) % 4  # 70% agreement
    cont = (pd.DataFrame({"cluster": clusters, "label": labels})
            .groupby(["cluster", "label"]).size().rename("n").reset_index())
    n, nc, nl, ari = _ari_from_contingency(cont)
    assert n == 200 and nc == 4 and nl == 4
    assert abs(ari - ari_pairs(clusters, labels)) < 1e-12
    # identical partitions -> exactly 1.0 (integer num == den)
    cont_id = (pd.DataFrame({"cluster": clusters, "label": clusters})
               .groupby(["cluster", "label"]).size().rename("n")
               .reset_index())
    assert _ari_from_contingency(cont_id)[3] == 1.0
    # relabel invariance: permuting cluster ids changes nothing
    perm = {0: 3, 1: 2, 2: 0, 3: 1}
    cont_p = (pd.DataFrame({"cluster": [perm[c] for c in clusters],
                            "label": labels})
              .groupby(["cluster", "label"]).size().rename("n")
              .reset_index())
    assert _ari_from_contingency(cont_p)[3] == ari


def test_kmeans_label_ari_recovers_planted_blobs(ray_session, tmp_path):
    """Four well-separated blobs labeled by blob id, seeded so vec_ids
    0..3 land one per blob (the lowest-id Lloyd init): k-means must
    recover the partition exactly -> ARI == 1.0."""
    from weaver_ray.pipelines.similarity import kmeans_label_ari

    rng = np.random.default_rng(5)
    centers = np.eye(4, 16, dtype=np.float64) * 50.0
    vids, vecs, labs = [], [], []
    for i in range(200):
        b = i % 4  # vec 0..3: one per blob
        vids.append(i)
        labs.append(b)
        vecs.append((centers[b]
                     + rng.normal(scale=0.1, size=16)).astype(np.float32))
    pq.write_table(
        pa.table({"vec_id": pa.array(vids, pa.int64()),
                  "embedding": pa.array([v.tolist() for v in vecs],
                                        pa.list_(pa.float32())),
                  "label": pa.array(labs, pa.int32())}),
        tmp_path / "embeddings.parquet")
    out = kmeans_label_ari(str(tmp_path), k=4)
    assert out["n_vectors"].item() == 200
    assert out["n_clusters"].item() == 4 and out["n_labels"].item() == 4
    assert out["ari"].item() == 1.0


def test_rolling_hashes_lone_surrogate_degrades_not_raises():
    """A lone surrogate in document text must degrade (char skipped) —
    never raise inside a map_batches task and poison the whole
    fingerprint batch (ADVICE r3: utf-32-le strict encode)."""
    from weaver_ray.pipelines.textops import _rolling_hashes

    good = "abcdefghijkl"
    bad = good[:5] + "\ud800" + good[5:]
    out = _rolling_hashes(bad, k=8)
    np.testing.assert_array_equal(out, _rolling_hashes(good, k=8))
