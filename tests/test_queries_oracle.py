"""Driver-conformance battery: every SQL-checkable queries() entry must
match its oracle_sql() under DuckDB at sf0.001 (same comparison the driver
runs at sf0.01 — row count + column names + sorted values)."""

import sys

import duckdb
import pytest

sys.path.insert(0, "/root/repo")
import __ray_entry__ as entrymod  # noqa: E402

from tools.check_oracle import TABLES, compare  # noqa: E402

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TABLES:
        c.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')")
    return c


SQL_CHECKED = sorted(entrymod.oracle_sql())


@pytest.mark.parametrize("name", SQL_CHECKED)
def test_query_matches_oracle(name, con):
    from weaver_ray.pipelines.common import to_table

    fn = entrymod.queries()[name]
    ray_df = to_table(fn(SF)).to_pandas()
    sql_df = con.execute(entrymod.oracle_sql()[name]).df()
    verdict = compare(name, ray_df, sql_df)
    assert verdict == "OK", verdict


def test_every_query_runs_and_returns_rows():
    qs = entrymod.queries()
    rows_only = set(qs) - set(entrymod.oracle_sql())
    # rows-only queries must at least run and produce a stable, non-trivial frame
    from weaver_ray.pipelines.common import to_table

    for name in sorted(rows_only):
        if name.startswith("crawl"):
            continue  # exercised (deeply) in test_crawl_parity
        df = to_table(qs[name](SF)).to_pandas()
        assert len(df) > 0, name
        assert len(df.columns) > 0, name


def test_entry_smoke():
    t = entrymod.entry()
    assert t.num_rows > 0
    assert set(t.column_names) == {"url_canon", "url_hash", "round"}


def test_approx_distinct_within_tolerance():
    from weaver_ray.pipelines.relational import approx_distinct_users

    df = approx_distinct_users(SF)
    approx, exact = int(df["n_users_approx"][0]), int(df["n_users_exact"][0])
    assert exact > 0
    assert abs(approx - exact) / exact < 0.05


def test_sampling_deterministic():
    from weaver_ray.pipelines.relational import event_sample_stats

    a = event_sample_stats(SF)
    b = event_sample_stats(SF)
    assert a.equals(b)
    n = int(a["n_sampled"][0])
    assert 0 < n < 1000  # 10% of 1000-row events table, loose bounds


def test_price_quantiles_exact(ray_session):
    """Distributed histogram-selection quantiles return ACTUAL elements
    under DuckDB's quantile_disc rank rule — checked against a direct
    numpy sort, including with a tiny collect budget that forces the
    per-bucket recursion path."""
    import numpy as np
    import pyarrow.parquet as pq

    from weaver_ray.pipelines.relational import price_quantiles

    sf = "/root/testdata/sf0.001"
    vals = np.sort(pq.read_table(sf + "/lineitem.parquet",
                                 columns=["l_extendedprice"])
                   .column("l_extendedprice").to_numpy())
    n = len(vals)
    qs = (0.25, 0.5, 0.9, 0.99)
    want = {q: float(vals[max(0, int(np.ceil(q * n)) - 1)]) for q in qs}
    for budget in (5_000_000, 2):  # fast path AND forced recursion
        out = price_quantiles(sf, qs, collect_budget=budget)
        got = dict(zip(out["quantile"], out["value"]))
        assert got == want, (budget, got, want)


def test_price_quantiles_duplicate_pileup(ray_session, tmp_path):
    """A value repeated past the collect budget cannot be separated by
    range splitting; the distinct-histogram fallback must still return
    the exact element."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from weaver_ray.pipelines.relational import price_quantiles

    rng = np.random.default_rng(7)
    vals = np.concatenate([np.full(2000, 5.0),
                           rng.uniform(10, 20, 500).round(2)])
    pq.write_table(pa.table({"l_extendedprice": vals}),
                   tmp_path / "lineitem.parquet")
    s = np.sort(vals)
    n = len(s)
    qs = (0.25, 0.5, 0.9)
    out = price_quantiles(str(tmp_path), qs, collect_budget=100)
    got = dict(zip(out["quantile"], out["value"]))
    want = {q: float(s[max(0, int(np.ceil(q * n)) - 1)]) for q in qs}
    assert got == want


def test_price_quantiles_cont_interpolates(ray_session):
    """percentile_cont flavor: linear interpolation between the two order
    statistics around q*(n-1), checked against numpy's 'linear' method —
    including with a tiny collect budget forcing the recursion path."""
    import numpy as np
    import pyarrow.parquet as pq

    from weaver_ray.pipelines.relational import price_quantiles

    sf = "/root/testdata/sf0.001"
    vals = np.sort(pq.read_table(sf + "/lineitem.parquet",
                                 columns=["l_extendedprice"])
                   .column("l_extendedprice").to_numpy())
    qs = (0.25, 0.5, 0.9, 0.99)
    want = {q: round(float(np.quantile(vals, q, method="linear")), 4)
            for q in qs}
    for budget in (5_000_000, 2):
        out = price_quantiles(sf, qs, collect_budget=budget, method="cont")
        got = dict(zip(out["quantile"], out["value"]))
        assert got == want, (budget, got, want)


def test_token_postings_inverted_index(ray_session, tmp_path):
    """Postings are ascending doc_ids, df equals the posting length, and a
    token in k docs appears exactly once with k entries."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from weaver_ray.pipelines.common import to_table
    from weaver_ray.pipelines.textops import token_postings

    texts = ["alpha beta gamma", "beta gamma", "gamma ALPHA alpha"]
    pq.write_table(pa.table({
        "doc_id": pa.array([10, 2, 7], pa.int64()),
        "text": pa.array(texts), "lang": pa.array(["en"] * 3),
        "source": pa.array(["s"] * 3),
        "n_chars": pa.array([len(t) for t in texts], pa.int64()),
    }), tmp_path / "documents.parquet")
    out = (to_table(token_postings(str(tmp_path), num_buckets=4))
           .to_pandas().set_index("token"))
    assert out.loc["gamma", "postings"] == "2,7,10"
    assert out.loc["gamma", "df"] == 3
    assert out.loc["alpha", "postings"] == "7,10"  # case-folded, per-doc distinct
    assert out.loc["beta", "df"] == 2
    assert len(out) == 3


def test_heavy_hitter_tokens_bounds(ray_session):
    """Mergeable frequent-items sketch: in the truncating regime every
    returned token's undercount stays within the recorded bound; with a
    roomy budget the sketch degenerates to exact (bound 0, recall 1)."""
    from weaver_ray.pipelines.textops import heavy_hitter_tokens

    sf = "/root/testdata/sf0.001"
    tight = heavy_hitter_tokens(sf, k=10, c=5)
    assert tight["bound_ok"].all()
    assert (tight["est_n"] <= tight["exact_n"]).all()
    assert (tight["exact_n"] - tight["est_n"] <= tight["bound"]).all()
    roomy = heavy_hitter_tokens(sf, k=10, c=500)
    assert roomy["bound"].eq(0).all()
    assert roomy["bound_ok"].all() and roomy["in_exact_topk"].all()
    assert (roomy["est_n"] == roomy["exact_n"]).all()
    # deterministic output
    again = heavy_hitter_tokens(sf, k=10, c=5)
    assert tight.equals(again)


def test_repetition_filter_blocks_boilerplate(ray_session, tmp_path):
    """Gopher-style gate: a top-bigram-dominated doc and a duplicate-
    trigram-dominated doc are dropped; varied text passes."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from weaver_ray.pipelines.textops import repetition_filter_docs

    clean = ("alpha bravo charlie delta echo foxtrot golf hotel india "
             "juliet kilo lima mike november oscar papa quebec romeo "
             "sierra tango uniform victor whiskey xray")  # 24 distinct words
    docs = pa.table({
        "doc_id": pa.array([1, 2, 3], pa.int64()),
        "text": ["buy now " * 50, clean, "a b c " * 30],
    })
    pq.write_table(docs, str(tmp_path / "documents.parquet"))
    out = repetition_filter_docs(str(tmp_path)).to_pandas()
    assert set(out["doc_id"]) == {2}
    row = out.set_index("doc_id").loc[2]
    assert row["n_tokens"] == 24
    assert row["dup3_frac"] == 0.0


def test_contamination_overlap_counts_shared_grams(ray_session, tmp_path):
    """Decontamination check: a doc sharing two distinct word 4-grams with
    the benchmark subset (doc_id % 53 == 0) is flagged with that exact
    count; disjoint docs are absent."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from weaver_ray.pipelines.textops import contamination_overlap_docs

    bench = "zulu yankee xray whiskey victor uniform"
    docs = pa.table({
        "doc_id": pa.array([0, 7, 9], pa.int64()),  # 0 -> benchmark side
        "text": [bench,
                 "prefix zulu yankee xray whiskey victor suffix suffix",
                 "totally clean words nothing shared here at all"],
    })
    pq.write_table(docs, str(tmp_path / "documents.parquet"))
    out = contamination_overlap_docs(str(tmp_path)).to_pandas()
    assert set(out["doc_id"]) == {7}
    # shared 4-grams: "zulu yankee xray whiskey" and "yankee xray whiskey
    # victor"; the benchmark's "xray whiskey victor uniform" does NOT occur
    # in doc 7 ("...victor suffix") -> exactly 2
    assert int(out.set_index("doc_id").loc[7, "n_overlap"]) == 2


def test_source_overlap_matrix_hand_computed(ray_session, tmp_path):
    """Cross-source gram matrix on a planted corpus: a gram shared by all
    three sources contributes to every pair; within-source duplication
    (same gram in two docs of one source) counts once; disjoint pairs are
    absent entirely."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from weaver_ray.pipelines.textops import source_overlap_matrix

    shared = "one two three four"          # in A, B and C -> all 3 pairs
    ab_only = "alpha bravo charlie delta"  # in A and B only
    docs = pa.table({
        "doc_id": pa.array([1, 2, 3, 4], pa.int64()),
        "source": pa.array(["A", "A", "B", "C"]),
        "text": [f"{shared} filler", f"{shared} {ab_only}",  # A twice: dedup
                 f"{ab_only} and {shared}", f"{shared} unrelated tail here"],
    })
    pq.write_table(docs, str(tmp_path / "documents.parquet"))
    out = source_overlap_matrix(str(tmp_path)).to_pandas()
    got = {(r.src_a, r.src_b): int(r.n_shared) for r in out.itertuples()}
    # A-B share "one two three four" + "alpha bravo charlie delta";
    # A-C and B-C share only the one common gram
    assert got == {("A", "B"): 2, ("A", "C"): 1, ("B", "C"): 1}


def test_curated_docs_is_stage_intersection(ray_session):
    """The composed curation pipeline equals the set intersection of its
    four stage outputs (and is non-trivial at sf0.001)."""
    from weaver_ray.pipelines import textops
    from weaver_ray.pipelines.dedup import neardup_canonical_docs_ds

    sf = "/root/testdata/sf0.001"
    cur = set(textops.curated_docs(sf).to_pandas()["doc_id"])
    q = set(textops.quality_filter_docs(sf).to_pandas()["doc_id"])
    r = set(textops.repetition_filter_docs(sf).to_pandas()["doc_id"])
    e = set(textops.exact_dedup_docs(sf).to_pandas()["keeper_doc_id"])
    n = set(neardup_canonical_docs_ds(sf, threshold=0.8).to_pandas()["doc_id"])
    assert cur == q & r & e & n
    assert 1 < len(cur) < 500  # non-degenerate: the gates drop documents
    # without collapsing everything into a single cluster survivor


def test_unigram_logprob_hand_computed(ray_session, tmp_path):
    """Unigram LM score on a hand-checkable corpus: counts aa=2 bb=2 cc=1
    (total 5); doc 1 = 'aa aa bb' -> mean ln(0.4); doc 2 = 'bb cc' ->
    (ln 0.4 + ln 0.2)/2."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from weaver_ray.pipelines.textops import unigram_logprob_docs

    docs = pa.table({
        "doc_id": pa.array([1, 2], pa.int64()),
        "text": ["aa aa bb", "bb cc"],
    })
    pq.write_table(docs, str(tmp_path / "documents.parquet"))
    out = unigram_logprob_docs(str(tmp_path)).to_pandas().set_index("doc_id")
    assert out.loc[1, "n_tokens"] == 3 and out.loc[2, "n_tokens"] == 2
    assert out.loc[1, "avg_logprob"] == round(np.log(0.4), 4)
    assert out.loc[2, "avg_logprob"] == -1.2629


def test_bm25_topk_hand_computed(ray_session, tmp_path):
    """BM25 on a 3-doc corpus vs an independent textbook computation; a
    doc with no query term is absent; higher-tf doc ranks first."""
    import math

    import pyarrow as pa
    import pyarrow.parquet as pq

    from weaver_ray.pipelines.textops import bm25_topk

    docs = pa.table({
        "doc_id": pa.array([1, 2, 3], pa.int64()),
        "text": ["data data merge other words here",
                 "data only once in this one",
                 "nothing relevant at all"],
    })
    pq.write_table(docs, str(tmp_path / "documents.parquet"))
    out = bm25_topk(str(tmp_path), terms=("data", "merge"))
    assert list(out["doc_id"]) == [1, 2]
    assert list(out["rank"]) == [1, 2]

    # independent recompute (k1=1.2, b=0.75, dl in \w+ tokens)
    k1, b = 1.2, 0.75
    N, avgdl = 3.0, (6 + 6 + 4) / 3.0
    def idf(df): return math.log(1 + (N - df + 0.5) / (df + 0.5))
    def term(tf, dl, df):
        return idf(df) * (tf * (k1 + 1)) / (tf + k1 * (1 - b + b * dl / avgdl))
    want1 = round(term(2, 6, 2) + term(1, 6, 1), 4)
    want2 = round(term(1, 6, 2) + term(0, 6, 1), 4)
    assert abs(float(out["score"][0]) - want1) < 1e-9
    assert abs(float(out["score"][1]) - want2) < 1e-9


def test_pii_redact_hand_computed(ray_session, tmp_path):
    """doc 77 gains both planted PII shapes (77%7==0 and 77%11==0) and is
    redacted in email-then-IP order; doc 3 is untouched."""
    import hashlib

    import pyarrow as pa
    import pyarrow.parquet as pq

    from weaver_ray.pipelines.textops import pii_redact_docs

    docs = pa.table({
        "doc_id": pa.array([77, 3], pa.int64()),
        "text": ["hello world", "plain words"],
    })
    pq.write_table(docs, str(tmp_path / "documents.parquet"))
    out = (pii_redact_docs(str(tmp_path)).to_pandas()
           .set_index("doc_id").sort_index())
    assert out.loc[77, "n_emails"] == 1 and out.loc[77, "n_ips"] == 1
    want = "hello world contact <EMAIL> now from <IP>"
    assert out.loc[77, "red_md5"] == hashlib.md5(want.encode()).hexdigest()
    assert out.loc[3, "n_emails"] == 0 and out.loc[3, "n_ips"] == 0
    assert out.loc[3, "red_md5"] == hashlib.md5(b"plain words").hexdigest()


def test_source_cap_docs_matches_independent_rank(ray_session, tmp_path):
    """Cap=5 over 3 sources x 40 docs: exactly the 5 smallest-md5 docs
    per source survive, ranks are 1..5, independent recompute agrees."""
    import hashlib

    import pyarrow as pa
    import pyarrow.parquet as pq

    from weaver_ray.pipelines.textops import source_cap_docs

    ids = list(range(120))
    src = [f"src{i % 3}" for i in ids]
    docs = pa.table({"doc_id": pa.array(ids, pa.int64()),
                     "source": src,
                     "text": ["x"] * len(ids)})
    pq.write_table(docs, str(tmp_path / "documents.parquet"))
    out = source_cap_docs(str(tmp_path), cap=5).to_pandas()
    assert len(out) == 15
    assert all(sorted(g) == [1, 2, 3, 4, 5]
               for _, g in out.groupby("source")["cap_rank"])
    for s in ["src0", "src1", "src2"]:
        want = sorted((d for d in ids if f"src{d % 3}" == s),
                      key=lambda d: (hashlib.md5(str(d).encode()).hexdigest(), d))[:5]
        got = out[out["source"] == s].sort_values("cap_rank")["doc_id"].tolist()
        assert got == want, s


def test_kmeans_matches_independent_lloyd(ray_session):
    """Engine k-means == a from-scratch single-process numpy Lloyd run on
    the same init (k lowest vec_ids), same fixed iteration count."""
    import numpy as np
    import pyarrow.parquet as pq

    from weaver_ray.pipelines.similarity import kmeans_clusters

    sf = "/root/testdata/sf0.001"
    k, iters = 4, 2
    out = kmeans_clusters(sf, k=k, n_iters=iters)
    t = pq.read_table(sf + "/embeddings.parquet",
                      columns=["vec_id", "embedding"])
    ids = t["vec_id"].to_numpy()
    X = np.stack([np.asarray(v, np.float64) for v in t["embedding"].to_pylist()])
    X = X[np.argsort(ids)]
    C = X[:k].copy()
    for _ in range(iters):
        d2 = ((X[:, None, :] - C[None, :, :]) ** 2).sum(axis=2)
        a = d2.argmin(axis=1)
        cnt = np.bincount(a, minlength=k)
        for c in range(k):
            if cnt[c]:
                C[c] = X[a == c].mean(axis=0)
    got = out.pivot(index="cluster", columns="dim", values="centroid").to_numpy()
    assert np.allclose(got, C.round(4), atol=1e-9)
    n = out[out["dim"] == 1].set_index("cluster")["n"].to_numpy()
    assert (n == cnt).all() and n.sum() == len(X)


def test_semantic_dedup_matches_independent_recompute(ray_session, tmp_path):
    """Planted exact-duplicate directions collapse to the lowest vec_id;
    the full keeper set equals a from-scratch single-process recompute
    (same init, same quantized grids)."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from weaver_ray.pipelines.similarity import semantic_dedup_keepers

    rng = np.random.default_rng(7)
    X = rng.normal(size=(60, 64)).astype(np.float32)
    X[13] = X[2] * 2.0   # same direction as vec 2 -> cos == 1, must prune
    X[44] = X[2] * 0.5
    t = pa.table({"vec_id": pa.array(range(60), pa.int64()),
                  "embedding": pa.array([list(map(float, r)) for r in X],
                                        pa.list_(pa.float32()))})
    pq.write_table(t, str(tmp_path / "embeddings.parquet"))

    out = semantic_dedup_keepers(str(tmp_path), k=4, n_iters=2,
                                 threshold=0.9).to_pandas()
    kept = set(out["vec_id"])
    assert 2 in kept and 13 not in kept and 44 not in kept

    # independent recompute: Lloyd + within-cluster lower-id prune
    Xd = X.astype(np.float64)
    C = Xd[:4].copy()
    for _ in range(2):
        d2 = ((Xd[:, None, :] - C[None, :, :]) ** 2).sum(axis=2)
        a = np.argmin(np.floor(d2 * 1e9 + 0.5), axis=1)
        for c in range(4):
            if (a == c).any():
                C[c] = Xd[a == c].mean(axis=0)
    Cr = C.round(4)
    d2 = ((Xd[:, None, :] - Cr[None, :, :]) ** 2).sum(axis=2)
    a = np.argmin(np.floor(d2 * 1e9 + 0.5), axis=1)
    nrm = np.linalg.norm(Xd, axis=1)
    cos = (Xd @ Xd.T) / np.outer(nrm, nrm)
    cos_q = np.floor(cos * 1e9 + 0.5) / 1e9
    want = {i for i in range(60)
            if not any(cos_q[i, j] >= 0.9 and a[j] == a[i]
                       for j in range(i))}
    assert kept == want


def test_pq_codebooks_match_independent_subspace_lloyd(ray_session):
    """Engine PQ == m from-scratch numpy Lloyd runs, one per contiguous
    dim slice, on the same init (k lowest vec_ids' slices) and the same
    fixed iteration count — proves the single-pass multi-subspace
    scatter-add reduce is exactly m independent sub-quantizers."""
    import numpy as np
    import pyarrow.parquet as pq

    from weaver_ray.pipelines.similarity import pq_codebooks

    sf = "/root/testdata/sf0.001"
    m, k, iters = 4, 8, 2
    out = pq_codebooks(sf, m=m, k=k, n_iters=iters)
    t = pq.read_table(sf + "/embeddings.parquet",
                      columns=["vec_id", "embedding"])
    ids = t["vec_id"].to_numpy()
    X = np.stack([np.asarray(v, np.float64) for v in t["embedding"].to_pylist()])
    X = X[np.argsort(ids)]
    dim = X.shape[1]
    sub = dim // m
    for s in range(m):
        Xs = X[:, s * sub:(s + 1) * sub]
        C = Xs[:k].copy()
        for _ in range(iters):
            d2 = ((Xs[:, None, :] - C[None, :, :]) ** 2).sum(axis=2)
            a = np.argmin(np.floor(d2 * 1e9 + 0.5), axis=1)
            cnt = np.bincount(a, minlength=k)
            for c in range(k):
                if cnt[c]:
                    C[c] = Xs[a == c].mean(axis=0)
        part = out[out["subspace"] == s]
        got = part.pivot(index="code", columns="dim",
                         values="centroid").to_numpy()
        assert np.allclose(got, C.round(4), atol=1e-9), s
        n = part[part["dim"] == s * sub + 1].set_index("code")["n"].to_numpy()
        assert (n == cnt).all() and n.sum() == len(X), s


def test_pq_adc_topk_matches_independent_recompute(ray_session):
    """Engine PQ-ADC search == a from-scratch numpy recompute: train m
    sub-Lloyd codebooks independently, round to 4 dp, encode the corpus,
    rank each query's sum-over-subspace distances on the 1e-9 grid."""
    import numpy as np
    import pyarrow.parquet as pq

    from weaver_ray.pipelines.similarity import pq_adc_topk

    sf = "/root/testdata/sf0.001"
    m, k, iters, nq, topk = 4, 16, 2, 5, 10
    out = pq_adc_topk(sf, m=m, k=k, n_iters=iters, n_queries=nq, topk=topk)
    t = pq.read_table(sf + "/embeddings.parquet",
                      columns=["vec_id", "embedding"])
    ids = t["vec_id"].to_numpy()
    X = np.stack([np.asarray(v, np.float64) for v in t["embedding"].to_pylist()])
    o = np.argsort(ids)
    ids, X = ids[o], X[o]
    dim = X.shape[1]
    sub = dim // m
    Cq = np.zeros((m, k, sub))
    for s in range(m):
        Xs = X[:, s * sub:(s + 1) * sub]
        C = Xs[:k].copy()
        for _ in range(iters):
            d2 = ((Xs[:, None, :] - C[None, :, :]) ** 2).sum(axis=2)
            a = np.argmin(np.floor(d2 * 1e9 + 0.5), axis=1)
            for c in range(k):
                if (a == c).any():
                    C[c] = Xs[a == c].mean(axis=0)
        Cq[s] = np.sign(C) * np.floor(np.abs(C) * 1e4 + 0.5) / 1e4
    codes = np.zeros((len(ids), m), dtype=np.int64)
    for s in range(m):
        d2 = ((X[:, None, s * sub:(s + 1) * sub]
               - Cq[s][None, :, :]) ** 2).sum(axis=2)
        codes[:, s] = np.argmin(np.floor(d2 * 1e9 + 0.5), axis=1)
    for qi in range(nq):
        q = X[ids == qi][0]
        T = ((q.reshape(m, 1, sub) - Cq) ** 2).sum(axis=2)  # m x k
        dist = T[np.arange(m)[None, :], codes].sum(axis=1)
        grid = np.floor(dist * 1e9 + 0.5)
        mask = ids != qi
        order = np.lexsort((ids[mask], grid[mask]))[:topk]
        want = ids[mask][order].tolist()
        got = out[out["query_id"] == qi].sort_values("adc_rank")[
            "neighbor_id"].tolist()
        assert got == want, qi


def test_duplicated_span_docs_planted(ray_session, tmp_path):
    """Planted shared spans are found exactly: docs 0 and 1 share one
    4-gram span, doc 2 is unique, doc 3 is too short for any gram."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from weaver_ray.pipelines.textops import duplicated_span_docs

    texts = [
        "alpha beta gamma delta unique0 tail0",   # grams: 3; 1 shared
        "head1 alpha beta gamma delta unique1",   # grams: 3; 1 shared
        "wholly distinct words nothing common here",  # 3 grams; 0 shared
        "too short",                               # no 4-gram
    ]
    t = pa.table({"doc_id": pa.array(range(4), pa.int64()),
                  "text": pa.array(texts, pa.string())})
    pq.write_table(t, str(tmp_path / "documents.parquet"))

    out = duplicated_span_docs(str(tmp_path)).to_pandas()
    out = out.set_index("doc_id").sort_index()
    assert list(out.index) == [0, 1, 2]  # doc 3 has no grams
    assert out.loc[0, "n_grams"] == 3 and out.loc[0, "n_dup_grams"] == 1
    assert out.loc[1, "n_grams"] == 3 and out.loc[1, "n_dup_grams"] == 1
    assert out.loc[2, "n_grams"] == 3 and out.loc[2, "n_dup_grams"] == 0
    assert np.isclose(out.loc[0, "dup_frac"], 0.3333)


def test_event_funnel_strictly_after_semantics(ray_session, tmp_path):
    """A later-step event at or before the previous step's earliest
    completion does not count; earliest completions chain correctly."""
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    from weaver_ray.pipelines.relational import event_funnel

    base = pd.Timestamp("2026-01-01")

    def ev(uid, typ, secs):
        return {"user_id": uid, "event_type": typ,
                "ts": base + pd.Timedelta(seconds=secs)}

    rows = [
        # user 1: full funnel in order -> 3
        ev(1, "view", 0), ev(1, "click", 10), ev(1, "purchase", 20),
        # user 2: click BEFORE the view -> stuck at 1
        ev(2, "click", 0), ev(2, "view", 10),
        # user 3: click at the SAME ts as view (not strictly after) -> 1
        ev(3, "view", 0), ev(3, "click", 0),
        # user 4: purchase without click -> 1 (steps are ordered)
        ev(4, "view", 0), ev(4, "purchase", 5),
        # user 5: no view at all -> absent
        ev(5, "click", 0), ev(5, "purchase", 1),
        # user 6: second view earlier than first click; earliest view is
        # what chains -> click counts -> 2
        ev(6, "view", 100), ev(6, "view", 0), ev(6, "click", 50),
    ]
    df = pd.DataFrame(rows)
    pq.write_table(pa.Table.from_pandas(df, preserve_index=False),
                   str(tmp_path / "events.parquet"))
    out = event_funnel(str(tmp_path)).to_pandas().set_index("user_id")
    assert out["steps_completed"].to_dict() == {1: 3, 2: 1, 3: 1, 4: 1, 6: 2}


def test_orders_above_customer_avg_boundaries(ray_session, tmp_path):
    """Single-order customers sit exactly on their own average and are
    excluded; only strictly-above orders survive."""
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    from weaver_ray.pipelines.relational import orders_above_customer_avg

    df = pd.DataFrame({
        "o_orderkey": [1, 2, 3, 4, 5],
        "o_custkey": [10, 20, 20, 30, 30],
        # cust 20: avg 150 -> only order 3 (200) above
        # cust 30: both exactly 99.99 -> avg == price -> none above
        "o_totalprice": [500.0, 100.0, 200.0, 99.99, 99.99],
    })
    pq.write_table(pa.Table.from_pandas(df, preserve_index=False),
                   str(tmp_path / "orders.parquet"))
    out = orders_above_customer_avg(str(tmp_path)).to_pandas()
    assert sorted(out["o_orderkey"].tolist()) == [3]


def test_approx_distinct_register_identical_to_single_process(ray_session):
    """The distributed per-batch-sketch + register-max merge must produce
    the EXACT single-process HLL — not merely an estimate within
    tolerance.  Register-max is associative/commutative and per-key ranks
    are deterministic, so any batching of the same multiset yields
    identical registers; the query's estimate must therefore equal the
    replay's bit-for-bit (the strongest check a probabilistic sketch
    admits, and it pins the whole distributed wiring, not the formula)."""
    import numpy as np
    import pyarrow.parquet as pq

    from weaver_ray.functions.sketches import HyperLogLog
    from weaver_ray.pipelines.relational import approx_distinct_users

    out = approx_distinct_users(SF)
    users = pq.read_table(SF + "/events.parquet", columns=["user_id"])
    h = HyperLogLog()
    h.add(users.column("user_id").to_numpy(zero_copy_only=False).astype(np.uint64))
    assert int(out["n_users_approx"][0]) == int(round(h.estimate()))
    assert int(out["n_users_exact"][0]) == len(
        set(users.column("user_id").to_pylist()))


def test_token_stats_avg_exact_dyadic_tie(ray_session, tmp_path):
    """Deterministic 4 dp rounding TIE for the ratio-average class swept
    to sql_round in r5: 32 docs (2^5) with an ODD token sum make
    avg·10^4 = sum·625/2 exactly half-integral in double — 65/32 =
    2.03125 → DuckDB (half away) says 2.0313 where numpy banker's said
    2.0312.  Engine is compared to the SHIPPED oracle SQL and the tie
    value is asserted directly as a regression canary."""
    import duckdb
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    from weaver_ray.pipelines.textops import token_stats_by_lang

    texts = ["tok tok"] * 31 + ["tok tok tok"]          # lang aa: sum 65, n 32
    texts2 = ["one two three"] * 3                      # lang bb: no tie
    pq.write_table(pa.table({
        "doc_id": pa.array(range(len(texts) + len(texts2)), pa.int64()),
        "text": pa.array(texts + texts2),
        "lang": pa.array(["aa"] * len(texts) + ["bb"] * len(texts2)),
        "source": pa.array(["s"] * (len(texts) + len(texts2))),
        "n_chars": pa.array([len(t) for t in texts + texts2], pa.int64()),
    }), tmp_path / "documents.parquet")

    got = (token_stats_by_lang(str(tmp_path))
           .sort_values("lang").reset_index(drop=True))
    assert got.loc[0, "avg_tokens"] == 2.0313  # the tie, rounded half AWAY

    import __ray_entry__ as entrymod
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{tmp_path}/documents.parquet')")
    want = (con.execute(entrymod.oracle_sql()["token_stats_by_lang"]).df()
            .sort_values("lang").reset_index(drop=True))
    pd.testing.assert_frame_equal(
        got[want.columns], want, check_dtype=False, check_exact=True)
