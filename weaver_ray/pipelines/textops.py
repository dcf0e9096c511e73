"""Text-analysis operators over the ``documents`` table: token counting,
quality scoring, language-ID, fingerprinting, exact dedup.

These are the training-data-pipeline operators the task brief adds beyond
the reference's own inventory; each SQL-expressible one has a DuckDB oracle
in __ray_entry__.py (regex semantics chosen to agree between Python ``re``
and DuckDB's RE2: ``\\w+`` tokens, ``\\b(the|a|...)\\b`` stopwords).
"""

from __future__ import annotations

import hashlib
import re

import numpy as np
import pandas as pd
import ray.data as rd

from .common import load, partial_groupby, sql_round

TOKEN_RE = r"\w+"
STOPWORDS = ("the", "a", "and", "of", "to")
STOP_RE = r"\b(?:the|a|and|of|to)\b"
# BPE-ish pre-tokenizer (GPT-2 style split classes, simplified, public regex idiom)
BPE_RE = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]+"


def _token_features(batch: pd.DataFrame) -> pd.DataFrame:
    """Stateless token-feature stage (regex state is module-level — compiled
    once per worker process at import; an actor pool's spin-up would cost
    more than the state it amortizes)."""
    text = batch["text"]
    batch = batch.copy()
    batch["n_tokens"] = text.str.count(TOKEN_RE).astype(np.int64)
    batch["n_stop"] = text.str.count(STOP_RE).astype(np.int64)
    batch["n_bpe"] = text.str.count(BPE_RE).astype(np.int64)
    return batch


def token_stats_by_lang(sf_dir: str) -> pd.DataFrame:
    """Per-lang token totals (whitespace/regex tokenizer + BPE-ish count)."""
    ds = load(sf_dir, "documents", ["doc_id", "text", "lang"])
    feat = ds.map_batches(_token_features, batch_format="pandas")
    out = partial_groupby(
        feat, ["lang"],
        {"n_docs": ("doc_id", "count"), "sum_tokens": ("n_tokens", "sum"),
         "sum_bpe_tokens": ("n_bpe", "sum")},
    ).to_pandas()
    out["avg_tokens"] = sql_round(out["sum_tokens"] / out["n_docs"], 4)
    for c in ("n_docs", "sum_tokens", "sum_bpe_tokens"):
        out[c] = out[c].astype(np.int64)
    return out


def quality_by_source(sf_dir: str) -> pd.DataFrame:
    """Quality-score features aggregated per source: doc length, stopword
    ratio (length/punct/stopword family of heuristics)."""
    ds = load(sf_dir, "documents", ["doc_id", "text", "source", "n_chars"])
    feat = ds.map_batches(_token_features, batch_format="pandas")

    def ratios(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["stop_ratio"] = df["n_stop"] / df["n_tokens"].clip(lower=1)
        return df

    out = partial_groupby(
        feat, ["source"],
        {"n_docs": ("doc_id", "count"), "sum_chars": ("n_chars", "sum"),
         "sum_stop_ratio": ("stop_ratio", "sum")},
        prep=ratios,
    ).to_pandas()
    out["avg_chars"] = sql_round(out["sum_chars"] / out["n_docs"], 4)
    out["avg_stop_ratio"] = sql_round(out["sum_stop_ratio"] / out["n_docs"], 6)
    out["n_docs"] = out["n_docs"].astype(np.int64)
    return out[["source", "n_docs", "avg_chars", "avg_stop_ratio"]]


def quality_filter_docs(sf_dir: str, min_words: int = 10,
                        min_wl: float = 2.0, max_wl: float = 10.0) -> rd.Dataset:
    """C4-style document quality FILTER: keep documents with enough alpha
    words, a sane mean word length, and at least one English stopword — the
    gating step a training-data pipeline runs before dedup.  Pure
    vectorized ``str.count`` / ``str.contains`` per batch (no row loop, no
    shuffle: a filter is embarrassingly parallel), emitting the computed
    features alongside the ids so the decision is auditable.  Word = alpha
    run ``[A-Za-z]+`` (identical under Python re and DuckDB RE2, unlike
    ``\\w``'s unicode classes)."""
    ds = load(sf_dir, "documents", ["doc_id", "text"])

    def keep(df: pd.DataFrame) -> pd.DataFrame:
        text = df["text"]
        n_words = text.str.count(r"[A-Za-z]+").astype(np.int64)
        n_alpha = text.str.count(r"[A-Za-z]").astype(np.int64)
        mean_wl = n_alpha / n_words.clip(lower=1)
        has_stop = text.str.contains(STOP_RE, regex=True)
        mask = ((n_words >= min_words) & (mean_wl >= min_wl)
                & (mean_wl <= max_wl) & has_stop)
        return pd.DataFrame({
            "doc_id": df["doc_id"].to_numpy(np.int64),
            "n_words": n_words.to_numpy(),
            # half-away rounding: these int ratios land exactly on halves
            "mean_word_len": sql_round(mean_wl, 4),
        })[mask.to_numpy()]

    return ds.map_batches(keep, batch_format="pandas")


def doc_token_counts(sf_dir: str) -> rd.Dataset:
    """Per-document token + distinct-token counts."""
    ds = load(sf_dir, "documents", ["doc_id", "text"])
    token_re = re.compile(TOKEN_RE)

    def counts(df: pd.DataFrame) -> pd.DataFrame:
        toks = df["text"].map(token_re.findall)
        return pd.DataFrame(
            {
                "doc_id": df["doc_id"].to_numpy(),
                "n_tokens": toks.map(len).astype(np.int64),
                "n_uniq_tokens": toks.map(lambda ws: len(set(ws))).astype(np.int64),
            }
        )

    return ds.map_batches(counts, batch_format="pandas")


def exact_dedup_docs(sf_dir: str) -> rd.Dataset:
    """Exact dedup: content-hash -> hash-partitioned groupby -> first-wins
    (keeper = min doc_id).  Reference analog D2 (first-wins by URL,
    src/client/main.go:178-192); here the key is md5(text)."""
    ds = load(sf_dir, "documents", ["doc_id", "text"])

    def add_hash(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "doc_id": df["doc_id"].to_numpy(),
                "text_hash": [hashlib.md5(t.encode()).hexdigest() for t in df["text"]],
            }
        )

    hashed = ds.map_batches(add_hash, batch_format="pandas")

    def first_wins(bucket: pd.DataFrame) -> pd.DataFrame:
        # complete hash groups per bucket (keyed_map_groups) — first-wins
        # is ONE vectorized groupby over the bucket, not a call per hash
        gg = bucket.groupby("text_hash", sort=False)
        out = gg.agg(keeper_doc_id=("doc_id", "min"),
                     dup_count=("doc_id", "size")).reset_index()
        out["keeper_doc_id"] = out["keeper_doc_id"].astype(np.int64)
        out["dup_count"] = out["dup_count"].astype(np.int64)
        return out

    from .common import keyed_map_groups

    return keyed_map_groups(hashed, "text_hash", first_wins)


def clean_text_hashes(sf_dir: str) -> rd.Dataset:
    """Text-normalization TRANSFORM (lowercase, collapse whitespace runs to
    one space, strip ends) with the oracle checking the transformed strings
    THEMSELVES — output is (doc_id, md5(clean_text), clean_len), so the
    value-hash compare certifies every per-row result, not an aggregate of
    them.  The string ops are vectorized pandas str kernels; only the final
    digest is a per-row hashlib call (same precedent as exact_dedup_docs's
    content hash)."""
    ds = load(sf_dir, "documents", ["doc_id", "text"])

    def clean(df: pd.DataFrame) -> pd.DataFrame:
        # explicit ASCII whitespace class + space-only strip: DuckDB's RE2
        # '\s' is [\t\n\f\r ] (no \x0b, no unicode spaces) and trim() strips
        # only ' ' — Python's \s / str.strip() are wider and would diverge
        # from the oracle on a vertical tab or \xa0
        t = (df["text"].str.lower()
             .str.replace(r"[\t\n\f\r ]+", " ", regex=True).str.strip(" "))
        return pd.DataFrame({
            "doc_id": df["doc_id"].astype(np.int64),
            "clean_md5": [hashlib.md5(s.encode()).hexdigest() for s in t],
            "clean_len": t.str.len().astype(np.int64),
        })

    return ds.map_batches(clean, batch_format="pandas")


def vocab_top_tokens(sf_dir: str, k: int = 50) -> pd.DataFrame:
    """Global token-frequency top-k (the wordcount of training-data
    pipelines): per-batch vectorized value_counts -> partial-agg groupby sum
    (the shuffle moves one row per (token, batch)) -> distributed sort +
    limit.  Deterministic ties: (count desc, token asc) on both sides."""
    ds = load(sf_dir, "documents", ["text"])

    def counts(df: pd.DataFrame) -> pd.DataFrame:
        vc = df["text"].str.findall(TOKEN_RE).explode().value_counts()
        return pd.DataFrame({"token": vc.index.astype(str), "n": vc.to_numpy()})

    parts = ds.map_batches(counts, batch_format="pandas")
    # vocabulary-sized key cardinality — the bucketed exchange reduce
    # (now partial_groupby's only path) is flat in key count
    agg = partial_groupby(parts, ["token"], {"n": ("n", "sum")}, many_groups=True)
    out = agg.sort(["n", "token"], descending=[True, False]).limit(k).to_pandas()
    out["n"] = out["n"].astype(np.int64)
    return out.reset_index(drop=True)


def bigram_logprob_docs(sf_dir: str, num_buckets: int = 16) -> rd.Dataset:
    """BIGRAM language-model quality scoring — the CCNet/KenLM-filter
    shape one order up from :func:`unigram_logprob_docs`: each document
    scores the mean log2 of add-one-smoothed bigram probabilities
    P(w_i | w_{i-1}) = (c(w_{i-1} w_i) + 1) / (c(w_{i-1}) + V) under a
    model trained on the corpus itself (c = corpus bigram counts within
    documents, V = distinct-token vocabulary).  Low scores mark
    incoherent token ORDER, which the unigram score cannot see.

    Scale shape — model small, corpus huge (the unigram precedent):
    bigram counts AND the unigram vocabulary ride ONE partial reduce
    (unigram rows carry a ""-sentinel next column — tokens are \\w+,
    never empty); the resulting model table is vocabulary^2-bounded,
    broadcast once via ``ray.put``; scoring is one map_batches with a
    vectorized two-column merge + grouped mean.  Docs with < 2 tokens
    are excluded on both engines (no bigram exists).  Rounded 4 dp
    half-away both sides so FP summation order can't flip the hash."""
    import ray

    from .common import _cached_get

    ds = load(sf_dir, "documents", ["doc_id", "text"])

    def counts(df: pd.DataFrame) -> pd.DataFrame:
        toks = df["text"].str.findall(TOKEN_RE)
        prevs, nxts, unis = [], [], []
        for t in toks:
            unis.extend(t)
            if len(t) >= 2:
                prevs.extend(t[:-1])
                nxts.extend(t[1:])
        bg = (pd.DataFrame({"prev": np.asarray(prevs, dtype=object),
                            "nxt": np.asarray(nxts, dtype=object)})
              .groupby(["prev", "nxt"], sort=False).size().rename("n")
              .reset_index())
        un = (pd.Series(unis, dtype=object).value_counts()
              .rename_axis("prev").rename("n").reset_index())
        un["nxt"] = ""  # unigram sentinel rows (vocabulary + stream counts)
        return pd.concat([bg, un[["prev", "nxt", "n"]]], ignore_index=True)

    model = partial_groupby(ds.map_batches(counts, batch_format="pandas"),
                            ["prev", "nxt"], {"n": ("n", "sum")},
                            many_groups=True, num_buckets=num_buckets
                            ).to_pandas()
    model["n"] = model["n"].astype(np.int64)
    bc = model[model["nxt"] != ""]
    V = int((model["nxt"] == "").sum())  # distinct tokens in the stream
    cp = bc.groupby("prev")["n"].sum()  # bigram-prefix marginals
    bc_ref = ray.put(bc.set_index(["prev", "nxt"])["n"])
    cp_ref = ray.put(cp)

    def score(df: pd.DataFrame) -> pd.DataFrame:
        bcm, cpm = _cached_get(bc_ref), _cached_get(cp_ref)
        toks = df["text"].str.findall(TOKEN_RE)
        docs, prevs, nxts = [], [], []
        for did, t in zip(df["doc_id"].to_numpy(np.int64), toks):
            if len(t) >= 2:
                docs.extend([did] * (len(t) - 1))
                prevs.extend(t[:-1])
                nxts.extend(t[1:])
        if not docs:
            return pd.DataFrame({
                "doc_id": pd.Series([], dtype=np.int64),
                "n_bigrams": pd.Series([], dtype=np.int64),
                "avg_logprob": pd.Series([], dtype=np.float64)})
        g = pd.DataFrame({"doc_id": np.asarray(docs, np.int64),
                          "prev": np.asarray(prevs, dtype=object),
                          "nxt": np.asarray(nxts, dtype=object)})
        c = bcm.reindex(pd.MultiIndex.from_arrays([g["prev"], g["nxt"]])
                        ).fillna(0).to_numpy(np.int64)
        p = cpm.reindex(g["prev"]).fillna(0).to_numpy(np.int64)
        g["lp"] = np.log2((c + 1.0) / (p + float(V)))
        out = g.groupby("doc_id", sort=False).agg(
            n_bigrams=("lp", "size"), avg_logprob=("lp", "mean")
        ).reset_index()
        out["n_bigrams"] = out["n_bigrams"].astype(np.int64)
        out["avg_logprob"] = sql_round(out["avg_logprob"], 4)
        return out

    return ds.map_batches(score, batch_format="pandas")


def bigram_logprob_sql() -> str:
    """The DuckDB oracle: positional self-join for bigrams (unnest +
    generate_subscripts in lockstep), grouped counts, prefix marginals,
    the identical smoothed log2 ratio, avg rounded 4 dp."""
    return r"""
        WITH t AS (
            SELECT doc_id, generate_subscripts(w, 1) AS pos,
                   unnest(w) AS tok
            FROM (SELECT doc_id, regexp_extract_all(text, '\w+') AS w
                  FROM documents)
        ),
        bg AS (
            SELECT a.doc_id, a.tok AS prev, b.tok AS nxt
            FROM t a JOIN t b
              ON b.doc_id = a.doc_id AND b.pos = a.pos + 1
        ),
        bc AS (SELECT prev, nxt, count(*)::BIGINT AS c
               FROM bg GROUP BY prev, nxt),
        pc AS (SELECT prev, sum(c)::BIGINT AS cp FROM bc GROUP BY prev),
        v AS (SELECT count(DISTINCT tok)::BIGINT AS v FROM t),
        scored AS (
            SELECT g.doc_id,
                   log2((bc.c + 1)::DOUBLE / (pc.cp + v.v)::DOUBLE) AS lp
            FROM bg g
            JOIN bc ON bc.prev = g.prev AND bc.nxt = g.nxt
            JOIN pc ON pc.prev = g.prev, v
        )
        SELECT doc_id, count(*)::BIGINT AS n_bigrams,
               round(avg(lp), 4) AS avg_logprob
        FROM scored GROUP BY doc_id
    """


# PMI collocation contract shared by the engine defaults AND the registered
# SQL oracle (one source of truth): min doc co-occurrence and top-k cut
PMI_MIN_COUNT = 5
PMI_K = 20


def token_pmi_pairs(sf_dir: str, min_count: int = PMI_MIN_COUNT,
                    k: int = PMI_K, num_buckets: int = 16) -> pd.DataFrame:
    """TOP-K POINTWISE MUTUAL INFORMATION token pairs (Church & Hanks
    1990) from document-level co-occurrence — collocation mining, the
    classic phrase-discovery signal of corpus curation.  For lowercased
    distinct tokens a < b:  pmi = log2(N*c_ab / (c_a*c_b)) with N = doc
    count, c_* = document frequencies; pairs below ``min_count`` docs
    are dropped (sparse-count PMI is noise — the published caveat).

    Parity: every count is an exact integer; the single log2 argument is
    the SAME (N*c_ab)::float64 / (c_a*c_b)::float64 expression on both
    engines, rounded 6 dp BEFORE ranking (the bm25 round-then-rank rule)
    with the (pmi desc, a asc, b asc) total tiebreak.

    Scale shape: per-doc distinct-pair explode is bounded by the
    df-capped VOCABULARY squared, not the corpus (here the synthetic
    vocab; at web scale the standard top-V cap bounds it the same way);
    pair counts and unary dfs ride two many_groups partial reduces; the
    top-k folds on the O(V^2) driver table."""
    n_docs, dfc, p = _doc_cooccurrence_counts(sf_dir, min_count,
                                              num_buckets)
    ca = dfc.reindex(p["a"]).to_numpy(np.int64)
    cb = dfc.reindex(p["b"]).to_numpy(np.int64)
    cab = p["n"].to_numpy(np.int64)
    # cast factors to float64 BEFORE multiplying (the caption_pixels_corr
    # rule): an int64 product wraps silently at web-scale counts while the
    # oracle's BIGINT product errors loudly — a parity break, not a wrap
    pmi = sql_round(np.log2((float(n_docs) * cab.astype(np.float64))
                            / (ca.astype(np.float64)
                               * cb.astype(np.float64))), 6)
    out = pd.DataFrame({"a": p["a"].to_numpy(), "b": p["b"].to_numpy(),
                        "n_docs_ab": cab, "pmi": pmi})
    out = (out.sort_values(["pmi", "a", "b"],
                           ascending=[False, True, True])
           .head(k).reset_index(drop=True))
    out["rank"] = np.arange(1, len(out) + 1, dtype=np.int64)
    return out


def _doc_cooccurrence_counts(sf_dir: str, min_count: int,
                             num_buckets: int):
    """Shared doc-level co-occurrence machinery for the collocation
    scorers (PMI, LLR): returns (n_docs, unary-df Series, pair table
    with n >= min_count) from ONE sentinel-row reduce."""
    ds = load(sf_dir, "documents", ["doc_id", "text"])

    def pair_rows(df: pd.DataFrame) -> pd.DataFrame:
        toks = df["text"].str.lower().str.findall(TOKEN_RE)
        out_a, out_b = [], []
        uni = []
        for t in toks:
            u = sorted(set(t))
            uni.extend(u)
            m = len(u)
            if m >= 2:
                ua = np.asarray(u, dtype=object)
                ia, ib = np.triu_indices(m, k=1)
                out_a.append(ua[ia])
                out_b.append(ua[ib])
        empty = np.asarray([], dtype=object)
        pairs = pd.DataFrame(
            {"a": np.concatenate(out_a) if out_a else empty,
             "b": np.concatenate(out_b) if out_b else empty})
        pairs = pairs.groupby(["a", "b"], sort=False).size().rename(
            "n").reset_index()
        un = (pd.Series(uni, dtype=object).value_counts()
              .rename_axis("a").rename("n").reset_index())
        un["b"] = ""  # unary rows: b sentinel (tokens are \w+, never "")
        # doc-count sentinel row: N rides the SAME reduce (no second scan)
        nrow = pd.DataFrame({"a": [""], "b": [""], "n": [len(df)]})
        return pd.concat([pairs, un[["a", "b", "n"]], nrow],
                         ignore_index=True)

    agg = partial_groupby(ds.map_batches(pair_rows, batch_format="pandas"),
                          ["a", "b"], {"n": ("n", "sum")},
                          many_groups=True, num_buckets=num_buckets
                          ).to_pandas()
    agg["n"] = agg["n"].astype(np.int64)
    n_docs = int(agg.loc[(agg["a"] == "") & (agg["b"] == ""), "n"].sum())
    dfc = (agg[(agg["b"] == "") & (agg["a"] != "")].set_index("a")["n"])
    p = agg[(agg["b"] != "") & (agg["n"] >= min_count)].copy()
    return n_docs, dfc, p


def token_pmi_pairs_sql(min_count: int = PMI_MIN_COUNT,
                        k: int = PMI_K) -> str:
    """The DuckDB oracle: distinct (doc, token) explode, unary dfs, a
    same-doc self-join for pair dfs, then the identical rounded-PMI
    rank."""
    return f"""
        WITH u AS (
            SELECT DISTINCT doc_id,
                   unnest(regexp_extract_all(lower(text), '\\w+')) AS tok
            FROM documents
        ),
        nn AS (SELECT count(*)::BIGINT AS n FROM documents),
        df_ AS (SELECT tok, count(*)::BIGINT AS c FROM u GROUP BY tok),
        pc AS (
            SELECT a.tok AS a, b.tok AS b, count(*)::BIGINT AS cab
            FROM u a JOIN u b
              ON b.doc_id = a.doc_id AND b.tok > a.tok
            GROUP BY a.tok, b.tok
        ),
        s AS (
            SELECT pc.a, pc.b, pc.cab AS n_docs_ab,
                   round(log2((nn.n::DOUBLE * pc.cab::DOUBLE)
                              / (da.c::DOUBLE * db.c::DOUBLE)), 6) AS pmi
            FROM pc
            JOIN df_ da ON da.tok = pc.a
            JOIN df_ db ON db.tok = pc.b, nn
            WHERE pc.cab >= {min_count}
        )
        SELECT a, b, n_docs_ab, pmi,
               CAST(row_number() OVER (ORDER BY pmi DESC, a, b)
                    AS BIGINT) AS rank
        FROM s QUALIFY rank <= {k}
    """


def _md5_doc_key(doc_ids) -> list[str]:
    """The shared md5(doc_id) hash-rank key — the engine spelling of the
    oracle's ``md5(CAST(doc_id AS VARCHAR))``.  ONE definition so
    stratified sampling, the deterministic shuffle and the domain cap can
    never desynchronize from each other or their three SQL oracles."""
    from .common import md5_hex

    return md5_hex(str(int(d)) for d in doc_ids)


def stratified_sample_docs(sf_dir: str, per_group: int = 20) -> rd.Dataset:
    """Deterministic stratified sampling: the ``per_group`` docs with the
    smallest md5(doc_id) rank per language — balanced per-stratum subsets
    for training mixes, reproducible across engines (hash order, not RNG
    state, so the DuckDB oracle selects the identical rows)."""
    ds = load(sf_dir, "documents", ["doc_id", "lang"])

    def pick(bucket: pd.DataFrame) -> pd.DataFrame:
        # complete lang groups per bucket: rank by md5 within each lang
        # (one groupby-rank over the bucket), keep the per_group smallest
        g = bucket.assign(__k=_md5_doc_key(bucket["doc_id"]))
        g = g[g.groupby("lang", sort=False)["__k"].rank(method="first")
              <= per_group]
        return pd.DataFrame({"lang": g["lang"].to_numpy(),
                             "doc_id": g["doc_id"].to_numpy(np.int64)})

    from .common import keyed_map_groups

    return keyed_map_groups(ds, "lang", pick)


def tfidf_top_terms(sf_dir: str, k: int = 3) -> rd.Dataset:
    """Per-document top-k terms by tf-idf (tf * ln(N/df)) — the classic
    training-data relevance profile.

    Scale shape: (doc, token, tf) pairs are complete within each batch (a
    document is one row), document frequency is a many_groups partial
    aggregate over the pairs (one row per (token, batch) moves), the
    df-lookup is a token-bucketed hash join (vocabulary-sized side — too
    big to broadcast at corpus scale), and the per-doc top-k ranks inside
    doc_id-bucketed groups, vectorized across all docs per bucket.  Ties:
    (tf_idf desc, token asc), pinned on both engine and oracle."""
    from .common import hash_join, keyed_map_groups

    ds = load(sf_dir, "documents", ["doc_id", "text"])
    n_docs = ds.count()  # parquet metadata, no scan

    def tf_pairs(df: pd.DataFrame) -> pd.DataFrame:
        toks = df["text"].str.lower().str.findall(TOKEN_RE)
        pairs = (pd.DataFrame({"doc_id": df["doc_id"].to_numpy(), "token": toks})
                 .explode("token").dropna(subset=["token"]))
        tf = (pairs.groupby(["doc_id", "token"], sort=False).size()
              .reset_index(name="tf"))
        tf["tf"] = tf["tf"].astype(np.int64)
        return tf

    # materialize: `pairs` feeds BOTH the df aggregate and the join's left
    # side, and Ray Data re-executes a shared lazy subplan per consumer —
    # without this the tokenize+explode stage (the query's most expensive
    # scan) runs twice
    pairs = ds.map_batches(tf_pairs, batch_format="pandas").materialize()
    # df(token) = number of docs containing it: pairs are distinct per
    # (doc, token), so a count per token is exactly the document frequency
    dfreq = partial_groupby(pairs, ["token"], {"df": ("doc_id", "count")},
                            many_groups=True)
    joined = hash_join(pairs, dfreq, on="token",
                       lcols=["doc_id", "token", "tf"], rcols=["token", "df"])

    def topk(g: pd.DataFrame) -> pd.DataFrame:
        g = g.assign(tf_idf=g["tf"].to_numpy(np.float64)
                     * np.log(float(n_docs) / g["df"].to_numpy(np.float64)))
        g = g.sort_values(["doc_id", "tf_idf", "token"],
                          ascending=[True, False, True], kind="mergesort")
        g["rank"] = (g.groupby("doc_id", sort=False).cumcount() + 1).astype(np.int64)
        g = g[g["rank"] <= k]
        return pd.DataFrame({
            "doc_id": g["doc_id"].to_numpy(np.int64),
            "token": g["token"].to_numpy(object),
            "tf": g["tf"].to_numpy(np.int64),
            "df": g["df"].to_numpy(np.int64),
            "tf_idf": sql_round(g["tf_idf"], 4),
            "rank": g["rank"].to_numpy(np.int64),
        })

    return keyed_map_groups(joined, "doc_id", topk)


def token_postings(sf_dir: str, num_buckets: int = 16) -> rd.Dataset:
    """Distributed INVERTED-INDEX build: token -> (document frequency,
    ascending posting list) — the search-index counterpart of the dedup
    family.  Distinct (doc, token) pairs are emitted per batch (documents
    are whole rows, so batch-local dedup is exact); ONE hash shuffle keyed
    by token co-locates each token's postings; assembly inside the bucket
    is a sorted groupby-join.  Postings travel as comma-joined strings so
    the driver's value-hash compare sees a flat column (DuckDB mirror:
    ``string_agg(... ORDER BY doc_id)``); a production sink would keep
    list<int64> and write through pipelines.sinks.write_partitioned keyed
    by token bucket."""
    from .common import keyed_map_groups

    ds = load(sf_dir, "documents", ["doc_id", "text"])

    def pairs_batch(df: pd.DataFrame) -> pd.DataFrame:
        toks = df["text"].str.lower().str.findall(TOKEN_RE)
        pairs = (pd.DataFrame({"doc_id": df["doc_id"].to_numpy(), "token": toks})
                 .explode("token").dropna(subset=["token"]).drop_duplicates())
        pairs["doc_id"] = pairs["doc_id"].astype(np.int64)
        return pairs

    pairs = ds.map_batches(pairs_batch, batch_format="pandas")

    def build(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["token", "doc_id"], kind="mergesort")
        g["s"] = g["doc_id"].astype(str)
        gg = g.groupby("token", sort=False)
        # the per-token string join is output-bounded assembly work (it
        # touches each posting once), not a hot-path row loop
        out = pd.DataFrame({"df": gg.size().astype(np.int64),
                            "postings": gg["s"].agg(",".join)}).reset_index()
        return out

    return keyed_map_groups(pairs, "token", build, num_buckets)


# ------------------------------------------------------------------ language ID

_LANG_PROFILES = {
    # tiny char-trigram prior profiles (public-knowledge heuristic shapes)
    "en": ("the", "ing", "ion", "and", " th", "er "),
    "es": ("de ", "os ", "la ", "ión", "ar ", "es "),
    "fr": ("le ", "es ", "de ", "ent", "ion", "ux "),
    "de": ("der", "ein", "sch", "ung", "ich", "en "),
    "zh": ("de5", "zh1", "sh4", "ng1", "uo2", "ia1"),
}


class LangId:
    """N-gram-overlap language scorer — loads profiles once per actor.
    Deterministic; a demo of the actor-pool text-scoring shape (the corpus
    vocabulary is synthetic so accuracy is not meaningful here)."""

    def __init__(self):
        self.profiles = {
            lang: set(grams) for lang, grams in _LANG_PROFILES.items()
        }

    def _score(self, text: str) -> str:
        t = text.lower()
        grams = {t[i : i + 3] for i in range(max(0, len(t) - 2))}
        best_lang, best = "en", -1.0
        for lang in sorted(self.profiles):
            s = len(grams & self.profiles[lang])
            if s > best:
                best, best_lang = s, lang
        return best_lang

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        out = {
            "doc_id": df["doc_id"].to_numpy(),
            "pred_lang": [self._score(t) for t in df["text"]],
        }
        if "lang" in df.columns:  # true label passthrough (confusion matrix)
            out["lang"] = df["lang"].to_numpy()
        return pd.DataFrame(out)


def langid_counts(sf_dir: str) -> pd.DataFrame:
    ds = load(sf_dir, "documents", ["doc_id", "text"])
    pred = ds.map_batches(LangId, batch_format="pandas", concurrency=(1, 4))
    out = partial_groupby(pred, ["pred_lang"], {"n_docs": ("doc_id", "count")}).to_pandas()
    out["n_docs"] = out["n_docs"].astype(np.int64)
    return out


def langid_confusion(sf_dir: str) -> pd.DataFrame:
    """CLASSIFIER-EVAL confusion matrix of the n-gram language scorer vs
    the table's labeled ``lang`` — the quality-report shape every
    model-scored column needs before it gates data: one cell per (true,
    predicted) pair with the count and its share of the true class (the
    row-normalized recall view).  Same actor-pool scorer as
    :func:`langid_counts` with the label passed through; one tiny
    (true x predicted)-bounded reduce; share = one rounded division."""
    ds = load(sf_dir, "documents", ["doc_id", "text", "lang"])
    pred = ds.map_batches(LangId, batch_format="pandas", concurrency=(1, 4))
    cells = partial_groupby(pred, ["lang", "pred_lang"],
                            {"n": ("doc_id", "count")},
                            many_groups=True).to_pandas()
    cells["n"] = cells["n"].astype(np.int64)
    tot = cells.groupby("lang")["n"].transform("sum")
    cells["recall_share"] = sql_round(
        cells["n"].to_numpy(np.float64) / tot.to_numpy(np.float64), 6)
    return (cells.sort_values(["lang", "pred_lang"])
            .reset_index(drop=True))


# ------------------------------------------------------------------ fingerprinting

FP_BASE = 131
FP_PRIME = 2147483647  # 2^31 - 1: keeps every term < 2^42, exactly
                       # representable in int64/BIGINT — the DuckDB oracle
                       # reproduces the hash with plain integer arithmetic


def _rolling_hashes(text: str, k: int = 8) -> np.ndarray:
    """Polynomial hash over k-char windows (Rabin-Karp shape) mod a 31-bit
    prime, vectorized: h(w) = sum_j codepoint[j] * base^(k-1-j) mod P.  Same
    values as an incrementally-rolled hash; the direct windowed form is what
    both numpy and the SQL oracle compute.  Windows are over UNICODE
    CODEPOINTS (utf-32 view), not utf-8 bytes, so window count and values
    match SQL's per-character length()/substr()/ascii() on any text."""
    # errors="ignore": a lone surrogate must degrade (skip the bad char),
    # not raise inside the map_batches task and fail the whole pipeline.
    # (The SQL oracle sees only well-formed fixture text, so this choice
    # never diverges on oracle inputs.)
    b = np.frombuffer(text.encode("utf-32-le", "ignore"), dtype=np.uint32)
    if len(b) < k:
        return np.zeros(0, dtype=np.int64)
    coeff = np.array([pow(FP_BASE, k - 1 - j, FP_PRIME) for j in range(k)],
                     dtype=np.int64)
    windows = np.lib.stride_tricks.sliding_window_view(b, k).astype(np.int64)
    return (windows % FP_PRIME) @ coeff % FP_PRIME


def doc_fingerprints(sf_dir: str, k: int = 8, window: int = 16) -> rd.Dataset:
    """Winnowing-style fingerprints (Schleimer et al., SIGMOD'03 — public
    algorithm): min rolling-hash per sliding window, deduplicated.  Returns
    per-doc fingerprint count + the global min fingerprint (stable)."""
    ds = load(sf_dir, "documents", ["doc_id", "text"])

    def fp(df: pd.DataFrame) -> pd.DataFrame:
        n_fps, min_fps = [], []
        for t in df["text"]:
            h = _rolling_hashes(t, k)
            if len(h) < window:
                sel = h
            else:
                sw = np.lib.stride_tricks.sliding_window_view(h, window)
                sel = sw.min(axis=1)
            u = np.unique(sel)
            n_fps.append(len(u))
            min_fps.append(np.int64(u.min().astype(np.int64)) if len(u) else np.int64(0))
        return pd.DataFrame(
            {
                "doc_id": df["doc_id"].to_numpy(),
                "n_fingerprints": np.asarray(n_fps, np.int64),
                "min_fingerprint": np.asarray(min_fps, np.int64),
            }
        )

    return ds.map_batches(fp, batch_format="pandas")


def heavy_hitter_tokens(sf_dir: str, k: int = 20, c: int = 200,
                        num_buckets: int = 16) -> pd.DataFrame:
    """Approximate heavy hitters (frequent tokens) from MERGEABLE bounded
    summaries — the one-pass, bounded-memory complement of the exact
    :func:`vocab_top_tokens`.  At 100 TB an exact global wordcount
    shuffles one row per (token, batch) for the WHOLE vocabulary; this
    sketch caps each batch's contribution at ``c`` rows regardless of
    vocabulary size (Misra-Gries-style truncation: the mergeable-summaries
    shape of Agarwal et al., PODS'12).

    Per batch: exact vectorized value_counts truncated to its top ``c``
    tokens, plus the batch's largest DROPPED count as a sentinel row.
    Merged estimate for a token = sum of its kept counts, which
    UNDERCOUNTS by at most the sum over batches of that batch's largest
    dropped count (a token absent from a batch's summary appeared there
    at most dropped_max times).  The result is self-evidencing: each
    returned token carries its exact count (one extra filtered pass over
    the corpus — cheap, k tokens only), the global undercount bound, and
    verdict columns ``bound_ok`` (exact - est <= bound AND est <= exact)
    plus ``in_exact_topk`` vs :func:`vocab_top_tokens` — recall of the
    sketch at this (k, c).

    No SQL oracle by design: the estimate depends on the engine's batch
    boundaries; the in-row verdicts ARE the correctness evidence (the
    ann_ivf_recall pattern)."""
    _SENTINEL = "\x00dropped_max"  # TOKEN_RE tokens are \w+ — cannot collide
    ds = load(sf_dir, "documents", ["text"])

    def summarize(df: pd.DataFrame) -> pd.DataFrame:
        vc = df["text"].str.findall(TOKEN_RE).explode().value_counts()
        kept = vc.iloc[:c]
        dropped_max = int(vc.iloc[c:].max()) if len(vc) > c else 0
        return pd.DataFrame({
            "token": np.append(kept.index.to_numpy(dtype=object), _SENTINEL),
            "n": np.append(kept.to_numpy(np.int64), np.int64(dropped_max)),
        })

    merged = partial_groupby(
        ds.map_batches(summarize, batch_format="pandas"),
        ["token"], {"n": ("n", "sum")}, many_groups=True,
        num_buckets=num_buckets).to_pandas()
    if "token" not in merged.columns:  # EMPTY documents table: to_pandas
        merged = pd.DataFrame(         # of an all-empty Dataset drops the
            {"token": pd.Series([], dtype=object),  # schema entirely
             "n": pd.Series([], dtype=np.int64)})
    bound = int(merged.loc[merged["token"] == _SENTINEL, "n"].sum())
    est = merged[merged["token"] != _SENTINEL]
    top = est.sort_values(["n", "token"], ascending=[False, True]).head(k)
    top = top.rename(columns={"n": "est_n"}).reset_index(drop=True)

    if top.empty:  # token-less corpus: an all-empty exchange output loses
        return pd.DataFrame(  # the token column, so skip the exact pass
            {"token": pd.Series([], dtype=object),
             "est_n": pd.Series([], dtype=np.int64),
             "exact_n": pd.Series([], dtype=np.int64),
             "bound": pd.Series([], dtype=np.int64),
             "bound_ok": pd.Series([], dtype=bool),
             "in_exact_topk": pd.Series([], dtype=bool)})

    # exact counts for JUST the returned tokens (broadcast-small side):
    # one filtered pass, k rows per batch max
    want = set(top["token"])

    def exact_counts(df: pd.DataFrame) -> pd.DataFrame:
        vc = df["text"].str.findall(TOKEN_RE).explode().value_counts()
        vc = vc[vc.index.isin(want)]
        return pd.DataFrame({"token": vc.index.astype(str),
                             "n": vc.to_numpy(np.int64)})

    exact = partial_groupby(
        ds.map_batches(exact_counts, batch_format="pandas"),
        ["token"], {"exact_n": ("n", "sum")}, many_groups=True,
        num_buckets=num_buckets).to_pandas()
    out = top.merge(exact, on="token", how="left")
    out["exact_n"] = out["exact_n"].fillna(0).astype(np.int64)
    out["est_n"] = out["est_n"].astype(np.int64)
    out["bound"] = np.int64(bound)
    out["bound_ok"] = (out["est_n"] <= out["exact_n"]) & (
        out["exact_n"] - out["est_n"] <= bound)
    exact_topk = set(vocab_top_tokens(sf_dir, k=k)["token"])
    out["in_exact_topk"] = out["token"].isin(exact_topk)
    return out.sort_values(["est_n", "token"],
                           ascending=[False, True]).reset_index(drop=True)


# token class shared by the repetition / contamination operators — identical
# under Python re and DuckDB RE2 (no unicode \w classes)
REP_TOKEN_RE = r"[A-Za-z0-9_]+"


def unigram_logprob_docs(sf_dir: str) -> rd.Dataset:
    """Model-based quality score (the CCNet/KenLM-filter shape with the
    simplest possible LM): score each document by the mean log-probability
    of its tokens under a UNIGRAM model learned from the corpus itself.
    Low scores mark rare-token noise; training-data pipelines threshold
    on exactly this statistic.

    Scale shape — model small, corpus huge: token counts come from the
    existing partial-agg wordcount (one shuffle of (token, batch) partial
    rows), the resulting logprob TABLE (vocabulary-sized — MB even for
    web-scale vocabularies after min-count pruning) is broadcast once via
    ``ray.put``, and scoring is ONE map_batches with a vectorized
    dict-map + grouped mean per batch.  Rounded to 4 dp on both sides so
    FP summation order can't flip the value-hash."""
    import ray

    from .common import _cached_get

    ds = load(sf_dir, "documents", ["doc_id", "text"])

    def counts(df: pd.DataFrame) -> pd.DataFrame:
        vc = df["text"].str.findall(TOKEN_RE).explode().value_counts()
        return pd.DataFrame({"token": vc.index.astype(str),
                             "n": vc.to_numpy(np.int64)})

    cnt = partial_groupby(ds.map_batches(counts, batch_format="pandas"),
                          ["token"], {"n": ("n", "sum")},
                          many_groups=True).to_pandas()
    if len(cnt) == 0:
        return rd.from_pandas(pd.DataFrame(
            {"doc_id": pd.Series([], dtype=np.int64),
             "n_tokens": pd.Series([], dtype=np.int64),
             "avg_logprob": pd.Series([], dtype=np.float64)}))
    total = float(cnt["n"].sum())
    logp_ref = ray.put(dict(zip(
        cnt["token"], np.log(cnt["n"].to_numpy(np.float64) / total))))

    def score(df: pd.DataFrame) -> pd.DataFrame:
        logp = _cached_get(logp_ref)
        toks = df["text"].str.findall(TOKEN_RE)
        n_tok = toks.map(len).to_numpy(np.int64)
        doc = np.repeat(df["doc_id"].to_numpy(np.int64), n_tok)
        flat = toks.explode().dropna()
        lp = flat.map(logp).to_numpy(np.float64)
        g = pd.DataFrame({"doc_id": doc, "lp": lp}).groupby(
            "doc_id", sort=False)["lp"]
        out = g.mean().reset_index(name="avg_logprob")
        out["n_tokens"] = g.size().to_numpy(np.int64)
        out["avg_logprob"] = sql_round(out["avg_logprob"], 4)
        out["doc_id"] = out["doc_id"].astype(np.int64)
        return out[["doc_id", "n_tokens", "avg_logprob"]]

    return ds.map_batches(score, batch_format="pandas")


def repetition_filter_docs(sf_dir: str, max_top2_frac: float = 0.10,
                           max_dup3_frac: float = 0.01) -> rd.Dataset:
    """Gopher-style repetition FILTER (Rae et al. 2021 §A1.1 heuristics,
    adapted to word n-grams): keep documents whose most-frequent word
    BIGRAM covers <= ``max_top2_frac`` of tokens AND whose duplicate
    TRIGRAM fraction (1 - distinct/total 3-grams) is <= ``max_dup3_frac``;
    repetitive boilerplate fails both.  Features ride along for audit.

    Engine shape: ONE map_batches — per-doc metrics never cross batches, so
    the whole filter is embarrassingly parallel with zero shuffles.  Inside
    a batch the n-gram statistics are ONE exploded token frame + vectorized
    shifted-concat n-gram construction + two pandas groupbys (no per-doc
    Python loop).  Thresholds compare ROUNDED values so the engine and the
    SQL oracle agree at the boundary."""
    from itertools import chain

    ds = load(sf_dir, "documents", ["doc_id", "text"])

    def feats(df: pd.DataFrame) -> pd.DataFrame:
        toks = df["text"].str.findall(REP_TOKEN_RE)
        n_tok = toks.map(len).to_numpy(np.int64)
        doc_ids = df["doc_id"].to_numpy(np.int64)
        doc = np.repeat(doc_ids, n_tok)
        tok = pd.Series(list(chain.from_iterable(toks)), dtype=object)
        dser = pd.Series(doc)
        same1 = (dser.shift(-1) == dser).to_numpy()
        same2 = (dser.shift(-2) == dser).to_numpy()
        bg = tok + " " + tok.shift(-1)
        tg = bg + " " + tok.shift(-2)
        bgf = pd.DataFrame({"doc": doc, "bg": bg})[same1]
        max_bg = (bgf.groupby(["doc", "bg"], sort=False).size()
                  .groupby("doc").max())
        tgf = pd.DataFrame({"doc": doc, "tg": tg})[same1 & same2]
        g3 = tgf.groupby("doc", sort=False)["tg"]
        n3, d3 = g3.size(), g3.nunique()
        base = pd.DataFrame({"doc_id": doc_ids, "n_tokens": n_tok})
        base["max_bg"] = base["doc_id"].map(max_bg).fillna(0).to_numpy(np.int64)
        base["n3"] = base["doc_id"].map(n3).fillna(0).to_numpy(np.int64)
        base["d3"] = base["doc_id"].map(d3).fillna(0).to_numpy(np.int64)
        top2 = np.where(base["max_bg"] > 0,
                        2.0 * base["max_bg"] / base["n_tokens"].clip(lower=1),
                        0.0)
        dup3 = np.where(base["n3"] > 0,
                        1.0 - base["d3"] / base["n3"].clip(lower=1), 0.0)
        base["top2_frac"] = sql_round(pd.Series(top2), 4)
        base["dup3_frac"] = sql_round(pd.Series(dup3), 4)
        keep = ((base["top2_frac"] <= max_top2_frac)
                & (base["dup3_frac"] <= max_dup3_frac)).to_numpy()
        return base[["doc_id", "n_tokens", "top2_frac", "dup3_frac"]][keep]

    return ds.map_batches(feats, batch_format="pandas")


def curated_docs(sf_dir: str, num_buckets: int = 16) -> rd.Dataset:
    """END-TO-END curation pipeline — the composed flagship of the text
    axis: a document survives iff it (1) passes the C4-style quality gate
    (:func:`quality_filter_docs`), (2) passes the Gopher-style repetition
    gate (:func:`repetition_filter_docs`), (3) is its exact-duplicate
    group's keeper (:func:`exact_dedup_docs`), and (4) is its near-dup
    cluster's canonical representative
    (:func:`~weaver_ray.pipelines.dedup.neardup_canonical_docs_ds`).

    The composition itself adds ONE hash shuffle of tiny (doc_id, stage)
    flag rows: each stage's survivor set unions into a flag stream, and a
    bucketed groupby keeps doc_ids carrying all four flags (each stage
    emits a doc_id at most once, so count(distinct)==4 == intersection).
    No stage materializes documents on the driver; at 100 TB each input
    leg is the already-scale-audited operator.

    The near-dup leg runs at Jaccard >= 0.8 (essentially-duplicate
    retention, the conservative curation setting) rather than the
    pair-emission default 0.2: the synthetic corpus is uniformly similar
    enough that 0.2 chains ALL documents into one cluster (one canonical
    survivor — a degenerate, if correct, composition)."""
    from .common import keyed_map_groups
    from .dedup import neardup_canonical_docs_ds

    def flag(ds: rd.Dataset, col: str, tag: int) -> rd.Dataset:
        def f(df: pd.DataFrame) -> pd.DataFrame:
            return pd.DataFrame({
                "doc_id": df[col].to_numpy(np.int64),
                "stage": np.full(len(df), tag, np.int8),
            })

        return ds.map_batches(f, batch_format="pandas")

    flags = (
        flag(quality_filter_docs(sf_dir), "doc_id", 0)
        .union(flag(repetition_filter_docs(sf_dir), "doc_id", 1))
        .union(flag(exact_dedup_docs(sf_dir), "keeper_doc_id", 2))
        .union(flag(neardup_canonical_docs_ds(sf_dir, threshold=0.8),
                    "doc_id", 3))
    )

    def keep_all_four(bucket: pd.DataFrame) -> pd.DataFrame:
        n = bucket.groupby("doc_id", sort=False)["stage"].nunique()
        out = n[n == 4].index.to_numpy(np.int64)
        return pd.DataFrame({"doc_id": out})

    return keyed_map_groups(flags, "doc_id", keep_all_four, num_buckets)


def _word_ngrams(texts: pd.Series, n: int) -> tuple[np.ndarray, np.ndarray]:
    """Vectorized word n-gram extraction over a batch of texts: returns
    ``(counts, grams)`` where ``counts[i]`` is row i's n-gram count (so
    ``np.repeat(ids, counts)`` aligns each gram with its source row) and
    ``grams`` is the flat space-joined n-gram array.  Tokens are
    REP_TOKEN_RE words; the n-way ``shift`` + ``str.cat`` builds all grams
    in one pandas pass, with within-row start offsets masking the
    cross-row seams.  Shared by the decontamination probe and the
    source-overlap matrix so the gram definition can't drift."""
    from itertools import chain

    toks = texts.str.findall(REP_TOKEN_RE)
    cnt = (toks.map(len) - (n - 1)).clip(lower=0).to_numpy(np.int64) \
        if len(texts) else np.zeros(0, np.int64)
    if not cnt.sum():
        return cnt, np.array([], dtype=object)
    tok = pd.Series(list(chain.from_iterable(toks)), dtype=object)
    parts = [tok.shift(-i) for i in range(n)]
    gram_all = parts[0].str.cat(parts[1:], sep=" ")
    # valid gram start positions: within-row offsets 0..len-n
    starts = np.concatenate([np.arange(c) for c in cnt])
    offs = np.concatenate(
        [np.full(c, o) for c, o in zip(
            cnt, np.concatenate(([0], np.cumsum(
                toks.map(len).to_numpy(np.int64))[:-1])))])
    return cnt, gram_all.to_numpy()[offs + starts]


def contamination_overlap_docs(sf_dir: str, n: int = 4,
                               modulus: int = 53) -> rd.Dataset:
    """Benchmark DECONTAMINATION check (the n-gram-overlap gate every
    training-data pipeline runs before release): flag training documents
    that share any word ``n``-gram with the "benchmark" subset
    (``doc_id % modulus == 0`` — a deterministic stand-in for an eval set),
    returning ``(doc_id, n_overlap)`` with n_overlap = distinct shared
    n-grams.

    Scale shape: the benchmark n-gram set is built by one distributed
    distinct pass and BROADCAST once via ``ray.put`` (eval sets are small
    by definition — MB, not TB); the training-side scan is ONE map_batches
    with a vectorized hash-set membership probe per batch.  Zero shuffles
    end to end.  At 100 TB the broadcast payload would be u64 n-gram
    hashes; literal strings here keep the DuckDB oracle exact."""
    import ray

    from .common import _cached_get

    ds = load(sf_dir, "documents", ["doc_id", "text"])

    def _grams(df: pd.DataFrame, bench_side: bool) -> pd.DataFrame:
        sel = (df["doc_id"] % modulus == 0) == bench_side
        sub = df[sel.to_numpy()]
        cnt, grams = _word_ngrams(sub["text"], n)
        doc = np.repeat(sub["doc_id"].to_numpy(np.int64), cnt)
        if not len(doc):
            # typed empty (string, not object): Ray's block size estimator
            # chokes (noisily, non-fatally) on empty object columns
            return pd.DataFrame({"doc_id": pd.Series([], dtype=np.int64),
                                 "g": pd.Series([], dtype="string")})
        return pd.DataFrame({"doc_id": doc, "g": grams}).drop_duplicates()

    bench_pdf = (ds.map_batches(lambda df: _grams(df, True)[["g"]],
                                batch_format="pandas")
                 .to_pandas())  # distinct grams of the SMALL benchmark side
    bench_set = frozenset(bench_pdf["g"]) if len(bench_pdf) else frozenset()
    bench_ref = ray.put(bench_set)

    def probe(df: pd.DataFrame) -> pd.DataFrame:
        bset = _cached_get(bench_ref)
        pairs = _grams(df, False)
        hit = pairs[pairs["g"].isin(bset)]
        out = hit.groupby("doc_id", sort=False).size().reset_index(
            name="n_overlap")
        out["doc_id"] = out["doc_id"].astype(np.int64)
        out["n_overlap"] = out["n_overlap"].astype(np.int64)
        return out

    return ds.map_batches(probe, batch_format="pandas")


def weighted_source_mix(sf_dir: str) -> rd.Dataset:
    """Deterministic WEIGHTED MIXTURE sampling per source — the
    dataset-mixing step of a training-data pipeline (upsample curated
    sources, downsample noisy ones).  The keep decision is a pure hash
    threshold, not RNG state: keep iff
    ``int(md5(source + ':' + doc_id)[:8], 16) % 10000 < rate * 10000``,
    so the selected subset is identical on any engine, any partitioning,
    any retry (the md5-rank idiom of stratified_sample_docs applied as a
    Bernoulli gate).  Source rates derive from the source name
    (``srcN -> (N % 10 + 1) / 10``) standing in for a configured mixture
    dict.  One embarrassingly parallel map_batches — no shuffle; at
    100 TB this runs at read bandwidth."""
    ds = load(sf_dir, "documents", ["doc_id", "source"])

    def gate(df: pd.DataFrame) -> pd.DataFrame:
        src = df["source"].to_numpy()
        doc = df["doc_id"].to_numpy(np.int64)
        rate = np.array([(int(s[3:]) % 10 + 1) / 10.0 for s in src])
        h = np.array([int(hashlib.md5(f"{s}:{d}".encode()).hexdigest()[:8], 16)
                      % 10000 for s, d in zip(src, doc)], dtype=np.int64)
        keep = h < rate * 10000
        return pd.DataFrame({"doc_id": doc, "source": src,
                             "rate": rate})[keep]

    return ds.map_batches(gate, batch_format="pandas")


def deterministic_shuffle_docs(sf_dir: str) -> rd.Dataset:
    """Global DETERMINISTIC SHUFFLE — the pre-training data-order step, as
    a reproducible total order instead of RNG state: rank every document
    by ``md5(doc_id)``.  Rides :func:`common.global_row_number`
    (distributed sort + metadata-only per-block count exchange: one int
    per block reaches the driver), so unlike ``ds.random_shuffle()`` the
    result is bit-stable across engines, partitionings and retries — and
    SQL-checkable (``row_number() OVER (ORDER BY md5(..))``)."""
    from .common import global_row_number

    ds = load(sf_dir, "documents", ["doc_id"])

    def key(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "doc_id": df["doc_id"].to_numpy(np.int64),
            "__k": _md5_doc_key(df["doc_id"]),
        })

    keyed = ds.map_batches(key, batch_format="pandas")
    ranked, _ = global_row_number(keyed, ["__k"], rank_col="shuffle_rank")
    return ranked.select_columns(["doc_id", "shuffle_rank"])


def _doc_token_count_frame(df: pd.DataFrame) -> pd.DataFrame:
    """Shared (doc_id, n_tokens) batch stage for the packing operators —
    ONE definition so the token rule can never desynchronize between
    token_budget_bins, curated_packed_shards and their nested oracles."""
    return pd.DataFrame({
        "doc_id": df["doc_id"].to_numpy(np.int64),
        "n_tokens": df["text"].str.count(TOKEN_RE).to_numpy(np.int64),
    })


def _pack_bins(cum: rd.Dataset, budget: int) -> rd.Dataset:
    """Shared bin-assignment tail over a global_prefix_sum output."""

    def binify(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "doc_id": df["doc_id"].to_numpy(np.int64),
            "n_tokens": df["n_tokens"].to_numpy(np.int64),
            "bin": (df["cum_before"].to_numpy(np.int64) // budget),
        })

    return cum.map_batches(binify, batch_format="pandas")


def token_budget_bins(sf_dir: str, budget: int = 2048) -> rd.Dataset:
    """SEQUENCE PACKING bin assignment: documents in doc_id order are
    packed into fixed token-budget training chunks — doc i lands in bin
    ``(sum of n_tokens of all prior docs) // budget``.  The global
    EXCLUSIVE prefix sum is :func:`common.global_prefix_sum` (distributed
    sort + one per-block SUM to the driver — the scan never ships rows),
    making this the packing planner of an LM data pipeline at 100 TB:
    bin ids are stable under any partitioning because the order key
    (doc_id) and the scan are both deterministic."""
    from .common import global_prefix_sum

    ds = load(sf_dir, "documents", ["doc_id", "text"])
    toks = ds.map_batches(_doc_token_count_frame, batch_format="pandas")
    cum = global_prefix_sum(toks, ["doc_id"], "n_tokens")
    return _pack_bins(cum, budget)


def curated_packed_shards(sf_dir: str, budget: int = 512,
                          num_buckets: int = 16) -> rd.Dataset:
    """END-TO-END LM data-prep composition: the curated survivor set
    (quality ∩ repetition ∩ exact-keeper ∩ near-dup canonical) PACKED
    into fixed token-budget training shards — curate, then plan the
    sequence-packing layout, as one pipeline.

    Composition shape: curated_docs emits tiny (doc_id) rows; a bucketed
    hash join attaches per-doc token counts (both sides distributed —
    curated output is O(corpus) at 100 TB, so no broadcast); the bin
    assignment is the :func:`common.global_prefix_sum` scan over the
    SURVIVORS ONLY in doc_id order.  Every stage is an already-audited
    distributed operator; the composition adds one hash shuffle and one
    metadata-only scan exchange."""
    from .common import global_prefix_sum, hash_join

    cur = curated_docs(sf_dir, num_buckets=num_buckets)

    ds = load(sf_dir, "documents", ["doc_id", "text"])
    toks = ds.map_batches(_doc_token_count_frame, batch_format="pandas")
    joined = hash_join(cur, toks, on="doc_id", lcols=["doc_id"],
                       rcols=["doc_id", "n_tokens"], how="inner",
                       num_buckets=num_buckets)
    cum = global_prefix_sum(joined, ["doc_id"], "n_tokens")
    return _pack_bins(cum, budget)


# sample-point budget shared by the engine default AND the registered SQL
# oracle (one source of truth — the ASPECT_BUCKETS injection precedent),
# so a changed n can't silently desynchronize the parity check
PPS_N = 100


def pps_sample_docs(sf_dir: str, n: int = PPS_N) -> rd.Dataset:
    """PROBABILITY-PROPORTIONAL-TO-SIZE sampling (systematic PPS, Madow
    1949): draw ``n`` sample points from the token-weighted corpus so each
    document's inclusion count is proportional to its token weight — the
    importance-sampling step of data-mixture construction (more tokens,
    more representation), with multiplicity reported when a heavy doc's
    weight exceeds a full stride.

    Exactness by construction: NO transcendentals anywhere (unlike
    Efraimidis-Spirakis u^(1/w) keys, whose pow() ulps differ between
    libms) — the scan, the sample points ``p_j = ((2j+1)·T) // (2n)`` and
    the interval-membership counts are pure integer arithmetic, so engine
    and oracle agree bit-for-bit with no rounding grid.  Document order is
    the md5(doc_id) deterministic shuffle (decorrelates the systematic
    stride from ingestion order — the classic systematic-sampling
    requirement), the exclusive token scan is
    :func:`common.global_prefix_sum` (one int per block to the driver),
    and the per-row hit count is two vectorized searchsorted calls against
    the n-point array closed over the batch fn.  Scale shape: one token
    pass + one metadata-only scan; rows never reach the driver."""
    from .common import global_prefix_sum

    ds = load(sf_dir, "documents", ["doc_id", "text"])

    def keyed_tokens(df: pd.DataFrame) -> pd.DataFrame:
        out = _doc_token_count_frame(df)
        out["__k"] = _md5_doc_key(out["doc_id"])
        return out

    # materialize once: the token frame feeds BOTH the total and the scan
    # (a lazy plan would re-run the read + tokenize per consumer)
    toks = ds.map_batches(keyed_tokens, batch_format="pandas").materialize()
    total = int(toks.sum("n_tokens"))
    if total <= 0:
        return rd.from_pandas(pd.DataFrame({
            "doc_id": pd.Series([], dtype=np.int64),
            "n_tokens": pd.Series([], dtype=np.int64),
            "n_hits": pd.Series([], dtype=np.int64)}))
    # midpoint systematic sample points on the integer token axis,
    # computed in Python ints (no int64 overflow at any corpus size)
    points = np.asarray([((2 * j + 1) * total) // (2 * n) for j in range(n)],
                        dtype=np.int64)
    cum = global_prefix_sum(toks, ["__k", "doc_id"], "n_tokens")

    def hits(df: pd.DataFrame) -> pd.DataFrame:
        cb = df["cum_before"].to_numpy(np.int64)
        w = df["n_tokens"].to_numpy(np.int64)
        k = (np.searchsorted(points, cb + w, side="left")
             - np.searchsorted(points, cb, side="left"))
        keep = k > 0
        return pd.DataFrame({
            "doc_id": df["doc_id"].to_numpy(np.int64)[keep],
            "n_tokens": w[keep],
            "n_hits": k[keep].astype(np.int64)})

    return cum.map_batches(hits, batch_format="pandas")


BM25_TERMS = ("data", "merge", "spark", "window")  # fixed sorted query


def bm25_topk(sf_dir: str, terms: tuple = BM25_TERMS, k: int = 50,
              k1: float = 1.2, b: float = 0.75) -> pd.DataFrame:
    """Okapi BM25 relevance ranking: the k documents most relevant to a
    fixed multi-term query — the search-scoring operator a curation
    pipeline uses to mine topical subsets.

    Scale shape: ONE tiny stats pass (per-batch partial rows carrying
    (n_docs, sum_dl, df per query term) — O(T) floats per batch, folded
    on the driver), then one scoring pass with the T idf constants closed
    over (a dozen floats — no broadcast machinery needed), per-block
    top-k and a k*n_blocks driver merge (never a global sort).

    FP determinism vs the SQL oracle: term contributions accumulate in
    FIXED sorted-term order (the oracle writes the same left-to-right
    sum), avgdl is the same int-sum/count double on both sides, and the
    final score is half-away-rounded to 4 dp BEFORE ranking so the
    (score desc, doc_id asc) order is identical under both engines'
    libm."""
    import math

    terms = tuple(sorted(terms))
    ds = load(sf_dir, "documents", ["doc_id", "text"])

    def stats(df: pd.DataFrame) -> pd.DataFrame:
        text = df["text"]
        row = {"n_docs": np.int64(len(df)),
               "sum_dl": np.int64(text.str.count(TOKEN_RE).sum())}
        for t in terms:
            row[f"df_{t}"] = np.int64(
                (text.str.count(rf"\b{t}\b") > 0).sum())
        return pd.DataFrame([row])

    st = ds.map_batches(stats, batch_format="pandas").to_pandas().sum()
    n_docs = float(st["n_docs"])
    avgdl = float(st["sum_dl"]) / n_docs
    idf = {t: math.log(1.0 + (n_docs - float(st[f"df_{t}"]) + 0.5)
                       / (float(st[f"df_{t}"]) + 0.5)) for t in terms}

    def score(df: pd.DataFrame) -> pd.DataFrame:
        dl = df["text"].str.count(TOKEN_RE).to_numpy(np.float64)
        denom_norm = k1 * (1.0 - b + b * dl / avgdl)
        s = np.zeros(len(df))
        for t in terms:  # fixed order == the oracle's left-to-right sum
            tf = df["text"].str.count(rf"\b{t}\b").to_numpy(np.float64)
            s = s + idf[t] * (tf * (k1 + 1.0)) / (tf + denom_norm)
        out = pd.DataFrame({"doc_id": df["doc_id"].to_numpy(np.int64),
                            "score": sql_round(pd.Series(s), 4)})
        out = out[out["score"] > 0]
        return out.sort_values(["score", "doc_id"],
                               ascending=[False, True]).head(k)

    cand = ds.map_batches(score, batch_format="pandas").to_pandas()
    out = (cand.sort_values(["score", "doc_id"], ascending=[False, True])
           .head(k).reset_index(drop=True))
    out["rank"] = np.arange(1, len(out) + 1, dtype=np.int64)
    return out


def source_overlap_matrix(sf_dir: str, n: int = 4,
                          num_buckets: int = 16) -> rd.Dataset:
    """Cross-source CONTAMINATION MATRIX: for every pair of sources, the
    number of distinct word ``n``-grams they share — the data-governance
    view ("which feeds duplicate each other") that decides dedup order and
    mixture weights before training.

    Scale shape: distinct (source, gram) rows are built per batch with the
    shared vectorized extractor, then ONE hash shuffle keyed by gram
    (keyed_map_groups — complete gram groups per bucket make the per-batch
    dedup global and keep the pair expansion LOCAL to each bucket: a gram
    shared by s sources expands to s(s-1)/2 tiny pair rows inside its
    bucket, never a cross-bucket join); per-bucket pair counts are partial
    rows reduced by one more tiny shuffle.  No stage ever holds a source's
    full gram set in one task."""
    from .common import keyed_map_groups, partial_groupby

    ds = load(sf_dir, "documents", ["source", "text"])

    def gram_src(df: pd.DataFrame) -> pd.DataFrame:
        cnt, grams = _word_ngrams(df["text"], n)
        src = np.repeat(df["source"].to_numpy(), cnt)
        if not len(src):
            return pd.DataFrame({"source": pd.Series([], dtype="string"),
                                 "g": pd.Series([], dtype="string")})
        return pd.DataFrame({"source": src, "g": grams}).drop_duplicates()

    pairs = ds.map_batches(gram_src, batch_format="pandas")

    def bucket_pairs(bucket: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({"src_a": pd.Series([], dtype="string"),
                              "src_b": pd.Series([], dtype="string"),
                              "n_shared": pd.Series([], dtype=np.int64)})
        if not len(bucket):
            return empty
        b = bucket.drop_duplicates()          # global: a gram lives in ONE bucket
        m = b.merge(b, on="g")
        m = m[m["source_x"] < m["source_y"]]
        if not len(m):
            return empty
        out = (m.groupby(["source_x", "source_y"], sort=False)
               .size().reset_index(name="n_shared"))
        out.columns = ["src_a", "src_b", "n_shared"]
        out["n_shared"] = out["n_shared"].astype(np.int64)
        return out

    counts = keyed_map_groups(pairs, "g", bucket_pairs, num_buckets)
    agg = partial_groupby(counts, ["src_a", "src_b"],
                          {"n_shared": ("n_shared", "sum")}, many_groups=True)

    def cast(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["n_shared"] = df["n_shared"].astype(np.int64)
        return df

    return agg.map_batches(cast, batch_format="pandas")


# PII-shape patterns chosen to mean the same thing under Python re and
# DuckDB's RE2 (plain char classes + bounded repeats, no lookaround)
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
IPV4_RE = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"


def pii_redact_docs(sf_dir: str) -> rd.Dataset:
    """PII REDACTION — the scrub-before-training transform: find
    email-shaped and IPv4-shaped substrings, count them per document, and
    replace them with typed placeholder tokens.

    The synthetic corpus contains no PII, so the operator PLANTS it
    deterministically from doc_id (every 7th doc gains an email, every
    11th an IPv4 — pure integer->string arithmetic the SQL oracle
    reproduces verbatim with the same concatenation), and the redacted
    TEXT itself is certified row-by-row through md5 (the
    clean_text_hashes pattern: the oracle checks the transform's output
    string, not just an aggregate).  Emails redact BEFORE IPs on both
    sides so the composition order is part of the contract.

    Scale shape: one embarrassingly parallel map_batches over a
    two-column read — zero shuffles; at 100 TB this runs at read
    bandwidth like the other pure text transforms."""
    ds = load(sf_dir, "documents", ["doc_id", "text"])

    def redact(df: pd.DataFrame) -> pd.DataFrame:
        doc = df["doc_id"].to_numpy(np.int64)
        aug = pd.Series(
            [t + (f" contact user{d}@mail.example now" if d % 7 == 0 else "")
               + (f" from 10.{d % 256}.0.{d % 100}" if d % 11 == 0 else "")
             for t, d in zip(df["text"], doc)])
        red = (aug.str.replace(EMAIL_RE, "<EMAIL>", regex=True)
               .str.replace(IPV4_RE, "<IP>", regex=True))
        return pd.DataFrame({
            "doc_id": doc,
            "n_emails": aug.str.count(EMAIL_RE).to_numpy(np.int64),
            "n_ips": aug.str.count(IPV4_RE).to_numpy(np.int64),
            "red_md5": [hashlib.md5(t.encode()).hexdigest() for t in red],
        })

    return ds.map_batches(redact, batch_format="pandas")


def source_cap_docs(sf_dir: str, cap: int = 25) -> rd.Dataset:
    """Per-source retention CAP (the 'domain cap' curation step: no single
    feed may dominate the training mix): keep at most ``cap`` documents
    per source, selected by md5(doc_id) hash rank — deterministic across
    engines, partitionings and retries, never RNG state.

    Scale shape: a capped top-k is MERGEABLE, so every batch first
    reduces itself to its own ``cap`` smallest ranks per source
    (map_batches partial); the one shuffle then moves at most
    n_sources x cap rows PER BLOCK — never a source's full row set
    (contrast stratified_sample_docs, which ships whole strata; a domain
    cap over a 100-TB feed cannot).  Final selection + rank stamping is
    one keyed_map_groups over the tiny partials."""
    from .common import keyed_map_groups

    ds = load(sf_dir, "documents", ["doc_id", "source"])

    def partial_cap(df: pd.DataFrame) -> pd.DataFrame:
        g = pd.DataFrame({
            "doc_id": df["doc_id"].to_numpy(np.int64),
            "source": df["source"].to_numpy(),
            "__k": _md5_doc_key(df["doc_id"]),
        }).sort_values(["__k", "doc_id"])
        return g[g.groupby("source", sort=False).cumcount() < cap]

    parts = ds.map_batches(partial_cap, batch_format="pandas")

    def pick(bucket: pd.DataFrame) -> pd.DataFrame:
        if not len(bucket):
            return pd.DataFrame({
                "doc_id": pd.Series([], dtype=np.int64),
                "source": pd.Series([], dtype="string"),
                "cap_rank": pd.Series([], dtype=np.int64)})
        b = bucket.sort_values(["__k", "doc_id"])
        b = b[b.groupby("source", sort=False).cumcount() < cap].copy()
        b["cap_rank"] = (b.groupby("source", sort=False).cumcount()
                         + 1).astype(np.int64)
        return b[["doc_id", "source", "cap_rank"]]

    return keyed_map_groups(parts, "source", pick)


def duplicated_span_docs(sf_dir: str, n: int = 4,
                         num_buckets: int = 16) -> rd.Dataset:
    """Corpus-wide DUPLICATED-SPAN statistics (the exact-substring dedup
    signal of Lee et al. 2022, "Deduplicating Training Data Makes
    Language Models Better", at word-n-gram granularity): for every
    document, how many of its distinct word ``n``-grams also appear in
    at least one OTHER document, and what fraction of the document that
    is — the per-doc "copy fraction" used to drop boilerplate and
    templated text before training.

    Scale shape: distinct (gram, doc_id) rows per batch via the shared
    :func:`_word_ngrams` extractor (a doc lives in one row, so per-batch
    distinct is globally distinct), then ONE hash shuffle keyed by gram
    (keyed_map_groups — a gram's full posting list lands in one bucket,
    so its distinct-doc count is exact there) emitting per-doc PARTIAL
    (n_grams, n_dup) counts, reduced by one tiny doc-keyed shuffle.  No
    task ever holds a document's full gram set beyond its own bucket
    slice; a pathologically hot gram costs its posting-list length in
    one bucket, never a cross-bucket join."""
    from .common import keyed_map_groups, partial_groupby, sql_round

    ds = load(sf_dir, "documents", ["doc_id", "text"])

    def gram_doc(df: pd.DataFrame) -> pd.DataFrame:
        cnt, grams = _word_ngrams(df["text"], n)
        doc = np.repeat(df["doc_id"].to_numpy(np.int64), cnt)
        if not len(doc):
            return pd.DataFrame({"doc_id": pd.Series([], dtype=np.int64),
                                 "g": pd.Series([], dtype="string")})
        return pd.DataFrame({"doc_id": doc, "g": grams}).drop_duplicates()

    pairs = ds.map_batches(gram_doc, batch_format="pandas")

    def bucket_counts(bucket: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({"doc_id": pd.Series([], dtype=np.int64),
                              "n_grams": pd.Series([], dtype=np.int64),
                              "n_dup_grams": pd.Series([], dtype=np.int64)})
        if not len(bucket):
            return empty
        # rows are globally distinct (doc, gram) pairs and a gram's whole
        # posting list is in THIS bucket: per-gram row count == distinct
        # doc count, so ndocs >= 2 marks the gram as duplicated
        dup = bucket.groupby("g", sort=False)["doc_id"].transform("size") >= 2
        out = (pd.DataFrame({"doc_id": bucket["doc_id"].to_numpy(np.int64),
                             "dup": dup.to_numpy()})
               .groupby("doc_id", sort=False)
               .agg(n_grams=("dup", "size"), n_dup_grams=("dup", "sum"))
               .reset_index())
        out["n_grams"] = out["n_grams"].astype(np.int64)
        out["n_dup_grams"] = out["n_dup_grams"].astype(np.int64)
        return out

    partials = keyed_map_groups(pairs, "g", bucket_counts, num_buckets)
    agg = partial_groupby(partials, ["doc_id"],
                          {"n_grams": ("n_grams", "sum"),
                           "n_dup_grams": ("n_dup_grams", "sum")},
                          many_groups=True)

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["n_grams"] = df["n_grams"].astype(np.int64)
        df["n_dup_grams"] = df["n_dup_grams"].astype(np.int64)
        df["dup_frac"] = sql_round(
            df["n_dup_grams"].to_numpy(np.float64)
            / np.maximum(df["n_grams"].to_numpy(np.float64), 1.0), 4)
        return df

    return agg.map_batches(finish, batch_format="pandas")


def doc_token_entropy(sf_dir: str) -> rd.Dataset:
    """Per-document unigram Shannon entropy (bits) of the lowercased
    token distribution — the lexical-diversity quality signal (a doc
    repeating one token has H=0; templated/boilerplate pages score low).
    Complements the CORPUS-level unigram_logprob_docs statistic with a
    purely LOCAL one: zero shuffles, one vectorized map_batches pass
    (explode + two pandas groupbys per batch; H = log2(n) - sum(c*log2 c)/n
    so only integer counts enter the transcendental path).  Shares
    TOKEN_RE with every other text operator so the token rule can't
    drift.  Docs with no tokens are excluded (entropy undefined) —
    mirrored by the oracle's inner groupby.  Rounded 4 dp half-away on
    both engines so FP summation order can't flip the value hash."""
    ds = load(sf_dir, "documents", ["doc_id", "text"])

    def entropy(df: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({
            "doc_id": pd.Series([], dtype=np.int64),
            "n_tokens": pd.Series([], dtype=np.int64),
            "token_entropy": pd.Series([], dtype=np.float64)})
        if not len(df):
            return empty
        toks = df["text"].str.lower().str.findall(TOKEN_RE)
        ex = pd.DataFrame({
            "doc_id": df["doc_id"].to_numpy(np.int64).repeat(
                toks.map(len).to_numpy()),
            "tok": np.concatenate([np.asarray(t, dtype=object)
                                   for t in toks] or [[]])})
        if not len(ex):
            return empty
        c = ex.groupby(["doc_id", "tok"], sort=False).size()
        cf = c.to_numpy(np.float64)
        per_doc = pd.DataFrame({
            "doc_id": c.index.get_level_values(0),
            "clogc": cf * np.log2(cf),
            "n": cf}).groupby("doc_id", sort=False).sum()
        n = per_doc["n"].to_numpy(np.float64)
        h = np.log2(n) - per_doc["clogc"].to_numpy() / n
        return pd.DataFrame({
            "doc_id": per_doc.index.to_numpy(np.int64),
            "n_tokens": n.astype(np.int64),
            "token_entropy": sql_round(h, 4)})

    return ds.map_batches(entropy, batch_format="pandas")


def contamination_neardup_pairs(sf_dir: str, modulus: int = 53,
                                threshold: float = 0.2) -> rd.Dataset:
    """NEAR-DUP decontamination — the fuzzy complement of
    :func:`contamination_overlap_docs`: a training document is flagged if
    its distinct-TOKEN-set Jaccard with ANY benchmark document
    (``doc_id % modulus == 0``) reaches ``threshold`` (exact n-gram
    overlap misses paraphrased/lightly-edited eval leakage; Jaccard at
    the token level is the standard first fuzzy gate).  Returns every
    contaminated (doc_id, eval_doc, jaccard) pair.

    Scale shape (the contamination_overlap broadcast topology): the
    benchmark side collapses to a long-form (token, eval_doc) inverted
    index plus per-eval-doc set sizes, broadcast ONCE via ``ray.put``
    (eval sets are MB, not TB); the training scan is ONE map_batches —
    per batch: distinct (doc, token) explode, one vectorized merge
    against the broadcast index, one groupby for shared counts, the
    Jaccard compare on the 1e-9 grid.  Zero shuffles end to end."""
    import ray

    from .common import _cached_get

    ds = load(sf_dir, "documents", ["doc_id", "text"])
    token_re = re.compile(TOKEN_RE)

    def _tok_pairs(df: pd.DataFrame, bench_side: bool) -> pd.DataFrame:
        sel = (df["doc_id"] % modulus == 0) == bench_side
        sub = df[sel.to_numpy()]
        toks = sub["text"].map(lambda t: list(set(token_re.findall(t))))
        # fromiter, not .map(len).to_numpy(): an EMPTY object Series keeps
        # object dtype and np.repeat refuses the safe cast
        cnt = np.fromiter((len(x) for x in toks), np.int64, len(toks))
        doc = np.repeat(sub["doc_id"].to_numpy(np.int64), cnt)
        if not len(doc):
            return pd.DataFrame({"doc_id": pd.Series([], dtype=np.int64),
                                 "t": pd.Series([], dtype="string")})
        return pd.DataFrame({
            "doc_id": doc,
            "t": pd.Series(np.concatenate([np.asarray(x, dtype=object)
                                           for x in toks]), dtype="string")})

    bench = (ds.map_batches(lambda df: _tok_pairs(df, True),
                            batch_format="pandas").to_pandas())
    bench_sizes = bench.groupby("doc_id").size() if len(bench) else pd.Series(
        [], dtype=np.int64)
    bench_ref = ray.put((bench.rename(columns={"doc_id": "eval_doc"}),
                         bench_sizes.to_dict()))

    def probe(df: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({"doc_id": pd.Series([], dtype=np.int64),
                              "eval_doc": pd.Series([], dtype=np.int64),
                              "jaccard": pd.Series([], dtype=np.float64)})
        bidx, bsz = _cached_get(bench_ref)
        pairs = _tok_pairs(df, False)
        if not len(pairs) or not len(bidx):
            return empty
        a_sz = pairs.groupby("doc_id").size()
        m = pairs.merge(bidx, on="t")
        if not len(m):
            return empty
        s = (m.groupby(["doc_id", "eval_doc"], sort=False).size()
             .reset_index(name="s"))
        na = s["doc_id"].map(a_sz).to_numpy(np.float64)
        nb = s["eval_doc"].map(bsz).to_numpy(np.float64)
        j = s["s"].to_numpy(np.float64) / (na + nb - s["s"].to_numpy())
        keep = np.floor(j * 1e9 + 0.5) / 1e9 >= threshold
        return pd.DataFrame({
            "doc_id": s["doc_id"].to_numpy(np.int64)[keep],
            "eval_doc": s["eval_doc"].to_numpy(np.int64)[keep],
            "jaccard": sql_round(j[keep], 4)})

    return ds.map_batches(probe, batch_format="pandas")


# derived-v2 CDC transform contract — ONE set of constants shared by
# snapshot_diff_docs, merge_upsert_docs and (as literals) _V2_SQL, so the
# two engine implementations and the oracle can't drift apart
CDC_DEL_MOD = 17     # every CDC_DEL_MOD-th doc is deleted in v2
CDC_UPD_MOD = 10     # every CDC_UPD_MOD-th surviving doc is modified
CDC_INS_PER = 20     # one synthetic insert per CDC_INS_PER base rows
CDC_SUFFIX = " [rev2]"


def _cdc_new_doc_frame(base_max: int, ids1: np.ndarray) -> pd.DataFrame:
    """The synthetic v2 inserts for 1-based indices ``ids1`` (matching
    the oracle's ``range(1, n//20 + 1)``) — one spelling for both the
    snapshot diff and the MERGE apply."""
    return pd.DataFrame({
        "doc_id": base_max + ids1,
        "text": pd.Series([f"new document {j} for snapshot two"
                           for j in (ids1 - 1)], dtype="string"),
    })


def _doc_snapshot_meta(sf_dir: str) -> tuple[int, int]:
    """(max doc_id, synthetic-new-doc count) for the derived-v2 snapshot,
    from parquet METADATA (row-group statistics): zero data read — a
    100-TB table's doc_id column must not visit the driver just to learn
    its max.  Shared by the snapshot diff and the MERGE apply."""
    import os as _os

    import pyarrow.parquet as _pq

    from .common import _require_rows

    _require_rows(_os.path.join(sf_dir, "documents.parquet"), "documents")
    pf = _pq.ParquetFile(_os.path.join(sf_dir, "documents.parquet"))
    n_rows = pf.metadata.num_rows
    col_idx = pf.schema_arrow.names.index("doc_id")
    base_max = max(pf.metadata.row_group(i).column(col_idx).statistics.max
                   for i in range(pf.metadata.num_row_groups))
    return int(base_max), n_rows // CDC_INS_PER


def snapshot_diff_docs(sf_dir: str, num_buckets: int = 16) -> rd.Dataset:
    """SNAPSHOT DIFF / CDC between two table versions — the ingest
    reconciliation operator: classify every doc_id as 'added' (only in
    v2), 'removed' (only in v1) or 'modified' (in both, text md5
    differs); unchanged rows are not reported.

    The v2 snapshot is DERIVED deterministically from v1 by a transform
    both engines replay (every 17th doc dropped, every 10th doc's text
    gains a ' [rev2]' suffix, one synthetic new doc appended per 20
    originals with ids past max(doc_id)) — no side fixture, so the
    operator is correct at ANY scale factor and the oracle rebuilds the
    identical v2 from the documents view.

    Scale shape: each side collapses to (doc_id, md5(text)) inside
    map_batches — full text never shuffles — then ONE bucketed hash
    exchange classifies vectorized per bucket (full-outer semantics via
    the indicator merge).  The appended new docs are synthesized
    DISTRIBUTED from rd.range (at 100 TB, 5% of the corpus is not a
    driver-side list).  This is the canonical delta-reconcile: one
    content-hash scan per snapshot + one id-keyed exchange of 32-byte
    digests."""
    from .common import bucket_of, md5_hex, task_hash_exchange

    base_max, n_new = _doc_snapshot_meta(sf_dir)

    a = load(sf_dir, "documents", ["doc_id", "text"])

    def digest(side: str, v2_transform: bool):
        def fn(df: pd.DataFrame) -> pd.DataFrame:
            if v2_transform:
                df = df[(df["doc_id"] % CDC_DEL_MOD != 0).to_numpy()].copy()
                mod = (df["doc_id"] % CDC_UPD_MOD == 0).to_numpy()
                df.loc[mod, "text"] = df.loc[mod, "text"] + CDC_SUFFIX
            out = pd.DataFrame({
                "doc_id": df["doc_id"].to_numpy(np.int64),
                "h": pd.Series(md5_hex(df["text"]), dtype="string",
                               index=df.index),
            })
            out["side"] = side
            out["bkt"] = bucket_of(out["doc_id"], num_buckets)
            return out
        return fn

    def synth_new(df: pd.DataFrame) -> pd.DataFrame:
        # 1-based like the oracle range
        return _cdc_new_doc_frame(base_max, df["id"].to_numpy(np.int64) + 1)

    def both_sides(df: pd.DataFrame) -> pd.DataFrame:
        # ONE scan of the text column emits both snapshots' digests — the
        # v2 side derives from the same rows in-process, so a second
        # full-corpus read would be pure wasted I/O
        return pd.concat([digest("a", False)(df), digest("b", True)(df)],
                         ignore_index=True)

    new_docs = rd.range(n_new).map_batches(synth_new, batch_format="pandas")
    both = (a.map_batches(both_sides, batch_format="pandas")
            .union(new_docs.map_batches(digest("b", False),
                                        batch_format="pandas")))

    def classify(g: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({"doc_id": pd.Series([], dtype=np.int64),
                              "change": pd.Series([], dtype="string")})
        if not len(g):
            return empty
        l = g[g["side"] == "a"][["doc_id", "h"]]
        r = g[g["side"] == "b"][["doc_id", "h"]]
        m = l.merge(r, on="doc_id", how="outer", suffixes=("_a", "_b"),
                    indicator=True)
        # StringDtype outer-join misses are pd.NA, whose != yields NA and
        # breaks np.where — fill first; the _merge branches win anyway
        differs = (m["h_a"].fillna("") != m["h_b"].fillna("")).to_numpy()
        change = np.where(m["_merge"] == "left_only", "removed",
                          np.where(m["_merge"] == "right_only", "added",
                                   np.where(differs, "modified", "")))
        keep = change != ""
        return pd.DataFrame({
            "doc_id": m["doc_id"].to_numpy(np.int64)[keep],
            "change": pd.Series(change[keep], dtype="string")})

    return task_hash_exchange(both, lambda df: df["bkt"].to_numpy(),
                              classify, num_buckets, key_cols=["bkt"])


# the derived-v2 snapshot CTE body — ONE definition shared by the
# snapshot-diff oracle and the MERGE-apply oracle so the CDC transform
# can't drift between them
_V2_SQL = """
        SELECT doc_id,
               CASE WHEN doc_id % 10 = 0 THEN text || ' [rev2]'
                    ELSE text END AS text
        FROM documents WHERE doc_id % 17 <> 0
        UNION ALL
        SELECT (SELECT max(doc_id) FROM documents) + i,
               'new document ' || CAST(i - 1 AS VARCHAR)
                   || ' for snapshot two'
        FROM (SELECT unnest(range(1,
                 (SELECT count(*) FROM documents) // 20 + 1)) AS i)
"""

SNAPSHOT_DIFF_SQL = f"""
    WITH v2 AS (
{_V2_SQL}
    ),
    a AS (SELECT doc_id, md5(text) AS h FROM documents),
    b AS (SELECT doc_id, md5(text) AS h FROM v2)
    SELECT coalesce(a.doc_id, b.doc_id) AS doc_id,
           CASE WHEN b.doc_id IS NULL THEN 'removed'
                WHEN a.doc_id IS NULL THEN 'added'
                ELSE 'modified' END AS change
    FROM a FULL OUTER JOIN b ON a.doc_id = b.doc_id
    WHERE a.doc_id IS NULL OR b.doc_id IS NULL OR a.h <> b.h
"""


def merge_upsert_docs(sf_dir: str, num_buckets: int = 16) -> rd.Dataset:
    """MERGE INTO / CDC-APPLY — the other half of
    :func:`snapshot_diff_docs`: a base table plus a stream of typed
    change rows (delete / update / insert) is reconciled into the next
    snapshot by one id-keyed exchange — the Delta-Lake/Iceberg MERGE
    execution shape.  The output is (doc_id, md5(text)) of the MERGED
    table; the oracle builds v2 DIRECTLY from the shared derived
    transform, so the value hash certifies apply(base, delta) ==
    rebuild(v2) row for row.

    The delta derives from the same deterministic rule as the snapshot
    diff (every 17th id deleted, every 10th updated with a ' [rev2]'
    suffix, one insert per 20 base rows) but is read in a SEPARATE scan
    — delta rows arrive in their own blocks, arbitrarily partitioned
    relative to the base, exactly like an external CDC feed; co-location
    happens only through the exchange, which is the property a MERGE
    executor must provide.  Per bucket (complete doc_id groups):
    anti-join deletes, overlay updates, append inserts — all vectorized.

    Scale shape: two column-pruned scans + ONE hash exchange keyed by
    doc_id; delete/update rows carry a 32-byte digest-sized payload
    (update text here, bounded by doc size); no driver materialization
    — the merged digests stream out as a Dataset."""
    from .common import bucket_of, md5_hex, task_hash_exchange

    base_max, n_new = _doc_snapshot_meta(sf_dir)

    base = load(sf_dir, "documents", ["doc_id", "text"])
    delta_src = load(sf_dir, "documents", ["doc_id", "text"])

    def tag_base(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "doc_id": df["doc_id"].to_numpy(np.int64),
            "text": df["text"].astype("string"),
            "op": pd.Series("base", index=df.index, dtype="string")})

    def make_delta(df: pd.DataFrame) -> pd.DataFrame:
        ids = df["doc_id"].to_numpy(np.int64)
        dl = ids % CDC_DEL_MOD == 0
        up = (ids % CDC_UPD_MOD == 0) & ~dl
        new_text = (df["text"].astype("string") + CDC_SUFFIX).to_numpy()
        dels = pd.DataFrame({
            "doc_id": ids[dl],
            "text": pd.Series([""] * int(dl.sum()), dtype="string"),
            "op": pd.Series(["del"] * int(dl.sum()), dtype="string")})
        upds = pd.DataFrame({
            "doc_id": ids[up],
            "text": pd.Series(new_text[up], dtype="string"),
            "op": pd.Series(["upd"] * int(up.sum()), dtype="string")})
        return pd.concat([dels, upds], ignore_index=True)

    def make_inserts(df: pd.DataFrame) -> pd.DataFrame:
        out = _cdc_new_doc_frame(base_max, df["id"].to_numpy(np.int64) + 1)
        out["op"] = pd.Series(["ins"] * len(out), dtype="string")
        return out

    rows = (base.map_batches(tag_base, batch_format="pandas")
            .union(delta_src.map_batches(make_delta, batch_format="pandas"))
            .union(rd.range(n_new).map_batches(make_inserts,
                                               batch_format="pandas")))

    def apply_merge(g: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({"doc_id": pd.Series([], dtype=np.int64),
                              "h": pd.Series([], dtype="string")})
        if not len(g):
            return empty
        b = g[g["op"] == "base"]
        dl = g.loc[g["op"] == "del", "doc_id"]
        up = g[g["op"] == "upd"].set_index("doc_id")["text"]
        keep = b[~b["doc_id"].isin(dl).to_numpy()]
        text = up.reindex(keep["doc_id"]).reset_index(drop=True)
        text = text.fillna(keep["text"].reset_index(drop=True))
        merged = pd.DataFrame({
            "doc_id": keep["doc_id"].to_numpy(np.int64), "text": text})
        ins = g[g["op"] == "ins"][["doc_id", "text"]]
        merged = pd.concat([merged, ins], ignore_index=True)
        return pd.DataFrame({
            "doc_id": merged["doc_id"].to_numpy(np.int64),
            "h": pd.Series(md5_hex(merged["text"]), dtype="string")})

    return task_hash_exchange(
        rows, lambda df: bucket_of(df["doc_id"], num_buckets),
        apply_merge, num_buckets, key_cols=["doc_id"])


MERGE_UPSERT_SQL = f"""
    WITH v2 AS (
{_V2_SQL}
    )
    SELECT doc_id, md5(text) AS h FROM v2
"""


def _edit_distance_is_1(a: str, b: str) -> bool:
    """Exact Levenshtein == 1 check for the two cases a deletion-blocked
    candidate pair can take (equal length -> one substitution; length
    diff 1 -> one insertion/deletion)."""
    la, lb = len(a), len(b)
    if la == lb:
        return sum(x != y for x, y in zip(a, b)) == 1
    if abs(la - lb) != 1:
        return False
    if la > lb:
        a, b, la = b, a, lb
    i = 0
    while i < la and a[i] == b[i]:
        i += 1
    return a[i:] == b[i + 1:]


def token_typo_pairs(sf_dir: str, min_len: int = 4,
                     num_buckets: int = 8) -> pd.DataFrame:
    """APPROXIMATE STRING MATCHING join: all pairs of vocabulary tokens at
    edit distance EXACTLY 1, found by DELETION-NEIGHBORHOOD blocking (the
    public FastSS / SymSpell scheme): every token emits itself plus each
    single-character deletion as a blocking key — two tokens at distance 1
    necessarily share a key (substitution: both drop the differing
    position; insert/delete: the longer's deletion IS the shorter) — so
    candidate generation is lossless and never compares the O(V^2) token
    pairs.

    The synthetic corpus's tiny wordlist has no natural distance-1 pairs,
    so the universe is AUGMENTED with one planted typo per vocabulary
    token — the character at position md5(token) % len(token) deleted —
    a transform both engines replay verbatim (the pii_redact_docs planted
    -augmentation precedent), guaranteeing the operator's match/verify
    path genuinely executes.

    Scale shape: the vocabulary is built DISTRIBUTED (per-batch distinct
    + one token-keyed reduce), the blocking fan-out is L+1 keys per
    length-L token, and pair verification runs inside each key bucket —
    per-pair work is bounded by the deletion-key collision sets, never
    the vocabulary square.  The final exact-distance check is pure-Python
    per CANDIDATE (a few per bucket); the oracle is a levenshtein() = 1
    cross join, feasible in SQL precisely because the vocabulary is
    bounded."""
    from .common import keyed_map_groups, md5_hex, partial_groupby

    ds = load(sf_dir, "documents", ["text"])

    def batch_universe(df: pd.DataFrame) -> pd.DataFrame:
        # the plant is a pure per-token function, so it fuses into the
        # vocab pass: each batch emits its distinct tokens PLUS their
        # planted deletions, and ONE distinct reduce builds the universe
        toks = df["text"].str.lower().str.findall(TOKEN_RE).explode()
        toks = [str(t) for t in
                toks[toks.str.len() >= min_len].dropna().unique()]
        hashes = md5_hex(toks)
        planted = [t[:int(h[:8], 16) % len(t)] + t[int(h[:8], 16) % len(t) + 1:]
                   for t, h in zip(toks, hashes)]
        return pd.DataFrame({"tok": pd.Series(toks + planted, dtype=object)})

    universe = partial_groupby(
        ds.map_batches(batch_universe, batch_format="pandas"),
        ["tok"], {"n": ("tok", "count")}, many_groups=True,
        num_buckets=num_buckets)

    def block(df: pd.DataFrame) -> pd.DataFrame:
        keys, toks = [], []
        for t in df["tok"].astype(str):
            keys.append(t)
            toks.append(t)
            for i in range(len(t)):
                keys.append(t[:i] + t[i + 1:])
                toks.append(t)
        return pd.DataFrame({"key": pd.Series(keys, dtype=object),
                             "tok": pd.Series(toks, dtype=object)})

    blocked = universe.map_batches(block, batch_format="pandas")

    def pairs_in_bucket(bucket: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({"tok_a": pd.Series([], dtype=object),
                              "tok_b": pd.Series([], dtype=object)})
        if not len(bucket):
            return empty
        out_a, out_b = [], []
        for _, g in bucket.groupby("key", sort=False):
            cand = sorted(set(g["tok"]))
            for i in range(len(cand)):
                for j in range(i + 1, len(cand)):
                    if _edit_distance_is_1(cand[i], cand[j]):
                        out_a.append(cand[i])
                        out_b.append(cand[j])
        return pd.DataFrame({"tok_a": pd.Series(out_a, dtype=object),
                             "tok_b": pd.Series(out_b, dtype=object)})

    pairs = keyed_map_groups(blocked, "key", pairs_in_bucket, num_buckets)
    # a pair can surface under several shared deletion keys: one more
    # pair-keyed reduce dedups it distributed before the tiny collect
    deduped = partial_groupby(pairs, ["tok_a", "tok_b"],
                              {"n": ("tok_a", "count")}, many_groups=True,
                              num_buckets=num_buckets).to_pandas()
    return (deduped[["tok_a", "tok_b"]]
            .sort_values(["tok_a", "tok_b"]).reset_index(drop=True))


def bpe_merges(sf_dir: str, n_merges: int = 6,
               num_buckets: int = 8, return_words: bool = False):
    """BPE TOKENIZER TRAINING (the Sennrich et al. 2016 word-frequency
    formulation): starting from character symbols, learn ``n_merges``
    merge rules — each round merges the corpus-wide most frequent
    adjacent symbol pair (ties to the lexically smallest (a, b)) — and
    return the merge table (round, a, b, merged, n).

    Merge-application contract (pinned so the SQL oracle replays it
    bit-identically): symbols live space-joined with sentinel spaces
    (`` a b c ``) and a merge is ``str.replace(" a b ", " ab ")`` —
    leftmost non-overlapping with delimiter consumption, identical in
    Python and DuckDB ``replace``.  (In an alternating run ``a b a b``
    this defers the second merge to a later round — a documented,
    deterministic divergence from canonical list-walk BPE that both
    engines share.)

    Engine shape: the word-frequency table builds DISTRIBUTED (per-batch
    token counts, one token-keyed reduce) and STAYS a Dataset; each round
    one map_batches pass explodes per-word adjacent pairs into weighted
    partials, the tiny (a, b) reduce finds the winner (driver sees one
    bounded pair table, never words), and a second map_batches applies
    the merge — driver state is the merge TABLE only.  All values are
    integers and strings: parity needs no rounding at all.  Vocabulary,
    not corpus, bounds every per-round cost (the classic BPE property)."""
    ds = load(sf_dir, "documents", ["text"])

    def word_counts(df: pd.DataFrame) -> pd.DataFrame:
        toks = df["text"].str.lower().str.findall(TOKEN_RE).explode().dropna()
        vc = toks.value_counts()
        return pd.DataFrame({"word": vc.index.astype(object),
                             "freq": vc.to_numpy(np.int64)})

    vocab = partial_groupby(
        ds.map_batches(word_counts, batch_format="pandas"),
        ["word"], {"freq": ("freq", "sum")}, many_groups=True,
        num_buckets=num_buckets)

    def to_sym(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "word": df["word"].to_numpy(object),
            "sym": [" " + " ".join(w) + " " for w in df["word"].astype(str)],
            "freq": df["freq"].to_numpy(np.int64)})

    words = vocab.map_batches(to_sym, batch_format="pandas").materialize()

    merges = []
    for rnd in range(n_merges):
        def pair_partials(df: pd.DataFrame) -> pd.DataFrame:
            out_a, out_b, out_n = [], [], []
            for sym, freq in zip(df["sym"], df["freq"]):
                s = sym.split()
                for i in range(len(s) - 1):
                    out_a.append(s[i])
                    out_b.append(s[i + 1])
                    out_n.append(freq)
            g = (pd.DataFrame({"a": pd.Series(out_a, dtype=object),
                               "b": pd.Series(out_b, dtype=object),
                               "n": pd.Series(out_n, dtype=np.int64)})
                 .groupby(["a", "b"], sort=False)["n"].sum().reset_index())
            g["n"] = g["n"].astype(np.int64)
            return g

        pairs = partial_groupby(
            words.map_batches(pair_partials, batch_format="pandas"),
            ["a", "b"], {"n": ("n", "sum")}, many_groups=True,
            num_buckets=num_buckets).to_pandas()
        if not len(pairs):
            raise ValueError(f"bpe_merges: pair table ran dry at round "
                             f"{rnd} — lower n_merges ({n_merges})")
        win = pairs.sort_values(["n", "a", "b"],
                                ascending=[False, True, True]).iloc[0]
        a, b, n = str(win["a"]), str(win["b"]), int(win["n"])
        merges.append((rnd, a, b, a + b, n))
        pat, rep = f" {a} {b} ", f" {a}{b} "

        def apply_merge(df: pd.DataFrame, pat=pat, rep=rep) -> pd.DataFrame:
            return pd.DataFrame({
                "word": df["word"].to_numpy(object),
                "sym": [s.replace(pat, rep) for s in df["sym"]],
                "freq": df["freq"].to_numpy(np.int64)})

        words = words.map_batches(apply_merge,
                                  batch_format="pandas").materialize()

    table = pd.DataFrame(merges, columns=["round", "a", "b", "merged", "n"]
                         ).astype({"round": np.int64, "n": np.int64})
    if return_words:
        # the post-merge (word, sym, freq) vocabulary — what encoding needs
        return table, words
    return table


def _bpe_cte_chain(n_merges: int = 6, max_word_len: int = 256) -> list[str]:
    """The shared unrolled-merge-loop CTE chain (w0..w{n}, win0..win{n-1},
    guard) used by both the training oracle (bpe_sql) and the encoding
    oracle (bpe_encode_docs_sql)."""
    parts = [f"""
        WITH idx AS MATERIALIZED (
            SELECT range AS i FROM range(1, {max_word_len})
        ),
        w0 AS MATERIALIZED (
            SELECT token AS word,
                   ' ' || array_to_string(regexp_extract_all(token, '.'),
                                          ' ') || ' ' AS sym,
                   CAST(count(*) AS BIGINT) AS freq
            FROM (SELECT unnest(regexp_extract_all(lower(text),
                                                   '{TOKEN_RE}')) AS token
                  FROM documents)
            GROUP BY 1, 2
        )"""]
    for t in range(n_merges):
        parts.append(f""",
        sp{t} AS MATERIALIZED (
            SELECT word, freq, str_split(trim(sym), ' ') AS s FROM w{t}
        ),
        p{t} AS MATERIALIZED (
            SELECT sp.s[idx.i] AS a, sp.s[idx.i + 1] AS b,
                   sum(sp.freq) AS n
            FROM sp{t} sp JOIN idx ON idx.i <= len(sp.s) - 1
            GROUP BY 1, 2
        ),
        win{t} AS MATERIALIZED (
            SELECT a, b, CAST(n AS BIGINT) AS n FROM p{t}
            ORDER BY n DESC, a, b LIMIT 1
        ),
        w{t + 1} AS MATERIALIZED (
            SELECT word,
                   replace(sym,
                           ' ' || (SELECT a FROM win{t}) || ' '
                               || (SELECT b FROM win{t}) || ' ',
                           ' ' || (SELECT a FROM win{t})
                               || (SELECT b FROM win{t}) || ' ') AS sym,
                   freq
            FROM w{t}
        )""")
    parts.append(f""",
        guard AS MATERIALIZED (
            SELECT CASE WHEN max(len(s)) >= {max_word_len}
                        THEN CAST(error('bpe_sql: token exceeds '
                                        || '{max_word_len} symbols — raise '
                                        || 'max_word_len') AS INT)
                        ELSE 1 END AS chk
            FROM sp0
        )""")
    return parts


def bpe_sql(n_merges: int = 6, max_word_len: int = 256) -> str:
    """The DuckDB oracle for :func:`bpe_merges`: the merge loop unrolled
    one (pair-count, argmax, replace) CTE triple per round — every CTE
    AS MATERIALIZED (the host_sssp_sql lesson: each round references its
    predecessor repeatedly and default inlining blows the plan up
    exponentially).  Pair positions come from a static 1..max_word_len
    index joined on ``i <= len(s) - 1`` (DuckDB's range() takes only
    constants); a guard CTE raises a LOUD error() if any token reaches
    ``max_word_len`` symbols instead of silently under-counting."""
    parts = list(_bpe_cte_chain(n_merges, max_word_len))
    sel = " UNION ALL ".join(
        f"SELECT CAST({t} AS BIGINT) AS round, a, b, a || b AS merged, n "
        f"FROM win{t}" for t in range(n_merges))
    parts.append(f"""
        SELECT * FROM ({sel})
        WHERE (SELECT chk FROM guard) = 1 ORDER BY round""")
    return "".join(parts)


def bpe_encode_docs(sf_dir: str, n_merges: int = 6,
                    num_buckets: int = 8) -> pd.DataFrame:
    """TOKENIZER APPLICATION: encode every document with the merge table
    just trained (bpe_merges' pinned replace contract) and report per-doc
    token-budget numbers — word count, summed token characters, and the
    BPE symbol count the doc would cost — the planning pass an LLM-data
    pipeline runs to size context windows and shard token budgets.

    Engine shape: encoding is a VOCABULARY join, not a corpus rescan —
    the post-merge (word -> n_symbols) table is vocabulary-bounded (the
    classic BPE property), collected once and broadcast; each doc batch
    maps its tokens through the dict vectorized.  All outputs are
    integers: parity needs no rounding."""
    import ray

    _merges, words = bpe_merges(sf_dir, n_merges, num_buckets,
                                return_words=True)
    wm = words.to_pandas()          # vocabulary-bounded, not corpus-bounded
    n_sym = {w: np.int64(len(s.split()))
             for w, s in zip(wm["word"], wm["sym"])}
    ref = ray.put(n_sym)

    ds = load(sf_dir, "documents", ["doc_id", "text"])

    def encode(df: pd.DataFrame) -> pd.DataFrame:
        from .common import _cached_get

        n_sym = _cached_get(ref)
        toks = df["text"].str.lower().str.findall(TOKEN_RE)
        d = pd.DataFrame({
            "doc_id": df["doc_id"].to_numpy(np.int64).repeat(
                toks.str.len().to_numpy(np.int64)),
            "token": toks.explode().dropna().to_numpy(object)})
        if not len(d):
            return pd.DataFrame({
                "doc_id": pd.Series([], dtype=np.int64),
                "n_words": pd.Series([], dtype=np.int64),
                "n_chars_tok": pd.Series([], dtype=np.int64),
                "n_bpe_tokens": pd.Series([], dtype=np.int64)})
        d["n_sym"] = d["token"].map(n_sym).astype(np.int64)
        d["wlen"] = d["token"].str.len().astype(np.int64)
        g = d.groupby("doc_id", sort=False)
        return pd.DataFrame({
            "n_words": g.size().astype(np.int64),
            "n_chars_tok": g["wlen"].sum().astype(np.int64),
            "n_bpe_tokens": g["n_sym"].sum().astype(np.int64),
        }).reset_index()

    # each document is ONE input row, so encode() already emits exactly
    # one output row per doc_id — no reduce needed
    out = ds.map_batches(encode, batch_format="pandas").to_pandas()
    return (out.astype({"doc_id": np.int64, "n_words": np.int64,
                        "n_chars_tok": np.int64, "n_bpe_tokens": np.int64})
            .sort_values("doc_id").reset_index(drop=True))


def bpe_encode_docs_sql(n_merges: int = 6, max_word_len: int = 256) -> str:
    """Oracle: the same unrolled merge chain, then a vocabulary join of
    each doc's tokens against the final symbol table."""
    parts = list(_bpe_cte_chain(n_merges, max_word_len))
    parts.append(f""",
        wl AS MATERIALIZED (
            SELECT word, len(str_split(trim(sym), ' '))::BIGINT AS n_sym,
                   length(word)::BIGINT AS wlen
            FROM w{n_merges}
        ),
        dt AS (
            SELECT doc_id, unnest(regexp_extract_all(lower(text),
                                                     '{TOKEN_RE}')) AS token
            FROM documents
        )
        SELECT dt.doc_id, count(*)::BIGINT AS n_words,
               sum(wl.wlen)::BIGINT AS n_chars_tok,
               sum(wl.n_sym)::BIGINT AS n_bpe_tokens
        FROM dt JOIN wl ON wl.word = dt.token
        WHERE (SELECT chk FROM guard) = 1
        GROUP BY dt.doc_id""")
    return "".join(parts)


# MinHash-overlap contract shared by the engine AND the SQL oracle: the
# number of independent md5 permutations in the signature
MH_OVERLAP_SEEDS = 16


def source_minhash_overlap(sf_dir: str, n: int = 4,
                           n_seeds: int = MH_OVERLAP_SEEDS,
                           num_buckets: int = 16) -> pd.DataFrame:
    """MinHash-ESTIMATED cross-source Jaccard (Broder 1997) — the sketch
    companion to :func:`source_overlap_matrix`'s exact counts: for each
    of ``n_seeds`` independent hash permutations h_s(g) =
    md5(s || '|' || g) over the word ``n``-gram sets, two sources match
    on seed s iff their minima agree; est_jaccard = matches / n_seeds.
    This is THE estimator that replaces the exact gram-pair join when
    source gram sets are web-scale: per-source state is n_seeds hex
    strings, not the gram set.

    Scale shape: each batch emits per-(source, seed) partial MINIMA over
    its distinct grams (min is idempotent, so batch-local dedup
    suffices); one tiny many_groups reduce folds them; the pairwise
    compare runs on the #sources x n_seeds driver table (metadata-sized
    — at a fan-out where even that outgrows the driver, the compare is
    one more seed-keyed exchange).  Parity needs NO float grid: matches
    are exact integers (fixed-width lowercase hex minima order
    identically as strings on both engines — the rendezvous_assign
    rule), and the single estimate division is rounded 6 dp."""
    from .common import md5_hex

    ds = load(sf_dir, "documents", ["source", "text"])

    def partial_mins(df: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({"source": pd.Series([], dtype=object),
                              "seed": pd.Series([], dtype=np.int64),
                              "h": pd.Series([], dtype=object)})
        cnt, grams = _word_ngrams(df["text"], n)
        src = np.repeat(df["source"].to_numpy(), cnt)
        if not len(src):
            return empty
        d = pd.DataFrame({"source": src, "g": grams}).drop_duplicates()
        # hash each DISTINCT gram once per seed, then map: the gram
        # vocabulary is far smaller than the (source, gram) row count,
        # so this cuts the md5 work by the sharing factor
        uniq = pd.unique(d["g"])
        outs = []
        for s in range(n_seeds):
            hmap = pd.Series(md5_hex(f"{s}|{g}" for g in uniq), index=uniq)
            t = pd.DataFrame({"source": d["source"],
                              "h": d["g"].map(hmap)})
            m = t.groupby("source", sort=False)["h"].min().reset_index()
            m["seed"] = np.int64(s)
            outs.append(m)
        return pd.concat(outs, ignore_index=True)[["source", "seed", "h"]]

    # batch_size: the documents table arrives as ONE block at bench scale,
    # and 16 md5 passes over a mostly-unique gram set are the cost — cap
    # the batch so the hashing parallelizes across the pool
    agg = partial_groupby(
        ds.map_batches(partial_mins, batch_format="pandas", batch_size=512),
        ["source", "seed"], {"h": ("h", "min")}, many_groups=True,
        num_buckets=num_buckets).to_pandas()
    sig = agg.pivot(index="seed", columns="source", values="h")
    srcs = sorted(sig.columns)
    rows = []
    for i, a in enumerate(srcs):
        for b in srcs[i + 1:]:
            matches = int((sig[a] == sig[b]).sum())
            rows.append((a, b, matches))
    out = pd.DataFrame(rows, columns=["src_a", "src_b", "n_seed_matches"])
    out["n_seed_matches"] = out["n_seed_matches"].astype(np.int64)
    out["est_jaccard"] = sql_round(
        out["n_seed_matches"].to_numpy(np.float64) / float(n_seeds), 6)
    return out


def source_minhash_overlap_sql(n: int = 4,
                               n_seeds: int = MH_OVERLAP_SEEDS) -> str:
    """The DuckDB oracle: the shared gram spelling, per-(source, seed)
    min over the identical md5 permutation, seed-joined pair matches."""
    return f"""
        WITH toks AS (
            SELECT source, regexp_extract_all(text, '[A-Za-z0-9_]+') AS ts
            FROM documents
        ),
        grams AS (
            SELECT DISTINCT source, array_to_string(ts[i:i + {n - 1}], ' ') AS g
            FROM toks, UNNEST(range(1, len(ts) - {n - 2})) r(i)
            WHERE len(ts) >= {n}
        ),
        m AS (
            SELECT source, s, min(md5(CAST(s AS VARCHAR) || '|' || g)) AS h
            FROM grams, UNNEST(range(0, {n_seeds})) q(s)
            GROUP BY source, s
        )
        SELECT a.source AS src_a, b.source AS src_b,
               sum(CASE WHEN a.h = b.h THEN 1 ELSE 0 END)::BIGINT
                   AS n_seed_matches,
               round(sum(CASE WHEN a.h = b.h THEN 1 ELSE 0 END)::DOUBLE
                     / {n_seeds}, 6) AS est_jaccard
        FROM m a JOIN m b ON b.s = a.s AND b.source > a.source
        GROUP BY a.source, b.source
    """


# Zipf-fit contract shared with the SQL oracle: the top-k cut
ZIPF_K = 50


def vocab_zipf_slope(sf_dir: str, k: int = ZIPF_K) -> pd.DataFrame:
    """ZIPF-LAW FIT over the token rank-frequency curve — the corpus
    health diagnostic (natural text slopes near -1; a flat or cliffed
    curve marks templated/boilerplate feeds): OLS of log2(freq) on
    log2(rank) over the top-``k`` tokens, reporting slope, intercept and
    r2 (the segment_order_trend closed form on the rank axis).

    Scale shape: everything reuses :func:`vocab_top_tokens`'s
    distributed wordcount (partial counts, many_groups reduce,
    sort+limit); the fit itself folds on the k-row driver table.
    Parity: ranks are the same (n desc, token asc) order on both
    engines; the closed form evaluates from the same sums, rounded 4 dp
    (FP summation-order ulps absorbed — the OLS precedent)."""
    top = vocab_top_tokens(sf_dir, k)
    r = np.arange(1, len(top) + 1, dtype=np.float64)
    x = np.log2(r)
    y = np.log2(top["n"].to_numpy(np.float64))
    kk = float(len(top))
    sx, sy = float(x.sum()), float(y.sum())
    sxx, sxy = float((x * x).sum()), float((x * y).sum())
    syy = float((y * y).sum())
    slope = (kk * sxy - sx * sy) / (kk * sxx - sx * sx)
    intercept = (sy - slope * sx) / kk
    r2 = ((kk * sxy - sx * sy) ** 2
          / ((kk * sxx - sx * sx) * (kk * syy - sy * sy)))
    return pd.DataFrame({
        "n_tokens": pd.Series([len(top)], dtype=np.int64),
        "slope": [float(sql_round(slope, 4))],
        "intercept": [float(sql_round(intercept, 4))],
        "r2": [float(sql_round(r2, 4))]})


def vocab_zipf_slope_sql(k: int = ZIPF_K) -> str:
    """DuckDB oracle: window-ranked wordcount, the identical OLS closed
    form from SQL sums, 4 dp."""
    return f"""
        WITH v AS (
            SELECT token, count(*)::BIGINT AS n,
                   row_number() OVER (ORDER BY count(*) DESC, token) AS r
            FROM (SELECT unnest(regexp_extract_all(text, '\\w+')) AS token
                  FROM documents)
            GROUP BY token QUALIFY r <= {k}
        ),
        t AS (SELECT log2(r::DOUBLE) AS x, log2(n::DOUBLE) AS y FROM v),
        s AS (SELECT count(*)::DOUBLE AS kk, sum(x) AS sx, sum(y) AS sy,
                     sum(x * x) AS sxx, sum(x * y) AS sxy, sum(y * y) AS syy
              FROM t)
        SELECT kk::BIGINT AS n_tokens,
               round((kk * sxy - sx * sy) / (kk * sxx - sx * sx), 4)
                   AS slope,
               round((sy - (kk * sxy - sx * sy) / (kk * sxx - sx * sx) * sx)
                     / kk, 4) AS intercept,
               round(pow(kk * sxy - sx * sy, 2)
                     / ((kk * sxx - sx * sx) * (kk * syy - sy * sy)), 4)
                   AS r2
        FROM s
    """


# Count-Min contract shared with the SQL oracle: depth, width, probe cut
CM_D = 4
CM_W = 1024
CM_PROBE_K = 20


def token_cm_sketch(sf_dir: str, d: int = CM_D, w: int = CM_W,
                    k: int = CM_PROBE_K,
                    num_buckets: int = 16) -> pd.DataFrame:
    """COUNT-MIN SKETCH point queries (Cormode & Muthukrishnan 2005)
    over the token stream — the other canonical frequency summary next
    to the Misra-Gries heavy hitters: d hash rows of w counters, point
    estimate = min over rows, GUARANTEED >= truth.  The probes are the
    exact top-``k`` tokens (the shared distributed wordcount), so every
    output row carries exact count, sketch estimate and the overcount —
    the sketch-quality certificate in-row, fully SQL-oracled because
    the row hashes are md5 prefixes on an exact integer grid (the KMV
    parsing rule) and every counter is an integer.

    Scale shape: per-batch sparse counter partials (≤ d*w rows per
    batch regardless of batch size — the mergeable-sketch property),
    one tiny (row, col) reduce, probing folds on the d*w driver table.
    Parity needs NO rounding grid anywhere — counts, hashes and minima
    are all integers."""
    import hashlib

    ds = load(sf_dir, "documents", ["text"])

    def cells(df: pd.DataFrame) -> pd.DataFrame:
        vc = df["text"].str.findall(TOKEN_RE).explode().value_counts()
        if not len(vc):
            return pd.DataFrame({"r": pd.Series([], dtype=np.int64),
                                 "col": pd.Series([], dtype=np.int64),
                                 "n": pd.Series([], dtype=np.int64)})
        toks = vc.index.astype(str)
        n = vc.to_numpy(np.int64)
        outs = []
        for r in range(d):
            col = np.array([int(hashlib.md5(f"{r}|{t}".encode())
                                .hexdigest()[:13], 16) % w for t in toks],
                           dtype=np.int64)
            g = (pd.DataFrame({"col": col, "n": n})
                 .groupby("col", sort=False)["n"].sum().reset_index())
            g["r"] = np.int64(r)
            outs.append(g)
        return pd.concat(outs, ignore_index=True)[["r", "col", "n"]]

    agg = partial_groupby(ds.map_batches(cells, batch_format="pandas"),
                          ["r", "col"], {"n": ("n", "sum")},
                          many_groups=True, num_buckets=num_buckets
                          ).to_pandas()
    cm = np.zeros((d, w), dtype=np.int64)
    cm[agg["r"].to_numpy(np.int64), agg["col"].to_numpy(np.int64)] = \
        agg["n"].to_numpy(np.int64)

    top = vocab_top_tokens(sf_dir, k)  # exact probes, same tokenizer
    est = np.array([
        min(cm[r, int(hashlib.md5(f"{r}|{t}".encode())
                      .hexdigest()[:13], 16) % w] for r in range(d))
        for t in top["token"]], dtype=np.int64)
    n_exact = top["n"].to_numpy(np.int64)
    return pd.DataFrame({"token": top["token"].to_numpy(object),
                         "n_exact": n_exact, "n_est": est,
                         "overcount": est - n_exact})


def token_cm_sketch_sql(d: int = CM_D, w: int = CM_W,
                        k: int = CM_PROBE_K) -> str:
    """DuckDB oracle: the identical md5-prefix row hashes, grouped
    integer counters, min-over-rows probe of the exact top-k."""
    hash_expr = ("CAST(concat('0x', substr(md5(CAST({r} AS VARCHAR) "
                 "|| '|' || {t}), 1, 13)) AS BIGINT) % " + str(w))
    return f"""
        WITH cnt AS (
            SELECT t, count(*)::BIGINT AS n FROM (
                SELECT unnest(regexp_extract_all(text, '\\w+')) AS t
                FROM documents)
            GROUP BY t
        ),
        cells AS (
            SELECT q.r, {hash_expr.format(r='q.r', t='cnt.t')} AS col,
                   sum(cnt.n)::BIGINT AS c
            FROM cnt, UNNEST(range(0, {d})) q(r)
            GROUP BY 1, 2
        ),
        top AS (
            SELECT t, n, row_number() OVER (ORDER BY n DESC, t) AS rk
            FROM cnt QUALIFY rk <= {k}
        ),
        probe AS (
            SELECT top.t, top.n, q.r,
                   {hash_expr.format(r='q.r', t='top.t')} AS col
            FROM top, UNNEST(range(0, {d})) q(r)
        )
        SELECT p.t AS token, any_value(p.n) AS n_exact,
               min(c.c)::BIGINT AS n_est,
               (min(c.c) - any_value(p.n))::BIGINT AS overcount
        FROM probe p JOIN cells c ON c.r = p.r AND c.col = p.col
        GROUP BY p.t
    """


# content-defined chunking contract shared with the SQL oracle
CDC_K = 8          # rolling-hash window (chars)
CDC_MOD = 64       # boundary rule h % 64 == 0  =>  ~64-char average chunks


def cdc_chunk_dedup(sf_dir: str, k: int = CDC_K, modulus: int = CDC_MOD,
                    num_buckets: int = 16) -> pd.DataFrame:
    """CONTENT-DEFINED CHUNKING dedup statistics (the Rabin-boundary
    scheme of LBFS/backup systems and large-corpus text dedup): a chunk
    boundary falls AFTER every k-char window whose rolling hash is
    0 mod ``modulus``, so identical passages chunk identically no matter
    where they sit in a document — unlike fixed-size chunking, an
    insertion shifts only the chunk it lands in.  Chunks are identified
    by md5 of their utf-8 text; the summary row reports chunk counts,
    duplicate-copy counts and the byte-savings a content-addressed store
    would realize.  (Production CDC adds min/max chunk-size clamps; the
    unclamped rule is kept so the oracle is a pure window expression.)

    Scale shape: per-doc boundary detection is one vectorized rolling
    hash + slice per batch; chunk copies reduce via a hash-bucketed
    (md5 -> copies) exchange; the driver folds only the final scalar
    summary.  Reference analog: the reference dedups whole products by
    name (src/storage/main.go:146-151); this dedups sub-document
    content."""
    import hashlib

    ds = load(sf_dir, "documents", ["doc_id", "text"])

    def chunks(df: pd.DataFrame) -> pd.DataFrame:
        hs, ls = [], []
        for t in df["text"]:
            cp = np.frombuffer(t.encode("utf-32-le", "ignore"),
                               dtype=np.uint32)
            if not len(cp):
                continue
            h = _rolling_hashes(t, k)
            cuts = np.flatnonzero(h % modulus == 0) + k
            starts = np.concatenate([[0], cuts])
            ends = np.concatenate([cuts, [len(cp)]])
            keep = ends > starts
            for s, e in zip(starts[keep], ends[keep]):
                c = cp[s:e].tobytes().decode("utf-32-le")
                hs.append(hashlib.md5(c.encode()).hexdigest())
                ls.append(e - s)
        return pd.DataFrame({"h": pd.Series(hs, dtype=object),
                             "clen": pd.Series(ls, dtype=np.int64)})

    per_chunk = partial_groupby(
        ds.map_batches(chunks, batch_format="pandas"),
        ["h"], {"copies": ("h", "count"), "clen": ("clen", "max")},
        many_groups=True, num_buckets=num_buckets)

    def summarize(b: pd.DataFrame) -> pd.DataFrame:
        c = b["copies"].to_numpy(np.int64)
        ln = b["clen"].to_numpy(np.int64)
        return pd.DataFrame({
            "n_chunks": [c.sum()], "n_unique": [np.int64(len(b))],
            "chars_total": [(c * ln).sum()],
            "chars_saved": [((c - 1) * ln).sum()],
            "max_copies": [c.max() if len(c) else np.int64(0)]})

    parts = (per_chunk.map_batches(summarize, batch_format="pandas")
             .to_pandas())                 # one partial row per bucket
    mx = int(parts["max_copies"].max())
    s = parts.drop(columns="max_copies").sum()
    n_chunks, n_unique = int(s["n_chunks"]), int(s["n_unique"])
    chars_total, chars_saved = int(s["chars_total"]), int(s["chars_saved"])
    if n_chunks == 0:
        # all-empty corpus: zeros, not a ZeroDivisionError (the oracle's
        # coalesce mirrors this)
        return pd.DataFrame({
            "n_chunks": [np.int64(0)], "n_unique": [np.int64(0)],
            "dup_chunks": [np.int64(0)], "chars_total": [np.int64(0)],
            "chars_saved": [np.int64(0)], "max_copies": [np.int64(0)],
            "avg_chunk_len": [0.0], "dedup_ratio": [0.0]})
    return pd.DataFrame({
        "n_chunks": [np.int64(n_chunks)], "n_unique": [np.int64(n_unique)],
        "dup_chunks": [np.int64(n_chunks - n_unique)],
        "chars_total": [np.int64(chars_total)],
        "chars_saved": [np.int64(chars_saved)],
        "max_copies": [np.int64(mx)],
        "avg_chunk_len": sql_round([chars_total / n_chunks], 4),
        "dedup_ratio": sql_round([chars_saved / chars_total], 6)})


def cdc_chunk_dedup_sql(k: int = CDC_K, modulus: int = CDC_MOD) -> str:
    """Oracle: the identical polynomial window hash (doc_fingerprints
    constants), boundary filter, lead() spans, substr chunks, md5 group."""
    terms = " + ".join(
        f"ascii(substr(text, i + {j + 1}, 1))::BIGINT"
        f" * {pow(FP_BASE, k - 1 - j, FP_PRIME)}"
        for j in range(k))
    return f"""
        WITH pos AS (
            SELECT doc_id, text,
                   unnest(range(greatest(length(text) - {k - 1}, 0))) AS i
            FROM documents WHERE length(text) > 0
        ),
        cuts AS (
            SELECT doc_id, text, i + {k} AS s FROM pos
            WHERE ({terms}) % {FP_PRIME} % {modulus} = 0
        ),
        starts AS (
            SELECT doc_id, text, 0 AS s FROM documents
            WHERE length(text) > 0
            UNION ALL SELECT doc_id, text, s FROM cuts
        ),
        spans AS (
            SELECT doc_id, text, s,
                   coalesce(lead(s) OVER (PARTITION BY doc_id ORDER BY s),
                            length(text)) AS e
            FROM starts
        ),
        g AS (
            SELECT md5(substr(text, s + 1, e - s)) AS h,
                   count(*)::BIGINT AS copies,
                   max(e - s)::BIGINT AS clen
            FROM spans WHERE e > s GROUP BY 1
        )
        SELECT coalesce(sum(copies), 0)::BIGINT AS n_chunks,
               count(*)::BIGINT AS n_unique,
               (coalesce(sum(copies), 0) - count(*))::BIGINT AS dup_chunks,
               coalesce(sum(copies * clen), 0)::BIGINT AS chars_total,
               coalesce(sum((copies - 1) * clen), 0)::BIGINT AS chars_saved,
               coalesce(max(copies), 0)::BIGINT AS max_copies,
               CASE WHEN coalesce(sum(copies), 0) = 0 THEN 0.0
                    ELSE round(sum(copies * clen)::DOUBLE / sum(copies), 4)
               END AS avg_chunk_len,
               CASE WHEN coalesce(sum(copies * clen), 0) = 0 THEN 0.0
                    ELSE round(sum((copies - 1) * clen)::DOUBLE
                               / sum(copies * clen), 6)
               END AS dedup_ratio
        FROM g
    """


# split-assignment contract: md5 of doc_id on the 16^13 dyadic grid;
# cumulative thresholds in 2^52 units (80% / 10% / 10%)
SPLIT_FRACS = (("train", 0.8), ("val", 0.1), ("test", 0.1))
_HEX13 = 4503599627370496  # 16^13 == 2^52 (the kmv exact-dyadic scale)


def dataset_split_assign(sf_dir: str, num_buckets: int = 16) -> pd.DataFrame:
    """DETERMINISTIC TRAIN/VAL/TEST SPLIT by content-stable hash — the
    canonical leakage-proof splitter: split(doc) is a pure function of
    doc_id's md5, so re-running the pipeline, adding documents, or
    resharding NEVER moves an existing doc across splits (random-state
    splitters do, silently contaminating eval sets).  Output is the
    per-(split, lang) count/fraction table — the stratification audit
    that catches a split accidentally starving a language.

    Scale shape: pure per-row hash map + one (split, lang) count
    reduce; the fraction fold runs on the ~15-row driver table."""
    from .common import md5_hex, sql_round

    # cuts from SINGLE float literals (0.8, 0.9) — accumulating
    # 0.8 + 0.1 gives 0.9000000000000001 and a different integer cut
    # than the oracle's int(0.9 * 2^52)
    cut1, cut2 = int(0.8 * _HEX13), int(0.9 * _HEX13)

    def prep(b: pd.DataFrame) -> pd.DataFrame:
        u = np.array([int(h[:13], 16) for h in
                      md5_hex(str(int(d)) for d in b["doc_id"])],
                     dtype=np.int64)
        split = np.where(u < cut1, "train",
                         np.where(u < cut2, "val", "test"))
        return b.assign(split=pd.Series(split.astype(object),
                                        index=b.index))

    counts = partial_groupby(
        load(sf_dir, "documents", ["doc_id", "lang"]),
        ["split", "lang"], {"n_docs": ("doc_id", "count")}, prep=prep,
    ).to_pandas()
    total = int(counts["n_docs"].sum())
    return (pd.DataFrame({
        "split": counts["split"].to_numpy(object),
        "lang": counts["lang"].to_numpy(object),
        "n_docs": counts["n_docs"].to_numpy(np.int64),
        "frac": sql_round(counts["n_docs"].to_numpy(np.float64) / total, 6)})
        .sort_values(["split", "lang"]).reset_index(drop=True))


def dataset_split_assign_sql() -> str:
    cut1 = int(0.8 * _HEX13)
    cut2 = int(0.9 * _HEX13)
    return f"""
        WITH a AS (
            SELECT lang,
                   CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)),
                                            1, 13)) AS BIGINT) AS u
            FROM documents
        ),
        s AS (
            SELECT lang, CASE WHEN u < {cut1} THEN 'train'
                              WHEN u < {cut2} THEN 'val'
                              ELSE 'test' END AS split
            FROM a
        )
        SELECT split, lang, count(*)::BIGINT AS n_docs,
               round(count(*)::DOUBLE
                     / (SELECT count(*) FROM documents), 6) AS frac
        FROM s GROUP BY 1, 2
    """


def token_llr_pairs(sf_dir: str, min_count: int = PMI_MIN_COUNT,
                    k: int = PMI_K, num_buckets: int = 16) -> pd.DataFrame:
    """TOP-K LOG-LIKELIHOOD-RATIO collocations (Dunning 1993) — the
    significance-test companion to PMI: where PMI over-rewards rare
    pairs, LLR weighs the full 2x2 doc-level contingency (both words /
    one / neither), so high scores need EVIDENCE, not just lift.  Same
    co-occurrence counts as token_pmi_pairs (one shared reduce:
    _doc_cooccurrence_counts); the statistic is the entropy form
    2 * (sum xlogx(cells) - sum xlogx(margins) + xlogx(N)) with
    xlogx(0) = 0, written as the IDENTICAL left-associated chain on
    both engines and rounded 4 dp before the (llr desc, a, b) rank."""
    n_docs, dfc, p = _doc_cooccurrence_counts(sf_dir, min_count,
                                              num_buckets)
    ca = dfc.reindex(p["a"]).to_numpy(np.int64).astype(np.float64)
    cb = dfc.reindex(p["b"]).to_numpy(np.int64).astype(np.float64)
    k11 = p["n"].to_numpy(np.int64).astype(np.float64)
    n = float(n_docs)

    def xlx(x: np.ndarray) -> np.ndarray:
        return np.where(x > 0, x * np.log(np.maximum(x, 1.0)), 0.0)

    llr = 2.0 * (xlx(k11) + xlx(ca - k11) + xlx(cb - k11)
                 + xlx(n - ca - cb + k11)
                 - xlx(ca) - xlx(n - ca) - xlx(cb) - xlx(n - cb)
                 + xlx(np.full_like(k11, n)))
    out = pd.DataFrame({"a": p["a"].to_numpy(), "b": p["b"].to_numpy(),
                        "n_docs_ab": p["n"].to_numpy(np.int64),
                        "llr": sql_round(llr, 4)})
    out = (out.sort_values(["llr", "a", "b"],
                           ascending=[False, True, True])
           .head(k).reset_index(drop=True))
    out["rank"] = np.arange(1, len(out) + 1, dtype=np.int64)
    return out


def token_llr_pairs_sql(min_count: int = PMI_MIN_COUNT,
                        k: int = PMI_K) -> str:
    """Oracle: the same distinct-explode counts and the identical
    left-associated xlogx chain."""
    def xlx(e: str) -> str:
        return f"(CASE WHEN ({e}) > 0 THEN ({e}) * ln({e}) ELSE 0.0 END)"

    expr = ("2.0 * (" + xlx("k11") + " + " + xlx("ca - k11") + " + "
            + xlx("cb - k11") + " + " + xlx("n - ca - cb + k11") + " - "
            + xlx("ca") + " - " + xlx("n - ca") + " - " + xlx("cb")
            + " - " + xlx("n - cb") + " + " + xlx("n") + ")")
    return f"""
        WITH u AS (
            SELECT DISTINCT doc_id,
                   unnest(regexp_extract_all(lower(text), '\\w+')) AS tok
            FROM documents
        ),
        nn AS (SELECT count(*)::DOUBLE AS n FROM documents),
        df_ AS (SELECT tok, count(*)::BIGINT AS c FROM u GROUP BY tok),
        pc AS (
            SELECT a.tok AS a, b.tok AS b, count(*)::BIGINT AS cab
            FROM u a JOIN u b
              ON b.doc_id = a.doc_id AND b.tok > a.tok
            GROUP BY a.tok, b.tok
        ),
        cells AS (
            SELECT pc.a, pc.b, pc.cab AS n_docs_ab,
                   pc.cab::DOUBLE AS k11, da.c::DOUBLE AS ca,
                   db.c::DOUBLE AS cb, nn.n AS n
            FROM pc
            JOIN df_ da ON da.tok = pc.a
            JOIN df_ db ON db.tok = pc.b, nn
            WHERE pc.cab >= {min_count}
        ),
        s AS (SELECT a, b, n_docs_ab, round({expr}, 4) AS llr FROM cells)
        SELECT a, b, n_docs_ab, llr,
               CAST(row_number() OVER (ORDER BY llr DESC, a, b)
                    AS BIGINT) AS rank
        FROM s QUALIFY rank <= {k}
    """


def heaps_law_fit(sf_dir: str, num_buckets: int = 16) -> pd.DataFrame:
    """HEAPS'-LAW FIT of vocabulary growth V(T) ~ K * T^beta — the other
    canonical corpus statistic next to Zipf: beta near 0.5 marks natural
    text, beta near 1 marks unbounded-id noise (every doc mints new
    tokens), beta near 0 marks a closed template vocabulary.  The growth
    CURVE needs no multi-pass prefix scan: a token enters the vocabulary
    at its FIRST document, so V(k docs) = #{tokens: min doc_id < k} —
    one distributed (token -> min doc) reduce, then each power-of-two
    checkpoint is a count over that table; T(k) folds from per-batch
    conditional token-count partials.  OLS of log2 V on log2 T over the
    checkpoints (the vocab_zipf_slope closed form), 4 dp.

    Output: one row per checkpoint (docs, tokens, vocab) with the fitted
    beta / logK / r2 replicated — curve and fit in one table."""
    import os

    import pyarrow.parquet as pq

    from .common import _require_rows

    _require_rows(os.path.join(sf_dir, "documents.parquet"), "documents")
    n_docs = pq.ParquetFile(
        os.path.join(sf_dir, "documents.parquet")).metadata.num_rows
    cks = [1 << j for j in range(31) if (1 << j) < n_docs] + [n_docs]

    ds = load(sf_dir, "documents", ["doc_id", "text"])

    def first_partial(df: pd.DataFrame) -> pd.DataFrame:
        toks = df["text"].str.lower().str.findall(TOKEN_RE)
        d = pd.DataFrame({
            "t": toks.explode().dropna().to_numpy(object),
            "fd": df["doc_id"].to_numpy(np.int64).repeat(
                toks.str.len().to_numpy(np.int64))})
        return d.groupby("t", sort=False)["fd"].min().reset_index()

    first = partial_groupby(
        ds.map_batches(first_partial, batch_format="pandas"),
        ["t"], {"fd": ("fd", "min")}, many_groups=True,
        num_buckets=num_buckets)

    def vocab_counts(b: pd.DataFrame) -> pd.DataFrame:
        fd = b["fd"].to_numpy(np.int64)
        return pd.DataFrame({
            "k": np.asarray(cks, dtype=np.int64),
            "v": np.asarray([(fd < k).sum() for k in cks], np.int64)})

    def token_counts(df: pd.DataFrame) -> pd.DataFrame:
        toks = df["text"].str.lower().str.findall(TOKEN_RE)
        nt = toks.str.len().to_numpy(np.int64)
        did = df["doc_id"].to_numpy(np.int64)
        return pd.DataFrame({
            "k": np.asarray(cks, dtype=np.int64),
            "t": np.asarray([nt[did < k].sum() for k in cks], np.int64)})

    v = (first.map_batches(vocab_counts, batch_format="pandas")
         .to_pandas().groupby("k")["v"].sum())
    t = (ds.map_batches(token_counts, batch_format="pandas")
         .to_pandas().groupby("k")["t"].sum())
    curve = pd.DataFrame({"k_docs": np.asarray(cks, np.int64),
                          "n_tokens": t.reindex(cks).to_numpy(np.int64),
                          "vocab": v.reindex(cks).to_numpy(np.int64)})
    m = curve[curve["n_tokens"] > 0]
    x = np.log2(m["n_tokens"].to_numpy(np.float64))
    y = np.log2(m["vocab"].to_numpy(np.float64))
    kk = float(len(m))
    sx, sy = float(x.sum()), float(y.sum())
    sxx, sxy = float((x * x).sum()), float((x * y).sum())
    syy = float((y * y).sum())
    beta = (kk * sxy - sx * sy) / (kk * sxx - sx * sx)
    logk = (sy - beta * sx) / kk
    r2 = ((kk * sxy - sx * sy) ** 2
          / ((kk * sxx - sx * sx) * (kk * syy - sy * sy)))
    return curve.assign(
        beta=float(sql_round(beta, 4)),
        log2_k=float(sql_round(logk, 4)),
        r2=float(sql_round(r2, 4)))


def heaps_law_fit_sql() -> str:
    """Oracle: first-occurrence table + per-checkpoint scalar counts +
    the identical OLS closed form."""
    return """
        WITH nn AS (SELECT count(*)::BIGINT AS n FROM documents),
        cks AS (
            SELECT (1::BIGINT << j.range) AS k
            FROM range(0, 31) j, nn WHERE (1::BIGINT << j.range) < nn.n
            UNION ALL SELECT n FROM nn
        ),
        tok AS (
            SELECT doc_id, unnest(regexp_extract_all(lower(text),
                                                     '\\w+')) AS t
            FROM documents
        ),
        fo AS (SELECT t, min(doc_id) AS fd FROM tok GROUP BY t),
        tc AS (SELECT doc_id, count(*)::BIGINT AS nt FROM tok
               GROUP BY doc_id),
        curve AS (
            SELECT cks.k AS k_docs,
                   coalesce((SELECT sum(nt) FROM tc
                             WHERE doc_id < cks.k), 0)::BIGINT AS n_tokens,
                   (SELECT count(*) FROM fo WHERE fd < cks.k)::BIGINT
                       AS vocab
            FROM cks
        ),
        pts AS (
            SELECT log2(n_tokens::DOUBLE) AS x, log2(vocab::DOUBLE) AS y
            FROM curve WHERE n_tokens > 0
        ),
        s AS (SELECT count(*)::DOUBLE AS kk, sum(x) AS sx, sum(y) AS sy,
                     sum(x * x) AS sxx, sum(x * y) AS sxy,
                     sum(y * y) AS syy
              FROM pts)
        SELECT c.k_docs, c.n_tokens, c.vocab,
               round((kk * sxy - sx * sy) / (kk * sxx - sx * sx), 4)
                   AS beta,
               round((sy - (kk * sxy - sx * sy) / (kk * sxx - sx * sx)
                      * sx) / kk, 4) AS log2_k,
               round((kk * sxy - sx * sy) * (kk * sxy - sx * sy)
                     / ((kk * sxx - sx * sx) * (kk * syy - sy * sy)), 4)
                   AS r2
        FROM curve c, s
    """


NEYMAN_S = 100   # total sample budget across strata


def neyman_sample_docs(sf_dir: str, total: int = NEYMAN_S,
                       num_buckets: int = 16) -> pd.DataFrame:
    """NEYMAN-ALLOCATION stratified sampling (Neyman 1934): the sample
    budget splits across language strata proportionally to N_h * sigma_h
    (size times spread of n_chars), the allocation that minimizes the
    variance of the stratified mean — the statistically-right upgrade
    over the equal/proportional allocation of stratified_sample_docs.
    Fractional quotas resolve by LARGEST REMAINDER with the (remainder
    desc, lang asc) tie order; selection within a stratum is the md5
    hash-rank rule shared with every other sampler here.  Output is the
    per-stratum audit: size, spread, quota, allocation, and the ACTUAL
    selected count as the in-row certificate (equal unless a stratum is
    smaller than its allocation, where it saturates).

    Scale shape: one (lang) moment reduce, the quota fold on the
    handful-of-strata driver table, one lang-keyed selection exchange."""
    from .common import keyed_map_groups, partial_groupby, sql_round

    ds = load(sf_dir, "documents", ["doc_id", "lang", "n_chars"])

    def prep(b: pd.DataFrame) -> pd.DataFrame:
        # INTEGER moments (n_chars is int): the partial sums are exact,
        # so sigma/quota are identical doubles on both engines and the
        # floor/remainder allocation can never flip on summation order
        x = b["n_chars"].to_numpy(np.int64)
        return b.assign(x=x, xx=x * x)

    m = partial_groupby(
        ds, ["lang"],
        {"n": ("x", "count"), "s": ("x", "sum"), "ss": ("xx", "sum")},
        prep=prep).to_pandas().sort_values("lang").reset_index(drop=True)
    n = m["n"].to_numpy(np.int64).astype(np.float64)
    s = m["s"].to_numpy(np.int64).astype(np.float64)
    ss = m["ss"].to_numpy(np.int64).astype(np.float64)
    var = np.where(n > 1, (n * ss - s * s) / (n * (n - 1.0)), 0.0)
    sigma = np.sqrt(np.maximum(var, 0.0))
    w = n * sigma
    # all-constant strata: Neyman weights vanish — fall back to
    # PROPORTIONAL allocation (mirrored in the oracle's CASE)
    if w.sum() == 0.0:
        w = n
    quota = total * w / w.sum()
    base = np.floor(quota)
    leftover = int(total - base.sum())
    rem_rank = np.lexsort((m["lang"].to_numpy(object), -(quota - base)))
    alloc = base.astype(np.int64)
    alloc[rem_rank[:leftover]] += 1
    alloc = np.minimum(alloc, n.astype(np.int64))   # saturate small strata
    alloc_map = dict(zip(m["lang"], alloc))

    def pick(bucket: pd.DataFrame) -> pd.DataFrame:
        g = bucket.assign(__k=_md5_doc_key(bucket["doc_id"]))
        g = g.sort_values(["lang", "__k"])
        rk = g.groupby("lang", sort=False).cumcount()
        cap = g["lang"].map(alloc_map).fillna(0).to_numpy(np.int64)
        kept = g[rk.to_numpy() < cap]
        out = kept.groupby("lang", sort=False).size()
        return pd.DataFrame({"lang": out.index.to_numpy(object),
                             "n_selected": out.to_numpy(np.int64)})

    sel = (keyed_map_groups(ds, "lang", pick, num_buckets).to_pandas()
           .groupby("lang")["n_selected"].sum())
    return pd.DataFrame({
        "lang": m["lang"].to_numpy(object),
        "n_docs": m["n"].to_numpy(np.int64),
        "sigma": sql_round(sigma, 6),
        "alloc": alloc,
        "n_selected": sel.reindex(m["lang"]).fillna(0)
                         .to_numpy(np.int64)})


def neyman_sample_docs_sql(total: int = NEYMAN_S) -> str:
    """Oracle: identical float-cast moment variance, largest-remainder
    quotas with the same tie order, md5 hash-rank selection."""
    return f"""
        WITH m AS (
            SELECT lang, count(*)::BIGINT::DOUBLE AS n,
                   sum(n_chars)::BIGINT::DOUBLE AS s,
                   sum(n_chars * n_chars)::BIGINT::DOUBLE AS ss
            FROM documents GROUP BY lang
        ),
        v AS (
            SELECT lang, n,
                   sqrt(greatest(CASE WHEN n > 1
                        THEN (n * ss - s * s) / (n * (n - 1.0))
                        ELSE 0.0 END, 0.0)) AS sigma
            FROM m
        ),
        q AS (
            SELECT lang, n, sigma,
                   CASE WHEN (SELECT sum(n * sigma) FROM v) = 0
                        THEN {total} * n / (SELECT sum(n) FROM v)
                        ELSE {total} * n * sigma
                             / (SELECT sum(n * sigma) FROM v)
                   END AS quota
            FROM v
        ),
        b AS (
            SELECT lang, n, sigma, quota, floor(quota) AS base,
                   row_number() OVER (ORDER BY quota - floor(quota) DESC,
                                      lang) AS rr
            FROM q
        ),
        a AS (
            SELECT lang, n, sigma,
                   least(CAST(base + CASE WHEN rr <=
                           {total} - (SELECT sum(base) FROM b)
                         THEN 1 ELSE 0 END AS BIGINT),
                         CAST(n AS BIGINT)) AS alloc
            FROM b
        ),
        r AS (
            SELECT lang,
                   row_number() OVER (PARTITION BY lang
                       ORDER BY md5(CAST(doc_id AS VARCHAR))) AS rk
            FROM documents
        ),
        sel AS (
            SELECT r.lang, count(*)::BIGINT AS n_selected
            FROM r JOIN a ON a.lang = r.lang
            WHERE r.rk <= a.alloc GROUP BY r.lang
        )
        SELECT a.lang, CAST(a.n AS BIGINT) AS n_docs,
               round(a.sigma, 6) AS sigma, a.alloc,
               coalesce(sel.n_selected, 0) AS n_selected
        FROM a LEFT JOIN sel USING (lang)
    """


def postings_compression_stats(sf_dir: str, min_df: int = 5,
                               num_buckets: int = 16) -> pd.DataFrame:
    """INVERTED-INDEX COMPRESSION AUDIT: per token, the bit cost of its
    posting list under delta + ELIAS-GAMMA coding vs raw 64-bit ids —
    the planner number behind every search index's size estimate (gamma
    spends 2*floor(log2(gap))+1 bits per gap, so dense terms compress
    dramatically and rare terms barely).  Gaps use the standard d0+1,
    d_i - d_{i-1} convention; every quantity is an exact integer (bit
    lengths come from binary-digit counts, never float log2, so no
    power-of-two edge can flip), making parity rounding-free except the
    final ratio.

    Scale shape: distinct (token, doc) pairs route by token through one
    bucketed exchange; per-token gap folds are vectorized diffs; output
    is vocabulary-bounded."""
    from .common import keyed_map_groups, sql_round

    ds = load(sf_dir, "documents", ["doc_id", "text"])

    def pairs(df: pd.DataFrame) -> pd.DataFrame:
        toks = df["text"].str.lower().str.findall(TOKEN_RE)
        d = pd.DataFrame({
            "token": toks.explode().dropna().to_numpy(object),
            "doc_id": df["doc_id"].to_numpy(np.int64).repeat(
                toks.str.len().to_numpy(np.int64))})
        return d.drop_duplicates()

    POW2 = 2 ** np.arange(63, dtype=np.int64)

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        if not len(g):
            return pd.DataFrame({
                "token": pd.Series([], dtype=object),
                "df": pd.Series([], dtype=np.int64),
                "gamma_bits": pd.Series([], dtype=np.int64)})
        g = g.drop_duplicates().sort_values(["token", "doc_id"])
        rows = []
        for tok, grp in g.groupby("token", sort=False):
            d = grp["doc_id"].to_numpy(np.int64)
            gaps = np.diff(d, prepend=-1)        # d0+1, then deltas
            # floor(log2(gap)) + 1 == count of binary digits, exactly
            nbits = np.searchsorted(POW2, gaps, side="right")
            rows.append((tok, len(d), int((2 * (nbits - 1) + 1).sum())))
        return pd.DataFrame(rows, columns=["token", "df", "gamma_bits"]
                            ).astype({"df": np.int64,
                                      "gamma_bits": np.int64})

    out = (keyed_map_groups(ds.map_batches(pairs, batch_format="pandas"),
                            "token", fold, num_buckets).to_pandas())
    out = out[out["df"] >= min_df].copy()
    out["raw_bits"] = (64 * out["df"]).astype(np.int64)
    out["ratio"] = sql_round(out["gamma_bits"].to_numpy(np.float64)
                             / out["raw_bits"].to_numpy(np.float64), 4)
    return (out[["token", "df", "raw_bits", "gamma_bits", "ratio"]]
            .sort_values("token").reset_index(drop=True))


def postings_compression_stats_sql(min_df: int = 5) -> str:
    """Oracle: lag() gaps per token, binary-digit-count bit lengths via
    format('{{:b}}', gap), the identical gamma cost."""
    return f"""
        WITH u AS (
            SELECT DISTINCT doc_id,
                   unnest(regexp_extract_all(lower(text), '\\w+')) AS token
            FROM documents
        ),
        g AS (
            SELECT token, doc_id,
                   coalesce(doc_id - lag(doc_id) OVER (PARTITION BY token
                                ORDER BY doc_id), doc_id + 1) AS gap
            FROM u
        ),
        c AS (
            SELECT token, count(*)::BIGINT AS df,
                   sum(2 * (length(format('{{:b}}', gap)) - 1) + 1)
                       ::BIGINT AS gamma_bits
            FROM g GROUP BY token
        )
        SELECT token, df, (64 * df)::BIGINT AS raw_bits, gamma_bits,
               round(gamma_bits::DOUBLE / (64 * df), 4) AS ratio
        FROM c WHERE df >= {min_df}
    """


def source_theil_decomposition(sf_dir: str,
                               num_buckets: int = 16) -> pd.DataFrame:
    """THEIL-T INEQUALITY DECOMPOSITION of document sizes across
    sources — the inequality index that decomposes EXACTLY:
    T_total = T_between + sum_g w_g * T_g (w_g = group share of total
    chars), so "is size skew a between-source or within-source problem"
    gets a number for each side, and the identity itself rides along as
    the in-row certificate (decomp_gap ~ 0).  All sufficient statistics
    are (n, sum x, sum x*ln(x)) per source — one reduce; per-row xlogx
    terms are identical on both engines, sums differ only in ulps and
    every output rounds 6 dp.

    Scale shape: one (source) partial pass; the 20-row decomposition
    folds driver-side."""
    from .common import sql_round

    def prep(b: pd.DataFrame) -> pd.DataFrame:
        x = b["n_chars"].to_numpy(np.float64)
        return b.assign(x=x, xlx=x * np.log(x))

    g = partial_groupby(
        load(sf_dir, "documents", ["source", "n_chars"]),
        ["source"],
        {"n": ("x", "count"), "sx": ("x", "sum"), "sxlx": ("xlx", "sum")},
        prep=prep, many_groups=True, num_buckets=num_buckets,
    ).to_pandas().sort_values("source").reset_index(drop=True)

    n_g = g["n"].to_numpy(np.float64)
    sx_g = g["sx"].to_numpy(np.float64)
    sxlx_g = g["sxlx"].to_numpy(np.float64)
    n, sx, sxlx = n_g.sum(), sx_g.sum(), sxlx_g.sum()
    mu = sx / n
    mu_g = sx_g / n_g
    # T = sum x*ln(x) / (n*mu) - ln(mu), per group and globally
    t_g = sxlx_g / (n_g * mu_g) - np.log(mu_g)
    t_total = sxlx / (n * mu) - np.log(mu)
    w_g = sx_g / sx                       # char share of each source
    t_between = float((w_g * np.log(mu_g / mu)).sum())
    t_within = float((w_g * t_g).sum())
    gap = t_total - (t_between + t_within)
    return pd.DataFrame({
        "source": g["source"].to_numpy(object),
        "n_docs": g["n"].to_numpy(np.int64),
        "mean_chars": sql_round(mu_g, 4),
        "theil_g": sql_round(t_g, 6),
        "char_share": sql_round(w_g, 6),
        "theil_total": np.full(len(g), float(sql_round(t_total, 6))),
        "theil_between": np.full(len(g), float(sql_round(t_between, 6))),
        "theil_within": np.full(len(g), float(sql_round(t_within, 6))),
        "decomp_gap": np.full(len(g), float(sql_round(gap, 6)))})


def source_theil_decomposition_sql() -> str:
    return """
        WITH g AS (
            SELECT source, count(*)::DOUBLE AS n,
                   sum(n_chars::DOUBLE) AS sx,
                   sum(n_chars::DOUBLE * ln(n_chars::DOUBLE)) AS sxlx
            FROM documents GROUP BY source
        ),
        t AS (SELECT sum(n) AS n, sum(sx) AS sx, sum(sxlx) AS sxlx
              FROM g),
        m AS (
            SELECT g.source, g.n, g.sx, g.sxlx,
                   g.sx / g.n AS mu_g, t.sx / t.n AS mu,
                   g.sxlx / (g.n * (g.sx / g.n)) - ln(g.sx / g.n) AS t_g,
                   g.sx / t.sx AS w_g
            FROM g, t
        ),
        agg AS (
            SELECT (SELECT sxlx / (n * (sx / n)) - ln(sx / n) FROM t)
                       AS t_total,
                   sum(w_g * ln(mu_g / mu)) AS t_between,
                   sum(w_g * t_g) AS t_within
            FROM m
        )
        SELECT m.source, CAST(m.n AS BIGINT) AS n_docs,
               round(m.mu_g, 4) AS mean_chars,
               round(m.t_g, 6) AS theil_g,
               round(m.w_g, 6) AS char_share,
               round((SELECT t_total FROM agg), 6) AS theil_total,
               round((SELECT t_between FROM agg), 6) AS theil_between,
               round((SELECT t_within FROM agg), 6) AS theil_within,
               round((SELECT t_total - (t_between + t_within) FROM agg), 6)
                   AS decomp_gap
        FROM m
    """


BURST_K = 20


def token_burstiness(sf_dir: str, k: int = BURST_K,
                     num_buckets: int = 16) -> pd.DataFrame:
    """TOKEN BURSTINESS (Church & Gale 1995): the variance-to-mean
    ratio of per-document counts for the top-``k`` tokens — VMR 1 is
    Poisson (function words scatter evenly), VMR >> 1 is bursty
    (content words clump into the few documents about that topic).
    The curation use: bursty tokens are topical signal, flat tokens are
    boilerplate candidates.  Zero-count documents are part of the
    distribution (moments divide by the CORPUS doc count), caught with
    no explode: VMR needs only sum c and sum c^2 per token plus N.

    All moments are exact integers; VMR = (n*ss - s*s) / (s*(n-1)) is
    the mirrored float expression, 4 dp."""
    from .common import sql_round

    ds = load(sf_dir, "documents", ["doc_id", "text"])

    def moments(df: pd.DataFrame) -> pd.DataFrame:
        toks = df["text"].str.lower().str.findall(TOKEN_RE)
        d = pd.DataFrame({
            "token": toks.explode().dropna().to_numpy(object),
            "doc_id": df["doc_id"].to_numpy(np.int64).repeat(
                toks.str.len().to_numpy(np.int64))})
        g = (d.groupby(["token", "doc_id"], sort=False).size()
             .rename("c").reset_index())
        g["cc"] = g["c"] * g["c"]
        out = g.groupby("token", sort=False).agg(
            s=("c", "sum"), ss=("cc", "sum"),
            df_=("c", "size")).reset_index()
        return out.astype({"s": np.int64, "ss": np.int64,
                           "df_": np.int64})

    m = partial_groupby(
        ds.map_batches(moments, batch_format="pandas"), ["token"],
        {"s": ("s", "sum"), "ss": ("ss", "sum"), "df_": ("df_", "sum")},
        many_groups=True, num_buckets=num_buckets).to_pandas()

    import os

    import pyarrow.parquet as pq

    from .common import _require_rows

    _require_rows(os.path.join(sf_dir, "documents.parquet"), "documents")
    n = float(pq.ParquetFile(os.path.join(
        sf_dir, "documents.parquet")).metadata.num_rows)
    m = (m.sort_values(["s", "token"], ascending=[False, True])
         .head(k).reset_index(drop=True))
    s = m["s"].to_numpy(np.int64).astype(np.float64)
    ss = m["ss"].to_numpy(np.int64).astype(np.float64)
    vmr = (n * ss - s * s) / (s * (n - 1.0))
    return pd.DataFrame({
        "token": m["token"].to_numpy(object),
        "n_occurrences": m["s"].to_numpy(np.int64),
        "n_docs": m["df_"].to_numpy(np.int64),
        "vmr": sql_round(vmr, 4)})


def token_burstiness_sql(k: int = BURST_K) -> str:
    return f"""
        WITH d AS (
            SELECT doc_id, unnest(regexp_extract_all(lower(text),
                                                     '\\w+')) AS token
            FROM documents
        ),
        pc AS (SELECT token, doc_id, count(*)::BIGINT AS c FROM d
               GROUP BY 1, 2),
        m AS (
            SELECT token, sum(c)::BIGINT AS s,
                   sum(c * c)::BIGINT AS ss,
                   count(*)::BIGINT AS df_
            FROM pc GROUP BY token
            ORDER BY s DESC, token LIMIT {k}
        ),
        nn AS (SELECT count(*)::DOUBLE AS n FROM documents)
        SELECT token, s AS n_occurrences, df_ AS n_docs,
               round((nn.n * ss - s::DOUBLE * s)
                     / (s * (nn.n - 1.0)), 4) AS vmr
        FROM m, nn
    """


IBLT_M = 4096    # cells: decodes diffs up to ~0.8*M/K keys (~1.1k) whp —
                 # comfortably the sf0.01-scale diff; past capacity both
                 # engines report decode_complete=False honestly (size M
                 # to ~1.3*K*|diff| for a production reconcile)
IBLT_K = 3       # index hashes per key
IBLT_ROUNDS = 12  # SYNCHRONOUS peeling rounds, same schedule both engines


def _iblt_cell_fold(d) -> pd.DataFrame:
    """ONE (cell -> sum, xor, xor) fold shared by the partial and the
    reduce phase so the two can never desynchronize; ``None`` yields
    the typed empty frame."""
    if d is None:
        return pd.DataFrame({"cell": pd.Series([], dtype=np.int64),
                             "dc": pd.Series([], dtype=np.int64),
                             "kx": pd.Series([], dtype=np.int64),
                             "hx": pd.Series([], dtype=np.int64)})
    g = d.groupby("cell", sort=False)
    return pd.DataFrame({
        "cell": np.fromiter(g.groups.keys(), dtype=np.int64),
        "dc": g["dc"].sum().to_numpy(np.int64),
        "kx": g["kx"].agg(lambda s: np.bitwise_xor.reduce(
            s.to_numpy(np.int64))).to_numpy(np.int64),
        "hx": g["hx"].agg(lambda s: np.bitwise_xor.reduce(
            s.to_numpy(np.int64))).to_numpy(np.int64)})


def _iblt_key_cells(keys: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """(cell indices (n, K), check hashes (n,)) for uint52 keys — md5
    residues, the engine spelling of the oracle's expressions."""
    import hashlib

    cells = np.empty((len(keys), IBLT_K), dtype=np.int64)
    for j in range(IBLT_K):
        cells[:, j] = [int(hashlib.md5(f"{j}|{int(k)}".encode())
                           .hexdigest()[:13], 16) % IBLT_M for k in keys]
    chk = np.array([int(hashlib.md5(f"chk|{int(k)}".encode())
                        .hexdigest()[:13], 16) for k in keys],
                   dtype=np.int64)
    return cells, chk


def iblt_snapshot_reconcile(sf_dir: str,
                            num_buckets: int = 16) -> pd.DataFrame:
    """SET RECONCILIATION via INVERTIBLE BLOOM LOOKUP TABLES (Goodrich
    & Mitzenmacher 2011; the Minisketch/rsync-family primitive): two
    snapshot replicas exchange O(|diff|)-sized sketches — NOT their
    contents — and the symmetric difference decodes by peeling.  Keys
    are md5(doc_id | content-digest) over the shared derived-v2 CDC
    snapshot; v1 inserts +1, v2 inserts -1 into (count, xor-of-keys,
    xor-of-checkhashes) cells, so the cell table IS sketch(v1) -
    sketch(v2) and unchanged rows cancel exactly.  Peeling pops pure
    cells (count +-1 with a consistent check hash) until empty — the
    result is confluent (peel order cannot change it), which is what
    lets the oracle replay it as fixed recompute rounds.

    Output: one summary row with exact diff counts, decoded counts per
    side, and the two certificates (decode_complete: every cell
    cancelled; decoded_matches_exact: the recovered key sets equal the
    exact diff's).  Scale shape: cell partials are (sum, xor, xor) —
    fully mergeable; the peel runs on the fixed IBLT_M-row driver
    table, independent of corpus size."""
    from .common import bucket_of, keyed_map_groups, md5_hex

    base_max, n_new = _doc_snapshot_meta(sf_dir)
    a = load(sf_dir, "documents", ["doc_id", "text"])

    def key_of(doc_ids, texts) -> np.ndarray:
        th = md5_hex(texts)
        return np.array([int(h[:13], 16) for h in
                         md5_hex(f"{int(d)}|{t}"
                                 for d, t in zip(doc_ids, th))],
                        dtype=np.int64)

    def cell_partials(df: pd.DataFrame) -> pd.DataFrame:
        outs = []
        for sign, dids, txts in _snapshot_sides(df, base_max):
            if not len(dids):
                continue
            keys = key_of(dids, txts)
            cells, chk = _iblt_key_cells(keys)
            for j in range(IBLT_K):
                outs.append(pd.DataFrame({
                    "cell": cells[:, j], "dc": np.int64(sign),
                    "kx": keys, "hx": chk}))
        if not outs:
            return _iblt_cell_fold(None)
        return _iblt_cell_fold(pd.concat(outs, ignore_index=True))

    def cell_reduce(g: pd.DataFrame) -> pd.DataFrame:
        return _iblt_cell_fold(g if len(g) else None)

    parts = a.map_batches(cell_partials, batch_format="pandas")
    new_docs = rd.range(n_new).map_batches(
        lambda df: _cdc_new_doc_frame(base_max,
                                      df["id"].to_numpy(np.int64) + 1),
        batch_format="pandas")

    def new_cells(df: pd.DataFrame) -> pd.DataFrame:
        keys = key_of(df["doc_id"].to_numpy(np.int64), df["text"])
        cells, chk = _iblt_key_cells(keys)
        outs = [pd.DataFrame({"cell": cells[:, j], "dc": np.int64(-1),
                              "kx": keys, "hx": chk})
                for j in range(IBLT_K)]
        return pd.concat(outs, ignore_index=True)

    table = (keyed_map_groups(
        parts.union(new_docs.map_batches(new_cells,
                                         batch_format="pandas")),
        "cell", cell_reduce, num_buckets).to_pandas())

    cells = np.zeros(IBLT_M, dtype=np.int64)
    kx = np.zeros(IBLT_M, dtype=np.int64)
    hx = np.zeros(IBLT_M, dtype=np.int64)
    cells[table["cell"]] = table["dc"]
    kx[table["cell"]] = table["kx"]
    hx[table["cell"]] = table["hx"]

    import hashlib

    dec_v1, dec_v2 = set(), set()
    for _round in range(IBLT_ROUNDS):
        # SYNCHRONOUS round (matching the oracle's recompute schedule):
        # snapshot all currently-pure cells, THEN remove their keys —
        # an in-place sweep would spend the shared round budget faster
        # than the unrolled SQL and diverge near the decode threshold
        pure = []
        seen_keys = set()
        for c in range(IBLT_M):
            if cells[c] in (1, -1):
                key = int(kx[c])
                chk = int(hashlib.md5(f"chk|{key}".encode())
                          .hexdigest()[:13], 16)
                if chk == int(hx[c]) and key not in seen_keys:
                    pure.append((key, int(cells[c])))
                    seen_keys.add(key)
        if not pure:
            break
        for key, sign in pure:
            (dec_v1 if sign == 1 else dec_v2).add(key)
            kcells, kchk = _iblt_key_cells(np.array([key],
                                                    dtype=np.int64))
            for j in range(IBLT_K):
                cc = int(kcells[0, j])
                cells[cc] -= sign
                kx[cc] ^= key
                hx[cc] ^= int(kchk[0])
    decode_complete = bool((cells == 0).all() and (kx == 0).all())

    # exact certificate from the digest diff (the snapshot_diff shapes)
    diff = snapshot_diff_docs(sf_dir).to_pandas()
    n_mod = int((diff["change"] == "modified").sum())
    n_add = int((diff["change"] == "added").sum())
    n_rem = int((diff["change"] == "removed").sum())
    n_v1_exact = n_rem + n_mod
    n_v2_exact = n_add + n_mod
    return pd.DataFrame({
        "m_cells": [np.int64(IBLT_M)],
        "n_v1_only_exact": [np.int64(n_v1_exact)],
        "n_v2_only_exact": [np.int64(n_v2_exact)],
        "n_decoded_v1": [np.int64(len(dec_v1))],
        "n_decoded_v2": [np.int64(len(dec_v2))],
        "decode_complete": [decode_complete],
        "counts_match_exact": [len(dec_v1) == n_v1_exact
                               and len(dec_v2) == n_v2_exact]})


def _snapshot_sides(df: pd.DataFrame, base_max: int):
    """Yield (sign, doc_ids, texts) for the v1 (+1) and derived-v2 (-1)
    views of a base batch — the same transform as snapshot_diff_docs."""
    yield 1, df["doc_id"].to_numpy(np.int64), df["text"]
    v2 = df[(df["doc_id"] % CDC_DEL_MOD != 0).to_numpy()].copy()
    mod = (v2["doc_id"] % CDC_UPD_MOD == 0).to_numpy()
    v2.loc[mod, "text"] = v2.loc[mod, "text"] + CDC_SUFFIX
    yield -1, v2["doc_id"].to_numpy(np.int64), v2["text"]


def iblt_snapshot_reconcile_sql(m: int = IBLT_M, kk: int = IBLT_K,
                                rounds: int = IBLT_ROUNDS) -> str:
    """Oracle: identical key/cell/check hashes, (sum, bit_xor, bit_xor)
    cell aggregates, and the peel unrolled as fixed recompute rounds
    (valid because IBLT peeling is confluent)."""
    key = ("CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR) || '|' "
           "|| th), 1, 13)) AS BIGINT)")
    # the synthetic-insert range is capped at 1e6 rows (range() cannot
    # take subqueries); past that the oracle would silently drop inserts
    # the engine generates — fail LOUDLY instead (bpe max_word_len rule)
    guard = (f"SELECT CASE WHEN count(*) // {CDC_INS_PER} > 1000000 "
             "THEN CAST(error('iblt oracle: synthetic-insert range cap "
             "exceeded — raise the range bound') AS INT) ELSE 1 END "
             "AS chk FROM documents")
    cell_of = ("CAST(concat('0x', substr(md5(CAST({j} AS VARCHAR) || '|' "
               "|| CAST({k} AS VARCHAR)), 1, 13)) AS BIGINT) % " + str(m))
    chk_of = ("CAST(concat('0x', substr(md5('chk|' "
              "|| CAST({k} AS VARCHAR)), 1, 13)) AS BIGINT)")
    parts = [f"""
        WITH v1 AS MATERIALIZED (
            SELECT doc_id, md5(text) AS th FROM documents
        ),
        v2 AS MATERIALIZED (
            SELECT doc_id,
                   CASE WHEN doc_id % {CDC_UPD_MOD} = 0
                        THEN md5(text || '{CDC_SUFFIX}')
                        ELSE md5(text) END AS th
            FROM documents WHERE doc_id % {CDC_DEL_MOD} != 0
            UNION ALL
            SELECT (SELECT max(doc_id) FROM documents) + j.range,
                   md5('new document ' || (j.range - 1)
                       || ' for snapshot two')
            FROM range(1, 1000001) j
            WHERE j.range <= (SELECT count(*) // {CDC_INS_PER}
                              FROM documents)
        ),
        insguard AS MATERIALIZED ({guard}),
        k1 AS MATERIALIZED (
            SELECT {key} AS k FROM v1
            WHERE (SELECT chk FROM insguard) = 1),
        k2 AS MATERIALIZED (SELECT {key} AS k FROM v2),
        allr AS MATERIALIZED (
            SELECT k, 1::BIGINT AS sgn FROM k1
            UNION ALL SELECT k, -1::BIGINT FROM k2
        ),
        base AS MATERIALIZED (
            SELECT {cell_of.format(j='j.range', k='k')} AS cell,
                   sum(sgn)::BIGINT AS dc, bit_xor(k)::BIGINT AS kx,
                   bit_xor({chk_of.format(k='k')})::BIGINT AS hx
            FROM allr, range(0, {kk}) j
            GROUP BY 1
        ),
        d0 AS MATERIALIZED (
            SELECT CAST(NULL AS BIGINT) AS k, CAST(NULL AS BIGINT) AS sgn
            WHERE false
        )"""]
    for r in range(1, rounds + 1):
        parts.append(f""",
        da{r} AS MATERIALIZED (
            SELECT {cell_of.format(j='j.range', k='d.k')} AS cell,
                   sum(d.sgn)::BIGINT AS dc, bit_xor(d.k)::BIGINT AS kx,
                   bit_xor({chk_of.format(k='d.k')})::BIGINT AS hx
            FROM d{r - 1} d, range(0, {kk}) j
            GROUP BY 1
        ),
        eff{r} AS MATERIALIZED (
            SELECT b.cell, b.dc - coalesce(a.dc, 0) AS dc,
                   xor(b.kx, coalesce(a.kx, 0)) AS kx,
                   xor(b.hx, coalesce(a.hx, 0)) AS hx
            FROM base b LEFT JOIN da{r} a USING (cell)
        ),
        p{r} AS MATERIALIZED (
            SELECT DISTINCT kx AS k, dc AS sgn FROM eff{r}
            WHERE dc IN (1, -1)
              AND {chk_of.format(k='kx')} = hx
        ),
        d{r} AS MATERIALIZED (
            SELECT k, sgn FROM d{r - 1}
            UNION SELECT k, sgn FROM p{r}
        )""")
    R = rounds
    parts.append(f""",
        dafin AS (
            SELECT {cell_of.format(j='j.range', k='d.k')} AS cell,
                   sum(d.sgn)::BIGINT AS dc, bit_xor(d.k)::BIGINT AS kx
            FROM d{R} d, range(0, {kk}) j GROUP BY 1
        ),
        fin AS (
            SELECT coalesce(max(abs(b.dc - coalesce(a.dc, 0))), 0) AS mdc,
                   coalesce(max(xor(b.kx, coalesce(a.kx, 0))), 0) AS mkx
            FROM base b LEFT JOIN dafin a USING (cell)
        ),
        ex AS (
            SELECT (SELECT count(*) FROM k1
                    WHERE k NOT IN (SELECT k FROM k2))::BIGINT AS v1o,
                   (SELECT count(*) FROM k2
                    WHERE k NOT IN (SELECT k FROM k1))::BIGINT AS v2o
        ),
        dd AS (
            SELECT sum(CASE WHEN sgn = 1 THEN 1 ELSE 0 END)::BIGINT
                       AS d1,
                   sum(CASE WHEN sgn = -1 THEN 1 ELSE 0 END)::BIGINT
                       AS d2
            FROM d{R}
        )
        SELECT {m}::BIGINT AS m_cells,
               ex.v1o AS n_v1_only_exact, ex.v2o AS n_v2_only_exact,
               coalesce(dd.d1, 0) AS n_decoded_v1,
               coalesce(dd.d2, 0) AS n_decoded_v2,
               (SELECT mdc = 0 AND mkx = 0 FROM fin) AS decode_complete,
               coalesce(dd.d1, 0) = ex.v1o
                   AND coalesce(dd.d2, 0) = ex.v2o AS counts_match_exact
        FROM ex, dd
    """)
    return "".join(parts)


MERKLE_LEAVES = 64


def corpus_merkle_tree(sf_dir: str, num_buckets: int = 16) -> pd.DataFrame:
    """MERKLE TREE over the documents table — the content-addressed
    integrity structure replica sets diff with (two stores compare
    roots; on mismatch walk down only the differing subtrees — the
    O(log n) upgrade of the reference's 5-second full-rescan
    anti-entropy, src/storage/replicate.go:252-268).  Leaves are 64
    doc_id-range blocks; a leaf digest is md5 of the block's
    '|'-joined per-doc content digests in doc_id order; parents are
    md5(left || right).  Output is the FULL 127-node tree (level 0 =
    leaves, level 6 = root) so any subtree comparison is a row lookup.

    Scale shape: per-doc digests never leave their block's bucket (one
    block-keyed exchange of 32-byte strings); the 6-level fold runs on
    the 64-leaf driver table."""
    import hashlib
    import os

    import pyarrow.parquet as pq

    from .common import _require_rows, keyed_map_groups, md5_hex

    _require_rows(os.path.join(sf_dir, "documents.parquet"), "documents")
    n = pq.ParquetFile(os.path.join(
        sf_dir, "documents.parquet")).metadata.num_rows
    span = (n - 1) // MERKLE_LEAVES + 1

    ds = load(sf_dir, "documents", ["doc_id", "text"])

    def digests(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "blk": df["doc_id"].to_numpy(np.int64) // span,
            "doc_id": df["doc_id"].to_numpy(np.int64),
            "h": pd.Series(md5_hex(df["text"]), dtype=object,
                           index=df.index)})

    def leaf(g: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for blk, grp in g.groupby("blk", sort=False):
            joined = "|".join(grp.sort_values("doc_id")["h"])
            rows.append((int(blk),
                         hashlib.md5(joined.encode()).hexdigest()))
        return pd.DataFrame(rows, columns=["blk", "digest"])

    leaves = (keyed_map_groups(
        ds.map_batches(digests, batch_format="pandas"), "blk", leaf,
        num_buckets).to_pandas().set_index("blk")["digest"])
    empty = hashlib.md5(b"").hexdigest()
    level = [leaves.get(i, empty) for i in range(MERKLE_LEAVES)]
    out = [(0, i, d) for i, d in enumerate(level)]
    lv = 0
    while len(level) > 1:
        lv += 1
        level = [hashlib.md5((level[2 * i] + level[2 * i + 1]).encode())
                 .hexdigest() for i in range(len(level) // 2)]
        out.extend((lv, i, d) for i, d in enumerate(level))
    return pd.DataFrame(out, columns=["level", "idx", "digest"]).astype(
        {"level": np.int64, "idx": np.int64})


def corpus_merkle_tree_sql(leaves: int = MERKLE_LEAVES) -> str:
    """Oracle: string_agg leaf digests in doc_id order, empty blocks
    hash md5(''), parents unrolled one level per CTE."""
    import math

    levels = int(math.log2(leaves))
    parts = [f"""
        WITH sp AS (SELECT (count(*) - 1) // {leaves} + 1 AS span
                    FROM documents),
        d AS (
            SELECT doc_id // (SELECT span FROM sp) AS blk,
                   md5(text) AS h, doc_id
            FROM documents
        ),
        l0 AS MATERIALIZED (
            SELECT g.range AS idx,
                   md5(coalesce((SELECT string_agg(h, '|' ORDER BY doc_id)
                                 FROM d WHERE d.blk = g.range), ''))
                       AS digest
            FROM range(0, {leaves}) g
        )"""]
    for t in range(1, levels + 1):
        parts.append(f""",
        l{t} AS MATERIALIZED (
            SELECT a.idx // 2 AS idx, md5(a.digest || b.digest) AS digest
            FROM l{t - 1} a JOIN l{t - 1} b
                 ON b.idx = a.idx + 1 AND a.idx % 2 = 0
        )""")
    sel = " UNION ALL ".join(
        f"SELECT {t}::BIGINT AS level, idx::BIGINT AS idx, digest "
        f"FROM l{t}" for t in range(0, levels + 1))
    parts.append(f"""
        SELECT * FROM ({sel})""")
    return "".join(parts)


TR_ITERS = 20
TR_K = 15
TR_D = 0.85


def textrank_keywords(sf_dir: str, k: int = TR_K,
                      n_iters: int = TR_ITERS,
                      num_buckets: int = 8) -> pd.DataFrame:
    """TEXTRANK KEYWORDS (Mihalcea & Tarau 2004): weighted PageRank on
    the word co-occurrence graph (adjacent-token edges, both
    directions) — the unsupervised keyword extractor that beats raw
    frequency by rewarding tokens that CONNECT frequent contexts.
    Fixed iteration count and the (score desc, token) rank so the
    oracle unrolls the identical fixed point (the host_pagerank pattern
    applied to a text graph).

    Scale shape: edge weights reduce from per-batch adjacent-pair
    counts (vectorized shift, one token-pair exchange, vocabulary2-
    bounded); each iteration is one map_batches over the edge Dataset
    with the rank vector broadcast (rank state is VOCABULARY-bounded)."""
    import ray as _ray

    from .common import _cached_get, sql_round

    ds = load(sf_dir, "documents", ["text"])

    def pair_counts(df: pd.DataFrame) -> pd.DataFrame:
        toks = df["text"].str.lower().str.findall(TOKEN_RE)
        out_a, out_b = [], []
        for t in toks:
            if len(t) < 2:
                continue
            out_a.extend(t[:-1])
            out_b.extend(t[1:])
        d = pd.DataFrame({"a": pd.Series(out_a, dtype=object),
                          "b": pd.Series(out_b, dtype=object)})
        d = d[d["a"] != d["b"]]
        g = (pd.concat([d, d.rename(columns={"a": "b", "b": "a"})],
                       ignore_index=True)
             .groupby(["a", "b"], sort=False).size().rename("w")
             .reset_index())
        g["w"] = g["w"].astype(np.int64)
        return g

    ew = partial_groupby(
        ds.map_batches(pair_counts, batch_format="pandas"),
        ["a", "b"], {"w": ("w", "sum")}, many_groups=True,
        num_buckets=num_buckets).materialize()

    od = partial_groupby(ew, ["a"], {"out": ("w", "sum")},
                         many_groups=True,
                         num_buckets=num_buckets).to_pandas()
    nodes = sorted(od["a"])          # vocabulary-bounded
    idx = {t: i for i, t in enumerate(nodes)}
    n = len(nodes)
    outv = np.zeros(n)
    outv[[idx[t] for t in od["a"]]] = od["out"].to_numpy(np.float64)

    r = np.full(n, 1.0 / n)
    for _ in range(n_iters):
        ref = _ray.put((dict(zip(nodes, r)), dict(zip(nodes, outv))))

        def contrib(df: pd.DataFrame) -> pd.DataFrame:
            rm, om = _cached_get(ref)
            ra = df["a"].map(rm).to_numpy(np.float64)
            oa = df["a"].map(om).to_numpy(np.float64)
            c = df["w"].to_numpy(np.float64) / oa * ra
            return (pd.DataFrame({"b": df["b"].to_numpy(object), "c": c})
                    .groupby("b", sort=False)["c"].sum().reset_index())

        s = partial_groupby(
            ew.map_batches(contrib, batch_format="pandas"), ["b"],
            {"c": ("c", "sum")}, many_groups=True,
            num_buckets=num_buckets).to_pandas()
        dense = np.zeros(n)
        dense[[idx[t] for t in s["b"]]] = s["c"].to_numpy(np.float64)
        r = (1 - TR_D) / n + TR_D * dense    # undirected: no dangling

    out = pd.DataFrame({"token": np.asarray(nodes, object),
                        "score": sql_round(r, 6)})
    out = (out.sort_values(["score", "token"], ascending=[False, True])
           .head(k).reset_index(drop=True))
    out["rank"] = np.arange(1, len(out) + 1, dtype=np.int64)
    return out


def textrank_keywords_sql(k: int = TR_K, n_iters: int = TR_ITERS) -> str:
    """Oracle: the identical weighted fixed point unrolled (one CTE per
    iteration) over the same adjacent-pair edge counts."""
    parts = [f"""
        WITH toks AS MATERIALIZED (
            SELECT doc_id, t, i FROM (
                SELECT doc_id,
                       unnest(regexp_extract_all(lower(text), '\\w+'))
                           AS t,
                       generate_subscripts(regexp_extract_all(
                           lower(text), '\\w+'), 1) AS i
                FROM documents)
        ),
        pairs AS MATERIALIZED (
            SELECT a.t AS a, b.t AS b, count(*)::BIGINT AS w0
            FROM toks a JOIN toks b
                 ON b.doc_id = a.doc_id AND b.i = a.i + 1
            WHERE a.t <> b.t
            GROUP BY 1, 2
        ),
        e AS MATERIALIZED (
            SELECT a, b, sum(w)::DOUBLE AS w FROM (
                SELECT a, b, w0 AS w FROM pairs
                UNION ALL SELECT b, a, w0 FROM pairs)
            GROUP BY 1, 2
        ),
        od AS MATERIALIZED (SELECT a, sum(w) AS outw FROM e GROUP BY a),
        nn AS (SELECT count(*)::DOUBLE AS n FROM od),
        r0 AS MATERIALIZED (
            SELECT a AS t, 1.0 / (SELECT n FROM nn) AS r FROM od
        )"""]
    for t in range(1, n_iters + 1):
        parts.append(f""",
        c{t} AS MATERIALIZED (
            SELECT e.b AS t, sum(e.w / od.outw * r.r) AS c
            FROM e JOIN od ON od.a = e.a JOIN r{t - 1} r ON r.t = e.a
            GROUP BY e.b
        ),
        r{t} AS MATERIALIZED (
            SELECT r0.t,
                   (1 - {TR_D}) / (SELECT n FROM nn)
                   + {TR_D} * coalesce(c.c, 0.0) AS r
            FROM r0 LEFT JOIN c{t} c USING (t)
        )""")
    parts.append(f"""
        SELECT t AS token, round(r, 6) AS score,
               CAST(row_number() OVER (ORDER BY round(r, 6) DESC, t)
                    AS BIGINT) AS rank
        FROM r{n_iters} QUALIFY rank <= {k}""")
    return "".join(parts)


TRIE_MAX_LEN = 8


def vocab_trie_widths(sf_dir: str, max_len: int = TRIE_MAX_LEN,
                      num_buckets: int = 8) -> pd.DataFrame:
    """TRIE LEVEL WIDTHS of the vocabulary: distinct prefixes per
    length 1..``max_len`` — the branching profile that sizes FST/trie
    autocomplete indexes and explains tokenizer merge behavior (a
    narrow level means heavy shared stems).  Also carries per-level
    branching = widths[l] / widths[l-1] rounded.  All counts integer.

    Scale shape: per-batch DISTINCT (len, prefix) partials (vocabulary-
    bounded regardless of corpus rows), one bucketed distinct-count
    exchange per level via a single grouped reduce."""
    from .common import sql_round

    ds = load(sf_dir, "documents", ["text"])

    def prefixes(df: pd.DataFrame) -> pd.DataFrame:
        toks = (df["text"].str.lower().str.findall(TOKEN_RE)
                .explode().dropna().drop_duplicates())
        outs = []
        for l in range(1, max_len + 1):
            p = toks.str[:l].drop_duplicates()
            p = p[p.str.len() == l]
            outs.append(pd.DataFrame({"l": np.int64(l),
                                      "p": p.to_numpy(object)}))
        return pd.concat(outs, ignore_index=True)

    u = partial_groupby(
        ds.map_batches(prefixes, batch_format="pandas"),
        ["l", "p"], {"n": ("l", "count")}, many_groups=True,
        num_buckets=num_buckets)
    w = partial_groupby(u, ["l"], {"width": ("l", "count")}
                        ).to_pandas().sort_values("l")
    width = (pd.Series(0, index=range(1, max_len + 1), dtype=np.int64)
             .add(w.set_index("l")["width"], fill_value=0)
             .astype(np.int64))
    prev = width.shift(1)
    branching = np.where(prev > 0, width / prev, 0.0)
    return pd.DataFrame({
        "prefix_len": np.arange(1, max_len + 1, dtype=np.int64),
        "width": width.to_numpy(np.int64),
        "branching": sql_round(branching, 4)})


def vocab_trie_widths_sql(max_len: int = TRIE_MAX_LEN) -> str:
    return f"""
        WITH toks AS (
            SELECT DISTINCT unnest(regexp_extract_all(lower(text),
                                                      '\\w+')) AS t
            FROM documents
        ),
        lv AS (SELECT range AS l FROM range(1, {max_len + 1})),
        w AS (
            SELECT lv.l,
                   count(DISTINCT CASE WHEN length(t) >= lv.l
                         THEN substr(t, 1, lv.l) END)::BIGINT AS width
            FROM lv LEFT JOIN toks ON true
            GROUP BY lv.l
        )
        SELECT l::BIGINT AS prefix_len, width,
               CASE WHEN lag(width) OVER (ORDER BY l) > 0
                    THEN round(width::DOUBLE
                               / lag(width) OVER (ORDER BY l), 4)
                    ELSE 0.0 END AS branching
        FROM w
    """


COV_STEPS = 8    # greedy steps (sources ranked until here)


def source_coverage_greedy(sf_dir: str, steps: int = COV_STEPS,
                           num_buckets: int = 8) -> pd.DataFrame:
    """GREEDY MAX-COVERAGE source ordering: which sources to acquire
    first so distinct-vocabulary coverage grows fastest — the classic
    submodular-maximization shape (greedy is (1 - 1/e)-optimal) behind
    data-licensing and crawl-seed budgeting decisions.  Step t picks
    the source adding the most UNSEEN tokens (ties to the
    lexicographically smaller source); each step's marginal gain and
    the cumulative coverage fraction ride along.  All counts are exact
    integers.

    Scale shape: ONE distinct (token, source) exchange builds the
    membership table (vocabulary x sources bounded — never corpus
    rows); the greedy folds on that driver table."""
    from .common import sql_round

    ds = load(sf_dir, "documents", ["text", "source"])

    def pairs(df: pd.DataFrame) -> pd.DataFrame:
        toks = df["text"].str.lower().str.findall(TOKEN_RE)
        d = pd.DataFrame({
            "token": toks.explode().dropna().to_numpy(object),
            "source": df["source"].to_numpy(object).repeat(
                toks.str.len().to_numpy(np.int64))})
        return d.drop_duplicates()

    m = partial_groupby(
        ds.map_batches(pairs, batch_format="pandas"),
        ["token", "source"], {"n": ("token", "count")},
        many_groups=True, num_buckets=num_buckets).to_pandas()

    vocab = m["token"].nunique()
    sets = {s: set(g["token"]) for s, g in m.groupby("source")}
    covered: set = set()
    rows = []
    for t in range(1, min(steps, len(sets)) + 1):
        best = min(((-len(sets[s] - covered), s) for s in sets
                    if s not in {r[1] for r in rows}))
        gain, src = -best[0], best[1]
        covered |= sets[src]
        rows.append((t, src, gain, len(covered),
                     float(sql_round(len(covered) / vocab, 6))))
    return pd.DataFrame(rows, columns=[
        "step", "source", "new_tokens", "cum_tokens", "coverage"]
    ).astype({"step": np.int64, "new_tokens": np.int64,
              "cum_tokens": np.int64})


def source_coverage_greedy_sql(steps: int = COV_STEPS) -> str:
    """Oracle: the greedy unrolled — per step an argmax over per-source
    unseen-token counts against the union of prior picks."""
    parts = [f"""
        WITH ts AS MATERIALIZED (
            SELECT DISTINCT source,
                   unnest(regexp_extract_all(lower(text), '\\w+')) AS t
            FROM documents
        ),
        vocab AS (SELECT count(DISTINCT t)::DOUBLE AS v FROM ts),
        p0 AS MATERIALIZED (
            SELECT CAST(NULL AS VARCHAR) AS source WHERE false
        ),
        c0 AS MATERIALIZED (
            SELECT CAST(NULL AS VARCHAR) AS t WHERE false
        )"""]
    for t in range(1, steps + 1):
        parts.append(f""",
        g{t} AS MATERIALIZED (
            SELECT ts.source,
                   count(DISTINCT CASE WHEN ts.t NOT IN
                         (SELECT t FROM c{t - 1}) THEN ts.t END)
                       ::BIGINT AS gain
            FROM ts
            WHERE ts.source NOT IN (SELECT source FROM p{t - 1})
            GROUP BY ts.source
        ),
        w{t} AS MATERIALIZED (
            SELECT source, gain FROM g{t}
            ORDER BY gain DESC, source LIMIT 1
        ),
        p{t} AS MATERIALIZED (
            SELECT source FROM p{t - 1}
            UNION ALL SELECT source FROM w{t}
        ),
        c{t} AS MATERIALIZED (
            SELECT t FROM c{t - 1}
            UNION SELECT ts.t FROM ts
            WHERE ts.source = (SELECT source FROM w{t})
        )""")
    sel = " UNION ALL ".join(f"""
        SELECT {t}::BIGINT AS step, (SELECT source FROM w{t}) AS source,
               (SELECT gain FROM w{t}) AS new_tokens,
               (SELECT count(*) FROM c{t})::BIGINT AS cum_tokens,
               round((SELECT count(*) FROM c{t})
                     / (SELECT v FROM vocab), 6) AS coverage"""
                           for t in range(1, steps + 1))
    parts.append(f"""
        SELECT * FROM ({sel}) WHERE source IS NOT NULL ORDER BY step""")
    return "".join(parts)


KANON_K = 5
KANON_CHAR_BUCKET = 100


def k_anonymity_audit(sf_dir: str, k: int = KANON_K,
                      num_buckets: int = 16) -> pd.DataFrame:
    """K-ANONYMITY AUDIT (Sweeney 2002) over the quasi-identifier tuple
    (lang, source, n_chars bucketed to 100s): the privacy screen a
    dataset release runs — any equivalence class smaller than ``k``
    re-identifies its members by attribute combination alone.  Output
    is the class-size histogram plus the headline numbers: risky
    classes, risky rows, the smallest class, and the fraction of rows
    at risk.  All integers but the final fraction.

    Scale shape: one quasi-identifier count reduce, then a class-SIZE
    histogram reduce (size-of-sizes — both bounded by distinct-tuple
    count); the headline folds on the tiny histogram."""
    from .common import sql_round

    def prep(b: pd.DataFrame) -> pd.DataFrame:
        return b.assign(
            cb=(b["n_chars"].to_numpy(np.int64)
                // KANON_CHAR_BUCKET).astype(np.int64))

    cls = partial_groupby(
        load(sf_dir, "documents", ["lang", "source", "n_chars"]),
        ["lang", "source", "cb"], {"n": ("cb", "count")}, prep=prep,
        many_groups=True, num_buckets=num_buckets)

    hist = partial_groupby(cls, ["n"], {"n_classes": ("n", "count")},
                           many_groups=True,
                           num_buckets=4).to_pandas().sort_values("n")
    size = hist["n"].to_numpy(np.int64)
    ncls = hist["n_classes"].to_numpy(np.int64)
    total_rows = int((size * ncls).sum())
    risky_cls = int(ncls[size < k].sum())
    risky_rows = int((size[size < k] * ncls[size < k]).sum())
    return pd.DataFrame({
        "class_size": size,
        "n_classes": ncls,
        "min_class_size": np.full(len(hist), np.int64(size.min())),
        "risky_classes": np.full(len(hist), np.int64(risky_cls)),
        "risky_rows": np.full(len(hist), np.int64(risky_rows)),
        "risk_fraction": np.full(
            len(hist),
            float(sql_round(risky_rows / total_rows, 6)))})


def k_anonymity_audit_sql(k: int = KANON_K) -> str:
    return f"""
        WITH cls AS (
            SELECT lang, source, n_chars // {KANON_CHAR_BUCKET} AS cb,
                   count(*)::BIGINT AS n
            FROM documents GROUP BY 1, 2, 3
        ),
        hist AS (
            SELECT n AS class_size, count(*)::BIGINT AS n_classes
            FROM cls GROUP BY n
        ),
        s AS (
            SELECT min(class_size)::BIGINT AS mn,
                   sum(CASE WHEN class_size < {k} THEN n_classes
                       ELSE 0 END)::BIGINT AS rc,
                   sum(CASE WHEN class_size < {k}
                       THEN class_size * n_classes ELSE 0 END)::BIGINT
                       AS rr,
                   sum(class_size * n_classes)::BIGINT AS tot
            FROM hist
        )
        SELECT class_size, n_classes,
               (SELECT mn FROM s) AS min_class_size,
               (SELECT rc FROM s) AS risky_classes,
               (SELECT rr FROM s) AS risky_rows,
               round((SELECT rr FROM s)
                     / (SELECT tot FROM s)::DOUBLE, 6) AS risk_fraction
        FROM hist
    """


LDIV_L = 3


def l_diversity_audit(sf_dir: str, l: int = LDIV_L,
                      num_buckets: int = 16) -> pd.DataFrame:
    """L-DIVERSITY AUDIT (Machanavajjhala et al. 2006) — the k-anonymity
    follow-up: a quasi-identifier class is unsafe even when LARGE if its
    SENSITIVE attribute (here lang) is homogeneous.  Per (source,
    n_chars-bucket) class: size and distinct-lang count; classes with
    diversity < ``l`` are flagged.  Output is the (size, diversity)
    histogram with the risky totals replicated — all integers but the
    final fraction.

    Scale shape: one (QI, lang) distinct reduce, one QI-class fold,
    both bounded by distinct-tuple counts."""
    from .common import sql_round

    def prep(b: pd.DataFrame) -> pd.DataFrame:
        return b.assign(
            cb=(b["n_chars"].to_numpy(np.int64)
                // KANON_CHAR_BUCKET).astype(np.int64))

    rows = partial_groupby(
        load(sf_dir, "documents", ["lang", "source", "n_chars"]),
        ["source", "cb", "lang"], {"n": ("cb", "count")}, prep=prep,
        many_groups=True, num_buckets=num_buckets)

    cls = partial_groupby(
        rows, ["source", "cb"],
        {"size_": ("n", "sum"), "div": ("n", "count")},
        many_groups=True, num_buckets=num_buckets).to_pandas()
    size = cls["size_"].to_numpy(np.int64)
    div = cls["div"].to_numpy(np.int64)
    risky = div < l
    hist = (pd.DataFrame({"class_size": size, "diversity": div})
            .groupby(["class_size", "diversity"]).size()
            .rename("n_classes").reset_index())
    total_rows = int(size.sum())
    return pd.DataFrame({
        "class_size": hist["class_size"].astype(np.int64),
        "diversity": hist["diversity"].astype(np.int64),
        "n_classes": hist["n_classes"].astype(np.int64),
        "min_diversity": np.full(len(hist), np.int64(div.min())),
        "risky_classes": np.full(len(hist), np.int64(int(risky.sum()))),
        "risky_rows": np.full(len(hist),
                              np.int64(int(size[risky].sum()))),
        "risk_fraction": np.full(
            len(hist),
            float(sql_round(int(size[risky].sum()) / total_rows, 6)))})


def l_diversity_audit_sql(l: int = LDIV_L) -> str:
    return f"""
        WITH cls AS (
            SELECT source, n_chars // {KANON_CHAR_BUCKET} AS cb,
                   count(*)::BIGINT AS size_,
                   count(DISTINCT lang)::BIGINT AS div
            FROM documents GROUP BY 1, 2
        ),
        hist AS (
            SELECT size_ AS class_size, div AS diversity,
                   count(*)::BIGINT AS n_classes
            FROM cls GROUP BY 1, 2
        ),
        s AS (
            SELECT min(div)::BIGINT AS mnd,
                   sum(CASE WHEN div < {l} THEN 1 ELSE 0 END)::BIGINT
                       AS rc,
                   sum(CASE WHEN div < {l} THEN size_ ELSE 0 END)
                       ::BIGINT AS rr,
                   sum(size_)::BIGINT AS tot
            FROM cls
        )
        SELECT class_size, diversity, n_classes,
               (SELECT mnd FROM s) AS min_diversity,
               (SELECT rc FROM s) AS risky_classes,
               (SELECT rr FROM s) AS risky_rows,
               round((SELECT rr FROM s) / (SELECT tot FROM s)::DOUBLE, 6)
                   AS risk_fraction
        FROM hist
    """
