"""Scale-stress probe: re-verify the association-sensitive aggregate
queries against their DuckDB oracles on synthetic tables 10-20x the
sf0.1 bench scale (2M events / 6M lineitem rows, many more blocks).

This is the class that caught ``event_gap_stats`` in round 5: a float
sum whose ENGINE association (per-batch partials, pairwise numpy)
differs from the ORACLE's sequential association can drift past the
output's rounding grid as block counts grow — correct at every tested
scale, wrong one scale later.  The probe synthesizes deterministic
tables AT a larger scale than any testdata fixture and reruns the
value-sum battery subset exactly as ``tools/check_oracle.py`` would.

Usage: python tools/scale_stress.py [workdir=/tmp/sfbig]
Exit 0 iff every probed query is hash-exact vs its oracle.
"""

from __future__ import annotations

import os
import shutil
import subprocess
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

BASE = "/root/testdata/sf0.1"

# float-sum / windowed / ratio queries over events and lineitem — the
# association-sensitive surface (everything else is integer-grid or
# scale-invariant by construction)
EVENT_QUERIES = [
    "event_type_stats", "user_hourly_windows", "type_daily_ohlc",
    "type_daily_ewma", "incremental_event_stats",
    "range_join_click_windows", "sliding_window_stats",
    "session_windows", "event_gap_stats", "late_event_windows",
    "decayed_event_scores", "daily_type_anomalies",
]
LINEITEM_QUERIES = [
    "q1_pricing_summary", "q6_revenue", "lineitem_rollup",
    "price_quantity_corr", "winsorized_value_stats", "skyline_orders",
]
DOCUMENT_QUERIES = [
    "token_stats_by_lang", "quality_by_source", "doc_token_entropy",
    "heaps_law_fit", "vocab_zipf_slope", "unigram_logprob_docs",
    "bigram_logprob_docs", "tfidf_top_terms",
]
EMBEDDING_QUERIES = [
    "embedding_covariance", "embedding_sq8_stats", "embedding_isotropy",
    "embedding_top_eigvec", "jl_distortion_audit", "ann_bruteforce_topk",
    "matryoshka_recall",
]
ORDERS_QUERIES = [  # join-heavy revenue family (consistent synthetic FKs)
    "order_status_revenue", "mktsegment_revenue", "top_orders_per_customer",
    "customer_value_ntiles", "segment_order_trend", "customer_order_profile",
    "customer_rfm_segments", "duplicate_payment_audit", "purchase_survival_km",
]
PART_SUPP_QUERIES = [  # small-dim joins against the 10x fact side
    "local_supplier_volume", "basket_rules_brands", "bloom_semi_join_revenue",
]


def synth_events(path: str, n: int = 2_000_000) -> None:
    rng = np.random.default_rng(99)
    t0 = np.datetime64("2024-01-01T00:00:00", "us")
    off = np.sort(rng.integers(0, 30 * 86400 * 10**6, n))
    types = np.array(["click", "view", "purchase", "signup", "error"])
    t = pa.table({
        "event_id": pa.array(np.arange(n), pa.int64()),
        "ts": pa.array(t0 + off.astype("timedelta64[us]"),
                       pa.timestamp("us")),
        "user_id": pa.array(rng.integers(1, 15001, n), pa.int64()),
        "event_type": pa.array(types[rng.integers(0, 5, n)]),
        "value": pa.array(np.round(rng.uniform(0, 560, n), 2),
                          pa.float64()),
        "props": pa.array(['{"k": %d}' % k
                           for k in rng.integers(0, 100, n)]),
    })
    pq.write_table(t, path, row_group_size=100_000)


def synth_lineitem(path: str, n: int = 6_000_000) -> None:
    rng = np.random.default_rng(7)
    t0 = np.datetime64("1992-01-01T00:00:00", "us")
    rf = np.array(["A", "N", "R"])
    ls = np.array(["F", "O"])
    t = pa.table({
        "l_orderkey": pa.array(rng.integers(1, 1_500_001, n), pa.int64()),
        # FK-consistent with the sf0.1 part (0..19999) and supplier
        # (0..999) dimension tables, so the join-family queries see 10x
        # fact blocks against the real small sides
        "l_partkey": pa.array(rng.integers(0, 20_000, n), pa.int64()),
        "l_suppkey": pa.array(rng.integers(0, 1_000, n), pa.int64()),
        "l_linenumber": pa.array(
            rng.integers(1, 8, n).astype(np.int32), pa.int32()),
        "l_quantity": pa.array(
            rng.integers(1, 51, n).astype(np.float64), pa.float64()),
        "l_extendedprice": pa.array(
            np.round(rng.uniform(900, 105000, n), 2), pa.float64()),
        "l_discount": pa.array(
            np.round(rng.integers(0, 11, n) / 100.0, 2), pa.float64()),
        "l_tax": pa.array(
            np.round(rng.integers(0, 9, n) / 100.0, 2), pa.float64()),
        "l_returnflag": pa.array(rf[rng.integers(0, 3, n)]),
        "l_linestatus": pa.array(ls[rng.integers(0, 2, n)]),
        "l_shipdate": pa.array(
            t0 + rng.integers(0, 2500 * 86400, n)
            .astype("timedelta64[s]").astype("timedelta64[us]"),
            pa.timestamp("us")),
    })
    pq.write_table(t, path, row_group_size=200_000)


def synth_orders(path: str, n: int = 1_500_000) -> None:
    """o_orderkey 1..n matches synth_lineitem's key range; o_custkey
    matches the sf0.1 customer table (0..14999), so every join leg is
    exercised with 10x fact-side blocks.  This axis CAUGHT a real bug:
    order_status_revenue's float revenue sum drifted past its 2 dp grid
    at ~1e11 magnitudes — fixed by the exact integer-cents grids."""
    rng = np.random.default_rng(13)
    t0 = np.datetime64("1992-01-01T00:00:00", "us")
    stat = np.array(["F", "O", "P"])
    prio = np.array(["1-URGENT", "2-HIGH", "3-MEDIUM",
                     "4-NOT SPECIFIED", "5-LOW"])
    t = pa.table({
        "o_orderkey": pa.array(np.arange(1, n + 1), pa.int64()),
        "o_custkey": pa.array(rng.integers(0, 15000, n), pa.int64()),
        "o_orderstatus": pa.array(stat[rng.integers(0, 3, n)]),
        "o_totalprice": pa.array(
            np.round(rng.uniform(900, 450000, n), 2), pa.float64()),
        "o_orderdate": pa.array(
            t0 + rng.integers(0, 2500 * 86400, n)
            .astype("timedelta64[s]").astype("timedelta64[us]"),
            pa.timestamp("us")),
        "o_orderpriority": pa.array(prio[rng.integers(0, 5, n)]),
    })
    pq.write_table(t, path, row_group_size=150_000)


def synth_documents(path: str, n: int = 50_000) -> None:
    rng = np.random.default_rng(21)
    vocab = np.array(
        "batch part spark line column order small sort fast value scan "
        "hash slow group agg filter query big key window row table "
        "stream merge data vector a the lm gpu".split())
    w = 1.0 / np.arange(1, len(vocab) + 1) ** 0.8  # Zipf-ish token mix
    w /= w.sum()
    langs = np.array(["zh", "en", "fr", "es", "de"])
    srcs = np.array([f"src{i}" for i in range(20)])
    lens = rng.integers(10, 61, n)
    texts = [" ".join(rng.choice(vocab, size=L, p=w)) for L in lens]
    t = pa.table({
        "doc_id": pa.array(np.arange(n), pa.int64()),
        "text": pa.array(texts),
        "lang": pa.array(langs[rng.integers(0, 5, n)]),
        "source": pa.array(srcs[rng.integers(0, 20, n)]),
        "n_chars": pa.array(
            np.asarray([len(s) for s in texts], np.int64), pa.int64()),
    })
    pq.write_table(t, path, row_group_size=5_000)


def synth_embeddings(path: str, n: int = 20_000,
                     dim: int = 64, k: int = 10) -> None:
    rng = np.random.default_rng(5)
    centers = rng.normal(0, 1, (k, dim)).astype(np.float32)
    lab = rng.integers(0, k, n)
    vecs = (centers[lab]
            + rng.normal(0, 0.35, (n, dim)).astype(np.float32))
    t = pa.table({
        "vec_id": pa.array(np.arange(n), pa.int64()),
        "embedding": pa.array([v for v in vecs.astype(np.float32)],
                              pa.list_(pa.float32())),
        "label": pa.array(lab.astype(np.int32), pa.int32()),
    })
    pq.write_table(t, path, row_group_size=2_000)


def main() -> None:
    work = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sfbig"
    os.makedirs(work, exist_ok=True)
    for f in os.listdir(BASE):  # small side tables stay at sf0.1
        shutil.copy(os.path.join(BASE, f), os.path.join(work, f))
    synth_events(os.path.join(work, "events.parquet"))
    synth_lineitem(os.path.join(work, "lineitem.parquet"))
    synth_documents(os.path.join(work, "documents.parquet"))
    synth_embeddings(os.path.join(work, "embeddings.parquet"))
    synth_orders(os.path.join(work, "orders.parquet"))
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    r = subprocess.run(
        [sys.executable, os.path.join(repo, "tools", "check_oracle.py"),
         work, *EVENT_QUERIES, *LINEITEM_QUERIES, *DOCUMENT_QUERIES,
         *EMBEDDING_QUERIES, *ORDERS_QUERIES, *PART_SUPP_QUERIES],
        cwd=repo)
    sys.exit(r.returncode)


if __name__ == "__main__":
    main()
