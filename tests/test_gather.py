"""Gather pipeline (reference §3.2) over crawl records."""

import shutil

import pytest

from weaver_ray.config import CrawlConfig
from weaver_ray.pipelines.crawl import crawl
from weaver_ray.pipelines.gather import (
    gather_merge,
    host_stats,
    near_dup_phash,
    round_stats,
)


@pytest.fixture(scope="module")
def crawl_out(small_corpus):
    out = "/tmp/test_gather_crawl"
    shutil.rmtree(out, ignore_errors=True)
    cfg = CrawlConfig(corpus_size=1000, max_rounds=3, num_seen_shards=2,
                      num_politeness_shards=2, fetch_concurrency=2)
    return crawl(cfg, out, corpus_path=small_corpus)


def test_gather_merge_first_wins(crawl_out):
    gm = gather_merge(crawl_out.records_dir).to_pandas()
    # exact seen-set => every URL crawled exactly once
    assert (gm["n_sightings"] == 1).all()
    assert len(gm) == crawl_out.urls_seen
    assert gm["url_canon"].is_unique


def test_host_stats_conservation(crawl_out):
    hs = host_stats(crawl_out.records_dir).to_pandas()
    assert hs["n_urls"].sum() == crawl_out.urls_seen
    assert hs["n_ok"].sum() == crawl_out.urls_fetched
    assert ((hs["n_ok"] + hs["n_denied"] + hs["n_dead"]) == hs["n_urls"]).all()
    # Zipf skew visible: the hottest host has a large share
    assert hs["n_urls"].max() > 3 * hs["n_urls"].median()


def test_round_stats_match_summaries(crawl_out):
    rs = round_stats(crawl_out.records_dir)
    per_round = {r["round"]: r["dedup_survivors"] for r in crawl_out.per_round}
    for rec in rs.to_dict("records"):
        assert per_round[rec["round"]] == rec["n_urls"]


def test_near_dup_phash_runs(crawl_out):
    out = near_dup_phash(crawl_out.records_dir, max_hamming=10)
    assert set(out.columns) == {"image_a", "image_b", "hamming"}
    if len(out):
        assert (out["hamming"] <= 10).all()


def test_curated_crawl_shards_legs_and_packing(crawl_out):
    """Every curation leg must bite, the host cap must hold exactly, and
    shard token sums must respect the budget (except possibly the last
    doc of each shard, which may straddle it)."""
    import re

    import pandas as pd

    from weaver_ray.pipelines.common import to_table
    from weaver_ray.pipelines.gather import curated_crawl_shards, read_records

    out = (to_table(curated_crawl_shards(crawl_out.records_dir))
           .to_pandas().sort_values("image_id").reset_index(drop=True))
    rec = to_table(read_records(crawl_out.records_dir,
                                ["image_id", "host", "w", "h", "caption",
                                 "fetch_status"])).to_pandas()
    ok = rec[rec["fetch_status"] == "ok"]
    ntok = ok["caption"].str.count(r"\w+")
    gate = ok[(ok["w"] >= 32) & (ok["h"] >= 32) & (ok["w"] <= 2 * ok["h"])
              & (ok["h"] <= 2 * ok["w"]) & (ntok >= 6)]
    assert 0 < len(gate) < len(ok)          # size+caption gates bite
    assert 0 < len(out) <= len(gate)        # host cap can only shrink
    per_host = gate.merge(out[["image_id"]], on="image_id")["host"].value_counts()
    assert per_host.max() <= 40             # the cap holds
    # packing: cumulative-before // budget, in image_id order
    out = out.sort_values("image_id")
    cum = out["n_tokens"].cumsum().shift(fill_value=0)
    assert (out["shard"].to_numpy() == (cum // 256).to_numpy()).all()


def test_pagerank_priority_order_semantics(crawl_out):
    """Within each round: prio_rank is a dense permutation, pr is
    non-increasing along it, and equal-pr runs preserve seq order (the
    Cho et al. ordering contract the SQL hash can't localize)."""
    import numpy as np

    from weaver_ray.pipelines.gather import pagerank_priority_order

    out = pagerank_priority_order(crawl_out.records_dir).to_pandas()
    assert len(out) == crawl_out.urls_seen
    for rnd, g in out.groupby("round"):
        g = g.sort_values("prio_rank")
        assert list(g["prio_rank"]) == list(range(len(g)))
        pr = g["pr"].to_numpy()
        assert (np.diff(pr) <= 0).all()          # importance-ordered
        for _, run in g.groupby("pr", sort=False):
            assert run["seq"].is_monotonic_increasing
    # the re-ranking must actually bite somewhere: at least one round
    # orders differently from the original seq order
    bites = any((g.sort_values("prio_rank")["seq"].to_numpy()
                 != np.sort(g["seq"].to_numpy())).any()
                for _, g in out.groupby("round"))
    assert bites


def _skew_records(tmp_path, counts):
    """Records dir with counts[h] rows for host h."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    d = tmp_path / "records" / "round=0"
    d.mkdir(parents=True)
    hosts, hashes = [], []
    k = 0
    for h, c in enumerate(counts):
        for _ in range(c):
            hosts.append(f"host-{h}.example")
            hashes.append(k)
            k += 1
    pq.write_table(pa.table({"host": pa.array(hosts),
                             "url_hash": pa.array(hashes, pa.uint64())}),
                   d / "part-00000.parquet")
    return str(tmp_path / "records")


def test_host_skew_stats_matches_mean_abs_difference(ray_session, tmp_path):
    """The rank-form Gini must equal the algebraically independent
    mean-absolute-difference form sum|ci-cj| / (2*H*T) on a skewed hand
    distribution, with exact top-share ratios."""
    import itertools

    from weaver_ray.pipelines.common import sql_round
    from weaver_ray.pipelines.gather import host_skew_stats

    counts = [1, 1, 2, 3, 5, 8, 13, 21, 34, 55, 88]
    out = host_skew_stats(_skew_records(tmp_path, counts))
    H, T = len(counts), sum(counts)
    mad = sum(abs(a - b) for a, b in itertools.product(counts, counts))
    assert out["n_hosts"].item() == H and out["n_urls"].item() == T
    assert out["gini"].item() == float(sql_round(mad / (2.0 * H * T), 6))
    assert out["top1_share"].item() == float(sql_round(88 / T, 6))
    k = (H + 9) // 10  # ceil(H/10) = 2 hottest hosts
    assert out["top_decile_share"].item() == float(
        sql_round((88 + 55) / T, 6))
    assert k == 2


def test_host_skew_stats_extremes(ray_session, tmp_path):
    """Uniform load -> Gini exactly 0; near-total concentration -> Gini
    approaches (H-1)/H and the hottest host owns ~everything."""
    from weaver_ray.pipelines.gather import host_skew_stats

    flat = host_skew_stats(_skew_records(tmp_path / "a", [7] * 10))
    assert flat["gini"].item() == 0.0
    assert flat["top1_share"].item() == 0.1
    hot = host_skew_stats(_skew_records(tmp_path / "b", [1] * 9 + [991]))
    assert hot["gini"].item() > 0.85
    assert hot["top1_share"].item() == 0.991
