"""Distributed-frontier round path: equivalence with the driver barrier and
with the oracle (the 10^10-URL scale path, CrawlConfig.distributed)."""

import shutil

import numpy as np
import pytest

from weaver_ray.config import CrawlConfig
from weaver_ray.oracle import simulate
from weaver_ray.pipelines.crawl import crawl


def _cfg(**kw):
    # 3 rounds: the distributed path pays several hash-shuffles per round,
    # which is seconds each on this 1-core sandbox regardless of data size
    base = dict(corpus_size=1000, max_rounds=3, num_seen_shards=2,
                num_politeness_shards=2, fetch_concurrency=2)
    base.update(kw)
    return CrawlConfig(**base)


@pytest.fixture(scope="module")
def runs(small_corpus):
    shutil.rmtree("/tmp/crawl_dist", ignore_errors=True)
    shutil.rmtree("/tmp/crawl_drv", ignore_errors=True)
    dist = crawl(_cfg(distributed=True), "/tmp/crawl_dist", corpus_path=small_corpus)
    drv = crawl(_cfg(distributed=False), "/tmp/crawl_drv", corpus_path=small_corpus)
    return dist, drv


def test_seen_sets_identical(runs):
    dist, drv = runs
    assert set(dist.seen_table.column("url_hash").to_pylist()) == set(
        drv.seen_table.column("url_hash").to_pylist()
    )
    assert dist.urls_fetched == drv.urls_fetched
    assert dist.urls_seen == drv.urls_seen


def test_order_identical(runs):
    dist, drv = runs

    def order_key(res):
        t = res.order_table
        return sorted(
            zip(t.column("round").to_pylist(),
                [round(p, 4) for p in t.column("priority").to_pylist()],
                t.column("seq").to_pylist(),
                t.column("url_canon").to_pylist())
        )

    assert order_key(dist) == order_key(drv)


def test_matches_oracle(runs):
    dist, _ = runs
    ora = simulate(_cfg(distributed=True))
    assert dist.urls_fetched == ora.urls_fetched
    engine = set(dist.seen_table.column("url_canon").to_pylist())
    assert engine == {c for c, _, _ in ora.seen}


def test_distributed_budget(small_corpus):
    shutil.rmtree("/tmp/crawl_dist_budget", ignore_errors=True)
    cfg = _cfg(distributed=True, max_urls=150, max_rounds=4)
    res = crawl(cfg, "/tmp/crawl_dist_budget", corpus_path=small_corpus)
    ora = simulate(cfg)
    assert res.urls_fetched == ora.urls_fetched


def test_distributed_resume(small_corpus):
    import os

    out = "/tmp/crawl_dist_resume"
    shutil.rmtree(out, ignore_errors=True)
    cfg = _cfg(distributed=True)
    full = crawl(cfg, out, corpus_path=small_corpus)
    os.remove(out + "/ckpt/COMMIT_2.json")
    shutil.rmtree(out + "/records/round=2")
    shutil.rmtree(out + "/ckpt/frontier_after_round_2", ignore_errors=True)
    resumed = crawl(cfg, out, corpus_path=small_corpus, resume=True)
    assert resumed.urls_fetched == full.urls_fetched
    assert set(resumed.seen_table.column("url_hash").to_pylist()) == set(
        full.seen_table.column("url_hash").to_pylist()
    )


def test_randomized_config_sweep_matches_oracle(small_corpus):
    """Seeded sweep over the crawl-config corner lattice, engine
    (alternating distributed/barrier mode) vs the independent simulator
    on seen set, full crawl order and fetched count.

    The block-10 seed-budget bug (distributed mode sliced the SEED
    frontier while the other two paths applied the budget only at round
    barriers) was exactly a config-corner divergence that every
    pinned-config test missed — n_seeds > max_urls was never exercised.
    This sweeps the joint lattice the pinned fixtures sample only
    pointwise: budget x host-quota x host count x shard counts x bloom
    on/off x tiny/large seed lists."""
    rng = np.random.default_rng(2026)
    for trial in range(5):
        kw = dict(
            corpus_size=1000,
            n_seeds=int(rng.integers(1, 41)),
            max_rounds=int(rng.integers(1, 4)),
            max_urls=[None, 25, 120][trial % 3],
            max_pages_per_host=[None, 3, 17][int(rng.integers(0, 3))],
            n_hosts=[8, 64][trial % 2],
            num_seen_shards=int(rng.integers(1, 4)),
            num_politeness_shards=int(rng.integers(1, 4)),
            fetch_concurrency=int(rng.integers(1, 4)),
            use_bloom=bool(rng.integers(0, 2)),
            distributed=trial % 2 == 0,
        )
        out = f"/tmp/crawl_sweep_{trial}"
        shutil.rmtree(out, ignore_errors=True)
        cfg = CrawlConfig(**kw)
        res = crawl(cfg, out, corpus_path=small_corpus)
        ora = simulate(cfg)
        assert res.urls_fetched == ora.urls_fetched, (trial, kw)
        assert set(res.seen_table.column("url_canon").to_pylist()) == {
            c for c, _, _ in ora.seen
        }, (trial, kw)
        t = res.order_table
        eng = sorted(zip(t.column("round").to_pylist(),
                         [round(p, 4) for p in t.column("priority").to_pylist()],
                         t.column("seq").to_pylist(),
                         t.column("url_canon").to_pylist()))
        orc = sorted((r, round(p, 4), s, c) for c, r, p, s in ora.order)
        assert eng == orc, (trial, kw)


def test_seed_budget_never_truncates_round_zero(small_corpus):
    """max_urls < n_seeds: the budget applies only at ROUND BARRIERS (a
    round may overshoot mid-round) in driver mode and the oracle — the
    distributed path must not slice the SEED frontier (review r4: it
    fetched max_urls while the other two fetched the whole seed round)."""
    shutil.rmtree("/tmp/crawl_dist_seedbudget", ignore_errors=True)
    shutil.rmtree("/tmp/crawl_drv_seedbudget", ignore_errors=True)
    kw = dict(n_seeds=30, max_urls=10, max_rounds=3)
    dist = crawl(_cfg(distributed=True, **kw), "/tmp/crawl_dist_seedbudget",
                 corpus_path=small_corpus)
    drv = crawl(_cfg(distributed=False, **kw), "/tmp/crawl_drv_seedbudget",
                corpus_path=small_corpus)
    ora = simulate(_cfg(distributed=True, **kw))
    assert dist.urls_fetched == drv.urls_fetched == ora.urls_fetched
    assert dist.urls_fetched > kw["max_urls"]  # the whole seed round ran
    assert set(dist.seen_table.column("url_hash").to_pylist()) == set(
        drv.seen_table.column("url_hash").to_pylist())
