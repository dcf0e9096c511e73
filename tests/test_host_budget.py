"""Per-host crawl budget (fairness cap, CrawlConfig.max_pages_per_host):
engine vs the independent oracle simulator under the same cap, barrier ==
distributed equivalence, the cap actually binding, and resume continuing
the cumulative count."""

import shutil

import numpy as np
import pandas as pd
import pytest

from weaver_ray.config import CrawlConfig
from weaver_ray.oracle import simulate
from weaver_ray.pipelines.crawl import crawl

CAP = 5


def _cfg(**kw) -> CrawlConfig:
    base = dict(corpus_size=1000, max_rounds=3, num_seen_shards=2,
                num_politeness_shards=2, fetch_concurrency=2,
                max_pages_per_host=CAP)
    base.update(kw)
    return CrawlConfig(**base)


def _order_df(res) -> pd.DataFrame:
    return (res.order_table.to_pandas()
            .sort_values(["round", "seq"]).reset_index(drop=True))


@pytest.fixture(scope="module")
def budget_runs(ray_session):
    out_b = "/tmp/test_budget_barrier"
    out_d = "/tmp/test_budget_dist"
    shutil.rmtree(out_b, ignore_errors=True)
    shutil.rmtree(out_d, ignore_errors=True)
    barrier = crawl(_cfg(), out_b)
    dist = crawl(_cfg(distributed=True), out_d)
    oracle = simulate(_cfg())
    return barrier, dist, oracle


def test_budget_engine_matches_oracle(budget_runs):
    barrier, dist, oracle = budget_runs
    eng_seen = set(barrier.seen_table.column("url_canon").to_pylist())
    ora_seen = {c for c, _, _ in oracle.seen}
    assert eng_seen == ora_seen
    assert barrier.urls_fetched == oracle.urls_fetched
    eng_order = [tuple(r) for r in _order_df(barrier)[
        ["url_canon", "round", "seq"]].itertuples(index=False)]
    ora_order = sorted(((c, r, s) for c, r, p, s in oracle.order),
                       key=lambda x: (x[1], x[2]))
    assert eng_order == ora_order


def test_budget_modes_equivalent(budget_runs):
    barrier, dist, _ = budget_runs
    assert (set(barrier.seen_table.column("url_canon").to_pylist())
            == set(dist.seen_table.column("url_canon").to_pylist()))
    assert barrier.urls_fetched == dist.urls_fetched
    pd.testing.assert_frame_equal(_order_df(barrier), _order_df(dist))


def test_budget_binds_and_holds(budget_runs):
    barrier, _, _ = budget_runs
    hosts = [c.split("://")[1].split("/")[0]
             for c in barrier.seen_table.column("url_canon").to_pylist()]
    counts = pd.Series(hosts).value_counts()
    assert counts.max() <= CAP          # the cap holds on scheduled URLs
    assert (counts == CAP).any()        # ... and actually binds somewhere
    # an uncapped run schedules strictly more
    out = "/tmp/test_budget_off"
    shutil.rmtree(out, ignore_errors=True)
    free = crawl(_cfg(max_pages_per_host=None), out)
    assert free.urls_seen > barrier.urls_seen


def test_budget_resume_continues_count(ray_session):
    """Crash-resume must keep counting against the SAME per-host budget:
    a resumed run's final state equals the uninterrupted run's."""
    import json
    import os
    from pathlib import Path

    out_a = "/tmp/test_budget_resume"
    shutil.rmtree(out_a, ignore_errors=True)
    full = crawl(_cfg(distributed=False), out_a)
    # wipe the LAST commit + its records => resume rewrites round 2
    ck = Path(out_a) / "ckpt"
    last = max(int(p.stem.split("_")[1]) for p in ck.glob("COMMIT_*.json"))
    os.unlink(ck / f"COMMIT_{last}.json")
    rec = Path(out_a) / "records" / f"round={last}"
    if rec.exists():
        shutil.rmtree(rec)
    resumed = crawl(_cfg(distributed=False), out_a, resume=True)
    assert resumed.urls_fetched == full.urls_fetched
    assert (set(resumed.seen_table.column("url_canon").to_pylist())
            == set(full.seen_table.column("url_canon").to_pylist()))
