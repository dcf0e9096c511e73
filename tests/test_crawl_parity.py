"""Crawl end-to-end: Ray pipeline vs the single-threaded oracle simulator.

The parity contract (BASELINE.md §1): identical final URL-seen set and
identical crawl order on the deterministic (round, priority, seq)
serialization, under the same seed list + politeness budget; plus the
per-row invariant (decoded pixels exact for PNG, caption equality).
"""

import numpy as np
import pyarrow.parquet as pq
import pytest

from weaver_ray.config import CrawlConfig
from weaver_ray.oracle import simulate
from weaver_ray.pipelines.crawl import crawl
from weaver_ray.sources.corpus import gen_pixels


CFG = CrawlConfig(
    corpus_size=1000,
    max_rounds=4,
    num_seen_shards=4,
    num_politeness_shards=2,
    fetch_concurrency=2,
)


@pytest.fixture(scope="module")
def both(small_corpus):
    res = crawl(CFG, "/tmp/crawl_parity", corpus_path=small_corpus)
    ora = simulate(CFG)
    return res, ora


def test_seen_set_equality(both):
    res, ora = both
    engine = set(res.seen_table.column("url_canon").to_pylist())
    oracle = {c for c, _, _ in ora.seen}
    assert engine == oracle
    # and the hash sets agree too
    eh = set(res.seen_table.column("url_hash").to_pylist())
    oh = {h for _, h, _ in ora.seen}
    assert eh == oh


def test_crawl_order_parity(both):
    res, ora = both
    t = res.order_table
    engine = sorted(
        zip(
            t.column("round").to_pylist(),
            [round(p, 4) for p in t.column("priority").to_pylist()],
            t.column("seq").to_pylist(),
            t.column("url_canon").to_pylist(),
        )
    )
    oracle = sorted((r, round(p, 4), s, c) for c, r, p, s in ora.order)
    assert engine == oracle


def test_fetch_counts_match(both):
    res, ora = both
    assert res.urls_fetched == ora.urls_fetched
    assert res.rounds == ora.rounds
    for e, o in zip(res.per_round, ora.per_round):
        assert e["fetched_ok"] == o["fetched_ok"], (e, o)
        assert e["robots_denied"] == o["robots_denied"]
        assert e["dead"] == o["dead"]


def test_records_match_oracle_and_pixels(both):
    res, ora = both
    import glob

    files = sorted(glob.glob(res.records_dir + "/round=*/part-*.parquet"))
    assert files
    import pyarrow as pa

    # read per-file: the hive-style dir names would otherwise make the
    # dataset reader infer a duplicate "round" partition column
    t = pa.concat_tables([pq.read_table(f) for f in files])
    ok = t.filter(np.isin(np.array(t.column("fetch_status").to_pylist()), ["ok"]))
    engine_records = set(
        zip(ok.column("url_canon").to_pylist(), ok.column("image_id").to_pylist())
    )
    oracle_records = {(c, i) for c, i, _ in ora.records}
    assert engine_records == oracle_records
    # per-row invariant on a sample (BASELINE.json input_hint): decoded
    # pixels exact for PNG, PSNR >= 40 dB for lossy JPEG; caption equality
    from weaver_ray.functions.imaging import decode_image, psnr
    from weaver_ray.sources.corpus import gen_caption

    saw = set()
    for r in range(0, min(ok.num_rows, 50), 7):
        image_id = ok.column("image_id")[r].as_py()
        i = int(image_id[3:])
        fmt = ok.column("fmt")[r].as_py()
        saw.add(fmt)
        px = decode_image(ok.column("bytes")[r].as_py(), fmt)
        if fmt == "png":
            assert np.array_equal(px, gen_pixels(i))
        else:
            assert psnr(px, gen_pixels(i)) >= 40.0
        assert ok.column("caption")[r].as_py() == gen_caption(i)
    assert "png" in saw  # jpeg presence depends on which rows the sample hits


def test_budget_truncation(small_corpus):
    cfg = CrawlConfig(corpus_size=1000, max_rounds=6, max_urls=150,
                      num_seen_shards=2, num_politeness_shards=2,
                      fetch_concurrency=2)
    res = crawl(cfg, "/tmp/crawl_budget", corpus_path=small_corpus)
    ora = simulate(cfg)
    assert res.urls_fetched == ora.urls_fetched
    engine = set(res.seen_table.column("url_canon").to_pylist())
    assert engine == {c for c, _, _ in ora.seen}


def test_delay_scale_invariance(small_corpus):
    """Politeness sleeps change timing, never membership or order: the same
    crawl with enforced delays must produce identical seen set and
    (round, priority, seq) order."""
    import shutil

    cfg_fast = CrawlConfig(corpus_size=1000, max_rounds=3, num_seen_shards=2,
                           num_politeness_shards=2, fetch_concurrency=2,
                           delay_scale=0.0)
    cfg_slow = CrawlConfig(corpus_size=1000, max_rounds=3, num_seen_shards=2,
                           num_politeness_shards=2, fetch_concurrency=2,
                           delay_scale=0.05)
    shutil.rmtree("/tmp/crawl_inv_a", ignore_errors=True)
    shutil.rmtree("/tmp/crawl_inv_b", ignore_errors=True)
    a = crawl(cfg_fast, "/tmp/crawl_inv_a", corpus_path=small_corpus)
    b = crawl(cfg_slow, "/tmp/crawl_inv_b", corpus_path=small_corpus)
    assert set(a.seen_table.column("url_hash").to_pylist()) == set(
        b.seen_table.column("url_hash").to_pylist()
    )

    def key(t):
        return sorted(zip(t.column("round").to_pylist(), t.column("seq").to_pylist(),
                          t.column("url_canon").to_pylist()))

    assert key(a.order_table) == key(b.order_table)
    # (timing not asserted: at this scale the extra sleeps are sub-second
    # and drown in sandbox noise; the enforced-sleep path itself is covered
    # by test_politeness_enforces_min_interval with wall-clock gaps)
