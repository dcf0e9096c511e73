import shutil

import pytest

from weaver_ray.config import CrawlConfig
from weaver_ray.pipelines.crawl import crawl
from weaver_ray.sources.jsonstore import export_json_records, read_json_store


@pytest.fixture(scope="module")
def crawl_out(small_corpus):
    out = "/tmp/test_jsonstore_crawl"
    shutil.rmtree(out, ignore_errors=True)
    cfg = CrawlConfig(corpus_size=1000, max_rounds=2, num_seen_shards=2,
                      num_politeness_shards=2, fetch_concurrency=2)
    return crawl(cfg, out, corpus_path=small_corpus)


def test_json_export_roundtrip(crawl_out):
    out = "/tmp/test_jsonstore_export"
    shutil.rmtree(out, ignore_errors=True)
    n = export_json_records(crawl_out.records_dir, out)
    assert n == crawl_out.urls_seen
    back = read_json_store(out)
    assert back.count() == n
    assert {"url_canon", "image_id", "fetch_status"} <= set(back.schema().names)


def test_json_per_record_idempotent(crawl_out):
    out = "/tmp/test_jsonstore_perrec"
    shutil.rmtree(out, ignore_errors=True)
    n1 = export_json_records(crawl_out.records_dir, out, one_file_per_record=True)
    n2 = export_json_records(crawl_out.records_dir, out, one_file_per_record=True)
    assert n1 == n2 == crawl_out.urls_seen
    import glob
    import json

    files = glob.glob(out + "/*.json")
    assert len(files) == len({f for f in files})
    rec = json.load(open(files[0]))
    assert "url_canon" in rec


def test_records_jsonl_roundtrip_memo_and_staleness(ray_session, tmp_path):
    """The JSONL export memoizes on source identity and regenerates when
    a records file changes; the aggregate sees every exported column."""
    import os
    import shutil

    from weaver_ray.config import CrawlConfig
    from weaver_ray.pipelines.crawl import crawl
    from weaver_ray.sources.jsonstore import (export_records_jsonl,
                                              records_jsonl_roundtrip)

    cfg = CrawlConfig(corpus_size=200, max_rounds=2, num_seen_shards=2,
                      num_politeness_shards=1, fetch_concurrency=2)
    work = str(tmp_path / "crawl")
    res = crawl(cfg, work)
    root = str(tmp_path / "jsonroot")

    d1 = export_records_jsonl(res.records_dir, out_root=root)
    stamps = sorted(os.path.getmtime(os.path.join(d1, f))
                    for f in os.listdir(d1))
    assert export_records_jsonl(res.records_dir, out_root=root) == d1
    assert sorted(os.path.getmtime(os.path.join(d1, f))
                  for f in os.listdir(d1)) == stamps  # memo hit

    out = records_jsonl_roundtrip(res.records_dir)
    assert len(out) > 0
    assert set(out.columns) == {"round", "fetch_status", "n_records",
                                "sum_seq", "min_url", "max_url",
                                "min_host", "max_host", "sum_img_len"}
    assert out["n_records"].sum() == res.urls_fetched + sum(
        r["robots_denied"] + r["dead"] for r in res.per_round)

    # touching a source part regenerates into a FRESH export dir
    part = next(p for p in os.listdir(res.records_dir + "/round=0")
                if p.startswith("part-"))
    os.utime(os.path.join(res.records_dir, "round=0", part))
    d2 = export_records_jsonl(res.records_dir, out_root=root)
    assert d2 != d1
    shutil.rmtree(root)
