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
