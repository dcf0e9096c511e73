"""weaver_ray — a Ray-Data-native URL-frontier + fetch-scheduler engine.

A from-scratch rebuild of the capabilities of the reference system
(Bromistas/Weaver, a distributed Go web scraper; see /root/repo/SURVEY.md)
expressed as idiomatic Ray Data pipelines:

- the crawl frontier is a ``ray.data.Dataset`` per round, not a queue service
  (reference: in-memory HTTP queue, src/queue/main.go:16-29);
- the URL-seen set is a pool of sharded cuckoo-filter actors with a bloom
  pre-filter (reference analog: colly's per-collector visited set);
- per-host politeness + robots.txt live in a host-hash-sharded actor pool
  (absent in the reference; required by the north rule);
- storage is partitioned Parquet (Lance when available) of Arrow batches
  (reference: one JSON file per record, src/storage/main.go:142-170).

No code is copied from the reference; file:line citations in docstrings
point at the behavior being re-expressed.
"""

__version__ = "0.1.0"
