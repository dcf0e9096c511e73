"""CLI: ``python -m weaver_ray <command>``.

Commands mirror the reference's client verbs (scrap/gather,
src/client/main.go:44-88) plus engine utilities.  This is the only module
besides bench.py and the test fixture that owns a Ray session.
"""

from __future__ import annotations

import argparse
import json
import sys


def _init(num_cpus: int) -> None:
    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=num_cpus, include_dashboard=False,
                 ignore_reinit_error=True, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="weaver_ray")
    p.add_argument("--num-cpus", type=int, default=8)
    sub = p.add_subparsers(dest="cmd", required=True)

    c = sub.add_parser("crawl", help="run the flagship frontier crawl (reference: 'scrap')")
    c.add_argument("--corpus-size", type=int, default=1000)
    c.add_argument("--rounds", type=int, default=4)
    c.add_argument("--max-urls", type=int, default=None)
    c.add_argument("--out", default="/tmp/weaver_crawl")
    c.add_argument("--resume", action="store_true")
    c.add_argument("--distributed", action="store_true")
    c.add_argument("--delay-scale", type=float, default=0.0)
    c.add_argument("--fetch-latency", type=float, default=0.0)
    c.add_argument("--concurrency", type=int, default=4)

    g = sub.add_parser("gather", help="first-wins merge + host stats (reference: 'gather')")
    g.add_argument("records_dir")

    gen = sub.add_parser("gen-corpus", help="generate the deterministic corpus")
    gen.add_argument("--size", type=int, required=True)
    gen.add_argument("--seed", type=int, default=42)

    q = sub.add_parser("query", help="run one queries() entry")
    q.add_argument("name")
    q.add_argument("--sf-dir", default="/root/testdata/sf0.001")

    args = p.parse_args(argv)

    if args.cmd == "gen-corpus":
        from weaver_ray.sources.corpus import generate_corpus

        print(generate_corpus(args.size, args.seed))
        return 0

    _init(args.num_cpus)
    import ray

    try:
        if args.cmd == "crawl":
            from weaver_ray.config import CrawlConfig
            from weaver_ray.pipelines.crawl import crawl

            cfg = CrawlConfig(
                corpus_size=args.corpus_size, max_rounds=args.rounds,
                max_urls=args.max_urls, fetch_concurrency=args.concurrency,
                distributed=args.distributed, delay_scale=args.delay_scale,
                fetch_latency_s=args.fetch_latency,
            )
            res = crawl(cfg, args.out, resume=args.resume)
            print(json.dumps({
                "rounds": res.rounds, "urls_fetched": res.urls_fetched,
                "urls_seen": res.urls_seen, "elapsed_s": round(res.elapsed_s, 2),
                "records_dir": res.records_dir, "per_round": res.per_round,
            }))
        elif args.cmd == "gather":
            from weaver_ray.pipelines.gather import gather_merge, host_stats

            merged = gather_merge(args.records_dir).to_pandas()
            hosts = host_stats(args.records_dir).to_pandas().sort_values(
                "n_urls", ascending=False)
            print(merged.head(20).to_string(index=False))
            print(hosts.head(10).to_string(index=False))
            print(json.dumps({"n_records": len(merged), "n_hosts": len(hosts)}))
        elif args.cmd == "query":
            sys.path.insert(0, "/root/repo")
            import __ray_entry__ as entrymod

            from weaver_ray.pipelines.common import to_table

            all_queries = entrymod.queries()
            if args.name not in all_queries:
                print(f"unknown query {args.name!r}; available:\n  "
                      + "\n  ".join(sorted(all_queries)), file=sys.stderr)
                return 2
            fn = all_queries[args.name]
            t = to_table(fn(args.sf_dir))
            print(t.to_pandas().head(25).to_string(index=False))
            print(json.dumps({"rows": t.num_rows}))
    finally:
        ray.shutdown()
    return 0


if __name__ == "__main__":
    sys.exit(main())
