"""Single-threaded reference simulator — the correctness oracle.

SURVEY.md §5: a ~200-line reimplementation of the reference's crawl
semantics (insertion-order FIFO pop src/queue/main.go:47-61, immediate ack,
typed dispatch src/scrapper/queueService.go:180-196, per-page child caps,
first-wins URL dedup src/client/main.go:178-192) serialized
deterministically as (round, priority, seq) — run on the same seed list +
synthetic corpus + politeness budget as the Ray pipeline.

Deliberately shares ONLY the fixture definitions (link graph, robots
bodies, URL space) with the engine; the crawl mechanics below — dedup,
ordering, seq assignment, budget, robots gating — are written independently
in plain Python so the pytest parity check is a genuine cross-check of the
distributed implementation.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from .config import CrawlConfig
from .functions.canonicalize import url_hash
from .sources.corpus import children_of, image_id_of_url, seed_image_ids, url_of, url_type_of
from .state.robots import RobotsRules, robots_body

PRIORITY_DECAY = 0.8
PRIORITY_FLOOR = 0.05


@dataclass
class OracleResult:
    seen: list[tuple[str, int, int]] = field(default_factory=list)   # (canon, hash, round)
    order: list[tuple[str, int, float, int]] = field(default_factory=list)  # (canon, round, prio, seq)
    records: list[tuple[str, str, int]] = field(default_factory=list)  # (canon, image_id, round) ok only
    urls_fetched: int = 0
    rounds: int = 0
    per_round: list[dict] = field(default_factory=list)


def simulate(cfg: CrawlConfig) -> OracleResult:
    res = OracleResult()
    seen_hashes: set[int] = set()
    used_per_host: dict[str, int] = {}  # per-host crawl-budget counter
    robots_cache: dict[str, RobotsRules] = {}

    def rules_for(host: str) -> RobotsRules:
        if host not in robots_cache:
            robots_cache[host] = RobotsRules(robots_body(host, cfg.seed, cfg.n_hosts))
        return robots_cache[host]

    # round-0 frontier: seed urls at priority 1.0
    frontier: list[tuple[str, float, int]] = []  # (canon, priority, depth)
    for sid in seed_image_ids(cfg.n_seeds):
        frontier.append((url_of(sid, cfg.n_hosts), 1.0, 0))

    for r in range(cfg.max_rounds):
        if not frontier:
            break
        if cfg.max_urls is not None and res.urls_fetched >= cfg.max_urls:
            break
        # within-round dedup, first in (priority desc, canon asc) wins,
        # then seq assignment over the sorted order
        frontier.sort(key=lambda x: (-x[1], x[0]))
        deduped: list[tuple[str, float, int]] = []
        in_round: set[str] = set()
        for canon, prio, depth in frontier:
            if canon not in in_round:
                in_round.add(canon)
                deduped.append((canon, prio, depth))

        # per-host crawl budget: identical rule to the engine's
        # _apply_host_quota_table — each host keeps its first
        # (cap - used) rows of the deduped frontier in seq order
        if cfg.max_pages_per_host is not None:
            kept: list[tuple[str, float, int]] = []
            for canon, prio, depth in deduped:
                host = canon.split("://")[1].split("/")[0]
                if used_per_host.get(host, 0) < cfg.max_pages_per_host:
                    used_per_host[host] = used_per_host.get(host, 0) + 1
                    kept.append((canon, prio, depth))
            deduped = kept

        next_frontier: list[tuple[str, float, int]] = []
        n_ok = n_denied = n_dead = n_dup = 0
        for seq, (canon, prio, depth) in enumerate(deduped):
            h = url_hash(canon)
            if h in seen_hashes:
                n_dup += 1
                continue
            seen_hashes.add(h)
            res.seen.append((canon, h, r))
            res.order.append((canon, r, round(prio, 6), seq))
            image_id = image_id_of_url(canon)
            host = canon.split("://")[1].split("/")[0]
            if not rules_for(host).allowed("/" + image_id):
                n_denied += 1
                continue  # denied: marked seen, not fetched, no children
            digits = image_id[3:]
            exists = digits.isdigit() and int(digits) < cfg.corpus_size
            if not exists:
                n_dead += 1
                continue  # dead link: marked seen, soft-fail
            n_ok += 1
            res.urls_fetched += 1
            res.records.append((canon, image_id, r))
            utype = url_type_of(image_id)
            child_prio = max(PRIORITY_FLOOR, round(prio * PRIORITY_DECAY, 6))
            for child_id in children_of(canon, utype, cfg.corpus_size):
                next_frontier.append((url_of(child_id, cfg.n_hosts), child_prio, depth + 1))

        res.per_round.append(
            {"round": r, "frontier_rows": len(deduped), "fetched_ok": n_ok,
             "robots_denied": n_denied, "dead": n_dead, "dup": n_dup,
             "urls_fetched": res.urls_fetched}
        )
        res.rounds += 1
        if cfg.max_urls is not None:
            remaining = max(0, cfg.max_urls - res.urls_fetched)
            # budget truncation happens on the *sequenced* next frontier,
            # mirroring the engine's barrier truncation
            nf = sorted(set(next_frontier), key=lambda x: (-x[1], x[0]))
            # engine truncates AFTER within-round dedup; emulate by keeping
            # first-appearance per canon then slicing
            seen_c: set[str] = set()
            trimmed = []
            for item in nf:
                if item[0] not in seen_c:
                    seen_c.add(item[0])
                    trimmed.append(item)
            frontier = trimmed[:remaining]
        else:
            frontier = next_frontier
    return res
