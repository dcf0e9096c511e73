"""Engine-wide constants and tunables.

Values that mirror a reference constant cite it; values mandated by the
north rule (BASELINE.json) say so.  Everything is overridable per-pipeline.
"""

from __future__ import annotations

from dataclasses import dataclass, field

# ---------------------------------------------------------------- corpus / URL space
N_HOSTS = 64                  # FIXTURES.md §2 — hosts are Zipf-skewed so a few are hot
ZIPF_S = 1.1                  # skew exponent for host assignment
ROOT_EVERY = 13               # row i is a "root" page iff i % 13 == 0 (FIXTURES.md §2)
FANOUT_ROOT = 6               # children per root page  (reference: Newegg cap 6,
                              #   src/scrapper/neweggRootHandler.go:20)
FANOUT_PRODUCT = 3            # children per product page (reference: Amazon cap 3,
                              #   src/scrapper/amazonRootHandler.go:34)
DEAD_LINK_PCT = 1             # ~1% of children point at missing image_ids (soft-fail path)
CORPUS_SEED = 42
N_SEEDS = 20                  # FIXTURES.md §3 — 20 root seed URLs

# ---------------------------------------------------------------- politeness / robots
CRAWL_DELAY_CHOICES_MS = (0, 50, 200, 1000)   # FIXTURES.md §4
ROBOTS_DISALLOW_PATH_PCT = 5                  # ~5% of paths disallowed
ROBOTS_BLOCKED_HOSTS = 2                      # 2 hosts disallow everything

# ---------------------------------------------------------------- seen set
SEEN_NUM_SHARDS_PER_CPU = 1   # shard actors = max(4, cpus); single-writer per shard
CUCKOO_FP_BITS = 16           # 16-bit fingerprints, 4-way buckets
CUCKOO_BUCKET_SIZE = 4
CUCKOO_MAX_KICKS = 500
BLOOM_BITS_PER_KEY = 10       # ~1% FP at 10 bits/key with 7 hashes
BLOOM_NUM_HASHES = 7

# ---------------------------------------------------------------- execution
DEFAULT_BATCH_SIZE = 4096          # frontier rows (narrow)
BINARY_BATCH_SIZE = 256            # rows with image bytes (wide) — SURVEY §7.4.4
FETCH_CONCURRENCY = 8              # fetch actor pool size (scaled to cluster)
MAX_ROUNDS_DEFAULT = 8
RETRY_MAX_ATTEMPTS = 5             # reference: exp backoff 2^i, ≤5 attempts
                                   #   (src/scrapper/amazonRootHandler.go:14-26)


@dataclass
class CrawlConfig:
    """All knobs for one crawl run; the oracle simulator consumes the same
    object so "same seed list + politeness budget" (BASELINE.json:6) is
    literally the same Python value."""

    corpus_size: int = 1000
    n_hosts: int = N_HOSTS
    n_seeds: int = N_SEEDS
    max_rounds: int = MAX_ROUNDS_DEFAULT
    max_urls: int | None = None          # stop after this many fetched URLs (budget)
    max_pages_per_host: int | None = None  # fairness cap: each host schedules at
                                         # most this many frontier rows over the
                                         # whole crawl (counted in seq order on
                                         # the post-dedup frontier, seeds
                                         # included; checkpointed, so resume
                                         # keeps counting).  None = unlimited.
    delay_scale: float = 0.0             # scales the crawl delay itself (waits
                                         # AND host clocks); robots decisions,
                                         # host grouping and slot ORDER are
                                         # delay-independent, so 0 runs the
                                         # full decision logic with zero waits
    fetch_latency_s: float = 0.0         # simulated per-URL network RTT inside the
                                         # fetch actor (crawling is latency-bound; this
                                         # is what makes throughput scale with
                                         # concurrency — BASELINE.md §3)
    exact_seen: bool = True              # exact-set audit alongside cuckoo (parity mode)
    use_bloom: bool = True               # bloom pre-filter in front of shard RPC
    num_seen_shards: int = 8
    num_politeness_shards: int = 8
    fetch_concurrency: int = FETCH_CONCURRENCY
    fetch_num_cpus: float = 1.0          # CPU reservation per fetch actor: a
                                         # fetch actor is I/O-bound (network
                                         # RTT dominates), so a real cluster
                                         # can reserve a fraction and run
                                         # more connections than cores.
                                         # (A persistent cross-round actor
                                         # pool was tried and REVERTED: proxy
                                         # tasks blocked in ray.get caused
                                         # worker-process churn that cost
                                         # more than per-round pool spin-up
                                         # — see round-2 history.)
    batch_size: int = DEFAULT_BATCH_SIZE
    binary_batch_size: int = BINARY_BATCH_SIZE
    hot_host_salt: int = 4               # split hot hosts into this many sub-keys
    hot_host_threshold: int = 256        # rows/round above which a host is "hot"
    fetch_parts_per_actor: int = 2       # fetch partitions per pool actor: 2 lets
                                         # dynamic assignment even out Zipf skew;
                                         # 1 halves per-round partition fixed costs
                                         # (RPC fan-out, shuffle tasks) when rounds
                                         # are small relative to the pool
    checkpoint_dir: str | None = None    # enables checkpoint/resume when set
    distributed: bool = False            # keep the frontier a Dataset end to end
                                         # — the 10^10-URL path, and the mode
                                         # entry()/the driver contract run.
                                         # False = driver-barrier mode (faster
                                         # below ~1M frontier rows; used by the
                                         # small parity fixtures).  Both paths
                                         # share every stage and are
                                         # equivalence-tested.
    seed: int = CORPUS_SEED
    extra: dict = field(default_factory=dict)
