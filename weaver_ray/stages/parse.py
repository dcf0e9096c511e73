"""Parse stage: typed dispatch, link extraction, frontier construction.

Reference analogs:
- type dispatch switch (src/scrapper/queueService.go:180-196) -> the handler
  registry + a single vectorized ``map_batches`` body;
- root/product link extractors with per-page caps 6/3
  (src/scrapper/neweggRootHandler.go:12-49, amazonRootHandler.go:28-73) ->
  ``extract_children``: per fetched page, the deterministic link graph
  yields <=k child URLs (flatMap — exploded child rows);
- CLI seeding (src/client/main.go:90-110) -> ``seed_frontier``.

The round barrier (``next_frontier``) dedupes within-round duplicate
children deterministically (first in (priority desc, url_canon) order wins)
and assigns the per-round ``seq`` — the deterministic serialization of the
reference's per-queue FIFO (src/queue/main.go:47-61; SURVEY.md §7.4.3).
At this test scale the barrier runs driver-side on one Arrow table; at
10^10-URL scale the same three steps are ``groupby(url_canon).map_groups``
+ ``sort`` + per-block offset seq over the frontier Dataset (frontier rows
are narrow; the wide image bytes never cross this barrier).
"""

from __future__ import annotations

from collections.abc import Callable

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from .. import config
from ..functions.canonicalize import host_batch, url_hash_batch
from ..schema import FRONTIER_SCHEMA
from ..sources.corpus import (children_of, seed_image_ids, url_of,
                              url_of_batch, url_type_of)

PRIORITY_DECAY = 0.8
PRIORITY_FLOOR = 0.05

# ---------------------------------------------------------------- handler registry

_HANDLERS: dict[str, Callable[[str, int], list[str]]] = {}


def register_handler(url_type: str, extract: Callable[[str, int], list[str]]) -> None:
    """User-extension surface (reference: add a URLType enum value + handler
    pair, SURVEY.md §2.10): extract(canon_url, corpus_size) -> child image_ids."""
    _HANDLERS[url_type] = extract


register_handler("root", lambda canon, n: children_of(canon, "root", n))
register_handler("product", lambda canon, n: children_of(canon, "product", n))


def extract_children(batch: pa.Table, corpus_size: int, n_hosts: int = config.N_HOSTS) -> pa.Table:
    """flatMap fetched pages -> child frontier candidates (unsequenced).

    Input needs only narrow columns (url_canon, url_type, fetch_status,
    round, depth, priority) — the caller must NOT route image bytes through
    this stage."""
    ok = pc.equal(batch.column("fetch_status"), "ok")
    keep = batch.filter(ok)
    canon = keep.column("url_canon").to_pylist()
    utypes = keep.column("url_type").to_pylist()
    parent_hashes = keep.column("url_hash").to_numpy(zero_copy_only=False)
    depth_arr = keep.column("depth").to_numpy(zero_copy_only=False)
    prio_arr = keep.column("priority").to_numpy(zero_copy_only=False)
    round_arr = keep.column("round").to_numpy(zero_copy_only=False)
    # per-parent handler calls stay (they are the extension surface and the
    # sha1 link-graph semantics); everything derived from the parent row is
    # vectorized via an np.repeat index instead of per-child Python appends
    child_ids: list[str] = []
    counts = np.zeros(len(canon), np.int64)
    for i, c in enumerate(canon):
        handler = _HANDLERS.get(utypes[i])
        if handler is None:  # unknown type -> log+drop (reference behavior)
            continue
        ids = handler(c, corpus_size)
        counts[i] = len(ids)
        child_ids.extend(ids)
    idx = np.repeat(np.arange(len(canon), dtype=np.int64), counts)
    urls = url_of_batch(child_ids, n_hosts)
    # priority decay must equal the scalar path bit-for-bit: Python round()
    # (correctly-rounded half-even) per UNIQUE parent priority — priorities
    # take a handful of distinct decay^r values, so this is O(uniq)
    uvals = np.unique(prio_arr) if len(prio_arr) else prio_arr
    umap = np.array(
        [max(PRIORITY_FLOOR, round(float(v) * PRIORITY_DECAY, 6)) for v in uvals],
        np.float32,
    )
    prios = umap[np.searchsorted(uvals, prio_arr[idx])] if len(idx) else \
        np.zeros(0, np.float32)
    canon_children = urls  # url_of emits canonical form already
    return pa.table(
        {
            "url": pa.array(urls, pa.string()),
            "url_canon": pa.array(canon_children, pa.string()),
            "url_hash": pa.array(url_hash_batch(canon_children), pa.uint64()),
            "host": pa.array(host_batch(canon_children), pa.string()),
            "depth": pa.array((depth_arr[idx] + 1).astype(np.int32), pa.int32()),
            "url_type": pa.array(
                [url_type_of(i) for i in child_ids], pa.string()
            ),
            "priority": pa.array(prios, pa.float32()),
            "seq": pa.array(np.full(len(urls), -1, np.int64), pa.int64()),
            "round": pa.array((round_arr[idx] + 1).astype(np.int32), pa.int32()),
            "parent_hash": pa.array(parent_hashes[idx].astype(np.uint64), pa.uint64()),
        },
        schema=FRONTIER_SCHEMA,
    )


# ---------------------------------------------------------------- frontier building

def seed_frontier(n_seeds: int = config.N_SEEDS, n_hosts: int = config.N_HOSTS) -> pa.Table:
    """Round-0 frontier from the fixed seed list (FIXTURES.md §3)."""
    urls = [url_of(sid, n_hosts) for sid in seed_image_ids(n_seeds)]
    t = pa.table(
        {
            "url": pa.array(urls, pa.string()),
            "url_canon": pa.array(urls, pa.string()),
            "url_hash": pa.array(url_hash_batch(urls), pa.uint64()),
            "host": pa.array(host_batch(urls), pa.string()),
            "depth": pa.array(np.zeros(len(urls), np.int32), pa.int32()),
            "url_type": pa.array(["root"] * len(urls), pa.string()),
            "priority": pa.array(np.ones(len(urls), np.float32), pa.float32()),
            "seq": pa.array(np.full(len(urls), -1, np.int64), pa.int64()),
            "round": pa.array(np.zeros(len(urls), np.int32), pa.int32()),
            "parent_hash": pa.array(np.zeros(len(urls), np.uint64), pa.uint64()),
        },
        schema=FRONTIER_SCHEMA,
    )
    return assign_seq(dedup_within_round(t))


def dedup_within_round(frontier: pa.Table) -> pa.Table:
    """Deterministic within-round dedup, fully vectorized: keep the
    max-priority row per url_canon; ties resolve to min parent_hash — so the
    surviving (priority, parent) of a URL discovered twice in one round
    never depends on task race order.  This is the SAME rule as the
    distributed barrier's block-local dedup (crawl._dedup_within_round_block)
    — one semantics, two execution shapes."""
    if frontier.num_rows == 0:
        return frontier
    prio = frontier.column("priority").to_numpy(zero_copy_only=False)
    parent = frontier.column("parent_hash").to_numpy(zero_copy_only=False)
    canon = np.asarray(frontier.column("url_canon").to_pylist(), dtype=object)
    # sorted by (canon asc, priority desc, parent_hash asc): the first row of
    # each canon run is the deterministic winner
    order = np.lexsort((parent, -prio, canon))
    sc = canon[order]
    first = np.concatenate(([True], sc[1:] != sc[:-1]))
    return frontier.take(pa.array(np.sort(order[first])))


def assign_seq(frontier: pa.Table) -> pa.Table:
    """Total order within the round: sort (priority desc, url_canon asc),
    seq = 0..n-1.  This is the engine's crawl-order contract."""
    prio = frontier.column("priority").to_numpy(zero_copy_only=False)
    canon = np.asarray(frontier.column("url_canon").to_pylist(), dtype=object)
    order = np.lexsort((canon, -prio))
    sorted_t = frontier.take(pa.array(order))
    return sorted_t.set_column(
        sorted_t.schema.get_field_index("seq"),
        "seq",
        pa.array(np.arange(sorted_t.num_rows, dtype=np.int64), pa.int64()),
    )


def partition_for_fetch(frontier: pa.Table, num_partitions: int,
                        hot_threshold: int = 0, salt: int = 0) -> list[pa.Table]:
    """Split the round's frontier into balanced, host-coherent fetch
    partitions (north rule: explicit skew mitigation by salting hot hosts).

    Zipf-skewed hosts make plain host-hash partitions pathologically uneven
    — in a latency-bound fetch the round lasts as long as its FATTEST
    partition, so balance is wall-clock.  Deterministic scheme:
    1. group rows by host (cold hosts stay co-located -> politeness-shard
       RPCs stay batched);
    2. split any host group larger than ``cap = ceil(n/P)`` into cap-sized
       chunks (this is the hot-host salt — a hot host fans across
       partitions while its crawl-delay tokens remain host-global in the
       politeness actors);
    3. LPT bin-pack chunks (largest first, ties by host then chunk index)
       onto the least-loaded partition.
    ``hot_threshold``/``salt`` are retained for API compatibility; the cap
    subsumes them."""
    n = frontier.num_rows
    if n == 0:
        return []
    hosts = np.asarray(frontier.column("host").to_pylist(), dtype=object)
    cap = -(-n // num_partitions)  # ceil
    order = np.argsort(hosts, kind="stable")
    sorted_hosts = hosts[order]
    bounds = np.flatnonzero(
        np.concatenate(([True], sorted_hosts[1:] != sorted_hosts[:-1]))
    ).tolist() + [n]
    chunks: list[np.ndarray] = []
    for gi in range(len(bounds) - 1):
        grp = order[bounds[gi]:bounds[gi + 1]]
        for s in range(0, len(grp), cap):
            chunks.append(grp[s:s + cap])
    # LPT: largest chunk first onto the least-loaded partition (ties: lowest id)
    chunks.sort(key=lambda c: (-len(c), int(c[0])))
    loads = [0] * num_partitions
    members: list[list[np.ndarray]] = [[] for _ in range(num_partitions)]
    for c in chunks:
        p = min(range(num_partitions), key=lambda i: (loads[i], i))
        loads[p] += len(c)
        members[p].append(c)
    return [
        frontier.take(pa.array(np.sort(np.concatenate(m))))
        for m in members if m
    ]
