"""The flagship pipeline: round-synchronous URL-frontier crawl.

This is the reference's queue <-> scrapper <-> storage cycle (SURVEY.md
§3.1) re-expressed as Ray Data rounds — the frontier is DATA, not a
service.  Per round r:

    frontier_r (Arrow table, deterministic (priority desc, url_canon) order,
                seq assigned, within-round deduped)
      -> partition_for_fetch: host-hash partitions, hot hosts salted
      -> map_batches(dedup): bloom pre-filter + sharded cuckoo/exact
         contains_or_insert (SeenShard actors) — survivors only
      -> map_batches(FetchStage, concurrency=K): robots check + crawl-delay
         slots (PolitenessShard actors), corpus take by image_id, records
         (with image bytes) sunk to parquet inside the stage
      -> map_batches(extract_children): narrow flatMap -> child candidates
      -> round barrier: within-round dedup + (priority, url_canon) sort +
         seq assignment -> frontier_{r+1}; checkpoint commit.

Ray Data has no loop operator, so rounds are driven from here; the wide
image-bytes path streams through the fetch stage and is sunk immediately —
only narrow frontier rows cross the barrier (SURVEY.md §7.4.1/7.4.4).
In distributed mode the barrier itself is a task-based sample-sort exchange
over object-store refs (see the block comment above _split_by_hash): the
same dedup->sort->seq semantics as the driver barrier, with only counts and
boundary keys ever touching the driver.
"""

from __future__ import annotations

import shutil
import time
from dataclasses import dataclass, field
from pathlib import Path

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import ray
import ray.data as rd

from ..config import CrawlConfig
from .common import unwrap_single_return
from ..sources.corpus import generate_corpus
from ..stages.fetch import FetchStage, split_union
from ..stages.parse import (
    assign_seq,
    dedup_within_round,
    partition_for_fetch,
    seed_frontier,
)
from ..state.checkpoint import CheckpointManager, LineageActor
from ..state.politeness import PolitenessPool
from ..state.seen import SeenSet

# ---------------------------------------------------------------- distributed round
# The default (driver-barrier) round materializes the NARROW frontier on the
# driver — fine up to millions of rows, not at the 10^10-URL target.  The
# distributed path below keeps the frontier a Dataset end to end: only
# per-host counts (<= n_hosts rows), per-round counters and the LPT chunk
# plan ever touch the driver.  Both paths share every stage and are
# equivalence-tested (tests/test_distributed_crawl.py).


def _lpt_plan(host_counts: dict[str, int], num_parts: int) -> tuple[dict, dict]:
    """LPT bin-packing of per-host chunks -> {(host, chunk_i): part},
    {host: n_chunks}.  Same balancing rule as partition_for_fetch, computed
    from the small per-host count aggregate instead of driver-held rows."""
    total = sum(host_counts.values())
    cap = max(1, -(-total // num_parts))
    chunks: list[tuple[int, str, int]] = []
    for host in sorted(host_counts):
        cnt = host_counts[host]
        n_chunks = -(-cnt // cap)
        # chunk sizes must match what the ROUTER produces: _route_block
        # assigns a row to chunk seq % n_chunks, an EVEN split of the host's
        # rows — not (cap, ..., cap, remainder).  Planning remainder-sized
        # chunks that actually arrive full-share let LPT overpack bins
        # (measured: 64 "balanced" parts spanning 0-696 rows, max fetch task
        # 43 s vs the 24 s balanced ideal — the round serializes behind it).
        base, rem = divmod(cnt, n_chunks)
        for ci in range(n_chunks):
            size = base + (1 if ci < rem else 0)
            chunks.append((size, host, ci))
    chunks.sort(key=lambda c: (-c[0], c[1], c[2]))
    loads = [0] * num_parts
    plan: dict[tuple[str, int], int] = {}
    spread: dict[str, int] = {}
    for size, host, ci in chunks:
        p = min(range(num_parts), key=lambda i: (loads[i], i))
        loads[p] += size
        plan[(host, ci)] = p
        spread[host] = max(spread.get(host, 0), ci + 1)
    return plan, spread


# --- exact fetch-routing exchange (identity partitioning) -------------------
# Ray's key repartition places rows at hash(key) % P: with P distinct LPT
# part ids over P partitions, ~1/e of output blocks end up EMPTY and others
# hold 2-3 merged parts (balls-in-bins).  A merged block becomes ONE fetch
# task that works its parts' latency budget serially — measured 73 s vs the
# ~47 s ideal on the bench round.  The two-stage exchange below routes part
# i to output block i exactly: split each frontier block by LPT part
# (zero-copy take+slice), then concat per part.  num_cpus=0 on both stages —
# they do microseconds of work and must never compete with the
# CPU-reserving fetch pool for slots (observed deadlock class, see below).


@ray.remote(num_cpus=0)
def _route_block(t: pa.Table, plan_spread, offsets: dict,
                 num_parts: int) -> list[pa.Table]:
    plan, spread = plan_spread
    if t.num_rows == 0:
        return [t] * num_parts
    hosts = np.asarray(t.column("host").to_pylist(), dtype=object)
    # exact within-host global rank = rows of this host in earlier blocks
    # (offsets, from the barrier's per-block host counts) + stable local
    # rank.  rank % n_chunks splits every host into EXACTLY the sizes the
    # LPT plan packed.  (The first version striped by global seq %
    # n_chunks, which is only even when a host's seqs are contiguous —
    # interleaved priority runs can alias mod n_chunks, in the worst case
    # landing a host's whole round on one chunk.)
    uniq, inv = np.unique(hosts, return_inverse=True)
    base = np.array([offsets.get(h, 0) for h in uniq], dtype=np.int64)
    ranks = _within_host_rank(inv) + base[inv]
    parts = np.fromiter(
        (plan[(h, int(rk) % spread[h])] for h, rk in zip(hosts, ranks)),
        dtype=np.int64, count=t.num_rows,
    )
    order = np.argsort(parts, kind="stable")
    bounds = np.searchsorted(parts[order], np.arange(num_parts + 1))
    tt = t.take(pa.array(order))
    return [tt.slice(bounds[p], bounds[p + 1] - bounds[p])
            for p in range(num_parts)]


@ray.remote(num_cpus=0)
def _concat_part(*tables: pa.Table) -> pa.Table:
    return pa.concat_tables(tables).combine_chunks()


# --- task-based distributed barrier (dedup + sample sort + seq) -------------
# The first distributed implementation expressed the round barrier as
# ``children.repartition(k, keys).map_batches(dedup).sort(...)``.  Correct,
# but the trace showed the actual shuffle/sort compute is MILLISECONDS while
# the machinery costs ~20-30 s/round at bench size: each round paid a
# hash-shuffle aggregator actor pool spin-up, a sort sample stage, and three
# extra streaming-executor startups (host-count pass, sort pipeline,
# materialize).  The barrier below is the same exchange topology hand-built
# from num_cpus=0 tasks on object refs — zero actor pools, zero extra
# Dataset executions:
#   split each child block by hash(url_canon) -> k co-location parts
#   -> per part: within-round dedup + local (priority desc, canon) sort +
#      strided key sample (tiny)
#   -> driver: pick k-1 range boundaries from the samples (metadata only)
#   -> split each part at the boundaries -> merge+sort per range
#   -> seq = global offset over ranges (counts to driver, tiny)
# Every row moves driver-free through the object store, exactly like the
# repartition+sort it replaces; boundary sampling only affects block
# PLACEMENT, never content or order (url_canon is unique after dedup, so the
# global key order is total and the ranges are disjoint).  At 10^10 scale k
# rises with data volume (blocks should stay ~100 MB) and the O(k^2) split
# objects stay metadata-sized.


@ray.remote(num_cpus=0)
def _split_by_hash(t: pa.Table, k: int) -> list[pa.Table]:
    """Route rows to k co-location parts by url_hash (a deterministic
    function of url_canon, so duplicate canons always meet)."""
    if t.num_columns == 0 or t.num_rows == 0:
        return [t] * k
    h = t.column("url_hash").to_numpy(zero_copy_only=False)
    parts = (h % np.uint64(k)).astype(np.int64)
    order = np.argsort(parts, kind="stable")
    bounds = np.searchsorted(parts[order], np.arange(k + 1))
    tt = t.take(pa.array(order))
    return [tt.slice(bounds[p], bounds[p + 1] - bounds[p]) for p in range(k)]


@ray.remote(num_cpus=0, num_returns=2)
def _dedup_sort_sample(n_samples: int, *tables: pa.Table):
    """Within-round dedup (same rule/impl as the driver barrier:
    parse.dedup_within_round) + local (priority desc, url_canon) sort +
    strided key sample for range-boundary selection."""
    from ..schema import FRONTIER_SCHEMA

    ts = [t for t in tables if t.num_columns > 0]
    if not ts:
        return FRONTIER_SCHEMA.empty_table(), {"count": 0, "samples": []}
    t = pa.concat_tables(ts).combine_chunks()
    t = dedup_within_round(t)
    n = t.num_rows
    if n == 0:
        return t, {"count": 0, "samples": []}
    prio = t.column("priority").to_numpy(zero_copy_only=False)
    canon = np.asarray(t.column("url_canon").to_pylist(), dtype=object)
    order = np.lexsort((canon, -prio))
    t = t.take(pa.array(order))
    stride = max(1, n // max(1, n_samples))
    idx = np.arange(0, n, stride)
    ps, cs = prio[order][idx], canon[order][idx]
    samples = [(float(p), str(c)) for p, c in zip(ps, cs)]
    return t, {"count": n, "samples": samples}


@ray.remote(num_cpus=0)
def _range_split(t: pa.Table, boundaries: list) -> list[pa.Table]:
    """Split a locally-sorted part at the global range boundaries.  A row
    equal to a boundary key goes RIGHT (bisect_left) in every part, so the
    ranges partition the key space exactly."""
    import bisect

    nb = len(boundaries)
    if t.num_rows == 0:
        return [t] * (nb + 1)
    prio = t.column("priority").to_numpy(zero_copy_only=False)
    canon = t.column("url_canon").to_pylist()
    keys = list(zip((-prio.astype(np.float64)).tolist(), canon))
    cuts = [0] + [bisect.bisect_left(keys, (-float(bp), bc))
                  for bp, bc in boundaries] + [t.num_rows]
    return [t.slice(cuts[i], cuts[i + 1] - cuts[i]) for i in range(nb + 1)]


@ray.remote(num_cpus=0, num_returns=2)
def _merge_range(*tables: pa.Table):
    """Concat one range's slices from every part and sort locally — ranges
    are globally ordered, so local order completes the global sort."""
    t = pa.concat_tables(tables).combine_chunks()
    if t.num_rows:
        prio = t.column("priority").to_numpy(zero_copy_only=False)
        canon = np.asarray(t.column("url_canon").to_pylist(), dtype=object)
        order = np.lexsort((canon, -prio))
        t = t.take(pa.array(order))
    return t, t.num_rows


@ray.remote(num_cpus=0, num_returns=2)
def _seq_and_host_counts(t: pa.Table, offset: int, limit: int | None):
    """seq = global offset (the crawl-order contract) + per-block host
    value_counts — the tiny aggregate the next round's LPT plan needs, so no
    separate host-count pass ever runs."""
    import pyarrow.compute as pc

    if limit is not None:
        t = t.slice(0, max(0, limit - offset))
    idx = t.schema.get_field_index("seq")
    t = t.set_column(idx, "seq",
                     pa.array(np.arange(offset, offset + t.num_rows, dtype=np.int64)))
    vc = pc.value_counts(t.column("host"))
    hc = dict(zip(vc.field("values").to_pylist(),
                  (int(c) for c in vc.field("counts").to_pylist())))
    return t, {"count": t.num_rows, "host_counts": hc}


def _within_host_rank(inv: np.ndarray) -> np.ndarray:
    """Ordinal of each row within its group (inv = group codes), preserving
    ROW order — vectorized (stable argsort + run-start subtraction)."""
    n = len(inv)
    order = np.argsort(inv, kind="stable")
    si = inv[order]
    first = np.concatenate(([True], si[1:] != si[:-1]))
    run_start = np.maximum.accumulate(np.where(first, np.arange(n), 0))
    rank = np.empty(n, dtype=np.int64)
    rank[order] = np.arange(n) - run_start
    return rank


def _apply_host_quota_table(t: pa.Table, used: dict[str, int],
                            cap: int) -> pa.Table:
    """PER-HOST CRAWL BUDGET (fairness cap) on a seq-ordered frontier
    table: keep each host's first (cap - used[host]) rows in seq order,
    fold the kept counts into ``used``, and re-assign seq densely (budget
    slices and resume truncation rely on dense seq).  The oracle
    simulator applies the identical rule to its deduped frontier."""
    if t.num_rows == 0:
        return t
    hosts = np.asarray(t.column("host").to_pylist(), dtype=object)
    uniq, inv = np.unique(hosts, return_inverse=True)
    base = np.array([used.get(h, 0) for h in uniq], dtype=np.int64)[inv]
    keep = (_within_host_rank(inv) + base) < cap
    out = t.filter(pa.array(keep))
    kept_h, kept_c = np.unique(hosts[keep], return_counts=True)
    for h, c in zip(kept_h, kept_c):
        used[h] = used.get(h, 0) + int(c)
    idx = out.schema.get_field_index("seq")
    return out.set_column(
        idx, "seq", pa.array(np.arange(out.num_rows, dtype=np.int64),
                             pa.int64()))


@ray.remote(num_cpus=0, num_returns=2)
def _quota_filter_block(t: pa.Table, allowed: dict):
    """One barrier block (rows already in global seq order): keep each
    host's first ``allowed[host]`` rows.  seq is re-stamped by a
    follow-up _seq_and_host_counts pass once the kept counts are known."""
    import pyarrow.compute as pc

    if t.num_rows == 0:
        return t, {"count": 0, "host_counts": {}}
    hosts = np.asarray(t.column("host").to_pylist(), dtype=object)
    uniq, inv = np.unique(hosts, return_inverse=True)
    allow = np.array([allowed.get(h, 0) for h in uniq], dtype=np.int64)[inv]
    keep = _within_host_rank(inv) < allow
    out = t.filter(pa.array(keep))
    vc = pc.value_counts(out.column("host"))
    hc = dict(zip(vc.field("values").to_pylist(),
                  (int(c) for c in vc.field("counts").to_pylist())))
    return out, {"count": out.num_rows, "host_counts": hc}


def _apply_host_quota_refs(refs: list, block_hcs: list[dict],
                           used: dict[str, int], cap: int):
    """Distributed-mode host quota over barrier output refs: blocks are
    range partitions in GLOBAL seq order and carry per-block host counts,
    so each block's per-host allowance is cap - used - (host rows in
    prior blocks) — O(hosts + blocks) driver metadata, the same budget as
    the LPT router's rank machinery.  Rows never touch the driver; seq is
    re-stamped densely by the standard _seq_and_host_counts pass."""
    pref: dict[str, int] = dict(used)
    filt_refs, meta_refs = [], []
    for ref, hc in zip(refs, block_hcs):
        allowed = {h: max(0, cap - pref.get(h, 0)) for h in hc}
        fref, mref = _quota_filter_block.remote(ref, allowed)
        filt_refs.append(fref)
        meta_refs.append(mref)
        for h, c in hc.items():
            pref[h] = pref.get(h, 0) + c
    metas = ray.get(meta_refs)
    counts = [m["count"] for m in metas]
    offsets = np.concatenate(([0], np.cumsum(counts)[:-1])) if counts else []
    out_refs, smeta_refs = [], []
    for fref, off, cnt in zip(filt_refs, offsets, counts):
        if cnt == 0:
            continue
        oref, mref = _seq_and_host_counts.remote(fref, int(off), None)
        out_refs.append(oref)
        smeta_refs.append(mref)
    smetas = ray.get(smeta_refs)
    host_counts: dict[str, int] = {}
    total = 0
    for m in smetas:
        total += m["count"]
        for h, c in m["host_counts"].items():
            host_counts[h] = host_counts.get(h, 0) + c
    for h, c in host_counts.items():
        used[h] = used.get(h, 0) + c
    if total == 0:
        return None, 0, {}, []
    return out_refs, total, host_counts, [m["host_counts"] for m in smetas]


def _barrier_parts(child_rows: int, floor: int,
                   rows_per_part: int = 500_000) -> int:
    """Co-location part count for the barrier: data-sized, not
    cluster-sized.  Narrow frontier rows are ~100 B, so 500k rows/part
    keeps barrier blocks ~50 MB; the floor (derived from fetch
    parallelism) keeps small rounds from serializing on one task.  At a
    10^10-URL round this is what grows — the O(k^2) split objects stay
    metadata-sized."""
    return max(floor, -(-child_rows // rows_per_part))


def _distributed_barrier(child_refs: list, k: int, remaining: int | None):
    """Round barrier over materialized child-block refs.  Returns
    (frontier_refs in global (priority desc, url_canon) order with seq
    assigned, row count, per-host counts).  Only counts, samples and
    boundary keys touch the driver."""
    if not child_refs:
        return None, 0, {}, []
    splits = [_split_by_hash.options(num_returns=k).remote(ref, k)
              for ref in child_refs]
    if k == 1:  # num_returns=1 yields ONE ref to the whole returned list
        splits = [[unwrap_single_return.remote(s)] for s in splits]
    part_refs, meta_refs = [], []
    for p in range(k):
        tref, mref = _dedup_sort_sample.remote(64, *[s[p] for s in splits])
        part_refs.append(tref)
        meta_refs.append(mref)
    metas = ray.get(meta_refs)
    if sum(m["count"] for m in metas) == 0:
        return None, 0, {}, []
    # boundaries: k-1 evenly-spaced keys from the pooled samples (sorted in
    # global key order).  Sample keys are unique (canon is globally unique
    # after the hash-split dedup), so boundaries are strictly increasing.
    samples = sorted((-p, c) for m in metas for p, c in m["samples"])
    nr = min(k, len(samples))
    step = len(samples) / nr if nr else 1
    boundaries = [(-samples[int(step * i)][0], samples[int(step * i)][1])
                  for i in range(1, nr)]
    rsplits = [_range_split.options(num_returns=len(boundaries) + 1)
               .remote(tref, boundaries) for tref in part_refs]
    if not boundaries:  # num_returns=1: one ref to the whole list
        rsplits = [[unwrap_single_return.remote(r)] for r in rsplits]
    range_refs, count_refs = [], []
    for i in range(len(boundaries) + 1):
        tref, cref = _merge_range.remote(*[rs[i] for rs in rsplits])
        range_refs.append(tref)
        count_refs.append(cref)
    counts = ray.get(count_refs)
    offsets = np.concatenate(([0], np.cumsum(counts)[:-1]))
    out_refs, smeta_refs = [], []
    for tref, off, cnt in zip(range_refs, offsets, counts):
        if cnt == 0 or (remaining is not None and off >= remaining):
            continue
        oref, mref = _seq_and_host_counts.remote(tref, int(off), remaining)
        out_refs.append(oref)
        smeta_refs.append(mref)
    smetas = ray.get(smeta_refs)
    host_counts: dict[str, int] = {}
    total = 0
    for m in smetas:
        total += m["count"]
        for h, c in m["host_counts"].items():
            host_counts[h] = host_counts.get(h, 0) + c
    if total == 0:
        return None, 0, {}, []
    # per-block host counts ride along so the fetch router can compute
    # exact within-host global ranks (blocks are range-partitions of the
    # canon order, so each host spans few blocks — O(n_hosts + k) driver
    # metadata, same class as host_counts itself)
    return out_refs, total, host_counts, [m["host_counts"] for m in smetas]


@ray.remote(num_cpus=0, num_returns=2)
def _read_frontier_part(path: str, remaining: int | None):
    """Resume entry: one checkpointed frontier parquet part -> an
    object-store block + its (count, host_counts) meta.  Budget truncation
    by seq (the checkpointed frontier is seq-assigned and dense), which
    equals the driver barrier's slice(0, remaining)."""
    import pyarrow.compute as pc
    import pyarrow.parquet as pq_

    t = pq_.read_table(path)
    if remaining is not None and t.num_rows:
        t = t.filter(pc.less(t.column("seq"), pa.scalar(remaining, pa.int64())))
    vc = pc.value_counts(t.column("host"))
    hc = dict(zip(vc.field("values").to_pylist(),
                  (int(c) for c in vc.field("counts").to_pylist())))
    return t, {"count": t.num_rows, "host_counts": hc}


def _frontier_refs_from_files(files: list[str], remaining: int | None):
    """Distributed-mode resume: frontier parts become refs via read tasks —
    the frontier never touches the driver, resume included.  Only tiny
    (count, host_counts) metas come back."""
    if not files:
        return None, 0, {}, []
    refs, meta_refs = [], []
    for f in files:
        tref, mref = _read_frontier_part.remote(f, remaining)
        refs.append(tref)
        meta_refs.append(mref)
    metas = ray.get(meta_refs)
    out_refs, block_hcs, host_counts, total = [], [], {}, 0
    for ref, m in zip(refs, metas):
        if m["count"] == 0:
            continue
        out_refs.append(ref)
        block_hcs.append(m["host_counts"])
        total += m["count"]
        for h, c in m["host_counts"].items():
            host_counts[h] = host_counts.get(h, 0) + c
    if total == 0:
        return None, 0, {}, []
    return out_refs, total, host_counts, block_hcs


def _driver_table_to_refs(frontier: pa.Table, remaining: int | None):
    """Seed/resume entry into the distributed loop: the (small, already
    seq-assigned) driver table becomes one object-store block + its host
    counts."""
    import pyarrow.compute as pc

    if remaining is not None:
        frontier = frontier.slice(0, remaining)
    if frontier.num_rows == 0:
        return None, 0, {}, []
    vc = pc.value_counts(frontier.column("host"))
    hc = dict(zip(vc.field("values").to_pylist(),
                  (int(c) for c in vc.field("counts").to_pylist())))
    return [ray.put(frontier)], frontier.num_rows, hc, [hc]


@dataclass
class CrawlResult:
    out_dir: str
    records_dir: str
    rounds: int
    urls_fetched: int
    urls_seen: int
    per_round: list[dict] = field(default_factory=list)
    seen_table: pa.Table | None = None     # (url_canon, url_hash, round)
    order_table: pa.Table | None = None    # (url_canon, round, priority, seq)
    elapsed_s: float = 0.0
    seen_stats: list[dict] = field(default_factory=list)
    politeness_stats: list[dict] = field(default_factory=list)


def _make_dedup_fn(seen_view, lineage):
    def dedup(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        if n == 0:
            return batch
        hashes = batch.column("url_hash").to_numpy(zero_copy_only=False)
        r = int(batch.column("round")[0].as_py())
        mask, metrics = seen_view.filter_new(hashes, round=r)
        if lineage is not None:
            # awaited so the round-barrier drain never races an in-flight
            # record into the wrong round's checkpoint (see FetchStage)
            ray.get(lineage.record.remote(
                stage="dedup",
                round=int(batch.column("round")[0].as_py()),
                batch_key=int(batch.column("seq")[0].as_py()),
                rows_in=n,
                rows_out=int(mask.sum()),
                new_urls=int(mask.sum()),
                dup_urls=int(n - mask.sum()),
                bloom_maybe=metrics["bloom_maybe"],
            ))
        return batch.filter(pa.array(mask))

    return dedup


def _run_round_distributed(frontier_refs: list, host_counts: dict,
                           block_hcs: list, r: int,
                           cfg: CrawlConfig, corpus_path: str,
                           records_dir: str, seen, politeness, lineage,
                           num_fetch_parts: int):
    """One crawl round with the frontier kept as object-store refs.
    Returns the materialized child-block refs (the barrier runs after the
    round's bookkeeping so budget truncation can use this round's fetch
    count)."""
    plan, spread = _lpt_plan(host_counts, num_fetch_parts)
    plan_ref = ray.put((plan, spread))
    # per-block within-host offsets for exact rank routing (_route_block):
    # block b's offset for host h = rows of h in blocks 0..b-1.  The zip
    # below would silently DROP frontier blocks on a length mismatch, so
    # assert alignment loudly.
    assert len(block_hcs) == len(frontier_refs), \
        f"block host-counts ({len(block_hcs)}) != frontier blocks ({len(frontier_refs)})"
    offsets_per_block, running = [], {}
    for hc in block_hcs:
        offsets_per_block.append({h: running.get(h, 0) for h in hc})
        for h, c in hc.items():
            running[h] = running.get(h, 0) + c

    # exact exchange (identity routing, see _route_block): the NARROW
    # frontier moves as zero-copy Arrow slices through the object store;
    # output block i == LPT fetch part i, so the fetch pool sees evenly
    # loaded single-part tasks.  All exchange tasks are num_cpus=0: a
    # fixed-size fetch pool sized to the whole cluster deadlocks against
    # any CPU-consuming upstream in the same pipeline (the pool holds every
    # CPU while waiting for input the exchange could never get a CPU to
    # produce).  Frontier rows are ~100 bytes each; the object store spills
    # if a round is huge.
    routed = [
        _route_block.options(num_returns=num_fetch_parts).remote(
            ref, plan_ref, offs, num_fetch_parts)
        for ref, offs in zip(frontier_refs, offsets_per_block)
    ]
    if num_fetch_parts == 1:  # num_returns=1: one ref to the whole list
        routed = [[unwrap_single_return.remote(r_)] for r_ in routed]
    part_refs = [
        _concat_part.remote(*[blocks[p] for blocks in routed])
        for p in range(num_fetch_parts)
    ]
    f3 = rd.from_arrow_refs(part_refs)

    # dedup -> fetch -> children: the ONE Ray Data execution of the round.
    # dedup is RPC-bound (bloom check + shard calls): num_cpus=0 so it can
    # never be starved by (or starve) the CPU-reserving fetch pool
    import pyarrow.compute as pc

    ds = f3.map_batches(_make_dedup_fn(seen.task_view(), lineage),
                        batch_size=None, batch_format="pyarrow", num_cpus=0)
    ds = ds.map_batches(
        FetchStage,
        fn_constructor_kwargs={
            "corpus_path": corpus_path,
            "politeness_view": politeness.task_view(),
            "lineage": lineage,
            "records_dir": records_dir,
            "fetch_latency_s": cfg.fetch_latency_s,
            "emit_children": True,
            "n_hosts": cfg.n_hosts,
            "fail_marker_dir": cfg.extra.get("fail_marker_dir"),
        },
        # batch_size=None: one LPT part block == one actor task, same as the
        # driver-barrier path.  A numeric batch_size here is a trap: Ray Data
        # bundles input blocks UP TO batch_size rows per actor task, and LPT
        # parts sit at-or-just-below the cap, so pairs of parts merged into
        # single tasks that worked a double-length serial latency budget
        # (measured: 35 tasks for 64 parts, round wall +60%).  Splitting the
        # call batches inside a task can't help either — the actor works its
        # batches serially regardless.
        batch_size=None,
        batch_format="pyarrow",
        concurrency=cfg.fetch_concurrency, num_cpus=cfg.fetch_num_cpus,
    )
    children = ds.map_batches(
        lambda t: t.filter(pc.equal(t.column("kind"), "child"))
                   .drop_columns(["kind", "image_id", "phash", "fetch_status"]),
        batch_size=None, batch_format="pyarrow", num_cpus=0,
    )
    child_m = children.materialize()
    import os as _os

    if _os.environ.get("WEAVER_STATS"):
        print(child_m.stats(), flush=True)
    # count() on a MaterializedDataset is metadata-only — no execution
    return child_m.to_arrow_refs(), child_m.count()


def crawl(cfg: CrawlConfig, out_dir: str, corpus_path: str | None = None,
          resume: bool = False) -> CrawlResult:
    """Run (or resume) a crawl.  Ray must already be initialised by the
    caller (driver contract — __ray_entry__.py docstring).

    The crawl overrides two process-global DataContext fields (actor retry
    errors, per-actor task in-flight cap); this wrapper restores them even
    when a round raises, so a failed crawl never leaks settings into later
    pipelines that share the process (bench.py, the memoized query crawl).
    (The hash-shuffle fields once saved here went dead when the barrier
    became a task exchange — only fields the crawl actually writes are
    saved now.)"""
    from ray.data.context import DataContext

    ctx = DataContext.get_current()
    prev_retry = ctx.actor_task_retry_on_errors
    prev_inflight = ctx.max_tasks_in_flight_per_actor
    try:
        return _crawl_inner(cfg, out_dir, corpus_path, resume)
    finally:
        ctx.actor_task_retry_on_errors = prev_retry
        ctx.max_tasks_in_flight_per_actor = prev_inflight


def _crawl_inner(cfg: CrawlConfig, out_dir: str, corpus_path: str | None = None,
                 resume: bool = False) -> CrawlResult:
    t_start = time.monotonic()
    if corpus_path is None:
        corpus_path = generate_corpus(cfg.corpus_size, cfg.seed)

    out = Path(out_dir)
    records_dir = out / "records"
    ckpt = CheckpointManager(str(out / "ckpt")) if cfg.checkpoint_dir is None else CheckpointManager(cfg.checkpoint_dir)

    start_round = 0
    urls_fetched = 0
    per_round: list[dict] = []
    committed = ckpt.latest_committed_round() if resume else None
    resume_files: list[str] | None = None
    if resume and committed is not None:
        # distributed mode never pulls the frontier through the driver —
        # resume included: frontier parts load as Ray read tasks below
        state = ckpt.load_round(committed, load_frontier=not cfg.distributed)
        frontier = state["frontier"]
        if cfg.distributed:
            resume_files = ckpt.frontier_files(committed)
        start_round = committed + 1
        urls_fetched = int(state["summary"]["urls_fetched"])
        per_round = state["summary"].get("per_round", [])
        ckpt.clean_uncommitted_records(str(records_dir), committed)
    else:
        for d in (records_dir, out / "seen"):  # "seen" dir: legacy layout
            if d.exists():
                shutil.rmtree(d)
        # a FRESH run always starts with no checkpoint artifacts — explicit
        # checkpoint_dir included: stale COMMIT markers / shard snapshots
        # from an earlier run would otherwise be loaded by a later resume as
        # if they belonged to this run.  Only KNOWN artifact filenames are
        # deleted — a user-supplied dir holding unrelated files is preserved.
        ckpt.clear()
        frontier = seed_frontier(cfg.n_seeds, cfg.n_hosts)
    records_dir.mkdir(parents=True, exist_ok=True)

    # --- stateful pools (restored from checkpoint on resume) --------------
    capacity = max(4096, 4 * cfg.corpus_size // cfg.num_seen_shards)
    seen = SeenSet(cfg.num_seen_shards, capacity, exact=cfg.exact_seen,
                   use_bloom=cfg.use_bloom, production=not cfg.exact_seen)
    politeness = PolitenessPool(cfg.num_politeness_shards, cfg.seed, cfg.n_hosts,
                                cfg.delay_scale)
    lineage = LineageActor.remote()
    if resume and committed is not None:
        seen.restore_shards(state["seen_states"])
        politeness.restore_shards(state["politeness_states"])

    # fetch_parts_per_actor x pool size: enough for dynamic assignment to
    # even out Zipf-skewed partition sizes, few enough that per-(batch,
    # shard) actor RPCs stay amortized — every extra partition costs one
    # politeness and one seen-set RPC fan-out per shard
    num_fetch_parts = max(cfg.fetch_concurrency * cfg.fetch_parts_per_actor, 8)

    # per-host crawl budget (fairness cap): cumulative kept-row counts per
    # host, checkpointed with the round summary so resume keeps counting
    cap_ph = cfg.max_pages_per_host
    used_ph: dict[str, int] = {}
    if resume and committed is not None:
        used_ph = {str(k): int(v) for k, v in
                   state["summary"].get("used_per_host", {}).items()}
    elif cap_ph is not None and frontier is not None and frontier.num_rows:
        # the SEED frontier is quota'd by the same rule as every round
        frontier = _apply_host_quota_table(frontier, used_ph, cap_ph)

    import os as _os

    trace = bool(_os.environ.get("WEAVER_TRACE"))

    def _t(label: str, t0: float) -> float:
        now = time.monotonic()
        if trace:
            print(f"    [trace] {label}: {now - t0:.2f}s", flush=True)
        return now

    # transient I/O errors in fetch tasks retry (idempotent writes + the
    # round-aware seen-set make retries exactly-once); set before any
    # dataset is created — each Dataset snapshots the context
    from ray.data.context import DataContext as _DC

    _ctx = _DC.get_current()
    prev_retry = _ctx.actor_task_retry_on_errors
    if not prev_retry:
        _ctx.actor_task_retry_on_errors = [OSError]
    # one task in flight per fetch actor (default 4): fetch work is a
    # serial latency sleep per batch, so queuing extra batches on an
    # early-ready actor just idles the others — measured parallelism went
    # from ~11/32 actors to near-full with dynamic one-at-a-time dispatch.
    # Inputs are narrow frontier rows; there is nothing to pipeline.
    # (restored by the crawl() wrapper's finally)
    _ctx.max_tasks_in_flight_per_actor = 1

    frontier_refs = None
    frontier_hosts: dict[str, int] = {}
    frontier_block_hcs: list[dict] = []
    frontier_count = frontier.num_rows if frontier is not None else 0
    if cfg.distributed:
        remaining0 = None if cfg.max_urls is None else cfg.max_urls - urls_fetched
        if resume_files is not None:
            # resume: checkpointed frontier parts -> refs via read tasks
            frontier_refs, frontier_count, frontier_hosts, frontier_block_hcs = \
                _frontier_refs_from_files(resume_files, remaining0)
        elif frontier is not None and frontier.num_rows:
            # seed: the (small, seq-assigned) driver table enters the object
            # store once; after that the frontier is refs end to end.
            # NO budget slice here: driver mode and the oracle apply
            # max_urls only at ROUND BARRIERS (a round may overshoot the
            # budget mid-round), so truncating the seed frontier would
            # break mode equivalence whenever n_seeds > max_urls
            frontier_refs, frontier_count, frontier_hosts, frontier_block_hcs = \
                _driver_table_to_refs(frontier, None)

    for r in range(start_round, cfg.max_rounds):
        if cfg.distributed:
            if frontier_refs is None or frontier_count == 0:
                break
            if cfg.max_urls is not None and urls_fetched >= cfg.max_urls:
                break
            tr = time.monotonic()
            round_frontier_rows = frontier_count
            child_refs, child_rows = _run_round_distributed(
                frontier_refs, frontier_hosts, frontier_block_hcs, r, cfg,
                corpus_path, str(records_dir), seen, politeness, lineage,
                num_fetch_parts)
            tr = _t(f"r{r} dedup+fetch+children", tr)

            # round bookkeeping from the fetch stage's per-partition sidecar
            # manifests — a handful of tiny JSON reads, NEVER a driver read
            # of record data or url_hash columns (at 10^10 URLs those stay
            # on disk / in the shard actors).  Manifests are idempotent per
            # (round, first_seq), so counts are exactly-once under retries.
            import json as _json

            sfiles = sorted((records_dir / f"round={r}").glob("part-*.stats.json"))
            pstats = [_json.loads(f.read_text()) for f in sfiles]
            n_ok = sum(s["fetched_ok"] for s in pstats)
            n_denied = sum(s["robots_denied"] for s in pstats)
            n_dead = sum(s["dead"] for s in pstats)
            survivors = sum(s["rows_in"] for s in pstats)
            urls_fetched += n_ok
            # snapshot the shard-owned blooms for the next round's
            # pre-filter (each shard folded its own slice as it inserted)
            seen.publish_blooms()
            # task-based barrier: dedup + sample-sort + seq over the child
            # refs (budget truncation applied at construction, exactly the
            # driver barrier's post-round slice)
            remaining = None if cfg.max_urls is None else \
                max(0, cfg.max_urls - urls_fetched)
            k = _barrier_parts(child_rows, floor=max(8, num_fetch_parts // 4))
            frontier_refs, frontier_count, frontier_hosts, frontier_block_hcs = \
                _distributed_barrier(child_refs, k, remaining)
            if cap_ph is not None and frontier_refs is not None:
                (frontier_refs, frontier_count, frontier_hosts,
                 frontier_block_hcs) = _apply_host_quota_refs(
                    frontier_refs, frontier_block_hcs, used_ph, cap_ph)
            tr = _t(f"r{r} barrier", tr)
            summary = {
                "round": r,
                "frontier_rows": round_frontier_rows,
                "dedup_survivors": survivors,
                "fetched_ok": n_ok,
                "robots_denied": n_denied,
                "dead": n_dead,
                "children": frontier_count,
                "urls_fetched": urls_fetched,
            }
            per_round.append(summary)
            ckpt.save_round(
                r,
                rd.from_arrow_refs(frontier_refs) if frontier_refs else None,
                seen.serialize_shards(),
                politeness.serialize_shards(),
                ray.get(lineage.drain.remote()),
                {"urls_fetched": urls_fetched, "per_round": per_round,
                 "round": r, "used_per_host": dict(used_ph)},
            )
            _t(f"r{r} checkpoint", tr)
            continue

        # frontier can be None when resuming a distributed-mode checkpoint
        # whose final frontier was empty (empty dir -> load_round None)
        if frontier is None or frontier.num_rows == 0:
            break
        if cfg.max_urls is not None and urls_fetched >= cfg.max_urls:
            break
        tr = time.monotonic()
        parts = partition_for_fetch(frontier, num_fetch_parts,
                                    cfg.hot_host_threshold, cfg.hot_host_salt)
        tr = _t(f"r{r} partition", tr)
        ds = rd.from_arrow(parts)
        ds = ds.map_batches(_make_dedup_fn(seen.task_view(), lineage),
                            batch_size=None, batch_format="pyarrow", num_cpus=0)
        ds = ds.map_batches(
            FetchStage,
            fn_constructor_kwargs={
                "corpus_path": corpus_path,
                "politeness_view": politeness.task_view(),
                "lineage": lineage,
                "records_dir": str(records_dir),
                "fetch_latency_s": cfg.fetch_latency_s,
                "emit_children": True,   # link extraction folded into the stage:
                "n_hosts": cfg.n_hosts,  # one execution per round, no 2nd pool
                "fail_marker_dir": cfg.extra.get("fail_marker_dir"),
            },
            batch_size=None,
            batch_format="pyarrow",
            concurrency=cfg.fetch_concurrency,
            num_cpus=cfg.fetch_num_cpus,
            # transient-failure retry comes from Ray Data's default actor
            # max_task_retries=-1 + DataContext.actor_task_retry_on_errors
            # (set at crawl start); an explicit max_task_retries here
            # deadlocks pools sized to every CPU (observed on Ray 2.49)
        )
        union = ds.materialize()  # narrow rows + child rows; bytes sunk in-stage
        tr = _t(f"r{r} dedup+fetch+children", tr)
        narrow_t, child_tables = split_union(ray.get(union.to_arrow_refs()))
        tr = _t(f"r{r} collect", tr)

        # --- round barrier -------------------------------------------------
        n_ok = n_denied = n_dead = 0
        if narrow_t is not None and narrow_t.num_rows:
            status = narrow_t.column("fetch_status").to_pylist()
            n_ok = status.count("ok")
            n_denied = status.count("robots_denied")
            n_dead = status.count("dead")
            urls_fetched += n_ok
        # snapshot the shard-owned blooms for the next round's pre-filter
        seen.publish_blooms()

        if child_tables:
            children = pa.concat_tables(child_tables)
            nxt = assign_seq(dedup_within_round(children))
        else:
            nxt = frontier.slice(0, 0)
        if cfg.max_urls is not None:
            remaining = max(0, cfg.max_urls - urls_fetched)
            nxt = nxt.slice(0, remaining)
        if cap_ph is not None:
            nxt = _apply_host_quota_table(nxt, used_ph, cap_ph)

        summary = {
            "round": r,
            "frontier_rows": frontier.num_rows,
            "dedup_survivors": narrow_t.num_rows if narrow_t is not None else 0,
            "fetched_ok": n_ok,
            "robots_denied": n_denied,
            "dead": n_dead,
            "children": nxt.num_rows,
            "urls_fetched": urls_fetched,
        }
        tr = _t(f"r{r} barrier", tr)
        per_round.append(summary)
        ckpt.save_round(
            r,
            nxt,
            seen.serialize_shards(),
            politeness.serialize_shards(),
            ray.get(lineage.drain.remote()),
            {"urls_fetched": urls_fetched, "per_round": per_round,
             "round": r, "used_per_host": dict(used_ph)},
        )
        frontier = nxt
        _t(f"r{r} checkpoint", tr)

    # --- final artifacts ---------------------------------------------------
    # seen/order tables are derived ONCE, at the end, from a column-pruned
    # read of the record files (per-file read: a file list through the
    # dataset reader would trip hive-partition inference on "round=").
    # These driver-held tables are test/report conveniences — at 10^10-URL
    # scale consumers read the partitioned records directory instead.
    rec_files = sorted(records_dir.glob("round=*/part-*.parquet"))
    seen_table = order_table = None
    if rec_files:
        import pyarrow.compute as pc

        narrow = pa.concat_tables([
            pq.read_table(f, columns=["url_canon", "url_hash", "round",
                                      "seq", "priority"])
            for f in rec_files
        ])
        narrow = narrow.take(
            pc.sort_indices(narrow, sort_keys=[("round", "ascending"),
                                               ("seq", "ascending")])
        )
        seen_table = narrow.select(["url_canon", "url_hash", "round"])
        order_table = narrow.select(["url_canon", "round", "priority", "seq"])
    return CrawlResult(
        out_dir=str(out),
        records_dir=str(records_dir),
        rounds=len(per_round),
        urls_fetched=urls_fetched,
        urls_seen=seen_table.num_rows if seen_table is not None else 0,
        per_round=per_round,
        seen_table=seen_table,
        order_table=order_table,
        elapsed_s=time.monotonic() - t_start,
        seen_stats=seen.stats(),
        politeness_stats=politeness.stats(),
    )
