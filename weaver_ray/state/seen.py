"""The sharded URL-seen set: cuckoo-filter shard actors, each owning its
slice's bloom pre-filter.

Reference analog: colly's per-collector visited set (SURVEY.md §2.3 T2) and
the chord ring's ownership of keys (src/chord/chord.go:199-224).  Here each
of N ``SeenShard`` actors owns the ``hash % N`` slice of the uint64 URL-hash
space — a single writer per shard, so membership updates need no locking
(reference analog: the queue mutex, src/queue/main.go:21).

Modes (SURVEY.md §7.4.5):
- exact mode (default; parity tests): an exact ``set`` is authoritative and
  the cuckoo filter runs alongside with disagreements counted — zero false
  drops, measured cuckoo FP rate.
- production mode: cuckoo only; plus the bloom pre-filter — batches drop
  bloom-positive ("maybe seen") URLs without any RPC and send the rest to
  their shard.  The bloom never false-negatives, so no duplicate ever slips
  through; its false-positive rate (~1% at 10 bits/key) is the measured
  budget of wrongly-dropped novel URLs, reported in lineage.

Bloom ownership is PER SHARD (the north rule's "bloom pre-filter per
partition"): each shard folds its newly-inserted hashes into its own bloom
as they arrive, and at every round barrier the driver snapshots the shard
blooms into the object store (``SeenSet.publish_blooms`` — one small
``ray.put`` per shard).  Fetch-side tasks read the per-shard bloom refs
zero-copy from their node's object store and cache the deserialized filter
per worker process.  At 10^10 URLs × 10 bits/key the total bloom is ~12 GB,
but each of (say) 256 shards owns only ~47 MB — nothing is ever folded,
rebuilt or re-broadcast driver-side, and no driver-side read of the round's
url_hash column exists.  Snapshot timing preserves retry safety: the refs
published at round r's barrier do not contain round r+1's inserts, so a
retried task re-presenting this round's hashes is never bloom-dropped.

Calls are batched: one RPC per (task batch, shard) with a numpy array of
hashes — never per URL.
"""

from __future__ import annotations

import numpy as np
import ray

from .. import config
from ..functions.sketches import BloomFilter, CuckooFilter


@ray.remote(num_cpus=0)
class SeenShard:
    """Owner of one slice of the hash space. num_cpus=0: the work per call is
    microseconds of set ops; reserving cores would starve fetch actors."""

    def __init__(self, shard_id: int, capacity: int, exact: bool = True,
                 use_bloom: bool = True):
        self.shard_id = shard_id
        self.cuckoo = CuckooFilter(capacity)
        self.exact_mode = exact
        self.exact: set[int] | None = set() if exact else None
        self.bloom = BloomFilter(capacity) if use_bloom else None
        self.fp_disagreements = 0  # cuckoo said present, exact said absent
        self.new_total = 0
        self.dup_total = 0
        # retry safety: a round's frontier is unique per canon (barrier
        # dedup), so a hash seen TWICE in the same round is a retried task,
        # not a duplicate URL — it must stay a survivor or the retry would
        # silently drop its rows (exactly-once per round, SURVEY.md §4).
        self.current_round: int | None = None
        self.this_round: set[int] = set()

    def contains_or_insert(self, hashes: np.ndarray, round: int | None = None) -> np.ndarray:
        """bool[n]: True = survives dedup (newly inserted, or re-presented
        by a retried task within the same round), first-wins."""
        hashes = np.asarray(hashes, dtype=np.uint64)
        if round is not None and round != self.current_round:
            self.current_round = round
            self.this_round = set()  # memory bounded by one round per shard
        out = np.zeros(len(hashes), dtype=bool)
        newly = np.zeros(len(hashes), dtype=bool)
        if self.exact_mode:
            cuckoo_says = self.cuckoo.contains(hashes)
            s = self.exact
            for i, h in enumerate(hashes.tolist()):
                if h not in s:
                    s.add(h)
                    out[i] = newly[i] = True
                elif round is not None and h in self.this_round:
                    out[i] = True  # retried task re-presenting this round's insert
            self.fp_disagreements += int((cuckoo_says & newly).sum())
            self.cuckoo.insert(hashes[newly])
        else:
            out = self.cuckoo.contains_or_insert(hashes)
            newly = out.copy()
            if round is not None and self.this_round:
                for i, h in enumerate(hashes.tolist()):
                    if not out[i] and h in self.this_round:
                        out[i] = True
        if self.bloom is not None:
            # fold immediately: the task-side snapshot is only refreshed at
            # round barriers (publish_blooms), so within-round retry
            # re-presentation is never bloom-dropped
            self.bloom.add(hashes[newly])
        if round is not None:
            self.this_round.update(hashes[out].tolist())
        self.new_total += int(newly.sum())
        self.dup_total += int((~out).sum())
        return out

    def contains(self, hashes: np.ndarray) -> np.ndarray:
        hashes = np.asarray(hashes, dtype=np.uint64)
        if self.exact_mode:
            s = self.exact
            return np.fromiter((h in s for h in hashes.tolist()), dtype=bool, count=len(hashes))
        return self.cuckoo.contains(hashes)

    def bloom_state(self) -> dict | None:
        """Serialized snapshot of this shard's bloom (round-barrier publish)."""
        return self.bloom.serialize() if self.bloom is not None else None

    def stats(self) -> dict:
        return {
            "shard_id": self.shard_id,
            "count": len(self.exact) if self.exact_mode else self.cuckoo.count,
            "cuckoo_load": self.cuckoo.load_factor,
            "fp_disagreements": self.fp_disagreements,
            "insert_failures": self.cuckoo.insert_failures,
            "new_total": self.new_total,
            "dup_total": self.dup_total,
        }

    def serialize(self) -> dict:
        return {
            "shard_id": self.shard_id,
            "exact_mode": self.exact_mode,
            "exact": np.fromiter(self.exact, dtype=np.uint64, count=len(self.exact))
            if self.exact_mode
            else None,
            "cuckoo": self.cuckoo.serialize(),
            "bloom": self.bloom.serialize() if self.bloom is not None else None,
            "counters": (self.fp_disagreements, self.new_total, self.dup_total),
        }

    def restore(self, state: dict) -> None:
        self.shard_id = int(state["shard_id"])
        self.exact_mode = bool(state["exact_mode"])
        self.exact = set(np.asarray(state["exact"], np.uint64).tolist()) if self.exact_mode else None
        self.cuckoo = CuckooFilter.deserialize(state["cuckoo"])
        if self.bloom is not None:
            if state.get("bloom") is not None:
                self.bloom = BloomFilter.deserialize(state["bloom"])
            elif self.exact_mode:
                # legacy checkpoint without bloom bits: rebuild from exact
                self.bloom = BloomFilter(max(64, len(self.exact)))
                self.bloom.add(np.fromiter(self.exact, np.uint64, len(self.exact)))
        self.fp_disagreements, self.new_total, self.dup_total = map(int, state["counters"])


# per-worker-process cache of deserialized bloom snapshots, keyed by SHARD
# index with the ref recorded alongside: a new round's snapshot REPLACES the
# shard's slot, so the cache holds exactly one filter per shard (the current
# epoch) — at the 10^10 sizing that is num_shards x ~47 MB per worker, never
# an unbounded pile of stale rounds.  The first batch per (worker, shard,
# round) pays one zero-copy ray.get + deserialize; later batches hit the
# dict.
_BLOOM_CACHE: dict[int, tuple[str, BloomFilter]] = {}


def _bloom_from_ref(shard: int, ref) -> BloomFilter:
    key = ref.hex() if hasattr(ref, "hex") else str(ref)
    cached = _BLOOM_CACHE.get(shard)
    if cached is not None and cached[0] == key:
        return cached[1]
    bf = BloomFilter.deserialize(ray.get(ref))
    _BLOOM_CACHE[shard] = (key, bf)
    return bf


class SeenView:
    """The picklable, task-side face of the seen set: shard handles + the
    per-shard bloom snapshot *refs* (ray.put once per round at the barrier,
    read zero-copy in each task — the 'broadcast small side, don't re-ship
    per batch' rule)."""

    def __init__(self, shards: list, num_shards: int, use_bloom: bool,
                 bloom_refs: list | None, production: bool):
        self.shards = shards
        self.num_shards = num_shards
        self.use_bloom = use_bloom
        self.bloom_refs = bloom_refs
        self.production = production

    def filter_new(self, hashes: np.ndarray, round: int | None = None) -> tuple[np.ndarray, dict]:
        """bool[n] 'survives dedup' + per-call metrics.

        Production mode enables the bloom drop path (no RPC for maybe-seen);
        otherwise the bloom is consulted for metrics only and every hash is
        resolved authoritatively by its shard.  Passing ``round`` makes the
        call retry-safe: a hash re-presented within the same round (a
        retried task) stays a survivor.
        """
        hashes = np.asarray(hashes, dtype=np.uint64)
        n = len(hashes)
        metrics = {"bloom_maybe": 0, "rpc_hashes": 0}
        if n == 0:
            return np.zeros(0, dtype=bool), metrics

        shard_of = (hashes % np.uint64(self.num_shards)).astype(np.int64)
        candidates = np.ones(n, dtype=bool)
        if self.use_bloom and self.bloom_refs is not None:
            # consult each hash's OWNING shard's bloom snapshot (same % N
            # routing as the cuckoo shards — bloom per partition)
            maybe = np.zeros(n, dtype=bool)
            for s in range(self.num_shards):
                sel = np.flatnonzero(shard_of == s)
                if len(sel) and self.bloom_refs[s] is not None:
                    bloom = _bloom_from_ref(s, self.bloom_refs[s])
                    maybe[sel] = bloom.maybe_contains(hashes[sel])
            metrics["bloom_maybe"] = int(maybe.sum())
            if self.production:
                candidates = ~maybe  # drop maybe-seen without RPC (measured FP budget)

        out = np.zeros(n, dtype=bool)
        idx = np.flatnonzero(candidates)
        if len(idx):
            sub = hashes[idx]
            sub_shard = shard_of[idx]
            futs, slices = [], []
            for s in range(self.num_shards):
                sel = np.flatnonzero(sub_shard == s)
                if len(sel):
                    futs.append(self.shards[s].contains_or_insert.remote(sub[sel], round))
                    slices.append(idx[sel])
            for fut, sel in zip(futs, slices):
                out[sel] = ray.get(fut)
            metrics["rpc_hashes"] = int(len(idx))
        return out, metrics


class SeenSet:
    """Driver-side owner of the shard-actor pool.  Never capture this in a
    task closure — use :meth:`task_view`."""

    def __init__(self, num_shards: int, capacity_per_shard: int, exact: bool = True,
                 use_bloom: bool = True, production: bool = False):
        self.num_shards = num_shards
        self.exact = exact
        self.use_bloom = use_bloom
        self.production = production
        self.shards = [
            SeenShard.remote(i, capacity_per_shard, exact, use_bloom)
            for i in range(num_shards)
        ]
        self.bloom_refs: list | None = None
        if use_bloom:
            self.publish_blooms()  # initial (empty) snapshots

    def task_view(self) -> SeenView:
        return SeenView(self.shards, self.num_shards, self.use_bloom,
                        self.bloom_refs, self.production)

    # -- round-barrier maintenance (driver only) ---------------------------
    def publish_blooms(self) -> None:
        """Snapshot every shard's bloom into the object store (one small
        ray.put per shard).  Called at each round barrier; the next round's
        task_view carries the new refs.  The driver never touches the bloom
        BITS — each shard folds its own slice as hashes arrive."""
        if not self.use_bloom:
            return
        states = ray.get([s.bloom_state.remote() for s in self.shards])
        self.bloom_refs = [
            ray.put(st) if st is not None else None for st in states
        ]

    def filter_new(self, hashes: np.ndarray, round: int | None = None) -> tuple[np.ndarray, dict]:
        return self.task_view().filter_new(hashes, round)

    # -- checkpoint --------------------------------------------------------
    def stats(self) -> list[dict]:
        return ray.get([s.stats.remote() for s in self.shards])

    def total_seen(self) -> int:
        return sum(st["count"] for st in self.stats())

    def serialize_shards(self) -> list[dict]:
        return ray.get([s.serialize.remote() for s in self.shards])

    def restore_shards(self, states: list[dict]) -> None:
        assert len(states) == self.num_shards
        # route each state to the actor that OWNS its hash slice — never by
        # list position (a caller-side ordering slip would silently hand
        # every shard the wrong cuckoo/bloom and break the seen set)
        by_id = {int(st["shard_id"]): st for st in states}
        assert sorted(by_id) == list(range(self.num_shards))
        ray.get([self.shards[i].restore.remote(by_id[i])
                 for i in range(self.num_shards)])
        # shard blooms travel IN the checkpointed shard state (production
        # mode included), so a resume re-publishes real snapshots — the
        # pre-filter never restarts empty
        self.publish_blooms()
