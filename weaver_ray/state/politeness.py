"""Per-host politeness: crawl-delay token scheduling + robots caching.

Absent in the reference (it crawls with colly defaults and only rate-limits
by its 1 s queue poll tick, src/scrapper/main.go:64 — SURVEY.md §2.3 T7);
mandated by the north rule: "a per-host politeness-aware priority queue
(host-hash partitioned min-heap with crawl-delay tokens and robots.txt
caching in actor-pool state)".

Design: N ``PolitenessShard`` actors; host -> shard by hash of the TRUE host
name, so even when the fetch stage salts a hot host across many fetch
actors, that host's crawl-delay tokens remain globally serialized (SURVEY.md
§7.3).  Each shard holds, per host: parsed robots rules (cached once per
host per epoch), the crawl delay, and ``next_free_ts`` — a virtual clock of
the host's next allowed fetch slot.  A scheduling request for a batch of
rows is processed in ``(priority desc, seq asc)`` order per host (the
min-heap discipline) and returns, per row: allowed?, and the wait (seconds)
until that row's assigned slot.

``delay_scale`` scales the crawl delay itself (and therefore every wait and
the host clock): the robots decisions, host grouping and (priority, seq)
slot ORDER are delay-independent, so with scale 0 tests exercise the full
decision logic with all waits degenerate to zero, while the bench can turn
real delays on to make politeness waits the dominant cost.

Retry safety: ``schedule`` is idempotent per (round, first-seq) batch key —
a retried fetch task re-presents its batch and receives the CACHED slot
assignment instead of advancing the host clocks (and stats counters) a
second time.
"""

from __future__ import annotations

import time

import numpy as np
import ray

from .. import config
from .robots import RobotsRules, robots_body


@ray.remote(num_cpus=0)
class PolitenessShard:
    def __init__(self, shard_id: int, seed: int = config.CORPUS_SEED,
                 n_hosts: int = config.N_HOSTS, delay_scale: float = 0.0):
        self.shard_id = shard_id
        self.seed = seed
        self.n_hosts = n_hosts
        self.delay_scale = delay_scale
        self.hosts: dict[str, dict] = {}  # host -> {rules, delay_s, next_free}
        self.robots_fetches = 0
        self.denied_total = 0
        self.scheduled_total = 0
        # batch_key -> cached (allowed, absolute slot timestamps): a RETRIED
        # fetch task re-presents the same (round, first_seq) batch and must
        # get the original slots back instead of advancing host clocks /
        # counters twice.  Slots are cached ABSOLUTE (monotonic timestamps),
        # so a late retry waits only until its original slot — not the full
        # original delay again.  Bounded: one entry per batch per round,
        # cleared when the round advances.
        self._batch_memo: dict[tuple, dict] = {}
        self._memo_round: int | None = None

    def _host_state(self, host: str) -> dict:
        st = self.hosts.get(host)
        if st is None:
            # "fetch" robots.txt for the host (hermetic fixture), parse once,
            # cache for the epoch — the robots cache of the north rule.
            rules = RobotsRules(robots_body(host, self.seed, self.n_hosts))
            self.robots_fetches += 1
            st = {
                "rules": rules,
                "delay_s": (rules.crawl_delay_s or 0.0) * self.delay_scale,
                # host clock: starts at 0 and is pulled onto the absolute
                # monotonic timeline by max(next_free, now) on first use
                "next_free": 0.0,
            }
            self.hosts[host] = st
        return st

    def schedule(self, hosts: list[str], paths: list[str],
                 priorities: np.ndarray, seqs: np.ndarray,
                 batch_key: tuple | None = None) -> dict:
        """Vector request: for each row, robots-check then assign a fetch
        slot on the host's clock in (priority desc, seq asc) order.

        Returns {"allowed": bool[n], "wait_s": float[n]} — wait_s is how long
        the *caller* should sleep before performing row i's fetch so that
        per-host min-intervals hold.  ``batch_key`` (round, first_seq, shard
        slice id) makes the call idempotent under task retries.
        """
        n = len(hosts)
        allowed = np.ones(n, dtype=bool)
        wait_s = np.zeros(n, dtype=np.float64)
        if n == 0:
            return {"allowed": allowed, "wait_s": wait_s}
        if batch_key is not None:
            if self._memo_round != batch_key[0]:
                self._memo_round = batch_key[0]
                self._batch_memo = {}  # memory bounded by one round
            cached = self._batch_memo.get(batch_key)
            if cached is not None:
                return {"allowed": cached["allowed"],
                        "wait_s": np.maximum(0.0, cached["slots"] - time.monotonic())}
        now = time.monotonic()
        slot_ts = np.full(n, now, dtype=np.float64)  # absolute slot per row
        # group rows by host (vectorized robots check + slot arithmetic per
        # host); within a host, slots go in (priority desc, seq asc) order —
        # the min-heap discipline
        harr = np.asarray(hosts, dtype=object)
        order = np.lexsort((np.asarray(seqs), -np.asarray(priorities), harr))
        sorted_hosts = harr[order]
        boundaries = np.flatnonzero(
            np.concatenate(([True], sorted_hosts[1:] != sorted_hosts[:-1]))
        )
        for gi, start in enumerate(boundaries):
            end = boundaries[gi + 1] if gi + 1 < len(boundaries) else n
            idx = order[start:end]
            st = self._host_state(sorted_hosts[start])
            ok = st["rules"].allowed_many([paths[i] for i in idx])
            allowed[idx] = ok
            self.denied_total += int((~ok).sum())
            kept = idx[ok]
            k = len(kept)
            if k:
                base = max(st["next_free"], now)
                slots = base + st["delay_s"] * np.arange(k, dtype=np.float64)
                wait_s[kept] = slots - now
                slot_ts[kept] = slots
                st["next_free"] = base + st["delay_s"] * k
                self.scheduled_total += k
        if batch_key is not None:
            self._batch_memo[batch_key] = {"allowed": allowed, "slots": slot_ts}
        return {"allowed": allowed, "wait_s": wait_s}

    def stats(self) -> dict:
        return {
            "shard_id": self.shard_id,
            "hosts_cached": len(self.hosts),
            "robots_fetches": self.robots_fetches,
            "denied_total": self.denied_total,
            "scheduled_total": self.scheduled_total,
        }

    def serialize(self) -> dict:
        """Checkpoint: host clocks live on this process's monotonic timeline
        and are meaningless to a restored process, so only counters + the
        set of warmed hosts survive (robots re-parse on restore is cheap and
        the fixture is deterministic)."""
        return {
            "shard_id": self.shard_id,
            "hosts": list(self.hosts.keys()),
            "counters": (self.robots_fetches, self.denied_total, self.scheduled_total),
        }

    def restore(self, state: dict) -> None:
        self.shard_id = int(state["shard_id"])
        for h in state["hosts"]:
            self._host_state(h)
        self.robots_fetches, self.denied_total, self.scheduled_total = map(int, state["counters"])


def host_shard_of(hosts: list[str], num_shards: int) -> np.ndarray:
    """Stable host -> politeness-shard routing (by true host, never salted)."""
    import hashlib

    return np.fromiter(
        (int.from_bytes(hashlib.sha1(h.encode()).digest()[:4], "big") % num_shards
         for h in hosts),
        dtype=np.int64, count=len(hosts),
    )


class PolitenessView:
    """Picklable task-side handle: routes batched schedule() calls to the
    owning shard (one RPC per (batch, shard))."""

    def __init__(self, shards: list, num_shards: int):
        self.shards = shards
        self.num_shards = num_shards

    def schedule(self, hosts: list[str], paths: list[str],
                 priorities: np.ndarray, seqs: np.ndarray,
                 batch_key: tuple | None = None) -> tuple[np.ndarray, np.ndarray]:
        n = len(hosts)
        allowed = np.ones(n, dtype=bool)
        wait_s = np.zeros(n, dtype=np.float64)
        if n == 0:
            return allowed, wait_s
        shard_ids = host_shard_of(hosts, self.num_shards)
        futs, slices = [], []
        for s in range(self.num_shards):
            sel = np.flatnonzero(shard_ids == s)
            if len(sel):
                key = batch_key + (s,) if batch_key is not None else None
                futs.append(self.shards[s].schedule.remote(
                    [hosts[i] for i in sel], [paths[i] for i in sel],
                    np.asarray(priorities)[sel], np.asarray(seqs)[sel], key))
                slices.append(sel)
        for fut, sel in zip(futs, slices):
            res = ray.get(fut)
            allowed[sel] = res["allowed"]
            wait_s[sel] = res["wait_s"]
        return allowed, wait_s


class PolitenessPool:
    """Driver-side owner of the politeness shard actors."""

    def __init__(self, num_shards: int, seed: int = config.CORPUS_SEED,
                 n_hosts: int = config.N_HOSTS, delay_scale: float = 0.0):
        self.num_shards = num_shards
        self.shards = [
            PolitenessShard.remote(i, seed, n_hosts, delay_scale)
            for i in range(num_shards)
        ]

    def task_view(self) -> PolitenessView:
        return PolitenessView(self.shards, self.num_shards)

    def stats(self) -> list[dict]:
        return ray.get([s.stats.remote() for s in self.shards])

    def serialize_shards(self) -> list[dict]:
        return ray.get([s.serialize.remote() for s in self.shards])

    def restore_shards(self, states: list[dict]) -> None:
        # route each state to the shard it came from by its own shard_id
        # (mirrors SeenSet.restore_shards) — caller-side list ordering must
        # never decide which shard's counters/robots cache a state warms
        by_id = {int(st["shard_id"]): st for st in states}
        assert sorted(by_id) == list(range(self.num_shards)), \
            f"politeness checkpoint shard ids {sorted(by_id)} != 0..{self.num_shards - 1}"
        ray.get([self.shards[i].restore.remote(by_id[i])
                 for i in range(self.num_shards)])
