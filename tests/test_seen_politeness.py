"""Seen-shard actors, politeness scheduling, robots rules."""

import time

import numpy as np
import pytest
import ray

from weaver_ray.state.politeness import PolitenessPool, host_shard_of
from weaver_ray.state.robots import (
    RobotsRules,
    crawl_delay_ms,
    disallowed_suffixes,
    host_fully_blocked,
    robots_body,
)
from weaver_ray.state.seen import SeenSet


def _keys(n, seed=0):
    return np.random.default_rng(seed).integers(0, 2**63, n, dtype=np.int64).astype(np.uint64)


def test_seen_set_exact_first_wins_across_calls():
    seen = SeenSet(num_shards=4, capacity_per_shard=4096, exact=True)
    keys = _keys(5000, 1)
    new1, _ = seen.filter_new(keys)
    assert new1.all()
    new2, _ = seen.filter_new(keys)
    assert not new2.any()
    mixed = np.concatenate([keys[:100], _keys(100, 2)])
    new3, _ = seen.filter_new(mixed)
    assert not new3[:100].any() and new3[100:].all()
    assert seen.total_seen() == 5100
    for st in seen.stats():
        assert st["fp_disagreements"] == 0


def test_seen_set_production_mode_bloom_drop():
    seen = SeenSet(num_shards=2, capacity_per_shard=8192, exact=False,
                   use_bloom=True, production=True)
    keys = _keys(3000, 3)
    new1, m1 = seen.filter_new(keys)
    assert new1.all()
    # round barrier: snapshot the shard-owned blooms (each shard folded its
    # newly-inserted slice already); duplicates then drop WITHOUT any RPC
    seen.publish_blooms()
    new2, m2 = seen.filter_new(keys)
    assert not new2.any()
    assert m2["rpc_hashes"] == 0          # bloom absorbed everything
    assert m2["bloom_maybe"] == len(keys)


def test_seen_production_bloom_survives_restore():
    """A production-mode resume must restart with a WARM bloom pre-filter:
    the shard blooms travel in the checkpointed shard state."""
    seen = SeenSet(num_shards=2, capacity_per_shard=8192, exact=False,
                   use_bloom=True, production=True)
    keys = _keys(2000, 9)
    seen.filter_new(keys)
    states = seen.serialize_shards()
    seen2 = SeenSet(num_shards=2, capacity_per_shard=8192, exact=False,
                    use_bloom=True, production=True)
    seen2.restore_shards(states)
    new, m = seen2.filter_new(keys)
    assert not new.any()
    assert m["rpc_hashes"] == 0           # restored bloom, zero shard RPCs
    assert m["bloom_maybe"] == len(keys)


def test_seen_serialize_restore():
    seen = SeenSet(num_shards=2, capacity_per_shard=4096, exact=True)
    keys = _keys(1000, 4)
    seen.filter_new(keys)
    states = seen.serialize_shards()
    seen2 = SeenSet(num_shards=2, capacity_per_shard=4096, exact=True)
    seen2.restore_shards(states)
    new, _ = seen2.filter_new(keys)
    assert not new.any()


def test_seen_restore_with_many_shards_routes_by_id(tmp_path):
    """Regression: with >= 10 shards, lexicographic checkpoint-file order
    (shard_10 before shard_2) must NOT scramble which actor restores which
    slice — states route by shard_id, and a full save/load round trip
    through CheckpointManager preserves membership exactly."""
    from weaver_ray.state.checkpoint import CheckpointManager

    n = 12
    seen = SeenSet(num_shards=n, capacity_per_shard=2048, exact=True)
    keys = _keys(4000, 11)
    seen.filter_new(keys)

    # save via the real checkpoint writer (frontier as a tiny table)
    import pyarrow as pa

    ckpt = CheckpointManager(str(tmp_path / "ckpt"))
    ckpt.save_round(0, pa.table({"x": [1]}), seen.serialize_shards(), [], [],
                    {"urls_fetched": 0})
    state = ckpt.load_round(0)

    seen2 = SeenSet(num_shards=n, capacity_per_shard=2048, exact=True)
    seen2.restore_shards(state["seen_states"])
    new, _ = seen2.filter_new(keys)
    assert not new.any()          # every key still seen, no slice scrambled
    # shuffled state lists must also route correctly (restore is by id)
    import random

    states = seen.serialize_shards()
    random.Random(3).shuffle(states)
    seen3 = SeenSet(num_shards=n, capacity_per_shard=2048, exact=True)
    seen3.restore_shards(states)
    new3, _ = seen3.filter_new(keys)
    assert not new3.any()


def test_robots_rules_matching():
    r = RobotsRules("User-agent: *\nCrawl-delay: 0.2\nDisallow: /*42$\nDisallow: /private\n")
    assert r.crawl_delay_s == 0.2
    assert not r.allowed("/img00000042")
    assert r.allowed("/img00000043")
    assert not r.allowed("/private/x")
    r2 = RobotsRules("User-agent: *\nDisallow: /\nAllow: /public\n")
    assert not r2.allowed("/anything")
    assert r2.allowed("/public/ok")


def test_robots_fast_path_equals_rule_loop_randomized():
    """The disallow-only COMBINED-regex fast path must equal the
    per-rule longest-match loop on random rule sets and paths.  Adding
    ``Allow:`` (empty pattern) forces the slow path WITHOUT changing
    semantics — a zero-length Allow loses every tie to any non-empty
    Disallow and only wins when nothing else matches, which is the
    default-allow outcome anyway."""
    import numpy as np

    rng = np.random.default_rng(123)
    alphabet = list("abc12/")
    for trial in range(20):
        n_rules = int(rng.integers(1, 7))
        pats = []
        for _ in range(n_rules):
            chars = rng.choice(alphabet + ["*"], size=rng.integers(1, 7))
            p = "/" + "".join(chars)
            if rng.integers(0, 2):
                p += "$"
            pats.append(p)
        body = "User-agent: *\n" + "\n".join(f"Disallow: {p}" for p in pats)
        fast = RobotsRules(body)
        slow = RobotsRules(body + "\nAllow:")
        assert fast._combined is not None and slow._combined is None
        for _ in range(40):
            path = "/" + "".join(rng.choice(alphabet,
                                            size=rng.integers(0, 9)))
            assert fast.allowed(path) == slow.allowed(path), \
                f"trial {trial}: rules={pats} path={path!r}"
        paths = ["/" + "".join(rng.choice(alphabet, size=5))
                 for _ in range(16)]
        assert list(fast.allowed_many(paths)) == \
            [slow.allowed(p) for p in paths]


def test_robots_fixture_deterministic():
    assert robots_body("host-3.example") == robots_body("host-3.example")
    assert crawl_delay_ms("host-3.example") in (0, 50, 200, 1000)
    assert host_fully_blocked("host-7.example")
    assert host_fully_blocked("host-23.example")
    assert not host_fully_blocked("host-0.example")
    assert len(set(disallowed_suffixes("host-1.example"))) == 5


def test_politeness_denies_blocked_host_and_suffixes():
    pool = PolitenessPool(num_shards=2, delay_scale=0.0)
    view = pool.task_view()
    hosts = ["host-7.example", "host-1.example"]
    paths = ["/img00000001", "/img00000001"]
    allowed, wait = view.schedule(hosts, paths, np.ones(2), np.arange(2))
    assert not allowed[0]          # fully blocked host
    # host-1 allowed iff the path's trailing two digits are not one of its
    # 5 disallowed suffixes (computed from the deterministic fixture)
    sfx = disallowed_suffixes("host-1.example")
    assert bool(allowed[1]) == (paths[1][-2:] not in sfx)
    stats = pool.stats()
    assert sum(s["robots_fetches"] for s in stats) == 2


def test_politeness_enforces_min_interval():
    pool = PolitenessPool(num_shards=1, delay_scale=1.0)
    view = pool.task_view()
    host = "host-0.example"
    delay = crawl_delay_ms(host) / 1000.0
    n = 4
    allowed, wait = view.schedule([host] * n, [f"/img{i:08d}" for i in (1, 3, 4, 6)],
                                  np.ones(n), np.arange(n))
    kept = np.sort(wait[allowed])
    if delay > 0:
        gaps = np.diff(kept)
        assert (gaps >= delay * 0.99).all()   # never violates per-host min-interval
    else:
        assert (kept == 0).all()


def test_fetch_stage_enforces_slot_gaps_wall_clock(small_corpus):
    """The FETCH STAGE (not just the shard scheduler) must actually wait out
    each politeness slot: its batching window may never coalesce distinct
    slots of a crawl-delayed host into back-to-back fetches.  Regression for
    the 50 ms coalescing window that silently merged 50 ms crawl-delay
    slots."""
    import time

    import numpy as np
    import pyarrow as pa

    from weaver_ray.functions.canonicalize import host_batch, url_hash_batch
    from weaver_ray.schema import FRONTIER_SCHEMA
    from weaver_ray.stages.fetch import FetchStage
    from weaver_ray.state.robots import crawl_delay_ms, host_fully_blocked

    # pick a host with the 50 ms crawl-delay class that is not fully blocked
    host_i = next(
        i for i in range(64)
        if crawl_delay_ms(f"host-{i}.example") == 50
        and not host_fully_blocked(f"host-{i}.example")
    )
    # URLs must LIVE on that host (url_of is hash-assigned): pick corpus ids
    from weaver_ray.sources.corpus import host_index, image_id_of, url_of

    ids = [i for i in range(1000) if host_index(image_id_of(i)) == host_i][:4]
    assert len(ids) == 4, "fixture host unexpectedly sparse"
    urls = [url_of(image_id_of(i)) for i in ids]
    n = len(urls)
    frontier = pa.table(
        {
            "url": pa.array(urls), "url_canon": pa.array(urls),
            "url_hash": pa.array(url_hash_batch(urls), pa.uint64()),
            "host": pa.array(host_batch(urls)),
            "depth": pa.array(np.zeros(n, np.int32)),
            "url_type": pa.array(["product"] * n),
            "priority": pa.array(np.ones(n, np.float32)),
            "seq": pa.array(np.arange(n, dtype=np.int64)),
            "round": pa.array(np.zeros(n, np.int32)),
            "parent_hash": pa.array(np.zeros(n, np.uint64)),
        },
        schema=FRONTIER_SCHEMA,
    )
    from weaver_ray.state.politeness import PolitenessPool

    pool = PolitenessPool(num_shards=1, delay_scale=1.0)
    stage = FetchStage(small_corpus, pool.task_view())
    t0 = time.monotonic()
    out = stage(frontier)
    elapsed = time.monotonic() - t0
    n_ok = out.filter(pa.compute.equal(out.column("fetch_status"), "ok")).num_rows
    assert n_ok >= 3
    # k fetches on one 50 ms-delay host need >= (k-1) * 50 ms of wall time
    assert elapsed >= (n_ok - 1) * 0.050 * 0.95, (elapsed, n_ok)


def test_politeness_priority_order():
    pool = PolitenessPool(num_shards=1, delay_scale=1.0)
    view = pool.task_view()
    host = "host-0.example"
    prio = np.array([0.1, 1.0, 0.5])
    allowed, wait = view.schedule([host] * 3, ["/img00000001"] * 3, prio, np.arange(3))
    # highest priority row gets the earliest slot
    assert wait[1] <= wait[2] <= wait[0]


def test_host_shard_routing_stable():
    hosts = [f"host-{i}.example" for i in range(64)]
    a = host_shard_of(hosts, 8)
    b = host_shard_of(list(hosts), 8)
    assert (a == b).all()


def test_politeness_retry_batch_memo_absolute_slots():
    """A retried fetch batch (same batch_key) must get the ORIGINAL
    absolute slots back: identical allowed mask, waits that only SHRINK
    with elapsed wall time (never restart the full delay), and no second
    advance of the host clock or counters (ADVICE r3: retry over-wait)."""
    pool = PolitenessPool(num_shards=1, delay_scale=1.0)
    view = pool.task_view()
    host = "host-9.example"
    assert crawl_delay_ms(host) > 0  # fixture host-9 has a real delay
    n = 3
    paths = [f"/img{i:08d}" for i in (1, 3, 4)]
    t0 = time.monotonic()
    a1, w1 = view.schedule([host] * n, paths, np.ones(n), np.arange(n),
                           batch_key=(0, 0))
    s1 = pool.stats()[0]
    time.sleep(0.05)
    a2, w2 = view.schedule([host] * n, paths, np.ones(n), np.arange(n),
                           batch_key=(0, 0))
    elapsed = time.monotonic() - t0
    s2 = pool.stats()[0]
    np.testing.assert_array_equal(a1, a2)
    # counters unchanged: the retry did not advance the host clock again
    assert s2["scheduled_total"] == s1["scheduled_total"]
    assert s2["denied_total"] == s1["denied_total"]
    # absolute slots: the retry waits only the REMAINING time
    assert (w2 <= w1 + 1e-9).all()
    assert (w1[a1] - w2[a2] <= elapsed + 1e-9).all()


def test_politeness_restore_routes_by_shard_id():
    """restore_shards must route each serialized state to the shard whose
    id it carries — a shuffled state list restores identically (ADVICE
    r3: restore by position)."""
    pool = PolitenessPool(num_shards=3, delay_scale=0.0)
    view = pool.task_view()
    hosts = [f"host-{i}.example" for i in range(12)]
    view.schedule(hosts, ["/img00000001"] * 12, np.ones(12), np.arange(12))
    want = {s["shard_id"]: (s["hosts_cached"], s["robots_fetches"],
                            s["denied_total"], s["scheduled_total"])
            for s in pool.stats()}
    assert len({v for v in want.values()}) > 1  # shards genuinely differ

    pool2 = PolitenessPool(num_shards=3, delay_scale=0.0)
    pool2.restore_shards(list(reversed(pool.serialize_shards())))
    got = {s["shard_id"]: (s["hosts_cached"], s["robots_fetches"],
                           s["denied_total"], s["scheduled_total"])
           for s in pool2.stats()}
    assert got == want


def test_seen_randomized_round_retry_model():
    """Randomized (round, batch) presentations vs a pure-python model of the
    exactly-once contract: a hash survives iff it is globally new, or it was
    already a survivor EARLIER in the same round (a retried task
    re-presenting its insert; within-batch duplicates stay first-wins).

    Exact mode must equal the model bit-for-bit.  Production mode (cuckoo
    shards + per-shard bloom snapshots published at round barriers) is
    allowed to wrongly DROP (counted FP budget) but must (a) never admit a
    hash in two different rounds, (b) admit only model-admissible hashes,
    and (c) be retry-deterministic: re-presenting the identical batch within
    the same round returns the identical survivor mask.

    Batches are unique-per-hash, matching the engine's documented
    precondition (a round's frontier is unique per canon — barrier dedup;
    seen.py): a hash presented twice in one round is BY CONTRACT a retried
    task, so within-batch duplicates are out of contract and the retry
    rescue is free to admit them."""
    rng = np.random.default_rng(777)
    exact = SeenSet(num_shards=3, capacity_per_shard=8192, exact=True)
    prod = SeenSet(num_shards=3, capacity_per_shard=8192, exact=False,
                   use_bloom=True, production=True)
    universe = _keys(800, 42)
    global_seen: set[int] = set()
    this_round_survivors: set[int] = set()
    prod_admit_round: dict[int, int] = {}
    model_admitted: set[int] = set()
    cur_round = 0
    for step in range(40):
        if rng.random() < 0.35 and step:
            cur_round += 1
            this_round_survivors = set()
            exact.publish_blooms()
            prod.publish_blooms()
        batch = rng.choice(universe, size=int(rng.integers(1, 60)),
                           replace=False).astype(np.uint64)
        # model: decide against the PRE-batch retry set (matches the shard,
        # which folds the batch's survivors into this_round only at the end)
        pre = set(this_round_survivors)
        want = np.zeros(len(batch), dtype=bool)
        for i, h in enumerate(batch.tolist()):
            if h not in global_seen:
                global_seen.add(h)
                model_admitted.add(h)
                want[i] = True
            elif h in pre:
                want[i] = True
        this_round_survivors.update(batch[want].tolist())

        got_exact, _ = exact.filter_new(batch, round=cur_round)
        assert np.array_equal(got_exact, want), f"exact mode != model at step {step}"

        got_prod, _ = prod.filter_new(batch, round=cur_round)
        for i, h in enumerate(batch.tolist()):
            if got_prod[i]:
                assert h in model_admitted or h in pre, \
                    "production admitted a hash the model never would"
                first = prod_admit_round.setdefault(h, cur_round)
                assert first == cur_round, \
                    f"hash admitted in round {first} AND round {cur_round}"
        # (c) simulated task retry: identical batch, same round, same mask
        retry, _ = prod.filter_new(batch, round=cur_round)
        assert np.array_equal(retry, got_prod), f"retry not deterministic at step {step}"
        retry_exact, _ = exact.filter_new(batch, round=cur_round)
        assert np.array_equal(retry_exact, got_exact)
        # the retry admitted nothing new in the model either: fold survivors
        # (already in this_round_survivors — update is idempotent)
    assert set(prod_admit_round) <= model_admitted


def test_politeness_randomized_virtual_clock_model(monkeypatch):
    """Deterministic model check of the scheduling arithmetic (no wall-clock
    tolerance anywhere): run a local PolitenessShard instance against a
    pure-python replay on a PATCHED monotonic clock, over randomized
    sequences of schedule calls — random hosts/paths/priorities/seqs, random
    clock advances, interleaved batch-key retries at later fake times.

    The model: per host, robots decisions gate rows; kept rows take slots
    base + delay*j in (priority desc, seq asc) order where base =
    max(next_free, now); next_free advances to base + delay*k; a re-presented
    batch_key returns the ORIGINAL allowed mask and waits of
    max(0, original_slot - now).  Clock accumulation ACROSS calls and the
    memo's absolute-slot semantics are exactly pinned."""
    from weaver_ray.state import politeness as pol

    fake = {"t": 1000.0}
    monkeypatch.setattr(pol.time, "monotonic", lambda: fake["t"])

    cls = pol.PolitenessShard.__ray_metadata__.modified_class
    shard = cls(shard_id=0, delay_scale=1.0)

    from weaver_ray.state.robots import RobotsRules, crawl_delay_ms, robots_body

    rng = np.random.default_rng(2024)
    hosts_pool = [f"host-{k}.example" for k in (0, 1, 3, 7, 9)]  # mix of
    # zero-delay, suffix-blocked, 1000ms, fully-blocked and 200ms hosts
    model_next_free: dict[str, float] = {}
    model_rules = {h: RobotsRules(robots_body(h)) for h in hosts_pool}
    model_delay = {h: crawl_delay_ms(h) / 1000.0 for h in hosts_pool}
    memo: dict[tuple, tuple[np.ndarray, np.ndarray]] = {}
    cur_round = 0

    for step in range(60):
        fake["t"] += float(rng.uniform(0.0, 1.5))
        if rng.random() < 0.2:
            cur_round += 1  # advancing the round clears the engine memo
            memo.clear()
        if memo and rng.random() < 0.3:
            # retry an earlier batch of THIS round at a later fake time
            key = list(memo)[int(rng.integers(0, len(memo)))]
            h, p, pr, sq, want_allowed, slots = memo[key]
            got = shard.schedule(h, p, pr, sq, batch_key=key)
            assert np.array_equal(got["allowed"], want_allowed), f"retry allowed @ {step}"
            assert np.allclose(got["wait_s"],
                               np.maximum(0.0, slots - fake["t"]),
                               rtol=0, atol=1e-12), f"retry waits @ {step}"
            continue
        n = int(rng.integers(1, 12))
        hosts = [hosts_pool[i] for i in rng.integers(0, len(hosts_pool), n)]
        paths = [f"/img{int(v):08d}" for v in rng.integers(0, 200, n)]
        prio = rng.integers(1, 4, n).astype(np.float32)
        seqs = np.arange(step * 100, step * 100 + n, dtype=np.int64)
        key = (cur_round, int(seqs[0]), 0)

        # --- model replay
        now = fake["t"]
        want_allowed = np.ones(n, dtype=bool)
        want_wait = np.zeros(n, dtype=np.float64)
        slots_abs = np.full(n, now, dtype=np.float64)
        for h in sorted(set(hosts)):
            idx = [i for i in range(n) if hosts[i] == h]
            idx.sort(key=lambda i: (-prio[i], seqs[i]))
            kept = []
            for i in idx:
                ok = model_rules[h].allowed(paths[i])
                want_allowed[i] = ok
                if ok:
                    kept.append(i)
            base = max(model_next_free.get(h, 0.0), now)
            for j, i in enumerate(kept):
                slots_abs[i] = base + model_delay[h] * j
                want_wait[i] = slots_abs[i] - now
            if kept:
                model_next_free[h] = base + model_delay[h] * len(kept)

        got = shard.schedule(hosts, paths, prio, seqs, batch_key=key)
        assert np.array_equal(got["allowed"], want_allowed), f"allowed @ step {step}"
        assert np.allclose(got["wait_s"], want_wait, rtol=0, atol=1e-9), \
            f"waits @ step {step}: {got['wait_s']} != {want_wait}"
        memo[key] = (hosts, paths, prio, seqs, want_allowed, slots_abs)
