"""Property tests (hypothesis) for the LPT fetch partitioner and the
frontier barrier helpers."""

import numpy as np
import pyarrow as pa
from hypothesis import given, settings
from hypothesis import strategies as st

from weaver_ray.functions.canonicalize import url_hash_batch
from weaver_ray.stages.parse import assign_seq, dedup_within_round, partition_for_fetch


def _frontier(hosts: list[str], prios: list[float] | None = None) -> pa.Table:
    n = len(hosts)
    urls = [f"http://{h}/p{i}" for i, h in enumerate(hosts)]
    return pa.table(
        {
            "url": pa.array(urls),
            "url_canon": pa.array(urls),
            "url_hash": pa.array(url_hash_batch(urls), pa.uint64()),
            "host": pa.array(hosts),
            "depth": pa.array(np.zeros(n, np.int32)),
            "url_type": pa.array(["product"] * n),
            "priority": pa.array(
                np.asarray(prios if prios is not None else np.ones(n), np.float32)),
            "seq": pa.array(np.arange(n, dtype=np.int64)),
            "round": pa.array(np.zeros(n, np.int32)),
            "parent_hash": pa.array(np.zeros(n, np.uint64)),
        }
    )


@settings(max_examples=30, deadline=None)
@given(
    st.lists(st.sampled_from([f"h{i}.x" for i in range(12)]), min_size=1, max_size=400),
    st.integers(min_value=1, max_value=16),
)
def test_partitioner_properties(hosts, nparts):
    t = _frontier(hosts)
    parts = partition_for_fetch(t, nparts)
    # coverage: every row lands in exactly one partition
    total = sum(p.num_rows for p in parts)
    assert total == t.num_rows
    all_urls = sorted(u for p in parts for u in p.column("url_canon").to_pylist())
    assert all_urls == sorted(t.column("url_canon").to_pylist())
    # balance: no partition exceeds the cap (+cap slack when fewer chunks than parts)
    cap = -(-t.num_rows // nparts)
    assert max(p.num_rows for p in parts) <= 2 * cap
    # determinism
    parts2 = partition_for_fetch(t, nparts)
    assert all(a.equals(b) for a, b in zip(parts, parts2))


@settings(max_examples=30, deadline=None)
@given(st.lists(st.integers(min_value=0, max_value=40), min_size=1, max_size=150))
def test_barrier_dedup_and_seq_properties(ids):
    hosts = [f"h{i % 5}.x" for i in ids]
    # duplicate canons on purpose: url index = ids value
    urls = [f"http://{h}/p{v}" for h, v in zip(hosts, ids)]
    n = len(urls)
    t = _frontier(hosts)
    t = t.set_column(1, "url_canon", pa.array(urls))
    deduped = dedup_within_round(t)
    canons = deduped.column("url_canon").to_pylist()
    assert len(canons) == len(set(canons))          # no within-round dups
    assert set(canons) == set(urls)                 # nothing lost
    seqd = assign_seq(deduped)
    seqs = seqd.column("seq").to_numpy(zero_copy_only=False)
    assert sorted(seqs.tolist()) == list(range(len(canons)))  # dense 0..n-1
    # order contract: (priority desc, canon asc)
    prio = seqd.column("priority").to_numpy(zero_copy_only=False)
    cs = seqd.column("url_canon").to_pylist()
    order = np.argsort(seqs)
    pairs = [(-prio[i], cs[i]) for i in order]
    assert pairs == sorted(pairs)


def test_edge_empty_frontier():
    from weaver_ray.schema import FRONTIER_SCHEMA

    t = FRONTIER_SCHEMA.empty_table()
    assert partition_for_fetch(t, 8) == []
    assert dedup_within_round(t).num_rows == 0
    assert assign_seq(t).num_rows == 0


def test_edge_all_duplicate_round():
    hosts = ["h1.x"] * 50
    t = _frontier(hosts)
    # force every row to the same canon
    t = t.set_column(1, "url_canon", pa.array(["http://h1.x/same"] * 50))
    d = dedup_within_round(t)
    assert d.num_rows == 1
    s = assign_seq(d)
    assert s.column("seq").to_pylist() == [0]


def test_edge_single_host_frontier():
    hosts = ["only.x"] * 200
    t = _frontier(hosts)
    parts = partition_for_fetch(t, 8)
    # a single host larger than cap MUST split (the hot-host salt)
    assert len(parts) > 1
    assert sum(p.num_rows for p in parts) == 200
    cap = -(-200 // 8)
    assert max(p.num_rows for p in parts) <= 2 * cap


@settings(max_examples=40, deadline=None)
@given(
    st.lists(st.sampled_from([f"h{i}.x" for i in range(10)]),
             min_size=1, max_size=600),
    st.integers(min_value=1, max_value=32),
)
def test_lpt_plan_matches_router_balance(hosts, nparts):
    """Regression (round 3): the LPT plan's assumed chunk sizes must match
    what _route_block actually delivers.  Two generations of this bug:
    (1) the plan assumed (cap,...,cap,remainder) chunks while the router
    split each host evenly (measured: 'balanced' 214-row parts spanning
    0-696 rows); (2) the router striped by global ``seq % n_chunks``,
    which is only even when a host's seqs are contiguous — hypothesis
    found an interleaving (a host's rows all on even seqs) that landed a
    host's whole round on one chunk.  _route_block now routes by exact
    within-host rank (offsets from per-block host counts + stable local
    rank), so routed loads must equal the planned LPT loads EXACTLY."""
    from collections import Counter

    from weaver_ray.pipelines.crawl import _lpt_plan

    host_counts = Counter(hosts)
    plan, spread = _lpt_plan(dict(host_counts), nparts)

    # exact-rank routing, as _route_block computes it (offset 0 + stable
    # within-block cumcount; row ORDER must not matter — any interleaving
    # gives each host the dense ranks 0..cnt-1)
    seen: Counter = Counter()
    loads: Counter = Counter()
    for h in hosts:
        loads[plan[(h, seen[h] % spread[h])]] += 1
        seen[h] += 1

    # planned loads: even-split chunk sizes packed by the same LPT
    planned: Counter = Counter()
    for (h, ci), p in plan.items():
        cnt, n_chunks = host_counts[h], spread[h]
        base, rem = divmod(cnt, n_chunks)
        planned[p] += base + (1 if ci < rem else 0)

    assert loads == {p: c for p, c in planned.items() if c}
    assert sum(loads.values()) == len(hosts)
    # LPT quality floor: chunks are <= cap by construction, so no part
    # can exceed twice the even share
    cap = -(-len(hosts) // nparts)
    assert max(loads.values()) <= 2 * cap


def test_rendezvous_minimal_movement(ray_session):
    """The HRW contract: dropping the highest shard remaps ONLY the keys
    that lived on it — every other key keeps its shard — and the weight
    column is each key's winning md5 prefix (independently recomputed)."""
    import hashlib

    from weaver_ray.pipelines.relational import rendezvous_assign

    sf = "/root/testdata/sf0.001"
    a8 = (rendezvous_assign(sf, n_shards=8).to_pandas()
          .set_index("doc_id").sort_index())
    a7 = (rendezvous_assign(sf, n_shards=7).to_pandas()
          .set_index("doc_id").sort_index())
    assert len(a8) == len(a7) == 500
    moved = a8["shard"] != a7["shard"]
    # exactly the shard-7 keys move; the rest stay put
    assert (a8.loc[moved, "shard"] == 7).all()
    assert (a8["shard"] == 7).sum() == int(moved.sum())
    # balance: every shard is populated, none dominates wildly
    sizes = a8["shard"].value_counts()
    assert len(sizes) == 8 and sizes.min() >= 25
    # weight replay for a few keys
    for did in list(a8.index[:10]):
        row = a8.loc[did]
        ws = [hashlib.md5(f"{did}|{s}".encode()).hexdigest()[:16]
              for s in range(8)]
        assert int(row["shard"]) == max(range(8), key=lambda s: (ws[s], -s))
        assert row["weight"] == ws[int(row["shard"])]
