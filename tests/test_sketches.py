"""Bloom/cuckoo property tests (SURVEY.md §5: FP <= bound, zero FN,
insert/contains/delete under load)."""

import numpy as np

from weaver_ray.functions.sketches import BloomFilter, CuckooFilter


def _keys(n, seed=0):
    return np.random.default_rng(seed).integers(0, 2**63, n, dtype=np.int64).astype(np.uint64)


def test_bloom_no_false_negatives_and_bounded_fp():
    keys = _keys(20_000, 1)
    other = _keys(20_000, 2)
    bf = BloomFilter(capacity=20_000)
    bf.add(keys)
    assert bf.maybe_contains(keys).all()                 # zero false negatives
    fp = bf.maybe_contains(other).mean()
    assert fp < 0.03                                     # ~1% design point


def test_bloom_serialize_roundtrip():
    keys = _keys(1000)
    bf = BloomFilter(1000)
    bf.add(keys)
    bf2 = BloomFilter.deserialize(bf.serialize())
    assert bf2.maybe_contains(keys).all()


def test_cuckoo_insert_contains_delete():
    keys = _keys(10_000, 3)
    cf = CuckooFilter(capacity=16_384)
    assert cf.insert(keys) == len(keys)
    assert cf.contains(keys).all()                       # zero false negatives
    other = _keys(10_000, 4)
    assert cf.contains(other).mean() < 0.005             # 16-bit fp -> tiny FP
    assert cf.delete(keys[:100]).all()
    assert not cf.contains(keys[:100]).any() or cf.contains(keys[:100]).mean() < 0.01


def test_cuckoo_contains_or_insert_first_wins():
    cf = CuckooFilter(capacity=1024)
    keys = np.array([7, 7, 9, 7, 9, 11], dtype=np.uint64)
    new = cf.contains_or_insert(keys)
    assert new.tolist() == [True, False, True, False, False, True]
    again = cf.contains_or_insert(keys)
    assert not again.any()


def test_cuckoo_under_high_load():
    cap = 4096
    cf = CuckooFilter(capacity=cap)
    keys = _keys(int(cap * 0.9), 5)
    ok = cf.insert(keys)
    assert ok >= len(keys) * 0.99
    assert cf.load_factor <= 0.95
    assert cf.contains(keys[:ok]).all()


def test_cuckoo_serialize_roundtrip():
    cf = CuckooFilter(1024)
    keys = _keys(500, 6)
    cf.insert(keys)
    cf2 = CuckooFilter.deserialize(cf.serialize())
    assert cf2.contains(keys).all()
    assert cf2.count == cf.count


def test_hll_accuracy_and_merge():
    from weaver_ray.functions.sketches import HyperLogLog

    keys = _keys(50_000, 9)
    h = HyperLogLog()
    h.add(keys)
    uniq = len(np.unique(keys))
    assert abs(h.estimate() - uniq) / uniq < 0.05
    # merge == union
    a, b = HyperLogLog(), HyperLogLog()
    a.add(keys[:30_000])
    b.add(keys[20_000:])
    a.merge(b)
    assert abs(a.estimate() - uniq) / uniq < 0.05
    # serialize roundtrip
    c = HyperLogLog.deserialize(a.serialize())
    assert c.estimate() == a.estimate()


def test_hll_small_range_linear_counting():
    from weaver_ray.functions.sketches import HyperLogLog

    h = HyperLogLog()
    h.add(np.arange(50, dtype=np.uint64))
    assert abs(h.estimate() - 50) <= 5


def test_hll_merge_register_identical_to_union_build():
    """merge() must equal building one sketch over the union EXACTLY at the
    register level (max of per-key ranks is associative/commutative), not
    just within estimate tolerance — the distributed per-batch-sketch +
    merge aggregation pattern relies on this identity."""
    from weaver_ray.functions.sketches import HyperLogLog

    keys = _keys(30_000, 11)
    a, b, u = HyperLogLog(), HyperLogLog(), HyperLogLog()
    a.add(keys[:18_000])
    b.add(keys[15_000:])
    u.add(keys)
    a.merge(b)
    assert np.array_equal(a.registers, u.registers)


def test_cuckoo_randomized_signature_model_equivalence():
    """Cuckoo filter == multiset of (fingerprint, bucket-pair) signatures.

    Partial-key kicking preserves a stored entry's signature (the alt index
    is an involution given the fingerprint: alt(alt(i, fp), fp) == i), so the
    filter's observable behavior is EXACTLY a signature multiset plus the
    victim slot: contains(k) iff the multiset holds sig(k); delete removes
    one copy and returns whether one existed; count is the multiset size;
    inserts fail (counted) only while the victim slot is occupied.  Drive
    randomized op sequences at over-capacity load — inserts, deletes,
    first-wins batches, mid-sequence checkpoint round-trips — and verify
    every response against that model.  This exercises the victim-slot and
    insert-failure paths the crawl's over-full-shard accounting relies on,
    deterministically (no FP-rate tolerance anywhere)."""
    from collections import Counter

    def sig(cf, k):
        fp, i1 = cf._fp_and_index(np.array([k], np.uint64))
        a, f = int(i1[0]), int(fp[0])
        b = int(cf._alt_index(a, f))
        return (f, min(a, b), max(a, b))

    for seed in range(8):
        rng = np.random.default_rng(5200 + seed)
        cf = CuckooFilter(capacity=24)  # 8 buckets x 4 slots: overfills fast
        sigs = Counter()
        universe = rng.integers(1, 2**63, size=60, dtype=np.uint64)
        for step in range(300):
            op = int(rng.integers(0, 10))
            if op <= 4:  # single insert (duplicates allowed: multiset)
                k = int(rng.choice(universe))
                s = sig(cf, k)
                fails_before = cf.insert_failures
                ok = cf.insert(np.array([k], np.uint64))
                if ok:
                    sigs[s] += 1
                else:
                    assert cf.insert_failures == fails_before + 1
                    assert cf.victim is not None
            elif op <= 6:  # delete: True iff a matching signature is stored
                k = int(rng.choice(universe))
                s = sig(cf, k)
                got = bool(cf.delete(np.array([k], np.uint64))[0])
                assert got == (sigs[s] > 0)
                if got:
                    sigs[s] -= 1
            elif op <= 8:  # first-wins batch, model updated in presentation order
                keys = rng.choice(universe, size=int(rng.integers(1, 12))).astype(np.uint64)
                fails_before = cf.insert_failures
                res = cf.contains_or_insert(keys)
                for j, k in enumerate(keys.tolist()):
                    s = sig(cf, int(k))
                    if sigs[s] > 0:
                        assert not res[j]
                    elif res[j]:
                        sigs[s] += 1
                    else:  # refused novel key: only legal as a counted failure
                        assert cf.insert_failures > fails_before
            else:  # checkpoint round-trip mid-sequence must be bit-identical
                clone = CuckooFilter.deserialize(cf.serialize())
                assert np.array_equal(clone.table, cf.table)
                assert clone.count == cf.count and clone.victim == cf.victim
                assert clone.insert_failures == cf.insert_failures
                cf = clone
            assert cf.count == sum(sigs.values())
        got = cf.contains(universe)
        want = np.array([sigs[sig(cf, int(k))] > 0 for k in universe.tolist()])
        assert np.array_equal(got, want)
