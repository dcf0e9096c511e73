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
