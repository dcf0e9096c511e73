"""Probabilistic membership sketches: bloom + cuckoo filters (numpy-backed).

These are the engine's replacement for the reference's exact, in-process
visited sets (colly's per-collector seen set — which, note, was recreated per
message, so cross-message dedup never actually worked; SURVEY.md §3.1).  The
north rule mandates a sharded cuckoo-filter URL-seen set with a bloom
pre-filter per partition.

Both filters serialize to plain numpy arrays -> checkpointable per round.
"""

from __future__ import annotations

import numpy as np

from .. import config

_MIX = np.uint64(0x9E3779B97F4A7C15)


def _splitmix64(x: np.ndarray) -> np.ndarray:
    """Deterministic 64-bit mixer (public splitmix64 constants)."""
    x = (x + _MIX).astype(np.uint64)
    x = ((x ^ (x >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)).astype(np.uint64)
    x = ((x ^ (x >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)).astype(np.uint64)
    return (x ^ (x >> np.uint64(31))).astype(np.uint64)


class BloomFilter:
    """Vectorized bloom filter over uint64 keys.

    ~1% false-positive rate at 10 bits/key with 7 hash probes (double
    hashing: idx_j = h1 + j*h2 mod m). Zero false negatives.
    """

    def __init__(self, capacity: int, bits_per_key: int = config.BLOOM_BITS_PER_KEY,
                 num_hashes: int = config.BLOOM_NUM_HASHES):
        self.m = max(64, int(capacity * bits_per_key))
        self.k = num_hashes
        self.bits = np.zeros((self.m + 63) // 64, dtype=np.uint64)
        self.count = 0

    def _indices(self, keys: np.ndarray) -> np.ndarray:
        h1 = keys.astype(np.uint64)
        h2 = _splitmix64(h1) | np.uint64(1)
        j = np.arange(self.k, dtype=np.uint64)[:, None]
        return ((h1[None, :] + j * h2[None, :]) % np.uint64(self.m)).astype(np.uint64)

    def add(self, keys: np.ndarray) -> None:
        if len(keys) == 0:
            return
        idx = self._indices(keys).ravel()
        np.bitwise_or.at(self.bits, (idx >> np.uint64(6)).astype(np.int64),
                         np.uint64(1) << (idx & np.uint64(63)))
        self.count += len(keys)

    def maybe_contains(self, keys: np.ndarray) -> np.ndarray:
        """bool[n]: False = definitely not present; True = maybe present."""
        if len(keys) == 0:
            return np.zeros(0, dtype=bool)
        idx = self._indices(keys)
        word = self.bits[(idx >> np.uint64(6)).astype(np.int64)]
        hit = (word >> (idx & np.uint64(63))) & np.uint64(1)
        return hit.all(axis=0)

    def serialize(self) -> dict:
        return {"m": self.m, "k": self.k, "bits": self.bits, "count": self.count}

    @classmethod
    def deserialize(cls, d: dict) -> "BloomFilter":
        bf = cls.__new__(cls)
        bf.m, bf.k, bf.bits, bf.count = int(d["m"]), int(d["k"]), np.asarray(d["bits"], np.uint64), int(d["count"])
        return bf


class HyperLogLog:
    """Dense HLL (Flajolet et al. '07 + the standard small-range correction)
    over uint64 keys; p=12 -> 4096 registers, ~1.6% relative error.
    Mergeable by register-max — the 'emit one sketch per batch, merge in a
    tiny stage' aggregation pattern (ray_guide)."""

    def __init__(self, p: int = 12):
        self.p = p
        self.m = 1 << p
        self.registers = np.zeros(self.m, dtype=np.uint8)

    def add(self, keys: np.ndarray) -> None:
        if len(keys) == 0:
            return
        h = _splitmix64(np.asarray(keys, dtype=np.uint64))
        idx = (h >> np.uint64(64 - self.p)).astype(np.int64)
        # sentinel bit keeps rank bounded at 64-p+1
        rest = (h << np.uint64(self.p)) | (np.uint64(1) << np.uint64(self.p - 1))
        # vectorized bit-width via 6 halving steps (log2 through float64 is
        # lossy above 2^53); rank = leading zeros + 1 = 64 - width + 1
        width = np.full(len(h), 64, dtype=np.int64)
        cur = rest.copy()
        for s in (32, 16, 8, 4, 2, 1):
            mask = cur >= (np.uint64(1) << np.uint64(s))
            width = np.where(mask, width, width - s)
            cur = np.where(mask, cur >> np.uint64(s), cur)
        rank = (65 - width).astype(np.uint8)
        np.maximum.at(self.registers, idx, rank)

    def merge(self, other: "HyperLogLog") -> None:
        np.maximum(self.registers, other.registers, out=self.registers)

    def estimate(self) -> float:
        m = self.m
        alpha = 0.7213 / (1 + 1.079 / m)
        est = alpha * m * m / np.sum(np.exp2(-self.registers.astype(np.float64)))
        zeros = int((self.registers == 0).sum())
        if est <= 2.5 * m and zeros:
            est = m * np.log(m / zeros)  # linear counting, small range
        return float(est)

    def serialize(self) -> dict:
        return {"p": self.p, "registers": self.registers}

    @classmethod
    def deserialize(cls, d: dict) -> "HyperLogLog":
        h = cls(int(d["p"]))
        h.registers = np.asarray(d["registers"], np.uint8).copy()
        return h


class CuckooFilter:
    """4-way bucketed cuckoo filter, 16-bit fingerprints, partial-key cuckoo
    hashing (Fan et al., "Cuckoo Filter: Practically Better Than Bloom",
    CoNEXT'14 — public paper; implementation is original).

    Supports contains / insert / delete; ~0.01%–0.1% FP at 16-bit fps.
    """

    def __init__(self, capacity: int, bucket_size: int = config.CUCKOO_BUCKET_SIZE,
                 max_kicks: int = config.CUCKOO_MAX_KICKS, seed: int = 7):
        nb = 1
        while nb * bucket_size < capacity / 0.9:
            nb <<= 1
        self.nb = nb
        self.bucket_size = bucket_size
        self.max_kicks = max_kicks
        self.table = np.zeros((nb, bucket_size), dtype=np.uint16)
        self.count = 0
        # eviction choices are CONTENT-DERIVED (mixed from the fingerprint
        # and kick index), not drawn from a stateful RNG: a filter restored
        # from a checkpoint then behaves identically to one that never
        # stopped, which RNG-stream state cannot provide without
        # serializing the generator
        # victim slot (standard cuckoo-filter practice, Fan et al. §4): when
        # an insert exhausts max_kicks the evicted fingerprint parks here and
        # stays queryable instead of silently vanishing — contains() never
        # false-negatives on a previously-inserted key
        self.victim: tuple[int, int] | None = None  # (bucket_index, fp)
        self.insert_failures = 0  # inserts refused because victim slot was full

    def _fp_and_index(self, keys: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
        h = _splitmix64(keys.astype(np.uint64))
        fp = ((h & np.uint64(0xFFFF)).astype(np.uint32) % 0xFFFF + 1).astype(np.uint16)  # never 0
        i1 = ((h >> np.uint64(16)) % np.uint64(self.nb)).astype(np.int64)
        return fp, i1

    def _alt_index(self, i: np.ndarray | int, fp: np.ndarray | int) -> np.ndarray | int:
        scalar = np.isscalar(i) or np.ndim(i) == 0
        mix = _splitmix64(np.atleast_1d(np.asarray(fp, dtype=np.uint64)))
        alt = (np.atleast_1d(np.asarray(i, dtype=np.uint64)) ^ mix) % np.uint64(self.nb)
        out = alt.astype(np.int64)
        return int(out[0]) if scalar else out

    def _victim_hit(self, fp: np.ndarray, i1: np.ndarray, i2: np.ndarray) -> np.ndarray:
        if self.victim is None:
            return np.zeros(len(fp), dtype=bool)
        vidx, vfp = self.victim
        return (fp == np.uint16(vfp)) & ((i1 == vidx) | (i2 == vidx))

    def contains(self, keys: np.ndarray) -> np.ndarray:
        if len(keys) == 0:
            return np.zeros(0, dtype=bool)
        fp, i1 = self._fp_and_index(keys)
        i2 = np.asarray(self._alt_index(i1, fp), dtype=np.int64).reshape(len(keys))
        in1 = (self.table[i1] == fp[:, None]).any(axis=1)
        in2 = (self.table[i2] == fp[:, None]).any(axis=1)
        return in1 | in2 | self._victim_hit(fp, i1, i2)

    def _insert_one(self, fp: int, i1: int, i2: int) -> bool:
        for idx in (i1, i2):
            row = self.table[idx]
            empty = np.flatnonzero(row == 0)
            if len(empty):
                row[empty[0]] = fp
                self.count += 1
                return True
        # evict — but if the victim slot is already occupied the filter is
        # full: fail FAST, before any kicking, so no previously-inserted
        # fingerprint is displaced and dropped (the only lost key is the new
        # one, and that loss is counted)
        if self.victim is not None:
            self.insert_failures += 1
            return False
        idx = i1 if (fp & 1) else i2
        cur = np.uint16(fp)
        for kick in range(self.max_kicks):
            h = (int(cur) * 0x9E3779B1 + kick * 0x85EBCA77) & 0xFFFFFFFF
            slot = (h >> 16) % self.bucket_size
            cur, self.table[idx][slot] = self.table[idx][slot], cur
            idx = int(self._alt_index(idx, int(cur)))
            row = self.table[idx]
            empty = np.flatnonzero(row == 0)
            if len(empty):
                row[empty[0]] = cur
                self.count += 1
                return True
        # over-full: park the last evicted fingerprint in the victim slot so
        # it remains queryable (no silent false negative); only when the
        # victim slot is already occupied does the insert fail, and that
        # failure is COUNTED so over-full shards are observable
        self.victim = (int(idx), int(cur))
        self.count += 1
        return True

    def insert(self, keys: np.ndarray) -> int:
        """Insert all keys (idempotence NOT checked here — pair with
        contains for contains_or_insert). Returns #successfully inserted."""
        fp, i1 = self._fp_and_index(keys)
        i2 = np.asarray(self._alt_index(i1, fp), dtype=np.int64).reshape(len(keys))
        ok = 0
        for j in range(len(keys)):
            ok += self._insert_one(int(fp[j]), int(i1[j]), int(i2[j]))
        return ok

    def contains_or_insert(self, keys: np.ndarray) -> np.ndarray:
        """bool[n]: True = newly inserted (was absent), first-wins within the
        batch. The single authoritative dedup primitive."""
        out = np.zeros(len(keys), dtype=bool)
        if len(keys) == 0:
            return out
        fp, i1 = self._fp_and_index(keys)
        i2 = np.asarray(self._alt_index(i1, fp), dtype=np.int64).reshape(len(keys))
        for j in range(len(keys)):
            f = fp[j]
            a, b = int(i1[j]), int(i2[j])
            if (self.table[a] == f).any() or (self.table[b] == f).any():
                continue
            if self.victim is not None and self.victim[1] == int(f) \
                    and self.victim[0] in (a, b):
                continue
            out[j] = self._insert_one(int(f), a, b)
        return out

    def delete(self, keys: np.ndarray) -> np.ndarray:
        out = np.zeros(len(keys), dtype=bool)
        fp, i1 = self._fp_and_index(keys)
        i2 = np.asarray(self._alt_index(i1, fp), dtype=np.int64).reshape(len(keys))
        for j in range(len(keys)):
            for idx in (int(i1[j]), int(i2[j])):
                row = self.table[idx]
                hit = np.flatnonzero(row == fp[j])
                if len(hit):
                    row[hit[0]] = 0
                    self.count -= 1
                    out[j] = True
                    break
            else:
                if self.victim is not None and self.victim[1] == int(fp[j]) \
                        and self.victim[0] in (int(i1[j]), int(i2[j])):
                    self.victim = None
                    self.count -= 1
                    out[j] = True
        return out

    @property
    def load_factor(self) -> float:
        return self.count / (self.nb * self.bucket_size)

    def serialize(self) -> dict:
        return {"nb": self.nb, "bucket_size": self.bucket_size, "max_kicks": self.max_kicks,
                "table": self.table, "count": self.count,
                "victim": self.victim, "insert_failures": self.insert_failures}

    @classmethod
    def deserialize(cls, d: dict) -> "CuckooFilter":
        cf = cls.__new__(cls)
        cf.nb = int(d["nb"]); cf.bucket_size = int(d["bucket_size"])
        cf.max_kicks = int(d["max_kicks"])
        cf.table = np.asarray(d["table"], np.uint16).copy()
        cf.count = int(d["count"])
        v = d.get("victim")
        cf.victim = (int(v[0]), int(v[1])) if v is not None else None
        cf.insert_failures = int(d.get("insert_failures", 0))
        return cf
