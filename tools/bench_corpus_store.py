"""Micro-benchmark: CorpusStore point-lookup path vs a B-tree index.

BASELINE.json's input_hint names Lance as the storage format; pylance is
environment-blocked (no pip network — retried every round), so the corpus
facade stands in with a memory-mapped Arrow IPC file + an in-process
image_id -> row dict, and `take()` for the fetch.  This benchmark
quantifies the facade claim: the mmap+dict+take path is within a small
constant factor of (here: faster than) a real B-tree point lookup, using
sqlite3's B-tree as the stand-in for Lance's btree index.

Writes BENCH/corpus_store_microbench.json and prints one JSON line.
Run: python tools/bench_corpus_store.py [corpus_size]
"""

from __future__ import annotations

import json
import os
import sqlite3
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from weaver_ray.sources.corpus import CorpusStore, generate_corpus  # noqa: E402


def main() -> None:
    size = int(sys.argv[1]) if len(sys.argv) > 1 else 20_000
    path = generate_corpus(size)
    store = CorpusStore(path)

    # B-tree side: sqlite table keyed by image_id holding the same payloads
    db = f"/tmp/corpus_btree_{size}.sqlite"
    if not os.path.exists(db):
        con = sqlite3.connect(db)
        con.execute("CREATE TABLE corpus (image_id TEXT PRIMARY KEY, "
                    "bytes BLOB, caption TEXT, phash INTEGER)")
        t = store.table
        rows = zip(t.column("image_id").to_pylist(),
                   t.column("bytes").to_pylist(),
                   t.column("caption").to_pylist(),
                   t.column("phash").to_pylist())
        con.executemany("INSERT INTO corpus VALUES (?,?,?,?)", rows)
        con.commit()
        con.close()
    con = sqlite3.connect(db)

    rng = np.random.default_rng(7)
    all_ids = store.table.column("image_id").to_pylist()
    lookup_ids = [all_ids[i] for i in rng.integers(0, size, 4096)]
    batch = 256

    # warm both paths
    store.take_by_image_id(lookup_ids[:batch])
    con.execute("SELECT bytes FROM corpus WHERE image_id = ?",
                (lookup_ids[0],)).fetchone()

    t0 = time.perf_counter()
    for s in range(0, len(lookup_ids), batch):
        rows, found = store.take_by_image_id(lookup_ids[s:s + batch])
        assert rows.num_rows == found.sum()
    arrow_batched_us = (time.perf_counter() - t0) / len(lookup_ids) * 1e6

    t0 = time.perf_counter()
    for i in lookup_ids[:1024]:
        rows, _ = store.take_by_image_id([i])
    arrow_single_us = (time.perf_counter() - t0) / 1024 * 1e6

    t0 = time.perf_counter()
    for s in range(0, len(lookup_ids), batch):
        chunk = lookup_ids[s:s + batch]
        q = f"SELECT bytes FROM corpus WHERE image_id IN ({','.join('?' * len(chunk))})"
        got = con.execute(q, chunk).fetchall()
        assert got
    btree_batched_us = (time.perf_counter() - t0) / len(lookup_ids) * 1e6

    t0 = time.perf_counter()
    for i in lookup_ids[:1024]:
        con.execute("SELECT bytes FROM corpus WHERE image_id = ?", (i,)).fetchone()
    btree_single_us = (time.perf_counter() - t0) / 1024 * 1e6

    result = {
        "metric": "corpus point-lookup cost (us/row): feather-mmap facade vs sqlite B-tree",
        "corpus_size": size,
        "batch": batch,
        "arrow_take_batched_us_per_row": round(arrow_batched_us, 2),
        "arrow_take_single_us_per_row": round(arrow_single_us, 2),
        "btree_batched_us_per_row": round(btree_batched_us, 2),
        "btree_single_us_per_row": round(btree_single_us, 2),
        "facade_vs_btree_batched_ratio": round(arrow_batched_us / btree_batched_us, 3),
        "facade_vs_btree_single_ratio": round(arrow_single_us / btree_single_us, 3),
    }
    os.makedirs(os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "BENCH"), exist_ok=True)
    out = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "BENCH", "corpus_store_microbench.json")
    with open(out, "w") as f:
        json.dump(result, f, indent=2)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
