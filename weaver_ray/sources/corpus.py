"""Synthetic image+caption corpus — generation, storage facade, link graph.

One corpus row = one "page" reachable at one URL (the hermetic stand-in for
the live web the reference crawls with colly, src/scrapper/*Handler.go).
Everything is a deterministic function of (seed, i): same (seed, size) ->
byte-identical table (FIXTURES.md §1).

Storage facade: Lance when importable, else a directory holding
``part-*.parquet`` (for ray.data / duckdb scans) plus ``corpus.feather``
(uncompressed Arrow IPC, memory-mapped zero-copy by fetch actors — the
stand-in for Lance take-by-key).  At 100 TB the feather+dict index becomes a
Lance dataset with a btree index on image_id; the facade isolates that swap.
"""

from __future__ import annotations

import hashlib
import os
from pathlib import Path

import numpy as np
import pyarrow as pa
import pyarrow.feather as feather
import pyarrow.parquet as pq

from .. import config
from ..functions.imaging import encode_image, phash64
from ..schema import CORPUS_SCHEMA

try:  # pragma: no cover — not installed in this sandbox
    import lance

    HAVE_LANCE = True
except ImportError:
    HAVE_LANCE = False

_WORDS = [
    f"{c}{v}{c2}" for c in "btkmsrlpdn" for v in "aeiou" for c2 in ("x", "ra", "to", "mi", "ne")
]  # 250 deterministic pseudo-words


# ------------------------------------------------------------------ row functions

def row_dims(i: int) -> tuple[int, int]:
    return 32 + (i * 7) % 97, 32 + (i * 11) % 97  # (w, h) — FIXTURES.md §1


def row_fmt(i: int) -> str:
    # 20% jpeg (real baseline codec, functions/jpegcodec.py), 80% png —
    # both lossy and lossless branches of the per-row invariant execute
    return "jpeg" if i % 5 == 0 else "png"


def gen_pixels(i: int, seed: int = config.CORPUS_SEED) -> np.ndarray:
    """(h, w, 3) uint8.  Structured (coarse 8x8 blocks + row gradient) so PNG
    compresses well — random pixels would make a 100k-row corpus ~2 GB of
    incompressible bytes for no extra test value."""
    w, h = row_dims(i)
    rng = np.random.default_rng([seed, i])
    coarse = rng.integers(0, 256, size=(8, 8, 3), dtype=np.uint8)
    yi = (np.arange(h) * 8 // h).astype(np.int64)
    xi = (np.arange(w) * 8 // w).astype(np.int64)
    img = coarse[yi[:, None], xi[None, :], :].astype(np.int16)
    grad = (np.arange(h, dtype=np.int16) % 32)[:, None, None]
    return ((img + grad) % 256).astype(np.uint8)


def gen_caption(i: int, seed: int = config.CORPUS_SEED) -> str:
    rng = np.random.default_rng([seed, i, 7])
    n = int(rng.integers(4, 17))
    idx = rng.integers(0, len(_WORDS), size=n)
    return " ".join(_WORDS[j] for j in idx)


def image_id_of(i: int) -> str:
    return f"img{i:08d}"


def make_corpus_batch(indices: np.ndarray, seed: int = config.CORPUS_SEED) -> pa.Table:
    """Generate corpus rows for a batch of indices (pure; Ray-task friendly)."""
    ids, blobs, ws, hs, fmts, caps, phs = [], [], [], [], [], [], []
    for i in map(int, indices):
        px = gen_pixels(i, seed)
        blob, actual_fmt = encode_image(px, row_fmt(i))
        ids.append(image_id_of(i))
        blobs.append(blob)
        hs.append(px.shape[0])
        ws.append(px.shape[1])
        fmts.append(actual_fmt)
        caps.append(gen_caption(i, seed))
        phs.append(phash64(px))
    return pa.table(
        {
            "image_id": pa.array(ids, pa.string()),
            "bytes": pa.array(blobs, pa.large_binary()),
            "w": pa.array(ws, pa.int32()),
            "h": pa.array(hs, pa.int32()),
            "fmt": pa.array(fmts, pa.string()),
            "caption": pa.array(caps, pa.string()),
            "phash": pa.array(phs, pa.int64()),
        },
        schema=CORPUS_SCHEMA,
    )


# ------------------------------------------------------------------ URL space / link graph

_ZIPF_CUM: dict[tuple[int, float], np.ndarray] = {}


def _zipf_cum(n_hosts: int = config.N_HOSTS, s: float = config.ZIPF_S) -> np.ndarray:
    # cache keyed by BOTH parameters — a changed exponent with the same host
    # count must not silently reuse the old distribution
    key = (n_hosts, float(s))
    cum = _ZIPF_CUM.get(key)
    if cum is None:
        w = 1.0 / np.power(np.arange(1, n_hosts + 1, dtype=np.float64), s)
        cum = np.cumsum(w / w.sum())
        _ZIPF_CUM.clear()
        _ZIPF_CUM[key] = cum
    return cum


def host_index(image_id: str, n_hosts: int = config.N_HOSTS) -> int:
    """Zipf-skewed host assignment (FIXTURES.md §2): a few hosts are hot, so
    the salted-host repartition (north rule skew clause) is exercised."""
    u = int.from_bytes(hashlib.sha1(image_id.encode()).digest()[:4], "big") / 2**32
    return int(np.searchsorted(_zipf_cum(n_hosts), u))


def url_of(image_id: str, n_hosts: int = config.N_HOSTS) -> str:
    return f"http://host-{host_index(image_id, n_hosts)}.example/{image_id}"


def url_of_batch(image_ids: list[str], n_hosts: int = config.N_HOSTS) -> list[str]:
    """Vectorized ``url_of`` — bit-identical results (same sha1-prefix /2^32
    float64 division, one searchsorted over the whole batch instead of one
    numpy call per id).  The per-id sha1 digests remain (they ARE the host
    assignment); what this removes is the per-call Python/numpy overhead
    that dominated the child-extraction hot path."""
    if not image_ids:
        return []
    u = np.fromiter(
        (int.from_bytes(hashlib.sha1(s.encode()).digest()[:4], "big")
         for s in image_ids),
        np.uint64, len(image_ids),
    ).astype(np.float64) / 2**32
    hidx = np.searchsorted(_zipf_cum(n_hosts), u)
    return [f"http://host-{h}.example/{i}"
            for h, i in zip(hidx.tolist(), image_ids)]


def image_id_of_url(canon: str) -> str:
    return canon.rsplit("/", 1)[-1]


def url_type_of(image_id: str) -> str:
    """'root' pages fan out 6 children, 'product' pages 3 (reference caps,
    src/scrapper/neweggRootHandler.go:20 / amazonRootHandler.go:34)."""
    digits = image_id[3:]
    if digits.isdigit() and int(digits) % config.ROOT_EVERY == 0:
        return "root"
    return "product"


def children_of(canon_url: str, url_type: str, corpus_size: int) -> list[str]:
    """Deterministic child image_ids for a fetched page: f(sha1(canon_url)).
    ~1% of children are dead links (image_id absent from the corpus — the
    fetch soft-fail path, FIXTURES.md §2)."""
    k = config.FANOUT_ROOT if url_type == "root" else config.FANOUT_PRODUCT
    out = []
    for j in range(k):
        v = int.from_bytes(
            hashlib.sha1(f"{canon_url}#child{j}".encode()).digest()[:8], "big"
        )
        if v % 100 < config.DEAD_LINK_PCT:
            out.append(f"imgdead{v % 10**6:06d}")
        else:
            out.append(image_id_of(v % corpus_size))
    return out


def seed_image_ids(n_seeds: int = config.N_SEEDS) -> list[str]:
    """The fixed seed list: the first n_seeds root-classified rows
    (reference analog: CLI 'scrap <query>' seeds 2 root URLs,
    src/client/main.go:90-110; FIXTURES.md §3 scales that to 20)."""
    return [image_id_of(i * config.ROOT_EVERY) for i in range(n_seeds)]


# ------------------------------------------------------------------ storage facade

_CORPUS_FORMAT_VERSION = 2  # v2: jpeg rows are real baseline JPEG


def corpus_dir(size: int, seed: int = config.CORPUS_SEED, root: str = "/tmp/weaver_corpus") -> str:
    # version in the cache path: a codec/format change must never silently
    # reuse a stale cached corpus
    return os.path.join(root, f"seed{seed}_n{size}_v{_CORPUS_FORMAT_VERSION}")


def generate_corpus(
    size: int,
    seed: int = config.CORPUS_SEED,
    root: str = "/tmp/weaver_corpus",
    rows_per_file: int = 10_000,
    force: bool = False,
) -> str:
    """Write (and cache) the corpus for (seed, size). Returns its directory.

    Layout: part-*.parquet (scan path) + corpus.feather (uncompressed IPC,
    the take-by-key path) + _DONE marker (atomic completion — a rerun that
    died mid-write regenerates)."""
    d = Path(corpus_dir(size, seed, root))
    done = d / "_DONE"
    if done.exists() and not force:
        return str(d)
    d.mkdir(parents=True, exist_ok=True)
    for old in d.glob("*"):
        if old.is_dir():  # corpus.lance is a DIRECTORY when Lance is present
            import shutil

            shutil.rmtree(old)
        else:
            old.unlink()
    # generation is CPU-bound (PNG deflate + JPEG DCT/Huffman per row):
    # fan out as Ray tasks when a session exists, serial otherwise
    import ray as _ray

    chunk = 1000
    starts = list(range(0, size, chunk))
    if _ray.is_initialized() and len(starts) > 1:
        gen = _ray.remote(
            lambda s0: make_corpus_batch(np.arange(s0, min(s0 + chunk, size)), seed)
        )
        chunks = _ray.get([gen.remote(s0) for s0 in starts])
    else:
        chunks = [make_corpus_batch(np.arange(s0, min(s0 + chunk, size)), seed)
                  for s0 in starts]
    full = pa.concat_tables(chunks)
    for start in range(0, size, rows_per_file):
        pq.write_table(full.slice(start, rows_per_file),
                       d / f"part-{start // rows_per_file:05d}.parquet")
    if HAVE_LANCE:  # pragma: no cover
        lance.write_dataset(full, str(d / "corpus.lance"), mode="overwrite")
    feather.write_feather(full, str(d / "corpus.feather"), compression="uncompressed")
    done.write_text(f"size={size} seed={seed}\n")
    return str(d)


# process-level (table, index) cache: fetch ACTORS are recreated every
# round (Ray Data pools are per-execution) but their WORKER PROCESSES are
# reused — caching here makes round N+1's pool construction free instead of
# re-reading + re-indexing the corpus 32x per round
_STORE_CACHE: dict[str, tuple] = {}


class CorpusStore:
    """Open-once handle for key-lookup fetches.  One per fetch actor
    (__init__-time state, SURVEY.md §7.2): memory-maps the IPC file
    (zero-copy blocks shared across actors on a node) and builds an
    image_id -> row-index dict.  The 100 TB version replaces both with a
    Lance scanner + btree index; same method signature."""

    def __init__(self, path: str):
        cached = _STORE_CACHE.get(path)
        if cached is None:
            table = feather.read_table(os.path.join(path, "corpus.feather"),
                                       memory_map=True)
            # take() on a chunked table is ~40x slower than on contiguous
            # buffers (measured); combining once per process is the cheap
            # side of that trade (the 100 TB version = Lance take-by-key)
            table = table.combine_chunks()
            ids = table.column("image_id").to_pylist()
            cached = (table, {s: i for i, s in enumerate(ids)}, len(ids))
            _STORE_CACHE.clear()  # at most one corpus per worker process
            _STORE_CACHE[path] = cached
        self.table, self.index, self.size = cached

    def take_by_image_id(self, image_ids: list[str]) -> tuple[pa.Table, np.ndarray]:
        """Rows for the ids that exist, plus a boolean 'found' mask aligned
        with the input (missing ids = dead links, soft-fail not exception)."""
        pos = np.array([self.index.get(s, -1) for s in image_ids], dtype=np.int64)
        found = pos >= 0
        rows = self.table.take(pa.array(pos[found]))
        return rows, found


def read_corpus(path: str, columns: list[str] | None = None):
    """Ray Dataset over the corpus parquet parts (column-pruned scan path)."""
    import ray.data as rd

    files = sorted(str(p) for p in Path(path).glob("part-*.parquet"))
    return rd.read_parquet(files, columns=columns)


def corpus_checksum(path: str) -> str:
    """Stable digest of the full corpus table (determinism tests): hashes
    the Arrow IPC serialization of every batch — str(chunk) would elide all
    but ~20 elements and miss any mid-table difference."""
    t = feather.read_table(os.path.join(path, "corpus.feather"))
    h = hashlib.sha256()
    for batch in t.to_batches():
        sink = pa.BufferOutputStream()
        with pa.ipc.new_stream(sink, batch.schema) as w:
            w.write_batch(batch)
        h.update(memoryview(sink.getvalue()))
    return h.hexdigest()
