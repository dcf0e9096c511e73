"""Politeness-gated fetch: frontier rows -> crawled records.

Reference analog: the colly ``Collector.Visit`` calls in the scrapper
handlers (src/scrapper/amazonRootHandler.go:30, neweggProductHandler.go:18)
— an HTTP GET joining the frontier against the live web.  Here the "web" is
the hermetic corpus table, so a fetch is a zero-copy Arrow take by image_id
(SURVEY.md §2.4 J3), gated by the politeness pool.

``FetchStage`` is a callable CLASS for ``map_batches(..., concurrency=N)``:
the corpus store (memory-mapped IPC + key index) opens once per actor in
``__init__`` (reference analog: per-node service clients built once at boot,
src/scrapper/main.go:34-40); each ``__call__`` handles one Arrow batch.

Politeness enforcement: the batch asks the politeness shards for per-row
fetch slots, then fetches in deadline order — sleeping to each slot cluster
(1 ms coalescing window) and bulk-taking its rows — so per-host
min-intervals hold while corpus reads stay vectorized.  Row assembly is pure Arrow kernels (take +
concat); no per-row Python in the hot path.  Rows denied by robots get
``fetch_status="robots_denied"``; missing image_ids get ``"dead"`` — soft
fail columns, never exceptions, so one bad row can't poison a batch
(SURVEY.md §4 retry row).
"""

from __future__ import annotations

import time

import numpy as np
import pyarrow as pa

from ..schema import RECORD_SCHEMA
from ..sources.corpus import CorpusStore, image_id_of_url

# fetch slots within this span coalesce into one vectorized corpus take.
# It must stay well BELOW the smallest nonzero crawl-delay (50 ms fixture
# class, and delay_scale can shrink that further): a window as wide as the
# slot spacing would merge distinct politeness slots and fetch back-to-back,
# silently violating the per-host min-interval this stage exists to enforce.
_WINDOW_S = 0.001

_FRONTIER_KEEP = ["url_canon", "url_hash", "host", "round", "seq",
                  "depth", "priority", "url_type"]


class FetchStage:
    def __init__(self, corpus_path: str, politeness_view, lineage=None,
                 records_dir: str | None = None, fetch_latency_s: float = 0.0,
                 emit_children: bool = False, n_hosts: int | None = None,
                 fail_marker_dir: str | None = None):
        self.store = CorpusStore(corpus_path)
        self.politeness = politeness_view
        self.lineage = lineage
        self.records_dir = records_dir
        self.fetch_latency_s = fetch_latency_s
        self.emit_children = emit_children
        self.n_hosts = n_hosts
        self.fail_marker_dir = fail_marker_dir  # test hook: fail each batch once

    def __call__(self, batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        if n == 0:
            return _empty_records()
        if self.fail_marker_dir is not None and n:
            # fault-injection for the retry/exactly-once test (reference
            # analog: visibility-timeout redelivery, src/queue/main.go:76-87)
            import os

            r0 = int(batch.column("round")[0].as_py())
            s0 = int(pa.compute.min(batch.column("seq")).as_py())
            marker = os.path.join(self.fail_marker_dir, f"attempted_{r0}_{s0}")
            if not os.path.exists(marker):
                open(marker, "w").close()
                raise RuntimeError("injected transient fetch failure (test)")
        canon = batch.column("url_canon").to_pylist()
        hosts = batch.column("host").to_pylist()
        image_ids = [image_id_of_url(c) for c in canon]
        paths = ["/" + i for i in image_ids]
        prio = batch.column("priority").to_numpy(zero_copy_only=False)
        seqs = batch.column("seq").to_numpy(zero_copy_only=False)

        # batch key = (round, first seq): a RETRIED task re-presents the same
        # key and gets the cached slot assignment — host clocks and stats
        # advance exactly once per logical batch
        bkey = (int(batch.column("round")[0].as_py()), int(seqs.min()))
        allowed, wait_s = self.politeness.schedule(hosts, paths, prio, seqs,
                                                   batch_key=bkey)

        # fetch in deadline order, coarse windows; each window is one
        # vectorized corpus take
        fetch_idx = np.flatnonzero(allowed)
        found = np.zeros(n, dtype=bool)
        corpus_parts: list[pa.Table] = []      # taken corpus rows, in fetch order
        corpus_rowidx: list[np.ndarray] = []   # batch row index of each taken row
        if len(fetch_idx):
            order = fetch_idx[np.argsort(wait_s[fetch_idx], kind="stable")]
            t0 = time.monotonic()
            pos = 0
            while pos < len(order):
                w0 = wait_s[order[pos]]
                end = pos
                while end < len(order) and wait_s[order[end]] <= w0 + _WINDOW_S:
                    end += 1
                remaining = w0 - (time.monotonic() - t0)
                if remaining > 0:
                    time.sleep(remaining)
                window = order[pos:end]
                if self.fetch_latency_s > 0.0:
                    # simulated network RTT: one connection per actor drains
                    # its queue sequentially, so the batch pays latency/URL
                    time.sleep(self.fetch_latency_s * len(window))
                rows, wfound = self.store.take_by_image_id([image_ids[i] for i in window])
                found[window[wfound]] = True
                if rows.num_rows:
                    corpus_parts.append(rows)
                    corpus_rowidx.append(window[wfound])
                pos = end

        status = np.where(found, "ok", np.where(allowed, "dead", "robots_denied"))

        # --- assembly: pure Arrow (take + concat), grouped by outcome ------
        ok_idx = np.concatenate(corpus_rowidx) if corpus_rowidx else np.zeros(0, np.int64)
        ok_corpus = (
            pa.concat_tables(corpus_parts) if corpus_parts
            else self.store.table.schema.empty_table()
        )
        miss_idx = np.flatnonzero(~found)

        fr_ok = batch.select(_FRONTIER_KEEP).take(pa.array(ok_idx))
        ok_t = fr_ok
        for col in ("bytes", "w", "h", "fmt", "caption", "phash"):
            ok_t = ok_t.append_column(col, ok_corpus.column(col))
        ok_t = ok_t.append_column("image_id", ok_corpus.column("image_id"))
        ok_t = ok_t.append_column("fetch_status", pa.array(["ok"] * len(ok_idx), pa.string()))

        fr_miss = batch.select(_FRONTIER_KEEP).take(pa.array(miss_idx))
        nmiss = len(miss_idx)
        miss_t = fr_miss
        miss_t = miss_t.append_column("bytes", pa.nulls(nmiss, pa.large_binary()))
        miss_t = miss_t.append_column("w", pa.array(np.zeros(nmiss, np.int32)))
        miss_t = miss_t.append_column("h", pa.array(np.zeros(nmiss, np.int32)))
        miss_t = miss_t.append_column("fmt", pa.array([""] * nmiss, pa.string()))
        miss_t = miss_t.append_column("caption", pa.array([""] * nmiss, pa.string()))
        miss_t = miss_t.append_column("phash", pa.array(np.zeros(nmiss, np.int64)))
        miss_t = miss_t.append_column(
            "image_id", pa.array([image_ids[i] for i in miss_idx], pa.string())
        )
        miss_t = miss_t.append_column(
            "fetch_status", pa.array(status[miss_idx].tolist(), pa.string())
        )

        cols = _FRONTIER_KEEP + ["bytes", "w", "h", "fmt", "caption", "phash",
                                 "image_id", "fetch_status"]
        out = pa.concat_tables([ok_t.select(cols), miss_t.select(cols)])

        if self.lineage is not None:
            # awaited, not fire-and-forget: the driver drains the lineage
            # actor at the round barrier, and an un-acked record could arrive
            # AFTER that drain and land in the wrong round's checkpoint (or
            # be lost on the final round) — one tiny actor round trip per
            # batch buys ordered, per-round-exact lineage
            import ray as _ray

            _ray.get(self.lineage.record.remote(
                stage="fetch",
                round=int(batch.column("round")[0].as_py()),
                batch_key=int(seqs.min()),
                rows_in=n,
                rows_out=int(found.sum()),
                robots_denied=int((~allowed).sum()),
                dead=int((allowed & ~found).sum()),
            ))
        if self.records_dir is not None:
            # Sink the wide rows (image bytes) here, immediately after fetch,
            # so they never re-enter the object store; downstream stages see
            # only narrow columns.  File name is deterministic per
            # (round, first-seq-in-partition) -> a retried task overwrites
            # its own partial output (idempotent resume, SURVEY.md §4).
            import os

            import pyarrow.parquet as pq

            import json

            r = int(batch.column("round")[0].as_py())
            first_seq = int(seqs.min())
            d = os.path.join(self.records_dir, f"round={r}")
            os.makedirs(d, exist_ok=True)
            final = os.path.join(d, f"part-s{first_seq:010d}.parquet")
            tmp = final + ".tmp"
            from ..schema import validate

            # no recompression: the payload column is already-encoded PNG/JPEG
            pq.write_table(validate(out, RECORD_SCHEMA, "fetch.records"), tmp,
                           compression="none")
            os.replace(tmp, final)
            # sidecar manifest: per-partition fetch counts, written with the
            # same deterministic name + atomic rename as the data file, so the
            # driver's round bookkeeping is a handful of tiny JSON reads (no
            # re-read of record data) and a retried task overwrites its own
            # manifest — counts stay exactly-once under retries
            stats = {
                "round": r, "part_first_seq": first_seq, "rows_in": n,
                "fetched_ok": int(found.sum()),
                "robots_denied": int((~allowed).sum()),
                "dead": int((allowed & ~found).sum()),
            }
            sfinal = os.path.join(d, f"part-s{first_seq:010d}.stats.json")
            stmp = sfinal + ".tmp"
            with open(stmp, "w") as fh:
                json.dump(stats, fh)
            os.replace(stmp, sfinal)
            out = out.drop_columns(["bytes", "w", "h", "fmt", "caption"])
        if self.emit_children:
            # fold link extraction into this stage: one execution per round
            # instead of a second task pool over the materialized narrow rows
            from .parse import extract_children

            children = extract_children(out, self.store.size, self.n_hosts)
            return _tag_union(out, children)
        return out


# union layout for (narrow-record + child-frontier) rows in one stage output
_UNION_COLS = [
    ("kind", pa.string()),
    ("url_canon", pa.string()),
    ("url_hash", pa.uint64()),
    ("host", pa.string()),
    ("depth", pa.int32()),
    ("url_type", pa.string()),
    ("priority", pa.float32()),
    ("seq", pa.int64()),
    ("round", pa.int32()),
    ("image_id", pa.string()),
    ("phash", pa.int64()),
    ("fetch_status", pa.string()),
    ("url", pa.string()),
    ("parent_hash", pa.uint64()),
]


def _tag_union(narrow: pa.Table, children: pa.Table) -> pa.Table:
    def conform(t: pa.Table, kind: str) -> pa.Table:
        n = t.num_rows
        cols = []
        for name, typ in _UNION_COLS:
            if name == "kind":
                cols.append(pa.array([kind] * n, pa.string()))
            elif name in t.column_names:
                cols.append(t.column(name).cast(typ))
            else:
                cols.append(pa.nulls(n, typ))
        return pa.table(dict(zip([c[0] for c in _UNION_COLS], cols)))

    return pa.concat_tables([conform(narrow, "record"), conform(children, "child")])


def split_union(tables: list[pa.Table]) -> tuple[pa.Table | None, list[pa.Table]]:
    """Driver-side split of the tagged stage output into (narrow records,
    child candidate tables)."""
    import pyarrow.compute as pc

    narrow_parts, child_parts = [], []
    for t in tables:
        if t.num_rows == 0:
            continue
        mask = pc.equal(t.column("kind"), "record")
        rec = t.filter(mask)
        ch = t.filter(pc.invert(mask))
        if rec.num_rows:
            narrow_parts.append(rec.drop_columns(["kind", "url", "parent_hash"]))
        if ch.num_rows:
            child_parts.append(ch.drop_columns(["kind", "image_id", "phash", "fetch_status"]))
    narrow = pa.concat_tables(narrow_parts) if narrow_parts else None
    return narrow, child_parts


def _empty_records() -> pa.Table:
    fields = list(RECORD_SCHEMA) + [pa.field("url_type", pa.string())]
    return pa.schema(fields).empty_table()
