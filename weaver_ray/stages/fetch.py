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
fetch slots, then performs fetches in deadline order, sleeping in coarse
50 ms windows and bulk-taking each window's rows — so per-host min-intervals
hold while corpus reads stay vectorized.  Rows denied by robots get
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

_WINDOW_S = 0.05


class FetchStage:
    def __init__(self, corpus_path: str, politeness_view, lineage=None,
                 records_dir: str | None = None):
        self.store = CorpusStore(corpus_path)
        self.politeness = politeness_view
        self.lineage = lineage
        self.records_dir = records_dir

    def __call__(self, batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        if n == 0:
            return _empty_records()
        canon = batch.column("url_canon").to_pylist()
        hosts = batch.column("host").to_pylist()
        paths = ["/" + image_id_of_url(c) for c in canon]
        prio = batch.column("priority").to_numpy(zero_copy_only=False)
        seqs = batch.column("seq").to_numpy(zero_copy_only=False)

        allowed, wait_s = self.politeness.schedule(hosts, paths, prio, seqs)

        image_ids = [image_id_of_url(c) for c in canon]
        status = np.where(allowed, "pending", "robots_denied").astype(object)

        # fetch in deadline order, coarse windows -> bulk takes stay vectorized
        fetch_idx = np.flatnonzero(allowed)
        blobs: list[bytes | None] = [None] * n
        meta: dict[int, tuple] = {}
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
                rows, found = self.store.take_by_image_id([image_ids[i] for i in window])
                r = 0
                for k, i in enumerate(map(int, window)):
                    if found[k]:
                        blobs[i] = rows.column("bytes")[r].as_py()
                        meta[i] = (
                            rows.column("w")[r].as_py(),
                            rows.column("h")[r].as_py(),
                            rows.column("fmt")[r].as_py(),
                            rows.column("caption")[r].as_py(),
                            rows.column("phash")[r].as_py(),
                        )
                        status[i] = "ok"
                        r += 1
                    else:
                        status[i] = "dead"
                pos = end

        ws = np.array([meta[i][0] if i in meta else 0 for i in range(n)], np.int32)
        hs = np.array([meta[i][1] if i in meta else 0 for i in range(n)], np.int32)
        fmts = [meta[i][2] if i in meta else "" for i in range(n)]
        caps = [meta[i][3] if i in meta else "" for i in range(n)]
        phs = np.array([meta[i][4] if i in meta else 0 for i in range(n)], np.int64)

        out = pa.table(
            {
                "url_canon": batch.column("url_canon"),
                "url_hash": batch.column("url_hash"),
                "host": batch.column("host"),
                "round": batch.column("round"),
                "seq": batch.column("seq"),
                "image_id": pa.array(image_ids, pa.string()),
                "bytes": pa.array(blobs, pa.large_binary()),
                "w": pa.array(ws, pa.int32()),
                "h": pa.array(hs, pa.int32()),
                "fmt": pa.array(fmts, pa.string()),
                "caption": pa.array(caps, pa.string()),
                "phash": pa.array(phs, pa.int64()),
                "fetch_status": pa.array(status.tolist(), pa.string()),
                "depth": batch.column("depth"),
                "priority": batch.column("priority"),
                "url_type": batch.column("url_type"),
            }
        )
        if self.lineage is not None:
            self.lineage.record.remote(
                stage="fetch",
                round=int(batch.column("round")[0].as_py()),
                rows_in=n,
                rows_out=int((status == "ok").sum()),
                robots_denied=int((status == "robots_denied").sum()),
                dead=int((status == "dead").sum()),
            )
        if self.records_dir is not None:
            # Sink the wide rows (image bytes) here, immediately after fetch,
            # so they never re-enter the object store; downstream stages see
            # only narrow columns.  File name is deterministic per
            # (round, first-seq-in-partition) -> a retried task overwrites
            # its own partial output (idempotent resume, SURVEY.md §4).
            import os

            import pyarrow.parquet as pq

            r = int(batch.column("round")[0].as_py())
            first_seq = int(seqs.min())
            d = os.path.join(self.records_dir, f"round={r}")
            os.makedirs(d, exist_ok=True)
            final = os.path.join(d, f"part-s{first_seq:010d}.parquet")
            tmp = final + ".tmp"
            pq.write_table(out.select([f.name for f in RECORD_SCHEMA]), tmp)
            os.replace(tmp, final)
            return out.drop_columns(["bytes", "w", "h", "fmt", "caption"])
        return out


def _empty_records() -> pa.Table:
    fields = list(RECORD_SCHEMA) + [
        pa.field("depth", pa.int32()),
        pa.field("priority", pa.float32()),
        pa.field("url_type", pa.string()),
    ]
    return pa.schema(fields).empty_table()
