"""JSON record store connectors — migration parity with the reference.

The reference persists one JSON file per product, named ``<Name>.json``,
in a directory per storage node, with idempotent skip-if-exists writes
(src/storage/main.go:142-170, replicate path :127-171); ``gather`` reads
every ``*.json`` back (src/storage/main.go:173-213).  A user migrating from
it gets both directions:

- :func:`export_json_records` — bulk export of crawl records to JSON
  (Ray-idiomatic ``write_json`` part files, or the reference's exact
  one-file-per-record layout in compat mode);
- :func:`read_json_store` — ingest a reference-style directory of per-record
  JSON files into a Dataset (S9 'gather' source).
"""

from __future__ import annotations

import json
import os
from pathlib import Path

import ray.data as rd

from ..pipelines.gather import read_records


def export_json_records(records_dir: str, out_dir: str,
                        one_file_per_record: bool = False) -> int:
    """Export crawled records (minus image bytes) to JSON.  Returns rows
    written.  ``one_file_per_record=True`` reproduces the reference layout:
    ``<image_id>.json`` each, skipped when present (idempotent replica
    write, src/storage/main.go:146-151) — use only for small exports; the
    default part-file mode is the scalable path."""
    ds = read_records(records_dir)
    if not one_file_per_record:
        ds.write_json(out_dir)
        return ds.count()

    os.makedirs(out_dir, exist_ok=True)

    def write_batch(batch):
        import pandas as pd

        written = []
        for row in batch.to_dict("records"):
            path = os.path.join(out_dir, f"{row['image_id']}.json")
            if not os.path.exists(path):  # idempotent skip-if-exists
                tmp = path + ".tmp"
                with open(tmp, "w") as f:
                    json.dump(row, f, default=str)
                os.replace(tmp, path)
            written.append(row["image_id"])
        return pd.DataFrame({"image_id": written})

    out = ds.map_batches(write_batch, batch_format="pandas")
    return out.count()


def read_json_store(store_dir: str) -> rd.Dataset:
    """Read a reference-style directory of per-record JSON files (or
    write_json part files) into a Dataset."""
    files = sorted(str(p) for p in Path(store_dir).glob("*.json"))
    return rd.read_json(files)


_JSONL_COLS = ["url_canon", "host", "round", "seq", "image_id",
               "fetch_status"]
# url_hash is deliberately NOT exported: it is a uint64 hash whose top-bit
# values exceed 2^53 — JSON interchange cannot carry it losslessly, which
# is exactly the kind of column a JSON feed must drop or stringify


def export_records_jsonl(records_dir: str,
                         out_root: str = "/tmp/weaver_corpus") -> str:
    """Memoized JSONL export of the crawl records (Ray Data
    ``write_json``, one part per block).  The ``_DONE`` stamp records
    the SOURCE file identities (path + mtime + size — the CSV-export
    staleness rule), so a re-crawled records dir regenerates."""
    import hashlib

    files = sorted(Path(records_dir).glob("round=*/part-*.parquet"))
    stamp = "".join(f"{p}|{p.stat().st_mtime_ns}|{p.stat().st_size}\n"
                    for p in files)
    tag = hashlib.md5(stamp.encode()).hexdigest()[:12]
    d = Path(out_root) / f"jsonl_records_{tag}"
    done = d / "_DONE"
    if done.exists() and done.read_text() == stamp:
        return str(d)
    d.mkdir(parents=True, exist_ok=True)
    for old in d.glob("*"):
        old.unlink()
    from ..pipelines.gather import read_records

    read_records(records_dir, _JSONL_COLS).write_json(str(d))
    done.write_text(stamp)
    return str(d)


def records_jsonl_roundtrip(records_dir: str) -> "pd.DataFrame":
    """JSONL source/sink round trip over the crawl records — the
    reference's own interchange format (S10/S11, one JSON per product)
    driven end to end at part-file scale: records -> write_json ->
    read_json -> an aggregate touching EVERY exported column (counts,
    seq sums, url/host string extrema, image-id byte lengths).  The
    DuckDB oracle computes the identical aggregate over the records
    PARQUET, so the value hash certifies the JSON text preserved every
    column."""
    import numpy as np
    import pandas as pd

    from ..pipelines.common import partial_groupby

    d = export_records_jsonl(records_dir)
    ds = read_json_store(d)

    def prep(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["img_len"] = df["image_id"].str.len().astype(np.int64)
        df["one"] = np.ones(len(df), np.int64)
        return df

    out = partial_groupby(
        ds, ["round", "fetch_status"],
        {"n_records": ("one", "sum"), "sum_seq": ("seq", "sum"),
         "min_url": ("url_canon", "min"), "max_url": ("url_canon", "max"),
         "min_host": ("host", "min"), "max_host": ("host", "max"),
         "sum_img_len": ("img_len", "sum")},
        prep=prep).to_pandas()
    for c in ("round", "n_records", "sum_seq", "sum_img_len"):
        out[c] = out[c].astype(np.int64)
    return (out.sort_values(["round", "fetch_status"])
            .reset_index(drop=True))


def records_jsonl_roundtrip_sql(records_glob: str) -> str:
    """The DuckDB oracle: identical aggregate over the records parquet
    (hive_partitioning off — the files already carry a round column)."""
    return f"""
        SELECT round, fetch_status,
               count(*)::BIGINT AS n_records,
               sum(seq)::BIGINT AS sum_seq,
               min(url_canon) AS min_url, max(url_canon) AS max_url,
               min(host) AS min_host, max(host) AS max_host,
               sum(length(image_id))::BIGINT AS sum_img_len
        FROM read_parquet('{records_glob}', hive_partitioning = false)
        GROUP BY round, fetch_status
    """
