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
