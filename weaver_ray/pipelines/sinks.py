"""Resumable partitioned parquet sink for LARGE pipeline results.

The near-dup / cluster pipelines return Datasets; at 100 TB their outputs
(pair lists, one-label-per-document cluster tables) are themselves too big
to collect.  This sink streams any Dataset to hash-partitioned parquet with
deterministic per-partition content, an atomic rename per file, and a
``.done`` marker per partition — the fetch stage's idempotent-sink
discipline (stages/fetch.py records sink) applied to query results.  A
killed run re-executed against the same ``out_dir`` skips every finished
partition's WRITE (the marker is the commit point); the result directory is
byte-stable across runs because each partition is sorted before writing.

Reference analog: Weaver's product insert + replica write (S7/S8,
src/scrapper — durable per-record output); here the durability unit is a
key-range partition so a 100-TB dedup pass restarts without re-writing
finished ranges.
"""

from __future__ import annotations

import json
import os

import pandas as pd
import ray.data as rd

from .common import bucket_of


def _marker(out_dir: str, part: int) -> str:
    return os.path.join(out_dir, f"part-{part:05d}.done")


def _data_path(out_dir: str, part: int) -> str:
    return os.path.join(out_dir, f"part-{part:05d}.parquet")


def write_partitioned(ds: rd.Dataset, out_dir: str, key: str,
                      num_partitions: int = 32,
                      resume: bool = True) -> pd.DataFrame:
    """Write ``ds`` as ``num_partitions`` hash-partitioned parquet files.

    Each row lands in partition ``hash(row[key]) % num_partitions``; each
    partition task sorts its complete group (all columns, stable) so file
    bytes don't depend on block arrival order, writes ``part-N.parquet.tmp``,
    atomically renames it, then commits a ``part-N.done`` marker carrying
    the row count.  With ``resume=True`` a partition whose marker already
    exists is skipped (its rows still ride the one hash shuffle — partition
    membership is a function of the whole input, so the shuffle cannot be
    pruned; only the write is).

    Returns one row per non-empty partition:
    (partition, rows, skipped) — tiny (num_partitions rows), so collecting
    it on the driver is safe at any scale.
    """
    os.makedirs(out_dir, exist_ok=True)
    if not resume:
        for p in range(num_partitions):
            for path in (_marker(out_dir, p), _data_path(out_dir, p)):
                if os.path.exists(path):
                    os.remove(path)

    def tag(batch: pd.DataFrame) -> pd.DataFrame:
        batch = batch.copy()
        batch["__part"] = bucket_of(batch[key], num_partitions)
        return batch

    def write_part(group: pd.DataFrame) -> pd.DataFrame:
        part = int(group["__part"].iloc[0])
        group = group.drop(columns="__part")
        mk = _marker(out_dir, part)
        if os.path.exists(mk):
            with open(mk) as fh:
                rows = json.load(fh)["rows"]
            return pd.DataFrame({"partition": [part], "rows": [int(rows)],
                                 "skipped": [True]})
        group = group.sort_values(list(group.columns),
                                  kind="mergesort").reset_index(drop=True)
        tmp = _data_path(out_dir, part) + ".tmp"
        group.to_parquet(tmp, index=False)
        os.replace(tmp, _data_path(out_dir, part))
        mtmp = mk + ".tmp"
        with open(mtmp, "w") as fh:
            json.dump({"partition": part, "rows": len(group)}, fh)
        os.replace(mtmp, mk)  # marker commit AFTER data: crash -> re-write
        return pd.DataFrame({"partition": [part], "rows": [len(group)],
                             "skipped": [False]})

    stats = (ds.map_batches(tag, batch_format="pandas")
             .groupby("__part").map_groups(write_part, batch_format="pandas")
             .to_pandas())
    return stats.sort_values("partition").reset_index(drop=True)


def read_partitioned(out_dir: str) -> rd.Dataset:
    """Read back only COMMITTED partitions (those with a ``.done`` marker);
    a ``.parquet`` without its marker is an uncommitted torn write and is
    ignored, matching the sink's crash semantics."""
    files = sorted(
        _data_path(out_dir, int(f.split("-")[1].split(".")[0]))
        for f in os.listdir(out_dir) if f.endswith(".done")
    )
    return rd.read_parquet(files)
