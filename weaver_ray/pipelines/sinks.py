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

import glob
import json
import os

import numpy as np
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
        # delete EVERY prior part artifact (data, marker, tmp), not just
        # 0..num_partitions-1: a prior run with MORE partitions would
        # otherwise leave committed stale partitions that read_partitioned
        # happily mixes into the new result
        for path in glob.glob(os.path.join(out_dir, "part-*")):
            os.remove(path)
    else:
        stale = [m for m in glob.glob(os.path.join(out_dir, "part-*.done"))
                 if int(os.path.basename(m).split("-")[1].split(".")[0])
                 >= num_partitions]
        if stale:
            raise ValueError(
                f"{out_dir} holds committed partitions >= num_partitions="
                f"{num_partitions} (prior run used a different layout): "
                f"{sorted(os.path.basename(m) for m in stale)[:4]}... — "
                "pass resume=False to rewrite, or match num_partitions")

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
        with open(tmp, "rb+") as fh:  # fsync data BEFORE the rename: an OS
            os.fsync(fh.fileno())     # crash must never persist the marker
        os.replace(tmp, _data_path(out_dir, part))  # over torn data
        mtmp = mk + ".tmp"
        with open(mtmp, "w") as fh:
            json.dump({"partition": part, "rows": len(group)}, fh)
            fh.flush()
            os.fsync(fh.fileno())
        os.replace(mtmp, mk)  # marker commit AFTER data: crash -> re-write
        dfd = os.open(out_dir, os.O_RDONLY)  # persist the dir entries too
        try:
            os.fsync(dfd)
        finally:
            os.close(dfd)
        return pd.DataFrame({"partition": [part], "rows": [len(group)],
                             "skipped": [False]})

    stats = (ds.map_batches(tag, batch_format="pandas")
             .groupby("__part").map_groups(write_part, batch_format="pandas")
             .to_pandas())
    if "partition" not in stats.columns:  # empty input: no groups, no files
        stats = pd.DataFrame({"partition": pd.Series([], dtype=np.int64),
                              "rows": pd.Series([], dtype=np.int64),
                              "skipped": pd.Series([], dtype=bool)})
    return stats.sort_values("partition").reset_index(drop=True)


def read_partitioned(out_dir: str) -> rd.Dataset:
    """Read back only COMMITTED partitions (those with a ``.done`` marker);
    a ``.parquet`` without its marker is an uncommitted torn write and is
    ignored, matching the sink's crash semantics."""
    files = sorted(
        _data_path(out_dir, int(f.split("-")[1].split(".")[0]))
        for f in os.listdir(out_dir) if f.endswith(".done")
    )
    missing = [f for f in files if not os.path.exists(f)]
    if missing:
        # the sink commits the marker strictly AFTER the fsynced data
        # rename, so marker-without-data cannot come from a crash — only
        # out-of-band deletion.  Refuse loudly (the checkpoint manager's
        # commit-gap precedent) instead of a FileNotFoundError deep in a
        # read task.
        raise ValueError(
            f"{out_dir}: committed partition marker(s) without data "
            f"file(s) {sorted(os.path.basename(m) for m in missing)[:4]} — "
            "the directory was altered out-of-band; remove the stale "
            ".done markers (or rewrite with resume=False)")
    if not files:
        # zero committed partitions (empty result, or a reader racing the
        # first commit): an empty Dataset, not a read_parquet([]) crash.
        # Like Dataset.to_pandas() on an all-empty result, it carries no
        # schema (BASELINE.md lessons).
        return rd.from_items([])
    return rd.read_parquet(files)
