"""Gather: collect -> merge -> report over crawled records.

Reference: the ``gather`` CLI (SURVEY.md §3.2) fans out to every storage
node, unions the per-node JSON files, dedupes first-wins by URL and counts
replicas per record (src/client/main.go:145-203).  Here storage is the
partitioned records parquet, so gather is a Dataset pipeline:

    read_parquet(records/round=*) -> groupby(url_canon)
      -> map_groups(first-wins + replica count) -> stats

First-wins is deterministic on (round, seq) — the engine's total crawl
order — rather than the reference's racy arrival order.
"""

from __future__ import annotations

from pathlib import Path

import numpy as np
import pandas as pd
import ray.data as rd

from .common import partial_groupby

NARROW = ["url_canon", "url_hash", "host", "round", "seq", "image_id",
          "caption", "phash", "fetch_status"]


def read_records(records_dir: str, columns: list[str] | None = None) -> rd.Dataset:
    files = sorted(str(p) for p in Path(records_dir).glob("round=*/part-*.parquet"))
    if not files:
        # fail clearly, not with Ray's empty-path ValueError deep in a task:
        # every gather entry point and the CLI route through here
        raise FileNotFoundError(
            f"no crawl records under {records_dir!r} "
            "(expected round=*/part-*.parquet — has the crawl run?)"
        )
    return rd.read_parquet(files, columns=columns or NARROW)


def gather_merge(records_dir: str) -> rd.Dataset:
    """First-wins merge by url_canon (reference J5/D2): keeper = the
    earliest (round, seq) sighting; n_sightings counts re-crawls (with the
    exact seen-set there are none — the count is the audit)."""
    ds = read_records(records_dir, ["url_canon", "url_hash", "host", "round",
                                    "seq", "image_id", "fetch_status"])

    def first_wins(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["round", "seq"])
        top = g.iloc[0]
        return pd.DataFrame(
            {
                "url_canon": [top["url_canon"]],
                "host": [top["host"]],
                "image_id": [top["image_id"]],
                "fetch_status": [top["fetch_status"]],
                "first_round": [np.int32(top["round"])],
                "n_sightings": [np.int64(len(g))],
            }
        )

    return ds.groupby("url_canon").map_groups(first_wins, batch_format="pandas")


def host_stats(records_dir: str) -> rd.Dataset:
    """Per-host crawl report (reference prints a TSV table; we return the
    aggregate): fetched/denied/dead counts per host."""
    ds = read_records(records_dir, ["host", "fetch_status", "url_hash"])

    def flags(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["is_ok"] = (df["fetch_status"] == "ok").astype(np.int64)
        df["is_denied"] = (df["fetch_status"] == "robots_denied").astype(np.int64)
        df["is_dead"] = (df["fetch_status"] == "dead").astype(np.int64)
        return df

    ds = ds.map_batches(flags, batch_format="pandas")
    out = partial_groupby(
        ds, ["host"],
        {
            "n_urls": ("url_hash", "count"),
            "n_ok": ("is_ok", "sum"),
            "n_denied": ("is_denied", "sum"),
            "n_dead": ("is_dead", "sum"),
        },
        many_groups=True,  # hosts are millions at crawl scale
    )
    return out.map_batches(
        lambda df: df.astype({c: np.int64 for c in ("n_urls", "n_ok", "n_denied", "n_dead")}),
        batch_format="pandas",
    )


def round_stats(records_dir: str) -> pd.DataFrame:
    """Per-round totals from the records themselves (cross-check against
    checkpointed lineage)."""
    ds = read_records(records_dir, ["round", "fetch_status", "url_hash"])
    out = partial_groupby(ds, ["round"], {"n_urls": ("url_hash", "count")}).to_pandas()
    out["n_urls"] = out["n_urls"].astype(np.int64)
    return out.sort_values("round").reset_index(drop=True)


def near_dup_phash(records_dir: str, max_hamming: int = 4, prefix_bits: int = 16) -> pd.DataFrame:
    """Near-duplicate images by perceptual hash: block on the top
    ``prefix_bits`` of phash (hamming-close hashes usually share the
    prefix), verify hamming within blocks — the phash hook noted in
    SURVEY.md §2.7."""
    ds = read_records(records_dir, ["image_id", "phash", "fetch_status"])

    def blocks(df: pd.DataFrame) -> pd.DataFrame:
        df = df[df["fetch_status"] == "ok"].drop_duplicates("image_id")
        ph = df["phash"].to_numpy().astype(np.uint64)
        return pd.DataFrame(
            {
                "image_id": df["image_id"].to_numpy(),
                "phash": df["phash"].to_numpy(),
                "block": (ph >> np.uint64(64 - prefix_bits)).astype(np.int64),
            }
        )

    blocked = ds.map_batches(blocks, batch_format="pandas")

    import pyarrow as pa

    pair_schema = pa.schema([("image_a", pa.string()), ("image_b", pa.string()),
                             ("hamming", pa.int64())])

    def pairs(g: pd.DataFrame) -> pa.Table:
        g = g.drop_duplicates("image_id").sort_values("image_id")
        if len(g) < 2:
            return pair_schema.empty_table()
        ids = g["image_id"].to_numpy()
        ph = g["phash"].to_numpy().astype(np.uint64)
        a, b = np.triu_indices(len(ids), k=1)
        x = ph[a] ^ ph[b]
        ham = np.zeros(len(x), dtype=np.int64)
        for _ in range(64):
            ham += (x & np.uint64(1)).astype(np.int64)
            x >>= np.uint64(1)
        keep = ham <= max_hamming
        return pa.table(
            {"image_a": pa.array(ids[a][keep].tolist(), pa.string()),
             "image_b": pa.array(ids[b][keep].tolist(), pa.string()),
             "hamming": pa.array(ham[keep], pa.int64())},
            schema=pair_schema,
        )

    out = blocked.groupby("block").map_groups(pairs, batch_format="pandas").to_pandas()
    if out.empty:
        return pair_schema.empty_table().to_pandas()
    return out.sort_values(["image_a", "image_b"]).reset_index(drop=True)
