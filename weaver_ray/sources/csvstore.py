"""CSV source/sink round trip — plain-text interchange coverage for the
engine's source layer (the reference's only interchange format is its JSON
record store, src/storage/main.go:142-213; CSV is the table-shaped
equivalent every warehouse feed needs).

``events_csv_roundtrip`` certifies LOSSLESSNESS end to end: the events
table is exported once with Ray Data's CSV datasink (one part file per
block — the same layout discipline as the parquet sinks), read back with
``ray.data.read_csv`` (Arrow CSV reader, schema re-inferred from the
text), and aggregated so that EVERY column participates in the result
(counts, int sums, distinct users, epoch-us timestamp extrema, rounded
value sums, prop byte lengths).  The DuckDB oracle computes the identical
aggregate over the original PARQUET view — the value hash matches only if
every column survived the text round trip bit-for-bit (Arrow writes
shortest-round-trip doubles and ISO timestamps, verified exact).
"""

from __future__ import annotations

import os
from pathlib import Path

import numpy as np
import pandas as pd
import ray.data as rd

from ..pipelines.common import load, partial_groupby, sql_round

_CSV_STORE_VERSION = 1


def _csv_events_dir(sf_dir: str, root: str = "/tmp/weaver_corpus") -> str:
    tag = os.path.basename(os.path.normpath(sf_dir)) or "sf"
    return os.path.join(root, f"csv_events_{tag}_v{_CSV_STORE_VERSION}")


def export_events_csv(sf_dir: str, root: str = "/tmp/weaver_corpus") -> str:
    """Memoized CSV export of the events table (Ray Data ``write_csv``,
    one part per block; ``_DONE`` sentinel, stale parts cleared — the
    edge-fixture protocol).  The sentinel records the SOURCE identity
    (absolute path + mtime + size, the incremental_event_stats
    staleness rule) and a mismatch regenerates — a rewritten corpus or
    a different sf_dir sharing the basename must never serve a stale
    CSV."""
    src = os.path.join(sf_dir, "events.parquet")
    st = os.stat(src)
    stamp = f"{os.path.abspath(src)}|{st.st_mtime_ns}|{st.st_size}\n"
    d = Path(_csv_events_dir(sf_dir, root))
    done = d / "_DONE"
    if done.exists() and done.read_text() == stamp:
        return str(d)
    d.mkdir(parents=True, exist_ok=True)
    for old in d.glob("*"):
        old.unlink()
    load(sf_dir, "events").write_csv(str(d))
    done.write_text(stamp)
    return str(d)


def events_csv_roundtrip(sf_dir: str) -> pd.DataFrame:
    """Per-event-type aggregate over the CSV-round-tripped events table;
    every source column feeds the result so the oracle (same aggregate,
    parquet view) certifies the text round trip column by column."""
    d = export_events_csv(sf_dir)
    files = sorted(str(p) for p in Path(d).glob("*.csv")) or [d]
    ds = rd.read_csv(files)

    def partials(df: pd.DataFrame) -> pd.DataFrame:
        ts_us = df["ts"].to_numpy("datetime64[us]").astype(np.int64)
        return pd.DataFrame({
            "event_type": df["event_type"].to_numpy(object),
            "one": np.ones(len(df), np.int64),
            "sum_id": df["event_id"].to_numpy(np.int64),
            "min_ts": ts_us, "max_ts": ts_us,
            "value": df["value"].to_numpy(np.float64),
            "props_len": df["props"].str.len().to_numpy(np.int64)})

    agg = partial_groupby(
        ds.map_batches(partials, batch_format="pandas"), ["event_type"],
        {"n_events": ("one", "sum"), "sum_event_id": ("sum_id", "sum"),
         "min_ts_us": ("min_ts", "min"), "max_ts_us": ("max_ts", "max"),
         "sum_value": ("value", "sum"),
         "sum_props_len": ("props_len", "sum")}).to_pandas()

    # distinct users per type: batch-local distinct pairs -> one tiny
    # count reduce (the flag-dedup shape)
    pairs = partial_groupby(
        ds, ["event_type", "user_id"], {"n": ("user_id", "count")},
        many_groups=True)
    nu = partial_groupby(pairs, ["event_type"],
                         {"n_users": ("user_id", "count")}).to_pandas()

    out = agg.merge(nu, on="event_type")
    for c in ("n_events", "sum_event_id", "min_ts_us", "max_ts_us",
              "sum_props_len", "n_users"):
        out[c] = out[c].astype(np.int64)
    out["sum_value"] = sql_round(out["sum_value"], 2)
    return out[["event_type", "n_events", "n_users", "sum_event_id",
                "min_ts_us", "max_ts_us", "sum_value", "sum_props_len"]]


EVENTS_CSV_ROUNDTRIP_SQL = """
    SELECT event_type,
           count(*)::BIGINT AS n_events,
           count(DISTINCT user_id)::BIGINT AS n_users,
           sum(event_id)::BIGINT AS sum_event_id,
           min(epoch_us(ts))::BIGINT AS min_ts_us,
           max(epoch_us(ts))::BIGINT AS max_ts_us,
           round(sum(value), 2) AS sum_value,
           sum(length(props))::BIGINT AS sum_props_len
    FROM events GROUP BY event_type
"""
