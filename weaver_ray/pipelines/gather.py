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


def host_skew_stats(records_dir: str) -> pd.DataFrame:
    """CRAWL SKEW DIAGNOSTICS over the per-host fetch distribution — the
    measurable side of the north rule's "skew handled explicitly": the
    Gini coefficient of per-host URL counts plus the load share of the
    hottest host and the hottest decile of hosts.  These are the numbers
    that tell an operator whether LPT splitting / hot-host salting (the
    crawl's own mitigations, crawl.py) is warranted BEFORE a straggler
    shows up in wall-clock.

    Integer-exact parity: with ascending counts c_(1) <= .. <= c_(H) and
    T = sum c, the Gini rank form
        G = (2 * sum_i i*c_(i) - (H+1)*T) / (H*T)
    has integer numerator and denominator — exchanging equal counts
    between two ranks leaves sum i*c_(i) fixed, so tie order is
    irrelevant on both engines — and the top shares are integer count
    ratios; each final value is ONE float division, rounded 6 dp.

    Scale shape: ONE many_groups partial_groupby to per-host counts
    (O(hosts) — the gather/pagerank driver-state budget), exact fold on
    the driver."""
    counts = partial_groupby(read_records(records_dir, ["host", "url_hash"]),
                             ["host"], {"n": ("url_hash", "count")},
                             many_groups=True).to_pandas()
    c = np.sort(counts["n"].to_numpy(np.int64))
    H = len(c)
    T = int(c.sum())
    if H == 0 or T == 0:
        raise ValueError("host_skew_stats: no fetched records")
    i = np.arange(1, H + 1, dtype=np.int64)
    gini_num = 2 * int((i * c).sum()) - (H + 1) * T
    k = (H + 9) // 10  # ceil(H/10) hottest hosts, pure integer
    from .common import sql_round

    return pd.DataFrame({
        "n_hosts": np.asarray([H], np.int64),
        "n_urls": np.asarray([T], np.int64),
        "gini": sql_round(np.asarray([gini_num / (H * T)]), 6),
        "top1_share": sql_round(np.asarray([int(c[-1]) / T]), 6),
        "top_decile_share": sql_round(
            np.asarray([int(c[-k:].sum()) / T]), 6)})


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


def pagerank_priority_order(records_dir: str, n_base: int = 1000) -> rd.Dataset:
    """IMPORTANCE-ORDERED CRAWL SCHEDULING (Cho, Garcia-Molina & Page
    1998, "Efficient crawling through URL ordering"): re-rank every
    round's scheduled URLs by the PageRank of their target host — the
    published frontier-prioritization policy, applied as an auditable
    operator over the crawl's own records.

    Composition: :func:`pagerank.host_pagerank` supplies the rank vector
    (O(hosts) driver state — the pagerank budget; ray.put once, read via
    the per-worker broadcast cache), one map_batches attaches each
    record's host rank (host index parsed from the 'host-K.example'
    name, rank 0.0 for hosts outside the link graph on BOTH engines),
    and the within-round (pr desc, seq asc) rank rides
    :func:`common.global_row_number` — a distributed sort whose exchange
    ships one int per block — minus each round's base offset (a
    rounds-sized aggregate).  Rows never reach the driver."""
    import ray

    from .common import _cached_get, global_row_number, partial_groupby
    from .pagerank import host_pagerank

    pr = host_pagerank(records_dir, n_base)  # sf_dir unused: edge fixture
    H = int(pr["host"].max()) + 1 if len(pr) else 1
    prv = np.zeros(H, dtype=np.float64)
    if len(pr):
        prv[pr["host"].to_numpy(np.int64)] = pr["pr"].to_numpy(np.float64)
    pref = ray.put(prv)

    ds = read_records(records_dir, ["url_canon", "host", "round", "seq"])

    def attach(df: pd.DataFrame) -> pd.DataFrame:
        v = _cached_get(pref)
        # non-matching host names (anything not 'host-K...') -> sentinel
        # -1 -> rank 0.0, so the outside-the-graph contract covers them
        # instead of ValueError-ing inside the Ray task
        hidx = pd.to_numeric(
            df["host"].str.extract(r"host-(\d+)", expand=False),
            errors="coerce").fillna(-1).to_numpy(np.int64)
        p = np.where((hidx >= 0) & (hidx < len(v)),
                     v[np.clip(hidx, 0, len(v) - 1)], 0.0)
        return pd.DataFrame({
            "url_canon": df["url_canon"].astype("string"),
            "host": df["host"].astype("string"),
            "round": df["round"].to_numpy(np.int32),
            "seq": df["seq"].to_numpy(np.int64),
            "pr": p})

    keyed = ds.map_batches(attach, batch_format="pandas")
    ranked, _ = global_row_number(keyed, ["round", "pr", "seq"],
                                  descending=[False, True, False],
                                  rank_col="__g")
    ranked = ranked.materialize()  # consumed by the base map AND the finish
    base = partial_groupby(ranked, ["round"], {"m": ("__g", "min")}).to_pandas()
    base_map = dict(zip(base["round"].astype(np.int64),
                        base["m"].astype(np.int64)))

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        m = df["round"].astype(np.int64).map(base_map).to_numpy(np.int64)
        return pd.DataFrame({
            "url_canon": df["url_canon"].astype("string"),
            "host": df["host"].astype("string"),
            "round": df["round"].to_numpy(np.int32),
            "seq": df["seq"].to_numpy(np.int64),
            "pr": df["pr"].to_numpy(np.float64),
            "prio_rank": df["__g"].to_numpy(np.int64) - m})

    return ranked.map_batches(finish, batch_format="pandas")


# ONE home for the curation constants: the SQL builder in __ray_entry__
# imports these, so engine and oracle cannot drift apart
SHARD_HOST_CAP = 40
SHARD_BUDGET = 256
SHARD_MIN_CAPTION_TOKENS = 6
CAPTION_TOKEN_RE = r"[A-Za-z0-9_]+"


def curated_crawl_shards(records_dir: str, host_cap: int = SHARD_HOST_CAP,
                         budget: int = SHARD_BUDGET,
                         min_caption_tokens: int = SHARD_MIN_CAPTION_TOKENS,
                         num_buckets: int = 16) -> rd.Dataset:
    """CRAWL → CURATE → PACK, end to end over the crawl's OWN output —
    the full "web scrape to training shards" chain of a LAION-style
    image+caption pipeline, composed from audited pieces:

      fetched-ok records → integer size/aspect gate ∩ caption token gate
        → per-HOST retention cap (the domain-cap governance rule applied
          to crawl hosts, md5(image_id) hash rank — Zipf-hot hosts are
          exactly the ones the cap bites)
        → deterministic image_id order → token-budget shard packing
          (common.global_prefix_sum — one metadata-only scan exchange)

    Every leg is vectorized and mergeable: the gate is one map_batches;
    the cap ships ≤ hosts×cap rows per block (per-batch top-cap partials,
    then complete hosts per bucket); the packing scan never ships rows.
    The DuckDB oracle replays the identical chain over the identical
    records parquet (md5 rank, window row_number, window cumsum)."""
    from .common import global_prefix_sum, keyed_map_groups, md5_hex

    ds = read_records(records_dir, ["image_id", "host", "w", "h",
                                    "caption", "fetch_status"])

    def gate(df: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({
            "image_id": pd.Series([], dtype="string"),
            "host": pd.Series([], dtype="string"),
            "n_tokens": pd.Series([], dtype=np.int64),
            "rk": pd.Series([], dtype="string")})
        if not len(df):
            return empty
        ok = df["fetch_status"].to_numpy() == "ok"
        w = df["w"].to_numpy(np.int64)
        h = df["h"].to_numpy(np.int64)
        # integer-only size/aspect gate: no FP boundary to disagree on
        size_ok = (w >= 32) & (h >= 32) & (w <= 2 * h) & (h <= 2 * w)
        # ASCII \w class, NOT Python's Unicode \w: the oracle counts via
        # RE2, which is ASCII-only — a non-ASCII caption word must gate
        # identically on both engines
        ntok = df["caption"].str.count(CAPTION_TOKEN_RE).to_numpy(np.int64)
        keep = ok & size_ok & (ntok >= min_caption_tokens)
        sub = df[keep]
        return pd.DataFrame({
            "image_id": sub["image_id"].astype("string"),
            "host": sub["host"].astype("string"),
            "n_tokens": ntok[keep],
            "rk": pd.Series(md5_hex(sub["image_id"]), dtype="string",
                            index=sub.index),
        })

    gated = ds.map_batches(gate, batch_format="pandas")

    def cap_partial(df: pd.DataFrame) -> pd.DataFrame:
        # mergeable per-batch top-cap: at most host_cap rows per host leave
        # each batch, so the shuffle moves <= hosts*cap rows per block
        if not len(df):
            return df
        return (df.sort_values("rk").groupby("host", sort=False)
                .head(host_cap))

    def cap_final(g: pd.DataFrame) -> pd.DataFrame:
        if not len(g):
            return g[["image_id", "n_tokens"]]
        out = (g.sort_values("rk").groupby("host", sort=False)
               .head(host_cap))
        return out[["image_id", "n_tokens"]]

    capped = keyed_map_groups(gated.map_batches(cap_partial,
                                                batch_format="pandas"),
                              "host", cap_final, num_buckets)
    cum = global_prefix_sum(capped, ["image_id"], "n_tokens")

    def shardify(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "image_id": df["image_id"].astype("string"),
            "n_tokens": df["n_tokens"].to_numpy(np.int64),
            "shard": (df["cum_before"].to_numpy(np.int64) // budget),
        })

    return cum.map_batches(shardify, batch_format="pandas")
