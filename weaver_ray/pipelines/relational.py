"""Relational query pipelines over the driver test tables.

These re-express the reference's query-shaped behaviors (gather/merge/dedup
A1/J5/D2, per-key grouped stats, FIFO first-wins O1/O3 — SURVEY.md §2) as
Ray Data pipelines over the TPC-H-ish tables, each with a DuckDB oracle in
__ray_entry__.py.  Column names match the oracle SQL exactly; float
aggregates are rounded identically on both sides.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

from .common import (broadcast_join, hash_join, load, load_arrow,
                     partial_groupby, sql_round)


def q1_pricing_summary(sf_dir: str) -> pd.DataFrame:
    """TPC-H Q1 shape: grouped sums/avgs over lineitem with per-batch
    partial aggregation — the shuffle moves one row per (group, batch)."""
    ds = load(sf_dir, "lineitem",
              ["l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice",
               "l_discount", "l_tax"])

    # Exact integer grids (2 dp source decimals → cents): qty/price sum in
    # 1e-2 units, disc_price = p_e2·(100−d_e2) in 1e-4, charge = that
    # ·(100+t_e2) in 1e-6.  int64 sums are EXACT at any block count, so
    # engine and oracle agree bit-for-bit regardless of association —
    # float sums drifted past the 2 dp grid at ~1e11 magnitudes (caught
    # by tools/scale_stress.py on the sibling order_status_revenue).
    # Headroom: |c_e6| ≤ 1.2e11/row → int64 holds ~7.6e7 rows per batch
    # partial and ~7.6e7 partial rows in the reduce, far past any block.
    def add_derived(df: pd.DataFrame) -> pd.DataFrame:
        q = np.round(df["l_quantity"].to_numpy() * 100.0).astype(np.int64)
        p = np.round(df["l_extendedprice"].to_numpy() * 100.0).astype(np.int64)
        d = np.round(df["l_discount"].to_numpy() * 100.0).astype(np.int64)
        t = np.round(df["l_tax"].to_numpy() * 100.0).astype(np.int64)
        d_e4 = p * (100 - d)
        return df.assign(q_e2=q, p_e2=p, d_e4=d_e4, c_e6=d_e4 * (100 + t))

    out = partial_groupby(
        ds,
        ["l_returnflag", "l_linestatus"],
        {
            "sum_qty": ("q_e2", "sum"),
            "sum_base_price": ("p_e2", "sum"),
            "sum_disc_price": ("d_e4", "sum"),
            "sum_charge": ("c_e6", "sum"),
            "count_order": ("q_e2", "count"),
        },
        prep=add_derived,
    ).to_pandas()  # a handful of groups: finish driver-side, no extra operator

    n = out["count_order"].to_numpy(np.float64)
    # mirror the oracle's expression shape exactly: (sum/grid)/n
    out["avg_qty"] = sql_round(
        out["sum_qty"].to_numpy(np.float64) / 100.0 / n, 4)
    out["avg_price"] = sql_round(
        out["sum_base_price"].to_numpy(np.float64) / 100.0 / n, 4)
    for c, grid in (("sum_qty", 100.0), ("sum_base_price", 100.0),
                    ("sum_disc_price", 10000.0), ("sum_charge", 1000000.0)):
        out[c] = sql_round(out[c].to_numpy(np.float64) / grid, 2)
    out["count_order"] = out["count_order"].astype(np.int64)
    return out


def q6_revenue(sf_dir: str) -> pd.DataFrame:
    """Filtered global aggregate with filter pushed into the scan."""
    import pyarrow.dataset as pads

    flt = (
        (pads.field("l_discount") >= 0.05)
        & (pads.field("l_discount") <= 0.07)
        & (pads.field("l_quantity") < 24.0)
    )
    import os

    from .common import _require_rows

    path = os.path.join(sf_dir, "lineitem.parquet")
    _require_rows(path, "lineitem")
    ds = rd.read_parquet(
        path,
        columns=["l_extendedprice", "l_discount", "l_quantity"],
        filter=flt,
    )

    def rev(t: pa.Table) -> pa.Table:
        # exact 1e-4 grid: cents × discount-cents, int64 partial per batch
        # (same grid rationale as q1 — float sums drift past 2 dp at scale)
        p = np.round(t["l_extendedprice"].to_numpy() * 100.0).astype(np.int64)
        d = np.round(t["l_discount"].to_numpy() * 100.0).astype(np.int64)
        return pa.table({"rev_e4": [int((p * d).sum())], "n_part": [t.num_rows]})

    parts = ds.map_batches(rev, batch_format="pyarrow").to_pandas()
    return pd.DataFrame(
        {"revenue": [float(sql_round(float(parts["rev_e4"].sum()) / 10000.0, 2))],
         "n_rows": [np.int64(parts["n_part"].sum())]}
    )


def top_orders(sf_dir: str) -> pd.DataFrame:
    """Global top-k: per-block top-k then driver merge (never a full sort)."""
    ds = load(sf_dir, "orders", ["o_orderkey", "o_custkey", "o_totalprice"])
    k = 10

    def local_topk(df: pd.DataFrame) -> pd.DataFrame:
        return df.sort_values(["o_totalprice", "o_orderkey"], ascending=[False, True]).head(k)

    cand = ds.map_batches(local_topk, batch_format="pandas").to_pandas()
    out = cand.sort_values(["o_totalprice", "o_orderkey"], ascending=[False, True]).head(k)
    out = out.reset_index(drop=True)
    out["o_totalprice"] = sql_round(out["o_totalprice"], 2)
    return out


def mktsegment_revenue(sf_dir: str) -> pd.DataFrame:
    """Broadcast join: orders (big) x customer (small, ray.put once)."""
    orders = load(sf_dir, "orders", ["o_custkey", "o_totalprice"])
    cust = load_arrow(sf_dir, "customer", ["c_custkey", "c_mktsegment"])
    cust = cust.rename_columns(["o_custkey", "c_mktsegment"])
    joined = broadcast_join(orders, cust, on="o_custkey")

    def cents(df: pd.DataFrame) -> pd.DataFrame:
        # exact cents grid (q1 rationale): int64 sums are association-free
        return df.assign(price_e2=np.round(
            df["o_totalprice"].to_numpy() * 100.0).astype(np.int64))

    out = partial_groupby(
        joined, ["c_mktsegment"],
        {"revenue": ("price_e2", "sum"), "n_orders": ("price_e2", "count")},
        prep=cents,
    ).to_pandas()  # few groups: finish driver-side
    out["revenue"] = sql_round(out["revenue"].to_numpy(np.float64) / 100.0, 2)
    out["n_orders"] = out["n_orders"].astype(np.int64)
    return out


def order_status_revenue(sf_dir: str) -> pd.DataFrame:
    """Two large sides -> explicit partitioned hash join on l_orderkey, with
    the grouped aggregate pushed INTO the join buckets (each bucket emits
    one partial row per group; the driver folds the tiny partials) — the
    join shuffle is the only wide operation in the query."""
    li = load(sf_dir, "lineitem", ["l_orderkey", "l_extendedprice", "l_discount"])

    def add_rev(t: pa.Table) -> pa.Table:
        # exact 1e-4 grid rev = p_e2·(100−d_e2): int64 sums never drift —
        # the float version diverged past the 2 dp grid at 10x bench scale
        # (caught by tools/scale_stress.py, ~1e11 revenue magnitudes)
        p = np.round(t["l_extendedprice"].to_numpy() * 100.0).astype(np.int64)
        d = np.round(t["l_discount"].to_numpy() * 100.0).astype(np.int64)
        return pa.table({"l_orderkey": t["l_orderkey"],
                         "rev_e4": p * (100 - d)})

    li = li.map_batches(add_rev, batch_format="pyarrow")
    orders = load(sf_dir, "orders", ["o_orderkey", "o_orderstatus"]).map_batches(
        lambda t: t.rename_columns(["l_orderkey", "o_orderstatus"]), batch_format="pyarrow"
    )

    def agg_bucket(j: pd.DataFrame) -> pd.DataFrame:
        g = j.groupby("o_orderstatus", sort=False, observed=True)
        return pd.DataFrame(
            {"rev_e4": g["rev_e4"].sum(), "n_items": g.size()}
        ).reset_index()

    partials = hash_join(li, orders, on="l_orderkey",
                         lcols=["l_orderkey", "rev_e4"],
                         rcols=["l_orderkey", "o_orderstatus"],
                         num_buckets=16, post=agg_bucket).to_pandas()
    out = partials.groupby("o_orderstatus", sort=True).sum().reset_index()
    out["revenue"] = sql_round(out["rev_e4"].to_numpy(np.float64) / 10000.0, 2)
    out = out.drop(columns=["rev_e4"])
    out["n_items"] = out["n_items"].astype(np.int64)
    return out[["o_orderstatus", "revenue", "n_items"]]


def region_customer_counts(sf_dir: str) -> pd.DataFrame:
    """Chained broadcast joins through two tiny dims (customer->nation->region)."""
    cust = load(sf_dir, "customer", ["c_custkey", "c_nationkey"])
    nation = load_arrow(sf_dir, "nation", ["n_nationkey", "n_regionkey"])
    region = load_arrow(sf_dir, "region", ["r_regionkey", "r_name"])
    nation = nation.rename_columns(["c_nationkey", "n_regionkey"])
    j1 = broadcast_join(cust, nation, on="c_nationkey")
    region = region.rename_columns(["n_regionkey", "r_name"])
    j2 = broadcast_join(j1, region, on="n_regionkey")
    out = partial_groupby(j2, ["r_name"], {"n_customers": ("c_custkey", "count")}).to_pandas()
    out["n_customers"] = out["n_customers"].astype(np.int64)
    return out


def event_type_stats(sf_dir: str) -> pd.DataFrame:
    """Grouped counts+sums per event type (reference per-host crawl stats,
    SURVEY.md §2.5)."""
    ds = load(sf_dir, "events", ["event_type", "value"])
    out = partial_groupby(
        ds, ["event_type"],
        {"n_events": ("value", "count"), "sum_value": ("value", "sum")},
    ).to_pandas()
    out["sum_value"] = sql_round(out["sum_value"], 4)
    out["n_events"] = out["n_events"].astype(np.int64)
    return out


def distinct_event_types(sf_dir: str) -> pd.DataFrame:
    """Set-dedup (reference A2 distinct successors)."""
    vals = load(sf_dir, "events", ["event_type"]).unique("event_type")
    return pd.DataFrame({"event_type": sorted(vals)})


def first_event_per_user(sf_dir: str) -> rd.Dataset:
    """First-wins merge keyed by user (reference gather J5/D2,
    src/client/main.go:177-192): hash-partition by key, first row per group
    in deterministic (ts, event_id) order."""
    ds = load(sf_dir, "events", ["user_id", "ts", "event_id", "event_type"])

    def first_rows(bucket: pd.DataFrame) -> pd.DataFrame:
        # complete user groups per bucket: one sort + drop_duplicates
        # keeps each user's (ts, event_id)-first row, vectorized
        g = bucket.sort_values(["user_id", "ts", "event_id"]).drop_duplicates(
            "user_id")
        # epoch micros, explicitly: pandas datetime64 unit (ns vs us) varies
        # with the parquet reader, so never astype(int64) a datetime directly
        ts_us = g["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
        return pd.DataFrame(
            {
                "user_id": g["user_id"].to_numpy(),
                "first_ts_us": ts_us,
                "first_event_id": g["event_id"].to_numpy(),
                "first_event_type": g["event_type"].to_numpy(),
            }
        )

    from .common import keyed_map_groups

    return keyed_map_groups(ds, "user_id", first_rows)


def customers_without_orders(sf_dir: str) -> pd.DataFrame:
    """Anti join via broadcast key set (semi/anti joins never need a
    shuffle when one side's KEYS fit in memory — ray_guide joins; at 100 TB
    the key set becomes a bloom filter with an exact verify pass)."""
    import pyarrow.compute as pc
    import ray

    from .common import _cached_get

    custkeys = load_arrow(sf_dir, "orders", ["o_custkey"])
    keyset = ray.put(np.unique(custkeys.column("o_custkey").to_numpy()))
    cust = load(sf_dir, "customer", ["c_custkey", "c_name", "c_acctbal"])

    def anti_join(t: pa.Table) -> pa.Table:
        present = np.isin(t.column("c_custkey").to_numpy(), _cached_get(keyset))
        out = t.filter(pa.array(~present))
        return out.set_column(
            out.schema.get_field_index("c_acctbal"), "c_acctbal",
            # half_towards_infinity is pyarrow's half-away-from-zero
            # (verified: 2.5->3, -2.5->-3) = DuckDB round(); the default
            # is banker's (half_to_even), the repo-wide sql_round hazard
            pc.round(out.column("c_acctbal"), 2,
                     round_mode="half_towards_infinity"),
        )

    df = cust.map_batches(anti_join, batch_format="pyarrow").to_pandas()
    # pin columns + dtypes explicitly: Dataset.to_pandas() on an all-empty
    # result drops the schema entirely (a 0-column frame), so the empty path
    # must rebuild (int64, object, float64) to schema-match the oracle
    if df.empty:
        return pd.DataFrame(
            {"c_custkey": np.empty(0, np.int64),
             "c_name": pd.Series(np.empty(0, object)),
             "c_acctbal": np.empty(0, np.float64)}
        )
    return pd.DataFrame(
        {"c_custkey": df["c_custkey"].to_numpy(dtype=np.int64, copy=False),
         "c_name": df["c_name"].astype(object),
         "c_acctbal": df["c_acctbal"].to_numpy(dtype=np.float64, copy=False)}
    )


def suppliers_with_orders(sf_dir: str) -> rd.Dataset:
    """Semi join: suppliers that appear in lineitem (broadcast key set)."""
    import ray

    from .common import _cached_get

    suppkeys = load_arrow(sf_dir, "lineitem", ["l_suppkey"])
    keyset = ray.put(np.unique(suppkeys.column("l_suppkey").to_numpy()))
    supp = load(sf_dir, "supplier", ["s_suppkey", "s_name"])

    def semi_join(t: pa.Table) -> pa.Table:
        present = np.isin(t.column("s_suppkey").to_numpy(), _cached_get(keyset))
        return t.filter(pa.array(present))

    return supp.map_batches(semi_join, batch_format="pyarrow")


def earliest_events(sf_dir: str, k: int = 100) -> pd.DataFrame:
    """Global sort surfaced as a deterministic limit: ds.sort is the
    all-to-all range shuffle; the k-row head is the comparable artifact."""
    ds = load(sf_dir, "events", ["event_id", "ts", "user_id", "event_type"])
    out = ds.sort(["ts", "event_id"]).limit(k).to_pandas()
    out["ts_us"] = out["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
    return out.drop(columns=["ts"])


def event_sample_stats(sf_dir: str, fraction: float = 0.1) -> pd.DataFrame:
    """Seeded sampling — SELF-EVIDENCING (rows-only by design: the sample
    set is engine-defined, no SQL can reproduce it).  The returned row
    carries its own verdicts: ``deterministic`` re-runs the seeded sample
    on a fresh Dataset and compares the exact event_id multiset;
    ``fraction_ok`` checks the sample size against a 5-sigma binomial
    envelope around fraction * N."""
    ds = load(sf_dir, "events", ["event_id", "value"])
    df = ds.random_sample(fraction, seed=42).to_pandas()
    # determinism verdict: an independent Dataset, same seed, same rows?
    df2 = load(sf_dir, "events", ["event_id", "value"]) \
        .random_sample(fraction, seed=42).to_pandas()
    deterministic = bool(
        np.array_equal(np.sort(df["event_id"].to_numpy()),
                       np.sort(df2["event_id"].to_numpy()))
    )
    total = load(sf_dir, "events", ["event_id"]).count()
    sigma = (fraction * (1 - fraction) * total) ** 0.5
    fraction_ok = bool(abs(len(df) - fraction * total) <= 5 * sigma)
    return pd.DataFrame(
        {
            "n_sampled": [np.int64(len(df))],
            "sum_value": [round(float(df["value"].sum()), 4)],
            "min_event": [np.int64(df["event_id"].min()) if len(df) else np.int64(-1)],
            "deterministic": [deterministic],
            "fraction_ok": [fraction_ok],
        }
    )


def approx_distinct_users(sf_dir: str) -> pd.DataFrame:
    """Approximate distinct count via mergeable HLL sketches: one sketch per
    batch inside map_batches, register-max merge in a tiny reduce — the
    sketch-aggregate pattern (ray_guide 'Aggregation at scale').  Rows-only
    driver check; the pytest asserts <5% relative error vs exact."""
    from ..functions.sketches import HyperLogLog

    ds = load(sf_dir, "events", ["user_id"])

    def sketch(t: pa.Table) -> pa.Table:
        h = HyperLogLog()
        h.add(t.column("user_id").to_numpy(zero_copy_only=False).astype(np.uint64))
        return pa.table({"registers": pa.array([h.registers.tobytes()], pa.large_binary())})

    parts = ds.map_batches(sketch, batch_format="pyarrow").to_pandas()
    merged = HyperLogLog()
    for blob in parts["registers"]:
        other = HyperLogLog()
        other.registers = np.frombuffer(blob, dtype=np.uint8).copy()
        merged.merge(other)
    exact = len(load(sf_dir, "events", ["user_id"]).unique("user_id"))
    approx = int(round(merged.estimate()))
    # SELF-EVIDENCING verdict: HLL with 2^12 registers has ~1.6% standard
    # error; error_ok asserts the observed relative error is inside 5%
    # (the same bound the pytest enforces), carried in-row so the driver
    # battery records the pass/fail without an oracle
    rel_error = abs(approx - exact) / max(exact, 1)
    return pd.DataFrame(
        {
            "n_users_approx": [np.int64(approx)],
            "n_users_exact": [np.int64(exact)],
            "rel_error": [round(float(rel_error), 6)],
            "error_ok": [bool(rel_error < 0.05)],
        }
    )


def user_hourly_windows(sf_dir: str) -> rd.Dataset:
    """Tumbling event-time windows (streaming-shaped workload, ray_guide):
    partition by user, tumble ts into 1-hour buckets inside map_groups."""
    ds = load(sf_dir, "events", ["user_id", "ts", "value"])

    def windows(bucket: pd.DataFrame) -> pd.DataFrame:
        # complete user groups per bucket: tumble + aggregate every
        # (user, hour) window in one vectorized groupby
        ts_us = bucket["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
        gg = bucket.assign(window_hour=ts_us // 3_600_000_000).groupby(
            ["user_id", "window_hour"], sort=False)
        out = gg.agg(n_events=("value", "size"), sum_value=("value", "sum")).reset_index()
        out["sum_value"] = sql_round(out["sum_value"], 4)
        out["n_events"] = out["n_events"].astype(np.int64)
        return out

    from .common import keyed_map_groups

    return keyed_map_groups(ds, "user_id", windows)


def price_quantiles(sf_dir: str,
                    qs: tuple = (0.25, 0.5, 0.9, 0.99),
                    collect_budget: int = 5_000_000,
                    method: str = "disc") -> pd.DataFrame:
    """EXACT distributed quantiles over lineitem.l_extendedprice by
    iterative histogram selection — a selection problem, not a sort:

    1. one pass for (count, min, max) partials (one tiny row per batch);
    2. one pass summing per-batch 8192-bucket histograms (each batch emits
       ONE fixed-size uint64 vector; at cluster scale the sum becomes a
       tree reduce — the driver never sees row data);
    3. one pass collecting only the values inside the few buckets that
       contain target ranks (n/8192-sized slices).  If duplicates pile a
       bucket past the collect budget, the histogram recurses INSIDE that
       bucket's range instead of collecting it.

    A full ``sort`` would move every row; this moves O(batches * 64 KB)
    histogram partials + O(n/8192) refined values.  Rank rule matches
    DuckDB ``quantile_disc``: sorted[max(0, ceil(q*n) - 1)] (pinned
    empirically; oracle in __ray_entry__.py)."""
    B = 8192

    ds = load(sf_dir, "lineitem", ["l_extendedprice"]).materialize()

    def stats(df: pd.DataFrame) -> pd.DataFrame:
        x = df["l_extendedprice"].to_numpy()
        return pd.DataFrame({"n": [len(x)],
                             "lo": [x.min() if len(x) else np.inf],
                             "hi": [x.max() if len(x) else -np.inf]})

    st = ds.map_batches(stats, batch_format="pandas").to_pandas()
    n = int(st["n"].sum())
    if n == 0:
        return pd.DataFrame({"quantile": pd.Series(qs, dtype=np.float64),
                             "value": pd.Series([np.nan] * len(qs))})
    ranks = {q: max(0, int(np.ceil(q * n)) - 1) for q in qs}  # 0-based

    # membership is defined by the bucket-INDEX chain, never by a range
    # re-filter: a value exactly on a child-range edge can land in the
    # neighbor bucket under FP division, so a `lo2 <= x <= hi2` filter at
    # the next level would disagree with the parent's counts and shift
    # ranks.  Every pass below filters by "idx(level_i) == b_i for all
    # recursion levels so far" using the identical arithmetic, which
    # partitions the parent bucket EXACTLY.
    def _level_idx(x: np.ndarray, lo: float, width: float) -> np.ndarray:
        return np.clip((((x - lo) / width) * B).astype(np.int64), 0, B - 1)

    def _chain_mask(x: np.ndarray, chain: list) -> np.ndarray:
        keep = np.ones(len(x), dtype=bool)
        for clo, cwidth, cb in chain:
            keep &= _level_idx(x, clo, cwidth) == cb
        return keep

    def histogram(chain: list, lo: float, width: float) -> np.ndarray:
        def hist(df: pd.DataFrame) -> pd.DataFrame:
            x = df["l_extendedprice"].to_numpy()
            x = x[_chain_mask(x, chain)]
            return pd.DataFrame({"h": [np.bincount(_level_idx(x, lo, width),
                                                   minlength=B)
                                       .astype(np.int64).tobytes()]})

        parts = ds.map_batches(hist, batch_format="pandas").to_pandas()
        return np.sum([np.frombuffer(b, dtype=np.int64) for b in parts["h"]],
                      axis=0)

    def collect_bucket(chain: list) -> np.ndarray:
        def coll(df: pd.DataFrame) -> pd.DataFrame:
            x = df["l_extendedprice"].to_numpy()
            return pd.DataFrame({"v": x[_chain_mask(x, chain)]})

        return np.sort(
            ds.map_batches(coll, batch_format="pandas").to_pandas()["v"]
            .to_numpy())

    def distinct_in_bucket(chain: list) -> pd.Series:
        """(value -> count) — a partial-aggregation pass that moves only
        DISTINCT values, so a bucket holding millions of copies of a
        handful of prices (the duplicate pile-up a range split cannot
        separate) resolves exactly without collecting the copies."""

        def vc(df: pd.DataFrame) -> pd.DataFrame:
            x = df["l_extendedprice"].to_numpy()
            u, c = np.unique(x[_chain_mask(x, chain)], return_counts=True)
            return pd.DataFrame({"v": u, "c": c.astype(np.int64)})

        parts = ds.map_batches(vc, batch_format="pandas").to_pandas()
        return parts.groupby("v")["c"].sum().sort_index()

    def rank_in_distinct(chain: list, within: int) -> float:
        g = distinct_in_bucket(chain)
        j = int(np.searchsorted(np.cumsum(g.to_numpy()), within + 1))
        return float(g.index[j])

    # one full-range histogram resolves most quantiles; a bucket past the
    # collect budget recurses with its own narrowed level — per-quantile,
    # so multiple heavy buckets cannot shadow each other
    lo0, hi0 = float(st["lo"].min()), float(st["hi"].max())
    width0 = (hi0 - lo0) or 1.0
    counts0 = histogram([], lo0, width0)
    cum0 = np.cumsum(counts0)

    def resolve(rank: int) -> float:
        chain: list = []
        lo, width, counts, cum = lo0, width0, counts0, cum0
        for _ in range(12):  # ranges shrink 8192x per level
            b = int(np.searchsorted(cum, rank + 1))
            within = rank - (int(cum[b - 1]) if b else 0)
            level = chain + [(lo, width, b)]
            if int(counts[b]) <= collect_budget:
                return float(collect_bucket(level)[within])
            lo2 = lo + width * b / B
            width2 = width / B
            if width2 < abs(lo2) * 1e-12 or width2 == 0.0:
                # too narrow to split further: duplicate pile-up —
                # resolve by rank over the distinct-value histogram
                return rank_in_distinct(level, within)
            chain, lo, width, rank = level, lo2, width2, within
            counts = histogram(chain, lo, width)
            cum = np.cumsum(counts)
        # depth exhausted (adversarially clustered doubles): same exact
        # distinct-histogram resolution over the final narrowed bucket
        b = int(np.searchsorted(cum, rank + 1))
        within = rank - (int(cum[b - 1]) if b else 0)
        return rank_in_distinct(chain + [(lo, width, b)], within)

    if method == "cont":
        # percentile_cont: interpolate between the two order statistics
        # around pos = q*(n-1) — the SAME rank-selection machinery resolves
        # both neighbors (memoized: adjacent quantiles share elements)
        cache: dict[int, float] = {}

        def at(rank: int) -> float:
            if rank not in cache:
                cache[rank] = resolve(rank)
            return cache[rank]

        vals = []
        for q in qs:
            pos = q * (n - 1)
            lo_r, hi_r = int(np.floor(pos)), int(np.ceil(pos))
            v_lo = at(lo_r)
            v_hi = v_lo if hi_r == lo_r else at(hi_r)
            vals.append(v_lo + (pos - lo_r) * (v_hi - v_lo))
        return pd.DataFrame({
            "quantile": pd.Series(list(qs), dtype=np.float64),
            "value": pd.Series(sql_round(vals, 4), dtype=np.float64),
        })

    return pd.DataFrame({
        "quantile": pd.Series(list(qs), dtype=np.float64),
        "value": pd.Series([resolve(r) for r in
                            (ranks[q] for q in qs)], dtype=np.float64),
    })


def price_quantiles_cont(sf_dir: str,
                         qs: tuple = (0.25, 0.5, 0.9, 0.99)) -> pd.DataFrame:
    """Interpolated (``percentile_cont``) quantiles: the disc machinery's
    rank selection applied to the two order statistics around q*(n-1), then
    linear interpolation — still O(histogram partials), never a sort."""
    return price_quantiles(sf_dir, qs, method="cont")


def event_funnel(sf_dir: str, steps: tuple[str, ...] = ("view", "click",
                                                        "purchase"),
                 num_buckets: int = 16) -> rd.Dataset:
    """Sequential FUNNEL analysis — for each user, how far through the
    ordered step list (view -> click -> purchase by default) they got,
    with earliest-completion semantics: step i+1 counts only if it
    happens STRICTLY AFTER the earliest completion of step i (the
    standard product-analytics funnel, an operator Ray Data has no
    native form for).

    Scale shape: one hash shuffle keyed by user_id (keyed_map_groups —
    a user's events land whole in one bucket), then the chain of
    earliest-step timestamps is computed VECTORIZED per bucket: step
    1 is a groupby-min over that step's events; each later step is a
    merge against the previous step's times, a strict-greater mask,
    and another groupby-min — never a per-user Python loop.  Output is
    (user_id, steps_completed) for every user who completed step 1."""
    from .common import keyed_map_groups

    ds = load(sf_dir, "events", ["user_id", "event_type", "ts"])

    def funnel(bucket: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({"user_id": pd.Series([], dtype=np.int64),
                              "steps_completed": pd.Series([], dtype=np.int64)})
        if not len(bucket):
            return empty
        prev = None  # Series: user_id -> earliest completion of prior step
        counts = None
        for step in steps:
            ev = bucket[bucket["event_type"] == step]
            if prev is not None:
                t_prev = ev["user_id"].map(prev)
                ev = ev[ev["ts"] > t_prev]
            cur = ev.groupby("user_id", sort=False)["ts"].min()
            if prev is None:
                counts = pd.Series(1, index=cur.index, dtype=np.int64)
            else:
                counts.loc[counts.index.intersection(cur.index)] += 1
            prev = cur
            if not len(cur):
                break
        if counts is None or not len(counts):
            return empty
        out = counts.reset_index()
        out.columns = ["user_id", "steps_completed"]
        out["user_id"] = out["user_id"].astype(np.int64)
        return out

    return keyed_map_groups(ds, "user_id", funnel, num_buckets)


def orders_above_customer_avg(sf_dir: str, num_buckets: int = 16) -> rd.Dataset:
    """Correlated-subquery shape — ``WHERE o_totalprice > (SELECT
    avg(o_totalprice) FROM orders o2 WHERE o2.o_custkey = o.o_custkey)``
    — decorrelated the way a distributed planner would: ONE partial-agg
    pass builds per-customer (sum, count), the avg side joins back to
    orders through the bucketed hash join, and the predicate evaluates
    vectorized inside each bucket.  The boundary compares on a 1e-6
    half-away grid of (price - avg) on BOTH engines, so an order landing
    exactly on its customer's average (every single-order customer!) is
    excluded identically regardless of FP summation order."""
    from .common import hash_join, partial_groupby, sql_round

    orders = load(sf_dir, "orders", ["o_orderkey", "o_custkey", "o_totalprice"])
    avgs = partial_groupby(orders, ["o_custkey"],
                           {"s": ("o_totalprice", "sum"),
                            "n": ("o_orderkey", "count")}, many_groups=True)

    def keep(j: pd.DataFrame) -> pd.DataFrame:
        if not len(j):
            return pd.DataFrame({"o_orderkey": pd.Series([], dtype=np.int64),
                                 "o_custkey": pd.Series([], dtype=np.int64),
                                 "o_totalprice": pd.Series([], dtype=np.float64)})
        diff = sql_round(j["o_totalprice"].to_numpy(np.float64)
                         - j["s"].to_numpy(np.float64)
                         / j["n"].to_numpy(np.float64), 6)
        out = j.loc[diff > 0, ["o_orderkey", "o_custkey", "o_totalprice"]].copy()
        out["o_orderkey"] = out["o_orderkey"].astype(np.int64)
        out["o_custkey"] = out["o_custkey"].astype(np.int64)
        return out

    return hash_join(orders, avgs, on="o_custkey",
                     lcols=["o_orderkey", "o_custkey", "o_totalprice"],
                     rcols=["o_custkey", "s", "n"],
                     num_buckets=num_buckets, post=keep)


def _sketch_cumhist(sf_dir: str, n_bins: int, vmax: float) -> np.ndarray:
    """One-pass mergeable fixed-width histogram over events.value:
    per-batch sparse bincount partials, one additive reduce, cumulative
    counts on the driver (O(n_bins) state)."""
    ds = load(sf_dir, "events", ["value"])

    def hist(df: pd.DataFrame) -> pd.DataFrame:
        v = df["value"].to_numpy(np.float64)
        b = np.clip(np.floor(v * float(n_bins) / vmax).astype(np.int64),
                    0, n_bins - 1)
        cnt = np.bincount(b, minlength=n_bins)
        nz = np.flatnonzero(cnt)  # sparse partials: only occupied bins move
        return pd.DataFrame({"bin": nz.astype(np.int64),
                             "n": cnt[nz].astype(np.int64)})

    g = partial_groupby(ds.map_batches(hist, batch_format="pandas"),
                        ["bin"], {"n": ("n", "sum")},
                        many_groups=True).to_pandas()
    counts = np.zeros(n_bins, dtype=np.int64)
    counts[g["bin"].to_numpy(np.int64)] = g["n"].to_numpy(np.int64)
    return np.cumsum(counts)


def _sketch_quantile(cum: np.ndarray, q: float, n_bins: int,
                     vmax: float) -> tuple[int, float]:
    """Rank k = ceil(q*n); estimate = LEFT EDGE of the rank-bearing bin
    (the same ceil/searchsorted arithmetic the SQL oracle replays)."""
    n = int(cum[-1])
    k = int(np.ceil(q * n))
    b = int(np.searchsorted(cum, k))
    return k, b * vmax / float(n_bins)


# histogram-sketch geometry + partition fan-out shared by the engine
# defaults AND the registered SQL oracles (one source of truth — the
# ASPECT_BUCKETS injection precedent), so a changed constant can't
# silently desynchronize the parity check
SKETCH_BINS = 8192
SKETCH_VMAX = 500.0
RANGE_PARTS = 8


def value_quantile_sketch(sf_dir: str, n_bins: int = SKETCH_BINS,
                          vmax: float = SKETCH_VMAX) -> pd.DataFrame:
    """ONE-PASS mergeable quantile SKETCH over events.value — the
    approximate complement of the exact iterative-refinement
    price_quantiles: a fixed-width histogram sketch (n_bins counters over
    the declared [0, vmax) domain) whose per-batch partials merge by
    addition, so a 100-TB pass needs exactly one reduction and O(n_bins)
    driver state; the estimate for rank k = ceil(q*n) is the LEFT EDGE of
    the rank-bearing bucket, biased low by at most one bin width
    (vmax/n_bins ~ 0.06 here — the error bound is part of the contract
    and pinned by a pytest against the exact order statistic).

    The sketch is DETERMINISTIC (no sampling), so it carries a full SQL
    oracle that replays the identical bucket arithmetic — the expression
    ``floor(value * n_bins / vmax)`` is written the same on both engines
    so IEEE rounding agrees bit-for-bit."""
    cum = _sketch_cumhist(sf_dir, n_bins, vmax)
    n = int(cum[-1])
    qs = (0.25, 0.5, 0.75, 0.9, 0.99)
    rows = []
    for q in qs:
        k, est = _sketch_quantile(cum, q, n_bins, vmax)
        rows.append((q, k, est))
    from .common import sql_round

    out = pd.DataFrame(rows, columns=["q", "rank", "est_value"])
    out["rank"] = out["rank"].astype(np.int64)
    # sql_round, NOT .round(): bin edges b*500/8192 land on an exact 5 at
    # the 7th decimal for every b % 32 == 16 (e.g. sf0.1's q=0.9 bin 1872
    # -> 114.2578125), where banker's rounding diverges from DuckDB
    out["est_value"] = sql_round(out["est_value"], 6)
    return out


def range_partition_bounds(sf_dir: str, n_parts: int = RANGE_PARTS,
                           n_bins: int = SKETCH_BINS,
                           vmax: float = SKETCH_VMAX) -> pd.DataFrame:
    """RANGE-PARTITION PLANNING — the equi-depth boundary computation
    behind every distributed sort / range shuffle (Ray Data's sort does
    this by sampling; here it is exact-on-the-sketch and therefore fully
    SQL-checkable, per the north rule's "partitioning handled
    explicitly").  Boundary i (1..P-1) is the left edge of the histogram
    bin bearing rank ceil(i*n/P) — INTEGER ceil ((i*n + P - 1) // P), so
    no FP enters rank selection — and every row's partition id is the
    count of boundaries <= value (two searchsorted calls per batch).  A
    second mergeable count pass certifies the plan: per-partition row
    counts ride sparse bincount partials, and ALL P partitions are
    emitted (empty ones prove skew) with their [lo, hi) ranges.  Bin
    edges b*vmax/n_bins are exact dyadic doubles (n_bins a power of
    two), so the >= comparisons agree bit-for-bit with DuckDB."""
    from .common import load

    cum = _sketch_cumhist(sf_dir, n_bins, vmax)
    n = int(cum[-1])
    ks = [(i * n + n_parts - 1) // n_parts for i in range(1, n_parts)]
    bounds = np.asarray(
        [int(np.searchsorted(cum, k)) * vmax / float(n_bins) for k in ks],
        dtype=np.float64)

    ds = load(sf_dir, "events", ["value"])

    def pid_counts(df: pd.DataFrame) -> pd.DataFrame:
        v = df["value"].to_numpy(np.float64)
        pid = np.searchsorted(bounds, v, side="right")
        cnt = np.bincount(pid, minlength=n_parts)
        nz = np.flatnonzero(cnt)
        return pd.DataFrame({"pid": nz.astype(np.int64),
                             "n_rows": cnt[nz].astype(np.int64)})

    g = partial_groupby(ds.map_batches(pid_counts, batch_format="pandas"),
                        ["pid"], {"n_rows": ("n_rows", "sum")},
                        many_groups=True).to_pandas()
    rows = np.zeros(n_parts, dtype=np.int64)
    rows[g["pid"].to_numpy(np.int64)] = g["n_rows"].to_numpy(np.int64)
    lo = np.concatenate(([0.0], bounds))
    hi = np.concatenate((bounds, [float(vmax)]))
    return pd.DataFrame({
        "pid": np.arange(n_parts, dtype=np.int64),
        "lo": lo, "hi": hi, "n_rows": rows})


# rendezvous-hashing contract shared by the engine default AND the
# registered SQL oracle (one source of truth): shard fan-out
HRW_SHARDS = 8


def rendezvous_assign(sf_dir: str, n_shards: int = HRW_SHARDS) -> rd.Dataset:
    """RENDEZVOUS (highest-random-weight) HASHING (Thaler & Ravishankar
    1998) — the consistent key->shard routing the reference's chord ring
    provides (T3/T5), as a checkable per-key assignment: each doc goes
    to argmax_s md5(doc_id || '|' || s), so when a shard leaves, ONLY
    its keys move (minimal disruption — the property the pytest pins by
    re-assigning at n_shards-1 and asserting every surviving key stays
    put).  Weights compare as the md5's first 16 hex chars — fixed-width
    lowercase hex orders identically as a STRING on both engines, so
    parity needs no integer conversion at all; the (weight desc, shard
    asc) tiebreak is total.

    Scale shape: stateless per-row math — ONE map_batches pass, zero
    shuffles, no broadcast; exactly the property that makes HRW the
    scale-out routing choice (any worker can route any key with no ring
    state)."""
    from .common import load, md5_hex

    ds = load(sf_dir, "documents", ["doc_id"])

    def assign(df: pd.DataFrame) -> pd.DataFrame:
        did = df["doc_id"].to_numpy(np.int64)
        if not len(did):
            return pd.DataFrame({"doc_id": pd.Series([], dtype=np.int64),
                                 "shard": pd.Series([], dtype=np.int64),
                                 "weight": pd.Series([], dtype="string")})
        # (rows, shards) weight matrix of 16-hex prefixes
        w = np.array([[h[:16] for h in md5_hex(
            [f"{d}|{s}" for d in did])] for s in range(n_shards)])
        best = np.argmax(w, axis=0)  # ties -> lowest shard (argmax rule)
        return pd.DataFrame({
            "doc_id": did,
            "shard": best.astype(np.int64),
            "weight": pd.Series(w[best, np.arange(len(did))],
                                dtype="string")})

    return ds.map_batches(assign, batch_format="pandas")


def rendezvous_assign_sql(n_shards: int = HRW_SHARDS) -> str:
    """The DuckDB oracle: cross-join docs x shards, the identical
    md5-prefix weight, argmax via row_number (weight desc, shard asc)."""
    return f"""
        WITH w AS (
            SELECT d.doc_id, s.s AS shard,
                   substr(md5(CAST(d.doc_id AS VARCHAR)
                              || '|' || CAST(s.s AS VARCHAR)), 1, 16)
                       AS weight
            FROM documents d, range(0, {n_shards}) s(s)
        )
        SELECT doc_id, CAST(shard AS BIGINT) AS shard, weight
        FROM (SELECT *, row_number() OVER (
                  PARTITION BY doc_id
                  ORDER BY weight DESC, shard) AS rn FROM w)
        WHERE rn = 1
    """


def winsorized_value_stats(sf_dir: str, n_bins: int = SKETCH_BINS,
                           vmax: float = SKETCH_VMAX, q_lo: float = 0.01,
                           q_hi: float = 0.99) -> pd.DataFrame:
    """WINSORIZED per-type statistics — the outlier-robust mean every
    metrics pipeline wants: values are clipped to the [P1, P99] caps
    BEFORE aggregating, with the caps coming from the deterministic
    one-pass histogram sketch (:func:`_sketch_cumhist`), so the whole
    composition — sketch -> clip transform -> grouped aggregate — stays
    fully SQL-oracled (the oracle recomputes the identical caps from the
    identical bucket arithmetic and clips with least/greatest on the
    same IEEE doubles).  Two passes over events total; both are one-pass
    mergeable-partial shapes."""
    from .common import sql_round

    cum = _sketch_cumhist(sf_dir, n_bins, vmax)
    _, lo = _sketch_quantile(cum, q_lo, n_bins, vmax)
    _, hi = _sketch_quantile(cum, q_hi, n_bins, vmax)

    ds = load(sf_dir, "events", ["event_type", "value"])

    def prep(df: pd.DataFrame) -> pd.DataFrame:
        return df.assign(w=np.clip(df["value"].to_numpy(np.float64), lo, hi))

    out = partial_groupby(ds, ["event_type"],
                          {"n": ("w", "count"), "s": ("w", "sum")},
                          prep=prep).to_pandas()
    return pd.DataFrame({
        "event_type": out["event_type"],
        "n": out["n"].astype(np.int64),
        "mean_winsorized": sql_round(out["s"] / out["n"], 4),
        "cap_lo": np.full(len(out), sql_round(lo, 6)),
        "cap_hi": np.full(len(out), sql_round(hi, 6)),
    }).sort_values("event_type").reset_index(drop=True)


INCR_CUTOFF_US = 1_706_140_800_000_000  # 2024-01-25T00:00:00Z (epoch us)


def incremental_event_stats(sf_dir: str,
                            state_root: str = "/tmp/weaver_state") -> pd.DataFrame:
    """INCREMENTAL VIEW MAINTENANCE of a grouped aggregate — the streaming
    -ingest pattern: events before a fixed cutoff are the "already
    ingested" history whose MERGEABLE partials are checkpointed to
    parquet ONCE; every later run scans only the post-cutoff delta and
    folds it into the checkpointed state (sum/count partials merge by
    addition — the whole point of the partial-aggregation design).  The
    DuckDB oracle is the full recompute over all events, so the
    value-hash equality certifies merged-state == full-recompute.

    Both scans push the cutoff filter into the parquet read (only the
    needed row groups leave storage).  The checkpoint is one row per
    group — metadata-sized; at 100 TB the delta scan is the only data
    touched per refresh."""
    import hashlib
    import os

    import pyarrow.dataset as pads
    import pyarrow.parquet as papq

    from .common import sql_round

    # key includes the source file's identity (mtime_ns + size), so a
    # regenerated events.parquet invalidates the checkpoint instead of
    # silently merging stale pre-cutoff partials
    st = os.stat(os.path.join(sf_dir, "events.parquet"))
    key = hashlib.md5(
        f"{os.path.abspath(sf_dir)}|{st.st_mtime_ns}|{st.st_size}".encode()
    ).hexdigest()[:12]
    state = os.path.join(state_root, f"incr_event_stats_{key}.parquet")

    def partials_for(flt) -> pd.DataFrame:
        import os as _os

        from .common import _require_rows

        path = _os.path.join(sf_dir, "events.parquet")
        _require_rows(path, "events")
        ds = rd.read_parquet(path,
                             columns=["event_type", "value", "ts"],
                             filter=flt)
        g = partial_groupby(ds, ["event_type"],
                            {"n": ("value", "count"), "s": ("value", "sum")},
                            many_groups=True).to_pandas()
        if "event_type" not in g.columns:  # all-empty Dataset drops schema
            g = pd.DataFrame({"event_type": pd.Series([], dtype=object),
                              "n": pd.Series([], dtype=np.int64),
                              "s": pd.Series([], dtype=np.float64)})
        return g

    cutoff = np.datetime64(INCR_CUTOFF_US, "us")
    if not os.path.exists(state):
        os.makedirs(state_root, exist_ok=True)
        base = partials_for(pads.field("ts") < cutoff)
        tmp = f"{state}.{os.getpid()}.tmp"  # unique per writer: two
        # concurrent first runs each write their own tmp; both renames
        # commit identical deterministic content
        papq.write_table(pa.Table.from_pandas(base, preserve_index=False), tmp)
        os.replace(tmp, state)  # atomic commit, torn writes invisible

    base = papq.read_table(state).to_pandas()
    delta = partials_for(pads.field("ts") >= cutoff)
    merged = (pd.concat([base, delta], ignore_index=True)
              .groupby("event_type", as_index=False)[["n", "s"]].sum())
    return pd.DataFrame({
        "event_type": merged["event_type"],
        "n_events": merged["n"].astype(np.int64),
        "sum_value": sql_round(merged["s"], 4),
    }).sort_values("event_type").reset_index(drop=True)


# robust-outlier contract shared with the SQL oracle: MAD multiplier
MAD_K = 3


def value_mad_outliers(sf_dir: str, n_bins: int = SKETCH_BINS,
                       vmax: float = SKETCH_VMAX,
                       k_mad: int = MAD_K) -> pd.DataFrame:
    """GROUPED ROBUST OUTLIER statistics — per event_type: the sketch
    median of ``value``, the sketch MAD (median absolute deviation, the
    robust dispersion every anomaly gate wants when stddev is poisoned
    by the outliers it hunts), and the count of values deviating more
    than ``k_mad`` MADs.

    Everything derives from the deterministic fixed-width histogram
    (:func:`value_quantile_sketch`'s machinery, now PER GROUP): median =
    left edge of the ceil-rank bin with k = (n+1)//2 in pure integers;
    deviations re-bin against that exact dyadic edge (vmax/n_bins is a
    power-of-two quotient, so edge values and the |v - med| subtraction
    are the same IEEE doubles on both engines); the outlier threshold is
    the INTEGER bin bound k_mad * mad_bin (never a float multiple —
    3*mad re-binned could land one ulp across a bin edge), so outliers =
    deviations in bins strictly greater.  Fully SQL-replayable with no
    rounding grid.  Two one-pass mergeable-partial scans, per-(type,
    bin) sparse partials; driver state O(types x occupied bins)."""
    ds = load(sf_dir, "events", ["event_type", "value"])

    def hist1(df: pd.DataFrame) -> pd.DataFrame:
        b = np.clip(np.floor(df["value"].to_numpy(np.float64)
                             * float(n_bins) / vmax).astype(np.int64),
                    0, n_bins - 1)
        g = (pd.DataFrame({"event_type": df["event_type"].to_numpy(object),
                           "bin": b})
             .groupby(["event_type", "bin"], sort=False)
             .size().rename("n").reset_index())
        g["n"] = g["n"].astype(np.int64)
        return g

    h1 = partial_groupby(ds.map_batches(hist1, batch_format="pandas"),
                         ["event_type", "bin"], {"n": ("n", "sum")},
                         many_groups=True).to_pandas()
    h1["n"] = h1["n"].astype(np.int64)

    def rank_bin(h: pd.DataFrame) -> dict:
        """Per type: the bin holding integer rank (n+1)//2 (ceil-median)."""
        out = {}
        for t, g in h.groupby("event_type", sort=False):
            g = g.sort_values("bin")
            cum = g["n"].cumsum().to_numpy(np.int64)
            k = (int(cum[-1]) + 1) // 2
            out[t] = int(g["bin"].to_numpy(np.int64)[
                np.searchsorted(cum, k)])
        return out

    med_bin = rank_bin(h1)
    med = {t: b * vmax / float(n_bins) for t, b in med_bin.items()}

    def hist2(df: pd.DataFrame) -> pd.DataFrame:
        m = df["event_type"].map(med).to_numpy(np.float64)
        dev = np.abs(df["value"].to_numpy(np.float64) - m)
        b = np.clip(np.floor(dev * float(n_bins) / vmax).astype(np.int64),
                    0, n_bins - 1)
        g = (pd.DataFrame({"event_type": df["event_type"].to_numpy(object),
                           "bin": b})
             .groupby(["event_type", "bin"], sort=False)
             .size().rename("n").reset_index())
        g["n"] = g["n"].astype(np.int64)
        return g

    h2 = partial_groupby(ds.map_batches(hist2, batch_format="pandas"),
                         ["event_type", "bin"], {"n": ("n", "sum")},
                         many_groups=True).to_pandas()
    h2["n"] = h2["n"].astype(np.int64)
    mad_bin = rank_bin(h2)

    rows = []
    for t in sorted(med_bin):
        g = h2[h2["event_type"] == t]
        n = int(g["n"].sum())
        thr = k_mad * mad_bin[t]  # INTEGER bin bound, never a float
        n_out = int(g.loc[g["bin"] > thr, "n"].sum())
        rows.append((t, n, med[t], mad_bin[t] * vmax / float(n_bins),
                     n_out))
    out = pd.DataFrame(rows, columns=["event_type", "n", "med_est",
                                      "mad_est", "n_outliers"])
    out["n"] = out["n"].astype(np.int64)
    out["n_outliers"] = out["n_outliers"].astype(np.int64)
    return out


def value_mad_outliers_sql(n_bins: int = SKETCH_BINS,
                           vmax: float = SKETCH_VMAX,
                           k_mad: int = MAD_K) -> str:
    """DuckDB oracle: the identical two-level bucket arithmetic —
    per-type cumulative bins, integer ceil-rank medians, deviation
    re-bin against the exact dyadic edge, integer-bin outlier bound."""
    return f"""
        WITH b1 AS (
            SELECT event_type,
                   least(greatest(floor(value * {n_bins} / {vmax})::BIGINT,
                                  0), {n_bins - 1}) AS bin
            FROM events
        ),
        h1 AS (SELECT event_type, bin, count(*)::BIGINT AS n
               FROM b1 GROUP BY event_type, bin),
        c1 AS (SELECT event_type, bin, n,
                      sum(n) OVER (PARTITION BY event_type ORDER BY bin)
                          AS cum,
                      sum(n) OVER (PARTITION BY event_type) AS tot
               FROM h1),
        m AS (SELECT event_type, min(bin) AS mb, any_value(tot) AS n
              FROM c1 WHERE cum >= (tot + 1) // 2 GROUP BY event_type),
        b2 AS (
            SELECT e.event_type,
                   least(greatest(floor(abs(e.value - m.mb * {vmax}
                                            / {n_bins})
                                        * {n_bins} / {vmax})::BIGINT,
                                  0), {n_bins - 1}) AS bin
            FROM events e JOIN m ON m.event_type = e.event_type
        ),
        h2 AS (SELECT event_type, bin, count(*)::BIGINT AS n
               FROM b2 GROUP BY event_type, bin),
        c2 AS (SELECT event_type, bin, n,
                      sum(n) OVER (PARTITION BY event_type ORDER BY bin)
                          AS cum,
                      sum(n) OVER (PARTITION BY event_type) AS tot
               FROM h2),
        d AS (SELECT event_type, min(bin) AS db
              FROM c2 WHERE cum >= (tot + 1) // 2 GROUP BY event_type)
        SELECT m.event_type, CAST(m.n AS BIGINT) AS n,
               m.mb * {vmax} / {n_bins} AS med_est,
               d.db * {vmax} / {n_bins} AS mad_est,
               coalesce((SELECT sum(h2.n) FROM h2
                         WHERE h2.event_type = m.event_type
                           AND h2.bin > {k_mad} * d.db), 0)::BIGINT
                   AS n_outliers
        FROM m JOIN d ON d.event_type = m.event_type
    """


# KMV sketch contract shared with the SQL oracle: signature size
KMV_K = 64
_HEX13 = 4503599627370496  # 16^13 == 2^52: the exact dyadic hash scale


def kmv_distinct_users(sf_dir: str, k: int = KMV_K,
                       num_buckets: int = 16) -> pd.DataFrame:
    """K-MINIMUM-VALUES distinct-count sketch (Bar-Yossef et al. 2002)
    per event_type — the ORACLED approximate-distinct: unlike HLL
    (register max under arbitrary merge order is deterministic but its
    bias-corrected estimate was left rows-only), KMV's estimate is a
    pure function of the k smallest md5 values, so DuckDB replays it
    bit for bit: est = (k-1) / frac(h_k) with frac = first 13 hex chars
    over 16^13 (an EXACT dyadic divisor).  Types with fewer than k
    distinct users report the exact count (the sketch saturates to
    truth below k on both engines).  The exact distinct count rides
    along as the in-row certificate, with the relative error.

    Scale shape: per-batch k-smallest partials (≤ k rows per (type,
    batch) — mergeable minima, the sketch property), one type-keyed
    fold; the EXACT column pays the one (type, user) distinct exchange
    that the sketch exists to avoid — kept here as the certificate, at
    production scale you run the sketch alone."""
    from .common import keyed_map_groups, md5_hex, sql_round

    ds = load(sf_dir, "events", ["event_type", "user_id"])

    def partials(df: pd.DataFrame) -> pd.DataFrame:
        d = df[["event_type", "user_id"]].drop_duplicates()
        d = d.assign(h=md5_hex(str(int(u)) for u in d["user_id"]))
        d = d.sort_values(["event_type", "h"])
        return d.groupby("event_type", sort=False).head(k)[
            ["event_type", "h"]]

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({"event_type": pd.Series([], dtype=object),
                              "hk": pd.Series([], dtype=object),
                              "n_sig": pd.Series([], dtype=np.int64)})
        if not len(g):
            return empty
        u = g.drop_duplicates().sort_values(["event_type", "h"])
        u = u.groupby("event_type", sort=False).head(k)
        agg = u.groupby("event_type", sort=False)["h"].agg(["max", "size"])
        return pd.DataFrame({"event_type": agg.index.to_numpy(object),
                             "hk": agg["max"].to_numpy(object),
                             "n_sig": agg["size"].to_numpy(np.int64)})

    sig = keyed_map_groups(ds.map_batches(partials, batch_format="pandas"),
                           "event_type", fold, num_buckets).to_pandas()

    # the exact certificate: one (type, user) distinct exchange
    pairs = partial_groupby(ds, ["event_type", "user_id"],
                            {"n": ("user_id", "count")},
                            many_groups=True, num_buckets=num_buckets)
    exact = partial_groupby(pairs, ["event_type"],
                            {"nd": ("user_id", "count")}).to_pandas()
    exact["nd"] = exact["nd"].astype(np.int64)

    out = exact.merge(sig, on="event_type")
    nd = out["nd"].to_numpy(np.int64)
    hk = np.array([int(h[:13], 16) for h in out["hk"]], dtype=np.int64)
    est = np.where(
        nd < k, nd.astype(np.float64),
        sql_round(float(k - 1) * float(_HEX13) / hk.astype(np.float64), 4))
    rel = sql_round(np.abs(est - nd) / nd.astype(np.float64), 4)
    return (pd.DataFrame({"event_type": out["event_type"],
                          "exact_distinct": nd,
                          "est_distinct": est, "rel_err": rel})
            .sort_values("event_type").reset_index(drop=True))


def kmv_distinct_users_sql(k: int = KMV_K) -> str:
    """DuckDB oracle: distinct (type, md5) hashes, the k-th smallest via
    a window rank, the identical exact-dyadic estimate."""
    return f"""
        WITH uh AS (
            SELECT DISTINCT event_type,
                   md5(CAST(user_id AS VARCHAR)) AS h
            FROM events
        ),
        ex AS (SELECT event_type, count(*)::BIGINT AS nd FROM uh
               GROUP BY event_type),
        rk AS (SELECT event_type, h,
                      row_number() OVER (PARTITION BY event_type
                                         ORDER BY h) AS r
               FROM uh),
        kth AS (SELECT event_type, max(h) AS hk
                FROM rk WHERE r <= {k} GROUP BY event_type),
        s AS (
            SELECT ex.event_type, ex.nd,
                   CASE WHEN ex.nd < {k} THEN ex.nd::DOUBLE
                        ELSE round({k - 1}::DOUBLE * {_HEX13}
                                   / CAST(concat('0x', substr(kth.hk, 1, 13))
                                          AS BIGINT), 4) END AS est
            FROM ex JOIN kth ON kth.event_type = ex.event_type
        )
        SELECT event_type, nd AS exact_distinct, est AS est_distinct,
               round(abs(est - nd) / nd::DOUBLE, 4) AS rel_err
        FROM s
    """


# priority-sampling contract shared with the SQL oracle
PRI_K = 32


def priority_sample_events(sf_dir: str, k: int = PRI_K) -> pd.DataFrame:
    """PRIORITY SAMPLING (Duffield, Lund & Thorup 2007): a weighted
    size-k sample of events with value as the weight, plus the scheme's
    UNBIASED total estimator as the in-row certificate.  Each row draws
    the exact-dyadic uniform u = (md5(event_id) 13-hex-prefix + 1) / 2^52
    and priority q = value * 2^52 / u_int — one IEEE division from exact
    integer inputs, so the engine and the oracle rank bit-identically.
    The sample is the top-k by (q desc, event_id); tau is the (k+1)-th
    priority; each sampled row's adjusted weight is max(value, tau), and
    sum(adjusted) estimates the full value total without replacement
    bias — the streaming-aggregation workhorse for weighted telemetry.

    Scale shape: per-batch local top-(k+1) partials (mergeable — the
    top-k property), one tiny merge; the exact total folds from sum
    partials.  Nothing driver-side exceeds k+1 rows per block."""
    from .common import md5_hex, sql_round

    def local_top(b: pd.DataFrame) -> pd.DataFrame:
        u = np.array([int(h[:13], 16) + 1 for h in
                      md5_hex(str(int(e)) for e in b["event_id"])],
                     dtype=np.float64)
        q = b["value"].to_numpy(np.float64) * 4503599627370496.0 / u
        d = pd.DataFrame({"event_id": b["event_id"].to_numpy(np.int64),
                          "value": b["value"].to_numpy(np.float64),
                          "pri": q, "s": 0.0})
        d = d.sort_values(["pri", "event_id"],
                          ascending=[False, True]).head(k + 1)
        if len(d):   # the batch's sum partial rides along on one row
            d.iloc[0, d.columns.get_loc("s")] = np.float64(b["value"].sum())
        return d

    cand = load(sf_dir, "events", ["event_id", "value"]).map_batches(
        local_top, batch_format="pandas").to_pandas()
    exact_total = float(sql_round(cand["s"].sum(), 2))
    cand = cand.sort_values(["pri", "event_id"],
                            ascending=[False, True]).head(k + 1)
    tau = float(cand["pri"].iloc[k]) if len(cand) > k else 0.0
    samp = cand.head(k).copy()
    adj = np.maximum(samp["value"].to_numpy(np.float64), tau)
    est_total = float(sql_round(adj.sum(), 2))
    rel = float(sql_round(abs(est_total - exact_total) / exact_total, 6))
    return (pd.DataFrame({
        "event_id": samp["event_id"].to_numpy(np.int64),
        "value": samp["value"].to_numpy(np.float64),
        "adj_weight": sql_round(adj, 4),
        "est_total": np.full(len(samp), est_total),
        "exact_total": np.full(len(samp), exact_total),
        "rel_err": np.full(len(samp), rel)})
        .sort_values("event_id").reset_index(drop=True))


def priority_sample_events_sql(k: int = PRI_K) -> str:
    """Oracle: identical dyadic uniforms, the same single-division
    priority, window rank, greatest(value, tau) adjusted weights."""
    return f"""
        WITH q AS (
            SELECT event_id, value,
                   value * 4503599627370496.0
                       / (CAST(concat('0x',
                              substr(md5(CAST(event_id AS VARCHAR)), 1, 13))
                              AS BIGINT) + 1) AS pri
            FROM events
        ),
        r AS (SELECT *, row_number() OVER (ORDER BY pri DESC, event_id)
                            AS rk FROM q),
        tau AS (SELECT coalesce(max(CASE WHEN rk = {k + 1} THEN pri END),
                                0.0) AS t FROM r),
        tot AS (SELECT round(sum(value), 2) AS x FROM events),
        s AS (
            SELECT event_id, value,
                   round(greatest(value, (SELECT t FROM tau)), 4)
                       AS adj_weight,
                   greatest(value, (SELECT t FROM tau)) AS adj_raw
            FROM r WHERE rk <= {k}
        ),
        est AS (SELECT round(sum(adj_raw), 2) AS e FROM s)
        SELECT event_id, value, adj_weight,
               (SELECT e FROM est) AS est_total,
               (SELECT x FROM tot) AS exact_total,
               round(abs((SELECT e FROM est) - (SELECT x FROM tot))
                     / (SELECT x FROM tot), 6) AS rel_err
        FROM s
    """


def kmv_set_ops(sf_dir: str, k: int = KMV_K,
                num_buckets: int = 16) -> pd.DataFrame:
    """KMV SET-OPERATION estimates (theta-sketch style, Beyer et al.
    2007) between the 'click' and 'purchase' user sets: union distinct,
    intersection distinct and Jaccard — all from two k-minimum-values
    signatures, never from the full sets.  The union sketch is the k
    smallest of the two signatures' union (valid because each signature
    holds its set's global minima); any member below the union threshold
    is in set X iff it is in X's signature, so the intersection share
    rho = |both-flagged rows in the union sketch| / k is exact relative
    to the sketch, and est_inter = rho * est_union.  Sketches saturate
    to exact truth below k on both engines.  The exact union /
    intersection / Jaccard ride along as the in-row certificate.

    Scale shape: two per-batch k-smallest partials + one k-row driver
    fold; the exact columns pay the one distinct (user, flags) exchange
    the sketch exists to avoid — the certificate, not the production
    path."""
    from .common import keyed_map_groups, md5_hex, sql_round

    ds = load(sf_dir, "events", ["event_type", "user_id"])

    def partials(df: pd.DataFrame) -> pd.DataFrame:
        df = df[df["event_type"].isin(("click", "purchase"))]
        d = df[["event_type", "user_id"]].drop_duplicates()
        d = d.assign(h=md5_hex(str(int(u)) for u in d["user_id"]))
        d = d.sort_values(["event_type", "h"])
        return d.groupby("event_type", sort=False).head(k)[
            ["event_type", "h", "user_id"]]

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        if not len(g):
            return pd.DataFrame({"event_type": pd.Series([], dtype=object),
                                 "h": pd.Series([], dtype=object),
                                 "user_id": pd.Series([], dtype=np.int64)})
        u = g.drop_duplicates().sort_values(["event_type", "h"])
        return u.groupby("event_type", sort=False).head(k)

    sig = keyed_map_groups(ds.map_batches(partials, batch_format="pandas"),
                           "event_type", fold, num_buckets).to_pandas()

    # exact certificate: one distinct (user, inA, inB) exchange
    def flag_prep(b: pd.DataFrame) -> pd.DataFrame:
        b = b[b["event_type"].isin(("click", "purchase"))]
        return b.assign(
            a=(b["event_type"] == "click").astype(np.int64),
            b=(b["event_type"] == "purchase").astype(np.int64))

    flags = partial_groupby(
        ds, ["user_id"],
        {"in_a": ("a", "max"), "in_b": ("b", "max")},
        prep=flag_prep, many_groups=True,
        num_buckets=num_buckets).to_pandas()
    na = int(flags["in_a"].sum())
    nb = int(flags["in_b"].sum())
    ninter = int((flags["in_a"] & flags["in_b"]).sum())
    nunion = len(flags)

    a_hashes = set(sig.loc[sig["event_type"] == "click", "h"])
    b_hashes = set(sig.loc[sig["event_type"] == "purchase", "h"])
    merged = sorted(a_hashes | b_hashes)[:k]
    if nunion <= k:
        est_union, est_inter = float(nunion), float(ninter)
    else:
        hk = int(merged[-1][:13], 16)
        est_union = float(sql_round(
            float(k - 1) * float(_HEX13) / float(hk), 4))
        n_both = sum(1 for h in merged if h in a_hashes and h in b_hashes)
        est_inter = float(sql_round(n_both * est_union / k, 4))
    est_j = float(sql_round(est_inter / est_union, 4)) if est_union else 0.0
    return pd.DataFrame({
        "k": [np.int64(k)],
        "n_click_exact": [np.int64(na)],
        "n_purchase_exact": [np.int64(nb)],
        "union_exact": [np.int64(nunion)],
        "inter_exact": [np.int64(ninter)],
        "union_est": [est_union], "inter_est": [est_inter],
        "jaccard_est": [est_j],
        "jaccard_exact": sql_round([ninter / nunion], 4)})


def kmv_set_ops_sql(k: int = KMV_K) -> str:
    """Oracle: per-set distinct md5 signatures via window ranks, the
    identical union-sketch merge, threshold membership flags and the
    exact-dyadic estimates."""
    return f"""
        WITH uh AS (
            SELECT DISTINCT event_type,
                   md5(CAST(user_id AS VARCHAR)) AS h
            FROM events
            WHERE event_type IN ('click', 'purchase')
        ),
        sig AS (
            SELECT event_type, h FROM (
                SELECT event_type, h,
                       row_number() OVER (PARTITION BY event_type
                                          ORDER BY h) AS r
                FROM uh) t
            WHERE r <= {k}
        ),
        m AS (
            SELECT h,
                   max(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
                       AS in_a,
                   max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                       AS in_b,
                   row_number() OVER (ORDER BY h) AS r
            FROM sig GROUP BY h
        ),
        ex AS (
            SELECT count(DISTINCT CASE WHEN event_type = 'click'
                                       THEN user_id END)::BIGINT AS na,
                   count(DISTINCT CASE WHEN event_type = 'purchase'
                                       THEN user_id END)::BIGINT AS nb,
                   count(DISTINCT user_id)::BIGINT AS nu
            FROM events WHERE event_type IN ('click', 'purchase')
        ),
        exi AS (
            SELECT count(*)::BIGINT AS ni FROM (
                SELECT user_id FROM events
                WHERE event_type IN ('click', 'purchase')
                GROUP BY user_id
                HAVING max(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
                         = 1
                   AND max(CASE WHEN event_type = 'purchase' THEN 1
                           ELSE 0 END) = 1)
        ),
        est AS (
            SELECT CASE WHEN ex.nu <= {k} THEN ex.nu::DOUBLE
                        ELSE round({k - 1}::DOUBLE * {_HEX13}
                             / CAST(concat('0x', substr(
                                   (SELECT max(h) FROM m WHERE r <= {k}),
                                   1, 13)) AS BIGINT), 4) END AS eu,
                   CASE WHEN ex.nu <= {k} THEN exi.ni::DOUBLE
                        ELSE round(
                            (SELECT sum(in_a * in_b) FROM m WHERE r <= {k})
                            * CASE WHEN ex.nu <= {k} THEN ex.nu::DOUBLE
                                   ELSE round({k - 1}::DOUBLE * {_HEX13}
                                        / CAST(concat('0x', substr(
                                            (SELECT max(h) FROM m
                                             WHERE r <= {k}), 1, 13))
                                            AS BIGINT), 4) END
                            / {k}, 4) END AS ei,
                   ex.na, ex.nb, ex.nu, exi.ni
            FROM ex, exi
        )
        SELECT {k}::BIGINT AS k, na AS n_click_exact,
               nb AS n_purchase_exact, nu AS union_exact,
               ni AS inter_exact, eu AS union_est, ei AS inter_est,
               CASE WHEN eu > 0 THEN round(ei / eu, 4) ELSE 0.0 END
                   AS jaccard_est,
               round(ni::DOUBLE / nu, 4) AS jaccard_exact
        FROM est
    """


AMS_D = 16   # independent sign-hash rows; estimate = mean of row products


def ams_join_size(sf_dir: str, d: int = AMS_D,
                  num_buckets: int = 16) -> pd.DataFrame:
    """AMS JOIN-SIZE SKETCH (Alon, Matias & Szegedy 1996; Alon, Gibbons,
    Matias & Szegedy 1999): estimate |click JOIN purchase ON user_id| =
    sum_u f_a(u) * f_b(u) from two tiny sign sketches instead of the
    join — the classic cardinality estimator a distributed optimizer
    consults before picking a join strategy.  Each of ``d`` rows keeps
    one integer per side, S_side[r] = sum_u f_side(u) * s_r(u) with
    s_r(u) in {-1, +1} from an md5 parity bit; E[S_a * S_b] is exactly
    the join size, and the estimate is the mean of the d products —
    all-integer until one exact dyadic division by d, so parity needs
    no rounding grid.  The exact join size rides along as the in-row
    certificate.

    Scale shape: the sketch folds from per-batch partials (d integers
    per side per batch — mergeable by addition); only the exact
    certificate pays a user-keyed exchange."""
    from .common import md5_hex, sql_round

    ds = load(sf_dir, "events", ["event_type", "user_id"])

    def sketch_partials(b: pd.DataFrame) -> pd.DataFrame:
        b = b[b["event_type"].isin(("click", "purchase"))]
        if not len(b):
            return pd.DataFrame({"r": pd.Series([], dtype=np.int64),
                                 "sa": pd.Series([], dtype=np.int64),
                                 "sb": pd.Series([], dtype=np.int64)})
        g = (b.groupby(["user_id", "event_type"], sort=False)
             .size().unstack(fill_value=0))
        fa = g.get("click", pd.Series(0, index=g.index)).to_numpy(np.int64)
        fb = g.get("purchase",
                   pd.Series(0, index=g.index)).to_numpy(np.int64)
        users = g.index.to_numpy(np.int64)
        rows = []
        for r in range(d):
            sgn = np.array(
                [(int(h[:13], 16) % 2) * 2 - 1 for h in
                 md5_hex(f"{r}|{int(u)}" for u in users)], dtype=np.int64)
            rows.append((r, int((fa * sgn).sum()), int((fb * sgn).sum())))
        return pd.DataFrame(rows, columns=["r", "sa", "sb"]).astype(
            {"r": np.int64, "sa": np.int64, "sb": np.int64})

    s = partial_groupby(
        ds.map_batches(sketch_partials, batch_format="pandas"),
        ["r"], {"sa": ("sa", "sum"), "sb": ("sb", "sum")}).to_pandas()
    # cast BEFORE multiplying (the PMI rule): an int64 sa*sb wraps
    # silently at web-scale counts where the oracle raises loudly
    est = float((s["sa"].to_numpy(np.float64)
                 * s["sb"].to_numpy(np.float64)).sum()) / d

    # exact certificate: one user-keyed exchange of (f_a, f_b) counts
    def flag_prep(b: pd.DataFrame) -> pd.DataFrame:
        b = b[b["event_type"].isin(("click", "purchase"))]
        return b.assign(
            a=(b["event_type"] == "click").astype(np.int64),
            b=(b["event_type"] == "purchase").astype(np.int64))

    f = partial_groupby(ds, ["user_id"],
                        {"fa": ("a", "sum"), "fb": ("b", "sum")},
                        prep=flag_prep, many_groups=True,
                        num_buckets=num_buckets).to_pandas()
    # Python bigints: exact at any scale (the kmeans_label_ari rule)
    exact = sum(int(a) * int(b)
                for a, b in zip(f["fa"], f["fb"]) if a and b)
    rel = (float(sql_round(abs(est - exact) / exact, 6))
           if exact else 0.0)
    return pd.DataFrame({"d": [np.int64(d)], "est_join_size": [est],
                         "exact_join_size": [np.int64(exact)],
                         "rel_err": [rel]})


def ams_join_size_sql(d: int = AMS_D) -> str:
    """Oracle: identical md5-parity signs, per-row integer sketches,
    mean of products, exact join size from the grouped count product."""
    return f"""
        WITH f AS (
            SELECT user_id,
                   sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
                       ::BIGINT AS fa,
                   sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                       ::BIGINT AS fb
            FROM events
            WHERE event_type IN ('click', 'purchase')
            GROUP BY 1
        ),
        s AS (
            SELECT r, sum(fa * sgn)::DOUBLE AS sa,
                   sum(fb * sgn)::DOUBLE AS sb
            FROM (
                SELECT f.fa, f.fb, q.r,
                       ((CAST(concat('0x', substr(md5(CAST(q.r AS VARCHAR)
                            || '|' || CAST(f.user_id AS VARCHAR)), 1, 13))
                            AS BIGINT) % 2) * 2 - 1) AS sgn
                FROM f, UNNEST(range(0, {d})) q(r))
            GROUP BY r
        ),
        e AS (SELECT coalesce(sum(sa * sb), 0.0) / {d} AS est FROM s),
        x AS (SELECT coalesce(sum(fa * fb), 0)::BIGINT AS exact FROM f)
        SELECT {d}::BIGINT AS d,
               (SELECT est FROM e) AS est_join_size,
               (SELECT exact FROM x) AS exact_join_size,
               CASE WHEN (SELECT exact FROM x) = 0 THEN 0.0
                    ELSE round(abs((SELECT est FROM e)
                                   - (SELECT exact FROM x))
                               / (SELECT exact FROM x), 6)
               END AS rel_err
    """


PSI_BINS = 10
PSI_BIN_W = 50.0          # fixed-edge bins over value in [0, 500)
PSI_SPLIT = "2024-01-16"  # baseline = days before; current = days after


def value_drift_psi(sf_dir: str) -> pd.DataFrame:
    """POPULATION STABILITY INDEX between the first and second half of
    the event stream's value distribution — the standard drift monitor
    run between a training snapshot and fresh data before trusting a
    model or a sampling config.  Fixed integer-edge bins (floor(v/50)
    capped at 9) keep binning exact on both engines; proportions use
    add-one smoothing ((n+1)/(N+bins)) so empty bins contribute finite
    terms deterministically instead of an epsilon convention.  Output is
    the per-bin PSI decomposition (which bins drifted) plus the total —
    psi > 0.2 is the textbook re-train trigger.

    Scale shape: one pass of (period, bin) count partials, a 20-row
    reduce, driver folds the 10-term sum."""
    from .common import sql_round

    split = pd.Timestamp(PSI_SPLIT)

    def prep(b: pd.DataFrame) -> pd.DataFrame:
        return b.assign(
            period=(b["ts"] >= split).to_numpy(np.int64),
            bin=np.minimum(np.floor(b["value"].to_numpy(np.float64)
                                    / PSI_BIN_W),
                           PSI_BINS - 1).astype(np.int64))

    c = partial_groupby(
        load(sf_dir, "events", ["ts", "value"]),
        ["period", "bin"], {"n": ("bin", "count")}, prep=prep,
    ).to_pandas()
    full = pd.DataFrame({"bin": np.arange(PSI_BINS, dtype=np.int64)})
    base = full.merge(c[c["period"] == 0][["bin", "n"]], on="bin",
                      how="left").fillna(0)["n"].to_numpy(np.int64)
    cur = full.merge(c[c["period"] == 1][["bin", "n"]], on="bin",
                     how="left").fillna(0)["n"].to_numpy(np.int64)
    p = (base + 1.0) / (base.sum() + PSI_BINS)
    q = (cur + 1.0) / (cur.sum() + PSI_BINS)
    term = (p - q) * np.log(p / q)
    return pd.DataFrame({
        "bin": full["bin"],
        "n_base": base, "n_cur": cur,
        "psi_term": sql_round(term, 6),
        "psi_total": np.full(PSI_BINS, float(sql_round(term.sum(), 6)))})


def value_drift_psi_sql() -> str:
    return f"""
        WITH e AS (
            SELECT CASE WHEN ts >= TIMESTAMP '{PSI_SPLIT}'
                        THEN 1 ELSE 0 END AS period,
                   least(CAST(floor(value / {PSI_BIN_W}) AS BIGINT),
                         {PSI_BINS - 1}) AS bin
            FROM events
        ),
        c AS (SELECT period, bin, count(*)::BIGINT AS n FROM e
              GROUP BY 1, 2),
        m AS (
            SELECT b.range AS bin,
                   coalesce((SELECT n FROM c WHERE period = 0
                             AND c.bin = b.range), 0) AS n_base,
                   coalesce((SELECT n FROM c WHERE period = 1
                             AND c.bin = b.range), 0) AS n_cur
            FROM range(0, {PSI_BINS}) b
        ),
        t AS (SELECT sum(n_base)::DOUBLE AS nb, sum(n_cur)::DOUBLE AS nc
              FROM m),
        terms AS (
            SELECT bin, n_base, n_cur,
                   ((n_base + 1.0) / (t.nb + {PSI_BINS})
                    - (n_cur + 1.0) / (t.nc + {PSI_BINS}))
                   * ln(((n_base + 1.0) / (t.nb + {PSI_BINS}))
                        / ((n_cur + 1.0) / (t.nc + {PSI_BINS}))) AS term
            FROM m, t
        )
        SELECT CAST(bin AS BIGINT) AS bin, n_base::BIGINT AS n_base,
               n_cur::BIGINT AS n_cur,
               round(term, 6) AS psi_term,
               round((SELECT sum(term) FROM terms), 6) AS psi_total
        FROM terms
    """


VOPT_BINS = 64   # coarse grid the DP runs on
VOPT_K = 8       # output segments
VOPT_VMAX = 500.0


def voptimal_histogram(sf_dir: str, nbins: int = VOPT_BINS,
                       k: int = VOPT_K) -> pd.DataFrame:
    """V-OPTIMAL HISTOGRAM (Jagadish et al., VLDB'98): the k-segment
    partition of the value axis minimizing total within-segment SSE —
    the selectivity-estimation histogram an optimizer actually wants,
    vs the equi-depth bounds of range_partition_bounds.  Classic
    two-level shape: the data pass reduces to ``nbins`` coarse
    (n, sum, sum-of-squares) sufficient statistics on the integer-cents
    grid (exact in float64), then the O(nbins^2 * k) dynamic program
    runs on that tiny table.  Parity needs NO rounding grid: every
    prefix stat is an exact integer, each SSE is the same three-op
    float expression (ss - s*s/n) on identical doubles, and the DP
    recursion compares and adds only values built by the identical
    expression tree — ties break to the smallest split index.

    Output: one row per segment (bin range, rows, segment SSE) plus the
    replicated total — the planner table a scan would consult."""
    from .common import sql_round

    w = VOPT_VMAX / nbins

    def prep(b: pd.DataFrame) -> pd.DataFrame:
        v = b["value"].to_numpy(np.float64)
        cents = np.floor(v * 100.0 + 0.5)
        return b.assign(
            bin=np.minimum(np.floor(v * nbins / VOPT_VMAX),
                           nbins - 1).astype(np.int64),
            c=cents, c2=cents * cents)

    g = partial_groupby(
        load(sf_dir, "events", ["value"]), ["bin"],
        {"n": ("c", "count"), "s": ("c", "sum"), "ss": ("c2", "sum")},
        prep=prep).to_pandas().set_index("bin").reindex(
        range(nbins), fill_value=0.0).reset_index()

    n = g["n"].to_numpy(np.float64)
    s = g["s"].to_numpy(np.float64)
    ss = g["ss"].to_numpy(np.float64)
    pn = np.concatenate([[0.0], np.cumsum(n)])
    ps = np.concatenate([[0.0], np.cumsum(s)])
    pss = np.concatenate([[0.0], np.cumsum(ss)])

    def sse(i: int, j: int) -> float:
        # segment = bins (i, j]: identical expression tree as the oracle
        nn = pn[j + 1] - pn[i + 1 - 1]
        if nn == 0.0:
            return 0.0
        sv = ps[j + 1] - ps[i]
        sq = pss[j + 1] - pss[i]
        return sq - sv * sv / nn

    # best[t][j]: min SSE of splitting bins [0..j] into t segments
    INF = float("inf")
    best = np.full((k + 1, nbins), INF)
    arg = np.full((k + 1, nbins), -1, dtype=np.int64)
    for j in range(nbins):
        best[1][j] = sse(0, j)
    for t in range(2, k + 1):
        for j in range(t - 1, nbins):
            for i in range(t - 2, j):
                cand = best[t - 1][i] + sse(i + 1, j)
                if cand < best[t][j]:
                    best[t][j], arg[t][j] = cand, i
    # backtrack boundaries
    cuts = []
    j = nbins - 1
    for t in range(k, 1, -1):
        i = int(arg[t][j])
        cuts.append(i)
        j = i
    cuts = cuts[::-1]
    los = [0] + [c + 1 for c in cuts]
    his = cuts + [nbins - 1]
    rows = []
    for sid, (lo, hi) in enumerate(zip(los, his)):
        rows.append((sid, lo, hi, int(pn[hi + 1] - pn[lo]),
                     float(sse(lo, hi))))
    out = pd.DataFrame(rows, columns=["seg_id", "bin_lo", "bin_hi",
                                      "n_rows", "sse_cents"])
    total = float(best[k][nbins - 1])
    return pd.DataFrame({
        "seg_id": out["seg_id"].astype(np.int64),
        "bin_lo": out["bin_lo"].astype(np.int64),
        "bin_hi": out["bin_hi"].astype(np.int64),
        "n_rows": out["n_rows"].astype(np.int64),
        "sse_cents": sql_round(out["sse_cents"].to_numpy(), 2),
        "total_sse": np.full(len(out),
                             float(sql_round(total, 2)))})


def voptimal_histogram_sql(nbins: int = VOPT_BINS, k: int = VOPT_K) -> str:
    """Oracle: coarse stats via one grouped pass, prefix sums as window
    expressions, the DP unrolled one CTE per segment count with the
    identical (cost, split) tie order, scalar-subquery backtracking."""
    parts = [f"""
        WITH raw AS MATERIALIZED (
            SELECT least(floor(value * {nbins} / {VOPT_VMAX}),
                         {nbins - 1})::BIGINT AS bin,
                   round(value * 100.0, 0) AS c
            FROM events
        ),
        b AS MATERIALIZED (
            SELECT g.range AS bin, coalesce(t.n, 0.0) AS n,
                   coalesce(t.s, 0.0) AS s, coalesce(t.ss, 0.0) AS ss
            FROM range(0, {nbins}) g LEFT JOIN (
                SELECT bin, count(*)::DOUBLE AS n, sum(c)::DOUBLE AS s,
                       sum(c * c)::DOUBLE AS ss
                FROM raw GROUP BY 1) t ON t.bin = g.range
        ),
        p AS MATERIALIZED (
            SELECT bin,
                   sum(n) OVER w AS pn, sum(s) OVER w AS ps_,
                   sum(ss) OVER w AS pss
            FROM b
            WINDOW w AS (ORDER BY bin ROWS BETWEEN UNBOUNDED PRECEDING
                         AND CURRENT ROW)
        ),
        sseg AS MATERIALIZED (
            SELECT l.bin AS lo, h.bin AS hi,
                   h.pn - coalesce(pl.pn, 0.0) AS nn,
                   CASE WHEN h.pn - coalesce(pl.pn, 0.0) = 0.0 THEN 0.0
                        ELSE (h.pss - coalesce(pl.pss, 0.0))
                             - (h.ps_ - coalesce(pl.ps_, 0.0))
                               * (h.ps_ - coalesce(pl.ps_, 0.0))
                               / (h.pn - coalesce(pl.pn, 0.0))
                   END AS e
            FROM p h JOIN p l ON l.bin <= h.bin
            LEFT JOIN p pl ON pl.bin = l.bin - 1
        ),
        d1 AS MATERIALIZED (
            SELECT hi AS j, e AS cost, -1::BIGINT AS arg FROM sseg
            WHERE lo = 0
        )"""]
    for t in range(2, k + 1):
        parts.append(f""",
        d{t} AS MATERIALIZED (
            SELECT j, cost, arg FROM (
                SELECT s.hi AS j, d.cost + s.e AS cost,
                       d.j::BIGINT AS arg,
                       row_number() OVER (PARTITION BY s.hi
                           ORDER BY d.cost + s.e, d.j) AS rn
                FROM d{t - 1} d JOIN sseg s ON s.lo = d.j + 1)
            WHERE rn = 1
        )""")
    parts.append(f""",
        bt{k} AS MATERIALIZED (
            SELECT j, arg FROM d{k} WHERE j = {nbins - 1}
        )""")
    for t in range(k - 1, 0, -1):
        parts.append(f""",
        bt{t} AS MATERIALIZED (
            SELECT j, arg FROM d{t}
            WHERE j = (SELECT arg FROM bt{t + 1})
        )""")
    sel = " UNION ALL ".join(f"""
        SELECT {t - 1}::BIGINT AS seg_id,
               ((SELECT arg FROM bt{t}) + 1)::BIGINT AS bin_lo,
               (SELECT j FROM bt{t})::BIGINT AS bin_hi,
               CAST(s.nn AS BIGINT) AS n_rows,
               round(s.e, 2) AS sse_cents,
               round((SELECT cost FROM d{k} WHERE j = {nbins - 1}), 2)
                   AS total_sse
        FROM sseg s
        WHERE s.lo = (SELECT arg FROM bt{t}) + 1
          AND s.hi = (SELECT j FROM bt{t})""" for t in range(1, k + 1))
    parts.append(f"""
        SELECT * FROM ({sel}) ORDER BY seg_id""")
    return "".join(parts)


EMD_BINS = 64


def click_purchase_value_emd(sf_dir: str, nbins: int = EMD_BINS) -> pd.DataFrame:
    """1-D EARTH MOVER'S DISTANCE (Wasserstein-1) between the click and
    purchase value distributions on a fixed integer-edge grid — the
    distribution-shift metric that, unlike PSI's per-bin ratio terms,
    respects the ORDER of the value axis (mass moved two bins costs
    twice one bin).  On a shared grid W1 = sum_bins |CDF_a - CDF_b| *
    bin_width; cross-multiplying by both totals makes the running CDF
    difference an exact integer (cum(na*Nb - nb*Na)), so the whole
    statistic is one integer fold and a single final division — no
    rounding grid anywhere but the last step.

    Scale shape: one (side, bin) count partial pass; the 64-row CDF
    fold runs driver-side."""
    from .common import sql_round

    w = VOPT_VMAX / nbins

    def prep(b: pd.DataFrame) -> pd.DataFrame:
        b = b[b["event_type"].isin(("click", "purchase"))]
        return b.assign(
            side=(b["event_type"] == "purchase").astype(np.int64),
            bin=np.minimum(np.floor(b["value"].to_numpy(np.float64)
                                    * nbins / VOPT_VMAX),
                           nbins - 1).astype(np.int64))

    c = partial_groupby(
        load(sf_dir, "events", ["event_type", "value"]),
        ["side", "bin"], {"n": ("bin", "count")}, prep=prep,
    ).to_pandas()
    full = np.arange(nbins, dtype=np.int64)
    na = (pd.Series(0, index=full)
          .add(c[c["side"] == 0].set_index("bin")["n"], fill_value=0)
          .to_numpy(np.int64))
    nb = (pd.Series(0, index=full)
          .add(c[c["side"] == 1].set_index("bin")["n"], fill_value=0)
          .to_numpy(np.int64))
    Na, Nb = int(na.sum()), int(nb.sum())
    # Python bigints: na*Nb wraps int64 silently at web-scale counts
    # where the oracle's BIGINT window sum raises loudly
    acc, num = 0, 0
    for i in range(nbins - 1):                   # last prefix is 0
        acc += int(na[i]) * Nb - int(nb[i]) * Na
        num += abs(acc)
    emd = (float(sql_round(num * w / (Na * Nb), 6))
           if Na and Nb else 0.0)
    return pd.DataFrame({
        "n_click": [np.int64(Na)], "n_purchase": [np.int64(Nb)],
        "emd_numerator": [np.int64(num)],
        "emd_value": [emd]})


def click_purchase_value_emd_sql(nbins: int = EMD_BINS) -> str:
    w = VOPT_VMAX / nbins
    return f"""
        WITH e AS (
            SELECT CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END
                       AS side,
                   least(floor(value * {nbins} / {VOPT_VMAX}),
                         {nbins - 1})::BIGINT AS bin
            FROM events WHERE event_type IN ('click', 'purchase')
        ),
        c AS (SELECT side, bin, count(*)::BIGINT AS n FROM e GROUP BY 1, 2),
        g AS (
            SELECT r.range AS bin,
                   coalesce((SELECT n FROM c WHERE side = 0
                             AND c.bin = r.range), 0) AS na,
                   coalesce((SELECT n FROM c WHERE side = 1
                             AND c.bin = r.range), 0) AS nb
            FROM range(0, {nbins}) r
        ),
        t AS (SELECT sum(na)::BIGINT AS ta, sum(nb)::BIGINT AS tb FROM g),
        d AS (
            SELECT bin,
                   sum(na * (SELECT tb FROM t)
                       - nb * (SELECT ta FROM t))
                       OVER (ORDER BY bin ROWS BETWEEN UNBOUNDED
                             PRECEDING AND CURRENT ROW) AS cd
            FROM g
        )
        SELECT (SELECT ta FROM t) AS n_click,
               (SELECT tb FROM t) AS n_purchase,
               sum(CASE WHEN bin < {nbins - 1} THEN abs(cd)
                        ELSE 0 END)::BIGINT AS emd_numerator,
               CASE WHEN (SELECT ta FROM t) = 0
                      OR (SELECT tb FROM t) = 0 THEN 0.0
                    ELSE round(sum(CASE WHEN bin < {nbins - 1}
                                        THEN abs(cd) ELSE 0 END)
                               * {w} / ((SELECT ta FROM t)
                                        * (SELECT tb FROM t)), 6)
               END AS emd_value
        FROM d
    """


BLIDX_NBLOCKS = 64
BLIDX_BITS = 256      # bloom bits per block
BLIDX_K = 3           # hash functions
BLIDX_PROBES = (1, 31, 61, 91, 121, 99999)   # last one is absent


def bloom_index_prune(sf_dir: str, nblocks: int = BLIDX_NBLOCKS) -> pd.DataFrame:
    """BLOOM-FILTER BLOCK INDEX: the equality-predicate companion to the
    zone maps — per event_id block, a 256-bit bloom over user_id; a
    point lookup "user = X" scans only blocks whose bloom holds all
    three hash positions of X.  Output is the per-probe prune audit:
    candidate blocks (bloom says maybe), actual blocks (exact), and the
    false-positive count — with the bloom guarantees in-row (candidates
    >= actuals always; an absent user can still have candidates, never
    actuals).  Every bit position is an md5 residue, so the whole audit
    is integer-exact on both engines.

    Scale shape: per-batch (block, bit) DISTINCT partials (bounded by
    nblocks x bits regardless of row count — the bitmap property), one
    tiny reduce; the probe fold touches only that bounded table plus a
    probe-filtered exact pass."""
    import os

    import pyarrow.parquet as pq

    from .common import _require_rows, md5_hex

    _require_rows(os.path.join(sf_dir, "events.parquet"), "events")
    n = pq.ParquetFile(os.path.join(sf_dir, "events.parquet")).metadata.num_rows
    span = (n - 1) // nblocks + 1

    ds = load(sf_dir, "events", ["event_id", "user_id"])

    def bits(b: pd.DataFrame) -> pd.DataFrame:
        blk = b["event_id"].to_numpy(np.int64) // span
        outs = []
        for j in range(BLIDX_K):
            pos = np.array([int(h[:13], 16) % BLIDX_BITS for h in
                            md5_hex(f"{j}|{int(u)}"
                                    for u in b["user_id"])],
                           dtype=np.int64)
            outs.append(pd.DataFrame({"blk": blk, "pos": pos}))
        return pd.concat(outs, ignore_index=True).drop_duplicates()

    bitset = partial_groupby(
        ds.map_batches(bits, batch_format="pandas"),
        ["blk", "pos"], {"n": ("pos", "count")},
        many_groups=True).to_pandas()   # up to nblocks*bits groups

    def actual(b: pd.DataFrame) -> pd.DataFrame:
        m = b[b["user_id"].isin(BLIDX_PROBES)]
        return pd.DataFrame({
            "user_id": m["user_id"].to_numpy(np.int64),
            "blk": m["event_id"].to_numpy(np.int64) // span,
        }).drop_duplicates()

    act = partial_groupby(
        ds.map_batches(actual, batch_format="pandas"),
        ["user_id", "blk"], {"n": ("blk", "count")},
        many_groups=True, num_buckets=4).to_pandas()

    have = set(zip(bitset["blk"].astype(int), bitset["pos"].astype(int)))
    nblk = int(bitset["blk"].max()) + 1 if len(bitset) else 0
    rows = []
    for u in BLIDX_PROBES:
        pos = [int(h[:13], 16) % BLIDX_BITS
               for h in md5_hex(f"{j}|{u}" for j in range(BLIDX_K))]
        cand = sum(1 for blk in range(nblk)
                   if all((blk, p) in have for p in pos))
        a = int((act["user_id"] == u).sum())
        rows.append((u, cand, a, cand - a))
    return pd.DataFrame(rows, columns=["user_id", "n_blocks_candidate",
                                       "n_blocks_actual",
                                       "n_false_positive"]).astype(
        {"user_id": np.int64, "n_blocks_candidate": np.int64,
         "n_blocks_actual": np.int64, "n_false_positive": np.int64})


def bloom_index_prune_sql(nblocks: int = BLIDX_NBLOCKS) -> str:
    probes = ", ".join(f"({u})" for u in BLIDX_PROBES)
    return f"""
        WITH sp AS (SELECT (SELECT max(event_id) FROM events)
                        // {nblocks} + 1 AS span),
        bits AS (
            SELECT DISTINCT event_id // (SELECT span FROM sp) AS blk,
                   CAST(concat('0x', substr(md5(CAST(j.range AS VARCHAR)
                        || '|' || CAST(user_id AS VARCHAR)), 1, 13))
                        AS BIGINT) % {BLIDX_BITS} AS pos
            FROM events, range(0, {BLIDX_K}) j
        ),
        p AS (SELECT * FROM (VALUES {probes}) t(user_id)),
        ppos AS (
            SELECT p.user_id, j.range AS j,
                   CAST(concat('0x', substr(md5(CAST(j.range AS VARCHAR)
                        || '|' || CAST(p.user_id AS VARCHAR)), 1, 13))
                        AS BIGINT) % {BLIDX_BITS} AS pos
            FROM p, range(0, {BLIDX_K}) j
        ),
        cand AS (
            SELECT pp.user_id, b.blk
            FROM ppos pp JOIN bits b ON b.pos = pp.pos
            GROUP BY pp.user_id, b.blk
            HAVING count(DISTINCT pp.j) = {BLIDX_K}
        ),
        actual AS (
            SELECT DISTINCT user_id,
                   event_id // (SELECT span FROM sp) AS blk
            FROM events
            WHERE user_id IN (SELECT user_id FROM p)
        )
        SELECT p.user_id::BIGINT AS user_id,
               coalesce(c.n, 0) AS n_blocks_candidate,
               coalesce(a.n, 0) AS n_blocks_actual,
               coalesce(c.n, 0) - coalesce(a.n, 0) AS n_false_positive
        FROM p
        LEFT JOIN (SELECT user_id, count(*)::BIGINT AS n FROM cand
                   GROUP BY 1) c USING (user_id)
        LEFT JOIN (SELECT user_id, count(*)::BIGINT AS n FROM actual
                   GROUP BY 1) a USING (user_id)
    """


STUMP_BINS = 64


def decision_stump_value_type(sf_dir: str,
                              nbins: int = STUMP_BINS) -> pd.DataFrame:
    """DECISION-STUMP SPLIT SEARCH: the best single threshold on value
    for predicting event_type by INFORMATION GAIN — the inner loop of
    tree learners (and of feature-audit tooling: a high-gain split on a
    'neutral' column flags leakage).  Candidate thresholds are the
    ``nbins`` integer-grid bin edges; class counts left/right of each
    edge fold from ONE (bin, type) count pass via prefix sums, so the
    search costs one tiny reduce, not nbins scans.  Entropies use the
    exact-integer-count xlogx form; every candidate's gain is the same
    expression tree on both engines, rounded to 1e-9 before the
    (gain desc, edge asc) argmax (the kmeans comparison idiom).

    Output: one row per candidate edge (the full gain profile) with the
    chosen edge and its gain replicated — profile and decision in one
    table."""
    from .common import sql_round

    def prep(b: pd.DataFrame) -> pd.DataFrame:
        return b.assign(
            bin=np.minimum(np.floor(b["value"].to_numpy(np.float64)
                                    * nbins / VOPT_VMAX),
                           nbins - 1).astype(np.int64))

    c = partial_groupby(
        load(sf_dir, "events", ["event_type", "value"]),
        ["bin", "event_type"], {"n": ("bin", "count")}, prep=prep,
        many_groups=True, num_buckets=8).to_pandas()
    types = sorted(c["event_type"].unique())
    M = (c.pivot_table(index="bin", columns="event_type", values="n",
                       fill_value=0, aggfunc="sum")
         .reindex(range(nbins), fill_value=0)
         .reindex(columns=types, fill_value=0)
         .to_numpy(np.float64))
    tot = M.sum(axis=0)
    n = tot.sum()

    def ent(counts: np.ndarray, m: float) -> float:
        # H in nats times m (the xlogx form): m*ln(m) - sum c*ln(c)
        s = 0.0
        for x in counts:
            if x > 0:
                s = s + x * np.log(x)
        return (m * np.log(m) if m > 0 else 0.0) - s

    h_root = ent(tot, n)
    left = np.zeros_like(tot)
    rows = []
    for e in range(1, nbins):      # split: bin < e vs bin >= e
        left = left + M[e - 1]
        right = tot - left
        nl, nr = left.sum(), right.sum()
        gain = (h_root - ent(left, nl) - ent(right, nr)) / n
        rows.append((e, int(nl), float(sql_round(gain, 9))))
    prof = pd.DataFrame(rows, columns=["edge", "n_left", "gain"])
    best = prof.sort_values(["gain", "edge"],
                            ascending=[False, True]).iloc[0]
    return pd.DataFrame({
        "edge": prof["edge"].astype(np.int64),
        "n_left": prof["n_left"].astype(np.int64),
        "gain": sql_round(prof["gain"].to_numpy(), 6),
        "best_edge": np.full(len(prof), np.int64(best["edge"])),
        "best_gain": np.full(len(prof),
                             float(sql_round(best["gain"], 6)))})


def decision_stump_value_type_sql(nbins: int = STUMP_BINS) -> str:
    """Oracle: the identical xlogx entropies over exact integer counts,
    per-edge left/right folds from the same (bin, type) table, argmax on
    the 1e-9 grid with the (gain desc, edge) tie order."""
    return f"""
        WITH e AS (
            SELECT least(floor(value * {nbins} / {VOPT_VMAX}),
                         {nbins - 1})::BIGINT AS bin, event_type
            FROM events
        ),
        c AS (SELECT bin, event_type, count(*)::DOUBLE AS n FROM e
              GROUP BY 1, 2),
        tot AS (SELECT event_type, sum(n) AS m FROM c GROUP BY 1),
        nn AS (SELECT sum(m) AS n FROM tot),
        hroot AS (
            SELECT (SELECT CASE WHEN n > 0 THEN n * ln(n) ELSE 0.0 END
                    FROM nn)
                   - sum(CASE WHEN m > 0 THEN m * ln(m) ELSE 0.0 END) AS h
            FROM tot
        ),
        edges AS (SELECT range AS e FROM range(1, {nbins})),
        lc AS (
            SELECT edges.e, t.event_type, coalesce(sum(c.n), 0.0) AS l
            FROM edges CROSS JOIN (SELECT event_type FROM tot) t
            LEFT JOIN c ON c.event_type = t.event_type AND c.bin < edges.e
            GROUP BY 1, 2
        ),
        side AS (
            SELECT lc.e, lc.l, tot.m - lc.l AS r
            FROM lc JOIN tot USING (event_type)
        ),
        g AS (
            SELECT e, sum(l) AS nl, sum(r) AS nr,
                   sum(CASE WHEN l > 0 THEN l * ln(l) ELSE 0.0 END) AS sl,
                   sum(CASE WHEN r > 0 THEN r * ln(r) ELSE 0.0 END) AS sr
            FROM side GROUP BY e
        ),
        gain AS (
            SELECT e, CAST(nl AS BIGINT) AS n_left,
                   round(((SELECT h FROM hroot)
                          - ((CASE WHEN nl > 0 THEN nl * ln(nl)
                              ELSE 0.0 END) - sl)
                          - ((CASE WHEN nr > 0 THEN nr * ln(nr)
                              ELSE 0.0 END) - sr))
                         / (SELECT n FROM nn), 9) AS g9
            FROM g
        ),
        best AS (SELECT e AS be, g9 AS bg FROM gain
                 ORDER BY g9 DESC, e LIMIT 1)
        SELECT e::BIGINT AS edge, n_left, round(g9, 6) AS gain,
               (SELECT be FROM best)::BIGINT AS best_edge,
               round((SELECT bg FROM best), 6) AS best_gain
        FROM gain
    """


def value_benford_audit(sf_dir: str) -> pd.DataFrame:
    """BENFORD'S-LAW FIRST-DIGIT AUDIT of the value column — the
    classic forensic screen for fabricated or truncated numeric data:
    natural multi-scale amounts put digit d first with probability
    log10(1 + 1/d); a flat or spiked profile flags synthetic grids,
    capped fields or unit bugs.  First digits come from the integer
    cents (exact string/arithmetic both engines); the chi-square
    distance to the Benford expectation rides along, rounded 4 dp.

    Scale shape: a 9-bucket count reduce; the expectation fold is nine
    driver rows."""
    from .common import sql_round

    def prep(b: pd.DataFrame) -> pd.DataFrame:
        cents = np.floor(b["value"].to_numpy(np.float64) * 100.0
                         + 0.5).astype(np.int64)
        cents = np.maximum(cents, 1)
        # string route, not floor(log10): float log10 can misfloor at
        # exact powers of ten — the oracle's substr does the same
        digits = (pd.Series(cents).astype(str).str[0]
                  .astype(np.int64).to_numpy())
        return b.assign(digit=digits)

    c = partial_groupby(load(sf_dir, "events", ["value"]), ["digit"],
                        {"n": ("digit", "count")}, prep=prep).to_pandas()
    full = pd.Series(0, index=range(1, 10), dtype=np.int64)
    full = full.add(c.set_index("digit")["n"], fill_value=0).astype(
        np.int64)
    n = int(full.sum())
    p = np.log10(1.0 + 1.0 / np.arange(1, 10, dtype=np.float64))
    exp = n * p
    obs = full.to_numpy(np.float64)
    chi2 = float(sql_round((((obs - exp) ** 2) / exp).sum(), 4))
    return pd.DataFrame({
        "digit": np.arange(1, 10, dtype=np.int64),
        "n": full.to_numpy(np.int64),
        "frac": sql_round(obs / n, 6),
        "benford_p": sql_round(p, 6),
        "chi2": np.full(9, chi2)})


def value_benford_audit_sql() -> str:
    return """
        WITH c AS (
            SELECT CAST(substr(CAST(greatest(
                       CAST(round(value * 100.0, 0) AS BIGINT), 1)
                       AS VARCHAR), 1, 1) AS BIGINT) AS digit,
                   count(*)::BIGINT AS n
            FROM events GROUP BY 1
        ),
        g AS (
            SELECT r.range AS digit, coalesce(c.n, 0)::BIGINT AS n,
                   log10(1.0 + 1.0 / r.range) AS p
            FROM range(1, 10) r LEFT JOIN c ON c.digit = r.range
        ),
        t AS (SELECT sum(n)::DOUBLE AS tot FROM g),
        x AS (
            SELECT round(sum((n - t.tot * p) * (n - t.tot * p)
                             / (t.tot * p)), 4) AS chi2
            FROM g, t
        )
        SELECT digit, n, round(n / (SELECT tot FROM t), 6) AS frac,
               round(p, 6) AS benford_p,
               (SELECT chi2 FROM x) AS chi2
        FROM g
    """


def type_hour_mi(sf_dir: str, num_buckets: int = 8) -> pd.DataFrame:
    """MUTUAL INFORMATION between event_type and hour-of-day — the
    dependence measure that, unlike chi-square, reads directly in nats
    ("how many bits does the clock tell you about what users do"), with
    the normalized variant MI/min(H_type, H_hour) in [0, 1] for
    cross-dataset comparison.  All three entropies use the stump's
    xlogx-on-exact-integer-counts form (H = ln n - sum c*ln(c)/n), so
    the only cross-engine drift is summation-order ulps under a 6 dp
    grid.

    Scale shape: one (type, hour) count reduce (~120 cells); the
    entropy fold runs driver-side."""
    from .common import sql_round

    def prep(b: pd.DataFrame) -> pd.DataFrame:
        return b.assign(hour=b["ts"].dt.hour.astype(np.int64))

    c = partial_groupby(
        load(sf_dir, "events", ["ts", "event_type"]),
        ["event_type", "hour"], {"n": ("hour", "count")}, prep=prep,
        many_groups=True, num_buckets=num_buckets).to_pandas()
    n = float(c["n"].sum())

    def ent(counts: np.ndarray) -> float:
        s = 0.0
        for x in np.sort(counts)[::-1]:
            if x > 0:
                s = s + x * np.log(x)
        return np.log(n) - s / n

    hx = ent(c.groupby("event_type")["n"].sum().to_numpy(np.float64))
    hy = ent(c.groupby("hour")["n"].sum().to_numpy(np.float64))
    hxy = ent(c["n"].to_numpy(np.float64))
    mi = hx + hy - hxy
    return pd.DataFrame({
        "n_events": [np.int64(n)],
        "n_types": [np.int64(c["event_type"].nunique())],
        "n_hours": [np.int64(c["hour"].nunique())],
        "h_type": [float(sql_round(hx, 6))],
        "h_hour": [float(sql_round(hy, 6))],
        "mi_nats": [float(sql_round(mi, 6))],
        "nmi": [float(sql_round(mi / min(hx, hy), 6))
                if min(hx, hy) > 0 else 0.0]})


def type_hour_mi_sql() -> str:
    """Oracle: identical xlogx entropies; the cell sums are unordered
    but every output rounds on the shared 6 dp grid."""
    return """
        WITH c AS (
            SELECT event_type, CAST(hour(ts) AS BIGINT) AS hour,
                   count(*)::DOUBLE AS n
            FROM events GROUP BY 1, 2
        ),
        t AS (SELECT sum(n) AS n FROM c),
        hx AS (
            SELECT ln((SELECT n FROM t))
                   - sum(m * ln(m)) / (SELECT n FROM t) AS h
            FROM (SELECT sum(n) AS m FROM c GROUP BY event_type)
        ),
        hy AS (
            SELECT ln((SELECT n FROM t))
                   - sum(m * ln(m)) / (SELECT n FROM t) AS h
            FROM (SELECT sum(n) AS m FROM c GROUP BY hour)
        ),
        hxy AS (
            SELECT ln((SELECT n FROM t))
                   - sum(n * ln(n)) / (SELECT n FROM t) AS h
            FROM c
        )
        SELECT CAST((SELECT n FROM t) AS BIGINT) AS n_events,
               (SELECT count(DISTINCT event_type) FROM c)::BIGINT
                   AS n_types,
               (SELECT count(DISTINCT hour) FROM c)::BIGINT AS n_hours,
               round((SELECT h FROM hx), 6) AS h_type,
               round((SELECT h FROM hy), 6) AS h_hour,
               round((SELECT h FROM hx) + (SELECT h FROM hy)
                     - (SELECT h FROM hxy), 6) AS mi_nats,
               CASE WHEN least((SELECT h FROM hx), (SELECT h FROM hy))
                        <= 0 THEN 0.0
                    ELSE round(((SELECT h FROM hx) + (SELECT h FROM hy)
                                - (SELECT h FROM hxy))
                               / least((SELECT h FROM hx),
                                       (SELECT h FROM hy)), 6)
               END AS nmi
        FROM t
    """


DUP_PAY_WINDOW_DAYS = 1


def duplicate_payment_audit(sf_dir: str,
                            num_buckets: int = 16) -> pd.DataFrame:
    """DOUBLE-CHARGE AUDIT: order pairs with the SAME customer, the
    SAME amount (exact integer cents) and order dates within one day —
    the classic payments-integrity screen (retry storms and idempotency
    bugs surface exactly here).  Pairs are (smaller, larger) orderkey;
    day distance rides along.  All comparisons integer-exact.

    Scale shape: candidate pairs only form INSIDE (custkey, cents)
    groups — one keyed exchange of (cust, cents, day, key) rows, pair
    expansion bounded by per-group counts (duplicate amounts are rare
    by construction of the audit)."""
    from .common import keyed_map_groups

    ds = load(sf_dir, "orders",
              ["o_orderkey", "o_custkey", "o_totalprice", "o_orderdate"])

    def prep(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "o_custkey": b["o_custkey"].to_numpy(np.int64),
            "cents": np.round(b["o_totalprice"].to_numpy(np.float64)
                              * 100.0).astype(np.int64),
            "day": (b["o_orderdate"].to_numpy()
                    .astype("datetime64[D]").astype(np.int64)),
            "o_orderkey": b["o_orderkey"].to_numpy(np.int64)})

    def pairs(g: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for (_c, _v), grp in g.groupby(["o_custkey", "cents"],
                                       sort=False):
            if len(grp) < 2:
                continue
            grp = grp.sort_values("o_orderkey")
            k = grp["o_orderkey"].to_numpy(np.int64)
            d = grp["day"].to_numpy(np.int64)
            i, j = np.triu_indices(len(k), k=1)
            m = np.abs(d[i] - d[j]) <= DUP_PAY_WINDOW_DAYS
            for a, b_, dd in zip(k[i][m], k[j][m],
                                 np.abs(d[i] - d[j])[m]):
                rows.append((int(_c), int(_v), int(a), int(b_),
                             int(dd)))
        return pd.DataFrame(rows, columns=[
            "o_custkey", "cents", "okey_lo", "okey_hi", "day_gap"]
        ).astype(np.int64) if rows else pd.DataFrame({
            "o_custkey": pd.Series([], dtype=np.int64),
            "cents": pd.Series([], dtype=np.int64),
            "okey_lo": pd.Series([], dtype=np.int64),
            "okey_hi": pd.Series([], dtype=np.int64),
            "day_gap": pd.Series([], dtype=np.int64)})

    out = keyed_map_groups(ds.map_batches(prep, batch_format="pandas"),
                           "o_custkey", pairs, num_buckets).to_pandas()
    if "okey_lo" not in out.columns:   # zero matches: empty Dataset
        out = pd.DataFrame({            # drops its schema (gotcha)
            "o_custkey": pd.Series([], dtype=np.int64),
            "cents": pd.Series([], dtype=np.int64),
            "okey_lo": pd.Series([], dtype=np.int64),
            "okey_hi": pd.Series([], dtype=np.int64),
            "day_gap": pd.Series([], dtype=np.int64)})
    return (out.sort_values(["okey_lo", "okey_hi"])
            .reset_index(drop=True))


def duplicate_payment_audit_sql() -> str:
    return f"""
        WITH o AS (
            SELECT o_orderkey, o_custkey,
                   CAST(round(o_totalprice * 100) AS BIGINT) AS cents,
                   CAST(epoch(date_trunc('day', o_orderdate)) // 86400
                        AS BIGINT) AS day
            FROM orders
        )
        SELECT a.o_custkey, a.cents,
               a.o_orderkey AS okey_lo, b.o_orderkey AS okey_hi,
               abs(a.day - b.day)::BIGINT AS day_gap
        FROM o a JOIN o b
             ON b.o_custkey = a.o_custkey AND b.cents = a.cents
            AND b.o_orderkey > a.o_orderkey
            AND abs(a.day - b.day) <= {DUP_PAY_WINDOW_DAYS}
    """


def click_purchase_rank_test(sf_dir: str,
                             num_buckets: int = 8) -> pd.DataFrame:
    """MANN-WHITNEY U rank-sum test between click and purchase values —
    the nonparametric "are these two distributions shifted" test that
    needs no normality assumption; the curation read is whether an
    event class systematically carries larger values.  Because values
    sit on the cents grid, U computes EXACTLY from per-cents counts:
    U_a = sum_v nb(v) * (cum_na(<v) + na(v)/2), all integers and
    half-integers — no ranking pass, no FP until the final z-score
    (normal approximation with tie correction, rounded 4 dp).

    Scale shape: one (side, cents) count reduce (value-cardinality
    bounded); the U fold runs on that driver table."""
    from .common import sql_round

    def prep(b: pd.DataFrame) -> pd.DataFrame:
        b = b[b["event_type"].isin(("click", "purchase"))]
        return b.assign(
            side=(b["event_type"] == "purchase").astype(np.int64),
            cents=np.floor(b["value"].to_numpy(np.float64) * 100.0
                           + 0.5).astype(np.int64))

    c = partial_groupby(
        load(sf_dir, "events", ["event_type", "value"]),
        ["side", "cents"], {"n": ("cents", "count")}, prep=prep,
        many_groups=True, num_buckets=num_buckets).to_pandas()
    piv = (c.pivot_table(index="cents", columns="side", values="n",
                         fill_value=0, aggfunc="sum")
           .reindex(columns=[0, 1], fill_value=0).sort_index())
    na = piv[0].to_numpy(np.int64)
    nb = piv[1].to_numpy(np.int64)
    Na, Nb = int(na.sum()), int(nb.sum())
    cum_a = np.concatenate([[0], np.cumsum(na)[:-1]])
    # 2*U to stay integer through the half-ties
    two_u = int((nb * (2 * cum_a + na)).sum())
    mu2 = Na * Nb                        # 2 * E[U]
    t = (na + nb).astype(object)
    n_tot = Na + Nb
    tie_term = sum(int(x) ** 3 - int(x) for x in t)
    var = (Na * Nb / 12.0) * ((n_tot + 1)
                              - tie_term / (n_tot * (n_tot - 1.0)))
    z = ((two_u - mu2) / 2.0) / np.sqrt(var) if var > 0 else 0.0
    return pd.DataFrame({
        "n_click": [np.int64(Na)], "n_purchase": [np.int64(Nb)],
        "two_u": [np.int64(two_u)],
        "z_score": [float(sql_round(z, 4))]})


def click_purchase_rank_test_sql() -> str:
    return """
        WITH e AS (
            SELECT CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END
                       AS side,
                   CAST(round(value * 100.0, 0) AS BIGINT) AS cents
            FROM events WHERE event_type IN ('click', 'purchase')
        ),
        c AS (
            SELECT cents,
                   sum(CASE WHEN side = 0 THEN 1 ELSE 0 END)::BIGINT
                       AS na,
                   sum(side)::BIGINT AS nb
            FROM e GROUP BY cents
        ),
        r AS (
            SELECT cents, na, nb,
                   coalesce(sum(na) OVER (ORDER BY cents
                       ROWS BETWEEN UNBOUNDED PRECEDING
                       AND 1 PRECEDING), 0) AS cum_a
            FROM c
        ),
        s AS (
            SELECT sum(na)::BIGINT AS tot_a, sum(nb)::BIGINT AS tot_b,
                   sum(nb * (2 * cum_a + na))::BIGINT AS two_u,
                   sum((na + nb) * (na + nb) * (na + nb)
                       - (na + nb))::BIGINT AS tie_term
            FROM r
        )
        SELECT tot_a AS n_click, tot_b AS n_purchase, two_u,
               CASE WHEN tot_a * tot_b = 0
                      OR (tot_a + tot_b + 1)
                         - tie_term / ((tot_a + tot_b)
                                       * (tot_a + tot_b - 1.0)) <= 0
                    THEN 0.0
                    ELSE round(((two_u - tot_a * tot_b) / 2.0)
                         / sqrt((tot_a * tot_b / 12.0)
                                * ((tot_a + tot_b + 1)
                                   - tie_term
                                     / ((tot_a + tot_b)
                                        * (tot_a + tot_b - 1.0)))), 4)
               END AS z_score
        FROM s
    """


def click_purchase_ks_test(sf_dir: str,
                           num_buckets: int = 8) -> pd.DataFrame:
    """KOLMOGOROV-SMIRNOV two-sample test between click and purchase
    values: D = sup |CDF_a - CDF_b|, the distribution-shape companion
    to the rank test's location shift (KS also catches equal-median
    spread changes).  On the cents grid the sup is an EXACT integer
    maximum of |cum_na * Nb - cum_nb * Na| (the EMD cross-multiply
    move), divided once at the end; the asymptotic statistic
    lambda = D * sqrt(Na*Nb/(Na+Nb)) rides along (>1.36 ~ p<0.05).

    Scale shape: the same one (side, cents) count reduce as the rank
    test; the sup folds on the driver table."""
    from .common import sql_round

    def prep(b: pd.DataFrame) -> pd.DataFrame:
        b = b[b["event_type"].isin(("click", "purchase"))]
        return b.assign(
            side=(b["event_type"] == "purchase").astype(np.int64),
            cents=np.floor(b["value"].to_numpy(np.float64) * 100.0
                           + 0.5).astype(np.int64))

    c = partial_groupby(
        load(sf_dir, "events", ["event_type", "value"]),
        ["side", "cents"], {"n": ("cents", "count")}, prep=prep,
        many_groups=True, num_buckets=num_buckets).to_pandas()
    piv = (c.pivot_table(index="cents", columns="side", values="n",
                         fill_value=0, aggfunc="sum")
           .reindex(columns=[0, 1], fill_value=0).sort_index())
    na = piv[0].to_numpy(np.int64)
    nb = piv[1].to_numpy(np.int64)
    Na, Nb = int(na.sum()), int(nb.sum())
    # exact integer sup of the cross-multiplied CDF difference
    acc, num = 0, 0
    for i in range(len(na)):
        acc += int(na[i]) * Nb - int(nb[i]) * Na
        num = max(num, abs(acc))
    d = num / (Na * Nb) if Na and Nb else 0.0
    lam = (d * np.sqrt(Na * Nb / (Na + Nb))
           if Na and Nb else 0.0)
    return pd.DataFrame({
        "n_click": [np.int64(Na)], "n_purchase": [np.int64(Nb)],
        "ks_numerator": [np.int64(num)],
        "ks_d": [float(sql_round(d, 6))],
        "ks_lambda": [float(sql_round(lam, 4))]})


def click_purchase_ks_test_sql() -> str:
    return """
        WITH e AS (
            SELECT CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END
                       AS side,
                   CAST(round(value * 100.0, 0) AS BIGINT) AS cents
            FROM events WHERE event_type IN ('click', 'purchase')
        ),
        c AS (
            SELECT cents,
                   sum(CASE WHEN side = 0 THEN 1 ELSE 0 END)::BIGINT
                       AS na,
                   sum(side)::BIGINT AS nb
            FROM e GROUP BY cents
        ),
        t AS (SELECT sum(na)::BIGINT AS ta, sum(nb)::BIGINT AS tb
              FROM c),
        cd AS (
            SELECT abs(sum(na * (SELECT tb FROM t)
                           - nb * (SELECT ta FROM t))
                       OVER (ORDER BY cents ROWS BETWEEN UNBOUNDED
                             PRECEDING AND CURRENT ROW)) AS a
            FROM c
        ),
        d AS (SELECT max(a)::BIGINT AS num FROM cd)
        SELECT (SELECT ta FROM t) AS n_click,
               (SELECT tb FROM t) AS n_purchase,
               (SELECT num FROM d) AS ks_numerator,
               CASE WHEN (SELECT ta FROM t) * (SELECT tb FROM t) = 0
                    THEN 0.0
                    ELSE round((SELECT num FROM d)
                         / ((SELECT ta FROM t)
                            * (SELECT tb FROM t))::DOUBLE, 6)
               END AS ks_d,
               CASE WHEN (SELECT ta FROM t) * (SELECT tb FROM t) = 0
                    THEN 0.0
                    ELSE round((SELECT num FROM d)
                         / ((SELECT ta FROM t) * (SELECT tb FROM t))
                           ::DOUBLE
                         * sqrt((SELECT ta FROM t)::DOUBLE
                                * (SELECT tb FROM t)
                                / ((SELECT ta FROM t)
                                   + (SELECT tb FROM t))), 4)
               END AS ks_lambda
        FROM d
    """


def order_size_price_spearman(sf_dir: str,
                              num_buckets: int = 16) -> pd.DataFrame:
    """SPEARMAN RANK CORRELATION between an order's line count and its
    total price — the robust (monotone, outlier-proof) companion to
    price_quantity_corr's Pearson: it answers "do bigger orders cost
    more" without the heavy tail dominating.  Ties take MIDRANKS
    (midrank = cum_before + (cnt+1)/2 — exact half-integers from the
    per-distinct-value count tables), and rho is Pearson on the
    midranks via the usual moment sums; both engines evaluate the
    identical closed form, 6 dp.

    Scale shape: one order-keyed count join (orders x lineitem), two
    per-distinct-value count reduces (tie tables), one moment reduce
    over (rx, ry) pairs with the tie tables broadcast."""
    import ray as _ray

    from .common import _cached_get, sql_round

    li = partial_groupby(load(sf_dir, "lineitem", ["l_orderkey"]),
                         ["l_orderkey"], {"n_items": ("l_orderkey",
                                                      "count")},
                         many_groups=True, num_buckets=num_buckets
                         ).map_batches(
        lambda b: b.rename(columns={"l_orderkey": "o_orderkey"}),
        batch_format="pandas")

    def prep(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "o_orderkey": b["o_orderkey"].to_numpy(np.int64),
            "cents": np.round(b["o_totalprice"].to_numpy(np.float64)
                              * 100.0).astype(np.int64)})

    orders = load(sf_dir, "orders", ["o_orderkey", "o_totalprice"]
                  ).map_batches(prep, batch_format="pandas")

    from .common import hash_join

    j = hash_join(orders, li, "o_orderkey",
                  ["o_orderkey", "cents"], ["o_orderkey", "n_items"],
                  num_buckets=num_buckets)

    # tie tables: per-distinct-value counts (value-cardinality bounded)
    cx = partial_groupby(j, ["cents"], {"c": ("cents", "count")},
                         many_groups=True,
                         num_buckets=num_buckets).to_pandas()
    cy = partial_groupby(j, ["n_items"], {"c": ("n_items", "count")},
                         many_groups=True,
                         num_buckets=num_buckets).to_pandas()

    def midranks(t: pd.DataFrame, col: str) -> dict:
        t = t.sort_values(col)
        cnt = t["c"].to_numpy(np.int64)
        cum = np.concatenate([[0], np.cumsum(cnt)[:-1]])
        mr = cum + (cnt + 1) / 2.0       # exact half-integers
        return dict(zip(t[col].astype(int), mr))

    ref = _ray.put((midranks(cx, "cents"), midranks(cy, "n_items")))

    def moments(b: pd.DataFrame) -> pd.DataFrame:
        mx, my = _cached_get(ref)
        rx = b["cents"].map(mx).to_numpy(np.float64)
        ry = b["n_items"].map(my).to_numpy(np.float64)
        return pd.DataFrame({
            "n": [np.int64(len(b))], "sx": [rx.sum()], "sy": [ry.sum()],
            "sxx": [(rx * rx).sum()], "syy": [(ry * ry).sum()],
            "sxy": [(rx * ry).sum()]})

    m = (j.map_batches(moments, batch_format="pandas")
         .to_pandas().sum())
    n = float(m["n"])
    num = n * m["sxy"] - m["sx"] * m["sy"]
    den = np.sqrt((n * m["sxx"] - m["sx"] ** 2)
                  * (n * m["syy"] - m["sy"] ** 2))
    rho = float(sql_round(num / den, 6)) if den > 0 else 0.0
    return pd.DataFrame({"n_orders": [np.int64(n)],
                         "spearman_rho": [rho]})


def order_size_price_spearman_sql() -> str:
    return """
        WITH j AS (
            SELECT o.o_orderkey,
                   CAST(round(o.o_totalprice * 100) AS BIGINT) AS cents,
                   l.n_items
            FROM orders o JOIN (
                SELECT l_orderkey, count(*)::BIGINT AS n_items
                FROM lineitem GROUP BY 1) l
              ON l.l_orderkey = o.o_orderkey
        ),
        r AS (
            SELECT (rank() OVER (ORDER BY cents)
                    + (count(*) OVER (PARTITION BY cents) - 1)
                      / 2.0) AS rx,
                   (rank() OVER (ORDER BY n_items)
                    + (count(*) OVER (PARTITION BY n_items) - 1)
                      / 2.0) AS ry
            FROM j
        ),
        s AS (
            SELECT count(*)::DOUBLE AS n, sum(rx) AS sx, sum(ry) AS sy,
                   sum(rx * rx) AS sxx, sum(ry * ry) AS syy,
                   sum(rx * ry) AS sxy
            FROM r
        )
        SELECT CAST(n AS BIGINT) AS n_orders,
               CASE WHEN (n * sxx - sx * sx) * (n * syy - sy * sy) <= 0
                    THEN 0.0
                    ELSE round((n * sxy - sx * sy)
                         / sqrt((n * sxx - sx * sx)
                                * (n * syy - sy * sy)), 6)
               END AS spearman_rho
        FROM s
    """
