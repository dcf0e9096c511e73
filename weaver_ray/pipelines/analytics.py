"""Wide-analytics operators: multi-way star joins, set intersection,
JSON-path extraction, correlation aggregates, and global NTILE ranking.

These extend the relational family (relational.py) along axes the reference
only gestures at — its one "join" is the gather merge's N-way union +
first-wins map (src/client/main.go:157-196); the star queries here chain
the same bucketed hash join / broadcast join machinery across 4-6 tables
with the aggregates pushed into the join buckets.  Every operator has a
full DuckDB oracle in __ray_entry__.py; column names and rounding match
the SQL exactly.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray
import ray.data as rd

from .common import (_cached_get, broadcast_join, global_row_number, hash_join,
                     keyed_map_groups, load, load_arrow, partial_groupby,
                     sql_round)


def brand_revenue(sf_dir: str, num_buckets: int = 16) -> pd.DataFrame:
    """Revenue by part brand: lineitem x part is a LARGE-LARGE join (part
    grows with scale, unlike the broadcastable dims), so it runs through the
    explicit bucketed hash join with the brand aggregate pushed INTO each
    bucket — the shuffle's output is one partial row per (brand, bucket),
    never the joined rows."""
    li = load(sf_dir, "lineitem", ["l_partkey", "l_extendedprice", "l_discount"])
    part = load(sf_dir, "part", ["p_partkey", "p_brand"]).map_batches(
        lambda b: b.rename(columns={"p_partkey": "l_partkey"}),
        batch_format="pandas")

    def agg(j: pd.DataFrame) -> pd.DataFrame:
        g = j.assign(rev=j["l_extendedprice"] * (1.0 - j["l_discount"])).groupby(
            "p_brand", sort=False)
        return pd.DataFrame({"revenue": g["rev"].sum(),
                             "n_items": g.size()}).reset_index()

    parts = hash_join(
        li, part, on="l_partkey",
        lcols=["l_partkey", "l_extendedprice", "l_discount"],
        rcols=["l_partkey", "p_brand"],
        num_buckets=num_buckets, post=agg,
    ).to_pandas()  # one row per (brand, bucket): tiny
    out = (parts.groupby("p_brand", sort=False)
           .agg(revenue=("revenue", "sum"), n_items=("n_items", "sum"))
           .reset_index())
    out["revenue"] = sql_round(out["revenue"], 2)
    out["n_items"] = out["n_items"].astype(np.int64)
    return out.sort_values("p_brand").reset_index(drop=True)


def local_supplier_volume(sf_dir: str, num_buckets: int = 16) -> pd.DataFrame:
    """TPC-H Q5 shape — revenue by nation where the customer and the
    supplier sit in the SAME nation.  Join tree: orders gains c_nationkey by
    broadcast (customer key->nation is dimension-sized), then ONE bucketed
    hash join lineitem x orders carries it to the fact rows; the supplier
    nation lookup + locality filter + grouped aggregate all run inside the
    join buckets, so the only wide exchange in the 6-table query is the
    single l_orderkey shuffle.  Nation/region name decoration happens on the
    ~25-row result."""
    orders = load(sf_dir, "orders", ["o_orderkey", "o_custkey"])
    cust = load_arrow(sf_dir, "customer", ["c_custkey", "c_nationkey"])
    cust = cust.rename_columns(["o_custkey", "c_nationkey"])
    ord_nat = broadcast_join(orders, cust, on="o_custkey").map_batches(
        lambda b: b.rename(columns={"o_orderkey": "l_orderkey"}),
        batch_format="pandas")

    li = load(sf_dir, "lineitem",
              ["l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"])
    supp = load_arrow(sf_dir, "supplier", ["s_suppkey", "s_nationkey"]).to_pandas()
    supp = supp.rename(columns={"s_suppkey": "l_suppkey"})
    sref = ray.put(supp)

    def agg(j: pd.DataFrame) -> pd.DataFrame:
        j = j.merge(_cached_get(sref), on="l_suppkey", how="inner")
        j = j[j["s_nationkey"] == j["c_nationkey"]]
        g = j.assign(rev=j["l_extendedprice"] * (1.0 - j["l_discount"])).groupby(
            "c_nationkey", sort=False)
        return pd.DataFrame({"rev_part": g["rev"].sum()}).reset_index()

    parts = hash_join(
        li, ord_nat, on="l_orderkey",
        lcols=["l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"],
        rcols=["l_orderkey", "c_nationkey"],
        num_buckets=num_buckets, post=agg,
    ).to_pandas()
    out = parts.groupby("c_nationkey", sort=False)["rev_part"].sum().reset_index()

    nation = load_arrow(sf_dir, "nation").to_pandas()
    region = load_arrow(sf_dir, "region").to_pandas()
    out = out.merge(nation, left_on="c_nationkey", right_on="n_nationkey")
    out = out.merge(region, left_on="n_regionkey", right_on="r_regionkey")
    return pd.DataFrame({
        "n_name": out["n_name"],
        "r_name": out["r_name"],
        "revenue": sql_round(out["rev_part"], 2),
    }).sort_values("n_name").reset_index(drop=True)


def _user_type_flag_set(sf_dir: str, keep_rule, num_buckets: int) -> rd.Dataset:
    """Shared machinery for distributed set ops over the user/event-type
    streams (INTERSECTION and DIFFERENCE): per-batch flag dedup (one row per
    user per batch, two booleans) is the combiner; the reduce is one hash
    shuffle of those tiny flag rows — a type's full row set is never
    co-located.  ``keep_rule(has_click, has_purchase) -> bool mask``."""
    ds = load(sf_dir, "events", ["user_id", "event_type"])

    def flags(b: pd.DataFrame) -> pd.DataFrame:
        b = b[b["event_type"].isin(("click", "purchase"))]
        g = b.assign(is_c=b["event_type"] == "click",
                     is_p=b["event_type"] == "purchase").groupby("user_id", sort=False)
        return pd.DataFrame({"has_click": g["is_c"].max(),
                             "has_purchase": g["is_p"].max()}).reset_index()

    def reduce(g: pd.DataFrame) -> pd.DataFrame:
        gg = g.groupby("user_id", sort=False)
        f = pd.DataFrame({"has_click": gg["has_click"].max(),
                          "has_purchase": gg["has_purchase"].max()}).reset_index()
        keep = f.loc[keep_rule(f["has_click"], f["has_purchase"]), ["user_id"]]
        return keep.astype({"user_id": np.int64})

    partials = ds.map_batches(flags, batch_format="pandas")
    return keyed_map_groups(partials, "user_id", reduce, num_buckets)


def users_click_and_purchase(sf_dir: str, num_buckets: int = 16) -> rd.Dataset:
    """Distributed set INTERSECTION: distinct users present in both the
    'click' and the 'purchase' streams (see :func:`_user_type_flag_set`)."""
    return _user_type_flag_set(sf_dir, lambda c, p: c & p, num_buckets)


def users_click_no_purchase(sf_dir: str, num_buckets: int = 16) -> pd.DataFrame:
    """Distributed set DIFFERENCE (the EXCEPT complement of
    :func:`users_click_and_purchase`): distinct users who clicked but never
    purchased — same flag-dedup combiner, inverted keep rule.  The result
    is LEGITIMATELY empty at small sf (every clicker purchased), so the
    shim pins the (user_id:int64) schema that ``Dataset.to_pandas()`` drops
    on an all-empty result."""
    from .dedup import _pairs_to_pandas

    return _pairs_to_pandas(
        _user_type_flag_set(sf_dir, lambda c, p: c & ~p, num_buckets),
        ["user_id"], {"user_id": np.int64})


def props_key_stats(sf_dir: str) -> pd.DataFrame:
    """Typed JSON-path extraction over the semi-structured `props` column
    (the reference ships JSON-in-a-string envelopes everywhere —
    src/common/utils.go:42-86; here the unwrap is columnar).  For the flat
    single-key path the extraction is a VECTORIZED regex over the string
    column — a general nested-path extractor would need a per-row
    json.loads, which is exactly the per-row hot-path cost this engine
    avoids; the scope constraint is the trade and it is documented here.
    k is typed DOUBLE and rows WITHOUT the key are dropped, mirroring the
    oracle's ``CAST(json_extract(...) AS DOUBLE) ... WHERE k IS NOT NULL``
    exactly (an int-only extract would silently truncate '1.5' and crash
    on a missing key)."""
    ds = load(sf_dir, "events", ["event_type", "props"])

    def prep(b: pd.DataFrame) -> pd.DataFrame:
        k = b["props"].str.extract(
            r'"k"\s*:\s*(-?\d+(?:\.\d+)?)', expand=False).astype(np.float64)
        b = b.assign(k=k)
        return b[k.notna()]

    out = partial_groupby(
        ds, ["event_type"],
        {"n": ("k", "count"), "sum_k": ("k", "sum"),
         "min_k": ("k", "min"), "max_k": ("k", "max")},
        prep=prep,
    ).to_pandas()  # one row per event type
    return pd.DataFrame({
        "event_type": out["event_type"],
        "n": out["n"].astype(np.int64),
        "avg_k": sql_round(out["sum_k"] / out["n"], 4),
        "min_k": sql_round(out["min_k"], 4),
        "max_k": sql_round(out["max_k"], 4),
    }).sort_values("event_type").reset_index(drop=True)


def price_quantity_corr(sf_dir: str) -> pd.DataFrame:
    """Pearson correlation + sample covariance per group from ONE pass of
    mergeable moment partials (n, Σx, Σy, Σx², Σy², Σxy) — the textbook
    sufficient-statistics pattern: the shuffle moves six numbers per
    (group, batch), the driver finishes the 3-group result."""
    ds = load(sf_dir, "lineitem", ["l_returnflag", "l_extendedprice", "l_quantity"])

    def prep(b: pd.DataFrame) -> pd.DataFrame:
        x, y = b["l_extendedprice"], b["l_quantity"]
        return b.assign(x=x, y=y, xx=x * x, yy=y * y, xy=x * y)

    out = partial_groupby(
        ds, ["l_returnflag"],
        {"n": ("x", "count"), "sx": ("x", "sum"), "sy": ("y", "sum"),
         "sxx": ("xx", "sum"), "syy": ("yy", "sum"), "sxy": ("xy", "sum")},
        prep=prep,
    ).to_pandas()
    n = out["n"].astype(np.float64)
    cov = (out["sxy"] - out["sx"] * out["sy"] / n) / (n - 1.0)
    vx = (out["sxx"] - out["sx"] ** 2 / n) / (n - 1.0)
    vy = (out["syy"] - out["sy"] ** 2 / n) / (n - 1.0)
    return pd.DataFrame({
        "l_returnflag": out["l_returnflag"],
        "n": out["n"].astype(np.int64),
        "corr_price_qty": sql_round(cov / np.sqrt(vx * vy), 4),
        "covar_price_qty": sql_round(cov, 2),
    }).sort_values("l_returnflag").reset_index(drop=True)


def lineitem_rollup(sf_dir: str) -> pd.DataFrame:
    """GROUP BY ROLLUP(returnflag, linestatus): the finest grain is the only
    DISTRIBUTED aggregation; the subtotal and grand-total grains are derived
    from its handful of rows driver-side — a rollup never needs a second
    pass over the data, just re-reduction of the finest partials."""
    ds = load(sf_dir, "lineitem",
              ["l_returnflag", "l_linestatus", "l_extendedprice"])
    fine = partial_groupby(
        ds, ["l_returnflag", "l_linestatus"],
        {"revenue": ("l_extendedprice", "sum"),
         "n_items": ("l_extendedprice", "count")},
    ).to_pandas()
    sub = (fine.groupby("l_returnflag", as_index=False)
           [["revenue", "n_items"]].sum().assign(l_linestatus="ALL"))
    tot = pd.DataFrame({"l_returnflag": ["ALL"], "l_linestatus": ["ALL"],
                        "revenue": [fine["revenue"].sum()],
                        "n_items": [fine["n_items"].sum()]})
    out = pd.concat([fine, sub, tot], ignore_index=True)
    out["revenue"] = sql_round(out["revenue"], 2)
    out["n_items"] = out["n_items"].astype(np.int64)
    return (out[["l_returnflag", "l_linestatus", "revenue", "n_items"]]
            .sort_values(["l_returnflag", "l_linestatus"]).reset_index(drop=True))


def embedding_dim_stats(sf_dir: str) -> pd.DataFrame:
    """Per-dimension profile of the list<float> embedding column.  The list
    column never explodes into rows engine-side: each batch stacks into a
    (rows x dim) float64 matrix and emits ONE partial row per dimension
    (sum/min/max/n), so the exchange moves dim-count rows per batch while
    the SQL oracle pays the full unnest."""
    import pyarrow as pa

    ds = load(sf_dir, "embeddings", ["embedding"])

    def partial(t: pa.Table) -> pd.DataFrame:
        m = np.stack(t["embedding"].to_numpy(zero_copy_only=False)).astype(np.float64)
        return pd.DataFrame({
            "dim": np.arange(1, m.shape[1] + 1, dtype=np.int64),
            "s": m.sum(axis=0),
            "mn": m.min(axis=0),
            "mx": m.max(axis=0),
            "n": np.int64(m.shape[0]),
        })

    parts = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    g = parts.groupby("dim", as_index=False).agg(
        s=("s", "sum"), mn=("mn", "min"), mx=("mx", "max"), n=("n", "sum"))
    return pd.DataFrame({
        "dim": g["dim"].astype(np.int64),
        "avg_val": sql_round(g["s"] / g["n"], 4),
        "min_val": sql_round(g["mn"], 4),
        "max_val": sql_round(g["mx"], 4),
        "n": g["n"].astype(np.int64),
    }).sort_values("dim").reset_index(drop=True)


def _ntile_of(rank: np.ndarray, n: int, tiles: int) -> np.ndarray:
    """SQL NTILE over 0-based global ranks: the first (n mod t) tiles get
    ceil(n/t) rows, the rest floor(n/t)."""
    q, rem = divmod(n, tiles)
    if q == 0:  # fewer rows than tiles: each row is its own tile
        return rank + 1
    boundary = rem * (q + 1)
    return np.where(rank < boundary,
                    rank // (q + 1),
                    rem + (rank - boundary) // q) + 1


def customer_value_ntiles(sf_dir: str, tiles: int = 4,
                          num_buckets: int = 16) -> rd.Dataset:
    """Global NTILE(t) of customers by lifetime spend — the global-window
    operator family (rank / row_number / ntile), built on
    common.global_row_number: a distributed sort whose block-local positions
    become global via a metadata-only count exchange (one int per block to
    the driver).  Spend is summed in integer CENTS so the total order is
    exact on both the engine and the oracle side (float sum order would
    otherwise make near-tie ranks nondeterministic)."""
    orders = load(sf_dir, "orders", ["o_custkey", "o_totalprice"])

    def prep(b: pd.DataFrame) -> pd.DataFrame:
        return b.assign(
            cents=np.round(b["o_totalprice"].to_numpy() * 100.0).astype(np.int64))

    spend = partial_groupby(
        orders, ["o_custkey"], {"spend_cents": ("cents", "sum")},
        prep=prep, many_groups=True, num_buckets=num_buckets)
    ranked, n = global_row_number(
        spend, ["spend_cents", "o_custkey"], descending=[True, False])

    def stamp_tile(b: pd.DataFrame) -> pd.DataFrame:
        r = b["rank"].to_numpy()
        return pd.DataFrame({
            "o_custkey": b["o_custkey"].astype(np.int64),
            "spend_cents": b["spend_cents"].astype(np.int64),
            "rank": r.astype(np.int64),
            "tile": _ntile_of(r, n, tiles).astype(np.int64),
        })

    return ranked.map_batches(stamp_tile, batch_format="pandas")


def customer_order_profile(sf_dir: str, num_buckets: int = 16) -> rd.Dataset:
    """LEFT OUTER join that PRESERVES unmatched left rows: every customer
    with their order count and lifetime spend, 0-filled for customers who
    never ordered.  Orders pre-aggregate to one partial row per custkey
    BEFORE the join (the shuffle moves aggregates, not order rows); the
    left join itself is the bucketed hash join with ``how="left"`` — both
    sides are fact-sized at scale, so neither broadcasts."""
    cust = load(sf_dir, "customer", ["c_custkey"])
    orders = load(sf_dir, "orders", ["o_custkey", "o_totalprice"]).map_batches(
        lambda b: b.rename(columns={"o_custkey": "c_custkey"}),
        batch_format="pandas")
    agg = partial_groupby(
        orders, ["c_custkey"],
        {"n_orders": ("o_totalprice", "count"),
         "total_spend": ("o_totalprice", "sum")},
        many_groups=True, num_buckets=num_buckets)

    def fill(j: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "c_custkey": j["c_custkey"].astype(np.int64),
            "n_orders": j["n_orders"].fillna(0).astype(np.int64),
            "total_spend": sql_round(j["total_spend"].fillna(0.0).astype(np.float64), 2),
        })

    return hash_join(
        cust, agg, on="c_custkey",
        lcols=["c_custkey"],
        rcols=["c_custkey", "n_orders", "total_spend"],
        num_buckets=num_buckets, how="left", post=fill)


_US_PER_DAY = 86_400_000_000


def daily_activity_fulljoin(sf_dir: str, num_buckets: int = 16) -> rd.Dataset:
    """FULL OUTER join across two different fact tables: daily order counts
    vs daily event counts, keeping days present on EITHER side (0-filled).
    Each side collapses to one partial row per day inside map_batches, so
    the outer join's co-shuffle moves day-count partials only.  Days are
    epoch days (``epoch_us // 86_400e6``, FLOOR division — pre-1970
    timestamps land on negative days; the oracle mirrors this with
    ``floor()``, since DuckDB's integer ``//`` truncates) on
    both the engine and the DuckDB oracle."""
    def day_of(col: str):
        def prep(b: pd.DataFrame) -> pd.DataFrame:
            us = b[col].to_numpy().astype("datetime64[us]").astype(np.int64)
            return pd.DataFrame({"day": us // _US_PER_DAY})
        return prep

    o_daily = partial_groupby(
        load(sf_dir, "orders", ["o_orderdate"]), ["day"],
        {"n_orders": ("day", "count")}, prep=day_of("o_orderdate"),
        many_groups=True, num_buckets=num_buckets)
    e_daily = partial_groupby(
        load(sf_dir, "events", ["ts"]), ["day"],
        {"n_events": ("day", "count")}, prep=day_of("ts"),
        many_groups=True, num_buckets=num_buckets)

    def fill(j: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "day": j["day"].astype(np.int64),
            "n_orders": j["n_orders"].fillna(0).astype(np.int64),
            "n_events": j["n_events"].fillna(0).astype(np.int64),
        })

    return hash_join(
        o_daily, e_daily, on="day",
        lcols=["day", "n_orders"], rcols=["day", "n_events"],
        num_buckets=num_buckets, how="outer", post=fill)


def lineitem_cube(sf_dir: str) -> pd.DataFrame:
    """GROUP BY CUBE(returnflag, linestatus): like :func:`lineitem_rollup`,
    the finest grain is the ONLY distributed aggregation; all three coarser
    grains (each dimension alone + grand total) re-reduce its handful of
    partial rows driver-side — a cube never re-scans the data."""
    ds = load(sf_dir, "lineitem",
              ["l_returnflag", "l_linestatus", "l_extendedprice"])
    fine = partial_groupby(
        ds, ["l_returnflag", "l_linestatus"],
        {"revenue": ("l_extendedprice", "sum"),
         "n_items": ("l_extendedprice", "count")},
    ).to_pandas()
    by_flag = (fine.groupby("l_returnflag", as_index=False)
               [["revenue", "n_items"]].sum().assign(l_linestatus="ALL"))
    by_status = (fine.groupby("l_linestatus", as_index=False)
                 [["revenue", "n_items"]].sum().assign(l_returnflag="ALL"))
    tot = pd.DataFrame({"l_returnflag": ["ALL"], "l_linestatus": ["ALL"],
                        "revenue": [fine["revenue"].sum()],
                        "n_items": [fine["n_items"].sum()]})
    out = pd.concat([fine, by_flag, by_status, tot], ignore_index=True)
    out["revenue"] = sql_round(out["revenue"], 2)
    out["n_items"] = out["n_items"].astype(np.int64)
    return (out[["l_returnflag", "l_linestatus", "revenue", "n_items"]]
            .sort_values(["l_returnflag", "l_linestatus"]).reset_index(drop=True))


def monthly_revenue(sf_dir: str) -> pd.DataFrame:
    """Date-function battery: revenue and order counts by calendar
    (year, month) extracted from the order timestamp — the date-extraction
    prep fuses into the partial-aggregation combiner."""
    ds = load(sf_dir, "orders", ["o_orderdate", "o_totalprice"])

    def prep(b: pd.DataFrame) -> pd.DataFrame:
        dt = pd.DatetimeIndex(b["o_orderdate"])
        return pd.DataFrame({
            "year": dt.year.to_numpy().astype(np.int64),
            "month": dt.month.to_numpy().astype(np.int64),
            "o_totalprice": b["o_totalprice"].to_numpy(),
        })

    out = partial_groupby(
        ds, ["year", "month"],
        {"revenue": ("o_totalprice", "sum"),
         "n_orders": ("o_totalprice", "count")},
        prep=prep,
    ).to_pandas()
    out["revenue"] = sql_round(out["revenue"], 2)
    out["n_orders"] = out["n_orders"].astype(np.int64)
    return (out[["year", "month", "revenue", "n_orders"]]
            .sort_values(["year", "month"]).reset_index(drop=True))


def segment_order_trend(sf_dir: str) -> pd.DataFrame:
    """Per-market-segment OLS regression of order value on order DATE —
    the "is spend trending up" analytics shape (SQL's regr_slope /
    regr_intercept / regr_r2 family) computed, like price_quantity_corr,
    from ONE pass of mergeable moment partials: the broadcast customer
    join tags each order with its segment inside the combiner, and the
    shuffle moves six numbers per (segment, batch).

    Parity contract: x is CENTERED on a fixed constant epoch-day (9500 ~
    1996-01-06, same constant in the oracle) so the normal-equation
    cancellations are well-conditioned, and the oracle computes THE SAME
    closed-form slope/intercept/r2 from its own sum() aggregates — only
    summation order differs, absorbed by the rounding grid."""
    X0 = 9500  # fixed centering constant (epoch days)
    orders = load(sf_dir, "orders", ["o_custkey", "o_totalprice", "o_orderdate"])
    cust = load_arrow(sf_dir, "customer", ["c_custkey", "c_mktsegment"])
    cust = cust.rename_columns(["o_custkey", "c_mktsegment"])
    joined = broadcast_join(orders, cust, on="o_custkey")

    def prep(b: pd.DataFrame) -> pd.DataFrame:
        x = (b["o_orderdate"].to_numpy().astype("datetime64[D]")
             .astype(np.float64)) - X0
        y = b["o_totalprice"].to_numpy(np.float64)
        return b.assign(x=x, y=y, xx=x * x, yy=y * y, xy=x * y)

    out = partial_groupby(
        joined, ["c_mktsegment"],
        {"n": ("x", "count"), "sx": ("x", "sum"), "sy": ("y", "sum"),
         "sxx": ("xx", "sum"), "syy": ("yy", "sum"), "sxy": ("xy", "sum")},
        prep=prep,
    ).to_pandas()
    n = out["n"].astype(np.float64)
    dxy = n * out["sxy"] - out["sx"] * out["sy"]
    dxx = n * out["sxx"] - out["sx"] * out["sx"]
    dyy = n * out["syy"] - out["sy"] * out["sy"]
    slope = dxy / dxx
    return pd.DataFrame({
        "c_mktsegment": out["c_mktsegment"],
        "n": out["n"].astype(np.int64),
        "slope": sql_round(slope, 6),
        "intercept": sql_round((out["sy"] - slope * out["sx"]) / n, 4),
        "r2": sql_round(dxy * dxy / (dxx * dyy), 6),
    }).sort_values("c_mktsegment").reset_index(drop=True)


_PROFILE_COLS = ("doc_id", "text", "lang", "source", "n_chars")


def docs_profile(sf_dir: str) -> pd.DataFrame:
    """Table PROFILING over documents — the schema-quality report every
    ingest runs before training (row/null/distinct counts + min/max per
    column).  Two distributed pieces:

    * counts + typed min/max ride ONE map_batches pass emitting a single
      WIDE partial row per batch (min/max reduce on the ORIGINAL dtype —
      lexicographic string reduction would mis-order integers — and
      stringify only at the very end, with str(int) matching DuckDB's
      VARCHAR cast and UTF-8 byte order matching Python's codepoint
      order for the string columns);
    * exact per-column distinct counts hash-shuffle stringified
      (column, value) pairs — str() is injective on every column here,
      so distinct-of-repr == distinct-of-value — through one many_groups
      dedup, then a tiny per-column count.

    Integer columns that carry nulls arrive in pandas blocks as float64
    (Arrow's null coercion), which would stringify the same value as
    '7.0' in null-bearing blocks and '7' elsewhere — breaking both
    injectivity and the VARCHAR-cast contract; the declared Arrow schema
    decides which columns re-cast to int64 before stringification.

    At 100 TB the distinct shuffle is the only wide op and moves each
    column's distinct VALUES once (the distinct_users_per_type budget);
    everything else is additive one-row partials."""
    import pyarrow as pa

    ds = load(sf_dir, "documents", list(_PROFILE_COLS))
    sch = ds.schema()
    int_cols = frozenset(
        n for n, t in zip(sch.names, sch.types)
        if isinstance(t, pa.DataType) and pa.types.is_integer(t))

    def wide(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):  # typed empty: the reduce ignores it entirely
            cols: dict[str, pd.Series] = {"k": pd.Series([], dtype=np.int64)}
            for c in _PROFILE_COLS:
                cols[f"n__{c}"] = pd.Series([], dtype=np.int64)
                cols[f"null__{c}"] = pd.Series([], dtype=np.int64)
                cols[f"min__{c}"] = pd.Series([], dtype=df[c].dtype)
                cols[f"max__{c}"] = pd.Series([], dtype=df[c].dtype)
            return pd.DataFrame(cols)
        row: dict[str, object] = {"k": 0}
        for c in _PROFILE_COLS:
            s = df[c]
            row[f"n__{c}"] = np.int64(len(s))
            row[f"null__{c}"] = np.int64(s.isna().sum())
            # None partials from an all-null batch column reduce with
            # pandas skipna min/max — exactly SQL's min()/max() semantics
            nn = s.dropna()
            row[f"min__{c}"] = nn.min() if len(nn) else None
            row[f"max__{c}"] = nn.max() if len(nn) else None
        return pd.DataFrame([row])

    # the partials are ONE ROW PER BLOCK (metadata-sized, like
    # global_row_number's per-block counts), so the final fold runs
    # driver-side with explicit skipna — an all-null block column emits
    # None, and pandas' object-dtype groupby min raises on a None/str mix
    wp = ds.map_batches(wide, batch_format="pandas").to_pandas()
    # all-empty Dataset.to_pandas() drops the schema (0-column frame)
    if "k" not in wp.columns:
        wp = wide(pd.DataFrame({c: pd.Series([], dtype=object)
                                for c in _PROFILE_COLS}))
    w: dict[str, object] = {}
    for c in _PROFILE_COLS:
        w[f"n__{c}"] = int(wp[f"n__{c}"].sum()) if len(wp) else 0
        w[f"null__{c}"] = int(wp[f"null__{c}"].sum()) if len(wp) else 0
        mn = wp[f"min__{c}"].dropna()
        mx = wp[f"max__{c}"].dropna()
        w[f"min__{c}"] = mn.min() if len(mn) else None
        w[f"max__{c}"] = mx.max() if len(mx) else None

    def val_pairs(df: pd.DataFrame) -> pd.DataFrame:
        frames = []
        for c in _PROFILE_COLS:
            nn = df[c].dropna()
            if c in int_cols:  # undo Arrow's int-with-null float coercion
                nn = nn.astype(np.int64)
            v = nn.astype(str).drop_duplicates()
            frames.append(pd.DataFrame({
                "col": np.full(len(v), c, dtype=object),
                "val": v.to_numpy()}))
        out = pd.concat(frames, ignore_index=True)
        return out.astype({"col": "string", "val": "string"})

    dv = partial_groupby(ds.map_batches(val_pairs, batch_format="pandas"),
                         ["col", "val"], {"n": ("n", "count")},
                         prep=lambda df: df.assign(n=1),
                         many_groups=True)
    nd = partial_groupby(dv, ["col"], {"n_distinct": ("n", "count")},
                         many_groups=True).to_pandas()
    ndm = dict(zip(nd["col"], nd["n_distinct"]))

    def fmt(c: str, v: object) -> str:
        if v is not None and c in int_cols:
            return str(int(v))  # a float-coerced block's min/max -> '7', not '7.0'
        return str(v)

    rows = []
    for c in _PROFILE_COLS:
        rows.append((c, int(w[f"n__{c}"]), int(w[f"null__{c}"]),
                     int(ndm.get(c, 0)), fmt(c, w[f"min__{c}"]),
                     fmt(c, w[f"max__{c}"])))
    out = pd.DataFrame(rows, columns=["col", "n", "n_null", "n_distinct",
                                      "vmin", "vmax"])
    for c in ("n", "n_null", "n_distinct"):
        out[c] = out[c].astype(np.int64)
    return out


def zorder_events(sf_dir: str, bits: int = 16) -> rd.Dataset:
    """Z-ORDER (Morton) layout index over (user_id, epoch_hour) — the
    multi-dimensional data-layout operator: writing a 100-TB table sorted
    by this index co-locates rows close in BOTH keys, so (user, time)
    range scans prune row groups on either dimension (the Delta/Iceberg
    OPTIMIZE ZORDER primitive, computed as a plain column).

    Engine: one embarrassingly-parallel map_batches; the bit interleave
    is vectorized numpy shifts (no per-row Python).  The oracle replays
    the identical interleave as an unrolled 2*bits-term integer sum, so
    the operator is fully SQL-checkable.  Both keys quantize mod 2^bits —
    the standard wraparound trade for unbounded domains, documented here
    rather than hidden (locality holds within each 2^bits tile)."""
    ds = load(sf_dir, "events", ["event_id", "user_id", "ts"])
    mask = (1 << bits) - 1

    def z(df: pd.DataFrame) -> pd.DataFrame:
        u = (df["user_id"].to_numpy(np.int64) & mask).astype(np.int64)
        h = ((df["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
              // 3_600_000_000) & mask).astype(np.int64)
        zv = np.zeros(len(df), dtype=np.int64)
        for i in range(bits):
            zv |= ((u >> i) & 1) << (2 * i)
            zv |= ((h >> i) & 1) << (2 * i + 1)
        return pd.DataFrame({"event_id": df["event_id"].to_numpy(np.int64),
                             "zorder": zv})

    return ds.map_batches(z, batch_format="pandas")


def zorder_events_sql(bits: int = 16) -> str:
    """Unrolled Morton-interleave oracle: one integer term per bit."""
    terms = []
    for i in range(bits):
        terms.append(f"(((user_id & {(1 << bits) - 1}) >> {i}) & 1) * {1 << (2 * i)}")
        terms.append(f"(((epoch_us(ts) // 3600000000) & {(1 << bits) - 1}) >> {i} & 1) * {1 << (2 * i + 1)}")
    expr = "\n                   + ".join(terms)
    return f"""
        SELECT event_id,
               CAST({expr} AS BIGINT) AS zorder
        FROM events
    """


def bloom_semi_join_revenue(sf_dir: str, segment: str = "BUILDING",
                            bits_per_key: int = 10,
                            num_buckets: int = 16) -> pd.DataFrame:
    """BLOOM-FILTER JOIN PUSHDOWN (the 'runtime filter' / sideways
    information passing of distributed SQL engines): per-customer order
    revenue for one market segment, where the big (orders) side is pruned
    BEFORE the join shuffle by a bloom filter built over the small side's
    keys — rows that definitely cannot match never enter the exchange.

    Engine shape: the segment's customers stream once, each batch emitting
    ONE fixed-size bloom bit-array partial (m bits regardless of batch
    size); the driver OR-folds the handful of partials — metadata-sized at
    dimension scale, and past that the fold becomes a tree reduce of
    per-shard blooms (the SeenShard precedent, state/seen.py).  The folded
    filter broadcasts via ``ray.put``; one map_batches over orders probes
    it vectorized (double-hashed, ~1% FP at 10 bits/key) and pre-aggregates
    the survivors per custkey, so the bucketed hash join that follows
    moves only (custkey, n, sum) partials from a ~segment-selectivity
    fraction of the fact table.  Bloom FALSE POSITIVES are eliminated by
    that exact inner join — the filter only prunes, it never decides — so
    the result is EXACT and the DuckDB oracle is the plain semi-join SQL.
    Pruning-vs-exactness under a deliberately undersized bloom is
    pytest-pinned."""
    import os

    import pyarrow.parquet as pq

    from ..functions.sketches import BloomFilter

    cap = pq.ParquetFile(
        os.path.join(sf_dir, "customer.parquet")).metadata.num_rows

    # materialized once: the filtered side is consumed twice (bloom build
    # + join) and a lazy Dataset would re-run the read+filter per consumer
    cust = load(sf_dir, "customer",
                ["c_custkey", "c_name", "c_mktsegment"]).map_batches(
        lambda b: b.loc[b["c_mktsegment"] == segment,
                        ["c_custkey", "c_name"]],
        batch_format="pandas").materialize()

    def bloom_partial(df: pd.DataFrame) -> pd.DataFrame:
        bf = BloomFilter(cap, bits_per_key=bits_per_key)
        if len(df):
            bf.add(df["c_custkey"].to_numpy(np.int64).astype(np.uint64))
        return pd.DataFrame({"bits": [bf.bits.tobytes()]})

    partials = cust.map_batches(bloom_partial,
                                batch_format="pandas").to_pandas()
    bf = BloomFilter(cap, bits_per_key=bits_per_key)
    for b in partials["bits"]:
        bf.bits |= np.frombuffer(b, dtype=np.uint64)
    ref = ray.put(bf.serialize())

    orders = load(sf_dir, "orders", ["o_custkey", "o_totalprice"])

    def probe_and_partial(df: pd.DataFrame) -> pd.DataFrame:
        from ..functions.sketches import BloomFilter as BF

        bf = BF.deserialize(_cached_get(ref))
        keep = bf.maybe_contains(
            df["o_custkey"].to_numpy(np.int64).astype(np.uint64))
        g = (df[keep].groupby("o_custkey", sort=False)["o_totalprice"]
             .agg(["size", "sum"]).reset_index())
        return pd.DataFrame({
            "c_custkey": g["o_custkey"].to_numpy(np.int64),
            "n_orders": g["size"].to_numpy(np.int64),
            "spent": g["sum"].to_numpy(np.float64)})

    opart = orders.map_batches(probe_and_partial, batch_format="pandas")

    def fold(j: pd.DataFrame) -> pd.DataFrame:
        if not len(j):
            return pd.DataFrame({
                "c_custkey": pd.Series([], dtype=np.int64),
                "c_name": pd.Series([], dtype=object),
                "n_orders": pd.Series([], dtype=np.int64),
                "spent": pd.Series([], dtype=np.float64)})
        # buckets partition custkeys, so this per-bucket fold is final
        return (j.groupby(["c_custkey", "c_name"], sort=False)
                .agg(n_orders=("n_orders", "sum"), spent=("spent", "sum"))
                .reset_index())

    joined = hash_join(
        cust, opart, on="c_custkey",
        lcols=["c_custkey", "c_name"],
        rcols=["c_custkey", "n_orders", "spent"],
        num_buckets=num_buckets, post=fold,
    ).to_pandas()
    return pd.DataFrame({
        "c_custkey": joined["c_custkey"].to_numpy(np.int64),
        "c_name": joined["c_name"].to_numpy(object),
        "n_orders": joined["n_orders"].to_numpy(np.int64),
        "total_spent": sql_round(joined["spent"], 2),
    }).sort_values("c_custkey").reset_index(drop=True)


# Association-rule contract shared by the engine defaults AND the registered
# SQL oracle (one source of truth): min pair support and top-k cut
BASKET_MIN_COUNT = 5
BASKET_K = 15


def basket_rules_brands(sf_dir: str, min_count: int = BASKET_MIN_COUNT,
                        k: int = BASKET_K,
                        num_buckets: int = 16) -> pd.DataFrame:
    """TOP-K ASSOCIATION RULES (Agrawal, Imielinski & Swami 1993) over
    per-order brand BASKETS: for brands a < b co-occurring in an order,
    support count c_ab, both directed confidences c_ab/c_a and c_ab/c_b,
    and lift = n*c_ab/(c_a*c_b) with n = basket (order) count; pairs
    below ``min_count`` baskets are dropped, ranked (lift desc, a, b).

    This is the market-basket shape ON TOP OF a dimension join: baskets
    are DISTINCT brands per order, so the pipeline is lineitem x part
    (brand dim broadcast once — at a scale where part outgrows broadcast
    the bucketed hash join swaps in, brand_revenue's path) -> ONE
    order-keyed exchange (complete baskets per bucket) -> vectorized
    per-bucket pair explode bounded by #brands^2 per order -> the tiny
    (a, b) reduce.  Basket count, per-brand counts and pair counts all
    ride the SAME sentinel-row reduce (the PMI trick), so one exchange
    feeds every term of the rule statistics.

    Parity: all counts are exact integers; confidences and lift are
    single float64 divisions with factors cast BEFORE multiplying (the
    caption_pixels_corr overflow rule), rounded 6 dp BEFORE ranking with
    the (lift desc, a asc, b asc) total tiebreak."""
    li = load(sf_dir, "lineitem", ["l_orderkey", "l_partkey"])
    part = load_arrow(sf_dir, "part", ["p_partkey", "p_brand"]
                      ).rename_columns(["l_partkey", "p_brand"])
    joined = broadcast_join(li, part, on="l_partkey")

    def pair_rows(g: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({"a": pd.Series([], dtype=object),
                              "b": pd.Series([], dtype=object),
                              "n": pd.Series([], dtype=np.int64)})
        if not len(g):
            return empty
        # orders are COMPLETE in this bucket -> the distinct is global
        b = g[["l_orderkey", "p_brand"]].drop_duplicates()
        m = b.merge(b, on="l_orderkey")
        m = m[m["p_brand_x"] < m["p_brand_y"]]
        pairs = (m.groupby(["p_brand_x", "p_brand_y"], sort=False)
                 .size().rename("n").reset_index())
        pairs.columns = ["a", "b", "n"]
        un = (b.groupby("p_brand", sort=False).size()
              .rename("n").reset_index())
        un.columns = ["a", "n"]
        un["b"] = ""  # unary rows: b sentinel (brands are never empty)
        # basket-count sentinel: n rides the SAME reduce (no second scan)
        nrow = pd.DataFrame({"a": [""], "b": [""],
                             "n": [b["l_orderkey"].nunique()]})
        return pd.concat([pairs, un[["a", "b", "n"]], nrow],
                         ignore_index=True)

    parts = keyed_map_groups(joined, "l_orderkey", pair_rows, num_buckets)
    agg = partial_groupby(parts, ["a", "b"], {"n": ("n", "sum")},
                          many_groups=True, num_buckets=num_buckets
                          ).to_pandas()
    agg["n"] = agg["n"].astype(np.int64)
    n_orders = int(agg.loc[(agg["a"] == "") & (agg["b"] == ""), "n"].sum())
    cnt = agg[(agg["b"] == "") & (agg["a"] != "")].set_index("a")["n"]
    p = agg[(agg["b"] != "") & (agg["n"] >= min_count)].copy()
    ca = cnt.reindex(p["a"]).to_numpy(np.int64)
    cb = cnt.reindex(p["b"]).to_numpy(np.int64)
    cab = p["n"].to_numpy(np.int64)
    lift = sql_round((float(n_orders) * cab.astype(np.float64))
                     / (ca.astype(np.float64) * cb.astype(np.float64)), 6)
    out = pd.DataFrame({
        "brand_a": p["a"].to_numpy(), "brand_b": p["b"].to_numpy(),
        "n_orders_ab": cab,
        "conf_a_b": sql_round(cab.astype(np.float64)
                              / ca.astype(np.float64), 6),
        "conf_b_a": sql_round(cab.astype(np.float64)
                              / cb.astype(np.float64), 6),
        "lift": lift})
    out = (out.sort_values(["lift", "brand_a", "brand_b"],
                           ascending=[False, True, True])
           .head(k).reset_index(drop=True))
    out["rank"] = np.arange(1, len(out) + 1, dtype=np.int64)
    return out


def basket_rules_sql(min_count: int = BASKET_MIN_COUNT,
                     k: int = BASKET_K) -> str:
    """The DuckDB oracle: distinct (order, brand) baskets via the join,
    unary counts, a same-order self-join for pair counts, the identical
    rounded confidence/lift expressions, round-then-rank."""
    return f"""
        WITH ob AS (
            SELECT DISTINCT l_orderkey AS o, p_brand AS br
            FROM lineitem JOIN part ON p_partkey = l_partkey
        ),
        nn AS (SELECT count(DISTINCT o)::BIGINT AS n FROM ob),
        cb AS (SELECT br, count(*)::BIGINT AS c FROM ob GROUP BY br),
        pc AS (
            SELECT x.br AS a, y.br AS b, count(*)::BIGINT AS cab
            FROM ob x JOIN ob y ON y.o = x.o AND y.br > x.br
            GROUP BY x.br, y.br
        ),
        s AS (
            SELECT pc.a AS brand_a, pc.b AS brand_b, pc.cab AS n_orders_ab,
                   round(pc.cab::DOUBLE / ca.c::DOUBLE, 6) AS conf_a_b,
                   round(pc.cab::DOUBLE / cb2.c::DOUBLE, 6) AS conf_b_a,
                   round((nn.n::DOUBLE * pc.cab::DOUBLE)
                         / (ca.c::DOUBLE * cb2.c::DOUBLE), 6) AS lift
            FROM pc
            JOIN cb ca ON ca.br = pc.a
            JOIN cb cb2 ON cb2.br = pc.b, nn
            WHERE pc.cab >= {min_count}
        )
        SELECT brand_a, brand_b, n_orders_ab, conf_a_b, conf_b_a, lift,
               CAST(row_number() OVER (ORDER BY lift DESC, brand_a, brand_b)
                    AS BIGINT) AS rank
        FROM s QUALIFY rank <= {k}
    """


def hilbert_events(sf_dir: str, bits: int = 16) -> rd.Dataset:
    """HILBERT-CURVE layout index over (user_id, epoch_hour) — the
    locality-preserving sibling of :func:`zorder_events`: unlike Morton
    order, consecutive Hilbert positions are always ADJACENT cells, so
    range scans over the sorted table touch tighter (user, time)
    neighborhoods (the layout-optimization trade documented in every
    lakehouse OPTIMIZE discussion).  Standard public xy2d bit algorithm
    (quadrant digit + gray-code rotation per level; the flip is the
    full-width complement (2^bits)-1 - v, which keeps intermediate
    coordinates in range).

    Engine: one embarrassingly-parallel map_batches, each level a
    vectorized numpy where/xor over the batch (no per-row Python); the
    oracle unrolls the identical per-level update as a MATERIALIZED CTE
    chain, making the state-mutating loop fully SQL-checkable.  Both
    keys quantize mod 2^bits (the zorder wraparound trade)."""
    ds = load(sf_dir, "events", ["event_id", "user_id", "ts"])
    n = 1 << bits
    mask = n - 1

    def h(df: pd.DataFrame) -> pd.DataFrame:
        x = (df["user_id"].to_numpy(np.int64) & mask).astype(np.int64)
        y = ((df["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
              // 3_600_000_000) & mask).astype(np.int64)
        d = np.zeros(len(df), dtype=np.int64)
        s = n >> 1
        while s > 0:
            rx = ((x & s) > 0).astype(np.int64)
            ry = ((y & s) > 0).astype(np.int64)
            d += s * s * ((3 * rx) ^ ry)
            flip = ry == 0
            fx = np.where(rx == 1, n - 1 - x, x)
            fy = np.where(rx == 1, n - 1 - y, y)
            x, y = (np.where(flip, fy, x).astype(np.int64),
                    np.where(flip, fx, y).astype(np.int64))
            s >>= 1
        return pd.DataFrame({"event_id": df["event_id"].to_numpy(np.int64),
                             "hilbert": d})

    return ds.map_batches(h, batch_format="pandas")


def hilbert_events_sql(bits: int = 16) -> str:
    """Unrolled Hilbert oracle: one MATERIALIZED CTE per level, each
    computing the identical (x, y, d) update."""
    n = 1 << bits
    parts = [f"""
        WITH l0 AS MATERIALIZED (
            SELECT event_id,
                   (user_id & {n - 1}) AS x,
                   ((epoch_us(ts) // 3600000000) & {n - 1}) AS y,
                   0::BIGINT AS d
            FROM events
        )"""]
    s = n >> 1
    t = 0
    while s > 0:
        parts.append(f""",
        l{t + 1} AS MATERIALIZED (
            SELECT event_id,
                   CASE WHEN ry = 0 THEN
                        CASE WHEN rx = 1 THEN {n - 1} - y ELSE y END
                   ELSE x END AS x,
                   CASE WHEN ry = 0 THEN
                        CASE WHEN rx = 1 THEN {n - 1} - x ELSE x END
                   ELSE y END AS y,
                   d + {s * s} * xor(3 * rx, ry) AS d
            FROM (SELECT event_id, x, y, d,
                         CASE WHEN (x & {s}) > 0 THEN 1 ELSE 0 END AS rx,
                         CASE WHEN (y & {s}) > 0 THEN 1 ELSE 0 END AS ry
                  FROM l{t})
        )""")
        s >>= 1
        t += 1
    parts.append(f"""
        SELECT event_id, CAST(d AS BIGINT) AS hilbert FROM l{t}""")
    return "".join(parts)


# ---------------------------------------------------------------------------
# Skyline (Pareto frontier) — block-local skyline + tiny merge
# ---------------------------------------------------------------------------

def _sky2d(df: pd.DataFrame) -> pd.DataFrame:
    """Vectorized 2-D skyline sweep: keep orders not DOMINATED under
    (maximize o_totalprice, minimize o_orderdate).  d dominates o iff
    d.price >= o.price AND d.date <= o.date with at least one strict;
    ties on BOTH axes survive together (neither strictly dominates).

    One groupby(price) + two running mins over descending price:
    a row survives iff its date equals the running min date over all
    prices >= its own (condition B: nothing weakly-better-priced is
    strictly earlier) AND is strictly earlier than the running min over
    prices > its own (condition A: nothing strictly better-priced is at
    least as early)."""
    if not len(df):
        return df
    g = (df.groupby("o_totalprice")["o_orderdate"].min()
         .sort_index(ascending=False))
    m_incl = g.cummin()          # min date over prices >= this price
    m_excl = m_incl.shift(1)     # min date over prices  > this price
    mi = df["o_totalprice"].map(m_incl)
    me = df["o_totalprice"].map(m_excl)
    keep = (df["o_orderdate"] == mi) & (me.isna() | (df["o_orderdate"] < me))
    return df[keep]


def skyline_orders(sf_dir: str) -> pd.DataFrame:
    """SKYLINE QUERY (Borzsony/Kossmann/Stocker 2001): the Pareto frontier
    of orders under (max o_totalprice, min o_orderdate) — "the best price
    achievable by any given date".  The canonical two-phase distributed
    shape: a block-LOCAL skyline inside map_batches (each block shrinks to
    ~O(log n) survivors because local dominance is a superset-filter of
    global dominance), then one merge sweep over the union of local
    skylines.  The merge input is bounded by sum-of-local-skylines — for
    random data ~blocks x log(block) rows — so the final collect is a
    top-k-style small result, never the input."""
    ds = load(sf_dir, "orders", ["o_orderkey", "o_totalprice", "o_orderdate"])
    local = ds.map_batches(_sky2d, batch_format="pandas")
    cand = local.to_pandas()     # union of local skylines: provably small
    return (_sky2d(cand).sort_values("o_orderkey").reset_index(drop=True)
            [["o_orderkey", "o_totalprice", "o_orderdate"]])


def skyline_orders_sql() -> str:
    """Oracle via the same price-group running-min characterization (an
    NOT EXISTS anti-join is quadratic; this is the O(n log n) form the
    engine's sweep implements — pytest cross-checks it against brute-force
    dominance on a small table)."""
    return """
        WITH g AS (
            SELECT o_totalprice AS price, min(o_orderdate) AS gmin
            FROM orders GROUP BY 1
        ),
        r AS (
            SELECT price,
                   min(gmin) OVER (ORDER BY price DESC
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                       AS m_incl,
                   min(gmin) OVER (ORDER BY price DESC
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                       AS m_excl
            FROM g
        )
        SELECT o.o_orderkey, o.o_totalprice, o.o_orderdate
        FROM orders o JOIN r ON o.o_totalprice = r.price
        WHERE o.o_orderdate = r.m_incl
          AND (r.m_excl IS NULL OR o.o_orderdate < r.m_excl)
    """


# ---------------------------------------------------------------------------
# Zone-map pruning — data skipping with a lossless-prune certificate
# ---------------------------------------------------------------------------

# the shared prune-plan contract: block count and the range predicate
ZM_NBLOCKS = 64
ZM_TS_LO = "2024-01-10"    # ts >= lo AND ts < hi AND value >= val_lo
ZM_TS_HI = "2024-01-13"
ZM_VAL_LO = 100.0


def zonemap_prune_events(sf_dir: str, nblocks: int = ZM_NBLOCKS) -> pd.DataFrame:
    """ZONE MAPS (data skipping): per-block min/max statistics over the
    events table laid out in event_id order, plus the PRUNE DECISION for a
    conjunctive range predicate (ts window AND value floor) and the
    per-block exact match count as the lossless-prune certificate
    (pruned == 1 implies rows_matched == 0 in-row).  Because the event
    stream is time-clustered (ts rises with event_id), the ts zone maps
    skip ~90% of blocks for a 3-day window — the read-pruning story a
    100 TB scan lives on: at scale these rows are what a planner consults
    INSTEAD of opening parquet row groups.

    Engine shape: block stats are mergeable min/max/count partials
    (partial_groupby over block_id), one 64-row reduce; the prune flags
    fold on the driver over the tiny plan table."""
    import os

    import pyarrow.parquet as pq

    n = pq.ParquetFile(os.path.join(sf_dir, "events.parquet")).metadata.num_rows
    span = (n - 1) // nblocks + 1     # event_ids are contiguous 0..n-1
    lo, hi = pd.Timestamp(ZM_TS_LO), pd.Timestamp(ZM_TS_HI)

    ds = load(sf_dir, "events", ["event_id", "ts", "value"])

    def prep(b: pd.DataFrame) -> pd.DataFrame:
        m = ((b["ts"] >= lo) & (b["ts"] < hi)
             & (b["value"] >= ZM_VAL_LO)).to_numpy()
        return b.assign(block_id=b["event_id"].to_numpy(np.int64) // span,
                        match=m.astype(np.int64))

    plan = partial_groupby(
        ds, ["block_id"],
        {"n_rows": ("value", "count"),
         "ts_min": ("ts", "min"), "ts_max": ("ts", "max"),
         "v_min": ("value", "min"), "v_max": ("value", "max"),
         "rows_matched": ("match", "sum")},
        prep=prep, many_groups=True, num_buckets=8,
    ).to_pandas()

    pruned = ((plan["ts_max"] < lo) | (plan["ts_min"] >= hi)
              | (plan["v_max"] < ZM_VAL_LO))
    plan = plan.assign(pruned=pruned.to_numpy().astype(np.int64))
    return (plan.sort_values("block_id").reset_index(drop=True)
            [["block_id", "n_rows", "ts_min", "ts_max", "v_min", "v_max",
              "rows_matched", "pruned"]])


def zonemap_prune_events_sql(nblocks: int = ZM_NBLOCKS) -> str:
    return f"""
        WITH b AS (
            SELECT event_id // ((SELECT max(event_id) FROM events) // {nblocks} + 1)
                       AS block_id,
                   count(*)::BIGINT AS n_rows,
                   min(ts) AS ts_min, max(ts) AS ts_max,
                   min(value) AS v_min, max(value) AS v_max,
                   sum(CASE WHEN ts >= TIMESTAMP '{ZM_TS_LO}'
                             AND ts <  TIMESTAMP '{ZM_TS_HI}'
                             AND value >= {ZM_VAL_LO}
                            THEN 1 ELSE 0 END)::BIGINT AS rows_matched
            FROM events GROUP BY 1
        )
        SELECT CAST(block_id AS BIGINT) AS block_id, n_rows, ts_min, ts_max,
               v_min, v_max, rows_matched,
               CAST(CASE WHEN ts_max < TIMESTAMP '{ZM_TS_LO}'
                          OR ts_min >= TIMESTAMP '{ZM_TS_HI}'
                          OR v_max < {ZM_VAL_LO}
                         THEN 1 ELSE 0 END AS BIGINT) AS pruned
        FROM b
    """


# ---------------------------------------------------------------------------
# Segmented run-length stats — per-block RLE with boundary stitching
# ---------------------------------------------------------------------------

RLE_NBLOCKS = 64


def rle_events_blocks(sf_dir: str, nblocks: int = RLE_NBLOCKS,
                      num_parts: int = 16) -> pd.DataFrame:
    """RUN-LENGTH layout statistics of the event_type column in event_id
    (physical) order, segmented into fixed blocks: per block the run
    count, row count, and the block's FIRST/LAST values — the sufficient
    statistics for stitching blocks back into a global run count (the
    classic segmented-scan merge: global runs = sum of block runs minus
    the boundaries where last(block i) == first(block i+1), emitted
    in-row as merged_with_prev).  This is what a columnar writer consults
    to size RLE pages, computed without any global sort: blocks are
    routed by block_id hash (each block lands whole in one partition),
    runs are one vectorized shift-compare per partition.

    The driver folds only the 64-row plan table for the boundary flags."""
    import os

    import pyarrow.parquet as pq

    from .common import task_hash_exchange

    n = pq.ParquetFile(os.path.join(sf_dir, "events.parquet")).metadata.num_rows
    span = (n - 1) // nblocks + 1     # event_ids are contiguous 0..n-1

    ds = load(sf_dir, "events", ["event_id", "event_type"])

    def part_of(df: pd.DataFrame) -> np.ndarray:
        return (df["event_id"].to_numpy(np.int64) // span) % num_parts

    def block_stats(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            return pd.DataFrame({
                "block_id": pd.Series([], dtype=np.int64),
                "n_rows": pd.Series([], dtype=np.int64),
                "n_runs": pd.Series([], dtype=np.int64),
                "first_type": pd.Series([], dtype=object),
                "last_type": pd.Series([], dtype=object)})
        df = df.sort_values("event_id")
        blk = df["event_id"].to_numpy(np.int64) // span
        t = df["event_type"].to_numpy(object)
        new_run = np.ones(len(df), dtype=np.int64)
        same_blk = blk[1:] == blk[:-1]
        new_run[1:] = np.where(same_blk & (t[1:] == t[:-1]), 0, 1)
        g = pd.DataFrame({"block_id": blk, "new_run": new_run,
                          "event_type": t}).groupby("block_id", sort=True)
        return pd.DataFrame({
            "block_id": np.fromiter(g.groups.keys(), dtype=np.int64),
            "n_rows": g.size().to_numpy(np.int64),
            "n_runs": g["new_run"].sum().to_numpy(np.int64),
            "first_type": g["event_type"].first().to_numpy(object),
            "last_type": g["event_type"].last().to_numpy(object)})

    plan = (task_hash_exchange(ds, part_of, block_stats, num_parts,
                               key_cols=["event_id"])
            .to_pandas().sort_values("block_id").reset_index(drop=True))
    merged = np.zeros(len(plan), dtype=np.int64)
    if len(plan) > 1:
        adj = (plan["block_id"].to_numpy()[1:]
               == plan["block_id"].to_numpy()[:-1] + 1)
        merged[1:] = (adj & (plan["first_type"].to_numpy(object)[1:]
                             == plan["last_type"].to_numpy(object)[:-1])
                      ).astype(np.int64)
    return plan.assign(merged_with_prev=merged)[
        ["block_id", "n_rows", "n_runs", "first_type", "last_type",
         "merged_with_prev"]]


def rle_events_blocks_sql(nblocks: int = RLE_NBLOCKS) -> str:
    """Oracle: one lag() window over the full event_id order; a block's
    first row opens a run, any value change opens a run; merged_with_prev
    is the boundary row whose previous-block last value matches."""
    return f"""
        WITH s AS (
            SELECT event_id, event_type,
                   event_id // ((SELECT max(event_id) FROM events) // {nblocks} + 1)
                       AS blk,
                   lag(event_type) OVER (ORDER BY event_id) AS prev_t,
                   lag(event_id // ((SELECT max(event_id) FROM events) // {nblocks} + 1))
                       OVER (ORDER BY event_id) AS prev_b
            FROM events
        )
        SELECT CAST(blk AS BIGINT) AS block_id,
               count(*)::BIGINT AS n_rows,
               sum(CASE WHEN prev_b IS NULL OR prev_b <> blk
                         OR prev_t <> event_type THEN 1 ELSE 0 END)::BIGINT
                   AS n_runs,
               arg_min(event_type, event_id) AS first_type,
               arg_max(event_type, event_id) AS last_type,
               max(CASE WHEN prev_b = blk - 1 AND prev_t = event_type
                        THEN 1 ELSE 0 END)::BIGINT AS merged_with_prev
        FROM s GROUP BY blk
    """


# ---------------------------------------------------------------------------
# Chi-square independence test — contingency table from count partials
# ---------------------------------------------------------------------------

def chi2_lang_source(sf_dir: str) -> pd.DataFrame:
    """PEARSON CHI-SQUARE test of independence between document lang and
    source: the full contingency table reduces from per-batch count
    partials (one shuffle of (lang, source, n) triples), then the
    statistic folds on the driver over the ~100-cell table — including
    the ZERO cells the cross product implies, whose terms contribute
    their full expected counts.  Emits the statistic, degrees of freedom
    and Cramer's V effect size; both sides round to the shared grid
    because the 100-term float sum is order-sensitive in the last ulps."""
    counts = partial_groupby(
        load(sf_dir, "documents", ["lang", "source"]),
        ["lang", "source"], {"n": ("lang", "count")},
    ).to_pandas()
    pivot = (counts.pivot_table(index="lang", columns="source", values="n",
                                fill_value=0, aggfunc="sum")
             .sort_index(axis=0).sort_index(axis=1))
    obs = pivot.to_numpy(np.float64)
    nl = obs.sum(axis=1, keepdims=True)
    ns = obs.sum(axis=0, keepdims=True)
    n = obs.sum()
    exp = nl * ns / n
    terms = (obs - exp) ** 2 / exp
    chi2 = float(terms.ravel().sum())
    r, c = obs.shape
    dof = (r - 1) * (c - 1)
    # a single-lang or single-source corpus has dof 0: V is undefined,
    # pinned to 0.0 on both engines (the oracle's CASE mirrors this)
    cramers_v = (float(np.sqrt(chi2 / (n * min(r - 1, c - 1))))
                 if dof > 0 else 0.0)
    return pd.DataFrame({
        "n_docs": [np.int64(n)], "n_langs": [np.int64(r)],
        "n_sources": [np.int64(c)], "dof": [np.int64(dof)],
        "chi2": sql_round([chi2], 4),
        "cramers_v": sql_round([cramers_v], 6)})


def chi2_lang_source_sql() -> str:
    return """
        WITH c AS (
            SELECT lang, source, count(*)::BIGINT AS n
            FROM documents GROUP BY 1, 2
        ),
        l AS (SELECT lang, sum(n) AS nl FROM c GROUP BY 1),
        s AS (SELECT source, sum(n) AS ns FROM c GROUP BY 1),
        t AS (SELECT sum(n)::DOUBLE AS nt FROM c),
        cell AS (
            SELECT coalesce(c.n, 0)::DOUBLE AS obs,
                   CAST(l.nl AS DOUBLE) * s.ns / t.nt AS exp
            FROM l CROSS JOIN s CROSS JOIN t
            LEFT JOIN c ON c.lang = l.lang AND c.source = s.source
        )
        SELECT CAST((SELECT nt FROM t) AS BIGINT) AS n_docs,
               (SELECT count(*) FROM l)::BIGINT AS n_langs,
               (SELECT count(*) FROM s)::BIGINT AS n_sources,
               ((SELECT count(*) FROM l) - 1)::BIGINT
                   * ((SELECT count(*) FROM s) - 1)::BIGINT AS dof,
               round(sum((obs - exp) * (obs - exp) / exp), 4) AS chi2,
               CASE WHEN least((SELECT count(*) FROM l) - 1,
                           (SELECT count(*) FROM s) - 1) = 0 THEN 0.0
                    ELSE round(sqrt(sum((obs - exp) * (obs - exp) / exp)
                          / ((SELECT nt FROM t)
                             * least((SELECT count(*) FROM l) - 1,
                                     (SELECT count(*) FROM s) - 1))), 6)
               END AS cramers_v
        FROM cell
    """


ZL_VAL_LO = 150.0    # the layout-compare predicate: value >= 150 (~P95 tail)


def zonemap_layout_compare(sf_dir: str, nblocks: int = ZM_NBLOCKS,
                           num_buckets: int = 8) -> pd.DataFrame:
    """LAYOUT vs DATA SKIPPING: the same value-range predicate planned
    against zone maps of two physical layouts of events — the natural
    event_id order (value is uncorrelated with position: nothing prunes)
    and a value-CLUSTERED order (the predicate's selectivity becomes the
    scan fraction).  One summary row per layout: blocks pruned, rows
    matched, rows a zone-map-aware scan must touch.  This is the
    quantified version of the layout advice every warehouse doc gives —
    sort/cluster by your filter column or your zone maps are dead weight
    (zorder_events / hilbert_events build such layouts; this measures
    their payoff).

    Engine shape: the clustered layout rank comes from the distributed
    global_row_number primitive (sort + metadata-only offset exchange);
    both layouts' block stats are mergeable min/max/count partials; the
    driver folds two ~64-row plan tables."""
    import os

    import pyarrow.parquet as pq

    from .common import global_row_number

    n = pq.ParquetFile(os.path.join(sf_dir, "events.parquet")).metadata.num_rows
    span = (n - 1) // nblocks + 1

    def plan_of(ds_blocked, layout: str) -> pd.DataFrame:
        plan = partial_groupby(
            ds_blocked, ["blk"],
            {"n_rows": ("value", "count"), "v_max": ("value", "max"),
             "matched": ("m", "sum")},
            many_groups=True, num_buckets=num_buckets).to_pandas()
        pruned = plan["v_max"] < ZL_VAL_LO
        return pd.DataFrame({
            "layout": [layout],
            "n_blocks": [np.int64(len(plan))],
            "n_pruned": [np.int64(pruned.sum())],
            "rows_matched": [np.int64(plan["matched"].sum())],
            "scan_rows": [np.int64(plan.loc[~pruned, "n_rows"].sum())]})

    def nat_prep(b: pd.DataFrame) -> pd.DataFrame:
        return b.assign(blk=b["event_id"].to_numpy(np.int64) // span,
                        m=(b["value"] >= ZL_VAL_LO).to_numpy(np.int64))

    nat = load(sf_dir, "events", ["event_id", "value"]).map_batches(
        nat_prep, batch_format="pandas")

    ranked, _total = global_row_number(
        load(sf_dir, "events", ["event_id", "value"]),
        ["value", "event_id"])

    def srt_prep(b: pd.DataFrame) -> pd.DataFrame:
        return b.assign(blk=b["rank"].to_numpy(np.int64) // span,
                        m=(b["value"] >= ZL_VAL_LO).to_numpy(np.int64))

    srt = ranked.map_batches(srt_prep, batch_format="pandas")
    return (pd.concat([plan_of(nat, "natural"),
                       plan_of(srt, "value_sorted")], ignore_index=True)
            .sort_values("layout").reset_index(drop=True))


def zonemap_layout_compare_sql(nblocks: int = ZM_NBLOCKS) -> str:
    span = f"((SELECT max(event_id) FROM events) // {nblocks} + 1)"
    return f"""
        WITH rows_both AS (
            SELECT 'natural' AS layout, event_id // {span} AS blk, value
            FROM events
            UNION ALL
            SELECT 'value_sorted' AS layout,
                   (row_number() OVER (ORDER BY value, event_id) - 1)
                       // {span} AS blk,
                   value
            FROM events
        ),
        b AS (
            SELECT layout, blk, count(*)::BIGINT AS n_rows,
                   max(value) AS v_max,
                   sum(CASE WHEN value >= {ZL_VAL_LO} THEN 1 ELSE 0 END)
                       ::BIGINT AS matched
            FROM rows_both GROUP BY 1, 2
        )
        SELECT layout, count(*)::BIGINT AS n_blocks,
               sum(CASE WHEN v_max < {ZL_VAL_LO} THEN 1 ELSE 0 END)::BIGINT
                   AS n_pruned,
               sum(matched)::BIGINT AS rows_matched,
               sum(CASE WHEN v_max < {ZL_VAL_LO} THEN 0 ELSE n_rows END)
                   ::BIGINT AS scan_rows
        FROM b GROUP BY layout
    """


RFM_TILES = 5


def customer_rfm_segments(sf_dir: str, tiles: int = RFM_TILES,
                          num_buckets: int = 16) -> pd.DataFrame:
    """RFM SEGMENTATION (recency / frequency / monetary quintiles) —
    the canonical customer-value grid: R = days since last order
    (relative to the corpus's latest order date), F = order count, M =
    lifetime spend in cents; each metric NTILEs independently (tile 1 =
    best: most recent / most orders / highest spend) and the output is
    the populated (r, f, m) cell table with counts and per-cell spend —
    what a campaign planner reads off.  All three metrics are exact
    integers; the three rankings reuse the distributed
    global_row_number + _ntile_of machinery of customer_value_ntiles,
    so tile boundaries match SQL's ntile() exactly.

    Scale shape: one customer-keyed reduce for the metric triple, three
    metadata-only rank exchanges, one (r, f, m) count reduce."""
    orders = load(sf_dir, "orders",
                  ["o_custkey", "o_totalprice", "o_orderdate"])

    def prep(b: pd.DataFrame) -> pd.DataFrame:
        return b.assign(
            cents=np.round(b["o_totalprice"].to_numpy() * 100.0
                           ).astype(np.int64),
            epoch_d=(b["o_orderdate"].to_numpy()
                     .astype("datetime64[D]").astype(np.int64)))

    m = partial_groupby(
        orders, ["o_custkey"],
        {"spend_cents": ("cents", "sum"), "n_orders": ("cents", "count"),
         "last_d": ("epoch_d", "max")},
        prep=prep, many_groups=True, num_buckets=num_buckets
    ).materialize()          # consumed by three rank passes + the fold

    tiled = {}
    for name, keys, desc in (
            ("r", ["last_d", "o_custkey"], [True, False]),   # recent=1
            ("f", ["n_orders", "o_custkey"], [True, False]),
            ("m", ["spend_cents", "o_custkey"], [True, False])):
        ranked, n = global_row_number(m, keys, descending=desc)

        def stamp(b: pd.DataFrame, n=n) -> pd.DataFrame:
            return pd.DataFrame({
                "o_custkey": b["o_custkey"].to_numpy(np.int64),
                "tile": _ntile_of(b["rank"].to_numpy(), n,
                                  tiles).astype(np.int64)})

        tiled[name] = (ranked.map_batches(stamp, batch_format="pandas")
                       .to_pandas().set_index("o_custkey")["tile"])

    base = m.to_pandas().set_index("o_custkey")
    cells = pd.DataFrame({
        "r_tile": tiled["r"].reindex(base.index),
        "f_tile": tiled["f"].reindex(base.index),
        "m_tile": tiled["m"].reindex(base.index),
        "spend_cents": base["spend_cents"].astype(np.int64)})
    g = (cells.groupby(["r_tile", "f_tile", "m_tile"])
         .agg(n_customers=("spend_cents", "size"),
              spend_cents=("spend_cents", "sum")).reset_index())
    return (g.astype({"r_tile": np.int64, "f_tile": np.int64,
                      "m_tile": np.int64, "n_customers": np.int64,
                      "spend_cents": np.int64})
            .sort_values(["r_tile", "f_tile", "m_tile"])
            .reset_index(drop=True))


def customer_rfm_segments_sql(tiles: int = RFM_TILES) -> str:
    return f"""
        WITH m AS (
            SELECT o_custkey,
                   sum(CAST(round(o_totalprice * 100) AS BIGINT))
                       AS spend_cents,
                   count(*)::BIGINT AS n_orders,
                   CAST(max(epoch(date_trunc('day', o_orderdate)))
                        // 86400 AS BIGINT) AS last_d
            FROM orders GROUP BY o_custkey
        ),
        t AS (
            SELECT o_custkey, spend_cents,
                   ntile({tiles}) OVER (ORDER BY last_d DESC, o_custkey)
                       AS r_tile,
                   ntile({tiles}) OVER (ORDER BY n_orders DESC, o_custkey)
                       AS f_tile,
                   ntile({tiles}) OVER (ORDER BY spend_cents DESC,
                                        o_custkey) AS m_tile
            FROM m
        )
        SELECT CAST(r_tile AS BIGINT) AS r_tile,
               CAST(f_tile AS BIGINT) AS f_tile,
               CAST(m_tile AS BIGINT) AS m_tile,
               count(*)::BIGINT AS n_customers,
               sum(spend_cents)::BIGINT AS spend_cents
        FROM t GROUP BY 1, 2, 3
    """
