"""Temporal / keyed-window operators the reference's gather+merge layer
implies but Ray Data lacks natively: as-of join, sliding (hopping) windows,
session windows, rolling aggregates, per-group top-k, and pivot.

These are the "custom operators" case of the build brief (as-of join, range
join, windowed aggregate): each is a composition of map_batches +
ONE hash-keyed shuffle (common.keyed_map_groups) with all per-key work
vectorized inside the bucket — never a per-key map_groups (millions of tiny
pandas calls) and never a driver-side sort.  Partitioning assumption, stated
per the brief: a single key's rows fit one bucket worker (true for per-user
event streams and per-customer order lists; a pathological hot key would
need salting + a merge pass, as done for hot hosts in stages/parse.py).

Every operator here has a full DuckDB oracle in __ray_entry__.py — ordering
ties are pinned by (ts, event_id) / (o_totalprice, o_orderkey) total orders
so engine and SQL agree exactly; float aggregates are rounded on both sides
(the established convention, see relational.user_hourly_windows).

Reference analogs: gather merge ordering (SURVEY §2.5 O1/O3 —
src/client/main.go:145-203 gather(): per-storage-node fetch merged into one
productMap, first writer wins per key), extended to the event-time window
family a training-data pipeline needs.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray.data as rd

from .common import keyed_map_groups, load, partial_groupby, sql_round

US_PER_HOUR = 3_600_000_000


def _ts_us(s: pd.Series) -> np.ndarray:
    return s.to_numpy().astype("datetime64[us]").astype(np.int64)


# ------------------------------------------------------------- as-of join


def asof_purchase_attribution(sf_dir: str, num_buckets: int = 16) -> rd.Dataset:
    """As-of join (attribution): each 'purchase' event joins the LATEST
    'click' event of the same user with click.ts <= purchase.ts.

    Plan: filter both roles out of one pruned read, hash-bucket by user_id
    (complete users per bucket — the as-of partitioning assumption), then a
    vectorized pandas merge_asof per bucket.  The shuffle moves only the
    filtered event roles, never the full table; at cluster scale each
    bucket is one task and the merge is O(n log n) in bucket rows.

    Tie rules (pinned so the DuckDB ASOF oracle agrees exactly):
    - equal timestamps match (allow_exact_matches / ts >= ts);
    - duplicate click timestamps within a user keep max(event_id).
    Purchases with no prior click keep click_id = -1 (LEFT semantics;
    -1 instead of NULL so the int column survives the pandas/Arrow
    round-trip without float coercion on either side of the oracle).
    """
    ds = load(sf_dir, "events", ["event_id", "ts", "user_id", "event_type"])

    def keep_roles(batch: pd.DataFrame) -> pd.DataFrame:
        return batch[batch["event_type"].isin(("purchase", "click"))]

    def attribute(g: pd.DataFrame) -> pd.DataFrame:
        g = g.assign(ts_us=_ts_us(g["ts"]))
        p = g[g["event_type"] == "purchase"].sort_values(["ts_us", "event_id"])
        c = (g[g["event_type"] == "click"]
             .sort_values(["ts_us", "event_id"])
             .drop_duplicates(["user_id", "ts_us"], keep="last"))
        if p.empty:
            return pd.DataFrame({"purchase_id": pd.Series([], dtype=np.int64),
                                 "user_id": pd.Series([], dtype=np.int64),
                                 "purchase_ts_us": pd.Series([], dtype=np.int64),
                                 "click_id": pd.Series([], dtype=np.int64),
                                 "click_ts_us": pd.Series([], dtype=np.int64)})
        j = pd.merge_asof(
            p[["event_id", "user_id", "ts_us"]],
            c[["event_id", "user_id", "ts_us"]].rename(
                columns={"event_id": "click_id", "ts_us": "click_ts_us"}),
            on=None, left_on="ts_us", right_on="click_ts_us",
            by="user_id", direction="backward", allow_exact_matches=True,
        )
        out = pd.DataFrame({
            "purchase_id": j["event_id"].astype(np.int64),
            "user_id": j["user_id"].astype(np.int64),
            "purchase_ts_us": j["ts_us"].astype(np.int64),
            "click_id": j["click_id"].fillna(-1).astype(np.int64),
            "click_ts_us": j["click_ts_us"].fillna(-1).astype(np.int64),
        })
        return out

    filtered = ds.map_batches(keep_roles, batch_format="pandas")
    return keyed_map_groups(filtered, "user_id", attribute, num_buckets)


# ------------------------------------------------------------- range join


def range_join_click_windows(sf_dir: str, window_hours: int = 1,
                             num_buckets: int = 16) -> rd.Dataset:
    """Range (interval) join: each 'purchase' aggregates ALL 'click' events
    of the same user in the preceding window [purchase.ts - W, purchase.ts).

    Plan: same one-shuffle shape as the as-of join (complete users per
    bucket), but inside the bucket the window aggregate is computed with a
    composite (user, ts) key + two vectorized searchsorted calls and a
    click-value prefix sum — O((P+C) log C) per bucket, never the P×C
    expansion an actual join would materialize.  LEFT semantics: purchases
    with no in-window click keep (0, 0.0).  Window bounds are half-open
    [ts-W, ts) so a click at the purchase instant is excluded — mirrored in
    the DuckDB oracle's predicate exactly."""
    ds = load(sf_dir, "events", ["event_id", "ts", "user_id", "event_type",
                                 "value"])
    win_us = window_hours * US_PER_HOUR

    def keep_roles(batch: pd.DataFrame) -> pd.DataFrame:
        return batch[batch["event_type"].isin(("purchase", "click"))]

    def windowed(g: pd.DataFrame) -> pd.DataFrame:
        g = g.assign(ts_us=_ts_us(g["ts"]))
        p = g[g["event_type"] == "purchase"]
        c = g[g["event_type"] == "click"]
        empty = pd.DataFrame({"purchase_id": pd.Series([], dtype=np.int64),
                              "user_id": pd.Series([], dtype=np.int64),
                              "n_clicks": pd.Series([], dtype=np.int64),
                              "sum_click_value": pd.Series([], dtype=np.float64)})
        if p.empty:
            return empty
        # composite int64 key: dense user code * M + RANK of the click ts
        # keeps (user, ts) order in ONE sortable array so both window bounds
        # are a single vectorized searchsorted over all purchases at once.
        # Ranks (positions in the bucket's sorted distinct click-ts array)
        # instead of raw ts offsets keep the key's magnitude a function of
        # the BUCKET's row count, never the timestamp span — a year-long
        # span with ~146k users per bucket would overflow int64 otherwise;
        # with ranks the product stays < rows² (safe to ~3e9 rows/bucket)
        all_users = pd.concat([p["user_id"], c["user_id"]]).unique()
        code = pd.Series(np.arange(len(all_users), dtype=np.int64),
                         index=all_users)
        uniq_cts = np.unique(c["ts_us"].to_numpy())
        M = np.int64(len(uniq_cts) + 1)
        assert len(all_users) * M < 2 ** 62, \
            "composite key overflow: bucket exceeds ~3e9 rows — raise num_buckets"
        crank = np.searchsorted(uniq_cts, c["ts_us"].to_numpy(), "left")
        ckey = code[c["user_id"]].to_numpy() * M + crank
        # sort clicks by the COMPOSITE key (codes are appearance-ordered, so
        # sorting by raw user_id would not sort ckey) — searchsorted needs it
        corder = np.argsort(ckey, kind="stable")
        ckey = ckey[corder]
        cval = c["value"].to_numpy(np.float64)[corder]
        pcode = code[p["user_id"]].to_numpy() * M
        pts = p["ts_us"].to_numpy()
        # clicks in [pts - W, pts) == ranks in [r_lo, r_hi): searchsorted
        # 'left' over the distinct ts array maps both bounds exactly
        r_lo = np.searchsorted(uniq_cts, pts - win_us, "left")
        r_hi = np.searchsorted(uniq_cts, pts, "left")
        lo = np.searchsorted(ckey, pcode + r_lo, "left")
        hi = np.searchsorted(ckey, pcode + r_hi, "left")
        prefix = np.concatenate([[0.0], np.cumsum(cval)])
        return pd.DataFrame({
            "purchase_id": p["event_id"].to_numpy(np.int64),
            "user_id": p["user_id"].to_numpy(np.int64),
            "n_clicks": (hi - lo).astype(np.int64),
            "sum_click_value": sql_round(prefix[hi] - prefix[lo], 4),
        })

    filtered = ds.map_batches(keep_roles, batch_format="pandas")
    return keyed_map_groups(filtered, "user_id", windowed, num_buckets)


# ------------------------------------------------- sliding (hopping) windows


def sliding_window_stats(sf_dir: str, size_hours: int = 2,
                         hop_hours: int = 1) -> rd.Dataset:
    """Hopping event-time windows (size 2h, hop 1h): every event lands in
    size/hop windows.  The fan-out happens INSIDE the partial-agg combiner
    (np.repeat on the batch — the shuffle then moves one tiny partial row
    per (window, type) per batch, never the replicated events), so the
    window overlap factor costs memory only within a batch."""
    assert size_hours % hop_hours == 0, "window must be a whole number of hops"
    fanout = size_hours // hop_hours
    hop_us = hop_hours * US_PER_HOUR

    def expand(batch: pd.DataFrame) -> pd.DataFrame:
        bucket = _ts_us(batch["ts"]) // hop_us
        n = len(batch)
        reps = pd.DataFrame({
            "event_type": np.repeat(batch["event_type"].to_numpy(), fanout),
            "value": np.repeat(batch["value"].to_numpy(), fanout),
            "window_start_us": (np.repeat(bucket, fanout)
                                - np.tile(np.arange(fanout, dtype=np.int64), n)
                                ) * hop_us,
        })
        return reps

    ds = load(sf_dir, "events", ["ts", "event_type", "value"])
    out = partial_groupby(
        ds, ["window_start_us", "event_type"],
        {"n_events": ("value", "count"), "sum_value": ("value", "sum")},
        prep=expand,
        many_groups=True,  # windows x types is thousands of keys
    )

    def finish(batch: pd.DataFrame) -> pd.DataFrame:
        batch["sum_value"] = sql_round(batch["sum_value"], 4)
        batch["n_events"] = batch["n_events"].astype(np.int64)
        return batch

    return out.map_batches(finish, batch_format="pandas")


# --------------------------------------------------------- session windows


def session_windows(sf_dir: str, gap_minutes: int = 30,
                    num_buckets: int = 16) -> rd.Dataset:
    """Gap-based sessionization per user: a new session starts when the gap
    to the previous event of the same user exceeds ``gap_minutes``.  One
    hash shuffle by user; inside each bucket the lag/cumsum session
    assignment is fully vectorized across ALL users at once (sort by
    (user_id, ts, event_id), shift, cumsum — no per-user loop)."""
    gap_us = gap_minutes * 60_000_000

    def sessionize(g: pd.DataFrame) -> pd.DataFrame:
        g = g.assign(ts_us=_ts_us(g["ts"])).sort_values(
            ["user_id", "ts_us", "event_id"])
        user = g["user_id"].to_numpy()
        ts = g["ts_us"].to_numpy()
        same_user = np.concatenate(([False], user[1:] == user[:-1]))
        gap_ok = np.concatenate(([False], (ts[1:] - ts[:-1]) <= gap_us))
        new_session = ~(same_user & gap_ok)
        g = g.assign(session_seq=np.cumsum(new_session))
        agg = g.groupby(["user_id", "session_seq"], sort=False).agg(
            session_start_us=("ts_us", "min"),
            session_end_us=("ts_us", "max"),
            n_events=("event_id", "size"),
            sum_value=("value", "sum"),
        ).reset_index().drop(columns="session_seq")
        agg["n_events"] = agg["n_events"].astype(np.int64)
        agg["sum_value"] = sql_round(agg["sum_value"], 4)
        return agg

    ds = load(sf_dir, "events", ["event_id", "ts", "user_id", "value"])
    return keyed_map_groups(ds, "user_id", sessionize, num_buckets)


# -------------------------------------------------------- rolling aggregate


def rolling_event_avg(sf_dir: str, window: int = 3,
                      num_buckets: int = 16) -> rd.Dataset:
    """Row-based rolling mean per user (last ``window`` events ordered by
    (ts, event_id) — a unique total order, so the oracle window frame is
    identical).  Same single-shuffle bucket pattern; pandas' grouped
    rolling kernel does the per-user windows vectorized."""

    def roll(g: pd.DataFrame) -> pd.DataFrame:
        g = g.assign(ts_us=_ts_us(g["ts"])).sort_values(
            ["user_id", "ts_us", "event_id"])
        avg = (g.groupby("user_id", sort=False)["value"]
               .rolling(window, min_periods=1).mean()
               .reset_index(level=0, drop=True))
        return pd.DataFrame({
            "event_id": g["event_id"].astype(np.int64),
            "user_id": g["user_id"].astype(np.int64),
            "rolling_avg": sql_round(avg, 4),
        })

    ds = load(sf_dir, "events", ["event_id", "ts", "user_id", "value"])
    return keyed_map_groups(ds, "user_id", roll, num_buckets)


# -------------------------------------------------------- per-group top-k


def top_orders_per_customer(sf_dir: str, k: int = 3,
                            num_buckets: int = 16) -> rd.Dataset:
    """Grouped top-k: each customer's k most expensive orders with rank.
    Two-phase like global top-k (relational.top_orders): a per-BLOCK
    partial top-k per key runs inside map_batches first, so the shuffle
    moves at most k rows per (key, block) — at scale that's the combiner
    that keeps a skewed customer from shipping every order."""

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        return (batch.sort_values(["o_custkey", "o_totalprice", "o_orderkey"],
                                  ascending=[True, False, True])
                .groupby("o_custkey", sort=False).head(k))

    def final(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["o_custkey", "o_totalprice", "o_orderkey"],
                          ascending=[True, False, True])
        top = g.groupby("o_custkey", sort=False).head(k).copy()
        top["rank"] = top.groupby("o_custkey", sort=False).cumcount() + 1
        return pd.DataFrame({
            "o_custkey": top["o_custkey"].astype(np.int64),
            "o_orderkey": top["o_orderkey"].astype(np.int64),
            "o_totalprice": sql_round(top["o_totalprice"], 2),
            "rank": top["rank"].astype(np.int64),
        })

    ds = load(sf_dir, "orders", ["o_custkey", "o_orderkey", "o_totalprice"])
    partials = ds.map_batches(partial, batch_format="pandas")
    return keyed_map_groups(partials, "o_custkey", final, num_buckets)


# ---------------------------------------------------- per-group quantiles


def user_value_quantiles(sf_dir: str, qs: tuple = (0.25, 0.5, 0.9),
                         num_buckets: int = 16) -> rd.Dataset:
    """Exact per-user quantiles of the event value (grouped complement of
    the global price_quantiles selection).  High-cardinality key + small
    per-key group = the keyed_map_groups regime: one shuffle, then a pure
    numpy grouped selection (sort once, per-group offsets, fancy-indexed
    rank extraction — no per-user loop).  Rank rule matches DuckDB
    quantile_disc: sorted[max(0, ceil(q*n) - 1)]."""

    def quantiles(g: pd.DataFrame) -> pd.DataFrame:
        if g.empty:  # hash hole: np.r_[True, ...] on empty yields one
            return pd.DataFrame(  # phantom start index
                {"user_id": pd.Series([], dtype=np.int64),
                 "n_events": pd.Series([], dtype=np.int64),
                 **{f"p{int(q * 100)}_value": pd.Series([], dtype=np.float64)
                    for q in qs}})
        g = g.sort_values(["user_id", "value"])
        users = g["user_id"].to_numpy()
        vals = g["value"].to_numpy()
        first = np.concatenate(([True], users[1:] != users[:-1]))
        starts = np.flatnonzero(first)
        counts = np.diff(np.append(starts, len(users)))
        out = {"user_id": users[starts].astype(np.int64),
               "n_events": counts.astype(np.int64)}
        for q in qs:
            idx = starts + np.maximum(0, np.ceil(q * counts).astype(np.int64) - 1)
            out[f"p{int(q * 100)}_value"] = vals[idx]
        return pd.DataFrame(out)

    ds = load(sf_dir, "events", ["user_id", "value"])
    return keyed_map_groups(ds, "user_id", quantiles, num_buckets)


# ------------------------------------------------- grouped distinct counts


def distinct_users_per_type(sf_dir: str, num_buckets: int = 16) -> rd.Dataset:
    """count(DISTINCT user_id) per event_type at scale: per-batch pair
    dedup (combiner), then ONE shuffle by user (a user's duplicates across
    batches all land in the same bucket, so within-bucket dedup is globally
    exact), then tiny per-(bucket, type) partial counts reduced by a
    5-group aggregate.  The naive alternative — groupby(type).agg(unique)
    — ships every row of the biggest type to one task."""

    def pair_dedup(batch: pd.DataFrame) -> pd.DataFrame:
        return batch.drop_duplicates()

    def count_distinct(g: pd.DataFrame) -> pd.DataFrame:
        d = g.drop_duplicates()
        out = d.groupby("event_type", sort=False).size().rename("n_users")
        return out.reset_index()

    ds = load(sf_dir, "events", ["user_id", "event_type"])
    per_batch = ds.map_batches(pair_dedup, batch_format="pandas")
    per_bucket = keyed_map_groups(per_batch, "user_id", count_distinct,
                                  num_buckets)
    out = partial_groupby(per_bucket, ["event_type"],
                          {"n_users": ("n_users", "sum")})
    return out.map_batches(
        lambda df: df.astype({"n_users": np.int64}), batch_format="pandas")


# ------------------------------------------------------------ running sum


def user_cumulative_value(sf_dir: str, num_buckets: int = 16) -> rd.Dataset:
    """Running total per user ordered by (ts, event_id) — the prefix-sum
    window.  Same single-shuffle bucket pattern; the cumsum is one
    vectorized grouped kernel over the whole bucket."""

    def cumsum(g: pd.DataFrame) -> pd.DataFrame:
        g = g.assign(ts_us=_ts_us(g["ts"])).sort_values(
            ["user_id", "ts_us", "event_id"])
        run = g.groupby("user_id", sort=False)["value"].cumsum()
        return pd.DataFrame({
            "event_id": g["event_id"].astype(np.int64),
            "user_id": g["user_id"].astype(np.int64),
            "cum_value": sql_round(run, 4),
        })

    ds = load(sf_dir, "events", ["event_id", "ts", "user_id", "value"])
    return keyed_map_groups(ds, "user_id", cumsum, num_buckets)


# -------------------------------------------------------- lag / gap stats


def event_gap_stats(sf_dir: str, num_buckets: int = 16) -> rd.Dataset:
    """Per-user inter-event gap profile (lag deltas): n_events, avg and max
    gap in seconds.  Single-event users have no gaps and report -1 (the
    repo's NULL-free sentinel convention, mirrored by coalesce in the
    oracle).

    Exactness by construction: consecutive gaps TELESCOPE, so each user's
    gap SUM is held as the exact int64 microsecond span and the average is
    ONE double division ``span / ((n-1)·1e6)`` — the identical expression
    the oracle evaluates, so engine and DuckDB agree bit-for-bit at any
    block count.  (A float mean over per-gap seconds diverged from the
    oracle past the 4 dp grid at sf0.1 — numpy pairwise vs sequential
    association — and ``.round(4)`` was banker's where DuckDB rounds half
    away; both classes are gone.)"""
    from .common import sql_round

    def gaps(g: pd.DataFrame) -> pd.DataFrame:
        g = g.assign(ts_us=_ts_us(g["ts"])).sort_values(
            ["user_id", "ts_us", "event_id"])
        users = g["user_id"].to_numpy()
        ts = g["ts_us"].to_numpy()
        same = users[1:] == users[:-1]
        d = pd.DataFrame({"user_id": users[1:][same],
                          "gap_us": (ts[1:] - ts[:-1])[same]})
        n = pd.Series(users).value_counts(sort=False)
        agg = d.groupby("user_id", sort=False)["gap_us"].agg(["sum", "max"])
        out = pd.DataFrame({
            "user_id": n.index.to_numpy().astype(np.int64),
            "n_events": n.to_numpy().astype(np.int64),
        })
        span = out["user_id"].map(agg["sum"]).to_numpy(np.float64)
        mx = out["user_id"].map(agg["max"]).to_numpy(np.float64)
        nn = out["n_events"].to_numpy(np.float64)
        avg = sql_round(span / ((nn - 1.0) * 1e6), 4)
        mxs = sql_round(mx / 1e6, 4)
        out["avg_gap_s"] = np.where(np.isnan(avg), -1.0, avg)
        out["max_gap_s"] = np.where(np.isnan(mxs), -1.0, mxs)
        return out

    ds = load(sf_dir, "events", ["event_id", "ts", "user_id"])
    return keyed_map_groups(ds, "user_id", gaps, num_buckets)


# --------------------------------------------------------------- histogram


def value_histogram(sf_dir: str, width: float = 50.0,
                    n_bins: int = 10) -> rd.Dataset:
    """Fixed-bin global histogram of event values: each batch emits at most
    n_bins partial rows (np.bincount combiner), the reduce is an n_bins
    aggregate — the classic fixed-size-partial pattern (same shape as the
    exact-quantile histogram pass, relational.price_quantiles)."""

    def bins(batch: pd.DataFrame) -> pd.DataFrame:
        idx = np.clip((batch["value"].to_numpy() / width).astype(np.int64),
                      0, n_bins - 1)
        counts = np.bincount(idx, minlength=n_bins)
        keep = counts > 0
        return pd.DataFrame({"bin": np.arange(n_bins, dtype=np.int64)[keep],
                             "n": counts[keep]})

    ds = load(sf_dir, "events", ["value"])
    parts = ds.map_batches(bins, batch_format="pandas")
    out = partial_groupby(parts, ["bin"], {"n": ("n", "sum")})
    return out.map_batches(lambda df: df.astype({"n": np.int64}),
                           batch_format="pandas")


# ------------------------------------------------------------------- pivot

EVENT_TYPES = ("click", "error", "purchase", "signup", "view")


def pivot_event_counts(sf_dir: str) -> rd.Dataset:
    """Pivot (long -> wide): one row per user with a count column per event
    type.  Expressed as conditional partial aggregation — the indicator
    columns are built inside the combiner, so the shuffle is one tiny
    partial row per (user, batch), and unseen types still appear as 0."""

    def indicators(batch: pd.DataFrame) -> pd.DataFrame:
        out = {"user_id": batch["user_id"]}
        et = batch["event_type"].to_numpy()
        for t in EVENT_TYPES:
            out[f"n_{t}"] = (et == t).astype(np.int64)
        return pd.DataFrame(out)

    ds = load(sf_dir, "events", ["user_id", "event_type"])
    aggs = {f"n_{t}": (f"n_{t}", "sum") for t in EVENT_TYPES}
    out = partial_groupby(ds, ["user_id"], aggs, prep=indicators,
                          many_groups=True)  # one group per user

    def finish(batch: pd.DataFrame) -> pd.DataFrame:
        for t in EVENT_TYPES:
            batch[f"n_{t}"] = batch[f"n_{t}"].astype(np.int64)
        batch["n_total"] = sum(batch[f"n_{t}"] for t in EVENT_TYPES)
        return batch

    return out.map_batches(finish, batch_format="pandas")


# --------------------------------------------------------- cohort retention


def cohort_retention(sf_dir: str, num_buckets: int = 16) -> rd.Dataset:
    """Cohort retention matrix: users are grouped into weekly cohorts by
    their FIRST event's epoch week, and each (cohort_week, week_offset)
    cell counts the distinct users of that cohort active in that week —
    the standard product-analytics retention triangle, an operator Ray
    Data has no native form for.

    Scale shape: ONE hash shuffle keyed by user_id (keyed_map_groups — a
    user's events land whole in one bucket), so the cohort week, the
    active-week set, and the per-cell distinct-user counts are all
    computed vectorized inside the bucket; because buckets partition
    USERS, per-bucket distinct counts are additive and the final reduce
    is a tiny sum over (cohort_week, week_offset) partial rows — distinct
    state never leaves the bucket.  Reference analog: none (the reference
    has no analytics); this is the training-data-ops extension of the
    gather/aggregate family (SURVEY.md §2 A1/A2)."""
    week_us = 7 * 86_400_000_000

    def retention(g: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({
            "cohort_week": pd.Series([], dtype=np.int64),
            "week_offset": pd.Series([], dtype=np.int64),
            "n_users": pd.Series([], dtype=np.int64)})
        if not len(g):
            return empty
        g = g.assign(wk=_ts_us(g["ts"]) // week_us)
        first = g.groupby("user_id", sort=False)["wk"].min()
        cells = g[["user_id", "wk"]].drop_duplicates()
        cohort = cells["user_id"].map(first).to_numpy(np.int64)
        out = pd.DataFrame({
            "cohort_week": cohort,
            "week_offset": cells["wk"].to_numpy(np.int64) - cohort,
            # bucket-local distinct: (user, wk) rows are unique here and
            # user sets are disjoint across buckets, so counts add up
            "n_users": np.ones(len(cells), dtype=np.int64)})
        out = out.groupby(["cohort_week", "week_offset"], sort=False,
                          as_index=False)["n_users"].sum()
        out["n_users"] = out["n_users"].astype(np.int64)
        return out

    ds = load(sf_dir, "events", ["user_id", "ts"])
    cells = keyed_map_groups(ds, "user_id", retention, num_buckets)
    out = partial_groupby(cells, ["cohort_week", "week_offset"],
                          {"n_users": ("n_users", "sum")}, many_groups=True)

    def finish(batch: pd.DataFrame) -> pd.DataFrame:
        batch["n_users"] = batch["n_users"].astype(np.int64)
        return batch

    return out.map_batches(finish, batch_format="pandas")


def late_event_windows(sf_dir: str, allowed_lateness_minutes: int = 30,
                       max_delay_hours: int = 2) -> rd.Dataset:
    """WATERMARK / ALLOWED-LATENESS tumbling windows — the streaming
    late-data semantics (Flink/Beam shape) replayed deterministically over
    the batch table so a full SQL oracle can check it.

    The synthetic events table is generated in time order, so out-of-order
    ingestion is modeled with a DETERMINISTIC per-event network delay:
    ``delay = md5(event_id)[:8] % max_delay`` (the SQL-safe md5 mixer both
    engines reproduce bit-identically), and arrival order is
    ``(ts + delay, event_id)``.  The watermark at each arrival is the
    running MAX event time over all STRICTLY PRIOR arrivals minus
    ``allowed_lateness``; an event is LATE iff its own event time sits
    below that watermark (a stream processor would drop it or side-output
    it).  The first arrival has no prior, hence no watermark, hence is on
    time.  With delays up to 2 h against 30 min lateness the late branch
    genuinely fires (15-50% of rows at the fixture scales).  The
    registered DRIVER QUERY pins ``max_delay_hours=2`` — the oracle
    hard-codes that constant — so other values are library-only knobs.

    Engine shape: the exclusive running max rides
    :func:`common.global_prefix_max` — ONE distributed sort by arrival
    key plus a metadata-only (count, max) exchange, never rows to the
    driver — then one map_batches classifies rows and emits
    per-(hour-window) partials folded by the bucketed partial_groupby.
    Output per window_hour: on-time count, late count, and the on-time
    value sum (what the window would have fired with).

    Reference analog: none (the reference has no event-time semantics);
    this extends the windowed family (user_hourly_windows / sliding /
    session) with the late-data dimension a production ingestion pipeline
    needs."""
    from .common import global_prefix_max, md5_hex, sql_round

    late_us = int(allowed_lateness_minutes) * 60_000_000
    max_delay_us = int(max_delay_hours) * 3_600_000_000

    ds = load(sf_dir, "events", ["event_id", "ts", "value"])

    def to_us(df: pd.DataFrame) -> pd.DataFrame:
        eid = df["event_id"].to_numpy(np.int64)
        ts_us = _ts_us(df["ts"])
        # 12 hex chars = 48 bits: strictly wider than any sane max_delay_us
        # (an 8-char slice is only 32 bits ~= 1.19 h and would make the
        # modulus a silent no-op above that)
        delay = np.array(
            [int(h[:12], 16) for h in md5_hex(str(int(e)) for e in eid)],
            dtype=np.int64) % max_delay_us
        return pd.DataFrame({
            "event_id": eid,
            "ts_us": ts_us,
            "arr_us": ts_us + delay,
            "value": df["value"].to_numpy(np.float64)})

    stamped = global_prefix_max(
        ds.map_batches(to_us, batch_format="pandas"),
        ["arr_us", "event_id"], "ts_us", out_col="wm_us")

    lo = np.iinfo(np.int64).min

    def classify(df: pd.DataFrame) -> pd.DataFrame:
        ts = df["ts_us"].to_numpy(np.int64)
        wm = df["wm_us"].to_numpy(np.int64)
        # first arrival carries the int64-min sentinel: no watermark yet
        late = (wm != lo) & (ts < wm - late_us)
        return pd.DataFrame({
            "window_hour": ts // 3_600_000_000,
            "n_late": late.astype(np.int64),
            "n_on_time": (~late).astype(np.int64),
            "on_time_value": np.where(late, 0.0, df["value"].to_numpy()),
        })

    agg = partial_groupby(
        stamped.map_batches(classify, batch_format="pandas"),
        ["window_hour"],
        {"n_on_time": ("n_on_time", "sum"), "n_late": ("n_late", "sum"),
         "on_time_value": ("on_time_value", "sum")},
        many_groups=True)

    def finish(batch: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "window_hour": batch["window_hour"].to_numpy(np.int64),
            "n_on_time": batch["n_on_time"].to_numpy(np.int64),
            "n_late": batch["n_late"].to_numpy(np.int64),
            "on_time_value": sql_round(batch["on_time_value"], 4),
        })

    return agg.map_batches(finish, batch_format="pandas")


def top_event_type_per_user(sf_dir: str, num_buckets: int = 16) -> rd.Dataset:
    """Grouped MODE with a deterministic tiebreak: each user's most
    frequent event_type (ties break to the lexically smallest type) and
    its count — the per-entity dominant-category shape (device/class/
    language attribution) that SQL spells ``mode() WITHIN GROUP`` but
    needs a window to make the tiebreak deterministic.

    Scale shape: per-batch (user, type) count partials inside map_batches
    cut the shuffle to one row per pair per batch; ONE user-keyed bucket
    exchange (keyed_map_groups) then folds partials and takes the argmax
    per user vectorized — sort by (count desc, type asc) + groupby head(1)
    across the whole bucket, never a per-user loop."""
    from .common import keyed_map_groups

    ds = load(sf_dir, "events", ["user_id", "event_type"])

    def pair_counts(df: pd.DataFrame) -> pd.DataFrame:
        g = (df.groupby(["user_id", "event_type"], sort=False)
             .size().rename("n").reset_index())
        g["n"] = g["n"].astype(np.int64)
        return g

    pairs = ds.map_batches(pair_counts, batch_format="pandas")

    def mode_per_user(bucket: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({
            "user_id": pd.Series([], dtype=np.int64),
            "top_type": pd.Series([], dtype=object),
            "n_events": pd.Series([], dtype=np.int64)})
        if not len(bucket):
            return empty
        g = (bucket.groupby(["user_id", "event_type"], sort=False)["n"]
             .sum().reset_index())
        g = g.sort_values(["user_id", "n", "event_type"],
                          ascending=[True, False, True])
        top = g.groupby("user_id", sort=False).head(1)
        return pd.DataFrame({
            "user_id": top["user_id"].to_numpy(np.int64),
            "top_type": top["event_type"].to_numpy(object),
            "n_events": top["n"].to_numpy(np.int64)})

    return keyed_map_groups(pairs, "user_id", mode_per_user, num_buckets)


def decayed_event_scores(sf_dir: str) -> pd.DataFrame:
    """TIME-DECAYED aggregate (the trending-score / feature-store shape):
    per event_type, the exponentially-decayed count and value sum with a
    one-day half-life relative to the table's newest event.

    Decay parity trick: ages are INTEGER days and the weight is
    ``0.5 ** age_days`` — a power of two, hence EXACTLY representable in
    IEEE754 — so numpy ``ldexp`` and DuckDB ``pow(0.5, n)`` produce
    bit-identical per-row weights and no constants table or grid is
    needed; only the sums are rounded (6 dp, the embedding_covariance
    convention).

    The reference timestamp is the ts column's MAX read from parquet
    ROW-GROUP STATISTICS (zero scan — the snapshot-diff metadata-only-max
    idiom); the oracle's ``max(ts)`` over the view is the same value by
    construction.  Engine shape: one map_batches pass emitting per-type
    partials + the tiny partial_groupby reduce — zero wide shuffles."""
    import os

    import pyarrow.parquet as pq

    from .common import _require_rows, sql_round

    _require_rows(os.path.join(sf_dir, "events.parquet"), "events")
    pf = pq.ParquetFile(os.path.join(sf_dir, "events.parquet"))
    idx = pf.schema_arrow.get_field_index("ts")
    ref_us = max(
        pf.metadata.row_group(g).column(idx).statistics.max
        for g in range(pf.metadata.num_row_groups))
    if hasattr(ref_us, "timestamp"):  # stats may decode to datetime
        ref_us = np.datetime64(ref_us, "us").astype(np.int64)

    ds = load(sf_dir, "events", ["ts", "event_type", "value"])

    def partials(df: pd.DataFrame) -> pd.DataFrame:
        age_days = (ref_us - _ts_us(df["ts"])) // 86_400_000_000
        w = np.ldexp(1.0, -age_days.astype(np.int64))
        g = (pd.DataFrame({"event_type": df["event_type"].to_numpy(object),
                           "w": w,
                           "wv": w * df["value"].to_numpy(np.float64)})
             .groupby("event_type", sort=False).agg(
                 n=("w", "size"), dc=("w", "sum"), dv=("wv", "sum"))
             .reset_index())
        g["n"] = g["n"].astype(np.int64)
        return g

    out = partial_groupby(
        ds.map_batches(partials, batch_format="pandas"), ["event_type"],
        {"n_events": ("n", "sum"), "dc": ("dc", "sum"), "dv": ("dv", "sum")}
    ).to_pandas()
    return pd.DataFrame({
        "event_type": out["event_type"].to_numpy(object),
        "n_events": out["n_events"].to_numpy(np.int64),
        "decayed_count": sql_round(out["dc"], 6),
        "decayed_value": sql_round(out["dv"], 6),
    }).sort_values("event_type").reset_index(drop=True)


def daily_type_anomalies(sf_dir: str, num_buckets: int = 16) -> pd.DataFrame:
    """TIME-SERIES ANOMALY SCORING: each (event_type, day) cell's event
    count standardized against its type's daily distribution — the
    monitoring shape behind traffic-spike / pipeline-regression alerts
    (z = (n - mean) / stddev_samp over that type's days).

    Engine shape: ONE (type, day)-keyed count pass (per-batch partials,
    bucketed reduce); the resulting cell table is metadata-sized
    (types x days), so the per-type moments and the z-scores fold
    driver-side — the same finish-pass budget as every small-aggregate
    query here.  Types whose daily counts never vary (sd == 0) are
    excluded on BOTH engines rather than emitting inf.  z rounds to 4 dp
    half-away (stddev FP paths differ between numpy and DuckDB at ulp
    scale; the established rounding convention absorbs it)."""
    from .common import sql_round

    ds = load(sf_dir, "events", ["ts", "event_type"])

    def day_counts(df: pd.DataFrame) -> pd.DataFrame:
        g = (pd.DataFrame({
                "event_type": df["event_type"].to_numpy(object),
                "day": _ts_us(df["ts"]) // 86_400_000_000})
             .groupby(["event_type", "day"], sort=False)
             .size().rename("n").reset_index())
        g["n"] = g["n"].astype(np.int64)
        return g

    cells = partial_groupby(
        ds.map_batches(day_counts, batch_format="pandas"),
        ["event_type", "day"], {"n": ("n", "sum")}, many_groups=True,
        num_buckets=num_buckets).to_pandas()

    out = []
    for et, g in cells.groupby("event_type", sort=True):
        n = g["n"].to_numpy(np.float64)
        if len(n) < 2:
            continue
        mu = n.mean()
        sd = np.sqrt(((n - mu) ** 2).sum() / (len(n) - 1))
        if sd == 0:
            continue
        out.append(pd.DataFrame({
            "event_type": np.full(len(g), et, dtype=object),
            "day": g["day"].to_numpy(np.int64),
            "n": g["n"].to_numpy(np.int64),
            "z": sql_round((n - mu) / sd, 4)}))
    if not out:
        return pd.DataFrame({"event_type": pd.Series([], dtype=object),
                             "day": pd.Series([], dtype=np.int64),
                             "n": pd.Series([], dtype=np.int64),
                             "z": pd.Series([], dtype=np.float64)})
    return (pd.concat(out, ignore_index=True)
            .sort_values(["event_type", "day"]).reset_index(drop=True))


def event_transition_matrix(sf_dir: str, num_buckets: int = 16) -> pd.DataFrame:
    """MARKOV TRANSITION COUNTS over per-user event sequences: for each
    user's events ordered by (ts, event_id), count every adjacent
    (prev_type -> next_type) step, then aggregate the corpus-wide
    transition matrix with each cell's share of its source row — the
    session-flow / behavioral-model shape (what follows a click?).

    Engine shape: ONE user-keyed bucket exchange (complete users per
    bucket); inside the bucket a single vectorized sort + shift pairs
    each event with its successor (never a per-user loop); per-bucket
    (prev, next) partials reduce through the tiny grouped sum.  The row
    share divides AFTER the global reduce, on the 4-dp half-away grid."""
    from .common import keyed_map_groups, sql_round

    ds = load(sf_dir, "events", ["event_id", "ts", "user_id", "event_type"])

    def steps(bucket: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({"prev_type": pd.Series([], dtype=object),
                              "next_type": pd.Series([], dtype=object),
                              "n": pd.Series([], dtype=np.int64)})
        if not len(bucket):
            return empty
        b = bucket.assign(ts_us=_ts_us(bucket["ts"])).sort_values(
            ["user_id", "ts_us", "event_id"])
        same_user = b["user_id"].to_numpy()[1:] == b["user_id"].to_numpy()[:-1]
        prev = b["event_type"].to_numpy(object)[:-1][same_user]
        nxt = b["event_type"].to_numpy(object)[1:][same_user]
        if not len(prev):
            return empty
        g = (pd.DataFrame({"prev_type": prev, "next_type": nxt})
             .groupby(["prev_type", "next_type"], sort=False)
             .size().rename("n").reset_index())
        g["n"] = g["n"].astype(np.int64)
        return g

    cells = keyed_map_groups(ds, "user_id", steps, num_buckets)
    agg = partial_groupby(cells, ["prev_type", "next_type"],
                          {"n": ("n", "sum")}, many_groups=True,
                          num_buckets=num_buckets).to_pandas()
    agg["n"] = agg["n"].astype(np.int64)
    row_tot = agg.groupby("prev_type")["n"].transform("sum")
    agg["row_share"] = sql_round(agg["n"] / row_tot, 4)
    return (agg.sort_values(["prev_type", "next_type"])
            .reset_index(drop=True))


# sequence-mining contract shared by the engine defaults AND the registered
# SQL oracle (one source of truth): window length and top-k cut
SEQ_LEN = 3
SEQ_K = 15


def top_event_sequences(sf_dir: str, seq_len: int = SEQ_LEN, k: int = SEQ_K,
                        num_buckets: int = 16) -> pd.DataFrame:
    """GLOBAL TOP-K FREQUENT EVENT-TYPE SEQUENCES of length ``seq_len``
    over per-user (ts, event_id)-ordered streams — the sequential-
    pattern flavor of :func:`event_transition_matrix` (bigram ->
    n-gram): the "view -> click -> purchase" motif mining behavioral
    pipelines run.  Windows never span users; ranking is deterministic
    (count desc, then sequence lexicographic), rank included.

    Engine shape: the transition-matrix topology — ONE user-keyed
    exchange (complete users per bucket), a vectorized sort + shift
    stack per bucket (seq_len-1 shifts under an all-same-user mask,
    never a per-user loop), (t1..tL) count partials, tiny reduce
    (output bounded by #types^seq_len, not events); the top-k folds on
    the driver over that metadata-sized table."""
    from .common import keyed_map_groups

    cols = [f"t{j + 1}" for j in range(seq_len)]
    ds = load(sf_dir, "events", ["event_id", "ts", "user_id", "event_type"])

    def windows(bucket: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame(
            {**{c: pd.Series([], dtype=object) for c in cols},
             "n": pd.Series([], dtype=np.int64)})
        if len(bucket) < seq_len:
            return empty
        b = bucket.assign(ts_us=_ts_us(bucket["ts"])).sort_values(
            ["user_id", "ts_us", "event_id"])
        u = b["user_id"].to_numpy()
        e = b["event_type"].to_numpy(object)
        n = len(b) - seq_len + 1
        same = np.ones(n, dtype=bool)
        for j in range(1, seq_len):  # window entirely inside one user
            same &= u[j:j + n] == u[:n]
        if not same.any():
            return empty
        g = (pd.DataFrame({c: e[j:j + n][same]
                           for j, c in enumerate(cols)})
             .groupby(cols, sort=False).size().rename("n").reset_index())
        g["n"] = g["n"].astype(np.int64)
        return g

    cells = keyed_map_groups(ds, "user_id", windows, num_buckets)
    agg = partial_groupby(cells, cols, {"n": ("n", "sum")},
                          many_groups=True,
                          num_buckets=num_buckets).to_pandas()
    agg["n"] = agg["n"].astype(np.int64)
    agg = (agg.sort_values(["n"] + cols, ascending=[False] + [True] * seq_len)
           .reset_index(drop=True).head(k))
    agg["rank"] = np.arange(1, len(agg) + 1, dtype=np.int64)
    return agg


def top_event_sequences_sql(seq_len: int = SEQ_LEN, k: int = SEQ_K) -> str:
    """The DuckDB oracle: lead(event_type, j) OVER (PARTITION BY user_id
    ORDER BY ts, event_id) for j = 1..seq_len-1 (the partition bound
    nulls windows that would span users, mirroring the engine's mask),
    grouped counts, then the identical (n desc, sequence asc) rank."""
    leads = ",\n                   ".join(
        f"lead(event_type, {j}) OVER w AS t{j + 1}"
        for j in range(1, seq_len))
    cols = ", ".join(f"t{j + 1}" for j in range(seq_len))
    return f"""
        WITH o AS (
            SELECT event_type AS t1,
                   {leads}
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        ),
        c AS (
            SELECT {cols}, count(*)::BIGINT AS n
            FROM o WHERE t{seq_len} IS NOT NULL
            GROUP BY {cols}
        )
        SELECT {cols}, n, CAST(row_number() OVER (
                   ORDER BY n DESC, {cols}) AS BIGINT) AS rank
        FROM c QUALIFY rank <= {k}
    """


_US_PER_DAY_OHLC = 86_400_000_000


def type_daily_ohlc(sf_dir: str, num_buckets: int = 16) -> pd.DataFrame:
    """OHLC CANDLES per (event_type, day) — the ordered ARG-MIN/ARG-MAX
    aggregate shape (open = value at the earliest (ts, event_id), close
    = at the latest, plus high/low/n): metrics rollups, finance bars
    and "first/last state of the day" all reduce to this.

    Scale shape: per-batch MERGEABLE candle partials — each batch emits
    one row per (type, day) carrying its local (open key, open), (close
    key, close), high, low, n — then one (type, day)-keyed fold picks
    the globally earliest/latest partials (argmin/argmax are mergeable
    because the key rides with the value).  Rows moved = partials, not
    events.  Parity: keys are exact integer (epoch-us, event_id) pairs;
    open/close/high/low are EXACT copies of stored float64 values (no
    arithmetic, no rounding grid anywhere)."""
    from .common import task_hash_exchange, bucket_of

    ds = load(sf_dir, "events", ["event_id", "ts", "event_type", "value"])

    def partials(df: pd.DataFrame) -> pd.DataFrame:
        d = pd.DataFrame({
            "event_type": df["event_type"].to_numpy(object),
            "tu": _ts_us(df["ts"]),
            "eid": df["event_id"].to_numpy(np.int64),
            "value": df["value"].to_numpy(np.float64)})
        d["day"] = d["tu"] // _US_PER_DAY_OHLC
        d = d.sort_values(["event_type", "day", "tu", "eid"])
        g = d.groupby(["event_type", "day"], sort=False)
        out = g.agg(otu=("tu", "first"), oeid=("eid", "first"),
                    open=("value", "first"), ctu=("tu", "last"),
                    ceid=("eid", "last"), close=("value", "last"),
                    high=("value", "max"), low=("value", "min"),
                    n=("value", "size")).reset_index()
        out["n"] = out["n"].astype(np.int64)
        return out

    parts = ds.map_batches(partials, batch_format="pandas")

    def key_of(df: pd.DataFrame) -> np.ndarray:
        return bucket_of(df["event_type"].astype(str) + "|"
                         + df["day"].astype(str), num_buckets)

    out = task_hash_exchange(parts, key_of, _ohlc_fold, num_buckets,
                             key_cols=["event_type", "day"]).to_pandas()
    return (out.sort_values(["event_type", "day"])
            .reset_index(drop=True))


def _ohlc_fold(g: pd.DataFrame) -> pd.DataFrame:
    """Merge candle PARTIALS within one (type, day) bucket: open = the
    partial with the globally smallest (otu, oeid), close = the largest
    (ctu, ceid), high/low/n fold componentwise.  Module-level so the
    cross-partial merge is unit-testable in isolation (a single-block
    test input never exercises it end to end)."""
    cols = {"event_type": object, "day": np.int64, "open": np.float64,
            "high": np.float64, "low": np.float64,
            "close": np.float64, "n": np.int64}
    if not len(g):
        return pd.DataFrame({c: pd.Series([], dtype=t)
                             for c, t in cols.items()})
    keys = ["event_type", "day"]
    first = (g.sort_values(keys + ["otu", "oeid"])
             .drop_duplicates(keys))[keys + ["open"]]
    last = (g.sort_values(keys + ["ctu", "ceid"],
                          ascending=[True, True, False, False])
            .drop_duplicates(keys))[keys + ["close"]]
    hl = g.groupby(keys, sort=False).agg(
        high=("high", "max"), low=("low", "min"),
        n=("n", "sum")).reset_index()
    out = first.merge(last, on=keys).merge(hl, on=keys)
    out["n"] = out["n"].astype(np.int64)
    return out[list(cols)]


def type_daily_ohlc_sql() -> str:
    """DuckDB oracle: double row_number windows over the identical
    (epoch-us, event_id) order; values are exact stored float64 copies."""
    return f"""
        WITH e AS (
            SELECT event_type, epoch_us(ts) // {_US_PER_DAY_OHLC} AS day,
                   epoch_us(ts) AS tu, event_id, value
            FROM events
        ),
        r AS (
            SELECT *,
                   row_number() OVER (PARTITION BY event_type, day
                                      ORDER BY tu, event_id) AS ra,
                   row_number() OVER (PARTITION BY event_type, day
                                      ORDER BY tu DESC, event_id DESC) AS rd
            FROM e
        )
        SELECT event_type, CAST(day AS BIGINT) AS day,
               max(CASE WHEN ra = 1 THEN value END) AS open,
               max(value) AS high, min(value) AS low,
               max(CASE WHEN rd = 1 THEN value END) AS close,
               count(*)::BIGINT AS n
        FROM r GROUP BY event_type, day
    """


EWMA_MAX_DAYS = 900   # 2^i weights overflow float64 at ~1015 days


def type_daily_ewma(sf_dir: str, num_buckets: int = 16) -> pd.DataFrame:
    """EXPONENTIALLY-WEIGHTED MOVING AVERAGE of daily value totals per
    event type with alpha = 1/2 — the time-series smoother every
    monitoring stack runs, expressed so both engines compute it
    IDENTICALLY: with a dyadic alpha the recursion
    ewma_d = (x_d + ewma_{d-1}) / 2, ewma_0 = x_0 has the closed form
    ewma_d = (x_0 + sum_{i=1..d} x_i * 2^(i-1)) / 2^d over the type's
    observed-day sequence, i.e. one cumulative weighted sum — no
    state-carrying loop, so the oracle is a plain window expression.

    Scale shape: daily totals reduce from count/sum partials (the only
    pass over events); the cumulative fold runs on the tiny
    (type x day) table driver-side.

    Guard: the 2^i weights overflow float64 past ~1015 observed days per
    type, where BOTH engines would silently emit inf/NaN garbage — the
    fold raises loudly instead (the bpe_sql max_word_len precedent) and
    the oracle carries the same error() guard."""
    from .common import sql_round

    def prep(b: pd.DataFrame) -> pd.DataFrame:
        return b.assign(day=b["ts"].dt.floor("D"))

    daily = partial_groupby(
        load(sf_dir, "events", ["event_type", "ts", "value"]),
        ["event_type", "day"], {"daily_value": ("value", "sum")},
        prep=prep, many_groups=True, num_buckets=num_buckets,
    ).to_pandas().sort_values(["event_type", "day"]).reset_index(drop=True)

    out = []
    for t, g in daily.groupby("event_type", sort=True):
        if len(g) >= EWMA_MAX_DAYS:
            raise ValueError(
                f"type_daily_ewma: {len(g)} observed days for {t!r} — the "
                f"2^i closed form overflows float64 past {EWMA_MAX_DAYS}; "
                "window the input or switch to the banded form")
        x = g["daily_value"].to_numpy(np.float64)
        # integer-cents grid (half AWAY FROM ZERO, matching SQL round).
        # EXACTNESS CAVEAT: xc * 2^(i-1) stays an exactly-representable
        # integer only while it is < 2^53 — with ~1e8-cent daily sums
        # that holds for roughly the first 25-30 observed days per type.
        # Past that, both engines evaluate the SAME left-to-right
        # float64 fold (numpy cumsum here, DuckDB's sequential window
        # running sum there), so parity rests on identical association
        # order under the 4 dp output grid rather than on integer
        # exactness.  The EWMA_MAX_DAYS guard above covers outright
        # float64 OVERFLOW (~2^1024), not this exactness boundary.
        xc = np.sign(x) * np.floor(np.abs(x) * 100.0 + 0.5)
        d = np.arange(len(x), dtype=np.float64)
        w = np.where(d == 0, 1.0, 2.0 ** (d - 1.0))
        ewma = np.cumsum(xc * w) / 2.0 ** d / 100.0
        out.append(g.assign(ewma=ewma))
    res = pd.concat(out, ignore_index=True)
    return pd.DataFrame({
        "event_type": res["event_type"].to_numpy(object),
        "day": res["day"],
        "daily_value": sql_round(res["daily_value"].to_numpy(), 2),
        "ewma": sql_round(res["ewma"].to_numpy(), 4)})


def type_daily_ewma_sql() -> str:
    """Oracle: the identical closed form — cumulative sum of
    x * 2^(i-1) (x for the first observed day) over the per-type day
    order, divided by 2^i — with the same loud overflow guard."""
    return f"""
        WITH d AS (
            SELECT event_type, date_trunc('day', ts) AS day,
                   sum(value) AS x
            FROM events GROUP BY 1, 2
        ),
        guard AS (
            SELECT CASE WHEN max(cnt) >= {EWMA_MAX_DAYS}
                        THEN CAST(error('type_daily_ewma: 2^i weights '
                                        || 'overflow float64') AS INT)
                        ELSE 1 END AS chk
            FROM (SELECT count(*) AS cnt FROM d GROUP BY event_type)
        ),
        r AS (
            SELECT event_type, day, x,
                   row_number() OVER (PARTITION BY event_type
                                      ORDER BY day) - 1 AS i
            FROM d WHERE (SELECT chk FROM guard) = 1
        )
        SELECT event_type, day, round(x, 2) AS daily_value,
               round(sum(round(x * 100.0, 0) * CASE WHEN i = 0 THEN 1.0
                                  ELSE power(2.0, i - 1) END)
                         OVER (PARTITION BY event_type ORDER BY i
                               ROWS BETWEEN UNBOUNDED PRECEDING
                               AND CURRENT ROW)
                     / power(2.0, i) / 100.0, 4) AS ewma
        FROM r
    """


def daily_distinct_users_3d(sf_dir: str, window_days: int = 3,
                            num_buckets: int = 16) -> pd.DataFrame:
    """SLIDING-WINDOW COUNT DISTINCT: for every day, the number of
    distinct users active in the trailing ``window_days`` window — the
    rolling-MAU/DAU family, which is NOT a sum of daily distincts
    (users repeat across days) and so needs its own exchange shape:
    dedup (user, day) pairs, replicate each pair to the windows it can
    serve (the window-END days d..d+w-1 — bounded fan-out w, the
    standard sliding-window trick), dedup (user, window) because a user
    active on several days of one window must count once, then count
    rows per window.  Windows whose end day is outside the observed
    day range are dropped on both engines.

    Scale shape: three bucketed exchanges, each moving one row per
    (user, day-or-window) pair — never raw events past the first
    partial; the w-way replication happens AFTER the first dedup, so
    fan-out applies to the deduped pair count, not the stream."""
    ds = load(sf_dir, "events", ["user_id", "ts"])

    def prep(b: pd.DataFrame) -> pd.DataFrame:
        return b.assign(day=b["ts"].dt.floor("D"))

    ud = partial_groupby(ds, ["user_id", "day"], {"n": ("user_id", "count")},
                         prep=prep, many_groups=True,
                         num_buckets=num_buckets)

    def explode(b: pd.DataFrame) -> pd.DataFrame:
        outs = []
        for i in range(window_days):
            outs.append(pd.DataFrame({
                "user_id": b["user_id"].to_numpy(np.int64),
                "wend": b["day"] + pd.Timedelta(days=i)}))
        return pd.concat(outs, ignore_index=True)

    uw = partial_groupby(
        ud.map_batches(explode, batch_format="pandas"),
        ["user_id", "wend"], {"n": ("user_id", "count")},
        many_groups=True, num_buckets=num_buckets)

    per_day = partial_groupby(
        uw, ["wend"], {"distinct_users": ("user_id", "count")},
        many_groups=True, num_buckets=num_buckets).to_pandas()

    # observed-day bounds from the tiny per-day table of the FIRST dedup
    days = partial_groupby(ud, ["day"], {"n": ("n", "sum")}).to_pandas()
    lo, hi = days["day"].min(), days["day"].max()
    out = per_day[(per_day["wend"] >= lo) & (per_day["wend"] <= hi)]
    return (pd.DataFrame({
        "day": out["wend"],
        "distinct_users_3d": out["distinct_users"].to_numpy(np.int64)})
        .sort_values("day").reset_index(drop=True))


def daily_distinct_users_3d_sql(window_days: int = 3) -> str:
    offs = ", ".join(str(i) for i in range(window_days))
    return f"""
        WITH ud AS (
            SELECT DISTINCT user_id, date_trunc('day', ts) AS day
            FROM events
        ),
        w AS (
            SELECT DISTINCT user_id,
                   day + to_days(CAST(t.i AS INTEGER)) AS wend
            FROM ud, UNNEST([{offs}]) t(i)
        ),
        lim AS (SELECT min(day) AS lo, max(day) AS hi FROM ud)
        SELECT w.wend AS day, count(*)::BIGINT AS distinct_users_3d
        FROM w, lim WHERE w.wend BETWEEN lim.lo AND lim.hi
        GROUP BY 1
    """


CUSUM_K_CENTS = 0     # drift allowance k in cents (0: plain deviation sum)


def daily_cusum_drift(sf_dir: str, num_buckets: int = 16) -> pd.DataFrame:
    """ONE-SIDED CUSUM change-point statistic over each event type's
    daily mean value — the classic S_t = max(0, S_{t-1} + (x_t - mu))
    monitor, computed WITHOUT the stateful recursion via the prefix-sum
    identity S_t = P_t - min_{i<=t} P_i (P = running sum of deviations):
    a cumulative sum and a running min are both single window
    expressions, so the oracle needs no unrolled loop and the engine no
    sequential fold.  mu is the type's own full-period mean, so S peaks
    where the daily means run persistently hot — the alarm day is
    argmax(S).  Deviations are computed on the integer-cents grid
    (the type_daily_ewma precedent) so every prefix value is exact in
    float64 on both engines.

    Scale shape: one (type, day) count/sum partial pass; the window
    fold runs on the tiny daily table driver-side."""
    from .common import sql_round

    def prep(b: pd.DataFrame) -> pd.DataFrame:
        # per-row integer cents (values sit on the cents grid, so the
        # row-wise rounding is exact): every aggregate below is integer
        return b.assign(day=b["ts"].dt.floor("D"),
                        cents=np.floor(b["value"].to_numpy(np.float64)
                                       * 100.0 + 0.5).astype(np.int64))

    daily = partial_groupby(
        load(sf_dir, "events", ["event_type", "ts", "value"]),
        ["event_type", "day"],
        {"sc": ("cents", "sum"), "n": ("cents", "count")},
        prep=prep, many_groups=True, num_buckets=num_buckets,
    ).to_pandas().sort_values(["event_type", "day"]).reset_index(drop=True)

    out = []
    for _t, g in daily.groupby("event_type", sort=True):
        sc = g["sc"].to_numpy(np.float64)        # exact integer cents
        n = g["n"].to_numpy(np.float64)
        mc = np.floor(sc / n + 0.5)              # daily mean, cents grid
        mu = np.floor(mc.sum() / len(mc) + 0.5)  # grand mean of means
        dev = mc - mu - CUSUM_K_CENTS
        p = np.cumsum(dev)
        # S_t = P_t - min(0, P_1..P_t): the CUSUM recursion unrolled
        m = np.minimum.accumulate(np.concatenate([[0.0], p]))[1:]
        out.append(g.assign(cusum_cents=p - m))
    res = pd.concat(out, ignore_index=True)
    return pd.DataFrame({
        "event_type": res["event_type"].to_numpy(object),
        "day": res["day"],
        "daily_mean": sql_round(res["sc"].to_numpy(np.float64)
                                / res["n"].to_numpy(np.float64) / 100.0, 4),
        "cusum_cents": res["cusum_cents"].to_numpy(np.float64)})


def daily_cusum_drift_sql() -> str:
    """Oracle: the identical cents grid and the prefix-sum identity —
    cumulative sum and running least(0, min(P)) window expressions."""
    return f"""
        WITH d AS (
            SELECT event_type, date_trunc('day', ts) AS day,
                   sum(round(value * 100.0, 0))::BIGINT AS sc,
                   count(*)::BIGINT AS n
            FROM events GROUP BY 1, 2
        ),
        m AS (
            SELECT event_type, day, sc, n,
                   round(sc::DOUBLE / n, 0) AS mc
            FROM d
        ),
        g AS (
            SELECT event_type, round(avg(mc), 0) AS mu FROM m
            GROUP BY event_type
        ),
        p AS (
            SELECT m.event_type, m.day, m.sc, m.n,
                   sum(m.mc - g.mu - {CUSUM_K_CENTS}) OVER (PARTITION BY m.event_type
                       ORDER BY m.day ROWS BETWEEN UNBOUNDED PRECEDING
                       AND CURRENT ROW) AS pf
            FROM m JOIN g USING (event_type)
        )
        SELECT event_type, day,
               round(sc::DOUBLE / n / 100.0, 4) AS daily_mean,
               pf - least(0.0, min(pf) OVER (PARTITION BY event_type
                       ORDER BY day ROWS BETWEEN UNBOUNDED PRECEDING
                       AND CURRENT ROW)) AS cusum_cents
        FROM p
    """


HAAR_LEN = 32   # padded series length (5 levels)
HAAR_K = 8      # kept coefficients


def daily_haar_synopsis(sf_dir: str, k: int = HAAR_K,
                        num_buckets: int = 16) -> pd.DataFrame:
    """HAAR-WAVELET SYNOPSIS of the daily value series (Matias, Vitter &
    Wang 1998) — the approximate-query structure that answers range sums
    from a handful of coefficients: the 30-day total-cents series pads
    to 32, transforms with the unnormalized Haar pairs
    (avg=(a+b)/2, diff=(a-b)/2), keeps the top-``k`` coefficients by
    (|coef| desc, level, idx) plus the scaling coefficient, and reports
    the reconstruction's max-abs error as the in-row quality
    certificate.  Every value is integer cents divided by powers of two
    — exact dyadic doubles on both engines, so parity needs NO rounding
    grid at all.

    Scale shape: the only data pass is the (day) cents-sum reduce; the
    transform folds on the 32-value driver table."""
    def prep(b: pd.DataFrame) -> pd.DataFrame:
        return b.assign(day=b["ts"].dt.floor("D"),
                        cents=np.floor(b["value"].to_numpy(np.float64)
                                       * 100.0 + 0.5).astype(np.int64))

    daily = partial_groupby(
        load(sf_dir, "events", ["ts", "value"]), ["day"],
        {"sc": ("cents", "sum")}, prep=prep, many_groups=True,
        num_buckets=num_buckets).to_pandas().sort_values("day")

    v = np.zeros(HAAR_LEN, dtype=np.float64)
    v[:len(daily)] = daily["sc"].to_numpy(np.int64)[:HAAR_LEN]

    coeffs = []      # (level, idx, coef)
    cur = v.copy()
    level = 0
    while len(cur) > 1:
        level += 1
        a, b = cur[0::2], cur[1::2]
        diff = (a - b) / 2.0
        cur = (a + b) / 2.0
        for i, c in enumerate(diff):
            coeffs.append((level, i, float(c)))
    scaling = float(cur[0])

    ranked = sorted(coeffs, key=lambda t: (-abs(t[2]), t[0], t[1]))
    kept = {(lv, i): c for lv, i, c in ranked[:k]}

    # reconstruct from the kept coefficients + scaling
    rec = np.array([scaling])
    for lv in range(level, 0, -1):
        nxt = np.zeros(2 * len(rec))
        for i, av in enumerate(rec):
            d = kept.get((lv, i), 0.0)
            nxt[2 * i] = av + d
            nxt[2 * i + 1] = av - d
        rec = nxt
    max_err = float(np.abs(v - rec).max())

    rows = [(0, 0, scaling)] + [(lv, i, c) for lv, i, c in ranked[:k]]
    out = pd.DataFrame(rows, columns=["level", "idx", "coef"])
    return pd.DataFrame({
        "level": out["level"].astype(np.int64),
        "idx": out["idx"].astype(np.int64),
        "coef": out["coef"].astype(np.float64),
        "max_abs_err": np.full(len(out), max_err),
        "n_days": np.full(len(out), np.int64(len(daily)))})


def daily_haar_synopsis_sql(k: int = HAAR_K) -> str:
    """Oracle: 5 unrolled transform levels, top-k by (|coef|, level,
    idx), 5 unrolled reconstruction levels, exact-dyadic error."""
    levels = 5
    parts = [f"""
        WITH d AS (
            SELECT date_trunc('day', ts) AS day,
                   sum(round(value * 100.0, 0))::DOUBLE AS sc
            FROM events GROUP BY 1
        ),
        r AS (SELECT sc, row_number() OVER (ORDER BY day) - 1 AS i FROM d),
        s0 AS MATERIALIZED (
            SELECT g.range AS i, coalesce(r.sc, 0.0) AS v
            FROM range(0, {HAAR_LEN}) g LEFT JOIN r ON r.i = g.range
        )"""]
    for l in range(1, levels + 1):
        parts.append(f""",
        s{l} AS MATERIALIZED (
            SELECT a.i // 2 AS i, (a.v + b.v) / 2.0 AS v
            FROM s{l - 1} a JOIN s{l - 1} b
                 ON b.i = a.i + 1 AND a.i % 2 = 0
        ),
        d{l} AS MATERIALIZED (
            SELECT a.i // 2 AS i, (a.v - b.v) / 2.0 AS v
            FROM s{l - 1} a JOIN s{l - 1} b
                 ON b.i = a.i + 1 AND a.i % 2 = 0
        )""")
    coef_union = " UNION ALL ".join(
        f"SELECT {l}::BIGINT AS level, i::BIGINT AS idx, v AS coef "
        f"FROM d{l}" for l in range(1, levels + 1))
    parts.append(f""",
        allc AS MATERIALIZED ({coef_union}),
        kept AS MATERIALIZED (
            SELECT level, idx, coef FROM allc
            ORDER BY abs(coef) DESC, level, idx LIMIT {k}
        ),
        r{levels} AS MATERIALIZED (SELECT 0::BIGINT AS i, v FROM s{levels})""")
    for l in range(levels, 0, -1):
        parts.append(f""",
        r{l - 1} AS MATERIALIZED (
            SELECT 2 * r.i + CASE WHEN up.s = 1 THEN 0 ELSE 1 END AS i,
                   r.v + CASE WHEN up.s = 1 THEN 1 ELSE -1 END
                       * coalesce(kd.coef, 0.0) AS v
            FROM r{l} r
            CROSS JOIN (SELECT 1 AS s UNION ALL SELECT 0) up
            LEFT JOIN kept kd ON kd.level = {l} AND kd.idx = r.i
        )""")
    parts.append(f""",
        err AS (SELECT max(abs(s0.v - r0.v)) AS e
                FROM s0 JOIN r0 ON r0.i = s0.i)
        SELECT level, idx, coef,
               (SELECT e FROM err) AS max_abs_err,
               (SELECT count(*) FROM d)::BIGINT AS n_days
        FROM (SELECT 0::BIGINT AS level, 0::BIGINT AS idx,
                     (SELECT v FROM s{levels}) AS coef
              UNION ALL SELECT level, idx, coef FROM kept)""")
    return "".join(parts)


def daily_user_churn(sf_dir: str, num_buckets: int = 16) -> pd.DataFrame:
    """CONSECUTIVE-DAY USER OVERLAP: for each adjacent day pair, the
    returning / new / churned user counts and the Jaccard of the two
    active sets — the day-over-day stickiness curve (cohort_retention
    tracks absolute day-0 cohorts; this tracks the rolling boundary).
    A user's (day, next-day) membership pair reduces from the SAME
    distinct (user, day) exchange as the rolling-distinct operator:
    replicate each pair to (day) and (day - 1) keys, so one grouped
    count yields |A|, |B| and the intersection without a self-join.

    All counts integers; Jaccard is one rounded division."""
    from .common import sql_round

    ds = load(sf_dir, "events", ["user_id", "ts"])

    def prep(b: pd.DataFrame) -> pd.DataFrame:
        return b.assign(day=b["ts"].dt.floor("D"))

    ud = partial_groupby(ds, ["user_id", "day"],
                         {"n": ("user_id", "count")}, prep=prep,
                         many_groups=True, num_buckets=num_buckets)

    def tag(b: pd.DataFrame) -> pd.DataFrame:
        # pair key = the EARLIER day of the (d, d+1) boundary:
        # a (user, d) row serves boundary d (as side A) and boundary
        # d-1 (as side B)
        u = b["user_id"].to_numpy(np.int64)
        d = b["day"]
        return pd.concat([
            pd.DataFrame({"user_id": u, "bnd": d, "a": np.int64(1),
                          "b": np.int64(0)}),
            pd.DataFrame({"user_id": u, "bnd": d - pd.Timedelta(days=1),
                          "a": np.int64(0), "b": np.int64(1)}),
        ], ignore_index=True)

    flags = partial_groupby(
        ud.map_batches(tag, batch_format="pandas"),
        ["user_id", "bnd"], {"a": ("a", "max"), "b": ("b", "max")},
        many_groups=True, num_buckets=num_buckets)

    per_bnd = partial_groupby(
        flags, ["bnd"],
        {"n_a": ("a", "sum"), "n_b": ("b", "sum"),
         "n_both": ("both", "sum")},
        prep=lambda f: f.assign(both=(f["a"] & f["b"]).astype(np.int64)),
        many_groups=True, num_buckets=num_buckets).to_pandas()

    # keep only boundaries where BOTH days exist in the data
    days = partial_groupby(ud, ["day"], {"n": ("n", "sum")}).to_pandas()
    have = set(days["day"])
    m = per_bnd[per_bnd["bnd"].isin(have)
                & (per_bnd["bnd"] + pd.Timedelta(days=1)).isin(have)]
    m = m.sort_values("bnd").reset_index(drop=True)
    na = m["n_a"].to_numpy(np.int64)
    nb = m["n_b"].to_numpy(np.int64)
    nboth = m["n_both"].to_numpy(np.int64)
    union = na + nb - nboth
    return pd.DataFrame({
        "day": m["bnd"],
        "n_active": na, "n_next": nb, "n_returning": nboth,
        "n_churned": na - nboth, "n_new": nb - nboth,
        "jaccard": sql_round(nboth / union.astype(np.float64), 4)})


def daily_user_churn_sql() -> str:
    return """
        WITH ud AS (
            SELECT DISTINCT user_id, date_trunc('day', ts) AS day
            FROM events
        ),
        cnt AS (SELECT day, count(*)::BIGINT AS n FROM ud GROUP BY day),
        inter AS (
            SELECT a.day, count(*)::BIGINT AS n_ret
            FROM ud a JOIN ud n ON n.user_id = a.user_id
                              AND n.day = a.day + INTERVAL 1 DAY
            GROUP BY a.day
        ),
        b AS (
            SELECT c0.day, c0.n AS n_active, c1.n AS n_next,
                   coalesce(i.n_ret, 0) AS n_returning
            FROM cnt c0
            JOIN cnt c1 ON c1.day = c0.day + INTERVAL 1 DAY
            LEFT JOIN inter i ON i.day = c0.day
        )
        SELECT day, n_active, n_next, n_returning,
               n_active - n_returning AS n_churned,
               n_next - n_returning AS n_new,
               round(n_returning::DOUBLE
                     / (n_active + n_next - n_returning), 4) AS jaccard
        FROM b
    """


ACF_MAX_LAG = 7


def daily_value_acf(sf_dir: str, max_lag: int = ACF_MAX_LAG,
                    num_buckets: int = 16) -> pd.DataFrame:
    """AUTOCORRELATION FUNCTION of the daily total-value series at lags
    1..``max_lag`` — the periodicity detector (a weekly cycle spikes
    lag 7) every capacity planner runs before fitting seasonality.
    r_k = sum (x_t - mu)(x_{t+k} - mu) / sum (x_t - mu)^2 over the
    observed-day sequence, computed on the integer-cents grid: mu
    rounds to whole cents so deviations are EXACT integers, and both
    engines cast them to float64 BEFORE the lag products (the PMI
    rule), making every product bit-identical; the ratio rounds 6 dp.

    Scale shape: one (day) cents-sum reduce; the lag fold runs on the
    ~30-row driver series."""
    from .common import sql_round

    def prep(b: pd.DataFrame) -> pd.DataFrame:
        return b.assign(day=b["ts"].dt.floor("D"),
                        cents=np.floor(b["value"].to_numpy(np.float64)
                                       * 100.0 + 0.5).astype(np.int64))

    daily = partial_groupby(
        load(sf_dir, "events", ["ts", "value"]), ["day"],
        {"sc": ("cents", "sum")}, prep=prep, many_groups=True,
        num_buckets=num_buckets).to_pandas().sort_values("day")

    x = daily["sc"].to_numpy(np.int64).astype(np.float64)
    n = len(x)
    mu = np.floor(x.sum() / n + 0.5)       # grand mean, cents grid
    d = x - mu                              # exact integers in float64
    den = float((d * d).sum())
    rows = []
    for k in range(1, max_lag + 1):
        num = float((d[:-k] * d[k:]).sum()) if k < n else 0.0
        rows.append((k, float(sql_round(num / den, 6))
                     if den else 0.0))
    return pd.DataFrame(rows, columns=["lag", "acf"]).astype(
        {"lag": np.int64})


def daily_value_acf_sql(max_lag: int = ACF_MAX_LAG) -> str:
    return f"""
        WITH d AS (
            SELECT date_trunc('day', ts) AS day,
                   sum(round(value * 100.0, 0))::BIGINT AS sc
            FROM events GROUP BY 1
        ),
        r AS (SELECT sc::DOUBLE AS x,
                     row_number() OVER (ORDER BY day) AS i
              FROM d),
        m AS (SELECT round(sum(x) / count(*), 0) AS mu FROM r),
        dev AS (SELECT i, x - (SELECT mu FROM m) AS dv FROM r),
        den AS (SELECT sum(dv * dv) AS s FROM dev),
        lags AS (SELECT range AS k FROM range(1, {max_lag + 1}))
        SELECT k::BIGINT AS lag,
               CASE WHEN (SELECT s FROM den) = 0 THEN 0.0
                    ELSE round(coalesce((
                        SELECT sum(a.dv * b.dv)
                        FROM dev a JOIN dev b ON b.i = a.i + lags.k), 0.0)
                        / (SELECT s FROM den), 6)
               END AS acf
        FROM lags
    """


def purchase_survival_km(sf_dir: str, num_buckets: int = 16) -> pd.DataFrame:
    """KAPLAN-MEIER product-limit estimator over inter-purchase gaps —
    survival analysis, the right tool for "how long until a user buys
    again" because the LAST gap of every user is right-CENSORED (they
    haven't bought again YET) and naive averages over observed gaps are
    biased low.  Gap unit = whole days (floor); event times are the
    distinct uncensored gap lengths; S(t) steps by (1 - d_t/n_t) with
    n_t = subjects with gap >= t (censored included until they drop
    out).  The survival curve folds as exp(cumulative sum of
    ln(1 - d/n)) — one window expression, no recursion — on integer
    (events, at-risk) counts, so parity is the usual ulps-under-6dp.

    Scale shape: per-user gap extraction is one user-keyed exchange;
    the curve folds on the tiny distinct-gap table."""
    from .common import keyed_map_groups, sql_round

    ds = load(sf_dir, "events", ["user_id", "ts", "event_type"])

    def keep(b: pd.DataFrame) -> pd.DataFrame:
        return b[b["event_type"] == "purchase"]

    def gaps(g: pd.DataFrame) -> pd.DataFrame:
        rows_g, rows_c = [], []
        for _u, grp in g.groupby("user_id", sort=False):
            t = np.sort(grp["ts"].to_numpy().astype("datetime64[us]"))
            if len(t) < 2:
                continue      # single-purchase users carry no gap info
            # CALENDAR-day boundary counts (DuckDB date_diff('day')
            # semantics), not elapsed-24h floors
            days = t.astype("datetime64[D]").astype(np.int64)
            rows_g.extend((days[1:] - days[:-1]).tolist())
            # censored tail at the user's mean observed gap (their next
            # gap is at least underway) — integer division both engines
            rows_c.append(int((days[-1] - days[0]) // (len(t) - 1)))
        return pd.DataFrame({
            "gap": pd.Series(rows_g + rows_c, dtype=np.int64),
            "censored": pd.Series([0] * len(rows_g) + [1] * len(rows_c),
                                  dtype=np.int64)})

    obs = keyed_map_groups(ds.map_batches(keep, batch_format="pandas"),
                           "user_id", gaps, num_buckets)
    c = partial_groupby(obs, ["gap", "censored"],
                        {"n": ("gap", "count")}, many_groups=True,
                        num_buckets=8).to_pandas()
    tbl = (c.pivot_table(index="gap", columns="censored", values="n",
                         fill_value=0, aggfunc="sum")
           .reindex(columns=[0, 1], fill_value=0).sort_index())
    d = tbl[0].to_numpy(np.int64)       # events per gap length
    cens = tbl[1].to_numpy(np.int64)
    total = int(d.sum() + cens.sum())
    # at-risk BEFORE each time: total minus everything that left earlier
    left = np.concatenate([[0], np.cumsum(d + cens)[:-1]])
    n_at = total - left
    mask = d > 0
    g = tbl.index.to_numpy(np.int64)[mask]
    dd = d[mask].astype(np.float64)
    nn = n_at[mask].astype(np.float64)
    # the terminal time can absorb ALL remaining at-risk subjects:
    # survival is exactly 0 from there on (ln(0) guarded on both sides)
    term = np.where(dd < nn, np.log(np.where(dd < nn, 1.0 - dd / nn,
                                             1.0)), 0.0)
    zero = np.maximum.accumulate((dd >= nn).astype(np.int64))
    s = np.where(zero == 1, 0.0, np.exp(np.cumsum(term)))
    return pd.DataFrame({
        "gap_days": g,
        "n_events": d[mask],
        "n_at_risk": n_at[mask],
        "survival": sql_round(s, 6)})


def purchase_survival_km_sql() -> str:
    return """
        WITH p AS (
            SELECT user_id, ts FROM events WHERE event_type = 'purchase'
        ),
        o AS (
            SELECT user_id, ts,
                   lead(ts) OVER (PARTITION BY user_id ORDER BY ts)
                       AS nxt,
                   count(*) OVER (PARTITION BY user_id) AS np_,
                   min(ts) OVER (PARTITION BY user_id) AS t0,
                   max(ts) OVER (PARTITION BY user_id) AS t1
            FROM p
        ),
        g AS (
            SELECT CAST(date_diff('day', ts, nxt) AS BIGINT) AS gap,
                   0 AS censored
            FROM o WHERE nxt IS NOT NULL
            UNION ALL
            SELECT CAST(date_diff('day', t0, t1)
                        // (np_ - 1) AS BIGINT), 1
            FROM (SELECT DISTINCT user_id, t0, t1, np_
                  FROM o WHERE np_ >= 2)
        ),
        agg AS (
            SELECT gap, sum(CASE WHEN censored = 0 THEN 1 ELSE 0 END)
                            ::BIGINT AS d,
                   sum(censored)::BIGINT AS c
            FROM g GROUP BY gap
        ),
        r AS (
            SELECT gap, d, c,
                   (SELECT sum(d + c) FROM agg)
                   - coalesce(sum(d + c) OVER (ORDER BY gap
                         ROWS BETWEEN UNBOUNDED PRECEDING
                         AND 1 PRECEDING), 0) AS n_at
            FROM agg
        )
        SELECT gap AS gap_days, d AS n_events, n_at::BIGINT AS n_at_risk,
               CASE WHEN max(CASE WHEN d >= n_at THEN 1 ELSE 0 END)
                        OVER w = 1 THEN 0.0
                    ELSE round(exp(sum(CASE WHEN d < n_at
                             THEN ln(1.0 - d::DOUBLE / n_at)
                             ELSE 0.0 END) OVER w), 6)
               END AS survival
        FROM r WHERE d > 0
        WINDOW w AS (ORDER BY gap ROWS BETWEEN UNBOUNDED PRECEDING
                     AND CURRENT ROW)
    """


FB_SEASON = 7   # seasonal-naive lag (weekly)


def daily_forecast_backtest(sf_dir: str, season: int = FB_SEASON,
                            num_buckets: int = 16) -> pd.DataFrame:
    """FORECAST BACKTEST of the two no-parameter baselines every
    forecasting effort must beat: NAIVE (predict today = yesterday) and
    SEASONAL-NAIVE (today = same weekday last week) over the daily
    total-cents series, scored by MAE and the winner flagged per the
    standard protocol (evaluate only days where BOTH forecasts exist).
    Errors are integer cents, so MAE is one division and the comparison
    is exact — if your model can't beat the winning column here it is
    not a model.

    Scale shape: one (day) cents reduce; the lag fold runs on the
    ~30-row series driver-side."""
    from .common import sql_round

    def prep(b: pd.DataFrame) -> pd.DataFrame:
        return b.assign(day=b["ts"].dt.floor("D"),
                        cents=np.floor(b["value"].to_numpy(np.float64)
                                       * 100.0 + 0.5).astype(np.int64))

    daily = partial_groupby(
        load(sf_dir, "events", ["ts", "value"]), ["day"],
        {"sc": ("cents", "sum")}, prep=prep, many_groups=True,
        num_buckets=num_buckets).to_pandas().sort_values("day")

    x = daily["sc"].to_numpy(np.int64)
    n = len(x)
    if n <= season:
        return pd.DataFrame({
            "n_days_scored": [np.int64(0)],
            "mae_naive": [0.0], "mae_seasonal": [0.0],
            "winner": ["insufficient_data"]})
    e1 = np.abs(x[season:] - x[season - 1:-1])   # naive: lag 1
    e7 = np.abs(x[season:] - x[:-season])        # seasonal: lag 7
    m = len(e1)
    mae1 = float(sql_round(int(e1.sum()) / m / 100.0, 4))
    mae7 = float(sql_round(int(e7.sum()) / m / 100.0, 4))
    return pd.DataFrame({
        "n_days_scored": [np.int64(m)],
        "mae_naive": [mae1],
        "mae_seasonal": [mae7],
        "winner": ["seasonal" if mae7 < mae1
                   else ("naive" if mae1 < mae7 else "tie")]})


def daily_forecast_backtest_sql(season: int = FB_SEASON) -> str:
    return f"""
        WITH d AS (
            SELECT date_trunc('day', ts) AS day,
                   sum(round(value * 100.0, 0))::BIGINT AS sc
            FROM events GROUP BY 1
        ),
        r AS (
            SELECT sc,
                   lag(sc, 1) OVER (ORDER BY day) AS l1,
                   lag(sc, {season}) OVER (ORDER BY day) AS l7
            FROM d
        ),
        s AS (
            SELECT count(*)::BIGINT AS m,
                   sum(abs(sc - l1))::BIGINT AS e1,
                   sum(abs(sc - l7))::BIGINT AS e7
            FROM r WHERE l7 IS NOT NULL
        )
        SELECT coalesce(m, 0) AS n_days_scored,
               CASE WHEN coalesce(m, 0) = 0 THEN 0.0
                    ELSE round(e1 / m / 100.0, 4) END AS mae_naive,
               CASE WHEN coalesce(m, 0) = 0 THEN 0.0
                    ELSE round(e7 / m / 100.0, 4) END AS mae_seasonal,
               CASE WHEN coalesce(m, 0) = 0 THEN 'insufficient_data'
                    WHEN round(e7 / m / 100.0, 4)
                        < round(e1 / m / 100.0, 4) THEN 'seasonal'
                    WHEN round(e1 / m / 100.0, 4)
                        < round(e7 / m / 100.0, 4) THEN 'naive'
                    ELSE 'tie' END AS winner
        FROM s
    """


KB_GAMMA = 1.0    # 0->1 transition cost multiplier (Kleinberg's gamma)
KB_RATE_MULT = 2.0  # burst-state rate = min(mult * base rate, 0.99)


def purchase_burst_states(sf_dir: str, num_buckets: int = 16) -> pd.DataFrame:
    """KLEINBERG BURST DETECTION (Kleinberg, KDD 2002; the 2-state
    batched automaton): label each day 'burst' or 'base' for the
    purchase share of traffic by the minimum-cost state sequence —
    burstiness with HYSTERESIS, unlike per-day thresholds which flap.
    State s emits day t at cost -[r ln p_s + (n - r) ln(1 - p_s)]
    (r = purchases, n = events; the binomial constant cancels between
    states); entering the burst state costs gamma * ln(T).  The Viterbi
    DP is deterministic: both engines fold identical expression trees,
    ties break to the base state, and the oracle unrolls the recursion
    one CTE per day with scalar-subquery backtracking (the voptimal
    pattern on a time axis).

    Scale shape: one (day) count reduce; the 2 x T fold runs on the
    ~30-row driver series."""
    from .common import sql_round

    def prep(b: pd.DataFrame) -> pd.DataFrame:
        return b.assign(
            day=b["ts"].dt.floor("D"),
            is_p=(b["event_type"] == "purchase").astype(np.int64))

    daily = partial_groupby(
        load(sf_dir, "events", ["ts", "event_type"]), ["day"],
        {"n": ("is_p", "count"), "r": ("is_p", "sum")},
        prep=prep, many_groups=True, num_buckets=num_buckets,
    ).to_pandas().sort_values("day").reset_index(drop=True)

    n = daily["n"].to_numpy(np.int64).astype(np.float64)
    r = daily["r"].to_numpy(np.int64).astype(np.float64)
    T = len(daily)
    if T == 0:
        raise ValueError("purchase_burst_states: no events")
    p0 = r.sum() / n.sum()
    # degenerate rates make r*ln(p) evaluate to NaN (0 * -inf) — fail
    # LOUDLY on both engines instead of emitting a garbage labeling
    if not 0.0 < p0 < 1.0:
        raise ValueError(
            f"purchase_burst_states: degenerate base rate p0={p0} "
            "(corpus has zero or only purchases) — the binomial emission "
            "cost is undefined")
    p1 = min(KB_RATE_MULT * p0, 0.99)
    # shared 9 dp rounding grid on the libm-ln emission costs and tau:
    # the DP output is DISCRETE (state labels), so a numpy-vs-DuckDB
    # ln() ulp difference on a near-tied predecessor choice would flip
    # the output with no output rounding to absorb it — quantizing the
    # cost TERMS before the fold (the voptimal precedent) removes the
    # cross-engine tie hazard for any gap wider than the grid
    tau01 = float(sql_round(KB_GAMMA * np.log(float(T)), 9))

    def emit(p: float) -> np.ndarray:
        return sql_round(-(r * np.log(p) + (n - r) * np.log(1.0 - p)), 9)

    e0, e1 = emit(p0), emit(p1)
    INF = float("inf")
    cost = np.zeros((T, 2))
    prev = np.zeros((T, 2), dtype=np.int64)
    cost[0, 0] = e0[0]
    cost[0, 1] = e1[0] + tau01          # entering burst from the start
    for t in range(1, T):
        for s, es in ((0, e0), (1, e1)):
            c_from0 = cost[t - 1, 0] + (tau01 if s == 1 else 0.0)
            c_from1 = cost[t - 1, 1]
            # tie -> predecessor 0 (the base state), both engines
            if c_from0 <= c_from1:
                cost[t, s], prev[t, s] = es[t] + c_from0, 0
            else:
                cost[t, s], prev[t, s] = es[t] + c_from1, 1
    state = np.zeros(T, dtype=np.int64)
    state[T - 1] = 0 if cost[T - 1, 0] <= cost[T - 1, 1] else 1
    for t in range(T - 1, 0, -1):
        state[t - 1] = prev[t, state[t]]
    n_bursts = int(((state[1:] == 1) & (state[:-1] == 0)).sum()
                   + (state[0] == 1))
    return pd.DataFrame({
        "day": daily["day"],
        "n_events": daily["n"].to_numpy(np.int64),
        "n_purchases": daily["r"].to_numpy(np.int64),
        "state": state,
        "n_bursts": np.full(T, np.int64(n_bursts)),
        "p_base": np.full(T, float(sql_round(p0, 6))),
        "p_burst": np.full(T, float(sql_round(p1, 6)))})


def purchase_burst_states_sql() -> str:
    """Oracle: the Viterbi recursion as a FORWARD recursive CTE
    carrying (c0, c1) and a BACKWARD recursive trace re-deriving each
    predecessor with the identical <= tie rule."""
    return f"""
        WITH RECURSIVE daily AS (
            SELECT date_trunc('day', ts) AS day,
                   count(*)::DOUBLE AS n,
                   sum(CASE WHEN event_type = 'purchase' THEN 1
                       ELSE 0 END)::DOUBLE AS r
            FROM events GROUP BY 1
        ),
        prm AS (
            SELECT CASE WHEN sum(r) <= 0 OR sum(r) >= sum(n)
                        THEN CAST(error('purchase_burst_states: '
                             'degenerate base rate — corpus has zero '
                             'or only purchases') AS DOUBLE)
                        ELSE sum(r) / sum(n) END AS p0,
                   least({KB_RATE_MULT} * sum(r) / sum(n), 0.99) AS p1,
                   round({KB_GAMMA} * ln(count(*)::DOUBLE), 9) AS tau,
                   count(*)::BIGINT AS tt
            FROM daily
        ),
        d AS (
            -- emission costs on the engine's shared 9 dp grid: the DP
            -- output is discrete, so un-rounded libm-ln ulp skew could
            -- flip a near-tied predecessor choice
            SELECT row_number() OVER (ORDER BY day) AS rn, day,
                   CAST(n AS BIGINT) AS n, CAST(r AS BIGINT) AS r,
                   round(-(r * ln(p.p0) + (n - r) * ln(1.0 - p.p0)), 9)
                       AS e0,
                   round(-(r * ln(p.p1) + (n - r) * ln(1.0 - p.p1)), 9)
                       AS e1
            FROM daily, prm p
        ),
        dp(t, c0, c1) AS (
            SELECT 1::BIGINT, e0, e1 + (SELECT tau FROM prm)
            FROM d WHERE rn = 1
            UNION ALL
            SELECT d.rn,
                   d.e0 + least(dp.c0, dp.c1),
                   d.e1 + least(dp.c0 + (SELECT tau FROM prm), dp.c1)
            FROM dp JOIN d ON d.rn = dp.t + 1
        ),
        bt(t, s) AS (
            SELECT t, CASE WHEN c0 <= c1 THEN 0 ELSE 1 END
            FROM dp WHERE t = (SELECT tt FROM prm)
            UNION ALL
            SELECT bt.t - 1,
                   CASE WHEN bt.s = 1
                        THEN CASE WHEN p.c0 + (SELECT tau FROM prm)
                                       <= p.c1 THEN 0 ELSE 1 END
                        ELSE CASE WHEN p.c0 <= p.c1 THEN 0 ELSE 1 END
                   END
            FROM bt JOIN dp p ON p.t = bt.t - 1
            WHERE bt.t > 1
        ),
        lab AS (
            SELECT d.day, d.n, d.r, bt.s,
                   lag(bt.s) OVER (ORDER BY d.rn) AS ps
            FROM d JOIN bt ON bt.t = d.rn
        )
        SELECT day, n AS n_events, r AS n_purchases,
               CAST(s AS BIGINT) AS state,
               (SELECT sum(CASE WHEN s = 1 AND coalesce(ps, 0) = 0
                           THEN 1 ELSE 0 END) FROM lab)::BIGINT
                   AS n_bursts,
               round((SELECT p0 FROM prm), 6) AS p_base,
               round((SELECT p1 FROM prm), 6) AS p_burst
        FROM lab
    """
