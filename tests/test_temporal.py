"""Edge-path tests for the temporal/keyed-window operators
(weaver_ray/pipelines/temporal.py).  Full-table equality vs DuckDB is
covered by the parametrized oracle battery (test_queries_oracle); these pin
the tie/boundary rules on hand-built inputs where the expected answer is
known by inspection."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from weaver_ray.pipelines import temporal
from weaver_ray.pipelines.common import to_table

T0 = np.datetime64("2024-01-01T00:00:00", "us")


def _write_events(tmp_path, rows):
    """rows: list of (event_id, seconds_after_t0, user_id, event_type, value)."""
    df = pd.DataFrame(rows, columns=["event_id", "s", "user_id", "event_type", "value"])
    t = pa.table({
        "event_id": pa.array(df["event_id"], pa.int64()),
        "ts": pa.array(T0 + df["s"].to_numpy().astype("timedelta64[s]").astype(
            "timedelta64[us]"), pa.timestamp("us")),
        "user_id": pa.array(df["user_id"], pa.int64()),
        "event_type": pa.array(df["event_type"], pa.string()),
        "value": pa.array(df["value"], pa.float64()),
        "props": pa.array(["{}"] * len(df), pa.string()),
    })
    pq.write_table(t, tmp_path / "events.parquet")
    return str(tmp_path)


def test_asof_tie_and_unmatched(tmp_path):
    sf = _write_events(tmp_path, [
        # user 1: purchase BEFORE any click -> -1; exact-tie click matches;
        # duplicate click timestamps keep max(event_id)
        (1, 10, 1, "purchase", 1.0),
        (2, 20, 1, "click", 0.0),
        (3, 20, 1, "click", 0.0),     # dup ts with event 2 -> 3 wins
        (4, 20, 1, "purchase", 1.0),  # tie ts: matches click 3
        (5, 30, 1, "purchase", 1.0),  # latest click <= 30 is still 3
        # user 2: clicks only -> no output rows
        (6, 5, 2, "click", 0.0),
    ])
    out = to_table(temporal.asof_purchase_attribution(sf, num_buckets=3)
                   ).to_pandas().sort_values("purchase_id")
    assert list(out["purchase_id"]) == [1, 4, 5]
    assert list(out["click_id"]) == [-1, 3, 3]
    assert out.loc[out["purchase_id"] == 1, "click_ts_us"].iloc[0] == -1


def test_asof_no_clicks_at_all(tmp_path):
    sf = _write_events(tmp_path, [(1, 10, 1, "purchase", 1.0)])
    out = to_table(temporal.asof_purchase_attribution(sf)).to_pandas()
    assert list(out["click_id"]) == [-1]
    assert out["click_id"].dtype == np.int64


def test_range_join_window_bounds(tmp_path):
    """Half-open [ts-1h, ts): the click exactly 1h before is IN, the click
    at the purchase instant is OUT; no-click purchases keep (0, 0.0);
    appearance-order user codes must still aggregate the right user."""
    H = 3600
    sf = _write_events(tmp_path, [
        # user 7 appears first among purchases, user 1 first among clicks —
        # exercises the composite-key sort (codes are appearance-ordered)
        (1, 2 * H, 7, "purchase", 1.0),
        (2, 2 * H - H, 7, "click", 10.0),      # exactly ts-1h: included
        (3, 2 * H, 7, "click", 100.0),         # at purchase instant: excluded
        (4, 2 * H - H - 1, 7, "click", 7.0),   # just outside: excluded
        (5, H, 1, "click", 5.0),
        (6, H + 10, 1, "purchase", 1.0),
        (7, 5 * H, 2, "purchase", 1.0),        # user with no clicks
    ])
    out = (to_table(temporal.range_join_click_windows(sf, num_buckets=3))
           .to_pandas().sort_values("purchase_id").reset_index(drop=True))
    assert list(out["purchase_id"]) == [1, 6, 7]
    assert list(out["n_clicks"]) == [1, 1, 0]
    assert list(out["sum_click_value"]) == [10.0, 5.0, 0.0]
    assert out["n_clicks"].dtype == np.int64


def test_session_gap_boundary(tmp_path):
    gap_s = 30 * 60
    sf = _write_events(tmp_path, [
        (1, 0, 1, "view", 1.0),
        (2, gap_s, 1, "view", 2.0),          # exactly the gap -> SAME session
        (3, 2 * gap_s + 1, 1, "view", 4.0),  # gap exceeded by 1s -> new session
        (4, 0, 2, "view", 8.0),              # other user never chains
    ])
    out = to_table(temporal.session_windows(sf, num_buckets=2)).to_pandas()
    u1 = out[out["user_id"] == 1].sort_values("session_start_us")
    assert list(u1["n_events"]) == [2, 1]
    assert list(u1["sum_value"]) == [3.0, 4.0]
    assert list(out[out["user_id"] == 2]["n_events"]) == [1]


def test_rolling_min_periods_and_order(tmp_path):
    sf = _write_events(tmp_path, [
        (1, 0, 1, "view", 2.0),
        (2, 10, 1, "view", 4.0),
        (3, 20, 1, "view", 12.0),
        (4, 30, 1, "view", 2.0),
    ])
    out = to_table(temporal.rolling_event_avg(sf)).to_pandas().sort_values("event_id")
    assert list(out["rolling_avg"]) == [2.0, 3.0, 6.0, 6.0]


def test_top_orders_per_customer_ties_and_short_groups(tmp_path):
    t = pa.table({
        "o_orderkey": pa.array([1, 2, 3, 4, 5], pa.int64()),
        "o_custkey": pa.array([7, 7, 7, 7, 9], pa.int64()),
        "o_orderstatus": pa.array(["O"] * 5),
        "o_totalprice": pa.array([50.0, 50.0, 99.0, 1.0, 10.0], pa.float64()),
        "o_orderdate": pa.array([T0.item()] * 5, pa.timestamp("us")),
        "o_orderpriority": pa.array(["1-URGENT"] * 5),
    })
    pq.write_table(t, tmp_path / "orders.parquet")
    out = to_table(temporal.top_orders_per_customer(str(tmp_path), k=3,
                                                    num_buckets=2)).to_pandas()
    c7 = out[out["o_custkey"] == 7].sort_values("rank")
    # price desc, orderkey asc on the 50.0 tie
    assert list(c7["o_orderkey"]) == [3, 1, 2]
    assert list(c7["rank"]) == [1, 2, 3]
    c9 = out[out["o_custkey"] == 9]
    assert list(c9["rank"]) == [1]  # short group keeps all rows


def test_sliding_windows_fanout(tmp_path):
    # one event at 00:30 -> windows starting 00:00 and 23:00 (prev day)
    sf = _write_events(tmp_path, [(1, 1800, 1, "view", 5.0)])
    out = to_table(temporal.sliding_window_stats(sf)).to_pandas()
    assert len(out) == 2
    starts = sorted(out["window_start_us"])
    assert starts[1] - starts[0] == temporal.US_PER_HOUR
    assert set(out["n_events"]) == {1}


def test_keyed_map_groups_key_completeness(tmp_path):
    # every key's rows must arrive in ONE call, regardless of bucket count
    import ray.data as rd

    from weaver_ray.pipelines.common import keyed_map_groups

    df = pd.DataFrame({"k": np.arange(1000) % 37, "v": np.arange(1000)})
    seen = []

    def fn(g):
        ks = g["k"].unique()
        return pd.DataFrame({"k": ks, "n": [int((g["k"] == k).sum()) for k in ks]})

    out = to_table(keyed_map_groups(rd.from_pandas(df), "k", fn, num_buckets=5)
                   ).to_pandas()
    # one output row per key with the full count proves no key was split
    assert len(out) == 37
    assert (out["n"].to_numpy() >= 27).all() and out["n"].sum() == 1000


def test_cohort_retention_cells(tmp_path):
    week = 7 * 86400
    sf = _write_events(tmp_path, [
        # user 1: first event week 0, active weeks 0 and 2 (two events in
        # week 2 must still count once)
        (1, 10, 1, "view", 0.0),
        (2, 2 * week + 5, 1, "click", 0.0),
        (3, 2 * week + 9, 1, "view", 0.0),
        # user 2: first event week 0, active week 0 only
        (4, 20, 2, "view", 0.0),
        # user 3: first event week 1 (its own cohort), active weeks 1, 2
        (5, week + 3, 3, "view", 0.0),
        (6, 2 * week + 1, 3, "view", 0.0),
    ])
    out = to_table(temporal.cohort_retention(sf, num_buckets=3)).to_pandas()
    cells = {(r.cohort_week - out["cohort_week"].min(), r.week_offset):
             r.n_users for r in out.itertuples()}
    assert cells == {(0, 0): 2, (0, 2): 1, (1, 0): 1, (1, 1): 1}
    assert out["n_users"].dtype == np.int64


def test_value_quantile_sketch_error_bound(ray_session):
    """Sketch estimate vs the exact order statistic: biased low by at most
    one bin width (the contract the docstring states)."""
    from weaver_ray.pipelines import relational

    sf = "/root/testdata/sf0.01"
    out = relational.value_quantile_sketch(sf)
    v = np.sort(pd.read_parquet(sf + "/events.parquet",
                                columns=["value"])["value"].to_numpy())
    w = 500.0 / 8192
    for q, rank, est in out.itertuples(index=False):
        exact = v[int(rank) - 1]  # the rank-th order statistic (1-indexed)
        assert est <= exact + 1e-9            # left-edge estimate: never high
        assert exact - est <= w + 1e-9        # ... and low by <= one bin


def test_winsorized_stats_caps_bite(ray_session):
    """At sf0.01 the P99 cap must actually clip some values (the robust
    mean differs from the plain mean), and caps must equal the sketch's
    P1/P99 estimates."""
    from weaver_ray.pipelines import relational

    sf = "/root/testdata/sf0.01"
    out = relational.winsorized_value_stats(sf)
    ev = pd.read_parquet(sf + "/events.parquet",
                         columns=["event_type", "value"])
    lo, hi = out["cap_lo"].iloc[0], out["cap_hi"].iloc[0]
    assert lo < hi
    assert (ev["value"] > hi).any() or (ev["value"] < lo).any()
    ref = (ev.assign(w=ev["value"].clip(lo, hi))
           .groupby("event_type")["w"].mean().round(4))
    got = out.set_index("event_type")["mean_winsorized"]
    assert (got - ref.reindex(got.index)).abs().max() < 1e-3
    plain = ev.groupby("event_type")["value"].mean().round(4)
    assert (got != plain.reindex(got.index)).any()


def test_incremental_event_stats_checkpoint_reuse(ray_session, tmp_path):
    """Second run must reuse the checkpointed base partials (file untouched)
    and still equal the from-scratch result after the state is wiped."""
    import os

    from weaver_ray.pipelines import relational

    sf = "/root/testdata/sf0.001"
    root = str(tmp_path / "state")
    a = relational.incremental_event_stats(sf, state_root=root)
    state = [f for f in os.listdir(root) if f.endswith(".parquet")]
    assert len(state) == 1
    mtime = os.path.getmtime(os.path.join(root, state[0]))
    b = relational.incremental_event_stats(sf, state_root=root)
    assert os.path.getmtime(os.path.join(root, state[0])) == mtime
    pd.testing.assert_frame_equal(a, b)
    # wipe the checkpoint: full rebuild must agree exactly
    os.unlink(os.path.join(root, state[0]))
    c = relational.incremental_event_stats(sf, state_root=root)
    pd.testing.assert_frame_equal(a, c)
    # the cutoff actually splits the data (both sides non-empty)
    ev = pd.read_parquet(sf + "/events.parquet", columns=["ts"])
    cut = pd.Timestamp(relational.INCR_CUTOFF_US, unit="us")
    assert (ev["ts"] < cut).any() and (ev["ts"] >= cut).any()


def test_cohort_retention_partition_invariance(tmp_path):
    """The retention triangle must be identical under any bucket count —
    the additivity claim (buckets partition users) made by the docstring."""
    week = 7 * 86400
    rows = []
    eid = 0
    for u in range(17):
        for k in range(u % 5 + 1):
            eid += 1
            rows.append((eid, (u % 3) * week + k * week * 2, u, "view", 0.0))
    sf = _write_events(tmp_path, rows)
    outs = []
    for nb in (1, 3, 16):
        o = (to_table(temporal.cohort_retention(sf, num_buckets=nb))
             .to_pandas().sort_values(["cohort_week", "week_offset"])
             .reset_index(drop=True))
        outs.append(o)
    pd.testing.assert_frame_equal(outs[0], outs[1])
    pd.testing.assert_frame_equal(outs[0], outs[2])


def test_late_event_windows_sequential_replay(ray_session):
    """Engine == an independent sequential stream replay at sf0.001, and
    the late branch genuinely fires (non-degenerate plant)."""
    import hashlib

    sf = "/root/testdata/sf0.001"
    out = (to_table(temporal.late_event_windows(sf)).to_pandas()
           .sort_values("window_hour").reset_index(drop=True))

    ev = pq.read_table(f"{sf}/events.parquet",
                       columns=["event_id", "ts", "value"]).to_pandas()
    ts_us = ev["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
    delay = np.array(
        [int(hashlib.md5(str(int(e)).encode()).hexdigest()[:12], 16)
         for e in ev["event_id"]], dtype=np.int64) % (2 * 3_600_000_000)
    order = np.lexsort((ev["event_id"].to_numpy(), ts_us + delay))
    # sequential replay: walk arrivals, track the high-water mark
    wm, rows = None, []
    for i in order:
        late = wm is not None and ts_us[i] < wm - 30 * 60_000_000
        rows.append((ts_us[i] // 3_600_000_000, late, ev["value"].iloc[i]))
        wm = ts_us[i] if wm is None else max(wm, ts_us[i])
    rep = pd.DataFrame(rows, columns=["window_hour", "late", "value"])
    exp = rep.groupby("window_hour").agg(
        n_on_time=("late", lambda s: int((~s).sum())),
        n_late=("late", "sum"),
        on_time_value=("value", lambda s: 0.0),
    ).reset_index()
    exp["n_late"] = exp["n_late"].astype(np.int64)
    exp["n_on_time"] = exp["n_on_time"].astype(np.int64)
    ontime_val = rep[~rep["late"]].groupby("window_hour")["value"].sum()
    exp["on_time_value"] = (exp["window_hour"].map(ontime_val).fillna(0.0)
                            .to_numpy())

    assert out["n_late"].sum() > 0, "late branch never fired"
    m = out.merge(exp, on="window_hour", suffixes=("", "_exp"))
    assert len(m) == len(out) == len(exp)
    assert (m["n_late"] == m["n_late_exp"]).all()
    assert (m["n_on_time"] == m["n_on_time_exp"]).all()
    np.testing.assert_allclose(m["on_time_value"], m["on_time_value_exp"],
                               atol=1e-3)


def test_top_event_type_tiebreak(ray_session, tmp_path):
    """Equal counts break to the lexically smallest type; singleton and
    multi-type users both resolve."""
    sf = _write_events(tmp_path, [
        (1, 0, 1, "view", 1.0), (2, 10, 1, "view", 1.0),
        (3, 20, 1, "click", 1.0), (4, 30, 1, "click", 1.0),  # tie -> click
        (5, 0, 2, "purchase", 1.0),                          # singleton
        (6, 0, 3, "view", 1.0), (7, 5, 3, "view", 1.0),
        (8, 9, 3, "click", 1.0),                             # majority view
    ])
    out = (to_table(temporal.top_event_type_per_user(sf)).to_pandas()
           .sort_values("user_id").reset_index(drop=True))
    assert list(out["user_id"]) == [1, 2, 3]
    assert list(out["top_type"]) == ["click", "purchase", "view"]
    assert list(out["n_events"]) == [2, 1, 2]


def test_decayed_event_scores_exact_weights(ray_session, tmp_path):
    """Day-old events weigh exactly half; weights are dyadic so the sums
    are exact for small hand inputs."""
    day = 86_400
    sf = _write_events(tmp_path, [
        (1, 2 * day, 1, "view", 8.0),    # newest: age 0, weight 1
        (2, day, 1, "view", 8.0),        # age 1 day, weight 1/2
        (3, 0, 1, "view", 8.0),          # age 2 days, weight 1/4
        (4, 2 * day - 1, 1, "click", 4.0),  # 1s short of a day: age 0
    ])
    out = temporal.decayed_event_scores(sf).set_index("event_type")
    assert out.loc["view", "decayed_count"] == 1.75       # 1 + .5 + .25
    assert out.loc["view", "decayed_value"] == 14.0       # 8 + 4 + 2
    assert out.loc["click", "decayed_count"] == 1.0
    assert out.loc["click", "decayed_value"] == 4.0
    assert out.loc["view", "n_events"] == 3


def test_daily_type_anomalies_hand_computed(ray_session, tmp_path):
    """Known daily counts -> known z-scores; constant-count types are
    excluded (sd == 0)."""
    day = 86_400
    rows = []
    eid = 0
    # 'view': 1, 2, 3 events on days 0, 1, 2  (mu=2, sd=1 -> z=-1, 0, 1)
    for d, k in ((0, 1), (1, 2), (2, 3)):
        for _ in range(k):
            rows.append((eid, d * day + eid, 1, "view", 1.0))
            eid += 1
    # 'click': constant 2/day -> sd 0 -> excluded entirely
    for d in (0, 1):
        for _ in range(2):
            rows.append((eid, d * day + eid, 2, "click", 1.0))
            eid += 1
    sf = _write_events(tmp_path, rows)
    out = temporal.daily_type_anomalies(sf)
    assert set(out["event_type"]) == {"view"}
    v = out.sort_values("day")
    assert list(v["n"]) == [1, 2, 3]
    assert list(v["z"]) == [-1.0, 0.0, 1.0]


def test_event_transition_matrix_hand_computed(ray_session, tmp_path):
    """Two users with known sequences -> known transition counts; the
    boundary between users must NOT produce a transition."""
    sf = _write_events(tmp_path, [
        (1, 0, 1, "view", 1.0), (2, 1, 1, "click", 1.0),
        (3, 2, 1, "view", 1.0), (4, 3, 1, "click", 1.0),
        (5, 0, 2, "purchase", 1.0), (6, 1, 2, "view", 1.0),
    ])
    out = temporal.event_transition_matrix(sf, num_buckets=2)
    cells = {(r.prev_type, r.next_type): (r.n, r.row_share)
             for r in out.itertuples()}
    assert cells[("view", "click")] == (2, 1.0)
    assert cells[("click", "view")] == (1, 1.0)
    assert cells[("purchase", "view")] == (1, 1.0)
    # user boundary (click@u1 -> purchase@u2) must not appear
    assert ("click", "purchase") not in cells
    assert len(cells) == 3


def test_range_partition_bounds_equidepth_and_skew(ray_session, tmp_path):
    """The plan must (a) conserve rows, (b) keep every partition within
    one histogram-bin occupancy of perfect depth n/P (the sketch's error
    contract applied to partitioning), (c) emit monotone [lo, hi) ranges,
    and (d) surface skew honestly: a constant-valued table collapses all
    boundaries onto one bin edge and leaves P-1 partitions EMPTY."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from weaver_ray.pipelines.relational import range_partition_bounds

    sf = "/root/testdata/sf0.01"
    out = range_partition_bounds(sf, n_parts=8)
    v = pd.read_parquet(sf + "/events.parquet", columns=["value"])["value"]
    n = len(v)
    assert out["n_rows"].sum() == n
    assert (out["lo"].to_numpy() <= out["hi"].to_numpy()).all()
    assert (out["lo"].to_numpy()[1:] == out["hi"].to_numpy()[:-1]).all()
    # depth error bound: a boundary misplaces at most the occupancy of
    # one bin on each side of the partition
    bins = np.clip(np.floor(v.to_numpy(np.float64) * 8192 / 500.0)
                   .astype(np.int64), 0, 8191)
    max_bin = np.bincount(bins, minlength=8192).max()
    assert (np.abs(out["n_rows"].to_numpy() - n / 8)
            <= 2 * max_bin + 1).all()

    # adversarial skew: constant column -> everything in the last partition
    t = pa.table({"value": pa.array([42.0] * 100, pa.float64())})
    pq.write_table(t, tmp_path / "events.parquet")
    sk = range_partition_bounds(str(tmp_path), n_parts=8)
    assert sk["n_rows"].sum() == 100
    assert (sk["n_rows"].to_numpy()[:-1] == 0).all()
    assert sk["n_rows"].to_numpy()[-1] == 100


def test_top_event_sequences_hand_stream(ray_session, tmp_path):
    """Hand-computed motif counts: windows never span users, ordering is
    (ts, event_id), ranking is (count desc, sequence asc) with the rank
    column dense from 1."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from weaver_ray.pipelines.temporal import top_event_sequences

    # user 1: A B A B A B  -> ABA x2, BAB x2
    # user 2: A B A        -> ABA x1 (boundary: no window spans into u3)
    # user 3: C C C C      -> CCC x2
    rows = []
    seqs = {1: list("ABABAB"), 2: list("ABA"), 3: list("CCCC")}
    eid = 0
    for u, types in seqs.items():
        for j, t in enumerate(types):
            rows.append((eid, np.datetime64("2024-01-01", "us")
                         + np.timedelta64(j, "m"), u, t))
            eid += 1
    pq.write_table(pa.table({
        "event_id": pa.array([r[0] for r in rows], pa.int64()),
        "ts": pa.array([r[1].astype("datetime64[us]").item()
                        for r in rows], pa.timestamp("us")),
        "user_id": pa.array([r[2] for r in rows], pa.int64()),
        "event_type": pa.array([r[3] for r in rows])}),
        tmp_path / "events.parquet")
    out = top_event_sequences(str(tmp_path))
    got = [(r.t1, r.t2, r.t3, r.n, r.rank)
           for r in out.itertuples(index=False)]
    assert got == [("A", "B", "A", 3, 1), ("B", "A", "B", 2, 2),
                   ("C", "C", "C", 2, 3)]


def test_value_mad_outliers_sequential_replay(ray_session, tmp_path):
    """Engine robust stats == an independent sequential replay of the
    two-level bucket arithmetic on a planted corpus where the outliers
    are known: a tight cluster at ~30 plus a handful at 400+."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from weaver_ray.pipelines.relational import (MAD_K, SKETCH_BINS,
                                                 SKETCH_VMAX,
                                                 value_mad_outliers)

    vals = [30.0 + 0.01 * i for i in range(50)] + [400.0, 450.0, 499.0]
    types = ["t"] * len(vals)
    pq.write_table(pa.table({
        "event_type": pa.array(types),
        "value": pa.array(vals, pa.float64())}),
        tmp_path / "events.parquet")
    out = value_mad_outliers(str(tmp_path)).set_index("event_type")

    def binof(v):
        return int(min(max(np.floor(v * SKETCH_BINS / SKETCH_VMAX), 0),
                       SKETCH_BINS - 1))

    def rank_bin(bins):
        bins = sorted(bins)
        return bins[(len(bins) + 1) // 2 - 1]

    b1 = [binof(v) for v in vals]
    mb = rank_bin(b1)
    med = mb * SKETCH_VMAX / SKETCH_BINS
    b2 = [binof(abs(v - med)) for v in vals]
    db = rank_bin(b2)
    n_out = sum(b > MAD_K * db for b in b2)

    row = out.loc["t"]
    assert row["n"] == len(vals)
    assert row["med_est"] == med
    assert row["mad_est"] == db * SKETCH_VMAX / SKETCH_BINS
    assert row["n_outliers"] == n_out
    assert n_out == 3          # exactly the planted far values
    assert abs(med - 30.25) < 0.1   # median sits in the cluster


def test_kmv_distinct_users_sequential_replay(ray_session, tmp_path):
    """KMV estimate == an independent hashlib replay; a type below the
    signature size reports the exact count; the saturated estimate is
    within 30% of truth at 64 minima."""
    import hashlib

    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from weaver_ray.pipelines.relational import (KMV_K, _HEX13,
                                                 kmv_distinct_users)
    from weaver_ray.pipelines.common import sql_round

    users_big = list(range(1, 1001))      # 1000 distinct (> k)
    users_small = list(range(1, 11))      # 10 distinct (< k)
    rows_t, rows_u = [], []
    for u in users_big * 2:               # duplicates must not matter
        rows_t.append("big")
        rows_u.append(u)
    for u in users_small * 3:
        rows_t.append("small")
        rows_u.append(u)
    pq.write_table(pa.table({
        "event_type": pa.array(rows_t),
        "user_id": pa.array(rows_u, pa.int64())}),
        tmp_path / "events.parquet")
    out = kmv_distinct_users(str(tmp_path)).set_index("event_type")

    hs = sorted(hashlib.md5(str(u).encode()).hexdigest()
                for u in set(users_big))
    hk = int(hs[KMV_K - 1][:13], 16)
    est = float(sql_round((KMV_K - 1) * float(_HEX13) / hk, 4))
    assert out.loc["big", "exact_distinct"] == 1000
    assert out.loc["big", "est_distinct"] == est
    assert abs(est - 1000) / 1000 < 0.30   # the k=64 accuracy regime
    assert out.loc["small", "exact_distinct"] == 10
    assert out.loc["small", "est_distinct"] == 10.0  # saturates to exact
    assert out.loc["small", "rel_err"] == 0.0


def test_type_daily_ohlc_sequential_replay(ray_session, tmp_path):
    """OHLC candles == a sequential replay on a hand stream, including
    the (ts, event_id) tiebreak for open/close when timestamps collide
    (cross-partial merging is covered by the dedicated fold unit test
    below — this 6-row table arrives as one block)."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from weaver_ray.pipelines.temporal import type_daily_ohlc

    day0 = 1_700_000_000_000_000 // 86_400_000_000 * 86_400_000_000
    rows = [  # (event_id, ts_us, type, value)
        (5, day0 + 1000, "t", 10.0),   # same ts as eid 2: eid order decides
        (2, day0 + 1000, "t", 99.0),   # open (smaller eid at min ts)
        (7, day0 + 5000, "t", 3.5),
        (9, day0 + 9000, "t", 42.0),   # close
        (1, day0 + 86_400_000_000 + 5, "t", 7.0),   # next day: open==close
        (3, day0 + 2000, "u", 1.25),
    ]
    pq.write_table(pa.table({
        "event_id": pa.array([r[0] for r in rows], pa.int64()),
        "ts": pa.array(np.array([r[1] for r in rows], "datetime64[us]")),
        "event_type": pa.array([r[2] for r in rows]),
        "value": pa.array([r[3] for r in rows], pa.float64())}),
        tmp_path / "events.parquet")
    out = (type_daily_ohlc(str(tmp_path))
           .set_index(["event_type", "day"]).sort_index())

    d0 = day0 // 86_400_000_000
    r = out.loc[("t", d0)]
    assert (r["open"], r["close"]) == (99.0, 42.0)
    assert (r["high"], r["low"], r["n"]) == (99.0, 3.5, 4)
    r1 = out.loc[("t", d0 + 1)]
    assert (r1["open"], r1["close"], r1["n"]) == (7.0, 7.0, 1)
    assert out.loc[("u", d0)]["n"] == 1


def test_ohlc_fold_merges_conflicting_partials():
    """The cross-batch merge path in isolation: two partials for the
    same (type, day) where the LATER batch holds the earlier open and
    the earlier batch holds the later close — the fold must pick by
    key, not by row order, and fold high/low/n componentwise."""
    import numpy as np
    import pandas as pd

    from weaver_ray.pipelines.temporal import _ohlc_fold

    partials = pd.DataFrame({
        "event_type": ["t", "t"], "day": np.array([5, 5], np.int64),
        # batch A: covers the MIDDLE of the day
        # batch B: holds both the true open (earliest key) and close
        "otu": np.array([100, 50], np.int64),
        "oeid": np.array([1, 9], np.int64),
        "open": np.array([11.0, 77.0]),
        "ctu": np.array([200, 900], np.int64),
        "ceid": np.array([2, 3], np.int64),
        "close": np.array([22.0, 88.0]),
        "high": np.array([30.0, 90.0]),
        "low": np.array([5.0, 40.0]),
        "n": np.array([4, 2], np.int64),
    })
    out = _ohlc_fold(partials)
    assert len(out) == 1
    r = out.iloc[0]
    assert r["open"] == 77.0    # otu=50 beats otu=100
    assert r["close"] == 88.0   # ctu=900 beats ctu=200
    assert (r["high"], r["low"], r["n"]) == (90.0, 5.0, 6)
    # same-ctu tie resolves on the event_id component
    partials.loc[0, ["ctu", "ceid", "close"]] = [900, 7, 33.0]
    r2 = _ohlc_fold(partials).iloc[0]
    assert r2["close"] == 33.0  # ceid=7 beats ceid=3 at equal ctu
    # empty bucket returns the typed empty frame
    assert len(_ohlc_fold(partials.iloc[0:0])) == 0


def test_event_gap_stats_near_tie_gaps_match_duckdb(ray_session, tmp_path):
    """Adversarial grid for the r5 exactness rework: gaps are random
    multiples of 50 us, so avg_gap*10^4 lands ON or NEXT TO the rounding
    half constantly (250 us / 1 gap -> 2.5 exactly: banker's says 0.0002,
    DuckDB says 0.0003).  The engine and the SHIPPED oracle SQL must agree
    bit-for-bit because both evaluate the identical telescoped integer
    span and the identical single double division — any reintroduction of
    a float gap mean or numpy .round() fails here immediately."""
    import duckdb

    from weaver_ray.pipelines.temporal import event_gap_stats

    rng = np.random.default_rng(11)
    rows = []
    eid = 0
    t_us = []
    for uid in range(1, 120):
        n = int(rng.integers(1, 8))
        t = int(rng.integers(0, 10**9))
        for _ in range(n):
            t_us.append((eid, t, uid))
            eid += 1
            t += int(rng.integers(1, 2000)) * 50  # multiples of 50 us
    df = pd.DataFrame(t_us, columns=["event_id", "us", "user_id"])
    t = pa.table({
        "event_id": pa.array(df["event_id"], pa.int64()),
        "ts": pa.array(T0 + df["us"].to_numpy().astype("timedelta64[us]"),
                       pa.timestamp("us")),
        "user_id": pa.array(df["user_id"], pa.int64()),
        "event_type": pa.array(["click"] * len(df), pa.string()),
        "value": pa.array(np.zeros(len(df)), pa.float64()),
        "props": pa.array(["{}"] * len(df), pa.string()),
    })
    pq.write_table(t, tmp_path / "events.parquet")

    got = (to_table(event_gap_stats(str(tmp_path), num_buckets=4))
           .to_pandas().sort_values("user_id").reset_index(drop=True))

    import __ray_entry__ as entrymod
    sql = entrymod.oracle_sql()["event_gap_stats"]
    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM "
                f"read_parquet('{tmp_path}/events.parquet')")
    want = (con.execute(sql).df()
            .sort_values("user_id").reset_index(drop=True))
    pd.testing.assert_frame_equal(
        got[want.columns], want, check_dtype=False, check_exact=True)
