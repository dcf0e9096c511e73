"""Edge-path tests for the wide-analytics operators
(weaver_ray/pipelines/analytics.py) and the global_row_number primitive.
Full-table equality vs DuckDB runs in the oracle battery; these pin the
rank/NTILE/tie/empty rules on inputs where the answer is known by
inspection."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest
import ray.data as rd

from weaver_ray.pipelines import analytics
from weaver_ray.pipelines.analytics import _ntile_of
from weaver_ray.pipelines.common import global_row_number, to_table

SF = "/root/testdata/sf0.001"


def _write_events(tmp_path, rows):
    """rows: (event_id, user_id, event_type, k); k=None writes props
    WITHOUT the key."""
    df = pd.DataFrame(rows, columns=["event_id", "user_id", "event_type", "k"])
    t = pa.table({
        "event_id": pa.array(df["event_id"], pa.int64()),
        "ts": pa.array([np.datetime64("2024-01-01", "us")] * len(df),
                       pa.timestamp("us")),
        "user_id": pa.array(df["user_id"], pa.int64()),
        "event_type": pa.array(df["event_type"], pa.string()),
        "value": pa.array([1.0] * len(df), pa.float64()),
        "props": pa.array(["{}" if k is None else f'{{"k": {k}}}'
                           for k in df["k"]], pa.string()),
    })
    pq.write_table(t, tmp_path / "events.parquet")
    return str(tmp_path)


def test_global_row_number_matches_lexsort():
    df = pd.DataFrame({"a": [5, 1, 5, 2, 2, 9], "b": [1, 0, 0, 7, 3, 2]})
    # many tiny blocks so the prefix-offset exchange actually crosses blocks
    ds = rd.from_pandas([df.iloc[[i]] for i in range(len(df))])
    ranked, n = global_row_number(ds, ["a", "b"], descending=[True, False])
    assert n == len(df)
    out = ranked.to_pandas().sort_values("rank").reset_index(drop=True)
    expect = df.sort_values(["a", "b"], ascending=[False, True]).reset_index(drop=True)
    pd.testing.assert_frame_equal(out[["a", "b"]], expect)
    assert list(out["rank"]) == list(range(len(df)))


def test_ntile_size_rule():
    # n=10, t=4 -> sizes 3,3,2,2 (first n%t tiles get ceil(n/t))
    tiles = _ntile_of(np.arange(10), 10, 4)
    assert list(np.bincount(tiles)[1:]) == [3, 3, 2, 2]
    assert list(tiles) == sorted(tiles)  # monotone in rank
    # fewer rows than tiles: each row its own tile
    assert list(_ntile_of(np.arange(3), 3, 4)) == [1, 2, 3]


def test_intersection_edges(tmp_path):
    sf = _write_events(tmp_path, [
        (1, 1, "click", 0), (2, 1, "purchase", 0),   # both -> in
        (3, 2, "click", 0), (4, 2, "click", 0),      # clicks only -> out
        (5, 3, "purchase", 0),                        # purchase only -> out
        (6, 4, "view", 0),                            # other type -> out
        (7, 5, "purchase", 0), (8, 5, "click", 0),   # both, reversed order
    ])
    out = to_table(analytics.users_click_and_purchase(sf, num_buckets=3)
                   ).to_pandas()
    assert sorted(out["user_id"]) == [1, 5]
    assert out["user_id"].dtype == np.int64


def test_intersection_empty(tmp_path):
    sf = _write_events(tmp_path, [(1, 1, "view", 0)])
    out = to_table(analytics.users_click_and_purchase(sf, num_buckets=2))
    assert out.num_rows == 0


def test_props_key_stats_values(tmp_path):
    sf = _write_events(tmp_path, [
        (1, 1, "click", 10), (2, 1, "click", -3), (3, 2, "view", 7),
        (4, 3, "click", None),   # missing key: dropped (count(k) semantics)
        (5, 3, "view", 1.5),     # float k: DOUBLE, not truncated to 1
        (6, 4, "error", None),   # type with NO keyed rows: absent entirely
    ])
    out = analytics.props_key_stats(sf).set_index("event_type")
    assert out.loc["click", "n"] == 2
    assert out.loc["click", "avg_k"] == 3.5
    assert out.loc["click", "min_k"] == -3.0
    assert out.loc["view", "max_k"] == 7.0
    assert out.loc["view", "n"] == 2
    assert out.loc["view", "avg_k"] == 4.25   # (7 + 1.5) / 2
    assert "error" not in out.index


def test_corr_matches_numpy():
    import duckdb

    out = analytics.price_quantity_corr(SF).set_index("l_returnflag")
    li = duckdb.sql(
        f"SELECT l_returnflag, l_extendedprice, l_quantity "
        f"FROM '{SF}/lineitem.parquet'").df()
    for flag, g in li.groupby("l_returnflag"):
        expect = np.corrcoef(g["l_extendedprice"], g["l_quantity"])[0, 1]
        assert abs(out.loc[flag, "corr_price_qty"] - expect) < 1e-3
        assert out.loc[flag, "n"] == len(g)


def test_rollup_grains_consistent():
    out = analytics.lineitem_rollup(SF)
    tot = out[(out.l_returnflag == "ALL") & (out.l_linestatus == "ALL")]
    fine = out[(out.l_returnflag != "ALL") & (out.l_linestatus != "ALL")]
    sub = out[(out.l_returnflag != "ALL") & (out.l_linestatus == "ALL")]
    assert len(tot) == 1
    assert tot["n_items"].iloc[0] == fine["n_items"].sum() == sub["n_items"].sum()
    # every subtotal equals the sum of its children's item counts
    for flag, g in fine.groupby("l_returnflag"):
        assert sub.set_index("l_returnflag").loc[flag, "n_items"] == g["n_items"].sum()


def test_embedding_dim_stats_matches_numpy():
    import pyarrow.parquet as pq_

    out = analytics.embedding_dim_stats(SF).set_index("dim")
    m = np.stack(pq_.read_table(f"{SF}/embeddings.parquet")["embedding"]
                 .to_numpy(zero_copy_only=False)).astype(np.float64)
    assert len(out) == m.shape[1]
    np.testing.assert_allclose(out["avg_val"], m.mean(axis=0).round(4), atol=1e-9)
    np.testing.assert_allclose(out["min_val"], m.min(axis=0).round(4), atol=0)
    assert (out["n"] == m.shape[0]).all()


def test_clean_text_normalization(tmp_path):
    from weaver_ray.pipelines import textops

    t = pa.table({"doc_id": pa.array([1, 2], pa.int64()),
                  "text": pa.array(["  Hello\t\tWORLD \n", "a  b"], pa.string()),
                  "lang": pa.array(["en", "en"]),
                  "source": pa.array(["s", "s"]),
                  "n_chars": pa.array([10, 4], pa.int64())})
    pq.write_table(t, tmp_path / "documents.parquet")
    out = to_table(textops.clean_text_hashes(str(tmp_path))).to_pandas()
    out = out.set_index("doc_id")
    import hashlib
    assert out.loc[1, "clean_md5"] == hashlib.md5(b"hello world").hexdigest()
    assert out.loc[1, "clean_len"] == len("hello world")
    assert out.loc[2, "clean_md5"] == hashlib.md5(b"a b").hexdigest()


def test_clean_text_matches_duckdb_on_exotic_whitespace(tmp_path):
    """RE2's \\s is ASCII-only ([\\t\\n\\f\\r ]) and DuckDB trim() strips
    only spaces; the engine must match THAT, not Python's wider \\s/strip
    (a vertical tab or \\xa0 must survive on both sides identically)."""
    import duckdb
    from weaver_ray.pipelines import textops

    texts = ["a\x0bb  c\xa0d", " x\tY\x0b ", "plain"]
    t = pa.table({"doc_id": pa.array([1, 2, 3], pa.int64()),
                  "text": pa.array(texts, pa.string()),
                  "lang": pa.array(["en"] * 3),
                  "source": pa.array(["s"] * 3),
                  "n_chars": pa.array([len(s) for s in texts], pa.int64())})
    pq.write_table(t, tmp_path / "documents.parquet")
    engine = (to_table(textops.clean_text_hashes(str(tmp_path))).to_pandas()
              .sort_values("doc_id").reset_index(drop=True))
    oracle = duckdb.sql(f"""
        WITH c AS (
            SELECT doc_id,
                   trim(regexp_replace(lower(text), '\\s+', ' ', 'g')) AS ct
            FROM '{tmp_path}/documents.parquet'
        )
        SELECT doc_id, md5(ct) AS clean_md5, CAST(len(ct) AS BIGINT) AS clean_len
        FROM c ORDER BY doc_id
    """).df()
    pd.testing.assert_frame_equal(engine, oracle)


def test_ntiles_monotone_and_partition():
    out = to_table(analytics.customer_value_ntiles(SF, tiles=4, num_buckets=4)
                   ).to_pandas().sort_values("rank").reset_index(drop=True)
    # ranks are a permutation of 0..n-1, spend nonincreasing along them
    assert list(out["rank"]) == list(range(len(out)))
    assert (np.diff(out["spend_cents"].to_numpy()) <= 0).all()
    # tiles are monotone in rank and sized by the q/q+1 rule
    sizes = np.bincount(out["tile"])[1:]
    n, t = len(out), 4
    assert sizes.max() - sizes.min() <= 1 and sizes.sum() == n
    assert (np.sort(sizes)[::-1] == sizes).all()


def _write_orders_customers(tmp_path, custkeys, orders):
    """orders: (o_orderkey, o_custkey, o_totalprice, date_str)."""
    pq.write_table(pa.table({
        "c_custkey": pa.array(custkeys, pa.int64()),
        "c_name": pa.array([f"c{k}" for k in custkeys]),
        "c_nationkey": pa.array([0] * len(custkeys), pa.int32()),
        "c_acctbal": pa.array([0.0] * len(custkeys), pa.float64()),
        "c_mktsegment": pa.array(["M"] * len(custkeys)),
    }), tmp_path / "customer.parquet")
    pq.write_table(pa.table({
        "o_orderkey": pa.array([o[0] for o in orders], pa.int64()),
        "o_custkey": pa.array([o[1] for o in orders], pa.int64()),
        "o_orderstatus": pa.array(["O"] * len(orders)),
        "o_totalprice": pa.array([o[2] for o in orders], pa.float64()),
        "o_orderdate": pa.array([np.datetime64(o[3], "us") for o in orders],
                                pa.timestamp("us")),
        "o_orderpriority": pa.array(["1"] * len(orders)),
    }), tmp_path / "orders.parquet")
    return str(tmp_path)


def test_customer_order_profile_preserves_orderless(tmp_path):
    """LEFT join: customer 3 has no orders and must appear 0-filled."""
    sf = _write_orders_customers(
        tmp_path, [1, 2, 3],
        [(10, 1, 100.0, "2024-01-01"), (11, 1, 50.5, "2024-02-01"),
         (12, 2, 7.25, "2024-01-15")])
    out = (to_table(analytics.customer_order_profile(sf, num_buckets=4))
           .to_pandas().set_index("c_custkey"))
    assert len(out) == 3
    assert out.loc[1, "n_orders"] == 2 and out.loc[1, "total_spend"] == 150.5
    assert out.loc[3, "n_orders"] == 0 and out.loc[3, "total_spend"] == 0.0


def test_daily_activity_fulljoin_one_sided_days(tmp_path):
    """FULL OUTER: days present on only one side survive, 0-filled."""
    sf = _write_orders_customers(
        tmp_path, [1],
        [(10, 1, 1.0, "2024-01-01"), (11, 1, 1.0, "2024-01-03")])
    _write_events(tmp_path, [(1, 1, "click", 1), (2, 1, "view", 1)])
    # events fixture stamps all rows 2024-01-01
    out = (to_table(analytics.daily_activity_fulljoin(sf, num_buckets=4))
           .to_pandas().set_index("day"))
    d0 = int(np.datetime64("2024-01-01").astype("datetime64[D]").astype(int))
    assert out.loc[d0, "n_orders"] == 1 and out.loc[d0, "n_events"] == 2
    d2 = d0 + 2
    assert out.loc[d2, "n_orders"] == 1 and out.loc[d2, "n_events"] == 0


def test_cube_grains_consistent():
    out = analytics.lineitem_cube(SF)
    tot = out[(out.l_returnflag == "ALL") & (out.l_linestatus == "ALL")]
    fine = out[(out.l_returnflag != "ALL") & (out.l_linestatus != "ALL")]
    by_flag = out[(out.l_returnflag != "ALL") & (out.l_linestatus == "ALL")]
    by_status = out[(out.l_returnflag == "ALL") & (out.l_linestatus != "ALL")]
    assert len(tot) == 1
    n = tot["n_items"].iloc[0]
    assert n == fine["n_items"].sum() == by_flag["n_items"].sum() \
        == by_status["n_items"].sum()
    for status, g in fine.groupby("l_linestatus"):
        assert (by_status.set_index("l_linestatus").loc[status, "n_items"]
                == g["n_items"].sum())


def test_users_click_no_purchase_difference(tmp_path):
    sf = _write_events(tmp_path, [
        (1, 1, "click", 1),                       # click only -> kept
        (2, 2, "click", 1), (3, 2, "purchase", 1),  # both -> dropped
        (4, 3, "purchase", 1),                    # purchase only -> dropped
        (5, 4, "view", 1),                        # neither stream -> dropped
    ])
    out = analytics.users_click_no_purchase(sf, num_buckets=4)
    assert list(out["user_id"]) == [1]
    assert out["user_id"].dtype == np.int64


def test_users_click_no_purchase_empty_schema(tmp_path):
    """All clickers purchased: result must be EMPTY but typed."""
    sf = _write_events(tmp_path, [(1, 1, "click", 1), (2, 1, "purchase", 1)])
    out = analytics.users_click_no_purchase(sf, num_buckets=4)
    assert len(out) == 0 and list(out.columns) == ["user_id"]
    assert out["user_id"].dtype == np.int64


def test_monthly_revenue_boundaries(tmp_path):
    """Orders on a month boundary split into the right calendar cells."""
    sf = _write_orders_customers(
        tmp_path, [1],
        [(10, 1, 1.0, "2023-12-31T23:59:59"), (11, 1, 2.0, "2024-01-01T00:00:00"),
         (12, 1, 4.0, "2024-01-31T12:00:00")])
    out = analytics.monthly_revenue(sf).set_index(["year", "month"])
    assert out.loc[(2023, 12), "revenue"] == 1.0
    assert out.loc[(2024, 1), "revenue"] == 6.0
    assert out.loc[(2024, 1), "n_orders"] == 2


def test_sql_round_half_away():
    from weaver_ray.pipelines.common import sql_round

    assert sql_round(4.28125, 4) == 4.2813   # numpy banker's gives .2812
    assert sql_round(-4.28125, 4) == -4.2813
    assert sql_round(1.5, 0) == 2.0 and sql_round(2.5, 0) == 3.0
    np.testing.assert_allclose(sql_round([0.12344, 0.12346], 4),
                               [0.1234, 0.1235])


def test_sql_round_matches_duckdb_randomized():
    """sql_round IS the engine's oracle-facing rounding convention — pin it
    bit-for-bit to DuckDB round() on (a) random doubles across magnitudes,
    (b) ratios of small integers (the documented half-tie hazard: an
    oracle-checked avg = int/int can land exactly on a dyadic half), and
    (c) the exhaustive dyadic halves within float32 range."""
    import duckdb

    from weaver_ray.pipelines.common import sql_round

    con = duckdb.connect()

    def duck(vals, d):
        return np.array(con.execute(
            "SELECT round(CAST(v AS DOUBLE), ?) FROM (SELECT unnest(?) v)",
            [d, list(map(float, vals))]).df().iloc[:, 0])

    rng = np.random.default_rng(7)
    x = np.concatenate([rng.uniform(-1e6, 1e6, 5000),
                        rng.uniform(-1, 1, 5000),
                        rng.uniform(-1e12, 1e12, 1000)])
    p = rng.integers(1, 10**6, 5000)
    q = rng.integers(1, 10**4, 5000)
    ratios = p.astype(np.float64) / q.astype(np.float64)
    halves = np.asarray([k + 0.5 for k in range(-50, 50)] +
                        [k / 16 + 0.03125 for k in range(-64, 64)])
    for d in (0, 2, 4, 6):
        for arr in (x, ratios, halves):
            got, want = sql_round(arr, d), duck(arr, d)
            bad = np.flatnonzero(got != want)
            assert len(bad) == 0, (d, arr[bad][:5], got[bad][:5], want[bad][:5])


def test_quality_filter_edges(tmp_path):
    """Each gate rejects independently; survivors carry audited features."""
    from weaver_ray.pipelines import textops

    texts = [
        "the quick brown fox jumps over a lazy dog and runs to the river",  # pass
        "the cat sat",                                    # too few words
        "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda",  # no stopword
        "the aa bb cc dd ee ff gg hh ii jj",              # mean word len < 2? (all 2s + the=3) -> passes len, check
        "the " + " ".join(["supercalifragilistic"] * 12),  # mean word len > 10
    ]
    t = pa.table({"doc_id": pa.array(range(len(texts)), pa.int64()),
                  "text": pa.array(texts, pa.string()),
                  "lang": pa.array(["en"] * len(texts)),
                  "source": pa.array(["s"] * len(texts)),
                  "n_chars": pa.array([len(s) for s in texts], pa.int64())})
    pq.write_table(t, tmp_path / "documents.parquet")
    out = (to_table(textops.quality_filter_docs(str(tmp_path)))
           .to_pandas().set_index("doc_id"))
    assert 0 in out.index          # passes all gates
    assert 1 not in out.index      # min_words
    assert 2 not in out.index      # stopword gate
    assert 3 in out.index          # 11 words, mean len (3+20)/11 ~ 2.09 >= 2
    assert 4 not in out.index      # mean word len > 10
    assert out.loc[0, "n_words"] == 14


def test_task_hash_exchange_single_part(ray_session):
    """num_returns=1 hands back ONE ref to the whole returned list; the
    k==1 path must unwrap it so apply_fn sees the same payload type as
    k>1 (regression: every exchange crashed single-part before the
    unwrap_single_return fix)."""
    import ray.data as rd

    from weaver_ray.pipelines.common import task_hash_exchange, to_table

    ds = rd.from_pandas(pd.DataFrame({"k": [1, 2, 1, 3], "v": [10, 20, 30, 40]}))
    out = task_hash_exchange(
        ds,
        lambda df: np.zeros(len(df), dtype=np.int64),
        lambda df: df.groupby("k", as_index=False)["v"].sum(),
        num_parts=1)
    got = to_table(out).to_pandas().sort_values("k").reset_index(drop=True)
    assert list(got["k"]) == [1, 2, 3] and list(got["v"]) == [40, 20, 40]


def test_bucket_of_is_batch_independent(ray_session):
    """The bucket must be a function of the key VALUE alone: digit-only
    string keys must land where the same key lands in a mixed batch
    (regression: whole-batch to_numeric hashed '42' as an integer in an
    all-numeric batch and as a string elsewhere — joins silently dropped
    those keys), and an int key must co-bucket with its object-coerced
    string form."""
    from weaver_ray.pipelines.common import bucket_of, hash_join, to_table
    import ray.data as rd

    b_pure = bucket_of(pd.Series(["42", "1999"]), 16)
    b_mixed = bucket_of(pd.Series(["42", "1999", "abc"]), 16)
    assert list(b_pure) == list(b_mixed[:2])
    assert bucket_of(pd.Series([42], dtype=np.int64), 16)[0] == \
        bucket_of(pd.Series(["42"], dtype=object), 16)[0]

    # end-to-end: the confirmed repro — a join key whose one side arrives
    # in an all-numeric-parsable block must still meet its match
    left = rd.from_pandas(pd.DataFrame({"token": ["42"], "l": [1]}))
    right = rd.from_pandas(pd.DataFrame({"token": ["42", "abc"], "r": [7, 8]}))
    out = to_table(hash_join(left, right, on="token",
                             lcols=["token", "l"], rcols=["token", "r"]))
    assert out.num_rows == 1 and out.to_pandas()["r"].iloc[0] == 7


def test_partial_groupby_and_keyed_map_groups_randomized(ray_session):
    """Seeded randomized equivalence for the two grouped substrates:
    partial_groupby (BOTH reduce paths — Ray Aggregate and the
    many_groups bucketed exchange) must equal a single-process pandas
    groupby for sum/count/min/max over int and string keys, negative
    values, key cardinality from 1 to ~rows, and multi-block inputs;
    keyed_map_groups must deliver COMPLETE key groups to its fn
    (checked by a per-group order-sensitive fold that breaks if a
    group is split across buckets)."""
    import ray.data as rd

    from weaver_ray.pipelines.common import (keyed_map_groups,
                                             partial_groupby, to_table)

    rng = np.random.default_rng(4)
    for trial, n in enumerate([1, 13, 64, 200]):
        card = (1, 3, 17, 101)[trial]
        keys = rng.integers(0, card, n)
        as_str = trial % 2 == 1
        df = pd.DataFrame({
            "g": keys.astype(str) if as_str else keys,
            "v": rng.integers(-50, 50, n).astype(np.int64),
        })
        nblocks = (1, 2, 7, 5)[trial]
        # iloc-slice instead of np.array_split(df, ...): the latter routes
        # through DataFrame.swapaxes (deprecated -> FutureWarning spam)
        cuts = np.linspace(0, len(df), nblocks + 1).astype(int)
        parts = [df.iloc[a:b] for a, b in zip(cuts[:-1], cuts[1:])]
        ds = rd.from_pandas([p.reset_index(drop=True) for p in parts])

        expect = (df.groupby("g", as_index=False)
                  .agg(s=("v", "sum"), c=("v", "count"),
                       lo=("v", "min"), hi=("v", "max")))
        aggs = {"s": ("v", "sum"), "c": ("v", "count"),
                "lo": ("v", "min"), "hi": ("v", "max")}
        for many in (False, True):
            got = (to_table(partial_groupby(ds, ["g"], aggs,
                                            batch_size=16,
                                            many_groups=many))
                   .to_pandas().sort_values("g").reset_index(drop=True))
            pd.testing.assert_frame_equal(
                got.astype({"s": np.int64, "c": np.int64,
                            "lo": np.int64, "hi": np.int64}),
                expect.sort_values("g").reset_index(drop=True),
                check_dtype=False, check_like=True,
                obj=f"trial {trial} many_groups={many}")

        # keyed_map_groups: fn sees each key's COMPLETE group exactly once
        def fold(bucket: pd.DataFrame) -> pd.DataFrame:
            if not len(bucket):
                return pd.DataFrame({"g": bucket.get("g", pd.Series([])),
                                     "n": pd.Series([], dtype=np.int64),
                                     "s": pd.Series([], dtype=np.int64)})
            gg = bucket.groupby("g", as_index=False).agg(
                n=("v", "size"), s=("v", "sum"))
            return gg

        got = (to_table(keyed_map_groups(ds, "g", fold, num_buckets=8))
               .to_pandas().sort_values("g").reset_index(drop=True))
        exp2 = (df.groupby("g", as_index=False)
                .agg(n=("v", "size"), s=("v", "sum"))
                .sort_values("g").reset_index(drop=True))
        pd.testing.assert_frame_equal(got, exp2, check_dtype=False,
                                      obj=f"trial {trial} keyed_map_groups")


def test_hash_join_matches_pandas_merge_randomized(ray_session):
    """Seeded randomized equivalence for the two-sided task exchange:
    hash_join must equal a single-process pandas merge for every ``how``
    the repo uses (inner/left/outer — 21 call sites), across key dtypes
    (int64 and digit-parsable strings, the bucket_of stress case),
    bucket counts spanning the k==1 unwrap path and hash holes (16
    buckets over ≤12 keys), duplicate keys on both sides, and empty
    sides (zero-block schema defense in join_bucket's reindex)."""
    import ray.data as rd

    from weaver_ray.pipelines.common import hash_join, to_table

    def canon(df: pd.DataFrame) -> pd.DataFrame:
        out = pd.DataFrame({
            "k": df["k"].astype(str),
            "lv": pd.to_numeric(df["lv"], errors="coerce").astype(np.float64),
            "rv": pd.to_numeric(df["rv"], errors="coerce").astype(np.float64),
        })
        return (out.sort_values(["k", "lv", "rv"], na_position="last")
                .reset_index(drop=True))

    rng = np.random.default_rng(20260820)
    sizes = [(0, 7), (9, 0), (1, 1), (25, 3), (40, 40), (6, 31),
             (0, 0), (17, 17), (33, 2)]
    for trial, (nl, nr) in enumerate(sizes):
        how = ("inner", "left", "outer")[trial % 3]
        nb = (1, 3, 16)[trial % 3]
        as_str = trial % 2 == 1
        kl = rng.integers(0, 12, nl)
        kr = rng.integers(0, 12, nr)
        if as_str:
            kl, kr = kl.astype(str), kr.astype(str)
        ldf = pd.DataFrame({"k": kl, "lv": rng.integers(-5, 100, nl)})
        rdf = pd.DataFrame({"k": kr, "rv": rng.integers(-5, 100, nr)})
        expect = canon(ldf.merge(rdf, on="k", how=how))
        got = canon(to_table(hash_join(
            rd.from_pandas(ldf), rd.from_pandas(rdf), on="k",
            lcols=["k", "lv"], rcols=["k", "rv"],
            num_buckets=nb, how=how)).to_pandas())
        pd.testing.assert_frame_equal(
            got, expect, check_dtype=False,
            obj=f"trial {trial}: how={how} nb={nb} str={as_str} "
                f"sizes=({nl},{nr})")


def test_doc_token_entropy_hand_computed(tmp_path):
    from weaver_ray.pipelines import textops

    t = pa.table({
        "doc_id": pa.array([1, 2, 3, 4], pa.int64()),
        # 1: uniform over 4 distinct tokens -> H = 2 bits
        # 2: one token repeated -> H = 0
        # 3: counts (2,1,1): H = 2 - 2*log2(2)/4 ... = log2(4) - (2*1)/4 = 1.5
        # 4: no tokens at all -> excluded
        "text": pa.array(["a b c d", "x x x", "A a b c", "  .,!  "], pa.string()),
        "lang": pa.array(["en"] * 4),
        "source": pa.array(["s"] * 4),
        "n_chars": pa.array([7, 5, 7, 7], pa.int64()),
    })
    pq.write_table(t, tmp_path / "documents.parquet")
    out = (to_table(textops.doc_token_entropy(str(tmp_path))).to_pandas()
           .set_index("doc_id"))
    assert sorted(out.index) == [1, 2, 3]
    assert out.loc[1, "token_entropy"] == 2.0 and out.loc[1, "n_tokens"] == 4
    assert out.loc[2, "token_entropy"] == 0.0
    # lowercasing folds 'A' and 'a' -> counts (2,1,1) over 4 tokens
    assert out.loc[3, "token_entropy"] == 1.5


def test_segment_order_trend_matches_numpy_lstsq(ray_session):
    from weaver_ray.pipelines import analytics

    sf = "/root/testdata/sf0.001"
    eng = analytics.segment_order_trend(sf).set_index("c_mktsegment")
    orders = pd.read_parquet(sf + "/orders.parquet",
                             columns=["o_custkey", "o_totalprice",
                                      "o_orderdate"])
    cust = pd.read_parquet(sf + "/customer.parquet",
                           columns=["c_custkey", "c_mktsegment"])
    j = orders.merge(cust, left_on="o_custkey", right_on="c_custkey")
    j["x"] = (j["o_orderdate"].to_numpy().astype("datetime64[D]")
              .astype(np.float64)) - 9500
    for seg, g in j.groupby("c_mktsegment"):
        slope, intercept = np.polyfit(g["x"], g["o_totalprice"], 1)
        assert abs(eng.loc[seg, "slope"] - slope) < 1e-4
        assert abs(eng.loc[seg, "intercept"] - intercept) < 1e-2
        r = np.corrcoef(g["x"], g["o_totalprice"])[0, 1]
        assert abs(eng.loc[seg, "r2"] - r * r) < 1e-4
        assert eng.loc[seg, "n"] == len(g)


def test_contamination_neardup_flags_planted_leak(tmp_path):
    from weaver_ray.pipelines import textops

    t = pa.table({
        "doc_id": pa.array([53, 1, 2], pa.int64()),
        "text": pa.array([
            "alpha beta gamma delta epsilon",      # eval doc (53 % 53 == 0)
            "alpha beta gamma delta zeta",         # leak: 4 of 6 tokens shared
            "one two three four five",             # clean
        ], pa.string()),
        "lang": pa.array(["en"] * 3),
        "source": pa.array(["s"] * 3),
        "n_chars": pa.array([30, 28, 23], pa.int64()),
    })
    pq.write_table(t, tmp_path / "documents.parquet")
    out = (to_table(textops.contamination_neardup_pairs(str(tmp_path)))
           .to_pandas())
    assert len(out) == 1
    r = out.iloc[0]
    # |A ∩ B| = 4, |A ∪ B| = 6 -> jaccard 4/6
    assert (r["doc_id"], r["eval_doc"]) == (1, 53)
    assert abs(r["jaccard"] - round(4 / 6, 4)) < 1e-9


def test_docs_profile_counts_nulls_and_order(tmp_path):
    from weaver_ray.pipelines import analytics

    t = pa.table({
        "doc_id": pa.array([9, 10, 2], pa.int64()),
        "text": pa.array(["b", None, "a"], pa.string()),
        "lang": pa.array(["en", "de", "en"], pa.string()),
        "source": pa.array(["s1", "s1", "s2"], pa.string()),
        # null in an INT column: Arrow hands those blocks to pandas as
        # float64, which must not stringify 7 as '7.0' anywhere
        "n_chars": pa.array([7, None, 7], pa.int64()),
    })
    pq.write_table(t, tmp_path / "documents.parquet")
    out = (analytics.docs_profile(str(tmp_path))).set_index("col")
    # integer min/max reduce on the ORIGINAL dtype: '2' < '10' numerically
    # even though '10' < '2' lexicographically
    assert (out.loc["doc_id", "vmin"], out.loc["doc_id", "vmax"]) == ("2", "10")
    assert out.loc["text", "n_null"] == 1
    assert out.loc["text", "n_distinct"] == 2      # nulls don't count
    assert (out.loc["text", "vmin"], out.loc["text", "vmax"]) == ("a", "b")
    assert out.loc["lang", "n_distinct"] == 2
    assert (out["n"] == 3).all()
    # the float-coerced int column stringifies as int everywhere
    assert out.loc["n_chars", "n_null"] == 1
    assert out.loc["n_chars", "n_distinct"] == 1
    assert (out.loc["n_chars", "vmin"], out.loc["n_chars", "vmax"]) == ("7", "7")


def test_zorder_interleave_roundtrip(tmp_path):
    from weaver_ray.pipelines import analytics

    # hand example: u=0b1010, h=0b0110 -> z bits (h1 u1 h0 u0 ...) from LSB
    t = pa.table({
        "event_id": pa.array([1], pa.int64()),
        "ts": pa.array([np.datetime64("1970-01-01T06:00:00", "us")],
                       pa.timestamp("us")),  # epoch hour 6 = 0b0110
        "user_id": pa.array([10], pa.int64()),  # 0b1010
        "event_type": pa.array(["view"], pa.string()),
        "value": pa.array([0.0], pa.float64()),
        "props": pa.array(["{}"], pa.string()),
    })
    pq.write_table(t, tmp_path / "events.parquet")
    out = to_table(analytics.zorder_events(str(tmp_path))).to_pandas()
    z = int(out["zorder"].iloc[0])
    # interleave: sum_i u_i*4^i + 2*h_i*4^i with u=10, h=6
    expected = sum(((10 >> i) & 1) * 4**i + 2 * ((6 >> i) & 1) * 4**i
                   for i in range(16))
    assert z == expected
    # decode round-trip recovers both quantized keys
    u = sum(((z >> (2 * i)) & 1) << i for i in range(16))
    h = sum(((z >> (2 * i + 1)) & 1) << i for i in range(16))
    assert (u, h) == (10, 6)


def test_snapshot_diff_classifies_planted_changes(ray_session):
    from weaver_ray.pipelines import textops
    from weaver_ray.pipelines.common import to_table

    sf = "/root/testdata/sf0.001"
    out = (to_table(textops.snapshot_diff_docs(sf)).to_pandas()
           .set_index("doc_id"))
    docs = pd.read_parquet(sf + "/documents.parquet", columns=["doc_id"])
    ids = docs["doc_id"].to_numpy()
    base_max, n = int(ids.max()), len(ids)
    # removed: every 17th (unless also its own 10th-modified — removal wins)
    removed = set(ids[ids % 17 == 0])
    modified = set(ids[(ids % 10 == 0) & (ids % 17 != 0)])
    added = set(range(base_max + 1, base_max + 1 + n // 20))
    assert set(out.index[out["change"] == "removed"]) == removed
    assert set(out.index[out["change"] == "modified"]) == modified
    assert set(out.index[out["change"] == "added"]) == added
    # unchanged docs are absent from the report
    assert len(out) == len(removed) + len(modified) + len(added)


def test_snapshot_diff_partition_invariance(ray_session):
    from weaver_ray.pipelines import textops
    from weaver_ray.pipelines.common import to_table

    sf = "/root/testdata/sf0.001"
    outs = []
    for nb in (2, 16):
        o = (to_table(textops.snapshot_diff_docs(sf, num_buckets=nb))
             .to_pandas().sort_values("doc_id").reset_index(drop=True))
        outs.append(o)
    pd.testing.assert_frame_equal(outs[0], outs[1])


def test_bloom_semi_join_fp_robust_and_pruning(ray_session):
    """An UNDERSIZED bloom (1 bit/key -> heavy false positives) must still
    produce the exact result — the join, not the filter, decides — and the
    properly-sized filter must genuinely prune the orders side."""
    import duckdb

    exact = analytics.bloom_semi_join_revenue(SF)
    fp_heavy = analytics.bloom_semi_join_revenue(SF, bits_per_key=1)
    pd.testing.assert_frame_equal(exact, fp_heavy)

    # independent truth from DuckDB
    con = duckdb.connect()
    con.execute(f"CREATE VIEW customer AS SELECT * FROM '{SF}/customer.parquet'")
    con.execute(f"CREATE VIEW orders AS SELECT * FROM '{SF}/orders.parquet'")
    want = con.execute("""
        SELECT count(DISTINCT c.c_custkey) FROM customer c
        JOIN orders o ON o.o_custkey = c.c_custkey
        WHERE c.c_mktsegment = 'BUILDING'""").fetchone()[0]
    assert len(exact) == want

    # the filter bites: the 10-bit/key bloom passes far fewer order rows
    # than the full table (segment selectivity ~1/5 + ~1% FP)
    from weaver_ray.functions.sketches import BloomFilter

    cust = pq.read_table(f"{SF}/customer.parquet",
                         columns=["c_custkey", "c_mktsegment"]).to_pandas()
    keys = cust.loc[cust["c_mktsegment"] == "BUILDING", "c_custkey"]
    bf = BloomFilter(len(cust), bits_per_key=10)
    bf.add(keys.to_numpy(np.int64).astype(np.uint64))
    ok = pq.read_table(f"{SF}/orders.parquet", columns=["o_custkey"])
    frac = bf.maybe_contains(
        ok.column("o_custkey").to_numpy().astype(np.uint64)).mean()
    assert frac < 0.5, f"bloom pruned nothing ({frac:.2f} passed)"


def test_edit_distance_is_1_cases():
    from weaver_ray.pipelines.textops import _edit_distance_is_1 as e1

    assert e1("cat", "cut")          # substitution
    assert e1("cat", "cart")         # insertion
    assert e1("cart", "cat")         # deletion (either order)
    assert e1("cat", "ca")           # trailing deletion
    assert not e1("cat", "cat")      # identical -> 0
    assert not e1("cat", "cub")      # two substitutions
    assert not e1("cat", "carts")    # length diff 2
    assert not e1("abcd", "badc")    # transposition is distance 2


def test_token_typo_pairs_planted_recovery(ray_session):
    """Every planted deletion must be recovered as a pair with its base
    token (blocking is lossless at distance 1)."""
    import hashlib

    from weaver_ray.pipelines.textops import TOKEN_RE, token_typo_pairs

    out = token_typo_pairs(SF)
    got = set(map(tuple, out[["tok_a", "tok_b"]].to_numpy()))

    docs = pq.read_table(f"{SF}/documents.parquet", columns=["text"]).to_pandas()
    vocab = sorted({t for toks in docs["text"].str.lower().str.findall(TOKEN_RE)
                    for t in toks if len(t) >= 4})
    assert vocab, "empty vocabulary"
    for t in vocab:
        p = int(hashlib.md5(t.encode()).hexdigest()[:8], 16) % len(t)
        v = t[:p] + t[p + 1:]
        pair = (min(t, v), max(t, v))
        assert pair in got, f"planted pair {pair} missing"
    # symmetry/canonical form: tok_a strictly below tok_b, no dups
    assert (out["tok_a"] < out["tok_b"]).all()
    assert not out.duplicated(["tok_a", "tok_b"]).any()


def test_bpe_merges_golden_sequential(ray_session, tmp_path):
    """Engine == an independent sequential BPE trainer (same replace
    contract) over a tiny corpus with hand-checkable merges."""
    t = pa.table({
        "doc_id": pa.array([0, 1], pa.int64()),
        # 'lolo' x3, 'lo' x2  -> round 0 merges (l, o) with n = 3*2+2 = 8
        "text": pa.array(["lolo lolo lo", "lolo lo"], pa.string()),
        "lang": pa.array(["en", "en"]),
        "source": pa.array(["s", "s"]),
        "n_chars": pa.array([12, 7], pa.int32()),
    })
    pq.write_table(t, tmp_path / "documents.parquet")
    from weaver_ray.pipelines.textops import TOKEN_RE, bpe_merges

    out = bpe_merges(str(tmp_path), n_merges=2)

    # independent sequential trainer with the identical contract
    import collections
    import re

    toks = collections.Counter()
    for txt in t.column("text").to_pylist():
        for w in re.findall(TOKEN_RE, txt.lower()):
            toks[w] += 1
    vocab = {w: (" " + " ".join(w) + " ", f) for w, f in toks.items()}
    expect = []
    for rnd in range(2):
        pairs = collections.Counter()
        for sym, f in vocab.values():
            s = sym.split()
            for i in range(len(s) - 1):
                pairs[(s[i], s[i + 1])] += f
        (a, b), n = sorted(pairs.items(),
                           key=lambda kv: (-kv[1], kv[0]))[0]
        expect.append((rnd, a, b, a + b, n))
        vocab = {w: (sym.replace(f" {a} {b} ", f" {a}{b} "), f)
                 for w, (sym, f) in vocab.items()}
    got = list(map(tuple, out.to_numpy()))
    assert got == expect
    # round 0 by inspection: (l, o) appears 2x in 'lolo' (freq 3) + 1x in
    # 'lo' (freq 2) = 8; the alternating-run contract then leaves ' lo l o '
    assert got[0] == (0, "l", "o", "lo", 8)


def test_token_pmi_hand_corpus(ray_session, tmp_path):
    """Hand-computed PMI on a constructed corpus: the planted collocation
    ('neural', 'network' always together) must outrank independent pairs,
    values must match log2(N*cab/(ca*cb)) exactly, and sub-min_count
    pairs are dropped."""
    import math

    import pyarrow as pa
    import pyarrow.parquet as pq

    from weaver_ray.pipelines.common import sql_round
    from weaver_ray.pipelines.textops import token_pmi_pairs

    docs = []
    for i in range(20):  # 'neural network' in every even doc
        if i % 2 == 0:
            docs.append("neural network alpha")
        else:
            docs.append("alpha beta")
    pq.write_table(pa.table({"doc_id": pa.array(range(20), pa.int64()),
                             "text": pa.array(docs)}),
                   tmp_path / "documents.parquet")
    out = token_pmi_pairs(str(tmp_path), min_count=5, k=10)
    got = {(r.a, r.b): (r.n_docs_ab, r.pmi)
           for r in out.itertuples(index=False)}
    # planted pair: together 10 docs, each df 10, N=20 -> pmi = log2(2)=1
    assert got[("network", "neural")] == (10, 1.0)
    # independent-ish pair alpha/beta: cab=10, ca=20, cb=10 -> pmi 0
    assert got[("alpha", "beta")] == (10, 0.0)
    # ranking: the planted collocation is rank 1
    assert out.iloc[0]["a"] == "network" and out.iloc[0]["rank"] == 1
    # every reported pmi replays exactly
    for (a, b), (cab, pmi) in got.items():
        # df per token from the construction
        df = {"neural": 10, "network": 10, "alpha": 20, "beta": 10}
        expect = math.log2(20 * cab / (df[a] * df[b]))
        assert pmi == float(sql_round(expect, 6))


def test_bigram_logprob_hand_corpus(ray_session, tmp_path):
    """Exact replay of the add-one-smoothed bigram scores on a hand
    corpus, and the ordering property the unigram score cannot see: a
    document with corpus-typical token ORDER outscores one with the
    same tokens scrambled into rare transitions."""
    import math
    from collections import Counter

    import pyarrow as pa
    import pyarrow.parquet as pq

    from weaver_ray.pipelines.common import sql_round
    from weaver_ray.pipelines.textops import bigram_logprob_docs

    docs = ["a b c d"] * 8 + ["d c b a", "a b c d e"]
    pq.write_table(pa.table({"doc_id": pa.array(range(len(docs)), pa.int64()),
                             "text": pa.array(docs)}),
                   tmp_path / "documents.parquet")
    out = (bigram_logprob_docs(str(tmp_path)).to_pandas()
           .set_index("doc_id").sort_index())
    # sequential model replay
    bg = Counter()
    uni = set()
    for t in (d.split() for d in docs):
        uni.update(t)
        bg.update(zip(t[:-1], t[1:]))
    cp = Counter()
    for (p, _n), c in bg.items():
        cp[p] += c
    V = len(uni)
    for did, text in enumerate(docs):
        t = text.split()
        lps = [math.log2((bg[(p, n)] + 1) / (cp[p] + V))
               for p, n in zip(t[:-1], t[1:])]
        assert out.loc[did, "n_bigrams"] == len(lps)
        assert out.loc[did, "avg_logprob"] == float(
            sql_round(sum(lps) / len(lps), 4))
    # token order matters: the scrambled doc scores strictly lower than
    # the template docs built from the same unigrams
    assert out.loc[8, "avg_logprob"] < out.loc[0, "avg_logprob"]


def test_basket_rules_hand_corpus(ray_session, tmp_path):
    """Exact replay of support/confidence/lift on a hand basket table
    (brute-force itertools enumeration), including the min-count floor
    and the (lift desc, a, b) rank order."""
    from itertools import combinations

    import pyarrow as pa
    import pyarrow.parquet as pq

    from weaver_ray.pipelines.analytics import basket_rules_brands
    from weaver_ray.pipelines.common import sql_round

    # 12 orders over 4 brands; brands X,Y planted to co-occur often
    baskets = {
        1: ["X", "Y"], 2: ["X", "Y"], 3: ["X", "Y", "Z"], 4: ["X", "Y"],
        5: ["X", "Y", "W"], 6: ["X", "Z"], 7: ["Y", "Z"], 8: ["Z", "W"],
        9: ["X", "Y"], 10: ["W"], 11: ["X", "Y", "Z", "W"], 12: ["Z", "W"],
    }
    rows_o, rows_p = [], []
    pkey = {}
    for o, brs in baskets.items():
        for br in brs:
            pk = pkey.setdefault(br, len(pkey) + 1)
            rows_o.append(o)
            rows_p.append(pk)
            rows_o.append(o)        # duplicate lineitem: the DISTINCT
            rows_p.append(pk)       # basket must not double-count it
    pq.write_table(pa.table({
        "l_orderkey": pa.array(rows_o, pa.int64()),
        "l_partkey": pa.array(rows_p, pa.int64())}),
        tmp_path / "lineitem.parquet")
    pq.write_table(pa.table({
        "p_partkey": pa.array(list(pkey.values()), pa.int64()),
        "p_brand": pa.array(list(pkey.keys()))}),
        tmp_path / "part.parquet")

    out = basket_rules_brands(str(tmp_path), min_count=2, k=10)

    n = len(baskets)
    cnt = {}
    cab = {}
    for brs in baskets.values():
        s = sorted(set(brs))
        for br in s:
            cnt[br] = cnt.get(br, 0) + 1
        for a, b in combinations(s, 2):
            cab[(a, b)] = cab.get((a, b), 0) + 1
    expect = []
    for (a, b), c in cab.items():
        if c < 2:
            continue
        expect.append((
            float(sql_round(n * c / (cnt[a] * cnt[b]), 6)), a, b, c,
            float(sql_round(c / cnt[a], 6)), float(sql_round(c / cnt[b], 6))))
    expect.sort(key=lambda r: (-r[0], r[1], r[2]))
    assert len(out) == len(expect)
    for i, (lift, a, b, c, conf_ab, conf_ba) in enumerate(expect):
        row = out.iloc[i]
        assert (row["brand_a"], row["brand_b"]) == (a, b)
        assert row["n_orders_ab"] == c
        assert row["lift"] == lift
        assert row["conf_a_b"] == conf_ab
        assert row["conf_b_a"] == conf_ba
        assert row["rank"] == i + 1


def test_source_minhash_overlap_hand_corpus(ray_session, tmp_path):
    """Independent hashlib replay of the per-(source, seed) minima and
    the match counts; identical gram sets match every seed (est 1.0),
    disjoint sets match none (est 0.0)."""
    import hashlib

    import pyarrow as pa
    import pyarrow.parquet as pq

    from weaver_ray.pipelines.textops import (MH_OVERLAP_SEEDS,
                                              source_minhash_overlap)

    base = "alpha beta gamma delta epsilon zeta eta theta"
    half = "alpha beta gamma delta iota kappa lam mu"
    disj = "one two three four five six seven eight"
    docs = {"sA": base, "sB": base, "sC": half, "sD": disj}
    pq.write_table(pa.table({
        "source": pa.array(list(docs)),
        "text": pa.array(list(docs.values()))}),
        tmp_path / "documents.parquet")
    out = (source_minhash_overlap(str(tmp_path))
           .set_index(["src_a", "src_b"]).sort_index())

    def grams(text, n=4):
        t = text.split()
        return {" ".join(t[i:i + n]) for i in range(len(t) - n + 1)}

    def sig(gs):
        return [min(hashlib.md5(f"{s}|{g}".encode()).hexdigest()
                    for g in gs) for s in range(MH_OVERLAP_SEEDS)]

    sigs = {k: sig(grams(v)) for k, v in docs.items()}
    for (a, b), row in out.iterrows():
        expect = sum(x == y for x, y in zip(sigs[a], sigs[b]))
        assert row["n_seed_matches"] == expect
        assert row["est_jaccard"] == round(expect / MH_OVERLAP_SEEDS, 6)
    assert out.loc[("sA", "sB"), "est_jaccard"] == 1.0   # identical sets
    assert out.loc[("sA", "sD"), "n_seed_matches"] == 0  # disjoint sets
    assert 0 < out.loc[("sA", "sC"), "n_seed_matches"] < MH_OVERLAP_SEEDS


def test_merge_upsert_sequential_replay(ray_session, tmp_path):
    """apply(base, delta) == a sequential dict MERGE, including the
    delete-beats-update precedence on an id divisible by both 17 and
    10, and the synthetic insert ids."""
    import hashlib

    import pyarrow as pa
    import pyarrow.parquet as pq

    from weaver_ray.pipelines.textops import merge_upsert_docs

    ids = list(range(1, 41)) + [170]   # 170 % 17 == 0 AND % 10 == 0
    texts = [f"document body {i}" for i in ids]
    pq.write_table(pa.table({"doc_id": pa.array(ids, pa.int64()),
                             "text": pa.array(texts)}),
                   tmp_path / "documents.parquet")
    out = (merge_upsert_docs(str(tmp_path)).to_pandas()
           .set_index("doc_id").sort_index())

    # sequential MERGE replay
    tbl = dict(zip(ids, texts))
    for i in list(tbl):
        if i % 17 == 0:
            del tbl[i]              # delete wins over update
        elif i % 10 == 0:
            tbl[i] = tbl[i] + " [rev2]"
    for j in range(len(ids) // 20):
        tbl[170 + 1 + j] = f"new document {j} for snapshot two"

    assert sorted(out.index) == sorted(tbl)
    for i, text in tbl.items():
        assert out.loc[i, "h"] == hashlib.md5(text.encode()).hexdigest()
    assert 170 not in out.index    # the doubly-divisible id was deleted
    assert 171 in out.index and 172 in out.index  # inserts landed


def test_langid_confusion_hand_corpus(ray_session, tmp_path):
    """Confusion cells == an independent scorer replay on a hand corpus
    with one deliberately mislabeled row, and recall shares sum to 1
    per true class."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from weaver_ray.pipelines.textops import LangId, langid_confusion

    docs = [
        ("en", "the thing and the other thing"),     # en-profiled
        ("en", "der einber schung ich"),             # labeled en, looks de
        ("de", "der ein schung ich"),                # de-profiled
        ("es", "de la nacion de los"),               # es-profiled
    ]
    pq.write_table(pa.table({
        "doc_id": pa.array(range(len(docs)), pa.int64()),
        "lang": pa.array([l for l, _ in docs]),
        "text": pa.array([t for _, t in docs])}),
        tmp_path / "documents.parquet")
    out = langid_confusion(str(tmp_path))

    scorer = LangId()
    from collections import Counter
    expect = Counter((l, scorer._score(t)) for l, t in docs)
    assert len(out) == len(expect)
    for _, row in out.iterrows():
        assert expect[(row["lang"], row["pred_lang"])] == row["n"]
    shares = out.groupby("lang")["recall_share"].sum()
    assert (abs(shares - 1.0) < 1e-9).all()
    # the mislabeled row produces an off-diagonal cell
    assert ((out["lang"] != out["pred_lang"]) & (out["n"] > 0)).any()


def test_vocab_zipf_slope_polyfit_golden(ray_session, tmp_path):
    """Engine OLS == numpy.polyfit on a planted power-law corpus, and a
    perfect power law fits with r2 ~ 1 and the planted slope."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from weaver_ray.pipelines.textops import vocab_zipf_slope

    # token w{r} appears floor(1024 / r) times -> slope exactly -1 in
    # the infinite-precision limit (floor noise keeps it near -1)
    texts = []
    for r in range(1, 31):
        texts.extend([f"w{r:02d}"] * (1024 // r))
    pq.write_table(pa.table({
        "doc_id": pa.array(range(len(texts)), pa.int64()),
        "text": pa.array(texts)}),
        tmp_path / "documents.parquet")
    out = vocab_zipf_slope(str(tmp_path), k=30)

    counts = sorted((1024 // r for r in range(1, 31)), reverse=True)
    x = np.log2(np.arange(1, 31, dtype=float))
    y = np.log2(np.asarray(counts, dtype=float))
    slope, intercept = np.polyfit(x, y, 1)
    assert out.loc[0, "n_tokens"] == 30
    assert abs(out.loc[0, "slope"] - slope) < 1e-3
    assert abs(out.loc[0, "intercept"] - intercept) < 1e-3
    assert out.loc[0, "r2"] > 0.999
    assert abs(out.loc[0, "slope"] + 1.0) < 0.02


def test_hilbert_events_is_a_true_hilbert_curve(ray_session, tmp_path):
    """Exhaustive 16x16 grid at bits=4: the index is a permutation of
    0..255 AND consecutive positions are Manhattan-adjacent cells (the
    defining Hilbert locality property Morton order lacks), and it
    matches a per-row transcription of the public xy2d algorithm."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from weaver_ray.pipelines.analytics import hilbert_events

    bits, n = 4, 16
    xs, ys = np.meshgrid(np.arange(n), np.arange(n))
    xs, ys = xs.ravel(), ys.ravel()
    ts = (ys.astype("int64") * 3_600_000_000).astype("datetime64[us]")
    pq.write_table(pa.table({
        "event_id": pa.array(np.arange(len(xs)), pa.int64()),
        "user_id": pa.array(xs, pa.int64()),
        "ts": pa.array(ts)}),
        tmp_path / "events.parquet")
    out = (hilbert_events(str(tmp_path), bits=bits).to_pandas()
           .set_index("event_id").sort_index())
    d = out["hilbert"].to_numpy()

    def xy2d(x, y):
        rx = ry = 0
        dd = 0
        s = n // 2
        while s > 0:
            rx = 1 if (x & s) > 0 else 0
            ry = 1 if (y & s) > 0 else 0
            dd += s * s * ((3 * rx) ^ ry)
            if ry == 0:
                if rx == 1:
                    x, y = n - 1 - x, n - 1 - y
                x, y = y, x
            s //= 2
        return dd

    assert all(d[i] == xy2d(int(xs[i]), int(ys[i])) for i in range(len(xs)))
    assert sorted(d) == list(range(n * n))       # a permutation: space-filling
    pos = np.empty((n * n, 2), dtype=np.int64)   # cell of each curve step
    pos[d] = np.stack([xs, ys], axis=1)
    steps = np.abs(np.diff(pos, axis=0)).sum(axis=1)
    assert (steps == 1).all()                    # always adjacent cells


def test_token_cm_sketch_sequential_replay(ray_session, tmp_path):
    """CM estimates == an independent hashlib/array replay, every
    estimate >= truth (the one-sided CM guarantee), and a planted
    collision-free regime where estimates are exact."""
    import hashlib

    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from weaver_ray.pipelines.textops import (CM_D, CM_W,
                                              token_cm_sketch)

    docs = (["alpha"] * 30 + ["beta beta"] * 10 + ["gamma delta"] * 5
            + ["epsilon"] * 2)
    pq.write_table(pa.table({
        "doc_id": pa.array(range(len(docs)), pa.int64()),
        "text": pa.array(docs)}),
        tmp_path / "documents.parquet")
    out = token_cm_sketch(str(tmp_path)).set_index("token")

    cm = np.zeros((CM_D, CM_W), dtype=np.int64)
    exact = {"alpha": 30, "beta": 20, "gamma": 5, "delta": 5,
             "epsilon": 2}
    for t, n in exact.items():
        for r in range(CM_D):
            cm[r, int(hashlib.md5(f"{r}|{t}".encode())
                      .hexdigest()[:13], 16) % CM_W] += n
    for t, n in exact.items():
        e = min(cm[r, int(hashlib.md5(f"{r}|{t}".encode())
                          .hexdigest()[:13], 16) % CM_W]
                for r in range(CM_D))
        assert out.loc[t, "n_exact"] == n
        assert out.loc[t, "n_est"] == e
        assert out.loc[t, "overcount"] == e - n
        assert e >= n                      # one-sided guarantee
    # 5 tokens in 4x1024 cells: no collisions, estimates are exact
    assert (out["overcount"] == 0).all()


def test_skyline_orders_matches_bruteforce_dominance(ray_session):
    """The two-phase skyline equals O(n^2) brute-force dominance on the
    real sf0.001 orders table, and every excluded row IS dominated."""
    import pyarrow.parquet as pq

    from weaver_ray.pipelines.analytics import skyline_orders

    out = skyline_orders(SF)
    t = pq.read_table(f"{SF}/orders.parquet",
                      columns=["o_orderkey", "o_totalprice", "o_orderdate"])
    price = t["o_totalprice"].to_numpy()
    date = t["o_orderdate"].to_numpy()
    dominated = np.zeros(len(price), dtype=bool)
    for i in range(len(price)):           # 1500 rows: fine
        d = ((price >= price[i]) & (date <= date[i])
             & ((price > price[i]) | (date < date[i])))
        dominated[i] = d.any()
    expect = set(t["o_orderkey"].to_numpy()[~dominated])
    assert set(out["o_orderkey"]) == expect
    assert len(out) > 0


def test_zonemap_prune_certificate(ray_session):
    """Prune flags are lossless (pruned block => zero matches), the match
    total equals the exact predicate count, block stats tile the table,
    and the time-clustered layout actually prunes most blocks."""
    import pyarrow.parquet as pq
    import pyarrow.compute as pc

    from weaver_ray.pipelines.analytics import (ZM_NBLOCKS, ZM_TS_HI,
                                                ZM_TS_LO, ZM_VAL_LO,
                                                zonemap_prune_events)

    plan = zonemap_prune_events(SF)
    t = pq.read_table(f"{SF}/events.parquet", columns=["ts", "value"])
    span = (t.num_rows - 1) // ZM_NBLOCKS + 1
    assert len(plan) == (t.num_rows - 1) // span + 1
    assert (plan.loc[plan["pruned"] == 1, "rows_matched"] == 0).all()

    lo, hi = pd.Timestamp(ZM_TS_LO), pd.Timestamp(ZM_TS_HI)
    exact = pc.sum(pc.and_(pc.and_(
        pc.greater_equal(t["ts"], lo), pc.less(t["ts"], hi)),
        pc.greater_equal(t["value"], ZM_VAL_LO))).as_py()
    assert plan["rows_matched"].sum() == exact
    assert plan["n_rows"].sum() == t.num_rows
    # 3 days of a 30-day clustered stream: >2/3 of blocks must prune
    assert plan["pruned"].sum() > len(plan) * 2 // 3


def test_rle_blocks_sequential_replay(ray_session, tmp_path):
    """Block run counts + boundary flags replayed by a plain sequential
    scan; global runs reconstruct from the in-row stitching flags."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from weaver_ray.pipelines.analytics import rle_events_blocks

    rng = np.random.default_rng(7)
    n = 1000
    types = np.array(["a", "b", "c"], dtype=object)[
        rng.integers(0, 3, n)]
    # long runs so blocks actually merge across boundaries sometimes
    types[200:400] = "a"
    pq.write_table(pa.table({
        "event_id": pa.array(range(n), pa.int64()),
        "event_type": pa.array(types),
        "ts": pa.array([0] * n, pa.int64()),
        "value": pa.array([0.0] * n)}), tmp_path / "events.parquet")

    out = rle_events_blocks(str(tmp_path), nblocks=16)
    span = (n - 1) // 16 + 1
    seq_runs = {}
    for b in range(16):
        seg = types[b * span:(b + 1) * span]
        seq_runs[b] = 1 + int((seg[1:] != seg[:-1]).sum())
    assert dict(zip(out["block_id"], out["n_runs"])) == seq_runs
    global_runs = 1 + int((types[1:] != types[:-1]).sum())
    assert out["n_runs"].sum() - out["merged_with_prev"].sum() == global_runs
    assert (out["first_type"] == [types[b * span] for b in range(16)]).all()


def test_chi2_lang_source_known_tables(ray_session, tmp_path):
    """Perfect dependence gives Cramer's V == 1; an exactly independent
    2x2 table gives chi2 == 0."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from weaver_ray.pipelines.analytics import chi2_lang_source

    def write(docs, d):
        d.mkdir(exist_ok=True)
        lang, src = zip(*docs)
        pq.write_table(pa.table({
            "doc_id": pa.array(range(len(docs)), pa.int64()),
            "text": pa.array(["x"] * len(docs)),
            "lang": pa.array(list(lang)), "source": pa.array(list(src)),
            "n_chars": pa.array([1] * len(docs), pa.int64())}),
            d / "documents.parquet")
        return str(d)

    dep = write([("en", "s1")] * 10 + [("de", "s2")] * 10,
                tmp_path / "dep")
    r = chi2_lang_source(dep)
    assert r.loc[0, "cramers_v"] == 1.0 and r.loc[0, "dof"] == 1
    ind = write(([("en", "s1")] * 6 + [("en", "s2")] * 6
                 + [("de", "s1")] * 3 + [("de", "s2")] * 3),
                tmp_path / "ind")
    r2 = chi2_lang_source(ind)
    assert r2.loc[0, "chi2"] == 0.0


def test_mutual_knn_pairs_bruteforce(ray_session):
    """Mutual pairs == brute-force reciprocal top-k over the real
    embeddings (exact cosine, (cos desc, id asc) tiebreak)."""
    import pyarrow.parquet as pq

    from weaver_ray.pipelines.common import to_table
    from weaver_ray.pipelines.similarity import mutual_knn_pairs

    out = to_table(mutual_knn_pairs(SF, k=5)).to_pandas()
    t = pq.read_table(f"{SF}/embeddings.parquet",
                      columns=["vec_id", "embedding"])
    ids = t["vec_id"].to_numpy()
    order = np.argsort(ids)
    ids = ids[order]
    E = np.stack(t["embedding"].to_pylist())[order].astype(np.float64)
    En = E / np.linalg.norm(E, axis=1, keepdims=True)
    cos = En @ En.T
    np.fill_diagonal(cos, -np.inf)
    top = np.argsort(-cos, axis=1, kind="stable")[:, :5]
    nbrs = {ids[i]: set(ids[top[i]]) for i in range(len(ids))}
    expect = {(int(min(a, b)), int(max(a, b)))
              for a in nbrs for b in nbrs[a] if a in nbrs[b]}
    got = set(zip(out["id_lo"].astype(int), out["id_hi"].astype(int)))
    assert got == expect and len(expect) > 0


def test_priority_sample_unbiasedness_properties(ray_session):
    """DLT invariants on the real table: sample size == k, adjusted
    weights >= raw weights, threshold semantics (every sampled row's
    priority >= every excluded row's priority), and the estimator lands
    within 3 sketch-sigma of the true total."""
    import hashlib

    import pyarrow.parquet as pq

    from weaver_ray.pipelines.relational import (PRI_K,
                                                 priority_sample_events)

    out = priority_sample_events(SF)
    assert len(out) == PRI_K
    assert (out["adj_weight"] >= out["value"] - 1e-9).all()

    t = pq.read_table(f"{SF}/events.parquet", columns=["event_id", "value"])
    ids = t["event_id"].to_numpy()
    vals = t["value"].to_numpy()
    u = np.array([int(hashlib.md5(str(int(e)).encode())
                      .hexdigest()[:13], 16) + 1 for e in ids],
                 dtype=np.float64)
    pri = vals * 4503599627370496.0 / u
    order = np.lexsort((ids, -pri))
    expect = set(ids[order[:PRI_K]].tolist())
    assert set(out["event_id"].tolist()) == expect
    # the estimator replayed from the brute-force threshold is EXACT
    tau = pri[order[PRI_K]]
    est = round(float(np.maximum(vals[order[:PRI_K]], tau).sum()), 2)
    assert out.loc[0, "est_total"] == est
    assert abs(out.loc[0, "exact_total"] - round(float(vals.sum()), 2)) < 0.02
    # single fixed draw of a skewed weight set: loose sanity envelope only
    exact = out.loc[0, "exact_total"]
    assert abs(out.loc[0, "est_total"] - exact) / exact < 1.0


def test_kmv_set_ops_saturation_and_planted(ray_session, tmp_path):
    """Below k the sketch reports exact union/intersection; on a planted
    overlap the exact certificate columns are right."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from weaver_ray.pipelines.relational import kmv_set_ops

    rows = ([("click", u) for u in range(20)]
            + [("purchase", u) for u in range(10, 25)])
    et, uid = zip(*rows)
    pq.write_table(pa.table({
        "event_id": pa.array(range(len(rows)), pa.int64()),
        "ts": pa.array([0] * len(rows), pa.timestamp("us")),
        "user_id": pa.array(list(uid), pa.int64()),
        "event_type": pa.array(list(et)),
        "value": pa.array([1.0] * len(rows)),
        "props": pa.array(["{}"] * len(rows))}),
        tmp_path / "events.parquet")
    r = kmv_set_ops(str(tmp_path)).iloc[0]
    assert r["n_click_exact"] == 20 and r["n_purchase_exact"] == 15
    assert r["union_exact"] == 25 and r["inter_exact"] == 10
    # 25 < k=64: saturated, estimates ARE the exact values
    assert r["union_est"] == 25.0 and r["inter_est"] == 10.0
    assert r["jaccard_est"] == r["jaccard_exact"] == 0.4


def test_type_daily_ewma_recursion_replay(ray_session):
    """The closed-form cumulative fold equals the textbook recursion
    ewma_d = (x_d + ewma_{d-1}) / 2 replayed sequentially per type."""
    from weaver_ray.pipelines.temporal import type_daily_ewma

    out = type_daily_ewma(SF)
    for _t, g in out.groupby("event_type"):
        g = g.sort_values("day")
        e = None
        for x, got in zip(g["daily_value"], g["ewma"]):
            e = x if e is None else (x + e) / 2.0
            assert abs(e - got) < 5e-4     # both sides round to 1e-4
    assert out["ewma"].notna().all() and len(out) > 0


def test_cdc_chunking_shift_invariance(ray_session, tmp_path):
    """The property that makes CDC worth its hash: after PREPENDING text
    to a document, the chunk set differs only near the edit — the tail
    chunks (content-addressed) are shared, unlike fixed-size chunking
    where one insertion shifts every later chunk.  Also: planted exact
    duplicates dedup fully."""
    import hashlib

    import pyarrow as pa
    import pyarrow.parquet as pq

    from weaver_ray.pipelines.textops import (CDC_K, CDC_MOD,
                                              _rolling_hashes,
                                              cdc_chunk_dedup)

    rng = np.random.default_rng(3)
    base = "".join(rng.choice(list("abcdefgh ")) for _ in range(2000))
    shifted = "PREPENDED-HEADER-" + base

    def chunk_set(t):
        h = _rolling_hashes(t, CDC_K)
        cuts = (np.flatnonzero(h % CDC_MOD == 0) + CDC_K).tolist()
        starts = [0] + cuts
        ends = cuts + [len(t)]
        return [hashlib.md5(t[s:e].encode()).hexdigest()
                for s, e in zip(starts, ends) if e > s]

    a, b = chunk_set(base), chunk_set(shifted)
    shared = set(a) & set(b)
    # all but the first few chunks of the shifted doc must be shared
    assert len(shared) >= len(a) - 2 and len(a) > 10

    docs = [base, shifted, base]          # one exact duplicate planted
    pq.write_table(pa.table({
        "doc_id": pa.array(range(3), pa.int64()),
        "text": pa.array(docs)}), tmp_path / "documents.parquet")
    out = cdc_chunk_dedup(str(tmp_path)).iloc[0]
    # the duplicate doc's chunks all dedup: max_copies >= 2 and savings
    # at least the duplicate doc's full length
    assert out["max_copies"] >= 2
    assert out["chars_saved"] >= len(base)
    assert out["n_chunks"] - out["n_unique"] == out["dup_chunks"]
    assert out["chars_total"] == sum(len(d) for d in docs)


def test_bpe_encode_sequential_replay(ray_session, tmp_path):
    """Per-doc BPE token counts equal a sequential replay that re-trains
    the merges and re-encodes each document with plain str.replace."""
    import re

    import pyarrow as pa
    import pyarrow.parquet as pq

    from weaver_ray.pipelines.textops import (TOKEN_RE, bpe_encode_docs,
                                              bpe_merges)

    docs = ["the cat sat on the mat", "the cat ate the rat",
            "rats sat on cats", ""]
    pq.write_table(pa.table({
        "doc_id": pa.array(range(len(docs)), pa.int64()),
        "text": pa.array(docs)}), tmp_path / "documents.parquet")

    merges = bpe_merges(str(tmp_path), n_merges=4)
    out = bpe_encode_docs(str(tmp_path), n_merges=4).set_index("doc_id")

    def enc(word):
        s = " " + " ".join(word) + " "
        for _r, a, b, _m, _n in merges.itertuples(index=False):
            s = s.replace(f" {a} {b} ", f" {a}{b} ")
        return len(s.split())

    for i, d in enumerate(docs):
        toks = re.findall(TOKEN_RE, d.lower())
        if not toks:
            assert i not in out.index     # zero-token docs are absent
            continue
        assert out.loc[i, "n_words"] == len(toks)
        assert out.loc[i, "n_chars_tok"] == sum(len(t) for t in toks)
        assert out.loc[i, "n_bpe_tokens"] == sum(enc(t) for t in toks)
        # merges can only shorten: n_bpe <= chars, >= words
        assert (out.loc[i, "n_words"] <= out.loc[i, "n_bpe_tokens"]
                <= out.loc[i, "n_chars_tok"])


def test_zonemap_layout_compare_clustering_pays(ray_session):
    """Both layouts see the same matches; the value-clustered layout
    prunes most blocks while the natural layout prunes none (value is
    uncorrelated with event_id), and no pruned block hides a match:
    scan_rows >= rows_matched per layout."""
    from weaver_ray.pipelines.analytics import zonemap_layout_compare

    out = zonemap_layout_compare(SF).set_index("layout")
    nat, srt = out.loc["natural"], out.loc["value_sorted"]
    assert nat["rows_matched"] == srt["rows_matched"] > 0
    # clustering pays: strictly more pruning than the natural layout
    # (tiny sf0.001 blocks prune some natural blocks by luck, so the
    # claim is relative, not "natural prunes zero")
    assert srt["n_pruned"] > nat["n_pruned"]
    assert srt["n_pruned"] > srt["n_blocks"] * 2 // 3
    assert srt["scan_rows"] >= srt["rows_matched"]
    assert srt["scan_rows"] < nat["scan_rows"]


def test_ams_join_size_replay_and_planted(ray_session, tmp_path):
    """The sketch replayed sequentially with hashlib equals the engine's
    estimate exactly (the estimator is deterministic given the hash),
    and a planted table gives the known exact join size."""
    import hashlib

    import pyarrow as pa
    import pyarrow.parquet as pq

    from weaver_ray.pipelines.relational import AMS_D, ams_join_size

    # f_click = {u0: 3, u1: 1}, f_purchase = {u0: 2, u2: 5}
    rows = ([(0, "click")] * 3 + [(1, "click")]
            + [(0, "purchase")] * 2 + [(2, "purchase")] * 5
            + [(3, "view")] * 4)
    uid, et = zip(*rows)
    pq.write_table(pa.table({
        "event_id": pa.array(range(len(rows)), pa.int64()),
        "ts": pa.array([0] * len(rows), pa.timestamp("us")),
        "user_id": pa.array(list(uid), pa.int64()),
        "event_type": pa.array(list(et)),
        "value": pa.array([1.0] * len(rows)),
        "props": pa.array(["{}"] * len(rows))}),
        tmp_path / "events.parquet")

    out = ams_join_size(str(tmp_path)).iloc[0]
    assert out["exact_join_size"] == 3 * 2   # only u0 joins

    f = {0: (3, 2), 1: (1, 0), 2: (0, 5)}
    prods = []
    for r in range(AMS_D):
        sa = sb = 0
        for u, (fa, fb) in f.items():
            s = (int(hashlib.md5(f"{r}|{u}".encode()).hexdigest()[:13],
                     16) % 2) * 2 - 1
            sa += fa * s
            sb += fb * s
        prods.append(sa * sb)
    assert out["est_join_size"] == sum(prods) / AMS_D


def test_image_magic_check_flags_corruption(ray_session):
    """Every corpus blob's magic agrees with its declared fmt (the
    generator writes real containers), and a corrupted prefix is what
    the check exists to flag — verified on a hand-built frame through
    the same prep logic."""
    from weaver_ray.pipelines.images import (FMT_MAGICS,
                                             image_magic_check)

    out = image_magic_check(SF)
    assert set(out["fmt"]) == {"png", "jpeg"}
    assert (out["n_magic_ok"] == out["n_images"]).all()
    assert out.loc[out["fmt"] == "png", "magic_hex"].iloc[0] == "89504E47"
    assert (out.loc[out["fmt"] == "jpeg", "magic_hex"].iloc[0]
            .startswith("FFD8"))
    assert set(FMT_MAGICS) == {"png", "jpeg"}   # contract columns exist


def test_kcenter_coreset_greedy_replay(ray_session):
    """The distributed farthest-first trace equals a sequential numpy
    replay on the real embeddings; radii are non-increasing and the
    residual radius covers every point."""
    import pyarrow.parquet as pq

    from weaver_ray.pipelines.common import sql_round
    from weaver_ray.pipelines.similarity import KC_K, kcenter_coreset

    out = kcenter_coreset(SF)
    t = pq.read_table(f"{SF}/embeddings.parquet",
                      columns=["vec_id", "embedding"])
    ids = t["vec_id"].to_numpy()
    X = np.stack(t["embedding"].to_pylist()).astype(np.float64)
    order = np.argsort(ids)
    ids, X = ids[order], X[order]

    chosen = [int(ids[0])]
    trace = [(0, chosen[0], 0.0)]
    for r in range(1, KC_K + 1):
        C = X[np.isin(ids, chosen)]
        D = ((X[:, None, :] - C[None, :, :]) ** 2).sum(axis=2)
        mind = sql_round(D, 9).min(axis=1)
        i = int(np.lexsort((ids, -mind))[0])
        trace.append((r, int(ids[i]), float(sql_round(mind[i], 6))))
        if r < KC_K:
            chosen.append(int(ids[i]))
    expect = pd.DataFrame(trace,
                          columns=["sel_round", "vec_id", "radius_sq"])
    pd.testing.assert_frame_equal(
        out.astype({"vec_id": np.int64}), expect.astype(
            {"sel_round": np.int64, "vec_id": np.int64}),
        check_dtype=False)
    r = out["radius_sq"].to_numpy()
    assert (np.diff(r[1:]) <= 1e-12).all()   # non-increasing after seed


def test_value_drift_psi_known_shift(ray_session, tmp_path):
    """A planted distribution shift yields a large PSI; identical halves
    yield ~0 (only smoothing noise).  Terms reconstruct the total."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from weaver_ray.pipelines.relational import value_drift_psi

    def write(vals_a, vals_b, d):
        d.mkdir(exist_ok=True)
        ts = ([np.datetime64("2024-01-05", "us")] * len(vals_a)
              + [np.datetime64("2024-01-20", "us")] * len(vals_b))
        v = list(vals_a) + list(vals_b)
        pq.write_table(pa.table({
            "event_id": pa.array(range(len(v)), pa.int64()),
            "ts": pa.array(ts, pa.timestamp("us")),
            "user_id": pa.array([0] * len(v), pa.int64()),
            "event_type": pa.array(["click"] * len(v)),
            "value": pa.array(v, pa.float64()),
            "props": pa.array(["{}"] * len(v))}), d / "events.parquet")
        return str(d)

    same = value_drift_psi(write([10.0] * 50 + [210.0] * 50,
                                 [10.0] * 50 + [210.0] * 50,
                                 tmp_path / "same"))
    assert same["psi_total"].iloc[0] < 0.01
    shift = value_drift_psi(write([10.0] * 100, [460.0] * 100,
                                  tmp_path / "shift"))
    assert shift["psi_total"].iloc[0] > 1.0
    assert abs(shift["psi_term"].sum() - shift["psi_total"].iloc[0]) < 1e-4


def test_daily_distinct_users_3d_replay(ray_session):
    """The rolling distinct equals a brute-force per-window set union on
    the real table, and exceeds any single day's distinct count."""
    import duckdb

    from weaver_ray.pipelines.temporal import daily_distinct_users_3d

    out = daily_distinct_users_3d(SF).set_index("day")
    df = duckdb.sql(
        f"SELECT DISTINCT user_id, date_trunc('day', ts) AS day "
        f"FROM '{SF}/events.parquet'").df()
    days = sorted(df["day"].unique())
    by_day = {d: set(df.loc[df["day"] == d, "user_id"]) for d in days}
    for d in days:
        win = set()
        for i in range(3):
            win |= by_day.get(d - pd.Timedelta(days=i), set())
        assert out.loc[d, "distinct_users_3d"] == len(win)
    assert len(out) == len(days)


def test_dataset_split_stability_under_growth(ray_session, tmp_path):
    """The leakage-proof property itself: adding documents never moves
    an existing doc's split; fractions land near 80/10/10."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from weaver_ray.pipelines.textops import dataset_split_assign

    def write(n, d):
        d.mkdir(exist_ok=True)
        pq.write_table(pa.table({
            "doc_id": pa.array(range(n), pa.int64()),
            "text": pa.array(["x"] * n),
            "lang": pa.array(["en"] * n),
            "source": pa.array(["s"] * n),
            "n_chars": pa.array([1] * n, pa.int64())}),
            d / "documents.parquet")
        return str(d)

    small = dataset_split_assign(write(500, tmp_path / "a"))
    big = dataset_split_assign(write(2000, tmp_path / "b"))
    by = lambda df: df.groupby("split")["n_docs"].sum()
    s, b = by(small), by(big)
    # growth keeps every earlier doc in place, so per-split counts can
    # only grow; fractions sit near the contract
    for k in ("train", "val", "test"):
        assert b.get(k, 0) >= s.get(k, 0)
    assert abs(b["train"] / 2000 - 0.8) < 0.05
    assert abs(b["val"] / 2000 - 0.1) < 0.03


def test_daily_cusum_detects_planted_shift(ray_session, tmp_path):
    """A mean shift planted mid-stream drives the CUSUM up after the
    change day and the statistic replays the textbook recursion."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from weaver_ray.pipelines.temporal import daily_cusum_drift

    days = 20
    vals, ts = [], []
    for d in range(days):
        for i in range(10):
            vals.append(10.0 if d < 12 else 30.0)   # shift at day 12
            ts.append(np.datetime64("2024-01-01", "us")
                      + np.timedelta64(d, "D") + np.timedelta64(i, "m"))
    pq.write_table(pa.table({
        "event_id": pa.array(range(len(vals)), pa.int64()),
        "ts": pa.array(ts, pa.timestamp("us")),
        "user_id": pa.array([0] * len(vals), pa.int64()),
        "event_type": pa.array(["click"] * len(vals)),
        "value": pa.array(vals, pa.float64()),
        "props": pa.array(["{}"] * len(vals))}), tmp_path / "events.parquet")

    out = daily_cusum_drift(str(tmp_path)).sort_values("day")
    s = out["cusum_cents"].to_numpy()
    # replay the recursion S_t = max(0, S_{t-1} + (mc_t - mu))
    mc = np.where(np.arange(days) < 12, 1000.0, 3000.0)
    mu = np.floor(mc.mean() + 0.5)
    acc, expect = 0.0, []
    for x in mc:
        acc = max(0.0, acc + (x - mu))
        expect.append(acc)
    assert np.array_equal(s, np.array(expect))
    assert s[-1] > s[11]          # rises after the planted change
    assert (s[:12] == 0).all()    # below-mean prefix pins to zero


def test_srp_hamming_tracks_cosine(ray_session):
    """The LSH property on the real embeddings: candidate pairs with
    small signature hamming have higher cosine on average than pairs
    with large hamming, and every reported hamming equals a sequential
    signature replay."""
    import hashlib

    import pyarrow.parquet as pq

    from weaver_ray.pipelines.common import to_table
    from weaver_ray.pipelines.similarity import (SRP_BITS, SRP_SCALE,
                                                 srp_band_candidates)

    out = to_table(srp_band_candidates(SF)).to_pandas()
    assert len(out) > 0

    t = pq.read_table(f"{SF}/embeddings.parquet",
                      columns=["vec_id", "embedding"])
    ids = t["vec_id"].to_numpy()
    X = np.stack(t["embedding"].to_pylist()).astype(np.float64)
    sgn = np.array([[1 if int(hashlib.md5(f"{b}|{d}".encode())
                              .hexdigest()[:13], 16) % 2 == 0 else -1
                     for d in range(64)] for b in range(SRP_BITS)])
    XI = np.sign(X) * np.floor(np.abs(X) * SRP_SCALE + 0.5)
    sig = (((XI @ sgn.T) > 0).astype(np.int64)
           @ (1 << np.arange(SRP_BITS, dtype=np.int64)))
    by_id = dict(zip(ids, sig))
    Xn = X / np.linalg.norm(X, axis=1, keepdims=True)
    pos = {int(v): i for i, v in enumerate(ids)}

    cos = np.array([Xn[pos[a]] @ Xn[pos[b]]
                    for a, b in zip(out["id_lo"], out["id_hi"])])
    ham_replay = np.array([bin(by_id[a] ^ by_id[b]).count("1")
                           for a, b in zip(out["id_lo"], out["id_hi"])])
    assert np.array_equal(out["hamming"].to_numpy(), ham_replay)
    lo = cos[out["hamming"] <= 2]
    hi = cos[out["hamming"] >= 6]
    if len(lo) and len(hi):
        assert lo.mean() > hi.mean()


def test_voptimal_histogram_optimality(ray_session):
    """The DP's segmentation on the real table: segments tile [0, 63],
    total reconstructs from segment SSEs, and the k-segment total SSE
    beats (or ties) the naive equi-width split into k segments —
    optimality spot-check against one competitor partition."""
    import duckdb

    from weaver_ray.pipelines.relational import (VOPT_BINS, VOPT_K,
                                                 VOPT_VMAX,
                                                 voptimal_histogram)

    out = voptimal_histogram(SF)
    assert len(out) == VOPT_K
    assert out["bin_lo"].iloc[0] == 0
    assert out["bin_hi"].iloc[-1] == VOPT_BINS - 1
    assert (out["bin_lo"].to_numpy()[1:]
            == out["bin_hi"].to_numpy()[:-1] + 1).all()
    assert abs(out["sse_cents"].sum() - out["total_sse"].iloc[0]) < 0.1

    df = duckdb.sql(f"SELECT value FROM '{SF}/events.parquet'").df()
    cents = np.floor(df["value"].to_numpy() * 100.0 + 0.5)
    bins = np.minimum(np.floor(df["value"].to_numpy() * VOPT_BINS
                               / VOPT_VMAX), VOPT_BINS - 1).astype(int)

    def sse_of(lo, hi):
        x = cents[(bins >= lo) & (bins <= hi)]
        return 0.0 if not len(x) else float(
            (x ** 2).sum() - x.sum() ** 2 / len(x))

    # competitor: equi-width split
    edges = np.linspace(0, VOPT_BINS, VOPT_K + 1).astype(int)
    naive = sum(sse_of(edges[i], edges[i + 1] - 1)
                for i in range(VOPT_K))
    assert out["total_sse"].iloc[0] <= naive + 0.1
    # segment SSEs agree with a brute-force recompute
    for _i, r in out.iterrows():
        assert abs(sse_of(r["bin_lo"], r["bin_hi"]) - r["sse_cents"]) < 0.5


def test_assortativity_known_graphs(ray_session, tmp_path, monkeypatch):
    """A star graph is maximally disassortative (r == -1); the engine's
    moment route equals networkx-free brute-force Pearson on stubs."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from weaver_ray.pipelines import pagerank as pr

    d = tmp_path / "edges"
    d.mkdir()
    # star: hub 0 — leaves 1..5
    pq.write_table(pa.table({
        "src_host": pa.array([0, 0, 0, 0, 0], pa.int64()),
        "dst_host": pa.array([1, 2, 3, 4, 5], pa.int64())}),
        d / "part-00000.parquet")
    (d / "_DONE").write_text("test\n")
    monkeypatch.setattr(pr, "generate_host_edges",
                        lambda n_base=1000, **kw: str(d))
    out = pr.host_degree_assortativity(SF).iloc[0]
    assert out["n_edges"] == 5 and out["n_hosts"] == 6
    assert out["assortativity"] == -1.0


def test_emd_known_shift(ray_session, tmp_path):
    """W1 between two point masses k bins apart equals k * bin_width;
    identical distributions give zero."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from weaver_ray.pipelines.relational import (EMD_BINS, VOPT_VMAX,
                                                 click_purchase_value_emd)

    w = VOPT_VMAX / EMD_BINS

    def write(cv, pv, d):
        d.mkdir(exist_ok=True)
        et = ["click"] * len(cv) + ["purchase"] * len(pv)
        v = list(cv) + list(pv)
        pq.write_table(pa.table({
            "event_id": pa.array(range(len(v)), pa.int64()),
            "ts": pa.array([0] * len(v), pa.timestamp("us")),
            "user_id": pa.array([0] * len(v), pa.int64()),
            "event_type": pa.array(et),
            "value": pa.array(v, pa.float64()),
            "props": pa.array(["{}"] * len(v))}), d / "events.parquet")
        return str(d)

    # click mass at bin 2 (v=18), purchase mass at bin 10 (v=80)
    r = click_purchase_value_emd(write([18.0] * 40, [80.0] * 40,
                                       tmp_path / "a")).iloc[0]
    assert r["emd_value"] == round(8 * w, 6)
    r0 = click_purchase_value_emd(write([18.0] * 40, [18.0] * 10,
                                        tmp_path / "b")).iloc[0]
    assert r0["emd_value"] == 0.0 and r0["emd_numerator"] == 0


def test_llr_planted_collocation(ray_session, tmp_path):
    """A pair that always co-occurs scores far above an independent
    pair with the same marginals, and the statistic matches a direct
    2x2 G-test computation."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from weaver_ray.pipelines.textops import token_llr_pairs

    # "alpha beta" always together (20 docs); "gamma"/"delta" appear in
    # 20 docs each but only overlap in 5; 40 filler docs
    docs = (["alpha beta"] * 20
            + ["gamma delta"] * 5 + ["gamma zz"] * 15 + ["delta yy"] * 15
            + ["filler"] * 40)
    pq.write_table(pa.table({
        "doc_id": pa.array(range(len(docs)), pa.int64()),
        "text": pa.array(docs)}), tmp_path / "documents.parquet")
    out = token_llr_pairs(str(tmp_path), min_count=5).set_index(["a", "b"])
    ab = out.loc[("alpha", "beta"), "llr"]
    gd = out.loc[("delta", "gamma"), "llr"]
    assert ab > gd > 0

    def xlx(x):
        return x * np.log(x) if x > 0 else 0.0

    n, cab, ca, cb = 95.0, 20.0, 20.0, 20.0
    expect = 2 * (xlx(cab) + xlx(ca - cab) + xlx(cb - cab)
                  + xlx(n - ca - cb + cab) - xlx(ca) - xlx(n - ca)
                  - xlx(cb) - xlx(n - cb) + xlx(n))
    assert abs(ab - expect) < 1e-3


def test_heaps_law_fit_curve_properties(ray_session, tmp_path):
    """Vocabulary growth is monotone and matches a sequential scan; a
    closed-vocabulary corpus fits beta ~ 0, a mint-every-token corpus
    fits beta ~ 1."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from weaver_ray.pipelines.textops import heaps_law_fit

    def write(docs, d):
        d.mkdir(exist_ok=True)
        pq.write_table(pa.table({
            "doc_id": pa.array(range(len(docs)), pa.int64()),
            "text": pa.array(docs)}), d / "documents.parquet")
        return str(d)

    closed = write(["aa bb cc"] * 64, tmp_path / "closed")
    c = heaps_law_fit(closed)
    assert (np.diff(c["vocab"]) >= 0).all()
    assert c["vocab"].iloc[-1] == 3 and abs(c["beta"].iloc[0]) < 0.05

    minty = write([f"tok{3*i} tok{3*i+1} tok{3*i+2}" for i in range(64)],
                  tmp_path / "minty")
    m = heaps_law_fit(minty)
    assert m["vocab"].iloc[-1] == 192
    assert abs(m["beta"].iloc[0] - 1.0) < 0.05
    # sequential replay of the curve on the minty corpus
    assert list(m["n_tokens"]) == [3 * k for k in list(m["k_docs"])]


def test_neyman_allocation_properties(ray_session, tmp_path):
    """Allocations sum to the budget, track N_h * sigma_h (the wide
    stratum gets more than the constant one of equal size), selection
    counts meet allocations, and small strata saturate."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from weaver_ray.pipelines.textops import neyman_sample_docs

    rng = np.random.default_rng(5)
    langs, chars = [], []
    langs += ["wide"] * 200
    chars += list(rng.integers(10, 2000, 200))     # high sigma
    langs += ["tight"] * 200
    chars += [500] * 200                            # sigma == 0
    langs += ["tiny"] * 3
    chars += list(rng.integers(10, 2000, 3))        # saturates
    pq.write_table(pa.table({
        "doc_id": pa.array(range(len(langs)), pa.int64()),
        "text": pa.array(["x"] * len(langs)),
        "lang": pa.array(langs), "source": pa.array(["s"] * len(langs)),
        "n_chars": pa.array([int(c) for c in chars], pa.int64())}),
        tmp_path / "documents.parquet")
    out = neyman_sample_docs(str(tmp_path), total=50).set_index("lang")
    assert (out["n_selected"] == out["alloc"]).all()
    assert out.loc["tight", "alloc"] == 0          # zero variance
    assert out.loc["wide", "alloc"] >= 40
    assert out.loc["tiny", "alloc"] <= 3


def test_bloom_index_guarantees(ray_session):
    """Zero false negatives (candidates >= actuals per probe), the
    absent probe has zero actual blocks, and actual counts match a
    direct scan."""
    import duckdb

    from weaver_ray.pipelines.relational import (BLIDX_NBLOCKS,
                                                 BLIDX_PROBES,
                                                 bloom_index_prune)

    out = bloom_index_prune(SF).set_index("user_id")
    assert (out["n_blocks_candidate"] >= out["n_blocks_actual"]).all()
    assert (out["n_false_positive"] >= 0).all()
    assert out.loc[99999, "n_blocks_actual"] == 0

    df = duckdb.sql(f"SELECT event_id, user_id "
                    f"FROM '{SF}/events.parquet'").df()
    span = (len(df) - 1) // BLIDX_NBLOCKS + 1
    for u in BLIDX_PROBES[:3]:
        blocks = set(df.loc[df["user_id"] == u, "event_id"] // span)
        assert out.loc[u, "n_blocks_actual"] == len(blocks)


def test_decision_stump_planted_split(ray_session, tmp_path):
    """A perfectly separable planted table recovers the true threshold
    with gain == the root entropy (all uncertainty removed)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from weaver_ray.pipelines.relational import (VOPT_VMAX, STUMP_BINS,
                                                 decision_stump_value_type)

    w = VOPT_VMAX / STUMP_BINS
    # class A strictly below edge 16, class B strictly above
    vals = [5.0] * 60 + [200.0] * 40
    et = ["low"] * 60 + ["high"] * 40
    pq.write_table(pa.table({
        "event_id": pa.array(range(100), pa.int64()),
        "ts": pa.array([0] * 100, pa.timestamp("us")),
        "user_id": pa.array([0] * 100, pa.int64()),
        "event_type": pa.array(et),
        "value": pa.array(vals, pa.float64()),
        "props": pa.array(["{}"] * 100)}), tmp_path / "events.parquet")
    out = decision_stump_value_type(str(tmp_path))
    best = out["best_edge"].iloc[0]
    # any edge strictly between the two masses separates perfectly
    assert 5.0 / w < best <= 200.0 / w
    p = 0.6
    h_root = -(p * np.log(p) + (1 - p) * np.log(1 - p))
    assert abs(out["best_gain"].iloc[0] - h_root) < 1e-4
    # the profile row at the best edge carries the same gain
    assert (out.set_index("edge").loc[best, "gain"]
            == out["best_gain"].iloc[0])


def test_mst_boruvka_vs_kruskal_replay(ray_session):
    """The distributed Boruvka forest equals a sequential Kruskal with
    the same (w, a, b) tie order on the real host graph; tree invariants
    hold (|E| = |V| - #components, spans all components)."""
    import duckdb

    from weaver_ray.pipelines.pagerank import (generate_host_edges,
                                               host_mst_boruvka)

    out = host_mst_boruvka(SF)
    glob = generate_host_edges(1000) + "/part-*.parquet"
    e = duckdb.sql(f"""
        SELECT least(src_host, dst_host) AS a,
               greatest(src_host, dst_host) AS b, count(*)::BIGINT AS w
        FROM read_parquet('{glob}') WHERE src_host <> dst_host
        GROUP BY 1, 2""").df()

    parent = {}

    def find(x):
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    kruskal = []
    for r in e.sort_values(["w", "a", "b"]).itertuples(index=False):
        ra, rb = find(int(r.a)), find(int(r.b))
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
            kruskal.append((int(r.a), int(r.b), int(r.w)))
    expect = set(kruskal)
    got = set(zip(out["a"].astype(int), out["b"].astype(int),
                  out["w"].astype(int)))
    assert got == expect
    nodes = set(e["a"]).union(set(e["b"]))
    n_comp = len({find(v) for v in nodes})
    assert len(out) == len(nodes) - n_comp
    assert out["n_components"].iloc[0] == n_comp
    assert out["total_w"].iloc[0] == sum(w for _a, _b, w in expect)


def test_matryoshka_recall_bruteforce_replay(ray_session):
    """Per-query overlap equals a brute-force replay of both rankings,
    full-prefix (trivially) gives recall 1 when prefix == dim, and mean
    reconstructs from the rows."""
    import pyarrow.parquet as pq

    from weaver_ray.pipelines.similarity import (MRL_K, MRL_PREFIX,
                                                 MRL_QUERIES,
                                                 matryoshka_recall)

    out = matryoshka_recall(SF).set_index("query_id")
    t = pq.read_table(f"{SF}/embeddings.parquet",
                      columns=["vec_id", "embedding"])
    ids = t["vec_id"].to_numpy()
    X = np.stack(t["embedding"].to_pylist()).astype(np.float64)

    def topk(Q, E, qid):
        m = ids != qid
        cos = (Q / np.linalg.norm(Q)) @ (
            E[m] / np.linalg.norm(E[m], axis=1, keepdims=True)).T
        order = np.lexsort((ids[m], -cos))[:MRL_K]
        return set(ids[m][order])

    pos = {int(v): i for i, v in enumerate(ids)}
    for qid in range(MRL_QUERIES):
        i = pos[qid]
        full = topk(X[i], X, qid)
        pre = topk(X[i, :MRL_PREFIX], X[:, :MRL_PREFIX], qid)
        assert out.loc[qid, "n_overlap"] == len(full & pre)
    assert (out["mean_recall"].iloc[0]
            == round(out["n_overlap"].sum() / (MRL_K * len(out)), 4))
    full_prefix = matryoshka_recall(SF, prefix=64)
    assert (full_prefix["recall"] == 1.0).all()


def test_random_walks_sequential_replay(ray_session):
    """Every trajectory equals a sequential hashlib replay over the same
    edge list: consecutive nodes are adjacent (or absorbed-isolated) and
    each step's choice is the md5-argmin neighbor."""
    import hashlib

    import duckdb

    from weaver_ray.pipelines.pagerank import (RW_STEPS, RW_WALKS,
                                               generate_host_edges,
                                               host_random_walks)

    out = host_random_walks(SF)
    glob = generate_host_edges(1000) + "/part-*.parquet"
    e = duckdb.sql(f"""
        SELECT DISTINCT least(src_host, dst_host) AS a,
               greatest(src_host, dst_host) AS b
        FROM read_parquet('{glob}') WHERE src_host <> dst_host""").df()
    adj = {}
    for r in e.itertuples(index=False):
        adj.setdefault(int(r.a), set()).add(int(r.b))
        adj.setdefault(int(r.b), set()).add(int(r.a))
    nodes = sorted(adj)
    for w in range(min(RW_WALKS, len(nodes))):
        v = nodes[w]
        traj = out[out["walk_id"] == w].sort_values("step")["node"]
        assert traj.iloc[0] == v
        for t in range(1, RW_STEPS + 1):
            nbrs = adj.get(v, set())
            if nbrs:
                v = min(nbrs, key=lambda u: (
                    hashlib.md5(f"{t}|{w}|{u}".encode()).hexdigest(), u))
            assert traj.iloc[t] == v


def test_postings_gamma_bits_replay(ray_session, tmp_path):
    """Gamma bit costs equal a per-gap sequential replay (including the
    power-of-two gaps float log2 would fumble), and a dense term beats
    raw 64-bit encoding while a sparse one doesn't."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from weaver_ray.pipelines.textops import postings_compression_stats

    # "dense" in every doc (gaps all 1 -> 1 bit each);
    # "sparse" in docs 0, 64, 192 (power-of-two-ish gaps)
    docs = []
    for i in range(256):
        t = ["dense"]
        if i in (0, 64, 192):
            t.append("sparse")
        docs.append(" ".join(t))
    pq.write_table(pa.table({
        "doc_id": pa.array(range(256), pa.int64()),
        "text": pa.array(docs)}), tmp_path / "documents.parquet")
    out = postings_compression_stats(str(tmp_path), min_df=3
                                     ).set_index("token")

    def gamma(gaps):
        return sum(2 * (g.bit_length() - 1) + 1 for g in gaps)

    assert out.loc["dense", "gamma_bits"] == gamma([1] + [1] * 255)
    assert out.loc["sparse", "gamma_bits"] == gamma([1, 64, 128])
    assert out.loc["dense", "ratio"] < 0.05
    assert out.loc["sparse", "gamma_bits"] < out.loc["sparse", "raw_bits"]


def test_haar_synopsis_exactness_and_budget(ray_session):
    """Keeping ALL coefficients reconstructs the series exactly
    (max_abs_err == 0); the default budget's error is no worse; and
    coefficients replay a sequential Haar transform."""
    import duckdb

    from weaver_ray.pipelines.temporal import (HAAR_LEN,
                                               daily_haar_synopsis)

    full = daily_haar_synopsis(SF, k=HAAR_LEN - 1)
    assert full["max_abs_err"].iloc[0] == 0.0
    part = daily_haar_synopsis(SF)
    assert part["max_abs_err"].iloc[0] >= 0.0

    daily = duckdb.sql(f"""
        SELECT date_trunc('day', ts) AS day,
               sum(round(value * 100.0, 0)) AS sc
        FROM '{SF}/events.parquet' GROUP BY 1 ORDER BY 1""").df()
    v = np.zeros(HAAR_LEN)
    v[:len(daily)] = daily["sc"].to_numpy()
    cur, seq = v.copy(), {}
    lv = 0
    while len(cur) > 1:
        lv += 1
        a, b = cur[0::2], cur[1::2]
        for i, c in enumerate((a - b) / 2.0):
            seq[(lv, i)] = c
        cur = (a + b) / 2.0
    got = {(int(r.level), int(r.idx)): r.coef
           for r in part.itertuples(index=False) if r.level > 0}
    for key, c in got.items():
        assert seq[key] == c
    assert part.loc[part["level"] == 0, "coef"].iloc[0] == cur[0]


def test_attack_robustness_star_fragments(ray_session, tmp_path,
                                          monkeypatch):
    """Removing the hub of a star graph shatters it completely (no
    surviving edges); the full scenario is one component."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from weaver_ray.pipelines import pagerank as pr

    d = tmp_path / "edges"
    d.mkdir()
    pq.write_table(pa.table({
        "src_host": pa.array([0] * 6, pa.int64()),
        "dst_host": pa.array([1, 2, 3, 4, 5, 6], pa.int64())}),
        d / "part-00000.parquet")
    (d / "_DONE").write_text("test\n")
    monkeypatch.setattr(pr, "generate_host_edges",
                        lambda n_base=1000, **kw: str(d))
    out = pr.host_attack_robustness(SF, k=1).set_index("scenario")
    f, x = out.loc["full"], out.loc["attacked"]
    assert f["n_components"] == 1 and f["giant_size"] == 7
    assert f["giant_share"] == 1.0
    # hub gone: no edges survive, node universe is edge-endpoint-derived
    assert x["n_edges"] == 0 and x["n_nodes"] == 0


def test_daily_user_churn_replay(ray_session):
    """Per-boundary counts equal brute-force set arithmetic on the real
    table and internal identities hold (returning + churned == active)."""
    import duckdb

    from weaver_ray.pipelines.temporal import daily_user_churn

    out = daily_user_churn(SF).set_index("day")
    df = duckdb.sql(f"SELECT DISTINCT user_id, date_trunc('day', ts) "
                    f"AS day FROM '{SF}/events.parquet'").df()
    by = {d: set(g["user_id"]) for d, g in df.groupby("day")}
    days = sorted(by)
    assert len(out) == len(days) - 1
    for d0, d1 in zip(days[:-1], days[1:]):
        a, b = by[d0], by[d1]
        r = out.loc[d0]
        assert r["n_active"] == len(a) and r["n_next"] == len(b)
        assert r["n_returning"] == len(a & b)
        assert r["n_churned"] == len(a - b) and r["n_new"] == len(b - a)
        assert r["n_returning"] + r["n_churned"] == r["n_active"]


def test_rich_club_complete_core(ray_session, tmp_path, monkeypatch):
    """A clique of 4 hubs plus pendant leaves: above the leaf degree the
    club is exactly the clique, phi == 1."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from weaver_ray.pipelines import pagerank as pr

    # K4 on 0..3, plus two leaves per hub
    src, dst = [], []
    for i in range(4):
        for j in range(i + 1, 4):
            src.append(i), dst.append(j)
    leaf = 10
    for i in range(4):
        for _ in range(2):
            src.append(i), dst.append(leaf)
            leaf += 1
    d = tmp_path / "edges"
    d.mkdir()
    pq.write_table(pa.table({"src_host": pa.array(src, pa.int64()),
                             "dst_host": pa.array(dst, pa.int64())}),
                   d / "part-00000.parquet")
    (d / "_DONE").write_text("test\n")
    monkeypatch.setattr(pr, "generate_host_edges",
                        lambda n_base=1000, **kw: str(d))
    out = pr.host_rich_club(SF).set_index("k")
    # hubs have degree 5, leaves degree 1: threshold 1 keeps the clique
    assert out.loc[1, "n_k"] == 4 and out.loc[1, "e_k"] == 6
    assert out.loc[1, "phi"] == 1.0
    assert out.loc[8, "n_k"] == 0 and out.loc[8, "phi"] == 0.0


def test_acf_planted_period(ray_session, tmp_path):
    """A strict 2-day alternating series autocorrelates negatively at
    lag 1 and positively at lag 2."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from weaver_ray.pipelines.temporal import daily_value_acf

    vals, ts = [], []
    for d in range(20):
        v = 10.0 if d % 2 == 0 else 90.0
        for i in range(5):
            vals.append(v)
            ts.append(np.datetime64("2024-01-01", "us")
                      + np.timedelta64(d, "D") + np.timedelta64(i, "m"))
    pq.write_table(pa.table({
        "event_id": pa.array(range(len(vals)), pa.int64()),
        "ts": pa.array(ts, pa.timestamp("us")),
        "user_id": pa.array([0] * len(vals), pa.int64()),
        "event_type": pa.array(["click"] * len(vals)),
        "value": pa.array(vals, pa.float64()),
        "props": pa.array(["{}"] * len(vals))}), tmp_path / "events.parquet")
    out = daily_value_acf(str(tmp_path)).set_index("lag")
    assert out.loc[1, "acf"] < -0.9
    assert out.loc[2, "acf"] > 0.85
    assert abs(out.loc[1, "acf"]) <= 1.0 + 1e-9


def test_knn_hubness_conservation(ray_session):
    """In-degree mass equals k * n_vectors (every vector emits k
    edges), the histogram accounts for every vector, and the gini sits
    in [0, 1)."""
    import pyarrow.parquet as pq

    from weaver_ray.pipelines.similarity import knn_hubness

    out = knn_hubness(SF, k=5)
    n_vecs = pq.ParquetFile(f"{SF}/embeddings.parquet").metadata.num_rows
    assert out["n_vectors"].sum() == n_vecs
    assert (out["in_degree"] * out["n_vectors"]).sum() == 5 * n_vecs
    g = out["gini"].iloc[0]
    assert 0.0 <= g < 1.0
    assert out["max_in_degree"].iloc[0] >= 5


def test_benford_planted_distributions(ray_session, tmp_path):
    """A log-uniform sample follows Benford closely (small chi2); an
    all-5s grid concentrates on digit 5 with a huge chi2; power-of-ten
    cents land on digit 1 (the float-log10 trap)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from weaver_ray.pipelines.relational import value_benford_audit

    def write(vals, d):
        d.mkdir(exist_ok=True)
        pq.write_table(pa.table({
            "event_id": pa.array(range(len(vals)), pa.int64()),
            "ts": pa.array([0] * len(vals), pa.timestamp("us")),
            "user_id": pa.array([0] * len(vals), pa.int64()),
            "event_type": pa.array(["click"] * len(vals)),
            "value": pa.array(vals, pa.float64()),
            "props": pa.array(["{}"] * len(vals))}),
            d / "events.parquet")
        return str(d)

    rng = np.random.default_rng(11)
    benford = list(np.round(10 ** rng.uniform(0, 4, 4000) / 100.0, 2))
    b = value_benford_audit(write(benford, tmp_path / "b"))
    spiked = value_benford_audit(write([5.55] * 500, tmp_path / "s"))
    assert b["chi2"].iloc[0] < spiked["chi2"].iloc[0] / 50
    assert spiked.set_index("digit").loc[5, "n"] == 500
    # 10.00 -> 1000 cents -> first digit 1 (not 10 // 10^2.9999)
    p10 = value_benford_audit(write([10.0] * 9, tmp_path / "p"))
    assert p10.set_index("digit").loc[1, "n"] == 9


def test_rfm_segments_account_for_everyone(ray_session):
    """Cell counts sum to the customer universe, every tile is in
    [1, 5], each single-axis marginal matches the NTILE size rule, and
    spend reconstructs."""
    import duckdb

    from weaver_ray.pipelines.analytics import (RFM_TILES,
                                                customer_rfm_segments)

    out = customer_rfm_segments(SF)
    df = duckdb.sql(f"SELECT o_custkey, o_totalprice "
                    f"FROM '{SF}/orders.parquet'").df()
    n_cust = df["o_custkey"].nunique()
    assert out["n_customers"].sum() == n_cust
    for c in ("r_tile", "f_tile", "m_tile"):
        assert out[c].between(1, RFM_TILES).all()
        marg = out.groupby(c)["n_customers"].sum()
        hi, lo = -(-n_cust // RFM_TILES), n_cust // RFM_TILES
        assert marg.max() <= hi and marg.min() >= lo
    total_cents = int(np.round(df["o_totalprice"] * 100).sum())
    assert out["spend_cents"].sum() == total_cents


def test_theil_decomposition_identity(ray_session, tmp_path):
    """The decomposition identity holds (gap ~ 0), equal docs give zero
    inequality, and a planted between-source gap loads T_between."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from weaver_ray.pipelines.textops import source_theil_decomposition

    def write(rows, d):
        d.mkdir(exist_ok=True)
        src, ch = zip(*rows)
        pq.write_table(pa.table({
            "doc_id": pa.array(range(len(rows)), pa.int64()),
            "text": pa.array(["x"] * len(rows)),
            "lang": pa.array(["en"] * len(rows)),
            "source": pa.array(list(src)),
            "n_chars": pa.array(list(ch), pa.int64())}),
            d / "documents.parquet")
        return str(d)

    flat = source_theil_decomposition(
        write([("a", 100)] * 50 + [("b", 100)] * 50, tmp_path / "f"))
    assert abs(flat["theil_total"].iloc[0]) < 1e-9
    gapd = source_theil_decomposition(
        write([("a", 100)] * 50 + [("b", 900)] * 50, tmp_path / "g"))
    r = gapd.iloc[0]
    assert r["theil_total"] > 0.1
    assert abs(r["decomp_gap"]) < 1e-5
    assert r["theil_between"] > 0.99 * r["theil_total"]  # within ~ 0
    real = source_theil_decomposition(SF).iloc[0]
    assert abs(real["decomp_gap"]) < 1e-5


def test_type_hour_mi_known_tables(ray_session, tmp_path):
    """Perfect dependence (each type owns one hour) gives
    MI == H(type) and NMI == 1; independence gives MI ~ 0."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from weaver_ray.pipelines.relational import type_hour_mi

    def write(rows, d):
        d.mkdir(exist_ok=True)
        et, hr = zip(*rows)
        ts = [np.datetime64("2024-01-01", "us")
              + np.timedelta64(h, "h") for h in hr]
        pq.write_table(pa.table({
            "event_id": pa.array(range(len(rows)), pa.int64()),
            "ts": pa.array(ts, pa.timestamp("us")),
            "user_id": pa.array([0] * len(rows), pa.int64()),
            "event_type": pa.array(list(et)),
            "value": pa.array([1.0] * len(rows)),
            "props": pa.array(["{}"] * len(rows))}), d / "events.parquet")
        return str(d)

    dep = type_hour_mi(write([("a", 1)] * 50 + [("b", 2)] * 50,
                             tmp_path / "dep")).iloc[0]
    assert dep["nmi"] == 1.0
    assert abs(dep["mi_nats"] - np.log(2)) < 1e-4
    ind = type_hour_mi(write(
        [(t, h) for t in ("a", "b") for h in (1, 2) for _ in range(25)],
        tmp_path / "ind")).iloc[0]
    assert abs(ind["mi_nats"]) < 1e-6


def test_token_burstiness_planted(ray_session, tmp_path):
    """An evenly-scattered token has VMR ~ 0 (constant count per doc);
    a clumped token of the same total count has VMR >> 1; values match
    the direct variance/mean computation."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from weaver_ray.pipelines.textops import token_burstiness

    # "flat" once in every doc; "bursty" 50 times in each of 2 docs
    docs = []
    for i in range(100):
        t = ["flat"]
        if i < 2:
            t += ["bursty"] * 50
        docs.append(" ".join(t))
    pq.write_table(pa.table({
        "doc_id": pa.array(range(100), pa.int64()),
        "text": pa.array(docs)}), tmp_path / "documents.parquet")
    out = token_burstiness(str(tmp_path), k=2).set_index("token")

    def vmr(counts):
        c = np.zeros(100)
        c[:len(counts)] = counts
        return c.var(ddof=1) / c.mean()

    assert out.loc["flat", "vmr"] == 0.0
    assert abs(out.loc["bursty", "vmr"] - vmr([50, 50])) < 1e-3
    assert out.loc["bursty", "vmr"] > 10


def test_phash_bit_balance_accounts_all_bits(ray_session):
    """64 rows, ones-counts bounded by the corpus size, mean fraction
    near 0.5 (the generator's phash is DCT-median based), and the in-row
    chi2 reconstructs."""
    from weaver_ray.pipelines.images import phash_bit_balance

    out = phash_bit_balance(SF)
    assert len(out) == 64
    n = 1000
    assert out["n_ones"].between(0, n).all()
    assert 0.3 < out["frac"].mean() < 0.7
    ones = out["n_ones"].to_numpy(np.float64)
    chi2 = round(float((((ones - n / 2) ** 2) / (n / 4)).sum()), 4)
    assert abs(out["chi2"].iloc[0] - chi2) < 1e-6


def test_jl_distortion_replay_and_concentration(ray_session):
    """Distortions replay a sequential hashlib projection exactly; the
    JL concentration holds loosely (most pairs within 1 +- 0.5 at
    k=16)."""
    import hashlib

    import pyarrow.parquet as pq

    from weaver_ray.pipelines.similarity import (JL_K, JL_PAIRS,
                                                 SRP_SCALE,
                                                 jl_distortion_audit)

    out = jl_distortion_audit(SF).set_index("pair")
    t = pq.read_table(f"{SF}/embeddings.parquet",
                      columns=["vec_id", "embedding"])
    ids = t["vec_id"].to_numpy()
    X = np.stack(t["embedding"].to_pylist()).astype(np.float64)
    pos = {int(v): i for i, v in enumerate(ids)}
    R = np.array([[1 if int(hashlib.md5(f"jl|{r}|{d}".encode())
                            .hexdigest()[:13], 16) % 2 == 0 else -1
                   for d in range(64)] for r in range(JL_K)])
    XI = np.sign(X) * np.floor(np.abs(X) * SRP_SCALE + 0.5)
    for p in (0, 7, JL_PAIRS - 1):
        a, b = XI[pos[2 * p]], XI[pos[2 * p + 1]]
        d2f = int(((a - b) ** 2).sum())
        d2p = int((((a - b) @ R.T) ** 2).sum())
        assert out.loc[p, "d2_full"] == d2f
        assert out.loc[p, "d2_proj"] == d2p
    assert out["frac_within_half"].iloc[0] > 0.7


def test_iblt_reconcile_decodes_exactly(ray_session):
    """The sketch-sized exchange recovers the exact symmetric
    difference of the CDC snapshot pair: complete decode and counts
    equal to the classified diff's removed+modified / added+modified."""
    from weaver_ray.pipelines.common import to_table
    from weaver_ray.pipelines.textops import (iblt_snapshot_reconcile,
                                              snapshot_diff_docs)

    r = iblt_snapshot_reconcile(SF).iloc[0]
    assert bool(r["decode_complete"]) and bool(r["counts_match_exact"])
    diff = to_table(snapshot_diff_docs(SF)).to_pandas()
    n_mod = int((diff["change"] == "modified").sum())
    assert r["n_decoded_v1"] == ((diff["change"] == "removed").sum()
                                 + n_mod)
    assert r["n_decoded_v2"] == ((diff["change"] == "added").sum()
                                 + n_mod)
    assert r["n_decoded_v1"] > 0 and r["n_decoded_v2"] > 0


def test_merkle_tree_detects_single_doc_change(ray_session, tmp_path):
    """A one-document change flips exactly the digests on that leaf's
    root path (log n nodes), and the sequential rebuild matches."""
    import hashlib

    import pyarrow as pa
    import pyarrow.parquet as pq

    from weaver_ray.pipelines.textops import (MERKLE_LEAVES,
                                              corpus_merkle_tree)

    def write(texts, d):
        d.mkdir(exist_ok=True)
        pq.write_table(pa.table({
            "doc_id": pa.array(range(len(texts)), pa.int64()),
            "text": pa.array(texts)}), d / "documents.parquet")
        return str(d)

    texts = [f"doc {i}" for i in range(256)]
    t1 = corpus_merkle_tree(write(texts, tmp_path / "a"))
    texts2 = list(texts)
    texts2[37] = "doc 37 TAMPERED"
    t2 = corpus_merkle_tree(write(texts2, tmp_path / "b"))
    j = t1.merge(t2, on=["level", "idx"], suffixes=("_a", "_b"))
    changed = j[j["digest_a"] != j["digest_b"]]
    # exactly one node per level differs: the tampered leaf's root path
    assert len(changed) == 7
    assert sorted(changed["level"]) == list(range(7))
    span = (256 - 1) // MERKLE_LEAVES + 1
    leaf_idx = 37 // span
    assert changed.set_index("level").loc[0, "idx"] == leaf_idx
    # sequential leaf replay
    blk = [f"doc {i}" for i in range(256) if i // span == leaf_idx]
    joined = "|".join(hashlib.md5(t.encode()).hexdigest() for t in blk)
    assert (t1.set_index(["level", "idx"]).loc[(0, leaf_idx), "digest"]
            == hashlib.md5(joined.encode()).hexdigest())


def test_textrank_hub_word_wins(ray_session, tmp_path):
    """A word adjacent to EVERYTHING outranks equally-frequent words
    that only chain to each other — the connectivity-over-frequency
    property TextRank exists for."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from weaver_ray.pipelines.textops import textrank_keywords

    # 'hub' bridges many distinct words; 'loop'/'pair' alternate only
    docs = ([f"hub word{i}" for i in range(20)]
            + ["loop pair"] * 10)
    pq.write_table(pa.table({
        "doc_id": pa.array(range(len(docs)), pa.int64()),
        "text": pa.array(docs)}), tmp_path / "documents.parquet")
    out = textrank_keywords(str(tmp_path), k=5)
    assert out.iloc[0]["token"] == "hub"
    scores = dict(zip(out["token"], out["score"]))
    assert scores["hub"] > scores.get("loop", 0)
    # ranks are 1..k and scores non-increasing
    assert list(out["rank"]) == list(range(1, len(out) + 1))
    assert (np.diff(out["score"].to_numpy()) <= 1e-12).all()


def test_spectral_bisection_two_cliques(ray_session, tmp_path,
                                        monkeypatch):
    """Two cliques joined by one bridge edge: the Fiedler split
    recovers the cliques exactly with cut weight 1."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from weaver_ray.pipelines import pagerank as pr

    src, dst = [], []
    for grp in (range(0, 4), range(10, 14)):
        g = list(grp)
        for i in range(4):
            for j in range(i + 1, 4):
                src.append(g[i]), dst.append(g[j])
    src.append(0), dst.append(10)          # the bridge
    d = tmp_path / "edges"
    d.mkdir()
    pq.write_table(pa.table({"src_host": pa.array(src, pa.int64()),
                             "dst_host": pa.array(dst, pa.int64())}),
                   d / "part-00000.parquet")
    (d / "_DONE").write_text("test\n")
    monkeypatch.setattr(pr, "generate_host_edges",
                        lambda n_base=1000, **kw: str(d))
    out = pr.host_spectral_bisection(SF).set_index("host")
    sides = {h: out.loc[h, "side"] for h in out.index}
    assert len({sides[h] for h in range(0, 4)}) == 1
    assert len({sides[h] for h in range(10, 14)}) == 1
    assert sides[0] != sides[10]
    assert out["cut_weight"].iloc[0] == 1


def test_isotropy_matches_spectrum(ray_session):
    """The participation ratio equals (sum lambda)^2 / (d * sum
    lambda^2) of the eigen-spectrum (trace/Frobenius are spectral
    invariants), and sits in (1/d, 1]."""
    from weaver_ray.pipelines.common import sql_round
    from weaver_ray.pipelines.similarity import (_covariance_pass,
                                                 embedding_isotropy)

    out = embedding_isotropy(SF).iloc[0]
    cov, _, _n = _covariance_pass(SF)
    C = np.asarray(sql_round(cov, 6))
    w = np.linalg.eigvalsh(C)
    pr = w.sum() ** 2 / (len(w) * (w ** 2).sum())
    assert abs(out["participation_ratio"] - pr) < 1e-5
    assert 1.0 / 64 < out["participation_ratio"] <= 1.0 + 1e-9
    assert abs(out["effective_dims"]
               - out["participation_ratio"] * 64) < 1e-3


def test_trie_widths_known_vocab(ray_session, tmp_path):
    """Widths replay a sequential prefix-set build on a planted
    vocabulary with shared stems."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from weaver_ray.pipelines.textops import vocab_trie_widths

    vocab = ["car", "cart", "carbon", "cat", "dog", "do"]
    pq.write_table(pa.table({
        "doc_id": pa.array(range(1), pa.int64()),
        "text": pa.array([" ".join(vocab)])}),
        tmp_path / "documents.parquet")
    out = vocab_trie_widths(str(tmp_path)).set_index("prefix_len")
    for l in range(1, 7):
        expect = len({w[:l] for w in vocab if len(w) >= l})
        assert out.loc[l, "width"] == expect
    assert out.loc[1, "width"] == 2      # c, d
    assert out.loc[2, "width"] == 2      # ca, do
    assert out.loc[3, "width"] == 3      # car, cat, dog


def test_km_survival_textbook_example(ray_session, tmp_path):
    """A hand-built cohort reproduces the textbook product-limit
    values, including censoring reducing the at-risk set without a
    survival step."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from weaver_ray.pipelines.temporal import purchase_survival_km

    # user u: purchases on days given -> gaps per user; censored row =
    # mean gap per user.  Build 3 users with known gaps:
    # u0: days 0, 2, 4  -> gaps 2, 2; censored mean 2
    # u1: days 0, 5     -> gap 5;     censored mean 5
    # u2: days 0, 3     -> gap 3;     censored mean 3
    plan = {0: [0, 2, 4], 1: [0, 5], 2: [0, 3]}
    rows = []
    for u, days in plan.items():
        for d in days:
            rows.append((u, np.datetime64("2024-01-01", "us")
                         + np.timedelta64(d, "D")))
    pq.write_table(pa.table({
        "event_id": pa.array(range(len(rows)), pa.int64()),
        "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
        "user_id": pa.array([r[0] for r in rows], pa.int64()),
        "event_type": pa.array(["purchase"] * len(rows)),
        "value": pa.array([1.0] * len(rows)),
        "props": pa.array(["{}"] * len(rows))}), tmp_path / "events.parquet")
    out = purchase_survival_km(str(tmp_path)).set_index("gap_days")
    # observations: events {2:2, 3:1, 5:1}; censored {2:1, 5:1, 3:1}
    # at gap 2: n=7, d=2 -> S=5/7
    assert out.loc[2, "n_at_risk"] == 7 and out.loc[2, "n_events"] == 2
    assert abs(out.loc[2, "survival"] - 5 / 7) < 1e-6
    # at gap 3: left = 3 (2 events + 1 censored at 2): n=4, d=1 -> 5/7*3/4
    assert out.loc[3, "n_at_risk"] == 4
    assert abs(out.loc[3, "survival"] - 5 / 7 * 3 / 4) < 1e-6
    # at gap 5: n=2, d=1 -> *1/2
    assert abs(out.loc[5, "survival"] - 5 / 7 * 3 / 4 * 1 / 2) < 1e-6


def test_forecast_backtest_planted_weekly_cycle(ray_session, tmp_path):
    """A strict weekly cycle makes seasonal-naive PERFECT (MAE 0) while
    naive pays the day-to-day swing; errors replay exactly."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from weaver_ray.pipelines.temporal import daily_forecast_backtest

    week = [10.0, 20.0, 30.0, 40.0, 50.0, 60.0, 70.0]
    vals, ts = [], []
    for d in range(28):
        for i in range(3):
            vals.append(week[d % 7])
            ts.append(np.datetime64("2024-01-01", "us")
                      + np.timedelta64(d, "D") + np.timedelta64(i, "m"))
    pq.write_table(pa.table({
        "event_id": pa.array(range(len(vals)), pa.int64()),
        "ts": pa.array(ts, pa.timestamp("us")),
        "user_id": pa.array([0] * len(vals), pa.int64()),
        "event_type": pa.array(["click"] * len(vals)),
        "value": pa.array(vals, pa.float64()),
        "props": pa.array(["{}"] * len(vals))}), tmp_path / "events.parquet")
    r = daily_forecast_backtest(str(tmp_path)).iloc[0]
    assert r["n_days_scored"] == 21
    assert r["mae_seasonal"] == 0.0
    assert r["winner"] == "seasonal"
    # naive MAE: |diff| per day = 30 except the weekly wrap (-180):
    # daily totals = 3x values; mean |err| in dollars
    daily = [3 * week[d % 7] for d in range(28)]
    e1 = np.abs(np.diff(daily))[6:]
    assert abs(r["mae_naive"] - round(e1.mean(), 4)) < 1e-6


def test_coverage_greedy_planted(ray_session, tmp_path):
    """Greedy picks the big-vocabulary source first, then the source
    with the most NOVEL (not most total) tokens — the submodular
    marginal-gain property."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from weaver_ray.pipelines.textops import source_coverage_greedy

    # big: 10 tokens; overlap: 8 of big's + 1 new; fresh: 4 new tokens
    docs = [("big", " ".join(f"t{i}" for i in range(10))),
            ("overlap", " ".join(f"t{i}" for i in range(8)) + " x0"),
            ("fresh", "f1 f2 f3 f4")]
    src, txt = zip(*docs)
    pq.write_table(pa.table({
        "doc_id": pa.array(range(3), pa.int64()),
        "text": pa.array(list(txt)),
        "lang": pa.array(["en"] * 3),
        "source": pa.array(list(src)),
        "n_chars": pa.array([1] * 3, pa.int64())}),
        tmp_path / "documents.parquet")
    out = source_coverage_greedy(str(tmp_path))
    assert list(out["source"]) == ["big", "fresh", "overlap"]
    assert list(out["new_tokens"]) == [10, 4, 1]
    assert out["cum_tokens"].iloc[-1] == 15
    assert out["coverage"].iloc[-1] == 1.0
    assert (np.diff(out["new_tokens"]) <= 0).all()   # diminishing gains


def test_k_anonymity_planted_classes(ray_session, tmp_path):
    """A planted singleton quasi-identifier class is flagged; a large
    homogeneous class is not; counts replay exactly."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from weaver_ray.pipelines.textops import k_anonymity_audit

    rows = ([("en", "s1", 150)] * 20      # one class of 20: safe
            + [("de", "s2", 950)])        # singleton: risky
    lang, src, nch = zip(*rows)
    pq.write_table(pa.table({
        "doc_id": pa.array(range(len(rows)), pa.int64()),
        "text": pa.array(["x"] * len(rows)),
        "lang": pa.array(list(lang)), "source": pa.array(list(src)),
        "n_chars": pa.array(list(nch), pa.int64())}),
        tmp_path / "documents.parquet")
    out = k_anonymity_audit(str(tmp_path))
    h = out.set_index("class_size")
    assert h.loc[1, "n_classes"] == 1 and h.loc[20, "n_classes"] == 1
    assert out["risky_classes"].iloc[0] == 1
    assert out["risky_rows"].iloc[0] == 1
    assert out["min_class_size"].iloc[0] == 1
    assert abs(out["risk_fraction"].iloc[0] - 1 / 21) < 1e-6


def test_duplicate_payment_audit_planted(ray_session, tmp_path):
    """Planted double charges within the window are caught; same-amount
    orders far apart or different customers are not."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from weaver_ray.pipelines.relational import duplicate_payment_audit

    d0 = np.datetime64("2024-01-10", "us")
    rows = [
        (1, 10, 99.99, d0), (2, 10, 99.99, d0),                  # dup!
        (3, 11, 50.00, d0), (4, 11, 50.00, d0 + np.timedelta64(10, "D")),
        (5, 12, 75.50, d0), (6, 13, 75.50, d0),                  # diff cust
        (7, 14, 20.00, d0), (8, 14, 20.00, d0 + np.timedelta64(1, "D")),
    ]
    pq.write_table(pa.table({
        "o_orderkey": pa.array([r[0] for r in rows], pa.int64()),
        "o_custkey": pa.array([r[1] for r in rows], pa.int64()),
        "o_orderstatus": pa.array(["O"] * len(rows)),
        "o_totalprice": pa.array([r[2] for r in rows], pa.float64()),
        "o_orderdate": pa.array([r[3] for r in rows], pa.timestamp("us")),
        "o_orderpriority": pa.array(["1"] * len(rows))}),
        tmp_path / "orders.parquet")
    out = duplicate_payment_audit(str(tmp_path))
    got = set(zip(out["okey_lo"], out["okey_hi"]))
    assert got == {(1, 2), (7, 8)}
    assert out.set_index(["okey_lo", "okey_hi"]).loc[(7, 8),
                                                     "day_gap"] == 1


def test_burst_states_planted_burst(ray_session, tmp_path):
    """A planted purchase surge is labeled a single contiguous burst
    (hysteresis: no flapping on the noisy shoulders), and the labels
    replay a sequential Viterbi."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from weaver_ray.pipelines.temporal import (KB_GAMMA, KB_RATE_MULT,
                                               purchase_burst_states)

    rows = []
    eid = 0
    for d in range(30):
        # base: 2 purchases / 20 events; days 10..14: 10 purchases
        np_ = 10 if 10 <= d <= 14 else 2
        for i in range(20):
            rows.append((eid, np.datetime64("2024-01-01", "us")
                         + np.timedelta64(d, "D") + np.timedelta64(i, "m"),
                         "purchase" if i < np_ else "view"))
            eid += 1
    pq.write_table(pa.table({
        "event_id": pa.array([r[0] for r in rows], pa.int64()),
        "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
        "user_id": pa.array([0] * len(rows), pa.int64()),
        "event_type": pa.array([r[2] for r in rows]),
        "value": pa.array([1.0] * len(rows)),
        "props": pa.array(["{}"] * len(rows))}), tmp_path / "events.parquet")
    out = purchase_burst_states(str(tmp_path)).sort_values("day")
    s = out["state"].to_numpy()
    assert out["n_bursts"].iloc[0] == 1
    assert (s[10:15] == 1).all()
    assert (s[:10] == 0).all() and (s[15:] == 0).all()

    # sequential Viterbi replay
    n = out["n_events"].to_numpy(np.float64)
    r = out["n_purchases"].to_numpy(np.float64)
    p0 = r.sum() / n.sum()
    p1 = min(KB_RATE_MULT * p0, 0.99)
    tau = KB_GAMMA * np.log(30.0)
    e = lambda p: -(r * np.log(p) + (n - r) * np.log(1 - p))
    e0, e1 = e(p0), e(p1)
    c = [(e0[0], e1[0] + tau)]
    pv = [(0, 0)]
    for t in range(1, 30):
        f0 = c[-1][0]
        f1 = c[-1][1]
        c0 = e0[t] + min(f0, f1)
        c1 = e1[t] + min(f0 + tau, f1)
        pv.append((0 if f0 <= f1 else 1, 0 if f0 + tau <= f1 else 1))
        c.append((c0, c1))
    st = [0 if c[-1][0] <= c[-1][1] else 1]
    for t in range(29, 0, -1):
        st.append(pv[t][st[-1]])
    assert list(s) == st[::-1]


def test_burst_states_degenerate_rate_raises(ray_session, tmp_path):
    """Zero purchases (p0 == 0) makes the binomial emission cost NaN —
    the engine must fail LOUDLY, never emit a garbage labeling (ADVICE
    r3)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    import pytest

    from weaver_ray.pipelines.temporal import purchase_burst_states

    n = 40
    pq.write_table(pa.table({
        "event_id": pa.array(range(n), pa.int64()),
        "ts": pa.array([np.datetime64("2024-01-01", "us")
                        + np.timedelta64(i, "h") for i in range(n)],
                       pa.timestamp("us")),
        "user_id": pa.array([0] * n, pa.int64()),
        "event_type": pa.array(["view"] * n),
        "value": pa.array([1.0] * n),
        "props": pa.array(["{}"] * n)}), tmp_path / "events.parquet")
    with pytest.raises(ValueError, match="degenerate base rate"):
        purchase_burst_states(str(tmp_path))


def test_l_diversity_planted_homogeneous_class(ray_session, tmp_path):
    """A big but single-language class is flagged; a diverse class of
    the same size is not."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from weaver_ray.pipelines.textops import l_diversity_audit

    rows = ([("en", "s1", 150)] * 30                      # homogeneous
            + [("en", "s2", 150)] * 10 + [("de", "s2", 150)] * 10
            + [("fr", "s2", 150)] * 10)                   # diverse
    lang, src, nch = zip(*rows)
    pq.write_table(pa.table({
        "doc_id": pa.array(range(len(rows)), pa.int64()),
        "text": pa.array(["x"] * len(rows)),
        "lang": pa.array(list(lang)), "source": pa.array(list(src)),
        "n_chars": pa.array(list(nch), pa.int64())}),
        tmp_path / "documents.parquet")
    out = l_diversity_audit(str(tmp_path))
    assert out["risky_classes"].iloc[0] == 1
    assert out["risky_rows"].iloc[0] == 30
    assert out["min_diversity"].iloc[0] == 1
    h = out.set_index(["class_size", "diversity"])
    assert h.loc[(30, 1), "n_classes"] == 1
    assert h.loc[(30, 3), "n_classes"] == 1


def test_rank_test_planted_shift(ray_session, tmp_path):
    """A clear purchase-over-click value shift gives a large positive
    2U relative to its mean and |z| >> 2; identical distributions give
    z == 0 exactly (all-tie guard)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from weaver_ray.pipelines.relational import click_purchase_rank_test

    def write(cv, pv, d):
        d.mkdir(exist_ok=True)
        et = ["click"] * len(cv) + ["purchase"] * len(pv)
        v = list(cv) + list(pv)
        pq.write_table(pa.table({
            "event_id": pa.array(range(len(v)), pa.int64()),
            "ts": pa.array([0] * len(v), pa.timestamp("us")),
            "user_id": pa.array([0] * len(v), pa.int64()),
            "event_type": pa.array(et),
            "value": pa.array(v, pa.float64()),
            "props": pa.array(["{}"] * len(v))}), d / "events.parquet")
        return str(d)

    hi = click_purchase_rank_test(
        write([10.0] * 50, [90.0] * 50, tmp_path / "a")).iloc[0]
    assert hi["two_u"] == 2 * 50 * 50      # every purchase beats every click
    assert hi["z_score"] > 2
    same = click_purchase_rank_test(
        write([42.0] * 50, [42.0] * 50, tmp_path / "b")).iloc[0]
    assert same["z_score"] == 0.0


def test_ks_test_planted_distributions(ray_session, tmp_path):
    """Disjoint supports give D == 1 (lambda large); identical samples
    give D == 0; D replays a brute-force CDF sup."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from weaver_ray.pipelines.relational import click_purchase_ks_test

    def write(cv, pv, d):
        d.mkdir(exist_ok=True)
        et = ["click"] * len(cv) + ["purchase"] * len(pv)
        v = list(cv) + list(pv)
        pq.write_table(pa.table({
            "event_id": pa.array(range(len(v)), pa.int64()),
            "ts": pa.array([0] * len(v), pa.timestamp("us")),
            "user_id": pa.array([0] * len(v), pa.int64()),
            "event_type": pa.array(et),
            "value": pa.array(v, pa.float64()),
            "props": pa.array(["{}"] * len(v))}), d / "events.parquet")
        return str(d)

    far = click_purchase_ks_test(
        write([10.0] * 40, [90.0] * 60, tmp_path / "a")).iloc[0]
    assert far["ks_d"] == 1.0
    assert far["ks_numerator"] == 40 * 60
    assert far["ks_lambda"] > 1.36
    same = click_purchase_ks_test(
        write([10.0] * 30 + [20.0] * 30, [10.0] * 30 + [20.0] * 30,
              tmp_path / "b")).iloc[0]
    assert same["ks_d"] == 0.0


def test_spearman_monotone_and_scipy_free_replay(ray_session, tmp_path):
    """rho matches a midrank-Pearson replay over the real join, and a
    perfectly monotone planted relationship gives rho == 1."""
    import duckdb
    import pyarrow as pa
    import pyarrow.parquet as pq

    from weaver_ray.pipelines.relational import order_size_price_spearman

    out = order_size_price_spearman(SF).iloc[0]
    df = duckdb.sql(f"""
        SELECT CAST(round(o.o_totalprice * 100) AS BIGINT) AS cents,
               l.n FROM '{SF}/orders.parquet' o JOIN (
            SELECT l_orderkey, count(*) AS n
            FROM '{SF}/lineitem.parquet' GROUP BY 1) l
          ON l.l_orderkey = o.o_orderkey""").df()
    rx = df["cents"].rank(method="average").to_numpy()
    ry = df["n"].rank(method="average").to_numpy()
    rho = np.corrcoef(rx, ry)[0, 1]
    assert abs(out["spearman_rho"] - rho) < 1e-5
    assert out["n_orders"] == len(df)
    assert -1 <= out["spearman_rho"] <= 1
    # In the SF corpus o_totalprice is NOT tied to line count (measured
    # rho ~= -0.027), so the monotone check runs on a PLANTED fixture:
    # order k has exactly k lineitems and price 10*k -> rho == 1 exactly.
    d = tmp_path / "monotone"
    d.mkdir()
    ks = list(range(1, 21))
    pq.write_table(pa.table({
        "o_orderkey": pa.array(ks, pa.int64()),
        "o_totalprice": pa.array([10.0 * k for k in ks], pa.float64())}),
        d / "orders.parquet")
    pq.write_table(pa.table({
        "l_orderkey": pa.array([k for k in ks for _ in range(k)],
                               pa.int64())}), d / "lineitem.parquet")
    planted = order_size_price_spearman(str(d)).iloc[0]
    assert planted["n_orders"] == len(ks)
    assert planted["spearman_rho"] == 1.0


def test_global_row_number_randomized(ray_session):
    """Seeded randomized equivalence for the distributed rank primitive:
    global_row_number over random block layouts (1..n blocks, uneven
    splits), mixed per-key sort directions, and int/string key types must
    equal a single-process pandas lexsort rank.  Keys are made UNIQUE per
    row via a tiebreaker column — the engine's own call-site contract
    (sort-tie rank order across blocks is not defined without one)."""
    import ray.data as rd

    rng = np.random.default_rng(31337)
    for trial in range(8):
        n = int(rng.integers(1, 120))
        df = pd.DataFrame({
            "a": rng.integers(-5, 5, n),
            "s": np.array([f"k{v}" for v in rng.integers(0, 4, n)], object),
            "tie": rng.permutation(n).astype(np.int64),  # unique tiebreaker
        })
        keys = [["a", "tie"], ["s", "a", "tie"], ["a", "s", "tie"]][trial % 3]
        desc = [bool(rng.integers(0, 2)) for _ in keys]
        # random uneven block layout, possibly with empty slices
        cuts = np.sort(rng.integers(0, n + 1, size=int(rng.integers(0, 5))))
        bounds = [0, *cuts.tolist(), n]
        parts = [df.iloc[bounds[i]:bounds[i + 1]] for i in range(len(bounds) - 1)]
        ds = rd.from_pandas(parts)
        ranked, total = global_row_number(ds, keys, descending=desc,
                                          rank_col="g")
        assert total == n
        out = ranked.to_pandas().sort_values("g").reset_index(drop=True)
        expect = df.sort_values(keys, ascending=[not d for d in desc],
                                ).reset_index(drop=True)
        pd.testing.assert_frame_equal(out[["a", "s", "tie"]],
                                      expect[["a", "s", "tie"]])
        assert list(out["g"]) == list(range(n))


def test_join_null_keys_match_duckdb_semantics(ray_session):
    """NULL join keys must follow SQL semantics — a NULL key matches
    NOTHING — on both join substrates, pinned directly against DuckDB
    (the oracle engine) over randomized nullable-key frames: float keys
    with NaN and object keys with None, inner/left/outer, duplicate keys
    on both sides.  pandas merge alone matches NaN with NaN, which would
    silently diverge from every oracle the moment a nullable key column
    reaches a join."""
    import duckdb
    import ray.data as rd

    from weaver_ray.pipelines.common import broadcast_join, hash_join, to_table

    rng = np.random.default_rng(5150)

    def canon(df):
        df = df.copy()
        k = df["k"].astype("string").astype(object)  # "3.0" stable either engine
        df["k"] = np.where(pd.notna(k), k, "<null>")
        for c in df.columns:
            if c != "k":
                df[c] = pd.to_numeric(df[c]).fillna(-1).astype(np.int64)
        return df.sort_values(list(df.columns)).reset_index(drop=True)

    for trial in range(6):
        nl, nr = int(rng.integers(1, 30)), int(rng.integers(1, 30))
        if trial % 2:  # float keys, NaN nulls
            lk = rng.choice([1.0, 2.0, 3.0, np.nan], nl)
            rk = rng.choice([2.0, 3.0, 4.0, np.nan], nr)
        else:          # object keys, None nulls
            lk = rng.choice(np.array(["x", "y", "z", None], object), nl)
            rk = rng.choice(np.array(["y", "z", "w", None], object), nr)
        l = pd.DataFrame({"k": lk, "a": np.arange(nl, dtype=np.int64)})
        r = pd.DataFrame({"k": rk, "b": np.arange(nr, dtype=np.int64)})
        how = ["inner", "left", "outer"][trial % 3]
        want = canon(duckdb.sql(
            f"SELECT * FROM l {'FULL' if how == 'outer' else how} JOIN r "
            "USING (k)").df())

        got = canon(to_table(hash_join(
            rd.from_pandas([l.iloc[:nl // 2], l.iloc[nl // 2:]]),
            rd.from_pandas([r.iloc[:nr // 2], r.iloc[nr // 2:]]),
            on="k", lcols=["k", "a"], rcols=["k", "b"], num_buckets=3,
            how=how)).to_pandas())
        pd.testing.assert_frame_equal(
            got, want[got.columns], check_dtype=False), (trial, how)

        if how in ("inner", "left"):
            gotb = canon(broadcast_join(
                rd.from_pandas([l.iloc[:nl // 2], l.iloc[nl // 2:]]),
                pa.Table.from_pandas(r), on="k", how=how).to_pandas())
            pd.testing.assert_frame_equal(
                gotb, want[gotb.columns], check_dtype=False), (trial, how)


def test_join_null_keys_cross_dtype_match_duckdb(ray_session):
    """NULL join keys PLUS a cross-side key-dtype mismatch — int64 on one
    side, float64-with-NaN on the other, which is exactly how Arrow
    int64-with-nulls arrives in pandas.  Before the r5 fix join_bucket
    ran the dtype alignment BEFORE the null split, so the int64 astype
    saw NaN and raised IntCastingNaNError, crashing the bucket task.
    Nulls now split out first; results pinned vs DuckDB (which joins
    INT = DOUBLE by implicit cast) for inner/left/outer, both side
    orders."""
    import duckdb
    import ray.data as rd

    from weaver_ray.pipelines.common import hash_join, to_table

    def canon(df):
        df = df.copy()
        kn = pd.to_numeric(df["k"], errors="coerce")
        df["k"] = np.where(pd.notna(kn),
                           kn.fillna(0).astype(np.int64).astype(str),
                           "<null>")
        for c in df.columns:
            if c != "k":
                df[c] = pd.to_numeric(df[c]).fillna(-1).astype(np.int64)
        return df.sort_values(list(df.columns)).reset_index(drop=True)

    ints = pd.DataFrame({"k": np.array([1, 2, 2, 3, 5], np.int64),
                         "a": np.arange(5, dtype=np.int64)})
    flts = pd.DataFrame({"k": np.array([2.0, np.nan, 3.0, 4.0, np.nan]),
                         "b": np.arange(5, dtype=np.int64)})
    for l, r, lc, rc in ((ints, flts, ["k", "a"], ["k", "b"]),
                         (flts.rename(columns={"b": "a"}),
                          ints.rename(columns={"a": "b"}),
                          ["k", "a"], ["k", "b"])):
        for how in ("inner", "left", "outer"):
            want = canon(duckdb.sql(
                f"SELECT * FROM l {'FULL' if how == 'outer' else how} "
                "JOIN r USING (k)").df())
            got = canon(to_table(hash_join(
                rd.from_pandas([l.iloc[:2], l.iloc[2:]]),
                rd.from_pandas([r.iloc[:2], r.iloc[2:]]),
                on="k", lcols=lc, rcols=rc, num_buckets=3,
                how=how)).to_pandas())
            pd.testing.assert_frame_equal(
                got, want[got.columns], check_dtype=False), how


def test_broadcast_join_rejects_right_outer(ray_session):
    """broadcast_join only re-enters null-key batch rows under "left";
    a "right"/"outer" request would silently drop rows — it must refuse
    loudly instead (ADVICE r5)."""
    import ray.data as rd

    from weaver_ray.pipelines.common import broadcast_join

    ds = rd.from_pandas(pd.DataFrame({"k": [1], "a": [1]}))
    small = pa.table({"k": [1], "b": [2]})
    for how in ("right", "outer"):
        with pytest.raises(ValueError, match="inner.*left"):
            broadcast_join(ds, small, on="k", how=how)


def test_load_guards_empty_tables(tmp_path, ray_session):
    """load()/load_arrow() refuse a ZERO-ROW required table with the
    designed EmptyTableError (uniform loud failure; r4 verdict task 2) —
    Ray Data would otherwise skip every map fn over the empty dataset,
    erase the schema, and die later with a misleading KeyError.  The
    check is parquet FOOTER metadata only."""
    import pyarrow.parquet as _pq

    from weaver_ray.pipelines.common import EmptyTableError, load, load_arrow

    _pq.write_table(pa.table({"a": pa.array([], pa.int64())}),
                    tmp_path / "documents.parquet")
    _pq.write_table(pa.table({"a": [1, 2]}), tmp_path / "events.parquet")
    with pytest.raises(EmptyTableError, match="documents"):
        load(str(tmp_path), "documents")
    with pytest.raises(EmptyTableError, match="documents"):
        load_arrow(str(tmp_path), "documents")
    assert load(str(tmp_path), "events").count() == 2
    assert load_arrow(str(tmp_path), "events").num_rows == 2


def test_groupby_int_float_block_drift_one_group(ray_session):
    """Blocks of one LOGICAL int key column legitimately drift
    int64<->float64 (an outer-join bucket with unmatched rows types the
    missing int side float64; Arrow int64-with-nulls lands as float64).
    partial_groupby's reduce bucketing must be value-canonical so the
    drifted partials of a key meet in ONE bucket — a dtype-sensitive
    hash would emit the group twice (2 and 2.0 as separate rows)."""
    import ray.data as rd

    from weaver_ray.pipelines.common import partial_groupby, to_table

    int_block = pd.DataFrame({"k": np.array([1, 2, 2], np.int64),
                              "v": np.array([10, 20, 30], np.int64)})
    flt_block = pd.DataFrame({"k": np.array([2.0, 3.0, 1.0]),
                              "v": np.array([5, 7, 9], np.int64)})
    out = to_table(partial_groupby(
        rd.from_pandas([int_block, flt_block]), ["k"],
        {"s": ("v", "sum"), "n": ("k", "count")},
        num_buckets=5)).to_pandas()
    out["k"] = out["k"].astype(np.float64)
    out = out.sort_values("k").reset_index(drop=True)
    assert len(out) == 3, out  # 1, 2, 3 — each exactly once
    assert list(out["k"]) == [1.0, 2.0, 3.0]
    assert list(out["s"]) == [19, 55, 7]
    assert list(out["n"]) == [2, 3, 1]


def test_groupby_null_keys_match_duckdb_semantics(ray_session):
    """SQL GROUP BY keeps NULL as a group (one group for ALL nulls);
    pandas' default dropna=True silently deletes it.  Pin partial_groupby
    — BOTH reduce paths — against DuckDB over randomized frames with
    null keys (float-NaN and object-None), multi-block so null partials
    must also merge across blocks."""
    import duckdb
    import ray.data as rd

    from weaver_ray.pipelines.common import partial_groupby, to_table

    rng = np.random.default_rng(616)
    for trial in range(6):
        n = int(rng.integers(4, 60))
        if trial % 2:
            k = rng.choice([1.0, 2.0, np.nan], n)
        else:
            k = rng.choice(np.array(["x", "y", None], object), n)
        df = pd.DataFrame({"k": k, "v": rng.integers(-9, 9, n)})
        want = duckdb.sql(
            "SELECT k, sum(v) AS s, count(*) AS c, min(v) AS lo, max(v) AS hi "
            "FROM df GROUP BY k").df()
        cuts = [0, n // 3, 2 * n // 3, n]
        ds = rd.from_pandas([df.iloc[cuts[i]:cuts[i + 1]] for i in range(3)])
        for many in (False, True):
            got = to_table(partial_groupby(
                ds, ["k"], {"s": ("v", "sum"), "c": ("v", "count"),
                            "lo": ("v", "min"), "hi": ("v", "max")},
                many_groups=many)).to_pandas()

            def canon(d):
                d = d.copy()
                kk = d["k"].astype("string").astype(object)
                d["k"] = np.where(pd.notna(kk), kk, "<null>")
                return (d.astype({c: np.int64 for c in ("s", "c", "lo", "hi")})
                        .sort_values("k").reset_index(drop=True))

            pd.testing.assert_frame_equal(canon(got), canon(want)[canon(got).columns]), \
                (trial, many)


def test_groupby_null_values_sum_matches_duckdb(ray_session):
    """SQL SUM ignores NULL values and returns NULL for an all-NULL group;
    pandas' default skipna sum would return 0 for it.  Pin partial_groupby
    against DuckDB over frames whose VALUE column carries nulls, including
    a group that is entirely null and null partials crossing blocks."""
    import duckdb
    import ray.data as rd

    from weaver_ray.pipelines.common import partial_groupby, to_table

    df = pd.DataFrame({
        "k": ["a", "a", "b", "b", "c", "c", "d"],
        "v": [1.0, np.nan, np.nan, np.nan, 2.0, 3.0, np.nan],
    })
    want = duckdb.sql(
        "SELECT k, sum(v) AS s, count(*) AS c FROM df GROUP BY k").df()
    # split so group b's two null rows land in DIFFERENT blocks: the
    # reduce must keep NULL partials NULL through the cross-block fold
    ds = rd.from_pandas([df.iloc[:3], df.iloc[3:]])
    got = to_table(partial_groupby(
        ds, ["k"], {"s": ("v", "sum"), "c": ("v", "count")})).to_pandas()

    def canon(d):
        return (d.assign(k=d["k"].astype(object),
                         s=d["s"].astype(np.float64),
                         c=d["c"].astype(np.int64))
                .sort_values("k").reset_index(drop=True)[["k", "s", "c"]])

    pd.testing.assert_frame_equal(canon(got), canon(want))


def test_keyed_map_groups_null_group_complete_across_dtype_drift(ray_session):
    """The NULL group must arrive COMPLETE at one bucket even when the key
    column's dtype drifts across blocks (object-None in one block, float-NaN
    in another — the all-null-block Arrow-double degradation makes such
    drift real).  astype(str) alone would spell those nulls "None" vs
    "nan" and fragment the group; bucket_of canonicalizes nulls first."""
    import ray.data as rd

    from weaver_ray.pipelines.common import keyed_map_groups, to_table

    b1 = pd.DataFrame({"k": np.array(["x", None, "y"], object),
                       "v": [1, 10, 2]})
    b2 = pd.DataFrame({"k": np.array([np.nan, np.nan], dtype=np.float64),
                       "v": [20, 30]})  # dtype-drifted all-null block

    def per_group_sum(g: pd.DataFrame) -> pd.DataFrame:
        gg = g.groupby("k", dropna=False)["v"].sum().reset_index(name="s")
        gg["k"] = gg["k"].astype("string")
        return gg

    out = to_table(keyed_map_groups(
        rd.from_pandas([b1, b2]), "k", per_group_sum,
        num_buckets=8)).to_pandas()
    nulls = out[out["k"].isna()]
    # one row, all 60 null-keyed units summed together — not fragmented
    assert len(nulls) == 1 and int(nulls["s"].iloc[0]) == 60
    rest = dict(zip(out["k"].dropna(), out["s"][out["k"].notna()]))
    assert rest == {"x": 1, "y": 2}


def test_grouped_substrates_tolerate_fully_empty_input(ray_session):
    """A filter that drops EVERY row is routine at scale; Ray then skips
    map_batches on the empty blocks and the exchange sees the column-less
    empty-block artifact.  partial_groupby must return a correctly-shaped
    empty result (not KeyError), and keyed_map_groups must still honor its
    documented contract — fn receives a TYPED (possibly empty) frame —
    via the schema captured from its input dataset."""
    import ray.data as rd

    from weaver_ray.pipelines.common import (keyed_map_groups,
                                             partial_groupby, to_table)

    empty = pd.DataFrame({"k": pd.Series([], dtype=object),
                          "v": pd.Series([], dtype=np.int64)})
    ds = rd.from_pandas([empty])

    out = to_table(partial_groupby(
        ds, ["k"], {"s": ("v", "sum"), "c": ("v", "count")})).to_pandas()
    assert len(out) == 0 and list(out.columns) == ["k", "s", "c"]

    seen_cols = []

    def fn(g: pd.DataFrame) -> pd.DataFrame:
        seen_cols.append(list(g.columns))
        return g.groupby("k", dropna=False)["v"].sum().reset_index(name="s")

    out2 = to_table(keyed_map_groups(ds, "k", fn, num_buckets=4)).to_pandas()
    assert len(out2) == 0 and list(out2.columns) == ["k", "s"]
    assert all(c == ["k", "v"] for c in seen_cols)  # typed frame, every bucket


def test_schema_helpers_silent_on_pandas_string_dtype(ray_session):
    """partial_groupby's key-dtype pin emits pandas "string"-dtype key
    columns; Ray's ``Schema.types`` property cannot map that extension
    dtype to Arrow and LOGS AN ERROR per column per call (returning a
    None sentinel).  _schema_of/_empty_like now read ``base_schema``
    directly and do the mapping themselves: same degradation (extension
    dtype -> Arrow string), zero ERROR-level log records."""
    import logging

    import ray.data as rd

    from weaver_ray.pipelines.common import _empty_like, _schema_of

    records: list[logging.LogRecord] = []
    h = logging.Handler()
    h.emit = records.append  # type: ignore[assignment]
    lg = logging.getLogger("ray.data")
    lg.addHandler(h)
    try:
        df = pd.DataFrame({"k": pd.Series(["a", None], dtype="string"),
                           "v": [1, 2]})
        ds = rd.from_pandas([df]).map_batches(
            lambda b: b, batch_format="pandas")
        sch = _schema_of(ds)
        assert sch.field("k").type == pa.string()
        assert sch.field("v").type == pa.int64()
        t = _empty_like(ds, "extra")
        assert t.schema.field("k").type == pa.string()
        assert t.schema.field("extra").type == pa.int64()
    finally:
        lg.removeHandler(h)
    errs = [r for r in records if r.levelno >= logging.ERROR]
    assert errs == []
