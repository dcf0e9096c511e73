"""Driver-style conformance check: run every queries() entry and compare to
its oracle_sql() under DuckDB (row count + column names + sorted values).

Usage: python tools/check_oracle.py [sf_dir] [query ...]
       python tools/check_oracle.py --crawl-corpus=10000
           (runs ONLY the crawl_oracle_parity battery against the
            independent simulator at that corpus size — exercises the
            parity verdict beyond the default memoized 1k crawl)
"""

from __future__ import annotations

import sys

import duckdb
import numpy as np
import pandas as pd

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].astype(np.float64)
        elif pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype(np.int64)
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def compare(name: str, ray_df: pd.DataFrame, sql_df: pd.DataFrame) -> str:
    a, b = normalize(ray_df), normalize(sql_df)
    if list(a.columns) != list(b.columns):
        return f"COLUMNS ray={list(a.columns)} sql={list(b.columns)}"
    if len(a) != len(b):
        return f"ROWS ray={len(a)} sql={len(b)}"
    try:
        pd.testing.assert_frame_equal(a, b, check_dtype=False, check_exact=True)
    except AssertionError as e:
        # retry with tolerance to show if it's a float-precision-only diff
        try:
            pd.testing.assert_frame_equal(a, b, check_dtype=False, rtol=1e-9, atol=1e-9)
            return f"FLOAT-EXACTNESS {str(e).splitlines()[-1][:160]}"
        except AssertionError:
            return f"VALUES {str(e).splitlines()[-1][:240]}"
    return "OK"


def main() -> None:
    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=8, include_dashboard=False,
                 logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    sys.path.insert(0, "/root/repo")
    import __ray_entry__ as entrymod
    from weaver_ray.pipelines.common import to_table

    crawl_sizes = [int(a.split("=")[1]) for a in sys.argv[1:]
                   if a.startswith("--crawl-corpus=")]
    if crawl_sizes:
        import os

        failures = 0
        for size in crawl_sizes:
            os.environ["WEAVER_QUERY_CRAWL_CORPUS"] = str(size)
            entrymod._CRAWL_CACHE.clear()
            row = entrymod._crawl_oracle_parity("unused").iloc[0].to_dict()
            ok = all(bool(row[k]) for k in
                     ("seen_equal", "order_equal", "fetched_equal", "records_equal"))
            print(f"crawl_oracle_parity@{size:6d}  "
                  f"{'OK' if ok else 'MISMATCH'}  {row}")
            failures += 0 if ok else 1
        ray.shutdown()
        sys.exit(1 if failures else 0)

    sf_dir = sys.argv[1] if len(sys.argv) > 1 and not sys.argv[1].startswith("-") else "/root/testdata/sf0.001"
    only = set(sys.argv[2:]) if len(sys.argv) > 2 else None

    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")

    qs, oracles = entrymod.queries(), entrymod.oracle_sql()
    failures = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            res = fn(sf_dir)
            ray_df = to_table(res).to_pandas()
        except Exception as e:  # noqa: BLE001
            print(f"{name:32s} RAY-ERROR {type(e).__name__}: {e}")
            failures += 1
            continue
        if name not in oracles:
            print(f"{name:32s} rows-only ({len(ray_df)} rows, cols={sorted(ray_df.columns)[:6]})")
            continue
        try:
            sql_df = con.execute(oracles[name]).df()
        except Exception as e:  # noqa: BLE001
            print(f"{name:32s} SQL-ERROR {e}")
            failures += 1
            continue
        verdict = compare(name, ray_df, sql_df)
        print(f"{name:32s} {verdict}")
        if verdict != "OK":
            failures += 1
    ray.shutdown()
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
