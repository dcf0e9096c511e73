"""Distributed PageRank over the crawl corpus's HOST-level link graph —
the crawl-prioritization ranking (which hosts matter) computed on the same
deterministic sha1 link structure the crawler walks.

Fixture pattern (the generate_variants precedent, pipelines/images.py):
the host edge list is derived ONCE from the corpus link functions
(url_of / url_type_of / children_of — the exact machinery the fetch
stages use) and memoized as parquet; BOTH the Ray engine and the DuckDB
oracle read that identical on-disk graph, and the oracle replays the
power iteration as an UNROLLED chain of CTEs (one per iteration), making
an iterative graph algorithm fully SQL-checkable.

Engine shape per iteration: the current rank vector (one float per host)
is broadcast with ``ray.put``; ONE map_batches pass over the distributed
weighted edge Dataset computes per-dst contribution partials (vectorized
``w/outdeg * r[src]`` gather + one pandas groupby per batch); the partial
groupby reduces them and only n_hosts floats return to the driver for the
teleport/dangling combine.  Driver state is O(nodes), never O(edges) —
the same budget as label_centroids.  For graphs whose NODE set outgrows
the driver (beyond ~10^8 hosts), the rank vector itself must be sharded:
the connected-components task exchange (dedup.connected_components_ds)
is the drop-in skeleton — ranks become hash-partitioned label slices and
the combine runs shard-side.

Reference analog: the reference has no ranking at all (its queue is FIFO,
src/queue/main.go:51); host ranking is the training-data extension that
turns the crawler's frontier into a prioritized one.
"""

from __future__ import annotations

import os
from pathlib import Path

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import ray
import ray.data as rd

from .. import config
from ..sources.corpus import (
    children_of,
    host_index,
    image_id_of,
    url_of,
    url_type_of,
)
from .common import partial_groupby, sql_round

_EDGES_VERSION = 1


def host_edges_dir(n_base: int, seed: int = config.CORPUS_SEED,
                   root: str = "/tmp/weaver_corpus") -> str:
    return os.path.join(
        root, f"seed{seed}_n{n_base}_hostedges_v{_EDGES_VERSION}")


def generate_host_edges(n_base: int = 1000, seed: int = config.CORPUS_SEED,
                        root: str = "/tmp/weaver_corpus") -> str:
    """Write (and memoize) the host-level edge list: one row per LIVE
    parent->child link in the deterministic corpus link graph (dead-link
    children are skipped — they 404 and contribute no edge).  Pure sha1
    arithmetic; no corpus scan needed."""
    d = Path(host_edges_dir(n_base, seed, root))
    done = d / "_DONE"
    if done.exists():
        return str(d)
    d.mkdir(parents=True, exist_ok=True)
    for old in d.glob("*"):
        old.unlink()
    src, dst = [], []
    for i in range(n_base):
        pid = image_id_of(i)
        sh = host_index(pid)
        for c in children_of(url_of(pid), url_type_of(pid), n_base):
            if c.startswith("imgdead"):
                continue
            src.append(sh)
            dst.append(host_index(c))
    pq.write_table(
        pa.table({"src_host": pa.array(src, pa.int64()),
                  "dst_host": pa.array(dst, pa.int64())}),
        d / "part-00000.parquet")
    done.write_text(f"n_base={n_base} seed={seed}\n")
    return str(d)


def host_pagerank(sf_dir: str, n_base: int = 1000, n_iters: int = 5,
                  d: float = 0.85) -> pd.DataFrame:
    """Weighted PageRank over the host graph (T fixed iterations, matching
    the oracle's unrolled CTE chain exactly):

        r_{t+1}(v) = (1-d)/N + d * ( sum_u w(u,v)/out(u) * r_t(u)
                                     + dangling_mass_t / N )

    Nodes are the hosts appearing in the edge list; w is the link
    multiplicity; dangling hosts (no out-edges) redistribute uniformly.
    """
    files = sorted(str(p) for p in
                   Path(generate_host_edges(n_base)).glob("part-*.parquet"))
    edges = rd.read_parquet(files)

    # (src, dst) -> weight, aggregated distributed, kept in object store
    ew = partial_groupby(edges, ["src_host", "dst_host"],
                         {"w": ("dst_host", "count")},
                         many_groups=True).materialize()

    od = partial_groupby(ew, ["src_host"], {"out": ("w", "sum")},
                         many_groups=True).to_pandas()          # n_hosts rows
    dst_hosts = partial_groupby(ew, ["dst_host"], {"n": ("w", "count")},
                                many_groups=True).to_pandas()   # n_hosts rows
    nodes = np.union1d(od["src_host"].to_numpy(np.int64),
                       dst_hosts["dst_host"].to_numpy(np.int64))
    n_nodes = len(nodes)
    if n_nodes == 0:  # empty graph: typed-empty, matching the oracle
        return pd.DataFrame({"host": pd.Series([], dtype=np.int64),
                             "pr": pd.Series([], dtype=np.float64)})
    H = int(nodes.max()) + 1
    is_node = np.zeros(H, dtype=bool)
    is_node[nodes] = True
    # store out-degrees, not reciprocals: the contribution below divides
    # (w / out * r) in the oracle's exact left-to-right FP order
    outv = np.zeros(H)
    outv[od["src_host"].to_numpy(np.int64)] = od["out"].to_numpy(np.float64)
    dangling = is_node & (outv == 0)

    r = np.zeros(H)
    r[nodes] = 1.0 / n_nodes
    for _ in range(n_iters):
        ref = ray.put((r, outv))

        def contrib(df: pd.DataFrame) -> pd.DataFrame:
            from .common import _cached_get

            r_, ov = _cached_get(ref)
            s = df["src_host"].to_numpy(np.int64)
            c = df["w"].to_numpy(np.float64) / ov[s] * r_[s]
            g = (pd.DataFrame({"dst_host": df["dst_host"].to_numpy(np.int64),
                               "c": c})
                 .groupby("dst_host", sort=False)["c"].sum().reset_index())
            return g

        parts = ew.map_batches(contrib, batch_format="pandas")
        s = partial_groupby(parts, ["dst_host"], {"c": ("c", "sum")},
                            many_groups=True).to_pandas()       # n_hosts rows
        dense = np.zeros(H)
        dense[s["dst_host"].to_numpy(np.int64)] = s["c"].to_numpy(np.float64)
        dang = float(r[dangling].sum())
        r_new = np.zeros(H)
        r_new[nodes] = (1 - d) / n_nodes + d * (dense[nodes] + dang / n_nodes)
        r = r_new

    return pd.DataFrame({"host": nodes.astype(np.int64),
                         "pr": sql_round(pd.Series(r[nodes]), 6)})


def pagerank_sql(n_base: int = 1000, n_iters: int = 5, d: float = 0.85) -> str:
    """The DuckDB oracle: the SAME fixed-point update unrolled as one CTE
    per iteration over the identical edge parquet (recursive CTEs can't
    aggregate in the recursive term, so the fixed iteration count is
    unrolled programmatically)."""
    glob = generate_host_edges(n_base) + "/part-*.parquet"
    parts = [f"""
        WITH e AS (
            SELECT src_host, dst_host, count(*)::DOUBLE AS w
            FROM read_parquet('{glob}') GROUP BY src_host, dst_host
        ),
        nodes AS (
            SELECT DISTINCT h FROM (
                SELECT src_host AS h FROM e
                UNION SELECT dst_host FROM e)
        ),
        cnt AS (SELECT count(*)::DOUBLE AS n FROM nodes),
        od AS (SELECT src_host, sum(w) AS out FROM e GROUP BY src_host),
        r0 AS (SELECT h AS host, 1.0 / (SELECT n FROM cnt) AS r FROM nodes)"""]
    for t in range(n_iters):
        prev = f"r{t}"
        parts.append(f""",
        r{t + 1} AS (
            SELECT n.h AS host,
                   (1 - {d}) / (SELECT n FROM cnt)
                   + {d} * (coalesce(s.c, 0)
                            + (SELECT coalesce(sum(p.r), 0) FROM {prev} p
                               LEFT JOIN od ON od.src_host = p.host
                               WHERE od.src_host IS NULL)
                              / (SELECT n FROM cnt)) AS r
            FROM nodes n
            LEFT JOIN (
                SELECT e.dst_host AS host, sum(e.w / od.out * p.r) AS c
                FROM e JOIN od USING (src_host)
                JOIN {prev} p ON p.host = e.src_host
                GROUP BY e.dst_host) s ON s.host = n.h
        )""")
    parts.append(f"""
        SELECT host, round(r, 6) AS pr FROM r{n_iters}""")
    return "".join(parts)
