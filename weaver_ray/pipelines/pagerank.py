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


def _live_child_links(n_base: int):
    """Iterate (parent_index, child_index) over every LIVE link in the
    deterministic corpus graph (dead-link children 404 and emit nothing) —
    the one loop both edge fixtures derive from."""
    for i in range(n_base):
        pid = image_id_of(i)
        for c in children_of(url_of(pid), url_type_of(pid), n_base):
            if c.startswith("imgdead"):
                continue
            yield i, int(c[3:])


def _memoized_edge_parquet(d: Path, table: pa.Table, note: str) -> str:
    """Shared memoize-to-parquet protocol for the edge fixtures: _DONE
    sentinel, stale-file cleanup, single sorted part."""
    done = d / "_DONE"
    if done.exists():
        return str(d)
    d.mkdir(parents=True, exist_ok=True)
    for old in d.glob("*"):
        old.unlink()
    pq.write_table(table, d / "part-00000.parquet")
    done.write_text(note)
    return str(d)


def generate_host_edges(n_base: int = 1000, seed: int = config.CORPUS_SEED,
                        root: str = "/tmp/weaver_corpus") -> str:
    """Write (and memoize) the host-level edge list: one row per LIVE
    parent->child link in the deterministic corpus link graph (dead-link
    children are skipped — they 404 and contribute no edge).  Pure sha1
    arithmetic; no corpus scan needed."""
    d = Path(host_edges_dir(n_base, seed, root))
    if (d / "_DONE").exists():
        return str(d)
    src, dst = [], []
    for i, j in _live_child_links(n_base):
        src.append(host_index(image_id_of(i)))
        dst.append(host_index(image_id_of(j)))
    t = pa.table({"src_host": pa.array(src, pa.int64()),
                  "dst_host": pa.array(dst, pa.int64())})
    return _memoized_edge_parquet(d, t, f"n_base={n_base} seed={seed}\n")


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


# ------------------------------------------------------- triangle counting


def _undirected_edges_from(files: list[str], src: str,
                           dst: str) -> "rd.Dataset":
    """Distinct undirected simple edges (a < b) from a directed edge
    parquet, as a lazy Dataset: self-loops dropped, direction collapsed
    via (min, max), distributed dedup through count partials (keys only)
    — the one edge-normalization contract shared by every undirected
    graph operator (triangles, k-core, label propagation), so
    dedup/dtype semantics can't drift between them."""
    raw = rd.read_parquet(files)

    def norm(df: pd.DataFrame) -> pd.DataFrame:
        s = df[src].to_numpy(np.int64)
        d_ = df[dst].to_numpy(np.int64)
        keep = s != d_  # self-loops are never simple-graph edges
        a = np.minimum(s, d_)[keep]
        b = np.maximum(s, d_)[keep]
        return pd.DataFrame({"a": a, "b": b}).drop_duplicates()

    return partial_groupby(raw, ["a", "b"], {"n": ("a", "count")},
                           prep=norm, many_groups=True)


def _undirected_simple_edges(n_base: int) -> "rd.Dataset":
    """The host-graph instance of the shared edge normalization."""
    files = sorted(str(p) for p in
                   Path(generate_host_edges(n_base)).glob("part-*.parquet"))
    return _undirected_edges_from(files, "src_host", "dst_host")


def host_triangles(sf_dir: str, n_base: int = 1000) -> rd.Dataset:
    """Per-host triangle counts over the UNDIRECTED simple host graph —
    the clustering/community signal for crawl prioritization (hosts
    embedded in dense link neighborhoods are hubs, not leaf content).

    Scale shape — the compact-forward algorithm: edges orient from the
    lower-(degree, id) endpoint to the higher one, so every vertex's
    OUT-degree is O(sqrt(m)) and the wedge fan-out is bounded by
    O(m^1.5) overall instead of sum(deg^2) (hot hosts are exactly the
    high-degree ones).  Wedges are generated vectorized inside apex
    buckets (one self-merge per bucket, never per-vertex Python), and
    triangle closure is ONE bucketed hash join of the wedge set against
    the oriented edge set on the (u, v) composite key.  The degree map
    is O(nodes) broadcast state — the pagerank budget; edge rows never
    reach the driver."""
    from .common import hash_join, keyed_map_groups

    # distinct undirected edges, distributed (count partials -> keys only)
    und = _undirected_simple_edges(n_base).materialize()

    # degree map: O(nodes) on the driver (the pagerank state budget)
    da = partial_groupby(und, ["a"], {"d": ("a", "count")},
                         many_groups=True).to_pandas()
    db = partial_groupby(und, ["b"], {"d": ("b", "count")},
                         many_groups=True).to_pandas()
    deg = (pd.concat([da.rename(columns={"a": "h"}),
                      db.rename(columns={"b": "h"})])
           .groupby("h")["d"].sum())
    if not len(deg):
        return rd.from_arrow(pa.table({
            "host": pa.array([], pa.int64()),
            "n_triangles": pa.array([], pa.int64())}))
    H = int(deg.index.max()) + 1
    degv = np.zeros(H, dtype=np.int64)
    degv[deg.index.to_numpy(np.int64)] = deg.to_numpy(np.int64)
    # the (u, v) join key packs both ids into one int64; host ids are tiny
    # (config.N_HOSTS), so 2^31 headroom is 8 orders of magnitude — but
    # fail loudly, not wrongly, if a different graph is ever wired in
    if H > (1 << 31):
        raise ValueError(f"host id space {H} exceeds the 2^31 uv-key packing")
    deg_ref = ray.put(degv)

    def orient(df: pd.DataFrame) -> pd.DataFrame:
        """(a, b) -> (u, v) with (deg, id)-order u < v; key = u*2^31 + v."""
        from .common import _cached_get

        dv = _cached_get(deg_ref)
        a = df["a"].to_numpy(np.int64)
        b = df["b"].to_numpy(np.int64)
        swap = (dv[a] > dv[b]) | ((dv[a] == dv[b]) & (a > b))
        u = np.where(swap, b, a)
        v = np.where(swap, a, b)
        return pd.DataFrame({"u": u, "v": v, "uv": u * (1 << 31) + v})

    oriented = und.map_batches(orient, batch_format="pandas").materialize()

    def wedges(g: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({"apex": pd.Series([], dtype=np.int64),
                              "uv": pd.Series([], dtype=np.int64)})
        if not len(g):
            return empty
        from .common import _cached_get

        dv = _cached_get(deg_ref)
        j = g[["u", "v"]].merge(g[["u", "v"]], on="u",
                                suffixes=("_x", "_y"))
        x = j["v_x"].to_numpy(np.int64)
        y = j["v_y"].to_numpy(np.int64)
        # keep each out-neighbor pair once, in (deg, id) order
        keep = (dv[x] < dv[y]) | ((dv[x] == dv[y]) & (x < y))
        return pd.DataFrame({"apex": j["u"].to_numpy(np.int64)[keep],
                             "uv": x[keep] * (1 << 31) + y[keep]})

    wedge_ds = keyed_map_groups(oriented, "u", wedges)

    def per_host(j: pd.DataFrame) -> pd.DataFrame:
        if not len(j):
            return pd.DataFrame({"host": pd.Series([], dtype=np.int64),
                                 "one": pd.Series([], dtype=np.int64)})
        uv = j["uv"].to_numpy(np.int64)
        hosts = np.concatenate([j["apex"].to_numpy(np.int64),
                                uv >> 31, uv & ((1 << 31) - 1)])
        return pd.DataFrame({"host": hosts,
                             "one": np.ones(len(hosts), dtype=np.int64)})

    tri = hash_join(wedge_ds, oriented, "uv", ["apex", "uv"], ["uv"],
                    post=per_host)
    out = partial_groupby(tri, ["host"], {"n_triangles": ("one", "sum")},
                          many_groups=True)

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        df["n_triangles"] = df["n_triangles"].astype(np.int64)
        return df

    return out.map_batches(finish, batch_format="pandas")


def host_kcore(sf_dir: str, n_base: int = 1000,
               n_rounds: int = 12) -> pd.DataFrame:
    """K-CORE DECOMPOSITION of the undirected simple host graph — each
    host's coreness (the largest k such that it survives iterated
    pruning of degree-<k nodes): the standard "dense web community vs
    leaf content" signal for crawl prioritization and graph cleaning.

    Algorithm: the H-INDEX FIXED POINT (Lü, Zhou, Zhang & Stanley 2016,
    Nature Comms): c_0 = degree; c_{t+1}(v) = h-index of the multiset
    {c_t(u) : u ~ v}.  The sequence is monotone non-increasing and
    converges to coreness exactly — and, unlike peeling, every round is
    one data-parallel pass, the published distributed formulation.

    Scale shape: the symmetrized edge list is node-partitioned ONCE
    (keyed_map_groups — each node's neighbor rows co-located); every
    round broadcasts the O(nodes) coreness vector (the pagerank budget)
    and computes per-node h-indexes vectorized inside each bucket (sort
    + cumcount + grouped max — h = max over rn of min(rn, c_sorted)).
    Runs EXACTLY ``n_rounds`` rounds (the oracle unrolls the same count)
    and RAISES if one more round would still change anything — the SSSP
    convergence-pin precedent."""
    from .common import keyed_map_groups

    und = _undirected_simple_edges(n_base)

    def sym(df: pd.DataFrame) -> pd.DataFrame:
        a = df["a"].to_numpy(np.int64)
        b = df["b"].to_numpy(np.int64)
        return pd.DataFrame({"node": np.concatenate([a, b]),
                             "nbr": np.concatenate([b, a])})

    # node-co-located neighbor lists, exchanged ONCE and reused per round
    parted = keyed_map_groups(und.map_batches(sym, batch_format="pandas"),
                              "node", lambda g: g).materialize()

    deg = partial_groupby(parted, ["node"], {"d": ("node", "count")},
                          many_groups=True).to_pandas()
    if not len(deg):
        return pd.DataFrame({"host": pd.Series([], dtype=np.int64),
                             "coreness": pd.Series([], dtype=np.int64)})
    H = int(deg["node"].max()) + 1
    c = np.zeros(H, dtype=np.int64)
    c[deg["node"].to_numpy(np.int64)] = deg["d"].to_numpy(np.int64)

    def one_round(cv: np.ndarray) -> np.ndarray:
        ref = ray.put(cv)

        def hindex(g: pd.DataFrame) -> pd.DataFrame:
            if not len(g):
                return pd.DataFrame({"node": pd.Series([], dtype=np.int64),
                                     "h": pd.Series([], dtype=np.int64)})
            from .common import _cached_get

            v = _cached_get(ref)[g["nbr"].to_numpy(np.int64)]
            d = (pd.DataFrame({"node": g["node"].to_numpy(np.int64), "v": v})
                 .sort_values(["node", "v"], ascending=[True, False]))
            rn = d.groupby("node", sort=False).cumcount().to_numpy() + 1
            d["hv"] = np.minimum(rn, d["v"].to_numpy(np.int64))
            return (d.groupby("node", sort=False)["hv"].max()
                    .rename("h").reset_index())

        # batch_size=None: whole exchange blocks, so every node's
        # neighbor rows stay together inside one hindex() call
        out = parted.map_batches(hindex, batch_format="pandas",
                                 batch_size=None).to_pandas()
        nxt = cv.copy()
        nxt[out["node"].to_numpy(np.int64)] = out["h"].to_numpy(np.int64)
        return nxt

    for _ in range(n_rounds):
        c = one_round(c)
    if not np.array_equal(one_round(c), c):
        raise RuntimeError(
            f"host_kcore: h-index iteration not converged after "
            f"{n_rounds} rounds — raise n_rounds (and the oracle unroll)")
    nodes = deg["node"].to_numpy(np.int64)
    nodes.sort()
    return pd.DataFrame({"host": nodes, "coreness": c[nodes]})


def host_kcore_sql(n_base: int = 1000, n_rounds: int = 12) -> str:
    """DuckDB oracle: the identical h-index iteration unrolled one CTE
    per round (rn-tie order inside equal c values is irrelevant — the
    h-index depends only on the multiset).  Every CTE is MATERIALIZED:
    sym is referenced in all rounds and each round references its
    predecessor in two places (the SSSP CTE-inlining lesson — default
    inlining doubles the plan per round)."""
    glob = generate_host_edges(n_base) + "/part-*.parquet"
    parts = [f"""
        WITH e AS MATERIALIZED (
            SELECT DISTINCT least(src_host, dst_host) AS a,
                            greatest(src_host, dst_host) AS b
            FROM read_parquet('{glob}') WHERE src_host <> dst_host
        ),
        sym AS MATERIALIZED (
            SELECT a AS node, b AS nbr FROM e
            UNION ALL SELECT b, a FROM e
        ),
        c0 AS MATERIALIZED (
            SELECT node, count(*)::BIGINT AS c FROM sym GROUP BY node
        )"""]
    for t in range(n_rounds):
        parts.append(f""",
        c{t + 1} AS MATERIALIZED (
            SELECT node, max(least(rn, cv)) AS c FROM (
                SELECT s.node,
                       row_number() OVER (PARTITION BY s.node
                                          ORDER BY p.c DESC, s.nbr) AS rn,
                       p.c AS cv
                FROM sym s JOIN c{t} p ON p.node = s.nbr)
            GROUP BY node
        )""")
    parts.append(f"""
        SELECT node AS host, CAST(c AS BIGINT) AS coreness
        FROM c{n_rounds}""")
    return "".join(parts)


def host_triangles_sql(n_base: int = 1000) -> str:
    """DuckDB oracle: distinct least/greatest-normalized edges, one 3-way
    self-join enumerating each triangle exactly once (x < y < z), then the
    3-row-per-triangle host explode the engine performs."""
    glob = generate_host_edges(n_base) + "/part-*.parquet"
    return f"""
        WITH e AS (
            SELECT DISTINCT least(src_host, dst_host) AS a,
                            greatest(src_host, dst_host) AS b
            FROM read_parquet('{glob}')
            WHERE src_host <> dst_host
        ),
        tri AS (
            SELECT e1.a AS x, e1.b AS y, e2.b AS z
            FROM e e1
            JOIN e e2 ON e2.a = e1.b
            JOIN e e3 ON e3.a = e1.a AND e3.b = e2.b
        )
        SELECT host, CAST(count(*) AS BIGINT) AS n_triangles FROM (
            SELECT x AS host FROM tri
            UNION ALL SELECT y FROM tri
            UNION ALL SELECT z FROM tri)
        GROUP BY host
    """


# ----------------------------------------------------------- BFS from seeds

_PAGE_EDGES_VERSION = 1


def page_edges_dir(n_base: int, seed: int = config.CORPUS_SEED,
                   root: str = "/tmp/weaver_corpus") -> str:
    return os.path.join(
        root, f"seed{seed}_n{n_base}_pageedges_v{_PAGE_EDGES_VERSION}")


def generate_page_edges(n_base: int = 1000, seed: int = config.CORPUS_SEED,
                        root: str = "/tmp/weaver_corpus") -> str:
    """Memoize the PAGE-level link graph: one row per live parent->child
    link between corpus pages (dead links skipped) — the exact graph the
    crawler's frontier expands over, at page (not host) granularity."""
    d = Path(page_edges_dir(n_base, seed, root))
    if (d / "_DONE").exists():
        return str(d)
    src_l, dst_l = zip(*_live_child_links(n_base)) if n_base else ([], [])
    t = pa.table({"src_id": pa.array(list(src_l), pa.int64()),
                  "dst_id": pa.array(list(dst_l), pa.int64())})
    return _memoized_edge_parquet(d, t, f"n_base={n_base} seed={seed}\n")


def _split_cols_by_owner(owner: np.ndarray, k: int,
                         *cols: np.ndarray) -> list[tuple]:
    """Route parallel column arrays to k parts by ``owner`` (zero-copy
    slices of one stable sort — the dedup._cc_split_pairs pattern,
    generalized to any column count)."""
    order = np.argsort(owner, kind="stable")
    bounds = np.searchsorted(owner[order], np.arange(k + 1))
    cs = [c[order] for c in cols]
    return [tuple(c[bounds[p]:bounds[p + 1]] for c in cs)
            for p in range(k)]


@ray.remote(num_cpus=0)
def _bfs_split_edges(t: pa.Table, k: int) -> list[tuple]:
    """Directed page edges routed by owner(src) — each part holds the
    out-edges of the depth slice it owns."""
    from .dedup import _cc_owner

    if "src_id" not in t.column_names:  # all-empty block: 0-column schema
        e = np.empty(0, np.int64)
        return [(e, e)] * k
    src = t.column("src_id").to_numpy(zero_copy_only=False).astype(np.int64)
    dst = t.column("dst_id").to_numpy(zero_copy_only=False).astype(np.int64)
    return _split_cols_by_owner(_cc_owner(src, k), k, src, dst)


@ray.remote(num_cpus=0)
def _bfs_split_endpoints(t: pa.Table, k: int) -> list[tuple]:
    """Edge endpoints routed by their OWN owner: node membership, so a
    part tracks the depth of every node it owns even when that node only
    ever appears as a dst of some other part's edges."""
    from .dedup import _cc_owner

    if "src_id" not in t.column_names:
        return [(np.empty(0, np.int64),)] * k
    v = np.unique(np.concatenate([
        t.column("src_id").to_numpy(zero_copy_only=False).astype(np.int64),
        t.column("dst_id").to_numpy(zero_copy_only=False).astype(np.int64)]))
    return _split_cols_by_owner(_cc_owner(v, k), k, v)


@ray.remote(num_cpus=0)
def _bfs_build_part(seeds: np.ndarray, n_edge_chunks: int, *chunks):
    """Static per-part state: sorted unique owned node ids + local
    out-edges with src resolved to a positional index."""
    edge_chunks = chunks[:n_edge_chunks]
    member_chunks = chunks[n_edge_chunks:]
    empty = [np.empty(0, np.int64)]
    nodes = np.unique(np.concatenate(
        [seeds] + [s for s, _ in edge_chunks]
        + [m[0] for m in member_chunks] + empty))
    src = (np.concatenate([s for s, _ in edge_chunks])
           if edge_chunks else empty[0])
    dst = (np.concatenate([d for _, d in edge_chunks])
           if edge_chunks else empty[0])
    return nodes, np.searchsorted(nodes, src), dst


@ray.remote(num_cpus=0)
def _bfs_init_depth(static, seeds: np.ndarray) -> np.ndarray:
    nodes, _, _ = static
    depth = np.full(len(nodes), -1, dtype=np.int64)
    depth[np.searchsorted(nodes, seeds)] = 0
    return depth


@ray.remote(num_cpus=0)
def _bfs_resolve(static, depth: np.ndarray, d: int, k: int) -> list[tuple]:
    """One frontier expansion on this part: dsts of local nodes at depth
    exactly d, locally deduped, routed by owner(dst)."""
    from .dedup import _cc_owner

    nodes, src_idx, dst = static
    cand = np.unique(dst[depth[src_idx] == d])
    return _split_cols_by_owner(_cc_owner(cand, k), k, cand)


@ray.remote(num_cpus=0)
def _bfs_apply(static, depth: np.ndarray, d: int, *cands):
    """Per-part depth update: unvisited candidates get depth d+1.
    Returns (new depth slice, newly-visited count)."""
    nodes, _, _ = static
    t = np.unique(np.concatenate(
        [c[0] for c in cands] + [np.empty(0, np.int64)]))
    idx = np.searchsorted(nodes, t)
    fresh = idx[depth[idx] == -1]
    new = depth.copy()
    new[fresh] = d + 1
    return new, int(len(fresh))


@ray.remote(num_cpus=0)
def _bfs_emit(static, depth: np.ndarray) -> pa.Table:
    nodes, _, _ = static
    m = depth >= 0
    return pa.table({"page_id": pa.array(nodes[m], pa.int64()),
                     "depth": pa.array(depth[m], pa.int64())})


def page_bfs_depth_ds(sf_dir: str, n_base: int = 1000,
                      n_seeds: int = config.N_SEEDS,
                      max_depth: int = 64, num_parts: int = 16,
                      slice_rows: int = 65_536,
                      edges_files: list[str] | None = None,
                      seed_ids: np.ndarray | None = None) -> rd.Dataset:
    """Directed BFS depth of every corpus page reachable from the crawl's
    seed pages — the frontier-expansion geometry itself: in an
    UNCONSTRAINED crawl (no robots denials, unlimited budget) that
    fetches its whole frontier every round (pipelines/crawl.py round
    loop), a page's BFS depth IS the round in which it first becomes
    fetchable.  The real crawl prunes robots-denied pages, whose
    children are then discovered later or never — the simulator parity
    battery, not this operator, checks that constrained behavior.  (The
    HOST graph is near-complete at fixture scale — every host reachable
    in one hop — so depth is only meaningful at page granularity.)

    Distributed shape (the dedup.connected_components_ds task-exchange
    skeleton — NO O(n_pages) state on the driver and nothing broadcast):
    the depth vector lives as hash-partitioned slices keyed by node id;
    each round is one resolve (local frontier dsts, deduped, routed by
    owner(dst)) + one apply (per-part min-depth update) of num_cpus=0
    tasks, with only per-part newly-visited COUNTS returning to the
    driver.  Rounds = graph depth.  ``num_parts`` is a cap; actual slice
    count is sized to the edge data (ceil(edges / slice_rows)) so bench
    graphs don't pay k^2 scheduling overhead while at 10^10 URLs the cap
    rises with the cluster.

    ``edges_files`` / ``seed_ids`` override the fixture graph and seed
    list (randomized-equivalence tests drive arbitrary graphs through
    the SAME distributed machinery; production callers leave them
    None)."""
    from .common import unwrap_single_return

    if seed_ids is not None:
        seeds = np.unique(np.asarray(seed_ids, dtype=np.int64))
    else:
        # the crawl's ACTUAL seed pages (sources/corpus.py:seed_image_ids —
        # the first n_seeds ROOT-classified rows, ids i*ROOT_EVERY), not
        # ids 0..n_seeds-1: 18 of those are product pages the crawl never
        # seeds
        seeds = np.array(sorted({
            i * config.ROOT_EVERY
            for i in range(min(n_seeds,
                               (n_base - 1) // config.ROOT_EVERY + 1))}),
            dtype=np.int64)
    files = edges_files if edges_files is not None else sorted(
        str(p) for p in Path(generate_page_edges(n_base)).glob("part-*.parquet"))
    edges = rd.read_parquet(files).materialize()
    n = max(edges.count(), 1)
    k = max(1, min(num_parts, -(-n // slice_rows)))
    refs = edges.to_arrow_refs()
    edge_splits = [_bfs_split_edges.options(num_returns=k).remote(r, k)
                   for r in refs]
    member_splits = [_bfs_split_endpoints.options(num_returns=k)
                     .remote(r, k) for r in refs]
    if k == 1:  # num_returns=1 yields ONE ref to the whole returned list
        edge_splits = [[unwrap_single_return.remote(s)]
                       for s in edge_splits]
        member_splits = [[unwrap_single_return.remote(s)]
                         for s in member_splits]
    from .dedup import _cc_owner

    seed_parts = _split_cols_by_owner(_cc_owner(seeds, k), k, seeds)
    statics = [
        _bfs_build_part.remote(
            seed_parts[p][0], len(edge_splits),
            *[s[p] for s in edge_splits], *[m[p] for m in member_splits])
        for p in range(k)
    ]
    depths = [_bfs_init_depth.remote(statics[p], seed_parts[p][0])
              for p in range(k)]

    def expand(cur, d):
        """One distributed round; returns (new depth refs, count refs)."""
        props = [_bfs_resolve.options(num_returns=k).remote(
            statics[q], cur[q], d, k) for q in range(k)]
        if k == 1:
            props = [[unwrap_single_return.remote(r)] for r in props]
        outs = [_bfs_apply.options(num_returns=2).remote(
            statics[p], cur[p], d, *[props[q][p] for q in range(k)])
            for p in range(k)]
        return [o[0] for o in outs], [o[1] for o in outs]

    d = 0
    while d < max_depth:
        nxt, counts = expand(depths, d)
        if sum(ray.get(counts)) == 0:
            break
        depths = nxt
        d += 1
    else:
        # d hit the cap.  That is fine if the cap-depth frontier expands to
        # nothing NEW (BFS complete, deepest page exactly at max_depth —
        # the oracle's recursive CTE also emits d == max_depth rows); it is
        # an error only if unexplored pages remain beyond the cap.
        _, counts = expand(depths, max_depth)
        if sum(ray.get(counts)) > 0:
            raise RuntimeError(
                f"BFS exceeded max_depth={max_depth}; raise the cap "
                "(oracle unrolls to the same cap)")

    return rd.from_arrow_refs(
        [_bfs_emit.remote(statics[p], depths[p]) for p in range(k)])


def page_bfs_depth(sf_dir: str, n_base: int = 1000,
                   n_seeds: int = config.N_SEEDS,
                   max_depth: int = 64, num_parts: int = 16,
                   slice_rows: int = 65_536) -> pd.DataFrame:
    """Query shim: sorted pandas view of :func:`page_bfs_depth_ds` (at
    100 TB sink the Dataset instead)."""
    out = page_bfs_depth_ds(sf_dir, n_base, n_seeds, max_depth,
                            num_parts, slice_rows).to_pandas()
    return (out.astype({"page_id": np.int64, "depth": np.int64})
            .sort_values("page_id").reset_index(drop=True))


def page_bfs_depth_sql(n_base: int = 1000, n_seeds: int = config.N_SEEDS,
                       max_depth: int = 64) -> str:
    """DuckDB oracle: recursive CTE over the identical edge parquet; UNION
    (distinct) bounds the recursion at V*max_depth rows even with cycles,
    and min(d) per page is the BFS depth as long as max_depth >= the true
    eccentricity (the engine raises if its BFS exceeds the same cap)."""
    seeds = sorted({i * config.ROOT_EVERY
                    for i in range(min(n_seeds,
                                       (n_base - 1) // config.ROOT_EVERY + 1))})
    glob = generate_page_edges(n_base) + "/part-*.parquet"
    vals = ", ".join(f"({h}::BIGINT, 0::BIGINT)" for h in seeds)
    return f"""
        WITH RECURSIVE e AS (
            SELECT DISTINCT src_id, dst_id FROM read_parquet('{glob}')
        ),
        bfs(page_id, d) AS (
            SELECT * FROM (VALUES {vals}) t(page_id, d)
            UNION
            SELECT e.dst_id, bfs.d + 1
            FROM bfs JOIN e ON e.src_id = bfs.page_id
            WHERE bfs.d < {max_depth}
        )
        SELECT page_id, CAST(min(d) AS BIGINT) AS depth
        FROM bfs GROUP BY page_id
    """


_SSSP_INF = 10 ** 15  # unreachable sentinel; all arithmetic stays int64


def host_shortest_paths(sf_dir: str, n_base: int = 1000,
                        n_rounds: int = 10) -> pd.DataFrame:
    """Weighted SINGLE-SOURCE SHORTEST PATHS over the directed host graph
    — Bellman-Ford run for a FIXED ``n_rounds`` of relaxations so the
    DuckDB oracle can unroll the identical fixed point (the pagerank /
    kmeans precedent applied to the (min, +) semiring).  All arithmetic
    is int64 (deterministic weights ``1 + (src + 2*dst) % 7`` on the
    DISTINCT edge set, source = lowest host id), so parity needs no
    rounding grid at all.

    Engine shape per round: the O(nodes) distance vector broadcasts via
    ``ray.put`` (the pagerank budget — never O(edges) driver state); ONE
    map_batches pass over the distributed edge Dataset emits per-batch
    per-dst candidate minima; a tiny min-reduce folds them and the driver
    takes elementwise min with the previous vector.  ``n_rounds`` bounds
    path HOPS, not graph size — pytest pins that an extra round changes
    nothing at fixture scale (converged), so the fixed count is the
    diameter bound, not an approximation."""
    from .common import _cached_get

    files = sorted(str(p) for p in
                   Path(generate_host_edges(n_base)).glob("part-*.parquet"))
    edges = rd.read_parquet(files)

    # distinct directed edges with the deterministic weight
    ew = partial_groupby(edges, ["src_host", "dst_host"],
                         {"n": ("dst_host", "count")},
                         many_groups=True).map_batches(
        lambda df: pd.DataFrame({
            "src_host": df["src_host"].to_numpy(np.int64),
            "dst_host": df["dst_host"].to_numpy(np.int64),
            "w": 1 + (df["src_host"].to_numpy(np.int64)
                      + 2 * df["dst_host"].to_numpy(np.int64)) % 7}),
        batch_format="pandas").materialize()

    # ONE stacked distinct pass enumerates the node ids (review fix:
    # two per-endpoint exchanges paid a second full shuffle for nothing)
    hosts = partial_groupby(
        ew.map_batches(
            lambda df: pd.DataFrame({"h": np.concatenate(
                [df["src_host"].to_numpy(np.int64),
                 df["dst_host"].to_numpy(np.int64)])}),
            batch_format="pandas"),
        ["h"], {"n": ("h", "count")}, many_groups=True).to_pandas()
    nodes = np.sort(hosts["h"].to_numpy(np.int64))
    if not len(nodes):
        return pd.DataFrame({"host": pd.Series([], dtype=np.int64),
                             "dist": pd.Series([], dtype=np.int64)})
    H = int(nodes.max()) + 1
    dist = np.full(H, _SSSP_INF, dtype=np.int64)
    dist[int(nodes.min())] = 0

    for _ in range(n_rounds):
        ref = ray.put(dist)

        def relax(df: pd.DataFrame) -> pd.DataFrame:
            d_ = _cached_get(ref)
            s = df["src_host"].to_numpy(np.int64)
            reach = d_[s] < _SSSP_INF
            if not reach.any():
                return pd.DataFrame({"dst_host": pd.Series([], dtype=np.int64),
                                     "m": pd.Series([], dtype=np.int64)})
            cand = pd.DataFrame({
                "dst_host": df["dst_host"].to_numpy(np.int64)[reach],
                "m": d_[s[reach]] + df["w"].to_numpy(np.int64)[reach]})
            return cand.groupby("dst_host", sort=False)["m"].min().reset_index()

        mins = partial_groupby(
            ew.map_batches(relax, batch_format="pandas"),
            ["dst_host"], {"m": ("m", "min")}, many_groups=True).to_pandas()
        if len(mins):
            di = mins["dst_host"].to_numpy(np.int64)
            np.minimum.at(dist, di, mins["m"].to_numpy(np.int64))

    reach = nodes[dist[nodes] < _SSSP_INF]
    return (pd.DataFrame({"host": reach.astype(np.int64),
                          "dist": dist[reach].astype(np.int64)})
            .sort_values("host").reset_index(drop=True))


def host_sssp_sql(n_base: int = 1000, n_rounds: int = 10) -> str:
    """The DuckDB oracle: Bellman-Ford unrolled one CTE per relaxation
    round over the identical edge parquet — distinct edges, the same
    deterministic integer weights, source = min host id, INF sentinel.

    Every round CTE is AS MATERIALIZED: each d_{{t+1}} references d_t
    TWICE (elementwise min + relaxation join), so DuckDB's default CTE
    INLINING doubles the plan per round — 2^n_rounds copies of the base
    scan, which turned the 10-round chain into a >10-minute query.
    Materialization makes it 10 tiny sequential joins (~0.06 s)."""
    glob = generate_host_edges(n_base) + "/part-*.parquet"
    inf = _SSSP_INF
    parts = [f"""
        WITH ew AS MATERIALIZED (
            SELECT src_host, dst_host,
                   1 + (src_host + 2 * dst_host) % 7 AS w
            FROM (SELECT DISTINCT src_host, dst_host
                  FROM read_parquet('{glob}'))
        ),
        nodes AS MATERIALIZED (
            SELECT DISTINCT h FROM (
                SELECT src_host AS h FROM ew
                UNION SELECT dst_host FROM ew)
        ),
        d0 AS MATERIALIZED (
            SELECT h AS host,
                   CASE WHEN h = (SELECT min(h) FROM nodes)
                        THEN 0 ELSE {inf} END AS dist
            FROM nodes)"""]
    for t in range(n_rounds):
        parts.append(f""",
        d{t + 1} AS MATERIALIZED (
            SELECT n.host, least(n.dist, coalesce(c.m, {inf})) AS dist
            FROM d{t} n LEFT JOIN (
                SELECT ew.dst_host AS host, min(p.dist + ew.w) AS m
                FROM ew JOIN d{t} p ON p.host = ew.src_host
                WHERE p.dist < {inf}
                GROUP BY ew.dst_host) c ON c.host = n.host
        )""")
    parts.append(f"""
        SELECT host, CAST(dist AS BIGINT) AS dist FROM d{n_rounds}
        WHERE dist < {inf} ORDER BY host""")
    return "".join(parts)


# LPA contract shared by the engine and the SQL oracle: synchronous rounds
LPA_ROUNDS = 4


@ray.remote(num_cpus=0)
def _lpa_split_edges(t: pa.Table, k: int) -> list[tuple]:
    """Symmetrize the distinct undirected (a, b) edge block into
    (provider, consumer) rows — each node consumes its neighbors' labels
    — routed by owner(provider), so every edge is co-located with the
    label slice that provides across it.  Since the sym graph is
    symmetric, every node appears as a provider in its owner's part:
    node membership comes free."""
    from .dedup import _cc_owner

    if "a" not in t.column_names:  # all-empty block: 0-column schema
        e = np.empty(0, np.int64)
        return [(e, e)] * k
    a = t.column("a").to_numpy(zero_copy_only=False).astype(np.int64)
    b = t.column("b").to_numpy(zero_copy_only=False).astype(np.int64)
    prov = np.concatenate([a, b])
    cons = np.concatenate([b, a])
    return _split_cols_by_owner(_cc_owner(prov, k), k, prov, cons)


@ray.remote(num_cpus=0)
def _lpa_build_part(*chunks):
    """Static per-part state: sorted unique owned node ids (= local
    providers) + local edges with provider resolved to a positional
    index."""
    empty = [np.empty(0, np.int64)]
    provs = [p for p, _ in chunks]
    nodes = np.unique(np.concatenate(provs + empty))
    prov = np.concatenate(provs) if provs else empty[0]
    cons = (np.concatenate([c for _, c in chunks])
            if chunks else empty[0])
    return nodes, np.searchsorted(nodes, prov), cons


@ray.remote(num_cpus=0)
def _lpa_init_labels(static) -> np.ndarray:
    nodes, _, _ = static
    return nodes.copy()  # l0: every node is its own label


@ray.remote(num_cpus=0)
def _lpa_resolve(static, labels: np.ndarray, k: int) -> list[tuple]:
    """Send each local node's CURRENT label across its out-edges, with a
    per-(consumer, label) count combiner before the exchange — only
    (node, label, partial_count) triples travel, routed by
    owner(consumer)."""
    from .dedup import _cc_owner

    nodes, prov_idx, cons = static
    lab = labels[prov_idx]
    order = np.lexsort((lab, cons))
    c, l_ = cons[order], lab[order]
    new_grp = np.ones(len(c), dtype=bool)
    new_grp[1:] = (c[1:] != c[:-1]) | (l_[1:] != l_[:-1])
    starts = np.flatnonzero(new_grp)
    cnt = np.diff(np.append(starts, len(c))).astype(np.int64)
    ck, lk = c[starts], l_[starts]
    return _split_cols_by_owner(_cc_owner(ck, k), k, ck, lk, cnt)


@ray.remote(num_cpus=0)
def _lpa_apply(static, labels: np.ndarray, *triples) -> np.ndarray:
    """Per-part synchronous majority update: sum incoming partial counts
    per (node, label), then each node adopts the most frequent neighbor
    label, ties to the smallest label — (count desc, label asc), the
    exact oracle tiebreak."""
    nodes, _, _ = static
    empty = np.empty(0, np.int64)
    node = np.concatenate([t[0] for t in triples] + [empty])
    lab = np.concatenate([t[1] for t in triples] + [empty])
    cnt = np.concatenate([t[2] for t in triples] + [empty])
    if not len(node):
        return labels
    order = np.lexsort((lab, node))
    n_, l_, c_ = node[order], lab[order], cnt[order]
    new_grp = np.ones(len(n_), dtype=bool)
    new_grp[1:] = (n_[1:] != n_[:-1]) | (l_[1:] != l_[:-1])
    starts = np.flatnonzero(new_grp)
    sums = np.add.reduceat(c_, starts)
    nk, lk = n_[starts], l_[starts]
    o2 = np.lexsort((lk, -sums, nk))  # node asc, count desc, label asc
    nk2, lk2 = nk[o2], lk[o2]
    first = np.ones(len(nk2), dtype=bool)
    first[1:] = nk2[1:] != nk2[:-1]
    new = labels.copy()
    new[np.searchsorted(nodes, nk2[first])] = lk2[first]
    return new


@ray.remote(num_cpus=0)
def _lpa_emit(static, labels: np.ndarray) -> pa.Table:
    nodes, _, _ = static
    return pa.table({"page_id": pa.array(nodes, pa.int64()),
                     "community": pa.array(labels, pa.int64())})


def page_communities_ds(sf_dir: str, n_base: int = 1000,
                        n_rounds: int = LPA_ROUNDS, num_parts: int = 16,
                        slice_rows: int = 65_536,
                        edges_files: list[str] | None = None) -> rd.Dataset:
    """COMMUNITY DETECTION via synchronous LABEL PROPAGATION (Raghavan,
    Albert & Kumara 2007) over the undirected simple page graph: every
    node starts as its own label; each round, every node adopts the most
    frequent label among its NEIGHBORS, ties broken to the smallest
    label — run for a FIXED ``n_rounds`` so the DuckDB oracle can unroll
    the identical update (the pagerank/kcore/SSSP precedent; synchronous
    LPA need not converge, so the fixed count IS the contract, not an
    approximation of a fixed point).

    Distributed shape (the dedup.connected_components_ds task-exchange
    skeleton — NO O(n_pages) label vector on the driver or in ray.put):
    labels live as hash-partitioned slices keyed by node id; the
    symmetrized edge list is co-partitioned with its provider's slice
    ONCE and reused every round; each round is one resolve (labels cross
    edges as (node, label, count) combined partials) + one apply
    (per-part exact majority, (count desc, label asc) tiebreak) of
    num_cpus=0 tasks — the driver sees only refs.  Parity is pure
    integers.  ``num_parts`` is a cap; the slice count is sized to the
    edge data (ceil(sym_edges / slice_rows)).  ``edges_files`` overrides
    the fixture graph (randomized-equivalence tests; production callers
    leave it None)."""
    from .common import unwrap_single_return

    files = edges_files if edges_files is not None else sorted(
        str(p) for p in Path(generate_page_edges(n_base)).glob("part-*.parquet"))
    und = _undirected_edges_from(files, "src_id", "dst_id").materialize()
    n = max(2 * und.count(), 1)
    k = max(1, min(num_parts, -(-n // slice_rows)))
    edge_splits = [_lpa_split_edges.options(num_returns=k).remote(r, k)
                   for r in und.to_arrow_refs()]
    if k == 1:  # num_returns=1 yields ONE ref to the whole returned list
        edge_splits = [[unwrap_single_return.remote(s)]
                       for s in edge_splits]
    statics = [_lpa_build_part.remote(*[s[p] for s in edge_splits])
               for p in range(k)]
    labels = [_lpa_init_labels.remote(st) for st in statics]

    for _ in range(n_rounds):
        props = [_lpa_resolve.options(num_returns=k).remote(
            statics[q], labels[q], k) for q in range(k)]
        if k == 1:
            props = [[unwrap_single_return.remote(r)] for r in props]
        labels = [_lpa_apply.remote(
            statics[p], labels[p], *[props[q][p] for q in range(k)])
            for p in range(k)]

    return rd.from_arrow_refs(
        [_lpa_emit.remote(statics[p], labels[p]) for p in range(k)])


def page_communities(sf_dir: str, n_base: int = 1000,
                     n_rounds: int = LPA_ROUNDS, num_parts: int = 16,
                     slice_rows: int = 65_536) -> pd.DataFrame:
    """Query shim: sorted pandas view of :func:`page_communities_ds` (at
    100 TB sink the Dataset instead)."""
    out = page_communities_ds(sf_dir, n_base, n_rounds, num_parts,
                              slice_rows).to_pandas()
    if not len(out):
        return pd.DataFrame({"page_id": pd.Series([], dtype=np.int64),
                             "community": pd.Series([], dtype=np.int64)})
    return (out.astype({"page_id": np.int64, "community": np.int64})
            .sort_values("page_id").reset_index(drop=True))


def page_communities_sql(n_base: int = 1000,
                         n_rounds: int = LPA_ROUNDS) -> str:
    """DuckDB oracle: the identical synchronous majority update unrolled
    one MATERIALIZED CTE per round (each round references its
    predecessor through the join — the SSSP CTE-inlining lesson)."""
    glob = generate_page_edges(n_base) + "/part-*.parquet"
    parts = [f"""
        WITH e AS MATERIALIZED (
            SELECT DISTINCT least(src_id, dst_id) AS a,
                            greatest(src_id, dst_id) AS b
            FROM read_parquet('{glob}') WHERE src_id <> dst_id
        ),
        sym AS MATERIALIZED (
            SELECT a AS node, b AS nbr FROM e
            UNION ALL SELECT b, a FROM e
        ),
        l0 AS MATERIALIZED (
            SELECT DISTINCT node, node AS lab FROM sym
        )"""]
    for t in range(n_rounds):
        parts.append(f""",
        l{t + 1} AS MATERIALIZED (
            SELECT node, lab FROM (
                SELECT node, lab,
                       row_number() OVER (PARTITION BY node
                                          ORDER BY n DESC, lab) AS rn
                FROM (SELECT s.node, p.lab, count(*)::BIGINT AS n
                      FROM sym s JOIN l{t} p ON p.node = s.nbr
                      GROUP BY s.node, p.lab)
            ) WHERE rn = 1
        )""")
    parts.append(f"""
        SELECT node AS page_id, CAST(lab AS BIGINT) AS community
        FROM l{n_rounds}""")
    return "".join(parts)


# HITS contract shared by the engine and the SQL oracle
HITS_ITERS = 5


def host_hits(sf_dir: str, n_base: int = 1000,
              n_iters: int = HITS_ITERS) -> pd.DataFrame:
    """HITS HUBS & AUTHORITIES (Kleinberg 1999) over the weighted
    directed host graph — the link-analysis complement to
    :func:`host_pagerank`: authorities are hosts that heavily-linking
    hubs point at; hubs are hosts that point at strong authorities.
    Fixed ``n_iters`` mutual-reinforcement rounds with L1 normalization
    after every half-step, exactly as the oracle unrolls them (the
    pagerank precedent); final scores rounded 6 dp.

    Scale shape per round (the pagerank budget): the O(nodes) score
    vector broadcasts via ``ray.put``; each half-step is ONE map_batches
    pass over the distributed weighted edge Dataset emitting per-batch
    contribution partials + a tiny reduce; normalization folds on the
    O(nodes) driver vector.  Two passes per round are inherent to HITS
    (authority needs hubs, hub needs fresh authorities)."""
    from .common import _cached_get

    files = sorted(str(p) for p in
                   Path(generate_host_edges(n_base)).glob("part-*.parquet"))
    edges = rd.read_parquet(files)
    ew = partial_groupby(edges, ["src_host", "dst_host"],
                         {"w": ("dst_host", "count")},
                         many_groups=True).materialize()

    od = partial_groupby(ew, ["src_host"], {"n": ("w", "count")},
                         many_groups=True).to_pandas()
    idg = partial_groupby(ew, ["dst_host"], {"n": ("w", "count")},
                          many_groups=True).to_pandas()
    nodes = np.union1d(od["src_host"].to_numpy(np.int64),
                       idg["dst_host"].to_numpy(np.int64))
    if not len(nodes):
        return pd.DataFrame({"host": pd.Series([], dtype=np.int64),
                             "hub": pd.Series([], dtype=np.float64),
                             "authority": pd.Series([], dtype=np.float64)})
    H = int(nodes.max()) + 1

    def half_step(vec: np.ndarray, key_in: str, key_out: str) -> np.ndarray:
        """sum_{edges} w * vec[key_in] grouped by key_out, L1-normalized."""
        ref = ray.put(vec)

        def contrib(df: pd.DataFrame) -> pd.DataFrame:
            v = _cached_get(ref)
            c = df["w"].to_numpy(np.float64) * v[df[key_in].to_numpy(np.int64)]
            return (pd.DataFrame({"host": df[key_out].to_numpy(np.int64),
                                  "c": c})
                    .groupby("host", sort=False)["c"].sum().reset_index())

        s = partial_groupby(ew.map_batches(contrib, batch_format="pandas"),
                            ["host"], {"c": ("c", "sum")},
                            many_groups=True).to_pandas()
        dense = np.zeros(H)
        dense[s["host"].to_numpy(np.int64)] = s["c"].to_numpy(np.float64)
        return dense / dense.sum()

    h = np.zeros(H)
    h[nodes] = 1.0 / len(nodes)
    for _ in range(n_iters):
        a = half_step(h, "src_host", "dst_host")   # authorities from hubs
        h = half_step(a, "dst_host", "src_host")   # hubs from authorities
    return pd.DataFrame({"host": nodes.astype(np.int64),
                         "hub": sql_round(pd.Series(h[nodes]), 6),
                         "authority": sql_round(pd.Series(a[nodes]), 6)})


def host_hits_sql(n_base: int = 1000, n_iters: int = HITS_ITERS) -> str:
    """DuckDB oracle: the identical alternating half-steps unrolled as
    MATERIALIZED CTE pairs (each normalized by its own sum); hosts with
    no in-edges (or out-edges) coalesce to 0 in the final projection."""
    glob = generate_host_edges(n_base) + "/part-*.parquet"
    parts = [f"""
        WITH e AS MATERIALIZED (
            SELECT src_host, dst_host, count(*)::DOUBLE AS w
            FROM read_parquet('{glob}') GROUP BY src_host, dst_host
        ),
        nodes AS MATERIALIZED (
            SELECT DISTINCT host FROM (
                SELECT src_host AS host FROM e
                UNION ALL SELECT dst_host FROM e)
        ),
        h0 AS MATERIALIZED (
            SELECT host, 1.0 / (SELECT count(*) FROM nodes) AS v FROM nodes
        )"""]
    for t in range(n_iters):
        parts.append(f""",
        a{t + 1}r AS MATERIALIZED (
            SELECT e.dst_host AS host, sum(e.w * p.v) AS v
            FROM e JOIN h{t} p ON p.host = e.src_host GROUP BY e.dst_host
        ),
        a{t + 1} AS MATERIALIZED (
            SELECT host, v / (SELECT sum(v) FROM a{t + 1}r) AS v FROM a{t + 1}r
        ),
        h{t + 1}r AS MATERIALIZED (
            SELECT e.src_host AS host, sum(e.w * p.v) AS v
            FROM e JOIN a{t + 1} p ON p.host = e.dst_host GROUP BY e.src_host
        ),
        h{t + 1} AS MATERIALIZED (
            SELECT host, v / (SELECT sum(v) FROM h{t + 1}r) AS v FROM h{t + 1}r
        )""")
    parts.append(f"""
        SELECT n.host,
               round(coalesce(h.v, 0), 6) AS hub,
               round(coalesce(a.v, 0), 6) AS authority
        FROM nodes n
        LEFT JOIN h{n_iters} h ON h.host = n.host
        LEFT JOIN a{n_iters} a ON a.host = n.host""")
    return "".join(parts)


def page_components(sf_dir: str, n_base: int = 1000) -> pd.DataFrame:
    """Weakly-CONNECTED COMPONENTS of the undirected page graph —
    component_id = smallest reachable page id, computed by the SAME
    task-based min-label-propagation-with-pointer-jumping machinery the
    near-dup dedup family uses (dedup.connected_components_ds), here on
    a graph table instead of a similarity pair set.  The node universe
    comes free from the CC machinery itself (it absorbs every edge
    endpoint — a separate node-enumeration shuffle would be pure waste);
    isolated pages (no edges) are excluded on both engines."""
    import pyarrow as _pa

    from .dedup import connected_components_ds

    files = sorted(str(p) for p in
                   Path(generate_page_edges(n_base)).glob("part-*.parquet"))
    und = _undirected_edges_from(files, "src_id", "dst_id")

    def as_edges(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"src": df["a"].to_numpy(np.int64),
                             "dst": df["b"].to_numpy(np.int64)})

    edges = und.map_batches(as_edges, batch_format="pandas")
    no_extra_nodes = rd.from_arrow(
        _pa.table({"doc_id": _pa.array([], _pa.int64())}))
    cc = connected_components_ds(no_extra_nodes, edges).to_pandas()
    return (pd.DataFrame({
        "page_id": cc["doc_id"].to_numpy(np.int64),
        "component_id": cc["cluster_id"].to_numpy(np.int64)})
        .sort_values("page_id").reset_index(drop=True))


def page_components_sql(n_base: int = 1000) -> str:
    """DuckDB oracle: recursive min-label transitive closure over the
    identical symmetrized edge set (the neardup_clusters pattern on a
    graph table)."""
    glob = generate_page_edges(n_base) + "/part-*.parquet"
    return f"""
        WITH RECURSIVE e AS (
            SELECT DISTINCT least(src_id, dst_id) AS a,
                            greatest(src_id, dst_id) AS b
            FROM read_parquet('{glob}') WHERE src_id <> dst_id
        ),
        edges AS (
            SELECT a AS src, b AS dst FROM e UNION ALL SELECT b, a FROM e
        ),
        n AS (SELECT DISTINCT src AS page_id FROM edges),
        reach AS (
            SELECT page_id, page_id AS r FROM n
            UNION
            SELECT e.dst AS page_id, reach.r
            FROM reach JOIN edges e ON e.src = reach.page_id
        )
        SELECT page_id, CAST(min(r) AS BIGINT) AS component_id
        FROM reach GROUP BY page_id
    """


def host_clustering(sf_dir: str, n_base: int = 1000) -> pd.DataFrame:
    """Local CLUSTERING COEFFICIENT per host — c(v) = 2*T(v) /
    (d(v)*(d(v)-1)) over the undirected simple host graph, the
    triangle-density complement to coreness: how tightly each host's
    neighborhood interlinks.  Reuses :func:`host_triangles` (compact
    -forward wedge join) for T and the shared edge normalization for
    degrees; the join folds on the O(nodes) driver table (the pagerank
    budget).  Hosts with degree < 2 are excluded (coefficient
    undefined); triangle-free hosts report 0.  Parity: T and d are
    exact integers, the coefficient is one rounded float64 division
    with factors cast before multiplying."""
    tri = host_triangles(sf_dir, n_base).to_pandas()
    und = _undirected_simple_edges(n_base)

    def sym(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"host": np.concatenate(
            [df["a"].to_numpy(np.int64), df["b"].to_numpy(np.int64)])})

    deg = partial_groupby(und.map_batches(sym, batch_format="pandas"),
                          ["host"], {"d": ("host", "count")},
                          many_groups=True).to_pandas()
    deg["d"] = deg["d"].astype(np.int64)
    out = deg[deg["d"] >= 2].merge(tri, on="host", how="left")
    out["n_triangles"] = out["n_triangles"].fillna(0).astype(np.int64)
    t = out["n_triangles"].to_numpy(np.float64)
    d = out["d"].to_numpy(np.float64)
    out["clustering"] = sql_round(2.0 * t / (d * (d - 1.0)), 6)
    return (out[["host", "d", "n_triangles", "clustering"]]
            .rename(columns={"d": "degree"})
            .sort_values("host").reset_index(drop=True))


def host_clustering_sql(n_base: int = 1000) -> str:
    """DuckDB oracle: degrees from the symmetrized distinct edge set,
    triangle counts by NESTING host_triangles_sql verbatim (one source
    of truth — the consensus-oracle rule), identical rounded
    coefficient."""
    glob = generate_host_edges(n_base) + "/part-*.parquet"
    return f"""
        WITH ec AS (
            SELECT DISTINCT least(src_host, dst_host) AS a,
                            greatest(src_host, dst_host) AS b
            FROM read_parquet('{glob}') WHERE src_host <> dst_host
        ),
        sym AS (SELECT a AS host, b AS nbr FROM ec
                UNION ALL SELECT b, a FROM ec),
        deg AS (SELECT host, count(*)::BIGINT AS degree FROM sym
                GROUP BY host),
        tri AS ({host_triangles_sql(n_base)})
        SELECT d.host, d.degree,
               coalesce(t.n_triangles, 0)::BIGINT AS n_triangles,
               round(2.0 * coalesce(t.n_triangles, 0)::DOUBLE
                     / (d.degree::DOUBLE * (d.degree - 1)::DOUBLE), 6)
                   AS clustering
        FROM deg d LEFT JOIN tri t ON t.host = d.host
        WHERE d.degree >= 2
    """


def _host_degrees(edges: "rd.Dataset") -> pd.DataFrame:
    """Shared endpoint-degree reduce over the normalized undirected edge
    Dataset — ONE definition so assortativity's moments and the attack
    audit's hub selection can never drift."""
    from .common import partial_groupby

    def endpoints(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "v": np.concatenate([b["a"].to_numpy(np.int64),
                                 b["b"].to_numpy(np.int64)])})

    return partial_groupby(edges.map_batches(endpoints,
                                             batch_format="pandas"),
                           ["v"], {"deg": ("v", "count")},
                           many_groups=True).to_pandas()


def host_degree_assortativity(sf_dir: str, n_base: int = 1000) -> pd.DataFrame:
    """DEGREE ASSORTATIVITY (Newman 2002) of the undirected simple host
    graph: the Pearson correlation of endpoint degrees over directed
    edge stubs — positive means hubs link hubs (a crawl can exploit
    that: hub-first scheduling saturates politeness budgets), negative
    means hub-and-spoke.  With each undirected edge counted in both
    orientations the moment sums are symmetric, so
    r = (M*Sxy - Sx^2) / (M*Sxx - Sx^2) with EVERY term an exact
    integer — one float division at the end (6 dp), no grid anywhere
    else (the kmeans_label_ari integer-exactness pattern).

    Scale shape: degrees are one endpoint-keyed count exchange; the
    moment pass joins the node-count-bounded degree table back onto the
    edge stream (broadcast here — a host table is small by construction;
    a page-graph variant would swap in the bucketed hash join) and
    reduces four integers."""
    from .common import _cached_get, sql_round

    edges = _undirected_simple_edges(n_base)
    deg = _host_degrees(edges)
    dmap = dict(zip(deg["v"].to_numpy(np.int64),
                    deg["deg"].to_numpy(np.int64)))
    ref = ray.put(dmap)

    def moments(b: pd.DataFrame) -> pd.DataFrame:
        dm = _cached_get(ref)
        da = b["a"].map(dm).to_numpy(np.int64)
        db = b["b"].map(dm).to_numpy(np.int64)
        return pd.DataFrame({
            "m": [np.int64(2 * len(b))],
            "sx": [(da + db).sum()],
            "sxx": [(da * da + db * db).sum()],
            "sxy": [(2 * da * db).sum()]})

    s = (edges.map_batches(moments, batch_format="pandas")
         .to_pandas().sum())
    m, sx, sxx, sxy = (int(s["m"]), int(s["sx"]), int(s["sxx"]),
                       int(s["sxy"]))
    den = m * sxx - sx * sx
    r = float(sql_round((m * sxy - sx * sx) / den, 6)) if den else 0.0
    return pd.DataFrame({
        "n_edges": [np.int64(m // 2)],
        "n_hosts": [np.int64(len(deg))],
        "assortativity": [r]})


def host_degree_assortativity_sql(n_base: int = 1000) -> str:
    glob = generate_host_edges(n_base) + "/part-*.parquet"
    return f"""
        WITH e AS (
            SELECT DISTINCT least(src_host, dst_host) AS a,
                   greatest(src_host, dst_host) AS b
            FROM read_parquet('{glob}') WHERE src_host <> dst_host
        ),
        deg AS (
            SELECT v, count(*)::BIGINT AS d FROM (
                SELECT a AS v FROM e UNION ALL SELECT b FROM e)
            GROUP BY 1
        ),
        m AS (
            SELECT da.d AS da, db.d AS db
            FROM e JOIN deg da ON da.v = e.a JOIN deg db ON db.v = e.b
        ),
        s AS (
            SELECT 2 * count(*)::BIGINT AS m,
                   sum(da + db)::BIGINT AS sx,
                   sum(da * da + db * db)::BIGINT AS sxx,
                   sum(2 * da * db)::BIGINT AS sxy
            FROM m
        )
        SELECT (m / 2)::BIGINT AS n_edges,
               (SELECT count(*) FROM deg)::BIGINT AS n_hosts,
               CASE WHEN m * sxx - sx * sx = 0 THEN 0.0
                    ELSE round((m * sxy - sx * sx)::DOUBLE
                               / (m * sxx - sx * sx), 6)
               END AS assortativity
        FROM s
    """


def host_mst_boruvka(sf_dir: str, n_base: int = 1000) -> pd.DataFrame:
    """MINIMUM SPANNING FOREST of the weighted host graph by BORUVKA's
    algorithm (1926; the distributed-MST workhorse — each round every
    component picks its lightest outgoing edge and components contract,
    so rounds are O(log n) and each round is one edge scan): weight =
    link multiplicity (parallel directed links between the host pair),
    minimized with the (w, a, b) lexicographic tie order, which makes
    every weight distinct and the forest UNIQUE — the property the
    oracle leans on (cycle rule: an edge is in the MSF iff its endpoints
    are NOT connected by strictly lighter edges).

    Engine shape: the edge multiset reduces once to (a, b, w); each
    round is one map_batches over the edge Dataset with the component
    labels broadcast (label state is NODE-bounded — for a page-scale
    graph swap in neardup_clusters' pointer-jumping label Dataset), a
    per-component min-candidate partial, and a component contraction
    over at most #components chosen edges (halving per round).

    Output: the forest edges + replicated total weight / component
    count — the certificate a spanning-structure consumer checks."""
    from .common import _cached_get, partial_groupby, sql_round

    files = sorted(str(p) for p in
                   Path(generate_host_edges(n_base)).glob("part-*.parquet"))
    raw = rd.read_parquet(files)

    def norm(df: pd.DataFrame) -> pd.DataFrame:
        s = df["src_host"].to_numpy(np.int64)
        d_ = df["dst_host"].to_numpy(np.int64)
        keep = s != d_
        return pd.DataFrame({"a": np.minimum(s, d_)[keep],
                             "b": np.maximum(s, d_)[keep]})

    ew = partial_groupby(raw, ["a", "b"], {"w": ("a", "count")},
                         prep=norm, many_groups=True).materialize()

    edf = ew.to_pandas()     # one driver conversion for the node set
    nodes = sorted(set(edf["a"]).union(set(edf["b"])))
    del edf
    label = {int(v): int(v) for v in nodes}
    chosen: list[tuple[int, int, int]] = []

    while True:
        ref = ray.put(dict(label))

        def cand(df: pd.DataFrame) -> pd.DataFrame:
            lab = _cached_get(ref)
            a = df["a"].to_numpy(np.int64)
            b = df["b"].to_numpy(np.int64)
            w = df["w"].to_numpy(np.int64)
            ca = np.array([lab[int(x)] for x in a], dtype=np.int64)
            cb = np.array([lab[int(x)] for x in b], dtype=np.int64)
            m = ca != cb
            if not m.any():
                return pd.DataFrame({"comp": pd.Series([], dtype=np.int64),
                                     "w": pd.Series([], dtype=np.int64),
                                     "a": pd.Series([], dtype=np.int64),
                                     "b": pd.Series([], dtype=np.int64)})
            d = pd.DataFrame({
                "comp": np.concatenate([ca[m], cb[m]]),
                "w": np.concatenate([w[m], w[m]]),
                "a": np.concatenate([a[m], a[m]]),
                "b": np.concatenate([b[m], b[m]])})
            # per-component lightest candidate within the batch
            d = d.sort_values(["comp", "w", "a", "b"])
            return d.groupby("comp", sort=False).head(1)

        cands = ew.map_batches(cand, batch_format="pandas").to_pandas()
        if not len(cands):
            break
        cands = (cands.sort_values(["comp", "w", "a", "b"])
                 .groupby("comp", sort=False).head(1))
        # contract: union-find over the (<= #components) chosen edges
        picked = {(int(r.w), int(r.a), int(r.b)) for r in
                  cands.itertuples(index=False)}
        added = False
        for w_, a_, b_ in sorted(picked):
            ra, rb = label[a_], label[b_]
            while ra != label[ra]:
                ra = label[ra]
            while rb != label[rb]:
                rb = label[rb]
            if ra != rb:
                label[max(ra, rb)] = min(ra, rb)
                chosen.append((a_, b_, w_))
                added = True
        # path-compress so the broadcast map is one hop
        for v in label:
            r = v
            while r != label[r]:
                r = label[r]
            label[v] = r
        if not added:
            break

    out = (pd.DataFrame(chosen, columns=["a", "b", "w"])
           .sort_values(["a", "b"]).reset_index(drop=True))
    n_comp = len({label[v] for v in label})
    return pd.DataFrame({
        "a": out["a"].astype(np.int64), "b": out["b"].astype(np.int64),
        "w": out["w"].astype(np.int64),
        "total_w": np.full(len(out), np.int64(out["w"].sum())),
        "n_components": np.full(len(out), np.int64(n_comp))})


def host_mst_boruvka_sql(n_base: int = 1000) -> str:
    """Oracle via the CYCLE PROPERTY (valid because the (w, a, b) lex
    order makes weights distinct): an edge is in the unique MSF iff its
    endpoints are not connected using strictly lighter edges — one
    recursive closure over (edge, reachable-node) states."""
    glob = generate_host_edges(n_base) + "/part-*.parquet"
    return f"""
        WITH e AS (
            SELECT least(src_host, dst_host) AS a,
                   greatest(src_host, dst_host) AS b,
                   count(*)::BIGINT AS w
            FROM read_parquet('{glob}') WHERE src_host <> dst_host
            GROUP BY 1, 2
        ),
        mst AS (
            WITH RECURSIVE r(ea, eb, ew, n) AS (
                SELECT a, b, w, a FROM e
                UNION
                SELECT r.ea, r.eb, r.ew,
                       CASE WHEN l.a = r.n THEN l.b ELSE l.a END
                FROM r JOIN e l ON (l.a = r.n OR l.b = r.n)
                WHERE (l.w, l.a, l.b) < (r.ew, r.ea, r.eb)
            )
            SELECT e.a, e.b, e.w FROM e
            WHERE NOT EXISTS (SELECT 1 FROM r
                              WHERE r.ea = e.a AND r.eb = e.b
                                AND r.ew = e.w AND r.n = e.b)
        ),
        nn AS (SELECT count(DISTINCT v)::BIGINT AS n FROM (
                   SELECT a AS v FROM e UNION SELECT b FROM e))
        SELECT a::BIGINT AS a, b::BIGINT AS b, w,
               (SELECT sum(w) FROM mst)::BIGINT AS total_w,
               ((SELECT n FROM nn)
                - (SELECT count(*) FROM mst))::BIGINT AS n_components
        FROM mst
    """


RW_WALKS = 20
RW_STEPS = 8


def host_random_walks(sf_dir: str, n_base: int = 1000,
                      n_walks: int = RW_WALKS,
                      n_steps: int = RW_STEPS) -> pd.DataFrame:
    """DETERMINISTIC RANDOM WALKS over the undirected host graph — the
    sampling primitive under node2vec/DeepWalk embeddings and graph
    sketching, made replayable the engine's standard way: at step t,
    walk w at node v moves to the neighbor u minimizing
    md5(f"{t}|{w}|{u}") (hash-rank choice — uniformly pseudo-random yet
    a pure function, so the oracle replays every trajectory exactly).
    Isolated positions absorb (the walk stays put).  Output is the full
    (walk_id, step, node) trajectory table.

    Scale shape: one step = one map_batches over the edge Dataset with
    the walker positions broadcast (walker state is n_walks rows — tiny
    by construction) and a per-walk min-hash reduce; n_steps streamed
    passes total, no shuffle."""
    from .common import _cached_get, partial_groupby

    edges = _undirected_simple_edges(n_base).materialize()
    edf = edges.to_pandas()  # one driver conversion for the node set
    nodes = sorted(set(edf["a"]).union(set(edf["b"])))
    del edf
    seeds = nodes[:n_walks]
    cur = {w: int(seeds[w % len(seeds)]) for w in range(len(seeds))}
    rows = [(w, 0, v) for w, v in cur.items()]

    for t in range(1, n_steps + 1):
        ref = ray.put((dict(cur), t))

        def step(df: pd.DataFrame) -> pd.DataFrame:
            import hashlib

            cur_, tt = _cached_get(ref)
            a = df["a"].to_numpy(np.int64)
            b = df["b"].to_numpy(np.int64)
            outs = {"walk": [], "h": [], "u": []}
            for w, v in cur_.items():
                m1 = a == v
                m2 = b == v
                for u in np.concatenate([b[m1], a[m2]]):
                    outs["walk"].append(w)
                    outs["h"].append(hashlib.md5(
                        f"{tt}|{w}|{int(u)}".encode()).hexdigest())
                    outs["u"].append(int(u))
            d = pd.DataFrame({
                "walk": pd.Series(outs["walk"], dtype=np.int64),
                "h": pd.Series(outs["h"], dtype=object),
                "u": pd.Series(outs["u"], dtype=np.int64)})
            # per-batch argmin partial: one candidate row per walk
            return (d.sort_values(["walk", "h", "u"])
                    .groupby("walk", sort=False).head(1))

        full = (edges.map_batches(step, batch_format="pandas")
                .to_pandas().sort_values(["walk", "h", "u"])
                .groupby("walk", sort=False).head(1))
        pick = {int(r.walk): int(r.u) for r in full.itertuples(index=False)}
        for w in cur:
            cur[w] = pick.get(w, cur[w])     # absorb if isolated
            rows.append((w, t, cur[w]))

    return (pd.DataFrame(rows, columns=["walk_id", "step", "node"])
            .astype(np.int64).sort_values(["walk_id", "step"])
            .reset_index(drop=True))


def host_random_walks_sql(n_base: int = 1000, n_walks: int = RW_WALKS,
                          n_steps: int = RW_STEPS) -> str:
    """Oracle: the walk loop unrolled — per step one argmin-by-md5
    window over the walker-adjacent edges, coalescing to the previous
    position when isolated."""
    glob = generate_host_edges(n_base) + "/part-*.parquet"
    parts = [f"""
        WITH e AS MATERIALIZED (
            SELECT DISTINCT least(src_host, dst_host) AS a,
                   greatest(src_host, dst_host) AS b
            FROM read_parquet('{glob}') WHERE src_host <> dst_host
        ),
        nodes AS MATERIALIZED (
            SELECT v, row_number() OVER (ORDER BY v) - 1 AS rk FROM (
                SELECT a AS v FROM e UNION SELECT b FROM e)
        ),
        seeds AS MATERIALIZED (
            SELECT w.range AS walk, n.v AS node
            FROM range(0, {n_walks}) w
            JOIN nodes n ON n.rk = w.range
            WHERE w.range < (SELECT count(*) FROM nodes)
        ),
        c0 AS MATERIALIZED (SELECT walk, node FROM seeds)"""]
    for t in range(1, n_steps + 1):
        parts.append(f""",
        adj{t} AS MATERIALIZED (
            SELECT c.walk,
                   CASE WHEN e.a = c.node THEN e.b ELSE e.a END AS u
            FROM c{t - 1} c JOIN e ON e.a = c.node OR e.b = c.node
        ),
        pick{t} AS MATERIALIZED (
            SELECT walk, u FROM (
                SELECT walk, u, row_number() OVER (PARTITION BY walk
                    ORDER BY md5(CAST({t} AS VARCHAR) || '|'
                                 || CAST(walk AS VARCHAR) || '|'
                                 || CAST(u AS VARCHAR)), u) AS rn
                FROM adj{t}) WHERE rn = 1
        ),
        c{t} AS MATERIALIZED (
            SELECT c.walk, coalesce(p.u, c.node) AS node
            FROM c{t - 1} c LEFT JOIN pick{t} p USING (walk)
        )""")
    sel = " UNION ALL ".join(
        f"SELECT walk, {t}::BIGINT AS step, node FROM c{t}"
        for t in range(0, n_steps + 1))
    parts.append(f"""
        SELECT CAST(walk AS BIGINT) AS walk_id, step,
               CAST(node AS BIGINT) AS node
        FROM ({sel}) ORDER BY walk_id, step""")
    return "".join(parts)


ATTACK_K = 5   # hubs removed in the targeted-attack scenario


def host_attack_robustness(sf_dir: str, n_base: int = 1000,
                           k: int = ATTACK_K) -> pd.DataFrame:
    """TARGETED-ATTACK ROBUSTNESS (percolation under hub removal,
    Albert/Jeong/Barabasi 2000): connected-component structure of the
    host graph BEFORE and AFTER deleting the ``k`` highest-degree hosts
    (ties to the smaller id) — the fragmentation number that says
    whether a crawl's connectivity (and a scale-free graph's routing)
    hangs on a few hubs.  One row per scenario with node/edge/component
    counts, the giant component's size and its share.

    Scale shape: degrees fold from one endpoint exchange; the hub set
    is k ids broadcast into the edge filter; components come from the
    SAME pointer-jumping CC machinery as page_components; only the
    per-component size table (component-bounded) reaches the driver."""
    import pyarrow as _pa

    from .common import partial_groupby, sql_round
    from .dedup import connected_components_ds

    und = _undirected_simple_edges(n_base).materialize()
    deg = _host_degrees(und)
    hubs = set(deg.sort_values(["deg", "v"], ascending=[False, True])
               .head(k)["v"].astype(int))

    rows = []
    for scenario, drop in (("full", set()), ("attacked", hubs)):
        def keep(df: pd.DataFrame, drop=drop) -> pd.DataFrame:
            m = (~df["a"].isin(drop)) & (~df["b"].isin(drop))
            return df[m]

        ew = und.map_batches(keep, batch_format="pandas").materialize()

        def as_edges(df: pd.DataFrame) -> pd.DataFrame:
            return pd.DataFrame({"src": df["a"].to_numpy(np.int64),
                                 "dst": df["b"].to_numpy(np.int64)})

        no_extra = rd.from_arrow(_pa.table({"doc_id":
                                            _pa.array([], _pa.int64())}))
        cc = connected_components_ds(
            no_extra, ew.map_batches(as_edges, batch_format="pandas")
        ).to_pandas()
        if "cluster_id" not in cc.columns:   # all edges removed: the
            cc = pd.DataFrame({"doc_id": [], "cluster_id": []})  # empty
        sizes = cc.groupby("cluster_id").size()                  # Dataset
        n_nodes = int(len(cc))               # drops its schema (gotcha)
        n_edges = int(ew.count())
        giant = int(sizes.max()) if len(sizes) else 0
        rows.append((scenario, n_nodes, n_edges,
                     int(len(sizes)), giant,
                     float(sql_round(giant / n_nodes, 4))
                     if n_nodes else 0.0))
    return pd.DataFrame(rows, columns=[
        "scenario", "n_nodes", "n_edges", "n_components", "giant_size",
        "giant_share"]).astype({
            "n_nodes": np.int64, "n_edges": np.int64,
            "n_components": np.int64, "giant_size": np.int64})


def host_attack_robustness_sql(n_base: int = 1000,
                               k: int = ATTACK_K) -> str:
    glob = generate_host_edges(n_base) + "/part-*.parquet"
    def closure(tag: str, extra: str) -> str:
        return f"""
        e{tag} AS (
            SELECT a, b FROM base {extra}
        ),
        ed{tag} AS (
            SELECT a AS src, b AS dst FROM e{tag}
            UNION ALL SELECT b, a FROM e{tag}
        ),
        n{tag} AS (SELECT DISTINCT src AS v FROM ed{tag}),
        reach{tag} AS (
            SELECT v, v AS r FROM n{tag}
            UNION
            SELECT e.dst AS v, reach{tag}.r
            FROM reach{tag} JOIN ed{tag} e ON e.src = reach{tag}.v
        ),
        comp{tag} AS (
            SELECT v, min(r) AS c FROM reach{tag} GROUP BY v
        ),
        sz{tag} AS (SELECT c, count(*)::BIGINT AS n FROM comp{tag}
                    GROUP BY c),
        sum{tag} AS (
            SELECT (SELECT count(*) FROM comp{tag})::BIGINT AS n_nodes,
                   (SELECT count(*) FROM e{tag})::BIGINT AS n_edges,
                   (SELECT count(*) FROM sz{tag})::BIGINT AS n_components,
                   (SELECT coalesce(max(n), 0) FROM sz{tag})::BIGINT
                       AS giant_size
        )"""
    return f"""
        WITH RECURSIVE base AS (
            SELECT DISTINCT least(src_host, dst_host) AS a,
                   greatest(src_host, dst_host) AS b
            FROM read_parquet('{glob}') WHERE src_host <> dst_host
        ),
        deg AS (
            SELECT v, count(*)::BIGINT AS d FROM (
                SELECT a AS v FROM base UNION ALL SELECT b FROM base)
            GROUP BY 1
        ),
        hubs AS (SELECT v FROM deg ORDER BY d DESC, v LIMIT {k}),
        {closure("f", "")},
        {closure("x", "WHERE a NOT IN (SELECT v FROM hubs) "
                      "AND b NOT IN (SELECT v FROM hubs)")}
        SELECT 'full' AS scenario, n_nodes, n_edges, n_components,
               giant_size,
               CASE WHEN n_nodes = 0 THEN 0.0
                    ELSE round(giant_size::DOUBLE / n_nodes, 4) END
                   AS giant_share
        FROM sumf
        UNION ALL
        SELECT 'attacked', n_nodes, n_edges, n_components, giant_size,
               CASE WHEN n_nodes = 0 THEN 0.0
                    ELSE round(giant_size::DOUBLE / n_nodes, 4) END
        FROM sumx
    """


RC_THRESHOLDS = (1, 2, 4, 8, 16)


def host_rich_club(sf_dir: str, n_base: int = 1000) -> pd.DataFrame:
    """RICH-CLUB COEFFICIENT (Zhou & Mondragon 2004): for each degree
    threshold k, the edge density among hosts of degree > k — phi(k) =
    2*E_k / (N_k*(N_k-1)) — rising phi(k) means the hubs form a tight
    core (they link each OTHER, not just many leaves), the structural
    complement of assortativity's correlation.  One row per threshold
    with N_k, E_k and phi; all counts integers, one rounded division.

    Scale shape: one shared degree reduce (_host_degrees), then a
    single edge pass counts, for EVERY threshold at once, the edges
    whose both-endpoint minimum degree clears it (mergeable count
    partials) — thresholds never rescan."""
    from .common import _cached_get, partial_groupby, sql_round

    edges = _undirected_simple_edges(n_base).materialize()
    deg = _host_degrees(edges)
    dmap = dict(zip(deg["v"].astype(int), deg["deg"].astype(int)))
    ref = ray.put(dmap)

    def counts(b: pd.DataFrame) -> pd.DataFrame:
        dm = _cached_get(ref)
        da = b["a"].map(dm).to_numpy(np.int64)
        db = b["b"].map(dm).to_numpy(np.int64)
        lo = np.minimum(da, db)
        return pd.DataFrame({
            "k": np.asarray(RC_THRESHOLDS, np.int64),
            "e_k": np.asarray([(lo > k).sum() for k in RC_THRESHOLDS],
                              np.int64)})

    ek = (edges.map_batches(counts, batch_format="pandas")
          .to_pandas().groupby("k")["e_k"].sum())
    dv = deg["deg"].to_numpy(np.int64)
    rows = []
    for k in RC_THRESHOLDS:
        nk = int((dv > k).sum())
        e = int(ek.get(k, 0))
        phi = (float(sql_round(2.0 * e / (nk * (nk - 1)), 6))
               if nk > 1 else 0.0)
        rows.append((k, nk, e, phi))
    return pd.DataFrame(rows, columns=["k", "n_k", "e_k", "phi"]).astype(
        {"k": np.int64, "n_k": np.int64, "e_k": np.int64})


def host_rich_club_sql(n_base: int = 1000) -> str:
    glob = generate_host_edges(n_base) + "/part-*.parquet"
    ks = ", ".join(f"({k})" for k in RC_THRESHOLDS)
    return f"""
        WITH e AS (
            SELECT DISTINCT least(src_host, dst_host) AS a,
                   greatest(src_host, dst_host) AS b
            FROM read_parquet('{glob}') WHERE src_host <> dst_host
        ),
        deg AS (
            SELECT v, count(*)::BIGINT AS d FROM (
                SELECT a AS v FROM e UNION ALL SELECT b FROM e)
            GROUP BY 1
        ),
        ks AS (SELECT * FROM (VALUES {ks}) t(k)),
        nk AS (
            SELECT ks.k, count(deg.v)::BIGINT AS n_k
            FROM ks LEFT JOIN deg ON deg.d > ks.k GROUP BY ks.k
        ),
        ekt AS (
            SELECT ks.k, count(t.lo)::BIGINT AS e_k
            FROM ks LEFT JOIN (
                SELECT least(da.d, db.d) AS lo
                FROM e JOIN deg da ON da.v = e.a
                       JOIN deg db ON db.v = e.b) t ON t.lo > ks.k
            GROUP BY ks.k
        )
        SELECT ks.k::BIGINT AS k, nk.n_k, ekt.e_k,
               CASE WHEN nk.n_k > 1
                    THEN round(2.0 * ekt.e_k / (nk.n_k * (nk.n_k - 1)), 6)
                    ELSE 0.0 END AS phi
        FROM ks JOIN nk USING (k) JOIN ekt USING (k)
    """


FIEDLER_ITERS = 200


def host_spectral_bisection(sf_dir: str, n_base: int = 1000,
                            n_iters: int = FIEDLER_ITERS) -> pd.DataFrame:
    """SPECTRAL BISECTION of the weighted host graph (Fiedler 1973):
    the sign/median split of the Laplacian's second eigenvector — the
    classic partitioner-quality baseline for placement ("which hosts
    belong on which half of the cluster so crawl traffic crosses the
    cut least").  The eigensolve is a FIXED-count power iteration on
    M = c*I - L (c = 2*max_degree keeps M PSD) with the constant
    vector deflated by re-centering every step — exactly the
    embedding_top_eigvec recipe on an INTEGER matrix (edge weights are
    link counts, so both engines iterate the identical L with no
    quantization step at all).  The partition is the top-half/bottom-
    half split of the (rounded component, host) order — rank-based, so
    near-zero components can't flip sides on FP noise — and the CUT
    WEIGHT (integer) plus side sizes ride along as the certificate.

    Scale shape: the edge-weight reduce is the only data pass; the
    iteration folds on the node-bounded dense Laplacian driver-side
    (the top-eigvec budget)."""
    from .common import partial_groupby, sql_round

    files = sorted(str(p) for p in
                   Path(generate_host_edges(n_base)).glob("part-*.parquet"))
    raw = rd.read_parquet(files)

    def norm(df: pd.DataFrame) -> pd.DataFrame:
        s = df["src_host"].to_numpy(np.int64)
        d_ = df["dst_host"].to_numpy(np.int64)
        keep = s != d_
        return pd.DataFrame({"a": np.minimum(s, d_)[keep],
                             "b": np.maximum(s, d_)[keep]})

    ew = partial_groupby(raw, ["a", "b"], {"w": ("a", "count")},
                         prep=norm, many_groups=True).to_pandas()
    nodes = sorted(set(ew["a"].astype(int)) | set(ew["b"].astype(int)))
    n = len(nodes)
    idx = {v: i for i, v in enumerate(nodes)}
    A = np.zeros((n, n))
    for r in ew.itertuples(index=False):
        i, j = idx[int(r.a)], idx[int(r.b)]
        A[i, j] += r.w
        A[j, i] += r.w
    deg = A.sum(axis=1)
    c = 2.0 * deg.max()
    # v0: centered ramp over the host-id order, normalized
    v = np.arange(n, dtype=np.float64)
    v = v - v.sum() / n
    v = v / np.sqrt((v * v).sum())
    for _ in range(n_iters):
        w = c * v - (deg * v - A @ v)     # (cI - L) v
        w = w - w.sum() / n               # deflate the constant vector
        v = w / np.sqrt((w * w).sum())
    comp = np.asarray(sql_round(v, 6))
    order = np.lexsort((np.asarray(nodes), -comp))
    side = np.zeros(n, dtype=np.int64)
    side[order[: n // 2]] = 1             # top half of the rank order
    cut = 0
    for r in ew.itertuples(index=False):
        if side[idx[int(r.a)]] != side[idx[int(r.b)]]:
            cut += int(r.w)
    return pd.DataFrame({
        "host": np.asarray(nodes, np.int64),
        "fiedler": comp,
        "side": side,
        "cut_weight": np.full(n, np.int64(cut)),
        "n_side1": np.full(n, np.int64(n // 2)),
        "n_side0": np.full(n, np.int64(n - n // 2))})


def host_spectral_bisection_sql(n_base: int = 1000,
                                n_iters: int = FIEDLER_ITERS) -> str:
    """Oracle: long-form integer Laplacian, the deflated power
    iteration unrolled, the identical rank-median split and integer
    cut fold."""
    glob = generate_host_edges(n_base) + "/part-*.parquet"
    parts = [f"""
        WITH e AS MATERIALIZED (
            SELECT least(src_host, dst_host) AS a,
                   greatest(src_host, dst_host) AS b,
                   count(*)::BIGINT AS w
            FROM read_parquet('{glob}') WHERE src_host <> dst_host
            GROUP BY 1, 2
        ),
        adj AS MATERIALIZED (
            SELECT a AS i, b AS j, w::DOUBLE AS w FROM e
            UNION ALL SELECT b, a, w::DOUBLE FROM e
        ),
        nodes AS MATERIALIZED (
            SELECT v, row_number() OVER (ORDER BY v) - 1 AS rk,
                   (SELECT count(DISTINCT i) FROM adj) AS n
            FROM (SELECT DISTINCT i AS v FROM adj)
        ),
        deg AS MATERIALIZED (SELECT i AS v, sum(w) AS d FROM adj
                             GROUP BY i),
        cc AS (SELECT 2.0 * max(d) AS c FROM deg),
        vinit AS MATERIALIZED (
            SELECT v, rk - (SELECT sum(rk) FROM nodes)
                           / (SELECT n FROM nodes LIMIT 1) AS x
            FROM nodes
        ),
        v0 AS MATERIALIZED (
            SELECT v, x / (SELECT sqrt(sum(x * x)) FROM vinit) AS x
            FROM vinit
        )"""]
    for t in range(1, n_iters + 1):
        parts.append(f""",
        mv{t} AS MATERIALIZED (
            SELECT d.v,
                   (SELECT c FROM cc) * p.x
                   - (d.d * p.x - coalesce((
                        SELECT sum(adj.w * q.x)
                        FROM adj JOIN v{t - 1} q ON q.v = adj.j
                        WHERE adj.i = d.v), 0.0)) AS x
            FROM deg d JOIN v{t - 1} p ON p.v = d.v
        ),
        ce{t} AS MATERIALIZED (
            SELECT v, x - (SELECT sum(x) FROM mv{t})
                          / (SELECT n FROM nodes LIMIT 1) AS x
            FROM mv{t}
        ),
        v{t} AS MATERIALIZED (
            SELECT v, x / (SELECT sqrt(sum(x * x)) FROM ce{t}) AS x
            FROM ce{t}
        )""")
    T = n_iters
    parts.append(f""",
        comp AS MATERIALIZED (
            SELECT v AS host, round(x, 6) AS fiedler FROM v{T}
        ),
        ranked AS MATERIALIZED (
            SELECT host, fiedler,
                   row_number() OVER (ORDER BY fiedler DESC, host) AS r,
                   (SELECT n FROM nodes LIMIT 1) AS n
            FROM comp
        ),
        sided AS MATERIALIZED (
            SELECT host, fiedler,
                   CASE WHEN r <= n // 2 THEN 1 ELSE 0 END::BIGINT
                       AS side, n
            FROM ranked
        ),
        cut AS (
            SELECT coalesce(sum(e.w), 0)::BIGINT AS cw
            FROM e JOIN sided sa ON sa.host = e.a
                   JOIN sided sb ON sb.host = e.b
            WHERE sa.side <> sb.side
        )
        SELECT host::BIGINT AS host, fiedler, side,
               (SELECT cw FROM cut) AS cut_weight,
               CAST(n // 2 AS BIGINT) AS n_side1,
               CAST(n - n // 2 AS BIGINT) AS n_side0
        FROM sided""")
    return "".join(parts)
