"""host_pagerank: distributed engine vs an INDEPENDENT dense numpy power
iteration over the same edge fixture (the oracle battery separately checks
the unrolled-CTE DuckDB replay)."""

import numpy as np
import pandas as pd
import pyarrow.parquet as pq

SF = "/root/testdata/sf0.001"


def _dense_pagerank(edges: pd.DataFrame, n_iters=5, d=0.85) -> pd.DataFrame:
    ew = (edges.groupby(["src_host", "dst_host"]).size()
          .rename("w").reset_index())
    nodes = np.union1d(ew["src_host"].unique(), ew["dst_host"].unique())
    idx = {h: i for i, h in enumerate(nodes)}
    n = len(nodes)
    W = np.zeros((n, n))
    for s, t, w in ew.itertuples(index=False):
        W[idx[s], idx[t]] = w
    out = W.sum(axis=1)
    P = np.divide(W, out[:, None], out=np.zeros_like(W), where=out[:, None] > 0)
    r = np.full(n, 1.0 / n)
    for _ in range(n_iters):
        dang = r[out == 0].sum()
        r = (1 - d) / n + d * (P.T @ r + dang / n)
    return pd.DataFrame({"host": nodes, "pr_ref": r})


def test_host_pagerank_matches_dense_reference(ray_session):
    from weaver_ray.pipelines.pagerank import generate_host_edges, host_pagerank

    eng = host_pagerank(SF).sort_values("host").reset_index(drop=True)
    edges = pq.read_table(
        generate_host_edges(1000) + "/part-00000.parquet").to_pandas()
    ref = _dense_pagerank(edges).sort_values("host").reset_index(drop=True)
    assert eng["host"].tolist() == ref["host"].tolist()
    np.testing.assert_allclose(eng["pr"], ref["pr_ref"], atol=5e-7)  # 6dp round
    # PageRank invariants: a probability distribution, every node positive
    assert abs(eng["pr"].sum() - 1.0) < 1e-3
    assert (eng["pr"] > 0).all()


def test_host_edges_fixture_deterministic(ray_session):
    from weaver_ray.pipelines.pagerank import generate_host_edges

    a = pq.read_table(generate_host_edges(1000) + "/part-00000.parquet")
    b = pq.read_table(generate_host_edges(1000) + "/part-00000.parquet")
    assert a.equals(b)
    # live-link fraction ~99% of 1000 pages x (6 root / 3 product) fanout
    n_root = len([i for i in range(1000) if i % 13 == 0])
    expect_links = n_root * 6 + (1000 - n_root) * 3
    assert expect_links * 0.95 <= a.num_rows <= expect_links


def test_host_triangles_matches_bruteforce(ray_session):
    from weaver_ray.pipelines.common import to_table
    from weaver_ray.pipelines.pagerank import (generate_host_edges,
                                               host_triangles)

    edges = pq.read_table(
        generate_host_edges(1000) + "/part-00000.parquet").to_pandas()
    s = edges["src_host"].to_numpy()
    t = edges["dst_host"].to_numpy()
    und = {(min(a, b), max(a, b)) for a, b in zip(s, t) if a != b}
    adj = {}
    for a, b in und:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    ref = {}
    for a, b in und:
        for c in adj[a] & adj[b]:   # each triangle found via all 3 edges
            for h in (a, b, c):
                ref[h] = ref.get(h, 0) + 1
    ref = {h: n // 3 for h, n in ref.items()}  # ... so counts triple

    eng = to_table(host_triangles("unused")).to_pandas()
    got = dict(zip(eng["host"], eng["n_triangles"]))
    assert got == ref and sum(ref.values()) > 0


def test_page_bfs_depth_matches_sequential_bfs(ray_session):
    from collections import deque

    from weaver_ray import config
    from weaver_ray.pipelines.pagerank import (generate_page_edges,
                                               page_bfs_depth)

    edges = pq.read_table(
        generate_page_edges(1000) + "/part-00000.parquet").to_pandas()
    adj = edges.groupby("src_id")["dst_id"].agg(set).to_dict()
    # the crawl's real seed pages: the first N_SEEDS ROOT rows (i*ROOT_EVERY)
    depth = {i * config.ROOT_EVERY: 0 for i in range(config.N_SEEDS)}
    q = deque(depth)
    while q:
        u = q.popleft()
        for v in adj.get(u, ()):
            if v not in depth:
                depth[v] = depth[u] + 1
                q.append(v)

    eng = page_bfs_depth("unused")
    got = dict(zip(eng["page_id"], eng["depth"]))
    assert got == depth
    # non-degenerate: the crawl graph has real multi-round depth
    assert max(depth.values()) >= 3


def test_host_shortest_paths_golden_and_converged(ray_session):
    """Engine == an independent sequential Dijkstra over the same edges
    and weights; and the fixed 10-round count genuinely covers the
    diameter (round 11 changes nothing)."""
    import heapq

    import duckdb

    from weaver_ray.pipelines.pagerank import (_SSSP_INF,
                                               generate_host_edges,
                                               host_shortest_paths)

    out = host_shortest_paths("unused")
    got = dict(zip(out["host"], out["dist"]))

    glob = generate_host_edges(1000) + "/part-*.parquet"
    e = duckdb.sql("SELECT DISTINCT src_host, dst_host FROM "
                   f"read_parquet('{glob}')").df()
    src = e["src_host"].to_numpy(np.int64)
    dst = e["dst_host"].to_numpy(np.int64)
    w = 1 + (src + 2 * dst) % 7
    adj: dict = {}
    for s, d, ww in zip(src, dst, w):
        adj.setdefault(int(s), []).append((int(d), int(ww)))
    source = int(min(src.min(), dst.min()))
    dist = {source: 0}
    pq_ = [(0, source)]
    while pq_:
        du, u = heapq.heappop(pq_)
        if du > dist.get(u, _SSSP_INF):
            continue
        for v, ww in adj.get(u, []):
            nd = du + ww
            if nd < dist.get(v, _SSSP_INF):
                dist[v] = nd
                heapq.heappush(pq_, (nd, v))
    assert got == dist
    # convergence: one more round is a no-op
    more = host_shortest_paths("unused", n_rounds=11)
    assert dict(zip(more["host"], more["dist"])) == got


def test_host_kcore_matches_sequential_peeling(ray_session):
    """Coreness from the distributed h-index fixed point vs an
    INDEPENDENT sequential min-degree peeling (the textbook algorithm
    the h-index iteration provably converges to)."""
    from pathlib import Path

    from weaver_ray.pipelines.pagerank import generate_host_edges, host_kcore

    eng = host_kcore(SF).set_index("host")["coreness"]

    files = sorted(Path(generate_host_edges(1000)).glob("part-*.parquet"))
    e = pd.concat([pq.read_table(f).to_pandas() for f in files])
    e = e[e["src_host"] != e["dst_host"]]
    adj: dict[int, set] = {}
    for s, t in zip(e["src_host"], e["dst_host"]):
        adj.setdefault(int(s), set()).add(int(t))
        adj.setdefault(int(t), set()).add(int(s))
    deg = {v: len(ns) for v, ns in adj.items()}
    core, k = {}, 0
    live = set(adj)
    while live:
        v = min(live, key=lambda x: (deg[x], x))
        k = max(k, deg[v])
        core[v] = k
        live.discard(v)
        for u in adj[v]:
            if u in live:
                deg[u] -= 1
    assert dict(eng) == core
    # non-degenerate: the fixture graph has at least two coreness levels
    assert eng.nunique() >= 2


def test_page_communities_matches_sequential_lpa(ray_session):
    """Engine LPA == an independent sequential synchronous label
    propagation over the same fixture graph (4 rounds, neighbor
    majority, (count desc, label asc) tie), and the partition is
    non-degenerate (more than one community)."""
    from collections import Counter, defaultdict

    import pyarrow.parquet as pq

    from weaver_ray.pipelines.pagerank import (LPA_ROUNDS,
                                               generate_page_edges,
                                               page_communities)

    e = pq.read_table(
        generate_page_edges(1000) + "/part-00000.parquet").to_pandas()
    adj = defaultdict(set)
    for s, d in zip(e["src_id"], e["dst_id"]):
        if s != d:
            adj[int(s)].add(int(d))
            adj[int(d)].add(int(s))
    lab = {v: v for v in adj}
    for _ in range(LPA_ROUNDS):
        nxt = {}
        for v, nbrs in adj.items():
            c = Counter(lab[u] for u in nbrs)
            best = max(c.items(), key=lambda kv: (kv[1], -kv[0]))
            nxt[v] = best[0]
        lab = nxt

    out = page_communities("/root/testdata/sf0.001").set_index("page_id")
    assert len(out) == len(adj)
    for v, l in lab.items():
        assert out.loc[v, "community"] == l
    assert out["community"].nunique() > 1


def test_host_hits_matches_dense_reference(ray_session):
    """Engine HITS == an independent dense numpy power iteration with
    the same normalization schedule, and the scores are meaningful
    (positive mass, non-uniform ranking)."""
    import numpy as np
    import pyarrow.parquet as pq

    from weaver_ray.pipelines.pagerank import (HITS_ITERS,
                                               generate_host_edges,
                                               host_hits)

    e = pq.read_table(
        generate_host_edges(1000) + "/part-00000.parquet").to_pandas()
    w = (e.groupby(["src_host", "dst_host"]).size().reset_index(name="w"))
    nodes = np.union1d(w["src_host"].unique(), w["dst_host"].unique())
    H = int(nodes.max()) + 1
    W = np.zeros((H, H))
    W[w["src_host"], w["dst_host"]] = w["w"]
    h = np.zeros(H)
    h[nodes] = 1.0 / len(nodes)
    for _ in range(HITS_ITERS):
        a = W.T @ h
        a /= a.sum()
        h = W @ a
        h /= h.sum()

    out = host_hits("/root/testdata/sf0.001").set_index("host")
    assert len(out) == len(nodes)
    for v in nodes:
        assert abs(out.loc[v, "authority"] - a[v]) < 1e-6
        assert abs(out.loc[v, "hub"] - h[v]) < 1e-6
    assert out["authority"].sum() > 0.99  # L1-normalized mass
    assert out["hub"].nunique() > 10      # a real ranking, not uniform


def test_page_components_matches_union_find(ray_session):
    """Engine WCC == a sequential union-find over the same fixture
    edges."""
    import numpy as np
    import pyarrow.parquet as pq

    from weaver_ray.pipelines.pagerank import (generate_page_edges,
                                               page_components)

    e = pq.read_table(
        generate_page_edges(1000) + "/part-00000.parquet").to_pandas()
    parent = {}

    def find(x):
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for s, d in zip(e["src_id"], e["dst_id"]):
        if s == d:
            continue
        a, b = find(int(s)), find(int(d))
        if a != b:
            parent[max(a, b)] = min(a, b)
    # canonical representative = min node id per component
    comp = {}
    for v in parent:
        comp.setdefault(find(v), []).append(v)
    label = {v: min(vs) for r, vs in comp.items() for v in vs}

    out = page_components("/root/testdata/sf0.001").set_index("page_id")
    assert len(out) == len(label)
    for v, l in label.items():
        assert out.loc[v, "component_id"] == l


def test_host_clustering_matches_bruteforce(ray_session):
    """Clustering coefficients == brute-force adjacency-set computation
    on the fixture host graph, with the degree>=2 exclusion and a
    non-trivial coefficient spread."""
    from collections import defaultdict

    import pyarrow.parquet as pq

    from weaver_ray.pipelines.pagerank import (generate_host_edges,
                                               host_clustering)
    from weaver_ray.pipelines.common import sql_round

    e = pq.read_table(
        generate_host_edges(1000) + "/part-00000.parquet").to_pandas()
    adj = defaultdict(set)
    for s, d in zip(e["src_host"], e["dst_host"]):
        if s != d:
            adj[int(s)].add(int(d))
            adj[int(d)].add(int(s))

    out = host_clustering("/root/testdata/sf0.001").set_index("host")
    expect = {v: n for v, n in adj.items() if len(n) >= 2}
    assert len(out) == len(expect)
    for v, nbrs in expect.items():
        tri = sum(len(adj[u] & nbrs) for u in nbrs) // 2
        d = len(nbrs)
        assert out.loc[v, "degree"] == d
        assert out.loc[v, "n_triangles"] == tri
        assert out.loc[v, "clustering"] == float(
            sql_round(2.0 * tri / (d * (d - 1.0)), 6))
    assert out["clustering"].nunique() > 5


def test_page_bfs_and_lpa_multipart_exchange_matches_single_part(ray_session):
    """Forcing slice_rows tiny makes the BFS/LPA task exchange run with
    k > 1 hash-partitioned depth/label slices at fixture scale — the
    100-TB code path — and the output must be IDENTICAL to the k == 1
    run (and therefore to the sequential replays above)."""
    from weaver_ray.pipelines.pagerank import (page_bfs_depth,
                                               page_communities)

    one = page_bfs_depth("unused")
    many = page_bfs_depth("unused", num_parts=5, slice_rows=256)
    pd.testing.assert_frame_equal(one, many)

    lpa1 = page_communities("unused")
    lpak = page_communities("unused", num_parts=5, slice_rows=256)
    pd.testing.assert_frame_equal(lpa1, lpak)


def _write_edges(tmp_path, name, src, dst):
    import pyarrow as pa
    import pyarrow.parquet as pq

    p = str(tmp_path / f"{name}.parquet")
    pq.write_table(pa.table({"src_id": pa.array(src, pa.int64()),
                             "dst_id": pa.array(dst, pa.int64())}), p)
    return [p]


def test_page_bfs_randomized_graphs_match_sequential(ray_session, tmp_path):
    """Randomized-graph equivalence for the distributed BFS (the block-2
    de-drivered rewrite): random directed graphs with self-loops,
    duplicate edges, sink-only nodes and off-graph isolated seeds, plus a
    deep-chain case (depth ~ rounds stress), all forced through the
    multi-part task exchange (slice_rows small) — engine == sequential
    deque BFS from the same seeds."""
    from collections import deque

    from weaver_ray.pipelines.pagerank import page_bfs_depth_ds

    rng = np.random.default_rng(4242)

    def seq_bfs(src, dst, seeds):
        adj = {}
        for s, d in zip(src, dst):
            adj.setdefault(int(s), set()).add(int(d))
        depth = {int(s): 0 for s in seeds}
        q = deque(sorted(depth))
        while q:
            u = q.popleft()
            for v in sorted(adj.get(u, ())):
                if v not in depth:
                    depth[v] = depth[u] + 1
                    q.append(v)
        return depth

    def run(files, seeds, **kw):
        out = (page_bfs_depth_ds("unused", edges_files=files,
                                 seed_ids=np.asarray(seeds, np.int64), **kw)
               .to_pandas())
        return dict(zip(out["page_id"].astype(np.int64),
                        out["depth"].astype(np.int64)))

    for trial in range(6):
        n_nodes = int(rng.integers(2, 60))
        n_edges = int(rng.integers(0, 250))
        src = rng.integers(0, n_nodes, n_edges)
        dst = rng.integers(0, n_nodes, n_edges)  # self-loops + dups occur
        seeds = rng.choice(n_nodes + 5, size=int(rng.integers(1, 5)),
                           replace=False)  # may lie OUTSIDE the edge set
        files = _write_edges(tmp_path, f"bfs{trial}", src, dst)
        want = seq_bfs(src, dst, seeds)
        got = run(files, seeds, slice_rows=16)  # forces k > 1
        assert got == want, (trial, n_nodes, n_edges, seeds.tolist())

    # deep chain: 0->1->...->40, one seed — one exchange round per depth
    chain = np.arange(40)
    files = _write_edges(tmp_path, "chain", chain, chain + 1)
    want = {i: i for i in range(41)}
    assert run(files, [0], slice_rows=8) == want
    # cap exactly at the diameter: completes (the cap-depth frontier
    # expands to nothing new)
    assert run(files, [0], slice_rows=8, max_depth=40) == want
    # cap BELOW the diameter: unexplored pages remain -> loud failure
    import pytest

    with pytest.raises(RuntimeError, match="max_depth"):
        run(files, [0], slice_rows=8, max_depth=39)


def test_page_lpa_randomized_graphs_match_sequential(ray_session, tmp_path):
    """Randomized-graph equivalence for the distributed synchronous LPA:
    random graphs (self-loops and duplicate/reverse edges in the raw
    list — the engine's distinct-undirected-simple-graph normalization
    must agree with the replay's), random round counts, multi-part
    exchange forced — engine == sequential synchronous label propagation
    with the (count desc, label asc) tiebreak."""
    from collections import Counter, defaultdict

    from weaver_ray.pipelines.pagerank import page_communities_ds

    rng = np.random.default_rng(9099)
    for trial in range(6):
        n_nodes = int(rng.integers(2, 50))
        n_edges = int(rng.integers(1, 220))
        src = rng.integers(0, n_nodes, n_edges)
        dst = rng.integers(0, n_nodes, n_edges)
        n_rounds = int(rng.integers(1, 5))
        files = _write_edges(tmp_path, f"lpa{trial}", src, dst)

        adj = defaultdict(set)
        for s, d in zip(src, dst):
            if s != d:
                adj[int(s)].add(int(d))
                adj[int(d)].add(int(s))
        lab = {v: v for v in adj}
        for _ in range(n_rounds):
            nxt = {}
            for v, nbrs in adj.items():
                c = Counter(lab[u] for u in nbrs)
                nxt[v] = max(c.items(), key=lambda kv: (kv[1], -kv[0]))[0]
            lab = nxt

        out = (page_communities_ds("unused", n_rounds=n_rounds,
                                   slice_rows=16, edges_files=files)
               .to_pandas())
        got = dict(zip(out["page_id"].astype(np.int64),
                       out["community"].astype(np.int64)))
        assert got == lab, (trial, n_nodes, n_edges, n_rounds)
