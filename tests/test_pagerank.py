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
