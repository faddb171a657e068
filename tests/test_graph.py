"""PageRank + degree stats: numpy replay parity (including the
DANGLING path the dyadic oracle compiles out), mass conservation,
damping-parameter sanity, degree edge cases."""

from __future__ import annotations

import numpy as np
import pytest

from oakstore_spark.operators.graph import degree_stats, pagerank


def _np_pagerank(edges, n, n_iter, d):
    out_deg = np.zeros(n)
    for s, _ in edges:
        out_deg[s] += 1
    pr = np.full(n, 1.0 / n)
    for _ in range(n_iter):
        nxt = np.full(n, (1.0 - d) / n)
        dangling = pr[out_deg == 0].sum()
        nxt += d * dangling / n
        for s, t in edges:
            nxt[t] += d * pr[s] / out_deg[s]
        pr = nxt
    return pr


def test_pagerank_dangling_matches_numpy_replay(spark):
    # star + chain + a dangling sink: 0->1,0->2,0->3, 1->4, 2->4, 4 sinks
    edges = [(0, 1), (0, 2), (0, 3), (1, 4), (2, 4), (3, 0)]
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {r.node: r.rank for r in pagerank(df, 12, 0.85).collect()}
    want = _np_pagerank(edges, 5, 12, 0.85)
    assert set(got) == set(range(5))
    for v in range(5):
        assert got[v] == pytest.approx(want[v], rel=1e-12), v
    # total mass conserved exactly-ish every config
    assert sum(got.values()) == pytest.approx(1.0, abs=1e-12)
    # the hub feeding everyone outranks the leaf it feeds through
    assert got[4] > got[1]


def test_pagerank_uniform_on_pure_cycle(spark):
    n = 8
    df = spark.createDataFrame(
        [(i, (i + 1) % n) for i in range(n)], "src long, dst long"
    )
    got = {r.node: r.rank for r in pagerank(df, 5, 0.5).collect()}
    for v in range(n):
        assert got[v] == 1.0 / n  # exact: uniform is the fixed point


def test_degree_stats_one_sided_nodes(spark):
    df = spark.createDataFrame(
        [(1, 2), (1, 3), (2, 3)], "src long, dst long"
    )
    got = {r.node: (r.out_degree, r.in_degree)
           for r in degree_stats(df).collect()}
    assert got == {1: (2, 0), 2: (1, 1), 3: (0, 2)}
