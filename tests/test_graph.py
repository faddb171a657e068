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


def test_pagerank_reliable_checkpoint_dir(spark, tmp_path):
    """With checkpoint_dir set, ranks must come out identical to the
    localCheckpoint path AND reliable checkpoint data must actually
    land in the directory (the cluster-durable mode)."""
    import os

    edges = [(0, 1), (0, 2), (0, 3), (1, 4), (2, 4), (3, 0)]
    df = spark.createDataFrame(edges, "src long, dst long")
    ckpt = str(tmp_path / "pr_ckpt")
    local = {r.node: r.rank for r in pagerank(df, 6, 0.85).collect()}
    durable = {
        r.node: r.rank
        for r in pagerank(df, 6, 0.85, checkpoint_dir=ckpt).collect()
    }
    assert durable == local
    written = [
        f for root, _, fs in os.walk(ckpt) for f in fs
    ]
    assert written  # reliable checkpoints were materialized on disk


def test_pagerank_tol_early_stop_matches_converged(spark):
    """tol-based early stop: on a pure cycle the uniform vector is the
    fixed point after one iteration, so a tol run must stop early and
    still return the converged ranks."""
    n = 8
    df = spark.createDataFrame(
        [(i, (i + 1) % n) for i in range(n)], "src long, dst long"
    )
    got = {
        r.node: r.rank
        for r in pagerank(df, 50, 0.5, tol=1e-12).collect()
    }
    for v in range(n):
        assert got[v] == 1.0 / n


def test_extract_links_resolution_contract(spark):
    """Absolute kept+canonicalized, protocol-relative and root-relative
    resolved against the base page, mailto/javascript/fragment/relative
    dropped, null html -> null links."""
    from pyspark.sql import functions as F

    from oakstore_spark.operators.html import extract_links

    rows = [
        (
            "https://a.test/dir/page",
            '<a href="http://www.b.test:80/x/?utm_source=s&q=1">b</a>'
            ' <a href="//c.test/y">c</a>'
            ' <a href="/rooted">r</a>'
            ' <a href="relative.html">rel</a>'
            ' <a href="#frag">f</a>'
            ' <a href="mailto:x@y.z">m</a>'
            ' <a href="javascript:void(0)">j</a>'
            " <a href='ftp://d.test/file'>ftp</a>",
        ),
        ("https://a.test/", None),
    ]
    df = spark.createDataFrame(rows, "url string, html string")
    out = {
        r["url"]: r["links"]
        for r in extract_links(df, base_url_col="url").collect()
    }
    assert out["https://a.test/dir/page"] == [
        "http://b.test/x?q=1",
        "https://c.test/y",
        "https://a.test/rooted",
    ]
    assert out["https://a.test/"] is None


def test_web_graph_edges_dedup_and_self_drop(spark):
    """Two spellings of the same target collapse to ONE edge; nav
    self-links vanish under drop_self and survive without it."""
    from oakstore_spark.operators.graph import web_graph_edges

    rows = [
        (
            "http://a.test/",
            '<a href="http://b.test/p?utm_source=x">1</a>'
            ' <a href="http://www.b.test/p">2</a>'
            ' <a href="/self">s</a>',
        ),
    ]
    df = spark.createDataFrame(rows, "url string, html string")
    got = {
        (r["src_domain"], r["dst_domain"])
        for r in web_graph_edges(df).collect()
    }
    assert got == {("a.test", "b.test")}
    with_self = {
        (r["src_domain"], r["dst_domain"])
        for r in web_graph_edges(df, drop_self=False).collect()
    }
    assert with_self == {("a.test", "b.test"), ("a.test", "a.test")}


def test_degree_stats_one_sided_nodes(spark):
    df = spark.createDataFrame(
        [(1, 2), (1, 3), (2, 3)], "src long, dst long"
    )
    got = {r.node: (r.out_degree, r.in_degree)
           for r in degree_stats(df).collect()}
    assert got == {1: (2, 0), 2: (1, 1), 3: (0, 2)}


def test_extract_link_anchors_contract(spark):
    """Anchor text: inner markup stripped, entities decoded,
    whitespace collapsed; dropped hrefs (mailto/fragment) drop their
    anchors; empty-anchor links survive with '' text."""
    from oakstore_spark.operators.html import extract_link_anchors

    html = (
        '<a href="http://www.a.test:80/?utm_source=x">  One\n two </a>'
        '<a href="mailto:x@y">nope</a>'
        '<a href="/local"><b>Bold</b> &amp; <i>co</i></a>'
        '<a href="https://img.test/"><img src="i.png"/></a>'
    )
    df = spark.createDataFrame(
        [("http://base.test/", html)], "url string, html string"
    )
    [r] = extract_link_anchors(df, base_url_col="url").collect()
    got = [(p["url"], p["anchor"]) for p in r["link_anchors"]]
    assert got == [
        ("http://a.test", "One two"),
        ("http://base.test/local", "Bold & co"),
        ("https://img.test", ""),
    ]


def test_anchor_text_stats_election(spark):
    """Per-target election: (count desc, anchor asc) pinned; empty
    anchors count toward n_links but never win."""
    from oakstore_spark.operators.graph import anchor_text_stats

    def page(u, links):
        return (u, "".join(f'<a href="{h}">{a}</a>' for h, a in links))

    rows = [
        page("http://s1.test/", [("http://t.test/", "x"), ("http://t.test/", "y")]),
        page("http://s2.test/", [("http://t.test/", "y"), ("http://t.test/", "")]),
        page("http://s3.test/", [("http://t.test/", "x")]),
    ]
    df = spark.createDataFrame(rows, "url string, html string")
    [r] = anchor_text_stats(df).collect()
    # x:2, y:2 -> tie, 'x' < 'y' wins; empty adds to n_links only
    assert r["dst_domain"] == "t.test"
    assert r["n_links"] == 5 and r["n_unique_anchors"] == 2
    assert r["top_anchor"] == "x" and r["top_anchor_links"] == 2


def test_hits_reliable_checkpoint_and_tol(spark, tmp_path):
    """Parity with pagerank's durability options (VERDICT r8 ask #4):
    with checkpoint_dir set, hub/auth come out identical to the
    localCheckpoint path and reliable checkpoint data lands on disk;
    tol stops a long run early at the converged fixed point; tol with
    normalize=False raises."""
    import os

    import pytest as _pytest

    from oakstore_spark.operators.graph import hits

    edges = [(0, 1), (0, 2), (1, 2), (2, 0), (3, 2)]
    df = spark.createDataFrame(edges, "src long, dst long")
    local = {
        r["node"]: (r["hub"], r["auth"])
        for r in hits(df, n_iterations=4).collect()
    }
    ckpt = str(tmp_path / "hits_ckpt")
    durable = {
        r["node"]: (r["hub"], r["auth"])
        for r in hits(df, n_iterations=4, checkpoint_dir=ckpt).collect()
    }
    assert durable == local
    assert [f for root, _, fs in os.walk(ckpt) for f in fs]

    # tol: a 50-iteration budget must stop early once the alternating
    # updates reach their fixed point, and still return converged
    # scores (compare against a long fixed run)
    converged = {
        r["node"]: (r["hub"], r["auth"])
        for r in hits(df, n_iterations=30).collect()
    }
    early = {
        r["node"]: (r["hub"], r["auth"])
        for r in hits(df, n_iterations=50, tol=1e-12).collect()
    }
    for node, (h, a) in converged.items():
        assert early[node][0] == pytest.approx(h, abs=1e-9)
        assert early[node][1] == pytest.approx(a, abs=1e-9)

    with _pytest.raises(ValueError, match="normalize"):
        hits(df, n_iterations=3, normalize=False, tol=1e-6)


def test_hits_normalized_numpy_parity(spark):
    """Normalized HITS on a small random graph vs a numpy replay of
    the same L1-normalized alternating updates; and the un-normalized
    integer mode must rank identically to the normalized mode."""
    import numpy as np

    from oakstore_spark.operators.graph import hits

    rng = np.random.default_rng(3)
    n = 12
    A = (rng.random((n, n)) < 0.3).astype(np.int64)
    np.fill_diagonal(A, 0)
    edges = [
        (int(i), int(j)) for i in range(n) for j in range(n) if A[i, j]
    ]
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {
        r["node"]: (r["hub"], r["auth"])
        for r in hits(df, n_iterations=3, normalize=True).collect()
    }
    # numpy replay over nodes that appear in the edge relation
    present = sorted({u for e in edges for u in e})
    idx = {u: i for i, u in enumerate(present)}
    M = np.zeros((len(present), len(present)))
    for u, v in edges:
        M[idx[u], idx[v]] = 1.0
    h = np.ones(len(present))
    for _ in range(3):
        a = M.T @ h
        a = a / a.sum()
        h = M @ a
        h = h / h.sum()
    for u in present:
        assert abs(got[u][0] - h[idx[u]]) < 1e-9, u
        assert abs(got[u][1] - a[idx[u]]) < 1e-9, u
    counts = {
        r["node"]: (r["hub"], r["auth"])
        for r in hits(df, n_iterations=3, normalize=False).collect()
    }
    byhub_n = sorted(present, key=lambda u: (-got[u][0], u))
    byhub_c = sorted(present, key=lambda u: (-counts[u][0], u))
    assert byhub_n == byhub_c


# --- triangle counting -----------------------------------------------------


def test_triangle_stats_brute_parity(spark):
    """Degree-oriented counting == brute force on a messy random graph
    (dupes, self-loops, both directions present)."""
    import itertools
    import random

    from oakstore_spark.operators.graph import triangle_stats

    rng = random.Random(7)
    n = 30
    edges = []
    for a in range(n):
        for b in range(a + 1, n):
            if rng.random() < 0.2:
                edges.append((a, b))
                if rng.random() < 0.5:
                    edges.append((b, a))  # reverse dupe
                if rng.random() < 0.2:
                    edges.append((a, b))  # exact dupe
    edges.append((5, 5))  # self-loop must be ignored
    df = spark.createDataFrame(edges, ["src", "dst"])
    got = {r.node: (r.degree, r.n_triangles, r.clustering_coeff)
           for r in triangle_stats(df).collect()}

    adj = {i: set() for i in range(n)}
    for a, b in edges:
        if a != b:
            adj[a].add(b)
            adj[b].add(a)
    tri = {i: 0 for i in range(n)}
    for x, y, z in itertools.combinations(range(n), 3):
        if y in adj[x] and z in adj[x] and z in adj[y]:
            tri[x] += 1
            tri[y] += 1
            tri[z] += 1
    for node in range(n):
        d = len(adj[node])
        if d == 0:
            assert node not in got  # isolated nodes have no edge rows
            continue
        want_c = 2.0 * tri[node] / (d * (d - 1)) if d >= 2 else 0.0
        assert got[node] == (d, tri[node], want_c), node


def test_triangle_stats_hand_graph(spark):
    from oakstore_spark.operators.graph import triangle_stats

    # K4 on {0,1,2,3} plus pendant 4-0: every K4 node in 3 triangles
    k4 = [(a, b) for a in range(4) for b in range(a + 1, 4)]
    df = spark.createDataFrame(k4 + [(4, 0)], ["src", "dst"])
    got = {r.node: r for r in triangle_stats(df).collect()}
    for v in range(4):
        assert got[v].n_triangles == 3
    assert got[0].degree == 4 and got[0].clustering_coeff == 2.0 * 3 / (4 * 3)
    assert got[1].clustering_coeff == 1.0
    assert got[4].n_triangles == 0 and got[4].clustering_coeff == 0.0


def test_k_core_peeling_chain(spark):
    from oakstore_spark.operators.graph import k_core

    # path 0-1-2-3 + triangle 3-4-5-3: 2-core = the triangle only,
    # and peeling must CASCADE down the path (3 rounds)
    edges = [(0, 1), (1, 2), (2, 3), (3, 4), (4, 5), (5, 3)]
    df = spark.createDataFrame(edges, ["src", "dst"])
    out = sorted((r.node, r.degree) for r in k_core(df, 2).collect())
    assert out == [(3, 2), (4, 2), (5, 2)]
    # 3-core of the same graph is empty
    assert k_core(df, 3).count() == 0


def test_k_core_keeps_whole_graph_when_dense(spark):
    from oakstore_spark.operators.graph import k_core

    k4 = [(a, b) for a in range(4) for b in range(a + 1, 4)]
    df = spark.createDataFrame(k4, ["src", "dst"])
    out = sorted((r.node, r.degree) for r in k_core(df, 3).collect())
    assert out == [(0, 3), (1, 3), (2, 3), (3, 3)]


def test_connected_components_paths_and_parity(spark):
    """Public CC API: a long path (diameter 15 — forces many min-label
    rounds), an isolated triangle, and a 2-node edge; distributed and
    driver paths agree exactly; convergence respects max_iterations."""
    from oakstore_spark.operators.graph import connected_components

    rows = (
        [(i, i + 1) for i in range(100, 115)]  # 16-node path
        + [(0, 1), (1, 2), (2, 0)]             # triangle
        + [(50, 51)]
    )
    edges = spark.createDataFrame(rows, "src long, dst long")
    want = (
        {i: 100 for i in range(100, 116)}
        | {0: 0, 1: 0, 2: 0}
        | {50: 50, 51: 50}
    )

    driver = {
        r.node: r.component_id
        for r in connected_components(edges).collect()
    }
    assert driver == want
    dist = {
        r.node: r.component_id
        for r in connected_components(
            edges, driver_cc_max_edges=0
        ).collect()
    }
    assert dist == want

    # fixed-round convergence: min-label needs ~diameter rounds; with
    # max_iterations=2 the far end of the path must NOT yet carry the
    # min label (proves rounds are real), while 50 rounds suffice.
    early = {
        r.node: r.component_id
        for r in connected_components(
            edges, driver_cc_max_edges=0, max_iterations=2
        ).collect()
    }
    assert early[115] != 100


def test_label_propagation_cliques_and_determinism(spark):
    """Two cliques with a bridge resolve to two communities (density
    wins where CC would merge); repeated runs identical; the path
    collapses toward its min label."""
    import itertools

    from oakstore_spark.operators.graph import label_propagation

    clique_edges = [
        (a + blk * 10, b + blk * 10)
        for blk in range(2)
        for a, b in itertools.combinations(range(6), 2)
    ]
    edges = spark.createDataFrame(
        clique_edges + [(5, 10)], "src long, dst long"
    )
    got1 = {
        r.node: r.community
        for r in label_propagation(edges, n_rounds=4).collect()
    }
    got2 = {
        r.node: r.community
        for r in label_propagation(edges, n_rounds=4).collect()
    }
    assert got1 == got2
    ca = {got1[n] for n in range(6)}
    cb = {got1[n] for n in range(10, 16)}
    assert len(ca) == 1 and len(cb) == 1
    assert ca != cb  # the bridge must NOT merge the cliques


def test_shortest_paths_hand_graph_and_unreachable(spark):
    """Hand-checked weighted diamond: 0->1 (1.0), 0->2 (4.0),
    1->2 (1.5), 2->3 (1.0), 1->3 (5.0) - node 2 via 1 (2.5) beats the
    direct edge, node 3 takes the three-hop route (3.5). Node 9 has
    only an OUTGOING edge, so it is unreachable and absent; fixpoint
    mode (n_rounds=None) stops early and certifies."""
    from oakstore_spark.operators.graph import shortest_paths

    edges = spark.createDataFrame(
        [
            (0, 1, 1.0),
            (0, 2, 4.0),
            (1, 2, 1.5),
            (2, 3, 1.0),
            (1, 3, 5.0),
            (9, 0, 1.0),
        ],
        "src long, dst long, weight double",
    )
    got = {r.node: r.dist for r in shortest_paths(edges, 0).collect()}
    assert got == {0: 0.0, 1: 1.0, 2: 2.5, 3: 3.5}
    assert 9 not in got


def test_shortest_paths_negative_edges_and_cycle_detection(spark):
    """Negative EDGES are fine (the relaxation finds the cheaper
    detour a greedy Dijkstra would miss); a negative CYCLE must raise
    - shortest paths are undefined - and a fixed n_rounds too small
    to certify the fixpoint raises too."""
    import pytest as _pytest

    from oakstore_spark.operators.graph import shortest_paths

    neg = spark.createDataFrame(
        [(0, 1, 5.0), (0, 2, 2.0), (2, 1, -4.0)],
        "src long, dst long, weight double",
    )
    got = {r.node: r.dist for r in shortest_paths(neg, 0).collect()}
    assert got[1] == -2.0  # via the negative edge, not the direct 5.0

    cyc = spark.createDataFrame(
        [(0, 1, 1.0), (1, 2, 1.0), (2, 1, -3.0)],
        "src long, dst long, weight double",
    )
    with _pytest.raises(ValueError, match="negative cycle"):
        shortest_paths(cyc, 0)

    chain = spark.createDataFrame(
        [(i, i + 1, 1.0) for i in range(6)],
        "src long, dst long, weight double",
    )
    with _pytest.raises(ValueError, match="n_rounds too small"):
        shortest_paths(chain, 0, n_rounds=2)
    ok = {
        r.node: r.dist
        for r in shortest_paths(chain, 0, n_rounds=6).collect()
    }
    assert ok[6] == 6.0


def test_shortest_paths_driver_distributed_parity(spark):
    """r15: the size-gated driver fast path must be BIT-identical to
    the forced-distributed rounds (driver_max_edges=0) — same reached
    set, same doubles (Bellman–Ford is min-based, so the float chain
    is order-free by construction) — on a graph with dyadic weights,
    a negative edge, an unreachable node and a fixed round budget; and
    both paths must certify the same negative cycle."""
    import pytest as _pytest

    from oakstore_spark.operators.graph import shortest_paths

    edges = spark.createDataFrame(
        [
            (0, 1, 1.25), (0, 2, 4.0), (1, 2, 1.5), (2, 3, 1.0),
            (1, 3, 5.0), (3, 4, -0.5), (4, 5, 2.25), (9, 0, 1.0),
            (5, 6, 0.75), (2, 6, 9.0),
        ],
        "src long, dst long, weight double",
    )
    for rounds in (None, 8):
        drv = {
            r.node: r.dist
            for r in shortest_paths(edges, 0, n_rounds=rounds).collect()
        }
        dist = {
            r.node: r.dist
            for r in shortest_paths(
                edges, 0, n_rounds=rounds, driver_max_edges=0
            ).collect()
        }
        assert drv == dist  # exact double equality, both modes
        assert 9 not in drv

    cyc = spark.createDataFrame(
        [(0, 1, 1.0), (1, 2, 1.0), (2, 1, -3.0)],
        "src long, dst long, weight double",
    )
    with _pytest.raises(ValueError, match="negative cycle"):
        shortest_paths(cyc, 0)
    with _pytest.raises(ValueError, match="negative cycle"):
        shortest_paths(cyc, 0, driver_max_edges=0)


def test_personalized_pagerank_localization_and_uniform_equivalence(spark):
    """r14: pagerank(seeds=...) — (1) seeds = ALL nodes uniform must
    equal vanilla pagerank BIT-FOR-BIT (the teleport distribution is
    then exactly 1/N); (2) with a single seed on a closed graph, mass
    conserves to 1 and localizes: the seed outranks every node outside
    its out-neighborhood; (3) weighted seeds normalize."""
    from pyspark.sql import functions as F

    from oakstore_spark.operators.graph import pagerank

    # ring of 16 + a few chords (closed: every node has out-edges)
    edges = spark.range(16).select(
        F.col("id").alias("src"), ((F.col("id") + 1) % 16).alias("dst")
    ).unionByName(
        spark.range(4).select(
            (F.col("id") * 4).alias("src"),
            ((F.col("id") * 4 + 8) % 16).alias("dst"),
        )
    )
    vanilla = {
        r.node: r.rank
        for r in pagerank(edges, n_iterations=6, damping=0.5).collect()
    }
    all_nodes = spark.range(16).select(F.col("id").alias("node"))
    unif = {
        r.node: r.rank
        for r in pagerank(
            edges, n_iterations=6, damping=0.5, seeds=all_nodes
        ).collect()
    }
    # 16 = 2^4: (1-d)/n and (1-d)*(1/n) coincide exactly on dyadics,
    # so the differential is bit-exact here
    assert unif == vanilla
    seed0 = spark.range(1).select(F.col("id").alias("node"))
    ppr = {
        r.node: r.rank
        for r in pagerank(
            edges, n_iterations=8, damping=0.5, seeds=seed0
        ).collect()
    }
    assert abs(sum(ppr.values()) - 1.0) < 1e-12  # mass conserved
    assert ppr[0] == max(ppr.values())  # the seed dominates
    assert ppr[1] > ppr[9]  # out-neighbor beats a far node
    # weighted seeds: node 0 at weight 3, node 8 at weight 1 -> node 0
    # side carries more mass
    ws = spark.createDataFrame([(0, 3.0), (8, 1.0)], ["node", "w"])
    pw = {
        r.node: r.rank
        for r in pagerank(
            edges, n_iterations=8, damping=0.5, seeds=ws,
            seed_weight_col="w",
        ).collect()
    }
    assert pw[0] > pw[8] and abs(sum(pw.values()) - 1.0) < 1e-12


def test_personalized_pagerank_seed_validation(spark):
    """r15 (r14 ADVICE): seeds absent from the graph drop out of BOTH
    the normalizer and the join (mass still sums to 1); duplicate
    weighted seed rows aggregate instead of double-normalizing; empty
    or non-positive seed weight raises."""
    from pyspark.sql import functions as F

    from oakstore_spark.operators.graph import pagerank

    edges = spark.range(8).select(
        F.col("id").alias("src"), ((F.col("id") + 1) % 8).alias("dst")
    )
    # one real seed + one ghost node 99: ghost's weight must not leak
    ghost = spark.createDataFrame([(0, 1.0), (99, 5.0)], ["node", "w"])
    pr = {
        r.node: r.rank
        for r in pagerank(
            edges, n_iterations=6, damping=0.5, seeds=ghost,
            seed_weight_col="w",
        ).collect()
    }
    assert abs(sum(pr.values()) - 1.0) < 1e-12
    only = spark.createDataFrame([(0, 1.0)], ["node", "w"])
    pr_only = {
        r.node: r.rank
        for r in pagerank(
            edges, n_iterations=6, damping=0.5, seeds=only,
            seed_weight_col="w",
        ).collect()
    }
    assert pr == pr_only  # ghost seed is a no-op
    # duplicate seed rows aggregate: (0,1)+(0,1)+(4,2) == (0,2)+(4,2)
    dup = spark.createDataFrame(
        [(0, 1.0), (0, 1.0), (4, 2.0)], ["node", "w"]
    )
    merged = spark.createDataFrame([(0, 2.0), (4, 2.0)], ["node", "w"])
    pd_ = {
        r.node: r.rank
        for r in pagerank(
            edges, n_iterations=4, damping=0.5, seeds=dup,
            seed_weight_col="w",
        ).collect()
    }
    pm = {
        r.node: r.rank
        for r in pagerank(
            edges, n_iterations=4, damping=0.5, seeds=merged,
            seed_weight_col="w",
        ).collect()
    }
    assert pd_ == pm
    import pytest as _pytest

    with _pytest.raises(ValueError, match="positive total weight"):
        pagerank(
            edges, n_iterations=2, seeds=spark.createDataFrame(
                [(99, 1.0)], ["node", "w"]
            ), seed_weight_col="w",
        )
    with _pytest.raises(ValueError, match="must be positive"):
        pagerank(
            edges, n_iterations=2, seeds=spark.createDataFrame(
                [(0, 1.0), (4, -0.25)], ["node", "w"]
            ), seed_weight_col="w",
        )
