"""Link-graph queries: PageRank and degree stats over a closed-form
planted graph, both hash-exact against DuckDB oracles.

The planted graph (64 nodes) is engineered so PageRank is BIT-EXACT
despite being a float algorithm: damping 1/2, N = 2^6, and every
outdegree a power of two (hub nodes 4, cycle nodes 1) keep every
intermediate rank a dyadic rational whose denominator grows only
3 bits per iteration (deg 4 -> +2, damping -> +1): after 10
iterations the values need ~36 mantissa bits — far inside double
precision, so addition order cannot perturb the sums and Spark's
shuffled aggregation matches DuckDB's serial replay (the oracle
unrolls all 10 iterations as chained CTEs) to the last bit. A graph
with a DANGLING node grows ~7 bits/iteration (mass/64 each round) and
stops being exactly representable around iteration 8 — that path is
pinned by the pytest dangling test with tolerance instead, and the
oracle graph keeps the cycle closed (every node has out-edges; the
dangling term still evaluates, to an exact 0).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from oakstore_spark.queries import register
from oakstore_spark.sources import table

_N = 64
_ITER = 10

_GRAPH_CTE = """
    nodes AS (SELECT range AS node FROM range(64)),
    edges AS (
      SELECT range AS src, (range + 1) % 64 AS dst FROM range(64)
      UNION ALL SELECT range * 4, (range * 4 + 16) % 64 FROM range(16)
      UNION ALL SELECT range * 4, (range * 4 + 32) % 64 FROM range(16)
      UNION ALL SELECT range * 4, (range * 4 + 48) % 64 FROM range(16)
    ),
    outdeg AS (SELECT src AS node, count(*) AS deg FROM edges GROUP BY 1)
"""


def _planted_edges(spark: SparkSession) -> DataFrame:
    """The same graph, built declaratively Spark-side: a 0->1->...->62
    ...->63->0 cycle plus three long-range edges out of every
    hub (node % 4 == 0)."""
    chain = spark.range(64).select(
        F.col("id").alias("src"), ((F.col("id") + 1) % _N).alias("dst")
    )
    hubs = spark.range(16).select((F.col("id") * 4).alias("src"))
    extra = hubs.select(
        "src",
        F.explode(
            F.array(
                (F.col("src") + 16) % _N,
                (F.col("src") + 32) % _N,
                (F.col("src") + 48) % _N,
            )
        ).alias("dst"),
    )
    return chain.unionByName(extra)


def _pagerank_oracle() -> str:
    # The closed-cycle graph has NO dangling nodes, so the dangling
    # term is identically +0.0 and is compiled OUT of the oracle — not
    # just for brevity: referencing pr{k} a second time per level makes
    # a CTE-inlining engine expand the chain 2^iterations times
    # (measured: 55 s in DuckDB vs milliseconds single-reference). The
    # Spark side still computes the term (it is exactly 0.0 here);
    # the dangling PATH is pinned by the pytest with tolerance.
    steps = []
    for k in range(_ITER):
        steps.append(f"""
    pr{k + 1} AS (
      SELECT n.node,
             0.0078125 + 0.5 * COALESCE(c.contrib, 0) AS rank
      FROM nodes n
      LEFT JOIN (
        SELECT e.dst AS node, sum(p.rank / o.deg) AS contrib
        FROM edges e
        JOIN pr{k} p ON e.src = p.node
        JOIN outdeg o ON o.node = e.src
        GROUP BY e.dst
      ) c ON c.node = n.node
    )""")
    return (
        "WITH "
        + _GRAPH_CTE
        + ",\n    pr0 AS (SELECT node, CAST(1.0/64 AS DOUBLE) AS rank"
        " FROM nodes),"
        + ",".join(steps)
        + f"\n    SELECT node, rank FROM pr{_ITER}"
    )


def _ppr_oracle() -> str:
    """Generated q_ppr_dyadic oracle: 10 personalized-PageRank rounds
    over the same closed dyadic graph, teleporting to the 4-seed
    uniform distribution (s = 1/4 on nodes {0,16,32,48}, dyadic) —
    every intermediate stays an exactly-representable dyadic rational
    (the module-docstring argument, with the teleport term 0.5*s
    replacing the uniform 0.5/64), so Spark's shuffled aggregation
    must equal the serial chained-CTE replay to the last bit."""
    steps = []
    for k in range(_ITER):
        steps.append(f"""
    pr{k + 1} AS (
      SELECT n.node,
             0.5 * n.s + 0.5 * COALESCE(c.contrib, 0) AS rank
      FROM ns n
      LEFT JOIN (
        SELECT e.dst AS node, sum(p.rank / o.deg) AS contrib
        FROM edges e
        JOIN pr{k} p ON e.src = p.node
        JOIN outdeg o ON o.node = e.src
        GROUP BY e.dst
      ) c ON c.node = n.node
    )""")
    return (
        "WITH "
        + _GRAPH_CTE
        + """,
    seeds AS (SELECT node, CAST(0.25 AS DOUBLE) AS s
              FROM nodes WHERE node % 16 = 0),
    ns AS (SELECT n.node, COALESCE(sd.s, 0.0) AS s
           FROM nodes n LEFT JOIN seeds sd ON sd.node = n.node),
    pr0 AS (SELECT node, s AS rank FROM ns),"""
        + ",".join(steps)
        + f"\n    SELECT node, rank FROM pr{_ITER} ORDER BY node"
    )


@register("q_ppr_dyadic", oracle=_ppr_oracle())
def q_ppr_dyadic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Personalized PageRank (operators/graph.pagerank with seeds= —
    Haveliwala 2002's topic-sensitive teleport / random walk with
    restart, r14): 10 synchronous rounds over the planted dyadic
    graph teleporting to the 4 hub seeds {0,16,32,48} at s = 1/4
    each. Mass starts and stays exactly 1, concentrated around the
    seeds; every intermediate is a dyadic rational, so all 64 ranks
    hash-match the oracle's serial replay bit-for-bit. The
    seeds-equals-all-nodes == vanilla-pagerank differential and the
    localization property are pinned in tests/test_graph.py."""
    from oakstore_spark.operators.graph import pagerank

    prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "2")
    try:
        seeds = spark.range(4).select(
            (F.col("id") * 16).alias("node")
        )
        out = pagerank(
            _planted_edges(spark), n_iterations=_ITER, damping=0.5,
            seeds=seeds,
        ).select("node", "rank")
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
    return out.orderBy("node")


@register("q_pagerank_dyadic", oracle=_pagerank_oracle())
def q_pagerank_dyadic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """10 synchronous PageRank iterations (damping 1/2) over the
    planted dyadic graph — per-iteration join + partial-agg shuffle,
    broadcast dangling mass (exactly zero here: the cycle is closed),
    localCheckpoint lineage truncation — vs the oracle's 10
    chained-CTE serial replays. Exact float equality on all 64 ranks
    (see module docstring for why that's possible)."""
    from oakstore_spark.operators.graph import pagerank

    # 64 nodes: size the per-iteration shuffles to the graph, not the
    # session default (32 partitions x 10 iterations of empty-partition
    # scheduling dominates the wall otherwise)
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "2")
    try:
        out = pagerank(
            _planted_edges(spark), n_iterations=_ITER, damping=0.5
        ).select("node", "rank")
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
    return out


def _planted_pages(spark: SparkSession) -> DataFrame:
    """One crawled HTML page per node of the dyadic graph: the page at
    ``http://node{i}.test/`` carries one anchor per out-neighbor — each
    deliberately NOISY (``www.`` prefix, explicit ``:80``, a
    ``utm_source`` tracking param) so the edge only lands if
    canonicalization works — plus a protocol-relative DUPLICATE of the
    chain link (must collapse into the same edge), and a nav block of
    links the resolution contract must drop (root-relative self link,
    bare fragment, mailto:, javascript:)."""
    e = _planted_edges(spark)
    anchor = F.concat(
        F.lit('<a href="http://www.node'),
        F.col("dst"),
        F.lit('.test:80/?utm_source=feed&page=1">next</a>'),
    )
    neigh = (
        e.select("src", anchor.alias("a"))
        .groupBy("src")
        .agg(F.concat_ws("\n", F.sort_array(F.collect_list("a"))).alias("n"))
    )
    return neigh.select(
        F.concat(F.lit("http://node"), F.col("src"), F.lit(".test/")).alias(
            "url"
        ),
        F.concat(
            F.lit(
                '<html><body><nav><a href="/about">About</a> '
                '<a href="#top">top</a> <a href="mailto:ops@example.org">m</a> '
                '<a href="javascript:void(0)">js</a></nav>\n'
            ),
            F.col("n"),
            F.lit('\n<a href="//node'),
            (F.col("src") + 1) % _N,
            F.lit('.test/alt">alt</a></body></html>'),
        ).alias("html"),
    )


# The web-graph e2e query runs FEWER PageRank iterations than
# q_pagerank_dyadic: its job is to prove the extraction -> canonicalize
# -> edge-build chain lands EXACTLY the dyadic graph (any wrong edge
# perturbs every rank by iteration 2), while the 10-iteration rank
# arithmetic itself is already bit-pinned by q_pagerank_dyadic. Four
# iterations keep the full-chain hash just as discriminating at less
# than half the loop wall.
_WEB_ITER = 4


def _webgraph_oracle() -> str:
    steps = []
    for k in range(_WEB_ITER):
        steps.append(f"""
    pr{k + 1} AS (
      SELECT n.node,
             0.0078125 + 0.5 * COALESCE(c.contrib, 0) AS rank
      FROM nodes n
      LEFT JOIN (
        SELECT e.dst AS node, sum(p.rank / o.deg) AS contrib
        FROM edges e
        JOIN pr{k} p ON e.src = p.node
        JOIN outdeg o ON o.node = e.src
        GROUP BY e.dst
      ) c ON c.node = n.node
    )""")
    return (
        "WITH "
        + _GRAPH_CTE
        + ",\n    pr0 AS (SELECT node, CAST(1.0/64 AS DOUBLE) AS rank"
        " FROM nodes),"
        + ",".join(steps)
        + f"""
    SELECT 'node' || CAST(node AS VARCHAR) || '.test' AS domain, rank
    FROM pr{_WEB_ITER}"""
    )


@register("q_web_graph_rank", oracle=_webgraph_oracle())
def q_web_graph_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full crawl chain END-TO-END: planted HTML pages → href
    extraction + URL canonicalization (``extract_links``: tracking
    params, www., :80, protocol-relative resolution all exercised) →
    registered-domain edge construction (``web_graph_edges``: nav junk
    dropped, the duplicate chain link collapses in the distinct) → 4
    dyadic PageRank iterations — and the oracle replays the WHOLE thing
    in closed form, because the surviving edge set must be EXACTLY the
    dyadic graph on domain strings. A missed anchor, an un-stripped
    tracking param, a wrong domain mapping, a phantom self-edge, or any
    rank drift breaks the hash on all 64 rows."""
    from oakstore_spark.operators.graph import pagerank, web_graph_edges

    prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "2")
    try:
        edges = web_graph_edges(_planted_pages(spark))
        out = pagerank(
            edges,
            n_iterations=_WEB_ITER,
            damping=0.5,
            src_col="src_domain",
            dst_col="dst_domain",
        ).select(F.col("node").alias("domain"), "rank")
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
    return out


@register(
    "q_graph_degrees",
    oracle="WITH "
    + _GRAPH_CTE
    + """
    SELECT COALESCE(o.node, i.node) AS node,
           CAST(COALESCE(o.out_degree, 0) AS BIGINT) AS out_degree,
           CAST(COALESCE(i.in_degree, 0) AS BIGINT) AS in_degree
    FROM (SELECT src AS node, count(*) AS out_degree
          FROM edges GROUP BY 1) o
    FULL JOIN (SELECT dst AS node, count(*) AS in_degree
               FROM edges GROUP BY 1) i
      ON o.node = i.node
    """,
)
def q_graph_degrees(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Degree statistics of the planted graph (hubs out 4 / chain 1 /
    dangling 0; long-range targets collect in-degree 4), full-outer
    joined so one-sided nodes surface with zero."""
    from oakstore_spark.operators.graph import degree_stats

    return degree_stats(_planted_edges(spark))


@register(
    "q_anchor_text_stats",
    oracle="""
    WITH pages AS (
      SELECT doc_id, doc_id % 7 AS k, doc_id % 2 = 0 AS even
      FROM documents
    ), rows_ AS (
      SELECT 'd' || CAST(k AS VARCHAR) || '.test' AS dst_domain,
             CASE WHEN even THEN 'alpha' ELSE 'beta' END AS anchor
      FROM pages
      UNION ALL
      SELECT 'hub.test', 'Hub & home' FROM pages
    ), cnt AS (
      SELECT dst_domain, anchor, count(*) AS c
      FROM rows_ GROUP BY 1, 2
    ), ranked AS (
      SELECT *, row_number() OVER (PARTITION BY dst_domain
                                   ORDER BY c DESC, anchor) AS rn
      FROM cnt
    )
    SELECT t.dst_domain,
           CAST(t.n_links AS BIGINT) AS n_links,
           CAST(t.n_unique AS BIGINT) AS n_unique_anchors,
           r.anchor AS top_anchor,
           CAST(r.c AS BIGINT) AS top_anchor_links
    FROM (SELECT dst_domain, sum(c) AS n_links, count(*) AS n_unique
          FROM cnt GROUP BY 1) t
    JOIN ranked r ON r.dst_domain = t.dst_domain AND r.rn = 1
    ORDER BY t.dst_domain
    """,
)
def q_anchor_text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Anchor-text aggregation end-to-end over planted pages: each
    page carries one NOISY link (www., :80, tracking param) to domain
    d{doc_id%7}.test whose anchor text is 'alpha'/'beta' by parity,
    plus a link to hub.test whose anchor is '<b>Hub</b> &amp; home' —
    markup-stripping, entity decode, and whitespace collapse must all
    land 'Hub & home' exactly. The oracle replays extraction, the
    per-(domain, anchor) counts, and the pinned (count desc, anchor
    asc) election."""
    from oakstore_spark.operators.graph import anchor_text_stats

    d = table(spark, sf_dir, "documents")
    sid = F.col("doc_id").cast("string")
    k = (F.col("doc_id") % 7).cast("string")
    anchor1 = F.when(F.col("doc_id") % 2 == 0, F.lit("alpha")).otherwise(
        F.lit("beta")
    )
    html = F.concat(
        F.lit('<a href="http://www.d'),
        k,
        F.lit('.test:80/?utm_source=z&p=1">'),
        anchor1,
        F.lit('</a> <a href="https://hub.test/x"><b>Hub</b> &amp; '
              "home</a>"),
    )
    pages = d.select(
        F.concat(F.lit("http://page"), sid, F.lit(".example/")).alias(
            "url"
        ),
        html.alias("html"),
    )
    return anchor_text_stats(pages).orderBy("dst_domain")


def _hits_oracle(k: int = 2) -> str:
    steps = ["h0 AS (SELECT node, CAST(1 AS BIGINT) AS hub FROM nodes)"]
    for i in range(1, k + 1):
        steps.append(f"""
    a{i} AS (
      SELECT n.node, CAST(COALESCE(s.v, 0) AS BIGINT) AS auth
      FROM nodes n LEFT JOIN (
        SELECT e.dst AS node, sum(h.hub) AS v
        FROM edges e JOIN h{i - 1} h ON h.node = e.src GROUP BY 1
      ) s ON s.node = n.node
    )""")
        steps.append(f"""
    h{i} AS (
      SELECT n.node, CAST(COALESCE(s.v, 0) AS BIGINT) AS hub
      FROM nodes n LEFT JOIN (
        SELECT e.src AS node, sum(a.auth) AS v
        FROM edges e JOIN a{i} a ON a.node = e.dst GROUP BY 1
      ) s ON s.node = n.node
    )""")
    return (
        "WITH "
        + _GRAPH_CTE
        + ","
        + ",".join(steps)
        + f"""
    SELECT h.node, h.hub, a.auth
    FROM h{k} h JOIN a{k} a ON h.node = a.node"""
    )


@register("q_hits_counts", oracle=_hits_oracle(2))
def q_hits_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HITS hubs/authorities over the planted graph, 2 un-normalized
    iterations: every score is an EXACT BIGINT alternating-path count
    (normalization deferred — same ranking, zero float caveats), so
    the oracle replays both half-steps of both rounds integer-exactly.
    Hub nodes (outdeg 4) must separate from chain nodes (outdeg 1) in
    hub score; their long-range targets collect the authority mass."""
    from oakstore_spark.operators.graph import hits

    prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "2")
    try:
        out = hits(
            _planted_edges(spark), n_iterations=2, normalize=False
        ).select("node", "hub", "auth")
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
    return out


_REACH_SQL_BODY = """
    reach(node, dist) AS (
      SELECT {zero}, {zero_d}
      UNION ALL
      SELECT e.dst, r.dist + 1
      FROM reach r JOIN edges e ON e.src = r.node
      WHERE r.dist < 6
    )
    SELECT node, min(dist) AS dist, CAST(count(*) AS BIGINT) AS n_paths
    FROM reach GROUP BY node
"""


@register(
    "q_reach_bfs_sql",
    oracle="WITH RECURSIVE "
    + _GRAPH_CTE
    + ","
    + _REACH_SQL_BODY.format(
        zero="CAST(0 AS BIGINT)", zero_d="CAST(0 AS BIGINT)"
    ),
)
def q_reach_bfs_sql(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Crawl-depth-bounded reachability over the planted graph as PURE
    RECURSIVE SQL (Spark 4 WITH RECURSIVE), seed node 0, <= 6 hops:
    per reached node the shortest distance AND the exact number of
    distinct walks of length <= 6 arriving there (the UNION ALL
    recursion enumerates walks; min/count aggregate them) — both
    integers, so DuckDB running the IDENTICAL recursion must agree on
    every row. The 'how many clicks from the seed' shape of a crawl
    frontier plan."""
    from oakstore_spark.queries.graph import _planted_edges

    _planted_edges(spark).createOrReplaceTempView("edges")
    sql = (
        "WITH RECURSIVE "
        + _REACH_SQL_BODY.format(
            zero="CAST(0 AS BIGINT)", zero_d="CAST(0 AS BIGINT)"
        )
    )
    return spark.sql(sql)


@register(
    "q_warc_crawl_graph",
    oracle="WITH "
    + _GRAPH_CTE
    + """
    SELECT 'node' || CAST(COALESCE(o.node, i.node) AS VARCHAR) || '.test'
             AS node,
           CAST(COALESCE(o.out_degree, 0) AS BIGINT) AS out_degree,
           CAST(COALESCE(i.in_degree, 0) AS BIGINT) AS in_degree
    FROM (SELECT src AS node, count(*) AS out_degree
          FROM edges GROUP BY 1) o
    FULL JOIN (SELECT dst AS node, count(*) AS in_degree
               FROM edges GROUP BY 1) i
      ON o.node = i.node
    ORDER BY node
    """,
)
def q_warc_crawl_graph(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The ARCHIVE-DELIVERY crawl chain end-to-end: the planted noisy
    HTML pages are written as per-record-gzip WARC shards (what a
    crawler actually hands the pipeline), re-ingested via binaryFile +
    the WARC parser, payloads decoded back to HTML, links extracted +
    canonicalized, domain edges built — and the resulting graph's
    degree profile must equal the closed-form dyadic structure
    EXACTLY (hubs out 4 / chain 1; long-range targets in 4). Any
    record the container drops or any byte the codec shifts breaks a
    degree somewhere."""
    import shutil
    import tempfile
    from pathlib import Path

    from oakstore_spark.operators.graph import degree_stats, web_graph_edges
    from oakstore_spark.sources.warc import read_warc, write_warc

    pages = _planted_pages(spark)
    recs = pages.select(
        F.col("url").alias("record_id"),
        F.lit("response").alias("warc_type"),
        F.col("url").alias("target_uri"),
        F.lit(1_700_000_000_000_000).alias("warc_date_us"),
        F.lit("text/html").alias("content_type"),
        F.encode("html", "utf-8").alias("payload"),
    )
    base = (
        Path(tempfile.gettempdir())
        / f"oakspark_warc_crawl_{Path(sf_dir.rstrip('/')).name}"
    )
    shutil.rmtree(base, ignore_errors=True)
    write_warc(recs, str(base), compress=True)
    crawled = read_warc(spark, str(base), record_types=["response"]).select(
        F.col("target_uri").alias("url"),
        F.decode("payload", "utf-8").alias("html"),
    )
    edges = web_graph_edges(crawled)
    return (
        degree_stats(edges, src_col="src_domain", dst_col="dst_domain")
        .orderBy("node")
    )


@register(
    "q_triangle_stats",
    oracle=f"""
    WITH {_GRAPH_CTE},
    und AS (
      SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
      FROM edges WHERE src != dst
    ), deg AS (
      SELECT node, CAST(count(*) AS BIGINT) AS degree FROM (
        SELECT a AS node FROM und UNION ALL SELECT b FROM und
      ) GROUP BY node
    ), tri AS (
      SELECT e1.a AS x, e1.b AS y, e2.b AS z
      FROM und e1
      JOIN und e2 ON e2.a = e1.b
      JOIN und e3 ON e3.a = e1.a AND e3.b = e2.b
    ), per_node AS (
      SELECT node, CAST(count(*) AS BIGINT) AS n_triangles FROM (
        SELECT x AS node FROM tri
        UNION ALL SELECT y FROM tri
        UNION ALL SELECT z FROM tri
      ) GROUP BY node
    )
    SELECT deg.node, degree,
           CAST(coalesce(n_triangles, 0) AS BIGINT) AS n_triangles,
           CASE WHEN degree >= 2
                THEN 2.0 * CAST(coalesce(n_triangles, 0) AS DOUBLE)
                     / (CAST(degree AS DOUBLE) * (degree - 1))
                ELSE 0.0 END AS clustering_coeff
    FROM deg LEFT JOIN per_node ON deg.node = per_node.node
    ORDER BY deg.node
    """,
)
def q_triangle_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-node triangle counts + local clustering coefficient on the
    planted hub graph (operators/graph.triangle_stats): degree-ORIENTED
    wedge counting — every triangle enumerated once at its
    order-smallest corner, celebrity-node fan-out bounded by the
    O(sqrt(m)) oriented out-degree. The oracle brute-forces the same
    undirected simple graph with an x<y<z three-way join — algorithm-
    independent integer counts, one pinned float division for the
    coefficient."""
    from oakstore_spark.operators.graph import triangle_stats

    return triangle_stats(_planted_edges(spark)).orderBy("node")


@register(
    "q_k_core",
    oracle=f"""
    WITH {_GRAPH_CTE},
    und AS (
      SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
      FROM edges WHERE src != dst
    ),
    d1 AS (SELECT node, count(*) AS deg FROM (
             SELECT a AS node FROM und UNION ALL SELECT b FROM und
           ) GROUP BY node),
    s1 AS (SELECT node FROM d1 WHERE deg >= 3),
    e1 AS (SELECT a, b FROM und
           WHERE a IN (SELECT node FROM s1)
             AND b IN (SELECT node FROM s1)),
    d2 AS (SELECT node, count(*) AS deg FROM (
             SELECT a AS node FROM e1 UNION ALL SELECT b FROM e1
           ) GROUP BY node),
    s2 AS (SELECT node FROM d2 WHERE deg >= 3),
    e2 AS (SELECT a, b FROM e1
           WHERE a IN (SELECT node FROM s2)
             AND b IN (SELECT node FROM s2)),
    d3 AS (SELECT node, count(*) AS deg FROM (
             SELECT a AS node FROM e2 UNION ALL SELECT b FROM e2
           ) GROUP BY node)
    SELECT node, CAST(deg AS BIGINT) AS degree
    FROM d3 WHERE deg >= 3 ORDER BY node
    """,
)
def q_k_core(spark: SparkSession, sf_dir: str) -> DataFrame:
    """3-core of the planted hub graph (operators/graph.k_core):
    iterative peeling converges here in 2 rounds — round 1 removes all
    degree-2 cycle nodes, leaving the 16 hubs on their chord edges at
    degree exactly 3; the oracle replays THREE fixed peel rounds as
    chained CTEs (the extra round is a no-op, proving the fixpoint the
    Spark loop detects dynamically)."""
    from oakstore_spark.operators.graph import k_core

    return k_core(_planted_edges(spark), k=3).orderBy("node")


@register(
    "q_connected_components",
    oracle="""
    WITH RECURSIVE comp_edges AS (
      SELECT range AS src, range + 1 AS dst FROM range(64)
      WHERE range % 8 != 7
      UNION ALL
      SELECT range * 8, range * 8 + 5 FROM range(8)
    ), edges AS (
      SELECT src, dst FROM comp_edges
      UNION
      SELECT dst, src FROM comp_edges
    ), reach(id, root) AS (
      SELECT src, src FROM edges
      UNION
      SELECT e.dst, r.root FROM reach r JOIN edges e ON e.src = r.id
    )
    SELECT id AS node, CAST(min(root) AS BIGINT) AS component_id
    FROM reach GROUP BY id ORDER BY node
    """,
)
def q_connected_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Connected components as a public graph API
    (operators/graph.connected_components): eight 8-node path
    components (block chains with one chord each — diameter 7, so the
    min-label loop takes several real rounds), run through the
    DISTRIBUTED hash-to-min path (driver gate forced off); the oracle
    resolves the identical graph with a recursive-CTE closure, the
    same pattern q_entity_clusters uses."""
    from oakstore_spark.operators.graph import connected_components

    base = spark.range(64).where(F.col("id") % 8 != 7).select(
        F.col("id").alias("src"), (F.col("id") + 1).alias("dst")
    )
    chords = spark.range(8).select(
        (F.col("id") * 8).alias("src"),
        (F.col("id") * 8 + 5).alias("dst"),
    )
    edges = base.unionByName(chords)
    return connected_components(
        edges, driver_cc_max_edges=0
    ).orderBy("node")


@register(
    "q_label_propagation",
    oracle="""
    WITH cl AS (
      SELECT a.range + b.blk * 8 AS x, b2.range + b.blk * 8 AS y
      FROM range(8) a, range(8) b2(range),
           (SELECT range AS blk FROM range(2)) b
      WHERE a.range < b2.range
    ), comp_edges AS (
      SELECT x AS src, y AS dst FROM cl
      UNION ALL SELECT 7, 8
      UNION ALL
      SELECT 20 + range, 21 + range FROM range(4)
    ), und AS (
      SELECT DISTINCT src, dst FROM (
        SELECT src, dst FROM comp_edges
        UNION ALL SELECT dst, src FROM comp_edges
      ) WHERE src != dst
    ), l0 AS (
      SELECT DISTINCT src AS node, src AS lab FROM und
    ), c1 AS (
      SELECT e.dst AS node, l.lab, count(*) AS c
      FROM und e JOIN l0 l ON l.node = e.src
      GROUP BY e.dst, l.lab
    ), l1 AS (
      SELECT node, lab FROM (
        SELECT node, lab, row_number() OVER (
          PARTITION BY node ORDER BY c DESC, lab) AS rn FROM c1
      ) WHERE rn = 1
    ), c2 AS (
      SELECT e.dst AS node, l.lab, count(*) AS c
      FROM und e JOIN l1 l ON l.node = e.src
      GROUP BY e.dst, l.lab
    ), l2 AS (
      SELECT node, lab FROM (
        SELECT node, lab, row_number() OVER (
          PARTITION BY node ORDER BY c DESC, lab) AS rn FROM c2
      ) WHERE rn = 1
    ), c3 AS (
      SELECT e.dst AS node, l.lab, count(*) AS c
      FROM und e JOIN l2 l ON l.node = e.src
      GROUP BY e.dst, l.lab
    ), l3 AS (
      SELECT node, lab FROM (
        SELECT node, lab, row_number() OVER (
          PARTITION BY node ORDER BY c DESC, lab) AS rn FROM c3
      ) WHERE rn = 1
    )
    SELECT node, CAST(lab AS BIGINT) AS community
    FROM l3 ORDER BY node
    """,
)
def q_label_propagation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic synchronous label propagation
    (operators/graph.label_propagation): two 8-cliques joined by one
    bridge edge plus a 5-node path, three fixed rounds — the cliques
    must resolve to single communities despite the bridge (density
    wins where connected-components would merge everything). The
    oracle replays the identical rounds as chained CTEs (the k-core
    pattern); min-label tie-break makes every round engine-exact."""
    from oakstore_spark.operators.graph import label_propagation

    import itertools

    clique_edges = [
        (a + blk * 8, b + blk * 8)
        for blk in range(2)
        for a, b in itertools.combinations(range(8), 2)
    ]
    path_edges = [(20 + i, 21 + i) for i in range(4)]
    edges = spark.createDataFrame(
        clique_edges + [(7, 8)] + path_edges, "src long, dst long"
    )
    return label_propagation(edges, n_rounds=3).orderBy("node")


def _sssp_oracle(rounds: int = 18) -> str:
    """Chained-CTE replay of exactly ``rounds`` Bellman-Ford rounds
    over the planted weighted graph. Each level references the
    previous ONCE (the pagerank-oracle inlining lesson): the
    keep-current-distance case rides on a weight-0 self-loop per node
    instead of a second d{k} reference, which is algebraically the
    same min."""
    steps = []
    for k in range(rounds):
        steps.append(f"""
    d{k + 1} AS (
      SELECT e.dst AS node, min(d.dist + e.w) AS dist
      FROM d{k} d JOIN wedges e ON e.src = d.node
      GROUP BY e.dst
    )""")
    return (
        "WITH "
        + _GRAPH_CTE
        + f""",
    wedges AS (
      SELECT src, dst,
             1.0 + ((src * 7 + dst * 13) % 8) * 0.25 AS w
      FROM edges
      UNION ALL
      SELECT node, node, 0.0 FROM nodes
    ),
    d0 AS (SELECT CAST(0 AS BIGINT) AS node, CAST(0.0 AS DOUBLE) AS dist),
    {",".join(steps)}
    SELECT node, dist FROM d{rounds} ORDER BY node
    """
    )


@register("q_sssp", oracle=_sssp_oracle(18))
def q_sssp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Single-source weighted shortest paths
    (operators/graph.shortest_paths): Bellman-Ford from node 0 over
    the planted 64-node graph with dyadic edge weights
    1 + ((7*src + 13*dst) mod 8)/4 — every realized distance is a
    fold of quarter-integer additions along its argmin path, so the
    18-round chained-CTE oracle replays each one bit-for-bit (the
    fixpoint lands at round 17; overshooting is idempotent, and the
    operator's negative-cycle certificate doubles as the fixpoint
    proof). The weighted member next to the unweighted
    q_reach_bfs_sql."""
    from oakstore_spark.operators.graph import shortest_paths

    w = F.lit(1.0) + (
        (F.col("src") * 7 + F.col("dst") * 13) % 8
    ).cast("double") * F.lit(0.25)
    edges = _planted_edges(spark).select("src", "dst", w.alias("weight"))
    return shortest_paths(
        edges, source=0, n_rounds=18, detect_negative_cycle=True
    ).orderBy("node")
