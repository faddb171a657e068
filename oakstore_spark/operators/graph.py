"""Link-graph analytics for web-corpus curation: PageRank (Page &
Brin 1998 — public) and degree statistics over an edge relation. A
crawl pipeline uses PageRank as a document-quality prior (seed lists,
crawl frontier ordering, per-domain authority) next to the text-level
signals in ``operators/text.py``.

Spark shape (the classic iterative-DataFrame pattern, done carefully):

- contributions are ONE join per iteration, edges PRE-PARTITIONED and
  persisted on ``src`` so every iteration's join reuses the same
  exchange — the per-round cost is one shuffle (contribs into the
  ``groupBy(dst)``), not three;
- dangling-node mass (nodes with no out-edges) is folded back in via a
  broadcast 1-row aggregate — NO driver collect in the loop;
- each iteration ``localCheckpoint``s the rank relation: lineage stays
  O(1) deep, so plan compile time and task-retry cost don't grow with
  the iteration count (the standard fix for iterative DataFrames).

Exactness contract (how the oracle can hash-match a float algorithm):
with damping a dyadic rational (1/2), N a power of two, and every
outdegree a power of two, every intermediate rank is a dyadic rational
far inside double precision — addition order cannot change the sum, so
Spark's shuffled aggregation and a serial SQL replay agree bitwise.
Arbitrary damping/graphs still work; only bit-exact replay needs the
dyadic configuration.

Reference parity: the reference (store.py:1-267) has no graph surface;
EXT operator mandated by the LLM-pipeline brief.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel


def degree_stats(
    edges: DataFrame, src_col: str = "src", dst_col: str = "dst"
) -> DataFrame:
    """Per-node (out_degree, in_degree) via two partial-agg shuffles
    and one outer join; nodes appearing only on one side get 0."""
    out_deg = edges.groupBy(F.col(src_col).alias("node")).agg(
        F.count(F.lit(1)).alias("out_degree")
    )
    in_deg = edges.groupBy(F.col(dst_col).alias("node")).agg(
        F.count(F.lit(1)).alias("in_degree")
    )
    return (
        out_deg.join(in_deg, "node", "full")
        .select(
            "node",
            F.coalesce("out_degree", F.lit(0)).alias("out_degree"),
            F.coalesce("in_degree", F.lit(0)).alias("in_degree"),
        )
    )


def pagerank(
    edges: DataFrame,
    n_iterations: int = 10,
    damping: float = 0.5,
    src_col: str = "src",
    dst_col: str = "dst",
) -> DataFrame:
    """PageRank with dangling-mass redistribution, returning
    (node, rank) after exactly ``n_iterations`` synchronous updates:

        PR'(v) = (1-d)/N + d * sum_{u->v} PR(u)/outdeg(u)
                         + d * (sum of PR over dangling nodes)/N

    Total mass stays exactly 1 each round. Deterministic for a fixed
    iteration count (no convergence test — replayable by the oracle)."""
    e = edges.select(
        F.col(src_col).alias("src"), F.col(dst_col).alias("dst")
    )
    nodes = (
        e.select(F.col("src").alias("node"))
        .unionByName(e.select(F.col("dst").alias("node")))
        .distinct()
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    n = nodes.count()  # one small job; also materializes the persist
    out_deg = e.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
    # partition edges+degree once on src; every iteration's join reuses it
    linked = (
        e.join(out_deg, "src")
        .repartition("src")
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    linked.count()

    d = float(damping)
    base = (1.0 - d) / n
    ranks = nodes.select("node", (F.lit(1.0) / n).alias("rank"))
    has_out = out_deg.select(F.col("src").alias("node"))
    for _ in range(n_iterations):
        contribs = (
            linked.join(
                ranks.withColumnRenamed("node", "src"), "src"
            )
            .groupBy(F.col("dst").alias("node"))
            .agg(F.sum(F.col("rank") / F.col("deg")).alias("contrib"))
        )
        dangling = (
            ranks.join(has_out, "node", "left_anti")
            .agg(F.coalesce(F.sum("rank"), F.lit(0.0)).alias("mass"))
        )
        ranks = (
            nodes.join(contribs, "node", "left")
            .crossJoin(F.broadcast(dangling))
            .select(
                "node",
                (
                    F.lit(base)
                    + F.lit(d) * F.coalesce("contrib", F.lit(0.0))
                    + F.lit(d) * F.col("mass") / n
                ).alias("rank"),
            )
            .localCheckpoint(eager=True)
        )
    # eager checkpoints mean ranks is fully materialized — safe to drop
    # the loop-scoped persists now
    nodes.unpersist()
    linked.unpersist()
    return ranks
