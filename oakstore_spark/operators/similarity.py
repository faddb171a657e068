"""Similarity search over embedding columns (array<float>).

- brute-force cosine top-k: the exactness baseline. One broadcast of the
  query set, one pass over the corpus, per-query top-k via window — at
  100 TB this is the correct plan when the query set is small (the corpus
  is scanned once, never shuffled; only (n_queries x k) rows survive).
- LSH-bucketed ANN: random-hyperplane signatures, multi-table banding.
  The corpus is signed once (JVM expressions over a broadcast hyperplane
  matrix), candidates come from equi-joins on small integer bucket keys,
  exact cosine re-ranks only the candidates. Sub-linear candidate volume
  at the cost of bounded recall loss — the scale path when the query set
  is itself large.

No Python UDFs anywhere: dot products over a few dozen hyperplanes are
`aggregate`/`zip_with` expressions the codegen vectorizes fine.
"""

from __future__ import annotations

import math
import random

from pyspark.sql import DataFrame
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from oakstore_spark.functions.vectors import cosine_similarity


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Exact top-k by cosine for each query vector.

    Output: (query_id, vec_id, sim, rank<=k); self-matches (same id)
    excluded. Deterministic tie-break on (sim desc, vec_id asc).
    """
    q = F.broadcast(
        queries.select(
            F.col(query_id_col).alias("_qid"), F.col(vec_col).alias("_qvec")
        )
    )
    scored = (
        corpus.select(F.col(id_col), F.col(vec_col))
        .crossJoin(q)
        .filter(F.col(id_col) != F.col("_qid"))
        .withColumn("sim", cosine_similarity(F.col(vec_col), F.col("_qvec")))
    )
    w = W.partitionBy("_qid").orderBy(F.col("sim").desc(), F.col(id_col))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rank") <= k)
        .select(
            F.col("_qid").alias(query_id_col),
            id_col,
            "sim",
            "rank",
        )
    )


def _hyperplanes(dim: int, n_planes: int, seed: int) -> list[list[float]]:
    """Deterministic Gaussian hyperplanes (Box-Muller on seeded PRNG —
    no numpy dependency in the operator path)."""
    rng = random.Random(seed)
    planes = []
    for _ in range(n_planes):
        plane = []
        for _ in range((dim + 1) // 2):
            u1, u2 = max(rng.random(), 1e-12), rng.random()
            r = math.sqrt(-2.0 * math.log(u1))
            plane.append(r * math.cos(2 * math.pi * u2))
            plane.append(r * math.sin(2 * math.pi * u2))
        planes.append(plane[:dim])
    return planes


def signed_buckets(
    df: DataFrame,
    vec_col: str,
    dim: int,
    n_tables: int,
    bits_per_table: int,
    seed: int = 42,
) -> DataFrame:
    """Add ``_bucket_<t>`` integer columns: sign-bit signatures under
    ``n_tables`` independent hyperplane sets (JVM-only arithmetic)."""
    planes = _hyperplanes(dim, n_tables * bits_per_table, seed)
    out = df
    for t in range(n_tables):
        bits = []
        for b in range(bits_per_table):
            plane = planes[t * bits_per_table + b]
            dot = F.aggregate(
                F.zip_with(
                    F.col(vec_col).cast("array<double>"),
                    F.array(*[F.lit(x) for x in plane]),
                    lambda x, y: x * y,
                ),
                F.lit(0.0),
                lambda acc, x: acc + x,
            )
            bits.append(F.when(dot >= 0, F.lit(1 << b)).otherwise(F.lit(0)))
        key = bits[0]
        for bit in bits[1:]:
            key = key + bit
        out = out.withColumn(f"_bucket_{t}", key.cast("int"))
    return out


def ann_cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int,
    dim: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    n_tables: int = 12,
    bits_per_table: int = 6,
    seed: int = 42,
) -> DataFrame:
    """Approximate top-k: candidates share an LSH bucket with the query
    in >= 1 of ``n_tables`` tables; exact cosine re-ranks candidates.

    Recall at cos~0.9 with 12x6 defaults is >0.99; tune
    (n_tables, bits_per_table) for the corpus density.
    """
    c_signed = signed_buckets(corpus, vec_col, dim, n_tables, bits_per_table, seed)
    q_signed = signed_buckets(
        queries.select(F.col(query_id_col).alias("_qid"), F.col(vec_col).alias("_qvec")),
        "_qvec",
        dim,
        n_tables,
        bits_per_table,
        seed,
    )

    # long-form (table_id, bucket) for both sides -> one equi-join
    def melt(df: DataFrame, keep: list[str]) -> DataFrame:
        return df.select(
            *keep,
            F.explode(
                F.array(
                    *[
                        F.struct(F.lit(t).alias("tbl"), F.col(f"_bucket_{t}").alias("bkt"))
                        for t in range(n_tables)
                    ]
                )
            ).alias("tb"),
        ).select(*keep, "tb.tbl", "tb.bkt")

    c_long = melt(c_signed, [id_col, vec_col])
    q_long = melt(q_signed, ["_qid", "_qvec"])

    cand = (
        c_long.join(F.broadcast(q_long), ["tbl", "bkt"])
        .filter(F.col(id_col) != F.col("_qid"))
        .select(id_col, vec_col, "_qid", "_qvec")
        .distinct()
    )
    scored = cand.withColumn("sim", cosine_similarity(F.col(vec_col), F.col("_qvec")))
    w = W.partitionBy("_qid").orderBy(F.col("sim").desc(), F.col(id_col))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rank") <= k)
        .select(F.col("_qid").alias(query_id_col), id_col, "sim", "rank")
    )


def embedding_near_dup_pairs(
    corpus: DataFrame,
    threshold: float,
    dim: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_tables: int = 12,
    bits_per_table: int = 6,
    seed: int = 42,
) -> DataFrame:
    """All pairs with cosine >= threshold, via self-join on LSH buckets +
    exact verify (the embedding-space analogue of minhash_lsh_pairs)."""
    signed = signed_buckets(corpus, vec_col, dim, n_tables, bits_per_table, seed)
    long = signed.select(
        id_col,
        vec_col,
        F.explode(
            F.array(
                *[
                    F.struct(F.lit(t).alias("tbl"), F.col(f"_bucket_{t}").alias("bkt"))
                    for t in range(n_tables)
                ]
            )
        ).alias("tb"),
    ).select(id_col, vec_col, "tb.tbl", "tb.bkt")

    l, r = long.alias("l"), long.alias("r")
    cand = (
        l.join(
            r,
            (F.col("l.tbl") == F.col("r.tbl"))
            & (F.col("l.bkt") == F.col("r.bkt"))
            & (F.col(f"l.{id_col}") < F.col(f"r.{id_col}")),
        )
        .select(
            F.col(f"l.{id_col}").alias("id_a"),
            F.col(f"r.{id_col}").alias("id_b"),
            F.col(f"l.{vec_col}").alias("vec_a"),
            F.col(f"r.{vec_col}").alias("vec_b"),
        )
        .distinct()
    )
    return (
        cand.withColumn("sim", cosine_similarity("vec_a", "vec_b"))
        .filter(F.col("sim") >= threshold)
        .select("id_a", "id_b", "sim")
    )
