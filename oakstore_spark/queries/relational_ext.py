"""Extended operator coverage: set operations, cube/grouping sets,
range/interval joins, scalar function suites (string/date/math/json/
array), approximate aggregates.

All EXT — the reference has none of these (SURVEY.md §2: evidence
/root/reference/oakstore/store.py:1-267 is the entire engine). Every
query is declarative DataFrame/SQL so Catalyst handles pushdown and
join selection; interval joins are expressed as equi-joins on derived
bucket keys (broadcast band table / time-bucket explode) so they hash-
join at 100 TB instead of falling back to nested loops.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from oakstore_spark.queries import register
from oakstore_spark.sources import register_views, table


# --- TPC-H Q6 style: tight filter + single agg (pushdown showcase) -------

@register(
    "q06_discount_revenue",
    oracle="""
    SELECT round(sum(l_extendedprice * l_discount), 2) AS revenue,
           count(*) AS n_rows
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """,
)
def q06_discount_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = table(spark, sf_dir, "lineitem")
    return (
        l.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01 00:00:00").cast("timestamp"))
            & F.col("l_discount").between(0.05, 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * F.col("l_discount")), 2).alias("revenue"),
            F.count(F.lit(1)).alias("n_rows"),
        )
    )


# --- CUBE -----------------------------------------------------------------

@register(
    "q_cube_qty",
    oracle="""
    SELECT coalesce(l_returnflag, 'ALL') AS returnflag,
           coalesce(l_linestatus, 'ALL') AS linestatus,
           round(sum(l_quantity), 2) AS sum_qty,
           count(*) AS n_rows
    FROM lineitem
    GROUP BY CUBE (l_returnflag, l_linestatus)
    """,
)
def q_cube_qty(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = table(spark, sf_dir, "lineitem")
    return (
        l.cube("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.count(F.lit(1)).alias("n_rows"),
        )
        .select(
            F.coalesce("l_returnflag", F.lit("ALL")).alias("returnflag"),
            F.coalesce("l_linestatus", F.lit("ALL")).alias("linestatus"),
            "sum_qty",
            "n_rows",
        )
    )


# --- GROUPING SETS via the SQL surface (same text runs on both engines) --

_GROUPING_SETS_SQL = """
    SELECT coalesce(l_returnflag, 'ALL') AS returnflag,
           coalesce(l_linestatus, 'ALL') AS linestatus,
           round(sum(l_extendedprice), 2) AS sum_price,
           count(*) AS n_rows
    FROM lineitem
    GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
"""


@register("q_grouping_sets_sql", oracle=_GROUPING_SETS_SQL)
def q_grouping_sets_sql(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir)
    return spark.sql(_GROUPING_SETS_SQL)


# --- set operations: INTERSECT / EXCEPT ----------------------------------

@register(
    "q_intersect_repeat_buyers",
    oracle="""
    SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1996
    INTERSECT
    SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1997
    """,
)
def q_intersect_repeat_buyers(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders")
    y96 = o.filter(F.year("o_orderdate") == 1996).select("o_custkey")
    y97 = o.filter(F.year("o_orderdate") == 1997).select("o_custkey")
    return y96.intersect(y97)


@register(
    "q_except_lapsed_buyers",
    oracle="""
    SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1996
    EXCEPT
    SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1997
    """,
)
def q_except_lapsed_buyers(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders")
    y96 = o.filter(F.year("o_orderdate") == 1996).select("o_custkey")
    y97 = o.filter(F.year("o_orderdate") == 1997).select("o_custkey")
    # subtract = EXCEPT DISTINCT (exceptAll would only cancel per-occurrence)
    return y96.subtract(y97)


# --- interval join against a broadcast band table ------------------------

_BANDS = [("budget", 0.0, 930.0), ("mid", 930.0, 970.0), ("premium", 970.0, 10_000_000.0)]


@register(
    "q_range_join_price_bands",
    oracle="""
    WITH bands(band, lo, hi) AS (
      VALUES ('budget', 0.0, 930.0), ('mid', 930.0, 970.0),
             ('premium', 970.0, 10000000.0)
    )
    SELECT band, count(*) AS n_parts, round(avg(p_retailprice), 2) AS avg_price
    FROM part JOIN bands ON p_retailprice >= lo AND p_retailprice < hi
    GROUP BY band
    """,
)
def q_range_join_price_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Non-equi (interval) join: the band table is tiny -> broadcast, so
    the range predicate evaluates map-side (BroadcastNestedLoopJoin over
    3 rows == a filter); the fact side never shuffles."""
    p = table(spark, sf_dir, "part")
    bands = spark.createDataFrame(_BANDS, ["band", "lo", "hi"])
    return (
        p.join(
            F.broadcast(bands),
            (p.p_retailprice >= F.col("lo")) & (p.p_retailprice < F.col("hi")),
        )
        .groupBy("band")
        .agg(
            F.count(F.lit(1)).alias("n_parts"),
            F.round(F.avg("p_retailprice"), 2).alias("avg_price"),
        )
    )


# --- self range-join on time (bucketed -> equi-join, no nested loop) -----

@register(
    "q_range_join_events",
    oracle="""
    SELECT a.user_id, count(*) AS n_pairs
    FROM events a JOIN events b
      ON a.user_id = b.user_id
     AND b.ts > a.ts AND b.ts <= a.ts + INTERVAL 1 MINUTE
    GROUP BY a.user_id
    """,
)
def q_range_join_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairs of same-user events within 1 minute. The naive form is an
    inequality self-join (nested loop at scale); here each left row is
    exploded into its minute bucket and the NEXT one, the join is an
    EQUI-join on (user_id, bucket) — hash-partitionable, AQE-skew-
    splittable — and the exact window predicate is the residual filter.
    A pair is matched exactly once: b's bucket equals either a's or a's+1.
    """
    e = table(spark, sf_dir, "events")
    bucket = F.floor(F.unix_micros("ts") / F.lit(60_000_000))
    a = e.select(
        F.col("user_id"),
        F.col("ts").alias("ts_a"),
        F.explode(F.array(bucket, bucket + 1)).alias("bkt"),
    )
    b = e.select(F.col("user_id"), F.col("ts").alias("ts_b"), bucket.alias("bkt"))
    return (
        a.join(b, ["user_id", "bkt"])
        .filter(
            (F.col("ts_b") > F.col("ts_a"))
            & (F.col("ts_b") <= F.col("ts_a") + F.expr("INTERVAL 1 MINUTE"))
        )
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n_pairs"))
    )


# --- JSON scalar functions ------------------------------------------------

@register(
    "q_json_props",
    oracle="""
    SELECT event_type,
           CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
           count(*) AS n_events
    FROM events
    GROUP BY event_type
    """,
)
def q_json_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "events")
    return e.groupBy("event_type").agg(
        F.sum(F.get_json_object("props", "$.k").cast("bigint")).alias("sum_k"),
        F.count(F.lit(1)).alias("n_events"),
    )


# --- array functions over embeddings -------------------------------------

@register(
    "q_array_stats",
    oracle="""
    SELECT label,
           count(*) AS n_vecs,
           CAST(max(len(embedding)) AS INT) AS max_dim,
           round(avg(sqrt(list_inner_product(CAST(embedding AS DOUBLE[]),
                                             CAST(embedding AS DOUBLE[])))), 4) AS avg_norm,
           round(avg(CAST(embedding[1] AS DOUBLE)), 4) AS avg_first
    FROM embeddings
    GROUP BY label
    """,
)
def q_array_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from oakstore_spark.functions.vectors import norm2

    e = table(spark, sf_dir, "embeddings")
    return e.groupBy("label").agg(
        F.count(F.lit(1)).alias("n_vecs"),
        F.max(F.size("embedding")).alias("max_dim"),
        F.round(F.avg(norm2("embedding")), 4).alias("avg_norm"),
        F.round(F.avg(F.element_at("embedding", 1).cast("double")), 4).alias("avg_first"),
    )


# --- string/date/math scalar suite ---------------------------------------

@register(
    "q_scalar_funcs",
    oracle="""
    SELECT CAST(year(o_orderdate) AS BIGINT) AS y,
           CAST(month(o_orderdate) AS BIGINT) AS m,
           concat(o_orderstatus, '-', substr(o_orderpriority, 1, 1)) AS grp,
           count(*) AS n,
           round(avg(sqrt(o_totalprice)), 4) AS avg_sqrt_price,
           round(sum(abs(o_totalprice - 200000.0)), 2) AS sum_abs_dev,
           CAST(max(length(o_orderpriority)) AS BIGINT) AS max_pri_len
    FROM orders
    GROUP BY 1, 2, 3
    """,
)
def q_scalar_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders")
    return (
        o.groupBy(
            F.year("o_orderdate").cast("bigint").alias("y"),
            F.month("o_orderdate").cast("bigint").alias("m"),
            F.concat(
                F.col("o_orderstatus"), F.lit("-"), F.substring("o_orderpriority", 1, 1)
            ).alias("grp"),
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.avg(F.sqrt("o_totalprice")), 4).alias("avg_sqrt_price"),
            # sum (not avg) of exact-cent deviations: the sum stays on a
            # cent boundary so round(.,2) never hits a half-tie, while an
            # avg routinely lands on x.xx5 and tie-breaks engine-specific
            F.round(F.sum(F.abs(F.col("o_totalprice") - 200000.0)), 2).alias("sum_abs_dev"),
            F.max(F.length("o_orderpriority")).cast("bigint").alias("max_pri_len"),
        )
    )


# --- approximate aggregates (HLL values are engine-specific -> rows-only;
#     the <10% relative-error bound is pinned in pytest) -------------------

@register("q_approx_distinct")
def q_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = table(spark, sf_dir, "lineitem")
    return l.agg(
        F.countDistinct("l_partkey").alias("n_exact"),
        F.approx_count_distinct("l_partkey").alias("n_approx"),
        F.round(
            F.abs(F.approx_count_distinct("l_partkey") - F.countDistinct("l_partkey"))
            / F.countDistinct("l_partkey"),
            4,
        ).alias("rel_err"),
    )


# --- TPC-H Q10 style: returned-item revenue (4-way join + top-k) ---------

@register(
    "q10_returned_revenue",
    oracle="""
    SELECT c_custkey, c_name,
           round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
           n_name
    FROM customer
      JOIN orders   ON c_custkey = o_custkey
      JOIN lineitem ON l_orderkey = o_orderkey
      JOIN nation   ON c_nationkey = n_nationkey
    WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1996-07-01 00:00:00'
      AND l_returnflag = 'R'
    GROUP BY c_custkey, c_name, n_name
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """,
)
def q10_returned_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-07-01 00:00:00").cast("timestamp"))
    )
    l = table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    n = table(spark, sf_dir, "nation")
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue"))
        .select("c_custkey", "c_name", "revenue", "n_name")
        .orderBy(F.col("revenue").desc(), "c_custkey")
        .limit(20)
    )


# --- TPC-H Q13 style: LEFT OUTER join + double aggregation ---------------

@register(
    "q13_order_count_dist",
    oracle="""
    SELECT c_count, count(*) AS custdist
    FROM (
      SELECT c_custkey, count(o_orderkey) AS c_count
      FROM customer LEFT OUTER JOIN orders
        ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
      GROUP BY c_custkey
    )
    GROUP BY c_count
    """,
)
def q13_order_count_dist(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders")
    per_cust = (
        c.join(
            o,
            (c.c_custkey == o.o_custkey) & (o.o_orderpriority != "1-URGENT"),
            "left_outer",
        )
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))  # non-null count
    )
    return per_cust.groupBy("c_count").agg(F.count(F.lit(1)).alias("custdist"))


# --- TPC-H Q18 style: HAVING over a join aggregate + top-k ---------------

@register(
    "q18_large_orders",
    oracle="""
    SELECT c_custkey, o_orderkey, round(sum(l_quantity), 2) AS total_qty
    FROM orders
      JOIN lineitem ON o_orderkey = l_orderkey
      JOIN customer ON c_custkey = o_custkey
    GROUP BY c_custkey, o_orderkey
    HAVING sum(l_quantity) > 300
    ORDER BY total_qty DESC, o_orderkey
    LIMIT 100
    """,
)
def q18_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders")
    l = table(spark, sf_dir, "lineitem")
    c = table(spark, sf_dir, "customer")
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("c_custkey", "o_orderkey")
        .agg(F.round(F.sum("l_quantity"), 2).alias("total_qty"))
        .filter(F.col("total_qty") > 300)  # HAVING
        .orderBy(F.col("total_qty").desc(), "o_orderkey")
        .limit(100)
    )


# --- FULL OUTER join: year-over-year customer activity -------------------

@register(
    "q_full_outer_yoy",
    oracle="""
    SELECT coalesce(a.o_custkey, b.o_custkey) AS custkey,
           coalesce(n96, 0) AS n_1996,
           coalesce(n97, 0) AS n_1997
    FROM (SELECT o_custkey, count(*) AS n96 FROM orders
          WHERE year(o_orderdate) = 1996 GROUP BY 1) a
    FULL OUTER JOIN
         (SELECT o_custkey, count(*) AS n97 FROM orders
          WHERE year(o_orderdate) = 1997 GROUP BY 1) b
      ON a.o_custkey = b.o_custkey
    """,
)
def q_full_outer_yoy(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders")
    a = (
        o.filter(F.year("o_orderdate") == 1996)
        .groupBy(F.col("o_custkey").alias("ck96"))
        .agg(F.count(F.lit(1)).alias("n96"))
    )
    b = (
        o.filter(F.year("o_orderdate") == 1997)
        .groupBy(F.col("o_custkey").alias("ck97"))
        .agg(F.count(F.lit(1)).alias("n97"))
    )
    return a.join(b, a.ck96 == b.ck97, "full_outer").select(
        F.coalesce("ck96", "ck97").alias("custkey"),
        F.coalesce("n96", F.lit(0)).alias("n_1996"),
        F.coalesce("n97", F.lit(0)).alias("n_1997"),
    )


# --- exact percentiles (interpolated, matches quantile_cont) -------------

@register(
    "q_percentiles",
    oracle="""
    SELECT l_returnflag,
           round(quantile_cont(l_extendedprice, 0.5), 4) AS p50,
           round(quantile_cont(l_extendedprice, 0.9), 4) AS p90,
           round(quantile_cont(l_extendedprice, 0.99), 4) AS p99
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def q_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT percentiles (Spark `percentile` = linear interpolation =
    DuckDB quantile_cont). At 100 TB switch to approx_percentile and a
    rows-only check — exact percentile needs a full sort per group."""
    l = table(spark, sf_dir, "lineitem")
    # one percentile aggregate with an array of fractions: the per-group
    # value buffer is built and sorted ONCE instead of once per fraction
    ps = F.percentile(
        "l_extendedprice", F.array(F.lit(0.5), F.lit(0.9), F.lit(0.99))
    )
    return (
        l.groupBy("l_returnflag")
        .agg(ps.alias("_ps"))
        .select(
            "l_returnflag",
            F.round(F.col("_ps")[0], 4).alias("p50"),
            F.round(F.col("_ps")[1], 4).alias("p90"),
            F.round(F.col("_ps")[2], 4).alias("p99"),
        )
    )


@register("q_approx_percentiles")
def q_approx_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale-safe sibling of ``q_percentiles``: ``approx_percentile``
    (KLL-style sketch, mergeable map-side partials, bounded memory per
    group) instead of the exact per-group full sort. Rows-only driver
    check (sketch outputs are engine-specific); the pytest bound pins
    relative error vs the exact percentiles (pattern of
    q_approx_distinct)."""
    l = table(spark, sf_dir, "lineitem")
    ps = F.percentile_approx(
        "l_extendedprice",
        F.array(F.lit(0.5), F.lit(0.9), F.lit(0.99)),
        F.lit(10_000),
    )
    return (
        l.groupBy("l_returnflag")
        .agg(ps.alias("_ps"))
        .select(
            "l_returnflag",
            F.col("_ps")[0].alias("p50"),
            F.col("_ps")[1].alias("p90"),
            F.col("_ps")[2].alias("p99"),
        )
    )


# --- statistical aggregates ----------------------------------------------

@register(
    "q_stats_agg",
    oracle="""
    SELECT l_returnflag,
           round(stddev_samp(l_extendedprice), 2) AS sd_price,
           round(var_samp(l_discount), 6) AS var_disc,
           round(corr(l_quantity, l_extendedprice), 6) AS corr_qty_price,
           round(covar_samp(l_quantity, l_extendedprice), 2) AS cov_qty_price
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def q_stats_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = table(spark, sf_dir, "lineitem")
    return l.groupBy("l_returnflag").agg(
        F.round(F.stddev_samp("l_extendedprice"), 2).alias("sd_price"),
        F.round(F.var_samp("l_discount"), 6).alias("var_disc"),
        F.round(F.corr("l_quantity", "l_extendedprice"), 6).alias("corr_qty_price"),
        F.round(F.covar_samp("l_quantity", "l_extendedprice"), 2).alias("cov_qty_price"),
    )


# --- LATERAL correlated subquery (same text runs on both engines) --------

_LATERAL_SQL = """
    SELECT n_name, c_name, round(c_acctbal, 2) AS acctbal
    FROM nation, LATERAL (
      SELECT c_name, c_acctbal
      FROM customer
      WHERE c_nationkey = n_nationkey
      ORDER BY c_acctbal DESC, c_name
      LIMIT 2
    )
"""


@register("q_lateral_top2_customers", oracle=_LATERAL_SQL)
def q_lateral_top2_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated LATERAL subquery (top-2 customers per nation by
    balance, ties broken by name). Spark decorrelates this into a
    ranked-window plan under the hood — the SQL-surface feature matters
    for porting existing analytics, and the one SQL text runs verbatim
    on both engines."""
    register_views(spark, sf_dir)
    return spark.sql(_LATERAL_SQL)


# --- VARIANT semi-structured type (Spark 4) -------------------------------

@register(
    "q_variant_props",
    oracle="""
    SELECT event_type,
           CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT))
                AS BIGINT) AS sum_k,
           CAST(max(CAST(json_extract_string(props, '$.k') AS BIGINT))
                AS BIGINT) AS max_k,
           CAST(count(CASE WHEN json_extract_string(props, '$.missing')
                           IS NOT NULL THEN 1 END) AS BIGINT) AS n_missing
    FROM events
    GROUP BY event_type
    """,
)
def q_variant_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured JSON through Spark 4's VARIANT type: parse once
    into the binary variant encoding, then typed path extraction
    (variant_get / try_variant_get) — the engine-native path for
    schema-on-read columns, vs the string re-parse of
    get_json_object in q_json_props. Absent paths yield NULL through
    try_variant_get, never an error."""
    e = table(spark, sf_dir, "events").withColumn(
        "v", F.parse_json("props")
    )
    return e.groupBy("event_type").agg(
        F.sum(F.variant_get("v", "$.k", "bigint")).cast("bigint").alias("sum_k"),
        F.max(F.variant_get("v", "$.k", "bigint")).cast("bigint").alias("max_k"),
        F.count(F.try_variant_get("v", "$.missing", "string"))
        .cast("bigint")
        .alias("n_missing"),
    )


# --- funnel analysis (ordered event-sequence progression) -----------------

@register(
    "q_funnel_view_click_purchase",
    oracle="""
    WITH v AS (
      SELECT user_id, min(ts) AS t1 FROM events
      WHERE event_type = 'view' GROUP BY 1
    ), c AS (
      SELECT e.user_id, min(e.ts) AS t2
      FROM events e JOIN v ON e.user_id = v.user_id AND e.ts > v.t1
      WHERE e.event_type = 'click' GROUP BY 1
    ), p AS (
      SELECT e.user_id, min(e.ts) AS t3
      FROM events e JOIN c ON e.user_id = c.user_id AND e.ts > c.t2
      WHERE e.event_type = 'purchase' GROUP BY 1
    )
    SELECT (SELECT count(*) FROM v) AS n_view,
           (SELECT count(*) FROM c) AS n_view_click,
           (SELECT count(*) FROM p) AS n_full_funnel
    """,
)
def q_funnel_view_click_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered funnel: users who viewed, then clicked AFTER their first
    view, then purchased AFTER that first qualifying click. Each stage
    is one aggregation + one join on user_id — at scale the per-stage
    relations shrink monotonically, and every join key is the same
    (user_id), so AQE reuses the partitioning stage to stage."""
    e = table(spark, sf_dir, "events")
    v = (
        e.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t1"))
    )
    c = (
        e.filter(F.col("event_type") == "click")
        .join(v, "user_id")
        .filter(F.col("ts") > F.col("t1"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t2"))
    )
    p = (
        e.filter(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .filter(F.col("ts") > F.col("t2"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t3"))
    )
    return (
        v.agg(F.count(F.lit(1)).alias("n_view"))
        .crossJoin(c.agg(F.count(F.lit(1)).alias("n_view_click")))
        .crossJoin(p.agg(F.count(F.lit(1)).alias("n_full_funnel")))
    )


# --- equal-width histogram ------------------------------------------------

@register(
    "q_histogram_prices",
    oracle="""
    WITH bounds AS (
      SELECT min(o_totalprice) AS lo, max(o_totalprice) AS hi FROM orders
    )
    SELECT CAST(least(floor((o_totalprice - lo) / ((hi - lo) / 10)), 9)
                AS BIGINT) AS bucket,
           count(*) AS n_orders,
           round(min(o_totalprice), 2) AS bucket_min,
           round(max(o_totalprice), 2) AS bucket_max
    FROM orders, bounds
    GROUP BY 1
    """,
)
def q_histogram_prices(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equal-width 10-bin histogram: global min/max in one tiny
    aggregate (broadcast as a 1-row cross join), bucket index as pure
    arithmetic (identical IEEE ops in both engines — no width_bucket
    dialect dependence), then a 10-group aggregation. Two scans of
    orders; at 100 TB the bounds pass is metadata-cheap (min/max can
    come from parquet footers)."""
    o = table(spark, sf_dir, "orders")
    bounds = o.agg(
        F.min("o_totalprice").alias("lo"), F.max("o_totalprice").alias("hi")
    )
    return (
        o.crossJoin(F.broadcast(bounds))
        .withColumn(
            "bucket",
            F.least(
                F.floor(
                    (F.col("o_totalprice") - F.col("lo"))
                    / ((F.col("hi") - F.col("lo")) / 10)
                ),
                F.lit(9),
            ).cast("bigint"),
        )
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.min("o_totalprice"), 2).alias("bucket_min"),
            F.round(F.max("o_totalprice"), 2).alias("bucket_max"),
        )
    )


@register(
    "q_compound_growth_sql",
    oracle="""
    WITH RECURSIVE y AS (
      SELECT CAST(year(o_orderdate) AS INT) AS yr,
             CAST(sum(o_totalprice) AS DOUBLE) AS rev,
             row_number() OVER (ORDER BY CAST(year(o_orderdate) AS INT))
               AS rn
      FROM orders GROUP BY 1
    ), idx(rn, yr, rev, i) AS (
      SELECT rn, yr, rev, CAST(100.0 AS DOUBLE) FROM y WHERE rn = 1
      UNION ALL
      SELECT y.rn, y.yr, y.rev, idx.i * (y.rev / idx.rev)
      FROM idx JOIN y ON y.rn = idx.rn + 1
    )
    SELECT yr, round(rev, 2) AS rev, round(i, 4) AS comp_index FROM idx
    """,
)
def q_compound_growth_sql(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recursive CTE (new SQL surface in Spark 4): a compounded yearly
    revenue index I_1 = 100, I_n = I_{n-1} * (rev_n / rev_{n-1}) — the
    recurrence is genuinely sequential (like EWMA), here expressed in
    PURE SQL with ``WITH RECURSIVE`` and checked against DuckDB running
    the SAME recursion. Both engines multiply identical doubles in
    identical order, so values agree exactly.

    Scale note: Spark executes one micro-job per recursion step, so
    recursion must be over a SMALL derived relation with bounded depth
    — here the per-year aggregate (computed once, cached, depth ~= #
    years), never the fact table. The 80-month variant measured 16 s
    against a cached relation purely on per-iteration scheduling; for
    long chains use grouped_ewma-style mapInPandas carry instead
    (operators/timeseries.py)."""
    from pyspark.sql import Window

    o = table(spark, sf_dir, "orders")
    y = (
        o.groupBy(F.year("o_orderdate").cast("int").alias("yr"))
        .agg(F.sum("o_totalprice").cast("double").alias("rev"))
        .withColumn("rn", F.row_number().over(Window.orderBy("yr")))
    )
    # the recursion re-reads this relation once per step; the returned
    # DataFrame is lazy, so the cache must outlive this function (a
    # ~7-row cached relation; dropped with the temp view on reuse)
    y.cache().count()
    y.createOrReplaceTempView("_oak_yearly_rev")
    return spark.sql(
        """
        WITH RECURSIVE idx(rn, yr, rev, i) AS (
          SELECT rn, yr, rev, CAST(100.0 AS DOUBLE)
          FROM _oak_yearly_rev WHERE rn = 1
          UNION ALL
          SELECT y.rn, y.yr, y.rev, idx.i * (y.rev / idx.rev)
          FROM idx JOIN _oak_yearly_rev y ON y.rn = idx.rn + 1
        )
        SELECT yr, round(rev, 2) AS rev, round(i, 4) AS comp_index
        FROM idx
        """
    )


@register("q_hll_mergeable_sketches")  # Datasketches binary: engine-
# specific, no DuckDB oracle; merge-vs-direct equality + error bound
# pinned in tests/test_plans.py
def q_hll_mergeable_sketches(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RE-AGGREGATABLE distinct counting (the pattern that makes rollups
    and continuous aggregates mergeable at 100 TB): per-event-type HLL
    sketches of user_id (``hll_sketch_agg``), estimated per group, then
    UNIONED into one corpus-wide sketch (``hll_union_agg``) WITHOUT
    touching the raw data again — pre-aggregated shards/days/partitions
    merge in O(sketch bytes). HLL register-max merging is
    order-independent, so the merged estimate is deterministic and
    exactly equals a direct global sketch (pinned in pytest).
    approx_count_distinct (q_approx_distinct) gives only a scalar —
    sketches are the storable, mergeable form."""
    e = table(spark, sf_dir, "events")
    per_type = e.groupBy("event_type").agg(
        F.hll_sketch_agg("user_id", 12).alias("sk")
    )
    groups = per_type.select(
        "event_type",
        F.hll_sketch_estimate("sk").cast("bigint").alias("approx_users"),
    )
    merged = per_type.agg(
        F.hll_sketch_estimate(F.hll_union_agg("sk")).cast("bigint").alias(
            "approx_users"
        )
    ).select(F.lit("ALL").alias("event_type"), "approx_users")
    return groups.unionByName(merged)


@register(
    "q_fuzzy_name_match",
    oracle="""
    WITH names AS (
      SELECT p_name, split_part(p_name, ' ', 2) AS blk,
             count(*) AS n_rows
      FROM part GROUP BY 1, 2
    ), pairs AS (
      SELECT a.blk, levenshtein(a.p_name, b.p_name) AS d,
             a.n_rows * b.n_rows AS row_pairs
      FROM names a JOIN names b
        ON a.blk = b.blk AND a.p_name < b.p_name
    )
    SELECT blk,
           count(*) AS n_cand_pairs,
           CAST(sum(CASE WHEN d <= 2 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_fuzzy_pairs,
           CAST(sum(CASE WHEN d <= 2 THEN row_pairs ELSE 0 END) AS BIGINT)
             AS n_fuzzy_row_pairs,
           CAST(min(d) AS INT) AS min_dist
    FROM pairs GROUP BY blk
    """,
)
def q_fuzzy_name_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Entity resolution by BLOCKED fuzzy matching. Two scale levers:
    (1) the candidate space is DISTINCT names with their multiplicities
    (one groupBy first) — raw rows repeat entity names heavily, so
    pairing rows is quadratic in CORPUS size while pairing distinct
    names is quadratic only in VOCABULARY (the row-level match count is
    recovered exactly as the product of multiplicities: 19s -> 0.6s at
    sf0.1); (2) names pair only within a BLOCK (last token) via an
    equi-join — an unblocked levenshtein self-join has no join key at
    all. Same skew story as LSH buckets: a hot block is a hot key."""
    names = (
        table(spark, sf_dir, "part")
        .groupBy(
            F.col("p_name"),
            F.split_part(F.col("p_name"), F.lit(" "), F.lit(2)).alias("blk"),
        )
        .agg(F.count(F.lit(1)).alias("n_rows"))
    )
    a = names.select("blk", F.col("p_name").alias("na"), F.col("n_rows").alias("ra"))
    b = names.select("blk", F.col("p_name").alias("nb"), F.col("n_rows").alias("rb"))
    pairs = (
        a.join(b, "blk")
        .where(F.col("na") < F.col("nb"))
        .select(
            "blk",
            F.levenshtein("na", "nb").alias("d"),
            (F.col("ra") * F.col("rb")).alias("row_pairs"),
        )
    )
    return pairs.groupBy("blk").agg(
        F.count(F.lit(1)).alias("n_cand_pairs"),
        F.sum(F.when(F.col("d") <= 2, 1).otherwise(0))
        .cast("bigint")
        .alias("n_fuzzy_pairs"),
        F.sum(F.when(F.col("d") <= 2, F.col("row_pairs")).otherwise(0))
        .cast("bigint")
        .alias("n_fuzzy_row_pairs"),
        F.min("d").cast("int").alias("min_dist"),
    )


@register(
    "q_higher_moments",
    oracle="""
    WITH m AS (
      SELECT l_returnflag,
             avg(l_discount) AS mu,
             avg(l_discount * l_discount) AS m2r,
             avg(l_discount * l_discount * l_discount) AS m3r,
             avg(l_discount * l_discount * l_discount * l_discount) AS m4r,
             bool_or(l_discount > 0.09) AS any_deep_discount,
             bool_and(l_quantity < 100) AS all_qty_small
      FROM lineitem GROUP BY l_returnflag
    )
    SELECT l_returnflag,
           round((m3r - 3 * mu * m2r + 2 * mu * mu * mu)
                 / pow(m2r - mu * mu, 1.5), 4) AS skew,
           round((m4r - 4 * mu * m3r + 6 * mu * mu * m2r
                  - 3 * mu * mu * mu * mu)
                 / pow(m2r - mu * mu, 2) - 3, 4) AS kurt,
           any_deep_discount, all_qty_small
    FROM m
    """,
)
def q_higher_moments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Higher-moment + boolean aggregates: Spark's skewness/kurtosis are
    POPULATION (g1, excess g2) statistics, DuckDB's are sample
    bias-corrected — so the oracle recomputes the population forms from
    raw moment algebra (E[x^k] expansions), which pins the exact
    formula, not just a number. bool_or/bool_and cover the boolean
    aggregate family. All partial-aggregable; one hash agg."""
    l = table(spark, sf_dir, "lineitem")
    return l.groupBy("l_returnflag").agg(
        F.round(F.skewness("l_discount"), 4).alias("skew"),
        F.round(F.kurtosis("l_discount"), 4).alias("kurt"),
        F.bool_or(F.col("l_discount") > 0.09).alias("any_deep_discount"),
        F.bool_and(F.col("l_quantity") < 100).alias("all_qty_small"),
    )


@register("q_theta_audience_overlap")
def q_theta_audience_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audience overlap via THETA sketches — the sketch family that
    supports full SET ALGEBRA (union/intersection/difference), which
    HLL cannot: per-event-type distinct-user sketches are tiny,
    mergeable, storable aggregates, and "users who did A and B" is
    sketch intersection instead of a corpus-wide distinct self-join.
    The deployment pattern at 100 TB: sketch per (type, day) partition
    once, answer any boolean audience combination later without
    touching raw data. Rows-only (sketch estimates are approximate);
    the estimate-vs-exact error bound is pinned in
    tests/test_llm_ops.py::test_theta_overlap_error_bounded."""
    e = table(spark, sf_dir, "events")
    sk = e.groupBy("event_type").agg(
        F.theta_sketch_agg("user_id").alias("sk"),
        F.countDistinct("user_id").alias("exact_distinct"),
    )
    v = sk.where(F.col("event_type") == "view").select(
        F.col("sk").alias("sk_a"), F.col("exact_distinct").alias("n_a")
    )
    p = sk.where(F.col("event_type") == "purchase").select(
        F.col("sk").alias("sk_b"), F.col("exact_distinct").alias("n_b")
    )
    both = v.crossJoin(p).select(
        F.lit("view∩purchase").alias("audience"),
        F.round(
            F.theta_sketch_estimate(F.theta_intersection("sk_a", "sk_b"))
        ).cast("bigint").alias("est_users"),
        "n_a",
        "n_b",
    )
    return both


@register("q_kll_mergeable_quantiles")
def q_kll_mergeable_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STORABLE, re-aggregatable quantiles via DataSketches KLL (the
    quantile analogue of q_hll_mergeable_sketches): build one KLL
    sketch per return flag (a bounded-memory, map-side-combinable
    aggregate you would persist per partition/day), then fold the group
    sketches into a GLOBAL sketch with the binary merge inside a
    higher-order reduce — no second pass over the data — and read
    global quantiles off the merged sketch. This is the 100 TB quantile
    deployment shape: sketch once per partition, answer later quantile
    queries (any combination of partitions) from merges alone.
    Rows-only (sketch internals are randomized/engine-specific); the
    merged-vs-exact error bound is pinned in
    tests/test_llm_ops.py::test_kll_merged_quantiles_error_bounded."""
    l = table(spark, sf_dir, "lineitem")
    per_flag = l.groupBy("l_returnflag").agg(
        F.kll_sketch_agg_double("l_extendedprice", F.lit(2048)).alias("sk")
    )
    arr = per_flag.agg(F.collect_list("sk").alias("arr"))
    merged = F.reduce(
        F.expr("slice(arr, 2, size(arr) - 1)"),
        F.col("arr")[0],
        lambda acc, x: F.kll_sketch_merge_double(acc, x),
    )
    return arr.select(
        F.size("arr").alias("n_sketches"),
        F.round(F.kll_sketch_get_quantile_double(merged, F.lit(0.5)), 2)
          .alias("p50"),
        F.round(F.kll_sketch_get_quantile_double(merged, F.lit(0.9)), 2)
          .alias("p90"),
        F.kll_sketch_get_n_double(merged).alias("n_items"),
    )


@register(
    "q_bitmap_exact_distinct",
    oracle="""
    SELECT event_type, count(DISTINCT user_id) AS n_distinct FROM events
    GROUP BY event_type
    UNION ALL
    SELECT '__all__' AS event_type, count(DISTINCT user_id) FROM events
    """,
)
def q_bitmap_exact_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT distinct counting that is also MERGEABLE: bucketed roaring-
    style bitmaps (bitmap_construct_agg over bit positions, one bitmap
    per 32k-id bucket) count distinct users per event type, and the
    GLOBAL distinct count comes from OR-merging the stored per-type
    bitmaps — no second scan, no approximation. This is the middle
    ground between countDistinct (exact, but partials can't be reused)
    and HLL/theta (mergeable, but approximate): store per-partition
    bitmaps once, answer any union's exact distinct later. Fully
    oracle-checked because, unlike sketches, the answer is exact."""
    e = table(spark, sf_dir, "events")
    b = e.select(
        "event_type",
        F.bitmap_bucket_number("user_id").alias("bkt"),
        F.bitmap_bit_position("user_id").alias("pos"),
    )
    per_bucket = b.groupBy("event_type", "bkt").agg(
        F.bitmap_construct_agg("pos").alias("bm")
    )
    per_type = per_bucket.groupBy("event_type").agg(
        F.sum(F.bitmap_count("bm")).alias("n_distinct")
    )
    merged = (
        per_bucket.groupBy("bkt")
        .agg(F.bitmap_or_agg("bm").alias("bm"))
        .agg(F.sum(F.bitmap_count("bm")).alias("n_distinct"))
        .select(F.lit("__all__").alias("event_type"), "n_distinct")
    )
    return per_type.unionByName(merged)


@register(
    "q_entity_clusters",
    oracle="""
    WITH RECURSIVE names AS MATERIALIZED (
      SELECT p_name,
             split_part(p_name, ' ', 2) AS blk,
             CAST(('0x' || substr(md5(p_name), 1, 15)) AS BIGINT) AS hid,
             count(*) AS n_rows
      FROM part GROUP BY 1, 2, 3
    ), pr AS MATERIALIZED (
      SELECT a.hid AS id_a, b.hid AS id_b
      FROM names a JOIN names b
        ON a.blk = b.blk AND a.p_name < b.p_name
      WHERE levenshtein(a.p_name, b.p_name) <= 2
    ), edges AS MATERIALIZED (
      SELECT id_a AS src, id_b AS dst FROM pr
      UNION
      SELECT id_b, id_a FROM pr
    ), reach(id, root) AS (
      SELECT src, src FROM edges
      UNION
      SELECT e.dst, r.root FROM reach r JOIN edges e ON e.src = r.id
    ), comp AS (
      SELECT id, min(root) AS cluster_id FROM reach GROUP BY id
    )
    SELECT cluster_id,
           CAST(count(*) AS BIGINT) AS n_names,
           CAST(sum(n_rows) AS BIGINT) AS n_rows,
           min(p_name) AS rep_name
    FROM comp JOIN names ON names.hid = comp.id
    GROUP BY cluster_id
    """,
)
def q_entity_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end entity resolution: blocked fuzzy matching
    (q_fuzzy_name_match's distinct-name + levenshtein<=2 blocking)
    feeds connected components (operators/dedup.dedup_clusters — the
    same min-label machinery as document dedup), producing entity
    clusters with a representative name and the total row mass each
    entity covers. Names become stable BIGINT node ids via an md5
    prefix (deterministic in both engines, no global window needed);
    the oracle resolves the identical graph with a recursive-CTE
    closure. Composition proof: matching operator + graph operator
    reused unchanged across domains."""
    from oakstore_spark.operators.dedup import dedup_clusters

    p = table(spark, sf_dir, "part")
    names = p.groupBy(
        F.col("p_name"),
        F.split_part(F.col("p_name"), F.lit(" "), F.lit(2)).alias("blk"),
        F.conv(F.substring(F.md5("p_name"), 1, 15), 16, 10)
          .cast("bigint").alias("hid"),
    ).agg(F.count(F.lit(1)).alias("n_rows"))
    a, b = names.alias("a"), names.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.blk") == F.col("b.blk"))
            & (F.col("a.p_name") < F.col("b.p_name")),
        )
        .where(F.levenshtein("a.p_name", "b.p_name") <= 2)
        .select(F.col("a.hid").alias("id_a"), F.col("b.hid").alias("id_b"))
    )
    comp = dedup_clusters(pairs)
    return (
        comp.join(names, comp["id"] == names["hid"])
        .groupBy("cluster_id")
        .agg(
            F.count(F.lit(1)).alias("n_names"),
            F.sum("n_rows").alias("n_rows"),
            F.min("p_name").alias("rep_name"),
        )
    )


@register(
    "q_sql_udf_functions",
    oracle="""
    WITH words AS (
      SELECT lang,
             unnest(string_split(trim(regexp_replace(regexp_replace(
               lower(text), '[^a-z0-9\\s]', '', 'g'), '\\s+', ' ', 'g')),
               ' ')) AS w
      FROM documents
    )
    SELECT lang, w, CAST(count(*) AS BIGINT) AS n
    FROM words WHERE w <> ''
    GROUP BY lang, w
    ORDER BY n DESC, lang, w
    LIMIT 15
    """,
)
def q_sql_udf_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The Spark 4 SQL-DEFINED function surface: a scalar SQL UDF
    (text normalization declared in SQL, not Python — it inlines into
    the plan like any expression, full codegen, no serialization
    boundary) plus a SQL TABLE function invoked through LATERAL — the
    catalog-resident, language-neutral way to package reusable logic.
    The query tokenizes documents entirely through the two SQL
    functions; the oracle inlines the identical expressions."""
    table(spark, sf_dir, "documents").createOrReplaceTempView("documents")
    spark.sql(
        "CREATE OR REPLACE TEMPORARY FUNCTION norm_text(s STRING) "
        "RETURNS STRING RETURN "
        r"trim(regexp_replace(regexp_replace(lower(s), '[^a-z0-9\\s]', ''),"
        r" '\\s+', ' '))"
    )
    spark.sql(
        "CREATE OR REPLACE TEMPORARY FUNCTION words_of(s STRING) "
        "RETURNS TABLE(w STRING) RETURN SELECT explode(split(s, ' '))"
    )
    return spark.sql(
        """
        SELECT lang, w, count(*) AS n
        FROM (SELECT lang, norm_text(text) AS nt FROM documents) d,
             LATERAL words_of(nt)
        WHERE w <> ''
        GROUP BY lang, w
        ORDER BY n DESC, lang, w
        LIMIT 15
        """
    )


@register(
    "q_sql_scripting_bisection",
    oracle="""
    WITH RECURSIVE stats AS (
      SELECT max(o_totalprice) AS mx, count(*) AS n FROM orders
    ), rec(i, lo, hi) AS (
      SELECT 0, CAST(0 AS DOUBLE), mx FROM stats
      UNION ALL
      SELECT i + 1,
             CASE WHEN (SELECT count(*) FROM orders
                        WHERE o_totalprice > (lo + hi) / 2) * 10
                       > (SELECT n FROM stats)
                  THEN (lo + hi) / 2 ELSE lo END,
             CASE WHEN (SELECT count(*) FROM orders
                        WHERE o_totalprice > (lo + hi) / 2) * 10
                       > (SELECT n FROM stats)
                  THEN hi ELSE (lo + hi) / 2 END
      FROM rec WHERE i < 12
    )
    SELECT round((lo + hi) / 2, 6) AS threshold,
           CAST((SELECT count(*) FROM orders
                 WHERE o_totalprice > (lo + hi) / 2) AS BIGINT) AS n_above
    FROM rec WHERE i = 12
    """,
)
def q_sql_scripting_bisection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL SCRIPTING (Spark 4 procedural SQL: BEGIN/DECLARE/WHILE/IF):
    a scripted bisection that searches the ~90th-percentile order-value
    threshold by re-aggregating the table each step — the
    driver-orchestrated iterative pattern (like IRLS/k-means) expressed
    entirely in SQL, no Python control flow. 12 steps, each one
    aggregate scan; bisection state is two doubles. The oracle replays
    the IDENTICAL 12 steps in a recursive CTE with correlated aggregate
    subqueries — integer count comparisons make every branch decision
    engine-exact, so the final threshold matches to the rounded digit.

    The scripted loop re-aggregates the SAME relation 14 times, so the
    one-column projection it needs is cached up front AS ONE PARTITION
    (~1 MB of doubles at sf0.1): the first scan pays the parquet read,
    the other 13 are single-task in-memory scans. Measured at sf0.1:
    3.5s -> ~2.8s; the remaining floor is SQL-scripting per-statement
    subquery planning (~14 plans), not I/O — 14 equivalent cached
    DataFrame aggregates run in 0.85s. The bench harness clears the
    cache after each query, so nothing leaks across timings."""
    from pyspark.storagelevel import StorageLevel

    from oakstore_spark.sources import table as _t

    _t(spark, sf_dir, "orders").select("o_totalprice").coalesce(1).persist(
        StorageLevel.MEMORY_AND_DISK
    ).createOrReplaceTempView("orders")
    spark.conf.set("spark.sql.scripting.enabled", "true")
    return spark.sql(
        """
        BEGIN
          DECLARE lo DOUBLE DEFAULT 0.0;
          DECLARE hi DOUBLE;
          DECLARE n BIGINT;
          DECLARE c BIGINT;
          DECLARE mid DOUBLE;
          DECLARE i INT DEFAULT 0;
          SET hi = (SELECT max(o_totalprice) FROM orders);
          SET n = (SELECT count(*) FROM orders);
          WHILE i < 12 DO
            SET mid = (lo + hi) / 2;
            SET c = (SELECT count(*) FROM orders WHERE o_totalprice > mid);
            IF c * 10 > n THEN
              SET lo = mid;
            ELSE
              SET hi = mid;
            END IF;
            SET i = i + 1;
          END WHILE;
          SET mid = (lo + hi) / 2;
          SET c = (SELECT count(*) FROM orders WHERE o_totalprice > mid);
          SELECT round(mid, 6) AS threshold, c AS n_above;
        END
        """
    )


@register(
    "q_collated_match",
    oracle="""
    WITH mangled AS (
      SELECT p_partkey, p_name,
             CASE WHEN p_partkey % 3 = 0 THEN upper(p_name)
                  WHEN p_partkey % 3 = 1 THEN p_name
                  ELSE concat(upper(substr(p_name, 1, 1)),
                              substr(p_name, 2)) END AS entered
      FROM part
    )
    SELECT CAST(count(*) AS BIGINT) AS n_rows,
           CAST(sum(CASE WHEN entered = p_name THEN 1 ELSE 0 END)
             AS BIGINT) AS n_exact,
           CAST(sum(CASE WHEN lower(entered) = lower(p_name) THEN 1 ELSE 0 END)
             AS BIGINT) AS n_ci
    FROM mangled
    """,
)
def q_collated_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark 4 string COLLATIONS: the same comparison under binary vs
    UTF8_LCASE collation — the engine-level answer to the lower()-
    both-sides idiom (a collated comparison keeps original strings,
    pushes down, and applies to joins/group-bys uniformly). Synthetic
    case-mangled entries (upper/original/title-case by key) are matched
    against the canonical names both ways; the case-insensitive count
    must exceed the binary count. The oracle expresses the UTF8_LCASE
    semantics via lower() equality — for ASCII the two definitions
    coincide exactly. Parameterized SQL (:mod named marker) rides along
    as the second Spark-4 surface in this entry."""
    from oakstore_spark.sources import table as _t

    _t(spark, sf_dir, "part").createOrReplaceTempView("part")
    return spark.sql(
        """
        WITH mangled AS (
          SELECT p_partkey, p_name,
                 CASE WHEN p_partkey % :mod = 0 THEN upper(p_name)
                      WHEN p_partkey % :mod = 1 THEN p_name
                      ELSE concat(upper(substr(p_name, 1, 1)),
                                  substr(p_name, 2)) END AS entered
          FROM part
        )
        SELECT count(*) AS n_rows,
               sum(CASE WHEN entered = p_name THEN 1 ELSE 0 END) AS n_exact,
               sum(CASE WHEN entered COLLATE UTF8_LCASE
                             = p_name COLLATE UTF8_LCASE
                        THEN 1 ELSE 0 END) AS n_ci
        FROM mangled
        """,
        args={"mod": 3},
    )


@register(
    "q_bloom_prefiltered_join",
    oracle="""
    SELECT c.c_mktsegment,
           CAST(count(*) AS BIGINT) AS n_orders,
           round(sum(o.o_totalprice), 2) AS revenue
    FROM orders o
    JOIN customer c ON o.o_custkey = c.c_custkey
    WHERE c.c_acctbal > 9000
    GROUP BY c.c_mktsegment
    """,
)
def q_bloom_prefiltered_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit bloom pre-filtered join (operators/joins.
    bloom_prefiltered_join): a selective customer subset's keys hash
    into a broadcast set of occupied bloom buckets that drops
    non-matching orders BEFORE the join (a single-hash bloom realized
    as a broadcast semi-join — no false negatives), so the result is
    EXACTLY the plain join's (full oracle) while at scale the big-side
    shuffle carries only matching + false-positive rows. The semi-join
    pre-filter's presence in the plan is pinned in
    tests/test_plans.py."""
    from oakstore_spark.operators.joins import bloom_prefiltered_join

    o = table(spark, sf_dir, "orders").select("o_custkey", "o_totalprice")
    c = (
        table(spark, sf_dir, "customer")
        .where(F.col("c_acctbal") > 9000)
        .select(F.col("c_custkey").alias("o_custkey"), "c_mktsegment")
    )
    joined = bloom_prefiltered_join(o, c, "o_custkey")
    return joined.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.round(F.sum("o_totalprice"), 2).alias("revenue"),
    )


@register(
    "q_two_phase_distinct",
    oracle="""
    SELECT event_type, count(DISTINCT user_id) AS n_users FROM events
    GROUP BY event_type
    """,
)
def q_two_phase_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit two-phase distinct aggregation — the skew cure for
    COUNT(DISTINCT) on hot group keys: phase 1 dedups on the FULL
    (group, value) pair (the exchange spreads a hot group across
    partitions by value, and partial aggregation collapses duplicates
    map-side), phase 2 counts the deduped pairs per group. A direct
    distinct-aggregate keeps one in-memory set per group in each task —
    a hot key concentrates its whole value universe in one place; the
    two-phase form never materializes a per-group set at all. Result is
    definitionally the plain COUNT(DISTINCT)."""
    e = table(spark, sf_dir, "events")
    pairs = e.select("event_type", "user_id").distinct()
    return pairs.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_users")
    )


@register(
    "q_map_type_explode",
    oracle="""
    SELECT key,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum(v) AS BIGINT) AS total
    FROM (
      SELECT 'k' AS key, CAST(json_extract(props, '$.k') AS BIGINT) AS v
      FROM events
      UNION ALL
      SELECT 'user_bucket', user_id % 10 FROM events
    )
    GROUP BY key
    """,
)
def q_map_type_explode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MAP-typed processing end-to-end: the JSON props parse into a
    typed ``map<string,bigint>`` (from_json — schema-checked, not
    stringly), a derived entry merges in via map_concat, and
    explode(map) emits one row per entry for a per-key rollup. The
    complex-type family's map leg (structs/arrays/variant covered
    elsewhere); everything is JVM expressions — parse, merge and
    explode are map-side, the aggregate is keys-sized. Oracle replays
    the entries as a UNION ALL."""
    e = table(spark, sf_dir, "events")
    m = F.from_json(F.col("props"), "map<string,bigint>")
    merged = F.map_concat(
        m, F.create_map(F.lit("user_bucket"), F.col("user_id") % 10)
    )
    return (
        e.select(F.explode(merged).alias("key", "v"))
        .groupBy("key")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("v").alias("total"))
    )


@register(
    "q_hof_array_suite",
    oracle="""
    SELECT label,
           CAST(count(*) AS BIGINT) AS n_vecs,
           round(avg(list_sum(list_transform(CAST(embedding AS DOUBLE[]),
                                             x -> abs(x)))), 4) AS avg_l1,
           CAST(sum(len(list_filter(CAST(embedding AS DOUBLE[]),
                                    x -> x > 0))) AS BIGINT) AS n_pos,
           CAST(sum(CASE WHEN len(list_filter(CAST(embedding AS DOUBLE[]),
                                              x -> abs(x) > 0.2)) > 0
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_with_big
    FROM embeddings
    GROUP BY label
    """,
)
def q_hof_array_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The higher-order-function suite on array columns — aggregate
    (lambda fold), filter, and exists — the JVM-side way to compute
    over vectors without any Python: L1 norm as a fold, positive-
    component counts, and an any-large-component flag, rolled up per
    label. transform/filter appear throughout the suite; this entry
    pins the FOLD (F.aggregate) and EXISTS forms explicitly. All
    codegen'd lambdas; nothing leaves the JVM."""
    e = table(spark, sf_dir, "embeddings")
    emb = F.col("embedding").cast("array<double>")
    l1 = F.aggregate(emb, F.lit(0.0), lambda acc, x: acc + F.abs(x))
    n_pos = F.size(F.filter(emb, lambda x: x > 0))
    has_big = F.exists(emb, lambda x: F.abs(x) > 0.2)
    return (
        e.select("label", l1.alias("l1"), n_pos.alias("np"), has_big.alias("hb"))
        .groupBy("label")
        .agg(
            F.count(F.lit(1)).alias("n_vecs"),
            F.round(F.avg("l1"), 4).alias("avg_l1"),
            F.sum("np").cast("bigint").alias("n_pos"),
            F.sum(F.when(F.col("hb"), 1).otherwise(0)).alias("n_with_big"),
        )
    )


@register(
    "q_expectations_report",
    oracle="""
    WITH li AS (
      SELECT l_orderkey * 10 + l_linenumber AS vid, *
      FROM lineitem
    ), checks(rule, bad) AS (
      SELECT 'qty_range',
             NOT COALESCE(l_quantity BETWEEN 1 AND 50, FALSE)
      FROM li
      UNION ALL
      SELECT 'price_positive',
             NOT COALESCE(l_extendedprice > 0, FALSE)
      FROM li
      UNION ALL
      SELECT 'small_orders_only',
             NOT COALESCE(l_quantity <= 10, FALSE)
      FROM li
      UNION ALL
      SELECT 'null_is_violation',
             NOT COALESCE(CASE WHEN l_quantity <= 25 THEN TRUE END,
                          FALSE)
      FROM li
    ), agg AS (
      SELECT rule,
             CAST(count(*) AS BIGINT) AS n_rows,
             CAST(sum(CASE WHEN bad THEN 1 ELSE 0 END) AS BIGINT)
               AS n_violations
      FROM checks GROUP BY rule
    ), ex AS (
      SELECT rule, COALESCE(string_agg(v, ',' ORDER BY v), '')
               AS examples_csv
      FROM (
        SELECT c.rule AS rule, CAST(li.vid AS VARCHAR) AS v,
               row_number() OVER (
                 PARTITION BY c.rule ORDER BY li.vid
               ) AS rk
        FROM (
          SELECT 'qty_range' AS rule UNION ALL
          SELECT 'price_positive' UNION ALL
          SELECT 'small_orders_only' UNION ALL
          SELECT 'null_is_violation'
        ) c
        JOIN li ON (
          (c.rule = 'qty_range'
             AND NOT COALESCE(l_quantity BETWEEN 1 AND 50, FALSE))
          OR (c.rule = 'price_positive'
             AND NOT COALESCE(l_extendedprice > 0, FALSE))
          OR (c.rule = 'small_orders_only'
             AND NOT COALESCE(l_quantity <= 10, FALSE))
          OR (c.rule = 'null_is_violation'
             AND NOT COALESCE(
                   CASE WHEN l_quantity <= 25 THEN TRUE END, FALSE))
        )
      ) WHERE rk <= 3 GROUP BY rule
    )
    SELECT a.rule AS rule, a.n_rows, a.n_violations,
           CAST(a.n_violations AS DOUBLE)
             / greatest(a.n_rows, 1) AS violation_rate,
           a.n_violations = 0 AS passed,
           COALESCE(e.examples_csv, '') AS examples_csv
    FROM agg a LEFT JOIN ex e ON a.rule = e.rule
    ORDER BY a.rule
    """,
)
def q_expectations_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dataset contract validation (dbt-tests / Delta CHECK shape —
    operators/quality.py): four expectations over lineitem — two that
    hold (qty_range, price_positive), one that fails broadly
    (quantity<=10), and one whose predicate goes NULL for quantities
    over 25 (unknown counts as a violation). One scan aggregates every
    rule's counts; examples come from a rank-limited window
    (WindowGroupLimit — bounded state at any violation rate). Emitted
    as CSV (arrays don't hash in the checker); the oracle replays
    counts, rates, verdicts, and the 3 smallest violator ids."""
    from oakstore_spark.operators.quality import validate_expectations

    li = table(spark, sf_dir, "lineitem").withColumn(
        "vid", F.col("l_orderkey") * 10 + F.col("l_linenumber")
    )
    rules = {
        "qty_range": F.col("l_quantity").between(1, 50),
        "price_positive": F.col("l_extendedprice") > 0,
        "small_orders_only": F.col("l_quantity") <= 10,
        "null_is_violation": F.when(
            F.col("l_quantity") <= 25, F.lit(True)
        ),
    }
    rep = validate_expectations(li, rules, id_col="vid")
    return rep.select(
        "rule",
        "n_rows",
        "n_violations",
        "violation_rate",
        "passed",
        F.array_join("example_ids", ",").alias("examples_csv"),
    ).orderBy("rule")


@register(
    "q_k_anonymity",
    oracle="""
    SELECT c_nationkey, c_mktsegment,
           CAST(count(*) AS BIGINT) AS k_size,
           CAST(count(DISTINCT c_acctbal >= 0) AS BIGINT) AS l_distinct
    FROM customer
    GROUP BY c_nationkey, c_mktsegment
    ORDER BY c_nationkey, c_mktsegment
    """,
)
def q_k_anonymity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Re-identification risk report (k-anonymity / l-diversity —
    operators/pii.py): customers grouped by the (nation, market
    segment) quasi-identifier, each equivalence class reporting its
    attained k and the diversity of the binary account-balance-sign
    sensitive attribute. One hash aggregate; the oracle replays it
    closed-form."""
    from oakstore_spark.operators.pii import k_anonymity_report

    c = table(spark, sf_dir, "customer").withColumn(
        "_sens", F.col("c_acctbal") >= 0
    )
    return (
        k_anonymity_report(
            c, ["c_nationkey", "c_mktsegment"], sensitive_col="_sens"
        )
        .orderBy("c_nationkey", "c_mktsegment")
    )

@register(
    "q_k_anonymize_gen",
    oracle="""
    WITH d AS (
      SELECT c_custkey,
             lpad(CAST((c_custkey * 7919) % 100000 AS VARCHAR), 5, '0')
               AS qzip,
             CAST(floor(c_acctbal) AS BIGINT) AS qbal
      FROM customer
    ), g AS (
      SELECT c_custkey,
             qzip AS p0,
             substr(qzip, 1, 3) || '**' AS p1,
             substr(qzip, 1, 1) || '****' AS p2,
             '*' AS p3,
             qbal AS b0,
             CAST(floor(qbal / 1000.0) * 1000 AS BIGINT) AS b1,
             CAST(NULL AS BIGINT) AS b2
      FROM d
    ), tot AS (SELECT count(*) AS c FROM d),
    s0 AS (SELECT coalesce(sum(n), 0) AS s FROM
           (SELECT count(*) AS n FROM g GROUP BY p0, b0) t WHERE n < 5),
    s1 AS (SELECT coalesce(sum(n), 0) AS s FROM
           (SELECT count(*) AS n FROM g GROUP BY p1, b0) t WHERE n < 5),
    s2 AS (SELECT coalesce(sum(n), 0) AS s FROM
           (SELECT count(*) AS n FROM g GROUP BY p1, b1) t WHERE n < 5),
    s3 AS (SELECT coalesce(sum(n), 0) AS s FROM
           (SELECT count(*) AS n FROM g GROUP BY p2, b1) t WHERE n < 5),
    s4 AS (SELECT coalesce(sum(n), 0) AS s FROM
           (SELECT count(*) AS n FROM g GROUP BY p2, b2) t WHERE n < 5),
    pick AS (
      SELECT CASE
        WHEN (SELECT s FROM s0) <= 0.05 * (SELECT c FROM tot) THEN 0
        WHEN (SELECT s FROM s1) <= 0.05 * (SELECT c FROM tot) THEN 1
        WHEN (SELECT s FROM s2) <= 0.05 * (SELECT c FROM tot) THEN 2
        WHEN (SELECT s FROM s3) <= 0.05 * (SELECT c FROM tot) THEN 3
        WHEN (SELECT s FROM s4) <= 0.05 * (SELECT c FROM tot) THEN 4
        ELSE 5 END AS v
    ), rel AS (
      SELECT c_custkey,
        CASE (SELECT v FROM pick)
          WHEN 0 THEN p0 WHEN 1 THEN p1 WHEN 2 THEN p1
          WHEN 3 THEN p2 WHEN 4 THEN p2 ELSE p3 END AS qzip,
        CASE (SELECT v FROM pick)
          WHEN 0 THEN b0 WHEN 1 THEN b0 WHEN 2 THEN b1
          WHEN 3 THEN b1 ELSE b2 END AS qbal
      FROM g
    )
    SELECT c_custkey, qzip, qbal FROM (
      SELECT rel.*, count(*) OVER (PARTITION BY qzip, qbal) AS cnt
      FROM rel
    ) t WHERE cnt >= 5 ORDER BY c_custkey
    """,
)
def q_k_anonymize_gen(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Generalization-based k-anonymization release
    (operators/pii.py k_anonymize_generalized — the rung above
    suppression-only): quasi-identifiers are a deterministic 5-digit
    zip derived from the customer key (zip5 -> zip3** -> zip1**** ->
    '*') and the whole-dollar account balance (exact -> 1000-band ->
    NULL). The
    deterministic round-robin ladder coarsens until suppressed rows
    fit the 5%% budget at k=5, then suppresses the remainder; the
    oracle replays the SAME ladder closed-form (per-vector suppressed
    counts as scalar subqueries, CASE-selected release vector, window
    count as the final gate) so every released row and its chosen
    generalization level hash-match."""
    from oakstore_spark.operators.pii import k_anonymize_generalized

    d = table(spark, sf_dir, "customer").select(
        "c_custkey",
        F.lpad(
            ((F.col("c_custkey") * 7919) % 100000).cast("string"), 5, "0"
        ).alias("qzip"),
        F.floor("c_acctbal").cast("long").alias("qbal"),
    )
    hier = {
        "qzip": [
            F.concat(F.substring("qzip", 1, 3), F.lit("**")),
            F.concat(F.substring("qzip", 1, 1), F.lit("****")),
            F.lit("*"),
        ],
        "qbal": [
            (F.floor(F.col("qbal") / 1000.0) * 1000).cast("long"),
            F.lit(None).cast("long"),
        ],
    }
    return k_anonymize_generalized(
        d, hier, k=5, max_suppression=0.05
    ).orderBy("c_custkey")



@register(
    "q_woe_iv_returns",
    oracle="""
    WITH units AS (
      SELECT o_totalprice AS v,
             CASE WHEN o_orderkey IN (
               SELECT l_orderkey FROM lineitem WHERE l_returnflag = 'R'
             ) THEN 1 ELSE 0 END AS bad
      FROM orders
    ), mm AS (
      SELECT min(v) AS lo, (max(v) - min(v)) / 10 AS width,
             CAST(sum(bad) AS BIGINT) AS nb,
             CAST(count(*) - sum(bad) AS BIGINT) AS ng
      FROM units
    ), counts AS (
      SELECT greatest(least(CAST(floor((v - lo) / width) AS BIGINT), 9),
                      0) AS bin,
             CAST(sum(1 - bad) AS BIGINT) AS n_good,
             CAST(sum(bad) AS BIGINT) AS n_bad
      FROM units, mm GROUP BY 1
    ), grid AS (SELECT unnest(range(10)) AS bin)
    SELECT CAST(grid.bin AS BIGINT) AS bin,
           CAST(coalesce(n_good, 0) AS BIGINT) AS n_good,
           CAST(coalesce(n_bad, 0) AS BIGINT) AS n_bad,
           CAST((coalesce(n_good, 0) * 2 + 1) AS DOUBLE)
             / (2 * ng + 10) AS share_good,
           CAST((coalesce(n_bad, 0) * 2 + 1) AS DOUBLE)
             / (2 * nb + 10) AS share_bad,
           ln(((coalesce(n_good, 0) * 2 + 1) / CAST(2 * ng + 10 AS DOUBLE))
              / ((coalesce(n_bad, 0) * 2 + 1)
                 / CAST(2 * nb + 10 AS DOUBLE))) AS woe,
           (((coalesce(n_good, 0) * 2 + 1) / CAST(2 * ng + 10 AS DOUBLE))
            - ((coalesce(n_bad, 0) * 2 + 1) / CAST(2 * nb + 10 AS DOUBLE)))
           * ln(((coalesce(n_good, 0) * 2 + 1)
                 / CAST(2 * ng + 10 AS DOUBLE))
                / ((coalesce(n_bad, 0) * 2 + 1)
                   / CAST(2 * nb + 10 AS DOUBLE))) AS iv_contrib
    FROM grid LEFT JOIN counts ON grid.bin = counts.bin
    CROSS JOIN mm
    ORDER BY bin
    """,
)
def q_woe_iv_returns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weight-of-evidence / information-value screening of order price
    against the returned-order target (operators/quality.woe_iv):
    equal-width bins from one global aggregate, add-half smoothed
    integer-ratio shares, woe/iv_contrib as pinned division-ln-multiply
    chains — sum(iv_contrib) is the IV. The target joins in as a
    left-semi flag (row content never shuffles twice)."""
    from oakstore_spark.operators.quality import woe_iv

    o = table(spark, sf_dir, "orders")
    li = table(spark, sf_dir, "lineitem")
    returned = (
        li.where(F.col("l_returnflag") == "R")
        .select(F.col("l_orderkey").alias("rk"))
        .distinct()
    )
    units = o.join(
        returned, o.o_orderkey == F.col("rk"), "left"
    ).select(
        F.col("o_totalprice").alias("v"),
        F.col("rk").isNotNull().cast("int").alias("bad"),
    )
    return woe_iv(units, "v", "bad", n_bins=10).orderBy("bin")


@register(
    "q_dp_release",
    oracle="""
    WITH agg AS (
      SELECT event_type, CAST(count(*) AS BIGINT) AS t
      FROM events GROUP BY event_type
    ), n AS (
      SELECT event_type, t,
             (CAST(CAST(('0x' || substr(md5('dp:' || event_type),
                    1, 15)) AS BIGINT) AS DOUBLE) + 0.5)
               / 1152921504606846976.0 AS u
      FROM agg
    )
    SELECT event_type,
           CAST(t AS DOUBLE)
             + (-2.0) * sign(u - 0.5)
               * ln(1.0 - 2.0 * abs(u - 0.5)) AS released
    FROM n ORDER BY event_type
    """,
)
def q_dp_release(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Differentially-private count release (operators/pii.dp_release,
    Laplace mechanism at epsilon 0.5): per-event-type counts with
    deterministic memoized noise — the Laplace CDF inverted at the
    60-bit md5 uniform of the group key (the engine's
    replayable-randomness rung), so the oracle rebuilds every noise
    value (ln is the known <=1-ulp libm class). The true counts never
    leave the operator."""
    from oakstore_spark.operators.pii import dp_release

    e = table(spark, sf_dir, "events")
    return dp_release(
        e, ["event_type"], epsilon=0.5, replay_salt="dp"
    ).orderBy("event_type")


_DP_HIST_SQL = """
    counts AS (
      SELECT CAST(greatest(least(floor((value - 0.0) / 50.0), 9), 0)
                  AS BIGINT) AS bin,
             CAST(count(*) AS BIGINT) AS t
      FROM events WHERE value IS NOT NULL GROUP BY 1
    ), grid AS (
      SELECT unnest(range(10)) AS bin
    ), j AS (
      SELECT g.bin, CAST(coalesce(c.t, 0) AS BIGINT) AS t
      FROM grid g LEFT JOIN counts c USING (bin)
    ), noised AS (
      SELECT bin, t,
             (CAST(CAST(('0x' || substr(md5('dph:' || bin),
                    1, 15)) AS BIGINT) AS DOUBLE) + 0.5)
               / 1152921504606846976.0 AS u
      FROM j
    ), hist AS (
      SELECT bin,
             0.0 + CAST(bin AS DOUBLE) * 50.0 AS bin_lo,
             0.0 + CAST(bin + 1 AS DOUBLE) * 50.0 AS bin_hi,
             CAST(t AS DOUBLE)
               + (-2.0) * sign(u - 0.5)
                 * ln(1.0 - 2.0 * abs(u - 0.5)) AS released
      FROM noised
    )"""


@register(
    "q_dp_histogram",
    oracle=f"""
    WITH {_DP_HIST_SQL}
    SELECT bin, bin_lo, bin_hi, released FROM hist ORDER BY bin
    """,
)
def q_dp_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Differentially-private histogram release
    (operators/pii.dp_histogram): event values into 10 equal-width
    bins over the PUBLIC range [0, 500) at epsilon 0.5 — per-bin
    memoized Laplace noise under parallel composition (disjoint bins,
    one epsilon total), every bin row emitted including true-zero
    ones, edges data-independent by contract. The oracle rebuilds
    every noise value bit-for-bit (replay_salt mode)."""
    from oakstore_spark.operators.pii import dp_histogram

    e = table(spark, sf_dir, "events")
    return dp_histogram(
        e, "value", epsilon=0.5, n_bins=10, lo=0.0, hi=500.0,
        replay_salt="dph",
    ).orderBy("bin")


@register(
    "q_dp_quantiles",
    oracle=f"""
    WITH {_DP_HIST_SQL}, cumt AS (
      SELECT bin, bin_lo, greatest(released, 0.0) AS pos,
             sum(greatest(released, 0.0)) OVER (
               ORDER BY bin
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
             ) AS cum
      FROM hist
    ), tot AS (
      SELECT max(cum) AS t FROM cumt
    ), qs AS (
      SELECT unnest([0.25, 0.5, 0.9]) AS q
    ), firstbin AS (
      SELECT q.q, min(c.bin) AS bin, max(q.q * tot.t) AS target
      FROM qs q CROSS JOIN tot
      LEFT JOIN cumt c ON c.cum >= q.q * tot.t
      GROUP BY q.q
    )
    SELECT f.q,
           CASE WHEN c.pos > 0 AND f.target > 0
                THEN c.bin_lo + (f.target - (c.cum - c.pos))
                       / c.pos * 50.0 END AS value
    FROM firstbin f LEFT JOIN cumt c USING (bin)
    ORDER BY f.q
    """,
)
def q_dp_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Differentially-private quantiles (operators/pii.dp_quantiles):
    epsilon-free post-processing of q_dp_histogram's release —
    clamp negative noised counts, running-sum the 10-bin relation
    (bounded prefix window), linear interpolation inside the first
    bin reaching q of the total mass. The whole chain downstream of
    the memoized noise is deterministic, so the oracle replays it."""
    from oakstore_spark.operators.pii import dp_quantiles

    e = table(spark, sf_dir, "events")
    return dp_quantiles(
        e, "value", epsilon=0.5, n_bins=10, lo=0.0, hi=500.0,
        qs=[0.25, 0.5, 0.9], replay_salt="dph",
    ).orderBy("q")
