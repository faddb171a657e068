"""Pipeline-utility operator coverage: deterministic sampling, quantile
bucketing, time-RANGE window frames, tolerance as-of joins, corpus
n-gram frequency scoring.

All EXT — the reference (375 LoC total, `/root/reference/oakstore/
store.py:1-267` is the entire engine) has none of these; they are the
operations a large-scale training-data pipeline needs around the core
store. Every query is declarative DataFrame/SQL (Catalyst handles
pushdown/broadcast); the only shuffles are the stated aggregations.

Oracle-parity notes (the driver hash-matches values at sf0.01):
- sampling is ENGINE-PORTABLE deterministic: md5 of the key's decimal
  string — no rand(), no engine-specific hash;
- decile ordering uses exact integer cents (`round(sum*100)::bigint`),
  so window ties resolve identically in Spark and DuckDB regardless of
  float summation order;
- the trailing-window frame compares epoch seconds as doubles in both
  engines; the as-of tolerance compares exact integer microseconds.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from oakstore_spark.queries import register
from oakstore_spark.sources import table


# --- deterministic hash sampling -----------------------------------------

@register(
    "q_hash_sample",
    oracle="""
    SELECT o_orderpriority,
           count(*) AS n_sampled,
           round(sum(o_totalprice), 2) AS sample_revenue
    FROM orders
    WHERE substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 1) IN ('0', '1')
    GROUP BY o_orderpriority
    """,
)
def q_hash_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic ~1/8 sample via content hashing (md5 of the key's
    decimal string, first hex nibble in {0,1}) — reproducible across
    engines, runs, and partitionings, unlike rand()-based TABLESAMPLE.
    The sampling predicate is map-side; the only shuffle is the tiny
    per-priority aggregation. This is the sampling pattern for
    train/eval splits in data pipelines: membership is a pure function
    of the row key."""
    o = table(spark, sf_dir, "orders")
    nibble = F.substring(F.md5(F.encode(F.col("o_orderkey").cast("string"), "UTF-8")), 1, 1)
    return (
        o.filter(nibble.isin("0", "1"))
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_sampled"),
            F.round(F.sum("o_totalprice"), 2).alias("sample_revenue"),
        )
    )


# --- ntile quantile bucketing --------------------------------------------

@register(
    "q_ntile_spend_deciles",
    oracle="""
    WITH spend AS (
        SELECT o_custkey,
               CAST(round(sum(o_totalprice) * 100) AS BIGINT) AS spend_cents
        FROM orders GROUP BY 1
    )
    SELECT CAST(decile AS BIGINT) AS decile,
           count(*) AS n_customers,
           CAST(sum(spend_cents) AS BIGINT) AS decile_spend_cents
    FROM (
        SELECT o_custkey, spend_cents,
               ntile(10) OVER (ORDER BY spend_cents, o_custkey) AS decile
        FROM spend
    )
    GROUP BY decile
    """,
)
def q_ntile_spend_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customer spend deciles. Ordering and sums use exact integer cents
    (doubles only pass through one round()), so the ntile cut points are
    engine-order independent; the tie-break on o_custkey makes the
    window total order unique. Single shuffle for the groupBy; the
    global ntile is a single-partition sort of one row per customer —
    at 100 TB you would pre-aggregate per range bucket and assign
    deciles from a quantile sketch instead."""
    o = table(spark, sf_dir, "orders")
    spend = o.groupBy("o_custkey").agg(
        F.round(F.sum("o_totalprice") * 100).cast("bigint").alias("spend_cents")
    )
    w = W.orderBy("spend_cents", "o_custkey")
    return (
        spend.withColumn("decile", F.ntile(10).over(w).cast("bigint"))
        .groupBy("decile")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.sum("spend_cents").alias("decile_spend_cents"),
        )
    )


@register(
    "q_spend_deciles_sketch",
    oracle="""
    WITH s AS (
      SELECT CAST((range * 37) % 10000 AS BIGINT) AS spend_cents
      FROM range(10000)
    ),
    d AS (
      SELECT spend_cents,
             1 + len(list_filter(
               [998, 1998, 2998, 3998, 4998, 5998, 6998, 7998, 8998],
               c -> spend_cents > c)) AS decile
      FROM s
    )
    SELECT CAST(decile AS BIGINT) AS decile,
           CAST(count(*) AS BIGINT) AS n_customers,
           CAST(sum(spend_cents) AS BIGINT) AS decile_spend_cents
    FROM d GROUP BY decile
    """,
)
def q_spend_deciles_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale-safe sibling of ``q_ntile_spend_deciles``: decile membership
    from ``approx_percentile`` cut points instead of a global ntile —
    NO single-partition sort anywhere in the plan. The sketch (one
    KLL-style aggregate, map-side partial) yields 9 cut points; each
    customer's decile is then a map-side array scan over the broadcast
    one-row cut-point relation.

    ORACLE (was rows-only until r8): spends are the planted permutation
    ``(c*37) % 10000`` of 0..9999, where accuracy=10000 makes the
    sketch's rank error < 1 — the 9 cut points are FORCED to the exact
    rank-convention values 998,1998,...,8998 (verified invariant across
    1/3/32/100-partition merges), and the oracle bakes them: a sketch
    drift, merge bug, or changed rank convention moves a cut, reshapes
    every decile count/sum, and breaks the hash. The real-orders spend
    path keeps its own oracle via q_ntile_spend_deciles;
    tests/test_plans.py still pins the no-global-sort plan here."""
    spend = spark.range(10000).select(
        F.col("id").alias("cust_id"),
        ((F.col("id") * 37) % 10000).alias("spend_cents"),
    )
    cuts = spend.agg(
        F.percentile_approx(
            "spend_cents",
            F.array(*[F.lit(i / 10) for i in range(1, 10)]),
            F.lit(10_000),
        ).alias("cuts")
    )
    # decile = 1 + number of cut points strictly below this spend
    decile = F.aggregate(
        "cuts",
        F.lit(1).cast("bigint"),
        lambda acc, c: acc + F.when(F.col("spend_cents") > c, 1).otherwise(0),
    )
    return (
        spend.join(F.broadcast(cuts))
        .withColumn("decile", decile)
        .groupBy("decile")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.sum("spend_cents").alias("decile_spend_cents"),
        )
    )


# --- time-RANGE window frame ---------------------------------------------

@register(
    "q_trailing_1h_window",
    oracle="""
    SELECT event_id,
           count(*) OVER w AS n_1h,
           round(sum(value) OVER w, 2) AS sum_1h
    FROM events
    WHERE event_type = 'view'
    WINDOW w AS (
        PARTITION BY user_id ORDER BY CAST(epoch(ts) AS DOUBLE)
        RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW
    )
    """,
)
def q_trailing_1h_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event trailing one-hour activity (count + value sum) per
    user — a RANGE frame keyed on time, not row position: sparse,
    irregular event streams get correct wall-clock windows. Both
    engines order on epoch seconds as a double (microsecond fraction
    preserved), so frame boundaries agree exactly. One shuffle on
    user_id; the frame is evaluated in a single sorted pass per
    partition."""
    e = table(spark, sf_dir, "events").filter(F.col("event_type") == "view")
    w = (
        W.partitionBy("user_id")
        .orderBy(F.col("ts").cast("double"))
        .rangeBetween(-3600, 0)
    )
    return e.select(
        "event_id",
        F.count(F.lit(1)).over(w).alias("n_1h"),
        F.round(F.sum("value").over(w), 2).alias("sum_1h"),
    )


# --- as-of join with tolerance (DuckDB native ASOF oracle) ----------------

@register(
    "q_asof_tolerance",
    oracle="""
    WITH clicks AS (
        SELECT event_id, user_id, ts FROM events WHERE event_type = 'click'
    ), purch AS (
        SELECT user_id, ts, max(value) AS pvalue
        FROM events WHERE event_type = 'purchase' GROUP BY 1, 2
    )
    SELECT c.event_id, c.user_id,
           CASE WHEN p.ts IS NOT NULL AND c.ts - p.ts <= INTERVAL 1 DAY
                THEN round(p.pvalue, 2) END AS last_purchase_value
    FROM clicks c ASOF LEFT JOIN purch p
      ON c.user_id = p.user_id AND c.ts >= p.ts
    """,
)
def q_asof_tolerance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """For every click, the value of the user's most recent prior
    purchase, but only if it happened within the last day (pandas
    merge_asof tolerance semantics). The oracle is DuckDB's NATIVE
    ASOF LEFT JOIN; the Spark side is the union + running-last window
    formulation (one shuffle on user_id, no range-join explosion —
    operators/timeseries.py asof_join). The right side is
    pre-aggregated per (user_id, ts) so equal-timestamp ties are
    deterministic in both engines."""
    from oakstore_spark.operators.timeseries import asof_join

    e = table(spark, sf_dir, "events")
    clicks = e.filter(F.col("event_type") == "click").select("event_id", "user_id", "ts")
    purch = (
        e.filter(F.col("event_type") == "purchase")
        .groupBy("user_id", "ts")
        .agg(F.max("value").alias("pvalue"))
    )
    joined = asof_join(
        clicks,
        purch,
        ts_col="ts",
        by=["user_id"],
        value_cols=["pvalue"],
        direction="backward",
        tolerance_seconds=86400,
    )
    return joined.select(
        "event_id", "user_id", F.round("pvalue", 2).alias("last_purchase_value")
    )


# --- corpus bigram frequency mass ----------------------------------------

_NORM = "trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9\\s]', '', 'g'), '\\s+', ' ', 'g'))"

@register(
    "q_bigram_mass",
    oracle=f"""
    WITH w AS (
        SELECT doc_id, string_split({_NORM}, ' ') AS ws FROM documents
    ), bg AS (
        SELECT doc_id,
               unnest(list_transform(range(1, len(ws)),
                                     i -> ws[i] || ' ' || ws[i + 1])) AS bg
        FROM w WHERE len(ws) >= 2
    ), cnt AS (
        SELECT bg, count(*) AS c FROM bg GROUP BY 1
    )
    SELECT doc_id,
           count(*) AS n_bigrams,
           CAST(sum(c) AS BIGINT) AS freq_mass
    FROM bg JOIN cnt USING (bg)
    GROUP BY doc_id
    """,
)
def q_bigram_mass(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language-model-flavored document scoring without floats: each
    document's word bigrams are weighted by their CORPUS frequency, and
    the document reports total bigram count and total frequency mass
    (exact BIGINTs — high mass/bigram means boilerplate-like text, low
    means rare constructions; the integer form keeps the oracle
    hash-exact where a log-prob would be engine-rounding-dependent).
    Two shuffles: the corpus bigram count (map-side partial agg) and
    the per-doc rollup; the count join broadcasts when small."""
    from oakstore_spark.functions.text import normalize_text

    d = table(spark, sf_dir, "documents")
    words = F.split(normalize_text("text"), " ")

    # bind the computed word array ONCE as a lambda variable: referencing
    # `words` directly inside the inner transform would re-inline (and
    # re-evaluate) the normalize+split expression per bigram position
    # after Catalyst's projection collapse
    def _bigrams(ws):
        return F.when(
            F.size(ws) >= 2,
            F.transform(
                F.sequence(F.lit(0), F.size(ws) - 2),
                lambda i: F.concat_ws(
                    " ", F.element_at(ws, i + 1), F.element_at(ws, i + 2)
                ),
            ),
        ).otherwise(F.array().cast("array<string>"))

    bigrams = F.element_at(F.transform(F.array(words), _bigrams), 1)
    bg = d.select(F.col("doc_id"), F.explode(bigrams).alias("bg"))
    cnt = bg.groupBy("bg").agg(F.count(F.lit(1)).alias("c"))
    # cnt is vocabulary-sized (distinct bigrams), orders of magnitude
    # smaller than the exploded corpus side — broadcast it so the
    # corpus-sized bg relation never shuffles on the bigram key
    return (
        bg.join(F.broadcast(cnt), "bg")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            F.sum("c").cast("bigint").alias("freq_mass"),
        )
    )


# --- ranking window-function suite ----------------------------------------

@register(
    "q_rank_funcs",
    oracle="""
    WITH nat AS (
        SELECT n_name, s_suppkey, s_acctbal
        FROM supplier JOIN nation ON s_nationkey = n_nationkey
    )
    SELECT n_name, s_suppkey,
           round(percent_rank() OVER w, 6) AS pct_rank,
           round(cume_dist() OVER w, 6) AS cume,
           first_value(s_suppkey) OVER w AS poorest,
           nth_value(s_suppkey, 2) OVER w AS second_poorest,
           lag(s_suppkey, 1, CAST(-1 AS BIGINT)) OVER w AS prev_supp,
           lead(s_suppkey, 1, CAST(-1 AS BIGINT)) OVER w AS next_supp
    FROM nat
    WINDOW w AS (PARTITION BY n_name ORDER BY s_acctbal, s_suppkey)
    """,
)
def q_rank_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The ranking/navigation window-function suite in one pass: six
    functions share ONE window definition, so Spark evaluates them in a
    single sort of each nation partition (check: one Window node in the
    plan, not six). Order key (acctbal, suppkey) is a unique total
    order - every function is engine-deterministic. nth_value/lag/lead
    defaults exercise the null paths. Note nth_value uses the default
    running frame in BOTH engines (null until 2 rows have arrived)."""
    s = table(spark, sf_dir, "supplier")
    n = table(spark, sf_dir, "nation")
    nat = s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey).select(
        "n_name", "s_suppkey", "s_acctbal"
    )
    w = W.partitionBy("n_name").orderBy("s_acctbal", "s_suppkey")
    return nat.select(
        "n_name",
        "s_suppkey",
        F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
        F.round(F.cume_dist().over(w), 6).alias("cume"),
        F.first("s_suppkey").over(w).alias("poorest"),
        F.nth_value("s_suppkey", 2).over(w).alias("second_poorest"),
        F.lag("s_suppkey", 1, -1).over(w).alias("prev_supp"),
        F.lead("s_suppkey", 1, -1).over(w).alias("next_supp"),
    )


# --- ordered string aggregation -------------------------------------------

@register(
    "q_string_agg_regions",
    oracle="""
    SELECT r_name,
           string_agg(n_name, '|' ORDER BY n_name) AS nations,
           count(*) AS n_nations
    FROM nation JOIN region ON n_regionkey = r_regionkey
    GROUP BY r_name
    """,
)
def q_string_agg_regions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered string aggregation (LISTAGG): collect + sort + join
    beats a nondeterministic concat - collect_list order is undefined
    under parallel merge, so the sort inside the aggregate expression
    is what makes the result reproducible across partitionings."""
    n = table(spark, sf_dir, "nation")
    r = table(spark, sf_dir, "region")
    return (
        n.join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("r_name")
        .agg(
            F.array_join(F.array_sort(F.collect_list("n_name")), "|").alias("nations"),
            F.count(F.lit(1)).alias("n_nations"),
        )
    )


# --- end-to-end quality-filter pipeline -----------------------------------

@register(
    "q_quality_filter_pipeline",
    oracle="""
    WITH scored AS (
        SELECT doc_id, lang,
               length(text) AS n_chars,
               CASE WHEN length(trim(text)) = 0 THEN 0
                    ELSE len(string_split_regex(trim(text), '\\s+')) END AS n_tokens,
               CASE WHEN length(text) = 0 THEN 0.0
                    ELSE CAST(length(regexp_replace(text, '[a-zA-Z0-9\\s]', '', 'g')) AS DOUBLE)
                         / length(text) END AS punct_ratio
        FROM documents
    ), decided AS (
        SELECT doc_id, lang,
               CASE
                 WHEN n_tokens < 5 THEN 'drop:too_short'
                 WHEN punct_ratio > 0.1 THEN 'drop:punct'
                 WHEN lang NOT IN ('en', 'de', 'fr') THEN 'drop:lang'
                 ELSE 'keep'
               END AS decision
        FROM scored
    )
    SELECT decision, lang, count(*) AS n_docs
    FROM decided
    GROUP BY decision, lang
    """,
)
def q_quality_filter_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A complete keep/drop filter pass over the corpus - the decision
    breakdown a training-data pipeline reports after each filter stage.
    First matching rule wins (CASE semantics), all rules computed in one
    map-side projection; the only shuffle is the tiny decision rollup.
    At 100 TB this shape is the per-stage audit table you persist next
    to the filtered output."""
    d = table(spark, sf_dir, "documents")
    trimmed = F.trim(F.col("text"))
    n_tokens = F.when(F.length(trimmed) == 0, F.lit(0)).otherwise(
        F.size(F.split(trimmed, r"\s+"))
    )
    punct = F.when(F.length("text") == 0, F.lit(0.0)).otherwise(
        F.length(F.regexp_replace(F.col("text"), r"[a-zA-Z0-9\s]", ""))
        .cast("double") / F.length("text")
    )
    decision = (
        F.when(n_tokens < 5, F.lit("drop:too_short"))
        .when(punct > 0.1, F.lit("drop:punct"))
        .when(~F.col("lang").isin("en", "de", "fr"), F.lit("drop:lang"))
        .otherwise(F.lit("keep"))
    )
    return (
        d.select(F.col("lang"), decision.alias("decision"))
        .groupBy("decision", "lang")
        .agg(F.count(F.lit(1)).alias("n_docs"))
    )


# --- market-basket association rules --------------------------------------

@register(
    "q_brand_affinity",
    oracle="""
    WITH items AS (
      SELECT DISTINCT l_orderkey AS b, p_brand AS i
      FROM lineitem JOIN part ON l_partkey = p_partkey
    ), nb AS (
      SELECT CAST(count(DISTINCT b) AS BIGINT) AS n_baskets FROM items
    ), singles AS (
      SELECT i, CAST(count(*) AS BIGINT) AS n_i FROM items GROUP BY i
    ), freq AS (
      SELECT i, n_i FROM singles, nb WHERE n_i >= 0.015 * n_baskets
    ), pruned AS (
      SELECT b, i FROM items WHERE i IN (SELECT i FROM freq)
    ), pairs AS (
      SELECT a.i AS item_a, c.i AS item_b,
             CAST(count(*) AS BIGINT) AS n_ab
      FROM pruned a JOIN pruned c ON a.b = c.b AND a.i < c.i
      GROUP BY 1, 2
    ), fp AS (
      SELECT item_a, item_b, n_ab
      FROM pairs, nb WHERE n_ab >= 0.015 * n_baskets
    ), both_dirs AS (
      SELECT item_a AS antecedent, item_b AS consequent, n_ab FROM fp
      UNION ALL
      SELECT item_b AS antecedent, item_a AS consequent, n_ab FROM fp
    )
    SELECT antecedent, consequent, n_ab,
           fa.n_i AS n_ante, fc.n_i AS n_cons,
           CAST(n_ab AS DOUBLE) / n_baskets AS support,
           CAST(n_ab AS DOUBLE) / fa.n_i AS confidence,
           (CAST(n_ab AS DOUBLE) * n_baskets)
             / (CAST(fa.n_i AS DOUBLE) * fc.n_i) AS lift
    FROM both_dirs
    JOIN freq fa ON both_dirs.antecedent = fa.i
    JOIN freq fc ON both_dirs.consequent = fc.i
    CROSS JOIN nb
    ORDER BY antecedent, consequent
    """,
)
def q_brand_affinity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket association rules over brands bought together
    (operators/affinity.association_rules): baskets are orders, items
    the DISTINCT part brands in each order. Apriori singleton prune
    before in-JVM per-basket pair generation (infrequent items never
    pair);
    support/confidence/lift are single divisions of exact BIGINT
    counts, so DuckDB replays every float. min_support is a FRACTION
    of baskets — the same query text discriminates at any SF."""
    from oakstore_spark.operators.affinity import association_rules

    li = table(spark, sf_dir, "lineitem")
    pt = table(spark, sf_dir, "part")
    baskets = li.join(
        F.broadcast(pt), li.l_partkey == pt.p_partkey
    ).select("l_orderkey", "p_brand")
    return association_rules(
        baskets, "l_orderkey", "p_brand", min_support=0.015
    ).select(
        "antecedent",
        "consequent",
        "n_ab",
        F.col("n_ante"),
        F.col("n_cons"),
        "support",
        "confidence",
        "lift",
    ).orderBy("antecedent", "consequent")


@register(
    "q_pmi_collocations",
    oracle=f"""
    WITH w AS (
        SELECT string_split({_NORM}, ' ') AS ws FROM documents
    ), bg AS (
        SELECT unnest(list_transform(range(1, len(ws)),
                      i -> {{'w1': ws[i], 'w2': ws[i + 1]}})) AS p
        FROM w WHERE len(ws) >= 2
    ), cnt AS (
        SELECT p.w1 AS w1, p.w2 AS w2,
               CAST(count(*) AS BIGINT) AS n_ab
        FROM bg GROUP BY 1, 2
    ), nt AS (
        SELECT CAST(sum(n_ab) AS BIGINT) AS n FROM cnt
    ), m1 AS (
        SELECT w1, CAST(sum(n_ab) AS BIGINT) AS n_w1 FROM cnt GROUP BY 1
    ), m2 AS (
        SELECT w2, CAST(sum(n_ab) AS BIGINT) AS n_w2 FROM cnt GROUP BY 1
    )
    SELECT cnt.w1, cnt.w2, n_ab, n_w1, n_w2,
           ln(CAST(n_ab AS DOUBLE) * CAST(n AS DOUBLE)
              / (CAST(n_w1 AS DOUBLE) * n_w2)) AS pmi
    FROM cnt
    JOIN m1 ON cnt.w1 = m1.w1
    JOIN m2 ON cnt.w2 = m2.w2
    CROSS JOIN nt
    WHERE n_ab >= 5
    ORDER BY pmi DESC, cnt.w1, cnt.w2
    LIMIT 50
    """,
)
def q_pmi_collocations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-50 PMI collocations over the document corpus
    (operators/text.pmi_collocations): bigram counts from ONE corpus
    pass, marginals and N re-aggregated from the vocabulary-sized
    count relation, min-count 5 suppresses the hapax-PMI explosion,
    TakeOrdered top-k. One ln over one exact-BIGINT division — DuckDB
    replays every float; (w1, w2) is the deterministic tie order."""
    from oakstore_spark.operators.text import pmi_collocations

    d = table(spark, sf_dir, "documents")
    return pmi_collocations(d, "text", min_count=5, top_k=50)


@register(
    "q_item_neighbors",
    oracle="""
    WITH items AS (
      SELECT DISTINCT l_orderkey AS b, p_brand AS i
      FROM lineitem JOIN part ON l_partkey = p_partkey
    ), nb AS (
      SELECT CAST(count(DISTINCT b) AS BIGINT) AS n_baskets FROM items
    ), singles AS (
      SELECT i, CAST(count(*) AS BIGINT) AS n_i FROM items GROUP BY i
    ), freq AS (
      SELECT i, n_i FROM singles, nb WHERE n_i >= 0.015 * n_baskets
    ), pruned AS (
      SELECT b, i FROM items WHERE i IN (SELECT i FROM freq)
    ), pairs AS (
      SELECT a.i AS item_a, c.i AS item_b,
             CAST(count(*) AS BIGINT) AS n_ab
      FROM pruned a JOIN pruned c ON a.b = c.b AND a.i < c.i
      GROUP BY 1, 2
    ), fp AS (
      SELECT item_a, item_b, n_ab
      FROM pairs, nb WHERE n_ab >= 0.015 * n_baskets
    ), both_dirs AS (
      SELECT item_a AS item, item_b AS neighbor, n_ab FROM fp
      UNION ALL
      SELECT item_b, item_a, n_ab FROM fp
    ), scored AS (
      SELECT item, neighbor, n_ab,
             CAST(n_ab AS DOUBLE)
               / sqrt(CAST(fa.n_i AS DOUBLE) * fc.n_i) AS cosine
      FROM both_dirs
      JOIN freq fa ON both_dirs.item = fa.i
      JOIN freq fc ON both_dirs.neighbor = fc.i
    ), ranked AS (
      SELECT *, CAST(row_number() OVER (PARTITION BY item
                 ORDER BY cosine DESC, neighbor) AS INT) AS rank
      FROM scored
    )
    SELECT item, neighbor, n_ab, cosine, rank
    FROM ranked WHERE rank <= 3 ORDER BY item, rank
    """,
)
def q_item_neighbors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 also-bought brand neighbors by co-occurrence cosine
    (operators/affinity.item_neighbors — the memory-based
    collaborative-filtering rung on frequent_pairs): one division and
    one sqrt over exact BIGINT counts, ranked per item by the pinned
    (cosine desc, neighbor) tie rule; the ranking window runs over the
    item-universe-sized pair relation, never the basket stream."""
    from oakstore_spark.operators.affinity import item_neighbors

    li = table(spark, sf_dir, "lineitem")
    pt = table(spark, sf_dir, "part")
    baskets = li.join(
        F.broadcast(pt), li.l_partkey == pt.p_partkey
    ).select("l_orderkey", "p_brand")
    return item_neighbors(
        baskets, "l_orderkey", "p_brand", min_support=0.015, top_k=3
    ).orderBy("item", "rank")
