"""Physical-plan audits: the scale properties (partition pruning, filter
pushdown, column pruning, broadcast joins) must be visible in the plan,
not assumed. These guard against regressions that stay correct but stop
scaling (SURVEY.md §4)."""

from __future__ import annotations

import contextlib
import io

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F


def plan_of(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


SF_DIR = "/root/testdata/sf0.001"


def test_store_range_query_prunes_partitions(store):
    idx = pd.date_range("2019-06-01", periods=900, freq="D")  # 2019-2021
    df = pd.DataFrame(
        {"Open": np.ones(900), "High": np.ones(900), "Low": np.ones(900),
         "Close": np.ones(900), "Volume": np.ones(900, dtype=int)},
        index=idx,
    )
    store["PRUNE"] = df
    scan = store["PRUNE"].df(pd.Timestamp("2020-02-01"), pd.Timestamp("2020-03-01"))
    plan = plan_of(scan)
    # year-partition pruning reaches the scan...
    assert "PartitionFilters" in plan and "_oak_year" in plan
    # ...and the exact DATE range is pushed to parquet row groups
    assert "PushedFilters" in plan
    assert "GreaterThanOrEqual(DATE" in plan and "LessThanOrEqual(DATE" in plan


def test_q01_pushdown_and_column_pruning(spark):
    from oakstore_spark.queries import QUERIES, load_all

    load_all()
    plan = plan_of(QUERIES["q01_pricing_summary"](spark, SF_DIR))
    assert "PushedFilters" in plan and "LessThanOrEqual(l_shipdate" in plan
    # column pruning: the scan reads only the 7 needed columns
    read_schema = [l for l in plan.splitlines() if "ReadSchema" in l][0]
    assert "l_orderkey" not in read_schema  # unused column stays unread
    assert "l_quantity" in read_schema


def test_q03_broadcasts_dimensions(spark):
    from oakstore_spark.queries import QUERIES, load_all

    load_all()
    plan = plan_of(QUERIES["q03_shipping_priority"](spark, SF_DIR))
    assert "BroadcastHashJoin" in plan
    assert "EqualTo(c_mktsegment,BUILDING)" in plan  # dim filter pushed


def test_asof_join_is_single_shuffle_union(spark):
    """The as-of join must not contain a nested-loop or cartesian join —
    it compiles to union + window (one exchange on the keys)."""
    from oakstore_spark.queries import QUERIES, load_all

    load_all()
    plan = plan_of(QUERIES["q_asof_purchase_view"](spark, SF_DIR))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "Window" in plan


def test_range_join_events_is_equi_join(spark):
    """The bucketed time self-join must be a hash-partitionable equi-join
    (SortMergeJoin/ShuffledHashJoin/BroadcastHashJoin), never a pure
    nested loop over the inequality predicate."""
    from oakstore_spark.queries import QUERIES, load_all

    load_all()
    plan = plan_of(QUERIES["q_range_join_events"](spark, SF_DIR))
    assert "CartesianProduct" not in plan
    assert any(j in plan for j in ("SortMergeJoin", "ShuffledHashJoin", "BroadcastHashJoin"))


def test_rank_funcs_single_window_node(spark):
    """Six ranking/navigation functions over one window spec must
    evaluate in ONE Window operator (one sort per partition), not six."""
    from oakstore_spark.queries import QUERIES, load_all

    load_all()
    plan = plan_of(QUERIES["q_rank_funcs"](spark, SF_DIR))
    assert plan.count("Window") - plan.count("WindowGroupLimit") <= 2
    assert "percent_rank" in plan and "cume_dist" in plan


def test_bucketed_join_needs_no_shuffle(spark, tmp_path):
    """Co-located (bucketed) joins: two tables bucketed+sorted on the
    join key must hash-join with NO Exchange on either side — the
    pre-partitioning pattern that turns a repeated 100 TB shuffle join
    into a scan-local merge. (Broadcast is disabled for the check so the
    bucket path, not the small-table path, is what's exercised.)"""
    orders = spark.read.parquet(f"{SF_DIR}/orders.parquet")
    customer = spark.read.parquet(f"{SF_DIR}/customer.parquet")
    orders.write.bucketBy(8, "o_custkey").sortBy("o_custkey").saveAsTable("t_orders_b")
    customer.write.bucketBy(8, "c_custkey").sortBy("c_custkey").saveAsTable("t_cust_b")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        joined = spark.table("t_orders_b").join(
            spark.table("t_cust_b"),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        plan = plan_of(joined)
        assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan
        assert "Exchange" not in plan  # bucket layout replaces the shuffle
        # sanity: result matches the plain join
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
        plain = orders.join(customer, F.col("o_custkey") == F.col("c_custkey"))
        assert joined.count() == plain.count()
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
        spark.sql("DROP TABLE IF EXISTS t_orders_b")
        spark.sql("DROP TABLE IF EXISTS t_cust_b")


def test_unpivot_is_single_shuffle_expand(spark):
    """The melt must compile to a map-side Expand (no join, no extra
    exchange) — one shuffle total, for the 3-group aggregation."""
    from oakstore_spark.queries import QUERIES, load_all

    load_all()
    plan = plan_of(QUERIES["q_unpivot_measures"](spark, SF_DIR))
    assert "Expand" in plan
    # one Exchange node in the tree (details section repeats the name)
    assert plan.count("+- Exchange") == 1


def test_bigram_mass_broadcasts_count(spark):
    """The vocabulary-sized bigram-count relation must broadcast: the
    corpus-sized exploded side shuffles once (for the per-doc rollup),
    never on the bigram key."""
    from oakstore_spark.queries import QUERIES, load_all

    load_all()
    plan = plan_of(QUERIES["q_bigram_mass"](spark, SF_DIR))
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan and "ShuffledHashJoin" not in plan


def test_approx_percentiles_close_to_exact(spark):
    """The sketch sibling must stay within 1% relative error of the
    exact interpolated percentiles (accuracy=10000 gives ~1e-4 rank
    error; 1% value error is a loose, stable bound)."""
    from oakstore_spark.queries import QUERIES, load_all

    load_all()
    exact = QUERIES["q_percentiles"](spark, SF_DIR).toPandas().set_index("l_returnflag")
    approx = (
        QUERIES["q_approx_percentiles"](spark, SF_DIR).toPandas().set_index("l_returnflag")
    )
    assert set(exact.index) == set(approx.index)
    for flag in exact.index:
        for c in ("p50", "p90", "p99"):
            e, a = float(exact.loc[flag, c]), float(approx.loc[flag, c])
            assert abs(a - e) / e < 0.01, (flag, c, e, a)


def test_sketch_deciles_no_global_sort_and_balanced(spark):
    """The sketch decile assignment must plan with NO single-partition
    global sort (the scale defect of exact ntile) and still produce
    near-balanced buckets."""
    from oakstore_spark.queries import QUERIES, load_all

    load_all()
    df = QUERIES["q_spend_deciles_sketch"](spark, SF_DIR)
    plan = plan_of(df)
    import re

    assert "+- Window" not in plan  # no window-function path
    assert not re.search(r"\bntile\(", plan)
    assert "+- Sort" not in plan  # no sort anywhere, global or local
    got = df.toPandas().sort_values("decile")
    assert list(got["decile"]) == list(range(1, 11))
    n = got["n_customers"].to_numpy()
    assert n.max() <= 1.25 * n.min()  # sketch buckets stay near-balanced


def test_tfidf_broadcasts_vocab_and_count(spark):
    """Document frequency (vocabulary-sized) and the corpus count
    (1 row) must come back as broadcast joins — the corpus-sized tf
    side is never reshuffled for the join."""
    from oakstore_spark.queries import QUERIES, load_all

    load_all()
    plan = plan_of(QUERIES["q_tfidf_top_terms"](spark, SF_DIR))
    assert plan.count("+- BroadcastHashJoin") == 1  # tf ⋈ doc-frequency
    assert plan.count("+- BroadcastNestedLoopJoin") == 1  # × 1-row count
    assert "SortMergeJoin" not in plan


def test_join_strategy_hints_respected(spark):
    """The engine exposes all three equi-join strategies; hints must
    survive planning (broadcast is the optimizer default for small
    sides, merge/shuffle_hash are the scale escape hatches when the
    build side can't fit or stats mislead)."""
    a = spark.range(0, 10_000).withColumnRenamed("id", "k")
    b = spark.range(0, 10_000).withColumnRenamed("id", "k")
    merge_plan = a.join(b.hint("merge"), "k")._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" in merge_plan
    shuffle_plan = a.join(b.hint("shuffle_hash"), "k")._jdf.queryExecution().executedPlan().toString()
    assert "ShuffledHashJoin" in shuffle_plan
    bcast_plan = a.join(b.hint("broadcast"), "k")._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in bcast_plan


def test_hll_sketch_merge_equals_direct_and_bounded_error(spark):
    """The union of per-group HLL sketches must estimate EXACTLY what a
    direct global sketch estimates (register-max merging is
    order-independent), and land within 5% of the exact distinct
    count."""
    from pyspark.sql import functions as F

    e = spark.read.parquet("/root/testdata/sf0.01/events.parquet")
    per_type = e.groupBy("event_type").agg(
        F.hll_sketch_agg("user_id", 12).alias("sk")
    )
    merged = per_type.agg(
        F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("est")
    ).first()["est"]
    direct = e.agg(
        F.hll_sketch_estimate(F.hll_sketch_agg("user_id", 12)).alias("est")
    ).first()["est"]
    exact = e.select("user_id").distinct().count()
    assert merged == direct, (merged, direct)
    assert abs(merged - exact) / exact < 0.05, (merged, exact)


def test_ohlc_candles_plan_single_exchange_no_window(spark):
    """Candlestick construction must stay ONE aggregate over ONE
    exchange with no Window operator. (min_by/max_by with a string tie
    key evaluates as SortAggregate — a partition-local sort by group
    key; acceptable. A window formulation would add running state and a
    second pass.)"""
    import __spark_entry__ as entrymod

    df = entrymod.queries()["q_ohlc_candles"](spark, SF_DIR)
    plan = plan_of(df)
    assert "Aggregate" in plan
    assert "Window" not in plan
    assert plan.count("Exchange (") == 1, plan  # tree nodes, not detail dups


def test_fuzzy_match_pairs_distinct_names_not_rows(spark):
    """The fuzzy-match join must consume the distinct-name aggregate on
    BOTH sides (an aggregate below each join input), never the raw part
    scan — pairing raw rows is quadratic in corpus size."""
    import __spark_entry__ as entrymod

    df = entrymod.queries()["q_fuzzy_name_match"](spark, SF_DIR)
    plan = plan_of(df)
    # two grouping aggregates (one per join side, possibly deduped via
    # exchange reuse) must appear between scan and join
    assert plan.count("HashAggregate") >= 2
    assert "levenshtein" in plan


def test_dynamic_partition_pruning_on_year_layout(spark, tmp_path):
    """Dynamic partition pruning must fire on the hive year-partitioned
    layout the store writes: joining the fact scan to a FILTERED dim on
    the partition column injects a dynamicpruning subquery into the
    scan's PartitionFilters — at 100 TB the join's build side decides
    at runtime which year directories are read at all."""
    d = str(tmp_path / "dpp_fact")
    spark.range(0, 50_000).select(
        F.col("id"),
        (F.col("id") % 5 + 2018).alias("yr"),
        (F.col("id") * 1.0).alias("v"),
    ).write.partitionBy("yr").parquet(d)
    fact = spark.read.parquet(d)
    dim = spark.createDataFrame(
        [(2019, "keep"), (2020, "keep"), (2021, "drop")], ["yr", "tag"]
    )
    j = fact.join(dim.where(F.col("tag") == "keep"), "yr").agg(F.sum("v"))
    plan = plan_of(j)
    assert "dynamicpruning" in plan.lower(), plan
    assert "PartitionFilters" in plan


def test_runtime_bloom_filter_injected_on_shuffle_join(spark, tmp_path):
    """When a selective dim filter feeds a SHUFFLE join, Spark's runtime
    bloom filter must inject a might_contain pre-filter on the fact
    scan side — at 100 TB this drops most fact rows before the
    exchange. (Thresholds lowered to fire at test scale; broadcast
    disabled because a broadcast join subsumes the optimization.)"""
    fact_p = str(tmp_path / "bf_fact")
    dim_p = str(tmp_path / "bf_dim")
    spark.range(0, 100_000).select(
        F.col("id"), (F.col("id") % 1000).alias("k"), (F.col("id") * 1.0).alias("v")
    ).write.parquet(fact_p)
    spark.range(0, 1000).select(
        F.col("id").alias("k"), (F.col("id") % 7).alias("grp")
    ).write.parquet(dim_p)
    fact, dim = spark.read.parquet(fact_p), spark.read.parquet(dim_p)

    tweaked = {
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "0",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
    }
    saved = {k: spark.conf.get(k) for k in tweaked}
    try:
        for k, v in tweaked.items():
            spark.conf.set(k, v)
        j = fact.join(dim.where(F.col("grp") == 3), "k").agg(F.sum("v"))
        plan = plan_of(j)
    finally:
        for k, v in saved.items():
            spark.conf.set(k, v)
    assert "might_contain" in plan, plan


def test_aqe_splits_skewed_join_partitions(spark):
    """AQE must mark and split the skewed partition of a hot-key join
    at runtime (SortMergeJoin(skew=true) in the final adaptive plan) —
    the mechanism SCALING.md leans on for hot LSH buckets and viral
    span digests. Thresholds lowered so the fixture-scale hot key
    qualifies; restored afterwards."""
    tweaked = {
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "8KB",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "8KB",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
    }
    saved = {k: spark.conf.get(k) for k in tweaked}
    try:
        for k, v in tweaked.items():
            spark.conf.set(k, v)
        left = spark.range(0, 300_000).select(
            F.when(F.col("id") % 10 < 9, 7)
            .otherwise(F.col("id") % 1000)
            .alias("k"),
            F.col("id").alias("v"),
        )
        right = spark.range(0, 1000).select(
            F.col("id").alias("k"), (F.col("id") * 2).alias("w")
        )
        j = left.join(right, "k").agg(F.count(F.lit(1)))
        j.collect()  # AQE decides skew handling at runtime
        plan = plan_of(j)
    finally:
        for k, v in saved.items():
            spark.conf.set(k, v)
    assert "skew=true" in plan, plan


def test_source_overlap_broadcasts_sizes_no_cartesian(spark):
    """q_source_overlap: the per-source vocabulary-size relation (S rows)
    must broadcast onto the pair counts, and the term self-join must be
    an equi-join (hash/sort-merge on term), never a cartesian."""
    from oakstore_spark.queries.curation import q_source_overlap

    plan = plan_of(q_source_overlap(spark, SF_DIR))
    assert plan.count("BroadcastHashJoin") >= 2
    assert "CartesianProduct" not in plan


def test_quality_weighted_sample_broadcasts_scalar_max(spark):
    """q_quality_weighted_sample: the 1-row corpus-max relation joins as
    a broadcast nested loop (scalar broadcast), keeping the per-doc keep
    decision fully map-side — no shuffle of the documents relation
    before the final small groupBy."""
    from oakstore_spark.queries.curation import q_quality_weighted_sample

    plan = plan_of(q_quality_weighted_sample(spark, SF_DIR))
    assert "BroadcastNestedLoopJoin" in plan
    assert "CartesianProduct" not in plan


def test_skew_profile_windows_run_on_aggregated_keys(spark):
    """q_skew_profile: the ranking window must consume the OUTPUT of the
    count-by-key hash aggregate (tiny key table), not the raw events —
    i.e. the plan has a partial+final HashAggregate below the Window."""
    from oakstore_spark.queries.curation import q_skew_profile

    plan = plan_of(q_skew_profile(spark, SF_DIR))
    assert "Window" in plan and "HashAggregate" in plan
    # the raw-events scan must prune to the single key column
    assert "ReadSchema: struct<user_id" in plan


def test_assign_ids_no_window_no_single_partition(spark):
    """q_assign_ids must number rows via rangepartitioning + offsets,
    never the empty-key Window that funnels everything into one task.
    The public entry truncates lineage with a local checkpoint (so its
    cache is GC-released, not leaked), so the exchange stage is pinned
    via the internal _range_sorted plan and the final plan is pinned
    Window/SinglePartition-free."""
    from oakstore_spark.operators.scaling import _range_sorted
    from oakstore_spark.queries.training_ext import q_assign_ids
    from oakstore_spark.sources.tables import table

    docs = table(spark, SF_DIR, "documents").select("doc_id")
    stage = plan_of(_range_sorted(docs, 8, "doc_id"))
    assert "rangepartitioning" in stage
    assert "Window" not in stage and "SinglePartition" not in stage

    plan = plan_of(q_assign_ids(spark, SF_DIR))
    assert "Window" not in plan
    assert "SinglePartition" not in plan

    # the checkpoint could hide a pre-truncation Window from plan_of, so
    # also pin at source level (docstring/comments stripped via ast)
    # that the numbering path IS the range-sorted stage checked above,
    # with no Window anywhere before the truncation
    import ast
    import inspect
    import textwrap

    from oakstore_spark.operators import scaling

    fn = ast.parse(
        textwrap.dedent(inspect.getsource(scaling.assign_contiguous_ids))
    ).body[0]
    body = fn.body[1:] if isinstance(fn.body[0], ast.Expr) else fn.body
    code = "\n".join(ast.unparse(stmt) for stmt in body)
    assert "_range_sorted(" in code
    assert "Window" not in code and "row_number" not in code


def test_bucketed_tables_join_without_exchange(spark, tmp_path):
    """Bucketing is THE shuffle-elimination lever for repeated big-big
    joins at 100 TB: two tables bucketed+sorted on the join key with the
    same bucket count must sort-merge join with NO hashpartitioning
    exchange on either side (co-located partitions, scan-to-join)."""
    import uuid

    left = spark.range(0, 50_000).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("a")
    )
    right = spark.range(0, 50_000).select(
        F.col("id").alias("k"), (F.col("id") * 3).alias("b")
    )
    ln = f"bkt_l_{uuid.uuid4().hex[:8]}"
    rn = f"bkt_r_{uuid.uuid4().hex[:8]}"
    old_thr = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        (left.write.bucketBy(8, "k").sortBy("k")
             .option("path", str(tmp_path / "l")).saveAsTable(ln))
        (right.write.bucketBy(8, "k").sortBy("k")
             .option("path", str(tmp_path / "r")).saveAsTable(rn))
        joined = spark.table(ln).join(spark.table(rn), "k")
        plan = plan_of(joined)
        assert "SortMergeJoin" in plan
        assert "Exchange hashpartitioning" not in plan, (
            "bucketed join must not reshuffle either side"
        )
        assert joined.count() == 50_000
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old_thr)
        spark.sql(f"DROP TABLE IF EXISTS {ln}")
        spark.sql(f"DROP TABLE IF EXISTS {rn}")


def test_global_sample_compiles_to_take_ordered(spark):
    """orderBy+limit must plan as TakeOrderedAndProject (bounded per-
    partition heaps + K-merge), never a global Sort feeding a Limit."""
    from oakstore_spark.queries.training_ext import q_global_sample_topk

    plan = plan_of(q_global_sample_topk(spark, SF_DIR))
    assert "TakeOrderedAndProject" in plan
    assert "Exchange rangepartitioning" not in plan


def test_bloom_prefiltered_join_plan_and_equivalence(spark):
    """The explicit bloom pre-filter must appear as might_contain in
    the plan, and the result must equal the plain join exactly."""
    from oakstore_spark.queries.relational_ext import q_bloom_prefiltered_join

    df = q_bloom_prefiltered_join(spark, SF_DIR)
    plan = plan_of(df)
    assert "LeftSemi" in plan and "_bpos" in plan
    got = {r["c_mktsegment"]: (r["n_orders"], r["revenue"])
           for r in df.collect()}
    o = spark.read.parquet(f"{SF_DIR}/orders.parquet")
    c = spark.read.parquet(f"{SF_DIR}/customer.parquet")
    ref = {
        r["c_mktsegment"]: (r["n"], r["rev"])
        for r in (
            o.join(c, o.o_custkey == c.c_custkey)
            .where(F.col("c_acctbal") > 9000)
            .groupBy("c_mktsegment")
            .agg(F.count(F.lit(1)).alias("n"),
                 F.round(F.sum("o_totalprice"), 2).alias("rev"))
        ).collect()
    }
    assert got == ref


def test_release_tracked_frees_registered_query_persists(spark):
    """Registered queries that persist internal relations
    (track_persisted) must not pin storage across queries in sessions
    that never clearCache(): invoking the NEXT registered query drains
    the tracked-handle registry."""
    from oakstore_spark.operators import scaling
    from oakstore_spark.queries import QUERIES, load_all

    load_all()
    sf = "/root/testdata/sf0.001"
    before = len(scaling._TRACKED_HANDLES)
    df = QUERIES["q_phash_near_dup"](spark, sf)
    df.count()
    handles = list(scaling._TRACKED_HANDLES[before:])
    assert handles, "q_phash_near_dup should track its persisted sigs"
    assert any(h.storageLevel.useMemory for h in handles)
    # the next registered query call releases everything outstanding
    QUERIES["q_phash_dedup"](spark, sf).count()
    assert all(not h.storageLevel.useMemory for h in handles)
    scaling.release_tracked()


def test_active_users_no_fanout_join(spark):
    """rolling_active_users must compile to equi-joins on the day key
    only — the interval-difference trick's whole point is avoiding the
    w-times range-join fan-out (no NestedLoop, no Cartesian, no
    non-equi day BETWEEN condition in any join)."""
    from oakstore_spark.queries import QUERIES, load_all

    load_all()
    plan = plan_of(QUERIES["q_active_users"](spark, SF_DIR))
    assert "NestedLoop" not in plan and "Cartesian" not in plan
    # every join line is a SortMergeJoin/ShuffledHashJoin/Broadcast on
    # the day equi-key; a range join would print a join CONDITION with
    # >= between day columns
    join_lines = [
        ln for ln in plan.splitlines() if "Join" in ln
    ]
    assert join_lines, "expected joins on the day grid"
    assert not any(">=" in ln for ln in join_lines), join_lines


def test_covariate_balance_single_aggregate(spark):
    """All covariates' moments must come from ONE corpus aggregate —
    the plan may contain exactly one pair of partial/final
    HashAggregate over the unit relation (plus the per-user build),
    never one scan per covariate."""
    from oakstore_spark.queries import QUERIES, load_all

    load_all()
    plan = plan_of(QUERIES["q_covariate_balance"](spark, SF_DIR))
    # one scan NODE of the events table only (the formatted plan
    # prints each node twice: tree + detail — count detail headers)
    scans = [
        ln for ln in plan.splitlines()
        if ln.startswith("(") and "Scan parquet" in ln
    ]
    assert len(scans) == 1, scans


def test_mmr_candidates_take_ordered_no_single_partition(spark):
    """mmr_topk stage-1 candidate selection must compile to
    TakeOrderedAndProject (bounded per-partition heaps), never a
    SinglePartition Sort or an empty-key row_number Window over the
    corpus-sized relevance relation."""
    from oakstore_spark.operators.similarity import _mmr_candidates
    from oakstore_spark.sources.tables import table

    emb = table(spark, SF_DIR, "embeddings")
    base = emb.select(
        F.col("vec_id").alias("id"),
        F.transform(
            F.col("embedding"),
            lambda x: F.floor(x * 1024).cast("bigint"),
        ).alias("vq"),
    )
    rel = F.aggregate(
        F.transform(F.col("vq"), lambda v: v * 2),
        F.lit(0).cast("bigint"),
        lambda acc, x: acc + x,
    )
    plan = plan_of(_mmr_candidates(base, 0, rel, 64))
    assert "TakeOrderedAndProject" in plan
    assert "Window" not in plan
    assert "SinglePartition" not in plan


def test_qini_curve_no_global_window(spark):
    """qini_curve must derive its global (score desc, id) rank via
    scaling.assign_contiguous_ids (range-partition + offsets) and take
    n from the same counts pass — never row_number/count over an
    empty-key Window that funnels the unit population through one
    task. Pinned two ways: the final plan carries no Window /
    SinglePartition, and (the checkpoint could hide a pre-truncation
    Window from plan_of) the operator source routes the rank through
    assign_contiguous_ids with no window machinery anywhere."""
    import ast
    import inspect
    import textwrap

    from oakstore_spark.operators import experiments
    from oakstore_spark.queries import QUERIES, load_all

    load_all()
    plan = plan_of(QUERIES["q_qini_curve"](spark, SF_DIR))
    assert "Window" not in plan
    assert "SinglePartition" not in plan

    fn = ast.parse(
        textwrap.dedent(inspect.getsource(experiments.qini_curve))
    ).body[0]
    body = fn.body[1:] if isinstance(fn.body[0], ast.Expr) else fn.body
    code = "\n".join(ast.unparse(stmt) for stmt in body)
    assert "assign_contiguous_ids(" in code
    assert "Window" not in code and "row_number" not in code


def test_roc_auc_ranks_distinct_scores_not_rows(spark):
    """roc_auc's prefix window must consume the OUTPUT of the
    distinct-score hash aggregate (score-cardinality-bounded), never
    the unit-level relation — the plan carries a HashAggregate below
    the Window, and the scan prunes to the score/label columns."""
    from oakstore_spark.queries import QUERIES, load_all

    load_all()
    plan = plan_of(QUERIES["q_roc_auc"](spark, SF_DIR))
    assert "Window" in plan and "HashAggregate" in plan
    # the window input is the aggregate: the plan section for the
    # Window lists its child as an Aggregate/Exchange, and the only
    # scan reads the events columns the score needs
    assert "ReadSchema" in plan


def test_bench_retired_queries_have_recorded_debut_timing():
    """Retirement precondition (r12 verdict ask #7): every member of
    BENCH_RETIRED must carry a recorded debut timing in
    BENCH_DEBUTS.json — the retirement policy's value is that every
    plan shape was MEASURED at least once before it left the timing
    loop. Debut entries must name the committed blob they came from."""
    import json
    from pathlib import Path

    from oakstore_spark.queries import BENCH_RETIRED, QUERIES, load_all

    load_all()
    debuts = json.loads(
        Path(__file__).resolve().parent.parent.joinpath(
            "BENCH_DEBUTS.json"
        ).read_text()
    )["debuts"]
    missing = sorted(BENCH_RETIRED - set(debuts))
    assert not missing, (
        f"retired without a recorded debut timing: {missing} — run a "
        "bench with the query in the loop and record it in "
        "BENCH_DEBUTS.json before adding it to BENCH_RETIRED"
    )
    for name, d in debuts.items():
        assert d["sec"] >= 0 and d["commit"] and d["sf"], name
    # retired names must stay registered (retirement is bench-only)
    assert BENCH_RETIRED <= set(QUERIES)


def test_acf_pacf_single_window_pass(spark):
    """acf_pacf computes ALL lag columns in ONE keyed window pass (a
    single Window node / one exchange+sort per key) and its algebra
    runs on the keys-sized aggregate — the plan carries exactly one
    Window, a HashAggregate above it, and never a SinglePartition."""
    from oakstore_spark.operators.timeseries import acf_pacf
    from oakstore_spark.sources import table

    e = table(spark, SF_DIR, "events").select(
        "user_id", "ts", "event_id",
        F.round(F.col("value") * 100).cast("bigint").alias("cents"),
    )
    out = acf_pacf(
        e, "ts", ["user_id"], "cents", max_lag=4,
        order_tiebreak=["event_id"],
    )
    plan = plan_of(out)
    # formatted plans print each node twice (tree line + detail
    # header), so ONE Window node == exactly two mentions
    assert plan.count("Window") == 2
    assert "HashAggregate" in plan
    assert "SinglePartition" not in plan


def test_dp_histogram_single_aggregate_broadcast_grid(spark):
    """dp_histogram's corpus work is ONE hash aggregate; the bin grid
    joins via broadcast and the noise is map-side on the bounded
    relation — no window, no SinglePartition, no second scan."""
    from oakstore_spark.operators.pii import dp_histogram
    from oakstore_spark.sources import table

    e = table(spark, SF_DIR, "events")
    plan = plan_of(
        dp_histogram(
            e, "value", 0.5, 10, 0.0, 500.0, replay_salt="h"
        )
    )
    assert "HashAggregate" in plan
    assert "BroadcastHashJoin" in plan
    assert "Window" not in plan
    # one scan node (formatted plans mention each node twice)
    assert plan.count("Scan parquet") == 2


def test_fairness_report_single_scan_cell_bounded(spark):
    """r15: fairness_report must derive AUC + calibration + Brier from
    ONE scan — exactly one FileScan in the plan, the keyed prefix
    window consuming the (keys x score) hash aggregate, and no join
    (the two-level rollup replaces it)."""
    from oakstore_spark.queries import QUERIES, load_all

    load_all()
    plan = plan_of(QUERIES["q_fairness_slices"](spark, SF_DIR))
    # formatted mode prints each scan twice (tree node + detail
    # section): exactly one physical scan == exactly two mentions
    assert plan.count("Scan parquet") == 2
    assert "Window" in plan and "HashAggregate" in plan
    assert "Join" not in plan


def test_rank_sum_and_trimmed_mean_cell_bounded(spark):
    """r15: rank_sum_test / trimmed_mean_diff rank DISTINCT-value
    cells, never unit rows — HashAggregate below the Window, single
    scan, no cartesian/join machinery."""
    from oakstore_spark.queries import QUERIES, load_all

    load_all()
    plan = plan_of(QUERIES["q_rank_sum"](spark, SF_DIR))
    assert "HashAggregate" in plan
    assert "CartesianProduct" not in plan
    assert plan.count("Scan parquet") == 2  # one physical scan

    # trimmed_mean returns a driver-built single row (the scan runs
    # inside its bounded per-arm collect), so pin the SOURCE: the
    # rank arithmetic must run on the per-arm distinct-value cells
    # (groupBy + arm-partitioned window), never a unit-level sort
    import ast
    import inspect
    import textwrap

    from oakstore_spark.operators import experiments

    code = textwrap.dedent(
        inspect.getsource(experiments.trimmed_mean_diff)
    )
    fn = ast.parse(code).body[0]
    body = fn.body[1:] if isinstance(fn.body[0], ast.Expr) else fn.body
    tree = "\n".join(ast.unparse(stmt) for stmt in body)
    assert "partitionBy('arm')" in tree.replace('"', "'")
    assert ".groupBy(" in tree
    assert "orderBy" in tree  # cell-level only (inside the window)
    assert "approx" not in tree  # exact order statistics, no sketch
