"""A/B experiment analysis — the full experimentation lifecycle.

EXT — the reference (`/root/reference/oakstore/store.py:1-267`) has no
statistical operators; this module covers the pipeline an experiment
platform actually runs, in order:

- DESIGN: :func:`power_analysis` (sample size / MDE from measured
  variance), :func:`covariate_balance` (SMD randomization check),
  :func:`srm_check` (the sample-ratio trust gate).
- READOUT: :func:`welch_ttest` (unequal-variances means),
  :func:`proportion_ztest` (conversion rates), :func:`cuped_adjust`
  (pre-period variance reduction, Deng et al. 2013),
  :func:`post_stratified_mean` (categorical-covariate reweighting),
  :func:`ratio_metric_ci` (delta-method CI for ratio-of-sums metrics,
  Deng et al. 2018), :func:`robust_metric_summary`
  (trimmed/winsorized means), :func:`quantile_treatment_effects`
  (where in the distribution the effect acts),
  :func:`poisson_bootstrap_ci` (the distributed bootstrap, Chamandy
  et al. 2012).
- SEQUENTIAL: :func:`msprt` and :func:`msprt_curve` (always-valid
  peek-proof inference, Johari et al. 2017).
- QUASI-EXPERIMENTAL / TARGETING: :func:`diff_in_diff` (parallel
  trends), :func:`kaplan_meier` (censoring-aware time-to-event),
  :func:`logrank_test` (the two-curve verdict, Mantel 1966),
  :func:`ipw_ate` (inverse-propensity weighting under
  unconfoundedness), :func:`qini_curve` (uplift-model evaluation,
  Radcliffe 2007), :func:`uplift_two_model` (T-learner uplift
  scoring scored by the Qini curve).

Spark shape: every statistic here is ONE hash aggregate over the
metric stream (map-side partials, no window, no sort) producing a
per-arm row of exact BIGINT moment sums; the final float formula runs
on the tiny per-arm relation.  At 100 TB the scan dominates and is
embarrassingly parallel; nothing downstream grows with data size.

Float contract (oracle-replayable): metrics enter as exact integers
(the callers pass integer cents / 0-1 flags), so Σx, Σx², Σxy, n are
exact BIGINTs whose float combinations are pinned single expressions —
no float accumulation across rows, every output replays bit-for-bit
in DuckDB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def _moment_sums(df: DataFrame, arm_col: str, value_col: str) -> DataFrame:
    """Per-arm (n, Σx, Σx²) as exact BIGINTs — value_col must already
    be integer-typed (cents, counts, 0/1 flags)."""
    x = F.col(value_col).cast("bigint")
    return df.groupBy(F.col(arm_col).alias("arm")).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(x).alias("sx"),
        F.sum(x * x).alias("sx2"),
    )


def rank_sum_test(
    df: DataFrame,
    arm_col: str,
    value_col: str,
    arm_a,
    arm_b,
) -> DataFrame:
    """Wilcoxon–Mann–Whitney rank-sum test (Mann & Whitney 1947) —
    the distribution-free A/B verdict :func:`welch_ttest` cannot give
    on heavy-tailed metrics (revenue, latency): U counts how often an
    arm-a value beats an arm-b value (ties half), and under H0

        E[U] = n_a n_b / 2
        Var[U] = n_a n_b (n+1)/12  −  n_a n_b Σ(t³−t) / (12 n (n−1))

    with t the pooled tie-group sizes — the tie-corrected normal
    approximation, z = (U − E[U]) / sqrt(Var[U]).

    ``value_col`` integer-valued (the family contract), which makes
    2U an exact BIGINT via the same rank identity :func:`~oakstore_
    spark.operators.quality.roc_auc` uses (arm-a plays the positive
    class) and Σ(t³−t) an exact BIGINT over the pooled distinct-value
    cells. Spark shape: ONE hash aggregate to the distinct-value
    relation, one prefix window bounded by value cardinality, one
    rollup; z is one pinned chain. Returns one row: (n_a, n_b,
    n_values, u2, tie_cubes, z, auc_a) — ``auc_a`` = U/(n_a n_b), the
    effect-size companion (P(a > b) + ties/2); z NULL when an arm is
    empty or Var ≤ 0 (all values tied).
    """
    from pyspark.sql import Window as W

    v = F.col(value_col).cast("bigint")
    ia = F.when(F.col(arm_col) == arm_a, 1).otherwise(0)
    ib = F.when(F.col(arm_col) == arm_b, 1).otherwise(0)
    per_v = (
        df.where((F.col(arm_col) == arm_a) | (F.col(arm_col) == arm_b))
        .groupBy(v.alias("v"))
        .agg(
            F.sum(ia).cast("bigint").alias("na_v"),
            F.sum(ib).cast("bigint").alias("nb_v"),
        )
    )
    wpre = W.orderBy("v").rowsBetween(W.unboundedPreceding, -1)
    staged = per_v.select(
        "v",
        "na_v",
        "nb_v",
        F.coalesce(F.sum("nb_v").over(wpre), F.lit(0)).alias(
            "cum_b_below"
        ),
    )
    t = (F.col("na_v") + F.col("nb_v")).cast("bigint")
    agg = staged.agg(
        F.sum("na_v").cast("bigint").alias("n_a"),
        F.sum("nb_v").cast("bigint").alias("n_b"),
        F.count(F.lit(1)).cast("bigint").alias("n_values"),
        F.sum(
            F.col("na_v") * (2 * F.col("cum_b_below") + F.col("nb_v"))
        ).cast("bigint").alias("u2"),
        F.sum(t * t * t - t).cast("bigint").alias("tie_cubes"),
    )
    na = F.col("n_a").cast("double")
    nb = F.col("n_b").cast("double")
    n = (F.col("n_a") + F.col("n_b")).cast("double")
    var_u = na * nb * (n + 1) / 12.0 - na * nb * F.col(
        "tie_cubes"
    ).cast("double") / (12.0 * n * (n - 1))
    u = F.col("u2").cast("double") / 2.0
    z = F.when(
        (F.col("n_a") > 0) & (F.col("n_b") > 0) & (var_u > 0),
        (u - na * nb / 2.0) / F.sqrt(var_u),
    )
    auc_a = F.when(
        (F.col("n_a") > 0) & (F.col("n_b") > 0),
        F.col("u2").cast("double") / (2.0 * na * nb),
    )
    return agg.select(
        "n_a", "n_b", "n_values", "u2", "tie_cubes",
        z.alias("z"), auc_a.alias("auc_a"),
    )


def trimmed_mean_diff(
    df: DataFrame,
    arm_col: str,
    value_col: str,
    arm_a,
    arm_b,
    trim_frac: float = 0.05,
) -> DataFrame:
    """Trimmed-mean A/B difference — the robust location estimate a
    heavy-tailed metric needs next to :func:`welch_ttest` (one whale
    user moves a revenue mean; it cannot move a 5%-trimmed mean):
    per arm, drop the k = floor(trim·n) lowest and highest UNITS and
    average the rest.

    ``value_col`` integer-valued, so the whole estimate is exact
    order-statistics arithmetic over the per-arm distinct-value cell
    relation: with cum(v) the units strictly below v, a cell (v, c)
    keeps ``min(cum+c, n−k) − max(cum, k)`` units (clamped at 0) and
    the trimmed sum Σ v·kept is an exact BIGINT — no sort of the unit
    relation, no percentile approximation. One hash aggregate per
    arm, one per-arm prefix window bounded by value cardinality, one
    rollup; each mean is one pinned division. Returns one row:
    (n_a, n_b, k_a, k_b, trimmed_sum_a, trimmed_sum_b, mean_a,
    mean_b, diff); means NULL when trimming empties an arm.
    """
    from pyspark.sql import Window as W

    if not 0.0 <= trim_frac < 0.5:
        raise ValueError("trim_frac must be in [0, 0.5)")
    v = F.col(value_col).cast("bigint")
    per_v = (
        df.where((F.col(arm_col) == arm_a) | (F.col(arm_col) == arm_b))
        .groupBy(
            F.when(F.col(arm_col) == arm_a, 0).otherwise(1).alias("arm"),
            v.alias("v"),
        )
        .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    )
    wpre = (
        W.partitionBy("arm").orderBy("v")
        .rowsBetween(W.unboundedPreceding, -1)
    )
    wall = W.partitionBy("arm")
    staged = per_v.select(
        "arm",
        "v",
        "c",
        F.coalesce(F.sum("c").over(wpre), F.lit(0)).alias("cum"),
        F.sum("c").over(wall).cast("bigint").alias("n"),
    )
    k = F.floor(F.lit(float(trim_frac)) * F.col("n")).cast("bigint")
    kept = F.greatest(
        F.lit(0).cast("bigint"),
        F.least(F.col("cum") + F.col("c"), F.col("n") - k)
        - F.greatest(F.col("cum"), k),
    )
    per_arm = staged.groupBy("arm").agg(
        F.first("n").alias("n"),
        F.first(k).alias("k"),
        F.sum(F.col("v") * kept).cast("bigint").alias("tsum"),
    )
    rows = {int(r["arm"]): r for r in per_arm.collect()}
    spark = df.sparkSession

    def side(i: int):
        r = rows.get(i)
        if r is None:
            return 0, 0, 0
        return int(r["n"]), int(r["k"]), int(r["tsum"])

    n_a, k_a, s_a = side(0)
    n_b, k_b, s_b = side(1)
    m_a = s_a / (n_a - 2 * k_a) if n_a - 2 * k_a > 0 else None
    m_b = s_b / (n_b - 2 * k_b) if n_b - 2 * k_b > 0 else None
    diff = (m_a - m_b) if (m_a is not None and m_b is not None) else None
    return spark.createDataFrame(
        [(n_a, n_b, k_a, k_b, s_a, s_b, m_a, m_b, diff)],
        "n_a bigint, n_b bigint, k_a bigint, k_b bigint, "
        "trimmed_sum_a bigint, trimmed_sum_b bigint, "
        "mean_a double, mean_b double, diff double",
    )


def welch_ttest(
    df: DataFrame, arm_col: str, value_col: str, arm_a, arm_b
) -> DataFrame:
    """Welch's unequal-variances t-test on an integer-valued metric.

    Returns one row: per-arm n/mean/variance, the mean difference
    (a - b), the t statistic, and the Welch–Satterthwaite degrees of
    freedom.  Sample variance via the moment identity
    ``(Σx² - (Σx)²/n) / (n-1)`` — (Σx)²/n is computed in DOUBLE (the
    BIGINT square could overflow) from exact integer inputs, so the
    float tree is pinned and engine-portable.
    """
    m = _moment_sums(df, arm_col, value_col)
    a = m.where(F.col("arm") == arm_a).select(
        F.col("n").alias("na"), F.col("sx").alias("sa"),
        F.col("sx2").alias("qa"),
    )
    b = m.where(F.col("arm") == arm_b).select(
        F.col("n").alias("nb"), F.col("sx").alias("sb"),
        F.col("sx2").alias("qb"),
    )
    j = a.crossJoin(F.broadcast(b))  # two 1-row relations

    def mean(s, n):
        return F.col(s).cast("double") / F.col(n)

    def var(q, s, n):
        return (
            F.col(q).cast("double")
            - F.col(s).cast("double") * F.col(s) / F.col(n)
        ) / (F.col(n) - 1)

    ma, mb = mean("sa", "na"), mean("sb", "nb")
    va, vb = var("qa", "sa", "na"), var("qb", "sb", "nb")
    ta, tb = va / F.col("na"), vb / F.col("nb")  # v/n terms, shared
    # Degenerate guard (both variances zero): NULL, not ANSI div-zero —
    # the oracle mirrors with CASE WHEN ... > 0.
    t = F.when(ta + tb > 0, (ma - mb) / F.sqrt(ta + tb))
    dof_den = ta * ta / (F.col("na") - 1) + tb * tb / (F.col("nb") - 1)
    dof = F.when(dof_den > 0, (ta + tb) * (ta + tb) / dof_den)
    return j.select(
        F.col("na"),
        F.col("nb"),
        ma.alias("mean_a"),
        mb.alias("mean_b"),
        va.alias("var_a"),
        vb.alias("var_b"),
        (ma - mb).alias("mean_diff"),
        t.alias("t_stat"),
        dof.alias("welch_df"),
    )


def proportion_ztest(
    df: DataFrame, arm_col: str, success_col: str, arm_a, arm_b
) -> DataFrame:
    """Two-proportion z-test with the pooled standard error.

    ``success_col`` is a 0/1 integer flag per unit.  One hash
    aggregate; z = (p̂a - p̂b) / sqrt(p̂(1-p̂)(1/na + 1/nb)) with the
    pooled p̂ — the classic conversion-rate readout.
    """
    s = F.col(success_col).cast("bigint")
    m = df.groupBy(F.col(arm_col).alias("arm")).agg(
        F.count(F.lit(1)).alias("n"), F.sum(s).alias("k")
    )
    a = m.where(F.col("arm") == arm_a).select(
        F.col("n").alias("na"), F.col("k").alias("ka")
    )
    b = m.where(F.col("arm") == arm_b).select(
        F.col("n").alias("nb"), F.col("k").alias("kb")
    )
    j = a.crossJoin(F.broadcast(b))
    pa = F.col("ka").cast("double") / F.col("na")
    pb = F.col("kb").cast("double") / F.col("nb")
    pool = (F.col("ka") + F.col("kb")).cast("double") / (
        F.col("na") + F.col("nb")
    )
    # Degenerate guard (pooled rate 0 or 1): NULL, not ANSI div-zero.
    se2 = pool * (1 - pool) * (
        1 / F.col("na").cast("double") + 1 / F.col("nb").cast("double")
    )
    z = F.when(se2 > 0, (pa - pb) / F.sqrt(se2))
    return j.select(
        F.col("na"), F.col("nb"),
        F.col("ka"), F.col("kb"),
        pa.alias("rate_a"),
        pb.alias("rate_b"),
        (pa - pb).alias("rate_diff"),
        pool.alias("pooled_rate"),
        z.alias("z_stat"),
    )


def cuped_adjust(
    df: DataFrame,
    arm_col: str,
    metric_col: str,
    covariate_col: str,
) -> DataFrame:
    """CUPED-adjusted per-arm metric means and the variance reduction.

    ``metric_col`` (post-period) and ``covariate_col`` (pre-period) are
    integer-valued per unit.  θ = cov(pre, post) / var(pre) is fit
    POOLED across arms (the standard, assignment-independent choice —
    fitting θ per arm would re-introduce the treatment effect into the
    adjustment); the adjusted metric is ``y - θ·(x - mean(x))``, which
    preserves each arm's expected mean while removing the pre-period
    component of its variance.

    Two hash aggregates: one global (θ and the pre-period mean from
    exact BIGINT moment sums), one per-arm for the adjusted means —
    the adjusted mean needs only per-arm Σy, Σx, n, never a per-row
    adjusted column:

        mean_adj = Σy/n - θ·(Σx/n - mean_x_global)

    Variance reduction is reported as the pooled R² of the covariate,
    ``ρ² = cov²/(var_x·var_y)`` — the fraction of metric variance CUPED
    removes.
    """
    y = F.col(metric_col).cast("bigint")
    x = F.col(covariate_col).cast("bigint")
    g = df.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(x).alias("sx"),
        F.sum(y).alias("sy"),
        F.sum(x * x).alias("sxx"),
        F.sum(y * y).alias("syy"),
        F.sum(x * y).alias("sxy"),
    )
    nd = F.col("n").cast("double")
    cov = F.col("sxy").cast("double") - F.col("sx").cast("double") * F.col("sy") / nd
    varx = F.col("sxx").cast("double") - F.col("sx").cast("double") * F.col("sx") / nd
    vary = F.col("syy").cast("double") - F.col("sy").cast("double") * F.col("sy") / nd
    # Degenerate guard: no covariate variance -> CUPED undefined, NULL
    # through (never ANSI div-zero).
    g = g.select(
        F.when(varx > 0, cov / varx).alias("theta"),
        (F.col("sx").cast("double") / nd).alias("mean_x"),
        F.when(varx * vary > 0, cov * cov / (varx * vary)).alias("rho2"),
    )
    arms = df.groupBy(F.col(arm_col).alias("arm")).agg(
        F.count(F.lit(1)).alias("n_arm"),
        F.sum(y).alias("sy_arm"),
        F.sum(x).alias("sx_arm"),
    )
    out = arms.crossJoin(F.broadcast(g))
    raw_mean = F.col("sy_arm").cast("double") / F.col("n_arm")
    pre_mean = F.col("sx_arm").cast("double") / F.col("n_arm")
    adj_mean = raw_mean - F.col("theta") * (pre_mean - F.col("mean_x"))
    return out.select(
        "arm",
        F.col("n_arm"),
        raw_mean.alias("raw_mean"),
        adj_mean.alias("cuped_mean"),
        F.col("theta"),
        F.col("rho2").alias("variance_reduction"),
    )


def kaplan_meier(
    df: DataFrame, duration_col: str, event_col: str
) -> DataFrame:
    """Kaplan–Meier product-limit survival curve — the standard
    censoring-aware time-to-event estimator (churn, time-to-convert,
    hardware lifetime): subjects contribute until their event
    (``event_col`` = 1) or censoring (0, still alive when observation
    ended); naive "average lifetime" over censored data is biased low,
    KM is the fix.

        S(t) = prod over event times t_j <= t of (1 - d_j / n_j)

    with d_j events and n_j at-risk at t_j.  Spark shape: ONE hash
    aggregate collapses subjects to the distinct-duration relation
    (integer durations), then every remaining step — at-risk via a
    running sum ordered by time DESC-trick-free, and the cumulative
    product in ln space (``exp(sum(ln(factor)) over prefix)``, Spark
    has no product aggregate) — runs over that TINY relation.  Prefix
    window sums evaluate in time order in both engines, so the float
    sequence is pinned; d_j = n_j (everyone dies at the last time)
    flows through as ln(0) = -inf -> S = 0 exactly.

    Returns (t, n_risk, n_events, n_censored, survival) ordered by t,
    one row per distinct duration with >= 1 event or censoring.
    """
    from pyspark.sql import Window as W

    t = F.col(duration_col).cast("bigint")
    e = F.col(event_col).cast("bigint")
    per_t = df.groupBy(t.alias("t")).agg(
        F.sum(e).alias("n_events"),
        F.sum(F.lit(1) - e).alias("n_censored"),
    )
    wpre = W.orderBy("t").rowsBetween(W.unboundedPreceding, -1)
    wcum = W.orderBy("t").rowsBetween(W.unboundedPreceding, 0)
    total = F.sum(F.col("n_events") + F.col("n_censored")).over(
        W.partitionBy()
    )
    prior = F.coalesce(
        F.sum(F.col("n_events") + F.col("n_censored")).over(wpre),
        F.lit(0),
    )
    staged = per_t.select(
        "t",
        "n_events",
        "n_censored",
        (total - prior).cast("bigint").alias("n_risk"),
    )
    factor = 1 - F.col("n_events").cast("double") / F.col("n_risk")
    # Spark's log() returns NULL for non-positive input (DuckDB gives
    # -inf) and sum() skips NULLs — a d_j = n_j row would silently
    # vanish from the product.  Pin the zero explicitly: once any
    # prefix factor is 0 the curve is 0 forever.
    zero_seen = F.min(factor).over(wcum) <= 0
    surv = F.when(zero_seen, F.lit(0.0)).otherwise(
        F.exp(F.sum(F.log(factor)).over(wcum))
    )
    return staged.select(
        "t", "n_risk", "n_events", "n_censored", surv.alias("survival")
    )


def grouped_kaplan_meier(
    df: DataFrame,
    keys: list[str],
    duration_col: str,
    event_col: str,
) -> DataFrame:
    """Per-COHORT Kaplan–Meier curves — :func:`kaplan_meier` keyed
    (the table behind every "survival by arm/segment/plan" plot, and
    the curves :func:`logrank_test` adjudicates): identical product-
    limit chain per key, each float sequence pinned by the keyed
    prefix-window order (the nelson_aalen rule).

    Spark shape: ONE hash aggregate to the (keys × distinct-duration)
    relation, keyed prefix windows over it — bounded by duration
    cardinality per key, never rows.  Returns keys + (t, n_risk,
    n_events, n_censored, survival) ordered within each key by t;
    d_j = n_j pins survival to exactly 0 from that time on.
    """
    from pyspark.sql import Window as W

    t = F.col(duration_col).cast("bigint")
    e = F.col(event_col).cast("bigint")
    per_t = df.groupBy(*keys, t.alias("t")).agg(
        F.sum(e).alias("n_events"),
        F.sum(F.lit(1) - e).alias("n_censored"),
    )
    wpre = (
        W.partitionBy(*keys)
        .orderBy("t")
        .rowsBetween(W.unboundedPreceding, -1)
    )
    wcum = (
        W.partitionBy(*keys)
        .orderBy("t")
        .rowsBetween(W.unboundedPreceding, 0)
    )
    total = F.sum(F.col("n_events") + F.col("n_censored")).over(
        W.partitionBy(*keys)
    )
    prior = F.coalesce(
        F.sum(F.col("n_events") + F.col("n_censored")).over(wpre),
        F.lit(0),
    )
    staged = per_t.select(
        *keys,
        "t",
        "n_events",
        "n_censored",
        (total - prior).cast("bigint").alias("n_risk"),
    )
    factor = 1 - F.col("n_events").cast("double") / F.col("n_risk")
    zero_seen = F.min(factor).over(wcum) <= 0
    surv = F.when(zero_seen, F.lit(0.0)).otherwise(
        F.exp(F.sum(F.log(factor)).over(wcum))
    )
    return staged.select(
        *keys,
        "t",
        "n_risk",
        "n_events",
        "n_censored",
        surv.alias("survival"),
    )


def aalen_johansen(
    df: DataFrame,
    duration_col: str,
    cause_col: str,
    causes: list[int],
) -> DataFrame:
    """Aalen–Johansen cumulative incidence under COMPETING risks
    (Aalen & Johansen 1978 — public) — the estimator
    :func:`kaplan_meier` users reach for next when more than one
    thing can happen first (convert vs churn, fail-by-wearout vs
    fail-by-shock): treating competitor events as censoring (the
    "1 − KM per cause" shortcut) overstates every cause's incidence;
    AJ partitions the probability correctly,

        S(t)      = Π_{t_j <= t} (1 − d_·j / n_j)   (all-cause KM)
        CIF_k(t)  = Σ_{t_j <= t} S(t_{j−}) · d_kj / n_j

    ``cause_col``: 0 = censored, else one of ``causes`` (event by
    that cause).  Spark shape (the KM rule): ONE hash aggregate to
    the distinct-duration relation with per-cause event counts
    (bounded conditional sums — causes are a small list), at-risk
    from the total minus the prior-row prefix, the all-cause survival
    in ln space with the explicit zero pin, S(t−) from the SAME
    prefix shifted one row, and each CIF as a prefix window sum of
    pinned per-row terms — every float sequence evaluates in time
    order in both engines, so the whole table replays in SQL.

    Returns (t, n_risk, n_censored, d_<k>..., survival, cif_<k>...)
    ordered by t; Σ_k CIF_k(t) + S(t) = 1 up to float for any t with
    no prior censoring.
    """
    from pyspark.sql import Window as W

    if not causes or 0 in causes:
        raise ValueError("causes must be non-empty and exclude 0")
    t = F.col(duration_col).cast("bigint")
    c = F.col(cause_col).cast("bigint")
    aggs = [
        F.sum(F.when(c != 0, 1).otherwise(0)).alias("n_events"),
        F.sum(F.when(c == 0, 1).otherwise(0)).alias("n_censored"),
    ]
    for k in causes:
        aggs.append(
            F.sum(F.when(c == int(k), 1).otherwise(0))
            .cast("bigint").alias(f"d_{k}")
        )
    per_t = df.groupBy(t.alias("t")).agg(*aggs)
    wpre = W.orderBy("t").rowsBetween(W.unboundedPreceding, -1)
    wcum = W.orderBy("t").rowsBetween(W.unboundedPreceding, 0)
    total = F.sum(F.col("n_events") + F.col("n_censored")).over(
        W.partitionBy()
    )
    prior = F.coalesce(
        F.sum(F.col("n_events") + F.col("n_censored")).over(wpre),
        F.lit(0),
    )
    staged = per_t.select(
        "t",
        "n_events",
        "n_censored",
        *[f"d_{k}" for k in causes],
        (total - prior).cast("bigint").alias("n_risk"),
    )
    factor = 1 - F.col("n_events").cast("double") / F.col("n_risk")
    zero_seen = F.min(factor).over(wcum) <= 0
    surv = F.when(zero_seen, F.lit(0.0)).otherwise(
        F.exp(F.sum(F.log(factor)).over(wcum))
    )
    # S(t-) = survival BEFORE this row's events: the same ln-prefix
    # one row back (1.0 at the first row); a zero seen strictly
    # before this row pins S(t-) = 0
    zero_before = F.coalesce(
        F.min(factor).over(wpre) <= 0, F.lit(False)
    )
    s_prev = F.when(zero_before, F.lit(0.0)).otherwise(
        F.exp(
            F.coalesce(F.sum(F.log(factor)).over(wpre), F.lit(0.0))
        )
    )
    # two stages: window expressions (s_prev, survival) materialize as
    # columns first — Spark forbids a window over a window expression
    mid = staged.select(
        "t",
        "n_risk",
        "n_censored",
        *[f"d_{k}" for k in causes],
        surv.alias("survival"),
        s_prev.alias("_s_prev"),
    )
    wcum2 = W.orderBy("t").rowsBetween(W.unboundedPreceding, 0)
    out_cols = [
        "t",
        "n_risk",
        "n_censored",
        *[f"d_{k}" for k in causes],
        "survival",
    ]
    for k in causes:
        inc = F.col("_s_prev") * (
            F.col(f"d_{k}").cast("double") / F.col("n_risk")
        )
        out_cols.append(F.sum(inc).over(wcum2).alias(f"cif_{k}"))
    return mid.select(*out_cols)


def nelson_aalen(
    df: DataFrame, duration_col: str, event_col: str
) -> DataFrame:
    """Nelson–Aalen cumulative hazard — :func:`kaplan_meier`'s
    additive sibling (Aalen 1978, public): instead of the survival
    product, accumulate the hazard increments directly,

        H(t) = Σ over event times t_j <= t of d_j / n_j
        Var(H(t)) = Σ d_j / n_j²          (the Poisson-type variance)

    — the estimator of choice when hazard SHAPE is the question
    (constant? rising? bathtub?) and for the log-rank family's
    diagnostics; exp(−H) is an alternative survival estimate that is
    less biased than KM in small samples.

    Spark shape: identical to KM — ONE hash aggregate to the
    distinct-duration relation, at-risk from the total minus the
    prior-row prefix sum, and the hazard accumulations as prefix
    window sums over that tiny relation (prefix sums evaluate in time
    order in both engines, so the float sequence is pinned and the
    oracle replays it).

    Returns (t, n_risk, n_events, n_censored, cum_hazard,
    var_hazard) ordered by t, one row per distinct duration.
    """
    from pyspark.sql import Window as W

    t = F.col(duration_col).cast("bigint")
    e = F.col(event_col).cast("bigint")
    per_t = df.groupBy(t.alias("t")).agg(
        F.sum(e).alias("n_events"),
        F.sum(F.lit(1) - e).alias("n_censored"),
    )
    wpre = W.orderBy("t").rowsBetween(W.unboundedPreceding, -1)
    wcum = W.orderBy("t").rowsBetween(W.unboundedPreceding, 0)
    total = F.sum(F.col("n_events") + F.col("n_censored")).over(
        W.partitionBy()
    )
    prior = F.coalesce(
        F.sum(F.col("n_events") + F.col("n_censored")).over(wpre),
        F.lit(0),
    )
    staged = per_t.select(
        "t",
        "n_events",
        "n_censored",
        (total - prior).cast("bigint").alias("n_risk"),
    )
    inc = F.col("n_events").cast("double") / F.col("n_risk")
    vinc = F.col("n_events").cast("double") / (
        F.col("n_risk") * F.col("n_risk")
    )
    return staged.select(
        "t",
        "n_risk",
        "n_events",
        "n_censored",
        F.sum(inc).over(wcum).alias("cum_hazard"),
        F.sum(vinc).over(wcum).alias("var_hazard"),
    )


def cox_ph(
    df: DataFrame,
    duration_col: str,
    event_col: str,
    x_col: str,
    n_iter: int = 3,
    max_cells: int = 100_000,
) -> DataFrame:
    """Cox proportional-hazards regression, single covariate — the
    survival-REGRESSION member the family lacked next to KM /
    Nelson–Aalen / log-rank / RMST (Cox 1972, Breslow ties — public):
    fit log-hazard-ratio β in  h(t|x) = h0(t)·e^{βx}  by ``n_iter``
    Newton steps on the partial likelihood from β = 0,

        S_k(t;β) = Σ_{j: T_j >= t} x_j^k e^{βx_j}     (k = 0,1,2)
        U(β) = Σ_events [x_i − S1/S0]
        I(β) = Σ_events [S2/S0 − (S1/S0)²],   β ← β + U/I

    FIXED-round and fully pinned, so the whole fit replays in SQL
    (the pagerank/BPE/Bradley–Terry chained-CTE precedent — no
    rows-only entry): the corpus collapses ONCE to the exact-BIGINT
    (t, x, n, d) cell relation (both columns integer-valued — the
    family contract; ``max_cells`` fails fast from a counted probe
    BEFORE any collect); each iteration is per-t folds over x
    ascending, suffix sums over t descending (window accumulation
    order is pinned in both engines — the nelson_aalen rule), and
    U/I as one fold over cells in (t, x) order.  β = 0 makes the
    first iteration exact integer arithmetic; later iterations'
    e^{βx} is one libm exp per cell inside a pinned chain.

    Returns ONE row: (n_subjects, n_events, n_cells, beta, u_final,
    info_final, se) — u_final ≈ 0 signals convergence, se =
    1/sqrt(I(β)) the usual asymptotic standard error; all NULL when
    the information is degenerate (no events, constant covariate).
    """
    import math

    spark = df.sparkSession
    t = F.col(duration_col).cast("bigint")
    e = F.col(event_col).cast("bigint")
    x = F.col(x_col).cast("bigint")
    cell_rel = df.groupBy(t.alias("t"), x.alias("x")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(e).cast("bigint").alias("d"),
    )
    probe = cell_rel.limit(max_cells + 1).count()
    if probe > max_cells:
        raise ValueError(
            f"more than max_cells={max_cells} distinct (t, x) cells: "
            "quantize duration/covariate first (the family contract)"
        )
    cells = sorted(
        (
            (int(r["t"]), int(r["x"]), int(r["n"]), int(r["d"]))
            for r in cell_rel.collect()
        )
    )
    n_subjects = sum(c[2] for c in cells)
    n_events = sum(c[3] for c in cells)
    ts = sorted({c[0] for c in cells})

    def u_i(b: float) -> tuple[float, float]:
        # per-t S_k: folds over x ascending (cells pre-sorted)
        s0p = {tt: 0.0 for tt in ts}
        s1p = {tt: 0.0 for tt in ts}
        s2p = {tt: 0.0 for tt in ts}
        for tt, xx, nn, _dd in cells:
            w = math.exp(b * xx)
            s0p[tt] = s0p[tt] + nn * w
            s1p[tt] = s1p[tt] + (nn * xx) * w
            s2p[tt] = s2p[tt] + ((nn * xx) * xx) * w
        # suffix sums over t descending (risk set: T_j >= t)
        s0s, s1s, s2s = {}, {}, {}
        a0 = a1 = a2 = 0.0
        for tt in reversed(ts):
            a0 = a0 + s0p[tt]
            a1 = a1 + s1p[tt]
            a2 = a2 + s2p[tt]
            s0s[tt], s1s[tt], s2s[tt] = a0, a1, a2
        uu = ii = 0.0
        for tt, xx, _nn, dd in cells:  # (t, x) ascending
            # non-event cells ADD literal 0.0 (not skip) so the fold
            # is term-for-term the oracle's CASE ... ELSE 0.0 END —
            # identical even at the -0.0 corner
            if dd and s0s[tt] > 0:
                r = s1s[tt] / s0s[tt]
                uu = uu + dd * (xx - r)
                ii = ii + dd * (s2s[tt] / s0s[tt] - r * r)
            else:
                uu = uu + 0.0
                ii = ii + 0.0
        return uu, ii

    beta = 0.0
    degenerate = False
    for _ in range(n_iter):
        uu, ii = u_i(beta)
        if not ii > 0:
            degenerate = True
            break
        beta = beta + uu / ii
    if not degenerate:
        u_fin, i_fin = u_i(beta)
        degenerate = not i_fin > 0
    if degenerate:
        row = (n_subjects, n_events, len(cells), None, None, None,
               None)
    else:
        row = (
            n_subjects, n_events, len(cells), beta, u_fin, i_fin,
            1.0 / math.sqrt(i_fin),
        )
    return spark.createDataFrame(
        [row],
        "n_subjects bigint, n_events bigint, n_cells bigint, "
        "beta double, u_final double, info_final double, se double",
    )


def cox_ph2(
    df: DataFrame,
    duration_col: str,
    event_col: str,
    x1_col: str,
    x2_col: str,
    n_iter: int = 3,
    max_cells: int = 100_000,
) -> DataFrame:
    """Two-covariate Cox proportional hazards — the ADJUSTED hazard
    ratio (:func:`cox_ph`'s single-covariate estimate confounds
    whenever a second driver correlates with the first; the
    two-covariate fit is the smallest model that separates them).
    Same fixed-round Newton on the Breslow partial likelihood, with
    vector score U = (U1, U2), 2×2 information I, and the step
    solved in closed form (Cramer):

        det = I11·I22 − I12²,   δ = I⁻¹U,
        se_j = sqrt((I⁻¹)_jj) = sqrt(I_kk / det)

    Everything is the :func:`cox_ph` contract one rank up: the corpus
    collapses once to the exact-BIGINT (t, x1, x2, n, d) cell
    relation (counted-probe ``max_cells`` guard), the six per-t
    moment folds run in (x1, x2)-ascending order, the suffix sums in
    t-descending accumulation order, the five U/I folds over cells in
    (t, x1, x2) order with non-event cells adding literal 0.0 — the
    whole fit replays in SQL (q_cox_ph2).  Degenerate information
    (det <= 0 or I11 <= 0) reads NULL.

    Returns ONE row: (n_subjects, n_events, n_cells, beta1, beta2,
    u1_final, u2_final, se1, se2).
    """
    import math

    spark = df.sparkSession
    t = F.col(duration_col).cast("bigint")
    e = F.col(event_col).cast("bigint")
    x1 = F.col(x1_col).cast("bigint")
    x2 = F.col(x2_col).cast("bigint")
    cell_rel = df.groupBy(
        t.alias("t"), x1.alias("x1"), x2.alias("x2")
    ).agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(e).cast("bigint").alias("d"),
    )
    probe = cell_rel.limit(max_cells + 1).count()
    if probe > max_cells:
        raise ValueError(
            f"more than max_cells={max_cells} distinct (t, x1, x2) "
            "cells: quantize first (the family contract)"
        )
    cells = sorted(
        (
            int(r["t"]), int(r["x1"]), int(r["x2"]),
            int(r["n"]), int(r["d"]),
        )
        for r in cell_rel.collect()
    )
    n_subjects = sum(c[3] for c in cells)
    n_events = sum(c[4] for c in cells)
    ts = sorted({c[0] for c in cells})

    def u_i(b1: float, b2: float):
        mom = {tt: [0.0] * 6 for tt in ts}  # s0,s1a,s1b,s2aa,s2ab,s2bb
        for tt, a, b, nn, _dd in cells:
            w = math.exp(b1 * a + b2 * b)
            m = mom[tt]
            m[0] = m[0] + nn * w
            m[1] = m[1] + (nn * a) * w
            m[2] = m[2] + (nn * b) * w
            m[3] = m[3] + ((nn * a) * a) * w
            m[4] = m[4] + ((nn * a) * b) * w
            m[5] = m[5] + ((nn * b) * b) * w
        sfx = {}
        acc = [0.0] * 6
        for tt in reversed(ts):
            acc = [acc[j] + mom[tt][j] for j in range(6)]
            sfx[tt] = list(acc)
        u1 = u2 = i11 = i12 = i22 = 0.0
        for tt, a, b, _nn, dd in cells:
            s = sfx[tt]
            if dd and s[0] > 0:
                r1 = s[1] / s[0]
                r2 = s[2] / s[0]
                u1 = u1 + dd * (a - r1)
                u2 = u2 + dd * (b - r2)
                i11 = i11 + dd * (s[3] / s[0] - r1 * r1)
                i12 = i12 + dd * (s[4] / s[0] - r1 * r2)
                i22 = i22 + dd * (s[5] / s[0] - r2 * r2)
            else:
                u1 = u1 + 0.0
                u2 = u2 + 0.0
                i11 = i11 + 0.0
                i12 = i12 + 0.0
                i22 = i22 + 0.0
        return u1, u2, i11, i12, i22

    b1 = b2 = 0.0
    degenerate = False
    for _ in range(n_iter):
        u1, u2, i11, i12, i22 = u_i(b1, b2)
        det = i11 * i22 - i12 * i12
        if not (det > 0 and i11 > 0):
            degenerate = True
            break
        b1 = b1 + (u1 * i22 - u2 * i12) / det
        b2 = b2 + (i11 * u2 - i12 * u1) / det
    if not degenerate:
        u1, u2, i11, i12, i22 = u_i(b1, b2)
        det = i11 * i22 - i12 * i12
        degenerate = not (det > 0 and i11 > 0)
    if degenerate:
        row = (
            n_subjects, n_events, len(cells),
            None, None, None, None, None, None,
        )
    else:
        row = (
            n_subjects, n_events, len(cells), b1, b2, u1, u2,
            math.sqrt(i22 / det), math.sqrt(i11 / det),
        )
    return spark.createDataFrame(
        [row],
        "n_subjects bigint, n_events bigint, n_cells bigint, "
        "beta1 double, beta2 double, u1_final double, "
        "u2_final double, se1 double, se2 double",
    )


def cox_ph_stratified(
    df: DataFrame,
    duration_col: str,
    event_col: str,
    x_col: str,
    stratum_col: str,
    n_iter: int = 3,
    max_cells: int = 100_000,
) -> DataFrame:
    """STRATIFIED Cox proportional hazards (r14 verdict ask #4):
    per-stratum baseline hazard, ONE shared log-hazard-ratio β —
    h(t|x, g) = h0_g(t)·e^{βx}, the model behind
    :func:`grouped_kaplan_meier`'s per-cohort curves when cohorts
    differ in baseline risk but the treatment effect is common
    (center-stratified trials, platform-stratified churn). The
    stratified partial likelihood simply SUMS scores over strata with
    stratum-LOCAL risk sets:

        U(β) = Σ_g Σ_{events in g} [x_i − S1_g(t)/S0_g(t)]
        I(β) = Σ_g Σ_{events in g} [S2_g/S0_g − (S1_g/S0_g)²]

    Everything is the :func:`cox_ph` contract keyed one level up: the
    corpus collapses ONCE to the exact-BIGINT (g, t, x, n, d) cell
    relation (counted-probe ``max_cells`` guard before any collect);
    per-(g,t) S_k folds run over x ascending, suffix sums t-descending
    WITHIN each stratum, and U/I as one fold over cells in (g, t, x)
    order with non-event cells adding literal 0.0 — the whole
    fixed-round Newton fit replays in SQL (q_cox_stratified; the
    cox_ph chained-CTE precedent with a PARTITION BY g window).
    Degenerate pooled information reads NULL.

    Returns ONE row: (n_strata, n_subjects, n_events, n_cells, beta,
    u_final, info_final, se).
    """
    import math

    spark = df.sparkSession
    t = F.col(duration_col).cast("bigint")
    e = F.col(event_col).cast("bigint")
    x = F.col(x_col).cast("bigint")
    g = F.col(stratum_col).cast("bigint")
    cell_rel = df.groupBy(g.alias("g"), t.alias("t"), x.alias("x")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(e).cast("bigint").alias("d"),
    )
    probe = cell_rel.limit(max_cells + 1).count()
    if probe > max_cells:
        raise ValueError(
            f"more than max_cells={max_cells} distinct (g, t, x) "
            "cells: quantize duration/covariate first (the family "
            "contract)"
        )
    cells = sorted(
        (
            int(r["g"]), int(r["t"]), int(r["x"]),
            int(r["n"]), int(r["d"]),
        )
        for r in cell_rel.collect()
    )
    n_subjects = sum(c[3] for c in cells)
    n_events = sum(c[4] for c in cells)
    gts = sorted({(c[0], c[1]) for c in cells})
    strata = sorted({c[0] for c in cells})
    ts_by_g = {gg: [] for gg in strata}
    for gg, tt in gts:
        ts_by_g[gg].append(tt)  # ascending within stratum

    def u_i(b: float) -> tuple[float, float]:
        s0p = {k: 0.0 for k in gts}
        s1p = {k: 0.0 for k in gts}
        s2p = {k: 0.0 for k in gts}
        for gg, tt, xx, nn, _dd in cells:  # (g, t, x) ascending
            w = math.exp(b * xx)
            k = (gg, tt)
            s0p[k] = s0p[k] + nn * w
            s1p[k] = s1p[k] + (nn * xx) * w
            s2p[k] = s2p[k] + ((nn * xx) * xx) * w
        # stratum-local risk sets: suffix sums over t descending
        # WITHIN each stratum (window PARTITION BY g in the oracle)
        s0s, s1s, s2s = {}, {}, {}
        for gg in strata:
            a0 = a1 = a2 = 0.0
            for tt in reversed(ts_by_g[gg]):
                k = (gg, tt)
                a0 = a0 + s0p[k]
                a1 = a1 + s1p[k]
                a2 = a2 + s2p[k]
                s0s[k], s1s[k], s2s[k] = a0, a1, a2
        uu = ii = 0.0
        for gg, tt, xx, _nn, dd in cells:  # (g, t, x) ascending
            k = (gg, tt)
            if dd and s0s[k] > 0:
                r = s1s[k] / s0s[k]
                uu = uu + dd * (xx - r)
                ii = ii + dd * (s2s[k] / s0s[k] - r * r)
            else:
                uu = uu + 0.0
                ii = ii + 0.0
        return uu, ii

    beta = 0.0
    degenerate = False
    for _ in range(n_iter):
        uu, ii = u_i(beta)
        if not ii > 0:
            degenerate = True
            break
        beta = beta + uu / ii
    if not degenerate:
        u_fin, i_fin = u_i(beta)
        degenerate = not i_fin > 0
    if degenerate:
        row = (
            len(strata), n_subjects, n_events, len(cells),
            None, None, None, None,
        )
    else:
        row = (
            len(strata), n_subjects, n_events, len(cells), beta,
            u_fin, i_fin, 1.0 / math.sqrt(i_fin),
        )
    return spark.createDataFrame(
        [row],
        "n_strata bigint, n_subjects bigint, n_events bigint, "
        "n_cells bigint, beta double, u_final double, "
        "info_final double, se double",
    )


def logrank_test_stratified(
    df: DataFrame,
    arm_col: str,
    duration_col: str,
    event_col: str,
    arm_a,
    arm_b,
    stratum_col: str,
) -> DataFrame:
    """STRATIFIED two-sample log-rank test (r15 — the adjudicator the
    r14/r15 survival additions beg for: :func:`grouped_kaplan_meier`
    draws per-cohort curves, :func:`cox_ph_stratified` fits a shared
    effect over per-stratum baselines, and this tests that shared
    effect non-parametrically). The statistic simply POOLS the
    per-stratum Mantel moments — risk sets and expected splits are
    computed WITHIN each stratum, then

        chi2 = ( Σ_g (O_a,g − E_a,g) )² / Σ_g V_g

    so a covariate that shifts baseline hazard across strata (site,
    platform, cohort) can no longer masquerade as a treatment effect.

    Same Spark shape as :func:`logrank_test` one key up: ONE hash
    aggregate to the (stratum × duration) cell relation, per-stratum
    prefix-window at-risk counts (bounded by cells, never subjects),
    and (g, t)-ordered fixed folds for the cross-cell float sums —
    the whole statistic replays in SQL. Returns one row: (n_strata,
    n_times, o_a, e_a, o_b, e_b, var_sum, chi2); chi2 NULL when
    ΣV = 0.
    """
    from pyspark.sql import Window as W

    g = F.col(stratum_col).cast("bigint")
    t = F.col(duration_col).cast("bigint")
    e = F.col(event_col).cast("bigint")
    a = F.col(arm_col) == arm_a
    b = F.col(arm_col) == arm_b
    per_t = (
        df.where(a | b)
        .groupBy(g.alias("g"), t.alias("t"))
        .agg(
            F.sum(F.when(a, e).otherwise(0)).alias("d_a"),
            F.sum(F.when(b, e).otherwise(0)).alias("d_b"),
            F.sum(F.when(a, 1).otherwise(0)).alias("c_a"),
            F.sum(F.when(b, 1).otherwise(0)).alias("c_b"),
        )
    )
    wpre = (
        W.partitionBy("g").orderBy("t")
        .rowsBetween(W.unboundedPreceding, -1)
    )

    def at_risk(c: str):
        total = F.sum(c).over(W.partitionBy("g"))
        prior = F.coalesce(F.sum(c).over(wpre), F.lit(0))
        return (total - prior).cast("bigint")

    staged = per_t.select(
        "g",
        "t",
        "d_a",
        "d_b",
        at_risk("c_a").alias("n_a"),
        at_risk("c_b").alias("n_b"),
    ).where(F.col("d_a") + F.col("d_b") >= 1)
    n = (F.col("n_a") + F.col("n_b")).cast("bigint")
    d = (F.col("d_a") + F.col("d_b")).cast("bigint")
    dd = d.cast("double")
    terms = staged.select(
        "g",
        "t",
        "d_a",
        "d_b",
        (dd * F.col("n_a") / n).alias("e_a"),
        (dd * F.col("n_b") / n).alias("e_b"),
        F.when(
            n > 1,
            dd * F.col("n_a") / n * F.col("n_b") / n * (n - d)
            / (n - 1),
        ).otherwise(F.lit(0.0)).alias("v"),
    )

    def gtsum(c: str):
        return F.aggregate(
            F.array_sort(
                F.collect_list(
                    F.struct(
                        F.col("g"), F.col("t"), F.col(c).alias("x")
                    )
                )
            ),
            F.lit(0.0),
            lambda acc, r: acc + r.getField("x"),
        )

    agg = terms.agg(
        F.countDistinct("g").cast("bigint").alias("n_strata"),
        F.count(F.lit(1)).cast("bigint").alias("n_times"),
        F.sum("d_a").cast("bigint").alias("o_a"),
        F.sum("d_b").cast("bigint").alias("o_b"),
        gtsum("e_a").alias("e_a"),
        gtsum("e_b").alias("e_b"),
        gtsum("v").alias("var_sum"),
    )
    chi2 = F.when(
        F.col("var_sum") > 0,
        (F.col("o_a") - F.col("e_a"))
        * (F.col("o_a") - F.col("e_a"))
        / F.col("var_sum"),
    )
    return agg.select(
        "n_strata", "n_times", "o_a", "e_a", "o_b", "e_b", "var_sum",
        chi2.alias("chi2"),
    )


def logrank_test(
    df: DataFrame,
    arm_col: str,
    duration_col: str,
    event_col: str,
    arm_a,
    arm_b,
) -> DataFrame:
    """Two-sample log-rank test (Mantel 1966) — the standard verdict
    on a pair of Kaplan–Meier curves: under H0 (identical survival),
    at every distinct EVENT time t_j the d_j pooled events should
    split between arms in proportion to the at-risk counts, so

        O_a - E_a,  E_aj = d_j * n_aj / n_j,
        V_j = d_j * (n_aj/n_j) * (n_bj/n_j) * (n_j - d_j)/(n_j - 1)

    and chi2 = (O_a - ΣE_aj)² / ΣV_j is asymptotically χ²(1).  This is
    the time-to-event A/B readout the KM curves alone can't give —
    censoring-aware, using every event time, no parametric model.

    Spark shape: ONE hash aggregate collapses subjects to the
    distinct-duration relation (each subject enters with its duration,
    arm, and event flag — the :func:`kaplan_meier` input contract);
    per-arm at-risk counts come from prefix window sums over that TINY
    relation (the KM pattern — bounded by distinct durations, never
    subject-sized), and the cross-time sums of E and V are FIXED-ORDER
    folds over the time-sorted list (the power_analysis rule: the only
    replayable cross-row double sum).  O_a/O_b are exact BIGINTs.

    Returns one row: (n_times, o_a, e_a, o_b, e_b, var_sum, chi2);
    chi2 NULL when ΣV = 0 (no events, or one arm empty).
    """
    from pyspark.sql import Window as W

    t = F.col(duration_col).cast("bigint")
    e = F.col(event_col).cast("bigint")
    a = F.col(arm_col) == arm_a
    b = F.col(arm_col) == arm_b
    per_t = (
        df.where(a | b)
        .groupBy(t.alias("t"))
        .agg(
            F.sum(F.when(a, e).otherwise(0)).alias("d_a"),
            F.sum(F.when(b, e).otherwise(0)).alias("d_b"),
            F.sum(F.when(a, 1).otherwise(0)).alias("c_a"),
            F.sum(F.when(b, 1).otherwise(0)).alias("c_b"),
        )
    )
    wpre = W.orderBy("t").rowsBetween(W.unboundedPreceding, -1)

    def at_risk(c: str):
        total = F.sum(c).over(W.partitionBy())
        prior = F.coalesce(F.sum(c).over(wpre), F.lit(0))
        return (total - prior).cast("bigint")

    staged = per_t.select(
        "t",
        "d_a",
        "d_b",
        at_risk("c_a").alias("n_a"),
        at_risk("c_b").alias("n_b"),
    ).where(F.col("d_a") + F.col("d_b") >= 1)
    n = (F.col("n_a") + F.col("n_b")).cast("bigint")
    d = (F.col("d_a") + F.col("d_b")).cast("bigint")
    dd = d.cast("double")
    terms = staged.select(
        "t",
        "d_a",
        "d_b",
        (dd * F.col("n_a") / n).alias("e_a"),
        (dd * F.col("n_b") / n).alias("e_b"),
        F.when(
            n > 1,
            dd * F.col("n_a") / n * F.col("n_b") / n * (n - d)
            / (n - 1),
        ).otherwise(F.lit(0.0)).alias("v"),
    )

    def tsum(c: str):
        return F.aggregate(
            F.array_sort(
                F.collect_list(F.struct(F.col("t"), F.col(c).alias("x")))
            ),
            F.lit(0.0),
            lambda acc, r: acc + r.getField("x"),
        )

    agg = terms.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_times"),
        F.sum("d_a").cast("bigint").alias("o_a"),
        F.sum("d_b").cast("bigint").alias("o_b"),
        tsum("e_a").alias("e_a"),
        tsum("e_b").alias("e_b"),
        tsum("v").alias("var_sum"),
    )
    chi2 = F.when(
        F.col("var_sum") > 0,
        (F.col("o_a") - F.col("e_a"))
        * (F.col("o_a") - F.col("e_a"))
        / F.col("var_sum"),
    )
    return agg.select(
        "n_times", "o_a", "e_a", "o_b", "e_b", "var_sum",
        chi2.alias("chi2"),
    )


def psm_att(
    df: DataFrame,
    treat_col: str,
    score_col: str,
    outcome_col: str,
    caliper: int | None = None,
    max_cells: int = 100_000,
) -> DataFrame:
    """Propensity-score MATCHING estimate of the average treatment
    effect on the treated (Rosenbaum & Rubin 1983 — the observational
    companion of the randomized DiD/CUPED family): each treated unit
    is matched WITH REPLACEMENT to the nearest control propensity
    score, and

        ATT = mean_t [ y_t − ȳ_c(nearest control score) ]

    ``score_col`` holds integer milli-propensities (the family
    contract), so matching collapses to SCORE CELLS: every treated
    unit at score s shares the one nearest control score s* (ties on
    \\|s−s*\\| break to the LOWER s* — deterministic), and its matched
    outcome is the mean control outcome at s* — exactly matching-to-
    all-ties, the textbook discrete-score estimator. ``caliper``
    (same integer units) drops treated cells with \\|s−s*\\| above it
    from the estimate (reported, never silently).

    Spark shape: ONE hash aggregate per arm to the score-cell
    relations (bounded by score cardinality — the counted probe
    fails fast past ``max_cells``), a broadcast cell-level nearest
    join, and fixed-order folds over the s-ascending cell list for
    every cross-cell float sum (the :func:`logrank_test` rule) — the
    whole estimate replays in SQL. Returns ONE row: (n_treated,
    n_control, n_matched, n_unmatched, sum_y_treated, att,
    mean_treated, mean_matched_control); NULL att when no treated
    cell matches.
    """
    from pyspark.sql import Window

    t = F.col(treat_col).cast("bigint")
    s = F.col(score_col).cast("bigint")
    y = F.col(outcome_col).cast("bigint")
    spark = df.sparkSession
    cells = df.groupBy(t.alias("t"), s.alias("s")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(y).cast("bigint").alias("sum_y"),
    )
    probe = cells.limit(max_cells + 1).count()
    if probe > max_cells:
        raise ValueError(
            f"more than max_cells={max_cells} distinct (treat, score) "
            "cells: quantize the propensity first (the family "
            "contract)"
        )
    tc = cells.where(F.col("t") == 1).select(
        "s", F.col("n").alias("n_t"), F.col("sum_y").alias("sum_yt")
    )
    cc = cells.where(F.col("t") == 0).select(
        F.col("s").alias("s_c"),
        F.col("n").alias("n_c"),
        F.col("sum_y").alias("sum_yc"),
    )
    pair_w = Window.partitionBy("s").orderBy(
        F.abs(F.col("s") - F.col("s_c")), F.col("s_c")
    )
    matched = (
        tc.join(F.broadcast(cc))
        .withColumn("_rk", F.row_number().over(pair_w))
        .where(F.col("_rk") == 1)
        .drop("_rk")
        .withColumn("dist", F.abs(F.col("s") - F.col("s_c")))
    )
    if caliper is not None:
        matched = matched.withColumn(
            "_ok", F.col("dist") <= F.lit(int(caliper))
        )
    else:
        matched = matched.withColumn("_ok", F.lit(True))

    def tsum(expr):
        return F.aggregate(
            F.array_sort(
                F.collect_list(F.struct(F.col("s"), expr.alias("x")))
            ),
            F.lit(0.0),
            lambda acc, r: acc + r.getField("x"),
        )

    ok = F.col("_ok")
    ybar_c = F.col("sum_yc").cast("double") / F.col("n_c")
    agg = matched.agg(
        F.coalesce(F.sum(F.when(ok, F.col("n_t"))), F.lit(0))
        .cast("bigint").alias("n_matched"),
        F.coalesce(F.sum(F.when(~ok, F.col("n_t"))), F.lit(0))
        .cast("bigint").alias("n_unmatched"),
        F.coalesce(F.sum(F.when(ok, F.col("sum_yt"))), F.lit(0))
        .cast("bigint").alias("sum_y_treated"),
        tsum(
            F.when(ok, F.col("n_t") * ybar_c).otherwise(F.lit(0.0))
        ).alias("ctrl_fold"),
    )
    arm_counts = {
        int(r["t"]): int(r["n"])
        for r in cells.groupBy("t").agg(F.sum("n").alias("n")).collect()
    }
    n_treated = arm_counts.get(1, 0)
    n_control = arm_counts.get(0, 0)
    nm = F.col("n_matched")
    att = F.when(
        nm > 0,
        (F.col("sum_y_treated") - F.col("ctrl_fold")) / nm,
    )
    return agg.select(
        F.lit(int(n_treated)).cast("bigint").alias("n_treated"),
        F.lit(int(n_control)).cast("bigint").alias("n_control"),
        "n_matched",
        "n_unmatched",
        "sum_y_treated",
        att.alias("att"),
        F.when(nm > 0, F.col("sum_y_treated").cast("double") / nm)
        .alias("mean_treated"),
        F.when(nm > 0, F.col("ctrl_fold") / nm)
        .alias("mean_matched_control"),
    )


def event_study(
    df: DataFrame,
    group_col: str,
    period_col: str,
    value_col: str,
    treated,
    baseline_period: int = -1,
) -> DataFrame:
    """Event-study (leads-and-lags) difference-in-differences — the
    dynamic readout :func:`diff_in_diff`'s single 2×2 collapses away:
    per RELATIVE period r (event at 0, ``period_col`` already the
    caller's relative index),

        effect_r = (mean_treat_r − mean_ctrl_r)
                 − (mean_treat_base − mean_ctrl_base)

    with base the ``baseline_period`` (conventionally −1, the last
    pre-period).  Pre-period effects ≈ 0 IS the parallel-trends
    diagnostic every DiD should show before anyone believes the
    post-period trace; post-period effects give the dynamic response
    (instant jump? ramp? decay?).

    Exactness (the family rule): ``value_col`` integer-valued, so
    every per-(period, arm) moment (n, Σx, Σx²) is an exact BIGINT
    from ONE hash aggregate over the corpus; means, the per-period
    diff, the baseline subtraction and the Welch-style
    diff standard error sqrt(var_t/n_t + var_c/n_c) are pinned
    chains (the SE covers the period's diff alone — the baseline
    term is a shared constant across rows, stated honestly).

    Spark shape: one hash aggregate to the periods-sized relation,
    the baseline row broadcast back as a 1-row cross join, all
    algebra on the tiny relation.  Raises when the baseline period
    has no rows in either arm.  Returns one row per period:
    (period, n_treat, n_ctrl, mean_treat, mean_ctrl, diff, effect,
    se_diff) — SE NULL when either arm has < 2 rows.
    """
    g = F.col(group_col)
    p = F.col(period_col).cast("bigint")
    x = F.col(value_col).cast("bigint")
    t = g == treated
    per = df.groupBy(p.alias("period")).agg(
        F.sum(F.when(t, 1).otherwise(0)).cast("bigint").alias("n_t"),
        F.sum(F.when(t, x)).cast("bigint").alias("s_t"),
        F.sum(F.when(t, x * x)).cast("bigint").alias("q_t"),
        F.sum(F.when(~t, 1).otherwise(0)).cast("bigint").alias("n_c"),
        F.sum(F.when(~t, x)).cast("bigint").alias("s_c"),
        F.sum(F.when(~t, x * x)).cast("bigint").alias("q_c"),
    )
    base_rows = per.where(
        F.col("period") == int(baseline_period)
    ).collect()
    if (
        not base_rows
        or not base_rows[0]["n_t"]
        or not base_rows[0]["n_c"]
    ):
        raise ValueError(
            f"baseline period {baseline_period} has no rows in one "
            "or both arms"
        )
    b = base_rows[0]
    base_diff = float(b["s_t"]) / b["n_t"] - float(b["s_c"]) / b["n_c"]
    mt = F.col("s_t").cast("double") / F.col("n_t")
    mc = F.col("s_c").cast("double") / F.col("n_c")
    diff = F.when((F.col("n_t") > 0) & (F.col("n_c") > 0), mt - mc)
    var_t = (F.col("q_t").cast("double") - F.col("n_t") * mt * mt) / (
        F.col("n_t") - 1
    )
    var_c = (F.col("q_c").cast("double") - F.col("n_c") * mc * mc) / (
        F.col("n_c") - 1
    )
    se = F.when(
        (F.col("n_t") > 1) & (F.col("n_c") > 1),
        F.sqrt(var_t / F.col("n_t") + var_c / F.col("n_c")),
    )
    return per.select(
        "period",
        F.col("n_t").alias("n_treat"),
        F.col("n_c").alias("n_ctrl"),
        F.when(F.col("n_t") > 0, mt).alias("mean_treat"),
        F.when(F.col("n_c") > 0, mc).alias("mean_ctrl"),
        diff.alias("diff"),
        (diff - F.lit(base_diff)).alias("effect"),
        se.alias("se_diff"),
    )


def diff_in_diff(
    df: DataFrame,
    group_col: str,
    period_col: str,
    value_col: str,
    treated,
    post,
) -> DataFrame:
    """Difference-in-differences — the workhorse quasi-experimental
    estimator when randomization wasn't possible (a feature shipped to
    one segment, a policy hit one region):

        DiD = (treated_post - treated_pre) - (control_post - control_pre)

    identifying the treatment effect under the parallel-trends
    assumption (both groups would have moved alike absent treatment —
    state it, test it on pre-periods, or don't use DiD).

    ``value_col`` integer-valued per unit; ``treated`` / ``post`` are
    the values of ``group_col`` / ``period_col`` marking the treated
    group and the post period.  ONE hash aggregate produces the 2x2
    cell moment sums; the estimate is a pinned chain over the four
    exact means.  Returns one row: the four cell means/counts, both
    group deltas, and the DiD estimate.
    """
    g = F.col(group_col)
    p = F.col(period_col)
    x = F.col(value_col).cast("bigint")
    cells = df.agg(
        *[
            agg
            for gi, gname in ((g == treated, "t"), (g != treated, "c"))
            for pi, pname in ((p == post, "post"), (p != post, "pre"))
            for agg in (
                F.sum(F.when(gi & pi, 1).otherwise(0)).alias(
                    f"n_{gname}_{pname}"
                ),
                F.sum(F.when(gi & pi, x)).alias(f"s_{gname}_{pname}"),
            )
        ]
    )

    def mean(gname, pname):
        return (
            F.col(f"s_{gname}_{pname}").cast("double")
            / F.col(f"n_{gname}_{pname}")
        )

    mtp, mtb = mean("t", "post"), mean("t", "pre")
    mcp, mcb = mean("c", "post"), mean("c", "pre")
    return cells.select(
        F.col("n_t_pre"), F.col("n_t_post"),
        F.col("n_c_pre"), F.col("n_c_post"),
        mtb.alias("treated_pre"),
        mtp.alias("treated_post"),
        mcb.alias("control_pre"),
        mcp.alias("control_post"),
        (mtp - mtb).alias("treated_delta"),
        (mcp - mcb).alias("control_delta"),
        ((mtp - mtb) - (mcp - mcb)).alias("did_estimate"),
    )


def robust_metric_summary(
    df: DataFrame,
    arm_col: str,
    value_col: str,
    id_col: str,
    trim: float = 0.05,
) -> DataFrame:
    """Per-arm raw / trimmed / winsorized means — the outlier-robust
    readout heavy-tailed metrics need (one whale user dominating
    revenue flips a naive t-test; trimming drops the tails, winsorizing
    clamps them — both standard, both reported so the analyst sees how
    much the tails carried).

    The trim rule is EXACT-integer (rank-based, engine-replayable):
    with n units per arm, k = floor(trim*n) rows drop from each tail;
    ranks come from one window ordered by ``(value, id)`` — the id
    tiebreak makes equal values deterministic.  Winsorized values clamp
    to the kept min/max per arm.  All sums are exact BIGINTs; each
    mean is one division.

    Spark shape: one shuffle on the arm key (window ranks), one hash
    aggregate.  Requires integer-valued ``value_col`` (cents).

    Returns one row per arm: (arm, n, k_trimmed_each_tail, raw_mean,
    trimmed_mean, winsorized_mean).
    """
    from pyspark.sql import Window as W

    x = F.col(value_col).cast("bigint")
    w = W.partitionBy(arm_col).orderBy(value_col, id_col)
    warm = W.partitionBy(arm_col)
    ranked = df.select(
        F.col(arm_col).alias("arm"),
        x.alias("x"),
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1)).over(warm).alias("n"),
    )
    k = F.floor(F.lit(trim) * F.col("n")).cast("long")
    kept = (F.col("rn") > k) & (F.col("rn") <= F.col("n") - k)
    # kept-boundary values per arm (for winsorized clamping)
    staged = ranked.select(
        "arm", "x", "n",
        k.alias("k"),
        kept.alias("kept"),
    )
    bounds = staged.where("kept").groupBy("arm").agg(
        F.min("x").alias("lo"), F.max("x").alias("hi")
    )
    j = staged.join(F.broadcast(bounds), "arm")
    clamped = F.least(F.greatest(F.col("x"), F.col("lo")), F.col("hi"))
    return j.groupBy("arm").agg(
        F.max("n").alias("n"),
        F.max("k").alias("k_trimmed_each_tail"),
        (F.sum("x").cast("double") / F.max("n")).alias("raw_mean"),
        (
            F.sum(F.when(F.col("kept"), F.col("x"))).cast("double")
            / F.sum(F.when(F.col("kept"), 1).otherwise(0))
        ).alias("trimmed_mean"),
        (F.sum(clamped).cast("double") / F.max("n")).alias(
            "winsorized_mean"
        ),
    )


def srm_check(
    df: DataFrame, arm_col: str, expected_shares: dict
) -> DataFrame:
    """Sample-ratio mismatch check — the trust gate run BEFORE reading
    any experiment metric: if the arm split deviates from the design
    (50/50, 90/10, ...), assignment is broken and every downstream
    readout is invalid (the industry rule: p < 0.001 on this test ⇒
    discard the experiment, don't "fix" it).

    Chi-squared goodness of fit of observed arm counts against
    ``expected_shares`` (arm -> design share; must sum to 1): one hash
    aggregate to the arms-sized count relation; each arm's
    ``(o - e)²/e`` is a pinned float chain over exact BIGINTs, reported
    per arm (``sum(chi2_contrib)`` is the statistic; df = arms - 1).

    Every DESIGN arm emits a row — an expected arm with zero observed
    traffic contributes its full ``(0 - e)²/e`` (a 100%-to-one-arm
    50/50 experiment reads chi2 = n, not n/2), and an observed arm
    missing from ``expected_shares`` raises instead of silently
    inflating the other arms' expected counts. Empty input raises.
    """
    total = abs(sum(expected_shares.values()) - 1.0)
    if total > 1e-9:
        raise ValueError("expected_shares must sum to 1")
    counts = df.groupBy(F.col(arm_col).alias("arm")).agg(
        F.count(F.lit(1)).alias("n_observed")
    )
    observed = {r["arm"]: r["n_observed"] for r in counts.collect()}
    unexpected = sorted(
        str(a) for a in observed if a not in expected_shares
    )
    if unexpected:
        raise ValueError(
            "srm_check: arms observed but absent from expected_shares: "
            + ", ".join(unexpected)
        )
    n_tot = sum(observed.values())
    if n_tot == 0:
        raise ValueError("srm_check: empty input (no rows in any arm)")
    rel = df.sparkSession.createDataFrame(
        [
            (arm, int(observed.get(arm, 0)), float(sh))
            for arm, sh in expected_shares.items()
        ],
        ["arm", "n_observed", "share"],
    )
    e = F.col("share") * F.lit(int(n_tot)).cast("double")
    o = F.col("n_observed").cast("double")
    return rel.select(
        "arm",
        F.col("n_observed").cast("bigint").alias("n_observed"),
        e.alias("n_expected"),
        ((o - e) * (o - e) / e).alias("chi2_contrib"),
    )


def quantile_treatment_effects(
    df: DataFrame,
    arm_col: str,
    value_col: str,
    id_col: str,
    arm_a,
    arm_b,
    quantiles: list[float] = (0.1, 0.25, 0.5, 0.75, 0.9),
) -> DataFrame:
    """Quantile treatment effects — where in the distribution the
    treatment acts ("the mean moved 2%: did everyone gain 2%, or did
    the top decile gain 20% while the median lost?"), the readout mean
    tests structurally cannot give.

    Quantiles are TYPE-1 (value at rank ``ceil(q*n)``, id-tiebroken) —
    no interpolation, so every reported quantile is an exact integer
    from the data and the per-quantile arm difference is an exact
    integer subtraction; nothing here depends on float arithmetic at
    all.  Spark shape: one window rank per arm + one semi-bounded
    filter per quantile grid entry (the grid is a literal), one output
    row per quantile.

    Returns (q, v_a, v_b, qte) with qte = v_a - v_b.
    """
    from pyspark.sql import Window as W

    x = F.col(value_col).cast("bigint")
    w = W.partitionBy(arm_col).orderBy(value_col, id_col)
    warm = W.partitionBy(arm_col)
    ranked = df.select(
        F.col(arm_col).alias("arm"),
        x.alias("x"),
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1)).over(warm).alias("n"),
    )
    grid = ranked.sparkSession.createDataFrame(
        [(float(q),) for q in quantiles], "q double"
    )
    hits = ranked.join(
        F.broadcast(grid),
        F.col("rn") == F.ceil(F.col("q") * F.col("n")),
    )
    a = hits.where(F.col("arm") == arm_a).select(
        "q", F.col("x").alias("v_a")
    )
    b = hits.where(F.col("arm") == arm_b).select(
        "q", F.col("x").alias("v_b")
    )
    return a.join(b, "q").select(
        "q", "v_a", "v_b", (F.col("v_a") - F.col("v_b")).alias("qte")
    )


def ratio_metric_ci(
    df: DataFrame,
    arm_col: str,
    num_col: str,
    den_col: str,
    z: float = 1.959963984540054,
) -> DataFrame:
    """Delta-method confidence interval for a RATIO-of-sums metric —
    the most common experiment metric shape (revenue-per-session,
    CTR = clicks/views, items-per-order): per arm,

        R = Σx / Σy  (x = numerator, y = denominator, both per UNIT)

    whose variance a naive per-unit t-test gets wrong (the unit of
    randomization is the user, not the session/view — sessions within
    a user are correlated).  The delta method linearizes R = x̄/ȳ
    around the means:

        Var(R) ≈ (var_x − 2R·cov_xy + R²·var_y) / (n · ȳ²)

    with sample (co)variances over UNITS, which is exactly the
    randomization unit and therefore correct under within-unit
    correlation of the raw events (Deng, Knoblich & Lu 2018,
    "Applying the Delta Method in Metric Analytics").

    Spark shape: ONE hash aggregate per arm over exact BIGINT moments
    (n, Σx, Σy, Σx², Σy², Σxy — integer-valued inputs, cents/counts);
    the CI is a pinned float chain on the arms-sized relation.  Returns
    one row per arm: (arm, n, sum_num, sum_den, ratio, se, ci_lo,
    ci_hi) — ci half-width = z·se, z defaults to the two-sided 95%
    normal quantile.  Degenerate guards (n < 2 or Σy = 0) yield NULL
    se/ci, never ANSI div-zero.
    """
    x = F.col(num_col).cast("bigint")
    y = F.col(den_col).cast("bigint")
    m = df.groupBy(F.col(arm_col).alias("arm")).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(x).alias("sx"),
        F.sum(y).alias("sy"),
        F.sum(x * x).alias("sxx"),
        F.sum(y * y).alias("syy"),
        F.sum(x * y).alias("sxy"),
    )
    # try_divide everywhere a degenerate arm (n = 1 or Σy = 0) would
    # hit ANSI div-zero — identical IEEE result on the nonzero path,
    # NULL through the guards otherwise.
    nd = F.col("n").cast("double")
    r = F.try_divide(F.col("sx").cast("double"), F.col("sy"))
    ybar = F.col("sy").cast("double") / nd
    varx = F.try_divide(
        F.col("sxx").cast("double")
        - F.col("sx").cast("double") * F.col("sx") / nd,
        F.col("n") - 1,
    )
    vary = F.try_divide(
        F.col("syy").cast("double")
        - F.col("sy").cast("double") * F.col("sy") / nd,
        F.col("n") - 1,
    )
    covxy = F.try_divide(
        F.col("sxy").cast("double")
        - F.col("sx").cast("double") * F.col("sy") / nd,
        F.col("n") - 1,
    )
    var_r = F.try_divide(
        varx - 2 * r * covxy + r * r * vary, nd * ybar * ybar
    )
    se = F.when(
        (F.col("n") > 1) & (F.col("sy") != 0) & (var_r >= 0),
        F.sqrt(var_r),
    )
    ratio = F.when(F.col("sy") != 0, r)
    return m.select(
        "arm",
        "n",
        F.col("sx").alias("sum_num"),
        F.col("sy").alias("sum_den"),
        ratio.alias("ratio"),
        se.alias("se"),
        (ratio - F.lit(float(z)) * se).alias("ci_lo"),
        (ratio + F.lit(float(z)) * se).alias("ci_hi"),
    )


def msprt(
    df: DataFrame,
    arm_col: str,
    value_col: str,
    arm_a,
    arm_b,
    tau2: float = 1.0,
    alpha: float = 0.05,
) -> DataFrame:
    """Mixture sequential probability ratio test (mSPRT) — the
    always-valid experiment readout: unlike a fixed-horizon t-test,
    the decision boundary holds at EVERY peek, so an analyst watching
    the dashboard daily cannot inflate the false-positive rate by
    stopping on the first lucky crossing (Johari, Koomen, Pekelis &
    Walsh 2017, "Peeking at A/B Tests").

    Normal-approximation mSPRT with a N(0, τ²) mixing prior on the
    mean-difference θ: with θ̂ = x̄_a − x̄_b and its plug-in variance
    V = s²_a/n_a + s²_b/n_b,

        Λ = sqrt(V / (V + τ²)) · exp(θ̂²·τ² / (2·V·(V + τ²)))

    and the always-valid p-value is min(1, 1/Λ); reject when
    Λ ≥ 1/α.  Assumptions stated (like :func:`diff_in_diff` does):
    CLT-scale arms (the normal approximation), variance treated as
    known at the plug-in estimate, and τ² chosen a priori to the scale
    of effects worth detecting — τ² near the typical θ² maximizes
    power; the test stays valid (conservative) for any fixed τ² > 0.

    Spark shape: the SAME one-hash-aggregate BIGINT moment sums as
    :func:`welch_ttest`; Λ is a pinned float chain on two 1-row
    relations.  Returns one row: (na, nb, mean_a, mean_b, theta, v,
    lr, always_valid_p, reject).  Degenerate guard: zero variance in
    both arms yields NULL lr/p and reject = NULL.
    """
    m = _moment_sums(df, arm_col, value_col)
    a = m.where(F.col("arm") == arm_a).select(
        F.col("n").alias("na"), F.col("sx").alias("sa"),
        F.col("sx2").alias("qa"),
    )
    b = m.where(F.col("arm") == arm_b).select(
        F.col("n").alias("nb"), F.col("sx").alias("sb"),
        F.col("sx2").alias("qb"),
    )
    j = a.crossJoin(F.broadcast(b))  # two 1-row relations

    def mean(s, n):
        return F.col(s).cast("double") / F.col(n)

    def var(q, s, n):
        return (
            F.col(q).cast("double")
            - F.col(s).cast("double") * F.col(s) / F.col(n)
        ) / (F.col(n) - 1)

    ma, mb = mean("sa", "na"), mean("sb", "nb")
    theta = ma - mb
    v = var("qa", "sa", "na") / F.col("na") + var(
        "qb", "sb", "nb"
    ) / F.col("nb")
    t2 = F.lit(float(tau2))
    lr = F.when(
        v > 0,
        F.sqrt(v / (v + t2))
        * F.exp(theta * theta * t2 / (2 * v * (v + t2))),
    )
    p = F.least(F.lit(1.0), 1 / lr)
    return j.select(
        F.col("na"),
        F.col("nb"),
        ma.alias("mean_a"),
        mb.alias("mean_b"),
        theta.alias("theta"),
        v.alias("v"),
        lr.alias("lr"),
        p.alias("always_valid_p"),
        (lr >= F.lit(1.0 / float(alpha))).alias("reject"),
    )


def msprt_curve(
    df: DataFrame,
    arm_col: str,
    value_col: str,
    ts_col: str,
    arm_a,
    arm_b,
    tau2: float = 1.0,
    alpha: float = 0.05,
) -> DataFrame:
    """The mSPRT MONITORING CURVE — :func:`msprt` evaluated at every
    day boundary, which is what an always-valid readout is FOR: the
    dashboard an analyst peeks at daily, where the running-minimum
    p-value is monotone and the first boundary crossing is a valid
    stop (Johari et al. 2017 — the sequential guarantee is over the
    whole path, so the curve, not the final point, is the product).

    Spark shape: ONE hash aggregate to the (arm, day)-sized partial
    moment relation (exact BIGINTs, map-side combinable); cumulative
    moments are prefix window sums of integers over the tiny day grid
    (exact, order-free); each day's Λ is the same pinned float chain
    as :func:`msprt`; the running-min p is a window min (exact).  At
    100 TB the day grid stays days-sized — nothing downstream grows
    with data.

    Per day: (day, na, nb, mean_a, mean_b, theta, v, lr,
    always_valid_p, p_running, reject_by_now).  Days where either arm
    has n < 2 carry NULL lr/p (insufficient data; the running min
    skips them).  ``day`` is floor(epoch_us / 86_400_000_000) — the
    UTC day grid, engine-portable.
    """
    from pyspark.sql import Window as W

    x = F.col(value_col).cast("bigint")
    day = F.floor(
        F.unix_micros(F.col(ts_col)) / F.lit(86_400_000_000)
    ).cast("bigint")
    # r16 optimization (r15 verdict ask #4, guide §2.3/§2.4): BOTH arm
    # sides come out of ONE conditional aggregate keyed on day alone —
    # no (arm, day) relation to persist, no per-side filters, no day
    # grid, no joins (the r15 persist shape was a measured ~1.4x local
    # tax, and the original was 3 corpus scans). sum(CASE WHEN arm=a
    # THEN 1 ELSE 0) per day equals the old per-(arm,day) count
    # coalesced onto the grid; the conditional Σx/Σx² are the same
    # exact BIGINT sums (order-free) with NULL-on-no-match coalesced
    # to 0 exactly like the old left joins. A NULL day group keeps the
    # old semantics too: the grid's join key never matched NULL, so
    # its six moments read 0.
    def _side(arm, suf):
        m = F.col(arm_col) == arm
        return [
            F.coalesce(
                F.sum(F.when(m, F.lit(1)).otherwise(F.lit(0))),
                F.lit(0),
            ).alias(f"n_{suf}"),
            F.coalesce(F.sum(F.when(m, x)), F.lit(0)).alias(
                f"s_{suf}"
            ),
            F.coalesce(F.sum(F.when(m, x * x)), F.lit(0)).alias(
                f"q_{suf}"
            ),
        ]

    grid = df.groupBy(day.alias("day")).agg(
        *_side(arm_a, "a"), *_side(arm_b, "b")
    )
    j = grid.select(
        "day",
        *[
            F.when(F.col("day").isNull(), F.lit(0))
            .otherwise(F.col(c))
            .alias(c)
            for c in ("n_a", "s_a", "q_a", "n_b", "s_b", "q_b")
        ],
    )
    wcum = W.orderBy("day").rowsBetween(W.unboundedPreceding, 0)
    cum = j.select(
        "day",
        *[
            F.sum(c).over(wcum).cast("bigint").alias(c[0] + c[-1])
            for c in ("n_a", "s_a", "q_a", "n_b", "s_b", "q_b")
        ],
    )

    def mean(s, n):
        return F.col(s).cast("double") / F.col(n)

    def var(q, s, n):
        return F.when(
            F.col(n) > 1,
            (
                F.col(q).cast("double")
                - F.col(s).cast("double") * F.col(s) / F.col(n)
            ) / (F.col(n) - 1),
        )

    ma, mb = mean("sa", "na"), mean("sb", "nb")
    theta = ma - mb
    v = var("qa", "sa", "na") / F.col("na") + var(
        "qb", "sb", "nb"
    ) / F.col("nb")
    t2 = F.lit(float(tau2))
    lr = F.when(
        v > 0,
        F.sqrt(v / (v + t2))
        * F.exp(theta * theta * t2 / (2 * v * (v + t2))),
    )
    staged = cum.select(
        "day", "na", "nb",
        F.when(F.col("na") > 0, ma).alias("mean_a"),
        F.when(F.col("nb") > 0, mb).alias("mean_b"),
        F.when((F.col("na") > 0) & (F.col("nb") > 0), theta).alias(
            "theta"
        ),
        v.alias("v"),
        lr.alias("lr"),
        F.least(F.lit(1.0), 1 / lr).alias("always_valid_p"),
    )
    wmin = W.orderBy("day").rowsBetween(W.unboundedPreceding, 0)
    p_run = F.min("always_valid_p").over(wmin)
    return staged.select(
        "*",
        p_run.alias("p_running"),
        (p_run <= F.lit(float(alpha))).cast("int").alias(
            "reject_by_now"
        ),
    )


# floor(CDF_Poisson(lambda=1)(k) * 2^60) for k = 0..7: the integer
# inverse-CDF thresholds the bootstrap weights are drawn through —
# integer comparisons against a 60-bit md5 uniform are exactly
# portable across engines (P(X > 8) ~ 1e-9 caps the chain at 8)
_POIS1_T60 = (
    424136118829305344,
    848272237658610688,
    1060340297073263360,
    1131029650211480960,
    1148701988496035328,
    1152236456152946176,
    1152825534095764608,
    1152909688087595776,
)


def poisson_bootstrap_ci(
    df: DataFrame,
    arm_col: str,
    value_col: str,
    id_col: str,
    n_replicates: int = 100,
    q_lo: float = 0.025,
    q_hi: float = 0.975,
) -> DataFrame:
    """Poisson-bootstrap confidence interval for the per-arm mean —
    THE distributed bootstrap (Chamandy et al. 2012, "Estimating
    Uncertainty for Massive Data Streams"): classical resampling needs
    the whole sample per replicate, which cannot shard; drawing each
    unit's per-replicate multiplicity as an independent Poisson(1)
    instead lets every replicate be computed in the SAME one pass over
    the data (multinomial -> Poisson approximation, exact as n grows).
    The nonparametric CI this yields is the standard fallback when the
    metric's sampling distribution is skewed enough that the
    normal-theory intervals (:func:`welch_ttest`,
    :func:`ratio_metric_ci`) are suspect.

    DETERMINISTIC and oracle-replayable: replicate b's weight for unit
    u is the Poisson(1) inverse CDF evaluated at the 60-bit md5
    uniform of "u:b" — integer threshold comparisons
    (``_POIS1_T60``), no engine RNG; replicate means are single
    divisions of exact BIGINT sums; the CI bounds are TYPE-1 quantiles
    of the B replicate means (rank ``ceil(q*B)``, replicate-id
    tiebreak), so every output value replays bit-for-bit.

    Spark shape: one ``explode(sequence)`` fans each unit into its B
    weighted copies map-side (the standard B×N bootstrap cost — B is
    the knob), ONE hash aggregate to the (arm, B)-sized replicate
    relation, and a rank window over that tiny relation.  Nothing
    downstream grows with data size.

    Returns one row per arm: (arm, n_units, point_mean, boot_lo,
    boot_hi).
    """
    from pyspark.sql import Window as W

    B = int(n_replicates)
    if B < 4:
        raise ValueError("n_replicates must be >= 4")
    x = F.col(value_col).cast("bigint")
    fanned = df.select(
        F.col(arm_col).alias("arm"),
        x.alias("x"),
        F.col(id_col).cast("string").alias("_id"),
        F.explode(F.sequence(F.lit(0), F.lit(B - 1))).alias("b"),
    )
    u60 = F.conv(
        F.substring(
            F.md5(F.concat_ws(":", F.col("_id"), F.col("b"))), 1, 15
        ),
        16,
        10,
    ).cast("bigint")
    w = F.lit(8)
    for k in range(len(_POIS1_T60) - 1, -1, -1):
        w = F.when(u60 < F.lit(_POIS1_T60[k]), F.lit(k)).otherwise(w)
    reps = (
        fanned.withColumn("w", w.cast("bigint"))
        .groupBy("arm", "b")
        .agg(
            F.sum("w").alias("sw"),
            F.sum(F.col("w") * F.col("x")).alias("swx"),
        )
    )
    mean_b = F.when(
        F.col("sw") > 0, F.col("swx").cast("double") / F.col("sw")
    )
    wr = W.partitionBy("arm").orderBy("m", "b")
    ranked = reps.select(
        "arm", "b", mean_b.alias("m")
    ).where(F.col("m").isNotNull()).select(
        "arm", "m", F.row_number().over(wr).alias("rn"),
        F.count(F.lit(1)).over(W.partitionBy("arm")).alias("nb"),
    )
    lo_rank = F.ceil(F.lit(float(q_lo)) * F.col("nb"))
    hi_rank = F.ceil(F.lit(float(q_hi)) * F.col("nb"))
    bounds = ranked.groupBy("arm").agg(
        F.max(F.when(F.col("rn") == F.greatest(lo_rank, F.lit(1)),
                     F.col("m"))).alias("boot_lo"),
        F.max(F.when(F.col("rn") == hi_rank, F.col("m"))).alias(
            "boot_hi"
        ),
    )
    point = df.groupBy(F.col(arm_col).alias("arm")).agg(
        F.count(F.lit(1)).alias("n_units"),
        F.sum(x).alias("_sx"),
    )
    return point.join(bounds, "arm").select(
        "arm",
        "n_units",
        (F.col("_sx").cast("double") / F.col("n_units")).alias(
            "point_mean"
        ),
        "boot_lo",
        "boot_hi",
    )


def covariate_balance(
    df: DataFrame,
    arm_col: str,
    covariate_cols: list[str],
    arm_a,
    arm_b,
) -> DataFrame:
    """Covariate balance check — the design-side companion of
    :func:`srm_check`: randomization should equalize PRE-treatment
    covariates across arms, and the standardized mean difference

        smd = (mean_a - mean_b) / sqrt((var_a + var_b) / 2)

    per covariate is the standard readout (|smd| < 0.1 = balanced —
    the epidemiology/trials rule of thumb).  An imbalanced covariate
    means assignment is broken or the analysis needs adjustment
    (CUPED / stratification); run this BEFORE reading any metric,
    next to the SRM gate.

    Spark shape: ONE wide hash aggregate computes every covariate's
    per-arm exact BIGINT moments in a single corpus pass (covariates
    must be integer-valued — cents/counts/flags); the per-covariate
    rows come from a literal-sized unpivot of that 1-row relation.
    Every statistic is a pinned float chain — oracle-replayable.

    Returns one row per covariate: (covariate, n_a, n_b, mean_a,
    mean_b, var_a, var_b, smd); smd NULL when both variances are 0.
    n_a/n_b count only rows where THAT covariate is non-null, so the
    moments stay internally consistent on sparse covariates.
    """
    a = F.col(arm_col) == arm_a
    b = F.col(arm_col) == arm_b
    aggs = []
    for c in covariate_cols:
        x = F.col(c).cast("bigint")
        # n counts only non-null covariate rows — F.sum skips NULLs,
        # so an all-row count would silently bias mean/var on a
        # covariate column containing NULLs (sum over non-null rows
        # divided by all rows)
        aggs += [
            F.sum(F.when(a & x.isNotNull(), 1).otherwise(0)).alias(
                f"na_{c}"
            ),
            F.sum(F.when(a, x)).alias(f"sa_{c}"),
            F.sum(F.when(a, x * x)).alias(f"qa_{c}"),
            F.sum(F.when(b & x.isNotNull(), 1).otherwise(0)).alias(
                f"nb_{c}"
            ),
            F.sum(F.when(b, x)).alias(f"sb_{c}"),
            F.sum(F.when(b, x * x)).alias(f"qb_{c}"),
        ]
    wide = df.agg(*aggs)
    fields = ("covariate", "n_a", "sa", "qa", "n_b", "sb", "qb")
    rows = wide.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(c).alias("covariate"),
                        F.col(f"na_{c}").cast("bigint").alias("n_a"),
                        F.col(f"sa_{c}").cast("bigint").alias("sa"),
                        F.col(f"qa_{c}").cast("bigint").alias("qa"),
                        F.col(f"nb_{c}").cast("bigint").alias("n_b"),
                        F.col(f"sb_{c}").cast("bigint").alias("sb"),
                        F.col(f"qb_{c}").cast("bigint").alias("qb"),
                    )
                    for c in covariate_cols
                ]
            ).alias("s")
        ).alias("s")
    ).select(*[F.col("s").getField(f).alias(f) for f in fields])

    def mean(s, n):
        return F.col(s).cast("double") / F.col(n)

    def var(q, s, n):
        return F.when(
            F.col(n) > 1,
            (
                F.col(q).cast("double")
                - F.col(s).cast("double") * F.col(s) / F.col(n)
            ) / (F.col(n) - 1),
        )

    ma, mb = mean("sa", "n_a"), mean("sb", "n_b")
    va, vb = var("qa", "sa", "n_a"), var("qb", "sb", "n_b")
    pooled = (va + vb) / 2
    smd = F.when(pooled > 0, (ma - mb) / F.sqrt(pooled))
    return rows.select(
        "covariate",
        "n_a",
        "n_b",
        ma.alias("mean_a"),
        mb.alias("mean_b"),
        va.alias("var_a"),
        vb.alias("var_b"),
        smd.alias("smd"),
    )


def power_analysis(
    df: DataFrame,
    arm_col: str,
    value_col: str,
    mde_abs: float,
    z_alpha: float = 1.959963984540054,
    z_beta: float = 0.8416212335729143,
) -> DataFrame:
    """Sample-size / power planner from MEASURED variance — the design
    step before launching an experiment: given the metric's observed
    per-unit variance (pooled across current arms) and the absolute
    minimum detectable effect ``mde_abs``, the classical two-sample
    formula

        n_per_arm = (z_alpha + z_beta)^2 * 2 * var_pooled / mde^2

    (two-sided alpha = 5%, power = 80% by default — the z constants
    are literals so the whole readout is a pinned float chain).  Also
    reports the inverse: the MDE detectable at the CURRENT per-arm
    sample size, ``sqrt((z_a+z_b)^2 * 2 * var / n_min)`` — "what can
    this experiment see today".

    Spark shape: ONE hash aggregate to pooled exact BIGINT moments
    (``value_col`` integer-valued); everything downstream is scalar
    math on a 1-row relation.  Pooled variance uses the within-arm
    moment identity summed over arms (arm means NOT mixed — a true
    effect would otherwise inflate the planning variance).

    Returns one row: (n_arms, n_min_arm, var_pooled, n_required_per_arm,
    mde_at_current_n).
    """
    x = F.col(value_col).cast("bigint")
    per_arm = df.groupBy(F.col(arm_col).alias("arm")).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(x).alias("s"),
        F.sum(x * x).alias("q"),
    )
    # within-arm sum of squared deviations, exactly: q - s*s/n per arm,
    # combined as a fixed 2-term-per-arm relation aggregate of doubles?
    # NO — cross-row float sums don't replay. Instead aggregate the
    # exact integer moments and the double SS per arm is combined via
    # a SORTED collect into a fixed-order fold (arms are few).
    rows = per_arm.select(
        "arm",
        "n",
        (
            F.col("q").cast("double")
            - F.col("s").cast("double") * F.col("s") / F.col("n")
        ).alias("ss"),
    )
    agg = rows.agg(
        F.count(F.lit(1)).alias("n_arms"),
        F.min("n").alias("n_min_arm"),
        F.sum("n").alias("n_tot"),
        F.aggregate(
            F.array_sort(
                F.collect_list(F.struct(F.col("arm"), F.col("ss")))
            ),
            F.lit(0.0),
            lambda acc, r: acc + r.getField("ss"),
        ).alias("ss_tot"),
    )
    var_pooled = F.col("ss_tot") / (
        F.col("n_tot") - F.col("n_arms")
    ).cast("double")
    za_zb2 = F.lit(float((z_alpha + z_beta) ** 2))
    mde2 = F.lit(float(mde_abs) * float(mde_abs))
    n_req = za_zb2 * 2 * var_pooled / mde2
    mde_now = F.sqrt(
        za_zb2 * 2 * var_pooled / F.col("n_min_arm")
    )
    return agg.select(
        F.col("n_arms").cast("bigint").alias("n_arms"),
        F.col("n_min_arm").cast("bigint").alias("n_min_arm"),
        var_pooled.alias("var_pooled"),
        n_req.alias("n_required_per_arm"),
        mde_now.alias("mde_at_current_n"),
    )


def qini_curve(
    df: DataFrame,
    score_col: str,
    arm_col: str,
    outcome_col: str,
    id_col: str,
    treated,
    n_buckets: int = 10,
) -> DataFrame:
    """Qini / uplift curve (Radcliffe 2007) — the evaluation readout
    for TARGETING: rank the population by a model's uplift score and
    ask, at each top-d% cut, how many INCREMENTAL conversions the
    treatment produced there:

        qini(d) = conv_t(d) - conv_c(d) * n_t(d) / n_c(d)

    (control conversions rescaled to the treated volume).  A useful
    score front-loads incremental converters — the curve rises
    steeply then flattens; random targeting is the straight diagonal.

    Exactness contract: ``outcome_col`` is a 0/1 integer flag and the
    top-d membership is the pure-integer test ``rn * n_buckets <=
    d * n`` over the (score desc, id) global ranking (the
    Lorenz/decile pattern) — every count is an exact BIGINT and
    qini/uplift are
    pinned float chains, so the whole curve replays bit-for-bit.

    Spark shape: the global rank comes from
    :func:`~oakstore_spark.operators.scaling.assign_contiguous_ids`
    (range-partition on (score desc, id) + per-partition offsets — a
    normal parallel exchange, NEVER the empty-key row_number window
    that funnels the unit population through one task), the total n
    falls out of the same counts pass, then one broadcast of the
    literal bucket grid and one hash aggregate to n_buckets rows.
    Buckets with no treated (or no control) rows report conv as an
    exact 0, not NULL.  Returns per bucket d: (bucket, n_t, conv_t,
    n_c, conv_c, qini, uplift).
    """
    from .scaling import assign_contiguous_ids

    b = int(n_buckets)
    prep = df.select(
        (F.col(arm_col) == treated).cast("int").alias("_t"),
        F.col(outcome_col).cast("bigint").alias("_y"),
        F.col(score_col).alias("_s"),
        F.col(id_col).alias("_id"),
    )
    ranked, n_total = assign_contiguous_ids(
        prep,
        [F.col("_s").desc(), F.col("_id")],
        id_name="_rn",
        return_total=True,
    )
    grid = df.sparkSession.range(1, b + 1).select(
        F.col("id").alias("bucket")
    )
    j = F.broadcast(grid).crossJoin(ranked).where(
        F.col("_rn") * b <= F.col("bucket") * F.lit(int(n_total))
    )
    agg = j.groupBy("bucket").agg(
        F.sum("_t").cast("bigint").alias("n_t"),
        F.coalesce(
            F.sum(F.when(F.col("_t") == 1, F.col("_y"))), F.lit(0)
        ).cast("bigint").alias("conv_t"),
        F.sum(1 - F.col("_t")).cast("bigint").alias("n_c"),
        F.coalesce(
            F.sum(F.when(F.col("_t") == 0, F.col("_y"))), F.lit(0)
        ).cast("bigint").alias("conv_c"),
    )
    qini = F.when(
        F.col("n_c") > 0,
        F.col("conv_t")
        - F.col("conv_c").cast("double") * F.col("n_t") / F.col("n_c"),
    )
    uplift = F.when(
        (F.col("n_t") > 0) & (F.col("n_c") > 0),
        F.col("conv_t").cast("double") / F.col("n_t")
        - F.col("conv_c").cast("double") / F.col("n_c"),
    )
    return agg.select(
        "bucket", "n_t", "conv_t", "n_c", "conv_c",
        qini.alias("qini"), uplift.alias("uplift"),
    )


def uplift_two_model(
    df: DataFrame,
    arm_col: str,
    feature_cols: list[str],
    outcome_col: str,
    treated,
    n_iter: int = 6,
    ridge: float = 1e-6,
) -> DataFrame:
    """Two-model (T-learner) uplift scorer — the model that PRODUCES
    the targeting score :func:`qini_curve` evaluates: fit one logistic
    regression per arm on pre-treatment features (response modeling),
    then score EVERY unit with both models; the uplift estimate is

        tau(x) = P(y=1 | x, treated) - P(y=1 | x, control)

    — who to target next campaign is whoever's tau is largest.  The
    T-learner (Kunzel et al. 2019) is the standard first uplift model:
    no interaction terms to hand-craft, each arm's fit is a plain
    supervised problem.

    Spark shape: two :func:`~oakstore_spark.operators.curation.
    fit_logistic_irls` fits (per iteration ONE scan producing a k x k
    Gram partial-aggregate, driver solves a k x k system — the
    fixed-dimension iterative-fit pattern), then ONE map-side scoring
    pass with both weight vectors as literals; nothing downstream
    grows with data size.  The returned relation feeds
    :func:`qini_curve` directly (score = uplift_score).

    Returns df's rows as (id passthrough columns…, p_treated,
    p_control, uplift_score).  Iterative fit — not SQL-expressible;
    pinned by the planted heterogeneous-effect pytest instead.
    """
    from .curation import fit_logistic_irls

    is_t = F.col(arm_col) == treated
    # pin the featurized relation: each IRLS iteration scans it once
    # per arm + the scoring pass (lazy localCheckpoint: materialized
    # by the first IRLS collect, ContextCleaner-released on GC)
    base = df.localCheckpoint(eager=False)
    w_t = fit_logistic_irls(
        base.where(is_t), feature_cols, outcome_col,
        n_iter=n_iter, ridge=ridge,
    )
    w_c = fit_logistic_irls(
        base.where(~is_t), feature_cols, outcome_col,
        n_iter=n_iter, ridge=ridge,
    )
    return score_uplift(base, feature_cols, w_t, w_c)


def score_uplift(
    df: DataFrame,
    feature_cols: list[str],
    w_t,
    w_c,
) -> DataFrame:
    """The SCORING half of :func:`uplift_two_model`, split out (r12
    verdict ask #8) so it takes LITERAL weight vectors — ``w_t`` /
    ``w_c`` are ``[intercept, coef_1, ..., coef_k]`` from any source
    (the in-engine IRLS fit, an offline training job, a config).  The
    split shrinks the engine's non-SQL-expressible surface to the
    IRLS solve itself: everything here — the two sigmoids and the
    uplift difference — is a fixed map-side float chain an oracle
    replays for pinned weights.

        p_arm(x) = 1 / (1 + exp(-(w_0 + Σ w_i·x_i)))
        uplift_score = p_treated(x) - p_control(x)

    Spark shape: ONE narrow map-side projection (weights are
    literals; no join, no shuffle, nothing grows with data size).
    Returns df's rows plus (p_treated, p_control, uplift_score).
    """
    k = len(feature_cols)
    for name, w in (("w_t", w_t), ("w_c", w_c)):
        if len(w) != k + 1:
            raise ValueError(
                f"{name} must have {k + 1} entries "
                "(intercept + one per feature)"
            )

    def prob(w) -> F.Column:
        eta = F.lit(float(w[0]))
        for i, c in enumerate(feature_cols):
            eta = eta + F.lit(float(w[i + 1])) * F.col(c).cast("double")
        return F.lit(1.0) / (F.lit(1.0) + F.exp(-eta))

    return df.select(
        "*",
        prob(w_t).alias("p_treated"),
        prob(w_c).alias("p_control"),
        (prob(w_t) - prob(w_c)).alias("uplift_score"),
    )


def post_stratified_mean(
    df: DataFrame,
    arm_col: str,
    stratum_col: str,
    value_col: str,
) -> DataFrame:
    """Post-stratification adjusted means — the variance-reduction
    readout next to :func:`cuped_adjust` when the covariate is
    CATEGORICAL (country, platform, acquisition channel): reweight
    each arm's per-stratum means by the POOLED stratum shares,

        mean_post(arm) = sum over strata s of (n_s / n) * mean(arm, s)

    removing the component of the arm difference that comes from
    uneven stratum mix rather than treatment (and shrinking variance
    when the stratum explains the metric).  Pooled weights are the
    standard choice — per-arm weights would just reproduce the raw
    mean.

    Spark shape: ONE hash aggregate to the (arm, stratum) moment
    relation (exact BIGINT n and Σx from an integer-valued metric);
    stratum shares and the final estimate run on that tiny relation,
    with the cross-strata sum a FIXED-ORDER stratum-sorted fold (the
    power_analysis rule — the only replayable cross-row double sum).

    An arm missing from some stratum has no defined per-stratum mean
    there: its post-stratified mean is NULL (n_strata_covered <
    n_strata) rather than a silently re-normalized, biased number.

    NULL metric rows are EXCLUDED from both the cell means and the
    pooled stratum weights (``n_cell`` counts only non-null
    ``value_col`` rows — the covariate_balance rule; counting them
    in the denominator while F.sum skips them would silently bias
    every mean — r12 ADVICE).  A cell whose rows are all-NULL
    contributes nothing, so ``n_units`` is the non-null unit count.

    Returns one row per arm: (arm, n_units, n_strata_covered,
    raw_mean, post_strat_mean).
    """
    from pyspark.sql import types as T

    from oakstore_spark.operators.scaling import literal_rows_df

    x = F.col(value_col).cast("bigint")
    # r16 optimization (r15 verdict ask #4, guide §1.2 step 1): the
    # whole readout derives from the (arm, stratum) moment relation —
    # bounded by arms x strata BY CONSTRUCTION — so collect it in ONE
    # job and compute shares/totals/reweighting driver-side instead of
    # persisting it for three downstream branches (the r15 persist
    # shape was a measured local tax on a sub-second query). Counts
    # and Σx stay exact Python ints; the per-stratum term and the
    # stratum-sorted fold are the identical IEEE ops in the identical
    # order as the old array_sort+aggregate HOF. Construction is EAGER
    # (one Spark job at call time; not composable over streaming
    # input); the result is a literal relation.
    cells = (
        df.groupBy(
            F.col(arm_col).alias("arm"),
            F.col(stratum_col).alias("stratum"),
        )
        .agg(
            F.count(x).alias("n_cell"),
            F.sum(x).alias("sx_cell"),
        )
        .where(F.col("n_cell") > 0)
        .collect()
    )
    arm_type = df.schema[arm_col].dataType
    schema = T.StructType(
        [
            T.StructField("arm", arm_type),
            T.StructField("n_units", T.LongType()),
            T.StructField("n_strata_covered", T.LongType()),
            T.StructField("raw_mean", T.DoubleType()),
            T.StructField("post_strat_mean", T.DoubleType()),
        ]
    )
    spark = df.sparkSession
    if not cells:
        return literal_rows_df(spark, [], schema)
    # pooled stratum weights come from EVERY cell (incl. a NULL
    # stratum group), but the reweighting join keyed on stratum drops
    # NULL-stratum cells (SQL NULL never matches), so those cells are
    # absent from every per-arm aggregate — replicated exactly
    strata: dict = {}
    for r_ in cells:
        strata[r_["stratum"]] = strata.get(r_["stratum"], 0) + int(
            r_["n_cell"]
        )
    n_tot = sum(strata.values())
    n_strata = len(strata)
    per_arm: dict = {}
    for r_ in cells:
        if r_["stratum"] is None:
            continue
        per_arm.setdefault(r_["arm"], []).append(r_)
    out_rows = []
    for arm, rows_ in per_arm.items():
        n_units = sum(int(r_["n_cell"]) for r_ in rows_)
        sx = sum(int(r_["sx_cell"]) for r_ in rows_)
        post = 0.0
        for r_ in sorted(rows_, key=lambda r__: r__["stratum"]):
            term = (
                float(strata[r_["stratum"]]) / float(n_tot)
            ) * (float(int(r_["sx_cell"])) / float(int(r_["n_cell"])))
            post = post + term
        covered = len(rows_)
        out_rows.append(
            (
                arm,
                n_units,
                covered,
                float(sx) / float(n_units),
                post if covered == n_strata else None,
            )
        )
    return literal_rows_df(spark, out_rows, schema)


def ipw_ate(
    df: DataFrame,
    arm_col: str,
    feature_cols: list[str],
    outcome_col: str,
    treated,
    n_iter: int = 6,
    clip: float = 0.01,
) -> DataFrame:
    """Inverse-propensity-weighted average treatment effect (the
    Hájek / stabilized-weights estimator) — the observational-data
    answer when assignment was NOT randomized and a naive arm
    difference is confounded: fit the propensity e(x) = P(treated|x)
    in-engine (:func:`~oakstore_spark.operators.curation.
    fit_logistic_irls` — one k×k Gram scan per iteration), then

        ATE = Σ t·y/ê / Σ t/ê  −  Σ (1−t)·y/(1−ê) / Σ (1−t)/(1−ê)

    reweighting each arm to the full population under
    unconfoundedness (treatment ignorable given x — stated, not
    testable; run :func:`covariate_balance` on the WEIGHTED sample to
    check the fit did its job).  Propensities clip to
    [clip, 1−clip] — the standard positivity guard against exploding
    weights.

    Spark shape: the IRLS fits are bounded scans; the estimate is ONE
    hash aggregate of weighted sums over the scored relation.
    Iterative float fit → not SQL-replayable; pinned by the planted
    confounding pytest (naive biased, IPW exact).

    Returns one row: (n, n_treated, naive_diff, ate_ipw,
    mean_treated_ipw, mean_control_ipw).
    """
    from .curation import fit_logistic_irls

    t = (F.col(arm_col) == treated).cast("int")
    base = df.withColumn("_t", t).localCheckpoint(eager=False)
    w = fit_logistic_irls(base, feature_cols, "_t", n_iter=n_iter)
    eta = F.lit(float(w[0]))
    for i, c in enumerate(feature_cols):
        eta = eta + F.lit(float(w[i + 1])) * F.col(c).cast("double")
    e = F.lit(1.0) / (F.lit(1.0) + F.exp(-eta))
    e = F.least(F.greatest(e, F.lit(float(clip))), F.lit(1.0 - float(clip)))
    y = F.col(outcome_col).cast("double")
    td = F.col("_t").cast("double")
    agg = base.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("_t").cast("bigint").alias("n_treated"),
        F.sum(td * y).alias("_sty"),
        F.sum((1 - td) * y).alias("_scy"),
        F.sum(td * y / e).alias("_wty"),
        F.sum(td / e).alias("_wt"),
        F.sum((1 - td) * y / (1 - e)).alias("_wcy"),
        F.sum((1 - td) / (1 - e)).alias("_wc"),
    )
    mt = F.when(F.col("_wt") > 0, F.col("_wty") / F.col("_wt"))
    mc = F.when(F.col("_wc") > 0, F.col("_wcy") / F.col("_wc"))
    naive = F.when(
        (F.col("n_treated") > 0) & (F.col("n_treated") < F.col("n")),
        F.col("_sty") / F.col("n_treated")
        - F.col("_scy") / (F.col("n") - F.col("n_treated")),
    )
    return agg.select(
        "n",
        "n_treated",
        naive.alias("naive_diff"),
        (mt - mc).alias("ate_ipw"),
        mt.alias("mean_treated_ipw"),
        mc.alias("mean_control_ipw"),
    )


def bh_adjust(
    df: DataFrame,
    p_col: str,
    alpha: float = 0.05,
    key_cols: list[str] | None = None,
) -> DataFrame:
    """Benjamini–Hochberg FDR adjustment (1995) — the multiple-
    comparisons guard for experiment platforms reading MANY metrics
    (or many segments) at once: controlling each test at alpha lets
    false positives scale with the metric count; BH controls the
    FALSE DISCOVERY RATE instead, the standard industry choice
    (Bonferroni is too blunt for dozens of correlated metrics).

        q_i = min over j >= i of  p_(j) * n / j      (ranks ascending)

    and reject where q <= alpha.  Exactness: ranks are exact integers
    over (p, key) — the key breaks p ties deterministically — each
    p*n/j is one pinned expression, and the suffix-min is order-free,
    so the whole adjustment replays bit-for-bit.

    Spark shape: the metric relation is SMALL by construction (one
    row per metric/segment readout — thousands at most, the OUTPUT
    of the per-metric aggregations, never unit-level data), so the
    rank and suffix-min windows run on a relation that fits one
    partition by nature; this is the one place an empty-key window is
    the honest plan.  Returns the input keys + (p, rank, q_value,
    reject) ordered by rank.
    """
    from pyspark.sql import Window as W

    keys = key_cols or []
    order = [F.col(p_col)] + [F.col(k) for k in keys]
    wr = W.orderBy(*order)
    wsuf = W.orderBy(*order).rowsBetween(0, W.unboundedFollowing)
    n = F.count(F.lit(1)).over(
        W.partitionBy()
    )
    staged = df.select(
        *keys,
        F.col(p_col).cast("double").alias("p"),
        F.row_number().over(wr).alias("rank"),
        n.alias("_n"),
    )
    raw = (
        F.col("p") * F.col("_n").cast("double") / F.col("rank")
    )
    q = F.least(F.min(raw).over(wsuf), F.lit(1.0))
    return staged.select(
        *keys,
        "p",
        F.col("rank").cast("bigint").alias("rank"),
        q.alias("q_value"),
        (q <= F.lit(float(alpha))).alias("reject"),
    )


def ips_evaluate(
    df: DataFrame,
    action_col: str,
    reward_col: str,
    logging_policy: DataFrame,
    target_policy: DataFrame,
    clip: float | None = None,
) -> DataFrame:
    """Off-policy evaluation of a TARGET policy from logged bandit
    data (inverse-propensity scoring, Horvitz–Thompson / Li et al.
    2011 — public): given logs (action, reward) collected under a
    known logging policy μ and a candidate policy π to evaluate
    WITHOUT deploying it,

        V_IPS   = (1/n) Σ_i r_i · w(a_i),   w(a) = π(a) / μ(a)
        V_SNIPS = Σ_i r_i·w(a_i) / Σ_i w(a_i)    (self-normalized)
        ESS     = (Σw)² / Σw²   (effective sample size — how much of
                                 the log the target policy can "see")

    Both policies arrive as bounded per-action probability TABLES
    (``action, prob``) — the stationary-logging-policy setting.  That
    structure is what makes the estimate exactly replayable at scale:
    rewards aggregate per ACTION first (exact BIGINT n_a, Σr_a from
    ONE hash aggregate), the weights join onto that bounded relation,
    and every cross-action float sum is a FIXED action-sorted fold
    (the power_analysis rule) — no corpus-sized float ordering
    anywhere.  Per-ROW (contextual) propensities need a different
    estimator family and are out of scope, stated.

    ``clip`` caps each weight at that value (the standard
    variance/bias trade for small μ; None = no cap).  Actions absent
    from a policy table get probability 0 — a logged action with
    μ = 0 is a data error and raises.

    Returns one row: (n, n_actions, ips_value, snips_value, ess,
    max_weight).
    """
    per_a = df.groupBy(F.col(action_col).alias("action")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_a"),
        F.sum(F.col(reward_col).cast("bigint")).alias("r_a"),
    )
    lp = logging_policy.select(
        F.col(action_col).alias("action"),
        F.col("prob").cast("double").alias("_mu"),
    )
    tp = target_policy.select(
        F.col(action_col).alias("action"),
        F.col("prob").cast("double").alias("_pi"),
    )
    # r15 optimization (guide §2.4/§5): persist the action-universe-
    # sized per-action relation — the propensity guard's eager collect
    # used to run the corpus aggregate once at construction and the
    # final agg ran it again at action time (2 corpus scans -> 1).
    from pyspark.storagelevel import StorageLevel

    per_a = per_a.persist(StorageLevel.MEMORY_AND_DISK)
    j = (
        per_a.join(F.broadcast(lp), "action", "left")
        .join(F.broadcast(tp), "action", "left")
    )
    bad = j.where(
        F.col("_mu").isNull() | (F.col("_mu") <= 0)
    ).limit(1).collect()
    if bad:
        raise ValueError(
            f"logged action {bad[0]['action']!r} has no positive "
            "logging-policy probability — the log is inconsistent "
            "with the declared policy"
        )
    w = F.coalesce(F.col("_pi"), F.lit(0.0)) / F.col("_mu")
    if clip is not None:
        w = F.least(w, F.lit(float(clip)))
    staged = j.select(
        "action", "n_a", "r_a", w.alias("_w")
    )

    def fold(term):
        return F.aggregate(
            F.array_sort(
                F.collect_list(
                    F.struct(F.col("action"), term.alias("v"))
                )
            ),
            F.lit(0.0),
            lambda acc, r: acc + r.getField("v"),
        )

    agg = staged.agg(
        F.sum("n_a").cast("bigint").alias("n"),
        F.count(F.lit(1)).cast("bigint").alias("n_actions"),
        fold(F.col("r_a").cast("double") * F.col("_w")).alias("_rw"),
        fold(F.col("n_a").cast("double") * F.col("_w")).alias("_sw"),
        fold(
            F.col("n_a").cast("double") * F.col("_w") * F.col("_w")
        ).alias("_sw2"),
        F.max("_w").alias("max_weight"),
    )
    ips = F.col("_rw") / F.col("n")
    snips = F.when(
        F.col("_sw") > 0, F.col("_rw") / F.col("_sw")
    )
    ess = F.when(
        F.col("_sw2") > 0,
        F.col("_sw") * F.col("_sw") / F.col("_sw2"),
    )
    from oakstore_spark.operators.scaling import track_persisted

    return track_persisted(
        agg.select(
            "n",
            "n_actions",
            ips.alias("ips_value"),
            snips.alias("snips_value"),
            ess.alias("ess"),
            "max_weight",
        ),
        per_a,
    )


def dr_evaluate(
    df: DataFrame,
    action_col: str,
    reward_col: str,
    logging_policy: DataFrame,
    target_policy: DataFrame,
    reward_model: DataFrame,
    clip: float | None = None,
) -> DataFrame:
    """Doubly-robust off-policy evaluation (Dudík et al. 2011 —
    public): combine :func:`ips_evaluate`'s importance weighting with
    a reward MODEL q̂(a) so the estimate stays consistent if EITHER
    the logging propensities or the model is right:

        V_DR = Σ_a π(a)·q̂(a)                    (model baseline)
             + (1/n) Σ_i w(a_i)·(r_i − q̂(a_i))   (IPS correction)

    The correction term shrinks the variance IPS pays for small μ
    wherever the model is accurate, and un-biases the model wherever
    it is not.  ``reward_model`` is a bounded per-action table
    (``action, q``) — the stationary setting, matching the policy
    tables; per-context models are out of scope, stated.

    Same replay structure as IPS: per-action exact BIGINT collapse
    (n_a, Σr_a), broadcast joins of the three bounded tables, every
    cross-action float sum a FIXED action-sorted fold.  Actions in
    the TARGET policy but never logged still contribute their model
    baseline π(a)·q̂(a) (that is the point of DR) — the baseline fold
    runs over the target-policy relation, not the log.

    Returns one row: (n, n_actions, dr_value, ips_value, model_value,
    max_weight).
    """
    per_a = df.groupBy(F.col(action_col).alias("action")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_a"),
        F.sum(F.col(reward_col).cast("bigint")).alias("r_a"),
    )
    lp = logging_policy.select(
        F.col(action_col).alias("action"),
        F.col("prob").cast("double").alias("_mu"),
    )
    tp = target_policy.select(
        F.col(action_col).alias("action"),
        F.col("prob").cast("double").alias("_pi"),
    )
    qm = reward_model.select(
        F.col(action_col).alias("action"),
        F.col("q").cast("double").alias("_q"),
    )
    # r15 optimization (guide §2.4/§5): the propensity guard's eager
    # collect used to evaluate the full corpus aggregate once at
    # construction and the final agg evaluated it AGAIN at action
    # time. Persist the action-universe-sized per-action relation so
    # the corpus is scanned exactly once; the guard then reads the
    # (tiny) cached relation.
    from pyspark.storagelevel import StorageLevel

    per_a = per_a.persist(StorageLevel.MEMORY_AND_DISK)
    j = (
        per_a.join(F.broadcast(lp), "action", "left")
        .join(F.broadcast(tp), "action", "left")
        .join(F.broadcast(qm), "action", "left")
    )
    bad = j.where(
        F.col("_mu").isNull() | (F.col("_mu") <= 0)
    ).limit(1).collect()
    if bad:
        raise ValueError(
            f"logged action {bad[0]['action']!r} has no positive "
            "logging-policy probability"
        )
    w = F.coalesce(F.col("_pi"), F.lit(0.0)) / F.col("_mu")
    if clip is not None:
        w = F.least(w, F.lit(float(clip)))
    qhat = F.coalesce(F.col("_q"), F.lit(0.0))
    staged = j.select(
        "action", "n_a", "r_a", w.alias("_w"), qhat.alias("_qh")
    )

    def fold(rel, term):
        return F.aggregate(
            F.array_sort(
                F.collect_list(
                    F.struct(F.col("action"), term.alias("v"))
                )
            ),
            F.lit(0.0),
            lambda acc, r: acc + r.getField("v"),
        )

    # model baseline over the TARGET policy relation (never-logged
    # actions included), model q joined on
    base = tp.join(F.broadcast(qm), "action", "left").agg(
        fold(
            None,
            F.col("_pi") * F.coalesce(F.col("_q"), F.lit(0.0)),
        ).alias("_vq")
    )
    agg = staged.agg(
        F.sum("n_a").cast("bigint").alias("n"),
        F.count(F.lit(1)).cast("bigint").alias("n_actions"),
        fold(
            None,
            F.col("_w")
            * (
                F.col("r_a").cast("double")
                - F.col("n_a").cast("double") * F.col("_qh")
            ),
        ).alias("_corr"),
        fold(None, F.col("r_a").cast("double") * F.col("_w")).alias(
            "_rw"
        ),
        F.max("_w").alias("max_weight"),
    ).crossJoin(F.broadcast(base))
    dr = F.col("_vq") + F.col("_corr") / F.col("n")
    from oakstore_spark.operators.scaling import track_persisted

    return track_persisted(
        agg.select(
            "n",
            "n_actions",
            dr.alias("dr_value"),
            (F.col("_rw") / F.col("n")).alias("ips_value"),
            F.col("_vq").alias("model_value"),
            "max_weight",
        ),
        per_a,
    )


def cliffs_delta(
    df: DataFrame,
    group_col: str,
    value_col: str,
    group_a,
    group_b,
) -> DataFrame:
    """Cliff's delta ordinal effect size (Cliff 1993 — public): the
    magnitude companion to a Mann-Whitney/rank test —

        δ = P(a > b) − P(a < b)  over pairs (a ∈ A, b ∈ B)

    in [−1, 1] (0 = stochastic equality; |δ| ≳ 0.33/0.47 are the
    conventional medium/large bands).  Unlike a mean difference, δ is
    invariant to any monotone transform of the metric — the honest
    effect size for skewed engagement/latency metrics.

    Computed WITHOUT a global per-row rank (the roc_auc rule):
    ONE hash aggregate collapses the two groups to the DISTINCT-VALUE
    relation (n_a_v, n_b_v per value), a prefix window bounded by
    VALUE CARDINALITY accumulates cum-b-below, and

        2·wins_a = Σ_v n_a_v · (2·cum_b_below(v) + n_b_v)

    keeps every term an exact BIGINT (ties half-counted, doubled
    away); δ = (2·wins_a − n_a·n_b) / (n_a·n_b) is ONE pinned chain.
    ``value_col`` integer-valued (the family contract — quantize
    first).  Rows in neither group are ignored.

    Returns one row: (n_a, n_b, n_values, wins2, auc_ab, delta);
    NULL metrics when either group is empty.
    """
    from pyspark.sql import Window

    g = F.col(group_col)
    a = F.when(g == group_a, 1).when(g == group_b, 0)
    per_v = (
        df.where(a.isNotNull())
        .groupBy(F.col(value_col).cast("bigint").alias("v"))
        .agg(
            F.sum(a).cast("bigint").alias("na_v"),
            F.sum(1 - a).cast("bigint").alias("nb_v"),
        )
    )
    wpre = Window.orderBy("v").rowsBetween(
        Window.unboundedPreceding, -1
    )
    staged = per_v.select(
        "v",
        "na_v",
        "nb_v",
        F.coalesce(F.sum("nb_v").over(wpre), F.lit(0)).alias(
            "cum_b_below"
        ),
    )
    agg = staged.agg(
        F.sum("na_v").cast("bigint").alias("n_a"),
        F.sum("nb_v").cast("bigint").alias("n_b"),
        F.count(F.lit(1)).cast("bigint").alias("n_values"),
        F.sum(
            F.col("na_v") * (2 * F.col("cum_b_below") + F.col("nb_v"))
        ).cast("bigint").alias("wins2"),
    )
    ok = (F.col("n_a") > 0) & (F.col("n_b") > 0)
    auc = F.when(
        ok,
        F.col("wins2").cast("double")
        / (2 * F.col("n_a").cast("double") * F.col("n_b")),
    )
    delta = F.when(
        ok,
        (
            F.col("wins2").cast("double")
            - F.col("n_a").cast("double") * F.col("n_b")
        )
        / (F.col("n_a").cast("double") * F.col("n_b")),
    )
    return agg.select(
        "n_a", "n_b", "n_values", "wins2",
        auc.alias("auc_ab"), delta.alias("delta"),
    )


def wilson_intervals(
    df: DataFrame,
    keys: list[str],
    success_col: str,
    z: float = 1.959963984540054,
) -> DataFrame:
    """Per-segment Wilson score interval for a proportion (Wilson
    1927 — public; the interval every dashboard SHOULD use instead of
    the Wald ±z·sqrt(pq/n), which collapses to zero width at p=0/1
    and undercovers small n):

        center = (p̂ + z²/2n) / (1 + z²/n)
        half   = z·sqrt(p̂(1−p̂)/n + z²/4n²) / (1 + z²/n)

    ``z`` is a caller-held LITERAL (default the two-sided 95% normal
    quantile, Python-computed — both engines embed the same double;
    no runtime inverse-CDF).

    Spark shape: ONE hash aggregate to the segment relation (exact
    BIGINT n and successes), the interval algebra map-side on it —
    each bound one pinned chain ending in the correctly-rounded sqrt.
    ``success_col`` must be a 0/1 integer flag.  Segments with n = 0
    cannot occur (they have no rows); the p̂=0/1 edges stay finite by
    construction, which is the point of Wilson.

    Returns keys + (n, successes, p_hat, lo, hi).
    """
    y = F.col(success_col).cast("bigint")
    agg = df.groupBy(*keys).agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(y).cast("bigint").alias("successes"),
    )
    n = F.col("n").cast("double")
    p = F.col("successes").cast("double") / n
    z2 = float(z) * float(z)
    denom = F.lit(1.0) + F.lit(z2) / n
    center = (p + F.lit(z2) / (2 * n)) / denom
    half = (
        F.lit(float(z))
        * F.sqrt(
            p * (F.lit(1.0) - p) / n
            + F.lit(z2) / (4 * n * n)
        )
        / denom
    )
    return agg.select(
        *keys,
        "n",
        "successes",
        p.alias("p_hat"),
        (center - half).alias("lo"),
        (center + half).alias("hi"),
    )


def rmst(
    df: DataFrame,
    duration_col: str,
    event_col: str,
    tau: float,
) -> DataFrame:
    """Restricted mean survival time — the area under the
    :func:`kaplan_meier` curve up to a horizon τ (Royston & Parmar
    2013 argue for it over hazard ratios when hazards are not
    proportional — public): "average event-free time within the first
    τ days", a number a product owner can read directly.

        RMST(τ) = ∫₀^τ S(t) dt
                = Σ over curve steps of S(t_i)·(min(t_{i+1},τ) −
                  min(t_i,τ)),  with S = 1 before the first step

    Spark shape: the KM relation (one subject aggregate + windows
    over the tiny distinct-duration relation), a LEAD for the step
    widths, and the area as a FIXED time-sorted fold (the
    power_analysis rule — the only replayable cross-row double sum).
    The leading [0, min(t₁, τ)) interval contributes at S = 1.

    Returns one row: (tau, n_times, rmst).
    """
    from pyspark.sql import Window as W

    km = kaplan_meier(df, duration_col, event_col)
    w = W.orderBy("t")
    staged = km.select(
        "t",
        "survival",
        F.lead("t").over(w).alias("_tn"),
    )
    t_i = F.least(F.col("t").cast("double"), F.lit(float(tau)))
    t_n = F.least(
        F.coalesce(F.col("_tn").cast("double"), F.lit(float(tau))),
        F.lit(float(tau)),
    )
    seg = F.col("survival") * (t_n - t_i)
    agg = staged.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_times"),
        F.min(F.least(F.col("t").cast("double"), F.lit(float(tau))))
        .alias("_t1"),
        F.aggregate(
            F.array_sort(
                F.collect_list(F.struct(F.col("t"), seg.alias("v")))
            ),
            F.lit(0.0),
            lambda acc, r: acc + r.getField("v"),
        ).alias("_area"),
    )
    return agg.select(
        F.lit(float(tau)).alias("tau"),
        "n_times",
        (F.col("_t1") + F.col("_area")).alias("rmst"),
    )


def mcnemar_test(
    df: DataFrame,
    before_col: str,
    after_col: str,
) -> DataFrame:
    """McNemar's paired-binary test (McNemar 1947 — public): did a
    change FLIP outcomes, unit by unit — the right test when the same
    units are measured under both conditions (model v1 vs v2 on the
    same examples, before/after a feature launch on the same users),
    where an unpaired two-proportion z-test throws away the pairing.

        b = #(1→0 flips), c = #(0→1 flips)
        χ² = (|b − c| − 1)² / (b + c)      (continuity-corrected)

    Only the DISCORDANT pairs carry information; concordant ones are
    reported but never enter the statistic.

    Spark shape: ONE conditional hash aggregate (four exact BIGINT
    cells), the statistic a pinned chain.  Both columns must be 0/1
    integer flags; b + c = 0 (no flips at all) reads NULL χ².

    Returns one row: (n, n00, n01, n10, n11, chi2).
    """
    b0 = F.col(before_col).cast("bigint")
    a0 = F.col(after_col).cast("bigint")
    agg = df.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(((1 - b0) * (1 - a0))).cast("bigint").alias("n00"),
        F.sum(((1 - b0) * a0)).cast("bigint").alias("n01"),
        F.sum((b0 * (1 - a0))).cast("bigint").alias("n10"),
        F.sum((b0 * a0)).cast("bigint").alias("n11"),
    )
    b = F.col("n10").cast("double")
    c = F.col("n01").cast("double")
    num = F.abs(b - c) - F.lit(1.0)
    chi2 = F.when(
        F.col("n10") + F.col("n01") > 0,
        (num * num) / (b + c),
    )
    return agg.select(
        "n", "n00", "n01", "n10", "n11", chi2.alias("chi2")
    )


def cramers_v(
    df: DataFrame,
    a_col: str,
    b_col: str,
) -> DataFrame:
    """Cramér's V association strength for two categoricals (Cramér
    1946 — public): the EFFECT SIZE companion to the chi-squared
    independence test (q_chi2_lang_source tells you association
    exists; V ∈ [0,1] tells you whether it matters) — comparable
    across tables of any shape, unlike raw χ².

        V = sqrt( χ² / (n · (min(r, c) − 1)) )

    Spark shape: ONE hash aggregate to the (a, b) contingency relation
    (bounded by category-cardinality product), margins via two
    aggregates on that tiny relation, expected counts as rational
    chains, and the cross-cell χ² sum a FIXED (a, b)-sorted fold (the
    power_analysis rule).  Every input to the final sqrt derives from
    exact BIGINTs, so V replays bit-for-bit.  NULL categories are
    excluded; a single-category side reads NULL V.

    Returns one row: (n, n_rows_cat, n_cols_cat, chi2, v).

    Construction is EAGER: the contingency collect runs one Spark job
    when the operator is called (so it cannot compose over streaming
    input), and the returned relation is a literal single row.
    """
    import math

    from oakstore_spark.operators.scaling import literal_rows_df

    a = F.col(a_col).cast("string")
    b = F.col(b_col).cast("string")
    # r16 optimization (r15 verdict ask #4, guide §1.2 step 1): the
    # whole readout derives from the contingency relation, which is
    # bounded by the category-cardinality product BY CONSTRUCTION —
    # collect it in ONE job and replay the identical float chain
    # driver-side instead of persisting it for four downstream
    # branches (margins, totals, chi2 join — the r15 persist shape was
    # a measured 1.4-2.2x LOCAL tax: cache-materialization stage + 3
    # follow-up jobs on sub-second queries). The driver transfer is
    # the same bounded rows the old broadcasts already pulled through
    # the driver. Exactness: margins and n are exact BIGINT sums
    # (order-free); e = double(ra)*double(cb)/n, the chi2 fold adds
    # the (a,b)-sorted terms then + n — the identical IEEE ops in the
    # identical order as the old array_sort+aggregate HOF (Python str
    # sort = code-point order = Spark's binary UTF-8 string order);
    # math.sqrt and Math.sqrt are both correctly rounded.
    cells = (
        df.where(a.isNotNull() & b.isNotNull())
        .groupBy(a.alias("_a"), b.alias("_b"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("_o"))
        .collect()
    )
    schema = T.StructType(
        [
            T.StructField("n", T.LongType()),
            T.StructField("n_rows_cat", T.LongType()),
            T.StructField("n_cols_cat", T.LongType()),
            T.StructField("chi2", T.DoubleType()),
            T.StructField("v", T.DoubleType()),
        ]
    )
    if not cells:
        # empty input: the old global aggregate emitted one all-NULL row
        return literal_rows_df(
            df.sparkSession, [(None, None, None, None, None)], schema
        )
    ra: dict = {}
    cb_m: dict = {}
    n = 0
    for r_ in cells:
        o = int(r_["_o"])
        n += o
        ra[r_["_a"]] = ra.get(r_["_a"], 0) + o
        cb_m[r_["_b"]] = cb_m.get(r_["_b"], 0) + o
    nd = float(n)
    # UNOBSERVED cells (o = 0) still contribute their expected count
    # to chi2; rather than generating the full grid, use the identity
    # sum over all cells of e == n, so chi2 = n + fold over OBSERVED
    # cells of ((o-e)^2/e - e)
    acc = 0.0
    for a_, b_, o in sorted(
        (r_["_a"], r_["_b"], int(r_["_o"])) for r_ in cells
    ):
        e = float(ra[a_]) * float(cb_m[b_]) / nd
        od = float(o)
        acc = acc + ((od - e) * (od - e) / e - e)
    chi2 = acc + nd
    rr, cc = len(ra), len(cb_m)
    mind = float(min(rr, cc)) - 1.0
    v = math.sqrt(chi2 / (nd * mind)) if mind > 0 else None
    return literal_rows_df(
        df.sparkSession, [(n, rr, cc, chi2, v)], schema
    )


def odds_ratio(
    df: DataFrame,
    exposure_col: str,
    outcome_col: str,
    z: float = 1.959963984540054,
) -> DataFrame:
    """2×2 odds ratio with the Woolf log-interval (public textbook):
    the case-control readout — how much more likely is the outcome
    among the exposed —

        OR = (a·d) / (b·c)
        CI = exp( ln OR ± z·sqrt(1/a + 1/b + 1/c + 1/d) )

    with a=exposed-outcome, b=exposed-no, c=unexposed-outcome,
    d=unexposed-no.  Spark shape: ONE conditional aggregate to four
    exact BIGINT cells, the readout a pinned chain.  Any zero cell
    reads NULL OR/CI (the Woolf interval is undefined; apply a
    Haldane correction upstream if needed — stated, not silently
    done).  ``z`` is a caller-held literal.  ln/exp are the 1-ulp
    libm class: the float outputs are rounded to 9 decimals (the
    established rounding precedent), counts stay exact.

    Returns one row: (a, b, c, d, odds_ratio, lo, hi).
    """
    ex = F.col(exposure_col).cast("bigint")
    y = F.col(outcome_col).cast("bigint")
    agg = df.agg(
        F.sum(ex * y).cast("bigint").alias("a"),
        F.sum(ex * (1 - y)).cast("bigint").alias("b"),
        F.sum((1 - ex) * y).cast("bigint").alias("c"),
        F.sum((1 - ex) * (1 - y)).cast("bigint").alias("d"),
    )
    ok = (
        (F.col("a") > 0)
        & (F.col("b") > 0)
        & (F.col("c") > 0)
        & (F.col("d") > 0)
    )
    orr = (
        F.col("a").cast("double") * F.col("d")
        / (F.col("b").cast("double") * F.col("c"))
    )
    se = F.sqrt(
        1 / F.col("a").cast("double")
        + 1 / F.col("b").cast("double")
        + 1 / F.col("c").cast("double")
        + 1 / F.col("d").cast("double")
    )
    lo = F.exp(F.log(orr) - F.lit(float(z)) * se)
    hi = F.exp(F.log(orr) + F.lit(float(z)) * se)
    return agg.select(
        "a",
        "b",
        "c",
        "d",
        F.when(ok, F.round(orr, 9)).alias("odds_ratio"),
        F.when(ok, F.round(lo, 9)).alias("lo"),
        F.when(ok, F.round(hi, 9)).alias("hi"),
    )


def cohens_d(
    df: DataFrame,
    group_col: str,
    value_col: str,
    group_a,
    group_b,
) -> DataFrame:
    """Standardized mean difference — Cohen's d with the Hedges' g
    small-sample correction (Cohen 1988 / Hedges 1981 — public): the
    metric-scale effect size next to :func:`cliffs_delta`'s ordinal
    one; the number meta-analyses and power planning consume
    (|d| ≈ 0.2/0.5/0.8 small/medium/large):

        d = (mean_a − mean_b) / s_pooled
        s_pooled² = [(n_a−1)s_a² + (n_b−1)s_b²] / (n_a + n_b − 2)
        g = d · (1 − 3 / (4(n_a+n_b) − 9))

    Exactness (the Welch rule): ``value_col`` integer-valued, so all
    moments (n, Σx, Σx² per arm) are exact BIGINTs from ONE
    conditional hash aggregate, and d/g are pinned chains ending in
    the correctly-rounded sqrt.  NULL when either arm has < 2 rows or
    the pooled variance is 0.

    Returns one row: (n_a, n_b, mean_a, mean_b, sd_pooled, d,
    hedges_g).
    """
    g = F.col(group_col)
    x = F.col(value_col).cast("bigint")
    ia = (g == group_a).cast("bigint")
    ib = (g == group_b).cast("bigint")
    agg = df.agg(
        F.sum(ia).cast("bigint").alias("n_a"),
        F.sum(ib).cast("bigint").alias("n_b"),
        F.sum(ia * x).cast("bigint").alias("_sa"),
        F.sum(ib * x).cast("bigint").alias("_sb"),
        F.sum(ia * x * x).cast("bigint").alias("_qa"),
        F.sum(ib * x * x).cast("bigint").alias("_qb"),
    )
    na = F.col("n_a").cast("double")
    nb = F.col("n_b").cast("double")
    ma = F.col("_sa").cast("double") / na
    mb = F.col("_sb").cast("double") / nb
    ssa = F.col("_qa").cast("double") - na * ma * ma
    ssb = F.col("_qb").cast("double") - nb * mb * mb
    sp2 = (ssa + ssb) / (na + nb - 2)
    ok = (F.col("n_a") >= 2) & (F.col("n_b") >= 2) & (sp2 > 0)
    sp = F.sqrt(sp2)
    d = (ma - mb) / sp
    corr = F.lit(1.0) - F.lit(3.0) / (4 * (na + nb) - 9)
    return agg.select(
        "n_a",
        "n_b",
        ma.alias("mean_a"),
        mb.alias("mean_b"),
        F.when(ok, sp).alias("sd_pooled"),
        F.when(ok, d).alias("d"),
        F.when(ok, d * corr).alias("hedges_g"),
    )
