#!/usr/bin/env python
"""Product-analytics pipeline over the event fixtures: the round-10
growth/experimentation layer end to end — funnel, cohort retention,
multi-touch attribution, an A/B readout with CUPED, and the
Kaplan-Meier time-to-convert curve.

Run: python examples/product_analytics_pipeline.py [sf_dir]
(default sf0.001)
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F  # noqa: E402

from oakstore_spark.operators.experiments import (  # noqa: E402
    cuped_adjust,
    kaplan_meier,
    proportion_ztest,
    welch_ttest,
)
from oakstore_spark.operators.timeseries import (  # noqa: E402
    cohort_retention,
    funnel_analysis,
    funnel_summary,
    multi_touch_attribution,
)
from oakstore_spark.session import get_spark  # noqa: E402
from oakstore_spark.sources import table  # noqa: E402


def main(sf_dir: str = "/root/testdata/sf0.001") -> None:
    spark = get_spark("product_analytics_example")
    e = table(spark, sf_dir, "events")

    # 1. Ordered funnel: view -> click -> purchase, per-step summary
    names = ["view", "click", "purchase"]
    steps = [(n, F.col("event_type") == n) for n in names]
    per_user = funnel_analysis(e, steps)
    summary = funnel_summary(per_user, names)
    print("funnel:")
    for r in summary.collect():
        print("  ", r)

    # 2. Weekly cohort retention
    cohorts = cohort_retention(e, period="week")
    print("cohort cells:", cohorts.count())

    # 3. U-shaped multi-touch attribution, 1-day lookback
    credit = multi_touch_attribution(
        e,
        conversion_pred=F.col("event_type") == "purchase",
        touch_pred=F.col("event_type").isin("view", "click"),
        channel_col="event_type",
        conv_id_col="event_id",
        model="position",
        lookback="1 day",
    )
    print("attribution (channel, k, role, credit):")
    for r in credit.orderBy("channel", "k", "role").collect():
        print("  ", r.channel, r.k, r.role, round(r.credit, 3))

    # 4. A/B readout on per-user purchase spend + big-purchase
    # conversion, then CUPED with the first-half-of-month covariate
    cents = F.round(F.col("value") * 100).cast("bigint")
    purchase = F.col("event_type") == "purchase"
    split = F.lit("2024-01-16").cast("timestamp")
    units = e.groupBy("user_id").agg(
        F.coalesce(F.sum(F.when(purchase, cents)), F.lit(0)).alias("spend"),
        F.coalesce(
            F.sum(F.when(purchase & (F.col("ts") < split), cents)), F.lit(0)
        ).alias("pre"),
        F.coalesce(
            F.sum(F.when(purchase & (F.col("ts") >= split), cents)),
            F.lit(0),
        ).alias("post"),
        F.max(
            F.when(purchase & (F.col("value") > 200), 1).otherwise(0)
        ).cast("bigint").alias("converted"),
    ).withColumn("arm", F.col("user_id") % 2)
    t = welch_ttest(units, "arm", "spend", 0, 1).collect()[0]
    z = proportion_ztest(units, "arm", "converted", 0, 1).collect()[0]
    print(f"welch t={t.t_stat} df={t.welch_df}  z={z.z_stat}")
    for r in cuped_adjust(units, "arm", "post", "pre").collect():
        print(
            f"  arm {r.arm}: raw {r.raw_mean:.1f} "
            f"cuped {r.cuped_mean:.1f} (rho2 {r.variance_reduction:.3f})"
        )

    # 4b. Trust gate + robust and distributional readouts
    from oakstore_spark.operators.experiments import (
        quantile_treatment_effects,
        robust_metric_summary,
        srm_check,
    )
    from oakstore_spark.operators.timeseries import top_event_paths

    srm = srm_check(
        units.select("user_id", "arm"), "arm", {0: 0.5, 1: 0.5}
    ).collect()
    print("srm chi2:", round(sum(r.chi2_contrib for r in srm), 4))
    for r in robust_metric_summary(
        units, "arm", "spend", "user_id", trim=0.05
    ).orderBy("arm").collect():
        print(
            f"  arm {r.arm}: raw {r.raw_mean:.0f} trimmed "
            f"{r.trimmed_mean:.0f} winsorized {r.winsorized_mean:.0f}"
        )
    for r in quantile_treatment_effects(
        units, "arm", "spend", "user_id", 0, 1, quantiles=[0.25, 0.5, 0.75]
    ).orderBy("q").collect():
        print(f"  q={r.q}: {r.v_a} vs {r.v_b} (qte {r.qte})")
    print("top journeys:")
    for r in top_event_paths(
        e, ["user_id"], "ts", "event_type", n=3, top_k=5,
        order_tiebreak=["event_id"],
    ).collect():
        print(f"  {r.path} x{r.n_occurrences}")

    # 4c. Uncertainty + sequential readouts (NEW r11): the delta-method
    # CI for the ratio metric an experimenter actually ships
    # (revenue-per-event), the peek-proof mSPRT decision and its
    # day-by-day monitoring curve, and the Poisson-bootstrap CI as the
    # nonparametric cross-check for the skewed spend metric
    from oakstore_spark.operators.experiments import (
        msprt,
        msprt_curve,
        poisson_bootstrap_ci,
        ratio_metric_ci,
    )

    ue = units.join(
        e.groupBy("user_id").agg(F.count(F.lit(1)).alias("n_events")),
        "user_id",
    )
    for r in ratio_metric_ci(
        ue, "arm", "spend", "n_events"
    ).orderBy("arm").collect():
        print(
            f"  arm {r.arm}: rev/event {r.ratio:.2f} "
            f"[{r.ci_lo:.2f}, {r.ci_hi:.2f}]"
        )
    m = msprt(units, "arm", "spend", 0, 1, tau2=10000.0).collect()[0]
    print(
        f"msprt lr={m.lr:.3f} always-valid p={m.always_valid_p:.3f} "
        f"reject={m.reject}"
    )
    curve = msprt_curve(
        e.where(purchase).select(
            (F.col("user_id") % 2).alias("arm"), "ts",
            F.round(F.col("value") * 100).cast("bigint").alias("cents"),
        ),
        "arm", "cents", "ts", 0, 1, tau2=10000.0,
    ).orderBy("day").collect()
    print(
        "msprt curve: "
        + " ".join(f"{r.p_running:.2f}" for r in curve[-5:])
    )
    for r in poisson_bootstrap_ci(
        units, "arm", "spend", "user_id", n_replicates=50
    ).orderBy("arm").collect():
        print(
            f"  arm {r.arm}: bootstrap mean {r.point_mean:.1f} "
            f"[{r.boot_lo:.1f}, {r.boot_hi:.1f}]"
        )

    # 5. Kaplan-Meier: days from first event to first big purchase,
    # censored at last activity
    big = F.when(purchase & (F.col("value") > 200), F.col("ts"))
    surv_units = e.groupBy("user_id").agg(
        F.datediff(
            F.to_date(F.coalesce(F.min(big), F.max("ts"))),
            F.to_date(F.min("ts")),
        ).alias("dur"),
        F.max(big).isNotNull().cast("int").alias("ev"),
    )
    print("kaplan-meier:")
    for r in kaplan_meier(surv_units, "dur", "ev").orderBy("t").collect():
        print(
            f"  t={r.t} at_risk={r.n_risk} events={r.n_events} "
            f"S={r.survival:.3f}"
        )

    # 6. The round-12 layer: the log-rank verdict on the KM curves,
    # targeting (uplift model trained in-engine, read out as a Qini
    # curve), the quasi-experimental estimators (post-stratification,
    # IPW), classifier evaluation of the conversion score, and a
    # DP-noised release of the arm counts
    from oakstore_spark.operators.experiments import (
        ipw_ate,
        logrank_test,
        post_stratified_mean,
        qini_curve,
        uplift_two_model,
    )
    from oakstore_spark.operators.pii import dp_release
    from oakstore_spark.operators.quality import (
        calibration_report,
        roc_auc,
    )

    lr = logrank_test(
        surv_units.withColumn("arm", F.col("user_id") % 2),
        "arm", "dur", "ev", 0, 1,
    ).collect()[0]
    print(
        f"log-rank: O_a={lr.o_a} E_a={lr.e_a:.1f} chi2={lr.chi2:.3f}"
    )

    scored = uplift_two_model(
        units.select(
            "user_id", "arm", "converted",
            (F.col("pre") / 10000.0).alias("f_spend"),
        ),
        "arm", ["f_spend"], "converted", treated=1, n_iter=4,
    )
    q5 = {
        r.bucket: r
        for r in qini_curve(
            scored, "uplift_score", "arm", "converted", "user_id", 1
        ).collect()
    }
    print(
        "qini(d=5):", round(q5[5].qini, 2),
        " qini(d=10):", round(q5[10].qini, 2),
    )

    strat = units.select(
        "arm", "spend", ((F.col("user_id") / 2).cast("bigint") % 4).alias("seg")
    )
    for r in post_stratified_mean(strat, "arm", "seg", "spend").orderBy(
        "arm"
    ).collect():
        print(
            f"  arm {r.arm}: raw {r.raw_mean:.1f} "
            f"post-stratified {r.post_strat_mean:.1f}"
        )

    med_pre = units.agg(
        F.expr("percentile(pre, 0.5)").alias("m")
    ).collect()[0].m
    obs = units.select(
        (F.col("pre") > med_pre).cast("int").alias("heavy"),
        (F.col("user_id") % 7 / 7.0).alias("f_mix"),
        "converted",
    )
    ate = ipw_ate(obs, "heavy", ["f_mix"], "converted", 1).collect()[0]
    naive = "n/a" if ate.naive_diff is None else f"{ate.naive_diff:.3f}"
    ipw = "n/a" if ate.ate_ipw is None else f"{ate.ate_ipw:.3f}"
    print(f"ipw: naive {naive} vs reweighted {ipw}")

    ev_units = units.select(
        F.least(F.floor(F.col("pre") / 100.0).cast("bigint"), F.lit(1000))
        .alias("score_m"),
        F.col("converted").alias("y"),
    )
    auc = roc_auc(ev_units, "score_m", "y").collect()[0]
    print(f"conversion-score AUC: {auc.auc:.3f}")
    cal = calibration_report(ev_units, "score_m", "y").collect()
    print("brier:", round(sum(r.brier_contrib for r in cal), 4))

    # production callers fetch secret_salt from a KMS secret — a salt
    # committed to source (like this demo constant) gives NO privacy
    for r in dp_release(
        units.select("arm"), ["arm"], epsilon=1.0,
        secret_salt="demo-only-8f2c41a97b3e5d60",
    ).orderBy("arm").collect():
        print(f"  dp arm count (eps=1): {r.released:.2f}")


if __name__ == "__main__":
    main(*sys.argv[1:])
