"""Dataset contract validation — the expectations/constraints rung
every production pipeline runs before publishing a table (the shape of
dbt tests / Great Expectations / Delta CHECK constraints, all public
designs): declare row-level predicates once, get per-rule violation
counts, rates, and bounded samples back.

Spark shape: each rule compiles to a boolean column; counts for the
whole rule set evaluate in a SINGLE scan (one aggregate of conditional
counts — map-side combine, no per-rule jobs). Violation EXAMPLES, when
requested, take one more pass as a rank-limited window per rule
(row_number <= k — Spark's WindowGroupLimit keeps per-partition state
at k, so a 100%-violating rule on 100 TB still collects k ids, never
the violation set).

Reference parity: the reference (store.py:1-267) validates only its
schema/key contracts; row-level expectations are EXT per the brief.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["validate_expectations", "enforce_expectations", "psi_drift"]


def validate_expectations(
    df: DataFrame,
    rules: dict[str, Column | str],
    id_col: str | None = None,
    max_examples: int = 3,
) -> DataFrame:
    """Evaluate every rule (name -> boolean Column or SQL string that
    must hold for each row): returns one row per rule with
    ``(rule, n_rows, n_violations, violation_rate, passed,
    example_ids)``. ``example_ids`` are the ``max_examples`` SMALLEST
    ``id_col`` values among violators (deterministic — not "first
    seen"), as strings; pass ``id_col=None`` to skip examples and the
    second pass entirely.

    A NULL predicate result counts as a violation (unknown is not
    compliance — the stance SQL CHECK constraints take)."""
    if not rules:
        raise ValueError("rules must be non-empty")
    compiled = {
        name: (F.expr(rule) if isinstance(rule, str) else rule)
        for name, rule in rules.items()
    }
    names = list(compiled)
    bads = {
        name: ~F.coalesce(pred, F.lit(False))
        for name, pred in compiled.items()
    }
    aggs = [F.count(F.lit(1)).alias("_n")]
    for i, name in enumerate(names):
        aggs.append(F.sum(bads[name].cast("long")).alias(f"_v_{i}"))
    row = df.agg(*aggs)
    out_rows = []
    for i, name in enumerate(names):
        out_rows.append(
            row.select(
                F.lit(name).alias("rule"),
                F.col("_n").cast("long").alias("n_rows"),
                F.col(f"_v_{i}").cast("long").alias("n_violations"),
                (F.col(f"_v_{i}") / F.greatest(F.col("_n"), F.lit(1)))
                .cast("double")
                .alias("violation_rate"),
                (F.col(f"_v_{i}") == 0).alias("passed"),
            )
        )
    report = out_rows[0]
    for o in out_rows[1:]:
        report = report.unionByName(o)
    if id_col is None:
        return report.withColumn(
            "example_ids", F.lit(None).cast("array<string>")
        )

    # second pass: per-rule k smallest violator ids via a rank-limited
    # window (WindowGroupLimit bounds state at k per partition)
    tagged = df.select(
        F.col(id_col).alias("_vid"),
        F.explode(
            F.filter(
                F.array(
                    *[
                        F.when(bads[name], F.lit(name))
                        for name in names
                    ]
                ),
                lambda x: x.isNotNull(),
            )
        ).alias("rule"),
    )
    w = Window.partitionBy("rule").orderBy("_vid")
    examples = (
        tagged.withColumn("_rk", F.row_number().over(w))
        .where(F.col("_rk") <= max_examples)
        .groupBy("rule")
        .agg(
            F.array_sort(
                F.collect_list(F.col("_vid").cast("string"))
            ).alias("example_ids")
        )
    )
    return report.join(examples, "rule", "left").select(
        "rule",
        "n_rows",
        "n_violations",
        "violation_rate",
        "passed",
        F.coalesce(
            "example_ids", F.array().cast("array<string>")
        ).alias("example_ids"),
    )


def enforce_expectations(
    df: DataFrame,
    rules: dict[str, Column | str],
    id_col: str | None = None,
) -> DataFrame:
    """Gate a pipeline stage on its contract: returns ``df`` unchanged
    when every rule passes, raises ``ValueError`` naming the failing
    rules (with counts and example ids) otherwise — the write-path
    guard form of :func:`validate_expectations`."""
    report = validate_expectations(df, rules, id_col=id_col).collect()
    failed = [r for r in report if not r["passed"]]
    if failed:
        detail = "; ".join(
            f"{r['rule']}: {r['n_violations']}/{r['n_rows']} rows"
            + (
                f" (e.g. {list(r['example_ids'])})"
                if r["example_ids"]
                else ""
            )
            for r in failed
        )
        raise ValueError(f"expectations failed — {detail}")
    return df


def psi_drift(
    baseline: DataFrame,
    current: DataFrame,
    value_col: str,
    n_bins: int = 10,
) -> DataFrame:
    """Population Stability Index between two dataset snapshots — the
    standard drift monitor every production feature/score pipeline
    runs between a baseline window and the current one (PSI < 0.1
    stable, 0.1-0.25 moderate shift, > 0.25 action; the banking-
    scorecard heuristic, public).

    Bin edges are FIXED BY THE BASELINE (min/max from one aggregate —
    the convention that makes PSI comparable across runs); the current
    snapshot clamps into the same bins, so population moving outside
    the baseline range lands in the edge bins and registers as drift.
    Shares are add-half smoothed as exact integer ratios,
    ``(2c + 1) / (2n + n_bins)``, so empty bins stay finite and every
    float is engine-replayable (one division, one ln, one multiply —
    identical association in SQL).

    Returns one row per bin: (bin, n_base, n_cur, share_base,
    share_cur, psi_contrib); ``sum(psi_contrib)`` is the PSI. Spark
    shape: one min/max aggregate on the baseline, then ONE hash
    aggregate per snapshot into ``n_bins`` bins (map-side combinable)
    and an n_bins-row join — no corpus sort, no window over rows.

    NULL values carry no bin and are excluded from both counts."""
    if n_bins < 2:
        raise ValueError("n_bins must be >= 2")
    b = baseline.where(F.col(value_col).isNotNull())
    c = current.where(F.col(value_col).isNotNull())
    mm = b.agg(
        F.min(value_col).alias("lo"), F.max(value_col).alias("hi")
    ).collect()[0]
    if mm["lo"] is None:
        raise ValueError("baseline has no non-null values")
    lo = float(mm["lo"])
    width = (float(mm["hi"]) - lo) / n_bins
    if not width:
        width = 1.0

    def binned(df: DataFrame) -> dict[int, int]:
        # ONE pass per snapshot; the <= n_bins-row result is collected
        # so the totals derive by integer summation driver-side — no
        # separate count() scan, and the bins join as a local relation
        # instead of re-running the aggregate (the deseasonalize
        # collected-profile pattern; woe_iv's fused shape)
        bin_id = F.greatest(
            F.least(
                F.floor((F.col(value_col) - F.lit(lo)) / F.lit(width)),
                F.lit(n_bins - 1),
            ),
            F.lit(0),
        ).cast("long")
        rows = (
            df.groupBy(bin_id.alias("bin"))
            .agg(F.count(F.lit(1)).cast("long").alias("n"))
            .collect()
        )
        return {int(r["bin"]): int(r["n"]) for r in rows}

    bmap = binned(b)
    cmap = binned(c)
    nb = sum(bmap.values())
    nc = sum(cmap.values())
    joined = b.sparkSession.createDataFrame(
        [
            (i, bmap.get(i, 0), cmap.get(i, 0))
            for i in range(n_bins)
        ],
        "bin long, n_base long, n_cur long",
    )
    return psi_from_counts(joined, nb, nc, n_bins)


def psi_from_counts(
    joined: DataFrame, n_base_total: int, n_cur_total: int, n_bins: int
) -> DataFrame:
    """The PSI share/contribution float tree over a prepared
    ``(bin, n_base, n_cur)`` relation — factored out so the STREAMING
    monitor (``streaming/drift.py``) serves bit-identical values from
    its incrementally-maintained counts."""
    share_b = (F.col("n_base") * 2 + 1) / F.lit(2 * n_base_total + n_bins)
    share_c = (F.col("n_cur") * 2 + 1) / F.lit(2 * n_cur_total + n_bins)
    return joined.select(
        "bin",
        "n_base",
        "n_cur",
        share_b.cast("double").alias("share_base"),
        share_c.cast("double").alias("share_cur"),
        ((share_b - share_c) * F.log(share_b / share_c))
        .cast("double")
        .alias("psi_contrib"),
    )


def woe_iv(
    df: DataFrame,
    feature_col: str,
    target_col: str,
    n_bins: int = 10,
) -> DataFrame:
    """Weight-of-evidence / information-value feature screening — the
    credit-scorecard standard (Siddiqi) for ranking a continuous
    feature's separating power against a binary target before model
    fitting (IV < 0.02 useless, 0.1-0.3 medium, > 0.5 suspicious):

        woe_i = ln(share_good_i / share_bad_i)
        iv_contrib_i = (share_good_i - share_bad_i) * woe_i

    IV is exactly the PSI between the good and bad populations'
    feature distributions, and this implementation shares
    :func:`psi_drift`'s machinery: equal-width bins fixed by one
    global min/max aggregate, add-half integer-ratio smoothing
    ``(2c+1)/(2n+n_bins)`` keeping empty bins finite and every float a
    single division/ln/multiply chain.  One hash aggregate bins BOTH
    classes at once (conditional counts — the corpus is touched once);
    ``sum(iv_contrib)`` over the returned n_bins rows is the IV.

    ``target_col`` must be 0/1 integers (1 = "bad"/event).  NULL
    features are excluded.
    """
    if n_bins < 2:
        raise ValueError("n_bins must be >= 2")
    d = df.where(F.col(feature_col).isNotNull())
    mm = d.agg(
        F.min(feature_col).alias("lo"),
        F.max(feature_col).alias("hi"),
        F.sum(F.col(target_col).cast("bigint")).alias("n_bad"),
        F.count(F.lit(1)).alias("n"),
    ).collect()[0]
    if mm["lo"] is None:
        raise ValueError("no non-null feature values")
    lo = float(mm["lo"])
    width = (float(mm["hi"]) - lo) / n_bins
    if not width:
        width = 1.0
    n_bad_tot = int(mm["n_bad"])
    n_good_tot = int(mm["n"]) - n_bad_tot

    bin_id = F.greatest(
        F.least(
            F.floor((F.col(feature_col) - F.lit(lo)) / F.lit(width)),
            F.lit(n_bins - 1),
        ),
        F.lit(0),
    ).cast("long")
    t = F.col(target_col).cast("bigint")
    counts = d.groupBy(bin_id.alias("bin")).agg(
        F.sum(F.lit(1) - t).alias("n_good"),
        F.sum(t).alias("n_bad"),
    )
    grid = d.sparkSession.range(n_bins).select(F.col("id").alias("bin"))
    joined = grid.join(counts, "bin", "left").select(
        "bin",
        F.coalesce("n_good", F.lit(0)).cast("long").alias("n_good"),
        F.coalesce("n_bad", F.lit(0)).cast("long").alias("n_bad"),
    )
    sg = (F.col("n_good") * 2 + 1) / F.lit(2 * n_good_tot + n_bins)
    sb = (F.col("n_bad") * 2 + 1) / F.lit(2 * n_bad_tot + n_bins)
    return joined.select(
        "bin",
        "n_good",
        "n_bad",
        sg.cast("double").alias("share_good"),
        sb.cast("double").alias("share_bad"),
        F.log(sg / sb).cast("double").alias("woe"),
        ((sg - sb) * F.log(sg / sb)).cast("double").alias("iv_contrib"),
    )
