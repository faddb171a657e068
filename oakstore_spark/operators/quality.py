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

__all__ = ["validate_expectations", "enforce_expectations"]


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
