"""Weak supervision for training-data labeling (Ratner et al.,
Snorkel, VLDB 2018 — public): apply a set of LABELING FUNCTIONS
(heuristic rules that emit a label or abstain) to every row, combine
them by majority vote with deterministic tie-breaking, and expose the
coverage/overlap/conflict diagnostics that tell you whether the rule
set is healthy before you train on its output.

Everything is a map-side projection over an array of vote columns
(HOFs, whole-stage codegen, no shuffle except the diagnostics
aggregate) — labeling a 100 TB corpus costs one scan.

Reference parity: the reference (store.py:1-267) has no labeling
surface; EXT operator mandated by the LLM-pipeline brief.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def apply_label_functions(
    df: DataFrame,
    lfs: dict[str, Column],
    id_col: str = "doc_id",
) -> DataFrame:
    """Evaluate every labeling function (a Column expression yielding
    an integer label, or NULL to abstain) and attach:

    - ``lf_votes`` — the raw per-LF vote array (abstains kept as
      nulls, order = dict order, for downstream label models);
    - ``vote`` — majority label over the non-abstaining LFs, ties
      broken toward the SMALLEST label (deterministic), null when all
      abstain;
    - ``n_votes`` — how many LFs voted;
    - ``n_distinct`` — distinct labels among the votes;
    - ``conflict`` — more than one distinct label voted.
    """
    votes = F.array(*[v.cast("int").alias(k) for k, v in lfs.items()])
    cast_votes = F.filter(votes, lambda v: v.isNotNull())
    # argmax by (count, -label): array_max on the struct is
    # lexicographic, so equal counts resolve to the larger -label,
    # i.e. the smallest label — a pinned deterministic tie-break
    counted = F.transform(
        F.array_distinct(cast_votes),
        lambda l: F.struct(
            F.size(F.filter(cast_votes, lambda v: v == l)).alias("n"),
            (-l).alias("neg_label"),
        ),
    )
    best = F.array_max(counted)
    n_votes = F.size(cast_votes)
    return df.select(
        "*",
        votes.alias("lf_votes"),
        F.when(n_votes > 0, -best["neg_label"]).alias("vote"),
        n_votes.alias("n_votes"),
        F.size(F.array_distinct(cast_votes)).alias("n_distinct"),
        (F.size(F.array_distinct(cast_votes)) > 1).alias("conflict"),
    )


def label_function_diagnostics(labeled: DataFrame) -> DataFrame:
    """Per-LF health metrics over the output of
    :func:`apply_label_functions`: coverage (fraction of rows where
    the LF voted), overlap (voted AND at least one other LF voted),
    conflict (voted AND some other LF voted a DIFFERENT label). One
    aggregation; rates are single IEEE divisions of exact counts."""
    rows = labeled.select(
        F.posexplode("lf_votes").alias("lf_idx", "lf_vote"),
        F.col("n_votes"),
        F.col("n_distinct"),
        F.col("vote"),
    )
    # total rows as a broadcast 1-row aggregate — no driver action
    total_df = F.broadcast(
        labeled.agg(F.count(F.lit(1)).alias("_total"))
    )
    total = F.col("_total")
    agg = rows.groupBy("lf_idx").agg(
        F.count(F.when(F.col("lf_vote").isNotNull(), 1)).alias("n_voted"),
        F.count(
            F.when(
                F.col("lf_vote").isNotNull() & (F.col("n_votes") > 1), 1
            )
        ).alias("n_overlap"),
        F.count(
            F.when(
                F.col("lf_vote").isNotNull() & (F.col("n_distinct") > 1), 1
            )
        ).alias("n_conflict"),
    )
    return agg.crossJoin(total_df).select(
        "lf_idx",
        "n_voted",
        "n_overlap",
        "n_conflict",
        (F.col("n_voted").cast("double") / total).alias("coverage"),
        (F.col("n_overlap").cast("double") / total).alias("overlap"),
        (F.col("n_conflict").cast("double") / total).alias("conflict_rate"),
    )
