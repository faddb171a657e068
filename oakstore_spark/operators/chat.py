"""Conversation (chat-turn) operators for instruction-tuning data
prep: flatten role-tagged turn arrays into training text, validate
turn structure, and compute the per-conversation stats a curation
pipeline filters on (turn counts, role balance, alternation, the
assistant share that drives loss masking).

Data model: a conversation is a column of ``array<struct<role:string,
content:string>>`` — the shape chat datasets land in after JSON
ingest (``from_json`` upstream). All operators are array higher-order
functions over that column: map-side, whole-stage codegen, no shuffle,
no Python — the shape that survives a 100 TB instruction corpus.

Reference parity: the reference (store.py:1-267) has no text surface;
EXT operators mandated by the LLM-pipeline brief.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _turns(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def flatten_conversation(
    col: Column | str, sep: str = "\n"
) -> Column:
    """Render a turn array as training text: each turn becomes
    ``<|role|>content``, joined by ``sep`` — the minimal chat template
    (swap the wrapper strings for a model-specific one at call site).
    Null turn arrays yield null."""
    return F.array_join(
        F.transform(
            _turns(col),
            lambda t: F.concat(
                F.lit("<|"), t["role"], F.lit("|>"), t["content"]
            ),
        ),
        sep,
    )


def conversation_stats(
    df: DataFrame, turns_col: str = "turns", id_col: str = "doc_id"
) -> DataFrame:
    """Per-conversation structural signals:

    - ``n_turns``, ``n_user``, ``n_assistant`` — turn counts;
    - ``starts_with_user`` — first role is ``user`` (or ``system``);
    - ``alternating`` — no two CONSECUTIVE turns share a role (the
      violation instruction-data filters reject);
    - ``assistant_chars`` / ``total_chars`` — integer char masses, and
      ``assistant_share`` as their single IEEE division (the loss-mask
      weight); zero-char conversations yield a null share.

    Everything is one projection over the array; empty arrays degrade
    to zeros/true rather than erroring."""
    t = _turns(turns_col)
    n = F.size(t)
    role_count = lambda r: F.size(  # noqa: E731
        F.filter(t, lambda x: x["role"] == r)
    )
    chars = lambda arr: F.aggregate(  # noqa: E731
        arr, F.lit(0).cast("long"),
        lambda acc, x: acc + F.coalesce(F.length(x["content"]), F.lit(0)),
    )
    alternating = F.when(n <= 1, F.lit(True)).otherwise(
        F.forall(
            F.transform(
                F.sequence(F.lit(2), n),
                lambda i: F.element_at(t, i)["role"]
                != F.element_at(t, i - 1)["role"],
            ),
            lambda ok: ok,
        )
    )
    assistant_chars = chars(F.filter(t, lambda x: x["role"] == "assistant"))
    total_chars = chars(t)
    return df.select(
        F.col(id_col),
        n.alias("n_turns"),
        role_count("user").alias("n_user"),
        role_count("assistant").alias("n_assistant"),
        F.try_element_at(t, F.lit(1))["role"].isin("user", "system")
        .alias("starts_with_user"),
        alternating.alias("alternating"),
        assistant_chars.alias("assistant_chars"),
        total_chars.alias("total_chars"),
        F.when(
            total_chars > 0,
            assistant_chars.cast("double") / total_chars,
        ).alias("assistant_share"),
    )


def preference_pairs(
    df: DataFrame,
    prompt_col: str = "prompt_id",
    resp_id_col: str = "resp_id",
    score_col: str = "score",
    keep_ties: bool = False,
) -> DataFrame:
    """Build DPO/RLHF preference pairs from scored responses: per
    prompt, elect the CHOSEN response (highest score, ties to the
    smallest id) and the REJECTED response (lowest score, ties to the
    smallest id), emitting ids, scores, the margin, and the group size.
    Prompts with a single response are dropped; zero-margin groups
    (all scores equal) are dropped unless ``keep_ties``.

    Spark shape: ONE hash aggregate over the response relation —
    ``max_by``/``min_by`` with struct ordering keys carry the pinned
    tie-breaks through partial aggregation, so the 100 TB cost is a
    single shuffle on the prompt key with map-side combine (no window,
    no per-prompt sort). Deterministic: the same relation always
    elects the same pair. Response ids may be ANY orderable type
    (strings included — the ordering struct negates the numeric SCORE,
    never the id); scores must be numeric.

    ``keep_ties`` never emits a degenerate self-pair: a zero-margin
    group (all scores equal) elects the smallest id as chosen and the
    SECOND-smallest as rejected, re-elected by a second aggregate over
    just the tied groups."""
    score = F.col(score_col)
    rid = F.col(resp_id_col)
    # min over (-score, id): maximizes score, ties to the smallest id —
    # works for string ids (only the numeric score is negated)
    chosen = F.min_by(rid, F.struct((-score).alias("s"), rid.alias("t")))
    g = df.groupBy(prompt_col).agg(
        F.count(F.lit(1)).alias("n_responses"),
        chosen.alias("chosen_id"),
        F.max(score).alias("chosen_score"),
        F.min_by(rid, F.struct(score.alias("s"), rid.alias("t")))
        .alias("rejected_id"),
        F.min(score).alias("rejected_score"),
        F.min(rid).alias("_id_min"),
    )
    out = g.where(F.col("n_responses") >= 2).select(
        F.col(prompt_col),
        "n_responses",
        "chosen_id",
        "chosen_score",
        "rejected_id",
        "rejected_score",
        (F.col("chosen_score") - F.col("rejected_score")).alias("margin"),
        "_id_min",
    )
    if not keep_ties:
        return out.where(F.col("margin") > 0).drop("_id_min")
    # keep_ties: a fully-tied group elects chosen == rejected == the
    # smallest id. Re-elect the rejected side of JUST those groups
    # (expected to be a small fraction) as the second-smallest id — a
    # semi-joined second aggregate, so the main path stays one shuffle.
    tied = out.where(
        (F.col("margin") == 0) & (F.col("chosen_id") == F.col("rejected_id"))
    )
    clean = out.where(
        ~((F.col("margin") == 0) & (F.col("chosen_id") == F.col("rejected_id")))
    ).drop("_id_min")
    second = (
        df.join(
            tied.select(F.col(prompt_col), F.col("_id_min")), prompt_col
        )
        .where(rid != F.col("_id_min"))
        .groupBy(prompt_col)
        .agg(F.min(rid).alias("_id_second"))
    )
    fixed = (
        tied.drop("_id_min")
        .join(second, prompt_col)
        .select(
            F.col(prompt_col),
            "n_responses",
            "chosen_id",
            "chosen_score",
            F.col("_id_second").alias("rejected_id"),
            "rejected_score",
            "margin",
        )
    )
    return clean.unionByName(fixed)
