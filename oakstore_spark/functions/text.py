"""Text-analysis scalar functions — all built-in pyspark.sql.functions
(JVM-side, codegen'd; no Python in the hot path).

Used by the LLM-data-pipeline operators (token counting, quality
scoring, fingerprinting, shingling for MinHash). Every function here has
a DuckDB-expressible equivalent so operators built on them can be
oracle-checked.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def tokens(col: Column | str) -> Column:
    """Whitespace tokenization. Empty/blank text -> empty array."""
    c = F.trim(_c(col))
    return F.when(F.length(c) == 0, F.array().cast("array<string>")).otherwise(
        F.split(c, r"\s+")
    )


def token_count(col: Column | str) -> Column:
    """Number of whitespace tokens (bigint)."""
    return F.size(tokens(col)).cast("bigint")


def normalize_text(col: Column | str) -> Column:
    """Canonical form for dedup: lowercase, strip non-alphanumerics,
    collapse whitespace."""
    c = F.lower(_c(col))
    c = F.regexp_replace(c, r"[^a-z0-9\s]", "")
    c = F.regexp_replace(c, r"\s+", " ")
    return F.trim(c)


def char_ngrams(col: Column | str, n: int, distinct: bool = True) -> Column:
    """Character n-gram shingles of a string (JVM-side: sequence +
    transform + substring; no exploding)."""
    c = _c(col)
    grams = F.transform(
        F.sequence(F.lit(1), F.greatest(F.length(c) - F.lit(n - 1), F.lit(1))),
        lambda i: F.substring(c, i, n),
    )
    return F.array_distinct(grams) if distinct else grams


def fingerprint_md5(col: Column | str) -> Column:
    """Deterministic content fingerprint: md5 hex of the normalized text
    (md5 is engine-portable — same string in Spark and DuckDB)."""
    return F.md5(normalize_text(col))
