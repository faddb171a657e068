"""Vector math on array columns — pure JVM expressions (no Python UDFs).

``F.zip_with`` + ``F.aggregate`` keep the arithmetic inside whole-stage
codegen; float inputs are widened to double before accumulating
(left-to-right fold, matching DuckDB's sequential accumulation so the
driver's oracle compare is bit-stable).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _as_double(arr: Column | str) -> Column:
    c = F.col(arr) if isinstance(arr, str) else arr
    return c.cast("array<double>")


def dot(a: Column | str, b: Column | str) -> Column:
    """Dot product of two numeric array columns (double accumulation)."""
    prods = F.zip_with(_as_double(a), _as_double(b), lambda x, y: x * y)
    return F.aggregate(prods, F.lit(0.0), lambda acc, x: acc + x)


def norm2(a: Column | str) -> Column:
    """Squared L2 norm."""
    return dot(a, a)


def cosine_similarity(a: Column | str, b: Column | str) -> Column:
    """Cosine similarity, computed as dot / sqrt(|a|^2 * |b|^2) — the same
    formula DuckDB's list_cosine_similarity uses. Null on zero vectors
    (nullif guard keeps ANSI mode from raising divide-by-zero)."""
    denom = F.sqrt(norm2(a) * norm2(b))
    return dot(a, b) / F.nullif(denom, F.lit(0.0))
