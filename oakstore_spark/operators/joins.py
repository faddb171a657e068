"""Skew-aware join helpers.

AQE's skew-join splitting (on in session.py) handles most skew at
runtime by splitting oversized shuffle partitions. ``salted_join`` is
the explicit fallback for the cases AQE can't fix — e.g. one key so hot
that even a split partition's build side won't fit, or a non-AQE
engine path. Salting changes the DISTRIBUTION, never the result: the
left side scatters each row to one of ``n_salts`` sub-keys, the right
side replicates each row to all of them, so every original match pair
still meets exactly once.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_SALT = "_oak_salt"


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    n_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join on ``on`` with an added salt key: left rows get a
    uniform salt in [0, n_salts), right rows are exploded n_salts times.
    A hot key's rows thus spread over n_salts shuffle partitions instead
    of one. Cost: the right side shuffles n_salts times its size — use
    with left = the big/skewed fact side, right = the smaller side.

    Supports inner and left joins (the semantics where per-row
    replication composes safely with the salt scatter).
    """
    if how not in ("inner", "left", "left_outer"):
        raise ValueError(f"salted_join does not support how={how!r}")
    # salt from a hash of the join key + a per-row uniform component:
    # rand() is fine because the salt value never affects the RESULT,
    # only which of the n replicas a row meets its matches on
    salted_left = left.withColumn(_SALT, (F.rand(seed=42) * n_salts).cast("int"))
    salted_right = right.withColumn(
        _SALT, F.explode(F.array(*[F.lit(i) for i in range(n_salts)]))
    )
    return salted_left.join(salted_right, [*on, _SALT], how).drop(_SALT)


def bloom_prefiltered_join(
    big: DataFrame,
    small: DataFrame,
    key: str,
    n_buckets: int = 1 << 20,
    how: str = "inner",
) -> DataFrame:
    """Bloom-style semi-reduction before a join: hash the SMALL side's
    keys into ``n_buckets`` buckets, broadcast the DISTINCT occupied
    buckets, and semi-join the big side on its bucket BEFORE the real
    join — the manual form of the runtime bloom filter AQE injects, for
    the places automatic injection cannot reach (Python DataSources,
    already-exchanged inputs, predicates the optimizer declines).

    This is a single-hash bloom filter realized with DataFrame
    primitives (bit membership = broadcast-hash semi join on the bucket
    id): no false negatives ever, false-positive rate ~ |small|/
    n_buckets, broadcast payload = one long per occupied bucket.
    For inner/semi joins the pre-filter only removes rows the join
    would drop anyway, so the result EQUALS the plain join (fully
    oracle-checkable) while the big-side shuffle carries only matching
    + false-positive rows. Outer/anti joins must KEEP non-matching
    big-side rows, so the semi pre-reduction is unsound there —
    rejected with ValueError rather than silently dropping rows.
    """
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    if how not in ("inner", "semi", "leftsemi", "left_semi"):
        raise ValueError(
            "bloom_prefiltered_join is only sound for inner/semi joins "
            f"(the pre-filter drops big-side rows how={how!r} must keep)"
        )
    # xxhash64 is type-sensitive: hashing int 5 and bigint 5 gives
    # different buckets even though the equi-join would coerce and match
    # them. Hash one common type on both sides.
    bt, st = big.schema[key].dataType, small.schema[key].dataType
    if bt == st:
        hash_type = None
    elif isinstance(bt, T.IntegralType) and isinstance(st, T.IntegralType):
        hash_type = "bigint"
    elif isinstance(bt, T.NumericType) and isinstance(st, T.NumericType):
        # equal-after-join-coercion values cast equal on both sides;
        # double rounding can only MERGE buckets (adds false positives,
        # never false negatives)
        hash_type = "double"
    else:
        raise ValueError(
            f"key {key!r} has incompatible types on the two sides "
            f"({bt.simpleString()} vs {st.simpleString()}); cast before joining"
        )
    hkey = F.col(key).cast(hash_type) if hash_type else F.col(key)
    bpos = F.pmod(F.xxhash64(hkey), F.lit(n_buckets))
    occupied = small.select(bpos.alias("_bpos")).distinct()
    pre = (
        big.withColumn("_bpos", bpos)
        .join(F.broadcast(occupied), "_bpos", "leftsemi")
        .drop("_bpos")
    )
    return pre.join(small, key, how)
