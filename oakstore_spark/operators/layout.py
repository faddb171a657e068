"""Physical-layout operators: z-order clustering and file-level
data-skipping — the lakehouse techniques (Delta OPTIMIZE ZORDER BY /
Iceberg sort orders / parquet min-max skipping, all public designs)
that make selective scans cheap at 100 TB. Spark prunes partitions for
you; WITHIN a partition, which files a filter touches is decided by
how rows were clustered at write time. Z-ordering interleaves the bit
representations of several columns so rows close in ANY of them land
in the same files, giving every indexed column locality
simultaneously; the companion file-stats relation turns that locality
into file skipping.

Everything here is JVM expressions + ordinary writes — no Python in
the data path.

Reference parity: the reference (store.py:1-267) sorts solely by its
datetime index at write; multi-column clustering is EXT per the brief.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

__all__ = [
    "zorder_key",
    "write_zordered",
    "file_stats",
    "pruned_files",
    "read_pruned",
    "bloom_file_stats",
    "bloom_pruned_files",
    "read_bloom_pruned",
]


def zorder_key(
    df: DataFrame, cols: list[str], bits: int = 10
) -> tuple[DataFrame, Column]:
    """(df + ``_z``, the ``_z`` column): each column is min-max
    normalized to a ``bits``-bit integer grade (one tiny broadcast agg
    row supplies the bounds) and the grades' bits INTERLEAVE —
    column 0's bit i lands at position ``i*len(cols)+(len(cols)-1)``,
    so equal prefixes of the z-key bound every indexed column at once.
    Normalization is monotone per column, which is all z-ordering
    needs; non-numeric/timestamp columns must be cast by the caller
    (timestamps: ``unix_micros``)."""
    n = len(cols)
    if not 1 <= n <= 6:
        raise ValueError("zorder_key supports 1..6 columns")
    if bits * n > 62:
        raise ValueError("bits * len(cols) must fit a signed long")
    aggs = []
    for c in cols:
        aggs.append(F.min(c).cast("double").alias(f"_mn_{c}"))
        aggs.append(F.max(c).cast("double").alias(f"_mx_{c}"))
    bounds = df.agg(*aggs)
    joined = df.crossJoin(F.broadcast(bounds))
    top = (1 << bits) - 1
    z = F.lit(0).cast("long")
    for ci, c in enumerate(cols):
        mn, mx = F.col(f"_mn_{c}"), F.col(f"_mx_{c}")
        span = F.when(mx > mn, mx - mn).otherwise(F.lit(1.0))
        grade = F.least(
            F.floor((F.col(c).cast("double") - mn) / span * (top + 1)),
            F.lit(top),
        ).cast("long")
        for i in range(bits):
            bit = F.shiftright(grade, i).bitwiseAND(F.lit(1))
            z = z + F.shiftleft(bit, i * n + (n - 1 - ci))
    out = joined.withColumn("_z", z).drop(
        *[f"_mn_{c}" for c in cols], *[f"_mx_{c}" for c in cols]
    )
    return out, F.col("_z")


def write_zordered(
    df: DataFrame,
    path: str,
    cols: list[str],
    n_files: int = 32,
    bits: int = 10,
) -> None:
    """Write ``df`` as ``n_files`` parquet files clustered by the
    z-order of ``cols``: range-repartition on the z-key (contiguous
    key ranges per file — the property file skipping needs), sort
    within each file, drop the key. One extra shuffle at write time
    buys every later selective scan a file subset instead of the full
    relation."""
    keyed, z = zorder_key(df, cols, bits)
    (
        keyed.repartitionByRange(n_files, z)
        .sortWithinPartitions(z)
        .drop("_z")
        .write.mode("overwrite")
        .parquet(path)
    )


def file_stats(
    spark: SparkSession, path: str, cols: list[str]
) -> DataFrame:
    """Per-FILE min/max of ``cols`` — the data-skipping index relation
    (what Delta/Iceberg keep in their manifests, built here with one
    aggregate over ``input_file_name()``). Tiny by construction: one
    row per file. Persist it next to the table and refresh on write."""
    d = spark.read.parquet(path).withColumn(
        "_file", F.input_file_name()
    )
    aggs = []
    for c in cols:
        aggs.append(F.min(c).alias(f"min_{c}"))
        aggs.append(F.max(c).alias(f"max_{c}"))
    return d.groupBy("_file").agg(*aggs)


def pruned_files(
    stats: DataFrame, col: str, lo, hi
) -> list[str]:
    """Files whose [min, max] range for ``col`` intersects [lo, hi] —
    the skip decision, exact for any clustering (a file whose range
    misses the predicate provably holds no matching row)."""
    return [
        r["_file"]
        for r in stats.where(
            (F.col(f"max_{col}") >= F.lit(lo))
            & (F.col(f"min_{col}") <= F.lit(hi))
        )
        .select("_file")
        .collect()
    ]


def read_pruned(
    spark: SparkSession,
    stats: DataFrame,
    col: str,
    lo,
    hi,
) -> DataFrame:
    """Range-filtered read that LOADS only the surviving files (the
    listing-time skip, composed with the ordinary parquet row-group
    pruning inside each file). Returns the filtered rows — identical
    to filtering the full table, cheaper by the skipped files."""
    files = pruned_files(stats, col, lo, hi)
    if not files:
        any_row = stats.select("_file").first()
        if any_row is None:
            raise ValueError("file_stats relation is empty")
        return (
            spark.read.parquet(any_row["_file"]).where(F.lit(False))
        )
    return (
        spark.read.parquet(*files)
        .where((F.col(col) >= F.lit(lo)) & (F.col(col) <= F.lit(hi)))
    )


def bloom_file_stats(
    spark: SparkSession,
    path: str,
    col: str,
    m_bits: int = 1024,
    k_hashes: int = 4,
) -> DataFrame:
    """Per-file BLOOM filter index over ``col`` — the equality-predicate
    companion of the min/max :func:`file_stats` (Delta/Iceberg keep
    exactly this pair in their manifests; Parquet's own bloom filters
    are the in-file analog): min/max skipping is blind to point
    lookups on high-cardinality unclustered columns (every file's
    range covers the probe), while a bloom bitset skips every file
    that provably lacks the value — false POSITIVES only, so the
    downstream exact filter keeps results identical and skipping is
    never wrong.

    Layout: each file's filter is ``m_bits`` bits as ``m_bits/64``
    BIGINT words -> the relation is (file, word_idx, word), tiny by
    construction (files x m/64 rows).  Bits come from ``k_hashes``
    seeded ``xxhash64(col, seed)`` positions — JVM-hashed, no Python
    in the build path; the per-row k-position explode collapses via
    one bit_or aggregate (map-side combinable).
    """
    if m_bits % 64:
        raise ValueError("m_bits must be a multiple of 64")
    d = spark.read.parquet(path).withColumn("_file", F.input_file_name())
    # hash the STRING form: xxhash64 is type-sensitive (int vs bigint
    # literals hash differently), and the probe side builds from a
    # Python literal — the string canonicalization keeps both sides on
    # one hash domain for any key type
    pos = F.array(
        *[
            F.pmod(
                F.xxhash64(F.col(col).cast("string"), F.lit(i)),
                F.lit(m_bits),
            )
            for i in range(k_hashes)
        ]
    )
    exploded = d.select("_file", F.explode(pos).alias("_pos")).select(
        "_file",
        (F.col("_pos") / 64).cast("long").alias("word_idx"),
        # pyspark's shiftleft() only takes a literal shift count; the
        # SQL form accepts a column
        F.expr("shiftleft(1L, CAST(_pos % 64 AS INT))").alias("_wbit"),
    )
    return exploded.groupBy("_file", "word_idx").agg(
        F.bit_or("_wbit").alias("word")
    )


def bloom_pruned_files(
    stats: DataFrame, value, m_bits: int = 1024, k_hashes: int = 4
) -> list[str]:
    """Files whose bloom filter has ALL k probe bits set (possible
    containment).  The probe positions are computed through the SAME
    JVM xxhash64 expressions used at build time (a 1-row DataFrame —
    re-implementing the hash driver-side would silently fork the two
    sides).  Missing words count as unset bits."""
    spark = stats.sparkSession
    probe = spark.range(1).select(
        *[
            F.pmod(
                F.xxhash64(F.lit(value).cast("string"), F.lit(i)),
                F.lit(m_bits),
            ).alias(f"p{i}")
            for i in range(k_hashes)
        ]
    ).collect()[0]
    positions = [int(probe[f"p{i}"]) for i in range(k_hashes)]
    need: dict[int, int] = {}
    for p in positions:
        need[p // 64] = need.get(p // 64, 0) | (1 << (p % 64))
    rows = stats.where(
        F.col("word_idx").isin(*[int(w) for w in need])
    ).collect()
    have: dict[str, dict[int, int]] = {}
    for r in rows:
        have.setdefault(r["_file"], {})[int(r["word_idx"])] = int(r["word"])
    all_files = [r["_file"] for r in stats.select("_file").distinct().collect()]
    out = []
    for f in all_files:
        words = have.get(f, {})
        if all(
            (words.get(w, 0) & mask) == mask for w, mask in need.items()
        ):
            out.append(f)
    return out


def read_bloom_pruned(
    spark: SparkSession,
    stats: DataFrame,
    col: str,
    value,
    m_bits: int = 1024,
    k_hashes: int = 4,
) -> DataFrame:
    """Point-lookup read through the bloom index: load only files that
    MIGHT contain ``value``, then apply the exact equality filter —
    identical rows to filtering the full table, minus the skipped
    files (bloom false positives cost a read, never a wrong row)."""
    files = bloom_pruned_files(stats, value, m_bits, k_hashes)
    if not files:
        any_row = stats.select("_file").first()
        if any_row is None:
            raise ValueError("bloom stats relation is empty")
        return spark.read.parquet(any_row["_file"]).where(F.lit(False))
    return spark.read.parquet(*files).where(F.col(col) == F.lit(value))
