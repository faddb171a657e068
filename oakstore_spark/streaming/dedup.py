"""Streaming near-duplicate ADMISSION: the end-to-end pipeline a
training-data ingest runs — every arriving micro-batch is checked
against the persisted signature index of everything admitted so far
(operators/dedup.py:incremental_minhash_pairs), survivors are appended
to the corpus AND their signatures to the index, duplicates are turned
away at the door. The old corpus is never re-signed; per-batch cost
tracks batch size.

Replay safety: foreachBatch can re-deliver a batch after a failure, so
every write lands in a ``batch=<id>`` subdirectory with overwrite mode
— a replayed batch overwrites its own previous output instead of
double-admitting (the same idempotence pattern as stream_append_to_store's
old-wins dedup)."""

from __future__ import annotations

from pathlib import Path

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _index_dirs_excluding(index_dir: str, batch_id: int) -> list[str]:
    """The signature index's committed batch dirs MINUS the one this
    batch id would itself (re)write — the index state an original
    delivery of the batch saw, which a replay must see again."""
    root = Path(index_dir)
    if not root.exists():
        return []
    return sorted(
        str(d)
        for d in root.glob("batch=*")
        if d.name != f"batch={batch_id}"
    )


def admission_rejects(
    batch_df: DataFrame,
    index: DataFrame,
    id_col: str,
    text_col: str,
    threshold: float,
    presigned: DataFrame | None = None,
) -> DataFrame:
    """The reject-id relation for one arriving micro-batch vs the
    persisted signature index: any batch doc near-dup of an index doc,
    plus the HIGHER-id side of every in-batch pair (keep-first-by-id).
    Stays a DataFrame end-to-end — no driver-side id sets — and is
    shared by :func:`dedup_admission_stream` and the full curation leg
    in ``streaming/curation.py``."""
    from oakstore_spark.operators.dedup import incremental_minhash_pairs

    pairs = incremental_minhash_pairs(
        batch_df, index, id_col, text_col, threshold=threshold,
        presigned=presigned,
    )
    #   vs_index pair  -> the batch-side doc must go; taking BOTH
    #     sides is safe because index ids never occur in the
    #     batch relation, so the anti-join ignores them.
    #   in-batch pair  -> id_a < id_b on both operator paths
    #     (distributed join keys on l.id < r.id; the driver fast
    #     path sorts rows by id before triu), so keep-first-by-id
    #     means rejecting id_b.
    return (
        pairs.where(F.col("vs_index"))
        .select(F.explode(F.array("id_a", "id_b")).alias(id_col))
        .unionByName(
            pairs.where(~F.col("vs_index")).select(
                F.col("id_b").alias(id_col)
            )
        )
    )


def dedup_admission_stream(
    stream: DataFrame,
    corpus_dir: str,
    index_dir: str,
    checkpoint_dir: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    threshold: float = 0.85,
):
    """Start (availableNow) the admission pipeline; returns the handle.

    Per micro-batch: (1) near-dup pairs vs the current index and within
    the batch; (2) rejects = any doc matching the index, or the
    HIGHER-id side of an in-batch pair (keep-first-by-id); (3) admitted
    docs append to ``corpus_dir/batch=<id>``, their signatures to
    ``index_dir/batch=<id>`` — the index the NEXT batch reads."""
    from oakstore_spark.operators.dedup import (
        incremental_minhash_pairs,
        minhash_signatures,
    )

    def admit(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        batch_df = batch_df.persist()
        pairs = None
        sigs = None
        try:
            # REPLAY SAFETY: a re-delivered batch must not see its own
            # previous output in the index — every doc it admitted last
            # time would self-match (jaccard 1.0) and be rejected,
            # then the overwrite would wipe the sink. Exclude
            # batch=<id> from the index read; earlier batches are the
            # exact index state the original delivery saw.
            idx_dirs = _index_dirs_excluding(index_dir, batch_id)
            if idx_dirs:
                index = spark.read.parquet(*idx_dirs)
            else:
                # first batch: only in-batch dedup; reuse the operator
                # with an empty index relation
                index = minhash_signatures(
                    batch_df.limit(0), id_col, text_col
                )
            # persist: the rejects relation below unions two branches
            # over `pairs`, and on the distributed path exchange reuse
            # is not guaranteed to cover the signature + band-join +
            # verify pipeline — without this it can evaluate twice per
            # micro-batch.
            # r15 optimization: sign the batch ONCE — the persisted
            # signature relation feeds the admission pair search AND
            # the index write (semi-join below), replacing a second
            # full signature pass over the admitted docs.
            sigs = minhash_signatures(
                batch_df, id_col, text_col
            ).persist()
            pairs = incremental_minhash_pairs(
                batch_df, index, id_col, text_col, threshold=threshold,
                presigned=sigs,
            ).persist()
            # Rejects stay a DataFrame end-to-end — no driver-side sets,
            # no isin() literal list, so a huge availableNow catch-up
            # batch with a high dup rate can't blow up the driver/plan.
            #   vs_index pair  -> the batch-side doc must go; taking BOTH
            #     sides is safe because index ids never occur in the
            #     batch relation, so the anti-join ignores them.
            #   in-batch pair  -> id_a < id_b on both operator paths
            #     (distributed join keys on l.id < r.id; the driver fast
            #     path sorts rows by id before triu), so keep-first-by-id
            #     means rejecting id_b.
            rejects = (
                pairs.where(F.col("vs_index"))
                .select(
                    F.explode(F.array("id_a", "id_b")).alias(id_col)
                )
                .unionByName(
                    pairs.where(~F.col("vs_index")).select(
                        F.col("id_b").alias(id_col)
                    )
                )
            )
            # no broadcast hint: AQE broadcasts small reject sets at
            # runtime, and a huge catch-up reject set shuffles instead
            # of being forced through the driver
            admitted = batch_df.join(rejects.distinct(), id_col, "left_anti")
            admitted = admitted.persist()

            # r15 optimization (guide §2.6): the corpus and index
            # writes are independent once `admitted` exists (distinct
            # dirs, no ordering) — overlap them so the second job's
            # tasks back-fill cores the first leaves idle. `admitted`
            # and `pairs` are persisted, so concurrent first use
            # computes each partition once (BlockManager cache locks).
            # Replay semantics unchanged: both are overwrites of this
            # batch's own dir; a failure in either branch fails the
            # batch and the replay overwrites both, exactly as a
            # mid-sequence failure did serially.
            def write_corpus() -> None:
                admitted.write.mode("overwrite").parquet(
                    f"{corpus_dir}/batch={batch_id}"
                )

            def write_sigs() -> None:
                (
                    sigs.join(
                        admitted.select(F.col(id_col).alias("id")),
                        "id",
                        "left_semi",
                    )
                    .write.mode("overwrite")
                    .parquet(f"{index_dir}/batch={batch_id}")
                )

            from concurrent.futures import ThreadPoolExecutor

            from pyspark.util import inheritable_thread_target

            # r16 (r15 ADVICE, medium): inherit the foreachBatch
            # thread's JVM-local properties (streaming job group/tags,
            # scheduler pool) into the sink threads so stop() can
            # cancel in-flight sink jobs and the UI attributes them
            with ThreadPoolExecutor(max_workers=2) as pool:
                futs = [
                    pool.submit(inheritable_thread_target(fn))
                    for fn in (write_corpus, write_sigs)
                ]
                for fut in futs:
                    fut.result()
            admitted.unpersist()
        finally:
            if sigs is not None:
                sigs.unpersist()
            if pairs is not None:
                pairs.unpersist()
            batch_df.unpersist()

    return (
        stream.writeStream.foreachBatch(admit)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
