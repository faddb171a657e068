"""Store-to-store REPLICATION over the manifest CDC stream: keep a
target store's item converged with a source item by applying each CDC
micro-batch (the inserted rows between manifest versions) through the
store's own index-keyed old-wins append.

Why this is exactly-once without any coordination: Structured Streaming
checkpoints give at-least-once batch delivery, and the store's append
dedups on the index with old-wins — so a replayed batch re-inserts rows
that already exist and changes nothing. Idempotent apply x at-least-once
delivery = converged state (the same argument as
``streaming/ingest.stream_append_to_store``).

At 100 TB this is the cross-region/DR pattern: the source's manifest
versions are the replication log (no file listing, no diffing scans —
``OakStoreStreamReader`` reads only generations a version actually
changed), and the target applies only the delta volume per tick.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def replicate_item_stream(
    spark: SparkSession,
    source_base: str,
    key: str,
    target_store,
    checkpoint_dir: str,
):
    """Start (availableNow) replication of ``source_base``/``key`` into
    ``target_store`` (any commit protocol); returns the query handle.
    The first batch is the genesis replay and CREATES the target item;
    later batches append the inserted rows."""
    from oakstore_spark.sources.datasource import OakStoreDataSource

    spark.dataSource.register(OakStoreDataSource)
    ukey = key.upper()

    def apply_batch(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        if ukey in target_store.keys():
            target_store._append(key=ukey, data=batch_df)
        else:
            target_store._write(key=ukey, data=batch_df)

    return (
        spark.readStream.format("oakstore")
        .option("path", str(source_base))
        .option("key", ukey)
        .load()
        .writeStream.foreachBatch(apply_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
