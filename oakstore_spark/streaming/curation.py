"""Streaming raw-text CURATION end-to-end (r14 verdict ask #3): the
deployment shape of the whole LLM-data pipeline in ONE ``foreachBatch``
leg —

    text stream -> near-dup ADMISSION (persisted minhash signature
    index, streaming/dedup.py) -> in-engine EMBEDDING
    (operators/text.doc_embed — integer-exact hashed TF-IDF x JL)
    -> IVF INDEX maintenance (cell assignment against the trained
    coarse quantizer, operators/similarity.py build/search layout)

Every piece existed as a batch operator; this module composes them so
each arriving micro-batch is deduped against everything admitted so
far, embedded, and made ANN-searchable — per-batch cost tracks the
BATCH (signatures + one broadcast centroid assign), never the corpus.

Replay safety (the dedup_admission_stream pattern): foreachBatch can
re-deliver a batch after a failure, so every write lands in a
``batch=<id>`` subdirectory with overwrite mode — a replayed batch
overwrites its own previous output instead of double-admitting or
double-indexing. The IVF ``vectors`` table is therefore partitioned
``batch=<id>/_cell=<c>``; ``search_ivf_index`` discovers both
partition levels and still prunes probed cells at listing time. The
coarse quantizer is trained ONCE on the first non-empty admitted batch
(deterministic spherical k-means on a bounded sample) and written with
overwrite — a replayed first batch retrains to the identical table.

Embedding idf note: ``doc_embed`` weights are corpus-relative; the
streaming leg computes them PER ADMITTED BATCH (the only information
available at admission time — the standard online-ingest trade-off vs
a global-idf batch re-embed). The driver oracle replays exactly that:
per-batch idf over each batch's admitted survivors.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from oakstore_spark.streaming.dedup import admission_rejects


def curation_ingest_stream(
    stream: DataFrame,
    corpus_dir: str,
    sig_index_dir: str,
    ivf_dir: str,
    checkpoint_dir: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    threshold: float = 0.85,
    dim: int = 8,
    n_buckets: int = 64,
    scale: int = 1024,
    n_centroids: int = 4,
    kmeans_sample: int = 10_000,
    kmeans_iter: int = 10,
    seed: int = 42,
):
    """Start (availableNow) the text->vector->dedup->index pipeline;
    returns the streaming query handle.

    Per micro-batch: (1) near-dup admission vs the persisted signature
    index + in-batch keep-first (exactly ``dedup_admission_stream``);
    (2) admitted docs append to ``corpus_dir/batch=<id>`` and their
    signatures to ``sig_index_dir/batch=<id>``; (3) admitted docs embed
    through :func:`~oakstore_spark.operators.text.doc_embed` (batch-
    local idf — exact BIGINT components); (4) vectors are assigned to
    cells against the persisted coarse quantizer (trained on the first
    non-empty batch) and written to ``ivf_dir/vectors/batch=<id>``
    partitioned by ``_cell`` — immediately searchable via
    ``search_ivf_index(spark, ivf_dir, ...)``."""
    from oakstore_spark.operators.dedup import minhash_signatures
    from oakstore_spark.operators.similarity import _spherical_kmeans
    from oakstore_spark.operators.text import doc_embed

    # r15 optimization (guide §1.2 step 1): the coarse quantizer is
    # immutable once trained (deterministic k-means, written once with
    # overwrite), yet every later micro-batch paid a read+collect job
    # to load it back. Memoize the centroid matrix in the closure for
    # the lifetime of this stream: values are identical to the parquet
    # read-back by construction, a replayed first batch sees the same
    # C it wrote, and a RESTARTED stream (fresh closure) still reads
    # the persisted table — replay safety unchanged.
    cent_cache: list[np.ndarray] = []

    def process(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        batch_df = batch_df.persist()
        admitted = None
        sigs = None
        try:
            # replay safety: never read this batch's own previous
            # signatures as "index" — see streaming/dedup.py
            from oakstore_spark.streaming.dedup import (
                _index_dirs_excluding,
            )

            idx_dirs = _index_dirs_excluding(sig_index_dir, batch_id)
            if idx_dirs:
                index = spark.read.parquet(*idx_dirs)
            else:
                index = minhash_signatures(
                    batch_df.limit(0), id_col, text_col
                )
            # r15 optimization (guide §1.2 step 1): sign the batch
            # ONCE and reuse the persisted (id, shingles, sig)
            # relation for BOTH the admission check and the signature
            # index write (a semi-join on the admitted ids replaces
            # the previous second minhash_signatures pass — the
            # signature of a doc is deterministic, so filtering the
            # batch relation is byte-identical to re-signing).
            from pyspark.storagelevel import StorageLevel

            sigs = minhash_signatures(
                batch_df, id_col, text_col
            ).persist(StorageLevel.MEMORY_AND_DISK)
            rejects = admission_rejects(
                batch_df, index, id_col, text_col, threshold,
                presigned=sigs,
            )
            admitted = batch_df.join(
                rejects.distinct(), id_col, "left_anti"
            ).persist()

            # r15 optimization (guide §2.6): the three sinks below —
            # corpus append, signature-index append, embed->assign->IVF
            # vector write — are mutually independent once `admitted`
            # exists (distinct directories, no ordering between them),
            # and each is a small job that leaves most cores idle at
            # this per-batch scale. Run them from a thread pool so the
            # scheduler back-fills: `admitted` (persisted) is computed
            # once under the BlockManager's per-partition cache locks
            # no matter which job touches a partition first. Replay
            # semantics are unchanged — every sink is an overwrite of
            # its own batch=<id> dir, so a failure in ANY branch fails
            # the batch and the replay overwrites all three, exactly as
            # the serial code did on a mid-sequence failure.
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
                    .parquet(f"{sig_index_dir}/batch={batch_id}")
                )

            def write_vectors() -> None:
                emb = doc_embed(
                    admitted, text_col=text_col, id_col=id_col,
                    dim=dim, n_buckets=n_buckets, scale=scale,
                )
                # r16: persist only while the quantizer is untrained —
                # that is the only batch where emb is consumed twice
                # (kmeans sample + the indexed write); on steady-state
                # batches the persist was pure cache overhead
                if not cent_cache:
                    emb = emb.persist()
                # docs with no alphanumeric terms embed to nothing —
                # they are admitted to the corpus but not indexable
                try:
                    cent_path = f"{ivf_dir}/centroids"
                    if cent_cache:
                        C = cent_cache[0]
                    else:
                        try:
                            cent = spark.read.parquet(
                                cent_path
                            ).orderBy("cell").collect()
                        except Exception:
                            cent = None
                        if cent is None:
                            sample = (
                                emb.select("embedding")
                                .limit(kmeans_sample)
                                .toPandas()
                            )
                            if len(sample) == 0:
                                return  # nothing indexable yet
                            X = np.stack(
                                [
                                    np.asarray(v, dtype=np.float64)
                                    for v in sample["embedding"]
                                ]
                            )
                            k = min(n_centroids, X.shape[0])
                            C = _spherical_kmeans(
                                X, k, kmeans_iter, seed
                            )
                            rows = [
                                (int(i), [float(x) for x in C[i]])
                                for i in range(C.shape[0])
                            ]
                            spark.createDataFrame(
                                rows, "cell int, centroid array<double>"
                            ).coalesce(1).write.mode(
                                "overwrite"
                            ).parquet(cent_path)
                        else:
                            C = np.stack(
                                [
                                    np.asarray(
                                        r["centroid"], dtype=np.float64
                                    )
                                    for r in cent
                                ]
                            )
                        cent_cache.append(C)
                    CT = np.ascontiguousarray(C.T)
                    out_schema = T.StructType(
                        [
                            T.StructField(
                                id_col, emb.schema[id_col].dataType
                            ),
                            T.StructField(
                                "emb_q", T.ArrayType(T.LongType())
                            ),
                            T.StructField(
                                "embedding", T.ArrayType(T.DoubleType())
                            ),
                            T.StructField("_cell", T.IntegerType()),
                        ]
                    )

                    def assign(batches):
                        import pandas as pd  # noqa: F401

                        for pdf in batches:
                            if len(pdf) == 0:
                                continue
                            B = np.stack(
                                [
                                    np.asarray(v, dtype=np.float64)
                                    for v in pdf["embedding"]
                                ]
                            )
                            Bn = B / np.maximum(
                                np.linalg.norm(
                                    B, axis=1, keepdims=True
                                ),
                                1e-12,
                            )
                            out = pdf[
                                [id_col, "emb_q", "embedding"]
                            ].copy()
                            out["_cell"] = (
                                (Bn @ CT).argmax(axis=1).astype(np.int32)
                            )
                            yield out

                    (
                        emb.mapInPandas(assign, out_schema)
                        # cluster by cell before the partitioned write
                        # (guide §6): one file per populated cell
                        .repartition(int(CT.shape[1]), F.col("_cell"))
                        .write.mode("overwrite")
                        .partitionBy("_cell")
                        .parquet(f"{ivf_dir}/vectors/batch={batch_id}")
                    )
                finally:
                    emb.unpersist()

            from concurrent.futures import ThreadPoolExecutor

            from pyspark.util import inheritable_thread_target

            # r16 (r15 ADVICE, medium): wrap each sink so the JVM
            # thread-local properties foreachBatch set on THIS thread
            # (streaming job group/tags, scheduler pool) propagate to
            # the pool threads — StreamingQuery.stop() can then cancel
            # in-flight sink jobs and the UI attributes them correctly
            with ThreadPoolExecutor(max_workers=3) as pool:
                futs = [
                    pool.submit(inheritable_thread_target(fn))
                    for fn in (write_corpus, write_sigs, write_vectors)
                ]
                for fut in futs:
                    fut.result()
        finally:
            if sigs is not None:
                sigs.unpersist()
            if admitted is not None:
                admitted.unpersist()
            batch_df.unpersist()

    return (
        stream.writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
