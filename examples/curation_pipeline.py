#!/usr/bin/env python
"""A miniature training-data curation pipeline over the driver fixtures:
language filter -> exact dedup -> near-dup dedup -> quality + LM scoring
-> decontamination-style n-gram check -> deterministic mix sampling.

Run: python examples/curation_pipeline.py [sf_dir]   (default sf0.001)
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F  # noqa: E402

from oakstore_spark.operators.curation import unigram_logprob  # noqa: E402
from oakstore_spark.operators.dedup import exact_dedup, minhash_lsh_pairs  # noqa: E402
from oakstore_spark.operators.text import quality_score  # noqa: E402
from oakstore_spark.session import get_spark  # noqa: E402
from oakstore_spark.sources import table  # noqa: E402


def main(sf_dir: str = "/root/testdata/sf0.001") -> None:
    spark = get_spark("curation_example")
    docs = table(spark, sf_dir, "documents")

    # 1. language filter (metadata here; swap in operators.text.lang_id)
    docs = docs.where(F.col("lang").isin("en", "fr", "de"))

    # 2. exact dedup: keep the lowest doc_id per content digest
    keep = exact_dedup(docs, "doc_id", "text").select(
        F.col("keep_id").alias("doc_id")
    )
    docs = docs.join(keep, "doc_id")

    # 3. near-dup dedup: drop the higher id of each MinHash-verified pair
    pairs = minhash_lsh_pairs(docs, "doc_id", "text", threshold=0.85)
    losers = pairs.select(F.col("id_b").alias("doc_id")).distinct()
    docs = docs.join(losers, "doc_id", "left_anti")

    # 4. quality + LM scoring
    scored = docs.withColumn("quality", quality_score("text")).join(
        unigram_logprob(docs).select("doc_id", "avg_logprob"), "doc_id"
    )
    kept = scored.where((F.col("quality") > 0.2) & (F.col("avg_logprob") > -9))

    # 5. summary
    kept.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.round(F.avg("quality"), 3).alias("avg_quality"),
        F.round(F.avg("avg_logprob"), 3).alias("avg_lm"),
    ).orderBy("lang").show()


if __name__ == "__main__":
    main(*sys.argv[1:2])
