#!/usr/bin/env python
"""A miniature crawl-to-retrieval pipeline over the driver fixtures:
robots.txt politeness (allow/deny + Crawl-delay) -> per-domain fetch
scheduling -> WARC/WET delivery round-trip -> persisted BM25 inverted
index over the extracted text.

Run: python examples/crawl_politeness_pipeline.py [sf_dir]  (default sf0.001)
"""

from __future__ import annotations

import sys
import tempfile
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F  # noqa: E402

from oakstore_spark.operators.text import (  # noqa: E402
    build_bm25_index,
    search_bm25_index,
)
from oakstore_spark.operators.urls import (  # noqa: E402
    crawl_delays,
    parse_robots,
    robots_allowed,
    schedule_fetches,
)
from oakstore_spark.session import get_spark  # noqa: E402
from oakstore_spark.sources import table  # noqa: E402
from oakstore_spark.sources.warc import read_wet, write_warc  # noqa: E402


def main(sf_dir: str = "/root/testdata/sf0.001") -> None:
    spark = get_spark("crawl_example")
    docs = table(spark, sf_dir, "documents")

    # 0. a URL frontier derived from the fixture ids, 4 domains
    urls = docs.select(
        "doc_id",
        F.concat(
            F.lit("http://site"),
            (F.col("doc_id") % 4).cast("string"),
            F.lit(".test/doc/"),
            F.col("doc_id").cast("string"),
        ).alias("url"),
    )

    # 1. robots politeness: deny rules + crawl delays per domain
    robots = spark.createDataFrame(
        [
            ("site0.test", "User-agent: *\nDisallow: /doc/1\nCrawl-delay: 2\n"),
            ("site1.test", "User-agent: *\nCrawl-delay: 0.5\n"),
            ("site2.test", "User-agent: *\nDisallow: /\n"),
            ("site3.test", "User-agent: *\n Disallow:\n"),
        ],
        "reg_domain string, robots_txt string",
    )
    allowed = robots_allowed(urls, parse_robots(robots)).where("allowed")
    schedule = schedule_fetches(allowed, crawl_delays(robots))
    print("fetch schedule (first 5 slots of site0):")
    schedule.where(F.col("reg_domain") == "site0.test").orderBy(
        "fetch_slot"
    ).show(5, truncate=False)

    # 2. "fetched" pages delivered as WET-style conversion records
    fetched = docs.join(allowed.select("doc_id"), "doc_id")
    wet_dir = str(Path(tempfile.gettempdir()) / "oakspark_example_wet")
    write_warc(
        fetched.select(
            F.concat(F.lit("urn:ex:"), F.col("doc_id")).alias("record_id"),
            F.lit("conversion").alias("warc_type"),
            F.concat(F.lit("http://x.test/"), F.col("doc_id")).alias(
                "target_uri"
            ),
            (F.col("doc_id") * 1_000_000).alias("warc_date_us"),
            F.lit("text/plain").alias("content_type"),
            F.encode("text", "utf-8").alias("payload"),
        ),
        wet_dir,
        compress=True,
    )
    wet = read_wet(spark, wet_dir)
    print("WET records:", wet.count())

    # 3. persisted BM25 index over the extracted text; query it
    idx = str(Path(tempfile.gettempdir()) / "oakspark_example_bm25")
    build_bm25_index(wet.withColumnRenamed("record_id", "doc_id"), idx)
    hits = (
        search_bm25_index(spark, idx, ["hash", "join", "scan"])
        .orderBy(F.desc("score_raw"), "doc_id")
        .limit(5)
    )
    print("BM25 top-5:")
    hits.show(truncate=False)


if __name__ == "__main__":
    main(*sys.argv[1:2])
