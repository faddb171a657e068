#!/usr/bin/env python
"""A miniature web-crawl curation pipeline, end to end: planted HTML
pages flow through boilerplate extraction (link-density scoring),
corpus-level line dedup, URL canonicalization + domain blocklisting,
the full PII scrub (Luhn-validated cards included), language ID,
readability scoring, and weak-supervision labeling — the same
operators the driver checks under DuckDB oracles
(q_web_curation_e2e, q_url_domain_stats, q_pii_detect_luhn,
q_langid_ct, q_readability, q_label_vote).

Run: python examples/web_curation_pipeline.py [sf_dir]  (default sf0.001)
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F  # noqa: E402

from oakstore_spark.operators.dedup import line_dedup_corpus  # noqa: E402
from oakstore_spark.operators.html import extract_main_text  # noqa: E402
from oakstore_spark.operators.labeling import (  # noqa: E402
    apply_label_functions,
)
from oakstore_spark.operators.pii import detect_pii, redact_pii_all  # noqa: E402
from oakstore_spark.operators.text import readability  # noqa: E402
from oakstore_spark.operators.urls import (  # noqa: E402
    filter_blocklisted,
    normalize_url,
)
from oakstore_spark.session import get_spark  # noqa: E402


def main(sf_dir: str = "/root/testdata/sf0.001") -> None:
    spark = get_spark("web_curation_example")
    spark.sparkContext.setLogLevel("ERROR")
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "lang", "n_chars"
    )
    sid = F.col("doc_id").cast("string")

    # 1. synthetic crawl: page + source URL per document
    pages = docs.select(
        "doc_id", "lang", "n_chars",
        F.concat(
            F.lit('<html><body><nav><a href="/">Home</a> '
                  '<a href="/faq">FAQ link</a> <a href="/m">More</a></nav>'
                  "<p>Contact admin"),
            sid,
            F.lit("@example.com about page "), sid,
            F.lit(" with plenty of prose to keep.</p>"
                  "<p>Shared cookie banner appears on every page.</p>"
                  '<footer><a href="/t">Terms</a></footer></body></html>'),
        ).alias("html"),
        F.concat(
            F.lit("HTTP://WWW.Site"), (F.col("doc_id") % 11).cast("string"),
            F.lit(".COM:80/a/?utm_source=x&p="), sid, F.lit("#f"),
        ).alias("url"),
    )

    # 2. URL canonicalization + domain blocklist (anti-join, broadcast)
    blocklist = spark.createDataFrame([("site0.com",)], "reg_domain string")
    kept = filter_blocklisted(pages, blocklist, "url").withColumn(
        "norm_url", normalize_url("url")
    )
    print("pages after blocklist:", kept.count(), "/", pages.count())

    # 3. boilerplate extraction -> corpus line dedup -> PII scrub
    extracted = extract_main_text(kept).select(
        "doc_id", "lang", "n_chars", "norm_url",
        F.col("main_text").alias("text"),
    )
    deduped = line_dedup_corpus(extracted)
    clean = deduped.join(
        extracted.drop("text"), "doc_id"
    ).withColumn("clean_text", redact_pii_all("clean_text"))
    print("docs that lost a boilerplate line:",
          clean.where(F.col("n_kept") < F.col("n_lines")).count())

    # 4. signals: PII counts, readability, weak labels
    signals = detect_pii(clean, "clean_text")
    scores = readability(clean, text_col="clean_text")
    lfs = {
        "lf_en": F.when(F.col("lang") == "en", F.lit(1)),
        "lf_long": F.when(F.col("n_chars") >= 150, F.lit(1)).otherwise(
            F.lit(0)
        ),
    }
    labels = apply_label_functions(
        signals.join(scores.select("doc_id", "flesch"), "doc_id"), lfs
    )
    summary = labels.agg(
        F.count(F.lit(1)).alias("docs"),
        F.sum(F.col("has_pii").cast("int")).alias("docs_with_pii"),
        F.round(F.avg("flesch"), 2).alias("avg_flesch"),
        F.sum(F.col("vote")).alias("sum_votes"),
    ).collect()[0]
    print("curated:", summary.asDict())


if __name__ == "__main__":
    main(*sys.argv[1:])
