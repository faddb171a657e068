"""Corpus-curation queries (operators/curation.py) plus the grouped-agg
pandas UDAF surface, each with a DuckDB oracle."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from oakstore_spark.operators.curation import (
    EMAIL_RE,
    PHONE_RE,
    balanced_mix_sample,
    bigram_logprob,
    ks_binned_stat,
    redact_pii,
    unigram_logprob,
)
from oakstore_spark.queries import register
from oakstore_spark.sources import table


@register(
    "q_unigram_logprob",
    oracle="""
    WITH tok AS (
      SELECT doc_id, t AS term
      FROM documents, unnest(string_split(text, ' ')) AS u(t)
      WHERE t <> ''
    ), tf AS (
      SELECT term, count(*) AS n FROM tok GROUP BY 1
    ), tot AS (
      SELECT sum(n) AS t FROM tf
    )
    SELECT doc_id,
           CAST(count(*) AS BIGINT) AS n_tokens,
           round(avg(ln(n / t)), 4) AS avg_logprob
    FROM tok JOIN tf USING (term), tot
    GROUP BY doc_id
    """,
)
def q_unigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cheap perplexity proxy: mean unigram log-prob per document under
    the corpus's own term distribution (two-pass, broadcast vocab)."""
    d = table(spark, sf_dir, "documents")
    out = unigram_logprob(d)
    return out.select(
        "doc_id", "n_tokens", F.round("avg_logprob", 4).alias("avg_logprob")
    )


_NORM = (
    "trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9\\s]', '', 'g'),"
    " '\\s+', ' ', 'g'))"
)


@register(
    "q_bigram_lm_interp",
    oracle=f"""
    WITH w AS (
      SELECT doc_id, string_split({_NORM}, ' ') AS ws FROM documents
    ), uni AS (
      SELECT u AS term, count(*) AS cu FROM w, unnest(ws) AS t(u) GROUP BY 1
    ), tot AS (
      SELECT sum(cu) AS t FROM uni
    ), bg AS (
      SELECT doc_id,
             unnest(list_transform(range(1, len(ws)), i -> ws[i])) AS w1,
             unnest(list_transform(range(1, len(ws)), i -> ws[i + 1])) AS w2
      FROM w WHERE len(ws) >= 2
    ), bc AS (
      SELECT w1, w2, count(*) AS cb FROM bg GROUP BY 1, 2
    )
    SELECT doc_id,
           CAST(count(*) AS BIGINT) AS n_bigrams,
           round(avg(ln(0.75 * cb / cu1.cu + 0.25 * cu2.cu / t)), 4)
             AS avg_logprob
    FROM bg
    JOIN bc USING (w1, w2)
    JOIN uni cu1 ON bg.w1 = cu1.term
    JOIN uni cu2 ON bg.w2 = cu2.term, tot
    GROUP BY doc_id
    """,
)
def q_bigram_lm_interp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interpolated (Jelinek-Mercer) bigram LM document scoring — the
    next quality signal above ``q_unigram_logprob``: each document's
    mean ln(0.75*P(w2|w1) + 0.25*P(w2)) under corpus-wide counts. Two
    vocab-sized aggregations + key equi-joins; nothing wider than a
    bigram ever shuffles. The oracle steps the identical mixture, so
    values must agree to the rounded digit."""
    from oakstore_spark.functions.text import normalize_text

    d = table(spark, sf_dir, "documents")
    norm = d.select("doc_id", normalize_text("text").alias("text"))
    out = bigram_logprob(norm)
    return out.select(
        "doc_id", "n_bigrams", F.round("avg_logprob", 4).alias("avg_logprob")
    )


@register(
    "q_pii_redact",
    oracle=f"""
    WITH aug AS (
      SELECT doc_id,
             text || ' contact user' || CAST(doc_id AS VARCHAR)
                  || '@example.com or 555-'
                  || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') AS t
      FROM documents
    )
    SELECT doc_id,
           md5(regexp_replace(
                 regexp_replace(t, '{EMAIL_RE}', '<EMAIL>', 'g'),
                 '{PHONE_RE}', '<PHONE>', 'g'))
             AS redacted_md5,
           CAST(len(regexp_extract_all(t, '{EMAIL_RE}')) AS INT) AS n_emails,
           CAST(len(regexp_extract_all(t, '{PHONE_RE}')) AS INT) AS n_phones
    FROM aug
    """,
)
def q_pii_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII scrubbing end-to-end: deterministic synthetic emails/phones
    are appended to each doc (the corpus has none), redacted map-side,
    and the md5 of the redacted text is compared across engines — one
    divergent character in either regex engine's output is a mismatch.
    Patterns are RE2-safe so Java regex and RE2 agree."""
    d = table(spark, sf_dir, "documents")
    aug = d.select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.lit(" contact user"),
            F.col("doc_id").cast("string"),
            F.lit("@example.com or 555-"),
            F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
        ).alias("t"),
    )
    return aug.select(
        "doc_id",
        F.md5(F.encode(redact_pii("t"), "UTF-8")).alias("redacted_md5"),
        F.regexp_count("t", F.lit(EMAIL_RE)).cast("int").alias("n_emails"),
        F.regexp_count("t", F.lit(PHONE_RE)).cast("int").alias("n_phones"),
    )


@register(
    "q_domain_mix",
    oracle="""
    WITH counts AS (
      SELECT lang, count(*) AS c FROM documents GROUP BY 1
    ), m AS (
      SELECT min(c) AS m FROM counts
    ), thr AS (
      SELECT lang, m / c AS f,
             lpad(lower(to_hex(CAST(floor(m / c * 4294967296) AS BIGINT))),
                  8, '0') AS t8
      FROM counts, m
    )
    SELECT lang,
           CAST(count(*) AS BIGINT) AS n_kept,
           CAST(sum(doc_id) AS BIGINT) AS id_checksum
    FROM documents JOIN thr USING (lang)
    WHERE f >= 1.0 OR substr(md5(CAST(doc_id AS VARCHAR)), 1, 8) < t8
    GROUP BY lang
    """,
)
def q_domain_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Balanced domain mixing: every lang downsampled to ~the smallest
    lang's size via the deterministic md5-threshold filter (map-side; no
    corpus shuffle). The oracle re-derives the exact same kept set, so
    n_kept AND the id checksum must match row-for-row."""
    d = table(spark, sf_dir, "documents")
    kept = balanced_mix_sample(d, "lang", "doc_id")
    return kept.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_kept"),
        F.sum("doc_id").alias("id_checksum"),
    )


@register(
    "q_weighted_avg_udaf",
    oracle="""
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n_events,
           sum(CAST(round(value * 100) AS BIGINT) * (user_id % 10 + 1))
             / CAST(sum(user_id % 10 + 1) AS DOUBLE) AS w_avg_cents
    FROM events
    GROUP BY event_type
    """,
)
def q_weighted_avg_udaf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The GROUPED_AGG pandas UDF surface (the one UDF shape the suite
    did not yet exercise): a weighted mean implemented as a vectorized
    Arrow aggregation. Weights and values are integral (cents,
    user_id%10+1) so both engines' sums are exact and the final division
    is the identical IEEE op — no rounding tolerance needed."""

    @F.pandas_udf("double")
    def wavg(cents: pd.Series, w: pd.Series) -> float:
        return float((cents * w).sum() / w.sum())

    # Spark disallows mixing group-agg pandas UDFs with built-in
    # aggregates in one agg(), so the row count is a pandas UDF too
    @F.pandas_udf("long")
    def pcount(cents: pd.Series) -> int:
        return int(len(cents))

    e = table(spark, sf_dir, "events").select(
        "event_type",
        F.round(F.col("value") * 100).cast("bigint").alias("cents"),
        (F.col("user_id") % 10 + 1).alias("w"),
    )
    return e.groupBy("event_type").agg(
        pcount("cents").alias("n_events"),
        wavg("cents", "w").alias("w_avg_cents"),
    )


@register(
    "q_cohort_retention",
    oracle="""
    WITH first_seen AS (
      SELECT user_id, date_trunc('week', min(ts)) AS cohort_week
      FROM events GROUP BY 1
    ), activity AS (
      SELECT DISTINCT e.user_id, f.cohort_week,
             CAST(floor(date_diff('day', f.cohort_week,
                                  date_trunc('week', e.ts)) / 7) AS BIGINT)
               AS week_offset
      FROM events e JOIN first_seen f USING (user_id)
    )
    SELECT CAST(epoch(cohort_week) AS BIGINT) AS cohort_epoch,
           week_offset,
           CAST(count(*) AS BIGINT) AS n_users
    FROM activity
    GROUP BY 1, 2
    """,
)
def q_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention matrix: users bucketed by first-activity week,
    counted once per (cohort, week-offset) they were active in — the
    standard growth-analytics rollup. Two aggregations over events plus
    one join on user_id; the cohort relation is user-sized (small), so
    it broadcasts."""
    from oakstore_spark.sources import table as _table

    e = _table(spark, sf_dir, "events")
    first_seen = e.groupBy("user_id").agg(
        F.date_trunc("week", F.min("ts")).alias("cohort_week")
    )
    activity = (
        e.join(F.broadcast(first_seen), "user_id")
        .select(
            "user_id",
            "cohort_week",
            F.floor(
                F.datediff(F.date_trunc("week", F.col("ts")), F.col("cohort_week"))
                / 7
            )
            .cast("bigint")
            .alias("week_offset"),
        )
        .distinct()
    )
    return activity.groupBy(
        F.unix_timestamp("cohort_week").alias("cohort_epoch"), "week_offset"
    ).agg(F.count(F.lit(1)).cast("bigint").alias("n_users"))


@register(
    "q_shingle_dup_ratio",
    oracle="""
    WITH words AS (
      SELECT doc_id, string_split(text, ' ') AS ws FROM documents
    ), shingles AS (
      SELECT DISTINCT doc_id,
             unnest(list_transform(range(1, len(ws) - 3),
               i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] || ' '
                    || ws[i+3] || ' ' || ws[i+4])) AS sh
      FROM words WHERE len(ws) >= 5
    ), df AS (
      SELECT sh, count(*) AS n_docs FROM shingles GROUP BY 1
    )
    SELECT doc_id,
           CAST(count(*) AS BIGINT) AS n_shingles,
           round(avg(CASE WHEN n_docs > 1 THEN 1.0 ELSE 0.0 END), 4)
             AS dup_ratio
    FROM shingles JOIN df USING (sh)
    GROUP BY doc_id
    """,
)
def q_shingle_dup_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-document repetition signal: the fraction of a document's
    distinct 5-gram word shingles that also occur in at least one other
    document (C4-style 'seen elsewhere' boilerplate detector). One
    explode + document-frequency aggregation + join back on the
    shingle; at 100 TB the df relation is the shuffle — hash-partition
    on the 64-bit shingle hash, never the raw string."""
    d = table(spark, sf_dir, "documents")
    ws = F.split("text", " ")

    def _sh(w):
        return F.when(
            F.size(w) >= 5,
            F.transform(
                F.sequence(F.lit(0), F.size(w) - 5),
                lambda i: F.concat_ws(
                    " ",
                    F.element_at(w, i + 1),
                    F.element_at(w, i + 2),
                    F.element_at(w, i + 3),
                    F.element_at(w, i + 4),
                    F.element_at(w, i + 5),
                ),
            ),
        ).otherwise(F.array().cast("array<string>"))

    sh = F.element_at(F.transform(F.array(ws), _sh), 1)
    shingles = (
        d.select("doc_id", F.explode(sh).alias("sh")).distinct()
    )
    df_rel = shingles.groupBy("sh").agg(F.count(F.lit(1)).alias("n_docs"))
    return (
        shingles.join(df_rel, "sh")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_shingles"),
            F.round(
                F.avg(F.when(F.col("n_docs") > 1, 1.0).otherwise(0.0)), 4
            ).alias("dup_ratio"),
        )
    )


@register(
    "q_profile_orders",
    oracle="""
    SELECT 'o_orderkey' AS column,
           count(CASE WHEN o_orderkey IS NULL THEN 1 END) AS n_nulls,
           count(DISTINCT o_orderkey) AS n_distinct,
           CAST(min(o_orderkey) AS DOUBLE) AS vmin,
           CAST(max(o_orderkey) AS DOUBLE) AS vmax
    FROM orders
    UNION ALL
    SELECT 'o_totalprice',
           count(CASE WHEN o_totalprice IS NULL THEN 1 END),
           count(DISTINCT o_totalprice),
           round(min(o_totalprice), 4), round(max(o_totalprice), 4)
    FROM orders
    UNION ALL
    SELECT 'o_orderdate',
           count(CASE WHEN o_orderdate IS NULL THEN 1 END),
           count(DISTINCT o_orderdate),
           CAST(epoch(min(o_orderdate)) AS DOUBLE),
           CAST(epoch(max(o_orderdate)) AS DOUBLE)
    FROM orders
    UNION ALL
    SELECT 'o_orderpriority',
           count(CASE WHEN o_orderpriority IS NULL THEN 1 END),
           count(DISTINCT o_orderpriority),
           CAST(min(len(o_orderpriority)) AS DOUBLE),
           CAST(max(len(o_orderpriority)) AS DOUBLE)
    FROM orders
    """,
)
def q_profile_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-pass table profile (operators/curation.profile_table) over a
    representative column mix: integer key, double measure, timestamp,
    string. The oracle recomputes each column's profile independently."""
    from oakstore_spark.operators.curation import profile_table

    o = table(spark, sf_dir, "orders")
    out = profile_table(
        o, ["o_orderkey", "o_totalprice", "o_orderdate", "o_orderpriority"]
    )
    return out.select(
        "column",
        "n_nulls",
        "n_distinct",
        F.round("vmin", 4).alias("vmin"),
        F.round("vmax", 4).alias("vmax"),
    )


@register(
    "q_winnow_fingerprints",
    oracle="""
    WITH t AS (
      SELECT doc_id,
             trim(regexp_replace(regexp_replace(lower(text),
                    '[^a-z0-9\\s]', '', 'g'), '\\s+', ' ', 'g')) AS nt
      FROM documents
    ), g AS (
      SELECT doc_id,
             list_transform(range(1, greatest(len(nt) - 4, 1) + 1),
                            i -> substr(md5(substr(nt, i, 5)), 1, 16)) AS hs
      FROM t
    ), m AS (
      SELECT doc_id,
             list_sort(list_distinct(
               list_transform(range(1, greatest(len(hs) - 3, 1) + 1),
                 i -> list_min(list_slice(hs, i,
                        i + least(4, len(hs)) - 1))))) AS fps
      FROM g
    )
    SELECT doc_id,
           CAST(len(fps) AS INT) AS n_fp,
           md5(array_to_string(fps, '')) AS fp_checksum
    FROM m
    """,
)
def q_winnow_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winnowing fingerprint selection over every document — compared
    by count AND an order-independent checksum of the selected hash
    set, so one wrongly-selected window minimum on either engine is a
    mismatch. Entirely array expressions: map-side, no shuffle."""
    from oakstore_spark.operators.text import winnow_fingerprints

    d = table(spark, sf_dir, "documents")
    out = winnow_fingerprints(d)
    return out.select(
        "doc_id",
        F.size("fps").cast("int").alias("n_fp"),
        F.md5(F.encode(F.concat_ws("", "fps"), "UTF-8")).alias("fp_checksum"),
    )


@register(
    "q_target_mix",
    oracle="""
    WITH tok AS (
      SELECT doc_id, lang,
             CASE WHEN len(trim(text)) = 0 THEN 0
                  ELSE len(string_split_regex(trim(text), '\\s+')) END AS toks
      FROM documents
    ), counts AS (
      SELECT lang, CAST(sum(toks) AS DOUBLE) AS toks,
             CASE lang WHEN 'en' THEN 0.5 WHEN 'zh' THEN 0.3
                       WHEN 'de' THEN 0.2 END AS tgt
      FROM tok GROUP BY lang
    ), feasible AS (
      SELECT * FROM counts WHERE tgt IS NOT NULL AND tgt > 0
    ), scale AS (
      SELECT min(toks / tgt) AS c FROM feasible
    ), thr AS (
      SELECT lang, c * tgt / toks AS f,
             lpad(lower(to_hex(CAST(floor(c * tgt / toks * 4294967296)
                                    AS BIGINT))), 8, '0') AS t8
      FROM feasible, scale
    )
    SELECT lang,
           CAST(count(*) AS BIGINT) AS n_kept,
           CAST(sum(toks) AS BIGINT) AS kept_tokens,
           CAST(sum(doc_id) AS BIGINT) AS id_checksum
    FROM tok JOIN thr USING (lang)
    WHERE f >= 1.0 OR substr(md5(CAST(doc_id AS VARCHAR)), 1, 8) < t8
    GROUP BY lang
    """,
)
def q_target_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-weighted target mixture (en 50% / zh 30% / de 20% of kept
    tokens): the binding domain keeps everything, the rest downsample
    deterministically toward the target shares. Exact kept-set parity
    with the oracle (counts, token sums, and id checksum)."""
    from oakstore_spark.functions.text import token_count
    from oakstore_spark.operators.curation import target_mix_sample

    d = table(spark, sf_dir, "documents").withColumn(
        "toks", token_count("text")
    )
    kept = target_mix_sample(
        d, "lang", "doc_id", "toks", {"en": 0.5, "zh": 0.3, "de": 0.2}
    )
    return kept.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_kept"),
        F.sum("toks").cast("bigint").alias("kept_tokens"),
        F.sum("doc_id").cast("bigint").alias("id_checksum"),
    )


@register(
    "q_train_val_test_split",
    oracle="""
    WITH assigned AS (
      SELECT lang, doc_id,
             CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) < 'cc'
                  THEN 'train'
                  WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) < 'e6'
                  THEN 'val' ELSE 'test' END AS split
      FROM documents
    )
    SELECT lang, split,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(doc_id) AS BIGINT) AS id_checksum
    FROM assigned
    GROUP BY lang, split
    """,
)
def q_train_val_test_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic ~80/10/10 train/val/test assignment: the first md5
    byte of the doc id partitions the hash space at 0xcc (204/256) and
    0xe6 (230/256). Membership is a pure function of the id — map-side,
    stable across runs/engines/partitionings, and adding documents never
    reassigns existing ones (the property random splits lack)."""
    d = table(spark, sf_dir, "documents")
    b = F.substring(F.md5(F.encode(F.col("doc_id").cast("string"), "UTF-8")), 1, 2)
    assigned = d.select(
        "lang",
        "doc_id",
        F.when(b < "cc", "train").when(b < "e6", "val").otherwise("test").alias("split"),
    )
    return assigned.groupBy("lang", "split").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("doc_id").cast("bigint").alias("id_checksum"),
    )


@register(
    "q_term_pmi",
    oracle="""
    WITH docterms AS (
      SELECT DISTINCT doc_id, t AS term
      FROM documents, unnest(string_split(text, ' ')) AS u(t)
      WHERE t <> ''
    ), n_docs AS (
      SELECT CAST(count(DISTINCT doc_id) AS DOUBLE) AS n FROM docterms
    ), tf AS (
      SELECT term, count(*) AS df FROM docterms GROUP BY 1
    ), pairs AS (
      SELECT a.term AS term_a, b.term AS term_b, count(*) AS n_ab
      FROM docterms a JOIN docterms b
        ON a.doc_id = b.doc_id AND a.term < b.term
      GROUP BY 1, 2
    )
    SELECT term_a, term_b, CAST(n_ab AS BIGINT) AS n_ab,
           round(ln((n_ab / n) / ((fa.df / n) * (fb.df / n))), 4) AS pmi
    FROM pairs
    JOIN tf fa ON fa.term = term_a
    JOIN tf fb ON fb.term = term_b
    CROSS JOIN n_docs
    WHERE n_ab >= 50
    """,
)
def q_term_pmi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pointwise mutual information of term pairs co-occurring in the
    same document — the classic collocation/association score. Distinct
    doc-term pairs self-join PER DOCUMENT (never a global cross join;
    at 100 TB you additionally cap per-doc distinct terms and hash the
    pair key), document frequencies broadcast back onto the pair
    counts."""
    from pyspark.storagelevel import StorageLevel

    from oakstore_spark.operators.scaling import track_persisted

    d = table(spark, sf_dir, "documents")
    # r15 optimization (guide §2.3/§2.4): persist the distinct
    # doc-term relation — the n_docs count, the document frequencies
    # and BOTH legs of the per-document self-join consumed it, each
    # re-tokenizing the corpus (4 scans -> 1). Bounded by distinct
    # (doc, term) pairs, the same budget as the per-doc bigram persists.
    docterms = (
        d.select("doc_id", F.explode(F.split("text", " ")).alias("term"))
        .filter(F.col("term") != "")
        .distinct()
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    n_docs = docterms.select("doc_id").distinct().count()
    tf = docterms.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    a = docterms.select("doc_id", F.col("term").alias("term_a"))
    b = docterms.select("doc_id", F.col("term").alias("term_b"))
    pairs = (
        a.join(b, "doc_id")
        .filter(F.col("term_a") < F.col("term_b"))
        .groupBy("term_a", "term_b")
        .agg(F.count(F.lit(1)).alias("n_ab"))
        .filter(F.col("n_ab") >= 50)
    )
    fa = tf.select(F.col("term").alias("term_a"), F.col("df").alias("df_a"))
    fb = tf.select(F.col("term").alias("term_b"), F.col("df").alias("df_b"))
    n = float(n_docs)
    out = (
        pairs.join(F.broadcast(fa), "term_a")
        .join(F.broadcast(fb), "term_b")
        .select(
            "term_a",
            "term_b",
            F.col("n_ab").cast("bigint").alias("n_ab"),
            F.round(
                F.log(
                    (F.col("n_ab") / F.lit(n))
                    / ((F.col("df_a") / F.lit(n)) * (F.col("df_b") / F.lit(n)))
                ),
                4,
            ).alias("pmi"),
        )
    )
    return track_persisted(out, docterms)


@register(
    "q_span_dedup",
    oracle="""
    WITH t AS (
      SELECT doc_id,
             trim(regexp_replace(regexp_replace(lower(text),
                    '[^a-z0-9\\s]', '', 'g'), '\\s+', ' ', 'g')) AS nt
      FROM documents
    ), w AS (
      SELECT doc_id, str_split(nt, ' ') AS ws,
             greatest(CAST(ceil(len(str_split(nt, ' ')) / 8.0) AS BIGINT),
                      1) AS n_blocks
      FROM t
    ), b AS (
      SELECT doc_id,
             unnest(list_transform(range(0, n_blocks),
               i -> struct_pack(
                 bi := i,
                 bt := array_to_string(
                         list_slice(ws, CAST(i * 8 + 1 AS BIGINT),
                                    CAST(i * 8 + 8 AS BIGINT)), ' ')
               ))) AS s
      FROM w
    ), bx AS (
      SELECT doc_id, s.bi AS block_idx, s.bt AS block_text FROM b
    ), f AS (
      SELECT block_text, count(*) AS cnt,
             min(doc_id * 1048576 + block_idx) AS keeper
      FROM bx GROUP BY 1
    ), kept AS (
      SELECT bx.doc_id,
             string_agg(bx.block_text, ' ' ORDER BY bx.block_idx)
               AS clean_text,
             count(*) AS n_kept
      FROM bx JOIN f USING (block_text)
      WHERE f.cnt = 1 OR bx.doc_id * 1048576 + bx.block_idx = f.keeper
      GROUP BY bx.doc_id
    )
    SELECT w.doc_id,
           coalesce(k.clean_text, '') AS clean_text,
           w.n_blocks,
           coalesce(k.n_kept, 0) AS n_kept
    FROM w LEFT JOIN kept k USING (doc_id)
    """,
)
def q_span_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Span-level exact-substring dedup (Lee et al. ExactSubstr, word-
    block form): repeated 8-word blocks are cut from every document
    except their first corpus occurrence. Compared by the FULL
    reassembled text of every document, so one wrongly kept/cut block
    on either engine mismatches. See operators/dedup.py:span_dedup for
    the 100 TB plan shape (JVM block algebra, digest-only shuffle,
    doc_id reassembly)."""
    from oakstore_spark.operators.dedup import span_dedup

    d = table(spark, sf_dir, "documents")
    return span_dedup(d, "doc_id", "text", block_words=8)


def _bpe_oracle(n_merges: int = 16) -> str:
    """Full SQL replay of the ITERATIVE BPE training loop — DuckDB
    steps all 16 merge rounds as chained MATERIALIZED CTEs (inlining a
    twice-referenced level would expand 2^rounds — the pagerank-oracle
    lesson). Each word's symbol sequence is encoded as a pipe-joined
    string (symbols are [a-z0-9]+ or '</w>' — pipes unambiguous, the
    operator's own pair-key convention), so the greedy left-to-right
    non-overlapping merge application is a plain list_reduce string
    fold: the trailing symbol equals `left` iff the accumulator IS
    `left` or ends with '|'+`left`, and merging appends `right`
    WITHOUT the pipe. Pair counting replays the overlapping zip
    semantics via list_transform over adjacent positions; the argmax
    tie order (cnt desc, 'left|right' asc) is the operator's own."""
    norm = (
        "trim(regexp_replace(regexp_replace(lower(text), "
        "'[^a-z0-9\\s]', '', 'g'), '\\s+', ' ', 'g'))"
    )
    steps = []
    for k in range(1, n_merges + 1):
        steps.append(f"""
    pc{k} AS MATERIALIZED (
      SELECT p AS pair, CAST(sum(freq) AS BIGINT) AS cnt
      FROM (
        SELECT freq,
               unnest(list_transform(range(1, len(ls)),
                      i -> ls[i] || '|' || ls[i+1])) AS p
        FROM (SELECT freq, string_split(s, '|') AS ls FROM v{k-1})
      ) GROUP BY p
    ),
    m{k} AS MATERIALIZED (
      SELECT pair, cnt,
             string_split(pair, '|')[1] AS l,
             string_split(pair, '|')[2] AS r
      FROM pc{k} ORDER BY cnt DESC, pair ASC LIMIT 1
    ),
    v{k} AS MATERIALIZED (
      SELECT word, freq,
             list_reduce(string_split(s, '|'), (acc, x) ->
               CASE WHEN (acc = l OR acc LIKE '%|' || l) AND x = r
                    THEN acc || x ELSE acc || '|' || x END) AS s
      FROM v{k-1}, m{k}
    )""")
    finals = " UNION ALL ".join(
        f'SELECT CAST({k - 1} AS INT) AS rank, l AS "left", '
        f'r AS "right", cnt AS pair_freq FROM m{k}'
        for k in range(1, n_merges + 1)
    )
    return f"""
    WITH w0 AS MATERIALIZED (
      SELECT word, CAST(count(*) AS BIGINT) AS freq FROM (
        SELECT unnest(string_split({norm}, ' ')) AS word
        FROM documents
      ) WHERE len(word) > 0 GROUP BY word
    ),
    v0 AS MATERIALIZED (
      SELECT word, freq,
             regexp_replace(word, '(.)', '\\1|', 'g') || '</w>' AS s
      FROM w0
    ),{','.join(steps)}
    SELECT * FROM ({finals}) ORDER BY rank
    """


@register("q_bpe_train_merges", oracle=_bpe_oracle())
def q_bpe_train_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed BPE merge training (Sennrich et al.): learn the
    first 16 merges from the corpus. One corpus pass collapses to the
    (word, freq) vocabulary; the merge loop runs on the vocabulary only
    (driver fast path under the size gate, distributed explode+agg loop
    above it — operators/text.py:train_bpe). Deterministic: ties break
    on (count desc, 'left|right' asc), so the merge table is stable
    across engines and partitionings. RETIRED from rows-only into an
    exact ORACLE (r12): the iterative loop IS SQL-replayable — DuckDB
    steps all 16 rounds as materialized chained CTEs with the merge
    application as a pipe-string fold (see _bpe_oracle); every count is
    an exact BIGINT, so the whole merge table must match
    symbol-for-symbol. Single-node/distributed parity stays pinned in
    tests/test_curation.py."""
    from oakstore_spark.operators.text import train_bpe

    d = table(spark, sf_dir, "documents")
    merges, vocab = train_bpe(d, "text", n_merges=16)
    return merges


@register(
    "q_chi2_lang_source",
    oracle="""
    WITH obs AS (
      SELECT lang, source, CAST(count(*) AS DOUBLE) AS o
      FROM documents GROUP BY lang, source
    ), tot AS (
      SELECT sum(o) AS n FROM obs
    ), margins AS (
      SELECT o.lang, o.source, o.o,
             sum(o.o) OVER (PARTITION BY o.lang) AS row_tot,
             sum(o.o) OVER (PARTITION BY o.source) AS col_tot
      FROM obs o
    )
    SELECT round(sum(pow(o - row_tot * col_tot / n, 2)
                     / (row_tot * col_tot / n)), 4) AS chi2,
           CAST((count(DISTINCT lang) - 1)
                * (count(DISTINCT source) - 1) AS BIGINT) AS dof,
           CAST(sum(o) AS BIGINT) AS n_docs
    FROM margins, tot
    """,
)
def q_chi2_lang_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chi-squared independence test of the lang x source contingency
    table (is language distribution independent of corpus source? —
    the drift/stratification check run before mixing training data).
    One groupBy builds the observed table; expected counts come from
    window-sum margins over that TINY aggregate, so the corpus is
    scanned once regardless of table dimensions. Zero-count cells
    contribute nothing on either engine (absent rows = absent terms)."""
    d = table(spark, sf_dir, "documents")
    obs = d.groupBy("lang", "source").agg(
        F.count(F.lit(1)).cast("double").alias("o")
    )
    margins = (
        obs.withColumn("row_tot", F.sum("o").over(W.partitionBy("lang")))
        .withColumn("col_tot", F.sum("o").over(W.partitionBy("source")))
        .crossJoin(obs.agg(F.sum("o").alias("n")))
    )
    exp = F.col("row_tot") * F.col("col_tot") / F.col("n")
    return margins.agg(
        F.round(F.sum(F.pow(F.col("o") - exp, 2) / exp), 4).alias("chi2"),
        (
            (F.countDistinct("lang") - 1) * (F.countDistinct("source") - 1)
        )
        .cast("bigint")
        .alias("dof"),
        F.sum("o").cast("bigint").alias("n_docs"),
    )


@register(
    "q_ks_two_sample",
    oracle="""
    WITH s AS (
      SELECT value,
             CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS a,
             CASE WHEN event_type = 'view' THEN 1 ELSE 0 END AS b
      FROM events
      WHERE event_type IN ('purchase', 'view') AND value IS NOT NULL
    ), tot AS (
      SELECT CAST(sum(a) AS DOUBLE) AS na, CAST(sum(b) AS DOUBLE) AS nb
      FROM s
    ), ecdf AS (
      SELECT sum(a) OVER w / na AS fa, sum(b) OVER w / nb AS fb
      FROM s, tot
      WINDOW w AS (ORDER BY value
                   RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    )
    SELECT round(max(abs(fa - fb)), 6) AS ks_d,
           CAST(max(na) AS BIGINT) AS n_a,
           CAST(max(nb) AS BIGINT) AS n_b
    FROM ecdf, tot
    """,
)
def q_ks_two_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kolmogorov-Smirnov two-sample statistic (distribution drift
    between purchase and view values): both samples interleave into one
    ordered pass; a RANGE frame makes each cumulative count include ALL
    tied values, which is the correct right-continuous ECDF on both
    engines. NULL values are excluded up front — the same sample
    definition as the binned sibling ``ks_binned_stat`` (which drops
    NULL bins by construction), so the two agree on n_a/n_b and the
    bracket assertions hold even with nullable inputs; without the
    filter, nulls-ordered-first would also skew the exact ECDF. The
    ORDER BY value window is a global sort — the same documented
    exact-by-design caveat as q_percentiles; the deployment path for
    huge samples is binned ECDF on an approx-quantile grid."""
    e = table(spark, sf_dir, "events").where(
        F.col("event_type").isin("purchase", "view")
        & F.col("value").isNotNull()
    )
    s = e.select(
        "value",
        F.when(F.col("event_type") == "purchase", 1).otherwise(0).alias("a"),
        F.when(F.col("event_type") == "view", 1).otherwise(0).alias("b"),
    )
    tot = s.agg(
        F.sum("a").cast("double").alias("na"),
        F.sum("b").cast("double").alias("nb"),
    )
    w = W.orderBy("value").rangeBetween(W.unboundedPreceding, 0)
    ecdf = s.crossJoin(tot).select(
        (F.sum("a").over(w) / F.col("na")).alias("fa"),
        (F.sum("b").over(w) / F.col("nb")).alias("fb"),
        "na",
        "nb",
    )
    return ecdf.agg(
        F.round(F.max(F.abs(F.col("fa") - F.col("fb"))), 6).alias("ks_d"),
        F.max("na").cast("bigint").alias("n_a"),
        F.max("nb").cast("bigint").alias("n_b"),
    )


@register(
    "q_ks_binned",
    oracle="""
    WITH s AS (
      SELECT value AS v,
             CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS a,
             CASE WHEN event_type = 'view' THEN 1 ELSE 0 END AS b
      FROM events
      WHERE event_type IN ('purchase', 'view') AND value IS NOT NULL
    ), mm AS (
      SELECT min(v) AS lo, max(v) AS hi,
             CAST(sum(a) AS DOUBLE) AS na, CAST(sum(b) AS DOUBLE) AS nb
      FROM s
    ), binned AS (
      SELECT least(CAST(floor((v - lo) / ((hi - lo) / 256)) AS BIGINT),
                   255) AS bin,
             sum(a) AS ca, sum(b) AS cb
      FROM s, mm GROUP BY 1
    ), ecdf AS (
      SELECT sum(ca) OVER (ORDER BY bin ROWS BETWEEN UNBOUNDED PRECEDING
                           AND CURRENT ROW) / na AS fa,
             sum(cb) OVER (ORDER BY bin ROWS BETWEEN UNBOUNDED PRECEDING
                           AND CURRENT ROW) / nb AS fb,
             ca / na + cb / nb AS mass
      FROM binned, mm
    )
    SELECT round(max(abs(fa - fb)), 6) AS ks_d,
           CAST(na AS BIGINT) AS n_a,
           CAST(nb AS BIGINT) AS n_b,
           round(max(mass), 6) AS max_bin_mass
    FROM ecdf, mm GROUP BY na, nb
    """,
)
def q_ks_binned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binned-ECDF Kolmogorov-Smirnov — the DEPLOYMENT path for
    q_ks_two_sample's documented global-sort caveat (the same
    exact→sketch pattern as percentiles→KLL): one min/max+counts agg,
    one corpus-sized hash agg into ``n_bins`` fixed-width bins, then
    the ECDF difference evaluated at bin edges over the 256-row bin
    table (the only window runs on the AGGREGATED bins, like
    q_skew_profile's ranking — never the corpus). Provable bracket,
    pinned in tests/test_curation.py::test_ks_binned_brackets_exact:

        ks_d(binned) <= ks_d(exact) <= ks_d(binned) + max_bin_mass

    where ``max_bin_mass`` = max over bins of (share_a + share_b) —
    reported alongside the statistic so every answer carries its own
    error bound. ORACLE-exact (retired from rows-only): every float in
    the chain is engine-replayable — the bin width divides by the
    power-of-two bin count (exact), bin ids floor identical doubles,
    the ECDF divides exact integer cumsums by double counts in the
    same association, so DuckDB replays ks_d/max_bin_mass
    bit-for-bit."""
    e = table(spark, sf_dir, "events").where(
        F.col("event_type").isin("purchase", "view")
    )
    s = e.select(
        "value",
        F.when(F.col("event_type") == "purchase", 1).otherwise(0).alias("a"),
        F.when(F.col("event_type") == "view", 1).otherwise(0).alias("b"),
    )
    return ks_binned_stat(s, "value", "a", "b", n_bins=256)


@register(
    "q_skew_profile",
    oracle="""
    WITH c AS (
      SELECT user_id, count(*) AS cnt FROM events GROUP BY 1
    ), ranked AS (
      SELECT cnt,
             row_number() OVER (ORDER BY cnt DESC, user_id) AS rk,
             count(*) OVER () AS n_keys,
             sum(cnt) OVER () AS n_rows
      FROM c
    )
    SELECT CAST(max(n_rows) AS BIGINT) AS n_rows,
           CAST(max(n_keys) AS BIGINT) AS n_keys,
           CAST(max(cnt) AS BIGINT) AS max_cnt,
           round(max(cnt) * max(n_keys) / CAST(max(n_rows) AS DOUBLE), 4)
             AS skew_ratio,
           round(sum(CASE WHEN rk <= ceil(0.01 * n_keys) THEN cnt
                          ELSE 0 END) / CAST(max(n_rows) AS DOUBLE), 6)
             AS top1pct_share
    FROM ranked
    """,
)
def q_skew_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shuffle-key skew diagnostic — the pre-flight check before any
    large groupBy/join: per-key counts (one hash agg over the corpus),
    then max/avg ratio and the row share held by the hottest 1% of
    keys. At 100 TB the expensive part is the single count-by-key agg
    (map-side partial combine, tiny output); the ranking window runs
    over the ALREADY-AGGREGATED key table (n_keys rows, not n_rows),
    so the global sort it implies is on the small relation. A
    skew_ratio >> 1 or a fat top1pct_share says: salt this key or rely
    on AQE skew-join before shipping the pipeline."""
    e = table(spark, sf_dir, "events")
    c = e.groupBy("user_id").agg(F.count(F.lit(1)).alias("cnt"))
    ranked = c.select(
        "cnt",
        F.row_number().over(W.orderBy(F.desc("cnt"), "user_id")).alias("rk"),
        F.count(F.lit(1)).over(W.partitionBy()).alias("n_keys"),
        F.sum("cnt").over(W.partitionBy()).alias("n_rows"),
    )
    return ranked.agg(
        F.max("n_rows").cast("bigint").alias("n_rows"),
        F.max("n_keys").cast("bigint").alias("n_keys"),
        F.max("cnt").cast("bigint").alias("max_cnt"),
        F.round(
            F.max("cnt") * F.max("n_keys") / F.max("n_rows").cast("double"), 4
        ).alias("skew_ratio"),
        F.round(
            F.sum(
                F.when(
                    F.col("rk") <= F.ceil(0.01 * F.col("n_keys")), F.col("cnt")
                ).otherwise(F.lit(0))
            )
            / F.max("n_rows").cast("double"),
            6,
        ).alias("top1pct_share"),
    )


@register(
    "q_quality_weighted_sample",
    oracle="""
    WITH mx AS (
      SELECT CAST(max(n_chars) AS DOUBLE) AS max_chars FROM documents
    ), scored AS (
      SELECT lang,
             CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))
                  AS BIGINT) / 4294967296.0 AS u,
             n_chars / max_chars AS w
      FROM documents, mx
    )
    SELECT lang,
           count(*) AS n_total,
           CAST(sum(CASE WHEN u < w THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
           round(avg(CASE WHEN u < w THEN 1.0 ELSE 0.0 END), 6) AS kept_share
    FROM scored GROUP BY lang ORDER BY lang
    """,
)
def q_quality_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-weighted deterministic sampling — the curation move that
    upsamples high-quality documents without a shuffle or an RNG: each
    doc is kept with probability proportional to its quality weight
    (here n_chars / corpus max), decided by comparing the weight to a
    content-derived uniform u = first-8-md5-hex(doc_id) / 2^32. Fully
    map-side per doc (the max() is a 1-row broadcast), reproducible
    across engines AND across reruns at 100 TB — resampling a corpus
    never changes which docs survive, which keeps downstream caches and
    dedup indexes valid. md5 is pinned because Spark xxhash64 and
    DuckDB hash() differ (q_feature_hashing, training_ext.py)."""
    d = table(spark, sf_dir, "documents")
    mx = d.agg(F.max("n_chars").cast("double").alias("max_chars"))
    u = F.conv(
        F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10
    ).cast("double") / F.lit(4294967296.0)
    scored = d.crossJoin(F.broadcast(mx)).select(
        "lang",
        u.alias("u"),
        (F.col("n_chars") / F.col("max_chars")).alias("w"),
    )
    kept = F.when(F.col("u") < F.col("w"), 1).otherwise(0)
    return (
        scored.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_total"),
            F.sum(kept).cast("bigint").alias("n_kept"),
            F.round(F.avg(kept.cast("double")), 6).alias("kept_share"),
        )
        .orderBy("lang")
    )


@register(
    "q_source_overlap",
    oracle="""
    WITH tok AS (
      SELECT DISTINCT source, t AS term
      FROM documents, unnest(string_split(lower(text), ' ')) AS u(t)
      WHERE t <> ''
    ), sizes AS (
      SELECT source, count(*) AS n FROM tok GROUP BY 1
    ), inter AS (
      SELECT a.source AS src_a, b.source AS src_b, count(*) AS n_common
      FROM tok a JOIN tok b ON a.term = b.term AND a.source < b.source
      GROUP BY 1, 2
    )
    SELECT src_a, src_b, n_common,
           round(n_common / CAST(sa.n + sb.n - n_common AS DOUBLE), 6)
             AS jaccard
    FROM inter
    JOIN sizes sa ON sa.source = src_a
    JOIN sizes sb ON sb.source = src_b
    ORDER BY jaccard DESC, src_a, src_b LIMIT 30
    """,
)
def q_source_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-source vocabulary-overlap matrix — the contamination /
    redundancy diagnostic run before mixing corpus sources: distinct
    (source, term) pairs (one explode + distinct, shuffled by term),
    self-joined on term with source<source to count shared vocabulary,
    then Jaccard against per-source vocabulary sizes. The self-join is
    term-partitioned, so each term's source list meets locally; with S
    sources a term contributes at most S(S-1)/2 pairs — bounded by the
    (small) source count, not the corpus. The per-source size relation
    is S rows and broadcast. Top pairs by Jaccard surface sources that
    are near-mirrors of each other (crawl duplicates) before they
    double-count in the training mix."""
    from pyspark.storagelevel import StorageLevel

    from oakstore_spark.operators.scaling import track_persisted

    d = table(spark, sf_dir, "documents")
    # r15 optimization (guide §2.3/§2.4): persist the distinct
    # (source, term) relation — the size aggregate and BOTH legs of
    # the term self-join consumed it as unpersisted siblings, each
    # re-tokenizing the corpus (4 scans -> 1). Bounded by
    # sources x vocabulary, the per-doc-bigram persist budget.
    tok = (
        d.select(
            "source",
            F.explode(F.split(F.lower(F.col("text")), " ")).alias("term"),
        )
        .where(F.col("term") != "")
        .distinct()
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    sizes = tok.groupBy("source").agg(F.count(F.lit(1)).alias("n"))
    a = tok.alias("a")
    b = tok.alias("b")
    inter = (
        a.join(
            b,
            (F.col("a.term") == F.col("b.term"))
            & (F.col("a.source") < F.col("b.source")),
        )
        .groupBy(
            F.col("a.source").alias("src_a"), F.col("b.source").alias("src_b")
        )
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    sa = F.broadcast(sizes.select(F.col("source").alias("src_a"), F.col("n").alias("na")))
    sb = F.broadcast(sizes.select(F.col("source").alias("src_b"), F.col("n").alias("nb")))
    out = (
        inter.join(sa, "src_a")
        .join(sb, "src_b")
        .select(
            "src_a",
            "src_b",
            "n_common",
            F.round(
                F.col("n_common")
                / (F.col("na") + F.col("nb") - F.col("n_common")).cast(
                    "double"
                ),
                6,
            ).alias("jaccard"),
        )
        .orderBy(F.desc("jaccard"), "src_a", "src_b")
        .limit(30)
    )
    return track_persisted(out, tok)


@register(
    "q_spearman_corr",
    oracle="""
    WITH r AS (
      SELECT rank() OVER (ORDER BY l_quantity)
               + (count(*) OVER (PARTITION BY l_quantity) - 1) / 2.0 AS rx,
             rank() OVER (ORDER BY l_extendedprice)
               + (count(*) OVER (PARTITION BY l_extendedprice) - 1) / 2.0
               AS ry
      FROM lineitem
    )
    SELECT round(corr(rx, ry), 6) AS spearman_rho,
           count(*) AS n_rows
    FROM r
    """,
)
def q_spearman_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spearman rank correlation (monotonic association, robust to
    outliers where q_stats_agg's Pearson is not): Pearson over AVERAGE
    ranks, where average rank = min-rank + (tie_count-1)/2 — the
    standard tie correction, computed with a rank() window plus a
    count() partition window per variable. The two ORDER BY windows
    are global sorts (same exact-by-design caveat as q_percentiles);
    the deployment path at 100 TB is ranking on an approx-quantile
    grid, which turns each sort into a broadcast binary-search. The
    final corr() is a single-pass mergeable aggregate."""
    li = table(spark, sf_dir, "lineitem")
    rx = F.rank().over(W.orderBy("l_quantity")) + (
        F.count(F.lit(1)).over(W.partitionBy("l_quantity")) - 1
    ) / 2.0
    ry = F.rank().over(W.orderBy("l_extendedprice")) + (
        F.count(F.lit(1)).over(W.partitionBy("l_extendedprice")) - 1
    ) / 2.0
    r = li.select(rx.alias("rx"), ry.alias("ry"))
    return r.agg(
        F.round(F.corr("rx", "ry"), 6).alias("spearman_rho"),
        F.count(F.lit(1)).alias("n_rows"),
    )


@register(
    "q_mann_whitney",
    oracle="""
    WITH s AS (
      SELECT value,
             CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS a
      FROM events WHERE event_type IN ('purchase', 'view')
    ), r AS (
      SELECT a,
             rank() OVER (ORDER BY value)
               + (count(*) OVER (PARTITION BY value) - 1) / 2.0 AS rk
      FROM s
    ), agg AS (
      SELECT CAST(sum(a) AS DOUBLE) AS na,
             CAST(sum(1 - a) AS DOUBLE) AS nb,
             sum(CASE WHEN a = 1 THEN rk ELSE 0 END) AS ra
      FROM r
    )
    SELECT round(ra - na * (na + 1) / 2, 2) AS u_stat,
           CAST(na AS BIGINT) AS n_a,
           CAST(nb AS BIGINT) AS n_b,
           round(((ra - na * (na + 1) / 2) - na * nb / 2)
                 / sqrt(na * nb * (na + nb + 1) / 12.0), 6) AS z_approx
    FROM agg
    """,
)
def q_mann_whitney(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mann-Whitney U rank-sum test (nonparametric sibling of
    q_ks_two_sample, for 'does one group stochastically dominate'):
    average ranks over the pooled sample, U from the rank sum of group
    A, plus the large-sample normal z approximation. One ORDER BY
    window over the pooled values (exact-by-design global sort, same
    caveat family as q_percentiles) and one tiny final aggregate. The
    tie-corrected average rank uses the same rank()+count() windows as
    q_spearman_corr."""
    e = table(spark, sf_dir, "events").where(
        F.col("event_type").isin("purchase", "view")
    )
    s = e.select(
        "value",
        F.when(F.col("event_type") == "purchase", 1).otherwise(0).alias("a"),
    )
    rk = F.rank().over(W.orderBy("value")) + (
        F.count(F.lit(1)).over(W.partitionBy("value")) - 1
    ) / 2.0
    r = s.select("a", rk.alias("rk"))
    agg = r.agg(
        F.sum("a").cast("double").alias("na"),
        F.sum(1 - F.col("a")).cast("double").alias("nb"),
        F.sum(F.when(F.col("a") == 1, F.col("rk")).otherwise(0.0)).alias("ra"),
    )
    u = F.col("ra") - F.col("na") * (F.col("na") + 1) / 2
    return agg.select(
        F.round(u, 2).alias("u_stat"),
        F.col("na").cast("bigint").alias("n_a"),
        F.col("nb").cast("bigint").alias("n_b"),
        F.round(
            (u - F.col("na") * F.col("nb") / 2)
            / F.sqrt(
                F.col("na") * F.col("nb") * (F.col("na") + F.col("nb") + 1) / 12.0
            ),
            6,
        ).alias("z_approx"),
    )


@register(
    "q_token_budget_carve",
    oracle="""
    WITH t AS (
      SELECT doc_id, lang,
             len(regexp_extract_all(trim(text), '\\S+')) AS n_tokens
      FROM documents
    ), c AS (
      SELECT doc_id, lang, n_tokens,
             sum(n_tokens) OVER (
               PARTITION BY lang
               ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
             ) AS cum_tokens
      FROM t
    )
    SELECT doc_id, lang,
           CAST(n_tokens AS BIGINT) AS n_tokens,
           CAST(cum_tokens AS BIGINT) AS cum_tokens
    FROM c
    WHERE cum_tokens - n_tokens < 3000
    """,
)
def q_token_budget_carve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-budget corpus carving: per language, admit documents in a
    deterministic md5-shuffled order until ~3000 tokens are taken (a doc
    is admitted iff the budget is not yet exhausted when it arrives —
    the standard way training mixes pin per-source token budgets rather
    than doc counts). One per-stratum running-sum window; membership is
    a pure function of the data, so reruns and engines agree on the
    exact kept set. At scale the window shuffles only (lang) strata —
    same shape as q_fixed_count_sample but budgeted in tokens."""
    from oakstore_spark.functions.text import token_count

    d = table(spark, sf_dir, "documents")
    t = d.select("doc_id", "lang", token_count("text").alias("n_tokens"))
    win = (
        W.partitionBy("lang")
        .orderBy(F.md5(F.encode(F.col("doc_id").cast("string"), "UTF-8")), "doc_id")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    c = t.withColumn("cum_tokens", F.sum("n_tokens").over(win))
    return c.where(F.col("cum_tokens") - F.col("n_tokens") < 3000).select(
        "doc_id", "lang", "n_tokens", "cum_tokens"
    )


@register(
    "q_weighted_reservoir",
    oracle="""
    WITH keyed AS (
      SELECT doc_id, lang, n_chars + 1 AS w,
             ln((CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))
                 AS BIGINT) + 1) / 4294967296.0) / (n_chars + 1) AS k
      FROM documents
    )
    SELECT doc_id, lang, CAST(w AS BIGINT) AS w,
           CAST(row_number() OVER (ORDER BY k DESC, doc_id) AS INT) AS rk
    FROM keyed
    ORDER BY k DESC, doc_id
    LIMIT 50
    """,
)
def q_weighted_reservoir(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted sampling WITHOUT replacement (Efraimidis-Spirakis
    A-ES): each row gets key ln(u)/w with u an md5-derived uniform, and
    the K largest keys are the sample — inclusion probability
    proportional to weight, no replacement, and (because u is a pure
    function of the row key) fully deterministic and engine-replayable,
    unlike rand()-based reservoirs. Complements the Bernoulli
    quality-weighted sampler (independent keeps, random size) with the
    exact-size-K variant. Map-side keys + TakeOrderedAndProject — no
    global sort, no reservoir state. The ln/divide expression is
    written identically in both engines so the ranking agrees
    bit-for-bit."""
    d = table(spark, sf_dir, "documents")
    w = (F.col("n_chars") + 1).cast("bigint")
    h = F.conv(
        F.substring(F.md5(F.encode(F.col("doc_id").cast("string"), "UTF-8")), 1, 8),
        16,
        10,
    ).cast("bigint")
    k = F.log((h + 1) / F.lit(4294967296.0)) / w
    keyed = d.select("doc_id", "lang", w.alias("w"), k.alias("k"))
    return (
        keyed.orderBy(F.desc("k"), "doc_id")
        .limit(50)
        .select(
            "doc_id",
            "lang",
            "w",
            F.row_number()
            .over(W.orderBy(F.desc("k"), "doc_id"))
            .cast("int")
            .alias("rk"),
        )
    )


@register("q_quality_classifier")
def q_quality_classifier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Model-based quality filtering trained IN-ENGINE: a logistic
    regression fit by distributed IRLS (operators/curation.
    fit_logistic_irls — per iteration one scan producing a k x k Gram
    partial-aggregate, driver solves) on simple text features, with the
    label a held-out rule (above-median doc length). The fitted model
    then scores the corpus and the query reports per-lang accuracy +
    score mass. Rows-only (an iterative fit is not SQL-expressible);
    planted-rule recovery is pinned in
    tests/test_curation.py::test_irls_recovers_planted_rule."""
    from oakstore_spark.operators.curation import fit_logistic_irls

    d = table(spark, sf_dir, "documents")
    med = d.agg(F.expr("percentile(n_chars, 0.5)").alias("med"))
    feats = d.crossJoin(F.broadcast(med)).select(
        "doc_id",
        "lang",
        (F.length("text") / 1000.0).alias("f_len"),
        (
            F.regexp_count("text", F.lit(r"[^a-zA-Z0-9\s]")).cast("double")
            / (F.length("text") + 1)
        ).alias("f_punct"),
        (F.col("n_chars") > F.col("med")).cast("double").alias("y"),
    )
    # pin the featurized rows: IRLS scans them once PER ITERATION and
    # the scoring pass once more — without the pin each scan re-runs
    # the regexp featurization over the corpus. Lazy localCheckpoint
    # (materialized by IRLS's first collect), NOT persist(): the blocks
    # are ContextCleaner-released when the plan is GC'd, so repeated
    # invocations outside bench's clearCache don't leak executor
    # storage. 4 iterations: Newton/IRLS is quadratically convergent,
    # and for this 3-parameter fit the decision boundary (all the query
    # reports) is stable by iteration 3 — the planted-rule recovery
    # contract is pinned separately in
    # tests/test_curation.py::test_irls_recovers_planted_rule
    feats = feats.localCheckpoint(eager=False)
    w = fit_logistic_irls(feats, ["f_len", "f_punct"], "y", n_iter=4)
    eta = (
        F.lit(float(w[0]))
        + F.lit(float(w[1])) * F.col("f_len")
        + F.lit(float(w[2])) * F.col("f_punct")
    )
    scored = feats.withColumn("p", F.lit(1.0) / (F.lit(1.0) + F.exp(-eta)))
    return scored.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(
            (F.col("y") == (F.col("p") > 0.5).cast("double")).cast("int")
        ).alias("n_correct"),
    )


@register(
    "q_benford_digits",
    oracle="""
    WITH d AS (
      SELECT event_type,
             CAST(substr(CAST(CAST(round(value * 100) AS BIGINT) AS VARCHAR),
                         1, 1) AS INT) AS digit
      FROM events
      WHERE CAST(round(value * 100) AS BIGINT) >= 1
    ), o AS (
      SELECT event_type, digit, count(*) AS obs FROM d GROUP BY 1, 2
    ), n AS (
      SELECT event_type, sum(obs) AS n FROM o GROUP BY 1
    )
    SELECT o.event_type,
           CAST(n.n AS BIGINT) AS n_values,
           round(sum(pow(obs - n.n * log10(1.0 + 1.0 / digit), 2)
                     / (n.n * log10(1.0 + 1.0 / digit))), 4) AS chi2
    FROM o JOIN n ON o.event_type = n.event_type
    GROUP BY o.event_type, n.n
    """,
)
def q_benford_digits(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford's-law forensics: the first-significant-digit distribution
    of each event type's values against the log10(1+1/d) expectation,
    summarized as a chi-square statistic — the classic screen for
    fabricated or truncated numeric feeds in data-quality audits. The
    first digit comes from the INTEGER cents' decimal string (identical
    formatting in both engines — no float log10 edge cases at powers of
    ten), so digit counts are exact and the statistic is a
    deterministic formula over them. Two tiny aggregations; the scan is
    the only corpus-sized work."""
    e = table(spark, sf_dir, "events")
    cents = F.round(F.col("value") * 100).cast("bigint")
    d = e.select(
        "event_type",
        F.substring(cents.cast("string"), 1, 1).cast("int").alias("digit"),
    ).where(cents >= 1)
    o = d.groupBy("event_type", "digit").agg(F.count(F.lit(1)).alias("obs"))
    n = o.groupBy("event_type").agg(F.sum("obs").alias("n"))
    exp = F.col("n") * F.log10(F.lit(1.0) + F.lit(1.0) / F.col("digit"))
    return (
        o.join(n, "event_type")
        .groupBy("event_type", "n")
        .agg(
            F.round(F.sum(F.pow(F.col("obs") - exp, 2) / exp), 4).alias("chi2")
        )
        .select(
            "event_type", F.col("n").cast("bigint").alias("n_values"), "chi2"
        )
    )


@register(
    "q_dataset_fingerprint",
    oracle="""
    SELECT 'documents' AS tbl,
           CAST(count(*) AS BIGINT) AS n_rows,
           CAST(sum(CAST(('0x' || substr(md5(
                 CAST(doc_id AS VARCHAR) || '|' || lang || '|' || source
                 || '|' || CAST(n_chars AS VARCHAR) || '|' || md5(text)),
                 1, 15)) AS BIGINT)) % 4611686018427387904 AS BIGINT)
             AS checksum
    FROM documents
    UNION ALL
    SELECT 'events',
           CAST(count(*) AS BIGINT),
           CAST(sum(CAST(('0x' || substr(md5(
                 CAST(event_id AS VARCHAR) || '|' || CAST(user_id AS VARCHAR)
                 || '|' || event_type || '|'
                 || CAST(CAST(round(value * 100) AS BIGINT) AS VARCHAR)),
                 1, 15)) AS BIGINT)) % 4611686018427387904 AS BIGINT)
    FROM events
    """,
)
def q_dataset_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Content-addressable dataset fingerprinting: an ORDER-INDEPENDENT
    checksum (sum of per-row md5-derived bigints over a canonical '|'
    serialization) plus the row count, per table — how two pipeline
    runs prove they produced the IDENTICAL dataset without sorting or
    diffing 100 TB (commutative sum => any partitioning/order gives the
    same value; any changed/dropped/added row almost surely changes
    it). Floats enter as integer cents and text as its md5 so the
    serialization is engine-exact; accumulation runs in exact
    DECIMAL(38) (HUGEINT on the oracle) and folds to bigint with one
    modulus so no row count can overflow it. Map-side hash + one
    single-row agg per table."""
    d = table(spark, sf_dir, "documents")
    e = table(spark, sf_dir, "events")

    def row_hash(*cols):
        key = F.concat_ws("|", *cols)
        return F.conv(F.substring(F.md5(F.encode(key, "UTF-8")), 1, 15), 16, 10).cast(
            "bigint"
        )

    docs = d.select(
        row_hash(
            F.col("doc_id").cast("string"),
            "lang",
            "source",
            F.col("n_chars").cast("string"),
            F.md5(F.encode("text", "UTF-8")),
        ).alias("h")
    ).agg(
        F.lit("documents").alias("tbl"),
        F.count(F.lit(1)).alias("n_rows"),
        (F.sum(F.col("h").cast("decimal(38,0)")) % F.lit(4611686018427387904))
        .cast("bigint")
        .alias("checksum"),
    )
    evs = e.select(
        row_hash(
            F.col("event_id").cast("string"),
            F.col("user_id").cast("string"),
            "event_type",
            F.round(F.col("value") * 100).cast("bigint").cast("string"),
        ).alias("h")
    ).agg(
        F.lit("events").alias("tbl"),
        F.count(F.lit(1)).alias("n_rows"),
        (F.sum(F.col("h").cast("decimal(38,0)")) % F.lit(4611686018427387904))
        .cast("bigint")
        .alias("checksum"),
    )
    return docs.unionByName(evs).select("tbl", "n_rows", "checksum")


@register(
    "q_psi_drift",
    oracle="""
    WITH binned AS (
      SELECT CASE WHEN source IN ('src0','src1','src2') THEN 'a' ELSE 'b' END AS grp,
             least(CAST(n_chars // 200 AS INT), 9) AS bin
      FROM documents
    ), counts AS (
      SELECT grp, bin, count(*) AS c FROM binned GROUP BY 1, 2
    ), tot AS (
      SELECT sum(CASE WHEN grp = 'a' THEN c ELSE 0 END) AS na,
             sum(CASE WHEN grp = 'b' THEN c ELSE 0 END) AS nb
      FROM counts
    ), wide AS (
      SELECT bin,
             greatest(sum(CASE WHEN grp = 'a' THEN c ELSE 0 END), 1) AS ca,
             greatest(sum(CASE WHEN grp = 'b' THEN c ELSE 0 END), 1) AS cb
      FROM counts GROUP BY bin
    )
    SELECT CAST(count(*) AS BIGINT) AS n_bins,
           round(sum((ca / CAST(na AS DOUBLE) - cb / CAST(nb AS DOUBLE))
                 * ln((ca / CAST(na AS DOUBLE))
                      / (cb / CAST(nb AS DOUBLE)))), 6) AS psi
    FROM wide, tot
    """,
)
def q_psi_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population Stability Index between one source cohort and the
    rest of the corpus over binned document lengths — THE industry drift
    gauge (PSI < 0.1 stable, > 0.25 shifted), completing the drift
    family next to KS (continuous) and chi-square (categorical). Fixed
    200-char floor-division bins capped at 10; a side missing from a
    bin floors at count 1 (the standard PSI smoothing keeping the log
    finite). Everything past the binning scan is a tiny exact-integer
    aggregate; the (pa-pb)*ln(pa/pb) terms use the identical division
    order in both engines."""
    d = table(spark, sf_dir, "documents")
    binned = d.select(
        F.when(F.col("source").isin("src0", "src1", "src2"), "a")
        .otherwise("b").alias("grp"),
        F.least(F.floor(F.col("n_chars") / 200).cast("int"), F.lit(9)).alias("bin"),
    )
    counts = binned.groupBy("grp", "bin").agg(F.count(F.lit(1)).alias("c"))
    tot = counts.agg(
        F.sum(F.when(F.col("grp") == "a", F.col("c")).otherwise(0)).alias("na"),
        F.sum(F.when(F.col("grp") == "b", F.col("c")).otherwise(0)).alias("nb"),
    )
    wide = counts.groupBy("bin").agg(
        F.greatest(
            F.sum(F.when(F.col("grp") == "a", F.col("c")).otherwise(0)), F.lit(1)
        ).alias("ca"),
        F.greatest(
            F.sum(F.when(F.col("grp") == "b", F.col("c")).otherwise(0)), F.lit(1)
        ).alias("cb"),
    )
    pa = F.col("ca") / F.col("na").cast("double")
    pb = F.col("cb") / F.col("nb").cast("double")
    return (
        wide.crossJoin(F.broadcast(tot))
        .select(((pa - pb) * F.log(pa / pb)).alias("term"))
        .agg(
            F.count(F.lit(1)).alias("n_bins"),
            F.round(F.sum("term"), 6).alias("psi"),
        )
    )


@register(
    "q_heldout_perplexity",
    oracle="""
    WITH split AS (
      SELECT doc_id, text,
             substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) < '8' AS is_train
      FROM documents
    ), tok AS (
      SELECT doc_id, is_train, t AS term
      FROM split, unnest(string_split(text, ' ')) AS u(t)
      WHERE t <> ''
    ), tf AS (
      SELECT term, count(*) AS n FROM tok WHERE is_train GROUP BY 1
    ), tot AS (
      SELECT sum(n) AS t, count(*) AS v FROM tf
    )
    SELECT CAST(count(*) AS BIGINT) AS n_eval_tokens,
           round(avg(ln((coalesce(n, 0) + 1) / (t + v + 1.0))), 4)
             AS avg_logprob
    FROM tok LEFT JOIN tf USING (term), tot
    WHERE NOT is_train
    """,
)
def q_heldout_perplexity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HELD-OUT language-model evaluation — the honest version of the
    in-corpus LM scores: unigram counts are fit on a deterministic
    md5-hash 50/50-ish train split (first hex nibble < '8') and the
    EVAL split is scored under add-one (Laplace) smoothing, so unseen
    eval tokens contribute ln(1/(T+V+1)) instead of crashing the score
    — the train/eval hygiene every data-quality perplexity gate needs.
    Same scale shape as unigram_logprob (vocab-sized count relation
    joined onto the eval token stream); the split predicate is a pure
    row-key function so both engines fit on the identical corpus."""
    from pyspark.storagelevel import StorageLevel

    from oakstore_spark.operators.scaling import track_persisted

    d = table(spark, sf_dir, "documents")
    is_train = (
        F.substring(
            F.md5(F.encode(F.col("doc_id").cast("string"), "UTF-8")), 1, 1
        )
        < "8"
    )
    tok = d.select(
        is_train.alias("is_train"),
        F.explode(F.split(F.col("text"), " ")).alias("term"),
    ).where(F.col("term") != "")
    # r15 optimization (guide §2.3/§2.4): persist the VOCAB-sized
    # train-split count relation — the totals row and the eval-side
    # join consumed it as unpersisted siblings, each re-tokenizing
    # the corpus (3 scans -> 2: train fit + eval score, which stay
    # separate by the held-out design).
    tf = (
        tok.where("is_train")
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("n"))
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    tot = tf.agg(F.sum("n").alias("t"), F.count(F.lit(1)).alias("v"))
    out = (
        tok.where(~F.col("is_train"))
        .join(tf, "term", "left")
        .crossJoin(F.broadcast(tot))
        .agg(
            F.count(F.lit(1)).alias("n_eval_tokens"),
            F.round(
                F.avg(
                    F.log(
                        (F.coalesce(F.col("n"), F.lit(0)) + 1)
                        / (F.col("t") + F.col("v") + F.lit(1.0))
                    )
                ),
                4,
            ).alias("avg_logprob"),
        )
    )
    return track_persisted(out, tf)


@register(
    "q_pii_detect_luhn",
    oracle="""
    SELECT doc_id,
           1 AS n_emails, 1 AS n_phones,
           CASE WHEN doc_id % 2 = 0 THEN 1 ELSE 0 END AS n_ipv4,
           1 AS n_card_candidates,
           CASE WHEN doc_id % 3 = 0 THEN 1 ELSE 0 END AS n_cards_valid,
           TRUE AS has_pii,
           'contact <EMAIL> call <PHONE> from '
             || CASE WHEN doc_id % 2 = 0
                     THEN '<IP>'
                     ELSE '999.1.2.777' END
             || ' card '
             || CASE WHEN doc_id % 3 = 0
                     THEN '<CARD>'
                     ELSE '4532 0151 1283 0367' END
             || ' end' AS redacted
    FROM documents
    """,
)
def q_pii_detect_luhn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The FULL PII family (operators/pii.py) under a planted closed-
    form oracle: every doc carries one email, one phone, an IPv4 that
    is range-valid only for even docs (odd docs get 999.1.2.777, which
    the octet-validated regex must NOT match), and a 16-digit card that
    passes Luhn only for doc_id % 3 == 0 (the other docs carry the same
    number with the check digit flipped — a bare digit regex can't tell
    them apart, the checksum must). Counts AND the fully redacted text
    are both stated closed-form: a false positive, a missed match, or
    a wrong redaction order breaks the hash. All JVM (regexp + aggregate
    HOF Luhn), map-side only."""
    from oakstore_spark.operators.pii import detect_pii, redact_pii_all

    d = table(spark, sf_dir, "documents").select("doc_id")
    planted = d.select(
        "doc_id",
        F.concat(
            F.lit("contact user"),
            F.col("doc_id").cast("string"),
            F.lit("@example.com call 555-"),
            F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
            F.lit(" from "),
            F.when(
                F.col("doc_id") % 2 == 0,
                F.concat(
                    F.lit("192.168."),
                    (F.col("doc_id") % 256).cast("string"),
                    F.lit("."),
                    (F.col("doc_id") % 100).cast("string"),
                ),
            ).otherwise(F.lit("999.1.2.777")),
            F.lit(" card "),
            F.when(
                F.col("doc_id") % 3 == 0, F.lit("4532 0151 1283 0366")
            ).otherwise(F.lit("4532 0151 1283 0367")),
            F.lit(" end"),
        ).alias("text"),
    )
    out = detect_pii(planted, "text")
    return out.select(
        "doc_id",
        "n_emails",
        "n_phones",
        "n_ipv4",
        "n_card_candidates",
        "n_cards_valid",
        "has_pii",
        redact_pii_all("text").alias("redacted"),
    )


@register(
    "q_label_vote",
    oracle="""
    WITH f AS (
      SELECT doc_id,
             CASE WHEN lang = 'en' THEN 1 ELSE 0 END
               + CASE WHEN n_chars >= 150 THEN 1 ELSE 0 END AS n1,
             CASE WHEN n_chars < 150 THEN 1 ELSE 0 END
               + CASE WHEN doc_id % 3 = 0 THEN 1 ELSE 0 END AS n0
      FROM documents
    )
    SELECT doc_id,
           CAST(CASE WHEN n1 > n0 THEN 1 ELSE 0 END AS INT) AS vote,
           CAST(n1 + n0 AS INT) AS n_votes,
           CAST(CASE WHEN n1 > 0 THEN 1 ELSE 0 END
                + CASE WHEN n0 > 0 THEN 1 ELSE 0 END AS INT) AS n_distinct,
           (n1 > 0 AND n0 > 0) AS conflict
    FROM f
    """,
)
def q_label_vote(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weak supervision end-to-end: three labeling functions over REAL
    document fields (lang='en' -> 1; n_chars >= 150 -> 1 else 0;
    doc_id % 3 == 0 -> 0; abstain elsewhere) combined by majority vote
    with the smallest-label tie-break. The oracle recomputes the vote
    tallies in closed form — since every positive vote here is label 1
    and every negative is label 0, majority+tie-to-smallest reduces to
    ``n1 > n0``, and the operator's HOF argmax must agree on every
    row, including ties and conflicts."""
    from oakstore_spark.operators.labeling import apply_label_functions

    d = table(spark, sf_dir, "documents").select(
        "doc_id", "lang", "n_chars"
    )
    lfs = {
        "lf_en": F.when(F.col("lang") == "en", F.lit(1)),
        "lf_len": F.when(F.col("n_chars") >= 150, F.lit(1)).otherwise(
            F.lit(0)
        ),
        "lf_mod": F.when(F.col("doc_id") % 3 == 0, F.lit(0)),
    }
    out = apply_label_functions(d, lfs)
    return out.select("doc_id", "vote", "n_votes", "n_distinct", "conflict")


@register(
    "q_lf_diagnostics",
    oracle="""
    WITH f AS (
      SELECT doc_id,
             lang = 'en' AS v0,
             TRUE AS v1,
             doc_id % 3 = 0 AS v2,
             CASE WHEN lang = 'en' THEN 1 ELSE 0 END
               + CASE WHEN n_chars >= 150 THEN 1 ELSE 0 END AS n1,
             CASE WHEN n_chars < 150 THEN 1 ELSE 0 END
               + CASE WHEN doc_id % 3 = 0 THEN 1 ELSE 0 END AS n0
      FROM documents
    ), d AS (
      SELECT *,
             n1 + n0 AS nv,
             CASE WHEN n1 > 0 THEN 1 ELSE 0 END
               + CASE WHEN n0 > 0 THEN 1 ELSE 0 END AS nd
      FROM f
    ), t AS (SELECT count(*) AS total FROM documents)
    SELECT lf_idx,
           CAST(n_voted AS BIGINT) AS n_voted,
           CAST(n_overlap AS BIGINT) AS n_overlap,
           CAST(n_conflict AS BIGINT) AS n_conflict,
           CAST(n_voted AS DOUBLE) / total AS coverage,
           CAST(n_overlap AS DOUBLE) / total AS overlap,
           CAST(n_conflict AS DOUBLE) / total AS conflict_rate
    FROM (
      SELECT 0 AS lf_idx,
             sum(CASE WHEN v0 THEN 1 ELSE 0 END) AS n_voted,
             sum(CASE WHEN v0 AND nv > 1 THEN 1 ELSE 0 END) AS n_overlap,
             sum(CASE WHEN v0 AND nd > 1 THEN 1 ELSE 0 END) AS n_conflict
      FROM d
      UNION ALL
      SELECT 1,
             sum(CASE WHEN v1 THEN 1 ELSE 0 END),
             sum(CASE WHEN v1 AND nv > 1 THEN 1 ELSE 0 END),
             sum(CASE WHEN v1 AND nd > 1 THEN 1 ELSE 0 END)
      FROM d
      UNION ALL
      SELECT 2,
             sum(CASE WHEN v2 THEN 1 ELSE 0 END),
             sum(CASE WHEN v2 AND nv > 1 THEN 1 ELSE 0 END),
             sum(CASE WHEN v2 AND nd > 1 THEN 1 ELSE 0 END)
      FROM d
    ) CROSS JOIN t
    """,
)
def q_lf_diagnostics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-labeling-function health metrics (coverage / overlap /
    conflict) over the same three rules as q_label_vote — one
    posexplode + groupBy, total via a broadcast 1-row aggregate, rates
    as single IEEE divisions of exact counts. The oracle tallies each
    rule's fire/overlap/conflict sets independently."""
    from oakstore_spark.operators.labeling import (
        apply_label_functions,
        label_function_diagnostics,
    )

    d = table(spark, sf_dir, "documents").select(
        "doc_id", "lang", "n_chars"
    )
    lfs = {
        "lf_en": F.when(F.col("lang") == "en", F.lit(1)),
        "lf_len": F.when(F.col("n_chars") >= 150, F.lit(1)).otherwise(
            F.lit(0)
        ),
        "lf_mod": F.when(F.col("doc_id") % 3 == 0, F.lit(0)),
    }
    return label_function_diagnostics(apply_label_functions(d, lfs))


@register(
    "q_kneser_ney_lm",
    oracle=f"""
    WITH w AS (
      SELECT doc_id, string_split({_NORM}, ' ') AS ws FROM documents
    ), bg AS (
      SELECT doc_id,
             unnest(list_transform(range(1, len(ws)), i -> ws[i])) AS w1,
             unnest(list_transform(range(1, len(ws)), i -> ws[i + 1])) AS w2
      FROM w WHERE len(ws) >= 2
    ), bc AS (
      SELECT w1, w2, count(*) AS cb FROM bg GROUP BY 1, 2
    ), ctx AS (
      SELECT w1, CAST(sum(cb) AS BIGINT) AS c1,
             CAST(count(*) AS BIGINT) AS n1f
      FROM bc GROUP BY 1
    ), cont AS (
      SELECT w2, CAST(count(*) AS BIGINT) AS n1b FROM bc GROUP BY 1
    ), btot AS (
      SELECT CAST(count(*) AS BIGINT) AS bt FROM bc
    )
    SELECT doc_id,
           CAST(count(*) AS BIGINT) AS n_bigrams,
           round(avg(ln(
             (greatest(cb - 0.75, 0.0)
              + (0.75 * n1f) * (n1b / bt)) / c1
           )), 4) AS avg_logprob
    FROM bg
    JOIN bc USING (w1, w2)
    JOIN ctx USING (w1)
    JOIN cont USING (w2), btot
    GROUP BY doc_id
    """,
)
def q_kneser_ney_lm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interpolated Kneser-Ney bigram LM document scoring — the top
    rung of the cheap-LM quality ladder (unigram -> Jelinek-Mercer ->
    KN): absolute discounting D=0.75 with the CONTINUATION back-off
    distribution (how many distinct contexts a word follows, not how
    often it occurs). All counts exact integers from ONE bigram-count
    relation; the oracle steps the identical float tree, so values
    agree to the rounded digit."""
    from oakstore_spark.functions.text import normalize_text
    from oakstore_spark.operators.curation import kneser_ney_logprob

    d = table(spark, sf_dir, "documents")
    norm = d.select("doc_id", normalize_text("text").alias("text"))
    out = kneser_ney_logprob(norm)
    return out.select(
        "doc_id",
        "n_bigrams",
        F.round("avg_logprob", 4).alias("avg_logprob"),
    )


@register(
    "q_zipf_fit",
    oracle=f"""
    WITH toks AS (
      SELECT unnest(string_split({_NORM}, ' ')) AS term FROM documents
    ), freq AS (
      SELECT term, CAST(count(*) AS BIGINT) AS f
      FROM toks WHERE term != '' GROUP BY 1
    ), ranked AS (
      SELECT term, f,
             row_number() OVER (ORDER BY f DESC, term) AS r
      FROM freq
    )
    SELECT CAST(count(*) AS BIGINT) AS n_terms,
           round(regr_slope(ln(f), ln(r)), 6) AS zipf_slope,
           round(regr_intercept(ln(f), ln(r)), 4) AS intercept,
           round(regr_r2(ln(f), ln(r)), 6) AS r2
    FROM ranked
    """,
)
def q_zipf_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zipf's-law fit of the corpus unigram distribution: OLS of
    ln(frequency) on ln(rank) via the single-pass regr_* aggregate
    family — natural text lands near slope -1, so the slope (plus r2)
    is a cheap corpus-health gauge (template spam and synthetic
    boilerplate bend it). Heavy lifting is ONE vocab-sized hash agg;
    the ranking window runs over the tiny term-frequency relation.
    Ties in rank are pinned (freq desc, term asc) in both engines."""
    from oakstore_spark.functions.text import normalize_text
    from pyspark.sql import Window as _W

    d = table(spark, sf_dir, "documents")
    toks = d.select(
        F.explode(F.split(normalize_text("text"), " ")).alias("term")
    ).where(F.col("term") != "")
    freq = toks.groupBy("term").agg(F.count(F.lit(1)).alias("f"))
    ranked = freq.withColumn(
        "r", F.row_number().over(_W.orderBy(F.desc("f"), "term"))
    )
    x = F.log("r")
    y = F.log("f")
    return ranked.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_terms"),
        F.round(F.regr_slope(y, x), 6).alias("zipf_slope"),
        F.round(F.regr_intercept(y, x), 4).alias("intercept"),
        F.round(F.regr_r2(y, x), 6).alias("r2"),
    )


@register(
    "q_temperature_mix",
    oracle="""
    WITH d AS (
      SELECT doc_id,
             CASE WHEN doc_id % 16 < 8 THEN 'web'
                  WHEN doc_id % 16 < 12 THEN 'books'
                  WHEN doc_id % 16 < 14 THEN 'code'
                  ELSE 'wiki' END AS grp
      FROM documents
    ), g AS (
      SELECT grp, CAST(count(*) AS BIGINT) AS n
      FROM d GROUP BY 1
    ), w AS (
      SELECT grp, CAST(n AS DOUBLE) AS n, sqrt(CAST(n AS DOUBLE)) AS w
      FROM g
    ), c AS (
      SELECT min(n / w) AS c FROM w
    ), f AS (
      SELECT grp, ((c.c * w) / n) AS f,
             lpad(lower(to_hex(CAST(floor(((c.c * w) / n) * 4294967296)
                                    AS BIGINT))), 8, '0') AS thr
      FROM w, c
    )
    SELECT d.doc_id, d.grp AS grp
    FROM d JOIN f ON d.grp = f.grp
    WHERE f.f >= 1.0 OR substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 8) < f.thr
    ORDER BY d.doc_id
    """,
)
def q_temperature_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature T=2 mixture resampling: keep-rates proportional to
    sqrt(n_g)/n_g with the binding (smallest) group kept whole — sqrt
    is IEEE-correctly-rounded, so the md5-threshold membership
    decisions are bit-identical cross-engine and the oracle replays
    the EXACT KEPT SET row by row. Groups are PLANTED with an 8:4:2:2
    skew (the fixture's natural sources are exactly uniform, which
    would make any mixture scheme a no-op): 'web' downsamples
    hardest, the smallest groups keep (nearly) everything."""
    from oakstore_spark.operators.curation import temperature_mix_sample

    m16 = F.col("doc_id") % 16
    grp = (
        F.when(m16 < 8, F.lit("web"))
        .when(m16 < 12, F.lit("books"))
        .when(m16 < 14, F.lit("code"))
        .otherwise(F.lit("wiki"))
    )
    d = table(spark, sf_dir, "documents").select(
        "doc_id", grp.alias("grp")
    )
    return temperature_mix_sample(d, "grp", "doc_id").orderBy("doc_id")


@register(
    "q_corpus_snapshot_diff",
    oracle="""
    WITH old AS (
      SELECT doc_id, md5(text) AS h FROM documents WHERE doc_id % 10 != 0
    ), new_ AS (
      SELECT doc_id,
             md5(CASE WHEN doc_id % 7 = 0
                      THEN text || ' (updated)'
                      ELSE text END) AS h
      FROM documents WHERE doc_id % 10 != 1
    )
    SELECT status, CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(doc_id) AS BIGINT) AS id_checksum
    FROM (
      SELECT COALESCE(o.doc_id, n.doc_id) AS doc_id,
             CASE WHEN o.doc_id IS NULL THEN 'added'
                  WHEN n.doc_id IS NULL THEN 'removed'
                  WHEN o.h != n.h THEN 'changed'
                  ELSE 'unchanged' END AS status
      FROM old o FULL JOIN new_ n ON o.doc_id = n.doc_id
    )
    GROUP BY status
    ORDER BY status
    """,
)
def q_corpus_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental-crawl snapshot diff — the first question of every
    recrawl: what was added, removed, changed, unchanged between two
    corpus versions? Content identity is the md5 of the text, the
    diff one full outer join on the doc key (at 100 TB: a
    hash-partitioned sort-merge join carrying only (id, 16-byte
    digest) — text never shuffles). The planted snapshots drop
    different id residues and mutate every 7th text, so all four
    statuses appear with closed-form membership."""
    d = table(spark, sf_dir, "documents")
    old = d.where(F.col("doc_id") % 10 != 0).select(
        "doc_id", F.md5("text").alias("h")
    )
    new = d.where(F.col("doc_id") % 10 != 1).select(
        "doc_id",
        F.md5(
            F.when(
                F.col("doc_id") % 7 == 0,
                F.concat(F.col("text"), F.lit(" (updated)")),
            ).otherwise(F.col("text"))
        ).alias("h"),
    )
    o = old.alias("o")
    n = new.alias("n")
    joined = o.join(n, F.col("o.doc_id") == F.col("n.doc_id"), "full")
    status = (
        F.when(F.col("o.doc_id").isNull(), F.lit("added"))
        .when(F.col("n.doc_id").isNull(), F.lit("removed"))
        .when(F.col("o.h") != F.col("n.h"), F.lit("changed"))
        .otherwise(F.lit("unchanged"))
    )
    return (
        joined.select(
            F.coalesce(F.col("o.doc_id"), F.col("n.doc_id")).alias(
                "doc_id"
            ),
            status.alias("status"),
        )
        .groupBy("status")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("doc_id").alias("id_checksum"),
        )
        .orderBy("status")
    )


@register("q_unigram_tok_train")  # iterative float EM: no single-SQL
# oracle; exact single-node/distributed parity pinned in
# tests/test_curation.py::test_train_unigram_lm_matches_reference_implementation
def q_unigram_tok_train(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unigram-LM tokenizer training (Kudo 2018 / SentencePiece's
    other family next to BPE — operators/text.py:train_unigram_lm):
    seed substring candidates from one corpus pass, 3 hard-EM
    (Viterbi) rounds over the (word, freq) vocabulary relation, prune
    to 256 pieces. Deterministic ties everywhere (seed/prune by
    (weight desc, piece asc), Viterbi by score then longer final
    piece), so the piece table is stable across engines and
    partitionings."""
    from oakstore_spark.operators.text import train_unigram_lm

    d = table(spark, sf_dir, "documents")
    return train_unigram_lm(
        d, "text", vocab_size=256, seed_size=1024, max_piece_len=6,
        n_iters=3,
    )


@register("q_topics_train")  # iterative hard-EM: no single-SQL oracle;
# planted-topic exact recovery pinned in
# tests/test_curation.py::test_train_topics_recovers_planted_topics
def q_topics_train(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Topic decomposition of the documents corpus
    (operators/text.train_topics): mixture-of-unigrams hard-EM, 4
    topics, 3 rounds from the deterministic md5 initialization — one
    corpus pass to the vocab-bounded (doc, word, n) relation, then
    per round one broadcast of the topic-word log-probs out and one
    BIGINT (topic, word) aggregate back. Deterministic ties
    everywhere (vocab by freq desc/word asc, argmax by lowest topic),
    so the topic-word table is stable across engines/partitionings;
    ROWS-only by the q_unigram_tok_train precedent (iterative fit)."""
    from oakstore_spark.operators.text import train_topics

    d = table(spark, sf_dir, "documents")
    return train_topics(
        d, "text", "doc_id", k=4, n_iters=3, vocab_size=1024,
    )


@register(
    "q_unicode_normalize",
    oracle="""
    WITH raw AS (
      SELECT doc_id,
             'Ｔｅｓｔ' || CAST(doc_id AS VARCHAR) || '　中文データ，Тест－'
               || CAST(doc_id AS VARCHAR) || ' ﬁle №'
               || CAST(doc_id AS VARCHAR) AS s
      FROM documents
    ), nfkc AS (
      -- baked NFKC mapping for exactly the planted compatibility
      -- characters (DuckDB has no NFKC function); characters whose
      -- un-NFKC'd form is stripped by the \\p class anyway (，U+FF0C,
      -- －U+FF0D) need no bake
      SELECT doc_id,
             replace(replace(replace(replace(replace(replace(replace(
               s, 'Ｔ','T'), 'ｅ','e'), 'ｓ','s'), 'ｔ','t'),
               '　',' '), 'ﬁ','fi'), '№','No') AS s1
      FROM raw
    ), norm AS (
      SELECT doc_id,
             trim(regexp_replace(regexp_replace(lower(s1),
               '[^\\p{L}\\p{N}\\s]', '', 'g'), '\\s+', ' ', 'g'))
               AS norm_text
      FROM nfkc
    )
    SELECT doc_id, norm_text,
           CAST(len(list_distinct([substr(norm_text, i, 3)
                for i in generate_series(1,
                  greatest(length(norm_text) - 2, 1))])) AS BIGINT)
             AS n_grams
    FROM norm ORDER BY doc_id
    """,
)
def q_unicode_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multilingual normalization rung on a PLANTED multi-script corpus
    (functions/text.py normalize_text(unicode_mode=True) +
    char_ngram_codes(unicode_mode=True)): each doc gets fullwidth
    latin (Ｔｅｓｔ), CJK, Cyrillic, an ideographic space (U+3000), an
    ﬁ ligature and a № sign appended to its id. NFKC folds the
    compatibility forms (one Arrow pass — the only non-JVM step), the
    \\p{L}\\p{N} strip keeps EVERY script's letters/digits (the ASCII
    rung would empty these docs and collapse the dedup family), and
    the gram count proves the 21-bit codepoint packing is injective:
    distinct int64 codes == distinct 3-char substrings, replayed
    verbatim by DuckDB's list comprehension. The oracle bakes the NFKC
    mapping for the planted characters and mirrors the post-NFKC regex
    pipeline RE2-for-Java exactly."""
    from oakstore_spark.functions.text import char_ngram_codes, normalize_text

    d = table(spark, sf_dir, "documents").select(
        "doc_id",
        F.concat(
            F.lit("Ｔｅｓｔ"), F.col("doc_id").cast("string"),
            F.lit("　中文データ，Тест－"), F.col("doc_id").cast("string"),
            F.lit(" ﬁle №"), F.col("doc_id").cast("string"),
        ).alias("s"),
    )
    norm = d.select(
        "doc_id", normalize_text("s", unicode_mode=True).alias("norm_text")
    )
    return norm.select(
        "doc_id",
        "norm_text",
        F.size(char_ngram_codes(3, unicode_mode=True)("norm_text"))
        .cast("long")
        .alias("n_grams"),
    ).orderBy("doc_id")


@register(
    "q_psi_snapshot_monitor",
    oracle="""
    WITH b AS (
      SELECT value AS v FROM events
      WHERE ts < TIMESTAMP '2024-01-16' AND value IS NOT NULL
    ), c AS (
      SELECT value AS v FROM events
      WHERE ts >= TIMESTAMP '2024-01-16' AND value IS NOT NULL
    ), mm AS (
      SELECT min(v) AS lo, max(v) AS hi FROM b
    ), nn AS (
      SELECT (SELECT count(*) FROM b) AS nb,
             (SELECT count(*) FROM c) AS nc
    ), bb AS (
      SELECT greatest(least(CAST(floor((v - lo) / ((hi - lo) / 10))
                            AS BIGINT), 9), 0) AS bin,
             count(*) AS n_base
      FROM b, mm GROUP BY 1
    ), cc AS (
      SELECT greatest(least(CAST(floor((v - lo) / ((hi - lo) / 10))
                            AS BIGINT), 9), 0) AS bin,
             count(*) AS n_cur
      FROM c, mm GROUP BY 1
    ), grid AS (
      SELECT unnest(generate_series(0, 9)) AS bin
    )
    SELECT CAST(grid.bin AS BIGINT) AS bin,
           CAST(coalesce(n_base, 0) AS BIGINT) AS n_base,
           CAST(coalesce(n_cur, 0) AS BIGINT) AS n_cur,
           CAST(coalesce(n_base, 0) * 2 + 1 AS DOUBLE) / (2 * nb + 10)
             AS share_base,
           CAST(coalesce(n_cur, 0) * 2 + 1 AS DOUBLE) / (2 * nc + 10)
             AS share_cur,
           (CAST(coalesce(n_base, 0) * 2 + 1 AS DOUBLE) / (2 * nb + 10)
            - CAST(coalesce(n_cur, 0) * 2 + 1 AS DOUBLE) / (2 * nc + 10))
           * ln((CAST(coalesce(n_base, 0) * 2 + 1 AS DOUBLE)
                 / (2 * nb + 10))
                / (CAST(coalesce(n_cur, 0) * 2 + 1 AS DOUBLE)
                   / (2 * nc + 10))) AS psi_contrib
    FROM grid
    LEFT JOIN bb ON grid.bin = bb.bin
    LEFT JOIN cc ON grid.bin = cc.bin
    CROSS JOIN nn
    ORDER BY bin
    """,
)
def q_psi_snapshot_monitor(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population Stability Index drift monitor
    (operators/quality.psi_drift): the event value distribution of the
    first half of January (baseline fixes the bin edges) vs the second
    half. Bin shares are add-half smoothed as exact integer ratios, so
    one division + one ln + one multiply replays identically in
    DuckDB; sum(psi_contrib) is the PSI. Two hash aggregates + a
    10-row join — no sort, no window over rows."""
    from oakstore_spark.operators.quality import psi_drift

    e = table(spark, sf_dir, "events")
    split = F.lit("2024-01-16").cast("timestamp")
    return psi_drift(
        e.where(F.col("ts") < split),
        e.where(F.col("ts") >= split),
        "value",
        n_bins=10,
    ).orderBy("bin")


# --- A/B experiment analysis ----------------------------------------------

@register(
    "q_ab_experiment",
    oracle="""
    WITH units AS (
      SELECT user_id % 2 AS arm,
             CAST(coalesce(sum(CASE WHEN event_type = 'purchase'
                  THEN CAST(round(value * 100) AS BIGINT) END), 0)
                  AS BIGINT) AS cents,
             CAST(max(CASE WHEN event_type = 'purchase' AND value > 200
                  THEN 1 ELSE 0 END) AS BIGINT) AS converted
      FROM events GROUP BY user_id
    ), m AS (
      SELECT arm, CAST(count(*) AS BIGINT) AS n,
             CAST(sum(cents) AS BIGINT) AS sx,
             CAST(sum(cents * cents) AS BIGINT) AS sx2,
             CAST(sum(converted) AS BIGINT) AS k
      FROM units GROUP BY arm
    ), ab AS (
      SELECT
        (SELECT n FROM m WHERE arm = 0) AS na,
        (SELECT n FROM m WHERE arm = 1) AS nb,
        (SELECT sx FROM m WHERE arm = 0) AS sa,
        (SELECT sx FROM m WHERE arm = 1) AS sb,
        (SELECT sx2 FROM m WHERE arm = 0) AS qa,
        (SELECT sx2 FROM m WHERE arm = 1) AS qb,
        (SELECT k FROM m WHERE arm = 0) AS ka,
        (SELECT k FROM m WHERE arm = 1) AS kb
    ), terms AS (
      SELECT na, nb, ka, kb,
             CAST(sa AS DOUBLE) / na AS mean_a,
             CAST(sb AS DOUBLE) / nb AS mean_b,
             (CAST(qa AS DOUBLE) - CAST(sa AS DOUBLE) * sa / na)
               / (na - 1) AS var_a,
             (CAST(qb AS DOUBLE) - CAST(sb AS DOUBLE) * sb / nb)
               / (nb - 1) AS var_b
      FROM ab
    ), tt AS (
      SELECT *, var_a / na AS ta, var_b / nb AS tb FROM terms
    )
    SELECT na, nb,
           mean_a, mean_b, var_a, var_b,
           mean_a - mean_b AS mean_diff,
           (mean_a - mean_b) / sqrt(ta + tb) AS t_stat,
           (ta + tb) * (ta + tb)
             / (ta * ta / (na - 1) + tb * tb / (nb - 1)) AS welch_df,
           ka, kb,
           CAST(ka AS DOUBLE) / na AS rate_a,
           CAST(kb AS DOUBLE) / nb AS rate_b,
           CAST(ka AS DOUBLE) / na - CAST(kb AS DOUBLE) / nb AS rate_diff,
           CAST(ka + kb AS DOUBLE) / (na + nb) AS pooled_rate,
           (CAST(ka AS DOUBLE) / na - CAST(kb AS DOUBLE) / nb)
             / sqrt(CAST(ka + kb AS DOUBLE) / (na + nb)
                    * (1 - CAST(ka + kb AS DOUBLE) / (na + nb))
                    * (1 / CAST(na AS DOUBLE) + 1 / CAST(nb AS DOUBLE)))
             AS z_stat
    FROM tt
    """,
)
def q_ab_experiment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A/B experiment readout (operators/experiments): Welch's
    unequal-variances t-test on per-user purchase spend AND the pooled
    two-proportion z-test on big-purchase (>$200) conversion, one row
    (an all-converted flag like signup would degenerate the pooled SE
    to zero — the operator NULL-guards that case). Units are
    users (the randomization unit — never raw events), arm = user_id
    parity; metrics enter as exact integer cents / 0-1 flags so every
    statistic is a pinned float tree over exact BIGINT moment sums.
    One per-user aggregate + one per-arm aggregate; nothing downstream
    grows with data size."""
    from oakstore_spark.operators.experiments import (
        proportion_ztest,
        welch_ttest,
    )

    e = table(spark, sf_dir, "events")
    units = e.groupBy("user_id").agg(
        F.coalesce(
            F.sum(
                F.when(
                    F.col("event_type") == "purchase",
                    F.round(F.col("value") * 100).cast("bigint"),
                )
            ),
            F.lit(0),
        ).alias("cents"),
        F.max(
            F.when(
                (F.col("event_type") == "purchase") & (F.col("value") > 200),
                1,
            ).otherwise(0)
        ).cast("bigint").alias("converted"),
    ).withColumn("arm", F.col("user_id") % 2)
    units = units.persist()
    w = welch_ttest(units, "arm", "cents", 0, 1)
    z = proportion_ztest(units, "arm", "converted", 0, 1)
    out = w.crossJoin(
        F.broadcast(
            z.select("ka", "kb", "rate_a", "rate_b", "rate_diff",
                     "pooled_rate", "z_stat")
        )
    )
    from oakstore_spark.operators.scaling import track_persisted

    return track_persisted(out, units)


@register(
    "q_ab_cuped",
    oracle="""
    WITH units AS (
      SELECT user_id % 2 AS arm,
             CAST(coalesce(sum(CASE WHEN event_type = 'purchase'
                  AND ts < TIMESTAMP '2024-01-16'
                  THEN CAST(round(value * 100) AS BIGINT) END), 0)
                  AS BIGINT) AS pre_cents,
             CAST(coalesce(sum(CASE WHEN event_type = 'purchase'
                  AND ts >= TIMESTAMP '2024-01-16'
                  THEN CAST(round(value * 100) AS BIGINT) END), 0)
                  AS BIGINT) AS post_cents
      FROM events GROUP BY user_id
    ), g0 AS (
      SELECT CAST(count(*) AS BIGINT) AS n,
             CAST(sum(pre_cents) AS BIGINT) AS sx,
             CAST(sum(post_cents) AS BIGINT) AS sy,
             CAST(sum(pre_cents * pre_cents) AS BIGINT) AS sxx,
             CAST(sum(post_cents * post_cents) AS BIGINT) AS syy,
             CAST(sum(pre_cents * post_cents) AS BIGINT) AS sxy
      FROM units
    ), g AS (
      SELECT (CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * sy
                / CAST(n AS DOUBLE))
             / (CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * sx
                / CAST(n AS DOUBLE)) AS theta,
             CAST(sx AS DOUBLE) / CAST(n AS DOUBLE) AS mean_x,
             (CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * sy
                / CAST(n AS DOUBLE))
             * (CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * sy
                / CAST(n AS DOUBLE))
             / ((CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * sx
                 / CAST(n AS DOUBLE))
                * (CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * sy
                   / CAST(n AS DOUBLE))) AS rho2
      FROM g0
    ), arms AS (
      SELECT arm, CAST(count(*) AS BIGINT) AS n_arm,
             CAST(sum(post_cents) AS BIGINT) AS sy_arm,
             CAST(sum(pre_cents) AS BIGINT) AS sx_arm
      FROM units GROUP BY arm
    )
    SELECT arm, n_arm,
           CAST(sy_arm AS DOUBLE) / n_arm AS raw_mean,
           CAST(sy_arm AS DOUBLE) / n_arm
             - theta * (CAST(sx_arm AS DOUBLE) / n_arm - mean_x)
             AS cuped_mean,
           theta,
           rho2 AS variance_reduction
    FROM arms CROSS JOIN g
    ORDER BY arm
    """,
)
def q_ab_cuped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUPED variance-reduced experiment readout
    (operators/experiments.cuped_adjust): per-user first-half-of-month
    purchase cents is the pre-period covariate, second-half cents the
    metric; theta fit POOLED across arms from exact BIGINT moment sums
    (fitting per-arm would re-introduce the treatment effect), and the
    adjusted per-arm mean needs only per-arm sums — never a per-row
    adjusted column. rho2 is the fraction of metric variance removed.
    """
    from oakstore_spark.operators.experiments import cuped_adjust

    e = table(spark, sf_dir, "events")
    cents = F.round(F.col("value") * 100).cast("bigint")
    split = F.lit("2024-01-16").cast("timestamp")
    purchase = F.col("event_type") == "purchase"
    units = e.groupBy("user_id").agg(
        F.coalesce(
            F.sum(F.when(purchase & (F.col("ts") < split), cents)), F.lit(0)
        ).alias("pre_cents"),
        F.coalesce(
            F.sum(F.when(purchase & (F.col("ts") >= split), cents)), F.lit(0)
        ).alias("post_cents"),
    ).withColumn("arm", F.col("user_id") % 2)
    units = units.persist()
    out = cuped_adjust(units, "arm", "post_cents", "pre_cents").orderBy("arm")
    from oakstore_spark.operators.scaling import track_persisted

    return track_persisted(out, units)


@register(
    "q_mutual_information",
    oracle="""
    WITH obs AS (
      SELECT lang, source, CAST(count(*) AS BIGINT) AS n_ij
      FROM documents GROUP BY lang, source
    ), m AS (
      SELECT lang, source, n_ij,
             CAST(sum(n_ij) OVER (PARTITION BY lang) AS BIGINT) AS r_i,
             CAST(sum(n_ij) OVER (PARTITION BY source) AS BIGINT) AS c_j,
             CAST(sum(n_ij) OVER () AS BIGINT) AS n
      FROM obs
    )
    SELECT lang, source, n_ij, r_i, c_j,
           CAST(n_ij AS DOUBLE) / n
             * ln(CAST(n_ij AS DOUBLE) * n
                  / (CAST(r_i AS DOUBLE) * c_j)) AS mi_contrib
    FROM m ORDER BY lang, source
    """,
)
def q_mutual_information(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mutual information of the lang x source contingency table — the
    information-theoretic sibling of the chi-squared check (MI = 0 iff
    independent; sum(mi_contrib) in nats). The corpus is touched once
    (one groupBy); margins are window sums over the TINY cell relation
    exactly like q_chi2_lang_source; each cell's contribution is one
    pinned division-ln-multiply chain over exact BIGINTs, reported
    per-cell so no cross-row float sum enters the compare."""
    from pyspark.sql import Window as W

    d = table(spark, sf_dir, "documents")
    obs = d.groupBy("lang", "source").agg(
        F.count(F.lit(1)).alias("n_ij")
    )
    r = F.sum("n_ij").over(W.partitionBy("lang"))
    c = F.sum("n_ij").over(W.partitionBy("source"))
    n = F.sum("n_ij").over(W.partitionBy())
    m = obs.select(
        "lang", "source", "n_ij",
        r.alias("r_i"), c.alias("c_j"), n.alias("n"),
    )
    mi = (
        F.col("n_ij").cast("double") / F.col("n")
        * F.log(
            F.col("n_ij").cast("double") * F.col("n")
            / (F.col("r_i").cast("double") * F.col("c_j"))
        )
    )
    return m.select(
        "lang", "source", "n_ij", "r_i", "c_j", mi.alias("mi_contrib")
    ).orderBy("lang", "source")


@register(
    "q_event_study",
    oracle="""
    WITH obs AS (
      SELECT date_diff('day', DATE '2024-01-16', CAST(ts AS DATE))
               AS period,
             user_id % 2 = 1 AS t,
             CAST(round(value * 100) AS BIGINT) AS x
      FROM events
      WHERE date_diff('day', DATE '2024-01-16', CAST(ts AS DATE))
            BETWEEN -5 AND 5
    ), per AS (
      SELECT CAST(period AS BIGINT) AS period,
             CAST(sum(CASE WHEN t THEN 1 ELSE 0 END) AS BIGINT)
               AS n_t,
             CAST(sum(CASE WHEN t THEN x END) AS BIGINT) AS s_t,
             CAST(sum(CASE WHEN t THEN x * x END) AS BIGINT) AS q_t,
             CAST(sum(CASE WHEN NOT t THEN 1 ELSE 0 END) AS BIGINT)
               AS n_c,
             CAST(sum(CASE WHEN NOT t THEN x END) AS BIGINT) AS s_c,
             CAST(sum(CASE WHEN NOT t THEN x * x END) AS BIGINT)
               AS q_c
      FROM obs GROUP BY 1
    ), base AS (
      SELECT CAST(s_t AS DOUBLE) / n_t - CAST(s_c AS DOUBLE) / n_c
               AS bd
      FROM per WHERE period = -1
    )
    SELECT period,
           n_t AS n_treat, n_c AS n_ctrl,
           CASE WHEN n_t > 0
                THEN CAST(s_t AS DOUBLE) / n_t END AS mean_treat,
           CASE WHEN n_c > 0
                THEN CAST(s_c AS DOUBLE) / n_c END AS mean_ctrl,
           CASE WHEN n_t > 0 AND n_c > 0
                THEN CAST(s_t AS DOUBLE) / n_t
                     - CAST(s_c AS DOUBLE) / n_c END AS diff,
           (CASE WHEN n_t > 0 AND n_c > 0
                 THEN CAST(s_t AS DOUBLE) / n_t
                      - CAST(s_c AS DOUBLE) / n_c END)
             - (SELECT bd FROM base) AS effect,
           CASE WHEN n_t > 1 AND n_c > 1 THEN
             sqrt((CAST(q_t AS DOUBLE)
                   - n_t * (CAST(s_t AS DOUBLE) / n_t)
                         * (CAST(s_t AS DOUBLE) / n_t)) / (n_t - 1)
                    / n_t
                  + (CAST(q_c AS DOUBLE)
                     - n_c * (CAST(s_c AS DOUBLE) / n_c)
                           * (CAST(s_c AS DOUBLE) / n_c)) / (n_c - 1)
                    / n_c)
           END AS se_diff
    FROM per ORDER BY period
    """,
)
def q_event_study(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event-study leads-and-lags DiD
    (operators/experiments.event_study, r14): per relative day around
    2024-01-16 (the q_diff_in_diff cut), the treated-vs-control spend
    difference minus its day -1 baseline — pre-period effects near 0
    ARE the parallel-trends diagnostic, post-period effects the
    dynamic response. One hash aggregate to the 11-period relation,
    every moment an exact BIGINT, every readout a pinned chain
    (baseline computed driver-side from the same exact moments and
    embedded as the identical double)."""
    from oakstore_spark.operators.experiments import event_study

    e = table(spark, sf_dir, "events")
    rel = F.datediff(
        F.to_date("ts"), F.lit("2024-01-16").cast("date")
    )
    obs = e.select(
        rel.alias("r"),
        (F.col("user_id") % 2).alias("arm"),
        F.round(F.col("value") * 100).cast("bigint").alias("cents"),
    ).where((F.col("r") >= -5) & (F.col("r") <= 5))
    return event_study(
        obs, "arm", "r", "cents", treated=1, baseline_period=-1
    ).orderBy("period")


@register(
    "q_diff_in_diff",
    oracle="""
    WITH units AS (
      SELECT user_id % 2 AS grp,
             CASE WHEN ts >= TIMESTAMP '2024-01-16' THEN 'post'
                  ELSE 'pre' END AS period,
             CAST(coalesce(sum(CASE WHEN event_type = 'purchase'
                  THEN CAST(round(value * 100) AS BIGINT) END), 0)
                  AS BIGINT) AS cents
      FROM events
      GROUP BY user_id,
               CASE WHEN ts >= TIMESTAMP '2024-01-16' THEN 'post'
                    ELSE 'pre' END
    ), cells AS (
      SELECT
        CAST(sum(CASE WHEN grp = 1 AND period = 'pre' THEN 1 ELSE 0 END)
             AS BIGINT) AS n_t_pre,
        CAST(sum(CASE WHEN grp = 1 AND period = 'post' THEN 1 ELSE 0 END)
             AS BIGINT) AS n_t_post,
        CAST(sum(CASE WHEN grp != 1 AND period = 'pre' THEN 1 ELSE 0 END)
             AS BIGINT) AS n_c_pre,
        CAST(sum(CASE WHEN grp != 1 AND period = 'post' THEN 1 ELSE 0 END)
             AS BIGINT) AS n_c_post,
        CAST(sum(CASE WHEN grp = 1 AND period = 'pre' THEN cents END)
             AS BIGINT) AS s_t_pre,
        CAST(sum(CASE WHEN grp = 1 AND period = 'post' THEN cents END)
             AS BIGINT) AS s_t_post,
        CAST(sum(CASE WHEN grp != 1 AND period = 'pre' THEN cents END)
             AS BIGINT) AS s_c_pre,
        CAST(sum(CASE WHEN grp != 1 AND period = 'post' THEN cents END)
             AS BIGINT) AS s_c_post
      FROM units
    )
    SELECT n_t_pre, n_t_post, n_c_pre, n_c_post,
           CAST(s_t_pre AS DOUBLE) / n_t_pre AS treated_pre,
           CAST(s_t_post AS DOUBLE) / n_t_post AS treated_post,
           CAST(s_c_pre AS DOUBLE) / n_c_pre AS control_pre,
           CAST(s_c_post AS DOUBLE) / n_c_post AS control_post,
           CAST(s_t_post AS DOUBLE) / n_t_post
             - CAST(s_t_pre AS DOUBLE) / n_t_pre AS treated_delta,
           CAST(s_c_post AS DOUBLE) / n_c_post
             - CAST(s_c_pre AS DOUBLE) / n_c_pre AS control_delta,
           (CAST(s_t_post AS DOUBLE) / n_t_post
             - CAST(s_t_pre AS DOUBLE) / n_t_pre)
           - (CAST(s_c_post AS DOUBLE) / n_c_post
             - CAST(s_c_pre AS DOUBLE) / n_c_pre) AS did_estimate
    FROM cells
    """,
)
def q_diff_in_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Difference-in-differences (operators/experiments.diff_in_diff):
    per-(user, half-of-month) purchase cents as the unit-period panel,
    user parity as the quasi-treatment; one 2x2 conditional-moment
    aggregate, the estimate a pinned chain over four exact means —
    the workhorse when randomization wasn't possible (parallel-trends
    assumption documented in the operator)."""
    from oakstore_spark.operators.experiments import diff_in_diff

    e = table(spark, sf_dir, "events")
    period = F.when(
        F.col("ts") >= F.lit("2024-01-16").cast("timestamp"), "post"
    ).otherwise("pre")
    units = e.groupBy("user_id", period.alias("period")).agg(
        F.coalesce(
            F.sum(
                F.when(
                    F.col("event_type") == "purchase",
                    F.round(F.col("value") * 100).cast("bigint"),
                )
            ),
            F.lit(0),
        ).alias("cents"),
    ).withColumn("grp", F.col("user_id") % 2)
    return diff_in_diff(units, "grp", "period", "cents", treated=1, post="post")


@register(
    "q_robust_metric",
    oracle="""
    WITH units AS (
      SELECT user_id,
             user_id % 2 AS arm,
             CAST(coalesce(sum(CASE WHEN event_type = 'purchase'
                  THEN CAST(round(value * 100) AS BIGINT) END), 0)
                  AS BIGINT) AS cents
      FROM events GROUP BY user_id
    ), ranked AS (
      SELECT arm, cents AS x,
             row_number() OVER (PARTITION BY arm
                                ORDER BY cents, user_id) AS rn,
             count(*) OVER (PARTITION BY arm) AS n
      FROM units
    ), staged AS (
      SELECT arm, x, n,
             CAST(floor(0.05 * n) AS BIGINT) AS k,
             rn > floor(0.05 * n)
               AND rn <= n - floor(0.05 * n) AS kept
      FROM ranked
    ), bounds AS (
      SELECT arm, min(x) AS lo, max(x) AS hi
      FROM staged WHERE kept GROUP BY arm
    )
    SELECT staged.arm,
           CAST(max(n) AS BIGINT) AS n,
           CAST(max(k) AS BIGINT) AS k_trimmed_each_tail,
           CAST(sum(x) AS DOUBLE) / max(n) AS raw_mean,
           CAST(sum(CASE WHEN kept THEN x END) AS DOUBLE)
             / sum(CASE WHEN kept THEN 1 ELSE 0 END) AS trimmed_mean,
           CAST(sum(least(greatest(x, lo), hi)) AS DOUBLE) / max(n)
             AS winsorized_mean
    FROM staged JOIN bounds ON staged.arm = bounds.arm
    GROUP BY staged.arm
    ORDER BY staged.arm
    """,
)
def q_robust_metric(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Outlier-robust per-arm metric readout
    (operators/experiments.robust_metric_summary): raw vs 5%-trimmed
    vs winsorized mean of per-user purchase cents — the heavy-tail
    guard every revenue experiment needs. Rank-based exact-integer
    trim rule with an id tiebreak; all sums exact BIGINTs, each mean
    one division."""
    from oakstore_spark.operators.experiments import robust_metric_summary

    e = table(spark, sf_dir, "events")
    units = e.groupBy("user_id").agg(
        F.coalesce(
            F.sum(
                F.when(
                    F.col("event_type") == "purchase",
                    F.round(F.col("value") * 100).cast("bigint"),
                )
            ),
            F.lit(0),
        ).alias("cents"),
    ).withColumn("arm", F.col("user_id") % 2)
    return robust_metric_summary(
        units, "arm", "cents", "user_id", trim=0.05
    ).orderBy("arm")


@register(
    "q_srm_check",
    oracle="""
    WITH counts AS (
      SELECT user_id % 2 AS arm,
             CAST(count(DISTINCT user_id) AS BIGINT) AS n_observed
      FROM events GROUP BY 1
    ), tot AS (SELECT CAST(sum(n_observed) AS BIGINT) AS n FROM counts)
    SELECT arm, n_observed,
           0.5 * CAST(n AS DOUBLE) AS n_expected,
           (CAST(n_observed AS DOUBLE) - 0.5 * CAST(n AS DOUBLE))
             * (CAST(n_observed AS DOUBLE) - 0.5 * CAST(n AS DOUBLE))
             / (0.5 * CAST(n AS DOUBLE)) AS chi2_contrib
    FROM counts CROSS JOIN tot
    ORDER BY arm
    """,
)
def q_srm_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sample-ratio mismatch trust gate
    (operators/experiments.srm_check): observed user counts per parity
    arm against the 50/50 design — the check run before reading any
    experiment metric (SRM ⇒ discard, don't adjust). One user-level
    distinct + one arms-sized aggregate; (o-e)^2/e as a pinned chain
    over exact BIGINTs."""
    from oakstore_spark.operators.experiments import srm_check

    e = table(spark, sf_dir, "events")
    users = e.select("user_id").distinct().withColumn(
        "arm", F.col("user_id") % 2
    )
    return srm_check(users, "arm", {0: 0.5, 1: 0.5}).orderBy("arm")


@register(
    "q_quantile_effects",
    oracle="""
    WITH units AS (
      SELECT user_id, user_id % 2 AS arm,
             CAST(coalesce(sum(CASE WHEN event_type = 'purchase'
                  THEN CAST(round(value * 100) AS BIGINT) END), 0)
                  AS BIGINT) AS cents
      FROM events GROUP BY user_id
    ), ranked AS (
      SELECT arm, cents AS x,
             row_number() OVER (PARTITION BY arm
                                ORDER BY cents, user_id) AS rn,
             count(*) OVER (PARTITION BY arm) AS n
      FROM units
    ), grid AS (
      SELECT unnest([0.1, 0.25, 0.5, 0.75, 0.9]) AS q
    ), hits AS (
      SELECT q, arm, x FROM ranked JOIN grid
        ON rn = CAST(ceil(q * n) AS BIGINT)
    )
    SELECT a.q, a.x AS v_a, b.x AS v_b,
           CAST(a.x - b.x AS BIGINT) AS qte
    FROM (SELECT q, x FROM hits WHERE arm = 0) a
    JOIN (SELECT q, x FROM hits WHERE arm = 1) b USING (q)
    ORDER BY a.q
    """,
)
def q_quantile_effects(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantile treatment effects
    (operators/experiments.quantile_treatment_effects): per-user
    purchase cents compared between parity arms at the
    10/25/50/75/90th percentiles — WHERE in the distribution the
    difference lives, which no mean test can say. Type-1 quantiles
    (rank ceil(q*n), id tiebreak) are exact integers from the data;
    the whole readout is float-free."""
    from oakstore_spark.operators.experiments import (
        quantile_treatment_effects,
    )

    e = table(spark, sf_dir, "events")
    units = e.groupBy("user_id").agg(
        F.coalesce(
            F.sum(
                F.when(
                    F.col("event_type") == "purchase",
                    F.round(F.col("value") * 100).cast("bigint"),
                )
            ),
            F.lit(0),
        ).alias("cents"),
    ).withColumn("arm", F.col("user_id") % 2)
    return quantile_treatment_effects(
        units, "arm", "cents", "user_id", 0, 1
    ).orderBy("q")


@register(
    "q_revenue_concentration",
    oracle="""
    WITH units AS (
      SELECT user_id,
             CAST(coalesce(sum(CASE WHEN event_type = 'purchase'
                  THEN CAST(round(value * 100) AS BIGINT) END), 0)
                  AS BIGINT) AS cents
      FROM events GROUP BY user_id
    ), ranked AS (
      SELECT cents AS x,
             row_number() OVER (ORDER BY cents, user_id) AS rn,
             count(*) OVER () AS n
      FROM units
    ), tots AS (
      SELECT CAST(max(n) AS BIGINT) AS n,
             CAST(sum(x) AS BIGINT) AS s,
             CAST(sum(rn * x) AS BIGINT) AS s1
      FROM ranked
    ), grid AS (SELECT unnest(range(1, 11)) AS d)
    SELECT CAST(d AS BIGINT) AS decile,
           CAST(sum(CASE WHEN rn * 10 <= d * tots.n THEN x END)
                AS BIGINT) AS cum_cents,
           CAST(sum(CASE WHEN rn * 10 <= d * tots.n THEN x END)
                AS DOUBLE) / s AS cum_share,
           2.0 * CAST(s1 AS DOUBLE) / (CAST(tots.n AS DOUBLE) * s)
             - CAST(tots.n + 1 AS DOUBLE) / tots.n AS gini
    FROM grid CROSS JOIN ranked CROSS JOIN tots
    GROUP BY d, tots.n, s, s1 ORDER BY decile
    """,
)
def q_revenue_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lorenz curve + Gini coefficient of per-user purchase revenue —
    the concentration readout behind every "top X% of users drive Y%
    of revenue" statement. Users rank ascending by exact cents (id
    tiebreak); the decile membership test rn*10 <= d*n is pure integer
    arithmetic, cumulative cents are exact BIGINTs, and Gini =
    2*S1/(n*S) - (n+1)/n is a pinned chain over three exact sums (S1 =
    sum of rank*cents). One window rank + one grid aggregate."""
    from pyspark.sql import Window as W

    e = table(spark, sf_dir, "events")
    units = e.groupBy("user_id").agg(
        F.coalesce(
            F.sum(
                F.when(
                    F.col("event_type") == "purchase",
                    F.round(F.col("value") * 100).cast("bigint"),
                )
            ),
            F.lit(0),
        ).alias("cents"),
    )
    ranked = units.select(
        F.col("cents").alias("x"),
        F.row_number().over(W.orderBy("cents", "user_id")).alias("rn"),
        F.count(F.lit(1)).over(W.partitionBy()).alias("n"),
    )
    grid = spark.range(1, 11).select(F.col("id").alias("decile"))
    j = grid.crossJoin(ranked)
    in_dec = F.col("rn") * 10 <= F.col("decile") * F.col("n")
    agg = j.groupBy("decile").agg(
        F.sum(F.when(in_dec, F.col("x"))).alias("cum_cents"),
        F.max("n").alias("_n"),
        F.sum("x").alias("_s"),
        F.sum(F.col("rn") * F.col("x")).alias("_s1"),
    )
    return agg.select(
        "decile",
        F.col("cum_cents").cast("bigint").alias("cum_cents"),
        (F.col("cum_cents").cast("double") / F.col("_s")).alias(
            "cum_share"
        ),
        (
            2.0 * F.col("_s1").cast("double")
            / (F.col("_n").cast("double") * F.col("_s"))
            - (F.col("_n") + 1).cast("double") / F.col("_n")
        ).alias("gini"),
    ).orderBy("decile")


@register(
    "q_ratio_metric_ci",
    oracle="""
    WITH units AS (
      SELECT user_id % 2 AS arm,
             CAST(coalesce(sum(CASE WHEN event_type = 'purchase'
                  THEN CAST(round(value * 100) AS BIGINT) END), 0)
                  AS BIGINT) AS cents,
             CAST(count(*) AS BIGINT) AS n_events
      FROM events GROUP BY user_id
    ), m AS (
      SELECT arm, CAST(count(*) AS BIGINT) AS n,
             CAST(sum(cents) AS BIGINT) AS sx,
             CAST(sum(n_events) AS BIGINT) AS sy,
             CAST(sum(cents * cents) AS BIGINT) AS sxx,
             CAST(sum(n_events * n_events) AS BIGINT) AS syy,
             CAST(sum(cents * n_events) AS BIGINT) AS sxy
      FROM units GROUP BY arm
    ), s AS (
      SELECT arm, n, sx, sy,
             CAST(sx AS DOUBLE) / sy AS r,
             CAST(sy AS DOUBLE) / CAST(n AS DOUBLE) AS ybar,
             (CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * sx
                / CAST(n AS DOUBLE)) / (n - 1) AS varx,
             (CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * sy
                / CAST(n AS DOUBLE)) / (n - 1) AS vary,
             (CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * sy
                / CAST(n AS DOUBLE)) / (n - 1) AS covxy
      FROM m
    ), v AS (
      SELECT arm, n, sx, sy, r,
             (varx - 2 * r * covxy + r * r * vary)
               / (CAST(n AS DOUBLE) * ybar * ybar) AS var_r
      FROM s
    ), o AS (
      SELECT arm, n, sx AS sum_num, sy AS sum_den,
             CASE WHEN sy <> 0 THEN r END AS ratio,
             CASE WHEN n > 1 AND sy <> 0 AND var_r >= 0
                  THEN sqrt(var_r) END AS se
      FROM v
    )
    SELECT arm, n, sum_num, sum_den, ratio, se,
           ratio - 1.959963984540054 * se AS ci_lo,
           ratio + 1.959963984540054 * se AS ci_hi
    FROM o ORDER BY arm
    """,
)
def q_ratio_metric_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Delta-method CI for the ratio-of-sums metric
    (operators/experiments.ratio_metric_ci): per-arm
    revenue-per-event = sum(purchase cents)/sum(events) over USER
    units (the randomization unit — a per-event t-test would be wrong
    under within-user correlation). One per-user aggregate + one
    per-arm BIGINT moment aggregate; the CI is a pinned float chain on
    the 2-row relation."""
    from oakstore_spark.operators.experiments import ratio_metric_ci

    e = table(spark, sf_dir, "events")
    units = e.groupBy("user_id").agg(
        F.coalesce(
            F.sum(
                F.when(
                    F.col("event_type") == "purchase",
                    F.round(F.col("value") * 100).cast("bigint"),
                )
            ),
            F.lit(0),
        ).alias("cents"),
        F.count(F.lit(1)).alias("n_events"),
    ).withColumn("arm", F.col("user_id") % 2)
    return ratio_metric_ci(units, "arm", "cents", "n_events").orderBy(
        "arm"
    )


@register(
    "q_msprt",
    oracle="""
    WITH units AS (
      SELECT user_id % 2 AS arm,
             CAST(coalesce(sum(CASE WHEN event_type = 'purchase'
                  THEN CAST(round(value * 100) AS BIGINT) END), 0)
                  AS BIGINT) AS cents
      FROM events GROUP BY user_id
    ), m AS (
      SELECT arm, CAST(count(*) AS BIGINT) AS n,
             CAST(sum(cents) AS BIGINT) AS sx,
             CAST(sum(cents * cents) AS BIGINT) AS sx2
      FROM units GROUP BY arm
    ), a AS (
      SELECT n AS na, sx AS sa, sx2 AS qa FROM m WHERE arm = 0
    ), b AS (
      SELECT n AS nb, sx AS sb, sx2 AS qb FROM m WHERE arm = 1
    ), s AS (
      SELECT na, nb,
             CAST(sa AS DOUBLE) / na AS mean_a,
             CAST(sb AS DOUBLE) / nb AS mean_b,
             (CAST(qa AS DOUBLE) - CAST(sa AS DOUBLE) * sa / na)
               / (na - 1) / na
             + (CAST(qb AS DOUBLE) - CAST(sb AS DOUBLE) * sb / nb)
               / (nb - 1) / nb AS v
      FROM a CROSS JOIN b
    ), l AS (
      SELECT na, nb, mean_a, mean_b,
             mean_a - mean_b AS theta, v,
             CASE WHEN v > 0 THEN
               sqrt(v / (v + 10000.0))
               * exp((mean_a - mean_b) * (mean_a - mean_b) * 10000.0
                     / (2 * v * (v + 10000.0)))
             END AS lr
      FROM s
    )
    SELECT na, nb, mean_a, mean_b, theta, v, lr,
           least(1.0, 1 / lr) AS always_valid_p,
           CAST(lr >= (1.0 / 0.05) AS INT) AS reject
    FROM l
    """,
)
def q_msprt(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Always-valid sequential readout (operators/experiments.msprt):
    mSPRT likelihood ratio on per-user purchase cents, parity arms,
    N(0, tau2=10000 cents^2) mixing prior — the peek-proof decision
    boundary (reject when lr >= 1/alpha). Same one-hash-aggregate
    BIGINT moment sums as Welch; lr is a pinned sqrt/exp chain on two
    1-row relations (the <=1-ulp libm exp/sqrt divergence is absorbed
    by harness float rounding)."""
    from oakstore_spark.operators.experiments import msprt

    e = table(spark, sf_dir, "events")
    units = e.groupBy("user_id").agg(
        F.coalesce(
            F.sum(
                F.when(
                    F.col("event_type") == "purchase",
                    F.round(F.col("value") * 100).cast("bigint"),
                )
            ),
            F.lit(0),
        ).alias("cents"),
    ).withColumn("arm", F.col("user_id") % 2)
    out = msprt(units, "arm", "cents", 0, 1, tau2=10000.0, alpha=0.05)
    return out.withColumn("reject", F.col("reject").cast("int"))


@register(
    "q_msprt_curve",
    oracle="""
    WITH obs AS (
      SELECT user_id % 2 AS arm,
             CAST(floor(epoch_us(ts) / 86400000000) AS BIGINT) AS day,
             CAST(round(value * 100) AS BIGINT) AS x
      FROM events WHERE event_type = 'purchase'
    ), part AS (
      SELECT arm, day, CAST(count(*) AS BIGINT) AS n,
             CAST(sum(x) AS BIGINT) AS sx,
             CAST(sum(x * x) AS BIGINT) AS sx2
      FROM obs GROUP BY arm, day
    ), days AS (SELECT DISTINCT day FROM part
    ), j AS (
      SELECT d.day,
             coalesce(a.n, 0) AS n_a, coalesce(a.sx, 0) AS s_a,
             coalesce(a.sx2, 0) AS q_a,
             coalesce(b.n, 0) AS n_b, coalesce(b.sx, 0) AS s_b,
             coalesce(b.sx2, 0) AS q_b
      FROM days d
      LEFT JOIN part a ON a.day = d.day AND a.arm = 0
      LEFT JOIN part b ON b.day = d.day AND b.arm = 1
    ), cum AS (
      SELECT day,
             CAST(sum(n_a) OVER w AS BIGINT) AS na,
             CAST(sum(s_a) OVER w AS BIGINT) AS sa,
             CAST(sum(q_a) OVER w AS BIGINT) AS qa,
             CAST(sum(n_b) OVER w AS BIGINT) AS nb,
             CAST(sum(s_b) OVER w AS BIGINT) AS sb,
             CAST(sum(q_b) OVER w AS BIGINT) AS qb
      FROM j
      WINDOW w AS (ORDER BY day
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    ), s AS (
      SELECT day, na, nb,
             CASE WHEN na > 0
                  THEN CAST(sa AS DOUBLE) / na END AS mean_a,
             CASE WHEN nb > 0
                  THEN CAST(sb AS DOUBLE) / nb END AS mean_b,
             CASE WHEN na > 0 AND nb > 0
                  THEN CAST(sa AS DOUBLE) / na
                     - CAST(sb AS DOUBLE) / nb END AS theta,
             CASE WHEN na > 1
                  THEN (CAST(qa AS DOUBLE)
                        - CAST(sa AS DOUBLE) * sa / na) / (na - 1)
                  END / na
             + CASE WHEN nb > 1
                    THEN (CAST(qb AS DOUBLE)
                          - CAST(sb AS DOUBLE) * sb / nb) / (nb - 1)
                    END / nb AS v
      FROM cum
    ), l AS (
      SELECT day, na, nb, mean_a, mean_b, theta, v,
             CASE WHEN v > 0 THEN
               sqrt(v / (v + 10000.0))
               * exp(theta * theta * 10000.0
                     / (2 * v * (v + 10000.0)))
             END AS lr
      FROM s
    ), p AS (
      SELECT day, na, nb, mean_a, mean_b, theta, v, lr,
             least(1.0, 1 / lr) AS always_valid_p
      FROM l
    )
    SELECT day, na, nb, mean_a, mean_b, theta, v, lr,
           always_valid_p,
           min(always_valid_p) OVER w AS p_running,
           CAST((min(always_valid_p) OVER w) <= 0.05 AS INT)
             AS reject_by_now
    FROM p
    WINDOW w AS (ORDER BY day
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    ORDER BY day
    """,
)
def q_msprt_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """mSPRT monitoring curve (operators/experiments.msprt_curve):
    the always-valid readout evaluated at every UTC day boundary —
    the dashboard the sequential guarantee exists for (the
    running-minimum p is monotone; the first crossing is a valid
    stop). Per-event purchase cents, parity arms, tau2 = 10000. One
    hash aggregate to the (arm, day) partials; cumulative moments are
    exact BIGINT prefix window sums over the days-sized grid; each
    day's lambda is the pinned msprt float chain."""
    from oakstore_spark.operators.experiments import msprt_curve

    e = table(spark, sf_dir, "events").where(
        F.col("event_type") == "purchase"
    )
    obs = e.select(
        (F.col("user_id") % 2).alias("arm"),
        "ts",
        F.round(F.col("value") * 100).cast("bigint").alias("cents"),
    )
    return msprt_curve(
        obs, "arm", "cents", "ts", 0, 1, tau2=10000.0, alpha=0.05
    ).orderBy("day")


@register(
    "q_bootstrap_ci",
    oracle="""
    WITH units AS (
      SELECT user_id,
             user_id % 2 AS arm,
             CAST(coalesce(sum(CASE WHEN event_type = 'purchase'
                  THEN CAST(round(value * 100) AS BIGINT) END), 0)
                  AS BIGINT) AS cents
      FROM events GROUP BY user_id
    ), fanned AS (
      SELECT arm, cents, user_id, b.b AS b,
             CAST(('0x' || substr(md5(CAST(user_id AS VARCHAR) || ':'
                   || CAST(b.b AS VARCHAR)), 1, 15)) AS BIGINT) AS u60
      FROM units, (SELECT range AS b FROM range(100)) b
    ), weighted AS (
      SELECT arm, b, cents,
             CASE WHEN u60 < 424136118829305344 THEN 0
                  WHEN u60 < 848272237658610688 THEN 1
                  WHEN u60 < 1060340297073263360 THEN 2
                  WHEN u60 < 1131029650211480960 THEN 3
                  WHEN u60 < 1148701988496035328 THEN 4
                  WHEN u60 < 1152236456152946176 THEN 5
                  WHEN u60 < 1152825534095764608 THEN 6
                  WHEN u60 < 1152909688087595776 THEN 7
                  ELSE 8 END AS w
      FROM fanned
    ), reps AS (
      SELECT arm, b, CAST(sum(w) AS BIGINT) AS sw,
             CAST(sum(w * cents) AS BIGINT) AS swx
      FROM weighted GROUP BY arm, b
    ), means AS (
      SELECT arm, b,
             CASE WHEN sw > 0
                  THEN CAST(swx AS DOUBLE) / sw END AS m
      FROM reps
    ), ranked AS (
      SELECT arm, m,
             row_number() OVER (PARTITION BY arm ORDER BY m, b) AS rn,
             count(*) OVER (PARTITION BY arm) AS nb
      FROM means WHERE m IS NOT NULL
    ), bounds AS (
      SELECT arm,
             max(CASE WHEN rn = greatest(
                   CAST(ceil(0.025 * nb) AS BIGINT), 1)
                 THEN m END) AS boot_lo,
             max(CASE WHEN rn = CAST(ceil(0.975 * nb) AS BIGINT)
                 THEN m END) AS boot_hi
      FROM ranked GROUP BY arm
    ), point AS (
      SELECT arm, CAST(count(*) AS BIGINT) AS n_units,
             CAST(sum(cents) AS BIGINT) AS sx
      FROM units GROUP BY arm
    )
    SELECT p.arm, p.n_units,
           CAST(sx AS DOUBLE) / n_units AS point_mean,
           boot_lo, boot_hi
    FROM point p JOIN bounds USING (arm)
    ORDER BY arm
    """,
)
def q_bootstrap_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Poisson-bootstrap CI for per-arm mean purchase cents
    (operators/experiments.poisson_bootstrap_ci, Chamandy et al.
    2012): 100 replicates whose per-unit multiplicities are the
    Poisson(1) inverse CDF at a 60-bit md5 uniform — deterministic,
    engine-portable integer threshold comparisons, so DuckDB replays
    every replicate mean (exact BIGINT sums, one division) and both
    type-1 quantile bounds bit-for-bit. One explode + one hash
    aggregate to the (arm, 100) relation; nothing grows with data."""
    from oakstore_spark.operators.experiments import poisson_bootstrap_ci

    e = table(spark, sf_dir, "events")
    units = e.groupBy("user_id").agg(
        F.coalesce(
            F.sum(
                F.when(
                    F.col("event_type") == "purchase",
                    F.round(F.col("value") * 100).cast("bigint"),
                )
            ),
            F.lit(0),
        ).alias("cents"),
    ).withColumn("arm", F.col("user_id") % 2)
    return poisson_bootstrap_ci(
        units, "arm", "cents", "user_id", n_replicates=100
    ).orderBy("arm")


@register(
    "q_covariate_balance",
    oracle="""
    WITH units AS (
      SELECT user_id % 2 AS arm,
             CAST(coalesce(sum(CASE WHEN event_type = 'purchase'
                  AND ts < TIMESTAMP '2024-01-16'
                  THEN CAST(round(value * 100) AS BIGINT) END), 0)
                  AS BIGINT) AS pre_cents,
             CAST(count(*) AS BIGINT) AS n_events,
             CAST(count(DISTINCT CAST(ts AS DATE)) AS BIGINT)
               AS n_active_days
      FROM events GROUP BY user_id
    ), wide AS (
      SELECT c.covariate,
             CAST(sum(CASE WHEN arm = 0 AND
                  (CASE c.covariate WHEN 'pre_cents' THEN pre_cents
                       WHEN 'n_events' THEN n_events
                       ELSE n_active_days END) IS NOT NULL
                  THEN 1 ELSE 0 END) AS BIGINT)
               AS n_a,
             CAST(sum(CASE WHEN arm = 0 THEN
                  CASE c.covariate WHEN 'pre_cents' THEN pre_cents
                       WHEN 'n_events' THEN n_events
                       ELSE n_active_days END END) AS BIGINT) AS sa,
             CAST(sum(CASE WHEN arm = 0 THEN
                  CASE c.covariate WHEN 'pre_cents'
                         THEN pre_cents * pre_cents
                       WHEN 'n_events' THEN n_events * n_events
                       ELSE n_active_days * n_active_days END END)
                  AS BIGINT) AS qa,
             CAST(sum(CASE WHEN arm = 1 AND
                  (CASE c.covariate WHEN 'pre_cents' THEN pre_cents
                       WHEN 'n_events' THEN n_events
                       ELSE n_active_days END) IS NOT NULL
                  THEN 1 ELSE 0 END) AS BIGINT)
               AS n_b,
             CAST(sum(CASE WHEN arm = 1 THEN
                  CASE c.covariate WHEN 'pre_cents' THEN pre_cents
                       WHEN 'n_events' THEN n_events
                       ELSE n_active_days END END) AS BIGINT) AS sb,
             CAST(sum(CASE WHEN arm = 1 THEN
                  CASE c.covariate WHEN 'pre_cents'
                         THEN pre_cents * pre_cents
                       WHEN 'n_events' THEN n_events * n_events
                       ELSE n_active_days * n_active_days END END)
                  AS BIGINT) AS qb
      FROM units,
           (SELECT unnest(['pre_cents', 'n_events', 'n_active_days'])
              AS covariate) c
      GROUP BY c.covariate
    ), s AS (
      SELECT covariate, n_a, n_b,
             CAST(sa AS DOUBLE) / n_a AS mean_a,
             CAST(sb AS DOUBLE) / n_b AS mean_b,
             CASE WHEN n_a > 1
                  THEN (CAST(qa AS DOUBLE)
                        - CAST(sa AS DOUBLE) * sa / n_a) / (n_a - 1)
                  END AS var_a,
             CASE WHEN n_b > 1
                  THEN (CAST(qb AS DOUBLE)
                        - CAST(sb AS DOUBLE) * sb / n_b) / (n_b - 1)
                  END AS var_b
      FROM wide
    )
    SELECT covariate, n_a, n_b, mean_a, mean_b, var_a, var_b,
           CASE WHEN (var_a + var_b) / 2 > 0
                THEN (mean_a - mean_b) / sqrt((var_a + var_b) / 2)
                END AS smd
    FROM s ORDER BY covariate
    """,
)
def q_covariate_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Covariate balance / SMD check
    (operators/experiments.covariate_balance): pre-period purchase
    cents, event count and active days per user against the parity
    arms — the randomization design check run next to the SRM gate
    (|smd| < 0.1 = balanced). ONE wide hash aggregate computes all
    three covariates' per-arm BIGINT moments in a single pass; the
    per-covariate rows are a literal-sized unpivot."""
    from oakstore_spark.operators.experiments import covariate_balance

    e = table(spark, sf_dir, "events")
    units = e.groupBy("user_id").agg(
        F.coalesce(
            F.sum(
                F.when(
                    (F.col("event_type") == "purchase")
                    & (F.col("ts") < F.lit("2024-01-16").cast("timestamp")),
                    F.round(F.col("value") * 100).cast("bigint"),
                )
            ),
            F.lit(0),
        ).alias("pre_cents"),
        F.count(F.lit(1)).alias("n_events"),
        F.countDistinct(F.col("ts").cast("date")).alias(
            "n_active_days"
        ),
    ).withColumn("arm", F.col("user_id") % 2)
    return covariate_balance(
        units, "arm", ["pre_cents", "n_events", "n_active_days"], 0, 1
    ).orderBy("covariate")


@register(
    "q_power_analysis",
    oracle="""
    WITH units AS (
      SELECT user_id % 2 AS arm,
             CAST(coalesce(sum(CASE WHEN event_type = 'purchase'
                  THEN CAST(round(value * 100) AS BIGINT) END), 0)
                  AS BIGINT) AS cents
      FROM events GROUP BY user_id
    ), per_arm AS (
      SELECT arm, CAST(count(*) AS BIGINT) AS n,
             CAST(sum(cents) AS BIGINT) AS s,
             CAST(sum(cents * cents) AS BIGINT) AS q
      FROM units GROUP BY arm
    ), rows_ss AS (
      SELECT arm, n,
             CAST(q AS DOUBLE) - CAST(s AS DOUBLE) * s / n AS ss
      FROM per_arm
    ), agg AS (
      SELECT CAST(count(*) AS BIGINT) AS n_arms,
             CAST(min(n) AS BIGINT) AS n_min_arm,
             CAST(sum(n) AS BIGINT) AS n_tot,
             list_reduce(
               list_prepend(CAST(0.0 AS DOUBLE),
                            list(ss ORDER BY arm)),
               (a, b) -> a + b) AS ss_tot
      FROM rows_ss
    )
    SELECT n_arms, n_min_arm,
           ss_tot / CAST(n_tot - n_arms AS DOUBLE) AS var_pooled,
           7.848879734349088 * 2
             * (ss_tot / CAST(n_tot - n_arms AS DOUBLE))
             / 250000.0 AS n_required_per_arm,
           sqrt(7.848879734349088 * 2
                * (ss_tot / CAST(n_tot - n_arms AS DOUBLE))
                / n_min_arm) AS mde_at_current_n
    FROM agg
    """,
)
def q_power_analysis(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Experiment power / sample-size planner
    (operators/experiments.power_analysis): pooled within-arm variance
    of per-user purchase cents (one hash aggregate; the cross-arm SS
    combination is a FIXED-ORDER fold over the arm-sorted list — the
    only way a cross-row double sum replays), then the classical
    n = (z_a+z_b)^2*2*var/mde^2 for a 500-cent MDE and the inverse
    MDE detectable at today's per-arm n — the design readout run with
    the SRM gate and the covariate-balance check."""
    from oakstore_spark.operators.experiments import power_analysis

    e = table(spark, sf_dir, "events")
    units = e.groupBy("user_id").agg(
        F.coalesce(
            F.sum(
                F.when(
                    F.col("event_type") == "purchase",
                    F.round(F.col("value") * 100).cast("bigint"),
                )
            ),
            F.lit(0),
        ).alias("cents"),
    ).withColumn("arm", F.col("user_id") % 2)
    return power_analysis(units, "arm", "cents", mde_abs=500.0)


@register(
    "q_qini_curve",
    oracle="""
    WITH units AS (
      SELECT user_id,
             user_id % 2 AS arm,
             CAST(coalesce(sum(CASE WHEN event_type = 'purchase'
                  AND ts < TIMESTAMP '2024-01-16'
                  THEN CAST(round(value * 100) AS BIGINT) END), 0)
                  AS BIGINT) AS score,
             CAST(max(CASE WHEN event_type = 'purchase'
                  AND value > 200 THEN 1 ELSE 0 END) AS BIGINT)
               AS converted
      FROM events GROUP BY user_id
    ), ranked AS (
      SELECT CASE WHEN arm = 1 THEN 1 ELSE 0 END AS t,
             converted AS y,
             row_number() OVER (ORDER BY score DESC, user_id) AS rn,
             count(*) OVER () AS n
      FROM units
    ), j AS (
      SELECT g.bucket, r.t, r.y
      FROM (SELECT range AS bucket FROM range(1, 11)) g
      JOIN ranked r ON r.rn * 10 <= g.bucket * r.n
    ), agg AS (
      SELECT bucket,
             CAST(sum(t) AS BIGINT) AS n_t,
             CAST(coalesce(sum(CASE WHEN t = 1 THEN y END), 0)
                  AS BIGINT) AS conv_t,
             CAST(sum(1 - t) AS BIGINT) AS n_c,
             CAST(coalesce(sum(CASE WHEN t = 0 THEN y END), 0)
                  AS BIGINT) AS conv_c
      FROM j GROUP BY bucket
    )
    SELECT bucket, n_t, conv_t, n_c, conv_c,
           CASE WHEN n_c > 0 THEN
             conv_t - CAST(conv_c AS DOUBLE) * n_t / n_c END AS qini,
           CASE WHEN n_t > 0 AND n_c > 0 THEN
             CAST(conv_t AS DOUBLE) / n_t
               - CAST(conv_c AS DOUBLE) / n_c END AS uplift
    FROM agg ORDER BY bucket
    """,
)
def q_qini_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Qini / uplift curve (operators/experiments.qini_curve): users
    ranked by pre-period spend as the targeting score, parity arms
    (arm 1 'treated'), big-purchase conversion as the outcome — at
    each top-d decile, the incremental conversions the treatment
    produced there (control rescaled to treated volume). Pure-integer
    decile membership, exact BIGINT counts, pinned qini/uplift chains
    — the whole curve replays bit-for-bit."""
    from oakstore_spark.operators.experiments import qini_curve

    e = table(spark, sf_dir, "events")
    units = e.groupBy("user_id").agg(
        F.coalesce(
            F.sum(
                F.when(
                    (F.col("event_type") == "purchase")
                    & (F.col("ts") < F.lit("2024-01-16").cast("timestamp")),
                    F.round(F.col("value") * 100).cast("bigint"),
                )
            ),
            F.lit(0),
        ).alias("score"),
        F.max(
            F.when(
                (F.col("event_type") == "purchase")
                & (F.col("value") > 200),
                1,
            ).otherwise(0)
        ).cast("bigint").alias("converted"),
    ).withColumn("arm", F.col("user_id") % 2)
    return qini_curve(
        units, "score", "arm", "converted", "user_id", treated=1,
        n_buckets=10,
    ).orderBy("bucket")


@register(
    "q_post_stratified",
    oracle="""
    WITH units AS (
      SELECT user_id % 2 AS arm, (user_id // 2) % 4 AS stratum,
             CAST(coalesce(sum(CASE WHEN event_type = 'purchase'
                  THEN CAST(round(value * 100) AS BIGINT) END), 0)
                  AS BIGINT) AS cents
      FROM events GROUP BY user_id
    ), cells AS (
      SELECT arm, stratum, CAST(count(cents) AS BIGINT) AS n_cell,
             CAST(sum(cents) AS BIGINT) AS sx_cell
      FROM units GROUP BY arm, stratum
      HAVING count(cents) > 0
    ), strata AS (
      SELECT stratum, CAST(sum(n_cell) AS BIGINT) AS n_s
      FROM cells GROUP BY stratum
    ), tot AS (
      SELECT CAST(sum(n_s) AS BIGINT) AS n_tot,
             CAST(count(*) AS BIGINT) AS n_strata
      FROM strata
    ), j AS (
      SELECT c.arm, c.stratum, c.n_cell, c.sx_cell,
             (CAST(s.n_s AS DOUBLE) / t.n_tot)
               * (CAST(c.sx_cell AS DOUBLE) / c.n_cell) AS term,
             t.n_strata
      FROM cells c JOIN strata s USING (stratum) CROSS JOIN tot t
    ), per_arm AS (
      SELECT arm,
             CAST(sum(n_cell) AS BIGINT) AS n_units,
             CAST(count(*) AS BIGINT) AS n_strata_covered,
             CAST(sum(sx_cell) AS BIGINT) AS sx,
             max(n_strata) AS ns,
             list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
                         list(term ORDER BY stratum)),
                         (a, b) -> a + b) AS post
      FROM j GROUP BY arm
    )
    SELECT arm, n_units, n_strata_covered,
           CAST(sx AS DOUBLE) / n_units AS raw_mean,
           CASE WHEN n_strata_covered = ns THEN post END
             AS post_strat_mean
    FROM per_arm ORDER BY arm
    """,
)
def q_post_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Post-stratification adjusted means
    (operators/experiments.post_stratified_mean): per-user purchase
    cents across parity arms, reweighted by pooled stratum shares
    over a 4-way deterministic stratum — the categorical-covariate
    variance-reduction readout next to CUPED. One hash aggregate to
    the (arm, stratum) moments; the cross-strata sum is a
    fixed-order stratum-sorted fold, so every float replays."""
    from oakstore_spark.operators.experiments import (
        post_stratified_mean,
    )

    e = table(spark, sf_dir, "events")
    units = e.groupBy("user_id").agg(
        F.coalesce(
            F.sum(
                F.when(
                    F.col("event_type") == "purchase",
                    F.round(F.col("value") * 100).cast("bigint"),
                )
            ),
            F.lit(0),
        ).alias("cents"),
    ).select(
        (F.col("user_id") % 2).alias("arm"),
        ((F.col("user_id") / 2).cast("bigint") % 4).alias("stratum"),
        "cents",
    )
    return post_stratified_mean(
        units, "arm", "stratum", "cents"
    ).orderBy("arm")


@register("q_uplift_two_model")
def q_uplift_two_model(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Uplift model TRAINED in-engine then evaluated end-to-end
    (operators/experiments.uplift_two_model -> qini_curve): a
    T-learner — one distributed-IRLS logistic fit per parity arm on
    pre-period behavior features (spend, activity), uplift score =
    p_treated - p_control per user — whose score ranking is then read
    out as the 10-bucket Qini curve. Rows-only (the fit is iterative,
    not SQL-expressible — the q_quality_classifier precedent); the
    planted heterogeneous-effect recovery is pinned in
    tests/test_curation.py::test_uplift_two_model_recovers_planted_segment."""
    from oakstore_spark.operators.experiments import (
        qini_curve,
        uplift_two_model,
    )

    e = table(spark, sf_dir, "events")
    cutoff = F.lit("2024-01-16").cast("timestamp")
    units = e.groupBy("user_id").agg(
        F.coalesce(
            F.sum(
                F.when(
                    (F.col("event_type") == "purchase")
                    & (F.col("ts") < cutoff),
                    F.round(F.col("value") * 100).cast("bigint"),
                )
            ),
            F.lit(0),
        ).alias("pre_cents"),
        F.sum(
            F.when(F.col("ts") < cutoff, 1).otherwise(0)
        ).alias("pre_events"),
        F.max(
            F.when(
                (F.col("event_type") == "purchase")
                & (F.col("value") > 200),
                1,
            ).otherwise(0)
        ).cast("bigint").alias("converted"),
    ).withColumn("arm", F.col("user_id") % 2)
    # feature scaling keeps the IRLS Gram well-conditioned (the
    # q_quality_classifier /1000 convention)
    units = units.select(
        "user_id",
        "arm",
        "converted",
        (F.col("pre_cents") / 10000.0).alias("f_spend"),
        (F.col("pre_events") / 10.0).alias("f_act"),
    )
    scored = uplift_two_model(
        units,
        "arm",
        ["f_spend", "f_act"],
        "converted",
        treated=1,
        n_iter=4,
    )
    return qini_curve(
        scored, "uplift_score", "arm", "converted", "user_id",
        treated=1, n_buckets=10,
    ).orderBy("bucket")


@register(
    "q_uplift_scoring",
    oracle="""
    WITH units AS (
      SELECT user_id, user_id % 2 AS arm,
             CAST(coalesce(sum(CASE WHEN event_type = 'purchase'
                  AND ts < TIMESTAMP '2024-01-16'
                  THEN CAST(round(value * 100) AS BIGINT) END), 0)
                  AS BIGINT) / 10000.0 AS f_spend,
             CAST(sum(CASE WHEN ts < TIMESTAMP '2024-01-16'
                  THEN 1 ELSE 0 END) AS BIGINT) / 10.0 AS f_act,
             CAST(max(CASE WHEN event_type = 'purchase'
                  AND value > 200 THEN 1 ELSE 0 END) AS BIGINT)
               AS converted
      FROM events GROUP BY user_id
    ), scored AS (
      SELECT user_id, arm, converted,
             CAST(floor((
               1.0 / (1.0 + exp(-(-1.0 + 0.5 * f_spend
                                  + -0.25 * f_act)))
               - 1.0 / (1.0 + exp(-(-0.5 + 0.25 * f_spend
                                    + 0.125 * f_act)))
             ) * 1048576.0) AS BIGINT) AS score_m
      FROM units
    ), ranked AS (
      SELECT CASE WHEN arm = 1 THEN 1 ELSE 0 END AS t,
             converted AS y,
             row_number() OVER (ORDER BY score_m DESC, user_id) AS rn,
             count(*) OVER () AS n
      FROM scored
    ), j AS (
      SELECT g.bucket, r.t, r.y
      FROM (SELECT range AS bucket FROM range(1, 11)) g
      JOIN ranked r ON r.rn * 10 <= g.bucket * r.n
    ), agg AS (
      SELECT bucket,
             CAST(sum(t) AS BIGINT) AS n_t,
             CAST(coalesce(sum(CASE WHEN t = 1 THEN y END), 0)
                  AS BIGINT) AS conv_t,
             CAST(sum(1 - t) AS BIGINT) AS n_c,
             CAST(coalesce(sum(CASE WHEN t = 0 THEN y END), 0)
                  AS BIGINT) AS conv_c
      FROM j GROUP BY bucket
    )
    SELECT bucket, n_t, conv_t, n_c, conv_c,
           CASE WHEN n_c > 0 THEN
             conv_t - CAST(conv_c AS DOUBLE) * n_t / n_c END AS qini,
           CASE WHEN n_t > 0 AND n_c > 0 THEN
             CAST(conv_t AS DOUBLE) / n_t
               - CAST(conv_c AS DOUBLE) / n_c END AS uplift
    FROM agg ORDER BY bucket
    """,
)
def q_uplift_scoring(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Uplift SCORING + Qini readout under pinned literal weights
    (operators/experiments.score_uplift -> qini_curve) — the r12
    verdict's fit/score split: q_uplift_two_model stays the rows-only
    end-to-end row (its IRLS fit is iterative), while THIS query holds
    the entire downstream chain — two sigmoids with dyadic weight
    vectors, the uplift difference, a 2^20-scale integer floor of the
    score (so bucket membership never rides on a final-ulp exp
    disagreement), the (score desc, id) ranking and the exact-BIGINT
    Qini buckets — to a full DuckDB oracle, shrinking the unverified
    surface to the solve itself."""
    from oakstore_spark.operators.experiments import (
        qini_curve,
        score_uplift,
    )

    e = table(spark, sf_dir, "events")
    cutoff = F.lit("2024-01-16").cast("timestamp")
    units = e.groupBy("user_id").agg(
        F.coalesce(
            F.sum(
                F.when(
                    (F.col("event_type") == "purchase")
                    & (F.col("ts") < cutoff),
                    F.round(F.col("value") * 100).cast("bigint"),
                )
            ),
            F.lit(0),
        ).alias("pre_cents"),
        F.sum(
            F.when(F.col("ts") < cutoff, 1).otherwise(0)
        ).cast("bigint").alias("pre_events"),
        F.max(
            F.when(
                (F.col("event_type") == "purchase")
                & (F.col("value") > 200),
                1,
            ).otherwise(0)
        ).cast("bigint").alias("converted"),
    ).select(
        "user_id",
        (F.col("user_id") % 2).alias("arm"),
        "converted",
        (F.col("pre_cents") / 10000.0).alias("f_spend"),
        (F.col("pre_events") / 10.0).alias("f_act"),
    )
    scored = score_uplift(
        units, ["f_spend", "f_act"],
        w_t=[-1.0, 0.5, -0.25], w_c=[-0.5, 0.25, 0.125],
    ).select(
        "user_id", "arm", "converted",
        F.floor(F.col("uplift_score") * 1048576.0).cast("bigint")
        .alias("score_m"),
    )
    return qini_curve(
        scored, "score_m", "arm", "converted", "user_id", treated=1,
        n_buckets=10,
    ).orderBy("bucket")


_SCORED_UNITS_CTE = """
      SELECT user_id,
             least(CAST(floor(coalesce(sum(CASE WHEN event_type = 'purchase'
                  AND ts < TIMESTAMP '2024-01-16'
                  THEN CAST(round(value * 100) AS BIGINT) END), 0)
                  / 100.0) AS BIGINT), 1000) AS score_m,
             CAST(max(CASE WHEN event_type = 'purchase'
                  AND value > 200 THEN 1 ELSE 0 END) AS BIGINT) AS y
      FROM events GROUP BY user_id
"""


def _scored_units(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shared fixture for the classifier-eval queries: per-user
    integer milli-score (pre-period spend, floored to cents/100 and
    capped at 1000) against the big-purchase conversion label — a
    deterministic, correlated (score, label) pair both engines
    rebuild identically."""
    e = table(spark, sf_dir, "events")
    return e.groupBy("user_id").agg(
        F.least(
            F.floor(
                F.coalesce(
                    F.sum(
                        F.when(
                            (F.col("event_type") == "purchase")
                            & (
                                F.col("ts")
                                < F.lit("2024-01-16").cast("timestamp")
                            ),
                            F.round(F.col("value") * 100).cast(
                                "bigint"
                            ),
                        )
                    ),
                    F.lit(0),
                )
                / 100.0
            ).cast("bigint"),
            F.lit(1000),
        ).alias("score_m"),
        F.max(
            F.when(
                (F.col("event_type") == "purchase")
                & (F.col("value") > 200),
                1,
            ).otherwise(0)
        ).cast("bigint").alias("y"),
    )


@register(
    "q_roc_auc",
    oracle=f"""
    WITH units AS ({_SCORED_UNITS_CTE}
    ), per_s AS (
      SELECT score_m AS s,
             CAST(sum(y) AS BIGINT) AS np_s,
             CAST(sum(1 - y) AS BIGINT) AS nn_s
      FROM units GROUP BY score_m
    ), staged AS (
      SELECT s, np_s, nn_s,
             CAST(coalesce(sum(nn_s) OVER (ORDER BY s
                  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                  0) AS BIGINT) AS cum_neg_below
      FROM per_s
    ), agg AS (
      SELECT CAST(sum(np_s) AS BIGINT) AS n_pos,
             CAST(sum(nn_s) AS BIGINT) AS n_neg,
             CAST(count(*) AS BIGINT) AS n_scores,
             CAST(sum(np_s * (2 * cum_neg_below + nn_s)) AS BIGINT)
               AS u2
      FROM staged
    )
    SELECT n_pos, n_neg, n_scores, u2,
           CASE WHEN n_pos > 0 AND n_neg > 0
                THEN CAST(u2 AS DOUBLE)
                     / (2 * CAST(n_pos AS DOUBLE) * n_neg) END AS auc
    FROM agg
    """,
)
def q_roc_auc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact ROC AUC (operators/quality.roc_auc) of the pre-period
    spend score against big-purchase conversion: the Mann-Whitney
    rank identity computed over the DISTINCT-SCORE relation with
    half-ties doubled into exact BIGINTs — 2U = sum np_s*(2*cum_neg
    + nn_s), auc one pinned division. No per-row global rank."""
    from oakstore_spark.operators.quality import roc_auc

    return roc_auc(_scored_units(spark, sf_dir), "score_m", "y")


@register(
    "q_grouped_auc",
    oracle=f"""
    WITH units AS ({_SCORED_UNITS_CTE}
    ), seg AS (
      SELECT user_id % 8 AS segment, score_m, y FROM units
    ), per_s AS (
      SELECT segment, score_m AS s,
             CAST(sum(y) AS BIGINT) AS np_s,
             CAST(sum(1 - y) AS BIGINT) AS nn_s
      FROM seg GROUP BY segment, score_m
    ), staged AS (
      SELECT segment, s, np_s, nn_s,
             CAST(coalesce(sum(nn_s) OVER (PARTITION BY segment
                  ORDER BY s
                  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                  0) AS BIGINT) AS cum_neg_below
      FROM per_s
    ), agg AS (
      SELECT segment,
             CAST(sum(np_s) AS BIGINT) AS n_pos,
             CAST(sum(nn_s) AS BIGINT) AS n_neg,
             CAST(count(*) AS BIGINT) AS n_scores,
             CAST(sum(np_s * (2 * cum_neg_below + nn_s)) AS BIGINT)
               AS u2
      FROM staged GROUP BY segment
    )
    SELECT segment, n_pos, n_neg, n_scores, u2,
           CASE WHEN n_pos > 0 AND n_neg > 0
                THEN CAST(u2 AS DOUBLE)
                     / (2 * CAST(n_pos AS DOUBLE) * n_neg) END AS auc
    FROM agg ORDER BY segment
    """,
)
def q_grouped_auc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-SEGMENT exact ROC AUC (operators/quality.grouped_auc, r14)
    — the fairness/slice-eval table next to q_roc_auc's global
    scalar: the same Mann-Whitney rank identity with half-ties
    doubled into exact BIGINTs, keyed by a deterministic cohort
    (user_id %% 8). One hash aggregate to the (segment x score)
    relation, one keyed prefix window bounded by score cardinality,
    one pinned division per segment."""
    from oakstore_spark.operators.quality import grouped_auc

    units = _scored_units(spark, sf_dir).withColumn(
        "segment", (F.col("user_id") % 8).cast("bigint")
    )
    return grouped_auc(
        units, ["segment"], "score_m", "y"
    ).orderBy("segment")


@register(
    "q_trimmed_mean",
    oracle="""
    WITH units AS (
      SELECT user_id % 2 AS arm,
             CAST(coalesce(sum(CASE WHEN event_type = 'purchase'
                  THEN CAST(round(value * 100) AS BIGINT) END), 0)
                  AS BIGINT) AS v
      FROM events GROUP BY user_id
    ), per_v AS (
      SELECT arm, v, CAST(count(*) AS BIGINT) AS c
      FROM units GROUP BY arm, v
    ), staged AS (
      SELECT arm, v, c,
             CAST(coalesce(sum(c) OVER (PARTITION BY arm ORDER BY v
                  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                  0) AS BIGINT) AS cum,
             CAST(sum(c) OVER (PARTITION BY arm) AS BIGINT) AS n
      FROM per_v
    ), kept AS (
      SELECT arm, n,
             CAST(floor(0.05 * n) AS BIGINT) AS k,
             greatest(CAST(0 AS BIGINT),
               least(cum + c, n - CAST(floor(0.05 * n) AS BIGINT))
               - greatest(cum, CAST(floor(0.05 * n) AS BIGINT)))
               AS keep_c,
             v
      FROM staged
    ), per_arm AS (
      SELECT arm, CAST(max(n) AS BIGINT) AS n,
             CAST(max(k) AS BIGINT) AS k,
             CAST(sum(v * keep_c) AS BIGINT) AS tsum
      FROM kept GROUP BY arm
    )
    SELECT
      (SELECT n FROM per_arm WHERE arm = 0) AS n_a,
      (SELECT n FROM per_arm WHERE arm = 1) AS n_b,
      (SELECT k FROM per_arm WHERE arm = 0) AS k_a,
      (SELECT k FROM per_arm WHERE arm = 1) AS k_b,
      (SELECT tsum FROM per_arm WHERE arm = 0) AS trimmed_sum_a,
      (SELECT tsum FROM per_arm WHERE arm = 1) AS trimmed_sum_b,
      round((SELECT CAST(tsum AS DOUBLE) / (n - 2 * k) FROM per_arm
             WHERE arm = 0 AND n - 2 * k > 0), 6) AS mean_a,
      round((SELECT CAST(tsum AS DOUBLE) / (n - 2 * k) FROM per_arm
             WHERE arm = 1 AND n - 2 * k > 0), 6) AS mean_b,
      round((SELECT CAST(a.tsum AS DOUBLE) / (a.n - 2 * a.k)
                    - CAST(b.tsum AS DOUBLE) / (b.n - 2 * b.k)
             FROM per_arm a, per_arm b
             WHERE a.arm = 0 AND b.arm = 1
               AND a.n - 2 * a.k > 0 AND b.n - 2 * b.k > 0), 6)
        AS diff
    """,
)
def q_trimmed_mean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """5%%-trimmed-mean A/B difference
    (operators/experiments.trimmed_mean_diff, r15): per-user total
    purchase CENTS (the whale-dominated metric), parity arms — exact
    order-statistics arithmetic over per-arm distinct-value cells
    (clamped rank-overlap kept counts, BIGINT trimmed sums), one
    pinned division per mean."""
    from oakstore_spark.operators.experiments import trimmed_mean_diff

    e = table(spark, sf_dir, "events")
    cents = F.when(
        F.col("event_type") == "purchase",
        F.round(F.col("value") * 100).cast("bigint"),
    )
    units = e.groupBy("user_id").agg(
        (F.first("user_id") % 2).alias("arm"),
        F.coalesce(F.sum(cents), F.lit(0)).cast("bigint").alias("v"),
    )
    out = trimmed_mean_diff(units, "arm", "v", 0, 1, trim_frac=0.05)
    return out.select(
        "n_a", "n_b", "k_a", "k_b", "trimmed_sum_a", "trimmed_sum_b",
        F.round("mean_a", 6).alias("mean_a"),
        F.round("mean_b", 6).alias("mean_b"),
        F.round("diff", 6).alias("diff"),
    )


@register(
    "q_rank_sum",
    oracle="""
    WITH units AS (
      SELECT user_id % 2 AS arm,
             CAST(floor(coalesce(sum(CASE WHEN event_type = 'purchase'
                  THEN CAST(round(value * 100) AS BIGINT) END), 0)
                  / 100.0) AS BIGINT) AS v
      FROM events GROUP BY user_id
    ), per_v AS (
      SELECT v,
             CAST(sum(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS BIGINT)
               AS na_v,
             CAST(sum(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS BIGINT)
               AS nb_v
      FROM units GROUP BY v
    ), staged AS (
      SELECT v, na_v, nb_v,
             CAST(coalesce(sum(nb_v) OVER (ORDER BY v
                  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                  0) AS BIGINT) AS cum_b_below
      FROM per_v
    ), agg AS (
      SELECT CAST(sum(na_v) AS BIGINT) AS n_a,
             CAST(sum(nb_v) AS BIGINT) AS n_b,
             CAST(count(*) AS BIGINT) AS n_values,
             CAST(sum(na_v * (2 * cum_b_below + nb_v)) AS BIGINT)
               AS u2,
             CAST(sum((na_v + nb_v) * (na_v + nb_v) * (na_v + nb_v)
                      - (na_v + nb_v)) AS BIGINT) AS tie_cubes
      FROM staged
    )
    SELECT n_a, n_b, n_values, u2, tie_cubes,
           round(CASE WHEN n_a > 0 AND n_b > 0 AND
                 (CAST(n_a AS DOUBLE) * n_b * (n_a + n_b + 1) / 12.0
                  - CAST(n_a AS DOUBLE) * n_b * tie_cubes
                    / (12.0 * (n_a + n_b) * (n_a + n_b - 1))) > 0
                 THEN (CAST(u2 AS DOUBLE) / 2.0
                       - CAST(n_a AS DOUBLE) * n_b / 2.0)
                      / sqrt(CAST(n_a AS DOUBLE) * n_b
                             * ((n_a + n_b) + 1) / 12.0
                             - CAST(n_a AS DOUBLE) * n_b * tie_cubes
                               / (12.0 * (n_a + n_b)
                                  * ((n_a + n_b) - 1)))
                 END, 6) AS z,
           round(CASE WHEN n_a > 0 AND n_b > 0
                 THEN CAST(u2 AS DOUBLE)
                      / (2.0 * CAST(n_a AS DOUBLE) * n_b) END, 6)
             AS auc_a
    FROM agg
    """,
)
def q_rank_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wilcoxon-Mann-Whitney rank-sum test
    (operators/experiments.rank_sum_test, r15): the distribution-free
    A/B verdict on per-user total purchase DOLLARS (heavy-tailed —
    exactly where q_ab_experiment's Welch t is fragile), parity arms.
    2U exact BIGINT via the roc_auc rank identity, tie correction
    from exact pooled tie-group cubes, z one pinned chain."""
    from oakstore_spark.operators.experiments import rank_sum_test

    e = table(spark, sf_dir, "events")
    cents = F.when(
        F.col("event_type") == "purchase",
        F.round(F.col("value") * 100).cast("bigint"),
    )
    units = e.groupBy("user_id").agg(
        (F.first("user_id") % 2).alias("arm"),
        F.floor(
            F.coalesce(F.sum(cents), F.lit(0)) / 100.0
        ).cast("bigint").alias("v"),
    )
    out = rank_sum_test(units, "arm", "v", 0, 1)
    return out.select(
        "n_a", "n_b", "n_values", "u2", "tie_cubes",
        F.round("z", 6).alias("z"),
        F.round("auc_a", 6).alias("auc_a"),
    )


@register(
    "q_psm_att",
    oracle="""
    WITH units AS (
      SELECT user_id,
             CASE WHEN user_id % 3 = 0 THEN 1 ELSE 0 END AS t,
             least(CAST(floor(coalesce(sum(CASE WHEN event_type = 'purchase'
                  AND ts < TIMESTAMP '2024-01-16'
                  THEN CAST(round(value * 100) AS BIGINT) END), 0)
                  / 100.0) AS BIGINT), 1000) AS s,
             CAST(coalesce(sum(CASE WHEN event_type = 'purchase'
                  AND ts >= TIMESTAMP '2024-01-16'
                  THEN CAST(round(value * 100) AS BIGINT) END), 0)
                  AS BIGINT) AS y
      FROM events GROUP BY user_id
    ), cells AS (
      SELECT t, s, CAST(count(*) AS BIGINT) AS n,
             CAST(sum(y) AS BIGINT) AS sum_y
      FROM units GROUP BY 1, 2
    ), tc AS (
      SELECT s, n AS n_t, sum_y AS sum_yt FROM cells WHERE t = 1
    ), cc AS (
      SELECT s AS s_c, n AS n_c, sum_y AS sum_yc
      FROM cells WHERE t = 0
    ), m AS (
      SELECT s, n_t, sum_yt, s_c, n_c, sum_yc,
             abs(s - s_c) AS dist,
             row_number() OVER (
               PARTITION BY s ORDER BY abs(s - s_c), s_c) AS rk
      FROM tc CROSS JOIN cc
    ), mm AS (
      SELECT *, dist <= 25 AS ok FROM m WHERE rk = 1
    ), agg AS (
      SELECT
        CAST(coalesce(sum(CASE WHEN ok THEN n_t END), 0) AS BIGINT)
          AS n_matched,
        CAST(coalesce(sum(CASE WHEN NOT ok THEN n_t END), 0)
             AS BIGINT) AS n_unmatched,
        CAST(coalesce(sum(CASE WHEN ok THEN sum_yt END), 0)
             AS BIGINT) AS sum_y_treated,
        list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
          list(CASE WHEN ok
                    THEN n_t * (CAST(sum_yc AS DOUBLE) / n_c)
                    ELSE 0.0 END ORDER BY s)),
          (a, c) -> a + c) AS ctrl_fold
      FROM mm
    )
    SELECT
      (SELECT CAST(coalesce(sum(n), 0) AS BIGINT) FROM cells
        WHERE t = 1) AS n_treated,
      (SELECT CAST(coalesce(sum(n), 0) AS BIGINT) FROM cells
        WHERE t = 0) AS n_control,
      n_matched, n_unmatched, sum_y_treated,
      round(CASE WHEN n_matched > 0
            THEN (sum_y_treated - ctrl_fold) / n_matched END, 6)
        AS att,
      round(CASE WHEN n_matched > 0
            THEN CAST(sum_y_treated AS DOUBLE) / n_matched END, 6)
        AS mean_treated,
      round(CASE WHEN n_matched > 0
            THEN ctrl_fold / n_matched END, 6)
        AS mean_matched_control
    FROM agg
    """,
)
def q_psm_att(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Propensity-score matching ATT (operators/experiments.psm_att,
    r15): treated cohort user_id %% 3 == 0, integer milli-propensity
    = the pre-period spend score, outcome = post-period purchase
    cents. Score-cell collapse (one hash aggregate per arm, counted
    cells guard), broadcast nearest-control-score match with the
    (|diff|, lower-score) deterministic tie-break, caliper 25, and
    fixed-order s-ascending folds for every cross-cell float sum —
    the whole estimate replays in SQL."""
    from oakstore_spark.operators.experiments import psm_att

    e = table(spark, sf_dir, "events")
    pre = F.when(
        (F.col("event_type") == "purchase")
        & (F.col("ts") < F.lit("2024-01-16").cast("timestamp")),
        F.round(F.col("value") * 100).cast("bigint"),
    )
    post = F.when(
        (F.col("event_type") == "purchase")
        & (F.col("ts") >= F.lit("2024-01-16").cast("timestamp")),
        F.round(F.col("value") * 100).cast("bigint"),
    )
    units = e.groupBy("user_id").agg(
        F.when(F.col("user_id") % 3 == 0, 1).otherwise(0).alias("t"),
        F.least(
            F.floor(F.coalesce(F.sum(pre), F.lit(0)) / 100.0),
            F.lit(1000),
        ).cast("bigint").alias("s"),
        F.coalesce(F.sum(post), F.lit(0)).cast("bigint").alias("y"),
    )
    out = psm_att(units, "t", "s", "y", caliper=25)
    return out.select(
        "n_treated", "n_control", "n_matched", "n_unmatched",
        "sum_y_treated",
        F.round("att", 6).alias("att"),
        F.round("mean_treated", 6).alias("mean_treated"),
        F.round("mean_matched_control", 6).alias(
            "mean_matched_control"
        ),
    )


@register(
    "q_fairness_slices",
    oracle=f"""
    WITH units AS ({_SCORED_UNITS_CTE}
    ), seg AS (
      SELECT user_id % 8 AS segment, score_m, y FROM units
    ), cells AS (
      SELECT segment, score_m AS s,
             CAST(sum(y) AS BIGINT) AS np_s,
             CAST(sum(1 - y) AS BIGINT) AS nn_s
      FROM seg GROUP BY segment, score_m
    ), staged AS (
      SELECT segment, s, np_s, nn_s,
             CAST(coalesce(sum(nn_s) OVER (PARTITION BY segment
                  ORDER BY s
                  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                  0) AS BIGINT) AS cum_neg_below
      FROM cells
    ), per_bin AS (
      SELECT segment,
             least(CAST(floor(s * 10 / 1000) AS BIGINT), 9) AS bin,
             CAST(sum(np_s) AS BIGINT) AS np_b,
             CAST(sum(nn_s) AS BIGINT) AS nn_b,
             CAST(count(*) AS BIGINT) AS n_scores_b,
             CAST(sum(np_s * (2 * cum_neg_below + nn_s)) AS BIGINT)
               AS u2_b,
             CAST(sum(s * (np_s + nn_s)) AS BIGINT) AS sum_pm_b,
             CAST(sum(np_s * (1000 - s) * (1000 - s)
                      + nn_s * s * s) AS BIGINT) AS brier_num_b
      FROM staged GROUP BY 1, 2
    ), agg AS (
      SELECT segment,
             CAST(sum(np_b + nn_b) AS BIGINT) AS n,
             CAST(sum(np_b) AS BIGINT) AS n_pos,
             CAST(sum(n_scores_b) AS BIGINT) AS n_scores,
             CAST(sum(u2_b) AS BIGINT) AS u2,
             CAST(sum(abs(sum_pm_b - 1000 * np_b)) AS BIGINT)
               AS ece_num,
             CAST(sum(brier_num_b) AS BIGINT) AS brier_num
      FROM per_bin GROUP BY segment
    )
    SELECT segment, n, n_pos,
           round(CAST(n_pos AS DOUBLE) / n, 6) AS base_rate,
           n_scores, u2,
           round(CASE WHEN n_pos > 0 AND n - n_pos > 0
                 THEN CAST(u2 AS DOUBLE)
                      / (2 * CAST(n_pos AS DOUBLE) * (n - n_pos))
                 END, 6) AS auc,
           ece_num,
           round(CAST(ece_num AS DOUBLE) / (1000 * n), 6) AS ece,
           brier_num,
           round(CAST(brier_num AS DOUBLE) / (CAST(1000 AS DOUBLE)
                 * 1000 * n), 6) AS brier
    FROM agg ORDER BY segment
    """,
)
def q_fairness_slices(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-segment fairness report (operators/quality.fairness_report,
    r15 — r14 verdict ask #9): base rate + exact ROC AUC + expected
    calibration error + Brier score per deterministic cohort
    (user_id %% 8) from ONE scan — one hash aggregate to the
    (segment x score) cells, one keyed prefix window, a two-level
    (segment, bin) -> segment rollup; every numerator an exact
    BIGINT, every metric one pinned division."""
    from oakstore_spark.operators.quality import fairness_report

    units = _scored_units(spark, sf_dir).withColumn(
        "segment", (F.col("user_id") % 8).cast("bigint")
    )
    out = fairness_report(
        units, ["segment"], "score_m", "y",
        n_bins=10, score_scale=1000,
    )
    return out.select(
        "segment", "n", "n_pos",
        F.round("base_rate", 6).alias("base_rate"),
        "n_scores", "u2",
        F.round("auc", 6).alias("auc"),
        "ece_num",
        F.round("ece", 6).alias("ece"),
        "brier_num",
        F.round("brier", 6).alias("brier"),
    ).orderBy("segment")


@register(
    "q_isotonic",
    oracle="""
    WITH units AS (
      SELECT user_id,
             least(CAST(floor(coalesce(sum(CASE WHEN event_type = 'purchase'
                  AND ts < TIMESTAMP '2024-01-16'
                  THEN CAST(round(value * 100) AS BIGINT) END), 0)
                  / 20000.0) AS BIGINT), 50) AS score_d,
             CAST(max(CASE WHEN event_type = 'purchase'
                  AND value > 200 THEN 1 ELSE 0 END) AS BIGINT) AS y
      FROM events GROUP BY user_id
    ), per_s AS (
      SELECT score_d AS score, CAST(count(*) AS BIGINT) AS n,
             CAST(sum(y) AS BIGINT) AS n_pos
      FROM units GROUP BY 1
    ), pre AS (
      SELECT score, n, n_pos,
             row_number() OVER (ORDER BY score) AS rn,
             sum(n) OVER (ORDER BY score) AS cn,
             sum(n_pos) OVER (ORDER BY score) AS cp
      FROM per_s
    ), mjk AS (
      SELECT k.rn AS k, j.rn AS j,
             CAST(j.cp - coalesce(km.cp, 0) AS DOUBLE)
               / (j.cn - coalesce(km.cn, 0)) AS v
      FROM pre k
      JOIN pre j ON j.rn >= k.rn
      LEFT JOIN pre km ON km.rn = k.rn - 1
    ), inner_ AS (
      SELECT i.rn AS i, m.k, min(m.v) AS v
      FROM pre i JOIN mjk m ON m.k <= i.rn AND m.j >= i.rn
      GROUP BY 1, 2
    ), iso AS (
      SELECT i, max(v) AS calibrated FROM inner_ GROUP BY i
    )
    SELECT p.score, p.n, p.n_pos, iso.calibrated
    FROM pre p JOIN iso ON iso.i = p.rn
    ORDER BY p.score
    """,
)
def q_isotonic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Isotonic (PAV) calibration of the spend score against
    big-purchase conversion (operators/quality.isotonic_calibrate):
    the distinct-score relation collapses in one hash aggregate, the
    pool merge runs driver-side with EXACT cross-multiplied-BIGINT
    mean comparisons, and the oracle replays the fit through the
    classical minimax equivalence f_i = max_{k<=i} min_{j>=i}
    mean(k..j) as a bounded triple-join over the <= 51 distinct
    scores — the attained value is the pool's own n_pos/n division,
    so every calibrated float matches bit-for-bit."""
    from oakstore_spark.operators.quality import isotonic_calibrate

    e = table(spark, sf_dir, "events")
    cutoff = F.lit("2024-01-16").cast("timestamp")
    units = e.groupBy("user_id").agg(
        F.least(
            F.floor(
                F.coalesce(
                    F.sum(
                        F.when(
                            (F.col("event_type") == "purchase")
                            & (F.col("ts") < cutoff),
                            F.round(F.col("value") * 100).cast(
                                "bigint"
                            ),
                        )
                    ),
                    F.lit(0),
                )
                / 20000.0
            ).cast("bigint"),
            F.lit(50),
        ).alias("score_d"),
        F.max(
            F.when(
                (F.col("event_type") == "purchase")
                & (F.col("value") > 200),
                1,
            ).otherwise(0)
        ).cast("bigint").alias("y"),
    )
    return isotonic_calibrate(units, "score_d", "y").orderBy("score")


@register(
    "q_corr_matrix",
    oracle="""
    WITH units AS (
      SELECT user_id,
             CAST(coalesce(sum(CASE WHEN event_type = 'purchase'
                  THEN CAST(round(value * 100) AS BIGINT) END), 0)
                  AS BIGINT) AS spend,
             CAST(count(*) AS BIGINT) AS events,
             CAST(sum(CASE WHEN event_type = 'purchase' THEN 1
                  ELSE 0 END) AS BIGINT) AS purchases,
             CAST(count(DISTINCT CAST(ts AS DATE)) AS BIGINT)
               AS active_days
      FROM events GROUP BY user_id
    ), agg AS (
      SELECT CAST(count(*) AS BIGINT) AS n,
             CAST(sum(spend) AS BIGINT) AS s_spend,
             CAST(sum(spend * spend) AS BIGINT) AS q_spend,
             CAST(sum(events) AS BIGINT) AS s_events,
             CAST(sum(events * events) AS BIGINT) AS q_events,
             CAST(sum(purchases) AS BIGINT) AS s_purch,
             CAST(sum(purchases * purchases) AS BIGINT) AS q_purch,
             CAST(sum(active_days) AS BIGINT) AS s_days,
             CAST(sum(active_days * active_days) AS BIGINT) AS q_days,
             CAST(sum(spend * events) AS BIGINT) AS p_spend_events,
             CAST(sum(spend * purchases) AS BIGINT) AS p_spend_purch,
             CAST(sum(spend * active_days) AS BIGINT) AS p_spend_days,
             CAST(sum(events * purchases) AS BIGINT) AS p_events_purch,
             CAST(sum(events * active_days) AS BIGINT) AS p_events_days,
             CAST(sum(purchases * active_days) AS BIGINT) AS p_purch_days
      FROM units
    ), pairs AS (
      SELECT 'spend' AS col_a, 'spend' AS col_b, n,
             s_spend AS sa, q_spend AS qa, s_spend AS sb,
             q_spend AS qb, q_spend AS p FROM agg
      UNION ALL SELECT 'spend', 'events', n, s_spend, q_spend,
             s_events, q_events, p_spend_events FROM agg
      UNION ALL SELECT 'spend', 'purchases', n, s_spend, q_spend,
             s_purch, q_purch, p_spend_purch FROM agg
      UNION ALL SELECT 'spend', 'active_days', n, s_spend, q_spend,
             s_days, q_days, p_spend_days FROM agg
      UNION ALL SELECT 'events', 'events', n, s_events, q_events,
             s_events, q_events, q_events FROM agg
      UNION ALL SELECT 'events', 'purchases', n, s_events, q_events,
             s_purch, q_purch, p_events_purch FROM agg
      UNION ALL SELECT 'events', 'active_days', n, s_events, q_events,
             s_days, q_days, p_events_days FROM agg
      UNION ALL SELECT 'purchases', 'purchases', n, s_purch, q_purch,
             s_purch, q_purch, q_purch FROM agg
      UNION ALL SELECT 'purchases', 'active_days', n, s_purch,
             q_purch, s_days, q_days, p_purch_days FROM agg
      UNION ALL SELECT 'active_days', 'active_days', n, s_days,
             q_days, s_days, q_days, q_days FROM agg
    )
    SELECT col_a, col_b, n,
           CASE WHEN (CAST(n AS DOUBLE) * CAST(qa AS DOUBLE)
                      - CAST(sa AS DOUBLE) * CAST(sa AS DOUBLE))
                    * (CAST(n AS DOUBLE) * CAST(qb AS DOUBLE)
                       - CAST(sb AS DOUBLE) * CAST(sb AS DOUBLE)) > 0
                THEN (CAST(n AS DOUBLE) * CAST(p AS DOUBLE)
                      - CAST(sa AS DOUBLE) * CAST(sb AS DOUBLE))
                     / sqrt((CAST(n AS DOUBLE) * CAST(qa AS DOUBLE)
                             - CAST(sa AS DOUBLE) * CAST(sa AS DOUBLE))
                            * (CAST(n AS DOUBLE) * CAST(qb AS DOUBLE)
                               - CAST(sb AS DOUBLE)
                                 * CAST(sb AS DOUBLE)))
                END AS r
    FROM pairs ORDER BY col_a, col_b
    """,
)
def q_corr_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Feature correlation matrix (operators/quality.corr_matrix)
    over four per-user behavior features (spend cents, event count,
    purchase count, active days): every pairwise moment from ONE hash
    aggregate, each Pearson r a pinned chain ending in the
    correctly-rounded sqrt — the one-scan collinearity screen run
    before features ship to a model."""
    from oakstore_spark.operators.quality import corr_matrix

    e = table(spark, sf_dir, "events")
    units = e.groupBy("user_id").agg(
        F.coalesce(
            F.sum(
                F.when(
                    F.col("event_type") == "purchase",
                    F.round(F.col("value") * 100).cast("bigint"),
                )
            ),
            F.lit(0),
        ).alias("spend"),
        F.count(F.lit(1)).cast("bigint").alias("events"),
        F.sum(
            F.when(F.col("event_type") == "purchase", 1).otherwise(0)
        ).cast("bigint").alias("purchases"),
        F.countDistinct(F.to_date("ts")).cast("bigint").alias(
            "active_days"
        ),
    )
    return corr_matrix(
        units, ["spend", "events", "purchases", "active_days"]
    ).orderBy("col_a", "col_b")


@register(
    "q_ips_eval",
    oracle="""
    WITH per_a AS (
      SELECT event_type AS action,
             CAST(count(*) AS BIGINT) AS n_a,
             CAST(sum(CASE WHEN event_type = 'purchase'
                  AND value > 200 THEN 1 ELSE 0 END) AS BIGINT) AS r_a
      FROM events GROUP BY event_type
    ), pol AS (
      SELECT * FROM (VALUES
        ('view',     0.25, 0.0625),
        ('click',    0.25, 0.125),
        ('purchase', 0.25, 0.5),
        ('signup',   0.125, 0.25),
        ('error',    0.125, 0.0625)
      ) AS t(action, mu, pi)
    ), staged AS (
      SELECT a.action, a.n_a, a.r_a,
             coalesce(p.pi, 0.0) / p.mu AS w
      FROM per_a a LEFT JOIN pol p USING (action)
    ), agg AS (
      SELECT CAST(sum(n_a) AS BIGINT) AS n,
             CAST(count(*) AS BIGINT) AS n_actions,
             list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
               list(CAST(r_a AS DOUBLE) * w ORDER BY action)),
               (x, y) -> x + y) AS rw,
             list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
               list(CAST(n_a AS DOUBLE) * w ORDER BY action)),
               (x, y) -> x + y) AS sw,
             list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
               list(CAST(n_a AS DOUBLE) * w * w ORDER BY action)),
               (x, y) -> x + y) AS sw2,
             max(w) AS max_weight
      FROM staged
    )
    SELECT n, n_actions,
           rw / n AS ips_value,
           CASE WHEN sw > 0 THEN rw / sw END AS snips_value,
           CASE WHEN sw2 > 0 THEN sw * sw / sw2 END AS ess,
           max_weight
    FROM agg
    """,
)
def q_ips_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Off-policy evaluation (operators/experiments.ips_evaluate):
    the event log read as bandit data (action = event_type, reward =
    big-purchase flag) under a declared dyadic logging policy,
    evaluating a purchase-heavy target policy — IPS, self-normalized
    SNIPS, and the effective sample size. Rewards collapse per ACTION
    first (exact BIGINTs), weights join onto that bounded relation,
    and every cross-action float sum is a fixed action-sorted fold —
    nothing corpus-sized ever orders floats."""
    from oakstore_spark.operators.experiments import ips_evaluate

    e = table(spark, sf_dir, "events").select(
        "event_type",
        F.when(
            (F.col("event_type") == "purchase")
            & (F.col("value") > 200),
            1,
        ).otherwise(0).alias("reward"),
    )
    mu = spark.createDataFrame(
        [
            ("view", 0.25),
            ("click", 0.25),
            ("purchase", 0.25),
            ("signup", 0.125),
            ("error", 0.125),
        ],
        ["event_type", "prob"],
    )
    pi = spark.createDataFrame(
        [
            ("view", 0.0625),
            ("click", 0.125),
            ("purchase", 0.5),
            ("signup", 0.25),
            ("error", 0.0625),
        ],
        ["event_type", "prob"],
    )
    return ips_evaluate(e, "event_type", "reward", mu, pi)


@register(
    "q_dr_eval",
    oracle="""
    WITH per_a AS (
      SELECT event_type AS action,
             CAST(count(*) AS BIGINT) AS n_a,
             CAST(sum(CASE WHEN event_type = 'purchase'
                  AND value > 200 THEN 1 ELSE 0 END) AS BIGINT) AS r_a
      FROM events GROUP BY event_type
    ), pol AS (
      SELECT * FROM (VALUES
        ('view',     0.25,  0.0625, 0.0),
        ('click',    0.25,  0.125,  0.0),
        ('purchase', 0.25,  0.5,    0.25),
        ('signup',   0.125, 0.25,   0.0),
        ('error',    0.125, 0.0625, 0.0)
      ) AS t(action, mu, pi, q)
    ), staged AS (
      SELECT a.action, a.n_a, a.r_a,
             coalesce(p.pi, 0.0) / p.mu AS w,
             coalesce(p.q, 0.0) AS qh
      FROM per_a a LEFT JOIN pol p USING (action)
    ), base AS (
      SELECT list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
               list(pi * coalesce(q, 0.0) ORDER BY action)),
               (x, y) -> x + y) AS vq
      FROM pol
    ), agg AS (
      SELECT CAST(sum(n_a) AS BIGINT) AS n,
             CAST(count(*) AS BIGINT) AS n_actions,
             list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
               list(w * (CAST(r_a AS DOUBLE)
                         - CAST(n_a AS DOUBLE) * qh)
                    ORDER BY action)),
               (x, y) -> x + y) AS corr,
             list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
               list(CAST(r_a AS DOUBLE) * w ORDER BY action)),
               (x, y) -> x + y) AS rw,
             max(w) AS max_weight
      FROM staged
    )
    SELECT n, n_actions,
           vq + corr / n AS dr_value,
           rw / n AS ips_value,
           vq AS model_value,
           max_weight
    FROM agg CROSS JOIN base
    """,
)
def q_dr_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Doubly-robust off-policy evaluation
    (operators/experiments.dr_evaluate): the q_ips_eval setting plus
    a per-action reward model — the model baseline over the TARGET
    policy relation plus the importance-weighted correction, each a
    fixed action-sorted fold over bounded relations. Consistent if
    EITHER the propensities or the model is right."""
    from oakstore_spark.operators.experiments import dr_evaluate

    e = table(spark, sf_dir, "events").select(
        "event_type",
        F.when(
            (F.col("event_type") == "purchase")
            & (F.col("value") > 200),
            1,
        ).otherwise(0).alias("reward"),
    )
    mu = spark.createDataFrame(
        [
            ("view", 0.25),
            ("click", 0.25),
            ("purchase", 0.25),
            ("signup", 0.125),
            ("error", 0.125),
        ],
        ["event_type", "prob"],
    )
    pi = spark.createDataFrame(
        [
            ("view", 0.0625),
            ("click", 0.125),
            ("purchase", 0.5),
            ("signup", 0.25),
            ("error", 0.0625),
        ],
        ["event_type", "prob"],
    )
    qm = spark.createDataFrame(
        [
            ("view", 0.0),
            ("click", 0.0),
            ("purchase", 0.25),
            ("signup", 0.0),
            ("error", 0.0),
        ],
        ["event_type", "q"],
    )
    return dr_evaluate(e, "event_type", "reward", mu, pi, qm)


#: q_bradley_terry planted duel log (winner, loser, n): strengths
#: roughly 4:2:1 with a weak fourth item — integer counts so the MM
#: chain is the same IEEE double sequence in both engines
_BT_DUELS = [
    ("A", "B", 8), ("B", "A", 4),
    ("A", "C", 8), ("C", "A", 2),
    ("B", "C", 4), ("C", "B", 2),
    ("A", "D", 4), ("D", "A", 1),
    ("D", "C", 1), ("C", "D", 3),
]
_BT_ROUNDS = 3


def _bt_oracle() -> str:
    """Generated q_bradley_terry oracle (the pagerank/BPE chained-CTE
    precedent): replay _BT_ROUNDS MM updates over the planted duel
    log as unrolled CTEs.  Float-chain identity with the driver-side
    fit in operators/labeling.bradley_terry: each item's denominator
    is a FIXED-ORDER fold over its games in global (a, b) canonical
    pair order (list(... ORDER BY a, b) — matching the precomputed
    adjacency built from sorted(games)), the mean is a fold over
    items ascending (matching dict insertion order), and every
    division is int->double exact."""
    games: dict = {}
    wins: dict = {}
    comps: dict = {}
    for a, b, n in _BT_DUELS:
        key = (a, b) if a < b else (b, a)
        games[key] = games.get(key, 0) + n
        wins[a] = wins.get(a, 0) + n
        wins[b] = wins.get(b, 0)
        comps[a] = comps.get(a, 0) + n
        comps[b] = comps.get(b, 0) + n
    items = sorted(wins)
    k = len(items)
    game_vals = ", ".join(
        f"('{a}', '{b}', CAST({n} AS BIGINT))"
        for (a, b), n in sorted(games.items())
    )
    win_vals = ", ".join(
        f"('{it}', CAST({wins[it]} AS BIGINT), "
        f"CAST({comps[it]} AS BIGINT))"
        for it in items
    )
    ctes = [
        f"games AS (SELECT * FROM (VALUES {game_vals}) g(a, b, n))",
        f"w AS (SELECT * FROM (VALUES {win_vals}) "
        "w(item, wins, comparisons))",
        "p0 AS (SELECT item, CAST(1.0 AS DOUBLE) AS p FROM w)",
    ]
    for r in range(1, _BT_ROUNDS + 1):
        ctes.append(f"""raw{r} AS (
      SELECT w.item, w.wins, w.comparisons,
             CAST(w.wins AS DOUBLE) / (
               SELECT list_reduce(
                 list_prepend(CAST(0.0 AS DOUBLE),
                   list(g.n / (pa.p + pb.p) ORDER BY g.a, g.b)),
                 (x, y) -> x + y)
               FROM games g
               JOIN p{r - 1} pa ON pa.item = g.a
               JOIN p{r - 1} pb ON pb.item = g.b
               WHERE g.a = w.item OR g.b = w.item
             ) AS raw
      FROM w
    )""")
        ctes.append(f"""mean{r} AS (
      SELECT list_reduce(
        list_prepend(CAST(0.0 AS DOUBLE), list(raw ORDER BY item)),
        (x, y) -> x + y) / {k} AS m
      FROM raw{r}
    )""")
        ctes.append(
            f"p{r} AS (SELECT item, raw / (SELECT m FROM mean{r}) "
            f"AS p FROM raw{r})"
        )
    joined = ",\n    ".join(ctes)
    return f"""
    WITH {joined}
    SELECT w.item, w.wins, w.comparisons,
           p{_BT_ROUNDS}.p AS strength,
           CAST(row_number() OVER (
             ORDER BY p{_BT_ROUNDS}.p DESC, w.item) AS INT) AS rank
    FROM w JOIN p{_BT_ROUNDS} USING (item)
    ORDER BY rank
    """


@register("q_bradley_terry", oracle=_bt_oracle())
def q_bradley_terry(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bradley-Terry ratings, RETIRED from rows-only into an exact
    ORACLE (r13 verdict ask #7): a planted ~4:2:1 duel log with
    integer counts runs _BT_ROUNDS deterministic MM updates
    (operators/labeling.bradley_terry, all-ones init, adjacency in
    global sorted pair order), and the oracle replays the identical
    float chain as unrolled chained CTEs — fixed-order folds for
    every cross-item sum, one int->double division per item per
    round.  The converged-fit behavior (50 rounds, epsilon branch for
    zero-win items, fail-fast cap) stays pinned in
    tests/test_curation.py."""
    from oakstore_spark.operators.labeling import bradley_terry

    duels = spark.createDataFrame(
        _BT_DUELS, ["winner", "loser", "n"]
    ).select(
        "winner",
        "loser",
        F.explode(F.sequence(F.lit(1), F.col("n"))).alias("_i"),
    ).select("winner", "loser")
    return bradley_terry(
        duels, "winner", "loser", n_iter=_BT_ROUNDS
    ).orderBy("rank")


@register(
    "q_group_entropy",
    oracle="""
    WITH cells AS (
      SELECT user_id, event_type AS c,
             CAST(count(*) AS BIGINT) AS n
      FROM events WHERE event_type IS NOT NULL
      GROUP BY user_id, event_type
    ), tot AS (
      SELECT user_id, CAST(sum(n) AS BIGINT) AS t
      FROM cells GROUP BY user_id
    ), agg AS (
      SELECT c.user_id,
             max(t.t) AS n,
             CAST(count(*) AS BIGINT) AS k_distinct,
             list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
               list(-((CAST(c.n AS DOUBLE) / t.t)
                      * ln(CAST(c.n AS DOUBLE) / t.t))
                    ORDER BY c.c)),
               (a, b) -> a + b) AS entropy
      FROM cells c JOIN tot t USING (user_id)
      GROUP BY c.user_id
    )
    SELECT user_id, n, k_distinct,
           round(entropy, 9) AS entropy,
           CASE WHEN k_distinct >= 2
                THEN round(entropy
                           / ln(CAST(k_distinct AS DOUBLE)), 9)
                END AS entropy_norm
    FROM agg ORDER BY user_id
    """,
)
def q_group_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user behavioral diversity (operators/curation.group_entropy):
    Shannon entropy of each user's event-type mix — one hash
    aggregate to the category-bounded cell relation, per-key totals,
    and a fixed category-sorted fold of p·ln p terms. Runtime ln is
    the <=1-ulp libm class and ~1.5% of rows land on a disagreeing
    ulp at this row count, so BOTH engines round the two entropy
    outputs to 9 decimals (the q_minhash_near_dup rounding
    precedent) — the integer columns stay exact."""
    from oakstore_spark.operators.curation import group_entropy

    e = table(spark, sf_dir, "events")
    out = group_entropy(e, ["user_id"], "event_type")
    return out.select(
        "user_id",
        "n",
        "k_distinct",
        F.round("entropy", 9).alias("entropy"),
        F.round("entropy_norm", 9).alias("entropy_norm"),
    ).orderBy("user_id")


@register(
    "q_gini",
    oracle="""
    WITH units AS (
      SELECT user_id,
             CAST(coalesce(sum(CASE WHEN event_type = 'purchase'
                  THEN CAST(round(value * 100) AS BIGINT) END), 0)
                  AS BIGINT) AS spend
      FROM events GROUP BY user_id
    ), ranked AS (
      SELECT spend,
             row_number() OVER (ORDER BY spend, user_id) AS i,
             count(*) OVER () AS n
      FROM units
    ), agg AS (
      SELECT CAST(max(n) AS BIGINT) AS n,
             CAST(sum(spend) AS BIGINT) AS total,
             CAST(sum(i * spend) AS BIGINT) AS ix
      FROM ranked
    )
    SELECT n, total,
           CASE WHEN n > 0 AND total > 0 THEN
             2.0 * ix / (CAST(n AS DOUBLE) * total)
               - (CAST(n AS DOUBLE) + 1.0) / CAST(n AS DOUBLE)
           END AS gini
    FROM agg
    """,
)
def q_gini(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spend-concentration Gini (operators/quality.gini_coefficient):
    per-user purchase cents ranked ascending through
    assign_contiguous_ids (range exchange + offsets, never an
    empty-key window), exact BIGINT rank-weighted sums, G as two
    pinned float operations — the single-number Lorenz summary of
    how unequal revenue is across users."""
    from oakstore_spark.operators.quality import gini_coefficient

    e = table(spark, sf_dir, "events")
    units = e.groupBy("user_id").agg(
        F.coalesce(
            F.sum(
                F.when(
                    F.col("event_type") == "purchase",
                    F.round(F.col("value") * 100).cast("bigint"),
                )
            ),
            F.lit(0),
        ).alias("spend"),
    )
    return gini_coefficient(units, "spend", tiebreak_col="user_id")


@register(
    "q_pr_curve",
    oracle=f"""
    WITH units AS ({_SCORED_UNITS_CTE}
    ), grid AS (
      SELECT CAST(unnest([0, 50, 100, 200, 400, 700, 1000])
                  AS BIGINT) AS threshold
    ), agg AS (
      SELECT g.threshold,
             CAST(sum(CASE WHEN u.score_m >= g.threshold AND u.y = 1
                  THEN 1 ELSE 0 END) AS BIGINT) AS tp,
             CAST(sum(CASE WHEN u.score_m >= g.threshold AND u.y = 0
                  THEN 1 ELSE 0 END) AS BIGINT) AS fp,
             CAST(sum(CASE WHEN u.score_m < g.threshold AND u.y = 1
                  THEN 1 ELSE 0 END) AS BIGINT) AS fn,
             CAST(sum(CASE WHEN u.score_m < g.threshold AND u.y = 0
                  THEN 1 ELSE 0 END) AS BIGINT) AS tn
      FROM grid g CROSS JOIN units u
      GROUP BY g.threshold
    )
    SELECT threshold, tp, fp, fn, tn,
           CASE WHEN tp + fp > 0
                THEN CAST(tp AS DOUBLE) / (tp + fp) END AS precision,
           CASE WHEN tp + fn > 0
                THEN CAST(tp AS DOUBLE) / (tp + fn) END AS recall,
           CASE WHEN 2 * tp + fp + fn > 0
                THEN 2 * CAST(tp AS DOUBLE) / (2 * tp + fp + fn)
                END AS f1
    FROM agg ORDER BY threshold
    """,
)
def q_pr_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Precision/recall/F1 at a 7-point threshold grid
    (operators/quality.pr_curve): exact confusion counts from one
    conditional aggregate over the broadcast literal grid (the
    qini_curve pattern), each metric one pinned division."""
    from oakstore_spark.operators.quality import pr_curve

    return pr_curve(
        _scored_units(spark, sf_dir),
        "score_m",
        "y",
        [0, 50, 100, 200, 400, 700, 1000],
    ).orderBy("threshold")


@register(
    "q_calibration",
    oracle=f"""
    WITH units AS ({_SCORED_UNITS_CTE}
    ), per_bin AS (
      SELECT least(CAST(floor(score_m * 10 / 1000.0) AS BIGINT), 9)
               AS bin,
             CAST(count(*) AS BIGINT) AS n,
             CAST(sum(y) AS BIGINT) AS n_pos,
             CAST(sum(score_m) AS BIGINT) AS sp,
             CAST(sum((score_m - 1000 * y) * (score_m - 1000 * y))
                  AS BIGINT) AS sq
      FROM units GROUP BY 1
    ), tot AS (SELECT CAST(sum(n) AS BIGINT) AS n_tot FROM per_bin)
    SELECT bin, n, n_pos,
           CAST(sp AS DOUBLE) / n / 1000 AS mean_pred,
           CAST(n_pos AS DOUBLE) / n AS obs_rate,
           CAST(sq AS DOUBLE) / (1000000.0 * n_tot) AS brier_contrib
    FROM per_bin, tot ORDER BY bin
    """,
)
def q_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calibration bins + exact Brier score
    (operators/quality.calibration_report): per decile-of-score bin,
    mean predicted probability vs observed rate, and the Brier score
    accumulated as an exact BIGINT sum of squared integer milli-unit
    deviations (a per-row float sum would not replay order-free) —
    sum(brier_contrib) is the Brier score."""
    from oakstore_spark.operators.quality import calibration_report

    return calibration_report(
        _scored_units(spark, sf_dir), "score_m", "y",
        n_bins=10, score_scale=1000,
    ).orderBy("bin")


@register(
    "q_ece",
    oracle=f"""
    WITH units AS ({_SCORED_UNITS_CTE}
    ), per_bin AS (
      SELECT least(CAST(floor(score_m * 10 / 1000.0) AS BIGINT), 9)
               AS bin,
             CAST(count(*) AS BIGINT) AS n,
             CAST(sum(y) AS BIGINT) AS n_pos,
             CAST(sum(score_m) AS BIGINT) AS sp,
             CAST(sum((score_m - 1000 * y) * (score_m - 1000 * y))
                  AS BIGINT) AS sq
      FROM units GROUP BY 1
    ), tot AS (SELECT CAST(sum(n) AS BIGINT) AS n_tot FROM per_bin),
    rep AS (
      SELECT bin, n,
             CAST(sp AS DOUBLE) / n / 1000 AS mean_pred,
             CAST(n_pos AS DOUBLE) / n AS obs_rate,
             CAST(sq AS DOUBLE) / (1000000.0 * n_tot) AS brier_contrib
      FROM per_bin, tot
    ), agg AS (
      SELECT CAST(sum(n) AS BIGINT) AS n,
             CAST(count(*) AS BIGINT) AS n_bins_occupied,
             list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
               list(n * abs(mean_pred - obs_rate) ORDER BY bin)),
               (a, b) -> a + b) AS wgap,
             max(abs(mean_pred - obs_rate)) AS mce,
             list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
               list(brier_contrib ORDER BY bin)),
               (a, b) -> a + b) AS brier
      FROM rep
    )
    SELECT n, n_bins_occupied, wgap / n AS ece, mce, brier
    FROM agg
    """,
)
def q_ece(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Expected / maximum calibration error
    (operators/quality.expected_calibration_error) on the shared
    scored-units fixture — the single-number miscalibration summary
    over the q_calibration bins: bin-weighted mean and max |promised
    − observed| plus the exact Brier total, the cross-bin sums as
    fixed bin-sorted folds so every float replays."""
    from oakstore_spark.operators.quality import (
        expected_calibration_error,
    )

    return expected_calibration_error(
        _scored_units(spark, sf_dir), "score_m", "y",
        n_bins=10, score_scale=1000,
    )


@register("q_ipw_ate")
def q_ipw_ate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inverse-propensity-weighted ATE (operators/experiments.ipw_ate):
    treat heavy pre-period activity as a CONFOUNDED 'treatment'
    (users self-select), fit the propensity on behavior features
    in-engine, and report the Hajek-reweighted effect on conversion
    next to the naive (confounded) arm difference. Rows-only (the
    propensity fit is iterative — the q_quality_classifier
    precedent); exact planted-confounding recovery is pinned in
    tests/test_curation.py::test_ipw_ate_recovers_planted_effect."""
    from oakstore_spark.operators.experiments import ipw_ate

    e = table(spark, sf_dir, "events")
    cutoff = F.lit("2024-01-16").cast("timestamp")
    units = e.groupBy("user_id").agg(
        F.sum(
            F.when(F.col("ts") < cutoff, 1).otherwise(0)
        ).alias("pre_events"),
        F.coalesce(
            F.sum(
                F.when(
                    (F.col("event_type") == "purchase")
                    & (F.col("ts") < cutoff),
                    F.round(F.col("value") * 100).cast("bigint"),
                )
            ),
            F.lit(0),
        ).alias("pre_cents"),
        F.max(
            F.when(
                (F.col("event_type") == "purchase")
                & (F.col("value") > 200),
                1,
            ).otherwise(0)
        ).cast("bigint").alias("converted"),
    ).select(
        (F.col("pre_events") >= 20).cast("int").alias("heavy"),
        (F.col("pre_cents") / 10000.0).alias("f_spend"),
        ((F.col("user_id") % 7) / 7.0).alias("f_mix"),
        "converted",
    )
    return ipw_ate(
        units, "heavy", ["f_spend", "f_mix"], "converted",
        treated=1, n_iter=4,
    )


@register(
    "q_cohens_kappa",
    oracle="""
    WITH rated AS (
      SELECT CASE WHEN n_chars > 600 THEN 'good' ELSE 'bad' END AS la,
             CASE WHEN n_chars + (doc_id % 7) * 40 > 600
                  THEN 'good' ELSE 'bad' END AS lb
      FROM documents
    ), cells AS (
      SELECT la, lb, CAST(count(*) AS BIGINT) AS n_ab
      FROM rated GROUP BY la, lb
    ), margins AS (
      SELECT coalesce(r.la, c.lb) AS lab,
             coalesce(r.row_n, 0) AS row_n,
             coalesce(c.col_n, 0) AS col_n
      FROM (SELECT la, CAST(sum(n_ab) AS BIGINT) AS row_n
            FROM cells GROUP BY la) r
      FULL JOIN (SELECT lb, CAST(sum(n_ab) AS BIGINT) AS col_n
                 FROM cells GROUP BY lb) c ON r.la = c.lb
    ), agg AS (
      SELECT CAST(sum(row_n) AS BIGINT) AS n_items,
             CAST(count(*) AS BIGINT) AS n_categories,
             CAST(sum(row_n * col_n) AS BIGINT) AS s_rc
      FROM margins
    ), agree AS (
      SELECT CAST(coalesce(sum(n_ab), 0) AS BIGINT) AS n_agree
      FROM cells WHERE la = lb
    )
    SELECT n_items, n_categories,
           CAST(n_agree AS DOUBLE) / n_items AS p_observed,
           CAST(s_rc AS DOUBLE)
             / (CAST(n_items AS DOUBLE) * n_items) AS p_expected,
           CASE WHEN CAST(s_rc AS DOUBLE)
                     / (CAST(n_items AS DOUBLE) * n_items) < 1
                THEN (CAST(n_agree AS DOUBLE) / n_items
                      - CAST(s_rc AS DOUBLE)
                        / (CAST(n_items AS DOUBLE) * n_items))
                     / (1 - CAST(s_rc AS DOUBLE)
                            / (CAST(n_items AS DOUBLE) * n_items))
                END AS kappa
    FROM agg, agree
    """,
)
def q_cohens_kappa(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohen's kappa (operators/labeling.cohens_kappa): two
    deterministic annotation rules over the documents table (a strict
    length rule vs a noisy length rule) — chance-corrected agreement
    from exact BIGINT contingency counts over the label-cardinality-
    bounded relation, kappa one pinned chain. The
    before-you-train-on-labels check next to the weak-supervision
    diagnostics."""
    from oakstore_spark.operators.labeling import cohens_kappa

    d = table(spark, sf_dir, "documents")
    rated = d.select(
        F.when(F.col("n_chars") > 600, "good").otherwise("bad").alias(
            "la"
        ),
        F.when(
            F.col("n_chars") + (F.col("doc_id") % 7) * 40 > 600,
            "good",
        ).otherwise("bad").alias("lb"),
    )
    return cohens_kappa(rated, "la", "lb")


@register(
    "q_fleiss_kappa",
    oracle="""
    WITH ratings AS (
      SELECT doc_id AS item,
             CASE WHEN n_chars > 550 + 60 * r + (doc_id % 5) * 20
                  THEN 'good' ELSE 'bad' END AS lab
      FROM documents, (SELECT unnest([0, 1, 2]) AS r)
    ), ic AS (
      SELECT item, lab, CAST(count(*) AS BIGINT) AS n_ic
      FROM ratings GROUP BY item, lab
    ), per_item AS (
      SELECT item, CAST(sum(n_ic * n_ic) AS BIGINT) AS sq_i
      FROM ic GROUP BY item
    ), tot AS (
      SELECT CAST(count(*) AS BIGINT) AS n_items,
             CAST(sum(sq_i) AS BIGINT) AS s_sq
      FROM per_item
    ), marg AS (
      SELECT CAST(count(*) AS BIGINT) AS n_categories,
             CAST(sum(n_c * n_c) AS BIGINT) AS s_c2
      FROM (SELECT lab, CAST(sum(n_ic) AS BIGINT) AS n_c
            FROM ic GROUP BY lab)
    )
    SELECT n_items, CAST(3 AS BIGINT) AS m_raters, n_categories,
           (CAST(s_sq AS DOUBLE) - CAST(n_items AS DOUBLE) * 3.0)
             / (CAST(n_items AS DOUBLE) * 3.0 * 2.0) AS p_bar,
           CAST(s_c2 AS DOUBLE)
             / (CAST(n_items AS DOUBLE) * 3.0
                * (CAST(n_items AS DOUBLE) * 3.0)) AS p_expected,
           CASE WHEN CAST(s_c2 AS DOUBLE)
                     / (CAST(n_items AS DOUBLE) * 3.0
                        * (CAST(n_items AS DOUBLE) * 3.0)) < 1
                THEN ((CAST(s_sq AS DOUBLE)
                       - CAST(n_items AS DOUBLE) * 3.0)
                      / (CAST(n_items AS DOUBLE) * 3.0 * 2.0)
                      - CAST(s_c2 AS DOUBLE)
                        / (CAST(n_items AS DOUBLE) * 3.0
                           * (CAST(n_items AS DOUBLE) * 3.0)))
                     / (1 - CAST(s_c2 AS DOUBLE)
                            / (CAST(n_items AS DOUBLE) * 3.0
                               * (CAST(n_items AS DOUBLE) * 3.0)))
                END AS kappa
    FROM tot, marg
    """,
)
def q_fleiss_kappa(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fleiss' kappa (operators/labeling.fleiss_kappa): three
    deterministic annotators (increasingly strict length rules with a
    doc-dependent offset) rate every document — multi-rater
    chance-corrected agreement from two bounded hash aggregates, all
    moments exact BIGINTs, kappa one pinned chain."""
    from oakstore_spark.operators.labeling import fleiss_kappa

    d = table(spark, sf_dir, "documents")
    ratings = d.select(
        F.col("doc_id").alias("item"),
        "n_chars",
        F.explode(F.array(F.lit(0), F.lit(1), F.lit(2))).alias("r"),
    ).select(
        "item",
        F.when(
            F.col("n_chars")
            > 550 + 60 * F.col("r") + (F.col("item") % 5) * 20,
            "good",
        ).otherwise("bad").alias("lab"),
    )
    return fleiss_kappa(ratings, "item", "lab")


@register(
    "q_bh_adjust",
    oracle="""
    WITH metrics AS (
      SELECT range AS metric_id,
             ((range * 37) % 100 + 0.5) / 100.0 AS p
      FROM range(100)
    ), staged AS (
      SELECT metric_id, p,
             row_number() OVER (ORDER BY p, metric_id) AS rank
      FROM metrics
    )
    SELECT metric_id, p, CAST(rank AS BIGINT) AS rank,
           least(min(p * 100.0 / rank) OVER (
                   ORDER BY p, metric_id
                   ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING),
                 1.0) AS q_value,
           least(min(p * 100.0 / rank) OVER (
                   ORDER BY p, metric_id
                   ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING),
                 1.0) <= 0.1 AS reject
    FROM staged ORDER BY rank
    """,
)
def q_bh_adjust(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benjamini-Hochberg FDR adjustment
    (operators/experiments.bh_adjust) over a 100-metric readout
    relation with deterministic p-values: exact integer ranks,
    pinned p*n/rank expressions, order-free suffix-min — the
    multiple-comparisons guard a many-metric experiment platform
    applies before declaring winners. The metric relation is
    readout-sized by construction (never unit-level), the one honest
    empty-key-window case."""
    from oakstore_spark.operators.experiments import bh_adjust

    metrics = spark.range(100).select(
        F.col("id").alias("metric_id"),
        (((F.col("id") * 37) % 100 + 0.5) / 100.0).alias("p"),
    )
    return bh_adjust(
        metrics, "p", alpha=0.1, key_cols=["metric_id"]
    ).orderBy("rank")


@register(
    "q_cliffs_delta",
    oracle="""
    WITH units AS (
      SELECT CAST(round(value * 100) AS BIGINT) AS v,
             CASE WHEN event_type = 'purchase' THEN 1
                  WHEN event_type = 'view' THEN 0 END AS a
      FROM events
      WHERE event_type IN ('purchase', 'view')
    ), per_v AS (
      SELECT v,
             CAST(sum(a) AS BIGINT) AS na_v,
             CAST(sum(1 - a) AS BIGINT) AS nb_v
      FROM units GROUP BY v
    ), staged AS (
      SELECT v, na_v, nb_v,
             CAST(coalesce(sum(nb_v) OVER (ORDER BY v
                  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                  0) AS BIGINT) AS cum_b_below
      FROM per_v
    ), agg AS (
      SELECT CAST(sum(na_v) AS BIGINT) AS n_a,
             CAST(sum(nb_v) AS BIGINT) AS n_b,
             CAST(count(*) AS BIGINT) AS n_values,
             CAST(sum(na_v * (2 * cum_b_below + nb_v)) AS BIGINT)
               AS wins2
      FROM staged
    )
    SELECT n_a, n_b, n_values, wins2,
           CASE WHEN n_a > 0 AND n_b > 0
                THEN CAST(wins2 AS DOUBLE)
                     / (2 * CAST(n_a AS DOUBLE) * n_b) END AS auc_ab,
           CASE WHEN n_a > 0 AND n_b > 0
                THEN (CAST(wins2 AS DOUBLE)
                      - CAST(n_a AS DOUBLE) * n_b)
                     / (CAST(n_a AS DOUBLE) * n_b) END AS delta
    FROM agg
    """,
)
def q_cliffs_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cliff's delta ordinal effect size
    (operators/experiments.cliffs_delta): do purchase events carry
    stochastically larger values than views, and by HOW MUCH — the
    magnitude companion to q_mann_whitney's test, computed scale-safe
    over the distinct-value relation (the roc_auc machinery: exact
    BIGINT doubled wins, value-cardinality-bounded prefix window,
    one pinned chain) instead of that query's global per-row rank."""
    from oakstore_spark.operators.experiments import cliffs_delta

    e = table(spark, sf_dir, "events").select(
        "event_type",
        F.round(F.col("value") * 100).cast("bigint").alias("cents"),
    )
    return cliffs_delta(
        e, "event_type", "cents", group_a="purchase", group_b="view"
    )


@register(
    "q_js_drift",
    oracle="""
    WITH b AS (
      SELECT value AS v FROM events
      WHERE ts < TIMESTAMP '2024-01-16' AND value IS NOT NULL
    ), c AS (
      SELECT value AS v FROM events
      WHERE ts >= TIMESTAMP '2024-01-16' AND value IS NOT NULL
    ), mm AS (
      SELECT min(v) AS lo, max(v) AS hi FROM b
    ), nn AS (
      SELECT (SELECT count(*) FROM b) AS nb,
             (SELECT count(*) FROM c) AS nc
    ), bb AS (
      SELECT greatest(least(CAST(floor((v - lo) / ((hi - lo) / 10))
                            AS BIGINT), 9), 0) AS bin,
             count(*) AS n_base
      FROM b, mm GROUP BY 1
    ), cc AS (
      SELECT greatest(least(CAST(floor((v - lo) / ((hi - lo) / 10))
                            AS BIGINT), 9), 0) AS bin,
             count(*) AS n_cur
      FROM c, mm GROUP BY 1
    ), grid AS (
      SELECT unnest(generate_series(0, 9)) AS bin
    ), shares AS (
      SELECT CAST(grid.bin AS BIGINT) AS bin,
             CAST(coalesce(n_base, 0) AS BIGINT) AS n_base,
             CAST(coalesce(n_cur, 0) AS BIGINT) AS n_cur,
             CAST(coalesce(n_base, 0) * 2 + 1 AS DOUBLE)
               / (2 * nb + 10) AS p,
             CAST(coalesce(n_cur, 0) * 2 + 1 AS DOUBLE)
               / (2 * nc + 10) AS q
      FROM grid
      LEFT JOIN bb ON grid.bin = bb.bin
      LEFT JOIN cc ON grid.bin = cc.bin
      CROSS JOIN nn
    )
    SELECT bin, n_base, n_cur,
           p AS share_base, q AS share_cur,
           round(0.5 * (p * ln(p / ((p + q) / 2)))
             + 0.5 * (q * ln(q / ((p + q) / 2))), 12) AS js_contrib
    FROM shares ORDER BY bin
    """,
)
def q_js_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Jensen-Shannon drift (operators/quality.js_divergence) on the
    q_psi_snapshot_monitor fixture (first vs second half of January,
    baseline-fixed bins, add-half smoothed shares): the bounded
    symmetric sibling of PSI — sum(js_contrib) is the JSD in
    [0, ln 2] and its sqrt is a proper metric, so drift thresholds
    compare across features. Same two hash aggregates + 10-row join;
    the p*ln(p/m) chains use the identical association in both
    engines."""
    from oakstore_spark.operators.quality import js_divergence

    e = table(spark, sf_dir, "events")
    split = F.lit("2024-01-16").cast("timestamp")
    out = js_divergence(
        e.where(F.col("ts") < split),
        e.where(F.col("ts") >= split),
        "value",
        n_bins=10,
    )
    # runtime ln is the 1-ulp libm class (deterministic per value, so
    # a disagreeing bin would mismatch EVERY run): round the contrib
    # to 12 decimals in both engines (the q_group_entropy precedent)
    return out.select(
        "bin", "n_base", "n_cur", "share_base", "share_cur",
        F.round("js_contrib", 12).alias("js_contrib"),
    ).orderBy("bin")


@register(
    "q_wilson_intervals",
    oracle="""
    WITH agg AS (
      SELECT event_type,
             CAST(count(*) AS BIGINT) AS n,
             CAST(sum(CASE WHEN value > 300 THEN 1 ELSE 0 END)
                  AS BIGINT) AS successes
      FROM events GROUP BY event_type
    ), alg AS (
      SELECT event_type, n, successes,
             CAST(successes AS DOUBLE) / CAST(n AS DOUBLE) AS p,
             CAST('1.959963984540054' AS DOUBLE) AS z,
             CAST('3.8414588206941254' AS DOUBLE) AS z2
      FROM agg
    )
    SELECT event_type, n, successes, p AS p_hat,
           (p + z2 / (2 * CAST(n AS DOUBLE)))
             / (1.0 + z2 / CAST(n AS DOUBLE))
           - z * sqrt(p * (1.0 - p) / CAST(n AS DOUBLE)
                      + z2 / (4 * CAST(n AS DOUBLE)
                              * CAST(n AS DOUBLE)))
             / (1.0 + z2 / CAST(n AS DOUBLE)) AS lo,
           (p + z2 / (2 * CAST(n AS DOUBLE)))
             / (1.0 + z2 / CAST(n AS DOUBLE))
           + z * sqrt(p * (1.0 - p) / CAST(n AS DOUBLE)
                      + z2 / (4 * CAST(n AS DOUBLE)
                              * CAST(n AS DOUBLE)))
             / (1.0 + z2 / CAST(n AS DOUBLE)) AS hi
    FROM alg ORDER BY event_type
    """,
)
def q_wilson_intervals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event-type Wilson 95% intervals for the high-value rate
    (operators/experiments.wilson_intervals): the proportion interval
    that stays finite and calibrated at the p=0/1 edges where the
    Wald interval collapses — one hash aggregate to the segment
    relation, pinned chains ending in the correctly-rounded sqrt; the
    z quantile is a Python-computed literal both engines embed."""
    from oakstore_spark.operators.experiments import wilson_intervals

    e = table(spark, sf_dir, "events").select(
        "event_type",
        (F.col("value") > 300).cast("int").alias("hot"),
    )
    return wilson_intervals(e, ["event_type"], "hot").orderBy(
        "event_type"
    )


@register(
    "q_dispersion_index",
    oracle="""
    WITH daily AS (
      SELECT user_id, CAST(ts AS DATE) AS d,
             CAST(count(*) AS BIGINT) AS c
      FROM events GROUP BY user_id, CAST(ts AS DATE)
    ), agg AS (
      SELECT user_id,
             CAST(count(c) AS BIGINT) AS n,
             CAST(sum(c) AS BIGINT) AS s,
             CAST(sum(c * c) AS BIGINT) AS q
      FROM daily GROUP BY user_id
    )
    SELECT user_id, n,
           CAST(s AS DOUBLE) / CAST(n AS DOUBLE) AS mean,
           CASE WHEN n >= 2 THEN
             (CAST(q AS DOUBLE) - CAST(n AS DOUBLE)
                * (CAST(s AS DOUBLE) / CAST(n AS DOUBLE))
                * (CAST(s AS DOUBLE) / CAST(n AS DOUBLE)))
             / (CAST(n AS DOUBLE) - 1.0) END AS variance,
           CASE WHEN n >= 2 AND s > 0 THEN
             ((CAST(q AS DOUBLE) - CAST(n AS DOUBLE)
                * (CAST(s AS DOUBLE) / CAST(n AS DOUBLE))
                * (CAST(s AS DOUBLE) / CAST(n AS DOUBLE)))
              / (CAST(n AS DOUBLE) - 1.0))
             / (CAST(s AS DOUBLE) / CAST(n AS DOUBLE)) END
             AS dispersion
    FROM agg ORDER BY user_id
    """,
)
def q_dispersion_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user daily-event-count dispersion
    (operators/quality.dispersion_index): variance-to-mean of each
    user's daily activity counts — the Poisson overdispersion QC
    (bursty/bot-like users read D >> 1). Exact BIGINT moments from
    one aggregate over the (user, day) rollup; D one pinned chain."""
    from oakstore_spark.operators.quality import dispersion_index

    e = table(spark, sf_dir, "events")
    daily = e.groupBy(
        "user_id", F.to_date("ts").alias("d")
    ).agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    return dispersion_index(daily, ["user_id"], "c").orderBy(
        "user_id"
    )


@register(
    "q_quantile_normalize",
    oracle="""
    WITH prep AS (
      SELECT doc_id AS id, source, CAST(n_chars AS BIGINT) AS value
      FROM documents
    ), ranked AS (
      SELECT id, source, value,
             row_number() OVER (PARTITION BY source
                                ORDER BY value, id) AS i,
             count(*) OVER (PARTITION BY source) AS ns
      FROM prep
    ), pooled AS (
      SELECT value AS normalized,
             row_number() OVER (ORDER BY value, source, id) AS pos
      FROM prep
    ), n AS (SELECT count(*) AS nt FROM prep)
    SELECT r.id, r.source, r.value, p.normalized
    FROM ranked r CROSS JOIN n
    JOIN pooled p
      ON p.pos = CASE WHEN r.ns > 1
                      THEN ((r.i - 1) * (n.nt - 1)) // (r.ns - 1) + 1
                      ELSE (n.nt + 1) // 2 END
    ORDER BY r.id
    """,
)
def q_quantile_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-source quantile normalization
    (operators/curation.quantile_normalize): document lengths mapped
    onto the POOLED length distribution at each doc's within-source
    quantile — the batch-effect corrector that makes 'long for
    crawler A' and 'long for crawler B' comparable. Pure integer rank
    arithmetic (no float interpolation), the pooled rank via
    assign_contiguous_ids, one equi-join on the computed position."""
    from oakstore_spark.operators.curation import quantile_normalize

    d = table(spark, sf_dir, "documents").select(
        "doc_id", "source", F.col("n_chars").cast("bigint").alias("nc")
    )
    return quantile_normalize(
        d, "source", "nc", "doc_id"
    ).orderBy("id")


@register(
    "q_mcnemar",
    oracle="""
    WITH u AS (
      SELECT user_id,
             max(CASE WHEN ts < TIMESTAMP '2024-01-16'
                  AND event_type = 'purchase' AND value > 200
                  THEN 1 ELSE 0 END) AS before_f,
             max(CASE WHEN ts >= TIMESTAMP '2024-01-16'
                  AND event_type = 'purchase' AND value > 200
                  THEN 1 ELSE 0 END) AS after_f
      FROM events GROUP BY user_id
    ), agg AS (
      SELECT CAST(count(*) AS BIGINT) AS n,
             CAST(sum((1 - before_f) * (1 - after_f)) AS BIGINT) AS n00,
             CAST(sum((1 - before_f) * after_f) AS BIGINT) AS n01,
             CAST(sum(before_f * (1 - after_f)) AS BIGINT) AS n10,
             CAST(sum(before_f * after_f) AS BIGINT) AS n11
      FROM u
    )
    SELECT n, n00, n01, n10, n11,
           CASE WHEN n10 + n01 > 0 THEN
             (abs(CAST(n10 AS DOUBLE) - CAST(n01 AS DOUBLE)) - 1.0)
             * (abs(CAST(n10 AS DOUBLE) - CAST(n01 AS DOUBLE)) - 1.0)
             / (CAST(n10 AS DOUBLE) + CAST(n01 AS DOUBLE)) END AS chi2
    FROM agg
    """,
)
def q_mcnemar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """McNemar's paired flip test (operators/experiments.mcnemar_test):
    per user, did big-purchase behavior FLIP between the first and
    second half of January — the paired test an unpaired
    two-proportion z throws the pairing away on. One conditional hash
    aggregate to four exact BIGINT cells; only discordant pairs enter
    the continuity-corrected chi2."""
    from oakstore_spark.operators.experiments import mcnemar_test

    e = table(spark, sf_dir, "events")
    split = F.lit("2024-01-16").cast("timestamp")
    hot = (F.col("event_type") == "purchase") & (F.col("value") > 200)
    u = e.groupBy("user_id").agg(
        F.max(
            F.when((F.col("ts") < split) & hot, 1).otherwise(0)
        ).alias("before_f"),
        F.max(
            F.when((F.col("ts") >= split) & hot, 1).otherwise(0)
        ).alias("after_f"),
    )
    return mcnemar_test(u, "before_f", "after_f")


@register(
    "q_cramers_v",
    oracle="""
    WITH cells AS (
      SELECT event_type AS a,
             CASE WHEN value > 250 THEN 'hi' ELSE 'lo' END AS b,
             CAST(count(*) AS BIGINT) AS o
      FROM events
      WHERE event_type IS NOT NULL AND value IS NOT NULL
      GROUP BY 1, 2
    ), ra AS (
      SELECT a, CAST(sum(o) AS BIGINT) AS ra FROM cells GROUP BY a
    ), cb AS (
      SELECT b, CAST(sum(o) AS BIGINT) AS cb FROM cells GROUP BY b
    ), tot AS (
      SELECT CAST(sum(o) AS BIGINT) AS n,
             CAST(count(DISTINCT a) AS BIGINT) AS r,
             CAST(count(DISTINCT b) AS BIGINT) AS c
      FROM cells
    ), agg AS (
      SELECT max(t.n) AS n, max(t.r) AS n_rows_cat,
             max(t.c) AS n_cols_cat,
             list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
               list((CAST(o AS DOUBLE)
                     - CAST(ra AS DOUBLE) * CAST(cb AS DOUBLE) / t.n)
                    * (CAST(o AS DOUBLE)
                       - CAST(ra AS DOUBLE) * CAST(cb AS DOUBLE)
                         / t.n)
                    / (CAST(ra AS DOUBLE) * CAST(cb AS DOUBLE) / t.n)
                    - CAST(ra AS DOUBLE) * CAST(cb AS DOUBLE) / t.n
                    ORDER BY cells.a, cells.b)),
               (x, y) -> x + y)
             + CAST(max(t.n) AS DOUBLE) AS chi2
      FROM cells JOIN ra USING (a) JOIN cb USING (b) CROSS JOIN tot t
    )
    SELECT n, n_rows_cat, n_cols_cat, chi2,
           CASE WHEN least(n_rows_cat, n_cols_cat) - 1 > 0
                THEN sqrt(chi2 / (CAST(n AS DOUBLE)
                     * (CAST(least(n_rows_cat, n_cols_cat) AS DOUBLE)
                        - 1.0))) END AS v
    FROM agg
    """,
)
def q_cramers_v(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cramér's V (operators/experiments.cramers_v) between event
    type and a high/low value split — the effect-size companion to
    the chi-squared independence family: contingency from one
    class-bounded aggregate, expected counts as rational chains, the
    cross-cell chi2 a fixed (a,b)-sorted fold, V one sqrt."""
    from oakstore_spark.operators.experiments import cramers_v

    e = table(spark, sf_dir, "events").select(
        "event_type",
        F.when(F.col("value") > 250, "hi").otherwise("lo").alias(
            "band"
        ),
    )
    return cramers_v(e, "event_type", "band")


@register(
    "q_odds_ratio",
    oracle="""
    WITH u AS (
      SELECT user_id,
             max(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END)
               AS ex,
             max(CASE WHEN event_type = 'purchase' AND value > 200
                  THEN 1 ELSE 0 END) AS y
      FROM events GROUP BY user_id
    ), agg AS (
      SELECT CAST(sum(ex * y) AS BIGINT) AS a,
             CAST(sum(ex * (1 - y)) AS BIGINT) AS b,
             CAST(sum((1 - ex) * y) AS BIGINT) AS c,
             CAST(sum((1 - ex) * (1 - y)) AS BIGINT) AS d
      FROM u
    )
    SELECT a, b, c, d,
           CASE WHEN a > 0 AND b > 0 AND c > 0 AND d > 0 THEN
             round(CAST(a AS DOUBLE) * d / (CAST(b AS DOUBLE) * c), 9)
           END AS odds_ratio,
           CASE WHEN a > 0 AND b > 0 AND c > 0 AND d > 0 THEN
             round(exp(ln(CAST(a AS DOUBLE) * d
                          / (CAST(b AS DOUBLE) * c))
                   - CAST('1.959963984540054' AS DOUBLE)
                     * sqrt(1 / CAST(a AS DOUBLE) + 1 / CAST(b AS DOUBLE)
                            + 1 / CAST(c AS DOUBLE)
                            + 1 / CAST(d AS DOUBLE))), 9)
           END AS lo,
           CASE WHEN a > 0 AND b > 0 AND c > 0 AND d > 0 THEN
             round(exp(ln(CAST(a AS DOUBLE) * d
                          / (CAST(b AS DOUBLE) * c))
                   + CAST('1.959963984540054' AS DOUBLE)
                     * sqrt(1 / CAST(a AS DOUBLE) + 1 / CAST(b AS DOUBLE)
                            + 1 / CAST(c AS DOUBLE)
                            + 1 / CAST(d AS DOUBLE))), 9)
           END AS hi
    FROM agg
    """,
)
def q_odds_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """2x2 odds ratio + Woolf interval
    (operators/experiments.odds_ratio): does having signed up raise
    the odds of a big purchase — one conditional aggregate to four
    exact BIGINT cells, the case-control readout as a pinned chain
    (ln/exp are the 1-ulp libm class, so the three float outputs are
    rounded to 9 decimals in both engines)."""
    from oakstore_spark.operators.experiments import odds_ratio

    e = table(spark, sf_dir, "events")
    u = e.groupBy("user_id").agg(
        F.max(
            F.when(F.col("event_type") == "signup", 1).otherwise(0)
        ).alias("ex"),
        F.max(
            F.when(
                (F.col("event_type") == "purchase")
                & (F.col("value") > 200),
                1,
            ).otherwise(0)
        ).alias("y"),
    )
    return odds_ratio(u, "ex", "y")


@register(
    "q_cohens_d",
    oracle="""
    WITH agg AS (
      SELECT CAST(sum(CASE WHEN event_type = 'purchase' THEN 1
                      ELSE 0 END) AS BIGINT) AS n_a,
             CAST(sum(CASE WHEN event_type = 'view' THEN 1
                      ELSE 0 END) AS BIGINT) AS n_b,
             CAST(sum(CASE WHEN event_type = 'purchase'
                      THEN CAST(round(value * 100) AS BIGINT)
                      ELSE 0 END) AS BIGINT) AS sa,
             CAST(sum(CASE WHEN event_type = 'view'
                      THEN CAST(round(value * 100) AS BIGINT)
                      ELSE 0 END) AS BIGINT) AS sb,
             CAST(sum(CASE WHEN event_type = 'purchase'
                      THEN CAST(round(value * 100) AS BIGINT)
                           * CAST(round(value * 100) AS BIGINT)
                      ELSE 0 END) AS BIGINT) AS qa,
             CAST(sum(CASE WHEN event_type = 'view'
                      THEN CAST(round(value * 100) AS BIGINT)
                           * CAST(round(value * 100) AS BIGINT)
                      ELSE 0 END) AS BIGINT) AS qb
      FROM events
    ), alg AS (
      SELECT n_a, n_b,
             CAST(sa AS DOUBLE) / CAST(n_a AS DOUBLE) AS ma,
             CAST(sb AS DOUBLE) / CAST(n_b AS DOUBLE) AS mb,
             ((CAST(qa AS DOUBLE) - CAST(n_a AS DOUBLE)
                 * (CAST(sa AS DOUBLE) / CAST(n_a AS DOUBLE))
                 * (CAST(sa AS DOUBLE) / CAST(n_a AS DOUBLE)))
              + (CAST(qb AS DOUBLE) - CAST(n_b AS DOUBLE)
                 * (CAST(sb AS DOUBLE) / CAST(n_b AS DOUBLE))
                 * (CAST(sb AS DOUBLE) / CAST(n_b AS DOUBLE))))
             / (CAST(n_a AS DOUBLE) + CAST(n_b AS DOUBLE) - 2) AS sp2
      FROM agg
    )
    SELECT n_a, n_b, ma AS mean_a, mb AS mean_b,
           CASE WHEN n_a >= 2 AND n_b >= 2 AND sp2 > 0
                THEN sqrt(sp2) END AS sd_pooled,
           CASE WHEN n_a >= 2 AND n_b >= 2 AND sp2 > 0
                THEN (ma - mb) / sqrt(sp2) END AS d,
           CASE WHEN n_a >= 2 AND n_b >= 2 AND sp2 > 0
                THEN (ma - mb) / sqrt(sp2)
                     * (1.0 - 3.0
                        / (4 * (CAST(n_a AS DOUBLE)
                                + CAST(n_b AS DOUBLE)) - 9))
                END AS hedges_g
    FROM alg
    """,
)
def q_cohens_d(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohen's d / Hedges' g (operators/experiments.cohens_d) between
    purchase and view event values (cents) — the metric-scale effect
    size next to q_cliffs_delta's ordinal one, the unit meta-analysis
    and power planning consume: all moments exact BIGINTs from one
    conditional aggregate, d and g pinned chains ending in the
    correctly-rounded sqrt."""
    from oakstore_spark.operators.experiments import cohens_d

    e = table(spark, sf_dir, "events").select(
        "event_type",
        F.round(F.col("value") * 100).cast("bigint").alias("cents"),
    )
    return cohens_d(
        e, "event_type", "cents", group_a="purchase", group_b="view"
    )
