"""Training-data-pipeline coverage, batch 2: unpivot/melt, explode-based
corpus statistics (document frequency, TF-IDF), stratified deterministic
sampling, exact-dup survivorship (canonical-record election), and int8
embedding quantization.

All EXT — the reference (`/root/reference/oakstore/store.py:1-267` is the
entire engine) has none of these. Scale notes per query in docstrings;
the common theme is that everything before the final (tiny) aggregation
is map-side or a single keyed shuffle, so each plan survives a 1000×
scale-up unchanged.

Oracle-parity notes (see memory: rounding ties, HUGEINT, ANSI):
- averages of exact-integer sums only (deterministic division, no
  order-dependent float accumulation before a round);
- the quantization error is floored to integer 1e-8 units PER VECTOR so
  the cross-vector sum is exact integer arithmetic in both engines;
- DuckDB ``sum(BIGINT)`` is HUGEINT → wrapped in ``CAST(... AS BIGINT)``.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from oakstore_spark.queries import register
from oakstore_spark.sources import table


# --- unpivot / melt -------------------------------------------------------

@register(
    "q_unpivot_measures",
    oracle="""
    SELECT measure,
           count(*) AS n_rows,
           round(sum(val), 2) AS total_val
    FROM (
        SELECT 'l_extendedprice' AS measure, l_extendedprice AS val FROM lineitem
        UNION ALL SELECT 'l_discount', l_discount FROM lineitem
        UNION ALL SELECT 'l_tax', l_tax FROM lineitem
    )
    GROUP BY measure
    """,
)
def q_unpivot_measures(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wide-to-long reshape via the native ``unpivot`` operator (Spark
    compiles it to a generate/expand node — one pass over the scan, no
    join, no shuffle until the 3-group aggregation). The melt itself is
    map-side, so at 100 TB it costs exactly one scan; only 3 rows cross
    the final exchange. Oracle uses the portable UNION ALL spelling."""
    li = table(spark, sf_dir, "lineitem")
    melted = li.unpivot(
        [],
        ["l_extendedprice", "l_discount", "l_tax"],
        "measure",
        "val",
    )
    return melted.groupBy("measure").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.round(F.sum("val"), 2).alias("total_val"),
    )


# --- explode: corpus document frequency -----------------------------------

@register(
    "q_word_doc_freq",
    oracle="""
    SELECT word,
           count(DISTINCT doc_id) AS df
    FROM (
        SELECT doc_id, unnest(string_split(text, ' ')) AS word
        FROM documents
    )
    WHERE word <> ''
    GROUP BY word
    ORDER BY df DESC, word
    LIMIT 20
    """,
)
def q_word_doc_freq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inverted-index statistic: per-word document frequency via
    ``explode(split(...))``, then a distinct-aggregate. The explode is
    map-side; the only shuffle is on the word key (vocabulary-sized —
    tiny vs corpus). Deterministic top-20 via the (df DESC, word) total
    order. At 100 TB the same plan holds: partial distinct per
    partition, exchange only (word, doc_id) pairs."""
    docs = table(spark, sf_dir, "documents")
    words = docs.select(
        "doc_id", F.explode(F.split(F.col("text"), " ")).alias("word")
    ).filter(F.col("word") != "")
    return (
        words.groupBy("word")
        .agg(F.countDistinct("doc_id").alias("df"))
        .orderBy(F.col("df").desc(), "word")
        .limit(20)
    )


# --- TF-IDF top term per document -----------------------------------------

_TFIDF_SCORE = "CAST(tf AS DOUBLE) * ln(CAST(n_docs AS DOUBLE) / CAST(df AS DOUBLE))"

@register(
    "q_tfidf_top_terms",
    oracle=f"""
    WITH toks AS (
        SELECT doc_id, unnest(string_split(text, ' ')) AS word
        FROM documents
    ),
    tf AS (
        SELECT doc_id, word, count(*) AS tf
        FROM toks WHERE word <> '' GROUP BY doc_id, word
    ),
    dfreq AS (
        SELECT word, count(DISTINCT doc_id) AS df
        FROM toks WHERE word <> '' GROUP BY word
    ),
    n AS (SELECT count(*) AS n_docs FROM documents)
    SELECT doc_id, word AS top_term, round(score, 6) AS tfidf
    FROM (
        SELECT tf.doc_id, tf.word,
               {_TFIDF_SCORE} AS score,
               row_number() OVER (
                   PARTITION BY tf.doc_id
                   ORDER BY {_TFIDF_SCORE} DESC, tf.word
               ) AS rn
        FROM tf JOIN dfreq USING (word) CROSS JOIN n
    )
    WHERE rn = 1
    """,
)
def q_tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Most-distinctive term per document by TF-IDF. Term frequency is a
    (doc, word) aggregation; document frequency is a vocabulary-sized
    distinct-aggregate that gets BROADCAST back onto the tf rows (no
    second corpus shuffle), as does the single-row corpus count. The
    per-doc argmax is one window over the doc key. Score arithmetic is
    identical double ops from identical integers in both engines, so the
    (score DESC, word) tie-break elects the same winner."""
    docs = table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id", F.explode(F.split(F.col("text"), " ")).alias("word")
    ).filter(F.col("word") != "")
    # r15 derived document frequency from the (doc, word, tf) relation
    # (one row per distinct (doc, word), so count(*) per word equals
    # countDistinct(doc_id) bit-for-bit) and PERSISTED tf. r16
    # (r15 verdict ask #4): the persist is dropped — tf is corpus-
    # sized (doc x word pairs), so caching it is the guide §5
    # anti-pattern at 100 TB (cache write + read of corpus-scale data
    # vs one extra map-side tokenize), and locally it was a measured
    # tax (r15 bench 1.4x; interleaved A/B this round: no-persist
    # ~0.9x). The dfreq branch re-evaluates the tokenize subtree:
    # 2 map-side scans, unchanged values.
    tf = toks.groupBy("doc_id", "word").agg(
        F.count(F.lit(1)).alias("tf")
    )
    dfreq = tf.groupBy("word").agg(
        F.count(F.lit(1)).cast("bigint").alias("df")
    )
    n = docs.agg(F.count(F.lit(1)).alias("n_docs"))
    score = (
        F.col("tf").cast("double")
        * F.log(F.col("n_docs").cast("double") / F.col("df").cast("double"))
    )
    scored = (
        tf.join(F.broadcast(dfreq), "word")
        .crossJoin(F.broadcast(n))
        .withColumn("score", score)
    )
    win = W.partitionBy("doc_id").orderBy(F.col("score").desc(), "word")
    return (
        scored.withColumn("rn", F.row_number().over(win))
        .filter(F.col("rn") == 1)
        .select(
            "doc_id",
            F.col("word").alias("top_term"),
            F.round("score", 6).alias("tfidf"),
        )
    )


# --- stratified deterministic sampling ------------------------------------

@register(
    "q_stratified_sample",
    oracle="""
    SELECT lang,
           count(*) AS n_sampled,
           round(CAST(sum(n_chars) AS BIGINT) / CAST(count(*) AS DOUBLE), 2)
               AS avg_chars
    FROM documents
    WHERE (lang = 'en'
           AND substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) IN ('0','1','2','3'))
       OR (lang <> 'en'
           AND substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) = '0')
    GROUP BY lang
    """,
)
def q_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-stratum sampling at different rates (1/4 for 'en', 1/16
    otherwise) with ENGINE-PORTABLE deterministic membership: md5 of the
    key's decimal string, first hex nibble. This is how training
    pipelines rebalance language mixes reproducibly — membership is a
    pure function of the row key, stable across runs, engines, and
    partitionings (unlike rand()/sampleBy). Entirely map-side except the
    5-row aggregation. The average divides an exact integer sum, so no
    order-dependent float accumulation precedes the round."""
    docs = table(spark, sf_dir, "documents")
    nibble = F.substring(
        F.md5(F.encode(F.col("doc_id").cast("string"), "UTF-8")), 1, 1
    )
    keep = (
        ((F.col("lang") == "en") & nibble.isin("0", "1", "2", "3"))
        | ((F.col("lang") != "en") & (nibble == "0"))
    )
    return (
        docs.filter(keep)
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_sampled"),
            F.round(
                F.sum("n_chars").cast("bigint")
                / F.count(F.lit(1)).cast("double"),
                2,
            ).alias("avg_chars"),
        )
    )


# --- exact-dup survivorship (canonical-record election) -------------------

@register(
    "q_dedup_survivors",
    oracle="""
    WITH ranked AS (
        SELECT source, n_chars,
               row_number() OVER (
                   PARTITION BY md5(text)
                   ORDER BY n_chars DESC, doc_id
               ) AS rn
        FROM documents
    )
    SELECT source,
           CAST(sum(CASE WHEN rn = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
           CAST(sum(CASE WHEN rn > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_dropped,
           CAST(sum(CASE WHEN rn = 1 THEN n_chars ELSE 0 END) AS BIGINT)
               AS kept_chars
    FROM ranked
    GROUP BY source
    """,
)
def q_dedup_survivors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Survivorship after exact dedup: within each content-hash group
    elect one canonical record (longest, then lowest doc_id) and report
    kept/dropped per source. One shuffle on the 128-bit content hash —
    uniformly distributed, so no skew at any scale; the window state per
    group is the duplicate-set size (bounded). This is the keep/drop
    audit step that follows ``exact_dedup`` in a real pipeline."""
    docs = table(spark, sf_dir, "documents")
    win = W.partitionBy(F.md5(F.encode("text", "UTF-8"))).orderBy(
        F.col("n_chars").desc(), "doc_id"
    )
    ranked = docs.withColumn("rn", F.row_number().over(win))
    kept = F.col("rn") == 1
    return ranked.groupBy("source").agg(
        F.sum(F.when(kept, 1).otherwise(0)).cast("bigint").alias("n_kept"),
        F.sum(F.when(~kept, 1).otherwise(0)).cast("bigint").alias("n_dropped"),
        F.sum(F.when(kept, F.col("n_chars")).otherwise(0))
        .cast("bigint")
        .alias("kept_chars"),
    )


# --- null semantics (three-valued logic, null groups, null-safe eq) -------

@register(
    "q_null_semantics",
    oracle="""
    SELECT COALESCE(status_n, 'UNKNOWN') AS status,
           count(*) AS n_rows,
           count(status_n) AS n_nonnull,
           CAST(sum(CASE WHEN status_n IS NOT DISTINCT FROM 'F'
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_nullsafe_f
    FROM (SELECT nullif(o_orderstatus, 'O') AS status_n FROM orders)
    GROUP BY status_n
    """,
)
def q_null_semantics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Three-valued-logic coverage: NULLs synthesized with ``nullif``,
    grouped (the NULL group must survive), counted both ways
    (``count(*)`` vs ``count(col)``), and compared null-safely
    (Spark ``<=>`` ≡ SQL ``IS NOT DISTINCT FROM``). All map-side except
    the 3-group aggregation."""
    o = table(spark, sf_dir, "orders")
    status_n = F.nullif(F.col("o_orderstatus"), F.lit("O"))
    return (
        o.select(status_n.alias("status_n"))
        .groupBy("status_n")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.count("status_n").alias("n_nonnull"),
            F.sum(F.col("status_n").eqNullSafe("F").cast("int"))
            .cast("bigint")
            .alias("n_nullsafe_f"),
        )
        .select(
            F.coalesce("status_n", F.lit("UNKNOWN")).alias("status"),
            "n_rows",
            "n_nonnull",
            "n_nullsafe_f",
        )
    )


# --- exact decimal money arithmetic ---------------------------------------

@register(
    "q_decimal_money",
    oracle="""
    WITH cents AS (
        SELECT CAST(year(o_orderdate) AS BIGINT) AS yr,
               CAST(round(o_totalprice * 100) AS BIGINT) AS c
        FROM orders
    )
    SELECT yr,
           count(*) AS n_orders,
           CAST(CAST(CAST(sum(c) AS DECIMAL(38,0)) / 100 AS DECIMAL(38,2))
                AS DOUBLE) AS revenue_dec
    FROM cents
    GROUP BY yr
    """,
)
def q_decimal_money(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact decimal money aggregation — the fixed-point path financial
    rollups need, where float accumulation order must not show up in the
    ledger. Doubles become integer cents once (map-side), the sum is
    exact integer/decimal arithmetic, and the result is quantized to
    DECIMAL(38,2) identically in both engines (surfaced as double only
    because DuckDB's pandas bridge floats wide decimals). One shuffle."""
    o = table(spark, sf_dir, "orders")
    cents = o.select(
        F.year("o_orderdate").cast("bigint").alias("yr"),
        F.round(F.col("o_totalprice") * 100).cast("bigint").alias("c"),
    )
    return cents.groupBy("yr").agg(
        F.count(F.lit(1)).alias("n_orders"),
        (F.sum("c").cast("decimal(38,0)") / 100)
        .cast("decimal(38,2)")
        .cast("double")
        .alias("revenue_dec"),
    )


# --- rolling median (order-statistic window frame) ------------------------

@register(
    "q_rolling_median",
    oracle="""
    SELECT user_id, event_id,
           round(median(value) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN 24 PRECEDING AND CURRENT ROW), 6) AS med25
    FROM events
    """,
)
def q_rolling_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling 25-row median per user — the robust-statistics sibling of
    the rolling mean (spike-resistant signal smoothing). Spark refuses
    aggregate ``median`` over a window frame, so the frame's values are
    gathered with ``collect_list`` (bounded: ≤25 elements) and the
    interpolated order statistic is computed with array expressions —
    all JVM-side, one shuffle on user_id. The (ts, event_id) ordering
    key is a total order, so frame contents are engine-independent."""
    ev = table(spark, sf_dir, "events")
    win = (
        W.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-24, W.currentRow)
    )
    arr = F.sort_array(F.collect_list("value").over(win))
    n = F.size(arr)
    odd = F.element_at(arr, ((n + 1) / 2).cast("int"))
    even = (
        F.element_at(arr, (n / 2).cast("int"))
        + F.element_at(arr, (n / 2 + 1).cast("int"))
    ) / 2.0
    med = F.when(n % 2 == 1, odd).otherwise(even)
    return ev.select(
        "user_id", "event_id", F.round(med, 6).alias("med25")
    )


# --- int8 embedding quantization ------------------------------------------

@register(
    "q_int8_quantize",
    oracle="""
    WITH v AS (
        SELECT label,
               list_transform(embedding, x -> CAST(x AS DOUBLE)) AS vec
        FROM embeddings
    ),
    scaled AS (
        SELECT label,
               vec,
               list_max(list_transform(vec, x -> abs(x))) / 127.0 AS scale
        FROM v
    ),
    err AS (
        SELECT label,
               CASE WHEN scale = 0 THEN 0.0
                    ELSE list_sum(list_transform(vec,
                        x -> abs(x - floor(x / scale + 0.5) * scale)))
               END AS vec_err
        FROM scaled
    )
    SELECT label,
           count(*) AS n_vecs,
           CAST(sum(CAST(floor(vec_err * 100000000 + 0.5) AS BIGINT))
                AS BIGINT) AS err_units
    FROM err
    GROUP BY label
    """,
)
def q_int8_quantize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Symmetric per-vector int8 quantization (scale = max|x|/127,
    q = round(x/scale)) with total absolute reconstruction error per
    label — the compression step before shipping embeddings to an ANN
    index. Spark side is an Arrow-batched numpy kernel in
    ``mapInPandas`` (vectorized float64 matops; HOF expressions are
    interpreted and ~10× slower — see similarity.py). Map-side until
    the per-label aggregation. The per-vector error is floored to
    integer 1e-8 units BEFORE the cross-vector sum, so the group
    aggregation is exact integer math in both engines (no
    accumulation-order sensitivity)."""
    import numpy as np

    emb = table(spark, sf_dir, "embeddings")

    def quantize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            mat = np.stack(pdf["embedding"].to_numpy()).astype(np.float64)
            scale = np.abs(mat).max(axis=1) / 127.0
            safe = np.where(scale == 0.0, 1.0, scale)[:, None]
            deq = np.floor(mat / safe + 0.5) * safe
            err = np.abs(mat - deq).sum(axis=1)
            err = np.where(scale == 0.0, 0.0, err)
            units = np.floor(err * 1e8 + 0.5).astype(np.int64)
            yield pd.DataFrame(
                {"label": pdf["label"], "unit": units}
            )

    from oakstore_spark.operators.scaling import widen_partitions

    per_vec = widen_partitions(emb.select("label", "embedding")).mapInPandas(
        quantize, "label int, unit long"
    )
    return per_vec.groupBy("label").agg(
        F.count(F.lit(1)).alias("n_vecs"),
        F.sum("unit").cast("bigint").alias("err_units"),
    )


# --- benchmark decontamination (n-gram overlap vs eval set) ---------------

@register(
    "q_decontaminate",
    oracle="""
    WITH words AS (
        SELECT doc_id, source, string_split(text, ' ') AS ws FROM documents
    ), grams AS (
        SELECT doc_id, source,
               unnest(list_transform(range(1, len(ws) - 1),
                                     i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2])) AS g
        FROM words WHERE len(ws) >= 3
    ), eval_grams AS (
        SELECT DISTINCT g FROM grams WHERE doc_id < 20
    ), hits AS (
        SELECT DISTINCT grams.doc_id, grams.source
        FROM grams JOIN eval_grams USING (g)
        WHERE grams.doc_id >= 20
    )
    SELECT d.source,
           count(*) AS n_docs,
           CAST(count(h.doc_id) AS BIGINT) AS n_contaminated
    FROM (SELECT doc_id, source FROM documents WHERE doc_id >= 20) d
    LEFT JOIN hits h ON d.doc_id = h.doc_id
    GROUP BY d.source
    """,
)
def q_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination: flag training docs sharing any word
    3-gram with a (small) eval set — the pre-training hygiene step that
    keeps test benchmarks out of the corpus. The eval side's distinct
    grams are inherently small (benchmarks are KBs, corpora are TBs),
    so the overlap check is a BROADCAST semi join against the exploded
    corpus grams: the 100 TB side streams map-side, never shuffles on
    the gram key, and dedups per doc before the per-source rollup."""
    d = table(spark, sf_dir, "documents")

    def grams_of(df):
        # bind the split word array ONCE as a lambda variable (same trap
        # as q_bigram_mass: referencing the split expression inside the
        # inner transform would re-split the text per gram position)
        def _grams(ws):
            return F.when(
                F.size(ws) >= 3,
                F.transform(
                    F.sequence(F.lit(0), F.size(ws) - 3),
                    lambda i: F.concat_ws(
                        " ",
                        F.element_at(ws, i + 1),
                        F.element_at(ws, i + 2),
                        F.element_at(ws, i + 3),
                    ),
                ),
            ).otherwise(F.array().cast("array<string>"))

        g = F.element_at(F.transform(F.array(F.split("text", " ")), _grams), 1)
        return df.select("doc_id", "source", F.explode(g).alias("g"))

    eval_grams = (
        grams_of(d.filter(F.col("doc_id") < 20)).select("g").distinct()
    )
    corpus = d.filter(F.col("doc_id") >= 20)
    hits = (
        grams_of(corpus)
        .join(F.broadcast(eval_grams), "g", "left_semi")
        .select("doc_id")
        .distinct()
        .withColumn("_hit", F.lit(1))
    )
    return (
        corpus.select("doc_id", "source")
        .join(hits, "doc_id", "left")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.coalesce(F.col("_hit"), F.lit(0)))
            .cast("bigint")
            .alias("n_contaminated"),
        )
    )


# --- sequence packing (token-budget bucketing) ----------------------------

@register(
    "q_pack_sequences",
    oracle="""
    WITH toks AS (
        SELECT doc_id, source,
               CASE WHEN len(trim(text)) = 0 THEN 0
                    ELSE len(string_split_regex(trim(text), '\\s+')) END AS n_tokens
        FROM documents
    ), packed AS (
        SELECT source, doc_id, n_tokens,
               CAST(floor((sum(n_tokens) OVER (PARTITION BY source ORDER BY doc_id
                           ROWS UNBOUNDED PRECEDING) - n_tokens) / 2048.0) AS BIGINT)
                   AS pack_id
        FROM toks
    )
    SELECT source, pack_id,
           count(*) AS n_docs,
           CAST(sum(n_tokens) AS BIGINT) AS pack_tokens
    FROM packed GROUP BY source, pack_id
    """,
)
def q_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence packing: stream documents (per source, in doc_id order)
    into ~2048-token training sequences — pack id = floor(preceding
    cumulative tokens / budget), the standard streaming concat-and-cut
    packing. One window sort per source partition (sources are parallel;
    at 100 TB you pack per shuffle-partition instead of per logical
    source, same expression); the rollup is map-side-combining."""
    from oakstore_spark.functions.text import token_count

    d = table(spark, sf_dir, "documents")
    toks = d.select("doc_id", "source", token_count("text").alias("n_tokens"))
    w = W.partitionBy("source").orderBy("doc_id").rowsBetween(W.unboundedPreceding, 0)
    packed = toks.withColumn(
        "pack_id",
        F.floor((F.sum("n_tokens").over(w) - F.col("n_tokens")) / 2048.0).cast(
            "bigint"
        ),
    )
    return packed.groupBy("source", "pack_id").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").cast("bigint").alias("pack_tokens"),
    )


# --- embedding mean-pooling per label -------------------------------------

@register(
    "q_embed_mean_pool",
    oracle="""
    WITH flat AS (
        SELECT label,
               unnest(embedding) AS v,
               generate_subscripts(embedding, 1) AS dim_idx
        FROM embeddings
    )
    SELECT label, CAST(dim_idx - 1 AS INT) AS dim_idx,
           round(avg(v), 6) AS mean_v
    FROM flat GROUP BY label, dim_idx
    """,
)
def q_embed_mean_pool(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-class centroid (mean-pooled embedding), emitted long-form as
    (label, dim, mean): posexplode -> two-level hash agg. The explode
    multiplies rows by dim (64) but partial aggregation collapses each
    (label, dim) map-side before the shuffle, so shuffle volume is
    n_labels x dim regardless of corpus size. (The wide-form
    alternative — elementwise array aggregate — needs a custom UDAF;
    long-form keeps it whole-stage-codegen JVM arithmetic.)"""
    e = table(spark, sf_dir, "embeddings")
    flat = e.select("label", F.posexplode("embedding").alias("dim_idx", "v"))
    return flat.groupBy("label", "dim_idx").agg(
        F.round(F.avg("v"), 6).alias("mean_v")
    )


# --- end-to-end curation pipeline (compose the stages) --------------------

def _word3_grams(df: DataFrame) -> DataFrame:
    """(doc_id, g): every word-3-gram of each doc — the decontamination
    join key shared by the composed pipelines."""

    def _grams(ws):
        return F.when(
            F.size(ws) >= 3,
            F.transform(
                F.sequence(F.lit(0), F.size(ws) - 3),
                lambda i: F.concat_ws(
                    " ",
                    F.element_at(ws, i + 1),
                    F.element_at(ws, i + 2),
                    F.element_at(ws, i + 3),
                ),
            ),
        ).otherwise(F.array().cast("array<string>"))

    g = F.element_at(F.transform(F.array(F.split("text", " ")), _grams), 1)
    return df.select("doc_id", F.explode(g).alias("g"))


@register(
    "q_training_set_pipeline",
    oracle="""
    WITH base AS (
      SELECT doc_id, source, text,
             CASE WHEN len(trim(text)) = 0 THEN 0
                  ELSE len(string_split_regex(trim(text), '\\s+')) END AS toks
      FROM documents
      WHERE lang = 'en' AND doc_id >= 20
    ), keep_ids AS (
      SELECT min(doc_id) AS doc_id FROM base GROUP BY md5(text)
    ), deduped AS (
      SELECT base.* FROM base JOIN keep_ids USING (doc_id)
    ), words AS (
      SELECT doc_id, string_split(text, ' ') AS ws FROM documents
    ), grams AS (
      SELECT doc_id,
             unnest(list_transform(range(1, len(ws) - 1),
                                   i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2])) AS g
      FROM words WHERE len(ws) >= 3
    ), eval_grams AS (
      SELECT DISTINCT g FROM grams WHERE doc_id < 20
    ), contaminated AS (
      SELECT DISTINCT grams.doc_id FROM grams JOIN eval_grams USING (g)
      WHERE grams.doc_id >= 20
    )
    SELECT source,
           count(*) AS n_docs,
           CAST(sum(toks) AS BIGINT) AS total_tokens
    FROM deduped
    WHERE doc_id NOT IN (SELECT doc_id FROM contaminated)
    GROUP BY source
    """,
)
def q_training_set_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full curation pipeline as ONE composed query — the shape a
    real pre-training data build runs nightly: language filter ->
    exact dedup (keep lowest doc_id per content hash) -> benchmark
    decontamination (drop docs sharing a word-3-gram with the eval set)
    -> per-source token accounting. Every stage reuses the registered
    operator (filters map-side; dedup shuffles 16-byte digests;
    decontamination is a broadcast semi-join), so the composition adds
    no new shuffle beyond its parts."""
    from oakstore_spark.functions.text import token_count
    from oakstore_spark.operators.dedup import exact_dedup

    d = table(spark, sf_dir, "documents")
    base = d.filter((F.col("lang") == "en") & (F.col("doc_id") >= 20))
    keep = exact_dedup(base, "doc_id", "text").select(
        F.col("keep_id").alias("doc_id")
    )
    deduped = base.join(keep, "doc_id", "left_semi")

    eval_grams = (
        _word3_grams(d.filter(F.col("doc_id") < 20)).select("g").distinct()
    )
    contaminated = (
        _word3_grams(d.filter(F.col("doc_id") >= 20))
        .join(F.broadcast(eval_grams), "g", "left_semi")
        .select("doc_id")
        .distinct()
    )
    clean = deduped.join(contaminated, "doc_id", "left_anti")
    return clean.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(token_count("text")).cast("bigint").alias("total_tokens"),
    )


_E2E_NORM = (
    "trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9\\s]', '', 'g'),"
    " '\\s+', ' ', 'g'))"
)
_E2E_TOKS = (
    "CASE WHEN len(trim(text)) = 0 THEN 0 "
    "ELSE len(string_split_regex(trim(text), '\\s+')) END"
)


@register(
    "q_curation_e2e",
    oracle=f"""
    WITH base AS (
      SELECT doc_id, source, text, {_E2E_TOKS} AS toks
      FROM documents
      WHERE lang = 'en' AND doc_id >= 20
    ), keep_ids AS (
      SELECT min(doc_id) AS doc_id FROM base GROUP BY md5(text)
    ), ded AS (
      SELECT base.* FROM base JOIN keep_ids USING (doc_id)
    ), sh AS (
      SELECT doc_id,
             list_distinct(list_transform(
               range(1, greatest(len({_E2E_NORM}) - 2, 1) + 1),
               i -> substr({_E2E_NORM}, i, 3))) AS s
      FROM ded
    ), nd_rejects AS (
      SELECT DISTINCT b.doc_id
      FROM sh a JOIN sh b ON a.doc_id < b.doc_id
        AND 100 * least(len(a.s), len(b.s)) >= 85 * greatest(len(a.s), len(b.s))
      WHERE len(list_intersect(a.s, b.s))
            / CAST(len(list_distinct(list_concat(a.s, b.s))) AS DOUBLE)
            >= 0.85
    ), words AS (
      SELECT doc_id, string_split(text, ' ') AS ws FROM documents
    ), grams AS (
      SELECT doc_id,
             unnest(list_transform(range(1, len(ws) - 1),
                                   i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2])) AS g
      FROM words WHERE len(ws) >= 3
    ), eval_grams AS (
      SELECT DISTINCT g FROM grams WHERE doc_id < 20
    ), contaminated AS (
      SELECT DISTINCT grams.doc_id FROM grams JOIN eval_grams USING (g)
      WHERE grams.doc_id >= 20
    )
    SELECT source,
           count(*) AS n_docs,
           CAST(sum(toks) AS BIGINT) AS total_tokens
    FROM ded
    WHERE doc_id NOT IN (SELECT doc_id FROM nd_rejects)
      AND doc_id NOT IN (SELECT doc_id FROM contaminated)
      AND toks >= 10
      AND substr(md5(CAST(doc_id AS VARCHAR)), 1, 1)
          IN ('0','1','2','3','4','5','6','7')
    GROUP BY source
    """,
)
def q_curation_e2e(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The FULL curation chain as one composed, fully-oracled query —
    one rung deeper than q_training_set_pipeline: language filter →
    exact dedup (keep-min-id per content hash) → NEAR-dup rejection
    (minhash LSH + exact-jaccard verify at 0.85; reject the higher id
    of every verified pair) → length quality gate (≥10 tokens) →
    benchmark decontamination (word-3-gram overlap with the doc_id<20
    eval set) → deterministic 1/2 mix (md5-nibble membership) →
    per-source token accounting. Every stage is the registered
    operator; the composition's only corpus-sized shuffles are the
    content-hash agg and the minhash band joins — everything else is
    map-side or a broadcast semi/anti join. Tracked round-over-round in
    BENCH_DETAIL as the cross-operator regression canary."""
    from oakstore_spark.functions.text import token_count
    from oakstore_spark.operators.dedup import exact_dedup, minhash_lsh_pairs

    d = table(spark, sf_dir, "documents")
    base = d.filter((F.col("lang") == "en") & (F.col("doc_id") >= 20))
    keep = exact_dedup(base, "doc_id", "text").select(
        F.col("keep_id").alias("doc_id")
    )
    ded = base.join(keep, "doc_id", "left_semi")

    # near-dup: id_a < id_b on both operator paths, so keep-first-by-id
    # means rejecting every id_b
    pairs = minhash_lsh_pairs(ded, "doc_id", "text", threshold=0.85)
    nd_rejects = pairs.select(F.col("id_b").alias("doc_id")).distinct()

    eval_grams = (
        _word3_grams(d.filter(F.col("doc_id") < 20)).select("g").distinct()
    )
    contaminated = (
        _word3_grams(d.filter(F.col("doc_id") >= 20))
        .join(F.broadcast(eval_grams), "g", "left_semi")
        .select("doc_id")
        .distinct()
    )
    nibble = F.substring(
        F.md5(F.encode(F.col("doc_id").cast("string"), "UTF-8")), 1, 1
    )
    clean = (
        ded.join(nd_rejects, "doc_id", "left_anti")
        .join(contaminated, "doc_id", "left_anti")
        .where(token_count("text") >= 10)
        .where(nibble.isin(*"01234567"))
    )
    return clean.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(token_count("text")).cast("bigint").alias("total_tokens"),
    )


@register(
    "q_feature_hashing",
    oracle="""
    WITH terms AS (
      SELECT doc_id,
             unnest(string_split_regex(trim(regexp_replace(
               regexp_replace(lower(text), '[^a-z0-9\\s]', '', 'g'),
               '\\s+', ' ', 'g')), ' ')) AS term
      FROM documents
    ), bucketed AS (
      SELECT doc_id,
             CAST(('0x' || substr(md5(term), 1, 8)) AS BIGINT) % 64
               AS bucket
      FROM terms WHERE term <> ''
    )
    SELECT doc_id, CAST(bucket AS INT) AS bucket,
           count(*) AS n_terms
    FROM bucketed GROUP BY doc_id, bucket
    """,
)
def q_feature_hashing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The hashing trick (feature hashing): terms map to a FIXED 64-dim
    bucket space via a hash, no vocabulary pass, no fit step — the
    standard unbounded-cardinality categorical encoder for streaming/
    huge corpora. Bucket = first 8 md5 hex chars mod 64 so both engines
    hash identically (Spark's xxhash64 and DuckDB's hash are different
    functions — a portable encoder must pin the hash). Entirely JVM:
    explode + conv + agg; long-form (doc, bucket, count) output is the
    sparse-vector representation."""
    from oakstore_spark.functions.text import normalize_text

    d = table(spark, sf_dir, "documents")
    terms = d.select(
        "doc_id",
        F.explode(F.split(normalize_text("text"), " ")).alias("term"),
    ).where(F.col("term") != "")
    bucket = (
        F.conv(F.substring(F.md5("term"), 1, 8), 16, 10).cast("bigint") % 64
    )
    return terms.select("doc_id", bucket.cast("int").alias("bucket")).groupBy(
        "doc_id", "bucket"
    ).agg(F.count(F.lit(1)).alias("n_terms"))


_CMS_D = 4
_CMS_W = 512


@register(
    "q_cms_heavy_hitters",
    oracle=f"""
    WITH terms AS (
      SELECT unnest(string_split_regex(trim(regexp_replace(
               regexp_replace(lower(text), '[^a-z0-9\\s]', '', 'g'),
               '\\s+', ' ', 'g')), ' ')) AS term
      FROM documents
    ), terms2 AS (
      SELECT term FROM terms WHERE term <> ''
    ), cells AS (
      SELECT r,
             CAST(('0x' || substr(md5(CAST(r AS VARCHAR) || ':' || term),
                                  1, 8)) AS BIGINT) % {_CMS_W} AS bucket,
             count(*) AS c
      FROM terms2, range(0, {_CMS_D}) rr(r)
      GROUP BY 1, 2
    ), probes AS (
      SELECT term, count(*) AS exact_n
      FROM terms2 GROUP BY 1
      ORDER BY exact_n DESC, term ASC LIMIT 20
    )
    SELECT term,
           CAST(exact_n AS BIGINT) AS exact_n,
           CAST(min(c) AS BIGINT) AS cms_est
    FROM probes, range(0, {_CMS_D}) rr(r)
    JOIN cells ON cells.r = rr.r
     AND cells.bucket = CAST(('0x' || substr(md5(CAST(rr.r AS VARCHAR)
                              || ':' || term), 1, 8)) AS BIGINT) % {_CMS_W}
    GROUP BY term, exact_n
    """,
)
def q_cms_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min sketch frequency estimation, probed on the corpus's 20
    most frequent terms. The sketch is a 4x512 counter grid:
    every token increments one bucket per hash row; a term's estimate is
    the MIN over its row buckets — never below the true count, above it
    only through collisions. The whole sketch is one tiny aggregate
    (d*w cells regardless of corpus size) and estimates are a broadcast
    join against it, which is why CMS is the standard one-pass,
    mergeable, fixed-memory frequency structure at 100 TB (per-partition
    partial grids combine by cell-wise addition inside the hash agg).
    The hash is pinned to md5 hex (as in q_feature_hashing) so DuckDB
    rebuilds the IDENTICAL grid — estimates, not just bounds, must
    match. Exact counts ride along for the error-visible comparison."""
    from oakstore_spark.functions.text import normalize_text

    d = table(spark, sf_dir, "documents")
    terms = d.select(
        F.explode(F.split(normalize_text("text"), " ")).alias("term")
    ).where(F.col("term") != "")

    def bucket(row_col, term_col):
        key = F.concat(row_col.cast("string"), F.lit(":"), term_col)
        return (
            F.conv(F.substring(F.md5(key), 1, 8), 16, 10).cast("bigint")
            % _CMS_W
        )

    rows = F.explode(F.array(*[F.lit(i) for i in range(_CMS_D)])).alias("r")
    # One corpus pass total: aggregate exact term counts first
    # (vocab-sized), then build the grid by summing COUNTS of the
    # distinct terms into their buckets — cell-wise identical to
    # incrementing per token, but the d-way row fan-out and the md5
    # hashing run over the vocabulary, not the token stream.
    tf = terms.groupBy("term").agg(F.count(F.lit(1)).alias("exact_n"))
    cells = (
        tf.select("term", "exact_n", rows)
        .select("r", bucket(F.col("r"), F.col("term")).alias("bucket"), "exact_n")
        .groupBy("r", "bucket")
        .agg(F.sum("exact_n").alias("c"))
    )
    probes = tf.orderBy(F.desc("exact_n"), F.asc("term")).limit(20)
    probe_cells = probes.select(
        "term", "exact_n", rows
    ).withColumn("bucket", bucket(F.col("r"), F.col("term")))
    return (
        probe_cells.join(F.broadcast(cells), ["r", "bucket"])
        .groupBy("term", "exact_n")
        .agg(F.min("c").alias("cms_est"))
        .select("term", "exact_n", "cms_est")
    )


@register(
    "q_assign_ids",
    oracle="""
    SELECT doc_id,
           CAST(row_number() OVER (ORDER BY doc_id) AS BIGINT) AS seq_id
    FROM documents
    """,
)
def q_assign_ids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed contiguous row numbering (scalable zipWithIndex):
    range-partition + local sort + per-partition offset arithmetic
    instead of the empty-key Window that would drag 100 TB through ONE
    task. The oracle is the exact global row_number, so every id must
    land identically; the plan contains a rangepartitioning exchange
    and NO Window / single-partition sort (pinned in
    tests/test_plans.py)."""
    from oakstore_spark.operators.scaling import assign_contiguous_ids

    d = table(spark, sf_dir, "documents").select("doc_id")
    return assign_contiguous_ids(d, "doc_id")


@register(
    "q_fixed_count_sample",
    oracle="""
    SELECT doc_id, lang, CAST(rk AS INT) AS rk
    FROM (
      SELECT doc_id, lang,
             row_number() OVER (
               PARTITION BY lang
               ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
             ) AS rk
      FROM documents
    )
    WHERE rk <= 30
    """,
)
def q_fixed_count_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACTLY-n-per-group deterministic sampling: rank rows inside each
    stratum by md5 of the key (a reproducible shuffle order — no rand())
    and keep the first 30. Complements the rate-based samplers
    (q_stratified_sample keeps ~p*n with binomial noise, map-side; this
    keeps exactly n at the cost of one per-stratum window shuffle —
    fine when strata counts are the thing being pinned, e.g. eval-set
    carving). Oracle replays the identical ordering, so the kept SET
    matches row-for-row, not just per-group counts."""
    d = table(spark, sf_dir, "documents")
    win = W.partitionBy("lang").orderBy(
        F.md5(F.encode(F.col("doc_id").cast("string"), "UTF-8")), "doc_id"
    )
    return (
        d.select("doc_id", "lang", F.row_number().over(win).alias("rk"))
        .filter(F.col("rk") <= 30)
    )


@register(
    "q_fim_transform",
    oracle="""
    WITH d AS (
      SELECT doc_id, text, length(text) AS n,
             1 + CAST(floor(length(text) * (CAST(('0x' ||
                 substr(md5(CAST(doc_id AS VARCHAR) || ':a'), 1, 8))
                 AS BIGINT) % 1000) / 2500.0) AS INT) AS cut1_raw
      FROM documents WHERE length(text) >= 20
    ), c AS (
      SELECT doc_id, text, n, cut1_raw AS cut1,
             cut1_raw + 1 + CAST(floor((n - cut1_raw) * (CAST(('0x' ||
                 substr(md5(CAST(doc_id AS VARCHAR) || ':b'), 1, 8))
                 AS BIGINT) % 1000) / 2000.0) AS INT) AS cut2
      FROM d
    )
    SELECT doc_id,
           CAST(cut1 AS INT) AS prefix_len,
           CAST(cut2 - cut1 AS INT) AS middle_len,
           CAST(n - cut2 AS INT) AS suffix_len,
           md5('<PRE>' || substr(text, 1, cut1) || '<SUF>'
               || substr(text, cut2 + 1) || '<MID>'
               || substr(text, cut1 + 1, cut2 - cut1)) AS fim_md5
    FROM c
    """,
)
def q_fim_transform(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fill-in-the-middle (FIM) training transformation (Bavarian et al.
    2022): split each document at two DETERMINISTIC pseudo-random cut
    points (md5-derived fractions of the length — max 40% prefix, then
    up to half the remainder as middle) and re-serialize as
    PRE/SUF/MID order, the exact preprocessing used to teach code
    models infilling. Pure map-side string arithmetic — zero shuffles
    at any corpus size. Both engines rebuild the reordered string and
    md5 it, so one off-by-one in either substring math is a hash
    mismatch."""
    d = table(spark, sf_dir, "documents").where(F.length("text") >= 20)
    n = F.length("text")

    def hsalt(salt: str, mod: int):
        key = F.concat(F.col("doc_id").cast("string"), F.lit(":" + salt))
        return F.conv(F.substring(F.md5(key), 1, 8), 16, 10).cast("bigint") % mod

    # multiply in exact integers FIRST, divide once — the identical
    # association the oracle uses ((n*h)/den, one double rounding), so
    # floor can never land on a different side of a boundary than SQL
    cut1 = (F.lit(1) + F.floor(n * hsalt("a", 1000) / F.lit(2500.0))).cast("int")
    cut2 = (
        cut1 + 1 + F.floor((n - cut1) * hsalt("b", 1000) / F.lit(2000.0))
    ).cast("int")
    pre = F.substring(F.col("text"), F.lit(1), cut1)
    mid = F.substring(F.col("text"), cut1 + 1, cut2 - cut1)
    suf = F.substring(F.col("text"), cut2 + 1, n - cut2)
    return d.select(
        "doc_id",
        cut1.alias("prefix_len"),
        (cut2 - cut1).alias("middle_len"),
        (n - cut2).cast("int").alias("suffix_len"),
        F.md5(
            F.encode(
                F.concat(
                    F.lit("<PRE>"), pre, F.lit("<SUF>"), suf,
                    F.lit("<MID>"), mid,
                ),
                "UTF-8",
            )
        ).alias("fim_md5"),
    )


@register(
    "q_global_sample_topk",
    oracle="""
    SELECT doc_id, lang
    FROM documents
    ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
    LIMIT 100
    """,
)
def q_global_sample_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exactly-K global deterministic sample: rank the whole corpus by
    md5(key) and take the first 100. Spark compiles orderBy+limit to
    TakeOrderedAndProject — each partition keeps its local top-K in a
    bounded heap and the driver merges K-sized heaps, so there is NO
    global sort and NO single-partition exchange even though the result
    is a total-order prefix (plan-pinned in tests/test_plans.py). The
    md5 order makes the sample reproducible across runs/engines — the
    global-quota sibling of q_fixed_count_sample's per-group quotas."""
    d = table(spark, sf_dir, "documents")
    return (
        d.select("doc_id", "lang")
        .orderBy(F.md5(F.encode(F.col("doc_id").cast("string"), "UTF-8")), "doc_id")
        .limit(100)
    )


@register(
    "q_target_encoding",
    oracle="""
    WITH g AS (
      SELECT event_type,
             sum(CAST(round(value * 100) AS BIGINT)) AS s_cents,
             count(*) AS n
      FROM events GROUP BY event_type
    )
    SELECT event_id,
           round((s_cents - CAST(round(value * 100) AS BIGINT))
                 / CAST(n - 1 AS DOUBLE) / 100.0, 6) AS te
    FROM events JOIN g USING (event_type)
    """,
)
def q_target_encoding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leave-one-out target encoding — the standard high-cardinality
    categorical feature for tabular models, with the LOO correction
    that prevents the row's own label from leaking into its feature:
    te(row) = (group_sum - own_value) / (group_count - 1). One
    vocabulary-sized aggregate broadcast back onto the rows; integer
    cents keep both engines' sums exact so the final division is the
    identical IEEE op."""
    e = table(spark, sf_dir, "events").withColumn(
        "cents", F.round(F.col("value") * 100).cast("bigint")
    )
    g = e.groupBy("event_type").agg(
        F.sum("cents").alias("s_cents"), F.count(F.lit(1)).alias("n")
    )
    return (
        e.join(F.broadcast(g), "event_type")
        .select(
            "event_id",
            F.round(
                (F.col("s_cents") - F.col("cents"))
                / (F.col("n") - 1).cast("double")
                / F.lit(100.0),
                6,
            ).alias("te"),
        )
    )


@register(
    "q_melt_struct_udtf",
    oracle="""
    SELECT event_id, field, round(value, 6) AS value
    FROM (
      SELECT event_id, 'user_id' AS field, CAST(user_id AS DOUBLE) AS value
      FROM events WHERE event_id % 10 = 0
      UNION ALL
      SELECT event_id, 'value', value FROM events WHERE event_id % 10 = 0
    )
    """,
)
def q_melt_struct_udtf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """POLYMORPHIC Python UDTF: ``melt_struct``'s output schema is
    derived at plan time by its static ``analyze`` method from the
    argument's struct type — no declared schema string; the same
    function melts any struct's numeric fields to (field, value) rows.
    Applied via LATERAL on a 1-in-10 deterministic sample — a Python
    UDTF evaluates per ROW even with Arrow transfer, so the surface
    demo is size-bounded (the JVM unpivot operator, q_unpivot_measures,
    is the hot-path melt). Oracle is the equivalent UNION ALL melt."""
    from oakstore_spark.operators.text import register_melt_struct_udtf
    from oakstore_spark.sources import table as _t

    register_melt_struct_udtf(spark)
    _t(spark, sf_dir, "events").createOrReplaceTempView("events")
    return spark.sql(
        """
        SELECT event_id, field, round(value, 6) AS value
        FROM (SELECT event_id,
                     struct(CAST(user_id AS DOUBLE) AS user_id, value) AS s
              FROM events WHERE event_id % 10 = 0) e,
             LATERAL melt_struct(s)
        """
    )
