"""Text-analysis operators: language ID, quality scoring, token stats,
fingerprinting — all built-in JVM expressions (the 100 TB hot path has
no Python in it).

The heuristics are deliberately simple and *deterministic* — every
expression here has an exactly-mirrorable DuckDB form so the operators
are oracle-checkable end-to-end.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from oakstore_spark.functions.text import fingerprint_md5, token_count

# language marker-word profiles (lowercase, \b-anchored alternations);
# keep in sync with the oracle SQL in queries/llm.py
LANG_PATTERNS: dict[str, str] = {
    "en": r"\b(the|and|of|to|in)\b",
    "fr": r"\b(le|la|les|et|des|une)\b",
    "de": r"\b(der|die|und|das|ist|nicht)\b",
    "es": r"\b(el|los|las|es|una|y)\b",
}
CJK_PATTERN = "[一-鿿]"


def lang_scores(col: Column | str) -> dict[str, Column]:
    lw = F.lower(F.col(col) if isinstance(col, str) else col)
    return {lang: F.regexp_count(lw, F.lit(pat)) for lang, pat in LANG_PATTERNS.items()}


def lang_id(col: Column | str) -> Column:
    """Predicted language: CJK presence wins, else argmax of marker-word
    counts with fixed tie order en > fr > de > es."""
    lw = F.lower(F.col(col) if isinstance(col, str) else col)
    s = lang_scores(col)
    return (
        F.when(F.regexp_count(lw, F.lit(CJK_PATTERN)) > 0, F.lit("zh"))
        .when((s["en"] >= s["fr"]) & (s["en"] >= s["de"]) & (s["en"] >= s["es"]), F.lit("en"))
        .when((s["fr"] >= s["de"]) & (s["fr"] >= s["es"]), F.lit("fr"))
        .when(s["de"] >= s["es"], F.lit("de"))
        .otherwise(F.lit("es"))
    )


def quality_score(col: Column | str) -> Column:
    """Composite [0,1] quality score from token count, punctuation ratio
    and English stopword density. Denominators are guarded (blank text
    scores 0) so ANSI mode cannot raise divide-by-zero."""
    c = F.col(col) if isinstance(col, str) else col
    n_tok = token_count(c)
    n_chars = F.length(c)
    punct = n_chars - F.length(F.regexp_replace(c, r"[^a-zA-Z0-9\s]", ""))
    punct_ratio = punct / F.nullif(n_chars.cast("double"), F.lit(0.0))
    stop_ratio = F.regexp_count(F.lower(c), F.lit(LANG_PATTERNS["en"])) / F.nullif(
        n_tok.cast("double"), F.lit(0.0)
    )
    score = (
        0.3 * F.least(n_tok / F.lit(100.0), F.lit(1.0))
        + 0.4 * (1.0 - punct_ratio)
        + 0.3 * F.least(stop_ratio * 5.0, F.lit(1.0))
    )
    return F.coalesce(score, F.lit(0.0))


def doc_stats(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-document derived stats: tokens, quality, fingerprint, lang."""
    return df.withColumns(
        {
            "n_tokens": token_count(text_col),
            "quality": quality_score(text_col),
            "fingerprint": fingerprint_md5(text_col),
            "pred_lang": lang_id(text_col),
        }
    )


def chunk_documents(
    df: DataFrame,
    id_col: str,
    text_col: str,
    chunk_chars: int,
    overlap_chars: int = 0,
) -> DataFrame:
    """Split documents into fixed-size character chunks with overlap —
    the pre-tokenization unit for LLM training pipelines.

    Chunk k starts at 1 + k*stride (stride = chunk - overlap) while the
    start is <= len - overlap (always >= 1 chunk), so consecutive chunks
    share ``overlap_chars`` characters and every character is covered.
    Pure JVM expressions (sequence + transform + substring + posexplode);
    the input column is bound once via a 1-element transform (same
    O(len^2) re-evaluation hazard as char_ngrams).

    Output: (id, chunk_idx 0-based, chunk_text).
    """
    if overlap_chars >= chunk_chars:
        raise ValueError("overlap_chars must be < chunk_chars")
    stride = chunk_chars - overlap_chars

    def chunks(c: Column) -> Column:
        starts = F.sequence(
            F.lit(1),
            F.greatest(F.length(c) - F.lit(overlap_chars), F.lit(1)),
            F.lit(stride),
        )
        return F.transform(starts, lambda s: F.substring(c, s, chunk_chars))

    arr = F.element_at(F.transform(F.array(F.col(text_col)), chunks), 1)
    return df.select(
        F.col(id_col).alias("id"), F.posexplode(arr).alias("chunk_idx", "chunk_text")
    )


def register_split_sentences_udtf(df_spark) -> None:
    """Register the ``split_sentences`` Python UDTF (one row per
    non-blank '.'-delimited sentence, with its raw split index).

    UDTFs are the table-function surface (SURVEY.md §2: UDF/UDAF/UDTF
    ABSENT in the reference) — used from SQL as
    ``FROM docs, LATERAL split_sentences(text) t``. Arrow-optimized
    (``useArrow=True``) so rows cross the Python boundary in columnar
    batches, not one by one; for the 100 TB hot path still prefer the
    JVM-side chunk_documents/split exprs.
    """
    from pyspark.sql.functions import udtf

    @udtf(returnType="sent_idx int, sentence string", useArrow=True)
    class SplitSentences:
        def eval(self, text: str):  # noqa: ANN001
            import re

            if text is None:
                return
            for i, part in enumerate(re.split(r"\.\s+", text)):
                if part.strip():
                    yield i, part

    df_spark.udtf.register("split_sentences", SplitSentences)


def winnow_fingerprints(
    df,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 5,
    w: int = 4,
):
    """Winnowing document fingerprints (the MOSS/plagiarism-detection
    selection rule): hash every char ``k``-gram of the normalized text,
    slide a window of ``w`` consecutive hashes, keep each window's
    minimum, dedupe per document. Guarantees a shared fingerprint for
    any match of length >= w + k - 1 while keeping ~2/(w+1) of hashes.

    Execution: the normalization stays a JVM expression; the hash +
    window-min inner loop runs as an Arrow-batched numpy kernel
    (mapInPandas) — the hash value is the FIRST 16 HEX CHARS of the
    gram's md5 held as uint64, so the window minimum is one vectorized
    ``sliding_window_view().min(axis=1)`` instead of an interpreted
    expression per window (measured ~4x faster than the
    posexplode+window formulation at sf0.01). Fingerprints are emitted
    as the zero-padded 16-hex-char strings, on which lexicographic
    order == the uint64 order — so any engine with md5 reproduces the
    selection exactly.

    Two scale levers: (a) gram hashes are memoized per task — natural
    text repeats most k-grams, so the md5 call count drops from
    O(total chars) to O(distinct grams) (~6x fewer at sf0.1); (b) a
    small input relation (fewer splits than cores, e.g. one parquet
    file) is round-robin rebalanced to defaultParallelism first so the
    kernel uses every core — at real scale the scan already has
    thousands of splits and the rebalance is skipped, keeping the op
    map-side with no shuffle.
    Returns (id_col, fps array<string> sorted)."""
    import hashlib

    from pyspark.sql import types as T

    from oakstore_spark.functions.text import normalize_text

    out_schema = T.StructType(
        [
            T.StructField("wid", df.schema[id_col].dataType),
            T.StructField("fps", T.ArrayType(T.StringType())),
        ]
    )

    def kernel(batches):
        import numpy as np
        import pandas as pd

        md5 = hashlib.md5
        memo: dict = {}
        for pdf in batches:
            if len(memo) > 2_000_000:  # bound task memory (~200 MB worst case)
                memo.clear()
            ids, fp_lists = [], []
            for did, nt in zip(pdf["_id"], pdf["_nt"]):
                b = nt.encode("utf-8")
                n = max(len(b) - (k - 1), 1)
                hs = np.empty(n, dtype=np.uint64)
                for i in range(n):
                    g = b[i : i + k]
                    h = memo.get(g)
                    if h is None:
                        h = int.from_bytes(md5(g).digest()[:8], "big")
                        memo[g] = h
                    hs[i] = h
                if n >= w:
                    mins = np.lib.stride_tricks.sliding_window_view(hs, w).min(
                        axis=1
                    )
                else:
                    mins = hs.min(keepdims=True)
                fps = np.unique(mins)
                ids.append(did)
                fp_lists.append([f"{v:016x}" for v in fps])
            yield pd.DataFrame({"wid": ids, "fps": fp_lists})

    nt = df.select(
        F.col(id_col).alias("_id"), normalize_text(text_col).alias("_nt")
    )
    par = df.sparkSession.sparkContext.defaultParallelism
    if nt.rdd.getNumPartitions() < par:
        nt = nt.repartition(par)
    return nt.mapInPandas(kernel, out_schema).withColumnRenamed("wid", id_col)


def train_bpe(
    df,
    text_col: str = "text",
    n_merges: int = 20,
    min_pair_freq: int = 2,
    driver_vocab_max: int = 200_000,
):
    """Byte-pair-encoding MERGE TRAINING, distributed (Sennrich et al.
    2016 -- the algorithm behind GPT/Llama-style tokenizers; the
    BPE-ish regex counter in functions/text.py only APPLIES a
    tokenization, this LEARNS the merge table from the corpus).

    The 100 TB shape: the corpus is touched ONCE -- a single
    explode+groupBy collapses it to the (word, freq) VOCABULARY
    relation, and all ``n_merges`` iterations run over that vocabulary
    (orders of magnitude smaller, persisted, replaced each round):

      per round: adjacent symbol pairs exploded with word frequency as
      weight -> one small agg -> argmax pair (count desc, then
      lexicographic -- deterministic under ties) -> merge applied to
      each word's symbol array by an Arrow-batched kernel.

    Each round is one shuffle of (pair, weight) rows + one map pass
    over the vocabulary; the corpus itself never re-shuffles. Pairs are
    keyed "left|right" -- symbols are [a-z0-9]+ or "</w>", so the pipe
    is unambiguous. Stops early when no pair reaches
    ``min_pair_freq``. Words start as character symbols + a "</w>"
    end-of-word sentinel, so merges never cross word boundaries.

    Driver fast path: after the corpus collapses to (word, freq), a
    vocabulary under ``driver_vocab_max`` rows is collected and the
    merge loop runs in-process (each distributed round otherwise pays
    ~2 s of agg + Python-worker latency for what is dict arithmetic on
    a few thousand rows — measured 19 s vs 2 s for 10 merges at sf0.1).
    The distributed loop remains the >gate path and is CI-forced with
    exact parity (tests/test_curation.py). The gate bounds driver
    memory: 200k words x ~100 B is ~20 MB; real web-scale vocabularies
    exceed it and take the distributed loop.

    Returns (merges, vocab): ``merges`` a DataFrame
    (rank, left, right, pair_freq) in merge order; ``vocab`` the final
    (word, freq, symbols array<string>) relation (persisted on the
    distributed path; caller unpersists)."""
    from pyspark.sql import types as T
    from pyspark.storagelevel import StorageLevel

    from oakstore_spark.functions.text import normalize_text

    spark = df.sparkSession
    word_freq = (
        df.select(
            F.explode(F.split(normalize_text(text_col), " ")).alias("word")
        )
        .where(F.length("word") > 0)
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("freq"))
    )

    merge_out_schema = T.StructType(
        [
            T.StructField("rank", T.IntegerType()),
            T.StructField("left", T.StringType()),
            T.StructField("right", T.StringType()),
            T.StructField("pair_freq", T.LongType()),
        ]
    )
    vocab_out_schema = T.StructType(
        [
            T.StructField("word", T.StringType()),
            T.StructField("freq", T.LongType()),
            T.StructField("symbols", T.ArrayType(T.StringType())),
        ]
    )

    if word_freq.count() <= driver_vocab_max:
        rows = word_freq.collect()
        freqs = {r["word"]: int(r["freq"]) for r in rows}
        symbolized = {w: [*w, "</w>"] for w in freqs}
        local_merges: list[tuple[int, str, str, int]] = []
        for rank in range(n_merges):
            counts: dict[tuple[str, str], int] = {}
            for w, syms in symbolized.items():
                fw = freqs[w]
                for a, b in zip(syms, syms[1:]):
                    counts[(a, b)] = counts.get((a, b), 0) + fw
            if not counts:
                break
            (left, right), cnt = min(
                counts.items(), key=lambda kv: (-kv[1], kv[0][0] + "|" + kv[0][1])
            )
            if cnt < min_pair_freq:
                break
            local_merges.append((rank, left, right, cnt))
            for w, syms in symbolized.items():
                merged, i = [], 0
                while i < len(syms):
                    if i + 1 < len(syms) and syms[i] == left and syms[i + 1] == right:
                        merged.append(left + right)
                        i += 2
                    else:
                        merged.append(syms[i])
                        i += 1
                symbolized[w] = merged
        merges_df = spark.createDataFrame(local_merges, merge_out_schema)
        vocab_df = spark.createDataFrame(
            [(w, freqs[w], symbolized[w]) for w in sorted(freqs)],
            vocab_out_schema,
        )
        return merges_df, vocab_df

    vocab = word_freq.select(
        "word",
        "freq",
        F.concat(
            F.filter(F.split(F.col("word"), ""), lambda c: F.length(c) > 0),
            F.array(F.lit("</w>")),
        ).alias("symbols"),
    ).persist(StorageLevel.MEMORY_AND_DISK)
    vocab.count()

    merge_schema = vocab_out_schema

    merges: list[tuple[int, str, str, int]] = []
    for rank in range(n_merges):
        adjacent = F.element_at(
            F.transform(
                F.array(F.col("symbols")),
                lambda ss: F.transform(
                    F.sequence(F.lit(1), F.size(ss) - 1),
                    lambda i: F.concat_ws(
                        "|", F.element_at(ss, i), F.element_at(ss, i + 1)
                    ),
                ),
            ),
            1,
        )
        pairs = vocab.where(F.size("symbols") >= 2).select(
            "freq", F.explode(adjacent).alias("pair")
        )
        top = (
            pairs.groupBy("pair")
            .agg(F.sum("freq").alias("cnt"))
            .orderBy(F.desc("cnt"), F.asc("pair"))
            .limit(1)
            .collect()
        )
        if not top or top[0]["cnt"] < min_pair_freq:
            break
        left, right = top[0]["pair"].split("|", 1)
        merges.append((rank, left, right, int(top[0]["cnt"])))

        def apply_merge(batches, _l=left, _r=right):
            for pdf in batches:
                out_syms = []
                for syms in pdf["symbols"]:
                    syms = list(syms)
                    merged = []
                    i = 0
                    n = len(syms)
                    while i < n:
                        if i + 1 < n and syms[i] == _l and syms[i + 1] == _r:
                            merged.append(_l + _r)
                            i += 2
                        else:
                            merged.append(syms[i])
                            i += 1
                    out_syms.append(merged)
                pdf = pdf.copy()
                pdf["symbols"] = out_syms
                yield pdf

        new_vocab = vocab.mapInPandas(apply_merge, merge_schema).persist(
            StorageLevel.MEMORY_AND_DISK
        )
        new_vocab.count()
        vocab.unpersist()
        vocab = new_vocab

    merges_df = spark.createDataFrame(merges, merge_out_schema)
    return merges_df, vocab


def apply_bpe(
    df,
    merges,
    text_col: str = "text",
    out_col: str = "bpe_tokens",
):
    """Apply a learned BPE merge table (from :func:`train_bpe`) to a
    corpus: each word re-symbolizes from characters + '</w>' and the
    merges replay IN RANK ORDER — exactly the encoder every BPE
    tokenizer ships. The merge table is tiny (one row per merge), so it
    collects once and broadcasts inside the Arrow kernel closure; the
    corpus maps in place, no shuffle. Per-task memoization caches each
    distinct word's final symbolization (natural text repeats words, so
    the replay cost is O(distinct words), not O(tokens)).

    Returns df + ``out_col`` (array<string> of BPE symbols, '</w>'
    terminated per word)."""
    from pyspark.sql import types as T

    from oakstore_spark.functions.text import normalize_text

    ranked = [
        (r["left"], r["right"])
        for r in merges.orderBy("rank").select("left", "right").collect()
    ]

    in_cols = [f.name for f in df.schema.fields]

    def kernel(batches):
        import pandas as pd

        memo: dict[str, list[str]] = {}

        def encode_word(w: str) -> list[str]:
            got = memo.get(w)
            if got is not None:
                return got
            syms = [*w, "</w>"]
            for left, right in ranked:
                if len(syms) < 2:
                    break
                merged, i = [], 0
                n = len(syms)
                while i < n:
                    if i + 1 < n and syms[i] == left and syms[i + 1] == right:
                        merged.append(left + right)
                        i += 2
                    else:
                        merged.append(syms[i])
                        i += 1
                syms = merged
            memo[w] = syms
            return syms

        for pdf in batches:
            toks = []
            for nt in pdf["_nt"]:
                out: list[str] = []
                if nt:
                    for w in nt.split(" "):
                        out.extend(encode_word(w))
                toks.append(out)
            res = pdf[in_cols].copy()
            res[out_col] = toks
            yield res

    with_nt = df.withColumn("_nt", normalize_text(text_col))
    return (
        with_nt.mapInPandas(
            kernel,
            T.StructType(
                [*df.schema.fields, T.StructField(out_col, T.ArrayType(T.StringType()))]
            ),
        )
    )


def compression_ratio(df: DataFrame, text_col: str = "text") -> "Column":
    """DEFLATE compression ratio per document (compressed bytes /
    raw bytes) — the classic entropy proxy for repetition filtering:
    boilerplate and template spam compress far below ~0.4 while natural
    prose sits around 0.5-0.8. Used by quality pipelines as a
    language-agnostic repetition signal (cheaper than n-gram stats,
    catches long-range repeats n-grams miss).

    Runs as an Arrow-batched pandas UDF (zlib is C-speed per string;
    the batch transfer is the only Python cost) — map-side, no shuffle,
    embarrassingly parallel at any corpus size. Not SQL-expressible, so
    the registry entry is rows-only; hand values are pinned in pytest.
    """
    import zlib

    @F.pandas_udf("double")
    def ratio(texts: pd.Series) -> pd.Series:
        def one(t):
            if t is None:
                return None
            raw = t.encode("utf-8")
            if not raw:
                return 1.0
            return len(zlib.compress(raw, 6)) / len(raw)

        return texts.map(one)

    return ratio(F.col(text_col))


def register_melt_struct_udtf(spark) -> None:
    """Register ``melt_struct`` — a POLYMORPHIC Python UDTF: its output
    schema is computed per call site by a static ``analyze`` method
    from the argument's actual struct type (one output row per numeric
    field, emitting the field name and its double value). This is the
    Spark 4 polymorphic-UDTF surface: the same function melts ANY
    struct without a declared schema, the compile-time contract coming
    from ``analyze`` instead of a string literal. Arrow-optimized."""
    from pyspark.sql.functions import AnalyzeArgument, AnalyzeResult, udtf
    from pyspark.sql.types import (
        DoubleType,
        StringType,
        StructField,
        StructType,
    )

    @udtf(useArrow=True)
    class MeltStruct:
        @staticmethod
        def analyze(arg: AnalyzeArgument) -> AnalyzeResult:
            if not isinstance(arg.dataType, StructType):
                raise ValueError("melt_struct expects a struct argument")
            return AnalyzeResult(
                StructType(
                    [
                        StructField("field", StringType()),
                        StructField("value", DoubleType()),
                    ]
                )
            )

        def eval(self, row):  # noqa: ANN001
            if row is None:
                return
            for name in row.__fields__:
                v = row[name]
                if isinstance(v, (int, float)) and not isinstance(v, bool):
                    yield name, float(v)

    spark.udtf.register("melt_struct", MeltStruct)


def readability(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Flesch reading-ease and Flesch-Kincaid grade per document — the
    classic quality signals a curation pipeline buckets corpora by
    (formulas are public: Flesch 1948 / Kincaid 1975).

    Deterministic, SQL-mirrorable contract (regexp-only, so any engine
    replays it exactly):
    - words = maximal ``[a-z]+`` runs of the lowercased text
      (contractions count their letter runs);
    - syllables(word) = max(1, number of ``[aeiouy]+`` vowel-group
      runs) — the standard heuristic WITHOUT the silent-e adjustment,
      traded for cross-engine exactness;
    - sentences = max(1, number of ``[.!?]+`` runs);
    - flesch = 206.835 - (1.015*words)/sentences - (84.6*syll)/words,
      fk_grade = (0.39*words)/sentences + (11.8*syll)/words - 15.59,
      both evaluated as ONE int64-rational division (coefficients are
      decimal fractions) so the doubles are bit-identical across
      engines with no rounding step at all.

    Pure map-side projection: regexp + array HOFs, whole-stage codegen,
    no shuffle, no Python. Zero-word docs yield null scores."""
    c = F.lower(F.col(text_col))
    words = F.regexp_extract_all(c, F.lit("[a-z]+"), F.lit(0))
    n_words = F.size(words)
    n_syll = F.aggregate(
        F.transform(
            words,
            lambda w: F.greatest(
                F.lit(1),
                F.size(F.regexp_extract_all(w, F.lit("[aeiouy]+"), F.lit(0))),
            ),
        ),
        F.lit(0),
        lambda acc, x: acc + x,
    )
    n_sent = F.greatest(
        F.lit(1),
        F.size(F.regexp_extract_all(c, F.lit(r"[.!?]+"), F.lit(0))),
    )
    # Exact-rational evaluation: the published coefficients are decimal
    # fractions (206.835 = 41367/200, 1.015 = 203/200, 84.6 = 423/5,
    # 0.39 = 39/100, 11.8 = 59/5, 15.59 = 1559/100), so each score is a
    # ratio of two SMALL integers — compute numerator/denominator in
    # int64 (exact in any engine) and emit ONE IEEE division, which is
    # correctly rounded and therefore bit-identical cross-engine. No
    # round(), no half-way cases, no signed zero.
    w = n_words.cast("long")
    sy = n_syll.cast("long")
    s = n_sent.cast("long")
    flesch_num = (
        F.lit(41367) * s * w - F.lit(203) * w * w - F.lit(16920) * sy * s
    )
    flesch_den = F.lit(200) * s * w
    fk_num = (
        F.lit(39) * w * w + F.lit(1180) * sy * s - F.lit(1559) * s * w
    )
    fk_den = F.lit(100) * s * w
    valid = n_words > 0
    return df.select(
        F.col(id_col),
        F.when(valid, n_words).alias("n_words"),
        F.when(valid, n_syll).alias("n_syllables"),
        n_sent.alias("n_sentences"),
        F.when(valid, flesch_num.cast("double") / flesch_den)
        .alias("flesch"),
        F.when(valid, fk_num.cast("double") / fk_den).alias("fk_grade"),
    )


def bm25_scores(
    df: DataFrame,
    terms: list[str],
    text_col: str = "text",
    id_col: str = "doc_id",
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """Okapi BM25 relevance of every document against a bounded query
    term list (Robertson & Walker 1994 — public), the lexical-retrieval
    rung next to the vector leg (``cosine_topk``) and their RRF fusion.

    score(D) = sum_t idf(t) * tf(t,D)*(k1+1) /
                        (tf(t,D) + k1*(1 - b + b*|D|/avgdl))
    with the Lucene-style always-positive idf
    ln(1 + (N - df + 0.5)/(df + 0.5)).

    Spark shape (the 100 TB shape): one map-side pass tokenizes each
    doc and evaluates per-term tf with array HOFs (no explode of the
    corpus, no posting-list shuffle — the query terms are a bounded
    in-expression list); corpus stats (N, total length, per-term df)
    reduce to ONE tiny aggregate row that broadcasts back. Per-doc
    work is O(|D| * |terms|) in the JVM; nothing Python.

    Cross-engine exactness: tf/dl/df/N stay integers through
    aggregation; avgdl is the single division sum/N; the score tree is
    mirrored literally by the SQL oracle (same association, one ln) and
    summed over terms in FIXED written order via per-term conditional
    values — no float-reorder risk. Rank on the raw double, round only
    for display.

    Returns (id, dl, tf_<i> per term, score_raw) for every doc matching
    at least one term."""
    if not terms:
        raise ValueError("terms must be non-empty")
    toks = F.split(F.lower(F.col(text_col)), " ")
    dl = F.size(toks)

    # NB: a two-arg lambda would make F.filter pass (element, INDEX) —
    # a default-arg capture (lambda x, t=t: ...) silently binds t to
    # the array index. Build the single-arg predicate in a factory.
    def _eq(term: str):
        return lambda x: x == F.lit(term)

    proj = [F.col(id_col), dl.alias("dl")]
    for i, t in enumerate(terms):
        tf = F.size(F.filter(toks, _eq(t)))
        proj.append(tf.alias(f"tf_{i}"))
    scored = df.select(*proj)
    aggs = [
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("dl").alias("sum_dl"),
    ]
    for i in range(len(terms)):
        aggs.append(
            F.sum((F.col(f"tf_{i}") > 0).cast("long")).alias(f"df_{i}")
        )
    stats = scored.agg(*aggs)
    out = scored.crossJoin(F.broadcast(stats))
    n = F.col("n_docs")
    avgdl = F.col("sum_dl").cast("double") / n
    score = F.lit(0.0)
    any_hit = F.lit(False)
    for i in range(len(terms)):
        tf, dfc = F.col(f"tf_{i}"), F.col(f"df_{i}")
        idf = F.log(
            F.lit(1.0)
            + ((n - dfc).cast("double") + 0.5) / (dfc.cast("double") + 0.5)
        )
        part = idf * (
            (tf.cast("double") * (k1 + 1.0))
            / (
                tf.cast("double")
                + k1 * (1.0 - b + b * (F.col("dl").cast("double") / avgdl))
            )
        )
        score = score + F.when(tf > 0, part).otherwise(F.lit(0.0))
        any_hit = any_hit | (tf > 0)
    keep = [F.col(id_col), F.col("dl")]
    keep += [F.col(f"tf_{i}") for i in range(len(terms))]
    keep.append(score.alias("score_raw"))
    return out.where(any_hit).select(*keep)


def _c(n: int) -> str:
    return chr(n)


# UTF-8 byte-structure over Latin-1-range CHARS (each char <= U+00FF is
# one byte, so the string IS the byte sequence): the classic UTF-8
# validation automaton as one anchored regex, built from code points
# because the continuation/lead ranges are control characters.
_UTF8_STRUCT = (
    "^(?:"
    + "[\\x00-\\x7F]"
    + f"|[{_c(0xC2)}-{_c(0xDF)}][{_c(0x80)}-{_c(0xBF)}]"
    + f"|{_c(0xE0)}[{_c(0xA0)}-{_c(0xBF)}][{_c(0x80)}-{_c(0xBF)}]"
    + f"|[{_c(0xE1)}-{_c(0xEC)}][{_c(0x80)}-{_c(0xBF)}]{{2}}"
    + f"|{_c(0xED)}[{_c(0x80)}-{_c(0x9F)}][{_c(0x80)}-{_c(0xBF)}]"
    + f"|[{_c(0xEE)}-{_c(0xEF)}][{_c(0x80)}-{_c(0xBF)}]{{2}}"
    + f"|{_c(0xF0)}[{_c(0x90)}-{_c(0xBF)}][{_c(0x80)}-{_c(0xBF)}]{{2}}"
    + f"|[{_c(0xF1)}-{_c(0xF3)}][{_c(0x80)}-{_c(0xBF)}]{{3}}"
    + f"|{_c(0xF4)}[{_c(0x80)}-{_c(0x8F)}][{_c(0x80)}-{_c(0xBF)}]{{3}}"
    + ")*$"
)


def fix_mojibake(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Detect and repair DOUBLE-ENCODED UTF-8 (mojibake: UTF-8 bytes
    mis-decoded as Latin-1 somewhere upstream — 'caf\u00e9' arriving as
    'caf\u00c3\u00a9'), the most common encoding defect in web-crawl
    text. A row is mojibake iff

    1. every char is in the Latin-1 range (chars map 1:1 back to the
       original bytes), AND
    2. those bytes form STRUCTURALLY VALID UTF-8 with at least one
       multi-byte sequence (checked by regex — crucial, because
       Spark's ``decode`` raises on invalid input rather than
       replacing, so validity must be proven BEFORE decoding; the
       ``when`` guard short-circuits per row), in which case
    3. the repair is ``decode(encode(text, ISO-8859-1), UTF-8)``.

    Genuinely-Latin-1 text ('na\u00efve': 0xEF not followed by two
    continuation bytes) fails the structure check and passes through
    untouched — the classic false-positive case handles itself,
    because a lone accented char is never valid multi-byte UTF-8.
    Pure ASCII repairs to itself and is not flagged. Entirely JVM
    expressions; zero shuffles.

    Returns (id_col, fixed, was_mojibake)."""
    t = F.col(text_col)
    latin1_only = ~t.rlike(f"[{_c(0x100)}-{_c(0xFFFF)}]")
    valid_utf8 = t.rlike(_UTF8_STRUCT)
    has_multibyte = t.rlike(f"[{_c(0x80)}-{_c(0xFF)}]")
    is_moji = latin1_only & valid_utf8 & has_multibyte
    repaired = F.when(
        is_moji, F.decode(F.encode(t, "ISO-8859-1"), "UTF-8")
    ).otherwise(t)
    return df.select(
        F.col(id_col),
        repaired.alias("fixed"),
        is_moji.alias("was_mojibake"),
    )


def tag_keywords(
    df: DataFrame,
    keywords: DataFrame,
    text_col: str = "text",
    keyword_col: str = "keyword",
    tag_col: str = "tag",
    out_col: str = "tags",
) -> DataFrame:
    """Taxonomy/keyword tagging: append ``out_col`` — the sorted
    distinct tags whose keyword occurs as a WHOLE WORD in the
    document. The keyword relation ((keyword, tag) rows — a tag can
    own many keywords) is collected and compiled into one
    alternation-regex PER TAG, applied map-side: at 100 TB this is a
    broadcast-style pattern scan with zero shuffles and zero Python
    in the row path, the standard shape for blocklist/topic/taxonomy
    tagging where the taxonomy is configuration-sized.

    Matching is case-insensitive on word boundaries; keywords are
    regex-escaped (literal phrases, not patterns)."""
    import re as _re

    rows = keywords.select(keyword_col, tag_col).collect()
    by_tag: dict[str, list[str]] = {}
    for r in rows:
        by_tag.setdefault(r[tag_col], []).append(r[keyword_col])

    def _bounded(k: str) -> str:
        # \b only works against a WORD-char keyword edge ('\bc\+\+\b'
        # can never match "c++ "): anchor each edge only when the
        # keyword's own edge is a word char — RE2-safe, no lookaround
        lead = "\\b" if _re.match(r"\w", k[:1]) else ""
        trail = "\\b" if _re.match(r"\w", k[-1:]) else ""
        return lead + _re.escape(k) + trail

    tag_exprs = []
    for tag in sorted(by_tag):
        pat = (
            "(?i)(?:"
            + "|".join(sorted(_bounded(k) for k in by_tag[tag]))
            + ")"
        )
        tag_exprs.append(
            F.when(F.col(text_col).rlike(pat), F.lit(tag))
        )
    tags = F.array_sort(
        F.filter(F.array(*tag_exprs), lambda t: t.isNotNull())
    )
    return df.withColumn(out_col, tags)


# --------------------------------------------------------------- unigram LM


def _unigram_substrings(word: str, max_len: int):
    """All substrings of ``word`` up to ``max_len`` chars, one per
    occurrence position (the SentencePiece seed counts positions)."""
    n = len(word)
    for i in range(n):
        for ln in range(1, min(max_len, n - i) + 1):
            yield word[i : i + ln]


def _unigram_viterbi(
    word: str, logp: dict, max_len: int
) -> list[str] | None:
    """Best unigram segmentation of ``word`` under piece log-probs:
    maximize the path log-prob; on an exact score tie prefer the
    LONGER final piece (smaller split point) — a total, deterministic
    rule, so every engine/partitioning replays the same path. Returns
    None when no full cover exists (a character absent from the piece
    table)."""
    n = len(word)
    NEG = float("-inf")
    best = [NEG] * (n + 1)
    back = [0] * (n + 1)
    best[0] = 0.0
    for i in range(1, n + 1):
        # ascending j with strict > keeps the SMALLEST split point on
        # ties, i.e. the longest final piece wins
        for j in range(max(0, i - max_len), i):
            lp = logp.get(word[j:i])
            if lp is None or best[j] == NEG:
                continue
            cand = best[j] + lp
            if cand > best[i]:
                best[i] = cand
                back[i] = j
    if best[n] == NEG:
        return None
    out: list[str] = []
    i = n
    while i > 0:
        j = back[i]
        out.append(word[j:i])
        i = j
    out.reverse()
    return out


def _unigram_logprobs(counts: dict) -> dict:
    """count table -> natural-log probabilities (identical float tree
    everywhere: log(count) - log(total) on exact integer sums)."""
    import math

    total = sum(counts.values())
    lt = math.log(total)
    return {p: math.log(c) - lt for p, c in counts.items()}


def _unigram_em_counts(
    word_freqs, logp: dict, max_len: int
) -> dict:
    """Hard-EM E-step over (word, freq) pairs: Viterbi-segment each
    word, weight piece counts by corpus frequency. Pure-Python helper
    shared VERBATIM by the driver fast path and the distributed Arrow
    kernel — parity by construction."""
    counts: dict = {}
    for w, fw in word_freqs:
        seg = _unigram_viterbi(w, logp, max_len)
        if seg is None:
            continue
        for p in seg:
            counts[p] = counts.get(p, 0) + fw
    return counts


def train_unigram_lm(
    df: DataFrame,
    text_col: str = "text",
    vocab_size: int = 4096,
    seed_size: int | None = None,
    max_piece_len: int = 8,
    n_iters: int = 4,
    driver_vocab_max: int = 200_000,
):
    """Unigram-LM tokenizer training (Kudo 2018, the SentencePiece
    unigram model — public paper), the OTHER tokenizer family next to
    BPE (operators/text.py:train_bpe): instead of greedy merges, keep
    a vocabulary of candidate pieces and fit piece probabilities by EM
    over the corpus segmentations. This implementation is the
    deterministic HARD-EM (Viterbi) variant: the E-step counts pieces
    along each word's single best segmentation (ties prefer the longer
    final piece), the M-step re-normalizes counts — exactly replayable
    single-node, which is what the parity test pins.

    Steps:
      1. ONE corpus pass collapses to the (word, freq) vocabulary
         relation — identical shape to train_bpe.
      2. SEED: every substring occurrence up to ``max_piece_len``,
         weighted by word frequency; keep all single characters
         (coverage) plus the top multi-char candidates by
         (weight desc, piece asc) until ``seed_size`` (default
         ``4 * vocab_size``).
      3. EM x ``n_iters``: broadcast current log-probs, Viterbi-count
         (Arrow kernel over the word relation, one small piece-count
         agg back), re-normalize. Zero-count multi-char pieces drop;
         zero-count single chars keep a floor count of 1 (coverage).
      4. PRUNE to ``vocab_size``: all single chars + top multi-char
         pieces by (count desc, piece asc).

    100 TB shape: the corpus is touched once; every EM round moves one
    broadcast of <= seed_size log-probs out and one (piece, count)
    aggregate back — no corpus re-shuffle, no windows. Under
    ``driver_vocab_max`` distinct words the whole loop runs in-process
    on the collected vocabulary (same helpers, bit-identical — the
    gate bounds driver memory exactly like train_bpe's); the
    distributed path is CI-forced with exact parity.

    Returns a DataFrame (piece string, count long, logprob double)
    sorted (count desc, piece asc)."""
    from pyspark.sql import types as T
    from pyspark.storagelevel import StorageLevel

    from oakstore_spark.functions.text import normalize_text

    if seed_size is None:
        seed_size = 4 * vocab_size
    spark = df.sparkSession
    word_freq = (
        df.select(
            F.explode(F.split(normalize_text(text_col), " ")).alias("word")
        )
        .where(F.length("word") > 0)
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("freq"))
    )

    out_schema = T.StructType(
        [
            T.StructField("piece", T.StringType()),
            T.StructField("count", T.LongType()),
            T.StructField("logprob", T.DoubleType()),
        ]
    )

    def _seed_select(weights: dict) -> dict:
        chars = {p: c for p, c in weights.items() if len(p) == 1}
        multi = sorted(
            ((p, c) for p, c in weights.items() if len(p) > 1),
            key=lambda kv: (-kv[1], kv[0]),
        )[: max(0, seed_size - len(chars))]
        out = dict(chars)
        out.update(multi)
        return out

    def _mstep(counts: dict, seen_chars: set) -> dict:
        kept = {p: c for p, c in counts.items() if c > 0}
        for ch in seen_chars:
            kept.setdefault(ch, 1)  # coverage floor
        return kept

    def _prune(counts: dict) -> dict:
        chars = {p: c for p, c in counts.items() if len(p) == 1}
        multi = sorted(
            ((p, c) for p, c in counts.items() if len(p) > 1),
            key=lambda kv: (-kv[1], kv[0]),
        )[: max(0, vocab_size - len(chars))]
        out = dict(chars)
        out.update(multi)
        return out

    n_words = word_freq.count()
    if n_words == 0:
        return spark.createDataFrame([], out_schema)

    if n_words <= driver_vocab_max:
        pairs = [
            (r["word"], int(r["freq"])) for r in word_freq.collect()
        ]
        weights: dict = {}
        for w, fw in pairs:
            for s in _unigram_substrings(w, max_piece_len):
                weights[s] = weights.get(s, 0) + fw
        seen_chars = {p for p in weights if len(p) == 1}
        counts = _seed_select(weights)
        for _ in range(n_iters):
            logp = _unigram_logprobs(counts)
            counts = _mstep(
                _unigram_em_counts(pairs, logp, max_piece_len), seen_chars
            )
        counts = _prune(counts)
        logp = _unigram_logprobs(counts)
        rows = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))
        return spark.createDataFrame(
            [(p, c, logp[p]) for p, c in rows], out_schema
        )

    words = word_freq.persist(StorageLevel.MEMORY_AND_DISK)
    words.count()
    pair_schema = T.StructType(
        [
            T.StructField("piece", T.StringType()),
            T.StructField("w", T.LongType()),
        ]
    )

    def _seed_kernel(batches):
        for pdf in batches:
            local: dict = {}
            for w, fw in zip(pdf["word"], pdf["freq"]):
                for s in _unigram_substrings(w, max_piece_len):
                    local[s] = local.get(s, 0) + int(fw)
            yield pd.DataFrame(
                {"piece": list(local), "w": list(local.values())},
                columns=["piece", "w"],
            )

    agg_weights = (
        words.mapInPandas(_seed_kernel, pair_schema)
        .groupBy("piece")
        .agg(F.sum("w").alias("w"))
    )
    # the piece table is bounded by seed selection to <= seed_size rows,
    # but the RAW substring-weight relation can be large: select the
    # seed IN-ENGINE (chars unconditionally; multi-char via top-k on
    # (w desc, piece asc)) and collect only the winners
    chars_df = agg_weights.where(F.length("piece") == 1)
    n_chars = chars_df.count()
    multi_df = (
        agg_weights.where(F.length("piece") > 1)
        .orderBy(F.desc("w"), F.asc("piece"))
        .limit(max(0, seed_size - n_chars))
    )
    counts = {
        r["piece"]: int(r["w"])
        for r in chars_df.unionByName(multi_df).collect()
    }
    seen_chars = {r["piece"] for r in chars_df.collect()}

    for _ in range(n_iters):
        logp = _unigram_logprobs(counts)
        bc = spark.sparkContext.broadcast((logp, max_piece_len))

        def _em_kernel(batches, _bc=bc):
            lp, ml = _bc.value
            for pdf in batches:
                local = _unigram_em_counts(
                    zip(pdf["word"], (int(f) for f in pdf["freq"])), lp, ml
                )
                yield pd.DataFrame(
                    {"piece": list(local), "w": list(local.values())},
                    columns=["piece", "w"],
                )

        rows = (
            words.mapInPandas(_em_kernel, pair_schema)
            .groupBy("piece")
            .agg(F.sum("w").alias("w"))
            .collect()
        )
        counts = _mstep(
            {r["piece"]: int(r["w"]) for r in rows}, seen_chars
        )
    words.unpersist()
    counts = _prune(counts)
    logp = _unigram_logprobs(counts)
    rows = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))
    return spark.createDataFrame(
        [(p, c, logp[p]) for p, c in rows], out_schema
    )


def apply_unigram(
    df: DataFrame,
    pieces: DataFrame,
    text_col: str = "text",
    out_col: str = "unigram_tokens",
) -> DataFrame:
    """Encode a corpus with a trained unigram-LM piece table
    (:func:`train_unigram_lm`): per word of the normalized text, the
    same Viterbi segmentation the trainer used (ties to the longer
    final piece). The piece table is tiny — it collects once into the
    Arrow kernel closure; the corpus maps in place with per-task
    word memoization, no shuffle. A word containing a character absent
    from the table (no full cover exists) degrades to the raw word as
    a single unknown token — the <unk> convention, never a dropped or
    null entry."""
    from pyspark.sql import types as T

    from oakstore_spark.functions.text import normalize_text

    logp = {
        r["piece"]: float(r["logprob"])
        for r in pieces.select("piece", "logprob").collect()
    }
    max_len = max((len(p) for p in logp), default=1)
    in_cols = [f.name for f in df.schema.fields]

    def kernel(batches):
        memo: dict[str, list[str]] = {}

        def enc(w: str) -> list[str]:
            got = memo.get(w)
            if got is None:
                seg = _unigram_viterbi(w, logp, max_len)
                got = seg if seg is not None else [w]
                memo[w] = got
            return got

        for pdf in batches:
            toks = []
            for nt in pdf["_nt"]:
                out: list[str] = []
                if nt:
                    for w in nt.split(" "):
                        out.extend(enc(w))
                toks.append(out)
            res = pdf[in_cols].copy()
            res[out_col] = toks
            yield res

    with_nt = df.withColumn("_nt", normalize_text(text_col))
    return with_nt.mapInPandas(
        kernel,
        T.StructType(
            [
                *df.schema.fields,
                T.StructField(out_col, T.ArrayType(T.StringType())),
            ]
        ),
    )


# --------------------------------------------------------- persisted BM25


def _swap_dir(spark, cur_path: str, nxt_path: str) -> None:
    """Crash-safe directory swap through the Hadoop FS API: park the
    live directory aside FIRST so a crash at any point leaves a
    recoverable state (either ``cur`` still live, or ``<cur>_old`` as
    the pre-swap state + ``nxt`` as the new one); the backup is
    deleted only after the new directory is in place."""
    jvm = spark._jvm
    conf = spark._jsc.hadoopConfiguration()
    cur = jvm.org.apache.hadoop.fs.Path(cur_path)
    nxt = jvm.org.apache.hadoop.fs.Path(nxt_path)
    old = jvm.org.apache.hadoop.fs.Path(f"{cur_path}_old")
    fs = cur.getFileSystem(conf)
    fs.delete(old, True)  # stale backup from a previous crashed swap
    fs.rename(cur, old)
    fs.rename(nxt, cur)
    fs.delete(old, True)


def build_bm25_index(
    df: DataFrame,
    index_dir: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = 64,
) -> None:
    """Persist the build-once/search-many form of :func:`bm25_scores`
    — the Lucene shape at Spark scale. One corpus pass tokenizes
    (same contract: lowercase, split on single spaces) and writes:

      - ``postings``  — (id, dl, term, tf) PARTITIONED BY ``_bucket``
        (= crc32(term) %% n_buckets), doc length DENORMALIZED into the
        row so a search never joins a doclens table;
      - ``termdf``    — (term, df) per bucket (tiny);
      - ``stats``     — ONE row (n_docs, sum_dl).

    A search reads only its query terms' bucket partitions (listing-
    time pruning — the inverted-index analog of the IVF cell layout),
    so per-query cost tracks the matched postings, never the corpus.
    Postings cluster to one file per bucket before the partitioned
    write (same committer-pressure fix as the IVFPQ codes table)."""
    toks = F.split(F.lower(F.col(text_col)), " ")
    base = df.select(
        F.col(id_col), F.size(toks).alias("dl"), toks.alias("_tk")
    )
    from pyspark.storagelevel import StorageLevel

    postings = (
        base.select(id_col, "dl", F.explode("_tk").alias("term"))
        .groupBy(id_col, "dl", "term")
        .agg(F.count(F.lit(1)).cast("long").alias("tf"))
        .withColumn(
            "_bucket", (F.crc32(F.col("term")) % n_buckets).cast("int")
        )
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    (
        postings.repartition(n_buckets, F.col("_bucket"))
        .write.mode("overwrite")
        .partitionBy("_bucket")
        .parquet(f"{index_dir}/postings")
    )
    (
        postings.groupBy("term", "_bucket")
        .agg(F.count(F.lit(1)).cast("long").alias("df"))
        .repartition(1)
        .write.mode("overwrite")
        .partitionBy("_bucket")
        .parquet(f"{index_dir}/termdf")
    )
    # every doc has >= 1 posting (split yields at least one token), so
    # corpus stats derive from the cached postings — no second text scan
    (
        postings.select(id_col, "dl")
        .distinct()
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("dl").cast("long").alias("sum_dl"),
        )
        .coalesce(1)
        .write.mode("overwrite")
        .parquet(f"{index_dir}/stats")
    )
    postings.unpersist()


def search_bm25_index(
    spark,
    index_dir: str,
    terms: list[str],
    id_col: str = "doc_id",
    k1: float = 1.2,
    b: float = 0.75,
    n_buckets: int = 64,
    filter_ids: DataFrame | None = None,
) -> DataFrame:
    """BM25 over a persisted index (:func:`build_bm25_index`): read
    ONLY the query terms' bucket partitions, pivot the matched
    postings back to one row per document (per-term tf columns), and
    apply the LITERAL float tree of :func:`bm25_scores` — same
    association, one ln, per-term conditional values added in fixed
    written order — so index-path scores are bit-identical to the
    full-scan path and the same SQL oracle replays both.

    FILTERED retrieval (r13 verdict ask #1): ``filter_ids`` is a
    one-column (``id_col``) relation of admissible documents — the
    caller's metadata predicate evaluated on its doc table.  It
    semi-joins the matched postings BEFORE the pivot/score, so the
    result is exactly BM25 over the admissible subset.  Because this
    operator returns ALL matching docs (ranking/top-k is the caller's
    cut), pre- and post-filtering agree here BY CONSTRUCTION — but
    pre-filtering shrinks the pivot/aggregate, and a caller who cuts
    top-k downstream gets the filtered top-k, never an under-filled
    one.  Surviving docs keep their corpus-level idf/dl statistics
    (the standard contract: a filter constrains the result set, not
    the collection statistics).

    Returns (id, dl, tf_<i> per term, score_raw), matching
    ``bm25_scores`` exactly (docs matching >= 1 term)."""
    import zlib

    if not terms:
        raise ValueError("terms must be non-empty")
    buckets = sorted({zlib.crc32(t.encode()) % n_buckets for t in terms})
    [srow] = spark.read.parquet(f"{index_dir}/stats").collect()
    n, sum_dl = int(srow["n_docs"]), int(srow["sum_dl"])
    tdf = {
        r["term"]: int(r["df"])
        for r in spark.read.parquet(f"{index_dir}/termdf")
        .where(F.col("_bucket").isin(buckets) & F.col("term").isin(terms))
        .collect()
    }
    posts = (
        spark.read.parquet(f"{index_dir}/postings")
        .where(F.col("_bucket").isin(buckets) & F.col("term").isin(terms))
    )
    # deleted docs vanish from results IMMEDIATELY via the tombstone
    # anti-join; corpus stats / term df stay at their pre-delete values
    # until vacuum_bm25_index (documented staleness — the IVF contract)
    tomb = _read_bm25_tombstones(spark, index_dir, id_col)
    if tomb is not None:
        posts = posts.join(F.broadcast(tomb), id_col, "left_anti")
    if filter_ids is not None:
        posts = posts.join(
            F.broadcast(filter_ids.select(id_col).distinct()),
            id_col,
            "left_semi",
        )
    aggs = [F.first("dl").alias("dl")]
    for i, t in enumerate(terms):
        aggs.append(
            F.coalesce(
                F.max(F.when(F.col("term") == t, F.col("tf"))), F.lit(0)
            ).alias(f"tf_{i}")
        )
    g = posts.groupBy(id_col).agg(*aggs)
    # constants enter as literal COLUMNS so Catalyst evaluates the
    # identical Java float tree bm25_scores evaluates at runtime
    avgdl = F.lit(sum_dl).cast("double") / F.lit(n)
    score = F.lit(0.0)
    for i, t in enumerate(terms):
        tf = F.col(f"tf_{i}")
        dfc = F.lit(tdf.get(t, 0))
        idf = F.log(
            F.lit(1.0)
            + ((F.lit(n) - dfc).cast("double") + 0.5)
            / (dfc.cast("double") + 0.5)
        )
        part = idf * (
            (tf.cast("double") * (k1 + 1.0))
            / (
                tf.cast("double")
                + k1 * (1.0 - b + b * (F.col("dl").cast("double") / avgdl))
            )
        )
        score = score + F.when(tf > 0, part).otherwise(F.lit(0.0))
    keep = [F.col(id_col), F.col("dl")]
    keep += [F.col(f"tf_{i}") for i in range(len(terms))]
    keep.append(score.alias("score_raw"))
    return g.select(*keep)


def add_to_bm25_index(
    df: DataFrame,
    index_dir: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = 64,
) -> None:
    """INCREMENTAL-ADD step of the persisted BM25 index (the same
    index-maintenance contract as ``add_to_ivf_index``): the new docs'
    postings APPEND into the bucket partitions, and the tiny summary
    relations merge — term df as old ∪ delta re-aggregated into a
    fresh directory swapped in via the Hadoop FS API (never
    read-and-overwrite the same path), corpus stats as a driver-side
    add of two single rows. Scores after the add are IDENTICAL to a
    from-scratch build over the union corpus (integer counts merge
    exactly), which the parity test pins.

    Add cost tracks the BATCH (its postings + one pass over the small
    termdf relation), never the indexed corpus."""
    spark = df.sparkSession
    # delete-then-re-add: reclaim + untombstone arriving doc ids FIRST
    # so the appended postings become the single live, searchable copy
    _prune_bm25_tombstones(spark, index_dir, df, id_col)
    toks = F.split(F.lower(F.col(text_col)), " ")
    base = df.select(
        F.col(id_col), F.size(toks).alias("dl"), toks.alias("_tk")
    )
    from pyspark.storagelevel import StorageLevel

    delta = (
        base.select(id_col, "dl", F.explode("_tk").alias("term"))
        .groupBy(id_col, "dl", "term")
        .agg(F.count(F.lit(1)).cast("long").alias("tf"))
        .withColumn(
            "_bucket", (F.crc32(F.col("term")) % n_buckets).cast("int")
        )
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    (
        delta.repartition(n_buckets, F.col("_bucket"))
        .write.mode("append")
        .partitionBy("_bucket")
        .parquet(f"{index_dir}/postings")
    )
    # merge term document-frequencies: old relation ∪ delta counts,
    # re-aggregated into a NEW directory, then swapped in
    old_tdf = spark.read.parquet(f"{index_dir}/termdf")
    delta_tdf = delta.groupBy("term", "_bucket").agg(
        F.count(F.lit(1)).cast("long").alias("df")
    )
    merged = (
        old_tdf.unionByName(delta_tdf)
        .groupBy("term", "_bucket")
        .agg(F.sum("df").cast("long").alias("df"))
    )
    tmp = f"{index_dir}/termdf_next"
    (
        merged.repartition(1)
        .write.mode("overwrite")
        .partitionBy("_bucket")
        .parquet(tmp)
    )
    _swap_dir(spark, f"{index_dir}/termdf", tmp)
    # merge the single-row stats driver-side
    [old_s] = spark.read.parquet(f"{index_dir}/stats").collect()
    [add_s] = (
        delta.select(id_col, "dl")
        .distinct()
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("dl").cast("long").alias("sum_dl"),
        )
        .collect()
    )
    delta.unpersist()
    spark.createDataFrame(
        [
            (
                int(old_s["n_docs"]) + int(add_s["n_docs"]),
                int(old_s["sum_dl"]) + int(add_s["sum_dl"]),
            )
        ],
        "n_docs long, sum_dl long",
    ).coalesce(1).write.mode("overwrite").parquet(f"{index_dir}/stats")


def _read_bm25_tombstones(spark, index_dir: str, id_col: str):
    """The BM25 index's doc tombstone relation, or None when none
    exists yet (probed by the read itself — uniform across local FS /
    HDFS / object stores)."""
    try:
        return spark.read.parquet(f"{index_dir}/tombstones").select(id_col)
    except Exception:
        return None


def remove_from_bm25_index(
    ids: DataFrame,
    index_dir: str,
    id_col: str = "doc_id",
) -> None:
    """DELETE step of the persisted BM25 index lifecycle — the same
    tombstone-then-compact contract as ``remove_from_ivf_index``:
    append the doc ids to a tombstone relation at the index root that
    every ``search_bm25_index`` anti-joins (broadcast — delete volume
    is tiny next to the corpus by construction). The deleted docs stop
    appearing in results IMMEDIATELY; term df and corpus stats keep
    their pre-delete values until :func:`vacuum_bm25_index` rebuilds
    them (scores of surviving docs drift by the deleted docs' share of
    the global statistics — the standard stale-segment-stats behavior
    of every deferred-merge inverted index). A later re-add of a
    deleted id via ``add_to_bm25_index`` reclaims the old postings and
    prunes the tombstone, so delete-then-re-add round-trips without a
    vacuum."""
    (
        ids.select(id_col)
        .distinct()
        .write.mode("append")
        .parquet(f"{index_dir}/tombstones")
    )


def _reclaim_bm25(spark, index_dir: str, ids: DataFrame, id_col: str) -> int:
    """Physically remove the given docs from the BM25 layout: rewrite
    ONLY the bucket partitions holding their postings (dynamic
    partition overwrite; emptied buckets' directories dropped),
    subtract their per-term counts from ``termdf`` (terms hitting
    df=0 are dropped), and subtract their doc count / length sum from
    ``stats`` — so the index afterwards equals a from-scratch build
    over the surviving corpus (integer bookkeeping subtracts exactly).
    Shared by :func:`vacuum_bm25_index` (ids = the whole tombstone
    set) and the re-add path in ``add_to_bm25_index``. Returns docs
    removed.

    Cost model: finding a doc's postings takes one scan of the
    postings relation (they are term-bucketed, not doc-partitioned —
    inherent to an inverted index; Lucene pays the same shape per
    segment merge), then the rewrite touches only affected buckets."""
    from pyspark.storagelevel import StorageLevel

    posts = spark.read.parquet(f"{index_dir}/postings")
    ids = ids.select(id_col).distinct().persist(StorageLevel.MEMORY_AND_DISK)
    hit = posts.join(F.broadcast(ids), id_col, "left_semi").persist(
        StorageLevel.MEMORY_AND_DISK
    )
    [rm] = (
        hit.select(id_col, "dl")
        .distinct()
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("dl").cast("long").alias("sum_dl"),
        )
        .collect()
    )
    n_rm = int(rm["n_docs"] or 0)
    if n_rm == 0:
        hit.unpersist()
        ids.unpersist()
        return 0

    affected = [int(r[0]) for r in hit.select("_bucket").distinct().collect()]
    # --- termdf: subtract the removed docs' per-term posting counts
    rm_df = hit.groupBy("term", "_bucket").agg(
        F.count(F.lit(1)).cast("long").alias("_rm")
    )
    new_tdf = (
        spark.read.parquet(f"{index_dir}/termdf")
        .join(rm_df, ["term", "_bucket"], "left")
        .select(
            "term",
            "_bucket",
            (F.col("df") - F.coalesce(F.col("_rm"), F.lit(0)))
            .cast("long")
            .alias("df"),
        )
        .where(F.col("df") > 0)
    )
    tmp = f"{index_dir}/termdf_next"
    (
        new_tdf.repartition(1)
        .write.mode("overwrite")
        .partitionBy("_bucket")
        .parquet(tmp)
    )
    _swap_dir(spark, f"{index_dir}/termdf", tmp)

    # --- postings: rewrite only the affected buckets
    survivors = (
        posts.where(F.col("_bucket").isin(affected))
        .join(F.broadcast(ids), id_col, "left_anti")
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    kept = {int(r[0]) for r in survivors.select("_bucket").distinct().collect()}
    old_mode = spark.conf.get(
        "spark.sql.sources.partitionOverwriteMode", "static"
    )
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        (
            survivors.write.mode("overwrite")
            .partitionBy("_bucket")
            .parquet(f"{index_dir}/postings")
        )
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", old_mode)
    survivors.unpersist()
    # dynamic overwrite only rewrites partitions PRESENT in the output
    # — a fully-emptied bucket keeps its stale files, so drop those
    # directories explicitly
    jvm = spark._jvm
    conf = spark._jsc.hadoopConfiguration()
    for bkt in affected:
        if bkt not in kept:
            p = jvm.org.apache.hadoop.fs.Path(
                f"{index_dir}/postings/_bucket={bkt}"
            )
            p.getFileSystem(conf).delete(p, True)

    # --- stats: driver-side subtraction of two single rows
    [old_s] = spark.read.parquet(f"{index_dir}/stats").collect()
    spark.createDataFrame(
        [
            (
                int(old_s["n_docs"]) - n_rm,
                int(old_s["sum_dl"]) - int(rm["sum_dl"] or 0),
            )
        ],
        "n_docs long, sum_dl long",
    ).coalesce(1).write.mode("overwrite").parquet(f"{index_dir}/stats")
    hit.unpersist()
    ids.unpersist()
    return n_rm


def vacuum_bm25_index(
    spark,
    index_dir: str,
    id_col: str = "doc_id",
) -> int:
    """Physically reclaim tombstoned docs from the BM25 index: rewrite
    only the affected bucket partitions, rebuild term df / corpus
    stats by exact integer subtraction, then clear the tombstone set
    (idempotent on an empty one). After the vacuum the index is
    bit-identical to a from-scratch build over the surviving corpus —
    pinned by the lifecycle pytest. Returns the number of docs
    removed."""
    tomb = _read_bm25_tombstones(spark, index_dir, id_col)
    if tomb is None:
        return 0
    n = _reclaim_bm25(spark, index_dir, tomb, id_col)
    p = spark._jvm.org.apache.hadoop.fs.Path(f"{index_dir}/tombstones")
    p.getFileSystem(spark._jsc.hadoopConfiguration()).delete(p, True)
    return int(n)


def _prune_bm25_tombstones(spark, index_dir: str, df: DataFrame, id_col: str):
    """Run BEFORE an incremental add: any arriving doc id that is
    currently tombstoned gets its old postings reclaimed (termdf/stats
    adjusted) and its tombstone dropped, so the re-added doc indexes
    as the single live copy and is searchable immediately. Runs before
    the append so a mid-add crash can only lose the re-add — never
    resurrect the deleted doc or double-count it."""
    tomb = _read_bm25_tombstones(spark, index_dir, id_col)
    if tomb is None:
        return
    batch_ids = df.select(id_col).distinct()
    readded = [
        r[0] for r in tomb.join(batch_ids, id_col, "left_semi").collect()
    ]
    if not readded:
        return
    _reclaim_bm25(
        spark,
        index_dir,
        spark.createDataFrame([(k,) for k in readded], tomb.schema),
        id_col,
    )
    keep = [
        r[0] for r in tomb.join(batch_ids, id_col, "left_anti").collect()
    ]
    path = f"{index_dir}/tombstones"
    if keep:
        spark.createDataFrame(
            [(k,) for k in keep], tomb.schema
        ).coalesce(1).write.mode("overwrite").parquet(path)
    else:
        p = spark._jvm.org.apache.hadoop.fs.Path(path)
        p.getFileSystem(spark._jsc.hadoopConfiguration()).delete(p, True)


def doc_embed(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    dim: int = 16,
    n_buckets: int = 1024,
    scale: int = 1024,
    driver_max_tf_rows: int = 400_000,
) -> DataFrame:
    """In-engine document embeddings with ZERO external models (r13
    verdict ask #4): hashed TF-IDF x Johnson-Lindenstrauss signs,
    every step integer-exact so the whole text -> vector chain replays
    in SQL.  Closes the loop the similarity family left open — raw
    text to ANN/SemDeDup without a model server:

      1. tokenize (the q_feature_hashing tokenizer: lowercase, strip
         non-alnum, single-space split) and hash each term to one of
         ``n_buckets`` via md5's first 8 hex chars (engine-portable);
      2. per-(doc, bucket) tf and per-bucket document frequency from
         two hash aggregates; the idf weight is the RATIONAL integer
         w_b = (n_docs * scale) DIV df_b — integer division, exact
         BIGINT in both engines (a float ln(idf) would floor
         differently at ulp boundaries; the rational variant ranks
         buckets identically and stays exact);
      3. JL projection to ``dim`` via the :func:`random_projection`
         sign convention (+-1 from md5(f"{j}_{bucket}")'s first hex
         digit): component j = SUM_b tf * w_b * sign(b, j), an exact
         int64 accumulation where order is irrelevant.

    Spark shape: two hash aggregates + one broadcast join of the
    n_buckets-row weight table + one groupBy collecting each doc's
    (bucket, tf*w) pairs (bounded by min(doc vocab, n_buckets)), then
    one Arrow kernel doing the int64 gemm per batch with the sign
    matrix rebuilt from md5 per task (n_buckets x dim scalar md5s —
    the random_projection contract: nothing fit, stored or
    broadcast).  No data-sized shuffle beyond the two keyed
    aggregates; embarrassingly parallel at 100 TB.

    Docs with zero in-vocab tokens are ABSENT from the output (no
    terms -> no vector; documented, not a zero vector).  Returns
    (id, emb_q array<bigint>, embedding array<double>) where
    embedding = emb_q / scale — feed ``embedding`` to cosine_topk /
    IVF / SemDeDup, or join two docs' ``emb_q`` for an exact integer
    dot product (the q_doc_embed_ann oracle does).
    """
    import hashlib
    from typing import Iterator

    import numpy as np
    from pyspark.sql import types as T

    from oakstore_spark.functions.text import normalize_text

    if dim < 1 or n_buckets < 1:
        raise ValueError("dim and n_buckets must be >= 1")
    tb = (
        df.select(
            F.col(id_col),
            F.explode(
                F.split(normalize_text(text_col), " ")
            ).alias("term"),
        )
        .where(F.col("term") != "")
        .select(
            id_col,
            (
                F.conv(F.substring(F.md5("term"), 1, 8), 16, 10)
                .cast("bigint") % n_buckets
            ).cast("int").alias("bucket"),
        )
    )
    # ONE corpus tokenization pass (r15 optimization, guide §2.3/§2.4):
    # tf is persisted and BOTH corpus statistics are derived from it —
    # df_b is the number of (doc, bucket) rows per bucket and n_docs
    # the distinct docs of tf (identical sets by construction).  The
    # previous three sibling aggregates over ``tb`` each re-tokenized
    # and re-md5'd the corpus (column pruning makes the subtrees
    # non-identical, so exchange reuse never fires): 3 scans -> 1.
    # tf is bounded by n_docs x min(doc vocab, n_buckets) rows —
    # MEMORY_AND_DISK, the same budget the minhash/LSH family persists.
    from pyspark.storagelevel import StorageLevel

    tf_plan = tb.groupBy(id_col, "bucket").agg(
        F.count(F.lit(1)).cast("bigint").alias("tf")
    )
    # r16 optimization (guide §1.2 step 1, the sssp/minhash gate
    # precedent): size-gated DRIVER fast path. Under the gate, the tf
    # relation transfers in ONE Arrow job and the whole idf + JL chain
    # runs vectorized on the driver — replacing the stats collect
    # (~7 AQE sub-jobs), the broadcast join, the collect_list groupBy
    # and the mapInPandas kernel (~13 jobs measured for q_doc_embed).
    # Bit-identical BY CONSTRUCTION: df_b / n_docs are exact integer
    # counts of the same rows, w the same non-negative integer DIV,
    # emb_q the same order-free int64 accumulation numpy already did
    # inside the kernel (same wrap semantics), embedding the same
    # float64 division. Gate+transfer are one `limit(cap+1)` pull (the
    # r15 minhash pattern: complete iff <= cap); overflow or a NULL id
    # (pandas NaN would corrupt the grouping) falls through to the
    # distributed path. driver_max_tf_rows=0 forces the distributed
    # path (CI parity hook).
    if driver_max_tf_rows > 0:
        pdf = tf_plan.limit(driver_max_tf_rows + 1).toPandas()
        if len(pdf) <= driver_max_tf_rows and not (
            len(pdf) and pdf[id_col].isna().any()
        ):
            out_schema = T.StructType(
                [
                    df.schema[id_col],
                    T.StructField("emb_q", T.ArrayType(T.LongType())),
                    T.StructField(
                        "embedding", T.ArrayType(T.DoubleType())
                    ),
                ]
            )
            spark = df.sparkSession
            if not len(pdf):
                return spark.createDataFrame([], out_schema)
            buckets = pdf["bucket"].to_numpy(np.int64)
            tfv = pdf["tf"].to_numpy(np.int64)
            df_b = np.bincount(buckets, minlength=n_buckets)
            n_docs = int(pdf[id_col].nunique())
            w_full = np.zeros(n_buckets, dtype=np.int64)
            nz = df_b > 0
            w_full[nz] = (n_docs * scale) // df_b[nz]
            signs = np.empty((n_buckets, dim), dtype=np.int64)
            for j in range(dim):
                for b_ in range(n_buckets):
                    h = hashlib.md5(f"{j}_{b_}".encode()).hexdigest()
                    signs[b_, j] = 1 if h[0] < "8" else -1
            codes, uniq = pd.factorize(pdf[id_col])
            out = np.zeros((len(uniq), dim), dtype=np.int64)
            np.add.at(
                out, codes, signs[buckets] * (tfv * w_full[buckets])[:, None]
            )
            emb = out / float(scale)
            rows = [
                (uniq[i], out[i].tolist(), emb[i].tolist())
                for i in range(len(uniq))
            ]
            # python-native id values so createDataFrame type-checks
            # match the declared id type (numpy ints fail LongType)
            rows = [
                (r[0].item() if hasattr(r[0], "item") else r[0], r[1], r[2])
                for r in rows
            ]
            return spark.createDataFrame(rows, out_schema)

    tf = tf_plan.persist(StorageLevel.MEMORY_AND_DISK)
    # The weight table is bounded by n_buckets rows, i.e. it is
    # broadcast-sized BY CONSTRUCTION — collect its two inputs in ONE
    # flagged-union job over the persisted tf relation instead of two
    # nested broadcast subtrees (guide §1.2 step 1): leg _g=0 is the
    # per-bucket df_b aggregate (shuffles <= n_buckets partial rows),
    # leg _g=1 the global n_docs = countDistinct(id) (shuffles the
    # map-side-deduped ids — exactly what the old lazy plan shuffled);
    # previously each ran as its own BroadcastExchange job at action
    # time and every cache consumer re-planned the pair. NOT a rollup:
    # rollup+countDistinct would Expand the corpus-sized tf relation
    # and shuffle ~2x its rows to track distinct ids PER BUCKET —
    # strictly more shuffle bytes at scale (guide §2.3). The driver
    # transfer is <= n_buckets + 1 tiny rows — the same bytes the old
    # BroadcastExchange already pulled through the driver. Python `//`
    # on non-negative ints is exactly SQL DIV, so _w is bit-identical.
    stats = (
        tf.groupBy("bucket")
        .agg(F.count(F.lit(1)).cast("bigint").alias("_v"))
        .select(F.lit(0).alias("_g"), "bucket", "_v")
        .unionAll(
            tf.agg(
                F.countDistinct(id_col).cast("bigint").alias("_v")
            ).select(
                F.lit(1).alias("_g"),
                F.lit(None).cast("int").alias("bucket"),
                "_v",
            )
        )
        .collect()
    )
    # empty input: the global-aggregate leg still emits one row with
    # _v = 0, so n_docs = 0 — w stays empty and the output is empty,
    # exactly the old lazy plan's behavior (the default is belt and
    # braces)
    n_docs = next(
        (int(r["_v"]) for r in stats if r["_g"] == 1), 0
    )
    w_rows = [
        (int(r["bucket"]), (n_docs * scale) // int(r["_v"]))
        for r in stats
        if r["_g"] == 0
    ]
    w = df.sparkSession.createDataFrame(
        w_rows, "bucket int, _w bigint"
    )
    tfw = tf.join(F.broadcast(w), "bucket").select(
        id_col,
        "bucket",
        (F.col("tf") * F.col("_w")).alias("_tw"),
    )
    per_doc = tfw.groupBy(id_col).agg(
        F.collect_list(F.struct("bucket", "_tw")).alias("_bw")
    )
    out_schema = T.StructType(
        [
            df.schema[id_col],
            T.StructField("emb_q", T.ArrayType(T.LongType())),
            T.StructField(
                "embedding", T.ArrayType(T.DoubleType())
            ),
        ]
    )

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        signs = None
        for pdf in batches:
            if not len(pdf):
                continue
            if signs is None:
                signs = np.empty((n_buckets, dim), dtype=np.int64)
                for j in range(dim):
                    for b in range(n_buckets):
                        h = hashlib.md5(
                            f"{j}_{b}".encode()
                        ).hexdigest()
                        signs[b, j] = 1 if h[0] < "8" else -1
            embs_q, embs = [], []
            for bw in pdf["_bw"]:
                bs = np.fromiter(
                    (e["bucket"] for e in bw), dtype=np.int64
                )
                tw = np.fromiter(
                    (e["_tw"] for e in bw), dtype=np.int64
                )
                v = (signs[bs] * tw[:, None]).sum(axis=0)
                embs_q.append(v.tolist())
                embs.append((v / float(scale)).tolist())
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col].values,
                    "emb_q": embs_q,
                    "embedding": embs,
                }
            )

    from oakstore_spark.operators.scaling import track_persisted

    return track_persisted(per_doc.mapInPandas(kernel, out_schema), tf)


def pmi_collocations(
    df,
    text_col: str = "text",
    min_count: int = 5,
    top_k: int = 50,
):
    """Top-k word collocations by pointwise mutual information — the
    classic corpus-linguistics keyphrase detector (Church & Hanks 1990)
    next to the frequency-only :func:`winnow_fingerprints` /
    TF-IDF rungs:

        pmi(a, b) = ln( n_ab * N / (n_a. * n_.b) )

    over BIGRAM events: N = total bigram positions in the corpus,
    n_a. / n_.b the first-/second-position marginals — all derived
    from the ONE corpus-sized bigram count relation, so the corpus is
    touched exactly once.  ``min_count`` suppresses the low-frequency
    PMI explosion (a hapax pair scores arbitrarily high), the standard
    fix.

    Spark shape: explode bigrams -> one hash aggregate (map-side
    combine) to the vocabulary-sized (w1, w2, n_ab) relation; both
    marginals and N are tiny re-aggregations of THAT relation, never a
    second corpus pass; the marginal joins broadcast; top-k is
    TakeOrdered (bounded heaps, no global sort).  The float tree is
    one ln over one division of exact BIGINTs — oracle-replayable.

    Returns (w1, w2, n_ab, n_w1, n_w2, pmi), pmi desc, (w1, w2) the
    deterministic tiebreak.
    """
    from pyspark.sql import functions as F

    from oakstore_spark.functions.text import normalize_text

    words = F.split(normalize_text(text_col), " ")

    def _pairs(ws):
        return F.when(
            F.size(ws) >= 2,
            F.transform(
                F.sequence(F.lit(0), F.size(ws) - 2),
                lambda i: F.struct(
                    F.element_at(ws, i + 1).alias("w1"),
                    F.element_at(ws, i + 2).alias("w2"),
                ),
            ),
        ).otherwise(F.array().cast("array<struct<w1:string,w2:string>>"))

    pairs = F.element_at(F.transform(F.array(words), _pairs), 1)
    bg = df.select(F.explode(pairs).alias("p")).select("p.w1", "p.w2")
    cnt = bg.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("n_ab"))
    cnt = cnt.persist()
    n_total = cnt.agg(F.sum("n_ab")).collect()[0][0]
    m1 = cnt.groupBy("w1").agg(F.sum("n_ab").alias("n_w1"))
    m2 = cnt.groupBy("w2").agg(F.sum("n_ab").alias("n_w2"))
    scored = (
        cnt.where(F.col("n_ab") >= min_count)
        .join(F.broadcast(m1), "w1")
        .join(F.broadcast(m2), "w2")
        .select(
            "w1",
            "w2",
            "n_ab",
            "n_w1",
            "n_w2",
            F.log(
                F.col("n_ab").cast("double")
                * F.lit(int(n_total)).cast("double")
                / (F.col("n_w1").cast("double") * F.col("n_w2"))
            ).alias("pmi"),
        )
    )
    out = scored.orderBy(
        F.col("pmi").desc(), F.col("w1"), F.col("w2")
    ).limit(top_k)
    from oakstore_spark.operators.scaling import track_persisted

    return track_persisted(out, cnt)


RAKE_STOPWORDS: tuple[str, ...] = (
    "a", "an", "and", "are", "as", "at", "be", "but", "by", "for",
    "from", "has", "he", "in", "is", "it", "its", "of", "on", "or",
    "that", "the", "to", "was", "were", "will", "with",
)


def rake_keywords(
    df,
    id_col: str = "doc_id",
    text_col: str = "text",
    stopwords: tuple[str, ...] = RAKE_STOPWORDS,
    top_k: int = 5,
):
    """RAKE keyword extraction (Rose et al. 2010, "Automatic Keyword
    Extraction from Individual Documents") — the stemless, corpus-free
    keyphrase rung the text family was missing next to language ID /
    readability / taxonomy tagging / PMI: candidate phrases are the
    maximal runs between stopwords and punctuation; each word scores
    ``degree/frequency`` over the DOCUMENT's candidates (degree = sum
    of the lengths of the phrases it appears in — co-occurrence
    weighted, so words living in long phrases outrank isolated
    frequent words); a phrase scores the sum of its words' scores.

    Exactness contract: freq and degree are exact BIGINTs from one
    hash aggregate; each word score is ONE pinned division; the phrase
    score is a FIXED-ORDER left fold over the phrase's words (Spark
    ``F.aggregate`` ≡ DuckDB ``list_reduce`` over the
    position-ordered list) — never an unordered float sum — and the
    per-doc top-k rank breaks float ties on the phrase text.

    Spark shape: phrase construction is two JVM regexp passes + one
    split (no UDF); word stats are one hash aggregate on
    (doc, word); scores join back on the same key; ranking is one
    window per doc.  Everything shuffles on doc-sized keys — no
    corpus-global state, embarrassingly parallel at 100 TB.

    Returns (id, phrase, n_words, score, rank), rank 1..top_k per doc
    by (score desc, phrase asc).
    """
    from pyspark.sql import Window as W
    from pyspark.sql import functions as F

    stop_pat = r"\b(" + "|".join(stopwords) + r")\b"
    s = F.lower(F.col(text_col))
    s = F.regexp_replace(s, F.lit(r"[^a-z0-9 ]+"), F.lit("|"))
    s = F.regexp_replace(s, F.lit(stop_pat), F.lit("|"))
    phrases = F.filter(
        F.transform(
            F.split(s, r"\|"),
            lambda p: F.trim(F.regexp_replace(p, F.lit(" +"), F.lit(" "))),
        ),
        lambda p: p != "",
    )
    occ = df.select(
        F.col(id_col).alias("id"),
        F.explode(phrases).alias("phrase"),
    )
    wo = occ.select(
        "id",
        "phrase",
        F.size(F.split(F.col("phrase"), " ")).alias("plen"),
        F.posexplode(F.split(F.col("phrase"), " ")).alias("wpos", "word"),
    )
    # r15 optimization (guide §2.3/§2.4): word freq/deg as WINDOW sums
    # over the (doc, word) partition of the ONE exploded relation —
    # the previous groupBy + join-back re-tokenized the corpus (the
    # occ subtree ran twice: once under stats, once under the distinct
    # leg) and paid the extra join exchange. sw is the same pinned
    # division of the same exact BIGINTs; scoring DISTINCT phrases
    # only is preserved by the distinct over (id, phrase, wpos, word)
    # — within a phrase each (wpos, word) is unique, so this equals
    # the old phrase-level distinct + re-explode.
    wword = W.partitionBy("id", "word")
    score_w = (
        F.sum("plen").over(wword).cast("double")
        / F.count(F.lit(1)).over(wword)
    )
    pw = wo.select(
        "id", "phrase", "wpos", "word", score_w.alias("sw")
    ).distinct()
    folded = (
        pw.groupBy("id", "phrase")
        .agg(
            F.array_sort(
                F.collect_list(F.struct("wpos", "sw"))
            ).alias("_arr")
        )
        .select(
            "id",
            "phrase",
            F.size("_arr").cast("bigint").alias("n_words"),
            F.aggregate(
                "_arr",
                F.lit(0.0),
                lambda acc, x: acc + x.getField("sw"),
            ).alias("score"),
        )
    )
    w = W.partitionBy("id").orderBy(
        F.col("score").desc(), F.col("phrase").asc()
    )
    return (
        folded.withColumn("rank", F.row_number().over(w).cast("bigint"))
        .where(F.col("rank") <= top_k)
        .select(
            F.col("id").alias(id_col), "phrase", "n_words", "score",
            "rank",
        )
    )


def textrank_keywords(
    df: DataFrame,
    text_col: str = "text",
    damping: float = 0.5,
    n_iterations: int = 6,
    top_k: int = 20,
) -> DataFrame:
    """TextRank keyword extraction (Mihalcea & Tarau 2004) — the
    corpus-aware GRAPH sibling of :func:`rake_keywords` (RAKE scores
    phrases within each document; TextRank ranks words by their
    position in the corpus-wide co-occurrence graph): build the
    word-adjacency graph (an undirected edge wherever two normalized
    words appear adjacent — the window-2 co-occurrence of the paper),
    run PageRank over it, and the top-ranked words are the keywords.

    Composition of existing engine pieces: the bigram extraction is
    :func:`pmi_collocations`'s one-corpus-pass relation, the ranking
    is :func:`~oakstore_spark.operators.graph.pagerank` (synchronous
    iterations, per-round join + partial-agg, localCheckpoint lineage
    truncation).  Symmetrizing the edge set (union both directions,
    distinct) leaves every node with out-edges, so the dangling term
    is exactly zero and — with a DYADIC ``damping`` on a corpus whose
    co-occurrence degrees are powers of two — every iteration is
    bit-exact and a DuckDB oracle replays the whole chain
    (the q_pagerank_dyadic construction; see queries/textproc.py).
    Self-loops (a word adjacent to itself) are dropped, per the paper.

    Spark shape: corpus touched ONCE (explode to bigrams + hash agg
    to the vocabulary-sized distinct edge relation); all iterations
    run on that edge relation; top-k is orderBy().limit() =
    TakeOrderedAndProject.  Returns (word, rank), rank desc, word the
    deterministic tiebreak.
    """
    from oakstore_spark.functions.text import normalize_text
    from oakstore_spark.operators.graph import pagerank

    words = F.split(normalize_text(text_col), " ")
    pairs = F.filter(
        F.when(
            F.size(words) >= 2,
            F.transform(
                F.sequence(F.lit(0), F.size(words) - 2),
                lambda i: F.struct(
                    F.element_at(words, i + 1).alias("w1"),
                    F.element_at(words, i + 2).alias("w2"),
                ),
            ),
        ).otherwise(
            F.array().cast("array<struct<w1:string,w2:string>>")
        ),
        lambda p: p.getField("w1") != p.getField("w2"),
    )
    bg = df.select(F.explode(pairs).alias("p")).select("p.w1", "p.w2")
    edges = (
        bg.unionByName(
            bg.select(F.col("w2").alias("w1"), F.col("w1").alias("w2"))
        )
        .distinct()
        .select(F.col("w1").alias("src"), F.col("w2").alias("dst"))
    )
    ranks = pagerank(edges, n_iterations=n_iterations, damping=damping)
    return (
        ranks.select(F.col("node").alias("word"), "rank")
        .orderBy(F.col("rank").desc(), F.col("word"))
        .limit(int(top_k))
    )


def coec_scores(
    df: DataFrame,
    item_col: str,
    pos_col: str,
    click_col: str,
) -> DataFrame:
    """COEC — clicks over expected clicks (Zhang & Jones 2007; the
    position-bias-adjusted CTR used across search/ads/recs ranking):
    raw CTR punishes items shown at bad positions; COEC divides each
    item's clicks by the clicks an AVERAGE item would have collected
    from the same impression positions,

        coec(i) = clicks_i / Σ_p n_ip · ctr_p

    with ctr_p the global per-position baseline.  > 1 means the item
    out-clicks its placement.

    Spark shape: ONE hash aggregate to the (item, position) count
    relation; the position baseline is a tiny re-aggregation of that
    relation (positions are bounded — never a second impression-log
    pass) joined back by broadcast; the per-item expected sum is a
    FIXED-ORDER position-sorted fold (the power_analysis rule), so
    every float replays.  All counts exact BIGINTs.

    Returns per item: (item, n_impressions, n_clicks, expected_clicks,
    coec); coec NULL when expected = 0 (no baseline clicks at any of
    the item's positions).
    """
    c = F.col(click_col).cast("bigint")
    ip = df.groupBy(
        F.col(item_col).alias("item"), F.col(pos_col).alias("pos")
    ).agg(
        F.count(F.lit(1)).alias("n_ip"),
        F.sum(c).alias("k_ip"),
    )
    base = ip.groupBy("pos").agg(
        F.sum("n_ip").alias("imps_p"),
        F.sum("k_ip").alias("clicks_p"),
    )
    j = ip.join(F.broadcast(base), "pos")
    term = (
        F.col("n_ip").cast("double")
        * F.col("clicks_p")
        / F.col("imps_p")
    )
    agg = j.groupBy("item").agg(
        F.sum("n_ip").cast("bigint").alias("n_impressions"),
        F.sum("k_ip").cast("bigint").alias("n_clicks"),
        F.aggregate(
            F.array_sort(
                F.collect_list(F.struct(F.col("pos"), term.alias("t")))
            ),
            F.lit(0.0),
            lambda acc, r: acc + r.getField("t"),
        ).alias("expected_clicks"),
    )
    coec = F.when(
        F.col("expected_clicks") > 0,
        F.col("n_clicks").cast("double") / F.col("expected_clicks"),
    )
    return agg.select(
        "item", "n_impressions", "n_clicks", "expected_clicks",
        coec.alias("coec"),
    )


def train_topics(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 4,
    n_iters: int = 5,
    vocab_size: int = 8192,
    smoothing: float = 1.0,
    seed: str = "topics",
    return_assignments: bool = False,
):
    """Topic decomposition by deterministic HARD-EM over a mixture of
    unigrams — the corpus-exploration member the text family lacked
    next to RAKE/TextRank/PMI/LM-scoring (r12 verdict ask #5).  Each
    document is modeled as drawn from ONE of ``k`` topic unigram
    distributions (the mixture-of-unigrams simplification of
    pLSA/LDA, Nigam et al. 2000 — public); hard-EM alternates

        E: assign each doc to argmax_t [ log P(t)
             + Σ_w count(d,w) · log P(w|t) ]          (ties → lowest t)
        M: P(w|t) ∝ add-α smoothed topic-word counts,
           P(t)   ∝ add-one smoothed topic doc counts

    from a deterministic md5(seed:doc) % k initialization — no RNG,
    so identical runs produce identical topics (the engine's
    replayable-randomness rung).

    Spark shape (the train_unigram_lm loop generalized): ONE corpus
    pass collapses to the (doc, word, n) relation restricted to the
    top-``vocab_size`` words (freq desc, word asc — deterministic),
    persisted once.  Each EM round is: one broadcast join of the
    <= vocab_size topic-log-prob table onto that relation, k per-doc
    scores as word-sorted fixed-order folds over ONE hash aggregate's
    collected structs (so the double accumulation order — hence every
    assignment, even at a near-tie argmax — is partitioning-invariant,
    the family contract), a when-chain argmax, then one (topic, word)
    BIGINT count aggregate whose
    <= k·vocab_size rows are collected for the driver-side M-step —
    the corpus itself is never re-shuffled and nothing driver-side
    grows with data size.  Unlike train_unigram_lm there is no
    separate driver path: the E-step is already pure DataFrame ops.

    Iterative (not SQL-expressible): registered ROWS-only, pinned by
    the planted-topic exact-recovery pytest (the q_unigram_tok_train
    precedent).  Docs with zero in-vocab tokens are absent from the
    assignment (documented, not silently topic-0).

    Returns the topic-word table (topic int, word string, count
    bigint, logprob double) sorted (topic, count desc, word); with
    ``return_assignments`` a (topics, assignments) tuple where
    assignments is (doc, topic).
    """
    import math

    from pyspark.sql import types as T
    from pyspark.storagelevel import StorageLevel

    from oakstore_spark.functions.text import normalize_text

    if k < 2:
        raise ValueError("k must be >= 2")
    spark = df.sparkSession
    dw = (
        df.select(
            F.col(id_col).alias("doc"),
            F.explode(
                F.split(normalize_text(text_col), " ")
            ).alias("word"),
        )
        .where(F.length("word") > 0)
        .groupBy("doc", "word")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    )
    vocab = (
        dw.groupBy("word")
        .agg(F.sum("n").alias("tf"))
        .orderBy(F.desc("tf"), F.asc("word"))
        .limit(vocab_size)
        .select("word")
    )
    dwv = dw.join(F.broadcast(vocab), "word").persist(
        StorageLevel.MEMORY_AND_DISK
    )
    try:
        n_vocab = dwv.select("word").distinct().count()
        if n_vocab == 0:
            empty = spark.createDataFrame(
                [],
                "topic int, word string, count bigint, logprob double",
            )
            if return_assignments:
                return empty, spark.createDataFrame(
                    [], "doc long, topic int"
                )
            return empty
        u60 = F.conv(
            F.substring(
                F.md5(F.concat_ws(":", F.lit(seed),
                                  F.col("doc").cast("string"))),
                1, 15,
            ),
            16, 10,
        ).cast("bigint")
        assign = dwv.select("doc").distinct().select(
            "doc", (u60 % k).cast("int").alias("topic")
        ).localCheckpoint(eager=True)

        lp_schema = T.StructType(
            [
                T.StructField("word", T.StringType()),
                T.StructField("lp", T.ArrayType(T.DoubleType())),
            ]
        )
        priors: list[float] = []
        for _ in range(n_iters):
            # M-step: exact BIGINT topic-word counts + topic doc counts
            tw = (
                dwv.join(assign, "doc")
                .groupBy("topic", "word")
                .agg(F.sum("n").alias("c"))
                .collect()
            )
            td = {
                r["topic"]: r["nd"]
                for r in assign.groupBy("topic")
                .agg(F.count(F.lit(1)).alias("nd"))
                .collect()
            }
            n_docs = sum(td.values())
            totals = [0] * k
            by_word: dict[str, list] = {}
            for r in tw:
                totals[r["topic"]] += int(r["c"])
                by_word.setdefault(r["word"], [0] * k)[r["topic"]] = int(
                    r["c"]
                )
            priors = [
                math.log((td.get(t, 0) + 1.0) / (n_docs + k))
                for t in range(k)
            ]
            denom = [
                totals[t] + smoothing * n_vocab for t in range(k)
            ]
            lp_rows = [
                (
                    w,
                    [
                        math.log((cs[t] + smoothing) / denom[t])
                        for t in range(k)
                    ],
                )
                for w, cs in by_word.items()
            ]
            lp_df = spark.createDataFrame(lp_rows, lp_schema)
            # E-step: per-doc scores as FIXED-ORDER folds (word asc)
            # over the doc's collected (word, n, lp) structs — a plain
            # F.sum's accumulation order depends on partitioning, and
            # a near-tie argmax could flip between runs; the sorted
            # fold pins every double add, the family contract (r13
            # ADVICE, low).  The collected array is bounded by the
            # doc's in-vocab type count, never the corpus.
            per_doc = (
                dwv.join(F.broadcast(lp_df), "word")
                .groupBy("doc")
                .agg(
                    F.sort_array(
                        F.collect_list(F.struct("word", "n", "lp"))
                    ).alias("_ws")
                )
            )
            def _fold(t):
                return F.aggregate(
                    F.col("_ws"),
                    F.lit(0.0),
                    lambda acc, s: acc
                    + s["n"].cast("double") * s["lp"][t],
                )

            scores = per_doc.select(
                "doc",
                *[_fold(t).alias(f"_s{t}") for t in range(k)],
            )
            tot = [
                F.col(f"_s{t}") + F.lit(priors[t]) for t in range(k)
            ]
            best = F.greatest(*tot) if k > 1 else tot[0]
            arg = F.lit(None).cast("int")
            for t in range(k - 1, -1, -1):
                arg = F.when(tot[t] == best, t).otherwise(arg)
            assign = scores.select(
                "doc", arg.alias("topic")
            ).localCheckpoint(eager=True)
        # final M-step counts reflect the LAST assignment
        tw = (
            dwv.join(assign, "doc")
            .groupBy("topic", "word")
            .agg(F.sum("n").alias("c"))
            .collect()
        )
        totals = [0] * k
        for r in tw:
            totals[r["topic"]] += int(r["c"])
        out_rows = sorted(
            (
                (
                    int(r["topic"]),
                    r["word"],
                    int(r["c"]),
                    math.log(
                        (int(r["c"]) + smoothing)
                        / (totals[r["topic"]] + smoothing * n_vocab)
                    ),
                )
                for r in tw
            ),
            key=lambda x: (x[0], -x[2], x[1]),
        )
        topics = spark.createDataFrame(
            out_rows,
            "topic int, word string, count bigint, logprob double",
        )
        if return_assignments:
            return topics, assign
        return topics
    finally:
        dwv.unpersist()
