"""Corpus-curation operators for training-data pipelines: unigram
language-model scoring, PII redaction, and deterministic balanced
domain mixing.

All three are JVM-side (built-in functions only — no Python UDFs in any
hot path) and shuffle nothing bigger than a vocabulary or a per-group
count table:

- ``unigram_logprob``: the classic two-pass corpus LM score (pass 1
  aggregates term frequencies — vocabulary-sized, pass 2 scores docs
  against the BROADCAST vocabulary). The cheap perplexity proxy used to
  rank web documents before the expensive model-based filters run.
- ``redact_pii``: map-side regex scrubbing (emails/phones -> typed
  placeholder tokens), the compliance step before text ships to
  training. Pure ``regexp_replace`` — no shuffle at all.
- ``balanced_mix_sample``: downsample every domain to (approximately)
  the size of the smallest via a DETERMINISTIC content-hash threshold —
  membership is a pure function of the row key, reproducible across
  engines/runs/partitionings, and the filter is map-side (the only
  shuffles are two vocabulary-sized count aggregations). This is the
  scale-correct shape: an exact per-group row_number rank would shuffle
  the full corpus into per-domain windows; the hash threshold trades
  +-binomial noise in the kept count for zero corpus shuffle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import Window as W
from pyspark.sql import functions as F

EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PHONE_RE = r"\b555-[0-9]{4}\b"


def unigram_logprob(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Per-document mean unigram log-probability under the corpus's own
    unigram LM: ``avg over tokens of ln(count(term) / total_tokens)``.
    Low scores = rare-token-heavy documents (gibberish, boilerplate
    explosions); the standard cheap quality signal.

    Two passes over the tokenized corpus: a term-frequency aggregation
    (output is vocabulary-sized), then a broadcast join of the log-prob
    table back onto the token stream and a per-doc aggregation. No
    corpus-sized shuffle: tokens join the vocab map-side.
    """
    from pyspark.storagelevel import StorageLevel

    from oakstore_spark.operators.scaling import track_persisted

    toks = df.select(
        id_col, F.explode(F.split(F.col(text_col), " ")).alias("term")
    ).filter(F.col("term") != "")
    # r15 optimization (guide §2.3/§2.4): persist the VOCABULARY-sized
    # term-frequency relation — the total-token row and the log-prob
    # table both consumed it as unpersisted siblings, so the corpus
    # was tokenized three times (tf for tot, tf again inside probs,
    # then the scoring join). Now: one tokenize pass builds tf, one
    # scores the stream (3 scans -> 2). The remaining two passes stay
    # separate on purpose: folding the scoring join into a per-doc
    # (term, count) relation would replace avg-over-tokens with a
    # weighted sum — a different float fold than the declared query's
    # oracle replays.
    tf = (
        toks.groupBy("term")
        .agg(F.count(F.lit(1)).alias("n"))
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    tot = tf.agg(F.sum("n").alias("t"))
    probs = tf.crossJoin(F.broadcast(tot)).select(
        "term", F.log(F.col("n") / F.col("t")).alias("logp")
    )
    out = toks.join(F.broadcast(probs), "term").groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_tokens"),
        F.avg("logp").alias("avg_logprob"),
    )
    return track_persisted(out, tf)


def bigram_logprob(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    lam: float = 0.75,
) -> DataFrame:
    """Per-document mean INTERPOLATED bigram log-probability — the next
    rung above :func:`unigram_logprob` on the cheap-LM quality ladder
    (Jelinek-Mercer smoothing):

        score(doc) = avg over bigram positions of
                     ln(lam * c(w1,w2)/c(w1)  +  (1-lam) * c(w2)/T)

    where counts are corpus-wide. The unigram back-off term keeps every
    position finite (any bigram present in a doc has c >= 1 anyway, but
    the mixture is the standard form and what a held-out scorer needs).

    Scale shape: two vocabulary-sized aggregations (unigram + bigram
    counts), then the per-position stream joins both count relations on
    their keys. The joins run as plain equi-joins — Spark broadcasts
    them when the vocab is small and shuffles on the join key when it
    is not; either way nothing wider than (w1, w2) ever shuffles, and
    the final per-doc rollup is a map-side-combinable hash agg.

    The caller should pass pre-normalized text (single-space separated)
    so token positions agree with any external verifier.
    """
    # r15 optimization (guide §2.3/§2.4): ``uni`` previously fed tot /
    # u1 / u2 and ``bg`` fed bc plus the final scoring join as
    # unpersisted sibling subtrees — column pruning defeats exchange
    # reuse, so the corpus was re-tokenized for every branch. Persist
    # the vocabulary-sized unigram relation and the per-doc bigram
    # relation: the corpus is now scanned exactly twice (token pass +
    # bigram pass) regardless of how many statistics derive from them.
    from pyspark.storagelevel import StorageLevel

    ws = df.select(id_col, F.split(F.col(text_col), " ").alias("ws"))
    toks = ws.select(id_col, F.explode("ws").alias("term"))
    uni = (
        toks.groupBy("term")
        .agg(F.count(F.lit(1)).alias("cu"))
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    tot = uni.agg(F.sum("cu").alias("t"))
    bg = ws.filter(F.size("ws") >= 2).select(
        F.col(id_col),
        F.explode(
            F.expr("transform(slice(ws, 1, size(ws) - 1), (w, i) -> struct(w AS w1, ws[i + 1] AS w2))")
        ).alias("p"),
    ).select(id_col, "p.w1", "p.w2")
    cbd = (
        bg.groupBy(id_col, "w1", "w2")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    bc = cbd.groupBy("w1", "w2").agg(F.sum("cnt").alias("cb"))
    u1 = uni.select(F.col("term").alias("w1"), F.col("cu").alias("cu1"))
    u2 = uni.select(F.col("term").alias("w2"), F.col("cu").alias("cu2"))
    # Score each DISTINCT bigram once (all joins here are vocab-sized),
    # then hit the corpus-sized position stream with a single join.
    bigram_logp = (
        bc.join(u1, "w1")
        .join(u2, "w2")
        .crossJoin(F.broadcast(tot))
        .select(
            "w1",
            "w2",
            F.log(
                F.lit(lam) * F.col("cb") / F.col("cu1")
                + F.lit(1.0 - lam) * F.col("cu2") / F.col("t")
            ).alias("logp"),
        )
    )
    # weighted per-doc rollup over the DISTINCT (doc, bigram) relation:
    # identical integers / identical mean (float addition order was
    # already partition-dependent; the oracle rounds to 4 digits).
    scored = cbd.join(bigram_logp, ["w1", "w2"]).select(
        id_col, "cnt", "logp"
    )
    out = scored.groupBy(id_col).agg(
        F.sum("cnt").cast("long").alias("n_bigrams"),
        (F.sum(F.col("cnt") * F.col("logp")) / F.sum("cnt")).alias(
            "avg_logprob"
        ),
    )
    from oakstore_spark.operators.scaling import track_persisted

    return track_persisted(out, uni, cbd)


def redact_pii(col: Column | str) -> Column:
    """Scrub emails then phone numbers into typed placeholders. Both
    patterns are RE2-compatible (no backrefs/lookaround) so the exact
    same regexes run on any engine for verification."""
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_replace(
        F.regexp_replace(c, EMAIL_RE, "<EMAIL>"), PHONE_RE, "<PHONE>"
    )


def balanced_mix_sample(
    df: DataFrame, group_col: str, id_col: str
) -> DataFrame:
    """Deterministically downsample every group to ~the smallest group's
    size: keep a row iff the first 8 hex chars of ``md5(id)`` fall below
    the group's keep-fraction threshold. The threshold string is the
    8-hex-digit form of ``floor(min_count/group_count * 16^8)``, so the
    comparison is a plain string compare on uniformly-distributed hex —
    identical in any engine with md5.

    Kept counts are binomial around the target (not exact) — the price
    of a map-side filter instead of a full per-group rank shuffle."""
    from pyspark.storagelevel import StorageLevel

    from oakstore_spark.operators.scaling import track_persisted

    # r15 optimization (guide §2.3/§2.4): persist the GROUP-universe-
    # sized count relation — the min row and the fraction table both
    # consumed it as unpersisted siblings, each re-scanning the source
    # (3 scans -> 2; the final membership filter must see full rows).
    counts = (
        df.groupBy(group_col)
        .agg(F.count(F.lit(1)).alias("c"))
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    m = counts.agg(F.min("c").alias("m"))
    frac = counts.crossJoin(F.broadcast(m)).select(
        group_col,
        (F.col("m") / F.col("c")).alias("f"),
        F.lpad(
            F.lower(F.hex(F.floor(F.col("m") / F.col("c") * F.lit(4294967296)))),
            8,
            "0",
        ).alias("thr"),
    )
    keyhex = F.substring(
        F.md5(F.encode(F.col(id_col).cast("string"), "UTF-8")), 1, 8
    )
    return track_persisted(
        df.join(F.broadcast(frac), group_col)
        .filter((F.col("f") >= 1.0) | (keyhex < F.col("thr")))
        .drop("f", "thr"),
        counts,
    )


def ks_binned_stat(
    df: DataFrame,
    value_col: str,
    a_col: str,
    b_col: str,
    n_bins: int = 256,
) -> DataFrame:
    """Two-sample KS on a fixed-width binned ECDF — the scale path for
    the exact statistic's global-sort window (same pattern as the
    percentile→KLL sibling). ``a_col``/``b_col`` are 0/1 sample
    indicators over ``value_col``.

    Execution shape at 100 TB: one min/max + count aggregate, one
    corpus hash-agg into ``n_bins`` bins (map-side combinable), then
    the cumulative window runs over the ``n_bins``-row bin table only.
    No corpus sort, no corpus window.

    The binned statistic evaluates |F_a - F_b| exactly at bin RIGHT
    edges (where the binned and true ECDFs coincide), so

        D_binned <= D_exact <= D_binned + max_bin(share_a + share_b)

    — within any bin the true ECDF difference can exceed the edge value
    by at most that bin's mass in either sample. The bound is returned
    as ``max_bin_mass`` so every answer carries its own error bar; the
    bracket is pinned against the exact sibling in pytest.

    NULL values carry no order position, so rows with a null
    ``value_col`` are EXCLUDED from both the counts and the bins (they
    would otherwise land in a NULL bin the cumulative window orders
    first, silently skewing the statistic toward -inf).
    """
    df = df.where(F.col(value_col).isNotNull())
    mm = df.agg(
        F.min(value_col).alias("lo"),
        F.max(value_col).alias("hi"),
        F.sum(a_col).cast("double").alias("na"),
        F.sum(b_col).cast("double").alias("nb"),
    ).collect()[0]
    lo, hi, na, nb = mm["lo"], mm["hi"], mm["na"], mm["nb"]
    if hi is None or not na or not nb:
        raise ValueError(
            "ks_binned_stat requires non-empty samples on both indicators"
        )
    width = (float(hi) - float(lo)) / n_bins
    if not width:
        width = 1.0
    bin_id = F.least(
        F.floor((F.col(value_col) - F.lit(float(lo))) / F.lit(width)),
        F.lit(n_bins - 1),
    )
    binned = df.groupBy(bin_id.alias("bin")).agg(
        F.sum(a_col).alias("ca"), F.sum(b_col).alias("cb")
    )
    w = W.orderBy("bin").rowsBetween(W.unboundedPreceding, 0)
    ecdf = binned.select(
        (F.sum("ca").over(w) / F.lit(na)).alias("fa"),
        (F.sum("cb").over(w) / F.lit(nb)).alias("fb"),
        (F.col("ca") / F.lit(na) + F.col("cb") / F.lit(nb)).alias("mass"),
    )
    return ecdf.agg(
        F.round(F.max(F.abs(F.col("fa") - F.col("fb"))), 6).alias("ks_d"),
        F.lit(int(na)).cast("bigint").alias("n_a"),
        F.lit(int(nb)).cast("bigint").alias("n_b"),
        F.round(F.max("mass"), 6).alias("max_bin_mass"),
    )


def profile_table(df: DataFrame, columns: list[str] | None = None) -> DataFrame:
    """Data-profiling rollup: one row per column with null count, exact
    distinct count, and a value range — numeric columns profile their
    values, timestamps their epoch seconds, strings their lengths (a
    uniform double range for every type).

    ONE aggregation pass computes every metric (a single row of
    2 + 3*n_cols aggregates — partial/final hash agg, no per-column
    scans), then a stack() unpivot emits the long form. At 100 TB this
    is the cheapest complete profile possible: one scan, one exchange
    of a single row. Exact distinct counts make the profile
    oracle-checkable; swap in approx_count_distinct when cardinality
    precision is not needed.
    """
    from pyspark.sql import types as T

    cols = columns or df.columns
    aggs = []
    for c in cols:
        dt = df.schema[c].dataType
        if isinstance(dt, (T.TimestampType, T.TimestampNTZType)):
            v = F.unix_timestamp(F.col(c)).cast("double")
        elif isinstance(dt, T.StringType):
            v = F.length(F.col(c)).cast("double")
        else:
            v = F.col(c).cast("double")
        aggs += [
            F.count(F.when(F.col(c).isNull(), 1)).alias(f"_nn_{c}"),
            F.count_distinct(F.col(c)).alias(f"_nd_{c}"),
            F.min(v).alias(f"_mn_{c}"),
            F.max(v).alias(f"_mx_{c}"),
        ]
    one = df.agg(*aggs)
    stack_expr = ", ".join(
        f"'{c}', _nn_{c}, _nd_{c}, _mn_{c}, _mx_{c}" for c in cols
    )
    return one.select(
        F.expr(
            f"stack({len(cols)}, {stack_expr}) "
            "as (column, n_nulls, n_distinct, vmin, vmax)"
        )
    )


def target_mix_sample(
    df: DataFrame,
    group_col: str,
    id_col: str,
    tokens_col: str,
    targets: dict[str, float],
) -> DataFrame:
    """Deterministic downsampling to a TARGET TOKEN MIXTURE: given
    desired token-share weights per group (e.g. {"en": 0.6, "zh": 0.4}),
    compute per-group keep fractions ``f_g = c * target_g / tokens_g``
    with the largest feasible scale ``c = min_g tokens_g / target_g``
    (so the binding group keeps everything and every other group
    downsamples toward the target proportion), then apply the same
    md5-threshold membership filter as :func:`balanced_mix_sample` —
    map-side, engine-reproducible, no corpus shuffle.

    Kept token counts are binomial around the target shares; groups
    absent from ``targets`` are dropped (weight 0).
    """
    from pyspark.storagelevel import StorageLevel

    from oakstore_spark.operators.scaling import track_persisted

    tgt = F.create_map(
        *[x for kv in targets.items() for x in (F.lit(kv[0]), F.lit(float(kv[1])))]
    )
    # r15 optimization (guide §2.3/§2.4): persist the GROUP-universe-
    # sized token-count relation — the scale factor c and the
    # per-group fraction table both consumed it as unpersisted
    # siblings, each re-scanning the source (and re-evaluating the
    # caller's token_count projection). 3 source scans -> 2: the
    # remaining pair is this aggregate plus the final membership
    # filter, which must see the full rows anyway.
    counts = (
        df.groupBy(group_col)
        .agg(F.sum(tokens_col).cast("double").alias("toks"))
        .withColumn("tgt", tgt[F.col(group_col)])
        .filter(F.col("tgt").isNotNull() & (F.col("tgt") > 0))
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    c = counts.agg(F.min(F.col("toks") / F.col("tgt")).alias("c"))
    frac = counts.crossJoin(F.broadcast(c)).select(
        group_col,
        (F.col("c") * F.col("tgt") / F.col("toks")).alias("f"),
        F.lpad(
            F.lower(
                F.hex(
                    F.floor(F.col("c") * F.col("tgt") / F.col("toks") * F.lit(4294967296))
                )
            ),
            8,
            "0",
        ).alias("thr"),
    )
    keyhex = F.substring(
        F.md5(F.encode(F.col(id_col).cast("string"), "UTF-8")), 1, 8
    )
    return track_persisted(
        df.join(F.broadcast(frac), group_col)
        .filter((F.col("f") >= 1.0) | (keyhex < F.col("thr")))
        .drop("f", "thr"),
        counts,
    )


def filter_with_metrics(df, predicate, metric_cols: dict | None = None):
    """Quality-filter a relation while OBSERVING what was dropped — in
    the SAME pass, with zero extra jobs (Spark's Observation API
    attaches accumulator-backed metrics to the plan; a separate
    count()-before/count()-after costs two more full scans at 100 TB).

    Returns (filtered_df, observation). After the caller runs ANY
    action on filtered_df, ``observation.get`` yields
    {"n_in": rows seen, "n_kept": rows passing, ...} plus one
    ``sum_<name>`` per entry of ``metric_cols`` (a {name: Column}
    of pre-filter quantities to account, e.g. token counts).

    The pipeline-governance primitive: every curation stage reports
    retention without a second scan."""
    from pyspark.sql import Observation

    keep = predicate.cast("int")
    aggs = [
        F.count(F.lit(1)).alias("n_in"),
        F.sum(keep).alias("n_kept"),
    ]
    for name, col in (metric_cols or {}).items():
        aggs.append(F.sum(col).alias(f"sum_{name}"))
    obs = Observation()
    observed = df.observe(obs, *aggs)
    return observed.filter(predicate), obs


def fit_logistic_irls(
    df: DataFrame,
    feature_cols: list[str],
    label_col: str,
    n_iter: int = 8,
    ridge: float = 1e-6,
):
    """In-engine model training: logistic regression fit by distributed
    IRLS (iteratively reweighted least squares) — the model-based
    quality-filter step of a curation pipeline, trained WITHOUT leaving
    Spark or sampling down.

    Per iteration, ONE pass over the data computes the k x k weighted
    Gram matrix X'WX and the k-vector X'Wz as per-row outer products
    summed by Spark's hash aggregate (k = len(features)+1 incl.
    intercept, so the shuffled state is k*(k+1) doubles — independent
    of row count); the driver solves the k x k system. Iterations are
    bounded and data-independent: total cost = n_iter scans. This is
    the same partial-aggregation shape as kmeans_refine and the regr_*
    family — the pattern for ANY fixed-dimension iterative fit at
    100 TB.

    Returns the (k+1,) numpy weight vector [intercept, *coefs].
    """
    import numpy as np

    k = len(feature_cols) + 1
    w = np.zeros(k)
    x_cols = [F.lit(1.0).alias("_x0")] + [
        F.col(c).cast("double").alias(f"_x{i+1}")
        for i, c in enumerate(feature_cols)
    ]
    base = df.select(*x_cols, F.col(label_col).cast("double").alias("_y"))
    xs = [f"_x{i}" for i in range(k)]

    for _ in range(n_iter):
        wb = [float(v) for v in w]
        eta = sum(F.col(xs[i]) * F.lit(wb[i]) for i in range(k))
        mu = F.lit(1.0) / (F.lit(1.0) + F.exp(-eta))
        # clamp so the working weight never degenerates
        mu = F.least(F.greatest(mu, F.lit(1e-10)), F.lit(1.0 - 1e-10))
        wt = mu * (F.lit(1.0) - mu)
        z = eta + (F.col("_y") - mu) / wt
        aggs = []
        for i in range(k):
            for j in range(i, k):
                aggs.append(
                    F.sum(wt * F.col(xs[i]) * F.col(xs[j])).alias(f"g_{i}_{j}")
                )
            aggs.append(F.sum(wt * F.col(xs[i]) * z).alias(f"b_{i}"))
        row = base.agg(*aggs).collect()[0]
        G = np.zeros((k, k))
        b = np.zeros(k)
        for i in range(k):
            for j in range(i, k):
                G[i, j] = G[j, i] = row[f"g_{i}_{j}"]
            b[i] = row[f"b_{i}"]
        w = np.linalg.solve(G + ridge * np.eye(k), b)
    return w


def kneser_ney_logprob(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    discount: float = 0.75,
) -> DataFrame:
    """Per-document mean INTERPOLATED KNESER-NEY bigram
    log-probability (Kneser & Ney 1995 — public; the standard n-gram
    smoothing, a strictly better perplexity filter than the
    Jelinek-Mercer mixture in :func:`bigram_logprob`):

        P(w2|w1) = (max(c(w1,w2) - D, 0)
                    + D * N1+(w1,*) * Pcont(w2)) / c(w1,*)
        Pcont(w2) = N1+(*,w2) / B

    where c(w1,*) is w1's CONTEXT count (bigrams starting with w1 —
    the correct KN denominator, not the raw unigram count),
    N1+(w1,*) / N1+(*,w2) are distinct-continuation counts, and B is
    the number of distinct bigram types. The continuation
    distribution is KN's insight: 'Francisco' is frequent but follows
    almost only 'San', so its back-off weight is tiny.

    Scale shape identical to the JM operator: one bigram-count
    aggregate feeds ALL four statistics (context totals and both
    N1+ counts are vocab-sized rollups of it, B one scalar); each
    DISTINCT bigram is scored once and the corpus-sized position
    stream takes a single join. Every count is an exact integer; the
    float tree is one fused expression mirrored literally by the SQL
    oracle."""
    d = float(discount)
    ws = df.select(id_col, F.split(F.col(text_col), " ").alias("ws"))
    bg = ws.filter(F.size("ws") >= 2).select(
        F.col(id_col),
        F.explode(
            F.expr(
                "transform(slice(ws, 1, size(ws) - 1),"
                " (w, i) -> struct(w AS w1, ws[i + 1] AS w2))"
            )
        ).alias("p"),
    ).select(id_col, "p.w1", "p.w2")
    # r15 optimization (guide §2.3/§2.4): aggregate the corpus-sized
    # bigram stream ONCE to the per-doc bigram relation and persist it;
    # every corpus statistic and the final scoring join derive from it.
    # Previously ``bg`` fed bc and the final join and ``bc`` fed four
    # sibling rollups as unpersisted subtrees — column pruning makes
    # them non-identical, exchange reuse never fires, and the corpus
    # was tokenized+exploded FIVE times (see plans/r15/
    # q_kneser_ney_lm_before.txt: 5 distinct parquet scans -> 1).
    from pyspark.storagelevel import StorageLevel

    cbd = (
        bg.groupBy(id_col, "w1", "w2")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    bc = (
        cbd.groupBy("w1", "w2")
        .agg(F.sum("cnt").alias("cb"))
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    ctx = bc.groupBy("w1").agg(
        F.sum("cb").alias("c1"), F.count(F.lit(1)).alias("n1f")
    )
    cont = bc.groupBy("w2").agg(F.count(F.lit(1)).alias("n1b"))
    btot = bc.agg(F.count(F.lit(1)).alias("bt"))
    bigram_logp = (
        bc.join(ctx, "w1")
        .join(cont, "w2")
        .crossJoin(F.broadcast(btot))
        .select(
            "w1",
            "w2",
            F.log(
                (
                    F.greatest(F.col("cb") - F.lit(d), F.lit(0.0))
                    + (F.lit(d) * F.col("n1f"))
                    * (F.col("n1b") / F.col("bt"))
                )
                / F.col("c1")
            ).alias("logp"),
        )
    )
    # score the per-doc DISTINCT bigram relation weighted by its
    # occurrence count instead of re-streaming every corpus position:
    # n_bigrams = sum(cnt) is the identical integer and
    # sum(cnt*logp)/sum(cnt) the identical mean (float addition order
    # was already partition-dependent; the oracle rounds to 4 digits).
    scored = cbd.join(bigram_logp, ["w1", "w2"]).select(
        id_col, "cnt", "logp"
    )
    out = scored.groupBy(id_col).agg(
        F.sum("cnt").cast("long").alias("n_bigrams"),
        (F.sum(F.col("cnt") * F.col("logp")) / F.sum("cnt")).alias(
            "avg_logprob"
        ),
    )
    from oakstore_spark.operators.scaling import track_persisted

    return track_persisted(out, cbd, bc)


def temperature_mix_sample(
    df: DataFrame,
    group_col: str,
    id_col: str,
    temperature: float = 2.0,
) -> DataFrame:
    """Deterministic TEMPERATURE-scaled mixture resampling (the
    standard multilingual-corpus rebalancing knob, e.g. mBERT/XLM-R
    exponent alpha = 1/T): target share of group g is proportional to
    ``n_g^(1/T)`` — T=1 keeps natural proportions, T→∞ approaches
    uniform, intermediate T lifts low-resource groups without
    flattening the mixture. Keep-rates use the largest feasible scale
    (the binding group keeps everything, exactly like
    :func:`target_mix_sample`), membership is the md5-threshold rule —
    map-side, rerun-stable, no corpus shuffle.

    Verification note: with T=2 the weight is ``sqrt`` — an IEEE
    correctly-rounded operation, so any SQL engine computes the
    bit-identical keep thresholds and the kept SET (not just its
    size) is exactly replayable. General T uses ``pow`` (not
    correctly-rounded by spec) — fine in production, pinned by pytest
    rather than a hash oracle."""
    if temperature <= 0:
        raise ValueError("temperature must be positive")
    from pyspark.storagelevel import StorageLevel

    from oakstore_spark.operators.scaling import track_persisted

    inv_t = 1.0 / float(temperature)
    # r15 optimization: same persist as balanced_mix_sample — the
    # scale row and fraction table share ONE evaluation of the
    # group-count relation instead of two source scans.
    counts = (
        df.groupBy(group_col)
        .agg(F.count(F.lit(1)).cast("double").alias("n"))
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    if abs(temperature - 2.0) < 1e-12:
        w = F.sqrt(F.col("n"))
    else:
        w = F.pow(F.col("n"), F.lit(inv_t))
    weighted = counts.select(group_col, "n", w.alias("w"))
    c = weighted.agg(F.min(F.col("n") / F.col("w")).alias("c"))
    frac = weighted.crossJoin(F.broadcast(c)).select(
        group_col,
        ((F.col("c") * F.col("w")) / F.col("n")).alias("f"),
        F.lpad(
            F.lower(
                F.hex(
                    F.floor(
                        ((F.col("c") * F.col("w")) / F.col("n"))
                        * F.lit(4294967296)
                    )
                )
            ),
            8,
            "0",
        ).alias("thr"),
    )
    keyhex = F.substring(
        F.md5(F.encode(F.col(id_col).cast("string"), "UTF-8")), 1, 8
    )
    return track_persisted(
        df.join(F.broadcast(frac), group_col)
        .filter((F.col("f") >= 1.0) | (keyhex < F.col("thr")))
        .drop("f", "thr"),
        counts,
    )


def pack_sequences(
    df,
    order_col,
    tokens_col: str,
    seq_len: int,
    sums_name: str = "end_tok",
):
    """Concat-and-chunk sequence packing — the GPT-style training
    layout: documents are concatenated in a deterministic order and
    the token stream is cut into fixed ``seq_len`` windows; each doc
    needs to know WHERE its tokens land (which shard/sequence files
    to write it into, whether it straddles a boundary).  Per doc:

        start_tok = global tokens before it   (exclusive prefix sum)
        end_tok   = start_tok + its tokens    (inclusive prefix sum)
        first_seq = start_tok div seq_len
        last_seq  = (end_tok - 1) div seq_len
        n_seqs    = sequences the doc spans (boundary-straddle count)

    Spark shape: the global prefix sum comes from
    :func:`~oakstore_spark.operators.scaling.prefix_sums` (range
    exchange + per-partition offsets — NEVER a SinglePartition
    window), then everything else is map-side integer division —
    exact BIGINT arithmetic end to end, replayable in SQL.

    ``tokens_col`` non-negative integer; zero-token docs carry NULL
    seq fields (they occupy no window) but keep their offsets.  The
    ``order_col`` combination must be unique (the prefix_sums
    contract) — the pack order IS the training order, pin it.

    Returns df's columns + (start_tok, end_tok, first_seq, last_seq,
    n_seqs).
    """
    from pyspark.sql import functions as F

    from .scaling import prefix_sums

    if seq_len < 1:
        raise ValueError("seq_len must be >= 1")
    packed = prefix_sums(
        df, order_col, tokens_col, sum_name=sums_name
    )
    t = F.col(tokens_col).cast("bigint")
    start = (F.col(sums_name) - t).alias("start_tok")
    first = F.expr(f"({sums_name} - {tokens_col}) div {seq_len}")
    last = F.expr(f"({sums_name} - 1) div {seq_len}")
    has = t > 0
    return packed.select(
        "*",
        start,
        F.when(has, first).cast("bigint").alias("first_seq"),
        F.when(has, last).cast("bigint").alias("last_seq"),
        F.when(has, last - first + 1).cast("bigint").alias("n_seqs"),
    )


def group_entropy(
    df,
    keys: list[str],
    cat_col: str,
):
    """Per-key Shannon entropy of a categorical mix — the DIVERSITY
    readout a data-mixing pipeline runs per source/domain/user (is
    this shard all one language? is a user's behavior one note?):

        H(key)    = − Σ_c (n_c/n) · ln(n_c/n)
        H_norm    = H / ln(k_distinct)      (NULL when k < 2)

    H = 0 exactly for a single-category key; H_norm = 1 for a
    perfectly uniform mix.

    Spark shape: ONE hash aggregate to the (key, category) cell
    relation — bounded per key by CATEGORY cardinality (languages,
    sources, event types: the intended use; not for unbounded
    categories) — then per-key totals and a FIXED category-sorted
    fold of p·ln p terms (the power_analysis rule), so every float
    replays.  NULL categories are excluded (no bin), documented.

    Returns keys + (n, k_distinct, entropy, entropy_norm).
    """
    from pyspark.sql import functions as F

    cells = (
        df.where(F.col(cat_col).isNotNull())
        .groupBy(*keys, F.col(cat_col).cast("string").alias("_c"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("_n"))
    )
    tot = cells.groupBy(*keys).agg(
        F.sum("_n").cast("bigint").alias("_tot")
    )
    j = cells.join(tot, list(keys))
    p = F.col("_n").cast("double") / F.col("_tot")
    term = (-(p * F.log(p))).alias("v")
    agg = j.groupBy(*keys).agg(
        F.max("_tot").alias("n"),
        F.count(F.lit(1)).cast("bigint").alias("k_distinct"),
        F.aggregate(
            F.array_sort(
                F.collect_list(F.struct(F.col("_c"), term))
            ),
            F.lit(0.0),
            lambda acc, r: acc + r.getField("v"),
        ).alias("entropy"),
    )
    norm = F.when(
        F.col("k_distinct") >= 2,
        F.col("entropy") / F.log(F.col("k_distinct").cast("double")),
    )
    return agg.select(
        *keys, "n", "k_distinct", "entropy",
        norm.alias("entropy_norm"),
    )


def quantile_normalize(
    df,
    source_col: str,
    value_col: str,
    id_col: str,
):
    """Cross-source quantile normalization — the batch-effect
    corrector (Bolstad et al. 2003, the microarray standard — public)
    for scores that mean different things per source (crawler A's
    quality 0.8 ≠ crawler B's 0.8): map each value onto the POOLED
    distribution at its within-source quantile, so downstream
    thresholds and mixtures compare like with like.

        i        = rank of the row within its source   (1..n_s)
        pos      = ((i−1)·(N−1)) div (n_s−1) + 1       (integer!)
        normalized = pooled value at rank pos          (1..N)

    Everything is EXACT INTEGER arithmetic on ranks — no float
    quantile interpolation — so the mapping replays bit-for-bit and
    is monotone within every source by construction.  A single-row
    source maps to the pooled median position (N+1) div 2.  Ties
    order by (value, id) — deterministic everywhere.

    Spark shape: one keyed window per source (rank + count — one
    exchange), the pooled ranking via
    :func:`~oakstore_spark.operators.scaling.assign_contiguous_ids`
    (range exchange + offsets, never an empty-key window), and ONE
    equi-join on the computed position.  Returns (id, source, value,
    normalized).
    """
    from pyspark.sql import Window as W
    from pyspark.sql import functions as F

    from .scaling import assign_contiguous_ids

    src = F.col(source_col).alias("source")
    prep = df.select(
        F.col(id_col).alias("id"), src, F.col(value_col).alias("value")
    )
    ws = W.partitionBy("source").orderBy("value", "id")
    wsz = W.partitionBy("source")
    ranked = prep.select(
        "id",
        "source",
        "value",
        F.row_number().over(ws).alias("_i"),
        F.count(F.lit(1)).over(wsz).alias("_ns"),
    )
    pooled, n_total = assign_contiguous_ids(
        prep.select("value", "source", "id"),
        [F.col("value"), F.col("source"), F.col("id")],
        id_name="_pos",
        return_total=True,
    )
    pos = F.when(
        F.col("_ns") > 1,
        F.expr(f"((_i - 1) * ({int(n_total)} - 1)) div (_ns - 1)")
        + F.lit(1),
    ).otherwise(F.lit((int(n_total) + 1) // 2))
    lookup = pooled.select(
        F.col("_pos"), F.col("value").alias("normalized")
    )
    return (
        ranked.withColumn("_tpos", pos.cast("bigint"))
        .join(lookup, F.col("_tpos") == F.col("_pos"))
        .select("id", "source", "value", "normalized")
    )
