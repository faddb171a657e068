"""r6 text-processing queries: Cavnar-Trenkle language ID, C4-style
corpus line dedup, HTML main-content extraction — each oracle-checked.

Oracle styles:
- ``q_langid_ct`` is a planted-recovery oracle: every doc carries two
  seed sentences of a known language, so the classifier's output must
  equal the closed-form planted label for every row (any bug in trigram
  extraction, ranking, the out-of-place distance, or the argmin flips
  at least one label and breaks the hash).
- ``q_line_dedup`` and ``q_html_extract`` plant their inputs in closed
  form from doc_id, so the EXPECTED full output (reassembled text /
  extracted text) is itself closed-form SQL — exact end-to-end hashes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from oakstore_spark.operators.langid import (
    SEED_SENTENCES,
    classify_lang,
    seed_corpus,
    train_lang_profiles,
)
from oakstore_spark.queries import register
from oakstore_spark.sources import table

_LANGS = sorted(SEED_SENTENCES)  # de, en, es, fr, it, pt


def _langid_case_sql() -> str:
    whens = " ".join(
        f"WHEN {i} THEN '{lang}'" for i, lang in enumerate(_LANGS)
    )
    return f"CASE CAST(doc_id % 6 AS INT) {whens} END"


@register(
    "q_langid_ct",
    oracle=f"""
    SELECT doc_id, {_langid_case_sql()} AS pred_lang
    FROM documents
    """,
)
def q_langid_ct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Character-trigram language ID (Cavnar-Trenkle) end-to-end:
    train rank profiles on the built-in 6-language seed corpus
    (distributed groupBy + per-lang window over the aggregated grams),
    then classify planted documents — doc_id % 6 picks the language,
    (doc_id // 6) % 8 rotates which two seed sentences the doc carries.
    The oracle is the closed-form planted label: the classifier must
    get EVERY document right, deterministically (tie order pinned by
    (distance, lang) struct min). All JVM built-ins; the only shuffles
    are the trigram count and the doc-id window."""
    d = table(spark, sf_dir, "documents").select("doc_id")
    combos = spark.createDataFrame(
        [
            (li, ri, f"{sents[ri]} {sents[(ri + 3) % 8]}")
            for li, lang in enumerate(_LANGS)
            for sents in [SEED_SENTENCES[lang]]
            for ri in range(8)
        ],
        "lang_idx int, rot int, text string",
    )
    planted = d.join(
        F.broadcast(combos),
        ((F.col("doc_id") % 6).cast("int") == F.col("lang_idx"))
        & (((F.col("doc_id") / 6).cast("long") % 8).cast("int") == F.col("rot")),
    ).select("doc_id", "text")
    profiles = train_lang_profiles(seed_corpus(spark))
    out = classify_lang(planted, profiles)
    return out.select("doc_id", "pred_lang")


def _seed_values_sql() -> str:
    """The built-in seed corpus as a SQL VALUES list (lang, idx, text)
    — generated from SEED_SENTENCES itself so the oracle can never
    drift from the corpus the Spark side trains on."""
    rows = []
    for lang in _LANGS:
        for i, s in enumerate(SEED_SENTENCES[lang]):
            rows.append(f"('{lang}', {i}, '{s.replace(chr(39), chr(39) * 2)}')")
    return ",\n      ".join(rows)


def _langid_margin_oracle() -> str:
    """FULL SQL replay of the Cavnar-Trenkle pipeline — training,
    doc ranking, out-of-place distances, argmin + runner-up — so the
    margin comes out exact, not planted. ASCII-only corpus keeps the
    [^a-z] normalization and binary string ordering engine-identical."""
    return f"""
    WITH seeds(lang, idx, text) AS (VALUES
      {_seed_values_sql()}
    ),
    langs AS (SELECT DISTINCT lang FROM seeds),
    norm AS (
      SELECT lang,
             ' ' || trim(regexp_replace(text, '[^a-z]+', ' ', 'g')) || ' '
               AS s
      FROM seeds
    ),
    sgrams AS (
      SELECT lang, substr(s, CAST(i.i AS INT), 3) AS gram
      FROM norm, LATERAL (SELECT unnest(range(1, len(s) - 1)) AS i) i
      WHERE len(s) >= 3
    ),
    prof AS (
      SELECT * FROM (
        SELECT lang, gram,
               row_number() OVER (
                 PARTITION BY lang ORDER BY count(*) DESC, gram
               ) AS rank
        FROM sgrams GROUP BY lang, gram
      ) WHERE rank <= 300
    ),
    pen AS (SELECT CAST(max(rank) AS INT) AS p FROM prof),
    combos AS (
      SELECT l.li, r.ri, a.text || ' ' || b.text AS text
      FROM (SELECT lang, row_number() OVER (ORDER BY lang) - 1 AS li
            FROM langs) l
      CROSS JOIN range(8) r(ri)
      JOIN seeds a ON a.lang = l.lang AND a.idx = r.ri
      JOIN seeds b ON b.lang = l.lang AND b.idx = (r.ri + 3) % 8
    ),
    cnorm AS (
      SELECT li, ri,
             ' ' || trim(regexp_replace(text, '[^a-z]+', ' ', 'g')) || ' '
               AS s
      FROM combos
    ),
    cgrams AS (
      SELECT li, ri, substr(s, CAST(i.i AS INT), 3) AS gram,
             count(*) AS n
      FROM cnorm, LATERAL (SELECT unnest(range(1, len(s) - 1)) AS i) i
      GROUP BY 1, 2, 3
    ),
    cranked AS (
      SELECT * FROM (
        SELECT li, ri, gram,
               row_number() OVER (
                 PARTITION BY li, ri ORDER BY n DESC, gram
               ) AS doc_rank
        FROM cgrams
      ) WHERE doc_rank <= 300
    ),
    scored AS (
      SELECT c.li, c.ri, lg.lang,
             CAST(sum(coalesce(abs(c.doc_rank - p.rank),
                               (SELECT p FROM pen))) AS BIGINT) AS oop
      FROM cranked c
      CROSS JOIN langs lg
      LEFT JOIN prof p ON p.lang = lg.lang AND p.gram = c.gram
      GROUP BY 1, 2, 3
    ),
    ranked AS (
      SELECT li, ri, lang, oop,
             row_number() OVER (
               PARTITION BY li, ri ORDER BY oop, lang
             ) AS rn
      FROM scored
    ),
    combo_out AS (
      SELECT b.li, b.ri, b.lang AS pred_lang, b.oop AS oop_distance,
             r.lang AS runner_up_lang, r.oop - b.oop AS margin
      FROM ranked b
      JOIN ranked r ON r.li = b.li AND r.ri = b.ri AND r.rn = 2
      WHERE b.rn = 1
    )
    SELECT d.doc_id, o.pred_lang, o.oop_distance, o.runner_up_lang,
           o.margin
    FROM documents d
    JOIN combo_out o
      ON o.li = d.doc_id % 6 AND o.ri = (d.doc_id // 6) % 8
    """


@register("q_langid_margin", oracle=_langid_margin_oracle())
def q_langid_margin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language-ID CONFIDENCE: the exact integer out-of-place margin
    between the best and runner-up language for every planted doc —
    the column a curation filter gates on ("keep if en with margin >
    x"). Unlike q_langid_ct's planted-label oracle, this one replays
    the ENTIRE Cavnar-Trenkle pipeline in SQL (profile training, doc
    trigram ranking, penalty default, distance sums, argmin and
    runner-up tie-breaks), so every one of the five output columns is
    value-exact — a drifted rank, penalty, or tie order anywhere flips
    a margin and breaks the hash."""
    d = table(spark, sf_dir, "documents").select("doc_id")
    combos = spark.createDataFrame(
        [
            (li, ri, f"{sents[ri]} {sents[(ri + 3) % 8]}")
            for li, lang in enumerate(_LANGS)
            for sents in [SEED_SENTENCES[lang]]
            for ri in range(8)
        ],
        "lang_idx int, rot int, text string",
    )
    planted = d.join(
        F.broadcast(combos),
        ((F.col("doc_id") % 6).cast("int") == F.col("lang_idx"))
        & (((F.col("doc_id") / 6).cast("long") % 8).cast("int") == F.col("rot")),
    ).select("doc_id", "text")
    profiles = train_lang_profiles(seed_corpus(spark))
    return classify_lang(planted, profiles)


@register(
    "q_line_dedup",
    oracle="""
    WITH m AS (SELECT min(doc_id) AS mn FROM documents),
    g AS (
      SELECT doc_id % 7 AS grp, min(doc_id) AS gmn
      FROM documents GROUP BY doc_id % 7
    )
    SELECT d.doc_id,
           concat_ws(chr(10),
             CASE WHEN d.doc_id = m.mn
                  THEN 'accept cookies to continue reading this site' END,
             'document ' || d.doc_id || ' carries its own unique line',
             '',
             CASE WHEN d.doc_id = g.gmn
                  THEN 'section banner number ' || (d.doc_id % 7) END
           ) AS clean_text,
           CAST(4 AS BIGINT) AS n_lines,
           CAST(2 + CASE WHEN d.doc_id = m.mn THEN 1 ELSE 0 END
                  + CASE WHEN d.doc_id = g.gmn THEN 1 ELSE 0 END
                AS BIGINT) AS n_kept
    FROM documents d
    CROSS JOIN m
    JOIN g ON d.doc_id % 7 = g.grp
    """,
)
def q_line_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4-style corpus LINE dedup end-to-end: every doc is planted as
    4 lines — a cookie banner shared by ALL docs, a unique line, a
    blank line, and a section banner shared within its doc_id % 7
    group. ``line_dedup_corpus`` must keep the banners only at their
    global first occurrences (min doc_id overall / min doc_id of the
    group), always keep blank and unique lines, and reassemble in
    original order — the oracle states the surviving text in closed
    form, so a wrong keeper rule, a lost blank line, or an out-of-order
    reassembly each break the hash."""
    from oakstore_spark.operators.dedup import line_dedup_corpus

    d = table(spark, sf_dir, "documents").select("doc_id")
    planted = d.select(
        "doc_id",
        F.concat_ws(
            "\n",
            F.lit("accept cookies to continue reading this site"),
            F.concat(
                F.lit("document "),
                F.col("doc_id").cast("string"),
                F.lit(" carries its own unique line"),
            ),
            F.lit(""),
            F.concat(
                F.lit("section banner number "),
                (F.col("doc_id") % 7).cast("string"),
            ),
        ).alias("text"),
    )
    return line_dedup_corpus(planted)


@register(
    "q_html_extract",
    oracle="""
    SELECT doc_id,
           'Document ' || doc_id || ' explains extraction & scoring of'
             || ' planted content blocks in detail.'
             || chr(10)
             || 'The second paragraph of document ' || doc_id
             || ' adds more than thirty characters of prose.'
             AS main_text,
           CAST(2 AS INT) AS n_blocks_kept
    FROM documents
    """,
)
def q_html_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HTML boilerplate removal end-to-end: each doc becomes a full
    page — script + style heads, an all-links nav, two >=30-char
    content paragraphs (one with an ``&amp;`` entity), for odd docs an
    extra link-dominated div, and an all-links footer.
    ``extract_main_text`` must drop nav/footer/link-div (link density),
    drop script/style wholesale, decode the entity, and keep exactly
    the two planted paragraphs joined by a newline — stated closed-form
    by the oracle."""
    from oakstore_spark.operators.html import extract_main_text

    d = table(spark, sf_dir, "documents").select("doc_id")
    sid = F.col("doc_id").cast("string")
    page = F.concat(
        F.lit(
            "<html><head><script>var nav = \"<p>decoy</p>\";</script>"
            "<style>p { margin: 0 }</style></head><body>"
            "<nav><a href=\"/\">Home page</a> <a href=\"/faq\">Questions"
            "</a> <a href=\"/more\">More links</a></nav><p>Document "
        ),
        sid,
        F.lit(
            " explains extraction &amp; scoring of planted content"
            " blocks in detail.</p>"
        ),
        F.when(
            F.col("doc_id") % 2 == 1,
            F.lit(
                "<div><a href=\"/a\">first link</a> and <a href=\"/b\">"
                "second link</a> plus <a href=\"/c\">third link here</a>"
                " glue</div>"
            ),
        ).otherwise(F.lit("")),
        F.lit("<p>The second paragraph of document "),
        sid,
        F.lit(
            " adds more than thirty characters of prose.</p>"
            "<footer><a href=\"/tos\">Terms of service</a>"
            " <a href=\"/privacy\">Privacy notice</a></footer>"
            "</body></html>"
        ),
    )
    planted = d.select("doc_id", page.alias("html"))
    out = extract_main_text(planted)
    return out.select("doc_id", "main_text", "n_blocks_kept")


@register(
    "q_url_normalize",
    oracle="""
    SELECT doc_id,
           CASE WHEN doc_id % 2 = 0 THEN
             'http://example' || CAST(doc_id % 23 AS VARCHAR)
               || '.co.uk/Path' || CAST(doc_id % 5 AS VARCHAR)
               || '?a=1&b=' || CAST(doc_id % 9 AS VARCHAR)
           ELSE
             'https://site' || CAST(doc_id % 23 AS VARCHAR)
               || '.company.com/deep/page?y=8&z=9'
           END AS norm_url,
           CASE WHEN doc_id % 2 = 0 THEN
             'example' || CAST(doc_id % 23 AS VARCHAR) || '.co.uk'
           ELSE 'company.com' END AS reg_domain
    FROM documents
    """,
)
def q_url_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL canonicalization under a planted closed-form oracle: even
    docs carry an uppercase-scheme www-prefixed co.uk URL with a
    default :80 port, a trailing slash, a tracking param and a
    fragment; odd docs carry a :443 https URL with unsorted params and
    a ref tracker. The normalizer must lowercase, strip www/default
    ports/fragments/trackers, drop the trailing slash, and SORT the
    surviving params — each expected string is stated literally, so a
    single wrong character in any rule breaks the hash. The registered
    domain must apply the two-level-suffix rule (co.uk -> three
    labels, plain .com -> two)."""
    from oakstore_spark.operators.urls import (
        normalize_url,
        registered_domain,
        url_parts,
    )

    d = table(spark, sf_dir, "documents").select("doc_id")
    k = (F.col("doc_id") % 23).cast("string")
    planted = d.select(
        "doc_id",
        F.when(
            F.col("doc_id") % 2 == 0,
            F.concat(
                F.lit("HTTP://WWW.Example"), k, F.lit(".CO.UK:80/Path"),
                (F.col("doc_id") % 5).cast("string"),
                F.lit("/?utm_source=x&b="),
                (F.col("doc_id") % 9).cast("string"),
                F.lit("&a=1#frag"),
            ),
        ).otherwise(
            F.concat(
                F.lit("HTTPS://Site"), k,
                F.lit(".ComPany.com:443/deep/page/?ref=h&z=9&y=8#x"),
            )
        ).alias("url"),
    )
    return planted.select(
        "doc_id",
        normalize_url("url").alias("norm_url"),
        registered_domain(url_parts("url")["host"]).alias("reg_domain"),
    )


@register(
    "q_url_domain_stats",
    oracle="""
    WITH pages AS (
      SELECT doc_id,
             CASE WHEN doc_id % 2 = 0 THEN
               'example' || CAST(doc_id % 23 AS VARCHAR) || '.co.uk'
             ELSE 'company.com' END AS reg_domain,
             CASE WHEN doc_id % 2 = 0 THEN
               'http://example' || CAST(doc_id % 23 AS VARCHAR)
                 || '.co.uk/Path' || CAST(doc_id % 5 AS VARCHAR)
                 || '?a=1&b=' || CAST(doc_id % 9 AS VARCHAR)
             ELSE
               'https://site' || CAST(doc_id % 23 AS VARCHAR)
                 || '.company.com/deep/page?y=8&z=9'
             END AS norm_url
      FROM documents
      WHERE NOT (doc_id % 2 = 0 AND doc_id % 23 % 5 = 0)
    )
    SELECT reg_domain,
           CAST(count(*) AS BIGINT) AS n_pages,
           CAST(count(DISTINCT norm_url) AS BIGINT) AS n_urls,
           CAST(sum(doc_id) AS BIGINT) AS id_checksum
    FROM pages GROUP BY reg_domain
    """,
)
def q_url_domain_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Domain-level curation chain: the planted URLs from
    q_url_normalize flow through the BROADCAST blocklist anti-join
    (co.uk domains with k % 5 == 0 are banned) and the per-registered-
    domain rollup (count, DISTINCT canonical URLs, id checksum). The
    oracle recomputes the surviving set and its aggregates in closed
    form — a wrong anti-join, a miscanonicalized URL collapsing two
    distinct pages, or a domain-rule slip each diverge."""
    from oakstore_spark.operators.urls import (
        domain_stats,
        filter_blocklisted,
    )

    d = table(spark, sf_dir, "documents").select("doc_id")
    k = (F.col("doc_id") % 23).cast("string")
    planted = d.select(
        "doc_id",
        F.when(
            F.col("doc_id") % 2 == 0,
            F.concat(
                F.lit("HTTP://WWW.Example"), k, F.lit(".CO.UK:80/Path"),
                (F.col("doc_id") % 5).cast("string"),
                F.lit("/?utm_source=x&b="),
                (F.col("doc_id") % 9).cast("string"),
                F.lit("&a=1#frag"),
            ),
        ).otherwise(
            F.concat(
                F.lit("HTTPS://Site"), k,
                F.lit(".ComPany.com:443/deep/page/?ref=h&z=9&y=8#x"),
            )
        ).alias("url"),
    )
    blocklist = spark.createDataFrame(
        [(f"example{k}.co.uk",) for k in range(0, 23, 5)],
        "reg_domain string",
    )
    kept = filter_blocklisted(planted, blocklist, "url")
    return domain_stats(kept, "url", "doc_id")


@register(
    "q_readability",
    oracle="""
    WITH aug AS (
      SELECT doc_id,
             text || ' It reads twice! Done.' AS t
      FROM documents
    ), counted AS (
      SELECT doc_id,
             len(regexp_extract_all(lower(t), '[a-z]+')) AS n_words,
             list_sum(list_transform(
               regexp_extract_all(lower(t), '[a-z]+'),
               w -> greatest(1, len(regexp_extract_all(w, '[aeiouy]+')))
             )) AS n_syll,
             greatest(1, len(regexp_extract_all(lower(t), '[.!?]+')))
               AS n_sent
      FROM aug
    )
    SELECT doc_id,
           CAST(n_words AS INT) AS n_words,
           CAST(n_syll AS INT) AS n_syllables,
           CAST(n_sent AS INT) AS n_sentences,
           CAST(41367 * n_sent * n_words - 203 * n_words * n_words
                - 16920 * n_syll * n_sent AS DOUBLE)
             / (200 * n_sent * n_words) AS flesch,
           CAST(39 * n_words * n_words + 1180 * n_syll * n_sent
                - 1559 * n_sent * n_words AS DOUBLE)
             / (100 * n_sent * n_words) AS fk_grade
    FROM counted
    """,
)
def q_readability(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flesch / Flesch-Kincaid over the REAL corpus text (plus a
    planted two-sentence tail so the sentence counter has boundaries
    to find): the oracle reruns the identical regexp word/syllable/
    sentence definitions in DuckDB and the pinned-association float
    formulas — word splitting, vowel-group counting, the min-1 floors,
    and both divisions must agree to the last bit (round(4) + signed-
    zero normalization per the parity rules)."""
    from oakstore_spark.operators.text import readability

    d = table(spark, sf_dir, "documents").select(
        "doc_id",
        F.concat(F.col("text"), F.lit(" It reads twice! Done.")).alias("text"),
    )
    out = readability(d)
    return out.select(
        "doc_id", "n_words", "n_syllables", "n_sentences", "flesch", "fk_grade"
    )


@register(
    "q_chat_stats",
    oracle="""
    WITH p AS (
      SELECT doc_id,
             CAST(doc_id % 3 + 2 AS INT) AS L,
             doc_id % 5 = 0 AS viol,
             CAST(doc_id AS VARCHAR) AS sid,
             length(CAST(doc_id AS VARCHAR)) AS d
      FROM documents
    )
    SELECT doc_id,
           '<|user|>hello ' || sid || chr(10)
             || '<|' || CASE WHEN viol THEN 'user' ELSE 'assistant' END
             || '|>hi ' || sid
             || CASE WHEN L >= 3
                     THEN chr(10) || '<|user|>more ' || sid ELSE '' END
             || CASE WHEN L = 4
                     THEN chr(10) || '<|assistant|>done ' || sid
                     ELSE '' END AS flat_text,
           L AS n_turns,
           CAST(CASE WHEN viol THEN CASE WHEN L = 2 THEN 2 ELSE 3 END
                     ELSE CASE WHEN L >= 3 THEN 2 ELSE 1 END
                END AS INT) AS n_user,
           CAST(L - CASE WHEN viol THEN CASE WHEN L = 2 THEN 2 ELSE 3 END
                         ELSE CASE WHEN L >= 3 THEN 2 ELSE 1 END
                    END AS INT) AS n_assistant,
           TRUE AS starts_with_user,
           NOT viol AS alternating,
           CAST(CASE WHEN viol THEN CASE WHEN L = 4 THEN 5 + d ELSE 0 END
                     ELSE 3 + d + CASE WHEN L = 4 THEN 5 + d ELSE 0 END
                END AS BIGINT) AS assistant_chars,
           CAST(CASE L WHEN 2 THEN 9 + 2 * d
                       WHEN 3 THEN 14 + 3 * d
                       ELSE 19 + 4 * d END AS BIGINT) AS total_chars,
           CAST(CASE WHEN viol THEN CASE WHEN L = 4 THEN 5 + d ELSE 0 END
                     ELSE 3 + d + CASE WHEN L = 4 THEN 5 + d ELSE 0 END
                END AS DOUBLE)
             / CASE L WHEN 2 THEN 9 + 2 * d
                      WHEN 3 THEN 14 + 3 * d
                      ELSE 19 + 4 * d END AS assistant_share
    FROM p
    """,
)
def q_chat_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conversation operators end-to-end over planted chats: doc_id
    picks the turn count (2-4, sliced from a 4-turn template) and
    every 5th doc carries a role-alternation VIOLATION (two user turns
    in a row). The flattened training text, all structural counts, the
    alternation flag, and the assistant char share (one IEEE division
    of exact integers) are stated closed-form by the oracle — a wrong
    slice, a missed violation, or a char-count drift each break the
    hash."""
    from oakstore_spark.operators.chat import (
        conversation_stats,
        flatten_conversation,
    )

    d = table(spark, sf_dir, "documents").select("doc_id")
    sid = F.col("doc_id").cast("string")
    viol = F.col("doc_id") % 5 == 0
    base = F.array(
        F.struct(
            F.lit("user").alias("role"),
            F.concat(F.lit("hello "), sid).alias("content"),
        ),
        F.struct(
            F.when(viol, F.lit("user")).otherwise(F.lit("assistant"))
            .alias("role"),
            F.concat(F.lit("hi "), sid).alias("content"),
        ),
        F.struct(
            F.lit("user").alias("role"),
            F.concat(F.lit("more "), sid).alias("content"),
        ),
        F.struct(
            F.lit("assistant").alias("role"),
            F.concat(F.lit("done "), sid).alias("content"),
        ),
    )
    n_turns = (F.col("doc_id") % 3 + 2).cast("int")
    planted = d.select(
        "doc_id", F.slice(base, 1, n_turns).alias("turns")
    )
    stats = conversation_stats(planted)
    flat = planted.select(
        "doc_id", flatten_conversation("turns").alias("flat_text")
    )
    return flat.join(stats, "doc_id").select(
        "doc_id", "flat_text", "n_turns", "n_user", "n_assistant",
        "starts_with_user", "alternating", "assistant_chars",
        "total_chars", "assistant_share",
    )


@register(
    "q_web_curation_e2e",
    oracle="""
    WITH m AS (SELECT min(doc_id) AS mn FROM documents)
    SELECT d.doc_id,
           'Contact <EMAIL> to learn more about document '
             || CAST(d.doc_id AS VARCHAR) || ' today.'
             || CASE WHEN d.doc_id = m.mn
                     THEN chr(10) || 'Subscribe to our newsletter for'
                          || ' updates and exclusive offers today.'
                     ELSE '' END AS final_text,
           CAST(2 AS BIGINT) AS n_lines,
           CAST(1 + CASE WHEN d.doc_id = m.mn THEN 1 ELSE 0 END
                AS BIGINT) AS n_kept
    FROM documents d CROSS JOIN m
    """,
)
def q_web_curation_e2e(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The WEB-CURATION pipeline as one cross-operator canary (the
    text analog of q_media_curation_e2e): every doc becomes a full
    HTML page (link-heavy nav/footer, a unique paragraph carrying a
    planted email, and a newsletter boilerplate paragraph shared by
    EVERY page). The chain extract_main_text -> line_dedup_corpus ->
    redact_pii_all must drop the nav/footer by link density, keep both
    content paragraphs, dedup the boilerplate line to the single
    global first occurrence (min doc_id), and scrub the email — the
    oracle states the final text of every document in closed form, so
    a regression in ANY stage (or in how their outputs compose)
    breaks the hash."""
    from oakstore_spark.operators.dedup import line_dedup_corpus
    from oakstore_spark.operators.html import extract_main_text
    from oakstore_spark.operators.pii import redact_pii_all

    d = table(spark, sf_dir, "documents").select("doc_id")
    sid = F.col("doc_id").cast("string")
    page = F.concat(
        F.lit(
            "<html><body><nav><a href=\"/\">Home page</a> "
            "<a href=\"/faq\">Questions here</a> "
            "<a href=\"/more\">More links</a></nav><p>Contact admin"
        ),
        sid,
        F.lit("@example.com to learn more about document "),
        sid,
        F.lit(
            " today.</p><p>Subscribe to our newsletter for updates"
            " and exclusive offers today.</p>"
            "<footer><a href=\"/tos\">Terms of service</a> "
            "<a href=\"/privacy\">Privacy notice</a></footer>"
            "</body></html>"
        ),
    )
    extracted = extract_main_text(
        d.select("doc_id", page.alias("html"))
    ).select("doc_id", F.col("main_text").alias("text"))
    deduped = line_dedup_corpus(extracted)
    return deduped.select(
        "doc_id",
        redact_pii_all("clean_text").alias("final_text"),
        "n_lines",
        "n_kept",
    )


@register(
    "q_dpo_pairs",
    oracle="""
    WITH resp AS (
      SELECT doc_id % 40 AS prompt_id, doc_id AS resp_id,
             (doc_id * 7) % 23 AS score
      FROM documents
    ), ranked AS (
      SELECT *,
        row_number() OVER (PARTITION BY prompt_id
                           ORDER BY score DESC, resp_id) AS rc,
        row_number() OVER (PARTITION BY prompt_id
                           ORDER BY score, resp_id) AS rr,
        count(*) OVER (PARTITION BY prompt_id) AS n
      FROM resp
    )
    SELECT CAST(prompt_id AS BIGINT) AS prompt_id,
           CAST(max(n) AS BIGINT) AS n_responses,
           CAST(max(CASE WHEN rc = 1 THEN resp_id END) AS BIGINT)
             AS chosen_id,
           CAST(max(CASE WHEN rc = 1 THEN score END) AS BIGINT)
             AS chosen_score,
           CAST(max(CASE WHEN rr = 1 THEN resp_id END) AS BIGINT)
             AS rejected_id,
           CAST(max(CASE WHEN rr = 1 THEN score END) AS BIGINT)
             AS rejected_score,
           CAST(max(CASE WHEN rc = 1 THEN score END)
                - max(CASE WHEN rr = 1 THEN score END) AS BIGINT)
             AS margin
    FROM ranked
    GROUP BY prompt_id
    HAVING max(n) >= 2
       AND max(CASE WHEN rc = 1 THEN score END)
           - max(CASE WHEN rr = 1 THEN score END) > 0
    ORDER BY prompt_id
    """,
)
def q_dpo_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DPO preference-pair construction over planted scored responses
    (prompt = doc_id % 40, score = (doc_id*7) % 23 — at sf0.1 the
    modular structure plants real score TIES, so the pinned
    smallest-id tie-breaks are load-bearing): one max_by/min_by hash
    aggregate elects (chosen, rejected) per prompt; the oracle replays
    the election with two ranking windows. Exact integer scores and
    margins end to end."""
    from oakstore_spark.operators.chat import preference_pairs

    d = table(spark, sf_dir, "documents")
    resp = d.select(
        (F.col("doc_id") % 40).alias("prompt_id"),
        F.col("doc_id").alias("resp_id"),
        ((F.col("doc_id") * 7) % 23).alias("score"),
    )
    return preference_pairs(resp).orderBy("prompt_id")


@register(
    "q_boilerplate_strip",
    oracle="""
    WITH pages AS (
      SELECT doc_id, doc_id % 10 AS domain, doc_id % 4 < 2 AS promo
      FROM documents
    ), npages AS (
      SELECT domain, count(*) AS np FROM pages GROUP BY 1
    ), lines AS (
      SELECT doc_id, domain, 0 AS pos,
             'nav ' || CAST(domain AS VARCHAR) AS line FROM pages
      UNION ALL
      SELECT doc_id, domain, 1, 'body ' || CAST(doc_id AS VARCHAR)
      FROM pages
      UNION ALL
      SELECT doc_id, domain, 2, 'promo ' || CAST(domain AS VARCHAR)
      FROM pages WHERE promo
      UNION ALL
      SELECT doc_id, domain, 3, 'footer' FROM pages
    ), cnt AS (
      SELECT domain, line, count(DISTINCT doc_id) AS c
      FROM lines GROUP BY 1, 2
    ), boiler AS (
      SELECT cnt.domain, cnt.line
      FROM cnt JOIN npages ON cnt.domain = npages.domain
      WHERE 100 * c >= 50 * np AND c >= 2
    ), kept AS (
      SELECT l.doc_id, l.domain, l.pos, l.line
      FROM lines l LEFT JOIN boiler b
        ON l.domain = b.domain AND l.line = b.line
      WHERE b.line IS NULL
    )
    SELECT p.doc_id,
           CAST(p.domain AS BIGINT) AS domain,
           COALESCE(string_agg(k.line, chr(10) ORDER BY k.pos), '')
             AS clean_text,
           CAST(CASE WHEN p.promo THEN 4 ELSE 3 END AS BIGINT)
             AS n_lines,
           CAST(count(k.line) AS BIGINT) AS n_kept
    FROM pages p LEFT JOIN kept k ON p.doc_id = k.doc_id
    GROUP BY p.doc_id, p.domain, p.promo
    ORDER BY p.doc_id
    """,
)
def q_boilerplate_strip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-domain template removal over planted pages: every page of
    domain (doc_id % 10) carries a nav line and a footer (on 100% of
    the domain's pages -> cut EVERYWHERE, no keeper), a unique body
    line (kept), and a 'promo' line on exactly the half of pages with
    the qualifying residue — sitting right ON the 50% threshold, where
    the integer comparison (100*c >= 50*np) decides identically in
    both engines. The oracle rebuilds the whole pipeline: counts,
    threshold, removal, ordered reassembly."""
    from oakstore_spark.operators.dedup import domain_boilerplate_strip

    d = table(spark, sf_dir, "documents")
    dom = (F.col("doc_id") % 10).alias("domain")
    promo = F.col("doc_id") % 4 < 2
    text = F.concat_ws(
        "\n",
        F.concat(F.lit("nav "), F.col("domain").cast("string")),
        F.concat(F.lit("body "), F.col("doc_id").cast("string")),
        F.when(
            promo,
            F.concat(F.lit("promo "), F.col("domain").cast("string")),
        ),
        F.lit("footer"),
    )
    pages = d.select("doc_id", dom).select(
        "doc_id", "domain", text.alias("text")
    )
    return domain_boilerplate_strip(pages).orderBy("doc_id")


@register(
    "q_mojibake_fix",
    oracle="""
    SELECT doc_id,
           CASE WHEN doc_id % 3 = 0
                THEN 'café ' || CAST(doc_id AS VARCHAR)
                WHEN doc_id % 3 = 1
                THEN 'naïve ' || CAST(doc_id AS VARCHAR)
                ELSE 'plain ' || CAST(doc_id AS VARCHAR)
           END AS fixed,
           doc_id % 3 = 0 AS was_mojibake
    FROM documents
    ORDER BY doc_id
    """,
)
def q_mojibake_fix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Encoding hygiene end-to-end: a third of the planted rows are
    DOUBLE-ENCODED in-engine (the real corruption: UTF-8 bytes of
    'café N' re-decoded as Latin-1 -> 'cafÃ© N'), a third are genuine
    single-encoded Latin-1-range text ('naïve N' — the classic false
    positive: its 0xEF byte is NOT valid UTF-8 structure, so it must
    pass through untouched), a third pure ASCII. fix_mojibake must
    repair exactly the corrupted third back to the closed-form
    original the oracle states."""
    from oakstore_spark.operators.text import fix_mojibake

    d = table(spark, sf_dir, "documents")
    sid = F.col("doc_id").cast("string")
    clean = F.concat(F.lit("café "), sid)
    corrupted = F.decode(F.encode(clean, "UTF-8"), "ISO-8859-1")
    text = (
        F.when(F.col("doc_id") % 3 == 0, corrupted)
        .when(F.col("doc_id") % 3 == 1, F.concat(F.lit("naïve "), sid))
        .otherwise(F.concat(F.lit("plain "), sid))
    )
    rows = d.select("doc_id", text.alias("text"))
    return fix_mojibake(rows).orderBy("doc_id")


@register(
    "q_robots_filter",
    oracle="""
    SELECT doc_id,
           'http://' || CASE WHEN doc_id % 2 = 0 THEN 'a' ELSE 'b' END
             || '.test'
             || CASE doc_id % 5
                  WHEN 0 THEN '/private/x' || CAST(doc_id AS VARCHAR)
                  WHEN 1 THEN '/private/pub/x' || CAST(doc_id AS VARCHAR)
                  WHEN 2 THEN '/open/x' || CAST(doc_id AS VARCHAR)
                  WHEN 3 THEN '/files/doc' || CAST(doc_id AS VARCHAR)
                              || '.pdf'
                  ELSE '/files/doc' || CAST(doc_id AS VARCHAR)
                       || '.pdfx' END AS url,
           doc_id % 2 = 0 AND doc_id % 5 IN (1, 2, 4) AS allowed
    FROM documents
    ORDER BY doc_id
    """,
)
def q_robots_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFC 9309 crawl-politeness end-to-end: domain a.test's robots
    exercise longest-match precedence (Disallow /private beaten by the
    longer Allow /private/pub), wildcard+anchor rules (/*.pdf$ blocks
    .pdf but NOT .pdfx), and untouched paths; domain b.test has an
    agent-SPECIFIC group (oakbot: Disallow /) that must shadow its *
    group entirely for this crawler. The oracle states every verdict
    closed-form from the planted path structure."""
    from oakstore_spark.operators.urls import parse_robots, robots_allowed

    robots = spark.createDataFrame(
        [
            (
                "a.test",
                "# site a\nUser-agent: *\nDisallow: /private\n"
                "Allow: /private/pub\nDisallow: /*.pdf$\n",
            ),
            (
                "b.test",
                "User-agent: oakbot\nDisallow: /\n\n"
                "User-agent: *\nDisallow: /tmp\n",
            ),
        ],
        "reg_domain string, robots_txt string",
    )
    rules = parse_robots(robots, agent="oakbot")
    d = table(spark, sf_dir, "documents")
    sid = F.col("doc_id").cast("string")
    host = F.when(F.col("doc_id") % 2 == 0, F.lit("a")).otherwise(
        F.lit("b")
    )
    m5 = F.col("doc_id") % 5
    path = (
        F.when(m5 == 0, F.concat(F.lit("/private/x"), sid))
        .when(m5 == 1, F.concat(F.lit("/private/pub/x"), sid))
        .when(m5 == 2, F.concat(F.lit("/open/x"), sid))
        .when(m5 == 3, F.concat(F.lit("/files/doc"), sid, F.lit(".pdf")))
        .otherwise(F.concat(F.lit("/files/doc"), sid, F.lit(".pdfx")))
    )
    urls = d.select(
        "doc_id",
        F.concat(
            F.lit("http://"), host, F.lit(".test"), path
        ).alias("url"),
    )
    return robots_allowed(urls, rules).orderBy("doc_id")


@register(
    "q_keyword_tagging",
    oracle="""
    SELECT doc_id,
           COALESCE(array_to_string(list_sort(
             list_filter([
               CASE WHEN regexp_matches(lower(text), '\\b(hash|join)\\b')
                    THEN 'db' END,
               CASE WHEN regexp_matches(lower(text), '\\b(spark|stream)\\b')
                    THEN 'engine' END,
               CASE WHEN regexp_matches(lower(text),
                                        '\\b(zzzmissing|qqabsent)\\b')
                    THEN 'never' END
             ], t -> t IS NOT NULL)), ','), '') AS tags_csv,
           CAST(len(list_filter([
               CASE WHEN regexp_matches(lower(text), '\\b(hash|join)\\b')
                    THEN 'db' END,
               CASE WHEN regexp_matches(lower(text), '\\b(spark|stream)\\b')
                    THEN 'engine' END,
               CASE WHEN regexp_matches(lower(text),
                                        '\\b(zzzmissing|qqabsent)\\b')
                    THEN 'never' END
             ], t -> t IS NOT NULL)) AS BIGINT) AS n_tags
    FROM documents
    ORDER BY doc_id
    """,
)
def q_keyword_tagging(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Broadcast taxonomy tagging: three tags over literal keyword
    lists (one with keywords absent from the corpus — must tag
    nothing), whole-word case-insensitive matching compiled to one
    alternation per tag, applied map-side. The oracle replays the
    same regexes per row."""
    from oakstore_spark.operators.text import tag_keywords

    kw = spark.createDataFrame(
        [
            ("hash", "db"),
            ("join", "db"),
            ("spark", "engine"),
            ("stream", "engine"),
            ("zzzmissing", "never"),
            ("qqabsent", "never"),
        ],
        "keyword string, tag string",
    )
    d = table(spark, sf_dir, "documents")
    tagged = tag_keywords(d, kw)
    return tagged.select(
        "doc_id",
        F.array_join("tags", ",").alias("tags_csv"),
        F.size("tags").cast("bigint").alias("n_tags"),
    ).orderBy("doc_id")


@register(
    "q_crawl_delay",
    oracle="""
    SELECT doc_id,
           'd' || CAST(doc_id % 5 AS VARCHAR) || '.test' AS reg_domain,
           CASE doc_id % 5
             WHEN 0 THEN 2.0 WHEN 1 THEN 10.0 WHEN 2 THEN 5.0
           END AS crawl_delay_sec,
           CASE doc_id % 5
             WHEN 0 THEN 30.0 WHEN 1 THEN 6.0 WHEN 2 THEN 12.0
           END AS max_requests_per_min
    FROM documents
    ORDER BY doc_id
    """,
)
def q_crawl_delay(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Crawl-delay politeness (the de-facto extension next to RFC 9309
    allow/deny): five planted domains exercise a plain ``*`` delay, an
    agent-specific group that SHADOWS the ``*`` group for this crawler,
    multiple delays in one group (largest — most conservative — wins),
    an unparseable value (ignored -> no limit), and a robots file with
    no delay line at all. The per-domain rate table joins BROADCAST
    onto the URL corpus keyed by registered domain — same shape as
    robots_allowed; nulls mean unthrottled. Every verdict is
    closed-form from doc_id."""
    from oakstore_spark.operators.urls import (
        crawl_delays,
        registered_domain,
        url_parts,
    )

    robots = spark.createDataFrame(
        [
            ("d0.test", "User-agent: *\nCrawl-delay: 2\nDisallow: /x\n"),
            (
                "d1.test",
                "User-agent: oakbot\nCrawl-delay: 10\n\n"
                "User-agent: *\nCrawl-delay: 1\n",
            ),
            (
                "d2.test",
                "User-agent: *\nCrawl-delay: 5\nCrawl-delay: 3\n",
            ),
            ("d3.test", "User-agent: *\nCrawl-delay: soon\n"),
            ("d4.test", "User-agent: *\nDisallow: /\n"),
        ],
        "reg_domain string, robots_txt string",
    )
    delays = crawl_delays(robots, agent="oakbot")
    d = table(spark, sf_dir, "documents")
    urls = d.select(
        "doc_id",
        F.concat(
            F.lit("http://d"),
            (F.col("doc_id") % 5).cast("string"),
            F.lit(".test/page"),
            F.col("doc_id").cast("string"),
        ).alias("url"),
    )
    keyed = urls.withColumn(
        "reg_domain", registered_domain(url_parts("url")["host"])
    )
    return (
        keyed.join(F.broadcast(delays), "reg_domain", "left")
        .select(
            "doc_id",
            "reg_domain",
            "crawl_delay_sec",
            "max_requests_per_min",
        )
        .orderBy("doc_id")
    )


@register(
    "q_fetch_schedule",
    oracle="""
    WITH u AS (
      SELECT doc_id,
             'http://d' || CAST(doc_id % 3 AS VARCHAR) || '.test/p'
               || CAST(doc_id AS VARCHAR) AS url,
             'd' || CAST(doc_id % 3 AS VARCHAR) || '.test' AS reg_domain
      FROM documents
    ), r AS (
      SELECT *,
             row_number() OVER (
               PARTITION BY reg_domain ORDER BY md5(url), url
             ) - 1 AS slot
      FROM u
    )
    SELECT doc_id, url, reg_domain,
           CASE doc_id % 3 WHEN 0 THEN 2.0 WHEN 1 THEN 0.5
                ELSE 1.0 END AS crawl_delay_sec,
           CAST(slot AS BIGINT) AS fetch_slot,
           CAST(1600000000000000 + slot *
                CASE doc_id % 3 WHEN 0 THEN 2000000 WHEN 1 THEN 500000
                     ELSE 1000000 END AS BIGINT) AS fetch_at_us
    FROM r
    ORDER BY doc_id
    """,
)
def q_fetch_schedule(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full crawl-politeness chain end-to-end: robots texts ->
    crawl_delays (d0 states 2s, d1 half a second, d2 none -> the 1s
    default) -> schedule_fetches assigns every URL a per-domain fetch
    slot (md5-shuffled deterministic order) and an exact-integer
    epoch-microsecond fetch time. The oracle replays the slot window
    and the integer slot*delay_us arithmetic closed-form."""
    from oakstore_spark.operators.urls import crawl_delays, schedule_fetches

    robots = spark.createDataFrame(
        [
            ("d0.test", "User-agent: *\nCrawl-delay: 2\n"),
            ("d1.test", "User-agent: *\nCrawl-delay: 0.5\n"),
            ("d2.test", "User-agent: *\nDisallow: /tmp\n"),
        ],
        "reg_domain string, robots_txt string",
    )
    delays = crawl_delays(robots)
    d = table(spark, sf_dir, "documents")
    urls = d.select(
        "doc_id",
        F.concat(
            F.lit("http://d"),
            (F.col("doc_id") % 3).cast("string"),
            F.lit(".test/p"),
            F.col("doc_id").cast("string"),
        ).alias("url"),
    )
    return schedule_fetches(
        urls, delays, start_us=1_600_000_000_000_000
    ).orderBy("doc_id")


@register(
    "q_keyword_extraction",
    oracle="""
    WITH docs AS (
      SELECT doc_id,
             regexp_replace(
               regexp_replace(lower(text), '[^a-z0-9 ]+', '|', 'g'),
               '\\b(a|an|and|are|as|at|be|but|by|for|from|has|he|in|is|it|its|of|on|or|that|the|to|was|were|will|with)\\b',
               '|', 'g') AS s
      FROM documents
    ), occf AS (
      SELECT doc_id, trim(regexp_replace(p, ' +', ' ', 'g')) AS phrase
      FROM docs, unnest(string_split(s, '|')) AS u(p)
      WHERE trim(regexp_replace(p, ' +', ' ', 'g')) <> ''
    ), wo AS (
      SELECT doc_id, len(string_split(phrase, ' ')) AS plen, w AS word
      FROM occf, unnest(string_split(phrase, ' ')) AS u(w)
    ), stats AS (
      SELECT doc_id, word,
             CAST(count(*) AS BIGINT) AS freq,
             CAST(sum(plen) AS BIGINT) AS deg
      FROM wo GROUP BY doc_id, word
    ), dp AS (
      SELECT DISTINCT doc_id, phrase FROM occf
    ), pw AS (
      SELECT dp.doc_id, dp.phrase, g.i AS wpos,
             string_split(dp.phrase, ' ')[g.i] AS word
      FROM dp, UNNEST(generate_series(1,
             len(string_split(dp.phrase, ' ')))) AS g(i)
    ), scored AS (
      SELECT p.doc_id, p.phrase, p.wpos,
             CAST(s.deg AS DOUBLE) / s.freq AS sw
      FROM pw p JOIN stats s
        ON p.doc_id = s.doc_id AND p.word = s.word
    ), folded AS (
      SELECT doc_id, phrase,
             CAST(count(*) AS BIGINT) AS n_words,
             list_reduce(
               list_prepend(CAST(0.0 AS DOUBLE),
                            list(sw ORDER BY wpos)),
               (a, b) -> a + b) AS score
      FROM scored GROUP BY doc_id, phrase
    ), ranked AS (
      SELECT doc_id, phrase, n_words, score,
             CAST(row_number() OVER (PARTITION BY doc_id
                  ORDER BY score DESC, phrase) AS BIGINT) AS rank
      FROM folded
    )
    SELECT doc_id, phrase, n_words, score, rank
    FROM ranked WHERE rank <= 5
    ORDER BY doc_id, rank
    """,
)
def q_keyword_extraction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RAKE keyword extraction (operators/text.rake_keywords): top-5
    stopword-delimited candidate phrases per document scored by the
    classic degree/frequency word statistic. freq/deg are exact
    BIGINTs; each word score one pinned division; the phrase score a
    FIXED-ORDER left fold (F.aggregate == list_reduce over the
    position-ordered word list — never an unordered float sum); ties
    break on the phrase text."""
    from oakstore_spark.operators.text import rake_keywords

    d = table(spark, sf_dir, "documents")
    return rake_keywords(d, "doc_id", "text", top_k=5).orderBy(
        "doc_id", "rank"
    )


@register(
    "q_stemmed_terms",
    oracle="""
    WITH tok AS (
      SELECT t AS w
      FROM documents, unnest(string_split(lower(text), ' ')) AS u(t)
      WHERE t <> ''
    ), stemmed AS (
      SELECT CASE
        WHEN w LIKE '%ies' AND w NOT LIKE '%eies'
             AND w NOT LIKE '%aies'
          THEN substr(w, 1, len(w) - 3) || 'y'
        WHEN w LIKE '%es' AND w NOT LIKE '%aes'
             AND w NOT LIKE '%ees' AND w NOT LIKE '%oes'
          THEN substr(w, 1, len(w) - 1)
        WHEN w LIKE '%s' AND w NOT LIKE '%us' AND w NOT LIKE '%ss'
          THEN substr(w, 1, len(w) - 1)
        ELSE w END AS stem,
        w
      FROM tok
    )
    SELECT stem,
           CAST(count(*) AS BIGINT) AS n_tokens,
           CAST(count(DISTINCT w) AS BIGINT) AS n_surface_forms
    FROM stemmed GROUP BY stem
    ORDER BY n_tokens DESC, stem LIMIT 30
    """,
)
def q_stemmed_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top stemmed vocabulary (functions/text.s_stem — the Harman
    S-stemmer): whitespace tokens collapse plural surface forms into
    one stem; per stem, total token mass and how many distinct surface
    forms merged. One explode + one hash aggregate (map-side
    combinable), TakeOrdered top-30 with the stem tiebreak; the CASE
    chain replays verbatim in DuckDB."""
    from oakstore_spark.functions.text import s_stem

    d = table(spark, sf_dir, "documents")
    tok = d.select(
        F.explode(F.split(F.lower(F.col("text")), " ")).alias("w")
    ).where(F.col("w") != "")
    stemmed = tok.select(s_stem("w").alias("stem"), "w")
    return (
        stemmed.groupBy("stem")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.countDistinct("w").alias("n_surface_forms"),
        )
        .orderBy(F.col("n_tokens").desc(), "stem")
        .limit(30)
    )


def _textrank_oracle() -> str:
    """Chained-CTE replay of the full TextRank chain on the planted
    corpus: noisy doc text -> normalize -> adjacent bigrams ->
    symmetrized distinct edge set -> 6 PageRank iterations (damping
    1/2) -> top-20. The planted co-occurrence graph is the 64-cycle
    plus a step-16 overlay on the hub nodes, so every UNDIRECTED
    degree is 2 or 4 (powers of two) and — like q_pagerank_dyadic —
    every iteration's rank is a dyadic rational well inside double
    precision: Spark's shuffled sums match DuckDB's serial replay to
    the last bit."""
    norm = (
        "trim(regexp_replace(regexp_replace(lower(text), "
        "'[^a-z0-9\\s]', '', 'g'), '\\s+', ' ', 'g'))"
    )
    steps = []
    for k in range(6):
        steps.append(f"""
    pr{k + 1} AS (
      SELECT n.node,
             0.0078125 + 0.5 * COALESCE(c.contrib, 0) AS rank
      FROM nodes n
      LEFT JOIN (
        SELECT e.dst AS node, sum(p.rank / o.deg) AS contrib
        FROM edges e
        JOIN pr{k} p ON e.src = p.node
        JOIN outdeg o ON o.node = e.src
        GROUP BY e.dst
      ) c ON c.node = n.node
    )""")
    return (
        f"""
    WITH eg AS (
      SELECT range AS a, (range + 1) % 64 AS b FROM range(64)
      UNION ALL
      SELECT range * 4, (range * 4 + 16) % 64 FROM range(16)
    ), docs AS (
      SELECT '  W' || a || '!!  w' || b || '.' AS text FROM eg
    ), w AS (
      SELECT string_split({norm}, ' ') AS ws FROM docs
    ), bg AS (
      SELECT unnest(list_transform(range(1, len(ws)),
                    i -> {{'w1': ws[i], 'w2': ws[i + 1]}})) AS p
      FROM w WHERE len(ws) >= 2
    ), pairs AS (
      SELECT p.w1 AS w1, p.w2 AS w2 FROM bg WHERE p.w1 <> p.w2
    ), edges AS (
      SELECT DISTINCT w1 AS src, w2 AS dst FROM (
        SELECT w1, w2 FROM pairs
        UNION ALL SELECT w2, w1 FROM pairs
      )
    ), nodes AS (SELECT DISTINCT src AS node FROM edges),
    outdeg AS (SELECT src AS node, count(*) AS deg FROM edges
               GROUP BY 1),
    pr0 AS (SELECT node, CAST(1.0/64 AS DOUBLE) AS rank FROM nodes),"""
        + ",".join(steps)
        + """
    SELECT node AS word, rank FROM pr6
    ORDER BY rank DESC, word LIMIT 20
    """
    )


@register("q_textrank_keywords", oracle=_textrank_oracle())
def q_textrank_keywords(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TextRank keywords (operators/text.textrank_keywords): the
    corpus-aware graph sibling of RAKE — word co-occurrence graph +
    PageRank. Planted corpus: one noisy two-word document per edge of
    a 64-cycle-plus-hub-overlay graph (case, punctuation and stray
    whitespace must all normalize away for the edge to land), whose
    undirected degrees are all powers of two, so 6 damping-1/2
    PageRank iterations are BIT-exact (the q_pagerank_dyadic
    construction) and DuckDB replays the entire chain — extraction,
    symmetrization, iterations, top-20 — hash-for-hash."""
    from oakstore_spark.operators.text import textrank_keywords

    cyc = spark.range(64).select(
        F.col("id").alias("a"), ((F.col("id") + 1) % 64).alias("b")
    )
    hub = spark.range(16).select(
        (F.col("id") * 4).alias("a"),
        ((F.col("id") * 4 + 16) % 64).alias("b"),
    )
    docs = cyc.unionByName(hub).select(
        F.concat(
            F.lit("  W"),
            F.col("a").cast("string"),
            F.lit("!!  w"),
            F.col("b").cast("string"),
            F.lit("."),
        ).alias("text")
    )
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "2")
    try:
        out = textrank_keywords(
            docs, "text", damping=0.5, n_iterations=6, top_k=20
        )
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
    return out
