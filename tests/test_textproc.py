"""Tests for the r6 text-processing operators: Cavnar-Trenkle language
ID (held-out confusion matrix + degrade), corpus line dedup (planted
repeated-line recovery), HTML main-text extraction (boilerplate drop +
malformed-markup degrade)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from oakstore_spark.operators.dedup import line_dedup_corpus
from oakstore_spark.operators.html import extract_main_text
from oakstore_spark.operators.langid import (
    classify_lang,
    seed_corpus,
    train_lang_profiles,
)

# held-out sentences (written for this test — NOT in SEED_SENTENCES)
HELD_OUT = {
    "en": [
        "the library opens its doors every day except sunday afternoons",
        "my sister bought a blue bicycle from the shop last week",
        "we should finish the report before the meeting starts tomorrow",
    ],
    "fr": [
        "la bibliotheque ouvre ses portes tous les jours sauf le dimanche",
        "ma soeur a achete un velo bleu au magasin la semaine derniere",
        "nous devons finir le rapport avant le debut de la reunion demain",
    ],
    "de": [
        "die bibliothek oeffnet ihre tueren jeden tag ausser am sonntag",
        "meine schwester kaufte letzte woche ein blaues fahrrad im laden",
        "wir sollten den bericht vor dem beginn der sitzung morgen beenden",
    ],
    "es": [
        "la biblioteca abre sus puertas todos los dias excepto el domingo",
        "mi hermana compro una bicicleta azul en la tienda la semana pasada",
        "debemos terminar el informe antes de que empiece la reunion manana",
    ],
    "it": [
        "la biblioteca apre le sue porte ogni giorno tranne la domenica",
        "mia sorella ha comprato una bicicletta blu al negozio la settimana scorsa",
        "dobbiamo finire il rapporto prima che inizi la riunione domani",
    ],
    "pt": [
        "a biblioteca abre suas portas todos os dias exceto aos domingos",
        "minha irma comprou uma bicicleta azul na loja na semana passada",
        "devemos terminar o relatorio antes que a reuniao comece amanha",
    ],
}


def test_langid_heldout_confusion_matrix(spark):
    """Profiles trained on the seed corpus must classify HELD-OUT
    sentences (disjoint from training) with a perfectly diagonal
    confusion matrix — 18 sentences, 6 languages, 0 confusions."""
    profiles = train_lang_profiles(seed_corpus(spark))
    rows = [
        (i * 10 + j, s, lang)
        for i, (lang, sents) in enumerate(sorted(HELD_OUT.items()))
        for j, s in enumerate(sents)
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, true_lang string")
    out = classify_lang(df, profiles)
    joined = df.join(out, "doc_id")
    confusion = (
        joined.groupBy("true_lang", "pred_lang").count().collect()
    )
    off_diag = [r for r in confusion if r.true_lang != r.pred_lang]
    assert off_diag == [], f"misclassified: {off_diag}"
    assert sum(r["count"] for r in confusion) == 18


def test_langid_degrade_and_determinism(spark):
    """Blank / symbol-only docs -> null pred (never vanish); repeated
    classification is bit-stable (tie order pinned)."""
    profiles = train_lang_profiles(seed_corpus(spark)).cache()
    df = spark.createDataFrame(
        [(1, ""), (2, "1234 $$$ !!!"), (3, "ab")],
        "doc_id long, text string",
    )
    out = classify_lang(df, profiles).orderBy("doc_id").collect()
    assert [r.doc_id for r in out] == [1, 2, 3]
    assert out[0].pred_lang is None and out[1].pred_lang is None
    # "ab" normalizes to " ab " -> has trigrams -> gets SOME deterministic label
    df2 = spark.createDataFrame(
        [(1, "the weather is nice today near the harbor")],
        "doc_id long, text string",
    )
    a = classify_lang(df2, profiles).collect()[0]
    b = classify_lang(df2, profiles).collect()[0]
    assert (a.pred_lang, a.oop_distance) == (b.pred_lang, b.oop_distance)
    assert a.pred_lang == "en"
    profiles.unpersist()


def test_langid_profile_ranks_deterministic(spark):
    """Profile ranks: rank 1 is each language's most frequent trigram;
    ranks are dense 1..K; ties break gram-ascending (exact single-node
    replay in pandas)."""
    import pandas as pd

    corpus = seed_corpus(spark)
    prof = train_lang_profiles(corpus, top_k=50).toPandas()
    # single-node replay
    seed = corpus.toPandas()
    for lang, group in seed.groupby("lang"):
        counts: dict[str, int] = {}
        for text in group["text"]:
            s = " " + " ".join("".join(ch if ch.isalpha() else " " for ch in text.lower()).split()) + " "
            for i in range(len(s) - 2):
                g = s[i : i + 3]
                counts[g] = counts.get(g, 0) + 1
        expect = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[:50]
        got = prof[prof.lang == lang].sort_values("rank")
        assert list(got["gram"]) == [g for g, _ in expect], lang
        assert list(got["rank"]) == list(range(1, len(expect) + 1))


def test_line_dedup_planted_recovery(spark):
    """Keep-first across the corpus, blanks always kept, reassembly in
    order, docs losing every non-blank line still present."""
    docs = [
        (1, "shared header\nalpha one\n\nshared footer"),
        (2, "shared header\nbeta two\n\nshared footer"),
        (3, "shared header\nshared header\ngamma three"),
        (4, "shared header"),
        (5, ""),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    out = {r.doc_id: r for r in line_dedup_corpus(df).collect()}

    # doc 1 is the global first occurrence of both shared lines
    assert out[1].clean_text == "shared header\nalpha one\n\nshared footer"
    assert (out[1].n_lines, out[1].n_kept) == (4, 4)
    # doc 2 loses both shared lines, keeps its unique + blank
    assert out[2].clean_text == "beta two\n"
    assert (out[2].n_lines, out[2].n_kept) == (4, 2)
    # doc 3: BOTH its copies lose to doc 1's (keep-first is global)
    assert out[3].clean_text == "gamma three"
    assert (out[3].n_lines, out[3].n_kept) == (3, 1)
    # doc 4 loses its only line -> empty text, still present
    assert out[4].clean_text == "" and out[4].n_kept == 0
    # doc 5: a single blank line is blank-kept
    assert out[5].clean_text == "" and (out[5].n_lines, out[5].n_kept) == (1, 1)


def test_line_dedup_regex_metachar_delim(spark):
    """delim is a LITERAL: '|' (a regex metachar) must split on pipes,
    not per-character, and reassembly must round-trip."""
    docs = [
        (1, "shared line|alpha.one|x+y"),
        (2, "shared line|beta.two|x+y"),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    out = {
        r.doc_id: r
        for r in line_dedup_corpus(df, delim="|").collect()
    }
    assert out[1].clean_text == "shared line|alpha.one|x+y"
    assert (out[1].n_lines, out[1].n_kept) == (3, 3)
    # doc 2 loses BOTH duplicated segments ("shared line" and "x+y")
    assert out[2].clean_text == "beta.two"
    assert (out[2].n_lines, out[2].n_kept) == (3, 1)
    # '.' as delimiter: would match every char if treated as regex
    df2 = spark.createDataFrame(
        [(1, "aa.bb"), (2, "aa.cc")], "doc_id long, text string"
    )
    out2 = {r.doc_id: r for r in line_dedup_corpus(df2, delim=".").collect()}
    assert out2[1].clean_text == "aa.bb" and out2[1].n_lines == 2
    assert out2[2].clean_text == "cc"


def test_line_dedup_keeper_survives_extreme_keys(spark):
    """The keeper is min(struct(doc_id, pos)) — no packed-BIGINT key —
    so huge doc_ids, negative doc_ids, and line positions beyond 2^20
    must still pick the true global first occurrence."""
    big = 1 << 50  # would overflow doc_id * 2^20 packing
    many = 1_100_000  # > 2^20 lines
    filler = "\n".join(f"filler {i}" for i in range(3))
    docs = [
        (-5, "dup line\nneg unique"),
        (big, "dup line\nbig unique"),
        (7, filler + "\n" + "dup line"),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    out = {r.doc_id: r for r in line_dedup_corpus(df).collect()}
    # keeper = lowest (doc_id, pos): the negative id wins
    assert out[-5].clean_text == "dup line\nneg unique"
    assert out[big].clean_text == "big unique"
    assert "dup line" not in out[7].clean_text
    # positions beyond 2^20: first occurrence at a huge pos still wins
    # over a later doc's pos 0 (the old packed key would corrupt here)
    tail_dup = "late duplicate line"
    long_doc = "\n".join(["pad"] * 2 + [f"u{big}"]) + "\n" + tail_dup
    df2 = spark.createDataFrame(
        [(1, long_doc), (2, tail_dup + "\nsecond doc unique")],
        "doc_id long, text string",
    )
    out2 = {r.doc_id: r for r in line_dedup_corpus(df2).collect()}
    assert tail_dup in out2[1].clean_text
    assert out2[2].clean_text == "second doc unique"
    # smoke the >2^20-line shape cheaply via a sequence-planted doc:
    # build positions lazily in Spark rather than a giant Python string
    lines = spark.range(1).select(
        F.lit(3).alias("doc_id"),
        F.concat_ws(
            "\n",
            F.transform(
                F.sequence(F.lit(0), F.lit(many - 1)),
                lambda i: F.concat(F.lit("ln "), (i % 500).cast("string")),
            ),
        ).alias("text"),
    )
    res = line_dedup_corpus(lines).collect()[0]
    assert res.n_lines == many and res.n_kept == 500


def test_langid_default_penalty_is_profile_size(spark):
    """The absent-gram penalty defaults to max(rank) over the ACTUAL
    profiles (Cavnar-Trenkle), not doc_top_k: a doc whose grams are all
    absent from every profile scores n_grams * profile_size."""
    profiles = spark.createDataFrame(
        [("xx", " th", 1), ("xx", "the", 2), ("xx", "he ", 3)],
        "lang string, gram string, rank int",
    )
    # "zzzz" normalizes to " zzzz " -> 3 DISTINCT trigrams
    # (" zz", "zzz", "zz "), none in the profile
    df = spark.createDataFrame([(1, "zzzz")], "doc_id long, text string")
    got = classify_lang(df, profiles).collect()[0]
    assert got.oop_distance == 3 * 3  # profile size 3, NOT doc_top_k=300
    # explicit penalty still honored verbatim
    got2 = classify_lang(df, profiles, penalty=11).collect()[0]
    assert got2.oop_distance == 3 * 11


def test_langid_margin_contract(spark):
    """margin = runner-up oop - best oop (exact int); a two-language
    TIE yields margin 0 with the lexicographic winner; a single
    profiled language degrades to null runner-up/margin."""
    profiles = spark.createDataFrame(
        # identical profiles for aa/bb -> identical distances -> tie
        [("aa", "the", 1), ("bb", "the", 1)],
        "lang string, gram string, rank int",
    )
    df = spark.createDataFrame([(1, "the")], "doc_id long, text string")
    got = classify_lang(df, profiles).collect()[0]
    assert got.pred_lang == "aa" and got.runner_up_lang == "bb"
    assert got.margin == 0

    solo = profiles.where("lang = 'aa'")
    got1 = classify_lang(df, solo).collect()[0]
    assert got1.pred_lang == "aa"
    assert got1.runner_up_lang is None and got1.margin is None


def test_html_extract_malformed_degrades(spark):
    """Malformed markup must degrade, never fail: unclosed tags strip,
    nested links count once, null html -> null out, all-boilerplate
    pages extract to empty (n_blocks_kept=0) rather than erroring."""
    long_txt = "this paragraph carries enough characters to pass the floor"
    pages = [
        (1, f"<p>{long_txt}"),                      # unclosed <p>
        (2, f"<p><b>{long_txt}</i></wrong>"),        # mismatched inline tags
        (3, "<nav><a href='/'>Home page link</a> <a href='/x'>Another link text</a></nav>"),
        (4, None),
        (5, "<P CLASS='x'>" + long_txt + "</P>"),    # case-insensitive tags
        (6, "<p>< not a tag but looks odd " + long_txt + "</p>"),
    ]
    df = spark.createDataFrame(pages, "doc_id long, html string")
    out = {r.doc_id: r for r in extract_main_text(df).collect()}
    assert out[1].main_text == long_txt
    assert out[2].main_text == long_txt
    assert out[3].main_text == "" and out[3].n_blocks_kept == 0
    assert out[4].main_text is None and out[4].n_blocks_kept is None
    assert out[5].main_text == long_txt
    # "< not a tag" : '<' swallows to next '>' per the tag regex — the
    # tail text after it must still survive (degrade, not data loss)
    assert long_txt.split()[-1] in (out[6].main_text or "")


def test_html_then_line_dedup_compose(spark):
    """The natural pipeline: extract_main_text -> line_dedup_corpus.
    A footer line surviving extraction in many pages (link-light
    boilerplate) is deduped to its first occurrence."""
    boiler = "copyright twenty twenty six all rights reserved worldwide"
    pages = [
        (i, f"<p>unique paragraph number {i} with plenty of characters</p>"
            f"<p>{boiler}</p>")
        for i in range(1, 4)
    ]
    df = spark.createDataFrame(pages, "doc_id long, html string")
    extracted = extract_main_text(df).select(
        "doc_id", F.col("main_text").alias("text")
    )
    out = {r.doc_id: r for r in line_dedup_corpus(extracted).collect()}
    assert boiler in out[1].clean_text
    assert boiler not in out[2].clean_text
    assert boiler not in out[3].clean_text
    assert "unique paragraph number 3" in out[3].clean_text


def test_url_normalize_edges(spark):
    from oakstore_spark.operators.urls import (
        normalize_url,
        registered_domain,
        url_parts,
    )

    rows = [
        (1, "HTTP://WWW.EXAMPLE.COM:80/"),
        (2, "https://a.io:8443/x/?utm_campaign=c&q=1"),
        (3, "not a url"),
        (4, None),
        (5, "http://localhost:3000/api/"),
        (6, "https://shop.example.co.uk/p?fbclid=f"),
        (7, "http://x.org/path?ref=abc"),
    ]
    df = spark.createDataFrame(rows, "id long, url string")
    out = {r.id: r for r in df.select(
        "id",
        normalize_url("url").alias("n"),
        registered_domain(url_parts("url")["host"]).alias("d"),
    ).collect()}
    assert out[1].n == "http://example.com" and out[1].d == "example.com"
    # non-default port kept; tracking param dropped; trailing slash cut
    assert out[2].n == "https://a.io:8443/x?q=1"
    assert out[3].n is None  # schemeless degrades to null
    assert out[4].n is None
    assert out[5].n == "http://localhost:3000/api"
    assert out[5].d == "localhost"  # single label passes through
    assert out[6].n == "https://shop.example.co.uk/p"
    assert out[6].d == "example.co.uk"  # two-level suffix -> 3 labels
    assert out[7].n == "http://x.org/path"  # emptied query drops '?'


def test_url_blocklist_antijoin_is_broadcast(spark):
    from oakstore_spark.operators.urls import filter_blocklisted

    df = spark.createDataFrame(
        [(1, "http://bad.com/a"), (2, "http://ok.org/b"),
         (3, "https://www.BAD.com/c")],
        "id long, url string",
    )
    bl = spark.createDataFrame([("bad.com",)], "reg_domain string")
    kept = filter_blocklisted(df, bl, "url")
    assert [r.id for r in kept.collect()] == [2]
    plan = kept._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan and "LeftAnti" in plan


def test_readability_hand_computed(spark):
    from oakstore_spark.operators.text import readability

    rows = [
        (1, "The cat sat. The dog ran!"),   # 6 words, 6 syll, 2 sent
        (2, "Extraordinary bureaucracy"),    # 2 words, no sentence mark
        (3, "12345 $$$"),                    # zero words
        (4, None),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.doc_id: r for r in readability(df).collect()}
    r1 = out[1]
    assert (r1.n_words, r1.n_syllables, r1.n_sentences) == (6, 6, 2)
    # exact rational evaluation: num/den in int64, one IEEE division
    assert r1.flesch == (41367 * 2 * 6 - 203 * 36 - 16920 * 6 * 2) / 2400
    assert r1.fk_grade == (39 * 36 + 1180 * 6 * 2 - 1559 * 2 * 6) / 1200
    assert abs(r1.flesch - 119.19) < 1e-12 and abs(r1.fk_grade + 2.62) < 1e-12
    # extraordinary: e-xtrao-rdi-na-ry -> vowel runs e,aoa? count runs:
    # 'extraordinary' -> e,ao,i,a,y = 5; 'bureaucracy' -> u,eau,a,y = 4
    r2 = out[2]
    assert (r2.n_words, r2.n_syllables, r2.n_sentences) == (2, 9, 1)
    assert out[3].flesch is None and out[3].n_words is None
    assert out[4].flesch is None


def test_conversation_stats_edges(spark):
    from oakstore_spark.operators.chat import (
        conversation_stats,
        flatten_conversation,
    )

    rows = [
        (1, [("user", "hi"), ("assistant", "hello there")]),
        (2, [("system", "be nice"), ("user", "q"), ("assistant", "a")]),
        (3, [("user", "a"), ("user", "b")]),        # violation
        (4, []),                                      # empty
        (5, [("assistant", "orphan")]),               # starts wrong
        (6, [("user", None)]),                        # null content
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, turns array<struct<role:string,content:string>>"
    )
    out = {r.doc_id: r for r in conversation_stats(df).collect()}
    assert (out[1].n_turns, out[1].n_user, out[1].n_assistant) == (2, 1, 1)
    assert out[1].alternating and out[1].starts_with_user
    assert out[1].assistant_chars == 11 and out[1].total_chars == 13
    assert out[1].assistant_share == 11 / 13
    assert out[2].starts_with_user  # system counts as a valid opener
    assert not out[3].alternating
    assert (out[4].n_turns, out[4].total_chars) == (0, 0)
    assert out[4].assistant_share is None and out[4].alternating
    assert out[5].starts_with_user is False
    assert out[6].total_chars == 0  # null content degrades to 0 chars
    flat = {r.doc_id: r.f for r in df.select(
        "doc_id", flatten_conversation("turns").alias("f")).collect()}
    assert flat[1] == "<|user|>hi\n<|assistant|>hello there"
    assert flat[4] == ""


def test_quantize_int8_roundtrip_properties(spark):
    import numpy as np

    from oakstore_spark.operators.similarity import quantize_embeddings_int8

    rng = np.random.default_rng(7)
    vecs = [(i, rng.normal(size=16).tolist()) for i in range(20)]
    vecs.append((20, [0.0] * 16))           # zero vector
    vecs.append((21, [-1.0] + [0.0] * 15))  # extreme negative
    df = spark.createDataFrame(vecs, "vec_id long, embedding array<double>")
    out = {r.vec_id: r for r in quantize_embeddings_int8(df).collect()}
    for i, v in vecs:
        r = out[i]
        q = np.array(r.q_vec)
        assert q.min() >= -127 and q.max() <= 127, i
        if r.scale == 0.0:
            assert (q == 0).all() and r.mse == 0.0
            continue
        # dequantized error bounded by half a step per element
        err = np.abs(np.array(v) - q * r.scale)
        assert (err <= r.scale / 2 + 1e-12).all(), i
        assert r.mse <= (r.scale / 2) ** 2 + 1e-12
    # the max-magnitude element always hits exactly +-127
    assert 127 in np.abs(out[0].q_vec)
    assert out[21].q_vec[0] == -127


def test_preference_pairs_ties_and_filters(spark):
    """Hand-built groups: tie on top score -> smallest id chosen; tie
    on bottom -> smallest id rejected; singleton prompts and all-equal
    groups dropped (kept with keep_ties=True, margin 0)."""
    from oakstore_spark.operators.chat import preference_pairs

    rows = [
        # prompt 1: top tie (ids 11,12 score 9) -> chosen 11; low 13
        (1, 11, 9), (1, 12, 9), (1, 13, 2),
        # prompt 2: bottom tie (21,22 score 1) -> rejected 21; top 23
        (2, 21, 1), (2, 22, 1), (2, 23, 8),
        # prompt 3: singleton -> dropped
        (3, 31, 5),
        # prompt 4: all equal -> dropped unless keep_ties
        (4, 41, 4), (4, 42, 4),
    ]
    df = spark.createDataFrame(
        rows, "prompt_id long, resp_id long, score long"
    )
    out = {r["prompt_id"]: r.asDict() for r in preference_pairs(df).collect()}
    assert set(out) == {1, 2}
    assert out[1]["chosen_id"] == 11 and out[1]["rejected_id"] == 13
    assert out[1]["margin"] == 7 and out[1]["n_responses"] == 3
    assert out[2]["chosen_id"] == 23 and out[2]["rejected_id"] == 21
    kept = {
        r["prompt_id"]: r.asDict()
        for r in preference_pairs(df, keep_ties=True).collect()
    }
    assert set(kept) == {1, 2, 4}
    # all-tied group must NOT degenerate into a self-pair: chosen is
    # the smallest id, rejected the SECOND-smallest (ADVICE r8)
    assert kept[4]["chosen_id"] == 41 and kept[4]["rejected_id"] == 42
    assert kept[4]["margin"] == 0
    # the non-tied groups are unchanged by the keep_ties path
    assert kept[1]["chosen_id"] == 11 and kept[1]["rejected_id"] == 13


def test_preference_pairs_string_ids(spark):
    """Response ids may be ANY orderable type: the ordering struct
    negates the numeric SCORE, never the id, so string ids work with
    the same smallest-id tie-breaks."""
    from oakstore_spark.operators.chat import preference_pairs

    rows = [
        ("p1", "r-b", 9.0), ("p1", "r-a", 9.0), ("p1", "r-c", 2.0),
        ("p2", "z", 3.0), ("p2", "y", 3.0), ("p2", "x", 3.0),
    ]
    df = spark.createDataFrame(
        rows, "prompt_id string, resp_id string, score double"
    )
    out = {
        r["prompt_id"]: r.asDict()
        for r in preference_pairs(df, keep_ties=True).collect()
    }
    # top tie -> lexicographically smallest id chosen
    assert out["p1"]["chosen_id"] == "r-a"
    assert out["p1"]["rejected_id"] == "r-c"
    # fully tied -> smallest chosen, second-smallest rejected
    assert out["p2"]["chosen_id"] == "x"
    assert out["p2"]["rejected_id"] == "y"
    assert out["p2"]["margin"] == 0.0


def test_domain_boilerplate_scoping_and_blanks(spark):
    """A line common on domain A stays on domain B; within-page
    repeats count once toward the page threshold but are ALL removed
    once boilerplate; blank lines always survive."""
    from oakstore_spark.operators.dedup import domain_boilerplate_strip

    rows = [
        (1, "a", "promo\nx1\n\npromo"),   # promo twice + blank
        (2, "a", "promo\nx2"),
        (3, "a", "x3"),
        (4, "b", "promo\ny4"),            # promo rare on b -> kept
        (5, "b", "y5"),
        (6, "b", "y6"),
        (7, "b", "y7"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, domain string, text string")
    out = {
        r["doc_id"]: r.asDict()
        for r in domain_boilerplate_strip(df, frac_pct=50).collect()
    }
    # domain a: promo on 2/3 pages >= 50% -> cut everywhere incl. repeats
    assert out[1]["clean_text"] == "x1\n"
    assert out[1]["n_lines"] == 4 and out[1]["n_kept"] == 2  # x1 + blank
    assert out[2]["clean_text"] == "x2"
    # domain b: promo on 1/4 pages < 50% -> untouched
    assert out[4]["clean_text"] == "promo\ny4"
    assert out[4]["n_kept"] == 2


def test_fix_mojibake_edge_cases(spark):
    """Multi-accent repair, 3-byte sequences (€ as â‚¬), genuine
    Latin-1 untouched, ASCII untouched, empty string, and text above
    Latin-1 range (already-good UTF-8 with CJK) untouched."""
    from oakstore_spark.operators.text import fix_mojibake

    def corrupt(s):
        return s.encode("utf-8").decode("latin-1")

    rows = [
        (0, corrupt("héllo wörld")),
        (1, corrupt("price: 5€")),
        (2, "naïve café"),      # genuine latin-1 style, single-encoded
        (3, "plain ascii"),
        (4, ""),
        (5, "日本語 text"),      # beyond latin-1: never touched
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r.asDict() for r in fix_mojibake(df).collect()}
    assert out[0]["fixed"] == "héllo wörld" and out[0]["was_mojibake"]
    assert out[1]["fixed"] == "price: 5€" and out[1]["was_mojibake"]
    assert out[2]["fixed"] == "naïve café" and not out[2]["was_mojibake"]
    assert out[3]["fixed"] == "plain ascii" and not out[3]["was_mojibake"]
    assert out[4]["fixed"] == "" and not out[4]["was_mojibake"]
    assert out[5]["fixed"] == "日本語 text" and not out[5]["was_mojibake"]


def test_parse_robots_group_selection_and_wildcards(spark):
    from oakstore_spark.operators.urls import parse_robots, robots_allowed

    robots = spark.createDataFrame(
        [
            (
                "s.test",
                # two UA lines sharing one group; comments; empty
                # Disallow (= no rule); wildcard and anchor
                "User-agent: alpha\nUser-agent: beta\n"
                "Disallow: /a  # trailing comment\n\n"
                "User-agent: *\nDisallow:\nDisallow: /*.zip$\n",
            ),
        ],
        "reg_domain string, robots_txt string",
    )
    # agent 'beta' gets the shared group, NOT the * group
    rules = parse_robots(robots, agent="BETA").collect()
    assert [(r["pattern"], r["allow"]) for r in rules] == [("/a", False)]
    # unknown agent falls to *: empty Disallow dropped, zip rule kept
    star = parse_robots(robots, agent="other").collect()
    assert [(r["pattern"], r["allow"]) for r in star] == [
        ("/*.zip$", False)
    ]
    urls = spark.createDataFrame(
        [
            (1, "http://s.test/data.zip"),
            (2, "http://s.test/data.zip.txt"),
            (3, "http://nothing.test/x"),
        ],
        "id long, url string",
    )
    got = {
        r["id"]: r["allowed"]
        for r in robots_allowed(
            urls, parse_robots(robots, agent="other")
        ).collect()
    }
    assert got == {1: False, 2: True, 3: True}


def test_robots_tie_least_restrictive_wins(spark):
    """Equal-specificity Allow vs Disallow: RFC says least
    restrictive (Allow) wins."""
    from oakstore_spark.operators.urls import parse_robots, robots_allowed

    robots = spark.createDataFrame(
        [("t.test", "User-agent: *\nDisallow: /p\nAllow: /p\n")],
        "reg_domain string, robots_txt string",
    )
    urls = spark.createDataFrame(
        [(1, "http://t.test/p/x")], "id long, url string"
    )
    [r] = robots_allowed(urls, parse_robots(robots)).collect()
    assert r["allowed"] is True


def test_robots_duplicate_rows_and_query_matching(spark):
    """Output cardinality equals input cardinality even with duplicate
    input rows (unique-row-key restore, not group-by-all-columns), and
    RFC 9309 matching sees the path PLUS query string."""
    from oakstore_spark.operators.urls import parse_robots, robots_allowed

    robots = spark.createDataFrame(
        [("q.test", "User-agent: *\nDisallow: /search?q=\n")],
        "reg_domain string, robots_txt string",
    )
    rules = parse_robots(robots)
    urls = spark.createDataFrame(
        [
            (1, "http://q.test/search?q=x"),   # query part must match
            (1, "http://q.test/search?q=x"),   # exact duplicate row
            (2, "http://q.test/search"),       # no query -> allowed
        ],
        "id long, url string",
    )
    out = robots_allowed(urls, rules).collect()
    assert len(out) == 3, "duplicate input rows must stay duplicated"
    verdicts = sorted((r["id"], r["allowed"]) for r in out)
    assert verdicts == [(1, False), (1, False), (2, True)]


def test_tag_keywords_word_boundaries_and_case(spark):
    from oakstore_spark.operators.text import tag_keywords

    kw = spark.createDataFrame(
        [("cat", "animal"), ("dog", "animal"), ("c++", "lang")],
        "keyword string, tag string",
    )
    rows = [
        (1, "my CAT is here"),          # case-insensitive
        (2, "concatenate strings"),     # substring must NOT match
        (3, "I write c++ daily"),       # regex metachars escaped
        (4, "dog and cat together"),    # one tag, deduped
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: list(r["tags"]) for r in tag_keywords(df, kw).collect()}
    assert out[1] == ["animal"]
    assert out[2] == []
    assert out[3] == ["lang"]
    assert out[4] == ["animal"]


def test_crawl_delays_group_selection_and_conservative_max(spark):
    """Crawl-delay parsing: agent-specific group shadows *, multiple
    delays take the most conservative (largest), unparseable and
    non-positive values are ignored, delay-less domains are absent,
    and the rate column is 60/delay."""
    from oakstore_spark.operators.urls import crawl_delays

    robots = spark.createDataFrame(
        [
            ("a.test", "User-agent: *\nCrawl-delay: 2.5\n"),
            (
                "b.test",
                "User-agent: oakbot\nCrawl-delay: 10\n\n"
                "User-agent: *\nCrawl-delay: 1\n",
            ),
            ("c.test", "User-agent: *\nCrawl-delay: 5\nCrawl-delay: 3\n"),
            ("d.test", "User-agent: *\nCrawl-delay: fast\n"),
            ("e.test", "User-agent: *\nCrawl-delay: -4\n"),
            ("f.test", "User-agent: *\nDisallow: /\n"),
        ],
        "reg_domain string, robots_txt string",
    )
    got = {
        r["reg_domain"]: (r["crawl_delay_sec"], r["max_requests_per_min"])
        for r in crawl_delays(robots, agent="oakbot").collect()
    }
    assert got == {
        "a.test": (2.5, 24.0),
        "b.test": (10.0, 6.0),
        "c.test": (5.0, 12.0),
    }
    # default agent: b.test falls to its * group
    star = {
        r["reg_domain"]: r["crawl_delay_sec"]
        for r in crawl_delays(robots).collect()
    }
    assert star["b.test"] == 1.0


def test_schedule_fetches_slots_and_defaults(spark):
    """Per-domain fetch queue: slots are a deterministic md5 shuffle,
    fetch_at_us = start + slot * delay_us exactly (integer micros),
    delay-less domains use the default, duplicates of the same URL get
    DISTINCT slots (they are separate fetches)."""
    from oakstore_spark.operators.urls import schedule_fetches

    delays = spark.createDataFrame(
        [("a.test", 2.0, 30.0)],
        "reg_domain string, crawl_delay_sec double, "
        "max_requests_per_min double",
    )
    urls = spark.createDataFrame(
        [(i, f"http://a.test/p{i}") for i in range(5)]
        + [(9, "http://b.test/x"), (10, "http://b.test/y")],
        "id long, url string",
    )
    out = schedule_fetches(urls, delays, start_us=1000).collect()
    assert len(out) == 7
    by_dom: dict = {}
    for r in out:
        by_dom.setdefault(r["reg_domain"], []).append(r)
    a = sorted(by_dom["a.test"], key=lambda r: r["fetch_slot"])
    assert [r["fetch_slot"] for r in a] == [0, 1, 2, 3, 4]
    for r in a:
        assert r["crawl_delay_sec"] == 2.0
        assert r["fetch_at_us"] == 1000 + r["fetch_slot"] * 2_000_000
    b = sorted(by_dom["b.test"], key=lambda r: r["fetch_slot"])
    assert [r["fetch_slot"] for r in b] == [0, 1]
    assert all(r["crawl_delay_sec"] == 1.0 for r in b)  # default
    # determinism: same inputs -> same slot assignment
    again = {
        (r["url"], r["fetch_slot"])
        for r in schedule_fetches(urls, delays, start_us=1000).collect()
    }
    assert {(r["url"], r["fetch_slot"]) for r in out} == again


# --- PMI collocations ------------------------------------------------------


def test_pmi_collocations_hand_corpus(spark):
    import math

    from oakstore_spark.operators.text import pmi_collocations

    # 'aa bb' always together (4x); 'cc' pairs promiscuously; a hapax
    # pair 'xx yy' must be suppressed by min_count
    docs = (
        ["aa bb"] * 4
        + ["cc dd", "cc ee", "cc ff", "cc gg"]
        + ["xx yy"]
    )
    df = spark.createDataFrame([(i, t) for i, t in enumerate(docs)],
                               ["doc_id", "text"])
    out = pmi_collocations(df, "text", min_count=2, top_k=10).collect()
    got = {(r.w1, r.w2): r for r in out}
    assert ("xx", "yy") not in got  # hapax suppressed
    r = got[("aa", "bb")]
    # N = 9 bigrams total; n_ab=4, marginals 4,4
    assert (r.n_ab, r.n_w1, r.n_w2) == (4, 4, 4)
    assert r.pmi == math.log(4 * 9 / (4.0 * 4))
    # perfect collocation outranks everything
    assert out[0].w1 == "aa" and out[0].w2 == "bb"


def test_rake_keywords_hand_corpus(spark):
    """Hand-replicated RAKE on a tiny corpus: phrase splitting at
    stopwords AND punctuation, degree/frequency word scores, the
    fixed-order fold, duplicate-occurrence dedup, and the tie rule."""
    from oakstore_spark.operators.text import rake_keywords

    docs = [
        (1, "deep learning of deep networks, and fast learning"),
        (2, "spark streaming engine; spark engine tuning; the engine"),
        (3, "red fish, red fish, blue"),  # duplicate phrase occurrence
    ]
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    out = rake_keywords(df, "doc_id", "text", top_k=5).collect()
    got = {}
    for r in out:
        got.setdefault(r.doc_id, []).append(r)

    # doc 1: phrases all score 4.0 (deep/learning freq2 deg4; others
    # freq1 deg2) -> alphabetical tie order
    d1 = sorted(got[1], key=lambda r: r.rank)
    assert [r.phrase for r in d1] == [
        "deep learning", "deep networks", "fast learning"
    ]
    assert all(r.score == 4.0 for r in d1)

    # doc 2: replicate the exact fold order (0.0 + sw in word order)
    sw = {"spark": 6 / 2, "streaming": 3 / 1, "engine": 7 / 3,
          "tuning": 3 / 1}

    def fold(phrase):
        acc = 0.0
        for w in phrase.split(" "):
            acc = acc + sw[w]
        return acc

    d2 = {r.phrase: r for r in got[2]}
    assert set(d2) == {"spark streaming engine", "spark engine tuning",
                       "engine"}
    for p, r in d2.items():
        assert r.score == fold(p), p
        assert r.n_words == len(p.split(" "))
    # tie between the two 3-word phrases (bit-identical folds here)
    # breaks alphabetically; 'engine' ranks last
    assert d2["engine"].rank == 3

    # doc 3: "red fish" occurs twice -> ONE output row, stats count
    # both occurrences (red: freq2 deg4 -> 2.0; fish same; blue 1.0)
    d3 = {r.phrase: r for r in got[3]}
    assert set(d3) == {"red fish", "blue"}
    assert d3["red fish"].score == 4.0 and d3["red fish"].rank == 1
    assert d3["blue"].score == 1.0 and d3["blue"].rank == 2


def test_s_stem_rule_semantics(spark):
    """Pin the documented IF/ELSE-IF cascade incl. the fall-through:
    a word failing rule 2's exception still reaches rule 3."""
    from oakstore_spark.functions.text import s_stem

    cases = {
        "policies": "policy",   # rule 1
        "ties": "ty",           # rule 1 (no length guard, documented)
        "movies": "movy",       # rule 1 (known S-stemmer quirk)
        "eies": "eies",         # rule 1 exception, no later rule fires? ends 'es' -> 'ees' exception -> rule 3: ends s not us/ss -> drop
        "dishes": "dishe",      # rule 2
        "goes": "goe",          # rule 2 exception 'oes' -> falls to rule 3
        "trees": "tree",        # 'ees' exception -> rule 3 drops the s
        "dogs": "dog",          # rule 3
        "glass": "glass",       # 'ss' exception
        "bus": "bus",           # 'us' exception
        "cat": "cat",           # no rule
    }
    df = spark.createDataFrame([(w,) for w in cases], ["w"])
    got = {r.w: r.s for r in df.select("w", s_stem("w").alias("s")).collect()}
    # resolve the two fall-through cases per the cascade semantics
    cases["eies"] = "eie"
    for w, want in cases.items():
        assert got[w] == want, (w, got[w], want)


def test_textrank_keywords_star_and_self_loop(spark):
    """On a star corpus the hub word must rank first; a word that
    only ever co-occurs with itself (self-loop) never enters the
    graph; normalization noise (case/punctuation) collapses into the
    same nodes."""
    from oakstore_spark.operators.text import textrank_keywords

    docs = spark.createDataFrame(
        [
            ("Hub alpha!",),
            ("hub, beta",),
            ("HUB gamma.",),
            ("hub delta",),
            ("echo echo",),  # self-loop only: must not appear
        ],
        ["text"],
    )
    out = textrank_keywords(docs, "text", top_k=10).collect()
    words = [r.word for r in out]
    assert words[0] == "hub"
    assert set(words) == {"hub", "alpha", "beta", "gamma", "delta"}
    # leaves are symmetric: identical ranks, alphabetical tiebreak
    assert words[1:] == ["alpha", "beta", "delta", "gamma"]
    leaf_ranks = {r.word: r.rank for r in out[1:]}
    assert len(set(leaf_ranks.values())) == 1
