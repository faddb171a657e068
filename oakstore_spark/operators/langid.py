"""Character-n-gram language identification (Cavnar & Trenkle 1994,
"N-Gram-Based Text Categorization" — public knowledge).

Replaces the r1 marker-word heuristic (``operators/text.py:lang_id``,
kept as the cheap fallback) with the real thing: per-language TOP-K
character-trigram RANK PROFILES trained distributed, then per-document
out-of-place distance scored with pure JVM built-ins.

Spark-first shape, 100 TB notes:

- **Training** is one shuffle keyed by (lang, gram) — partial
  aggregation map-side, then a per-language row_number over the
  *aggregated* gram counts (distinct trigrams per language are bounded
  ~10^4-10^5 regardless of corpus size, so the per-lang window runs
  over a tiny relation even when the labeled corpus is petabytes).
- **Scoring** shuffles once keyed by doc id (the doc-profile window),
  then joins the BROADCAST profile table (n_langs * top_k rows) — no
  second big shuffle; the distance aggregation reuses the doc-id
  partitioning.
- No Python in either path: trigram extraction is
  ``sequence``/``transform``/``substring``, ranking is ``row_number``,
  distance is ``sum(coalesce(abs(...)))``, argmin is a struct ``min``.

Reference parity: the reference (store.py:1-267) has no text operators
at all; this is EXT surface mandated by the LLM-pipeline brief.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

# Original seed sentences (written for this repo — deterministic
# fixture, not copied from any corpus). ASCII-only on purpose: the
# planted-recovery oracle needs byte-identical normalization in Spark
# and DuckDB, and unicode regex classes differ between engines. Real
# deployments would train on an accented corpus via
# ``train_lang_profiles`` directly.
SEED_SENTENCES: dict[str, list[str]] = {
    "en": [
        "the quick brown fox jumps over the lazy dog near the river",
        "she walked through the quiet garden while the rain kept falling",
        "every morning the old baker carries fresh bread to the market",
        "children love stories about dragons and castles in distant lands",
        "the weather this winter has been colder than anyone expected",
        "he found an old map hidden inside the wooden desk drawer",
        "our neighbors planted tomatoes and beans behind their small house",
        "the train arrives at the station exactly seven minutes late",
        "we must send the letter before the office closes this evening",
        "nobody knows why the lights went out during the long storm",
        "they were singing old songs together until the fire burned low",
        "i think that you should ask someone who knows the answer",
    ],
    "fr": [
        "le renard brun saute par dessus le chien pres de la riviere",
        "elle marche dans le jardin calme pendant que la pluie tombe",
        "chaque matin le vieux boulanger porte du pain frais au marche",
        "les enfants aiment les histoires de dragons et de chateaux lointains",
        "le temps cet hiver a ete plus froid que prevu selon tous",
        "il a trouve une vieille carte cachee dans le tiroir du bureau",
        "nos voisins ont plante des tomates derriere leur petite maison",
        "le train arrive a la gare avec sept minutes de retard",
        "nous devons envoyer la lettre avant que le bureau ne ferme",
        "personne ne sait pourquoi les lumieres se sont eteintes hier soir",
        "ils chantaient de vieilles chansons ensemble pres du feu mourant",
        "je pense que tu devrais demander a quelqu'un qui connait la reponse",
    ],
    "de": [
        "der braune fuchs springt ueber den faulen hund am fluss entlang",
        "sie ging durch den stillen garten waehrend der regen weiter fiel",
        "jeden morgen bringt der alte baecker frisches brot zum markt",
        "kinder lieben geschichten ueber drachen und burgen in fernen laendern",
        "das wetter in diesem winter war kaelter als alle erwartet hatten",
        "er fand eine alte karte versteckt in der schublade des tisches",
        "unsere nachbarn pflanzten tomaten und bohnen hinter ihrem kleinen haus",
        "der zug kommt genau sieben minuten zu spaet am bahnhof an",
        "wir muessen den brief schicken bevor das buero heute abend schliesst",
        "niemand weiss warum die lichter waehrend des sturms ausgegangen sind",
        "sie sangen gemeinsam alte lieder bis das feuer niedergebrannt war",
        "ich denke dass du jemanden fragen solltest der die antwort kennt",
    ],
    "es": [
        "el zorro marron salta sobre el perro perezoso cerca del rio",
        "ella camina por el jardin tranquilo mientras la lluvia sigue cayendo",
        "cada manana el viejo panadero lleva pan fresco al mercado",
        "los ninos aman las historias de dragones y castillos lejanos",
        "el clima este invierno ha sido mas frio de lo esperado",
        "encontro un viejo mapa escondido dentro del cajon del escritorio",
        "nuestros vecinos plantaron tomates y frijoles detras de su casa",
        "el tren llega a la estacion con siete minutos de retraso",
        "debemos enviar la carta antes de que cierre la oficina",
        "nadie sabe por que se apagaron las luces durante la tormenta",
        "cantaban viejas canciones juntos hasta que el fuego se apago",
        "creo que deberias preguntar a alguien que sepa la respuesta",
    ],
    "it": [
        "la volpe marrone salta sopra il cane pigro vicino al fiume",
        "lei cammina nel giardino tranquillo mentre la pioggia continua a cadere",
        "ogni mattina il vecchio fornaio porta il pane fresco al mercato",
        "i bambini amano le storie di draghi e castelli in terre lontane",
        "il tempo questo inverno e stato piu freddo del previsto",
        "ha trovato una vecchia mappa nascosta nel cassetto della scrivania",
        "i nostri vicini hanno piantato pomodori dietro la loro piccola casa",
        "il treno arriva alla stazione con sette minuti di ritardo",
        "dobbiamo spedire la lettera prima che chiuda l'ufficio stasera",
        "nessuno sa perche le luci si sono spente durante il temporale",
        "cantavano vecchie canzoni insieme finche il fuoco non si spense",
        "penso che dovresti chiedere a qualcuno che conosca la risposta",
    ],
    "pt": [
        "a raposa marrom pula sobre o cachorro preguicoso perto do rio",
        "ela caminha pelo jardim tranquilo enquanto a chuva continua caindo",
        "toda manha o velho padeiro leva pao fresco ao mercado",
        "as criancas adoram historias de dragoes e castelos em terras distantes",
        "o clima neste inverno tem sido mais frio do que o esperado",
        "ele encontrou um mapa antigo escondido na gaveta da escrivaninha",
        "nossos vizinhos plantaram tomates e feijao atras da casa pequena",
        "o trem chega na estacao com sete minutos de atraso",
        "precisamos enviar a carta antes que o escritorio feche hoje",
        "ninguem sabe por que as luzes se apagaram durante a tempestade",
        "cantavam velhas cancoes juntos ate que o fogo se apagou",
        "acho que voce deveria perguntar a alguem que saiba a resposta",
    ],
}


def seed_corpus(spark: SparkSession) -> DataFrame:
    """The built-in labeled seed corpus as (lang, text) — one row per
    seed sentence. Tiny by construction; callers with a real labeled
    corpus pass their own DataFrame to :func:`train_lang_profiles`."""
    rows = [
        (lang, s) for lang, sents in SEED_SENTENCES.items() for s in sents
    ]
    return spark.createDataFrame(rows, "lang string, text string")


def _normalized(col: Column) -> Column:
    # lowercase, collapse non-letter runs to single spaces, pad with
    # one space each side so trigrams see word boundaries (the CT
    # padding trick). \p{L} keeps accented letters on the real path;
    # the oracle fixtures stay ASCII so both engines agree.
    return F.concat(
        F.lit(" "),
        F.trim(F.regexp_replace(F.lower(col), r"[^\p{L}]+", " ")),
        F.lit(" "),
    )


def char_trigrams(col: Column | str) -> Column:
    """Array of overlapping character trigrams of the normalized text
    (empty array below 3 chars — guards sequence() from a negative
    range). Pure JVM: sequence + transform + substring."""
    c = F.col(col) if isinstance(col, str) else col

    def grams(s: Column) -> Column:
        return F.when(
            F.length(s) >= 3,
            F.transform(
                F.sequence(F.lit(1), F.length(s) - 2),
                lambda i: F.substring(s, i, 3),
            ),
        ).otherwise(F.array().cast("array<string>"))

    # bind the normalized string once (single-element transform idiom,
    # same as chunk_documents) so it is not recomputed per trigram
    return F.element_at(
        F.transform(F.array(_normalized(c)), grams), 1
    )


def train_lang_profiles(
    df: DataFrame,
    lang_col: str = "lang",
    text_col: str = "text",
    top_k: int = 300,
) -> DataFrame:
    """Distributed Cavnar-Trenkle training: (lang, gram, rank) rows for
    the ``top_k`` most frequent character trigrams of each language,
    rank 1 = most frequent, ties broken by gram ascending (determinism
    contract — every rank is reproducible cross-engine)."""
    counts = (
        df.select(
            F.col(lang_col).alias("lang"),
            F.explode(char_trigrams(text_col)).alias("gram"),
        )
        .groupBy("lang", "gram")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    w = Window.partitionBy("lang").orderBy(
        F.col("n").desc(), F.col("gram").asc()
    )
    return (
        counts.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= top_k)
        .select("lang", "gram", "rank")
    )


def classify_lang(
    df: DataFrame,
    profiles: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    doc_top_k: int = 300,
    penalty: int | None = None,
) -> DataFrame:
    """Score each document against every language profile with the
    out-of-place distance: rank the doc's own top trigrams, then
    sum |doc_rank - lang_rank| over them (a gram absent from the
    language profile costs ``penalty``; the default is the ACTUAL
    profile size — ``max(rank)`` over ``profiles``, the Cavnar-Trenkle
    convention — computed in-plan via a broadcast 1-row aggregate, so
    profiles trained with a different ``top_k`` than ``doc_top_k``
    still get the documented semantics). Output one row per doc:
    (id, pred_lang, oop_distance, runner_up_lang, margin) — ``margin``
    is the EXACT integer distance gap to the runner-up language, the
    confidence signal curation filters gate on ("keep if en with
    margin > x"); it is 0 when two languages tie (the struct-min
    tie-break still picks the lexicographically first) and null when
    fewer than two languages are profiled. Docs whose normalized text
    has no trigram (blank/symbol-only) degrade to a null pred_lang row
    rather than vanishing.

    Plan shape: one shuffle by doc id for the doc-profile window, then
    broadcast joins against the tiny profile table; the distance agg
    reuses the doc-id partitioning. Ties (same distance) break on lang
    ascending via the struct min."""
    if penalty is not None:
        pen_col = F.lit(penalty)
        pen_join = None
    else:
        pen_col = F.col("_pen")
        pen_join = F.broadcast(
            profiles.agg(F.max("rank").cast("int").alias("_pen"))
        )

    ids = df.select(F.col(id_col).alias("id")).distinct()
    doc_counts = (
        df.select(
            F.col(id_col).alias("id"),
            F.explode(char_trigrams(text_col)).alias("gram"),
        )
        .groupBy("id", "gram")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    w = Window.partitionBy("id").orderBy(
        F.col("n").desc(), F.col("gram").asc()
    )
    doc_grams = (
        doc_counts.withColumn("doc_rank", F.row_number().over(w))
        .where(F.col("doc_rank") <= doc_top_k)
        .select("id", "gram", "doc_rank")
    )

    # r15 optimization (guide §2.3/§2.4): the old shape crossJoined
    # every (doc, gram) row with every language (x n_langs rows),
    # joined the profile table, then aggregated by (id, lang) and AGAIN
    # by id — two extra corpus-sized exchanges on top of the doc-rank
    # window. Instead: broadcast the profile PIVOTED to one row per
    # gram (lang -> rank map), score every language map-side in one
    # aggregation that REUSES the window's id partitioning (no new
    # exchange), and take argmin/runner-up from an in-row sorted
    # array. Language set and penalty are collected from the (tiny,
    # persisted) profile relation at plan time. Identical integers,
    # identical (oop, lang) tie-break.
    from pyspark.storagelevel import StorageLevel

    profiles = profiles.persist(StorageLevel.MEMORY_AND_DISK)
    langs = [
        r["lang"]
        for r in profiles.select("lang").distinct().orderBy("lang").collect()
    ]
    if not langs:
        profiles.unpersist()
        return ids.select(
            F.col("id").alias(id_col),
            F.lit(None).cast("string").alias("pred_lang"),
            F.lit(None).cast("long").alias("oop_distance"),
            F.lit(None).cast("string").alias("runner_up_lang"),
            F.lit(None).cast("long").alias("margin"),
        )
    gmap = F.broadcast(
        profiles.groupBy("gram").agg(
            F.map_from_entries(
                F.collect_list(F.struct("lang", "rank"))
            ).alias("_rmap")
        )
    )
    probe = doc_grams.join(gmap, "gram", "left")
    if pen_join is not None:
        probe = probe.crossJoin(pen_join)
    scored = probe.groupBy("id").agg(
        *[
            F.sum(
                F.coalesce(
                    F.abs(
                        F.col("doc_rank")
                        - F.element_at(F.col("_rmap"), F.lit(lang))
                    ),
                    pen_col,
                )
            ).alias(f"_oop_{i}")
            for i, lang in enumerate(langs)
        ]
    )
    # one sorted (oop, lang) struct array per doc — element 1 is the
    # argmin with the lang-ascending tie-break, element 2 the runner-up
    best = scored.select(
        "id",
        F.sort_array(
            F.array(
                *[
                    F.struct(
                        F.col(f"_oop_{i}").alias("oop"),
                        F.lit(lang).alias("lang"),
                    )
                    for i, lang in enumerate(langs)
                ]
            )
        ).alias("ss"),
    )
    runner = F.try_element_at("ss", F.lit(2))  # null when only one lang
    out = best.select(
        "id",
        F.element_at("ss", 1)["lang"].alias("pred_lang"),
        F.element_at("ss", 1)["oop"].alias("oop_distance"),
        runner["lang"].alias("runner_up_lang"),
        (runner["oop"] - F.element_at("ss", 1)["oop"]).alias("margin"),
    )
    # blank/symbol-only docs have zero trigrams -> no scored rows;
    # surface them with a null prediction (degrade contract)
    from oakstore_spark.operators.scaling import track_persisted

    return track_persisted(
        ids.join(out, "id", "left").select(
            F.col("id").alias(id_col),
            "pred_lang",
            "oop_distance",
            "runner_up_lang",
            "margin",
        ),
        profiles,
    )
