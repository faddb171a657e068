"""PII detection and redaction for training-data curation — the full
family beyond the email/phone rung in ``operators/curation.py``:
emails, NANP-style phone numbers, IPv4 addresses (octet-range
validated), and payment-card numbers with a REAL Luhn check, all
computed JVM-side (regexp + higher-order array functions, zero Python
in the row path).

Why Luhn matters: a bare 13-19-digit regex flags order ids, ISBNs and
timestamps as "credit cards" — the checksum cuts that false-positive
mass by 10x, which at 100 TB is the difference between surgical
redaction and shredding numeric columns. The checksum runs as an
``aggregate`` over a ``sequence`` of digit positions — whole-stage
codegen keeps it in the JVM.

Scale shape: everything here is a map-side projection — no shuffle, no
UDF, no driver traffic. Filters on ``has_pii`` push down to the scan
when the detection columns are materialized.

Reference parity: the reference (store.py:1-267) has no text surface;
EXT operator mandated by the LLM-pipeline brief.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from oakstore_spark.operators.curation import EMAIL_RE, PHONE_RE

# 0-255 per octet, word-bounded so 999.1.1.1 and 1.2.3.4.5 never match
_OCTET = r"(?:25[0-5]|2[0-4][0-9]|1[0-9]{2}|[1-9]?[0-9])"
IPV4_RE = rf"\b{_OCTET}\.{_OCTET}\.{_OCTET}\.{_OCTET}\b"

# 13-19 digits in groups separated by single spaces or dashes — the
# layouts cards are typed in; RE2-safe (no lookaround/backrefs)
CARD_CANDIDATE_RE = r"\b(?:[0-9][ -]?){12,18}[0-9]\b"


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def luhn_valid(digits: Column) -> Column:
    """Luhn checksum over a digit-only string column, pure JVM:
    from the RIGHTMOST digit, double every second digit (subtracting 9
    when the double exceeds 9) and require the total to divide by 10.
    Null/too-short inputs return false, never error."""
    n = F.length(digits)
    total = F.aggregate(
        F.sequence(F.lit(1), n),
        F.lit(0),
        lambda acc, i: acc
        + F.when(
            (n - i) % 2 == 1,
            # doubled position: 2d - 9 when 2d > 9 <=> d >= 5
            F.when(
                F.ascii(F.substring(digits, i, 1)) - 48 >= 5,
                (F.ascii(F.substring(digits, i, 1)) - 48) * 2 - 9,
            ).otherwise((F.ascii(F.substring(digits, i, 1)) - 48) * 2),
        ).otherwise(F.ascii(F.substring(digits, i, 1)) - 48),
    )
    return F.when(
        digits.isNotNull() & (n >= 13) & (n <= 19), total % 10 == 0
    ).otherwise(F.lit(False))


def card_matches(col: Column | str, valid_only: bool = True) -> Column:
    """Array of card-number matches AS TYPED (separators kept, so the
    caller can literal-replace them); ``valid_only`` filters through
    the Luhn check on the separator-stripped digits."""
    cands = F.regexp_extract_all(_c(col), F.lit(CARD_CANDIDATE_RE), F.lit(0))
    if not valid_only:
        return cands
    return F.filter(
        cands, lambda m: luhn_valid(F.regexp_replace(m, r"[ -]", ""))
    )


def detect_pii(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Append per-row PII signal columns: match counts per category
    (emails, phones, IPv4, Luhn-VALID cards, raw card candidates) and
    a ``has_pii`` flag. Pure projection — composes with any scan."""
    c = _c(text_col)
    n_emails = F.size(F.regexp_extract_all(c, F.lit(EMAIL_RE), F.lit(0)))
    n_phones = F.size(F.regexp_extract_all(c, F.lit(PHONE_RE), F.lit(0)))
    n_ipv4 = F.size(F.regexp_extract_all(c, F.lit(IPV4_RE), F.lit(0)))
    n_card_cands = F.size(card_matches(c, valid_only=False))
    n_cards = F.size(card_matches(c, valid_only=True))
    return df.select(
        "*",
        n_emails.alias("n_emails"),
        n_phones.alias("n_phones"),
        n_ipv4.alias("n_ipv4"),
        n_card_cands.alias("n_card_candidates"),
        n_cards.alias("n_cards_valid"),
        (
            (n_emails > 0) | (n_phones > 0) | (n_ipv4 > 0) | (n_cards > 0)
        ).alias("has_pii"),
    )


def redact_pii_all(col: Column | str) -> Column:
    """Typed-placeholder scrub of every category: Luhn-valid cards ->
    ``<CARD>`` FIRST (before the IP pass can nibble digit groups),
    then emails -> ``<EMAIL>``, phones -> ``<PHONE>``, IPv4 -> ``<IP>``.
    Card replacement is conditional on the checksum, which a regex
    cannot express — so valid matches are folded over the text with
    literal ``replace`` (an ``aggregate`` over the match array, still
    JVM-side). Invalid candidates (order ids, ISBNs) are left intact."""
    c = _c(col)
    carded = F.aggregate(
        card_matches(c, valid_only=True),
        c,
        lambda acc, m: F.replace(acc, m, F.lit("<CARD>")),
    )
    emailed = F.regexp_replace(carded, EMAIL_RE, "<EMAIL>")
    phoned = F.regexp_replace(emailed, PHONE_RE, "<PHONE>")
    return F.regexp_replace(phoned, IPV4_RE, "<IP>")


def k_anonymity_report(
    df: DataFrame,
    quasi_cols: list[str],
    sensitive_col: str | None = None,
) -> DataFrame:
    """Re-identification risk assessment (Sweeney's k-anonymity and
    Machanavajjhala's l-diversity — both public): group the table by
    its QUASI-IDENTIFIER columns and report, per equivalence class,
    its size (``k_size`` — the k the class attains; a class of 1 is a
    unique, directly re-identifiable row) and, when ``sensitive_col``
    is given, its distinct-sensitive-value count (``l_distinct`` — an
    l of 1 means the sensitive value is DISCLOSED for everyone in the
    class even at high k).

    ONE hash aggregate over the table (count + count distinct carried
    through partial aggregation); the output is one row per
    equivalence class — the relation privacy tooling thresholds
    (`WHERE k_size < k_required`), suppresses, or generalizes on."""
    aggs = [F.count(F.lit(1)).cast("long").alias("k_size")]
    if sensitive_col is not None:
        aggs.append(
            F.countDistinct(sensitive_col).cast("long").alias("l_distinct")
        )
    out = df.groupBy(*quasi_cols).agg(*aggs)
    if sensitive_col is None:
        out = out.withColumn("l_distinct", F.lit(None).cast("long"))
    return out


def k_anonymize(
    df: DataFrame,
    quasi_cols: list[str],
    k: int,
) -> DataFrame:
    """Suppression-based k-anonymization: drop every row whose
    quasi-identifier equivalence class holds fewer than ``k`` rows —
    the baseline release gate (generalization hierarchies are
    domain-specific; suppression is the universal floor). One
    aggregate finds the undersized classes, one broadcast-friendly
    semi-join keeps the safe rows; row content never shuffles."""
    safe = (
        df.groupBy(*quasi_cols)
        .agg(F.count(F.lit(1)).alias("_n"))
        .where(F.col("_n") >= k)
        .drop("_n")
    )
    return _semi_join_nullsafe(df, safe, quasi_cols)


def _semi_join_nullsafe(df: DataFrame, keys: DataFrame, cols: list[str]):
    """left-semi join on the quasi key with NULL-SAFE equality — a
    generalization level can be NULL ('fully general'), and SQL GROUP
    BY already treats NULLs as one class, so the release gate must
    match rows the same way (a plain equi-join silently drops every
    row of a NULL-keyed class)."""
    k2 = keys.select(*[F.col(c).alias(f"_k_{c}") for c in cols])
    cond = None
    for c in cols:
        e = F.col(c).eqNullSafe(F.col(f"_k_{c}"))
        cond = e if cond is None else cond & e
    return df.join(k2, cond, "left_semi")


def k_anonymize_generalized(
    df: DataFrame,
    hierarchies: dict[str, list[Column]],
    k: int,
    max_suppression: float = 0.0,
) -> DataFrame:
    """Generalization-based k-anonymization (Samarati's full-domain
    generalization — public): each quasi-identifier column carries a
    VALUE HIERARCHY (levels 1..L of successively coarser recodings,
    e.g. zip -> zip3 -> zip1 -> '*', age -> decade-band -> '*';
    level 0 is the original column), and the release coarsens
    MINIMALLY before suppressing — the standard rung above
    :func:`k_anonymize`, which can only drop rows and loses far more
    data at the same k.

    Deterministic search (engine-replayable, no heuristic scoring):
    candidate level vectors walk a ROUND-ROBIN ladder in the
    hierarchy-dict's column order — (0,0,..), (1,0,..), (1,1,..),
    (2,1,..), ... — and the FIRST vector whose suppressed-row share
    (rows in generalized classes smaller than ``k``) is at most
    ``max_suppression`` wins; if none qualifies, the fully-general
    vector applies. Rows in undersized classes at the chosen vector
    are suppressed, so the output always attains k exactly as
    :func:`k_anonymity_report` measures it.

    Cost model at 100 TB: each ladder step is ONE hash aggregate on
    the (generalized) quasi key producing class sizes — ladder length
    is sum(levels)+1 (a handful), row content never shuffles, and the
    final release is the same agg + broadcast-friendly left-semi join
    shape as suppression-only.

    Returns the released rows with the quasi columns REPLACED by their
    chosen-level generalizations (other columns intact)."""
    if k < 1:
        raise ValueError("k must be >= 1")
    cols = list(hierarchies)
    if not cols:
        raise ValueError("hierarchies must be non-empty")
    for c in cols:
        if not hierarchies[c]:
            raise ValueError(f"hierarchy for {c!r} must have >= 1 level")

    def gen_expr(c: str, lvl: int) -> Column:
        return F.col(c) if lvl == 0 else hierarchies[c][lvl - 1]

    # round-robin ladder of level vectors
    levels = {c: 0 for c in cols}
    ladder = [dict(levels)]
    exhausted = False
    while not exhausted:
        exhausted = True
        for c in cols:
            if levels[c] < len(hierarchies[c]):
                levels[c] += 1
                ladder.append(dict(levels))
                exhausted = False

    total = df.count()
    chosen = ladder[-1]
    for vec in ladder:
        key = [gen_expr(c, vec[c]).alias(c) for c in cols]
        suppressed = (
            df.groupBy(*key)
            .agg(F.count(F.lit(1)).alias("_n"))
            .where(F.col("_n") < k)
            .agg(F.coalesce(F.sum("_n"), F.lit(0)).alias("_s"))
            .collect()[0]["_s"]
        )
        if total == 0 or suppressed <= max_suppression * total:
            chosen = vec
            break

    gen = df.select(
        *[c for c in df.columns if c not in cols],
        *[gen_expr(c, chosen[c]).alias(c) for c in cols],
    )
    safe = (
        gen.groupBy(*cols)
        .agg(F.count(F.lit(1)).alias("_n"))
        .where(F.col("_n") >= k)
        .drop("_n")
    )
    return _semi_join_nullsafe(gen, safe, cols)


def dp_release(
    df: DataFrame,
    group_cols: list[str],
    epsilon: float,
    value_col: str | None = None,
    clamp: int | None = None,
    salt: str = "dp",
) -> DataFrame:
    """Differentially-private aggregate release (Laplace mechanism,
    Dwork et al. 2006) — the numeric-release rung of the privacy
    family above :func:`k_anonymize`: per group, publish

        count mode (``value_col`` None):  n + Lap(1/ε)
        sum mode:  Σ clamp(x, 0, C) + Lap(C/ε)

    where clamping bounds each unit's contribution (the sensitivity),
    the textbook prerequisite for a finite noise scale.

    Noise is DETERMINISTIC per (group, salt): the Laplace draw comes
    from inverting the CDF at the 60-bit md5 uniform of the group key
    — the engine's replayable-randomness rung (Poisson bootstrap,
    hash sampling).  This is the MEMOIZED-NOISE pattern real DP
    deployments use for repeated identical queries (returning the
    same noisy answer prevents averaging attacks and re-spends no
    budget); releasing under a NEW salt is a new ε-spend — budget
    accounting is the caller's responsibility, stated, not solved,
    here.  Determinism also makes the release exactly testable: the
    oracle replays every noise value bit-for-bit (the ln evaluation
    is the known <=1-ulp libm class).

    Spark shape: one hash aggregate to the group relation; noise is a
    per-group map-side expression on that tiny relation.  Returns
    (group_cols..., released) — the TRUE aggregate never leaves the
    operator.
    """
    if value_col is not None and clamp is None:
        raise ValueError("sum mode requires clamp (sensitivity)")
    b_scale = (
        1.0 / float(epsilon)
        if value_col is None
        else float(clamp) / float(epsilon)
    )
    if value_col is None:
        agg = df.groupBy(*group_cols).agg(
            F.count(F.lit(1)).cast("bigint").alias("_true")
        )
    else:
        x = F.least(
            F.greatest(F.col(value_col).cast("bigint"), F.lit(0)),
            F.lit(int(clamp)),
        )
        agg = df.groupBy(*group_cols).agg(
            F.sum(x).cast("bigint").alias("_true")
        )
    key = F.concat_ws(
        ":", F.lit(salt), *[F.col(c).cast("string") for c in group_cols]
    )
    u60 = F.conv(F.substring(F.md5(key), 1, 15), 16, 10).cast("bigint")
    u = (u60.cast("double") + 0.5) / float(16**15)
    c = u - F.lit(0.5)
    noise = (
        F.lit(-b_scale)
        * F.signum(c)
        * F.log(F.lit(1.0) - F.lit(2.0) * F.abs(c))
    )
    return agg.select(
        *group_cols,
        (F.col("_true").cast("double") + noise).alias("released"),
    )
