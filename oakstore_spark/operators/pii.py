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
    return df.join(safe, quasi_cols, "left_semi")
