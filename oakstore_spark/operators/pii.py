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

from pyspark.sql import Column, DataFrame, Window
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


#: obviously-guessable salts rejected for ``secret_salt`` — a salt an
#: attacker can enumerate makes the memoized noise recomputable and
#: the "DP" release exactly invertible (r12 ADVICE, high)
_DP_WEAK_SALTS = frozenset(
    {"dp", "salt", "secret", "test", "default", "password", "changeme"}
)


def _resolve_dp_salt(
    secret_salt: str | None, replay_salt: str | None,
    epsilon: float | None = None,
) -> str:
    """The DP salt contract shared by every release operator here:
    exactly one of the two modes, and secret salts must not be
    guessable (see :func:`dp_release`'s docstring for why the salt IS
    the guarantee).  When ``epsilon`` is passed it must be a finite
    positive float: epsilon == 0 divides by zero in the Laplace
    scale and epsilon < 0 silently flips the noise sign — a privacy
    primitive whose salt fails fast must fail fast on a nonsensical
    budget too (r13 ADVICE, low)."""
    if epsilon is not None:
        eps = float(epsilon)
        if not (eps > 0.0) or eps != eps or eps == float("inf"):
            raise ValueError(
                "epsilon must be a finite float > 0 (got %r): the "
                "Laplace scale is sensitivity/epsilon" % (epsilon,)
            )
    if (secret_salt is None) == (replay_salt is None):
        raise ValueError(
            "pass exactly one of secret_salt (production DP; must be "
            "kept secret) or replay_salt (deterministic test/oracle "
            "mode; NOT differentially private)"
        )
    if secret_salt is not None:
        if (
            len(secret_salt) < 16
            or secret_salt.lower() in _DP_WEAK_SALTS
        ):
            raise ValueError(
                "secret_salt must be a high-entropy secret (>= 16 "
                "chars, not a dictionary word): a guessable salt "
                "makes the memoized noise recomputable and the "
                "release exactly invertible"
            )
        return secret_salt
    return replay_salt  # type: ignore[return-value]


def _laplace_noise(key: Column, b_scale: float) -> Column:
    """Deterministic Laplace(b_scale) draw: invert the CDF at the
    60-bit md5 uniform of ``key`` — the engine's replayable-randomness
    rung (Poisson bootstrap, hash sampling). The md5 is keyed by the
    salt embedded in ``key`` (see :func:`_resolve_dp_salt`)."""
    u60 = F.conv(F.substring(F.md5(key), 1, 15), 16, 10).cast("bigint")
    u = (u60.cast("double") + 0.5) / float(16**15)
    c = u - F.lit(0.5)
    return (
        F.lit(-b_scale)
        * F.signum(c)
        * F.log(F.lit(1.0) - F.lit(2.0) * F.abs(c))
    )


def dp_release(
    df: DataFrame,
    group_cols: list[str],
    epsilon: float,
    value_col: str | None = None,
    clamp: int | None = None,
    *,
    secret_salt: str | None = None,
    replay_salt: str | None = None,
) -> DataFrame:
    """Differentially-private aggregate release (Laplace mechanism,
    Dwork et al. 2006) — the numeric-release rung of the privacy
    family above :func:`k_anonymize`: per group, publish

        count mode (``value_col`` None):  n + Lap(1/ε)
        sum mode:  Σ clamp(x, 0, C) + Lap(C/ε)

    where clamping bounds each unit's contribution (the sensitivity),
    the textbook prerequisite for a finite noise scale.

    Noise is DETERMINISTIC per (group, salt): the Laplace draw comes
    from inverting the CDF at the 60-bit md5 uniform of
    ``salt:group_key`` — md5 keyed by the salt acting as a PRF.  This
    is the MEMOIZED-NOISE pattern real DP deployments use for
    repeated identical queries (returning the same noisy answer
    prevents averaging attacks and re-spends no budget); releasing
    under a NEW salt is a new ε-spend — budget accounting is the
    caller's responsibility, stated, not solved, here.

    THE SALT IS THE WHOLE GUARANTEE.  The group keys appear in the
    released output, so anyone who knows the salt (or can guess it)
    recomputes every noise value and subtracts it — ε is then
    effectively infinite.  Hence exactly ONE of two keyword-only
    modes must be chosen, and neither has a default:

    - ``secret_salt``: a caller-supplied high-entropy value (>= 16
      chars, not a dictionary word — enforced) that MUST be kept
      secret (a KMS secret, not source code) for the DP guarantee to
      hold.  This is the production mode.
    - ``replay_salt``: any string, accepted verbatim, and providing
      NO differential privacy — the release is a deterministic public
      function of the data.  This is the TEST/ORACLE mode: it makes
      the release exactly replayable (the oracle rebuilds every noise
      value bit-for-bit; ln is the known <=1-ulp libm class).

    Spark shape: one hash aggregate to the group relation; noise is a
    per-group map-side expression on that tiny relation.  Returns
    (group_cols..., released) — the TRUE aggregate never leaves the
    operator.
    """
    salt = _resolve_dp_salt(secret_salt, replay_salt, epsilon)
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
    noise = _laplace_noise(key, b_scale)
    return agg.select(
        *group_cols,
        (F.col("_true").cast("double") + noise).alias("released"),
    )


def dp_histogram(
    df: DataFrame,
    value_col: str,
    epsilon: float,
    n_bins: int,
    lo: float,
    hi: float,
    *,
    secret_salt: str | None = None,
    replay_salt: str | None = None,
) -> DataFrame:
    """Differentially-private histogram release — the binned mode of
    :func:`dp_release` (r12 verdict ask #4): equal-width bins over
    the CALLER-SUPPLIED public range ``[lo, hi)``, per-bin count +
    Lap(1/ε).  Each unit lands in exactly one bin, so the bins are
    disjoint and PARALLEL COMPOSITION applies: the whole histogram
    costs one ε, not n_bins·ε.

    Two leak-proofing rules a naive implementation gets wrong, both
    enforced here:

    - Bin edges must be DATA-INDEPENDENT (public constants from the
      caller — deriving them from a min/max scan, the psi_drift
      pattern, would leak the extremes).  Values outside [lo, hi)
      clamp into the edge bins (floor-expression shared with
      psi_drift, so the whole release replays in SQL).
    - EVERY bin row is emitted, including true-zero ones (a missing
      row would reveal the zero exactly): the grid is generated
      (spark.range), counts LEFT-join onto it, and zero counts get
      noise like any other.

    Salt contract identical to :func:`dp_release` (secret_salt =
    production DP, replay_salt = deterministic test/oracle mode with
    NO privacy); noise is memoized per (salt, bin).  NULL values are
    excluded (documented — they carry no bin).

    Spark shape: ONE hash aggregate to <= n_bins rows, broadcast-join
    onto the literal grid, noise map-side on that tiny relation.
    Returns (bin, bin_lo, bin_hi, released) — true counts never leave.
    """
    salt = _resolve_dp_salt(secret_salt, replay_salt, epsilon)
    if n_bins < 1:
        raise ValueError("n_bins must be >= 1")
    lo = float(lo)
    hi = float(hi)
    if not hi > lo:
        raise ValueError("need hi > lo (a public, data-independent range)")
    width = (hi - lo) / n_bins
    x = F.col(value_col)
    bin_id = F.greatest(
        F.least(
            F.floor((x - F.lit(lo)) / F.lit(width)),
            F.lit(n_bins - 1),
        ),
        F.lit(0),
    ).cast("bigint")
    counts = (
        df.where(x.isNotNull())
        .groupBy(bin_id.alias("bin"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("_true"))
    )
    grid = df.sparkSession.range(n_bins).select(
        F.col("id").cast("bigint").alias("bin")
    )
    joined = grid.join(F.broadcast(counts), "bin", "left").select(
        "bin", F.coalesce(F.col("_true"), F.lit(0)).alias("_true")
    )
    key = F.concat_ws(
        ":", F.lit(salt), F.col("bin").cast("string")
    )
    noise = _laplace_noise(key, 1.0 / float(epsilon))
    return joined.select(
        "bin",
        (F.lit(lo) + F.col("bin").cast("double") * F.lit(width)).alias(
            "bin_lo"
        ),
        (
            F.lit(lo) + (F.col("bin") + 1).cast("double") * F.lit(width)
        ).alias("bin_hi"),
        (F.col("_true").cast("double") + noise).alias("released"),
    )


def dp_quantiles(
    df: DataFrame,
    value_col: str,
    epsilon: float,
    n_bins: int,
    lo: float,
    hi: float,
    qs: list[float],
    *,
    secret_salt: str | None = None,
    replay_salt: str | None = None,
) -> DataFrame:
    """Differentially-private quantiles by POST-PROCESSING the
    :func:`dp_histogram` release — post-processing is ε-free (Dwork &
    Roth Prop. 2.1), so the quantiles cost the histogram's single ε
    and nothing more.  Per requested quantile q:

    1. clamp each released bin count at 0 (negative noise draws),
    2. running-sum the clamped counts in bin order (an n_bins-bounded
       prefix window — the roc_auc bounded-window class),
    3. find the FIRST bin whose cumulative mass reaches q·total and
       linearly interpolate inside it.

    Everything downstream of the noise is a deterministic float chain
    on the n_bins relation, so the whole release (histogram AND
    quantiles) replays in SQL under replay_salt.  Degenerate release
    (total clamped mass 0) returns NULL values.  Same salt contract
    and public-range rules as :func:`dp_histogram`.

    Returns one row per q: (q, value).
    """
    hist = dp_histogram(
        df, value_col, epsilon, n_bins, lo, hi,
        secret_salt=secret_salt, replay_salt=replay_salt,
    )
    width = (float(hi) - float(lo)) / n_bins
    pos = F.greatest(F.col("released"), F.lit(0.0))
    wpre = Window.orderBy("bin").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    cum = hist.select(
        "bin",
        "bin_lo",
        pos.alias("_pos"),
        F.sum(pos).over(wpre).alias("_cum"),
    )
    tot = cum.agg(F.max("_cum").alias("_tot"))
    grid = df.sparkSession.createDataFrame(
        [(float(q),) for q in qs], "q double"
    )
    hits = (
        F.broadcast(grid)
        .crossJoin(F.broadcast(tot))
        .join(
            cum,
            F.col("_cum") >= F.col("q") * F.col("_tot"),
            "left",
        )
        .groupBy("q")
        .agg(
            F.min_by(
                F.struct("bin", "bin_lo", "_pos", "_cum"), F.col("bin")
            ).alias("_hit"),
            F.max(F.col("q") * F.col("_tot")).alias("_target"),
        )
    )
    prev = F.col("_hit._cum") - F.col("_hit._pos")
    value = F.when(
        (F.col("_hit._pos") > 0) & (F.col("_target") > 0),
        F.col("_hit.bin_lo")
        + (F.col("_target") - prev) / F.col("_hit._pos") * F.lit(width),
    )
    return hits.select("q", value.alias("value"))
