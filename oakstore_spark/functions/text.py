"""Text-analysis scalar functions — all built-in pyspark.sql.functions
(JVM-side, codegen'd; no Python in the hot path).

Used by the LLM-data-pipeline operators (token counting, quality
scoring, fingerprinting, shingling for MinHash). Every function here has
a DuckDB-expressible equivalent so operators built on them can be
oracle-checked.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def tokens(col: Column | str) -> Column:
    """Whitespace tokenization. Empty/blank text -> empty array."""
    c = F.trim(_c(col))
    return F.when(F.length(c) == 0, F.array().cast("array<string>")).otherwise(
        F.split(c, r"\s+")
    )


def token_count(col: Column | str) -> Column:
    """Number of whitespace tokens (bigint)."""
    return F.size(tokens(col)).cast("bigint")


# BPE-ish segmentation: a letter run is ~one token, each digit is its
# own token (GPT-2-style), every other non-space char is a token. The
# char classes are ASCII so Java (Spark) and RE2 (DuckDB) agree exactly.
BPE_TOKEN_PATTERN = r"[a-zA-Z]+|[0-9]|[^a-zA-Z0-9\s]"


def bpe_token_count(col: Column | str) -> Column:
    """Approximate BPE token count (bigint): non-overlapping matches of
    ``BPE_TOKEN_PATTERN`` — a cheap, deterministic stand-in for a real
    tokenizer's token count, good for length filtering and cost
    estimates in a training-data pipeline."""
    return F.regexp_count(_c(col), F.lit(BPE_TOKEN_PATTERN)).cast("bigint")


_NFKC_UDF = None


def _nfkc():
    """Cached Arrow-batched NFKC normalizer (the one step Java/DuckDB
    SQL can't express; everything after it stays JVM-side regex)."""
    global _NFKC_UDF
    if _NFKC_UDF is None:
        import unicodedata

        from pyspark.sql.functions import pandas_udf

        @pandas_udf("string")
        def nfkc(texts: pd.Series) -> pd.Series:
            return texts.map(
                lambda t: None if t is None
                else unicodedata.normalize("NFKC", t)
            )

        _NFKC_UDF = nfkc
    return _NFKC_UDF


def normalize_text(col: Column | str, unicode_mode: bool = False) -> Column:
    """Canonical form for dedup: lowercase, strip non-alphanumerics,
    collapse whitespace.

    Default (ASCII) mode is the original engine-portable rung:
    ``[^a-z0-9\\s]`` stripping — correct on Latin corpora, but on a
    CJK/Cyrillic corpus every document normalizes toward EMPTY and the
    whole dedup family degenerates (all docs become each other's
    duplicates). ``unicode_mode=True`` is the multilingual rung:
    NFKC compatibility normalization (fullwidth Ｔｅｓｔ → Test,
    ligature ﬁ → fi, ideographic space U+3000 → space), then
    unicode-aware lowercase, then strip everything outside
    ``\\p{L}\\p{N}\\s`` (ANY script's letters/digits survive — Java
    regex \\p{L} is the Unicode category, matching RE2's, so a DuckDB
    oracle replays the post-NFKC steps verbatim and bakes the NFKC
    mapping for planted characters)."""
    if unicode_mode:
        c = _nfkc()(_c(col))
        c = F.lower(c)
        c = F.regexp_replace(c, r"[^\p{L}\p{N}\s]", "")
        c = F.regexp_replace(c, r"\s+", " ")
        return F.trim(c)
    c = F.lower(_c(col))
    c = F.regexp_replace(c, r"[^a-z0-9\s]", "")
    c = F.regexp_replace(c, r"\s+", " ")
    return F.trim(c)


def char_ngrams(col: Column | str, n: int, distinct: bool = True) -> Column:
    """Character n-gram shingles of a string (JVM-side: sequence +
    transform + substring; no exploding).

    The input expression is bound ONCE as a lambda variable of a
    1-element ``transform`` before the per-position loop. Without this,
    a computed input (e.g. ``normalize_text``) is inlined into the inner
    lambda and re-evaluated for EVERY shingle position — O(len^2) regex
    work per document (observed 10x+ on the minhash pipeline).
    """

    def grams(c: Column) -> Column:
        g = F.transform(
            F.sequence(F.lit(1), F.greatest(F.length(c) - F.lit(n - 1), F.lit(1))),
            lambda i: F.substring(c, i, n),
        )
        return F.array_distinct(g) if distinct else g

    return F.element_at(F.transform(F.array(_c(col)), grams), 1)


def char_ngram_codes(n: int = 3, unicode_mode: bool = False):
    """Vectorized (Arrow) shingler: normalized text -> SORTED DISTINCT
    integer gram codes — an INJECTIVE encoding, so code equality IS
    string equality: exact set semantics, not a hash. Strings shorter
    than ``n`` map to a length-tagged code outside the n-gram range,
    mirroring ``substring(s, i, n)``'s behavior of yielding the whole
    short string as the only shingle.

    Default (ASCII) mode packs 7 bits per char into int32 (normalized
    text is [a-z0-9 ], all < 0x80). ``unicode_mode=True`` is the
    multilingual rung: the text decodes to CODEPOINTS (utf-32 view —
    one element per character, any script) packed 21 bits per char
    into int64 — still injective (every codepoint <= 0x10FFFF < 2^21;
    n <= 3 keeps 3*21 = 63 bits in range), returned as ``array<long>``
    with short strings tagged above 2^63 via the uint64 view.

    This replaces a per-position ``transform``+``substring``+
    ``array_distinct`` HOF chain (interpreted, allocates len(s) small
    strings per doc) with one numpy kernel per Arrow batch — the
    difference is ~4x on shingling-heavy pipelines, and downstream
    joins/aggregations carry fixed-width ints instead of strings.
    """
    from pyspark.sql.functions import pandas_udf

    if unicode_mode:
        if not 1 <= n <= 3:
            raise ValueError(
                "n must be in [1, 3] for injective 21-bit int64 packing"
            )

        @pandas_udf("array<long>")
        def codes_u(texts):
            out = []
            for t in texts:
                if t is None:
                    out.append(None)
                    continue
                cp = np.frombuffer(
                    t.encode("utf-32-le"), dtype=np.uint32
                ).astype(np.uint64)
                length = cp.size
                if length >= n:
                    h = np.zeros(length - n + 1, dtype=np.uint64)
                    for k in range(n):
                        h = (h << np.uint64(21)) | cp[k : length - n + 1 + k]
                    out.append(np.unique(h).view(np.int64))
                else:
                    acc = np.uint64(0)
                    for k in range(length):
                        acc = (acc << np.uint64(21)) | cp[k]
                    # tag bit 63 + length field above the packed chars:
                    # disjoint from every regular (< 2^63) gram code
                    code = (np.uint64(1) << np.uint64(63)) \
                        | (np.uint64(length) << np.uint64(21 * (n - 1))) \
                        | acc
                    out.append(
                        np.asarray([code], dtype=np.uint64).view(np.int64)
                    )
            return pd.Series(out)

        return codes_u

    if not 1 <= n <= 4:
        raise ValueError("n must be in [1, 4] for 7-bit int32 packing")

    short_base = np.int64(1 << (7 * n))

    @pandas_udf("array<int>")
    def codes(texts):
        out = []
        for t in texts:
            if t is None:
                out.append(None)
                continue
            b = np.frombuffer(t.encode("ascii", "replace"), dtype=np.uint8).astype(
                np.int64
            )
            length = b.size
            if length >= n:
                h = np.zeros(length - n + 1, dtype=np.int64)
                for k in range(n):
                    h = (h << 7) | b[k : length - n + 1 + k]
                out.append(np.unique(h).astype(np.int32))
            else:
                packed = 0
                for k in range(length):
                    packed = (packed << 7) | int(b[k])
                code = int(short_base) + (length << (7 * (n - 1))) + packed
                out.append(np.asarray([code], dtype=np.int32))
        return pd.Series(out)

    return codes


def fingerprint_md5(col: Column | str) -> Column:
    """Deterministic content fingerprint: md5 hex of the normalized text
    (md5 is engine-portable — same string in Spark and DuckDB)."""
    return F.md5(normalize_text(col))


def s_stem(col: Column | str) -> Column:
    """Harman S-stemmer (Harman 1991, "How effective is suffixing?") —
    the light, precision-safe English stemmer (plural collapse only;
    no Porter-style over-stemming), as a pure JVM expression with an
    exact SQL replay.

    Rules, as an IF/ELSE-IF cascade where a failed exception falls
    through to the next rule (semantics pinned by pytest):

      1. ends 'ies' and not 'eies'/'aies'  ->  'ies' -> 'y'
      2. else ends 'es' and not 'aes'/'ees'/'oes'  ->  drop the 's'
      3. else ends 's' and not 'us'/'ss'  ->  drop the 's'

    Engine parity: LIKE endings + substring arithmetic only — DuckDB
    replays the identical CASE chain.
    """
    c = _c(col)

    def ends(sfx: str) -> Column:
        return c.like(f"%{sfx}")

    drop_last = F.substring(c, F.lit(1), F.length(c) - 1)
    return (
        F.when(
            ends("ies") & ~ends("eies") & ~ends("aies"),
            F.concat(F.substring(c, F.lit(1), F.length(c) - 3), F.lit("y")),
        )
        .when(
            ends("es") & ~ends("aes") & ~ends("ees") & ~ends("oes"),
            drop_last,
        )
        .when(ends("s") & ~ends("us") & ~ends("ss"), drop_last)
        .otherwise(c)
    )
