from oakstore_spark.functions.vectors import cosine_similarity, dot, norm2
from oakstore_spark.functions.text import (
    char_ngram_codes,
    char_ngrams,
    fingerprint_md5,
    normalize_text,
    token_count,
    tokens,
)

__all__ = [
    "cosine_similarity",
    "dot",
    "norm2",
    "char_ngram_codes",
    "char_ngrams",
    "fingerprint_md5",
    "normalize_text",
    "token_count",
    "tokens",
]
