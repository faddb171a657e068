"""HTML → main-text extraction: the first operator of every web-crawl
training pipeline (tag stripping + per-block text/link-density scoring,
the C4/jusText/trafilatura family of heuristics re-expressed as pure
JVM expressions — no Python UDF anywhere in the path).

Pipeline per document, all higher-order / regexp built-ins:

1. drop ``<script>``/``<style>``/comments wholesale (their text is
   never content);
2. split the markup into blocks at block-level boundary tags
   (``p/div/h1..h6/li/tr/td/th/ul/ol/table/article/section/header/
   footer/nav/br``) — one ``split`` on a case-insensitive alternation;
3. per block: the text inside ``<a ...>...</a>`` is the LINK text;
   everything after full tag-stripping + entity decode + whitespace
   collapse is the block text;
4. keep a block iff its text is >= ``min_chars`` AND its link density
   (link chars / text chars) is <= ``max_link_density`` — navigation
   bars, footers and cookie banners are nearly-all-links and fall out;
5. join survivors with a single newline.

Malformed markup degrades, never fails: an unclosed tag simply strips
to nothing, non-HTML text passes through as one block of itself (its
link density is 0), and null input yields null output.

100 TB: entirely map-side (regexp + array HOFs inside whole-stage
codegen) — zero shuffles; the natural downstream is
``line_dedup_corpus`` on the extracted text.

Reference parity: the reference (store.py:1-267) has no text operators;
EXT surface from the LLM-pipeline brief.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# block-level boundary tags (opening or closing, any attributes)
_BLOCK_SPLIT = (
    r"(?i)</?(?:p|div|h[1-6]|li|tr|td|th|ul|ol|table|article|section"
    r"|header|footer|nav|main|aside|blockquote|br)(?:\s[^>]*)?/?>"
)
_DROP_WHOLESALE = r"(?is)<(script|style)(?:\s[^>]*)?>.*?</\1\s*>|<!--.*?-->"
_ANY_TAG = r"(?s)<[^>]*>"
_LINK_TEXT = r"(?is)<a(?:\s[^>]*)?>(.*?)</a\s*>"


def _decode_entities(c: Column) -> Column:
    # the five XML predefined entities + nbsp cover the planted-fixture
    # and boilerplate cases; anything rarer passes through literally
    for ent, rep in (
        ("&nbsp;", " "),
        ("&lt;", "<"),
        ("&gt;", ">"),
        ("&quot;", '"'),
        ("&#39;", "'"),
        ("&amp;", "&"),  # last, so &amp;lt; does not double-decode
    ):
        c = F.replace(c, F.lit(ent), F.lit(rep))
    return c


def _clean_block(b: Column) -> Column:
    """Tag-strip + entity-decode + whitespace-collapse one block."""
    return F.trim(
        F.regexp_replace(
            _decode_entities(F.regexp_replace(b, _ANY_TAG, " ")),
            r"\s+",
            " ",
        )
    )


def extract_main_text(
    df: DataFrame,
    html_col: str = "html",
    min_chars: int = 30,
    max_link_density: float = 0.33,
    out_col: str = "main_text",
) -> DataFrame:
    """Append ``out_col`` with the extracted main content of
    ``html_col`` (see module docstring for the block-scoring rules).
    Also appends ``n_blocks_kept`` so curation filters can drop pages
    that extracted to nothing without re-running the extraction."""
    stripped = F.regexp_replace(F.col(html_col), _DROP_WHOLESALE, " ")
    blocks = F.split(stripped, _BLOCK_SPLIT)

    def keep(b: Column) -> Column:
        text = _clean_block(b)
        link_chars = F.length(
            F.concat_ws(
                " ", F.transform(
                    F.regexp_extract_all(b, F.lit(_LINK_TEXT), 1),
                    _clean_block,
                )
            )
        )
        return (F.length(text) >= min_chars) & (
            link_chars <= max_link_density * F.length(text)
        )

    kept = F.filter(blocks, keep)
    out = F.array_join(F.transform(kept, _clean_block), "\n")
    return df.withColumns(
        {
            out_col: F.when(F.col(html_col).isNotNull(), out),
            "n_blocks_kept": F.when(
                F.col(html_col).isNotNull(), F.size(kept)
            ).cast("int"),
        }
    )


# href="..." / href='...' inside an <a ...> tag (quoted values only —
# the contract; unquoted hrefs are vanishingly rare in real markup)
_HREF = r"""(?is)<a\s[^>]*?href\s*=\s*["']([^"']*)["']"""
_ABS_SCHEME = r"^[A-Za-z][A-Za-z0-9+.\-]*://"


def extract_links(
    df: DataFrame,
    html_col: str = "html",
    base_url_col: str | None = None,
    out_col: str = "links",
) -> DataFrame:
    """Append ``out_col``: the array of CANONICAL outbound link URLs of
    each page — the input `extract_main_text` discards and the edge
    source a web-graph build needs (crawl frontier, PageRank prior).

    Resolution contract (stated precisely — it IS the contract):

    - absolute ``http(s)://...`` hrefs are kept as-is;
    - protocol-relative ``//host/path`` resolves with the base page's
      scheme;
    - root-relative ``/path`` resolves against the base page's scheme
      and host;
    - everything else — ``mailto:`` / ``javascript:`` / other schemes,
      bare fragments, and path-relative hrefs (rare in crawl output
      and ambiguous without directory semantics) — is dropped;
    - every survivor is canonicalized with
      :func:`oakstore_spark.operators.urls.normalize_url` (tracking
      params dropped, host lowercased, default ports stripped), so the
      same target crawled under two spellings emits ONE link string.

    Without ``base_url_col`` only absolute links survive. Entirely
    map-side (regexp + array HOFs) — zero shuffles at any scale."""
    from oakstore_spark.operators.urls import normalize_url, url_parts

    hrefs = F.regexp_extract_all(F.col(html_col), F.lit(_HREF), 1)
    if base_url_col is not None:
        base = url_parts(base_url_col)
        scheme, host = base["scheme"], base["host"]
    else:
        scheme = host = None

    def resolve(h: Column) -> Column:
        absolute = F.when(h.rlike(_ABS_SCHEME), h)
        if scheme is None:
            return absolute
        return (
            absolute.when(
                h.startswith("//"), F.concat(scheme, F.lit(":"), h)
            ).when(
                h.startswith("/"),
                F.concat(scheme, F.lit("://"), host, h),
            )
        )

    # STAGED transforms, deliberately: normalize_url(col) references its
    # argument ~a dozen times (scheme/host/port/path/query each pull the
    # parsed struct apart), and the Column DSL copies the argument TREE
    # at every reference — composing it directly over resolve(h) (itself
    # a when-chain embedding the base page's parsed parts) multiplies
    # into a several-thousand-node expression that costs seconds of
    # analyzer/codegen time. Resolving into a bare element first keeps
    # every lambda argument a leaf variable, so each stage's tree stays
    # small. Same rows, same results, zero shuffles either way.
    resolved = F.transform(hrefs, resolve)
    canon = F.transform(resolved, normalize_url)
    kept = F.filter(
        canon, lambda u: u.isNotNull() & u.rlike("^https?://")
    )
    return df.withColumn(
        out_col, F.when(F.col(html_col).isNotNull(), kept)
    )


_ANCHOR = r"""(?is)<a\s[^>]*?href\s*=\s*["'][^"']*["'][^>]*>.*?</a\s*>"""


def extract_link_anchors(
    df: DataFrame,
    html_col: str = "html",
    base_url_col: str | None = None,
    out_col: str = "link_anchors",
) -> DataFrame:
    """Append ``out_col``: an array of ``struct<url, anchor>`` — each
    surviving outbound link (the SAME resolution + canonicalization
    contract as :func:`extract_links`) paired with its visible anchor
    TEXT (inner markup stripped, entities for ``&amp;/&lt;/&gt;``
    decoded, whitespace collapsed, trimmed). Anchor text is the
    signal ``extract_links`` throws away: aggregated per TARGET it is
    the classic description-of-a-page ranking feature (how the web
    names the thing it links to), and a crawl-frontier prior.

    Same staged-transform discipline as extract_links (each lambda
    argument stays a leaf — the Column DSL copies argument trees per
    reference); entirely map-side, zero shuffles, no Python."""
    from oakstore_spark.operators.urls import normalize_url, url_parts

    full = F.regexp_extract_all(F.col(html_col), F.lit(_ANCHOR), 0)
    if base_url_col is not None:
        base = url_parts(base_url_col)
        scheme, host = base["scheme"], base["host"]
    else:
        scheme = host = None

    def resolve(h: Column) -> Column:
        absolute = F.when(h.rlike(_ABS_SCHEME), h)
        if scheme is None:
            return absolute
        return (
            absolute.when(
                h.startswith("//"), F.concat(scheme, F.lit(":"), h)
            ).when(
                h.startswith("/"),
                F.concat(scheme, F.lit("://"), host, h),
            )
        )

    def anchor_text(a: Column) -> Column:
        inner = F.regexp_replace(
            F.regexp_replace(a, r"(?is)^<a[^>]*>|</a\s*>$", ""),
            r"(?s)<[^>]*>",
            " ",
        )
        decoded = F.regexp_replace(
            F.regexp_replace(
                F.regexp_replace(inner, r"&amp;", "&"), r"&lt;", "<"
            ),
            r"&gt;",
            ">",
        )
        return F.trim(F.regexp_replace(decoded, r"\s+", " "))

    # stage 1: full-match -> (raw href, anchor text) pairs
    pairs = F.transform(
        full,
        lambda a: F.struct(
            F.regexp_extract(a, _HREF, 1).alias("href"),
            anchor_text(a).alias("anchor"),
        ),
    )
    # stage 2: resolve the href (leaf-arg lambda)
    resolved = F.transform(
        pairs,
        lambda p: F.struct(
            resolve(p["href"]).alias("href"), p["anchor"].alias("anchor")
        ),
    )
    # stage 3: canonicalize (normalize_url over a leaf reference)
    canon = F.transform(
        resolved,
        lambda p: F.struct(
            normalize_url(p["href"]).alias("url"),
            p["anchor"].alias("anchor"),
        ),
    )
    kept = F.filter(
        canon,
        lambda p: p["url"].isNotNull() & p["url"].rlike("^https?://"),
    )
    return df.withColumn(
        out_col, F.when(F.col(html_col).isNotNull(), kept)
    )
