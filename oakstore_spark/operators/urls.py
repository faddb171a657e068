"""URL canonicalization and domain curation — the first operators a
web-crawl pipeline runs after HTML extraction: normalize each URL to a
canonical form (so the same page crawled twice dedups exactly), map
hosts to registered domains, aggregate per-domain stats, and drop
blocklisted domains.

Canonicalization rules (stated precisely — they ARE the contract):
- scheme and host lowercase; ``www.`` prefix stripped from the host;
- default ports dropped (``:80`` for http, ``:443`` for https; other
  ports kept);
- fragment dropped;
- tracking query params dropped (``utm_*``, ``fbclid``, ``gclid``,
  ``ref``), remaining params sorted bytewise, rejoined with ``&``;
  an emptied query drops its ``?``;
- a single trailing ``/`` dropped from the path (the root path ``/``
  becomes empty — host root needs no path).

Everything is JVM regexp + array higher-order functions — map-side
projection, no shuffle, no Python. At 100 TB the normalize column
feeds straight into exact_dedup's hash shuffle; blocklist filtering is
a broadcast anti-join on the (tiny) blocklist side.

Reference parity: the reference (store.py:1-267) has no URL surface;
EXT operator mandated by the LLM-pipeline brief.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import Window as W
from pyspark.sql import functions as F
from pyspark.sql import types as T

_SCHEME = r"^([A-Za-z][A-Za-z0-9+.\-]*)://"
# params that carry tracking state, not content identity
TRACKING_PARAM_RE = r"^(utm_[A-Za-z0-9_]*|fbclid|gclid|ref)(=|$)"
# public suffixes where the registered domain is LABEL.2LEVEL —
# a pragmatic subset of the public-suffix list's most common entries
TWO_LEVEL_SUFFIXES = (
    "co.uk", "org.uk", "ac.uk", "gov.uk",
    "com.au", "net.au", "org.au",
    "co.jp", "ne.jp", "or.jp",
    "co.in", "co.nz", "co.za", "co.kr",
    "com.br", "com.mx", "com.sg", "com.cn", "com.tw", "com.ar",
)


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def url_parts(col: Column | str) -> Column:
    """Struct(scheme, host, port, path, query) pulled apart with
    anchored regexps (fragment is parsed away; userinfo is not
    supported — crawler URLs don't carry it)."""
    u = _c(col)
    authority = F.regexp_extract(u, _SCHEME + r"([^/?#]+)", 2)
    return F.struct(
        F.lower(F.regexp_extract(u, _SCHEME, 1)).alias("scheme"),
        F.lower(F.regexp_replace(authority, r":[0-9]+$", "")).alias("host"),
        F.regexp_extract(authority, r":([0-9]+)$", 1).alias("port"),
        F.regexp_extract(u, _SCHEME + r"[^/?#]*([^?#]*)", 2).alias("path"),
        F.regexp_extract(u, r"^[^#]*\?([^#]*)", 1).alias("query"),
    )


def normalize_url(col: Column | str) -> Column:
    """Canonical URL string per the module contract; null/schemeless
    inputs yield null (degrade, never error)."""
    p = url_parts(col)
    scheme = p["scheme"]
    host = F.regexp_replace(p["host"], r"^www\.", "")
    default_port = (
        ((scheme == "http") & (p["port"] == "80"))
        | ((scheme == "https") & (p["port"] == "443"))
    )
    port = F.when(
        (p["port"] != "") & ~default_port, F.concat(F.lit(":"), p["port"])
    ).otherwise(F.lit(""))
    path = F.when(p["path"] == "/", F.lit("")).otherwise(
        F.regexp_replace(p["path"], r"/$", "")
    )
    kept = F.array_sort(
        F.filter(
            F.split(p["query"], "&"),
            lambda q: (q != "") & ~q.rlike(TRACKING_PARAM_RE),
        )
    )
    query = F.when(
        F.size(kept) > 0,
        F.concat(F.lit("?"), F.array_join(kept, "&")),
    ).otherwise(F.lit(""))
    return F.when(
        (scheme != "") & (host != ""),
        F.concat(scheme, F.lit("://"), host, port, path, query),
    )


def registered_domain(host: Column | str) -> Column:
    """Registered (pay-level) domain of a host: the last two labels,
    or the last THREE when the final two form a known two-level public
    suffix (co.uk and friends). Hosts with a single label (localhost,
    intranet names) pass through unchanged."""
    h = F.regexp_replace(F.lower(_c(host)), r"^www\.", "")
    labels = F.split(h, r"\.")
    n = F.size(labels)
    last2 = F.concat_ws(".", F.element_at(labels, -2), F.element_at(labels, -1))
    last3 = F.concat_ws(
        ".", F.element_at(labels, -3), F.element_at(labels, -2),
        F.element_at(labels, -1),
    )
    is_two_level = last2.isin(*TWO_LEVEL_SUFFIXES)
    return F.when(n <= 1, h).when(
        (n >= 3) & is_two_level, last3
    ).otherwise(last2)


def domain_stats(
    df: DataFrame, url_col: str = "url", id_col: str = "doc_id"
) -> DataFrame:
    """Per-registered-domain rollup: page count, distinct canonical
    URLs (same page crawled twice counts once), and an id checksum.
    One hash-shuffle on the domain key — the 100 TB shape."""
    parts = url_parts(url_col)
    rows = df.select(
        F.col(id_col),
        registered_domain(parts["host"]).alias("reg_domain"),
        normalize_url(url_col).alias("norm_url"),
    )
    return rows.groupBy("reg_domain").agg(
        F.count(F.lit(1)).alias("n_pages"),
        F.countDistinct("norm_url").alias("n_urls"),
        F.sum(id_col).alias("id_checksum"),
    )


def filter_blocklisted(
    df: DataFrame, blocklist: DataFrame, url_col: str = "url"
) -> DataFrame:
    """Drop rows whose registered domain appears in ``blocklist``
    (one column ``reg_domain``). Broadcast LEFT ANTI join — the
    blocklist is small by nature; no shuffle of the corpus."""
    parts = url_parts(url_col)
    keyed = df.withColumn(
        "_reg_domain", registered_domain(parts["host"])
    )
    return (
        keyed.join(
            F.broadcast(
                blocklist.select(F.col("reg_domain").alias("_reg_domain"))
            ),
            "_reg_domain",
            "left_anti",
        ).drop("_reg_domain")
    )


ROBOTS_RULES_SCHEMA = T.StructType(
    [
        T.StructField("reg_domain", T.StringType()),
        T.StructField("pattern", T.StringType()),
        T.StructField("allow", T.BooleanType()),
        T.StructField("plen", T.IntegerType()),
        T.StructField("regex", T.StringType()),
    ]
)

ROBOTS_DELAY_SCHEMA = T.StructType(
    [
        T.StructField("reg_domain", T.StringType()),
        T.StructField("crawl_delay_sec", T.DoubleType()),
        T.StructField("max_requests_per_min", T.DoubleType()),
    ]
)


def _robots_groups(txt: str) -> list[tuple[set, list]]:
    """Group structure of one robots.txt: [(agents, lines)] where
    ``lines`` are ``(key, value)`` directives in file order. Any
    rule-like directive (allow / disallow / crawl-delay) closes an
    open ``User-agent`` run, so a later UA line starts a NEW group —
    the RFC 9309 grouping rule."""
    groups: list[tuple[set, list]] = []
    cur_agents: set = set()
    cur_lines: list = []
    agents_open = False  # consecutive UA lines share one group
    for raw in (txt or "").splitlines():
        line = raw.split("#", 1)[0].strip()
        if not line or ":" not in line:
            continue
        key, _, val = line.partition(":")
        key = key.strip().lower()
        val = val.strip()
        if key == "user-agent":
            if not agents_open and cur_agents:
                groups.append((cur_agents, cur_lines))
                cur_agents, cur_lines = set(), []
            cur_agents.add(val.lower())
            agents_open = True
        elif key in ("allow", "disallow", "crawl-delay"):
            agents_open = False
            if cur_agents:
                cur_lines.append((key, val))
    if cur_agents:
        groups.append((cur_agents, cur_lines))
    return groups


def _select_group_lines(
    groups: list[tuple[set, list]], agent_l: str
) -> list[tuple[str, str]]:
    """RFC 9309 group selection: the union of groups exactly matching
    the agent token; only if none match, the union of ``*`` groups —
    a crawler never obeys both."""
    chosen = None
    for agents, lines in groups:
        if agent_l in agents:
            chosen = (chosen or []) + lines
    if chosen is None:
        for agents, lines in groups:
            if "*" in agents:
                chosen = (chosen or []) + lines
    return chosen or []


def parse_robots(
    robots: DataFrame,
    domain_col: str = "reg_domain",
    txt_col: str = "robots_txt",
    agent: str = "*",
) -> DataFrame:
    """Parse per-domain ``robots.txt`` content into a flat rule
    relation, per RFC 9309 (public): group selection picks the group
    set for the MOST SPECIFIC matching ``User-agent`` (exact
    case-insensitive product token match for ``agent``, else the ``*``
    group; a crawler never obeys both), rules keep their pattern
    octets-length (``plen`` — the RFC's specificity measure) and a
    ready-to-use anchored Java regex translating the RFC wildcards
    (``*`` -> ``.*``, trailing ``$`` -> end anchor; everything else
    literal-escaped).

    This PARSING step runs as a small Python kernel over the robots
    relation — robots files are per-domain configuration, millions of
    rows at web scale but microscopic next to the URL corpus; the
    corpus-side MATCHING (:func:`robots_allowed`) is a broadcast join
    + JVM ``regexp_like``, no Python anywhere near the big side."""
    import re as _re

    def _to_regex(pat: str) -> str:
        anchor_end = pat.endswith("$")
        if anchor_end:
            pat = pat[:-1]
        parts = [_re.escape(p) for p in pat.split("*")]
        return "^" + ".*".join(parts) + ("$" if anchor_end else "")

    agent_l = agent.lower()

    def _parse_one(txt: str) -> list[tuple[str, bool, int, str]]:
        lines = _select_group_lines(_robots_groups(txt), agent_l)
        out = []
        for key, pat in lines:
            if key not in ("allow", "disallow"):
                continue  # crawl-delay handled by crawl_delays()
            if pat == "":
                # empty Disallow = allow everything: no rule at all
                continue
            out.append((pat, key == "allow", len(pat), _to_regex(pat)))
        return out

    def _kernel(batches):
        for pdf in batches:
            rows = []
            for dom, txt in zip(pdf[domain_col], pdf[txt_col]):
                for pat, allow, plen, rx in _parse_one(txt):
                    rows.append(
                        {
                            "reg_domain": dom,
                            "pattern": pat,
                            "allow": allow,
                            "plen": plen,
                            "regex": rx,
                        }
                    )
            yield pd.DataFrame(
                rows, columns=[f.name for f in ROBOTS_RULES_SCHEMA.fields]
            )

    return robots.select(domain_col, txt_col).mapInPandas(
        _kernel, ROBOTS_RULES_SCHEMA
    )


def crawl_delays(
    robots: DataFrame,
    domain_col: str = "reg_domain",
    txt_col: str = "robots_txt",
    agent: str = "*",
) -> DataFrame:
    """Per-domain politeness rate table from ``Crawl-delay`` lines —
    the de-facto extension next to RFC 9309's allow/deny (Yandex/Bing
    semantics: seconds between successive fetches). Group selection is
    the same as :func:`parse_robots` (exact agent token beats ``*``,
    never both); when the selected group states several delays the
    MOST CONSERVATIVE (largest) one wins, since obeying it satisfies
    every stated limit. Unparseable or non-positive values are
    ignored; domains without a delay line are absent from the output
    (no limit).

    Returns ``(reg_domain, crawl_delay_sec, max_requests_per_min)`` —
    the rate column is the join-ready form a fetch scheduler wants.
    Like :func:`parse_robots` this runs as a small kernel over the
    tiny per-domain relation; join it broadcast against the URL corpus
    exactly like :func:`robots_allowed`."""
    agent_l = agent.lower()

    def _kernel(batches):
        for pdf in batches:
            rows = []
            for dom, txt in zip(pdf[domain_col], pdf[txt_col]):
                delay = None
                for key, val in _select_group_lines(
                    _robots_groups(txt), agent_l
                ):
                    if key != "crawl-delay":
                        continue
                    try:
                        v = float(val)
                    except ValueError:
                        continue
                    if v > 0:
                        delay = v if delay is None else max(delay, v)
                if delay is not None:
                    rows.append(
                        {
                            "reg_domain": dom,
                            "crawl_delay_sec": delay,
                            "max_requests_per_min": 60.0 / delay,
                        }
                    )
            yield pd.DataFrame(
                rows, columns=[f.name for f in ROBOTS_DELAY_SCHEMA.fields]
            )

    return robots.select(domain_col, txt_col).mapInPandas(
        _kernel, ROBOTS_DELAY_SCHEMA
    )


def schedule_fetches(
    urls: DataFrame,
    delays: DataFrame,
    url_col: str = "url",
    start_us: int = 0,
    default_delay_sec: float = 1.0,
) -> DataFrame:
    """Politeness-aware fetch scheduling — the last leg of the crawl
    chain (robots allow/deny -> :func:`crawl_delays` -> WHEN may each
    URL actually be fetched): within each registered domain, URLs are
    ordered deterministically (md5 of the url, then url — a stable
    pseudo-random shuffle so one path prefix doesn't hog early slots)
    and slot k fetches at ``start_us + k * delay * 1e6``; domains
    without a stated Crawl-delay use ``default_delay_sec``.

    Output: input columns + ``reg_domain``, ``crawl_delay_sec`` (the
    effective one), ``fetch_slot`` (0-based), ``fetch_at_us``.

    Shape: one broadcast join against the tiny delay relation + ONE
    window over the domain key (rank within domain). At 100 TB the
    only shuffle is the domain partition; a hot domain's slots are a
    single ordered partition, which is exactly the semantics — one
    queue per domain. ``fetch_at_us`` stays exact-integer: delay is
    carried in integer MICROseconds before the multiply."""
    parts = url_parts(url_col)
    keyed = urls.withColumn(
        "_rd", registered_domain(parts["host"])
    )
    eff = F.coalesce(
        F.col("crawl_delay_sec"), F.lit(float(default_delay_sec))
    )
    joined = keyed.join(
        F.broadcast(
            delays.select("reg_domain", "crawl_delay_sec")
        ).withColumnRenamed("reg_domain", "_rd"),
        "_rd",
        "left",
    ).withColumn("_delay_us", F.round(eff * 1_000_000).cast("bigint"))
    w = W.partitionBy("_rd").orderBy(
        F.md5(F.col(url_col)), F.col(url_col)
    )
    slot = (F.row_number().over(w) - 1).cast("bigint")
    return joined.select(
        *[F.col(c) for c in urls.columns],
        F.col("_rd").alias("reg_domain"),
        (F.col("_delay_us") / 1_000_000.0).alias("crawl_delay_sec"),
        slot.alias("fetch_slot"),
        (F.lit(int(start_us)) + slot * F.col("_delay_us")).alias(
            "fetch_at_us"
        ),
    )


def robots_allowed(
    urls: DataFrame,
    rules: DataFrame,
    url_col: str = "url",
) -> DataFrame:
    """Append ``allowed``: whether each URL may be crawled under the
    parsed rule relation (:func:`parse_robots`), per RFC 9309
    longest-match — among the rules of the URL's registered domain
    whose pattern matches the URL path, the one with the greatest
    pattern length wins; on a specificity tie the LEAST restrictive
    (Allow) wins; no matching rule (or no rules for the domain at
    all) means allowed.

    Shape: the corpus side is one broadcast join against the (small)
    rule relation + JVM ``regexp_like`` + one aggregate back to URL
    grain — the verdict struct max carries (plen, allow) through
    partial aggregation, so the 100 TB cost is map-side work plus one
    shuffle on the URL key. Rows are restored by a UNIQUE row key
    (``monotonically_increasing_id``), never by grouping on the input
    columns — duplicate input rows stay duplicated in the output, and
    non-groupable column types (maps) pass through untouched. Per RFC
    9309 the match target is the path PLUS the query string (a
    ``Disallow: /search?*q=`` pattern must see ``?q=``)."""
    parts = url_parts(url_col)
    path = F.when(parts["path"] == "", F.lit("/")).otherwise(parts["path"])
    target = F.when(
        parts["query"] != "",
        F.concat(path, F.lit("?"), parts["query"]),
    ).otherwise(path)
    keyed = (
        urls.withColumn("_rk", F.monotonically_increasing_id())
        .withColumn("_rd", registered_domain(parts["host"]))
        .withColumn("_target", target)
    )
    joined = keyed.join(
        F.broadcast(rules), keyed["_rd"] == rules["reg_domain"], "left"
    )
    hit = F.col("regex").isNotNull() & F.expr("_target rlike regex")
    verdict = F.when(
        hit,
        F.struct(
            F.col("plen").alias("p"),
            F.col("allow").cast("int").alias("a"),
        ),
    )
    return (
        joined.groupBy("_rk")
        .agg(
            F.first(F.struct(*[keyed[c] for c in urls.columns])).alias(
                "_row"
            ),
            F.max(verdict).alias("_v"),
        )
        .select(
            *[F.col("_row")[c].alias(c) for c in urls.columns],
            F.coalesce(F.col("_v")["a"] == 1, F.lit(True)).alias(
                "allowed"
            ),
        )
    )
