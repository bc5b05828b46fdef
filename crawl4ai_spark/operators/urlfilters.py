"""URL filters as native Spark column predicates (F10, F11, F17).

Parity targets (/root/reference/crawl4ai/deep_crawling/filters.py):
- URLPatternFilter    :119-263 — glob/regex patterns (pre-categorized into
  suffix/prefix/domain/path buckets there; Catalyst constant-folds the
  equivalent ``rlike``/``startswith``/``endswith`` literals here)
- ContentTypeFilter   :266-429 — extension allowlist
- DomainFilter        :432-506 — allow/block + subdomain suffix match
- FilterChain.apply   :69-116  — early-exit AND = plain predicate conjunction
- URL validation      bfs_strategy.py:52-72
- nonsense-URL filter async_url_seeder.py:1330-1424

URL parsing uses try_parse_url throughout: Spark 4's parse_url THROWS
on malformed URLs, and filter predicates must tolerate arbitrary crawl
hrefs (malformed → NULL → component treated as '').

Everything stays in whole-stage codegen; the head-content filters
(ContentRelevance/SEO) need page head data and live in
:mod:`crawl4ai_spark.operators.frontier` as joins against `pages`.
"""

from __future__ import annotations

import re
from functools import reduce

from pyspark.sql import Column
from pyspark.sql import functions as F


def glob_to_regex(pattern: str) -> str:
    """'*.example.com/blog/*' → anchored regex (glob semantics: * = any run,
    ? = one char)."""
    out = []
    for ch in pattern:
        if ch == "*":
            out.append(".*")
        elif ch == "?":
            out.append(".")
        else:
            out.append(re.escape(ch))
    return "^" + "".join(out) + "$"


def url_pattern_filter(url: Column, patterns: list[str], *, reverse: bool = False) -> Column:
    """True if url matches ANY glob pattern (or none, when reverse)."""
    if not patterns:
        return F.lit(True)
    m = reduce(lambda a, b: a | b, [url.rlike(glob_to_regex(p)) for p in patterns])
    return ~m if reverse else m


def content_type_filter(url: Column, allowed_exts: list[str],
                        allow_extensionless: bool = True) -> Column:
    path = F.coalesce(F.try_parse_url(url, F.lit("PATH")), F.lit(""))
    ext = F.when(path.rlike(r"\.[A-Za-z0-9]{1,5}$"),
                 F.lower(F.regexp_extract(path, r"\.([A-Za-z0-9]{1,5})$", 1))
                 ).otherwise(F.lit(""))
    ok = ext.isin([e.lower().lstrip(".") for e in allowed_exts])
    if allow_extensionless:
        ok = ok | (ext == "")
    return ok


def domain_filter(url: Column, allowed: list[str] | None = None,
                  blocked: list[str] | None = None) -> Column:
    """Suffix match against the domain, subdomains included. Reference-exact
    (DomainFilter, ref filters.py:432-506): the domain is everything between
    ``://`` and the next ``/`` — ports included, so ``example.com:8080``
    does NOT match ``example.com`` (golden-checked)."""
    host = F.lower(F.regexp_extract(url, r"://([^/]+)", 1))

    def matches(domains: list[str]) -> Column:
        return reduce(
            lambda a, b: a | b,
            [(host == d.lower()) | host.endswith("." + d.lower()) for d in domains],
        )

    pred = F.lit(True)
    if allowed:
        pred = pred & matches(allowed)
    if blocked:
        pred = pred & ~matches(blocked)
    return pred


def valid_url(url: Column) -> Column:
    """scheme ∈ {http,https} and netloc contains a dot (ref bfs_strategy.py:52-72)."""
    host = F.coalesce(F.try_parse_url(url, F.lit("HOST")), F.lit(""))
    return url.rlike("^https?://") & host.contains(".")


_ASSET_EXT_RE = (
    r"\.(css|js|mjs|png|jpe?g|gif|webp|svg|ico|woff2?|ttf|eot|mp[34]|avi|mov"
    r"|wav|zip|tar|gz|rar|7z|exe|dmg|apk|json|xml|rss|atom)$"
)


def nonsense_url(url: Column) -> Column:
    """True for asset/junk URLs a seeder should drop (F17)."""
    path = F.lower(F.coalesce(F.try_parse_url(url, F.lit("PATH")), F.lit("")))
    special = F.lower(url).rlike("^(mailto|tel|ftp|file|data|javascript):")
    return special | path.rlike(_ASSET_EXT_RE) | ~valid_url(url)


def filter_chain(url: Column, predicates: list[Column]) -> Column:
    """AND-compose predicates (FilterChain.apply; Catalyst short-circuits)."""
    return reduce(lambda a, b: a & b, predicates, F.lit(True))


# ---------------------------------------------------------------------------
# Head-content filters (the F10 tail): ContentRelevanceFilter + SEOFilter.
# Both consume page-head fields (join candidates against
# linkpreview.extract_heads — never a live fetch) and stay in native column
# expressions, so they run inside whole-stage codegen at any scale.
# ---------------------------------------------------------------------------

BM25_K1 = 1.2        # ref filters.py:519-531 defaults
BM25_B = 0.75
BM25_AVGDL = 1000

# ref filters.py:594-602 (SEMrush-ish factor weights)
SEO_WEIGHTS = {
    "title_length": 0.15,
    "title_kw": 0.18,
    "meta_description": 0.12,
    "canonical": 0.10,
    "robot_ok": 0.20,
    "schema_org": 0.10,
    "url_quality": 0.15,
}


def head_relevance_score(doc: Column, query_terms: list[str]) -> Column:
    """BM25-lite of query terms against a weighted head document
    (ref ContentRelevanceFilter._bm25, filters.py:567-585: simplified
    idf = ln(2/(tf+0.5)+1), fixed avgdl). ``doc`` is the already-weighted
    text (title×3 + description×2 + keywords, ref :552-562)."""
    toks = F.split(F.trim(F.regexp_replace(F.lower(doc), r"\s+", " ")), " ")
    dl = F.size(toks).cast("double")
    score = F.lit(0.0)
    for term in dict.fromkeys(t.lower() for t in query_terms):
        tf = F.size(F.filter(toks, lambda t: t == F.lit(term))).cast("double")
        idf = F.log(F.lit(2.0) / (tf + 0.5) + 1.0)
        score = score + idf * (tf * (BM25_K1 + 1.0)) / (
            tf + BM25_K1 * (1.0 - BM25_B + BM25_B * dl / BM25_AVGDL)
        )
    return score


def seo_score(url: Column, title: Column, description: Column,
              canonical: Column, robots_meta: Column, has_ldjson: Column,
              keywords: list[str] | None = None,
              weights: dict[str, float] | None = None) -> Column:
    """Weighted SEO quality score (ref SEOFilter, filters.py:588-698):
    title length band, keyword presence, meta-description band, canonical
    match, robots noindex, schema.org ld+json, and url-quality penalties."""
    w = weights or SEO_WEIGHTS
    tlen = F.length(F.coalesce(title, F.lit("")))
    s_title = (
        F.when((tlen >= 50) & (tlen <= 60), 1.0)
        .when(((tlen >= 40) & (tlen < 50)) | ((tlen > 60) & (tlen <= 70)), 0.7)
        .otherwise(0.3)
    )
    if keywords:
        pat = "(?i)\\b(" + "|".join(re.escape(k) for k in keywords) + ")\\b"
        n_kw = F.size(F.regexp_extract_all(F.coalesce(title, F.lit("")),
                                           F.lit(pat), F.lit(0))).cast("double")
        s_kw = F.least(n_kw * 0.3, F.lit(1.0))
    else:
        s_kw = F.lit(0.0)
    dlen = F.length(F.coalesce(description, F.lit("")))
    s_desc = (
        F.when((dlen >= 140) & (dlen <= 160), 1.0)
        .when((dlen >= 120) & (dlen <= 200), 0.5)
        .otherwise(0.2)
    )
    s_canon = (
        F.when(canonical.isNull() | (canonical == ""), 0.5)
        .when(canonical == url, 1.0)
        .otherwise(0.2)
    )
    s_robot = F.when(
        F.coalesce(robots_meta, F.lit("")).contains("noindex"), 0.0
    ).otherwise(1.0)
    s_schema = F.when(has_ldjson, 1.0).otherwise(0.0)
    path = F.lower(F.coalesce(F.try_parse_url(url, F.lit("PATH")), F.lit("")))
    query = F.coalesce(F.try_parse_url(url, F.lit("QUERY")), F.lit(""))
    s_url = (
        F.lit(1.0)
        * F.when(F.length(path) > 80, 0.7).otherwise(1.0)
        * F.when(path.rlike(r"\d{4}"), 0.8).otherwise(1.0)
        * F.when(query != "", 0.6).otherwise(1.0)
        * F.when(path.contains("_"), 0.9).otherwise(1.0)
    )
    return (
        F.lit(w["title_length"]) * s_title
        + F.lit(w["title_kw"]) * s_kw
        + F.lit(w["meta_description"]) * s_desc
        + F.lit(w["canonical"]) * s_canon
        + F.lit(w["robot_ok"]) * s_robot
        + F.lit(w["schema_org"]) * s_schema
        + F.lit(w["url_quality"]) * s_url
    )
