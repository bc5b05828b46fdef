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
    path = F.coalesce(F.parse_url(url, F.lit("PATH")), F.lit(""))
    ext = F.when(path.rlike(r"\.[A-Za-z0-9]{1,5}$"),
                 F.lower(F.regexp_extract(path, r"\.([A-Za-z0-9]{1,5})$", 1))
                 ).otherwise(F.lit(""))
    ok = ext.isin([e.lower().lstrip(".") for e in allowed_exts])
    if allow_extensionless:
        ok = ok | (ext == "")
    return ok


def domain_filter(url: Column, allowed: list[str] | None = None,
                  blocked: list[str] | None = None) -> Column:
    """Suffix match against registrable-ish domain, subdomains included."""
    host = F.lower(F.coalesce(F.parse_url(url, F.lit("HOST")), F.lit("")))

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
    host = F.coalesce(F.parse_url(url, F.lit("HOST")), F.lit(""))
    return url.rlike("^https?://") & host.contains(".")


_ASSET_EXT_RE = (
    r"\.(css|js|mjs|png|jpe?g|gif|webp|svg|ico|woff2?|ttf|eot|mp[34]|avi|mov"
    r"|wav|zip|tar|gz|rar|7z|exe|dmg|apk|json|xml|rss|atom)$"
)


def nonsense_url(url: Column) -> Column:
    """True for asset/junk URLs a seeder should drop (F17)."""
    path = F.lower(F.coalesce(F.parse_url(url, F.lit("PATH")), F.lit("")))
    special = F.lower(url).rlike("^(mailto|tel|ftp|file|data|javascript):")
    return special | path.rlike(_ASSET_EXT_RE) | ~valid_url(url)


def filter_chain(url: Column, predicates: list[Column]) -> Column:
    """AND-compose predicates (FilterChain.apply; Catalyst short-circuits)."""
    return reduce(lambda a, b: a & b, predicates, F.lit(True))
