"""URL scorers as native Spark column expressions (F9; E18 lives in the
scrape UDF).

Parity targets (/root/reference/crawl4ai/deep_crawling/scorers.py):
- KeywordRelevanceScorer   :160-188 — fraction of keywords contained in url
- PathDepthScorer          :190-245 — 1 / (1 + |depth − optimal|)
- ContentTypeScorer        :247-330 — extension → weight
- FreshnessScorer          :332-412 — year regex → lookup, current_year=2024
- DomainAuthorityScorer    :414-519 — domain → weight map
- CompositeScorer          :91-158  — weighted sum / normalize

All are pure column expressions → whole-stage codegen, no Python in the hot
path. Each scorer returns a Column; ``composite_score`` combines them.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column
from pyspark.sql import functions as F

FRESHNESS_SCORES = [1.0, 0.9, 0.8, 0.7, 0.6, 0.5]  # ref scorers.py:17-24
DEFAULT_CURRENT_YEAR = 2024                          # ref scorers.py:335


def keyword_score(url: Column, keywords: list[str], weight: float = 1.0) -> Column:
    """Fraction of keywords contained in the url (case-insensitive)."""
    if not keywords:
        return F.lit(0.0)
    low = F.lower(url)
    hits = reduce(
        lambda a, b: a + b,
        [F.when(low.contains(k.lower()), 1).otherwise(0) for k in keywords],
    )
    return (hits / F.lit(len(keywords))) * F.lit(weight)


def path_depth_score(url: Column, optimal_depth: int = 3, weight: float = 1.0) -> Column:
    """1/(1+|depth−optimal|) where depth = number of path segments."""
    path = F.parse_url(url, F.lit("PATH"))
    depth = F.size(F.filter(F.split(F.coalesce(path, F.lit("")), "/"), lambda x: x != ""))
    return (F.lit(1.0) / (F.lit(1.0) + F.abs(depth - F.lit(optimal_depth)))) * F.lit(weight)


def content_type_score(url: Column, type_weights: dict[str, float] | None = None,
                       weight: float = 1.0) -> Column:
    """Extension-based weight; extensionless URLs score 1.0 (page-like)."""
    tw = type_weights or {"html": 1.0, "htm": 1.0, "php": 0.9, "asp": 0.8,
                          "pdf": 0.5, "jpg": 0.2, "png": 0.2, "gif": 0.1}
    path = F.coalesce(F.parse_url(url, F.lit("PATH")), F.lit(""))
    ext = F.when(path.rlike(r"\.[A-Za-z0-9]{1,5}$"),
                 F.lower(F.regexp_extract(path, r"\.([A-Za-z0-9]{1,5})$", 1))
                 ).otherwise(F.lit(""))
    expr = F.when(ext == "", F.lit(1.0))
    for e, w in tw.items():
        expr = expr.when(ext == e.lower(), F.lit(float(w)))
    return expr.otherwise(F.lit(0.3)) * F.lit(weight)


def freshness_score(url: Column, current_year: int = DEFAULT_CURRENT_YEAR,
                    weight: float = 1.0) -> Column:
    """Extract a 4-digit year from the url; score by age (lookup table)."""
    year_s = F.regexp_extract(url, r"(19|20)\d{2}", 0)
    year = F.when(year_s == "", F.lit(None)).otherwise(year_s.cast("int"))
    age = F.lit(current_year) - year
    expr = F.when(year.isNull(), F.lit(0.5))
    for i, s in enumerate(FRESHNESS_SCORES):
        expr = expr.when(age == i, F.lit(s))
    return expr.otherwise(F.lit(0.4)) * F.lit(weight)


def domain_authority_score(url: Column, domain_weights: dict[str, float],
                           default: float = 0.5, weight: float = 1.0) -> Column:
    host = F.lower(F.coalesce(F.parse_url(url, F.lit("HOST")), F.lit("")))
    base = F.regexp_replace(host, r"^www\.", "")
    expr = None
    # most-specific first: a longer domain entry must win over a parent
    # domain it ends with (e.g. b.a.com before a.com), since the when-chain
    # short-circuits on first match (ADVICE r01 #3)
    for d, w in sorted(domain_weights.items(), key=lambda kv: (-len(kv[0]), kv[0])):
        dl = d.lower()
        cond = (base == dl) | base.endswith("." + dl)  # subdomains inherit
        expr = F.when(cond, F.lit(float(w))) if expr is None else expr.when(cond, F.lit(float(w)))
    if expr is None:
        return F.lit(default) * F.lit(weight)
    return expr.otherwise(F.lit(default)) * F.lit(weight)


def composite_score(parts: list[Column], normalize: bool = True) -> Column:
    """Sum of scorer columns, optionally normalized by count (ref :91-158)."""
    total = reduce(lambda a, b: a + b, parts)
    if normalize and parts:
        return total / F.lit(float(len(parts)))
    return total
