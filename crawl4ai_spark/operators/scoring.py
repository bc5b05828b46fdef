"""URL scorers as native Spark column expressions (F9; E18 lives in the
scrape UDF).

Parity targets (/root/reference/crawl4ai/deep_crawling/scorers.py) — each
function reproduces the reference scorer's OUTPUT exactly (golden-checked in
tests/test_url_parity_golden.py against values produced by the reference
module itself, which is stdlib-only and runs in this sandbox):

- KeywordRelevanceScorer   :160-188 — fraction of keywords contained in url
- PathDepthScorer          :190-245 — 1/(1+|depth−optimal|); depth counts
  non-empty '/'-chunks of everything after the first "/" following "://"
  (the reference includes the query string in that count)
- ContentTypeScorer        :247-330 — ".ext$" keys form an exact-extension
  map (extension = alnum run after the LAST dot anywhere in the url, so an
  extensionless page yields "com"); other keys are regex patterns tried in
  descending-score order; miss → 0.0
- FreshnessScorer          :332-412 — years must follow a / - or _
  separator, the LATEST year ≤ current_year wins, 6-entry score table then
  max(0.1, 1−0.1·diff); no year → 0.5
- DomainAuthorityScorer    :414-519 — EXACT host match (host sliced from
  after "://" to the first '/', else '?', else '#'; port stripped at the
  last ':'), default 0.5. Subdomain inheritance (most-specific-first) is an
  opt-in EXTENSION beyond the reference.
- CompositeScorer          :91-158  — sum of weighted scores / count (the
  reference stages per-scorer values through a float32 array; the golden
  test allows that rounding).

All are pure column expressions → whole-stage codegen, no Python in the hot
path. Each scorer returns a Column; ``composite_score`` combines them.
"""

from __future__ import annotations

import re
from functools import reduce

from pyspark.sql import Column
from pyspark.sql import functions as F

FRESHNESS_SCORES = [1.0, 0.9, 0.8, 0.7, 0.6, 0.5]  # ref scorers.py:17-24
DEFAULT_CURRENT_YEAR = 2024                          # ref scorers.py:335

# year-with-separator pattern (ref scorers.py:352-365); group 1 = the year
_FRESH_RE = (r"(?:/|[-_])((?:19|20)\d{2})"
             r"(?:(?:/|[-_])(?:\d{2})(?:(?:/|[-_])(?:\d{2}))?)?")

# ".ext$"-style defaults in the reference's own key syntax
DEFAULT_TYPE_WEIGHTS = {
    ".html$": 1.0, ".htm$": 1.0, ".php$": 0.9, ".asp$": 0.8,
    ".pdf$": 0.5, ".jpg$": 0.2, ".png$": 0.2, ".gif$": 0.1,
}


def keyword_score(url: Column, keywords: list[str], weight: float = 1.0,
                  case_sensitive: bool = False) -> Column:
    """Fraction of keywords contained in the url (ref :160-188)."""
    if not keywords:
        return F.lit(0.0)
    hay = url if case_sensitive else F.lower(url)
    hits = reduce(
        lambda a, b: a + b,
        [F.when(hay.contains(k if case_sensitive else k.lower()), 1).otherwise(0)
         for k in keywords],
    )
    return (hits / F.lit(len(keywords))) * F.lit(weight)


def path_depth_score(url: Column, optimal_depth: int = 3, weight: float = 1.0) -> Column:
    """1/(1+|depth−optimal|) with the reference's depth definition
    (ref _quick_depth over url[first-path-slash:], :199-245)."""
    p1 = F.locate("://", url)
    region = F.substr(url, F.when(p1 == 0, F.lit(3)).otherwise(p1 + 3))
    sl = F.locate("/", region)
    rest = F.when(sl == 0, F.lit("")).otherwise(F.substr(region, sl))
    depth = F.size(F.filter(F.split(rest, "/"), lambda x: x != ""))
    return (F.lit(1.0) / (F.lit(1.0) + F.abs(depth - F.lit(optimal_depth)))) * F.lit(weight)


def _last_dot_extension(url: Column) -> Column:
    # alnum run after the LAST dot anywhere in the url (ref :273-296)
    return F.lower(F.regexp_extract(url, r".*\.([A-Za-z0-9]*)", 1))


def content_type_score(url: Column, type_weights: dict[str, float] | None = None,
                       weight: float = 1.0) -> Column:
    """Extension/pattern weights with the reference's staged lookup
    (ref :247-330): exact ".ext$" map first, then regex patterns in
    descending-score order, else 0.0."""
    tw = type_weights if type_weights is not None else DEFAULT_TYPE_WEIGHTS
    exact: dict[str, float] = {}
    regexes: list[tuple[str, float]] = []
    for pat, score in tw.items():
        if pat.startswith(".") and pat.endswith("$"):
            exact[pat[1:-1]] = float(score)
        else:
            regexes.append((pat, float(score)))
    regexes.sort(key=lambda kv: -kv[1])

    ext = _last_dot_extension(url)
    fallback = F.lit(0.0)
    for pat, score in reversed(regexes):
        fallback = F.when(url.rlike(pat), F.lit(score)).otherwise(fallback)
    expr = fallback
    for e, score in exact.items():
        expr = F.when(ext == e, F.lit(score)).otherwise(expr)
    return expr * F.lit(weight)


def freshness_score(url: Column, current_year: int = DEFAULT_CURRENT_YEAR,
                    weight: float = 1.0) -> Column:
    """Latest separator-anchored year ≤ current_year, scored by age
    (ref :332-412)."""
    years = F.regexp_extract_all(url, F.lit(_FRESH_RE), F.lit(1))
    latest = F.array_max(F.filter(
        F.transform(years, lambda y: y.cast("int")),
        lambda y: y <= F.lit(current_year),
    ))
    diff = F.lit(current_year) - latest
    aged = F.greatest(F.lit(0.1), F.lit(1.0) - diff * F.lit(0.1))
    expr = aged
    for i in range(len(FRESHNESS_SCORES) - 1, -1, -1):
        expr = F.when(diff == i, F.lit(FRESHNESS_SCORES[i])).otherwise(expr)
    return F.when(latest.isNull(), F.lit(0.5)).otherwise(expr) * F.lit(weight)


def _ref_host(url: Column) -> Column:
    # ref _extract_domain (:455-490): slice after '://' (or start), end at
    # the first '/', ELSE the first '?', ELSE the first '#' (in that
    # priority order — quirk preserved), strip from the LAST ':'
    p1 = F.locate("://", url)
    region = F.substr(url, F.when(p1 == 0, F.lit(1)).otherwise(p1 + 3))
    sl = F.locate("/", region)
    qm = F.locate("?", region)
    hs = F.locate("#", region)
    endpos = (
        F.when(sl > 0, sl).when(qm > 0, qm).when(hs > 0, hs)
        .otherwise(F.length(region) + 1)
    )
    dom = F.substr(region, F.lit(1), endpos - 1)
    return F.lower(F.regexp_replace(dom, r":[^:]*$", ""))


def domain_authority_score(url: Column, domain_weights: dict[str, float],
                           default: float = 0.5, weight: float = 1.0,
                           inherit_subdomains: bool = False) -> Column:
    """Domain → weight lookup (ref :414-519: exact host match, default 0.5).
    ``inherit_subdomains=True`` extends the reference: a host also matches a
    weight entry it is a subdomain of, most-specific entry first."""
    host = _ref_host(url)
    expr = None
    # most-specific first so b.a.com wins over a.com when inheriting
    for d, w in sorted(domain_weights.items(), key=lambda kv: (-len(kv[0]), kv[0])):
        dl = d.lower()
        cond = (host == dl)
        if inherit_subdomains:
            cond = cond | host.endswith("." + dl)
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
