"""Link preview / head enrichment (F20).

Parity target: /root/reference/crawl4ai/link_preview.py:18-260 (fetch each
scored link's <head>, attach head_data + a contextual BM25 score) and
utils.py:3382-3427 ``calculate_total_score``:
    total = 0.7 · intrinsic + 0.3 · (contextual · 10)

Spark realization: no per-link fetch — candidate links equi-join the pages
table's head metadata. Head extraction is pure column regexp (JVM-side,
whole-stage codegen); contextual relevance is query-term overlap over the
title+description text. The join shuffles only (url, head_text) pairs.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

INTRINSIC_WEIGHT = 0.7    # ref utils.py:3382-3427
CONTEXTUAL_WEIGHT = 0.3


def extract_heads(pages: DataFrame) -> DataFrame:
    """Per-url head fields via native regexp — cheap enough to run over the
    whole pages table without a Python stage. ``head_text`` feeds the F20
    contextual score; the remaining columns feed the head-content filters
    (ContentRelevance/SEO, operators/urlfilters.py).

    Documented deviation from the reference's HeadPeekr (utils.py:2985-3005):
    canonical is read from ``<link rel="canonical">`` (its standard home) —
    the reference's SEOFilter looks up a ``<meta name="canonical">`` entry,
    which real pages essentially never carry; and ``<title>`` may carry
    attributes here (the reference's regex only matches a bare tag)."""
    html = F.decode(F.col("html"), "utf-8")
    title = F.regexp_extract(html, r"(?is)<title[^>]*>(.*?)</title>", 1)
    desc = F.regexp_extract(
        html, r"""(?is)<meta\s+name=["']description["']\s+content=["']([^"']*)""", 1)
    keywords = F.regexp_extract(
        html, r"""(?is)<meta\s+name=["']keywords["']\s+content=["']([^"']*)""", 1)
    canonical = F.regexp_extract(
        html, r"""(?is)<link\s+rel=["']canonical["']\s+href=["']([^"']*)""", 1)
    robots_meta = F.regexp_extract(
        html, r"""(?is)<meta\s+name=["']robots["']\s+content=["']([^"']*)""", 1)
    has_ldjson = html.rlike(r"""(?is)<script[^>]+type=["']application/ld\+json""")
    return pages.select(
        "url",
        F.lower(F.concat_ws(" ", title, desc)).alias("head_text"),
        title.alias("head_title"),
        desc.alias("head_description"),
        keywords.alias("head_keywords"),
        F.nullif(canonical, F.lit("")).alias("head_canonical"),
        robots_meta.alias("head_robots"),
        has_ldjson.alias("head_has_ldjson"),
    )


def contextual_score(col_head, query_terms: list[str]):
    """Fraction of query terms present in the head text (the reference's
    BM25-lite relevance against a one-document corpus degenerates to term
    presence; deterministic and codegen-friendly)."""
    if not query_terms:
        return F.lit(0.0)
    hits = None
    for t in query_terms:
        h = F.when(col_head.rlike(rf"\b{re.escape(t.lower())}\b"), 1).otherwise(0)
        hits = h if hits is None else hits + h
    return hits.cast("double") / len(query_terms)


def enrich_candidates(candidates: DataFrame, heads: DataFrame,
                      query: str) -> DataFrame:
    """Attach head_data + contextual score to frontier candidates and
    re-score: score ← 0.7·intrinsic + 0.3·contextual·10. Candidates without
    a known head keep their intrinsic score (fail-open, like the reference's
    timeout path link_preview.py:199-211)."""
    terms = re.findall("[a-z0-9]+", query.lower())
    joined = candidates.join(heads.select("url", "head_text"),
                             on="url", how="left")
    ctx = F.when(F.col("head_text").isNotNull(),
                 contextual_score(F.col("head_text"), terms)).otherwise(F.lit(None))
    # ref calculate_total_score (utils.py:3382-3427): contextual scaled to
    # 0-10 and capped, total clamped to [0, 10]; no head → intrinsic clamped
    total = F.when(
        ctx.isNotNull(),
        F.greatest(F.lit(0.0), F.least(
            F.lit(INTRINSIC_WEIGHT) * F.col("score")
            + F.lit(CONTEXTUAL_WEIGHT) * F.least(ctx * 10.0, F.lit(10.0)),
            F.lit(10.0))),
    ).otherwise(F.greatest(F.lit(0.0), F.least(F.col("score"), F.lit(10.0))))
    return (
        joined.withColumn("contextual_score", ctx)
        .withColumn("score", total)
        .drop("head_text")
    )
