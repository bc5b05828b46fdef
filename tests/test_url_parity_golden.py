"""Reference-exact parity for the URL layer (F1-F4, F9, F10 head of chain).

Goldens under tests/goldens/urls were produced by scripts/gen_url_goldens.py
running the REFERENCE's own code (AST-extracted normalize/filter functions,
the stdlib-only scorers module loaded standalone). These tests compare our
implementations byte-for-byte (normalization) / within float32 staging
tolerance (scorers) / decision-for-decision (filters). No reference imports
happen here.
"""

import json
import pathlib

import pytest
from pyspark.sql import functions as F

from crawl4ai_spark import urls as U
from crawl4ai_spark.operators import scoring as S
from crawl4ai_spark.operators import urlfilters as UF

GOLD = pathlib.Path(__file__).parent / "goldens" / "urls"

NORM_ROWS = [json.loads(l) for l in (GOLD / "normalize.jsonl").open()]
SCORER_ROWS = [json.loads(l) for l in (GOLD / "scorers.jsonl").open()]
FILTER_ROWS = [json.loads(l) for l in (GOLD / "filters.jsonl").open()]

# must match scripts/gen_url_goldens.py
KEYWORDS = ["spark", "crawl", "guide"]
TYPE_WEIGHTS = {".html$": 1.0, ".pdf$": 0.8, ".json$": 0.5, ".mp4$": 0.2,
                "guide": 0.9}
DOMAIN_WEIGHTS = {"example.com": 0.9, "blog.example.com": 1.0, "spam.site": 0.1}
PATTERNS = ["*.example.com/blog/*", "*spark*", "*/guide/*"]


def test_normalize_byte_identical_to_reference():
    """normalize_url + normalize_url_for_deep_crawl + get_base_domain +
    is_external_url: byte-identical on the whole messy corpus. This is the
    foundation of 'same URL-seen set as the reference' (the frontier dedup
    key IS the deep-crawl normalization)."""
    assert len(NORM_ROWS) >= 300
    for r in NORM_ROWS:
        assert U.normalize_url(r["href"], r["base"]) == r["norm"], r
        assert U.normalize_url_deep(r["href"], r["base"]) == r["norm_deep"], r
        assert U.base_domain(r["norm"] or r["href"]) == r["base_domain"], r
        assert U.is_external(r["norm"] or r["href"],
                             U.base_domain(r["base"])) == r["is_external"], r


@pytest.fixture(scope="module")
def scored(spark):
    df = spark.createDataFrame([(r["url"],) for r in SCORER_ROWS], ["url"])
    u = F.col("url")
    cols = {
        "keyword": S.keyword_score(u, KEYWORDS),
        "path_depth": S.path_depth_score(u, 3),
        "content_type": S.content_type_score(u, TYPE_WEIGHTS),
        "freshness": S.freshness_score(u, 2024),
        "domain_authority": S.domain_authority_score(u, DOMAIN_WEIGHTS),
    }
    cols["composite"] = S.composite_score(list(cols.values()), normalize=True)
    rows = df.select("url", *[c.alias(n) for n, c in cols.items()]).collect()
    return {r["url"]: r for r in rows}


@pytest.mark.parametrize(
    "metric",
    ["keyword", "path_depth", "content_type", "freshness",
     "domain_authority", "composite"],
)
def test_scorers_match_reference(scored, metric):
    for r in SCORER_ROWS:
        got = scored[r["url"]][metric]
        # 1e-6 absorbs the reference's float32 score-array staging
        assert got == pytest.approx(r[metric], abs=1e-6), r["url"]


def test_filters_match_reference(spark):
    df = spark.createDataFrame([(r["url"],) for r in FILTER_ROWS], ["url"])
    u = F.col("url")
    rows = df.select(
        "url",
        UF.url_pattern_filter(u, PATTERNS).alias("pattern"),
        UF.content_type_filter(u, ["html", "pdf"]).alias("ctype"),
        UF.domain_filter(u, allowed=["example.com"],
                         blocked=["spam.site"]).alias("domain"),
    ).collect()
    got = {r["url"]: r for r in rows}
    for r in FILTER_ROWS:
        g = got[r["url"]]
        for k in ("pattern", "ctype", "domain"):
            if r[k] is not None:
                assert bool(g[k]) == r[k], (k, r["url"])


def test_nonsense_seed_filter_matches_reference(spark):
    """The seeder's nonsense-URL rules (robots/sitemap/utility/hidden/
    non-content/print/short-path) match the reference's active
    _is_nonsense_url decisions — both the pure twin and the column
    predicate (contract: absolute http(s) urls)."""
    import json as _json

    from crawl4ai_spark.sources.seeder import (
        is_nonsense_seed_url,
        nonsense_seed_url,
    )

    rows = [_json.loads(l) for l in (GOLD / "nonsense.jsonl").open()]
    for r in rows:
        assert is_nonsense_seed_url(r["url"]) == r["nonsense"], r
    df = spark.createDataFrame([(r["url"],) for r in rows], ["url"])
    got = {x["url"]: bool(x["n"]) for x in
           df.select("url", nonsense_seed_url(F.col("url")).alias("n")).collect()}
    for r in rows:
        assert got[r["url"]] == r["nonsense"], r


def test_url_relevance_fallback_matches_reference():
    """F18 tail: the url-string relevance score (exact/substring/token-
    coverage/3-gram-Jaccard, rank-weighted) matches the reference's
    _calculate_url_relevance_score exactly."""
    import json as _json

    from crawl4ai_spark.sources.seeder import url_relevance_score

    rows = [_json.loads(l) for l in (GOLD / "url_relevance.jsonl").open()]
    for r in rows:
        assert url_relevance_score(r["query"], r["url"]) == r["score"], r
