"""Seeder pipeline tests (S5/S6/F17/F18 parity points)."""

from pyspark.sql import functions as F

from crawl4ai_spark.sources.seeder import (
    NONSENSE_EXT_RE,
    _glob_to_regex,
    seed_urls,
    synthetic_cc_index,
)


def test_glob_translation():
    assert _glob_to_regex("*.example.com/*") == r"^.*\.example\.com/.*$"
    assert _glob_to_regex("a?c") == "^a.c$"


def test_cc_index_deterministic(spark):
    a = synthetic_cc_index(spark, 5, 20).collect()
    b = synthetic_cc_index(spark, 5, 20).collect()
    assert sorted(r.url for r in a) == sorted(r.url for r in b)
    assert len(a) == 100


def test_nonsense_filter_drops_assets(spark):
    seeds = synthetic_cc_index(spark, 5, 40)
    out = seed_urls(seeds)
    assert out.filter(F.col("url").rlike(NONSENSE_EXT_RE)).count() == 0
    assert out.filter(F.col("url").contains("wp-json")).count() == 0
    assert out.count() < seeds.count()  # something was filtered
    assert out.count() > 0


def test_pattern_filter_and_cap(spark):
    seeds = synthetic_cc_index(spark, 6, 30)
    out = seed_urls(seeds, pattern="https://www.site1.com/*", max_urls=5)
    rows = out.collect()
    assert 0 < len(rows) <= 5
    assert all(r.url.startswith("https://www.site1.com/") for r in rows)


def test_bm25_ranking_orders_relevant_first(spark):
    seeds = synthetic_cc_index(spark, 6, 40)
    q = "crawl spark"
    out = seed_urls(seeds, query=q, max_urls=10).collect()
    assert len(out) == 10
    scores = [r.score for r in out]
    assert scores == sorted(scores, reverse=True)
    assert scores[0] > 0
    # every positively scored row mentions a query term in its url/head
    top = out[0]
    assert "crawl" in top.url or "spark" in top.url
