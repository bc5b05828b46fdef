"""F20 link preview: head extraction, contextual scoring, and the
0.7/0.3 total-score formula (ref utils.py:3382-3427)."""

import pytest
from pyspark.sql import functions as F

from crawl4ai_spark.engine import CrawlConfig, SparkWebEngine
from crawl4ai_spark.operators.linkpreview import (
    contextual_score,
    enrich_candidates,
    extract_heads,
)
from crawl4ai_spark.sources.pagesgen import generate_pages, generate_seeds


@pytest.fixture(scope="module")
def pages(spark):
    df = generate_pages(spark, 3, 7).cache()
    df.count()
    return df


def test_extract_heads_native(spark, pages):
    heads = extract_heads(pages)
    rows = heads.collect()
    assert len(rows) == pages.count()
    # every synthetic page has a real <title> → non-empty head text
    assert all(r.head_text for r in rows)
    one = heads.filter(F.col("url") == "https://www.host0.com/p0").first()
    assert "host0 page0" in one.head_text


def test_total_score_formula(spark):
    cand = spark.createDataFrame(
        [("u1", 4.0), ("u2", 4.0), ("u3", 4.0)], ["url", "score"])
    heads = spark.createDataFrame(
        [("u1", "spark crawl engine"), ("u2", "nothing relevant")],
        ["url", "head_text"])
    out = {r.url: r for r in
           enrich_candidates(cand, heads, "spark crawl").collect()}
    # u1 matches 2/2 terms: 0.7*4 + 0.3*1.0*10 = 5.8
    assert out["u1"].score == pytest.approx(5.8)
    assert out["u1"].contextual_score == pytest.approx(1.0)
    # u2 matches 0/2: 0.7*4 + 0 = 2.8
    assert out["u2"].score == pytest.approx(2.8)
    # u3 has no head row → fail-open, intrinsic kept
    assert out["u3"].score == pytest.approx(4.0)
    assert out["u3"].contextual_score is None


def test_contextual_score_word_boundaries(spark):
    df = spark.createDataFrame([("sparkle crawls",)], ["h"])
    s = df.select(contextual_score(F.col("h"), ["spark", "crawl"]).alias("s")).first().s
    assert s == 0.0  # substring matches don't count


def test_engine_link_preview_changes_priorities(spark, pages, tmp_store):
    seeds = generate_seeds(spark, 3)
    cfg = CrawlConfig(max_depth=2, max_pages=40, policy="best_first",
                      batch_size=8, check_robots_txt=False,
                      link_preview_query="table data")
    eng = SparkWebEngine(spark, tmp_store)
    res = eng.run(pages, seeds, config=cfg)
    assert res.count() > 0
    # enriched scores exist on the frontier beyond the intrinsic 0-10 scale
    fr = eng.frontier().filter(F.col("depth") > 0)
    assert fr.count() > 0
