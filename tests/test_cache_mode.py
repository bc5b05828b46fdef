"""CacheMode parity (ref cache_context.py:23-92, async_webcrawler.py:267-268):
enabled → already-crawled urls are served from the results table (anti-join),
bypass → they are refetched and reprocessed."""

from pyspark.sql import functions as F

from crawl4ai_spark.engine import CrawlConfig, SparkWebEngine
from crawl4ai_spark.sources.pagesgen import generate_pages, generate_seeds


def test_cache_enabled_skips_crawled(spark, tmp_store):
    pages = generate_pages(spark, 3, 7).cache()
    seeds = generate_seeds(spark, 3)
    cfg = CrawlConfig(max_depth=2, max_pages=30, check_robots_txt=False)

    eng = SparkWebEngine(spark, tmp_store)
    first = eng.run(pages, seeds, config=cfg)
    n_first = first.count()
    assert n_first > 0

    # second run, same store, fresh frontier: cache hit on every seed →
    # nothing new is fetched, the results table is unchanged
    eng2 = SparkWebEngine(spark, tmp_store)
    second = eng2.run(pages, seeds, config=cfg)
    assert second.count() == n_first

    # bypass refetches: the results table grows (duplicate urls, new gen)
    eng3 = SparkWebEngine(spark, tmp_store)
    cfg_bypass = CrawlConfig(max_depth=0, max_pages=5,
                             check_robots_txt=False,
                             cache_mode="bypass")
    third = eng3.run(pages, seeds, config=cfg_bypass)
    assert third.count() > n_first
    pages.unpersist()
