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


def test_read_only_and_write_only_modes(spark, tmp_store):
    """READ_ONLY rows are not future cache hits; WRITE_ONLY ignores existing
    hits but its rows do become hits (ref CacheContext read/write split)."""
    import os

    pages = generate_pages(spark, 2, 5).cache()
    seeds = generate_seeds(spark, 2)
    store = os.path.join(tmp_store, "rw")

    # write_only first run: ignores (empty) cache, writes cached rows
    cfg_w = CrawlConfig(max_depth=0, max_pages=10, check_robots_txt=False,
                        cache_mode="write_only")
    n1 = SparkWebEngine(spark, store).run(pages, seeds, config=cfg_w).count()

    # enabled run now hits that cache → nothing refetched
    cfg_e = CrawlConfig(max_depth=0, max_pages=10, check_robots_txt=False)
    n2 = SparkWebEngine(spark, store).run(pages, seeds, config=cfg_e).count()
    assert n2 == n1

    # read_only run: no hits to add (all cached) → table unchanged; then
    # against a FRESH store it writes rows that do NOT become hits
    store2 = os.path.join(tmp_store, "ro")
    cfg_r = CrawlConfig(max_depth=0, max_pages=10, check_robots_txt=False,
                        cache_mode="read_only")
    m1 = SparkWebEngine(spark, store2).run(pages, seeds, config=cfg_r).count()
    m2 = SparkWebEngine(spark, store2).run(pages, seeds, config=cfg_e).count()
    # the enabled run refetched everything (read_only rows aren't hits)
    assert m2 == 2 * m1
    pages.unpersist()
