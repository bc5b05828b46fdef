"""include_external crawling: cross-host edges (10% of pages link to the
next host's root) are followed only when configured — the reference's
internal/external link split (is_external, utils.py:2515-2546)."""

from pyspark.sql import functions as F

from crawl4ai_spark.engine import CrawlConfig, SparkWebEngine
from crawl4ai_spark.sources.pagesgen import generate_pages


def _seed_one_host(spark):
    return spark.createDataFrame(
        [("https://www.host0.com/p0", 0.0)], ["url", "priority"])


def test_external_links_gated(spark, tmp_store):
    import os
    pages = generate_pages(spark, 3, 11).cache()
    pages.count()

    # internal-only: seeded on host0, the crawl never leaves host0
    eng1 = SparkWebEngine(spark, os.path.join(tmp_store, "int"))
    res1 = eng1.run(pages, _seed_one_host(spark),
                    config=CrawlConfig(max_depth=4, max_pages=60,
                                       check_robots_txt=False,
                                       include_external=False))
    hosts1 = {r.host for r in res1.select("host").distinct().collect()}
    assert hosts1 == {"www.host0.com"}

    # with externals: the cross-host edge from p0/p10/p20... reaches host1
    eng2 = SparkWebEngine(spark, os.path.join(tmp_store, "ext"))
    res2 = eng2.run(pages, _seed_one_host(spark),
                    config=CrawlConfig(max_depth=4, max_pages=60,
                                       check_robots_txt=False,
                                       include_external=True))
    hosts2 = {r.host for r in res2.select("host").distinct().collect()}
    assert "www.host1.com" in hosts2
    assert res2.filter(F.col("success")).count() > res1.filter(F.col("success")).count()
    pages.unpersist()
