"""product_catalog pack — the Spark analog of a site-specific crawler pack
(reference crawlers/amazon_product/crawler.py + google_search/crawler.py).

The reference packs bundle a browser session + (LLM-generated) extraction
schemas behind a named registry entry. Both of those dependencies are out
of scope here; what a pack IS in this engine is a preset: crawl policy +
politeness + a JSON-CSS extraction schema, runnable over any pre-fetched
pages table. This pack extracts product tiles (`.product` → title/price/
link) — the schema a deployment would pin after generating it once, like
the reference caches its generated schemas under ``~/.crawl4ai/schema``.
"""

from __future__ import annotations

from crawl4ai_spark.hub import BaseCrawler

__meta__ = {
    "version": "1.0.0",
    "tested_on": ["synthetic pages corpus (sources/pagesgen.py template 4)"],
    "rate_limit": "per-host quota 10/generation",
    "schema": {"product": ["title", "price", "link"]},
}

PRODUCT_SCHEMA = {
    "name": "products",
    "baseSelector": "div.product",
    "fields": [
        {"name": "title", "selector": "h2.title", "type": "text"},
        {"name": "price", "selector": "span.price", "type": "text"},
        {"name": "link", "selector": "a", "type": "attribute",
         "attribute": "href"},
    ],
}


class ProductCatalogCrawler(BaseCrawler):
    def run(self, spark, pages, store_root: str, *, seeds=None,
            robots=None, max_depth: int = 3, max_pages: int = 1000,
            **kwargs):
        from pyspark.sql import functions as F

        from crawl4ai_spark.engine import CrawlConfig, SparkWebEngine

        self.logger.info("product_catalog crawl into %s", store_root)
        if seeds is None:
            # root page per host, derived from the pages table itself
            # (pagesgen layout: https://<host>/p0 is every host's root)
            hosts = pages.select(
                F.expr("try_parse_url(url, 'HOST')").alias("h")) \
                .filter(F.col("h").isNotNull()).distinct()
            seeds = hosts.select(
                F.concat(F.lit("https://"), F.col("h"), F.lit("/p0"))
                .alias("url"), F.lit(0.0).alias("priority"))
        engine = SparkWebEngine(spark, store_root)
        results = engine.run(
            pages, seeds, robots=robots,
            config=CrawlConfig(
                max_depth=max_depth, max_pages=max_pages,
                extraction_schema=PRODUCT_SCHEMA, **kwargs),
        )
        # pack contract: rows that extracted at least one product tile
        return results.filter(
            F.col("extracted_content").isNotNull()
            & (F.col("extracted_content") != F.lit("[]")))
