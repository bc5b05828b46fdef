"""docs_site pack — documentation-harvest preset (reference hub.py:12-68
registry mechanics; the reference's shipped packs are browser+LLM-bound,
this one is fully in-sandbox deterministic like product_catalog).

Preset: BM25 content filtering (`CrawlConfig(content_filter="bm25",
bm25_query=...)`) so each page's fit_markdown keeps only the chunks
relevant to the documentation query, over a configurable crawl policy.
The pack contract returns pages that produced non-empty relevant
fit_markdown — the table a docs-ingestion pipeline would chunk and embed
downstream.
"""

from __future__ import annotations

from crawl4ai_spark.hub import BaseCrawler

__meta__ = {
    "version": "1.0.0",
    "tested_on": ["synthetic pages corpus (sources/pagesgen.py templates"
                  " 0/6: article + code pages)"],
    "rate_limit": "per-host quota 10/generation",
    "content_filter": "bm25",
    "default_query": "code data table page",
}


class DocsSiteCrawler(BaseCrawler):
    def run(self, spark, pages, store_root: str, *, seeds=None,
            robots=None, max_depth: int = 4, max_pages: int = 1000,
            query: str | None = None, **kwargs):
        from pyspark.sql import functions as F

        from crawl4ai_spark.engine import CrawlConfig, SparkWebEngine

        query = query or __meta__["default_query"]
        self.logger.info("docs_site crawl into %s (query=%r)",
                         store_root, query)
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
                content_filter="bm25", bm25_query=query, **kwargs),
        )
        # pack contract: pages whose BM25-filtered markdown is non-empty —
        # i.e. at least one chunk was relevant to the documentation query
        return results.filter(
            F.col("markdown.fit_markdown").isNotNull()
            & (F.length("markdown.fit_markdown") > 0))
