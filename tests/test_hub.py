"""Crawler hub (reference hub.py parity): directory discovery, meta
attachment, subclass-time interface validation, and the shipped
product_catalog pack running end-to-end over the synthetic corpus."""

import json

import pytest

from crawl4ai_spark.hub import BaseCrawler, CrawlerHub


def test_hub_discovers_product_catalog():
    cls = CrawlerHub.get("product_catalog")
    assert cls is not None and issubclass(cls, BaseCrawler)
    # module __meta__ attached at registration (ref hub.py:58-63)
    assert cls.meta["schema"] == {"product": ["title", "price", "link"]}
    assert "version" in cls.meta


def test_hub_unknown_name_returns_none():
    assert CrawlerHub.get("definitely_not_a_pack") is None


def test_subclass_interface_validation():
    # wrong signature rejected at class-definition time (ref hub.py:24-35)
    with pytest.raises(TypeError, match="must implement"):
        class Bad(BaseCrawler):  # noqa: F811
            def run(self, url=""):
                return ""

    # async run rejected — Spark jobs block
    with pytest.raises(TypeError, match="synchronous"):
        class BadAsync(BaseCrawler):
            async def run(self, spark, pages, store_root, **kwargs):
                return ""


def test_product_catalog_pack_end_to_end(spark, tmp_path):
    from crawl4ai_spark.sources.pagesgen import generate_pages

    pages = generate_pages(spark, 3, 12)  # 36 pages, template 4 = products
    pack = CrawlerHub.get("product_catalog")()
    out = pack.run(spark, pages, str(tmp_path / "store"),
                   max_depth=4, max_pages=200)
    rows = out.select("url", "extracted_content").collect()
    assert rows  # at least one product page crawled + extracted
    prods = json.loads(rows[0].extracted_content)
    assert {"title", "price", "link"} <= set(prods[0])
    assert prods[0]["price"].startswith("$")


def test_hub_discovers_docs_site():
    cls = CrawlerHub.get("docs_site")
    assert cls is not None and issubclass(cls, BaseCrawler)
    assert cls.meta["content_filter"] == "bm25"
    assert "default_query" in cls.meta


def test_docs_site_pack_end_to_end(spark, tmp_path):
    from pyspark.sql import functions as F

    from crawl4ai_spark.sources.pagesgen import generate_pages

    pages = generate_pages(spark, 3, 12)
    pack = CrawlerHub.get("docs_site")()
    out = pack.run(spark, pages, str(tmp_path / "store"),
                   max_depth=4, max_pages=200)
    rows = out.select("url", F.col("markdown.fit_markdown").alias("fit")) \
              .collect()
    assert rows  # at least one page kept relevant markdown
    assert all(r.fit for r in rows)
    # the BM25 filter must actually FILTER: some crawled page's fit
    # markdown is shorter than its raw markdown
    comp = out.select(
        (F.length("markdown.fit_markdown")
         < F.length("markdown.raw_markdown")).alias("cut")).collect()
    assert any(r.cut for r in comp)
