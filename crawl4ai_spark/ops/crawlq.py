"""End-to-end crawl-engine queries (rows-only driver checks — the full
frontier loop and the byte-identity extraction pipeline are not expressible
as a single ANSI-SQL statement; their correctness oracles are the pytest
suite: oracle_crawler BFS parity + golden text identity).

Each callable synthesizes the deterministic Common-Crawl-style ``pages``
table in-cluster (BASELINE.json input_hint shape) — no external data.
"""

from __future__ import annotations

import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from crawl4ai_spark.engine import CrawlConfig, SparkWebEngine
from crawl4ai_spark.functions.udfs import process_pages
from crawl4ai_spark.sources.pagesgen import generate_pages, generate_robots, generate_seeds

N_HOSTS = 6
PAGES_PER_HOST = 15


def q_crawl_bfs_e2e(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full frontier loop on the synthetic site graph: schedule (politeness
    quota + robots) → fetch-join → extract → link-discovery → dedup →
    next generation; returns the per-URL crawl ledger."""
    pages = generate_pages(spark, N_HOSTS, PAGES_PER_HOST)
    seeds = generate_seeds(spark, N_HOSTS)
    robots = generate_robots(spark, N_HOSTS)
    engine = SparkWebEngine(spark, tempfile.mkdtemp(prefix="crawlq_"))
    results = engine.run(
        pages, seeds, robots=robots,
        config=CrawlConfig(max_depth=3, max_pages=90, per_host_quota=8),
    )
    return results.select(
        "url", "host", "depth", "generation",
        F.col("status_code").cast("int"), "success",
        F.length("text").cast("long").alias("text_len"),
    ).orderBy("url")


def q_crawl_extract_markdown(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The one-Arrow-stage extraction pipeline (scrape → cleaned_html →
    markdown+citations → fit_markdown) over synthetic pages."""
    pages = generate_pages(spark, 4, 8)
    out = process_pages(pages)
    return out.select(
        "url",
        F.col("status_code").cast("int"), "success",
        F.length("cleaned_html").cast("long").alias("cleaned_len"),
        F.length(F.col("markdown.raw_markdown")).cast("long").alias("md_len"),
        F.length(F.col("markdown.fit_markdown")).cast("long").alias("fit_md_len"),
        F.size(F.col("links.internal")).cast("long").alias("n_internal"),
        F.size(F.col("links.external")).cast("long").alias("n_external"),
    ).orderBy("url")


def q_crawl_text_identity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-row invariant (BASELINE.json input_hint): the Spark pipeline's
    extracted text must be byte-identical to the stored oracle ``text``
    column for every url. Returns a one-row summary — n_mismatch MUST be 0."""
    pages = generate_pages(spark, 5, 12).cache()
    out = process_pages(pages).select("url", F.col("text").alias("spark_text"))
    j = pages.select("url", "text").join(out, "url", "inner")
    return j.agg(
        F.count("*").cast("long").alias("n_pages"),
        F.sum(F.when(F.col("text") != F.col("spark_text"), 1).otherwise(0))
        .cast("long").alias("n_mismatch"),
    )


QUERIES = {
    "crawl_bfs_e2e": q_crawl_bfs_e2e,
    "crawl_extract_markdown": q_crawl_extract_markdown,
    "crawl_text_identity": q_crawl_text_identity,
}
ORACLES: dict = {}  # rows-only: oracle is the pytest parity + golden suite
