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


def anchor_text_table(results: DataFrame) -> DataFrame:
    """The classic search-index link signal: per (target URL, anchor text),
    how many pages link there with that text and from how many distinct
    source hosts. Anchor text describes the TARGET page better than the
    target's own content (the original PageRank-era insight), and the
    aggregation is what an indexer joins onto the document table.

    Works on any engine/extraction results carrying the ``links`` struct
    (hrefs already resolved + canonicalized by the scraper). Scale: one
    explode + ONE (target, anchor) aggregate — partial counts map-side;
    n_src_hosts is a countDistinct whose dedup rides the same shuffle key.
    At 10^10 edges this is the same single-aggregate plan; skewed targets
    (home pages) split fine under AQE because the key includes the anchor
    text."""
    links = results.select(
        F.col("host").alias("src_host"),
        F.explode(F.concat(F.col("links.internal"),
                           F.col("links.external"))).alias("l"))
    return (
        links.select("src_host",
                     F.col("l.href").alias("target_url"),
                     F.lower(F.trim(F.col("l.text"))).alias("anchor"))
        .groupBy("target_url", "anchor")
        .agg(F.count("*").cast("long").alias("n_inlinks"),
             F.countDistinct("src_host").cast("long").alias("n_src_hosts"))
    )


def q_crawl_anchor_text(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Anchor-text table over the synthetic site's extraction results
    (rows-only registry entry; the aggregation itself is exactly tested in
    tests/test_anchor_text.py on hand-built link structs)."""
    pages = generate_pages(spark, 4, 8)
    out = process_pages(pages).withColumn(
        "host", F.expr("parse_url(url, 'HOST')"))
    return anchor_text_table(out)


def q_sitemap_emit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sitemap WRITE side (html/sitemap.py build_urlset — the engine's
    ``sink='sitemap'`` artifact): per host, the canonical urlset document
    over the synthetic URL corpus, reported as (n_urls, n_bytes, xml_md5).
    The REAL python writer runs in the query (one applyInPandas group per
    host — the export_sitemaps shape); the DuckDB oracle REBUILDS the
    canonical XML by string concatenation (escape → sort by raw url →
    frame) and md5s its UTF-8 bytes, so any escaping/ordering/framing
    drift in the writer breaks the value hash."""
    import hashlib as _hl

    import pandas as pd

    from crawl4ai_spark.html.sitemap import build_urlset
    from crawl4ai_spark.ops.scheduling import _urls

    rows = _urls(spark, sf_dir).select("host", "url").distinct()

    def emit(pdf: pd.DataFrame) -> pd.DataFrame:
        blob = build_urlset(sorted(pdf["url"]), lastmod="2026-01-01")
        return pd.DataFrame([{
            "host": pdf["host"].iloc[0],
            "n_urls": len(pdf),
            "n_bytes": len(blob),
            "xml_md5": _hl.md5(blob).hexdigest(),
        }])

    return rows.groupBy("host").applyInPandas(
        emit, "host string, n_urls long, n_bytes long, xml_md5 string")


from crawl4ai_spark.ops.scheduling import _SQL_URLS  # noqa: E402

SQL_SITEMAP_EMIT = f"""
WITH u AS (
  SELECT DISTINCT host, url FROM ({_SQL_URLS})
), esc AS (
  SELECT host, url,
         replace(replace(replace(url, '&', '&amp;'), '<', '&lt;'),
                 '>', '&gt;') AS loc
  FROM u
), doc AS (
  SELECT host, count(*) AS n_urls,
         '<?xml version="1.0" encoding="UTF-8"?>' || chr(10)
         || '<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">'
         || chr(10)
         || string_agg('<url><loc>' || loc
                       || '</loc><lastmod>2026-01-01</lastmod></url>'
                       || chr(10), '' ORDER BY url)
         || '</urlset>' || chr(10) AS xml
  FROM esc GROUP BY host
)
SELECT host, CAST(n_urls AS BIGINT) AS n_urls,
       CAST(octet_length(encode(xml)) AS BIGINT) AS n_bytes,
       md5(xml) AS xml_md5
FROM doc
"""


SMAP_HOSTS = 3
SMAP_URLS = 9


def q_seed_sitemaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S6 end-to-end: robots ``Sitemap:`` roots → gz/nested sitemap-index
    recursion → page URLs. The synthetic blob graph is deterministic, so the
    EXPECTED output is expressible in plain SQL — the oracle checks the
    whole parse+recursion pipeline's result."""
    from crawl4ai_spark.sources.seeder import (
        seed_from_sitemaps,
        synthetic_sitemap_blobs,
    )

    blobs = synthetic_sitemap_blobs(spark, SMAP_HOSTS, SMAP_URLS)
    return seed_from_sitemaps(spark, blobs).select(
        "url", "host", "lastmod", "source_sitemap")


SQL_SEED_SITEMAPS = f"""
SELECT 'https://www.smap' || h || '.com/p' || i AS url,
       'www.smap' || h || '.com' AS host,
       '2025-0' || (1 + i % 9) || '-01' AS lastmod,
       'https://www.smap' || h || '.com/' ||
         (CASE WHEN i < {SMAP_URLS // 3} THEN 'sitemap_a.xml'
               WHEN i < {2 * (SMAP_URLS // 3)} THEN 'sitemap_b.xml.gz'
               ELSE 'sitemap_c.xml' END) AS source_sitemap
FROM range({SMAP_HOSTS}) a(h), range({SMAP_URLS}) b(i)
"""


FEED_HOSTS = 3
FEED_ITEMS = 9


def q_seed_feeds(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S6 sibling, RSS/Atom: HTML-head feed autodiscovery → RSS 2.0 /
    Atom / gzipped-RSS item extraction → page URLs.  Mirrors the sitemap
    seeder's two-phase shape (reference seeder: async_url_seeder.py's
    head-fetch + extract surface); the synthetic blob graph is
    deterministic, so the EXPECTED output is plain SQL and the oracle
    checks autodiscovery, both formats, gz transparency, and the
    rel="self" exclusion at once."""
    from crawl4ai_spark.sources.seeder import (
        seed_from_feeds,
        synthetic_feed_blobs,
    )

    blobs = synthetic_feed_blobs(spark, FEED_HOSTS, FEED_ITEMS)
    return seed_from_feeds(spark, blobs).select(
        "url", "host", "published", "feed_url", "feed_kind")


_FT = FEED_ITEMS // 3
SQL_SEED_FEEDS = f"""
SELECT 'https://www.feed' || h || '.com/post/' || i AS url,
       'www.feed' || h || '.com' AS host,
       CASE WHEN i >= {_FT} AND i < {2 * _FT}
            THEN '2025-01-0' || (1 + i % 9) || 'T00:00:00Z'
            ELSE 'Mon, 0' || (1 + i % 9) || ' Jan 2025 00:00:00 GMT'
       END AS published,
       'https://www.feed' || h || '.com/' ||
         (CASE WHEN i < {_FT} THEN 'feed.xml'
               WHEN i < {2 * _FT} THEN 'atom.xml'
               ELSE 'archive.xml.gz' END) AS feed_url,
       CASE WHEN i >= {_FT} AND i < {2 * _FT} THEN 'atom'
            ELSE 'rss' END AS feed_kind
FROM range({FEED_HOSTS}) a(h), range({FEED_ITEMS}) b(i)
"""


def q_chunk_topics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TextTiling topic segments over the documents table (E16 tail) — one
    Arrow stage, rows (doc_id, seg_no, n_chars, md5). Not SQL-expressible
    (the published algorithm is iterative); rows-only driver check, unit
    semantics in tests/test_html_stack.py."""
    import hashlib

    import pandas as pd

    from crawl4ai_spark.html.chunking import topic_segment_chunk
    from crawl4ai_spark.ops.common import tbl

    d = tbl(spark, sf_dir, "documents").select("doc_id", "text")

    def seg(batches):
        for pdf in batches:
            rows = []
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                for i, s in enumerate(topic_segment_chunk(text or "")):
                    rows.append((doc_id, i, len(s),
                                 hashlib.md5(s.encode()).hexdigest()))
            yield pd.DataFrame(
                rows, columns=["doc_id", "seg_no", "n_chars", "seg_md5"])

    return d.mapInPandas(seg, "doc_id long, seg_no long, n_chars long, seg_md5 string")


QUERIES = {
    "crawl_bfs_e2e": q_crawl_bfs_e2e,
    "crawl_extract_markdown": q_crawl_extract_markdown,
    "crawl_anchor_text": q_crawl_anchor_text,
    "crawl_text_identity": q_crawl_text_identity,
    "seed_sitemaps": q_seed_sitemaps,
    "seed_feeds": q_seed_feeds,
    "sitemap_emit": q_sitemap_emit,
    "chunk_topics": q_chunk_topics,
}
# crawl_* are rows-only (oracle = pytest parity + golden suites);
# seed_sitemaps / seed_feeds / sitemap_emit have full result oracles
ORACLES: dict = {"seed_sitemaps": SQL_SEED_SITEMAPS,
                 "seed_feeds": SQL_SEED_FEEDS,
                 "sitemap_emit": SQL_SITEMAP_EMIT}
