"""Crawl-trap detection: infinite URL spaces flagged by pattern fan-out.

A 10^10-URL frontier dies on URL spaces that grow without bound — calendar
pages, faceted search, pagination explosions — which canonicalization can't
collapse (the URLs are genuinely distinct) but which contribute almost no
distinct content. The standard defense (Heydon & Najork's Mercator notes
this; every production crawler ships a variant) is PATTERN-level budgeting:
collapse each URL to its template (digit runs → '#'), then per (host,
pattern) compare the URL fan-out against the distinct-content count and
stop scheduling patterns whose fan-out is large but content diversity is
tiny. The reference has per-URL filters only (`deep_crawling/filters.py`) —
nothing pattern-level; this is the operator that protects its BFS at scale.

Inputs are synthesized deterministically from the documents table (the
``refreshq`` convention): four URL families per doc_id — article pages
(distinct content), a calendar trap (many URLs, content cycling through 7
variants), a paginated listing (mild reuse), and a tiny static family.

Verdict per (host, pattern): n_urls, n_contents (distinct content hashes),
fanout_e6 = n_urls·1e6 div n_contents, and trap = n_urls ≥ TRAP_MIN_URLS
AND n_contents · TRAP_DIVERSITY_X ≤ n_urls. All native expressions; ONE
(host, pattern) aggregate whose distinct-count rides the same shuffle key —
at 10^10 URLs this is the same single partial-aggregated pass, and the
resulting pattern table is tiny enough to broadcast back into the
scheduler as a block-list (the `domain_gate` composition).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from crawl4ai_spark.ops.common import tbl

TRAP_MIN_URLS = 8       # a pattern this wide gets audited
TRAP_DIVERSITY_X = 4    # trap iff n_urls >= 4 x n_distinct_contents


def _trap_urls(d: DataFrame) -> DataFrame:
    """(doc_id) -> (host, url, content_key): the deterministic URL corpus.
    Family by doc_id % 4: 0 = /article/<id> (content distinct), 1 =
    /cal/<year>/<month> (trap: content cycles mod 7), 2 = /list/page/<n>
    (content cycles mod 5 — reuse, but narrow), 3 = /about (one URL)."""
    fam = F.col("doc_id") % 4
    host = F.concat(F.lit("www.site"), (F.col("doc_id") % 3).cast("string"),
                    F.lit(".com"))
    # host (mod 3) x family (mod 4) pins doc_id mod 12 (CRT), so every
    # URL component must derive from q = doc_id div 12 or it degenerates
    # to a handful of values per (host, family) cell
    q = F.expr("doc_id div 12")
    url = (
        F.when(fam == 0, F.concat(F.lit("/article/"),
                                  F.col("doc_id").cast("string")))
        .when(fam == 1, F.concat(F.lit("/cal/"),
                                 (F.lit(2000) + q % 30).cast("string"),
                                 F.lit("/"),
                                 (F.lit(1) + F.expr("(doc_id div 12) div 30")
                                  % 12).cast("string")))
        .when(fam == 2, F.concat(F.lit("/list/page/"),
                                 (q % 40).cast("string")))
        .otherwise(F.lit("/about"))
    )
    content = (
        F.when(fam == 0, F.md5(F.concat(F.lit("a"),
                                        F.col("doc_id").cast("string"))))
        .when(fam == 1, F.md5(F.concat(F.lit("c"), (q % 7).cast("string"))))
        .when(fam == 2, F.md5(F.concat(F.lit("l"), (q % 5).cast("string"))))
        .otherwise(F.md5(F.lit("about")))
    )
    return d.select(host.alias("host"), url.alias("url"),
                    content.alias("content_key"))


def q_trap_detect(spark: SparkSession, sf_dir: str) -> DataFrame:
    urls = _trap_urls(tbl(spark, sf_dir, "documents").select("doc_id"))
    pat = urls.select(
        "host",
        F.regexp_replace("url", "[0-9]+", "#").alias("pattern"),
        "url", "content_key")
    agg = pat.groupBy("host", "pattern").agg(
        F.countDistinct("url").alias("n_urls"),
        F.countDistinct("content_key").alias("n_contents"))
    return agg.select(
        "host", "pattern",
        F.col("n_urls").cast("long"),
        F.col("n_contents").cast("long"),
        F.expr("n_urls * 1000000 div n_contents").cast("long")
        .alias("fanout_e6"),
        ((F.col("n_urls") >= TRAP_MIN_URLS)
         & (F.col("n_contents") * TRAP_DIVERSITY_X <= F.col("n_urls")))
        .alias("trap"))


SQL_TRAP_DETECT = f"""
WITH urls AS (
  SELECT concat('www.site', CAST(doc_id % 3 AS VARCHAR), '.com') AS host,
         CASE doc_id % 4
           WHEN 0 THEN concat('/article/', CAST(doc_id AS VARCHAR))
           WHEN 1 THEN concat('/cal/',
                              CAST(2000 + (doc_id // 12) % 30 AS VARCHAR),
                              '/',
                              CAST(1 + ((doc_id // 12) // 30) % 12
                                   AS VARCHAR))
           WHEN 2 THEN concat('/list/page/',
                              CAST((doc_id // 12) % 40 AS VARCHAR))
           ELSE '/about' END AS url,
         CASE doc_id % 4
           WHEN 0 THEN md5(concat('a', CAST(doc_id AS VARCHAR)))
           WHEN 1 THEN md5(concat('c', CAST((doc_id // 12) % 7 AS VARCHAR)))
           WHEN 2 THEN md5(concat('l', CAST((doc_id // 12) % 5 AS VARCHAR)))
           ELSE md5('about') END AS content_key
  FROM documents
), agg AS (
  SELECT host, regexp_replace(url, '[0-9]+', '#', 'g') AS pattern,
         count(DISTINCT url) AS n_urls,
         count(DISTINCT content_key) AS n_contents
  FROM urls GROUP BY 1, 2
)
SELECT host, pattern,
       CAST(n_urls AS BIGINT) AS n_urls,
       CAST(n_contents AS BIGINT) AS n_contents,
       CAST(n_urls * 1000000 // n_contents AS BIGINT) AS fanout_e6,
       (n_urls >= {TRAP_MIN_URLS}
        AND n_contents * {TRAP_DIVERSITY_X} <= n_urls) AS trap
FROM agg
"""


QUERIES = {
    "trap_detect": q_trap_detect,
}
ORACLES = {
    "trap_detect": SQL_TRAP_DETECT,
}
