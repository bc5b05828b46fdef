"""Extraction-layer operators expressible natively over the documents table:
regex-catalog extraction (ref RegexExtractionStrategy,
extraction_strategy.py:1897-2100 — label→pattern catalog, one row per match)
and chunking (ref chunking_strategy.py:147-171 FixedLengthWordChunking;
:175-212 SlidingWindowChunking) as explode-to-rows — the "UDTF-like" shape of
SURVEY.md §2.4 realized with posexplode, no Python.

The adaptive-crawler saturation metric (adaptive_crawler.py:398-413 —
new-terms rate decay over crawl order) rounds out F19 next to
ranking.q_adaptive_coverage.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from crawl4ai_spark.ops.common import tbl

# label → regex, the catalog analog of ref _B (extraction_strategy.py:1920-60)
REGEX_CATALOG = {
    "number": "[0-9]+",
    "gerund": "[a-z]+ing\\b",
    "sp_word": "\\bsp[a-z]+",
}

CHUNK_SIZE = 40  # words per chunk (ref default 100; 40 suits the short docs)


def q_regex_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One row per (doc, label, match): regexp_extract_all + posexplode —
    entirely JVM-side; the pattern catalog is a literal, like the reference's
    IntFlag union of built-in patterns."""
    d = tbl(spark, sf_dir, "documents")
    parts = []
    for label, pat in REGEX_CATALOG.items():
        parts.append(
            d.select(
                "doc_id",
                F.lit(label).alias("label"),
                F.posexplode(
                    F.regexp_extract_all(F.lower("text"), F.lit(pat), F.lit(0))
                ).alias("match_no", "value"),
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out.select("doc_id", "label",
                      F.col("match_no").cast("long").alias("match_no"), "value")


def _sql_regex_part(label: str, pat: str) -> str:
    return f"""
  SELECT doc_id, '{label}' AS label,
         CAST(generate_subscripts(m, 1) - 1 AS BIGINT) AS match_no,
         m[generate_subscripts(m, 1)] AS value
  FROM (SELECT doc_id, regexp_extract_all(lower(text), '{pat}') AS m FROM documents)
"""


SQL_REGEX_EXTRACT = " UNION ALL ".join(
    _sql_regex_part(label, pat) for label, pat in REGEX_CATALOG.items()
)


def q_chunk_fixed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-length word chunking as rows: token posexplode → chunk_id =
    pos div N → re-assemble chunk text with array_agg ordered by position."""
    d = tbl(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id",
        F.posexplode(
            F.regexp_extract_all(F.lower("text"), F.lit("[a-z0-9]+"), F.lit(0))
        ).alias("pos", "tok"),
    ).withColumn("chunk_id", F.expr(f"pos div {CHUNK_SIZE}"))
    return (
        toks.groupBy("doc_id", "chunk_id")
        .agg(
            F.count("*").cast("long").alias("n_tokens"),
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "tok"))),
                    lambda s: s["tok"],
                ), " ",
            ).alias("chunk_text"),
        )
        .select("doc_id", F.col("chunk_id").cast("long"), "n_tokens", "chunk_text")
    )


SQL_CHUNK_FIXED = f"""
WITH toks AS (
  SELECT doc_id,
         CAST(generate_subscripts(m, 1) - 1 AS BIGINT) AS pos,
         m[generate_subscripts(m, 1)] AS tok
  FROM (SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS m FROM documents)
)
SELECT doc_id, CAST(pos // {CHUNK_SIZE} AS BIGINT) AS chunk_id,
       CAST(count(*) AS BIGINT) AS n_tokens,
       string_agg(tok, ' ' ORDER BY pos) AS chunk_text
FROM toks GROUP BY doc_id, pos // {CHUNK_SIZE}
"""


def q_adaptive_saturation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """New-terms-rate decay over crawl order (docs bucketed by doc_id/50):
    a term counts for the bucket where it is first seen. As buckets accrue,
    the new-term count decays → the reference's stop signal."""
    d = tbl(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id",
        F.explode(
            F.regexp_extract_all(F.lower("text"), F.lit("[a-z0-9]+"), F.lit(0))
        ).alias("tok"),
    )
    first_seen = toks.groupBy("tok").agg(F.min("doc_id").alias("first_doc"))
    return (
        first_seen.withColumn("bucket", F.expr("first_doc div 50").cast("long"))
        .groupBy("bucket")
        .agg(F.count("*").cast("long").alias("n_new_terms"))
    )


SQL_ADAPTIVE_SATURATION = """
WITH toks AS (
  SELECT doc_id, t.tok FROM documents,
         unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS t(tok)
),
first_seen AS (SELECT tok, min(doc_id) AS first_doc FROM toks GROUP BY tok)
SELECT CAST(first_doc // 50 AS BIGINT) AS bucket,
       CAST(count(*) AS BIGINT) AS n_new_terms
FROM first_seen GROUP BY 1
"""


QUERIES = {
    "regex_extract": q_regex_extract,
    "chunk_fixed": q_chunk_fixed,
    "adaptive_saturation": q_adaptive_saturation,
}
ORACLES = {
    "regex_extract": SQL_REGEX_EXTRACT,
    "chunk_fixed": SQL_CHUNK_FIXED,
    "adaptive_saturation": SQL_ADAPTIVE_SATURATION,
}
