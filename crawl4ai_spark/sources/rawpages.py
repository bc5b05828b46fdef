"""file:// and raw: page sources (S3/S4).

Parity targets: /root/reference/crawl4ai/async_crawler_strategy.py:455-478
(file branch — read a local file as the page body) and :485-498 (raw:/raw://
branch — the "URL" IS the HTML). Both land in the same ``pages`` table shape
(BASELINE.json input_hint), so every downstream operator works unchanged.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from crawl4ai_spark.sources.pagesgen import PAGES_SCHEMA


def pages_from_files(spark: SparkSession, path_glob: str) -> DataFrame:
    """Local/remote HTML files → pages rows (url = file:// path).
    Uses the binaryFile source: distributed, predicate-pushdown on path."""
    bf = spark.read.format("binaryFile").load(path_glob)
    return bf.select(
        F.concat(F.lit("file://"), F.col("path")).alias("url"),
        F.col("modificationTime").alias("warc_ts"),
        F.col("content").alias("html"),
        F.lit(None).cast("string").alias("text"),
        F.lit(None).cast("string").alias("lang"),
    )


def pages_from_raw(spark: SparkSession, docs: list[tuple[str, str]]) -> DataFrame:
    """Literal (url, html) pairs → pages rows (the raw: scheme analog)."""
    rows = [
        {"url": u, "warc_ts": None, "html": h.encode("utf-8"),
         "text": None, "lang": None}
        for u, h in docs
    ]
    return spark.createDataFrame(rows, PAGES_SCHEMA)
