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


def pages_from_warc(spark: SparkSession, path_glob: str) -> DataFrame:
    """WARC segments → pages rows (S12 read side): the Common-Crawl
    ingestion path. binaryFile scan (distributed, path pushdown) → one
    Arrow stage running the from-scratch framing parser per segment,
    exploding its response records; WARC-Date becomes warc_ts, the HTTP
    payload becomes html. Segment parsing is strictly per-file work —
    the 100 TB shape (CC segments are ~1 GB each; at that size raise
    ``maxPartitionBytes`` or pre-split, the parse itself never shuffles).
    """
    import datetime as _dt

    import pandas as pd

    from crawl4ai_spark.html.warc import parse_warc

    bf = spark.read.format("binaryFile").load(path_glob) \
        .select("path", "content")

    def explode_records(batches):
        for pdf in batches:
            out = []
            for blob in pdf["content"]:
                for r in parse_warc(bytes(blob)):
                    if r["warc_type"] != "response":
                        continue
                    ts = _dt.datetime.strptime(
                        r["date"], "%Y-%m-%dT%H:%M:%SZ").replace(
                        tzinfo=_dt.timezone.utc)
                    out.append((r["uri"], ts, r["payload"]))
            yield pd.DataFrame(out, columns=["url", "warc_ts", "html"])

    rec = bf.mapInPandas(explode_records,
                         "url string, warc_ts timestamp, html binary")
    return rec.select(
        "url", "warc_ts", "html",
        F.lit(None).cast("string").alias("text"),
        F.lit(None).cast("string").alias("lang"))


def texts_from_wet(spark: SparkSession, path_glob: str) -> DataFrame:
    """WET segments → (url, warc_ts, text) rows: the extracted-text
    ingestion path most corpus pipelines start from (they never touch the
    WARC html at all). Same per-file Arrow parse as ``pages_from_warc``,
    exploding the conversion records instead."""
    import datetime as _dt

    import pandas as pd

    from crawl4ai_spark.html.warc import parse_warc

    bf = spark.read.format("binaryFile").load(path_glob) \
        .select("path", "content")

    def explode_records(batches):
        for pdf in batches:
            out = []
            for blob in pdf["content"]:
                for r in parse_warc(bytes(blob)):
                    if r["warc_type"] != "conversion":
                        continue
                    ts = _dt.datetime.strptime(
                        r["date"], "%Y-%m-%dT%H:%M:%SZ").replace(
                        tzinfo=_dt.timezone.utc)
                    out.append((r["uri"], ts,
                                r["payload"].decode("utf-8")))
            yield pd.DataFrame(out, columns=["url", "warc_ts", "text"])

    return bf.mapInPandas(explode_records,
                          "url string, warc_ts timestamp, text string")
