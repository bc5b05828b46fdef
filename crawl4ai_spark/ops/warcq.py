"""WARC archive assembly + extraction as queries (the Common-Crawl
source/sink format; no reference counterpart — crawl4ai fetches live).

Same construction-derived-oracle discipline as ``ops/pdfq.py``: documents
are grouped into WARC_BATCH-record archives, written to REAL WARC/1.0
bytes by the from-scratch writer, parsed back by the from-scratch parser,
and the DuckDB oracle recomputes every emitted field purely from the
documents table — a defect in either the framing writer or the
Content-Length walker breaks the value-hash match.

Scale shape: archive assembly is ONE shuffle on the bucket id (the same
key the parse-back explode stays on); per-record work is strictly
row-local. At 100 TB this is exactly how WARC segments are built —
bounded-size buckets, no cross-bucket traffic.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from crawl4ai_spark.html.warc import build_warc, parse_warc
from crawl4ai_spark.ops.common import tbl

WARC_BATCH = 10
WARC_DATE = "2025-01-01T00:00:00Z"
URI_PREFIX = "https://corpus.example/doc/"


def q_warc_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document fields recovered from real multi-record WARC bytes:
    group docs into WARC_BATCH-record archives, write, parse back,
    explode the response records."""
    import pandas as pd

    d = tbl(spark, sf_dir, "documents").select("doc_id", "text")
    d = d.withColumn("bucket", F.expr(f"doc_id div {WARC_BATCH}"))

    def assemble(key, pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("doc_id")
        recs = [{"uri": f"{URI_PREFIX}{doc_id}",
                 "body": text.encode(),
                 "status": 200,
                 "content_type": "text/html; charset=utf-8"}
                for doc_id, text in zip(pdf["doc_id"], pdf["text"])]
        blob = build_warc(recs, date=WARC_DATE)
        parsed = parse_warc(blob)
        out = []
        n_resp = sum(1 for r in parsed if r["warc_type"] == "response")
        for r in parsed:
            if r["warc_type"] != "response":
                continue
            out.append((
                int(key[0]), r["uri"], r["status"], r["content_type"],
                len(r["payload"]),
                hashlib.md5(r["payload"]).hexdigest(),
                n_resp, len(blob)))
        return pd.DataFrame(out, columns=[
            "bucket", "uri", "status", "http_content_type", "payload_len",
            "payload_md5", "n_records", "blob_len"])

    return (d.groupBy("bucket").applyInPandas(
        assemble,
        "bucket long, uri string, status long, http_content_type string,"
        " payload_len long, payload_md5 string, n_records long,"
        " blob_len long")
        .drop("blob_len"))  # framing size is writer-internal


SQL_WARC_ROUNDTRIP = f"""
WITH b AS (
  SELECT doc_id, text, doc_id // {WARC_BATCH} AS bucket FROM documents
),
n AS (
  SELECT bucket, CAST(count(*) AS BIGINT) AS n_records FROM b GROUP BY bucket
)
SELECT b.bucket, '{URI_PREFIX}' || b.doc_id AS uri,
       CAST(200 AS BIGINT) AS status,
       'text/html; charset=utf-8' AS http_content_type,
       CAST(octet_length(encode(b.text)) AS BIGINT) AS payload_len,
       md5(b.text) AS payload_md5,
       n.n_records
FROM b JOIN n USING (bucket)
"""


def q_wet_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WET (extracted-text conversion records — what most corpus pipelines
    actually consume from Common Crawl): group docs into WET_BATCH-record
    segments, write REAL WET bytes, parse back, explode the conversion
    records; the refers-to linkage to the sibling WARC response ids is
    verified structurally (non-empty, distinct from the record's own id)."""
    import pandas as pd

    from crawl4ai_spark.html.warc import build_wet

    d = tbl(spark, sf_dir, "documents").select("doc_id", "text")
    d = d.withColumn("bucket", F.expr(f"doc_id div {WARC_BATCH}"))

    def assemble(key, pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("doc_id")
        recs = [{"uri": f"{URI_PREFIX}{doc_id}", "text": text}
                for doc_id, text in zip(pdf["doc_id"], pdf["text"])]
        blob = build_wet(recs, date=WARC_DATE)
        parsed = parse_warc(blob)
        out = []
        conv = [r for r in parsed if r["warc_type"] == "conversion"]
        for r in conv:
            out.append((
                int(key[0]), r["uri"], r["content_type"],
                len(r["payload"]),
                hashlib.md5(r["payload"]).hexdigest(),
                bool(r["refers_to"]) and r["refers_to"] != r["record_id"],
                len(conv)))
        return pd.DataFrame(out, columns=[
            "bucket", "uri", "wet_content_type", "payload_len",
            "payload_md5", "refers_ok", "n_records"])

    return d.groupBy("bucket").applyInPandas(
        assemble,
        "bucket long, uri string, wet_content_type string,"
        " payload_len long, payload_md5 string, refers_ok boolean,"
        " n_records long")


SQL_WET_ROUNDTRIP = f"""
WITH b AS (
  SELECT doc_id, text, doc_id // {WARC_BATCH} AS bucket FROM documents
),
n AS (
  SELECT bucket, CAST(count(*) AS BIGINT) AS n_records FROM b GROUP BY bucket
)
SELECT b.bucket, '{URI_PREFIX}' || b.doc_id AS uri,
       'text/plain' AS wet_content_type,
       CAST(octet_length(encode(b.text)) AS BIGINT) AS payload_len,
       md5(b.text) AS payload_md5,
       TRUE AS refers_ok,
       n.n_records
FROM b JOIN n USING (bucket)
"""


QUERIES = {"warc_roundtrip": q_warc_roundtrip,
           "wet_roundtrip": q_wet_roundtrip}
ORACLES = {"warc_roundtrip": SQL_WARC_ROUNDTRIP,
           "wet_roundtrip": SQL_WET_ROUNDTRIP}
