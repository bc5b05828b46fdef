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


N_LINK_SPACE = 997  # deterministic synthetic outlink id space


def _wat_title(text: str) -> str:
    """JSON-safe-by-construction title slug: lower, first 48 chars,
    [a-z0-9 ] only, trimmed — identical semantics in python / Spark /
    DuckDB (substr is chars in all three; the char class leaves no
    whitespace but ' ' so trim == strip)."""
    import re

    return re.sub(r"[^a-z0-9 ]", "", text[:48].lower()).strip()


def _wat_links(doc_id: int) -> list[str]:
    return [f"{URI_PREFIX}{(doc_id * 7 + k * 13 + 1) % N_LINK_SPACE}"
            for k in range(3)]


def q_wat_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WAT (the Common-Crawl metadata sibling — JSON Envelope records
    describing each response: headers, title, outlinks): group docs into
    WARC_BATCH-record segments, write REAL WAT bytes whose payload is
    canonical compact JSON, parse back, explode the metadata records and
    re-extract title / link count FROM THE PARSED JSON. The DuckDB oracle
    rebuilds the exact canonical JSON string by concatenation (title slug
    is JSON-safe by construction) and hashes it — any drift in the
    writer's canonicalization, the Content-Length framing, or the
    parser's payload walk breaks the value-hash match. Completes the
    WARC/WET/WAT Common-Crawl format trio."""
    import json

    import pandas as pd

    from crawl4ai_spark.html.warc import build_wat

    d = tbl(spark, sf_dir, "documents").select("doc_id", "text")
    d = d.withColumn("bucket", F.expr(f"doc_id div {WARC_BATCH}"))

    def assemble(key, pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("doc_id")
        recs = []
        for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
            meta = {"Envelope": {
                "Format": "WARC",
                "Payload-Metadata": {
                    "Actual-Content-Type": "application/http; msgtype=response",
                    "HTTP-Response-Metadata": {
                        "Entity-Length": len(text.encode()),
                        "HTML-Metadata": {
                            "Head": {"Title": _wat_title(text)},
                            "Links": [{"url": u} for u in _wat_links(int(doc_id))],
                        },
                    },
                },
                "WARC-Header-Metadata": {
                    "WARC-Target-URI": f"{URI_PREFIX}{doc_id}",
                    "WARC-Type": "response",
                },
            }}
            recs.append({"uri": f"{URI_PREFIX}{doc_id}", "meta": meta})
        blob = build_wat(recs, date=WARC_DATE)
        parsed = parse_warc(blob)
        out = []
        md = [r for r in parsed if r["warc_type"] == "metadata"]
        for r in md:
            env = json.loads(r["payload"])["Envelope"]
            http = env["Payload-Metadata"]["HTTP-Response-Metadata"]
            out.append((
                int(key[0]), r["uri"], r["content_type"],
                len(r["payload"]),
                hashlib.md5(r["payload"]).hexdigest(),
                bool(r["refers_to"]) and r["refers_to"] != r["record_id"],
                http["HTML-Metadata"]["Head"]["Title"],
                len(http["HTML-Metadata"]["Links"]),
                http["Entity-Length"],
                len(md)))
        return pd.DataFrame(out, columns=[
            "bucket", "uri", "wat_content_type", "payload_len",
            "payload_md5", "refers_ok", "title", "n_links",
            "entity_len", "n_records"])

    return d.groupBy("bucket").applyInPandas(
        assemble,
        "bucket long, uri string, wat_content_type string,"
        " payload_len long, payload_md5 string, refers_ok boolean,"
        " title string, n_links long, entity_len long, n_records long")


SQL_WAT_ROUNDTRIP = f"""
WITH b AS (
  SELECT doc_id, text, doc_id // {WARC_BATCH} AS bucket FROM documents
),
n AS (
  SELECT bucket, CAST(count(*) AS BIGINT) AS n_records FROM b GROUP BY bucket
),
f AS (
  SELECT bucket, doc_id,
         trim(regexp_replace(lower(substr(text, 1, 48)), '[^a-z0-9 ]', '', 'g')) AS title,
         CAST(octet_length(encode(text)) AS BIGINT) AS entity_len,
         '{URI_PREFIX}' || doc_id AS uri,
         '{URI_PREFIX}' || ((doc_id * 7 + 1) % {N_LINK_SPACE}) AS l0,
         '{URI_PREFIX}' || ((doc_id * 7 + 14) % {N_LINK_SPACE}) AS l1,
         '{URI_PREFIX}' || ((doc_id * 7 + 27) % {N_LINK_SPACE}) AS l2
  FROM b
),
j AS (
  SELECT *,
    '{{"Envelope":{{"Format":"WARC","Payload-Metadata":{{"Actual-Content-Type":"application/http; msgtype=response","HTTP-Response-Metadata":{{"Entity-Length":'
    || entity_len
    || ',"HTML-Metadata":{{"Head":{{"Title":"' || title
    || '"}},"Links":[{{"url":"' || l0 || '"}},{{"url":"' || l1
    || '"}},{{"url":"' || l2
    || '"}}]}}}}}},"WARC-Header-Metadata":{{"WARC-Target-URI":"' || uri
    || '","WARC-Type":"response"}}}}}}' AS js
  FROM f
)
SELECT j.bucket, j.uri, 'application/json' AS wat_content_type,
       CAST(octet_length(encode(js)) AS BIGINT) AS payload_len,
       md5(js) AS payload_md5,
       TRUE AS refers_ok, j.title,
       CAST(3 AS BIGINT) AS n_links, j.entity_len, n.n_records
FROM j JOIN n USING (bucket)
"""


QUERIES = {"warc_roundtrip": q_warc_roundtrip,
           "wet_roundtrip": q_wet_roundtrip,
           "wat_roundtrip": q_wat_roundtrip}
ORACLES = {"warc_roundtrip": SQL_WARC_ROUNDTRIP,
           "wet_roundtrip": SQL_WET_ROUNDTRIP,
           "wat_roundtrip": SQL_WAT_ROUNDTRIP}
