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


# ---------------------------------------------------------------------------
# CDX index emission (the publishing side of the seeder's S5 read path):
# build REAL WARC segments, walk their bytes for offsets, emit the
# CDX-JSONL index. The oracle re-derives every byte offset from the
# writer's framing arithmetic alone — record length is an affine function
# of len(uri) and len(body) plus the decimal-digit widths of the two
# Content-Length values — so a single framing defect anywhere in the
# writer or the offset walk breaks the value-hash match.
# ---------------------------------------------------------------------------

CDX_HOSTS = 7
CDX_CT = "text/html; charset=utf-8"

# Framing constants, derived from the writer's templates and
# self-checked against a real probe archive at import time:
#   block_len(B)  = HTTP_FIXED + digits(B) + B
#   rec_len(U, B) = REC_FIXED + U + digits(block_len) + block_len
from crawl4ai_spark.html.warc import WARC_VERSION as _WV  # noqa: E402

WARCINFO_LEN = len(build_warc([], date=WARC_DATE))
HTTP_FIXED = len(f"HTTP/1.1 200 OK\r\nContent-Type: {CDX_CT}\r\n"
                 "Content-Length: \r\n\r\n".encode())
REC_FIXED = len(
    (f"{_WV}\r\nWARC-Type: response\r\nWARC-Target-URI: \r\n"
     f"WARC-Date: {WARC_DATE}\r\n"
     "WARC-Record-ID: urn:uuid:00000000-0000-0000-0000-000000000000\r\n"
     "Content-Type: application/http;msgtype=response\r\n"
     "Content-Length: \r\n\r\n").encode()) + 4  # + record trailer CRLFCRLF


def _cdx_rec_len(uri_len: int, body_len: int) -> int:
    block = HTTP_FIXED + len(str(body_len)) + body_len
    return REC_FIXED + uri_len + len(str(block)) + block


def _cdx_selfcheck() -> None:
    from crawl4ai_spark.html.warc import parse_warc as _pw

    uri, body = "https://h0.corpus.example/docs/0", b"x" * 123
    blob = build_warc(
        [{"uri": uri, "body": body, "status": 200, "content_type": CDX_CT}],
        date=WARC_DATE)
    rec = [r for r in _pw(blob) if r["warc_type"] == "response"][0]
    assert rec["offset"] == WARCINFO_LEN, (rec["offset"], WARCINFO_LEN)
    assert rec["length"] == _cdx_rec_len(len(uri), len(body)), \
        (rec["length"], _cdx_rec_len(len(uri), len(body)))


_cdx_selfcheck()


def q_cdx_emit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Publish a CDX-JSONL index over real WARC segments: group docs into
    WARC_BATCH-record archives under per-doc hosts, write WARC bytes,
    walk the framing back out with ``build_cdx`` (offsets MEASURED from
    the byte walk), and explode the index entries — urlkey (SURT),
    timestamp, mime, digest, measured offset/length, filename, plus the
    md5 of the canonical JSONL line itself. One shuffle on the bucket id;
    per-segment work row-local — exactly how CC publishes cdx shards
    next to its segment files."""
    import pandas as pd

    from crawl4ai_spark.html.warc import build_cdx, cdx_jsonl

    d = tbl(spark, sf_dir, "documents").select("doc_id", "text")
    d = d.withColumn("bucket", F.expr(f"doc_id div {WARC_BATCH}"))

    def assemble(key, pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("doc_id")
        recs = [{
            "uri": (f"https://h{doc_id % CDX_HOSTS}.corpus.example"
                    f"/docs/{doc_id}"),
            "body": text.encode(),
            "status": 200,
            "content_type": CDX_CT,
        } for doc_id, text in zip(pdf["doc_id"], pdf["text"])]
        blob = build_warc(recs, date=WARC_DATE)
        bucket = int(key[0])
        filename = f"segment-{bucket:05d}.warc"
        entries = build_cdx(blob, filename)
        lines = cdx_jsonl(entries).splitlines()
        out = []
        for pos, (e, line) in enumerate(zip(entries, lines)):
            out.append((
                bucket, pos, e["urlkey"], e["timestamp"], e["url"],
                e["mime"], int(e["status"]), e["digest"],
                int(e["length"]), int(e["offset"]), e["filename"],
                hashlib.md5(line.encode()).hexdigest()))
        return pd.DataFrame(out, columns=[
            "bucket", "cdx_pos", "urlkey", "cdx_ts", "url", "mime",
            "status", "digest", "rec_length", "rec_offset", "filename",
            "line_md5"])

    return d.groupBy("bucket").applyInPandas(
        assemble,
        "bucket long, cdx_pos long, urlkey string, cdx_ts string,"
        " url string, mime string, status long, digest string,"
        " rec_length long, rec_offset long, filename string,"
        " line_md5 string")


SQL_CDX_EMIT = f"""
WITH b AS (
  SELECT doc_id, doc_id // {WARC_BATCH} AS bucket,
         'https://h' || (doc_id % {CDX_HOSTS}) || '.corpus.example/docs/'
           || doc_id AS url,
         'example,corpus,h' || (doc_id % {CDX_HOSTS}) || ')/docs/'
           || doc_id AS urlkey,
         CAST(octet_length(encode(text)) AS BIGINT) AS body_len,
         md5(text) AS digest
  FROM documents
),
r AS (
  SELECT *, {HTTP_FIXED} + length(CAST(body_len AS VARCHAR)) + body_len
              AS block_len
  FROM b
),
r2 AS (
  SELECT *, {REC_FIXED} + length(url)
              + length(CAST(block_len AS VARCHAR)) + block_len AS rec_length
  FROM r
),
o AS (
  SELECT *,
         {WARCINFO_LEN} + COALESCE(SUM(rec_length) OVER (
             PARTITION BY bucket ORDER BY doc_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
           0) AS rec_offset,
         'segment-' || lpad(CAST(bucket AS VARCHAR), 5, '0') || '.warc'
           AS filename
  FROM r2
),
p AS (
  SELECT *, CAST(row_number() OVER (
              PARTITION BY bucket ORDER BY urlkey, url) - 1 AS BIGINT)
            AS cdx_pos
  FROM o
)
SELECT bucket, cdx_pos, urlkey, '20250101000000' AS cdx_ts, url,
       'text/html' AS mime, CAST(200 AS BIGINT) AS status, digest,
       rec_length, rec_offset, filename,
       md5('{{"digest":"' || digest || '","filename":"' || filename
           || '","length":"' || rec_length || '","mime":"text/html"'
           || ',"offset":"' || rec_offset || '","status":"200"'
           || ',"timestamp":"20250101000000","url":"' || url
           || '","urlkey":"' || urlkey || '"}}') AS line_md5
FROM p
"""


QUERIES = {"warc_roundtrip": q_warc_roundtrip,
           "wet_roundtrip": q_wet_roundtrip,
           "wat_roundtrip": q_wat_roundtrip,
           "cdx_emit": q_cdx_emit}
ORACLES = {"warc_roundtrip": SQL_WARC_ROUNDTRIP,
           "wet_roundtrip": SQL_WET_ROUNDTRIP,
           "wat_roundtrip": SQL_WAT_ROUNDTRIP,
           "cdx_emit": SQL_CDX_EMIT}
