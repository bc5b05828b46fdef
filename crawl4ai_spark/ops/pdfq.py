"""PDF source processing — the NaivePDFProcessorStrategy analog as queries.

The reference ships a PDF pipeline (processors/pdf/processor.py:57):
per-page raw_text extraction, PDFMetadata (title/author/producer/pages),
merged document text. This module runs that surface distributed: a
binary→struct Arrow stage per document, no shuffle (the 100 TB shape — PDF
parsing is strictly per-row work, like the simhash/minhash fast paths).

No real PDFs ship in the sandbox and no PDF library is installed, so the
corpus is SYNTHESIZED deterministically from the documents table with the
from-scratch naive writer (html/pdf.py build_pdf: the first 600 chars of
each doc as 200-char pages, title "doc-<id>") and parsed back from the
REAL bytes by the from-scratch parser (parse_pdf). The DuckDB oracle
recomputes the expected metadata/page text purely from the construction
inputs — it never sees the bytes — so a defect in either the writer or the
parser (escaping, FlateDecode, page tree, text operators) breaks the
value-hash match. This is round-trip machinery, not a self-oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from crawl4ai_spark.html.pdf import PDF_VERSION, PRODUCER, build_pdf, parse_pdf
from crawl4ai_spark.ops.common import tbl

PAGE_CHARS = 200
MAX_CHARS = 600
AUTHOR = "crawl4ai-spark"


def _doc_pages(text: str) -> list[str]:
    src = (text or "")[:MAX_CHARS]
    return [src[i:i + PAGE_CHARS] for i in range(0, len(src), PAGE_CHARS)]


def q_pdf_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document PDF metadata + merged text (PDFProcessResult analog):
    build real bytes, parse them back, emit what the parser derived."""
    import hashlib

    import pandas as pd

    d = tbl(spark, sf_dir, "documents")

    def extract(batches):
        for pdf in batches:
            out = []
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                blob = build_pdf(_doc_pages(text), title=f"doc-{doc_id}",
                                 author=AUTHOR)
                r = parse_pdf(blob)
                out.append((doc_id, r["version"], r["title"], r["author"],
                            r["producer"], r["n_pages"], len(r["text"]),
                            hashlib.md5(r["text"].encode()).hexdigest(),
                            len(blob)))
            yield pd.DataFrame(out, columns=[
                "doc_id", "pdf_version", "title", "author", "producer",
                "n_pages", "n_chars", "text_md5", "pdf_bytes"])

    return d.select("doc_id", "text").mapInPandas(
        extract,
        "doc_id long, pdf_version string, title string, author string, "
        "producer string, n_pages long, n_chars long, text_md5 string, "
        "pdf_bytes long",
    ).drop("pdf_bytes")  # byte size is writer-internal, not oracle-checkable


SQL_PDF_EXTRACT = f"""
WITH src AS (
  SELECT doc_id, substr(text, 1, {MAX_CHARS}) AS s FROM documents
),
n AS (
  SELECT doc_id, s,
         CASE WHEN length(s) = 0 THEN 1
              ELSE CAST(ceil(length(s) / {PAGE_CHARS}.0) AS INT) END AS np,
         length(s) > 0 AS has_text
  FROM src
),
pages AS (
  SELECT doc_id, np, CAST(p.i AS INT) AS pno,
         substr(s, CAST({PAGE_CHARS} * p.i + 1 AS INT), {PAGE_CHARS}) AS ptext
  FROM n, unnest(range(np)) p(i)
),
merged AS (
  SELECT doc_id, any_value(np) AS np,
         string_agg(ptext, chr(10) ORDER BY pno) AS full_text
  FROM pages GROUP BY doc_id
)
SELECT doc_id,
       '{PDF_VERSION}' AS pdf_version,
       'doc-' || doc_id AS title,
       '{AUTHOR}' AS author,
       '{PRODUCER}' AS producer,
       CAST(np AS BIGINT) AS n_pages,
       CAST(length(coalesce(full_text, '')) AS BIGINT) AS n_chars,
       md5(coalesce(full_text, '')) AS text_md5
FROM merged
"""


def q_pdf_pages(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-page rows (PDFPage analog: page_number 1-based + raw_text),
    row-expanding inside the same single Arrow stage."""
    import hashlib

    import pandas as pd

    d = tbl(spark, sf_dir, "documents")

    def explode(batches):
        for pdf in batches:
            out = []
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                blob = build_pdf(_doc_pages(text), title=f"doc-{doc_id}",
                                 author=AUTHOR)
                r = parse_pdf(blob)
                for i, ptext in enumerate(r["pages"]):
                    out.append((doc_id, i + 1, len(ptext),
                                hashlib.md5(ptext.encode()).hexdigest()))
            yield pd.DataFrame(out, columns=[
                "doc_id", "page_number", "n_chars", "page_md5"])

    return d.select("doc_id", "text").mapInPandas(
        explode,
        "doc_id long, page_number long, n_chars long, page_md5 string")


SQL_PDF_PAGES = f"""
WITH src AS (
  SELECT doc_id, substr(text, 1, {MAX_CHARS}) AS s FROM documents
),
n AS (
  SELECT doc_id, s,
         CASE WHEN length(s) = 0 THEN 1
              ELSE CAST(ceil(length(s) / {PAGE_CHARS}.0) AS INT) END AS np
  FROM src
)
SELECT doc_id,
       CAST(p.i + 1 AS BIGINT) AS page_number,
       CAST(length(substr(s, CAST({PAGE_CHARS} * p.i + 1 AS INT), {PAGE_CHARS})) AS BIGINT) AS n_chars,
       md5(substr(s, CAST({PAGE_CHARS} * p.i + 1 AS INT), {PAGE_CHARS})) AS page_md5
FROM n, unnest(range(np)) p(i)
"""


QUERIES = {
    "pdf_extract": q_pdf_extract,
    "pdf_pages": q_pdf_pages,
}
ORACLES = {
    "pdf_extract": SQL_PDF_EXTRACT,
    "pdf_pages": SQL_PDF_PAGES,
}
