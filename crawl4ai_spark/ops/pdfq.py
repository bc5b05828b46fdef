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


def _doc_images(doc_id: int, n_pages: int) -> list[list[dict]]:
    """Deterministic per-page image plan — the construction inputs the
    DuckDB oracle recomputes (reference extract_images parity,
    processors/pdf/processor.py:41,58-70): 1-2 small DeviceRGB images per
    page, alternating raw/FlateDecode storage, pixel j of image (d,i,k)
    = (d+i+k+j) mod 256."""
    pages = []
    for i in range(n_pages):
        imgs = []
        for k in range(1 + (doc_id + i) % 2):
            w = 2 + (doc_id + 7 * i + 3 * k) % 6
            h = 2 + (3 * doc_id + i + 5 * k) % 5
            px = bytes((doc_id + i + k + j) % 256 for j in range(w * h * 3))
            imgs.append({"width": w, "height": h, "pixels": px,
                         "compress": (doc_id + i + k) % 2 == 0})
        pages.append(imgs)
    return pages


def q_pdf_images(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-page image XObject enumeration (processor.py extract_images=True
    parity): build real PDFs with embedded raw/Flate DeviceRGB images, parse
    the bytes back, emit per-image format/dims/sample digest. Single
    row-expanding Arrow stage, zero shuffle — strictly per-row work, the
    100 TB shape. The parser re-derives width/height/colorspace/filter/
    samples from the PDF bytes alone; the oracle recomputes them from the
    construction formulas, never seeing the bytes."""
    import hashlib

    import pandas as pd

    d = tbl(spark, sf_dir, "documents")

    def explode(batches):
        for pdf in batches:
            out = []
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                page_texts = _doc_pages(text)
                n_pages = max(1, len(page_texts))
                blob = build_pdf(page_texts, title=f"doc-{doc_id}",
                                 author=AUTHOR,
                                 images=_doc_images(int(doc_id), n_pages))
                r = parse_pdf(blob)
                for i, page_imgs in enumerate(r["images"]):
                    for k, img in enumerate(page_imgs):
                        out.append((
                            doc_id, i + 1, k, img["width"], img["height"],
                            img["colorspace"], img["filter"],
                            len(img["data"]),
                            hashlib.md5(img["data"].hex().encode()).hexdigest()))
            yield pd.DataFrame(out, columns=[
                "doc_id", "page_number", "image_index", "width", "height",
                "colorspace", "filter", "n_bytes", "pixels_md5"])

    return d.select("doc_id", "text").mapInPandas(
        explode,
        "doc_id long, page_number long, image_index long, width long, "
        "height long, colorspace string, filter string, n_bytes long, "
        "pixels_md5 string")


SQL_PDF_IMAGES = f"""
WITH src AS (
  SELECT doc_id, substr(text, 1, {MAX_CHARS}) AS s FROM documents
),
n AS (
  SELECT doc_id,
         CASE WHEN length(s) = 0 THEN 1
              ELSE CAST(ceil(length(s) / {PAGE_CHARS}.0) AS INT) END AS np
  FROM src
),
imgs AS (
  SELECT doc_id, CAST(p.i AS BIGINT) AS pg, CAST(k.i AS BIGINT) AS k,
         2 + (doc_id + 7 * p.i + 3 * k.i) % 6 AS w,
         2 + (3 * doc_id + p.i + 5 * k.i) % 5 AS h,
         (doc_id + p.i + k.i) % 2 = 0 AS compressed
  FROM n, unnest(range(np)) p(i),
       unnest(range(1 + (doc_id + p.i) % 2)) k(i)
)
SELECT doc_id,
       pg + 1 AS page_number,
       k AS image_index,
       CAST(w AS BIGINT) AS width,
       CAST(h AS BIGINT) AS height,
       'DeviceRGB' AS colorspace,
       CASE WHEN compressed THEN 'FlateDecode' ELSE 'raw' END AS filter,
       CAST(w * h * 3 AS BIGINT) AS n_bytes,
       md5((SELECT string_agg(printf('%02x', (doc_id + pg + k + b.i) % 256),
                              '' ORDER BY b.i)
            FROM unnest(range(w * h * 3)) b(i))) AS pixels_md5
FROM imgs
"""


QUERIES = {
    "pdf_extract": q_pdf_extract,
    "pdf_pages": q_pdf_pages,
    "pdf_images": q_pdf_images,
}
ORACLES = {
    "pdf_extract": SQL_PDF_EXTRACT,
    "pdf_pages": SQL_PDF_PAGES,
    "pdf_images": SQL_PDF_IMAGES,
}
