"""Arrow-batched pandas UDF stages wrapping the pure HTML stack.

The whole per-URL pipeline of the reference (scrape → cleaned_html →
markdown+citations → fit_markdown → structured extraction; see
/root/reference/crawl4ai/async_webcrawler.py:435-663 ``aprocess_html``)
collapses into ONE ``mapInPandas`` stage here: no cross-row dependencies, so
Catalyst pipelines it with the scan and the downstream link explosion.
Per input_hint: vectorized Arrow batches only — no per-row Python UDFs.
"""

from __future__ import annotations

import json
from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import types as T

from crawl4ai_spark.html.content_filter import BM25ContentFilter, PruningContentFilter, fit_markdown
from crawl4ai_spark.html.extraction import extract_json_css_str
from crawl4ai_spark.html.markdown import add_citations, html_to_markdown
from crawl4ai_spark.html.scraper import scrape

_LINK_STRUCT = T.ArrayType(T.StructType([
    T.StructField("href", T.StringType()),
    T.StructField("text", T.StringType()),
    T.StructField("title", T.StringType()),
    T.StructField("base_domain", T.StringType()),
    T.StructField("intrinsic_score", T.DoubleType()),
]))
_MEDIA_STRUCT = T.ArrayType(T.StructType([
    T.StructField("src", T.StringType()),
    T.StructField("alt", T.StringType()),
    T.StructField("desc", T.StringType()),
    T.StructField("score", T.IntegerType()),
    T.StructField("format", T.StringType()),
    T.StructField("width", T.StringType()),
]))

RESULTS_SCHEMA = T.StructType([
    T.StructField("url", T.StringType()),
    T.StructField("status_code", T.IntegerType()),
    T.StructField("success", T.BooleanType()),
    T.StructField("cleaned_html", T.StringType()),
    T.StructField("text", T.StringType()),
    T.StructField("markdown", T.StructType([
        T.StructField("raw_markdown", T.StringType()),
        T.StructField("markdown_with_citations", T.StringType()),
        T.StructField("references_markdown", T.StringType()),
        T.StructField("fit_markdown", T.StringType()),
        T.StructField("fit_html", T.StringType()),
    ])),
    T.StructField("extracted_content", T.StringType()),
    T.StructField("links", T.StructType([
        T.StructField("internal", _LINK_STRUCT),
        T.StructField("external", _LINK_STRUCT),
    ])),
    T.StructField("media", T.StructType([
        T.StructField("images", _MEDIA_STRUCT),
        T.StructField("videos", _MEDIA_STRUCT),
        T.StructField("audios", _MEDIA_STRUCT),
    ])),
    T.StructField("tables", T.ArrayType(T.StructType([
        T.StructField("headers", T.ArrayType(T.StringType())),
        T.StructField("rows", T.ArrayType(T.ArrayType(T.StringType()))),
        T.StructField("caption", T.StringType()),
        T.StructField("summary", T.StringType()),
    ]))),
    T.StructField("metadata", T.MapType(T.StringType(), T.StringType())),
    T.StructField("error_message", T.StringType()),
])


_META_TAG_RE = None


def _meta_robots(html: str) -> tuple[bool, bool]:
    """(noindex, nofollow) from every ``<meta name="robots">`` directive —
    attribute-order agnostic, multiple tags OR'd, directives matched on
    comma/space-separated tokens (REP meta-tag semantics)."""
    import re
    global _META_TAG_RE
    if _META_TAG_RE is None:
        _META_TAG_RE = (
            re.compile(r"<meta\b[^>]*>", re.I),
            re.compile(r"""\bname\s*=\s*["']?([^"'\s>]+)""", re.I),
            re.compile(r"""\bcontent\s*=\s*["']([^"']*)["']""", re.I),
        )
    tag_re, name_re, content_re = _META_TAG_RE
    directives: set[str] = set()
    for m in tag_re.finditer(html or ""):
        tag = m.group(0)
        name = name_re.search(tag)
        if not name or name.group(1).lower() != "robots":
            continue
        content = content_re.search(tag)
        if content:
            directives |= {
                t.strip() for t in content.group(1).lower().replace(",", " ").split()}
    if "none" in directives:          # REP: none == noindex,nofollow
        return True, True
    return "noindex" in directives, "nofollow" in directives


def process_page(url: str, html: str, *, extraction_schema_json: str | None = None,
                 content_filter: str = "pruning", bm25_query: str | None = None,
                 word_count_threshold: int = 1,
                 excluded_tags: list[str] | None = None,
                 cosine_config: dict | None = None,
                 llm_extraction: dict | None = None) -> dict:
    """Pure single-page pipeline — THE golden oracle for byte-identity tests."""
    try:
        s = scrape(url, html, word_count_threshold=word_count_threshold,
                   excluded_tags=excluded_tags)
        raw_md = html_to_markdown(s["cleaned_html"], url)
        cited, refs = add_citations(raw_md, url)
        if content_filter == "bm25":
            filt = BM25ContentFilter(user_query=bm25_query)
        else:
            filt = PruningContentFilter()
        fmd, fhtml = fit_markdown(html, filter_obj=filt, base_url=url)
        if extraction_schema_json:
            extracted = extract_json_css_str(html, extraction_schema_json)
        elif llm_extraction is not None:
            # LLMExtractionStrategy path (ref async_webcrawler.py:613-629):
            # default input_format markdown, RegexChunking sections, then
            # strategy.run(url, sections) — the provider callable travels
            # inside the config dict (cloudpickled into the Arrow workers)
            from crawl4ai_spark.html.chunking import regex_chunk
            from crawl4ai_spark.html.llm_strategies import LLMExtractionStrategy
            lc = dict(llm_extraction)
            patterns = lc.pop("chunk_patterns", None)
            provider = lc.pop("provider", None)
            strat = LLMExtractionStrategy(provider, **lc)
            extracted = json.dumps(strat.run(url, regex_chunk(raw_md, patterns)))
        elif cosine_config is not None:
            # CosineStrategy path (ref async_webcrawler.py:613-629): default
            # input_format is markdown, chunked by RegexChunking (default
            # '\n\n'; override via the 'chunk_patterns' key, the analog of
            # passing RegexChunking(patterns=...)), then strategy.run(...)
            from crawl4ai_spark.html.chunking import regex_chunk
            from crawl4ai_spark.html.cosine_extract import CosineClusterExtraction
            cc = dict(cosine_config)
            patterns = cc.pop("chunk_patterns", None)
            strat = CosineClusterExtraction(**cc)
            extracted = json.dumps(strat.run(url, regex_chunk(raw_md, patterns)))
        else:
            extracted = None
        return {
            "url": url,
            "status_code": 200,
            "success": True,
            "cleaned_html": s["cleaned_html"],
            "text": s["text"],
            "markdown": {
                "raw_markdown": raw_md,
                "markdown_with_citations": cited,
                "references_markdown": refs,
                "fit_markdown": fmd,
                "fit_html": fhtml,
            },
            "extracted_content": extracted,
            "links": s["links"],
            "media": s["media"],
            "tables": s["tables"],
            "metadata": s["metadata"],
            "error_message": None,
        }
    except Exception as e:  # one bad page must not kill the Arrow batch
        return {
            "url": url, "status_code": 500, "success": False,
            "cleaned_html": "", "text": "",
            "markdown": {"raw_markdown": "", "markdown_with_citations": "",
                         "references_markdown": "", "fit_markdown": "", "fit_html": ""},
            "extracted_content": None,
            "links": {"internal": [], "external": []},
            "media": {"images": [], "videos": [], "audios": []},
            "tables": [], "metadata": {},
            "error_message": f"{type(e).__name__}: {e}",
        }


def process_pages(pages: DataFrame, *, extraction_schema: dict | str | None = None,
                  content_filter: str = "pruning", bm25_query: str | None = None,
                  word_count_threshold: int = 1,
                  excluded_tags: list[str] | None = None,
                  cosine_config: dict | None = None,
                  llm_extraction: dict | None = None,
                  with_validator: bool = False,
                  with_meta_robots: bool = False) -> DataFrame:
    """pages(url, html binary, ...) → results (RESULTS_SCHEMA), one Arrow stage.

    ``with_validator`` appends a ``content_md5`` column — the hex md5 of the
    RAW fetched bytes (before encoding sanitation), the strong validator an
    HTTP cache pairs with If-None-Match. Hashed here, inside the Arrow pass
    where the bytes already sit in memory, so storing validators costs no
    extra scan; it matches ``F.md5(html)`` exactly (utf-8 for str columns),
    which is what the engine's revalidation gate computes JVM-side.

    ``with_meta_robots`` appends ``noindex``/``nofollow`` booleans parsed
    from the page's ``<meta name="robots">`` directives (attribute order
    agnostic, multiple tags OR'd) — the REP content gates the engine's
    ``respect_meta_robots`` config consumes. Kept OUT of the metadata map
    so the E2 extraction stays byte-identical to its reference goldens."""
    schema_json = (
        json.dumps(extraction_schema) if isinstance(extraction_schema, dict)
        else extraction_schema
    )
    out_schema = RESULTS_SCHEMA
    extra_fields = []
    if with_validator:
        extra_fields.append(T.StructField("content_md5", T.StringType()))
    if with_meta_robots:
        extra_fields += [T.StructField("noindex", T.BooleanType()),
                         T.StructField("nofollow", T.BooleanType())]
    if extra_fields:
        out_schema = T.StructType(list(RESULTS_SCHEMA.fields) + extra_fields)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib as _hl
        for pdf in batches:
            if len(pdf) == 0:
                continue
            rows = []
            for url, html in zip(pdf["url"], pdf["html"]):
                # boundary sanitation matches the reference's
                # sanitize_input_encode (ref utils.py:777-794): utf-8 with
                # invalid sequences DROPPED, not replaced
                if html is None:
                    h = ""
                elif isinstance(html, (bytes, bytearray)):
                    h = bytes(html).decode("utf-8", errors="ignore")
                else:
                    h = str(html).encode("utf-8", errors="ignore").decode("utf-8")
                row = process_page(
                    url, h, extraction_schema_json=schema_json,
                    content_filter=content_filter, bm25_query=bm25_query,
                    word_count_threshold=word_count_threshold,
                    excluded_tags=excluded_tags,
                    cosine_config=cosine_config,
                    llm_extraction=llm_extraction,
                )
                if with_validator:
                    raw = (b"" if html is None
                           else bytes(html) if isinstance(html, (bytes, bytearray))
                           else str(html).encode("utf-8", "surrogatepass"))
                    row["content_md5"] = _hl.md5(raw).hexdigest()
                if with_meta_robots:
                    row["noindex"], row["nofollow"] = _meta_robots(h)
                rows.append(row)
            yield pd.DataFrame(rows)

    return pages.select("url", "html").mapInPandas(run, out_schema)
