"""Pure-Python, dependency-free, deterministic HTML stack.

The reference engine leans on lxml/BeautifulSoup/html2text; none of those are
available in this environment, so this package implements the same
*capabilities* from scratch on stdlib ``html.parser``:

- :mod:`dom`            — tolerant HTML → DOM tree + CSS-lite selectors
- :mod:`scraper`        — clean + harvest (links/media/metadata/tables)
- :mod:`markdown`       — HTML → markdown + citation references
- :mod:`content_filter` — Pruning + BM25 relevance filters (fit_markdown)
- :mod:`extraction`     — JSON-CSS schema extraction + regex catalog
- :mod:`chunking`       — chunking strategies

Everything is pure + deterministic: running the pipeline single-process
produces the golden oracle, and the Spark pandas-UDF pipeline must reproduce
it byte-identically (the per-row invariant from BASELINE.json input_hint).
"""

from crawl4ai_spark.html.dom import parse_html, Node  # noqa: F401
