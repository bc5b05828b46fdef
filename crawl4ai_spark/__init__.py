"""crawl4ai_spark — a PySpark-native crawl-and-extract analytics engine.

A from-scratch rebuild of the *capabilities* of the reference engine
(babybirdprd/crawl4ai, studied read-only at /root/reference) on idiomatic
Spark primitives:

- the input is a Common-Crawl-style ``pages`` table
  ``(url string, warc_ts timestamp, html binary, text string, lang string)``;
- the URL frontier, URL-seen set, per-host politeness state, robots rules and
  crawl results are snapshot-versioned tables (Iceberg-style atomic snapshot
  commits over parquet — see :mod:`crawl4ai_spark.sources.snapshots`);
- all per-row HTML work (scrape → cleaned_html → markdown → structured
  extraction) runs inside Arrow-batched pandas UDFs built on a pure-Python,
  dependency-free HTML stack (:mod:`crawl4ai_spark.html`) so the Spark output
  is byte-identical to the single-process oracle pipeline;
- scheduling (priority queue, per-host politeness quota, robots gate, retry)
  is expressed as window functions + broadcast joins so Catalyst/AQE own the
  physical plan.

Nothing here is a port of the reference's asyncio architecture; citations in
docstrings (``file:line`` under /root/reference) mark semantic parity points
only.
"""

__version__ = "0.1.0"


def get_spark(*args, **kwargs):
    from crawl4ai_spark.session import get_spark as _g

    return _g(*args, **kwargs)
