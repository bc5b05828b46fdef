"""Operator suite registry: every implemented query (Spark DataFrame builder)
paired with its DuckDB oracle SQL — the driver's correctness-gate surface."""

from __future__ import annotations

import importlib

_MODULES = [
    "analytics",
    "textstats",
    "dedup",
    "similarity",
    "scheduling",
    "ranking",
    "multimodal",
    "extractq",
    "pdfq",
    "clusterq",
    "pipelineq",
    "headq",
    "crawlq",
]


def registry() -> tuple[dict, dict]:
    """Return (queries, oracles): name → callable(spark, sf_dir) → DataFrame
    and name → DuckDB SQL (absent key = rows-only check)."""
    queries: dict = {}
    oracles: dict = {}
    for m in _MODULES:
        try:
            mod = importlib.import_module(f"crawl4ai_spark.ops.{m}")
        except ImportError:
            continue
        queries.update(getattr(mod, "QUERIES", {}))
        oracles.update(getattr(mod, "ORACLES", {}))
    return queries, oracles
