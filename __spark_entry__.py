"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship frontier-scheduling query at sf0.001;
``queries()`` exposes every implemented operator from SURVEY.md §2 plus the
training-data-pipeline suite (dedup / similarity / text-analysis /
multimodal); ``oracle_sql()`` gives the DuckDB-equivalent SQL for each
(rows-only entries — the end-to-end crawl loop, the byte-identity extraction
stage, and the multimodal decode stub — are intentionally absent there; their
oracles are the pytest parity suites).

Parity discipline (see crawl4ai_spark/ops/common.py): float outputs are
quantized per row to ``*_e6`` BIGINT before any aggregation so value hashes
cannot diverge on summation order; hashes are md5 hex; hex→int goes through
``instr('0123456789abcdef', c) - 1`` in both engines.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from crawl4ai_spark.ops import registry

_QUERIES, _ORACLES = registry()


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: one frontier scheduling generation (canonicalize → dedup →
    per-host politeness quota → global priority budget) at sf0.001."""
    return _QUERIES["frontier_schedule"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(_QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(_ORACLES)
