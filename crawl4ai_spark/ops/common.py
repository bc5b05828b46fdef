"""Shared helpers for the queries()/oracle_sql() operator suite.

Parity discipline (Spark DataFrame ⟷ DuckDB ANSI SQL):

- Every float-valued output column is quantized to integer micro-units
  (``*_e6`` = ``CAST(ROUND(x * 1e6) AS BIGINT)``) in BOTH engines, so the
  driver's order-insensitive value hash can never diverge on a last-ULP
  rounding difference. Both engines round positive doubles half-away-from-zero.
- Hash-derived pseudo-randomness uses ``md5`` hex (lowercase in both) and the
  hex-digit → int mapping ``instr('0123456789abcdef', c) - 1`` which exists
  with identical semantics in Spark SQL and DuckDB.
- Tokenization is ``regexp_extract_all(lower(text), '[a-z0-9]+')`` in both.
- Counts/sums are cast to BIGINT explicitly (DuckDB sum() yields HUGEINT).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def tbl(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def e6(col):
    """Quantize a double column to integer micro-units (see module doc)."""
    return F.round(col * F.lit(1e6)).cast("long")


E6_SQL = "CAST(ROUND(({x}) * 1e6) AS BIGINT)"

# token list, identical both engines
TOKENS_SPARK = "regexp_extract_all(lower({x}), '[a-z0-9]+', 0)"
TOKENS_DUCK = "regexp_extract_all(lower({x}), '[a-z0-9]+')"

# hex char -> 0..15, identical both engines
HEXVAL = "(instr('0123456789abcdef', {c}) - 1)"
