"""Oracled aggregate for the adaptive EMBEDDING strategy (F19, reference
adaptive_crawler.py:617-995 strategy="embedding", dispatch :1296-1298).

``adaptive_embedding_confidence`` treats the ``embeddings`` table as the
crawl knowledge base and the deterministic query-variation set (the same
train split ``EmbeddingAdaptiveCrawler.digest`` builds) as the semantic
query space: per train query it reports the best cosine similarity over
the KB, the coverage gap (min cosine distance), whether the query point is
covered at the reference's default ``embedding_coverage_radius`` 0.2, and
the corpus-level confidence (mean best similarity, ref :983-985) — every
number e6-quantized with the suite's ROUND discipline so the DuckDB oracle
is exact.

This is the oracle-parity (posexplode) form; the production Arrow fold is
``crawl4ai_spark.adaptive_embedding.best_sim_per_query`` and
tests/test_adaptive_embedding.py asserts the two agree bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from crawl4ai_spark.ops.common import tbl

DIM = 64
ADAPT_QUERY = "web crawl data quality"
COVERAGE_RADIUS_E6 = 200_000     # ref embedding_coverage_radius = 0.2


def _train_queries() -> list[str]:
    from crawl4ai_spark.adaptive_embedding import (
        default_query_variations, split_queries)

    n_total = int(10 * 1.3)      # ref n_query_variations=10, :706 ×1.3
    train, _val = split_queries(
        ADAPT_QUERY, default_query_variations(ADAPT_QUERY, n_total))
    return train


def _query_matrix() -> list[list[float]]:
    from crawl4ai_spark.adaptive_embedding import embed_texts

    return [[float(v) for v in row]
            for row in embed_texts(_train_queries(), DIM)]


def q_adaptive_embedding_confidence(spark: SparkSession, sf_dir: str
                                    ) -> DataFrame:
    """Per-train-query best-cosine coverage over the embeddings KB + the
    mean-best confidence (exploded oracle-parity form; the Arrow fold in
    adaptive_embedding.best_sim_per_query is the production path)."""
    emb = tbl(spark, sf_dir, "embeddings")
    qm = _query_matrix()
    qrows = [(qid, pos, x) for qid, row in enumerate(qm)
             for pos, x in enumerate(row)]
    q = spark.createDataFrame(qrows, "qid int, pos int, qx double")
    el = emb.select(
        "vec_id", F.posexplode("embedding").alias("pos", "x")
    ).withColumn("x", F.col("x").cast("double"))
    en = el.groupBy("vec_id").agg(
        F.sqrt(F.sum(F.col("x") * F.col("x"))).alias("knrm"))
    qn = q.groupBy("qid").agg(
        F.sqrt(F.sum(F.col("qx") * F.col("qx"))).alias("qnrm"))
    dots = (
        el.join(F.broadcast(q), "pos")
        .groupBy("qid", "vec_id")
        .agg(F.sum(F.col("x") * F.col("qx")).alias("dot"))
    )
    cos = (
        dots.join(en, "vec_id").join(F.broadcast(qn), "qid")
        .withColumn("cos_e6", F.round(
            F.col("dot") / (F.col("qnrm") * F.col("knrm")) * 1e6
        ).cast("long"))
    )
    best = cos.groupBy("qid").agg(F.max("cos_e6").alias("best_cos_e6"))
    from pyspark.sql.window import Window

    wall = Window.partitionBy()
    return (
        best
        .withColumn("gap_e6", (F.lit(1_000_000) - F.col("best_cos_e6")))
        .withColumn("covered",
                    F.col("gap_e6") <= F.lit(COVERAGE_RADIUS_E6))
        .withColumn("confidence_e6",
                    F.round(F.avg("best_cos_e6").over(wall)).cast("long"))
        .select(F.col("qid").cast("long"), "best_cos_e6", "gap_e6",
                "covered", "confidence_e6")
    )


def _sql_query_values() -> str:
    return ", ".join(
        f"({qid}, {pos}, {x!r})"
        for qid, row in enumerate(_query_matrix())
        for pos, x in enumerate(row))


def sql_adaptive_embedding_confidence() -> str:
    return f"""
WITH q(qid, pos, qx) AS (VALUES {_sql_query_values()}),
el AS (
  SELECT vec_id, CAST(i AS INT) AS pos,
         CAST(embedding[CAST(i + 1 AS INT)] AS DOUBLE) AS x
  FROM embeddings, range({DIM}) r(i)
),
en AS (SELECT vec_id, sqrt(sum(x * x)) AS knrm FROM el GROUP BY vec_id),
qn AS (SELECT qid, sqrt(sum(qx * qx)) AS qnrm FROM q GROUP BY qid),
dots AS (
  SELECT q.qid, el.vec_id, sum(el.x * q.qx) AS dot
  FROM el JOIN q ON el.pos = q.pos
  GROUP BY q.qid, el.vec_id
),
best AS (
  SELECT d.qid,
         max(CAST(ROUND(d.dot / (qn.qnrm * en.knrm) * 1e6) AS BIGINT))
           AS best_cos_e6
  FROM dots d JOIN en ON d.vec_id = en.vec_id JOIN qn ON d.qid = qn.qid
  GROUP BY d.qid
)
SELECT CAST(qid AS BIGINT) AS qid,
       best_cos_e6,
       1000000 - best_cos_e6 AS gap_e6,
       (1000000 - best_cos_e6) <= {COVERAGE_RADIUS_E6} AS covered,
       CAST(ROUND(AVG(best_cos_e6) OVER ()) AS BIGINT) AS confidence_e6
FROM best
"""


QUERIES = {
    "adaptive_embedding_confidence": q_adaptive_embedding_confidence,
}


def _oracles() -> dict:
    return {
        "adaptive_embedding_confidence": sql_adaptive_embedding_confidence(),
    }


ORACLES = _oracles()
