"""CCNet-style perplexity filtering (Wenzek et al. 2020, "CCNet: Extracting
High Quality Monolingual Datasets from Web Crawl Data") — the classic
webtext pipeline stage the reference's crawl output feeds: score every
document by the perplexity of a language model trained on a high-quality
reference corpus, then split each language into head / middle / tail
perplexity tertiles (CCNet keeps head+middle for LM training).

In-engine LM: CCNet uses a pretrained KenLM 5-gram; real model weights are
out of scope here (the same declared seam as the LLM/embedding providers),
so the trained artifact is an add-one-smoothed word-BIGRAM model fit on the
deterministic reference subset ``doc_id % PPL_REF_MOD == PPL_REF_REM`` (the
"Wikipedia side" stand-in — swap the predicate to plug a real reference
corpus). P(w2|w1) = (c(w1,w2)+1) / (c(w1·)+V).

Exactness scheme (the DSIR discipline, ops/pipelineq.py): ln is
transcendental and libm results differ across engines in the last ulp, so
each bigram's conditional probability is first quantized onto the fixed
integer grid q = (c12+1)*CAP div (c1+V) ∈ [0, CAP] (pure integer ops —
c12 ≤ c1 guarantees q ≤ CAP), and −ln maps through a driver-computed
(CAP+1)-row table of cell-midpoint values inlined identically into both
plans. Per-doc log-perplexity is then an integer mean; tertile assignment
is a deterministic row_number over (ppl, doc_id) — every step bit-equal in
Spark and DuckDB.

Scale shape (100 TB): the LM tables (bigram counts, context counts) are
bounded by the REFERENCE vocabulary, not the corpus — they broadcast onto
one exploded-bigram scan of the corpus (no corpus-byte shuffle); the only
real shuffles are the doc_id re-aggregation and the per-language tertile
window (partitioned by lang, never global). The reference side is a small
fixed fraction, aggregated once.

Reference parity target: crawl4ai has no LM filter (its quality gates are
PruningContentFilter/BM25, html/content_filter.py) — this is part of the
beyond-reference training-data surface the build brief requires.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from crawl4ai_spark.ops.common import tbl

PPL_REF_MOD = 10      # reference ("Wikipedia side") = doc_id % 10 == 1
PPL_REF_REM = 1
PPL_CAP = 2048        # probability quantization grid (q = p * CAP)


def _ppl_neglog_values() -> list[int]:
    """−ln of each grid cell's midpoint probability, quantized to e6 ints:
    q represents p ∈ [q/CAP, (q+1)/CAP) → midpoint (2q+1)/(2(CAP+1))
    (the +1 keeps q=CAP strictly below probability 1, so every entry is
    positive and integer mean/div stays on nonnegative values)."""
    import math

    return [round(-math.log((2 * q + 1) / (2.0 * (PPL_CAP + 1))) * 1e6)
            for q in range(PPL_CAP + 1)]


def _bigrams(spark: SparkSession, sf_dir: str,
             ref_only: bool = False) -> DataFrame:
    d = tbl(spark, sf_dir, "documents")
    if ref_only:
        d = d.filter((F.col("doc_id") % PPL_REF_MOD) == PPL_REF_REM)
    toks = F.expr("regexp_extract_all(lower(text), '[a-z0-9]+', 0)")
    t = (d.select("doc_id", "lang", toks.alias("toks"))
         .filter(F.expr("size(toks) >= 2")))
    return (
        t.select("doc_id", "lang", F.explode(F.expr(
            "transform(sequence(1, size(toks) - 1),"
            " i -> struct(toks[i-1] AS w1, toks[i] AS w2))")).alias("bg"))
        .select("doc_id", "lang", "bg.w1", "bg.w2")
    )


def ppl_lm_tables(spark: SparkSession, sf_dir: str
                  ) -> tuple[DataFrame, DataFrame, DataFrame]:
    """The trained artifact: (bigram counts, context counts, 1-row vocab
    size) over the reference subset — what a deployment would persist and
    broadcast instead of a KenLM binary."""
    ref = _bigrams(spark, sf_dir, ref_only=True)
    c12 = ref.groupBy("w1", "w2").agg(F.count("*").cast("long").alias("c12"))
    c1 = ref.groupBy("w1").agg(F.count("*").cast("long").alias("c1"))
    vrow = (ref.select(F.col("w1").alias("w"))
            .unionAll(ref.select(F.col("w2").alias("w")))
            .agg(F.greatest(F.countDistinct("w"), F.lit(1))
                 .cast("long").alias("v")))
    return c12, c1, vrow


def q_ccnet_perplexity(spark: SparkSession, sf_dir: str) -> DataFrame:
    c12, c1, vrow = ppl_lm_tables(spark, sf_dir)
    lnt = spark.createDataFrame(
        list(enumerate(_ppl_neglog_values())), "q long, neglog_e6 long")
    scored = (
        _bigrams(spark, sf_dir)
        .join(F.broadcast(c12), ["w1", "w2"], "left")
        .join(F.broadcast(c1), ["w1"], "left")
        .crossJoin(F.broadcast(vrow))
        .withColumn("q", F.expr(
            f"((coalesce(c12, 0) + 1) * {PPL_CAP})"
            f" div (coalesce(c1, 0) + v)"))
        .join(F.broadcast(lnt), "q")
        .groupBy("doc_id", "lang")
        .agg(F.count("*").cast("long").alias("n_bigrams"),
             F.sum("neglog_e6").cast("long").alias("sum_neglog_e6"))
        .withColumn("ppl_e6", F.expr(
            "CAST(sum_neglog_e6 div n_bigrams AS BIGINT)"))
    )
    w = Window.partitionBy("lang").orderBy(F.asc("ppl_e6"), F.asc("doc_id"))
    wn = Window.partitionBy("lang")
    return (
        scored
        .withColumn("rk", F.row_number().over(w))
        .withColumn("n_lang", F.count("*").over(wn))
        .withColumn("bucket", F.expr(
            "CASE (rk - 1) * 3 div n_lang WHEN 0 THEN 'head'"
            " WHEN 1 THEN 'middle' ELSE 'tail' END"))
        .select("doc_id", "lang", "n_bigrams", "sum_neglog_e6", "ppl_e6",
                "bucket")
    )


def _sql_ccnet_perplexity() -> str:
    lnvals = ", ".join(f"({q}, {v})"
                       for q, v in enumerate(_ppl_neglog_values()))
    return f"""
WITH lnt(q, neglog_e6) AS (VALUES {lnvals}),
toks AS (
  SELECT doc_id, lang,
         regexp_extract_all(lower(text), '[a-z0-9]+') AS toks
  FROM documents
), bg AS (
  SELECT doc_id, lang,
         toks[CAST(i AS BIGINT) + 1] AS w1,
         toks[CAST(i AS BIGINT) + 2] AS w2
  FROM toks, unnest(range(len(toks) - 1)) p(i)
  WHERE len(toks) >= 2
), ref AS (
  SELECT * FROM bg WHERE doc_id % {PPL_REF_MOD} = {PPL_REF_REM}
), c12 AS (
  SELECT w1, w2, CAST(count(*) AS BIGINT) AS c12 FROM ref GROUP BY w1, w2
), c1 AS (
  SELECT w1, CAST(count(*) AS BIGINT) AS c1 FROM ref GROUP BY w1
), vv AS (
  SELECT GREATEST(count(DISTINCT w), 1) AS v
  FROM (SELECT w1 AS w FROM ref UNION ALL SELECT w2 AS w FROM ref)
), qv AS (
  SELECT bg.doc_id, bg.lang,
         ((COALESCE(c12.c12, 0) + 1) * {PPL_CAP})
           // (COALESCE(c1.c1, 0) + vv.v) AS q
  FROM bg
  LEFT JOIN c12 USING (w1, w2)
  LEFT JOIN c1 USING (w1)
  CROSS JOIN vv
), scored AS (
  SELECT doc_id, lang,
         CAST(count(*) AS BIGINT) AS n_bigrams,
         CAST(sum(neglog_e6) AS BIGINT) AS sum_neglog_e6,
         CAST(sum(neglog_e6) // count(*) AS BIGINT) AS ppl_e6
  FROM qv JOIN lnt USING (q)
  GROUP BY doc_id, lang
)
SELECT doc_id, lang, n_bigrams, sum_neglog_e6, ppl_e6,
       CASE (row_number() OVER (PARTITION BY lang
                                ORDER BY ppl_e6 ASC, doc_id ASC) - 1) * 3
            // (count(*) OVER (PARTITION BY lang))
         WHEN 0 THEN 'head' WHEN 1 THEN 'middle' ELSE 'tail' END AS bucket
FROM scored
"""


# ---------------------------------------------------------------------------
# Hash-bucketed LM variant (Talbot & Osborne 2007-style randomized LM) —
# the STREAMABLE form: word-keyed tables can't inline into a stateless
# stream expression (unbounded vocab), so both LM tables bucket by md5 into
# PPL_B slots. Collisions overcount (the standard randomized-LM trade,
# documented); the batch twin below and streaming/stream.stream_ppl_gate
# compute the identical integers, so stream == batch byte-for-byte.
# ---------------------------------------------------------------------------

PPL_B = 1024

# portable hex-prefix hash (the DSIR _HEX6 trick): first 6 md5 hex chars as
# an integer, same string in Spark and DuckDB
_HEX6 = "".join(
    f"+ CAST(instr('0123456789abcdef', substring({{h}}, {i + 1}, 1)) - 1"
    f" AS BIGINT) * {16 ** (5 - i)}\n" for i in range(6))


def _b12(col: str) -> str:
    return ("(0 " + _HEX6.format(h=f"md5({col})") + f") % {PPL_B}")


def ppl_hashed_lm(spark: SparkSession, sf_dir: str
                  ) -> tuple[list[int], list[int], int]:
    """The calibration artifact the streaming gate inlines: bucketed bigram
    counts, bucketed context counts (dense PPL_B-length lists), and the
    reference vocabulary size."""
    ref = _bigrams(spark, sf_dir, ref_only=True)
    hc12 = (ref.withColumn("b", F.expr(_b12("concat_ws(' ', w1, w2)")))
            .groupBy("b").agg(F.count("*").cast("long").alias("c")))
    hc1 = (ref.withColumn("b", F.expr(_b12("w1")))
           .groupBy("b").agg(F.count("*").cast("long").alias("c")))
    vrow = (ref.select(F.col("w1").alias("w"))
            .unionAll(ref.select(F.col("w2").alias("w")))
            .agg(F.greatest(F.countDistinct("w"), F.lit(1))
                 .cast("long").alias("v")))
    c12 = [0] * PPL_B
    for r in hc12.collect():
        c12[int(r.b)] = int(r.c)
    c1 = [0] * PPL_B
    for r in hc1.collect():
        c1[int(r.b)] = int(r.c)
    return c12, c1, int(vrow.collect()[0].v)


def q_ccnet_perplexity_hashed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch twin of the streaming gate's hashed score (broadcast bucketed
    tables instead of the stream's inlined arrays — identical integers)."""
    ref = _bigrams(spark, sf_dir, ref_only=True)
    hc12 = (ref.withColumn("b12", F.expr(_b12("concat_ws(' ', w1, w2)")))
            .groupBy("b12").agg(F.count("*").cast("long").alias("c12")))
    hc1 = (ref.withColumn("b1", F.expr(_b12("w1")))
           .groupBy("b1").agg(F.count("*").cast("long").alias("c1")))
    vrow = (ref.select(F.col("w1").alias("w"))
            .unionAll(ref.select(F.col("w2").alias("w")))
            .agg(F.greatest(F.countDistinct("w"), F.lit(1))
                 .cast("long").alias("v")))
    lnt = spark.createDataFrame(
        list(enumerate(_ppl_neglog_values())), "q long, neglog_e6 long")
    return (
        _bigrams(spark, sf_dir)
        .withColumn("b12", F.expr(_b12("concat_ws(' ', w1, w2)")))
        .withColumn("b1", F.expr(_b12("w1")))
        .join(F.broadcast(hc12), ["b12"], "left")
        .join(F.broadcast(hc1), ["b1"], "left")
        .crossJoin(F.broadcast(vrow))
        .withColumn("q", F.expr(
            f"((coalesce(c12, 0) + 1) * {PPL_CAP})"
            f" div (coalesce(c1, 0) + v)"))
        .join(F.broadcast(lnt), "q")
        .groupBy("doc_id", "lang")
        .agg(F.count("*").cast("long").alias("n_bigrams"),
             F.sum("neglog_e6").cast("long").alias("sum_neglog_e6"))
        .withColumn("ppl_e6", F.expr(
            "CAST(sum_neglog_e6 div n_bigrams AS BIGINT)"))
        .select("doc_id", "lang", "n_bigrams", "sum_neglog_e6", "ppl_e6")
    )


def _sql_ccnet_perplexity_hashed() -> str:
    lnvals = ", ".join(f"({q}, {v})"
                       for q, v in enumerate(_ppl_neglog_values()))
    return f"""
WITH lnt(q, neglog_e6) AS (VALUES {lnvals}),
toks AS (
  SELECT doc_id, lang,
         regexp_extract_all(lower(text), '[a-z0-9]+') AS toks
  FROM documents
), bg AS (
  SELECT doc_id, lang,
         toks[CAST(i AS BIGINT) + 1] AS w1,
         toks[CAST(i AS BIGINT) + 2] AS w2
  FROM toks, unnest(range(len(toks) - 1)) p(i)
  WHERE len(toks) >= 2
), ref AS (
  SELECT * FROM bg WHERE doc_id % {PPL_REF_MOD} = {PPL_REF_REM}
), hc12 AS (
  SELECT {_b12("w1 || ' ' || w2")} AS b12,
         CAST(count(*) AS BIGINT) AS c12
  FROM ref GROUP BY 1
), hc1 AS (
  SELECT {_b12("w1")} AS b1, CAST(count(*) AS BIGINT) AS c1
  FROM ref GROUP BY 1
), vv AS (
  SELECT GREATEST(count(DISTINCT w), 1) AS v
  FROM (SELECT w1 AS w FROM ref UNION ALL SELECT w2 AS w FROM ref)
), keyed AS (
  SELECT doc_id, lang,
         {_b12("w1 || ' ' || w2")} AS b12,
         {_b12("w1")} AS b1
  FROM bg
), qv AS (
  SELECT keyed.doc_id, keyed.lang,
         ((COALESCE(hc12.c12, 0) + 1) * {PPL_CAP})
           // (COALESCE(hc1.c1, 0) + vv.v) AS q
  FROM keyed
  LEFT JOIN hc12 USING (b12)
  LEFT JOIN hc1 USING (b1)
  CROSS JOIN vv
)
SELECT doc_id, lang,
       CAST(count(*) AS BIGINT) AS n_bigrams,
       CAST(sum(neglog_e6) AS BIGINT) AS sum_neglog_e6,
       CAST(sum(neglog_e6) // count(*) AS BIGINT) AS ppl_e6
FROM qv JOIN lnt USING (q)
GROUP BY doc_id, lang
"""


QUERIES = {
    "ccnet_perplexity": q_ccnet_perplexity,
    "ccnet_perplexity_hashed": q_ccnet_perplexity_hashed,
}
ORACLES = {
    "ccnet_perplexity": _sql_ccnet_perplexity(),
    "ccnet_perplexity_hashed": _sql_ccnet_perplexity_hashed(),
}
