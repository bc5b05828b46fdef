"""Corpus-level ranking operators: BM25 (ref seed ranking,
async_url_seeder.py:645-677 BM25Okapi, and BM25ContentFilter
content_filter_strategy.py:381-530) and the adaptive-crawler coverage
aggregate (adaptive_crawler.py:330-369) — global document-frequency
statistics as two-pass DataFrame aggregation, no per-row Python.

Scale notes: df/avgdl are one map-side-combinable aggregation each; the
scoring join broadcasts the (tiny) per-term idf table against the tf table,
so the only full shuffle is the explode→groupBy(doc, term) tf pass.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from crawl4ai_spark.ops.common import e6, tbl

QUERY_TERMS = ["spark", "join", "filter"]
K1 = 1.2
B = 0.75


def _toks(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = tbl(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.explode(F.regexp_extract_all(F.lower("text"), F.lit("[a-z0-9]+"), F.lit(0))).alias("tok"),
    )


_SQL_TOKS = """
  SELECT doc_id, t.tok FROM documents,
         unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS t(tok)
"""


def q_bm25_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25-Okapi top-20 docs for the fixed query 'spark join filter'."""
    toks = _toks(spark, sf_dir).cache()
    terms = spark.createDataFrame([(t,) for t in QUERY_TERMS], ["term"])
    n_docs = tbl(spark, sf_dir, "documents").count()
    dl = toks.groupBy("doc_id").agg(F.count("*").alias("dl"))
    avgdl = dl.agg(F.avg("dl").alias("avgdl"))
    tf = (
        toks.join(F.broadcast(terms), toks.tok == terms.term)
        .groupBy("doc_id", "term")
        .agg(F.count("*").alias("tf"))
    )
    df_ = tf.groupBy("term").agg(F.countDistinct("doc_id").alias("df"))
    idf = df_.withColumn(
        "idf", F.log((F.lit(float(n_docs)) - F.col("df") + 0.5) / (F.col("df") + 0.5) + 1.0)
    )
    scored = (
        tf.join(F.broadcast(idf), "term")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(avgdl))
        .withColumn(
            "part",
            F.col("idf") * (F.col("tf") * (K1 + 1))
            / (F.col("tf") + K1 * (1 - B + B * F.col("dl") / F.col("avgdl"))),
        )
        .groupBy("doc_id")
        # per-term parts quantized before the cross-term sum (determinism)
        .agg(F.sum(e6(F.col("part"))).cast("long").alias("score_e6"))
    )
    top = scored.orderBy(F.desc("score_e6"), F.asc("doc_id")).limit(20)
    w = Window.orderBy(F.desc("score_e6"), F.asc("doc_id"))
    return (
        top.withColumn("rk", F.row_number().over(w).cast("long"))
        .select(F.col("doc_id").cast("long"), "score_e6", "rk")
    )


_TERMS_SQL = ", ".join(f"('{t}')" for t in QUERY_TERMS)

SQL_BM25_RANK = f"""
WITH toks AS ({_SQL_TOKS}),
terms(term) AS (VALUES {_TERMS_SQL}),
dl AS (SELECT doc_id, count(*) AS dl FROM toks GROUP BY doc_id),
stats AS (SELECT avg(dl) AS avgdl FROM dl),
nd AS (SELECT CAST(count(*) AS DOUBLE) AS n_docs FROM documents),
tf AS (
  SELECT doc_id, term, count(*) AS tf
  FROM toks JOIN terms ON toks.tok = terms.term GROUP BY doc_id, term
),
idf AS (
  SELECT term, ln((nd.n_docs - df + 0.5) / (df + 0.5) + 1.0) AS idf
  FROM (SELECT term, count(DISTINCT doc_id) AS df FROM tf GROUP BY term), nd
),
scored AS (
  SELECT tf.doc_id,
         CAST(sum(CAST(ROUND(idf.idf * (tf.tf * ({K1} + 1))
              / (tf.tf + {K1} * (1 - {B} + {B} * dl.dl / stats.avgdl)) * 1e6) AS BIGINT)) AS BIGINT) AS score_e6
  FROM tf JOIN idf ON tf.term = idf.term JOIN dl ON tf.doc_id = dl.doc_id, stats
  GROUP BY tf.doc_id
)
SELECT CAST(doc_id AS BIGINT) AS doc_id, score_e6, rk FROM (
  SELECT *, CAST(row_number() OVER (ORDER BY score_e6 DESC, doc_id ASC) AS BIGINT) AS rk
  FROM scored
) WHERE rk <= 20
"""


def q_adaptive_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Adaptive-crawler coverage metric per query term (simplified from ref
    adaptive_crawler.py:330-369: df-weighted term presence with a saturating
    tf factor): term_score = (df/N) * least(1, ln(1+tf_total)/ln(1+N))."""
    toks = _toks(spark, sf_dir)
    terms = spark.createDataFrame([(t,) for t in QUERY_TERMS], ["term"])
    n_docs = tbl(spark, sf_dir, "documents").count()
    agg = (
        toks.join(F.broadcast(terms), toks.tok == terms.term)
        .groupBy("term")
        .agg(F.countDistinct("doc_id").cast("long").alias("df"),
             F.count("*").cast("long").alias("tf_total"))
    )
    score = (F.col("df") / F.lit(float(n_docs))) * F.least(
        F.lit(1.0), F.log(F.col("tf_total") + 1.0) / F.log(F.lit(float(n_docs)) + 1.0)
    )
    return agg.select("term", "df", "tf_total", e6(score).alias("term_score_e6"))


SQL_ADAPTIVE_COVERAGE = f"""
WITH toks AS ({_SQL_TOKS}),
terms(term) AS (VALUES {_TERMS_SQL}),
nd AS (SELECT CAST(count(*) AS DOUBLE) AS n_docs FROM documents),
agg AS (
  SELECT term, CAST(count(DISTINCT doc_id) AS BIGINT) AS df,
         CAST(count(*) AS BIGINT) AS tf_total
  FROM toks JOIN terms ON toks.tok = terms.term GROUP BY term
)
SELECT term, df, tf_total,
       CAST(ROUND((df / nd.n_docs) * least(1.0, ln(tf_total + 1.0) / ln(nd.n_docs + 1.0)) * 1e6) AS BIGINT) AS term_score_e6
FROM agg, nd
"""


N_CONSISTENCY_DOCS = 20


def q_adaptive_consistency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Adaptive-crawler consistency metric (ref adaptive_crawler.py:371-396:
    mean pairwise Jaccard of document term SETS) over a deterministic
    sample (lowest doc_ids). Pairs meet on a shared-token join — never a
    cross join — exactly the near-dup scale shape."""
    sample = (
        _toks(spark, sf_dir)
        .filter(F.col("doc_id") < N_CONSISTENCY_DOCS)
        .distinct()
    )
    sizes = sample.groupBy("doc_id").agg(F.count("*").alias("sz"))
    a = sample.alias("a")
    b = sample.alias("b")
    inter = (
        a.join(b, (F.col("a.tok") == F.col("b.tok"))
               & (F.col("a.doc_id") < F.col("b.doc_id")))
        .groupBy(F.col("a.doc_id").alias("d1"), F.col("b.doc_id").alias("d2"))
        .agg(F.count("*").alias("ni"))
    )
    jac = (
        inter.join(sizes.select(F.col("doc_id").alias("d1"), F.col("sz").alias("s1")), "d1")
        .join(sizes.select(F.col("doc_id").alias("d2"), F.col("sz").alias("s2")), "d2")
        .select(e6(F.col("ni") / (F.col("s1") + F.col("s2") - F.col("ni"))).alias("j_e6"))
    )
    # quantize per pair first (e6 ints), THEN average — engine-order-proof
    return jac.agg(
        F.count("*").cast("long").alias("n_pairs"),
        F.floor(F.avg("j_e6")).cast("long").alias("mean_jaccard_e6"),
    )


SQL_ADAPTIVE_CONSISTENCY = f"""
WITH toks AS (SELECT DISTINCT doc_id, tok FROM ({_SQL_TOKS}) WHERE doc_id < {N_CONSISTENCY_DOCS}),
sizes AS (SELECT doc_id, count(*) AS sz FROM toks GROUP BY doc_id),
inter AS (
  SELECT a.doc_id AS d1, b.doc_id AS d2, count(*) AS ni
  FROM toks a JOIN toks b ON a.tok = b.tok AND a.doc_id < b.doc_id
  GROUP BY 1, 2
),
jac AS (
  SELECT CAST(ROUND(CAST(i.ni AS DOUBLE) / (s1.sz + s2.sz - i.ni) * 1e6) AS BIGINT) AS j_e6
  FROM inter i JOIN sizes s1 ON i.d1 = s1.doc_id JOIN sizes s2 ON i.d2 = s2.doc_id
)
SELECT CAST(count(*) AS BIGINT) AS n_pairs,
       CAST(floor(avg(j_e6)) AS BIGINT) AS mean_jaccard_e6
FROM jac
"""


# --------------------------------------------------------------- BM25F
# Field-weighted BM25 (Robertson & Zaragoza, "Simple BM25 extension to
# multiple weighted fields", CIKM 2004): web ranking scores a page's BODY
# and its aggregated inbound ANCHOR TEXT as separate fields — anchor
# evidence is what lets a page rank for terms it never contains. Per
# field: length-normalize tf, then the WEIGHTED SUM saturates once
#     tf~(t,d) = sum_f w_f * tf_f / (1 + b_f * (dl_f/avgdl_f - 1))
#     score    = sum_t idf_t * tf~ / (K1 + tf~)
# (normalize-then-combine-then-saturate — the order is the paper's point;
# saturating per field first would double-count strong fields).
# Anchors are synthesized with the WAT outlink convention (warcq.py):
# doc s links to (s*7 + 13k + 1) % 997 for k<3, anchor text = s's first
# 3 tokens; only edges to existing docs count. idf comes from the body
# field. avgdl_anchor averages over ALL docs (zero-filled) so both
# engines agree without an existence subquery.
# Scale shape: two tf aggregates (partial), a full-outer (doc,term)
# merge so anchor-only matches score, scalars on 1-row broadcasts, one
# TakeOrdered top-k — never a global window over the corpus.

W_BODY = 1.0
W_ANCHOR = 2.0
B_BODY = 0.75
B_ANCHOR = 0.5
N_ANCHOR_SPACE = 997


def q_bm25f_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = tbl(spark, sf_dir, "documents")
    toks = _toks(spark, sf_dir)
    terms = spark.createDataFrame([(t,) for t in QUERY_TERMS], ["term"])
    n_docs = d.count()

    # body field
    dl_b = toks.groupBy("doc_id").agg(F.count("*").alias("dl_b"))
    avg_b = dl_b.agg(F.avg("dl_b").alias("avgdl_b"))
    tf_b = (toks.join(F.broadcast(terms), toks.tok == terms.term)
            .groupBy("doc_id", "term").agg(F.count("*").alias("tf_b")))

    # anchor field: inbound edges carry the source's first 3 tokens
    anchors = (
        d.select("doc_id", F.expr(
            "slice(regexp_extract_all(lower(text), '[a-z0-9]+', 0),"
            " 1, 3)").alias("atoks"))
        .select("doc_id", "atoks",
                F.explode(F.expr("sequence(0, 2)")).alias("k"))
        .select(F.expr(f"(doc_id * 7 + 13 * k + 1) % {N_ANCHOR_SPACE}")
                .alias("target"), "atoks")
        .join(d.select(F.col("doc_id").alias("target")), "target")
        .select("target", F.explode("atoks").alias("tok")))
    dl_a = anchors.groupBy("target").agg(F.count("*").alias("dl_a"))
    tot_a = anchors.agg(
        (F.count("*") / F.lit(float(n_docs))).alias("avgdl_a"))
    tf_a = (anchors.join(F.broadcast(terms), anchors.tok == terms.term)
            .groupBy("target", "term").agg(F.count("*").alias("tf_a"))
            .withColumnRenamed("target", "doc_id"))

    # idf from the body field
    df_ = tf_b.groupBy("term").agg(F.countDistinct("doc_id").alias("df"))
    idf = df_.withColumn(
        "idf", F.log((F.lit(float(n_docs)) - F.col("df") + 0.5)
                     / (F.col("df") + 0.5) + 1.0))

    merged = (
        tf_b.join(tf_a, ["doc_id", "term"], "full_outer")
        .join(dl_b, "doc_id", "left").join(dl_a.withColumnRenamed(
            "target", "doc_id"), "doc_id", "left")
        .crossJoin(F.broadcast(avg_b)).crossJoin(F.broadcast(tot_a))
        .withColumn("tft", F.expr(
            f"{W_BODY} * coalesce(tf_b, 0)"
            f" / (1 + {B_BODY} * (coalesce(dl_b, 0) / avgdl_b - 1))"
            f" + {W_ANCHOR} * coalesce(tf_a, 0)"
            f" / (1 + {B_ANCHOR} * (coalesce(dl_a, 0) / avgdl_a - 1))"))
        .join(F.broadcast(idf), "term")
        .withColumn("part", F.expr(f"idf * tft / ({K1} + tft)"))
        .groupBy("doc_id")
        .agg(F.sum(e6(F.col("part"))).cast("long").alias("score_e6"),
             F.max(F.expr("CAST(tf_a IS NOT NULL AS INT)"))
             .cast("long").alias("has_anchor_hit")))
    top = merged.orderBy(F.desc("score_e6"), F.asc("doc_id")).limit(20)
    w = Window.orderBy(F.desc("score_e6"), F.asc("doc_id"))
    return (top.withColumn("rk", F.row_number().over(w).cast("long"))
            .select(F.col("doc_id").cast("long"), "score_e6",
                    "has_anchor_hit", "rk"))


SQL_BM25F_RANK = f"""
WITH toks AS ({_SQL_TOKS}),
terms(term) AS (VALUES {_TERMS_SQL}),
nd AS (SELECT CAST(count(*) AS DOUBLE) AS n_docs FROM documents),
dl_b AS (SELECT doc_id, count(*) AS dl_b FROM toks GROUP BY doc_id),
avg_b AS (SELECT avg(dl_b) AS avgdl_b FROM dl_b),
tf_b AS (
  SELECT doc_id, term, count(*) AS tf_b
  FROM toks JOIN terms ON toks.tok = terms.term GROUP BY doc_id, term
),
edges AS (
  SELECT (s.doc_id * 7 + 13 * k.k + 1) % {N_ANCHOR_SPACE} AS target,
         list_slice(regexp_extract_all(lower(s.text), '[a-z0-9]+'), 1, 3)
           AS atoks
  FROM documents s, unnest([0, 1, 2]) AS k(k)
),
anchors AS (
  SELECT e.target, t.tok
  FROM edges e
  JOIN documents dd ON dd.doc_id = e.target,
       unnest(e.atoks) AS t(tok)
),
dl_a AS (SELECT target, count(*) AS dl_a FROM anchors GROUP BY target),
tot_a AS (
  SELECT CAST(count(*) AS DOUBLE) / nd.n_docs AS avgdl_a
  FROM anchors, nd GROUP BY nd.n_docs
),
tf_a AS (
  SELECT target AS doc_id, term, count(*) AS tf_a
  FROM anchors JOIN terms ON anchors.tok = terms.term
  GROUP BY target, term
),
idf AS (
  SELECT term, ln((nd.n_docs - df + 0.5) / (df + 0.5) + 1.0) AS idf
  FROM (SELECT term, count(DISTINCT doc_id) AS df FROM tf_b
        GROUP BY term), nd
),
m AS (
  SELECT COALESCE(tf_b.doc_id, tf_a.doc_id) AS doc_id,
         COALESCE(tf_b.term, tf_a.term) AS term,
         tf_b.tf_b, tf_a.tf_a
  FROM tf_b FULL OUTER JOIN tf_a
    ON tf_b.doc_id = tf_a.doc_id AND tf_b.term = tf_a.term
),
sc AS (
  SELECT m.doc_id, m.term, m.tf_a,
         {W_BODY} * COALESCE(m.tf_b, 0)
           / (1 + {B_BODY} * (COALESCE(dl_b.dl_b, 0) / avg_b.avgdl_b - 1))
         + {W_ANCHOR} * COALESCE(m.tf_a, 0)
           / (1 + {B_ANCHOR} * (COALESCE(dl_a.dl_a, 0) / tot_a.avgdl_a - 1))
           AS tft
  FROM m LEFT JOIN dl_b ON dl_b.doc_id = m.doc_id
         LEFT JOIN dl_a ON dl_a.target = m.doc_id, avg_b, tot_a
),
scored AS (
  SELECT sc.doc_id,
         CAST(sum(CAST(ROUND(idf.idf * sc.tft / ({K1} + sc.tft) * 1e6)
                       AS BIGINT)) AS BIGINT) AS score_e6,
         CAST(max(CASE WHEN sc.tf_a IS NOT NULL THEN 1 ELSE 0 END)
              AS BIGINT) AS has_anchor_hit
  FROM sc JOIN idf ON sc.term = idf.term
  GROUP BY sc.doc_id
)
SELECT CAST(doc_id AS BIGINT) AS doc_id, score_e6, has_anchor_hit, rk
FROM (
  SELECT *, CAST(row_number() OVER (ORDER BY score_e6 DESC, doc_id ASC)
                 AS BIGINT) AS rk
  FROM scored
) WHERE rk <= 20
"""


QUERIES = {
    "bm25_rank": q_bm25_rank,
    "bm25f_rank": q_bm25f_rank,
    "adaptive_consistency": q_adaptive_consistency,
    "adaptive_coverage": q_adaptive_coverage,
}
ORACLES = {
    "bm25_rank": SQL_BM25_RANK,
    "bm25f_rank": SQL_BM25F_RANK,
    "adaptive_coverage": SQL_ADAPTIVE_COVERAGE,
    "adaptive_consistency": SQL_ADAPTIVE_CONSISTENCY,
}
