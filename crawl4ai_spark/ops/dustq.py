"""DUST rule mining — "Do Not Crawl in the DUST: Different URLs with
Similar Text" (Bar-Yossef, Keidar, Schonfeld; WWW 2007): LEARN which URL
query parameters are content-irrelevant per host from observed payload
digests, instead of hard-coding a global tracking-param blocklist (the
reference's normalize_url, utils.py:2330-2386, strips a FIXED list —
DUST rules are the data-driven host-local generalization a 10^10-URL
frontier needs, since every CMS invents its own session/theme params).

Semantics (exact, oracle-checked): a candidate rule is (host, param).
Every URL carrying ``param`` whose param-stripped form also exists in
the corpus contributes SUPPORT when the two payload digests are equal
and a VIOLATION when they differ; a rule is valid iff violations == 0
and support >= MIN_SUPPORT. ``apply_dust_rules`` then rewrites URLs by
dropping exactly the learned params — never merging two URLs that were
observed with different content (violations invalidate the rule).

Scale shape: variant synthesis is per-row; mining is ONE equi-join on
the stripped-url string (full-URL keys — no skew) plus ONE
(host, param) aggregate with map-side combine. Rule application
broadcasts the tiny per-host rule table. No python, no window, never
cartesian (plan audit).

Synthesis: per document a base URL plus engineered variants —
``sess``/``theme`` params that do NOT change the digest (strippable),
``page`` that always does (must be kept), and ``v`` that changes it on
half the docs (mixed evidence → rule rejected despite support).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from crawl4ai_spark.ops.common import tbl

MIN_SUPPORT = 5
N_DUST_HOSTS = 9


def _variants(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(host, url, param, digest) — base rows carry param=''."""
    d = tbl(spark, sf_dir, "documents").select("doc_id", "text")
    d = (d
         .withColumn("host", F.expr(
             f"concat('h', doc_id % {N_DUST_HOSTS}, '.dust.example')"))
         .withColumn("base", F.expr(
             "concat('https://', host, '/a', doc_id % 5, '/d', doc_id)"))
         .withColumn("dig0", F.expr("md5(text)")))
    base = d.select("host", F.col("base").alias("url"),
                    F.lit("").alias("param"), F.col("dig0").alias("digest"))
    sess = d.select(
        "host",
        F.expr("concat(base, '?sess=s', doc_id % 13)").alias("url"),
        F.lit("sess").alias("param"), F.col("dig0").alias("digest"))
    theme = (d.filter(F.expr("doc_id % 3 = 0")).select(
        "host", F.expr("concat(base, '?theme=dark')").alias("url"),
        F.lit("theme").alias("param"), F.col("dig0").alias("digest")))
    page = (d.filter(F.expr("doc_id % 2 = 0")).select(
        "host", F.expr("concat(base, '?page=2')").alias("url"),
        F.lit("page").alias("param"),
        F.expr("md5(concat(text, 'p2'))").alias("digest")))
    vv = (d.filter(F.expr("doc_id % 5 = 0")).select(
        "host", F.expr("concat(base, '?v=1')").alias("url"),
        F.lit("v").alias("param"),
        F.expr("CASE WHEN doc_id % 2 = 0 THEN md5(concat(text, 'v'))"
               " ELSE md5(text) END").alias("digest")))
    return base.unionByName(sess).unionByName(theme) \
               .unionByName(page).unionByName(vv)


_SQL_VARIANTS = f"""
  WITH d AS (
    SELECT doc_id, text,
           'h' || (doc_id % {N_DUST_HOSTS}) || '.dust.example' AS host,
           'https://h' || (doc_id % {N_DUST_HOSTS})
             || '.dust.example/a' || (doc_id % 5) || '/d' || doc_id AS base,
           md5(text) AS dig0
    FROM documents
  )
  SELECT host, base AS url, '' AS param, dig0 AS digest FROM d
  UNION ALL
  SELECT host, base || '?sess=s' || (doc_id % 13), 'sess', dig0 FROM d
  UNION ALL
  SELECT host, base || '?theme=dark', 'theme', dig0 FROM d
  WHERE doc_id % 3 = 0
  UNION ALL
  SELECT host, base || '?page=2', 'page', md5(text || 'p2') FROM d
  WHERE doc_id % 2 = 0
  UNION ALL
  SELECT host, base || '?v=1', 'v',
         CASE WHEN doc_id % 2 = 0 THEN md5(text || 'v') ELSE md5(text) END
  FROM d WHERE doc_id % 5 = 0
"""


def mine_dust_rules(variants: DataFrame) -> DataFrame:
    """The mining join: candidates (param != '') against base rows keyed
    on the param-stripped url string; one (host, param) aggregate."""
    base = (variants.filter(F.col("param") == "")
            .select(F.col("url").alias("base_url"),
                    F.col("digest").alias("base_digest")))
    cand = (variants.filter(F.col("param") != "")
            .withColumn("base_url", F.expr("substring_index(url, '?', 1)")))
    j = cand.join(base, "base_url", "inner")
    return (j.groupBy("host", "param")
            .agg(F.sum(F.expr(
                     "CAST(digest = base_digest AS INT)")).alias("support"),
                 F.sum(F.expr(
                     "CAST(digest <> base_digest AS INT)")).alias("violations"),
                 F.count(F.lit(1)).alias("n_urls"))
            .withColumn("valid", F.expr(
                f"violations = 0 AND support >= {MIN_SUPPORT}")))


def q_url_dust_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mine per-(host, param) DUST rules from the engineered variant
    corpus: sess/theme come out valid on every host, page is rejected by
    violations alone, v is rejected with mixed evidence (support > 0 AND
    violations > 0 — the case a support-only miner gets wrong)."""
    return mine_dust_rules(_variants(spark, sf_dir))


SQL_URL_DUST_RULES = f"""
WITH v AS ({_SQL_VARIANTS}),
base AS (
  SELECT url AS base_url, digest AS base_digest FROM v WHERE param = ''
),
cand AS (
  SELECT host, param, digest, split_part(url, '?', 1) AS base_url
  FROM v WHERE param <> ''
),
j AS (
  SELECT c.host, c.param, c.digest, b.base_digest
  FROM cand c JOIN base b USING (base_url)
)
SELECT host, param,
       CAST(sum(CASE WHEN digest = base_digest THEN 1 ELSE 0 END) AS BIGINT)
         AS support,
       CAST(sum(CASE WHEN digest <> base_digest THEN 1 ELSE 0 END) AS BIGINT)
         AS violations,
       CAST(count(*) AS BIGINT) AS n_urls,
       (sum(CASE WHEN digest <> base_digest THEN 1 ELSE 0 END) = 0
        AND sum(CASE WHEN digest = base_digest THEN 1 ELSE 0 END)
            >= {MIN_SUPPORT}) AS valid
FROM j GROUP BY host, param
"""


def apply_dust_rules(urls: DataFrame, rules: DataFrame,
                     url_col: str = "url",
                     host_col: str = "host") -> DataFrame:
    """Rewrite URLs by dropping every query param whose key is a VALID
    learned rule for the url's host. The per-host rule sets are tiny
    (≤ #param-names) — collected to a broadcast map join; the rewrite is
    a native array filter, no python. Adds ``url_dust`` (param order
    preserved; '?' dropped when no params survive)."""
    per_host = (rules.filter("valid")
                .groupBy(host_col)
                .agg(F.collect_set("param").alias("__dust_params")))
    out = urls.join(F.broadcast(per_host), host_col, "left")
    return (out
            .withColumn("__q", F.expr(
                f"CASE WHEN instr({url_col}, '?') > 0 THEN"
                f" substring({url_col}, instr({url_col}, '?') + 1)"
                " ELSE '' END"))
            .withColumn("__kept", F.expr(
                "filter(split(__q, '&'), x -> x <> '' AND NOT"
                " array_contains(coalesce(__dust_params, array()),"
                " substring_index(x, '=', 1)))"))
            .withColumn("url_dust", F.expr(
                f"concat(substring_index({url_col}, '?', 1),"
                " CASE WHEN size(__kept) > 0"
                " THEN concat('?', array_join(__kept, '&')) ELSE '' END)"))
            .drop("__q", "__kept", "__dust_params"))


QUERIES = {"url_dust_rules": q_url_dust_rules}
ORACLES = {"url_dust_rules": SQL_URL_DUST_RULES}
