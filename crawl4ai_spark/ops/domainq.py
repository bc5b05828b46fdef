"""Domain-level corpus governance: stats, per-domain caps, domain gate.

Web corpora are dominated by a handful of hosts — C4 and RefinedWeb both
apply URL/host-level rules, and FineWeb caps the contribution of any one
domain so boilerplate-heavy sites can't flood the training mix. Three
stages over the documents table, with the domain derived deterministically
from doc_id in BOTH engines (the synthesize-inside-the-query convention —
the synthetic corpus's `source` column is uniform, so a Zipf-ish head/tail
split is constructed instead: domain 0 holds 25% of the corpus, domains
1-3 ≈8% each, a 149-domain tail shares the rest):

1. **domain_stats** — per-domain doc count, total/mean chars, distinct
   languages. One aggregate whose key space is O(#domains), not O(docs).

2. **domain_cap** (FineWeb-style contribution cap) — keep at most CAP_M
   docs per domain, chosen deterministically as the CAP_M lowest
   ``md5(doc_id)`` hex strings (the repo's tie-free hash-rank convention).
   The naive plan is one row_number window per domain — a single giant
   partition for a heavy-hitter host at 100 TB. Shipped plan is the
   salted two-phase top-M: phase 1 ranks within (domain, salt) buckets
   (≤ NSALT × CAP_M survivors per domain regardless of skew), phase 2
   ranks the survivors per domain. Top-M of the union of per-salt top-Ms
   equals the global top-M, so the result is exact and the oracle stays
   the plain single-window form.

3. **domain_gate** (C4/RefinedWeb-style host rules) — per-doc verdict
   joining the broadcast stats table back onto docs: a domain fails on
   corpus share > SHARE_MAX_PCT (boilerplate flood) or on n_docs <
   MIN_DOCS (unvetted long tail). Stats are O(#domains) rows → broadcast
   join; docs never shuffle.

Scale shape (100 TB): stats is one map-side-combinable aggregate; cap
shuffles doc keys twice but each reduce partition is bounded by
NSALT × CAP_M per domain (the salt kills the heavy-hitter partition);
gate is a broadcast join over per-row expressions.

Reference parity target: crawl4ai has no corpus-level governance (its
per-URL filters live in deep_crawling/filters.py — covered by F10); this
is beyond-reference training-data surface required by the build brief.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from crawl4ai_spark.ops.common import tbl

CAP_M = 8          # max docs a single domain may contribute
NSALT = 4          # phase-1 salt buckets for the two-phase top-M
SHARE_MAX_PCT = 20 # gate: fail domains holding > 20% of the corpus
MIN_DOCS = 3       # gate: fail domains with fewer than 3 docs

# Zipf-ish deterministic domain id (identical text in both engines).
_DOM_SQL = ("CASE WHEN doc_id % 4 = 0 THEN 0 "
            "WHEN doc_id % 4 = 1 THEN 1 + doc_id % 3 "
            "ELSE 4 + doc_id % 149 END")


def _docs_with_domain(spark: SparkSession, sf_dir: str) -> DataFrame:
    return tbl(spark, sf_dir, "documents").select(
        "doc_id", "lang", "n_chars",
        F.expr(f"concat('dom', CAST({_DOM_SQL} AS STRING))").alias("domain"))


def q_domain_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _docs_with_domain(spark, sf_dir)
    return (
        d.groupBy("domain")
        .agg(F.count("*").cast("long").alias("n_docs"),
             F.sum("n_chars").cast("long").alias("total_chars"),
             F.countDistinct("lang").cast("long").alias("n_langs"))
        # exact integer mean: micro-chars via div (both engines truncate)
        .withColumn("mean_chars_e6",
                    F.expr("(total_chars * 1000000) div n_docs")
                    .cast("long"))
        .select("domain", "n_docs", "total_chars", "mean_chars_e6",
                "n_langs")
    )


def q_domain_cap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Docs surviving the per-domain contribution cap, with their rank.
    Salted two-phase top-M — see module docstring for the exactness
    argument. The salt is doc_id % NSALT (deterministic; internal to the
    Spark plan, invisible to the result)."""
    d = (_docs_with_domain(spark, sf_dir)
         .select("doc_id", "domain",
                 F.md5(F.col("doc_id").cast("string")).alias("h"),
                 (F.col("doc_id") % NSALT).alias("salt")))
    w1 = Window.partitionBy("domain", "salt").orderBy("h")
    cand = (d.withColumn("r1", F.row_number().over(w1))
            .filter(F.col("r1") <= CAP_M))
    w2 = Window.partitionBy("domain").orderBy("h")
    return (cand.withColumn("rk", F.row_number().over(w2))
            .filter(F.col("rk") <= CAP_M)
            .select("doc_id", "domain",
                    F.col("rk").cast("long").alias("rk")))


def q_domain_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _docs_with_domain(spark, sf_dir)
    stats = q_domain_stats(spark, sf_dir)
    total = d.agg(F.count("*").cast("long").alias("corpus_docs"))
    rules = (
        F.broadcast(stats).crossJoin(F.broadcast(total))
        .select(
            "domain",
            (F.col("n_docs") * 100 > F.col("corpus_docs") * SHARE_MAX_PCT)
            .alias("fail_share"),
            (F.col("n_docs") < MIN_DOCS).alias("fail_small"))
    )
    return (
        d.join(F.broadcast(rules), "domain")
        .select("doc_id", "domain", "fail_share", "fail_small",
                (~F.col("fail_share") & ~F.col("fail_small")).alias("keep"))
    )


_SQL_DOCS = f"""
docs AS (
  SELECT doc_id, lang, n_chars,
         'dom' || CAST({_DOM_SQL} AS VARCHAR) AS domain
  FROM documents
)"""

_SQL_STATS = """
stats AS (
  SELECT domain, CAST(count(*) AS BIGINT) AS n_docs,
         CAST(sum(n_chars) AS BIGINT) AS total_chars,
         CAST(count(DISTINCT lang) AS BIGINT) AS n_langs
  FROM docs GROUP BY domain
)"""

SQL_DOMAIN_STATS = f"""
WITH {_SQL_DOCS}, {_SQL_STATS}
SELECT domain, n_docs, total_chars,
       CAST((total_chars * 1000000) // n_docs AS BIGINT) AS mean_chars_e6,
       n_langs
FROM stats
"""

SQL_DOMAIN_CAP = f"""
WITH {_SQL_DOCS},
ranked AS (
  SELECT doc_id, domain,
         row_number() OVER (PARTITION BY domain
                            ORDER BY md5(CAST(doc_id AS VARCHAR))) AS rk
  FROM docs
)
SELECT doc_id, domain, CAST(rk AS BIGINT) AS rk
FROM ranked WHERE rk <= {CAP_M}
"""

SQL_DOMAIN_GATE = f"""
WITH {_SQL_DOCS}, {_SQL_STATS},
total AS (SELECT CAST(count(*) AS BIGINT) AS corpus_docs FROM docs),
rules AS (
  SELECT domain,
         (n_docs * 100 > corpus_docs * {SHARE_MAX_PCT}) AS fail_share,
         (n_docs < {MIN_DOCS}) AS fail_small
  FROM stats, total
)
SELECT d.doc_id, d.domain, r.fail_share, r.fail_small,
       (NOT r.fail_share AND NOT r.fail_small) AS keep
FROM docs d JOIN rules r USING (domain)
"""


# ------------------------------------------------------- concentration Gini
# Corpus-concentration report: the Gini coefficient of per-domain doc and
# char counts — the one-number answer to "is this crawl a few mega-hosts
# in a trench coat?" (the FineWeb/C4 domain-cap rules exist precisely
# because raw crawls sit near G ≈ 0.7+). Exact integers: with x_1 <= ...
# <= x_n the sorted per-domain counts,
#     G_e6 = (2*Σ i*x_i - (n+1)*Σ x_i) * 1e6 div (n * Σ x_i)
# Σ i*x_i is invariant to tie order (equal x), so the deterministic
# (count, domain) sort can't diverge cross-engine.
#
# Scale shape: the ranking window runs over the DOMAIN AGGREGATE
# (O(#domains) rows, one partition — fine at 10^8 domains since only two
# BIGINTs per row survive the groupBy), never over documents.
# ---------------------------------------------------------------------------


def q_domain_gini(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-row corpus concentration card: Gini of per-domain doc counts
    and of per-domain char mass, plus the top-domain share (e6)."""
    stats = (_docs_with_domain(spark, sf_dir)
             .groupBy("domain")
             .agg(F.count("*").cast("long").alias("n_docs"),
                  F.sum("n_chars").cast("long").alias("n_chars")))

    def gini(col: str) -> F.Column:
        w = Window.orderBy(F.col(col).asc(), F.col("domain").asc())
        return F.row_number().over(w).alias(f"i_{col}")

    ranked = stats.withColumn("i_docs", gini("n_docs")) \
                  .withColumn("i_chars", gini("n_chars"))
    return ranked.agg(
        F.count("*").cast("long").alias("n_domains"),
        F.sum("n_docs").cast("long").alias("total_docs"),
        F.expr("CAST((2 * sum(i_docs * n_docs)"
               " - (count(*) + 1) * sum(n_docs)) * 1000000"
               " div (count(*) * sum(n_docs)) AS BIGINT)")
        .alias("gini_docs_e6"),
        F.expr("CAST((2 * sum(i_chars * n_chars)"
               " - (count(*) + 1) * sum(n_chars)) * 1000000"
               " div (count(*) * sum(n_chars)) AS BIGINT)")
        .alias("gini_chars_e6"),
        F.expr("CAST(max(n_docs) * 1000000 div sum(n_docs) AS BIGINT)")
        .alias("top_share_e6"))


SQL_DOMAIN_GINI = f"""
WITH {_SQL_DOCS},
stats AS (
  SELECT domain, CAST(count(*) AS BIGINT) AS n_docs,
         CAST(sum(n_chars) AS BIGINT) AS n_chars
  FROM docs GROUP BY domain
),
ranked AS (
  SELECT *,
         row_number() OVER (ORDER BY n_docs ASC, domain ASC) AS i_docs,
         row_number() OVER (ORDER BY n_chars ASC, domain ASC) AS i_chars
  FROM stats
)
SELECT CAST(count(*) AS BIGINT) AS n_domains,
       CAST(sum(n_docs) AS BIGINT) AS total_docs,
       CAST((2 * sum(i_docs * n_docs) - (count(*) + 1) * sum(n_docs))
            * 1000000 // (count(*) * sum(n_docs)) AS BIGINT)
         AS gini_docs_e6,
       CAST((2 * sum(i_chars * n_chars) - (count(*) + 1) * sum(n_chars))
            * 1000000 // (count(*) * sum(n_chars)) AS BIGINT)
         AS gini_chars_e6,
       CAST(max(n_docs) * 1000000 // sum(n_docs) AS BIGINT)
         AS top_share_e6
FROM ranked
"""


QUERIES = {
    "domain_stats": q_domain_stats,
    "domain_cap": q_domain_cap,
    "domain_gate": q_domain_gate,
    "domain_gini": q_domain_gini,
}
ORACLES = {
    "domain_stats": SQL_DOMAIN_STATS,
    "domain_cap": SQL_DOMAIN_CAP,
    "domain_gate": SQL_DOMAIN_GATE,
    "domain_gini": SQL_DOMAIN_GINI,
}
