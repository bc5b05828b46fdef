"""Re-crawl scheduling: change-rate estimation + refresh priority.

The incremental-crawl counterpart of ``dedup_incremental``: a production
crawler re-visits 10^10 URLs on a budget, so it must estimate each page's
change rate from its fetch history and spend the budget on the pages most
likely to be stale. Estimator: Cho & Garcia-Molina, "Estimating Frequency
of Change" (ACM TOIT 2003) — for n re-visits of which X found the page
changed, the bias-corrected Poisson-rate estimate is

    lambda = -ln((n - X + 0.5) / (n + 0.5))    (changes per visit interval)

and the practical refresh policy ranks by ``lambda × age`` (expected
changes since the last crawl). The reference has no scheduler at all (its
CacheMode is binary use-cache/refetch); this is the operator a 10^10-URL
frontier needs on top.

Exactness discipline: (n, X) ranges over a tiny finite domain, so the ln
is PRECOMPUTED into an integer e6 table in Python and emitted as a nested
CASE expression shared VERBATIM by Spark and DuckDB — zero libm in either
engine, every output integer-exact (the DSIR/HLL integer-table pattern).

Fetch history is synthesized deterministically from the documents table
(the repo's md5-derivation convention): doc_id → n_visits in [3, 10], each
visit's changed-bit drawn from an md5 nibble against a per-doc change
propensity, age_days in [1, 30].

Scale shape: one bounded explode (≤ MAX_VISITS rows/doc) + one doc-keyed
partial aggregate + pure expressions — no join, no window, no python; at
10^10 URLs the history table is the real input and the plan is the same
single aggregate.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from crawl4ai_spark.ops.common import tbl

MIN_VISITS = 3
MAX_VISITS = 10

# exact integer e6 table: (n, X) -> round(-ln((n - X + .5)/(n + .5)) * 1e6)
LAMBDA_E6 = {
    (n, x): round(-math.log((n - x + 0.5) / (n + 0.5)) * 1e6)
    for n in range(MIN_VISITS, MAX_VISITS + 1)
    for x in range(0, n + 1)
}

# the table as a nested CASE expression — identical text in both engines
_LAMBDA_CASE = "CASE " + " ".join(
    f"WHEN n_visits = {n} AND n_changes = {x} THEN {v}"
    for (n, x), v in sorted(LAMBDA_E6.items())
) + " ELSE 0 END"

# priority buckets (expected changes since last crawl, e6): the knobs a
# budgeted scheduler would tune
HOT_E6 = 10_000_000   # >= 10 expected changes -> crawl now
WARM_E6 = 2_000_000   # >= 2 -> this cycle


def q_refresh_schedule(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per URL (doc): visits, observed changes, Cho–Garcia-Molina
    change-rate estimate (e6), age, refresh priority = lambda × age, and
    the scheduling bucket."""
    d = tbl(spark, sf_dir, "documents").select("doc_id")
    hist = (
        d.withColumn("n_visits",
                     (F.lit(MIN_VISITS)
                      + F.col("doc_id") % (MAX_VISITS - MIN_VISITS + 1))
                     .cast("int"))
        .withColumn("propensity", (F.col("doc_id") % 11).cast("int"))
        .withColumn("i", F.explode(F.expr("sequence(1, n_visits)")))
        .withColumn("nib", F.expr(
            "instr('0123456789abcdef', "
            "substring(md5(concat(cast(doc_id as string), ':', "
            "cast(i as string))), 1, 1)) - 1"))
        .withColumn("changed", (F.col("nib") < F.col("propensity")).cast("int"))
    )
    agg = hist.groupBy("doc_id", "n_visits").agg(
        F.sum("changed").alias("n_changes"))
    return (
        agg.withColumn("lambda_e6", F.expr(_LAMBDA_CASE))
        .withColumn("age_days", (F.lit(1) + (F.col("doc_id") * 7) % 30)
                    .cast("long"))
        .withColumn("priority_e6",
                    (F.col("lambda_e6") * F.col("age_days")).cast("long"))
        .select(
            F.col("doc_id").cast("long"),
            F.col("n_visits").cast("long"),
            F.col("n_changes").cast("long"),
            F.col("lambda_e6").cast("long"),
            "age_days", "priority_e6",
            F.when(F.col("priority_e6") >= HOT_E6, "hot")
             .when(F.col("priority_e6") >= WARM_E6, "warm")
             .otherwise("cold").alias("bucket"))
    )


SQL_REFRESH_SCHEDULE = f"""
WITH hist AS (
  SELECT doc_id,
         CAST({MIN_VISITS} + doc_id % {MAX_VISITS - MIN_VISITS + 1} AS INT)
           AS n_visits,
         CAST(doc_id % 11 AS INT) AS propensity,
         unnest(range(1, CAST({MIN_VISITS} + doc_id %
                {MAX_VISITS - MIN_VISITS + 1} AS INT) + 1)) AS i
  FROM documents
), obs AS (
  SELECT doc_id, n_visits,
         CASE WHEN (instr('0123456789abcdef',
                    substr(md5(CAST(doc_id AS VARCHAR) || ':' ||
                               CAST(i AS VARCHAR)), 1, 1)) - 1)
                   < propensity THEN 1 ELSE 0 END AS changed
  FROM hist
), agg AS (
  SELECT doc_id, n_visits, sum(changed) AS n_changes
  FROM obs GROUP BY doc_id, n_visits
), est AS (
  SELECT doc_id, n_visits, n_changes,
         {_LAMBDA_CASE} AS lambda_e6,
         1 + (doc_id * 7) % 30 AS age_days
  FROM agg
)
SELECT CAST(doc_id AS BIGINT) AS doc_id,
       CAST(n_visits AS BIGINT) AS n_visits,
       CAST(n_changes AS BIGINT) AS n_changes,
       CAST(lambda_e6 AS BIGINT) AS lambda_e6,
       CAST(age_days AS BIGINT) AS age_days,
       CAST(lambda_e6 * age_days AS BIGINT) AS priority_e6,
       CASE WHEN lambda_e6 * age_days >= {HOT_E6} THEN 'hot'
            WHEN lambda_e6 * age_days >= {WARM_E6} THEN 'warm'
            ELSE 'cold' END AS bucket
FROM est
"""


# ---------------------------------------------------------------------------
# Snapshot diff (late r5): the crawl-update ledger between two monthly
# snapshots — added / removed / changed / unchanged per URL, the artifact
# Common Crawl publishes as crawl-over-crawl deltas and the input both
# ``refresh_schedule`` (change histories) and ``dedup_incremental``
# (delta-vs-base) consume. Snapshots are synthesized deterministically
# from documents (the dedup_incremental convention): snapshot 1 = docs
# with doc_id % 5 != 4; snapshot 2 = docs with doc_id % 5 != 0, where
# docs with doc_id % 3 == 0 carry EDITED text (a deterministic suffix) —
# so all four verdicts are non-degenerate.
#
# Scale shape: content never moves — each side reduces to (doc_id, md5)
# before the ONE full-outer equi-join on doc_id; verdicts are pure
# expressions. At 10^10 URLs this is two scans + one hash-keyed join of
# 48-byte rows.
# ---------------------------------------------------------------------------


def q_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = tbl(spark, sf_dir, "documents").select("doc_id", "text")
    s1 = (d.filter(F.col("doc_id") % 5 != 4)
          .select("doc_id", F.md5(F.col("text")).alias("h1")))
    s2 = (d.filter(F.col("doc_id") % 5 != 0)
          .select("doc_id", F.md5(
              F.when(F.col("doc_id") % 3 == 0,
                     F.concat(F.col("text"), F.lit(" [edited v2]")))
              .otherwise(F.col("text"))).alias("h2")))
    return (
        s1.join(s2, "doc_id", "full_outer")
        .select(
            F.col("doc_id").cast("long"), "h1", "h2",
            F.when(F.col("h1").isNull(), "added")
            .when(F.col("h2").isNull(), "removed")
            .when(F.col("h1") != F.col("h2"), "changed")
            .otherwise("unchanged").alias("verdict"))
    )


SQL_SNAPSHOT_DIFF = """
WITH s1 AS (
  SELECT doc_id, md5(text) AS h1 FROM documents WHERE doc_id % 5 != 4
),
s2 AS (
  SELECT doc_id,
         md5(CASE WHEN doc_id % 3 = 0 THEN text || ' [edited v2]'
                  ELSE text END) AS h2
  FROM documents WHERE doc_id % 5 != 0
)
SELECT CAST(COALESCE(s1.doc_id, s2.doc_id) AS BIGINT) AS doc_id, h1, h2,
       CASE WHEN h1 IS NULL THEN 'added'
            WHEN h2 IS NULL THEN 'removed'
            WHEN h1 != h2 THEN 'changed'
            ELSE 'unchanged' END AS verdict
FROM s1 FULL OUTER JOIN s2 ON s1.doc_id = s2.doc_id
"""


# ---------------------------------------------------------------------------
# Revisit economics: the bandwidth ledger for conditional re-crawling.
# `refresh_schedule` decides WHEN to revisit; this prices HOW — a revisit
# fleet that refetches every live URL pays body bytes for pages that have
# not changed, while a conditional fleet (If-None-Match / If-Modified-Since)
# pays one ~400-byte request/304 exchange for unchanged pages and full
# bodies only for changed/added ones. At Common-Crawl scale the unchanged
# fraction dominates, so this ratio IS the refresh budget.
#
# Same snapshot-pair synthesis as q_snapshot_diff (crawl 1 = doc_id%5 != 4,
# crawl 2 = doc_id%5 != 0, every third doc edited), hosts doc_id % 25.
# Policies priced exactly, in integers:
#   naive:       header + body for every doc live in crawl 2, header for
#                each removed-doc probe (the 404 response);
#   conditional: header for every probe, body only for changed/added.
#
# Scale shape: both sides reduce to (doc_id, bytes) before the one
# full-outer equi-join (the snapshot_diff discipline — content never
# moves), then ONE host-keyed aggregate; output O(#hosts).
# ---------------------------------------------------------------------------

REVISIT_HEADER_BYTES = 400
REVISIT_HOST_MOD = 25


def q_revisit_economics(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = tbl(spark, sf_dir, "documents").select("doc_id", "text")
    s1 = (d.filter(F.col("doc_id") % 5 != 4)
          .select("doc_id", F.md5(F.col("text")).alias("h1")))
    body2 = (F.when(F.col("doc_id") % 3 == 0,
                    F.concat(F.col("text"), F.lit(" [edited v2]")))
             .otherwise(F.col("text")))
    s2 = (d.filter(F.col("doc_id") % 5 != 0)
          .select("doc_id", F.md5(body2).alias("h2"),
                  F.octet_length(body2).cast("long").alias("b2")))
    j = (s1.join(s2, "doc_id", "full_outer")
         .select(
             (F.col("doc_id") % REVISIT_HOST_MOD).cast("long").alias("hostk"),
             F.when(F.col("h1").isNull(), "added")
             .when(F.col("h2").isNull(), "removed")
             .when(F.col("h1") != F.col("h2"), "changed")
             .otherwise("unchanged").alias("verdict"),
             F.coalesce("b2", F.lit(0)).cast("long").alias("b2")))
    hdr = F.lit(REVISIT_HEADER_BYTES).cast("long")
    agg = j.groupBy("hostk").agg(
        F.sum(F.when(F.col("verdict") == "unchanged", 1).otherwise(0))
        .cast("long").alias("n_unchanged"),
        F.sum(F.when(F.col("verdict") == "changed", 1).otherwise(0))
        .cast("long").alias("n_changed"),
        F.sum(F.when(F.col("verdict") == "added", 1).otherwise(0))
        .cast("long").alias("n_added"),
        F.sum(F.when(F.col("verdict") == "removed", 1).otherwise(0))
        .cast("long").alias("n_removed"),
        F.sum(hdr + F.col("b2")).cast("long").alias("bytes_naive"),
        F.sum(hdr + F.when(F.col("verdict") == "unchanged", F.lit(0))
              .otherwise(F.col("b2"))).cast("long")
        .alias("bytes_conditional"))
    return agg.select(
        "hostk", "n_unchanged", "n_changed", "n_added", "n_removed",
        "bytes_naive", "bytes_conditional",
        F.expr("(bytes_naive - bytes_conditional) * 1000000 div bytes_naive")
        .cast("long").alias("saved_ratio_e6"))


SQL_REVISIT_ECONOMICS = f"""
WITH s1 AS (
  SELECT doc_id, md5(text) AS h1 FROM documents WHERE doc_id % 5 != 4
),
s2 AS (
  SELECT doc_id,
         md5(CASE WHEN doc_id % 3 = 0 THEN text || ' [edited v2]'
                  ELSE text END) AS h2,
         CAST(octet_length(encode(CASE WHEN doc_id % 3 = 0
                                       THEN text || ' [edited v2]'
                                       ELSE text END)) AS BIGINT) AS b2
  FROM documents WHERE doc_id % 5 != 0
),
j AS (
  SELECT COALESCE(s1.doc_id, s2.doc_id) % {REVISIT_HOST_MOD} AS hostk,
         CASE WHEN h1 IS NULL THEN 'added'
              WHEN h2 IS NULL THEN 'removed'
              WHEN h1 != h2 THEN 'changed'
              ELSE 'unchanged' END AS verdict,
         COALESCE(b2, 0) AS b2
  FROM s1 FULL OUTER JOIN s2 ON s1.doc_id = s2.doc_id
),
agg AS (
  SELECT hostk,
         CAST(sum(CASE WHEN verdict = 'unchanged' THEN 1 ELSE 0 END)
              AS BIGINT) AS n_unchanged,
         CAST(sum(CASE WHEN verdict = 'changed' THEN 1 ELSE 0 END)
              AS BIGINT) AS n_changed,
         CAST(sum(CASE WHEN verdict = 'added' THEN 1 ELSE 0 END)
              AS BIGINT) AS n_added,
         CAST(sum(CASE WHEN verdict = 'removed' THEN 1 ELSE 0 END)
              AS BIGINT) AS n_removed,
         CAST(sum({REVISIT_HEADER_BYTES} + b2) AS BIGINT) AS bytes_naive,
         CAST(sum({REVISIT_HEADER_BYTES}
                  + CASE WHEN verdict = 'unchanged' THEN 0 ELSE b2 END)
              AS BIGINT) AS bytes_conditional
  FROM j GROUP BY hostk
)
SELECT CAST(hostk AS BIGINT) AS hostk,
       n_unchanged, n_changed, n_added, n_removed,
       bytes_naive, bytes_conditional,
       CAST((bytes_naive - bytes_conditional) * 1000000 // bytes_naive
            AS BIGINT) AS saved_ratio_e6
FROM agg
"""


# ---------------------------------------------------------------------------
# Sitemap reconciliation — the refresh loop between what a host ADVERTISES
# (sitemap <loc> + <lastmod>, the S6 seeder's output shape) and what the
# crawl store HOLDS. Four verdicts from one full-outer equi-join on url:
#   missing  — advertised, never crawled          → schedule
#   stale    — advertised newer than our fetch    → schedule
#   fresh    — advertised, our copy is current    → skip
#   orphaned — crawled, no longer advertised      → candidate for removal
# This is what turns a one-shot crawler into a continuously-synced one;
# the reference's binary CacheMode cannot express it. Day-integer
# timestamps keep both engines bit-exact (no timestamp-parity pain).
# Scale shape: both sides reduce to (url, day) BEFORE the one equi-join
# (the snapshot_diff discipline); verdicts are pure expressions.
# ---------------------------------------------------------------------------

def reconcile_sitemap(advertised: DataFrame, crawled: DataFrame) -> DataFrame:
    """``advertised``: (url, lastmod_day); ``crawled``: (url, fetch_day).
    Returns per-url verdicts + ``recrawl`` (the scheduler feed)."""
    j = advertised.join(crawled, "url", "full_outer")
    return (j.withColumn("verdict", F.expr(
                "CASE WHEN fetch_day IS NULL THEN 'missing'"
                " WHEN lastmod_day IS NULL THEN 'orphaned'"
                " WHEN lastmod_day > fetch_day THEN 'stale'"
                " ELSE 'fresh' END"))
            .withColumn("recrawl",
                        F.expr("verdict IN ('missing', 'stale')")))


def q_sitemap_reconcile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Engineered advertised/crawled sides from the documents table:
    doc_id % 7 == 0 withheld from the sitemap (orphans), doc_id % 5 == 0
    withheld from the crawl (missing), lastmod/fetch days derived by
    coprime strides so both stale and fresh occur densely."""
    d = tbl(spark, sf_dir, "documents").select("doc_id")
    url = F.expr("concat('https://s', doc_id % 6, '.example/sm/', doc_id)")
    advertised = (d.filter(F.expr("doc_id % 7 != 0"))
                  .select(url.alias("url"),
                          F.expr("1 + (doc_id * 3) % 28")
                          .alias("lastmod_day")))
    crawled = (d.filter(F.expr("doc_id % 5 != 0"))
               .select(url.alias("url"),
                       F.expr("1 + (doc_id * 11) % 28").alias("fetch_day")))
    out = reconcile_sitemap(advertised, crawled)
    return out.select(
        "url",
        F.expr("CAST(lastmod_day AS BIGINT)").alias("lastmod_day"),
        F.expr("CAST(fetch_day AS BIGINT)").alias("fetch_day"),
        "verdict", "recrawl")


SQL_SITEMAP_RECONCILE = """
WITH adv AS (
  SELECT 'https://s' || (doc_id % 6) || '.example/sm/' || doc_id AS url,
         CAST(1 + (doc_id * 3) % 28 AS BIGINT) AS lastmod_day
  FROM documents WHERE doc_id % 7 <> 0
),
cr AS (
  SELECT 'https://s' || (doc_id % 6) || '.example/sm/' || doc_id AS url,
         CAST(1 + (doc_id * 11) % 28 AS BIGINT) AS fetch_day
  FROM documents WHERE doc_id % 5 <> 0
),
j AS (
  SELECT COALESCE(adv.url, cr.url) AS url, adv.lastmod_day, cr.fetch_day
  FROM adv FULL OUTER JOIN cr ON adv.url = cr.url
)
SELECT url, lastmod_day, fetch_day,
       CASE WHEN fetch_day IS NULL THEN 'missing'
            WHEN lastmod_day IS NULL THEN 'orphaned'
            WHEN lastmod_day > fetch_day THEN 'stale'
            ELSE 'fresh' END AS verdict,
       (CASE WHEN fetch_day IS NULL THEN 'missing'
             WHEN lastmod_day IS NULL THEN 'orphaned'
             WHEN lastmod_day > fetch_day THEN 'stale'
             ELSE 'fresh' END) IN ('missing', 'stale') AS recrawl
FROM j
"""


# ------------------------------------------------ engine refresh bridge
def refresh_frontier_scores(epochs: list[DataFrame]) -> DataFrame:
    """Engine bridge (the OPIC two-phase pattern, applied to FRESHNESS):
    Cho–Garcia-Molina change-rate priorities computed from ACTUAL crawl
    history → (url, score) rows for ``SparkWebEngine.run(
    score_overrides=...)`` — a best-first re-crawl then spends its budget
    on the pages most likely to have changed.

    ``epochs`` is the ordered list of result sets from successive crawls
    of the same site (``store_validators=True`` runs, so rows carry
    ``content_md5``; any frame with a ``digest`` column works). Per URL:
    n_visits = epochs it appeared in, n_changes = digest transitions,
    λ̂ from the same integer (n, X) table q_refresh_schedule uses
    (n_visits outside the table's [MIN_VISITS, MAX_VISITS] domain →
    priority 0 — too little history to schedule on), age = epochs since
    last visit. score = λ̂ × age (expected changes since last crawl).

    Scale shape: each epoch reduces to (url, digest) before the union;
    one url-partitioned lag window + one url aggregate — the
    snapshot_diff profile generalized to N snapshots."""
    from pyspark.sql.window import Window as _W

    n_ep = len(epochs)
    frames = []
    for i, r in enumerate(epochs):
        if "digest" in r.columns:
            dig = F.col("digest")
        elif "content_md5" in r.columns:
            dig = F.col("content_md5")
        else:
            raise ValueError(
                "epoch frames need content_md5 (store_validators=True) "
                "or a digest column")
        # engine result sets are ATTEMPT LOGS: a url can carry a failed
        # row (NULL digest) next to its success in the same epoch, and a
        # restarted store may hold duplicate attempts. Reduce each epoch
        # to at most ONE (url, digest) observation — successes only where
        # the frame distinguishes them, then max(digest) as the
        # deterministic pick — so n_visits counts epochs, not rows, and
        # the lag window has no within-epoch ties.
        if "success" in r.columns:
            r = r.filter(F.col("success"))
        frames.append(
            r.filter(dig.isNotNull())
            .groupBy("url")
            .agg(F.max(dig).alias("digest"))
            .select("url", F.lit(i).alias("epoch"), "digest"))
    hist = frames[0]
    for f in frames[1:]:
        hist = hist.unionByName(f)
    w = _W.partitionBy("url").orderBy("epoch")
    ch = (hist.withColumn("prev", F.lag("digest").over(w))
          .withColumn("changed",
                      (F.col("prev").isNotNull()
                       & (F.col("digest") != F.col("prev"))).cast("int")))
    agg = ch.groupBy("url").agg(
        F.count("*").alias("n_visits"),
        F.sum("changed").alias("n_changes"),
        F.max("epoch").alias("last_epoch"))
    return (agg.withColumn("lambda_e6", F.expr(_LAMBDA_CASE))
            .select("url",
                    ((F.col("lambda_e6")
                      * (F.lit(n_ep) - F.col("last_epoch"))).cast("double")
                     / 1e6).alias("score")))


QUERIES = {
    "refresh_schedule": q_refresh_schedule,
    "snapshot_diff": q_snapshot_diff,
    "revisit_economics": q_revisit_economics,
    "sitemap_reconcile": q_sitemap_reconcile,
}
ORACLES = {
    "refresh_schedule": SQL_REFRESH_SCHEDULE,
    "snapshot_diff": SQL_SNAPSHOT_DIFF,
    "revisit_economics": SQL_REVISIT_ECONOMICS,
    "sitemap_reconcile": SQL_SITEMAP_RECONCILE,
}
