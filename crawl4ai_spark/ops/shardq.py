"""Crawl-fleet sharding: rendezvous (highest-random-weight) hashing of
hosts onto crawler shards.

A distributed crawler must pin each HOST to exactly one crawler shard —
politeness state (robots cache, per-host backoff clocks, connection pools)
is per-host and cannot be split — and must survive fleet resizes without
reshuffling the world. Modulo hashing (``hash(host) % N``) remaps ~all
hosts when N changes; rendezvous hashing (Thaler & Ravishankar 1996) moves
EXACTLY the hosts whose new shard wins the weight race — an expected 1/(N+1)
of them — and needs no ring state, just the shard count. This is the
host-affinity device the reference's single-process dispatcher
(/root/reference/crawl4ai/async_dispatcher.py:219 — one semaphore, one
machine) never needs, and the first thing a 1000-executor deployment does.

Scheme (exact in both engines): weight(host, k) = md5(host || '|' || k) —
lowercase fixed-width hex, so lexicographic string max IS the weight max —
and shard(host, N) = argmax over k in 0..N-1. Ties would need an md5
collision (none at any SF; documented rather than tie-broken).

Scale shape: one scan → one bounded ×(N+1) projection (the k sequence is a
literal array, not data) → ONE host-keyed aggregate computing both shard
assignments via max_by with an aggregate FILTER. No join, no window; output
is O(#hosts). At 10^7 hosts this is a single partial-aggregatable pass.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from crawl4ai_spark.ops.common import tbl

SHARD_N = 8          # current fleet size
SHARD_HOST_MOD = 199  # deterministic host synthesis from doc_id


def q_shard_rendezvous(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per host: document load, HRW shard at SHARD_N and at SHARD_N + 1,
    and whether a resize from N to N+1 moves it. The HRW minimal-disruption
    theorem (a host moves iff the NEW shard index wins its race, expected
    1/(N+1) of hosts) is asserted in tests/test_shardq.py."""
    d = tbl(spark, sf_dir, "documents").select(
        F.concat(F.lit("site"),
                 (F.col("doc_id") % SHARD_HOST_MOD).cast("string"),
                 F.lit(".example")).alias("host"))
    hosts = d.groupBy("host").agg(F.count("*").cast("long").alias("n_docs"))
    ks = hosts.select(
        "host", "n_docs",
        F.explode(F.array(*[F.lit(k).cast("long")
                            for k in range(SHARD_N + 1)])).alias("k"),
    ).withColumn("w", F.md5(F.concat(F.col("host"), F.lit("|"),
                                     F.col("k").cast("string"))))
    a = ks.groupBy("host").agg(
        F.max("n_docs").alias("n_docs"),
        F.expr(f"max_by(k, w) FILTER (WHERE k < {SHARD_N})")
        .cast("long").alias("shard_n"),
        F.expr("max_by(k, w)").cast("long").alias("shard_n1"),
    )
    return a.select(
        "host", "n_docs", "shard_n", "shard_n1",
        (F.col("shard_n") != F.col("shard_n1")).alias("moved"))


SQL_SHARD_RENDEZVOUS = f"""
WITH hd AS (
  SELECT 'site' || (doc_id % {SHARD_HOST_MOD}) || '.example' AS host
  FROM documents
), hc AS (
  SELECT host, CAST(count(*) AS BIGINT) AS n_docs FROM hd GROUP BY host
), e AS (
  SELECT host, n_docs, CAST(r.k AS BIGINT) AS k,
         md5(host || '|' || CAST(r.k AS VARCHAR)) AS w
  FROM hc CROSS JOIN range({SHARD_N + 1}) r(k)
), a AS (
  SELECT host, max(n_docs) AS n_docs,
         CAST(arg_max(k, w) FILTER (k < {SHARD_N}) AS BIGINT) AS shard_n,
         CAST(arg_max(k, w) AS BIGINT) AS shard_n1
  FROM e GROUP BY host
)
SELECT host, n_docs, shard_n, shard_n1, shard_n != shard_n1 AS moved
FROM a
"""


QUERIES = {
    "shard_rendezvous": q_shard_rendezvous,
}
ORACLES = {
    "shard_rendezvous": SQL_SHARD_RENDEZVOUS,
}
