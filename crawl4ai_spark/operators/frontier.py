"""Frontier table ops: seed, expand, dedup (F5 exact path, F6/F7/F8 order).

The frontier is a snapshot table (FIXTURES.md §5):
    (url, host, surt_host, depth, parent_url, score, status, retry_count,
     enqueue_ts, generation)

One BFS generation (ref deep_crawling/bfs_strategy.py:74-198 semantics):
    queued(depth=d) → schedule → fetch(join pages) → process → explode links
    → normalize (deep-crawl variant = the reference's dedup key,
      bfs_strategy.py:111) → validate/filter → anti-join seen → append d+1

DFS (dfs_strategy.py:27-131) and best-first (bff_strategy.py:130-215) differ
only in the scheduling ORDER BY — depth DESC resp. score DESC — expressed in
:func:`crawl4ai_spark.operators.politeness.schedule_batch`'s window.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from crawl4ai_spark import urls as U

FRONTIER_SCHEMA = T.StructType([
    T.StructField("url", T.StringType()),
    T.StructField("host", T.StringType()),
    T.StructField("surt_host", T.StringType()),
    T.StructField("depth", T.IntegerType()),
    T.StructField("parent_url", T.StringType()),
    T.StructField("score", T.DoubleType()),
    T.StructField("status", T.StringType()),   # QUEUED/IN_PROGRESS/COMPLETED/FAILED
    T.StructField("retry_count", T.IntegerType()),
    T.StructField("generation", T.IntegerType()),
])

_NORM_SCHEMA = T.StructType([
    T.StructField("url", T.StringType()),
    T.StructField("host", T.StringType()),
    T.StructField("surt_host", T.StringType()),
    T.StructField("parent_url", T.StringType()),
    T.StructField("score", T.DoubleType()),
])


def seeds_to_frontier(seeds: DataFrame) -> DataFrame:
    """seeds(url, priority) → frontier rows at depth 0, status QUEUED."""
    def norm(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            rows = []
            for u, pr in zip(pdf["url"], pdf["priority"]):
                nu = U.normalize_url(u, u)
                if not nu or not U.is_valid_url(nu):
                    continue
                h = U.host_of(nu)
                rows.append((nu, h, U.surt_host(h), None, float(pr)))
            yield pd.DataFrame(rows, columns=["url", "host", "surt_host",
                                              "parent_url", "score"])

    normed = seeds.mapInPandas(norm, _NORM_SCHEMA)
    return (
        normed.dropDuplicates(["url"])
        .withColumn("depth", F.lit(0))
        .withColumn("status", F.lit("QUEUED"))
        .withColumn("retry_count", F.lit(0))
        .withColumn("generation", F.lit(0))
        .select([f.name for f in FRONTIER_SCHEMA.fields])
    )


def explode_links(results: DataFrame, *, include_external: bool = False) -> DataFrame:
    """results → one row per discovered link (url, parent_url, intrinsic_score).
    Column pruning keeps the shuffle narrow: only the link structs move."""
    internal = results.select(
        F.col("url").alias("parent_url"),
        F.explode("links.internal").alias("l"),
    )
    picked = internal
    if include_external:
        external = results.select(
            F.col("url").alias("parent_url"),
            F.explode("links.external").alias("l"),
        )
        picked = internal.unionByName(external)
    return picked.select(
        F.col("l.href").alias("url"),
        "parent_url",
        F.col("l.intrinsic_score").alias("intrinsic_score"),
    )


def normalize_candidates(links: DataFrame) -> DataFrame:
    """Apply the deep-crawl normalization (the frontier dedup key) + host/surt
    in one Arrow stage; drop invalid/nonsense URLs."""
    schema = T.StructType([
        T.StructField("url", T.StringType()),
        T.StructField("host", T.StringType()),
        T.StructField("surt_host", T.StringType()),
        T.StructField("parent_url", T.StringType()),
        T.StructField("score", T.DoubleType()),
    ])

    def norm(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            rows = []
            for u, p, s in zip(pdf["url"], pdf["parent_url"], pdf["intrinsic_score"]):
                nu = U.normalize_url_deep(u, p or u)
                if not nu or not U.is_valid_url(nu) or U.is_nonsense_url(nu):
                    continue
                h = U.host_of(nu)
                rows.append((nu, h, U.surt_host(h),
                             p, float(s) if pd.notna(s) else 0.0))
            yield pd.DataFrame(rows, columns=[f.name for f in schema.fields])

    return links.mapInPandas(norm, schema)


def dedup_new_candidates(candidates: DataFrame, frontier: DataFrame) -> DataFrame:
    """Exact URL-seen path (F5): drop candidates already on the frontier
    (any status) and collapse duplicate discoveries, keeping the best
    (max score, stable parent tie-break)."""
    fresh = candidates.join(
        frontier.select("url"), on="url", how="left_anti"
    )
    # first-discovery-wins with deterministic ordering
    w = F.row_number().over(
        Window.partitionBy("url")
        .orderBy(F.col("score").desc(), F.col("parent_url").asc_nulls_last())
    )
    return fresh.withColumn("__rn", w).filter(F.col("__rn") == 1).drop("__rn")


def enqueue(candidates: DataFrame, *, depth: int, generation: int) -> DataFrame:
    return (
        candidates.withColumn("depth", F.lit(depth))
        .withColumn("status", F.lit("QUEUED"))
        .withColumn("retry_count", F.lit(0))
        .withColumn("generation", F.lit(generation))
        .select([f.name for f in FRONTIER_SCHEMA.fields])
    )
