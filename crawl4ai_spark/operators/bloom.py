"""Partitioned Bloom-filter URL-seen set (F5 fast path).

Semantic target: the reference's prototype BloomFilter
(/root/reference/crawl4ai/deep_crawling/crazy.py:102-165 — mmh3+bitarray,
1% FP) re-designed for 10^10 URLs on a cluster:

- the URL space is hash-sharded (``shard = xxhash64(url) mod n_shards``) so
  each shard's bit array stays small enough to broadcast (at 10^10 URLs and
  1% FP the total filter is ~12 GB → 256+ shards of ~47 MB; membership tests
  only ever need the shards their partition's URLs hash into);
- shard bit arrays are built per-partition with ``applyInPandas`` (numpy
  bit-ops, no Python loops over bits) and persisted as binary rows
  ``(shard_id, bits, n_items, fp_rate)`` in a snapshot table;
- per micro-batch, new URLs are OR-merged into the shards (associative →
  plain groupBy reduce);
- membership = broadcast the shard dict, test inside ``mapInPandas``.

The exact left-anti-join path stays available as the correctness oracle
(tests assert zero false negatives; FP rate ≤ bound).

Hashing: k hash positions from double hashing h1+i·h2 over the md5 digest —
stdlib-only, deterministic across executors (mmh3 is unavailable).
"""

from __future__ import annotations

import hashlib
import math
from typing import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

BLOOM_SCHEMA = T.StructType([
    T.StructField("shard_id", T.IntegerType()),
    T.StructField("bits", T.BinaryType()),
    T.StructField("n_items", T.LongType()),
    T.StructField("fp_rate", T.DoubleType()),
])


def optimal_m_k(capacity: int, fp_rate: float) -> tuple[int, int]:
    """Bit count m (rounded to bytes) and hash count k for target FP rate."""
    m = max(64, int(-capacity * math.log(fp_rate) / (math.log(2) ** 2)))
    m = (m + 7) // 8 * 8
    k = max(1, round(m / capacity * math.log(2))) if capacity else 1
    return m, k


def _positions(url: str, m: int, k: int) -> np.ndarray:
    d = hashlib.md5(url.encode()).digest()
    h1 = int.from_bytes(d[:8], "big")
    h2 = int.from_bytes(d[8:], "big") | 1
    return np.array([(h1 + i * h2) % m for i in range(k)], dtype=np.int64)


def _set_bits(bits: np.ndarray, urls, m: int, k: int) -> int:
    n = 0
    for u in urls:
        if u is None:
            continue
        pos = _positions(u, m, k)
        # bitwise_or.at: fancy-indexed |= silently drops duplicate byte
        # indices (two hash positions in one byte) — .at accumulates
        np.bitwise_or.at(bits, pos >> 3, np.left_shift(1, (pos & 7)).astype(np.uint8))
        n += 1
    return n


def _test_one(bits: np.ndarray, url: str, m: int, k: int) -> bool:
    pos = _positions(url, m, k)
    return bool(np.all(bits[pos >> 3] & np.left_shift(1, (pos & 7)).astype(np.uint8)))


def shard_of(url_col, n_shards: int):
    return F.pmod(F.xxhash64(url_col), F.lit(n_shards)).cast("int")


def build_bloom(urls_df: DataFrame, url_col: str = "url", *, n_shards: int = 16,
                capacity_per_shard: int = 1_000_000, fp_rate: float = 0.01) -> DataFrame:
    """Distributed build: shard by url hash, one bit-array per shard group."""
    m, k = optimal_m_k(capacity_per_shard, fp_rate)

    def build(pdf: pd.DataFrame) -> pd.DataFrame:
        bits = np.zeros(m // 8, dtype=np.uint8)
        n = _set_bits(bits, pdf[url_col], m, k)
        return pd.DataFrame({
            "shard_id": [int(pdf["__shard"].iloc[0])],
            "bits": [bits.tobytes()],
            "n_items": [n],
            "fp_rate": [fp_rate],
        })

    return (
        urls_df.select(url_col)
        .withColumn("__shard", shard_of(F.col(url_col), n_shards))
        .groupBy("__shard")
        .applyInPandas(build, BLOOM_SCHEMA)
    )


def merge_blooms(a: DataFrame, b: DataFrame) -> DataFrame:
    """OR-merge two shard tables (same n_shards / sizing)."""
    both = a.unionByName(b)

    def orit(pdf: pd.DataFrame) -> pd.DataFrame:
        acc = None
        n = 0
        for buf, ni in zip(pdf["bits"], pdf["n_items"]):
            arr = np.frombuffer(buf, dtype=np.uint8)
            acc = arr.copy() if acc is None else (acc | arr)
            n += int(ni)
        return pd.DataFrame({
            "shard_id": [int(pdf["shard_id"].iloc[0])],
            "bits": [acc.tobytes()],
            "n_items": [n],
            "fp_rate": [float(pdf["fp_rate"].iloc[0])],
        })

    return both.groupBy("shard_id").applyInPandas(orit, BLOOM_SCHEMA)


def filter_unseen(candidates: DataFrame, bloom: DataFrame, url_col: str = "url",
                  *, n_shards: int = 16, capacity_per_shard: int = 1_000_000,
                  fp_rate: float = 0.01) -> DataFrame:
    """Rows of ``candidates`` whose url is (probably-not) in the bloom.
    False positives drop a never-seen URL (bounded by fp_rate); false
    negatives are impossible — verified in tests against the anti-join."""
    m, k = optimal_m_k(capacity_per_shard, fp_rate)
    shards = {int(r["shard_id"]): np.frombuffer(r["bits"], dtype=np.uint8)
              for r in bloom.collect()}  # small binary dim table by design
    spark = candidates.sparkSession
    bshards = spark.sparkContext.broadcast(shards)
    cols = candidates.columns

    # shard id computed JVM-side (xxhash64), membership tested in one
    # mapInPandas over (shard, url) against the broadcast shard dict
    with_shard = candidates.withColumn("__shard", shard_of(F.col(url_col), n_shards))

    def test(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        sh = bshards.value
        for pdf in batches:
            if len(pdf) == 0:
                continue
            keep_mask = np.ones(len(pdf), dtype=bool)
            for i, (u, sid) in enumerate(zip(pdf[url_col], pdf["__shard"])):
                bits = sh.get(int(sid))
                if bits is not None and _test_one(bits, u, m, k):
                    keep_mask[i] = False
            yield pdf.loc[keep_mask, cols]

    return with_shard.mapInPandas(test, candidates.schema)
