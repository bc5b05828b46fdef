"""Partitioned cuckoo-filter URL-seen set (F5 fast path, alternative
backend to :mod:`crawl4ai_spark.operators.bloom`).

The north rule names a "Bloom/cuckoo URL-seen filter"; this is the cuckoo
half — partial-key cuckoo hashing (Fan et al., CoNEXT 2014, public), which
the Bloom filter cannot offer:

- **deletion**: a crawled-then-purged URL's fingerprint can be removed
  (re-crawl support, GDPR-style purges) — impossible with OR-merged Blooms;
- comparable space at low FP rates (16-bit fingerprints, 4-slot buckets).

Same operational shape as the Bloom backend:

- URL space hash-sharded (``xxhash64(url) mod n_shards``); one table per
  shard persisted as a binary row ``(shard_id, slots, stash, n_items)``;
- shards built per-partition with ``applyInPandas`` (numpy uint16 table);
- merge = re-insert fingerprints (each fingerprint's alternate bucket is
  recoverable as ``i ^ h(fp)`` — the partial-key property);
- membership inside ``mapInPandas`` against the broadcast shard dict.

NO-FALSE-NEGATIVE GUARANTEE: an insert that still fails after the eviction
budget lands in a per-shard overflow STASH (plain fingerprint+bucket list),
so a seen URL can never report unseen — the same invariant the Bloom path's
tests enforce. False positives (fingerprint collisions) are bounded by
~2·bucket_size/2^16 per lookup.
"""

from __future__ import annotations

import hashlib
import json
from typing import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

CUCKOO_SCHEMA = T.StructType([
    T.StructField("shard_id", T.IntegerType()),
    T.StructField("slots", T.BinaryType()),     # uint16[n_buckets*bucket_size]
    T.StructField("stash", T.StringType()),     # json [[bucket, fp], ...]
    T.StructField("n_items", T.LongType()),
])

BUCKET_SIZE = 4
MAX_KICKS = 200


def _fingerprint_and_bucket(url: str, n_buckets: int) -> tuple[int, int]:
    d = hashlib.md5(url.encode()).digest()
    fp = (int.from_bytes(d[:2], "big") % 65535) + 1   # 1..65535, never 0
    b1 = int.from_bytes(d[2:10], "big") % n_buckets
    return fp, b1


def _alt_bucket(bucket: int, fp: int, n_buckets: int) -> int:
    # partial-key displacement: involution when n_buckets is a power of two
    h = int.from_bytes(hashlib.md5(fp.to_bytes(2, "big")).digest()[:8], "big")
    return (bucket ^ h) % n_buckets


class _ShardTable:
    """One shard's mutable cuckoo table (driver/executor-local helper)."""

    def __init__(self, n_buckets: int, slots: np.ndarray | None = None,
                 stash: list | None = None, seed_kicks: int = 0):
        self.n_buckets = n_buckets
        self.slots = (slots if slots is not None
                      else np.zeros(n_buckets * BUCKET_SIZE, dtype=np.uint16))
        self.stash: list[list[int]] = stash or []
        self._rng_state = seed_kicks

    def _bucket_view(self, b: int) -> np.ndarray:
        return self.slots[b * BUCKET_SIZE:(b + 1) * BUCKET_SIZE]

    def insert(self, url: str) -> None:
        fp, b1 = _fingerprint_and_bucket(url, self.n_buckets)
        b2 = _alt_bucket(b1, fp, self.n_buckets)
        for b in (b1, b2):
            bucket = self._bucket_view(b)
            if fp in bucket:
                return  # already present
            empty = np.flatnonzero(bucket == 0)
            if len(empty):
                bucket[empty[0]] = fp
                return
        # evict deterministically: rotate through slots of alternating buckets
        cur_fp, cur_b = fp, b1
        for kick in range(MAX_KICKS):
            bucket = self._bucket_view(cur_b)
            slot = kick % BUCKET_SIZE
            cur_fp, bucket[slot] = int(bucket[slot]), cur_fp
            cur_b = _alt_bucket(cur_b, cur_fp, self.n_buckets)
            bucket = self._bucket_view(cur_b)
            empty = np.flatnonzero(bucket == 0)
            if len(empty):
                bucket[empty[0]] = cur_fp
                return
        self.stash.append([cur_b, cur_fp])  # FN-free overflow

    def insert_fp(self, bucket: int, fp: int) -> None:
        """Re-insert a known fingerprint (merge path)."""
        alt = _alt_bucket(bucket, fp, self.n_buckets)
        for b in (bucket, alt):
            bv = self._bucket_view(b)
            if fp in bv:
                return
            empty = np.flatnonzero(bv == 0)
            if len(empty):
                bv[empty[0]] = fp
                return
        self.stash.append([bucket, fp])

    def contains(self, url: str) -> bool:
        fp, b1 = _fingerprint_and_bucket(url, self.n_buckets)
        b2 = _alt_bucket(b1, fp, self.n_buckets)
        if fp in self._bucket_view(b1) or fp in self._bucket_view(b2):
            return True
        return any(s_fp == fp and s_b in (b1, b2) for s_b, s_fp in self.stash)

    def delete(self, url: str) -> bool:
        fp, b1 = _fingerprint_and_bucket(url, self.n_buckets)
        b2 = _alt_bucket(b1, fp, self.n_buckets)
        for b in (b1, b2):
            bv = self._bucket_view(b)
            hit = np.flatnonzero(bv == fp)
            if len(hit):
                bv[hit[0]] = 0
                return True
        for i, (s_b, s_fp) in enumerate(self.stash):
            if s_fp == fp and s_b in (b1, b2):
                del self.stash[i]
                return True
        return False

    def fingerprints(self) -> list[tuple[int, int]]:
        out = [(int(i // BUCKET_SIZE), int(v))
               for i, v in enumerate(self.slots) if v]
        out.extend((int(b), int(fp)) for b, fp in self.stash)
        return out


def _n_buckets(capacity_per_shard: int) -> int:
    # next power of two holding capacity at ~95% load
    need = max(64, int(capacity_per_shard / (BUCKET_SIZE * 0.95)))
    return 1 << (need - 1).bit_length()


def shard_of(url_col, n_shards: int):
    return F.pmod(F.xxhash64(url_col), F.lit(n_shards)).cast("int")


def _row_of(shard_id: int, t: _ShardTable, n: int) -> dict:
    return {"shard_id": shard_id, "slots": t.slots.tobytes(),
            "stash": json.dumps(t.stash), "n_items": n}


def build_cuckoo(urls_df: DataFrame, url_col: str = "url", *,
                 n_shards: int = 16, capacity_per_shard: int = 1_000_000
                 ) -> DataFrame:
    """Distributed build: shard by url hash, one cuckoo table per shard."""
    nb = _n_buckets(capacity_per_shard)

    def build(pdf: pd.DataFrame) -> pd.DataFrame:
        t = _ShardTable(nb)
        n = 0
        for u in pdf[url_col]:
            if u is None:
                continue
            t.insert(u)
            n += 1
        return pd.DataFrame([_row_of(int(pdf["__shard"].iloc[0]), t, n)])

    return (
        urls_df.select(url_col)
        .withColumn("__shard", shard_of(F.col(url_col), n_shards))
        .groupBy("__shard")
        .applyInPandas(build, CUCKOO_SCHEMA)
    )


def merge_cuckoos(a: DataFrame, b: DataFrame, *,
                  capacity_per_shard: int = 1_000_000) -> DataFrame:
    """Merge shard tables by re-inserting fingerprints (the partial-key
    property makes every fingerprint relocatable without its url)."""
    nb = _n_buckets(capacity_per_shard)
    both = a.unionByName(b)

    def fold(pdf: pd.DataFrame) -> pd.DataFrame:
        acc = _ShardTable(nb)
        n = 0
        for slots, stash, ni in zip(pdf["slots"], pdf["stash"], pdf["n_items"]):
            t = _ShardTable(nb, np.frombuffer(slots, dtype=np.uint16).copy(),
                            json.loads(stash))
            for bucket, fp in t.fingerprints():
                acc.insert_fp(bucket, fp)
            n += int(ni)
        return pd.DataFrame([_row_of(int(pdf["shard_id"].iloc[0]), acc, n)])

    return both.groupBy("shard_id").applyInPandas(fold, CUCKOO_SCHEMA)


def delete_urls(filt: DataFrame, urls_df: DataFrame, url_col: str = "url", *,
                n_shards: int = 16, capacity_per_shard: int = 1_000_000
                ) -> DataFrame:
    """Remove urls from the seen-filter (the cuckoo advantage). Deletions
    are grouped per shard and applied to that shard's table only."""
    nb = _n_buckets(capacity_per_shard)
    dels = (
        urls_df.select(F.col(url_col).alias("__del_url"))
        .withColumn("shard_id", shard_of(F.col("__del_url"), n_shards))
        .groupBy("shard_id")
        .agg(F.collect_list("__del_url").alias("__dels"))
    )
    joined = filt.join(dels, on="shard_id", how="left")

    def apply(pdf: pd.DataFrame) -> pd.DataFrame:
        out = []
        for _, r in pdf.iterrows():
            t = _ShardTable(nb, np.frombuffer(r["slots"], dtype=np.uint16).copy(),
                            json.loads(r["stash"]))
            n = int(r["n_items"])
            dels = r["__dels"]
            for u in (list(dels) if dels is not None else []):
                if t.delete(u):
                    n -= 1
            out.append(_row_of(int(r["shard_id"]), t, n))
        return pd.DataFrame(out)

    return joined.groupBy("shard_id").applyInPandas(apply, CUCKOO_SCHEMA)


def filter_unseen_cuckoo(candidates: DataFrame, filt: DataFrame,
                         url_col: str = "url", *, n_shards: int = 16,
                         capacity_per_shard: int = 1_000_000) -> DataFrame:
    """Rows of ``candidates`` whose url is not in the filter. False
    negatives are impossible (stash overflow); false positives are
    fingerprint collisions, bounded ≈ 2·BUCKET_SIZE/2^16."""
    nb = _n_buckets(capacity_per_shard)
    shards = {
        int(r["shard_id"]): (np.frombuffer(r["slots"], dtype=np.uint16),
                             json.loads(r["stash"]))
        for r in filt.collect()  # small binary dim table by design
    }
    spark = candidates.sparkSession
    bshards = spark.sparkContext.broadcast(shards)
    cols = candidates.columns

    with_shard = candidates.withColumn("__shard", shard_of(F.col(url_col), n_shards))

    def test(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        sh = bshards.value
        tables: dict[int, _ShardTable] = {}
        for pdf in batches:
            if len(pdf) == 0:
                continue
            keep = np.ones(len(pdf), dtype=bool)
            for i, (u, sid) in enumerate(zip(pdf[url_col], pdf["__shard"])):
                entry = sh.get(int(sid))
                if entry is None:
                    continue
                t = tables.get(int(sid))
                if t is None:
                    t = tables[int(sid)] = _ShardTable(nb, entry[0], entry[1])
                if t.contains(u):
                    keep[i] = False
            yield pdf.loc[keep, cols]

    return with_shard.mapInPandas(test, candidates.schema)
