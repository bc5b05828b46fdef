"""Cuckoo-filter URL-seen backend (F5): no false negatives (stash
overflow), anti-join equivalence up to the FP bound, fingerprint-re-insert
merge, and DELETION — the capability the Bloom path cannot offer."""

import pytest
from pyspark.sql import functions as F

from crawl4ai_spark.operators.cuckoo import (
    build_cuckoo,
    delete_urls,
    filter_unseen_cuckoo,
    merge_cuckoos,
)

N_SHARDS = 4
CAP = 4096


def _urls(spark, lo, hi, tag="seen"):
    return spark.range(lo, hi).select(
        F.concat(F.lit(f"https://h{tag}"), (F.col("id") % 7),
                 F.lit(".com/p"), F.col("id")).alias("url"))


@pytest.fixture(scope="module")
def filt(spark):
    return build_cuckoo(_urls(spark, 0, 3000), n_shards=N_SHARDS,
                        capacity_per_shard=CAP).cache()


def test_no_false_negatives(spark, filt):
    # every inserted url must test positive → zero survivors
    out = filter_unseen_cuckoo(_urls(spark, 0, 3000), filt,
                               n_shards=N_SHARDS, capacity_per_shard=CAP)
    assert out.count() == 0


def test_fp_rate_bounded(spark, filt):
    unseen = _urls(spark, 100_000, 104_000, tag="new")
    survivors = filter_unseen_cuckoo(unseen, filt, n_shards=N_SHARDS,
                                     capacity_per_shard=CAP).count()
    dropped = 4000 - survivors
    # FP bound ≈ 2·BUCKET_SIZE/2^16 ≈ 0.012%; allow generous slack
    assert dropped <= 40


def test_merge_reinserts_everything(spark):
    a = build_cuckoo(_urls(spark, 0, 1000), n_shards=N_SHARDS,
                     capacity_per_shard=CAP)
    b = build_cuckoo(_urls(spark, 1000, 2000), n_shards=N_SHARDS,
                     capacity_per_shard=CAP)
    m = merge_cuckoos(a, b, capacity_per_shard=CAP)
    out = filter_unseen_cuckoo(_urls(spark, 0, 2000), m,
                               n_shards=N_SHARDS, capacity_per_shard=CAP)
    assert out.count() == 0


def test_delete_reopens_urls(spark):
    filt = build_cuckoo(_urls(spark, 0, 500), n_shards=N_SHARDS,
                        capacity_per_shard=CAP)
    gone = _urls(spark, 0, 50)
    filt2 = delete_urls(filt, gone, n_shards=N_SHARDS, capacity_per_shard=CAP)
    # deleted urls now pass the filter again…
    reopened = filter_unseen_cuckoo(gone, filt2, n_shards=N_SHARDS,
                                    capacity_per_shard=CAP).count()
    assert reopened == 50
    # …while the rest stay blocked (no collateral false negatives)
    still = filter_unseen_cuckoo(_urls(spark, 50, 500), filt2,
                                 n_shards=N_SHARDS, capacity_per_shard=CAP)
    assert still.count() == 0


def test_engine_cuckoo_backend_matches_exact_path(spark, tmp_store):
    import os

    from crawl4ai_spark.engine import CrawlConfig, SparkWebEngine
    from crawl4ai_spark.sources.pagesgen import generate_pages, generate_seeds

    pages = generate_pages(spark, 3, 15).cache()
    seeds = generate_seeds(spark, 3)
    cfgs = {
        "exact": CrawlConfig(max_depth=3, max_pages=60, check_robots_txt=False),
        "cuckoo": CrawlConfig(max_depth=3, max_pages=60, check_robots_txt=False,
                              use_bloom=True, seen_backend="cuckoo",
                              bloom_shards=4, bloom_capacity_per_shard=4096),
    }
    got = {}
    for name, cfg in cfgs.items():
        eng = SparkWebEngine(spark, os.path.join(tmp_store, f"ck_{name}"))
        res = eng.run(pages, seeds, config=cfg)
        got[name] = {r["url"] for r in res.select("url").collect()}
    assert got["cuckoo"] == got["exact"]
    pages.unpersist()


def test_overload_stays_fn_free(spark):
    """Inserting well beyond a shard's capacity pushes fingerprints into the
    stash — lookups stay false-negative-free even under overload."""
    tiny_cap = 64
    filt = build_cuckoo(_urls(spark, 0, 2000), n_shards=2,
                        capacity_per_shard=tiny_cap)
    out = filter_unseen_cuckoo(_urls(spark, 0, 2000), filt,
                               n_shards=2, capacity_per_shard=tiny_cap)
    assert out.count() == 0
