"""F12/F16 end-to-end: deterministic 503 injection → requeue with
retry_count+1 → exponential backoff in host_state → reduced per-host quota
on the next generation (ref RateLimiter async_dispatcher.py:28-85 semantics,
deterministic jitter)."""

from pyspark.sql import functions as F

from crawl4ai_spark.engine import CrawlConfig, SparkWebEngine
from crawl4ai_spark.operators.politeness import MAX_RETRIES, base_delay
from crawl4ai_spark.sources.pagesgen import generate_pages, generate_seeds


def _run(spark, tmp_store, **cfg_kw):
    pages = generate_pages(spark, 3, 7).cache()
    seeds = generate_seeds(spark, 3)
    eng = SparkWebEngine(spark, tmp_store)
    cfg = CrawlConfig(max_depth=2, max_pages=40, per_host_quota=8,
                      check_robots_txt=False, **cfg_kw)
    res = eng.run(pages, seeds, config=cfg)
    pages.unpersist()
    return eng, res


def test_503_requeued_then_completed(spark, tmp_store):
    eng, res = _run(spark, tmp_store, simulate_503_hosts=r"www\.host1\.com")
    rows = res.filter(F.col("url") == "https://www.host1.com/p0") \
              .orderBy("generation").collect()
    # first attempt rate-limited, retry succeeds
    assert [r.status_code for r in rows] == [503, 200]
    assert rows[0].success is False and rows[1].success is True

    # the frontier delta-log recorded both attempts
    fr = eng.frontier().filter(F.col("url") == "https://www.host1.com/p0") \
            .orderBy("retry_count").collect()
    assert [r.retry_count for r in fr] == [0, 1]
    assert [r.status for r in fr] == ["FAILED", "COMPLETED"]


def test_backoff_state_and_quota_shrink(spark, tmp_store):
    eng, res = _run(spark, tmp_store, simulate_503_hosts=r"www\.host1\.com")
    hs = {r.host: r for r in
          eng.store.read(spark, "host_state").collect()}
    flaky = hs["www.host1.com"]
    assert flaky.fail_count >= 1
    # clean hosts carry no backoff state at all: the table is proportional
    # to the rate-limited host set, not the crawled host set
    assert "www.host0.com" not in hs
    # backoff doubled (×2×jitter ∈ [1.5, 2.5]) vs the deterministic base
    assert flaky.current_delay > base_delay("www.host1.com", 0)

    # quota shrink: the generation after the failure schedules at most
    # quota/2 urls on the flaky host (8 >> 1 = 4)
    per_gen = (
        res.filter(F.col("host") == "www.host1.com")
        .groupBy("generation").count().orderBy("generation").collect()
    )
    fail_gen = 0
    later = [r["count"] for r in per_gen if r.generation == fail_gen + 1]
    if later:  # the crawl may end before another host1 generation
        assert later[0] <= 4


def test_retries_capped(spark, tmp_store):
    # every attempt rate-limited (retry rows also 503 via a custom run):
    # simulate_503_hosts only hits retry_count==0, so instead verify the cap
    # statically: requeue filter uses MAX_RETRIES from the reference (3)
    assert MAX_RETRIES == 3
