"""Sitemap reconciliation (ops/refreshq.py reconcile_sitemap) —
from-spec verdict parity plus the closed continuous-sync loop: a partial
crawl reconciled against the site's advertised url set schedules exactly
the uncovered pages, and re-crawling that feed completes coverage."""

from pyspark.sql import functions as F

from crawl4ai_spark.ops.refreshq import q_sitemap_reconcile, reconcile_sitemap

SF = "/root/testdata/sf0.001"


def test_verdicts_match_from_spec(spark):
    rows = q_sitemap_reconcile(spark, SF).collect()
    assert rows
    seen = set()
    for r in rows:
        doc_id = int(r.url.rsplit("/", 1)[1])
        in_adv = doc_id % 7 != 0
        in_cr = doc_id % 5 != 0
        want = ("missing" if in_adv and not in_cr else
                "orphaned" if in_cr and not in_adv else
                "stale" if r.lastmod_day > r.fetch_day else "fresh")
        assert r.verdict == want, r
        assert r.recrawl == (want in ("missing", "stale"))
        seen.add(want)
    assert seen == {"missing", "orphaned", "stale", "fresh"}


def test_partial_crawl_plus_reconcile_completes_coverage(spark, tmp_path):
    from crawl4ai_spark.engine import CrawlConfig, SparkWebEngine
    from crawl4ai_spark.sources.pagesgen import (
        generate_pages,
        generate_seeds,
    )

    pages = generate_pages(spark, 2, 10)
    seeds = generate_seeds(spark, 2)

    # partial crawl (no robots — a site advertising its own sitemap
    # wouldn't list disallowed pages): depth cap leaves pages unvisited
    eng = SparkWebEngine(spark, str(tmp_path / "s1"))
    eng.run(pages, seeds,
            config=CrawlConfig(max_depth=1, max_pages=50))
    crawled = (eng.results().filter("success")
               .select("url", F.lit(1).alias("fetch_day")))

    # the site's sitemap advertises EVERY page, all current (day 1)
    advertised = pages.select("url", F.lit(1).alias("lastmod_day"))
    rec = reconcile_sitemap(advertised, crawled)
    verdicts = {r.url: r.verdict for r in rec.collect()}
    missing = {u for u, v in verdicts.items() if v == "missing"}
    assert missing, "depth-1 crawl should leave advertised pages uncovered"
    assert "orphaned" not in verdicts.values()  # sitemap covers all crawled

    # the recrawl feed seeds a second pass; union covers the whole site
    feed = (rec.filter("recrawl")
            .select("url", F.lit(0.0).alias("priority")))
    eng2 = SparkWebEngine(spark, str(tmp_path / "s2"))
    eng2.run(pages, feed,
             config=CrawlConfig(max_depth=0, max_pages=500))
    crawled2 = {r.url for r in
                eng2.results().filter("success").select("url").collect()}
    covered = {r.url for r in crawled.select("url").collect()} | crawled2
    advertised_set = {r.url for r in pages.select("url").collect()}
    assert advertised_set <= covered

    # reconciling again reports nothing left to schedule
    all_crawled = spark.createDataFrame(
        [(u, 1) for u in covered], "url string, fetch_day int")
    rec2 = reconcile_sitemap(advertised, all_crawled)
    assert rec2.filter("recrawl").count() == 0


def test_stale_detection_drives_revisit(spark):
    adv = spark.createDataFrame(
        [("u1", 5), ("u2", 2), ("u3", 9)], "url string, lastmod_day int")
    cr = spark.createDataFrame(
        [("u1", 3), ("u2", 2), ("u4", 1)], "url string, fetch_day int")
    got = {r.url: (r.verdict, r.recrawl)
           for r in reconcile_sitemap(adv, cr).collect()}
    assert got == {
        "u1": ("stale", True),      # advertised newer than our fetch
        "u2": ("fresh", False),     # equal lastmod — current
        "u3": ("missing", True),    # never crawled
        "u4": ("orphaned", False),  # gone from the sitemap
    }


def test_stream_reconcile_matches_batch(spark, tmp_path):
    """Streamed advertised entries across >=2 micro-batch files produce
    verdicts row-identical to the batch reconcile's advertised rows."""
    from crawl4ai_spark.ops.refreshq import q_sitemap_reconcile
    from crawl4ai_spark.streaming.stream import (
        run_stream_to_memory,
        stream_sitemap_reconcile,
    )

    # reuse the oracled synthesis: advertised/crawled sides of the query
    d = spark.read.parquet(f"{SF}/documents.parquet").select("doc_id")
    url = F.expr("concat('https://s', doc_id % 6, '.example/sm/', doc_id)")
    advertised = (d.filter("doc_id % 7 != 0")
                  .select(url.alias("url"),
                          F.expr("CAST(1 + (doc_id * 3) % 28 AS INT)")
                          .alias("lastmod_day")))
    crawled = (d.filter("doc_id % 5 != 0")
               .select(url.alias("url"),
                       F.expr("1 + (doc_id * 11) % 28").alias("fetch_day")))

    adv_dir = tmp_path / "adv"
    a, b = advertised.filter("lastmod_day % 2 = 0"), \
        advertised.filter("lastmod_day % 2 = 1")
    a.write.parquet(str(adv_dir / "b0"))
    b.write.parquet(str(adv_dir / "b1"))

    out = stream_sitemap_reconcile(
        spark, str(adv_dir / "*" / "*.parquet"), crawled)
    run_stream_to_memory(out, "stream_reconcile_t")
    got = {(r.url, r.verdict, r.recrawl) for r in
           spark.sql("SELECT url, verdict, recrawl"
                     " FROM stream_reconcile_t").collect()}
    want = {(r.url, r.verdict, r.recrawl) for r in
            q_sitemap_reconcile(spark, SF).collect()
            if r.verdict != "orphaned"}
    assert got == want and got
