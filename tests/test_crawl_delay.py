"""REP Crawl-delay support (operators/politeness.py crawl_delay_table +
CrawlConfig.respect_crawl_delay) — robotparser parity, quota math, and
the engine honoring a host's advertised delay as a per-generation
budget."""

import urllib.robotparser

from pyspark.sql import functions as F

from crawl4ai_spark.operators.politeness import crawl_delay_table

BODIES = {
    "plain.example": "User-agent: *\nCrawl-delay: 5\nDisallow: /x\n",
    "grouped.example": ("User-agent: otherbot\nCrawl-delay: 99\n\n"
                        "User-agent: *\nCrawl-delay: 4\n"),
    "specific.example": ("User-agent: c4bot\nCrawl-delay: 2\n\n"
                         "User-agent: *\nCrawl-delay: 77\n"),
    "none.example": "User-agent: *\nDisallow: /private\n",
    "malformed.example": "User-agent: *\nCrawl-delay: fast\n",
    "zero.example": "User-agent: *\nCrawl-delay: 0\n",
}
AGENT = "c4bot"
WINDOW = 20
DEFAULT_Q = 10


def _robots_df(spark):
    return spark.createDataFrame(
        [(h, b) for h, b in sorted(BODIES.items())], "host string, rules string")


def test_delay_matches_robotparser(spark):
    got = {r.host: r.crawl_delay
           for r in crawl_delay_table(
               _robots_df(spark), user_agent=AGENT,
               window_s=WINDOW, default_quota=DEFAULT_Q).collect()}
    for host, body in BODIES.items():
        rp = urllib.robotparser.RobotFileParser()
        rp.parse(body.splitlines())
        want = rp.crawl_delay(AGENT)
        assert got[host] == (None if want is None else int(want)), host
    # the construction exercises every class
    assert got["plain.example"] == 5
    assert got["grouped.example"] == 4      # non-matching group skipped
    assert got["specific.example"] == 2     # our UA group beats *
    assert got["none.example"] is None
    assert got["malformed.example"] is None  # unparseable value ignored


def test_quota_math(spark):
    got = {r.host: r.quota
           for r in crawl_delay_table(
               _robots_df(spark), user_agent=AGENT,
               window_s=WINDOW, default_quota=DEFAULT_Q).collect()}
    assert got["plain.example"] == 4        # 20 // 5
    assert got["grouped.example"] == 5      # 20 // 4
    assert got["specific.example"] == 10    # 20 // 2 capped at default
    assert got["none.example"] == DEFAULT_Q
    assert got["zero.example"] == DEFAULT_Q  # delay 0 → unconstrained cap


def test_engine_honors_crawl_delay_quota(spark, tmp_path):
    from crawl4ai_spark.engine import CrawlConfig, SparkWebEngine
    from crawl4ai_spark.sources.pagesgen import (
        generate_pages,
        generate_seeds,
        host_name,
    )

    pages = generate_pages(spark, 2, 10)
    seeds = generate_seeds(spark, 2)
    # host0 asks for 10 s between requests → window 20 s → 2/generation
    robots = spark.createDataFrame(
        [(host_name(0),
          "User-agent: *\nCrawl-delay: 10\nDisallow:\n", 1735689600, "h0"),
         (host_name(1),
          "User-agent: *\nDisallow:\n", 1735689600, "h1")],
        ["host", "rules", "fetch_time", "hash"])

    cfg = CrawlConfig(max_depth=3, max_pages=40, respect_crawl_delay=True,
                      crawl_delay_window_s=20)
    eng = SparkWebEngine(spark, str(tmp_path / "s1"))
    eng.run(pages, seeds, robots=robots, config=cfg)
    per_gen = (eng.results().filter("success")
               .groupBy("host", "generation").count().collect())
    h0 = [r["count"] for r in per_gen if r.host == host_name(0)]
    h1 = [r["count"] for r in per_gen if r.host == host_name(1)]
    assert h0 and max(h0) <= 2, "host0 exceeded its Crawl-delay budget"
    assert h1 and max(h1) > 2, "host1 should be unconstrained"
    # the throttled host still completes its crawl, just over more gens
    assert sum(h0) == sum(h1)

    # flag off → default path unthrottled for host0
    eng2 = SparkWebEngine(spark, str(tmp_path / "s2"))
    eng2.run(pages, seeds, robots=robots,
             config=CrawlConfig(max_depth=3, max_pages=40))
    per_gen2 = (eng2.results().filter("success")
                .filter(F.col("host") == host_name(0))
                .groupBy("generation").count().collect())
    assert max(r["count"] for r in per_gen2) > 2
