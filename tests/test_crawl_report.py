"""SparkWebEngine.report() — the per-host operational crawl card.
Asserted against the deterministic synthetic site's known structure:
the fully robots-blocked host shows up as 403s with zero successes,
outcome classes partition every host's crawled count, depth respects the
budget, and the totals reconcile with the raw results table."""

from pyspark.sql import functions as F

from crawl4ai_spark.engine import CrawlConfig, SparkWebEngine
from crawl4ai_spark.sources.pagesgen import (
    generate_pages,
    generate_robots,
    generate_seeds,
    host_name,
)

N_HOSTS, PPH, MAX_DEPTH = 4, 8, 2


def test_report_card(spark, tmp_path):
    pages = generate_pages(spark, N_HOSTS, PPH)
    seeds = generate_seeds(spark, N_HOSTS)
    robots = generate_robots(spark, N_HOSTS)
    eng = SparkWebEngine(spark, str(tmp_path / "s"))
    r = eng.run(pages, seeds, robots=robots,
                config=CrawlConfig(max_depth=MAX_DEPTH, max_pages=40))
    card = {row.host: row for row in eng.report().collect()}

    # the last host is fully robots-blocked (pagesgen.robots_rules):
    # everything it returned is a 403, nothing succeeded
    blocked = card[host_name(N_HOSTS - 1)]
    assert blocked.n_ok == 0
    assert blocked.n_robots_blocked == blocked.n_crawled > 0

    n_results = r.count()
    assert sum(c.n_crawled for c in card.values()) == n_results
    for c in card.values():
        # outcome classes partition the crawled set
        assert c.n_ok + c.n_robots_blocked + c.n_http_error == c.n_crawled
        assert c.max_depth <= MAX_DEPTH
        assert c.n_queued >= 0
        # successful pages on this site always carry links
        if c.n_ok:
            assert c.n_internal_links > 0

    # reconciles with the raw table per host, not just in total
    raw = {row.host: row.n for row in
           r.groupBy("host").agg(F.count("*").alias("n")).collect()}
    assert {h: c.n_crawled for h, c in card.items()} == raw
