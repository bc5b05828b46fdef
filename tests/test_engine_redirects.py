"""CrawlConfig.redirects e2e (ref CrawlResult.redirected_url,
models.py:151): scheduled URLs with a resolved-map entry fetch the landing
page's content under the ORIGINAL url with `redirected_url` set; targets
missing from pages 404 under the original; non-source rows are identical
to a run without redirects."""

import tempfile

from pyspark.sql import functions as F

from crawl4ai_spark.engine import CrawlConfig, SparkWebEngine
from crawl4ai_spark.sources.pagesgen import generate_pages, generate_seeds


def _run(spark, pages, seeds, redirects=None):
    eng = SparkWebEngine(spark, tempfile.mkdtemp(prefix="redir_"))
    cfg = CrawlConfig(max_depth=3, max_pages=60, per_host_quota=8,
                      check_robots_txt=False, redirects=redirects)
    return eng.run(pages, seeds, config=cfg)


def test_engine_redirects(spark):
    pages = generate_pages(spark, 3, 7).cache()
    seeds = generate_seeds(spark, 3)
    rmap = spark.createDataFrame(
        [("https://www.host0.com/p1", "https://www.host0.com/p2"),
         ("https://www.host1.com/p2", "https://www.host1.com/p9"),  # 404
         ("https://www.host2.com/p1", "https://www.host0.com/p3")],
        "src_url string, dst_url string")

    base = {r.url: r for r in _run(spark, pages, seeds).collect()}
    red = {r.url: r for r in _run(spark, pages, seeds, rmap).collect()}

    # same-host redirect: original url kept, landing content + marker
    r = red["https://www.host0.com/p1"]
    assert r.redirected_url == "https://www.host0.com/p2"
    assert r.success and r.text == base["https://www.host0.com/p2"].text

    # redirect to a missing page: 404 under the ORIGINAL url
    r = red["https://www.host1.com/p2"]
    assert r.status_code == 404 and not r.success

    # cross-host redirect: landing content from the other host
    r = red["https://www.host2.com/p1"]
    assert r.redirected_url == "https://www.host0.com/p3"
    assert r.success and r.text == base["https://www.host0.com/p3"].text

    # redirects change DISCOVERY (host1/p2's real subtree is only reachable
    # through the page we redirected away, so it legitimately disappears) —
    # but every non-source url crawled in BOTH runs must match row-for-row
    # with a NULL redirect marker
    sources = {row.src_url for row in rmap.collect()}
    shared = (set(red) & set(base)) - sources
    assert len(shared) >= 10
    for url in shared:
        row = red[url]
        assert row.redirected_url is None
        assert (row.status_code, row.success, row.text) == \
            (base[url].status_code, base[url].success, base[url].text)
    # host1's p2-subtree (p5/p6) is discoverable only through the
    # redirected-away page: present in base, absent in red
    assert "https://www.host1.com/p5" in base and \
        "https://www.host1.com/p5" not in red
