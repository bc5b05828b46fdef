"""CrawlConfig.blocked_patterns e2e — the q_trap_detect composition: a
(host, digit-template) block-list gates the scheduler with one broadcast
left-anti join, so flagged URL spaces never spend crawl budget again.
Plus trap_patterns_from_results, the bridge that derives the block-list
from a discovery crawl's own results."""

import tempfile

from pyspark.sql import functions as F

from crawl4ai_spark.engine import CrawlConfig, SparkWebEngine
from crawl4ai_spark.ops.trapq import trap_patterns_from_results
from crawl4ai_spark.sources.pagesgen import generate_pages, generate_seeds


def _run(spark, pages, seeds, blocked=None):
    eng = SparkWebEngine(spark, tempfile.mkdtemp(prefix="trapgate_"))
    cfg = CrawlConfig(max_depth=3, max_pages=80, per_host_quota=8,
                      check_robots_txt=False, blocked_patterns=blocked)
    return eng.run(pages, seeds, config=cfg)


def test_blocked_patterns_gate(spark):
    pages = generate_pages(spark, 3, 7).cache()
    seeds = generate_seeds(spark, 3)
    base = {r.url for r in _run(spark, pages, seeds).collect()}
    # every page URL digit-templates to the same per-host pattern here, so
    # blocking host1's template removes exactly host1's pages
    blocked = spark.createDataFrame(
        [("www.host1.com", "https://www.host#.com/p#")],
        "host string, pattern string")
    gated = {r.url for r in _run(spark, pages, seeds, blocked).collect()}

    host1 = {u for u in base if "host1.com" in u}
    assert host1  # the gate actually removed something
    assert gated == base - host1
    # cross-host discoveries from host1 pages are gone too only if host1
    # was their sole path — everything remaining matched the ungated run
    assert not {u for u in gated if "host1.com" in u}


def test_blocked_patterns_none_is_identity(spark):
    pages = generate_pages(spark, 2, 7).cache()
    seeds = generate_seeds(spark, 2)
    a = {(r.url, r.status_code, r.success)
         for r in _run(spark, pages, seeds).collect()}
    b = {(r.url, r.status_code, r.success)
         for r in _run(spark, pages, seeds, None).collect()}
    assert a == b


def test_trap_patterns_from_results(spark):
    # hand-built results: a calendar trap (12 URLs, 3 distinct contents)
    # must flag; an article family (12 URLs, 12 contents) must not; a
    # narrow family (4 URLs) is under the audit width
    rows = []
    for i in range(12):
        rows.append(("www.t.com", f"https://www.t.com/cal/{2000 + i}/1",
                     f"cycle{i % 3}", True))
        rows.append(("www.t.com", f"https://www.t.com/article/{i}",
                     f"unique article body {i}", True))
    for i in range(4):
        rows.append(("www.t.com", f"https://www.t.com/list/{i}",
                     "same listing", True))
    rows.append(("www.t.com", "https://www.t.com/cal/9999/1", None, False))
    results = spark.createDataFrame(
        rows, "host string, url string, text string, success boolean")
    got = {(r.host, r.pattern)
           for r in trap_patterns_from_results(results).collect()}
    assert got == {("www.t.com", "https://www.t.com/cal/#/#")}


def test_two_phase_trap_defense_e2e(spark):
    """Discovery crawl → derive block-list from its OWN results → main
    crawl skips the flagged space. On the pagesgen site nothing is a trap
    (every page has distinct text), so the derived list must be EMPTY and
    the main crawl identical — the no-false-positive half of the claim."""
    pages = generate_pages(spark, 2, 7).cache()
    seeds = generate_seeds(spark, 2)
    disc = _run(spark, pages, seeds)
    bl = trap_patterns_from_results(disc)
    assert bl.count() == 0
    main = {r.url for r in _run(spark, pages, seeds, bl).collect()}
    assert main == {r.url for r in disc.collect()}
