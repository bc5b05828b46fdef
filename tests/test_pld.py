"""PLD politeness groups (ops/scheduling.py q_politeness_pld) — native
registrable-domain extraction parity with the goldened urls.base_domain,
and the budget-sharing property that defeats subdomain farms."""

from collections import defaultdict

from crawl4ai_spark.ops.scheduling import PLD_BUDGET, q_politeness_pld
from crawl4ai_spark.urls import base_domain

SF = "/root/testdata/sf0.001"


def test_native_pld_matches_base_domain(spark):
    rows = q_politeness_pld(spark, SF).collect()
    assert rows
    for r in rows:
        assert r.pld == base_domain(f"https://{r.host}/"), r.host


def test_farm_budget_is_shared(spark):
    rows = q_politeness_pld(spark, SF).collect()
    by_pld = defaultdict(list)
    for r in rows:
        by_pld[r.pld].append(r)

    farms = {p: rs for p, rs in by_pld.items() if p == "bigfarm.com"}
    singles = {p: rs for p, rs in by_pld.items() if p.startswith("site")}
    couk = {p: rs for p, rs in by_pld.items() if p.endswith(".co.uk")}
    assert farms and singles and couk

    for pld, rs in by_pld.items():
        n_hosts = len(rs)
        assert all(r.n_hosts == n_hosts for r in rs)
        want_quota = max(1, PLD_BUDGET // n_hosts)
        assert all(r.host_quota == want_quota for r in rs)
        # the farm's AGGREGATE budget never exceeds ~the single-host
        # budget: that is the property per-host politeness lacks
        assert n_hosts * want_quota <= max(PLD_BUDGET, n_hosts)

    # a www-stripped single-host domain keeps the full budget
    for rs in singles.values():
        assert rs[0].host.startswith("www.") and rs[0].host_quota == PLD_BUDGET

    # subdomain farms exist (several hosts under one registrable domain)
    assert any(len(rs) >= 4 for rs in farms.values())
    # co.uk-style second-level TLD keeps three labels
    for pld in couk:
        assert pld.count(".") == 2


def test_engine_pld_budget_splits_farm(spark, tmp_path):
    """A 3-subdomain farm under pld_budget=3 gets 1 fetch/host/generation
    while a single-host domain keeps the full per-host budget."""
    import datetime

    from pyspark.sql import functions as F

    from crawl4ai_spark.engine import CrawlConfig, SparkWebEngine

    ts = datetime.datetime(2025, 1, 1)
    mk = lambda body: f"<html><body>{body}</body></html>".encode()
    farm_hosts = [f"b{i}.farm.example" for i in range(3)]
    solo = "www.solo.example"
    rows = []
    links = "".join(
        f'<a href="https://{h}/p{k}">x</a>'
        for h in farm_hosts + [solo] for k in range(4))
    rows.append((f"https://{solo}/", ts, mk(links), "root", "en"))
    for h in farm_hosts + [solo]:
        for k in range(4):
            rows.append((f"https://{h}/p{k}", ts, mk(f"page {h} {k}"),
                         f"{h} {k}", "en"))
    pages = spark.createDataFrame(
        rows, "url string, warc_ts timestamp, html binary,"
        " text string, lang string")
    seeds = spark.createDataFrame([(f"https://{solo}/", 0.0)],
                                  ["url", "priority"])

    eng = SparkWebEngine(spark, str(tmp_path / "s1"))
    eng.run(pages, seeds,
            config=CrawlConfig(max_depth=2, max_pages=60, pld_budget=3,
                               include_external=True))
    per_gen = (eng.results().filter("success")
               .groupBy("host", "generation").count().collect())
    farm_counts = [r["count"] for r in per_gen if r.host in farm_hosts]
    solo_counts = [r["count"] for r in per_gen
                   if r.host == solo and r.generation > 0]
    assert farm_counts and max(farm_counts) <= 1   # 3-host farm → 1 each
    assert solo_counts and max(solo_counts) >= 3   # solo pld → full quota
    # the farm still completes — just over more generations
    got = {r.url for r in eng.results().filter("success")
           .select("url").collect()}
    for h in farm_hosts:
        assert {f"https://{h}/p{k}" for k in range(4)} <= got
