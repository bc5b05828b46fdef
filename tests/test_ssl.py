"""SSL certificate surface: the reference's `fetch_ssl_certificate` config
(async_configs.py:1298) attaches an SSLCertificate to each CrawlResult
(ssl_certificate.py:62-134, models.py:149). Fetch is simulated here, so the
handshake degrades to the deterministic per-host certs table joined onto
results as one `ssl` struct."""

from pyspark.sql import functions as F

from crawl4ai_spark.engine import CrawlConfig, SparkWebEngine
from crawl4ai_spark.sources.pagesgen import (
    generate_certs,
    generate_pages,
    generate_robots,
    generate_seeds,
    host_name,
)


def test_generate_certs_deterministic_and_gapped(spark):
    a = sorted(generate_certs(spark, 12).collect())
    b = sorted(generate_certs(spark, 12).collect())
    assert a == b
    hosts = {r.host for r in a}
    # hosts h ≡ 3 (mod 5), h>0 have no cert (handshake failure path)
    assert host_name(3) not in hosts and host_name(8) not in hosts
    assert host_name(0) in hosts and host_name(5) in hosts
    r0 = next(r for r in a if r.host == host_name(0))
    # reference field set (ssl_certificate.py:91-134)
    assert r0.subject_cn == host_name(0)
    assert r0.version == 2
    assert len(r0.fingerprint) == 64
    assert r0.not_before.endswith("Z") and len(r0.not_before) == 15
    assert r0.not_after > r0.not_before
    assert r0.san.startswith("DNS:")
    assert r0.raw_cert  # base64 pseudo-DER


def test_attach_ssl_fields_and_nulls(spark, tmp_path):
    pages = generate_pages(spark, 6, 5)
    seeds = generate_seeds(spark, 6)
    robots = generate_robots(spark, 6)
    certs = generate_certs(spark, 6)
    eng = SparkWebEngine(spark, str(tmp_path / "s"))
    out = eng.run(pages, seeds, robots=robots, certs=certs,
                  config=CrawlConfig(max_depth=2, max_pages=40,
                                     fetch_ssl_certificate=True))
    rows = out.collect()
    assert rows and "ssl" in out.columns
    for r in rows:
        h = r.host
        if h == host_name(3):            # no cert row → null struct
            assert r.ssl is None
        elif h and h.startswith("www.host"):
            assert r.ssl is not None
            assert r.ssl.subject.CN == h
            assert r.ssl.issuer.CN and r.ssl.issuer.O
            assert len(r.ssl.fingerprint) == 64
    # the certs join is enrichment only: the stored table is unchanged
    stored = eng.results()
    assert "ssl" not in stored.columns
    # disabled config → no ssl column on the returned frame either
    out2 = SparkWebEngine(spark, str(tmp_path / "s2")).run(
        pages, seeds, robots=robots, certs=certs,
        config=CrawlConfig(max_depth=1, max_pages=10))
    assert "ssl" not in out2.columns


def test_run_one_carries_certificate(spark, tmp_path):
    pages = generate_pages(spark, 2, 4)
    certs = generate_certs(spark, 2)
    eng = SparkWebEngine(spark, str(tmp_path / "s"))
    url = pages.select("url").orderBy("url").first().url
    row = eng.run_one(pages, url, certs=certs,
                      config=CrawlConfig(fetch_ssl_certificate=True)
                      ).first()
    assert row.ssl is not None and row.ssl.subject.CN == row.host
    # broadcast-join plan: the certs side must be a BroadcastExchange
    plan = eng.attach_ssl(eng.results(), certs)._jdf \
        .queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan
