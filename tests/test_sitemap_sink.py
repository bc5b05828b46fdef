"""Sitemap EMIT side (html/sitemap.py + engine.export_sitemaps): the
crawl's re-seed artifact. The reference's seeder only consumes sitemaps
(async_url_seeder.py:461-520); our engine also produces them, and the
roundtrip is closed against OUR OWN seeder: crawl → export_sitemaps →
seed_from_sitemaps over the emitted blobs == the crawl's successful URL
set — through both the single-urlset and the sharded-index forms."""

import pytest

from crawl4ai_spark.html.sitemap import (
    MAX_URLS_PER_SITEMAP,
    build_sitemap_index,
    build_urlset,
)


def test_build_urlset_canonical():
    blob = build_urlset(["https://h/b?x=1&y=2", "https://h/a"],
                        lastmod="2026-01-01")
    text = blob.decode("utf-8")
    # sorted, escaped, one line per element, framed
    assert text.splitlines() == [
        '<?xml version="1.0" encoding="UTF-8"?>',
        '<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">',
        "<url><loc>https://h/a</loc><lastmod>2026-01-01</lastmod></url>",
        "<url><loc>https://h/b?x=1&amp;y=2</loc>"
        "<lastmod>2026-01-01</lastmod></url>",
        "</urlset>",
    ]
    # deterministic regardless of input order
    assert blob == build_urlset(["https://h/a", "https://h/b?x=1&y=2"],
                                lastmod="2026-01-01")


def test_build_urlset_enforces_protocol_cap():
    with pytest.raises(ValueError):
        build_urlset([f"https://h/{i}" for i in
                      range(MAX_URLS_PER_SITEMAP + 1)])


def _blobs_df(spark, manifest_rows):
    rows = []
    for r in manifest_rows:
        with open(r.path, "rb") as fh:
            rows.append((r.host, r.url, bytearray(fh.read())))
    return spark.createDataFrame(rows, "host string, url string, body binary")


def test_engine_sitemap_sink_roundtrip(spark, tmp_path):
    from crawl4ai_spark.engine import CrawlConfig, SparkWebEngine
    from crawl4ai_spark.sources.pagesgen import generate_pages, generate_seeds
    from crawl4ai_spark.sources.seeder import seed_from_sitemaps

    pages = generate_pages(spark, 3, 8)
    seeds = generate_seeds(spark, 3)
    sm_dir = tmp_path / "sitemaps"
    cfg = CrawlConfig(max_depth=2, max_pages=30, check_robots_txt=False,
                      sink="sitemap", sink_dir=str(sm_dir))
    eng = SparkWebEngine(spark, str(tmp_path / "s1"))
    r1 = eng.run(pages, seeds, config=cfg)
    files = sorted(p.name for p in sm_dir.rglob("sitemap*.xml"))
    assert files, "sitemap sink wrote no files"

    # manifest deterministic across re-exports
    m1 = {(r.host, r.url, r.kind, r.n_urls, r.sha256) for r in
          eng.export_sitemaps(str(tmp_path / "a1")).collect()}
    m2 = {(r.host, r.url, r.kind, r.n_urls, r.sha256) for r in
          eng.export_sitemaps(str(tmp_path / "a2")).collect()}
    assert m1 == m2

    # roundtrip through OUR OWN seeder: the /sitemap.xml convention probe
    # finds the emitted urlsets and resolves exactly the crawled URL set
    manifest = eng.export_sitemaps(str(tmp_path / "rt")).collect()
    seeded = seed_from_sitemaps(spark, _blobs_df(spark, manifest))
    want = {r.url for r in r1.filter("success").select("url").collect()}
    got = {r.url for r in seeded.select("url").collect()}
    assert got == want and len(got) > 5


def test_export_sitemaps_sharded_index(spark, tmp_path):
    """Over-cap hosts shard: urlset files + a sitemap.xml index; the
    seeder recurses through the index to the identical URL set."""
    from crawl4ai_spark.engine import CrawlConfig, SparkWebEngine
    from crawl4ai_spark.sources.pagesgen import generate_pages, generate_seeds
    from crawl4ai_spark.sources.seeder import seed_from_sitemaps

    pages = generate_pages(spark, 2, 10)
    seeds = generate_seeds(spark, 2)
    eng = SparkWebEngine(spark, str(tmp_path / "s1"))
    r1 = eng.run(pages, seeds,
                 config=CrawlConfig(max_depth=2, max_pages=40,
                                    check_robots_txt=False))
    manifest = eng.export_sitemaps(str(tmp_path / "sh"),
                                   shard_size=3).collect()
    kinds = {r.kind for r in manifest}
    assert kinds == {"urlset", "sitemapindex"}
    # every shard honors the configured size
    assert all(r.n_urls <= 3 for r in manifest if r.kind == "urlset")

    seeded = seed_from_sitemaps(spark, _blobs_df(spark, manifest))
    want = {r.url for r in r1.filter("success").select("url").collect()}
    got = {r.url for r in seeded.select("url").collect()}
    assert got == want and len(got) > 3
