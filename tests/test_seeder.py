"""Seeder pipeline tests (S5/S6/F17/F18 parity points)."""

from pyspark.sql import functions as F

from crawl4ai_spark.sources.seeder import (
    NONSENSE_EXT_RE,
    _glob_to_regex,
    seed_urls,
    synthetic_cc_index,
)


def test_glob_translation():
    assert _glob_to_regex("*.example.com/*") == r"^.*\.example\.com/.*$"
    assert _glob_to_regex("a?c") == "^a.c$"


def test_cc_index_deterministic(spark):
    a = synthetic_cc_index(spark, 5, 20).collect()
    b = synthetic_cc_index(spark, 5, 20).collect()
    assert sorted(r.url for r in a) == sorted(r.url for r in b)
    assert len(a) == 100


def test_nonsense_filter_drops_assets(spark):
    seeds = synthetic_cc_index(spark, 5, 40)
    out = seed_urls(seeds)
    assert out.filter(F.col("url").rlike(NONSENSE_EXT_RE)).count() == 0
    assert out.filter(F.col("url").contains("wp-json")).count() == 0
    assert out.count() < seeds.count()  # something was filtered
    assert out.count() > 0


def test_pattern_filter_and_cap(spark):
    seeds = synthetic_cc_index(spark, 6, 30)
    out = seed_urls(seeds, pattern="https://www.site1.com/*", max_urls=5)
    rows = out.collect()
    assert 0 < len(rows) <= 5
    assert all(r.url.startswith("https://www.site1.com/") for r in rows)


def test_bm25_ranking_orders_relevant_first(spark):
    seeds = synthetic_cc_index(spark, 6, 40)
    q = "crawl spark"
    out = seed_urls(seeds, query=q, max_urls=10).collect()
    assert len(out) == 10
    scores = [r.score for r in out]
    assert scores == sorted(scores, reverse=True)
    assert scores[0] > 0
    # every positively scored row mentions a query term in its url/head
    top = out[0]
    assert "crawl" in top.url or "spark" in top.url


def test_sitemap_seeding_recurses_gz_and_robots(spark):
    """S6: robots Sitemap: lines are the roots, gz bodies decompress, nested
    sitemap indexes recurse, every leaf urlset URL is found exactly once
    (parity target async_url_seeder.py:765-1004)."""
    from crawl4ai_spark.sources.seeder import (
        parse_sitemap_blobs,
        seed_from_sitemaps,
        synthetic_sitemap_blobs,
    )

    blobs = synthetic_sitemap_blobs(spark, n_hosts=2, urls_per_host=9).cache()
    out = seed_from_sitemaps(spark, blobs).cache()
    urls = {r["url"] for r in out.collect()}
    # all 9 pages per host, including the ones only reachable through the
    # gzipped urlset (p3-p5) and the nested index (p6-p8)
    for h in range(2):
        for p in range(9):
            assert f"https://www.smap{h}.com/p{p}" in urls
    assert out.count() == 18  # no dupes
    # lastmod survives parsing
    assert out.filter(F.col("lastmod").rlike(r"^2025-")).count() == 18
    # robots parsing found the advertised index (not the /sitemap.xml probe)
    parsed = parse_sitemap_blobs(blobs)
    roots = {r["loc"] for r in parsed.filter("kind = 'robots'").collect()}
    assert roots == {f"https://www.smap{h}.com/sitemap_index.xml.gz" for h in range(2)}


def test_sitemap_namespace_agnostic(spark):
    """Namespaced and namespace-free sitemaps parse identically (mirror of
    the reference's tests/unit/test_sitemap_namespace_parsing.py)."""
    from crawl4ai_spark.sources.seeder import parse_sitemap_blobs

    ns = b'<?xml version="1.0"?><urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9"><url><loc>https://a.com/1</loc></url></urlset>'
    plain = b'<?xml version="1.0"?><urlset><url><loc>https://b.com/1</loc></url></urlset>'
    blobs = spark.createDataFrame(
        [("a.com", "https://a.com/s.xml", ns), ("b.com", "https://b.com/s.xml", plain)],
        "host string, url string, body binary")
    rows = parse_sitemap_blobs(blobs).collect()
    assert {r["loc"] for r in rows} == {"https://a.com/1", "https://b.com/1"}
    assert all(r["kind"] == "sitemap" for r in rows)


def test_cdx_parsing_gz_and_pattern(spark):
    """S5 real path: CDX JSONL responses (half gzipped) parse in one Arrow
    pass; glob pattern filters like the reference's _match."""
    from crawl4ai_spark.sources.seeder import (
        cc_index_glob,
        parse_cc_index_blobs,
        synthetic_cdx_blobs,
    )

    blobs = synthetic_cdx_blobs(spark, n_domains=4, urls_per_domain=12).cache()
    out = parse_cc_index_blobs(blobs).cache()
    assert out.count() == 48
    # gz domains (odd ids) parsed identically to plain ones
    per_dom = {r["domain"]: r["n"] for r in
               out.groupBy("domain").agg(F.count("*").alias("n")).collect()}
    assert set(per_dom.values()) == {12}
    # CDX fields survive
    row = out.filter(F.col("url") == "https://www.cdx0.com/a1/p1.html").first()
    assert row.status == "200" and row.mime == "text/html"
    assert row.warc_ts.startswith("202401")
    # glob filtering
    only_a0 = parse_cc_index_blobs(blobs, pattern="*/a0/*")
    assert only_a0.count() == 12  # 3 of 12 urls per domain are /a0/
    assert all(r["url"].count("/a0/") for r in only_a0.collect())

    # the reference's CC glob construction (reference-exact)
    assert cc_index_glob("https://example.com?x#y") == "*.example.com/*"
    assert cc_index_glob("example.com/path") == "*.example.com/path*"
    assert cc_index_glob(".example.com") == "*.example.com/*"


def test_cdx_to_seed_pipeline_with_url_relevance(spark):
    """S5→F17→F18 chain: parsed CDX records (no head text) flow through
    seed_urls, which scores them with the reference-exact URL-string
    relevance fallback."""
    from crawl4ai_spark.sources.seeder import (
        parse_cc_index_blobs,
        seed_urls,
        synthetic_cdx_blobs,
        url_relevance_score,
    )

    blobs = synthetic_cdx_blobs(spark, n_domains=3, urls_per_domain=12)
    seeds = parse_cc_index_blobs(blobs)          # url/domain/... no head_text
    out = seed_urls(seeds, query="cdx1 a2", max_urls=8).collect()
    assert 0 < len(out) <= 8
    scores = [r.score for r in out]
    assert scores == sorted(scores, reverse=True) and scores[0] > 0
    # spark-side scores equal the pure twin exactly
    for r in out:
        assert r.score == url_relevance_score("cdx1 a2", r.url)


def test_feed_seeding_autodiscovers_rss_atom_gz(spark):
    """RSS/Atom sibling of S6: HTML-head autodiscovery finds all three feed
    links (and not the stylesheet), RSS <item><link> text and Atom
    <entry><link rel=alternate href> both parse, gz bodies decompress, and
    every item URL lands exactly once."""
    from crawl4ai_spark.sources.seeder import (
        discover_feeds,
        seed_from_feeds,
        synthetic_feed_blobs,
    )

    blobs = synthetic_feed_blobs(spark, n_hosts=2, items_per_host=9).cache()
    feeds = {r["feed_url"] for r in discover_feeds(blobs).collect()}
    assert feeds == {
        f"https://www.feed{h}.com/{p}"
        for h in range(2)
        for p in ("feed.xml", "atom.xml", "archive.xml.gz")
    }
    out = seed_from_feeds(spark, blobs).cache()
    rows = out.collect()
    assert out.count() == 18
    urls = {r["url"] for r in rows}
    assert urls == {f"https://www.feed{h}.com/post/{i}"
                    for h in range(2) for i in range(9)}
    kinds = {r["url"]: r["feed_kind"] for r in rows}
    for h in range(2):
        assert kinds[f"https://www.feed{h}.com/post/4"] == "atom"
        assert kinds[f"https://www.feed{h}.com/post/7"] == "rss"  # via gz
    # Atom rel="self" service links never leak into the seed set
    assert not any(u.endswith("atom.xml") for u in urls)


def test_feed_seeding_dedups_syndicated_items(spark):
    """An item syndicated by several feeds survives once, keyed to the
    lexicographically first feed URL (deterministic winner)."""
    from crawl4ai_spark.sources.seeder import seed_from_feeds

    rss = (
        b'<?xml version="1.0"?><rss version="2.0"><channel>'
        b"<item><link>https://x.com/a</link>"
        b"<pubDate>d1</pubDate></item></channel></rss>"
    )
    atom = (
        b'<?xml version="1.0"?><feed xmlns="http://www.w3.org/2005/Atom">'
        b'<entry><link rel="alternate" href="https://x.com/a"/>'
        b"<updated>d2</updated></entry></feed>"
    )
    html = (
        b'<html><head>'
        b'<link rel="alternate" type="application/rss+xml" href="https://x.com/b.xml">'
        b'<link rel="alternate" type="application/atom+xml" href="https://x.com/a.xml">'
        b"</head></html>"
    )
    blobs = spark.createDataFrame(
        [("x.com", "https://x.com/", html),
         ("x.com", "https://x.com/b.xml", rss),
         ("x.com", "https://x.com/a.xml", atom)],
        "host string, url string, body binary")
    rows = seed_from_feeds(spark, blobs).collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r["url"], r["feed_url"], r["feed_kind"], r["published"]) == (
        "https://x.com/a", "https://x.com/a.xml", "atom", "d2")
