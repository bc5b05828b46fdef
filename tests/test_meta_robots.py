"""<meta name="robots"> enforcement (CrawlConfig.respect_meta_robots):
noindex/nofollow parsed in the scrape pass, nofollow pages contribute no
outlinks, noindex pages stay in results/WARC but leave the WET corpus."""

import tempfile

from pyspark.sql import functions as F

from crawl4ai_spark.engine import CrawlConfig, SparkWebEngine
from crawl4ai_spark.functions.udfs import _meta_robots


def test_meta_robots_parser():
    assert _meta_robots('<meta name="robots" content="noindex, follow">') \
        == (True, False)
    assert _meta_robots('<meta content="nofollow" name="robots">') \
        == (False, True)  # attribute order agnostic
    assert _meta_robots('<meta name="ROBOTS" content="NONE">') \
        == (True, True)   # none == noindex,nofollow; case-insensitive
    assert _meta_robots('<meta name="robots" content="noindex">'
                        '<meta name="robots" content="nofollow">') \
        == (True, True)   # multiple tags OR
    assert _meta_robots('<meta name="description" content="noindex">') \
        == (False, False)  # only the robots meta counts
    assert _meta_robots("<p>no meta at all</p>") == (False, False)


def _page(body_links, meta=""):
    links = "".join(f'<a href="{h}">link {h}</a>' for h in body_links)
    return (f"<html><head><title>t</title>{meta}</head>"
            f"<body><p>some body text here</p>{links}</body></html>").encode()


def _site(spark):
    base = "https://www.m.com"
    rows = [
        (f"{base}/", _page(["/b", "/c", "/e"])),
        (f"{base}/b", _page(["/d"],
                            '<meta name="robots" content="noindex, follow">')),
        (f"{base}/c", _page(["/x"],
                            '<meta content="nofollow" name="robots">')),
        (f"{base}/e", _page(["/y"],
                            '<meta content="none" name="robots">')),
        (f"{base}/d", _page([])),
        (f"{base}/x", _page([])),
        (f"{base}/y", _page([])),
    ]
    pages = spark.createDataFrame(rows, "url string, html binary")
    seeds = spark.createDataFrame([(f"{base}/", 0.0)], ["url", "priority"])
    return pages, seeds, base


def _run(spark, pages, seeds, **kw):
    eng = SparkWebEngine(spark, tempfile.mkdtemp(prefix="metarobots_"))
    cfg = CrawlConfig(max_depth=4, max_pages=50, check_robots_txt=False, **kw)
    return eng, eng.run(pages, seeds, config=cfg).cache()


def test_meta_robots_gate_e2e(spark, tmp_path):
    pages, seeds, base = _site(spark)
    _, res0 = _run(spark, pages, seeds)                 # ungated
    assert "noindex" not in res0.columns                # default unchanged
    assert {r.url for r in res0.filter("success").collect()} == {
        f"{base}/{p}" if p else f"{base}/"
        for p in ("", "b", "c", "e", "d", "x", "y")}

    eng, res = _run(spark, pages, seeds, respect_meta_robots=True)
    ok = {r.url: (r.noindex, r.nofollow)
          for r in res.filter("success").collect()}
    # nofollow (c) and none (e) pages were CRAWLED but their outlinks
    # (x, y) never entered the frontier; noindex-follow (b) still led to d
    assert set(ok) == {f"{base}/", f"{base}/b", f"{base}/c",
                       f"{base}/e", f"{base}/d"}
    assert ok[f"{base}/b"] == (True, False)
    assert ok[f"{base}/c"] == (False, True)
    assert ok[f"{base}/e"] == (True, True)
    assert ok[f"{base}/"] == (False, False)
    assert ok[f"{base}/d"] == (False, False)

    # WET excludes noindex pages; WARC keeps everything crawled
    from crawl4ai_spark.html.warc import parse_warc
    import glob

    wet_dir, warc_dir = str(tmp_path / "wet"), str(tmp_path / "warc")
    eng.export_wet(wet_dir, n_buckets=1)
    eng.export_warc(warc_dir, n_buckets=1)

    def uris(d, pat, typ):
        out = set()
        for p in glob.glob(f"{d}/{pat}"):
            with open(p, "rb") as fh:
                out |= {r["uri"] for r in parse_warc(fh.read())
                        if r["warc_type"] == typ}
        return out

    assert uris(wet_dir, "*.wet", "conversion") == {
        f"{base}/", f"{base}/c", f"{base}/d"}
    assert uris(warc_dir, "*.warc", "response") == set(ok)
