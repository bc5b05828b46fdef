"""HTTP revalidation (conditional-GET re-crawl) tests: stored validators,
the 304 cache-reuse path, change detection, and WARC revisit records —
the engine realization of the fleet ops/refreshq.q_revisit_economics
prices.

run() returns the store's FULL accumulated results table (the cache), so
runs sharing a store are disambiguated by what only that run can produce:
304 rows (first revalidate run), or a 200 row carrying the mutated body's
content_md5."""

import hashlib

import pytest
from pyspark.sql import functions as F

from crawl4ai_spark.engine import CrawlConfig, SparkWebEngine
from crawl4ai_spark.sources.pagesgen import (
    generate_pages,
    generate_robots,
    generate_seeds,
)

N_HOSTS, PPH = 3, 8

# inserted before </body> so the victim page's LINKS survive the edit —
# replacing the whole body would orphan the pages it links to and shrink
# the re-crawl's reachable set, which is a crawl-graph effect, not a
# revalidation one
EDIT_SNIPPET = "<p>freshly edited: volcanoes and tide tables.</p>"


@pytest.fixture(scope="module")
def pages(spark):
    df = generate_pages(spark, n_hosts=N_HOSTS, pages_per_host=PPH).cache()
    df.count()
    return df


def _crawl(spark, store, pages, **cfg_kwargs):
    eng = SparkWebEngine(spark, store)
    seeds = generate_seeds(spark, n_hosts=N_HOSTS)
    robots = generate_robots(spark, n_hosts=N_HOSTS)
    cfg = CrawlConfig(max_depth=2, max_pages=40, **cfg_kwargs)
    res = eng.run(pages, seeds, robots=robots, config=cfg)
    return eng, res.cache()


def _mutate(pages, victim):
    """Edit the victim's body in place (links preserved); return the new
    pages table and the mutated bytes' md5."""
    edited = F.encode(
        F.regexp_replace(F.col("html").cast("string"),
                         "</body>", EDIT_SNIPPET + "</body>"),
        "utf-8")
    pages2 = pages.withColumn(
        "html",
        F.when(F.col("url") == victim, edited).otherwise(F.col("html")))
    blob = bytes(pages2.filter(F.col("url") == victim)
                 .select("html").collect()[0][0])
    assert EDIT_SNIPPET.encode() in blob
    return pages2, hashlib.md5(blob).hexdigest(), blob


def test_validators_stored_and_match_native_md5(spark, pages, tmp_store):
    """store_validators=True: every fetched row carries content_md5 equal
    to the JVM-native F.md5 of the page bytes (the python hash inside the
    Arrow pass and the engine's comparison hash must be the same
    function or the gate never hits)."""
    _, res = _crawl(spark, tmp_store, pages, store_validators=True)
    ok = res.filter("success")
    assert ok.count() > 0
    bad = (ok.select("url", "content_md5")
           .join(pages.select("url", F.md5("html").alias("m")), "url")
           .filter("content_md5 != m").count())
    assert bad == 0
    # failure rows (404/403) carry no validator
    assert res.filter("NOT success AND content_md5 IS NOT NULL").count() == 0


def test_default_path_has_no_validator_column(spark, pages, tmp_store):
    """Gating discipline: the default config's result schema is unchanged."""
    _, res = _crawl(spark, tmp_store, pages)
    assert "content_md5" not in res.columns


def test_revalidate_unchanged_pages_serve_304_from_cache(spark, pages,
                                                         tmp_store):
    """Re-crawl over an unchanged web: every previously-successful url
    comes back 304 with the CACHED processed columns. Proof it came from
    the cache and not a silent re-process: the re-crawl runs with a
    DIFFERENT content_filter, which would change fit_markdown if the body
    re-entered the scrape stage."""
    _, res1 = _crawl(spark, tmp_store, pages, store_validators=True)
    ok1 = {r["url"]: r for r in res1.filter("success").collect()}

    _, res2 = _crawl(spark, tmp_store, pages, revalidate=True,
                     content_filter="bm25", bm25_query="zebra quark")
    rows304 = {r["url"]: r for r in
               res2.filter("status_code = 304").collect()}

    assert set(rows304) == set(ok1)
    for url, r1 in ok1.items():
        r2 = rows304[url]
        assert r2["success"]
        assert r2["text"] == r1["text"]
        assert r2["markdown"] == r1["markdown"]  # incl. fit_markdown
        assert r2["links"] == r1["links"]
        assert r2["content_md5"] == r1["content_md5"]


def test_revalidate_detects_changed_pages(spark, pages, tmp_store):
    """Mutate one page between crawls: its validator mismatches, so it is
    re-processed fresh (200, new content); everything else 304s."""
    _, res1 = _crawl(spark, tmp_store, pages, store_validators=True)
    ok1 = res1.filter("success")
    victim = ok1.orderBy("url").limit(1).collect()[0]["url"]

    pages2, new_md5, _ = _mutate(pages, victim)
    _, res2 = _crawl(spark, tmp_store, pages2, revalidate=True)
    vrows = res2.filter((F.col("url") == victim)
                        & (F.col("content_md5") == new_md5)).collect()
    assert len(vrows) == 1 and vrows[0]["status_code"] == 200
    assert "volcanoes" in vrows[0]["text"]
    # every OTHER previously-successful url revalidated to 304
    assert res2.filter("status_code = 304").count() == ok1.count() - 1
    # a third crawl now 304s the victim against its UPDATED validator
    _, res3 = _crawl(spark, tmp_store, pages2, revalidate=True)
    v3 = res3.filter((F.col("url") == victim)
                     & (F.col("status_code") == 304)).collect()
    assert len(v3) == 1
    assert v3[0]["text"] == vrows[0]["text"]
    assert v3[0]["content_md5"] == new_md5


def test_warc_revisit_records(spark, pages, tmp_store, tmp_path):
    """Re-crawl → export_warc: 304 rows become revisit records whose
    WARC-Refers-To resolves to the base export's response record ids; the
    one changed page is the only response record — unchanged payload
    bytes are written exactly once across the two exports."""
    from crawl4ai_spark.html.warc import parse_warc

    eng1, res1 = _crawl(spark, tmp_store, pages, store_validators=True)
    victim = res1.filter("success").orderBy("url").limit(1) \
                 .collect()[0]["url"]
    base_dir = str(tmp_path / "base")
    eng1.export_warc(base_dir, n_buckets=2, results=res1)

    pages2, new_md5, new_blob = _mutate(pages, victim)
    eng2, res2 = _crawl(spark, tmp_store, pages2, revalidate=True)
    # this run's rows: its 304 verdicts + the fresh row for the mutation
    delta2 = res2.filter(
        (F.col("status_code") == 304)
        | ((F.col("url") == victim) & (F.col("content_md5") == new_md5)))
    recrawl_dir = str(tmp_path / "recrawl")
    man = eng2.export_warc(recrawl_dir, n_buckets=2, results=delta2,
                           pages=pages2)
    assert man.count() > 0

    def recs_of(d):
        import glob
        out = []
        for p in sorted(glob.glob(d + "/segment-*.warc")):
            with open(p, "rb") as fh:
                out += parse_warc(fh.read())
        return out

    base = {r["uri"]: r for r in recs_of(base_dir)
            if r["warc_type"] == "response"}
    rec2 = recs_of(recrawl_dir)
    revisits = [r for r in rec2 if r["warc_type"] == "revisit"]
    assert len(revisits) == res2.filter("status_code = 304").count() > 0
    for rv in revisits:
        ref = base[rv["uri"]]
        assert rv["refers_to"] == ref["record_id"]
        assert rv["status"] == 304
        assert rv["payload"] == b""
        assert rv["payload_digest"] == \
            "md5:" + hashlib.md5(ref["payload"]).hexdigest()
        assert "identical-payload-digest" in rv["profile"]
    # exactly one body crossed the wire: the changed page
    resp2 = [r for r in rec2 if r["warc_type"] == "response"]
    assert [r["uri"] for r in resp2] == [victim]
    assert resp2[0]["payload"] == new_blob


def test_stream_revalidate_matches_batch(spark, pages, tmp_store,
                                         tmp_path_factory):
    """Streaming admission: re-fetched pages arriving over >= 2
    micro-batches, verdicted against the validator index a
    store_validators crawl persisted, must equal the batch verdict set
    (not_modified / modified / new) computed directly."""
    import time

    from crawl4ai_spark.streaming.stream import run_revalidate_stream

    root = str(tmp_path_factory.mktemp("reval_stream"))
    _, res1 = _crawl(spark, tmp_store, pages, store_validators=True)
    res1.filter("success").select("url", "content_md5") \
        .write.parquet(f"{root}/validators")

    victim = res1.filter("success").orderBy("url").limit(1) \
                 .collect()[0]["url"]
    pages2, new_md5, _ = _mutate(pages, victim)
    # add one never-seen url so the 'new' verdict is exercised
    extra = spark.createDataFrame(
        [("https://www.host9.com/brand-new", b"<html><body>n</body></html>")],
        "url string, html binary")
    feed = pages2.select("url", "html").unionByName(extra).cache()

    feed.filter(F.pmod(F.xxhash64("url"), F.lit(2)) == 0).coalesce(1) \
        .write.parquet(f"{root}/feed/a")
    time.sleep(1.1)  # file-source ordering is by modification time
    feed.filter(F.pmod(F.xxhash64("url"), F.lit(2)) == 1).coalesce(1) \
        .write.parquet(f"{root}/feed/b")

    q = run_revalidate_stream(
        spark, f"{root}/feed/*", f"{root}/validators", f"{root}/verdicts")
    assert q.lastProgress["batchId"] >= 1  # really ran >= 2 micro-batches

    got = {r.url: (r.verdict, r.content_md5)
           for r in spark.read.parquet(f"{root}/verdicts").collect()}
    vset = {r.url: r.content_md5
            for r in spark.read.parquet(f"{root}/validators").collect()}
    want = {}
    for r in feed.withColumn("m", F.md5("html")) \
                 .select("url", "m").collect():
        if r.url in vset and vset[r.url] == r.m:
            want[r.url] = ("not_modified", r.m)
        elif r.url in vset:
            want[r.url] = ("modified", r.m)
        else:
            want[r.url] = ("new", r.m)
    assert got == want
    assert want[victim][0] == "modified"
    assert want["https://www.host9.com/brand-new"][0] == "new"
    assert sum(1 for v, _ in got.values() if v == "not_modified") > 0
