"""WARC writer/parser roundtrip (html/warc.py) + the warc_roundtrip query.
The parser must recover every framed field, reject corrupt framing, and
the query must match the construction-derived oracle (covered by
test_ops_parity); here: byte-level unit coverage."""

import pytest

from crawl4ai_spark.html.warc import (
    SOFTWARE,
    WARC_VERSION,
    build_warc,
    parse_warc,
)

DATE = "2025-01-01T00:00:00Z"


def _recs():
    return [
        {"uri": "https://a.example/x", "body": b"hello world",
         "status": 200, "content_type": "text/html; charset=utf-8"},
        {"uri": "https://b.example/y", "body": b"",
         "status": 404, "content_type": "text/plain"},
        {"uri": "https://c.example/z", "body": b"\r\n\r\nbinary\x00ish",
         "status": 200, "content_type": "application/octet-stream"},
    ]


def test_roundtrip_fields():
    blob = build_warc(_recs(), date=DATE)
    parsed = parse_warc(blob)
    assert parsed[0]["warc_type"] == "warcinfo"
    resp = [r for r in parsed if r["warc_type"] == "response"]
    assert [r["uri"] for r in resp] == [r["uri"] for r in _recs()]
    assert [r["status"] for r in resp] == [200, 404, 200]
    # payloads byte-identical, including the one embedding CRLFCRLF
    assert [r["payload"] for r in resp] == [r["body"] for r in _recs()]
    assert all(r["date"] == DATE for r in parsed)
    assert blob.decode("latin-1").startswith(WARC_VERSION)
    assert SOFTWARE in blob.decode("latin-1")


def test_record_ids_deterministic():
    b1 = build_warc(_recs(), date=DATE)
    b2 = build_warc(_recs(), date=DATE)
    assert b1 == b2
    ids = [r["record_id"] for r in parse_warc(b1)]
    assert len(set(ids)) == len(ids)
    assert all(i.startswith("urn:uuid:") for i in ids)


def test_corrupt_framing_rejected():
    blob = build_warc(_recs(), date=DATE)
    with pytest.raises(ValueError):
        parse_warc(blob[10:])  # version line destroyed
    # truncating the trailer breaks the Content-Length walk
    with pytest.raises((ValueError, IndexError)):
        parse_warc(blob[:-3])


def test_warc_query_shape(spark):
    from crawl4ai_spark.ops.warcq import WARC_BATCH, q_warc_roundtrip

    out = q_warc_roundtrip(spark, "/root/testdata/sf0.001").toPandas()
    assert len(out) == 500
    assert (out.groupby("bucket")["n_records"].first() <= WARC_BATCH).all()
    assert (out["status"] == 200).all()


def test_pages_from_warc_feeds_the_engine(spark, tmp_path):
    """The ingestion loop: pagesgen pages → WARC segments on disk →
    pages_from_warc → a crawl over the WARC-sourced pages returns the
    same result set as the same crawl over the original pages table."""
    from pyspark.sql import functions as F

    from crawl4ai_spark.engine import CrawlConfig, SparkWebEngine
    from crawl4ai_spark.sources.pagesgen import (
        generate_pages,
        generate_robots,
        generate_seeds,
    )
    from crawl4ai_spark.sources.rawpages import pages_from_warc

    pages = generate_pages(spark, 3, 8)
    rows = pages.select("url", "warc_ts", "html").collect()
    seg_dir = tmp_path / "segments"
    seg_dir.mkdir()
    for seg in range(3):  # 3 multi-record segments
        recs = [{"uri": r.url, "body": bytes(r.html), "status": 200,
                 "content_type": "text/html; charset=utf-8"}
                for i, r in enumerate(rows) if i % 3 == seg]
        blob = build_warc(recs, date="2025-01-01T00:00:00Z")
        (seg_dir / f"seg{seg}.warc").write_bytes(blob)

    warc_pages = pages_from_warc(spark, str(seg_dir / "*.warc"))
    assert warc_pages.count() == pages.count()
    # byte-identical bodies per url
    a = {r.url: bytes(r.html) for r in pages.select("url", "html").collect()}
    b = {r.url: bytes(r.html)
         for r in warc_pages.select("url", "html").collect()}
    assert a == b

    seeds = generate_seeds(spark, 3)
    robots = generate_robots(spark, 3)
    cfg = CrawlConfig(max_depth=2, max_pages=30)
    r1 = SparkWebEngine(spark, str(tmp_path / "s1")) \
        .run(pages, seeds, robots=robots, config=cfg)
    r2 = SparkWebEngine(spark, str(tmp_path / "s2")) \
        .run(warc_pages, seeds, robots=robots, config=cfg)
    k1 = {(r.url, r.status_code) for r in
          r1.select("url", "status_code").collect()}
    k2 = {(r.url, r.status_code) for r in
          r2.select("url", "status_code").collect()}
    assert k1 == k2 and k1


def test_stream_pages_from_warc_matches_batch(spark, tmp_path):
    """Streaming segment ingestion must surface the identical pages rows
    as the batch WARC source over the same directory."""
    from crawl4ai_spark.sources.pagesgen import generate_pages
    from crawl4ai_spark.sources.rawpages import pages_from_warc
    from crawl4ai_spark.streaming.stream import (
        run_stream_to_memory,
        stream_pages_from_warc,
    )

    pages = generate_pages(spark, 2, 6)
    rows = pages.select("url", "html").collect()
    seg_dir = tmp_path / "segments"
    seg_dir.mkdir()
    for seg in range(2):
        recs = [{"uri": r.url, "body": bytes(r.html), "status": 200,
                 "content_type": "text/html; charset=utf-8"}
                for i, r in enumerate(rows) if i % 2 == seg]
        (seg_dir / f"seg{seg}.warc").write_bytes(
            build_warc(recs, date="2025-01-01T00:00:00Z"))

    out = stream_pages_from_warc(spark, str(seg_dir))
    run_stream_to_memory(out.select("url", "html"), "stream_warc_t")
    got = {r.url: bytes(r.html)
           for r in spark.sql("SELECT * FROM stream_warc_t").collect()}
    want = {r.url: bytes(r.html)
            for r in pages_from_warc(
                spark, str(seg_dir / "*.warc")).collect()}
    assert got == want and len(got) == len(rows)


def test_engine_warc_sink_roundtrip(spark, tmp_path):
    """S12 write side (r5): a crawl with sink='warc' emits deterministic
    segments; pages_from_warc over them feeds an identical re-crawl."""
    from crawl4ai_spark.engine import CrawlConfig, SparkWebEngine
    from crawl4ai_spark.sources.pagesgen import (
        generate_pages,
        generate_robots,
        generate_seeds,
    )
    from crawl4ai_spark.sources.rawpages import pages_from_warc

    pages = generate_pages(spark, 3, 8)
    seeds = generate_seeds(spark, 3)
    robots = generate_robots(spark, 3)
    seg_dir = tmp_path / "segments"
    cfg = CrawlConfig(max_depth=2, max_pages=30, sink="warc",
                      sink_dir=str(seg_dir), sink_buckets=4)
    eng = SparkWebEngine(spark, str(tmp_path / "s1"))
    r1 = eng.run(pages, seeds, robots=robots, config=cfg)
    segs = sorted(p.name for p in seg_dir.glob("*.warc"))
    assert segs, "sink wrote no segments"

    # manifest is deterministic: re-export produces identical digests
    m1 = {(r.bucket, r.sha256, r.n_records) for r in
          eng.export_warc(str(tmp_path / "again"), pages=pages,
                          n_buckets=4).collect()}
    m2 = {(r.bucket, r.sha256, r.n_records) for r in
          eng.export_warc(str(tmp_path / "again2"), pages=pages,
                          n_buckets=4).collect()}
    assert m1 == m2

    # archived bodies are byte-identical to the fetched corpus subset
    warc_pages = pages_from_warc(spark, str(seg_dir / "*.warc"))
    a = {r.url: bytes(r.html) for r in pages.select("url", "html").collect()}
    for r in warc_pages.select("url", "html").collect():
        assert bytes(r.html) == a[r.url]

    # re-crawl over the archive reproduces the result set exactly
    r2 = SparkWebEngine(spark, str(tmp_path / "s2")).run(
        warc_pages, seeds, robots=robots,
        config=CrawlConfig(max_depth=2, max_pages=30))
    k1 = {(r.url, r.status_code, r.success) for r in
          r1.select("url", "status_code", "success").collect()}
    k2 = {(r.url, r.status_code, r.success) for r in
          r2.select("url", "status_code", "success").collect()}
    assert k1 == k2 and k1


def test_engine_wet_sink_roundtrip(spark, tmp_path):
    """WET write side (late r5): a crawl with sink='wet' emits extracted-
    text conversion segments; texts_from_wet reads back text byte-identical
    per url to the crawl's own results."""
    from crawl4ai_spark.engine import CrawlConfig, SparkWebEngine
    from crawl4ai_spark.sources.pagesgen import generate_pages, generate_seeds
    from crawl4ai_spark.sources.rawpages import texts_from_wet

    pages = generate_pages(spark, 3, 8)
    seeds = generate_seeds(spark, 3)
    seg_dir = tmp_path / "wet"
    cfg = CrawlConfig(max_depth=2, max_pages=30, check_robots_txt=False,
                      sink="wet", sink_dir=str(seg_dir), sink_buckets=4)
    eng = SparkWebEngine(spark, str(tmp_path / "s1"))
    r1 = eng.run(pages, seeds, config=cfg)
    segs = sorted(p.name for p in seg_dir.glob("*.warc.wet"))
    assert segs, "wet sink wrote no segments"

    # manifest deterministic across re-exports
    m1 = {(r.bucket, r.sha256, r.n_records) for r in
          eng.export_wet(str(tmp_path / "a1"), n_buckets=4).collect()}
    m2 = {(r.bucket, r.sha256, r.n_records) for r in
          eng.export_wet(str(tmp_path / "a2"), n_buckets=4).collect()}
    assert m1 == m2

    # readback: every successful result's text byte-identical, 1:1
    want = {r.url: r.text for r in
            r1.filter("success and text is not null")
              .select("url", "text").collect()}
    got = {r.url: r.text for r in
           texts_from_wet(spark, str(seg_dir / "*.warc.wet"))
           .select("url", "text").collect()}
    assert got == want and len(got) > 5


def test_wat_roundtrip_fields():
    """WAT metadata records: canonical-JSON payload survives the framing
    roundtrip and the refers-to linkage points at the sibling WARC
    response ids."""
    import json

    from crawl4ai_spark.html.warc import build_wat

    recs = [{"uri": r["uri"],
             "meta": {"Envelope": {
                 "Format": "WARC",
                 "Payload-Metadata": {"Entity-Length": len(r["body"])},
                 "WARC-Header-Metadata": {"WARC-Target-URI": r["uri"]}}}}
            for r in _recs()]
    blob = build_wat(recs, date=DATE)
    parsed = parse_warc(blob)
    assert parsed[0]["warc_type"] == "warcinfo"
    md = [r for r in parsed if r["warc_type"] == "metadata"]
    assert [r["uri"] for r in md] == [r["uri"] for r in recs]
    assert all(r["content_type"] == "application/json" for r in md)
    for r, src in zip(md, recs):
        env = json.loads(r["payload"])
        assert env == src["meta"]
        # canonical: compact separators, sorted keys — re-dump is identical
        assert r["payload"] == json.dumps(
            env, sort_keys=True, separators=(",", ":")).encode()
    # refers-to = the WARC response ids build_warc emits for the same uris
    warc_ids = {r["uri"]: r["record_id"]
                for r in parse_warc(build_warc(_recs(), date=DATE))
                if r["warc_type"] == "response"}
    assert all(r["refers_to"] == warc_ids[r["uri"]] for r in md)


def test_wat_deterministic():
    from crawl4ai_spark.html.warc import build_wat

    recs = [{"uri": "https://a.example/x",
             "meta": {"b": 1, "a": {"z": [2, 3], "y": "s"}}}]
    assert build_wat(recs, date=DATE) == build_wat(recs, date=DATE)
