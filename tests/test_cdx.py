"""CDX index emission (html/warc.py build_cdx + ops/warcq.py cdx_emit +
engine export_warc(cdx=True)) — the publishing side of the CC-index
seeder's read path (sources/seeder.py parse_cc_index_blobs).

The load-bearing property: ``offset``/``length`` are MEASURED from the
framing walk, so seeking to ``offset`` and reading ``length`` bytes out
of the real segment file must yield exactly one parseable WARC record
for the entry's url — verified record-by-record below.
"""

import hashlib
import json

from crawl4ai_spark.html.warc import build_cdx, build_warc, cdx_jsonl, parse_warc

DATE = "2025-01-01T00:00:00Z"


def _recs():
    return [
        {"uri": "https://www.b.example/y?q=1", "body": b"second host",
         "status": 404, "content_type": "text/plain"},
        {"uri": "https://a.example/x", "body": b"hello world" * 40,
         "status": 200, "content_type": "text/html; charset=utf-8"},
        {"uri": "https://a.example/a", "body": b"",
         "status": 200, "content_type": "application/octet-stream"},
    ]


def test_offsets_random_access():
    blob = build_warc(_recs(), date=DATE)
    entries = build_cdx(blob, "seg.warc")
    assert len(entries) == 3
    for e in entries:
        off, ln = int(e["offset"]), int(e["length"])
        rec = parse_warc(blob[off:off + ln])
        assert len(rec) == 1 and rec[0]["uri"] == e["url"]
        assert rec[0]["status"] == int(e["status"])
        assert hashlib.md5(rec[0]["payload"]).hexdigest() == e["digest"]
    # offsets partition the segment: sorted by offset they tile the blob
    by_off = sorted(entries, key=lambda e: int(e["offset"]))
    end = int(by_off[0]["offset"])  # first response starts after warcinfo
    assert end > 0
    for e in by_off:
        assert int(e["offset"]) == end
        end += int(e["length"])
    assert end == len(blob)


def test_cdx_sorted_by_urlkey_and_fields():
    blob = build_warc(_recs(), date=DATE)
    entries = build_cdx(blob, "seg.warc")
    keys = [e["urlkey"] for e in entries]
    assert keys == sorted(keys)
    assert keys[0].startswith("example,a)/")          # a.example first
    assert "example,b,www)/y?q=1" in keys[-1]          # query kept in urlkey
    assert all(e["timestamp"] == "20250101000000" for e in entries)
    assert {e["mime"] for e in entries} == {
        "text/plain", "text/html", "application/octet-stream"}
    assert all(e["filename"] == "seg.warc" for e in entries)


def test_cdx_jsonl_canonical():
    blob = build_warc(_recs(), date=DATE)
    entries = build_cdx(blob, "seg.warc")
    text = cdx_jsonl(entries)
    lines = text.splitlines()
    assert len(lines) == 3 and text.endswith("\n")
    for line, e in zip(lines, entries):
        assert json.loads(line) == e
        # canonical: sorted keys, compact separators — byte-reproducible
        assert line == json.dumps(e, sort_keys=True, separators=(",", ":"))


def test_revisit_records_not_indexed():
    recs = _recs() + [{
        "uri": "https://a.example/x", "revisit": True,
        "payload_digest": hashlib.md5(b"hello world" * 40).hexdigest()}]
    entries = build_cdx(build_warc(recs, date=DATE), "seg.warc")
    assert len(entries) == 3  # responses only


def test_engine_cdx_sidecar_reseeds_the_crawl(spark, tmp_path):
    """Close the publish → re-seed loop against our OWN read path: crawl
    with WARC sink + CDX sidecars, feed the sidecar JSONL to the CC-index
    seeder's parse_cc_index_blobs, and recover exactly the archived url
    set; spot-check offset random access against the on-disk segments."""
    from crawl4ai_spark.engine import CrawlConfig, SparkWebEngine
    from crawl4ai_spark.sources.pagesgen import (
        generate_pages,
        generate_robots,
        generate_seeds,
    )
    from crawl4ai_spark.sources.seeder import parse_cc_index_blobs

    pages = generate_pages(spark, 3, 8)
    seeds = generate_seeds(spark, 3)
    robots = generate_robots(spark, 3)
    seg_dir = tmp_path / "segments"
    eng = SparkWebEngine(spark, str(tmp_path / "s1"))
    eng.run(pages, seeds, robots=robots,
            config=CrawlConfig(max_depth=2, max_pages=30))
    eng.export_warc(str(seg_dir), pages=pages, n_buckets=4, cdx=True)

    segs = sorted(seg_dir.glob("*.warc"))
    idxs = sorted(seg_dir.glob("*.warc.cdx.jsonl"))
    assert segs and len(idxs) == len(segs)

    # sidecar → seeder: the CC read path recovers the archived url set
    blobs = spark.createDataFrame(
        [(p.name, p.read_bytes()) for p in idxs], "domain string, body binary")
    seeded = parse_cc_index_blobs(blobs)
    got = {r.url for r in seeded.select("url").collect()}
    want = set()
    for p in segs:
        for r in parse_warc(p.read_bytes()):
            if r["warc_type"] == "response":
                want.add(r["uri"])
    assert got == want and got

    # offset random access against the real files
    for p in idxs:
        seg = (seg_dir / p.name[:-len(".cdx.jsonl")]).read_bytes()
        for line in p.read_text().splitlines()[:3]:
            e = json.loads(line)
            rec = parse_warc(
                seg[int(e["offset"]):int(e["offset"]) + int(e["length"])])
            assert len(rec) == 1 and rec[0]["uri"] == e["url"]


def test_gz_member_roundtrip_and_compressed_offsets():
    """.warc.gz member-per-record layout: payloads roundtrip
    byte-identically and CDX offsets are COMPRESSED member bounds — a
    reader range-fetches one gz member per record (the CC contract)."""
    import gzip

    blob = build_warc(_recs(), date=DATE, gzip_members=True)
    assert blob[:2] == b"\x1f\x8b"
    parsed = parse_warc(blob)
    plain = parse_warc(build_warc(_recs(), date=DATE))
    pr = [r for r in parsed if r["warc_type"] == "response"]
    pl = [r for r in plain if r["warc_type"] == "response"]
    assert [r["payload"] for r in pr] == [r["payload"] for r in pl]
    assert [r["uri"] for r in pr] == [r["uri"] for r in pl]

    entries = build_cdx(blob, "seg.warc.gz")
    assert len(entries) == 3
    for e in entries:
        off, ln = int(e["offset"]), int(e["length"])
        member = blob[off:off + ln]
        rec = parse_warc(gzip.decompress(member))
        assert len(rec) == 1 and rec[0]["uri"] == e["url"]
        assert hashlib.md5(rec[0]["payload"]).hexdigest() == e["digest"]
    # compressed members tile the file exactly
    by_off = sorted(parsed, key=lambda r: r["offset"])
    end = 0
    for r in by_off:
        assert r["offset"] == end
        end += r["length"]
    assert end == len(blob)
    # determinism: same inputs -> identical compressed bytes
    assert blob == build_warc(_recs(), date=DATE, gzip_members=True)


def test_gz_truncation_rejected():
    import pytest as _pytest

    blob = build_warc(_recs(), date=DATE, gzip_members=True)
    with _pytest.raises(ValueError):
        parse_warc(blob[:-5])


def test_engine_gz_segments_feed_reader_and_cdx(spark, tmp_path):
    from crawl4ai_spark.engine import CrawlConfig, SparkWebEngine
    from crawl4ai_spark.sources.pagesgen import generate_pages, generate_seeds
    from crawl4ai_spark.sources.rawpages import pages_from_warc

    pages = generate_pages(spark, 2, 8)
    seeds = generate_seeds(spark, 2)
    eng = SparkWebEngine(spark, str(tmp_path / "s1"))
    eng.run(pages, seeds, config=CrawlConfig(max_depth=2, max_pages=30))
    seg_dir = tmp_path / "gzsegs"
    eng.export_warc(str(seg_dir), pages=pages, n_buckets=2,
                    cdx=True, gzip_segments=True)

    segs = sorted(seg_dir.glob("*.warc.gz"))
    idxs = sorted(seg_dir.glob("*.warc.gz.cdx.jsonl"))
    assert segs and len(idxs) == len(segs)

    # transparent reader: gz segments load byte-identical bodies
    warc_pages = pages_from_warc(spark, str(seg_dir / "*.warc.gz"))
    a = {r.url: bytes(r.html) for r in pages.select("url", "html").collect()}
    got = {r.url: bytes(r.html)
           for r in warc_pages.select("url", "html").collect()}
    assert got and all(a[u] == h for u, h in got.items())

    # sidecar offsets are compressed member bounds
    import gzip

    for p in idxs:
        seg = (seg_dir / p.name[:-len(".cdx.jsonl")]).read_bytes()
        for line in p.read_text().splitlines()[:2]:
            e = json.loads(line)
            member = seg[int(e["offset"]):int(e["offset"]) + int(e["length"])]
            rec = parse_warc(gzip.decompress(member))
            assert len(rec) == 1 and rec[0]["uri"] == e["url"]


def test_wet_wat_gz_members_roundtrip():
    """The gz member layout applies to the whole CC format trio."""
    from crawl4ai_spark.html.warc import build_wat, build_wet

    wet = build_wet([{"uri": "https://a.example/x", "text": "hello"}],
                    date=DATE, gzip_members=True)
    wat = build_wat([{"uri": "https://a.example/x",
                      "meta": {"Envelope": {"Format": "WARC"}}}],
                    date=DATE, gzip_members=True)
    for blob, kind in ((wet, "conversion"), (wat, "metadata")):
        assert blob[:2] == b"\x1f\x8b"
        recs = parse_warc(blob)
        assert [r["warc_type"] for r in recs] == ["warcinfo", kind]
        assert recs[1]["offset"] > 0
        assert recs[1]["offset"] + recs[1]["length"] == len(blob)
    assert parse_warc(wet)[1]["payload"] == b"hello"
