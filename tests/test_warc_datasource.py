"""spark.read.format("warc") (sources/warc_datasource.py — the Spark 4
Python DataSource face of the S12 read path) vs the mapInPandas helper
pages_from_warc: byte-identical rows, one partition per segment file,
and the pages feed the engine exactly like any other source."""

import os

import pytest

from crawl4ai_spark.html.warc import build_warc
from crawl4ai_spark.sources.warc_datasource import register_warc_datasource

DATE = "2025-01-01T00:00:00Z"


def _segments(d: str) -> str:
    recs1 = [
        {"uri": "https://a.example/x", "body": b"hello world",
         "status": 200, "content_type": "text/html; charset=utf-8"},
        {"uri": "https://b.example/y", "body": b"",
         "status": 404, "content_type": "text/plain"},
    ]
    recs2 = [
        {"uri": "https://c.example/z", "body": b"\r\n\r\nbinary\x00ish",
         "status": 200, "content_type": "application/octet-stream"},
    ]
    os.makedirs(d, exist_ok=True)
    with open(os.path.join(d, "seg-00000.warc"), "wb") as f:
        f.write(build_warc(recs1, date=DATE))
    with open(os.path.join(d, "seg-00001.warc"), "wb") as f:
        f.write(build_warc(recs2, date=DATE))
    return os.path.join(d, "*.warc")


def test_format_warc_matches_helper(spark, tmp_path):
    from crawl4ai_spark.sources.rawpages import pages_from_warc

    glob = _segments(str(tmp_path / "segs"))
    register_warc_datasource(spark)
    ds = spark.read.format("warc").load(glob)
    helper = pages_from_warc(spark, glob)
    assert ds.schema == helper.schema

    def key(rows):
        return sorted((r.url, r.warc_ts, bytes(r.html)) for r in rows)

    got, want = key(ds.collect()), key(helper.collect())
    assert got == want
    assert len(got) == 3  # every response record, both segments


def test_format_warc_partition_per_segment(spark, tmp_path):
    glob = _segments(str(tmp_path / "segs2"))
    register_warc_datasource(spark)
    ds = spark.read.format("warc").load(glob)
    assert ds.rdd.getNumPartitions() == 2


def test_format_warc_gz_members(spark, tmp_path):
    """member-per-record .warc.gz layout (the true CC semantics) reads
    through the same format — the parser walks gz transparently."""
    d = str(tmp_path / "gz")
    os.makedirs(d, exist_ok=True)
    blob = build_warc([
        {"uri": "https://g.example/1", "body": b"gzzz", "status": 200,
         "content_type": "text/html"}], date=DATE, gzip_members=True)
    with open(os.path.join(d, "seg.warc.gz"), "wb") as f:
        f.write(blob)
    register_warc_datasource(spark)
    rows = spark.read.format("warc").load(os.path.join(d, "*.gz")).collect()
    assert [r.url for r in rows] == ["https://g.example/1"]
    assert bytes(rows[0].html) == b"gzzz"


def test_format_warc_empty_glob_raises(spark, tmp_path):
    register_warc_datasource(spark)
    with pytest.raises(Exception):
        spark.read.format("warc") \
            .load(str(tmp_path / "nothing" / "*.warc")).collect()


def test_readstream_warc_picks_up_new_segments(spark, tmp_path):
    """spark.readStream.format('warc'): the offset walks the sorted
    segment listing, so segments landing between micro-batches arrive
    exactly once — the CC-drop ingestion shape."""
    d = str(tmp_path / "stream_segs")
    os.makedirs(d, exist_ok=True)
    with open(os.path.join(d, "seg-00000.warc"), "wb") as f:
        f.write(build_warc([
            {"uri": "https://s.example/1", "body": b"one", "status": 200,
             "content_type": "text/html"}], date=DATE))

    register_warc_datasource(spark)
    q = (spark.readStream.format("warc").load(os.path.join(d, "*.warc"))
         .writeStream.format("memory").queryName("warc_stream_t")
         .trigger(processingTime="0 seconds")
         .start())
    try:
        q.processAllAvailable()
        first = {r.url for r in
                 spark.sql("SELECT * FROM warc_stream_t").collect()}
        assert first == {"https://s.example/1"}

        with open(os.path.join(d, "seg-00001.warc"), "wb") as f:
            f.write(build_warc([
                {"uri": "https://s.example/2", "body": b"two",
                 "status": 200, "content_type": "text/html"}], date=DATE))
        q.processAllAvailable()
        rows = spark.sql("SELECT * FROM warc_stream_t").collect()
        assert {r.url for r in rows} \
            == {"https://s.example/1", "https://s.example/2"}
        assert len(rows) == 2  # exactly once per record
    finally:
        q.stop()


def test_format_wet_matches_helper(spark, tmp_path):
    from crawl4ai_spark.html.warc import build_wet
    from crawl4ai_spark.sources.rawpages import texts_from_wet

    d = str(tmp_path / "wet")
    os.makedirs(d, exist_ok=True)
    with open(os.path.join(d, "seg.warc.wet"), "wb") as f:
        f.write(build_wet([
            {"uri": "https://w.example/1", "text": "extracted text one"},
            {"uri": "https://w.example/2", "text": "and two"}],
            date=DATE))
    glob = os.path.join(d, "*.wet")
    register_warc_datasource(spark)
    ds = sorted((r.url, r.text) for r in
                spark.read.format("wet").load(glob).collect())
    helper = sorted((r.url, r.text) for r in
                    texts_from_wet(spark, glob).collect())
    assert ds == helper and len(ds) == 2
