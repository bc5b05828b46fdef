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
