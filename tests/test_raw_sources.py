"""S3/S4 sources: file:// and raw: inputs flow through the same pipeline."""

from pyspark.sql import functions as F

from crawl4ai_spark.functions.udfs import process_pages
from crawl4ai_spark.sources.rawpages import pages_from_files, pages_from_raw


def test_raw_pages_pipeline(spark):
    docs = [
        ("raw://doc1", "<html><head><title>T1</title></head>"
                       "<body><h1>Hello</h1><p>alpha beta gamma</p></body></html>"),
        ("raw://doc2", "<html><body><a href='/x'>link</a><p>content words here</p></body></html>"),
    ]
    pages = pages_from_raw(spark, docs)
    out = process_pages(pages).collect()
    by_url = {r.url: r for r in out}
    assert by_url["raw://doc1"].success
    assert "alpha beta gamma" in by_url["raw://doc1"].text
    assert by_url["raw://doc1"].metadata["title"] == "T1"
    assert len(by_url["raw://doc2"].links.internal) == 1


def test_file_pages_pipeline(spark, tmp_path):
    f = tmp_path / "page.html"
    f.write_text("<html><head><title>FromFile</title></head>"
                 "<body><p>file body text</p></body></html>")
    pages = pages_from_files(spark, str(tmp_path / "*.html"))
    rows = process_pages(pages).collect()
    assert len(rows) == 1
    assert rows[0].url.startswith("file://")
    assert "file body text" in rows[0].text
    assert rows[0].metadata["title"] == "FromFile"


def test_file_source_schema_matches_input_hint(spark, tmp_path):
    (tmp_path / "a.html").write_text("<p>x</p>")
    pages = pages_from_files(spark, str(tmp_path / "*.html"))
    assert [f.name for f in pages.schema.fields] == \
        ["url", "warc_ts", "html", "text", "lang"]
    assert pages.schema["html"].dataType.simpleString() == "binary"
    assert pages.filter(F.col("html").isNotNull()).count() == 1
