"""extract_jsonld (ops/headq.py) vs the reference seeder's semantics
(/root/reference/crawl4ai/async_url_seeder.py:123-129,146-153): every
<script type="application/ld+json"> block json-parsed, invalid blocks
SKIPPED, document order kept, arrays accepted. The exact DuckDB oracle for
the query form runs in test_ops_parity; here the operator faces hand-built
HTML with the edge cases the reference's json.loads loop defines."""

from crawl4ai_spark.ops.headq import extract_jsonld


def _run(spark, html):
    df = spark.createDataFrame([("u1", html)], "url string, html_str string")
    return [(r.ld_idx, r.ld_type, r.ld_name)
            for r in extract_jsonld(df).orderBy("ld_idx").collect()]


def test_object_array_and_invalid_blocks(spark):
    html = (
        '<html><head>'
        '<script type="application/ld+json">'
        '{"@type":"Product","name":"widget"}</script>'
        '<script type="application/ld+json">{"bad": </script>'
        "<script  type='application/ld+json' async>"
        '[{"@type":"Article","name":"a1"},{"@type":"Person"}]</script>'
        '<script type="text/javascript">var x = 1;</script>'
        '</head><body></body></html>')
    got = _run(spark, html)
    # invalid block keeps its index gap (reference: enumerate + skip)
    assert got == [(0, "Product", "widget"), (2, "Article", "a1")]


def test_no_blocks_and_missing_fields(spark):
    assert _run(spark, "<html><body><p>plain</p></body></html>") == []
    got = _run(spark, '<script type="application/ld+json">'
                      '{"headline":"no type"}</script>')
    assert got == [(0, None, None)]
