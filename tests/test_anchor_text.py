"""anchor_text_table (ops/crawlq.py): exact aggregation semantics on
hand-built link structs, plus spec-level invariants over the synthetic
site's real extraction results (pagesgen embeds anchors as
'link to <last-path-segment>')."""

from pyspark.sql import functions as F

from crawl4ai_spark.ops.crawlq import anchor_text_table, q_crawl_anchor_text


def _link(href, text):
    return {"href": href, "text": text, "title": "",
            "base_domain": "", "intrinsic_score": 0.0}


def test_anchor_aggregation_exact(spark):
    rows = [
        ("https://a.com/x", "a.com",
         {"internal": [_link("https://a.com/t", "Buy Now"),
                       _link("https://a.com/t", "buy now ")],  # case/trim fold
          "external": [_link("https://b.com/t", "Other")]}),
        ("https://a.com/y", "a.com",
         {"internal": [_link("https://a.com/t", "BUY NOW")], "external": []}),
        ("https://c.com/z", "c.com",
         {"internal": [], "external": [_link("https://a.com/t", "buy now")]}),
    ]
    schema = (
        "url string, host string, links struct<"
        "internal: array<struct<href:string, text:string, title:string,"
        " base_domain:string, intrinsic_score:double>>,"
        "external: array<struct<href:string, text:string, title:string,"
        " base_domain:string, intrinsic_score:double>>>"
    )
    df = spark.createDataFrame(rows, schema)
    got = {(r.target_url, r.anchor): (r.n_inlinks, r.n_src_hosts)
           for r in anchor_text_table(df).collect()}
    assert got == {
        ("https://a.com/t", "buy now"): (4, 2),  # 2+1 from a.com, 1 from c.com
        ("https://b.com/t", "other"): (1, 1),
    }


def test_anchor_table_over_synthetic_site(spark):
    out = q_crawl_anchor_text(spark, "/root/testdata/sf0.001").collect()
    assert out
    by_target: dict = {}
    for r in out:
        by_target.setdefault(r.target_url, []).append(r)
    # pagesgen anchors: every tree link reads 'link to <seg>' (or 'home');
    # item links read 'view' — no other anchor text exists in the corpus
    for r in out:
        assert r.anchor.startswith("link to ") or r.anchor == "view"
        assert 1 <= r.n_src_hosts <= r.n_inlinks
    # tree targets: the dominant anchor names the target's own last segment
    named = [r for r in out if r.anchor.startswith("link to p")]
    assert named
    for r in named:
        assert r.anchor == "link to " + r.target_url.rsplit("/", 1)[-1]
    # cross-host edges flow into the table: host roots (/p0) are never
    # linked from their own tree, so any /p0 target row IS a cross-host edge
    assert any(r.target_url.endswith("/p0") for r in out)
