"""Canonical election + hreflang clustering unit tests on hand-built
graphs (chains, loops, danglers, long paths) — the registry queries'
oracles cover the arithmetic corpus; these pin the engine semantics."""

from pyspark.sql import functions as F

from crawl4ai_spark.ops.headq import (
    canonical_edges,
    elect_canonical,
    hreflang_links,
)


def _pages(spark, rows):
    return spark.createDataFrame(rows, "url string, html_str string")


def test_canonical_parse_and_self_links(spark):
    pages = _pages(spark, [
        ("https://a.com/1",
         '<head><link rel="canonical" href="https://a.com/canon"></head>'),
        ("https://a.com/2",
         '<head><link rel="canonical" href="https://a.com/2"></head>'),
        ("https://a.com/3", "<head><title>no link</title></head>"),
    ])
    edges = canonical_edges(pages).collect()
    assert [(r["src"], r["dst"]) for r in edges] == [
        ("https://a.com/1", "https://a.com/canon")]


def test_elect_canonical_chain_loop_dangler(spark):
    """a→b→c→d (3-hop chain), e↔f (loop → both self, flagged), g→missing
    (dangling target still elected), h isolated."""
    urls = spark.createDataFrame(
        [(u,) for u in "abcdefgh"], "url string")
    edges = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "d"),
         ("e", "f"), ("f", "e"),
         ("g", "zz")],
        "src string, dst string")
    got = {r["url"]: (r["canonical_url"], r["hops"], r["is_cycle"])
           for r in elect_canonical(urls, edges).collect()}
    assert got["a"] == ("d", 3, False)
    assert got["b"] == ("d", 2, False)
    assert got["c"] == ("d", 1, False)
    assert got["d"] == ("d", 0, False)
    assert got["e"] == ("e", 0, True)
    assert got["f"] == ("f", 0, True)
    assert got["g"] == ("zz", 1, False)
    assert got["h"] == ("h", 0, False)


def test_elect_canonical_long_chain_within_rounds(spark):
    """A 40-hop chain resolves with the default 6 doubling rounds
    (2^6 = 64 ≥ 40) — the O(log chain) property."""
    n = 41
    urls = spark.createDataFrame([(f"u{i:03d}",) for i in range(n)],
                                 "url string")
    edges = spark.createDataFrame(
        [(f"u{i:03d}", f"u{i + 1:03d}") for i in range(n - 1)],
        "src string, dst string")
    got = {r["url"]: (r["canonical_url"], r["hops"])
           for r in elect_canonical(urls, edges).collect()}
    assert got["u000"] == (f"u{n - 1:03d}", n - 1)
    assert got[f"u{n - 1:03d}"] == (f"u{n - 1:03d}", 0)


def test_hreflang_parse_pairs_align(spark):
    pages = _pages(spark, [
        ("https://a.com/en",
         '<head><link rel="alternate" hreflang="en" href="https://a.com/en">'
         '<link rel="alternate" hreflang="de-at" href="https://a.com/de">'
         '<link rel="stylesheet" href="/x.css"></head>'),
    ])
    rows = hreflang_links(pages).orderBy("hreflang").collect()
    assert [(r["hreflang"], r["href"]) for r in rows] == [
        ("de-at", "https://a.com/de"), ("en", "https://a.com/en")]


def test_hreflang_cluster_on_string_path(spark):
    """connected_components_bigstar over string URL nodes: a 6-node path
    declared one-directionally still yields one cluster labeled by the
    lexicographically smallest url."""
    from crawl4ai_spark.ops.clusterq import connected_components_bigstar

    urls = [f"https://s.com/{c}" for c in "abcdef"]
    nodes = spark.createDataFrame([(u,) for u in urls], "node string")
    edges = spark.createDataFrame(
        list(zip(urls[:-1], urls[1:])) + [("https://s.com/z", "https://s.com/z")],
        "v1 string, v2 string")
    cc = connected_components_bigstar(nodes, edges, cast_long=False).collect()
    assert all(r["cluster_id"] == urls[0] for r in cc)
    assert all(r["cluster_size"] == 6 for r in cc)
