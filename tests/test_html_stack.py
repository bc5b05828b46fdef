"""Hermetic unit tests for the pure HTML stack — models the reference's
inline-HTML fixture strategy (tests/async/test_content_filter_prune.py,
test_content_filter_bm25.py, test_markdown_genertor.py)."""

import json

from crawl4ai_spark.html.content_filter import (
    BM25,
    BM25ContentFilter,
    PruningContentFilter,
    fit_markdown,
    tokenize,
)
from crawl4ai_spark.html.dom import parse_html, select
from crawl4ai_spark.html.extraction import extract_json_css, extract_regex
from crawl4ai_spark.html.markdown import add_citations, html_to_markdown
from crawl4ai_spark.html.scraper import scrape
from crawl4ai_spark.html.chunking import (
    fixed_length_word_chunk,
    merge_chunks,
    overlapping_window_chunk,
    regex_chunk,
    sentence_chunk,
    sliding_window_chunk,
)

ARTICLE = """
<html><head><title>Quality Article</title>
<meta name="description" content="about spark crawling"></head><body>
<article>
<h1>Distributed Crawling</h1>
<p>This is a high-quality paragraph with plenty of meaningful content about
Spark engines and distributed crawling and extraction pipelines that should
definitely survive any pruning because it has very high text density and many
words.</p>
<div class="sidebar"><a href="/l1">l1</a> <a href="/l2">l2</a></div>
</article>
<footer>footer junk</footer>
</body></html>
"""


def test_dom_malformed_never_raises():
    for bad in ["", "<div><p>x", "<<<>", "<a href=>y</a>", None or "", "<b><i>z</b></i>"]:
        parse_html(bad)


def test_selector_compound():
    r = parse_html('<div class="a"><p id="x" class="b c">t</p></div>')
    assert select(r, "div.a > p.b#x")[0].text() == "t"
    assert select(r, "p[class]")[0].get("id") == "x"
    assert select(r, "span") == []


def test_scrape_links_media_meta():
    html = (
        '<html><head><title>T</title></head><body>'
        '<a href="/a?utm_source=x">in</a>'
        '<a href="https://other.org/b">out</a>'
        '<img src="big.jpg" alt="big" width="500">'
        '<img src="icon.png" width="16"></body></html>'
    )
    r = scrape("https://site.com/page", html)
    assert [x["href"] for x in r["links"]["internal"]] == ["https://site.com/a"]
    assert [x["href"] for x in r["links"]["external"]] == ["https://other.org/b"]
    assert len(r["media"]["images"]) == 1
    assert r["media"]["images"][0]["src"] == "https://site.com/big.jpg"
    assert r["metadata"]["title"] == "T"


def test_scrape_base_href():
    html = '<head><base href="https://cdn.com/sub/"></head><body><a href="x">x</a></body>'
    r = scrape("https://site.com/page", html)
    all_links = r["links"]["internal"] + r["links"]["external"]
    assert all_links[0]["href"] == "https://cdn.com/sub/x"


def test_scrape_dedups_links():
    html = '<body><a href="/a">1</a><a href="/a#frag">2</a><a href="/a/">3</a></body>'
    r = scrape("https://s.com/", html)
    assert len(r["links"]["internal"]) == 1


def test_table_scoring_keeps_data_drops_layout():
    data = ("<table><caption>c</caption><tr><th>h1</th><th>h2</th></tr>"
            "<tr><td>1</td><td>2</td></tr><tr><td>3</td><td>4</td></tr></table>")
    layout = '<table role="presentation"><tr><td>menu</td></tr></table>'
    r = scrape("https://s.com/", f"<body>{data}{layout}</body>")
    assert len(r["tables"]) == 1
    t = r["tables"][0]
    assert t["headers"] == ["h1", "h2"]
    assert t["rows"] == [["1", "2"], ["3", "4"]]
    assert t["caption"] == "c"


def test_table_colspan_expansion():
    html = ("<body><table><tr><th>a</th><th>b</th><th>c</th></tr>"
            '<tr><td colspan="2">x</td><td>y</td></tr></table></body>')
    r = scrape("https://s.com/", html, table_score_threshold=4)
    assert r["tables"][0]["rows"] == [["x", "", "y"]]


def test_markdown_basics():
    md = html_to_markdown(
        "<h2>Head</h2><p>Text <strong>bold</strong> and <em>it</em>.</p>"
        "<ul><li>one</li><li>two</li></ul><pre><code>x = 1</code></pre>"
    )
    # reference html2text style: _em_, two-space list indent, ``` fences
    assert "## Head" in md
    assert "**bold**" in md and "_it_" in md
    assert "  * one" in md and "  * two" in md
    assert "```\nx = 1\n```" in md


def test_markdown_nested_list():
    md = html_to_markdown("<ul><li>a<ul><li>b</li></ul></li></ul>")
    assert "  * a" in md and "    * b" in md


def test_markdown_table():
    # reference html2text table style: `k| v  \n---|---  `
    md = html_to_markdown(
        "<table><tr><th>k</th><th>v</th></tr><tr><td>a</td><td>1</td></tr></table>"
    )
    assert "k| v" in md and "---|---" in md and "a| 1" in md


def test_markdown_deterministic():
    h = ARTICLE
    assert html_to_markdown(h) == html_to_markdown(h)


def test_citations_first_seen_order():
    md = "see [a](http://a.com) then [b](http://b.com) then [a again](http://a.com)"
    cited, refs = add_citations(md)
    assert "a⟨1⟩" in cited and "b⟨2⟩" in cited and "a again⟨1⟩" in cited
    # reference refs block: "\n\n## References\n\n⟨1⟩ url: text\n..."
    assert refs.startswith("\n\n## References\n\n")
    assert "⟨1⟩ http://a.com: a" in refs and "⟨2⟩ http://b.com: b" in refs


def test_pruning_keeps_content_drops_sidebar():
    # semantic mirror of reference test_content_filter_prune.py:12-23
    blocks = PruningContentFilter().filter_content(ARTICLE)
    joined = " ".join(blocks)
    assert "high-quality paragraph" in joined
    assert "footer junk" not in joined  # footer is an excluded tag


def test_pruning_empty_input():
    assert PruningContentFilter().filter_content("") == []
    assert PruningContentFilter().filter_content(None) == []


def test_fit_markdown_runs():
    fmd, fhtml = fit_markdown(ARTICLE)
    assert "Distributed Crawling" in fmd
    assert fhtml.startswith("<div>")


def test_bm25_scores_relevant_higher():
    corpus = [tokenize("spark distributed crawling engine"),
              tokenize("cooking pasta recipes tomato")]
    bm = BM25(corpus)
    s = bm.scores(tokenize("spark crawling"))
    assert s[0] > s[1]


def test_bm25_filter_picks_relevant_chunk():
    html = (
        "<html><head><title>spark crawling</title></head><body>"
        "<p>spark crawling distributed frontier engine spark crawling extraction</p>"
        "<p>completely unrelated cooking pasta recipe tomato basil dinner</p>"
        "</body></html>"
    )
    blocks = BM25ContentFilter(bm25_threshold=1.0).filter_content(html)
    joined = " ".join(blocks)
    assert "frontier" in joined
    assert "pasta" not in joined


def test_json_css_extraction():
    html = (
        '<body><div class="product"><h2 class="title">A</h2>'
        '<span class="price">$1.50</span><a href="/a">v</a></div>'
        '<div class="product"><h2 class="title">B</h2>'
        '<span class="price">$2.00</span><a href="/b">v</a></div></body>'
    )
    schema = {
        "baseSelector": "div.product",
        "fields": [
            {"name": "title", "type": "text", "selector": "h2.title"},
            {"name": "price", "type": "regex", "selector": "span.price",
             "pattern": r"\$([\d.]+)"},
            {"name": "link", "type": "attribute", "selector": "a", "attribute": "href"},
        ],
    }
    out = extract_json_css(html, schema)
    assert out == [
        {"title": "A", "price": "1.50", "link": "/a"},
        {"title": "B", "price": "2.00", "link": "/b"},
    ]


def test_json_css_nested_list_and_transform():
    html = '<body><div id="o"><span class="t"> X </span><ul><li>1</li><li>2</li></ul></div></body>'
    schema = {
        "baseSelector": "div#o",
        "fields": [
            {"name": "t", "type": "text", "selector": "span.t", "transform": "lowercase"},
            {"name": "items", "type": "list", "selector": "li",
             "fields": [{"name": "v", "type": "text"}]},
        ],
    }
    out = extract_json_css(html, schema)
    assert out[0]["t"] == "x"
    assert out[0]["items"] == [{"v": "1"}, {"v": "2"}]


def test_regex_catalog():
    rows = extract_regex("u", "mail a@b.co on 2024-01-02 pay $5.00 or 10%",
                         ["email", "date_iso", "currency", "percentage"])
    # catalog now mirrors the reference DEFAULT_PATTERNS verbatim
    labels = {r["label"]: r["value"] for r in rows}
    assert labels["email"] == "a@b.co"
    assert labels["date_iso"] == "2024-01-02"
    assert labels["currency"] == "$5.00"
    assert labels["percentage"] == "10%"


def test_chunking():
    text = " ".join(f"w{i}" for i in range(10))
    assert len(fixed_length_word_chunk(text, 4)) == 3
    sl = sliding_window_chunk(text, 4, 2)
    assert sl[0] == "w0 w1 w2 w3" and sl[1] == "w2 w3 w4 w5"
    ov = overlapping_window_chunk(text, 6, 2)
    assert ov[0].endswith("w5") and ov[1].startswith("w4")
    assert regex_chunk("a\n\nb\n\nc") == ["a", "b", "c"]
    assert sentence_chunk("One two. Three four! Five?") == ["One two.", "Three four!", "Five?"]
    merged = merge_chunks(["a b c", "d e f", "g h i"], target_size=8)
    assert len(merged) == 2


def test_llm_stubs_raise_with_integration_hint():
    from crawl4ai_spark.html.llm_stubs import (
        CosineStrategy, LLMContentFilter, LLMExtractionStrategy)
    import pytest as _pytest
    for obj, call in [
        (LLMContentFilter(instruction="x"), lambda o: o.filter_content("<p>a</p>")),
        (LLMExtractionStrategy(schema={}), lambda o: o.run("u", ["s"])),
        (CosineStrategy(semantic_filter="q"), lambda o: o.run("u", ["s"])),
    ]:
        with _pytest.raises(NotImplementedError) as e:
            call(obj)
        assert "Wire it" in str(e.value)


def test_json_xpath_extraction_mirrors_css():
    """E11: the same schema expressed in CSS and XPath must agree byte-for-
    byte (parity target JsonXPathExtractionStrategy,
    ref extraction_strategy.py:1803-1894)."""
    from crawl4ai_spark.html.extraction import extract_json_xpath

    html = (
        '<body><div class="product"><h2 class="title">A</h2>'
        '<span class="price">$1.50</span><a href="/a">v</a></div>'
        '<div class="product"><h2 class="title">B</h2>'
        '<span class="price">$2.00</span><a href="/b">v</a></div></body>'
    )
    css = {
        "baseSelector": "div.product",
        "fields": [
            {"name": "title", "type": "text", "selector": "h2.title"},
            {"name": "price", "type": "regex", "selector": "span.price",
             "pattern": r"\$([\d.]+)"},
            {"name": "link", "type": "attribute", "selector": "a", "attribute": "href"},
        ],
    }
    xp = {
        "baseSelector": "//div[@class='product']",
        "fields": [
            {"name": "title", "type": "text", "selector": ".//h2[@class='title']"},
            {"name": "price", "type": "regex", "selector": ".//span[contains(@class,'price')]",
             "pattern": r"\$([\d.]+)"},
            {"name": "link", "type": "attribute", "selector": ".//a", "attribute": "href"},
        ],
    }
    assert extract_json_xpath(html, xp) == extract_json_css(html, css)


def test_json_xpath_axes_and_predicates():
    from crawl4ai_spark.html.extraction import parse_html, xpath_select

    html = ('<body><ul id="m"><li>a</li><li class="hot">b</li><li>c</li></ul>'
            '<div><ul><li>z</li></ul></div></body>')
    root = parse_html(html)
    assert [n.text() for n in xpath_select(root, "//li")] == ["a", "b", "c", "z"]
    assert [n.text() for n in xpath_select(root, "//ul[@id='m']/li[2]")] == ["b"]
    assert [n.text() for n in xpath_select(root, "//ul[@id='m']/li[last()]")] == ["c"]
    assert [n.text() for n in xpath_select(root, "//li[@class]")] == ["b"]
    assert [n.text() for n in xpath_select(root, "//div//li")] == ["z"]
    assert [n.tag for n in xpath_select(root, "/body/ul")] == ["ul"]
    assert [n.text() for n in xpath_select(root, "//ul/*")] == ["a", "b", "c", "z"]


def test_json_xpath_through_process_pages():
    """selectorType=xpath routes through the one-Arrow-stage pipeline."""
    import json as _json

    from crawl4ai_spark.html.extraction import extract_json_css_str

    html = '<body><div class="p"><h2>T</h2></div></body>'
    schema = _json.dumps({
        "selectorType": "xpath",
        "baseSelector": "//div[@class='p']",
        "fields": [{"name": "t", "type": "text", "selector": ".//h2"}],
    })
    assert _json.loads(extract_json_css_str(html, schema)) == [{"t": "T"}]


def test_topic_segmentation_splits_topic_shift():
    """E16 tail: TextTiling finds the vocabulary shift between two topics
    (reference TopicSegmentationChunking wraps NLTK TextTiling;
    chunking_strategy.py:93-143)."""
    from crawl4ai_spark.html.chunking import (
        topic_segment_chunk,
        topic_segment_with_keywords,
    )

    topic_a = ("spark cluster executor shuffle partition catalyst codegen "
               "dataframe parquet broadcast join aggregate window stream ") * 12
    topic_b = ("pasta tomato basil garlic olive oven recipe simmer saute "
               "flour yeast dough bake crust cheese herb roast ") * 12
    text = topic_a + topic_b
    segs = topic_segment_chunk(text)
    assert len(segs) >= 2
    assert "".join(segs) == text  # lossless cover
    # the split lands near the topic boundary: first segment is sparky,
    # last is cooking
    assert "executor" in segs[0] and "executor" not in segs[-1]
    assert "tomato" in segs[-1] and "tomato" not in segs[0]

    pairs = topic_segment_with_keywords(text, num_keywords=3)
    assert all(len(kws) == 3 for _, kws in pairs)
    # first segment's keywords come from topic A's vocabulary
    assert set(pairs[0][1]) <= set(topic_a.split())


def test_topic_segmentation_degenerate():
    from crawl4ai_spark.html.chunking import topic_segment_chunk

    assert topic_segment_chunk("") == []
    assert topic_segment_chunk("short text only") == ["short text only"]
    uniform = ("same words repeat same words repeat keyword alpha beta ") * 40
    segs = topic_segment_chunk(uniform)
    assert "".join(segs) == uniform


def test_pretty_format_html_reference_exact():
    """E20: the indentation-only pretty printer matches the reference's
    fast_format_html byte-for-byte (frozen expected strings produced by
    running the reference function; ref utils.py:2163-2208)."""
    from crawl4ai_spark.html.dom import pretty_format_html

    assert pretty_format_html("<div><p>hi <b>x</b></p><img src='i'/></div>") == (
        "<div>\n  <p>\n    hi\n    <b>\n      x\n    </b>\n  </p>\n"
        "  <img src='i'/>\n</div>"
    )
    assert pretty_format_html("") == ""
    assert pretty_format_html("plain text") == "plain text"
    assert pretty_format_html("<ul><li>a</li></ul>") == (
        "<ul>\n  <li>\n    a\n  </li>\n</ul>"
    )
