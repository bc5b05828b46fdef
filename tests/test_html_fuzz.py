"""Fuzz the extraction pipeline: whatever bytes the web delivers,
process_page returns a well-formed record and never raises (one poisoned
page must never kill an Arrow batch of 4096 good ones)."""

from hypothesis import given, settings
from hypothesis import strategies as st

from crawl4ai_spark.functions.udfs import process_page

_TAGS = st.sampled_from([
    "<div>", "</div>", "<p>", "</p>", "<a href='x'>", "</a>", "<table>",
    "<tr><td>", "<!---->", "<![CDATA[", "<script>", "</script>", "<b>",
    "<pre>", "<img src=x>", "&amp;", "&#x41;", "<", ">", '"', "'",
])
_CHUNKS = st.one_of(_TAGS, st.text(max_size=20))


@given(st.lists(_CHUNKS, max_size=40))
@settings(max_examples=150, deadline=None)
def test_process_page_total_on_tag_soup(parts):
    html = "".join(parts)
    rec = process_page("https://fuzz.example.com/x", html)
    assert rec["url"] == "https://fuzz.example.com/x"
    assert isinstance(rec["text"], str)
    assert isinstance(rec["markdown"]["raw_markdown"], str)
    assert isinstance(rec["links"]["internal"], list)


@given(st.binary(max_size=300))
@settings(max_examples=100, deadline=None)
def test_process_page_total_on_binary_garbage(b):
    html = b.decode("utf-8", errors="replace")
    rec = process_page("https://fuzz.example.com/bin", html)
    assert rec["url"] == "https://fuzz.example.com/bin"


def test_deeply_nested_html_no_recursion_error():
    html = "<div>" * 3000 + "deep" + "</div>" * 3000
    rec = process_page("https://fuzz.example.com/deep", html)
    assert "deep" in rec["text"] or rec["success"] is False


@given(st.lists(st.sampled_from([
    "<div>", "</div>", "<p>", "</p>", "<em>", "</em>", "<strong>", "</strong>",
    "<a href='/x'>", "<a>", "</a>", "<ul>", "<li>", "</ul>", "</li>",
    "<pre>", "</pre>", "<code>", "</code>", "<table>", "<tr>", "<td>",
    "</td>", "</tr>", "</table>", "<blockquote>", "</blockquote>",
    "<img src='i'>", "<br>", "<hr>", "text &amp; more", "x*y_z",
    "&rsquo;", "&#169;", "&bogus;", "é漢", "  spaced  ",
]), min_size=0, max_size=60))
@settings(max_examples=120, deadline=None)
def test_markdown_renderer_total_and_deterministic(parts):
    """The byte-parity markdown renderer must be TOTAL on arbitrary tag soup
    (never raises) and deterministic (same bytes on re-render)."""
    from crawl4ai_spark.html.markdown import add_citations, html_to_markdown

    soup = "".join(parts)
    md1 = html_to_markdown(soup, "https://fuzz.example/")
    md2 = html_to_markdown(soup, "https://fuzz.example/")
    assert md1 == md2
    cited1 = add_citations(md1, "https://fuzz.example/")
    assert cited1 == add_citations(md2, "https://fuzz.example/")
