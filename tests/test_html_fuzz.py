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
