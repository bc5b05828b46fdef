"""Schema-prep HTML reducers (reference utils.py optimize_html /
preprocess_html_for_schema) — semantic parity tests over the repo DOM stack
(lxml absent, so byte-parity is out of reach; the decisions are pinned)."""

from crawl4ai_spark.html import schema_prep
from crawl4ai_spark.html.schema_prep import (
    optimize_html,
    preprocess_html_for_schema,
)


def test_optimize_truncates_attrs_and_text():
    long = "x" * 300
    out = optimize_html(f'<div title="{long}">{long}</div>', threshold=200)
    assert 'title="' + "x" * 200 + '..."' in out
    assert ">" + "x" * 200 + "..." in out
    # short values untouched
    assert optimize_html('<p id="a">hi</p>') == '<p id="a">hi</p>'


def test_preprocess_drops_head_and_noncontent_tags():
    html = ("<html><head><title>T</title></head><body>"
            "<script>var x;</script><svg><rect/></svg>"
            "<p>keep</p></body></html>")
    out = preprocess_html_for_schema(html)
    assert "keep" in out
    for gone in ("<head", "<script", "<svg", "var x", "<title"):
        assert gone not in out


def test_preprocess_attribute_whitelist_and_truncation():
    long = "y" * 250
    html = (f'<div id="i" class="c" href="/x" style="color:red" '
            f'data-k="v" name="{long}"><span aria-label="z">t</span></div>')
    out = preprocess_html_for_schema(html)
    assert 'id="i"' in out and 'class="c"' in out and 'data-k="v"' in out
    assert "href" not in out and "style" not in out and "aria-label" not in out
    assert 'name="' + "y" * 200 + '..."' in out  # whitelisted but truncated


def test_preprocess_text_truncation_strips_first():
    text = "  " + "w" * 150 + "  "
    out = preprocess_html_for_schema(f"<p>{text}</p>", text_threshold=100)
    assert ">" + "w" * 100 + "...<" in out


def test_preprocess_collapses_class_duplicates():
    tile = '<div class="product"><span class="t">same text</span></div>'
    distinct = '<div class="product"><span class="t">other text</span></div>'
    out = preprocess_html_for_schema("<body>" + tile * 4 + distinct + "</body>")
    assert out.count("same text") == 1   # later identical tiles dropped
    assert out.count("other text") == 1  # distinct content survives
    assert out.count('class="product"') == 2


def test_preprocess_no_class_elements_never_deduped():
    out = preprocess_html_for_schema("<body><p>a</p><p>a</p></body>")
    assert out.count("<p>a</p>") == 2


def test_preprocess_oversize_and_parse_error_fallbacks(monkeypatch):
    big = "<body>" + "<p>q</p>" * 100 + "</body>"
    out = preprocess_html_for_schema(big, max_size=50)
    assert len(out) == 53 and out.endswith("...")

    def boom(_):
        raise ValueError("parser down")
    monkeypatch.setattr(schema_prep, "parse_html", boom)
    assert preprocess_html_for_schema("<p>x</p>") == "<p>x</p>"
    assert preprocess_html_for_schema("z" * 100, max_size=10) == "z" * 10
