"""Naive PDF build/parse layer (NaivePDFProcessorStrategy analog,
reference processors/pdf/processor.py:57,415-437). The writer⇄parser pair
is exercised on hostile strings, both stream encodings, and the
binary-delimiter regression; the Spark queries' oracle parity runs in
test_ops_parity via the registry."""

import zlib

import pytest

from crawl4ai_spark.html.pdf import (
    PDF_VERSION,
    PRODUCER,
    build_pdf,
    parse_pdf,
)

HOSTILE = [
    ["hello world", "second page\nwith two lines"],
    ["parens (nested (deep)) and \\ backslash"],
    ["tabs\tand\nnewlines\r"],
    ["unicode: café über ✓ 中文"],
    [""],
    [],
]


@pytest.mark.parametrize("compress", [True, False], ids=["flate", "raw"])
@pytest.mark.parametrize("pages", HOSTILE, ids=[str(i) for i in range(len(HOSTILE))])
def test_roundtrip(pages, compress):
    blob = build_pdf(pages, title="T(itle) \\x", author="A. Uthor",
                     compress=compress)
    r = parse_pdf(blob)
    expected = pages if pages else [""]
    assert r["pages"] == expected
    assert r["text"] == "\n".join(expected)
    assert r["n_pages"] == len(expected)
    assert r["title"] == "T(itle) \\x"
    assert r["author"] == "A. Uthor"
    assert r["producer"] == PRODUCER
    assert r["version"] == PDF_VERSION
    assert r["created"] == "D:20240101000000"
    assert r["encrypted"] is False


def test_not_a_pdf_raises():
    with pytest.raises(ValueError):
        parse_pdf(b"<html>not a pdf</html>")


def test_flate_stream_ending_in_carriage_return():
    """Regression: a compressed content stream whose LAST byte is 0x0D used
    to be truncated by the \\r?\\n-endstream delimiter regex (zlib error -5);
    the parser must slice by /Length instead. Deterministically hunt for
    such a payload and round-trip it."""
    import re
    found = None
    for i in range(20000):
        text = f"probe page {i} " * 3
        blob = build_pdf([text], compress=True)
        m = re.search(rb"/Length (\d+)[^>]*>>\nstream\n", blob)
        z = blob[m.end():m.end() + int(m.group(1))]
        if z.endswith(b"\r"):
            found = (text, blob)
            break
    assert found is not None, "no 0x0D-terminated compressed stream in range"
    r = parse_pdf(found[1])
    assert r["pages"] == [found[0]]


def test_multi_page_order_and_counts():
    pages = [f"page {i} content" for i in range(7)]
    r = parse_pdf(build_pdf(pages))
    assert r["n_pages"] == 7
    assert r["pages"] == pages


def test_octal_escape_decoding():
    """A hand-written (non-writer) string with octal escapes decodes per
    ISO 32000 §7.3.4.2."""
    from crawl4ai_spark.html.pdf import _unesc
    assert _unesc(rb"\101\102\103") == "ABC"
    assert _unesc(rb"\0501\051") == "(1)"
    assert _unesc(rb"line\nbreak") == "line\nbreak"
