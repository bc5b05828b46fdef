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


# ----------------------------------------------------------- image XObjects
# (reference processor.py:41,58-70: extract_images=True per-page images)

def test_image_roundtrip_both_filters():
    imgs = [
        [{"width": 3, "height": 2, "pixels": bytes(range(18)), "compress": True},
         {"width": 2, "height": 2, "pixels": bytes(range(100, 112)), "compress": False}],
        [],
        [{"width": 1, "height": 1, "pixels": b"\x00\x80\xff", "compress": False}],
    ]
    blob = build_pdf(["page one", "page two", "page three"], images=imgs)
    r = parse_pdf(blob)
    # text extraction is unaffected by the embedded images
    assert r["pages"] == ["page one", "page two", "page three"]
    assert [len(p) for p in r["images"]] == [2, 0, 1]
    for pi, page in enumerate(imgs):
        for k, exp in enumerate(page):
            got = r["images"][pi][k]
            assert got["width"] == exp["width"]
            assert got["height"] == exp["height"]
            assert got["data"] == bytes(exp["pixels"])
            assert got["colorspace"] == "DeviceRGB"
            assert got["bits_per_component"] == 8
            assert got["filter"] == ("FlateDecode" if exp["compress"] else "raw")


def test_image_sample_size_validated():
    with pytest.raises(ValueError):
        build_pdf(["x"], images=[[{"width": 2, "height": 2, "pixels": b"abc"}]])


def test_image_raw_bytes_survive_binary_delimiters():
    # raw (uncompressed) sample streams containing PDF delimiter bytes
    # ( ) \ \r \n must come back intact — /Length-based slicing, not regex
    px = b"()\\\r\nstream\rendst" + bytes(range(223))
    px = (px + bytes(240))[:240]  # 16*5*3 samples
    blob = build_pdf(["p"], images=[[{"width": 16, "height": 5,
                                      "pixels": px,
                                      "compress": False}]])
    r = parse_pdf(blob)
    assert r["images"][0][0]["data"][:len(px)] == px
