"""URL normalization edge cases — mirrors the reference's
tests/test_normalize_url.py strategy (trailing slash, ../, root-relative,
fragments, tracking params, query sorting)."""

from crawl4ai_spark import urls as U


BASE = "https://www.Example.COM/dir/page.html"


def test_relative_join():
    assert U.normalize_url("other.html", BASE) == "https://www.example.com/dir/other.html"
    assert U.normalize_url("../up.html", BASE) == "https://www.example.com/up.html"
    assert U.normalize_url("/root.html", BASE) == "https://www.example.com/root.html"


def test_protocol_relative():
    assert U.normalize_url("//cdn.x.com/a", BASE) == "https://cdn.x.com/a"


def test_fragment_dropped():
    assert U.normalize_url("/a#sec", BASE) == "https://www.example.com/a"
    assert U.normalize_url("/a#sec", BASE, keep_fragment=True) == "https://www.example.com/a#sec"


def test_trailing_slash():
    assert U.normalize_url("/a/", BASE) == "https://www.example.com/a"
    assert U.normalize_url("/", BASE) == "https://www.example.com/"


def test_tracking_params_dropped_and_sorted():
    u = U.normalize_url("/p?utm_source=x&B=2&a=1&fbclid=z", BASE)
    assert u == "https://www.example.com/p?a=1&b=2"


def test_blank_values_kept():
    assert U.normalize_url("/p?a=&b=1", BASE) == "https://www.example.com/p?a=&b=1"


def test_none_and_empty():
    assert U.normalize_url(None, BASE) is None
    assert U.normalize_url("", BASE) is None


def test_deep_variant_root_slash():
    # deep variant rstrips even the root slash
    assert U.normalize_url_deep("/", BASE) == "https://www.example.com"
    assert U.normalize_url_deep("/a/?x=1", BASE) == "https://www.example.com/a?x=1"


def test_deep_variant_tracking_subset():
    # gclid is NOT in the deep variant's tracking list
    assert "gclid" in U.normalize_url_deep("/p?gclid=1", BASE)
    assert U.normalize_url_deep("/p?utm_source=x", BASE) == "https://www.example.com/p"


def test_base_domain():
    assert U.base_domain("https://www.example.com/a") == "example.com"
    assert U.base_domain("https://sub.example.co.uk/a") == "example.co.uk"
    assert U.base_domain("https://example.com:8080/a") == "example.com"
    assert U.base_domain("not a url") == ""


def test_is_external():
    assert not U.is_external("https://blog.example.com/x", "example.com")
    assert U.is_external("https://other.org/x", "example.com")
    assert U.is_external("mailto:a@b.com", "example.com")
    assert not U.is_external("/relative", "example.com")


def test_surt_host():
    assert U.surt_host("www.a.example.com") == "com,example,a,www"
    assert U.surt_host("") == ""


def test_valid_url():
    assert U.is_valid_url("https://a.com/x")
    assert not U.is_valid_url("ftp://a.com/x")
    assert not U.is_valid_url("https://localhost/x")
    assert not U.is_valid_url(None)


def test_nonsense():
    assert U.is_nonsense_url("https://a.com/style.css")
    assert U.is_nonsense_url("javascript:void(0)")
    assert not U.is_nonsense_url("https://a.com/page")
    assert not U.is_nonsense_url("https://a.com/page.html")
