"""Property-based tests (hypothesis) for the URL canonicalization core —
the frontier dedup key must be idempotent and total (never raises), or the
URL-seen set corrupts silently at 10^10 scale."""

from hypothesis import given, settings
from hypothesis import strategies as st

from crawl4ai_spark import urls as U

_SCHEMES = st.sampled_from(["http", "https", "HTTP", "HTTPS"])
_HOSTS = st.from_regex(r"[a-zA-Z0-9.\-]{1,40}", fullmatch=True)
_PATHS = st.from_regex(r"(/[a-zA-Z0-9._~%\-]{0,12}){0,6}/?", fullmatch=True)
_QUERIES = st.from_regex(r"([a-zA-Z0-9_]{1,8}=[a-zA-Z0-9_]{0,8}&?){0,5}", fullmatch=True)
_FRAGS = st.from_regex(r"[a-zA-Z0-9\-]{0,10}", fullmatch=True)


@st.composite
def urls(draw):
    return (f"{draw(_SCHEMES)}://{draw(_HOSTS)}{draw(_PATHS)}"
            f"?{draw(_QUERIES)}#{draw(_FRAGS)}")


@given(urls())
@settings(max_examples=300, deadline=None)
def test_normalize_idempotent(u):
    base = "https://example.com/a/"
    once = U.normalize_url_deep(u, base)
    if once is None:
        return
    twice = U.normalize_url_deep(once, base)
    assert twice == once, f"not idempotent: {u!r} → {once!r} → {twice!r}"


@given(st.text(max_size=200))
@settings(max_examples=300, deadline=None)
def test_normalize_total_on_garbage(s):
    # never raises, whatever bytes arrive from the wild web
    U.normalize_url_deep(s, "https://example.com/")
    U.is_valid_url(s)
    U.is_nonsense_url(s if s else "x")


@given(urls())
@settings(max_examples=200, deadline=None)
def test_fragment_and_tracking_never_survive(u):
    out = U.normalize_url_deep(u, "https://example.com/")
    if out is None:
        return
    assert "#" not in out
    assert "utm_" not in out.split("?")[-1] if "?" in out else True


@given(urls())
@settings(max_examples=200, deadline=None)
def test_host_functions_total(u):
    h = U.host_of(u)
    assert U.surt_host(h) == U.surt_host(h)  # deterministic
    U.base_domain(u)
