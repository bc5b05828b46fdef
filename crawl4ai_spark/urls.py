"""URL canonicalization, classification and validation (frontier core).

Semantic-parity targets in the reference (studied, not copied):

- ``normalize_url``            — /root/reference/crawl4ai/utils.py:2229-2327
- ``normalize_url_deep``       — utils.py:2330-2386 (the variant BFS/DFS/BestFirst
  dedupe on, see deep_crawling/bfs_strategy.py:111)
- ``base_domain``              — utils.py:2464-2512
- ``is_external``              — utils.py:2515-2546
- URL validation               — deep_crawling/bfs_strategy.py:52-72
- nonsense-URL filter          — async_url_seeder.py:1330-1424

All functions are pure and deterministic → safe inside Arrow-batched pandas
UDFs, and a normalize-once-per-distinct-URL pre-pass (``dropDuplicates``)
replaces the reference's ``lru_cache``.

``surt_host`` is our scale addition (per BASELINE.json north_star): a
reversed-host key (``com,example,www``) so that range/bucket partitioning of
the frontier co-locates URLs of one registrable domain — the property that
makes per-host politeness a *local* groupBy instead of a global shuffle.
"""

from __future__ import annotations

from urllib.parse import parse_qs, parse_qsl, urlencode, urljoin, urlparse, urlunparse

import pandas as pd

# tracking params dropped by the full normalizer (parity: utils.py:2300-2303)
TRACKING_PARAMS = frozenset(
    {"utm_source", "utm_medium", "utm_campaign", "utm_term",
     "utm_content", "gclid", "fbclid", "ref", "ref_src"}
)
# smaller list used by the deep-crawl variant (parity: utils.py:2366)
TRACKING_PARAMS_DEEP = ("utm_source", "utm_medium", "utm_campaign", "ref", "fbclid")

NON_HTTP_SCHEMES = ("mailto:", "tel:", "ftp:", "file:", "data:", "javascript:")

# second-level labels under which a 3-part base domain is kept (co.uk etc.)
_SECOND_LEVEL = frozenset(
    {"co", "com", "org", "gov", "edu", "net", "mil", "int", "ac", "ad", "ae", "af", "ag"}
)

# extensions the seeder's nonsense filter rejects (asset, not a page)
_ASSET_EXTS = frozenset(
    {".css", ".js", ".mjs", ".png", ".jpg", ".jpeg", ".gif", ".webp", ".svg",
     ".ico", ".woff", ".woff2", ".ttf", ".eot", ".mp4", ".mp3", ".avi", ".mov",
     ".wav", ".zip", ".tar", ".gz", ".rar", ".7z", ".exe", ".dmg", ".apk",
     ".json", ".xml", ".rss", ".atom"}
)


def normalize_url(
    href: str | None,
    base_url: str,
    *,
    drop_query_tracking: bool = True,
    sort_query: bool = True,
    keep_fragment: bool = False,
    extra_drop_params=None,
) -> str | None:
    """Full canonical form: resolve, lowercase host, strip trailing '/',
    lowercase + sort + de-track query keys, drop fragment."""
    if not href:
        return None
    full = urljoin(base_url, href.strip())
    p = urlparse(full)

    netloc = p.netloc.lower()

    path = p.path
    if path.endswith("/") and path != "/":
        path = path.rstrip("/")

    query = p.query
    if query:
        pairs = [(k.lower(), v) for k, v in parse_qsl(query, keep_blank_values=True)]
        if drop_query_tracking:
            drop = TRACKING_PARAMS
            if extra_drop_params:
                drop = drop | {x.lower() for x in extra_drop_params}
            pairs = [(k, v) for k, v in pairs if k not in drop]
        if sort_query:
            pairs.sort(key=lambda kv: kv[0])
        query = urlencode(pairs, doseq=True) if pairs else ""

    fragment = p.fragment if keep_fragment else ""
    return urlunparse((p.scheme, netloc, path, p.params, query, fragment))


def normalize_url_deep(href: str | None, base_url: str) -> str | None:
    """The deep-crawl dedup key: multi-value query parse (dict-ordered),
    smaller tracking list, unconditional ``path.rstrip('/')``."""
    if not href:
        return None
    full = urljoin(base_url, href.strip())
    p = urlparse(full)
    query = p.query
    if query:
        params = parse_qs(query)
        for t in TRACKING_PARAMS_DEEP:
            params.pop(t, None)
        query = urlencode(params, doseq=True) if params else ""
    return urlunparse(
        (p.scheme, p.netloc.lower(), p.path.rstrip("/"), p.params, query, "")
    )


def base_domain(url: str) -> str:
    """Registrable domain: strip port + www., keep 3 labels for co.uk-style."""
    try:
        domain = urlparse(url).netloc.lower()
        if not domain:
            return ""
        domain = domain.split(":")[0]
        if domain.startswith("www."):
            domain = domain[4:]
        parts = domain.split(".")
        if len(parts) > 2 and parts[-2] in _SECOND_LEVEL:
            return ".".join(parts[-3:])
        return ".".join(parts[-2:])
    except (ValueError, AttributeError):
        return ""


def is_external(url: str, base: str) -> bool:
    """True if url points off the registrable domain (or is a special scheme)."""
    low = url.lower()
    if any(low.startswith(s) for s in NON_HTTP_SCHEMES):
        return True
    try:
        p = urlparse(url)
        if not p.netloc:
            return False
        url_domain = p.netloc.lower().replace("www.", "")
        return not url_domain.endswith(base.lower().replace("www.", ""))
    except ValueError:
        return False


def host_of(url: str) -> str:
    try:
        return urlparse(url).netloc.lower().split(":")[0]
    except ValueError:
        return ""


def surt_host(host: str) -> str:
    """Reversed host key for locality partitioning: www.a.example.com →
    ``com,example,a,www``."""
    if not host:
        return ""
    return ",".join(reversed(host.split(".")))


def is_valid_url(url: str | None) -> bool:
    """scheme ∈ {http, https}, netloc contains a dot, parseable."""
    if not url:
        return False
    try:
        p = urlparse(url)
        return p.scheme in ("http", "https") and "." in p.netloc
    except ValueError:
        return False


def is_nonsense_url(url: str) -> bool:
    """Asset/junk URLs a seeder should drop (mirrors the seeder's intent:
    extension blacklist + special schemes + empty host)."""
    low = url.lower()
    if any(low.startswith(s) for s in NON_HTTP_SCHEMES):
        return True
    try:
        p = urlparse(low)
    except ValueError:
        return True
    if not p.netloc:
        return True
    path = p.path
    dot = path.rfind(".")
    if dot != -1 and path[dot:] in _ASSET_EXTS:
        return True
    return False


# ---------------------------------------------------------------------------
# Vectorized (pandas Series) variants for use inside Arrow-batched UDFs.
# ---------------------------------------------------------------------------

def normalize_series(hrefs: pd.Series, bases: pd.Series) -> pd.Series:
    return pd.Series(
        [normalize_url(h, b) for h, b in zip(hrefs, bases)], index=hrefs.index, dtype=object
    )


def normalize_deep_series(hrefs: pd.Series, bases: pd.Series) -> pd.Series:
    return pd.Series(
        [normalize_url_deep(h, b) for h, b in zip(hrefs, bases)], index=hrefs.index, dtype=object
    )


def host_series(urls: pd.Series) -> pd.Series:
    return urls.map(host_of)


def surt_series(urls: pd.Series) -> pd.Series:
    return urls.map(lambda u: surt_host(host_of(u)))
