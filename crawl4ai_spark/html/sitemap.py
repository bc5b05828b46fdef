"""Canonical sitemaps.org XML writer — the crawl's re-seed artifact.

Closes the loop the reference leaves open: its AsyncUrlSeeder CONSUMES
sitemaps (/root/reference/crawl4ai/async_url_seeder.py:461-520) but nothing
EMITS one. A crawl that archives segments (WARC/WET/WAT) and publishes
per-host sitemaps is self-hosting: the next crawl (ours or anyone's) seeds
from the previous crawl's output, and ``sources/seeder.py`` is the matching
reader (``seed_from_sitemaps``) — tested byte-level roundtrip.

Canonical form (deterministic, byte-stable; oracled via md5 in
ops/crawlq.py q_sitemap_emit): one line per element, entries sorted by loc,
minimal XML escaping (& < > only — the three characters that can occur in a
URL-safe string and change XML semantics), fixed sitemaps.org namespace.
Protocol caps honored: ``build_urlset`` refuses > 50,000 entries (the
sitemaps.org limit); callers shard and link shards with
``build_sitemap_index``.
"""

from __future__ import annotations

MAX_URLS_PER_SITEMAP = 50_000

_HEADER = '<?xml version="1.0" encoding="UTF-8"?>\n'
_NS = "http://www.sitemaps.org/schemas/sitemap/0.9"


def xml_escape(s: str) -> str:
    """Minimal, order-correct escape: & first, then the angle brackets."""
    return s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")


def build_urlset(locs: list[str], *, lastmod: str | None = None) -> bytes:
    """Canonical <urlset> document: locs sorted, one <url> line each,
    optional shared <lastmod>. Raises on protocol-cap violation rather than
    silently truncating (the caller owns sharding)."""
    if len(locs) > MAX_URLS_PER_SITEMAP:
        raise ValueError(
            f"urlset of {len(locs)} exceeds the sitemaps.org cap of "
            f"{MAX_URLS_PER_SITEMAP}; shard and use build_sitemap_index")
    lm = f"<lastmod>{lastmod}</lastmod>" if lastmod else ""
    body = "".join(
        f"<url><loc>{xml_escape(u)}</loc>{lm}</url>\n" for u in sorted(locs))
    return (f'{_HEADER}<urlset xmlns="{_NS}">\n{body}</urlset>\n'
            ).encode("utf-8")


def build_sitemap_index(locs: list[str]) -> bytes:
    """Canonical <sitemapindex> linking shard urlsets (sorted)."""
    body = "".join(
        f"<sitemap><loc>{xml_escape(u)}</loc></sitemap>\n"
        for u in sorted(locs))
    return (f'{_HEADER}<sitemapindex xmlns="{_NS}">\n{body}</sitemapindex>\n'
            ).encode("utf-8")
