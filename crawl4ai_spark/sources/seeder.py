"""URL seeding pipeline (ref AsyncUrlSeeder, async_url_seeder.py):

- :func:`synthetic_cc_index` — the Common-Crawl CDX index seeder (S5,
  async_url_seeder.py:709-762 ``_from_cc``) replaced by a deterministic
  in-cluster generator (no network in this sandbox): one row per candidate
  url with CC-index-style columns (url, domain, status, mime, warc_ts).
- :func:`seed_urls` — the producer/consumer pipeline (F17,
  async_url_seeder.py:267-448 ``urls``) as one declarative lineage:
  glob pattern filter (:250-258 pattern match), nonsense-URL filter
  (:1330-1424 ``_is_nonsense_url`` — utility pages, asset extensions,
  tracker/api paths), optional BM25 relevance ranking against per-url head
  text (F18, :645-677), and ``max_urls`` cap (:365-376).

Everything is column predicates + one explode/groupBy for BM25 — the
backpressure/QPS machinery of the reference (bounded queue, hits_per_sec
semaphore) is admission control Spark already owns.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

# asset-extension / api-path drop — an EXTENSION beyond the reference (its
# corresponding blocks are commented out, async_url_seeder.py:1360-1398);
# kept because a training-data seeder wants them gone
NONSENSE_EXT_RE = r"\.(js|css|png|jpe?g|gif|svg|ico|woff2?|ttf|eot|map|json|xmlrpc)$"
NONSENSE_PATH_RE = r"/(wp-json|wp-admin|cgi-bin|cdn-cgi|__api|trackback)(/|$)"

# ---------------------------------------------------------------------------
# the reference's ACTIVE _is_nonsense_url rules (async_url_seeder.py:1330-1424),
# reference-exact (golden-checked in tests/test_url_parity_golden.py):
# robots/sitemap files, utility files, hidden path segments, non-content
# paths, print patterns, and too-short paths outside the language whitelist.
# ---------------------------------------------------------------------------

_UTILITY_FILES = [
    "ads.txt", "humans.txt", "security.txt", ".well-known/security.txt",
    "crossdomain.xml", "browserconfig.xml", "manifest.json",
    "apple-app-site-association", ".well-known/apple-app-site-association",
    "favicon.ico", "apple-touch-icon.png", "android-chrome-192x192.png",
]
_NON_CONTENT_PATHS = [
    "/wp-admin", "/wp-includes", "/wp-content/uploads",
    "/admin", "/login", "/signin", "/signup", "/register",
    "/checkout", "/cart", "/account", "/profile",
    "/search", "/404", "/error",
    "/.git", "/.svn", "/.hg",
    "/cgi-bin", "/scripts", "/includes",
]
_PRINT_PATTERNS = ["?print=", "&print=", "/print/", "_print."]
_SHORT_PATH_WHITELIST = ["/", "/en", "/de", "/fr", "/es", "/it"]


def is_nonsense_seed_url(url: str) -> bool:
    """Pure-Python twin of the reference seeder filter (same rule order)."""
    from urllib.parse import urlparse

    url_lower = url.lower()
    path = urlparse(url).path.lower()
    if path.endswith(("/robots.txt", "/sitemap.xml", "/sitemap_index.xml")):
        return True
    if "/sitemap" in path and path.endswith((".xml", ".xml.gz", ".txt")):
        return True
    if any(path.endswith(f"/{f}") for f in _UTILITY_FILES):
        return True
    if any(part.startswith(".") for part in path.split("/") if part):
        return True
    if any(ncp in path for ncp in _NON_CONTENT_PATHS):
        return True
    if any(pat in url_lower for pat in _PRINT_PATTERNS):
        return True
    if len(path.strip("/")) < 3 and path not in _SHORT_PATH_WHITELIST:
        return True
    return False


def url_relevance_score(query: str, url: str) -> float:
    """URL-string relevance fallback (F18 tail), reference-exact
    (_calculate_url_relevance_score, async_url_seeder.py:1242-1328;
    golden-checked): exact/substring part matches, per-token coverage
    scores, 3-gram Jaccard, combined by a 1/(rank+1)-weighted average of
    the sorted scores, capped at 1.0. Used when a query is given but no
    head text exists (the reference's no-head fallback path)."""
    from urllib.parse import urlparse

    q = query.lower()
    parsed = urlparse(url)
    domain = parsed.netloc.replace("www.", "")
    path = parsed.path.strip("/")
    parts = domain.split(".") + [p for p in path.split("/") if p]
    if parsed.query:
        for param in parsed.query.split("&"):
            if "=" in param:
                k, v = param.split("=", 1)
                parts.extend([k, v])

    scores: list[float] = []
    for part in parts:
        pl = part.lower()
        if q in pl:
            scores.append(1.0)
        elif pl in q:
            scores.append(0.9)
    for token in q.split():
        best: list[float] = []
        for part in parts:
            pl = part.lower()
            if token in pl:
                best.append(0.7 * (len(token) / len(pl)))
            elif pl in token:
                best.append(0.6 * (len(pl) / len(token)))
        if best:
            scores.append(max(best))

    url_text = " ".join(parts).lower()
    if len(q) >= 3 and len(url_text) >= 3:
        qg = {q[i:i + 3] for i in range(len(q) - 2)}
        ug = {url_text[i:i + 3] for i in range(len(url_text) - 2)}
        if qg and ug:
            union = len(qg | ug)
            scores.append(0.5 * (len(qg & ug) / union) if union else 0.0)

    if not scores:
        return 0.0
    scores.sort(reverse=True)
    num = den = 0.0
    for i, s in enumerate(scores):
        w = 1.0 / (i + 1)
        num += s * w
        den += w
    return min(num / den if den else 0.0, 1.0)


def nonsense_seed_url(url) -> "F.Column":
    """The same rules as whole-stage-codegen column predicates."""
    low = F.lower(url)
    path = F.lower(F.coalesce(F.try_parse_url(url, F.lit("PATH")), F.lit("")))
    p = F.lit(False)
    p = p | path.rlike(r"/(robots\.txt|sitemap\.xml|sitemap_index\.xml)$")
    p = p | (path.contains("/sitemap")
             & path.rlike(r"\.(xml|xml\.gz|txt)$"))
    for f in _UTILITY_FILES:
        p = p | path.endswith("/" + f)
    p = p | path.rlike(r"/\.")          # hidden segment (part startswith '.')
    for ncp in _NON_CONTENT_PATHS:
        p = p | path.contains(ncp)
    for pat in _PRINT_PATTERNS:
        p = p | low.contains(pat)
    p = p | ((F.length(F.regexp_replace(path, r"^/+|/+$", "")) < 3)
             & ~path.isin(_SHORT_PATH_WHITELIST))
    return p

_WORDS = (
    "crawl spark data engine index page article doc guide api blog news "
    "shop item press about contact search tag category archive"
).split()


def _glob_to_regex(pattern: str) -> str:
    """Glob → anchored regex (ref uses fnmatch semantics,
    async_url_seeder.py:250-258): * → .*, ? → . — everything else literal."""
    out = []
    for ch in pattern:
        if ch == "*":
            out.append(".*")
        elif ch == "?":
            out.append(".")
        else:
            out.append(re.escape(ch))
    return "^" + "".join(out) + "$"


def synthetic_cc_index(spark: SparkSession, n_domains: int = 20,
                       urls_per_domain: int = 50) -> DataFrame:
    """Deterministic CC-index-style candidate table."""
    total = n_domains * urls_per_domain
    base = spark.range(total).select(
        (F.col("id") % n_domains).alias("d"),
        (F.col("id") / n_domains).cast("long").alias("p"),
    )
    word = F.element_at(
        F.array(*[F.lit(w) for w in _WORDS]),
        (F.pmod(F.xxhash64(F.concat_ws("/", "d", "p")), F.lit(len(_WORDS))) + 1).cast("int"),
    )
    seg = (
        F.when(F.col("p") % 11 == 3, F.concat(F.lit("asset"), F.col("p"), F.lit(".css")))
        .when(F.col("p") % 13 == 5, F.concat(F.lit("wp-json/v"), F.col("p")))
        .otherwise(F.concat(word, F.lit("-"), F.col("p"), F.lit(".html")))
    )
    return base.select(
        F.concat(F.lit("https://www.site"), F.col("d"), F.lit(".com/"), word,
                 F.lit("/"), seg).alias("url"),
        F.concat(F.lit("www.site"), F.col("d"), F.lit(".com")).alias("domain"),
        F.lit(200).alias("status"),
        F.when(F.col("p") % 11 == 3, "text/css").otherwise("text/html").alias("mime"),
        # deterministic pseudo head-text for BM25 ranking (stand-in for the
        # reference's live <head> fetch, link_preview.py:18-260)
        F.concat_ws(
            " ", word,
            F.element_at(F.array(*[F.lit(w) for w in _WORDS]),
                         (F.pmod(F.xxhash64("p"), F.lit(len(_WORDS))) + 1).cast("int")),
            F.element_at(F.array(*[F.lit(w) for w in _WORDS]),
                         (F.pmod(F.xxhash64("d", "p"), F.lit(len(_WORDS))) + 1).cast("int")),
        ).alias("head_text"),
    )


def seed_urls(seeds: DataFrame, *, pattern: str | None = None,
              query: str | None = None, score_threshold: float | None = None,
              max_urls: int | None = None) -> DataFrame:
    """The seeding pipeline as one lineage. Returns (url, domain, score)."""
    out = seeds
    if pattern:
        out = out.filter(F.col("url").rlike(_glob_to_regex(pattern)))
    # reference-exact nonsense rules + the asset-extension extension
    out = out.filter(~nonsense_seed_url(F.col("url"))) \
             .filter(~F.lower("url").rlike(NONSENSE_EXT_RE)) \
             .filter(~F.lower("url").rlike(NONSENSE_PATH_RE))

    if query:
        if "head_text" in out.columns:
            out = _bm25_score(out, query)
        else:
            # no head data → the reference's URL-string relevance fallback
            out = _url_relevance(out, query)
        if score_threshold is not None:
            out = out.filter(F.col("score") >= score_threshold)
        order = [F.desc("score"), F.asc("url")]
    else:
        out = out.withColumn("score", F.lit(0.0))
        order = [F.asc("url")]

    if max_urls is not None:
        out = out.orderBy(*order).limit(max_urls)  # TakeOrdered, no global window
    return out.select("url", "domain", "score")


# ---------------------------------------------------------------------------
# Common-Crawl CDX index parsing (S5 real path) — parity target
# async_url_seeder.py:709-762 ``_from_cc``: the CC index API answers JSONL
# CDX records ({"urlkey","timestamp","url","mime","status","digest",...});
# the reference streams them line-by-line and yields rec["url"] filtered by
# the caller's glob. Here the fetched responses are a blob table and one
# Arrow pass parses them (gz transparently, like the sitemap path).
# ---------------------------------------------------------------------------

def cc_index_glob(domain: str) -> str:
    """The reference's CC query-glob construction (reference-exact,
    _from_cc :713-732): strip scheme/fragment/query and leading dots, then
    ``*.{raw}*`` when a path is present else ``*.{raw}/*``."""
    raw = re.sub(r"^https?://", "", domain).split("#", 1)[0].split("?", 1)[0].lstrip(".")
    return f"*.{raw}*" if "/" in raw else f"*.{raw}/*"


def synthetic_cdx_blobs(spark: SparkSession, n_domains: int = 3,
                        urls_per_domain: int = 20) -> DataFrame:
    """Deterministic CDX-API response blobs (domain, body binary): JSONL
    records in the real CC CDX shape; odd domains gzip their response."""
    import gzip as _gzip
    import json as _json

    import pandas as pd

    def build(batches):
        for pdf in batches:
            rows = []
            for d in pdf["id"]:
                dom = f"cdx{d}.com"
                lines = []
                for i in range(urls_per_domain):
                    url = f"https://www.{dom}/a{i % 4}/p{i}.html"
                    lines.append(_json.dumps({
                        "urlkey": f"com,cdx{d})/a{i % 4}/p{i}.html",
                        "timestamp": f"202401{(i % 27) + 1:02d}120000",
                        "url": url,
                        "mime": "text/html" if i % 5 else "application/pdf",
                        "status": "200" if i % 7 else "301",
                        "digest": f"SHA1DIGEST{d}X{i}",
                        "length": str(1000 + i),
                    }))
                body = ("\n".join(lines) + "\n").encode()
                if int(d) % 2 == 1:
                    body = _gzip.compress(body, mtime=0)
                rows.append((dom, body))
            yield pd.DataFrame(rows, columns=["domain", "body"])

    return spark.range(n_domains).mapInPandas(build, "domain string, body binary")


def parse_cc_index_blobs(blobs: DataFrame, pattern: str | None = None
                         ) -> DataFrame:
    """One Arrow pass over (domain, body): gunzip when magic-tagged, parse
    JSONL CDX records, emit (url, domain, status, mime, warc_ts). An
    optional glob ``pattern`` filters urls like the reference's ``_match``."""
    import gzip as _gzip
    import json as _json

    import pandas as pd

    rx = re.compile(_glob_to_regex(pattern)) if pattern else None

    def parse(batches):
        for pdf in batches:
            rows = []
            for dom, body in zip(pdf["domain"], pdf["body"]):
                raw = bytes(body or b"")
                if raw[:2] == b"\x1f\x8b":
                    try:
                        raw = _gzip.decompress(raw)
                    except OSError:
                        continue
                for line in raw.decode("utf-8", "ignore").splitlines():
                    line = line.strip()
                    if not line:
                        continue
                    try:
                        rec = _json.loads(line)
                    except ValueError:
                        continue
                    u = rec.get("url")
                    if not u or (rx and not rx.match(u)):
                        continue
                    rows.append((u, dom, rec.get("status"), rec.get("mime"),
                                 rec.get("timestamp")))
            yield pd.DataFrame(
                rows, columns=["url", "domain", "status", "mime", "warc_ts"])

    return blobs.mapInPandas(
        parse, "url string, domain string, status string, mime string, warc_ts string")


# ---------------------------------------------------------------------------
# Sitemap seeding (S6) — parity target async_url_seeder.py:765-1004
# (_from_sitemaps/_iter_sitemap): robots.txt ``Sitemap:`` lines + the
# conventional /sitemap.xml probe are the roots; <sitemapindex> documents
# recurse; .gz bodies are transparently decompressed; XML parsing is
# namespace-agnostic (the reference's namespace test,
# tests/unit/test_sitemap_namespace_parsing.py, is the behavioral spec).
# ---------------------------------------------------------------------------

SITEMAP_PARSE_SCHEMA = "host string, src string, kind string, loc string, lastmod string"


def synthetic_sitemap_blobs(spark: SparkSession, n_hosts: int = 3,
                            urls_per_host: int = 9) -> DataFrame:
    """Deterministic fetched-blob table (host, url, body binary) standing in
    for the reference's HTTP fetches: per host a robots.txt advertising a
    gzipped sitemap index, which fans out to a plain urlset, a gzipped
    urlset, and a NESTED index reaching a third urlset."""
    import gzip as _gzip

    import pandas as pd

    def build(batches):
        for pdf in batches:
            rows = []
            for h in pdf["id"]:
                host = f"www.smap{h}.com"
                base = f"https://{host}"
                third = urls_per_host // 3
                def urlset(lo, hi):
                    items = "".join(
                        f"<url><loc>{base}/p{i}</loc>"
                        f"<lastmod>2025-0{1 + i % 9}-01</lastmod></url>"
                        for i in range(lo, hi)
                    )
                    return ('<?xml version="1.0" encoding="UTF-8"?>'
                            '<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">'
                            f"{items}</urlset>").encode()
                nested_idx = (
                    '<?xml version="1.0"?><sitemapindex>'
                    f"<sitemap><loc>{base}/sitemap_c.xml</loc></sitemap>"
                    "</sitemapindex>"
                ).encode()
                top_idx = (
                    '<?xml version="1.0"?>'
                    '<sitemapindex xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">'
                    f"<sitemap><loc>{base}/sitemap_a.xml</loc></sitemap>"
                    f"<sitemap><loc>{base}/sitemap_b.xml.gz</loc></sitemap>"
                    f"<sitemap><loc>{base}/nested_index.xml</loc></sitemap>"
                    "</sitemapindex>"
                ).encode()
                robots = (f"User-agent: *\nDisallow: /private\n"
                          f"Sitemap: {base}/sitemap_index.xml.gz\n").encode()
                rows += [
                    (host, f"{base}/robots.txt", robots),
                    (host, f"{base}/sitemap_index.xml.gz",
                     _gzip.compress(top_idx, mtime=0)),
                    (host, f"{base}/sitemap_a.xml", urlset(0, third)),
                    (host, f"{base}/sitemap_b.xml.gz",
                     _gzip.compress(urlset(third, 2 * third), mtime=0)),
                    (host, f"{base}/nested_index.xml", nested_idx),
                    (host, f"{base}/sitemap_c.xml",
                     urlset(2 * third, urls_per_host)),
                ]
            yield pd.DataFrame(rows, columns=["host", "url", "body"])

    return spark.range(n_hosts).mapInPandas(build, "host string, url string, body binary")


def parse_sitemap_blobs(blobs: DataFrame) -> DataFrame:
    """One Arrow pass over (host, url, body): gunzip when magic-tagged, then
    either harvest robots ``Sitemap:`` lines or parse the XML (local-name
    matching, so any/no namespace works). Emits
    (host, src, kind ∈ robots|sitemapindex|sitemap, loc, lastmod)."""
    import gzip as _gzip
    import xml.etree.ElementTree as ET

    import pandas as pd

    def _local(tag: str) -> str:
        return tag.rsplit("}", 1)[-1].lower()

    def parse(batches):
        for pdf in batches:
            rows = []
            for host, src, body in zip(pdf["host"], pdf["url"], pdf["body"]):
                raw = bytes(body or b"")
                if raw[:2] == b"\x1f\x8b":
                    try:
                        raw = _gzip.decompress(raw)
                    except OSError:
                        continue
                if src.endswith("robots.txt"):
                    for line in raw.decode("utf-8", "replace").splitlines():
                        k, _, v = line.partition(":")
                        if k.strip().lower() == "sitemap" and v.strip():
                            rows.append((host, src, "robots", v.strip(), None))
                    continue
                try:
                    root = ET.fromstring(raw.decode("utf-8", "replace"))
                except ET.ParseError:
                    continue
                kind = _local(root.tag)
                if kind not in ("sitemapindex", "urlset"):
                    continue
                kind = "sitemapindex" if kind == "sitemapindex" else "sitemap"
                for entry in root:
                    loc = lastmod = None
                    for child in entry:
                        if _local(child.tag) == "loc":
                            loc = (child.text or "").strip()
                        elif _local(child.tag) == "lastmod":
                            lastmod = (child.text or "").strip()
                    if loc:
                        rows.append((host, src, kind, loc, lastmod))
            yield pd.DataFrame(rows, columns=["host", "src", "kind", "loc", "lastmod"])

    return blobs.mapInPandas(parse, SITEMAP_PARSE_SCHEMA)


def seed_from_sitemaps(spark: SparkSession, blobs: DataFrame, *,
                       max_rounds: int = 4) -> DataFrame:
    """Resolve the sitemap graph to page URLs: roots = robots ``Sitemap:``
    targets plus any /sitemap.xml convention blob; each round joins the
    pending sitemap URLs against the blob table, parses that DELTA only, and
    recurses into index entries (anti-joined against visited — O(delta) per
    round, never reparsing). Returns (url, host, lastmod, source_sitemap)."""
    parsed = parse_sitemap_blobs(blobs).cache()
    roots = parsed.filter(F.col("kind") == "robots").select("loc").union(
        blobs.select(F.col("url").alias("loc"))
             .filter(F.col("loc").rlike(r"/sitemap\.xml(\.gz)?$"))
    ).distinct()

    visited = roots
    pending = roots
    pages = None
    for _ in range(max_rounds):
        hit = parsed.join(pending.withColumnRenamed("loc", "src"), on="src")
        found = hit.filter(F.col("kind") == "sitemap").select(
            F.col("loc").alias("url"), "host", "lastmod",
            F.col("src").alias("source_sitemap"))
        pages = found if pages is None else pages.unionByName(found)
        nxt = (
            hit.filter(F.col("kind") == "sitemapindex").select("loc").distinct()
            .join(visited, on="loc", how="left_anti")
        )
        if nxt.isEmpty():
            break
        visited = visited.union(nxt).distinct()
        pending = nxt
    out = pages if pages is not None else spark.createDataFrame(
        [], "url string, host string, lastmod string, source_sitemap string")
    return out.dropDuplicates(["url"])


# ---------------------------------------------------------------------------
# RSS/Atom feed seeding — the sitemap sibling for the long tail of sites
# that publish feeds but no sitemap (blogs, news, forums). Same two-phase
# shape as the sitemap pipeline: an autodiscovery pass harvests feed URLs
# from HTML `<link rel="alternate" type="application/rss+xml|atom+xml">`
# head tags (the RSS-autodiscovery convention the reference's seeder's
# head-fetch surface exposes), then ONE Arrow parse pass over the feed
# blobs extracts item URLs — RSS 2.0 `<item><link>` text nodes, Atom
# `<entry><link rel="alternate" href>` attributes (ignoring rel="self"
# service links), gz transparently, namespace-agnostic like the sitemap
# parser. Emits (url, host, published, feed_url, feed_kind).
# ---------------------------------------------------------------------------

FEED_PARSE_SCHEMA = ("host string, feed_url string, feed_kind string, "
                     "loc string, published string")


def synthetic_feed_blobs(spark: SparkSession, n_hosts: int = 3,
                         items_per_host: int = 9) -> DataFrame:
    """Deterministic fetched-blob table (host, url, body) per host: an HTML
    landing page autodiscovering three feeds — a plain RSS 2.0 channel, an
    Atom feed (entries carrying both rel=self and rel=alternate links), and
    a GZIPPED RSS feed — which together cover items 0..items_per_host-1."""
    import gzip as _gzip

    import pandas as pd

    def build(batches):
        for pdf in batches:
            rows = []
            for h in pdf["id"]:
                host = f"www.feed{h}.com"
                base = f"https://{host}"
                third = items_per_host // 3

                def rss(lo, hi):
                    items = "".join(
                        f"<item><title>post {i}</title>"
                        f"<link>{base}/post/{i}</link>"
                        f"<pubDate>Mon, 0{1 + i % 9} Jan 2025 00:00:00 GMT"
                        f"</pubDate><guid>{base}/post/{i}</guid></item>"
                        for i in range(lo, hi))
                    return ('<?xml version="1.0" encoding="UTF-8"?>'
                            '<rss version="2.0"><channel>'
                            f"<title>{host}</title><link>{base}</link>"
                            f"{items}</channel></rss>").encode()

                atom_entries = "".join(
                    f"<entry><title>post {i}</title>"
                    f'<link rel="self" href="{base}/atom.xml"/>'
                    f'<link rel="alternate" href="{base}/post/{i}"/>'
                    f"<updated>2025-01-0{1 + i % 9}T00:00:00Z</updated>"
                    f"<id>{base}/post/{i}</id></entry>"
                    for i in range(third, 2 * third))
                atom = ('<?xml version="1.0" encoding="UTF-8"?>'
                        '<feed xmlns="http://www.w3.org/2005/Atom">'
                        f"<title>{host}</title>{atom_entries}</feed>"
                        ).encode()
                html = (
                    "<html><head>"
                    '<link rel="alternate" type="application/rss+xml" '
                    f'href="{base}/feed.xml">'
                    '<link rel="alternate" type="application/atom+xml" '
                    f'href="{base}/atom.xml">'
                    '<link rel="alternate" type="application/rss+xml" '
                    f'href="{base}/archive.xml.gz">'
                    '<link rel="stylesheet" href="/style.css">'
                    "</head><body>home</body></html>").encode()
                rows += [
                    (host, f"{base}/", html),
                    (host, f"{base}/feed.xml", rss(0, third)),
                    (host, f"{base}/atom.xml", atom),
                    (host, f"{base}/archive.xml.gz",
                     _gzip.compress(rss(2 * third, items_per_host),
                                    mtime=0)),
                ]
            yield pd.DataFrame(rows, columns=["host", "url", "body"])

    return spark.range(n_hosts).mapInPandas(
        build, "host string, url string, body binary")


def discover_feeds(blobs: DataFrame) -> DataFrame:
    """Autodiscovery: native regexp over HTML bodies for
    `<link rel="alternate" type="application/(rss|atom)+xml" href=...>` —
    zero python, pushd down to the scan. Returns (host, feed_url)."""
    link_re = (r'<link\s+rel="alternate"\s+type="application/'
               r'(?:rss|atom)\+xml"\s+href="([^"]+)"')
    html = blobs.withColumn("txt", F.col("body").cast("string"))
    return (html
            .select("host",
                    F.explode(F.regexp_extract_all(
                        F.col("txt"), F.lit(link_re), F.lit(1)))
                    .alias("feed_url"))
            .distinct())


def parse_feed_blobs(blobs: DataFrame, feeds: DataFrame) -> DataFrame:
    """One Arrow pass over the discovered feed blobs: gunzip when
    magic-tagged, parse RSS `<item><link>` text or Atom `<entry><link
    rel=alternate href>` (local-name matching, any/no namespace), emit
    (host, feed_url, feed_kind, loc, published)."""
    import gzip as _gzip
    import xml.etree.ElementTree as ET

    import pandas as pd

    def _local(tag: str) -> str:
        return tag.rsplit("}", 1)[-1].lower()

    def parse(batches):
        for pdf in batches:
            rows = []
            for host, src, body in zip(pdf["host"], pdf["url"], pdf["body"]):
                raw = bytes(body or b"")
                if raw[:2] == b"\x1f\x8b":
                    try:
                        raw = _gzip.decompress(raw)
                    except OSError:
                        continue
                try:
                    root = ET.fromstring(raw.decode("utf-8", "replace"))
                except ET.ParseError:
                    continue
                kind = _local(root.tag)
                if kind == "rss":
                    for item in root.iter():
                        if _local(item.tag) != "item":
                            continue
                        loc = pub = None
                        for child in item:
                            if _local(child.tag) == "link":
                                loc = (child.text or "").strip()
                            elif _local(child.tag) == "pubdate":
                                pub = (child.text or "").strip()
                        if loc:
                            rows.append((host, src, "rss", loc, pub))
                elif kind == "feed":
                    for entry in root:
                        if _local(entry.tag) != "entry":
                            continue
                        loc = pub = None
                        for child in entry:
                            if (_local(child.tag) == "link"
                                    and child.get("rel", "alternate")
                                    == "alternate"):
                                loc = (child.get("href") or "").strip()
                            elif _local(child.tag) == "updated":
                                pub = (child.text or "").strip()
                        if loc:
                            rows.append((host, src, "atom", loc, pub))
            yield pd.DataFrame(rows, columns=[
                "host", "feed_url", "feed_kind", "loc", "published"])

    keep = blobs.join(feeds.withColumnRenamed("feed_url", "url")
                      .select("url"), "url")
    return keep.mapInPandas(parse, FEED_PARSE_SCHEMA)


def seed_from_feeds(spark: SparkSession, blobs: DataFrame) -> DataFrame:
    """Autodiscover feeds from the HTML blobs, parse them, return page URLs:
    (url, host, published, feed_url, feed_kind), deduped on url (an item
    syndicated by several feeds keeps the lexicographically first feed —
    deterministic)."""
    feeds = discover_feeds(blobs)
    parsed = parse_feed_blobs(blobs, feeds)
    w = Window.partitionBy("loc").orderBy("feed_url")
    return (parsed.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1)
            .select(F.col("loc").alias("url"), "host", "published",
                    "feed_url", "feed_kind"))


def _url_relevance(seeds: DataFrame, query: str) -> DataFrame:
    """Arrow-batched url_relevance_score over the seed urls."""
    import pandas as pd

    def score(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            pdf = pdf.copy()
            pdf["score"] = [url_relevance_score(query, u) for u in pdf["url"]]
            yield pdf

    from pyspark.sql import types as T

    schema = T.StructType(
        list(seeds.schema.fields) + [T.StructField("score", T.DoubleType())])
    return seeds.mapInPandas(score, schema)


def _bm25_score(seeds: DataFrame, query: str, k1: float = 1.2, b: float = 0.75) -> DataFrame:
    """BM25 over head_text (ref async_url_seeder.py:645-677): df/avgdl are
    corpus aggregates (two passes), the scoring join broadcasts the tiny idf
    table. Mirrors ops/ranking.py at the seed-table granularity."""
    terms = [t for t in re.findall("[a-z0-9]+", query.lower())]
    spark = seeds.sparkSession
    tdf = spark.createDataFrame([(t,) for t in terms], ["term"])
    toks = seeds.select(
        "url", F.explode(F.regexp_extract_all(F.lower("head_text"),
                                              F.lit("[a-z0-9]+"), F.lit(0))).alias("tok"))
    n_docs = seeds.count()
    dl = toks.groupBy("url").agg(F.count("*").alias("dl"))
    avgdl = dl.agg(F.avg("dl").alias("avgdl"))
    tf = toks.join(F.broadcast(tdf), toks.tok == tdf.term).groupBy("url", "term") \
             .agg(F.count("*").alias("tf"))
    idf = tf.groupBy("term").agg(F.countDistinct("url").alias("df")).withColumn(
        "idf", F.log((F.lit(float(n_docs)) - F.col("df") + 0.5) / (F.col("df") + 0.5) + 1.0))
    scored = (
        tf.join(F.broadcast(idf), "term").join(dl, "url").crossJoin(F.broadcast(avgdl))
        .withColumn("part", F.col("idf") * (F.col("tf") * (k1 + 1))
                    / (F.col("tf") + k1 * (1 - b + b * F.col("dl") / F.col("avgdl"))))
        .groupBy("url").agg(F.sum("part").alias("score"))
    )
    return seeds.join(scored, "url", "left").fillna({"score": 0.0})
