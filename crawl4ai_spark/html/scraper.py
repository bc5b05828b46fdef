"""Scrape stage: HTML → (cleaned_html, text, links, media, tables, metadata).

Capability parity with the reference's LXMLWebScrapingStrategy
(/root/reference/crawl4ai/content_scraping_strategy.py:101-913), rebuilt on
the dependency-free DOM in :mod:`crawl4ai_spark.html.dom`:

- honor ``<base href>``                       (ref :245-253)
- link harvest + normalize + internal/external split, dedup by href (ref :255-335)
- image scoring with threshold IMAGE_SCORE_THRESHOLD=2 (ref :410-515; config.py:50)
- strip script/style/link/meta/noscript + comments + excluded tags/selector
- bottom-up empty-element removal, word threshold, <pre>/<code> exempt (ref :517-567)
- attribute stripping to IMPORTANT_ATTRS (ref :569-604; config.py:94)
- metadata extraction (title/description/keywords/author/og:*/twitter:*/article:*)
  (ref utils.py:1497-1580)
- data-vs-layout table scoring, threshold 7 (ref table_extraction.py:66-296)
- per-link intrinsic quality score 0–10 (ref utils.py:3267-3379)

Pure + deterministic: this function IS the golden oracle the Spark pandas-UDF
pipeline must match byte-for-byte.
"""

from __future__ import annotations

import re

from crawl4ai_spark.html.dom import Comment, Node, parse_html, select
from crawl4ai_spark import urls as U

MIN_WORD_THRESHOLD = 1           # ref config.py:47
IMAGE_SCORE_THRESHOLD = 2        # ref config.py:50
IMPORTANT_ATTRS = frozenset(     # ref config.py:94, + class/id kept for the
    {"src", "href", "alt", "title", "width", "height", "class", "id"}
)                                # pruning filter's class_id_weight signal

_REMOVE_TAGS = frozenset({"script", "style", "link", "meta", "noscript", "template", "base"})
_EMPTY_EXEMPT = frozenset({"pre", "code", "img", "br", "hr", "table", "td", "th",
                           "video", "audio", "iframe", "body", "html"})
# superset of the reference's ["button","icon","logo"] chrome markers
# (process_image early-returns on them; we score-penalize instead)
_BAD_IMG_RE = re.compile(
    r"button|icon|logo|sprite|avatar|badge|pixel|tracker", re.I)
_WS = re.compile(r"\s+")


def _clean_text(s: str) -> str:
    return _WS.sub(" ", s).strip()


# ---------------------------------------------------------------------------
# links
# ---------------------------------------------------------------------------

_PUNCT_STRIP = '.,!?;:"()[]{}'
_NAV_CLASSES = ("nav", "menu", "primary", "main", "important")
_AD_CLASSES = ("ad", "sponsor", "track", "promo", "banner")
_GOOD_RELS = ("canonical", "next", "prev", "chapter")
_BAD_RELS = ("nofollow", "sponsored", "ugc")
_GOOD_PATHS = ("/docs/", "/api/", "/guide/", "/tutorial/", "/reference/", "/manual/")
_MED_PATHS = ("/blog/", "/article/", "/post/", "/news/")
_BAD_PATHS = ("/admin/", "/login/", "/cart/", "/checkout/", "/track/", "/click/")
_DOCS_DOMAINS = ("docs.", "api.", "developer.", "reference.")
_DOC_KEYWORDS = ("api", "reference", "guide", "tutorial", "example")
_GENERIC_TEXTS = ("click here", "read more", "more info", "link", "here")


def _term_set(text: str) -> set[str]:
    return {
        w.strip(_PUNCT_STRIP)
        for w in text.split()
        if len(w.strip(_PUNCT_STRIP)) > 2
    }


def page_link_context(page_title: str, headlines_text: str,
                      meta_description: str, base_url: str) -> dict:
    """Per-page context computed ONCE and reused for every link's score
    (parity target: extract_page_context, ref utils.py:3222-3264)."""
    from urllib.parse import urlparse

    domain = ""
    try:
        domain = urlparse(base_url).netloc.lower()
    except ValueError:
        pass
    all_text = ((page_title or "") + " " + (headlines_text or "")
                + " " + (meta_description or "")).lower()
    return {
        "terms": _term_set(all_text),
        "domain": domain,
        "is_docs_site": any(d in domain for d in _DOCS_DOMAINS),
    }


def link_intrinsic_score(link_text: str, url: str, title_attr: str,
                         class_attr: str, rel_attr: str,
                         page_context: dict | None = None) -> float:
    """Deterministic 0–10 link quality score, reference-exact
    (calculate_link_intrinsic_score, ref utils.py:3267-3379; outputs
    golden-matched in tests/test_link_parity_golden.py): attribute quality,
    url structure, text quality, page-term relevance, docs-site bonus."""
    ctx = page_context or {}
    score = 0.0

    if title_attr and len(title_attr.strip()) > 3:
        score += 1.0
    cls = (class_attr or "").lower()
    if any(c in cls for c in _NAV_CLASSES):
        score += 1.5
    if any(c in cls for c in _AD_CLASSES):
        score -= 1.0
    rel = (rel_attr or "").lower()
    if any(r in rel for r in _GOOD_RELS):
        score += 1.0
    if any(r in rel for r in _BAD_RELS):
        score -= 0.5

    low = url.lower()
    if any(p in low for p in _GOOD_PATHS):
        score += 2.0
    elif any(p in low for p in _MED_PATHS):
        score += 1.0
    if any(p in low for p in _BAD_PATHS):
        score -= 1.5
    depth = url.count("/") - 2
    if depth <= 2:
        score += 1.0
    elif depth > 5:
        score -= 0.5
    if url.startswith("https://"):
        score += 0.5

    if link_text:
        stripped = link_text.strip()
        if len(stripped) > 3:
            score += 1.0
        n_words = len(stripped.split())
        if n_words >= 2:
            score += 0.5
        if n_words >= 4:
            score += 0.5
        if stripped.lower() in _GENERIC_TEXTS:
            score -= 1.0

    if ctx.get("terms") and link_text:
        link_words = {
            w.strip(_PUNCT_STRIP).lower()
            for w in link_text.split()
            if len(w.strip(_PUNCT_STRIP)) > 2
        }
        if link_words:
            overlap = len(link_words & ctx["terms"])
            if overlap > 0:
                score += (overlap / min(len(link_words), 10)) * 2.0

    if ctx.get("is_docs_site", False):
        if link_text and any(k in link_text.lower() for k in _DOC_KEYWORDS):
            score += 1.0

    return max(0.0, min(score, 10.0))


def _harvest_links(root: Node, base_url: str, base_dom: str,
                   page_context: dict | None = None) -> dict:
    internal: list[dict] = []
    external: list[dict] = []
    seen: set[str] = set()
    for a in root.find_all("a"):
        href = a.get("href")
        if not href:
            continue
        norm = U.normalize_url(href, base_url)
        if not norm:
            continue
        if norm in seen:
            continue
        seen.add(norm)
        text = _clean_text(a.text())
        title = a.get("title") or ""
        rel = a.get("rel") or ""
        cls = a.get("class") or ""
        item = {
            "href": norm,
            "text": text,
            "title": title,
            "base_domain": U.base_domain(norm),
            "intrinsic_score": link_intrinsic_score(
                text, norm, title, cls, rel, page_context),
        }
        if U.is_external(norm, base_dom):
            external.append(item)
        else:
            internal.append(item)
    return {"internal": internal, "external": external}


# ---------------------------------------------------------------------------
# media
# ---------------------------------------------------------------------------

def _int_attr(node: Node, name: str) -> int:
    v = node.get(name)
    if not v:
        return 0
    m = re.match(r"\d+", str(v))
    return int(m.group()) if m else 0


# image-score decision constants (parity: content_scraping_strategy.py
# process_image :410-515; frozen reference values in
# tests/goldens/scrape_constants.json via scripts/gen_scrape_constants.py)
IMG_DIM_THRESHOLD_PX = 150
IMG_FORMATS = ("jpg", "jpeg", "png", "webp", "avif", "gif")
IMG_CHROME_MARKERS = ("button", "icon", "logo")


def score_image(node: Node) -> int:
    """Data-image vs chrome-image score (parity: content_scraping_strategy.py:410-515)."""
    src = node.get("src") or node.get("data-src") or ""
    score = 0
    if node.get("alt"):
        score += 1
    if _int_attr(node, "width") >= IMG_DIM_THRESHOLD_PX \
            or _int_attr(node, "height") >= IMG_DIM_THRESHOLD_PX:
        score += 1
    fmt = src.rsplit(".", 1)[-1].lower().split("?")[0] if "." in src else ""
    if fmt in IMG_FORMATS:
        score += 1
    if node.get("srcset") or (node.parent is not None and node.parent.tag == "picture"):
        score += 1
    if _BAD_IMG_RE.search(src):
        score -= 2
    if src.startswith("data:"):
        score -= 2
    return score


def _harvest_media(root: Node, base_url: str) -> dict:
    images: list[dict] = []
    for img in root.find_all("img"):
        src = img.get("src") or img.get("data-src") or ""
        if not src:
            continue
        sc = score_image(img)
        if sc < IMAGE_SCORE_THRESHOLD:
            continue
        fmt = src.rsplit(".", 1)[-1].lower().split("?")[0] if "." in src else ""
        images.append({
            "src": U.normalize_url(src, base_url) or src,
            "alt": img.get("alt") or "",
            "desc": img.get("title") or "",
            "score": sc,
            "format": fmt,
            "width": img.get("width") or "",
        })

    def _av(tag: str) -> list[dict]:
        out = []
        for el in root.find_all(tag):
            src = el.get("src") or ""
            if not src:
                for s in el.find_all("source"):
                    if s.get("src"):
                        src = s.get("src")
                        break
            if src:
                out.append({
                    "src": U.normalize_url(src, base_url) or src,
                    "alt": el.get("alt") or "",
                    "desc": el.get("title") or "",
                    "score": 0,
                    "format": src.rsplit(".", 1)[-1].lower() if "." in src else "",
                    "width": el.get("width") or "",
                })
        return out

    return {"images": images, "videos": _av("video"), "audios": _av("audio")}


# ---------------------------------------------------------------------------
# tables (E3)
# ---------------------------------------------------------------------------

def score_table(t: Node) -> int:
    """Data-table vs layout-table score; keep if ≥ 7
    (parity: table_extraction.py:132-211)."""
    score = 0
    if t.find("thead"):
        score += 2
    if t.find("th"):
        score += 2
    if t.find("caption"):
        score += 2
    if (t.get("role") or "").lower() == "presentation":
        score -= 3
    # nested tables
    if any(n.tag == "table" for n in t.iter() if n is not t):
        score -= 3
    rows = [r for r in t.find_all("tr")]
    counts = [len([c for c in r.element_children() if c.tag in ("td", "th")]) for r in rows]
    counts = [c for c in counts if c > 0]
    if counts:
        avg = sum(counts) / len(counts)
        if avg >= 2:
            score += 2
        var = sum((c - avg) ** 2 for c in counts) / len(counts)
        if var < 1.0:
            score += 2
    if t.get("summary") or any(k.startswith("data-") for k in t.attrs):
        score += 1
    return score


def extract_table(t: Node) -> dict:
    rows_nodes = t.find_all("tr")
    headers: list[str] = []
    body_rows: list[list[str]] = []
    for r in rows_nodes:
        cells = [c for c in r.element_children() if c.tag in ("td", "th")]
        if not cells:
            continue
        vals: list[str] = []
        for c in cells:
            span = max(1, _int_attr(c, "colspan") or 1)
            txt = _clean_text(c.text())
            vals.append(txt)
            vals.extend([""] * (span - 1))
        if not headers and all(c.tag == "th" for c in cells):
            headers = vals
        else:
            body_rows.append(vals)
    ncols = max([len(headers)] + [len(r) for r in body_rows]) if (headers or body_rows) else 0
    if not headers:
        headers = [f"Column {i + 1}" for i in range(ncols)]
    headers = (headers + [""] * ncols)[:ncols]
    body_rows = [(r + [""] * ncols)[:ncols] for r in body_rows]
    cap = t.find("caption")
    return {
        "headers": headers,
        "rows": body_rows,
        "caption": _clean_text(cap.text()) if cap else "",
        "summary": t.get("summary") or "",
    }


# ---------------------------------------------------------------------------
# metadata (E2)
# ---------------------------------------------------------------------------

def extract_metadata(root: Node) -> dict[str, str]:
    meta: dict[str, str] = {}
    title = root.find("title")
    if title:
        meta["title"] = _clean_text(title.text())
    for m in root.find_all("meta"):
        name = (m.get("name") or "").lower()
        prop = (m.get("property") or "").lower()
        content = m.get("content") or ""
        if name in ("description", "keywords", "author") and content:
            meta[name] = content
        elif prop.startswith(("og:", "twitter:", "article:")) and content:
            meta[prop] = content
        elif name.startswith("twitter:") and content:
            meta[name] = content
    if "title" not in meta:
        for k in ("og:title", "twitter:title"):
            if k in meta:
                meta["title"] = meta[k]
                break
    return meta


# ---------------------------------------------------------------------------
# cleaning
# ---------------------------------------------------------------------------

def _remove_unwanted(root: Node, excluded_tags, excluded_selector) -> None:
    doomed = []
    for n in root.iter():
        if n.tag in _REMOVE_TAGS or (excluded_tags and n.tag in excluded_tags):
            doomed.append(n)
    for n in doomed:
        n.remove()
    if excluded_selector:
        for n in select(root, excluded_selector):
            n.remove()
    # strip comments everywhere
    stack = [root]
    while stack:
        n = stack.pop()
        n.children = [c for c in n.children if not isinstance(c, Comment)]
        stack.extend(c for c in n.children if isinstance(c, Node))


def _remove_empty(node: Node, threshold: int) -> bool:
    """Bottom-up removal of elements with fewer than ``threshold`` words and
    no exempt descendants. Returns True if ``node`` should be removed."""
    if node.tag in _EMPTY_EXEMPT:
        return False
    for c in list(node.element_children()):
        if _remove_empty(c, threshold):
            c.remove()
    if node.element_children():
        return False
    if any(isinstance(c, str) and c.strip() for c in node.children):
        return node.word_count() < threshold
    return True


def _strip_attrs(root: Node) -> None:
    for n in root.iter():
        if n.attrs:
            n.attrs = {k: v for k, v in n.attrs.items()
                       if k in IMPORTANT_ATTRS or k.startswith("data-")}


# ---------------------------------------------------------------------------
# main entry
# ---------------------------------------------------------------------------

def scrape(
    url: str,
    html: str,
    *,
    word_count_threshold: int = MIN_WORD_THRESHOLD,
    excluded_tags: list[str] | None = None,
    excluded_selector: str | None = None,
    css_selector: str | None = None,
    only_text: bool = False,
    table_score_threshold: int = 7,
) -> dict:
    """One page through the scrape stage. Returns a plain dict (JSON-safe)."""
    root = parse_html(html)

    # honor <base href> (ref :245-253)
    base_url = url
    base_el = root.find("base")
    if base_el is not None and base_el.get("href"):
        # plain urljoin — must keep the trailing slash, it changes how
        # relative hrefs resolve
        from urllib.parse import urljoin

        base_url = urljoin(url, base_el.get("href").strip())

    metadata = extract_metadata(root)
    body = root.find("body") or root

    if css_selector:
        picked = select(body, css_selector)
        wrapper = Node("body")
        wrapper.children = picked
        body = wrapper

    # page context computed once, reused per link (ref
    # content_scraping_strategy.py:273-291 wiring of extract_page_context)
    headlines = " ".join(
        _clean_text(h.text())
        for tag in ("h1", "h2", "h3")
        for h in body.find_all(tag)
    )
    ctx = page_link_context(metadata.get("title") or "", headlines,
                            metadata.get("description") or "", base_url)
    links = _harvest_links(body, base_url, U.base_domain(url), ctx)
    media = _harvest_media(body, base_url)

    tables = []
    for t in body.find_all("table"):
        if score_table(t) >= table_score_threshold:
            tables.append(extract_table(t))

    _remove_unwanted(body, excluded_tags, excluded_selector)
    for c in list(body.element_children()):
        if _remove_empty(c, word_count_threshold):
            c.remove()
    _strip_attrs(body)

    if only_text:
        cleaned_html = ""
        text = _clean_text(body.text())
    else:
        cleaned_html = body.inner_html().strip()
        text = _clean_text(body.text())

    return {
        "cleaned_html": cleaned_html,
        "text": text,
        "links": links,
        "media": media,
        "tables": tables,
        "metadata": metadata,
        "success": True,
    }
