"""Relevance content filters producing fit_html / fit_markdown.

- :class:`PruningContentFilter` — semantic parity with the reference
  (/root/reference/crawl4ai/content_filter_strategy.py:533-777): composite
  score = 0.4·text_density + 0.2·(1−link_density) + 0.2·tag_weight +
  0.1·class_id_weight + 0.1·log(text_len+1), normalized by total weight;
  fixed threshold 0.48 (or dynamic, modulated by tag importance); prune
  top-down, survivors = body children html blocks.
- :class:`BM25ContentFilter` — parity with ref :381-530: chunk the DOM at
  block tags, score chunks with BM25 (own implementation; rank_bm25 is not
  available) against the page query (user query or title+h1+meta), weight by
  header-priority tags, threshold, then re-sort survivors into document order.

Pure + deterministic.
"""

from __future__ import annotations

import math
import re

from crawl4ai_spark.html.dom import Comment, Node, parse_html

EXCLUDED_TAGS = frozenset(
    {"nav", "footer", "header", "aside", "script", "style", "form",
     "iframe", "noscript"}
)  # ref content_filter_strategy.py:101-111
_NEGATIVE_RE = re.compile(
    r"nav|footer|header|sidebar|ads|comment|promo|advert|social|share", re.I
)  # ref :115-117

_TAG_WEIGHTS = {
    "div": 0.5, "p": 1.0, "article": 1.5, "section": 1.0, "span": 0.3,
    "li": 0.5, "ul": 0.5, "ol": 0.5, "h1": 1.2, "h2": 1.1, "h3": 1.0,
    "h4": 0.9, "h5": 0.8, "h6": 0.7,
}  # ref :612-627
_TAG_IMPORTANCE = {
    "article": 1.5, "main": 1.4, "section": 1.3, "p": 1.2, "h1": 1.4,
    "h2": 1.3, "h3": 1.2, "div": 0.7, "span": 0.6,
}  # ref :580-590
_METRIC_WEIGHTS = {
    "text_density": 0.4, "link_density": 0.2, "tag_weight": 0.2,
    "class_id_weight": 0.1, "text_length": 0.1,
}  # ref :604-610

_HEADER_PRIORITY = {"h1": 5.0, "h2": 4.0, "h3": 3.0, "h4": 2.5, "h5": 2.0,
                    "h6": 1.5, "p": 1.0, "li": 0.8, "div": 0.5}

_STOPWORDS = frozenset(
    """a an and are as at be by for from has he in is it its of on that the to
    was were will with this these those i you your we they them their then
    than but or not no so if into over under about after before between
    during out up down off again further once here there when where why how
    all any both each few more most other some such only own same can just
    should now""".split()
)

_TOKEN_RE = re.compile(r"[a-z0-9]+")


def tokenize(text: str) -> list[str]:
    """Lowercase alnum tokens, stopword-removed, light suffix stemming
    (snowballstemmer is unavailable; deterministic rules instead)."""
    out = []
    for t in _TOKEN_RE.findall(text.lower()):
        if t in _STOPWORDS or len(t) < 2:
            continue
        out.append(stem(t))
    return out


def stem(t: str) -> str:
    for suf in ("ingly", "edly", "ing", "edness", "ness", "ed", "ly", "ies", "es", "s"):
        if t.endswith(suf) and len(t) - len(suf) >= 3:
            return t[: len(t) - len(suf)]
    return t


class BM25:
    """Okapi BM25 (k1=1.5, b=0.75) over a small in-memory corpus."""

    def __init__(self, corpus: list[list[str]], k1: float = 1.5, b: float = 0.75):
        self.k1, self.b = k1, b
        self.n = len(corpus)
        self.doc_lens = [len(d) for d in corpus]
        self.avgdl = (sum(self.doc_lens) / self.n) if self.n else 0.0
        self.tfs: list[dict[str, int]] = []
        df: dict[str, int] = {}
        for doc in corpus:
            tf: dict[str, int] = {}
            for t in doc:
                tf[t] = tf.get(t, 0) + 1
            self.tfs.append(tf)
            for t in tf:
                df[t] = df.get(t, 0) + 1
        self.idf = {
            t: math.log((self.n - d + 0.5) / (d + 0.5) + 1.0) for t, d in df.items()
        }

    def scores(self, query: list[str]) -> list[float]:
        out = []
        for tf, dl in zip(self.tfs, self.doc_lens):
            s = 0.0
            norm = self.k1 * (1 - self.b + self.b * dl / self.avgdl) if self.avgdl else self.k1
            for q in query:
                f = tf.get(q, 0)
                if f:
                    s += self.idf.get(q, 0.0) * f * (self.k1 + 1) / (f + norm)
            out.append(s)
        return out


def _strip_excluded(body: Node) -> None:
    doomed = [n for n in body.iter() if n.tag in EXCLUDED_TAGS and n is not body]
    for n in doomed:
        n.remove()
    stack = [body]
    while stack:
        n = stack.pop()
        n.children = [c for c in n.children if not isinstance(c, Comment)]
        stack.extend(c for c in n.children if isinstance(c, Node))


class PruningContentFilter:
    def __init__(
        self,
        user_query: str | None = None,
        min_word_threshold: int | None = None,
        threshold_type: str = "fixed",
        threshold: float = 0.48,
    ):
        self.user_query = user_query
        self.min_word_threshold = min_word_threshold
        self.threshold_type = threshold_type
        self.threshold = threshold

    def filter_content(self, html: str) -> list[str]:
        if not html or not isinstance(html, str):
            return []
        root = parse_html(html)
        body = root.find("body") or root
        _strip_excluded(body)
        for child in list(body.element_children()):
            self._prune(child)
        return [
            c.to_html()
            for c in body.element_children()
            if c.text(strip=True)
        ]

    # -- scoring (parity: ref :644-775) --------------------------------------
    def _prune(self, node: Node) -> None:
        text = node.text(strip=True)
        text_len = len(text)
        tag_len = len(node.inner_html()) or 1
        link_text_len = sum(
            len(a.direct_text()) for a in node.element_children() if a.tag == "a"
        )
        score = self._composite(node, text, text_len, tag_len, link_text_len)

        if self.threshold_type == "fixed":
            remove = score < self.threshold
        else:
            thr = self.threshold
            imp = _TAG_IMPORTANCE.get(node.tag, 0.7)
            text_ratio = text_len / tag_len if tag_len else 0.0
            link_ratio = link_text_len / text_len if text_len else 1.0
            if imp > 1:
                thr *= 0.8
            if text_ratio > 0.4:
                thr *= 0.9
            if link_ratio > 0.6:
                thr *= 1.2
            remove = score < thr

        if remove:
            node.remove()
        else:
            for child in list(node.element_children()):
                self._prune(child)

    def _composite(self, node: Node, text: str, text_len: int, tag_len: int,
                   link_text_len: int) -> float:
        if self.min_word_threshold:
            if text.count(" ") + 1 < self.min_word_threshold:
                return -1.0
        w = _METRIC_WEIGHTS
        score = 0.0
        total = 0.0
        score += w["text_density"] * (text_len / tag_len if tag_len else 0.0)
        total += w["text_density"]
        score += w["link_density"] * (1 - (link_text_len / text_len if text_len else 0.0))
        total += w["link_density"]
        score += w["tag_weight"] * _TAG_WEIGHTS.get(node.tag, 0.5)
        total += w["tag_weight"]
        cid = 0.0
        cls = node.attrs.get("class") or ""
        if cls and _NEGATIVE_RE.search(cls):
            cid -= 0.5
        nid = node.attrs.get("id") or ""
        if nid and _NEGATIVE_RE.search(nid):
            cid -= 0.5
        score += w["class_id_weight"] * max(0.0, cid)
        total += w["class_id_weight"]
        score += w["text_length"] * math.log(text_len + 1)
        total += w["text_length"]
        return score / total if total else 0.0


class BM25ContentFilter:
    def __init__(self, user_query: str | None = None, bm25_threshold: float = 1.0):
        self.user_query = user_query
        self.bm25_threshold = bm25_threshold

    def _page_query(self, root: Node) -> str:
        if self.user_query:
            return self.user_query
        parts = []
        t = root.find("title")
        if t:
            parts.append(t.text(strip=True))
        h1 = root.find("h1")
        if h1:
            parts.append(h1.text(strip=True))
        for m in root.find_all("meta"):
            if (m.get("name") or "").lower() in ("description", "keywords"):
                parts.append(m.get("content") or "")
        q = " ".join(p for p in parts if p)
        if not q:
            p = root.find("p")
            q = p.text(strip=True) if p else ""
        return q

    def _chunks(self, body: Node) -> list[tuple[int, str, str, Node]]:
        """(index, text, tag, node) for every block-level text chunk, in
        document order (parity: ref extract_text_chunks :161-271)."""
        out: list[tuple[int, str, str, Node]] = []
        idx = 0
        block_tags = ("p", "li", "h1", "h2", "h3", "h4", "h5", "h6",
                      "blockquote", "pre", "td", "div", "article", "section")
        for n in body.iter():
            if n.tag not in block_tags:
                continue
            # leaf-ish blocks only: skip containers that own other blocks
            if any(c.tag in block_tags for c in n.element_children()):
                continue
            txt = n.text(strip=True)
            if txt and len(txt.split()) >= 2:
                out.append((idx, txt, n.tag, n))
                idx += 1
        return out

    def filter_content(self, html: str) -> list[str]:
        if not html:
            return []
        root = parse_html(html)
        body = root.find("body") or root
        query = self._page_query(root)
        _strip_excluded(body)
        chunks = self._chunks(body)
        if not chunks or not query:
            return []
        corpus = [tokenize(c[1]) for c in chunks]
        bm = BM25(corpus)
        qtok = tokenize(query)
        scores = bm.scores(qtok)
        kept = [
            (i, node)
            for (i, _txt, tag, node), s in zip(chunks, scores)
            if s * _HEADER_PRIORITY.get(tag, 1.0) >= self.bm25_threshold
        ]
        kept.sort(key=lambda x: x[0])  # document order (ref :528)
        return [n.to_html() for _, n in kept]


def fit_markdown(html: str, *, filter_obj=None, base_url: str = "") -> tuple[str, str]:
    """Run a content filter and render the surviving blocks to markdown.
    Returns (fit_markdown, fit_html) — ref markdown_generation_strategy.py:235-239."""
    from crawl4ai_spark.html.md_render import render_markdown

    f = filter_obj or PruningContentFilter()
    blocks = f.filter_content(html)
    fit_html = "\n".join(f"<div>{b}</div>" for b in blocks)
    # ref applies h.handle() with NO fence fix-up on the fit path (:239)
    return render_markdown(fit_html, base_url), fit_html
