"""Generate URL-layer parity goldens from the reference's own functions.

Run:  python scripts/gen_url_goldens.py

Three golden sets, all produced by executing REFERENCE code (AST-extracted
pure functions / the stdlib-only scorers module loaded standalone) over a
deterministic messy-URL corpus:

- tests/goldens/urls/normalize.jsonl — normalize_url,
  normalize_url_for_deep_crawl, get_base_domain, is_external_url
  (reference utils.py:2229-2546);
- tests/goldens/urls/scorers.jsonl — KeywordRelevance/PathDepth/ContentType/
  Freshness/DomainAuthority/Composite scores (deep_crawling/scorers.py);
- tests/goldens/urls/filters.jsonl — URLPatternFilter/ContentTypeFilter/
  DomainFilter decisions (deep_crawling/filters.py:119-506).

tests/test_url_parity_golden.py then compares our urls.py /
operators/scoring.py / operators/urlfilters.py against the frozen goldens —
no reference imports at test time.
"""

from __future__ import annotations

import ast
import importlib.util
import json
import pathlib
import re
import sys
from functools import lru_cache
from urllib.parse import (
    parse_qs,
    parse_qsl,
    urlencode,
    urljoin,
    urlparse,
    urlunparse,
)

REF = pathlib.Path("/root/reference/crawl4ai")
OUT = pathlib.Path(__file__).resolve().parent.parent / "tests" / "goldens" / "urls"


def extract_functions(path: pathlib.Path, names: set[str], extra_ns: dict) -> dict:
    tree = ast.parse(path.read_text())
    keep = [n for n in tree.body
            if isinstance(n, (ast.FunctionDef, ast.ClassDef)) and n.name in names]
    missing = names - {n.name for n in keep}
    if missing:
        raise SystemExit(f"missing {missing} in {path}")
    ns = dict(extra_ns)
    exec(compile(ast.Module(body=keep, type_ignores=[]), str(path), "exec"), ns)
    return ns


def load_module(path: pathlib.Path, name: str):
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    sys.modules[name] = mod
    spec.loader.exec_module(mod)
    return mod


# --------------------------------------------------------------------------
# corpus
# --------------------------------------------------------------------------

def url_corpus() -> list[tuple[str, str]]:
    """(href, base_url) pairs covering the normalization edge space."""
    bases = [
        "https://www.example.com/dir/page.html",
        "https://example.com/",
        "http://sub.shop.example.co.uk/a/b/",
        "https://news.example.org/2024/05/story",
    ]
    hrefs = [
        "/abs/path", "rel/path", "../up/one", "./same", "",
        "p2?utm_source=feed&utm_campaign=x", "p2?b=2&a=1", "p2?a=1&b=2",
        "?only=query", "#frag-only", "p#frag", "/a/b/?q=1#sec",
        "HTTPS://WWW.EXAMPLE.COM/UPPER", "//protocol.example/rel",
        "https://other.example.net/x", "mailto:a@b.c", "tel:+15551234",
        "javascript:void(0)", "ftp://files.example.com/f.zip",
        "/trailing/slash/", "/", "/double//slash", "/p?gclid=abc&keep=1",
        "/p?ref=tw&ref_src=x&z=9", "/p?UTM_SOURCE=caps", "/p?a=1&a=2",
        "/p?blank=&x=1", "/p?x=a+b&y=c%20d", "/p?x=%2Fenc",
        "https://example.com:8080/port", "https://example.com:443/x",
        "  /spaces  ", "/p?fbclid=f123", "/café/ünïcode", "/p?q=汉字",
        "a/b/c/../../d", "https://www.example.com", "https://example.com/p.",
        "/p;params?x=1", "/p?[weird]=1", "//example.com//x//y/",
        "/1999/old", "/2025/new", "/article-2019-update",
        "/style.css", "/api/data.json", "/doc.pdf", "/img.JPG",
        "/video.mp4", "/index.php?id=3", "/wp-admin/page",
        "path with space", "/p?empty", "/p?=noval", "/p?a",
    ]
    pairs = [(h, b) for b in bases for h in hrefs]
    # deterministic pseudo-random messy extras
    import random
    rng = random.Random(20260817)
    segs = ["a", "B", "cc", "..", ".", "p q", "%7Euser", "काफी", "x1"]
    for i in range(120):
        path = "/".join(rng.choice(segs) for _ in range(rng.randint(1, 5)))
        q = "&".join(f"{rng.choice('abcz')}={rng.randint(0,9)}"
                     for _ in range(rng.randint(0, 3)))
        href = f"/{path}" + (f"?{q}" if q else "") + (rng.choice(["", "#s"]))
        pairs.append((href, rng.choice(bases)))
    return pairs


SCORER_URLS = [
    "https://example.com/blog/spark-tutorial",
    "https://example.com/shop/item/12345",
    "https://docs.example.com/guide/crawl.html",
    "https://example.com/a/b/c/d/e/f/deep",
    "https://example.com/",
    "https://example.com/news/2024/05/spark-release",
    "https://example.com/archive/1999/old-news",
    "https://old.example.com/page-2015-edition",
    "https://example.com/data.json",
    "https://example.com/video.mp4",
    "https://example.com/paper.pdf",
    "https://blog.example.com/spark-crawl-guide",
    "https://auth.example.com/spark",
    "https://example.com/updated-2023",
    "https://example.com/latest/spark",
    "https://spam.site/clickbait",
    "http://example.com/CASE/Spark",
    "https://example.com/crawl/spark/extract",
]

KEYWORDS = ["spark", "crawl", "guide"]
# reference key syntax: ".ext$" = exact extension, anything else = regex
TYPE_WEIGHTS = {".html$": 1.0, ".pdf$": 0.8, ".json$": 0.5, ".mp4$": 0.2,
                "guide": 0.9}
DOMAIN_WEIGHTS = {"example.com": 0.9, "blog.example.com": 1.0, "spam.site": 0.1}

PATTERNS = ["*.example.com/blog/*", "*spark*", "*/guide/*"]
CTYPE_EXTS = ["html", "pdf"]
ALLOWED_DOMAINS = ["example.com"]
BLOCKED_DOMAINS = ["spam.site"]


def main() -> None:
    OUT.mkdir(parents=True, exist_ok=True)

    # 1. normalization -----------------------------------------------------
    ns = extract_functions(
        REF / "utils.py",
        {"normalize_url", "normalize_url_for_deep_crawl",
         "get_base_domain", "is_external_url"},
        {"urljoin": urljoin, "urlparse": urlparse, "urlunparse": urlunparse,
         "parse_qsl": parse_qsl, "parse_qs": parse_qs, "urlencode": urlencode,
         "re": re, "lru_cache": lru_cache},
    )
    rows = []
    for href, base in url_corpus():
        n = ns["normalize_url"](href, base)
        nd = ns["normalize_url_for_deep_crawl"](href, base)
        bd = ns["get_base_domain"](n or href)
        ext = ns["is_external_url"](n or href, ns["get_base_domain"](base))
        rows.append({"href": href, "base": base, "norm": n, "norm_deep": nd,
                     "base_domain": bd, "is_external": ext})
    with open(OUT / "normalize.jsonl", "w") as f:
        for r in rows:
            f.write(json.dumps(r, ensure_ascii=False) + "\n")

    # 2. scorers (module is stdlib-only → load standalone) ----------------
    sc = load_module(REF / "deep_crawling" / "scorers.py", "ref_scorers")
    scorers = {
        "keyword": sc.KeywordRelevanceScorer(KEYWORDS, weight=1.0),
        "path_depth": sc.PathDepthScorer(optimal_depth=3, weight=1.0),
        "content_type": sc.ContentTypeScorer(TYPE_WEIGHTS, weight=1.0),
        "freshness": sc.FreshnessScorer(weight=1.0, current_year=2024),
        "domain_authority": sc.DomainAuthorityScorer(
            DOMAIN_WEIGHTS, default_weight=0.5, weight=1.0),
    }
    scorers["composite"] = sc.CompositeScorer(list(scorers.values()), normalize=True)
    with open(OUT / "scorers.jsonl", "w") as f:
        for u in SCORER_URLS:
            row = {"url": u}
            for name, s in scorers.items():
                row[name] = s.score(u)
            f.write(json.dumps(row) + "\n")

    # 3. pattern/ctype/domain filters (AST-extracted, HeadPeekr stubbed) --
    import fnmatch
    import logging
    import math
    import weakref
    from abc import ABC, abstractmethod
    from array import array
    from collections import defaultdict
    from dataclasses import dataclass

    fns = extract_functions(
        REF / "deep_crawling" / "filters.py",
        {"FilterStats", "URLFilter", "URLPatternFilter", "ContentTypeFilter",
         "DomainFilter"},
        {"ABC": ABC, "abstractmethod": abstractmethod, "re": re,
         "fnmatch": fnmatch, "logging": logging, "math": math,
         "weakref": weakref, "array": array, "defaultdict": defaultdict,
         "dataclass": dataclass, "lru_cache": lru_cache,
         "urlparse": urlparse,
         "List": list, "Pattern": re.Pattern, "Set": set, "Union": object,
         "Dict": dict},
    )
    filters = {
        "pattern": fns["URLPatternFilter"](PATTERNS),
        "ctype": fns["ContentTypeFilter"](CTYPE_EXTS),
        "domain": fns["DomainFilter"](allowed_domains=ALLOWED_DOMAINS,
                                      blocked_domains=BLOCKED_DOMAINS),
    }
    with open(OUT / "filters.jsonl", "w") as f:
        for u in SCORER_URLS + [h for h, _ in url_corpus()[:40]]:
            row = {"url": u}
            for name, flt in filters.items():
                try:
                    row[name] = bool(flt.apply(u))
                except Exception:
                    row[name] = None
            f.write(json.dumps(row, ensure_ascii=False) + "\n")

    # 4. seeder nonsense filter (AST-extracted method; self unused) --------
    sns = extract_functions(
        pathlib.Path("/root/reference/crawl4ai/async_url_seeder.py"),
        set(), {})
    import ast as _ast
    tree = _ast.parse(
        pathlib.Path("/root/reference/crawl4ai/async_url_seeder.py").read_text())
    fn = None
    for node in _ast.walk(tree):
        if isinstance(node, _ast.FunctionDef) and node.name == "_is_nonsense_url":
            fn = node
    assert fn is not None
    ns2 = {}
    exec(compile(_ast.Module(body=[fn], type_ignores=[]), "<ref-nonsense>", "exec"), ns2)
    ref_nonsense = lambda u: ns2["_is_nonsense_url"](None, u)

    nonsense_urls = [
        "https://a.com/robots.txt", "https://a.com/sitemap.xml",
        "https://a.com/sitemaps/sitemap_news.xml.gz", "https://a.com/sitemap.txt",
        "https://a.com/page/sitemap-article.xml", "https://a.com/favicon.ico",
        "https://a.com/.well-known/security.txt", "https://a.com/manifest.json",
        "https://a.com/.hidden/page", "https://a.com/a/.git/config",
        "https://a.com/wp-admin/x", "https://a.com/blog/search/results",
        "https://a.com/checkout", "https://a.com/accounting/report",
        "https://a.com/p?print=1", "https://a.com/x&print=yes",
        "https://a.com/print/page", "https://a.com/doc_print.html",
        "https://a.com/ab", "https://a.com/", "https://a.com/en",
        "https://a.com/de", "https://a.com/abc", "https://a.com/xy/",
        "https://a.com/long/enough/path", "https://a.com/article-99",
        "https://a.com/Sitemap.XML", "https://a.com/SEARCH/x",
        "https://a.com/profiles/u1", "https://a.com/errors/5",
    ]
    with open(OUT / "nonsense.jsonl", "w") as f:
        for u in nonsense_urls:
            f.write(json.dumps({"url": u, "nonsense": bool(ref_nonsense(u))}) + "\n")

    # 5. url-string relevance fallback (AST-extracted method) -------------
    fn2 = None
    for node in _ast.walk(tree):
        if isinstance(node, _ast.FunctionDef) and node.name == "_calculate_url_relevance_score":
            fn2 = node
    assert fn2 is not None
    ns3 = {}
    exec(compile(_ast.Module(body=[fn2], type_ignores=[]), "<ref-rel>", "exec"), ns3)
    rel = lambda q, u: ns3["_calculate_url_relevance_score"](None, q, u)
    rel_queries = ["spark crawl", "machine learning", "docs", "x", "crawl4ai spark engine"]
    rel_urls = [
        "https://www.sparkdocs.com/crawl/guide",
        "https://example.com/machine-learning/intro",
        "https://example.com/ml?topic=machine&sub=learning",
        "https://crawl.example.org/",
        "https://deep.sub.example.co.uk/a/b/c?q=spark",
        "https://example.com/unrelated/cooking",
        "https://spark.apache.org/docs/latest/api",
    ]
    with open(OUT / "url_relevance.jsonl", "w") as f:
        for q in rel_queries:
            for u in rel_urls:
                f.write(json.dumps({"query": q, "url": u, "score": rel(q, u)}) + "\n")

    print(f"goldens written to {OUT}")


if __name__ == "__main__":
    main()
