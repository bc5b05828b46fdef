"""Freeze link-intrinsic-score goldens from the reference's own functions.

Run:  python scripts/gen_link_goldens.py

AST-extracts extract_page_context + calculate_link_intrinsic_score
(reference utils.py:3222-3379, pure stdlib) and scores a link-scenario
corpus under several page contexts.
"""

from __future__ import annotations

import ast
import json
import pathlib

REF = pathlib.Path("/root/reference/crawl4ai/utils.py")
OUT = pathlib.Path(__file__).resolve().parent.parent / "tests" / "goldens" / "link_scores.jsonl"

CONTEXTS = {
    "article": ("Spark Crawling Guide", "Distributed Crawling Engines",
                "about spark crawling pipelines", "https://www.example.com/dir/"),
    "docs": ("API Reference", "Functions Classes Modules",
             "api documentation", "https://docs.example.com/ref/"),
    "empty": ("", "", "", "https://plain.example.org/"),
}

LINKS = [
    # (text, url, title, class, rel)
    ("Spark crawling tutorial", "https://www.example.com/docs/spark", "Full spark guide", "nav primary", ""),
    ("click here", "http://www.example.com/x", "", "", "nofollow"),
    ("read more", "https://www.example.com/blog/post-1", "t", "promo banner", "sponsored"),
    ("API reference guide", "https://docs.example.com/api/v2/classes/deep/path/here", "", "menu", "next"),
    ("k", "https://a.b/c", None, None, None),
    ("some very long descriptive link text about crawling engines",
     "https://www.example.com/article/engines", "title four words long", "main", "canonical"),
    ("", "https://www.example.com/admin/login/", "", "ad track", "ugc"),
    ("spark", "https://www.example.com/checkout/cart/item/id/5/6/7", "tt", "", ""),
    ("Guide", "ftp://files.example.com/f", "", "", ""),
    ("examples and tutorials", "https://docs.example.com/guide/", "helpful", "", "prev"),
]


def main() -> None:
    import re
    from urllib.parse import urlparse

    tree = ast.parse(REF.read_text())
    keep = [n for n in tree.body if isinstance(n, ast.FunctionDef)
            and n.name in {"extract_page_context", "calculate_link_intrinsic_score"}]
    assert len(keep) == 2
    ns = {"urlparse": urlparse, "re": re}
    exec(compile(ast.Module(body=keep, type_ignores=[]), str(REF), "exec"), ns)

    rows = []
    for cname, (title, heads, desc, base) in CONTEXTS.items():
        ctx = ns["extract_page_context"](title, heads, desc, base)
        for text, url, tattr, cattr, rattr in LINKS:
            s = ns["calculate_link_intrinsic_score"](text, url, tattr, cattr, rattr, ctx)
            rows.append({"context": cname, "text": text, "url": url,
                         "title": tattr, "class": cattr, "rel": rattr,
                         "score": s})
    with open(OUT, "w") as f:
        f.write(json.dumps({"contexts": CONTEXTS}) + "\n")
        for r in rows:
            f.write(json.dumps(r) + "\n")
    print(f"wrote {len(rows)} link-score goldens")


if __name__ == "__main__":
    main()
