"""Freeze the reference's pure scrape-layer decision constants as a golden.

The scrape layer (LXMLWebScrapingStrategy / PruningContentFilter) cannot run
in this sandbox (no lxml/bs4), so byte-parity generation is blocked — but the
DECISIONS those classes make are driven by plain constants that ast-parse
cleanly without importing anything. This script extracts them read-only from
the reference sources and freezes tests/goldens/scrape_constants.json;
tests/test_scrape_constants_golden.py then asserts our from-scratch scraper
and pruning filter read identical values (VERDICT r02 next-round #6).

Extracted surfaces:
- config.py:47-94 — MIN_WORD_THRESHOLD, IMAGE_DESCRIPTION_MIN_WORD_THRESHOLD,
  IMAGE_SCORE_THRESHOLD, IMPORTANT_ATTRS, ONLY_TEXT_ELIGIBLE_TAGS
- content_filter_strategy.py:533-624 — PruningContentFilter.__init__'s
  tag_importance / metric_config / metric_weights / tag_weights dicts and the
  fixed-threshold default (0.48)
- content_scraping_strategy.py:410-515 — process_image's score constants:
  the >150px dimension bonus, the first-half-of-page ratio (0.5), the
  format-bonus set, and the icon/button/logo chrome markers

Run: python scripts/gen_scrape_constants.py  (rewrites the golden in place)
"""

from __future__ import annotations

import ast
import json
import os

REF = "/root/reference/crawl4ai"
OUT = os.path.join(os.path.dirname(__file__), "..",
                   "tests", "goldens", "scrape_constants.json")

CONFIG_NAMES = [
    "MIN_WORD_THRESHOLD", "IMAGE_DESCRIPTION_MIN_WORD_THRESHOLD",
    "IMAGE_SCORE_THRESHOLD", "IMPORTANT_ATTRS", "ONLY_TEXT_ELIGIBLE_TAGS",
]
PRUNE_ATTRS = ["tag_importance", "metric_config", "metric_weights",
               "tag_weights"]


def module_constants(path: str, names: list[str]) -> dict:
    tree = ast.parse(open(path).read())
    out = {}
    for node in tree.body:
        if (isinstance(node, ast.Assign) and len(node.targets) == 1
                and isinstance(node.targets[0], ast.Name)
                and node.targets[0].id in names):
            out[node.targets[0].id] = ast.literal_eval(node.value)
    return out


def class_init_attrs(path: str, cls: str, attrs: list[str]) -> dict:
    tree = ast.parse(open(path).read())
    out = {}
    for node in ast.walk(tree):
        if isinstance(node, ast.ClassDef) and node.name == cls:
            init = next(n for n in node.body
                        if isinstance(n, ast.FunctionDef) and n.name == "__init__")
            for stmt in ast.walk(init):
                if (isinstance(stmt, ast.Assign) and len(stmt.targets) == 1
                        and isinstance(stmt.targets[0], ast.Attribute)
                        and stmt.targets[0].attr in attrs):
                    out[stmt.targets[0].attr] = ast.literal_eval(stmt.value)
            # keyword defaults (threshold / threshold_type)
            args = init.args
            defaults = dict(zip([a.arg for a in args.args[-len(args.defaults):]],
                                [ast.literal_eval(d) for d in args.defaults]))
            out["__init_defaults__"] = defaults
    return out


def image_score_constants(path: str) -> dict:
    tree = ast.parse(open(path).read())
    fn = next(n for n in ast.walk(tree)
              if isinstance(n, ast.FunctionDef) and n.name == "process_image")
    gt, lt, formats, chrome = set(), set(), None, None
    for node in ast.walk(fn):
        if isinstance(node, ast.Compare) and len(node.ops) == 1:
            for cand in node.comparators:
                if isinstance(cand, ast.Constant) and isinstance(cand.value, (int, float)):
                    if isinstance(node.ops[0], ast.Gt):
                        gt.add(cand.value)
                    elif isinstance(node.ops[0], ast.Lt):
                        lt.add(cand.value)
        if isinstance(node, ast.Assign) and len(node.targets) == 1 \
                and isinstance(node.targets[0], ast.Name) \
                and node.targets[0].id == "image_formats":
            formats = sorted(ast.literal_eval(node.value))
        if chrome is None and isinstance(node, ast.List):
            try:
                v = ast.literal_eval(node)
            except ValueError:
                continue
            if v == ["button", "icon", "logo"]:
                chrome = v
    assert gt == {150}, f"dimension threshold drifted: {gt}"
    assert lt == {0.5}, f"first-half ratio drifted: {lt}"
    assert formats, "image_formats set not found"
    return {"dim_threshold_px": 150, "first_half_ratio": 0.5,
            "image_formats": formats, "chrome_markers": chrome}


def main() -> None:
    golden = {
        "config": module_constants(os.path.join(REF, "config.py"), CONFIG_NAMES),
        "pruning": class_init_attrs(
            os.path.join(REF, "content_filter_strategy.py"),
            "PruningContentFilter", PRUNE_ATTRS),
        "image_score": image_score_constants(
            os.path.join(REF, "content_scraping_strategy.py")),
    }
    with open(OUT, "w") as f:
        json.dump(golden, f, indent=2, sort_keys=True)
    print(f"wrote {os.path.normpath(OUT)}")


if __name__ == "__main__":
    main()
