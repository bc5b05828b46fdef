"""Generate scrape-layer byte-parity goldens from the REFERENCE scraper.

DORMANT until a container ships lxml: the reference's
LXMLWebScrapingStrategy (content_scraping_strategy.py:607-909) and
PruningContentFilter (content_filter_strategy.py:533-777) hard-require
lxml, which this sandbox does not install. The moment
``importlib.util.find_spec("lxml")`` resolves, running this script freezes
reference-rendered goldens for every tests/goldens/markdown/*.html fixture:

    tests/goldens/scrape/<name>.json   — {"cleaned_html": ..., "links":
        {"internal": [...], "external": [...]}, "media": {"images": [...]},
        "metadata": {...}, "fit_chunks": [...]}

cleaned_html/links/media/metadata come from
LXMLWebScrapingStrategy().scrap(url, html) under reference defaults
(word_count_threshold = MIN_WORD_THRESHOLD); fit_chunks from
PruningContentFilter().filter_content(html) under its defaults.

A matching byte-compare test should then be added beside
tests/test_markdown_golden.py (same pattern: goldens are the frozen oracle,
the suite never imports the reference).

Run: python scripts/gen_scrape_goldens.py
"""

from __future__ import annotations

import importlib.util
import json
import pathlib
import sys

REF = pathlib.Path("/root/reference/crawl4ai")
FIXTURES = pathlib.Path(__file__).resolve().parent.parent / "tests" / "goldens" / "markdown"
OUT = pathlib.Path(__file__).resolve().parent.parent / "tests" / "goldens" / "scrape"


def main() -> int:
    if importlib.util.find_spec("lxml") is None:
        print("lxml not installed — scrape byte-parity generation is DORMANT "
              "(constants-level parity is covered by gen_scrape_constants.py)")
        return 0

    # lxml available: load the reference package read-only and render.
    sys.path.insert(0, str(REF.parent))
    from crawl4ai.config import MIN_WORD_THRESHOLD  # noqa: PLC0415
    from crawl4ai.content_filter_strategy import PruningContentFilter  # noqa: PLC0415
    from crawl4ai.content_scraping_strategy import LXMLWebScrapingStrategy  # noqa: PLC0415

    OUT.mkdir(parents=True, exist_ok=True)
    scraper = LXMLWebScrapingStrategy()
    n = 0
    for html_path in sorted(FIXTURES.glob("*.html")):
        name = html_path.stem
        html = html_path.read_text()
        base = (FIXTURES / f"{name}.base")
        url = base.read_text().strip() if base.exists() else "https://example.com/page"
        res = scraper.scrap(url, html, word_count_threshold=MIN_WORD_THRESHOLD)
        fit = PruningContentFilter().filter_content(html)
        payload = {
            "cleaned_html": res.cleaned_html,
            "links": {
                "internal": [dict(l) for l in res.links.internal],
                "external": [dict(l) for l in res.links.external],
            },
            "media": {"images": [dict(m) for m in res.media.images]},
            "metadata": res.metadata,
            "fit_chunks": fit,
        }
        (OUT / f"{name}.json").write_text(
            json.dumps(payload, indent=1, sort_keys=True, default=str))
        n += 1
    print(f"wrote {n} scrape goldens to {OUT}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
