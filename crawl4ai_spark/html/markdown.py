"""HTML → markdown conversion + link citations (byte-parity with reference).

``html_to_markdown`` reproduces the reference's ``raw_markdown``
(``DefaultMarkdownGenerator.generate_markdown``, reference
``markdown_generation_strategy.py:181-214``): the ``CustomHTML2Text`` default
configuration rendered by :mod:`crawl4ai_spark.html.md_render`, followed by
the ``"    ```" → "```"`` fence fix-up.

``add_citations`` reproduces ``convert_links_to_citations`` (reference
``markdown_generation_strategy.py:82-146``): links numbered in first-seen
order of their *resolved* URL, inline ``text⟨n⟩`` substitution (images keep
the ``![...]`` wrapper), and a references block string that begins with
``\\n\\n## References\\n\\n`` where each entry is ``⟨n⟩ url: title - text``.

Byte-parity for both is enforced by golden files generated from the reference
fork itself — see tests/test_markdown_golden.py and
scripts/gen_markdown_goldens.py.
"""

from __future__ import annotations

import re
from urllib.parse import urljoin

from crawl4ai_spark.html.md_render import render_markdown

# same pattern as the reference's LINK_PATTERN (markdown_generation_strategy.py:12)
_MD_LINK = re.compile(r'!?\[([^\]]+)\]\(([^)]+?)(?:\s+"([^"]*)")?\)')


def html_to_markdown(html: str, base_url: str = "") -> str:
    """Convert an HTML document or fragment to markdown (raw_markdown)."""
    return render_markdown(html or "", base_url).replace("    ```", "```")


def _join_like_reference(base: str, url: str) -> str:
    # mirrors fast_urljoin (markdown_generation_strategy.py:14-23): scheme-
    # relative and absolute pass through; "/"-rooted paths are string-appended
    # to the *full* base (including its path) — quirk preserved for parity
    if url.startswith(("http://", "https://", "mailto:", "//")):
        return url
    if url.startswith("/"):
        return (base[:-1] if base.endswith("/") else base) + url
    return urljoin(base, url)


def add_citations(markdown: str, base_url: str = "") -> tuple[str, str]:
    """Replace inline links with ``text⟨n⟩`` citations, numbered in
    first-seen order; return (markdown_with_citations, references_markdown)."""
    numbered: dict[str, tuple[int, str]] = {}
    resolved: dict[str, str] = {}
    pieces: list[str] = []
    cursor = 0

    for m in _MD_LINK.finditer(markdown):
        pieces.append(markdown[cursor:m.start()])
        text, url, title = m.group(1), m.group(2), m.group(3)
        if base_url and not url.startswith(("http://", "https://", "mailto:")):
            if url not in resolved:
                resolved[url] = _join_like_reference(base_url, url)
            url = resolved[url]
        if url not in numbered:
            label_bits = []
            if title:
                label_bits.append(title)
            if text and text != title:
                label_bits.append(text)
            numbered[url] = (
                len(numbered) + 1,
                ": " + " - ".join(label_bits) if label_bits else "",
            )
        n = numbered[url][0]
        pieces.append(
            f"![{text}⟨{n}⟩]" if m.group(0).startswith("!") else f"{text}⟨{n}⟩"
        )
        cursor = m.end()

    pieces.append(markdown[cursor:])
    refs = ["\n\n## References\n\n"]
    refs.extend(
        f"⟨{n}⟩ {url}{desc}\n"
        for url, (n, desc) in sorted(numbered.items(), key=lambda kv: kv[1][0])
    )
    return "".join(pieces), "".join(refs)
