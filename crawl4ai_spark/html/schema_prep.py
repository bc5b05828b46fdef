"""HTML reducers for schema generation (reference utils.py:2927-2960,
3007-3147).

``JsonCssExtractionStrategy.generate_schema`` and the crawler packs feed a
size-reduced page into their schema builder; the reduction itself is
deterministic and is implemented here over the repo's dependency-free DOM
stack (:mod:`crawl4ai_spark.html.dom` — the reference uses lxml, absent in
this sandbox, so parity is semantic: same removals, same attribute
whitelist, same truncation rule, same class-keyed duplicate collapse;
the duplicate signature hash is md5 here vs xxhash there — any hash yields
the same equal/unequal partition of identical text).

- :func:`optimize_html` — truncate every attribute value and text node to
  ``threshold`` chars + ``'...'`` (utils.py:2932-2948).
- :func:`preprocess_html_for_schema` — drop <head> and non-content tags,
  whitelist attributes ({id, class, name, type, value} + ``data-*``),
  truncate long attribute values and text nodes, then remove later
  duplicates of (tag, class, inner-text) among class-bearing elements
  (utils.py:3007-3147, incl. its oversize and parse-error fallbacks).
"""

from __future__ import annotations

import hashlib

from crawl4ai_spark.html.dom import Node, parse_html

_REMOVE_TAGS = (
    "script", "style", "noscript", "iframe", "canvas", "svg",
    "video", "audio", "source", "track", "map", "area",
)

_KEEP_ATTRS = {"id", "class", "name", "type", "value"}


def _truncate(value: str, threshold: int) -> str:
    return value[:threshold] + "..." if len(value) > threshold else value


def _to_html(root: Node) -> str:
    # the tolerant parser wraps fragments in a synthetic [document] root;
    # serialize its contents, not the wrapper
    return root.inner_html() if root.tag == "[document]" else root.to_html()


def optimize_html(html_str: str, threshold: int = 200) -> str:
    """Truncate all attribute values and text nodes (ref utils.py:2932)."""
    root = parse_html(html_str)
    for el in list(root.iter()):
        for attr in list(el.attrs):
            el.attrs[attr] = _truncate(el.attrs[attr], threshold)
        for i, c in enumerate(el.children):
            if isinstance(c, str) and len(c) > threshold:
                el.children[i] = _truncate(c, threshold)
    return _to_html(root)


def preprocess_html_for_schema(html_content: str, text_threshold: int = 100,
                               attr_value_threshold: int = 200,
                               max_size: int = 100000) -> str:
    """Reduce a page for schema generation (ref utils.py:3007-3147)."""
    try:
        root = parse_html(html_content)

        # 1. drop <head>; 2. drop non-content tags
        for el in list(root.iter()):
            if el is root:
                continue
            if el.tag == "head" or el.tag in _REMOVE_TAGS:
                el.remove()

        # 3. attribute whitelist + truncation (ref keeps {id, class, name,
        # type, value} and data-*; long values truncate with '...'), and
        # text-node truncation on the STRIPPED text (ref replaces
        # element.text with text.strip()[:threshold] + '...')
        for el in root.iter():
            if el is root:
                continue
            for attr in list(el.attrs):
                if not (attr in _KEEP_ATTRS or attr.startswith("data-")):
                    el.attrs.pop(attr)
                elif len(el.attrs[attr]) > attr_value_threshold:
                    el.attrs[attr] = el.attrs[attr][:attr_value_threshold] + "..."
            for i, c in enumerate(el.children):
                if isinstance(c, str) and len(c.strip()) > text_threshold:
                    el.children[i] = c.strip()[:text_threshold] + "..."

        # 4. class-keyed duplicate collapse: first (tag, class, inner-text)
        # wins, later repeats are dropped — the snapshot includes elements
        # inside already-removed subtrees, exactly like the reference's
        # list(tree.xpath('//*[@class]')) pass (ref :3079-3100)
        seen: set[tuple] = set()
        for el in [n for n in root.iter() if isinstance(n, Node)
                   and n.get("class")]:
            if el.parent is None:
                continue
            sig = (el.tag, el.get("class"),
                   hashlib.md5(el.text().encode()).hexdigest())
            if sig in seen:
                el.remove()
            else:
                seen.add(sig)

        result = _to_html(root)
        if len(result) > max_size:
            return result[:max_size] + "..."
        return result
    except Exception:
        # ref :3149-3151 — parse-error fallback
        return (html_content[:max_size]
                if len(html_content) > max_size else html_content)
