"""Tolerant HTML parser → DOM tree, plus a CSS-lite selector engine.

Built on stdlib :class:`html.parser.HTMLParser` (no lxml/bs4 in this
environment). Deterministic by construction: same bytes in → same tree →
same serialization out, across processes and Spark executors.

Capability parity targets (reference, studied not copied):
- DOM parse + traversal used by LXMLWebScrapingStrategy
  (/root/reference/crawl4ai/content_scraping_strategy.py:607-909)
- CSS selection used by JsonCssExtractionStrategy
  (/root/reference/crawl4ai/extraction_strategy.py:1388-1433)
"""

from __future__ import annotations

import re
from html import escape
from html.parser import HTMLParser

VOID_TAGS = frozenset(
    {"area", "base", "br", "col", "embed", "hr", "img", "input", "link",
     "meta", "param", "source", "track", "wbr"}
)

# tags whose opening implicitly closes an open <p>
_P_CLOSERS = frozenset(
    {"p", "div", "ul", "ol", "li", "table", "section", "article", "aside",
     "nav", "header", "footer", "main", "blockquote", "pre", "form",
     "h1", "h2", "h3", "h4", "h5", "h6", "hr", "figure"}
)
# tag → set of open tags it implicitly closes (when nearest open ancestor)
_IMPLICIT_CLOSE = {
    "li": {"li"},
    "tr": {"tr", "td", "th"},
    "td": {"td", "th"},
    "th": {"td", "th"},
    "option": {"option"},
    "dd": {"dd", "dt"},
    "dt": {"dd", "dt"},
}

_WS_RE = re.compile(r"\s+")


class Node:
    """An element node. Text children are plain ``str`` entries in
    ``children``; comments are :class:`Comment`."""

    __slots__ = ("tag", "attrs", "children", "parent")

    def __init__(self, tag: str, attrs: dict | None = None, parent: "Node | None" = None):
        self.tag = tag
        self.attrs: dict[str, str] = attrs or {}
        self.children: list = []
        self.parent = parent

    # -- traversal ----------------------------------------------------------
    def iter(self):
        """Depth-first pre-order over element nodes (self included)."""
        stack = [self]
        while stack:
            node = stack.pop()
            yield node
            stack.extend(
                c for c in reversed(node.children) if isinstance(c, Node)
            )

    def find_all(self, tags) -> list["Node"]:
        if isinstance(tags, str):
            tags = (tags,)
        return [n for n in self.iter() if n.tag in tags]

    def find(self, tags) -> "Node | None":
        if isinstance(tags, str):
            tags = (tags,)
        for n in self.iter():
            if n.tag in tags:
                return n
        return None

    def element_children(self) -> list["Node"]:
        return [c for c in self.children if isinstance(c, Node)]

    # -- content ------------------------------------------------------------
    def get(self, attr: str, default=None):
        return self.attrs.get(attr, default)

    def text(self, strip: bool = False, sep: str = "") -> str:
        parts: list[str] = []
        self._collect_text(parts)
        out = sep.join(parts)
        if strip:
            out = _WS_RE.sub(" ", out).strip()
        return out

    def _collect_text(self, parts: list) -> None:
        for c in self.children:
            if isinstance(c, str):
                parts.append(c)
            elif isinstance(c, Comment):
                continue
            else:
                c._collect_text(parts)

    def direct_text(self, strip: bool = True) -> str:
        out = "".join(c for c in self.children if isinstance(c, str))
        return _WS_RE.sub(" ", out).strip() if strip else out

    def word_count(self) -> int:
        t = self.text(strip=True)
        return len(t.split()) if t else 0

    # -- mutation -----------------------------------------------------------
    def remove(self) -> None:
        if self.parent is not None:
            try:
                self.parent.children.remove(self)
            except ValueError:
                pass
            self.parent = None

    def replace_with_children(self) -> None:
        """Unwrap: splice own children into parent at own position."""
        if self.parent is None:
            return
        idx = self.parent.children.index(self)
        for c in self.children:
            if isinstance(c, Node):
                c.parent = self.parent
        self.parent.children[idx:idx + 1] = self.children
        self.parent = None

    # -- serialization ------------------------------------------------------
    def inner_html(self) -> str:
        return "".join(_serialize(c) for c in self.children)

    def to_html(self) -> str:
        return _serialize(self)

    def __repr__(self) -> str:  # pragma: no cover
        return f"<Node {self.tag} attrs={self.attrs} n_children={len(self.children)}>"


class Comment:
    __slots__ = ("data",)

    def __init__(self, data: str):
        self.data = data


def _serialize(item) -> str:
    if isinstance(item, str):
        return escape(item, quote=False)
    if isinstance(item, Comment):
        return f"<!--{item.data}-->"
    n: Node = item
    attrs = "".join(
        f' {k}' if v is None else f' {k}="{escape(str(v), quote=True)}"'
        for k, v in n.attrs.items()
    )
    if n.tag in VOID_TAGS:
        return f"<{n.tag}{attrs}/>"
    return f"<{n.tag}{attrs}>{n.inner_html()}</{n.tag}>"


class _TreeBuilder(HTMLParser):
    def __init__(self):
        super().__init__(convert_charrefs=True)
        self.root = Node("[document]")
        self.stack = [self.root]

    # helpers
    def _open_tags(self):
        return [n.tag for n in self.stack]

    def _close_implicit(self, tag: str) -> None:
        closers = _IMPLICIT_CLOSE.get(tag)
        if closers:
            # close the whole run of closable tags above us (e.g. a new <tr>
            # closes the open <td> AND the open <tr>), stopping at the first
            # real container (table/ul/div/...)
            cut = None
            for i in range(len(self.stack) - 1, 0, -1):
                t = self.stack[i].tag
                if t in closers:
                    cut = i
                elif t in ("a", "b", "i", "em", "strong", "span", "small", "u", "s", "p"):
                    continue
                else:
                    break
            if cut is not None:
                del self.stack[cut:]
        if tag in _P_CLOSERS:
            for i in range(len(self.stack) - 1, 0, -1):
                if self.stack[i].tag == "p":
                    del self.stack[i:]
                    break

    def handle_starttag(self, tag, attrs):
        self._close_implicit(tag)
        # first-wins for duplicate attributes (browser behavior)
        ad: dict[str, str] = {}
        for k, v in attrs:
            if k not in ad:
                ad[k] = v
        node = Node(tag, ad, self.stack[-1])
        self.stack[-1].children.append(node)
        if tag not in VOID_TAGS:
            self.stack.append(node)

    def handle_startendtag(self, tag, attrs):
        self._close_implicit(tag)
        ad: dict[str, str] = {}
        for k, v in attrs:
            if k not in ad:
                ad[k] = v
        self.stack[-1].children.append(Node(tag, ad, self.stack[-1]))

    def handle_endtag(self, tag):
        if tag in VOID_TAGS:
            return
        for i in range(len(self.stack) - 1, 0, -1):
            if self.stack[i].tag == tag:
                del self.stack[i:]
                return
        # unmatched end tag: ignore (tolerant)

    def handle_data(self, data):
        if data:
            self.stack[-1].children.append(data)

    def handle_comment(self, data):
        self.stack[-1].children.append(Comment(data))


def parse_html(html: str) -> Node:
    """Parse (possibly malformed) HTML into a DOM; never raises on bad input."""
    b = _TreeBuilder()
    try:
        b.feed(html or "")
        b.close()
    except Exception:
        pass  # keep whatever tree was built — tolerant parsing
    return b.root


def body_of(root: Node) -> Node:
    """Return the <body> node, or the document root if none exists."""
    return root.find("body") or root


# ---------------------------------------------------------------------------
# CSS-lite selector engine: tag, .class, #id, [attr], [attr=val], compound
# (tag.class#id), descendant (' ') and child ('>') combinators, ',' unions.
# ---------------------------------------------------------------------------

_SIMPLE_RE = re.compile(
    r"(?P<tag>[a-zA-Z][\w-]*|\*)?"
    r"(?P<rest>(?:[.#][\w-]+|\[[^\]]+\])*)"
)
_PART_RE = re.compile(r"([.#])([\w-]+)|\[([^\]]+)\]")


def _compile_simple(sel: str):
    m = _SIMPLE_RE.match(sel)
    if not m or m.end() != len(sel):
        raise ValueError(f"unsupported selector: {sel!r}")
    tag = m.group("tag")
    tag = None if tag in (None, "*") else tag.lower()
    classes: list[str] = []
    ids: list[str] = []
    attr_tests: list[tuple[str, str | None]] = []
    for pm in _PART_RE.finditer(m.group("rest") or ""):
        if pm.group(1) == ".":
            classes.append(pm.group(2))
        elif pm.group(1) == "#":
            ids.append(pm.group(2))
        else:
            expr = pm.group(3)
            if "=" in expr:
                k, v = expr.split("=", 1)
                attr_tests.append((k.strip(), v.strip().strip("'\"")))
            else:
                attr_tests.append((expr.strip(), None))

    def match(node: Node) -> bool:
        if tag is not None and node.tag != tag:
            return False
        if ids and node.attrs.get("id") not in ids:
            return False
        if classes:
            cls = (node.attrs.get("class") or "").split()
            if not all(c in cls for c in classes):
                return False
        for k, v in attr_tests:
            if k not in node.attrs:
                return False
            if v is not None and node.attrs.get(k) != v:
                return False
        return True

    return match


def _tokenize_chain(sel: str) -> list[tuple[str, str]]:
    """'div > p.x a' → [('desc','div'), ('child','p.x'), ('desc','a')]"""
    toks = sel.replace(">", " > ").split()
    out: list[tuple[str, str]] = []
    comb = "desc"
    for t in toks:
        if t == ">":
            comb = "child"
            continue
        out.append((comb, t))
        comb = "desc"
    return out


def select(root: Node, selector: str) -> list[Node]:
    """All element nodes under ``root`` matching the CSS-lite selector, in
    document order, deduplicated."""
    results: list[Node] = []
    seen: set[int] = set()
    for alt in selector.split(","):
        alt = alt.strip()
        if not alt:
            continue
        chain = _tokenize_chain(alt)
        matchers = [(comb, _compile_simple(s)) for comb, s in chain]
        current = [root]
        for comb, m in matchers:
            nxt: list[Node] = []
            if comb == "desc":
                for base in current:
                    for n in base.iter():
                        if n is not base and m(n):
                            nxt.append(n)
            else:  # child
                for base in current:
                    for n in base.element_children():
                        if m(n):
                            nxt.append(n)
            current = nxt
        for n in current:
            if id(n) not in seen:
                seen.add(id(n))
                results.append(n)
    # document order
    order: dict[int, int] = {}
    i = 0
    stack = [root]
    while stack:
        n = stack.pop()
        order[id(n)] = i
        i += 1
        stack.extend(c for c in reversed(n.children) if isinstance(c, Node))
    results.sort(key=lambda n: order.get(id(n), 1 << 30))
    return results


def pretty_format_html(src: str) -> str:
    """Indentation-only HTML pretty printer (E20), reference-exact
    (fast_format_html, ref utils.py:2163-2208: no parsing — tags and text
    are isolated by newline splitting, nesting tracked by a counter,
    two-space indent; golden-checked in tests/test_html_stack.py)."""
    pieces = src.replace(">", ">\n").replace("<", "\n<").split("\n")
    depth = 0
    lines: list[str] = []
    for piece in pieces:
        if not piece.strip():
            continue
        if piece.startswith("</"):
            depth -= 1
            lines.append("  " * depth + piece)
        elif piece.startswith("<") and piece.endswith("/>"):
            lines.append("  " * depth + piece)
        elif piece.startswith("<"):
            lines.append("  " * depth + piece)
            depth += 1
        else:
            stripped = piece.strip()
            if stripped:
                lines.append("  " * depth + stripped)
    return "\n".join(lines)
