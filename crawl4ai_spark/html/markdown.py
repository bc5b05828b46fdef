"""HTML → markdown conversion + link citations.

Capability parity with the reference's DefaultMarkdownGenerator +
CustomHTML2Text (/root/reference/crawl4ai/markdown_generation_strategy.py:55-260,
crawl4ai/html2text/__init__.py) — rebuilt from scratch (the vendored html2text
fork is unavailable here), with the same observable behaviors:

- body_width=0 (no wrapping), fenced code blocks (mark_code), ``*`` list
  marker, ``**bold**`` / ``*em*``, ATX headings, pipe tables;
- citations: links numbered in first-seen order, inline ``text⟨n⟩``
  substitution, trailing ``## References`` block
  (ref markdown_generation_strategy.py:82-146).

Deterministic: same HTML in → same markdown bytes out, everywhere.
"""

from __future__ import annotations

import re

from crawl4ai_spark.html.dom import Node, parse_html

_WS = re.compile(r"\s+")
_BLOCK_TAGS = frozenset(
    {"p", "div", "section", "article", "main", "aside", "header", "footer",
     "nav", "ul", "ol", "li", "table", "blockquote", "pre", "figure",
     "h1", "h2", "h3", "h4", "h5", "h6", "hr", "br", "tr", "form", "body", "html"}
)


def _collapse(s: str) -> str:
    return _WS.sub(" ", s)


class _Renderer:
    def __init__(self, base_url: str = ""):
        self.base_url = base_url

    # -- inline -------------------------------------------------------------
    def inline(self, node: Node) -> str:
        out: list[str] = []
        for c in node.children:
            if isinstance(c, str):
                out.append(_collapse(c))
            elif isinstance(c, Node):
                out.append(self.render_inline_node(c))
        return "".join(out)

    def render_inline_node(self, n: Node) -> str:
        t = n.tag
        if t in ("strong", "b"):
            inner = self.inline(n).strip()
            return f"**{inner}**" if inner else ""
        if t in ("em", "i"):
            inner = self.inline(n).strip()
            return f"*{inner}*" if inner else ""
        if t == "code":
            inner = n.text()
            return f"`{inner.strip()}`" if inner.strip() else ""
        if t == "a":
            href = n.get("href") or ""
            text = self.inline(n).strip() or href
            title = n.get("title")
            if not href:
                return text
            if title:
                return f'[{text}]({href} "{title}")'
            return f"[{text}]({href})"
        if t == "img":
            src = n.get("src") or ""
            alt = n.get("alt") or ""
            title = n.get("title")
            if not src:
                return ""
            if title:
                return f'![{alt}]({src} "{title}")'
            return f"![{alt}]({src})"
        if t == "br":
            return "\n"
        if t in ("span", "small", "u", "s", "sub", "sup", "abbr", "cite",
                 "q", "time", "mark", "label"):
            return self.inline(n)
        # block tag encountered inline: render as block text
        return self.inline(n)

    # -- blocks ---------------------------------------------------------------
    def blocks(self, node: Node, depth: int = 0) -> list[str]:
        """Render the children of ``node`` as a list of markdown blocks."""
        out: list[str] = []
        inline_run: list[str] = []

        def flush():
            if inline_run:
                txt = "".join(inline_run).strip()
                if txt:
                    out.append(txt)
                inline_run.clear()

        for c in node.children:
            if isinstance(c, str):
                inline_run.append(_collapse(c))
            elif isinstance(c, Node):
                if c.tag in _BLOCK_TAGS:
                    flush()
                    out.extend(self.render_block(c, depth))
                else:
                    inline_run.append(self.render_inline_node(c))
        flush()
        return out

    def render_block(self, n: Node, depth: int = 0) -> list[str]:
        t = n.tag
        if t in ("h1", "h2", "h3", "h4", "h5", "h6"):
            level = int(t[1])
            txt = self.inline(n).strip()
            return [f"{'#' * level} {txt}"] if txt else []
        if t == "p":
            txt = self.inline(n).strip()
            return [txt] if txt else []
        if t == "hr":
            return ["---"]
        if t == "br":
            return []
        if t == "pre":
            code = n.text()
            code = code.strip("\n")
            return [f"```\n{code}\n```"]
        if t == "blockquote":
            inner = self.blocks(n, depth)
            joined = "\n\n".join(inner)
            quoted = "\n".join(
                ("> " + line) if line else ">" for line in joined.split("\n")
            )
            return [quoted] if quoted else []
        if t in ("ul", "ol"):
            return self.render_list(n, t, depth)
        if t == "table":
            return self.render_table(n)
        if t in ("div", "section", "article", "main", "aside", "header",
                 "footer", "nav", "figure", "form", "body", "html"):
            return self.blocks(n, depth)
        if t == "li":
            txt = self.inline(n).strip()
            return [txt] if txt else []
        # unknown block-ish tag: treat children as blocks
        return self.blocks(n, depth)

    def render_list(self, n: Node, kind: str, depth: int) -> list[str]:
        items: list[str] = []
        idx = 1
        indent = "  " * depth
        for li in n.element_children():
            if li.tag != "li":
                continue
            # split the li into its own inline text + nested lists
            nested: list[str] = []
            head_parts: list[str] = []
            for c in li.children:
                if isinstance(c, Node) and c.tag in ("ul", "ol"):
                    nested.extend(self.render_list(c, c.tag, depth + 1))
                elif isinstance(c, Node) and c.tag in _BLOCK_TAGS:
                    sub = self.render_block(c, depth + 1)
                    head_parts.append(" ".join(sub))
                elif isinstance(c, str):
                    head_parts.append(_collapse(c))
                else:
                    head_parts.append(self.render_inline_node(c))
            head = "".join(head_parts).strip()
            marker = "*" if kind == "ul" else f"{idx}."
            if head:
                items.append(f"{indent}{marker} {head}")
            idx += 1
            items.extend(nested)
        return ["\n".join(items)] if items else []

    def render_table(self, n: Node) -> list[str]:
        rows: list[list[str]] = []
        header: list[str] | None = None
        for tr in n.find_all("tr"):
            cells = [c for c in tr.element_children() if c.tag in ("td", "th")]
            if not cells:
                continue
            vals = [self.inline(c).strip().replace("|", "\\|") for c in cells]
            if header is None and all(c.tag == "th" for c in cells):
                header = vals
            else:
                rows.append(vals)
        if header is None and rows:
            header = [""] * len(rows[0])
        if header is None:
            return []
        ncols = max([len(header)] + [len(r) for r in rows])
        header = (header + [""] * ncols)[:ncols]
        rows = [(r + [""] * ncols)[:ncols] for r in rows]
        lines = ["| " + " | ".join(header) + " |",
                 "|" + "|".join([" --- "] * ncols) + "|"]
        lines += ["| " + " | ".join(r) + " |" for r in rows]
        return ["\n".join(lines)]


def html_to_markdown(html: str, base_url: str = "") -> str:
    """Convert an HTML document or fragment to markdown (raw_markdown)."""
    root = parse_html(html)
    body = root.find("body") or root
    blocks = _Renderer(base_url).blocks(body)
    md = "\n\n".join(b for b in blocks if b)
    # normalize >2 consecutive newlines
    md = re.sub(r"\n{3,}", "\n\n", md)
    return md.strip() + ("\n" if md.strip() else "")


# ---------------------------------------------------------------------------
# citations (E6, ref markdown_generation_strategy.py:82-146)
# ---------------------------------------------------------------------------

_LINK_RE = re.compile(r"(!?)\[([^\]]*)\]\((\S+?)(?:\s+\"([^\"]*)\")?\)")


def add_citations(markdown: str, base_url: str = "") -> tuple[str, str]:
    """Replace inline links with ``text⟨n⟩`` citations, numbered in
    first-seen order; return (markdown_with_citations, references_markdown)."""
    url_nums: dict[str, int] = {}
    url_titles: dict[str, str] = {}

    def repl(m: re.Match) -> str:
        bang, text, url, title = m.group(1), m.group(2), m.group(3), m.group(4)
        if url not in url_nums:
            url_nums[url] = len(url_nums) + 1
            url_titles[url] = title or ""
        n = url_nums[url]
        if bang:
            return f"![{text}⟨{n}⟩]"
        return f"{text}⟨{n}⟩"

    cited = _LINK_RE.sub(repl, markdown)
    if not url_nums:
        return cited, ""
    lines = ["## References", ""]
    for url, n in sorted(url_nums.items(), key=lambda kv: kv[1]):
        title = url_titles[url]
        suffix = f": {title}" if title else ""
        lines.append(f"⟨{n}⟩ {url}{suffix}")
    refs = "\n".join(lines) + "\n"
    return cited, refs
