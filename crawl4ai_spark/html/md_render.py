"""Byte-parity HTML → markdown renderer.

Parity target: the reference's ``CustomHTML2Text`` under the defaults that
``DefaultMarkdownGenerator`` applies (reference
``markdown_generation_strategy.py:181-214``: ``body_width=0``,
``single_line_break=True``, ``mark_code=True``, ``escape_snob=False``, plus
the ``CustomHTML2Text.__init__`` overrides ``ignore_mailto_links=True``,
``skip_internal_links=False`` — reference ``html2text/__init__.py:1035-1060``).

This module is a from-scratch reimplementation of the *observable behavior*
of that configuration (verified byte-for-byte by golden files generated from
the reference fork — see ``tests/test_markdown_golden.py``). It is NOT a copy:
only the default code paths are implemented, the structure is event-stream +
small emitter, and none of the reference's config surface (google-docs mode,
body wrapping, reference-style links, table padding, preserved tags) exists
here because the Spark pipeline never enables it.

Behavioral notes (each cites the reference line that defines it):

- blocks separated by ONE newline (``single_line_break`` → ``p_p=1``,
  ref ``__init__.py:757-759``);
- ``<pre>`` becomes a ``` fence with raw body (CustomHTML2Text override,
  ref ``__init__.py:1108-1114``), NOT the base class's ``[code]`` marker;
- inline ``<code>`` emits backticks itself unless inside a link, where the
  base class emits them instead (ref ``__init__.py:1115-1130``);
- emphasis ``_``, strong ``**``, with the "separate from preceding
  alphanumeric / mark char with a space" rules (ref ``__init__.py:422-475``);
- lists indent two spaces per open list (three for a ul directly inside an
  ol), marker ``* `` / ``n. `` (ref ``__init__.py:652-678``);
- tables render as ``a| b  `` rows with a ``---|---`` underline after the
  first row, soft line breaks (trailing two spaces) throughout
  (ref ``__init__.py:704-733``);
- links inline, ``<url>`` autolink when text == absolute href
  (ref ``__init__.py:901-914``), mailto hrefs ignored, ``[`` emitted lazily;
- entities unified to ASCII (``&rsquo;``→``'`` …) per the UNIFIABLE table
  (ref ``config.py:115-154``), ``&nbsp;`` → placeholder → space;
- data escaping: only backslash-escaping is active (``escape_md_section``
  is called without ``escape_backslash`` so it defaults True while
  snob/dot/plus/dash are all False — ref ``__init__.py:916-923``,
  ``utils.py:207-234``);
- output always ends with a single trailing newline (ref ``finish``,
  ``__init__.py:168-186``).
"""

from __future__ import annotations

import html.entities
import html.parser
import re
import string
from urllib.parse import urljoin

# Entity → ASCII unification table (ref config.py:115-154). `nbsp` maps to a
# placeholder so collapse/space logic never eats it; swapped for " " at the end.
_NBSP_TOKEN = "&nbsp_place_holder;"
_ENTITY_ASCII = {
    "rsquo": "'", "lsquo": "'", "rdquo": '"', "ldquo": '"',
    "copy": "(C)", "mdash": "--", "nbsp": _NBSP_TOKEN, "rarr": "->",
    "larr": "<-", "middot": "*", "ndash": "-", "oelig": "oe", "aelig": "ae",
    "agrave": "a", "aacute": "a", "acirc": "a", "atilde": "a", "auml": "a",
    "aring": "a", "egrave": "e", "eacute": "e", "ecirc": "e", "euml": "e",
    "igrave": "i", "iacute": "i", "icirc": "i", "iuml": "i",
    "ograve": "o", "oacute": "o", "ocirc": "o", "otilde": "o", "ouml": "o",
    "ugrave": "u", "uacute": "u", "ucirc": "u", "uuml": "u",
    "lrm": "", "rlm": "",
}
# numeric charrefs unify through the same table, except nbsp (ref utils.py:6-10)
_CODEPOINT_ASCII = {
    html.entities.name2codepoint[k]: v
    for k, v in _ENTITY_ASCII.items()
    if k != "nbsp"
}

_WS_RUN = re.compile(r"\s+")
_ABS_URL = re.compile(r"^[a-zA-Z+]+://")
# chars escaped inside link urls / titles / image alts (ref config.py:68)
_LINK_SPECIALS = re.compile(r"([\\\[\]\(\)])")
# backslash-before-markdown-special escaping for text data (ref config.py:105-113)
_BS_BEFORE_SPECIAL = re.compile(r"(\\)(?=[\\`*_{}\[\]()#+\-.!])")
# first char after a closing emphasis mark that needs a separating space
_STRESS_JOIN = re.compile(r"[^][(){}\s.!?]")

# the reference's hn() accepts h1..h9 (ref utils.py:13-18)
_HEADING = {f"h{n}": n for n in range(1, 10)}


def _escape_link_part(s: str) -> str:
    return _LINK_SPECIALS.sub(r"\\\1", s)


class _OpenList:
    __slots__ = ("kind", "counter")

    def __init__(self, kind: str, counter: int):
        self.kind = kind        # "ul" | "ol"
        self.counter = counter  # last ordinal emitted (ol)


class MarkdownRenderer(html.parser.HTMLParser):
    """Streaming HTML→markdown converter; one instance per document."""

    def __init__(self, base_url: str = ""):
        super().__init__(convert_charrefs=False)
        self.base_url = base_url

        self._parts: list[str] = []     # output chunks (granularity matters:
                                        # heading-inside-link pops a lone "[")
        self._ended_nl = False          # last pushed chunk ended with \n
        self._mute = 0                  # inside head/style/script
        self._breaks = 0                # pending newline count before next chunk
        self._soft = ""                 # pending "  " soft-break tail
        self._fresh = True              # document/blockquote/li start: swallow
                                        # pending space + breaks once
        self._space = False             # a collapsed leading space is pending

    # -- link state --
        self._links: list[dict | None] = []   # open <a> frames (None = inert)
        self._auto_href: str | None = None    # candidate for <url> autolink
        self._link_empty = False              # no content seen inside <a> yet
        self._in_link = False

        # -- list / table / quote state --
        self._lists: list[_OpenList] = []
        self._prev_was_list = False
        self._quote = 0
        self._row_splitting = False     # a cell was already emitted in this row
        self._cells_in_row = 0
        self._awaiting_header_rule = False

        # -- span state --
        self._pre_fence = False         # inside <pre> (custom ``` fence mode)
        self._code_span = False         # inside <code>
        self._tick_open = False         # base-class backtick toggle (kbd/tt,
                                        # and code-inside-link)
        self._q_open = False
        self._just_stressed = False
        self._after_stress = False
        self._prev_text = ""
        self._last_tag = ""

        # -- abbr state --
        self._abbr_text: str | None = None
        self._abbr_title: str | None = None
        self._abbr_defs: dict[str, str] = {}

    # ------------------------------------------------------------------ api

    def render(self, src: str) -> str:
        self._fresh = True
        self.feed(src.replace("</' + 'script>", "</ignore>"))
        self.feed("")
        self.close()
        self._queue_break()
        self._emit("", force="end")
        out = "".join(self._parts).replace(_NBSP_TOKEN, " ")
        self._parts = []
        return out

    # ------------------------------------------------------------ emitter

    def _push(self, s: str) -> None:
        self._parts.append(s)
        if s:
            self._ended_nl = s.endswith("\n")

    def _queue_break(self) -> None:
        # pbr (ref __init__.py:752-755): at least one pending newline
        if self._breaks == 0:
            self._breaks = 1

    def _block_gap(self) -> None:
        # p() under single_line_break=True (ref __init__.py:757-759)
        self._breaks = 1

    def _soft_break(self) -> None:
        self._queue_break()
        self._soft = "  "

    def _emit(self, chunk: str, collapse: bool = False, force=False) -> None:
        """Emit one chunk, resolving pending breaks/space/quote prefix.

        Mirrors the reference's ``o()`` (ref __init__.py:766-876) restricted
        to the default-config paths (no google-doc styles, no pre-indent —
        <pre> is handled by the fence override, so the base 4-space indent
        branch is dead; no reference-style link flushing: links are inline).
        """
        if self._abbr_text is not None:
            self._abbr_text += chunk
        if self._mute:
            return
        if collapse and not self._pre_fence:
            chunk = _WS_RUN.sub(" ", chunk)
            if chunk.startswith(" "):
                self._space = True
                chunk = chunk[1:]
        if not chunk and not force:
            return
        prefix = ">" * self._quote
        if self._quote and not (force and chunk[:1] == ">"):
            prefix += " "
        if self._fresh:
            self._space = False
            self._breaks = 0
            self._fresh = False
        if force == "end":
            self._breaks = 0
            self._push("\n")
            self._space = False
        if self._breaks:
            self._push((self._soft + "\n" + prefix) * self._breaks)
            self._space = False
            self._soft = ""
        if self._space:
            if not self._ended_nl:
                self._push(" ")
            self._space = False
        if self._abbr_defs and force == "end":
            for term, meaning in self._abbr_defs.items():
                self._push("  *[" + term + "]: " + meaning + "\n")
        self._breaks = 0
        self._push(chunk)

    # ----------------------------------------------------------- tag events

    def handle_starttag(self, tag, attrs):
        self._tag_event(tag, dict(attrs), True)

    def handle_endtag(self, tag):
        self._tag_event(tag, {}, False)

    def _tag_event(self, tag: str, attrs: dict, opening: bool) -> None:
        # NOTE: _last_tag deliberately NOT updated here — the reference only
        # records current_tag inside the base handle_tag, which its custom
        # <pre>/<code> layer bypasses (ref __init__.py:313 vs :1107-1130).

        # <pre>/<code> overrides (ref CustomHTML2Text, __init__.py:1107-1130):
        # handled before anything else; <pre> never reaches the shared logic.
        if tag == "pre":
            if opening:
                self._emit("```\n")
                self._pre_fence = True
            else:
                self._emit("\n```\n")
                self._pre_fence = False
            return
        if tag == "code":
            if self._pre_fence:
                return
            if not self._in_link:
                self._emit("`")
                self._code_span = opening
                return
            self._code_span = opening
            # inside a link the base-class logic runs too (emits the tick)

        self._shared_tag_event(tag, attrs, opening)

    def _shared_tag_event(self, tag: str, attrs: dict, opening: bool) -> None:
        self._last_tag = tag
        # a pending autolink is cancelled by any markup that can produce
        # output (ref __init__.py:319-329)
        if (
            opening
            and self._auto_href is not None
            and tag not in ("p", "div", "style", "dl", "dt")
            and tag != "img"
        ):
            self._emit("[")
            self._auto_href = None
            self._link_empty = False

        level = _HEADING.get(tag, 0)
        if level:
            if self._links:
                # heading inside <a> (ref __init__.py:350-363)
                if opening:
                    if self._parts and self._parts[-1] == "[":
                        self._parts.pop()
                        self._space = False
                        self._emit("#" * level + " ")
                        self._emit("[")
                else:
                    self._breaks = 0
                    return
            else:
                self._block_gap()
                if opening:
                    self._emit("#" * level + " ")
                else:
                    return

        if tag in ("p", "div"):
            if not self._links and not self._row_splitting:
                self._block_gap()

        if tag == "br" and opening:
            self._emit("  \n> " if self._quote > 0 else "  \n")

        if tag == "hr" and opening:
            self._block_gap()
            self._emit("* * *")
            self._block_gap()

        if tag in ("head", "style", "script"):
            self._mute += 1 if opening else -1
        if tag == "body":
            self._mute = 0

        if tag == "blockquote":
            if opening:
                self._block_gap()
                self._emit("> ", force=True)
                self._fresh = True
                self._quote += 1
            else:
                self._quote -= 1
                self._block_gap()

        if tag in ("em", "i", "u"):
            mark = "_"
            if (
                opening
                and self._prev_text
                and self._prev_text[-1] not in string.whitespace
                and self._prev_text[-1] not in string.punctuation
            ):
                mark = " _"
                self._prev_text += " "
            self._emit(mark)
            if opening:
                self._just_stressed = True

        if tag in ("strong", "b"):
            mark = "**"
            if opening and self._prev_text and self._prev_text[-1] == "*":
                mark = " **"
                self._prev_text += " "
            self._emit(mark)
            if opening:
                self._just_stressed = True

        if tag in ("del", "strike", "s"):
            mark = "~~"
            if opening and self._prev_text and self._prev_text[-1] == "~":
                mark = " ~~"
                self._prev_text += " "
            self._emit(mark)
            if opening:
                self._just_stressed = True

        if tag in ("kbd", "code", "tt"):
            # base backtick toggle; "code" reaches here only inside a link
            self._emit("`")
            self._tick_open = not self._tick_open

        if tag == "abbr":
            if opening:
                self._abbr_title = attrs.get("title")
                self._abbr_text = ""
            else:
                if self._abbr_title is not None:
                    self._abbr_defs[self._abbr_text or ""] = self._abbr_title
                    self._abbr_title = None
                self._abbr_text = None

        if tag == "q":
            self._emit('"')
            self._q_open = not self._q_open

        if tag == "a":
            if opening:
                self._in_link = True
                href = attrs.get("href")
                if href is not None and not href.startswith("mailto:"):
                    self._links.append(attrs)
                    self._auto_href = href
                    self._link_empty = True
                else:
                    self._links.append(None)
            else:
                self._in_link = False
                if self._links:
                    frame = self._links.pop()
                    if self._auto_href and not self._link_empty:
                        self._auto_href = None
                    elif frame:
                        if self._link_empty:
                            self._emit("[")
                            self._link_empty = False
                            self._auto_href = None
                        self._breaks = 0
                        title = _escape_link_part(frame.get("title") or "")
                        url = _escape_link_part(
                            urljoin(self.base_url, frame["href"])
                        )
                        tpart = ' "{}"'.format(title) if title.strip() else ""
                        self._emit("](" + url + tpart + ")")

        if tag == "img" and opening and attrs.get("src") is not None:
            alt = attrs.get("alt") or ""
            if self._auto_href is not None:
                self._emit("[")
                self._auto_href = None
                self._link_empty = False
            self._emit("![" + _escape_link_part(alt) + "]")
            self._emit(
                "(" + _escape_link_part(urljoin(self.base_url, attrs["src"])) + ")"
            )

        # definition lists (ref __init__.py:614-630)
        if tag == "dl" and opening:
            self._block_gap()
            self._breaks = 0
        elif tag == "dt" and opening:
            if self._breaks == 0:
                self._emit("\n\n")
            self._breaks = 0
        elif tag == "dt" and not opening:
            self._emit("\n")
        elif tag == "dd" and opening:
            self._emit("    ")
        elif tag == "dd" and not opening:
            self._breaks = 0

        if tag in ("ol", "ul"):
            if not self._lists and not self._prev_was_list:
                self._block_gap()
            if opening:
                first = 0
                if attrs.get("start") is not None:
                    try:
                        first = int(attrs["start"]) - 1
                    except ValueError:
                        first = 0
                self._lists.append(_OpenList(tag, first))
            else:
                if self._lists:
                    self._lists.pop()
                    if not self._lists:
                        self._emit("\n")
            self._prev_was_list = True
        else:
            self._prev_was_list = False

        if tag == "li":
            self._queue_break()
            if opening:
                item = self._lists[-1] if self._lists else _OpenList("ul", 0)
                outer = None
                for lst in self._lists:
                    # 2 spaces per open list; 3 for a ul nested in an ol
                    # (ref __init__.py:662-671, commonmark motivation)
                    self._emit("   " if outer == "ol" and lst.kind == "ul" else "  ")
                    outer = lst.kind
                if item.kind == "ul":
                    self._emit("* ")
                else:
                    item.counter += 1
                    self._emit(str(item.counter) + ". ")
                self._fresh = True

        if tag in ("table", "tr", "td", "th"):
            if tag == "table" and opening:
                self._awaiting_header_rule = True
            if tag in ("td", "th") and opening:
                if self._row_splitting:
                    self._emit("| ")
                self._row_splitting = True
            if tag == "tr" and opening:
                self._cells_in_row = 0
            if tag == "tr" and not opening:
                self._row_splitting = False
                self._soft_break()
                if self._awaiting_header_rule:
                    self._emit("|".join(["---"] * self._cells_in_row))
                    self._soft_break()
                    self._awaiting_header_rule = False
            if tag in ("td", "th") and opening:
                self._cells_in_row += 1

    # ---------------------------------------------------------- data events

    def handle_data(self, data: str, from_entity: bool = False) -> None:
        if not data:
            return
        if self._pre_fence:
            self._emit(data)            # raw, newlines preserved
            return
        if self._code_span:
            self._emit(data.replace("\n", " "))
            return

        if self._just_stressed:
            data = data.strip()
            self._just_stressed = False
            self._after_stress = True
        elif self._after_stress:
            if (
                _STRESS_JOIN.match(data[:1])
                and self._last_tag not in _HEADING
                and self._last_tag not in ("a", "code", "pre")
            ):
                data = " " + data
            self._after_stress = False

        if self._auto_href is not None:
            if data == self._auto_href and _ABS_URL.match(self._auto_href):
                self._emit("<" + data + ">")
                self._link_empty = False
                return
            self._emit("[")
            self._auto_href = None
            self._link_empty = False

        if not self._tick_open and not from_entity:
            data = _BS_BEFORE_SPECIAL.sub(r"\\\1", data)
        self._prev_text = data
        self._emit(data, collapse=True)

    def handle_entityref(self, name: str) -> None:
        if name in _ENTITY_ASCII:
            text = _ENTITY_ASCII[name]
        else:
            try:
                text = html.entities.html5[name + ";"]
            except KeyError:
                text = "&" + name + ";"
        if text:
            self.handle_data(text, True)

    def handle_charref(self, name: str) -> None:
        cp = int(name[1:], 16) if name[:1] in ("x", "X") else int(name)
        if cp in _CODEPOINT_ASCII:
            text = _CODEPOINT_ASCII[cp]
        else:
            try:
                text = chr(cp)
            except ValueError:
                text = ""
        if text:
            self.handle_data(text, True)


def render_markdown(src: str, base_url: str = "") -> str:
    """Render HTML to markdown exactly as the reference's fit/raw path does
    (no post-processing; the raw_markdown fence fix-up lives in the caller)."""
    return MarkdownRenderer(base_url).render(src or "")
