"""Structured extraction: JSON-CSS schema interpreter + regex catalog.

Parity targets:
- JSON-CSS/XPath schema extraction — /root/reference/crawl4ai/
  extraction_strategy.py:995-1433 (baseSelector, baseFields, fields[] with
  type ∈ {text, attribute, html, regex, nested, list, nested_list},
  transforms lowercase/uppercase/strip, default values);
- Regex extraction catalog — ref :1897-2100 (named built-in patterns →
  {url, label, value, span} rows).

The interpreter runs inside a pandas UDF; user schemas stay dynamic while the
Spark column type stays a fixed JSON string — exactly the reference's
``extracted_content = json.dumps(...)`` contract (async_webcrawler.py:631-633).
"""

from __future__ import annotations

import json
import re

from crawl4ai_spark.html.dom import Node, parse_html, select


# ---------------------------------------------------------------------------
# JSON-CSS schema interpreter (E10)
# ---------------------------------------------------------------------------

def _apply_transform(value: str, transform: str) -> str:
    if transform == "lowercase":
        return value.lower()
    if transform == "uppercase":
        return value.upper()
    if transform == "strip":
        return value.strip()
    return value


def _extract_field(el: Node, field: dict, sel_fn=select):
    ftype = field.get("type", "text")
    if ftype == "text":
        sel = field.get("selector")
        target = sel_fn(el, sel)[0] if sel and sel_fn(el, sel) else (None if sel else el)
        if target is None:
            return field.get("default")
        value = target.text(strip=True)
    elif ftype == "attribute":
        sel = field.get("selector")
        cands = sel_fn(el, sel) if sel else [el]
        if not cands:
            return field.get("default")
        value = cands[0].get(field.get("attribute", ""), field.get("default"))
        if value is None:
            return field.get("default")
    elif ftype == "html":
        sel = field.get("selector")
        cands = sel_fn(el, sel) if sel else [el]
        if not cands:
            return field.get("default")
        value = cands[0].to_html()
    elif ftype == "regex":
        sel = field.get("selector")
        cands = sel_fn(el, sel) if sel else [el]
        if not cands:
            return field.get("default")
        src = cands[0].text()
        m = re.search(field.get("pattern", ""), src)
        value = m.group(1) if (m and m.groups()) else (m.group(0) if m else None)
        if value is None:
            return field.get("default")
    elif ftype == "nested":
        sel = field.get("selector")
        cands = sel_fn(el, sel) if sel else [el]
        if not cands:
            return field.get("default", {})
        return {
            f["name"]: _extract_field(cands[0], f, sel_fn) for f in field.get("fields", [])
        }
    elif ftype in ("list", "nested_list"):
        sel = field.get("selector")
        cands = sel_fn(el, sel) if sel else []
        sub = field.get("fields", [])
        if not sub:  # bare list → text values
            return [c.text(strip=True) for c in cands]
        return [
            {f["name"]: _extract_field(c, f, sel_fn) for f in sub} for c in cands
        ]
    else:
        return field.get("default")

    for tr in field.get("transform", "").split(",") if field.get("transform") else []:
        value = _apply_transform(value, tr.strip())
    return value


def _run_schema(root: Node, schema: dict, sel_fn) -> list[dict]:
    base_sel = schema.get("baseSelector")
    bases = sel_fn(root, base_sel) if base_sel else [root.find("body") or root]
    out: list[dict] = []
    base_fields = schema.get("baseFields", [])
    for el in bases:
        rec: dict = {}
        for f in base_fields:
            rec[f["name"]] = _extract_field(el, f, sel_fn)
        for f in schema.get("fields", []):
            rec[f["name"]] = _extract_field(el, f, sel_fn)
        out.append(rec)
    return out


def extract_json_css(html: str, schema: dict) -> list[dict]:
    """Interpret a JSON-CSS schema over an HTML document → list of records."""
    return _run_schema(parse_html(html), schema, select)


def extract_json_xpath(html: str, schema: dict) -> list[dict]:
    """Same schema interpreter with XPath selectors (E11 — parity target
    JsonXPathExtractionStrategy, ref extraction_strategy.py:1803-1894: the
    reference runs the identical field machinery over lxml.etree.xpath;
    here the selectors resolve through the xpath-lite evaluator below)."""
    return _run_schema(parse_html(html), schema, xpath_select)


def extract_json_css_str(html: str, schema_json: str) -> str:
    """String-in/string-out wrapper for UDF use. The schema may carry
    ``"selectorType": "xpath"`` to route through the XPath interpreter
    (the reference user picks JsonCss vs JsonXPath strategy classes)."""
    try:
        schema = json.loads(schema_json)
        if schema.get("selectorType") == "xpath":
            recs = extract_json_xpath(html, schema)
        else:
            recs = extract_json_css(html, schema)
        return json.dumps(recs, ensure_ascii=False,
                          separators=(",", ":"), sort_keys=True)
    except Exception as e:  # extraction must never kill the batch
        return json.dumps({"error": str(e)})


# ---------------------------------------------------------------------------
# XPath-lite evaluator (E11)
# ---------------------------------------------------------------------------
# Supported grammar (the subset real-world extraction schemas use):
#   //tag  /tag  .//tag  ./tag  *  steps chained with / (child) or // (descendant)
#   predicates: [n] (1-based, per context group), [last()], [@attr],
#               [@attr='v'], [@attr="v"], [contains(@attr,'v')]
# Selectors address ELEMENTS (attribute/text access happens via field types,
# exactly like the reference's interpreter).

_XP_STEP = re.compile(r"(/{1,2})([^/\[]+)((?:\[[^\]]*\])*)")
_XP_PRED = re.compile(r"\[([^\]]*)\]")


def _xp_pred_fn(pred: str):
    pred = pred.strip()
    if pred == "last()":
        return ("pos", -1)
    if pred.isdigit():
        return ("pos", int(pred))
    m = re.fullmatch(r"contains\(\s*@([\w:-]+)\s*,\s*(['\"])(.*?)\2\s*\)", pred)
    if m:
        attr, _, needle = m.groups()
        return ("test", lambda n: needle in (n.get(attr) or ""))
    m = re.fullmatch(r"@([\w:-]+)\s*=\s*(['\"])(.*?)\2", pred)
    if m:
        attr, _, val = m.groups()
        return ("test", lambda n: n.get(attr) == val)
    m = re.fullmatch(r"@([\w:-]+)", pred)
    if m:
        attr = m.group(1)
        return ("test", lambda n: n.get(attr) is not None)
    raise ValueError(f"unsupported xpath predicate [{pred}]")


def xpath_select(root: Node, xpath: str) -> list[Node]:
    """Evaluate an xpath-lite expression; elements in document order."""
    xp = xpath.strip()
    if xp.startswith("."):
        xp = xp[1:]
    if not xp.startswith("/"):
        xp = "//" + xp  # bare 'tag' behaves like a descendant search
    ctx = [root]
    pos = 0
    for m in _XP_STEP.finditer(xp):
        if m.start() != pos:
            raise ValueError(f"unsupported xpath syntax: {xpath!r}")
        pos = m.end()
        axis, test, preds = m.group(1), m.group(2).strip(), m.group(3)
        name_ok = (lambda n: True) if test == "*" else (lambda n: n.tag == test)
        pred_fns = [_xp_pred_fn(p) for p in _XP_PRED.findall(preds)]
        nxt: list[Node] = []
        seen: set[int] = set()
        for base in ctx:
            if axis == "//":
                group = [n for n in base.iter()
                         if isinstance(n, Node) and n is not base and name_ok(n)]
            else:
                group = [n for n in base.element_children() if name_ok(n)]
            for kind, arg in pred_fns:
                if kind == "pos":
                    idx = arg - 1 if arg > 0 else arg
                    group = [group[idx]] if -len(group) <= idx < len(group) else []
                else:
                    group = [n for n in group if arg(n)]
            for n in group:
                if id(n) not in seen:
                    seen.add(id(n))
                    nxt.append(n)
        ctx = nxt
    if pos != len(xp):
        raise ValueError(f"unsupported xpath syntax: {xpath!r}")
    # document order + cross-context dedup (same discipline as select())
    order: dict[int, int] = {}
    i = 0
    stack = [root]
    while stack:
        n = stack.pop()
        order[id(n)] = i
        i += 1
        stack.extend(c for c in reversed(n.children) if isinstance(c, Node))
    uniq: list[Node] = []
    seen2: set[int] = set()
    for n in ctx:
        if id(n) not in seen2:
            seen2.add(id(n))
            uniq.append(n)
    uniq.sort(key=lambda n: order.get(id(n), 1 << 30))
    return uniq


# ---------------------------------------------------------------------------
# Regex extraction catalog (E13, ref :1897-2100)
# ---------------------------------------------------------------------------

# The reference's DEFAULT_PATTERNS catalog, verbatim — the pattern strings
# ARE the behavioral spec (ref extraction_strategy.py:1974-2005); compiled
# with the same IGNORECASE|MULTILINE flags (ref :2007). Golden-checked in
# tests/test_chunk_parity_golden-style fashion by tests/test_html_stack.
REGEX_PATTERNS: dict[str, str] = {
    # Communication
    "email":           r"[\w.+-]+@[\w-]+\.[\w.-]+",
    "phone_intl":      r"\+?\d[\d .()-]{7,}\d",
    "phone_us":        r"\(?\d{3}\)?[ -. ]?\d{3}[ -. ]?\d{4}",
    # Web
    "url":             r"https?://[^\s\"'<>]+",
    "ipv4":            r"(?:\d{1,3}\.){3}\d{1,3}",
    "ipv6":            r"[A-F0-9]{1,4}(?::[A-F0-9]{1,4}){7}",
    # IDs
    "uuid":            r"[0-9a-f]{8}-[0-9a-f]{4}-[1-5][0-9a-f]{3}-[89ab][0-9a-f]{3}-[0-9a-f]{12}",
    # Money / numbers
    "currency":        r"(?:USD|EUR|RM|\$|€|£)\s?\d+(?:[.,]\d{2})?",
    "percentage":      r"\d+(?:\.\d+)?%",
    "number":          r"\b\d{1,3}(?:[,.\s]\d{3})*(?:\.\d+)?\b",
    # Dates / Times
    "date_iso":        r"\d{4}-\d{2}-\d{2}",
    "date_us":         r"\d{1,2}/\d{1,2}/\d{2,4}",
    "time_24h":        r"\b(?:[01]?\d|2[0-3]):[0-5]\d(?:[:.][0-5]\d)?\b",
    # Misc
    "postal_us":       r"\b\d{5}(?:-\d{4})?\b",
    "postal_uk":       r"\b[A-Z]{1,2}\d[A-Z\d]? ?\d[A-Z]{2}\b",
    "html_color_hex":  r"#[0-9A-Fa-f]{6}\b",
    "twitter_handle":  r"@[\w]{1,15}",
    "hashtag":         r"#[\w-]+",
    "mac_addr":        r"(?:[0-9A-Fa-f]{2}:){5}[0-9A-Fa-f]{2}",
    "iban":            r"[A-Z]{2}\d{2}[A-Z0-9]{11,30}",
    "credit_card":     r"\b(?:4\d{12}(?:\d{3})?|5[1-5]\d{14}|3[47]\d{13}|6(?:011|5\d{2})\d{12})\b",
}

_REGEX_FLAGS = re.IGNORECASE | re.MULTILINE  # ref :2007


def extract_regex(url: str, text: str, patterns: list[str] | None = None) -> list[dict]:
    """Run named catalog patterns over text → rows of
    {url, label, value, span_start, span_end} — the reference's extract()
    output (ref :2053-2070; its ``span: [start, end]`` list is flattened to
    two columns for a fixed Spark schema)."""
    names = patterns or list(REGEX_PATTERNS)
    out: list[dict] = []
    for name in names:
        pat = REGEX_PATTERNS.get(name)
        if not pat:
            continue
        for m in re.finditer(pat, text, _REGEX_FLAGS):
            out.append({
                "url": url, "label": name, "value": m.group(0),
                "span_start": m.start(), "span_end": m.end(),
            })
    return out
