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


def _extract_field(el: Node, field: dict):
    ftype = field.get("type", "text")
    if ftype == "text":
        sel = field.get("selector")
        target = select(el, sel)[0] if sel and select(el, sel) else (None if sel else el)
        if target is None:
            return field.get("default")
        value = target.text(strip=True)
    elif ftype == "attribute":
        sel = field.get("selector")
        cands = select(el, sel) if sel else [el]
        if not cands:
            return field.get("default")
        value = cands[0].get(field.get("attribute", ""), field.get("default"))
        if value is None:
            return field.get("default")
    elif ftype == "html":
        sel = field.get("selector")
        cands = select(el, sel) if sel else [el]
        if not cands:
            return field.get("default")
        value = cands[0].to_html()
    elif ftype == "regex":
        sel = field.get("selector")
        cands = select(el, sel) if sel else [el]
        if not cands:
            return field.get("default")
        src = cands[0].text()
        m = re.search(field.get("pattern", ""), src)
        value = m.group(1) if (m and m.groups()) else (m.group(0) if m else None)
        if value is None:
            return field.get("default")
    elif ftype == "nested":
        sel = field.get("selector")
        cands = select(el, sel) if sel else [el]
        if not cands:
            return field.get("default", {})
        return {
            f["name"]: _extract_field(cands[0], f) for f in field.get("fields", [])
        }
    elif ftype in ("list", "nested_list"):
        sel = field.get("selector")
        cands = select(el, sel) if sel else []
        sub = field.get("fields", [])
        if not sub:  # bare list → text values
            return [c.text(strip=True) for c in cands]
        return [
            {f["name"]: _extract_field(c, f) for f in sub} for c in cands
        ]
    else:
        return field.get("default")

    for tr in field.get("transform", "").split(",") if field.get("transform") else []:
        value = _apply_transform(value, tr.strip())
    return value


def extract_json_css(html: str, schema: dict) -> list[dict]:
    """Interpret a JSON-CSS schema over an HTML document → list of records."""
    root = parse_html(html)
    base_sel = schema.get("baseSelector")
    bases = select(root, base_sel) if base_sel else [root.find("body") or root]
    out: list[dict] = []
    base_fields = schema.get("baseFields", [])
    for el in bases:
        rec: dict = {}
        for f in base_fields:
            rec[f["name"]] = _extract_field(el, f)
        for f in schema.get("fields", []):
            rec[f["name"]] = _extract_field(el, f)
        out.append(rec)
    return out


def extract_json_css_str(html: str, schema_json: str) -> str:
    """String-in/string-out wrapper for UDF use."""
    try:
        schema = json.loads(schema_json)
        return json.dumps(extract_json_css(html, schema), ensure_ascii=False,
                          separators=(",", ":"), sort_keys=True)
    except Exception as e:  # extraction must never kill the batch
        return json.dumps({"error": str(e)})


# ---------------------------------------------------------------------------
# Regex extraction catalog (E13, ref :1897-2100)
# ---------------------------------------------------------------------------

REGEX_PATTERNS: dict[str, str] = {
    "email": r"[\w.+-]+@[\w-]+\.[\w.-]+",
    "phone_us": r"\(?\d{3}\)?[-.\s]?\d{3}[-.\s]?\d{4}",
    "url": r"https?://[^\s\"'<>]+",
    "ipv4": r"\b(?:\d{1,3}\.){3}\d{1,3}\b",
    "uuid": r"\b[0-9a-fA-F]{8}-[0-9a-fA-F]{4}-[0-9a-fA-F]{4}-[0-9a-fA-F]{4}-[0-9a-fA-F]{12}\b",
    "currency": r"[$€£¥]\s?\d+(?:,\d{3})*(?:\.\d{1,2})?",
    "percentage": r"\d+(?:\.\d+)?%",
    "number": r"\b\d+(?:,\d{3})*(?:\.\d+)?\b",
    "date_iso": r"\b\d{4}-\d{2}-\d{2}\b",
    "time_24h": r"\b(?:[01]\d|2[0-3]):[0-5]\d(?::[0-5]\d)?\b",
    "hex_color": r"#[0-9a-fA-F]{6}\b",
    "twitter_handle": r"@[A-Za-z0-9_]{1,15}\b",
    "mac_addr": r"\b(?:[0-9A-Fa-f]{2}:){5}[0-9A-Fa-f]{2}\b",
}


def extract_regex(url: str, text: str, patterns: list[str] | None = None) -> list[dict]:
    """Run named catalog patterns over text → rows of {url,label,value,span}."""
    names = patterns or list(REGEX_PATTERNS)
    out: list[dict] = []
    for name in names:
        pat = REGEX_PATTERNS.get(name)
        if not pat:
            continue
        for m in re.finditer(pat, text):
            out.append({
                "url": url, "label": name, "value": m.group(0),
                "span_start": m.start(), "span_end": m.end(),
            })
    return out
