"""Freeze regex-catalog goldens from the reference's DEFAULT_PATTERNS.

Run:  python scripts/gen_regex_goldens.py

Pulls the DEFAULT_PATTERNS dict literal out of the reference's
RegexExtractionStrategy via AST and replays the reference extract() loop
(finditer per label, IGNORECASE|MULTILINE) over sample documents.
"""

from __future__ import annotations

import ast
import json
import pathlib
import re

REF = pathlib.Path("/root/reference/crawl4ai/extraction_strategy.py")
OUT = pathlib.Path(__file__).resolve().parent.parent / "tests" / "goldens" / "regex_catalog.jsonl"

SAMPLES = {
    "comm": "mail a.b+c@ex-ample.co.uk or call +1 (555) 123-4567 / (555) 123 4567",
    "web": "see https://ex.com/p?a=1#f and 10.0.0.1 and 2001:0DB8:0000:0000:0008:0800:200C:417A",
    "ids": "id 123e4567-e89b-42d3-a456-426614174000 mac 00:1A:2B:3C:4D:5E",
    "money": "pay USD 5.00 or €3,50 or $1200 — growth 12.5% on 1,234,567 units",
    "dates": "2024-01-02 vs 1/2/24 at 23:59:59 or 9:05",
    "misc": "ZIP 90210-1234, SW1A 1AA, #ff00AA, @handle_1 #tag-x DE44500105175407324931",
    "cards": "visa 4111111111111111 mc 5500005555555559 amex 340000000000009",
    "mixed_case": "EMAIL@EXAMPLE.COM HTTPS://UP.example/PATH 2020-12-31",
}


def main() -> None:
    tree = ast.parse(REF.read_text())
    patterns = None
    for node in ast.walk(tree):
        if isinstance(node, ast.ClassDef) and node.name == "RegexExtractionStrategy":
            for sub in node.body:
                targets = (
                    sub.targets if isinstance(sub, ast.Assign)
                    else [sub.target] if isinstance(sub, ast.AnnAssign) else []
                )
                if any(getattr(t, "id", "") == "DEFAULT_PATTERNS" for t in targets):
                    patterns = ast.literal_eval(sub.value)
    assert patterns, "DEFAULT_PATTERNS not found"
    flags = re.IGNORECASE | re.MULTILINE
    rows = []
    for sname, text in SAMPLES.items():
        for label, pat in patterns.items():
            for m in re.compile(pat, flags).finditer(text):
                rows.append({"sample": sname, "label": label, "value": m.group(0),
                             "start": m.start(), "end": m.end()})
    with open(OUT, "w") as f:
        f.write(json.dumps({"patterns": patterns}) + "\n")
        for r in rows:
            f.write(json.dumps(r, ensure_ascii=False) + "\n")
    print(f"wrote {len(rows)} regex-catalog golden rows")


if __name__ == "__main__":
    main()
