"""Reference-exact parity for the regex extraction catalog (E13).

Goldens in tests/goldens/regex_catalog.jsonl come from
scripts/gen_regex_goldens.py, which AST-extracts the reference's
DEFAULT_PATTERNS and replays its extract() loop (finditer per label,
IGNORECASE|MULTILINE) over sample documents. First golden line = the
pattern catalog itself; the rest are expected match rows in order.
"""

import json
import pathlib

from crawl4ai_spark.html.extraction import REGEX_PATTERNS, extract_regex

GOLD = pathlib.Path(__file__).parent / "goldens" / "regex_catalog.jsonl"
_LINES = [json.loads(l) for l in GOLD.open()]
REF_PATTERNS = _LINES[0]["patterns"]
REF_ROWS = _LINES[1:]

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


def test_catalog_matches_reference_verbatim():
    assert REGEX_PATTERNS == REF_PATTERNS


def test_extraction_rows_match_reference():
    mine = []
    for sname, text in SAMPLES.items():
        for r in extract_regex("u", text):
            mine.append({"sample": sname, "label": r["label"], "value": r["value"],
                         "start": r["span_start"], "end": r["span_end"]})
    assert mine == REF_ROWS
