"""Generate LLM-strategy parsing-helper goldens from the reference's code.

Run:  python scripts/gen_llm_goldens.py

AST-extracts the deterministic response-parsing helpers that
LLMExtractionStrategy / LLMContentFilter are built on —
``split_and_parse_json_objects``, ``escape_json_string``,
``extract_xml_data``, ``sanitize_html``, ``sanitize_input_encode``
(utils.py:707-824,1709-1740) — runs them over an adversarial fixture
battery, and freezes the outputs to tests/goldens/llm_parsing.jsonl.
tests/test_llm_strategies.py replays our implementations against them with
no reference imports.
"""

from __future__ import annotations

import ast
import json
import pathlib
import re

REF = pathlib.Path("/root/reference/crawl4ai")
OUT = pathlib.Path(__file__).resolve().parent.parent / "tests" / "goldens"

NAMES = {
    "split_and_parse_json_objects",
    "escape_json_string",
    "extract_xml_data",
    "sanitize_html",
    "sanitize_input_encode",
}


def extract() -> dict:
    tree = ast.parse((REF / "utils.py").read_text())
    keep = [n for n in tree.body
            if isinstance(n, ast.FunctionDef) and n.name in NAMES]
    assert {n.name for n in keep} == NAMES
    ns = {"json": json, "re": re, "print": lambda *a, **k: None}
    exec(compile(ast.Module(body=keep, type_ignores=[]),
                 str(REF / "utils.py"), "exec"), ns)
    return ns


JSON_STRINGS = [
    '[{"a": 1}, {"b": 2}]',
    '[{"a": 1}, {"b": broken}]',
    '{"solo": true}',
    '[{"nested": {"x": [1, 2]}}, {"y": "z"}]',
    'garbage before [{"k": "v"}] after',
    '[]',
    '',
    '[{"unclosed": 1}',
    '{"a": 1} {"b": 2}',
    '[{"s": "with \\"escaped\\" quotes"}]',
]

ESCAPE_STRINGS = [
    'plain',
    'quo"te and back\\slash',
    'line\nbreak\ttab\rret',
    'ctl\x01chars\x7f\x9fhere',
    'unicode é ☃ ok',
    '',
    '\b\f mixed "x" \\',
]

XML_STRINGS = [
    ('<blocks>[{"i": 1}]</blocks>', ["blocks"]),
    ('pre <content>md **here**</content> post', ["content"]),
    ('<a>short</a> <a>the longer one wins</a>', ["a"]),
    ('no tags at all', ["blocks", "content"]),
    ('<b>multi\nline\ncontent</b>', ["b"]),
    ('<t>outer <t>inner</t></t>', ["t"]),
    ('<x></x>', ["x"]),
]

SANITIZE_HTML = [
    '<div class="x">a\'b"c</div>',
    "plain text",
    '',
    '<a href="u">t</a>\n<p>q\'s</p>',
]

# NB: the lone-surrogate case can't round-trip through a JSON golden file;
# tests/test_llm_strategies.py asserts it directly (utf-8 ignore drops it)
SANITIZE_INPUT = [
    "plain",
    "",
    "surrogate-free é ☃",
]


def main() -> None:
    ns = extract()
    rows = []
    for s in JSON_STRINGS:
        parsed, unparsed = ns["split_and_parse_json_objects"](s)
        rows.append({"fn": "split_and_parse_json_objects", "in": s,
                     "out": [parsed, unparsed]})
    for s in ESCAPE_STRINGS:
        rows.append({"fn": "escape_json_string", "in": s,
                     "out": ns["escape_json_string"](s)})
    for s, tags in XML_STRINGS:
        rows.append({"fn": "extract_xml_data", "in": [tags, s],
                     "out": ns["extract_xml_data"](tags, s)})
    for s in SANITIZE_HTML:
        rows.append({"fn": "sanitize_html", "in": s,
                     "out": ns["sanitize_html"](s)})
    for s in SANITIZE_INPUT:
        rows.append({"fn": "sanitize_input_encode", "in": s,
                     "out": ns["sanitize_input_encode"](s)})
    OUT.mkdir(parents=True, exist_ok=True)
    path = OUT / "llm_parsing.jsonl"
    with path.open("w") as f:
        for r in rows:
            f.write(json.dumps(r, ensure_ascii=False) + "\n")
    print(f"wrote {len(rows)} goldens to {path}")


if __name__ == "__main__":
    main()
