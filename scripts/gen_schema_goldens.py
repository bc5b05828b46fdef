"""Generate schema-generation goldens from the reference's own code.

Run:  python scripts/gen_schema_goldens.py

AST-extracts ``JsonElementExtractionStrategy.generate_schema``
(/root/reference/crawl4ai/extraction_strategy.py:1280-1392), executes it
standalone with the real prompt templates from prompts.py and a FAKE
``perform_completion_with_backoff`` that captures the assembled prompt and
returns a canned schema, then freezes the reference's structural decisions
per fixture to tests/goldens/schema_gen.jsonl:

- which of the four reminder branches fires for each (query, example) combo;
- CSS vs XPATH builder-template selection;
- verbatim embedding + relative ordering of html / query / example sections;
- ``json_response=True`` forcing;
- the parsed schema returned for a canned completion;
- AttributeError on the deprecated provider/api_token parameters.

tests/test_llm_strategies.py replays our own-worded implementation against
these decisions with no reference imports (the E9/E15 golden posture:
structure is pinned, wording is ours).
"""

from __future__ import annotations

import ast
import json
import pathlib

REF = pathlib.Path("/root/reference/crawl4ai")
OUT = pathlib.Path(__file__).resolve().parent.parent / "tests" / "goldens"

FIXTURES = [
    {"name": "plain_css", "schema_type": "CSS", "query": None, "example": None},
    {"name": "plain_xpath", "schema_type": "XPATH", "query": None, "example": None},
    {"name": "query_only", "schema_type": "CSS",
     "query": "product name, price and rating for every product card",
     "example": None},
    {"name": "example_only", "schema_type": "CSS", "query": None,
     "example": json.dumps({"title": "Widget", "price": "$9.99"})},
    {"name": "both", "schema_type": "CSS",
     "query": "every job posting with company and location",
     "example": json.dumps({"title": "Engineer", "company": "ACME",
                            "location": "Remote"})},
    {"name": "xpath_query", "schema_type": "XPATH",
     "query": "article headlines with their links", "example": None},
]

HTML = ('<div class="grid"><div class="card"><h2 class="t">A</h2>'
        '<span class="p">$1</span></div><div class="card">'
        '<h2 class="t">B</h2><span class="p">$2</span></div></div>')

CANNED_SCHEMA = {
    "name": "cards",
    "baseSelector": "div.card",
    "fields": [
        {"name": "title", "selector": "h2.t", "type": "text"},
        {"name": "price", "selector": "span.p", "type": "text"},
    ],
}


def load_prompts() -> dict:
    """prompts.py is import-free constant strings — exec it standalone."""
    ns: dict = {}
    exec(compile((REF / "prompts.py").read_text(), "prompts.py", "exec"), ns)
    return ns


def extract_generate_schema(prompts_ns: dict):
    tree = ast.parse((REF / "extraction_strategy.py").read_text())
    fn = None
    for node in ast.walk(tree):
        if isinstance(node, ast.ClassDef) and node.name == "JsonElementExtractionStrategy":
            for item in node.body:
                if isinstance(item, ast.FunctionDef) and item.name == "generate_schema":
                    fn = item
    assert fn is not None, "generate_schema not found"
    fn.decorator_list = []  # drop @staticmethod
    # drop the function-local relative imports; their names are provided
    # via the exec namespace instead (relative imports need a package)
    fn.body = [s for s in fn.body
               if not (isinstance(s, ast.ImportFrom) and s.level)]
    captured: dict = {}

    def fake_completion(provider=None, prompt_with_variables=None,
                        json_response=None, api_token=None, base_url=None,
                        extra_args=None, **kw):
        captured["prompt"] = prompt_with_variables
        captured["json_response"] = json_response

        class R:  # litellm response shape
            class _C:
                class _M:
                    content = json.dumps(CANNED_SCHEMA)
                message = _M()
            choices = [_C()]
        return R()

    class FakeLLMConfig:
        provider = "fake/model"
        api_token = "tok"
        base_url = None

    ns = {
        "json": json,
        "JSON_SCHEMA_BUILDER": prompts_ns["JSON_SCHEMA_BUILDER"],
        "JSON_SCHEMA_BUILDER_XPATH": prompts_ns["JSON_SCHEMA_BUILDER_XPATH"],
        "perform_completion_with_backoff": fake_completion,
        "create_llm_config": lambda *a, **k: FakeLLMConfig(),
        "LLMConfig": FakeLLMConfig,
        "JsonElementExtractionStrategy": type(
            "JsonElementExtractionStrategy", (), {
                "_GENERATE_SCHEMA_UNWANTED_PROPS": {
                    "provider": 'Instead, use llm_config=LLMConfig(provider="...")',
                    "api_token": 'Instead, use llm_config=LlMConfig(api_token="...")',
                }}),
    }
    mod = ast.Module(body=[fn], type_ignores=[])
    ast.fix_missing_locations(mod)
    exec(compile(mod, "generate_schema", "exec"), ns)
    return ns["generate_schema"], captured, prompts_ns


def classify_branch(prompt: str) -> str:
    """Identify the reminder branch by the reference's distinctive wording."""
    if "not providing a rigid example" in prompt:
        return "query_only"
    if "provided a proper example" in prompt:
        return "example_only"
    if "neither have a query nor an example" in prompt:
        return "neither"
    return "both"


def main() -> None:
    prompts_ns = load_prompts()
    gen, captured, _ = extract_generate_schema(prompts_ns)
    css_t = prompts_ns["JSON_SCHEMA_BUILDER"]
    xpath_t = prompts_ns["JSON_SCHEMA_BUILDER_XPATH"]

    records = []
    for fx in FIXTURES:
        captured.clear()
        result = gen(HTML, schema_type=fx["schema_type"], query=fx["query"],
                     target_json_example=fx["example"])
        p = captured["prompt"]
        rec = {
            "fixture": fx["name"],
            "inputs": {"html": HTML, "schema_type": fx["schema_type"],
                       "query": fx["query"], "example": fx["example"]},
            "branch": classify_branch(p),
            "template_kind": ("CSS" if css_t in p
                              else "XPATH" if xpath_t in p else "NONE"),
            "json_response": captured["json_response"],
            "contains_html": HTML in p,
            "contains_query": (fx["query"] in p) if fx["query"] else None,
            "contains_example": (fx["example"] in p) if fx["example"] else None,
            "html_before_query": (p.find(HTML) < p.find(fx["query"])
                                  if fx["query"] else None),
            "query_before_example": (p.find(fx["query"]) < p.find(fx["example"])
                                     if fx["query"] and fx["example"] else None),
            "returned_schema": result,
        }
        records.append(rec)

    # the deprecated-parameter guard
    for bad_kw in ("provider", "api_token"):
        try:
            gen(HTML, **{bad_kw: "x"})
            raised = None
        except AttributeError as e:
            raised = str(e)
        records.append({"fixture": f"deprecated_{bad_kw}",
                        "raises": "AttributeError", "message": raised})

    out = OUT / "schema_gen.jsonl"
    out.write_text("\n".join(json.dumps(r, sort_keys=True) for r in records) + "\n")
    print(f"wrote {len(records)} records to {out}")


if __name__ == "__main__":
    main()
