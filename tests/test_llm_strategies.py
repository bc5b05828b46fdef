"""E9/E15 LLM strategies: parsing helpers golden-pinned to the reference's
own code (scripts/gen_llm_goldens.py), strategy pipelines exercised with
deterministic fake providers (no network / no model — the provider is the
injected seam, as multimodal decode is for images)."""

import json
import pathlib

import pytest

from crawl4ai_spark.html.llm_strategies import (
    DEFAULT_FILTER_INSTRUCTION,
    LLMContentFilter,
    LLMExtractionStrategy,
    escape_json_string,
    extract_xml_data,
    sanitize_html,
    sanitize_input_encode,
    split_and_parse_json_objects,
)

GOLDENS = pathlib.Path(__file__).parent / "goldens" / "llm_parsing.jsonl"

_FNS = {
    "split_and_parse_json_objects":
        lambda inp: list(split_and_parse_json_objects(inp)),
    "escape_json_string": escape_json_string,
    "extract_xml_data": lambda inp: extract_xml_data(inp[0], inp[1]),
    "sanitize_html": sanitize_html,
    "sanitize_input_encode": sanitize_input_encode,
}


def test_parsing_helpers_match_reference_goldens():
    rows = [json.loads(l) for l in GOLDENS.read_text().splitlines()]
    assert len(rows) >= 30
    for r in rows:
        got = _FNS[r["fn"]](r["in"])
        assert got == r["out"], (r["fn"], r["in"], got, r["out"])


def test_sanitize_input_encode_drops_lone_surrogate():
    # not JSON-serializable, so asserted directly (see gen_llm_goldens.py)
    assert sanitize_input_encode("bad \udc80 surrogate") == "bad  surrogate"


# ------------------------------------------------------------------- E15

def _blocks_provider(prompt):
    """Deterministic fake: returns two blocks wrapped in <blocks> XML."""
    return ('<blocks>[{"index": 0, "tags": ["t"], "content": ["a"]},'
            ' {"index": 1, "tags": [], "content": ["b"]}]</blocks>',
            {"completion_tokens": 5, "prompt_tokens": 11, "total_tokens": 16})


def test_extract_blocks_xml_path():
    s = LLMExtractionStrategy(_blocks_provider)
    out = s.run("http://u/", ["some section text"])
    assert [b["index"] for b in out] == [0, 1]
    assert all(b["error"] is False for b in out)
    assert s.total_usage.total_tokens == 16
    assert len(s.usages) == 1


def test_extract_force_json_dict_normalization():
    # {"news": [...]} unwraps; a bare object becomes [object]
    s1 = LLMExtractionStrategy(lambda p: '{"news": [{"t": 1}, {"t": 2}]}',
                               force_json_response=True)
    out1 = s1.run("u", ["x"])
    assert [b["t"] for b in out1] == [1, 2]
    s2 = LLMExtractionStrategy(lambda p: '{"article_id": "1234"}',
                               force_json_response=True)
    out2 = s2.run("u", ["x"])
    assert out2 == [{"article_id": "1234", "error": False}]


def test_extract_malformed_salvage_ladder():
    # bad JSON → split_and_parse partial salvage; unparsed tail becomes an
    # error block (reference extraction_strategy.py:700-709)
    s = LLMExtractionStrategy(
        lambda p: '[{"ok": 1}, {"broken": nope}]')
    out = s.run("u", ["x"])
    assert out[0] == {"ok": 1}
    assert out[1]["error"] is True and out[1]["tags"] == ["error"]


def test_extract_provider_exception_becomes_error_block():
    def boom(prompt):
        raise RuntimeError("rate limited")
    out = LLMExtractionStrategy(boom).run("u", ["x"])
    assert out == [{"index": 0, "error": True, "tags": ["error"],
                    "content": "rate limited"}]


def test_prompt_selection_and_substitution():
    seen = []

    def capture(prompt):
        seen.append(prompt)
        return "<blocks>[]</blocks>"

    # block mode, no instruction
    LLMExtractionStrategy(capture).run("http://u/", ["plain text"])
    assert "http://u/" in seen[0] and "plain text" in seen[0]
    # instruction switches template
    LLMExtractionStrategy(capture, instruction="find prices").run("u", ["x"])
    assert "find prices" in seen[1]
    # schema switches again and embeds the schema JSON
    LLMExtractionStrategy(capture, schema={"name": "str"},
                          instruction="i").run("u", ["x"])
    assert '"name"' in seen[2] and "i" in seen[2]
    # html goes through the reference's sanitize→escape pipeline (both
    # helpers golden-pinned above)
    LLMExtractionStrategy(capture).run("u", ['say "hi"'])
    assert escape_json_string(sanitize_html('say "hi"')) in seen[3]


def test_chunk_merge_fans_out_and_accumulates_usage():
    calls = []

    def counting(prompt):
        calls.append(prompt)
        return ('<blocks>[{"i": %d}]</blocks>' % len(calls),
                {"completion_tokens": 1, "prompt_tokens": 2, "total_tokens": 3})

    words = " ".join(f"w{i}" for i in range(400))
    s = LLMExtractionStrategy(counting, chunk_token_threshold=100,
                              word_token_rate=1.0, max_workers=1)
    out = s.run("u", [words])
    assert len(calls) > 1                       # chunked into several calls
    assert len(out) == len(calls)               # one block per chunk, in order
    assert [b["i"] for b in out] == sorted(b["i"] for b in out)
    assert s.total_usage.total_tokens == 3 * len(calls)


def test_no_provider_raises_with_wiring_hint():
    with pytest.raises(NotImplementedError, match="Wire it"):
        LLMExtractionStrategy().run("u", ["x"])
    with pytest.raises(NotImplementedError, match="Wire it"):
        LLMContentFilter().filter_content("<p>x</p>")


# ------------------------------------------------------------------- E9

def test_filter_content_happy_path():
    def md_provider(prompt):
        return "<content># Filtered\n\nclean md</content>"
    f = LLMContentFilter(md_provider, instruction="keep headings")
    out = f.filter_content("<h1>T</h1><p>body</p>")
    assert out == ["# Filtered\n\nclean md"]


def test_filter_content_defaults_and_empty():
    seen = []

    def capture(prompt):
        seen.append(prompt)
        return "<content>x</content>"

    assert LLMContentFilter(capture).filter_content("") == []
    LLMContentFilter(capture).filter_content("<p>a</p>")
    assert DEFAULT_FILTER_INSTRUCTION in seen[0]


def test_filter_content_chunked_order_and_dropped_failures():
    n = {"i": 0}

    def flaky(prompt):
        n["i"] += 1
        if n["i"] == 2:
            raise RuntimeError("boom")          # second chunk fails → dropped
        return f"<content>chunk{n['i']}</content>"

    words = " ".join(f"w{i}" for i in range(300))
    f = LLMContentFilter(flaky, chunk_token_threshold=100,
                         word_token_rate=1.0, max_workers=1)
    out = f.filter_content(words)
    assert len(out) >= 2 and "chunk2" not in out
    # surviving chunks keep input order (reference sorted-futures order)
    assert out == sorted(out, key=lambda s: int(s.removeprefix("chunk")))


# --------------------------------------------------- engine surface (E15)

def test_llm_extraction_through_page_pipeline(spark):
    """llm_extraction config on process_pages runs the strategy over the
    markdown (same path as cosine/extraction-schema) and lands the JSON in
    extracted_content."""
    from crawl4ai_spark.functions.udfs import process_page, process_pages

    def provider(prompt):
        return '<blocks>[{"index": 0, "tags": ["page"], "content": ["ok"]}]</blocks>'

    html = "<html><body><p>alpha beta gamma</p></body></html>"
    cfg = {"provider": provider}
    pure = process_page("http://t.example/", html, llm_extraction=cfg)
    blocks = json.loads(pure["extracted_content"])
    assert blocks == [{"index": 0, "tags": ["page"], "content": ["ok"],
                       "error": False}]

    pages = spark.createDataFrame(
        [("http://t.example/", html.encode())], "url string, html binary")
    row = process_pages(pages, llm_extraction=cfg).collect()[0]
    assert row.extracted_content == pure["extracted_content"]


# ------------------------------------------------ generate_schema (r4)
# structural decisions pinned to reference-run goldens
# (scripts/gen_schema_goldens.py → tests/goldens/schema_gen.jsonl)

import os as _os

_SCHEMA_GOLDENS = [
    json.loads(l) for l in open(_os.path.join(
        _os.path.dirname(__file__), "goldens", "schema_gen.jsonl"))
]


def _our_branch(prompt: str) -> str:
    from crawl4ai_spark.html.llm_strategies import SCHEMA_REMINDER
    for name in ("query_only", "example_only", "neither"):
        if SCHEMA_REMINDER[name] in prompt:
            return name
    return "both"


@pytest.mark.parametrize(
    "rec", [r for r in _SCHEMA_GOLDENS if "inputs" in r],
    ids=[r["fixture"] for r in _SCHEMA_GOLDENS if "inputs" in r])
def test_generate_schema_matches_reference_decisions(rec):
    from crawl4ai_spark.html.llm_strategies import (
        PROMPT_SCHEMA_BUILDER_CSS, PROMPT_SCHEMA_BUILDER_XPATH,
        build_schema_prompt, generate_schema)

    inp = rec["inputs"]
    prompt = build_schema_prompt(inp["html"], schema_type=inp["schema_type"],
                                 query=inp["query"],
                                 target_json_example=inp["example"])
    # same reminder branch as the reference chose for this input combo
    assert _our_branch(prompt) == rec["branch"]
    # same builder-template selection
    tmpl = {"CSS": PROMPT_SCHEMA_BUILDER_CSS,
            "XPATH": PROMPT_SCHEMA_BUILDER_XPATH}[rec["template_kind"]]
    assert tmpl in prompt
    other = (PROMPT_SCHEMA_BUILDER_XPATH if rec["template_kind"] == "CSS"
             else PROMPT_SCHEMA_BUILDER_CSS)
    assert other not in prompt
    # verbatim embedding + section order, exactly as the reference's prompt
    assert rec["contains_html"] and inp["html"] in prompt
    if inp["query"]:
        assert rec["contains_query"] and inp["query"] in prompt
        assert (prompt.find(inp["html"]) < prompt.find(inp["query"])) \
            == rec["html_before_query"]
    if inp["example"]:
        assert rec["contains_example"] and inp["example"] in prompt
    if inp["query"] and inp["example"]:
        assert (prompt.find(inp["query"]) < prompt.find(inp["example"])) \
            == rec["query_before_example"]
    # forced-JSON response contract: provider text is json.loads'd directly
    assert rec["json_response"] is True
    out = generate_schema(inp["html"], schema_type=inp["schema_type"],
                          query=inp["query"],
                          target_json_example=inp["example"],
                          provider=lambda p: json.dumps(rec["returned_schema"]))
    assert out == rec["returned_schema"]


@pytest.mark.parametrize(
    "rec", [r for r in _SCHEMA_GOLDENS if r.get("raises")],
    ids=[r["fixture"] for r in _SCHEMA_GOLDENS if r.get("raises")])
def test_generate_schema_deprecated_params_raise(rec):
    from crawl4ai_spark.html.llm_strategies import generate_schema

    kw = {"deprecated_provider": {"provider": "openai/gpt-4o"},
          "deprecated_api_token": {"api_token": "x"}}[rec["fixture"]]
    with pytest.raises(AttributeError, match="deprecated"):
        generate_schema("<p>x</p>", **kw)


def test_generate_schema_validates_response():
    from crawl4ai_spark.html.llm_strategies import generate_schema

    # non-JSON → ValueError with context
    with pytest.raises(ValueError, match="non-JSON"):
        generate_schema("<p>x</p>", provider=lambda p: "not json")
    # structurally broken schema → every violation named
    bad = {"name": "x", "fields": [
        {"name": "a", "type": "attribute"},           # missing 'attribute'
        {"type": "text"},                             # missing 'name'
        {"name": "n", "type": "nested", "selector": "div",
         "fields": [{"name": "r", "type": "regex"}]},  # missing 'pattern'
        {"name": "u", "type": "wat"},                 # unknown type
    ]}
    with pytest.raises(ValueError) as ei:
        generate_schema("<p>x</p>", provider=lambda p: json.dumps(bad))
    msg = str(ei.value)
    for frag in ("baseSelector", "requires 'attribute'", "missing/empty 'name'",
                 "requires 'pattern'", "unknown type 'wat'"):
        assert frag in msg, (frag, msg)


def test_generate_schema_no_provider_raises_wiring_hint():
    from crawl4ai_spark.html.llm_strategies import generate_schema

    with pytest.raises(RuntimeError, match="completion provider"):
        generate_schema("<p>x</p>")


def test_generated_schema_drives_extraction():
    """The canned schema the goldens return is directly consumable by the
    E10 interpreter — the full hub-pack story: generate → validate →
    extract."""
    from crawl4ai_spark.html.extraction import extract_json_css
    from crawl4ai_spark.html.llm_strategies import generate_schema

    schema_rec = next(r for r in _SCHEMA_GOLDENS if r["fixture"] == "plain_css")
    schema = generate_schema(
        schema_rec["inputs"]["html"],
        provider=lambda p: json.dumps(schema_rec["returned_schema"]))
    rows = extract_json_css(schema_rec["inputs"]["html"], schema)
    assert rows == [{"title": "A", "price": "$1"}, {"title": "B", "price": "$2"}]
