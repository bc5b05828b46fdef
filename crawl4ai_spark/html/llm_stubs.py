"""Interface stubs for the reference's model-backed strategies (E9/E14/E15).

These need a network LLM endpoint or an embedding model — neither exists in
this container, and shipping a fake would misrepresent results. The classes
define the exact surface a deployment would implement; every method raises
``NotImplementedError`` with the integration point spelled out.

Parity targets:
- LLMContentFilter      /root/reference/crawl4ai/content_filter_strategy.py:780-1063
- LLMExtractionStrategy /root/reference/crawl4ai/extraction_strategy.py:493-974
- CosineStrategy        /root/reference/crawl4ai/extraction_strategy.py:135-492
"""

from __future__ import annotations

_MSG = (
    "{name} needs {dep}; none is available in this environment. "
    "Wire it by implementing {hook} — the Spark plumbing (Arrow batching via "
    "crawl4ai_spark.functions.udfs.process_pages, chunking via "
    "crawl4ai_spark.html.chunking) is already in place."
)


class LLMContentFilter:
    """E9: chunk html → prompt an LLM per chunk → filtered markdown."""

    def __init__(self, instruction: str | None = None, **_: object):
        self.instruction = instruction

    def filter_content(self, html: str) -> list[str]:
        raise NotImplementedError(_MSG.format(
            name="LLMContentFilter", dep="an LLM endpoint",
            hook="filter_content(html) -> list[str] over chunk_documents() output"))


class LLMExtractionStrategy:
    """E15: schema/instruction-driven extraction through an LLM."""

    def __init__(self, schema: dict | None = None, instruction: str | None = None,
                 **_: object):
        self.schema = schema
        self.instruction = instruction

    def run(self, url: str, sections: list[str]) -> list[dict]:
        raise NotImplementedError(_MSG.format(
            name="LLMExtractionStrategy", dep="an LLM endpoint",
            hook="run(url, sections) -> list[dict] (JSON per merged chunk)"))


class CosineStrategy:
    """E14: embedding + hierarchical clustering extraction.

    Note: the *retrieval* side of this capability IS implemented Spark-side
    over precomputed embeddings (crawl4ai_spark.ops.similarity: cosine top-k,
    LSH, IVF); only the embedding-model inference is stubbed."""

    def __init__(self, semantic_filter: str | None = None, **_: object):
        self.semantic_filter = semantic_filter

    def run(self, url: str, sections: list[str]) -> list[dict]:
        raise NotImplementedError(_MSG.format(
            name="CosineStrategy", dep="a sentence-embedding model",
            hook="run(url, sections) using ops.similarity over the embedded chunks"))
