"""What remains genuinely model-bound in the LLM/embedding strategies.

Round-3 status: E9 (``LLMContentFilter``) and E15 (``LLMExtractionStrategy``)
are now IMPLEMENTED in :mod:`crawl4ai_spark.html.llm_strategies` — chunking,
prompt assembly, response-parsing ladder, usage accounting are all real and
golden-pinned; only the completion *provider* is injectable because no LLM
endpoint exists in this container. They are re-exported here so older
imports keep working; calling them without a provider raises with the
wiring instructions. E14's clustering pipeline is implemented in
:mod:`crawl4ai_spark.html.cosine_extract` (deterministic feature-hash
embedder by default); the class below stubs only the sentence-transformer
inference path.

Parity targets:
- LLMContentFilter      /root/reference/crawl4ai/content_filter_strategy.py:780-1063
- LLMExtractionStrategy /root/reference/crawl4ai/extraction_strategy.py:493-974
- CosineStrategy        /root/reference/crawl4ai/extraction_strategy.py:135-492
"""

from __future__ import annotations

from crawl4ai_spark.html.llm_strategies import (  # noqa: F401
    LLMContentFilter,
    LLMExtractionStrategy,
)

_MSG = (
    "{name} needs {dep}; none is available in this environment. "
    "Wire it by implementing {hook} — the Spark plumbing (Arrow batching via "
    "crawl4ai_spark.functions.udfs.process_pages, chunking via "
    "crawl4ai_spark.html.chunking) is already in place."
)


class CosineStrategy:
    """E14 model-inference stub: the clustering/extraction pipeline is
    implemented (html/cosine_extract.CosineClusterExtraction over a
    deterministic feature-hash embedder; distributed forms in
    ops/clusterq.py) — THIS class is the slot for a real sentence-embedding
    model, which does not exist in this container."""

    def __init__(self, semantic_filter: str | None = None, **_: object):
        self.semantic_filter = semantic_filter

    def run(self, url: str, sections: list[str]) -> list[dict]:
        raise NotImplementedError(_MSG.format(
            name="CosineStrategy", dep="a sentence-embedding model",
            hook="run(url, sections) via cosine_extract.CosineClusterExtraction"
                 "(embedder=<model>)"))
