"""Reference-exact parity for link intrinsic scoring (E18).

Goldens in tests/goldens/link_scores.jsonl come from
scripts/gen_link_goldens.py running the reference's extract_page_context +
calculate_link_intrinsic_score (AST-extracted, pure stdlib) over a
link-scenario corpus under several page contexts. Exact float equality —
the checklist is pure additive arithmetic.
"""

import json
import pathlib

from crawl4ai_spark.html.scraper import link_intrinsic_score, page_link_context

GOLD = pathlib.Path(__file__).parent / "goldens" / "link_scores.jsonl"
_LINES = [json.loads(l) for l in GOLD.open()]
CONTEXTS = {k: page_link_context(*v) for k, v in _LINES[0]["contexts"].items()}


def test_link_scores_match_reference():
    for r in _LINES[1:]:
        got = link_intrinsic_score(r["text"], r["url"], r["title"],
                                   r["class"], r["rel"], CONTEXTS[r["context"]])
        assert got == r["score"], r
