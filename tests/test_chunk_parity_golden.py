"""Reference-exact parity for the chunking strategies (E16/E17).

Goldens in tests/goldens/chunking.jsonl were produced by
scripts/gen_chunk_goldens.py running the REFERENCE's own chunker classes
(AST-extracted) over a corpus × parameter grid. Exact list equality —
including the reference's edge behaviors (empty pieces kept by RegexChunking,
short texts returned as the ORIGINAL string by the window chunkers, token
redistribution + overlap hand-off in merge_chunks/chunk_documents).
"""

import json
import pathlib

import pytest

from crawl4ai_spark.html import chunking as C

GOLD = pathlib.Path(__file__).parent / "goldens" / "chunking.jsonl"
ROWS = [json.loads(l) for l in GOLD.open()]

TEXTS = {
    "plain": " ".join(f"w{i}" for i in range(37)),
    "irregular_ws": "a  b\t\tc\n d   e f  g h i j k l m",
    "short": "just three words",
    "single": "one",
    "empty": "",
    "paras": "para one text\n\npara two longer text here\n\n\n\nlast para",
    "long": " ".join(f"tok{i % 7}x{i}" for i in range(240)),
}
DOCS = {
    "three": ["a b c", "d e f", "g h i"],
    "mixed": [TEXTS["plain"], "", TEXTS["short"], TEXTS["irregular_ws"]],
    "long": [TEXTS["long"], TEXTS["paras"]],
}

_FN = {
    "regex": lambda t, p: C.regex_chunk(TEXTS[t]),
    "fixed": lambda t, p: C.fixed_length_word_chunk(TEXTS[t], *p),
    "sliding": lambda t, p: C.sliding_window_chunk(TEXTS[t], *p),
    "overlap": lambda t, p: C.overlapping_window_chunk(TEXTS[t], *p),
    "merge": lambda t, p: C.merge_chunks(DOCS[t], *p),
    "chunkdoc": lambda t, p: C.chunk_documents(DOCS[t], *p),
}


@pytest.mark.parametrize("row", ROWS, ids=[f"{r['kind']}-{r['text']}-{r['params']}" for r in ROWS])
def test_chunker_matches_reference(row):
    got = _FN[row["kind"]](row["text"], row["params"])
    assert got == row["out"]
