"""Generate chunking-parity goldens from the reference's own chunkers.

Run:  python scripts/gen_chunk_goldens.py

AST-extracts RegexChunking / FixedLengthWordChunking / SlidingWindowChunking
/ OverlappingWindowChunking from the reference chunking_strategy.py (skipping
its nltk import) plus chunk_documents / merge_chunks from utils.py, runs them
over a varied corpus × parameter grid, and freezes the outputs to
tests/goldens/chunking.jsonl. tests/test_chunk_parity_golden.py compares our
pure functions against them with no reference imports.
"""

from __future__ import annotations

import ast
import json
import pathlib
import re
from array import array
from collections import deque
from itertools import chain

REF = pathlib.Path("/root/reference/crawl4ai")
OUT = pathlib.Path(__file__).resolve().parent.parent / "tests" / "goldens"


def extract(path: pathlib.Path, names: set[str], ns: dict) -> dict:
    tree = ast.parse(path.read_text())
    keep = [n for n in tree.body
            if isinstance(n, (ast.FunctionDef, ast.ClassDef)) and n.name in names]
    assert {n.name for n in keep} == names, names
    out = dict(ns)
    exec(compile(ast.Module(body=keep, type_ignores=[]), str(path), "exec"), out)
    return out


TEXTS = {
    "plain": " ".join(f"w{i}" for i in range(37)),
    "irregular_ws": "a  b\t\tc\n d   e f  g h i j k l m",
    "short": "just three words",
    "single": "one",
    "empty": "",
    "paras": "para one text\n\npara two longer text here\n\n\n\nlast para",
    "long": " ".join(f"tok{i % 7}x{i}" for i in range(240)),
}

PARAMS = {
    "fixed": [4, 10, 100],
    "sliding": [(4, 2), (10, 5), (100, 50)],
    "overlap": [(6, 2), (10, 3), (1000, 100)],
    "merge": [(8, 0, 1.0), (10, 2, 1.0), (20, 4, 0.75)],
    "chunkdoc": [(8, 2, 0.75), (16, 4, 0.75), (30, 0, 1.0)],
}


def main() -> None:
    class _ABC:  # stand-in ABC machinery so the extracted classes exec
        pass

    def _abstractmethod(f):
        return f

    cns = extract(
        REF / "chunking_strategy.py",
        {"ChunkingStrategy", "RegexChunking", "FixedLengthWordChunking",
         "SlidingWindowChunking", "OverlappingWindowChunking"},
        {"ABC": _ABC, "abstractmethod": _abstractmethod, "re": re},
    )
    uns = extract(
        REF / "utils.py",
        {"chunk_documents", "merge_chunks"},
        {"deque": deque, "chain": chain, "array": array,
         "Iterable": list, "Optional": object, "Callable": object,
         "List": list, "Generator": object, "Sequence": list},
    )

    rows = []
    for tname, text in TEXTS.items():
        rows.append({"kind": "regex", "text": tname, "params": None,
                     "out": cns["RegexChunking"]().chunk(text)})
        for cs in PARAMS["fixed"]:
            rows.append({"kind": "fixed", "text": tname, "params": [cs],
                         "out": cns["FixedLengthWordChunking"](cs).chunk(text)})
        for w, st in PARAMS["sliding"]:
            rows.append({"kind": "sliding", "text": tname, "params": [w, st],
                         "out": cns["SlidingWindowChunking"](w, st).chunk(text)})
        for w, ov in PARAMS["overlap"]:
            rows.append({"kind": "overlap", "text": tname, "params": [w, ov],
                         "out": cns["OverlappingWindowChunking"](w, ov).chunk(text)})

    doc_sets = {
        "three": ["a b c", "d e f", "g h i"],
        "mixed": [TEXTS["plain"], "", TEXTS["short"], TEXTS["irregular_ws"]],
        "long": [TEXTS["long"], TEXTS["paras"]],
    }
    for dname, docs in doc_sets.items():
        for tgt, ov, ratio in PARAMS["merge"]:
            rows.append({"kind": "merge", "text": dname, "params": [tgt, ov, ratio],
                         "out": uns["merge_chunks"](docs, tgt, ov, ratio)})
        for thr, ov, rate in PARAMS["chunkdoc"]:
            rows.append({"kind": "chunkdoc", "text": dname, "params": [thr, ov, rate],
                         "out": list(uns["chunk_documents"](docs, thr, ov, rate))})

    with open(OUT / "chunking.jsonl", "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")
    print(f"wrote {len(rows)} chunking goldens")


if __name__ == "__main__":
    main()
