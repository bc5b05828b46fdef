"""Search-index operators (ops/indexq.py) vs naive from-spec python
reimplementations at sf0.001. DuckDB parity runs in test_ops_parity;
these pin the semantics (positional intersection, d-gap varint cost)
independently of both engines."""

import re

import pyarrow.parquet as pq

from crawl4ai_spark.ops.indexq import (
    PHRASE,
    TOP_TERMS,
    q_index_phrase_match,
    q_index_postings_size,
)

SF = "/root/testdata/sf0.001"


def _docs():
    df = pq.read_table(f"{SF}/documents.parquet").to_pandas()
    return {int(d): re.findall(r"[a-z0-9]+", t.lower())
            for d, t in zip(df["doc_id"], df["text"])}


def _naive_phrase():
    out = {}
    k = len(PHRASE)
    for doc_id, toks in _docs().items():
        hits = [i for i in range(len(toks) - k + 1)
                if toks[i:i + k] == PHRASE]
        if hits:
            out[doc_id] = (len(hits), min(hits), max(hits))
    return out

def test_phrase_match_naive_parity(spark):
    got = {r["doc_id"]: (r["n_matches"], r["first_pos"], r["last_pos"])
           for r in q_index_phrase_match(spark, SF).collect()}
    want = _naive_phrase()
    assert got == want
    assert len(got) > 0  # the phrase must occur: a 0-row pass is vacuous


def _vbyte(gap: int) -> int:
    return 1 + (gap.bit_length() - 1) // 7


def test_postings_size_naive_parity(spark):
    postings: dict = {}
    for doc_id, toks in _docs().items():
        for t in set(toks):
            postings.setdefault(t, set()).add(doc_id)
    by_df = sorted(postings, key=lambda t: (-len(postings[t]), t))[:TOP_TERMS]
    want = {}
    for t in by_df:
        docs = sorted(postings[t])
        gaps = [docs[0] + 1] + [b - a for a, b in zip(docs, docs[1:])]
        want[t] = (len(docs), sum(map(_vbyte, gaps)), 8 * len(docs))
    got = {r["tok"]: (r["df"], r["vbyte_bytes"], r["fixed_bytes"])
           for r in q_index_postings_size(spark, SF).collect()}
    assert got == want
    # compression must actually win on dense postings (df near n_docs)
    dense = [t for t in want if want[t][0] >= 300]
    assert dense and all(want[t][1] < want[t][2] for t in dense)
