"""Vocabulary build + tokenization to ids (ops/textstats.py q_vocab_build /
q_tokenize_ids): top-V tokens by (count desc, token asc) get dense ids from
1; every corpus token position encodes through a broadcast vocab join with
OOV falling to 0. From-spec python reimplementation guard."""

import re
from collections import Counter

import pyarrow.parquet as pq

from crawl4ai_spark.ops.textstats import (
    VOCAB_V,
    q_tokenize_ids,
    q_vocab_build,
)

SF = "/root/testdata/sf0.001"


def _toks(text):
    return re.findall(r"[a-z0-9]+", text.lower())


def _vocab(df):
    c = Counter()
    for text in df["text"]:
        c.update(_toks(text))
    ranked = sorted(c.items(), key=lambda kv: (-kv[1], kv[0]))[:VOCAB_V]
    return {tok: (i + 1, n) for i, (tok, n) in enumerate(ranked)}


def test_vocab_build_matches_from_spec(spark):
    df = pq.read_table(f"{SF}/documents.parquet").to_pandas()
    want = {(tid, tok, n) for tok, (tid, n) in _vocab(df).items()}
    got = {(r.token_id, r.token, r.n)
           for r in q_vocab_build(spark, SF).collect()}
    assert got == want
    assert len(got) == VOCAB_V


def test_tokenize_ids_matches_from_spec(spark):
    df = pq.read_table(f"{SF}/documents.parquet").to_pandas()
    vocab = _vocab(df)
    want = set()
    for doc_id, text in zip(df["doc_id"], df["text"]):
        for pos, tok in enumerate(_toks(text)):
            want.add((doc_id, pos, vocab.get(tok, (0,))[0]))
    got = {(r.doc_id, r.pos, r.token_id)
           for r in q_tokenize_ids(spark, SF).collect()}
    assert got == want
    # the OOV path must be real on this corpus
    assert any(tid == 0 for _, _, tid in want)
