"""vocab_growth (ops/textstats.py) vs a from-spec reimplementation, plus
the Heaps'-law property itself: trigram vocabulary grows strictly but
SUB-linearly in token volume (β < 1) across every adjacent prefix pair.
The exact DuckDB oracle runs in test_ops_parity."""

import re

import pyarrow.parquet as pq

from crawl4ai_spark.ops.textstats import VOCAB_GROWTH_DIVS, q_vocab_growth

SF = "/root/testdata/sf0.001"


def _naive():
    df = pq.read_table(f"{SF}/documents.parquet").to_pandas()
    n = len(df)
    assert sorted(df["doc_id"]) == list(range(n)), \
        "contiguous doc_id 0..N-1 is the prefix contract"
    tok_re = re.compile(r"[a-z0-9]+")
    rows = {}
    for i, m in enumerate(VOCAB_GROWTH_DIVS):
        cut = n // m
        uni, tri, tokens = set(), set(), 0
        for _, r in df[df["doc_id"] < cut].iterrows():
            ts = tok_re.findall(r["text"].lower())
            tokens += len(ts)
            uni.update(ts)
            tri.update(" ".join(ts[j:j + 3]) for j in range(len(ts) - 2))
        rows[i + 1] = (cut, len(uni), len(tri), tokens)
    return rows


def test_vocab_growth_matches_independent_impl(spark):
    want = _naive()
    got = {r.prefix_no: (r.n_docs_prefix, r.vocab, r.vocab_tri, r.tokens)
           for r in q_vocab_growth(spark, SF).collect()}
    assert got == want


def test_vocab_growth_heaps_law(spark):
    rows = sorted(q_vocab_growth(spark, SF).collect(),
                  key=lambda r: r.prefix_no)
    for a, b in zip(rows, rows[1:]):
        # strictly growing trigram vocabulary...
        assert b.vocab_tri > a.vocab_tri
        # ...but slower than token volume (the Heaps exponent < 1)
        assert b.vocab_tri * a.tokens < a.vocab_tri * b.tokens
    # the unigram vocabulary saturates on this corpus — the datum itself
    assert rows[0].vocab == rows[-1].vocab
