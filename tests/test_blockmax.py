"""Block-max postings metadata (ops/indexq.py q_index_blockmax) —
from-spec tf-normalization parity and the WAND skipping invariant the
structure exists to provide."""

import math
import re
from collections import defaultdict

from crawl4ai_spark.ops.indexq import BLOCK, q_index_blockmax

SF = "/root/testdata/sf0.001"


def _spec_index(spark):
    from crawl4ai_spark.ops.common import tbl

    docs = {r.doc_id: re.findall(r"[a-z0-9]+", r.text.lower())
            for r in tbl(spark, SF, "documents")
            .select("doc_id", "text").collect()}
    t_tot = sum(len(v) for v in docs.values())
    n_docs = len(docs)
    tfn = defaultdict(dict)   # tok -> doc -> tfn_e6
    for doc_id, toks in docs.items():
        tf = defaultdict(int)
        for t in toks:
            tf[t] += 1
        dl = len(toks)
        for t, f in tf.items():
            tfn[t][doc_id] = (44 * f * t_tot * 1_000_000) // (
                20 * f * t_tot + 6 * t_tot + 18 * dl * n_docs)
    return docs, tfn


def test_blocks_match_from_spec(spark):
    docs, tfn = _spec_index(spark)
    got = defaultdict(dict)
    for r in q_index_blockmax(spark, SF).collect():
        got[r.tok][r.blk] = r
    assert set(got) == set(tfn)
    for tok, per_doc in tfn.items():
        posting_docs = sorted(per_doc)
        want_blocks = defaultdict(list)
        for i, d in enumerate(posting_docs):
            want_blocks[i // BLOCK].append(d)
        assert set(got[tok]) == set(want_blocks)
        term_max = max(per_doc.values())
        for blk, members in want_blocks.items():
            r = got[tok][blk]
            assert r.block_max_tfn_e6 == max(per_doc[d] for d in members)
            assert r.n_postings == len(members)
            assert (r.doc_lo, r.doc_hi) == (members[0], members[-1])
            assert r.term_max_tfn_e6 == term_max


def test_blocks_tile_postings_without_overlap(spark):
    rows = q_index_blockmax(spark, SF).collect()
    by_tok = defaultdict(list)
    for r in rows:
        by_tok[r.tok].append(r)
    for tok, blocks in by_tok.items():
        blocks.sort(key=lambda r: r.blk)
        assert [r.blk for r in blocks] == list(range(len(blocks)))
        assert all(r.n_postings <= BLOCK for r in blocks)
        assert all(r.n_postings == BLOCK for r in blocks[:-1])
        for a, b in zip(blocks, blocks[1:]):
            assert a.doc_hi < b.doc_lo   # doc ranges ordered, disjoint


def test_wand_skipping_invariant(spark):
    """The property BMW relies on: any document's true query score is
    bounded by the sum, over query terms, of idf_t x (the block ceiling
    of the block containing the doc) — so a block set whose ceiling sum
    is below the running threshold can be skipped without losing a
    top-k result."""
    docs, tfn = _spec_index(spark)
    n_docs = len(docs)
    query = ["spark", "join"]
    idf = {t: math.log(1 + (n_docs - len(tfn[t]) + 0.5)
                       / (len(tfn[t]) + 0.5)) for t in query}

    block_of = {}
    ceiling = {}
    for r in q_index_blockmax(spark, SF).collect():
        if r.tok in query:
            ceiling[(r.tok, r.blk)] = r.block_max_tfn_e6
    for t in query:
        for i, d in enumerate(sorted(tfn[t])):
            block_of[(t, d)] = i // BLOCK

    for d in docs:
        true_score = sum(idf[t] * tfn[t].get(d, 0) / 1e6 for t in query)
        bound = sum(
            idf[t] * ceiling[(t, block_of[(t, d)])] / 1e6
            for t in query if d in tfn[t])
        assert true_score <= bound + 1e-9
