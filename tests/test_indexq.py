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


# ------------------------------------------------------------ Elias-Fano
def _ef_bits(docs: list, u: int) -> int:
    """From-spec EF size (Vigna 2013): l = floor(log2(U/n)) low bits per
    element + unary upper vector of n ones and (U >> l) zeros."""
    n = len(docs)
    l = (u // n).bit_length() - 1
    return n * l + n + (u >> l)


def _gamma_bits(g: int) -> int:
    return 2 * (g.bit_length() - 1) + 1


def _delta_bits(g: int) -> int:
    lg = g.bit_length() - 1
    return lg + 2 * ((lg + 1).bit_length() - 1) + 1


def test_ef_size_naive_parity(spark):
    from crawl4ai_spark.ops.indexq import q_index_ef_size
    postings: dict = {}
    for doc_id, toks in _docs().items():
        for t in set(toks):
            postings.setdefault(t, set()).add(doc_id)
    u = max(max(s) for s in postings.values()) + 1
    by_df = sorted(postings, key=lambda t: (-len(postings[t]), t))[:TOP_TERMS]
    want = {}
    for t in by_df:
        docs = sorted(postings[t])
        gaps = [docs[0] + 1] + [b - a for a, b in zip(docs, docs[1:])]
        want[t] = (len(docs), _ef_bits(docs, u),
                   sum(map(_gamma_bits, gaps)), sum(map(_delta_bits, gaps)),
                   sum(8 * _vbyte(g) for g in gaps))
    got = {r["tok"]: (r["df"], r["ef_bits"], r["gamma_bits"],
                      r["delta_bits"], r["vbyte_bits"])
           for r in q_index_ef_size(spark, SF).collect()}
    assert got == want
    # EF must beat vbyte on every dense list (gaps ~ U/df, the EF sweet
    # spot), and stay within the quasi-succinct bound n*(2+ceil(log2 U/n))
    import math
    for t, (df, ef, _g, _d, vb) in want.items():
        if df >= 300:
            assert ef < vb
        assert ef <= df * (2 + math.ceil(math.log2(u / df)))


# --------------------------------------------------- block-max pruned top-k
def test_blockmax_topk_equals_bruteforce(spark):
    """The pruned plan's contract: exactly the brute-force top-K
    (score DESC, doc_id ASC) — any unsafe skip changes the result set."""
    from crawl4ai_spark.ops.indexq import (
        QUERY_TERMS, TOPK, q_index_blockmax_topk, _query_postings,
    )
    import pandas as pd
    post = _query_postings(spark, SF).toPandas()
    brute = (post.groupby("doc_id")["tfn_e6"].sum().reset_index()
             .rename(columns={"tfn_e6": "score_e6"})
             .sort_values(["score_e6", "doc_id"],
                          ascending=[False, True]).head(TOPK))
    want = list(map(tuple, brute[["doc_id", "score_e6"]].itertuples(index=False)))
    got = [(r["doc_id"], r["score_e6"])
           for r in q_index_blockmax_topk(spark, SF).collect()]
    assert got == [(int(d), int(s)) for d, s in want]
    assert len(got) == TOPK


def test_blockmax_pruning_drops_docs_on_skewed_corpus():
    """Pruning effectiveness, provable only on a skewed postings set (the
    sf corpus' 31-token vocabulary makes every doc a candidate): with one
    rare high-scoring term and a long tail of low-tf docs, the θ/ceiling
    filter must discard most documents while returning the exact top-K.
    Pure-python mirror of the plan's three phases over synthetic postings."""
    BLOCK, K = 64, 10
    # synthetic: 2000 docs score 1 on a common term; docs 0..19 also score
    # 1000 on a rare term -> top-K is exactly the rare docs.
    postings = {"common": {d: 1 for d in range(2000)},
                "rare": {d: 1000 for d in range(20)}}
    # phase ceilings
    blocks = {}
    for t, pl in postings.items():
        docs = sorted(pl)
        for i, d in enumerate(docs):
            blocks.setdefault((t, i // BLOCK), []).append((d, pl[d]))
    bmax = {k: max(s for _, s in v) for k, v in blocks.items()}
    # θ: exact scores of each term's best block
    score = {}
    for pl in postings.values():
        for d, s in pl.items():
            score[d] = score.get(d, 0) + s
    seed = set()
    for t in postings:
        bb = max((b for (tt, b) in bmax if tt == t),
                 key=lambda b: (bmax[(t, b)], -b))
        seed |= {d for d, _ in blocks[(t, bb)]}
    theta = sorted((score[d] for d in seed), reverse=True)[K - 1] \
        if len(seed) >= K else 0
    # ub per doc from block ceilings; survivors
    ub = {}
    for (t, b), docs in blocks.items():
        for d, _ in docs:
            ub[d] = ub.get(d, 0) + bmax[(t, b)]
    survivors = {d for d, u in ub.items() if u >= theta} | seed
    got = sorted(survivors, key=lambda d: (-score[d], d))[:K]
    brute = sorted(score, key=lambda d: (-score[d], d))[:K]
    assert got == brute
    # the point: pruning collapsed the candidate set
    assert len(survivors) < 0.1 * len(score)
