"""BM25F field-weighted ranking (ops/ranking.py q_bm25f_rank) —
from-spec scorer parity and the anchor-evidence property the
composition exists for."""

import math
import re
from collections import defaultdict

from crawl4ai_spark.ops.ranking import (
    B_ANCHOR,
    B_BODY,
    K1,
    N_ANCHOR_SPACE,
    QUERY_TERMS,
    W_ANCHOR,
    W_BODY,
    q_bm25f_rank,
)

SF = "/root/testdata/sf0.001"


def _spec_rank(docs: dict):
    n_docs = len(docs)
    toks = {d: re.findall(r"[a-z0-9]+", t.lower()) for d, t in docs.items()}
    dl_b = {d: len(v) for d, v in toks.items()}
    avgdl_b = sum(dl_b.values()) / n_docs
    anchors = defaultdict(list)
    for s, v in toks.items():
        for k in range(3):
            t = (s * 7 + 13 * k + 1) % N_ANCHOR_SPACE
            if t in docs:
                anchors[t].extend(v[:3])
    dl_a = {d: len(v) for d, v in anchors.items()}
    avgdl_a = sum(dl_a.values()) / n_docs

    score = defaultdict(int)
    has_hit = defaultdict(int)
    df = {q: sum(1 for v in toks.values() if q in v) for q in QUERY_TERMS}
    idf = {q: math.log((n_docs - df[q] + 0.5) / (df[q] + 0.5) + 1.0)
           for q in QUERY_TERMS}
    for d in docs:
        for q in QUERY_TERMS:
            tb = toks[d].count(q)
            ta = anchors.get(d, []).count(q)
            if tb == 0 and ta == 0:
                continue
            tft = (W_BODY * tb / (1 + B_BODY * (dl_b.get(d, 0) / avgdl_b - 1))
                   + W_ANCHOR * ta
                   / (1 + B_ANCHOR * (dl_a.get(d, 0) / avgdl_a - 1)))
            score[d] += round(idf[q] * tft / (K1 + tft) * 1e6)
            has_hit[d] = max(has_hit[d], int(ta > 0))
    ranked = sorted(score, key=lambda d: (-score[d], d))[:20]
    return [(d, score[d], has_hit[d], i + 1) for i, d in enumerate(ranked)]


def test_matches_from_spec(spark):
    from crawl4ai_spark.ops.common import tbl

    docs = {r.doc_id: r.text for r in
            tbl(spark, SF, "documents").select("doc_id", "text").collect()}
    want = _spec_rank(docs)
    got = [(r.doc_id, r.score_e6, r.has_anchor_hit, r.rk)
           for r in sorted(q_bm25f_rank(spark, SF).collect(),
                           key=lambda r: r.rk)]
    assert got == want and len(got) == 20


def test_anchor_evidence_moves_the_ranking(spark):
    """The point of BM25F: anchor hits contribute — the top-20 must
    include anchor-supported docs, and at least one doc must outrank a
    doc with a strictly better body-only score thanks to anchors."""
    from crawl4ai_spark.ops.common import tbl
    from crawl4ai_spark.ops.ranking import q_bm25_rank

    f_rows = sorted(q_bm25f_rank(spark, SF).collect(), key=lambda r: r.rk)
    assert any(r.has_anchor_hit for r in f_rows)

    body = {r.doc_id: r.rk for r in q_bm25_rank(spark, SF).collect()}
    field = {r.doc_id: r.rk for r in f_rows}
    both = set(body) & set(field)
    assert both
    # rankings genuinely differ between body-only and field-weighted
    assert any(body[d] != field[d] for d in both) or set(body) != set(field)


def test_saturation_order():
    """Normalize-then-combine-then-saturate: a doc with hits in BOTH
    fields must score LESS than the sum of two single-field docs with
    the same hits (shared saturation), yet more than either alone."""
    idf = 1.0

    def tft(tb, ta, dlb=10, dla=3, avgb=10.0, avga=3.0):
        return (W_BODY * tb / (1 + B_BODY * (dlb / avgb - 1))
                + W_ANCHOR * ta / (1 + B_ANCHOR * (dla / avga - 1)))

    def s(t):
        return idf * t / (K1 + t)

    both = s(tft(3, 2))
    only_b = s(tft(3, 0))
    only_a = s(tft(0, 2))
    assert only_b < both < only_b + only_a
    assert only_a < both
