"""text_tfidf_topk (ops/textstats.py) vs an independent from-spec
reimplementation in pure python/pandas — per-doc top-k keywords with the
quantized-idf integer scheme. The exact DuckDB oracle runs in
test_ops_parity; this guards against mirrored-into-both-engines errors."""

import math
import re
from collections import Counter, defaultdict

import pyarrow.parquet as pq

from crawl4ai_spark.ops.textstats import (
    TFIDF_CAP,
    TFIDF_TOPK,
    q_text_tfidf_topk,
)

SF = "/root/testdata/sf0.001"


def _naive():
    docs = pq.read_table(f"{SF}/documents.parquet").to_pandas()
    tf = {}
    df = defaultdict(int)
    for doc_id, text in zip(docs["doc_id"], docs["text"]):
        c = Counter(re.findall(r"[a-z0-9]+", str(text).lower()))
        if not c:
            continue
        tf[doc_id] = c
        for tok in c:
            df[tok] += 1
    n = len(tf)
    idf = {q: round(-math.log((2 * q + 1) / (2.0 * (TFIDF_CAP + 1))) * 1e6)
           for q in range(TFIDF_CAP + 1)}
    out = {}
    for doc_id, c in tf.items():
        scored = sorted(
            ((t, cnt, df[t], cnt * idf[df[t] * TFIDF_CAP // n])
             for t, cnt in c.items()),
            key=lambda r: (-r[3], r[0]))
        out[doc_id] = [(t, cnt, d, s) for t, cnt, d, s in
                       scored[:TFIDF_TOPK]]
    return out


def test_tfidf_matches_independent_impl(spark):
    want = _naive()
    got = defaultdict(list)
    for r in (q_text_tfidf_topk(spark, SF)
              .orderBy("doc_id", "rk").collect()):
        got[r.doc_id].append((r.tok, r.tf, r.df, r.score_e6))
    assert dict(got) == want
    # the keywords are discriminative: rank-1 tokens are not the same
    # stopword everywhere
    top1 = {rows[0][0] for rows in got.values()}
    assert len(top1) > 1
