"""DSIR importance resampling (Xie et al. 2023): from-spec pure-python
reimplementation parity + the semantic property the operator exists for —
target-language-like documents outrank the rest."""

import hashlib
import math
import re

import duckdb

from crawl4ai_spark.ops.pipelineq import (
    DSIR_B,
    DSIR_CAP,
    DSIR_KEEP_DIV,
    _DSIR_OFF,
    q_dsir_resample,
)

SF = "/root/testdata/sf0.001"


def _spec_dsir(docs):
    """Independent reimplementation straight from the operator contract."""
    lnt = [round(math.log(c + 1) * 1e6) for c in range(DSIR_CAP + 1)]

    def bucket(gram):
        return int(hashlib.md5(gram.encode()).hexdigest()[:6], 16) % DSIR_B

    per_doc = {}
    cnt_t = [0] * DSIR_B
    cnt_r = [0] * DSIR_B
    for doc_id, lang, text in docs:
        toks = re.findall("[a-z0-9]+", text.lower())
        if len(toks) < 2:
            continue
        grams = toks + [f"{a} {b}" for a, b in zip(toks, toks[1:])]
        bs = [bucket(g) for g in grams]
        per_doc[doc_id] = (lang, bs)
        for b in bs:
            cnt_r[b] += 1
            if lang == "en":
                cnt_t[b] += 1
    max_t = max(max(cnt_t), 1)
    max_r = max(max(cnt_r), 1)
    # buckets absent from raw have no table row; by construction every
    # gram's bucket is in raw, so the join below always hits
    r = [lnt[cnt_t[b] * DSIR_CAP // max_t] - lnt[cnt_r[b] * DSIR_CAP // max_r]
         for b in range(DSIR_B)]
    rows = {}
    for doc_id, (lang, bs) in per_doc.items():
        score = sum(r[b] for b in bs)
        n = len(bs)
        avg = (score + n * _DSIR_OFF) // n - _DSIR_OFF
        rows[doc_id] = (lang, n, score, avg)
    order = sorted(rows, key=lambda d: (-rows[d][3], d))
    k = (len(order) + DSIR_KEEP_DIV - 1) // DSIR_KEEP_DIV
    kept = set(order[:k])
    return {d: rows[d] + (d in kept,) for d in rows}


def test_dsir_matches_from_spec_reimplementation(spark):
    docs = duckdb.connect().execute(
        f"SELECT doc_id, lang, text FROM "
        f"read_parquet('{SF}/documents.parquet')").fetchall()
    exp = _spec_dsir(docs)
    got = {r.doc_id: (r.lang, r.n_grams, r.score_e6, r.avg_e6, r.keep)
           for r in q_dsir_resample(spark, SF).collect()}
    assert got == exp


def test_dsir_selects_target_like_docs(spark):
    rows = q_dsir_resample(spark, SF).collect()
    en = [r.avg_e6 for r in rows if r.lang == "en"]
    other = [r.avg_e6 for r in rows if r.lang != "en"]
    assert en and other
    # the whole point: target-language docs outrank the raw pool
    assert sum(en) / len(en) > sum(other) / len(other)
    kept = [r for r in rows if r.keep]
    assert len(kept) == (len(rows) + DSIR_KEEP_DIV - 1) // DSIR_KEEP_DIV
    en_share_corpus = len(en) / len(rows)
    en_share_kept = sum(1 for r in kept if r.lang == "en") / len(kept)
    assert en_share_kept > en_share_corpus
