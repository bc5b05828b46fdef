"""Benchmark decontamination (ops/pipelineq.py q_decontaminate): flag
training docs sharing any word 5-gram with the synthetic held-out eval set
(doc_id % 53 == 0). Guarded by a from-spec python reimplementation so an
error mirrored into both the Spark path and the DuckDB oracle cannot hide.
"""

import re

import pyarrow.parquet as pq

from crawl4ai_spark.ops.pipelineq import (
    DECON_BENCH_MOD,
    DECON_N,
    q_decontaminate,
)

SF = "/root/testdata/sf0.001"


def _grams(text):
    toks = re.findall(r"[a-z0-9]+", text.lower())
    return {" ".join(toks[i:i + DECON_N])
            for i in range(len(toks) - DECON_N + 1)}


def _expected(df):
    bench, corpus = set(), {}
    for doc_id, text in zip(df["doc_id"], df["text"]):
        g = _grams(text)
        if not g:
            continue
        if doc_id % DECON_BENCH_MOD == 0:
            bench |= g
        else:
            corpus[doc_id] = g
    return {(d, len(g), len(g & bench))
            for d, g in corpus.items() if g & bench}


def test_decontaminate_matches_from_spec(spark):
    df = pq.read_table(f"{SF}/documents.parquet").to_pandas()
    want = _expected(df)
    got = {(r.doc_id, r.n_grams, r.n_hits)
           for r in q_decontaminate(spark, SF).collect()}
    assert got == want
    assert want, "synthetic corpus must produce at least one collision"


def test_decontaminate_excludes_bench_docs(spark):
    out = q_decontaminate(spark, SF).toPandas()
    assert (out["doc_id"] % DECON_BENCH_MOD != 0).all()
    assert (out["n_hits"] >= 1).all()
    assert (out["n_hits"] <= out["n_grams"]).all()
