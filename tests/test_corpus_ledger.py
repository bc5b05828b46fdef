"""Corpus-build ledger (ops/pipelineq.py q_corpus_ledger): the composed
pipeline verdict must agree stage-by-stage with the already-oracled
component queries it reuses."""

import pyarrow.parquet as pq

from crawl4ai_spark.ops.pipelineq import (
    DECON_BENCH_MOD,
    q_corpus_ledger,
    q_decontaminate,
    q_gopher_filter,
    q_resample_temperature,
)

SF = "/root/testdata/sf0.001"


def test_ledger_consistent_with_components(spark):
    led = q_corpus_ledger(spark, SF).toPandas().set_index("doc_id")
    docs = pq.read_table(f"{SF}/documents.parquet").to_pandas()
    assert len(led) == len(docs)

    # precedence 1: every eval doc is held out, regardless of later stages
    for doc_id in docs["doc_id"]:
        if doc_id % DECON_BENCH_MOD == 0:
            assert led.loc[doc_id, "reason"] == "eval_holdout"

    g = {r.doc_id: r.keep for r in q_gopher_filter(spark, SF).collect()}
    dec = {r.doc_id for r in q_decontaminate(spark, SF).collect()}
    res = {r.doc_id for r in q_resample_temperature(spark, SF).collect()}
    for doc_id in docs["doc_id"]:
        reason = led.loc[doc_id, "reason"]
        if doc_id % DECON_BENCH_MOD == 0:
            continue
        if not g.get(doc_id, False):
            assert reason == "gopher"
        elif doc_id in dec:
            assert reason == "contaminated"
        elif doc_id not in res:
            assert reason == "resampled"
        else:
            assert reason == "kept"

    kept = led[led["keep"]]
    assert len(kept) > 0
    assert set(led["reason"]) >= {"kept", "eval_holdout", "gopher"}
    # split populated exactly for kept docs
    assert (kept["split"] != "").all()
    assert (led[~led["keep"]]["split"] == "").all()


def test_datacard_totals(spark):
    """The data card must partition the corpus exactly: doc and token
    totals across all (lang, reason, split) cells equal the corpus."""
    from crawl4ai_spark.ops.pipelineq import q_corpus_datacard

    card = q_corpus_datacard(spark, SF).toPandas()
    docs = pq.read_table(f"{SF}/documents.parquet").to_pandas()
    assert card["n_docs"].sum() == len(docs)
    led = q_corpus_ledger(spark, SF).toPandas()
    assert card["n_tokens"].sum() == led["n_tokens"].sum()
    assert set(card.columns) == {"lang", "reason", "split",
                                 "n_docs", "n_tokens"}
