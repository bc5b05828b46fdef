"""Deterministic stratified split (ops/pipelineq.py q_split_stratified):
98/1/1 train/valid/test keyed on md5(text) — stable under reruns, and
byte-identical docs can never straddle splits."""

import hashlib

import pyarrow.parquet as pq

from crawl4ai_spark.ops.pipelineq import (
    SPLIT_TEST_PPM,
    SPLIT_VALID_PPM,
    q_split_stratified,
)

SF = "/root/testdata/sf0.001"


def _split_of(text):
    u40 = int(hashlib.md5(text.encode()).hexdigest()[:10], 16)
    ppm = u40 * 1_000_000 // (1 << 40)
    if ppm < SPLIT_VALID_PPM:
        return "valid"
    if ppm < SPLIT_TEST_PPM:
        return "test"
    return "train"


def test_split_matches_from_spec(spark):
    df = pq.read_table(f"{SF}/documents.parquet").to_pandas()
    want = {}
    for doc_id, lang, text in zip(df["doc_id"], df["lang"], df["text"]):
        k = (lang, _split_of(text))
        n, lo, hi = want.get(k, (0, doc_id, doc_id))
        want[k] = (n + 1, min(lo, doc_id), max(hi, doc_id))
    got = {(r.lang, r.split): (r.n, r.min_doc, r.max_doc)
           for r in q_split_stratified(spark, SF).collect()}
    assert got == want


def test_split_ratios_and_determinism(spark):
    out1 = q_split_stratified(spark, SF).toPandas()
    out2 = q_split_stratified(spark, SF).toPandas()
    key = ["lang", "split"]
    assert out1.sort_values(key).reset_index(drop=True).equals(
        out2.sort_values(key).reset_index(drop=True))
    total = out1["n"].sum()
    train = out1[out1["split"] == "train"]["n"].sum()
    # 98% nominal; loose bound for a 500-doc sample
    assert train / total > 0.93
    assert set(out1["split"]) >= {"train"}
