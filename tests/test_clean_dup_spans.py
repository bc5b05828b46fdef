"""Duplicate-span removal (ops/dedup.py q_clean_dup_spans): cut every
q_dedup_spans interval out of every doc and reassemble. Guarded by a
from-spec python reimplementation built on the independently-verified span
expectations from test_dedup_spans."""

import pyarrow.parquet as pq

from crawl4ai_spark.ops.dedup import q_clean_dup_spans
from tests.test_dedup_spans import _expected as _expected_spans

SF = "/root/testdata/sf0.001"


def _expected(df):
    spans = {}
    for doc_id, s, e in _expected_spans(df):
        spans.setdefault(doc_id, []).append((s, e))
    out = {}
    for doc_id, text in zip(df["doc_id"], df["text"]):
        ivs = sorted(spans.get(doc_id, []))
        kept, p = [], 1
        for s, e in ivs:
            kept.append(text[p - 1:s - 1])
            p = e + 1
        kept.append(text[p - 1:])
        out[doc_id] = (len(ivs), sum(e - s + 1 for s, e in ivs),
                       "".join(kept))
    return out


def test_clean_dup_spans_matches_from_spec(spark):
    df = pq.read_table(f"{SF}/documents.parquet").to_pandas()
    want = _expected(df)
    got = {r.doc_id: (r.n_spans, r.removed_chars, r.clean_text)
           for r in q_clean_dup_spans(spark, SF).collect()}
    assert got == want
    assert any(v[0] > 0 for v in want.values())
    assert any(v[0] == 0 for v in want.values())


def test_clean_dup_spans_invariants(spark):
    """Length bookkeeping holds and untouched docs pass through byte-equal."""
    df = pq.read_table(f"{SF}/documents.parquet").to_pandas()
    text = dict(zip(df["doc_id"], df["text"]))
    out = q_clean_dup_spans(spark, SF).toPandas()
    for r in out.itertuples():
        assert len(r.clean_text) == len(text[r.doc_id]) - r.removed_chars
        if r.n_spans == 0:
            assert r.clean_text == text[r.doc_id]
