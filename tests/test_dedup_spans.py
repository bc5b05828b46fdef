"""Exact duplicate-substring spans (ops/dedup.py q_dedup_spans): maximal
character spans of length >= SPAN_K appearing verbatim in >= 2 distinct
documents, per Lee et al. 2021. Guarded by a from-spec python
reimplementation (interval union over duplicated windows) so an error
mirrored into both the Spark path and the DuckDB oracle cannot hide."""

from collections import defaultdict

import pyarrow.parquet as pq

from crawl4ai_spark.ops.dedup import SPAN_K, q_dedup_spans

SF = "/root/testdata/sf0.001"


def _expected(df):
    owners = defaultdict(set)
    for doc_id, text in zip(df["doc_id"], df["text"]):
        for i in range(len(text) - SPAN_K + 1):
            owners[text[i:i + SPAN_K]].add(doc_id)
    dup = {s for s, d in owners.items() if len(d) >= 2}
    spans = set()
    for doc_id, text in zip(df["doc_id"], df["text"]):
        positions = [i + 1 for i in range(len(text) - SPAN_K + 1)
                     if text[i:i + SPAN_K] in dup]
        start = prev = None
        for p in positions:
            if start is None:
                start = prev = p
            elif p - prev <= SPAN_K:
                prev = p
            else:
                spans.add((doc_id, start, prev + SPAN_K - 1))
                start = prev = p
        if start is not None:
            spans.add((doc_id, start, prev + SPAN_K - 1))
    return spans


def test_dedup_spans_matches_from_spec(spark):
    df = pq.read_table(f"{SF}/documents.parquet").to_pandas()
    want = _expected(df)
    got = {(r.doc_id, r.span_start, r.span_end)
           for r in q_dedup_spans(spark, SF).collect()}
    assert got == want
    assert want, "synthetic corpus must contain duplicated spans"


def test_dedup_spans_are_real_duplicates(spark):
    """Every reported span's text must occur verbatim in another doc, and
    spans within a doc must be disjoint and >= SPAN_K long."""
    df = pq.read_table(f"{SF}/documents.parquet").to_pandas()
    text = dict(zip(df["doc_id"], df["text"]))
    out = q_dedup_spans(spark, SF).toPandas()
    assert (out["span_len"] >= SPAN_K).all()
    assert (out["span_len"] ==
            out["span_end"] - out["span_start"] + 1).all()
    for doc_id, grp in out.groupby("doc_id"):
        ivs = sorted(zip(grp["span_start"], grp["span_end"]))
        for (s1, e1), (s2, _) in zip(ivs, ivs[1:]):
            assert s2 > e1, "spans must be disjoint"
    for r in out.itertuples():
        probe = text[r.doc_id][r.span_start - 1:r.span_start - 1 + SPAN_K]
        assert any(probe in t for d, t in text.items() if d != r.doc_id)


def test_dedup_spans_boilerplate_hot_key(spark, tmp_path):
    """A single boilerplate string shared by 1000 docs is the hot-key case:
    the dup join is positions-per-substring (linear), never a pair
    self-join, so one hot substring cannot go quadratic. Every doc must
    report exactly the boilerplate span."""
    import pandas as pd

    boiler = "x" * 10 + "shared boilerplate sentence for the span dedup!"
    assert len(boiler) >= SPAN_K
    docs = pd.DataFrame({
        "doc_id": range(1000),
        "text": [f"unique prefix {i:06d} " + boiler + f" tail {i:06d}"
                 for i in range(1000)],
        "lang": ["en"] * 1000,
        "source": ["t"] * 1000,
        "n_chars": [0] * 1000,
    })
    d = str(tmp_path)
    spark.createDataFrame(docs).write.mode("overwrite") \
        .parquet(f"{d}/documents.parquet")
    out = q_dedup_spans(spark, d).toPandas()
    # every doc carries >= 1 duplicated span, and the boilerplate text is
    # inside the reported window for each
    assert set(out["doc_id"]) == set(range(1000))
    texts = dict(zip(docs["doc_id"], docs["text"]))
    for r in out.itertuples():
        span = texts[r.doc_id][r.span_start - 1:r.span_end]
        assert boiler in span


def test_dedup_spans_fast128_equals_exact(spark):
    """The 128-bit double-hash variant (no exact verify pass) must be
    byte-identical to the exact form on the test corpus — a divergence
    means an xxhash64 double collision or a logic bug."""
    from crawl4ai_spark.ops.dedup import q_dedup_spans_fast128
    exact = {tuple(r) for r in q_dedup_spans(spark, SF).collect()}
    fast = {tuple(r) for r in q_dedup_spans_fast128(spark, SF).collect()}
    assert fast == exact
