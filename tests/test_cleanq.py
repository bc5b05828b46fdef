"""Corpus cleaning (ops/cleanq.py): CCNet line-level dedup and FineWeb-style
PII redaction, guarded by from-spec pure-python reimplementations on the real
sf0.001 corpus — no shared code with the Spark path beyond the published
constants, so an error mirrored into both the Spark query and the DuckDB
oracle cannot hide. Cross-engine oracle parity itself runs in test_ops_parity
via the registry."""

import re
from collections import defaultdict

import pyarrow.parquet as pq

from crawl4ai_spark.ops.cleanq import (
    EMAIL_RE,
    IP_RE,
    LINE_W,
    PHONE_RE,
    q_clean_dup_lines,
    q_dedup_lines,
    q_pii_redact,
)

SF = "/root/testdata/sf0.001"


def _spec_lines(text):
    toks = text.split(" ")
    return [" ".join(toks[i:i + LINE_W]) for i in range(0, len(toks), LINE_W)]


def _spec_dup(df):
    owners, occ = defaultdict(set), defaultdict(int)
    for doc_id, text in zip(df["doc_id"], df["text"]):
        for line in _spec_lines(text):
            owners[line].add(doc_id)
            occ[line] += 1
    return {line: (len(d), occ[line])
            for line, d in owners.items() if len(d) >= 2}


def test_dedup_lines_matches_from_spec(spark):
    df = pq.read_table(f"{SF}/documents.parquet").to_pandas()
    want = _spec_dup(df)
    got = {r.line: (r.n_docs, r.n_occ)
           for r in q_dedup_lines(spark, SF).collect()}
    assert got == want
    assert want, "synthetic corpus must contain duplicated lines"


def test_clean_dup_lines_matches_from_spec(spark):
    df = pq.read_table(f"{SF}/documents.parquet").to_pandas()
    dup = set(_spec_dup(df))
    want = {}
    for doc_id, text in zip(df["doc_id"], df["text"]):
        lines = _spec_lines(text)
        kept = [ln for ln in lines if ln not in dup]
        want[doc_id] = (len(lines), len(lines) - len(kept), " ".join(kept))
    got = {r.doc_id: (r.n_lines, r.n_dup_lines, r.clean_text)
           for r in q_clean_dup_lines(spark, SF).collect()}
    assert got == want
    assert any(v[1] for v in want.values()), "some doc must lose a line"
    assert any(v[1] == 0 for v in want.values()), \
        "some doc must pass through untouched (byte-equal branch)"


def _spec_pii_text(doc_id, text):
    m = doc_id % 7
    if m == 3:
        return f"{text} contact user{doc_id}@mail{doc_id % 5}.example.com"
    if m == 5:
        return (f"{text} origin 10.{doc_id % 256}"
                f".{(doc_id // 256) % 256}.{1 + doc_id % 254}")
    if m == 1:
        return (f"{text} call 555-{100 + doc_id % 900}"
                f"-{1000 + doc_id % 9000}")
    return text


def test_pii_redact_matches_from_spec(spark):
    df = pq.read_table(f"{SF}/documents.parquet").to_pandas()
    got = {r.doc_id: r for r in q_pii_redact(spark, SF).collect()}
    n_redacted = 0
    for doc_id, text in zip(df["doc_id"], df["text"]):
        pii = _spec_pii_text(int(doc_id), text)
        r = got[doc_id]
        assert r.n_emails == len(re.findall(EMAIL_RE, pii))
        assert r.n_ips == len(re.findall(IP_RE, pii))
        assert r.n_phones == len(re.findall(PHONE_RE, pii))
        want = re.sub(PHONE_RE, "<PHONE>",
                      re.sub(IP_RE, "<IP>",
                             re.sub(EMAIL_RE, "<EMAIL>", pii)))
        assert r.redacted == want
        n_redacted += int(r.n_emails + r.n_ips + r.n_phones > 0)
    # the doc_id % 7 injection hits ~3/7 of the corpus — every class fires
    assert n_redacted > len(df) / 3
    assert sum(r.n_emails for r in got.values()) > 0
    assert sum(r.n_ips for r in got.values()) > 0
    assert sum(r.n_phones for r in got.values()) > 0


def test_pii_redact_scrubs_everything(spark):
    """No PII pattern survives in the redacted column."""
    out = q_pii_redact(spark, SF).toPandas()
    for pat in (EMAIL_RE, IP_RE, PHONE_RE):
        assert not out["redacted"].str.contains(pat, regex=True).any()


def test_corpus_clean_card_partitions_corpus(spark):
    """The 4 cohort rows must partition the corpus exactly, and every
    total must equal the sum of the per-doc stage outputs."""
    from crawl4ai_spark.ops.cleanq import q_corpus_clean_card

    card = q_corpus_clean_card(spark, SF).collect()
    df = pq.read_table(f"{SF}/documents.parquet").to_pandas()
    assert sum(r.n_docs for r in card) == len(df)
    assert len({(r.dom_keep, r.quality_keep) for r in card}) == len(card)
    per_doc_pii = q_pii_redact(spark, SF).collect()
    assert sum(r.n_pii for r in card) == sum(
        r.n_emails + r.n_ips + r.n_phones for r in per_doc_pii)
    per_doc_lines = q_clean_dup_lines(spark, SF).collect()
    assert sum(r.n_dup_lines for r in card) == sum(
        r.n_dup_lines for r in per_doc_lines)
