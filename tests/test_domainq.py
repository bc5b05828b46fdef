"""Domain governance (ops/domainq.py): from-spec pure-python guards on the
real sf0.001 corpus — no shared code with the Spark path beyond the
published constants, so an error mirrored into both engines cannot hide.
Cross-engine oracle parity runs in test_ops_parity via the registry."""

import hashlib
from collections import defaultdict

import pyarrow.parquet as pq

from crawl4ai_spark.ops.domainq import (
    CAP_M,
    MIN_DOCS,
    SHARE_MAX_PCT,
    q_domain_cap,
    q_domain_gate,
    q_domain_stats,
)

SF = "/root/testdata/sf0.001"


def _dom(doc_id):
    if doc_id % 4 == 0:
        return "dom0"
    if doc_id % 4 == 1:
        return f"dom{1 + doc_id % 3}"
    return f"dom{4 + doc_id % 149}"


def _corpus():
    df = pq.read_table(f"{SF}/documents.parquet").to_pandas()
    return [(int(r.doc_id), r.lang, int(r.n_chars))
            for r in df.itertuples()]


def test_domain_stats_from_spec(spark):
    docs = _corpus()
    agg = defaultdict(lambda: [0, 0, set()])
    for doc_id, lang, n_chars in docs:
        a = agg[_dom(doc_id)]
        a[0] += 1
        a[1] += n_chars
        a[2].add(lang)
    want = {d: (a[0], a[1], a[1] * 1_000_000 // a[0], len(a[2]))
            for d, a in agg.items()}
    got = {r.domain: (r.n_docs, r.total_chars, r.mean_chars_e6, r.n_langs)
           for r in q_domain_stats(spark, SF).collect()}
    assert got == want
    # the constructed skew is non-degenerate: a 25% head and a wide tail
    assert want["dom0"][0] > len(docs) // 5
    assert len(want) > 50


def test_domain_cap_equals_plain_topm(spark):
    """The salted two-phase plan must equal the single-window spec: the
    CAP_M lexicographically-smallest md5(doc_id) per domain, ranked."""
    by_dom = defaultdict(list)
    for doc_id, _, _ in _corpus():
        h = hashlib.md5(str(doc_id).encode()).hexdigest()
        by_dom[_dom(doc_id)].append((h, doc_id))
    want = {}
    for dom, rows in by_dom.items():
        for rk, (_, doc_id) in enumerate(sorted(rows)[:CAP_M], start=1):
            want[doc_id] = (dom, rk)
    got = {r.doc_id: (r.domain, r.rk)
           for r in q_domain_cap(spark, SF).collect()}
    assert got == want
    # the cap must actually bind somewhere (head domains exceed CAP_M)
    assert len(want) < len(_corpus())
    assert max(len(v) for v in by_dom.values()) > CAP_M


def test_domain_gate_from_spec(spark):
    docs = _corpus()
    n = len(docs)
    counts = defaultdict(int)
    for doc_id, _, _ in docs:
        counts[_dom(doc_id)] += 1
    got = {r.doc_id: r for r in q_domain_gate(spark, SF).collect()}
    assert len(got) == n
    for doc_id, _, _ in docs:
        dom = _dom(doc_id)
        fail_share = counts[dom] * 100 > n * SHARE_MAX_PCT
        fail_small = counts[dom] < MIN_DOCS
        r = got[doc_id]
        assert (r.domain, r.fail_share, r.fail_small, r.keep) == (
            dom, fail_share, fail_small,
            not fail_share and not fail_small)
    # both rules fire on the synthetic skew, and some domains pass clean
    assert any(r.fail_share for r in got.values())
    assert any(r.fail_small for r in got.values())
    assert any(r.keep for r in got.values())
