"""revisit_economics (ops/refreshq.py): ledger identities against the
snapshot_diff verdict classes, and the economics claim itself — the
conditional policy strictly saves on every host with unchanged pages and
exactly breaks even elsewhere. The exact DuckDB oracle runs in
test_ops_parity."""

from collections import Counter

from crawl4ai_spark.ops.refreshq import (
    REVISIT_HEADER_BYTES,
    REVISIT_HOST_MOD,
    q_revisit_economics,
    q_snapshot_diff,
)

SF = "/root/testdata/sf0.001"


def test_revisit_counts_reconcile_with_snapshot_diff(spark):
    diff = q_snapshot_diff(spark, SF).collect()
    want = Counter((r.doc_id % REVISIT_HOST_MOD, r.verdict) for r in diff)
    rows = q_revisit_economics(spark, SF).collect()
    for r in rows:
        assert r.n_unchanged == want.get((r.hostk, "unchanged"), 0)
        assert r.n_changed == want.get((r.hostk, "changed"), 0)
        assert r.n_added == want.get((r.hostk, "added"), 0)
        assert r.n_removed == want.get((r.hostk, "removed"), 0)
    assert sum(r.n_unchanged + r.n_changed + r.n_added + r.n_removed
               for r in rows) == len(diff)


def test_revisit_savings_semantics(spark):
    rows = q_revisit_economics(spark, SF).collect()
    assert any(r.n_unchanged > 0 for r in rows)
    for r in rows:
        # conditional never pays more than naive, and saves exactly on
        # hosts with unchanged pages
        assert r.bytes_conditional <= r.bytes_naive
        if r.n_unchanged > 0:
            assert r.bytes_conditional < r.bytes_naive
            assert r.saved_ratio_e6 > 0
        else:
            assert r.bytes_conditional == r.bytes_naive
            assert r.saved_ratio_e6 == 0
        # every probe pays at least the header on both policies
        probes = r.n_unchanged + r.n_changed + r.n_added + r.n_removed
        assert r.bytes_conditional >= probes * REVISIT_HEADER_BYTES
