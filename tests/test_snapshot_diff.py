"""snapshot_diff (ops/refreshq.py) — the crawl-over-crawl delta ledger.
Exact DuckDB oracle runs in test_ops_parity; here: every verdict class is
non-degenerate on the corpus and the verdicts partition the union of the
two snapshots with the set algebra the construction implies."""

from collections import Counter

from crawl4ai_spark.ops.refreshq import q_snapshot_diff

SF = "/root/testdata/sf0.001"


def test_snapshot_diff_verdicts(spark):
    rows = q_snapshot_diff(spark, SF).collect()
    by = Counter(r.verdict for r in rows)
    # all four classes occur (the construction guarantees each)
    assert set(by) == {"added", "removed", "changed", "unchanged"}
    for r in rows:
        if r.verdict == "added":
            assert r.h1 is None and r.h2 is not None and r.doc_id % 5 == 4
        elif r.verdict == "removed":
            assert r.h2 is None and r.h1 is not None and r.doc_id % 5 == 0
        elif r.verdict == "changed":
            assert r.h1 != r.h2 and r.doc_id % 3 == 0
        else:
            assert r.h1 == r.h2 and r.doc_id % 3 != 0
    # the union covers every doc exactly once
    assert len({r.doc_id for r in rows}) == len(rows)
