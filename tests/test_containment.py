"""dedup_containment_pairs (ops/dedup.py) semantic guards — Broder 1997's
asymmetric containment next to the resemblance (Jaccard) the suite already
oracles. The exact DuckDB oracle runs in test_ops_parity; here we assert
the measure-theoretic relations that distinguish containment from
resemblance on the real corpus."""

from crawl4ai_spark.ops.dedup import (
    q_dedup_containment_pairs,
    q_dedup_ngram_pairs,
)

SF = "/root/testdata/sf0.001"


def test_containment_relations(spark):
    cont = q_dedup_containment_pairs(spark, SF).collect()
    assert cont, "no candidate pairs on the test corpus"
    jacc = {(r.d1, r.d2): r.jaccard_e6
            for r in q_dedup_ngram_pairs(spark, SF).collect()}

    for r in cont:
        # bounds: containment is a fraction of the SMALLER measure's side
        assert 0 < r.c12_e6 <= 1_000_000
        assert 0 < r.c21_e6 <= 1_000_000
        assert r.cmax_e6 == max(r.c12_e6, r.c21_e6)
        # containment dominates resemblance: |A∩B|/|A| >= |A∩B|/|A∪B|
        # (±1 for the independent e6 roundings)
        j = jacc.get((r.d1, r.d2))
        if j is not None:
            assert r.cmax_e6 >= j - 1

    # the measure is genuinely asymmetric on this corpus (some pair has
    # different-sized shingle sets), which is the whole point vs Jaccard
    assert any(r.c12_e6 != r.c21_e6 for r in cont)
    # and strictly exceeds Jaccard somewhere (a subset-like relation that
    # resemblance dilutes)
    assert any(jacc.get((r.d1, r.d2)) is not None
               and r.cmax_e6 > jacc[(r.d1, r.d2)] + 1 for r in cont)
