"""Quality-aware duplicate canonicalization (ops/pipelineq.py
q_dedup_canonical_select) — cluster/keeper invariants against the
already-oracled components it composes."""

from collections import defaultdict

from crawl4ai_spark.ops.pipelineq import (
    q_dedup_canonical_select,
    q_dedup_pipeline,
)

SF = "/root/testdata/sf0.001"


def test_cluster_and_canonical_invariants(spark):
    rows = q_dedup_canonical_select(spark, SF).collect()
    assert len(rows) == 500
    by_cluster = defaultdict(list)
    for r in rows:
        by_cluster[r.cluster_id].append(r)

    n_multi = 0
    for cid, members in by_cluster.items():
        assert all(r.cluster_size == len(members) for r in members)
        canon = [r for r in members if r.canonical]
        assert len(canon) == 1, cid
        best = canon[0]
        # canonical is argmax(quality, tie -> min doc_id)
        for r in members:
            assert (r.quality_e6, -r.doc_id) <= (best.quality_e6, -best.doc_id)
            assert r.canonical_doc_id == best.doc_id
        if len(members) > 1:
            n_multi += 1
    assert n_multi > 0, "corpus must contain duplicate clusters"
    # some cluster's canonical must differ from its min doc_id — the
    # property the min-id keeper rule gets wrong
    assert any(
        min(r.doc_id for r in members)
        != next(r for r in members if r.canonical).doc_id
        for members in by_cluster.values() if len(members) > 1), \
        "quality-aware selection never diverged from min-id on this corpus"


def test_consistent_with_pipeline_verdicts(spark):
    """Every doc the pipeline drops as a duplicate sits in a multi-member
    cluster here; pipeline-unique docs are singletons (the pipeline's
    pairwise drops are a subset of the transitive clusters)."""
    verdicts = {r.doc_id: r.reason
                for r in q_dedup_pipeline(spark, SF).collect()}
    clusters = {r.doc_id: r.cluster_size
                for r in q_dedup_canonical_select(spark, SF).collect()}
    assert set(verdicts) == set(clusters)
    for doc_id, reason in verdicts.items():
        if reason in ("exact_dup", "near_dup"):
            assert clusters[doc_id] > 1, (doc_id, reason)
