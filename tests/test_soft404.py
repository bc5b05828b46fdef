"""soft404_detect (ops/trapq.py): ground-truth accuracy and the hamming
separation the detector depends on. The exact DuckDB oracle (independent
SimHash recomputation) runs in test_ops_parity; here we check the
detector against the synthesis ground truth — every template-serving page
flagged, every real document passed — and that the gap between the two
populations is wide, not threshold-lucky."""

from crawl4ai_spark.ops.trapq import (
    SOFT404_HAM_T,
    SOFT404_RATE_MOD,
    q_soft404_detect,
)

SF = "/root/testdata/sf0.001"


def test_soft404_detects_exactly_the_template_pages(spark):
    rows = q_soft404_detect(spark, SF).collect()
    assert rows
    for r in rows:
        truly = r.doc_id % SOFT404_RATE_MOD < 2
        assert r.is_soft404 == truly, (r.doc_id, r.hamming)


def test_stream_soft404_gate_matches_batch(spark, tmp_path_factory):
    """Streaming admission with batch-calibrated probe signatures must
    produce verdicts row-identical to the batch query (per-row stateless
    sign-and-compare → micro-batching exact)."""
    import shutil

    from crawl4ai_spark.ops.trapq import soft404_probe_signatures
    from crawl4ai_spark.streaming.stream import (
        run_stream_to_memory,
        stream_soft404_gate,
    )

    d = str(tmp_path_factory.mktemp("s404"))
    shutil.copy(f"{SF}/documents.parquet", f"{d}/documents.parquet")

    batch = {(r.doc_id, r.host, r.hamming, r.is_soft404)
             for r in q_soft404_detect(spark, SF).collect()}
    probes = soft404_probe_signatures(spark, SF)
    out = stream_soft404_gate(spark, d, probes)
    run_stream_to_memory(out, "stream_s404_t")
    rows = spark.sql("SELECT * FROM stream_s404_t").collect()
    got = {(r.doc_id, r.host, r.hamming, r.is_soft404) for r in rows}
    assert got == batch


def test_soft404_separation_is_wide(spark):
    """Soft 404s sit far below the threshold, real docs far above — the
    variant token only flips template-tied bits (~7 of 60) while
    independent documents land near 30."""
    rows = q_soft404_detect(spark, SF).collect()
    ham_404 = [r.hamming for r in rows if r.doc_id % SOFT404_RATE_MOD < 2]
    ham_real = [r.hamming for r in rows if r.doc_id % SOFT404_RATE_MOD >= 2]
    assert ham_404 and ham_real
    assert max(ham_404) <= SOFT404_HAM_T - 5
    assert min(ham_real) >= SOFT404_HAM_T + 5
