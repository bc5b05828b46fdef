"""Structured Streaming tests (hermetic, availableNow triggers):
- the streaming extraction pipeline produces the same per-url text as batch;
- watermarked windowed aggregation matches the batch windowed query;
- the foreachBatch frontier stream crawls arriving seeds through the engine.
"""

import os

import pytest
from pyspark.sql import functions as F

from crawl4ai_spark.sources.pagesgen import generate_pages, generate_seeds
from crawl4ai_spark.streaming.stream import (
    run_frontier_stream,
    run_stream_to_memory,
    stream_process_pages,
    stream_windowed_events,
)


@pytest.fixture(scope="module")
def pages_dir(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("pages_stream"))
    generate_pages(spark, 3, 7).write.mode("overwrite").parquet(d)
    return d


def test_stream_extraction_matches_batch(spark, pages_dir):
    out = stream_process_pages(spark, pages_dir)
    run_stream_to_memory(out.select("url", "text"), "stream_pages_t")
    got = spark.sql("SELECT * FROM stream_pages_t")
    stored = spark.read.parquet(pages_dir).select("url", F.col("text").alias("oracle"))
    n_pages = stored.count()
    assert got.count() == n_pages
    mism = got.join(stored, "url").filter("text != oracle").count()
    assert mism == 0  # per-row invariant holds in streaming mode too


def test_stream_windowed_matches_batch(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("events_stream"))
    spark.read.parquet("/root/testdata/sf0.001/events.parquet") \
        .write.mode("overwrite").parquet(d)
    agg = stream_windowed_events(spark, d)
    run_stream_to_memory(agg, "stream_ev_t", complete=True)
    got = spark.sql("SELECT w_start, event_type, n, sum_value_e6 FROM stream_ev_t")

    batch = (
        spark.read.parquet(d)
        .groupBy(F.window("ts", "10 minutes").alias("w"), "event_type")
        .agg(F.count("*").alias("n"),
             F.sum(F.round(F.col("value") * 1e6).cast("long")).alias("sum_value_e6"))
        .select(F.col("w.start").alias("w_start"), "event_type", "n", "sum_value_e6")
    )
    assert got.count() == batch.count()
    assert got.exceptAll(batch).count() == 0


def test_frontier_stream_foreachbatch(spark, pages_dir, tmp_store, tmp_path_factory):
    seeds_dir = str(tmp_path_factory.mktemp("seeds_stream"))
    generate_seeds(spark, 3).write.mode("overwrite").parquet(seeds_dir)
    pages = spark.read.parquet(pages_dir)
    engine = run_frontier_stream(
        spark, seeds_dir, pages, os.path.join(tmp_store, "stream_store")
    )
    res = engine.results()
    assert res is not None
    n = res.count()
    assert n >= 3  # at least the 3 seed roots crawled
    assert res.filter(F.col("success")).count() > 0


def test_frontier_stream_second_batch_seeds(spark, pages_dir, tmp_store,
                                            tmp_path_factory):
    """Seeds arriving in micro-batch N>0 must be crawled, not dropped by the
    resume path (ADVICE r01 #1)."""
    from crawl4ai_spark.sources.pagesgen import page_url

    seeds_dir = str(tmp_path_factory.mktemp("seeds_stream2"))
    store = os.path.join(tmp_store, "stream_store2")
    generate_seeds(spark, 3).write.mode("overwrite").parquet(seeds_dir)
    pages = spark.read.parquet(pages_dir)

    engine = run_frontier_stream(spark, seeds_dir, pages, store)
    first = {r["url"] for r in engine.results().select("url").collect()}

    # a deep page none of the roots reach at max_depth=1
    late_seed = page_url(2, 5)
    assert late_seed not in first
    spark.createDataFrame([(late_seed, 1.0)], "url string, priority double") \
        .write.mode("append").parquet(seeds_dir)

    engine = run_frontier_stream(spark, seeds_dir, pages, store)
    after = {r["url"] for r in engine.results().select("url").collect()}
    assert late_seed in after


def test_stream_sessionize_matches_batch(spark, tmp_path_factory):
    """applyInPandasWithState sessionization == the batch sessionize query
    (latest emission per (user, session_no) after one availableNow pass)."""
    from crawl4ai_spark.ops.analytics import q_sessionize_events
    from crawl4ai_spark.streaming.stream import stream_sessionize_events

    d = str(tmp_path_factory.mktemp("events_sess"))
    spark.read.parquet("/root/testdata/sf0.001/events.parquet") \
        .write.mode("overwrite").parquet(d)

    out = stream_sessionize_events(spark, d)
    run_stream_to_memory(out, "stream_sess_t")
    got = spark.sql("""
        SELECT user_id, session_no, n_events, duration_s, sum_value_e6
        FROM stream_sess_t
    """)
    batch = q_sessionize_events(spark, "/root/testdata/sf0.001")
    a = {(r.user_id, r.session_no): (r.n_events, r.duration_s, r.sum_value_e6)
         for r in got.collect()}
    b = {(r.user_id, r.session_no): (r.n_events, r.duration_s, r.sum_value_e6)
         for r in batch.collect()}
    assert a == b


# transformWithStateInPandas ships its state protocol over protobuf. This
# sandbox has no pip-installed google.protobuf; conftest's
# _enable_protobuf_shim() activates the Google Cloud SDK's bundled
# pure-python runtime when present, so these run green here — and the
# skipif stays as the honest gate for environments with neither.
try:
    import google.protobuf  # noqa: F401
    _HAS_PROTOBUF = True
except ImportError:
    _HAS_PROTOBUF = False
needs_protobuf = pytest.mark.skipif(
    not _HAS_PROTOBUF,
    reason="transformWithState requires google.protobuf (absent in sandbox)")


@needs_protobuf
def test_stream_sessionize_tws_matches_batch(spark, tmp_path_factory):
    """transformWithStateInPandas (Spark 4 StatefulProcessor) sessionization
    == the batch sessionize query — the successor-API twin of the
    applyInPandasWithState test above."""
    from crawl4ai_spark.ops.analytics import q_sessionize_events
    from crawl4ai_spark.streaming.stream import stream_sessionize_events_tws

    d = str(tmp_path_factory.mktemp("events_sess_tws"))
    spark.read.parquet("/root/testdata/sf0.001/events.parquet") \
        .write.mode("overwrite").parquet(d)

    out = stream_sessionize_events_tws(spark, d)
    run_stream_to_memory(out, "stream_sess_tws_t")
    got = spark.sql("""
        SELECT user_id, session_no, n_events, duration_s, sum_value_e6
        FROM stream_sess_tws_t
    """)
    batch = q_sessionize_events(spark, "/root/testdata/sf0.001")
    a = {(r.user_id, r.session_no): (r.n_events, r.duration_s, r.sum_value_e6)
         for r in got.collect()}
    b = {(r.user_id, r.session_no): (r.n_events, r.duration_s, r.sum_value_e6)
         for r in batch.collect()}
    assert a == b


@needs_protobuf
def test_stream_sessionize_tws_state_across_batches(spark, tmp_path_factory):
    """ValueState survives micro-batches: events split by TIME into two
    single-file drops (maxFilesPerTrigger=1 → two micro-batches, oldest
    file first) with sessions spanning the boundary still sessionize
    exactly like the batch query over the union."""
    import time

    from crawl4ai_spark.ops.analytics import q_sessionize_events
    from crawl4ai_spark.streaming.stream import stream_sessionize_events_tws

    src = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    mid = src.selectExpr("percentile(unix_timestamp(ts), 0.5) p").first().p
    d = str(tmp_path_factory.mktemp("events_sess_tws2"))
    src.filter(f"unix_timestamp(ts) <= {mid}").coalesce(1) \
        .write.mode("overwrite").parquet(d + "/b0")
    time.sleep(1.1)  # file-source ordering is by modification time
    src.filter(f"unix_timestamp(ts) > {mid}").coalesce(1) \
        .write.mode("overwrite").parquet(d + "/b1")

    out = stream_sessionize_events_tws(spark, d + "/b*",
                                       max_files_per_trigger=1)
    run_stream_to_memory(out, "stream_sess_tws2_t")
    # update-stream contract: a session re-emitted in batch 2 supersedes
    # its batch-1 partial → compare the FINAL aggregate per (user, session)
    got = spark.sql("""
        SELECT user_id, session_no, n_events, duration_s, sum_value_e6
        FROM (SELECT *, row_number() OVER (
                  PARTITION BY user_id, session_no
                  ORDER BY n_events DESC) rn
              FROM stream_sess_tws2_t) WHERE rn = 1
    """)
    batch = q_sessionize_events(spark, "/root/testdata/sf0.001")
    a = {(r.user_id, r.session_no): (r.n_events, r.duration_s, r.sum_value_e6)
         for r in got.collect()}
    b = {(r.user_id, r.session_no): (r.n_events, r.duration_s, r.sum_value_e6)
         for r in batch.collect()}
    assert a == b


def test_stream_dedup_exact_matches_batch(spark, tmp_path_factory):
    """Streaming dropDuplicates dedup keeps exactly one doc per distinct
    normalized-content hash — the same hash set as the batch dedup_exact
    query."""
    from crawl4ai_spark.ops.dedup import q_dedup_exact
    from crawl4ai_spark.streaming.stream import stream_dedup_exact

    d = str(tmp_path_factory.mktemp("docs_dedup_stream"))
    spark.read.parquet("/root/testdata/sf0.001/documents.parquet") \
        .write.mode("overwrite").parquet(d)

    out = stream_dedup_exact(spark, d)
    run_stream_to_memory(out, "stream_dedup_t")
    got = spark.sql("SELECT content_hash FROM stream_dedup_t")
    batch = q_dedup_exact(spark, "/root/testdata/sf0.001")
    assert got.count() == batch.count()  # one survivor per hash
    a = {r.content_hash for r in got.collect()}
    b = {r.content_hash for r in batch.select("content_hash").collect()}
    assert a == b


def test_stream_corpus_gate_matches_batch(spark, tmp_path_factory):
    """Streaming admission with batch-calibrated rates must accept exactly
    the batch temperature-resample's kept set."""
    import shutil

    from crawl4ai_spark.ops.pipelineq import q_resample_temperature
    from crawl4ai_spark.streaming.stream import stream_corpus_gate

    sf = "/root/testdata/sf0.001"
    d = str(tmp_path_factory.mktemp("gate"))
    shutil.copy(f"{sf}/documents.parquet", f"{d}/documents.parquet")

    batch = q_resample_temperature(spark, sf).collect()
    rates = {r.lang: r.rate_e6 for r in batch}
    kept_batch = {r.doc_id for r in batch}

    out = stream_corpus_gate(spark, d, rates)
    run_stream_to_memory(out, "stream_gate_t")
    rows = spark.sql("SELECT * FROM stream_gate_t").collect()
    kept_stream = {r.doc_id for r in rows if r.accept}
    assert kept_stream == kept_batch
    assert len(rows) > len(kept_stream)  # some docs rejected


def test_stream_dsir_gate_matches_batch(spark, tmp_path_factory):
    """Streaming DSIR admission with a batch-calibrated ratio table +
    threshold: streamed avg_e6 must equal the batch query's byte-for-byte,
    and the accept set must equal the batch threshold-keep set."""
    import shutil

    from crawl4ai_spark.ops.pipelineq import dsir_ratio_table, q_dsir_resample
    from crawl4ai_spark.streaming.stream import stream_dsir_gate

    sf = "/root/testdata/sf0.001"
    d = str(tmp_path_factory.mktemp("dsir"))
    shutil.copy(f"{sf}/documents.parquet", f"{d}/documents.parquet")

    batch = q_dsir_resample(spark, sf).collect()
    table = {int(r.b): int(r.r_e6)
             for r in dsir_ratio_table(spark, sf).collect()}
    thr = min(r.avg_e6 for r in batch if r.keep)

    out = stream_dsir_gate(spark, d, table, thr)
    run_stream_to_memory(out, "stream_dsir_t")
    rows = spark.sql("SELECT * FROM stream_dsir_t").collect()
    stream_avg = {r.doc_id: r.avg_e6 for r in rows}
    batch_avg = {r.doc_id: r.avg_e6 for r in batch}
    assert stream_avg == batch_avg          # identical integer scores
    kept_stream = {r.doc_id for r in rows if r.accept}
    kept_thr = {r.doc_id for r in batch if r.avg_e6 >= thr}
    assert kept_stream == kept_thr          # threshold semantics exact
    # top-K and threshold agree except possibly at the tie boundary
    kept_topk = {r.doc_id for r in batch if r.keep}
    assert kept_topk <= kept_stream


def test_stream_ppl_gate_matches_batch(spark, tmp_path_factory):
    """Streaming perplexity admission with a batch-calibrated hashed LM +
    threshold: streamed ppl_e6 must equal the hashed batch twin's
    byte-for-byte, and the accept set must equal the batch threshold set
    (= CCNet's head+middle of the per-language tertiles, up to the
    documented boundary-tie granularity)."""
    import shutil

    from crawl4ai_spark.ops.perplexityq import (
        ppl_hashed_lm,
        q_ccnet_perplexity_hashed,
    )
    from crawl4ai_spark.streaming.stream import stream_ppl_gate

    sf = "/root/testdata/sf0.001"
    d = str(tmp_path_factory.mktemp("ppl"))
    shutil.copy(f"{sf}/documents.parquet", f"{d}/documents.parquet")

    batch = q_ccnet_perplexity_hashed(spark, sf).collect()
    c12, c1, v = ppl_hashed_lm(spark, sf)
    # calibrated threshold: the 2/3 boundary of the pooled ppl distribution
    ppls = sorted(r.ppl_e6 for r in batch)
    thr = ppls[(2 * len(ppls)) // 3]

    out = stream_ppl_gate(spark, d, c12, c1, v, thr)
    run_stream_to_memory(out, "stream_ppl_t")
    rows = spark.sql("SELECT * FROM stream_ppl_t").collect()
    assert {r.doc_id: r.ppl_e6 for r in rows} == \
        {r.doc_id: r.ppl_e6 for r in batch}
    assert {r.doc_id: r.sum_neglog_e6 for r in rows} == \
        {r.doc_id: r.sum_neglog_e6 for r in batch}
    assert {r.doc_id for r in rows if r.accept} == \
        {r.doc_id for r in batch if r.ppl_e6 <= thr}


def test_stream_pii_redact_matches_batch(spark, tmp_path_factory):
    """Streaming PII scrub must be row-identical to the batch query —
    counts and redacted text byte-for-byte."""
    import shutil

    from crawl4ai_spark.ops.cleanq import q_pii_redact
    from crawl4ai_spark.streaming.stream import stream_pii_redact

    sf = "/root/testdata/sf0.001"
    d = str(tmp_path_factory.mktemp("pii"))
    shutil.copy(f"{sf}/documents.parquet", f"{d}/documents.parquet")

    batch = {r.doc_id: (r.n_emails, r.n_ips, r.n_phones, r.redacted)
             for r in q_pii_redact(spark, sf).collect()}

    out = stream_pii_redact(spark, d)
    run_stream_to_memory(out, "stream_pii_t")
    rows = spark.sql("SELECT * FROM stream_pii_t").collect()
    streamed = {r.doc_id: (r.n_emails, r.n_ips, r.n_phones, r.redacted)
                for r in rows}
    assert streamed == batch
    assert sum(v[0] + v[1] + v[2] for v in streamed.values()) > 0


def test_stream_token_cms_matches_batch(spark, tmp_path_factory):
    """Streaming CMS grid after multiple micro-batches (maxFilesPerTrigger=1
    over two parquet files) must equal the batch grid over the same docs —
    the sketch's mergeability executed, with state bounded at D*W cells."""
    import time

    from crawl4ai_spark.ops.textstats import CMS_D, CMS_W, cms_cells
    from crawl4ai_spark.streaming.stream import stream_token_cms

    sf = "/root/testdata/sf0.001"
    d = str(tmp_path_factory.mktemp("cms_stream"))
    docs = spark.read.parquet(f"{sf}/documents.parquet")
    docs.filter(F.col("doc_id") % 2 == 0).coalesce(1) \
        .write.mode("overwrite").parquet(f"{d}/a")
    time.sleep(1.1)  # file-source ordering is by modification time
    docs.filter(F.col("doc_id") % 2 == 1).coalesce(1) \
        .write.mode("overwrite").parquet(f"{d}/b")

    out = stream_token_cms(spark, d + "/*")
    q = run_stream_to_memory(out, "stream_cms_t", complete=True)
    assert len(q.recentProgress) >= 2  # multi-batch: the merge really ran
    got = {(r.d, r.bucket): r.cnt
           for r in spark.sql("SELECT * FROM stream_cms_t").collect()}

    toks = docs.select(F.explode(F.expr(
        "regexp_extract_all(lower(text), '[a-z0-9]+', 0)")).alias("tok"))
    want = {(r.d, r.bucket): r.cnt for r in cms_cells(toks).collect()}
    assert got == want
    assert 0 < len(got) <= CMS_D * CMS_W  # the state bound


def test_stream_incremental_dedup_matches_batch(spark, tmp_path_factory):
    """Streaming snapshot admission: delta docs arriving over >= 2
    micro-batches, verdicted per batch against the persisted base index,
    must produce exactly the batch q_dedup_incremental verdict set."""
    import time

    from crawl4ai_spark.ops.dedup import (
        _inc_snapshot_split, inc_index_frames, q_dedup_incremental)
    from crawl4ai_spark.streaming.stream import run_incremental_dedup_stream

    sf = "/root/testdata/sf0.001"
    root = str(tmp_path_factory.mktemp("inc_stream"))
    base, delta = _inc_snapshot_split(spark, sf)
    bh, bands = inc_index_frames(base)
    bh.write.parquet(f"{root}/index/hash")
    bands.write.parquet(f"{root}/index/bands")
    delta = delta.cache()
    delta.filter(F.col("doc_id") % 2 == 0).coalesce(1) \
        .write.parquet(f"{root}/delta/a")
    time.sleep(1.1)  # file-source ordering is by modification time
    delta.filter(F.col("doc_id") % 2 == 1).coalesce(1) \
        .write.parquet(f"{root}/delta/b")

    q = run_incremental_dedup_stream(
        spark, f"{root}/delta/*", f"{root}/index", f"{root}/verdicts")
    assert q.lastProgress["batchId"] >= 1  # really ran >= 2 micro-batches
    got = {r.doc_id: (r.verdict, r.match_id)
           for r in spark.read.parquet(f"{root}/verdicts").collect()}
    want = {r.doc_id: (r.verdict, r.match_id)
            for r in q_dedup_incremental(spark, sf).collect()}
    assert got == want
    assert {v for v, _ in got.values()} == {"exact", "near", "new"}


def test_stream_decontaminate_gate_matches_batch(spark, tmp_path_factory):
    """Streaming contamination verdicts with batch-calibrated eval grams:
    streamed (n_grams, n_hits) must equal the batch q_decontaminate rows
    byte-for-byte on the contaminated set, and accept must be exactly its
    complement over the corpus docs."""
    import shutil

    from crawl4ai_spark.ops.pipelineq import (
        DECON_BENCH_MOD, DECON_N, q_decontaminate)
    from crawl4ai_spark.streaming.stream import stream_decontaminate_gate

    sf = "/root/testdata/sf0.001"
    d = str(tmp_path_factory.mktemp("decon"))
    shutil.copy(f"{sf}/documents.parquet", f"{d}/documents.parquet")

    batch = {r.doc_id: (r.n_grams, r.n_hits)
             for r in q_decontaminate(spark, sf).collect()}
    # calibrate the bench gram set exactly as the batch query does
    docs = spark.read.parquet(f"{sf}/documents.parquet")
    from pyspark.sql import functions as F
    g = (docs.select("doc_id", F.expr(
            "regexp_extract_all(lower(text), '[a-z0-9]+', 0)").alias("toks"))
         .filter(F.expr(f"size(toks) >= {DECON_N}"))
         .filter(F.col("doc_id") % DECON_BENCH_MOD == 0)
         .select(F.explode(F.expr(
             f"array_distinct(transform(sequence(1, size(toks) - {DECON_N - 1}),"
             f" i -> array_join(slice(toks, i, {DECON_N}), ' ')))"))
             .alias("gram")).distinct())
    bench_grams = [r.gram for r in g.collect()]
    assert len(bench_grams) > 100

    out = stream_decontaminate_gate(spark, d, bench_grams)
    run_stream_to_memory(out, "stream_decon_t")
    rows = spark.sql("SELECT * FROM stream_decon_t").collect()
    hit_stream = {r.doc_id: (r.n_grams, r.n_hits) for r in rows if r.n_hits}
    assert hit_stream == batch
    accepted = {r.doc_id for r in rows if r.accept}
    assert accepted and accepted.isdisjoint(batch)
    assert accepted | set(batch) == {r.doc_id for r in rows}


def test_stream_decontaminate_gate_verdicts_short_docs(spark,
                                                       tmp_path_factory):
    """An admission gate must verdict EVERY arriving corpus doc: one too
    short to form a single n-gram cannot be contaminated and passes with
    n_grams = 0 instead of silently vanishing."""
    from crawl4ai_spark.streaming.stream import stream_decontaminate_gate

    d = str(tmp_path_factory.mktemp("decon_short"))
    rows = [(1, "tiny doc", "en", "s", 8),
            (2, "a much longer document with enough words to gram", "en",
             "s", 48)]
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string,"
              " n_chars long").write.mode("overwrite").parquet(d)
    out = stream_decontaminate_gate(spark, d, ["no such gram here x"])
    run_stream_to_memory(out, "stream_decon_short_t")
    got = {r.doc_id: (r.n_grams, r.n_hits, r.accept)
           for r in spark.sql("SELECT * FROM stream_decon_short_t").collect()}
    assert got[1] == (0, 0, True)      # short doc: verdicted, accepted
    assert got[2][0] > 0 and got[2][2]
