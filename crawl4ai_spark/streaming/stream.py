"""Structured Streaming surface.

The reference's "stream mode" is result streaming over asyncio generators
(/root/reference/crawl4ai/models.py:308-311 RunManyReturn;
deep_crawling/base_strategy.py:99-105) — no event-time semantics. Here the
same capabilities are expressed Spark-natively:

- :func:`stream_process_pages` — continuous extraction: a file stream of
  ``pages`` parquet drops runs the SAME one-Arrow-stage pipeline as batch
  (results stream out per micro-batch, the arun_many(stream=True) analog);
- :func:`stream_windowed_events` — watermarked tumbling-window aggregation
  over an event stream (late data handled by the watermark);
- :func:`run_frontier_stream` — the frontier loop as a ``foreachBatch``
  consumer: each seed-batch triggers one crawl generation through the engine
  (micro-batch per frontier generation, resumable via the snapshot store);
- :func:`stream_sessionize_events` — a custom STATEFUL operator via
  ``applyInPandasWithState``: per-user gap sessionization whose state
  survives across micro-batches (asserted equal to the batch query);
- :func:`stream_sessionize_events_tws` — the SAME operator on Spark 4's
  successor stateful API (``transformWithStateInPandas`` +
  ``StatefulProcessor``/``ValueState``), asserted equal to both the
  applyInPandasWithState variant and the batch query. NOTE: the TWS state
  protocol needs ``google.protobuf``, absent in this sandbox — the tests
  skip with that reason and run wherever protobuf exists;
- :func:`stream_dedup_exact` — streaming exact deduplication: first
  arrival per normalized-content hash wins (``dropDuplicates`` state).

All entry points accept ``trigger=availableNow`` so tests are hermetic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from crawl4ai_spark.functions.udfs import process_pages
from crawl4ai_spark.sources.pagesgen import PAGES_SCHEMA

EVENTS_SCHEMA = "event_id long, ts timestamp, user_id long, event_type string, value double, props string"


def stream_process_pages(spark: SparkSession, pages_dir: str) -> DataFrame:
    """readStream(pages parquet) → the extraction pipeline, unchanged.
    The pUDF stage is identical to batch — one code path, two execution
    modes (the point of building on DataFrames)."""
    stream = (
        spark.readStream.schema(PAGES_SCHEMA)
        .option("maxFilesPerTrigger", 4)
        .parquet(pages_dir)
    )
    return process_pages(stream)


def stream_windowed_events(spark: SparkSession, events_dir: str,
                           window: str = "10 minutes",
                           watermark: str = "30 minutes") -> DataFrame:
    """Watermarked tumbling-window counts per event type."""
    ev = (
        spark.readStream.schema(EVENTS_SCHEMA)
        .parquet(events_dir)
        .withWatermark("ts", watermark)
    )
    return (
        ev.groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(F.count("*").alias("n"),
             F.sum(F.round(F.col("value") * 1e6).cast("long")).alias("sum_value_e6"))
        .select(F.col("w.start").alias("w_start"), F.col("w.end").alias("w_end"),
                "event_type", "n", "sum_value_e6")
    )


def run_stream_to_memory(df: DataFrame, name: str, *, complete: bool = False):
    """Drain a stream into an in-memory table with availableNow (hermetic)."""
    q = (
        df.writeStream.format("memory").queryName(name)
        .outputMode("complete" if complete else "append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return q


def run_frontier_stream(spark: SparkSession, seeds_dir: str, pages: DataFrame,
                        store_root: str, *, config=None, robots: DataFrame | None = None):
    """foreachBatch frontier consumer: every micro-batch of newly arriving
    seed files runs crawl generations through the engine — the streaming
    realization of the generation loop (state lives in the snapshot store,
    so the stream is restartable)."""
    from crawl4ai_spark.engine import CrawlConfig, SparkWebEngine

    cfg = config or CrawlConfig(max_depth=1, max_pages=200)
    engine = SparkWebEngine(spark, store_root)

    seeds_stream = (
        spark.readStream.schema("url string, priority double")
        .option("maxFilesPerTrigger", 8)
        .parquet(seeds_dir)
    )

    def one_batch(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        resume = engine.store.latest_id("frontier") is not None
        if resume:
            # resume reads the frontier from the store and ignores the seeds
            # argument — merge this micro-batch's NEW seeds into the frontier
            # log first so they are crawled too (ADVICE r01 #1)
            engine.enqueue_seeds(batch_df)
        engine.run(pages, batch_df, robots=robots, config=cfg, resume=resume)

    q = (
        seeds_stream.writeStream.foreachBatch(one_batch)
        .option("checkpointLocation", f"{store_root}/_stream_ckpt")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return engine


def stream_sessionize_events(spark: SparkSession, events_dir: str,
                             gap_s: int = 1800) -> DataFrame:
    """Custom STATEFUL streaming operator: gap-based sessionization with
    ``applyInPandasWithState`` — per-user session state (last epoch, session
    ordinal, running aggregates) survives across micro-batches.

    Semantics match the batch ``sessionize_events`` query: a new session
    starts when the gap to the previous event exceeds ``gap_s``. Every
    micro-batch emits the CURRENT aggregate row for each session it touched
    (an update stream keyed by (user_id, session_no) — downstream consumers
    take the latest row per key; asserted against the batch query in
    tests/test_streaming.py)."""
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
    from pyspark.sql.types import LongType, StructField, StructType

    out_schema = StructType([
        StructField("user_id", LongType()),
        StructField("session_no", LongType()),
        StructField("n_events", LongType()),
        StructField("duration_s", LongType()),
        StructField("sum_value_e6", LongType()),
    ])
    # (last_epoch, session_no, n_events, first_epoch, sum_value_e6)
    state_schema = StructType([
        StructField("last_epoch", LongType()),
        StructField("session_no", LongType()),
        StructField("n_events", LongType()),
        StructField("first_epoch", LongType()),
        StructField("sum_value_e6", LongType()),
    ])

    def fold(key, batches, state: GroupState):
        (user_id,) = key
        if state.exists:
            last, sess, n, first, sv = state.get
        else:
            last, sess, n, first, sv = None, 0, 0, None, 0
        touched: dict[int, list] = {}
        rows = []
        for pdf in batches:
            for ts, val in sorted(
                zip(pdf["ts"], pdf["value"]),
                key=lambda x: x[0],
            ):
                epoch = int(pd.Timestamp(ts).timestamp())
                if last is None or epoch - last > gap_s:
                    sess += 1
                    n, first, sv = 0, epoch, 0
                n += 1
                sv += int(round(float(val) * 1e6))
                last = epoch
                touched[sess] = [user_id, sess, n, last - first, sv]
        state.update((last, sess, n, first, sv))
        for row in touched.values():
            rows.append(row)
        yield pd.DataFrame(
            rows, columns=["user_id", "session_no", "n_events",
                           "duration_s", "sum_value_e6"])

    ev = (
        spark.readStream.schema(EVENTS_SCHEMA)
        .parquet(events_dir)
        .select("user_id", "ts", "value")
    )
    return ev.groupBy("user_id").applyInPandasWithState(
        fold, out_schema, state_schema, "append", GroupStateTimeout.NoTimeout
    )


def stream_sessionize_events_tws(spark: SparkSession, events_dir: str,
                                 gap_s: int = 1800,
                                 max_files_per_trigger: int | None = None) -> DataFrame:
    """Gap sessionization on ``transformWithStateInPandas`` — Spark 4's
    successor to ``applyInPandasWithState`` (typed per-key ``ValueState``
    instead of a single state tuple schema, timer support, state TTL).
    Output contract matches :func:`stream_sessionize_events` exactly:
    latest emission per (user_id, session_no) equals the batch
    ``sessionize_events`` row."""
    from pyspark.sql.streaming.stateful_processor import StatefulProcessor

    # TWS state lives in named column families, which only the RocksDB
    # provider supports — the default HDFSBackedStateStoreProvider aborts
    # with UNSUPPORTED_FEATURE.STATE_STORE_MULTIPLE_COLUMN_FAMILIES. RocksDB
    # serves every other stateful operator too, so flipping the session
    # default here is safe (and required for any TWS query).
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state."
        "RocksDBStateStoreProvider")

    class SessionizeTWS(StatefulProcessor):
        def init(self, handle) -> None:
            self.state = handle.getValueState(
                "sess",
                "last_epoch long, session_no long, n_events long, "
                "first_epoch long, sum_value_e6 long",
            )

        def handleInputRows(self, key, rows, timerValues):
            import pandas as pd

            (user_id,) = key
            if self.state.exists():
                last, sess, n, first, sv = tuple(self.state.get())
            else:
                last, sess, n, first, sv = None, 0, 0, None, 0
            touched: dict[int, list] = {}
            for pdf in rows:
                for ts, val in sorted(zip(pdf["ts"], pdf["value"]),
                                      key=lambda x: x[0]):
                    epoch = int(pd.Timestamp(ts).timestamp())
                    if last is None or epoch - last > gap_s:
                        sess += 1
                        n, first, sv = 0, epoch, 0
                    n += 1
                    sv += int(round(float(val) * 1e6))
                    last = epoch
                    touched[sess] = [user_id, sess, n, last - first, sv]
            self.state.update((last, sess, n, first, sv))
            yield pd.DataFrame(
                list(touched.values()),
                columns=["user_id", "session_no", "n_events",
                         "duration_s", "sum_value_e6"])

        def close(self) -> None:
            pass

    reader = spark.readStream.schema(EVENTS_SCHEMA)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    ev = reader.parquet(events_dir).select("user_id", "ts", "value")
    return ev.groupBy("user_id").transformWithStateInPandas(
        statefulProcessor=SessionizeTWS(),
        outputStructType=("user_id long, session_no long, n_events long, "
                          "duration_s long, sum_value_e6 long"),
        outputMode="Append",
        timeMode="None",
    )


def stream_dedup_exact(spark: SparkSession, docs_dir: str) -> DataFrame:
    """Streaming exact dedup: normalize text, hash, keep the FIRST arrival
    per content hash (``dropDuplicates`` keyed on the 16-byte hash — state
    is one hash per distinct document; at production scale bound it with
    ``withWatermark`` + ``dropDuplicatesWithinWatermark`` over the ingest
    timestamp, exactly as the batch ``dedup_exact`` query shuffles once on
    the same hash)."""
    docs = (
        spark.readStream
        .schema("doc_id long, text string, lang string, source string, n_chars long")
        .parquet(docs_dir)
    )
    norm = F.trim(F.regexp_replace(F.lower("text"), r"[^a-z0-9]+", " "))
    return (
        docs.select("doc_id", F.md5(norm).alias("content_hash"))
        .dropDuplicates(["content_hash"])
    )


def stream_corpus_gate(spark: SparkSession, docs_dir: str,
                       rate_e6_by_lang: dict[str, int]) -> DataFrame:
    """Streaming corpus admission: the batch-calibrate / stream-apply
    pattern a production ingest runs. The per-language temperature-
    sampling acceptance rates are computed BATCH-side (the corpus
    aggregate in ``ops/pipelineq.q_resample_temperature``) and broadcast
    into the stream as a literal map; each arriving document is then a
    stateless accept/reject — same deterministic md5(doc_id) 40-bit draw,
    so the streamed verdicts are row-identical to the batch query's kept
    set. No state, no shuffle; scales to any ingest rate."""
    docs = (
        spark.readStream
        .schema("doc_id long, text string, lang string, source string,"
                " n_chars long")
        .parquet(docs_dir)
    )
    pairs = []
    for lang, rate in sorted(rate_e6_by_lang.items()):
        pairs += [F.lit(lang), F.lit(int(rate))]
    rate = F.create_map(*pairs)[F.col("lang")]
    # batch q_resample_temperature drops unmapped languages via an inner
    # join; mirror that here (ADVICE r4) so the streamed verdict set is
    # row-identical to the batch kept set instead of emitting accept=NULL.
    hex10 = "".join(
        f"+ CAST(instr('0123456789abcdef', substring("
        f"md5(CAST(doc_id AS STRING)), {i + 1}, 1)) - 1"
        f" AS BIGINT) * {16 ** (9 - i)}\n" for i in range(10))
    u40 = F.expr("0 " + hex10)
    return docs.select(
        "doc_id", "lang", rate.alias("rate_e6"),
        (u40 * 1_000_000 < rate * F.lit(1_099_511_627_776)).alias("accept")
    ).filter(F.col("rate_e6").isNotNull())


def stream_pii_redact(spark: SparkSession, docs_dir: str) -> DataFrame:
    """Streaming PII redaction: the FineWeb-style scrub
    (``ops/cleanq.q_pii_redact``) applied to an arriving document stream.
    Stateless per-row expressions — no state, no shuffle, any ingest rate;
    the streamed (counts, redacted) rows are row-identical to the batch
    query's, asserted in tests."""
    from crawl4ai_spark.ops.cleanq import (
        EMAIL_RE, IP_RE, PHONE_RE, _pii_text_spark)

    docs = (
        spark.readStream
        .schema("doc_id long, text string, lang string, source string,"
                " n_chars long")
        .parquet(docs_dir)
    )
    out = docs.select("doc_id", F.expr(_pii_text_spark()).alias("pii_text"))
    for name, pat in [("n_emails", EMAIL_RE), ("n_ips", IP_RE),
                      ("n_phones", PHONE_RE)]:
        out = out.withColumn(name, F.size(F.regexp_extract_all(
            "pii_text", F.lit(pat), 0)).cast("long"))
    return out.withColumn(
        "redacted",
        F.regexp_replace(
            F.regexp_replace(
                F.regexp_replace("pii_text", EMAIL_RE, "<EMAIL>"),
                IP_RE, "<IP>"),
            PHONE_RE, "<PHONE>")
    ).select("doc_id", "n_emails", "n_ips", "n_phones", "redacted")


def stream_soft404_gate(spark: SparkSession, docs_dir: str,
                        probe_sig_by_host: dict) -> DataFrame:
    """Streaming soft-404 admission: the batch-calibrate / stream-apply
    pattern over ``ops/trapq.q_soft404_detect``. Per-host probe signatures
    are computed batch-side (``trapq.soft404_probe_signatures`` — one
    nonsense-URL fetch per host) and broadcast into the stream as a
    literal map; each arriving page is then a stateless sign-and-compare
    (the SimHash Arrow stage is per-row, so micro-batching is exact and
    the streamed verdicts are row-identical to the batch query's). Pages
    from hosts missing a probe signature are dropped, mirroring the batch
    inner join (the stream_corpus_gate NULL lesson, ADVICE r4)."""
    from crawl4ai_spark.ops.dedup import simhash_signatures
    from crawl4ai_spark.ops.trapq import (
        _S404_TMPL, SOFT404_HAM_T, SOFT404_HOST_MOD, SOFT404_RATE_MOD)

    docs = (
        spark.readStream
        .schema("doc_id long, text string, lang string, source string,"
                " n_chars long")
        .parquet(docs_dir)
    )
    host = F.concat(F.lit("err"),
                    (F.col("doc_id") % SOFT404_HOST_MOD).cast("string"),
                    F.lit(".example"))
    tmpl = F.concat(F.lit(_S404_TMPL), host)
    pages = docs.select(
        "doc_id",
        F.when(F.col("doc_id") % SOFT404_RATE_MOD < 2,
               F.concat(tmpl, F.lit(" v"), F.col("doc_id").cast("string")))
        .otherwise(F.col("text")).alias("text"))
    sigs = simhash_signatures(pages).withColumn(
        "host", F.concat(F.lit("err"),
                         (F.col("doc_id") % SOFT404_HOST_MOD).cast("string"),
                         F.lit(".example")))
    pairs = []
    for h, sig in sorted(probe_sig_by_host.items()):
        pairs += [F.lit(h), F.lit(int(sig))]
    probe = F.create_map(*pairs)[F.col("host")]
    return (
        sigs.select(
            "doc_id", "host",
            F.bit_count(F.col("simhash60").bitwiseXOR(probe))
            .cast("long").alias("hamming"),
            probe.isNotNull().alias("_mapped"))
        .filter(F.col("_mapped")).drop("_mapped")
        .withColumn("is_soft404", F.col("hamming") <= SOFT404_HAM_T)
    )


def run_incremental_dedup_stream(spark: SparkSession, delta_dir: str,
                                 index_dir: str, out_dir: str):
    """Streaming snapshot admission: re-crawled documents ARRIVE as a
    stream and each micro-batch is verdicted (exact / near / new + min
    match_id) against the PERSISTED base index via foreachBatch running
    the exact batch join logic (``ops/dedup.inc_verdicts``). Per-doc
    verdicts depend only on the doc and the static index, so micro-
    batching is exact: the union of per-batch outputs equals the batch
    verdict set over the full delta (asserted in tests). The production
    shape — the monthly snapshot streams through a fixed-size admission
    job, base text never loads, state lives in the appended verdict
    table (restartable via the checkpoint)."""
    from crawl4ai_spark.ops.dedup import inc_verdicts

    bh = spark.read.parquet(f"{index_dir}/hash")
    bands = spark.read.parquet(f"{index_dir}/bands")
    delta = (
        spark.readStream
        .schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(delta_dir)
    )

    def one_batch(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        (inc_verdicts(batch_df, bh, bands)
         .write.mode("append").parquet(out_dir))

    q = (
        delta.writeStream.foreachBatch(one_batch)
        .option("checkpointLocation", f"{out_dir}/_ckpt")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return q


def stream_token_cms(spark: SparkSession, docs_dir: str) -> DataFrame:
    """Streaming count-min sketch over an arriving document stream: the
    same ``ops/textstats.cms_cells`` grid maintained as a streaming
    aggregate — the CMS's mergeability is exactly what makes this work,
    and the streaming STATE is bounded at CMS_D × CMS_W cells no matter
    how long the stream runs (contrast a streaming per-token count, whose
    state grows with the key space). Complete-mode cells after any number
    of micro-batches equal the batch grid over the same documents,
    asserted in tests with maxFilesPerTrigger=1 forcing multi-batch
    merges."""
    from crawl4ai_spark.ops.textstats import cms_cells

    docs = (
        spark.readStream
        .schema("doc_id long, text string, lang string, source string,"
                " n_chars long")
        .option("maxFilesPerTrigger", 1)
        .parquet(docs_dir)
    )
    toks = docs.select(F.explode(
        F.expr("regexp_extract_all(lower(text), '[a-z0-9]+', 0)")).alias("tok"))
    return cms_cells(toks)


def stream_pages_from_warc(spark: SparkSession, segments_dir: str) -> DataFrame:
    """Continuous Common-Crawl-style ingestion (S12 streaming read): WARC
    segments arriving in a directory become a pages stream — binaryFile
    file-stream source (explicit schema; each new segment is one
    micro-batch input row) → the same per-segment Arrow framing parse as
    the batch ``pages_from_warc``, exploding response records. Stateless;
    compose with ``stream_process_pages``'s extraction select for the
    full live-ingest pipeline."""
    import datetime as _dt

    import pandas as pd

    from crawl4ai_spark.html.warc import parse_warc

    bf = (
        spark.readStream.format("binaryFile")
        .schema("path string, modificationTime timestamp,"
                " length long, content binary")
        .load(segments_dir)
        .select("content")
    )

    def explode_records(batches):
        for pdf in batches:
            out = []
            for blob in pdf["content"]:
                for r in parse_warc(bytes(blob)):
                    if r["warc_type"] != "response":
                        continue
                    ts = _dt.datetime.strptime(
                        r["date"], "%Y-%m-%dT%H:%M:%SZ").replace(
                        tzinfo=_dt.timezone.utc)
                    out.append((r["uri"], ts, r["payload"]))
            yield pd.DataFrame(out, columns=["url", "warc_ts", "html"])

    rec = bf.mapInPandas(explode_records,
                         "url string, warc_ts timestamp, html binary")
    return rec.select(
        "url", "warc_ts", "html",
        F.lit(None).cast("string").alias("text"),
        F.lit(None).cast("string").alias("lang"))


def stream_dsir_gate(spark: SparkSession, docs_dir: str,
                     r_e6_by_bucket: dict[int, int],
                     thr_avg_e6: int) -> DataFrame:
    """Streaming DSIR admission (batch-calibrate / stream-apply, like
    ``stream_corpus_gate``): the 256-bucket importance log-ratio table is
    computed BATCH-side (``ops/bpeq``-style one-shuffle aggregate in
    ``ops/pipelineq.q_dsir_resample``) and inlined into the stream as a
    literal array; each arriving document's hashed-gram average ratio is
    then a stateless in-row fold — identical md5 bucketing and integer
    arithmetic, so a streamed doc's avg_e6 equals the batch query's
    byte-for-byte. Admission uses the calibrated THRESHOLD (the batch
    kept-set's boundary): rank-based top-K is not streamable, so docs
    exactly at the boundary may differ from the batch top-K's doc_id
    tie-break — the standard batch-calibrate granularity trade, documented.
    Grams hashing to buckets unseen in the calibration corpus contribute a
    neutral 0 ratio."""
    from crawl4ai_spark.ops.pipelineq import DSIR_B, _DSIR_OFF, _HEX6

    docs = (
        spark.readStream
        .schema("doc_id long, text string, lang string, source string,"
                " n_chars long")
        .parquet(docs_dir)
    )
    arr = ", ".join(str(int(r_e6_by_bucket.get(b, 0)))
                    for b in range(DSIR_B))
    bucket = "(0 " + _HEX6.format(h="md5(g)") + f") % {DSIR_B}"
    score = (f"aggregate(grams, 0L, (acc, g) -> acc + "
             f"coalesce(element_at(array({arr}), "
             f"cast({bucket} as int) + 1), 0L))")
    return (
        docs.withColumn("toks", F.expr(
            "regexp_extract_all(lower(text), '[a-z0-9]+', 0)"))
        .filter(F.expr("size(toks) >= 2"))
        .withColumn("grams", F.expr(
            "concat(toks, transform(sequence(1, size(toks) - 1),"
            " i -> concat_ws(' ', toks[i-1], toks[i])))"))
        .select(
            "doc_id", "lang",
            F.expr("size(grams)").cast("long").alias("n_grams"),
            F.expr(score).cast("long").alias("score_e6"))
        .withColumn("avg_e6", F.expr(
            f"(score_e6 + n_grams * {_DSIR_OFF}) div n_grams"
            f" - {_DSIR_OFF}"))
        .withColumn("accept", F.col("avg_e6") >= F.lit(int(thr_avg_e6)))
    )


def stream_ppl_gate(spark: SparkSession, docs_dir: str,
                    c12_by_b: list[int], c1_by_b: list[int], v: int,
                    thr_ppl_e6: int) -> DataFrame:
    """Streaming CCNet perplexity admission (batch-calibrate /
    stream-apply, the ``stream_dsir_gate`` pattern): the hash-bucketed
    bigram LM from ``ops/perplexityq.ppl_hashed_lm`` is inlined as two
    literal PPL_B-length arrays + the vocab size, and each arriving
    document's log-perplexity is a stateless in-row fold over its adjacent
    word pairs — identical md5 bucketing, probability-grid quantization,
    and neglog-table arithmetic as the batch twin
    ``q_ccnet_perplexity_hashed``, so a streamed doc's ppl_e6 equals the
    batch value byte-for-byte. Admission keeps docs at or below the
    calibrated threshold (CCNet keeps the low-perplexity head+middle;
    per-language tertile RANKS are not streamable — the threshold is the
    batch tertile boundary, same granularity trade as the DSIR gate)."""
    from crawl4ai_spark.ops.perplexityq import (
        PPL_B,
        PPL_CAP,
        _HEX6,
        _ppl_neglog_values,
    )

    docs = (
        spark.readStream
        .schema("doc_id long, text string, lang string, source string,"
                " n_chars long")
        .parquet(docs_dir)
    )
    c12arr = ", ".join(str(int(c)) for c in c12_by_b)
    c1arr = ", ".join(str(int(c)) for c in c1_by_b)
    nlarr = ", ".join(str(int(x)) for x in _ppl_neglog_values())
    b12 = ("(0 " + _HEX6.format(
        h="md5(concat_ws(' ', toks[i-1], toks[i]))") + f") % {PPL_B}")
    b1 = ("(0 " + _HEX6.format(h="md5(toks[i-1])") + f") % {PPL_B}")
    q = (f"((element_at(array({c12arr}), cast({b12} as int) + 1) + 1)"
         f" * {PPL_CAP})"
         f" div (element_at(array({c1arr}), cast({b1} as int) + 1)"
         f" + {int(v)})")
    score = (f"aggregate(sequence(1, size(toks) - 1), 0L, (acc, i) -> "
             f"acc + element_at(array({nlarr}), cast({q} as int) + 1))")
    return (
        docs.withColumn("toks", F.expr(
            "regexp_extract_all(lower(text), '[a-z0-9]+', 0)"))
        .filter(F.expr("size(toks) >= 2"))
        .select(
            "doc_id", "lang",
            (F.expr("size(toks)") - 1).cast("long").alias("n_bigrams"),
            F.expr(score).cast("long").alias("sum_neglog_e6"))
        .withColumn("ppl_e6", F.expr(
            "CAST(sum_neglog_e6 div n_bigrams AS BIGINT)"))
        .withColumn("accept", F.col("ppl_e6") <= F.lit(int(thr_ppl_e6)))
    )


def run_revalidate_stream(spark: SparkSession, pages_dir: str,
                          validators_dir: str, out_dir: str):
    """Streaming revalidation admission: re-fetched pages ARRIVE as a
    stream and each micro-batch is verdicted against the PERSISTED
    validator index (url, content_md5 — what a ``store_validators=True``
    crawl leaves behind): ``not_modified`` (validator matches — the
    engine's 304 path would reuse the cached result, so downstream
    processing skips the row), ``modified`` (known url, new bytes), or
    ``new`` (never validated). The md5 is JVM-native per row and the
    index join is static-vs-stream, so per-row verdicts depend only on
    the row + the index — micro-batching is exact (streamed union ==
    batch verdict set, asserted in tests). foreachBatch + checkpoint:
    restartable, O(batch) per trigger, index never reloads."""
    validators = (spark.read.parquet(validators_dir)
                  .select("url", F.col("content_md5").alias("v_md5"))
                  .dropDuplicates(["url", "v_md5"]))
    pages = (
        spark.readStream
        .schema("url string, html binary")
        .option("maxFilesPerTrigger", 1)
        .parquet(pages_dir)
    )

    def one_batch(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        cur = batch_df.withColumn("content_md5", F.md5("html"))
        hit = (cur.join(validators,
                        (cur["url"] == validators["url"])
                        & (cur["content_md5"] == validators["v_md5"]),
                        "left_semi")
               .select("url", "content_md5")
               .withColumn("verdict", F.lit("not_modified")))
        known = validators.select("url").distinct()
        miss = cur.join(hit.select("url"), "url", "left_anti") \
                  .select("url", "content_md5")
        modified = miss.join(known, "url", "left_semi") \
                       .withColumn("verdict", F.lit("modified"))
        new = miss.join(known, "url", "left_anti") \
                  .withColumn("verdict", F.lit("new"))
        (hit.unionByName(modified).unionByName(new)
         .write.mode("append").parquet(out_dir))

    q = (
        pages.writeStream.foreachBatch(one_batch)
        .option("checkpointLocation", f"{out_dir}/_ckpt")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return q


def stream_sitemap_reconcile(spark: SparkSession, sitemap_dir: str,
                             crawled: DataFrame) -> DataFrame:
    """Streaming half of sitemap reconciliation (ops/refreshq.py
    reconcile_sitemap): advertised (url, lastmod_day) entries ARRIVE as
    a stream — a fleet tailing thousands of hosts' sitemaps — and each
    is verdicted against the STATIC crawl store: missing / stale /
    fresh, plus the ``recrawl`` scheduler bit. Stream-static left join,
    stateless, so per-row verdicts depend only on the row + the store
    and the streamed verdict set is row-identical to the batch
    reconcile restricted to advertised rows (tested). ``orphaned`` is a
    property of the static side alone (crawled urls ABSENT from the
    advertised set) — it cannot be decided row-locally on a stream and
    stays a batch verdict by design."""
    adv = (
        spark.readStream
        .schema("url string, lastmod_day int")
        .parquet(sitemap_dir)
    )
    cr = crawled.select("url", "fetch_day").dropDuplicates(["url"])
    return (adv.join(cr, "url", "left")
            .withColumn("verdict", F.expr(
                "CASE WHEN fetch_day IS NULL THEN 'missing'"
                " WHEN lastmod_day > fetch_day THEN 'stale'"
                " ELSE 'fresh' END"))
            .withColumn("recrawl",
                        F.expr("verdict IN ('missing', 'stale')")))


def stream_decontaminate_gate(spark: SparkSession, docs_dir: str,
                              bench_grams: list[str]) -> DataFrame:
    """Streaming benchmark-decontamination admission: the batch-calibrate /
    stream-apply twin of ``ops/pipelineq.q_decontaminate``. The held-out
    eval set's distinct word n-grams are computed BATCH-side and broadcast
    into the stream as one literal array; each arriving corpus document
    then computes its own distinct grams in-row (the exact batch
    expression) and counts collisions via ``array_intersect`` — a
    STATELESS per-row verdict, no streaming aggregate, no state, no
    shuffle (the C4-gate discipline: when everything the verdict needs
    lives in the doc's own row, higher-order array expressions replace the
    join+groupBy). ``accept`` = zero eval-gram overlap — the Lee et al. /
    GPT-3 contamination rule applied at ingest time. At a benchmark set
    too large for a literal array, swap the intersect for a broadcast
    Bloom membership column — the verdict stays row-local either way.

    Streamed (doc_id, n_grams, n_hits) rows are row-identical to the
    batch query's contaminated set (tested), and accept mirrors its
    complement over the corpus docs."""
    from crawl4ai_spark.ops.pipelineq import DECON_BENCH_MOD, DECON_N

    docs = (
        spark.readStream
        .schema("doc_id long, text string, lang string, source string,"
                " n_chars long")
        .parquet(docs_dir)
    )
    toks = F.expr("regexp_extract_all(lower(text), '[a-z0-9]+', 0)")
    bench = F.lit(sorted(bench_grams))
    return (
        docs.filter(F.col("doc_id") % DECON_BENCH_MOD != 0)
        .select("doc_id", toks.alias("toks"))
        # an ADMISSION gate must verdict every arriving doc: documents too
        # short to form a single n-gram cannot be contaminated, so they
        # pass with n_grams = 0 rather than silently vanishing (the batch
        # q_decontaminate reports only contaminated docs, so its
        # size-filter exclusion is harmless THERE — not here)
        .select("doc_id", F.expr(
            f"CASE WHEN size(toks) >= {DECON_N} THEN"
            f" array_distinct(transform(sequence(1, size(toks) - {DECON_N - 1}),"
            f" i -> array_join(slice(toks, i, {DECON_N}), ' ')))"
            f" ELSE array() END"
        ).alias("grams"))
        .select("doc_id",
                F.size("grams").cast("long").alias("n_grams"),
                F.size(F.array_intersect("grams", bench))
                 .cast("long").alias("n_hits"))
        .withColumn("accept", F.col("n_hits") == 0)
    )


def stream_c4_gate(spark: SparkSession, docs_dir: str) -> DataFrame:
    """Streaming C4 admission: arriving documents pass the full C4 rule
    set (ops/cleanq.py q_c4_clean — injected sentence structure, line
    rules, lorem/brace/min-sentence doc rules) as a STATELESS per-row
    verdict — every derived line lives inside the document's own row, so
    the whole gate is higher-order array expressions (transform/filter/
    exists), no streaming aggregate, no state, no shuffle. The streamed
    keep set is row-identical to the batch query's (tested across >=2
    micro-batches)."""
    from crawl4ai_spark.ops.cleanq import (
        C4_LINE_W,
        C4_MIN_SENTS,
        C4_MIN_WORDS,
        _C4H2,
    )

    docs = (
        spark.readStream
        .schema("doc_id long, text string, lang string, source string,"
                " n_chars long")
        .parquet(docs_dir)
    )
    md = "md5(concat(CAST(doc_id AS STRING), ':', CAST(ln AS STRING)))"
    t2 = _C4H2.format(h=md, a=1, b=2)
    j2 = _C4H2.format(h=md, a=3, b=4)
    line_expr = f"""
      transform(
        sequence(CAST(0 AS BIGINT), (size(split(text, ' ')) - 1)
                   div {C4_LINE_W}),
        ln -> concat(
          CASE WHEN {j2} < 8 THEN concat(
                 CASE WHEN doc_id % 97 = 0 AND ln = 0
                      THEN concat(array_join(slice(split(text, ' '),
                             CAST(ln * {C4_LINE_W} + 1 AS INT),
                             {C4_LINE_W}), ' '), ' lorem ipsum')
                      WHEN doc_id % 89 = 0 AND ln = 1
                      THEN concat(array_join(slice(split(text, ' '),
                             CAST(ln * {C4_LINE_W} + 1 AS INT),
                             {C4_LINE_W}), ' '), ' {{')
                      ELSE array_join(slice(split(text, ' '),
                             CAST(ln * {C4_LINE_W} + 1 AS INT),
                             {C4_LINE_W}), ' ') END, ' javascript')
               ELSE CASE WHEN doc_id % 97 = 0 AND ln = 0
                      THEN concat(array_join(slice(split(text, ' '),
                             CAST(ln * {C4_LINE_W} + 1 AS INT),
                             {C4_LINE_W}), ' '), ' lorem ipsum')
                      WHEN doc_id % 89 = 0 AND ln = 1
                      THEN concat(array_join(slice(split(text, ' '),
                             CAST(ln * {C4_LINE_W} + 1 AS INT),
                             {C4_LINE_W}), ' '), ' {{')
                      ELSE array_join(slice(split(text, ' '),
                             CAST(ln * {C4_LINE_W} + 1 AS INT),
                             {C4_LINE_W}), ' ') END END,
          CASE WHEN {t2} < 154 THEN '.'
               WHEN {t2} < 180 THEN '?' ELSE '' END))
    """
    return (
        docs.withColumn("__lines", F.expr(line_expr))
        .withColumn("keep", F.expr(f"""
            NOT exists(__lines, l -> l LIKE '%lorem ipsum%')
            AND NOT exists(__lines, l -> l LIKE '%{{%')
            AND size(filter(__lines, l ->
                  l rlike '[.?]$' AND size(split(l, ' '))
                    >= {C4_MIN_WORDS}
                  AND NOT l LIKE '%javascript%')) >= {C4_MIN_SENTS}"""))
        .select("doc_id", "keep")
    )


def stream_politeness_aimd(spark: SparkSession, events_dir: str) -> DataFrame:
    """Stateful streaming AIMD rate control: per-host controller state
    (observation count, failure count F, 2^F-weighted success mass S)
    survives across micro-batches via ``applyInPandasWithState``, and
    each arriving fetch outcome emits the host's updated rate — the
    deferred-floor closed form of the batch ``politeness_aimd`` query
    (ops/scheduling.py), so with in-order per-host arrival (the
    ingestion contract for fetch outcomes) the streamed rows are
    row-identical to the batch query's (tested across >=2
    micro-batches). State is 3 integers per host, bounded forever."""
    import hashlib as _hl

    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
    from pyspark.sql.types import LongType, StructField, StructType

    from crawl4ai_spark.ops.scheduling import (
        AIMD_A,
        AIMD_MAX,
        AIMD_MAXV,
        AIMD_MIN,
        AIMD_R0,
    )

    out_schema = StructType([
        StructField("host_id", LongType()),
        StructField("event_id", LongType()),
        StructField("visit", LongType()),
        StructField("fail", LongType()),
        StructField("n_failures", LongType()),
        StructField("rate", LongType()),
        StructField("delay_ms", LongType()),
    ])
    state_schema = StructType([
        StructField("n_seen", LongType()),
        StructField("f_cum", LongType()),
        StructField("s_cum", LongType()),
    ])

    def fold(key, batches, state: GroupState):
        (host_id,) = key
        n, f, s = state.get if state.exists else (0, 0, 0)
        rows = []
        for pdf in batches:
            for eid in sorted(int(e) for e in pdf["event_id"]):
                if n >= AIMD_MAXV:
                    continue
                n += 1
                fail = int(_hl.md5(str(eid).encode())
                           .hexdigest()[:2], 16) < 64
                if fail:
                    f += 1
                else:
                    s += 1 << f
                rate = max(AIMD_MIN, min(AIMD_MAX,
                                         (AIMD_R0 + AIMD_A * s) >> f))
                rows.append([host_id, eid, n, int(fail), f, rate,
                             1_000_000 // max(rate, 1)])
        state.update((n, f, s))
        yield pd.DataFrame(rows, columns=[
            "host_id", "event_id", "visit", "fail", "n_failures",
            "rate", "delay_ms"])

    ev = (
        spark.readStream.schema(EVENTS_SCHEMA)
        .parquet(events_dir)
        .select(F.expr("user_id % 40").alias("host_id"), "event_id")
    )
    return ev.groupBy("host_id").applyInPandasWithState(
        fold, out_schema, state_schema, "append",
        GroupStateTimeout.NoTimeout)
