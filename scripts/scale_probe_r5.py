"""r5 scale probe: wall time AND shuffle bytes (VERDICT r4 asked for
SparkListener/plan metrics, not just wall).

Measures, per probed operator, the total shuffle-write bytes of every job
the query ran (AppStatusStore.lastStageAttempt over the stages of the jobs
recorded by the status tracker) at 1x and Rx corpus replication — the
replicas share almost every >=40-char substring with their original, the
worst case for substring dedup.

Includes the A/B the r5 change is about: `dedup_spans` (hashed 8-byte
shuffle key + exact verify join, ops/dedup.py) vs `dedup_spans_rawkey`
(the r4 form that shuffled the raw 40-char substring, inlined here as the
reference variant so the delta is measured on the same session/corpus).

Usage: python scripts/scale_probe_r5.py [R]   (default 10)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import DataFrame, SparkSession, Window  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from crawl4ai_spark.session import get_spark  # noqa: E402
from crawl4ai_spark.ops.common import tbl  # noqa: E402
from crawl4ai_spark.ops.dedup import SPAN_K  # noqa: E402

SRC = "/root/testdata/sf0.1"
ROOT = "/tmp/scale_probe_r4"  # shares the r4 replica cache

PROBES = ["dedup_spans", "dedup_spans_fast128", "decontaminate",
          "gopher_filter", "resample_temperature", "pack_sequences",
          "corpus_ledger", "dedup_semantic_auto"]

# (r5 continuation) probes whose output columns must be checksummed —
# under a bare count() Catalyst prunes the rank/verdict computation away
# (aggregate right sides are provably unique on the join key), the
# clean_dup_lines trap documented in NOTES.md.
FORCE_SUM = {
    "events_trustrank": "trust_e6",
    "events_labelprop": "community",
    "soft404_detect": "hamming",
    "shard_rendezvous": "shard_n * 31 + shard_n1",
    "mime_sniff": "n_bytes",
    # (r5 session 3 additions)
    "events_salsa": "salsa_authority_e6 + salsa_hub_e6",
    "events_triangles": "n_tri * 31 + cc_e6",
    "events_assortativity": "r_e6",
    "domain_gini": "gini_docs_e6 + gini_chars_e6",
    "index_ef_size": "ef_bits + gamma_bits + delta_bits",
    "index_blockmax_topk": "score_e6",
    "index_snippets": "length(snippet)",
    "dedup_minhash_bbit": "est_bbit_e6 * 31 + n_match_full",
    "multimodal_gif": "pixel_sum",
    "events_modularity": "q_e6 * 31 + in_arcs",
    "vocab_chao1": "chao1_e6",
}


def _spans_tail(pos: DataFrame) -> DataFrame:
    w = Window.partitionBy("doc_id").orderBy("pos")
    isl = (
        pos.withColumn("gap",
                       F.when(F.col("pos") - F.lag("pos").over(w) <= SPAN_K,
                              F.lit(0)).otherwise(F.lit(1)))
        .withColumn("island", F.sum("gap").over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    )
    return (
        isl.groupBy("doc_id", "island")
        .agg(F.min("pos").alias("span_start"),
             (F.max("pos") + SPAN_K - 1).alias("span_end"))
        .select("doc_id", "span_start", "span_end",
                (F.col("span_end") - F.col("span_start") + 1)
                .alias("span_len"))
    )


def dedup_spans_rawkey(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The r4 form (raw 40-char substring as the shuffle key) — kept ONLY
    as the probe's A/B reference; production is ops/dedup.q_dedup_spans."""
    d = tbl(spark, sf_dir, "documents")
    sh = (
        d.filter(F.length("text") >= SPAN_K)
        .select("doc_id",
                F.explode(F.expr(
                    f"sequence(1L, length(text) - {SPAN_K} + 1)")).alias("pos"),
                "text")
        .select("doc_id", "pos",
                F.expr(f"substring(text, pos, {SPAN_K})").alias("s"))
    )
    dup = (sh.groupBy("s")
           .agg(F.countDistinct("doc_id").alias("nd"))
           .filter(F.col("nd") >= 2).select("s"))
    pos = sh.join(dup, "s").select("doc_id", "pos")
    return _spans_tail(pos)


def shuffle_bytes_of(spark: SparkSession, fn) -> tuple[float, int, int, int]:
    """Run fn() and return (wall_s, rows, shuffle_write_bytes, read_bytes)
    summed over the stages of the jobs it triggered."""
    sc = spark.sparkContext
    st = sc.statusTracker()
    before = set(st.getJobIdsForGroup(None) or [])
    t0 = time.time()
    rows = fn()
    wall = time.time() - t0
    store = sc._jsc.sc().statusStore()
    w = r = 0
    for jid in set(st.getJobIdsForGroup(None) or []) - before:
        info = st.getJobInfo(jid)
        if info is None:
            continue
        for sid in info.stageIds:
            try:
                s = store.lastStageAttempt(sid)
            except Exception:
                continue  # skipped stage (reused exchange) — no attempt
            w += s.shuffleWriteBytes()
            r += s.shuffleReadBytes()
    return wall, rows, w, r


def build_replica(spark, r: int) -> str:
    out = os.path.join(ROOT, f"x{r}")
    if os.path.exists(os.path.join(out, "documents.parquet")):
        return out
    os.makedirs(out, exist_ok=True)
    docs = spark.read.parquet(f"{SRC}/documents.parquet")
    emb = spark.read.parquet(f"{SRC}/embeddings.parquet")
    n_docs = docs.count()
    n_vecs = emb.count()
    reps = spark.range(r).select(F.col("id").alias("rep"))
    big_docs = (docs.crossJoin(reps)
                .select((F.col("doc_id") + F.col("rep") * n_docs)
                        .alias("doc_id"),
                        F.when(F.col("rep") == 0, F.col("text"))
                        .otherwise(F.concat(F.lit("rep"), F.col("rep"),
                                            F.lit(" "), F.col("text")))
                        .alias("text"),
                        "lang", "source", "n_chars"))
    big_emb = (emb.crossJoin(reps)
               .select((F.col("vec_id") + F.col("rep") * n_vecs)
                       .alias("vec_id"), "embedding"))
    big_docs.repartition(32).write.mode("overwrite") \
        .parquet(os.path.join(out, "documents.parquet"))
    big_emb.repartition(32).write.mode("overwrite") \
        .parquet(os.path.join(out, "embeddings.parquet"))
    _ensure_events_replica(spark, out, r)
    return out


def _ensure_events_replica(spark, out: str, r: int) -> None:
    """events replica for the graph probes: R× users (disjoint user_id
    namespaces) over the SAME page-id space — edges grow R×, the node set
    stays fixed, the realistic growth mode for a click graph."""
    path = os.path.join(out, "events.parquet")
    if os.path.exists(path):
        return
    ev = spark.read.parquet(f"{SRC}/events.parquet")
    n_users = ev.agg(F.max("user_id")).collect()[0][0] + 1
    n_events = ev.count()
    reps = spark.range(r).select(F.col("id").alias("rep"))
    big = (ev.crossJoin(reps)
           .select((F.col("event_id") + F.col("rep") * n_events)
                   .alias("event_id"), "ts",
                   (F.col("user_id") + F.col("rep") * n_users)
                   .alias("user_id"),
                   "event_type", "value", "props"))
    big.repartition(32).write.mode("overwrite").parquet(path)


def probe_incremental_fixed_delta(spark: SparkSession, one: str, big: str,
                                  r: int) -> dict:
    """THE incremental-dedup scale claim: a FIXED delta probed against the
    persisted index of a base that grows R×. Production shape — the index
    (md5 table + band keys, ~80 B/doc) is written once per snapshot; the
    per-snapshot cost is the probe, which must stay ~flat as the base
    grows because both probes are equi-joins whose delta side is fixed."""
    from crawl4ai_spark.ops.dedup import (
        _inc_snapshot_split, inc_index_frames, inc_verdicts)

    _, delta = _inc_snapshot_split(spark, one)  # FIXED across base sizes
    delta = delta.cache()
    delta.count()
    out = {}
    for tag, d in (("1x", one), (f"{r}x", big)):
        base = (spark.read.parquet(f"{d}/documents.parquet")
                .filter(F.col("doc_id") % 4 != 0).select("doc_id", "text"))
        idx = os.path.join(ROOT, f"inc_index_{tag}")
        bh, bands = inc_index_frames(base)
        t0 = time.time()
        if not os.path.exists(os.path.join(idx, "_done")):
            bh.write.mode("overwrite").parquet(os.path.join(idx, "hash"))
            bands.write.mode("overwrite").parquet(os.path.join(idx, "bands"))
            open(os.path.join(idx, "_done"), "w").write("ok")
        index_wall = time.time() - t0
        bh_p = spark.read.parquet(os.path.join(idx, "hash"))
        bands_p = spark.read.parquet(os.path.join(idx, "bands"))

        def _force():
            # count() alone lets Catalyst ELIMINATE the verdict left joins
            # (right sides are unique on doc_id — the clean_dup_lines probe
            # trap, NOTES.md): checksum every output column instead.
            df = inc_verdicts(delta, bh_p, bands_p)
            row = df.agg(
                F.count("*").alias("n"),
                F.expr("bit_xor(xxhash64(doc_id, verdict, "
                       "coalesce(match_id, -1L)))").alias("chk")
            ).collect()[0]
            return row["n"]

        wall, rows, w, rd = shuffle_bytes_of(spark, _force)
        out[tag] = {"index_build_s": round(index_wall, 2),
                    "probe_s": round(wall, 2), "delta_rows": rows,
                    "shuffle_write_mb": round(w / 1e6, 1),
                    "shuffle_read_mb": round(rd / 1e6, 1)}
    out["probe_wall_ratio"] = round(
        out[f"{r}x"]["probe_s"] / max(out["1x"]["probe_s"], 1e-9), 2)
    delta.unpersist()
    return out


def main() -> None:
    r = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    only = sys.argv[2:] or None
    spark = get_spark("scale_probe_r5", master="local[32]",
                      shuffle_partitions=64)
    from crawl4ai_spark.ops import registry_full
    queries, _ = registry_full()
    queries = dict(queries)
    queries["dedup_spans_rawkey"] = dedup_spans_rawkey

    one = build_replica(spark, 1)
    big = build_replica(spark, r)
    out = {"replication": r, "probes": {}}
    probes = only or (PROBES + ["dedup_spans_rawkey"])
    for name in probes:
        if name == "dedup_incremental_fixed_delta":
            times = probe_incremental_fixed_delta(spark, one, big, r)
            out["probes"][name] = times
            print(name, json.dumps(times), flush=True)
            continue
        if name not in queries:
            print(f"skip {name}: not in registry", flush=True)
            continue
        times = {}
        for tag, d in (("1x", one), (f"{r}x", big)):
            if name in FORCE_SUM:
                expr = FORCE_SUM[name]

                def _run(q=queries[name], d=d, expr=expr):
                    row = q(spark, d).agg(
                        F.count("*").alias("n"),
                        F.sum(F.expr(expr)).alias("chk")).collect()[0]
                    return row["n"]

                wall, rows, w, rd = shuffle_bytes_of(spark, _run)
            else:
                wall, rows, w, rd = shuffle_bytes_of(
                    spark, lambda: queries[name](spark, d).count())
            times[tag] = {"seconds": round(wall, 2), "rows": rows,
                          "shuffle_write_mb": round(w / 1e6, 1),
                          "shuffle_read_mb": round(rd / 1e6, 1)}
        times["wall_ratio"] = round(
            times[f"{r}x"]["seconds"] / max(times["1x"]["seconds"], 1e-9), 2)
        times["shuffle_ratio"] = round(
            times[f"{r}x"]["shuffle_write_mb"]
            / max(times["1x"]["shuffle_write_mb"], 1e-9), 2)
        out["probes"][name] = times
        print(name, json.dumps(times), flush=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
