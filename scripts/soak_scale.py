"""sf1 scale soak — demonstrate the "designed for 100×" claims at 10×.

VERDICT r02 next-round #1: the correctness program is done; convert
"designed for 100×" into "demonstrated at 10×". Two workloads, each run at
the canonical bench shape (sf0.1-equivalent) AND at 10× that scale, so the
scaling exponent is measured, not asserted:

A. Engine full-drain: crawl an entire synthetic corpus to frontier
   exhaustion (depth-8 BFS, quota 31, delta-Bloom URL-seen, auto-compaction
   on). r2 canonical: 158,720 pages (5,120 hosts × 31). sf1: 1,587,200
   pages (51,200 hosts × 31). Reports total wall, urls/s, and the
   per-generation (batch, wall) curve from the engine's own metrics table —
   stragglers and any superlinear generation show up as curve bends.

B. Dedup at 10× documents: dedup_pipeline (exact → bands → verify →
   verdict) and the vectorized minhash band-candidate path over a corpus
   tiled from /root/testdata/sf0.1 documents ×10 with per-shard salt tokens
   appended — shards stay near-dups of each other (Jaccard ≈ 0.9+), so the
   10× corpus carries realistic mirror-site duplication: ~10-doc clusters,
   quadratic-in-cluster candidate growth the verify stage must absorb.

Usage:
  python scripts/soak_scale.py [--cores 32] [--tier sf01|sf1|both]
  python scripts/soak_scale.py --engine-only | --dedup-only

Prints one JSON line per completed phase and a final combined JSON
(recorded in BENCH/BASELINE.md).
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

SOAK_ROOT = "/tmp/spark_graft_soak"


def drain(spark, n_hosts: int, pph: int, tag: str) -> dict:
    from pyspark.sql import functions as F

    from crawl4ai_spark.engine import CrawlConfig, SparkWebEngine
    from crawl4ai_spark.sources.pagesgen import generate_pages, generate_seeds

    pages = generate_pages(spark, n_hosts, pph,
                           partitions=min(256, max(32, n_hosts // 128)))
    pages = pages.persist()
    n_pages = pages.count()
    seeds = generate_seeds(spark, n_hosts)
    store = tempfile.mkdtemp(dir=SOAK_ROOT, prefix=f"drain_{tag}_")
    t0 = time.time()
    eng = SparkWebEngine(spark, store)
    res = eng.run(pages, seeds,
                  config=CrawlConfig(max_depth=8, max_pages=1 << 30,  # unbounded: engine drops the TakeOrdered cap,
                                     per_host_quota=31, use_bloom=True,
                                     check_robots_txt=False))
    n_urls = res.count()
    wall = time.time() - t0
    gens = [
        (int(r.generation), int(r.n_scheduled), float(r.wall_secs))
        for r in (eng.metrics()
                  .select("generation", "n_scheduled", "wall_secs")
                  .distinct().orderBy("generation").collect())
    ]
    pages.unpersist()
    shutil.rmtree(store, ignore_errors=True)
    out = {
        "phase": f"engine_drain_{tag}", "n_pages": n_pages,
        "n_urls_scheduled": n_urls, "wall_s": round(wall, 1),
        "urls_per_sec": round(n_urls / wall, 1),
        "generations": [
            {"gen": g, "batch": n, "wall_s": round(w, 1),
             "urls_per_sec": round(n / w, 1) if w else None}
            for g, n, w in gens],
        # r4 (VERDICT r03 #8): per-stage breakdown of the LAST generations,
        # so a drain-tail anomaly (the unexplained sf0.1 105 s generation in
        # SOAK_r03) is attributable to a stage, not guessed at
        "tail_profile": eng.gen_profile[-4:],
    }
    print(json.dumps(out))
    return out


def build_docs_tiled(spark, shards: int, out_dir: str) -> int:
    """documents table = sf0.1 docs × shards, shard k appending k salt
    tokens — cross-shard near-dups (mirror-site analog)."""
    from pyspark.sql import functions as F
    base = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
    n_base = base.count()
    tiled = (
        base.crossJoin(spark.range(shards).select(F.col("id").alias("shard")))
        .select(
            (F.col("doc_id") + F.col("shard") * (10 * n_base)).alias("doc_id"),
            F.when(F.col("shard") == 0, F.col("text")).otherwise(
                F.concat_ws(" ", "text",
                            F.concat(F.lit("mirrorsalt"), F.col("shard"),
                                     F.lit("x"), F.col("doc_id")))
            ).alias("text"),
            "lang", "source",
            F.length("text").alias("n_chars"),
        )
    )
    tiled.repartition(32).write.mode("overwrite").parquet(
        os.path.join(out_dir, "documents.parquet"))
    return n_base * shards


def dedup_suite(spark, sf_dir: str, n_docs: int, tag: str) -> dict:
    from crawl4ai_spark.ops.dedup import (
        q_dedup_minhash_bands2,
        q_dedup_minhash_bands_fast,
    )
    from crawl4ai_spark.ops.perplexityq import q_ccnet_perplexity
    from crawl4ai_spark.ops.pipelineq import (
        q_corpus_datacard_full,
        q_corpus_ledger,
        q_dedup_pipeline,
    )

    out = {"phase": f"dedup_{tag}", "n_docs": n_docs}
    # corpus_ledger = the full composed pipeline verdict (VERDICT r04
    # next-round #7: measure the capstone's 10x behavior like its parts);
    # corpus_datacard_full adds the DSIR stage + BPE-token accounting
    # (vocab broadcast), so the late-r5 composition is soaked too
    for name, fn in [("minhash_bands2", q_dedup_minhash_bands2),
                     ("minhash_bands_fast", q_dedup_minhash_bands_fast),
                     ("dedup_pipeline", q_dedup_pipeline),
                     ("corpus_ledger", q_corpus_ledger),
                     ("corpus_datacard_full", q_corpus_datacard_full),
                     ("ccnet_perplexity", q_ccnet_perplexity)]:
        t0 = time.time()
        n = fn(spark, sf_dir).count()
        wall = time.time() - t0
        out[name] = {"wall_s": round(wall, 1), "rows": n,
                     "docs_per_sec": round(n_docs / wall, 1)}
    print(json.dumps(out))
    return out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--cores", type=int,
                    default=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    ap.add_argument("--tier", choices=["sf01", "sf1", "both"], default="both")
    ap.add_argument("--engine-only", action="store_true")
    ap.add_argument("--dedup-only", action="store_true")
    args = ap.parse_args()

    os.makedirs(SOAK_ROOT, exist_ok=True)
    # 32 executor threads in one local JVM + a cached 1.6M-page corpus:
    # the 8g default heap OOMs; the soak box has 128 GiB
    os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "64g")
    from crawl4ai_spark.session import get_spark
    spark = get_spark("soak_scale", master=f"local[{args.cores}]",
                      shuffle_partitions=max(32, args.cores))
    spark.sparkContext.setLogLevel("ERROR")

    report: dict = {"cores": args.cores, "phases": []}
    tiers = {"sf01": [("sf01", 5_120, 1)], "sf1": [("sf1", 51_200, 10)],
             "both": [("sf01", 5_120, 1), ("sf1", 51_200, 10)]}[args.tier]

    for tag, hosts, shards in tiers:
        if not args.dedup_only:
            report["phases"].append(drain(spark, hosts, 31, tag))
        if not args.engine_only:
            docs_dir = os.path.join(SOAK_ROOT, f"docs_{tag}")
            n_docs = build_docs_tiled(spark, shards, docs_dir)
            report["phases"].append(dedup_suite(spark, docs_dir, n_docs, tag))

    print(json.dumps(report))
    with open(os.path.join(SOAK_ROOT, "soak_report.json"), "w") as f:
        json.dump(report, f, indent=1)


if __name__ == "__main__":
    main()
