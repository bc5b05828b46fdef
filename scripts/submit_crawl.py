"""spark-submit entrypoint for the crawl engine (north rule: `spark-submit
--py-files` on a multi-executor cluster).

    zip -r crawl4ai_spark.zip crawl4ai_spark
    spark-submit --py-files crawl4ai_spark.zip scripts/submit_crawl.py \
        --pages /data/pages_parquet --seeds /data/seeds_parquet \
        --store /data/crawl_store --max-pages 100000 --max-depth 6 \
        [--resume] [--policy best_first] [--quota 10]

Reads pages/seeds tables, runs the generation loop (resumable from the
latest snapshot set), and leaves results/frontier/host_state/metrics
snapshots under --store.
"""

from __future__ import annotations

import argparse


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--pages", required=True)
    ap.add_argument("--seeds", required=True)
    ap.add_argument("--robots", default=None)
    ap.add_argument("--store", required=True)
    ap.add_argument("--max-pages", type=int, default=100_000)
    ap.add_argument("--max-depth", type=int, default=6)
    ap.add_argument("--policy", default="bfs", choices=["bfs", "dfs", "best_first"])
    ap.add_argument("--quota", type=int, default=10)
    ap.add_argument("--resume", action="store_true")
    ap.add_argument("--use-bloom", action="store_true")
    # F13/F14 generation-batch admission (operators/dispatch.py)
    ap.add_argument("--dispatcher", default=None,
                    choices=["memory_adaptive", "semaphore"])
    ap.add_argument("--batch-size", type=int, default=None,
                    help="per-generation URL cap (semaphore count / "
                         "memory-adaptive base batch)")
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    from crawl4ai_spark.engine import CrawlConfig, SparkWebEngine

    spark = SparkSession.builder.appName("crawl4ai_spark_submit").getOrCreate()
    pages = spark.read.parquet(args.pages)
    seeds = spark.read.parquet(args.seeds)
    robots = spark.read.parquet(args.robots) if args.robots else None

    engine = SparkWebEngine(spark, args.store)
    results = engine.run(
        pages, seeds, robots=robots, resume=args.resume,
        config=CrawlConfig(
            max_depth=args.max_depth, max_pages=args.max_pages,
            policy=args.policy, per_host_quota=args.quota,
            use_bloom=args.use_bloom,
            batch_size=args.batch_size,
            dispatcher=args.dispatcher,
            dispatcher_opts=(
                {"semaphore_count": args.batch_size}
                if args.dispatcher == "semaphore" and args.batch_size
                else {}),
        ),
    )
    n = results.count()
    print(f"crawl done: {n} result rows under {args.store}")


if __name__ == "__main__":
    main()
