"""Scale-linearity probe for the r4 corpus operators.

Replicates the sf0.1 documents/embeddings tables Rx with per-replica
doc_id/vec_id offsets and a replica tag prepended to the text (so replicas
share almost every >=40-char substring with their original — the WORST
case for substring dedup: nearly every position of the scaled corpus is
duplicated), then times the heavy r4 operators at 1x and Rx on the same
local[32] session. A linear operator should scale ~R in wall; anything
super-linear is a red flag for the 100 TB claim.

Usage: python scripts/scale_probe_r4.py [R]   (default 10)
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402

from crawl4ai_spark.session import get_spark  # noqa: E402

SRC = "/root/testdata/sf0.1"
ROOT = "/tmp/scale_probe_r4"

# dedup_semantic is deliberately NOT probed at fixed K: with K=8 pinned
# by the oracle, cell size grows ~linearly with the corpus and the
# within-cell pair join grows quadratically — SemDeDup's own scaling
# contract is K proportional to N (cell size bounded), which the pinned-K
# oracle form cannot express. Documented in SURVEY §8.
PROBES = ["dedup_spans", "decontaminate", "gopher_filter",
          "resample_temperature", "pack_sequences"]


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
    return out


def main() -> None:
    r = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    spark = get_spark("scale_probe_r4", master="local[32]",
                      shuffle_partitions=64)
    from crawl4ai_spark.ops import registry_full
    queries, _ = registry_full()

    one = build_replica(spark, 1)
    big = build_replica(spark, r)
    out = {"replication": r, "probes": {}}
    for name in PROBES:
        times = {}
        for tag, d in (("1x", one), (f"{r}x", big)):
            t0 = time.time()
            n = queries[name](spark, d).count()
            times[tag] = {"seconds": round(time.time() - t0, 2), "rows": n}
        ratio = times[f"{r}x"]["seconds"] / max(times["1x"]["seconds"], 1e-9)
        times["wall_ratio"] = round(ratio, 2)
        out["probes"][name] = times
        print(name, json.dumps(times), flush=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
