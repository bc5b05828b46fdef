"""Redirect-chain resolution by pointer doubling + an engine hook.

Crawls meet 3xx chains constantly (http→https, www-canonicalization, moved
content); the reference records the landing URL per result
(`CrawlResult.redirected_url`, /root/reference/crawl4ai/models.py:151) but
follows chains inside the browser. A Spark frontier must resolve the
redirect MAP itself before fetching — and naive per-hop iteration is
O(longest chain) rounds. This operator uses POINTER DOUBLING (the classic
parallel list-ranking trick, also the large-star/small-star engine of
`ops/clusterq.py`): each round jumps every pointer to its pointer's target,
so J rounds resolve chains up to 2^J hops — O(log chain) equi-joins total,
each shuffling only the (src, dst, hops) map, never page bodies.

Cycle handling: redirect loops exist in the wild (and crash naive
followers). After the final round, any source whose landing node still has
an outgoing edge cannot terminate within 2^J hops and is flagged
``is_cycle`` with a NULL final target — exactly what a scheduler needs to
drop the URL.

Synthetic map (deterministic from doc_id): blocks of 5 nodes; node 5b+r
(r=1..4) redirects to 5b+r-1, so 5b+0 is the landing page and chains run
1..4 hops; every block with b % 17 == 3 additionally closes 5b+0 → 5b+2,
making the whole block a loop. Hop counts accumulate through the doubling
and are exact for every acyclic source.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from crawl4ai_spark.ops.common import tbl

JUMP_ROUNDS = 3  # resolves chains up to 2^3 = 8 hops (max synthetic: 4)


def _redirect_edges(d: DataFrame) -> DataFrame:
    """(doc_id) -> (src, dst): the deterministic redirect map."""
    r = F.col("doc_id") % 5
    b = F.expr("doc_id div 5")
    chain = d.filter(r != 0).select(
        F.col("doc_id").alias("src"), (F.col("doc_id") - 1).alias("dst"))
    loop = d.filter((r == 0) & (b % 17 == 3)).select(
        F.col("doc_id").alias("src"), (F.col("doc_id") + 2).alias("dst"))
    return chain.unionByName(loop)


def resolve_redirects(edges: DataFrame) -> DataFrame:
    """(src, dst) -> (src, final, hops, is_cycle) by pointer doubling."""
    m = edges.select("src", "dst", F.lit(1).cast("long").alias("hops"))
    for _ in range(JUMP_ROUNDS):
        n = m.select(F.col("src").alias("n_src"),
                     F.col("dst").alias("n_dst"),
                     F.col("hops").alias("n_hops"))
        m = (
            m.join(n, m["dst"] == n["n_src"], "left")
            .select("src",
                    F.coalesce("n_dst", "dst").alias("dst"),
                    (F.col("hops") + F.coalesce("n_hops", F.lit(0)))
                    .alias("hops"))
        )
    outgoing = edges.select(F.col("src").alias("o_src")).distinct()
    return (
        m.join(outgoing, m["dst"] == outgoing["o_src"], "left")
        .select(
            F.col("src").cast("long"),
            F.when(F.col("o_src").isNull(), F.col("dst"))
             .cast("long").alias("final"),
            F.when(F.col("o_src").isNull(), F.col("hops"))
             .cast("long").alias("hops"),
            F.col("o_src").isNotNull().alias("is_cycle"))
    )


def q_redirect_resolve(spark: SparkSession, sf_dir: str) -> DataFrame:
    return resolve_redirects(
        _redirect_edges(tbl(spark, sf_dir, "documents").select("doc_id")))


_SQL_EDGES = """
  SELECT doc_id AS src, doc_id - 1 AS dst FROM documents WHERE doc_id % 5 <> 0
  UNION ALL
  SELECT doc_id AS src, doc_id + 2 AS dst FROM documents
  WHERE doc_id % 5 = 0 AND (doc_id // 5) % 17 = 3
"""


def _sql_jump(prev: str, cur: str) -> str:
    return f"""
{cur} AS (
  SELECT p.src,
         COALESCE(n.dst, p.dst) AS dst,
         p.hops + COALESCE(n.hops, 0) AS hops
  FROM {prev} p LEFT JOIN {prev} n ON n.src = p.dst
)"""


SQL_REDIRECT_RESOLVE = (
    "WITH edges AS (" + _SQL_EDGES + """
), m0 AS (
  SELECT src, dst, CAST(1 AS BIGINT) AS hops FROM edges
)"""
    + "".join("," + _sql_jump(f"m{i}", f"m{i + 1}")
              for i in range(JUMP_ROUNDS))
    + f"""
SELECT CAST(m.src AS BIGINT) AS src,
       CAST(CASE WHEN o.src IS NULL THEN m.dst END AS BIGINT) AS final,
       CAST(CASE WHEN o.src IS NULL THEN m.hops END AS BIGINT) AS hops,
       (o.src IS NOT NULL) AS is_cycle
FROM m{JUMP_ROUNDS} m
LEFT JOIN (SELECT DISTINCT src FROM edges) o ON o.src = m.dst
"""
)


QUERIES = {
    "redirect_resolve": q_redirect_resolve,
}
ORACLES = {
    "redirect_resolve": SQL_REDIRECT_RESOLVE,
}
