"""Web-graph analytics beyond PageRank: HyperBall harmonic centrality.

Harmonic centrality ``H(v) = sum_{u != v} 1 / d(u, v)`` (distance measured
INTO v) is the ranking Common Crawl publishes for its host/domain graphs;
computing it exactly needs all-pairs BFS, which is infeasible at 10^10
nodes. HyperBall (Boldi & Vigna, "In-Core Computation of Geometric
Centralities with HyperBall", 2013) replaces each ball ``B(v, t)`` with a
HyperLogLog counter and iterates one max-merge per edge per round:

    c(v, t+1) = c(v, t)  MAX-MERGE  c(u, t)   for every edge u -> v

so round t costs ONE edge-keyed equi-join + a (node, bucket) max aggregate
— the same shuffle shape as a PageRank round (ops/analytics.py:223), with
counter rows bounded by ``nodes × min(|ball|, m)``. Registers reuse the
repo's deterministic md5-derived HLL scheme (ops/textstats.py HLL_M /
HLL_RHO_CAP / integer linear-counting table), so every register, every
per-round ball estimate, and the final harmonic sum are EXACT integers with
a chained-CTE DuckDB oracle (the events_pagerank discipline).

Estimator note: the raw->linear-counting regime switch is not strictly
monotone at the boundary, so per-round ball deltas are clamped at 0
(``greatest(b_t - b_{t-1}, 0)``) in BOTH engines before the 1/t weighting;
all divisions keep nonnegative numerators so floor == truncate cross-engine
(NOTES.md parity gotcha #6).

Scale (100 TB / 10^10 edges): counters are (node, bucket, rho) rows — at
m=256 the per-node counter is <=256 rows ~ 4 KB, 40 TB total at 10^10
nodes, partitioned by node; each round shuffles |edges| x occupied-buckets
rows on the edge key. HB_ITERS bounds the radius (Common Crawl's ranking
uses a fixed small radius for exactly this reason); the per-round plan is
embarrassingly parallel and AQE-skew-splittable on hub nodes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from crawl4ai_spark.ops.analytics import _pr_graph
from crawl4ai_spark.ops.textstats import (
    HLL_M,
    HLL_RHO_CAP,
    _HLL_ALPHA_M2_2_32,
    _HLL_LC,
    _HLL_LC_SQL,
)

HB_ITERS = 3  # ball radius: H(v) truncated at distance 3 (HyperBall's
# fixed-radius mode; every engine term beyond it is graph-dependent tail)


def _single_registers(nodes: DataFrame) -> DataFrame:
    """HLL counter of the singleton set {node}: one (node, bucket, rho) row
    per node, registers derived from md5(cast(node as string)) exactly as
    ops/textstats.py q_text_hll_registers derives them from md5(text)."""
    h = nodes.withColumn("_m", F.md5(F.col("node").cast("string")))
    hv1 = "(instr('0123456789abcdef', substring(_m, 1, 1)) - 1)"
    hv2 = "(instr('0123456789abcdef', substring(_m, 2, 1)) - 1)"
    h = (
        h.withColumn("bucket", F.expr(f"CAST(16 * {hv1} + {hv2} AS BIGINT)"))
        .withColumn("hx", F.expr("trim(LEADING '0' FROM substring(_m, 3, 16))"))
    )
    first = F.substring("hx", 1, 1)
    extra = (F.when(first == "1", 3)
              .when(first.isin("2", "3"), 2)
              .when(first.isin("4", "5", "6", "7"), 1)
              .otherwise(0))
    rho = F.when(F.col("hx") == "", F.lit(HLL_RHO_CAP)).otherwise(
        F.least(F.lit(HLL_RHO_CAP),
                (F.lit(16) - F.length("hx")) * 4 + extra + 1))
    return h.select("node", "bucket", rho.cast("long").alias("rho"))


def _ball_estimate(regs: DataFrame, out: str) -> DataFrame:
    """Per-node HLL estimate from a (node, bucket, rho) counter table —
    the q_text_hll_estimate formula keyed by node: exact-integer S term,
    one cross-engine double division, linear-counting table in the
    small-range regime."""
    s = regs.groupBy("node").agg(
        F.count("*").alias("occupied"),
        F.sum(F.expr("cast(shiftleft(1L, cast(32 - rho as int)) as bigint)"))
        .alias("s_occ"))
    raw = F.expr(f"CAST(ROUND({_HLL_ALPHA_M2_2_32} / "
                 f"(({HLL_M} - occupied) * 4294967296 + s_occ)) AS BIGINT)")
    empty = F.lit(HLL_M) - F.col("occupied")
    lc = F.element_at(F.array(*[F.lit(v) for v in _HLL_LC]),
                      empty.cast("int"))
    return s.select(
        "node",
        F.when((empty > 0) & (raw <= int(2.5 * HLL_M)), lc.cast("long"))
         .otherwise(raw).alias(out))


def q_events_harmonic_hyperball(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Harmonic centrality over the events click graph via HyperBall.

    Graph = the PageRank graph (ops/analytics.py _pr_graph: node = props.k,
    edge = consecutive k per user). Output per node: the estimated in-ball
    sizes at t=1..HB_ITERS and the truncated harmonic centrality
    ``harmonic_e6 = sum_t max(b_t - b_{t-1}, 0) * 1e6 div t``.
    """
    nodes, edges, _ = _pr_graph(spark, sf_dir)
    regs = _single_registers(nodes)
    ests = [_ball_estimate(regs, "b0")]
    for t in range(1, HB_ITERS + 1):
        moved = (
            edges.join(regs.withColumnRenamed("node", "src"), "src")
            .select(F.col("dst").alias("node"), "bucket", "rho")
        )
        regs = (
            regs.unionByName(moved)
            .groupBy("node", "bucket")
            .agg(F.max("rho").alias("rho"))
        )
        ests.append(_ball_estimate(regs, f"b{t}"))
    out = nodes
    for e in ests:
        out = out.join(e, "node")
    harmonic = F.expr(" + ".join(
        f"greatest(b{t} - b{t - 1}, 0L) * 1000000 div {t}"
        for t in range(1, HB_ITERS + 1)))
    return out.select(
        F.col("node").cast("long"),
        *[F.col(f"b{t}").cast("long").alias(f"ball_t{t}")
          for t in range(1, HB_ITERS + 1)],
        harmonic.cast("long").alias("harmonic_e6"),
    )


# --- DuckDB oracle: the same graph CTEs as SQL_EVENTS_PAGERANK, singleton
# registers from md5(CAST(node AS VARCHAR)), HB_ITERS chained max-merge
# rounds, per-round estimates, clamped harmonic sum.

_SQL_GRAPH = """
ev AS (
  SELECT user_id, ts, event_id,
         CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
  FROM events
), e0 AS (
  SELECT k AS src,
         lead(k) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS dst
  FROM ev
), edges AS (
  SELECT src, dst FROM e0 WHERE dst IS NOT NULL
), nodes AS (
  SELECT DISTINCT k AS node FROM ev
)"""

_SQL_R0 = f"""
r0 AS (
  SELECT node,
         CAST(16 * (instr('0123456789abcdef', substr(m, 1, 1)) - 1)
              + (instr('0123456789abcdef', substr(m, 2, 1)) - 1)
              AS BIGINT) AS bucket,
         CAST(CASE WHEN hx = '' THEN {HLL_RHO_CAP}
              ELSE least({HLL_RHO_CAP},
                         (16 - length(hx)) * 4
                         + CASE WHEN hx LIKE '1%' THEN 3
                                WHEN hx LIKE '2%' OR hx LIKE '3%' THEN 2
                                WHEN hx LIKE '4%' OR hx LIKE '5%'
                                  OR hx LIKE '6%' OR hx LIKE '7%' THEN 1
                                ELSE 0 END + 1) END AS BIGINT) AS rho
  FROM (SELECT node, md5(CAST(node AS VARCHAR)) AS m,
               ltrim(substr(md5(CAST(node AS VARCHAR)), 3, 16), '0') AS hx
        FROM nodes) q
)"""


def _sql_hb_round(prev: str, cur: str) -> str:
    return f"""
{cur} AS (
  SELECT node, bucket, max(rho) AS rho FROM (
    SELECT node, bucket, rho FROM {prev}
    UNION ALL
    SELECT e.dst AS node, p.bucket, p.rho
    FROM edges e JOIN {prev} p ON p.node = e.src
  ) u GROUP BY node, bucket
)"""


def _sql_hb_est(regs: str, cur: str, col: str) -> str:
    return f"""
{cur} AS (
  SELECT node,
         CASE WHEN empty > 0 AND raw <= {int(2.5 * HLL_M)}
              THEN CAST({_HLL_LC_SQL}[empty] AS BIGINT)
              ELSE raw END AS {col}
  FROM (
    SELECT node, CAST({HLL_M} - count(*) AS INT) AS empty,
           CAST(ROUND({_HLL_ALPHA_M2_2_32} /
                (({HLL_M} - count(*)) * 4294967296
                 + sum(CAST(1 AS BIGINT) << CAST(32 - rho AS INT))))
                AS BIGINT) AS raw
    FROM {regs} GROUP BY node
  ) s
)"""


SQL_EVENTS_HARMONIC_HYPERBALL = (
    "WITH " + _SQL_GRAPH + "," + _SQL_R0
    + "".join("," + _sql_hb_round(f"r{t - 1}", f"r{t}")
              for t in range(1, HB_ITERS + 1))
    + "".join("," + _sql_hb_est(f"r{t}", f"est{t}", f"b{t}")
              for t in range(0, HB_ITERS + 1))
    + f"""
SELECT CAST(n.node AS BIGINT) AS node,
       {", ".join(f"CAST(b{t} AS BIGINT) AS ball_t{t}"
                  for t in range(1, HB_ITERS + 1))},
       CAST({" + ".join(f"greatest(b{t} - b{t - 1}, 0) * 1000000 // {t}"
                        for t in range(1, HB_ITERS + 1))} AS BIGINT)
       AS harmonic_e6
FROM nodes n
{chr(10).join(f"JOIN est{t} ON est{t}.node = n.node"
              for t in range(0, HB_ITERS + 1))}
"""
)


# ---------------------------------------------------------------------------
# k-core decomposition (coreness) via the convergent h-index iteration of
# Lü, Zhou, Zhang & Stanley ("The H-index of a network node", Nature
# Communications 2016): c_0(v) = degree(v); c_{t+1}(v) = H({c_t(u) : u in
# N(v)}) where H is the h-index — the largest h such that at least h
# neighbors carry value >= h. The sequence decreases monotonically to the
# exact coreness, which is the peeling-order k-core number (Batagelj &
# Zaversnik's algorithm) that crawl prioritizers use to find the web's
# dense nucleus vs its tendril periphery.
#
# Distributed shape: the classic peel is inherently sequential (remove the
# global min-degree node, repeat); the h-index form is one edge-keyed
# equi-join + a node-partitioned window + aggregate PER ROUND — the same
# shuffle shape as a PageRank round, embarrassingly parallel at 10^10 edges.
# KCORE_ITERS fixes the round count so the DuckDB oracle is a chained CTE;
# the from-spec pytest guard runs exact peeling to convergence and asserts
# the truncated iteration has already reached the fixpoint on the test
# graph (measured: 7 rounds at sf0.001, 5 at sf0.01).
#
# h-index without python: sort each node's neighbor values descending with
# row_number rn, then h = max(least(rn, val)) — invariant to tie order, so
# the nondeterministic row_number tie-break cannot diverge cross-engine.
# ---------------------------------------------------------------------------

KCORE_ITERS = 8


def _undirected(edges: DataFrame) -> DataFrame:
    """Symmetrize + simplify: both arc directions, self-loops dropped,
    duplicates collapsed. Neighbors of v = dst where src = v."""
    rev = edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    return (edges.unionByName(rev)
            .filter(F.col("src") != F.col("dst"))
            .distinct())


def q_events_kcore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Coreness per node of the (undirected, simplified) events click graph.

    Output: node, degree, coreness after KCORE_ITERS h-index rounds (== the
    exact k-core number once converged; see module guard)."""
    nodes, edges0, _ = _pr_graph(spark, sf_dir)
    ue = _undirected(edges0)
    deg = ue.groupBy("src").agg(F.count("*").alias("val"))
    c = nodes.join(deg, nodes["node"] == deg["src"], "left").select(
        "node", F.coalesce("val", F.lit(0)).cast("long").alias("val"))
    degree = c.select("node", F.col("val").alias("degree"))
    for _ in range(KCORE_ITERS):
        nbr = (ue.join(c.withColumnRenamed("node", "src"), "src")
                 .select(F.col("dst").alias("node"), "val"))
        w = Window.partitionBy("node").orderBy(F.col("val").desc())
        h = (nbr.withColumn("rn", F.row_number().over(w))
                .groupBy("node")
                .agg(F.max(F.least("rn", "val")).alias("h")))
        c = nodes.join(h, "node", "left").select(
            "node", F.coalesce("h", F.lit(0)).cast("long").alias("val"))
    return (degree.join(c, "node")
            .select(F.col("node").cast("long"), "degree",
                    F.col("val").alias("coreness")))


def _sql_kcore_round(prev: str, cur: str) -> str:
    return f"""
{cur} AS (
  SELECT n.node, CAST(coalesce(h.h, 0) AS BIGINT) AS val
  FROM nodes n LEFT JOIN (
    SELECT node, max(least(rn, val)) AS h FROM (
      SELECT e.dst AS node, p.val,
             row_number() OVER (PARTITION BY e.dst ORDER BY p.val DESC)
             AS rn
      FROM ue e JOIN {prev} p ON p.node = e.src
    ) q GROUP BY node
  ) h ON h.node = n.node
)"""


SQL_EVENTS_KCORE = (
    "WITH " + _SQL_GRAPH + """,
ue AS (
  SELECT DISTINCT src, dst FROM (
    SELECT src, dst FROM edges
    UNION ALL
    SELECT dst AS src, src AS dst FROM edges
  ) b WHERE src <> dst
),
c0 AS (
  SELECT n.node, CAST(coalesce(d.val, 0) AS BIGINT) AS val
  FROM nodes n LEFT JOIN (
    SELECT src AS node, count(*) AS val FROM ue GROUP BY src
  ) d ON d.node = n.node
)"""
    + "".join("," + _sql_kcore_round(f"c{t - 1}", f"c{t}")
              for t in range(1, KCORE_ITERS + 1))
    + f"""
SELECT CAST(c0.node AS BIGINT) AS node,
       c0.val AS degree,
       c{KCORE_ITERS}.val AS coreness
FROM c0 JOIN c{KCORE_ITERS} ON c{KCORE_ITERS}.node = c0.node
"""
)


# ---------------------------------------------------------------------------
# Triangle counting + local clustering coefficient — the third classic
# whole-graph statistic next to HyperBall centrality and k-core, and the
# standard web/social-graph community-density signal (a link farm's
# signature is a near-clique: triangle density far above its degree would
# predict).
#
# Algorithm: the degree-ordered edge-iterator (the MapReduce-canonical
# scheme of Suri & Vassilvitskii, WWW 2011). Rank every node by
# (degree, node); keep each undirected edge only as its low→high arc.
# Every triangle u≺v≺w is then found EXACTLY once, as the wedge
# (u→v, u→w) closed by the arc v→w — two self-joins, no dedup pass.
# The orientation is also the scale device: each wedge list is the
# out-list of the LOWEST-ranked corner, and degree-ordering bounds
# oriented out-degree by O(sqrt(m)) — the hub that would explode a naive
# neighbor join enumerates no wedges at all because every neighbor
# outranks it.
#
# Rank is packed as d * 2^32 + node so the lexicographic compare is one
# BIGINT comparison in both engines (node ids < 2^32 here; at true web
# scale widen to a struct compare — semantics identical).
# cc_e6 = 2*T*1e6 div (d*(d-1)): exact integer in both engines.
# ---------------------------------------------------------------------------


def q_events_triangles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-node triangle count and local clustering coefficient of the
    (undirected, simplified) events click graph."""
    nodes, edges0, _ = _pr_graph(spark, sf_dir)
    ue = _undirected(edges0)
    deg = ue.groupBy("src").agg(F.count("*").cast("long").alias("d")) \
            .withColumnRenamed("src", "node")
    rk = deg.select("node", F.expr("d * 4294967296 + node").alias("rk"))
    oe = (ue.join(rk.withColumnRenamed("node", "src")
                    .withColumnRenamed("rk", "rks"), "src")
            .join(rk.withColumnRenamed("node", "dst")
                    .withColumnRenamed("rk", "rkd"), "dst")
            .filter(F.col("rks") < F.col("rkd"))
            .select(F.col("src").alias("u"), F.col("dst").alias("v"),
                    F.col("rkd").alias("rkv")))
    e2 = oe.select(F.col("u"), F.col("v").alias("w"),
                   F.col("rkv").alias("rkw"))
    wedges = (oe.join(e2, "u")
                .filter(F.col("rkv") < F.col("rkw"))
                .select("u", "v", "w"))
    closing = oe.select(F.col("u").alias("v"), F.col("v").alias("w"))
    tri = wedges.join(closing, ["v", "w"])
    corners = (tri.select(F.col("u").alias("node"))
               .unionAll(tri.select(F.col("v").alias("node")))
               .unionAll(tri.select(F.col("w").alias("node"))))
    cnt = corners.groupBy("node").agg(
        F.count("*").cast("long").alias("n_tri"))
    return (nodes.join(deg, "node", "left").join(cnt, "node", "left")
            .select(F.col("node").cast("long"),
                    F.coalesce("d", F.lit(0)).cast("long").alias("degree"),
                    F.coalesce("n_tri", F.lit(0)).cast("long").alias("n_tri"))
            .withColumn("cc_e6", F.expr(
                "CASE WHEN degree >= 2"
                " THEN 2 * n_tri * 1000000 div (degree * (degree - 1))"
                " ELSE 0 END").cast("long")))


SQL_EVENTS_TRIANGLES = (
    "WITH " + _SQL_GRAPH + """,
ue AS (
  SELECT DISTINCT src, dst FROM (
    SELECT src, dst FROM edges
    UNION ALL
    SELECT dst AS src, src AS dst FROM edges
  ) b WHERE src <> dst
),
deg AS (
  SELECT src AS node, CAST(count(*) AS BIGINT) AS d FROM ue GROUP BY src
),
rk AS (SELECT node, d * 4294967296 + node AS rk FROM deg),
oe AS (
  SELECT e.src AS u, e.dst AS v, rd.rk AS rkv
  FROM ue e
  JOIN rk rs ON rs.node = e.src
  JOIN rk rd ON rd.node = e.dst
  WHERE rs.rk < rd.rk
),
tri AS (
  SELECT w1.u, w1.v, w2.v AS w
  FROM oe w1
  JOIN oe w2 ON w2.u = w1.u AND w1.rkv < w2.rkv
  JOIN oe c ON c.u = w1.v AND c.v = w2.v
),
corners AS (
  SELECT u AS node FROM tri
  UNION ALL SELECT v FROM tri
  UNION ALL SELECT w FROM tri
),
cnt AS (
  SELECT node, CAST(count(*) AS BIGINT) AS n_tri FROM corners GROUP BY node
)
SELECT CAST(n.node AS BIGINT) AS node,
       CAST(coalesce(deg.d, 0) AS BIGINT) AS degree,
       CAST(coalesce(cnt.n_tri, 0) AS BIGINT) AS n_tri,
       CAST(CASE WHEN coalesce(deg.d, 0) >= 2
                 THEN 2 * coalesce(cnt.n_tri, 0) * 1000000
                      // (deg.d * (deg.d - 1))
                 ELSE 0 END AS BIGINT) AS cc_e6
FROM nodes n
LEFT JOIN deg ON deg.node = n.node
LEFT JOIN cnt ON cnt.node = n.node
"""
)


# ---------------------------------------------------------------------------
# Degree assortativity (Newman 2002): the Pearson correlation of endpoint
# degrees over edges — the one-number "do hubs link to hubs or to leaves?"
# diagnostic (the web is famously DISassortative; a crawl of a link farm
# is not — which makes the sign itself a spam-shape signal). Computed over
# both orientations of each undirected edge, the standard convention.
#
# Exactness device: Newman's r normalizes by sqrt(var_j * var_k), which
# would not be bit-stable cross-engine — but over the SYMMETRIC arc set
# (both orientations of every edge) the source- and destination-degree
# moments are identical (Σk = Σj, Σk² = Σj²), so the sqrt collapses:
#     num  = M*Σjk − Σj*Σj,   var = M*Σj² − (Σj)²,   r = num / var
# and r_e6 = num * 1e6 div var is EXACT integer arithmetic in both
# engines — no sqrt, no float ever. (num*1e6 fits BIGINT up to ~10^12
# arcs of moderate degree; at the extreme web scale divide var first.)
# Scale shape: one degree aggregate + one edge-to-degree join + a single
# global fold — a PageRank half-round's profile.
# ---------------------------------------------------------------------------


def q_events_assortativity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-row degree-assortativity card of the undirected click graph:
    exact integer moments + sign-preserved r² in e6."""
    _, edges0, _ = _pr_graph(spark, sf_dir)
    ue = _undirected(edges0)
    deg = ue.groupBy("src").agg(F.count("*").cast("long").alias("d")) \
            .withColumnRenamed("src", "node")
    je = (ue.join(deg.withColumnRenamed("node", "src")
                     .withColumnRenamed("d", "dj"), "src")
            .join(deg.withColumnRenamed("node", "dst")
                     .withColumnRenamed("d", "dk"), "dst"))
    return je.agg(
        F.count("*").cast("long").alias("m_arcs"),
        F.sum(F.expr("dj * dk")).cast("long").alias("sum_jk"),
        F.sum("dj").cast("long").alias("sum_j"),
        F.sum(F.expr("dj * dj")).cast("long").alias("sum_j2"),
    ).select(
        "m_arcs", "sum_jk", "sum_j", "sum_j2",
        F.expr("CAST(m_arcs * sum_jk - sum_j * sum_j AS BIGINT)")
        .alias("num"),
        F.expr("CAST(m_arcs * sum_j2 - sum_j * sum_j AS BIGINT)")
        .alias("var_j"),
    ).select(
        "m_arcs", "sum_jk", "sum_j", "sum_j2", "num", "var_j",
        # |r| <= 1 so num*1e6 + 2e6*var >= 0: the bias keeps the numerator
        # nonnegative, where floor (DuckDB //) == truncate (Spark div).
        # var = 0 iff the graph is REGULAR (every degree equal — observed:
        # the 10x scale-probe replica densifies the click graph to
        # complete); r is undefined there, reported as 0 by convention.
        F.expr("CAST(CASE WHEN var_j = 0 THEN 0"
               " ELSE (num * 1000000 + 2000000 * var_j) div var_j"
               " - 2000000 END AS BIGINT)").alias("r_e6"))


SQL_EVENTS_ASSORTATIVITY = (
    "WITH " + _SQL_GRAPH + """,
ue AS (
  SELECT DISTINCT src, dst FROM (
    SELECT src, dst FROM edges
    UNION ALL
    SELECT dst AS src, src AS dst FROM edges
  ) b WHERE src <> dst
),
deg AS (
  SELECT src AS node, CAST(count(*) AS BIGINT) AS d FROM ue GROUP BY src
),
m AS (
  SELECT CAST(count(*) AS BIGINT) AS m_arcs,
         CAST(sum(j.d * k.d) AS BIGINT) AS sum_jk,
         CAST(sum(j.d) AS BIGINT) AS sum_j,
         CAST(sum(j.d * j.d) AS BIGINT) AS sum_j2
  FROM ue e JOIN deg j ON j.node = e.src JOIN deg k ON k.node = e.dst
)
SELECT m_arcs, sum_jk, sum_j, sum_j2,
       CAST(m_arcs * sum_jk - sum_j * sum_j AS BIGINT) AS num,
       CAST(m_arcs * sum_j2 - sum_j * sum_j AS BIGINT) AS var_j,
       CAST(CASE WHEN m_arcs * sum_j2 - sum_j * sum_j = 0 THEN 0
                 ELSE ((m_arcs * sum_jk - sum_j * sum_j) * 1000000
                       + 2000000 * (m_arcs * sum_j2 - sum_j * sum_j))
                      // (m_arcs * sum_j2 - sum_j * sum_j) - 2000000
            END AS BIGINT) AS r_e6
FROM m
"""
)


# ---------------------------------------------------------------------------
# Modularity of the label-propagation communities (Newman & Girvan 2004):
# the quality score that tells you whether the LPA labels mean anything —
#     Q = Σ_c [ e_c/m − (d_c/2m)² ]
# over the SIMPLE undirected graph (the triangles/assortativity edge
# convention). Exactness device: fold the per-community fractions into ONE
# rational before dividing —
#     Q_e6 = (M·Σ in_arcs_c − Σ d_c²) * 1e6 div M²     (M = 2m arcs)
# (in_arcs_c counts both directions of each intra-community edge, so
# in_arcs_c/M == e_c/m), with the nonnegative-bias trick for the possibly
# negative numerator. Per-community rows expose the decomposition
# (n_nodes, in-arc count, total degree); the global Q rides a 1-row
# broadcast onto every row.
# Scale shape: community labels join the node-keyed degree table and the
# edge table once each; everything else is two aggregates. No window.
# ---------------------------------------------------------------------------


def q_events_modularity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-community modularity decomposition of the labelprop partition
    + the global Q (exact e6) repeated on every row."""
    from crawl4ai_spark.ops.analytics import q_events_labelprop

    comm = q_events_labelprop(spark, sf_dir) \
        .select("node", "community")
    _, edges0, _ = _pr_graph(spark, sf_dir)
    ue = _undirected(edges0)
    deg = ue.groupBy("src").agg(F.count("*").cast("long").alias("d")) \
            .withColumnRenamed("src", "node")
    nd = comm.join(deg, "node", "left") \
             .select("node", "community",
                     F.coalesce("d", F.lit(0)).cast("long").alias("d"))
    arcs = (ue.join(nd.select(F.col("node").alias("src"),
                              F.col("community").alias("cs")), "src")
              .join(nd.select(F.col("node").alias("dst"),
                              F.col("community").alias("cd")), "dst"))
    in_arcs = (arcs.filter(F.col("cs") == F.col("cd"))
               .groupBy(F.col("cs").alias("community"))
               .agg(F.count("*").cast("long").alias("in_arcs")))
    per_c = (nd.groupBy("community")
             .agg(F.count("*").cast("long").alias("n_nodes"),
                  F.sum("d").cast("long").alias("d_tot"))
             .join(in_arcs, "community", "left")
             .select("community", "n_nodes", "d_tot",
                     F.coalesce("in_arcs", F.lit(0)).cast("long")
                     .alias("in_arcs")))
    glob = per_c.agg(
        F.sum("d_tot").cast("long").alias("m_arcs"),
        F.sum("in_arcs").cast("long").alias("sum_in"),
        F.sum(F.expr("d_tot * d_tot")).cast("long").alias("sum_d2"))
    return (per_c.crossJoin(F.broadcast(glob))
            .select("community", "n_nodes", "in_arcs", "d_tot",
                    # numerator can be negative: bias keeps it nonneg so
                    # DuckDB floor == Spark truncate
                    F.expr(
                        "CAST(((m_arcs * sum_in - sum_d2) * 1000000"
                        " + 2000000 * m_arcs * m_arcs)"
                        " div (m_arcs * m_arcs) - 2000000 AS BIGINT)")
                    .alias("q_e6")))


SQL_EVENTS_MODULARITY = (
    "WITH " + _SQL_GRAPH + """,
ue AS (
  SELECT DISTINCT src, dst FROM (
    SELECT src, dst FROM edges
    UNION ALL
    SELECT dst AS src, src AS dst FROM edges
  ) b WHERE src <> dst
),
deg AS (
  SELECT src AS node, CAST(count(*) AS BIGINT) AS d FROM ue GROUP BY src
),
comm AS (SELECT node, community FROM (__LABELPROP__)),
nd AS (
  SELECT c.node, c.community, CAST(coalesce(deg.d, 0) AS BIGINT) AS d
  FROM comm c LEFT JOIN deg ON deg.node = c.node
),
ia AS (
  SELECT s.community, CAST(count(*) AS BIGINT) AS in_arcs
  FROM ue e
  JOIN nd s ON s.node = e.src
  JOIN nd t ON t.node = e.dst
  WHERE s.community = t.community
  GROUP BY s.community
),
per_c AS (
  SELECT nd.community,
         CAST(count(*) AS BIGINT) AS n_nodes,
         CAST(sum(nd.d) AS BIGINT) AS d_tot,
         CAST(coalesce(max(ia.in_arcs), 0) AS BIGINT) AS in_arcs
  FROM nd LEFT JOIN ia ON ia.community = nd.community
  GROUP BY nd.community
),
gmom AS (
  SELECT CAST(sum(d_tot) AS BIGINT) AS m_arcs,
         CAST(sum(in_arcs) AS BIGINT) AS sum_in,
         CAST(sum(d_tot * d_tot) AS BIGINT) AS sum_d2
  FROM per_c
)
SELECT p.community, p.n_nodes, p.in_arcs, p.d_tot,
       CAST(((g.m_arcs * g.sum_in - g.sum_d2) * 1000000
             + 2000000 * g.m_arcs * g.m_arcs)
            // (g.m_arcs * g.m_arcs) - 2000000 AS BIGINT) AS q_e6
FROM per_c p, gmom g
"""
)


def _sql_modularity() -> str:
    from crawl4ai_spark.ops.analytics import SQL_EVENTS_LABELPROP
    return SQL_EVENTS_MODULARITY.replace("__LABELPROP__",
                                         SQL_EVENTS_LABELPROP)


QUERIES = {
    "events_harmonic_hyperball": q_events_harmonic_hyperball,
    "events_kcore": q_events_kcore,
    "events_triangles": q_events_triangles,
    "events_assortativity": q_events_assortativity,
    "events_modularity": q_events_modularity,
}
ORACLES = {
    "events_harmonic_hyperball": SQL_EVENTS_HARMONIC_HYPERBALL,
    "events_kcore": SQL_EVENTS_KCORE,
    "events_triangles": SQL_EVENTS_TRIANGLES,
    "events_assortativity": SQL_EVENTS_ASSORTATIVITY,
    "events_modularity": _sql_modularity(),
}
