"""Relational-core operators (SURVEY.md §2.4): aggregation, broadcast join,
window top-k, and event sessionization (the batch expression of the
streaming-style session analysis; the Structured Streaming variant lives in
crawl4ai_spark/streaming/).

These mirror the reference's aggregation surface (FilterStats/ScoringStats/
TraversalStats — /root/reference/crawl4ai/deep_crawling/filters.py:19-37,
scorers.py:26-62) generalized to the star-schema testdata.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from crawl4ai_spark.ops.common import e6, tbl


def q_agg_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1-style map-side-combinable aggregation over lineitem.
    Partial aggregation (map-side combine) keeps the shuffle tiny at 100 TB."""
    li = tbl(spark, sf_dir, "lineitem")
    # determinism: quantize per row to bigint, THEN sum — double-sum order
    # differs between engines/partitions and would shift the last digits
    return (
        li.filter(F.col("l_shipdate") <= F.lit("2024-09-01").cast("timestamp_ntz"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(e6(F.col("l_quantity"))).cast("long").alias("sum_qty_e6"),
            F.sum(e6(F.col("l_extendedprice"))).cast("long").alias("sum_base_price_e6"),
            F.sum(e6(F.col("l_extendedprice") * (1 - F.col("l_discount"))))
            .cast("long").alias("sum_disc_price_e6"),
            F.round(F.sum(e6(F.col("l_quantity"))).cast("double") / F.count("*"))
            .cast("long").alias("avg_qty_e6"),
            F.count("*").cast("long").alias("count_order"),
        )
    )


SQL_AGG_PRICING_SUMMARY = """
SELECT l_returnflag, l_linestatus,
       CAST(sum(CAST(ROUND(l_quantity * 1e6) AS BIGINT)) AS BIGINT) AS sum_qty_e6,
       CAST(sum(CAST(ROUND(l_extendedprice * 1e6) AS BIGINT)) AS BIGINT) AS sum_base_price_e6,
       CAST(sum(CAST(ROUND(l_extendedprice * (1 - l_discount) * 1e6) AS BIGINT)) AS BIGINT) AS sum_disc_price_e6,
       CAST(ROUND(CAST(sum(CAST(ROUND(l_quantity * 1e6) AS BIGINT)) AS DOUBLE) / count(*)) AS BIGINT) AS avg_qty_e6,
       CAST(count(*) AS BIGINT) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '2024-09-01'
GROUP BY l_returnflag, l_linestatus
"""


def q_join_top_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue per customer+nation: fact×dim joins with the dims broadcast
    (customer/nation are small dims — never shuffle the fact table on them)."""
    orders = tbl(spark, sf_dir, "orders")
    cust = tbl(spark, sf_dir, "customer")
    nation = tbl(spark, sf_dir, "nation")
    rev = (
        orders.join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(F.sum(e6(F.col("o_totalprice"))).cast("long").alias("revenue_e6"),
             F.count("*").cast("long").alias("n_orders"))
    )
    top = rev.orderBy(F.desc("revenue_e6"), F.asc("c_custkey")).limit(20)
    w = Window.orderBy(F.desc("revenue_e6"), F.asc("c_custkey"))
    return top.withColumn("rk", F.row_number().over(w).cast("long"))


SQL_JOIN_TOP_CUSTOMERS = """
WITH rev AS (
  SELECT c.c_custkey, c.c_name, n.n_name,
         CAST(sum(CAST(ROUND(o.o_totalprice * 1e6) AS BIGINT)) AS BIGINT) AS revenue_e6,
         CAST(count(*) AS BIGINT) AS n_orders
  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
  JOIN nation n ON c.c_nationkey = n.n_nationkey
  GROUP BY c.c_custkey, c.c_name, n.n_name
)
SELECT * FROM (
  SELECT *, CAST(row_number() OVER (ORDER BY revenue_e6 DESC, c_custkey ASC) AS BIGINT) AS rk
  FROM rev
) WHERE rk <= 20
"""


def q_window_order_ranks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 orders per customer by totalprice — the same window-rank pattern
    that implements best-first frontier scheduling (SURVEY.md §2 F8)."""
    orders = tbl(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
    return (
        orders.withColumn("rk", F.row_number().over(w).cast("long"))
        .filter(F.col("rk") <= 3)
        .select("o_custkey", "o_orderkey", e6(F.col("o_totalprice")).alias("totalprice_e6"), "rk")
    )


SQL_WINDOW_ORDER_RANKS = """
SELECT o_custkey, o_orderkey,
       CAST(ROUND(o_totalprice * 1e6) AS BIGINT) AS totalprice_e6, rk
FROM (
  SELECT o_custkey, o_orderkey, o_totalprice,
         CAST(row_number() OVER (PARTITION BY o_custkey
              ORDER BY o_totalprice DESC, o_orderkey ASC) AS BIGINT) AS rk
  FROM orders
) WHERE rk <= 3
"""


def q_sessionize_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization (30-min inactivity) via lag + running sum —
    the batch equivalent of a session window over the event stream."""
    ev = tbl(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    sess = (
        # TZ-proof epoch for TIMESTAMP_NTZ: diff against an NTZ anchor —
        # session timezone can never shift it (unix_timestamp would)
        ev.withColumn("epoch", F.expr(
            "timestampdiff(SECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', ts)"
        ).cast("long"))
        .withColumn("prev", F.lag("epoch").over(w))
        .withColumn(
            "new_sess",
            F.when(F.col("prev").isNull() | (F.col("epoch") - F.col("prev") > 1800), 1).otherwise(0),
        )
        .withColumn("session_no", F.sum("new_sess").over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)).cast("long"))
    )
    return sess.groupBy("user_id", "session_no").agg(
        F.count("*").cast("long").alias("n_events"),
        (F.max("epoch") - F.min("epoch")).cast("long").alias("duration_s"),
        F.sum(e6(F.col("value"))).cast("long").alias("sum_value_e6"),
    )


SQL_SESSIONIZE_EVENTS = """
WITH e AS (
  SELECT user_id, event_id, value, ts, CAST(floor(epoch(ts)) AS BIGINT) AS epoch,
         lag(CAST(floor(epoch(ts)) AS BIGINT)) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev
  FROM events
), s AS (
  SELECT user_id, event_id, value, ts, epoch,
         CASE WHEN prev IS NULL OR epoch - prev > 1800 THEN 1 ELSE 0 END AS new_sess
  FROM e
), n AS (
  -- running sum ordered by (ts, event_id) — the SAME sub-second ordering the
  -- lag() and the Spark window use, so same-second collisions cannot flip
  -- session assignment between engines (ADVICE r01 #2)
  SELECT user_id, event_id, value, epoch,
         CAST(sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_no
  FROM s
)
SELECT user_id, session_no,
       CAST(count(*) AS BIGINT) AS n_events,
       CAST(max(epoch) - min(epoch) AS BIGINT) AS duration_s,
       CAST(sum(CAST(ROUND(value * 1e6) AS BIGINT)) AS BIGINT) AS sum_value_e6
FROM n GROUP BY user_id, session_no
"""


def q_events_windowed_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """10-minute tumbling-window counts per event type (batch expression of
    the streaming windowed aggregation in crawl4ai_spark/streaming/)."""
    ev = tbl(spark, sf_dir, "events")
    return (
        ev.withColumn("bucket", F.floor(F.expr(
            "timestampdiff(SECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', ts)"
        ) / 600).cast("long"))
        .groupBy("bucket", "event_type")
        .agg(F.count("*").cast("long").alias("n"),
             F.sum(e6(F.col("value"))).cast("long").alias("sum_value_e6"))
    )


SQL_EVENTS_WINDOWED_COUNTS = """
SELECT CAST(floor(floor(epoch(ts)) / 600) AS BIGINT) AS bucket, event_type,
       CAST(count(*) AS BIGINT) AS n,
       CAST(sum(CAST(ROUND(value * 1e6) AS BIGINT)) AS BIGINT) AS sum_value_e6
FROM events GROUP BY 1, 2
"""


# ---------------------------------------------------------------------------
# PageRank over the events click-graph (r4): THE canonical web-scale
# iterative operator, expressed as pure DataFrame rounds with an exact
# integer oracle. Nodes = the props.k page ids; edges = consecutive events
# per user ordered by (ts, event_id), kept with multiplicity. Damping 0.85
# in e6 integers: r0 = 1e6; r_{t+1}(v) = 150000 +
# (850000 * sum_{u->v} (r_t(u) div outdeg(u))) div 1e6 — every step integer
# and identical in both engines, so PAGERANK_ITERS unrolled CTEs give an
# EXACT oracle. Dangling-node mass is dropped (the deterministic variant;
# documented, not the redistribute form). Scale shape per round: one
# equi-join of the rank table on src + one groupBy dst — the standard
# distributed PageRank plan; node/edge tables shuffle on their own keys
# only.
# ---------------------------------------------------------------------------

PAGERANK_ITERS = 3
PR_DAMP_E6 = 850_000
PR_BASE_E6 = 150_000


def _pr_graph(spark: SparkSession, sf_dir: str):
    """(nodes, edges, outdeg) from events: node = props.k, edge =
    consecutive (k, next k) per user by (ts, event_id)."""
    ev = tbl(spark, sf_dir, "events").select(
        "user_id", "ts", "event_id",
        F.get_json_object("props", "$.k").cast("long").alias("k"))
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    edges = (
        ev.withColumn("dst", F.lead("k").over(w))
        .filter(F.col("dst").isNotNull())
        .select(F.col("k").alias("src"), "dst")
    )
    nodes = ev.select(F.col("k").alias("node")).distinct()
    outdeg = edges.groupBy("src").agg(F.count("*").alias("d"))
    return nodes, edges, outdeg


def q_events_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    nodes, edges, outdeg = _pr_graph(spark, sf_dir)
    r = nodes.withColumn("r", F.lit(1_000_000).cast("long"))
    for _ in range(PAGERANK_ITERS):
        contrib = (
            edges.join(r.withColumnRenamed("node", "src"), "src")
            .join(outdeg, "src")
            .select("dst", F.expr("r div d").alias("c"))
        )
        s = contrib.groupBy("dst").agg(F.sum("c").alias("s"))
        r = (
            nodes.join(s, nodes["node"] == s["dst"], "left")
            .select("node",
                    (F.lit(PR_BASE_E6)
                     + F.expr(f"CAST({PR_DAMP_E6} * coalesce(s, 0) "
                              f"div 1000000 AS BIGINT)")).alias("r"))
        )
    return r.select(F.col("node").cast("long"),
                    F.col("r").cast("long").alias("rank_e6"))


def _sql_pr_round(prev: str, cur: str) -> str:
    return f"""
{cur} AS (
  SELECT n.node,
         CAST({PR_BASE_E6} + {PR_DAMP_E6} * COALESCE(s.s, 0) // 1000000
              AS BIGINT) AS r
  FROM nodes n
  LEFT JOIN (
    SELECT e.dst, sum(p.r // d.d) AS s
    FROM edges e
    JOIN {prev} p ON p.node = e.src
    JOIN outdeg d ON d.src = e.src
    GROUP BY e.dst
  ) s ON s.dst = n.node
)"""


SQL_EVENTS_PAGERANK = f"""
WITH ev AS (
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
), outdeg AS (
  SELECT src, count(*) AS d FROM edges GROUP BY src
), r0 AS (
  SELECT node, CAST(1000000 AS BIGINT) AS r FROM nodes
),{",".join(_sql_pr_round(f"r{i}", f"r{i + 1}")
            for i in range(PAGERANK_ITERS))}
SELECT CAST(node AS BIGINT) AS node, CAST(r AS BIGINT) AS rank_e6
FROM r{PAGERANK_ITERS}
"""


# ---------------------------------------------------------------------------
# HITS hubs-and-authorities (Kleinberg 1999) over the same click graph —
# the third classic web-ranking iteration next to PageRank and HyperBall
# harmonic centrality. Exact-integer scheme: scores live in e6 fixed point;
# each half-round is one edge-keyed equi-join + a node aggregate, then a
# max-normalization (score * 1e6 div max) instead of the usual L2 norm so
# every value stays a nonnegative integer and div == // cross-engine
# (NOTES.md parity gotcha #6). The max is a 1-row aggregate broadcast back
# onto the score table (BroadcastNestedLoopJoin on one row — never a real
# cartesian), the distributed analogue of the driver-side norm constant.
#
# Scale shape per round: two equi-joins on the edge keys + two groupBy
# aggregates + two O(1) global maxes — identical shuffle profile to two
# PageRank rounds; score tables are node-keyed, edges shuffle on src/dst
# only. Overflow: a,h <= 1e6, so raw <= 1e6 * indeg and raw * 1e6 fits
# BIGINT up to indeg ~ 9e6 per node; beyond that (extreme hubs at 10^10
# edges) drop the fixed point to e3 — documented, not needed at test SF.
# ---------------------------------------------------------------------------

HITS_ITERS = 3


def _hits_scale_to_max(raw: DataFrame, out: str) -> DataFrame:
    """score = raw * 1e6 div max(raw): integer max-normalization, the 1-row
    max broadcast onto the node-keyed score table."""
    mx = raw.agg(F.max("raw").alias("_mx"))
    return raw.crossJoin(F.broadcast(mx)).select(
        "node", F.expr("raw * 1000000 div _mx").cast("long").alias(out))


def q_events_hits(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HITS after HITS_ITERS rounds: authority_e6 / hub_e6 per node,
    max-normalized each half-round (requires a non-empty edge set, which
    _pr_graph guarantees on the events table)."""
    nodes, edges, _ = _pr_graph(spark, sf_dir)
    h = nodes.withColumn("h", F.lit(1_000_000).cast("long"))
    a = None
    for _ in range(HITS_ITERS):
        a_raw = (
            edges.join(h.withColumnRenamed("node", "src"), "src")
            .groupBy(F.col("dst").alias("node"))
            .agg(F.sum("h").alias("s")))
        a_raw = nodes.join(a_raw, "node", "left").select(
            "node", F.coalesce("s", F.lit(0)).cast("long").alias("raw"))
        a = _hits_scale_to_max(a_raw, "a")
        h_raw = (
            edges.join(a.withColumnRenamed("node", "dst"), "dst")
            .groupBy(F.col("src").alias("node"))
            .agg(F.sum("a").alias("s")))
        h_raw = nodes.join(h_raw, "node", "left").select(
            "node", F.coalesce("s", F.lit(0)).cast("long").alias("raw"))
        h = _hits_scale_to_max(h_raw, "h")
    return nodes.join(a, "node").join(h, "node").select(
        F.col("node").cast("long"),
        F.col("a").cast("long").alias("authority_e6"),
        F.col("h").cast("long").alias("hub_e6"))


def _sql_hits_round(prev_h: str, t: int) -> str:
    return f"""
a{t}_raw AS (
  SELECT n.node, CAST(COALESCE(s.s, 0) AS BIGINT) AS raw
  FROM nodes n
  LEFT JOIN (SELECT e.dst, sum(p.h) AS s
             FROM edges e JOIN {prev_h} p ON p.node = e.src
             GROUP BY e.dst) s ON s.dst = n.node
), a{t} AS (
  SELECT node, CAST(raw * 1000000 // (SELECT max(raw) FROM a{t}_raw)
               AS BIGINT) AS a
  FROM a{t}_raw
), h{t}_raw AS (
  SELECT n.node, CAST(COALESCE(s.s, 0) AS BIGINT) AS raw
  FROM nodes n
  LEFT JOIN (SELECT e.src, sum(p.a) AS s
             FROM edges e JOIN a{t} p ON p.node = e.dst
             GROUP BY e.src) s ON s.src = n.node
), h{t} AS (
  SELECT node, CAST(raw * 1000000 // (SELECT max(raw) FROM h{t}_raw)
               AS BIGINT) AS h
  FROM h{t}_raw
)"""


SQL_EVENTS_HITS = f"""
WITH ev AS (
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
), h0 AS (
  SELECT node, CAST(1000000 AS BIGINT) AS h FROM nodes
),{",".join(_sql_hits_round(f"h{i}", i + 1) for i in range(HITS_ITERS))}
SELECT CAST(n.node AS BIGINT) AS node,
       CAST(a.a AS BIGINT) AS authority_e6,
       CAST(h.h AS BIGINT) AS hub_e6
FROM nodes n
JOIN a{HITS_ITERS} a ON a.node = n.node
JOIN h{HITS_ITERS} h ON h.node = n.node
"""


# ---------------------------------------------------------------------------
# SALSA (Lempel & Moran, WWW 2000) over the same click graph — the
# DEGREE-NORMALIZED sibling of HITS: each half-step divides a node's score
# by its degree before propagating, which is what defeats the Tightly-Knit
# Community effect (a dense clique no longer amplifies itself — HITS'
# known failure mode, the reason LinkedIn/Twitter's production "who to
# follow" ran SALSA, not HITS). Same bipartite hub/authority structure;
# the stationary distribution is the random walk that alternates one
# backward and one forward edge step.
#
# Exact-integer scheme (the OPIC share device + the HITS norm device):
#   share_h(i) = h(i) div outdeg(i)   [integer div — the remainder is
#   dropped identically in both engines, the OPIC discipline]
#   a_raw(j)   = Σ_{(i,j)∈E} share_h(i)   (edge multiplicity kept)
#   a          = a_raw * 1e6 div max(a_raw)     [HITS max-normalization]
#   share_a(j) = a(j) div indeg(j);  h_raw, h symmetrically.
#
# Scale shape per round: identical to a HITS round — two equi-joins on
# the edge keys + two node aggregates + two 1-row broadcast maxes; the
# degree tables are node-keyed and broadcast-sized at any realistic node
# count (they are aggregates, not edge-sized). Nothing here is new
# shuffle mass over HITS: the div-by-degree runs inside the same
# projection as the join.
# ---------------------------------------------------------------------------

SALSA_ITERS = 3


def q_events_salsa(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SALSA after SALSA_ITERS rounds: salsa_authority_e6 / salsa_hub_e6
    per node. Distinct from HITS by the per-degree normalization BEFORE
    propagation (TKC-resistant); max-normalized per half-round so every
    score stays an exact nonnegative integer cross-engine."""
    nodes, edges, outdeg = _pr_graph(spark, sf_dir)
    indeg = edges.groupBy(F.col("dst").alias("node")) \
                 .agg(F.count("*").alias("di"))
    h = nodes.withColumn("h", F.lit(1_000_000).cast("long"))
    a = None
    for _ in range(SALSA_ITERS):
        share_h = (h.join(outdeg.withColumnRenamed("src", "node"), "node")
                    .select(F.col("node").alias("src"),
                            F.expr("h div d").alias("sh")))
        a_raw = (edges.join(share_h, "src")
                 .groupBy(F.col("dst").alias("node"))
                 .agg(F.sum("sh").alias("s")))
        a_raw = nodes.join(a_raw, "node", "left").select(
            "node", F.coalesce("s", F.lit(0)).cast("long").alias("raw"))
        a = _hits_scale_to_max(a_raw, "a")
        share_a = (a.join(indeg, "node")
                    .select(F.col("node").alias("dst"),
                            F.expr("a div di").alias("sa")))
        h_raw = (edges.join(share_a, "dst")
                 .groupBy(F.col("src").alias("node"))
                 .agg(F.sum("sa").alias("s")))
        h_raw = nodes.join(h_raw, "node", "left").select(
            "node", F.coalesce("s", F.lit(0)).cast("long").alias("raw"))
        h = _hits_scale_to_max(h_raw, "h")
    return nodes.join(a, "node").join(h, "node").select(
        F.col("node").cast("long"),
        F.col("a").cast("long").alias("salsa_authority_e6"),
        F.col("h").cast("long").alias("salsa_hub_e6"))


def _sql_salsa_round(prev_h: str, t: int) -> str:
    return f"""
sa{t}_raw AS (
  SELECT n.node, CAST(COALESCE(s.s, 0) AS BIGINT) AS raw
  FROM nodes n
  LEFT JOIN (SELECT e.dst, sum(p.h // od.d) AS s
             FROM edges e
             JOIN {prev_h} p ON p.node = e.src
             JOIN outdeg od ON od.src = e.src
             GROUP BY e.dst) s ON s.dst = n.node
), sa{t} AS (
  SELECT node, CAST(raw * 1000000 // (SELECT max(raw) FROM sa{t}_raw)
               AS BIGINT) AS a
  FROM sa{t}_raw
), sh{t}_raw AS (
  SELECT n.node, CAST(COALESCE(s.s, 0) AS BIGINT) AS raw
  FROM nodes n
  LEFT JOIN (SELECT e.src, sum(p.a // ind.di) AS s
             FROM edges e
             JOIN sa{t} p ON p.node = e.dst
             JOIN indeg ind ON ind.dst = e.dst
             GROUP BY e.src) s ON s.src = n.node
), sh{t} AS (
  SELECT node, CAST(raw * 1000000 // (SELECT max(raw) FROM sh{t}_raw)
               AS BIGINT) AS h
  FROM sh{t}_raw
)"""


SQL_EVENTS_SALSA = f"""
WITH ev AS (
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
), outdeg AS (
  SELECT src, count(*) AS d FROM edges GROUP BY src
), indeg AS (
  SELECT dst, count(*) AS di FROM edges GROUP BY dst
), sh0 AS (
  SELECT node, CAST(1000000 AS BIGINT) AS h FROM nodes
),{",".join(_sql_salsa_round(f"sh{i}", i + 1) for i in range(SALSA_ITERS))}
SELECT CAST(n.node AS BIGINT) AS node,
       CAST(a.a AS BIGINT) AS salsa_authority_e6,
       CAST(h.h AS BIGINT) AS salsa_hub_e6
FROM nodes n
JOIN sa{SALSA_ITERS} a ON a.node = n.node
JOIN sh{SALSA_ITERS} h ON h.node = n.node
"""


# ---------------------------------------------------------------------------
# OPIC — On-line Page Importance Computation (Abiteboul, Preda & Cobena,
# WWW 2003): the page-importance measure designed FOR crawlers — importance
# accrues while the crawl runs (cash + history) instead of requiring a
# converged offline eigenvector, so the frontier can be prioritized by it
# mid-crawl (the reference's best-first scorers — bff_strategy.py:19,130 —
# have no link-structure signal at all; OPIC is the crawl-native one).
#
# Batch-synchronous rounds, exact integers (e6 fixed point):
#   c0(i) = 1e6, hist0(i) = 0, virtual cash v0 = 0.
#   Per round: share_i = c(i) div (outdeg_i + 1)   [+1 = the implicit edge
#   every page has to the VIRTUAL page — the paper's strong-connectivity
#   device, which also absorbs dangling nodes]; hist += c; each node
#   receives sum of in-edge shares (multiplicity kept) plus an equal cut
#   v div N of the virtual page's cash; the virtual page collects every
#   node's own share + division remainder (c - outdeg*share) plus its own
#   remainder v - N*(v div N). Total cash is conserved at N*1e6 exactly —
#   asserted by the from-spec guard (tests/test_opic.py).
#
# Scale shape per round: one equi-join of the (node, cash) table on edge
# src + one groupBy dst — identical shuffle profile to a PageRank round;
# the two scalars (node count, virtual cash) are 1-row aggregates broadcast
# back (BroadcastNestedLoopJoin on one row, the HITS norm-constant shape).
# Importance = hist + cash (the paper's X = (H+C)/|H| estimate; the 1/|H|
# normalizer is a per-corpus constant that ranking is invariant to, so the
# integer form stays exact cross-engine).
# ---------------------------------------------------------------------------

OPIC_ITERS = 3


def opic_scores(nodes: DataFrame, edges: DataFrame,
                iters: int = OPIC_ITERS) -> DataFrame:
    """Generic OPIC rounds over any (node) / (src, dst) graph — node keys
    may be any equi-joinable type (long click-graph ids here, URL strings
    in the frontier bridge ``opic_frontier_scores``). Returns
    (node, cash_e6, opic_e6)."""
    spark = nodes.sparkSession
    outdeg = edges.groupBy("src").agg(F.count("*").alias("d"))
    nn = nodes.agg(F.count("*").alias("n"))  # 1-row scalar, broadcast below
    c = nodes.withColumn("cash", F.lit(1_000_000).cast("long"))
    h = nodes.withColumn("hist", F.lit(0).cast("long"))
    v = spark.range(1).select(F.lit(0).cast("long").alias("v"))
    for _ in range(iters):
        s = (
            c.join(outdeg.withColumnRenamed("src", "node"), "node", "left")
            .select("node", "cash",
                    F.coalesce("d", F.lit(0)).cast("long").alias("d"))
            .withColumn("share", F.expr("cash div (d + 1)"))
        )
        h = h.join(c, "node").select(
            "node", (F.col("hist") + F.col("cash")).cast("long").alias("hist"))
        inflow = (
            edges.join(s.withColumnRenamed("node", "src"), "src")
            .groupBy(F.col("dst").alias("node"))
            .agg(F.sum("share").alias("inf"))
        )
        to_v = s.agg(
            F.sum(F.col("cash") - F.col("d") * F.col("share")).alias("tv"))
        vd = v.crossJoin(F.broadcast(nn)).select(
            F.expr("v div n").alias("vdist"),
            F.expr("v - n * (v div n)").alias("vrem"))
        c = (
            nodes.join(inflow, "node", "left")
            .crossJoin(F.broadcast(vd))
            .select("node", (F.coalesce("inf", F.lit(0)) + F.col("vdist"))
                    .cast("long").alias("cash"))
        )
        v = vd.crossJoin(F.broadcast(to_v)).select(
            (F.col("vrem") + F.col("tv")).cast("long").alias("v"))
    return h.join(c, "node").select(
        "node",
        F.col("cash").cast("long").alias("cash_e6"),
        (F.col("hist") + F.col("cash")).cast("long").alias("opic_e6"))


def q_events_opic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OPIC after OPIC_ITERS synchronous rounds over the events click-graph:
    (node, cash_e6, opic_e6 = history + cash)."""
    nodes, edges, _ = _pr_graph(spark, sf_dir)
    return opic_scores(nodes, edges).select(
        F.col("node").cast("long"), "cash_e6", "opic_e6")


def opic_frontier_scores(results: DataFrame,
                         iters: int = OPIC_ITERS) -> DataFrame:
    """The engine bridge: OPIC over a finished crawl's internal-link graph
    → (url, score) rows for ``SparkWebEngine.run(score_overrides=...)``.
    Two-phase pattern: a budgeted discovery crawl builds the graph, OPIC
    ranks it, the main best-first crawl spends its budget on importance —
    the link-structure prioritization the reference's scorers
    (bff_strategy.py:19,130) never have. Scale: the graph reduces to
    (src, dst) url pairs before any shuffle; each round is the PageRank
    join shape."""
    edges = (
        results.select(F.col("url").alias("src"),
                       F.explode("links.internal").alias("l"))
        .select("src", F.col("l.href").alias("dst"))
        .filter(F.col("dst").isNotNull())
    )
    nodes = (results.select(F.col("url").alias("node"))
             .union(edges.select(F.col("dst").alias("node")))
             .distinct())
    return opic_scores(nodes, edges, iters=iters).select(
        F.col("node").alias("url"),
        (F.col("opic_e6").cast("double") / 1e6).alias("score"))


def _sql_opic_round(t: int) -> str:
    prev_c, prev_h, prev_v = f"c{t}", f"h{t}", f"v{t}"
    return f"""
s{t} AS (
  SELECT c.node, c.cash, CAST(COALESCE(d.d, 0) AS BIGINT) AS d,
         c.cash // (CAST(COALESCE(d.d, 0) AS BIGINT) + 1) AS share
  FROM {prev_c} c LEFT JOIN outdeg d ON d.src = c.node
), h{t + 1} AS (
  SELECT h.node, CAST(h.hist + c.cash AS BIGINT) AS hist
  FROM {prev_h} h JOIN {prev_c} c ON c.node = h.node
), vd{t} AS (
  SELECT (SELECT v FROM {prev_v}) // (SELECT n FROM nn) AS vdist,
         (SELECT v FROM {prev_v})
           - (SELECT n FROM nn)
             * ((SELECT v FROM {prev_v}) // (SELECT n FROM nn)) AS vrem
), c{t + 1} AS (
  SELECT n.node,
         CAST(COALESCE(i.s, 0) + (SELECT vdist FROM vd{t}) AS BIGINT) AS cash
  FROM nodes n
  LEFT JOIN (SELECT e.dst, sum(s.share) AS s
             FROM edges e JOIN s{t} s ON s.node = e.src
             GROUP BY e.dst) i ON i.dst = n.node
), v{t + 1} AS (
  SELECT CAST((SELECT vrem FROM vd{t})
              + (SELECT sum(cash - d * share) FROM s{t}) AS BIGINT) AS v
)"""


SQL_EVENTS_OPIC = f"""
WITH ev AS (
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
), outdeg AS (
  SELECT src, count(*) AS d FROM edges GROUP BY src
), nn AS (
  SELECT count(*) AS n FROM nodes
), c0 AS (
  SELECT node, CAST(1000000 AS BIGINT) AS cash FROM nodes
), h0 AS (
  SELECT node, CAST(0 AS BIGINT) AS hist FROM nodes
), v0 AS (
  SELECT CAST(0 AS BIGINT) AS v
),{",".join(_sql_opic_round(i) for i in range(OPIC_ITERS))}
SELECT CAST(h.node AS BIGINT) AS node,
       CAST(c.cash AS BIGINT) AS cash_e6,
       CAST(h.hist + c.cash AS BIGINT) AS opic_e6
FROM h{OPIC_ITERS} h JOIN c{OPIC_ITERS} c ON c.node = h.node
"""


# ---------------------------------------------------------------------------
# TrustRank (Gyöngyi, Garcia-Molina & Pedersen, VLDB 2004): the anti-spam
# ranking a production crawler runs NEXT TO PageRank — PageRank with the
# teleport restricted to a human-vetted trusted seed set, so trust decays
# with link distance from the seeds and link-farm islands that inflate raw
# PageRank get ~0. The reference has no link-structure ranking at all (its
# best-first scorers — bff_strategy.py:19,130 — are URL-local); this is the
# crawl-native spam defense a 10^10-page frontier needs.
#
# Same exact-integer e6 scheme as q_events_pagerank, with the static part
# made seed-conditional: r0 = seed ? 1e6 : 0;
#   r_{t+1}(i) = (seed_i ? 150000 : 0) + 850000 * inflow_t(i) div 1e6,
#   inflow_t(i) = sum over edges u→i (multiplicity kept) of r_t(u) div d_u.
# The paper normalizes the teleport vector by 1/|seeds|; that is a global
# constant every score scales by, so the integer form drops it — ranking
# (and the spam-gap guard in tests/test_trustrank.py) is invariant, the
# OPIC/DSIR per-corpus-constant trick. Seed set here: node % 5 == 0, the
# deterministic stand-in for the paper's oracle-assessed whitelist (the
# seam a deployment replaces with its curated list).
#
# Scale shape per round: identical to a PageRank round — one equi-join of
# the node-keyed rank table on edge src + one groupBy dst; the seed
# indicator is a pure expression on the node key, no extra join. Dangling
# mass dropped (the deterministic variant, as in q_events_pagerank).
# ---------------------------------------------------------------------------

TRUSTRANK_ITERS = 3
TR_SEED_MOD = 5


def q_events_trustrank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TrustRank after TRUSTRANK_ITERS rounds: (node, is_seed,
    trust_e6). Non-seed nodes unreachable from the seed set in
    TRUSTRANK_ITERS hops score exactly 0."""
    nodes, edges, outdeg = _pr_graph(spark, sf_dir)
    seed = (F.col("node") % TR_SEED_MOD == 0)
    base = F.when(seed, F.lit(PR_BASE_E6)).otherwise(F.lit(0)).cast("long")
    r = nodes.withColumn(
        "r", F.when(seed, F.lit(1_000_000)).otherwise(F.lit(0)).cast("long"))
    for _ in range(TRUSTRANK_ITERS):
        contrib = (
            edges.join(r.withColumnRenamed("node", "src"), "src")
            .join(outdeg, "src")
            .select("dst", F.expr("r div d").alias("c"))
        )
        s = contrib.groupBy("dst").agg(F.sum("c").alias("s"))
        r = (
            nodes.join(s, nodes["node"] == s["dst"], "left")
            .select("node",
                    (base + F.expr(f"CAST({PR_DAMP_E6} * coalesce(s, 0) "
                                   f"div 1000000 AS BIGINT)")).alias("r"))
        )
    return r.select(
        F.col("node").cast("long"),
        (F.col("node") % TR_SEED_MOD == 0).alias("is_seed"),
        F.col("r").cast("long").alias("trust_e6"))


def _sql_tr_round(prev: str, cur: str) -> str:
    return f"""
{cur} AS (
  SELECT n.node,
         CAST((CASE WHEN n.node % {TR_SEED_MOD} = 0
                    THEN {PR_BASE_E6} ELSE 0 END)
              + {PR_DAMP_E6} * COALESCE(s.s, 0) // 1000000
              AS BIGINT) AS r
  FROM nodes n
  LEFT JOIN (
    SELECT e.dst, sum(p.r // d.d) AS s
    FROM edges e
    JOIN {prev} p ON p.node = e.src
    JOIN outdeg d ON d.src = e.src
    GROUP BY e.dst
  ) s ON s.dst = n.node
)"""


SQL_EVENTS_TRUSTRANK = f"""
WITH ev AS (
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
), outdeg AS (
  SELECT src, count(*) AS d FROM edges GROUP BY src
), t0 AS (
  SELECT node,
         CAST(CASE WHEN node % {TR_SEED_MOD} = 0 THEN 1000000 ELSE 0 END
              AS BIGINT) AS r
  FROM nodes
),{",".join(_sql_tr_round(f"t{i}", f"t{i + 1}")
            for i in range(TRUSTRANK_ITERS))}
SELECT CAST(node AS BIGINT) AS node,
       node % {TR_SEED_MOD} = 0 AS is_seed,
       CAST(r AS BIGINT) AS trust_e6
FROM t{TRUSTRANK_ITERS}
"""


# ---------------------------------------------------------------------------
# Label propagation communities (Raghavan, Albert & Kumara 2007): the
# near-linear community detector a host-graph pipeline runs to find site
# clusters / link farms — the natural sibling of the connected-components
# path (clusterq large-star) when edge DENSITY, not mere reachability,
# should define the groups. Deterministic synchronous variant: every node
# starts as its own label; each round it adopts the label with the largest
# total edge multiplicity among its neighbors (both directions — the
# undirected reading of the click graph), ties broken by the SMALLEST
# label, isolated nodes keep their label. Synchronous + total tie order =
# exact, engine-independent rounds (the known LPA oscillation on bipartite
# structure is bounded by the fixed round count; the async variant trades
# determinism for convergence and is documented out).
#
# Scale shape per round: one equi-join of the node-keyed label table onto
# the symmetrized edge list + one (node, label) aggregate + one
# per-node arg-max window over that aggregate's rows (bounded by the
# node's distinct neighbor-label count, not the corpus). Labels are node
# ids, so the state is 2 longs per node forever.
# ---------------------------------------------------------------------------

LABELPROP_ITERS = 3


def q_events_labelprop(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(node, community) after LABELPROP_ITERS deterministic synchronous
    label-propagation rounds over the undirected click graph."""
    nodes, edges, _ = _pr_graph(spark, sf_dir)
    sym = edges.unionAll(
        edges.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
    lab = nodes.withColumn("lab", F.col("node"))
    w = Window.partitionBy("node").orderBy(F.desc("c"), F.asc("lab"))
    for _ in range(LABELPROP_ITERS):
        cnt = (
            sym.join(lab.withColumnRenamed("node", "src"), "src")
            .groupBy(F.col("dst").alias("node"), "lab")
            .agg(F.count("*").alias("c"))
        )
        pick = (cnt.withColumn("rn", F.row_number().over(w))
                .filter(F.col("rn") == 1)
                .select("node", F.col("lab").alias("new_lab")))
        lab = (
            lab.join(pick, "node", "left")
            .select("node",
                    F.coalesce("new_lab", "lab").cast("long").alias("lab"))
        )
    return lab.select(F.col("node").cast("long"),
                      F.col("lab").cast("long").alias("community"))


def _sql_lp_round(prev: str, t: int) -> str:
    return f"""
cnt{t} AS (
  SELECT e.dst AS node, p.lab AS lab, count(*) AS c
  FROM sym e JOIN {prev} p ON p.node = e.src
  GROUP BY e.dst, p.lab
), pick{t} AS (
  SELECT node, lab,
         row_number() OVER (PARTITION BY node ORDER BY c DESC, lab ASC) AS rn
  FROM cnt{t}
), l{t} AS (
  SELECT q.node, CAST(COALESCE(p.lab, q.lab) AS BIGINT) AS lab
  FROM {prev} q
  LEFT JOIN (SELECT node, lab FROM pick{t} WHERE rn = 1) p
    ON p.node = q.node
)"""


SQL_EVENTS_LABELPROP = f"""
WITH ev AS (
  SELECT user_id, ts, event_id,
         CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
  FROM events
), e0 AS (
  SELECT k AS src,
         lead(k) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS dst
  FROM ev
), edges AS (
  SELECT src, dst FROM e0 WHERE dst IS NOT NULL
), sym AS (
  SELECT src, dst FROM edges
  UNION ALL
  SELECT dst AS src, src AS dst FROM edges
), nodes AS (
  SELECT DISTINCT k AS node FROM ev
), l0 AS (
  SELECT node, CAST(node AS BIGINT) AS lab FROM nodes
),{",".join(_sql_lp_round(f"l{i}", i + 1)
            for i in range(LABELPROP_ITERS))}
SELECT CAST(node AS BIGINT) AS node, CAST(lab AS BIGINT) AS community
FROM l{LABELPROP_ITERS}
"""


# ---------------------------------------------------------------------------
# Link reciprocity (Davison 2000, "Recognizing nepotistic links on the
# Web"): the fraction of a node's distinct out-links that link straight
# back. Organic linking is largely asymmetric; link-exchange rings and
# nepotistic site families reciprocate heavily, so per-node reciprocity is
# the cheap first-order spam feature fed to TrustRank seed selection /
# demotion. Self-loops excluded (a page linking itself is navigation, not
# nepotism).
#
# Scale shape: edges reduce to DISTINCT (src, dst) pairs first (one
# aggregate — multiplicity is irrelevant to the measure), then ONE
# self-equi-join on the swapped key pair (left-semi: only existence of the
# reverse edge matters) and one src-keyed aggregate. Never cartesian; at
# 10^10 edges both sides shuffle on the same composite key.
# ---------------------------------------------------------------------------


def q_link_reciprocity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(node, n_out, n_reciprocal, reciprocity_e6) per node with at least
    one non-self distinct out-edge."""
    _, edges, _ = _pr_graph(spark, sf_dir)
    e = (edges.filter(F.col("src") != F.col("dst"))
         .select("src", "dst").distinct())
    rev = e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    recip = e.join(rev, ["src", "dst"], "left_semi")
    n_out = e.groupBy(F.col("src").alias("node")).agg(
        F.count("*").cast("long").alias("n_out"))
    n_rec = recip.groupBy(F.col("src").alias("node")).agg(
        F.count("*").cast("long").alias("n_reciprocal"))
    return (
        n_out.join(n_rec, "node", "left")
        .select(F.col("node").cast("long"), "n_out",
                F.coalesce("n_reciprocal", F.lit(0)).cast("long")
                .alias("n_reciprocal"))
        .withColumn("reciprocity_e6",
                    F.expr("n_reciprocal * 1000000 div n_out").cast("long"))
    )


SQL_LINK_RECIPROCITY = """
WITH ev AS (
  SELECT user_id, ts, event_id,
         CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
  FROM events
), e0 AS (
  SELECT k AS src,
         lead(k) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS dst
  FROM ev
), e AS (
  SELECT DISTINCT src, dst FROM e0 WHERE dst IS NOT NULL AND src != dst
), recip AS (
  SELECT a.src, a.dst FROM e a
  WHERE EXISTS (SELECT 1 FROM e b WHERE b.src = a.dst AND b.dst = a.src)
)
SELECT CAST(e.src AS BIGINT) AS node,
       CAST(count(*) AS BIGINT) AS n_out,
       CAST(COALESCE(r.nr, 0) AS BIGINT) AS n_reciprocal,
       CAST(COALESCE(r.nr, 0) * 1000000 // count(*) AS BIGINT)
         AS reciprocity_e6
FROM e
LEFT JOIN (SELECT src, count(*) AS nr FROM recip GROUP BY src) r
  ON r.src = e.src
GROUP BY e.src, r.nr
"""


# ----------------------------------------------------------- spam mass
# Link-spam detection by mass estimation (Gyöngyi, Garcia-Molina,
# Pedersen — VLDB 2006): a page's SPAM MASS is the fraction of its
# PageRank that does NOT survive when teleportation is restricted to a
# trusted core — relative mass M~(p) = (PR(p) - PR+(p)) / PR(p), where
# PR+ is the trust-seeded rank. The repo's q_events_pagerank and
# q_events_trustrank already share the identical integer-e6 operator,
# iteration count (3) and PER-NODE teleport base (seeds keep the same
# 0.15 share PageRank gives every node — exactly the paper's v+ = good
# indicator / N, no renormalization), so trust_e6 <= rank_e6 holds
# EXACTLY per node by monotonicity of the shared integer rounds and the
# subtraction is well-defined in pure integer arithmetic.
# Scale shape: the two rank queries' plans (per-round edge equi-join +
# dst aggregate) plus ONE node-keyed join — nothing new shuffles.

SPAM_MASS_T_E6 = 700_000


def q_events_spam_mass(spark: SparkSession, sf_dir: str) -> DataFrame:
    pr = q_events_pagerank(spark, sf_dir)
    tr = q_events_trustrank(spark, sf_dir)
    return (pr.join(tr, "node")
            .withColumn("mass_e6", F.expr("rank_e6 - trust_e6"))
            .withColumn("rel_mass_e6", F.expr(
                "(rank_e6 - trust_e6) * 1000000 div rank_e6"))
            .withColumn("is_spammy", F.expr(
                f"NOT is_seed AND"
                f" (rank_e6 - trust_e6) * 1000000 div rank_e6"
                f" >= {SPAM_MASS_T_E6}"))
            .select("node", "rank_e6", "trust_e6", "is_seed",
                    "mass_e6", "rel_mass_e6", "is_spammy"))


SQL_EVENTS_SPAM_MASS = f"""
WITH pr AS (SELECT * FROM ({SQL_EVENTS_PAGERANK})),
tr AS (SELECT * FROM ({SQL_EVENTS_TRUSTRANK}))
SELECT pr.node, pr.rank_e6, tr.trust_e6, tr.is_seed,
       pr.rank_e6 - tr.trust_e6 AS mass_e6,
       (pr.rank_e6 - tr.trust_e6) * 1000000 // pr.rank_e6 AS rel_mass_e6,
       (NOT tr.is_seed AND
        (pr.rank_e6 - tr.trust_e6) * 1000000 // pr.rank_e6
          >= {SPAM_MASS_T_E6}) AS is_spammy
FROM pr JOIN tr ON tr.node = pr.node
"""


QUERIES = {
    "agg_pricing_summary": q_agg_pricing_summary,
    "join_top_customers": q_join_top_customers,
    "window_order_ranks": q_window_order_ranks,
    "sessionize_events": q_sessionize_events,
    "events_windowed_counts": q_events_windowed_counts,
    "events_pagerank": q_events_pagerank,
    "events_hits": q_events_hits,
    "events_salsa": q_events_salsa,
    "events_opic": q_events_opic,
    "events_trustrank": q_events_trustrank,
    "events_labelprop": q_events_labelprop,
    "link_reciprocity": q_link_reciprocity,
    "events_spam_mass": q_events_spam_mass,
}
ORACLES = {
    "agg_pricing_summary": SQL_AGG_PRICING_SUMMARY,
    "join_top_customers": SQL_JOIN_TOP_CUSTOMERS,
    "window_order_ranks": SQL_WINDOW_ORDER_RANKS,
    "sessionize_events": SQL_SESSIONIZE_EVENTS,
    "events_windowed_counts": SQL_EVENTS_WINDOWED_COUNTS,
    "events_pagerank": SQL_EVENTS_PAGERANK,
    "events_hits": SQL_EVENTS_HITS,
    "events_salsa": SQL_EVENTS_SALSA,
    "events_opic": SQL_EVENTS_OPIC,
    "events_trustrank": SQL_EVENTS_TRUSTRANK,
    "events_labelprop": SQL_EVENTS_LABELPROP,
    "link_reciprocity": SQL_LINK_RECIPROCITY,
    "events_spam_mass": SQL_EVENTS_SPAM_MASS,
}
