"""events_kcore (ops/graphq.py) vs exact Batagelj-Zaversnik peeling: the
truncated h-index iteration must have reached its fixpoint (= the true
coreness) on the test graph, and the degree column must be the exact
undirected simple-graph degree. The peel here is a fully independent
implementation (heap-based min-degree removal) so a mirrored error in the
h-index expressions would be caught."""

import heapq
from collections import defaultdict

import duckdb

from crawl4ai_spark.ops.graphq import KCORE_ITERS, q_events_kcore

SF = "/root/testdata/sf0.001"


def _graph():
    arcs = duckdb.sql(f"""
    WITH ev AS (
      SELECT user_id, ts, event_id,
             CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
      FROM '{SF}/events.parquet'
    ), e0 AS (
      SELECT k AS src,
             lead(k) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS dst
      FROM ev
    ), edges AS (SELECT src, dst FROM e0 WHERE dst IS NOT NULL)
    SELECT DISTINCT src, dst FROM (
      SELECT src, dst FROM edges
      UNION ALL SELECT dst, src FROM edges) b WHERE src <> dst
    """).fetchall()
    nodes = {r[0] for r in duckdb.sql(
        f"SELECT DISTINCT CAST(json_extract_string(props, '$.k') AS BIGINT)"
        f" FROM '{SF}/events.parquet'").fetchall()}
    nbrs: dict = defaultdict(set)
    for s, d in arcs:
        nbrs[s].add(d)
    return nodes, nbrs


def _peel(nodes, nbrs):
    deg = {v: len(nbrs[v]) for v in nodes}
    live = dict(deg)
    heap = [(d, v) for v, d in deg.items()]
    heapq.heapify(heap)
    removed: set = set()
    core: dict = {}
    cur = 0
    while heap:
        d, v = heapq.heappop(heap)
        if v in removed or d != live[v]:
            continue  # stale heap entry
        cur = max(cur, d)
        core[v] = cur
        removed.add(v)
        for u in nbrs[v]:
            if u not in removed:
                live[u] -= 1
                heapq.heappush(heap, (live[u], u))
    return deg, core


def _hindex_rounds(nodes, nbrs, deg):
    """How many h-index rounds until fixpoint — must be < KCORE_ITERS so the
    fixed-round Spark/DuckDB form is already exact on this graph."""
    def hindex(vals):
        h = 0
        for i, v in enumerate(sorted(vals, reverse=True), 1):
            h = max(h, min(i, v))
        return h
    c = dict(deg)
    for t in range(1, 100):
        nc = {v: hindex([c[u] for u in nbrs[v]]) if nbrs[v] else 0
              for v in nodes}
        if nc == c:
            return t
        c = nc
    raise AssertionError("h-index iteration did not converge in 100 rounds")


def test_kcore_matches_exact_peeling(spark):
    nodes, nbrs = _graph()
    deg, core = _peel(nodes, nbrs)
    assert _hindex_rounds(nodes, nbrs, deg) <= KCORE_ITERS
    got = {r["node"]: (r["degree"], r["coreness"])
           for r in q_events_kcore(spark, SF).collect()}
    assert got == {v: (deg[v], core[v]) for v in nodes}
    # coreness is bounded by degree everywhere and the max core is dense
    assert all(c <= d for d, c in got.values())
    assert max(c for _, c in got.values()) >= 2
