"""events_pagerank (ops/analytics.py) vs an independent from-spec
reimplementation over the same click-graph — integer damped PageRank,
dangling mass dropped, 3 rounds. The exact DuckDB oracle runs in
test_ops_parity; this guards against mirrored-into-both-engines errors."""

import json
from collections import Counter, defaultdict

import pyarrow.parquet as pq

from crawl4ai_spark.ops.analytics import (
    PAGERANK_ITERS, PR_BASE_E6, PR_DAMP_E6, q_events_pagerank)

SF = "/root/testdata/sf0.001"


def _naive_pagerank():
    df = pq.read_table(f"{SF}/events.parquet").to_pandas()
    df["k"] = df["props"].map(lambda p: int(json.loads(p)["k"]))
    edges = []
    for _, g in df.groupby("user_id"):
        ks = g.sort_values(["ts", "event_id"])["k"].tolist()
        edges += list(zip(ks, ks[1:]))
    nodes = sorted(df["k"].unique())
    outdeg = Counter(src for src, _ in edges)
    r = {n: 1_000_000 for n in nodes}
    for _ in range(PAGERANK_ITERS):
        s: dict = defaultdict(int)
        for src, dst in edges:
            s[dst] += r[src] // outdeg[src]  # ranks/degrees positive: // ok
        r = {n: PR_BASE_E6 + PR_DAMP_E6 * s.get(n, 0) // 1_000_000
             for n in nodes}
    return r


def test_pagerank_matches_independent_impl(spark):
    want = _naive_pagerank()
    got = {r.node: r.rank_e6 for r in q_events_pagerank(spark, SF).collect()}
    assert got == want
    # sanity: the graph actually differentiates nodes
    assert len(set(got.values())) > 1
    # every node present, including any with no in-edges (rank = base +
    # damped 0 = 150000)
    assert set(got) == set(want)
