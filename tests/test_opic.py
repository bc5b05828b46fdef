"""events_opic (ops/analytics.py) vs an independent from-spec
reimplementation of batch-synchronous OPIC (Abiteboul, Preda & Cobena,
WWW 2003) over the same click-graph — integer cash/history rounds with a
virtual page absorbing shares, remainders, and dangling mass. The exact
DuckDB oracle runs in test_ops_parity; this guards against
mirrored-into-both-engines errors and asserts the paper's conservation
invariant (total cash = N * 1e6, exactly, every round)."""

import json
from collections import defaultdict

import pyarrow.parquet as pq

from crawl4ai_spark.ops.analytics import OPIC_ITERS, q_events_opic

SF = "/root/testdata/sf0.001"


def _naive_opic():
    df = pq.read_table(f"{SF}/events.parquet").to_pandas()
    df["k"] = df["props"].map(lambda p: int(json.loads(p)["k"]))
    edges = []
    for _, g in df.groupby("user_id"):
        ks = g.sort_values(["ts", "event_id"])["k"].tolist()
        edges += list(zip(ks, ks[1:]))
    nodes = sorted(df["k"].unique())
    n = len(nodes)
    outdeg = defaultdict(int)
    for src, _ in edges:  # multiplicity kept
        outdeg[src] += 1

    cash = {x: 1_000_000 for x in nodes}
    hist = {x: 0 for x in nodes}
    v = 0
    for _ in range(OPIC_ITERS):
        share = {x: cash[x] // (outdeg[x] + 1) for x in nodes}
        for x in nodes:
            hist[x] += cash[x]
        inflow = defaultdict(int)
        for src, dst in edges:
            inflow[dst] += share[src]
        to_v = sum(cash[x] - outdeg[x] * share[x] for x in nodes)
        vdist, vrem = v // n, v - n * (v // n)
        cash = {x: inflow[x] + vdist for x in nodes}
        v = vrem + to_v
        # the paper's invariant: cash is conserved exactly
        assert sum(cash.values()) + v == n * 1_000_000
    return {x: (cash[x], hist[x] + cash[x]) for x in nodes}, v, n


def test_opic_matches_independent_impl(spark):
    want, v_final, n = _naive_opic()
    got = {r.node: (r.cash_e6, r.opic_e6)
           for r in q_events_opic(spark, SF).collect()}
    assert got == want
    # conservation holds for the query's values too (virtual cash from the
    # naive run closes the books)
    assert sum(c for c, _ in got.values()) + v_final == n * 1_000_000
    # the graph differentiates nodes, and history accrued beyond round-0 cash
    assert len({o for _, o in got.values()}) > 1
    assert max(o for _, o in got.values()) > 1_000_000
