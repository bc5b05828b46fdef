"""events_salsa (ops/analytics.py) vs an independent from-spec
reimplementation over the same click-graph — integer SALSA (Lempel &
Moran 2000): per-degree share division BEFORE propagation (the TKC fix),
per-half-round max normalization (score * 1e6 // max), 3 rounds. The
exact DuckDB oracle runs in test_ops_parity; this guards against
mirrored-into-both-engines errors."""

import json
from collections import defaultdict

import pyarrow.parquet as pq

from crawl4ai_spark.ops.analytics import (
    SALSA_ITERS,
    q_events_hits,
    q_events_salsa,
)

SF = "/root/testdata/sf0.001"


def _graph():
    df = pq.read_table(f"{SF}/events.parquet").to_pandas()
    df["k"] = df["props"].map(lambda p: int(json.loads(p)["k"]))
    edges = []
    for _, g in df.groupby("user_id"):
        ks = g.sort_values(["ts", "event_id"])["k"].tolist()
        edges += list(zip(ks, ks[1:]))
    nodes = sorted(df["k"].unique())
    return nodes, edges


def _naive_salsa():
    nodes, edges = _graph()
    outdeg = defaultdict(int)
    indeg = defaultdict(int)
    for s, d in edges:  # multiplicity kept, matching the Spark edge table
        outdeg[s] += 1
        indeg[d] += 1

    def scale(raw):
        mx = max(raw.values())
        return {n: raw[n] * 1_000_000 // mx for n in nodes}

    h = {n: 1_000_000 for n in nodes}
    a = None
    for _ in range(SALSA_ITERS):
        raw = defaultdict(int)
        for src, dst in edges:
            raw[dst] += h[src] // outdeg[src]
        a = scale({n: raw.get(n, 0) for n in nodes})
        raw = defaultdict(int)
        for src, dst in edges:
            raw[src] += a[dst] // indeg[dst]
        h = scale({n: raw.get(n, 0) for n in nodes})
    return {n: (a[n], h[n]) for n in nodes}


def test_salsa_matches_independent_impl(spark):
    want = _naive_salsa()
    got = {r.node: (r.salsa_authority_e6, r.salsa_hub_e6)
           for r in q_events_salsa(spark, SF).collect()}
    assert got == want
    # differentiated scores; normalized tops hit exactly 1e6
    assert len({v for v, _ in got.values()}) > 1
    assert max(v for v, _ in got.values()) == 1_000_000
    assert max(v for _, v in got.values()) == 1_000_000


def test_salsa_differs_from_hits(spark):
    """The degree normalization must actually change the ranking signal —
    if SALSA's authority vector equals HITS' on this graph, the share
    division silently became a no-op."""
    salsa = {r.node: r.salsa_authority_e6
             for r in q_events_salsa(spark, SF).collect()}
    hits = {r.node: r.authority_e6
            for r in q_events_hits(spark, SF).collect()}
    assert salsa != hits
