"""events_hits (ops/analytics.py) vs an independent from-spec
reimplementation over the same click-graph — integer HITS with per-half-
round max normalization (score * 1e6 // max), 3 rounds. The exact DuckDB
oracle runs in test_ops_parity; this guards against mirrored-into-both-
engines errors."""

import json
from collections import defaultdict

import pyarrow.parquet as pq

from crawl4ai_spark.ops.analytics import HITS_ITERS, q_events_hits

SF = "/root/testdata/sf0.001"


def _naive_hits():
    df = pq.read_table(f"{SF}/events.parquet").to_pandas()
    df["k"] = df["props"].map(lambda p: int(json.loads(p)["k"]))
    edges = []
    for _, g in df.groupby("user_id"):
        ks = g.sort_values(["ts", "event_id"])["k"].tolist()
        edges += list(zip(ks, ks[1:]))
    nodes = sorted(df["k"].unique())

    def scale(raw):
        mx = max(raw.values())
        return {n: raw[n] * 1_000_000 // mx for n in nodes}

    h = {n: 1_000_000 for n in nodes}
    a = None
    for _ in range(HITS_ITERS):
        raw = defaultdict(int)
        for src, dst in edges:  # edges kept with multiplicity
            raw[dst] += h[src]
        a = scale({n: raw.get(n, 0) for n in nodes})
        raw = defaultdict(int)
        for src, dst in edges:
            raw[src] += a[dst]
        h = scale({n: raw.get(n, 0) for n in nodes})
    return {n: (a[n], h[n]) for n in nodes}


def test_hits_matches_independent_impl(spark):
    want = _naive_hits()
    got = {r.node: (r.authority_e6, r.hub_e6)
           for r in q_events_hits(spark, SF).collect()}
    assert got == want
    # the graph differentiates nodes, and the max-normalized tops hit 1e6
    assert len({v for v, _ in got.values()}) > 1
    assert max(v for v, _ in got.values()) == 1_000_000
    assert max(v for _, v in got.values()) == 1_000_000
