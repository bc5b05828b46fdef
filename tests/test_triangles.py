"""events_triangles (ops/graphq.py) vs a brute-force from-spec counter —
degree-ordered edge-iterator triangle counting + local clustering
coefficient. The DuckDB oracle runs in test_ops_parity; this guards
against a mirrored-into-both-engines orientation or double-count error."""

import json
from itertools import combinations

import pyarrow.parquet as pq

from crawl4ai_spark.ops.graphq import q_events_triangles

SF = "/root/testdata/sf0.001"


def _undirected_adj():
    df = pq.read_table(f"{SF}/events.parquet").to_pandas()
    df["k"] = df["props"].map(lambda p: int(json.loads(p)["k"]))
    adj: dict[int, set[int]] = {}
    for _, g in df.groupby("user_id"):
        ks = g.sort_values(["ts", "event_id"])["k"].tolist()
        for a, b in zip(ks, ks[1:]):
            if a != b:
                adj.setdefault(a, set()).add(b)
                adj.setdefault(b, set()).add(a)
    for k in set(df["k"]):
        adj.setdefault(k, set())
    return adj


def _naive():
    adj = _undirected_adj()
    n_tri = {v: 0 for v in adj}
    for v, nbrs in adj.items():
        for a, b in combinations(sorted(nbrs), 2):
            if b in adj[a]:
                n_tri[v] += 1  # each triangle counted once per corner here
    # combinations at v enumerates each of v's triangles exactly once
    out = {}
    for v in adj:
        d = len(adj[v])
        cc = 2 * n_tri[v] * 1_000_000 // (d * (d - 1)) if d >= 2 else 0
        out[v] = (d, n_tri[v], cc)
    return out


def test_triangles_match_bruteforce(spark):
    want = _naive()
    got = {r.node: (r.degree, r.n_tri, r.cc_e6)
           for r in q_events_triangles(spark, SF).collect()}
    assert got == want
    # the statistic must be non-degenerate on this graph
    assert sum(t for _, t, _ in got.values()) > 0
    # global invariant: corner counts sum to 3x the triangle total
    assert sum(t for _, t, _ in got.values()) % 3 == 0
