"""events_labelprop (ops/analytics.py) vs an independent from-spec
reimplementation — deterministic synchronous label propagation (Raghavan
et al. 2007): undirected edges with multiplicity, per-round arg-max
neighbor label with smallest-label tie-break, isolated nodes keep their
label. The exact DuckDB oracle runs in test_ops_parity; this guards
against mirrored-into-both-engines errors."""

import json
from collections import defaultdict

import pyarrow.parquet as pq

from crawl4ai_spark.ops.analytics import LABELPROP_ITERS, q_events_labelprop

SF = "/root/testdata/sf0.001"


def _naive_labelprop():
    df = pq.read_table(f"{SF}/events.parquet").to_pandas()
    df["k"] = df["props"].map(lambda p: int(json.loads(p)["k"]))
    edges = []
    for _, g in df.groupby("user_id"):
        ks = g.sort_values(["ts", "event_id"])["k"].tolist()
        edges += list(zip(ks, ks[1:]))
    sym = edges + [(d, s) for s, d in edges]
    nodes = sorted(df["k"].unique())
    lab = {n: n for n in nodes}
    for _ in range(LABELPROP_ITERS):
        cnt: dict[int, dict[int, int]] = defaultdict(lambda: defaultdict(int))
        for src, dst in sym:  # multiplicity kept
            cnt[dst][lab[src]] += 1
        nxt = {}
        for n in nodes:
            if cnt[n]:
                # max count, ties to the smallest label
                nxt[n] = min(cnt[n], key=lambda L: (-cnt[n][L], L))
            else:
                nxt[n] = lab[n]
        lab = nxt
    return lab


def test_labelprop_matches_independent_impl(spark):
    want = _naive_labelprop()
    got = {r.node: r.community for r in q_events_labelprop(spark, SF).collect()}
    assert got == want
    # propagation actually merged labels: fewer communities than nodes,
    # but more than one (the click graph is neither complete nor empty)
    n_comm = len(set(got.values()))
    assert 1 < n_comm < len(got)
