"""link_reciprocity (ops/analytics.py) vs a from-spec reimplementation —
distinct non-self edges, n_reciprocal = out-neighbors that link back.
The exact DuckDB oracle runs in test_ops_parity."""

import json
from collections import defaultdict

import pyarrow.parquet as pq

from crawl4ai_spark.ops.analytics import q_link_reciprocity

SF = "/root/testdata/sf0.001"


def _naive():
    df = pq.read_table(f"{SF}/events.parquet").to_pandas()
    df["k"] = df["props"].map(lambda p: int(json.loads(p)["k"]))
    e = set()
    for _, g in df.groupby("user_id"):
        ks = g.sort_values(["ts", "event_id"])["k"].tolist()
        e.update((a, b) for a, b in zip(ks, ks[1:]) if a != b)
    out = defaultdict(set)
    for s, d in e:
        out[s].add(d)
    return {s: (len(ds), sum(1 for d in ds if (d, s) in e))
            for s, ds in out.items()}


def test_reciprocity_matches_independent_impl(spark):
    want = _naive()
    rows = q_link_reciprocity(spark, SF).collect()
    got = {r.node: (r.n_out, r.n_reciprocal) for r in rows}
    assert got == want
    for r in rows:
        assert r.reciprocity_e6 == r.n_reciprocal * 1_000_000 // r.n_out
    # the measure differentiates: some nodes reciprocate, some don't
    vals = {r.n_reciprocal for r in rows}
    assert 0 in vals and max(vals) >= 1
