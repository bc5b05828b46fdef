"""events_trustrank (ops/analytics.py) vs an independent from-spec
reimplementation over the same click-graph — integer TrustRank (seed-only
teleport, e6 fixed point, 3 rounds, seed set node % 5 == 0). The exact
DuckDB oracle runs in test_ops_parity; this guards against
mirrored-into-both-engines errors."""

import json
from collections import defaultdict

import pyarrow.parquet as pq

from crawl4ai_spark.ops.analytics import (
    PR_BASE_E6,
    PR_DAMP_E6,
    TR_SEED_MOD,
    TRUSTRANK_ITERS,
    q_events_trustrank,
)

SF = "/root/testdata/sf0.001"


def _graph():
    df = pq.read_table(f"{SF}/events.parquet").to_pandas()
    df["k"] = df["props"].map(lambda p: int(json.loads(p)["k"]))
    edges = []
    for _, g in df.groupby("user_id"):
        ks = g.sort_values(["ts", "event_id"])["k"].tolist()
        edges += list(zip(ks, ks[1:]))
    return sorted(df["k"].unique()), edges


def _naive_trustrank():
    nodes, edges = _graph()
    outdeg = defaultdict(int)
    for src, _ in edges:
        outdeg[src] += 1
    r = {n: 1_000_000 if n % TR_SEED_MOD == 0 else 0 for n in nodes}
    for _ in range(TRUSTRANK_ITERS):
        inflow = defaultdict(int)
        for src, dst in edges:  # multiplicity kept
            inflow[dst] += r[src] // outdeg[src]
        r = {n: (PR_BASE_E6 if n % TR_SEED_MOD == 0 else 0)
             + PR_DAMP_E6 * inflow.get(n, 0) // 1_000_000
             for n in nodes}
    return r


def test_trustrank_matches_independent_impl(spark):
    want = _naive_trustrank()
    rows = q_events_trustrank(spark, SF).collect()
    got = {r.node: r.trust_e6 for r in rows}
    assert got == want
    # seed flags are the node % TR_SEED_MOD rule
    assert all(r.is_seed == (r.node % TR_SEED_MOD == 0) for r in rows)


def test_trustrank_seed_locality(spark):
    """Trust concentrates near the seeds: the seed-set mean must beat the
    non-seed mean (trust decays with link distance from the whitelist —
    the property that makes TrustRank a spam filter, and what
    distinguishes it from uniform-teleport PageRank)."""
    rows = q_events_trustrank(spark, SF).collect()
    seeds = [r.trust_e6 for r in rows if r.is_seed]
    rest = [r.trust_e6 for r in rows if not r.is_seed]
    assert seeds and rest
    assert sum(seeds) / len(seeds) > sum(rest) / len(rest)
    # scores differentiate (the graph is not symmetric under the seed set)
    assert len({r.trust_e6 for r in rows}) > 1
