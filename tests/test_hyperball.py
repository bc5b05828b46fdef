"""events_harmonic_hyperball (ops/graphq.py) vs an independent from-spec
reimplementation: exact BFS in-balls per node on the same click-graph, each
ball sketched with a from-scratch HLL (the test_hll.py register spec), then
the identical clamped 1/t-weighted harmonic sum. HyperBall's iterated
max-merge must equal the HLL of the exact t-ball because max-merge is exact
set union on registers — so every ball estimate and harmonic_e6 must match
integer-for-integer. The chained-CTE DuckDB oracle runs in test_ops_parity;
this guards against mirrored-into-both-engines errors."""

import hashlib
import json
from collections import defaultdict

import pyarrow.parquet as pq

from crawl4ai_spark.ops.graphq import HB_ITERS, q_events_harmonic_hyperball
from crawl4ai_spark.ops.textstats import HLL_M, HLL_RHO_CAP, _HLL_LC

SF = "/root/testdata/sf0.001"
_ALPHA = 0.7181089 * 65536 * 4294967296


def _graph():
    df = pq.read_table(f"{SF}/events.parquet").to_pandas()
    df["k"] = df["props"].map(lambda p: int(json.loads(p)["k"]))
    radj = defaultdict(set)  # v -> predecessors u with edge u -> v
    for _, g in df.groupby("user_id"):
        ks = g.sort_values(["ts", "event_id"])["k"].tolist()
        for src, dst in zip(ks, ks[1:]):
            radj[dst].add(src)
    return sorted(df["k"].unique()), radj


def _register(u):
    h = hashlib.md5(str(u).encode()).hexdigest()
    bucket = int(h[:2], 16)
    bits = int(h[2:18], 16)
    rho = (HLL_RHO_CAP if bits == 0
           else min(HLL_RHO_CAP, 64 - bits.bit_length() + 1))
    return bucket, rho


def _estimate(ball):
    regs: dict = {}
    for u in ball:
        b, r = _register(u)
        regs[b] = max(regs.get(b, 0), r)
    empty = HLL_M - len(regs)
    s_occ = sum(1 << (32 - r) for r in regs.values())
    raw = int(_ALPHA / (empty * 4294967296 + s_occ) + 0.5)  # ROUND half-up
    if empty > 0 and raw <= int(2.5 * HLL_M):
        return _HLL_LC[empty - 1]
    return raw


def _naive():
    nodes, radj = _graph()
    out = {}
    for v in nodes:
        ball, frontier = {v}, {v}
        prev = _estimate(ball)
        balls, harmonic = [], 0
        for t in range(1, HB_ITERS + 1):
            grown = set()
            for x in frontier:
                grown |= radj.get(x, set())
            frontier = grown - ball
            ball |= grown
            bt = _estimate(ball)
            balls.append(bt)
            harmonic += max(bt - prev, 0) * 1_000_000 // t
            prev = bt
        out[v] = (tuple(balls), harmonic)
    return out


def test_hyperball_matches_exact_bfs_balls(spark):
    want = _naive()
    got = {r.node: (tuple(r[f"ball_t{t}"] for t in range(1, HB_ITERS + 1)),
                    r.harmonic_e6)
           for r in q_events_harmonic_hyperball(spark, SF).collect()}
    assert got == want
    # the graph actually differentiates nodes, and balls are monotone
    assert len({h for _, h in got.values()}) > 1
    for balls, _ in got.values():
        assert all(b >= 1 for b in balls)
