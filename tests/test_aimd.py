"""AIMD politeness controller (ops/scheduling.py q_politeness_aimd) —
from-spec sequential-fold parity for the deferred-floor semantics, plus
the controller properties that make it AIMD."""

import hashlib
from collections import defaultdict

from crawl4ai_spark.ops.scheduling import (
    AIMD_A,
    AIMD_MAX,
    AIMD_MAXV,
    AIMD_MIN,
    AIMD_R0,
    q_politeness_aimd,
)

SF = "/root/testdata/sf0.001"


def _fail(event_id: int) -> bool:
    return int(hashlib.md5(str(event_id).encode()).hexdigest()[:2], 16) < 64


def _spec_fold(events):
    """Sequential from-spec fold: track F (failures) and S (2^F-weighted
    success mass); rate_t = clamp((R0 + A*S) div 2^F)."""
    out = {}
    per_host = defaultdict(list)
    for event_id, host in sorted(events):
        per_host[host].append(event_id)
    for host, eids in per_host.items():
        f = s = 0
        for visit, eid in enumerate(eids[:AIMD_MAXV], start=1):
            if _fail(eid):
                f += 1
            else:
                s += 1 << f
            rate = max(AIMD_MIN, min(AIMD_MAX, (AIMD_R0 + AIMD_A * s) >> f))
            out[eid] = (host, visit, int(_fail(eid)), f, rate,
                        1_000_000 // max(rate, 1))
    return out


def test_matches_from_spec_fold(spark):
    from crawl4ai_spark.ops.common import tbl

    events = [(r.event_id, r.user_id % 40)
              for r in tbl(spark, SF, "events")
              .select("event_id", "user_id").collect()]
    want = _spec_fold(events)
    got = {r.event_id: (r.host_id, r.visit, r.fail, r.n_failures,
                        r.rate, r.delay_ms)
           for r in q_politeness_aimd(spark, SF).collect()}
    assert got == want and got


def test_controller_properties(spark):
    rows = sorted(q_politeness_aimd(spark, SF).collect(),
                  key=lambda r: (r.host_id, r.visit))
    by_host = defaultdict(list)
    for r in rows:
        by_host[r.host_id].append(r)
    saw_decrease = saw_increase = False
    for host_rows in by_host.values():
        prev = None
        for r in host_rows:
            assert AIMD_MIN <= r.rate <= AIMD_MAX
            if prev is not None:
                if r.fail and prev.rate > AIMD_MIN:
                    # multiplicative decrease (up to clamp/additive term)
                    assert r.rate <= prev.rate
                    saw_decrease |= r.rate < prev.rate
                if not r.fail and prev.rate < AIMD_MAX:
                    # additive increase
                    assert r.rate >= prev.rate
                    saw_increase |= r.rate > prev.rate
            prev = r
    assert saw_decrease and saw_increase


def test_failure_free_host_ramps_linearly():
    # all-success closed form: rate_t = R0 + A*t (until the ceiling)
    f = s = 0
    for t in range(1, 10):
        s += 1 << f
        rate = max(AIMD_MIN, min(AIMD_MAX, (AIMD_R0 + AIMD_A * s) >> f))
        assert rate == min(AIMD_MAX, AIMD_R0 + AIMD_A * t)


def test_all_failure_host_floors():
    f = s = 0
    rate = None
    for _ in range(12):
        f += 1
        rate = max(AIMD_MIN, min(AIMD_MAX, (AIMD_R0 + AIMD_A * s) >> f))
    assert rate == AIMD_MIN


def test_stream_aimd_matches_batch(spark, tmp_path):
    """Per-host controller state survives micro-batch boundaries: events
    split into two in-order files produce rows identical to the batch
    query."""
    from pyspark.sql import functions as F

    from crawl4ai_spark.streaming.stream import (
        run_stream_to_memory,
        stream_politeness_aimd,
    )

    ev = spark.read.parquet(f"{SF}/events.parquet")
    mid = ev.agg(F.expr("percentile_approx(event_id, 0.5)")).collect()[0][0]
    d = tmp_path / "events"
    # split by event_id halves: per-host arrival order == event order,
    # and most hosts straddle the boundary (state must carry over)
    ev.filter(F.col("event_id") <= mid).write.parquet(str(d / "b0"))
    ev.filter(F.col("event_id") > mid).write.parquet(str(d / "b1"))

    out = stream_politeness_aimd(spark, str(d / "*" / "*.parquet"))
    run_stream_to_memory(out, "stream_aimd_t")
    got = {(r.host_id, r.event_id): (r.visit, r.fail, r.n_failures,
                                     r.rate, r.delay_ms)
           for r in spark.sql("SELECT * FROM stream_aimd_t").collect()}
    want = {(r.host_id, r.event_id): (r.visit, r.fail, r.n_failures,
                                      r.rate, r.delay_ms)
            for r in q_politeness_aimd(spark, SF).collect()}
    assert got == want and got


def test_capacity_plan_invariants(spark):
    """Capacity model: quotas derive from the AIMD final rates, drain
    estimates are exact ceilings, exactly the argmax rows flag as the
    bottleneck."""
    from crawl4ai_spark.ops.scheduling import (
        CAP_QUOTA_MAX,
        q_crawl_capacity_plan,
    )

    rows = q_crawl_capacity_plan(spark, SF).collect()
    assert rows
    finals = {}
    for r in q_politeness_aimd(spark, SF).collect():
        cur = finals.get(r.host_id)
        if cur is None or r.visit > cur[0]:
            finals[r.host_id] = (r.visit, r.rate)
    worst = max(r.gens_to_drain for r in rows)
    for r in rows:
        assert r.final_rate == finals[r.host_id][1]
        assert r.quota == max(1, min(CAP_QUOTA_MAX, r.final_rate // 1000))
        assert r.gens_to_drain == -(-r.n_queued // r.quota)
        assert r.is_bottleneck == (r.gens_to_drain == worst)
    assert any(r.is_bottleneck for r in rows)
    assert not all(r.is_bottleneck for r in rows)
