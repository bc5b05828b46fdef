"""refresh_schedule (ops/refreshq.py) vs an independent from-spec
reimplementation: Cho & Garcia-Molina change-rate estimation over the same
deterministic fetch history, with math.log computed directly (not via the
module's precomputed table) so a table error would be caught. The exact
DuckDB oracle runs in test_ops_parity."""

import hashlib
import math

import pyarrow.parquet as pq

from crawl4ai_spark.ops.refreshq import (
    HOT_E6, MAX_VISITS, MIN_VISITS, WARM_E6, q_refresh_schedule)

SF = "/root/testdata/sf0.001"


def _naive():
    doc_ids = pq.read_table(
        f"{SF}/documents.parquet", columns=["doc_id"])["doc_id"].to_pylist()
    out = {}
    for doc_id in doc_ids:
        n = MIN_VISITS + doc_id % (MAX_VISITS - MIN_VISITS + 1)
        propensity = doc_id % 11
        x = 0
        for i in range(1, n + 1):
            nib = int(hashlib.md5(f"{doc_id}:{i}".encode()).hexdigest()[0], 16)
            x += 1 if nib < propensity else 0
        lam = round(-math.log((n - x + 0.5) / (n + 0.5)) * 1e6)
        age = 1 + (doc_id * 7) % 30
        pri = lam * age
        bucket = "hot" if pri >= HOT_E6 else ("warm" if pri >= WARM_E6
                                              else "cold")
        out[doc_id] = (n, x, lam, age, pri, bucket)
    return out


def test_refresh_schedule_matches_independent_impl(spark):
    want = _naive()
    got = {r.doc_id: (r.n_visits, r.n_changes, r.lambda_e6, r.age_days,
                      r.priority_e6, r.bucket)
           for r in q_refresh_schedule(spark, SF).collect()}
    assert got == want
    # the history differentiates pages, and every bucket is exercised
    assert {b for *_, b in got.values()} == {"hot", "warm", "cold"}
    # never-changed pages estimate a zero rate; changed-every-visit pages
    # still get a FINITE rate (the +0.5 correction caps -ln at X = n)
    assert all(lam == 0 for n, x, lam, *_ in got.values() if x == 0)
    full = [(n, lam) for n, x, lam, *_ in got.values() if x == n]
    assert full and all(
        lam == round(-math.log(0.5 / (n + 0.5)) * 1e6) for n, lam in full)
