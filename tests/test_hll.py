"""HLL sketch (ops/textstats.py): register semantics against a from-spec
reimplementation, and estimate accuracy against the exact distinct count.
The DuckDB parity runs in test_ops_parity; these pin the spec."""

import hashlib

import pyarrow.parquet as pq

from crawl4ai_spark.ops.textstats import (
    HLL_M, HLL_RHO_CAP, q_text_hll_estimate, q_text_hll_registers)

SF = "/root/testdata/sf0.001"


def _naive_registers():
    df = pq.read_table(f"{SF}/documents.parquet").to_pandas()
    regs: dict = {}
    for lang, text in zip(df["lang"], df["text"]):
        h = hashlib.md5(text.encode()).hexdigest()
        bucket = int(h[:2], 16)
        bits = int(h[2:18], 16)
        if bits == 0:
            rho = HLL_RHO_CAP
        else:
            rho = min(HLL_RHO_CAP, 64 - bits.bit_length() + 1)
        key = (lang, bucket)
        regs[key] = max(regs.get(key, 0), rho)
    return regs


def test_hll_registers_match_spec(spark):
    want = _naive_registers()
    got = {(r.lang, r.bucket): r.register
           for r in q_text_hll_registers(spark, SF).collect()}
    assert got == want


def test_hll_estimate_accuracy(spark):
    rows = q_text_hll_estimate(spark, SF).collect()
    assert rows
    for r in rows:
        assert r.n_exact > 0
        err = abs(r.hll_estimate - r.n_exact) / r.n_exact
        # m=256 gives ~1.04/sqrt(m) = 6.5% std error; linear counting
        # covers the small-range regime. 3 sigma bound.
        assert err < 0.20, (r.lang, r.hll_estimate, r.n_exact)
