"""length_quantiles (ops/textstats.py) vs an independent from-spec
reimplementation: per-language log2-histogram disc-quantiles computed with
int.bit_length + a plain sorted cumsum. Also asserts the bucket bound
semantics (p_lo_chars = 2^(bucket-1) <= true disc-quantile < 2^bucket)."""

from collections import Counter, defaultdict

import pyarrow.parquet as pq

from crawl4ai_spark.ops.textstats import QUANTILES_E2, q_length_quantiles

SF = "/root/testdata/sf0.001"


def _naive():
    tab = pq.read_table(f"{SF}/documents.parquet",
                        columns=["lang", "n_chars"]).to_pandas()
    hists: dict = defaultdict(Counter)
    lens: dict = defaultdict(list)
    for lang, n in zip(tab["lang"], tab["n_chars"]):
        hists[lang][max(int(n).bit_length(), 1)] += 1  # bin(0) = '0', len 1
        lens[lang].append(int(n))
    out = {}
    for lang, hist in hists.items():
        n = sum(hist.values())
        cum, row = 0, [n, len(hist)]
        marks = {}
        for b in sorted(hist):
            cum += hist[b]
            for q in QUANTILES_E2:
                if q not in marks and cum * 100 >= n * q:
                    marks[q] = b
        for q in QUANTILES_E2:
            row += [marks[q], 1 << (marks[q] - 1)]
        out[lang] = tuple(row)
    return out, lens


def test_length_quantiles_matches_independent_impl(spark):
    want, lens = _naive()
    got = {}
    for r in q_length_quantiles(spark, SF).collect():
        row = [r.n_docs, r.n_buckets]
        for q in QUANTILES_E2:
            row += [r[f"p{q}_bucket"], r[f"p{q}_lo_chars"]]
        got[r.lang] = tuple(row)
    assert got == want
    # bucket-resolution contract: the true disc-quantile lies in
    # [p_lo_chars, 2 * p_lo_chars)
    import math
    for lang, vals in lens.items():
        vals.sort()
        n = len(vals)
        row = dict(zip(["n", "nb"] + [f"{c}{q}" for q in QUANTILES_E2
                                      for c in ("b", "lo")], got[lang]))
        for q in QUANTILES_E2:
            true_q = vals[math.ceil(q * n / 100) - 1]
            assert row[f"lo{q}"] <= true_q < 2 * row[f"lo{q}"]
