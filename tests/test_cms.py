"""token_cms_topk (ops/textstats.py) vs an independent from-spec count-min
sketch over the same token stream — md5-derived row hashes, min-over-rows
estimate. The exact DuckDB oracle runs in test_ops_parity; this guards
against mirrored-into-both-engines errors and asserts the CMS invariants
(est >= true always; W < vocab forces real collisions)."""

import hashlib
import re
from collections import Counter, defaultdict

import pyarrow.parquet as pq

from crawl4ai_spark.ops.textstats import CMS_D, CMS_W, q_token_cms_topk

SF = "/root/testdata/sf0.001"


def _bucket(d: int, tok: str) -> int:
    return int(hashlib.md5(f"{d}:{tok}".encode()).hexdigest()[:8], 16) % CMS_W


def _naive_cms():
    tab = pq.read_table(f"{SF}/documents.parquet").to_pandas()
    toks = []
    for t in tab["text"]:
        toks += re.findall(r"[a-z0-9]+", t.lower())
    true = Counter(toks)
    cells: dict = defaultdict(int)
    for tok, c in true.items():
        for d in range(CMS_D):
            cells[(d, _bucket(d, tok))] += c
    return {tok: (c, min(cells[(d, _bucket(d, tok))] for d in range(CMS_D)))
            for tok, c in true.items()}


def test_cms_matches_independent_impl(spark):
    want = _naive_cms()
    got = {r.tok: (r.true_cnt, r.est_cnt, r.overestimated)
           for r in q_token_cms_topk(spark, SF).collect()}
    assert {t: (a, b) for t, (a, b, _) in got.items()} == want
    # CMS invariants: estimate never undercounts; overestimated flag is
    # consistent; W < vocab so at least one collision overestimates
    assert all(est >= true for true, est, _ in got.values())
    assert all(over == (est > true) for true, est, over in got.values())
    assert len(got) > CMS_W
    assert any(over for _, _, over in got.values())
