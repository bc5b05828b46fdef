"""trap_detect (ops/trapq.py) vs an independent from-spec reimplementation
of the URL synthesis + pattern collapse + fan-out verdict. The exact DuckDB
oracle runs in test_ops_parity; this also asserts the detector's semantics:
the calendar family is flagged, the article family never is."""

import hashlib
import re
from collections import defaultdict

import pyarrow.parquet as pq

from crawl4ai_spark.ops.trapq import (
    TRAP_DIVERSITY_X, TRAP_MIN_URLS, q_trap_detect)

SF = "/root/testdata/sf0.001"


def _md5(s: str) -> str:
    return hashlib.md5(s.encode()).hexdigest()


def _naive():
    doc_ids = pq.read_table(
        f"{SF}/documents.parquet", columns=["doc_id"])["doc_id"].to_pylist()
    urls: dict = defaultdict(lambda: (set(), set()))
    for doc_id in doc_ids:
        host = f"www.site{doc_id % 3}.com"
        fam = doc_id % 4
        q = doc_id // 12
        if fam == 0:
            url, ck = f"/article/{doc_id}", _md5(f"a{doc_id}")
        elif fam == 1:
            url = f"/cal/{2000 + q % 30}/{1 + (q // 30) % 12}"
            ck = _md5(f"c{q % 7}")
        elif fam == 2:
            url, ck = f"/list/page/{q % 40}", _md5(f"l{q % 5}")
        else:
            url, ck = "/about", _md5("about")
        us, cs = urls[(host, re.sub(r"[0-9]+", "#", url))]
        us.add(url)
        cs.add(ck)
    out = {}
    for (host, pattern), (us, cs) in urls.items():
        n_u, n_c = len(us), len(cs)
        out[(host, pattern)] = (
            n_u, n_c, n_u * 1_000_000 // n_c,
            n_u >= TRAP_MIN_URLS and n_c * TRAP_DIVERSITY_X <= n_u)
    return out


def test_trap_detect_matches_independent_impl(spark):
    want = _naive()
    got = {(r.host, r.pattern): (r.n_urls, r.n_contents, r.fanout_e6, r.trap)
           for r in q_trap_detect(spark, SF).collect()}
    assert got == want
    # detector semantics: every calendar pattern is a trap, no article
    # pattern ever is, and both verdicts occur
    for (host, pattern), (_, _, _, trap) in got.items():
        if pattern.startswith("/cal/"):
            assert trap
        if pattern.startswith("/article/"):
            assert not trap
    assert {t for *_, t in got.values()} == {True, False}
