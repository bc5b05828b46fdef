"""redirect_resolve (ops/redirectq.py) vs an independent from-spec chain
walker: every acyclic source lands on its block head with the exact hop
count; every source in a looped block is flagged is_cycle with NULL final.
The exact DuckDB oracle runs in test_ops_parity."""

import pyarrow.parquet as pq

from crawl4ai_spark.ops.redirectq import q_redirect_resolve

SF = "/root/testdata/sf0.001"


def _naive():
    doc_ids = set(pq.read_table(
        f"{SF}/documents.parquet", columns=["doc_id"])["doc_id"].to_pylist())
    edges = {}
    for d in doc_ids:
        if d % 5 != 0:
            edges[d] = d - 1
        elif (d // 5) % 17 == 3:
            edges[d] = d + 2
    out = {}
    for src in edges:
        cur, hops, seen = src, 0, set()
        while cur in edges and cur not in seen:
            seen.add(cur)
            cur = edges[cur]
            hops += 1
        if cur in edges:  # stopped because a node repeated -> loop
            out[src] = (None, None, True)
        else:
            out[src] = (cur, hops, False)
    return out


def test_redirect_resolve_matches_chain_walker(spark):
    want = _naive()
    got = {r.src: (r.final, r.hops, r.is_cycle)
           for r in q_redirect_resolve(spark, SF).collect()}
    assert got == want
    # both verdict classes occur; acyclic chains land on block heads with
    # 1..4 hops
    assert any(c for _, _, c in got.values())
    acyclic = [(f, h) for f, h, c in got.values() if not c]
    assert acyclic
    assert all(f % 5 == 0 and 1 <= h <= 4 for f, h in acyclic)
