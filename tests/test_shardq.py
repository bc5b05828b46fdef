"""shard_rendezvous (ops/shardq.py) vs a from-spec HRW reimplementation,
plus the rendezvous-hashing contract itself: (a) minimal disruption — a
host moves on an N→N+1 resize iff the NEW shard index wins its weight
race, so exactly the movers land on shard N; (b) every shard is used;
(c) the moved fraction is near 1/(N+1). The exact DuckDB oracle runs in
test_ops_parity."""

import hashlib

import pyarrow.parquet as pq

from crawl4ai_spark.ops.shardq import (
    SHARD_HOST_MOD,
    SHARD_N,
    q_shard_rendezvous,
)

SF = "/root/testdata/sf0.001"


def _hrw(host: str, n: int) -> int:
    return max(range(n),
               key=lambda k: hashlib.md5(f"{host}|{k}".encode()).hexdigest())


def _naive():
    ids = pq.read_table(f"{SF}/documents.parquet", columns=["doc_id"])
    hosts: dict[str, int] = {}
    for doc_id in ids["doc_id"].to_pylist():
        h = f"site{doc_id % SHARD_HOST_MOD}.example"
        hosts[h] = hosts.get(h, 0) + 1
    return {
        h: (n, _hrw(h, SHARD_N), _hrw(h, SHARD_N + 1))
        for h, n in hosts.items()
    }


def test_shard_rendezvous_matches_independent_impl(spark):
    want = _naive()
    rows = q_shard_rendezvous(spark, SF).collect()
    got = {r.host: (r.n_docs, r.shard_n, r.shard_n1) for r in rows}
    assert got == want
    assert all(r.moved == (r.shard_n != r.shard_n1) for r in rows)


def test_shard_rendezvous_contract(spark):
    rows = q_shard_rendezvous(spark, SF).collect()
    # (a) minimal disruption: movers are exactly the hosts the NEW shard wins
    for r in rows:
        assert r.moved == (r.shard_n1 == SHARD_N)
    # (b) all N shards carry load at this host count
    assert {r.shard_n for r in rows} == set(range(SHARD_N))
    # (c) moved fraction ~ 1/(N+1): generous 2x band — the value is
    # deterministic (md5), the band just keeps the assertion SF-portable
    frac = sum(r.moved for r in rows) / len(rows)
    assert 0.5 / (SHARD_N + 1) < frac < 2.0 / (SHARD_N + 1)
