"""Sequence packing (ops/pipelineq.py q_pack_sequences): the two-phase
distributed prefix sum must equal a plain single-threaded cumulative sum —
that is the whole contract (partitioning must not leak into the values)."""

import pyarrow.parquet as pq

from crawl4ai_spark.ops.pipelineq import PACK_BUDGET, q_pack_sequences

SF = "/root/testdata/sf0.001"


def test_pack_matches_sequential_cumsum(spark):
    import re
    df = pq.read_table(f"{SF}/documents.parquet").to_pandas() \
           .sort_values("doc_id").reset_index(drop=True)
    want = {}
    cum = 0
    for doc_id, text in zip(df["doc_id"], df["text"]):
        n = len(re.findall(r"[a-z0-9]+", text.lower()))
        want[doc_id] = (n, (cum) // PACK_BUDGET, cum % PACK_BUDGET)
        cum += n

    got = {r.doc_id: (r.n_tokens, r.seq_id, r.seq_offset)
           for r in q_pack_sequences(spark, SF).collect()}
    assert got == want
    # packing is dense: seq ids cover 0..max with no gaps
    seqs = sorted({v[1] for v in got.values()})
    assert seqs == list(range(seqs[-1] + 1))
    # every doc starts inside the budget window of its sequence
    assert all(0 <= v[2] < PACK_BUDGET for v in got.values())


def test_shuffle_epoch_matches_sequential_rank(spark):
    """The two-phase distributed rank must equal the single-threaded
    sort rank over md5(EPOCH_SALT || seq_id) — and the positions must
    form an exact permutation of 0..n_seqs-1."""
    import hashlib
    import re

    from crawl4ai_spark.ops.pipelineq import EPOCH_SALT, q_shuffle_epoch

    df = pq.read_table(f"{SF}/documents.parquet").to_pandas() \
           .sort_values("doc_id").reset_index(drop=True)
    seqs = {}
    cum = 0
    for text in df["text"]:
        n = len(re.findall(r"[a-z0-9]+", text.lower()))
        sid = cum // PACK_BUDGET
        nd, nt = seqs.get(sid, (0, 0))
        seqs[sid] = (nd + 1, nt + n)
        cum += n
    order = sorted(
        seqs, key=lambda s: hashlib.md5(
            f"{EPOCH_SALT}{s}".encode()).hexdigest())
    want = {sid: (seqs[sid][0], seqs[sid][1], pos)
            for pos, sid in enumerate(order)}

    got = {r.seq_id: (r.n_docs, r.n_tokens, r.pos)
           for r in q_shuffle_epoch(spark, SF).collect()}
    assert got == want
    assert sorted(v[2] for v in got.values()) == list(range(len(got)))
    # the permutation is actually shuffled, not identity
    assert order != sorted(seqs)
