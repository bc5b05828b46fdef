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
