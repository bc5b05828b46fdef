"""SemDeDup (ops/similarity.py q_dedup_semantic): within-k-means-cluster
cosine near-dup verdicts. The cells come from the already-oracle-tested
q_sim_ivf_assign_trained; this guard recomputes the pairwise-cosine
verdict independently with numpy."""

import numpy as np
import pyarrow.parquet as pq

from crawl4ai_spark.ops.similarity import (
    SEMDEDUP_T_E6,
    q_dedup_semantic,
    q_sim_ivf_assign_trained,
)

SF = "/root/testdata/sf0.001"


def _round_half_away(x):
    return int(np.copysign(np.floor(abs(x) + 0.5), x))


def test_dedup_semantic_matches_from_spec(spark):
    emb = pq.read_table(f"{SF}/embeddings.parquet").to_pandas()
    X = np.array(emb["embedding"].tolist(), dtype=np.float64)
    ids = emb["vec_id"].to_numpy()
    nrm = np.sqrt((X * X).sum(axis=1))
    cells = {r.vec_id: r.centroid_id
             for r in q_sim_ivf_assign_trained(spark, SF).collect()}
    idx = {v: i for i, v in enumerate(ids)}
    want = {}
    by_cell = {}
    for v, c in cells.items():
        by_cell.setdefault(c, []).append(v)
    for c, members in by_cell.items():
        members.sort()
        for j, v2 in enumerate(members):
            n = 0
            for v1 in members[:j]:
                i1, i2 = idx[v1], idx[v2]
                cos_e6 = _round_half_away(
                    float(X[i1] @ X[i2]) / (nrm[i1] * nrm[i2]) * 1e6)
                if cos_e6 >= SEMDEDUP_T_E6:
                    n += 1
            want[v2] = (c, n, n == 0)
    got = {r.vec_id: (r.centroid_id, r.n_dups_lower, r.keep)
           for r in q_dedup_semantic(spark, SF).collect()}
    assert got == want
    assert any(not keep for _, _, keep in want.values()), \
        "threshold must actually drop some vectors on this corpus"
    assert sum(1 for _, _, keep in want.values() if keep) > len(want) // 2
