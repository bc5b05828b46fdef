"""Distributed Lloyd k-means (ops/similarity.py q_sim_kmeans_train) vs an
independent single-machine reimplementation — same init (first K by
vec_id), same integer-e6 arithmetic, same tie/empty-cluster rules, written
from the spec rather than from the operator. The exact DuckDB oracle runs
in test_ops_parity; this guards against a mirrored-into-both-engines error
in the distributed partial-sum fold."""

import numpy as np
import pyarrow.parquet as pq

from crawl4ai_spark.ops.similarity import (
    DIM, KMEANS_ITERS, N_CENTROIDS, q_sim_kmeans_train)

SF = "/root/testdata/sf0.001"


def _naive_lloyd(x: np.ndarray):
    xe = np.round(x.astype(np.float64) * 1e6).astype(np.int64)
    cents = xe[:N_CENTROIDS].copy()
    assign = None
    for _ in range(KMEANS_ITERS):
        d = ((xe[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
        assign = d.argmin(axis=1)  # first min = smallest cid on ties
        for c in range(N_CENTROIDS):
            m = assign == c
            if not m.any():
                continue  # emptied cluster keeps its previous centroid
            s = xe[m].sum(axis=0)
            n = int(m.sum())
            cents[c] = np.sign(s) * (np.abs(s) // n)  # trunc toward zero
    counts = np.bincount(assign, minlength=N_CENTROIDS)
    return cents, counts


def test_kmeans_matches_independent_impl(spark):
    t = pq.read_table(f"{SF}/embeddings.parquet")
    df = t.to_pandas().sort_values("vec_id").reset_index(drop=True)
    x = np.array(df["embedding"].tolist(), dtype=np.float64)
    want_c, want_n = _naive_lloyd(x)

    got = q_sim_kmeans_train(spark, SF).collect()
    assert len(got) == N_CENTROIDS * DIM
    for r in got:
        assert r.val_e6 == int(want_c[r.centroid_id, r.pos]), \
            (r.centroid_id, r.pos)
        assert r.n_members == int(want_n[r.centroid_id]), r.centroid_id
    # sanity: training moved at least one centroid off its init vector
    init_e6 = np.round(x[:N_CENTROIDS] * 1e6).astype(np.int64)
    assert (want_c != init_e6).any()
    # and every vector landed somewhere: member counts cover the corpus
    assert int(want_n.sum()) == len(df)
