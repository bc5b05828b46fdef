"""Clustering primitives for the CosineStrategy analog (E14).

Reference behavior (public code, read-only):
- ``CosineStrategy.hierarchical_clustering``
  /root/reference/crawl4ai/extraction_strategy.py:354-377 — pdist(cosine) →
  scipy ``linkage(method=linkage_method)`` → ``fcluster(max_dist,
  criterion='distance')``. Default ``linkage_method='ward'``, ``max_dist=0.2``.
- ``CosineStrategy.filter_clusters_by_word_count`` (:379-402) — keep clusters
  whose concatenated text has ≥ ``word_count_threshold`` words.

scipy/sklearn are absent in this sandbox, so the agglomerative machinery is
implemented from scratch:

- Ward linkage via the Lance-Williams recurrence (public textbook formula;
  identical to what scipy applies when handed a precomputed non-Euclidean
  distance matrix). Merge order ties break deterministically on the smallest
  (cluster-id, cluster-id) pair — scipy's internal tie order is not
  reproducible here, so ours is pinned and documented instead.
- The distance cut (``criterion='distance'``) unions merges with height ≤ t
  in merge order; Ward under Lance-Williams is reducible hence monotone, so
  this equals the cophenetic cut.
- Single linkage at threshold t == connected components of the ≤t graph —
  that variant is what the SQL-oracle-checked queries use (ops/clusterq.py),
  because transitive closure is expressible as a recursive CTE while Ward is
  not.

Embeddings: the sandbox has no sentence-transformer, so the default embedder
is deterministic feature hashing (public technique): dim *i* of a chunk is
``sum over tokens of (hexval(md5(f"{tok}_{i}")[0]) - 7.5)`` — exactly the
expression the relational queries and their DuckDB oracles compute, so the
pure-Python, Arrow-UDF, and SQL paths agree bit-for-bit.
"""

from __future__ import annotations

import hashlib
import re

import numpy as np

_TOKEN_RE = re.compile(r"[a-z0-9]+")

_HEX = "0123456789abcdef"


def tokenize(text: str) -> list[str]:
    """The suite-wide token rule: ``[a-z0-9]+`` runs of lowercased text."""
    return _TOKEN_RE.findall(text.lower())


def _tok_weight(tok: str, i: int) -> float:
    return _HEX.index(hashlib.md5(f"{tok}_{i}".encode()).hexdigest()[0]) - 7.5


def feature_hash_embed(tokens: list[str], dim: int) -> np.ndarray:
    """Deterministic bag-of-words hash embedding (sum of per-token weights).

    Matches the relational definition in ops/clusterq.py exactly: every value
    is a sum of (integer - 7.5) terms, i.e. an exact dyadic rational, so
    float summation order cannot change the result.
    """
    v = np.zeros(dim, dtype=np.float64)
    for tok in tokens:
        for i in range(dim):
            v[i] += _tok_weight(tok, i)
    return v


def cosine_distance_matrix(X: np.ndarray) -> np.ndarray:
    """Square matrix of pairwise cosine distances (1 - cos). Zero vectors get
    distance 1 to everything (cos treated as 0), matching SQL NULL-avoidance."""
    norms = np.sqrt((X * X).sum(axis=1))
    safe = np.where(norms == 0.0, 1.0, norms)
    cos = (X @ X.T) / np.outer(safe, safe)
    zero = norms == 0.0
    cos[zero, :] = 0.0
    cos[:, zero] = 0.0
    d = 1.0 - cos
    np.fill_diagonal(d, 0.0)
    return d


def ward_linkage(dist: np.ndarray) -> list[tuple[int, int, float]]:
    """Agglomerative Ward linkage over a precomputed distance matrix.

    Returns the merge list [(a, b, height)] in merge order, where a/b are
    cluster ids (leaves 0..n-1, merge k creates id n+k — scipy's id scheme).
    Lance-Williams update for Ward:
        d(k, i∪j)² = ((n_i+n_k) d(k,i)² + (n_j+n_k) d(k,j)² - n_k d(i,j)²) / N
    with N = n_i + n_j + n_k. Ties on the minimum distance break on the
    smallest (id_a, id_b) pair (deterministic; scipy's order differs).
    """
    n = dist.shape[0]
    if n == 0:
        return []
    d2 = dist.astype(np.float64) ** 2
    np.fill_diagonal(d2, np.inf)
    active = list(range(n))            # positions into d2
    ids = list(range(n))               # cluster id at each position
    sizes = np.ones(n, dtype=np.float64)
    merges: list[tuple[int, int, float]] = []
    for step in range(n - 1):
        sub = d2[np.ix_(active, active)]
        iu = np.triu_indices(len(active), k=1)
        vals = sub[iu]
        m = vals.min()
        # ties on the minimum → smallest (id_a, id_b) pair, deterministic
        cand = np.flatnonzero(vals == m)
        best = min(
            cand,
            key=lambda c: (min(ids[active[iu[0][c]]], ids[active[iu[1][c]]]),
                           max(ids[active[iu[0][c]]], ids[active[iu[1][c]]])),
        )
        pi, pj = int(iu[0][best]), int(iu[1][best])
        i, j = active[pi], active[pj]
        ia, ja = ids[i], ids[j]
        hij2 = d2[i, j]
        ni, nj = sizes[i], sizes[j]
        merges.append((min(ia, ja), max(ia, ja), float(np.sqrt(hij2))))
        # Lance-Williams update into position i; retire position j
        rest = np.array([k for k in active if k != i and k != j], dtype=np.int64)
        if rest.size:
            nk = sizes[rest]
            nd = ((ni + nk) * d2[i, rest] + (nj + nk) * d2[j, rest]
                  - nk * hij2) / (ni + nj + nk)
            d2[i, rest] = nd
            d2[rest, i] = nd
        sizes[i] = ni + nj
        ids[i] = n + step
        active.remove(j)
    return merges


def cut_by_distance(n: int, merges: list[tuple[int, int, float]],
                    t: float) -> np.ndarray:
    """fcluster(criterion='distance') analog: union merges with height ≤ t in
    merge order; labels = min leaf index of each component (pinned scheme —
    scipy renumbers clusters by leaf order, which we don't reproduce).
    Heights are monotone (Ward is reducible), so any merge ≤ t only ever
    references sub-clusters that were themselves formed ≤ t."""
    parent = list(range(n))

    def find(x: int) -> int:
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b, h in merges:
        if h > t:
            continue
        # a/b may be internal ids; resolve to any leaf member
        la = _leaf_of(a, merges, n)
        lb = _leaf_of(b, merges, n)
        ra, rb = find(la), find(lb)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    labels = np.fromiter((find(i) for i in range(n)), dtype=np.int64, count=n)
    return labels


def _leaf_of(cid: int, merges: list[tuple[int, int, float]], n: int) -> int:
    """Any leaf under cluster id ``cid`` (ids ≥ n are merge products)."""
    while cid >= n:
        cid = merges[cid - n][0]
    return cid


def single_linkage_components(n: int,
                              edges: list[tuple[int, int]]) -> np.ndarray:
    """Connected components via union-find; label = min member index.
    Single-linkage fcluster at threshold t over the ≤t edge set is exactly
    this (the SQL oracle states it as a recursive-CTE transitive closure)."""
    parent = list(range(n))

    def find(x: int) -> int:
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return np.fromiter((find(i) for i in range(n)), dtype=np.int64, count=n)
