"""CosineClusterExtraction — the runnable CosineStrategy analog (E14).

Reference: ``CosineStrategy`` at
/root/reference/crawl4ai/extraction_strategy.py:135-492. Pipeline
(``extract``, :404-476): split the input on ``DEL`` (:64 ``"<|DEL|>"``) →
optional semantic pre-filter (:244-296) → hierarchical clustering, default
``linkage_method='ward'`` cut at ``max_dist`` (:354-377) → group chunks by
label retaining document order → drop clusters with fewer than
``word_count_threshold`` words (:379-402) → ``[{"index", "tags",
"content"}]`` sorted by cluster id (:470-476).

Differences from the reference, pinned and documented:
- The sentence-transformer embedder and the multilabel tag classifier need
  model weights this sandbox doesn't have. The default ``embedder`` is the
  deterministic feature-hash embedding (functions/cluster.py — the same
  definition the SQL oracles compute); passing ``embedder="model"`` raises
  ``NotImplementedError`` exactly like the declared stubs in llm_stubs.py.
  ``tags`` is always ``[]`` (the reference fills it from the classifier).
- Cluster ids: the reference exposes scipy's fcluster numbering; ours is the
  min chunk index of each cluster (deterministic, engine-independent — the
  same scheme the relational queries and their DuckDB oracles use).

The heavy-lift distributed form of this strategy is ops/clusterq.py
(``cosine_cluster_ward`` / ``cosine_cluster_chunks``); this class is the
row-local API surface, usable inside the engine's extraction stage.
"""

from __future__ import annotations

from typing import Callable

import numpy as np

from crawl4ai_spark.functions.cluster import (
    cosine_distance_matrix,
    cut_by_distance,
    feature_hash_embed,
    single_linkage_components,
    tokenize,
    ward_linkage,
)

DEL = "<|DEL|>"   # reference extraction_strategy.py:64


class CosineClusterExtraction:
    def __init__(
        self,
        semantic_filter: str | None = None,
        word_count_threshold: int = 10,
        max_dist: float = 0.2,
        linkage_method: str = "ward",
        sim_threshold: float = 0.3,
        at_least_k: int = 20,
        embed_dim: int = 16,
        embedder: str | Callable[[list[str]], np.ndarray] = "hash",
    ):
        if embedder == "model":
            raise NotImplementedError(
                "CosineClusterExtraction(embedder='model') needs a "
                "sentence-embedding model, which this environment does not "
                "ship; use the default deterministic 'hash' embedder or "
                "inject a callable."
            )
        if linkage_method not in ("ward", "single"):
            raise ValueError(f"unsupported linkage_method {linkage_method!r}")
        self.semantic_filter = semantic_filter
        self.word_count_threshold = word_count_threshold
        self.max_dist = max_dist
        self.linkage_method = linkage_method
        self.sim_threshold = sim_threshold
        self.at_least_k = at_least_k
        self.embed_dim = embed_dim
        self._embed = (
            embedder if callable(embedder)
            else (lambda chunks: np.vstack(
                [feature_hash_embed(tokenize(c), self.embed_dim)
                 for c in chunks]) if chunks else np.zeros((0, self.embed_dim)))
        )

    # -- reference filter_documents_embeddings (:244-296) -------------------
    def _prefilter(self, chunks: list[str]) -> list[str]:
        if not self.semantic_filter:
            return chunks
        k = self.at_least_k
        if len(chunks) < k:
            k = len(chunks) // 2
        qv = feature_hash_embed(tokenize(self.semantic_filter), self.embed_dim)
        X = self._embed(chunks)
        qn = float(np.sqrt(qv @ qv))
        norms = np.sqrt((X * X).sum(axis=1))
        safe = np.where(norms == 0.0, 1.0, norms)
        sims = (X @ qv) / (safe * qn) if qn else np.zeros(len(chunks))
        sims = np.where(norms == 0.0, 0.0, sims)
        passing = [(c, s) for c, s in zip(chunks, sims) if s >= self.sim_threshold]
        if len(passing) < k:
            rest = [(c, s) for c, s in zip(chunks, sims) if s < self.sim_threshold]
            rest.sort(key=lambda x: x[1], reverse=True)   # stable, like ref
            passing.extend(rest[: k - len(passing)])
        return [c for c, _ in passing[:k]]

    def _labels(self, X: np.ndarray) -> np.ndarray:
        n = X.shape[0]
        if n == 1:
            return np.zeros(1, dtype=np.int64)
        d = cosine_distance_matrix(X)
        if self.linkage_method == "ward":
            return cut_by_distance(n, ward_linkage(d), self.max_dist)
        edges = [(i, j) for i in range(n) for j in range(i + 1, n)
                 if d[i, j] <= self.max_dist]
        return single_linkage_components(n, edges)

    def extract(self, url: str, text: str) -> list[dict]:
        chunks = text.split(DEL)
        chunks = self._prefilter(chunks)
        if not chunks:
            return []
        labels = self._labels(self._embed(chunks))
        clusters: dict[int, list[str]] = {}
        for idx, lbl in enumerate(labels):
            clusters.setdefault(int(lbl), []).append(chunks[idx])
        out = []
        for lbl in sorted(clusters):
            content = " ".join(clusters[lbl])
            if len(content.split()) < self.word_count_threshold:
                continue
            out.append({"index": int(lbl), "tags": [], "content": content})
        return out

    def run(self, url: str, sections: list[str]) -> list[dict]:
        return self.extract(url, DEL.join(sections))
