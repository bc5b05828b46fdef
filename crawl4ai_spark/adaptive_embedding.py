"""Adaptive crawler — embedding strategy (F19's second confidence engine).

Parity target: /root/reference/crawl4ai/adaptive_crawler.py
``EmbeddingStrategy`` (:617-1270), dispatched by
``AdaptiveConfig.strategy == "embedding"`` (:1296-1298, config fields
:179-221). The deterministic geometry is reimplemented exactly:

- query semantic space (:700-781): n_query_variations × 1.3 variations,
  original query always in train, ``max(2, 20%)`` held out for validation.
  The reference shuffles with an unseeded ``random.shuffle`` before the
  split; here the split is PINNED to generation order (documented
  divergence — the reference is not reproducible run-to-run there).
- confidence (:967-995): best cosine per train query against the KB, mean
  over queries (or hit-rate ≥ ``coverage_tau`` when set).
- coverage gaps (:820-848): per-query min cosine distance, 1.0 when the KB
  is empty.
- link selection (:850-965): for every gap still outside
  ``embedding_coverage_radius``, a link that moves the gap closer earns
  ``(gap - new_distance) * 2``; the mean over gaps-needing-help is scaled
  by ``1 - overlap_penalty`` where overlap = max KB similarity above
  ``embedding_overlap_threshold`` (penalty ``(max - thr) * 2``); an
  optional contextual score blends 80/20.
- validation (:1097-1132): held-out queries scored ``1 - min_distance``,
  mean.
- stop rule (:1134-1182): irrelevance floor (confidence below
  ``embedding_min_confidence_threshold`` once anything is crawled),
  max_pages / frontier exhaustion, then convergence — mean |Δconfidence|
  below ``embedding_min_relative_improvement × confidence`` triggers
  validation, and only a validation score above
  ``embedding_validation_min_score`` confirms the stop.
- display confidence (:1184-1211): validated runs map learning score
  0.4→0.7 onto ``quality_min``→``quality_max`` with ``scale_factor``;
  unvalidated runs report ``0.8 × learning``.
- KB admission dedup (:1213-1267): a new document enters the KB only if
  its max similarity against the EXISTING KB is below
  ``kb_similarity_threshold`` (0.95); duplicates within one batch are all
  admitted, as in the reference (the KB matrix is only extended after the
  batch loop).

Model seams (the reference calls sentence-transformers / an LLM): the
embedder defaults to the suite-wide deterministic feature-hash embedding
(functions/cluster.py — the same seam E14 uses) and the query-variation
generator defaults to a deterministic template; both are injectable.

Spark realization (the 100 TB shape): the KB lives as a DataFrame of
embedding rows and NEVER reaches the driver. Every KB-sided reduction —
best-similarity-per-query, per-link overlap, admission dedup — is one
``mapInPandas`` Arrow fold with the SMALL side (queries / candidate links /
new batch, all bounded by config) broadcast into it, emitting one partial
max row per (batch × small-side id), then a tiny groupBy max: the
treeAggregate shape, so KB growth never changes the shuffle volume.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable, Iterator, Sequence

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from crawl4ai_spark.functions.cluster import feature_hash_embed, tokenize


@dataclass
class EmbeddingAdaptiveConfig:
    """Mirror of the reference AdaptiveConfig embedding fields (:179-221)."""

    n_query_variations: int = 10
    coverage_threshold: float = 0.85
    embedding_min_confidence_threshold: float = 0.1
    embedding_coverage_radius: float = 0.2
    embedding_k_exp: float = 1.0
    embedding_overlap_threshold: float = 0.85
    embedding_min_relative_improvement: float = 0.1
    embedding_validation_min_score: float = 0.3
    embedding_quality_min_confidence: float = 0.7
    embedding_quality_max_confidence: float = 0.95
    embedding_quality_scale_factor: float = 0.833
    kb_similarity_threshold: float = 0.95
    coverage_tau: float | None = None
    max_pages: int = 20
    embed_dim: int = 64
    max_batches: int = 8
    batch_size: int = 20
    max_depth: int = 6
    per_host_quota: int = 10


def default_query_variations(query: str, n_total: int) -> list[str]:
    """Deterministic stand-in for the reference's LLM variation prompt
    (:710-737): n_total paraphrase templates over the query."""
    templates = [
        "what is {q}", "how does {q} work", "examples of {q}",
        "{q} tutorial", "{q} best practices", "why use {q}",
        "{q} vs alternatives", "common problems with {q}",
        "advanced {q} techniques", "getting started with {q}",
        "{q} reference guide", "{q} performance tuning",
        "{q} troubleshooting", "history of {q}", "{q} internals",
    ]
    out = [templates[i % len(templates)].format(q=query)
           + ("" if i < len(templates) else f" part {i // len(templates)}")
           for i in range(n_total)]
    return out


def split_queries(query: str, variations: Sequence[str]
                  ) -> tuple[list[str], list[str]]:
    """Reference split (:764-775): original query always trains; the last
    ``max(2, 20%)`` variations validate. Pinned to generation order (the
    reference shuffles unseeded — not reproducible; divergence documented
    in the module docstring)."""
    others = list(variations)
    n_val = max(2, int(len(others) * 0.2))
    return [query] + others[:-n_val], others[-n_val:]


def embed_texts(texts: Sequence[str], dim: int) -> np.ndarray:
    """Driver-side embedding of a SMALL text set (queries) via the
    deterministic feature-hash seam."""
    return np.array([feature_hash_embed(tokenize(t), dim) for t in texts],
                    dtype=np.float64)


def _normalize(mat: np.ndarray) -> np.ndarray:
    n = np.linalg.norm(mat, axis=1, keepdims=True)
    return mat / np.where(n == 0.0, 1.0, n)


_PARTIAL_SCHEMA = T.StructType([
    T.StructField("qid", T.IntegerType()),
    T.StructField("part_best", T.DoubleType()),
])


def best_sim_per_query(kb: DataFrame, q_mat: np.ndarray,
                       vec_col: str = "embedding") -> DataFrame:
    """Best cosine similarity per query row of ``q_mat`` against every KB
    vector: broadcast the (tiny) query matrix into one Arrow fold over the
    KB, emit one partial-max row per (Arrow batch × query), reduce with a
    q-row groupBy — KB vectors never shuffle (ref :967-995 vectorized
    best-per-query, distributed)."""
    qn = _normalize(np.asarray(q_mat, dtype=np.float64))
    nq = qn.shape[0]

    def fold(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            mat = np.array([np.asarray(v, dtype=np.float64)
                            for v in pdf[vec_col]])
            kbn = _normalize(mat)
            best = (qn @ kbn.T).max(axis=1)
            yield pd.DataFrame({"qid": np.arange(nq, dtype=np.int32),
                                "part_best": best})

    return (kb.select(vec_col).mapInPandas(fold, _PARTIAL_SCHEMA)
            .groupBy("qid").agg(F.max("part_best").alias("best_sim")))


def confidence_from_best(best_by_qid: dict[int, float], n_queries: int,
                         tau: float | None = None) -> float:
    """Ref :983-985: mean best similarity, or hit-rate ≥ tau when set.
    Queries with no KB row (empty KB) contribute similarity 0."""
    if n_queries == 0:
        return 0.0
    best = [best_by_qid.get(i, 0.0) for i in range(n_queries)]
    if tau is not None:
        return float(sum(1.0 for b in best if b >= tau) / n_queries)
    return float(sum(best) / n_queries)


def coverage_gaps(best_by_qid: dict[int, float], n_queries: int
                  ) -> list[float]:
    """Ref :820-848: per-query min cosine distance (1 - best sim); 1.0 when
    the KB has no rows."""
    return [1.0 - best_by_qid.get(i, 0.0) for i in range(n_queries)]


_OVERLAP_SCHEMA = T.StructType([
    T.StructField("lid", T.IntegerType()),
    T.StructField("part_best", T.DoubleType()),
])


def max_sim_vs_kb(kb: DataFrame, small_mat: np.ndarray,
                  vec_col: str = "embedding") -> DataFrame:
    """Max cosine similarity of each row of ``small_mat`` (broadcast)
    against the KB — the shared Arrow-fold primitive behind link-overlap
    scoring and admission dedup. Returns (lid, max_sim); ids with no KB
    partition are absent (caller treats missing as -inf/no overlap)."""
    sn = _normalize(np.asarray(small_mat, dtype=np.float64))
    nl = sn.shape[0]

    def fold(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            mat = np.array([np.asarray(v, dtype=np.float64)
                            for v in pdf[vec_col]])
            kbn = _normalize(mat)
            best = (sn @ kbn.T).max(axis=1)
            yield pd.DataFrame({"lid": np.arange(nl, dtype=np.int32),
                                "part_best": best})

    return (kb.select(vec_col).mapInPandas(fold, _OVERLAP_SCHEMA)
            .groupBy("lid").agg(F.max("part_best").alias("max_sim")))


def score_links(link_embs: np.ndarray, gaps: Sequence[float],
                gap_points: np.ndarray, overlap_by_lid: dict[int, float],
                cfg: EmbeddingAdaptiveConfig,
                contextual: Sequence[float] | None = None) -> list[float]:
    """Ref select_links_for_expansion (:850-965), driver-side over the
    bounded candidate set (the KB-sided overlap max arrives precomputed
    from :func:`max_sim_vs_kb`)."""
    ln = _normalize(np.asarray(link_embs, dtype=np.float64))
    gp = _normalize(np.asarray(gap_points, dtype=np.float64)) \
        if len(gap_points) else np.zeros((0, ln.shape[1]))
    radius = cfg.embedding_coverage_radius
    needing = [i for i, d in enumerate(gaps) if d > radius]
    scores: list[float] = []
    for li in range(ln.shape[0]):
        if not len(gaps):
            score = 0.0
        else:
            total = 0.0
            for gi in needing:
                new_d = 1.0 - float(ln[li] @ gp[gi])
                if new_d < gaps[gi]:
                    total += (gaps[gi] - new_d) * 2.0   # ref :925 amplification
            gap_reduction = total / len(needing) if needing else 0.0
            max_sim = overlap_by_lid.get(li)
            if max_sim is not None and max_sim > cfg.embedding_overlap_threshold:
                penalty = (max_sim - cfg.embedding_overlap_threshold) * 2.0
            else:
                penalty = 0.0
            score = gap_reduction * (1.0 - penalty)
            if contextual is not None and contextual[li]:
                score = score * 0.8 + contextual[li] * 0.2   # ref :961
        scores.append(score)
    return scores


def rank_links_embedding(kb: DataFrame, link_texts: Sequence[str],
                         gaps: Sequence[float], gap_points: np.ndarray,
                         cfg: EmbeddingAdaptiveConfig,
                         embed: Callable[[Sequence[str], int], np.ndarray]
                         = embed_texts,
                         contextual: Sequence[float] | None = None
                         ) -> list[tuple[int, float]]:
    """Rank candidate links (by index) descending by gap-filling score.
    The only KB-sided pass is the overlap fold; gap scoring runs on the
    bounded candidate set."""
    if not link_texts:
        return []
    le = embed(link_texts, cfg.embed_dim)
    if kb is not None:
        overlap = {int(r["lid"]): float(r["max_sim"])
                   for r in max_sim_vs_kb(kb, le).collect()}
    else:
        overlap = {}
    scores = score_links(le, gaps, gap_points, overlap, cfg, contextual)
    return sorted(enumerate(scores), key=lambda t: (-t[1], t[0]))


def validation_confidence(kb: DataFrame | None, val_mat: np.ndarray) -> float:
    """Ref validate_coverage (:1097-1132): held-out queries scored
    ``1 - min_distance`` (== best similarity), mean."""
    if kb is None or val_mat.shape[0] == 0:
        return 0.0
    best = {int(r["qid"]): float(r["best_sim"])
            for r in best_sim_per_query(kb, val_mat).collect()}
    if not best:
        return 0.0
    return float(sum(best.get(i, 0.0) for i in range(val_mat.shape[0]))
                 / val_mat.shape[0])


def should_stop(confidence: float, n_crawled: int, n_pending: int,
                history: list[float], cfg: EmbeddingAdaptiveConfig,
                validate: Callable[[], float]) -> tuple[bool, str]:
    """Ref should_stop (:1134-1182). ``history`` must already include the
    current confidence. Returns (stop, reason)."""
    if confidence < cfg.embedding_min_confidence_threshold and n_crawled > 0:
        return True, "below_minimum_relevance_threshold"
    if n_crawled >= cfg.max_pages or n_pending == 0:
        return True, "limits"
    if len(history) < 2:
        return False, ""
    diffs = [abs(b - a) for a, b in zip(history[:-1], history[1:])]
    avg_improvement = sum(diffs) / len(diffs)
    if avg_improvement < cfg.embedding_min_relative_improvement * confidence:
        val = validate()
        if val > cfg.embedding_validation_min_score:
            return True, "converged_validated"
        return False, "low_validation"
    return False, ""


def quality_confidence(learning_score: float, validation_score: float,
                       validation_passed: bool,
                       cfg: EmbeddingAdaptiveConfig) -> float:
    """Ref get_quality_confidence (:1184-1211): display-confidence mapping."""
    if validation_passed and validation_score > cfg.embedding_validation_min_score:
        if learning_score < 0.4:
            return cfg.embedding_quality_min_confidence
        if learning_score > 0.7:
            return cfg.embedding_quality_max_confidence
        return (cfg.embedding_quality_min_confidence
                + (learning_score - 0.4) * cfg.embedding_quality_scale_factor)
    return learning_score * 0.8


def admit_new_docs(kb: DataFrame | None, new_embs: np.ndarray,
                   threshold: float) -> list[int]:
    """Ref update_state dedup (:1213-1267): indices of new docs whose max
    similarity against the EXISTING KB is below ``threshold``. Matches the
    reference exactly in admitting within-batch near-duplicates (the KB is
    only extended after the whole batch is scored)."""
    n = new_embs.shape[0]
    if n == 0:
        return []
    if kb is None:
        return list(range(n))
    sims = {int(r["lid"]): float(r["max_sim"])
            for r in max_sim_vs_kb(kb, new_embs).collect()}
    if not sims:    # empty KB table
        return list(range(n))
    return [i for i in range(n) if sims.get(i, 0.0) < threshold]


_KB_SCHEMA = T.StructType([
    T.StructField("url", T.StringType()),
    T.StructField("embedding", T.ArrayType(T.DoubleType())),
])


def embed_results(results: DataFrame, dim: int,
                  text_col: str = "text") -> DataFrame:
    """Executor-side embedding of crawl results (url, embedding) — the
    reference embeds ``markdown[:5000]`` (:1222); the seam embeds the text
    column truncated the same way."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            embs = [feature_hash_embed(tokenize(str(t)[:5000]), dim).tolist()
                    for t in pdf[text_col]]
            yield pd.DataFrame({"url": pdf["url"], "embedding": embs})

    return results.select("url", text_col).mapInPandas(run, _KB_SCHEMA)


class EmbeddingAdaptiveCrawler:
    """Batch-wise adaptive crawl driven by semantic-space coverage — the
    reference's ``AdaptiveCrawler`` with ``strategy="embedding"``
    (:1296-1298), over the repo engine's resume loop like the statistical
    variant (crawl4ai_spark/adaptive.py)."""

    def __init__(self, spark: SparkSession, store_root: str,
                 variation_fn: Callable[[str, int], list[str]]
                 = default_query_variations):
        from crawl4ai_spark.engine import SparkWebEngine

        self.spark = spark
        self.engine = SparkWebEngine(spark, store_root)
        self.variation_fn = variation_fn

    def _rank_pending(self, pages: DataFrame, kb: DataFrame,
                      gaps: Sequence[float], gap_points: np.ndarray,
                      cfg: EmbeddingAdaptiveConfig, top_m: int = 256
                      ) -> DataFrame | None:
        """Gap-driven re-rank of the pending frontier (reference
        EmbeddingStrategy.rank_links :1067-1096): the top-M queued urls by
        stored score get re-scored by how well their text fills the current
        coverage gaps; the (url, score) table feeds the engine's
        score_overrides hook. Bounded head re-rank: M caps the driver-side
        embed (the reference embeds every pending link driver-side; at
        engine scale only the schedulable head matters). Link text = the
        corpus text column — the same head-peek convention as F10/F20."""
        fr = self.engine.frontier()
        if fr is None:
            return None
        cand = (fr.filter(F.col("status") == "QUEUED")
                .select("url", "score")
                .orderBy(F.desc("score"), F.asc("url")).limit(top_m))
        rows = (cand.join(pages.select("url", "text"), "url", "inner")
                .select("url", "text").collect())
        if not rows:
            return None
        texts = [str(r["text"] or "") for r in rows]
        ranked = rank_links_embedding(kb, texts, gaps, gap_points, cfg)
        return self.spark.createDataFrame(
            [(rows[i]["url"], float(s)) for i, s in ranked],
            "url string, score double")

    def digest(self, pages: DataFrame, seeds: DataFrame, query: str, *,
               config: EmbeddingAdaptiveConfig | None = None,
               robots: DataFrame | None = None,
               rank_pending: bool = True) -> dict:
        from crawl4ai_spark.engine import CrawlConfig

        cfg = config or EmbeddingAdaptiveConfig()
        n_total = int(cfg.n_query_variations * 1.3)   # ref :706
        train_q, val_q = split_queries(query, self.variation_fn(query, n_total))
        q_mat = embed_texts(train_q, cfg.embed_dim)
        val_mat = embed_texts(val_q, cfg.embed_dim)

        run_cfg = CrawlConfig(
            policy="best_first", batch_size=cfg.batch_size,
            max_depth=cfg.max_depth,
            max_pages=cfg.batch_size * cfg.max_batches,
            per_host_quota=cfg.per_host_quota,
            check_robots_txt=robots is not None,
        )
        kb: DataFrame | None = None
        history: list[float] = []
        conf = 0.0
        val_score = 0.0
        validation_passed = False
        stop_reason = "max_batches"
        n_admitted = 0
        batches: list[dict] = []
        overrides: DataFrame | None = None
        for batch_no in range(cfg.max_batches):
            self.engine.run(pages, seeds, robots=robots, config=run_cfg,
                            resume=batch_no > 0, max_generations=1,
                            score_overrides=overrides)
            results = self.engine.results()
            if results is None:
                break
            ok = results.filter(F.col("success"))
            n_crawled = ok.count()
            if n_crawled == 0:
                break
            # KB admission: embed the whole result set, admit unseen urls
            # that clear the similarity dedup against the existing KB.
            cand = embed_results(
                ok.join(kb.select("url"), "url", "left_anti") if kb is not None
                else ok, cfg.embed_dim)
            cand_rows = cand.collect()   # bounded: ≤ batch_size new docs
            if cand_rows:
                new_mat = np.array([r["embedding"] for r in cand_rows])
                keep = admit_new_docs(kb, new_mat,
                                      cfg.kb_similarity_threshold)
                if keep:
                    kept = self.spark.createDataFrame(
                        [(cand_rows[i]["url"], cand_rows[i]["embedding"])
                         for i in keep], _KB_SCHEMA)
                    n_admitted += len(keep)
                    # persist KB as a state table (resumable, lineage-cut)
                    self.engine.store.commit(
                        "kb_embeddings",
                        kept if kb is None else kb.unionByName(kept),
                        meta={"batch": batch_no})
                    kb = self.engine.store.read(self.spark, "kb_embeddings")
            best = {int(r["qid"]): float(r["best_sim"])
                    for r in best_sim_per_query(kb, q_mat).collect()} \
                if kb is not None else {}
            conf = confidence_from_best(best, len(train_q), cfg.coverage_tau)
            history.append(conf)
            batches.append({"batch": batch_no, "confidence": round(conf, 4),
                            "kb_size": n_admitted, "crawled": n_crawled})
            if rank_pending and kb is not None:
                # re-rank the pending frontier head by current-gap fill for
                # the NEXT batch (ref rank_links per crawl cycle)
                overrides = self._rank_pending(
                    pages, kb, coverage_gaps(best, len(train_q)), q_mat, cfg)

            def _validate() -> float:
                return validation_confidence(kb, val_mat)

            stop, reason = should_stop(conf, n_crawled, 1, history, cfg,
                                       _validate)
            if reason == "converged_validated":
                validation_passed = True
                val_score = validation_confidence(kb, val_mat)
            if stop:
                stop_reason = reason
                break
        return {
            "confidence": round(conf, 4),
            "quality_confidence": round(
                quality_confidence(conf, val_score, validation_passed, cfg), 4),
            "batches": batches,
            "stopped_reason": stop_reason,
            "validation_passed": validation_passed,
            "is_irrelevant": stop_reason == "below_minimum_relevance_threshold",
            "n_kb_docs": n_admitted,
        }
