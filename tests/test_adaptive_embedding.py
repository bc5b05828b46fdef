"""F19 embedding strategy: every deterministic formula of the reference's
EmbeddingStrategy (adaptive_crawler.py:617-1270) is checked against a
from-spec pure-numpy reimplementation written independently below, the
distributed Arrow fold is checked against the exploded oracle-parity query,
and the engine digest loop runs end-to-end."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from crawl4ai_spark.adaptive_embedding import (
    EmbeddingAdaptiveConfig,
    EmbeddingAdaptiveCrawler,
    admit_new_docs,
    best_sim_per_query,
    confidence_from_best,
    coverage_gaps,
    default_query_variations,
    embed_texts,
    max_sim_vs_kb,
    quality_confidence,
    rank_links_embedding,
    score_links,
    should_stop,
    split_queries,
    validation_confidence,
)
from crawl4ai_spark.sources.pagesgen import generate_pages, generate_seeds


# ---------------------------------------------------------------------------
# From-spec reimplementation (reference :967-995, :820-848, :850-965,
# :1097-1132, :1184-1211, :1213-1267) — written directly from the numpy
# formulas in the reference, no shared code with the module under test.
# ---------------------------------------------------------------------------

def _norm(m):
    m = np.asarray(m, dtype=np.float64)
    return m / (np.linalg.norm(m, axis=1, keepdims=True) + 0.0)


def spec_confidence(Q, D, tau=None):
    if D is None or len(D) == 0 or len(Q) == 0:
        return 0.0
    best = (_norm(Q) @ _norm(D).T).max(axis=1)
    return float((best >= tau).mean()) if tau is not None else float(best.mean())


def spec_gaps(Q, D):
    if D is None or len(D) == 0:
        return [1.0] * len(Q)
    dist = 1.0 - _norm(Q) @ _norm(D).T
    return list(dist.min(axis=1))


def spec_link_scores(L, gaps, Qpts, D, cfg):
    Ln = _norm(L)
    Qn = _norm(Qpts)
    out = []
    needing = [i for i, d in enumerate(gaps) if d > cfg.embedding_coverage_radius]
    for li in range(len(L)):
        total, helped = 0.0, 0
        for gi in needing:
            nd = 1.0 - float(Ln[li] @ Qn[gi])
            if nd < gaps[gi]:
                total += (gaps[gi] - nd) * 2
                helped += 1
        gr = total / len(needing) if needing else 0.0
        if D is not None and len(D):
            ms = float((_norm(D) @ Ln[li]).max())
            pen = (ms - cfg.embedding_overlap_threshold) * 2 \
                if ms > cfg.embedding_overlap_threshold else 0.0
        else:
            pen = 0.0
        out.append(gr * (1 - pen))
    return out


def spec_validation(V, D):
    if D is None or len(D) == 0:
        return 0.0
    dist = 1.0 - _norm(V) @ _norm(D).T
    return float(np.mean(1.0 - dist.min(axis=1)))


def spec_quality(ls, vs, passed, cfg):
    if passed and vs > cfg.embedding_validation_min_score:
        if ls < 0.4:
            return cfg.embedding_quality_min_confidence
        if ls > 0.7:
            return cfg.embedding_quality_max_confidence
        return cfg.embedding_quality_min_confidence \
            + (ls - 0.4) * cfg.embedding_quality_scale_factor
    return ls * 0.8


def spec_admit(D, new, thr):
    if D is None or len(D) == 0:
        return list(range(len(new)))
    Dn = _norm(D)
    keep = []
    for i, e in enumerate(np.asarray(new, dtype=np.float64)):
        sims = Dn @ (e / np.linalg.norm(e))
        if sims.max() < thr:
            keep.append(i)
    return keep


@pytest.fixture(scope="module")
def rng_mats():
    rng = np.random.RandomState(42)
    Q = rng.randn(7, 16)
    D = rng.randn(40, 16)
    V = rng.randn(3, 16)
    L = rng.randn(9, 16)
    return Q, D, V, L


@pytest.fixture(scope="module")
def kb_df(spark, rng_mats):
    _, D, _, _ = rng_mats
    df = spark.createDataFrame(
        [(i, [float(x) for x in row]) for i, row in enumerate(D)],
        "vec_id int, embedding array<double>").cache()
    df.count()
    return df


def test_confidence_matches_spec(spark, rng_mats, kb_df):
    Q, D, _, _ = rng_mats
    best = {int(r["qid"]): float(r["best_sim"])
            for r in best_sim_per_query(kb_df, Q).collect()}
    got = confidence_from_best(best, len(Q))
    assert got == pytest.approx(spec_confidence(Q, D), abs=1e-12)
    # hit-rate variant (coverage_tau)
    got_tau = confidence_from_best(best, len(Q), tau=0.2)
    assert got_tau == pytest.approx(spec_confidence(Q, D, tau=0.2), abs=1e-12)
    # gaps = 1 - best
    gaps = coverage_gaps(best, len(Q))
    assert np.allclose(gaps, spec_gaps(Q, D), atol=1e-12)


def test_empty_kb_defaults(rng_mats):
    Q, _, _, _ = rng_mats
    assert confidence_from_best({}, len(Q)) == 0.0
    assert coverage_gaps({}, len(Q)) == [1.0] * len(Q)
    assert confidence_from_best({}, 0) == 0.0


def test_max_sim_fold_matches_spec(spark, rng_mats, kb_df):
    _, D, _, L = rng_mats
    got = {int(r["lid"]): float(r["max_sim"])
           for r in max_sim_vs_kb(kb_df, L).collect()}
    Dn, Ln = _norm(D), _norm(L)
    exp = (Ln @ Dn.T).max(axis=1)
    for i in range(len(L)):
        assert got[i] == pytest.approx(float(exp[i]), abs=1e-12)


def test_link_scores_match_spec(spark, rng_mats, kb_df):
    Q, D, _, L = rng_mats
    cfg = EmbeddingAdaptiveConfig()
    gaps = spec_gaps(Q, D)
    overlap = {int(r["lid"]): float(r["max_sim"])
               for r in max_sim_vs_kb(kb_df, L).collect()}
    got = score_links(L, gaps, Q, overlap, cfg)
    exp = spec_link_scores(L, gaps, Q, D, cfg)
    assert np.allclose(got, exp, atol=1e-12)
    # contextual blend (ref :961)
    ctx = [0.5] * len(L)
    got_ctx = score_links(L, gaps, Q, overlap, cfg, contextual=ctx)
    assert np.allclose(got_ctx, [s * 0.8 + 0.1 for s in exp], atol=1e-12)


def test_rank_links_embedding_orders_desc(spark, kb_df, rng_mats):
    Q, D, _, _ = rng_mats
    cfg = EmbeddingAdaptiveConfig(embed_dim=16)
    gaps = spec_gaps(Q, D)
    texts = [f"link text about topic {i} crawling" for i in range(6)]
    ranked = rank_links_embedding(kb_df, texts, gaps, Q, cfg)
    scores = [s for _, s in ranked]
    assert scores == sorted(scores, reverse=True)
    assert {i for i, _ in ranked} == set(range(6))


def test_validation_matches_spec(spark, rng_mats, kb_df):
    Q, D, V, _ = rng_mats
    assert validation_confidence(kb_df, V) == pytest.approx(
        spec_validation(V, D), abs=1e-12)
    assert validation_confidence(None, V) == 0.0


def test_should_stop_rules():
    cfg = EmbeddingAdaptiveConfig(max_pages=20)
    never = lambda: 0.0
    # irrelevance floor: below min threshold once anything crawled
    assert should_stop(0.05, 5, 10, [0.05], cfg, never) == (
        True, "below_minimum_relevance_threshold")
    # nothing crawled yet → floor not armed
    stop, _ = should_stop(0.05, 0, 10, [0.05], cfg, never)
    assert not stop
    # limits
    assert should_stop(0.5, 20, 10, [0.5], cfg, never)[0]
    assert should_stop(0.5, 5, 0, [0.5], cfg, never)[0]
    # too-short history → continue
    assert not should_stop(0.5, 5, 10, [0.5], cfg, never)[0]
    # converged + validation above min → stop
    hist = [0.50, 0.502, 0.503]
    assert should_stop(0.503, 5, 10, hist, cfg, lambda: 0.9) == (
        True, "converged_validated")
    # converged but validation low → keep crawling
    stop, reason = should_stop(0.503, 5, 10, hist, cfg, lambda: 0.1)
    assert not stop and reason == "low_validation"
    # still improving → no validation call, continue
    hist2 = [0.1, 0.3, 0.6]
    def boom():
        raise AssertionError("validated while still improving")
    assert not should_stop(0.6, 5, 10, hist2, cfg, boom)[0]


def test_quality_confidence_matches_spec():
    cfg = EmbeddingAdaptiveConfig()
    for ls in (0.1, 0.39, 0.4, 0.55, 0.7, 0.71, 0.9):
        for vs, passed in ((0.9, True), (0.2, True), (0.9, False)):
            assert quality_confidence(ls, vs, passed, cfg) == pytest.approx(
                spec_quality(ls, vs, passed, cfg), abs=1e-12)


def test_admit_new_docs_matches_spec(spark, rng_mats, kb_df):
    _, D, _, _ = rng_mats
    rng = np.random.RandomState(3)
    fresh = rng.randn(4, 16)
    near_dup = D[5] + 1e-9          # ~identical to an existing KB row
    new = np.vstack([fresh, near_dup[None, :]])
    got = admit_new_docs(kb_df, new, 0.95)
    assert got == spec_admit(D, new, 0.95)
    assert 4 not in got             # the near-duplicate is rejected
    # empty KB admits everything
    assert admit_new_docs(None, new, 0.95) == list(range(5))
    # within-batch duplicates are both admitted (reference semantics)
    twin = np.vstack([fresh[0], fresh[0]])
    assert admit_new_docs(kb_df, twin, 0.95) == [0, 1]


def test_split_queries_reference_shape():
    vars13 = default_query_variations("q", 13)
    assert len(vars13) == 13 and len(set(vars13)) == 13
    train, val = split_queries("q", vars13)
    assert train[0] == "q"
    assert len(val) == max(2, int(13 * 0.2)) == 2
    assert len(train) == 1 + 13 - 2
    assert not (set(train) & set(val))


def test_arrow_fold_matches_exploded_query(spark):
    """The production best_sim_per_query Arrow fold agrees with the
    oracle-parity exploded plan in ops/adaptq.py, e6-for-e6."""
    from crawl4ai_spark.ops.adaptq import (
        q_adaptive_embedding_confidence, _query_matrix)

    sf = "/root/testdata/sf0.001"
    exploded = {int(r["qid"]): int(r["best_cos_e6"])
                for r in q_adaptive_embedding_confidence(spark, sf).collect()}
    emb = spark.read.parquet(f"{sf}/embeddings.parquet")
    qm = np.array(_query_matrix())
    fold = {int(r["qid"]): int(round(r["best_sim"] * 1e6))
            for r in best_sim_per_query(emb, qm).collect()}
    assert fold == exploded


def test_digest_embedding_e2e(spark, tmp_store):
    pages = generate_pages(spark, 2, 7).cache()
    pages.count()
    crawler = EmbeddingAdaptiveCrawler(spark, tmp_store)
    out = crawler.digest(
        pages, generate_seeds(spark, 2), "spark crawl frontier",
        config=EmbeddingAdaptiveConfig(max_batches=3, batch_size=6,
                                       max_depth=3, embed_dim=16,
                                       max_pages=60),
    )
    assert out["n_kb_docs"] >= 1
    assert 0.0 <= out["confidence"] <= 1.0
    assert 1 <= len(out["batches"]) <= 3
    assert 0.0 <= out["quality_confidence"] <= 1.0
    assert out["stopped_reason"] in (
        "max_batches", "limits", "converged_validated",
        "below_minimum_relevance_threshold")
    # confidence history well-formed and kb size monotone
    kbs = [b["kb_size"] for b in out["batches"]]
    assert kbs == sorted(kbs)
    pages.unpersist()


def test_engine_score_overrides_reorder_best_first(spark, tmp_path):
    """The score_overrides hook: an override must beat stored scores in
    best_first scheduling (the rank_links wiring point)."""
    from crawl4ai_spark.engine import CrawlConfig, SparkWebEngine

    pages = generate_pages(spark, 2, 4)
    seeds = spark.createDataFrame(
        [("https://www.host0.com/p0", 0.9),
         ("https://www.host1.com/p0", 0.1)],
        "url string, priority double")
    cfg = CrawlConfig(policy="best_first", batch_size=1, max_pages=1)
    # without overrides: the high-priority seed is crawled first
    r0 = SparkWebEngine(spark, str(tmp_path / "a")).run(
        pages, seeds, config=cfg, max_generations=1)
    assert {r.url for r in r0.collect()} == {"https://www.host0.com/p0"}
    # with an override boosting the low-priority seed, it wins instead
    ov = spark.createDataFrame([("https://www.host1.com/p0", 5.0)],
                               "url string, score double")
    r1 = SparkWebEngine(spark, str(tmp_path / "b")).run(
        pages, seeds, config=cfg, max_generations=1, score_overrides=ov)
    assert {r.url for r in r1.collect()} == {"https://www.host1.com/p0"}


def test_digest_with_gap_ranking(spark, tmp_path, tmp_store):
    """Digest with rank_pending exercises the rank_links → score_overrides
    path (kb non-empty after batch 1) and stays well-formed."""
    pages = generate_pages(spark, 2, 7).cache()
    pages.count()
    crawler = EmbeddingAdaptiveCrawler(spark, str(tmp_path / "store"))
    out = crawler.digest(
        pages, generate_seeds(spark, 2), "spark crawl frontier",
        config=EmbeddingAdaptiveConfig(max_batches=3, batch_size=6,
                                       max_depth=3, embed_dim=16,
                                       max_pages=60),
        rank_pending=True)
    assert out["n_kb_docs"] >= 1
    assert 0.0 <= out["confidence"] <= 1.0
    # ranked and unranked digests may crawl different orders but both
    # stay within budget and produce monotone kb growth
    kbs = [b["kb_size"] for b in out["batches"]]
    assert kbs == sorted(kbs)
    pages.unpersist()
