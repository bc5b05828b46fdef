"""CCNet-style perplexity filter: from-spec guard against an independent
pure-python reimplementation (Laplace-smoothed bigram LM over the reference
subset, quantized-probability neglog table, per-language tertiles) — no
shared code with the Spark query beyond the published constants. The
cross-engine oracle parity itself runs in test_ops_parity via the registry.
"""

import math

from crawl4ai_spark.ops.perplexityq import (
    PPL_CAP,
    PPL_REF_MOD,
    PPL_REF_REM,
    q_ccnet_perplexity,
)


def _spec_scores(docs):
    """docs: list of (doc_id, lang, text). Returns {doc_id: (n_bigrams,
    ppl_e6, bucket)} computed from the written spec alone."""
    import re

    def words(t):
        return re.findall(r"[a-z0-9]+", t.lower())

    def bigrams(t):
        w = words(t)
        return list(zip(w, w[1:])) if len(w) >= 2 else []

    ref = [d for d in docs if d[0] % PPL_REF_MOD == PPL_REF_REM]
    c12, c1, vocab = {}, {}, set()
    for _, _, t in ref:
        for w1, w2 in bigrams(t):
            c12[(w1, w2)] = c12.get((w1, w2), 0) + 1
            c1[w1] = c1.get(w1, 0) + 1
            vocab.update((w1, w2))
    v = max(len(vocab), 1)
    neglog = [round(-math.log((2 * q + 1) / (2.0 * (PPL_CAP + 1))) * 1e6)
              for q in range(PPL_CAP + 1)]

    scored = []
    for doc_id, lang, t in docs:
        bg = bigrams(t)
        if not bg:
            continue
        s = sum(neglog[(c12.get(p, 0) + 1) * PPL_CAP
                       // (c1.get(p[0], 0) + v)] for p in bg)
        scored.append((doc_id, lang, len(bg), s // len(bg)))
    out = {}
    for lang in {s[1] for s in scored}:
        grp = sorted((s for s in scored if s[1] == lang),
                     key=lambda s: (s[3], s[0]))
        for rk, (doc_id, _, nb, ppl) in enumerate(grp):
            out[doc_id] = (nb, ppl,
                           ["head", "middle", "tail"][rk * 3 // len(grp)])
    return out


def test_ccnet_perplexity_matches_spec(spark, tmp_path):
    docs = [
        # doc_id % 10 == 1 rows form the reference LM
        (1, "en", "the cat sat on the mat and the cat ran"),
        (11, "en", "the dog sat on the rug and the dog ran"),
        (21, "fr", "le chat dort sur le tapis et le chat court"),
        # scored-only docs: one fluent (low ppl), one garbled (high ppl)
        (2, "en", "the cat sat on the rug"),
        (3, "en", "zq xv qqj zzk wpt"),
        (4, "en", "the dog ran and the cat sat"),
        (5, "fr", "le chat court sur le tapis"),
        (6, "fr", "zzz qqq xxx www vvv"),
        (7, "fr", "le tapis dort et le chat"),
        (8, "en", "mat mat mat mat"),
        (9, "en", ""),                      # no bigram — excluded
        (10, "en", "word"),                 # 1 token — excluded
    ]
    spark.createDataFrame(docs, "doc_id long, lang string, text string") \
        .write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    got = {r.doc_id: (r.n_bigrams, r.ppl_e6, r.bucket)
           for r in q_ccnet_perplexity(spark, str(tmp_path)).collect()}
    want = _spec_scores(docs)
    assert got == want
    assert 9 not in got and 10 not in got
    # the fluent in-domain doc must rank below the garbled one
    assert got[2][1] < got[3][1]
    assert got[5][1] < got[6][1]


def test_ccnet_reference_subset_is_the_lm(spark, tmp_path):
    """Changing a NON-reference doc must not move any other doc's ppl (the
    LM trains on the reference subset only)."""
    base = [(1, "en", "alpha beta gamma alpha beta"),
            (2, "en", "alpha beta gamma"),
            (3, "en", "gamma beta alpha")]
    variant = [base[0], (2, "en", "delta epsilon zeta"), base[2]]
    outs = []
    for docs in (base, variant):
        spark.createDataFrame(
            docs, "doc_id long, lang string, text string").write \
            .mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
        outs.append({r.doc_id: r.ppl_e6 for r in
                     q_ccnet_perplexity(spark, str(tmp_path)).collect()})
    assert outs[0][3] == outs[1][3]
    assert outs[0][1] == outs[1][1]
