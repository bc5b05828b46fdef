"""Temperature resampling (ops/pipelineq.py q_resample_temperature): the
XLM-R/mC4 alpha=0.5 language-balancing filter. Contract: acceptance rate per
language is min(1, sqrt-share / natural-share); the kept set is a
deterministic function of md5(doc_id) so reruns (and both engines) select
the identical docs."""

import hashlib
import math

import pyarrow.parquet as pq

from crawl4ai_spark.ops.pipelineq import q_resample_temperature

SF = "/root/testdata/sf0.001"


def _expected(df):
    counts = df.groupby("lang").size().to_dict()
    n_tot = sum(counts.values())
    w_e6 = {l: round(math.sqrt(n) * 1e6) for l, n in counts.items()}
    w_tot = sum(w_e6.values())
    rate_e6 = {l: round(min(1.0, w_e6[l] / w_tot * n_tot / counts[l]) * 1e6)
               for l in counts}
    keep = set()
    for doc_id, lang in zip(df["doc_id"], df["lang"]):
        u40 = int(hashlib.md5(str(doc_id).encode()).hexdigest()[:10], 16)
        if u40 * 1_000_000 < rate_e6[lang] * (1 << 40):
            keep.add((doc_id, lang, rate_e6[lang]))
    return keep, rate_e6, counts


def test_resample_matches_from_spec(spark):
    df = pq.read_table(f"{SF}/documents.parquet").to_pandas()
    want, rate_e6, counts = _expected(df)
    got = {(r.doc_id, r.lang, r.rate_e6)
           for r in q_resample_temperature(spark, SF).collect()}
    assert got == want
    # non-degenerate: the head language is actually downsampled (< 1.0)
    # and at least one tail language keeps everything (rate == 1e6)
    head = max(counts, key=counts.get)
    assert rate_e6[head] < 1_000_000
    assert any(r == 1_000_000 for r in rate_e6.values())


def test_resample_flattens_distribution(spark):
    """After resampling, the head/tail share ratio must shrink toward the
    sqrt-flattened target (the whole point of temperature sampling)."""
    df = pq.read_table(f"{SF}/documents.parquet").to_pandas()
    before = df.groupby("lang").size()
    kept = q_resample_temperature(spark, SF).toPandas()
    after = kept.groupby("lang").size()
    head, tail = before.idxmax(), before.idxmin()
    ratio_before = before[head] / before[tail]
    ratio_after = after[head] / after[tail]
    assert ratio_after < ratio_before
    # and the achieved head share is within sampling noise of the target
    n_tot = before.sum()
    w = before.map(lambda n: math.sqrt(n))
    target_head_share = w[head] / w.sum()
    achieved = after[head] / after.sum()
    assert abs(achieved - target_head_share) < 0.1
