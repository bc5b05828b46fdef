"""Distributed batch-perceptron quality classifier (ops/pipelineq.py
q_train_quality_perceptron): integer-exact epochs guarded by a from-spec
python loop over the (independently-oracled) feature/label inputs."""

from crawl4ai_spark.ops.pipelineq import (
    PERCEPTRON_EPOCHS,
    _perceptron_features,
    q_train_quality_perceptron,
)

SF = "/root/testdata/sf0.001"


def test_perceptron_matches_from_spec(spark):
    rows = _perceptron_features(spark, SF).collect()
    data = [(r.y, (r.x0, r.x1, r.x2, r.x3)) for r in rows]
    w = [0, 0, 0, 0]
    want = set()
    for epoch in range(1, PERCEPTRON_EPOCHS + 1):
        mis = [(y, x) for y, x in data
               if y * sum(wi * xi for wi, xi in zip(w, x)) <= 0]
        for i in range(4):
            w[i] += sum(y * x[i] for y, x in mis)
        for i in range(4):
            want.add((epoch, i, w[i], len(mis)))
    got = {(r.epoch, r.pos, r.w, r.n_err)
           for r in q_train_quality_perceptron(spark, SF).collect()}
    assert got == want


def test_perceptron_learns(spark):
    """The trained classifier must beat the all-misclassified start: the
    final epoch's error count is strictly below the first epoch's (which
    is the whole training set, since w0 = 0 misclassifies everything)."""
    out = q_train_quality_perceptron(spark, SF).toPandas()
    errs = out.groupby("epoch")["n_err"].first()
    n_docs = errs.loc[1]
    assert errs.loc[PERCEPTRON_EPOCHS] < n_docs


def test_perceptron_score_consistency(spark):
    """Inference with the final weights must agree with the rule label on
    a majority of docs (it learned), and score sign must equal pred."""
    from crawl4ai_spark.ops.pipelineq import q_quality_perceptron_score

    out = q_quality_perceptron_score(spark, SF).toPandas()
    assert ((out["score"] > 0) == out["pred_keep"]).all()
    assert out["agrees"].mean() > 0.5
