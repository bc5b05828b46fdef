"""host_mirror_pairs (ops/dedup.py) — bottom-k (KMV) sketch estimator vs
the EXACT path-set Jaccard computed from the full (host, path) sets. The
exact DuckDB oracle runs in test_ops_parity (the sketch itself is
deterministic); this guards the ESTIMATOR: bounded error against ground
truth, and recall — every strongly-mirrored pair is a candidate."""

from itertools import combinations

from crawl4ai_spark.ops.dedup import MIRROR_K, q_host_mirror_pairs
from crawl4ai_spark.ops.scheduling import _normalize, _urls

# sf0.01, not sf0.001: at the tiny scale each host has too few distinct
# paths for bottom-32 sketches to collide (no candidate pairs — correctly:
# there is no mirror structure to find there)
SF = "/root/testdata/sf0.01"


def test_kmv_estimator_bounds(spark):
    paths = (_normalize(_urls(spark, SF))
             .select("host", "path").distinct().collect())
    sets = {}
    for r in paths:
        sets.setdefault(r.host, set()).add(r.path)
    exact = {}
    for a, b in combinations(sorted(sets), 2):
        inter = len(sets[a] & sets[b])
        exact[(a, b)] = inter / len(sets[a] | sets[b])

    got = {(r.host_a, r.host_b): (r.est_jaccard_e6 / 1e6, r.k_eff)
           for r in q_host_mirror_pairs(spark, SF).collect()}
    assert got, "no candidate pairs"

    # bounded estimator error: KMV stderr is sqrt(J(1-J)/k) ~ 0.09 at
    # k=32; 4 sigma + quantization slack
    for (a, b), (est, k_eff) in got.items():
        assert k_eff <= MIRROR_K
        assert abs(est - exact[(a, b)]) <= 0.4, (a, b, est, exact[(a, b)])

    # recall: every strongly-mirrored pair shares a bottom-k value and so
    # IS a candidate (at J >= 0.3, k=32 the sketches must collide)
    for (a, b), j in exact.items():
        if j >= 0.3:
            assert (a, b) in got, (a, b, j)

    # the estimator discriminates: not all estimates identical
    assert len({e for e, _ in got.values()}) > 1
