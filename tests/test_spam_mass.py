"""Spam mass (ops/analytics.py q_events_spam_mass) — the Gyongyi et al.
mass-estimation invariants over the shared PageRank/TrustRank operator."""

from crawl4ai_spark.ops.analytics import (
    SPAM_MASS_T_E6,
    q_events_pagerank,
    q_events_spam_mass,
    q_events_trustrank,
)

SF = "/root/testdata/sf0.001"


def test_mass_identities_and_bounds(spark):
    rows = q_events_spam_mass(spark, SF).collect()
    assert rows
    pr = {r.node: r.rank_e6 for r in q_events_pagerank(spark, SF).collect()}
    tr = {r.node: r.trust_e6
          for r in q_events_trustrank(spark, SF).collect()}
    for r in rows:
        assert r.rank_e6 == pr[r.node] and r.trust_e6 == tr[r.node]
        # trust-seeded rank never exceeds the full rank (monotonicity of
        # the shared integer rounds under the smaller teleport vector)
        assert 0 <= r.trust_e6 <= r.rank_e6
        assert r.mass_e6 == r.rank_e6 - r.trust_e6
        assert 0 <= r.rel_mass_e6 <= 1_000_000
        assert r.is_spammy == (not r.is_seed
                               and r.rel_mass_e6 >= SPAM_MASS_T_E6)
    # both verdict classes occur: seeds hold trust, far nodes lose it
    assert any(r.is_spammy for r in rows)
    assert any(not r.is_spammy for r in rows)
    # any node unreachable from every seed must carry rel_mass 1.0
    # (the dense sf0.001 click graph may have none — then vacuous)
    assert all(r.rel_mass_e6 == 1_000_000
               for r in rows if r.trust_e6 == 0)
    # seeds themselves are never flagged
    assert all(not r.is_spammy for r in rows if r.is_seed)
