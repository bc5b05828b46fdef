"""PLD politeness groups (ops/scheduling.py q_politeness_pld) — native
registrable-domain extraction parity with the goldened urls.base_domain,
and the budget-sharing property that defeats subdomain farms."""

from collections import defaultdict

from crawl4ai_spark.ops.scheduling import PLD_BUDGET, q_politeness_pld
from crawl4ai_spark.urls import base_domain

SF = "/root/testdata/sf0.001"


def test_native_pld_matches_base_domain(spark):
    rows = q_politeness_pld(spark, SF).collect()
    assert rows
    for r in rows:
        assert r.pld == base_domain(f"https://{r.host}/"), r.host


def test_farm_budget_is_shared(spark):
    rows = q_politeness_pld(spark, SF).collect()
    by_pld = defaultdict(list)
    for r in rows:
        by_pld[r.pld].append(r)

    farms = {p: rs for p, rs in by_pld.items() if p == "bigfarm.com"}
    singles = {p: rs for p, rs in by_pld.items() if p.startswith("site")}
    couk = {p: rs for p, rs in by_pld.items() if p.endswith(".co.uk")}
    assert farms and singles and couk

    for pld, rs in by_pld.items():
        n_hosts = len(rs)
        assert all(r.n_hosts == n_hosts for r in rs)
        want_quota = max(1, PLD_BUDGET // n_hosts)
        assert all(r.host_quota == want_quota for r in rs)
        # the farm's AGGREGATE budget never exceeds ~the single-host
        # budget: that is the property per-host politeness lacks
        assert n_hosts * want_quota <= max(PLD_BUDGET, n_hosts)

    # a www-stripped single-host domain keeps the full budget
    for rs in singles.values():
        assert rs[0].host.startswith("www.") and rs[0].host_quota == PLD_BUDGET

    # subdomain farms exist (several hosts under one registrable domain)
    assert any(len(rs) >= 4 for rs in farms.values())
    # co.uk-style second-level TLD keeps three labels
    for pld in couk:
        assert pld.count(".") == 2
